"""Tests for the analyst/chatbot query API (api.py) — the six reference
warehouse tools + pending-query approval workflow over the market DAG."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from stock_crypto_data_pipeline_public_spark.api import MarketQueryTools, PendingQueryRegistry
from stock_crypto_data_pipeline_public_spark.plans.market import registry
from stock_crypto_data_pipeline_public_spark.sources.faker import MarketDataFaker


@pytest.fixture(scope="module")
def tools(spark):
    raw = MarketDataFaker(seed=7, n_corporates=8, n_customers=40, n_transactions=150,
                          n_price_days=10, n_news=15).generate(spark)
    ctx = registry.run(raw)
    ctx["fct_transactions"] = ctx["fct_transactions"].cache()
    ctx["fct_asset_prices"] = ctx["fct_asset_prices"].cache()
    return MarketQueryTools(ctx)


def test_query_transactions_filters_and_limit(tools):
    rows = tools.query_transactions(transaction_type="buy", limit=5).collect()
    assert 0 < len(rows) <= 5
    assert all(r.transaction_type == "BUY" for r in rows)
    # ordered newest-first
    ts = [r.transaction_timestamp for r in rows]
    assert ts == sorted(ts, reverse=True)


def test_query_transactions_by_customer_id(tools):
    any_row = tools.ctx["dim_customer"].select("customer_bk").first()
    rows = tools.query_transactions(customer_id=any_row.customer_bk, limit=50).collect()
    assert all(r.customer_id == any_row.customer_bk for r in rows)


def test_query_transactions_by_name(tools):
    # personal customers are named First<i> Last<i> by the faker
    rows = tools.query_transactions(customer_name="First1", limit=50).collect()
    assert all("first1" in (r.first_name or "").lower() or "first1" in (r.last_name or "").lower() for r in rows)


def test_query_asset_prices_window_and_type(tools):
    rows = tools.query_asset_prices(days=10000, asset_type="crypto", limit=8, as_of="2024-03-01").collect()
    assert 0 < len(rows) <= 8
    assert all(r.asset_type == "CRYPTO" for r in rows)
    # recency bound: anchor far in the future with a 1-day window excludes all
    none = tools.query_asset_prices(days=1, as_of="2030-01-01", limit=8).collect()
    assert none == []


def test_query_transaction_summary_groups(tools):
    df = tools.query_transaction_summary(group_by="customer_tier")
    rows = df.collect()
    assert {r.customer_tier for r in rows} <= {"Bronze", "Silver", "Gold", "Platinum"}
    # totals descend
    totals = [float(r.total_amount) for r in rows]
    assert totals == sorted(totals, reverse=True)
    # unique_customers is a true distinct count
    direct = (
        tools.ctx["fct_transactions"]
        .join(tools.ctx["dim_customer"].select("hk_customer", "customer_tier"), "hk_customer")
        .groupBy("customer_tier").agg(F.countDistinct("hk_customer").alias("n"))
    )
    expect = {r.customer_tier: r.n for r in direct.collect()}
    assert {r.customer_tier: r.unique_customers for r in rows} == expect
    with pytest.raises(ValueError):
        tools.query_transaction_summary(group_by="1; drop table customers --")


def test_query_price_trends_lag(tools):
    sym = tools.ctx["fct_asset_prices"].select("asset_symbol").first().asset_symbol
    rows = tools.query_price_trends(sym, days=10000, as_of="2024-03-01").collect()
    assert len(rows) > 1
    assert rows[0].previous_price is None
    for prev, cur in zip(rows, rows[1:]):
        assert cur.previous_price == pytest.approx(float(prev.price))


def test_query_news_events(tools):
    rows = tools.query_news_events(limit=5).collect()
    assert 0 < len(rows) <= 5
    pub = [r.published_at for r in rows]
    assert pub == sorted(pub, reverse=True)


def test_query_customer_by_name_full_and_single(tools):
    single = tools.query_customer_by_name("First2").collect()
    assert all("first2" in r.first_name.lower() for r in single)
    full = tools.query_customer_by_name("First2 Last2").collect()
    assert all("first2" in r.first_name.lower() and "last2" in r.last_name.lower() for r in full)


def test_pending_query_workflow(tools):
    pq = tools.propose("query_transaction_summary", group_by="transaction_type")
    assert pq.status == "pending"
    out = json.loads(tools.pending.execute(pq.query_id))
    assert out["query_id"] == pq.query_id
    assert len(out["rows"]) > 0
    assert tools.pending.get(pq.query_id).status == "executed"
    # double-execute refused
    with pytest.raises(ValueError):
        tools.pending.execute(pq.query_id)
    # cancel path
    pq2 = tools.propose("query_news_events", limit=3)
    assert tools.pending.cancel(pq2.query_id)
    with pytest.raises(ValueError):
        tools.pending.execute(pq2.query_id)
