"""End-to-end test of the market-data DAG: Raw → Vault → Marts → Semantic.

Builds the nine raw tables with the deterministic faker (sources/faker.py),
runs the full model DAG (plans/market.py), and applies the ported
data-quality suite (quality.py) — the Spark equivalent of the reference's
`dbt build` over its 21 singular tests + schema tests.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_crypto_data_pipeline_public_spark.plans.market import registry
from stock_crypto_data_pipeline_public_spark.quality import run_market_quality_suite
from stock_crypto_data_pipeline_public_spark.sources.faker import MarketDataFaker


@pytest.fixture(scope="module")
def ctx(spark):
    raw = MarketDataFaker(seed=42).generate(spark)
    built = registry.run(raw)
    # cache the hot mid-DAG tables once: every mart/semantic/quality check
    # re-reads them, and without caching each count re-runs the whole vault
    for name in ("fct_transactions", "fct_asset_prices", "dim_customer_history"):
        built[name] = built[name].cache()
    return built


def test_dag_builds_all_models(ctx):
    for name in registry.models():
        assert name in ctx, name


def test_hub_uniqueness_and_dedup(ctx):
    # duplicate business keys across batches (faker idempotence hook) must
    # collapse to one hub row per key
    hub = ctx["hub_customer"]
    assert hub.count() == hub.select("customer_bk").distinct().count()
    total_raw = ctx["raw_customers"].select("customer_id").distinct().count()
    assert hub.count() == total_raw

    hub_t = ctx["hub_transaction"]
    assert hub_t.count() == hub_t.select("transaction_bk").distinct().count()


def test_hub_dedup_keeps_earliest_load(ctx):
    earliest = (
        ctx["raw_corporates"]
        .groupBy("company_id")
        .agg(F.min("load_timestamp").alias("load_timestamp"))
    )
    joined = ctx["hub_company"].join(
        earliest.withColumnRenamed("company_id", "company_bk"),
        ["company_bk", "load_timestamp"],
    )
    assert joined.count() == ctx["hub_company"].count()


def test_cross_feed_duplicate_collapses(ctx):
    # faker re-delivers one personal txn in the corporate feed; the sat and
    # fact must still be unique per transaction
    fct = ctx["fct_transactions"]
    assert fct.count() == fct.select("hk_transaction").distinct().count()


def test_satellite_changes_only(ctx):
    # unchanged re-emits (hashdiff hook) are dropped: per customer, version
    # count == distinct hashdiff count over time
    sat = ctx["sat_customer_profile"]
    per_key = sat.groupBy("hk_customer").agg(
        F.count(F.lit(1)).alias("versions"),
        F.countDistinct("hashdiff").alias("distinct_diffs"),
    )
    assert per_key.filter(F.col("versions") != F.col("distinct_diffs")).count() == 0


def test_scd2_history_shape(ctx):
    hist = ctx["dim_customer_history"]
    # every customer has exactly one open (is_current) version
    bad = (
        hist.groupBy("hk_customer")
        .agg(F.sum(F.when(F.col("is_current"), 1).otherwise(0)).alias("n"))
        .filter(F.col("n") != 1)
    )
    assert bad.count() == 0
    # SCD2 hook produced at least one multi-version customer
    multi = hist.groupBy("hk_customer").count().filter(F.col("count") > 1)
    assert multi.count() > 0


def test_fact_referential_integrity(ctx):
    fct = ctx["fct_transactions"]
    orphans = fct.join(ctx["hub_customer"], "hk_customer", "left_anti")
    assert orphans.count() == 0
    orphans = fct.join(ctx["hub_asset"], "hk_asset", "left_anti")
    assert orphans.count() == 0


def test_link_company_transaction_corporate_only(ctx):
    """link_company_transaction derives ONLY from the corporate feed
    (reference link_company_transaction.sql:17-24): one row per distinct
    (company, transaction) pair, every row resolving to both hubs, and no
    personal-only transaction ever linked."""
    link = ctx["link_company_transaction"]
    # expected grain: distinct corporate (company, transaction) pairs whose
    # company resolves in the hub — the faker's cross-feed duplicate hook
    # re-delivers one PERSONAL txn in the corporate feed, and its customer
    # is not a company, so the reference's inner hub join drops it too
    corp_pairs = (
        ctx["raw_transaction_corporate"]
        .select("transaction_id", F.col("customer_id").alias("company_id"))
        .distinct()
        .join(
            ctx["raw_corporates"].select(F.col("company_id")).distinct(),
            "company_id",
            "inner",
        )
    )
    assert link.count() == corp_pairs.count()
    assert link.count() == link.select("lk_company_transaction").distinct().count()
    assert link.join(ctx["hub_company"], "hk_company", "left_anti").count() == 0
    assert link.join(ctx["hub_transaction"], "hk_transaction", "left_anti").count() == 0
    # a transaction that only ever appeared in the personal feed is absent
    personal_only = (
        ctx["raw_transaction_personal"]
        .select("transaction_id")
        .join(ctx["raw_transaction_corporate"].select("transaction_id"), "transaction_id", "left_anti")
    )
    linked_txn = link.join(
        ctx["hub_transaction"].select("hk_transaction", "transaction_bk"), "hk_transaction"
    ).select(F.col("transaction_bk").alias("transaction_id"))
    assert linked_txn.join(personal_only, "transaction_id", "inner").count() == 0


def test_price_comparison_has_all_sources(ctx):
    cmp_df = ctx["fct_asset_price_comparison"]
    crypto_rows = cmp_df.filter(
        F.col("binance_price").isNotNull()
        & F.col("coingecko_price").isNotNull()
        & F.col("yfinance_price").isNotNull()
    )
    # every crypto (asset, day) has all 3 sources in the fixtures
    assert crypto_rows.count() > 0
    # stock rows only ever have yfinance
    stock = cmp_df.filter(F.col("binance_price").isNull() & F.col("yfinance_price").isNotNull())
    assert stock.count() > 0


def test_news_impact_returns(ctx):
    impact = ctx["fct_asset_news_impact"]
    some = impact.filter(F.col("return_1d").isNotNull())
    assert some.count() > 0
    # return_1d recomputes exactly (same expression both ways)
    p0 = F.col("price_t0").cast("double")
    bad = some.filter(
        F.abs(F.col("return_1d") - (F.col("price_t1").cast("double") - p0) / F.nullif(p0, F.lit(0.0)))
        > 1e-9
    )
    assert bad.count() == 0


def test_semantic_customer_overview(ctx):
    sem = ctx["semantic_customer_overview"]
    assert sem.count() == ctx["dim_customer"].count()
    # KPI cross-check against a direct aggregate
    direct = ctx["fct_transactions"].groupBy("hk_customer").agg(
        F.count(F.lit(1)).alias("expect_n")
    )
    joined = sem.join(direct, "hk_customer")
    assert joined.filter(F.col("n_transactions") != F.col("expect_n")).count() == 0


def test_dag_tag_selection():
    hubs = registry.resolve(tags=["hub"])
    assert "hub_customer" in hubs and "fct_transactions" not in hubs
    # descendant selection: everything downstream of raw_customers' consumers
    down = registry.resolve(select=["hub_customer+"])
    assert "dim_customer" in down and "semantic_customer_overview" in down
    # closure pulls upstream deps in topological order
    order = registry.resolve(select=["fct_transactions"])
    assert order.index("hub_transaction") < order.index("fct_transactions")


def test_dag_state_modified_selection():
    """dbt's state:modified+ CI selection: an unchanged registry selects
    nothing; invalidating one model's fingerprint selects it plus every
    descendant, in topological order."""
    base = registry.manifest()
    assert registry.state_modified(base) == []
    # everything is "new" against an empty manifest
    assert set(registry.state_modified({})) == set(registry.models())

    stale = dict(base)
    stale["hub_customer"] = "0" * 64  # definition drift
    got = registry.state_modified(stale)
    assert "hub_customer" in got and "dim_customer" in got
    assert "hub_asset" not in got  # unrelated branch untouched
    assert got.index("hub_customer") < got.index("dim_customer")
    # without plus: just the changed model
    assert registry.state_modified(stale, plus=False) == ["hub_customer"]


def test_quality_suite_green(ctx):
    results = run_market_quality_suite(ctx, as_of="2024-03-01")
    failures = {k: v for k, v in results.items() if v != 0}
    assert failures == {}, failures


def test_multi_asset_news_story_keeps_one_row_per_asset(spark):
    """A story tagged for TWO assets must yield one hub/sat/link/fct row
    per asset with correctly paired symbols — a url-only hk_news would fan
    every hk_news join out (2 hubs x 2 links x 2 sats = 8) and mispair
    assets. Mixed-case raw tickers must collapse, not duplicate."""
    from datetime import datetime

    raw = MarketDataFaker(seed=7).generate(spark)
    t = datetime(2026, 1, 2, 9, 0, 0)
    # pick two assets that exist in the faker's hubs
    assets = [
        (r.asset_symbol, r.asset_type)
        for r in registry.run(raw, select=["hub_asset"])["hub_asset"]
        .select("asset_symbol", "asset_type").distinct().limit(2).collect()
    ]
    (s1, t1), (s2, t2) = assets
    extra = spark.createDataFrame(
        [
            (s1, t1, "http://x/multi", "m", "d", "i", t, t, "testsrc"),
            (s2, t2, "http://x/multi", "m", "d", "i", t, t, "testsrc"),
            # same (url, asset) again in lowercase — must collapse
            (s1.lower(), t1.lower(), "http://x/multi", "m", "d", "i", t, t, "ts2"),
        ],
        raw["raw_news"].schema,
    )
    raw["raw_news"] = raw["raw_news"].unionByName(extra)
    built = registry.run(raw, select=["fct_news_events"])

    hub = built["hub_news"].filter(F.col("news_bk") == "http://x/multi")
    assert hub.count() == 2
    assert hub.select("hk_news").distinct().count() == 2  # per-asset keys

    fct = built["fct_news_events"].filter(F.col("title") == "m")
    rows = fct.collect()
    assert len(rows) == 2  # one per asset, no fan-out
    assert {r.asset_symbol for r in rows} == {s1, s2}


def test_dim_customer_single_row_after_company_change(spark):
    """A customer whose company changed has two link_customer_company rows
    (full history); dim_customer must still be one row per customer — the
    LATEST company — or every transaction join downstream duplicates."""
    from datetime import datetime

    raw = MarketDataFaker(seed=9).generate(spark)
    cust = raw["raw_customers"].limit(1).collect()[0]
    companies = [r.company_id for r in raw["raw_corporates"].limit(2).collect()]
    assert len(companies) == 2
    switched = cust.asDict()
    switched["company_id"] = companies[1]
    switched["load_timestamp"] = datetime(2026, 2, 1)
    switched["source"] = "switch"
    later = spark.createDataFrame([tuple(switched.values())], raw["raw_customers"].schema)
    raw["raw_customers"] = raw["raw_customers"].unionByName(later)
    built = registry.run(raw, select=["dim_customer"])
    mine = built["dim_customer"].filter(F.col("customer_bk") == cust.customer_id)
    rows = mine.collect()
    assert len(rows) == 1
    assert rows[0].company_id == companies[1]  # the later link wins


def test_profile_table_one_pass_summary(spark):
    from stock_crypto_data_pipeline_public_spark.quality import profile_table

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, None, 30.0), (4, "b", 2.5)],
        "id long, s string, v double",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"id", "s", "v"}
    assert all(r["n_rows"] == 4 for r in prof.values())
    assert prof["s"]["n_nulls"] == 1 and prof["v"]["n_nulls"] == 1
    assert prof["id"]["approx_distinct"] == 4  # tiny cardinality: HLL exact
    assert prof["s"]["approx_distinct"] == 2
    # native-type ordering, then rendered: 2.5 < 10.0 numerically
    assert prof["v"]["min_str"] == "2.5" and prof["v"]["max_str"] == "30.0"
    assert prof["id"]["min_str"] == "1" and prof["id"]["max_str"] == "4"
