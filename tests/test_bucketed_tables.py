"""Bucketed managed tables: co-bucketed joins must plan WITHOUT a shuffle
(the write-once-shuffle pattern for repeated vault hash-key joins)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from stock_crypto_data_pipeline_public_spark import catalog
from stock_crypto_data_pipeline_public_spark.sources.tables import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    catalog.materialize_bucketed(
        spark, orders, "orders_bkt", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"]
    )
    catalog.materialize_bucketed(
        spark,
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_bkt",
        ["o_orderkey"],
        n_buckets=8,
        sort_cols=["o_orderkey"],
    )
    return spark.table("market.orders_bkt"), spark.table("market.lineitem_bkt")


def test_cobucketed_join_has_no_shuffle(spark, sf_dir, bucketed):
    o, l = bucketed
    # force the shuffle-family join (tiny test tables would auto-broadcast;
    # at real scale neither side broadcasts and merge is the natural pick)
    joined = o.join(l.hint("merge"), "o_orderkey")
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    # the join itself required no exchange: both sides pre-hashed on disk
    assert "Exchange hashpartitioning" not in plan
    # and it computes the right thing
    expect = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
            "o_orderkey",
        )
        .count()
    )
    assert joined.count() == expect


def test_bucketed_join_vs_plain_parquet_shuffles(spark, sf_dir, bucketed):
    o_plain = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    l_plain = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    plan = _plan(o_plain.join(l_plain.hint("merge"), "o_orderkey"))
    assert "Exchange hashpartitioning" in plan  # the cost bucketing removes


def test_bucket_identifier_validation(spark, bucketed):
    with pytest.raises(ValueError):
        catalog.materialize_bucketed(
            spark, bucketed[0], "x", ["bad col; drop"], n_buckets=4
        )


def test_external_path_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """q38's codepath: EXTERNAL bucketed tables (option path=...) must carry
    the bucket spec through the catalog exactly like managed ones — the
    co-bucketed join plans merge with zero exchanges."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    try:
        ot = catalog.materialize_bucketed(
            spark, orders, "orders_ext_bkt", ["o_orderkey"],
            n_buckets=8, sort_cols=["o_orderkey"], path=str(tmp_path / "o"),
        )
        lt = catalog.materialize_bucketed(
            spark, li, "lineitem_ext_bkt", ["o_orderkey"],
            n_buckets=8, sort_cols=["o_orderkey"], path=str(tmp_path / "l"),
        )
        joined = spark.table(ot).join(spark.table(lt).hint("merge"), "o_orderkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == orders.join(li, "o_orderkey").count()
    finally:
        for t in ("orders_ext_bkt", "lineitem_ext_bkt"):
            spark.sql(f"DROP TABLE IF EXISTS market.`{t}`")
