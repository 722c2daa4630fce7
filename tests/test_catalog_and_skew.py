"""Catalog layer + skew-mitigation operator tests."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from stock_crypto_data_pipeline_public_spark import catalog
from stock_crypto_data_pipeline_public_spark.flows import BatchFlow
from stock_crypto_data_pipeline_public_spark.operators.skew import salted_agg, salted_join
from stock_crypto_data_pipeline_public_spark.sources.faker import MarketDataFaker


# -- catalog ----------------------------------------------------------------
@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("cat")
    flow = BatchFlow(landing_dir=str(base / "landing"), warehouse_dir=str(base / "wh"))
    raw = MarketDataFaker(seed=3, n_corporates=4, n_customers=15, n_transactions=40,
                          n_price_days=4, n_news=5).generate(spark)
    flow.land(raw, datetime(2024, 2, 1, 20, 0, 0))
    flow.ingest_raw(spark)
    return flow


def test_register_warehouse_sql_surface(spark, warehouse):
    registered = catalog.register_warehouse(spark, warehouse.warehouse_dir)
    assert "raw_customers" in registered
    n = spark.sql("SELECT count(*) AS n FROM market.raw_customers").first().n
    assert n == spark.read.parquet(f"{warehouse.warehouse_dir}/raw_customers").count()
    assert catalog.table_exists(spark, "raw_customers")
    assert not catalog.table_exists(spark, "raw_nonexistent")
    # re-registration is a no-op (CREATE IF NOT EXISTS)
    assert catalog.register_warehouse(spark, warehouse.warehouse_dir)


def test_register_models_views(spark, warehouse):
    ctx = warehouse.transform(spark, select=["dim_customer"])
    catalog.register_models(spark, ctx, names=["dim_customer"])
    got = spark.sql("SELECT count(*) AS n FROM dim_customer").first().n
    assert got == ctx["dim_customer"].count()


def test_identifier_validation():
    with pytest.raises(ValueError):
        catalog._q("x; drop table y --")


def test_refresh_after_external_append(spark, warehouse):
    catalog.register_warehouse(spark, warehouse.warehouse_dir)
    before = spark.sql("SELECT count(*) AS n FROM market.raw_news").first().n
    extra = spark.read.parquet(f"{warehouse.warehouse_dir}/raw_news").limit(1).withColumn(
        "url", F.lit("http://late.example.com/x")
    )
    extra.write.mode("append").parquet(f"{warehouse.warehouse_dir}/raw_news")
    catalog.refresh(spark, "raw_news")
    after = spark.sql("SELECT count(*) AS n FROM market.raw_news").first().n
    assert after == before + 1


# -- skew -------------------------------------------------------------------
@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90%) + uniform tail
    hot = spark.range(9000).select(F.lit("HOT").alias("k"), (F.col("id") % 7).alias("v"))
    tail = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    return hot.unionByName(tail).cache()


def test_salted_agg_matches_plain_agg(spark, skewed):
    plain = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in skewed.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        ).collect()
    }
    salted = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in salted_agg(
            skewed, ["k"],
            {"n": ("*", "count"), "s": ("v", "sum"), "mn": ("v", "min"), "mx": ("v", "max")},
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_decomposable(skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, ["k"], {"a": ("v", "avg")})


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("HOT", "hot-dim")] + [(f"k{i}", f"dim{i}") for i in range(50)], "k string, label string"
    )
    plain = skewed.join(dim, "k").groupBy("k", "label").count()
    salted = salted_join(skewed, dim, ["k"], salt_buckets=4).groupBy("k", "label").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}
    # left rows with no dim match drop on inner, survive on left join
    lonely = spark.createDataFrame([("NOPE", 1)], "k string, v long")
    out = salted_join(skewed.unionByName(lonely), dim, ["k"], salt_buckets=4, how="left")
    assert out.filter(F.col("k") == "NOPE").count() == 1


def test_salted_join_rejects_right_preserving_modes(spark):
    from stock_crypto_data_pipeline_public_spark.operators.skew import salted_join

    df = spark.createDataFrame([(1, "a")], "k int, v string")
    with pytest.raises(ValueError, match="left-preserving"):
        salted_join(df, df.withColumnRenamed("v", "w"), ["k"], how="full")


def test_diagnose_skew_recommends_by_severity(spark, skewed):
    from stock_crypto_data_pipeline_public_spark.operators.skew import diagnose_skew

    # the fixture's HOT key holds 9000 of 10000 rows over 51 keys
    d = diagnose_skew(skewed, ["k"], top=3, target_rows_per_task=1000)
    assert d["n_rows"] == 10_000 and d["n_keys"] == 51
    assert d["max_rows"] == 9000
    assert d["hot_keys"][0] == ({"k": "HOT"}, 9000)
    assert len(d["hot_keys"]) == 3
    assert d["skew_ratio"] > 4
    assert d["recommendation"] == ("salt", 9)  # ceil(9000/1000)

    # hottest key fits a task -> leave the plan alone
    assert diagnose_skew(skewed, ["k"], target_rows_per_task=10_000)[
        "recommendation"
    ] == "none"

    # uniform keys over the task target -> AQE handles residual imbalance
    uniform = spark.range(4000).select((F.col("id") % 4).alias("k"))
    assert diagnose_skew(uniform, ["k"], target_rows_per_task=500)[
        "recommendation"
    ] == "aqe"
