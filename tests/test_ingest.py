"""Batch ingest layer tests: CSV landing → safe casts → aligned, partitioned
tables (sources/ingest.py)."""

from __future__ import annotations

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stock_crypto_data_pipeline_public_spark.sources import ingest

CRYPTO_CSV_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("price", T.StringType()),
        T.StructField("volume", T.StringType()),
        T.StructField("observed_at", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def landing_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("landing") / "crypto_20240101_120000.csv"
    p.write_text(
        "symbol,price,volume,observed_at\n"
        "BTC-USD,42000.5,1000.25,2024-01-01 12:00:00\n"
        "ETH-USD,not_a_number,5.5,2024-01-01 12:00:00\n"
        "SOL-USD,98.7,,bad_timestamp\n"
    )
    return str(p)


def test_read_landing_csv_permissive(spark, landing_csv):
    df = ingest.read_landing_csv(spark, landing_csv, CRYPTO_CSV_SCHEMA)
    rows = df.collect()
    assert len(rows) == 3
    assert "_corrupt_record" in df.columns


def test_try_cast_null_on_failure(spark, landing_csv):
    df = ingest.read_landing_csv(spark, landing_csv, CRYPTO_CSV_SCHEMA)
    typed = ingest.try_cast_columns(
        df, {"price": "decimal(20,8)", "volume": "decimal(28,8)", "observed_at": "timestamp"}
    )
    got = {r.symbol: r for r in typed.collect()}
    assert got["BTC-USD"].price is not None and got["BTC-USD"].observed_at is not None
    # TRY_TO_NUMBER semantics: bad numeric -> null, row survives
    assert got["ETH-USD"].price is None and got["ETH-USD"].volume is not None
    # TRY_TO_TIMESTAMP semantics: bad ts -> null
    assert got["SOL-USD"].observed_at is None and got["SOL-USD"].price is not None


def test_align_columns_adds_typed_nulls_fixed_order(spark):
    df = spark.createDataFrame([("BTC", 1.5, "x")], ["symbol", "price", "extra"])
    required = T.StructType(
        [
            T.StructField("symbol", T.StringType()),
            T.StructField("base_currency", T.StringType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    out = ingest.align_columns(df, required)
    assert out.columns == ["symbol", "base_currency", "price"]  # extra dropped
    row = out.first()
    assert row.base_currency is None and row.price == 1.5
    assert dict(out.dtypes)["base_currency"] == "string"


def test_rename_with_defaults(spark):
    df = spark.createDataFrame([("btc", "u")], ["cryptocurrency", "url"])
    out = ingest.rename_columns(
        df,
        {"cryptocurrency": "ticker"},
        {"ticker": F.upper("ticker"), "asset_type": F.lit("CRYPTO")},
    )
    row = out.first()
    assert row.ticker == "BTC" and row.asset_type == "CRYPTO"


def test_seed_list_first_occurrence_order(spark, tmp_path):
    p = tmp_path / "stocklist.txt"
    p.write_text("aapl\nMSFT\n  aapl  \ngoog\nmsft\n\n")
    out = ingest.load_seed_list(spark, str(p), case="upper").collect()
    assert [r.symbol for r in out] == ["AAPL", "MSFT", "GOOG"]


def test_write_partitioned_and_lineage(spark, tmp_path):
    df = spark.createDataFrame(
        [("AAPL", "2024-01-01", 10.0), ("AAPL", "2024-01-02", 11.0), ("MSFT", "2024-01-01", 20.0)],
        ["ticker", "price_date", "price"],
    ).withColumn("price_date", F.to_date("price_date"))
    df = ingest.add_load_timestamp(df, "BATCH_DATA", now=datetime(2024, 1, 3))
    target = str(tmp_path / "prices")
    ingest.write_partitioned(df, target, "price_date", sort_cols=("ticker",))
    # hypertable-style partition dirs exist
    assert any(d.startswith("price_date=") for d in os.listdir(target))
    back = spark.read.parquet(target)
    assert back.count() == 3
    assert {r.source for r in back.select("source").distinct().collect()} == {"BATCH_DATA"}
    # append mode accumulates (idempotence is the caller's anti-join, M2/M3)
    ingest.write_partitioned(df, target, "price_date", sort_cols=("ticker",))
    assert spark.read.parquet(target).count() == 6
