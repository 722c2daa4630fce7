"""The driver-faithful comparison (oracle_compare.py) must stay strict on
exactly the dtype classes that burned round 2: DuckDB HUGEINT→float64 sums
vs Spark int64, and out-of-pandas-range timestamps."""

from __future__ import annotations

import duckdb
import pytest

from stock_crypto_data_pipeline_public_spark.oracle_compare import canon, diff, duck_pdf


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_hugeint_sum_is_flagged(spark, con):
    """DuckDB sum(int) -> HUGEINT -> float64: must MISMATCH vs Spark int64."""
    sdf = spark.createDataFrame([(457,)], "total long")
    errs = diff("t", sdf, con, "SELECT sum(x) AS total FROM (VALUES (450), (7)) AS v(x)")
    assert errs and "457" in errs[0]


def test_bigint_cast_fixes_it(spark, con):
    sdf = spark.createDataFrame([(457,)], "total long")
    errs = diff(
        "t", sdf, con,
        "SELECT CAST(sum(x) AS BIGINT) AS total FROM (VALUES (450), (7)) AS v(x)",
    )
    assert errs == []


@pytest.mark.filterwarnings(
    # the Arrow→pandas fallback warning is EXPECTED here (this test exists
    # to provoke the conversion failure); filtering it in this one test
    # keeps genuine Arrow warnings elsewhere visible
    "ignore:toPandas attempted Arrow optimization:UserWarning"
)
def test_out_of_range_timestamp_is_reported_not_raised(spark, con):
    """The q14 failure mode: Spark's toPandas dies on year-9999 timestamps
    (pandas datetime64[ns] tops out at 2262). DuckDB's .df() happens to
    survive via object dtype — the crash is the SPARK side, and diff()
    must report it as a failure rather than raise."""
    import datetime

    sdf = spark.createDataFrame(
        [(datetime.datetime(9999, 12, 31),)], "a timestamp_ntz"
    )
    errs = diff("t", sdf, con, "SELECT TIMESTAMP '9999-12-31 00:00:00' AS a")
    assert errs and "spark pandas conversion failed" in errs[0]


def test_int_widths_agree(spark, con):
    """int32 vs int64 renders identically — must NOT flag (q08-style)."""
    sdf = spark.createDataFrame([(2024,)], "y int")  # int32 in pandas
    errs = diff("t", sdf, con, "SELECT CAST(2024 AS BIGINT) AS y")
    assert errs == []


def test_date_vs_midnight_timestamp_agree(spark, con):
    """Spark DATE arrives as datetime.date, DuckDB DATE as midnight
    datetime64 — canonical form strips the zero time (f02-style)."""
    import datetime

    sdf = spark.createDataFrame([(datetime.date(2024, 3, 1),)], "d date")
    errs = diff("t", sdf, con, "SELECT DATE '2024-03-01' AS d")
    assert errs == []


def test_float_vs_int_value_equal_still_flagged(con):
    """15 vs 15.0 hash-differ (the leniency the old harness had)."""
    a = canon(duck_pdf(con, "SELECT CAST(15 AS BIGINT) AS v"))
    b = canon(duck_pdf(con, "SELECT CAST(15 AS DOUBLE) AS v"))
    assert a[1] != b[1]
