"""Mirror of the driver's DuckDB-oracle comparison.

Delegates to :mod:`stock_crypto_data_pipeline_public_spark.oracle_compare`, which routes BOTH
sides through pandas exactly like the round driver does. That makes the
local suite dtype-strict: DuckDB HUGEINT sums arriving as float64
(``457.0``) fail against Spark int64 (``457``), and out-of-range
timestamps (``9999-12-31``) fail at conversion — the two classes of
driver-only failure round 2 shipped because the old ``fetchall()`` path
compared ``15 == 15.0`` leniently.
"""

from __future__ import annotations

import os

import duckdb

from stock_crypto_data_pipeline_public_spark.oracle_compare import diff
from stock_crypto_data_pipeline_public_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def compare(name: str, spark_df, con, oracle: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    return diff(name, spark_df, con, oracle)
