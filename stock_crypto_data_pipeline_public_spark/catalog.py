"""Catalog layer: the reference's DDL surface on the Spark catalog
(SURVEY.md §2.11).

Reference behavior reproduced: ``CREATE SCHEMA/TABLE IF NOT EXISTS`` on
every startup (reference kafka_consumer.py:89-200, a2_0:116-195,
a3_0:172-281), INFORMATION_SCHEMA existence checks
(market_data_utils.py:333-344), and the analyst-facing named-table surface
that Snowflake/Trino provided — here a database of external Parquet tables
over the warehouse directory plus temp views for the virtual mart layer, so
``spark.sql("SELECT … FROM market.raw_customers")`` and ad-hoc SQL over
marts both work.

Identifiers are validated and backtick-quoted — names reach SQL text, and
the analyst surface must not be an injection vector (the reference's
f-string SQL is the anti-pattern, warehouse_tools.py:166-182).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from .schemas import SCHEMAS

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _q(name: str) -> str:
    if not _IDENT.match(name):
        raise ValueError(f"invalid identifier {name!r}")
    return f"`{name}`"


def ensure_database(spark: SparkSession, database: str = "market") -> None:
    """CREATE SCHEMA IF NOT EXISTS (reference kafka_consumer.py:96-100)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {_q(database)}")


def register_warehouse(
    spark: SparkSession, warehouse_dir: str, database: str = "market"
) -> list[str]:
    """External Parquet tables over every existing raw-table directory:
    CREATE TABLE IF NOT EXISTS … USING PARQUET LOCATION … (reference
    CREATE TABLE IF NOT EXISTS blocks, a2_0:116-195). Re-registration is a
    no-op; data stays owned by the directory (DROP won't delete it)."""
    ensure_database(spark, database)
    registered = []
    for name in SCHEMAS:
        path = os.path.join(warehouse_dir, name)
        if not os.path.exists(path):
            continue
        # escape embedded quotes: the path is data, not SQL — same contract
        # as the backtick-validated identifiers
        loc = path.replace("'", "''")
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {_q(database)}.{_q(name)} "
            f"USING PARQUET LOCATION '{loc}'"
        )
        registered.append(name)
    return registered


def register_models(spark: SparkSession, ctx: dict[str, DataFrame], names=None) -> list[str]:
    """Temp views for the virtual vault/mart/semantic layer — the Spark
    equivalent of the reference's view materialization (dbt_project.yml:
    30-42): marts are queryable by name but recompute from raw on access."""
    out = []
    for name, df in ctx.items():
        if names is not None and name not in names:
            continue
        df.createOrReplaceTempView(_q(name).strip("`"))
        out.append(name)
    return out


def table_exists(spark: SparkSession, name: str, database: str = "market") -> bool:
    """INFORMATION_SCHEMA existence check (market_data_utils.py:333-344)."""
    return spark.catalog.tableExists(f"{database}.{name}")


def refresh(spark: SparkSession, name: str, database: str = "market") -> None:
    """Invalidate cached file listings after an external append (the
    catalog caches parquet file indexes per table)."""
    spark.sql(f"REFRESH TABLE {_q(database)}.{_q(name)}")


def materialize_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    database: str = "market",
    path: str | None = None,
) -> str:
    """Save a DataFrame as a BUCKETED managed table: co-locating two tables
    on the same (columns, bucket count) makes their join shuffle-free — the
    hash-key join pattern SURVEY.md §4 calls out ("optionally bucket by
    *_hk to avoid shuffles in repeated joins").

    At 100 TB this is how fact⋈fact vault joins avoid re-shuffling the big
    side every query: the shuffle is paid ONCE at write. Sorting within
    buckets additionally removes the join's sort step.

    ``path`` makes the table EXTERNAL at that location (the bucketing
    metadata still lives in the catalog entry — parquet itself carries no
    bucket spec); default is a managed table under the session warehouse.
    """
    ensure_database(spark, database)
    fq = f"{database}.{table}"
    for c in bucket_cols + (sort_cols or []):
        _q(c)  # identifier validation
    # a fresh (in-memory) catalog can inherit a stale location from an
    # earlier session — drop both the entry and any orphaned directory
    spark.sql(f"DROP TABLE IF EXISTS {_q(database)}.{_q(table)}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:"):]
    stale = os.path.join(warehouse, f"{database}.db", table)
    if warehouse and os.path.exists(stale):
        import shutil

        shutil.rmtree(stale, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(f"{_q(database)}.{_q(table)}")
    return fq
