"""Batch ingest layer: CSV landing zone → typed, aligned, partitioned tables.

The Spark collapse of the reference's file staging + warehouse COPY path
(SURVEY.md §3.1 steps 3-5): where the reference uploads CSV to MinIO
(reference scripts/utils/minio_connector.py), then `COPY INTO` Snowflake with
per-column TRY_ casts and `ON_ERROR='CONTINUE'` (reference
a1_4_batch_s3_to_snowflake.py:372-467, a2_0_crypto_common.py:198-226), this
module reads the landing CSV once, applies the same safe-cast semantics, and
writes straight to partitioned Parquet — no process hop, no staging copies.

Pieces, each citing the reference behavior it reproduces:

- ``read_landing_csv`` — declared-schema CSV scan; PERMISSIVE mode with a
  corrupt-record column ≡ ON_ERROR='CONTINUE' (a2_0_crypto_common.py:217),
  FAILFAST ≡ the enforced dbt contract (models/raw_sf/sources.yml:450-452).
- ``try_cast_columns`` — null-on-failure typed casts ≡ Snowflake TRY_TO_*
  (a1_4:388-444) and pandas ``to_datetime(errors='coerce')``
  (a1_5_batch_s3_to_postgres.py:493-526). Spark 4 runs ANSI mode where a
  plain cast THROWS — try_* is load-bearing here, not stylistic.
- ``align_columns`` — add missing columns as typed nulls in a fixed order
  (P19, a1_5:598-613; a2_0_crypto_common.py:73-79).
- ``rename_columns`` — rename map + derived defaults (P20, a1_5:574-595).
- ``load_seed_list`` — seed ticker/symbol lists, first-occurrence order
  preserved, case-normalized (S14, a3_0_stock_common.py:64-87,
  a2_0_crypto_common.py:45-54).
- ``run_suffix`` — canonical YYYYMMDD_HHMMSS landing filename suffix
  (scripts/utils/date_utils.py:85-94).
- ``write_partitioned`` — date-partitioned append with sort-within-partitions
  ≡ the TimescaleDB hypertable + compression policy (a1_5:383-411,
  compress_hypertable.sql:15-19 segmentby/orderby → partition dir + sorted
  row groups; the sort buys parquet RLE/dict compression locality).

Scale notes: the landing scan is schema-on-read (no inference pass); the
partition column is the event date so incremental runs prune files; writers
never coalesce(1) — file count follows parallelism, which is what you want
at 100 TB.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def run_suffix(now: datetime) -> str:
    """Canonical landing-file run suffix (reference date_utils.py:85-94)."""
    return now.strftime("%Y%m%d_%H%M%S")


def read_landing_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    on_error: str = "continue",
) -> DataFrame:
    """Header CSV with a declared schema.

    ``on_error='continue'`` → PERMISSIVE + ``_corrupt_record`` column: rows
    that fail the schema arrive with nulls + the raw line captured, exactly
    Snowflake's ON_ERROR='CONTINUE' observability. ``on_error='abort'`` →
    FAILFAST (contract enforcement).
    """
    if on_error not in ("continue", "abort"):
        raise ValueError("on_error must be 'continue' or 'abort'")
    if on_error == "abort":
        return spark.read.csv(
            path, header=True, schema=schema, mode="FAILFAST", recursiveFileLookup=True
        )
    with_corrupt = T.StructType(
        schema.fields + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    return spark.read.csv(
        path,
        header=True,
        schema=with_corrupt,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
        recursiveFileLookup=True,
    )


def try_cast_columns(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """Null-on-failure casts: ``{'price': 'decimal(20,8)', 'ts': 'timestamp'}``.

    TRY_TO_NUMBER / TRY_TO_TIMESTAMP_NTZ / TRY_TO_DATE semantics
    (reference a1_4:388-444) under Spark 4 ANSI mode.
    """
    out = df
    for name, dtype in casts.items():
        out = out.withColumn(name, F.col(name).try_cast(dtype))
    return out


def align_columns(df: DataFrame, required: T.StructType) -> DataFrame:
    """Fixed column order; absent columns become typed nulls (P19).

    Extra input columns are dropped — the reference writes a fixed header
    (a2_0_crypto_common.py:63-84)."""
    present = set(df.columns)
    return df.select(
        *[
            F.col(f.name) if f.name in present else F.lit(None).cast(f.dataType).alias(f.name)
            for f in required.fields
        ]
    )


def rename_columns(df: DataFrame, renames: dict[str, str], defaults: dict[str, Column] | None = None) -> DataFrame:
    """Rename map + derived default columns (P20: news cryptocurrency→ticker,
    upper-cased, constant asset_type)."""
    out = df.withColumnsRenamed(renames)
    for name, col in (defaults or {}).items():
        out = out.withColumn(name, col)
    return out


def load_seed_list(spark: SparkSession, path: str, case: str = "upper") -> DataFrame:
    """Seed symbol list → one-column DataFrame ``symbol``, deduped keeping
    FIRST occurrence order (reference dedupes via dict.fromkeys), blank lines
    and whitespace stripped, case-normalized (stocklist upper / cryptolist
    lower). Returns with a stable ``seed_order`` for downstream ordering."""
    norm = {"upper": F.upper, "lower": F.lower}[case]
    lines = (
        spark.read.text(path)
        .select(norm(F.trim(F.col("value"))).alias("symbol"))
        .filter(F.col("symbol") != "")
    )
    # first-occurrence order: tag with the input line offset, keep min per key
    numbered = lines.withColumn("seed_order", F.monotonically_increasing_id())
    return (
        numbered.groupBy("symbol")
        .agg(F.min("seed_order").alias("seed_order"))
        .orderBy("seed_order")
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str,
    sort_cols: tuple[str, ...] = (),
    mode: str = "append",
) -> None:
    """Date-partitioned Parquet append, rows sorted within partitions.

    ``partitionBy(date)`` ≡ hypertable time partitioning (a1_5:383-411);
    ``sortWithinPartitions(segment, order)`` ≡ the compression policy's
    segmentby/orderby (compress_hypertable.sql:15-19) — co-locating a
    segment key's rows makes parquet dictionary/RLE encoding effective.
    """
    out = df
    if sort_cols:
        out = df.repartition(F.col(partition_col)).sortWithinPartitions(*sort_cols)
    out.write.mode(mode).partitionBy(partition_col).parquet(path)


def add_load_timestamp(df: DataFrame, source: str, now=None) -> DataFrame:
    """Server-side lineage columns the reference adds at COPY time
    (a2_0_crypto_common.py:222 ``current_timestamp()``): ``load_timestamp``
    + ``source``. ``now`` pins the clock for deterministic tests."""
    ts = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
    return df.withColumn("load_timestamp", ts).withColumn("source", F.lit(source))
