"""Incremental materialization: high-water mark, idempotent append, MERGE
emulation — the engine-level machinery SURVEY.md §4 says must be built
(Catalyst optimizes plans; *materialization strategy* is ours).

Reference semantics reproduced:

- high-water mark: ``where load_timestamp > (select coalesce(max(...),
  '1900-01-01') from {{ this }})`` (reference raw_corporates.sql:23-27)
- idempotent append: Postgres ``INSERT ... ON CONFLICT DO NOTHING``
  (reference kafka_consumer.py:294-303) → left_anti against target keys
- MERGE upsert: Snowflake ``MERGE INTO`` via temp table (reference
  a1_4_batch_s3_to_snowflake.py:470-557) → last-wins row_number rewrite

Storage is plain partitioned Parquet (no Delta in this environment — the
MERGE emulation rewrites; with Delta the same API maps to ``MERGE INTO``).

Scale notes: targets partition by a date column so the HWM filter prunes
partitions at scan time; the anti-join reads only the target's key column
(column pruning) and broadcasts the *new* side when small; a real deployment
makes the rewrite per-partition (dynamic partition overwrite), not
whole-table.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

LOW_WATERMARK = "1900-01-01 00:00:00"


def table_exists(spark: SparkSession, path: str) -> bool:
    # local/posix check is fine for file: paths; on S3A use the Hadoop FS API
    return os.path.exists(path)


def high_water_mark(spark: SparkSession, path: str, ts_col: str):
    """coalesce(max(ts), LOW_WATERMARK) of the target — a 1-row scan of one
    column (parquet footer stats make this near-free)."""
    if not table_exists(spark, path):
        return None
    row = spark.read.parquet(path).agg(F.max(ts_col).alias("hwm")).first()
    return row["hwm"]


def filter_new_rows(source: DataFrame, hwm, ts_col: str) -> DataFrame:
    """P2: the incremental predicate. With a date-partitioned target this
    filter partition-prunes the source scan."""
    if hwm is None:
        return source
    return source.filter(F.col(ts_col) > F.lit(hwm))


def idempotent_append(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: Sequence[str],
    partition_by: Sequence[str] = (),
) -> int:
    """Append source rows whose keys are not yet in the target (M2/M3).
    Returns the number of rows appended. Within-batch duplicates are also
    collapsed (reference consumers dedup per batch)."""
    new = source.dropDuplicates(list(keys))
    if table_exists(spark, path):
        existing = spark.read.parquet(path).select(*keys)
        new = new.join(existing, on=list(keys), how="left_anti")
    new = new.persist()
    try:
        n = new.count()
        if n or not table_exists(spark, path):
            # an empty FIRST write still materializes the target (schema +
            # directory): downstream readers (vault_tables → marts) need
            # every model present, and an absent target otherwise forces
            # full-history reprocessing on every later increment
            writer = new.write.mode("append")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(path)
        return n
    finally:
        new.unpersist()


def merge_upsert(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: Sequence[str],
    version_col: str,
    commit: str = "swap",
) -> None:
    """MERGE emulation (M1): last-wins by key across (target ∪ source),
    source preferred on version ties. The merged table is fully written
    OUTSIDE the live directory first, then committed; the target is never
    in a partial state. Two commit protocols:

    - ``commit='swap'`` (default): staging write + directory rename-aside
      (``swap_into_place``). Always-a-complete-table on POSIX filesystems;
      directory rename is NOT atomic on object stores.
    - ``commit='manifest'``: pointer-file generations
      (operators/manifest.py) — the commit is replacing ONE small manifest
      file, atomic on object stores too (single PUT). The table lives at
      ``path/gen-NNNNNN`` resolved via ``path/_current``; read it back
      with ``manifest.read_table`` (plain-table readers are unaffected —
      resolve_table passes non-manifest paths through).

    (Delta/Iceberg MERGE INTO replaces this body at deploy; the manifest
    protocol is the same pointer-flip idea those formats use.)"""
    from . import manifest as MF

    if commit not in ("swap", "manifest"):
        raise ValueError(f"commit must be 'swap' or 'manifest', got {commit!r}")
    live = MF.resolve_table(path) if commit == "manifest" else path
    src = source.withColumn("__prio", F.lit(1))
    if table_exists(spark, live) and (commit == "swap" or MF.is_manifest_table(path)):
        tgt = spark.read.parquet(live).withColumn("__prio", F.lit(0))
        merged = tgt.unionByName(src)
    else:
        merged = src
    w = W.partitionBy(*keys).orderBy(F.desc(version_col), F.desc("__prio"))
    result = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__prio")
    )
    if commit == "manifest":
        MF.commit_generation(
            path, lambda gen: result.write.mode("overwrite").parquet(gen)
        )
        return
    staging = path.rstrip("/") + ".__staging__"
    result.write.mode("overwrite").parquet(staging)  # reads the live target
    swap_into_place(staging, path)


def swap_into_place(staging: str, path: str) -> None:
    """Swap a fully-written staging directory over the live target: rename
    the live target ASIDE first, then staging into place, then delete the
    old copy — a complete table exists at every instant, so a crash
    mid-swap (or a concurrent reader) never sees a missing target
    (rmtree-then-rename had a window where the table didn't exist at all).
    os.rename fails across filesystems (EXDEV) — fall back to copy+delete.
    Shared by merge_upsert and maintenance.compact_table."""
    import errno
    import os
    import shutil

    target = path.rstrip("/")
    old = target + ".__old__"
    if os.path.isdir(old):  # leftover from a crashed previous swap
        shutil.rmtree(old)
    if os.path.isdir(target):
        os.rename(target, old)
    try:
        os.rename(staging, target)
    except OSError as e:
        if e.errno != errno.EXDEV:
            # put the live table back before propagating
            if os.path.isdir(old) and not os.path.isdir(target):
                os.rename(old, target)
            raise
        shutil.copytree(staging, target)
        shutil.rmtree(staging)
    if os.path.isdir(old):
        shutil.rmtree(old)


def incremental_run(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: Sequence[str],
    ts_col: str,
    partition_by: Sequence[str] = (),
) -> int:
    """The full dbt-style incremental materialization: HWM filter on the
    source, then idempotent key-deduplicated append (P2 + J5 + M3)."""
    hwm = high_water_mark(spark, path, ts_col)
    fresh = filter_new_rows(source, hwm, ts_col)
    return idempotent_append(spark, fresh, path, keys, partition_by)
