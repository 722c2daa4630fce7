"""Streaming MERGE into a pointer-file manifest table: each micro-batch
commits one complete generation; replays re-merge idempotently (last-wins
by key), and readers always resolve a complete table."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_crypto_data_pipeline_public_spark.operators import manifest as MF
from stock_crypto_data_pipeline_public_spark.sources.tables import load_table
from stock_crypto_data_pipeline_public_spark.streaming.pipeline import (
    file_stream,
    run_manifest_merge_sink,
)


def _stage(spark, df, path, parts):
    df.repartition(parts).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).schema


def test_stream_merge_into_manifest_table(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    staging = str(tmp_path / "staging")
    schema = _stage(spark, ev, staging, 3)
    table = str(tmp_path / "table")

    q = run_manifest_merge_sink(
        file_stream(spark, staging, schema),
        table,
        keys=["event_id"],
        version_col="ts",
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    assert MF.is_manifest_table(table)
    got = MF.read_table(spark, table)
    assert got.count() == ev.count()
    # merged table is exactly the source (unique keys -> no collapses)
    assert (
        got.select("event_id", "value").exceptAll(ev.select("event_id", "value")).count()
        == 0
    )

    # at-least-once replay (fresh checkpoint, same files): re-merging the
    # same batches is value-idempotent — row count and values unchanged
    gens_before = len(MF.history(table))
    q2 = run_manifest_merge_sink(
        file_stream(spark, staging, schema),
        table,
        keys=["event_id"],
        version_col="ts",
        checkpoint=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    again = MF.read_table(spark, table)
    assert again.count() == ev.count()
    assert (
        again.select("event_id", "value").exceptAll(ev.select("event_id", "value")).count()
        == 0
    )
    # replays DID commit (new generations), they just didn't change values
    assert len(MF.history(table)) > gens_before


def test_stream_merge_applies_updates_last_wins(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    base = ev.limit(200)
    staging1 = str(tmp_path / "s1")
    schema = _stage(spark, base, staging1, 2)
    table = str(tmp_path / "table")

    run_manifest_merge_sink(
        file_stream(spark, staging1, schema),
        table,
        keys=["event_id"],
        version_col="ts",
        checkpoint=str(tmp_path / "c1"),
    ).awaitTermination(120)

    # CDC wave: bump value and ts on half the keys
    updates = (
        base.filter(F.col("event_id") % 2 == 0)
        .withColumn("value", F.col("value") + 1000.0)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 DAY"))
    )
    staging2 = str(tmp_path / "s2")
    _stage(spark, updates, staging2, 2)

    run_manifest_merge_sink(
        file_stream(spark, staging2, schema),
        table,
        keys=["event_id"],
        version_col="ts",
        checkpoint=str(tmp_path / "c2"),
    ).awaitTermination(120)

    got = MF.read_table(spark, table)
    assert got.count() == base.count()  # upsert, not append
    updated = got.filter(F.col("event_id") % 2 == 0)
    untouched = got.filter(F.col("event_id") % 2 == 1)
    assert updated.filter(F.col("value") < 1000.0).count() == 0
    expected_untouched = base.filter(F.col("event_id") % 2 == 1)
    assert (
        untouched.select("event_id", "value")
        .exceptAll(expected_untouched.select("event_id", "value"))
        .count()
        == 0
    )
