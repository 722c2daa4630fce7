"""Structured Streaming path: file-source micro-batches driving the
idempotent incremental sink, and watermarked event-time aggregation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stock_crypto_data_pipeline_public_spark.sources.tables import load_table
from stock_crypto_data_pipeline_public_spark.streaming.pipeline import (
    file_stream,
    run_incremental_sink,
    windowed_counts,
)


def _stage_events(spark, sf_dir, tmp_path, parts):
    """Split events into N parquet files in a staging dir (simulated topic)."""
    ev = load_table(spark, sf_dir, "events")
    staging = str(tmp_path / "staging")
    ev.repartition(parts).write.mode("overwrite").parquet(staging)
    schema = spark.read.parquet(staging).schema
    return ev, staging, schema


def test_stream_to_incremental_sink_is_idempotent(spark, sf_dir, tmp_path):
    ev, staging, schema = _stage_events(spark, sf_dir, tmp_path, 4)
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    q = run_incremental_sink(
        file_stream(spark, staging, schema),
        target,
        keys=["event_id"],
        checkpoint=ckpt,
    )
    q.awaitTermination(120)
    assert spark.read.parquet(target).count() == ev.count()

    # replay from a fresh checkpoint (simulated at-least-once redelivery):
    # the key-dedup keeps the sink idempotent
    q2 = run_incremental_sink(
        file_stream(spark, staging, schema),
        target,
        keys=["event_id"],
        checkpoint=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(target).count() == ev.count()


def test_windowed_counts_with_watermark_matches_batch(spark, sf_dir, tmp_path):
    ev, staging, schema = _stage_events(spark, sf_dir, tmp_path, 3)
    agg = windowed_counts(file_stream(spark, staging, schema), "ts", "1 day", "1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT window_start, event_type, n_events FROM win_counts")
    expected = (
        ev.groupBy(F.date_trunc("day", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
    spark.catalog.dropTempView("win_counts")
