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


def test_windowed_ohlcv_matches_batch_candles(spark, sf_dir, tmp_path):
    """Streaming bars == batch f01 candles on the same tape (complete mode
    drains everything, so the watermark never drops rows here)."""
    from stock_crypto_data_pipeline_public_spark.plans.finance import f01_ohlcv_candles
    from stock_crypto_data_pipeline_public_spark.streaming.pipeline import windowed_ohlcv

    _, staging, schema = _stage_events(spark, sf_dir, tmp_path, 3)
    bars = windowed_ohlcv(file_stream(spark, staging, schema))
    q = (
        bars.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ohlcv_bars")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ohlcv_bars")
    expected = f01_ohlcv_candles(spark, sf_dir).select(
        F.col("bar_hour").alias("bar_start"), "symbol", "open", "high",
        "low", "close", "volume", "n_trades",
    )
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
    spark.catalog.dropTempView("ohlcv_bars")


def test_dedup_stream_collapses_redelivered_events(spark, sf_dir, tmp_path):
    from stock_crypto_data_pipeline_public_spark.streaming.pipeline import dedup_stream

    ev = load_table(spark, sf_dir, "events")
    staging = str(tmp_path / "dup_staging")
    # at-least-once redelivery: every event lands twice across the files
    ev.unionByName(ev).repartition(4).write.mode("overwrite").parquet(staging)
    schema = spark.read.parquet(staging).schema

    deduped = dedup_stream(file_stream(spark, staging, schema), ["event_id"], "ts", "2 hours")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT count(*) c FROM dedup_out").first()["c"] == ev.count()
    spark.catalog.dropTempView("dedup_out")


def test_attribution_join_matches_batch_equivalent(spark, sf_dir, tmp_path):
    from stock_crypto_data_pipeline_public_spark.streaming.pipeline import attribution_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    c_dir, p_dir = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    clicks.write.mode("overwrite").parquet(c_dir)
    purchases.write.mode("overwrite").parquet(p_dir)

    joined = attribution_join(
        file_stream(spark, c_dir, spark.read.parquet(c_dir).schema),
        file_stream(spark, p_dir, spark.read.parquet(p_dir).schema),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    p2 = purchases.withColumnRenamed("user_id", "p_user_id")
    expected = clicks.join(
        p2,
        F.expr(
            "user_id = p_user_id AND purchase_ts >= click_ts"
            " AND purchase_ts <= click_ts + interval 30 minutes"
        ),
    )
    got = spark.sql("SELECT * FROM attr_out")
    assert got.count() == expected.count()
    assert got.select("click_id", "purchase_id").exceptAll(
        expected.select("click_id", "purchase_id")
    ).count() == 0
    spark.catalog.dropTempView("attr_out")


def test_enrich_stream_broadcast_dim_matches_batch_join(spark, sf_dir, tmp_path):
    from stock_crypto_data_pipeline_public_spark.streaming.pipeline import enrich_stream

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    e_dir = str(tmp_path / "ev")
    ev.write.mode("overwrite").parquet(e_dir)

    out = enrich_stream(
        file_stream(spark, e_dir, spark.read.parquet(e_dir).schema), dim, ["user_id"]
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("SELECT * FROM enrich_out")
    expected = ev.join(dim, "user_id", "left")
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
    # every stream row survives a left enrichment
    assert got.count() == ev.count()


def test_ensure_event_time_types(spark):
    """NTZ event-time casts to LTZ (watermarkable) preserving the wall
    clock under the pinned UTC session; LTZ input is a no-op."""
    from datetime import datetime

    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType, TimestampType

    from stock_crypto_data_pipeline_public_spark.streaming.pipeline import ensure_event_time

    wall = datetime(2024, 5, 1, 12, 30, 15)
    ntz = spark.createDataFrame([(wall,)], "ts timestamp_ntz")
    out = ensure_event_time(ntz, "ts")
    assert isinstance(out.schema["ts"].dataType, TimestampType)
    assert out.collect()[0].ts == wall  # value-preserving under UTC session

    ltz = spark.createDataFrame([(wall,)], "ts timestamp")
    again = ensure_event_time(ltz, "ts")
    assert again is ltz  # no-op, not even a projection


def test_sketch_sink_epoch_overwrite_is_replay_safe(spark, sf_dir, tmp_path):
    """run_sketch_sink lands each micro-batch's CMS cells in its own
    epoch=N partition with OVERWRITE — CMS addition is not idempotent, so
    a replayed epoch must REWRITE, never add. Simulate the worst replay
    (checkpoint wiped, entire stream reprocessed from scratch): epoch 0
    rewrites identically and read_sketch still equals the one-shot
    sketch; an append-mode bug would double every cell."""
    import shutil

    from pyspark.sql import functions as F

    from stock_crypto_data_pipeline_public_spark.operators.sketch import count_min_table
    from stock_crypto_data_pipeline_public_spark.sources.tables import load_table
    from stock_crypto_data_pipeline_public_spark.streaming.pipeline import (
        file_stream,
        read_sketch,
        run_sketch_sink,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("event_id", "user_id")
    )
    landing, sketch, ckpt = (
        str(tmp_path / "landing"),
        str(tmp_path / "sketch"),
        str(tmp_path / "ckpt"),
    )
    ev.coalesce(1).write.parquet(landing)

    def drain():
        q = run_sketch_sink(
            file_stream(spark, landing, ev.schema), sketch, "user_id", ckpt
        )
        q.awaitTermination()

    drain()
    shutil.rmtree(ckpt)  # lose the checkpoint: the full stream replays
    drain()

    merged = read_sketch(spark, sketch)
    oneshot = count_min_table(ev, "user_id")
    diff = merged.join(
        oneshot.withColumnsRenamed({"cnt": "cnt2"}), ["r", "c"], "full"
    ).filter(
        F.coalesce("cnt", F.lit(-1)) != F.coalesce("cnt2", F.lit(-2))
    )
    assert diff.count() == 0


def test_sketch_sink_multi_epoch_wipe_and_compaction(spark, sf_dir, tmp_path):
    """The stale-epoch hazard the single-epoch replay test cannot see: a
    MULTI-epoch history (three drains → epoch=0,1,2) replayed after a
    checkpoint wipe into FEWER epochs (one drain → epoch=0) leaves stale
    epoch=1/epoch=2 partitions on disk. The _max_epoch pointer (lowered by
    the replay's first epoch) must exclude them — summing every partition
    on disk would double-count exactly those cells. Then compact_sketch
    collapses the log to one partition and a further incremental drain
    keeps extending it, both preserving read_sketch == one-shot."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from stock_crypto_data_pipeline_public_spark.operators.sketch import count_min_table
    from stock_crypto_data_pipeline_public_spark.sources.tables import load_table
    from stock_crypto_data_pipeline_public_spark.streaming.pipeline import (
        compact_sketch,
        file_stream,
        read_sketch,
        run_sketch_sink,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("event_id", "user_id")
    )
    landing, sketch, ckpt = (
        str(tmp_path / "landing"),
        str(tmp_path / "sketch"),
        str(tmp_path / "ckpt"),
    )

    def drain():
        q = run_sketch_sink(
            file_stream(spark, landing, ev.schema), sketch, "user_id", ckpt
        )
        q.awaitTermination()

    def assert_equals_oneshot(upto_slice):
        merged = read_sketch(spark, sketch)
        oneshot = count_min_table(upto_slice, "user_id")
        diff = merged.join(
            oneshot.withColumnsRenamed({"cnt": "cnt2"}), ["r", "c"], "full"
        ).filter(
            F.coalesce("cnt", F.lit(-1)) != F.coalesce("cnt2", F.lit(-2))
        )
        assert diff.count() == 0

    # three drains of one file each → epochs 0, 1, 2
    for m in (0, 1, 2):
        ev.filter(F.col("event_id") % 4 == m).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
        drain()
    first3 = ev.filter(F.col("event_id") % 4 != 3)
    assert_equals_oneshot(first3)
    epochs = sorted(e for e in os.listdir(sketch) if e.startswith("epoch="))
    assert epochs == ["epoch=0", "epoch=1", "epoch=2"]

    # wipe the checkpoint: availableNow replays ALL files in ONE batch →
    # only epoch=0 is rewritten; epoch=1/2 are now stale on disk
    shutil.rmtree(ckpt)
    drain()
    assert os.path.isdir(os.path.join(sketch, "epoch=1"))  # hazard is real
    assert os.path.isdir(os.path.join(sketch, "epoch=2"))
    assert_equals_oneshot(first3)  # pointer=0 excludes the stale epochs

    # compaction: one live partition, same merged cells
    stats = compact_sketch(spark, sketch)
    assert stats["n_epochs_after"] == 1
    epochs = [e for e in os.listdir(sketch) if e.startswith("epoch=")]
    assert len(epochs) == 1
    assert_equals_oneshot(first3)

    # the stream keeps extending the compacted log incrementally
    ev.filter(F.col("event_id") % 4 == 3).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    drain()
    assert_equals_oneshot(ev)


def test_sketch_compaction_idempotent_and_pre_pointer_fallback(spark, sf_dir, tmp_path):
    """Two residual branches of the round-9 sketch protocol: (a) running
    compact_sketch twice is value-identical to running it once (the second
    pass re-materializes the same single partition); (b) a PRE-pointer
    layout — epoch partitions on disk with no _max_epoch file, i.e. a log
    written before round 9 — reads as the sum of ALL epochs, and
    compact_sketch adopts the highest epoch on disk as the pointer."""
    import os

    from pyspark.sql import functions as F

    from stock_crypto_data_pipeline_public_spark.operators.sketch import count_min_table
    from stock_crypto_data_pipeline_public_spark.sources.tables import load_table
    from stock_crypto_data_pipeline_public_spark.streaming.pipeline import (
        _MAX_EPOCH,
        compact_sketch,
        read_sketch,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("event_id", "user_id")
    )
    sketch = str(tmp_path / "sketch")
    # hand-build a pre-pointer epoch log: two disjoint slices, no _max_epoch
    count_min_table(ev.filter("event_id % 2 = 0"), "user_id").write.parquet(
        f"{sketch}/epoch=0"
    )
    count_min_table(ev.filter("event_id % 2 = 1"), "user_id").write.parquet(
        f"{sketch}/epoch=1"
    )
    assert not os.path.exists(os.path.join(sketch, _MAX_EPOCH))

    def assert_equals_oneshot():
        merged = read_sketch(spark, sketch)
        oneshot = count_min_table(ev, "user_id")
        diff = merged.join(
            oneshot.withColumnsRenamed({"cnt": "cnt2"}), ["r", "c"], "full"
        ).filter(
            F.coalesce("cnt", F.lit(-1)) != F.coalesce("cnt2", F.lit(-2))
        )
        assert diff.count() == 0

    assert_equals_oneshot()  # no pointer → every epoch is live

    stats = compact_sketch(spark, sketch)
    assert stats == {"n_epochs_before": 2, "n_epochs_after": 1, "max_epoch": 1}
    with open(os.path.join(sketch, _MAX_EPOCH)) as f:
        assert f.read().strip() == "1"  # adopted the highest epoch on disk
    assert_equals_oneshot()

    again = compact_sketch(spark, sketch)  # idempotent re-compaction
    assert again == {"n_epochs_before": 1, "n_epochs_after": 1, "max_epoch": 1}
    assert_equals_oneshot()


def test_sketch_wipe_replay_two_phase_never_overcounts(spark, sf_dir, tmp_path):
    """r10 verdict #7: the wipe-replay transient-overcount window is CLOSED.
    Build a 3-epoch history (pointer=2), then land the replay's epoch 0 via
    land_sketch_epoch and assert the read at EVERY phase boundary is a
    consistent view — the full pre-wipe sum before the flip, the pre-wipe
    epoch-0 prefix between flip and swap, the replayed full sum after —
    never the replayed-plus-stale mix the old in-place overwrite allowed."""
    import os

    from pyspark.sql import functions as F

    from stock_crypto_data_pipeline_public_spark.operators.sketch import count_min_table
    from stock_crypto_data_pipeline_public_spark.sources.tables import load_table
    from stock_crypto_data_pipeline_public_spark.streaming.pipeline import (
        file_stream,
        land_sketch_epoch,
        read_sketch,
        run_sketch_sink,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("event_id", "user_id")
    )
    landing, sketch, ckpt = (
        str(tmp_path / "landing"),
        str(tmp_path / "sketch"),
        str(tmp_path / "ckpt"),
    )

    def drain():
        q = run_sketch_sink(
            file_stream(spark, landing, ev.schema), sketch, "user_id", ckpt
        )
        q.awaitTermination()

    def merged_cells():
        return {
            (r.r, r.c): r.cnt for r in read_sketch(spark, sketch).collect()
        }

    def oneshot_cells(sl):
        return {(r.r, r.c): r.cnt for r in count_min_table(sl, "user_id").collect()}

    # three drains of one file each → epochs 0, 1, 2; pointer = 2
    for m in (0, 1, 2):
        ev.filter(F.col("event_id") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
        drain()
    pre_wipe_full = merged_cells()
    assert pre_wipe_full == oneshot_cells(ev)
    epoch0_prefix = oneshot_cells(ev.filter(F.col("event_id") % 3 == 0))

    # the replay's first epoch compresses ALL files into one batch
    seen = []

    def on_phase(phase):
        got = merged_cells()
        if phase == "staged":  # old pointer, staging invisible → full pre-wipe
            assert got == pre_wipe_full, "staging leaked into reads"
        else:  # "flipped": pointer=0, old epoch-0 content → pre-wipe prefix
            assert got == epoch0_prefix, "flip exposed replayed+stale mix"
        seen.append(phase)

    land_sketch_epoch(count_min_table(ev, "user_id"), sketch, 0, on_phase=on_phase)
    assert seen == ["staged", "flipped"]
    assert merged_cells() == oneshot_cells(ev)  # replayed full view
    # stale partitions still on disk — excluded by the pointer, as before
    assert os.path.isdir(os.path.join(sketch, "epoch=1"))
    assert os.path.isdir(os.path.join(sketch, "epoch=2"))
