"""Streaming-path gated queries: the driver's value-hash gate has covered
every batch operator since round 3, but the streaming layer (readStream →
foreachBatch → checkpoint) was only ever proven by local tests. s01 closes
that gap: its returned DataFrame is computed from tables that were LANDED
BY STRUCTURED STREAMING inside the query — two drains with a checkpoint
restart and a deliberate at-least-once file redelivery between them — so a
checkpoint regression, a foreachBatch replay bug, or a broken idempotent
append all change the hash.

Reference analog: the Kafka consumer's poll → batch → idempotent-insert
loop (reference scripts/kafka/kafka_consumer.py:447-563) with its
at-least-once redelivery contract; the file stream is this container's
stand-in for the Kafka source (streaming/pipeline.file_stream), identical
downstream pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import oracle_rnd, rnd
from ..sources.tables import load_table
from .registry import query


# --------------------------------------------------------------------------
# s01 — streaming ingest end state, both delivery contracts at once:
#
#   landing:  phase A (even event_ids)          → drain 1
#             phase B (odd) + phase A REPLAYED  → drain 2 (same checkpoints)
#
#   sink P: the NATIVE parquet file sink (writeStream.format("parquet") +
#     _spark_metadata commit log). Exactly-once PER SOURCE FILE — but the
#     replayed phase-A files are NEW files, so they land twice:
#     n_plain = |A∪B| + |A|. If the checkpoint restart reprocessed drain-1
#     files, n_plain would be |2A∪B| + |A| → hash fail; if the restart
#     skipped the new files, rows go missing → hash fail. The checkpoint
#     is load-bearing in both directions.
#
#   sink V: run_incremental_sink (foreachBatch → idempotent_append keyed on
#     event_id — the reference consumer's ON CONFLICT DO NOTHING,
#     kafka_consumer.py:520-547). The same redelivered files dedup away:
#     n_vault = |A∪B| exactly. A dedup regression double-lands phase A →
#     hash fail.
#
# The oracle states both end states in closed form over the source table.
# Scale: each micro-batch does one left-anti join against the target's key
# column (parquet column prune) — batch-size work, not corpus-size; the
# native sink is a pure append with an O(1) manifest commit.
# --------------------------------------------------------------------------
@query(
    "s01_streaming_ingest_end_state",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) + count(*) FILTER (event_id % 2 = 0) AS BIGINT)
                                                         AS n_plain,
           CAST(count(*) AS BIGINT)                      AS n_vault,
           {oracle_rnd('sum(value)', 4)}                 AS sum_value,
           CAST(max(event_id) AS BIGINT)                 AS max_event_id
    FROM events
    GROUP BY event_type
    """,
)
def s01_streaming_ingest_end_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..streaming.pipeline import file_stream, run_incremental_sink

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    base = tempfile.mkdtemp(prefix="s01_stream_")
    landing = f"{base}/landing"
    plain_tgt, vault_tgt = f"{base}/raw_plain", f"{base}/raw_vault"

    def drain() -> None:
        stream = file_stream(spark, landing, ev.schema)
        qp = (
            stream.writeStream.format("parquet")
            .option("path", plain_tgt)
            .option("checkpointLocation", f"{base}/ckpt_plain")
            .trigger(availableNow=True)
            .start()
        )
        qv = run_incremental_sink(
            stream,
            vault_tgt,
            keys=["event_id"],
            checkpoint=f"{base}/ckpt_vault",
        )
        qp.awaitTermination()
        qv.awaitTermination()

    try:
        phase_a = ev.filter(F.col("event_id") % 2 == 0)
        phase_a.write.mode("append").parquet(landing)
        drain()
        # at-least-once redelivery: phase B plus phase A AGAIN as new files
        ev.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(landing)
        phase_a.write.mode("append").parquet(landing)
        drain()  # fresh start(), same checkpoints: must resume, not replay

        plain = (
            spark.read.parquet(plain_tgt)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_plain"))
        )
        vault = (
            spark.read.parquet(vault_tgt)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_vault"),
                rnd(F.sum("value"), 4).alias("sum_value"),
                F.max("event_id").alias("max_event_id"),
            )
        )
        out = plain.join(vault, "event_type")
        return out.localCheckpoint(eager=True)  # materialize before rmtree
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------------------------------------
# s02 — event-time WATERMARK semantics end to end: daily windowed counts
# (streaming/pipeline.windowed_counts — window + withWatermark + append
# mode) over three checkpoint-resumed drains:
#
#   drain 1: everything except the late set (event_id % 17 = 3), ONE file
#            → one micro-batch; watermark lands at max(on-time ts) − 1 day.
#   drain 2: the late set PLUS one sentinel row 30 days past max(ts),
#            ONE file → one micro-batch resumed from drain 1's checkpoint.
#            Spark's contract (pinned empirically before this query was
#            written): rows are filtered against the watermark from the
#            PREVIOUS batch — so every late row is judged against the
#            drain-1 watermark (DROPPED iff window.end <= it, admitted
#            into the still-open window otherwise) even though the
#            sentinel rides in the same batch; the watermark then advances
#            at batch END, sweeping past every real window, and append
#            mode EMITS them exactly once. The sentinel's own window
#            stays open and must NOT appear.
#
# The sink's final content is therefore a pure function of the source
# table: daily counts over on-time rows plus exactly the late rows whose
# window end exceeded the drain-1 watermark. The oracle states that
# closed form — a drop-rule regression (admitting expired rows or
# dropping admissible ones), a watermark that fails to persist across the
# restarts, a double emission, or a leaked open window all hash-fail.
# (Precision note: Spark tracks watermarks in ms, the oracle in µs —
# divergence needs max(ts)−1d within 1 ms of a midnight boundary; the
# fixture max is hours away at every SF, checked when this was built.)
#
# Scale: windowed agg state is hash-partitioned by (window, event_type);
# the watermark bounds state to ~1 day of open windows regardless of
# stream length — this is THE mechanism that makes infinite streams
# finite-state, and it is now a gated number, not a doc claim.
# --------------------------------------------------------------------------
@query(
    "s02_streaming_watermark_end_state",
    oracle=f"""
    WITH src AS (
        SELECT event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE ts IS NOT NULL
    ),
    w1 AS (
        SELECT max(ts) - INTERVAL 1 DAY AS wm FROM src WHERE event_id % 17 <> 3
    ),
    kept AS (
        SELECT * FROM src
        WHERE event_id % 17 <> 3
           OR date_trunc('day', ts) + INTERVAL 1 DAY > (SELECT wm FROM w1)
    )
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP)   AS window_start,
           event_type,
           CAST(count(*) AS BIGINT)                   AS n_events,
           {oracle_rnd('sum(value)', 4)}              AS total_value
    FROM kept
    GROUP BY 1, 2
    """,
)
def s02_streaming_watermark_end_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime
    import shutil
    import tempfile

    from ..streaming.pipeline import file_stream, windowed_counts

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", "ts"
    )
    base = tempfile.mkdtemp(prefix="s02_stream_")
    landing, sink, ckpt = f"{base}/landing", f"{base}/sink", f"{base}/ckpt"

    def drain() -> None:
        stream = file_stream(spark, landing, ev.schema)
        q = (
            windowed_counts(stream, "ts", "1 day", "1 day")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        on_time = ev.filter("event_id % 17 <> 3")
        late = ev.filter("event_id % 17 = 3")
        # single file per phase => exactly one micro-batch per drain, so
        # the watermark position between drains is fully determined
        on_time.coalesce(1).write.mode("append").parquet(landing)
        drain()
        mx = ev.agg(F.max("ts")).first()[0]  # bounded 1-row pull
        sentinel = spark.createDataFrame(
            [(-1, "sentinel", 0.0, mx + datetime.timedelta(days=30))], ev.schema
        )
        late.unionByName(sentinel).coalesce(1).write.mode("append").parquet(landing)
        drain()

        out = spark.read.parquet(sink).select(
            "window_start",
            "event_type",
            "n_events",
            rnd(F.col("total_value"), 4).alias("total_value"),
        )
        return out.localCheckpoint(eager=True)  # materialize before rmtree
    finally:
        shutil.rmtree(base, ignore_errors=True)
