"""Cross-batch stateful sessionization (streaming/stateful.py): state must
carry open sessions across micro-batch boundaries."""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F

from stock_crypto_data_pipeline_public_spark.streaming.stateful import sessionize_stream


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    df.coalesce(1).write.mode("append").parquet(path)


def test_sessions_span_micro_batches(spark, tmp_path):
    src = str(tmp_path / "events")
    os.makedirs(src)
    t = lambda h, m: datetime(2024, 1, 1, h, m)

    # batch 1: user 1 opens a session (2 events), user 2 opens one
    _write_batch(spark, src, [(1, t(10, 0)), (1, t(10, 10)), (2, t(9, 0))])
    # batch 2 (separate file): user 1 continues within the gap, then jumps
    # past it — closing session 1 (3 events) and opening session 2;
    # user 2 jumps straight past the gap — closing their 1-event session
    _write_batch(spark, src, [(1, t(10, 20)), (1, t(12, 0)), (2, t(13, 0))])

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("closed_sessions")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {
        (r.user_id, r.session_no): r
        for r in spark.sql("SELECT * FROM closed_sessions").collect()
    }
    # only CLOSED sessions emit; the open ones (user1 #2, user2 #2) stay in state
    assert set(rows) == {(1, 1), (2, 1)}

    u1 = rows[(1, 1)]
    assert u1.n_events == 3  # 10:00 + 10:10 (batch 1) + 10:20 (batch 2!)
    assert u1.session_start_us == int(t(10, 0).timestamp() * 1_000_000)
    assert u1.session_end_us == int(t(10, 20).timestamp() * 1_000_000)

    u2 = rows[(2, 1)]
    assert u2.n_events == 1
    assert u2.session_end_us == int(t(9, 0).timestamp() * 1_000_000)
