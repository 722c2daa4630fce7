"""Incremental near-dup: new docs vs the persisted shingle inverted index.

The contract: processing a corpus in increments emits exactly the batch
pair set — each increment contributes the pairs that involve at least one
of its documents — and replays are no-ops."""

from pyspark.sql import functions as F

from stock_crypto_data_pipeline_public_spark.operators.dedup import (
    copair_counts,
    exploded_shingles,
    incremental_neardup,
    neardup_index_path,
)
from stock_crypto_data_pipeline_public_spark.sources.tables import load_table


def _batch_edges(docs):
    """The t11-style batch edge set (trigram Jaccard ≥ 1/2) with counts."""
    sh = exploded_shingles(docs, "doc_id", "text", 3)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    pairs = copair_counts(sh, "doc_id", "shingle")
    return (
        pairs.join(counts.alias("ca"), F.col("doc_a") == F.col("ca.doc_id"))
        .join(counts.alias("cb"), F.col("doc_b") == F.col("cb.doc_id"))
        .filter(
            2 * F.col("n_common") >= F.col("ca.n") + F.col("cb.n") - F.col("n_common")
        )
        .select("doc_a", "doc_b", "n_common")
    )


def _edge_set(df):
    return {(r["doc_a"], r["doc_b"], r["n_common"]) for r in df.collect()}


def test_increments_compose_to_batch_pairs(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    index_dir = str(tmp_path / "neardup_index")

    e1 = incremental_neardup(spark, half_a, index_dir)
    e2 = incremental_neardup(spark, half_b, index_dir)
    got = _edge_set(e1.select("doc_a", "doc_b", "n_common")) | _edge_set(
        e2.select("doc_a", "doc_b", "n_common")
    )
    want = _edge_set(_batch_edges(docs))
    assert got == want and want, "increments must compose to the batch edge set"
    # increment 1 only sees A-internal pairs; increment 2 adds every pair
    # touching B — the two must partition the batch set
    assert not (_edge_set(e1.select("doc_a", "doc_b", "n_common"))
                & _edge_set(e2.select("doc_a", "doc_b", "n_common")))


def test_replay_is_noop_and_index_stays_clean(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") < 100)
    index_dir = str(tmp_path / "idx")
    first = incremental_neardup(spark, batch, index_dir)
    assert first.count() >= 0
    postings_path = neardup_index_path(index_dir)
    n_postings = spark.read.parquet(postings_path).count()
    replay = incremental_neardup(spark, batch, index_dir)
    assert replay.count() == 0, "re-running an indexed batch must emit nothing"
    postings = spark.read.parquet(postings_path)
    assert postings.count() == n_postings
    assert (
        postings.groupBy("doc_id", "shingle").count()
        .filter(F.col("count") > 1).count() == 0
    ), "no posting may be indexed twice"
    # the embedded per-doc count must equal the doc's actual posting count
    bad = (
        postings.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("actual"), F.first("n").alias("stored"))
        .filter(F.col("actual") != F.col("stored"))
    )
    assert bad.count() == 0


def test_streaming_neardup_sink_accumulates_batch_pairs(spark, sf_dir, tmp_path):
    """Near-dup detection ON the stream: two availableNow drains over a
    growing file source (restart with the same checkpoint in between) must
    leave edges_path holding exactly the one-shot batch edge set — the
    streaming path is the incremental operator under foreachBatch, so the
    increments-compose-to-batch contract carries over micro-batches and
    restarts."""
    from stock_crypto_data_pipeline_public_spark.streaming.pipeline import (
        file_stream,
        run_neardup_sink,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    in_dir = str(tmp_path / "in")
    idx_dir = str(tmp_path / "idx")
    edges_dir = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt")

    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(in_dir)
    run_neardup_sink(
        file_stream(spark, in_dir, docs.schema), idx_dir, edges_dir, ckpt
    ).awaitTermination()
    # the stream grows; a NEW query on the same checkpoint (a restart)
    # drains only the unseen files
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(in_dir)
    run_neardup_sink(
        file_stream(spark, in_dir, docs.schema), idx_dir, edges_dir, ckpt
    ).awaitTermination()

    got = _edge_set(
        spark.read.parquet(edges_dir).select("doc_a", "doc_b", "n_common")
    )
    want = _edge_set(_batch_edges(docs))
    assert got == want and want


def test_crash_between_edge_write_and_index_fold_loses_nothing(
    spark, sf_dir, tmp_path
):
    """The crash-safety contract of the edges_path form: edges append
    BEFORE the index fold, so a crash in between replays to duplicate
    edges (recovered by read_neardup_edges), never to lost edges.

    The crash is simulated for real: the index fold is forced to fail
    (postings path parent is a regular file) AFTER the operator has done
    its edge append — proving the write order — then the batch replays
    against a working index dir, as a restarted job would."""
    import pytest

    from stock_crypto_data_pipeline_public_spark.operators.dedup import (
        read_neardup_edges,
    )

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") < 200)
    edges_dir = str(tmp_path / "edges")

    # reference: what the batch should contribute (fresh index, no crash)
    want = _edge_set(
        incremental_neardup(spark, batch, str(tmp_path / "ref_idx"))
        .select("doc_a", "doc_b", "n_common")
    )
    assert want, "test corpus must contain near-dup pairs"

    # crashing run: index_dir nested under a regular FILE → the postings
    # append raises, exactly the crash window between the two writes
    blocker = tmp_path / "blocker"
    blocker.write_text("")
    with pytest.raises(Exception):
        incremental_neardup(
            spark, batch, str(blocker / "idx"), edges_path=edges_dir
        )
    # order proven: the edges survived the crash
    assert _edge_set(
        spark.read.parquet(edges_dir).select("doc_a", "doc_b", "n_common")
    ) == want

    # restart against a good index dir: the batch is unindexed, so it
    # reprocesses and appends the same edges AGAIN (at-least-once)...
    idx_dir = str(tmp_path / "idx")
    incremental_neardup(spark, batch, idx_dir, edges_path=edges_dir)
    raw = spark.read.parquet(edges_dir)
    assert raw.count() == 2 * len(want), "replay appends duplicates, not losses"
    # ...and distinct-on-read restores exactly-once
    assert _edge_set(
        read_neardup_edges(spark, edges_dir).select("doc_a", "doc_b", "n_common")
    ) == want
    # a second replay after the successful fold is a true no-op
    incremental_neardup(spark, batch, idx_dir, edges_path=edges_dir)
    assert spark.read.parquet(edges_dir).count() == 2 * len(want)


def test_edge_log_compaction_preserves_the_deduped_set(spark, sf_dir, tmp_path):
    """compact_neardup_edges rewrites the at-least-once log as its
    distinct set: the post-compaction raw read equals the pre-compaction
    deduped view, so replay history stops costing anything."""
    from stock_crypto_data_pipeline_public_spark.operators.dedup import (
        compact_neardup_edges,
        read_neardup_edges,
    )

    docs = load_table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") < 200)
    edges_dir = str(tmp_path / "edges")
    idx = str(tmp_path / "idx")
    incremental_neardup(spark, batch, idx, edges_path=edges_dir)
    # simulate a crash replay's duplicate append
    dup = spark.read.parquet(edges_dir)
    dup.write.mode("append").parquet(edges_dir)
    want = _edge_set(read_neardup_edges(spark, edges_dir).select("doc_a", "doc_b", "n_common"))
    assert want

    stats = compact_neardup_edges(spark, edges_dir)
    assert stats["n_rows_before"] == 2 * stats["n_rows_after"]
    got_raw = _edge_set(spark.read.parquet(edges_dir).select("doc_a", "doc_b", "n_common"))
    assert got_raw == want
