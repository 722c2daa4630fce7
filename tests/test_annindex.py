"""Persisted ANN index: build-once layout, driver-side probing, and the
partition-pruning contract (probed clusters = the only files read)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from stock_crypto_data_pipeline_public_spark.operators.annindex import (
    _vectors_path,
    add_to_ann_index,
    build_ann_index,
    probe_centroids,
    query_ann_index,
)
from stock_crypto_data_pipeline_public_spark.sources.tables import load_table

DIM = 64
K = 8
NPROBE = 2
TOPK = 5


@pytest.fixture(scope="module")
def index(spark, sf_dir, tmp_path_factory):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in rows}
    centroids = [vecs[i] for i in range(K)]  # seed convention (x05)
    index_dir = str(tmp_path_factory.mktemp("ann") / "idx")
    stats = build_ann_index(spark, emb, index_dir, centroids, DIM)
    assert stats == {"n_vectors": len(vecs), "n_centroids": K}
    return index_dir, vecs, centroids


def _np_assign(vecs, centroids):
    M = np.array([vecs[i] for i in sorted(vecs)], dtype=np.float64)
    C = np.array(centroids, dtype=np.float64)
    sims = (M @ C.T) / (
        np.linalg.norm(M, axis=1, keepdims=True) * np.linalg.norm(C, axis=1)
    )
    # ties -> lowest centroid id: argmax takes the first maximum
    return {vid: int(np.argmax(sims[j])) for j, vid in enumerate(sorted(vecs))}


def test_layout_is_partitioned_by_assignment(spark, index):
    index_dir, vecs, centroids = index
    stored = {
        int(r["vec_id"]): int(r["centroid_id"])
        for r in spark.read.parquet(_vectors_path(index_dir)).collect()
    }
    assert stored == _np_assign(vecs, centroids)
    dirs = {d for d in os.listdir(_vectors_path(index_dir)) if d.startswith("centroid_id=")}
    assert dirs == {f"centroid_id={c}" for c in set(stored.values())}


def test_probe_filter_prunes_partitions(spark, index):
    index_dir, vecs, centroids = index
    probed = probe_centroids(index_dir, vecs[100], NPROBE)
    assert len(probed) == NPROBE
    full = spark.read.parquet(_vectors_path(index_dir))
    pruned = full.filter(F.col("centroid_id").isin(probed))
    # the scan must carry the centroid filter as a PARTITION filter (pruning
    # happens at planning, before any file is opened)
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "centroid_id" in pf[0] and "IN" in pf[0], plan
    # and the files ACTUALLY read (input_file_name over the executed scan)
    # are exactly the probed clusters' — strictly fewer than the full index
    read = {r["f"] for r in pruned.select(F.input_file_name().alias("f")).distinct().collect()}
    assert read, "pruned scan must still read the probed clusters"
    for f in read:
        assert any(f"centroid_id={c}/" in f for c in probed), f
    all_files = {r["f"] for r in full.select(F.input_file_name().alias("f")).distinct().collect()}
    assert len(read) < len(all_files)


def test_query_matches_numpy_reference(spark, index):
    index_dir, vecs, centroids = index
    queries = {qid: vecs[qid] for qid in range(100, 105)}
    out = query_ann_index(spark, index_dir, queries, DIM, nprobe=NPROBE, topk=TOPK)
    got = {
        (r["query_id"], r["rk"]): (r["neighbor_id"], r["cosine_sim"])
        for r in out.collect()
    }

    assign = _np_assign(vecs, centroids)
    want = {}
    for qid, qv in queries.items():
        probes = set(probe_centroids(index_dir, qv, NPROBE))
        qn = np.linalg.norm(qv)
        cands = []
        for vid, v in vecs.items():
            if vid == qid or assign[vid] not in probes:
                continue
            sim = round(float(np.dot(qv, v) / (qn * np.linalg.norm(v))), 4)
            cands.append((-sim, vid))
        for rk, (negsim, vid) in enumerate(sorted(cands)[:TOPK], start=1):
            want[(qid, rk)] = (vid, -negsim)
    assert got == want


def test_incremental_add_equals_full_build(spark, sf_dir, index, tmp_path):
    """Daily growth must NOT rebuild: build on half the corpus, fold the
    rest in with add_to_ann_index, and the grown index must be
    indistinguishable from a one-shot build — same stored assignment, same
    query results. Replaying the add is a no-op (idempotent)."""
    full_dir, vecs, centroids = index
    emb = load_table(spark, sf_dir, "embeddings")
    ids = sorted(vecs)
    cut = ids[len(ids) // 2]
    half_dir = str(tmp_path / "half_idx")
    build_ann_index(spark, emb.filter(F.col("vec_id") < cut), half_dir, centroids, DIM)

    stats = add_to_ann_index(spark, emb.filter(F.col("vec_id") >= cut), half_dir, DIM)
    assert stats["n_added"] == len([i for i in ids if i >= cut])
    assert stats["mean_assign_sim"] is not None
    stored = {
        int(r["vec_id"]): int(r["centroid_id"])
        for r in spark.read.parquet(_vectors_path(half_dir)).collect()
    }
    assert stored == _np_assign(vecs, centroids)

    # replaying the same batch adds nothing and appends nothing
    again = add_to_ann_index(spark, emb.filter(F.col("vec_id") >= cut), half_dir, DIM)
    assert again["n_added"] == 0
    assert spark.read.parquet(_vectors_path(half_dir)).count() == len(ids)

    queries = {qid: vecs[qid] for qid in range(100, 103)}
    got = sorted(
        map(tuple, query_ann_index(spark, half_dir, queries, DIM, nprobe=NPROBE, topk=TOPK).collect())
    )
    want = sorted(
        map(tuple, query_ann_index(spark, full_dir, queries, DIM, nprobe=NPROBE, topk=TOPK).collect())
    )
    assert got == want


def test_streaming_index_sink_grows_to_full_build(spark, sf_dir, index, tmp_path):
    """The embedding stream feeds the index: seed-build on a third of the
    corpus, stream the rest in two checkpointed availableNow drains (a
    restart in between), and the grown index must answer queries exactly
    like a one-shot full build."""
    from stock_crypto_data_pipeline_public_spark.streaming.pipeline import (
        file_stream,
        run_ann_index_sink,
    )

    full_dir, vecs, centroids = index
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ids = sorted(vecs)
    cut = ids[len(ids) // 3]
    grow_dir = str(tmp_path / "grow_idx")
    build_ann_index(
        spark, emb.filter(F.col("vec_id") < cut), grow_dir, centroids, DIM
    )

    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    rest = emb.filter(F.col("vec_id") >= cut)
    mid = ids[2 * len(ids) // 3]
    rest.filter(F.col("vec_id") < mid).write.parquet(in_dir)
    run_ann_index_sink(
        file_stream(spark, in_dir, emb.schema), grow_dir, DIM, ckpt
    ).awaitTermination()
    rest.filter(F.col("vec_id") >= mid).write.mode("append").parquet(in_dir)
    run_ann_index_sink(
        file_stream(spark, in_dir, emb.schema), grow_dir, DIM, ckpt
    ).awaitTermination()

    assert spark.read.parquet(_vectors_path(grow_dir)).count() == len(ids)
    queries = {qid: vecs[qid] for qid in range(100, 103)}
    got = sorted(
        map(tuple, query_ann_index(spark, grow_dir, queries, DIM, nprobe=NPROBE, topk=TOPK).collect())
    )
    want = sorted(
        map(tuple, query_ann_index(spark, full_dir, queries, DIM, nprobe=NPROBE, topk=TOPK).collect())
    )
    assert got == want


def test_cluster_partition_compaction_preserves_queries(spark, sf_dir, index, tmp_path):
    """Repeated adds accrete small files inside each cluster directory;
    compact_table pointed at a cluster partition (the documented per-
    partition form) must shrink files without changing a single query
    answer — the maintenance story SCALE.md claims for the ANN index."""
    from stock_crypto_data_pipeline_public_spark.operators.maintenance import (
        compact_table,
        table_stats,
    )

    full_dir, vecs, centroids = index
    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "frag_idx")
    ids = sorted(vecs)
    # build from the first chunk, then many small adds → many small files
    chunks = [ids[i::5] for i in range(5)]
    build_ann_index(
        spark, emb.filter(F.col("vec_id").isin(chunks[0])), idx, centroids, DIM
    )
    for ch in chunks[1:]:
        add_to_ann_index(spark, emb.filter(F.col("vec_id").isin(ch)), idx, DIM)

    queries = {qid: vecs[qid] for qid in range(100, 103)}
    before = sorted(
        map(tuple, query_ann_index(spark, idx, queries, DIM, nprobe=NPROBE, topk=TOPK).collect())
    )
    vdir = _vectors_path(idx)
    parts = [d for d in os.listdir(vdir) if d.startswith("centroid_id=")]
    assert parts
    shrunk = 0
    for d in parts:
        p = os.path.join(vdir, d)
        st = compact_table(spark, p, target_bytes=1 << 40)
        shrunk += int(st["n_files_after"] < st["n_files_before"])
        assert st["n_files_after"] == 1
    assert shrunk > 0, "no cluster had accreted files — test is vacuous"

    after = sorted(
        map(tuple, query_ann_index(spark, idx, queries, DIM, nprobe=NPROBE, topk=TOPK).collect())
    )
    assert after == before
    # and still identical to the one-shot full build
    want = sorted(
        map(tuple, query_ann_index(spark, full_dir, queries, DIM, nprobe=NPROBE, topk=TOPK).collect())
    )
    assert after == want


def test_rebuild_with_refined_centroids(spark, sf_dir, index, tmp_path):
    """The offline lifecycle x12 trains for: refine centroids (one numpy
    Lloyd iteration, the x12 shape), REBUILD the index, and the layout +
    query contract must hold against the refined assignment — the index is
    derived data, rebuilt not patched."""
    _, vecs, seed_centroids = index
    # one Lloyd iteration: assign to seeds, recompute member means
    assign = _np_assign(vecs, seed_centroids)
    M = {k: [v for vid, v in vecs.items() if assign[vid] == k] for k in range(K)}
    refined = [
        np.mean(np.array(M[k], dtype=np.float64), axis=0).tolist()
        if M[k]
        else seed_centroids[k]
        for k in range(K)
    ]
    emb = load_table(spark, sf_dir, "embeddings")
    index_dir = str(tmp_path / "refined_idx")
    build_ann_index(spark, emb, index_dir, refined, DIM)
    stored = {
        int(r["vec_id"]): int(r["centroid_id"])
        for r in spark.read.parquet(_vectors_path(index_dir)).collect()
    }
    want = _np_assign(vecs, refined)
    assert stored == want
    # refinement must actually move some assignments (else the test is vacuous)
    assert stored != assign
    out = query_ann_index(spark, index_dir, {100: vecs[100]}, DIM, nprobe=NPROBE, topk=TOPK)
    rows = out.collect()
    assert [r["rk"] for r in rows] == list(range(1, TOPK + 1))
    probed = set(probe_centroids(index_dir, vecs[100], NPROBE))
    for r in rows:
        assert want[r["neighbor_id"]] in probed


def test_zero_norm_embedding_fails_fast(spark, sf_dir, index, tmp_path):
    """A zero-norm (or NULL) embedding has no cosine: left unchecked it
    would be assigned via NULL-ordering at build and silently excluded
    from every query result. Build and add must both fail loudly instead,
    naming the offending vec_id."""
    from py4j.protocol import Py4JJavaError
    from stock_crypto_data_pipeline_public_spark.operators.annindex import (
        add_to_ann_index,
    )

    _, vecs, centroids = index
    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    zero_row = spark.createDataFrame(
        [(999_999, [0.0] * DIM)], "vec_id long, embedding array<double>"
    )
    poisoned = emb.select("vec_id", "embedding").unionByName(zero_row)

    with pytest.raises(Exception, match="zero-norm or NULL embedding"):
        build_ann_index(
            spark, poisoned, str(tmp_path / "z1"), centroids, DIM
        )

    # incremental add shares the guard (same assignment spine)
    good_dir = str(tmp_path / "z2")
    build_ann_index(
        spark, emb.select("vec_id", "embedding"), good_dir, centroids, DIM
    )
    with pytest.raises(Exception, match="zero-norm or NULL embedding"):
        add_to_ann_index(spark, zero_row, good_dir, DIM)

    # NULL embedding trips the same check
    null_row = spark.createDataFrame(
        [(999_998, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="zero-norm or NULL embedding"):
        add_to_ann_index(spark, null_row, good_dir, DIM)


def test_diagnose_drift_flips_only_for_drifted_batches(spark, sf_dir, index, tmp_path):
    """The measured retrain trigger: an in-distribution add batch must NOT
    recommend a rebuild; a batch orthogonalized against every centroid
    (zero fit to the index geometry) must."""
    from stock_crypto_data_pipeline_public_spark.operators.annindex import (
        diagnose_drift,
    )

    _, vecs, centroids = index
    emb = load_table(spark, sf_dir, "embeddings")
    ids = sorted(vecs)
    cut = ids[len(ids) // 2]
    idx_dir = str(tmp_path / "drift_idx")
    build_ann_index(spark, emb.filter(F.col("vec_id") < cut), idx_dir, centroids, DIM)

    # in-distribution: the held-out half of the SAME corpus
    ok = diagnose_drift(spark, emb.filter(F.col("vec_id") >= cut), idx_dir, DIM)
    assert ok["n"] > 0 and not ok["recommend_rebuild"], ok

    # drifted: random vectors Gram-Schmidt-orthogonalized against every
    # centroid -> cosine ~0 to the whole codebook
    rng = np.random.default_rng(3)
    C = np.array(centroids, dtype=np.float64)
    Q, _ = np.linalg.qr(C.T)  # orthonormal basis of the centroid span
    drifted = []
    for i in range(200):
        v = rng.normal(size=DIM)
        v = v - Q @ (Q.T @ v)  # remove the centroid-span component
        v = v / np.linalg.norm(v)
        drifted.append((1_000_000 + i, [float(x) for x in v]))
    bad = spark.createDataFrame(drifted, "vec_id long, embedding array<double>")
    alarm = diagnose_drift(spark, bad, idx_dir, DIM)
    assert alarm["recommend_rebuild"], alarm
    assert alarm["rel_drop"] > ok["rel_drop"]
    assert abs(alarm["batch_mean_sim"]) < 0.05, "orthogonal batch fits ~zero"


def test_diagnose_drift_empty_batch_is_a_noop(spark, sf_dir, index, tmp_path):
    from stock_crypto_data_pipeline_public_spark.operators.annindex import (
        diagnose_drift,
    )

    _, _, centroids = index
    emb = load_table(spark, sf_dir, "embeddings")
    idx_dir = str(tmp_path / "idx")
    build_ann_index(spark, emb, idx_dir, centroids, DIM)
    empty = emb.filter(F.col("vec_id") < 0)
    rep = diagnose_drift(spark, empty, idx_dir, DIM)
    assert rep["n"] == 0 and not rep["recommend_rebuild"]


def test_streaming_sink_drift_log(spark, sf_dir, index, tmp_path):
    """The streaming ANN sink turns the drift signal operational: each
    non-empty micro-batch appends one drift-log row using the SAME verdict
    as diagnose_drift (in-distribution stream batches -> no rebuild)."""
    from stock_crypto_data_pipeline_public_spark.streaming.pipeline import (
        file_stream,
        run_ann_index_sink,
    )

    _, vecs, centroids = index
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ids = sorted(vecs)
    cut = ids[len(ids) // 2]
    idx_dir = str(tmp_path / "idx")
    build_ann_index(spark, emb.filter(F.col("vec_id") < cut), idx_dir, centroids, DIM)

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    drift_log = str(tmp_path / "drift")
    emb.filter((F.col("vec_id") >= cut) & (F.col("vec_id") % 2 == 0)).write.parquet(in_dir)
    run_ann_index_sink(
        file_stream(spark, in_dir, emb.schema), idx_dir, DIM, ckpt,
        drift_log=drift_log,
    ).awaitTermination()
    emb.filter((F.col("vec_id") >= cut) & (F.col("vec_id") % 2 == 1)).write.mode(
        "append"
    ).parquet(in_dir)
    run_ann_index_sink(
        file_stream(spark, in_dir, emb.schema), idx_dir, DIM, ckpt,
        drift_log=drift_log,
    ).awaitTermination()

    log = spark.read.parquet(drift_log).collect()
    assert len(log) == 2
    for r in log:
        assert r["n_added"] > 0
        assert not r["recommend_rebuild"], "in-distribution stream batches"
        assert abs(r["build_center_sim"]) > 0


def test_rebuild_lifecycle_improves_assignment_quality(spark, sf_dir, index, tmp_path):
    """diagnose_drift's recommended response, executable: rebuild_ann_index
    retrains the codebook (spherical k-means on the index's own assignment
    spine) and rebuilds — the k-means objective guarantees the build-time
    mean assignment similarity does not degrade, and here strictly
    improves over the raw seed codebook."""
    from stock_crypto_data_pipeline_public_spark.operators.annindex import (
        rebuild_ann_index,
    )

    _, vecs, centroids = index
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    idx = str(tmp_path / "idx")
    build_ann_index(spark, emb, idx, centroids, DIM)
    stats = rebuild_ann_index(spark, emb, idx, DIM, iters=2)
    assert stats["mean_sim_after"] > stats["mean_sim_before"], stats
    # the rebuilt index still answers queries with exact top-k semantics
    queries = {qid: vecs[qid] for qid in list(sorted(vecs))[:3]}
    out = query_ann_index(spark, idx, queries, DIM, nprobe=NPROBE, topk=TOPK)
    got = out.groupBy("query_id").count().collect()
    assert len(got) == 3 and all(r["count"] == TOPK for r in got)
