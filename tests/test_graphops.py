"""Graph-family mechanism tests. The g01–g03 queries themselves are
oracle-gated (tests/test_oracle_parity.py + the driver window); these pin
the scale-critical mechanics the oracles can't see: the top-K edge cut's
determinism at the K boundary and its TakeOrdered physical form."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_crypto_data_pipeline_public_spark.plans.graphops import top_edges


def _co(spark, rows, n_parts):
    return spark.createDataFrame(rows, "s1 int, s2 int, w long").repartition(n_parts)


def test_top_edges_k_boundary_tiebreak_deterministic(spark):
    # 10 edges all tied at w=5 plus 3 heavier ones; K=6 cuts INSIDE the
    # tie group — the (s1, s2) total order must decide, identically under
    # any input partitioning
    heavy = [(9, 10, 9), (8, 9, 8), (7, 8, 7)]
    tied = [(i, j, 5) for i in range(5) for j in (i + 1, i + 2)]
    rows = heavy + tied
    want = None
    for n_parts in (1, 3, 16):
        got = [
            (r.s1, r.s2)
            for r in top_edges(_co(spark, rows, n_parts), 6)
            .orderBy("s1", "s2")
            .collect()
        ]
        if want is None:
            want = got
        assert got == want, f"partitioning {n_parts} changed the K cut"
    # heavy edges all kept; the deterministic (weight desc, s1, s2)
    # tie-break admits exactly the 3 smallest-(s1,s2) pairs of the tie group
    assert want == [(0, 1), (0, 2), (1, 2), (7, 8), (8, 9), (9, 10)]


def test_top_edges_plans_take_ordered_not_full_sort(spark):
    rows = [(i, i + 1, i % 7) for i in range(100)]
    plan = top_edges(_co(spark, rows, 8), 10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # a global Sort node outside the TakeOrdered would mean a full sort
    assert "Sort [" not in plan.replace("TakeOrderedAndProject", "")


def test_top_edges_by_cutoff_matches_topk_superset(spark):
    """The scale-path cutoff selection keeps a deterministic superset of
    the exact top-K whose overshoot is bounded by the cutoff tie group."""
    from stock_crypto_data_pipeline_public_spark.plans.graphops import top_edges_by_cutoff

    # 200 edges, weights 0..49 with 4-way ties
    rows = [(i, i + 1000, i % 50) for i in range(200)]
    co = _co(spark, rows, 8)
    k = 30
    exact = {(r.s1, r.s2) for r in top_edges(co, k).collect()}
    kept = {(r.s1, r.s2) for r in top_edges_by_cutoff(co, k).collect()}
    assert kept >= exact                      # never loses a top-K edge
    # overshoot bounded: everything kept is within the cutoff tie group
    w = {(s1, s2): ww for s1, s2, ww in rows}
    min_kept = min(w[e] for e in kept)
    assert all(w[e] >= min_kept for e in kept)
    assert len(kept) <= k + 4 + co.count() // 100  # tie group + sketch slack

    # degenerate: k >= n keeps everything, no aggregate needed
    assert top_edges_by_cutoff(co, 500).count() == 200

    # deterministic under repartitioning (membership is per-edge weight)
    kept2 = {(r.s1, r.s2) for r in top_edges_by_cutoff(_co(spark, rows, 3), k).collect()}
    assert kept2 == kept
