"""Semantic contract for x26's metadata-filtered k-NN: the pre-filter
branch is exact and complete (k results, all satisfying the predicate),
and the post-filter shortfall column actually measures the shortfall an
unfiltered top-R would deliver."""

from __future__ import annotations

import numpy as np
import pytest

from stock_crypto_data_pipeline_public_spark.plans.vectorops import (
    _X26_R,
    x26_filtered_knn,
)
from stock_crypto_data_pipeline_public_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def rows(spark, sf_dir):
    return x26_filtered_knn(spark, sf_dir).collect()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    out = {}
    for r in load_table(spark, sf_dir, "embeddings").collect():
        out[r.vec_id] = (np.array(r.embedding, dtype=np.float64), r.label)
    return out


def test_prefilter_is_complete_and_label_pure(rows, emb):
    """Every query delivers exactly k=5 ranked neighbors, each sharing the
    query's label — the pre-filter guarantee post-filtering cannot make."""
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert sorted(by_q) == list(range(10))
    for qid, rs in by_q.items():
        assert sorted(r.rk for r in rs) == [1, 2, 3, 4, 5]
        qlabel = emb[qid][1]
        for r in rs:
            assert emb[r.neighbor_id][1] == qlabel, (qid, r.neighbor_id)
            assert r.neighbor_id != qid


def test_postfilter_hits_match_bruteforce(rows, emb):
    """postfilter_hits_r20 equals the NumPy count of same-label rows inside
    the unfiltered quantized-order top-R — and the corpus actually exhibits
    the shortfall the row exists to pin (some query's top-R contains fewer
    than k=5 same-label rows)."""
    hits_col = {r.query_id: r[f"postfilter_hits_r{_X26_R}"] for r in rows}
    shortfall_seen = False
    for qid, (qv, qlabel) in ((i, emb[i]) for i in range(10)):
        qn = float(np.sqrt(qv @ qv))
        scored = []
        for nid, (nv, nlabel) in emb.items():
            if nid == qid:
                continue
            cos = float(qv @ nv) / (qn * float(np.sqrt(nv @ nv)))
            # quantized total order: floor-round to 4 dp, id tiebreak
            scored.append((-(np.floor(cos * 1e4 + 0.5) / 1e4), nid, nlabel))
        scored.sort()
        want = sum(1 for _, _, lbl in scored[:_X26_R] if lbl == qlabel)
        assert hits_col[qid] == want, qid
        if want < 5:
            shortfall_seen = True
    assert shortfall_seen, "corpus no longer exhibits the post-filter shortfall"


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
