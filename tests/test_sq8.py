"""Error contract for x15's SQ8 scalar quantization: the quantized cosine
differs from the exact cosine by at most the DERIVED per-pair bound (no magic
tolerances), and codes/scales obey their invariants."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _quantize(v: np.ndarray):
    """NumPy twin of the x15 plan: unit-normalize, symmetric int8 codes with
    half-up rounding, per-vector scale = max|u|/127."""
    nrm = math.sqrt(float((v.astype(np.float64) ** 2).sum()))
    u = v.astype(np.float64) / nrm
    scale = float(np.abs(u).max()) / 127.0
    q = np.clip(np.floor(u / scale + 0.5), -127, 127).astype(np.int64)
    return u, scale, q


vectors = st.lists(
    st.floats(min_value=-10.0, max_value=10.0, allow_nan=False, width=32),
    min_size=8,
    max_size=64,
).filter(lambda xs: any(abs(x) > 1e-3 for x in xs))


@settings(max_examples=200, deadline=None)
@given(a=vectors, b=vectors)
def test_sq8_cosine_error_within_derived_bound(a, b):
    n = min(len(a), len(b))
    va, vb = np.array(a[:n], dtype=np.float32), np.array(b[:n], dtype=np.float32)
    ua, sa, qa = _quantize(va)
    ub, sb, qb = _quantize(vb)

    exact = float(ua @ ub)
    approx = sa * sb * float((qa * qb).sum())

    # |u_i - s·q_i| <= s/2 per element (half-up rounding, clamp only ever
    # tightens toward zero error at the max element), so
    # |approx - exact| <= Σ|ub_i|·(sa/2) + Σ|sa·qa_i|·(sb/2)
    bound = float(np.abs(ub).sum()) * sa / 2 + float(np.abs(qa).sum()) * sa * sb / 2
    assert abs(approx - exact) <= bound + 1e-12


@settings(max_examples=100, deadline=None)
@given(v=vectors)
def test_sq8_code_invariants(v):
    _, scale, q = _quantize(np.array(v, dtype=np.float32))
    assert scale > 0
    assert q.min() >= -127 and q.max() <= 127
    # the max-|u| element always lands on ±127 exactly (it defines the scale)
    assert np.abs(q).max() == 127


def test_sq8_plan_agrees_with_numpy_model(spark, sf_dir):
    """The registered x15 query's approx_sim equals the NumPy model on the
    real embeddings — ties the plan's clamp/floor expressions to the model
    the property tests verify."""
    from stock_crypto_data_pipeline_public_spark.plans.vectorops import (
        x15_sq8_rerank_search,
    )
    from stock_crypto_data_pipeline_public_spark.sources.tables import load_table

    out = {
        (r.query_id, r.neighbor_id): r.approx_sim
        for r in x15_sq8_rerank_search(spark, sf_dir).collect()
    }
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float32)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    assert out
    for (qid, nid), got in out.items():
        _, sa, qa = _quantize(emb[qid])
        _, sb, qb = _quantize(emb[nid])
        want = (sa * sb) * float((qa * qb).sum())
        # plan rounds half-up to 6 dp (functions/numeric.rnd)
        want = math.floor(want * 1e6 + 0.5) / 1e6
        assert got == pytest.approx(want, abs=1e-12), (qid, nid)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
