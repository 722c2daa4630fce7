"""Block-pair self-join (operators/blockpair.py): every unordered pair of
distinct ids must be scored exactly once — the mask contract that makes
x04/x11/t08 exact. Property-tested against a naive O(n²) loop."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stock_crypto_data_pipeline_public_spark.operators.blockpair import block_pair_partials


def _run(spark, rows, n_blocks=None):
    """Count each scored (min_id, max_id) pair; return the multiset."""
    df = spark.createDataFrame(rows, "id long, val long")

    def score(ids_a, vals_a, ids_b, vals_b, mask):
        ia, ib = np.nonzero(mask)
        if len(ia) == 0:
            return None
        lo = np.minimum(ids_a[ia], ids_b[ib])
        hi = np.maximum(ids_a[ia], ids_b[ib])
        return pd.DataFrame({"lo": lo, "hi": hi, "n": np.ones(len(ia), dtype=np.int64)})

    out = block_pair_partials(
        spark, df, "id", "val", score, "lo long, hi long, n long", n_blocks=n_blocks
    )
    agg = out.groupBy("lo", "hi").sum("n").collect()
    return {(r["lo"], r["hi"]): r["sum(n)"] for r in agg}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ids=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=2, max_size=40, unique=True),
    n_blocks=st.integers(min_value=1, max_value=7),
)
def test_every_unordered_pair_scored_exactly_once(spark, ids, n_blocks):
    rows = [(i, i * 7) for i in ids]
    got = _run(spark, rows, n_blocks=n_blocks)
    expected = {
        (min(a, b), max(a, b)): 1
        for k, a in enumerate(ids)
        for b in ids[k + 1:]
    }
    assert got == expected


def test_default_block_count(spark):
    ids = list(range(25))
    got = _run(spark, [(i, i) for i in ids])
    assert sum(got.values()) == 25 * 24 // 2
    assert set(got.values()) == {1}


def test_duplicate_ids_rejected(spark):
    """Duplicate id values violate the exactly-once contract (the dup pair
    is never scored, while each copy double-counts against other rows) —
    the per-block check must fail loudly instead."""
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception, match="duplicate id"):
        try:
            _run(spark, [(1, 1), (1, 2), (2, 3)], n_blocks=2)
        except Py4JJavaError as e:  # executor-side ValueError surfaces wrapped
            raise ValueError(str(e)) from e
