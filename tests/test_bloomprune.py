"""Bloom semi-join pruning: the no-false-negatives contract, real pruning
power, exact-join equivalence, and the zero-probe-side-shuffle plan shape."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stock_crypto_data_pipeline_public_spark.operators.bloomprune import (
    bloom_prune,
    bloom_semi_join,
    build_bloom,
)

M_BITS = 1 << 20
K = 5


def _tables(spark):
    build = spark.range(1000).select(F.concat(F.lit("k"), F.col("id")).alias("key"))
    probe = spark.range(10_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"),
        (F.col("id") * 3).alias("payload"),
    )
    return build, probe


def test_no_false_negatives_and_substantial_pruning(spark):
    build, probe = _tables(spark)
    bloom = build_bloom(build, "key", M_BITS, K)
    # the bitset is sparse and tiny: broadcastable regardless of build size
    assert bloom.count() <= min(1000 * K, M_BITS // 64)

    pruned = bloom_prune(probe, bloom, "key", M_BITS, K)
    assert pruned.columns == probe.columns  # schema passes through

    got = {r["key"] for r in pruned.collect()}
    matches = {f"k{i}" for i in range(1000)}
    assert matches <= got, "bloom pruning dropped a true match (false negative)"
    # at n=1000, m=2^20, k=5 the false-positive rate is ~1e-11: survivors
    # should be essentially the matches; 50 is an enormous safety margin
    assert len(got) <= len(matches) + 50


def test_probe_side_has_no_shuffle(spark):
    build, probe = _tables(spark)
    bloom = build_bloom(build, "key", M_BITS, K)
    pruned = bloom_prune(probe, bloom, "key", M_BITS, K)
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    # every membership probe is a broadcast hash join; the probe relation
    # must never be exchanged (that is the entire point of the operator)
    assert plan.count("BroadcastHashJoin") >= K, plan
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    build_keys=st.sets(st.text(min_size=0, max_size=8), max_size=30),
    probe_keys=st.lists(st.text(min_size=0, max_size=8), max_size=60),
    m_bits=st.sampled_from([64, 1 << 10, 1 << 16]),
    k=st.integers(min_value=1, max_value=7),
)
def test_property_semi_join_equivalence(spark, build_keys, probe_keys, m_bits, k):
    """For ANY key sets and any (m, k) — including an absurdly small m=64
    where nearly everything false-positives — prune+exact-join must equal
    the plain semi join. Bloom parameters tune COST, never correctness."""
    build = spark.createDataFrame([(x,) for x in build_keys] or [(None,)], "key string")
    probe = spark.createDataFrame([(x,) for x in probe_keys] or [(None,)], "key string")
    got = sorted(r["key"] for r in bloom_semi_join(probe, build, "key", m_bits, k).collect())
    want = sorted(r["key"] for r in probe.join(build, "key", "left_semi").collect())
    assert got == want


def test_bloom_semi_join_equals_exact_semi_join(spark):
    build, probe = _tables(spark)
    # nulls never match in SQL semi-join semantics; the operator must agree
    probe = probe.unionByName(
        spark.sql("SELECT CAST(NULL AS STRING) key, CAST(-1 AS BIGINT) payload")
    )
    got = sorted(
        map(tuple, bloom_semi_join(probe, build, "key", M_BITS, K).collect())
    )
    want = sorted(
        map(tuple, probe.join(build, "key", "left_semi").collect())
    )
    assert got == want and want


def test_double_hash_step_never_zero(spark):
    """Kirsch-Mitzenmacher degenerate case: with a zero step (h2 mod m == 0)
    all k positions collapse to h1 and the key effectively gets ONE hash.
    The fixed step lies in [1, m-1], so every key must set k distinct-ish
    positions — concretely, no key may produce fewer than 2 distinct
    positions when k >= 2 and m is large (a zero step would always produce
    exactly 1)."""
    from pyspark.sql import functions as F

    from stock_crypto_data_pipeline_public_spark.operators.bloomprune import (
        _positions,
    )

    m_bits, k = 1 << 10, 5
    keys = spark.range(20000).select(F.col("id").cast("string").alias("key"))
    pos = keys.select(
        F.array_size(
            F.array_distinct(F.array(*_positions(F.col("key"), m_bits, k)))
        ).alias("n_distinct")
    )
    # with a [1, m-1] step, positions form an arithmetic progression mod m:
    # all k are distinct whenever step*k < m and gcd-free; at minimum >= 2
    assert pos.filter(F.col("n_distinct") < 2).count() == 0
    # and the overwhelming majority hit the full k positions
    frac_full = pos.filter(F.col("n_distinct") == k).count() / 20000
    assert frac_full > 0.99
