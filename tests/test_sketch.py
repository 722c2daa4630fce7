"""Count-min sketch: never-undercount + bounded-overcount against exact
counts, table-size bound, absent-key zero, and mergeability."""

from pyspark.sql import functions as F

from stock_crypto_data_pipeline_public_spark.operators.sketch import (
    cms_estimate,
    cms_merge,
    count_min_table,
)
from stock_crypto_data_pipeline_public_spark.sources.tables import load_table

W_, D = 2048, 5


def _token_stream(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.regexp_extract_all("text", F.lit("[a-z0-9]+"), 0)
            ).alias("token")
        )
    )


def test_cms_error_contract_against_exact_counts(spark, sf_dir):
    toks = _token_stream(spark, sf_dir).cache()
    n_total = toks.count()
    table = count_min_table(toks, "token", W_, D).cache()
    # bounded state: never more than d*w cells, each sketch row sums to N
    assert table.count() <= D * W_
    per_row = {r["r"]: r["s"] for r in table.groupBy("r").agg(F.sum("cnt").alias("s")).collect()}
    assert per_row == {i: n_total for i in range(D)}

    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    # estimate every distinct key and compare to truth
    est = cms_estimate(table, exact.select("token"), "token", W_, D)
    joined = exact.join(est, "token").collect()
    assert joined
    eps_n = (3 * n_total) // W_ + 1  # loose deterministic bound ~ e/w * N
    for r in joined:
        assert r["est"] >= r["n"], f"{r['token']}: undercount {r['est']} < {r['n']}"
        assert r["est"] <= r["n"] + eps_n, (
            f"{r['token']}: overcount {r['est']} vs {r['n']} + {eps_n}"
        )


def test_cms_absent_key_estimates_zero_and_merge_adds(spark):
    half_a = spark.createDataFrame([("x",)] * 3 + [("y",)] * 2, "k string")
    half_b = spark.createDataFrame([("x",)] * 4 + [("z",)] * 1, "k string")
    ta = count_min_table(half_a, "k", W_, D)
    tb = count_min_table(half_b, "k", W_, D)
    merged = cms_merge(ta, tb)
    keys = spark.createDataFrame([("x",), ("y",), ("z",), ("never",)], "k string")
    got = {r["k"]: r["est"] for r in cms_estimate(merged, keys, "k", W_, D).collect()}
    # tiny key space, huge w: no collisions, so estimates are exact here
    assert got == {"x": 7, "y": 2, "z": 1, "never": 0}
    # merged sketch == sketch of the concatenated stream
    whole = count_min_table(half_a.unionByName(half_b), "k", W_, D)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_mg_summaries_superset_and_never_overcount(spark):
    """Misra-Gries contract (mg_partition_summaries): across any
    partitioning, (a) counters never exceed true counts (safe lower
    bounds), (b) every key with global count > n/(m+1) appears in the
    candidate union — the guarantee t46's exact recount stands on —
    and (c) each partition emits at most m rows."""
    from collections import Counter

    from stock_crypto_data_pipeline_public_spark.operators.sketch import (
        mg_partition_summaries,
    )

    # zipf-ish skew + a long uniform tail, deliberately unsorted
    keys = []
    for i, reps in enumerate([900, 500, 300, 120, 60] + [7] * 40):
        keys += [f"k{i}"] * reps
    keys = keys[::3] + keys[1::3] + keys[2::3]  # interleave orders
    n, m = len(keys), 4
    exact = Counter(keys)

    for parts in (1, 3, 8):
        df = spark.createDataFrame([(k,) for k in keys], "tok string").repartition(
            parts
        )
        summ = mg_partition_summaries(df, "tok", m).collect()
        by_key = {}
        for r in summ:
            by_key[r.tok] = by_key.get(r.tok, 0) + r.lb
        # (a) lower bounds never overcount
        assert all(lb <= exact[k] for k, lb in by_key.items()), (parts, by_key)
        # (b) superset of everything above n/(m+1)
        heavy = {k for k, c in exact.items() if c * (m + 1) > n}
        assert heavy, "test data must contain heavy keys"
        assert heavy <= set(by_key), (parts, heavy - set(by_key))
        # (c) bounded state: ≤ m counters per partition
        assert len(summ) <= m * parts


def test_mg_two_pass_equals_exact_threshold_filter(spark):
    """End-to-end two-pass shape (the t46 composition): candidates +
    exact recount + integer cross-multiplied threshold == the plain
    exact GROUP BY/HAVING answer, with m far below the distinct count."""
    from stock_crypto_data_pipeline_public_spark.operators.sketch import (
        mg_partition_summaries,
    )

    rows = [(f"u{i % 97}",) for i in range(5000)] + [("whale",)] * 800
    m = 8
    df = spark.createDataFrame(rows, "tok string").repartition(6)
    n = df.count()
    cands = mg_partition_summaries(df, "tok", m).select("tok").distinct()
    got = (
        df.join(F.broadcast(cands), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") * (m + 1) > n)
        .collect()
    )
    # exact answer: only the whale exceeds n/9 (5800/9 ≈ 644; u-keys ≈ 52)
    assert {(r.tok, r.c) for r in got} == {("whale", 800)}


def test_mg_summaries_count_null_keys(spark):
    """r10 ADVICE: a null-keyed heavy hitter must enter the candidate set
    (value_counts defaults to dropna=True — the summary must not). The
    null key's lower bound obeys the same undercount bound as any key."""
    from stock_crypto_data_pipeline_public_spark.operators.sketch import mg_partition_summaries

    rows = [(None,)] * 50 + [(f"k{i}",) for i in range(10)] * 2
    df = spark.createDataFrame(rows, "tok string").coalesce(1)
    out = mg_partition_summaries(df, "tok", 5).collect()
    by_key = {r.tok: r.lb for r in out}
    assert None in by_key  # the null heavy hitter survives
    # n=70, m=5 → undercount ≤ 70/6 ≈ 11.67; true null count 50
    assert by_key[None] >= 50 - 70 // 6
    assert all(lb > 0 for lb in by_key.values())
    assert len(out) <= 5
