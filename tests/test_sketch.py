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
