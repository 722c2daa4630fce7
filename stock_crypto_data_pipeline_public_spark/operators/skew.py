"""Skew-mitigation operators: salted aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) handles most runtime skew;
these explicit operators cover the two cases AQE cannot: (a) a skewed
``groupBy`` whose single hot key funnels into one reducer, and (b) a
broadcast-averse skewed join where the build side is too big to broadcast
but a few stream keys dominate.

The patterns are standard Spark practice (two-phase aggregation, key
replication) expressed as reusable builders. The reference never needed
them — its hot keys live inside Snowflake — but a Data Vault at 100 TB does:
e.g. a celebrity asset in ``fct_transactions`` or an empty-string business
key that slipped through cleaning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def diagnose_skew(
    df: DataFrame,
    keys: Sequence[str],
    top: int = 10,
    target_rows_per_task: int = 5_000_000,
) -> dict:
    """Measure key skew before reaching for the mitigation operators: one
    hash-aggregation pass (map-side partials) over ``keys``, a 4-scalar
    summary agg, and a top-``top`` hot-key sample — nothing corpus-sized
    ever reaches the driver.

    Returns ``{"n_rows", "n_keys", "max_rows", "median_rows",
    "skew_ratio", "hot_keys", "recommendation"}`` where recommendation is
    one of ``"none"`` (hottest key fits a task), ``"aqe"`` (mild skew —
    AQE's runtime splitting suffices), or ``("salt", buckets)`` with
    buckets sized so the hottest key's rows spread into
    ``target_rows_per_task``-sized slices. The decision is a heuristic
    INPUT, not a promise — re-measure after data drift; hot keys move.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    s = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_rows"),
        F.expr("percentile_approx(n, 0.5)").alias("median_rows"),
    ).first()
    hot = [
        ({k: r[k] for k in keys}, r["n"])
        for r in counts.orderBy(F.desc("n"), *keys).limit(top).collect()
    ]
    skew_ratio = float(s["max_rows"]) / max(float(s["median_rows"]), 1.0)
    if s["max_rows"] <= target_rows_per_task:
        rec: object = "none"
    elif skew_ratio <= 4.0:
        rec = "aqe"
    else:
        import math

        rec = ("salt", math.ceil(s["max_rows"] / target_rows_per_task))
    return {
        "n_rows": s["n_rows"],
        "n_keys": s["n_keys"],
        "max_rows": s["max_rows"],
        "median_rows": s["median_rows"],
        "skew_ratio": skew_ratio,
        "hot_keys": hot,
        "recommendation": rec,
    }


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: pre-aggregate on (keys, salt), then merge.

    ``aggs`` maps output column → (input column, fn) with fn ∈
    {sum, count, min, max}: the decomposable aggregates (avg = sum/count at
    the call site). The first shuffle spreads a hot key over
    ``salt_buckets`` reducers; the second shuffles only ``buckets`` rows per
    key. For uniform keys this adds one cheap extra shuffle — use it when a
    key histogram says so, not by default.
    """
    supported = {"sum", "count", "min", "max"}
    for out, (_, fn) in aggs.items():
        if fn not in supported:
            raise ValueError(f"{out}: {fn!r} not decomposable (use {supported})")

    salted = df.withColumn("__salt", (F.rand(seed=7) * salt_buckets).cast("int"))

    def phase1(out: str, col: str, fn: str) -> Column:
        if fn == "count":
            return F.count(F.lit(1) if col == "*" else F.col(col)).alias(out)
        return getattr(F, fn)(col).alias(out)

    partial = salted.groupBy(*keys, "__salt").agg(
        *[phase1(out, col, fn) for out, (col, fn) in aggs.items()]
    )

    def phase2(out: str, fn: str) -> Column:
        # counts merge by SUM of partial counts; min/max/sum merge by themselves
        merge = "sum" if fn == "count" else fn
        return getattr(F, merge)(out).alias(out)

    return partial.groupBy(*keys).agg(
        *[phase2(out, fn) for out, (_, fn) in aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join by key replication: the (large, skewed) ``left``
    gets a random salt in [0, buckets); the (smaller, but not
    broadcastable) ``right`` is replicated once per salt value. Each hot
    left key now spreads across ``buckets`` reducers.

    Cost: right side is materialized ``salt_buckets`` times — size the
    bucket count from the skew ratio, and prefer plain broadcast when the
    right side fits in memory.

    Only left-preserving joins are supported: under right/full outer an
    unmatched right row would surface once PER SALT COPY (``salt_buckets``
    duplicates with null left columns). For those, salt the other way
    around or use AQE skew-join handling.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins only, got how={how!r}: "
            "an unmatched right row would duplicate once per salt copy"
        )
    on = list(on)
    lsalt = left.withColumn("__salt", (F.rand(seed=11) * salt_buckets).cast("int"))
    rsalt = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return lsalt.join(rsalt, on + ["__salt"], how).drop("__salt")
