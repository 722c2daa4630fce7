"""Distribution-drift measurement: Population Stability Index over any
numeric column (the generic production form of the gated e12 query, which
keeps its own oracle-locked inline version over exact cents).

PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i) with add-one smoothing on the bin
counts — every term is ≥ 0 (sign(p−q) = sign(ln(p/q))), 0 exactly when the
smoothed bin shares agree. Conventional alert levels: < 0.1 stable,
0.1–0.2 drifting, ≥ 0.2 shifted (the `psi` CLI's default exit-2 threshold).

Scale: one conditional-aggregation scan per side (map-side partials,
|bins| counters), a |bins|-row spine join so EMPTY bins exist for the
smoothing, and a driver-side fold over ≤ |bins|+1 rows. Bin edges are
CALLER-FIXED on purpose: a stable ruler is what makes week-over-week PSI
comparable — quantile-adaptive edges would re-bin history every run.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bin_column(value_col: str, edges: Sequence[float]):
    """CASE-style bucket id for fixed ascending edges: bin i holds
    values < edges[i] (and ≥ edges[i-1]); the overflow bin is len(edges)."""
    col = F.col(value_col)
    out = F.lit(len(edges))
    for i in range(len(edges) - 1, -1, -1):
        out = F.when(col < float(edges[i]), i).otherwise(out)
    return out.cast("bigint")


def psi_bin_counts(
    df_a: DataFrame, df_b: DataFrame, value_col: str, edges: Sequence[float]
) -> list[tuple[int, int, int]]:
    """Exact per-bin counts for both sides, every bin present (empty bins
    count 0 — the smoothing needs them). Returns [(bin_id, n_a, n_b)],
    a ≤ |edges|+1-row driver pull."""
    spark = df_a.sparkSession

    def counts(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.filter(F.col(value_col).isNotNull())
            .select(bin_column(value_col, edges).alias("bin_id"))
            .groupBy("bin_id")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    spine = spark.range(len(edges) + 1).select(F.col("id").alias("bin_id"))
    filled = (
        spine.join(F.broadcast(counts(df_a, "n_a")), "bin_id", "left")
        .join(F.broadcast(counts(df_b, "n_b")), "bin_id", "left")
        .select(
            "bin_id",
            F.coalesce("n_a", F.lit(0)).cast("bigint").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("bigint").alias("n_b"),
        )
        .orderBy("bin_id")
    )
    return [(r.bin_id, r.n_a, r.n_b) for r in filled.collect()]


def psi(
    df_a: DataFrame, df_b: DataFrame, value_col: str, edges: Sequence[float]
) -> dict:
    """Total PSI plus the per-bin breakdown. The fold runs driver-side
    over the tiny bin table in ascending bin order — deterministic, and
    the per-bin contributions are individually ≥ 0 so the total is too."""
    rows = psi_bin_counts(df_a, df_b, value_col, edges)
    t_a = sum(n for _, n, _ in rows)
    t_b = sum(n for _, _, n in rows)
    nb = len(rows)
    bins = []
    total = 0.0
    for bin_id, n_a, n_b in rows:
        p = (n_a + 1) / (t_a + nb)
        q = (n_b + 1) / (t_b + nb)
        contrib = (p - q) * math.log(p / q)
        bins.append(
            {"bin_id": bin_id, "n_a": n_a, "n_b": n_b, "psi_contrib": contrib}
        )
        total += contrib
    return {
        "psi": total,
        "n_a": t_a,
        "n_b": t_b,
        "n_bins": nb,
        "bins": bins,
    }
