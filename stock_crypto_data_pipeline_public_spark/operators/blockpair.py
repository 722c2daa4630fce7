"""Block-pair self-join: distributed exact all-pairs computation.

The shared machinery behind the O(n²) exactness baselines (x04/x11 cosine
pair histograms, t08 SimHash Hamming histogram): rows hash into one of B
blocks, each block collapses to ONE row of (id, value) structs (one
shuffle), the B-row block table joins to itself on ``bid_a <= bid_b`` so
every unordered block pair meets exactly once, and each of the B(B+1)/2
independent tasks scores its two blocks in Arrow-batched numpy, emitting
only small partial results.

Scale rationale: no driver collect, no full-corpus broadcast — shuffle
volume is corpus × B and the irreducible n² work spreads across the pair
tasks, which is the form that survives a 1000-executor cluster. B grows
~sqrt(2·parallelism) so there are at least as many tasks as cores.

The pair-dedup contract is enforced HERE, not in scorers: for a self block
pair the mask is the strict upper triangle by id (each pair once, no
self-pairs); for distinct blocks every cross cell is set (the pair
co-occurs in exactly this one task, whatever the id order).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: score_pair(ids_a, values_a, ids_b, values_b, mask) -> pandas.DataFrame
#: ids are int64 numpy arrays; values are the raw struct-field lists in the
#: same order; mask is the bool matrix of pairs to count (see module doc).
PairScorer = Callable


def block_pair_partials(
    spark: SparkSession,
    df: DataFrame,
    id_col: str,
    value_col: str,
    score_pair: PairScorer,
    out_schema: str,
    n_blocks: int | None = None,
) -> DataFrame:
    """Run ``score_pair`` over every unordered pair of rows of ``df``,
    distributed as described in the module docstring. Returns the unioned
    partial outputs (callers aggregate, e.g. groupBy().sum()).

    CONTRACT: ``id_col`` values must be unique. The exactly-once pair
    guarantee is keyed by id — with duplicate ids, the dup pair itself is
    never scored (strict ``<`` mask) while each copy scores against every
    other row, double-counting those pairs. Duplicates of one id always
    hash to the SAME block, so the precondition is enforced for free
    inside each pair task (raises ValueError, no extra pass)."""
    import numpy as np

    par = spark.sparkContext.defaultParallelism
    B = n_blocks or max(3, int((2 * par) ** 0.5) + 1)

    blocks = (
        df.withColumn("bid", F.pmod(F.hash(id_col), F.lit(B)))
        .groupBy("bid")
        .agg(
            F.collect_list(
                F.struct(F.col(id_col).alias("id"), F.col(value_col).alias("val"))
            ).alias("rows")
        )
    )
    pairs = (
        blocks.select(F.col("bid").alias("bid_a"), F.col("rows").alias("rows_a"))
        .join(
            blocks.select(F.col("bid").alias("bid_b"), F.col("rows").alias("rows_b")),
            F.col("bid_a") <= F.col("bid_b"),
        )
        .repartition(par)
    )

    def _ids(rows, bid):
        ids = np.fromiter((r["id"] for r in rows), dtype=np.int64)
        if len(np.unique(ids)) != len(ids):
            raise ValueError(
                f"block_pair_partials: duplicate id values in block {bid} — "
                "id_col must be unique (see contract in docstring)"
            )
        return ids

    def run(batches):
        for pdf in batches:
            for bid_a, bid_b, rows_a, rows_b in zip(
                pdf["bid_a"], pdf["bid_b"], pdf["rows_a"], pdf["rows_b"]
            ):
                ids_a = _ids(rows_a, bid_a)
                ids_b = _ids(rows_b, bid_b)
                if bid_a == bid_b:
                    mask = ids_a[:, None] < ids_b[None, :]
                else:
                    mask = np.ones((len(ids_a), len(ids_b)), dtype=bool)
                out = score_pair(
                    ids_a,
                    [r["val"] for r in rows_a],
                    ids_b,
                    [r["val"] for r in rows_b],
                    mask,
                )
                if out is not None and len(out):
                    yield out

    return pairs.mapInPandas(run, out_schema)
