"""Graph analytics over the relational tables (beyond-reference).

The near-dup pipeline already runs one graph algorithm (connected
components, operators/dedup.py — pointer-jumping label propagation); this
module adds the other canonical iterative-graph workload, PageRank, as a
plain DataFrame loop: per iteration ONE join (ranks ⋈ edges on src) + ONE
hash aggregation (sum contributions per dst). That join-agg pair is the
whole scale story — each iteration shuffles on the node key exactly twice,
partial aggregation runs map-side, and nothing ever collects to the driver.
At real iteration counts, ``localCheckpoint`` every few rounds truncates
the growing lineage the same way operators/bpe.train_bpe does; g01's fixed
3 unrolled iterations don't need it (and fixed unrolling is what makes the
DuckDB oracle expressible as plain chained CTEs — the same determinism
trade x12 makes for Lloyd's iterations).

Cross-engine float contract: contribution sums are grouped aggregations
whose accumulation ORDER differs between engines, so every iterate is
rounded to 12 decimals (rank mass ∈ [1e-4, 1]; 1e12-scaled values stay
far inside 2^53, and the ~1e-16 relative summation noise sits 4 orders of
magnitude below the rounding grid) — the same mask-the-ulps pattern every
float aggregation in this repo uses (functions/numeric.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import oracle_rnd, rnd
from ..sources.tables import load_table
from .registry import query

#: damping factor (the standard 0.85) as an exact literal both engines parse
#: to the same double
_D = "0.85"
_ITERS = 3


# --------------------------------------------------------------------------
# g01 — 3-iteration PageRank over the (customer ↔ supplier) trade graph.
# Edges: distinct (custkey, suppkey) pairs from orders ⋈ lineitem,
# symmetrized (undirected trade relation → no dangling-mass handling
# needed: every node that appears has degree ≥ 1). Node ids are typed
# strings ('c:123' / 's:45'). r0 = 1/N; r_{k+1}(v) = (1-d)/N +
# d·Σ_{u→v} r_k(u)/deg(u), each iterate rounded to 12 dp (module
# docstring). Output: every node's final rank at 8 dp.
# --------------------------------------------------------------------------
def _oracle() -> str:
    it = """
    it{K} AS (
        SELECT e.dst AS node, {rnd_iter} AS rank
        FROM edges e
        JOIN it{P} r ON r.node = e.src
        JOIN deg d ON d.node = e.src
        CROSS JOIN n
        GROUP BY e.dst, n.n
    )"""
    rnd_iter = oracle_rnd(
        f"(1 - {_D}) / n.n + {_D} * sum(r.rank / d.deg)", 12
    )
    chain = ",".join(
        it.format(K=k, P=k - 1, rnd_iter=rnd_iter) for k in range(1, _ITERS + 1)
    )
    return f"""
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
        SELECT 'c:' || CAST(ck AS VARCHAR) AS src, 's:' || CAST(sk AS VARCHAR) AS dst FROM pairs
        UNION ALL
        SELECT 's:' || CAST(sk AS VARCHAR) AS src, 'c:' || CAST(ck AS VARCHAR) AS dst FROM pairs
    ),
    deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
    n AS (SELECT count(*) AS n FROM deg),
    it0 AS (SELECT node, {oracle_rnd('1.0 / n.n', 12)} AS rank FROM deg CROSS JOIN n),
    {chain}
    SELECT node, {oracle_rnd('rank', 8)} AS pagerank
    FROM it{_ITERS}
    """


@query("g01_pagerank_trade_graph", oracle=_oracle())
def g01_pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    # materialize the edge list once: every iteration joins against it, and
    # without the checkpoint the lazy orders ⋈ lineitem ⋈ distinct
    # derivation would re-execute per iteration (measured 6.5 -> ~2.5 s at
    # sf0.1); at real scale this is a persisted edge table anyway
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    # scalar node count as a broadcast 1-row relation (the repo's standard
    # broadcast-scalar pattern — no collect, no literal baked at plan time)
    n = deg.agg(F.count(F.lit(1)).alias("n"))
    d = float(_D)
    ranks = deg.crossJoin(F.broadcast(n)).select(
        "node", rnd(F.lit(1.0) / F.col("n"), 12).alias("rank")
    )
    for _ in range(_ITERS):
        contrib = (
            edges.join(ranks, ranks.node == edges.src)
            .join(deg.withColumnRenamed("node", "dnode"), F.col("dnode") == edges.src)
            .select(F.col("dst"), (F.col("rank") / F.col("deg")).alias("w"))
        )
        ranks = (
            contrib.groupBy(F.col("dst").alias("node"))
            .agg(F.sum("w").alias("mass"))
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                rnd((1 - d) / F.col("n") + d * F.col("mass"), 12).alias("rank"),
            )
        )
    return ranks.select("node", rnd("rank", 8).alias("pagerank"))
