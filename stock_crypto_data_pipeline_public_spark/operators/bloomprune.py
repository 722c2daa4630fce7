"""Bloom-filter semi-join pruning: cut a huge probe side BEFORE its shuffle.

The gap this fills at 100 TB: `left_semi` with a broadcast works only while
the filter side's distinct keys fit in a broadcast hash relation (~100s of
MB). Past that, Spark falls back to a shuffle join — both sides pay a
corpus-sized exchange just to discover most probe rows match nothing. A
Bloom filter compresses the key set into a fixed bitset (1 bit per slot:
2^27 bits = 16 MB covers ~10M keys at k=5 with ~3% false positives), which
DOES broadcast, so the probe side drops non-matching rows map-side and only
survivors reach the real join's shuffle. This is the runtime-filter
technique engines apply internally (Spark's own
`spark.sql.optimizer.runtime.bloomFilter.enabled` plans an internal
BloomFilterAggregate under joins; Trino/Snowflake do the same) — exposed
here as an explicit operator because the planner only injects it in narrow
shapes, and a pipeline author sometimes knows better (e.g. pruning a scan
feeding several downstream joins once).

Construction is pure built-ins, no UDF anywhere:

- build: k double-hashed positions per key (Kirsch-Mitzenmacher:
  ``h1 + i*h2 mod m`` gives k independent-enough probes from two xxhash64
  calls) → explode → ``bit_or`` of single-bit words grouped by word index.
  The result is a SPARSE bitset table of ≤ m/64 rows — the only shuffle is
  the (word_idx, bit) aggregation, whose cardinality is min(n·k, m/64).
- probe: k chained BROADCAST left joins on word index (map-side hash
  lookups, no exchange on the probe side) + a bitwise-AND filter. A word
  index absent from the table means no build key set any bit there —
  coalesce(word, 0) keeps that a correct reject.

Contract: NO false negatives (every probe row whose key exists on the
build side survives — property-tested), false positives bounded by the
classic (1 - e^{-kn/m})^k, collapsed by the real join that follows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Kirsch-Mitzenmacher second-hash seed (any fixed odd constant).
_SEED2 = 0x9E3779B9


def _hash_pair(key: Column) -> tuple[Column, Column]:
    return F.xxhash64(key), F.xxhash64(key, F.lit(_SEED2))


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    # reduce both hashes into [0, m) BEFORE the h1 + i·h2 combine: ANSI
    # mode makes i·h2 on a full-range 64-bit hash a hard overflow error,
    # and (i·h2 mod m) ≤ k·m stays far inside long range
    h1, h2 = _hash_pair(key)
    h1m = F.pmod(h1, F.lit(m_bits))
    # standard double-hashing fix: the step must be NONZERO, else all k
    # positions collapse onto h1m and the filter degrades to one hash for
    # that key (FPR above the advertised bound). pmod(h2, m-1)+1 keeps the
    # step in [1, m-1]; correctness (no false negatives) never depended on
    # it, but the FPR bound does.
    h2m = F.pmod(h2, F.lit(m_bits - 1)) + F.lit(1)
    return [F.pmod(h1m + F.lit(i) * h2m, F.lit(m_bits)) for i in range(k)]


def build_bloom(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 20, k: int = 5
) -> DataFrame:
    """Sparse bitset table (word_idx long, word long) over the distinct
    values of ``keys[key_col]``. One shuffle, output ≤ m_bits/64 rows —
    broadcastable long past the point the raw key set is not."""
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("pos")
    return (
        keys.select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).alias("word_idx"),
            # python F.shiftleft wants a literal shift; the SQL form takes
            # an expression
            F.expr("shiftleft(1L, cast(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_prune(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Drop probe rows whose key is definitely absent from the bloom's
    build set. ``m_bits``/``k`` MUST match the build call. k broadcast
    left joins (map-side, zero probe-side exchange) + one filter; schema
    is unchanged. Survivors may contain false positives — follow with the
    real join; never use this as an exact semi join."""
    out = probe
    checks = []
    for i, p in enumerate(_positions(F.col(key_col), m_bits, k)):
        widx, wcol, pcol = f"__bw{i}__", f"__bv{i}__", f"__bp{i}__"
        out = (
            out.withColumn(pcol, p)
            .withColumn(widx, F.shiftright(F.col(pcol), 6))
            .join(
                F.broadcast(
                    bloom.select(
                        F.col("word_idx").alias(widx), F.col("word").alias(wcol)
                    )
                ),
                widx,
                "left",
            )
        )
        mask = F.expr(f"shiftleft(1L, cast({pcol} % 64 AS INT))")
        checks.append(F.coalesce(F.col(wcol), F.lit(0)).bitwiseAND(mask) != 0)
        out = out.drop(widx)
    keep = checks[0]
    for c in checks[1:]:
        keep = keep & c
    return out.filter(keep).drop(
        *[f"__bv{i}__" for i in range(k)], *[f"__bp{i}__" for i in range(k)]
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """EXACT left-semi join for build sides too big to broadcast: bloom-
    prune the probe map-side, then left_semi only the survivors — the
    shuffle carries matches + the small false-positive tail instead of the
    whole probe relation."""
    pruned = bloom_prune(probe, build_bloom(build, key_col, m_bits, k), key_col, m_bits, k)
    return pruned.join(build.select(key_col).distinct(), key_col, "left_semi")
