"""Cross-engine deterministic numeric helpers.

Problem: ``round(x, n)`` on doubles is NOT portable across engines. Spark
rounds the shortest decimal representation (BigDecimal.valueOf) with HALF_UP,
DuckDB rounds the binary value — for quotients like ``551.43 / 8 = 68.92875``
(exact terminating decimal) the two disagree at the final digit, which breaks
value-hash comparison against any non-JVM oracle.

Fix: half-up rounding expressed as ``floor(x * 10^n + 0.5) / 10^n``. floor is
bit-deterministic on identical doubles in every engine, so as long as ``x``
itself is reproducible (exact-grid sums, integer counts), the rounded output
is identical everywhere. All plan queries use :func:`rnd` and emit
:func:`oracle_rnd` fragments instead of raw ``round``.

Range note: ``x * 10^n`` must stay within 2^53 for exactness — fine for
n<=4 and values < ~1e11. At larger magnitudes round to fewer decimals.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(c: Column | str, n: int = 2) -> Column:
    """Deterministic cross-engine round to ``n`` decimals:
    ``floor(x·10ⁿ + 0.5) / 10ⁿ``.

    This is half-up for non-negative values and half-toward-+∞ for negative
    ties (e.g. -1.005 → -1.00, where HALF_UP would give -1.01). The formula
    is chosen because the IDENTICAL expression evaluates bit-for-bit the
    same on Spark and DuckDB (:func:`oracle_rnd`) — engine-native round()
    disagrees between the two on tie cases, which is what the oracle gate
    cannot tolerate. Consumers needing accounting-grade HALF_UP on negative
    values should round through decimal at the edge instead."""
    c = F.col(c) if isinstance(c, str) else c
    p = 10**n
    return F.floor(c * F.lit(p) + F.lit(0.5)) / F.lit(float(p))


def oracle_rnd(expr: str, n: int = 2) -> str:
    """DuckDB/ANSI SQL fragment equivalent of :func:`rnd`."""
    p = 10**n
    return f"floor(({expr}) * {p} + 0.5) / {p}.0"
