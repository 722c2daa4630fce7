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


# ---------------------------------------------------------------------------
# Exact-decimal money aggregation (round 7).
#
# :func:`rnd` is bit-deterministic only when its INPUT is — and a float SUM's
# value depends on summation order, which differs between Spark and DuckDB
# and across partitionings/environments. 2-dp money values (0.01, 104997.88)
# are NOT exactly representable as binary doubles, so sums over
# l_extendedprice / o_totalprice / c_acctbal / events.value are
# order-dependent and one unlucky half-up boundary flips the rounded output
# (r6 driver: q26/q28 hash red on the driver box, green locally).
#
# Fix: aggregate through DECIMAL. All money columns in the testdata are on
# an exact 2-dp grid (verified: zero off-grid values across lineitem/orders/
# part/supplier/customer/events at every SF), so CAST(double AS
# DECIMAL(12,2)) lands exactly on the grid identically in both engines
# (binary error ~1e-11 ≪ half-ulp of the grid). Decimal addition is
# associative — the sum is summation-order-INDEPENDENT — and the final
# DECIMAL→DOUBLE cast is correctly rounded in both engines (Spark
# BigDecimal.doubleValue; DuckDB exact-int/10^scale IEEE division), verified
# value- and bit-exact over all 14,743 per-order revenue sums at sf0.01.
# Only then is :func:`rnd` applied, now on an engine-identical input.
#
# Precision budget (chosen so DuckDB's width-38 product rule never trips):
# MONEY(12,2) holds |x| < 1e10 — at 100 TB a per-group SUM is decimal(22+,2)
# via engine sum-widening (Spark min(38,p+10), DuckDB 38), good to ~1e26.
# RATE(4,2) holds discount/tax factors; products stay ≤ width 22.
# ---------------------------------------------------------------------------

#: 2-dp-grid money/measure doubles, |x| < 1e10.
MONEY = "decimal(12,2)"
#: 2-dp rate factors (discount, tax, 1±rate), |x| < 100.
RATE = "decimal(4,2)"


def dec(c: Column | str, spec: str = MONEY) -> Column:
    """Cast a 2-dp-grid double column to its exact decimal."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(spec)


def dsum(c: Column) -> Column:
    """Order-independent sum of an ALREADY-exact decimal expression,
    returned as its (correctly-rounded, engine-identical) double image.
    Do not pass raw doubles — wrap grid columns with :func:`dec` first."""
    return F.sum(c).cast("double")


def money_sum(c: Column | str) -> Column:
    """Order-independent sum of a plain 2-dp money column (double image)."""
    return dsum(dec(c))


def oracle_dec(expr: str, spec: str = MONEY) -> str:
    """SQL fragment twin of :func:`dec` (valid in both Spark SQL and DuckDB)."""
    return f"CAST({expr} AS {spec.upper()})"


def oracle_dsum(expr: str) -> str:
    """SQL fragment twin of :func:`dsum` — ``expr`` must already be decimal."""
    return f"CAST(sum({expr}) AS DOUBLE)"


def oracle_money_sum(expr: str) -> str:
    """SQL fragment twin of :func:`money_sum`."""
    return oracle_dsum(oracle_dec(expr))
