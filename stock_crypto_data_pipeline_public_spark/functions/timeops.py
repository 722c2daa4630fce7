"""Timezone-robust time helpers.

The test tables store ``events.ts`` as parquet TIMESTAMP(isAdjustedToUTC=false,
micros) which Spark reads as ``TimestampNTZType``. NTZ is the right model for
the correctness gate: collected values are the literal wall-clock stored in the
file, independent of the session/driver timezone. But some builtins are
LTZ-only (``unix_micros`` raises DATATYPE_MISMATCH on NTZ) and others silently
route through the session timezone (``cast(ntz as long)`` is illegal;
``to_utc_timestamp`` shifts). The helpers here are verified tz-invariant:
the same expression returns the same value under UTC / Asia/Bangkok /
America/New_York session timezones.

DuckDB parity: ``epoch_us(ts)`` on a naive timestamp == :func:`epoch_us` here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def _epoch_ntz() -> Column:
    # naive epoch origin; NTZ-typed so arithmetic never consults the session
    # tz. Built lazily — F.lit needs an active SparkContext, so a module-level
    # constant would break import-before-session (pytest collection).
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")


def epoch_us(c: Column | str) -> Column:
    """Microseconds since the naive 1970-01-01 epoch for a TIMESTAMP_NTZ
    column. Session-timezone-invariant (unlike ``unix_micros`` / casts, which
    are LTZ-only or tz-shifting). Matches DuckDB ``epoch_us`` on naive ts."""
    c = F.col(c) if isinstance(c, str) else c
    return F.timestamp_diff("MICROSECOND", _epoch_ntz(), c)


def epoch_s(c: Column | str) -> Column:
    """Whole seconds since the naive epoch (floor division of :func:`epoch_us`).

    Exact integer arithmetic throughout: ``floor(us / 1e6)`` via double
    division silently loses precision for |us| > 2^53 µs (~year 2255 —
    open-ended 9999-12-31 sentinels land there), which can shift a value by
    a second and misplace a row at a range-join bucket boundary. Instead,
    subtract the non-negative pmod remainder (long, exact) and divide the
    exact multiple through decimal, which is precise at any magnitude."""
    us = epoch_us(c)
    rem = F.pmod(us, F.lit(1_000_000))
    return ((us - rem).cast("decimal(27,0)") / F.lit(1_000_000)).cast("bigint")
