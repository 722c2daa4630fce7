"""Query registry: the engine's declared operator coverage.

Every operator from SURVEY.md §2 (plus the training-data-pipeline extensions)
is declared here as a named query: a ``(spark, sf_dir) -> DataFrame`` callable
and, when SQL-expressible, a DuckDB oracle SQL string computing the identical
result on the same parquet tables. The driver's correctness gate runs both and
hash-compares.

Oracle-parity rules (applied by every query in this package):

1. Column names must match exactly — alias every computed column identically
   on both sides (driver sorts columns by name before hashing).
2. Every floating-point output column is wrapped in the deterministic
   floor-based rounding of functions/numeric.py (``rnd`` / ``oracle_rnd``) on
   BOTH sides — native ``round`` disagrees between Spark (decimal-string
   HALF_UP) and DuckDB (binary nearest) on exact-tie quotients, and raw
   unrounded floats carry summation-order noise.
3. Spark's ``date_trunc`` returns timestamp while DuckDB's returns date for
   day/month/year — cast to date explicitly on the Spark side.
4. DuckDB ``regexp_replace`` replaces the first match unless given the ``'g'``
   flag; Spark always replaces all — always pass ``'g'`` in oracles.
5. Session timezone is pinned to UTC (session.py) and timestamps compared as
   naive UTC.
6. Only hash (md5/sha256) string- or integer-typed columns — float/timestamp
   string renderings are not engine-portable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` marks a non-SQL-expressible operator
    (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every plan module so its @query decorators run.

    Registration order is deliberate: the round driver hash-gates the FIRST
    50 registered queries only. Rounds 1-2 gated relational/vault/event/
    finance; round 3 rotates textops/vectorops/multimodal to the front so
    the t/x/m series get driver-gated evidence at least once (the q/v
    series were hash-confirmed in CORRECTNESS_r01/r02 and stay covered by
    the local strict harness, which now mirrors the driver's comparison).
    """
    from . import (  # noqa: F401
        textops,
        vectorops,
        multimodal,
        eventops,
        finance,
        relational,
        vault,
    )
