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


#: Queries promoted to the FRONT of registration order. The round driver
#: hash-gates only the FIRST 50 registered queries, so this list IS the
#: round-9 gate window, ranked by "code changed since last driver hash
#: row":
#: 1. The q40 SPLIT (r8 directive #1): six one-type-per-query renderer
#:    fingerprints — identical constant-literal SQL on both engines; the
#:    driver's red/green PATTERN across them names the divergent
#:    comparator pipeline mechanically (q40a ints/strings/bool expected
#:    green; q40b decimal; q40c date/ts; q40d exact doubles; q40e double
#:    quotients; q40f the floorpath money rendering alone).
#: 2. The round-9 exact-domain sweep (r8 directive #2): every query whose
#:    hashed money/average output moved off the floor(CAST(decimal AS
#:    DOUBLE)) pipeline onto e-scaled BIGINT (_e2/_e3/_e4/_e6) or the
#:    integral iavg quotient — all changed code, so all re-gate ahead of
#:    any freshness row — plus t40 (decimal-literal division made an
#:    explicit double), s13 (stale-epoch pointer added to the sketch
#:    sink), the NEW q43 SCD2-quality-battery gate (W4), and the NEW x20
#:    binary-quantized search with its x21 recall contract and the x22
#:    IVF x BQ composed probe search.
#: 3. Freshness for the remaining 3 slots, oldest driver row first:
#:    m06, t05/t11 (ceded their slots two rounds running).
_GATE_PRIORITY = (
    # the fingerprint family + the new W4/quality gate
    ["q40a", "q40b", "q40c", "q40d", "q40e", "q40f", "q43"]     # (7)
    # exact-domain sweep: relational
    + ["q01", "q02", "q03", "q04", "q10", "q11", "q17", "q19",
       "q21", "q22", "q27", "q29", "q30", "q32", "q34", "q35",
       "q36", "q38", "q39"]                                     # (26)
    # exact-domain sweep: events / finance / vault / streaming + t40
    + ["e01", "e02", "e04", "e06", "e07", "e08"]                # (32)
    + ["f02", "f03", "f05", "f08", "f15", "f16"]                # (38)
    + ["v06", "v07"]                                            # (40)
    + ["s01", "s02", "s13", "t40", "x20", "x21", "x22"]         # (47)
    # freshness: the oldest code-stable driver rows
    + ["m06", "t05", "t11"]                                     # (50)
)
#: Next-round rotation candidates (oldest first): t17/t18/q18/q20/t23/t30 (displaced
#: by the f03/f08/f16 ports and the new x20), t31/t32/t34, x09/x10/x12/x14
#: (r4/r5);
#: then the r7 window (s03-s07, q33/q37, m-codec series, t43-t45) and
#: the r8 window (q26/q28/q41/q42, m19/m20, s08-s12, x05/x07/x08/x11,
#: t25, v01-v05/v08/v09, q05-q09/q12-q16, e03/e05, f01, m04) by age.

#: Rows-only-BY-DESIGN sketches: t28 (HLL), t29 (GK quantiles) and t39
#: (DataSketches HLL union) have no oracle on purpose (approximate
#: answers; the exact twins t18/t17 are hash-gated, t43 drives the
#: sketch mergeability/error booleans through a hash row, and each
#: sketch carries an error-bound/mergeability property test). They
#: must NEVER rotate into the driver window — a rows-only row there would
#: read as red for a non-defect. load_all() enforces this mechanically.
_NEVER_GATE = frozenset({"t28", "t29", "t39"})


def load_all() -> None:
    """Import every plan module so its @query decorators run, then reorder
    the registry so the driver's 50-query gate window (see _GATE_PRIORITY)
    is explicit rather than an accident of import order."""
    from . import (  # noqa: F401
        textops,
        vectorops,
        multimodal,
        eventops,
        finance,
        relational,
        vault,
        graphops,
        streamops,
    )

    by_prefix = {name.split("_", 1)[0]: name for name in QUERIES}
    # most-specific safety first: a rows-only sketch in the window reads
    # as a driver red for a non-defect
    banned = _NEVER_GATE.intersection(_GATE_PRIORITY)
    if banned:
        raise ValueError(
            f"rows-only sketches must stay out of the driver window: {sorted(banned)}"
        )
    # the window must be exactly the driver's hash-gate size: short and a
    # "remaining" append silently falls through to registration order;
    # long and tail entries silently fall OUT of the first-50 gate
    if len(_GATE_PRIORITY) != 50:
        raise ValueError(
            f"_GATE_PRIORITY must name exactly 50 queries, got {len(_GATE_PRIORITY)}"
        )
    if len(set(_GATE_PRIORITY)) != len(_GATE_PRIORITY):
        raise ValueError("_GATE_PRIORITY contains duplicates")
    missing = [p for p in _GATE_PRIORITY if p not in by_prefix]
    if missing:
        # the window is load-bearing: a silently-dropped prefix would slide
        # an unvetted query into the driver's first-50 hash gate
        raise ValueError(f"_GATE_PRIORITY prefixes not registered: {missing}")
    ordered: dict[str, QueryFn] = {}
    for prefix in _GATE_PRIORITY:
        name = by_prefix[prefix]
        ordered[name] = QUERIES[name]
    for name, fn in QUERIES.items():
        ordered.setdefault(name, fn)
    QUERIES.clear()
    QUERIES.update(ordered)
