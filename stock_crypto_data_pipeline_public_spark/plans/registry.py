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
7. Never EMIT a DecimalType output column (round 10, plan-contract-enforced:
   tests/test_plan_contracts.py::test_no_decimal_typed_gated_outputs).
   DuckDB's pandas path renders every decimal as float64 while Spark hands
   the comparator verbatim Decimal objects; equal values then hash
   differently the moment the decimal's text carries trailing zeros
   (str(Decimal('1234.570000')) != str(1234.57)) — the decoded r9 q40f
   red. The local mirror coerces Decimal→float, so ONLY the driver can see
   the mismatch; hence a mechanical ban: money leaves the decimal domain
   as e-scaled BIGINT (functions/numeric.py), ratios as true doubles.
   Status: H2-consistent, being confirmed against H1 by the r10 q40g/q40h
   probe pair (see oracle_compare.py's KNOWN RESIDUAL decode table).
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
#: round-10 gate window, ranked by "code changed since last driver hash
#: row":
#: 1. The q40 probe refresh (r9 outcome: q40a-e GREEN, q40f alone RED).
#:    q40f RETIRES (registered local-only): it was not type-faithful —
#:    Spark typed it DECIMAL(27,6) (Decimal('1234.570000')) vs DuckDB's
#:    DOUBLE 1234.57 — so its red names EITHER the floorpath double
#:    pipeline (H1, r9's reading) OR verbatim-Decimal rendering at the
#:    driver's comparator (H2). Round 10 gates the separating probes:
#:    q40g (floorpath as a true DOUBLE both sides; H1→red, H2→green) and
#:    q40h (Spark DECIMAL(27,6) vs oracle DOUBLE, equal value; H2→red BY
#:    DESIGN, H1→green). See relational.py's family comment +
#:    oracle_compare.py KNOWN RESIDUAL for the r11 decode table. Under
#:    H2 the expected r10 gate is 49/50 with q40h the designed red.
#: 2. Changed semantics this round: e07 (average denominator made
#:    literally oracle-faithful: count(value), not count(ts)), f03 (v_e2²
#:    window sums and 20·s2−s1² widened to DECIMAL(38,0)/HUGEINT — they
#:    overflowed int64 inside the MONEY(12,2) domain).
#: 3. Representative re-gates for the iavg DECIMAL(38,0) numerator
#:    widening (value-identical by construction + boundary property test
#:    test_properties.py::test_iavg_numerator_cannot_wrap_int64; these six
#:    cover shifts 0/2/4, the double-image consumers, the SQL-expr form,
#:    and the vector-recall contract): q01, e01, f02, f08, q32, x21. The
#:    other ten iavg users keep their r9 rows (same helper, same proof).
#: 4. Freshness, oldest driver row first (r9 verdict #2): the whole
#:    r4 era (q18 q20 t17 t18 t23 t30 t31 t32 t34 x09 x10 x12 x14), then
#:    21 of the r5 era, then s03-s06 (r7) — fresh rows behind the
#:    stateful-streaming / stream-stream-join coverage claims
#:    (COVERAGE.md §2.8-2.11; r9 verdict #5 asked for gated rows for
#:    exactly these surfaces — they have been s03-s06 since r7, the
#:    COVERAGE table was stale).
_GATE_PRIORITY = (
    # probes + changed semantics + iavg representatives
    ["q40g", "q40h", "e07", "f03"]                              # (4)
    + ["q01", "e01", "f02", "f08", "q32", "x21"]                # (10)
    # freshness: the r4 era, complete
    + ["q18", "q20", "t17", "t18", "t23", "t30", "t31", "t32",
       "t34", "x09", "x10", "x12", "x14"]                       # (23)
    # freshness: the r5 era (21 of 33; the rest queue for r11)
    + ["e10", "f04", "f06", "f13", "m01", "m09", "m10", "q23",
       "q24", "q25", "t12", "t33", "t35", "t36", "t37", "t38",
       "v10", "v11", "v12", "x04", "x13"]                       # (44)
    # freshness: the r7 streaming-operator gates named by r9 verdict #5
    + ["s03", "s04", "s05", "s06"]                              # (48)
    # NEW this round (never gated — enters ahead of freshness): exact
    # heavy hitters via two-pass Misra-Gries (bounded-memory candidates +
    # exact recount); then r7's oldest-first queue head
    + ["t46", "q37"]                                            # (50)
)
#: Next-round rotation candidates (oldest first): the deferred r5 rows
#: (f07 f09 f10 f11 f12 f14 m13 m16 x06 x15 x16 x17) and q33 (r7,
#: displaced by the new t46), then the r6 era
#: (t01-t24 core text ops, g01-g03, v13/v14, x01-x03, x19, e11, q31),
#: then r7's remainder (s07, m05/m07/m08/m11/m12/m14/m15/m17/m18,
#: t43-t45) and the r8 window (q26/q28/q41/q42, m19/m20, s08-s12,
#: x05/x07/x08/x11, t25, t27, v01-v05/v08/v09, q05-q09/q12-q16,
#: e03/e05/e09, f01/f17, m04) by age.

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
