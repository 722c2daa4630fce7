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
#: round-7 gate window, ranked by "code changed since last driver hash
#: row":
#: 1. ALL round-7 code changes — the decimal-exact money-aggregation
#:    sweep (functions/numeric.py MONEY/RATE policy; fixes the r6 red
#:    rows q26/q28 and hardens every money sum that feeds a rank or
#:    comparison): q01-q04, q17, q21/q22, q26-q30, v06/v07, e02/e04/
#:    e06/e07/e08, f02 — plus m18 (PDF scanner hang + octal-escape
#:    fixes touched its extraction path), m17 (shares chunking.py), and
#:    m05 (localCheckpoint on the forked media relation).
#: 2. Freshness for the remaining slots: x05/x07/x08/x11 (last driver
#:    row r3 — the oldest rows left), t25/t27 (ceded their r6 slots),
#:    then the oldest r4-green series by age: v01-v05/v08/v09,
#:    q05-q12, e01/e03/e05, f01/f08, m04.
_GATE_PRIORITY = (
    # round-7 changed code: decimal-exact money aggregation sweep
    ["q26", "q28"]                                              # (2) r6 reds
    + ["q01", "q02", "q03", "q04", "q17", "q21", "q22",
       "q27", "q29", "q30"]                                     # (12)
    + ["v06", "v07"]
    + ["e02", "e04", "e06", "e07", "e08"]
    + ["f02"]                                                   # (20)
    # round-7 changed code: PDF scanner fixes, m05 fork checkpoint, and
    # the NEW queries — m19/m20 (real glyph-raster OCR through
    # extract_text: PNG exact-decode path and lossy-JPEG block-exact
    # path; every extractor type is now REAL) and t43 (the HLL sketch
    # family's exact mergeability booleans, giving the last rows-only
    # family a driver-hard contract)
    + ["m17", "m18", "m05", "m19", "m20", "t43"]
    # round-7 NEW queries: q33 correlated LATERAL decorrelation, t44
    # Gopher-style quality-rule battery, and the previously-local-only
    # operators now driver-gated — q34 bloom semi join, q35 salted
    # two-phase agg, q36 salted join; f05/f15's daily px joined the
    # decimal sweep (grid-input avg — same tie class as q26/q28)
    # ...and t45, the CMS sketch's exact-contract twin (t43's pattern)
    + ["q33", "t44", "t45", "q34", "q35", "q36", "f05", "f15"]  # (34)
    # round-7 NEW streaming contracts — every helper in streaming/
    # pipeline.py is now driver-gated: s03 stream-stream join state
    # across a checkpoint restart, s04 applyInPandasWithState
    # sessionization, s05 stream-static broadcast enrichment with a dim
    # reload between drains, s06 native dropDuplicatesWithinWatermark
    # dedup under redelivery, s07 streaming OHLCV bars ≡ batch candles —
    # plus s01/s02 RE-ENTER as code-changed (their float value-sums
    # joined the decimal money policy this block)
    + ["s03", "s04", "s05", "s06", "s07", "s01", "s02"]         # (41)
    # round-7 NEW: q37 native recursive CTE (Spark 4 UnionLoop), q38
    # co-bucketed join exactness, q39 compaction roundtrip (§2.11's
    # write-path bucketing + maintenance, both driver-gated now)
    + ["q37", "q38", "q39"]                                     # (44)
    # round-7 code-changed: the JPEG batch-FDCT/LUT-decode and PNG
    # Paeth-unfilter rewrites touch every query on those decode paths —
    # code-changed outranks the x05/x07/x08/x11/t25/t27 freshness rows
    # (r3-stale but code-UNCHANGED), which cede their slots this round
    + ["m07", "m08", "m11", "m12", "m14", "m15"]                # (50)
)
#: Next-round rotation candidates: x05/x07/x08/x11/t25/t27 (r3-stale,
#: code unchanged — first in line), then v01-v05/v08/v09, q05/q06/q07,
#: q13-q20 minus q17, m04/m06, t05/t11/t17/t18/t23/t30/t31/t32/t34,
#: x09/x10/x12/x14 — then everything r5/r6-fresh by age. The rest of
#: the r6 window (v13/v14, g01-g03, q31/q32, e11, f16/f17, t-series)
#: is r6-green and stays on the local strict harness.

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
    banned = _NEVER_GATE.intersection(_GATE_PRIORITY)
    if banned:
        raise ValueError(
            f"rows-only sketches must stay out of the driver window: {sorted(banned)}"
        )
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
