"""Bucketed range join: point-in-interval matching without a nested loop.

Spark plans a raw ``l.ts BETWEEN r.start AND r.end`` join as a broadcast
nested loop (every point × every interval). This operator makes it an
EQUI-join: points get a time-bucket key, intervals explode into the buckets
they cover, and the join runs on (keys…, bucket) with the exact BETWEEN as
a post-filter. Work scales with points-per-bucket × intervals-per-bucket —
at 100 TB, pick ``bucket`` ≈ the typical interval length so each interval
explodes into ~2 buckets.

The reference's closest shape is the news date-offset grid (J6,
fct_asset_news_impact.sql:55-73) — fixed offsets, so it could stay an
equi-join; true variable-length intervals need this bucketing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

from ..functions.timeops import epoch_s


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket: str = "1 week",
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row (same ``on`` keys) whose
    ``[start_ts, end_ts]`` contains ``point_ts`` (inclusive both ends).

    ``bucket`` is any Spark window duration ('1 week', '1 day', '6 hours').
    Output = all point columns + all interval columns (names must not
    collide except the ``on`` keys).

    ``how``: 'inner' or 'left'. Left keeps points with no containing
    interval (null interval columns) — this needs an explicit second pass
    below: a naive ``join(..., 'left')`` would run the exact BETWEEN as a
    post-filter and silently drop the very null-extended rows a left join
    exists to keep.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    on = list(on)
    overlap = (set(points.columns) & set(intervals.columns)) - set(on)
    if overlap:
        raise ValueError(f"column collision outside join keys: {sorted(overlap)}")

    # bucket arithmetic in epoch seconds; TIMESTAMP_NTZ columns (the test
    # tables' ts type) need the tz-invariant helper — unix_timestamp is
    # LTZ-only and would raise (or shift by session tz) on them. Resolved
    # per column from its owning DataFrame's schema: NTZ points against LTZ
    # intervals (or vice versa) would otherwise bucket one side through the
    # session tz and silently drop matches at bucket edges.
    def _secs_for(df: DataFrame, name: str):
        if isinstance(df.schema[name].dataType, TimestampNTZType):
            return epoch_s
        return F.unix_timestamp

    point_secs = _secs_for(points, point_ts)
    start_secs = _secs_for(intervals, start_ts)
    end_secs = _secs_for(intervals, end_ts)
    if {point_secs, start_secs, end_secs} == {epoch_s, F.unix_timestamp}:
        # mixed NTZ/LTZ epoch bases differ by the session-tz offset; BETWEEN
        # below would also be a cross-type comparison — refuse loudly.
        raise TypeError(
            f"timestamp type mismatch across {point_ts!r}/{start_ts!r}/{end_ts!r}: "
            "all three must be TIMESTAMP or all TIMESTAMP_NTZ"
        )
    # interval length in whole seconds, computed without touching the session
    # tz (the old epoch-literal + unix_timestamp trick was off by the tz offset)
    bucket_len = F.lit(0) + F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
        f"TIMESTAMP_NTZ'1970-01-01 00:00:00' + INTERVAL {bucket})"
    )

    # a deterministic per-row identity for the left-join recovery pass:
    # duplicates of the same point row are interchangeable, so numbering
    # them within their value-group is stable across plan re-execution
    # (monotonically_increasing_id is not)
    if how == "left":
        occ = W.partitionBy(*[F.col(c) for c in points.columns]).orderBy(F.lit(1))
        # identity = sha2 over the STRUCT's json rendering + occurrence
        # number: to_json preserves null-vs-value per field and quotes
        # strings, so ('x', NULL) vs (NULL, 'x') and values embedding a
        # separator can't collide the way a bare concat_ws (which skips
        # NULLs and concatenates ambiguously) silently did
        points = points.withColumn(
            "__pid",
            F.sha2(
                F.concat_ws(
                    "#",
                    F.to_json(F.struct(*[F.col(c) for c in points.columns])),
                    F.row_number().over(occ).cast("string"),
                ),
                256,
            ),
        )

    p = points.withColumn("__bucket", F.floor(point_secs(F.col(point_ts)) / bucket_len))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(start_secs(F.col(start_ts)) / bucket_len),
                F.floor(end_secs(F.col(end_ts)) / bucket_len),
            )
        ),
    )
    joined = p.join(iv, on + ["__bucket"], "inner").filter(
        F.col(point_ts).between(F.col(start_ts), F.col(end_ts))
    ).drop("__bucket")
    if how == "inner":
        return joined
    unmatched = points.join(
        joined.select("__pid").distinct(), "__pid", "left_anti"
    )
    return joined.unionByName(unmatched, allowMissingColumns=True).drop("__pid")
