"""Bucketed range join operator (operators/rangejoin.py): equivalence with
the naive inequality join, boundary inclusivity, and validation."""

from __future__ import annotations

from datetime import datetime, timedelta
import random

import pytest
from pyspark.sql import functions as F

from stock_crypto_data_pipeline_public_spark.operators.rangejoin import bucketed_range_join

BASE = datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def sides(spark):
    rng = random.Random(5)
    points = spark.createDataFrame(
        [(i, rng.randrange(3), BASE + timedelta(minutes=rng.randrange(10_000))) for i in range(400)],
        "point_id int, k int, ts timestamp",
    )
    intervals = []
    for j in range(60):
        start = BASE + timedelta(minutes=rng.randrange(9_000))
        intervals.append((j, rng.randrange(3), start, start + timedelta(minutes=rng.randrange(1, 600))))
    ivs = spark.createDataFrame(intervals, "iv_id int, k int, start timestamp, end timestamp")
    return points.cache(), ivs.cache()


def test_matches_naive_inequality_join(sides):
    points, ivs = sides
    naive = points.join(
        ivs, (points.k == ivs.k) & points.ts.between(ivs.start, ivs.end)
    ).select("point_id", "iv_id")
    bucketed = bucketed_range_join(
        points, ivs, on=["k"], point_ts="ts", start_ts="start", end_ts="end", bucket="6 hours"
    ).select("point_id", "iv_id")
    assert {tuple(r) for r in naive.collect()} == {tuple(r) for r in bucketed.collect()}
    # also with a bucket smaller than typical interval length (more explode)
    fine = bucketed_range_join(
        points, ivs, on=["k"], point_ts="ts", start_ts="start", end_ts="end", bucket="1 hour"
    ).select("point_id", "iv_id")
    assert {tuple(r) for r in naive.collect()} == {tuple(r) for r in fine.collect()}


def test_boundaries_inclusive(spark):
    t0 = BASE
    points = spark.createDataFrame(
        [(1, 1, t0), (2, 1, t0 + timedelta(hours=2)), (3, 1, t0 + timedelta(hours=2, seconds=1))],
        "point_id int, k int, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [(10, 1, t0, t0 + timedelta(hours=2))], "iv_id int, k int, start timestamp, end timestamp"
    )
    got = {
        r.point_id
        for r in bucketed_range_join(
            points, ivs, on=["k"], point_ts="ts", start_ts="start", end_ts="end", bucket="1 hour"
        ).collect()
    }
    assert got == {1, 2}  # start and end inclusive, 1s past end excluded


def _to_ntz(df, *cols):
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
    return df


def test_ntz_matches_naive_inequality_join(sides):
    # the production e08 path: events.ts is TIMESTAMP_NTZ, which routes
    # through the tz-invariant epoch_s helper instead of unix_timestamp
    points, ivs = sides
    p_ntz = _to_ntz(points, "ts")
    iv_ntz = _to_ntz(ivs, "start", "end")
    naive = p_ntz.join(
        iv_ntz, (p_ntz.k == iv_ntz.k) & p_ntz.ts.between(iv_ntz.start, iv_ntz.end)
    ).select("point_id", "iv_id")
    bucketed = bucketed_range_join(
        p_ntz, iv_ntz, on=["k"], point_ts="ts", start_ts="start", end_ts="end", bucket="6 hours"
    ).select("point_id", "iv_id")
    assert {tuple(r) for r in naive.collect()} == {tuple(r) for r in bucketed.collect()}


def test_mixed_timestamp_types_rejected(sides):
    points, ivs = sides
    with pytest.raises(TypeError, match="timestamp type mismatch"):
        bucketed_range_join(
            _to_ntz(points, "ts"), ivs,
            on=["k"], point_ts="ts", start_ts="start", end_ts="end",
        )


def test_column_collision_rejected(sides):
    points, ivs = sides
    with pytest.raises(ValueError, match="collision"):
        bucketed_range_join(
            points.withColumnRenamed("point_id", "iv_id"), ivs,
            on=["k"], point_ts="ts", start_ts="start", end_ts="end",
        )


def test_left_join_keeps_unmatched_points(spark):
    t0 = BASE
    points = spark.createDataFrame(
        [(1, 1, t0 + timedelta(hours=1)), (2, 1, t0 + timedelta(days=30)), (3, 2, t0)],
        "point_id int, k int, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [(10, 1, t0, t0 + timedelta(hours=2))], "iv_id int, k int, start timestamp, end timestamp"
    )
    got = bucketed_range_join(
        points, ivs, on=["k"], point_ts="ts", start_ts="start", end_ts="end",
        bucket="1 hour", how="left",
    ).collect()
    by_id = {r.point_id: r for r in got}
    assert set(by_id) == {1, 2, 3}
    assert by_id[1].iv_id == 10            # contained -> matched
    assert by_id[2].iv_id is None          # same key, out of range -> kept w/ nulls
    assert by_id[3].iv_id is None          # different key -> kept w/ nulls


def test_rejects_unknown_how(sides):
    points, ivs = sides
    with pytest.raises(ValueError, match="how"):
        bucketed_range_join(
            points, ivs, on=["k"], point_ts="ts", start_ts="start", end_ts="end", how="full"
        )


def _left_oracle(points, ivs, on):
    """Naive left range join as a row MULTISET: inner inequality join plus
    the unmatched points null-extended — duplicates preserved, which is
    exactly what a pid collision would corrupt."""
    cond = (points["ts"] >= ivs["start"]) & (points["ts"] <= ivs["end"])
    for c in on:
        cond = cond & (points[c] == ivs[c])
    ivs_sel = ivs.select("iv_id", *on, "start", "end")
    inner = points.join(ivs_sel, cond).select(
        *[points[c] for c in points.columns], ivs_sel["iv_id"]
    )
    matched_only = inner.select(*points.columns)
    unmatched = points.exceptAll(matched_only).withColumn(
        "iv_id", F.lit(None).cast("int")
    )
    return sorted(
        (tuple(r) for r in inner.unionByName(unmatched).select(*points.columns, "iv_id").collect()),
        key=_nkey,
    )


def _nkey(t):
    """None-safe tuple sort key (None sorts before any value)."""
    return tuple((v is not None, v) for v in t)


def test_left_join_pid_survives_nulls_separators_and_duplicates(spark):
    """Regression for the __pid identity fix: duplicate point rows whose
    fields contain NULLs and '#' separator look-alikes must neither drop
    nor duplicate under how='left'. The old bare concat_ws identity
    collided ('x', NULL) with (NULL, 'x') and ('a#1', NULL) with
    ('a', '1') — colliding pids make the unmatched-recovery pass drop or
    clone rows whenever collided twins differ in matchedness."""
    t_in = BASE + timedelta(hours=1)     # inside the interval below
    t_out = BASE + timedelta(days=30)    # outside every interval
    rows = [
        # concat_ws-collision twins: same rendering under the old scheme,
        # opposite matchedness (one in-window, one out)
        ("g", "x", None, t_in),
        ("g", None, "x", t_out),
        # the NULL collision SPANNING the join key — ADVICE's exact case:
        # "g#<t_in>#1" rendered identically by both under bare concat_ws,
        # but the first matches and the second (NULL key) never can; a
        # collided pid anti-joins the unmatched twin away (row LOST)
        ("g", None, None, t_in),
        (None, "g", None, t_in),
        # separator-embedding twins
        ("g", "a#1", None, t_in),
        ("g", "a", "1", t_out),
        # exact duplicates, both matched (must yield 2 matched rows)
        ("g", "dup", "dup", t_in),
        ("g", "dup", "dup", t_in),
        # exact duplicates, both unmatched (must yield 2 null-extended rows)
        ("g", "dup2", None, t_out),
        ("g", "dup2", None, t_out),
        # NULL join key: never matches, must survive null-extended
        (None, "x", "x", t_in),
    ]
    points = spark.createDataFrame(
        rows, "k string, f1 string, f2 string, ts timestamp"
    )
    ivs = spark.createDataFrame(
        [(1, "g", BASE, BASE + timedelta(hours=2))],
        "iv_id int, k string, start timestamp, end timestamp",
    )
    got = sorted(
        (
            tuple(r)
            for r in bucketed_range_join(
                points, ivs, on=["k"], point_ts="ts", start_ts="start",
                end_ts="end", bucket="1 hour", how="left",
            ).select(*points.columns, "iv_id").collect()
        ),
        key=_nkey,
    )
    assert got == _left_oracle(points, ivs, ["k"])
    # row conservation, spelled out: every input row appears exactly once
    # (the two in-window duplicates match the single interval once each)
    assert len(got) == len(rows)


def test_left_join_randomized_nullable_rows_match_naive(spark):
    """Seeded sweep over nullable point rows drawn from a collision-prone
    pool ('x', '#', 'x#1', NULL) with heavy duplication — the bucketed
    left join must equal the naive inequality-join oracle as a multiset."""
    rng = random.Random(11)
    pool = ["x", "#", "x#1", "a", None]
    rows = [
        (
            rng.choice(["g", "h"]),
            rng.choice(pool),
            rng.choice(pool),
            BASE + timedelta(minutes=rng.randrange(0, 5000)),
        )
        for _ in range(300)
    ]
    points = spark.createDataFrame(
        rows, "k string, f1 string, f2 string, ts timestamp"
    )
    ivs_rows = []
    for j in range(20):
        start = BASE + timedelta(minutes=rng.randrange(0, 4500))
        ivs_rows.append(
            (j, rng.choice(["g", "h"]), start, start + timedelta(minutes=rng.randrange(1, 500)))
        )
    ivs = spark.createDataFrame(
        ivs_rows, "iv_id int, k string, start timestamp, end timestamp"
    )
    got = sorted(
        (
            tuple(r)
            for r in bucketed_range_join(
                points, ivs, on=["k"], point_ts="ts", start_ts="start",
                end_ts="end", bucket="2 hours", how="left",
            ).select(*points.columns, "iv_id").collect()
        ),
        key=_nkey,
    )
    assert got == _left_oracle(points, ivs, ["k"])
