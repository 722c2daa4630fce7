"""As-of join operator edge cases (operators/asof.py)."""

from __future__ import annotations

from datetime import datetime

import pytest

from stock_crypto_data_pipeline_public_spark.operators.asof import asof_join_backward


def _ts(h):
    return datetime(2024, 1, 1, h)


@pytest.fixture(scope="module")
def sides(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts(9)),    # before any price -> null
            (2, "A", _ts(10)),   # exactly at price ts -> inclusive match 100
            (3, "A", _ts(11)),   # between -> still 100
            (4, "A", _ts(13)),   # after second price -> 105
            (5, "B", _ts(12)),   # other key -> B's price only
            (6, "C", _ts(12)),   # key with no prices at all -> null
        ],
        "trade_id int, sym string, trade_ts timestamp",
    )
    prices = spark.createDataFrame(
        [
            ("A", _ts(10), 100.0),
            ("A", _ts(12), 105.0),
            ("B", _ts(10), 7.0),
        ],
        "sym string, price_ts timestamp, price double",
    )
    return trades, prices


def test_backward_match_semantics(sides):
    trades, prices = sides
    out = {
        r.trade_id: r.price
        for r in asof_join_backward(
            trades, prices, on=["sym"], left_ts="trade_ts", right_ts="price_ts",
            payload=["price"],
        ).collect()
    }
    assert out == {1: None, 2: 100.0, 3: 100.0, 4: 105.0, 5: 7.0, 6: None}


def test_left_columns_and_count_preserved(sides):
    trades, prices = sides
    joined = asof_join_backward(
        trades, prices, on=["sym"], left_ts="trade_ts", right_ts="price_ts",
        payload=["price"],
    )
    assert joined.count() == trades.count()
    assert joined.columns == ["trade_id", "sym", "trade_ts", "price"]


def test_payload_collision_rejected(sides):
    trades, prices = sides
    with pytest.raises(ValueError, match="collide"):
        asof_join_backward(
            trades.withColumnRenamed("trade_ts", "price"), prices,
            on=["sym"], left_ts="price", right_ts="price_ts", payload=["price"],
        )


def test_null_payload_does_not_leak_stale_value(spark):
    """A right row whose payload is legitimately NULL must win as-of its
    time — per-column last(ignorenulls) would skip it and leak the older
    price forward (and could stitch fields from different rows)."""
    from datetime import datetime

    from stock_crypto_data_pipeline_public_spark.operators.asof import asof_join_backward

    t = lambda m: datetime(2024, 1, 1, 10, m)
    right = spark.createDataFrame(
        [("k", t(0), 10.0, "a"), ("k", t(2), None, "b")],
        "k string, rts timestamp, price double, src string",
    )
    left = spark.createDataFrame([("k", t(3))], "k string, lts timestamp")
    [row] = asof_join_backward(
        left, right, on=["k"], left_ts="lts", right_ts="rts", payload=["price", "src"]
    ).collect()
    assert row.price is None and row.src == "b"  # the ts=2 row, intact
