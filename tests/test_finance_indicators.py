"""Value-level checks for the f-series indicators that have closed-form
answers on tiny hand-built tapes — independent of the DuckDB oracle sweep
(test_oracle_parity covers engine parity; these pin the SEMANTICS)."""

from __future__ import annotations

import json
from datetime import datetime

import pytest

from stock_crypto_data_pipeline_public_spark.plans.finance import (
    f11_stochastic_oscillator,
    f12_obv_daily_close,
)


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts, value, size) on one instrument 'A'."""
    df = spark.createDataFrame(
        [
            (
                int(eid),
                datetime.fromisoformat(ts),
                "u1",
                "A",
                float(v),
                json.dumps({"k": int(size)}),
            )
            for eid, ts, v, size in rows
        ],
        "event_id long, ts timestamp, user_id string, event_type string, "
        "value double, props string",
    )
    out = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(out + "/events.parquet")
    return out


def test_obv_accumulates_signed_volume(spark, tmp_path):
    # tape: up +10, down -20, flat 0, up +5  => daily closes per UTC day
    rows = [
        (1, "2024-01-01 10:00:00", 100.0, 7),   # first tick: flow 0
        (2, "2024-01-01 11:00:00", 101.0, 10),  # up   -> +10  (obv 10)
        (3, "2024-01-01 12:00:00", 100.5, 20),  # down -> -20  (obv -10)
        (4, "2024-01-02 09:00:00", 100.5, 9),   # flat -> 0    (obv -10)
        (5, "2024-01-02 10:00:00", 101.5, 5),   # up   -> +5   (obv -5)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        (r.symbol, str(r.trade_date)): (r.obv_close, r.n_ticks)
        for r in f12_obv_daily_close(spark, sf).collect()
    }
    assert got == {
        ("A", "2024-01-01"): (-10, 3),
        ("A", "2024-01-02"): (-5, 2),
    }


def test_stochastic_flat_range_pins_midpoint(spark, tmp_path):
    # 14 identical ticks -> HH == LL -> %K pinned at 50, one observation
    rows = [
        (i, f"2024-01-01 10:{i:02d}:00", 42.0, 1) for i in range(1, 15)
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = f11_stochastic_oscillator(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.symbol, r.n_obs, r.avg_k) == ("A", 1, 50.0)
    # %D needs 3 %K observations -> NULL here
    assert r.avg_d is None
    assert (r.n_overbought, r.n_oversold) == (0, 0)


def test_stochastic_k_hits_extremes(spark, tmp_path):
    # strictly rising tape: every close IS the 14-tick high -> %K = 100
    rows = [
        (i, f"2024-01-01 10:{i:02d}:00", 100.0 + i, 1) for i in range(1, 18)
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = f11_stochastic_oscillator(spark, sf).collect()
    r = out[0]
    assert (r.n_obs, r.avg_k, r.avg_d) == (4, 100.0, 100.0)
    assert (r.n_overbought, r.n_oversold) == (4, 0)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
