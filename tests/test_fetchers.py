"""Fetcher source tests (S1-S6) with deterministic fake clients."""

from __future__ import annotations

from datetime import datetime
from decimal import Decimal

import pytest

from stock_crypto_data_pipeline_public_spark.sources import fetchers

NOW = datetime(2024, 3, 1, 12, 0, 0)


def test_fetch_binance_filters_usdt_pairs(spark):
    def client(url):
        assert url.endswith("/ticker/24hr")
        return [
            {"symbol": "BTCUSDT", "lastPrice": "42000.5", "volume": "123.25"},
            {"symbol": "ETHBTC", "lastPrice": "0.05", "volume": "9"},      # not USDT
            {"symbol": "DOGEUSDT", "lastPrice": "0.1", "volume": "7"},     # not wanted
            {"symbol": "ETHUSDT", "lastPrice": None, "volume": None},      # null-safe
        ]

    df = fetchers.fetch_binance(spark, client, ["btc", "eth"], NOW)
    got = {r.symbol: r for r in df.collect()}
    assert set(got) == {"BTC-USD", "ETH-USD"}
    assert got["BTC-USD"].price == Decimal("42000.50000000")
    assert got["BTC-USD"].base_currency == "btc" and got["BTC-USD"].quote_currency == "USD"
    assert got["ETH-USD"].price == Decimal("0")  # "or 0" fallback
    assert all(r.source == "binance" and r.observed_at == NOW for r in got.values())


def test_fetch_coingecko_batches(spark):
    calls = []

    def client(url):
        calls.append(url)
        return {"btc": {"usd": 42000, "usd_24h_vol": 5.5}, "eth": {"usd": 2200}}

    ids = [f"c{i}" for i in range(60)] + ["btc", "eth"]
    df = fetchers.fetch_coingecko(spark, client, ids, NOW, batch_size=50)
    assert len(calls) == 2  # 62 ids -> two batches
    got = {r.symbol: r for r in df.collect()}
    assert got["BTC-USD"].volume == Decimal("5.50000000")
    assert got["ETH-USD"].volume is None  # missing 24h vol stays null


def test_extract_price_volume_recursive():
    nested = {"data": [{"meta": "x"}, {"quote": {"USDT": {"last": "9.5", "vol24h": 3}}}]}
    assert fetchers.extract_price_volume(nested) == (9.5, 3.0)
    assert fetchers.extract_price_volume({"a": [1, 2]}) == (None, None)
    # non-numeric price -> None (reference try/except float)
    assert fetchers.extract_price_volume({"price": "n/a", "volume": "2"}) == (None, 2.0)


def test_fetch_generic_rest_skips_failures(spark):
    def client(url):
        if "BAD" in url:
            raise ConnectionError("boom")
        if "EMPTY" in url:
            return {"nothing": True}
        return {"result": {"rate": 7.25, "volume_24h": 11}}

    df = fetchers.fetch_generic_rest(
        spark, client, ["btc", "bad", "empty"], NOW, "https://api.example.com/v1"
    )
    rows = df.collect()
    assert [r.symbol for r in rows] == ["BTC-USD"]
    assert rows[0].price == Decimal("7.25000000")


def test_fetch_news_sanitizes(spark):
    def articles(crypto):
        if crypto == "eth":
            raise RuntimeError("scrape failed")
        return [
            {"url": "http://n.example.com/1", "title": 'BTC <b>Soars</b>\nTo "Record"',
             "description": "Line1\r\nLine2", "date": "2024-03-01", "image": None},
        ]

    df = fetchers.fetch_news(spark, articles, ["btc", "eth", "sol"], limit=2)
    rows = df.collect()
    assert len(rows) == 1  # eth failed and was skipped; sol beyond limit
    assert rows[0].title == "btc soars to 'record'"
    assert rows[0].description == "line1  line2"


def test_distributed_fetch_runs_on_executors(spark):
    quotes = {"btc": {"price": 42000.0, "volume": 10}, "eth": {"price": 2200.0}}

    def fetch_one(base):
        return quotes.get(base)

    df = fetchers.distributed_fetch(spark, ["btc", "eth", "unknown"], fetch_one, NOW, "fake")
    got = {r.symbol: r for r in df.collect()}
    assert set(got) == {"BTC-USD", "ETH-USD"}
    assert got["ETH-USD"].volume == Decimal("0")
    assert dict(df.dtypes)["price"] == "decimal(20,8)"
