"""Deterministic synthetic market-data generator (S7 shape).

Mirrors the reference's Faker batch generator semantics (reference
a1_1_raw_data_faker_generator.py:131-490): corporates → customers (80%
personal / 20% corporate, corporate customers keyed by their company) →
transactions (tier-weighted quantities, 0.1-1% fees, amount = qty × price),
plus multi-source crypto prices, daily stock OHLCV (low ≤ open/close ≤ high),
and sanitized news rows.

Adds the FIXTURES.md §7 correctness hooks the reference's generator lacks:
SCD2 customer versions, exact duplicate business keys across batches,
unchanged satellite re-emits, tie load_timestamps, personal customers with
null company_id, and cross-source price overlap. Seeded (default 42) —
byte-stable across runs. Driver-side by design: test fixtures, not a scale
path.
"""

from __future__ import annotations

import random
import uuid
from datetime import date, datetime, timedelta
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession

from ..schemas import SCHEMAS

TIERS = ["Bronze", "Silver", "Gold", "Platinum"]
RISKS = ["Conservative", "Moderate", "Aggressive"]
COUNTRIES = ["US", "CA", "UK", "AU", "DE", "FR", "JP", "SG", "NL", "CH"]
AGE_GROUPS = ["18-25", "26-35", "36-45", "46-55", "56-65", "65+"]
STOCKS = ["AAPL", "MSFT", "GOOG", "AMZN", "TSLA", "NVDA", "META", "JPM"]
CRYPTOS = ["BTC", "ETH", "SOL", "ADA", "DOT", "LINK"]
PRICE_SOURCES = ["binance", "coingecko", "yfinance"]
BASE = datetime(2024, 1, 1)


def _d2(x: float) -> Decimal:
    return Decimal(f"{x:.2f}")


def _d8(x: float) -> Decimal:
    return Decimal(f"{x:.8f}")


class MarketDataFaker:
    def __init__(self, seed: int = 42, n_corporates: int = 20, n_customers: int = 100,
                 n_transactions: int = 500, n_price_days: int = 30, n_news: int = 40):
        self.rng = random.Random(seed)
        self.n_corporates = n_corporates
        self.n_customers = n_customers
        self.n_transactions = n_transactions
        self.n_price_days = n_price_days
        self.n_news = n_news

    def _uuid(self, n: int) -> str:
        return uuid.UUID(int=self.rng.getrandbits(128)).hex[:n].upper()

    def _ts(self, day_range: int = 60) -> datetime:
        return BASE + timedelta(
            days=self.rng.randrange(day_range), seconds=self.rng.randrange(86400)
        )

    # -- corporates ---------------------------------------------------------
    def corporates(self) -> list[tuple]:
        rows = []
        for i in range(self.n_corporates):
            cid = self._uuid(12)
            load = self._ts()
            rows.append(
                (
                    cid,
                    f"Company {i:03d}",
                    self.rng.choice(["LLC", "PUBLIC", "PRIVATE"]),
                    f"contact@company{i:03d}.example.com",
                    self.rng.choice(COUNTRIES),
                    self.rng.randrange(1950, 2021),
                    f"TAX{self.rng.randrange(10**9):09d}",
                    f"{self.rng.randrange(1, 999)} Example St",
                    (BASE - timedelta(days=self.rng.randrange(3650))).date(),
                    load,
                    "BATCH_DATA",
                )
            )
        # duplicate business keys across a second batch (idempotence hook)
        for r in rows[: max(1, self.n_corporates // 5)]:
            rows.append(r[:-2] + (r[-2] + timedelta(hours=1), "KAFKA_DATA"))
        return rows

    # -- customers ----------------------------------------------------------
    def customers(self, corporates: list[tuple]) -> list[tuple]:
        rows = []
        for i in range(self.n_customers):
            corporate = self.rng.random() < 0.2 and corporates
            if corporate:
                comp = self.rng.choice(corporates)
                cid, company_id = comp[0], comp[0]
                first = last = gender = age = None
                email = comp[3]
            else:
                cid, company_id = self._uuid(10), None
                first, last = f"First{i}", f"Last{i}"
                gender = self.rng.choice(["M", "F", "Other"])
                age = self.rng.choice(AGE_GROUPS)
                email = f"user{i}@example.com"
            base_row = (
                cid, first, last, email, gender, age,
                self.rng.choice(COUNTRIES),
                (BASE - timedelta(days=self.rng.randrange(3650))).date(),
                self.rng.choice(TIERS), self.rng.choice(RISKS),
                "CORPORATE" if corporate else "PERSONAL",
                company_id, self._ts(), "BATCH_DATA",
            )
            rows.append(base_row)
            # SCD2 hook: ~20% of customers get a second version with a new
            # tier/risk and a later load_timestamp
            if self.rng.random() < 0.2:
                rows.append(
                    base_row[:8]
                    + (self.rng.choice(TIERS), self.rng.choice(RISKS))
                    + base_row[10:12]
                    + (base_row[12] + timedelta(days=5), "KAFKA_DATA")
                )
            # hashdiff hook: ~10% re-emit unchanged attributes, newer load
            if self.rng.random() < 0.1:
                rows.append(base_row[:12] + (base_row[12] + timedelta(days=9), "KAFKA_DATA"))
        return rows

    # -- transactions -------------------------------------------------------
    def transactions(self, customers: list[tuple]) -> tuple[list[tuple], list[tuple]]:
        personal, corporate = [], []
        for _ in range(self.n_transactions):
            cust = self.rng.choice(customers)
            is_stock = self.rng.random() < 0.6
            symbol = self.rng.choice(STOCKS if is_stock else CRYPTOS)
            qty = (
                float(self.rng.randrange(1, 20) * 100)
                if is_stock
                else self.rng.random() * {"Bronze": 1, "Silver": 5, "Gold": 20, "Platinum": 100}[cust[8]]
            )
            price = self.rng.uniform(10, 500) if is_stock else self.rng.uniform(0.1, 50000)
            amount = round(qty * price, 2)
            fee_pct = self.rng.uniform(0.001, 0.01 if is_stock else 0.005)
            ts = self._ts()
            row = (
                uuid.UUID(int=self.rng.getrandbits(128)).hex,
                cust[0],
                "STOCK" if is_stock else "CRYPTO",
                symbol,
                self.rng.choice(["BUY", "SELL"]),
                _d8(qty), _d8(price), _d2(amount), _d2(amount * fee_pct),
                ts, ts.date(), cust[8], cust[9], cust[10],
                "FAKE_DATA_GENERATOR", self._ts(5), "BATCH_DATA",
            )
            (personal if cust[10] == "PERSONAL" else corporate).append(row)
        # cross-table duplicate hook: one personal txn re-delivered in the
        # corporate feed (exercises union-dedup)
        if personal:
            corporate.append(personal[0])
        return personal, corporate

    # -- prices -------------------------------------------------------------
    def crypto_prices(self) -> dict[str, list[tuple]]:
        out: dict[str, list[tuple]] = {s: [] for s in PRICE_SOURCES}
        for day in range(self.n_price_days):
            observed = BASE + timedelta(days=day, hours=12)
            for sym in CRYPTOS:
                base_price = self.rng.uniform(0.5, 50000)
                for src in PRICE_SOURCES:
                    # same asset in every source, ≤20% variance (FIXTURES §4)
                    jitter = 1 + self.rng.uniform(-0.05, 0.05)
                    out[src].append(
                        (
                            f"{sym}-USD", sym.lower(), "USD",
                            _d8(base_price * jitter),
                            _d8(self.rng.uniform(0, 10**6)),
                            src, observed, observed + timedelta(minutes=5),
                        )
                    )
        return out

    def stock_prices(self) -> list[tuple]:
        rows = []
        for day in range(self.n_price_days):
            d = (BASE + timedelta(days=day)).date()
            observed = BASE + timedelta(days=day, hours=21)
            for tick in STOCKS:
                o, c = self.rng.uniform(50, 500), self.rng.uniform(50, 500)
                hi = max(o, c) * (1 + self.rng.uniform(0, 0.05))
                lo = min(o, c) * (1 - self.rng.uniform(0, 0.05))
                w52h = hi * (1 + self.rng.uniform(0, 0.5))
                rows.append(
                    (
                        tick, d, _d8(o), _d8(hi), _d8(lo), _d8(c), _d8(c * 0.99),
                        _d8(self.rng.uniform(10**5, 10**7)),
                        _d8(self.rng.uniform(10**5, 10**7)),
                        _d8(0), _d8(0), _d8(self.rng.uniform(5, 60)),
                        _d8(w52h), _d8(lo * (1 - self.rng.uniform(0, 0.5))),
                        _d8(self.rng.uniform(10**8, 10**11)),
                        f"{tick} Inc", "Technology", "Software",
                        "yfinance", observed, observed + timedelta(minutes=10),
                    )
                )
        return rows

    def news(self) -> list[tuple]:
        rows = []
        for i in range(self.n_news):
            sym = self.rng.choice(CRYPTOS)
            pub = self._ts(self.n_price_days)
            rows.append(
                (
                    sym, "CRYPTO",
                    f"http://news.example.com/{sym.lower()}/{i}",
                    f"{sym.lower()} headline {i}",
                    f"sanitized body text about {sym.lower()} number {i}",
                    f"http://img.example.com/{i}.png",
                    pub, pub + timedelta(hours=2), "karpet",
                )
            )
        # dedup-grain hook: same (url, ticker, asset_type), later load
        if rows:
            first = rows[0]
            rows.append(first[:7] + (first[7] + timedelta(hours=6), "karpet"))
        return rows

    # -- assemble -----------------------------------------------------------
    def generate(self, spark: SparkSession) -> dict[str, DataFrame]:
        corporates = self.corporates()
        customers = self.customers(corporates)
        personal, corporate = self.transactions(customers)
        crypto = self.crypto_prices()
        data = {
            "raw_corporates": corporates,
            "raw_customers": customers,
            "raw_transaction_personal": personal,
            "raw_transaction_corporate": corporate,
            "raw_cryptoprices_binance": crypto["binance"],
            "raw_cryptoprices_coingecko": crypto["coingecko"],
            "raw_cryptoprices_yfinance": crypto["yfinance"],
            "raw_stockprices_yfinance": self.stock_prices(),
            "raw_news": self.news(),
        }
        return {
            name: spark.createDataFrame(rows, SCHEMAS[name]) for name, rows in data.items()
        }
