"""StructType registry for the market-data domain (SURVEY.md §1.2).

One declared schema per raw table — the reference declares these three times
(Postgres DDL kafka_consumer.py:106-191, Snowflake DDL a3_0_stock_common.py
:253-275, dbt sources.yml); here once. Types follow the reference's DDL:
DECIMAL(20,8) prices/quantities, DECIMAL(20,2) money, DECIMAL(28,8)
volume/market-cap, naive TIMESTAMP (session-tz pinned, SURVEY §7), DATE,
strings.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(name: str, dt: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dt, nullable)


STR = T.StringType()
TS = T.TimestampType()
DATE = T.DateType()
PRICE = T.DecimalType(20, 8)
MONEY = T.DecimalType(20, 2)
VOLUME = T.DecimalType(28, 8)
INT = T.IntegerType()

#: reference kafka_consumer.py:106-150; FIXTURES.md §1
RAW_TRANSACTION = T.StructType(
    [
        _s("transaction_id", STR, False),
        _s("customer_id", STR),
        _s("asset_type", STR),
        _s("asset_symbol", STR),
        _s("transaction_type", STR),
        _s("quantity", PRICE),
        _s("price_per_unit", PRICE),
        _s("transaction_amount", MONEY),
        _s("fee_amount", MONEY),
        _s("transaction_timestamp", TS),
        _s("data_date", DATE),
        _s("customer_tier", STR),
        _s("customer_risk_tolerance", STR),
        _s("customer_type", STR),
        _s("data_source", STR),
        _s("load_timestamp", TS, False),
        _s("source", STR),
    ]
)

#: reference kafka_consumer.py:152-172; FIXTURES.md §2
RAW_CUSTOMERS = T.StructType(
    [
        _s("customer_id", STR, False),
        _s("first_name", STR),
        _s("last_name", STR),
        _s("email", STR),
        _s("gender", STR),
        _s("age_group", STR),
        _s("country", STR),
        _s("registration_date", DATE),
        _s("customer_tier", STR),
        _s("risk_tolerance", STR),
        _s("customer_type", STR),
        _s("company_id", STR),
        _s("load_timestamp", TS, False),
        _s("source", STR),
    ]
)

#: reference kafka_consumer.py:174-191; FIXTURES.md §3
RAW_CORPORATES = T.StructType(
    [
        _s("company_id", STR, False),
        _s("company_name", STR),
        _s("company_type", STR),
        _s("company_email", STR),
        _s("country", STR),
        _s("year_founded", INT),
        _s("tax_number", STR),
        _s("office_primary_location", STR),
        _s("registration_date", DATE),
        _s("load_timestamp", TS, False),
        _s("source", STR),
    ]
)

#: reference a2_0_crypto_common.py:121-131; FIXTURES.md §4 — one table per
#: source (binance / coingecko / yfinance), same shape
RAW_CRYPTO_PRICES = T.StructType(
    [
        _s("symbol", STR, False),
        _s("base_currency", STR),
        _s("quote_currency", STR),
        _s("price", PRICE),
        _s("volume", VOLUME),
        _s("source", STR),
        _s("observed_at", TS),
        _s("load_timestamp", TS, False),
    ]
)

#: reference a3_0_stock_common.py:178-201; FIXTURES.md §5
RAW_STOCK_PRICES = T.StructType(
    [
        _s("ticker", STR, False),
        _s("date", DATE),
        _s("open_price", PRICE),
        _s("high_price", PRICE),
        _s("low_price", PRICE),
        _s("close_price", PRICE),
        _s("adj_close_price", PRICE),
        _s("volume", VOLUME),
        _s("avg_volume", VOLUME),
        _s("dividends", PRICE),
        _s("stock_splits", PRICE),
        _s("pe_ratio", PRICE),
        _s("week_52_high", PRICE),
        _s("week_52_low", PRICE),
        _s("market_cap", VOLUME),
        _s("company_name", STR),
        _s("sector", STR),
        _s("industry", STR),
        _s("source", STR),
        _s("observed_at", TS),
        _s("load_timestamp", TS, False),
    ]
)

#: reference a1_5_batch_s3_to_postgres.py:189-206; FIXTURES.md §6
RAW_NEWS = T.StructType(
    [
        _s("ticker", STR, False),
        _s("asset_type", STR),
        _s("url", STR, False),
        _s("title", STR),
        _s("description", STR),
        _s("image", STR),
        _s("date", TS),
        _s("load_timestamp", TS, False),
        _s("source", STR),
    ]
)

SCHEMAS: dict[str, T.StructType] = {
    "raw_transaction_personal": RAW_TRANSACTION,
    "raw_transaction_corporate": RAW_TRANSACTION,
    "raw_customers": RAW_CUSTOMERS,
    "raw_corporates": RAW_CORPORATES,
    "raw_cryptoprices_binance": RAW_CRYPTO_PRICES,
    "raw_cryptoprices_coingecko": RAW_CRYPTO_PRICES,
    "raw_cryptoprices_yfinance": RAW_CRYPTO_PRICES,
    "raw_stockprices_yfinance": RAW_STOCK_PRICES,
    "raw_news": RAW_NEWS,
}
