"""REST / scraper sources (SURVEY.md §2.1 S1-S6).

The reference fetches market data driver-side with ``requests`` and lands
pandas frames (reference a2_1_crypto_binance.py:36-66,
a2_2_crypto_coingecko.py:132-173, a2_4_crypto_freecryptoapi.py:48-132,
a3_1_stock_yfinance.py:50-130, a1_2_news_data_scrapper.py:25-109). Here each
fetcher takes an injected ``client`` callable (``client(url) -> parsed
JSON``) and returns a *typed DataFrame* in the raw-table schema — no ambient
network, fully testable, and the HTTP dependency stays out of the engine.

Scale note: a REST poll of O(100) symbols is inherently driver-side. When the
symbol universe is large, :func:`distributed_fetch` ships the fetch into
executors via ``mapInPandas`` over a repartitioned symbol list — each task
polls its slice of symbols, so ingest bandwidth scales with the cluster, not
the driver.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator, Sequence
from datetime import datetime
from decimal import Decimal
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

Json = Any
Client = Callable[[str], Json]

#: fetcher output = the crypto raw-table schema minus server-side lineage
CRYPTO_FETCH_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("base_currency", T.StringType()),
        T.StructField("quote_currency", T.StringType()),
        T.StructField("price", T.DecimalType(20, 8)),
        T.StructField("volume", T.DecimalType(28, 8)),
        T.StructField("source", T.StringType()),
        T.StructField("observed_at", T.TimestampType()),
    ]
)

NEWS_FETCH_SCHEMA = T.StructType(
    [
        T.StructField("cryptocurrency", T.StringType(), False),
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("image", T.StringType()),
    ]
)


def _d(x, scale: int = 8) -> Decimal | None:
    return None if x is None else Decimal(f"{float(x):.{scale}f}")


def _price_row(base: str, price, volume, source: str, now: datetime) -> tuple:
    return (
        f"{base.upper()}-USD", base.lower(), "USD",
        _d(price), _d(volume), source, now,
    )


# --------------------------------------------------------------------------
# S1 — Binance 24h ticker: one call, filter *USDT pairs as the USD proxy
# (reference a2_1_crypto_binance.py:36-66)
# --------------------------------------------------------------------------
def fetch_binance(
    spark: SparkSession, client: Client, cryptos: Sequence[str], now: datetime,
    base_url: str = "https://api.binance.com/api/v3",
) -> DataFrame:
    wanted = {c.lower() for c in cryptos}
    data = client(f"{base_url}/ticker/24hr")
    rows = []
    for t in data:
        symbol = t.get("symbol", "")
        if symbol.endswith("USDT"):
            base = symbol[:-4].lower()
            if base in wanted:
                rows.append(
                    _price_row(base, float(t.get("lastPrice", 0) or 0),
                               float(t.get("volume", 0) or 0), "binance", now)
                )
    return spark.createDataFrame(rows, CRYPTO_FETCH_SCHEMA)


# --------------------------------------------------------------------------
# S2 — CoinGecko /simple/price, batched 50 ids per call
# (reference a2_2_crypto_coingecko.py:132-173)
# --------------------------------------------------------------------------
def fetch_coingecko(
    spark: SparkSession, client: Client, cryptos: Sequence[str], now: datetime,
    base_url: str = "https://api.coingecko.com/api/v3", batch_size: int = 50,
) -> DataFrame:
    rows = []
    ids = [c.lower() for c in cryptos]
    for i in range(0, len(ids), batch_size):
        batch = ids[i : i + batch_size]
        data = client(
            f"{base_url}/simple/price?ids={','.join(batch)}"
            "&vs_currencies=usd&include_24hr_vol=true"
        )
        for cid in batch:
            quote = data.get(cid)
            if quote and quote.get("usd") is not None:
                rows.append(
                    _price_row(cid, quote["usd"], quote.get("usd_24h_vol"), "coingecko", now)
                )
    return spark.createDataFrame(rows, CRYPTO_FETCH_SCHEMA)


# --------------------------------------------------------------------------
# S4 — generic REST with recursive price/volume extraction from unknown JSON
# shapes (reference a2_4_crypto_freecryptoapi.py:48-132)
# --------------------------------------------------------------------------
PRICE_KEYS = ("price", "last_price", "last", "rate", "usd", "close")
VOLUME_KEYS = ("volume_24h", "vol24h", "volume", "usd_24h_vol", "quoteVolume")


def extract_price_volume(obj: Json) -> tuple[float | None, float | None]:
    """Depth-first search of dicts/lists for the first price/volume-ish keys
    (faithful to the reference's `_extract_price_volume`)."""
    if isinstance(obj, dict):
        price = next((obj[k] for k in PRICE_KEYS if k in obj), None)
        vol = next((obj[k] for k in VOLUME_KEYS if k in obj), None)
        try:
            price_f = float(price) if price is not None else None
        except (TypeError, ValueError):
            price_f = None
        try:
            vol_f = float(vol) if vol is not None else None
        except (TypeError, ValueError):
            vol_f = None
        if price_f is not None or vol_f is not None:
            return price_f, vol_f
        for v in obj.values():
            p, q = extract_price_volume(v)
            if p is not None or q is not None:
                return p, q
    elif isinstance(obj, list):
        for v in obj:
            p, q = extract_price_volume(v)
            if p is not None or q is not None:
                return p, q
    return None, None


def fetch_generic_rest(
    spark: SparkSession, client: Client, cryptos: Sequence[str], now: datetime,
    base_url: str, source: str = "freecryptoapi",
) -> DataFrame:
    rows = []
    for base in cryptos:
        sym = base.upper()
        url = (
            base_url.format(symbol=sym)
            if "{symbol}" in base_url
            else f"{base_url.rstrip('/')}/price?symbol={sym}&convert=USD"
        )
        try:
            data = client(url)
        except Exception:
            continue  # reference skips per-symbol failures (a2_4:123-125)
        price, volume = extract_price_volume(data)
        if price is None:
            continue
        rows.append(_price_row(base, price, volume or 0.0, source, now))
    return spark.createDataFrame(rows, CRYPTO_FETCH_SCHEMA)


# --------------------------------------------------------------------------
# S6 — news scraper + text sanitizer. Fetch is injected; sanitization is a
# Spark column expression chain (P17, reference a1_2:25-44), so it runs
# executor-side at any scale.
# --------------------------------------------------------------------------
def sanitize_text(col: Column | str) -> Column:
    """lower → newlines to spaces → strip HTML tags → double quotes to
    single (reference sanitize_text, a1_2_news_data_scrapper.py:25-44)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[\n\r]", " ")
    c = F.regexp_replace(c, r"<.*?>", "")
    return F.translate(c, '"', "'")


def fetch_news(
    spark: SparkSession,
    fetch_articles: Callable[[str], Iterable[dict]],
    cryptos: Sequence[str],
    limit: int = 10,
) -> DataFrame:
    """Per-crypto article fetch (first ``limit`` currencies, reference
    a1_2:56-58), tagged with the currency, sanitized Spark-side."""
    rows = []
    for crypto in list(cryptos)[:limit]:
        try:
            articles = fetch_articles(crypto)
        except Exception:
            continue  # reference ignores per-currency scrape errors
        for a in articles:
            rows.append(
                (crypto, a.get("url"), a.get("title"), a.get("description"),
                 a.get("date"), a.get("image"))
            )
    df = spark.createDataFrame(rows, NEWS_FETCH_SCHEMA)
    return df.withColumn("title", sanitize_text("title")).withColumn(
        "description", sanitize_text("description")
    )


# --------------------------------------------------------------------------
# Scale path: executor-side fetching over a distributed symbol list
# --------------------------------------------------------------------------
def distributed_fetch(
    spark: SparkSession,
    symbols: Sequence[str],
    fetch_one: Callable[[str], dict | None],
    now: datetime,
    source: str,
    parallelism: int | None = None,
) -> DataFrame:
    """Fan the per-symbol fetch out to executors: symbols become a DataFrame,
    each partition's task calls ``fetch_one`` (must be picklable and return
    ``{'price':…, 'volume':…}`` or None) for its slice. This is how a
    100k-symbol poll runs on a cluster — the driver never touches the API.
    """
    import pandas as pd  # local import: only needed on this path

    par = parallelism or spark.sparkContext.defaultParallelism
    sdf = spark.createDataFrame([(s,) for s in symbols], "base string").repartition(par)

    def poll(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for base in pdf["base"]:
                quote = fetch_one(base)
                if quote and quote.get("price") is not None:
                    out.append(
                        {
                            "symbol": f"{base.upper()}-USD",
                            "base_currency": base.lower(),
                            "quote_currency": "USD",
                            "price": float(quote["price"]),
                            "volume": float(quote.get("volume") or 0.0),
                            "source": source,
                            "observed_at": now,
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "symbol", "base_currency", "quote_currency", "price",
                    "volume", "source", "observed_at",
                ],
            )

    out_schema = (
        "symbol string, base_currency string, quote_currency string, "
        "price double, volume double, source string, observed_at timestamp"
    )
    fetched = sdf.mapInPandas(poll, out_schema)
    return fetched.select(
        "symbol", "base_currency", "quote_currency",
        F.col("price").cast("decimal(20,8)").alias("price"),
        F.col("volume").cast("decimal(28,8)").alias("volume"),
        "source", "observed_at",
    )
