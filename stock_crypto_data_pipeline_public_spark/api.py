"""Analyst / chatbot query API over the market marts (SURVEY.md §3.3).

The Spark re-expression of the reference's six LangGraph warehouse tools
(reference scripts/chatbot/warehouse_tools.py:140-438) and their
human-in-the-loop pending-query workflow (warehouse_tools.py:70-137):

- each tool is a parameterized function over the built mart DataFrames
  (plans/market.py context), returning a *lazy* DataFrame;
- parameters are applied as DataFrame column expressions, never interpolated
  SQL text — this fixes the reference's injection-prone f-strings
  (warehouse_tools.py:166-182) by construction;
- ``PendingQueryRegistry`` mirrors register → approve/execute → JSON records
  (or cancel): the plan is *declared* at registration and only *executed*
  (collected) on approval, exactly like the reference's deferred execution.

Scale notes: every tool is a filter + small broadcast-dim join + orderBy/limit
over a date-partitioned fact — Catalyst pushes the filters to the scan, and
``orderBy(...).limit(n)`` is executed as a distributed TakeOrdered (per-
partition top-n + driver merge), never a full sort.
"""

from __future__ import annotations

import itertools
import json
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# Pending-query human-in-the-loop workflow
# (reference warehouse_tools.py:70-137)
# --------------------------------------------------------------------------
@dataclass
class PendingQuery:
    query_id: str
    tool_name: str
    description: str
    df: DataFrame
    status: str = "pending"  # pending | executed | cancelled


@dataclass
class PendingQueryRegistry:
    _queries: dict[str, PendingQuery] = field(default_factory=dict)
    _ids: itertools.count = field(default_factory=itertools.count)

    def register(self, tool_name: str, description: str, df: DataFrame) -> PendingQuery:
        pq = PendingQuery(uuid.uuid4().hex[:12], tool_name, description, df)
        self._queries[pq.query_id] = pq
        return pq

    def get(self, query_id: str) -> PendingQuery | None:
        return self._queries.get(query_id)

    def cancel(self, query_id: str) -> bool:
        pq = self._queries.get(query_id)
        if pq is None or pq.status != "pending":
            return False
        pq.status = "cancelled"
        return True

    def execute(self, query_id: str) -> str:
        """Approve + run: collect the declared plan and serialize to JSON
        records (reference warehouse_tools.py:102-126 fetches into pandas →
        JSON)."""
        pq = self._queries.get(query_id)
        if pq is None:
            raise KeyError(f"no pending query {query_id!r}")
        if pq.status != "pending":
            raise ValueError(f"query {pq.query_id} already {pq.status}")
        rows = [json.loads(r) for r in pq.df.toJSON().collect()]
        pq.status = "executed"
        return json.dumps({"query_id": pq.query_id, "rows": rows}, default=str)


# --------------------------------------------------------------------------
# Name-match predicate shared by query_transactions / query_customer_by_name
# (reference warehouse_tools.py:168-180, 404-414: full name → first AND last,
# single token → first OR last, case-insensitive substring)
# --------------------------------------------------------------------------
def _name_predicate(customer_name: str):
    parts = customer_name.strip().split()
    if not parts:
        raise ValueError("customer_name must contain at least one token")
    def has(col: str, token: str):
        return F.contains(F.lower(F.trim(F.col(col))), F.lit(token.lower()))
    if len(parts) >= 2:
        return has("first_name", parts[0]) & has("last_name", " ".join(parts[1:]))
    return has("first_name", parts[0]) | has("last_name", parts[0])


class MarketQueryTools:
    """The six reference tools over a built market-DAG context.

    ``ctx`` is the dict produced by ``plans.market.registry.run(raw)`` —
    must contain the mart models. All six return lazy DataFrames; pair with
    :class:`PendingQueryRegistry` for the approval workflow.
    """

    def __init__(self, ctx: dict[str, DataFrame], pending: PendingQueryRegistry | None = None):
        self.ctx = ctx
        self.pending = pending or PendingQueryRegistry()

    # -- tool 1 (reference warehouse_tools.py:140-213) ----------------------
    def query_transactions(
        self,
        customer_id: str | None = None,
        customer_name: str | None = None,
        asset_symbol: str | None = None,
        transaction_type: str | None = None,
        limit: int = 10,
    ) -> DataFrame:
        cust_cols = self.ctx["dim_customer"].select(
            "hk_customer", "customer_bk", "first_name", "last_name",
            "customer_tier", "country",
        )
        asset_cols = self.ctx["dim_asset"].select("hk_asset", "asset_symbol", "asset_type")
        df = (
            self.ctx["fct_transactions"]
            .join(F.broadcast(cust_cols), "hk_customer")
            .join(F.broadcast(asset_cols), "hk_asset")
        )
        if customer_id:
            df = df.filter(F.col("customer_bk") == F.lit(customer_id))
        if customer_name:
            df = df.filter(_name_predicate(customer_name))
        if asset_symbol:
            df = df.filter(F.col("asset_symbol") == F.lit(asset_symbol))
        if transaction_type:
            df = df.filter(F.col("transaction_type") == F.lit(transaction_type.upper()))
        return (
            df.select(
                F.col("customer_bk").alias("customer_id"),
                "first_name", "last_name", "asset_symbol", "asset_type",
                "transaction_type", "transaction_amount", "fee_amount",
                "transaction_timestamp", "data_date", "customer_tier", "country",
            )
            .orderBy(F.desc("transaction_timestamp"))
            .limit(limit)
        )

    # -- tool 2 (reference warehouse_tools.py:216-266) ----------------------
    def query_asset_prices(
        self,
        asset_symbol: str | None = None,
        asset_type: str | None = None,
        days: int = 30,
        limit: int = 10,
        as_of=None,
    ) -> DataFrame:
        """``as_of`` pins CURRENT_DATE for determinism (tests); None = now."""
        anchor = F.lit(as_of).cast("timestamp") if as_of is not None else F.current_timestamp()
        df = self.ctx["fct_asset_prices"].filter(
            F.col("observed_at") >= F.timestamp_add("DAY", F.lit(-days), anchor)
        )
        if asset_symbol:
            df = df.filter(F.col("asset_symbol") == F.lit(asset_symbol))
        if asset_type:
            df = df.filter(F.col("asset_type") == F.lit(asset_type.upper()))
        return df.select(
            "asset_symbol", "asset_type", "observed_at", "price", "volume",
            "price_source", "asset_class", "price_date",
        ).orderBy(F.desc("observed_at")).limit(limit)

    # -- tool 3 (reference warehouse_tools.py:269-310) ----------------------
    VALID_GROUPS = ("asset_symbol", "customer_tier", "country", "transaction_type")

    def query_transaction_summary(self, group_by: str = "asset_symbol", limit: int = 20) -> DataFrame:
        if group_by not in self.VALID_GROUPS:
            raise ValueError(f"group_by must be one of {self.VALID_GROUPS}")
        cust_cols = self.ctx["dim_customer"].select("hk_customer", "customer_tier", "country")
        asset_cols = self.ctx["dim_asset"].select("hk_asset", "asset_symbol")
        df = (
            self.ctx["fct_transactions"]
            .join(F.broadcast(cust_cols), "hk_customer")
            .join(F.broadcast(asset_cols), "hk_asset")
        )
        return (
            df.groupBy(group_by)
            .agg(
                F.count(F.lit(1)).alias("transaction_count"),
                F.sum("transaction_amount").alias("total_amount"),
                F.avg("transaction_amount").alias("avg_amount"),
                F.sum("fee_amount").alias("total_fees"),
                F.countDistinct("hk_customer").alias("unique_customers"),
            )
            .orderBy(F.desc("total_amount"))
            .limit(limit)
        )

    # -- tool 4 (reference warehouse_tools.py:313-349) ----------------------
    def query_price_trends(self, asset_symbol: str, days: int = 30, as_of=None) -> DataFrame:
        """Price deltas via lag (W5). The reference's window is a global
        ORDER BY — implicitly single-asset; here it is partitioned by symbol
        so the plan never funnels through one partition (SURVEY §4)."""
        anchor = F.lit(as_of).cast("timestamp") if as_of is not None else F.current_timestamp()
        df = self.ctx["fct_asset_prices"].filter(
            (F.col("asset_symbol") == F.lit(asset_symbol))
            & (F.col("observed_at") >= F.timestamp_add("DAY", F.lit(-days), anchor))
        )
        w = W.partitionBy("asset_symbol").orderBy(F.asc("observed_at"))
        prev = F.lag(F.col("price").cast("double")).over(w)
        price_d = F.col("price").cast("double")
        return df.select(
            "asset_symbol", "price_date", "observed_at", "price", "volume", "price_source",
            prev.alias("previous_price"),
            (price_d - prev).alias("price_change"),
            ((price_d - prev) / F.nullif(prev, F.lit(0.0)) * 100).alias("price_change_pct"),
        ).orderBy(F.asc("observed_at"))

    # -- tool 5 (reference warehouse_tools.py:352-391) ----------------------
    def query_news_events(self, asset_symbol: str | None = None, limit: int = 20) -> DataFrame:
        df = self.ctx["fct_news_events"]
        if asset_symbol:
            df = df.filter(F.col("asset_symbol") == F.lit(asset_symbol))
        return (
            df.select("asset_symbol", "title", "news_date", "published_at")
            .orderBy(F.desc("published_at"))
            .limit(limit)
        )

    # -- tool 6 (reference warehouse_tools.py:394-438) ----------------------
    def query_customer_by_name(self, customer_name: str, limit: int = 10) -> DataFrame:
        dim = self.ctx["dim_customer"]
        return (
            dim.filter(_name_predicate(customer_name))
            .select(
                F.col("customer_bk").alias("customer_id"),
                "first_name", "last_name", "email", "country",
                "customer_tier", "risk_tolerance", "company_name",
            )
            .orderBy(F.asc("customer_id"))
            .limit(limit)
        )

    # -- pending-query wrappers --------------------------------------------
    #: the chatbot-facing dispatch surface — propose() resolves ONLY these
    TOOL_NAMES = frozenset(
        {
            "query_transactions",
            "query_asset_prices",
            "query_transaction_summary",
            "query_price_trends",
            "query_news_events",
            "query_customer_by_name",
        }
    )

    def propose(self, tool_name: str, /, **params) -> PendingQuery:
        """Build the tool's DataFrame and register it for approval instead of
        executing (reference's `_register_pending_query` + `_pending_response`).
        ``tool_name`` is validated against the allowlist — an unvalidated
        getattr would let the approval surface invoke arbitrary attributes."""
        if tool_name not in self.TOOL_NAMES:
            raise ValueError(
                f"unknown tool {tool_name!r}; available: {sorted(self.TOOL_NAMES)}"
            )
        fn = getattr(self, tool_name)
        df = fn(**params)
        desc = f"{tool_name}({', '.join(f'{k}={v!r}' for k, v in params.items())})"
        return self.pending.register(tool_name, desc, df)
