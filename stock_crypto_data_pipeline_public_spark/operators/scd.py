"""Slowly-changing-dimension / dedup window operators (W1-W3 generalized).

Reusable builders for the patterns every reference hub/link/sat/dim uses:

- dedup_keep_first — hub/link dedup (reference hub_customer.sql:16-32)
- latest_wins     — current-state dims (reference dim_asset.sql:36-39)
- scd2            — effective-dated history (reference
  dim_customer_history.sql:28-31,70-73)
- changes_only    — satellite hashdiff change detection (reference
  sat_customer_profile.sql:8-13)

All windows are partitioned by the business key — never a global sort — and
take an explicit deterministic tiebreaker (SURVEY.md §7 flags the reference's
tie-prone ordering as a correctness hazard).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

HIGH_DATE = "9999-12-31 00:00:00"


def _cols(cs: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cs]


def dedup_keep_first(df: DataFrame, keys: Sequence[str], order: Sequence[Column]) -> DataFrame:
    """One row per key: the first by ``order`` (pass explicit asc/desc cols,
    ending with a unique tiebreaker)."""
    w = W.partitionBy(*keys).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def latest_wins(df: DataFrame, keys: Sequence[str], ts_col: str, tiebreak: str) -> DataFrame:
    """One row per key: the most recent version."""
    return dedup_keep_first(df, keys, [F.desc(ts_col), F.desc(tiebreak)])


def scd2(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreak: str,
) -> DataFrame:
    """Effective-dated history: adds effective_from / effective_to /
    is_current. effective_to = next version's start, HIGH_DATE when open."""
    w = W.partitionBy(*keys).orderBy(F.asc(ts_col), F.asc(tiebreak))
    nxt = F.lead(ts_col).over(w)
    return (
        df.withColumn("effective_from", F.col(ts_col))
        .withColumn(
            "effective_to", F.coalesce(nxt, F.lit(HIGH_DATE).cast("timestamp"))
        )
        .withColumn("is_current", F.when(nxt.isNull(), F.lit(True)).otherwise(F.lit(False)))
    )


def changes_only(
    df: DataFrame,
    keys: Sequence[str],
    hashdiff: Column,
    ts_col: str,
    tiebreak: str,
) -> DataFrame:
    """Satellite semantics: keep only rows whose hashdiff differs from the
    previous version (insert-only change capture)."""
    w = W.partitionBy(*keys).orderBy(F.asc(ts_col), F.asc(tiebreak))
    prev = F.lag(hashdiff).over(w)
    return (
        df.withColumn("__hd", hashdiff)
        .withColumn("__prev", prev)
        .filter(F.col("__prev").isNull() | (F.col("__hd") != F.col("__prev")))
        .drop("__hd", "__prev")
    )
