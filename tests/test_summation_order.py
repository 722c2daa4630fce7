"""Summation-order stress for the decimal-exact money-aggregation policy.

r6 driver red rows q26/q28 were caused by float sums whose value depends on
summation order (partial-aggregation grouping differs across partitionings
and environments), flipping the half-up rounding boundary. The fix
(functions/numeric.py: MONEY/RATE decimal casts before sum) makes the
aggregate order-independent — which this suite proves mechanically: each
money query must produce BIT-IDENTICAL rows under the default partitioning
and under a deliberately hostile one (tiny scan splits + prime shuffle
partition count + AQE off), i.e. with completely different partial-sum
orders. A raw ``F.sum(double)`` over 2-dp money values fails this test with
probability growing in SF; the decimal path cannot.
"""

from __future__ import annotations

import pytest

#: every gated query whose output contains a money/value aggregate
#: (sum or sum-derived average) over the 2-dp-grid double columns
MONEY_QUERIES = [
    "q01_pricing_summary",
    "q02_top_revenue_orders",
    "q03_region_nation_rollup",
    "q04_customer_order_left",
    "q17_incremental_hwm",
    "q21_priority_rollup",
    "q22_status_year_cube",
    "q26_sql_api_nation_revenue",
    "q27_status_grouping_sets",
    "q28_orders_above_customer_avg",
    "q29_rolling_30d_customer_spend",
    "q30_native_pivot_status_totals",
    "v06_semantic_customer_overview",
    "v07_merge_last_wins",
    "e02_daily_type_rollup",
    "e04_hourly_profile",
    "e06_bangkok_wall_clock",
    "e07_asof_prior_activity",
    "e08_purchase_attribution_window",
    "f02_daily_vwap",
    "f03_bollinger_breakouts",
    "f05_daily_corr_pairs",
    "f15_rolling_beta",
    "q34_bloom_semi_urgent_lineitems",
    "q35_salted_status_totals",
    "q36_salted_join_priority_rollup",
    # streaming end states: the value sums ride the same decimal policy
    # (s01 in the read-back agg, s02 inside the windowed streaming agg)
    "s01_streaming_ingest_end_state",
    "s02_streaming_watermark_end_state",
    # write-path exactness gates: money sums through bucketed tables and
    # through the compaction rewrite
    "q38_cobucketed_join_rollup",
    "q39_compaction_roundtrip",
    # SCD2 quality battery: pure counts over windows — must be invariant
    # to partitioning like every other gated integer output
    "q43_scd2_quality_checks",
]

#: conf overrides that maximally perturb partial-aggregation order: every
#: parquet file splits into many tiny scan partitions, the shuffle fans out
#: to a prime count, and AQE cannot coalesce any of it back
_HOSTILE = {
    "spark.sql.files.maxPartitionBytes": "16384",
    "spark.sql.files.openCostInBytes": "0",
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.adaptive.enabled": "false",
}


def _rows(df):
    """Collected rows as a canonically-sorted list of tuples (exact values,
    no rounding — the whole point is bit-identity)."""
    rows = [tuple(r) for r in df.collect()]
    return sorted(rows, key=lambda t: tuple((v is None, str(v)) for v in t))


@pytest.fixture(scope="module")
def registry_queries():
    from stock_crypto_data_pipeline_public_spark.plans import registry

    registry.load_all()
    return registry.QUERIES


@pytest.mark.parametrize("name", MONEY_QUERIES)
def test_money_query_bit_stable_under_repartitioning(
    spark, sf_dir, name, registry_queries
):
    q = registry_queries[name]
    base = _rows(q(spark, sf_dir))
    saved = {k: spark.conf.get(k, None) for k in _HOSTILE}
    try:
        for k, v in _HOSTILE.items():
            spark.conf.set(k, v)
        hostile = _rows(q(spark, sf_dir))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert base == hostile, (
        f"{name}: output changed under hostile partitioning — a float "
        "aggregate is summation-order-dependent (see functions/numeric.py)"
    )
