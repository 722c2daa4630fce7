"""The plan-health audit (scripts/explain_audit.py) as a suite gate: no
row-at-a-time Python UDF, no CartesianProduct, no unexpected nested-loop
join anywhere in the registry — enforced by CI, not by memory."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def test_all_plans_healthy(spark, sf_dir):
    from explain_audit import audit

    # AQE off for the audit only: AdaptiveSparkPlan hides join strategies
    # and codegen subtrees in the static plan (runtime conf — restorable)
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # codegen subtree counts are informational; the hard rules read the
        # formatted plan only — skipping the second explain halves the cost
        hard_fails = audit(spark, sf_dir, with_codegen=False)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert hard_fails == []
