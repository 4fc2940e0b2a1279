"""CI gate: the physical-plan anti-pattern sweep must stay clean.

VERDICT r3 asked for the plan sweep (``tools/plan_audit.py``) to be wired
into pytest so a plan regression — a new unexplained Exchange
SinglePartition, BroadcastNestedLoopJoin, CartesianProduct, or
row-at-a-time BatchEvalPython node — fails CI instead of waiting for the
next manual PLANS.md refresh.  Every flag must either be absent or carry a
justification in ``tools/plan_audit.py:EXPECTED_FLAGS`` (mirrored in the
operator's docstring).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.conftest import SF_DIR  # noqa: E402
from tools.plan_audit import sweep_unexplained  # noqa: E402


def test_no_unexplained_plan_flags(spark):
    bad = sweep_unexplained(spark, SF_DIR)
    assert not bad, (
        "plan regression — unexplained anti-pattern flags (justify in "
        f"tools/plan_audit.py:EXPECTED_FLAGS or fix the plan): {bad}"
    )


def test_gate_catches_elided_single_partition_window(spark):
    """VERDICT r11 #6: a global window over a 1-partition input satisfies
    AllTuples, so EnsureRequirements elides the Exchange SinglePartition
    node the old sweep keyed on — the gate must flag the Window node
    itself. This reconstructs the exact invisible form (filter on
    row_number over an unpartitioned window, 1-partition child)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from tools.plan_audit import _sweep_flags

    df = (
        spark.range(100)
        .repartition(1)
        .withColumn("r", F.row_number().over(Window.orderBy("id")))
        .filter(F.col("r") <= 10)
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    flags = _sweep_flags(plan)
    assert "global_window" in flags, plan[:2000]

    # and a properly partitioned window must NOT flag
    ok = spark.range(100).withColumn(
        "r",
        F.row_number().over(Window.partitionBy(F.col("id") % 5).orderBy("id")),
    )
    ok.collect()
    ok_plan = ok._jdf.queryExecution().executedPlan().toString()
    assert "global_window" not in _sweep_flags(ok_plan), ok_plan[:2000]


def test_scan_dpp_plants_dynamic_pruning(spark):
    """scan_dpp's fact scan must carry a DynamicPruningExpression in its
    PartitionFilters (VERDICT r9 gap #3) — the dim-side filter reaches the
    partitioned scan at runtime, not as a static literal."""
    from billing_data_loader_spark.sources.connectors import scan_dpp

    df = scan_dpp(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString().lower()
    assert "dynamicpruningexpression" in plan, plan[:2000]
    # and it must sit on the orders fact scan, not the dim scan
    fact_scan = next(
        ln for ln in plan.splitlines()
        if "filescan" in ln and "orders_by_year" in ln
    )
    assert "dynamicpruning" in fact_scan
