"""Round-3 semantic/plan tests: bucketed-join shuffle elimination, the
distributed global-window decompositions, and gap-fill invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from billing_data_loader_spark.operators.joins import join_bucketed
from billing_data_loader_spark.operators.timeseries import ts_gapfill
from billing_data_loader_spark.operators.windows import (
    win_moving_avg_range,
    win_ntile_pctrank,
)

from .conftest import SF_DIR


def test_bucketed_join_has_no_exchange_below_join(spark):
    """Both inputs are bucketed on the join key, so the SortMergeJoin must
    read buckets directly: no Exchange (shuffle) below the join. The final
    aggregate above the join may shuffle; we check the join's subtree by
    asserting the full plan has exactly the ONE exchange the groupBy needs.
    """
    df = join_bucketed(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles <= 1, f"expected <=1 shuffle (final agg), got:\n{plan}"
    assert "SortMergeJoin" in plan
    join_subtree = plan[plan.index("SortMergeJoin"):]
    # both sides must come straight off the bucketed scans (no exchange
    # between the join and either FileScan; Sort is expected — Spark only
    # trusts bucket sort order behind a legacy flag since 3.0)
    assert join_subtree.count("Bucketed: true") == 2
    assert "Exchange" not in join_subtree


def test_moving_avg_range_no_global_window(spark):
    """The decomposed RANGE frame must not contain an empty-partition-spec
    window (the single-partition shape WindowExec warns about)."""
    df = win_moving_avg_range(spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition(" in line.lower():
            # partition columns come before the sort spec; an empty spec
            # renders as windowspecdefinition(<sort> ..., specifiedwindowframe
            assert "windowspecdefinition(b" in line.lower().replace(
                " ", ""
            ) or "partitionby" not in line.lower(), line


def test_ntile_matches_builtin_on_small_frame(spark):
    """Closed-form quartiles == Spark's own ntile/percent_rank/cume_dist."""
    from pyspark.sql import Window as W

    df = win_ntile_pctrank(spark, SF_DIR)
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    w = W.orderBy("c_acctbal", "c_custkey")
    ref = c.select(
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
    diff = df.exceptAll(ref).count() + ref.exceptAll(df).count()
    assert diff == 0


def test_gapfill_invariants(spark):
    out = ts_gapfill(spark, SF_DIR).cache()
    try:
        n = out.count()
        assert n > 0
        # dense grid: per user, rows == days from first day to global end
        bounds = out.agg(F.max("day").alias("g_end")).first()
        per_user = out.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("day").alias("first_day"),
        )
        bad = per_user.filter(
            F.col("n_rows")
            != F.datediff(F.lit(bounds.g_end), F.col("first_day")) + 1
        ).count()
        assert bad == 0
        # forward fill never leaves a hole (first grid day is a real reading)
        assert out.filter(F.col("val_ff").isNull()).count() == 0
        # filled days are flagged, real readings are not
        assert out.filter(F.col("is_gap") == 1).count() > 0
        assert out.filter(F.col("is_gap") == 0).count() > 0
    finally:
        out.unpersist()
