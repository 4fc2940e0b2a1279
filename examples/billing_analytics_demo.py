"""Runnable demo: the billing-warehouse query surface — TPC-H pricing
rollup, cohort retention, funnel conversion, OHLC resampling, and a
point-in-time SCD2 enrichment — through the same declared operators the
driver grades.

    python examples/billing_analytics_demo.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from billing_data_loader_spark.operators.aggregations import agg_q1_pricing
from billing_data_loader_spark.operators.billing_analytics import (
    agg_funnel_steps,
    agg_retention_cohort,
    ts_resample_ohlc,
)
from billing_data_loader_spark.operators.billing_history import (
    join_point_in_time,
)
from billing_data_loader_spark.operators.extras import ext_skyline_dominance
from billing_data_loader_spark.operators.profiling import (
    prof_gini_concentration,
)
from billing_data_loader_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark("analytics-demo")

    print("== TPC-H Q1 pricing rollup ==")
    agg_q1_pricing(spark, sf_dir).orderBy("l_returnflag", "l_linestatus").show()

    print("== funnel conversion ==")
    agg_funnel_steps(spark, sf_dir).orderBy("step").show()

    print("== retention (first week of cohort day 1) ==")
    (
        agg_retention_cohort(spark, sf_dir)
        .filter(F.col("day_n") <= 6)
        .orderBy("cohort_day", "day_n")
        .limit(7)
        .show()
    )

    print("== hourly OHLC (first rows) ==")
    ts_resample_ohlc(spark, sf_dir).orderBy("bucket", "event_type").limit(5).show()

    print("== point-in-time status enrichment (sample) ==")
    join_point_in_time(spark, sf_dir).orderBy("o_orderkey").limit(5).show()

    print("== revenue concentration per segment (Gini + top decile) ==")
    (
        prof_gini_concentration(spark, sf_dir)
        .select(
            "segment",
            "n_customers",
            F.round("gini", 4).alias("gini"),
            F.round("top_decile_share", 4).alias("top_decile_share"),
        )
        .orderBy("segment")
        .show()
    )

    print("== skyline accounts (spend/balance Pareto frontier, sample) ==")
    (
        ext_skyline_dominance(spark, sf_dir)
        .orderBy("nation", F.desc("spend_cents"))
        .limit(8)
        .show()
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
