"""Aggregation operators (SURVEY.md §2.4).

Flagship ``agg_q1_pricing`` is the computational essence of the reference's
billing rollup (charges per SKU/day -> here revenue per flag/status): scan ->
filter -> multi-key hash aggregate over arithmetic expressions.

Scale notes: every query here is a single hash-aggregate over the fact table.
Catalyst plans partial (map-side) aggregation before the shuffle, so network
volume is O(groups x partitions), not O(rows) — the shape that survives a
1000-executor, 100 TB scan. Filters sit directly on the scan (parquet
predicate pushdown + column pruning verified via .explain in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.determinism import davg, dsum, o_davg, o_dsum
from ..plans.registry import query
from ..tables import load

_Q1_CUTOFF = "1998-09-02"

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {o_dsum("l_quantity", "sum_qty")},
  {o_dsum("l_extendedprice", "sum_base_price")},
  {o_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
  {o_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
  {o_davg("l_quantity", "avg_qty")},
  {o_davg("l_extendedprice", "avg_price")},
  {o_davg("l_discount", "avg_disc")},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


@query("agg_q1_pricing", oracle=_Q1_ORACLE, tier=1)
def agg_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filtered multi-key group-by with 8 aggregates."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
