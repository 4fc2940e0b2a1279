"""Reshape operators (SURVEY.md §2 extension, round 2): pivot (long->wide
conditional aggregation) and unpivot (wide->long melt).

Both are loader-surface staples: billing exports arrive long (one row per
measure) and report tables want them wide, and vice versa. Spark-first:
``DataFrame.pivot`` with an explicit value list (no extra distinct-scan job
to discover pivot values, and a plan that is a plain hash aggregate), and
``DataFrame.unpivot`` (Spark's native melt — one Expand node, no UNION of
re-scans).

Scale: pivot with an explicit value list is exactly one shuffle on the
group key with map-side partial aggregation — same shape as any groupBy.
Unpivot's Expand multiplies rows map-side (k output rows per input row)
and shuffles nothing by itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import load

# --- agg_pivot --------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT c_mktsegment,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@query("agg_pivot", oracle=_PIVOT_ORACLE, tier=2)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long->wide: order counts per (segment x status), statuses as columns.

    The pivot value list is explicit, so Spark skips the extra
    values-discovery job and compiles straight to one conditional hash
    aggregate — the plan a hand-written CASE-WHEN rollup would get."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    wide = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    # absent (segment, status) combos pivot to NULL; report 0 like the
    # oracle's FILTERed counts
    return wide.select(
        "c_mktsegment",
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("n_p"),
    )


# --- fn_unpivot -------------------------------------------------------------

_UNPIVOT_ORACLE = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
FROM lineitem
"""


@query("fn_unpivot", oracle=_UNPIVOT_ORACLE, tier=2)
def fn_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long melt of three measure columns via native unpivot.

    One Expand node (3 output rows per input row, produced map-side in a
    single scan) — the oracle's triple-UNION states the same result but
    would re-scan the table three times if executed literally."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount",
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "value",
    )
