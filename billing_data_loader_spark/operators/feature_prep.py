"""Tabular feature-preparation operators (round 13): equal-frequency
binning and smoothed target encoding — the two discretization/encoding
passes a GBDT or linear-model training pipeline runs over warehouse
tables before export, expressed with the house exactness discipline
(integer order statistics, exact-integer rational arithmetic, one IEEE
division at the declared surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.determinism import quantize_long
from ..plans.registry import query
from ..tables import load

# --- ext_quantile_bin_features --------------------------------------------------

_QBIN_N = 10

_QBIN_ORACLE = f"""
WITH s AS (
  SELECT c_custkey,
         CAST(floor(CAST(c_acctbal AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
           AS cents
  FROM customer
),
rk AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents ASC, c_custkey ASC) AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM s
),
b AS (
  SELECT cents, n,
         CAST(({_QBIN_N} * (rn - 1)) // n AS BIGINT) AS bin
  FROM rk
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(cents) AS BIGINT) AS lo_cents,
       CAST(MAX(cents) AS BIGINT) AS hi_cents,
       CAST(COUNT(*) AS DOUBLE) / CAST(any_value(n) AS DOUBLE)
         AS bin_frac
FROM b GROUP BY bin
"""


@query("ext_quantile_bin_features", oracle=_QBIN_ORACLE, tier=3)
def ext_quantile_bin_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency discretization of customer balances into
    10 bins — the quantile-binning featurization step (GBDT
    histogram pre-binning, WoE/monotonic-model inputs, drift-monitor
    bucket definitions all start here): bin id = floor(10*(rank-1)/n)
    on the (value, key)-ordered rank, so bins differ by at most one row
    and every assignment is an integer decision. Emits per-bin count,
    exact [lo, hi] cent edges, and the occupancy fraction.

    Exactness: balances floor-quantize to cents; ranks use the total
    (cents, custkey) order; bin membership is exact integer floor
    division; the fraction is one IEEE division of exact integers.

    Shape: one scan -> a global rank window over the value support (the
    ext_auc_rank stance: at 100 TB the swap is the two-pass bucketed
    rank — range-partition by value, per-partition ranks + broadcast
    offsets — documented, not needed at fixture scale; EXPECTED_FLAGS)
    -> one 10-group aggregate with map-side combine."""
    s = load(spark, sf_dir, "customer").select(
        "c_custkey", quantize_long("c_acctbal", 2).alias("cents")
    )
    rk = s.select(
        "cents",
        F.row_number()
        .over(W.orderBy(F.asc("cents"), F.asc("c_custkey")))
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    b = rk.select(
        "cents",
        "n",
        F.expr(f"CAST(({_QBIN_N} * (rn - 1)) DIV n AS BIGINT)").alias("bin"),
    )
    return b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
        (
            F.count(F.lit(1)).cast("double")
            / F.any_value(F.col("n")).cast("double")
        ).alias("bin_frac"),
    )


# --- ext_target_encode ----------------------------------------------------------

#: Smoothing pseudo-count: the encoding shrinks toward the global mean
#: by m virtual rows (the standard empirical-Bayes target encoder).
_TENC_M = 10

_TENC_ORACLE = f"""
WITH spend AS (
  SELECT o_custkey AS cust,
         CAST(SUM(CAST(floor(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
cust AS (
  SELECT c.c_custkey, c.c_mktsegment AS segment,
         COALESCE(s.cents, 0) AS cents
  FROM customer c LEFT JOIN spend s ON c.c_custkey = s.cust
),
g AS (
  SELECT CAST(SUM(cents) AS BIGINT) AS gs,
         CAST(COUNT(*) AS BIGINT) AS gn
  FROM cust
),
seg AS (
  SELECT segment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS cat_sum
  FROM cust GROUP BY segment
)
SELECT seg.segment, seg.n, seg.cat_sum,
       CAST(seg.cat_sum AS DOUBLE) / CAST(seg.n AS DOUBLE)
         AS raw_mean_cents,
       CAST(seg.cat_sum * g.gn + {_TENC_M} * g.gs AS DOUBLE)
         / (CAST(seg.n + {_TENC_M} AS DOUBLE) * CAST(g.gn AS DOUBLE))
         AS encoded_cents,
       CAST(g.gs AS DOUBLE) / CAST(g.gn AS DOUBLE) AS global_mean_cents
FROM seg CROSS JOIN g
"""


@query("ext_target_encode", oracle=_TENC_ORACLE, tier=3)
def ext_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding of the market segment against lifetime
    customer spend — the empirical-Bayes categorical encoder (enc =
    (sum + m*global_mean) / (n + m), m = 10) every tabular-ML
    export pipeline applies to high-cardinality categoricals before
    training; rare categories shrink toward the global mean instead of
    memorizing noise. Customers with no orders enter at exactly 0 so
    the encoding reflects the full population, not just purchasers.

    Exactness: spend floor-quantizes to cents at the order grain and
    sums exactly; the smoothed encoding clears its inner division —
    (cat_sum + m*gs/gn) / (n+m) == (cat_sum*gn + m*gs) /
    ((n+m)*gn) — so it is ONE IEEE division of exact int64 products
    (cat_sum*gn stays far inside int64 at fixture and production
    scales; DECIMAL(38,0) widening documented past ~10^14 cents).

    Shape: one custkey spend aggregate (map-side combine), a
    custkey-keyed left join onto the customer dim (co-partitioned),
    one O(segments) aggregate, and the 1-row global fold broadcast
    back (EXPECTED_FLAGS)."""
    spend = (
        load(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("cust"),
            quantize_long("o_totalprice", 2).alias("cents"),
        )
        .groupBy("cust")
        .agg(F.sum("cents").alias("cents"))
    )
    cust = (
        load(spark, sf_dir, "customer")
        .select("c_custkey", F.col("c_mktsegment").alias("segment"))
        .join(spend, F.col("c_custkey") == F.col("cust"), "left")
        .select(
            "segment", F.coalesce(F.col("cents"), F.lit(0)).alias("cents")
        )
    )
    from ..session import scoped_persist

    cust = scoped_persist(cust)
    g = cust.agg(
        F.sum("cents").alias("gs"), F.count(F.lit(1)).alias("gn")
    )
    seg = cust.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cat_sum")
    )
    return seg.crossJoin(F.broadcast(g)).select(
        "segment",
        "n",
        "cat_sum",
        (F.col("cat_sum").cast("double") / F.col("n").cast("double")).alias(
            "raw_mean_cents"
        ),
        (
            (F.col("cat_sum") * F.col("gn") + _TENC_M * F.col("gs")).cast(
                "double"
            )
            / (
                (F.col("n") + _TENC_M).cast("double")
                * F.col("gn").cast("double")
            )
        ).alias("encoded_cents"),
        (F.col("gs").cast("double") / F.col("gn").cast("double")).alias(
            "global_mean_cents"
        ),
    )
