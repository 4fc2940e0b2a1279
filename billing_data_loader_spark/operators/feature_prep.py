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


# --- ext_woe_iv -----------------------------------------------------------------

#: ln values quantize at the 1e6 grid (the ext_log_loss stance:
#: empirically ulp-consistent across both engines' libm) so every
#: cross-row IV sum is exact BIGINT.
_WOE_Q = "1e6"

#: Churn-style target: a customer is POSITIVE when their last order
#: month sits within 12 months of the corpus horizon (month index
#: year*12 + month - 1, the win_yoy_growth convention).
_WOE_TARGET_SQL = """
  SELECT o_custkey AS ck,
         MAX(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1) AS last_mi
  FROM orders GROUP BY o_custkey
"""

_WOE_ORACLE = f"""
WITH lastm AS ({_WOE_TARGET_SQL}),
hor AS (SELECT MAX(last_mi) AS h FROM lastm),
y AS (
  SELECT c.c_custkey, c.c_mktsegment, c.c_nationkey,
         CASE WHEN l.last_mi IS NULL THEN 0
              WHEN l.last_mi >= hor.h - 11 THEN 1 ELSE 0 END AS y
  FROM customer c LEFT JOIN lastm l ON c.c_custkey = l.ck
  CROSS JOIN hor
),
stacked AS (
  SELECT 'mktsegment' AS feature, c_mktsegment AS category, y FROM y
  UNION ALL
  SELECT 'nation' AS feature, CAST(c_nationkey AS VARCHAR) AS category, y
  FROM y
),
g AS (
  SELECT feature, category,
         CAST(SUM(y) AS BIGINT) AS pos,
         CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
  FROM stacked GROUP BY feature, category
),
tot AS (
  SELECT feature, category, pos, neg,
         CAST(SUM(pos) OVER (PARTITION BY feature) AS BIGINT) AS p_tot,
         CAST(SUM(neg) OVER (PARTITION BY feature) AS BIGINT) AS n_tot,
         CAST(COUNT(*) OVER (PARTITION BY feature) AS BIGINT) AS n_cat
  FROM g
),
w AS (
  SELECT feature, category, pos, neg, p_tot, n_tot, n_cat,
         CAST(floor(ln(CAST((pos + 1) * (n_tot + n_cat) AS DOUBLE)
                       / CAST((neg + 1) * (p_tot + n_cat) AS DOUBLE))
                    * {_WOE_Q} + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS woe_q,
         (pos + 1) * (n_tot + n_cat) - (neg + 1) * (p_tot + n_cat)
           AS share_num
  FROM tot
)
SELECT feature, category, pos, neg,
       CAST(woe_q AS DOUBLE) / {_WOE_Q} AS woe,
       CAST(SUM(share_num * woe_q) OVER (PARTITION BY feature)
              AS DOUBLE)
         / (CAST((p_tot + n_cat) * (n_tot + n_cat) AS DOUBLE)
            * {_WOE_Q}) AS feature_iv
FROM w
"""


@query("ext_woe_iv", oracle=_WOE_ORACLE, tier=3)
def ext_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence encoding + information value per categorical
    feature against a churn-style target (customer ordered within 12
    months of the corpus horizon) — the credit-scoring/feature-screen
    standard beside ext_target_encode's mean encoding: WOE gives each
    category a log-odds-scaled score a monotone model consumes
    directly, and the feature-level IV ranks features BEFORE any model
    is trained (<0.02 useless, >0.3 strong — the screening thresholds).
    Laplace-smoothed so empty cells never hit ln(0).

    Exactness: the WOE argument is one exact-integer ratio
    ((pos+1)(N+C)) / ((neg+1)(P+C)) evaluated as a single IEEE
    division; ln quantizes to the 1e6 grid (the ext_log_loss stance)
    so each category's woe_q is BIGINT; the IV cross-row sum runs on
    exact integers (share numerators x woe_q — documented DECIMAL
    widening past ~10^9 customers) and divides ONCE by the cleared
    denominator. The target derives from exact month indexes
    (year*12+month-1) with the left-join output null-guarded (the r11
    LEAST/GREATEST lesson).

    Shape: one orders aggregate (cust-keyed), a 1-row horizon fold
    broadcast back (EXPECTED_FLAGS), a cust-keyed join onto customer,
    then a MAP-SIDE 2-feature stack into ONE (feature, category)
    aggregate — category-arity output (<= 30 rows) with O(categories)
    window folds after. At 100 TB the only data-sized exchanges are
    the two cust-keyed ones."""
    lastm = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.max(
                F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
            ).alias("last_mi")
        )
    )
    hor = lastm.agg(F.max("last_mi").alias("h"))
    y = (
        load(spark, sf_dir, "customer")
        .join(lastm, F.col("c_custkey") == F.col("ck"), "left")
        .crossJoin(F.broadcast(hor))
        .select(
            "c_mktsegment",
            "c_nationkey",
            F.when(F.col("last_mi").isNull(), F.lit(0))
            .when(F.col("last_mi") >= F.col("h") - 11, F.lit(1))
            .otherwise(F.lit(0))
            .alias("y"),
        )
    )
    stacked = y.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("mktsegment").alias("feature"),
                    F.col("c_mktsegment").alias("category"),
                ),
                F.struct(
                    F.lit("nation").alias("feature"),
                    F.col("c_nationkey").cast("string").alias("category"),
                ),
            )
        ).alias("e"),
        "y",
    ).select("e.feature", "e.category", "y")
    g = stacked.groupBy("feature", "category").agg(
        F.sum("y").cast("long").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("neg"),
    )
    wf = W.partitionBy("feature")
    tot = g.select(
        "feature",
        "category",
        "pos",
        "neg",
        F.sum("pos").over(wf).cast("long").alias("p_tot"),
        F.sum("neg").over(wf).cast("long").alias("n_tot"),
        F.count(F.lit(1)).over(wf).cast("long").alias("n_cat"),
    )
    w = tot.select(
        "feature",
        "category",
        "pos",
        "neg",
        "p_tot",
        "n_tot",
        "n_cat",
        F.expr(
            f"CAST(floor(ln(CAST((pos + 1) * (n_tot + n_cat) AS DOUBLE)"
            f" / CAST((neg + 1) * (p_tot + n_cat) AS DOUBLE))"
            f" * {_WOE_Q} + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("woe_q"),
        F.expr(
            "(pos + 1) * (n_tot + n_cat) - (neg + 1) * (p_tot + n_cat)"
        ).alias("share_num"),
    )
    return w.select(
        "feature",
        "category",
        "pos",
        "neg",
        F.expr(f"CAST(woe_q AS DOUBLE) / {_WOE_Q}").alias("woe"),
        (
            F.sum(F.col("share_num") * F.col("woe_q"))
            .over(wf)
            .cast("double")
            / (
                ((F.col("p_tot") + F.col("n_cat"))
                 * (F.col("n_tot") + F.col("n_cat"))).cast("double")
                * F.lit(1e6)
            )
        ).alias("feature_iv"),
    )


# --- ext_feature_hash_cross -----------------------------------------------------

#: Hashed cross-feature buckets (the hashing-trick dimensionality for
#: the mktsegment x nation cross: 125 true crosses into 64 buckets, so
#: collisions are expected and the audit quantifies them).
_FHASH_B = 64

_FHASH_ORACLE = f"""
WITH crossed AS (
  SELECT c_custkey,
         c_mktsegment || '#' || CAST(c_nationkey AS VARCHAR) AS cross_cat
  FROM customer
),
hashed AS (
  SELECT c_custkey, cross_cat,
         ('0x' || substr(md5(cross_cat || '#fh'), 1, 15))::BIGINT
           % {_FHASH_B} AS bucket
  FROM crossed
),
g AS (
  SELECT bucket,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(COUNT(DISTINCT cross_cat) AS BIGINT) AS n_crosses,
         MIN(cross_cat) AS example_cross
  FROM hashed GROUP BY bucket
)
SELECT CAST(bucket AS BIGINT) AS bucket, n_customers, n_crosses,
       example_cross,
       (n_crosses > 1) AS has_collision,
       CAST(n_customers AS DOUBLE)
         / CAST(SUM(n_customers) OVER () AS DOUBLE) AS load_frac
FROM g
"""


@query("ext_feature_hash_cross", oracle=_FHASH_ORACLE, tier=3)
def ext_feature_hash_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick for crossed categoricals (mktsegment x nation
    -> 64 buckets) WITH its collision audit — the featurization that
    keeps cross-feature dimensionality fixed at any cardinality (no
    vocabulary to build, no OOV at serving), and the table that tells
    the feature owner what the trick cost: buckets carrying >1 true
    cross blend their statistics (the regularization-vs-noise
    trade-off), so the audit emits per-bucket occupancy, distinct-cross
    count, and the collision flag.

    Exactness: the bucket is the shared md5 60-bit prefix mod 64
    (identical in both engines — the ext_shard_rendezvous recipe);
    counts exact; the load fraction is one IEEE division.

    Shape: map-side hash -> ONE bucket-keyed aggregate whose output is
    bounded by the bucket count (64 rows at any corpus scale) -> an
    O(buckets) window fold. At 100 TB this is one shuffle of
    pre-aggregated partials."""
    c = load(spark, sf_dir, "customer").select(
        F.concat(
            F.col("c_mktsegment"),
            F.lit("#"),
            F.col("c_nationkey").cast("string"),
        ).alias("cross_cat")
    )
    hashed = c.select(
        "cross_cat",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("cross_cat"), F.lit("#fh"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % _FHASH_B
        ).alias("bucket"),
    )
    g = hashed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("cross_cat").alias("n_crosses"),
        F.min("cross_cat").alias("example_cross"),
    )
    return g.select(
        "bucket",
        "n_customers",
        "n_crosses",
        "example_cross",
        (F.col("n_crosses") > 1).alias("has_collision"),
        (
            F.col("n_customers").cast("double")
            / F.sum("n_customers").over(W.partitionBy()).cast("double")
        ).alias("load_frac"),
    )
