"""Data-profiling operators (SURVEY.md §2.11 round-4 additions): the
summary queries a warehouse runs before trusting a new drop — modal values,
fixed-width histograms, and per-column stats. All three are single-pass
scan+aggregate shapes whose outputs are O(buckets)/O(columns) rows at any
corpus scale; the fact table shuffles once (or not at all for the global
profiles) and every float reduction is decimal-quantized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.determinism import MICRO, dsum, o_dsum, quantize_long
from ..plans.registry import query
from ..tables import load

# --- prof_mode_segment ------------------------------------------------------

_MODE_ORACLE = """
SELECT c_mktsegment, c_nationkey AS mode_nation, cnt
FROM (
  SELECT c_mktsegment, c_nationkey, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY COUNT(*) DESC, c_nationkey ASC) AS rn
  FROM customer GROUP BY c_mktsegment, c_nationkey
)
WHERE rn = 1
"""


@query("prof_mode_segment", oracle=_MODE_ORACLE, tier=1)
def prof_mode_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal nation per market segment — the MODE() profile with a
    deterministic tie-break (highest count, then lowest nation key).
    One shuffle to the (segment, nation) counts; the row_number window
    then runs on that aggregated frame, whose size is O(segments x
    nations) — the window never sees fact-table rows, so partition skew
    on a hot segment cannot form."""
    c = load(spark, sf_dir, "customer")
    counts = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("cnt").desc(), F.col("c_nationkey").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("c_nationkey").alias("mode_nation"),
            "cnt",
        )
    )


# --- prof_histogram_price ---------------------------------------------------

# 25k-wide buckets over o_totalprice (fixture range ~[1e3, 5e5] => ~20
# buckets). bucket = floor(price / 25000): price is a 2-decimal double
# and 25000 is a power-of-two-free exact constant, but the division is
# the SAME double op in both engines, so the floor binds identically.
_HIST_ORACLE = f"""
SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
       CAST(floor(o_totalprice / 25000) AS BIGINT) * 25000 AS bucket_lo,
       COUNT(*) AS n_orders,
       {o_dsum("o_totalprice", "bucket_total")}
FROM orders
GROUP BY bucket
"""


@query("prof_histogram_price", oracle=_HIST_ORACLE, tier=1)
def prof_histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value: one map-side-combined
    aggregate keyed on the bucket index — the reduced frame is O(range /
    width) rows regardless of order count, so the profile costs one scan
    and a near-empty shuffle at any scale. Emits bucket bounds so the
    result is self-describing."""
    o = load(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 25000)
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "bucket_total"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 25000).alias("bucket_lo"),
            "n_orders",
            "bucket_total",
        )
    )


# --- prof_column_stats ------------------------------------------------------

_STAT_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")

_STATS_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       MIN({c}) AS min_val,
       MAX({c}) AS max_val,
       {o_dsum(c, "sum_val")}
FROM lineitem"""
    for c in _STAT_COLS
)


@query("prof_column_stats", oracle=_STATS_ORACLE, tier=1)
def prof_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile (nulls, distincts, min/max, exact sum) for the
    lineitem measure columns, one row per column.

    Shape: each column first collapses to its DISTINCT VALUES with counts
    (groupBy(c) — map-side combined, so the shuffle carries distinct
    values per partition, not rows), then a 1-row aggregate derives every
    stat from that value-histogram: n_rows = sum(n), n_null = n of the
    null group, n_distinct = non-null group count, exact sum =
    sum(quantized_value * n) (integer x integer stays exact in decimal,
    matching the oracle's per-row quantized sum). This beats the single-agg
    multi-countDistinct form, which expands the scan 5x and shuffles the
    expansion (measured 1.25s vs 0.80s warm at sf0.1) — and at 100 TB
    the expand form's shuffle is 5x corpus width while this one's is
    bounded by per-column cardinality. The four 1-row frames cross-join
    (broadcast) and stack() unpivots map-side."""
    li = load(spark, sf_dir, "lineitem")
    frames = []
    for c in _STAT_COLS:
        g = li.groupBy(c).agg(F.count(F.lit(1)).alias("n"))
        frames.append(
            g.agg(
                F.sum("n").alias(f"{c}__n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col(c).isNull(), F.col("n"))), F.lit(0)
                ).alias(f"{c}__n_null"),
                F.count(c).alias(f"{c}__n_distinct"),
                F.min(c).alias(f"{c}__min_val"),
                F.max(c).alias(f"{c}__max_val"),
                # floor-quantized value x count stays exact in decimal and
                # equals the oracle's per-row quantized sum; double cast
                # then the 1e6 divide mirror o_dsum's op order
                (
                    F.sum(
                        quantize_long(F.col(c)).cast("decimal(38,0)")
                        * F.col("n")
                    ).cast("double")
                    / MICRO
                ).alias(f"{c}__sum_val"),
            )
        )
    wide = frames[0]
    for f in frames[1:]:
        wide = wide.crossJoin(F.broadcast(f))
    stack_args = ", ".join(
        f"'{c}', {c}__n_rows, {c}__n_null, {c}__n_distinct,"
        f" {c}__min_val, {c}__max_val, {c}__sum_val"
        for c in _STAT_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_STAT_COLS)}, {stack_args}) AS "
            "(col_name, n_rows, n_null, n_distinct, min_val, max_val, sum_val)"
        )
    )


# --- prof_skew_report -------------------------------------------------------

_SKEW_ORACLE = """
WITH c AS (
  SELECT o_custkey AS key, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
),
s AS (SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows FROM c)
SELECT key, cnt, n_keys, n_rows,
       CAST(cnt AS DOUBLE) * n_keys / n_rows AS skew_ratio
FROM c, s
ORDER BY cnt DESC, key ASC
LIMIT 10
"""


@query("prof_skew_report", oracle=_SKEW_ORACLE, tier=2)
def prof_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report for orders.o_custkey: the top-10 hottest keys
    with their skew ratio (key count over the mean count per key). This
    is the diagnosis run BEFORE choosing a join strategy — a ratio near 1
    says hash-partitioning balances, a 1000x ratio says salt this key or
    rely on AQE skew-join splitting (join_skew_salted implements the
    remedy; this operator finds the patients).

    Shape: one map-side-combined groupBy on the key, a 1-row (n_keys,
    n_rows) aggregate broadcast back, and TakeOrderedAndProject for the
    top-10 — never a global window, never a full sort. At 100 TB the
    per-key count frame is the only shuffle and is exactly the join's own
    build-side histogram; the report is O(distinct keys) -> 10 rows. The
    ratio multiplies/divides exact integers in doubles, identical ops in
    both engines."""
    o = load(spark, sf_dir, "orders")
    c = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    s = c.agg(
        F.count(F.lit(1)).alias("n_keys"), F.sum("cnt").alias("n_rows")
    )
    return (
        c.crossJoin(F.broadcast(s))
        .select(
            "key",
            "cnt",
            "n_keys",
            "n_rows",
            (F.col("cnt").cast("double") * F.col("n_keys") / F.col("n_rows"))
            .alias("skew_ratio"),
        )
        .orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(10)
    )


# --- prof_psi_drift -----------------------------------------------------------

#: Bucket count for the PSI histogram and the floor clamp for empty-bucket
#: proportions (the standard PSI epsilon so ln() stays finite).
_PSI_BUCKETS = 10
_PSI_EPS = 1e-6

#: Final per-bucket PSI term is floor-quantized to 6dp: the two engines'
#: ln() can differ by 1 ulp (the ext_char_entropy/_ENT_SCALE story), and
#: the proportions themselves are exact IEEE divisions of exact integer
#: counts, so 6dp absorbs the ulp without hiding real drift.
_PSI_ORACLE = f"""
WITH q AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(floor(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
           AS cents
  FROM orders
  WHERE year(o_orderdate) IN (1997, 1998)
),
ext AS (SELECT MIN(cents) AS mn, MAX(cents) AS mx FROM q),
b AS (
  SELECT yr,
         CAST(((cents - mn) * {_PSI_BUCKETS}) // (mx - mn + 1) AS BIGINT)
           AS bucket
  FROM q, ext
),
c AS (
  SELECT bucket,
         COUNT(CASE WHEN yr = 1997 THEN 1 END) AS n_ref,
         COUNT(CASE WHEN yr = 1998 THEN 1 END) AS n_cur
  FROM b GROUP BY bucket
),
t AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM c)
SELECT bucket, n_ref, n_cur,
       floor(
         ((CAST(n_ref AS DOUBLE) / t_ref) - (CAST(n_cur AS DOUBLE) / t_cur))
         * ln(greatest(CAST(n_ref AS DOUBLE) / t_ref, {_PSI_EPS!r})
              / greatest(CAST(n_cur AS DOUBLE) / t_cur, {_PSI_EPS!r}))
         * 1000000.0 + 0.5
       ) / 1000000.0 AS psi_term
FROM c, t
"""


@query("prof_psi_drift", oracle=_PSI_ORACLE, tier=2)
def prof_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two corpus snapshots — the
    standard data-drift monitor a production pipeline runs on every new
    ingest batch (credit-risk lineage; the same math monitors feature
    and label drift in training-data refreshes): bucket the metric into
    a fixed histogram over the COMBINED range, compare the reference and
    current proportion per bucket, and book the per-bucket PSI term
    (p_ref - p_cur) * ln(p_ref / p_cur). Σterms < 0.1 is the customary
    "stable" band; the per-bucket grain keeps the drifting buckets
    attributable instead of one opaque scalar.

    Determinism: prices quantize to exact integer cents BEFORE binning,
    and the bin is integer multiply/DIV off a 1-row min/max fold — a
    float-binned histogram can flip a boundary row per engine ulp and
    desync the COUNTS, which no output rounding could repair. Counts
    then divide exactly, and only the final transcendental term is
    quantized (6dp, the 1-ulp-ln story in the constant's comment).

    Shape: scan -> 1-row extents fold (broadcast) -> map-side bucket
    arithmetic -> one {_PSI_BUCKETS}-row conditional aggregate -> 1-row
    totals fold joined back. Everything after the first aggregate is
    O(buckets); at 100 TB both snapshot scans are column-pruned and the
    exchange carries bucket partials only."""
    o = load(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1997, 1998)
    )
    q = o.select(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.floor(F.col("o_totalprice").cast("double") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    ext = q.agg(F.min("cents").alias("mn"), F.max("cents").alias("mx"))
    b = q.crossJoin(F.broadcast(ext)).select(
        "yr",
        F.expr(f"CAST(((cents - mn) * {_PSI_BUCKETS}) DIV (mx - mn + 1) AS BIGINT)").alias(
            "bucket"
        ),
    )
    c = b.groupBy("bucket").agg(
        F.count(F.when(F.col("yr") == 1997, 1)).alias("n_ref"),
        F.count(F.when(F.col("yr") == 1998, 1)).alias("n_cur"),
    )
    t = c.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p_ref = F.col("n_ref").cast("double") / F.col("t_ref")
    p_cur = F.col("n_cur").cast("double") / F.col("t_cur")
    term = (p_ref - p_cur) * F.log(
        F.greatest(p_ref, F.lit(_PSI_EPS)) / F.greatest(p_cur, F.lit(_PSI_EPS))
    )
    return c.crossJoin(F.broadcast(t)).select(
        "bucket",
        "n_ref",
        "n_cur",
        (F.floor(term * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("psi_term"),
    )
