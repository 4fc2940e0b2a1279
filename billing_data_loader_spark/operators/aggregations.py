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

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.determinism import (
    davg,
    dsum,
    dsum_col as _dsum_col,
    dsum_sql,
    o_davg,
    o_dsum,
    o_dsum_expr,
    quantize_long,
)
from ..plans.registry import query
from ..session import scoped_persist
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


# --- agg_count_distinct -----------------------------------------------------

_CD_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
"""


@query("agg_count_distinct", oracle=_CD_ORACLE, tier=1)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type (expand-distinct hash agg)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- agg_conditional --------------------------------------------------------

_COND_ORACLE = f"""
SELECT
  l_returnflag,
  {o_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END", "qty_f")},
  {o_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END", "qty_o")},
  {o_dsum("CASE WHEN l_discount > 0.05 THEN l_extendedprice * (1 - l_discount) END",
          "rev_high_disc")},
  COUNT(CASE WHEN l_tax = 0 THEN 1 END) AS n_tax_free
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg_conditional", oracle=_COND_ORACLE, tier=1)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation: sum(CASE WHEN ...)."""
    li = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag").agg(
        dsum(F.when(F.col("l_linestatus") == "F", qty).otherwise(0), "qty_f"),
        dsum(F.when(F.col("l_linestatus") == "O", qty).otherwise(0), "qty_o"),
        dsum(F.when(F.col("l_discount") > 0.05, rev), "rev_high_disc"),
        F.count(F.when(F.col("l_tax") == 0, 1)).alias("n_tax_free"),
    )


# --- agg_having -------------------------------------------------------------

_HAVING_ORACLE = f"""
SELECT o_custkey,
       COUNT(*) AS n_orders,
       {o_dsum("o_totalprice", "total_spent")}
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) > 12 AND {o_dsum_expr("o_totalprice")} > 1000000
"""


@query("agg_having", oracle=_HAVING_ORACLE, tier=1)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_spent"),
        )
        .filter((F.col("n_orders") > 12) & (F.col("total_spent") > 1000000))
    )


# --- agg_rollup -------------------------------------------------------------

_ROLLUP_ORACLE = f"""
SELECT r_name, n_name,
       GROUPING(r_name, n_name) AS gid,
       COUNT(*) AS n_customers,
       {o_dsum("c_acctbal", "sum_bal")}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""


@query("agg_rollup", oracle=_ROLLUP_ORACLE, tier=2)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region->nation subtotals + grand total via ROLLUP."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal", "sum_bal"),
    )


# --- agg_cube ---------------------------------------------------------------

_CUBE_ORACLE = f"""
SELECT c_mktsegment, o_orderpriority,
       GROUPING(c_mktsegment, o_orderpriority) AS gid,
       COUNT(*) AS n_orders,
       {o_dsum("o_totalprice", "sum_price")}
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE(c_mktsegment, o_orderpriority)
"""


@query("agg_cube", oracle=_CUBE_ORACLE, tier=3)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (mktsegment, orderpriority): all 4 grouping combinations."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "sum_price"),
        )
    )


# --- agg_grouping_sets ------------------------------------------------------

_GSETS_ORACLE = f"""
SELECT c_mktsegment, o_orderstatus,
       GROUPING(c_mktsegment, o_orderstatus) AS gid,
       COUNT(*) AS n_orders,
       {o_dsum("o_totalprice", "sum_price")}
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
"""


@query("agg_grouping_sets", oracle=_GSETS_ORACLE, tier=3)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (per-segment, per-status, grand total)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey)
    joined.createOrReplaceTempView("bdl_gsets_input")
    return spark.sql(f"""
        SELECT c_mktsegment, o_orderstatus,
               CAST(grouping_id(c_mktsegment, o_orderstatus) AS BIGINT) AS gid,
               COUNT(*) AS n_orders,
               {dsum_sql("o_totalprice")} AS sum_price
        FROM bdl_gsets_input
        GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
    """)


# --- agg_collect_sorted -----------------------------------------------------

# The sorted collect arrays cross the driver boundary as CSV strings: the
# driver's canonicalizer cannot hash ndarray cells (CORRECTNESS_r01
# canon-crash). Prices are formatted through decimal(14,2) so both engines
# render identical full-scale text; collect_sorted_arrays() keeps the
# array-typed variant for internal consumers.
_COLLECT_ORACLE = """
SELECT o_custkey,
       string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
       string_agg(CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS VARCHAR),
                  ',' ORDER BY o_totalprice) AS prices
FROM orders
GROUP BY o_custkey
"""


def collect_sorted_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-typed variant: per-group sorted value arrays (array_sort makes
    collect deterministic). Internal-only; the declared query serializes."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.array_sort(F.collect_list("o_orderstatus")).alias("statuses"),
        F.array_sort(F.collect_list("o_totalprice")).alias("prices"),
    )


@query("agg_collect_sorted", oracle=_COLLECT_ORACLE, tier=2)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group sorted value arrays, serialized to driver-hashable CSV."""
    arrays = collect_sorted_arrays(spark, sf_dir)
    return arrays.select(
        "o_custkey",
        F.array_join("statuses", ",").alias("statuses"),
        F.array_join(
            F.transform(
                "prices", lambda x: x.cast("decimal(14,2)").cast("string")
            ),
            ",",
        ).alias("prices"),
    )


# --- agg_percentiles --------------------------------------------------------

_PCTL_ORACLE = """
SELECT c_mktsegment,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@query("agg_percentiles", oracle=_PCTL_ORACLE, tier=2)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per segment (not approx — oracle parity)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    # array form: one percentile aggregate buffers each group once and
    # evaluates both points (the scalar form buffers per-aggregate; see
    # agg_approx_percentile_bound)
    pcts = F.percentile("o_totalprice", F.array(F.lit(0.5), F.lit(0.9)))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(pcts.alias("_ps"))
        .select(
            "c_mktsegment",
            F.round(F.element_at("_ps", 1), 4).alias("p50"),
            F.round(F.element_at("_ps", 2), 4).alias("p90"),
        )
    )


# --- agg_stats --------------------------------------------------------------

# stddev/corr are reduction-order-sensitive in both engines; instead of
# rounding roulette, compute them from quantized-exact moments (dsum_col)
# with the SAME double expression on both sides -> bit-identical.
# (Cancellation is benign at fixture magnitudes; documented tradeoff of
# parity over textbook stability.)

_STATS_ORACLE = f"""
WITH m AS (
  SELECT event_type,
         COUNT(*) AS n,
         {o_dsum_expr("value")} AS sx,
         {o_dsum_expr("value * value")} AS sxx,
         {o_dsum_expr("CAST(user_id AS DOUBLE)")} AS sy,
         {o_dsum_expr("CAST(user_id AS DOUBLE) * CAST(user_id AS DOUBLE)")} AS syy,
         {o_dsum_expr("value * CAST(user_id AS DOUBLE)")} AS sxy
  FROM events GROUP BY event_type
)
SELECT event_type,
       n,
       sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_value,
       (sxx - sx * sx / n) / (n - 1) AS var_value,
       (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
         AS corr_value_user
FROM m
"""


@query("agg_stats", oracle=_STATS_ORACLE, tier=2)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev / variance / correlation via quantized-exact moment sums."""
    ev = load(spark, sf_dir, "events")
    x = F.col("value")
    y = F.col("user_id").cast("double")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum_col(x).alias("sx"),
        _dsum_col(x * x).alias("sxx"),
        _dsum_col(y).alias("sy"),
        _dsum_col(y * y).alias("syy"),
        _dsum_col(x * y).alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (
        F.col("n"), F.col("sx"), F.col("sxx"), F.col("sy"), F.col("syy"), F.col("sxy"),
    )
    return m.select(
        "event_type",
        "n",
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("stddev_value"),
        ((sxx - sx * sx / n) / (n - 1)).alias("var_value"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_value_user"),
    )


# --- agg_approx_distinct ----------------------------------------------------


_APPROX_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS hll_ok
FROM events
GROUP BY event_type
"""


@query("agg_approx_distinct", oracle=_APPROX_ORACLE, tier=3)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct per event type, hash-oracled via a bound assertion.

    Raw HLL estimates differ across engines by design, so the estimate
    itself can't be hash-compared. Instead the DECLARED output carries the
    exact distinct count plus ``hll_ok`` — a boolean asserting the sketch
    landed within 5x its configured 1% relative error — and the oracle
    emits the exact counts with ``TRUE``. A wrong HLL wiring (wrong column,
    wrong rsd, broken merge) flips ``hll_ok`` and now FAILS the driver's
    value-hash check, where the old rows-only declaration could only have
    caught a row-count change. (The raw estimate stays observable through
    the bound: upgrading from rows-only to hash-checked costs us the
    estimate column but buys a real pass/fail signal on the sketch.)

    Both counts run over the PRE-DEDUPED (event_type, user_id) pairs: HLL
    registers are duplicate-insensitive, so sketching the distinct pairs
    yields the identical estimate while the exact count becomes a plain
    COUNT(*) — mixing countDistinct with another aggregate in one agg
    forces Spark's expand-based distinct plan (measured 2x slower). At
    100 TB you would drop the exact column and sketch the raw stream in
    one pass (that being HLL's point)."""
    ev = load(spark, sf_dir, "events")
    pairs = ev.select("event_type", "user_id").distinct()
    return pairs.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("exact_users"),
    ).select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.greatest(F.col("exact_users") * 0.05, F.lit(1.0))
        ).alias("hll_ok"),
    )


# --- agg_minmax_by ----------------------------------------------------------

# max_by/min_by (SQL-2023 ANY_VALUE-family ordered-arg aggregates): per
# customer, the order key of the most/least expensive order and its date.
# Deterministic because (o_custkey, o_totalprice) has no ties in the
# fixtures (verified at sf0.01 and sf0.1); with ties you'd order by a
# (price, orderkey) composite.
_MINMAX_BY_ORACLE = """
SELECT o_custkey,
       arg_max(o_orderkey, o_totalprice) AS top_order,
       arg_max(o_totalprice, o_totalprice) AS top_price,
       arg_min(o_orderkey, o_totalprice) AS bottom_order,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_custkey
"""


@query("agg_minmax_by", oracle=_MINMAX_BY_ORACLE, tier=2)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by ordered-argument aggregates — one hash aggregate with
    map-side combine (each partial keeps only the current winner, O(groups)
    state), where the window-function formulation would sort per group."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.expr("max_by(o_orderkey, o_totalprice)").alias("top_order"),
        F.max("o_totalprice").alias("top_price"),
        F.expr("min_by(o_orderkey, o_totalprice)").alias("bottom_order"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --- agg_hll_partitioned_merge ----------------------------------------------

# Mergeable-sketch algebra: the pattern that makes 100 TB distinct counts
# cheap is building small sketches close to the data (per shard / per
# partition / per day) and UNIONING them later — re-aggregation without
# re-scanning. Verified like agg_approx_distinct: estimates aren't
# cross-engine comparable, so the declared row carries the exact count
# plus booleans asserting (a) the merged estimate is within bound and
# (b) the shard-merged sketch equals the directly-built sketch estimate
# (union correctness), both of which DuckDB mirrors as TRUE.
_HLL_MERGE_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
       TRUE AS merge_consistent,
       TRUE AS estimate_ok
FROM orders
GROUP BY o_orderstatus
"""


@query("agg_hll_partitioned_merge", oracle=_HLL_MERGE_ORACLE, tier=3)
def agg_hll_partitioned_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level HLL: DataSketches HLL built per (status, shard), then
    hll_union_agg-merged per status — the mergeable-sketch rollup that
    lets a 100 TB pipeline pre-aggregate distincts per partition/day and
    re-aggregate to any coarser grain without touching raw data again.

    ``merge_consistent`` asserts the shard-merged estimate tracks the
    sketch built directly per status within 2% (DataSketches HLL union is
    NOT register-identical to a direct build — the union target promotes
    to HLL_8 — so estimates differ by a fraction of the standard error;
    measured ±0.4% on the fixtures. Broken merge wiring — dropped shards,
    mismatched lgK — lands far outside 2%);
    ``estimate_ok`` asserts the estimate lands within 5x the lgK=12
    standard error (~1.6%) of the exact count. Both must be TRUE to
    hash-match the oracle."""
    o = load(spark, sf_dir, "orders").select("o_orderstatus", "o_custkey")
    shard = o.withColumn("shard", F.pmod("o_custkey", F.lit(8)))
    per_shard = shard.groupBy("o_orderstatus", "shard").agg(
        F.expr("hll_sketch_agg(o_custkey, 12)").alias("sk")
    )
    merged = per_shard.groupBy("o_orderstatus").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_merged")
    )
    direct = o.groupBy("o_orderstatus").agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(o_custkey, 12))").alias(
            "est_direct"
        ),
        F.countDistinct("o_custkey").alias("exact_custs"),
    )
    return (
        merged.join(direct, "o_orderstatus")
        .select(
            "o_orderstatus",
            "exact_custs",
            (
                F.abs(F.col("est_merged") - F.col("est_direct"))
                <= F.greatest(F.col("exact_custs") * 0.02, F.lit(4.0))
            ).alias("merge_consistent"),
            (
                F.abs(F.col("est_merged") - F.col("exact_custs"))
                <= F.greatest(F.col("exact_custs") * 0.08, F.lit(2.0))
            ).alias("estimate_ok"),
        )
    )


# --- agg_approx_percentile_bound --------------------------------------------

# approx_percentile (Greenwald-Khanna) verified the same way as the HLL
# operators: the estimate itself is engine-specific, so the declared row
# carries exact percentiles plus a boolean asserting the sketch landed
# inside a window far wider than its rank-error guarantee (accuracy
# 10000 => error <= n/10000 ranks; the [p45, p55] / [p85, p95] windows
# allow 5 full percentile points).
_APCTL_ORACLE = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4) AS exact_p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS exact_p90,
       TRUE AS approx_ok
FROM orders
GROUP BY o_orderstatus
"""


@query("agg_approx_percentile_bound", oracle=_APCTL_ORACLE, tier=3)
def agg_approx_percentile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch percentiles with a hash-checkable error bound: one pass
    computes the GK approx p50/p90 AND the exact interpolated p45..p95
    window edges; ``approx_ok`` asserts containment. The approx path is
    what survives 100 TB (bounded memory per group, mergeable partials);
    the exact columns are the oracle anchor — a real pipeline would drop
    them and keep the sketch. Mirrors the agg_approx_distinct /
    agg_hll_partitioned_merge discipline: approximate operators get
    bound assertions, not value compares."""
    o = load(spark, sf_dir, "orders")
    # ONE exact-percentile aggregate evaluated at all six points and ONE
    # GK sketch at both, via the array forms: each scalar
    # percentile(col, p) aggregate buffers the whole group independently,
    # so the scalar form held six copies of every group's values (r5:
    # 1.45 s -> ~0.9 s at sf0.1); per-element results are identical.
    pcts = F.percentile(
        "o_totalprice",
        F.array(*[F.lit(p) for p in (0.5, 0.9, 0.45, 0.55, 0.85, 0.95)]),
    )
    apxs = F.approx_percentile(
        "o_totalprice",
        F.array(F.lit(0.5), F.lit(0.9)),
        F.lit(10000),
    )
    return (
        o.groupBy("o_orderstatus")
        .agg(pcts.alias("_ps"), apxs.alias("_as"))
        .select(
            "o_orderstatus",
            F.round(F.element_at("_ps", 1), 4).alias("exact_p50"),
            F.round(F.element_at("_ps", 2), 4).alias("exact_p90"),
            (
                (F.element_at("_as", 1) >= F.element_at("_ps", 3))
                & (F.element_at("_as", 1) <= F.element_at("_ps", 4))
                & (F.element_at("_as", 2) >= F.element_at("_ps", 5))
                & (F.element_at("_as", 2) <= F.element_at("_ps", 6))
            ).alias("approx_ok"),
        )
    )


# --- agg_bitmap_distinct ------------------------------------------------------

# The oracle is the SEMANTIC truth (plain COUNT(DISTINCT)), not a mirror of
# the bitmap arithmetic — the gate proves the bitmap path IS exact distinct.
_BITMAP_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT CASE WHEN year(ts) = 1997 THEN user_id END) AS n_users_1997
FROM events
GROUP BY event_type
"""


@query("agg_bitmap_distinct", oracle=_BITMAP_ORACLE, tier=2)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via packed bitmap words — the
    ClickHouse/Doris bitmap-index pattern re-expressed in Spark SQL: each
    user lands in word ``user_id >> 5`` at bit ``user_id % 32``; per
    (event_type, year, word) partial bitmaps merge with BIT_OR and the
    final count is a popcount sum. Unlike COUNT(DISTINCT), the partial
    bitmaps are MERGEABLE STATE: at 100 TB you persist per-(day, group,
    word) segments once and answer any date-range distinct by re-OR-ing
    words — no raw-key re-shuffle, and the exchange carries at most
    |key_space|/32 rows per group instead of every raw observation. The
    year=1997 column is computed here BY MERGING the per-year partials
    (bit_or over the year axis for the total), proving re-aggregation;
    both columns must equal the semantic COUNT(DISTINCT) oracle exactly —
    bitmaps are exact, not a sketch (contrast agg_approx_distinct's HLL,
    which trades exactness for fixed-size state when the key space is
    unbounded). 32-bit words in a BIGINT slot keep the shift portable
    (DuckDB raises on 1<<63; Spark wraps negative — both stop at 62).
    Word/bit addressing assumes non-negative ids (this fixture: 0..1499);
    arbitrary or sparse key domains first dense-rank or hash into a
    bounded index space — the same prep a roaring bitmap index does.

    Shape: one shuffle to (event_type, year, word) with map-side partial
    BIT_OR, then a word-count-bounded second aggregate that reuses the
    hash partitioning prefix. The first aggregate's map-side combine is
    what makes this scan-dominant at scale."""
    ev = load(spark, sf_dir, "events")
    words = (
        ev.select(
            "event_type",
            F.year("ts").alias("yr"),
            F.expr("user_id >> 5").alias("word"),
            F.expr("shiftleft(1L, int(user_id % 32))").alias("bit"),
        )
        .groupBy("event_type", "yr", "word")
        .agg(F.bit_or("bit").alias("bm"))
    )
    return (
        words.groupBy("event_type", "word")
        .agg(
            F.bit_or("bm").alias("bm_all"),
            F.bit_or(F.when(F.col("yr") == 1997, F.col("bm"))).alias("bm_1997"),
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.bit_count("bm_all")).alias("n_users"),
            F.sum(F.bit_count(F.coalesce("bm_1997", F.lit(0)))).alias(
                "n_users_1997"
            ),
        )
    )


# --- agg_weighted_median --------------------------------------------------------

_WMED_ORACLE = """
WITH li AS (
  SELECT l_returnflag AS rf, l_linestatus AS ls,
         CAST(floor(l_extendedprice * 1e2 + CAST(0.5 AS DOUBLE))
              AS BIGINT) AS cents,
         CAST(floor(l_quantity + CAST(0.5 AS DOUBLE)) AS BIGINT) AS w
  FROM lineitem
),
g AS (
  SELECT rf, ls, cents, CAST(SUM(w) AS BIGINT) AS w,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM li GROUP BY rf, ls, cents
),
c AS (
  SELECT rf, ls, cents, n, w,
         CAST(SUM(w) OVER (PARTITION BY rf, ls ORDER BY cents
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(w) OVER (PARTITION BY rf, ls) AS BIGINT) AS total,
         CAST(SUM(n) OVER (PARTITION BY rf, ls) AS BIGINT) AS n_items
  FROM g
)
SELECT rf, ls, MAX(n_items) AS n_items, MAX(total) AS total_weight,
       CAST(MIN(CASE WHEN 4 * cum >= total THEN cents END) AS DOUBLE)
         / 1e2 AS wp25,
       CAST(MIN(CASE WHEN 2 * cum >= total THEN cents END) AS DOUBLE)
         / 1e2 AS weighted_median,
       CAST(MIN(CASE WHEN 4 * cum >= 3 * total THEN cents END) AS DOUBLE)
         / 1e2 AS wp75
FROM c GROUP BY rf, ls
"""


@query("agg_weighted_median", oracle=_WMED_ORACLE, tier=2)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-WEIGHTED price quartiles per (returnflag, linestatus):
    the smallest price whose cumulative quantity weight covers 25/50/75%
    of the group's total — "the price of the median unit SOLD", which
    agg_percentiles' row-median cannot answer (a 1-unit line and a
    50-unit line count equally there).

    Exactness: prices collapse to exact integer cents, weights to exact
    integer units, so cumulative weights and the 4*cum >= k*total
    boundary tests are pure integer cross-multiplications — no
    interpolation, no float boundary anywhere; the output division by
    100 is shared text.

    Shape: one (group, cents) aggregate collapses the fact table to
    distinct price points per group (the only data-sized exchange, with
    full map-side combine); the cumulative window rides a group-keyed
    exchange over the distinct-price frame (bounded by price support,
    not rows); the quartile picks are conditional MINs in the final
    O(groups)-row aggregate. At 100 TB the swap for a giant
    distinct-price frame is the two-pass bucketed prefix sum
    (ts_cusum pattern) — same as any exact order statistic."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_linestatus").alias("ls"),
        quantize_long("l_extendedprice", 2).alias("cents"),
        quantize_long("l_quantity", 0).alias("w"),
    )
    g = li.groupBy("rf", "ls", "cents").agg(
        F.sum("w").alias("w"), F.count(F.lit(1)).alias("n")
    )
    wcum = (
        W.partitionBy("rf", "ls")
        .orderBy("cents")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("rf", "ls")
    c = g.select(
        "rf",
        "ls",
        "cents",
        "n",
        "w",
        F.sum("w").over(wcum).alias("cum"),
        F.sum("w").over(wall).alias("total"),
        F.sum("n").over(wall).alias("n_items"),
    )
    return c.groupBy("rf", "ls").agg(
        F.max("n_items").alias("n_items"),
        F.max("total").alias("total_weight"),
        F.expr(
            "CAST(MIN(CASE WHEN 4 * cum >= total THEN cents END)"
            " AS DOUBLE) / 1e2"
        ).alias("wp25"),
        F.expr(
            "CAST(MIN(CASE WHEN 2 * cum >= total THEN cents END)"
            " AS DOUBLE) / 1e2"
        ).alias("weighted_median"),
        F.expr(
            "CAST(MIN(CASE WHEN 4 * cum >= 3 * total THEN cents END)"
            " AS DOUBLE) / 1e2"
        ).alias("wp75"),
    )


# --- agg_audience_overlap -------------------------------------------------------

_AUD_ORACLE = """
WITH du AS (
  SELECT DISTINCT event_type, user_id FROM events
),
sz AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM du
  GROUP BY event_type
),
inter AS (
  SELECT a.event_type AS et_a, b.event_type AS et_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM du a JOIN du b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT sa.event_type AS et_a, sb.event_type AS et_b,
       sa.n AS n_a, sb.n AS n_b,
       COALESCE(i.n_both, 0) AS n_both,
       CAST(COALESCE(i.n_both, 0) AS DOUBLE)
         / CAST(sa.n + sb.n - COALESCE(i.n_both, 0) AS DOUBLE)
         AS jaccard,
       CAST(COALESCE(i.n_both, 0) AS DOUBLE)
         / CAST(least(sa.n, sb.n) AS DOUBLE) AS containment
FROM sz sa JOIN sz sb ON sa.event_type < sb.event_type
LEFT JOIN inter i
  ON i.et_a = sa.event_type AND i.et_b = sb.event_type
"""


@query("agg_audience_overlap", oracle=_AUD_ORACLE, tier=2)
def agg_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: for every pair of event types, the two
    audience sizes, the shared-user count, Jaccard, and the containment
    coefficient |A∩B|/min(|A|,|B|) — the segmentation read behind
    "do clickers also purchase?" funnel and campaign-targeting
    decisions; agg_bitmap_distinct/ext_overlap_kmv are the sketch
    versions of the same question, this is the exact small-domain form.
    The pair grid builds from the size frame so type pairs with ZERO
    shared users still report (coalesced to 0) rather than silently
    vanishing.

    Exactness: all counts integer; Jaccard and containment are one
    shared-text division each.

    Shape: one distinct on (type, user) — the only data-sized exchange —
    then the intersection self-join keys on user_id (hash join; the
    type-ordered predicate halves the pairs) and everything downstream
    runs on O(types^2) rows. At 100 TB the self-join carries only
    distinct memberships, and a bitmap/KMV sketch swaps in above
    ~10^9-user audiences (the sibling keys)."""
    du = scoped_persist(
        load(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    sz = du.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        du.alias("a")
        .join(
            du.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("et_a"),
            F.col("b.event_type").alias("et_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sz.select(F.col("event_type").alias("et_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("event_type").alias("et_b"), F.col("n").alias("n_b"))
    grid = sa.join(F.broadcast(sb), F.col("et_a") < F.col("et_b"))
    return (
        grid.join(F.broadcast(inter), ["et_a", "et_b"], "left")
        .select(
            "et_a",
            "et_b",
            "n_a",
            "n_b",
            F.coalesce("n_both", F.lit(0).cast("long")).alias("n_both"),
        )
        .select(
            "et_a",
            "et_b",
            "n_a",
            "n_b",
            "n_both",
            F.expr(
                "CAST(n_both AS DOUBLE)"
                " / CAST(n_a + n_b - n_both AS DOUBLE)"
            ).alias("jaccard"),
            F.expr(
                "CAST(n_both AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE)"
            ).alias("containment"),
        )
    )


# --- agg_higher_moments ---------------------------------------------------------

#: Shared-text power-sum -> standardized-moment chain. Values quantize
#: to DECI-units (floor(v*10 + 0.5)): the per-row 4th power must stay
#: inside BIGINT, which bounds the grid at q <= 55108 — deci-units
#: carry values to 5510 units (fixture max 560), cents would overflow
#: at 551. Sums accumulate as DECIMAL(38,0) (never overflow); every
#: division/multiplication after the exact sums is one shared-text IEEE
#: chain, so both engines emit identical doubles.
_MOM_MEAN = "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
_MOM_M2 = f"(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - {_MOM_MEAN} * {_MOM_MEAN})"
_MOM_M3 = (
    f"(CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - 3e0 * {_MOM_MEAN} * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))"
    f" + 2e0 * {_MOM_MEAN} * {_MOM_MEAN} * {_MOM_MEAN})"
)
_MOM_M4 = (
    f"(CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - 4e0 * {_MOM_MEAN} * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))"
    f" + 6e0 * {_MOM_MEAN} * {_MOM_MEAN}"
    f" * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))"
    f" - 3e0 * {_MOM_MEAN} * {_MOM_MEAN} * {_MOM_MEAN} * {_MOM_MEAN})"
)

_MOM_ORACLE = f"""
WITH q AS (
  SELECT event_type,
         CAST(floor(value * 1e1 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS qv
  FROM events
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(qv AS DECIMAL(38,0))) AS s1,
         SUM(CAST(qv * qv AS DECIMAL(38,0))) AS s2,
         SUM(CAST(qv * qv * qv AS DECIMAL(38,0))) AS s3,
         SUM(CAST(qv * qv * qv * qv AS DECIMAL(38,0))) AS s4
  FROM q GROUP BY event_type
)
SELECT event_type, n,
       {_MOM_MEAN} AS mean_deci,
       {_MOM_M2} AS var_deci2,
       CASE WHEN {_MOM_M2} <= 0e0 THEN CAST(0 AS DOUBLE)
            ELSE {_MOM_M3} / ({_MOM_M2} * sqrt({_MOM_M2}))
       END AS skewness,
       CASE WHEN {_MOM_M2} <= 0e0 THEN CAST(0 AS DOUBLE)
            ELSE {_MOM_M4} / ({_MOM_M2} * {_MOM_M2}) - 3e0
       END AS kurtosis_excess
FROM s
"""


@query("agg_higher_moments", oracle=_MOM_ORACLE, tier=2)
def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis per event type from exact quantized
    power sums — the higher-moment extension of agg_stats (which stops
    at variance/correlation): a billing-events profile where skewness
    reads revenue concentration (a few large purchases vs many small)
    and kurtosis reads tail risk, the two numbers an anomaly-threshold
    owner needs before trusting z-score rules (ts_anomaly_mad's MAD
    exists precisely because these are high on real feeds).

    Exactness: values floor-quantize to DECI-units (the grid bound that
    keeps the per-row 4th power inside BIGINT up to 5510 units —
    documented; cents would overflow at 551); the four power sums
    accumulate as DECIMAL(38,0) (exact at any corpus size); every
    post-sum step is the SAME f-string expression text evaluated by
    both engines — correctly-rounded IEEE casts, divisions, and one
    sqrt — so the emitted doubles are bit-identical; zero-variance
    groups emit 0 by an explicit guard.

    Shape: one scan -> ONE group-by with map-side partial decimal sums
    (the agg_stats plan; 5 output rows); nothing else. At 100 TB this
    is the canonical single-shuffle moment profile."""
    q = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "CAST(floor(value * 1e1 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("qv"),
    )
    s = q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(qv AS DECIMAL(38,0))")).alias("s1"),
        F.sum(F.expr("CAST(qv * qv AS DECIMAL(38,0))")).alias("s2"),
        F.sum(F.expr("CAST(qv * qv * qv AS DECIMAL(38,0))")).alias("s3"),
        F.sum(F.expr("CAST(qv * qv * qv * qv AS DECIMAL(38,0))")).alias(
            "s4"
        ),
    )
    return s.select(
        "event_type",
        "n",
        F.expr(_MOM_MEAN).alias("mean_deci"),
        F.expr(_MOM_M2).alias("var_deci2"),
        F.expr(
            f"CASE WHEN {_MOM_M2} <= 0e0 THEN CAST(0 AS DOUBLE) "
            f"ELSE {_MOM_M3} / ({_MOM_M2} * sqrt({_MOM_M2})) END"
        ).alias("skewness"),
        F.expr(
            f"CASE WHEN {_MOM_M2} <= 0e0 THEN CAST(0 AS DOUBLE) "
            f"ELSE {_MOM_M4} / ({_MOM_M2} * {_MOM_M2}) - 3e0 END"
        ).alias("kurtosis_excess"),
    )
