"""The nine remaining TPC-H query shapes (Q5, Q6, Q8, Q9, Q11, Q14, Q16,
Q17, Q20), completing 22/22 coverage of the benchmark's join/agg patterns
(SURVEY.md §2.3/§2.4; Q1-Q4, Q7, Q10, Q12, Q13, Q15, Q18, Q19, Q21, Q22
live in joins.py / aggregations.py).

Fixture adaptations (no partsupp table; see FIXTURES.md): wherever TPC-H
reads partsupp, the part-supplier bridge is derived from lineitem
aggregates — min/sum per (l_partkey, l_suppkey) — which preserves each
query's *shape* (the bridge is a fact-scale aggregate co-partitioned with
its consumers) while staying answerable by the DuckDB oracle on the same
tables. Supply cost, where needed (Q9), is proxied as a fixed fraction of
p_retailprice so the profit expression stays deterministic arithmetic on
fixture columns.

Scale stance shared by all nine: fact tables shuffle at most once on their
join key, dimensions broadcast, correlated subqueries are decorrelated into
co-partitioned aggregations (never per-row probes), and every float
reduction is decimal-quantized (functions/determinism.py) so map-side
partial aggregation stays enabled without losing cross-engine bitwise
equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.determinism import davg, dsum, o_davg, o_dsum
from ..plans.registry import query
from ..tables import load

# --- join_q5_local_volume ---------------------------------------------------

_Q5_ORACLE = f"""
SELECT n_name,
       {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


@query("join_q5_local_volume", oracle=_Q5_ORACLE, tier=2)
def join_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: local-supplier volume per nation in one region/year. The
    distinguishing shape is the NON-key equality c_nationkey = s_nationkey
    riding on the supplier join — it turns the star into a cycle, which
    Spark handles as an extra predicate on the broadcast-joined supplier
    row (no added exchange). Join order keeps the fact growing side
    smallest: orders is date-filtered at the scan (pushed to parquet),
    lineitem joins it on orderkey (one fact shuffle each), and supplier /
    nation / region broadcast. Group-by key space is O(nations)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            )
        )
    )


# --- agg_q6_forecast --------------------------------------------------------

_Q6_ORACLE = f"""
SELECT {o_dsum("l_extendedprice * l_discount", "revenue")},
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("agg_q6_forecast", oracle=_Q6_ORACLE, tier=1)
def agg_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue-change forecast — a pure scan-filter-aggregate
    with zero joins. The whole query is one map-side pass: the date range
    is pushed to the parquet scan (row-group pruning on l_shipdate min/max
    at 100 TB), the discount/quantity predicates evaluate inside
    whole-stage codegen, and the single global sum reduces O(tasks)
    partials into one row. This is the query that proves pushdown works;
    PLANS.md records its PushedFilters line."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --- join_q8_market_share ---------------------------------------------------

_Q8_ORACLE = f"""
WITH all_nations AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
)
SELECT o_year,
       {o_dsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END",
               "nation_volume")},
       {o_dsum("volume", "total_volume")}
FROM all_nations
GROUP BY o_year
"""


@query("join_q8_market_share", oracle=_Q8_ORACLE, tier=2)
def join_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share by year — nation/total volume for
    one supplier nation within one customer region and part type. The
    share division is left to the consumer (both sums are emitted) so the
    declared result stays bitwise-deterministic; the sums themselves are
    decimal-quantized. Shape: the nation dimension joins TWICE (customer
    side filters through region, supplier side labels the volume) — both
    broadcast, so the double role costs nothing. lineitem shuffles once on
    orderkey; part/supplier/customer joins ride broadcasts at dimension
    scale, with part pre-filtered to one type before broadcasting."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = n.alias("n1")
    n2 = n.select(
        F.col("n_nationkey").alias("n2_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    vol = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            ),
            "supp_nation",
        )
    )
    return vol.groupBy("o_year").agg(
        dsum(
            F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
            .otherwise(F.lit(0.0)),
            "nation_volume",
        ),
        dsum(F.col("volume"), "total_volume"),
    )


# --- join_q9_profit_proxy ---------------------------------------------------

# No partsupp => no ps_supplycost; supply cost is proxied as 10% of
# p_retailprice per unit, keeping Q9's amount expression (revenue minus
# quantity-scaled cost) deterministic on fixture columns.
_Q9_ORACLE = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       {o_dsum(
           "l_extendedprice * (1 - l_discount)"
           " - 0.1 * p_retailprice * l_quantity",
           "sum_profit",
       )}
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
"""


@query("join_q9_profit_proxy", oracle=_Q9_ORACLE, tier=2)
def join_q9_profit_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: product-type profit by supplier nation and order year.
    The LIKE filter on p_name is applied before broadcasting part, so the
    fact join prunes to matching parts map-side; orders supplies only the
    year (join on orderkey — the one lineitem shuffle); supplier→nation
    labels rows via chained broadcasts. The profit expression runs inside
    codegen and its decimal-quantized sum keeps partial aggregation on a
    (nation, year) key space of O(25 x 7) — tiny at any corpus scale."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - 0.1 * F.col("p_retailprice") * F.col("l_quantity"),
                "sum_profit",
            )
        )
    )


# --- agg_q11_important_value ------------------------------------------------

# partsupp value (ps_supplycost * ps_availqty) is proxied by each part's
# extended-price volume from suppliers of one nation; the HAVING threshold
# is the same scalar-subquery fraction-of-total shape as Q11.
_Q11_ORACLE = f"""
WITH vals AS (
  SELECT l_partkey,
         {o_dsum("l_extendedprice", "part_value")}
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_9'
  GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM vals
WHERE part_value > (
  SELECT pv * 0.001 FROM (
    SELECT {o_dsum("part_value", "pv")} FROM vals
  )
)
"""


@query("agg_q11_important_value", oracle=_Q11_ORACLE, tier=2)
def agg_q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose inventory value exceeds a fraction of the
    national total — the HAVING-over-scalar-subquery shape. Decorrelated:
    per-part values aggregate once (the only fact shuffle), the grand
    total is a 1-row decimal-exact aggregate over the SAME cached frame,
    and the threshold comparison is a broadcast nested-loop join of that
    1-row frame (whitelisted pattern — the broadcast side is one row).
    Decimal quantization makes per-part values order-exact, and summing
    those quantized doubles back through decimal keeps the grand total
    associative too, so the > threshold cut is bitwise-stable on both
    engines."""
    from ..session import scoped_persist

    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    vals = scoped_persist(
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(dsum("l_extendedprice", "part_value"))
    )
    total = vals.agg(dsum("part_value", "pv")).select(
        (F.col("pv") * 0.001).alias("threshold")
    )
    return (
        vals.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


# --- agg_q14_promo_share ----------------------------------------------------

_Q14_ORACLE = f"""
SELECT
  {o_dsum(
      "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount)"
      " ELSE 0 END",
      "promo_revenue",
  )},
  {o_dsum("l_extendedprice * (1 - l_discount)", "total_revenue")}
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


@query("agg_q14_promo_share", oracle=_Q14_ORACLE, tier=1)
def agg_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion revenue share for one month. The month filter
    is pushed to the lineitem scan; part broadcasts (it carries only the
    p_type label); the conditional and unconditional sums ride ONE
    aggregate pass so the fact is read and reduced exactly once. The
    share ratio is left to the consumer — emitting both decimal-exact
    sums keeps the declared row bitwise-deterministic (a double division
    of two exact doubles is also deterministic, but two columns are more
    reusable downstream)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            dsum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)),
                "promo_revenue",
            ),
            dsum(rev, "total_revenue"),
        )
    )


# --- join_q16_supplier_cnt --------------------------------------------------

# partsupp is derived as the DISTINCT (partkey, suppkey) pairs observed in
# lineitem; the "customer complaints" exclusion becomes negative-balance
# suppliers, preserving Q16's NOT IN anti-join shape.
_Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
"""


@query("join_q16_supplier_cnt", oracle=_Q16_ORACLE, tier=2)
def join_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: supplier count per part attribute triple, excluding a
    supplier blocklist. The bridge dedup (DISTINCT partkey/suppkey) is the
    one fact shuffle; the NOT IN subquery is a broadcast anti-join against
    the tiny negative-balance supplier set (s_suppkey is non-null in the
    fixture, so anti-join == NOT IN here — the null-semantics caveat that
    makes join_not_in_subquery interesting doesn't bite); part broadcasts
    with its selective attribute filters applied first. COUNT(DISTINCT)
    re-keys on the attribute triple — Spark expands it to a two-phase
    distinct aggregate, both phases map-side combined."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    bad = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(bad, ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- join_q17_small_qty -----------------------------------------------------

_Q17_ORACLE = f"""
WITH avg_qty AS (
  SELECT l_partkey AS a_partkey,
         {o_davg("l_quantity", "aq")}
  FROM lineitem GROUP BY l_partkey
)
SELECT {o_dsum("l_extendedprice", "total_extprice")},
       COUNT(*) AS n_small
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN avg_qty ON a_partkey = l_partkey
WHERE p_brand = 'Brand#3' AND l_quantity < 0.2 * aq
"""


@query("join_q17_small_qty", oracle=_Q17_ORACLE, tier=2)
def join_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders — the correlated
    AVG scalar subquery (per-part average quantity), decorrelated into one
    partkey-keyed aggregate joined back to the fact on the same key, so
    the probe side and the aggregate co-partition (AQE reuses the
    exchange). The per-part average is decimal-quantized (davg) so the
    0.2 * avg comparison binds identically in both engines; quantities
    are integral doubles, making the product exact. Brand filter prunes
    through the broadcast part join before the avg join."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        davg("l_quantity", "aq")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == avg_qty.a_partkey)
        .filter(F.col("l_quantity") < 0.2 * F.col("aq"))
        .agg(
            dsum("l_extendedprice", "total_extprice"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


# --- join_q20_excess_supply -------------------------------------------------

# ps_availqty > 0.5 * shipped quantity becomes: a (supp, part) pair whose
# shipped quantity in the window exceeds 30% of the part's total shipped
# quantity — same two-level aggregate + semi-join chain, fixture-only
# columns. Quantities are integral doubles, so plain SUMs are exact and
# order-insensitive without decimal quantization.
_Q20_ORACLE = """
WITH part_total AS (
  SELECT l_partkey AS t_partkey, SUM(l_quantity) AS total_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_partkey
), supp_part AS (
  SELECT l_suppkey, l_partkey, SUM(l_quantity) AS supp_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey, l_partkey
)
SELECT DISTINCT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN supp_part ON l_suppkey = s_suppkey
JOIN part_total ON t_partkey = l_partkey
JOIN part ON p_partkey = l_partkey
WHERE n_name IN ('NATION_2', 'NATION_9')
  AND p_name LIKE '%bolt%'
  AND supp_qty > 0.3 * total_qty
"""


@query("join_q20_excess_supply", oracle=_Q20_ORACLE, tier=2)
def join_q20_excess_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers holding excess stock of selected parts in
    selected nations. Two aggregations over the SAME date-filtered fact
    scan — per (supp, part) and per part — co-partition on partkey for
    the threshold join (the per-part total is the finer aggregate's
    re-aggregation, so at 100 TB the second shuffle moves only the
    (supp, part) frame, not the fact). Part name filter broadcasts;
    the final DISTINCT collapses a supplier qualifying via multiple
    parts, keyed on the tiny supplier dimension."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    from ..session import scoped_persist

    # persisted: supp_part feeds both its own re-aggregation (part totals)
    # and the threshold join — one scan+shuffle instead of two
    supp_part = scoped_persist(
        li.groupBy("l_suppkey", "l_partkey").agg(
            F.sum("l_quantity").alias("supp_qty")
        )
    )
    part_total = supp_part.groupBy(
        F.col("l_partkey").alias("t_partkey")
    ).agg(F.sum("supp_qty").alias("total_qty"))
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_2", "NATION_9")
    )
    qualifying = (
        supp_part.join(part_total, supp_part.l_partkey == part_total.t_partkey)
        .join(F.broadcast(p), supp_part.l_partkey == p.p_partkey)
        .filter(F.col("supp_qty") > 0.3 * F.col("total_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )
