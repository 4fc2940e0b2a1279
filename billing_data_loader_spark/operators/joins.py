"""Join operators (SURVEY.md §2.3).

Scale stance: dimension tables (`region`, `nation`) get explicit
``F.broadcast`` hints — at 100 TB these stay tiny and must never shuffle the
fact side. Mid-size dims (`supplier`, `customer`) are left to AQE, which
converts to broadcast at runtime when the built side fits; fact-fact joins
(`lineitem`x`orders`) shuffle on the join key, which is the correct plan at
any scale. Theta/band predicates ride as residual filters on an equi-key hash
join — never a broadcast-nested-loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.determinism import (
    davg,
    dsum,
    dsum_col,
    o_davg,
    o_dsum,
    o_dsum_expr,
    quantize_long,
)
from ..plans.registry import query
from ..session import conf_override
from ..tables import load

# --- join_inner_hash --------------------------------------------------------

_INNER_ORACLE = """
SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
"""


@query("join_inner_hash", oracle=_INNER_ORACLE, tier=1)
def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders x customer (shuffle hash / SMJ by planner)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


# --- join_broadcast_dim -----------------------------------------------------

_BROADCAST_ORACLE = """
SELECT c_custkey, c_name, n_name, r_name
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""


@query("join_broadcast_dim", oracle=_BROADCAST_ORACLE, tier=1)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-dim lookup with explicit broadcast of the small dims."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


# --- join_q3_shipping -------------------------------------------------------

_Q3_DATE = "1997-06-15"

# Deterministic top-10: revenue is a decimal-quantized sum (bit-identical on
# both engines), and (revenue DESC, o_orderdate, l_orderkey) is a total order.
_Q3_ORACLE = f"""
SELECT l_orderkey,
       {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '{_Q3_DATE}'
  AND l_shipdate > TIMESTAMP '{_Q3_DATE}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


@query("join_q3_shipping", oracle=_Q3_ORACLE, tier=2)
def join_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (BASELINE.md's `q3_shipping_priority`): segment filter
    on customer, date filters pushed to both fact scans, 3-way join, grouped
    revenue, distributed top-10 (`TakeOrderedAndProject`, no global sort).
    Join strategy is left to Catalyst/AQE: customer broadcast-converts when
    its filtered side fits, lineitem x orders shuffles on the key — the
    correct plan at any scale."""
    d = F.lit(_Q3_DATE).cast("timestamp")
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < d)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > d)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue").desc(),
            F.col("o_orderdate").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(10)
    )


# --- join_star_5way ---------------------------------------------------------

_Q5_ORACLE = f"""
SELECT n_name, {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem, orders, customer, supplier, nation, region
WHERE l_orderkey = o_orderkey
  AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


@query("join_star_5way", oracle=_Q5_ORACLE, tier=1)
def join_star_5way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way star join + revenue rollup per nation."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# --- join_left_outer --------------------------------------------------------

_LEFT_ORACLE = f"""
SELECT
  c_custkey,
  COUNT(o_orderkey) AS n_orders,
  COALESCE({o_dsum_expr("o_totalprice")}, 0.0) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


@query("join_left_outer", oracle=_LEFT_ORACLE, tier=1)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with/without orders: left join preserves match-less rows."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                dsum_col("o_totalprice"),
                F.lit(0.0),
            ).alias("total_spent"),
        )
    )


# --- join_semi / join_anti --------------------------------------------------

_SEMI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderstatus = 'F' AND o_totalprice > 200000
)
"""


@query("join_semi", oracle=_SEMI_ORACLE, tier=2)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS via left-semi join (no row multiplication, build side pruned)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000)
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


_ANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@query("join_anti", oracle=_ANTI_ORACLE, tier=2)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS via left-anti join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --- join_theta_band --------------------------------------------------------

_THETA_ORACLE = f"""
SELECT
  p_brand,
  COUNT(*) AS n_lines,
  {o_dsum("l_extendedprice - p_retailprice", "sum_over_retail")}
FROM lineitem JOIN part
  ON l_partkey = p_partkey AND l_extendedprice > p_retailprice
GROUP BY p_brand
"""


@query("join_theta_band", oracle=_THETA_ORACLE, tier=2)
def join_theta_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed equi+theta join: keeps the hash join, theta as residual filter."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        li.join(
            p,
            (F.col("l_partkey") == F.col("p_partkey"))
            & (F.col("l_extendedprice") > F.col("p_retailprice")),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(
                F.col("l_extendedprice") - F.col("p_retailprice"),
                "sum_over_retail",
            ),
        )
    )


# --- join_interval ----------------------------------------------------------

_INTERVAL_ORACLE = f"""
SELECT
  o_orderstatus,
  COUNT(*) AS n_lines,
  {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey
 AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY
GROUP BY o_orderstatus
"""


@query("join_interval", oracle=_INTERVAL_ORACLE, tier=2)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: equi key + range predicate (ship within 90 days)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return (
        li.join(
            o,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & F.col("l_shipdate").between(
                F.col("o_orderdate"),
                F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
            ),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


# --- join_cross_small -------------------------------------------------------

_CROSS_ORACLE = """
SELECT r_name, o_orderstatus
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
"""


@query("join_cross_small", oracle=_CROSS_ORACLE, tier=3)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of tiny dims (explicit — Spark requires crossJoin())."""
    r = load(spark, sf_dir, "region").select("r_name")
    statuses = load(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(statuses)


# --- join_asof_events -------------------------------------------------------

# As-of join: Spark has no native primitive (SURVEY §4.2). Pattern: tag and
# union both streams, then one pass of last(ignoreNulls) over a window
# ordered so views sort before purchases at equal ts — the carried struct is
# the latest view with view_ts <= purchase_ts. One shuffle on user_id; no
# range join, no per-group loop. DuckDB oracle uses LATERAL top-1 (not ASOF
# JOIN) so tie-breaking on (ts, event_id) is explicit and deterministic.
_ASOF_ORACLE = """
SELECT p.event_id, p.user_id,
       date_diff('microsecond', v.ts, p.ts) AS micros_since_view,
       v.event_id AS view_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN LATERAL (
  SELECT ts, event_id
  FROM events v
  WHERE v.event_type = 'view' AND v.user_id = p.user_id AND v.ts <= p.ts
  ORDER BY v.ts DESC, v.event_id DESC
  LIMIT 1
) v ON TRUE
"""


@query("join_asof_events", oracle=_ASOF_ORACLE, tier=3)
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of: latest prior (or simultaneous) view for each purchase."""
    ev = load(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("purchase", "view")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(
            F.col("event_type") == "view",
            F.struct(F.col("ts").alias("vts"), F.col("event_id").alias("vid")),
        ).alias("view_info"),
    )
    # views first at equal ts (is_purchase 0 < 1), then event_id: the frame
    # up to current row therefore contains every view with vts <= ts.
    is_purchase = (F.col("event_type") == "purchase").cast("int")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", is_purchase, "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = tagged.withColumn(
        "last_view", F.last("view_info", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        (
            F.unix_micros("ts") - F.unix_micros(F.col("last_view.vts"))
        ).alias("micros_since_view"),
        F.col("last_view.vid").alias("view_event_id"),
    )


# --- join_q10_returns -------------------------------------------------------

_Q10_ORACLE = f"""
SELECT c_custkey, c_name, n_name,
       {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


@query("join_q10_returns", oracle=_Q10_ORACLE, tier=2)
def join_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue.

    Date filter pushed to the orders scan, returnflag filter pushed to the
    lineitem scan, nation broadcast, distributed top-20 via
    TakeOrderedAndProject (revenue DESC with a unique c_custkey tie-break
    so the LIMIT row set is deterministic)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# --- join_q18_big_orders ----------------------------------------------------

# The HAVING sum is exact on both engines: fixture quantities are
# integer-valued doubles (verified), so the >150 threshold cannot flip on
# reduction order and needs no quantization.
_Q18_ORACLE = f"""
SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {o_dsum("l_quantity", "sum_qty")}
FROM customer, orders, lineitem
WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
      )
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


@query("join_q18_big_orders", oracle=_Q18_ORACLE, tier=2)
def join_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-quantity orders with their customers.

    The HAVING subquery becomes an aggregated key set semi-joined back to
    the fact — both aggregations group on l_orderkey, so AQE plans the
    semi-join without re-shuffling lineitem a second time; top-100 is a
    TakeOrderedAndProject with a unique o_orderkey tie-break."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", "sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


# --- join_skew_salted -------------------------------------------------------

# A deliberately skewed fact (80% of events collapse onto one hot key) hash-
# joined to a dim WITHOUT broadcasting: the portable skew treatment is an
# explicit salt — the fact side splits its hot key across _N_SALT reducer
# partitions and the dim side replicates each key _N_SALT times (bounded:
# dims are small by definition). AQE's skew-join split handles this
# automatically for sort-merge joins; the explicit salt is the form that
# works on any engine version, keeps deterministic reducer sizing, and is
# what you reach for when the skew is in an aggregation key, not a join.
# The oracle is the plain unsalted join — salting must not change results.
_SKEW_ORACLE = f"""
SELECT CASE WHEN user_id % 10 < 8 THEN 1 ELSE user_id END AS k,
       c_mktsegment,
       COUNT(*) AS n_events,
       {o_dsum("value", "sum_value")}
FROM events JOIN customer
  ON c_custkey = (CASE WHEN user_id % 10 < 8 THEN 1 ELSE user_id END)
GROUP BY k, c_mktsegment
"""

_N_SALT = 8


@query("join_skew_salted", oracle=_SKEW_ORACLE, tier=3)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe shuffle join: salt the hot fact key, replicate the dim."""
    ev = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer")
    hot = F.when(F.col("user_id") % 10 < 8, F.lit(1)).otherwise(
        F.col("user_id")
    ).cast("long")
    fact = ev.select(
        hot.alias("k"),
        "value",
        # deterministic per-row salt: the hot key's rows spread over
        # _N_SALT reducer partitions instead of one
        F.pmod(F.xxhash64("event_id"), F.lit(_N_SALT)).alias("salt"),
    )
    dim = c.select(F.col("c_custkey").alias("k"), "c_mktsegment").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_N_SALT - 1)))
    )
    # shuffle_hash hint: without it the planner would broadcast this small
    # dim and hide the skew path the operator exists to demonstrate
    joined = fact.join(dim.hint("shuffle_hash"), ["k", "salt"])
    return joined.groupBy("k", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "sum_value"),
    )


# --- join_q4_exists ---------------------------------------------------------

# TPC-H Q4 shape adapted to the fixture schema (no l_commitdate /
# l_receiptdate columns -> the EXISTS predicate uses returned lineitems;
# fixture dates span 1995-2001 -> the quarter window is 1996-Q3).
_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority
"""


@query("join_q4_exists", oracle=_Q4_ORACLE, tier=2)
def join_q4_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS subquery through the SQL surface.
    Catalyst rewrites the EXISTS into a left-semi hash join on l_orderkey
    with the date filter pushed to the orders scan — the subquery never
    materializes per-row (no nested-loop re-execution), so the plan is the
    same one the DataFrame semi-join API would produce at any scale."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM {o}
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (
            SELECT 1 FROM {li}
            WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
          )
        GROUP BY o_orderpriority
        """,
        o=o,
        li=li,
    )


# --- join_not_in_subquery ---------------------------------------------------

_NOT_IN_ORACLE = """
SELECT p_partkey, p_name, p_retailprice
FROM part
WHERE p_partkey NOT IN (
  SELECT l_partkey FROM lineitem
  WHERE l_returnflag = 'R' AND l_quantity >= 45
)
"""


@query("join_not_in_subquery", oracle=_NOT_IN_ORACLE, tier=2)
def join_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery: parts never shipped in a large returned lineitem.
    NOT IN is null-aware (one NULL in the subquery empties the result), so
    Catalyst plans a null-aware anti join rather than a plain left-anti —
    the SQL surface is the point; semantics checked against DuckDB."""
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_retailprice
        FROM {p}
        WHERE p_partkey NOT IN (
          SELECT l_partkey FROM {li}
          WHERE l_returnflag = 'R' AND l_quantity >= 45
        )
        """,
        p=p,
        li=li,
    )


# --- join_q7_volume ---------------------------------------------------------

# TPC-H Q7 shape (volume shipping): the same dimension table joined TWICE
# under different roles (supplier nation vs customer nation) with a
# symmetric two-nation predicate — the self-aliased-dimension pattern Q5 /
# join_star_5way doesn't cover. Nations adapted to the fixture's synthetic
# names; year bucket from l_shipdate.
_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey
  AND o_orderkey = l_orderkey
  AND c_custkey = o_custkey
  AND s_nationkey = n1.n_nationkey
  AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
GROUP BY supp_nation, cust_nation, ship_year
"""


@query("join_q7_volume", oracle=_Q7_ORACLE, tier=2)
def join_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations): the nation
    dimension joins twice under different aliases (supplier side vs
    customer side) with a symmetric OR predicate across the pair. Both
    nation sides broadcast; the nation filters cut supplier/customer
    BEFORE the fact joins, so the fact side shuffles pre-filtered —
    the plan that survives 100 TB. Revenue is decimal-quantized."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    sn = s.join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
    cn = c.join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
    return (
        li.join(sn, li.l_suppkey == sn.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cn, o.o_custkey == cn.c_custkey)
        .filter(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_7")
            )
            | (
                (F.col("supp_nation") == "NATION_7")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# --- join_scalar_subquery ---------------------------------------------------

_SCALAR_SUB_ORACLE = """
SELECT o_orderkey, o_totalprice,
       (SELECT MAX(l_extendedprice) FROM lineitem
        WHERE l_orderkey = o_orderkey) AS max_item_price,
       (SELECT COUNT(*) FROM lineitem
        WHERE l_orderkey = o_orderkey) AS n_items
FROM orders
WHERE o_totalprice > 400000
"""


@query("join_scalar_subquery", oracle=_SCALAR_SUB_ORACLE, tier=2)
def join_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries in the projection: per-order max item
    price and item count. Catalyst de-correlates each into an aggregate +
    left-outer join (one shuffle per subquery, merged under AQE) — never a
    per-row re-execution, so the SQL sugar costs the same as the manual
    join+agg at any scale."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               (SELECT MAX(l_extendedprice) FROM {li}
                WHERE l_orderkey = o_orderkey) AS max_item_price,
               (SELECT COUNT(*) FROM {li}
                WHERE l_orderkey = o_orderkey) AS n_items
        FROM {o}
        WHERE o_totalprice > 400000
        """,
        o=o,
        li=li,
    )


# --- join_bucketed ----------------------------------------------------------

_BUCKETED_ORACLE = f"""
SELECT c_mktsegment, COUNT(*) AS n_orders, {o_dsum("o_totalprice", "sum_price")}
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@query("join_bucketed", oracle=_BUCKETED_ORACLE, tier=3)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join via bucketed tables — the 100 TB answer
    to repeated fact⋈fact joins on the same key: both sides are written
    ``bucketBy(8, custkey)`` + in-bucket sort, so the join reads
    bucket i ⋈ bucket i directly and the plan contains NO Exchange on
    either side (asserted in tests/test_round3.py). At scale this is the
    difference between re-shuffling 100 TB per join and shuffling once at
    write time, amortized over every subsequent join on that key.

    Implementation notes: ``bucketBy`` requires the table catalog, so both
    sides land as named external tables under a scratch path (overwritten
    idempotently per run). Buckets are also written pre-sorted (one file
    per bucket via an aligned repartition); Spark >=3.0 still re-sorts
    below SMJ unless spark.sql.legacy.bucketedTableScan.outputOrdering is
    set, but that sort runs over already-sorted runs — the expensive part,
    the shuffle, is gone.
    """
    import os
    import tempfile

    out = os.path.join(
        tempfile.gettempdir(),
        "bdl_bucketed_" + os.path.basename(sf_dir.rstrip("/")),
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    for name, df, key in (
        ("bdl_orders_bucketed", o, "o_custkey"),
        ("bdl_customer_bucketed", c, "c_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            # repartition on the bucket key first: HashPartitioning and the
            # bucket spec share the same murmur3-pmod function, so each
            # writer task holds exactly one bucket -> ONE file per bucket,
            # which is the precondition for Spark to trust sortBy() and
            # drop the Sort below the join as well
            df.repartition(8, F.col(key))
            .write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", os.path.join(out, name))
            .saveAsTable(name)
        )
    ob = spark.table("bdl_orders_bucketed")
    # merge hint: at fixture size Catalyst would (correctly) broadcast the
    # small side, which hides the bucket path this operator demonstrates;
    # the hint pins the SMJ fact⋈fact shape whose buckets align 1:1
    cb = spark.table("bdl_customer_bucketed").hint("merge")
    return (
        ob.join(cb, ob.o_custkey == cb.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "sum_price"),
        )
    )


# --- join_q12_priority ------------------------------------------------------

_Q12_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
"""


@query("join_q12_priority", oracle=_Q12_ORACLE, tier=2)
def join_q12_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact⋈fact join + conditional counts per bucket
    (returnflag stands in for the fixture's missing shipmode column). The
    join carries only the two columns the aggregate needs, the CASE counts
    combine map-side, and output is bounded by bucket cardinality."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- join_q19_bracket -------------------------------------------------------

_Q19_ORACLE = f"""
SELECT {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


@query("join_q19_bracket", oracle=_Q19_ORACLE, tier=2)
def join_q19_bracket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive bracket predicates across both join
    sides. Catalyst splits the OR: the part-only conjuncts
    (brand IN (...)) and lineitem-only conjuncts (quantity ranges) are
    derivable as single-side filters pushed BELOW the join, so each scan
    prunes before shuffling; the full bracket predicate is re-applied
    above. That pre-join pruning is the difference between joining 3
    brands' parts and joining the whole table at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(bracket)
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- join_q2_min_cost -------------------------------------------------------

# TPC-H Q2's correlated-min shape, adapted to the fixture schema (no
# partsupp table): the part-supplier cost bridge is min(l_extendedprice)
# per (partkey, suppkey) from lineitem. Ties at the per-part minimum keep
# every achieving supplier (same as Q2), so the row set is deterministic
# without ORDER BY. The min costs are raw parquet doubles compared for
# equality — no arithmetic, so both engines agree bitwise.
_Q2_ORACLE = """
WITH cost AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey AS b_partkey, MIN(cost) AS min_cost
  FROM cost GROUP BY l_partkey
)
SELECT p_partkey, p_name, s_name, n_name, min_cost
FROM part
JOIN best ON p_partkey = b_partkey
JOIN cost ON cost.l_partkey = b_partkey AND cost.cost = min_cost
JOIN supplier ON s_suppkey = cost.l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_size <= 10
"""


@query("join_q2_min_cost", oracle=_Q2_ORACLE, tier=2)
def join_q2_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part — a correlated scalar
    subquery (min cost over the part's suppliers), DECORRELATED the way
    Catalyst would: aggregate the bridge once per (part, supplier), derive
    the per-part minimum in a second aggregation, and equi-join back to
    keep the achieving suppliers. Both aggregations and the re-join hash
    on partkey, so the bridge shuffles once and the rest co-partitions;
    supplier and nation broadcast. At 100 TB this is two map-side-combined
    aggregations plus one co-partitioned join — never a per-part probe."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("cost")
    )
    best = cost.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("cost").alias("min_cost")
    )
    achieving = cost.join(
        best,
        (cost.l_partkey == best.b_partkey) & (cost.cost == best.min_cost),
    ).select("l_partkey", "l_suppkey", "min_cost")
    return (
        achieving.join(p, achieving.l_partkey == p.p_partkey)
        .join(F.broadcast(s), achieving.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("p_partkey", "p_name", "s_name", "n_name", "min_cost")
    )


# --- join_q13_distribution --------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


@query("join_q13_distribution", oracle=_Q13_ORACLE, tier=2)
def join_q13_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution. The outer join
    keeps order-less customers (COUNT of the null-extended side is 0, not
    1 — the classic outer-join-count trap), the join-side filter rides ON
    the join condition so it prunes orders BEFORE the join without turning
    the outer join inner. Two aggregations: per-customer counts hash on
    custkey (co-partitioned with the join), then the tiny distribution
    aggregate. The distribution's key space is O(max orders/customer) —
    a few hundred rows at any corpus scale."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --- join_q15_top_supplier --------------------------------------------------

_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {o_dsum("l_extendedprice * (1 - l_discount)", "total_revenue")}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@query("join_q15_top_supplier", oracle=_Q15_ORACLE, tier=2)
def join_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the top-revenue supplier for a quarter, via a
    reused derived view (revenue per supplier) and a scalar MAX subquery.
    The revenue frame is computed ONCE and persisted (Q15's CREATE VIEW),
    feeding both the max aggregate and the equality filter; revenue is a
    decimal-quantized sum, so the max-equality join is exact on both
    engines and ties keep every achieving supplier. The scalar max is a
    1-row aggregate broadcast back — O(tasks) partials, never a global
    sort."""
    from ..session import scoped_persist

    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = scoped_persist(
        li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "total_revenue",
            )
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    s = load(spark, sf_dir, "supplier")
    return (
        revenue.join(
            F.broadcast(max_rev), F.col("total_revenue") == F.col("max_rev")
        )
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- join_q21_waiting -------------------------------------------------------

# TPC-H Q21's EXISTS / NOT-EXISTS shape, adapted to the fixture schema
# (no l_receiptdate/l_commitdate): a line is "late" when it shipped more
# than 60 days after the order date. numwait counts l1 rows, i.e. each
# late LINE of the blamed supplier, not each order — mirrored in the
# aggregate decomposition below.
_Q21_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT * FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT * FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 10
"""


@query("join_q21_waiting", oracle=_Q21_ORACLE, tier=3)
def join_q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier in a
    multi-supplier order. The correlated EXISTS + NOT-EXISTS pair over
    lineitem self-joins is decorrelated into per-(order, supplier) late
    counts plus a per-order rollup (supplier count, late-supplier count) —
    one lineitem x orders shuffle join plus two hash aggregations on
    orderkey, instead of two additional lineitem self-joins. A supplier's
    late lines count when the order is 'F', has >1 supplier, and exactly
    one late supplier (them). Top-10 via TakeOrderedAndProject with s_name
    tie-break."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    s = load(spark, sf_dir, "supplier")
    from ..session import scoped_persist

    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    # persisted: the (order, supplier) frame feeds BOTH the per-order
    # rollup and the blame filter — without the persist the lineitem x
    # orders join and its aggregation execute twice (measured ~2x cost)
    per_os = scoped_persist(
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey", "o_orderstatus")
        .agg(F.count(F.when(late, 1)).alias("late_lines"))
    )
    # per-order rollup as an UNORDERED window over the persisted frame
    # instead of a groupBy + join-back: the window needs ONE orderkey
    # exchange where the old shape paid the aggregate's exchange AND
    # re-shuffled per_os for the join (guide §2.4 — two operations keyed
    # the same way share one exchange; r13). Same exact integer counts.
    from pyspark.sql import Window as W

    w_o = W.partitionBy("l_orderkey")
    blamed = (
        per_os.withColumn("n_supp", F.count(F.lit(1)).over(w_o))
        .withColumn(
            "n_late_supp",
            F.sum((F.col("late_lines") > 0).cast("int")).over(w_o),
        )
        .filter((F.col("late_lines") > 0) & (F.col("o_orderstatus") == "F"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        blamed.join(F.broadcast(s), blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("late_lines").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


# --- join_q22_balance -------------------------------------------------------

# TPC-H Q22 shape, adapted (no c_phone): "country code" is the nation key,
# and "never placed an order" becomes "never placed an URGENT order" (every
# fixture customer has orders). The avg-balance cutoff is decimal-quantized
# (o_davg/davg) so the > comparison binds identically on both engines.
_Q22_ORACLE = f"""
WITH cutoff AS (
  SELECT {o_davg("c_acctbal", "avg_bal")} FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, COUNT(*) AS numcust, {o_dsum("c_acctbal", "totacctbal")}
FROM customer, cutoff
WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  AND c_acctbal > avg_bal
  AND NOT EXISTS (
    SELECT * FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY c_nationkey
"""


@query("join_q22_balance", oracle=_Q22_ORACLE, tier=2)
def join_q22_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: high-balance customers in selected nations with no
    urgent orders. Three classic pieces in one plan: a scalar AVG subquery
    (1-row aggregate broadcast against the fact side — O(tasks) partials,
    flagged-and-justified BNLJ), a NOT EXISTS decorrelated to a left-anti
    join on custkey, and a small grouped aggregate. The anti join's right
    side is pre-filtered to urgent orders only, so its build input is a
    fraction of the orders table before any shuffle."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    cutoff = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0.0)
        .agg(davg("c_acctbal", "avg_bal"))
    )
    rich = c.crossJoin(F.broadcast(cutoff)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    no_urgent = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return no_urgent.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        dsum("c_acctbal", "totacctbal"),
    )


# --- join_asof_native -------------------------------------------------------

# Native merge-asof variant of join_asof_events: per-user pandas
# merge_asof with a 1-hour tolerance (the attribution window), exercising
# the applyInPandas path the way a ports-of-pandas pipeline would. The
# DuckDB oracle is the LATERAL top-1 with the same window bound.
_ASOF_NATIVE_ORACLE = """
SELECT p.event_id, p.user_id,
       v.event_id AS view_event_id,
       date_diff('microsecond', v.ts, p.ts) AS micros_since_view
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN LATERAL (
  SELECT ts, event_id
  FROM events v
  WHERE v.event_type = 'view' AND v.user_id = p.user_id
    AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
  ORDER BY v.ts DESC, v.event_id DESC
  LIMIT 1
) v ON TRUE
"""


def _merge_asof_group(pdf):
    """Bucket-level merge_asof: most recent view within 1h before each
    purchase, for EVERY user in the bucket in one call (``by="user_id"``).
    Frames sort by (ts, event_id) so merge_asof's last-match tie-break
    picks the max event_id at equal ts, matching the oracle's ORDER BY
    ... DESC; the by-key keeps users independent."""
    import pandas as pd

    purchases = (
        pdf[pdf["event_type"] == "purchase"]
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    views = (
        pdf[pdf["event_type"] == "view"]
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
        .rename(columns={"ts": "view_ts", "event_id": "view_event_id"})
    )
    merged = pd.merge_asof(
        purchases,
        views[["user_id", "view_ts", "view_event_id"]],
        left_on="ts",
        right_on="view_ts",
        by="user_id",
        direction="backward",
        tolerance=pd.Timedelta(hours=1),
        allow_exact_matches=True,
    )
    out = merged[["event_id", "user_id"]].copy()
    out["view_event_id"] = merged["view_event_id"].astype("Int64")
    delta = (merged["ts"] - merged["view_ts"]).dt.total_seconds() * 1_000_000
    out["micros_since_view"] = delta.round().astype("Int64")
    return out


@query("join_asof_native", oracle=_ASOF_NATIVE_ORACLE, tier=3)
def join_asof_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, pandas-native path: ``applyInPandas`` over user_id
    groups running ``pd.merge_asof`` (backward, 1-hour tolerance) — the
    complement to join_asof_events' union+window form. One shuffle on
    user_id; inside each group the merge is the textbook two-pointer scan
    over the sorted arrays (O(n log n) for the sort, O(n) merge). At
    100 TB the win over the window form is constant-factor (Arrow batches,
    no carried struct column); the cost is the Python worker hop —
    measured, not guessed, in the bench. The shuffle key is a 64-way
    user-hash BUCKET, not the raw user: one pandas call with by="user_id"
    then serves every user in the bucket (10.4 s -> ~1.5 s at sf0.1 —
    per-call overhead dominates thousands of tiny groups; at 100 TB the
    bucket count scales with cores, keeping Arrow batches big). Skew
    note: a hot user still lands one bucket; salting by time-slice with
    boundary overlap would bound it (same trick as
    ext_neardup_embedding's block tiles)."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select("event_id", "user_id", "ts", "event_type")
    )
    return ev.groupBy(
        F.pmod(F.xxhash64("user_id"), F.lit(64)).alias("_bucket")
    ).applyInPandas(
        _merge_asof_group,
        "event_id bigint, user_id bigint, view_event_id bigint, "
        "micros_since_view bigint",
    )


# --- join_skew_aqe ----------------------------------------------------------

# Same skewed shape and oracle as join_skew_salted: AQE's runtime skew
# split must not change results either.
_SKEW_AQE_ORACLE = f"""
SELECT CASE WHEN user_id % 10 < 8 THEN 1 ELSE user_id END AS k,
       c_mktsegment,
       COUNT(*) AS n_events,
       {o_dsum("value", "sum_value")}
FROM events JOIN customer
  ON c_custkey = (CASE WHEN user_id % 10 < 8 THEN 1 ELSE user_id END)
GROUP BY k, c_mktsegment
"""


def _skew_aqe_confs() -> dict[str, str]:
    """AQE skew-split regime for the demonstration: thresholds lowered to
    fixture scale (production keeps the 256 MB default — the MECHANISM is
    what scales, these numbers are the fixture's), broadcast off so the
    small dim cannot hide the skewed sort-merge path."""
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }


def _skew_aqe_joined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skewed sort-merge join frame (un-aggregated). Factored so the
    plan-pin test can execute it under the same confs and assert the
    runtime plan carries ``skew=true`` on the join."""
    ev = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer")
    hot = F.when(F.col("user_id") % 10 < 8, F.lit(1)).otherwise(
        F.col("user_id")
    ).cast("long")
    # widen first: AQE splits a skewed reduce partition by MAPPER ranges,
    # and the single-row-group fixture scan is ONE map task — unsplittable
    # by construction. Production fact scans have thousands of mappers;
    # the repartition stands in for that (and is itself the map stage the
    # join shuffle reads from).
    from ..session import widen_scan

    fact = widen_scan(ev).select(hot.alias("k"), "value")
    dim = c.select(F.col("c_custkey").alias("k"), "c_mktsegment")
    return fact.join(dim.hint("merge"), "k")


@query("join_skew_aqe", oracle=_SKEW_AQE_ORACLE, tier=3)
def join_skew_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime skew handling, AQE edition (the automatic complement to
    join_skew_salted's manual salt): the same 80%-hot-key join runs as a
    plain sort-merge join and Adaptive Query Execution SPLITS the skewed
    partition at runtime from measured map-output sizes — the fact rows
    of the hot key fan out over multiple reducer tasks, each matched
    against a replicated copy of the dim's hot rows. Same cure as
    salting, zero query rewrite, decided from real statistics instead of
    a hand-chosen salt width; tests/test_round10.py pins ``skew=true``
    on the executed join. The manual salt remains the portable form (and
    the only option when the skew is in an aggregation key) — the two
    keys document the trade explicitly, and both must equal the plain
    oracle join.

    Execution-scoped config: AQE settings are read at EXECUTION time,
    so the join materializes to scratch INSIDE the conf_override (the
    sink keys' write-then-readback discipline — a lazily returned frame
    would execute after the override restored) with fixture-scale
    thresholds; the declared result aggregates the readback. At 100 TB
    the defaults (256 MB threshold) do this untouched — hot keys in a
    petabyte join are exactly what this machinery exists for."""
    from ..sources.connectors import scratch_dir

    out = scratch_dir(sf_dir, "skew_aqe_joined")
    with conf_override(spark, _skew_aqe_confs()):
        _skew_aqe_joined(spark, sf_dir).write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("k", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "sum_value"),
    )


# --- join_runtime_bloom -------------------------------------------------------

# Plain join semantics: the runtime bloom filter is a pure pruning
# optimization and must not change results.
_RUNTIME_BLOOM_ORACLE = f"""
SELECT l_returnflag,
       COUNT(*) AS n_lines,
       {o_dsum("l_extendedprice", "sum_price")}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag
"""


def _runtime_bloom_confs() -> dict[str, str]:
    """Runtime-filter regime for the demonstration: thresholds lowered to
    fixture scale so InjectRuntimeFilter fires on a KB-sized join
    (production keeps the 10 MB / 10 GB defaults — a petabyte fact joined
    to a filtered multi-GB dim is exactly the default regime); broadcast
    off because a broadcast join prunes via DPP/locality already and the
    bloom path exists for the SHUFFLE join that big-dim joins actually
    plan. Semi-join reduction stays off so the pin isolates the bloom
    mechanism rather than the InSubquery variant."""
    return {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "64MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }


def _runtime_bloom_joined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The un-aggregated filtered join frame. Factored so the plan-pin test
    can execute it under the same confs and assert ``might_contain`` /
    ``bloom_filter_agg`` appear in the executed plan."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_returnflag", "l_extendedprice"
    )


@query("join_runtime_bloom", oracle=_RUNTIME_BLOOM_ORACLE, tier=3)
def join_runtime_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning (InjectRuntimeFilter) — the
    row-level complement to scan_dpp's partition-level pruning: the dim
    side's filtered join keys are folded into a bloom filter
    (``bloom_filter_agg``) BEFORE the shuffle, and Catalyst plants a
    ``might_contain`` probe on the fact side's scan stage, so fact rows
    that cannot match never enter the exchange. scan_dpp needs the
    pruning column to BE the partition column; this works on any join
    key, which is what saves the shuffle when a 100 TB fact joins a
    selective non-partition dim filter (the filtered orders here keep
    ~20% of keys, so ~80% of fact bytes drop pre-shuffle). The probe is
    a false-positive-only filter, so results are identical to the plain
    join — the oracle is the unoptimized join verbatim.

    Execution-scoped config, same discipline as join_skew_aqe: the
    optimizer rule runs at action time, so the join materializes to
    scratch INSIDE the conf_override and the declared result aggregates
    the readback. tests/test_round10.py pins both plan markers."""
    from ..sources.connectors import scratch_dir

    out = scratch_dir(sf_dir, "runtime_bloom_joined")
    with conf_override(spark, _runtime_bloom_confs()):
        _runtime_bloom_joined(spark, sf_dir).write.mode("overwrite").parquet(
            out
        )
    back = spark.read.parquet(out)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum("l_extendedprice", "sum_price"),
    )


# --- join_range_bucketed ------------------------------------------------------

#: Probe-side slice (the doc_id%97 benchmark-slice idiom): a pure-range
#: join's output is per-probe, so the declared result stays bounded while
#: the build side remains the FULL view stream.
_RB_SLICE = 97

#: Bucket width in seconds == the range width, so a probe's window spans
#: at most two buckets and each (probe, view) candidate pair meets in
#: EXACTLY one bucket (a view lives in one bucket; the probe explodes).
_RB_BUCKET_S = 3600

_RANGE_BUCKETED_ORACLE = f"""
WITH p AS (
  SELECT event_id, ts FROM events
  WHERE event_type = 'purchase' AND event_id % {_RB_SLICE} = 0
),
v AS (
  SELECT ts, value FROM events WHERE event_type = 'view'
),
m AS (
  SELECT p.event_id,
         COUNT(v.ts) AS n_views,
         COALESCE(SUM(CAST(floor(v.value * 1e2 + CAST(0.5 AS DOUBLE))
                           AS BIGINT)), 0) AS cents
  FROM p LEFT JOIN v
    ON v.ts > p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
  GROUP BY p.event_id
)
SELECT event_id,
       CAST(n_views AS BIGINT) AS n_views_1h,
       CAST(cents AS BIGINT) AS view_cents_1h
FROM m
"""


@query("join_range_bucketed", oracle=_RANGE_BUCKETED_ORACLE, tier=2)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURE-range interval join (no equi key at all — unlike
    join_interval, whose orderkey carries the hash join) decomposed into
    an EQUI-join via time bucketing — the mechanism that keeps an
    any-to-any temporal join off the BNLJ/cartesian path at scale: how
    many views (across ALL users) preceded each sampled purchase within
    one hour, and their value volume. Views bucket once by
    floor(epoch/{_RB_BUCKET_S}); each probe explodes to its own bucket
    and the previous one (bucket width == range width, so the window
    spans at most two buckets and every candidate pair meets in exactly
    one — no post-join dedup); the exact (p.ts − 1h, p.ts] predicate
    runs as a residual filter on the equi-matched pairs.

    Shape: ONE equi shuffle keyed on the bucket (Spark plans a hash
    join — the no-BNLJ pin lives in tests/test_round11b.py) plus the
    2x probe-side explode; the naive form is a nested-loop scan of
    every view per probe, which is exactly what a planner does with a
    pure theta join at 100 TB. Bucket skew (a flash-crowd hour)
    inherits the AQE skew-split story join_skew_aqe pins. Zero-match
    probes survive via the final left join against the probe list
    (declared output is per-probe, COALESCEd to 0)."""
    ev = load(spark, sf_dir, "events")
    probes = ev.filter(
        (F.col("event_type") == "purchase")
        & (F.col("event_id") % _RB_SLICE == 0)
    ).select("event_id", F.col("ts").alias("p_ts"))
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("ts").alias("v_ts"),
        quantize_long("value", 2).alias("v_cents"),
        F.floor(F.col("ts").cast("long") / _RB_BUCKET_S).alias("bkt"),
    )
    pb = probes.select(
        "event_id",
        "p_ts",
        F.explode(
            F.array(
                F.floor(F.col("p_ts").cast("long") / _RB_BUCKET_S),
                F.floor(F.col("p_ts").cast("long") / _RB_BUCKET_S) - 1,
            )
        ).alias("bkt"),
    )
    matched = (
        pb.join(views, "bkt")
        .filter(
            F.expr("v_ts > p_ts - INTERVAL 1 HOUR AND v_ts <= p_ts")
        )
        .groupBy("event_id")
        .agg(
            F.count(F.lit(1)).alias("n_views"),
            F.sum("v_cents").alias("cents"),
        )
    )
    return (
        probes.select("event_id")
        .join(matched, "event_id", "left")
        .select(
            "event_id",
            F.coalesce("n_views", F.lit(0)).alias("n_views_1h"),
            F.coalesce("cents", F.lit(0)).alias("view_cents_1h"),
        )
    )


# --- join_asof_tolerance --------------------------------------------------------

#: As-of match window: a view older than 30 minutes does not explain a
#: purchase (the pandas merge_asof `tolerance` / kdb wj window semantics).
_ASOF_TOL_MICROS = 30 * 60 * 1_000_000

_ASOF_TOL_ORACLE = f"""
SELECT p.event_id, p.user_id,
       CASE WHEN date_diff('microsecond', v.ts, p.ts)
                 <= {_ASOF_TOL_MICROS}
            THEN date_diff('microsecond', v.ts, p.ts) END
         AS micros_since_view,
       CASE WHEN date_diff('microsecond', v.ts, p.ts)
                 <= {_ASOF_TOL_MICROS}
            THEN v.event_id END AS view_event_id,
       COALESCE(date_diff('microsecond', v.ts, p.ts)
                <= {_ASOF_TOL_MICROS}, FALSE) AS matched
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN LATERAL (
  SELECT ts, event_id
  FROM events v
  WHERE v.event_type = 'view' AND v.user_id = p.user_id AND v.ts <= p.ts
  ORDER BY v.ts DESC, v.event_id DESC
  LIMIT 1
) v ON TRUE
"""


@query("join_asof_tolerance", oracle=_ASOF_TOL_ORACLE, tier=3)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match TOLERANCE (pandas merge_asof(tolerance=),
    kdb wj): each purchase takes its latest prior view only if it
    happened within 30 minutes — staler views null out and the purchase
    reports matched = false. The post-filter form is exactly equivalent
    to a bounded-window search for a top-1 match (if the LATEST prior
    view is out of tolerance, every older one is too), so the plan stays
    join_asof_events' single user-keyed carried-struct window — no range
    join, no per-group loop, and the tolerance costs zero extra shuffles
    at any scale.

    Exactness: the gap is exact integer microseconds; the tolerance test
    is an integer comparison; tie-breaks on (ts, event_id) as in the
    sibling."""
    ev = load(spark, sf_dir, "events")
    tagged = ev.filter(
        F.col("event_type").isin("purchase", "view")
    ).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(
            F.col("event_type") == "view",
            F.struct(
                F.col("ts").alias("vts"), F.col("event_id").alias("vid")
            ),
        ).alias("view_info"),
    )
    is_purchase = (F.col("event_type") == "purchase").cast("int")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", is_purchase, "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = tagged.withColumn(
        "last_view", F.last("view_info", ignorenulls=True).over(w)
    )
    gap = F.unix_micros("ts") - F.unix_micros(F.col("last_view.vts"))
    in_tol = gap <= F.lit(_ASOF_TOL_MICROS)
    return carried.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.when(in_tol, gap).alias("micros_since_view"),
        F.when(in_tol, F.col("last_view.vid")).alias("view_event_id"),
        F.coalesce(in_tol, F.lit(False)).alias("matched"),
    )


# --- join_lateral_topk ----------------------------------------------------------

_LATERAL_ORACLE = """
SELECT n.n_name, c.c_custkey, c.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2
) c
"""


@query("join_lateral_topk", oracle=_LATERAL_ORACLE, tier=1)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY ... LIMIT —
    the top-2 customers by account balance FOR EACH nation, expressed
    as the ANSI lateral join both engines now support (Spark 3.4+
    lateral correlated subqueries; the declared SQL surface a user
    migrating per-group-top-k queries brings verbatim). Same result
    set as the win_topk_per_group rank<=k form — this key pins the
    LATERAL syntax path specifically, including the deterministic
    (balance desc, custkey) tie-break inside the lateral.

    Exactness: membership is an integer rank decision inside each
    lateral; emitted columns are raw fixture values — no float
    arithmetic at all.

    Shape: Catalyst DECORRELATES the lateral into a partitioned rank
    window over customer (explain shows Window + filter, not a
    nested-loop re-execution per nation row) — exactly the
    win_topk_per_group physical plan, which is the correct 100 TB
    shape: one exchange on the correlation key, rank, filter. The
    lateral syntax costs nothing over the window form once optimized."""
    from ..session import prep

    spark = prep(spark)
    load(spark, sf_dir, "nation").createOrReplaceTempView("bdl_lat_nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView(
        "bdl_lat_customer"
    )
    return spark.sql(
        """
        SELECT n.n_name, c.c_custkey, c.c_acctbal
        FROM bdl_lat_nation n, LATERAL (
          SELECT c_custkey, c_acctbal FROM bdl_lat_customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2
        ) c
        """
    )
