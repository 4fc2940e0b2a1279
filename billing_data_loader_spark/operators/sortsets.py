"""Sort / limit / set operators (SURVEY.md §2.6).

Determinism: any LIMIT carries a total order with a unique tie-break, else
the selected row set itself is nondeterministic (SURVEY §2 discipline).
Spark turns orderBy+limit into TakeOrderedAndProject — no global sort is
materialized, which is exactly the 100 TB-safe plan (per-partition top-K,
then K*partitions merged on the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import load

# --- sort_limit_topk --------------------------------------------------------

_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


@query("sort_limit_topk", oracle=_TOPK_ORACLE, tier=1)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key order + limit (TakeOrderedAndProject)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# --- sort_nulls_order -------------------------------------------------------

# NULLs injected (fixtures have none); hash compare is order-insensitive, so
# the NULLS FIRST/LAST semantics are exposed via a LIMIT over the null-first
# ordering — the *membership* of the result proves the null placement.
_NULLS_ORACLE = """
SELECT c_custkey, bal FROM (
  SELECT c_custkey,
         CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
  FROM customer
)
ORDER BY bal DESC NULLS FIRST, c_custkey
LIMIT 50
"""


@query("sort_nulls_order", oracle=_NULLS_ORACLE, tier=3)
def sort_nulls_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST ordering (membership-checked via LIMIT)."""
    c = load(spark, sf_dir, "customer")
    bal = F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal"))
    return (
        c.select("c_custkey", bal.alias("bal"))
        .orderBy(F.col("bal").desc_nulls_first(), F.col("c_custkey"))
        .limit(50)
    )


# --- set_union_all ----------------------------------------------------------

_UNION_ALL_ORACLE = """
SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
UNION ALL
SELECT event_id, event_type, value FROM events WHERE value > 400
"""


@query("set_union_all", oracle=_UNION_ALL_ORACLE, tier=2)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two overlapping slices (duplicates preserved)."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.filter(F.col("event_type") == "click").unionAll(
        ev.filter(F.col("value") > 400)
    )


# --- set_union_distinct -----------------------------------------------------

_UNION_DIST_ORACLE = """
SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
UNION
SELECT event_id, event_type, value FROM events WHERE value > 400
"""


@query("set_union_distinct", oracle=_UNION_DIST_ORACLE, tier=2)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT of the same overlapping slices."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return (
        ev.filter(F.col("event_type") == "click")
        .union(ev.filter(F.col("value") > 400))
        .distinct()
    )


# --- set_intersect ----------------------------------------------------------

_INTERSECT_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_totalprice > 150000
"""


@query("set_intersect", oracle=_INTERSECT_ORACLE, tier=2)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of two customer-key sets."""
    o = load(spark, sf_dir, "orders")
    open_orders = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    big_orders = o.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    return open_orders.intersect(big_orders)


# --- set_except -------------------------------------------------------------

_EXCEPT_ORACLE = """
SELECT o_custkey FROM orders
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


@query("set_except", oracle=_EXCEPT_ORACLE, tier=2)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers with orders but no F-status orders."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_custkey")
        .subtract(o.filter(F.col("o_orderstatus") == "F").select("o_custkey"))
    )


# --- set_symmetric_diff ---------------------------------------------------------

#: The two order cohorts compared: the 1995 calendar year vs the
#: even-customer slice — deliberately overlapping so all three regions
#: (a-only, b-only, both-excluded) are non-trivial.
_SYM_A = "year(o_orderdate) = 1995"
_SYM_B = "o_custkey % 2 = 0"

_SYMDIFF_ORACLE = f"""
SELECT o_orderkey, side, o_totalprice FROM (
  SELECT o_orderkey, 'a_only' AS side, o_totalprice
  FROM orders WHERE ({_SYM_A}) AND NOT ({_SYM_B})
  UNION ALL
  SELECT o_orderkey, 'b_only' AS side, o_totalprice
  FROM orders WHERE ({_SYM_B}) AND NOT ({_SYM_A})
)
"""


@query("set_symmetric_diff", oracle=_SYMDIFF_ORACLE, tier=2)
def set_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference of two order cohorts (1995 orders vs
    even-customer orders), each surviving row tagged with its side —
    the reconciliation primitive behind snapshot diffs and A/B cohort
    audits that completes the §2.6 set-op family (union / intersect /
    except cover three of the four regions; this is the fourth). The
    cohorts are predicate-defined slices of ONE table, so the plan is
    two anti-joins' worth of semantics with ZERO joins: each side's
    membership test is the other side's predicate evaluated map-side.

    Exactness: integer keys and exact predicate membership; prices pass
    through untouched.

    Shape: one scan, two complementary map-side filters unioned — at
    100 TB this is a single pass with both predicates pushed to the
    parquet scan; the general two-TABLE symmetric diff swaps in a
    full-outer null-test join on the key (set_except's documented
    sibling)."""
    o = load(spark, sf_dir, "orders")
    a_pred = F.expr(_SYM_A)
    b_pred = F.expr(_SYM_B)
    a_only = o.filter(a_pred & ~b_pred).select(
        "o_orderkey", F.lit("a_only").alias("side"), "o_totalprice"
    )
    b_only = o.filter(b_pred & ~a_pred).select(
        "o_orderkey", F.lit("b_only").alias("side"), "o_totalprice"
    )
    return a_only.unionAll(b_only)
