"""Projection / filter / row-level operators (SURVEY.md §2.2 + scan_parquet).

These mirror the reference's transform stage (type casts, derived columns,
row dedup for idempotency). All per-row expressions are pure double/string
arithmetic — bit-identical across engines, no quantization needed. Filters
and projections are written directly over the scan so Catalyst pushes
predicates and prunes columns into the parquet reader (the property that
matters at 100 TB: a 3-column projection must not read 11 columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import load

# --- scan_parquet -----------------------------------------------------------

_SCAN_ORACLE = "SELECT * FROM lineitem"


@query("scan_parquet", oracle=_SCAN_ORACLE, tier=1)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table parquet scan with declared schema, all columns."""
    return load(spark, sf_dir, "lineitem")


# --- project_compute --------------------------------------------------------

_PROJECT_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  l_extendedprice * (1 - l_discount) AS revenue,
  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
  l_extendedprice - l_extendedprice * l_discount AS net
FROM lineitem
"""


@query("project_compute", oracle=_PROJECT_ORACLE, tier=1)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived columns (the billing `net = cost - credit` analog)."""
    li = load(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charge"),
        (
            F.col("l_extendedprice")
            - F.col("l_extendedprice") * F.col("l_discount")
        ).alias("net"),
    )


# --- filter_compound --------------------------------------------------------

_FILTER_ORACLE = """
SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity, l_discount
FROM lineitem
WHERE (l_returnflag = 'A' AND l_discount BETWEEN 0.02 AND 0.08)
   OR (l_quantity IN (1, 2, 3) AND l_linestatus LIKE 'F%')
"""


@query("filter_compound", oracle=_FILTER_ORACLE, tier=1)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/IN/BETWEEN/LIKE predicate combination, pushed to the scan."""
    li = load(spark, sf_dir, "lineitem")
    cond = (
        (F.col("l_returnflag") == "A")
        & F.col("l_discount").between(0.02, 0.08)
    ) | (F.col("l_quantity").isin(1, 2, 3) & F.col("l_linestatus").like("F%"))
    return li.filter(cond).select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_discount",
    )


# --- cast_types -------------------------------------------------------------

# price_dec leaves the driver boundary as a STRING rendering of the
# decimal(14,2) value (full-scale "123.40" on both engines): Spark decimals
# arrive as Python Decimal objects while DuckDB's fetch as float64, so a raw
# decimal column can never hash-match (CORRECTNESS_r01). The decimal cast
# itself is still exercised — price_dec proves scale/rounding, price_back
# proves the double round-trip.
_CAST_ORACLE = """
SELECT
  o_orderkey,
  CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS order_date,
  CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS VARCHAR) AS price_dec,
  CAST(o_orderkey AS VARCHAR) AS key_str,
  CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS DOUBLE) AS price_back
FROM orders
"""


@query("cast_types", oracle=_CAST_ORACLE, tier=1)
def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's transform stage: string<->date, double<->decimal casts."""
    o = load(spark, sf_dir, "orders")
    price_dec = F.col("o_totalprice").cast("decimal(14,2)")
    return o.select(
        "o_orderkey",
        F.to_date(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("order_date"),
        price_dec.cast("string").alias("price_dec"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        price_dec.cast("double").alias("price_back"),
    )


# --- null_handling ----------------------------------------------------------

# Fixtures have no NULLs (FIXTURES.md), so nulls are injected via CASE first.
_NULL_ORACLE = """
SELECT
  c_custkey,
  COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal_or_zero,
  (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) IS NULL AS was_null,
  COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, c_acctbal, 0.0) AS first_non_null
FROM customer
"""


@query("null_handling", oracle=_NULL_ORACLE, tier=2)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / isNull / fill over injected NULLs."""
    c = load(spark, sf_dir, "customer")
    nullable = F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal"))
    return c.select(
        "c_custkey",
        F.coalesce(nullable, F.lit(0.0)).alias("bal_or_zero"),
        nullable.isNull().alias("was_null"),
        F.coalesce(nullable, F.col("c_acctbal"), F.lit(0.0)).alias("first_non_null"),
    )


# --- dedup_exact_rows -------------------------------------------------------

# No duplicate rows exist at sf0.01 (FIXTURES.md), so duplicates are
# synthesized by unioning a deterministic slice — mirrors the reference's
# idempotent re-load guard (same file loaded twice must not double-count).
_DEDUP_ORACLE = """
SELECT DISTINCT * FROM (
  SELECT * FROM orders
  UNION ALL
  SELECT * FROM orders WHERE o_orderkey % 10 = 0
)
"""


@query("dedup_exact_rows", oracle=_DEDUP_ORACLE, tier=1)
def dedup_exact_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-row drop (idempotent re-load building block)."""
    o = load(spark, sf_dir, "orders")
    doubled = o.unionAll(o.filter(F.col("o_orderkey") % 10 == 0))
    return doubled.distinct()


# --- dedup_keep_latest ------------------------------------------------------

# ReplacingMergeTree-style keep-latest: one surviving row per key, chosen by
# the highest version column. The loader's reprocessing semantics — a
# re-emitted billing line replaces its predecessor — expressed as ONE
# hash aggregate (max over a version-led struct) instead of the textbook
# window + row_number, which would sort every partition. The aggregate
# partial-combines map-side, so at 100 TB the shuffle carries one row per
# key per map task, not the full table. The fixture's l_linenumber is NOT
# unique within an order, so the version order is made total by tie-breaking
# through every carried column — the oracle's ORDER BY lists the struct
# fields in the same sequence the struct max compares them.
_KEEP_LATEST_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
FROM (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber DESC, l_quantity DESC,
                                     l_extendedprice DESC, l_returnflag DESC
                           ) AS rn
  FROM lineitem
) WHERE rn = 1
"""


@query("dedup_keep_latest", oracle=_KEEP_LATEST_ORACLE, tier=2)
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the latest row per key (version = l_linenumber) via struct-max."""
    li = load(spark, sf_dir, "lineitem")
    latest = li.groupBy("l_orderkey").agg(
        F.max(
            F.struct(
                "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
            )
        ).alias("s")
    )
    return latest.select(
        "l_orderkey",
        F.col("s.l_linenumber").alias("l_linenumber"),
        F.col("s.l_quantity").alias("l_quantity"),
        F.col("s.l_extendedprice").alias("l_extendedprice"),
        F.col("s.l_returnflag").alias("l_returnflag"),
    )
