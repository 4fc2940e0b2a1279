"""Billing-history operators: SCD2 dimension-history build and MERGE-style
CDC application (SURVEY.md §2 — the loader's restatement/versioning story).

Scale design:
- SCD2 build: one window shuffle on the business key; change detection
  (lag), interval close (lead), and the current-row flag all ride the SAME
  sort order, so Spark plans one Exchange + one Sort reused by all three
  window functions.
- CDC merge: a full-outer hash join on the key — exactly what MERGE INTO
  compiles to on any engine without a transactional table format; applied
  row counts are conserved (base - deletes + inserts). At 100 TB both
  sides shuffle on the key once; Delta/Iceberg MERGE is the packaged form
  of the same plan plus file-level pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import load

# --- scd2_history -----------------------------------------------------------

# Each order sets its customer's "current order status"; the SCD2 history
# collapses consecutive equal statuses and emits one validity interval per
# change, closed by the next change. The open (current) interval carries a
# NULL valid_to — the usual 9999-12-31 sentinel overflows pandas
# datetime64[ns] at the driver boundary, and NULL is the other standard
# SCD2 convention. Ties on o_orderdate are broken by o_orderkey so the
# change sequence is total-ordered and deterministic on both engines.
_SCD2_ORACLE = """
WITH seq AS (
  SELECT o_custkey AS custkey, o_orderstatus AS status, o_orderdate AS ts,
         o_orderkey,
         lag(o_orderstatus) OVER w AS prev_status
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), changes AS (
  SELECT custkey, status, ts, o_orderkey FROM seq
  WHERE prev_status IS NULL OR status <> prev_status
), intervals AS (
  SELECT custkey, status, ts AS valid_from,
         lead(ts) OVER (PARTITION BY custkey ORDER BY ts, o_orderkey)
           AS next_from
  FROM changes
)
SELECT custkey, status, valid_from,
       next_from AS valid_to,
       next_from IS NULL AS is_current
FROM intervals
"""


@query("scd2_history", oracle=_SCD2_ORACLE, tier=2)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build from a change stream: collapse
    consecutive equal attribute values, emit [valid_from, valid_to)
    intervals, flag the open (current) row. lag/lead/flag share one
    (custkey, ts) sort, so the plan is a single window Exchange."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("ts"),
        "o_orderkey",
        F.lag("o_orderstatus").over(w).alias("prev_status"),
    )
    changes = seq.filter(
        F.col("prev_status").isNull()
        | (F.col("status") != F.col("prev_status"))
    )
    w2 = W.partitionBy("custkey").orderBy("ts", "o_orderkey")
    intervals = changes.select(
        "custkey",
        "status",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("next_from"),
    )
    return intervals.select(
        "custkey",
        "status",
        "valid_from",
        F.col("next_from").alias("valid_to"),
        F.col("next_from").isNull().alias("is_current"),
    )


# --- cdc_merge_upsert -------------------------------------------------------

# Deterministic synthetic change batch over the customer base:
#   custkey % 11 = 3  -> DELETE
#   custkey % 7  = 0  -> UPDATE (acctbal += 100, segment -> 'RESTATED')
#   base custkey % 13 = 0 -> INSERT a new row under key custkey + 10_000_000
# (MERGE WHEN MATCHED UPDATE / WHEN MATCHED DELETE / WHEN NOT MATCHED
# INSERT, expressed as one full-outer join.)
_MERGE_ORACLE = """
WITH changes AS (
  SELECT c_custkey AS key, 'D' AS op,
         CAST(NULL AS DOUBLE) AS new_bal, CAST(NULL AS VARCHAR) AS new_seg
  FROM customer WHERE c_custkey % 11 = 3
  UNION ALL
  SELECT c_custkey, 'U', c_acctbal + 100, 'RESTATED'
  FROM customer WHERE c_custkey % 7 = 0 AND c_custkey % 11 <> 3
  UNION ALL
  SELECT c_custkey + 10000000, 'I', c_acctbal, 'NEWACCT'
  FROM customer WHERE c_custkey % 13 = 0
)
SELECT COALESCE(b.c_custkey, ch.key) AS c_custkey,
       CASE WHEN ch.op = 'U' THEN ch.new_bal
            WHEN ch.op = 'I' THEN ch.new_bal
            ELSE b.c_acctbal END AS c_acctbal,
       CASE WHEN ch.op = 'U' THEN ch.new_seg
            WHEN ch.op = 'I' THEN ch.new_seg
            ELSE b.c_mktsegment END AS c_mktsegment,
       COALESCE(ch.op, '=') AS applied_op
FROM customer b
FULL OUTER JOIN changes ch ON b.c_custkey = ch.key
WHERE COALESCE(ch.op, '=') <> 'D'
"""


@query("cdc_merge_upsert", oracle=_MERGE_ORACLE, tier=2)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics without a transactional table format: apply a
    CDC batch (update / delete / insert) to the customer base via one
    full-outer join on the key, then project the post-image. Row counts
    are conserved: |base| - |deletes| + |inserts|."""
    c = load(spark, sf_dir, "customer")
    upd = c.filter(
        (F.col("c_custkey") % 7 == 0) & (F.col("c_custkey") % 11 != 3)
    ).select(
        F.col("c_custkey").alias("key"),
        F.lit("U").alias("op"),
        (F.col("c_acctbal") + 100).alias("new_bal"),
        F.lit("RESTATED").alias("new_seg"),
    )
    dele = c.filter(F.col("c_custkey") % 11 == 3).select(
        F.col("c_custkey").alias("key"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("new_bal"),
        F.lit(None).cast("string").alias("new_seg"),
    )
    ins = c.filter(F.col("c_custkey") % 13 == 0).select(
        (F.col("c_custkey") + 10_000_000).alias("key"),
        F.lit("I").alias("op"),
        F.col("c_acctbal").alias("new_bal"),
        F.lit("NEWACCT").alias("new_seg"),
    )
    changes = dele.unionAll(upd).unionAll(ins)
    merged = c.join(changes, c.c_custkey == changes.key, "full_outer")
    applied = F.coalesce(F.col("op"), F.lit("="))
    return merged.filter(applied != "D").select(
        F.coalesce(c.c_custkey, F.col("key")).alias("c_custkey"),
        F.when(F.col("op").isin("U", "I"), F.col("new_bal"))
        .otherwise(c.c_acctbal)
        .alias("c_acctbal"),
        F.when(F.col("op").isin("U", "I"), F.col("new_seg"))
        .otherwise(c.c_mktsegment)
        .alias("c_mktsegment"),
        applied.alias("applied_op"),
    )


# --- join_point_in_time -----------------------------------------------------

# Point-in-time (PIT) join: enrich each order with the customer's order
# status AS OF the order date, from the SCD2 validity intervals built by
# scd2_history — the lookup every feature store / restatement-correct
# report needs. Composition: the interval table IS the declared scd2
# operator's output, not a re-derivation.
_PIT_ORACLE = """
WITH seq AS (
  SELECT o_custkey AS custkey, o_orderstatus AS status, o_orderdate AS ts,
         o_orderkey,
         lag(o_orderstatus) OVER w AS prev_status
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), changes AS (
  SELECT custkey, status, ts, o_orderkey FROM seq
  WHERE prev_status IS NULL OR status <> prev_status
), intervals AS (
  SELECT custkey, status, ts AS valid_from,
         lead(ts) OVER (PARTITION BY custkey ORDER BY ts, o_orderkey)
           AS valid_to
  FROM changes
)
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
       i.status AS status_asof, i.valid_from
FROM orders o
JOIN intervals i
  ON i.custkey = o.o_custkey
 AND i.valid_from <= o.o_orderdate
 AND (i.valid_to IS NULL OR o.o_orderdate < i.valid_to)
"""


@query("join_point_in_time", oracle=_PIT_ORACLE, tier=2)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIT enrichment: each order picks the SCD2 interval covering its
    date. The join is EQUI on custkey with the interval predicate as a
    residual filter — correct and scalable because SCD2 intervals per key
    are few (one per attribute change), so the per-key fan-out is bounded
    by change count, never a theta-join blowup; both sides hash once on
    custkey and co-partition. [valid_from, valid_to) semantics make the
    cover unique per order (intervals tile the key's timeline), so the
    join is 1:1 from orders — row count is conserved, which the oracle's
    hash check enforces. At 100 TB you bucket both tables on custkey and
    this becomes a shuffle-free sort-merge join (join_bucketed pattern)."""
    o = load(spark, sf_dir, "orders")
    hist = scd2_history(spark, sf_dir)
    return (
        o.join(
            hist,
            (o.o_custkey == hist.custkey)
            & (hist.valid_from <= o.o_orderdate)
            & (hist.valid_to.isNull() | (o.o_orderdate < hist.valid_to)),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            F.col("status").alias("status_asof"),
            "valid_from",
        )
    )
