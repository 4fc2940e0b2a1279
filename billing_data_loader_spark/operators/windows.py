"""Window-function operators (SURVEY.md §2.5).

Determinism: every ORDER BY inside a window carries a unique tie-break
column (orderkey / event_id), otherwise row_number/lag are nondeterministic
across partitionings and the value-hash check fails spuriously. Frame sums
use decimal quantization (see functions.determinism) so running totals are
reduction-order-insensitive. Rank-family outputs are cast to BIGINT to match
DuckDB's integer width.

Scale: a window over partitionBy(k) shuffles once on k — same shape as a
groupBy — and sorts within partitions. Skewed k (one huge customer) is the
risk at 100 TB; AQE does not split window skew, so keys chosen here are
natural high-cardinality keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import load

_DEC = "decimal(28,6)"

# --- win_topk_per_group -----------------------------------------------------

_TOPK_ORACLE = """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ) AS BIGINT) AS rn
  FROM orders
) WHERE rn <= 3
"""


@query("win_topk_per_group", oracle=_TOPK_ORACLE, tier=1)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (row_number + filter)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# --- win_rank_dense ---------------------------------------------------------

_RANK_ORACLE = """
SELECT o_orderkey, o_orderstatus,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(RANK() OVER (
         PARTITION BY o_orderstatus ORDER BY year(o_orderdate)
       ) AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER (
         PARTITION BY o_orderstatus ORDER BY year(o_orderdate)
       ) AS BIGINT) AS drnk
FROM orders
"""


@query("win_rank_dense", oracle=_RANK_ORACLE, tier=2)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank with genuine ties (year granularity)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy(F.year("o_orderdate"))
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


# --- win_lag_lead -----------------------------------------------------------

_LAG_ORACLE = """
SELECT event_id, user_id,
       date_diff('microsecond',
                 LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                 ts) AS micros_since_prev,
       LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS next_type
FROM events
"""


@query("win_lag_lead", oracle=_LAG_ORACLE, tier=2)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap (lag) and next event type (lead)."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "micros_since_prev"
        ),
        F.lead("event_type").over(w).alias("next_type"),
    )


# --- win_running_sum --------------------------------------------------------

_RUNNING_ORACLE = """
SELECT o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
         ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_total
FROM orders
"""


@query("win_running_sum", oracle=_RUNNING_ORACLE, tier=2)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue by date (global ordered frame; single-partition
    window — fine for reporting outputs, not for 100 TB fact tables)."""
    o = load(spark, sf_dir, "orders")
    w = (
        W.orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias(
            "running_total"
        ),
    )


# --- win_moving_avg_range ---------------------------------------------------

_MOVAVG_ORACLE = """
SELECT event_id,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS sum_1h,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS avg_1h
FROM (
  SELECT event_id, value,
         date_diff('second', TIMESTAMP '1970-01-01', ts) AS sec
  FROM events
)
WINDOW w AS (ORDER BY sec RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


@query("win_moving_avg_range", oracle=_MOVAVG_ORACLE, tier=3)
def win_moving_avg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame trailing-hour moving sum/avg over epoch seconds.

    The decimal(28,6) cast quantizes each value to 6dp; summing those is
    exactly summing micro-units in a long, so the sliding frame aggregates a
    primitive long under codegen instead of re-adding BigDecimals per frame
    (O(n*frame) either way, but ~20x cheaper per add). msum/1e6 is then
    reconstructed losslessly in decimal before the single cast to double.
    Scale note: a global RANGE window is inherently one partition; the 100 TB
    path is bucketed two-pass prefix sums (partition by coarse time bucket,
    carry per-bucket prefix totals), which preserves these exact semantics.
    """
    # precondition: |value| < ~9.2e12 — the decimal->long micro-unit cast
    # overflows to NULL silently under non-ANSI Spark beyond long range
    # (9.2e18 micro). Fixture values are O(1e3); a deployment at larger
    # magnitudes must scale the quantum down or run ANSI mode so the
    # overflow errors loudly. Same pattern + bound in streaming/jobs.py.
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.unix_timestamp("ts").alias("sec"),
        (F.col("value").cast(_DEC) * 1000000).cast("long").alias("micro"),
    )
    w = W.orderBy("sec").rangeBetween(-3600, 0)
    msum = F.sum("micro").over(w)
    sum_dec = (msum.cast("decimal(38,0)") / 1000000).cast("double")
    return ev.select(
        "event_id",
        sum_dec.alias("sum_1h"),
        (sum_dec / F.count(F.lit(1)).over(w)).alias("avg_1h"),
    )


# --- win_ntile_pctrank ------------------------------------------------------

_NTILE_ORACLE = """
SELECT c_custkey,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
"""


@query("win_ntile_pctrank", oracle=_NTILE_ORACLE, tier=3)
def win_ntile_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over account balance."""
    c = load(spark, sf_dir, "customer")
    w = W.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# --- win_first_last ---------------------------------------------------------

_FIRSTLAST_ORACLE = """
SELECT event_id, user_id,
       FIRST_VALUE(event_type) OVER w AS first_type,
       LAST_VALUE(event_type) OVER w AS last_type
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts, event_id
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
"""


@query("win_first_last", oracle=_FIRSTLAST_ORACLE, tier=3)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last event per user with a full-partition frame."""
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    )


# --- win_sessionize ---------------------------------------------------------

# Batch sessionization (gap > 30 min starts a new session) — the batch twin
# of stream_session_window, built from lag + running sum. Gap comparison is
# done on fractional epoch seconds on BOTH engines (fixture timestamps are
# sub-second; whole-second truncation would flip boundary decisions).
# Scale: one shuffle on user_id; both window passes and the final session
# aggregate share that partitioning, so the session ids and per-session
# rollup never reshuffle.
_SESSIONIZE_ORACLE = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM g
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end
FROM s
GROUP BY user_id, session_id
"""

_SESSION_GAP_SEC = 1800


@query("win_sessionize", oracle=_SESSIONIZE_ORACLE, tier=2)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based batch sessionization: lag -> new-session flag -> running
    sum session id -> per-session rollup."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # timestamp->double = fractional epoch seconds, exact at µs resolution
    sec = F.col("ts").cast("double")
    gap = sec - F.lag(sec).over(w)
    is_new = F.when(
        gap.isNull() | (gap > _SESSION_GAP_SEC), F.lit(1)
    ).otherwise(F.lit(0))
    sess = (
        F.sum(is_new)
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long")
    )
    return (
        ev.select("user_id", "ts", sess.alias("session_id"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )
