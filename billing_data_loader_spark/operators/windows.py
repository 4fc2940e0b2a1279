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

from ..functions.determinism import MICRO, quantize_long
from ..plans.registry import query
from ..session import scoped_persist
from ..tables import load

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


def _det_range_bucket(df: DataFrame, numeric: F.Column, n_buckets: int) -> DataFrame:
    """Append a DETERMINISTIC range-bucket column ``bucket`` derived from
    row data, for two-pass global-window decompositions.

    The r3 form (``repartitionByRange(...).withColumn("pid",
    spark_partition_id())`` + persist) was recompute-unsafe:
    repartitionByRange samples its boundaries nondeterministically, so a
    cache miss (eviction, executor loss on a real cluster) could assign
    different pids to the per-partition-stats read and the final-join read
    and silently corrupt offsets. Here the boundaries are computed ONCE via
    driver-side ``approxQuantile`` and embedded in the plan as literals;
    the bucket is then pure row arithmetic — identical on every recompute,
    on any executor. Ties on the bucketing value land in a single bucket
    (keeps buckets contiguous in the global order, which the offset
    decomposition requires); quantile error and tie mass only skew bucket
    SIZES, never results. The boundary scan is one extra pass over a single
    numeric column — at 100 TB that is a column-pruned parquet scan, the
    same cost repartitionByRange's own sampling pass pays."""
    tmp = "__bucket_num"
    with_num = df.withColumn(tmp, numeric.cast("double"))
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(with_num.stat.approxQuantile(tmp, probs, 0.001)))
    arr = F.array(*[F.lit(b) for b in bounds])
    bucket = F.size(F.filter(arr, lambda x: x < F.col(tmp)))
    return with_num.withColumn("bucket", bucket).drop(tmp)


# --- win_running_sum --------------------------------------------------------

_RUNNING_ORACLE = """
SELECT o_orderkey,
       CAST(SUM(CAST(floor(CAST(o_totalprice AS DOUBLE) * 1000000.0 + 0.5)
                     AS DECIMAL(38,0))) OVER (
         ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) / 1000000.0 AS running_total
FROM orders
"""


@query("win_running_sum", oracle=_RUNNING_ORACLE, tier=2)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue by date, DISTRIBUTED: global prefix sum as
    range-bucket (deterministic, see :func:`_det_range_bucket`) +
    per-bucket prefix + broadcast bucket offsets (same two-pass shape as
    win_ntile_pctrank) instead of a one-partition global window. Prices
    are floor-quantized to micro-unit integers (determinism.quantize_long
    — same form as dsum/o_dsum): integer addition is exact and
    associative, so the decomposed running total is bit-identical to the
    single-pass oracle, and the per-row window arithmetic is long/decimal
    integer instead of scale-6 decimal (the cost the r5 A/B measured at
    ~2x per aggregate). The decimal(38,0) accumulator keeps a 100 TB
    global prefix from overflowing long range (~9.2e12 money units)."""
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        quantize_long("o_totalprice").alias("price_q"),
    )
    # bucket on the leading sort column only; o_orderkey tie-break happens
    # inside the bucket (all rows of one date share a bucket by design)
    rp = scoped_persist(
        _det_range_bucket(
            o, F.col("o_orderdate").cast("timestamp").cast("double"), n_part
        )
    )
    _dec38 = "decimal(38,0)"
    ptot = rp.groupBy("bucket").agg(
        F.sum(F.col("price_q").cast(_dec38)).alias("ptot")
    )
    # offsets via triangular self-join over the P-row totals frame (P^2
    # tuples, P = O(cluster)): no window, so nothing for WindowExec to
    # collapse — cumulative anything over per-partition stats is just
    # "sum of strictly-earlier buckets"
    offs = (
        ptot.alias("a")
        .join(
            ptot.alias("b"), F.col("b.bucket") < F.col("a.bucket"), "left"
        )
        .groupBy(F.col("a.bucket").alias("bucket"))
        .agg(
            F.coalesce(
                F.sum("b.ptot"), F.lit(0).cast(_dec38)
            ).alias("off")
        )
    )
    w_local = (
        W.partitionBy("bucket")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # integer prefix + integer offset add exactly; the double cast THEN
    # the 1e6 divide mirror the oracle's op order bit-for-bit
    return rp.join(F.broadcast(offs), "bucket").select(
        "o_orderkey",
        (
            (F.sum(F.col("price_q").cast(_dec38)).over(w_local) + F.col("off"))
            .cast("double")
            / MICRO
        ).alias("running_total"),
    )


# --- win_moving_avg_range ---------------------------------------------------

_MOVAVG_ORACLE = """
SELECT event_id,
       CAST(SUM(micro) OVER w AS DOUBLE) / 1000000.0 AS sum_1h,
       CAST(SUM(micro) OVER w AS DOUBLE) / 1000000.0
         / (COUNT(*) OVER w) AS avg_1h
FROM (
  SELECT event_id,
         CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
           AS micro,
         date_diff('second', TIMESTAMP '1970-01-01', ts) AS sec
  FROM events
)
WINDOW w AS (ORDER BY sec RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


@query("win_moving_avg_range", oracle=_MOVAVG_ORACLE, tier=3)
def win_moving_avg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame trailing-hour moving sum/avg, DISTRIBUTED: the global
    RANGE window is decomposed into per-bucket windows so no stage ever
    funnels the table into one partition (the naive ``W.orderBy("sec")``
    form does exactly that — Spark's WindowExec warns and serializes).

    Decomposition: bucket ``b = floor(sec/3600)``. A trailing-3600s frame
    ``[s-3600, s]`` spans at most buckets ``b-1`` and ``b`` (same-bucket
    rows are always within 3600s; bucket b-2 rows never are), so

        frame(s) = prefix_b(<= s)  +  total_{b-1} - prefix_{b-1}(< s-3600)

    prefix_b is an in-bucket RANGE window (peers included); the strict
    prefix at ``s-3600`` is read by unioning one zero-weight PROBE row per
    event into bucket b-1, ordered (k, is_data) so a probe sorts before
    data rows at the same key — its running sum then counts exactly the
    rows with k < s-3600. Every window/aggregate here partitions on the
    bucket key; at 100 TB this is ~rows/3600s-bucket per task plus one
    broadcast of per-bucket totals, and the plan scales with the number of
    buckets instead of collapsing on a global sort.

    Exactness: sums are fixed-point micro-unit longs (integer addition is
    associative), so the decomposed sum is bit-identical to the one-pass
    oracle; quantization and the final double reconstruction are the
    floor/CAST/divide ops of the dsum form, identical IEEE ops on both
    engines.
    """
    # precondition: |value| < ~9.2e12 — micro-unit longs overflow past long
    # range (9.2e18 micro). Fixture values are O(1e3); a deployment at
    # larger magnitudes must scale the quantum down or run ANSI mode so the
    # overflow errors loudly. Same pattern + bound in streaming/jobs.py.
    # quantize_long is the same floor form dsum/o_dsum plan, so both
    # engines quantize identically (no decimal conversion anywhere).
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.unix_timestamp("ts").alias("sec"),
        quantize_long("value").alias("micro"),
    )
    data = ev.withColumn("b", F.floor(F.col("sec") / 3600))

    # pass 1: in-bucket inclusive prefix (RANGE frame -> peers at equal sec
    # are all included, matching the oracle's RANGE semantics)
    w_incl = (
        W.partitionBy("b")
        .orderBy("sec")
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    with_prefix = data.select(
        "event_id",
        "b",
        "sec",
        F.sum("micro").over(w_incl).alias("psum"),
        F.count(F.lit(1)).over(w_incl).alias("pcnt"),
    )

    # pass 2: strict prefix of bucket b-1 at k = sec-3600, via probe rows.
    # is_data sorts probes (0) before data (1) at equal k, so the running
    # sum at a probe covers exactly the rows with k < sec-3600.
    dat = data.select(
        "b",
        F.col("sec").alias("k"),
        F.lit(1).alias("is_data"),
        "micro",
        F.lit(None).cast("long").alias("probe_id"),
    )
    prb = data.select(
        (F.col("b") - 1).alias("b"),
        (F.col("sec") - 3600).alias("k"),
        F.lit(0).alias("is_data"),
        F.lit(0).cast("long").alias("micro"),
        F.col("event_id").alias("probe_id"),
    )
    w_strict = (
        W.partitionBy("b")
        .orderBy("k", "is_data")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    strict = (
        dat.unionAll(prb)
        .select(
            "b",
            "probe_id",
            "is_data",
            F.sum("micro").over(w_strict).alias("ssum"),
            F.sum("is_data").over(w_strict).alias("scnt"),
        )
        .filter(F.col("is_data") == 0)
        .select(
            F.col("probe_id").alias("event_id"),
            F.col("b").alias("b_prev"),
            "ssum",
            "scnt",
        )
    )

    # per-bucket totals: tiny (one row per hour of data), broadcast
    totals = data.groupBy("b").agg(
        F.sum("micro").alias("tsum"), F.count(F.lit(1)).alias("tcnt")
    )
    joined = with_prefix.join(strict, "event_id").join(
        F.broadcast(totals.withColumnRenamed("b", "b_prev")),
        "b_prev",
        "left",
    )
    msum = (
        F.col("psum")
        + F.coalesce(F.col("tsum") - F.col("ssum"), F.lit(0).cast("long"))
    )
    mcnt = (
        F.col("pcnt")
        + F.coalesce(F.col("tcnt") - F.col("scnt"), F.lit(0).cast("long"))
    )
    # long->double cast THEN the 1e6 divide, mirroring the oracle's
    # CAST(SUM(micro) AS DOUBLE) / 1e6 op order bit-for-bit
    sum_dbl = msum.cast("double") / MICRO
    return joined.select(
        "event_id",
        sum_dbl.alias("sum_1h"),
        (sum_dbl / mcnt).alias("avg_1h"),
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
    """ntile / percent_rank / cume_dist over account balance, DISTRIBUTED:
    global rank via range-partition + per-partition rank + partition
    offsets, instead of the single-partition global window (which WindowExec
    warns about and which serializes the table at scale).

    Pass 1 buckets on the leading sort column (deterministic
    :func:`_det_range_bucket` — boundary literals in the plan, so a
    recompute can never re-bucket rows between passes) and ranks locally;
    pass 2 turns per-bucket row counts (P rows — O(cluster), not O(data))
    into cumulative offsets, broadcast back. The ORDER BY key is unique
    ((c_acctbal, c_custkey) — custkey is a key), so there are no peer rows
    and the rank functions have closed forms: percent_rank = (r-1)/(n-1),
    cume_dist = r/n, and ntile(4) assigns the first n%4 tiles one extra row
    (the SQL-standard split both engines implement)."""
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    rp = scoped_persist(_det_range_bucket(c, F.col("c_acctbal"), n_part))
    counts = rp.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    # offsets via triangular self-join over the P-row counts frame (same
    # no-window pattern as win_running_sum); total n rides along broadcast
    tot = counts.agg(F.sum("cnt").alias("n"))
    offs = (
        counts.alias("a")
        .join(
            counts.alias("b"), F.col("b.bucket") < F.col("a.bucket"), "left"
        )
        .groupBy(F.col("a.bucket").alias("bucket"))
        .agg(F.coalesce(F.sum("b.cnt"), F.lit(0)).alias("off"))
        .crossJoin(F.broadcast(tot))
    )
    w_local = W.partitionBy("bucket").orderBy("c_acctbal", "c_custkey")
    r = F.col("off") + F.row_number().over(w_local)
    n = F.col("n")
    q, rem = (n / 4).cast("long"), n % 4
    boundary = rem * (q + 1)
    quartile = F.when(r <= boundary, ((r - 1) / (q + 1)).cast("long") + 1).otherwise(
        rem + ((r - boundary - 1) / q).cast("long") + 1
    )
    return rp.join(F.broadcast(offs), "bucket").select(
        "c_custkey",
        quartile.cast("long").alias("quartile"),
        ((r - 1).cast("double") / (n - 1)).alias("pct_rank"),
        (r.cast("double") / n).alias("cume"),
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


# --- win_rolling_slope ------------------------------------------------------

_SLOPE_ORACLE = """
WITH base AS (
  SELECT event_id, user_id, ts,
         epoch_us(ts) AS x_us,
         CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS y_c
  FROM events
),
rel AS (
  SELECT event_id, user_id, ts, y_c,
         (x_us - min(x_us) OVER (PARTITION BY user_id)) // 1000000 AS x_s
  FROM base
),
s AS (
  SELECT event_id, user_id,
         COUNT(*) OVER w AS n,
         SUM(x_s) OVER w AS sx,
         SUM(y_c) OVER w AS sy,
         SUM(x_s * y_c) OVER w AS sxy,
         SUM(x_s * x_s) OVER w AS sxx
  FROM rel
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, CAST(n AS BIGINT) AS n_window,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)
       END AS slope_c_per_s
FROM s
"""


@query("win_rolling_slope", oracle=_SLOPE_ORACLE, tier=3)
def win_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling OLS trend per user: the least-squares slope of (value vs
    time) over each user's trailing 10 events — the usage-trend signal a
    billing pipeline alerts on (spend accelerating vs flat), computed as
    pure window algebra instead of a per-group Python regression.

    Every windowed term is an EXACT integer sum: x is whole seconds
    since the user's first event (integer division of epoch micros —
    bounded ~2.6e6 on the fixture span, so every product and 10-row sum
    sits far inside int64), y is floor-quantized cents. The closed-form
    slope (n*sxy - sx*sy) / (n*sxx - sx^2) then divides two exact
    integers in ONE IEEE op — bit-identical cross-engine, no float
    reduction order anywhere. Degenerate windows (all x equal — a
    user's first event, or same-second bursts) yield NULL by the same
    integer zero-test in both engines.

    Shape: all three windows (the per-user min and the two rolling
    frames) partition on user_id — one shuffle, one sort, shared by
    every frame; output is one row per input row, generated in the same
    stage. At 100 TB this scales with users exactly like
    win_running_sum's per-user form."""
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, W.currentRow)
    )
    rel = ev.select(
        "event_id",
        "user_id",
        "ts",
        quantize_long("value", scale=2).alias("y_c"),
        F.expr(
            "(unix_micros(ts) - min(unix_micros(ts)) OVER "
            "(PARTITION BY user_id)) div 1000000"
        ).alias("x_s"),
    )
    s = rel.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x_s").over(w).alias("sx"),
        F.sum("y_c").over(w).alias("sy"),
        F.sum(F.col("x_s") * F.col("y_c")).over(w).alias("sxy"),
        F.sum(F.col("x_s") * F.col("x_s")).over(w).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "event_id",
        "user_id",
        F.col("n").alias("n_window"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(num.cast("double") / den.cast("double"))
        .alias("slope_c_per_s"),
    )


# --- win_concurrent_usage -----------------------------------------------------

# End-exclusive sessions: a session ending at instant t does NOT overlap one
# starting at t, so ties order (t, delta) with the -1 first. The max of the
# running sum is order-independent WITHIN a (t, delta) tie group: all deltas
# in the group are equal, so the prefix values form the same multiset under
# any intra-group order and the extremes sit at the group boundary.
_CONCURRENT_ORACLE = """
WITH sess AS (
  SELECT event_type, ts AS t_start,
         ts + to_minutes(CAST((event_id % 240) + 1 AS BIGINT)) AS t_end
  FROM events
),
bounds AS (
  SELECT event_type, t_start AS t, 1 AS delta FROM sess
  UNION ALL
  SELECT event_type, t_end AS t, -1 AS delta FROM sess
),
running AS (
  SELECT event_type,
         SUM(delta) OVER (
           PARTITION BY event_type ORDER BY t, delta
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS conc
  FROM bounds
)
SELECT event_type,
       (SELECT COUNT(*) FROM sess s WHERE s.event_type = running.event_type)
         AS n_sessions,
       CAST(MAX(conc) AS BIGINT) AS max_concurrent
FROM running
GROUP BY event_type
"""


@query("win_concurrent_usage", oracle=_CONCURRENT_ORACLE, tier=2)
def win_concurrent_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type — the sweep-line interval-overlap
    counter every usage-billing engine needs (concurrent licenses, active
    sessions, simultaneous streams): each event opens a session of
    ``(event_id % 240) + 1`` minutes (deterministic fixture-derived
    duration), sessions explode to +1/-1 boundary rows, and a running sum
    in boundary order IS the concurrency curve; the per-type max is the
    peak. End-exclusive semantics pin the tie order (-1 sorts before +1
    at the same instant, so back-to-back sessions never double-count) —
    see the oracle comment for why the max is deterministic under ties.

    Shape: one union (no join — both legs are projections of the same
    scan), one shuffle to the per-type window, and a same-key aggregate
    that reuses the window's hash partitioning. The window partitions by
    event_type (bounded fan-in per type on this fixture); at 100 TB with
    few types the swap is the win_running_sum two-pass decomposition —
    time-range buckets with broadcast per-bucket offsets — which applies
    verbatim because a prefix SUM decomposes; peak-finding then maxes the
    per-bucket maxima."""
    ev = load(spark, sf_dir, "events")
    sess = ev.select(
        "event_type",
        F.col("ts").alias("t_start"),
        F.expr("timestampadd(MINUTE, int(event_id % 240) + 1, ts)").alias(
            "t_end"
        ),
    )
    bounds = sess.select(
        "event_type", F.col("t_start").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        sess.select(
            "event_type", F.col("t_end").alias("t"), F.lit(-1).alias("delta")
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    running = bounds.select(
        "event_type", F.sum("delta").over(w).alias("conc")
    )
    return running.groupBy("event_type").agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_sessions"),
        F.max("conc").alias("max_concurrent"),
    )


# --- win_streak_islands -------------------------------------------------------

# Gaps-and-islands: a user's consecutive-day runs group by the constant
# (day_index - row_number) — the classic Tabibitosan trick. Both engines
# compute the island id from the same integer subtraction.
_STREAK_ORACLE = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), r AS (
  SELECT user_id, day,
         (day - DATE '2024-01-01')
           - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
           AS island
  FROM d
), runs AS (
  SELECT user_id, island, COUNT(*) AS run_len, MIN(day) AS run_start,
         MAX(COUNT(*)) OVER (PARTITION BY user_id) AS best_len
  FROM r GROUP BY user_id, island
)
SELECT user_id,
       CAST(SUM(run_len) AS BIGINT) AS n_active_days,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(MAX(run_len) AS BIGINT) AS longest_streak,
       MIN(CASE WHEN run_len = best_len THEN run_start END)
         AS best_streak_start
FROM runs GROUP BY user_id
"""


@query("win_streak_islands", oracle=_STREAK_ORACLE, tier=2)
def win_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands streak analysis: per user, the longest run of
    CONSECUTIVE active days, the island count, total active days, and
    the start of the (earliest) longest streak — the engagement-streak /
    SLA-continuity query every activity warehouse serves. Islands form
    via the Tabibitosan identity: within a user, consecutive days share
    a constant (day_index - row_number), so one subtraction converts
    runs into group keys — no self-join, no recursive CTE.

    Shape: distinct (user, day) collapse, ONE user-keyed window for the
    row numbers, then two stacked aggregates on (user, island) and
    (user) — every shuffle keys on user_id, and the per-user argmax of
    the longest run rides the final aggregate as a min-over-filtered
    struct rather than the oracle's correlated subquery. Scales with
    users; no global ordering anywhere."""
    d = (
        load(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    r = d.select(
        "user_id",
        "day",
        (
            F.datediff("day", F.lit("2024-01-01").cast("date"))
            - F.row_number().over(
                W.partitionBy("user_id").orderBy("day")
            )
        ).alias("island"),
    )
    runs = r.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("run_len"),
        F.min("day").alias("run_start"),
    ).withColumn(
        "best_len",
        F.max("run_len").over(W.partitionBy("user_id")),
    )
    return runs.groupBy("user_id").agg(
        F.sum("run_len").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_islands"),
        F.max("run_len").alias("longest_streak"),
        F.min(
            F.when(F.col("run_len") == F.col("best_len"), F.col("run_start"))
        ).alias("best_streak_start"),
    )


# --- win_moving_median --------------------------------------------------------

# Trailing 7-row exact moving median over each event type's daily
# revenue — the robust smoother (a single spike day cannot drag it, the
# reason ops dashboards prefer it to the moving mean). Medians
# interpolate over exact integer cents, so even-count midpoints are
# exact in both engines (the ts_anomaly_mad argument).
_MOVMED_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(floor(value * 1e2 + CAST(0.5 AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, day
)
SELECT event_type, day, cents,
       quantile_cont(cents, 0.5) OVER (
         PARTITION BY event_type ORDER BY day
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS med7
FROM daily
"""


@query("win_moving_median", oracle=_MOVMED_ORACLE, tier=2)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-observation exact MOVING MEDIAN of daily revenue per
    event type — the robust complement to win_moving_avg_range: one
    outage-day spike moves a moving mean for a week but cannot drag the
    median, which is why ops smoothing prefers it. Ramp-up days
    (fewer than 7 trailing rows) take the median of what exists, the
    standard convention.

    Shape: the DATA-sized work is one (type, day) aggregate with full
    map-side combine; the median window runs on the O(types x days)
    daily frame, partitioned per type — model-sized at any corpus, and
    the frame median is an exact order statistic over integer cents, so
    both engines interpolate identical midpoints (the ts_anomaly_mad
    argument). At 100 TB with a giant per-key timeline the swap is the
    two-pass bucketed decomposition the win_running_sum family
    documents."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(quantize_long("value", 2)).alias("cents"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, W.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        "cents",
        F.percentile("cents", F.lit(0.5)).over(w).alias("med7"),
    )


# --- win_pareto_abc -----------------------------------------------------------

_ABC_ORACLE = """
WITH spend AS (
  SELECT o_custkey AS ck,
         CAST(SUM(CAST(floor(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5)
                       AS BIGINT)) AS BIGINT) AS sp
  FROM orders GROUP BY o_custkey
),
base AS (
  SELECT c_mktsegment AS segment, c_custkey AS cust, COALESCE(sp, 0) AS x
  FROM customer LEFT JOIN spend ON c_custkey = ck
),
ranked AS (
  SELECT segment, cust, x,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
         CAST(SUM(x) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND
                           CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(x) OVER (PARTITION BY segment) AS BIGINT) AS total
  FROM base
  WINDOW w AS (PARTITION BY segment ORDER BY x DESC, cust ASC)
),
classed AS (
  SELECT segment, x, cum, total,
         CASE WHEN rn = 1 OR 5 * cum <= 4 * total THEN 'A'
              WHEN 20 * cum <= 19 * total THEN 'B'
              ELSE 'C' END AS abc_class
  FROM ranked
)
SELECT segment, abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(x) AS BIGINT) AS class_cents,
       CAST(SUM(x) AS DOUBLE) / CAST(NULLIF(MAX(total), 0) AS DOUBLE)
         AS class_share,
       CAST(MAX(cum) AS DOUBLE) / CAST(NULLIF(MAX(total), 0) AS DOUBLE)
         AS cum_share_end
FROM classed
GROUP BY segment, abc_class
"""


@query("win_pareto_abc", oracle=_ABC_ORACLE, tier=2)
def win_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto 80/95) classification of customers by lifetime spend
    within each market segment — the inventory-analytics staple applied
    to accounts: class A = the prefix of the spend-ranked list covering
    the first 80% of segment revenue, B = to 95%, C = the tail. The
    per-class rollup (count, revenue, share, cumulative boundary) is the
    "how many accounts fund this segment" read next to
    prof_gini_concentration's single inequality score.

    Exactness: membership is decided by INTEGER cross-multiplication
    (5*cum <= 4*total, 20*cum <= 19*total) on floor-quantized cents, so
    a boundary account can never flip on a ulp; rank 1 is always A
    (a dominant account exceeding 80% alone must not leave class A
    empty); ties rank deterministically by custkey. Classes are rank
    prefixes by construction (cum is monotone within the segment).
    Shares are shared-text IEEE divisions over exact integers.

    Shape: one map-side-combined custkey aggregate, then the rank, the
    running sum and the segment total all ride ONE segment-keyed
    exchange (one sort), into a <= 15-row rollup. The 5-partition window
    swap at 100 TB is the two-pass distributed rank + prefix-offset
    cumsum (the prof_gini_concentration note)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    spend = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(quantize_long("o_totalprice", 2)).cast("long").alias("sp")
    )
    base = (
        c.select(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_custkey").alias("cust"),
        )
        .join(spend, F.col("cust") == F.col("ck"), "left")
        .select(
            "segment",
            "cust",
            F.coalesce("sp", F.lit(0).cast("long")).alias("x"),
        )
    )
    w = W.partitionBy("segment").orderBy(F.desc("x"), F.asc("cust"))
    ranked = base.select(
        "segment",
        "x",
        F.row_number().over(w).cast("long").alias("rn"),
        F.sum("x")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum"),
        F.sum("x").over(W.partitionBy("segment")).alias("total"),
    )
    classed = ranked.select(
        "segment",
        "x",
        "cum",
        "total",
        F.expr(
            "CASE WHEN rn = 1 OR 5 * cum <= 4 * total THEN 'A'"
            " WHEN 20 * cum <= 19 * total THEN 'B'"
            " ELSE 'C' END"
        ).alias("abc_class"),
    )
    return classed.groupBy("segment", "abc_class").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("x").alias("class_cents"),
        F.expr(
            "CAST(SUM(x) AS DOUBLE)"
            " / CAST(NULLIF(MAX(total), 0) AS DOUBLE)"
        ).alias("class_share"),
        F.expr(
            "CAST(MAX(cum) AS DOUBLE)"
            " / CAST(NULLIF(MAX(total), 0) AS DOUBLE)"
        ).alias("cum_share_end"),
    )


# --- win_moving_stddev --------------------------------------------------------

_BOLL_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(floor(value * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT))
              AS BIGINT) AS cents
  FROM events GROUP BY event_type, day
),
w AS (
  SELECT event_type, day, cents,
         CAST(COUNT(*) OVER win AS BIGINT) AS n7,
         CAST(SUM(cents) OVER win AS BIGINT) AS s7,
         CAST(SUM(cents * cents) OVER win AS BIGINT) AS ss7
  FROM daily
  WINDOW win AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day,
       CAST(cents AS DOUBLE) / 1e2 AS daily_value,
       n7,
       CAST(s7 AS DOUBLE) / (n7 * 1e2) AS ma7,
       sqrt(CAST(n7 * ss7 - s7 * s7 AS DOUBLE))
         / (CAST(n7 AS DOUBLE) * 1e2) AS sd7,
       CAST(s7 AS DOUBLE) / (n7 * 1e2)
         + CAST(2.0 AS DOUBLE) * sqrt(CAST(n7 * ss7 - s7 * s7 AS DOUBLE))
             / (CAST(n7 AS DOUBLE) * 1e2) AS band_upper,
       CAST(s7 AS DOUBLE) / (n7 * 1e2)
         - CAST(2.0 AS DOUBLE) * sqrt(CAST(n7 * ss7 - s7 * s7 AS DOUBLE))
             / (CAST(n7 AS DOUBLE) * 1e2) AS band_lower
FROM w
"""


@query("win_moving_stddev", oracle=_BOLL_ORACLE, tier=2)
def win_moving_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over each event type's daily value series: 7-day
    trailing mean, population stddev, and mean +- 2 sigma — the anomaly
    envelope a usage-monitoring dashboard draws around every metric
    (win_moving_avg_range's missing second moment; ts_anomaly_mad is the
    robust sibling).

    Exactness: daily sums are exact integer cents; the window's n/sum/
    sum-of-squares are exact BIGINT, so the variance numerator
    n*ss - s^2 is an exact integer and sigma is ONE IEEE sqrt of it
    (sqrt is correctly rounded per IEEE 754, so both engines agree to
    the last bit); the bands are shared-text arithmetic on those exact
    inputs. Integer bounds: daily cents ~1e9 at 100x this fixture keep
    cents^2 * 7 inside int64; beyond that the ss window widens to
    DECIMAL(38,0) (documented, not needed here).

    Shape: one (event_type, day) aggregate — the only data-sized
    shuffle — then all three window statistics ride ONE event_type-keyed
    exchange over the O(types x days) daily frame; nothing global
    anywhere."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            quantize_long("value", 2).alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").alias("cents"))
    )
    win = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, W.currentRow)
    )
    w = daily.select(
        "event_type",
        "day",
        "cents",
        F.count(F.lit(1)).over(win).alias("n7"),
        F.sum("cents").over(win).alias("s7"),
        F.sum(F.col("cents") * F.col("cents")).over(win).alias("ss7"),
    )
    return w.select(
        "event_type",
        "day",
        F.expr("CAST(cents AS DOUBLE) / 1e2").alias("daily_value"),
        "n7",
        F.expr("CAST(s7 AS DOUBLE) / (n7 * 1e2)").alias("ma7"),
        F.expr(
            "sqrt(CAST(n7 * ss7 - s7 * s7 AS DOUBLE))"
            " / (CAST(n7 AS DOUBLE) * 1e2)"
        ).alias("sd7"),
        F.expr(
            "CAST(s7 AS DOUBLE) / (n7 * 1e2)"
            " + CAST(2.0 AS DOUBLE)"
            " * sqrt(CAST(n7 * ss7 - s7 * s7 AS DOUBLE))"
            " / (CAST(n7 AS DOUBLE) * 1e2)"
        ).alias("band_upper"),
        F.expr(
            "CAST(s7 AS DOUBLE) / (n7 * 1e2)"
            " - CAST(2.0 AS DOUBLE)"
            " * sqrt(CAST(n7 * ss7 - s7 * s7 AS DOUBLE))"
            " / (CAST(n7 AS DOUBLE) * 1e2)"
        ).alias("band_lower"),
    )


# --- win_running_distinct -------------------------------------------------------

_RUNDIST_ORACLE = """
WITH first_seen AS (
  SELECT event_type, user_id, MIN(CAST(ts AS DATE)) AS day
  FROM events GROUP BY event_type, user_id
),
new_by_day AS (
  SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS new_users
  FROM first_seen GROUP BY event_type, day
)
SELECT event_type, day, new_users,
       CAST(SUM(new_users) OVER (
         PARTITION BY event_type ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_distinct_users
FROM new_by_day
"""


@query("win_running_distinct", oracle=_RUNDIST_ORACLE, tier=2)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per event type by day — the audience-
    growth curve every product dashboard draws. A naive per-day
    COUNT(DISTINCT) over an expanding window re-scans history O(days)
    times; the first-seen identity (cumulative distinct == running sum
    of first-occurrence counts, the prof_heaps_law trick) computes the
    whole curve in two keyed aggregates and one prefix-sum window.

    Exactness: all counts are exact integers; MIN(date) per (type, user)
    is deterministic.

    Shape: one (type, user) aggregate — the only data-sized shuffle —
    collapses the fact table to distinct memberships; the per-day count
    and the running sum ride (type)-keyed exchanges over O(types x days)
    rows. At 100 TB nothing ever holds a distinct-set in memory: the
    identity turns distinct-counting into pure additive prefix sums."""
    e = load(spark, sf_dir, "events")
    first_seen = (
        e.select(
            "event_type",
            "user_id",
            F.col("ts").cast("date").alias("d"),
        )
        .groupBy("event_type", "user_id")
        .agg(F.min("d").alias("day"))
    )
    new_by_day = first_seen.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    return new_by_day.select(
        "event_type",
        "day",
        "new_users",
        F.sum("new_users")
        .over(
            W.partitionBy("event_type")
            .orderBy("day")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("cum_distinct_users"),
    )


# --- win_yoy_growth -------------------------------------------------------------

_YOY_ORACLE = """
WITH m AS (
  SELECT o_orderpriority AS prio,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
           AS idx,
         CAST(SUM(CAST(floor(o_totalprice * 1e2 + CAST(0.5 AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY prio, idx
),
lagged AS (
  SELECT prio, idx, cents,
         lag(cents, 12) OVER w AS prev_cents,
         lag(idx, 12) OVER w AS prev_idx
  FROM m WINDOW w AS (PARTITION BY prio ORDER BY idx)
)
SELECT prio,
       (idx // 12) * 100 + (idx % 12) + 1 AS ym,
       CAST(cents AS DOUBLE) / 1e2 AS revenue,
       CASE WHEN prev_idx = idx - 12
            THEN CAST(prev_cents AS DOUBLE) / 1e2 END AS revenue_prior_year,
       CASE WHEN prev_idx = idx - 12
            THEN CAST(cents - prev_cents AS DOUBLE)
                   / CAST(NULLIF(prev_cents, 0) AS DOUBLE) END AS yoy_growth
FROM lagged
"""


@query("win_yoy_growth", oracle=_YOY_ORACLE, tier=2)
def win_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per order priority: monthly revenue
    with the same-month-last-year comparison and growth rate — the
    first number on any revenue report. The 12-row lag is GAP-GUARDED:
    lag(idx, 12) must equal idx - 12 or the comparison nulls out, so a
    missing month can never silently compare against month-13 (the
    classic offset-window bug).

    Exactness: revenue is exact cents; the growth rate is one
    shared-text IEEE division of exact integers, NULLIF-guarded.

    Shape: one (priority, month) aggregate — the only data-sized
    shuffle — then both lags ride ONE priority-keyed window over the
    O(priorities x months) frame."""
    o = load(spark, sf_dir, "orders")
    m = (
        o.select(
            F.col("o_orderpriority").alias("prio"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("long")
            .alias("idx"),
            quantize_long("o_totalprice", 2).alias("c"),
        )
        .groupBy("prio", "idx")
        .agg(F.sum("c").alias("cents"))
    )
    w = W.partitionBy("prio").orderBy("idx")
    lagged = m.select(
        "prio",
        "idx",
        "cents",
        F.lag("cents", 12).over(w).alias("prev_cents"),
        F.lag("idx", 12).over(w).alias("prev_idx"),
    )
    return lagged.select(
        "prio",
        F.expr("(idx DIV 12) * 100 + (idx % 12) + 1").alias("ym"),
        F.expr("CAST(cents AS DOUBLE) / 1e2").alias("revenue"),
        F.expr(
            "CASE WHEN prev_idx = idx - 12"
            " THEN CAST(prev_cents AS DOUBLE) / 1e2 END"
        ).alias("revenue_prior_year"),
        F.expr(
            "CASE WHEN prev_idx = idx - 12"
            " THEN CAST(cents - prev_cents AS DOUBLE)"
            " / CAST(NULLIF(prev_cents, 0) AS DOUBLE) END"
        ).alias("yoy_growth"),
    )
