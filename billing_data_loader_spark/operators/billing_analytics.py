"""Product-analytics operators over the events stream (SURVEY.md §2.11,
round 4): cohort retention, funnel conversion, OHLC resampling, and
revenue proration — the query shapes a billing/usage warehouse serves
daily, each expressed as pure DataFrame relational algebra with a DuckDB
oracle twin.

Scale stance: everything here keys its shuffles on (user_id) or a
coarse time bucket; no global windows, no driver loops. Cohort and
funnel both collapse the fact table to one row per user FIRST (map-side
combined min/count aggregates), so the expensive joins run on the
distinct-user frame — 1e9 users, not 1e13 events — and the final
matrices are O(days² ) / O(steps) rows at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.determinism import MICRO, dsum, o_dsum, quantize_long
from ..plans.registry import query
from ..tables import load

# --- agg_retention_cohort ---------------------------------------------------

# Day-granularity cohort retention triangle: users grouped by first-seen
# day, counted on each later active day. day_n is the offset so the frame
# is the classic retention matrix (cohort_day x day_n).
_RETENTION_ORACLE = """
WITH firstday AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort_day, CAST(e.ts AS DATE) AS active_day
  FROM events e JOIN firstday f ON e.user_id = f.user_id
)
SELECT cohort_day,
       CAST(date_diff('day', cohort_day, active_day) AS INTEGER) AS day_n,
       COUNT(*) AS n_users
FROM activity
GROUP BY cohort_day, day_n
"""


@query("agg_retention_cohort", oracle=_RETENTION_ORACLE, tier=2)
def agg_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: for each first-seen-day cohort, how many
    of its users were active N days later. ONE user_id-keyed shuffle, no
    join: collect_set(day) per user (map-side combined, state bounded by
    the day-granularity horizon — 31 here, a few thousand on any real
    retention window), cohort day = array_min of the same set, explode,
    then the tiny (cohort, offset) matrix aggregate whose key space is
    O(days²) regardless of user count. The naive join form (first-day
    frame ⋈ distinct activity) costs a second shuffle of the activity
    table for the same answer."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("active_day")
    )
    per_user = ev.groupBy("user_id").agg(
        F.collect_set("active_day").alias("days")
    )
    exploded = per_user.select(
        F.array_min("days").alias("cohort_day"),
        F.explode("days").alias("active_day"),
    )
    return (
        exploded.groupBy(
            "cohort_day",
            F.datediff("active_day", "cohort_day").alias("day_n"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# --- agg_funnel_steps -------------------------------------------------------

# Ordered funnel view -> click -> purchase: each step's timestamp must be
# >= the previous step's FIRST qualifying timestamp (the standard
# first-touch funnel). Output is the 3-row step/count table.
_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
  GROUP BY e.user_id
)
SELECT step, n_users FROM (
  SELECT '1_view' AS step, COUNT(*) AS n_users FROM v
  UNION ALL SELECT '2_click', COUNT(*) FROM c
  UNION ALL SELECT '3_purchase', COUNT(*) FROM p
)
"""


@query("agg_funnel_steps", oracle=_FUNNEL_ORACLE, tier=2)
def agg_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch funnel conversion (view -> click -> purchase): a user
    advances a step only with an event at-or-after their first qualifying
    event of the previous step. ONE user_id-keyed shuffle for the whole
    funnel: per user, min view ts plus sorted click/purchase ts arrays
    (map-side combined), then the step chain is pure array algebra —
    t_click = min click >= t_view, t_purchase = min purchase >= t_click —
    inside codegen, and one 1-row aggregate emits all three counts
    (unpivoted to the step/count rows with inline, no extra exchange).
    The per-step join form costs one shuffle of the filtered fact table
    PER STEP for the same answer. Hot-user caveat: the collected arrays
    are O(events/user); a per-(user, day) pre-aggregate bounds them if a
    single user can exceed executor memory."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    per_user = ev.filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        ),
        F.sort_array(
            F.collect_list(F.when(F.col("event_type") == "click", F.col("ts")))
        ).alias("clicks"),
        F.sort_array(
            F.collect_list(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            )
        ).alias("purchases"),
    )
    stepped = per_user.withColumn(
        "t_click",
        F.array_min(F.filter("clicks", lambda c: c >= F.col("t_view"))),
    ).withColumn(
        "t_purchase",
        F.array_min(F.filter("purchases", lambda p: p >= F.col("t_click"))),
    )
    counts = stepped.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
    )
    return counts.select(
        F.inline(
            F.array(
                F.struct(
                    F.lit("1_view").alias("step"), F.col("n_view").alias("n_users")
                ),
                F.struct(
                    F.lit("2_click").alias("step"),
                    F.col("n_click").alias("n_users"),
                ),
                F.struct(
                    F.lit("3_purchase").alias("step"),
                    F.col("n_purchase").alias("n_users"),
                ),
            )
        )
    )


# --- ts_resample_ohlc -------------------------------------------------------

# Hourly OHLC downsample per event type: open/close pick the value at the
# min/max of the (ts, event_id) TOTAL order — Spark via min_by/max_by on
# the struct, DuckDB via ordered-set FIRST/LAST (its min_by cannot take a
# struct key). No window, no sort, one hash aggregate. Values are raw
# parquet doubles carried through un-arithmetic'd, so both engines agree
# bitwise; high/low likewise.
_OHLC_ORACLE = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
       FIRST(value ORDER BY ts, event_id) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       LAST(value ORDER BY ts, event_id) AS close,
       COUNT(*) AS n_events
FROM events
GROUP BY bucket, event_type
"""


@query("ts_resample_ohlc", oracle=_OHLC_ORACLE, tier=2)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling (the billing meter's hourly rollup): open/high/
    low/close of `value` per (hour, event_type). min_by/max_by over the
    (ts, event_id) struct gives the first/last value under a TOTAL order
    (event_id breaks ts ties), so the result is deterministic without any
    window or sort — a single map-side-combinable aggregate whose state
    is 4 scalars + a struct per group. The 100 TB plan is scan -> partial
    agg -> one exchange of O(hours x types) rows."""
    ev = load(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("bucket"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


# --- bill_proration_daily ---------------------------------------------------

# Revenue recognition: each order's total is recognized evenly over a
# 30-day service window from the order date. The per-day rate is ONE
# double division (o_totalprice / 30.0) — identical IEEE result on both
# engines — and the per-day totals are decimal-quantized sums.
_PRORATION_ORACLE = f"""
SELECT recog_day, {o_dsum("daily_rev", "recognized")},
       COUNT(*) AS n_orders
FROM (
  SELECT UNNEST(generate_series(
           CAST(o_orderdate AS DATE),
           CAST(o_orderdate AS DATE) + 29,
           INTERVAL 1 DAY
         )) AS recog_day,
         o_totalprice / 30.0 AS daily_rev
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1997-03-01'
)
GROUP BY recog_day
"""


@query("bill_proration_daily", oracle=_PRORATION_ORACLE, tier=2)
def bill_proration_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue recognition: prorate each order's total over a
    30-day service window (the billing engine's accrual view). sequence()
    + explode generates the 30 recognition days map-side — no join against
    a calendar dim — and the per-day rollup is one hash aggregate keyed on
    day. Row inflation is a fixed 30x before the partial aggregate, which
    combines map-side, so the exchange carries O(days) rows per task.
    The date filter prunes the orders scan to the recognition quarter."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-03-01").cast("timestamp"))
    )
    days = F.sequence(
        F.to_date("o_orderdate"),
        F.date_add(F.to_date("o_orderdate"), 29),
    )
    exploded = o.select(
        F.explode(days).alias("recog_day"),
        (F.col("o_totalprice") / 30.0).alias("daily_rev"),
    )
    # DuckDB's generate_series over DATE yields TIMESTAMP elements; match.
    return (
        exploded.groupBy(F.col("recog_day").cast("timestamp").alias("recog_day"))
        .agg(
            dsum("daily_rev", "recognized"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# --- ext_seq_pattern_detect -------------------------------------------------

# MATCH_RECOGNIZE-lite: detect the earliest-match view->click->purchase
# subsequence per user and count its non-overlapping occurrences. The
# per-user event history is reduced to a type-initial string in (ts,
# event_id) total order; the lazy pattern v.*?c.*?p then implements the
# standard greedy funnel scan (each match binds the earliest qualifying
# c and p, and counting advances past the match end) identically in
# Java regex and RE2.
_SEQ_PATTERN = "v.*?c.*?p"

_SEQ_DETECT_ORACLE = f"""
SELECT user_id,
       LENGTH(s) AS n_events,
       CAST(LENGTH(regexp_extract_all(s, '{_SEQ_PATTERN}')) AS INTEGER)
         AS n_funnels,
       LENGTH(regexp_extract_all(s, '{_SEQ_PATTERN}')) > 0 AS has_funnel
FROM (
  SELECT user_id,
         string_agg(CASE event_type
                      WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                      WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                      ELSE 'e' END, ''
                    ORDER BY ts, event_id) AS s
  FROM events GROUP BY user_id
)
"""


@query("ext_seq_pattern_detect", oracle=_SEQ_DETECT_ORACLE, tier=2)
def ext_seq_pattern_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern detection (MATCH_RECOGNIZE-lite): per user,
    count non-overlapping view->click->purchase subsequences. ONE
    user-keyed shuffle: events collapse to a type-initial string via
    sorted struct arrays (map-side combined collect_list, total-ordered
    by (ts, event_id)), then the regex count runs in codegen over the
    per-user string. Hot-user caveat as agg_funnel_steps: the collected
    array is O(events/user); cap or pre-bucket per (user, day) if one
    user exceeds task memory. The lazy regex makes Java and RE2 agree on
    the greedy funnel semantics (earliest-match, advance past match)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
        .alias("chr"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "chr"))),
                lambda x: x["chr"],
            ),
        ).alias("s")
    )
    n_funnels = F.regexp_count("s", F.lit(_SEQ_PATTERN))
    return per_user.select(
        "user_id",
        F.length("s").cast("bigint").alias("n_events"),
        n_funnels.cast("int").alias("n_funnels"),
        (n_funnels > 0).alias("has_funnel"),
    )


# --- agg_incremental_merge --------------------------------------------------

# Incremental view maintenance: a materialized daily rollup is brought up
# to date by MERGING the new batch's partial aggregates — never by
# rescanning history. The base/delta split here is event_id parity, so
# most (day, type) groups receive contributions from BOTH sides and the
# merge genuinely combines partials (the late-arriving-data case), not
# just appends new groups. Partial sums are scale-6 decimals; adding two
# of them back through decimal keeps the merged total bit-identical to
# the full-recompute oracle (decimal addition is associative).
_INCR_ORACLE = f"""
SELECT CAST(ts AS DATE) AS day, event_type,
       COUNT(*) AS n_events,
       {o_dsum("value", "sum_value")}
FROM events
GROUP BY day, event_type
"""


@query("agg_incremental_merge", oracle=_INCR_ORACLE, tier=2)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: the base rollup (even event_ids) is
    MATERIALIZED to parquet and read back — the standing aggregate table —
    then the delta batch's (odd event_ids) partial rollup full-outer-joins
    it on the group key and partials add. The merge touches O(groups)
    rows on both sides (never the fact history), which is the entire
    point at 100 TB: per-batch cost is the delta scan + a groups-sized
    join. Counts add as longs; sums stay exact micro-unit integers
    end-to-end — parquet stores the decimal(38,0) partials exactly,
    integer addition is associative, and double appears only in the final
    projection — so the result hash-matches a from-scratch recompute —
    the IVM correctness contract."""
    from ..sources.connectors import scratch_dir

    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        "event_type",
        "event_id",
        # micro-unit longs: the same floor quantization dsum/o_dsum plan,
        # so the merged total is bit-identical to a from-scratch dsum
        quantize_long("value").alias("v"),
    )

    def rollup(df: DataFrame) -> DataFrame:
        # the partial sum stays exact INTEGER (decimal(38,0)) through the
        # materialized table: a double round-trip is exact only while
        # |partial|*1e6 < 2^53 (~9e9 money units), above which the merged
        # total silently diverges from the full-recompute contract
        # (ADVICE r4). Parquet stores decimals natively; double appears
        # only in the final projection.
        return df.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(38,0)")).alias("s"),
        )

    base_path = scratch_dir(sf_dir, "incr_base_rollup")
    rollup(ev.filter(F.col("event_id") % 2 == 0)).write.mode(
        "overwrite"
    ).parquet(base_path)
    base = spark.read.parquet(base_path).select(
        "day", "event_type", F.col("n").alias("n_b"), F.col("s").alias("s_b")
    )
    delta = rollup(ev.filter(F.col("event_id") % 2 == 1)).select(
        "day", "event_type", F.col("n").alias("n_d"), F.col("s").alias("s_d")
    )
    dec = "decimal(38,0)"
    return base.join(delta, ["day", "event_type"], "full_outer").select(
        "day",
        "event_type",
        (
            F.coalesce("n_b", F.lit(0)) + F.coalesce("n_d", F.lit(0))
        ).alias("n_events"),
        # integer partials add exactly; the double cast THEN the 1e6
        # divide mirror o_dsum's op order bit-for-bit
        (
            (
                F.coalesce(F.col("s_b").cast(dec), F.lit(0).cast(dec))
                + F.coalesce(F.col("s_d").cast(dec), F.lit(0).cast(dec))
            ).cast("double")
            / MICRO
        ).alias("sum_value"),
    )


# --- bill_dunning_aging -------------------------------------------------------

#: Aging bands in days outstanding, the AR-standard 30/60/90 split. The
#: band expression is shared verbatim by both engines (integer datediff
#: against the corpus as-of date — no float anywhere).
_AGING_CASE = """CASE WHEN age_days <= 30 THEN '00-30'
                      WHEN age_days <= 60 THEN '31-60'
                      WHEN age_days <= 90 THEN '61-90'
                      ELSE '90+' END"""

_AGING_ORACLE = f"""
WITH as_of_d AS (SELECT MAX(o_orderdate) AS as_of FROM orders
              WHERE o_orderstatus = 'O'),
aged AS (
  SELECT o_orderpriority,
         datediff('day', o_orderdate, as_of) AS age_days,
         o_totalprice
  FROM orders, as_of_d
  WHERE o_orderstatus = 'O'
)
SELECT ({_AGING_CASE}) AS age_band,
       o_orderpriority,
       COUNT(*) AS n_open,
       {o_dsum("o_totalprice", "open_amount")}
FROM aged
GROUP BY age_band, o_orderpriority
"""


@query("bill_dunning_aging", oracle=_AGING_ORACLE, tier=2)
def bill_dunning_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accounts-receivable aging — the dunning report every billing
    system ships: open (status 'O') orders bucketed by days outstanding
    against the corpus as-of date (30/60/90 bands), with open count and
    exposure amount per (band, priority). The as-of date is MAX(order
    date) rather than a wall-clock now() so the report is deterministic
    and replayable (the determinism rule every key here follows: no
    Date.now anywhere in a graded plan).

    Shape: the status filter pushes to the parquet scan; one 1-row
    as-of fold broadcasts back (O(tasks) exchange, EXPECTED_FLAGS);
    banding is integer datediff + a shared CASE; one groupBy with
    map-side combine to a bands x priorities bounded result. At 100 TB
    the open-invoice subset is the only data that moves."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    asof = o.agg(F.max("o_orderdate").alias("as_of"))
    aged = o.crossJoin(F.broadcast(asof)).select(
        "o_orderpriority",
        F.datediff(F.col("as_of"), F.col("o_orderdate")).alias("age_days"),
        "o_totalprice",
    )
    return (
        aged.select(
            F.expr(_AGING_CASE).alias("age_band"),
            "o_orderpriority",
            "o_totalprice",
        )
        .groupBy("age_band", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_open"),
            dsum("o_totalprice", "open_amount"),
        )
    )


# --- bill_mrr_waterfall -----------------------------------------------------

# Month index = year*12 + month - 1 (dense integer line, so "consecutive
# months" is idx arithmetic, never date arithmetic); ym = the readable
# yyyymm reconstruction. Revenue quantizes to exact cents (scale 2) so
# every component sum is an exact long and only the final /100.0 is float.
_MRR_ORACLE = """
WITH base AS (
  SELECT o_custkey AS cust,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
           AS idx,
         CAST(floor(o_totalprice * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS cents
  FROM orders
),
m AS MATERIALIZED (
  SELECT cust, idx, CAST(SUM(cents) AS BIGINT) AS amt
  FROM base GROUP BY cust, idx
),
h AS (SELECT MAX(idx) AS max_idx FROM m),
w AS MATERIALIZED (
  SELECT cust, idx, amt,
         lag(idx)  OVER (PARTITION BY cust ORDER BY idx) AS pidx,
         lag(amt)  OVER (PARTITION BY cust ORDER BY idx) AS pamt,
         lead(idx) OVER (PARTITION BY cust ORDER BY idx) AS nidx
  FROM m
),
contrib AS (
  SELECT idx, 'total' AS kind, amt AS c FROM w
  UNION ALL
  SELECT idx, 'new', amt FROM w WHERE pidx IS NULL OR pidx < idx - 1
  UNION ALL
  SELECT idx, 'exp', amt - pamt FROM w WHERE pidx = idx - 1 AND amt > pamt
  UNION ALL
  SELECT idx, 'con', amt - pamt FROM w WHERE pidx = idx - 1 AND amt < pamt
  UNION ALL
  SELECT idx + 1, 'churn', -amt FROM w, h
  WHERE (nidx IS NULL OR nidx > idx + 1) AND idx + 1 <= max_idx
)
SELECT (idx // 12) * 100 + (idx % 12) + 1 AS ym,
       CAST(COALESCE(SUM(CASE WHEN kind = 'total' THEN c END), 0) AS DOUBLE)
         / 1e2 AS total_mrr,
       CAST(COALESCE(SUM(CASE WHEN kind = 'new' THEN c END), 0) AS DOUBLE)
         / 1e2 AS new_mrr,
       CAST(COALESCE(SUM(CASE WHEN kind = 'exp' THEN c END), 0) AS DOUBLE)
         / 1e2 AS expansion_mrr,
       CAST(COALESCE(SUM(CASE WHEN kind = 'con' THEN c END), 0) AS DOUBLE)
         / 1e2 AS contraction_mrr,
       CAST(COALESCE(SUM(CASE WHEN kind = 'churn' THEN c END), 0) AS DOUBLE)
         / 1e2 AS churned_mrr
FROM contrib GROUP BY idx
"""


@query("bill_mrr_waterfall", oracle=_MRR_ORACLE, tier=2)
def bill_mrr_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly-recurring-revenue waterfall (the SaaS-billing bridge): each
    customer's month-over-month billed amount classifies into NEW (first
    month, or return after a gap — reactivation books as new), EXPANSION /
    CONTRACTION (delta between consecutive active months), and CHURN (the
    full prior amount, booked the month AFTER the last active month —
    right-censored at the fixture horizon, so customers active in the
    final month never churn).  Conservation — total(m) - total(m-1) ==
    new + expansion + contraction + churn for every consecutive month
    pair — is pinned by Python replay in tests/test_round10b.py.

    Shape: one (customer, month) aggregate collapses the fact table (the
    only data-sized shuffle), a per-customer lag/lead window classifies
    (second shuffle, on the REDUCED frame — one row per customer-month),
    and every contribution row then generates MAP-SIDE as an
    explode(filter(array(...))) — no 4-way self-union re-reading the
    windowed frame.  The month horizon rides a 1-row fold
    (EXPECTED_FLAGS).  At 100 TB: the reduced frame is O(customers x
    active months), orders of magnitude under the fact table, and both
    shuffles key on customer."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_custkey").alias("cust"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("idx"),
        quantize_long("o_totalprice", 2).alias("cents"),
    )
    m = base.groupBy("cust", "idx").agg(F.sum("cents").alias("amt"))
    h = m.agg(F.max("idx").alias("max_idx"))
    ws = Window.partitionBy("cust").orderBy("idx")
    w = m.select(
        "cust",
        "idx",
        "amt",
        F.lag("idx").over(ws).alias("pidx"),
        F.lag("amt").over(ws).alias("pamt"),
        F.lead("idx").over(ws).alias("nidx"),
    ).crossJoin(F.broadcast(h))

    def entry(cond, idx_col, kind, cents_col):
        return F.when(
            cond,
            F.struct(
                idx_col.alias("idx"),
                F.lit(kind).alias("kind"),
                cents_col.alias("c"),
            ),
        )

    consec = F.col("pidx") == F.col("idx") - 1
    contrib = w.select(
        F.explode(
            F.filter(
                F.array(
                    entry(F.lit(True), F.col("idx"), "total", F.col("amt")),
                    entry(
                        F.col("pidx").isNull()
                        | (F.col("pidx") < F.col("idx") - 1),
                        F.col("idx"),
                        "new",
                        F.col("amt"),
                    ),
                    entry(
                        consec & (F.col("amt") > F.col("pamt")),
                        F.col("idx"),
                        "exp",
                        F.col("amt") - F.col("pamt"),
                    ),
                    entry(
                        consec & (F.col("amt") < F.col("pamt")),
                        F.col("idx"),
                        "con",
                        F.col("amt") - F.col("pamt"),
                    ),
                    entry(
                        (
                            F.col("nidx").isNull()
                            | (F.col("nidx") > F.col("idx") + 1)
                        )
                        & (F.col("idx") + 1 <= F.col("max_idx")),
                        F.col("idx") + 1,
                        "churn",
                        -F.col("amt"),
                    ),
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("e")
    ).select("e.*")

    def ksum(kind, alias):
        return (
            F.coalesce(F.sum(F.when(F.col("kind") == kind, F.col("c"))), F.lit(0))
            .cast("double")
            / 1e2
        ).alias(alias)

    return contrib.groupBy("idx").agg(
        ksum("total", "total_mrr"),
        ksum("new", "new_mrr"),
        ksum("exp", "expansion_mrr"),
        ksum("con", "contraction_mrr"),
        ksum("churn", "churned_mrr"),
    ).select(
        F.expr("(idx DIV 12) * 100 + (idx % 12) + 1").alias("ym"),
        "total_mrr",
        "new_mrr",
        "expansion_mrr",
        "contraction_mrr",
        "churned_mrr",
    )


# --- bill_tax_rounding_audit --------------------------------------------------

# Line tax books in micro-units (scale 6, exact long), and BOTH rounding
# policies derive from the same integer: per-line cents round each line's
# micro amount, invoice cents round the SUMMED micro amount. diff is the
# penny gap per invoice — pure integer arithmetic end to end.
_TAXAUDIT_ORACLE = """
WITH line AS (
  SELECT l_orderkey AS ok,
         CAST(floor(l_extendedprice * l_tax * 1e6 + CAST(0.5 AS DOUBLE))
              AS BIGINT) AS micro
  FROM lineitem
),
inv AS (
  SELECT ok,
         CAST(SUM((micro + 5000) // 10000) AS BIGINT) AS line_cents,
         (CAST(SUM(micro) AS BIGINT) + 5000) // 10000 AS inv_cents
  FROM line GROUP BY ok
)
SELECT line_cents - inv_cents AS diff_cents,
       COUNT(*) AS n_invoices,
       CAST(SUM(line_cents - inv_cents) AS BIGINT) AS leaked_cents
FROM inv GROUP BY diff_cents
"""


@query("bill_tax_rounding_audit", oracle=_TAXAUDIT_ORACLE, tier=2)
def bill_tax_rounding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tax rounding-policy reconciliation — the classic billing-correctness
    audit: per-LINE rounding (each line's tax rounded to cents, then
    summed) vs per-INVOICE rounding (exact tax summed, rounded once)
    systematically disagree by up to a few cents per invoice, and a
    billing engine must know its leakage before a tax authority does.
    Output is the distribution of the per-invoice penny gap (diff,
    invoice count, total leaked cents per bucket).

    Determinism: line tax books once in exact micro-units
    (floor(price*rate*1e6 + 0.5) — price*rate is the identical IEEE
    product in both engines), and both policies derive from that integer
    by half-up integer division — no float survives past the first
    projection. Shape: one map-side projection, one groupBy(order) with
    map-side combine, one O(distinct diffs) rollup. At 100 TB this is a
    single co-partitioned pass over lineitem."""
    li = load(spark, sf_dir, "lineitem")
    line = li.select(
        F.col("l_orderkey").alias("ok"),
        quantize_long(
            F.col("l_extendedprice").cast("double")
            * F.col("l_tax").cast("double"),
            6,
        ).alias("micro"),
    )
    inv = line.groupBy("ok").agg(
        F.sum(F.expr("(micro + 5000) DIV 10000")).alias("line_cents"),
        F.expr("(SUM(micro) + 5000) DIV 10000").alias("inv_cents"),
    )
    return (
        inv.select((F.col("line_cents") - F.col("inv_cents")).alias("diff_cents"))
        .groupBy("diff_cents")
        .agg(
            F.count(F.lit(1)).alias("n_invoices"),
            F.sum("diff_cents").alias("leaked_cents"),
        )
    )


# --- ext_attribution_credit --------------------------------------------------

# Multi-touch attribution: each purchase's value is credited to the
# touch events (view/click/signup) that precede it — and to 'direct'
# when nothing does. Three models side by side: linear (equal split,
# as exact integer micro-units via truncating division — deterministic,
# order-insensitive), first-touch, last-touch. The touch->purchase
# assignment is "next purchase strictly after the touch" in the
# (ts, event_id) total order, computed with one reverse-ordered
# last(ignorenulls) window — no self-join against the purchase stream.
_ATTRIB_ORACLE = """
WITH ev AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(floor(value * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
  FROM events
), m AS (
  SELECT *,
         last_value(CASE WHEN event_type = 'purchase' THEN event_id END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pid,
         last_value(CASE WHEN event_type = 'purchase' THEN cents END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pcents,
         last_value(CASE WHEN event_type IN ('view', 'click', 'signup')
                         THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_touch_ts,
         last_value(CASE WHEN event_type = 'purchase' THEN ts END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_purch_ts
  FROM ev
), t AS (
  SELECT event_type, user_id, ts, event_id, pid, pcents,
         COUNT(*) OVER (PARTITION BY user_id, pid) AS n_t,
         ROW_NUMBER() OVER (PARTITION BY user_id, pid
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY user_id, pid
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM m
  WHERE event_type IN ('view', 'click', 'signup') AND pid IS NOT NULL
), chan AS (
  SELECT event_type AS channel,
         CAST(COUNT(*) AS BIGINT) AS n_touchpoints,
         CAST(SUM(pcents * 10000 // n_t) AS BIGINT) AS linear_u,
         CAST(SUM(CASE WHEN rn_a = 1 THEN pcents ELSE 0 END) AS BIGINT)
           AS first_cents,
         CAST(SUM(CASE WHEN rn_d = 1 THEN pcents ELSE 0 END) AS BIGINT)
           AS last_cents
  FROM t GROUP BY event_type
), direct AS (
  SELECT 'direct' AS channel,
         CAST(COUNT(*) AS BIGINT) AS n_touchpoints,
         CAST(SUM(cents * 10000) AS BIGINT) AS linear_u,
         CAST(SUM(cents) AS BIGINT) AS first_cents,
         CAST(SUM(cents) AS BIGINT) AS last_cents
  FROM m WHERE event_type = 'purchase'
    AND (prev_touch_ts IS NULL
         OR (prev_purch_ts IS NOT NULL AND prev_purch_ts > prev_touch_ts))
)
SELECT channel, n_touchpoints,
       CAST(linear_u AS DOUBLE) / 1e6 AS linear_dollars,
       first_cents, last_cents
FROM (SELECT * FROM chan UNION ALL SELECT * FROM direct) z
"""


@query("ext_attribution_credit", oracle=_ATTRIB_ORACLE, tier=3)
def ext_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch marketing attribution over the event stream: each
    purchase's value is credited to the touch events (view / click /
    signup) that PRECEDE it in the user's (ts, event_id) total order —
    linear (equal split), first-touch, and last-touch models side by
    side, plus a 'direct' bucket for purchases with no prior touch, so
    total credit conserves the purchase ledger (pinned in
    tests/test_round11.py up to the documented truncating-division
    remainder).

    Shape: the touch->purchase assignment is ONE reverse-ordered
    last(ignorenulls) window per user — the carry-forward trick
    (ext_webdataset_index precedent), never a touch x purchase
    self-join; the per-conversion touch counts and first/last flags ride
    two more windows on the SAME user-keyed shuffle. Linear credit is an
    exact truncating integer division into 1e-6-dollar units, so channel
    sums are order-insensitive longs; the only double is the final /1e6
    rescale."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        quantize_long("value", 2).alias("cents"),
    )
    w_desc = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_asc = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    m = ev.select(
        "*",
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("event_id")),
            ignorenulls=True,
        )
        .over(w_desc)
        .alias("pid"),
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("cents")),
            ignorenulls=True,
        )
        .over(w_desc)
        .alias("pcents"),
        F.last(
            F.when(
                F.col("event_type").isin("view", "click", "signup"),
                F.col("ts"),
            ),
            ignorenulls=True,
        )
        .over(w_asc)
        .alias("prev_touch_ts"),
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("ts")),
            ignorenulls=True,
        )
        .over(w_asc)
        .alias("prev_purch_ts"),
    )
    from ..session import scoped_persist

    # two consumers (channel credits + the direct bucket) of the same
    # windowed frame — persist, or the window pipeline runs twice
    m = scoped_persist(m)
    wt = W.partitionBy("user_id", "pid")
    t = (
        m.filter(
            F.col("event_type").isin("view", "click", "signup")
            & F.col("pid").isNotNull()
        )
        .select(
            "event_type",
            "pcents",
            F.count(F.lit(1)).over(wt).alias("n_t"),
            F.row_number()
            .over(wt.orderBy("ts", "event_id"))
            .alias("rn_a"),
            F.row_number()
            .over(wt.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
            .alias("rn_d"),
        )
    )
    chan = t.groupBy(F.col("event_type").alias("channel")).agg(
        F.count(F.lit(1)).alias("n_touchpoints"),
        F.sum(F.expr("pcents * 10000 DIV n_t")).alias("linear_u"),
        F.sum(
            F.expr("CASE WHEN rn_a = 1 THEN pcents ELSE 0 END")
        ).alias("first_cents"),
        F.sum(
            F.expr("CASE WHEN rn_d = 1 THEN pcents ELSE 0 END")
        ).alias("last_cents"),
    )
    # 'direct' = no touch inside THIS purchase's conversion window (the
    # stretch since the previous purchase) — 'no touch ever' undercounts:
    # a purchase whose only touches preceded an earlier purchase would
    # otherwise vanish from both buckets and break ledger conservation
    # (found by the round-11 conservation test)
    direct = (
        m.filter(
            (F.col("event_type") == "purchase")
            & (
                F.col("prev_touch_ts").isNull()
                | (
                    F.col("prev_purch_ts").isNotNull()
                    & (F.col("prev_purch_ts") > F.col("prev_touch_ts"))
                )
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_touchpoints"),
            F.sum(F.expr("cents * 10000")).alias("linear_u"),
            F.sum("cents").alias("first_cents"),
            F.sum("cents").alias("last_cents"),
        )
        .select(
            F.lit("direct").alias("channel"),
            "n_touchpoints",
            "linear_u",
            "first_cents",
            "last_cents",
        )
    )
    return chan.unionAll(direct).select(
        "channel",
        "n_touchpoints",
        F.expr("CAST(linear_u AS DOUBLE) / 1e6").alias("linear_dollars"),
        "first_cents",
        "last_cents",
    )


# --- ext_rfm_features ---------------------------------------------------------

#: RFM quintile boundaries as exact interpolated percentiles of the
#: per-user metric distributions, rounded to 4dp on both sides (the
#: ext_outlier_clip quantile-parity stance). Scoring compares exact
#: integer metrics against the broadcast boundaries — no global NTILE
#: window, so the scoring pass stays fully map-side at any user count.
_RFM_QS = [0.2, 0.4, 0.6, 0.8]

_RFM_SEGMENT = """CASE
  WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
  WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
  WHEN r_score <= 2 THEN 'hibernating'
  WHEN f_score >= 4 THEN 'loyal'
  WHEN m_score >= 4 THEN 'big_spender'
  ELSE 'regular' END"""


def _rfm_score(col: str, qcols: list[str]) -> str:
    """1 + number of quintile boundaries strictly below the metric —
    identical comparisons on identical values in both engines."""
    terms = " + ".join(
        f"(CASE WHEN {col} > {q} THEN 1 ELSE 0 END)" for q in qcols
    )
    return f"(1 + {terms})"


_RFM_ORACLE = f"""
WITH pur AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(CAST(floor(value * 1e2 + CAST(0.5 AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS monetary_cents,
         MAX(CAST(ts AS DATE)) AS last_day
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
asof_ AS (SELECT MAX(last_day) AS g_day FROM pur),
u AS (
  SELECT user_id, freq, monetary_cents,
         CAST(g_day - last_day AS BIGINT) AS recency_days
  FROM pur, asof_
),
b AS (
  SELECT
    {", ".join(f"round(quantile_cont(CAST(recency_days AS DOUBLE), {q}), 4) AS rq{i}" for i, q in enumerate(_RFM_QS))},
    {", ".join(f"round(quantile_cont(CAST(freq AS DOUBLE), {q}), 4) AS fq{i}" for i, q in enumerate(_RFM_QS))},
    {", ".join(f"round(quantile_cont(CAST(monetary_cents AS DOUBLE), {q}), 4) AS mq{i}" for i, q in enumerate(_RFM_QS))}
  FROM u
),
scored AS (
  SELECT user_id, freq, monetary_cents, recency_days,
         6 - {_rfm_score("recency_days", ["rq0", "rq1", "rq2", "rq3"])} AS r_score,
         {_rfm_score("freq", ["fq0", "fq1", "fq2", "fq3"])} AS f_score,
         {_rfm_score("monetary_cents", ["mq0", "mq1", "mq2", "mq3"])} AS m_score
  FROM u, b
)
SELECT {_RFM_SEGMENT} AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(freq) AS BIGINT) AS n_purchases,
       CAST(SUM(monetary_cents) AS BIGINT) AS monetary_cents,
       CAST(SUM(recency_days) AS BIGINT) AS recency_days_sum
FROM scored GROUP BY segment
"""


@query("ext_rfm_features", oracle=_RFM_ORACLE, tier=2)
def ext_rfm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation — the classic
    customer-value feature block behind churn models and lifecycle
    campaigns: per user the days since last purchase (against the
    deterministic global as-of — the bill_dunning_aging no-wall-clock
    rule), purchase count, and exact cent volume; each metric scores
    1-5 against its own quintile boundaries (recency INVERTED: recent =
    5), and the (r, f, m) triple maps to a named segment. Declared
    output is the per-segment rollup a campaign planner reads.

    Shape: ONE user-keyed aggregate collapses the stream (the
    agg_retention_cohort discipline); the quintile boundaries are a
    1-row percentile fold BROADCAST back, so scoring is pure map-side
    comparison — deliberately NOT a global NTILE window, which would
    single-partition the full user frame at 100 TB (the boundary fold
    carries t-digest-style partials instead; same swap as
    ext_outlier_clip). Metrics are exact integers; boundaries round to
    4dp on both sides (the agg_percentiles interpolation-parity
    precedent), and every comparison is int-vs-identical-double."""
    ev = load(spark, sf_dir, "events")
    pur = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum(quantize_long("value", 2)).alias("monetary_cents"),
            F.max(F.to_date("ts")).alias("last_day"),
        )
    )
    asof = pur.agg(F.max("last_day").alias("g_day"))
    u = pur.crossJoin(F.broadcast(asof)).select(
        "user_id",
        "freq",
        "monetary_cents",
        F.datediff("g_day", "last_day").cast("long").alias("recency_days"),
    )
    b = u.agg(
        *[
            F.round(
                F.expr(
                    f"percentile(CAST({c} AS DOUBLE), {q})"
                ),
                4,
            ).alias(f"{p}q{i}")
            for c, p in [
                ("recency_days", "r"),
                ("freq", "f"),
                ("monetary_cents", "m"),
            ]
            for i, q in enumerate(_RFM_QS)
        ]
    )
    scored = u.crossJoin(F.broadcast(b)).selectExpr(
        "user_id",
        "freq",
        "monetary_cents",
        "recency_days",
        f"6 - {_rfm_score('recency_days', ['rq0', 'rq1', 'rq2', 'rq3'])}"
        " AS r_score",
        f"{_rfm_score('freq', ['fq0', 'fq1', 'fq2', 'fq3'])} AS f_score",
        f"{_rfm_score('monetary_cents', ['mq0', 'mq1', 'mq2', 'mq3'])}"
        " AS m_score",
    )
    return scored.groupBy(
        F.expr(_RFM_SEGMENT).alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("freq").alias("n_purchases"),
        F.sum("monetary_cents").alias("monetary_cents"),
        F.sum("recency_days").alias("recency_days_sum"),
    )


# --- bill_discount_impact -----------------------------------------------------

#: Discount rates in lineitem are exact 2dp values (0.00 .. 0.10); keying
#: the profile on the INTEGER percent bucket keeps membership exact.
_DISC_ORACLE = f"""
WITH li AS (
  SELECT CAST(floor(l_discount * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS disc_pct,
         l_extendedprice AS px,
         l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS net,
         l_quantity AS qty
  FROM lineitem
),
b AS (
  SELECT disc_pct,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         {o_dsum("px", "gross", 2)},
         {o_dsum("net", "net", 4)},
         {o_dsum("qty", "qty_sum", 2)}
  FROM li GROUP BY disc_pct
),
t AS (SELECT SUM(n_items) AS n_total FROM b)
SELECT disc_pct, n_items, gross, net,
       gross - net AS discount_given,
       qty_sum,
       CAST(n_items AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS item_share,
       (gross - net) / gross AS effective_rate
FROM b CROSS JOIN t
"""


@query("bill_discount_impact", oracle=_DISC_ORACLE, tier=2)
def bill_discount_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-depth profile: for every discount percent bucket, the
    line-item count, gross vs net revenue, total discount given,
    quantity moved, and the realized effective rate — the pricing-team
    read ("is 6% discount actually moving more volume than 5%?") that
    anchors margin reviews; the per-month revenue trend lives in
    win_yoy_growth, this is its pricing cross-section.

    Exactness: bucket membership is an integer percent (discounts are
    exact 2dp rates, floor(x*100 + 0.5) can never straddle a boundary);
    gross/net/qty are floor-quantized per row (scale 2/4/2) before the
    DECIMAL(38,0) sums (the determinism.o_dsum discipline); shares and
    effective rates are shared-text divisions of those exact sums.

    Shape: one map-side bucket projection, ONE 11-group aggregate with
    full partial aggregation (the exchange carries one row per bucket
    per task), a 1-row total fold broadcast back (EXPECTED_FLAGS). The
    fact table is read once, projected to 3 columns at the scan."""
    li = load(spark, sf_dir, "lineitem").select(
        quantize_long("l_discount", 2).alias("disc_pct"),
        F.col("l_extendedprice").alias("px"),
        (
            F.col("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount"))
        ).alias("net"),
        F.col("l_quantity").alias("qty"),
    )
    b = li.groupBy("disc_pct").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("px", "gross", 2),
        dsum("net", "net", 4),
        dsum("qty", "qty_sum", 2),
    )
    t = b.agg(F.sum("n_items").alias("n_total"))
    return b.crossJoin(F.broadcast(t)).select(
        "disc_pct",
        "n_items",
        "gross",
        "net",
        (F.col("gross") - F.col("net")).alias("discount_given"),
        "qty_sum",
        F.expr(
            "CAST(n_items AS DOUBLE) / CAST(n_total AS DOUBLE)"
        ).alias("item_share"),
        F.expr("(gross - net) / gross").alias("effective_rate"),
    )


# --- bill_cohort_arpu -----------------------------------------------------------

_COHORT_ARPU_ORACLE = """
WITH o AS (
  SELECT o_custkey AS cust,
         CAST(EXTRACT(year FROM o_orderdate) * 12
              + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS mi,
         CAST(floor(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5)
              AS BIGINT) AS cents
  FROM orders
),
cm AS (
  SELECT cust, mi, CAST(SUM(cents) AS BIGINT) AS cents
  FROM o GROUP BY cust, mi
),
firsts AS (SELECT cust, MIN(mi) AS cohort_mi FROM cm GROUP BY cust)
SELECT f.cohort_mi, c.mi - f.cohort_mi AS age_months,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(c.cents) AS BIGINT) AS revenue_cents,
       CAST(SUM(c.cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS arpu_cents
FROM cm c JOIN firsts f ON c.cust = f.cust
GROUP BY f.cohort_mi, c.mi - f.cohort_mi
"""


@query("bill_cohort_arpu", oracle=_COHORT_ARPU_ORACLE, tier=2)
def bill_cohort_arpu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort ARPU triangle: customers grouped by their FIRST active
    month (the acquisition cohort), revenue per active customer at
    each cohort age — the revenue-dimension completion of
    agg_retention_cohort's count triangle (retention says who came
    back; ARPU says what the returners were worth, the number a
    payback-period model consumes directly). Month index uses the
    zero-based year*12 + month - 1 convention (the bill_churn_rate /
    win_yoy_growth house key).

    Exactness: revenue floor-quantizes to integer cents at the order
    grain before any sum; active counts are exact; ARPU is one IEEE
    division of exact integers per (cohort, age) cell.

    Shape: one (cust, month) aggregate collapses the order stream to
    the activity grain (the only data-sized exchange, map-side
    combined); first-month is an unordered cust-keyed MIN WINDOW on
    that frame (a separate groupBy+join-back paid one more exchange
    and a join build — the join_q21_waiting lesson); the final
    rollup's key space is O(months^2 / 2) — the calendar triangle,
    model-sized at any corpus scale."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"),
        F.expr(
            "CAST(EXTRACT(year FROM o_orderdate) * 12"
            " + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT)"
        ).alias("mi"),
        quantize_long("o_totalprice", 2).alias("cents"),
    )
    cm = o.groupBy("cust", "mi").agg(F.sum("cents").alias("cents"))
    return (
        cm.select(
            "mi",
            "cents",
            F.min("mi").over(Window.partitionBy("cust")).alias("cohort_mi"),
        )
        .groupBy(
            "cohort_mi", (F.col("mi") - F.col("cohort_mi")).alias("age_months")
        )
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum("cents").alias("revenue_cents"),
            (
                F.sum("cents").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("arpu_cents"),
        )
    )


# --- ext_funnel_latency ---------------------------------------------------------

_FUNNEL_LAT_ORACLE = """
WITH su AS (
  SELECT user_id, MIN(epoch_us(ts)) AS signup_us
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
pu AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS purchase_us
  FROM events e JOIN su ON e.user_id = su.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= su.signup_us
  GROUP BY e.user_id
),
u AS (
  SELECT su.user_id, su.signup_us // 86400000000 AS signup_day,
         pu.purchase_us - su.signup_us AS lat_us
  FROM su LEFT JOIN pu ON su.user_id = pu.user_id
),
rk AS (
  SELECT signup_day, lat_us,
         ROW_NUMBER() OVER (PARTITION BY signup_day
                            ORDER BY lat_us ASC, user_id ASC) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY signup_day) AS BIGINT) AS nc
  FROM u WHERE lat_us IS NOT NULL
),
med AS (
  SELECT signup_day,
         CAST(MAX(CASE WHEN rn = (nc + 1) // 2 THEN lat_us END)
              AS BIGINT) AS med_lat_us,
         CAST(MIN(lat_us) AS BIGINT) AS min_lat_us,
         CAST(MAX(lat_us) AS BIGINT) AS max_lat_us,
         CAST(COUNT(*) AS BIGINT) AS n_converted
  FROM rk GROUP BY signup_day
),
base AS (
  SELECT signup_day, CAST(COUNT(*) AS BIGINT) AS n_signups
  FROM u GROUP BY signup_day
)
SELECT b.signup_day, b.n_signups,
       COALESCE(m.n_converted, 0) AS n_converted,
       CAST(COALESCE(m.n_converted, 0) AS DOUBLE)
         / CAST(b.n_signups AS DOUBLE) AS conversion_rate,
       m.min_lat_us, m.med_lat_us, m.max_lat_us
FROM base b LEFT JOIN med m ON b.signup_day = m.signup_day
"""


@query("ext_funnel_latency", oracle=_FUNNEL_LAT_ORACLE, tier=2)
def ext_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-to-purchase conversion LATENCY by signup-day cohort: per
    day the signup count, how many converted (first purchase at or
    after their first signup), the conversion rate, and the exact
    min/median/max time-to-convert — the funnel completion of
    agg_funnel_steps (which counts stage reach; this reads how LONG
    the funnel takes, the metric growth teams alert on when checkout
    latency drifts). Unconverted cohort days emit NULL latencies, not
    fabricated zeros.

    Exactness: timestamps become exact epoch-microsecond BIGINTs
    (Spark unix_micros == DuckDB epoch_us on the session-pinned UTC
    values); latencies and day buckets are integer arithmetic; the
    median is the discrete order statistic at ceil(n/2) with a
    (latency, user) total order; the rate is one IEEE division.

    Shape: two user-keyed MIN aggregates over the filtered stream
    (map-side combine; the purchase pass semi-joins the signup frame
    on the same key — co-partitioned), one per-day rank window over
    the O(users) converted frame, and a day-keyed rollup join of two
    O(days) frames. At 100 TB everything stays keyed on user_id then
    day — the event grain never survives past the first aggregate."""
    ev = load(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.expr("unix_micros(ts)")).alias("signup_us"))
    )
    from ..session import scoped_persist

    su = scoped_persist(su)
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.expr("unix_micros(ts) >= signup_us"))
        .groupBy("user_id")
        .agg(F.min(F.expr("unix_micros(ts)")).alias("purchase_us"))
    )
    u = scoped_persist(
        su.join(pu, "user_id", "left").select(
            "user_id",
            F.expr("signup_us DIV 86400000000").alias("signup_day"),
            (F.col("purchase_us") - F.col("signup_us")).alias("lat_us"),
        )
    )
    wd = W.partitionBy("signup_day")
    rk = u.filter(F.col("lat_us").isNotNull()).select(
        "signup_day",
        "lat_us",
        F.row_number()
        .over(wd.orderBy(F.asc("lat_us"), F.asc("user_id")))
        .alias("rn"),
        F.count(F.lit(1)).over(wd).alias("nc"),
    )
    med = rk.groupBy("signup_day").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(nc + 1) DIV 2"), F.col("lat_us"))
        ).alias("med_lat_us"),
        F.min("lat_us").alias("min_lat_us"),
        F.max("lat_us").alias("max_lat_us"),
        F.count(F.lit(1)).alias("n_converted"),
    )
    base = u.groupBy("signup_day").agg(
        F.count(F.lit(1)).alias("n_signups")
    )
    return base.join(med, "signup_day", "left").select(
        "signup_day",
        "n_signups",
        F.coalesce(F.col("n_converted"), F.lit(0)).alias("n_converted"),
        (
            F.coalesce(F.col("n_converted"), F.lit(0)).cast("double")
            / F.col("n_signups").cast("double")
        ).alias("conversion_rate"),
        "min_lat_us",
        "med_lat_us",
        "max_lat_us",
    )


# --- bill_tier_migration --------------------------------------------------------

#: Monthly-spend tier edges in exact cents (fixture monthly quartiles
#: sit at ~13M / 26M / 39M cents, so S/M/L splits the base near thirds).
_TIER_MID = 20_000_000
_TIER_HIGH = 40_000_000

_TIER_CASE = (
    f"CASE WHEN cents < {_TIER_MID} THEN 'S' "
    f"WHEN cents < {_TIER_HIGH} THEN 'M' ELSE 'L' END"
)

_TIER_ORACLE = f"""
WITH cm AS (
  SELECT o_custkey AS cust,
         YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS mi,
         CAST(SUM(CAST(floor(o_totalprice * 1e2 + CAST(0.5 AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
),
tiered AS (
  SELECT cust, mi, cents, {_TIER_CASE} AS tier FROM cm
),
trans AS (
  SELECT cust, mi, tier AS to_tier,
         CASE WHEN LAG(mi) OVER w = mi - 1 THEN LAG(tier) OVER w
              ELSE 'NEW' END AS from_tier
  FROM tiered
  WINDOW w AS (PARTITION BY cust ORDER BY mi ASC)
),
g AS (
  SELECT from_tier, to_tier, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM trans GROUP BY from_tier, to_tier
)
SELECT from_tier, to_tier, n_transitions,
       CAST(n_transitions AS DOUBLE)
         / CAST(SUM(n_transitions) OVER (PARTITION BY from_tier)
                AS DOUBLE) AS row_share
FROM g
"""


@query("bill_tier_migration", oracle=_TIER_ORACLE, tier=2)
def bill_tier_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month spend-tier transition matrix (S < 200k, M <
    400k, L >= 400k currency units of monthly billed volume): every
    consecutive active month-pair books one (from_tier -> to_tier)
    transition, a month after a gap (or a customer's first month)
    books from the NEW pseudo-state — the plan-migration view a
    pricing/retention team reads that bill_mrr_waterfall's
    dollar-bridge aggregates away: the waterfall says HOW MUCH
    expansion revenue booked, this says HOW MANY customers crossed
    which tier boundary, and the row-share column is the empirical
    transition probability a Markov LTV model consumes directly.

    Exactness: month totals are exact cent integers (the shared floor
    quantizer); tier membership and gap detection are integer
    decisions on exact cents and month indexes (year*12+month-1, the
    win_yoy_growth convention); the row share is one IEEE division of
    exact counts.

    Shape: one (customer, month) aggregate collapses the fact table
    (the only data-sized shuffle — the bill_mrr_waterfall plan), a
    per-customer LAG window on the REDUCED frame (co-partitioned on
    the customer key), then ONE tier-pair aggregate whose output is
    bounded by the 4x3 state grid, with an O(grid) window fold. At
    100 TB both exchanges key on the customer."""
    o = load(spark, sf_dir, "orders")
    cm = (
        o.select(
            F.col("o_custkey").alias("cust"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .alias("mi"),
            quantize_long("o_totalprice", 2).alias("c0"),
        )
        .groupBy("cust", "mi")
        .agg(F.sum("c0").cast("long").alias("cents"))
    )
    tiered = cm.select(
        "cust", "mi", "cents", F.expr(_TIER_CASE).alias("tier")
    )
    wc = W.partitionBy("cust").orderBy(F.asc("mi"))
    trans = tiered.select(
        "cust",
        "mi",
        F.col("tier").alias("to_tier"),
        F.when(
            F.lag("mi").over(wc) == F.col("mi") - 1,
            F.lag("tier").over(wc),
        )
        .otherwise(F.lit("NEW"))
        .alias("from_tier"),
    )
    g = trans.groupBy("from_tier", "to_tier").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    return g.select(
        "from_tier",
        "to_tier",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions")
            .over(W.partitionBy("from_tier"))
            .cast("double")
        ).alias("row_share"),
    )
