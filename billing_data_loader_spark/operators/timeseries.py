"""Time-series resample / gap-fill (hypertable-style rollup).

The reference's billing exports are daily snapshots with holes (no usage on
an idle day); downstream revenue reporting needs a dense per-account daily
series carrying the last known reading forward. This is the classic
timescale/hypertable ``time_bucket_gapfill + locf`` operator, expressed
Spark-first:

1. one shuffle to (user, day) for the per-day last reading
   (``max_by(value, ts)`` — (user_id, ts) is unique in the fixture, so
   the pick is deterministic; with colliding timestamps you'd order by a
   (ts, event_id) composite instead),
2. a per-user day grid from ``sequence()`` + ``explode`` (rows are
   generated map-side off a tiny per-user (first_day, global_end) frame —
   no shuffle),
3. a left join of grid to readings plus ``last(..., ignorenulls=True)``
   over (user, day) — one shuffle, partitioned per user, never global.

Scale: state per task is one partition of users x days; the grid explode
is linear in output rows and the forward-fill window is partitioned on
user_id, so the plan scales with users, not with the global timeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.determinism import o_davg, quantize_long
from ..plans.registry import query
from ..tables import load

# DuckDB mirrors every step: arg_max(value, ts) for the per-day last
# reading (ties impossible: (user_id, ts) unique in the fixtures),
# generate_series for the grid, last_value IGNORE NULLS for the fill.
_GAPFILL_ORACLE = """
WITH daily AS (
  SELECT user_id,
         date_trunc('day', ts) AS day,
         arg_max(value, ts) AS day_val
  FROM events GROUP BY user_id, day
),
bounds AS (SELECT max(day) AS g_end FROM daily),
grid AS (
  SELECT u.user_id, unnest(generate_series(u.first_day, b.g_end,
                                           INTERVAL 1 DAY)) AS day
  FROM (SELECT user_id, min(day) AS first_day FROM daily GROUP BY user_id) u
  CROSS JOIN bounds b
)
SELECT g.user_id, g.day,
       last_value(d.day_val IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS val_ff,
       CAST(d.day_val IS NULL AS BIGINT) AS is_gap
FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
"""


@query("ts_gapfill", oracle=_GAPFILL_ORACLE, tier=3)
def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user daily series with last-observation-carried-forward.

    Grid: every day from the user's first reading to the global last day.
    ``val_ff`` carries the most recent per-day last reading (greatest ts
    that day; (user_id, ts) is verified unique at every fixture SF, so both
    engines pick the same row); ``is_gap`` marks filled days."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.expr("max_by(value, ts)").alias("day_val"))

    bounds = daily.agg(F.max("day").alias("g_end"))
    grid = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("first_day"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(
                F.sequence("first_day", "g_end", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("day_val", ignorenulls=True).over(w).alias("val_ff"),
            F.col("day_val").isNull().cast("long").alias("is_gap"),
        )
    )


# --- ts_interpolate_linear --------------------------------------------------

# Hourly mean series per user with linear interpolation across gaps —
# the second standard hypertable fill (ts_gapfill covers LOCF). Hourly
# means are floor-quantized (davg/o_davg) so both engines interpolate from
# bit-identical endpoints; the interpolation expression is written
# identically on both sides, so the same IEEE ops on the same doubles
# yield the same double — emitted RAW. Quantizing it would BREAK parity:
# scale-6 endpoints times dyadic hour fractions land exactly on scale-6
# half-boundaries ~0.1% of the time, where Spark's double->decimal cast
# rounds HALF_UP and DuckDB's half-even (150/105k rows diverged when this
# was first declared with a DECIMAL(18,6) cast).
_INTERP_ORACLE = f"""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hr,
         {o_davg("value", "hv")}
  FROM events GROUP BY user_id, hr
), grid AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
  FROM (SELECT user_id, min(hr) AS mn, max(hr) AS mx
        FROM hourly GROUP BY user_id)
), joined AS (
  SELECT g.user_id, g.hr, h.hv,
         last_value(h.hv IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.hr
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         first_value(h.hv IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.hr
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         last_value(CASE WHEN h.hv IS NOT NULL THEN g.hr END IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.hr
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
         first_value(CASE WHEN h.hv IS NOT NULL THEN g.hr END IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.hr
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM grid g LEFT JOIN hourly h ON h.user_id = g.user_id AND h.hr = g.hr
)
SELECT user_id, hr,
       CASE WHEN hv IS NOT NULL THEN hv
            ELSE pv + (nv - pv) * (CAST(epoch(hr) - epoch(pt) AS DOUBLE)
                                   / CAST(epoch(nt) - epoch(pt) AS DOUBLE))
       END AS val,
       CAST(hv IS NULL AS BIGINT) AS is_interp
FROM joined
"""


@query("ts_interpolate_linear", oracle=_INTERP_ORACLE, tier=3)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user hourly series, gaps filled by linear interpolation
    between the neighboring observed hours.

    Shape: ONE (user, hour) aggregate, then lead() over the OBSERVED
    frame only, then each inter-observation segment explodes its missing
    hours map-side with both endpoints already attached. The naive form
    (dense grid -> left join observations -> 4 fill windows over the
    grid) sorts and windows the full output cardinality — and locally
    AQE coalesces the ~30 MB grid shuffle to one partition, serializing
    it (16-75 s at sf0.1); segment-explode never joins or windows
    anything bigger than the observed rows (~2 s). At 100 TB the win is
    the same: window state scales with observations, output rows are
    generated inside the projection. The repartition before the explode
    pins real partitions (AQE's byte heuristic under-provisions
    pre-explode frames). Endpoints are never null inside the span, so
    the interpolation needs no edge guard; the last observation of each
    user emits itself only (span ends at the last observed hour)."""
    from ..functions.determinism import davg

    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hr")
    ).agg(davg("value", "hv"))
    lead_w = W.partitionBy("user_id").orderBy("hr")
    seg = (
        hourly.repartition(32, F.col("user_id"))
        .select(
            "user_id",
            "hr",
            "hv",
            F.lead("hr").over(lead_w).alias("nt"),
            F.lead("hv").over(lead_w).alias("nv"),
        )
    )
    # each observed row emits itself + the missing hours up to (but not
    # including) the next observation; sequence() is empty when the next
    # observation is the adjacent hour (or absent)
    gap_hours = F.when(
        F.col("nt").isNotNull()
        & (F.col("nt") > F.col("hr") + F.expr("interval 1 hour")),
        F.sequence(
            F.col("hr") + F.expr("interval 1 hour"),
            F.col("nt") - F.expr("interval 1 hour"),
            F.expr("interval 1 hour"),
        ),
    ).otherwise(F.array().cast("array<timestamp>"))
    rows = seg.select(
        "user_id",
        "hr",
        "hv",
        "nt",
        "nv",
        F.explode(
            F.concat(F.array(F.lit(None).cast("timestamp")), gap_hours)
        ).alias("ghr"),
    )
    frac = (
        (F.unix_timestamp("ghr") - F.unix_timestamp("hr")).cast("double")
        / (F.unix_timestamp("nt") - F.unix_timestamp("hr")).cast("double")
    )
    is_interp = F.col("ghr").isNotNull()
    return rows.select(
        "user_id",
        F.coalesce("ghr", "hr").alias("hr"),
        F.when(is_interp, F.col("hv") + (F.col("nv") - F.col("hv")) * frac)
        .otherwise(F.col("hv"))
        .alias("val"),
        is_interp.cast("long").alias("is_interp"),
    )


# --- ts_ewma_smooth ---------------------------------------------------------

#: EWMA decay w = 1 - alpha (alpha = 0.2) over a finite 12-observation
#: horizon. Weight literals are Python-computed doubles embedded via
#: repr(): the shortest round-trip decimal parses back to the identical
#: double in both engines, so no pow() call (whose libm could differ)
#: ever runs inside a query.
_EWMA_W = 0.8
_EWMA_H = 12


def _ewma_terms(val: str, part: str, order: str) -> tuple[str, str]:
    """(numerator, denominator) SQL for the finite-horizon EWMA: a
    left-to-right sum of w^j * lag_j with null-masked weights, textually
    identical in Spark and DuckDB."""
    nums, dens = [], []
    for j in range(_EWMA_H):
        w = repr(_EWMA_W**j)
        lag = (
            val
            if j == 0
            else f"lag({val}, {j}) OVER (PARTITION BY {part} ORDER BY {order})"
        )
        nums.append(
            f"(CAST({w} AS DOUBLE) * COALESCE({lag}, CAST(0.0 AS DOUBLE)))"
        )
        dens.append(
            f"(CASE WHEN {lag} IS NULL THEN CAST(0.0 AS DOUBLE) "
            f"ELSE CAST({w} AS DOUBLE) END)"
        )
    return " + ".join(nums), " + ".join(dens)


_EWMA_NUM, _EWMA_DEN = _ewma_terms("rev", "prio", "idx")

_EWMA_ORACLE = f"""
WITH m AS (
  SELECT o_orderpriority AS prio,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
           AS idx,
         CAST(SUM(CAST(floor(o_totalprice * 1e2 + CAST(0.5 AS DOUBLE))
                       AS BIGINT)) AS DOUBLE) / 1e2 AS rev
  FROM orders GROUP BY prio, idx
)
SELECT prio,
       (idx // 12) * 100 + (idx % 12) + 1 AS ym,
       rev,
       floor((({_EWMA_NUM}) / ({_EWMA_DEN})) * 1e6 + CAST(0.5 AS DOUBLE))
         / 1e6 AS ewma
FROM m
"""


@query("ts_ewma_smooth", oracle=_EWMA_ORACLE, tier=2)
def ts_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average over each priority's monthly
    revenue series — the smoothing pass behind every billing trend chart
    and alerting baseline. Finite-horizon form (the last 12
    OBSERVATIONS, weights w^j renormalized over the terms that exist):
    the infinite recursion ewma_t = a*x_t + (1-a)*ewma_{t-1} is
    inherently sequential, while the truncated form is a fixed linear
    combination of window lags — embarrassingly parallel, numerically
    identical to the recursion up to w^12 ≈ 0.069 of mass, and robust to
    series-head/gap months by construction (missing lags renormalize out
    rather than decaying a stale carry).

    Determinism: revenue is exact cents; the weight literals are
    repr()'d doubles (no engine libm pow in the query) and the
    numerator/denominator sums evaluate left-to-right in the same order
    in both engines — the whole expression is shared SQL text. Shape:
    one (priority, month) aggregate (the only data shuffle), then ONE
    per-priority window evaluating all 12 lags over a frame of
    O(priorities x months) rows; at 100 TB the lag window reads the
    reduced frame, never the fact table."""
    o = load(spark, sf_dir, "orders")
    m = (
        o.select(
            F.col("o_orderpriority").alias("prio"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("long")
            .alias("idx"),
            quantize_long("o_totalprice", 2).alias("cents"),
        )
        .groupBy("prio", "idx")
        .agg((F.sum("cents").cast("double") / 1e2).alias("rev"))
    )
    return m.select(
        "prio",
        F.expr("(idx DIV 12) * 100 + (idx % 12) + 1").alias("ym"),
        "rev",
        F.expr(
            f"floor((({_EWMA_NUM}) / ({_EWMA_DEN})) * 1e6 "
            "+ CAST(0.5 AS DOUBLE)) / 1e6"
        ).alias("ewma"),
    )


# --- ts_anomaly_mad ---------------------------------------------------------

#: Iglewicz-Hoaglin modified z-score: 0.6745 * (x - median) / MAD, flag
#: |z| > 3.5. Both constants are the published defaults.
_MAD_K = 0.6745
_MAD_CUT = 3.5

_MAD_ORACLE = f"""
WITH q AS (
  SELECT event_type,
         CAST(floor(value * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
  FROM events
),
med AS (
  SELECT event_type, quantile_cont(cents, 0.5) AS med FROM q
  GROUP BY event_type
),
dev AS (
  SELECT q.event_type, q.cents, med.med,
         abs(CAST(q.cents AS DOUBLE) - med.med) AS adev
  FROM q JOIN med ON q.event_type = med.event_type
),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev
  GROUP BY event_type
)
SELECT dev.event_type,
       COUNT(*) AS n,
       floor(ANY_VALUE(dev.med) / 1e2 * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6
         AS median_value,
       floor(ANY_VALUE(mad.mad) / 1e2 * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6
         AS mad_value,
       CAST(SUM(CASE WHEN mad.mad = 0
                       THEN CASE WHEN CAST(dev.cents AS DOUBLE) <> dev.med
                                 THEN 1 ELSE 0 END
                     WHEN abs({_MAD_K!r}
                             * (CAST(dev.cents AS DOUBLE) - dev.med)
                             / mad.mad) > {_MAD_CUT!r}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM dev JOIN mad ON dev.event_type = mad.event_type
GROUP BY dev.event_type
"""


@query("ts_anomaly_mad", oracle=_MAD_ORACLE, tier=2)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection per event type via the median/MAD modified
    z-score (Iglewicz-Hoaglin): median and MAD are 50%-breakdown
    estimators, so unlike mean/stddev control limits the threshold itself
    cannot be dragged by the outliers it is hunting. Output is the
    monitoring summary (n, median, MAD, anomaly count at |z| > 3.5).

    Determinism: values quantize to exact cents, so both engines
    interpolate medians over identical integers (even-count midpoints are
    exact .5s in double) and the z comparison is the same IEEE expression
    — boundary rows cannot flip one engine only. Shape: two grouped
    EXACT percentile passes (each one shuffle keyed on event_type) with
    the 5-row median/MAD frames broadcast back; at 100 TB you'd swap the
    exact percentile for approx_percentile and keep the identical
    dataflow — the exact form here is the oracle-parity choice
    (agg_percentiles precedent)."""
    e = load(spark, sf_dir, "events")
    q = e.select(
        "event_type",
        quantize_long("value", 2).alias("cents"),
    )
    med = q.groupBy("event_type").agg(
        F.percentile("cents", F.lit(0.5)).alias("med")
    )
    dev = q.join(F.broadcast(med), "event_type").select(
        "event_type",
        "cents",
        "med",
        F.abs(F.col("cents").cast("double") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    z = F.abs(
        F.lit(_MAD_K)
        * (F.col("cents").cast("double") - F.col("med"))
        / F.col("mad")
    )
    # MAD = 0 guard (code-review r10): with a degenerate group (over half
    # the values at the median) z is x/0 = NULL in BOTH engines and every
    # anomaly would silently vanish — exactly where any deviation is
    # infinitely anomalous. Divergence from the median IS the anomaly
    # flag then (matches the numpy replay: inf > 3.5 counts, 0/0 = nan
    # does not).
    is_anom = F.when(
        F.col("mad") == 0,
        F.when(F.col("cents").cast("double") != F.col("med"), 1).otherwise(0),
    ).when(z > _MAD_CUT, 1).otherwise(0)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.floor(F.first("med") / 1e2 * 1e6 + F.lit(0.5)) / 1e6
            ).alias("median_value"),
            (
                F.floor(F.first("mad") / 1e2 * 1e6 + F.lit(0.5)) / 1e6
            ).alias("mad_value"),
            F.sum(is_anom).alias("n_anomalies"),
        )
    )


# --- ts_cusum_changepoint ----------------------------------------------------

# CUSUM level-shift detection (Page 1954, the mean-shift form monitoring
# dashboards run): S_t = sum_{i<=t} (x_i - mean(x)). A sustained level
# shift makes |S_t| peak AT the change day; the flagged day is the
# argmax. All inputs are exact integer cents, the mean and the CUSUM are
# shared-text double expressions, and the peak test compares doubles
# both engines computed from identical integer inputs via identical IEEE
# ops — bit-equal by construction.
_CUSUM_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(floor(value * 1e2 + CAST(0.5 AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS day_cents
  FROM events GROUP BY day
), c AS (
  SELECT day, day_cents,
         SUM(day_cents) OVER (ORDER BY day) AS cum,
         ROW_NUMBER() OVER (ORDER BY day) AS rn,
         SUM(day_cents) OVER () AS total,
         COUNT(*) OVER () AS nd
  FROM daily
), s AS (
  SELECT day, day_cents,
         CAST(cum AS DOUBLE) - CAST(rn AS DOUBLE)
           * (CAST(total AS DOUBLE) / CAST(nd AS DOUBLE)) AS cusum
  FROM c
)
SELECT day, day_cents, cusum,
       CASE WHEN abs(cusum) = MAX(abs(cusum)) OVER () THEN 1 ELSE 0 END
         AS is_changepoint
FROM s
"""


@query("ts_cusum_changepoint", oracle=_CUSUM_ORACLE, tier=2)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over the daily revenue series: the
    cumulative sum of deviations from the series mean peaks (in absolute
    value) at the day the level shifted — the classic Page-CUSUM
    mean-shift detector a revenue-monitoring dashboard runs nightly.
    Output: per day, the exact cents, the CUSUM statistic, and the
    argmax changepoint flag.

    Shape: the DATA-sized work is one (day) aggregate with full map-side
    combine; everything after (cumulative window, global mean, peak
    test) runs on the O(days) daily frame — model-sized at any corpus
    (30 rows here; a few thousand on a decade of data), so the
    unpartitioned windows over it are the documented EXPECTED_FLAGS
    pattern, with the bucketed two-pass prefix-sum swap available if a
    series ever outgrew a partition. Cents are exact longs; the mean
    and CUSUM are shared-text doubles over identical integers."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(quantize_long("value", 2)).alias("day_cents"))
    )
    w_ord = W.orderBy("day")
    w_all = W.partitionBy()
    c = daily.select(
        "day",
        "day_cents",
        F.sum("day_cents").over(w_ord).alias("cum"),
        F.row_number().over(w_ord).alias("rn"),
        F.sum("day_cents").over(w_all).alias("total"),
        F.count(F.lit(1)).over(w_all).alias("nd"),
    )
    s = c.select(
        "day",
        "day_cents",
        F.expr(
            "CAST(cum AS DOUBLE) - CAST(rn AS DOUBLE)"
            " * (CAST(total AS DOUBLE) / CAST(nd AS DOUBLE))"
        ).alias("cusum"),
    )
    return s.select(
        "day",
        "day_cents",
        "cusum",
        F.expr(
            "CASE WHEN abs(cusum) = MAX(abs(cusum)) OVER"
            " (PARTITION BY 1) THEN 1 ELSE 0 END"
        ).alias("is_changepoint"),
    )


# --- ts_seasonal_index -------------------------------------------------------

# Day-of-week seasonal decomposition: the multiplicative index each
# weekday carries vs the average day — the correction factor every
# revenue forecast divides out first. Weekday derives from an epoch-day
# modulus (2024-01-01 is a Monday), NOT the engines' dayofweek()
# builtins, whose numbering conventions differ (Spark 1=Sunday,
# DuckDB 0=Sunday).
_SEASONAL_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(floor(value * 1e2 + CAST(0.5 AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS day_cents
  FROM events GROUP BY day
), dw AS (
  SELECT CAST((day - DATE '2024-01-01') % 7 AS INTEGER) AS dow_idx,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(day_cents) AS BIGINT) AS dow_cents
  FROM daily GROUP BY dow_idx
)
SELECT dow_idx, n_days, dow_cents,
       (CAST(dow_cents AS DOUBLE) / CAST(n_days AS DOUBLE))
         / (CAST(SUM(dow_cents) OVER () AS DOUBLE)
            / CAST(SUM(n_days) OVER () AS DOUBLE)) AS seasonal_index
FROM dw
"""


@query("ts_seasonal_index", oracle=_SEASONAL_ORACLE, tier=2)
def ts_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index over daily revenue: each weekday's
    average daily cents relative to the overall average day — the
    multiplicative seasonal factor a forecast divides out before trend
    fitting (the classical-decomposition first step; ts_ewma_smooth and
    ts_cusum_changepoint consume the deseasonalized series this
    produces). Weekday comes from an epoch-day modulus, not the
    engines' dayofweek() builtins, whose numbering conventions differ.

    Shape: one (day) aggregate with full map-side combine is the only
    data-sized work; the 7-row weekday rollup and its global windows
    are constant-size at any corpus (EXPECTED_FLAGS pattern). Exact
    integer cents; the index is a shared-text double ratio."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(quantize_long("value", 2)).alias("day_cents"))
    )
    dw = daily.groupBy(
        F.expr(
            "CAST(datediff(day, DATE '2024-01-01') % 7 AS INT)"
        ).alias("dow_idx")
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("day_cents").alias("dow_cents"),
    )
    w_all = W.partitionBy()
    return dw.select(
        "dow_idx",
        "n_days",
        "dow_cents",
        (
            (F.col("dow_cents").cast("double") / F.col("n_days").cast("double"))
            / (
                F.sum("dow_cents").over(w_all).cast("double")
                / F.sum("n_days").over(w_all).cast("double")
            )
        ).alias("seasonal_index"),
    )


# --- ts_backtest_seasonal_naive ----------------------------------------------

# Forecast-accuracy backtest against the seasonal-naive baseline
# (forecast(d) = actual(d - 7)): the benchmark every forecasting model
# must beat before it ships, and the natural consumer of
# ts_seasonal_index's weekly cycle. Errors stay exact: absolute error
# is integer cents, the percentage error per day is a truncating
# integer division into 1e-6 units — order-insensitive sums, no float
# accumulation anywhere.
_BACKTEST_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(floor(value * 1e2 + CAST(0.5 AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, day
), j AS (
  SELECT a.event_type, a.day, a.cents AS actual, f.cents AS forecast
  FROM daily a JOIN daily f
    ON a.event_type = f.event_type AND f.day = a.day - 7
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(abs(actual - forecast)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) / 1e2 AS mae_dollars,
       CAST(SUM(abs(actual - forecast) * 1000000 // actual) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) / 1e6 AS mape,
       CAST(SUM(actual - forecast) AS BIGINT) AS bias_cents
FROM j GROUP BY event_type
"""


@query("ts_backtest_seasonal_naive", oracle=_BACKTEST_ORACLE, tier=2)
def ts_backtest_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest against the seasonal-naive baseline
    (forecast(d) = actual(d − 7), per event type): MAE, MAPE, and
    signed bias over every day with a week-earlier observation — the
    accuracy floor a shipped forecaster must beat, computed the way a
    backtest harness would (align, diff, aggregate). The 7-day lag
    aligns by CALENDAR join, not a ROWS window, so a missing day
    shifts nothing.

    Shape: one (type, day) aggregate collapses the stream, the
    self-join runs on the O(types x days) daily frame (co-keyed on
    event_type — model-sized at any corpus), and every error metric is
    exact: absolute errors are integer cents, per-day percentage
    errors are truncating integer divisions into 1e-6 units, and the
    final means are shared-text divisions."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(quantize_long("value", 2)).alias("cents"))
    )
    a = daily.select("event_type", "day", F.col("cents").alias("actual"))
    f = daily.select(
        F.col("event_type").alias("f_type"),
        F.col("day").alias("f_day"),
        F.col("cents").alias("forecast"),
    )
    j = a.join(
        f,
        (F.col("event_type") == F.col("f_type"))
        & (F.col("f_day") == F.date_sub(F.col("day"), 7)),
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr(
            "CAST(SUM(abs(actual - forecast)) AS DOUBLE)"
            " / CAST(COUNT(*) AS DOUBLE) / 1e2"
        ).alias("mae_dollars"),
        F.expr(
            "CAST(SUM(abs(actual - forecast) * 1000000 DIV actual)"
            " AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e6"
        ).alias("mape"),
        F.sum(F.expr("actual - forecast")).alias("bias_cents"),
    )


# --- ts_acf -------------------------------------------------------------------

#: Autocorrelation horizon: lags 1..7 cover the weekly cycle
#: ts_seasonal_index models — a peak at lag 7 is the numeric signature of
#: day-of-week seasonality, a slow decay the signature of trend.
_ACF_MAX_LAG = 7

#: Sample ACF at lag k from exact integer moments, as textually-shared SQL:
#: r_k = sum_{t<=n-k}(x_t - m)(x_{t+k} - m) / sum_t(x_t - m)^2 with m=sx/n,
#: expanded so every aggregate is an exact integer (products widened to
#: DECIMAL(38,0)/HUGEINT — the prof_corr_matrix overflow stance) and the
#: only float arithmetic is this one identical-IEEE closed form, quantized
#: at 6dp via the tie-free floor form.
_ACF_EXPR = (
    "floor((("
    "CAST(sxy AS DOUBLE)"
    " - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
    "   * (CAST(sh AS DOUBLE) + CAST(st AS DOUBLE))"
    " + CAST(n_pairs AS DOUBLE)"
    "   * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
    "   * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
    ") / ("
    "CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"
    ")) * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6"
)

_ACF_ORACLE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(floor(value * 1e2 + CAST(0.5 AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY day
), rnd AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily
), g AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(c AS HUGEINT)) AS sx,
         SUM(CAST(c AS HUGEINT) * c) AS sxx
  FROM rnd
), l AS (
  SELECT CAST(k AS BIGINT) AS k FROM range(1, {_ACF_MAX_LAG + 1}) t(k)
), p AS (
  SELECT l.k,
         COUNT(*) AS n_pairs,
         SUM(CAST(a.c AS HUGEINT) * b.c) AS sxy,
         SUM(CAST(a.c AS HUGEINT)) AS sh,
         SUM(CAST(b.c AS HUGEINT)) AS st
  FROM rnd a CROSS JOIN l JOIN rnd b ON b.rn = a.rn + l.k
  GROUP BY l.k
)
SELECT k AS lag, CAST(n_pairs AS BIGINT) AS n_pairs,
       {_ACF_EXPR} AS acf
FROM p, g
"""


@query("ts_acf", oracle=_ACF_ORACLE, tier=2)
def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation function of the daily revenue series at
    lags 1..{_ACF_MAX_LAG} — the first diagnostic a forecaster reads
    before picking a model: a spike at lag 7 confirms the day-of-week
    cycle ts_seasonal_index quantifies, slow decay across all lags
    flags trend (difference before modeling), and an ACF inside the
    noise band says the series is already white. Positional (ROW) lags
    over the observed series, the classical estimator with the GLOBAL
    mean/variance in the denominator.

    Shape: the DATA-sized work is one (day) aggregate with full
    map-side combine; everything after runs on the O(days) daily frame
    — model-sized at any corpus, so its row_number window and 1-row
    moment fold are the documented EXPECTED_FLAGS pattern. The lag
    pairing is an EQUI-join on the computed key rn+k (never a band
    BNLJ), the moments are exact integers (products widened to
    DECIMAL(38,0)/HUGEINT per the prof_corr_matrix overflow stance),
    and the estimator is one textually-shared IEEE expression over
    those integers, quantized at 6dp."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(quantize_long("value", 2)).alias("c"))
    )
    rnd = daily.select(
        "c", F.row_number().over(W.orderBy("day")).alias("rn")
    )
    g = rnd.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("sxx"),
    )
    a = rnd.select(
        F.col("c").alias("ca"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(_ACF_MAX_LAG)),
                lambda k: F.struct(
                    k.cast("long").alias("k"),
                    (F.col("rn") + k).alias("brn"),
                ),
            )
        ).alias("e"),
    ).select("ca", "e.k", "e.brn")
    b = rnd.select(F.col("rn").alias("brn"), F.col("c").alias("cb"))
    p = a.join(b, "brn").groupBy("k").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("ca").cast("decimal(38,0)") * F.col("cb")).alias("sxy"),
        F.sum(F.col("ca").cast("decimal(38,0)")).alias("sh"),
        F.sum(F.col("cb").cast("decimal(38,0)")).alias("st"),
    )
    return p.crossJoin(F.broadcast(g)).select(
        F.col("k").alias("lag"),
        "n_pairs",
        F.expr(_ACF_EXPR).alias("acf"),
    )


# --- ts_trend_by_type ---------------------------------------------------------

#: Grouped OLS closed forms from exact integer moments (x = epoch day,
#: y = daily cents): slope/intercept/R² as textually-shared IEEE
#: expressions, quantized 6dp via the tie-free floor form. Products
#: widen to DECIMAL(38,0)/HUGEINT (the prof_corr_matrix overflow
#: stance): day indexes ~1e4 x cents ~1e9 reach ~1e13 per row and
#: Syy reaches ~1e18 per row.
_TREND_SLOPE = (
    "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
)
_TREND_ICEPT = (
    f"((CAST(sy AS DOUBLE) - {_TREND_SLOPE} * CAST(sx AS DOUBLE))"
    " / CAST(n AS DOUBLE))"
)
_TREND_R2 = (
    "(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))"
    " / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"
)


def _trend_q6(expr: str) -> str:
    return f"floor(({expr}) * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6"


_TREND_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         datediff('day', DATE '1992-01-01', CAST(ts AS DATE)) AS x,
         CAST(SUM(CAST(floor(value * 1e2 + CAST(0.5 AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY event_type, x
), m AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx,
         SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM daily GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       {_trend_q6(_TREND_SLOPE)} AS slope_cents_per_day,
       {_trend_q6(_TREND_ICEPT)} AS intercept_cents,
       {_trend_q6(_TREND_R2)} AS r2
FROM m
"""


@query("ts_trend_by_type", oracle=_TREND_ORACLE, tier=2)
def ts_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of daily revenue vs calendar day:
    slope (cents/day), intercept, and R² — the "is this stream growing,
    and how confidently" read a revenue dashboard puts next to the
    seasonal index, and the grouped complement of win_rolling_slope's
    windowed form. x is the epoch-day integer, y the exact daily cents.

    Shape: one (type, day) aggregate with full map-side combine
    collapses the stream, then a per-type moment aggregate — keyed on
    event_type, so unlike the global-fold profiling keys there is NO
    single-partition exchange anywhere. Moments are exact integers
    widened to DECIMAL(38,0)/HUGEINT (the prof_corr_matrix overflow
    stance), and the three closed forms are textually-shared IEEE
    expressions over those integers, quantized 6dp; numpy polyfit
    replay pinned in tests/test_round11b.py."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1992-01-01")).alias("x"),
        )
        .agg(F.sum(quantize_long("value", 2)).alias("y"))
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    return m.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.expr(_trend_q6(_TREND_SLOPE)).alias("slope_cents_per_day"),
        F.expr(_trend_q6(_TREND_ICEPT)).alias("intercept_cents"),
        F.expr(_trend_q6(_TREND_R2)).alias("r2"),
    )


# --- ts_reach_curve -------------------------------------------------------------

_REACH_ORACLE = """
WITH act AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_idx
  FROM events
),
firsts AS (
  SELECT user_id, MIN(day_idx) AS first_day FROM act GROUP BY user_id
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM firsts),
daily AS (
  SELECT a.day_idx,
         CAST(COUNT(*) AS BIGINT) AS n_active_users,
         CAST(SUM(CASE WHEN f.first_day = a.day_idx THEN 1 ELSE 0 END)
              AS BIGINT) AS n_new_users
  FROM act a JOIN firsts f USING (user_id)
  GROUP BY a.day_idx
)
SELECT day_idx, n_active_users, n_new_users,
       CAST(SUM(n_new_users) OVER (
         ORDER BY day_idx
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users,
       CAST(SUM(n_new_users) OVER (
         ORDER BY day_idx
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / CAST(tot.n_users AS DOUBLE) AS reach_share
FROM daily CROSS JOIN tot
"""


@query("ts_reach_curve", oracle=_REACH_ORACLE, tier=2)
def ts_reach_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-reach curve: per day, the active-user count, the
    FIRST-EVER-seen user count, the running total of distinct users
    reached, and that total as a share of the final audience — the
    user-growth read (is acquisition flattening?) next to
    agg_retention_cohort's per-cohort matrix. Computing "cumulative
    distinct" as a cumulative sum of FIRST-SEEN counts is the identity
    that makes the curve cheap: a naive per-day COUNT(DISTINCT user
    WHERE day <= d) re-scans the history per day; first-seen attribution
    scans it once.

    Exactness: the day key is integer epoch-microseconds floor-divided
    to days (no date formatting, no timezone surface — the
    prof_freshness_lag discipline); all counts exact; the share is one
    shared-text IEEE division.

    Shape: one distinct over (user, day), one user-keyed MIN for the
    first day, one day rollup — all data-sized exchanges key on user or
    day; the cumulative window and the 1-row audience fold run on the
    O(days) frame (EXPECTED_FLAGS; the two-pass prefix-sum swap of
    ts_cusum_changepoint applies verbatim)."""
    ev = load(spark, sf_dir, "events")
    act = (
        ev.select(
            "user_id",
            F.expr(
                "CAST(unix_micros(ts) DIV 86400000000 AS BIGINT)"
            ).alias("day_idx"),
        )
        .distinct()
    )
    from ..session import scoped_persist

    act = scoped_persist(act)
    firsts = act.groupBy("user_id").agg(F.min("day_idx").alias("first_day"))
    tot = firsts.agg(F.count(F.lit(1)).alias("n_users"))
    daily = (
        act.join(firsts, "user_id")
        .groupBy("day_idx")
        .agg(
            F.count(F.lit(1)).alias("n_active_users"),
            F.sum(
                F.expr("CASE WHEN first_day = day_idx THEN 1 ELSE 0 END")
            ).alias("n_new_users"),
        )
    )
    return daily.crossJoin(F.broadcast(tot)).select(
        "day_idx",
        "n_active_users",
        "n_new_users",
        F.expr(
            "CAST(SUM(n_new_users) OVER ("
            "ORDER BY day_idx"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            " AS BIGINT)"
        ).alias("cum_users"),
        F.expr(
            "CAST(SUM(n_new_users) OVER ("
            "ORDER BY day_idx"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            " AS DOUBLE) / CAST(n_users AS DOUBLE)"
        ).alias("reach_share"),
    )


# --- ts_rolling_corr ------------------------------------------------------------

_RCORR_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'click'
                       THEN CAST(floor(value * 1e2 + CAST(0.5 AS DOUBLE))
                                 AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'view'
                       THEN CAST(floor(value * 1e2 + CAST(0.5 AS DOUBLE))
                                 AS BIGINT) ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY day
),
w AS (
  SELECT day, x, y,
         CAST(COUNT(*) OVER win AS BIGINT) AS n,
         CAST(SUM(x) OVER win AS BIGINT) AS sx,
         CAST(SUM(y) OVER win AS BIGINT) AS sy,
         CAST(SUM(x * x) OVER win AS BIGINT) AS sxx,
         CAST(SUM(y * y) OVER win AS BIGINT) AS syy,
         CAST(SUM(x * y) OVER win AS BIGINT) AS sxy
  FROM daily
  WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT day, CAST(x AS DOUBLE) / 1e2 AS click_value,
       CAST(y AS DOUBLE) / 1e2 AS view_value, n,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr7
FROM w WHERE n >= 3
"""


@query("ts_rolling_corr", oracle=_RCORR_ORACLE, tier=2)
def ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling Pearson correlation between the click and view
    daily value series — the co-movement read behind funnel-health
    alerts (clicks decoupling from views flags instrumentation drift or
    bot traffic; prof_corr_matrix is the static whole-table sibling).

    Exactness: both series are exact integer cents (conditional daily
    sums); all six rolling moments are exact BIGINT window sums, so the
    correlation numerator and both variance terms are exact integers;
    the result is shared-text sqrt/divide over those exact inputs
    (IEEE sqrt is correctly rounded — both engines agree bitwise).
    Windows shorter than 3 days are suppressed (the warm-up rows).
    Integer bounds: daily cents to ~4e4 at this fixture; at 1e9-cents
    days the xx/xy products need DECIMAL(38,0) (documented).

    Shape: one day-keyed aggregate folds BOTH series in the same pass
    (conditional sums — the pivot never materializes a join); the six
    moments ride ONE window over the O(days) daily frame — model-sized
    at any corpus (EXPECTED_FLAGS; the ts_cusum_changepoint two-pass
    prefix-sum swap applies if the timeline ever outgrows one task)."""
    e = load(spark, sf_dir, "events")
    cents = quantize_long("value", 2)
    daily = (
        e.select(
            F.col("ts").cast("date").alias("day"),
            F.when(F.col("event_type") == "click", cents)
            .otherwise(F.lit(0))
            .alias("xc"),
            F.when(F.col("event_type") == "view", cents)
            .otherwise(F.lit(0))
            .alias("yc"),
        )
        .groupBy("day")
        .agg(F.sum("xc").alias("x"), F.sum("yc").alias("y"))
    )
    win = W.orderBy("day").rowsBetween(-6, W.currentRow)
    w = daily.select(
        "day",
        "x",
        "y",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("x").over(win).alias("sx"),
        F.sum("y").over(win).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(win).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(win).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(win).alias("sxy"),
    )
    return w.filter(F.col("n") >= 3).select(
        "day",
        F.expr("CAST(x AS DOUBLE) / 1e2").alias("click_value"),
        F.expr("CAST(y AS DOUBLE) / 1e2").alias("view_value"),
        "n",
        F.expr(
            "CAST(n * sxy - sx * sy AS DOUBLE)"
            " / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))"
            " * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))"
        ).alias("corr7"),
    )


# --- ts_holt_linear -------------------------------------------------------------

#: Holt's recursion in INTEGER cents with dyadic alpha = beta = 1/2:
#: level' = floor((x + level + trend) / 2),
#: trend' = floor((level' - level + trend) / 2).
#: Every halving is floor() of an exactly-representable double (values
#: stay far below 2^52), so both engines produce identical integers at
#: every step — the recursion is exact, not approximately reproducible.
_HOLT_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(floor(value * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT))
              AS BIGINT) AS cents
  FROM events GROUP BY day
),
idxed AS (
  SELECT day, cents,
         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
  FROM daily
),
holt AS (
  SELECT i, day, cents, cents AS level, CAST(0 AS BIGINT) AS trend
  FROM idxed WHERE i = 1
  UNION ALL
  SELECT n.i, n.day, n.cents,
         CAST(floor(CAST(n.cents + h.level + h.trend AS DOUBLE)
                    / CAST(2.0 AS DOUBLE)) AS BIGINT) AS level,
         CAST(floor((CAST(floor(CAST(n.cents + h.level + h.trend AS DOUBLE)
                                / CAST(2.0 AS DOUBLE)) AS BIGINT)
                     - h.level + h.trend)
                    / CAST(2.0 AS DOUBLE)) AS BIGINT) AS trend
  FROM holt h JOIN idxed n ON n.i = h.i + 1
)
SELECT day, CAST(cents AS DOUBLE) / 1e2 AS daily_value,
       CAST(level AS DOUBLE) / 1e2 AS level,
       CAST(trend AS DOUBLE) / 1e2 AS trend,
       CAST(level + trend AS DOUBLE) / 1e2 AS forecast_next
FROM holt
"""

_HOLT_ORACLE = _HOLT_ORACLE.replace("WITH daily", "WITH RECURSIVE daily", 1)


@query("ts_holt_linear", oracle=_HOLT_ORACLE, tier=3)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) over the daily
    total value series — the forecasting baseline one notch above
    ts_ewma_smooth (which has no trend state and lags ramps by
    construction). Emits per-day level, trend, and the one-step-ahead
    forecast level + trend.

    The recursion is deliberately INTEGER Holt with dyadic
    alpha = beta = 1/2: state lives in exact cents, every update is a
    floor of an exactly-representable halving, so Spark's runtime
    aggregate() fold and DuckDB's recursive CTE — structurally different
    evaluators — are bit-identical at every step (no float carry to
    drift; the determinism note above the oracle).

    Shape: one day-keyed aggregate reduces the fact table to the O(days)
    series — the only data-sized shuffle; the inherently-sequential
    recursion then runs as ONE runtime aggregate() lambda over the
    sorted (day, cents) array folded to a single row (the
    ext_mmr_diversify small-array pattern — model-sized at any corpus:
    a decade is ~3.7k entries) and posexplodes back to rows
    (EXPECTED_FLAGS: 1-row folds, never data rows)."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.select(
            F.col("ts").cast("date").alias("day"),
            quantize_long("value", 2).alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").alias("cents"))
    )
    series = daily.agg(
        F.sort_array(
            F.collect_list(F.struct("day", "cents"))
        ).alias("s")
    )
    # fold state: (level, trend, out: array<struct<day,cents,level,trend>>)
    folded = series.select(
        F.expr(
            """
            aggregate(
              slice(s, 2, size(s) - 1),
              named_struct(
                'level', s[0].cents,
                'trend', CAST(0 AS BIGINT),
                'out', array(named_struct(
                  'day', s[0].day, 'cents', s[0].cents,
                  'level', s[0].cents, 'trend', CAST(0 AS BIGINT)))),
              (acc, r) -> named_struct(
                'level', CAST(floor(CAST(r.cents + acc.level + acc.trend
                                         AS DOUBLE)
                                    / CAST(2.0 AS DOUBLE)) AS BIGINT),
                'trend', CAST(floor((CAST(floor(CAST(r.cents + acc.level
                                                     + acc.trend AS DOUBLE)
                                               / CAST(2.0 AS DOUBLE))
                                         AS BIGINT)
                                     - acc.level + acc.trend)
                                    / CAST(2.0 AS DOUBLE)) AS BIGINT),
                'out', array_append(acc.out, named_struct(
                  'day', r.day, 'cents', r.cents,
                  'level', CAST(floor(CAST(r.cents + acc.level + acc.trend
                                           AS DOUBLE)
                                      / CAST(2.0 AS DOUBLE)) AS BIGINT),
                  'trend', CAST(floor((CAST(floor(CAST(r.cents + acc.level
                                                       + acc.trend
                                                       AS DOUBLE)
                                                 / CAST(2.0 AS DOUBLE))
                                           AS BIGINT)
                                       - acc.level + acc.trend)
                                      / CAST(2.0 AS DOUBLE)) AS BIGINT))))
            )
            """
        ).alias("st")
    )
    rows = folded.select(F.explode("st.out").alias("r"))
    return rows.select(
        F.col("r.day").alias("day"),
        F.expr("CAST(r.cents AS DOUBLE) / 1e2").alias("daily_value"),
        F.expr("CAST(r.level AS DOUBLE) / 1e2").alias("level"),
        F.expr("CAST(r.trend AS DOUBLE) / 1e2").alias("trend"),
        F.expr("CAST(r.level + r.trend AS DOUBLE) / 1e2").alias(
            "forecast_next"
        ),
    )


# --- ts_weekday_adjust ----------------------------------------------------------

_WKADJ_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(floor(value * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT))
              AS BIGINT) AS cents
  FROM events GROUP BY day
),
wd AS (
  SELECT day, cents,
         CAST(date_diff('day', DATE '1970-01-01', day) % 7 AS BIGINT)
           AS weekday_idx
  FROM daily
),
idx AS (
  SELECT weekday_idx, CAST(SUM(cents) AS BIGINT) AS wsum,
         CAST(COUNT(*) AS BIGINT) AS wn
  FROM wd GROUP BY weekday_idx
)
SELECT wd.day, wd.weekday_idx,
       CAST(wd.cents AS DOUBLE) / 1e2 AS actual,
       CAST(idx.wsum AS DOUBLE) / (idx.wn * 1e2) AS weekday_expected,
       CAST(wd.cents AS DOUBLE) / 1e2
         - CAST(idx.wsum AS DOUBLE) / (idx.wn * 1e2) AS residual,
       CAST(wd.cents AS DOUBLE) * idx.wn / CAST(idx.wsum AS DOUBLE)
         AS seasonal_ratio
FROM wd JOIN idx ON wd.weekday_idx = idx.weekday_idx
"""


@query("ts_weekday_adjust", oracle=_WKADJ_ORACLE, tier=2)
def ts_weekday_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonal ADJUSTMENT of the daily value series: each day's
    actual total against its weekday's mean, the residual, and the
    seasonal ratio — ts_seasonal_index computes the 7 indices; this
    APPLIES them back per day, which is the frame an anomaly reviewer
    actually reads (a Monday that is low for a Monday, not low
    absolutely; win_moving_stddev's envelope is the trailing-window
    sibling, this one is calendar-aware).

    Cross-engine note: the weekday key is epoch-day mod 7 — Spark's
    dayofweek() is 1-based-Sunday while DuckDB's is 0-based, so neither
    builtin is shared; integer date arithmetic is.

    Exactness: daily sums exact cents; the weekday mean is one division
    of exact integers; residual and ratio are shared-text IEEE over
    those exact inputs.

    Shape: one day-keyed aggregate (the only data-sized exchange), a
    7-row weekday aggregate, and a broadcast join back onto the O(days)
    frame."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.select(
            F.col("ts").cast("date").alias("day"),
            quantize_long("value", 2).alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").alias("cents"))
    )
    wd = daily.select(
        "day",
        "cents",
        (F.datediff("day", F.lit("1970-01-01").cast("date")) % 7)
        .cast("long")
        .alias("weekday_idx"),
    )
    idx = wd.groupBy("weekday_idx").agg(
        F.sum("cents").alias("wsum"), F.count(F.lit(1)).alias("wn")
    )
    return wd.join(F.broadcast(idx), "weekday_idx").select(
        "day",
        "weekday_idx",
        F.expr("CAST(cents AS DOUBLE) / 1e2").alias("actual"),
        F.expr("CAST(wsum AS DOUBLE) / (wn * 1e2)").alias(
            "weekday_expected"
        ),
        F.expr(
            "CAST(cents AS DOUBLE) / 1e2"
            " - CAST(wsum AS DOUBLE) / (wn * 1e2)"
        ).alias("residual"),
        F.expr(
            "CAST(cents AS DOUBLE) * wn / CAST(wsum AS DOUBLE)"
        ).alias("seasonal_ratio"),
    )


# --- ts_theil_sen ---------------------------------------------------------------

#: Quantized pairwise slope: floor(1e9 * (c2-c1)/(d2-d1) + 0.5). The
#: division is IEEE on exactly-representable integers (counts and day
#: gaps), so the quantized slope is bit-identical in both engines and
#: the median pick is an integer decision.
_SEN_QS = (
    "CAST(floor(1e9 * CAST({dc} AS DOUBLE) / CAST({dd} AS DOUBLE)"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)

_SEN_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
pairs AS (
  SELECT a.event_type,
         {_SEN_QS.format(dc="b.c - a.c", dd="b.d - a.d")} AS qs
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND b.d > a.d
),
rk AS (
  SELECT event_type, qs,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY qs ASC) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
           AS n_pairs
  FROM pairs
),
med AS (
  SELECT event_type, n_pairs,
         CAST(MAX(CASE WHEN rn = (n_pairs + 1) // 2 THEN qs END)
              AS BIGINT) AS med_qs
  FROM rk GROUP BY event_type, n_pairs
),
nd AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily GROUP BY event_type
)
SELECT m.event_type, nd.n_days, m.n_pairs,
       CAST(m.med_qs AS DOUBLE) / 1e9 AS sen_slope
FROM med m JOIN nd ON m.event_type = nd.event_type
"""


@query("ts_theil_sen", oracle=_SEN_ORACLE, tier=2)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type: the MEDIAN of all
    pairwise slopes (c_j - c_i) / (d_j - d_i) over the daily count
    series — the slope estimator with a 29% breakdown point that
    ts_trend_by_type's OLS lacks (one bursty day drags least-squares;
    the pairwise-slope median shrugs it off), the standard robust
    companion every monitoring stack reports next to the fitted
    trend. Median-low convention on even pair counts (the discrete
    order statistic at ceil(n/2) — no averaging, keeps the estimate
    an actually-observed slope).

    Exactness: day indices and counts are exact integers; each pair
    slope is floor-quantized to the 1e-9 grid from one IEEE division
    of exactly-representable integers (shared text), so ranking and
    the median pick are integer decisions with a total order.

    Shape: ONE (type, day) counting aggregate collapses the stream
    (map-side combine — the only data-sized exchange); the pairwise
    expansion is a type-keyed equi self-join of the O(types x days)
    model frame (30 days -> 435 pairs/type — never the event grain);
    the median is a per-type rank window over that model-sized pair
    frame. At 100 TB the daily frame stays O(days x types) regardless
    of event volume — the pair stage's cost is fixed by the calendar,
    and a longer horizon swaps in the windowed median-of-slopes over
    a bounded trailing window (documented)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long")
        .alias("d"),
    ).agg(F.count(F.lit(1)).alias("c"))
    from ..session import scoped_persist

    daily = scoped_persist(daily)
    a = daily.select("event_type", F.col("d").alias("d1"), F.col("c").alias("c1"))
    b = daily.select("event_type", F.col("d").alias("d2"), F.col("c").alias("c2"))
    pairs = a.join(b, "event_type").filter(F.col("d2") > F.col("d1")).select(
        "event_type",
        F.expr(
            _SEN_QS.format(dc="c2 - c1", dd="d2 - d1")
        ).alias("qs"),
    )
    wt = W.partitionBy("event_type")
    rk = pairs.select(
        "event_type",
        "qs",
        F.row_number().over(wt.orderBy(F.asc("qs"))).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n_pairs"),
    )
    med = rk.groupBy("event_type", "n_pairs").agg(
        F.max(
            F.when(
                F.col("rn") == F.expr("(n_pairs + 1) DIV 2"), F.col("qs")
            )
        ).alias("med_qs")
    )
    nd = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    return med.join(nd, "event_type").select(
        "event_type",
        "n_days",
        "n_pairs",
        (F.col("med_qs").cast("double") / F.lit(1e9)).alias("sen_slope"),
    )


# --- ts_dow_hour_profile --------------------------------------------------------

_DOW_HOUR_ORACLE = """
WITH e AS (
  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) % 7
           AS weekday_idx,
         CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
         CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
           AS cents
  FROM events
),
g AS (
  SELECT weekday_idx, hour,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(cents) AS BIGINT) AS value_cents
  FROM e GROUP BY weekday_idx, hour
),
t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM g)
SELECT g.weekday_idx, g.hour, g.n_events, g.value_cents,
       CAST(g.n_events AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
       CAST(g.n_events * 168 AS DOUBLE) / CAST(t.total AS DOUBLE)
         AS uniform_lift
FROM g CROSS JOIN t
"""


@query("ts_dow_hour_profile", oracle=_DOW_HOUR_ORACLE, tier=2)
def ts_dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday x hour load grid over the event stream: event count,
    value sum, traffic share, and the lift against a uniform 168-slot
    week — the calendar heat map every capacity/anomaly dashboard
    draws first (lift >> 1 slots are the peak-load cells a scheduler
    avoids; a weekday pattern that suddenly flattens flags
    instrumentation loss). Weekday key = epoch-day mod 7 (the
    ts_weekday_adjust house convention — Spark and DuckDB disagree on
    dayofweek bases); hour via EXTRACT on the session-pinned-UTC
    timestamps.

    Exactness: slot keys are integer arithmetic; values floor-quantize
    to cents pre-sum; share and lift are single IEEE divisions of
    exact integers.

    Shape: ONE (weekday, hour) counting aggregate over the scan — 168
    result rows at ANY scale, full map-side combine, the exchange
    carries slot keys — plus a 1-row total fold broadcast back
    (EXPECTED_FLAGS)."""
    e = load(spark, sf_dir, "events").select(
        (
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long")
            % 7
        ).alias("weekday_idx"),
        F.expr("CAST(EXTRACT(hour FROM ts) AS BIGINT)").alias("hour"),
        quantize_long("value", 2).alias("cents"),
    )
    g = e.groupBy("weekday_idx", "hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("value_cents"),
    )
    from ..session import scoped_persist

    g = scoped_persist(g)
    t = g.agg(F.sum("n_events").alias("total"))
    return g.crossJoin(F.broadcast(t)).select(
        "weekday_idx",
        "hour",
        "n_events",
        "value_cents",
        (F.col("n_events").cast("double") / F.col("total").cast("double"))
        .alias("share"),
        (
            (F.col("n_events") * 168).cast("double")
            / F.col("total").cast("double")
        ).alias("uniform_lift"),
    )


# --- ts_peak_detect -------------------------------------------------------------

#: Peak neighborhood half-width (hours on each side) and the strength
#: rule: a peak is STRONG when its margin over the tallest neighbor is
#: at least 20% of its own height (integer 5*margin >= cnt).
_PEAK_K = 3

_PEAK_ORACLE = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hr, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(hr) AS mn, MAX(hr) AS mx FROM hourly),
spine AS (
  SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
  FROM bounds
),
dense AS (
  SELECT s.hr, COALESCE(h.cnt, 0) AS cnt
  FROM spine s LEFT JOIN hourly h ON s.hr = h.hr
),
w AS (
  SELECT hr, cnt,
         MAX(cnt) OVER (ORDER BY hr ASC ROWS BETWEEN {_PEAK_K} PRECEDING
                        AND 1 PRECEDING) AS max_prev,
         MAX(cnt) OVER (ORDER BY hr ASC ROWS BETWEEN 1 FOLLOWING
                        AND {_PEAK_K} FOLLOWING) AS max_next,
         COUNT(*) OVER (ORDER BY hr ASC ROWS BETWEEN {_PEAK_K} PRECEDING
                        AND 1 PRECEDING) AS n_prev,
         COUNT(*) OVER (ORDER BY hr ASC ROWS BETWEEN 1 FOLLOWING
                        AND {_PEAK_K} FOLLOWING) AS n_next
  FROM dense
)
SELECT hr, cnt,
       CAST(max_prev AS BIGINT) AS max_prev3,
       CAST(max_next AS BIGINT) AS max_next3,
       CAST(cnt - GREATEST(max_prev, max_next) AS BIGINT) AS margin,
       (5 * (cnt - GREATEST(max_prev, max_next)) >= cnt) AS strong_flag
FROM w
WHERE n_prev = {_PEAK_K} AND n_next = {_PEAK_K}
  AND cnt > max_prev AND cnt > max_next
"""


@query("ts_peak_detect", oracle=_PEAK_ORACLE, tier=2)
def ts_peak_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-peak detection over the hourly event-volume series: an
    hour is a peak when it STRICTLY exceeds every count within +/-3
    hours (full neighborhoods only — boundary hours can't be judged),
    with its margin over the tallest neighbor and a strength flag
    (margin >= 20% of the peak, the integer 5*margin >= cnt test) —
    the burst-localizer beside ts_anomaly_mad (global robust outliers)
    and ts_cusum_changepoint (level shifts): MAD flags WHICH hours are
    extreme, this pins WHERE load spikes crest, the read a capacity
    planner and an incident-review both start from. Gap hours count 0
    via the dense spine (the ts_gapfill stance), so a peak beside a
    silent hour is judged against the true zero, not a missing row.

    Exactness: counts are exact integers on the dense hour spine;
    every decision (strict dominance, full-neighborhood, strength) is
    an integer comparison; no floats anywhere.

    Shape: one hour-keyed counting aggregate (the only data-sized
    exchange), a 1-row bounds fold exploded into the O(hours) spine,
    and bounded-frame windows over the aggregated series — model-sized
    at any corpus scale (hours, not events; EXPECTED_FLAGS: the global
    hour-ordered window is O(hours), with the range-bucketed two-pass
    swap documented for multi-year spans)."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    bounds = hourly.agg(F.min("hr").alias("mn"), F.max("hr").alias("mx"))
    spine = bounds.select(
        F.explode(
            F.expr("sequence(mn, mx, INTERVAL 1 HOUR)")
        ).alias("hr")
    )
    dense = spine.join(hourly, "hr", "left").select(
        "hr", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    wp = W.orderBy(F.asc("hr")).rowsBetween(-_PEAK_K, -1)
    wn = W.orderBy(F.asc("hr")).rowsBetween(1, _PEAK_K)
    w = dense.select(
        "hr",
        "cnt",
        F.max("cnt").over(wp).alias("max_prev"),
        F.max("cnt").over(wn).alias("max_next"),
        F.count(F.lit(1)).over(wp).alias("n_prev"),
        F.count(F.lit(1)).over(wn).alias("n_next"),
    )
    margin = F.col("cnt") - F.greatest("max_prev", "max_next")
    return (
        w.filter(
            (F.col("n_prev") == _PEAK_K)
            & (F.col("n_next") == _PEAK_K)
            & (F.col("cnt") > F.col("max_prev"))
            & (F.col("cnt") > F.col("max_next"))
        )
        .select(
            "hr",
            "cnt",
            F.col("max_prev").cast("long").alias("max_prev3"),
            F.col("max_next").cast("long").alias("max_next3"),
            margin.cast("long").alias("margin"),
            (5 * margin >= F.col("cnt")).alias("strong_flag"),
        )
    )
