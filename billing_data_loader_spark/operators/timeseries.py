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

from ..functions.determinism import o_davg
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
