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
