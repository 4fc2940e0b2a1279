"""Privacy / governance operators (SURVEY.md §2 extensions, round 13
deferred bank): the release-side checks a data platform runs before
letting aggregate tables or quasi-identified microdata leave the
boundary — a differentially-private count release with its accuracy
audit, and a k-anonymity / l-diversity audit of the quasi-identifier
surface.

Scale stance: both keys ride ONE counting aggregate over the fact
table (the exchange the non-private version of the same rollup pays);
noise generation is pure map-side arithmetic on the aggregated cells
and the anonymity audit is a second model-sized aggregate over
equivalence classes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import load

# --- ext_dp_laplace_counts ------------------------------------------------------

#: Epsilon sweep (scale b = 1/eps must stay an exact small integer so
#: the scaled noise sign * b * ln_q is BIGINT arithmetic).
_DP_EPS = ((10, "0.1"), (1, "1.0"))  # (b as exact int, label)

#: Dyadic uniform from a 48-bit md5 prefix: u = (v + 0.5) / 2^48 (the
#: ext_sample_weighted recipe — exact in 49 mantissa bits), so
#: 2u - 1 = (2v + 1 - 2^48) / 2^48 is exact and the Laplace inverse-CDF
#: argument 1 - |2u - 1| is an exact dyadic double in (0, 1].
_DP_DENOM = 1 << 48

#: ln quantizes at the 1e6 grid (the ext_log_loss stance) so the scaled
#: noise is exact BIGINT and the cross-engine surface is one ln call on
#: an exact dyadic argument.
_DP_Q = "1e6"


def _dp_oracle() -> str:
    eps_rows = " UNION ALL ".join(
        f"SELECT {b} AS b, '{lbl}' AS epsilon" for b, lbl in _DP_EPS
    )
    return f"""
WITH cells AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(COUNT(*) AS BIGINT) AS true_cnt
  FROM events GROUP BY 1, 2
),
eps AS ({eps_rows}),
seeded AS (
  SELECT c.event_type, c.day, c.true_cnt, e.b, e.epsilon,
         ('0x' || substr(md5(c.event_type || '#'
                             || strftime(c.day, '%Y-%m-%d') || '#dp#'
                             || e.epsilon), 1, 12))::BIGINT AS v
  FROM cells c CROSS JOIN eps e
),
noise AS (
  SELECT event_type, day, true_cnt, b, epsilon,
         CASE WHEN 2 * v + 1 >= {_DP_DENOM} THEN 1 ELSE -1 END AS sgn,
         CAST(floor(ln((CAST({_DP_DENOM} AS DOUBLE)
                        - abs(CAST(2 * v + 1 - {_DP_DENOM} AS DOUBLE)))
                       / CAST({_DP_DENOM} AS DOUBLE))
                    * {_DP_Q} + CAST(0.5 AS DOUBLE)) AS BIGINT) AS ln_q
  FROM seeded
)
SELECT event_type, day, epsilon, true_cnt,
       CAST(sgn * b * ln_q AS BIGINT) AS noise_micro,
       CAST(true_cnt AS DOUBLE)
         + CAST(sgn * b * ln_q AS DOUBLE) / {_DP_Q} AS noised_cnt,
       abs(CAST(sgn * b * ln_q AS DOUBLE) / {_DP_Q}) AS abs_noise
FROM noise
"""


_DP_ORACLE = _dp_oracle()


@query("ext_dp_laplace_counts", oracle=_DP_ORACLE, tier=3)
def ext_dp_laplace_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release with its accuracy audit:
    per (event_type, day) cell, the true count plus Laplace(1/eps)
    noise at eps in {0.1, 1.0} — the epsilon-sizing table a privacy
    review reads before publishing an aggregate feed (counting queries
    have sensitivity 1, so b = 1/eps; expected |noise| = b, and the
    table shows exactly what utility each epsilon costs on THIS
    release). The emitted frame is the audit view (true + noised side
    by side); a production release would project the noised column
    only.

    Exactness/determinism: the "draw" is the seeded dyadic uniform
    u = (v + 0.5)/2^48 from the cell's md5 (exact, the
    ext_sample_weighted recipe), so the inverse-CDF argument
    1 - |2u - 1| is an exact dyadic double; ln lands on the 1e6 grid
    (the ext_log_loss stance) making the scaled noise sign * b * ln_q
    exact BIGINT (b is an exact integer 1/eps for the swept epsilons);
    the noised count is one division + one addition of exact operands.
    NOTE: a deterministic hash-seeded draw is the AUDIT/replay form
    (reproducible pipelines, cross-engine grading); a production DP
    deployment must swap in a cryptographic RNG — the epsilon ledger
    and mechanism shape are unchanged, and that swap is the documented
    production delta.

    Shape: ONE (type, day) counting aggregate (the exchange the
    non-private rollup pays), a broadcast 2-row epsilon grid, then
    pure map-side noise arithmetic on the O(cells) frame — model-sized
    at any corpus scale."""
    cells = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    eps = spark.createDataFrame(
        [(b, lbl) for b, lbl in _DP_EPS], "b long, epsilon string"
    )
    v = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("event_type"),
                    F.lit("#"),
                    F.date_format("day", "yyyy-MM-dd"),
                    F.lit("#dp#"),
                    F.col("epsilon"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    seeded = cells.crossJoin(F.broadcast(eps)).select(
        "event_type", "day", "true_cnt", "b", "epsilon", v.alias("v")
    )
    sgn = F.when(
        2 * F.col("v") + 1 >= F.lit(_DP_DENOM), F.lit(1)
    ).otherwise(F.lit(-1))
    ln_q = F.expr(
        f"CAST(floor(ln((CAST({_DP_DENOM} AS DOUBLE)"
        f" - abs(CAST(2 * v + 1 - {_DP_DENOM} AS DOUBLE)))"
        f" / CAST({_DP_DENOM} AS DOUBLE))"
        f" * {_DP_Q} + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )
    noise = seeded.select(
        "event_type",
        "day",
        "true_cnt",
        "b",
        "epsilon",
        sgn.alias("sgn"),
        ln_q.alias("ln_q"),
    )
    nm = (F.col("sgn") * F.col("b") * F.col("ln_q")).cast("long")
    return noise.select(
        "event_type",
        "day",
        "epsilon",
        "true_cnt",
        nm.alias("noise_micro"),
        F.expr(
            f"CAST(true_cnt AS DOUBLE)"
            f" + CAST(sgn * b * ln_q AS DOUBLE) / {_DP_Q}"
        ).alias("noised_cnt"),
        F.expr(
            f"abs(CAST(sgn * b * ln_q AS DOUBLE) / {_DP_Q})"
        ).alias("abs_noise"),
    )


# --- ext_kanonymity_audit -------------------------------------------------------

#: k-anonymity threshold and the l-diversity floor for the sensitive
#: attribute within each equivalence class.
_KANON_K = 5
_KANON_L = 2

#: Quasi-identifier coarsening: account balances band at 2500-unit
#: granularity (250000 cents) — the generalization step every
#: k-anonymization applies to continuous identifiers.
_KANON_BAND_CENTS = 250_000

_KANON_ORACLE = f"""
WITH qi AS (
  SELECT c_nationkey AS nation,
         CAST(floor(c_acctbal * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           // {_KANON_BAND_CENTS} AS bal_band,
         c_mktsegment AS sensitive
  FROM customer
),
cls AS (
  SELECT nation, bal_band,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS n_sensitive
  FROM qi GROUP BY nation, bal_band
)
SELECT CAST(nation AS BIGINT) AS nation, bal_band, n, n_sensitive,
       (n < {_KANON_K}) AS k_violation,
       (n_sensitive < {_KANON_L}) AS l_violation,
       CAST(1e0 AS DOUBLE) / CAST(n AS DOUBLE) AS reident_risk
FROM cls
"""


@query("ext_kanonymity_audit", oracle=_KANON_ORACLE, tier=3)
def ext_kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit of the customer
    quasi-identifier surface: equivalence classes over (nation,
    balance band at 2500-unit generalization), each with its size, its
    sensitive-attribute (market segment) diversity, the k<5 and l<2
    violation flags, and the worst-case re-identification risk 1/n —
    the governance gate run BEFORE microdata leaves the boundary
    (classes of size 1 are direct re-identifications; classes with one
    sensitive value leak the attribute even at k>=5, which is why
    l-diversity rides alongside).

    Exactness: band membership is truncating integer division on
    exact cents (Spark DIV and DuckDB // both truncate toward zero on
    negative balances — identical, pinned in the replay test); counts
    and flags are integers; the risk is one IEEE division.

    Shape: ONE (nation, band) counting aggregate with map-side combine
    — output bounded by the QI-combination count, not rows — and pure
    map-side flags. At 100 TB identical."""
    qi = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nation"),
        F.expr(
            f"CAST(floor(c_acctbal * 1e2 + CAST(0.5 AS DOUBLE))"
            f" AS BIGINT) DIV {_KANON_BAND_CENTS}"
        ).alias("bal_band"),
        F.col("c_mktsegment").alias("sensitive"),
    )
    cls = qi.groupBy("nation", "bal_band").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("sensitive").alias("n_sensitive"),
    )
    return cls.select(
        "nation",
        "bal_band",
        "n",
        "n_sensitive",
        (F.col("n") < _KANON_K).alias("k_violation"),
        (F.col("n_sensitive") < _KANON_L).alias("l_violation"),
        (F.lit(1.0) / F.col("n").cast("double")).alias("reident_risk"),
    )
