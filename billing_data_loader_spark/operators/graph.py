"""Graph analytics over DataFrames (SURVEY.md §2.11 round-4): PageRank on
the user-event_type engagement graph. Complements ext_dedup_cluster's
label propagation (llm_pipeline.py): that operator iterates to a
fixpoint over near-dup edges; this one runs a FIXED number of weighted
power-iteration rounds, the shape used for influence/centrality scoring
in curation (e.g. ranking domains by link structure before sampling).

Scale stance: the rank vector is a DataFrame keyed by node (never a
driver-side vector), each round is one edges-join-ranks shuffle on src
plus one dst-keyed aggregation — O(|E|) per round, same as GraphX/Pregel.
Contributions are decimal-quantized per round so the re-aggregation is
order-insensitive and the oracle can replay the exact arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import load

_DAMP = 0.85
_ROUNDS = 3

# DuckDB unrolls the same three rounds: edges both directions, degree,
# uniform init, then per-round contrib = r/deg decimal-summed per dst.
_PAGERANK_ORACLE = """
WITH e0 AS (
  SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS u,
                  't:' || event_type AS t
  FROM events
), edges AS (
  SELECT u AS src, t AS dst FROM e0
  UNION ALL
  SELECT t AS src, u AS dst FROM e0
), deg AS (
  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
), n AS (
  SELECT COUNT(*) AS n_nodes FROM deg
), r0 AS (
  SELECT src AS node, CAST(1.0 AS DOUBLE) / n_nodes AS r FROM deg, n
), r1 AS (
  SELECT e.dst AS node,
         CAST(0.15 AS DOUBLE) / MIN(n.n_nodes)
         + CAST(0.85 AS DOUBLE) * CAST(SUM(CAST(r.r / d.outdeg AS DECIMAL(28,12)))
                       AS DOUBLE) AS r
  FROM edges e
  JOIN r0 r ON r.node = e.src
  JOIN deg d ON d.src = e.src
  CROSS JOIN n
  GROUP BY e.dst
), r2 AS (
  SELECT e.dst AS node,
         CAST(0.15 AS DOUBLE) / MIN(n.n_nodes)
         + CAST(0.85 AS DOUBLE) * CAST(SUM(CAST(r.r / d.outdeg AS DECIMAL(28,12)))
                       AS DOUBLE) AS r
  FROM edges e
  JOIN r1 r ON r.node = e.src
  JOIN deg d ON d.src = e.src
  CROSS JOIN n
  GROUP BY e.dst
), r3 AS (
  SELECT e.dst AS node,
         CAST(0.15 AS DOUBLE) / MIN(n.n_nodes)
         + CAST(0.85 AS DOUBLE) * CAST(SUM(CAST(r.r / d.outdeg AS DECIMAL(28,12)))
                       AS DOUBLE) AS r
  FROM edges e
  JOIN r2 r ON r.node = e.src
  JOIN deg d ON d.src = e.src
  CROSS JOIN n
  GROUP BY e.dst
)
SELECT node, r AS rank FROM r3
"""


@query("ext_pagerank_lite", oracle=_PAGERANK_ORACLE, tier=3)
def ext_pagerank_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three power-iteration PageRank rounds (d=0.85) over the bipartite
    user<->event_type graph (each engagement edge in both directions, so
    no dangling nodes and every node receives mass).

    Per round: ONE shuffle — edges join the rank frame on src (ranks and
    degrees ride the same join), contributions r/outdeg aggregate per dst
    as decimal(28,12) sums (order-insensitive; the oracle replays the
    identical arithmetic). The node count is a 1-row broadcast, never a
    collected constant. Rounds are unrolled (fixed 3), so lineage stays
    bounded without checkpointing; the fixpoint-iteration variant with
    localCheckpoint-per-round is ext_dedup_cluster (llm_pipeline.py).

    Accepted cross-engine risk (same class as functions/determinism.py):
    the double->decimal(28,12) conversion rounds HALF_UP on Spark's
    shortest-repr digits but half-even on DuckDB's exact binary expansion,
    so a contribution whose decimal expansion lands exactly on a scale-12
    half-boundary could round apart. r/outdeg is a quotient of IEEE
    doubles — not decimal-born — so such a landing requires ~2^-40-scale
    coincidence; none exist in any fixture (hypothesis probed the
    conversion corner in tests/test_properties.py). If a regeneration ever
    trips it, migrate both sides to the tie-free floor quantization
    (CAST(floor(x*1e12 + 0.5) AS DECIMAL(38,0)) summed, then /1e12) —
    flagged as the standing migration in determinism.py."""
    from ..session import scoped_persist

    ev = load(spark, sf_dir, "events")
    e0 = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("u"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("t"),
    ).distinct()
    # repartition after the union: unioning two 32-partition frames yields
    # 64 near-empty partitions that every subsequent per-round stage
    # inherits (pure scheduler overhead on a graph this dense). The width
    # is sized to the MEASURED edge count (the ext_dedup_cluster idiom,
    # round 5): iterating a small graph at corpus width pays a fixed
    # per-task scheduling cost per round (A/B at sf0.1: width 32 = 1.68 s,
    # width 1 = 1.07 s), while a 100 TB graph still fans out to thousands
    # of partitions. The sizing count is one action over the cached
    # pre-mirror frame; repartitioning on src pre-aligns the per-round
    # join's probe side either way.
    half = scoped_persist(
        e0.select(F.col("u").alias("src"), F.col("t").alias("dst"))
    )
    width = max(1, min(int(2 * half.count() // 500_000) + 1, 4096))
    edges = scoped_persist(
        half.unionAll(
            half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).repartition(width, "src")
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    ranks = deg.crossJoin(F.broadcast(n)).select(
        F.col("src").alias("node"),
        (F.lit(1.0) / F.col("n_nodes")).alias("r"),
    )
    src_side = edges.join(deg, "src")  # (src, dst, outdeg)
    for _ in range(_ROUNDS):
        contrib = src_side.join(
            ranks, src_side.src == ranks.node
        ).select(
            "dst",
            (F.col("r") / F.col("outdeg")).cast("decimal(28,12)").alias("c"),
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("c").cast("double").alias("mass"))
            .crossJoin(F.broadcast(n))
            .select(
                F.col("dst").alias("node"),
                (0.15 / F.col("n_nodes") + 0.85 * F.col("mass")).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank"))
