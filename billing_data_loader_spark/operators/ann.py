"""Similarity-search operators over the embedding column (north-star
mandate): exact near-dup pairs, and an IVF-style ANN index as the scale path.

Vector math stays JVM-side (zip_with/aggregate fold — verified bit-identical
to DuckDB's list_dot_product). The brute-force operators are the exact
baselines; ``ext_ann_ivf`` is the 100 TB shape: partition the corpus into
coarse cells around pivot vectors (one broadcast + one shuffle), then search
only the query's nearest cells. Recall vs the exact top-k is asserted in
tests/test_ann.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import load

_COPY_OFFSET = 1_000_000


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _cos(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


# --- ext_neardup_embedding --------------------------------------------------

# No natural near-dups exist (max pairwise cosine 0.513 at sf0.01, verified),
# so copies of a deterministic slice are unioned in — the operator finds
# exactly those planted pairs at cosine ~1.0.
_EMB_DUP_ORACLE = f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {_COPY_OFFSET} AS vec_id, embedding
  FROM embeddings WHERE vec_id % 10 = 0
), e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM corpus
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       list_dot_product(a.v, b.v)
       / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
         AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
      >= 0.95
"""


@query("ext_neardup_embedding", oracle=_EMB_DUP_ORACLE, tier=3)
def ext_neardup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: all pairs with cosine >= 0.95 (exact
    baseline; the LSH/IVF cell join below is the scale path)."""
    e = load(spark, sf_dir, "embeddings")
    corpus = e.select("vec_id", "embedding").unionAll(
        e.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + _COPY_OFFSET).alias("vec_id"), "embedding"
        )
    )
    v = corpus.select("vec_id", _as_double("embedding").alias("v"))
    a = v.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos = _cos(F.col("va"), F.col("vb"))
    return pairs.select("vec_a", "vec_b", cos.alias("cos_sim")).filter(
        F.col("cos_sim") >= 0.95
    )


# --- ext_ann_ivf ------------------------------------------------------------

_N_PIVOTS = 16
_N_PROBE = 8
_TOP_K = 10


@query("ext_ann_ivf", oracle=None, tier=3)
def ext_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-10 for the vec_id=0 query: assign every
    vector to its nearest of 16 deterministic pivots (vec_id 1..16), search
    only the 8 cells nearest the query. Probabilistic recall -> rows-only;
    tests assert recall vs the exact top-10 and correct cosine values.

    100 TB shape: pivots broadcast (KB); assignment is a map-side argmin —
    the corpus shuffles ONCE on cell_id and is then bucketed for every
    subsequent query; per-query work is nprobe cells, not the corpus."""
    e = load(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", _as_double("embedding").alias("v"))
    pivots = (
        v.filter(F.col("vec_id").between(1, _N_PIVOTS))
        .select(F.col("vec_id").alias("pivot_id"), F.col("v").alias("pv"))
    )

    # map-side assignment: argmax cosine over the broadcast pivot set
    assign_w = W.partitionBy("vec_id").orderBy(
        F.col("pcos").desc(), F.col("pivot_id").asc()
    )
    assigned = (
        v.crossJoin(F.broadcast(pivots))
        .select(
            "vec_id",
            "v",
            "pivot_id",
            _cos(F.col("v"), F.col("pv")).alias("pcos"),
        )
        .withColumn("rn", F.row_number().over(assign_w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", F.col("pivot_id").alias("cell_id"))
    )

    q = v.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    probe_cells = (
        pivots.crossJoin(F.broadcast(q))
        .select("pivot_id", _cos(F.col("pv"), F.col("qv")).alias("qcos"))
        .orderBy(F.col("qcos").desc(), F.col("pivot_id").asc())
        .limit(_N_PROBE)
        .select(F.col("pivot_id").alias("cell_id"))
    )

    return (
        assigned.join(F.broadcast(probe_cells), "cell_id")
        .filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", _cos(F.col("v"), F.col("qv")).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(_TOP_K)
    )
