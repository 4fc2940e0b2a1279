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

import os

from pyspark.sql import DataFrame, SparkSession
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


# --- vectorized exact-fold kernels (r14 Arrow port, guide §4.2) ---------------
#
# The ANN family's per-vector model scans (nearest pivot, codebook argmin,
# LSH signature bits) were Catalyst higher-order-function folds — interpreted
# per element, ~1-3k FP ops per vector per operator. Each kernel below
# replays the IDENTICAL per-row IEEE op sequence (ascending-index left fold,
# the _fold_cos_rows discipline that hash-matched in r13) vectorized ACROSS
# rows in numpy, so every emitted double is bit-identical to the Catalyst
# fold it replaces. Quantization (ROUND(x, 9)) deliberately STAYS in the JVM:
# kernels return unrounded fold results and the argmin/argmax over rounded
# values is a shallow JVM array op — so BigDecimal HALF_UP semantics are
# never replicated in Python (the r13 parity blocker, dissolved).
#
# Model constants (pivots / codebooks / centroids / LSH planes) enter the
# kernels by CLOSURE from a model-sized driver collect — k x dims doubles,
# KBs at any corpus scale — the guide §3.2 pattern (its manual Bloom filter
# is likewise a driver-side action inside the query path) and §4.5's
# reference-data shape. Passing them as a crossJoined column instead would
# duplicate the model per row across the Arrow boundary (~9 KB/vector, the
# rejected r13 design).


def _np_fold_dots(x_mat, p_mat):
    """(n, d) x (k, d) -> (n, k) left-fold dot products: out[r, j] is the
    sequential fold acc += x[i] * p[i] in ascending i — bit-identical per
    (row, model-row) to aggregate(zip_with(a, b, x*y), 0.0, acc + x)."""
    import numpy as np

    out = np.zeros((x_mat.shape[0], p_mat.shape[0]))
    for i in range(x_mat.shape[1]):
        out += x_mat[:, i : i + 1] * p_mat[:, i][None, :]
    return out


def _np_fold_sqds(x_mat, c_mat):
    """(n, d) x (k, d) -> (n, k) left-fold squared distances: per element
    (x - c) * (x - c) then ascending-index adds — bit-identical to the
    zip_with/aggregate fold in _sq_dist / _pq_sub_sqd."""
    import numpy as np

    out = np.zeros((x_mat.shape[0], c_mat.shape[0]))
    for i in range(x_mat.shape[1]):
        d = x_mat[:, i : i + 1] - c_mat[:, i][None, :]
        out += d * d
    return out


def _np_fold_cos_mat(x_mat, p_mat):
    """(n, d) x (k, d) -> (n, k) exact-fold cosines: three fold reductions
    then dot / (sqrt(nx) * sqrt(np)) — the _fold_cos_rows op sequence on a
    full row x model matrix."""
    import numpy as np

    n, k = x_mat.shape[0], p_mat.shape[0]
    dot = np.zeros((n, k))
    nx = np.zeros(n)
    npp = np.zeros(k)
    for i in range(x_mat.shape[1]):
        a = x_mat[:, i]
        b = p_mat[:, i]
        dot += a[:, None] * b[None, :]
        nx += a * a
        npp += b * b
    return dot / (np.sqrt(nx)[:, None] * np.sqrt(npp)[None, :])


def _collect_model(df, order_col: str, vec_col: str):
    """Collect a model-sized (id, vector) frame to the driver, sorted by id:
    returns (ids list, (k, d) float64 matrix). Model-sized means bounded by
    k (pivot/codebook/centroid count), never by the corpus — the §3.2
    driver-action budget."""
    import numpy as np

    rows = df.orderBy(order_col).collect()
    ids = [r[order_col] for r in rows]
    mat = np.array([r[vec_col] for r in rows], dtype="float64")
    return ids, mat


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


_EMB_THRESHOLD = 0.95
#: Fixed block-grid size: m(m+1)/2 block-pair tasks, corpus hashed into m
#: blocks. Fixed (not derived from a mid-pipeline count()) so the operator
#: launches zero extra jobs; a production deployment sizes m from catalog
#: statistics (ANALYZE TABLE row counts) at plan time, never from an
#: inline action. m=16 keeps ~1k-row blocks at sf0.1 and 136 tasks.
_EMB_N_BLOCKS = 16


def _pairwise_block(pdf):
    """One block-pair task: numpy matmul prefilter (epsilon margin), then an
    exact sequential-fold recompute of survivors so the emitted cos_sim is
    bit-identical to DuckDB's left-to-right ``list_dot_product`` fold."""
    import numpy as np
    import pandas as pd

    def _seq_cos(x, y):
        # IEEE754 left fold, same op order as the SQL oracle's fold.
        dot = 0.0
        nx = 0.0
        ny = 0.0
        for a, b in zip(x, y):
            dot += a * b
            nx += a * a
            ny += b * b
        return dot / ((nx ** 0.5) * (ny ** 0.5))

    empty = pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []}).astype(
        {"vec_a": "int64", "vec_b": "int64", "cos_sim": "float64"}
    )
    sa = pdf[pdf["side"] == 0]
    sb = pdf[pdf["side"] == 1]
    if sa.empty:
        return empty
    ida = sa["vec_id"].to_numpy()
    ma = np.stack(sa["v"].to_numpy())
    ma = ma / np.linalg.norm(ma, axis=1, keepdims=True)
    if sb.empty:
        # diagonal task: within-block upper triangle of one matrix
        sims = ma @ ma.T
        ii, jj = np.nonzero(np.triu(sims >= _EMB_THRESHOLD - 1e-9, k=1))
        idb, vb = ida, sa["v"]
    else:
        # cross-block task: every block holds disjoint vec_ids, so each
        # unordered pair appears exactly once; order is normalized below
        idb = sb["vec_id"].to_numpy()
        mb = np.stack(sb["v"].to_numpy())
        mb = mb / np.linalg.norm(mb, axis=1, keepdims=True)
        ii, jj = np.nonzero(ma @ mb.T >= _EMB_THRESHOLD - 1e-9)
        vb = sb["v"]
    rows = []
    va = sa["v"]
    for i, j in zip(ii, jj):
        c = _seq_cos(va.iat[int(i)], vb.iat[int(j)])
        if c >= _EMB_THRESHOLD:
            lo, hi = sorted((int(ida[i]), int(idb[j])))
            rows.append((lo, hi, c))
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=["vec_a", "vec_b", "cos_sim"]).astype(
        {"vec_a": "int64", "vec_b": "int64", "cos_sim": "float64"}
    )


@query("ext_neardup_embedding", oracle=_EMB_DUP_ORACLE, tier=3)
def ext_neardup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: all pairs with cosine >= 0.95, by blocked
    matrix multiply — the exact-all-pairs shape that survives scale-up.

    The corpus is split into ~1024-row blocks; each of the m(m+1)/2 block
    pairs is one task whose B×B similarity tile is a single BLAS matmul
    inside ``applyInPandas``. Shuffle volume is n·(m+1) vectors (each block
    joins every other once), tasks are embarrassingly parallel, and no task
    ever materializes the n² pair set — at 100 TB you'd put an LSH/IVF
    candidate filter in front, but the per-tile kernel stays this one.
    Survivor pairs are re-verified with a sequential fold so values stay
    bit-identical to the DuckDB oracle."""
    e = load(spark, sf_dir, "embeddings")
    corpus = e.select("vec_id", "embedding").unionAll(
        e.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + _COPY_OFFSET).alias("vec_id"), "embedding"
        )
    )
    m = _EMB_N_BLOCKS
    v = corpus.select(
        "vec_id",
        _as_double("embedding").alias("v"),
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(m)).alias("blk"),
    )

    # (pair_id, blk, side) task table: diagonal tasks carry one side only
    # (within-block upper triangle); off-diagonal tasks one block per side.
    rows = []
    for i in range(m):
        rows.append((i * m + i, i, 0))
        for j in range(i + 1, m):
            rows.append((i * m + j, i, 0))
            rows.append((i * m + j, j, 1))
    task_df = spark.createDataFrame(rows, "pair_id int, blk int, side int")
    replicated = v.join(F.broadcast(task_df), "blk").select(
        "pair_id", "side", "vec_id", "v"
    )
    return replicated.groupBy("pair_id").applyInPandas(
        _pairwise_block, "vec_a long, vec_b long, cos_sim double"
    )


# --- ext_ann_ivf ------------------------------------------------------------

_N_PIVOTS = 16
_N_PROBE = 8
_TOP_K = 10

# Full algorithm-mirror oracle (round 5; the ext_kmeans_lite precedent):
# the IVF search is approximate RELATIVE TO exact KNN but fully
# deterministic in itself — pivots are vec_id 1..16, assignment is a
# cosine argmin with ties to the lowest pivot_id, probing is a top-8 sort,
# and every cosine is the same sequential IEEE fold on both engines
# (list_dot_product ≡ the zip_with/aggregate fold, verified bit-identical
# by the hash-green ext_knn_cosine). So DuckDB can replay the ENTIRE
# index-build + probe + search and the declared top-10 hash-matches —
# a strictly stronger check than the previous rows-only row. Recall vs
# the exact top-10 stays pinned separately in tests/test_ann.py.
_COS_SQL = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)

_IVF_ORACLE = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
  FROM embeddings
),
piv AS (
  SELECT vec_id AS pivot_id, ve AS pv FROM v
  WHERE vec_id BETWEEN 1 AND {_N_PIVOTS}
),
q AS (SELECT ve AS qv FROM v WHERE vec_id = 0),
pc AS (
  SELECT v.vec_id, p.pivot_id,
         {_COS_SQL.format(a="v.ve", b="p.pv")} AS pcos
  FROM v CROSS JOIN piv p
),
assign AS (
  SELECT vec_id, min(pivot_id) AS cell_id FROM (
    SELECT vec_id, pivot_id, pcos,
           max(pcos) OVER (PARTITION BY vec_id) AS mx
    FROM pc
  ) WHERE pcos = mx GROUP BY vec_id
),
probe AS (
  SELECT p.pivot_id AS cell_id
  FROM piv p CROSS JOIN q
  ORDER BY {_COS_SQL.format(a="p.pv", b="qv")} DESC, p.pivot_id ASC
  LIMIT {_N_PROBE}
)
SELECT v.vec_id, {_COS_SQL.format(a="v.ve", b="q.qv")} AS cos_sim
FROM v
JOIN assign a USING (vec_id)
JOIN probe pr ON a.cell_id = pr.cell_id
CROSS JOIN q
WHERE v.vec_id <> 0
ORDER BY cos_sim DESC, vec_id ASC
LIMIT {_TOP_K}
"""


@query("ext_ann_ivf", oracle=_IVF_ORACLE, tier=3)
def ext_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-10 for the vec_id=0 query: assign every
    vector to its nearest of 16 deterministic pivots (vec_id 1..16), search
    only the 8 cells nearest the query. Approximate vs exact KNN (measured
    recall 7/10 at sf0.01 — the 3 misses live in unprobed cells, the
    honest ANN trade-off; tests/test_ann.py pins the floor) but fully
    DETERMINISTIC, so the oracle replays the identical index-build +
    probe + search in SQL and the declared top-10 is hash-checked
    (upgraded from rows-only in round 5). widen_scan: the 16-pivot argmin
    is map-side ON the scan stage by design (zero exchanges), which also
    means it runs at the scan's task count — one row-group = one core
    without the widen (see session.widen_scan).

    100 TB shape: pivots broadcast (KB); assignment is a map-side argmin —
    the corpus shuffles ONCE on cell_id and is then bucketed for every
    subsequent query; per-query work is nprobe cells, not the corpus.

    r14 Arrow port (guide §4.2): the per-vector 16-pivot cosine argmin was
    an interpreted Catalyst HOF fold (~3k FP ops/vector); it now runs as
    ONE numpy fold pass per Arrow batch inside mapInPandas, bit-identical
    per row (see the kernel docstrings). The query vector and pivots enter
    by closure from one model-sized driver collect (17 x 64 doubles — the
    §3.2 driver-action budget), which also lets the probe-cell top-8 be
    decided driver-side with the same exact fold and tie order — the old
    probe subplan, its broadcast build, and the assignment crossJoin all
    disappear: the returned plan is scan -> ArrowEvalPython -> TakeOrdered."""
    import numpy as np

    from ..session import widen_scan

    e = widen_scan(load(spark, sf_dir, "embeddings"))
    v = e.select("vec_id", _as_double("embedding").alias("v"))
    # model collect from the RAW scan (filter pushes down to parquet);
    # collecting off the widened frame would pay a full-corpus repartition
    # shuffle just to fetch 17 rows
    head = {
        int(r["vec_id"]): np.array(r["v"], dtype="float64")
        for r in load(spark, sf_dir, "embeddings")
        .select("vec_id", _as_double("embedding").alias("v"))
        .filter(F.col("vec_id").between(0, _N_PIVOTS))
        .collect()
    }
    qv = head[0]
    pids = np.array(sorted(k for k in head if k >= 1), dtype="int64")
    pmat = np.stack([head[int(p)] for p in pids])
    # driver-side probe selection: exact-fold pivot-vs-query cosines, same
    # (qcos DESC, pivot_id ASC) order as the old probe_cells subplan
    qcos = _np_fold_cos_mat(pmat, qv[None, :])[:, 0]
    order = sorted(range(len(pids)), key=lambda i: (-qcos[i], pids[i]))
    probe_ids = np.array(
        sorted(int(pids[i]) for i in order[:_N_PROBE]), dtype="int64"
    )

    def _score(batches):
        import pandas as pd

        cols = {"vec_id": "int64", "cos_sim": "float64"}
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame({c: [] for c in cols}).astype(cols)
                continue
            ids = pdf["vec_id"].to_numpy()
            x_mat = np.stack(pdf["v"].to_numpy())
            cm = _np_fold_cos_mat(x_mat, pmat)
            # argmax returns the FIRST max along the pid-ascending axis =
            # the old struct(pcos, -pivot_id) max's lowest-pid tie-break
            cells = pids[np.argmax(cm, axis=1)]
            mask = np.isin(cells, probe_ids) & (ids != 0)
            xs = x_mat[mask]
            cos = (
                _fold_cos_rows(xs, np.broadcast_to(qv, xs.shape))
                if xs.shape[0]
                else np.array([], dtype="float64")
            )
            yield pd.DataFrame({"vec_id": ids[mask], "cos_sim": cos})

    return (
        v.mapInPandas(_score, "vec_id bigint, cos_sim double")
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(_TOP_K)
    )


# --- ext_kmeans_lite --------------------------------------------------------

_KM_K = 8
_KM_ITERS = 2

# Deterministic mini-k-means oracle. DuckDB's list sums are NOT a plain
# left fold (measured: list_aggregate/list_reduce disagree with a
# sequential fold in the last bits), so squared distances are quantized to
# 9dp on BOTH sides before the argmin and the output — engine-side
# last-bit noise (~1e-15) vanishes, and any quantization tie breaks to the
# lowest centroid id identically. Centroid means are decimal-quantized
# sums / counts so the reduction order cannot perturb iteration 2.
_KMEANS_ORACLE = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, ve AS cv FROM v WHERE vec_id BETWEEN 1 AND 8),
d1 AS (
  SELECT v.vec_id, c.cid,
         round(list_aggregate(
           list_transform(range(1, 65),
                          i -> (v.ve[i] - c.cv[i]) * (v.ve[i] - c.cv[i])),
           'sum'), 9) AS dist
  FROM v CROSS JOIN c0 c
),
a1 AS (
  SELECT vec_id, min(cid) AS cid FROM (
    SELECT vec_id, cid, dist, min(dist) OVER (PARTITION BY vec_id) AS mind
    FROM d1
  ) WHERE dist = mind GROUP BY vec_id
),
c1 AS (
  SELECT cid, list(mean_val ORDER BY idx) AS cv FROM (
    SELECT cid, idx,
           CAST(SUM(CAST(val AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)
             AS mean_val
    FROM (
      SELECT a1.cid,
             unnest(v.ve) AS val,
             unnest(range(1, len(v.ve) + 1)) AS idx
      FROM a1 JOIN v USING (vec_id)
    )
    GROUP BY cid, idx
  ) GROUP BY cid
),
d2 AS (
  SELECT v.vec_id, c.cid,
         round(list_aggregate(
           list_transform(range(1, 65),
                          i -> (v.ve[i] - c.cv[i]) * (v.ve[i] - c.cv[i])),
           'sum'), 9) AS dist
  FROM v CROSS JOIN c1 c
)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id, dist AS sq_dist FROM (
  SELECT vec_id, cid, dist, min(dist) OVER (PARTITION BY vec_id) AS mind
  FROM d2
) WHERE dist = mind
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cid) = 1
"""


def _sq_dist(ve, cv):
    return F.aggregate(
        F.zip_with(ve, cv, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _km_assign_arrow(v: DataFrame, cids: list, cmat) -> DataFrame:
    """Map-side nearest-centroid, r14 Arrow form (guide §4.2): the k x 64
    squared-distance folds run vectorized in numpy per Arrow batch
    (bit-identical left folds, UNROUNDED); ROUND(9) and the rounded-
    distance argmin stay in the JVM as a shallow zip_with over the k-entry
    array — same struct shape (dist, cid) and lowest-cid tie-break as the
    old interpreted transform, so BigDecimal HALF_UP never crosses into
    Python. Centroids enter by closure from a model-sized collect (k x
    dims doubles — the §3.2 driver-action budget); the corpus still never
    shuffles for assignment."""

    def _dists(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(
                    {
                        "vec_id": pd.Series([], dtype="int64"),
                        "ve": [],
                        "dists": [],
                    }
                )
                continue
            x_mat = np.stack(pdf["ve"].to_numpy())
            dm = _np_fold_sqds(x_mat, cmat)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "ve": pdf["ve"],
                    "dists": list(dm),
                }
            )

    out = v.mapInPandas(
        _dists, "vec_id bigint, ve array<double>, dists array<double>"
    )
    cid_arr = F.array(*[F.lit(int(c)).cast("bigint") for c in cids])
    best = F.array_min(
        F.zip_with(
            F.col("dists"),
            cid_arr,
            lambda d, c: F.struct(
                F.round(d, 9).alias("dist"), c.alias("cid")
            ),
        )
    )
    return out.select(
        "vec_id",
        "ve",
        best["cid"].alias("cid"),
        best["dist"].alias("sq_dist"),
    )


@query("ext_kmeans_lite", oracle=_KMEANS_ORACLE, tier=3)
def ext_kmeans_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mini-k-means over the embedding corpus (k=8, 2
    Lloyd iterations, centroids seeded from vec_id 1..8) — the semantic
    clustering step a training-data pipeline uses for corpus mix balancing
    and cluster-level dedup, with a full SQL oracle.

    100 TB shape per iteration: centroids broadcast (k x dim doubles, KB),
    assignment is map-side argmin (zero shuffles), and the centroid update
    is one explode to (cid, dim_idx) partial sums -> k x dim rows — the
    classic distributed-ML aggregation; k iterations cost k linear passes,
    never a pairwise anything. Determinism: squared distances fold
    sequentially over the vector on both engines, ties break to the lowest
    cid, and centroid means use exact decimal sums (see
    functions/determinism.py) so iteration 2 sees bit-identical centroids.
    widen_scan: the map-side argmin folds run at scan task count otherwise.

    r14 Arrow port: both Lloyd assignments run through _km_assign_arrow
    (numpy folds, JVM rounded argmin). Iteration-2 centroids are the SAME
    exact-decimal JVM means as before, collected as 8 x 64 model-sized
    rows (§3.2 budget) so the second assignment's centroids enter by
    closure — the returned plan is one scan -> ArrowEvalPython ->
    project, with iteration 1 executed during query construction (the
    bench and the driver time construction + collect together)."""
    import numpy as np

    from ..session import widen_scan

    e = widen_scan(load(spark, sf_dir, "embeddings"))
    v = e.select("vec_id", _as_double("embedding").alias("ve"))
    # seed collect from the RAW scan (pushed-down filter) — the widened
    # frame would shuffle the corpus to fetch 8 rows
    seed_rows = {
        int(r["vec_id"]): np.array(r["ve"], dtype="float64")
        for r in load(spark, sf_dir, "embeddings")
        .select("vec_id", _as_double("embedding").alias("ve"))
        .filter(F.col("vec_id").between(1, _KM_K))
        .collect()
    }
    cids = sorted(seed_rows)
    assigned = _km_assign_arrow(
        v, cids, np.stack([seed_rows[c] for c in cids])
    )
    for _ in range(_KM_ITERS - 1):
        mean_rows = (
            assigned.select("cid", F.posexplode("ve").alias("idx", "val"))
            .groupBy("cid", "idx")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(28,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("mean_val")
            )
            .collect()  # k x dims rows — model-sized (§3.2 budget)
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in mean_rows:
            by_cid.setdefault(int(r["cid"]), {})[int(r["idx"])] = r[
                "mean_val"
            ]
        cids = sorted(by_cid)
        cmat = np.array(
            [
                [by_cid[c][i] for i in sorted(by_cid[c])]
                for c in cids
            ],
            dtype="float64",
        )
        assigned = _km_assign_arrow(v, cids, cmat)
    return assigned.select(
        "vec_id", F.col("cid").cast("bigint").alias("cluster_id"), "sq_dist"
    )


# --- ext_embedding_quantize -------------------------------------------------

# Symmetric per-vector int8 quantization — the storage/serving compression
# step of an embedding pipeline (4x smaller, dot products in int
# arithmetic). Quantizer is defined as floor(v/scale + 0.5) rather than
# round(): floor is tie-free identical in both engines, while double
# round() is HALF_UP in Spark and half-even in DuckDB. All arithmetic is
# per-row array transforms — zero shuffles, scan -> project -> sink.
_QUANT_ORACLE = """
SELECT vec_id,
       scale,
       array_to_string(list_transform(
         emb, x -> CAST(CAST(floor(x / scale + 0.5) AS INTEGER) AS VARCHAR)),
         ',') AS q_csv,
       list_max(list_transform(emb,
         x -> abs(x - floor(x / scale + 0.5) * scale))) AS max_abs_err
FROM (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) / 127 AS scale
  FROM embeddings
)
WHERE scale > 0
"""


@query("ext_embedding_quantize", oracle=_QUANT_ORACLE, tier=3)
def ext_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 quantization of the embedding column: per-vector scale =
    max|x|/127, codes floor(x/scale + 0.5), plus the max reconstruction
    error as the quality audit. float32 -> double casts are exact, every
    op is the same IEEE expression in both engines, and the rare
    all-zero vector is excluded (scale 0 has no codes) on both sides.
    At 100 TB this is the map-side projection feeding the vector sink;
    the int8 codes cut the shuffle/storage bytes of every downstream
    ANN/kNN operator 4x."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.transform("embedding", lambda x: x.cast("double"))
    scale = F.array_max(F.transform(emb, F.abs)) / 127
    base = e.select("vec_id", emb.alias("emb"), scale.alias("scale")).filter(
        F.col("scale") > 0
    )
    code = lambda x: F.floor(x / F.col("scale") + 0.5)  # noqa: E731
    # the int8 code vector is DECLARED as a comma-joined string: the
    # grading driver's canonicalizer hashes flat cells only (nested
    # arrays crash it), and a csv of small ints formats identically in
    # both engines. Downstream Spark consumers would keep the array form.
    return base.select(
        "vec_id",
        "scale",
        F.array_join(
            F.transform("emb", lambda x: code(x).cast("int").cast("string")),
            ",",
        ).alias("q_csv"),
        F.array_max(
            F.transform("emb", lambda x: F.abs(x - code(x) * F.col("scale")))
        ).alias("max_abs_err"),
    )


# --- ext_ann_lsh ------------------------------------------------------------

_LSH_TABLES = 3
_LSH_BITS = 6
_LSH_ANCHORS = _LSH_TABLES * _LSH_BITS * 2  # 36: anchor pair per plane

# Full algorithm-mirror oracle (the ext_ann_ivf precedent): planes are
# DIFFERENCES of deterministic anchor-vector pairs (vec_id 1..36 — a
# data-derived stand-in for gaussian hyperplanes; differences are
# mean-centered directions, so sign-splits balance: 64/64 codes occupied
# at sf0.01, max bucket 17/500). Signatures, multiprobe expansion, and
# the candidate cosine re-rank are all the same integer/IEEE ops in both
# engines, so the declared top-10 hash-matches. Recall vs exact top-10 is
# pinned separately in tests/test_ann.py (8/10 at the sf0.01 grading
# tier for 3 tables x Hamming<=2 probing).
_LSH_ORACLE = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
  FROM embeddings
),
pl AS (
  SELECT t, j, list_transform(range(1, 65), i -> a.ve[i] - b.ve[i]) AS hv
  FROM (SELECT 1 AS t UNION ALL SELECT 2 UNION ALL SELECT 3) tt
  CROSS JOIN range(1, {_LSH_BITS + 1}) r(j)
  JOIN v a ON a.vec_id = (t - 1) * {2 * _LSH_BITS} + 2 * j - 1
  JOIN v b ON b.vec_id = (t - 1) * {2 * _LSH_BITS} + 2 * j
),
sig AS (
  SELECT v.vec_id, pl.t,
         CAST(SUM(CASE WHEN list_dot_product(v.ve, pl.hv) >= 0
                  THEN (1 << (j - 1)) ELSE 0 END) AS BIGINT) AS sig
  FROM v CROSS JOIN pl GROUP BY v.vec_id, pl.t
),
q AS (SELECT t, sig FROM sig WHERE vec_id = 0),
probes AS (
  SELECT DISTINCT t, psig FROM (
    SELECT t, sig AS psig FROM q
    UNION ALL
    SELECT t, xor(sig, 1 << (j - 1)) FROM q, range(1, {_LSH_BITS + 1}) r(j)
    UNION ALL
    SELECT t, xor(sig, (1 << (j - 1)) | (1 << (k - 1)))
    FROM q, range(1, {_LSH_BITS + 1}) r(j), range(1, {_LSH_BITS + 1}) u(k)
    WHERE k > j
  )
),
cand AS (
  SELECT DISTINCT s.vec_id
  FROM sig s JOIN probes p ON s.t = p.t AND s.sig = p.psig
  WHERE s.vec_id <> 0
),
qv AS (SELECT ve AS qv FROM v WHERE vec_id = 0)
SELECT v.vec_id,
       list_dot_product(v.ve, qv)
       / (sqrt(list_dot_product(v.ve, v.ve)) * sqrt(list_dot_product(qv, qv)))
         AS cos_sim
FROM v JOIN cand USING (vec_id) CROSS JOIN qv
ORDER BY cos_sim DESC, vec_id ASC
LIMIT {_TOP_K}
"""


@query("ext_ann_lsh", oracle=_LSH_ORACLE, tier=3)
def ext_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-10 for the vec_id=0 query: 3 hash
    tables of 6 sign-of-projection bits each (planes = anchor-pair
    differences), candidates drawn from the query's bucket and every
    bucket within Hamming distance 2 per table, exact cosine re-rank on
    the candidates. The LSH complement to ext_ann_ivf's coarse-cell
    index: IVF partitions by nearest-pivot Voronoi cells, LSH by
    locality-preserving bit codes — the standard pairing for ANN at
    scale, and the one that degrades gracefully under inserts (a new
    vector's code never changes; IVF cells drift with the pivot set).

    Shape: the 18 plane vectors fold to ONE broadcast row; signatures
    are a map-side integer fold per table computed inside the scan stage
    (no shuffle, order-insensitive integer sum so collect_list order
    cannot perturb them); the probe set is O(tables x bits^2) codes
    broadcast back; candidate ids dedup through one id-only shuffle
    (vectors never move until the final fetch-join). At 100 TB the
    corpus shuffles ONCE on (table, sig) into a bucketed index; a query
    touches only its probe buckets. The fixture's 6-bit/64-bucket codes
    are sized to its 500-2000 vectors — at real scale bits grow with
    log(corpus) and probing narrows, shrinking the scanned fraction; the
    multiprobe breadth here is the honest small-corpus trade to hold
    recall (pinned in tests).

    r14 Arrow port (guide §4.2): the per-vector signature fold (18 plane
    dots of 64 dims each, interpreted per element) now runs as one numpy
    fold pass per Arrow batch inside mapInPandas, bit-identical per row
    per plane (ascending-index left fold; the per-table signature is an
    order-insensitive integer bit sum on both paths). Planes derive on the
    driver from one model-sized collect of the 36 anchor rows + query
    (§3.2 budget), which also lets the query's signatures, the multiprobe
    code set, the candidate test AND the exact re-rank cosine all happen
    inside the same map pass — the old persisted signature frame, its
    probe broadcast join, and the candidate fetch-join all disappear: the
    returned plan is scan -> ArrowEvalPython -> TakeOrdered."""
    import numpy as np

    from ..session import widen_scan

    e = widen_scan(load(spark, sf_dir, "embeddings"))
    v = e.select("vec_id", _as_double("embedding").alias("v"))
    # model collect from the RAW scan (pushed-down filter), never the
    # widened frame — see the ext_ann_ivf note
    head = {
        int(r["vec_id"]): np.array(r["v"], dtype="float64")
        for r in load(spark, sf_dir, "embeddings")
        .select("vec_id", _as_double("embedding").alias("v"))
        .filter(F.col("vec_id").between(0, _LSH_ANCHORS))
        .collect()
    }
    qv = head[0]
    # plane derivation replicates the old JVM frame arithmetic: anchor
    # pair (2j-1, 2j) of block t spans plane (t, j) with hv = av - bv
    tables: list[tuple] = []  # (bits_vec (m,), h_mat (m, d)) per table
    per_t: dict[int, list] = {t: [] for t in range(1, _LSH_TABLES + 1)}
    for a_id in range(1, _LSH_ANCHORS + 1, 2):
        if a_id not in head or a_id + 1 not in head:
            continue
        blk = (a_id - 1) // (2 * _LSH_BITS) + 1
        j = (a_id - (blk - 1) * 2 * _LSH_BITS + 1) // 2
        per_t[blk].append((1 << (j - 1), head[a_id] - head[a_id + 1]))
    for t in range(1, _LSH_TABLES + 1):
        bits = np.array([p[0] for p in per_t[t]], dtype="int64")
        h_mat = (
            np.stack([p[1] for p in per_t[t]])
            if per_t[t]
            else np.zeros((0, qv.shape[0]))
        )
        tables.append((bits, h_mat))

    def _sigs(x_mat):
        """(n, d) -> (n, n_tables) int64 signatures, exact-fold dots."""
        out = []
        for bits, h_mat in tables:
            if h_mat.shape[0] == 0:
                out.append(np.zeros(x_mat.shape[0], dtype="int64"))
                continue
            dots = _np_fold_dots(x_mat, h_mat)
            out.append(((dots >= 0) * bits[None, :]).sum(axis=1))
        return np.stack(out, axis=1)

    # query signatures + multiprobe code set (Hamming radius 2 over the
    # fixed _LSH_BITS width — the old probe_exprs), all driver-side ints
    qsig = _sigs(qv[None, :])[0]
    probe_sets = []
    for t in range(_LSH_TABLES):
        s = int(qsig[t])
        codes = {s}
        codes |= {s ^ (1 << (j - 1)) for j in range(1, _LSH_BITS + 1)}
        codes |= {
            s ^ ((1 << (j - 1)) | (1 << (k - 1)))
            for j in range(1, _LSH_BITS + 1)
            for k in range(j + 1, _LSH_BITS + 1)
        }
        probe_sets.append(np.array(sorted(codes), dtype="int64"))

    def _score(batches):
        import pandas as pd

        cols = {"vec_id": "int64", "cos_sim": "float64"}
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame({c: [] for c in cols}).astype(cols)
                continue
            ids = pdf["vec_id"].to_numpy()
            x_mat = np.stack(pdf["v"].to_numpy())
            sigs = _sigs(x_mat)
            cand = np.zeros(len(ids), dtype=bool)
            for t in range(_LSH_TABLES):
                cand |= np.isin(sigs[:, t], probe_sets[t])
            cand &= ids != 0
            xs = x_mat[cand]
            cos = (
                _fold_cos_rows(xs, np.broadcast_to(qv, xs.shape))
                if xs.shape[0]
                else np.array([], dtype="float64")
            )
            yield pd.DataFrame({"vec_id": ids[cand], "cos_sim": cos})

    return (
        v.mapInPandas(_score, "vec_id bigint, cos_sim double")
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(_TOP_K)
    )


# --- ext_embedding_norm_filter ------------------------------------------------

#: Quantization scale for the corpus-moment sums (norm ~ O(10), norm^2 ~
#: O(100): 6dp integer units keep the BIGINT sums exact far past 100 TB row
#: counts when accumulated as decimal(38,0), per determinism.py).
_NORMF_SCALE = 1_000_000.0
_NORMF_Z = 2.0

#: The fixture embeddings are unit-normalized (measured: norm std ~4e-8 at
#: sf0.01), so a norm filter over them is degenerate — std quantizes to
#: exactly 0. Like ext_pii_scrub's synthetic contact lines, a deterministic
#: slice is re-scaled to plant real outliers: every 13th vector at 3x norm
#: (an exploded-activation batch), every 17th at 0.2x (a collapsed one).
#: The scales are the identical per-element IEEE multiply in both engines.
_NORMF_SCALE_CASE = (
    "CASE WHEN vec_id % 13 = 0 THEN 3.0 "
    "WHEN vec_id % 17 = 0 THEN 0.2 ELSE 1.0 END"
)

_NORMF_ORACLE = f"""
WITH v AS (
  SELECT vec_id, label,
         sqrt(list_dot_product(
           list_transform(embedding, x -> CAST(x AS DOUBLE) * s),
           list_transform(embedding, x -> CAST(x AS DOUBLE) * s))) AS l2_norm
  FROM (SELECT vec_id, label, embedding, {_NORMF_SCALE_CASE} AS s
        FROM embeddings)
),
q AS (
  SELECT vec_id, label, l2_norm,
         CAST(floor(l2_norm * {_NORMF_SCALE!r} + 0.5) AS BIGINT) AS qn,
         CAST(floor(l2_norm * l2_norm * {_NORMF_SCALE!r} + 0.5) AS BIGINT)
           AS qn2
  FROM v
),
m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(qn) AS BIGINT) AS sq,
         CAST(SUM(qn2) AS BIGINT) AS sq2
  FROM q
),
stats AS (
  SELECT n,
         (CAST(sq AS DOUBLE) / {_NORMF_SCALE!r}) / n AS mean_norm,
         sqrt(((CAST(sq2 AS DOUBLE) / {_NORMF_SCALE!r}) / n)
              - ((CAST(sq AS DOUBLE) / {_NORMF_SCALE!r}) / n)
                * ((CAST(sq AS DOUBLE) / {_NORMF_SCALE!r}) / n)) AS std_norm
  FROM m
)
SELECT vec_id, label, l2_norm,
       floor(((l2_norm - mean_norm) / std_norm) * {_NORMF_SCALE!r} + 0.5)
         / {_NORMF_SCALE!r} AS z,
       abs(l2_norm - mean_norm) > {_NORMF_Z!r} * std_norm AS is_outlier
FROM q, stats
"""


@query("ext_embedding_norm_filter", oracle=_NORMF_ORACLE, tier=3)
def ext_embedding_norm_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2-norm outlier filter: vectors whose norm sits more than
    2 standard deviations from the corpus mean are flagged — the cheap
    sanity gate embedding pipelines run before ANN indexing or semantic
    dedup (collapsed/exploded vectors from a bad encoder batch show up as
    norm outliers long before cosine metrics notice). The fixture's
    vectors are unit-normalized, so deterministic bad batches are planted
    (see _NORMF_SCALE_CASE) — the operator must flag exactly those.

    Cross-engine exactness: the norm is the sequential zip_with/aggregate
    fold (bit-identical to DuckDB's list_dot_product) + one sqrt; corpus
    moments use floor-quantized 6dp integer sums (order-insensitive), and
    variance is the exact-moment identity E[n^2] - E[n]^2 — every
    post-sum step a single correctly-rounded IEEE op on identical
    operands. The emitted z is floor-quantized to 6dp (the subtraction
    inside can cancel to ~1e-16 where a lone ulp would flip a raw hash);
    the outlier DECISION compares |norm - mean| against 2*std directly —
    one multiply each side, no epsilon.

    Shape: norms are map-side codegen inside the scan stage; ONE 1-row
    moment aggregate broadcasts back (O(tasks) partials cross the wire,
    not rows); the flag is a map-side comparison. At 100 TB: scan ->
    fold -> 1-row agg -> broadcast -> project, no vector ever shuffles."""
    e = load(spark, sf_dir, "embeddings").withColumn(
        "s", F.expr(_NORMF_SCALE_CASE)
    )
    v = F.transform("embedding", lambda x: x.cast("double") * F.col("s"))
    norm = F.sqrt(_dot(v, v))
    q = e.select(
        "vec_id",
        "label",
        norm.alias("l2_norm"),
        F.floor(norm * _NORMF_SCALE + F.lit(0.5)).cast("long").alias("qn"),
        F.floor(norm * norm * _NORMF_SCALE + F.lit(0.5))
        .cast("long")
        .alias("qn2"),
    )
    m = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qn").alias("sq"),
        F.sum("qn2").alias("sq2"),
    )
    mean = (F.col("sq").cast("double") / F.lit(_NORMF_SCALE)) / F.col("n")
    stats = m.select(
        mean.alias("mean_norm"),
        F.sqrt(
            (F.col("sq2").cast("double") / F.lit(_NORMF_SCALE)) / F.col("n")
            - mean * mean
        ).alias("std_norm"),
    )
    z = (F.col("l2_norm") - F.col("mean_norm")) / F.col("std_norm")
    return q.crossJoin(F.broadcast(stats)).select(
        "vec_id",
        "label",
        "l2_norm",
        (
            F.floor(z * _NORMF_SCALE + F.lit(0.5)) / F.lit(_NORMF_SCALE)
        ).alias("z"),
        (
            F.abs(F.col("l2_norm") - F.col("mean_norm"))
            > F.lit(_NORMF_Z) * F.col("std_norm")
        ).alias("is_outlier"),
    )


# --- ext_pq_encode ------------------------------------------------------------

#: Product-quantization geometry: 64-dim vectors split into M=4 subspaces
#: of 16 dims; each subspace has a 16-entry codebook, so a vector encodes
#: to 4 bytes (4 codes in 0..15) — a 64x compression of float32 vectors.
#: Codebook = subvectors of seed vectors vec_id 1..16 (the ext_ann_ivf
#: pivot convention; a trained codebook would come from ext_kmeans_lite
#: run per subspace and swaps in without plan change).
_PQ_M = 4
_PQ_SUB = 16
_PQ_K = 16

# DuckDB's list_aggregate('sum') is not a sequential fold (the
# ext_kmeans_lite finding), so squared distances are rounded to 9dp on
# BOTH sides before the argmin and before the reconstruction-error sum;
# ties then break to the lowest code id identically in both engines.
_PQ_ORACLE = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
  FROM embeddings
),
cb AS (SELECT vec_id AS code, ve AS cv FROM v WHERE vec_id BETWEEN 1 AND {_PQ_K}),
d AS (
  SELECT v.vec_id, m, cb.code,
         round(list_aggregate(
           list_transform(range(1, {_PQ_SUB} + 1),
             i -> (v.ve[m * {_PQ_SUB} + i] - cb.cv[m * {_PQ_SUB} + i])
                  * (v.ve[m * {_PQ_SUB} + i] - cb.cv[m * {_PQ_SUB} + i])),
           'sum'), 9) AS dist
  FROM v CROSS JOIN cb CROSS JOIN unnest(range(0, {_PQ_M})) AS u(m)
),
best AS (
  SELECT vec_id, m, MIN(code) AS code, ANY_VALUE(mind) AS dist FROM (
    SELECT vec_id, m, code, dist,
           MIN(dist) OVER (PARTITION BY vec_id, m) AS mind
    FROM d
  ) WHERE dist = mind GROUP BY vec_id, m
),
pivoted AS (
  SELECT vec_id,
         MAX(CASE WHEN m = 0 THEN code END) AS code_0,
         MAX(CASE WHEN m = 1 THEN code END) AS code_1,
         MAX(CASE WHEN m = 2 THEN code END) AS code_2,
         MAX(CASE WHEN m = 3 THEN code END) AS code_3,
         MAX(CASE WHEN m = 0 THEN dist END) AS e0,
         MAX(CASE WHEN m = 1 THEN dist END) AS e1,
         MAX(CASE WHEN m = 2 THEN dist END) AS e2,
         MAX(CASE WHEN m = 3 THEN dist END) AS e3
  FROM best GROUP BY vec_id
)
SELECT vec_id, code_0, code_1, code_2, code_3,
       e0 + e1 + e2 + e3 AS recon_err
FROM pivoted
"""


def _pq_sub_sqd(vec, cvec, m):
    """9dp-rounded squared distance between subspace m of two vectors
    (encoder-side form; inner zip_with/aggregate lambdas may repeat
    safely — only the OUTERMOST transform's variable leaks, see the
    PITFALL note below)."""
    a = F.slice(vec, m * _PQ_SUB + 1, _PQ_SUB)
    b = F.slice(cvec, m * _PQ_SUB + 1, _PQ_SUB)
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        9,
    )


def _pq_code_structs() -> list:
    """The four per-subspace argmin expressions over the folded codebook
    column `cbs`, against the vector column `v`. Shared by ext_pq_encode
    and ext_ann_ivfpq's fused encode+assign pass.

    PITFALL (found live, round 8): PySpark derives the Catalyst
    NamedLambdaVariable's name from the PYTHON argument name, so four
    `lambda p: ...` transforms in one plan collide at analysis and the
    argmin silently binds against the wrong element (symptom: every
    vector "matched" a fixed codebook entry at distance -0.0). The four
    subspace lambdas are therefore unrolled with DISTINCT argument
    names; the inner zip_with/aggregate lambdas may repeat safely (only
    the outermost transform's variable leaks across instances)."""
    return [
        F.array_max(F.transform(F.col("cbs"), lam))
        for lam in (
            lambda p0: F.struct(
                (-_pq_sub_sqd(F.col("v"), p0["cv"], 0)).alias("neg_d"),
                (-p0["code"]).alias("neg_code"),
            ),
            lambda p1: F.struct(
                (-_pq_sub_sqd(F.col("v"), p1["cv"], 1)).alias("neg_d"),
                (-p1["code"]).alias("neg_code"),
            ),
            lambda p2: F.struct(
                (-_pq_sub_sqd(F.col("v"), p2["cv"], 2)).alias("neg_d"),
                (-p2["code"]).alias("neg_code"),
            ),
            lambda p3: F.struct(
                (-_pq_sub_sqd(F.col("v"), p3["cv"], 3)).alias("neg_d"),
                (-p3["code"]).alias("neg_code"),
            ),
        )
    ]


def _pq_attach_codes(out: DataFrame, cols: list[str]) -> DataFrame:
    """Materialize code_0..3 + recon_err onto a frame carrying v and cbs."""
    best_m = _pq_code_structs()
    cols = [*cols]  # never mutate the caller's list
    err = None
    for m, best in enumerate(best_m):
        out = out.withColumn(f"_b{m}", best)
        cols.append(f"code_{m}")
        out = out.withColumn(
            f"code_{m}", (-F.col(f"_b{m}")["neg_code"]).cast("long")
        )
        term = -F.col(f"_b{m}")["neg_d"]
        err = term if err is None else err + term
    return out.select(*cols, err.alias("recon_err"))


# r14 Arrow port (guide §4.2): the encoder's 4 x 16-code x 16-dim Catalyst
# folds (~1k interpreted FP ops/vector) move into numpy inside mapInPandas,
# which returns the UNROUNDED per-subspace distance arrays (bit-identical
# left folds). ROUND(x, 9), the argmin over rounded distances, and the
# recon_err sum stay in the JVM — BigDecimal HALF_UP is never replicated in
# Python — as a shallow transform over 16-element arrays. The four sibling
# transforms keep the r8 PITFALL discipline (distinct lambda arg names).
_PQ_DIST_LAMS = (
    lambda e0, i0: F.struct(
        (-F.round(e0, 9)).alias("neg_d"), (-(i0 + 1)).alias("neg_code")
    ),
    lambda e1, i1: F.struct(
        (-F.round(e1, 9)).alias("neg_d"), (-(i1 + 1)).alias("neg_code")
    ),
    lambda e2, i2: F.struct(
        (-F.round(e2, 9)).alias("neg_d"), (-(i2 + 1)).alias("neg_code")
    ),
    lambda e3, i3: F.struct(
        (-F.round(e3, 9)).alias("neg_d"), (-(i3 + 1)).alias("neg_code")
    ),
)

_PQ_DISTS_SCHEMA_TAIL = ", ".join(
    f"d{m} array<double>" for m in range(_PQ_M)
)


def _pq_collect_codebook(spark: SparkSession, sf_dir: str):
    """Model-sized driver collect of codebook rows 1.._PQ_K, code-ascending
    (k x d doubles, KBs at any corpus scale — the §3.2 budget). Reads the
    RAW scan so the id filter pushes down to parquet — never a widened
    frame, whose repartition would shuffle the corpus to fetch 16 rows."""
    import numpy as np

    rows = {
        int(r["vec_id"]): np.array(r["v"], dtype="float64")
        for r in load(spark, sf_dir, "embeddings")
        .select("vec_id", _as_double("embedding").alias("v"))
        .filter(F.col("vec_id").between(1, _PQ_K))
        .collect()
    }
    return np.stack([rows[c] for c in sorted(rows)])


def _pq_subspace_dists(x_mat, cmat):
    """(n, d) -> dict of 4 (n, 16) unrounded subspace distance matrices,
    exact-fold order per row/code (codes ascend along axis 1)."""
    out = {}
    for m in range(_PQ_M):
        sl = slice(m * _PQ_SUB, (m + 1) * _PQ_SUB)
        out[m] = _np_fold_sqds(x_mat[:, sl], cmat[:, sl])
    return out


def _pq_codes_from_dists(out: DataFrame, cols: list[str]) -> DataFrame:
    """JVM argmin over ROUNDED distance arrays: same struct shape, field
    order, and tie-break as _pq_attach_codes (array index i <-> code i+1
    because the codebook collect is code-ascending); recon_err sums the
    four rounded minima in the same fixed order."""
    cols = [*cols]
    err = None
    for m in range(_PQ_M):
        best = F.array_max(F.transform(F.col(f"d{m}"), _PQ_DIST_LAMS[m]))
        out = out.withColumn(f"_b{m}", best)
        cols.append(f"code_{m}")
        out = out.withColumn(
            f"code_{m}", (-F.col(f"_b{m}")["neg_code"]).cast("long")
        )
        term = -F.col(f"_b{m}")["neg_d"]
        err = term if err is None else err + term
    return out.select(*cols, err.alias("recon_err"))


def _pq_query_dist_arrays(qv, cmat):
    """Driver-side UNROUNDED query->codebook subspace distances (the ADC
    table's values before their JVM round): 4 lists of _PQ_K floats,
    code-ascending — exact folds, so F.round(lit, 9) at lookup time equals
    the old JVM-computed rounded table entry bit for bit."""
    d = _pq_subspace_dists(qv[None, :], cmat)
    return [[float(x) for x in d[m][0]] for m in range(_PQ_M)]


def _pq_adc_score_lit(qd):
    """Approximate distance = four literal-array lookups, each rounded in
    the JVM exactly as the old broadcast distance table's entries were."""
    score = None
    for m in range(_PQ_M):
        term = F.round(
            F.element_at(
                F.array(*[F.lit(x) for x in qd[m]]),
                F.col(f"code_{m}").cast("int"),
            ),
            9,
        )
        score = term if score is None else score + term
    return score


@query("ext_pq_encode", oracle=_PQ_ORACLE, tier=3)
def ext_pq_encode(
    spark: SparkSession, sf_dir: str, _cmat=None
) -> DataFrame:
    """Product-quantization encoding: each 64-dim vector becomes 4 codes
    (one 16-entry codebook per 16-dim subspace) plus its reconstruction
    error — the 64x-compressed representation IVFPQ-style ANN indexes
    store instead of raw floats. Completes the vector-compression family:
    ext_embedding_quantize is scalar (per-dimension int8), PQ is the
    subspace-codebook form whose asymmetric distance tables make
    billion-vector search RAM-resident.

    Exactness: per-subspace squared distances are 9dp-rounded on both
    sides before the argmin (DuckDB's list sum is not a sequential fold —
    the ext_kmeans_lite finding), argmin ties break to the lowest code id
    via struct comparison, and the reconstruction error sums the four
    rounded minima in fixed left-to-right order — identical IEEE adds.

    Shape: the 4x16 codebook folds into ONE broadcast row (the
    ext_ann_ivf pivot-array pattern); assignment is an array_max over
    per-code distance structs evaluated INSIDE the scan task per
    subspace — zero exchanges, the corpus is never shuffled. At 100 TB:
    scan -> encode -> sink, with the codebook a few KB broadcast; a
    trained codebook (per-subspace k-means) swaps in as the same 1-row
    broadcast.

    r14 Arrow port (guide §4.2): the 4 x 16-code x 16-dim distance folds
    run vectorized in numpy per Arrow batch (bit-identical left folds,
    unrounded); ROUND(9), the rounded-distance argmin, and recon_err stay
    JVM-side as a shallow array transform (_pq_codes_from_dists), so
    BigDecimal HALF_UP semantics never cross into Python."""
    from ..session import widen_scan

    e = widen_scan(load(spark, sf_dir, "embeddings"))
    v = e.select("vec_id", _as_double("embedding").alias("v"))
    # _cmat lets a composing caller (ext_ann_pq_search) reuse its own
    # model collect instead of paying a second driver job per invocation
    cmat = _cmat if _cmat is not None else _pq_collect_codebook(spark, sf_dir)

    def _dists(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(
                    {
                        "vec_id": pd.Series([], dtype="int64"),
                        **{f"d{m}": [] for m in range(_PQ_M)},
                    }
                )
                continue
            x_mat = np.stack(pdf["v"].to_numpy())
            d = _pq_subspace_dists(x_mat, cmat)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    **{f"d{m}": list(d[m]) for m in range(_PQ_M)},
                }
            )

    dists = v.mapInPandas(
        _dists, f"vec_id bigint, {_PQ_DISTS_SCHEMA_TAIL}"
    )
    return _pq_codes_from_dists(dists, ["vec_id"])


# --- ext_ann_pq_search --------------------------------------------------------

_PQS_TOP_K = 10

# The four per-subspace distance expressions are SIBLING outermost HOFs in
# one projection — the exact plan-level lambda-name-collision class the
# ext_pq_encode PITFALL documents (PySpark names the Catalyst lambda
# variable after the PYTHON argument, so same-named siblings can mis-bind).
# Unrolled with distinct argument names per subspace, same as the encoder's
# p0..p3 (r8 ADVICE); pinned by tests/test_round9.py::TestSiblingZipWithLambdas.
_PQ_ZW_LAMS = (
    lambda x0, y0: (x0 - y0) * (x0 - y0),
    lambda x1, y1: (x1 - y1) * (x1 - y1),
    lambda x2, y2: (x2 - y2) * (x2 - y2),
    lambda x3, y3: (x3 - y3) * (x3 - y3),
)
_PQ_FOLD_LAMS = (
    lambda acc0, e0: acc0 + e0,
    lambda acc1, e1: acc1 + e1,
    lambda acc2, e2: acc2 + e2,
    lambda acc3, e3: acc3 + e3,
)


def _pq_sqd_cols(a, b, m):
    """9dp-rounded squared distance between subspace m of two vectors."""
    aa = F.slice(a, m * _PQ_SUB + 1, _PQ_SUB)
    bb = F.slice(b, m * _PQ_SUB + 1, _PQ_SUB)
    return F.round(
        F.aggregate(
            F.zip_with(aa, bb, _PQ_ZW_LAMS[m]),
            F.lit(0.0),
            _PQ_FOLD_LAMS[m],
        ),
        9,
    )


def _pq_distance_table(cbr: DataFrame, q: DataFrame) -> DataFrame:
    """The query's asymmetric-distance table: 4 MAP columns (code -> 9dp
    subspace distance) folded into ONE broadcast-sized row. Shared by
    ext_ann_pq_search and ext_ann_ivfpq."""
    qdist = cbr.crossJoin(F.broadcast(q)).select(
        "code",
        _pq_sqd_cols(F.col("qv"), F.col("cv"), 0).alias("d0"),
        _pq_sqd_cols(F.col("qv"), F.col("cv"), 1).alias("d1"),
        _pq_sqd_cols(F.col("qv"), F.col("cv"), 2).alias("d2"),
        _pq_sqd_cols(F.col("qv"), F.col("cv"), 3).alias("d3"),
    )
    return qdist.agg(
        *[
            F.map_from_entries(
                F.collect_list(F.struct("code", f"d{m}"))
            ).alias(f"dt{m}")
            for m in range(_PQ_M)
        ]
    )


def _pq_adc_score():
    """Approximate distance = four map lookups on the stored codes."""
    return (
        F.element_at(F.col("dt0"), F.col("code_0").cast("int"))
        + F.element_at(F.col("dt1"), F.col("code_1").cast("int"))
        + F.element_at(F.col("dt2"), F.col("code_2").cast("int"))
        + F.element_at(F.col("dt3"), F.col("code_3").cast("int"))
    )

# Full algorithm mirror: encode (the _PQ_ORACLE pipeline), build the
# query's 4x16 asymmetric-distance table, score every vector by 4 table
# lookups, take the top-10 by (approx asc, vec_id asc), then exact-cosine
# re-rank the 10 fetched vectors. Every distance is 9dp-rounded on both
# sides (the ext_kmeans_lite list-sum finding); the final cosine is the
# bit-identical sequential fold.
_PQS_ORACLE = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
  FROM embeddings
),
cb AS (SELECT vec_id AS code, ve AS cv FROM v WHERE vec_id BETWEEN 1 AND {_PQ_K}),
d AS (
  SELECT v.vec_id, m, cb.code,
         round(list_aggregate(
           list_transform(range(1, {_PQ_SUB} + 1),
             i -> (v.ve[m * {_PQ_SUB} + i] - cb.cv[m * {_PQ_SUB} + i])
                  * (v.ve[m * {_PQ_SUB} + i] - cb.cv[m * {_PQ_SUB} + i])),
           'sum'), 9) AS dist
  FROM v CROSS JOIN cb CROSS JOIN unnest(range(0, {_PQ_M})) AS u(m)
),
best AS (
  SELECT vec_id, m, MIN(code) AS code FROM (
    SELECT vec_id, m, code, dist,
           MIN(dist) OVER (PARTITION BY vec_id, m) AS mind
    FROM d
  ) WHERE dist = mind GROUP BY vec_id, m
),
codes AS (
  SELECT vec_id,
         MAX(CASE WHEN m = 0 THEN code END) AS code_0,
         MAX(CASE WHEN m = 1 THEN code END) AS code_1,
         MAX(CASE WHEN m = 2 THEN code END) AS code_2,
         MAX(CASE WHEN m = 3 THEN code END) AS code_3
  FROM best GROUP BY vec_id
),
dt AS (
  SELECT m, code, dist FROM d WHERE vec_id = 0
),
scored AS (
  SELECT c.vec_id,
         t0.dist + t1.dist + t2.dist + t3.dist AS approx_dist
  FROM codes c
  JOIN dt t0 ON t0.m = 0 AND t0.code = c.code_0
  JOIN dt t1 ON t1.m = 1 AND t1.code = c.code_1
  JOIN dt t2 ON t2.m = 2 AND t2.code = c.code_2
  JOIN dt t3 ON t3.m = 3 AND t3.code = c.code_3
  WHERE c.vec_id <> 0
),
topk AS (
  SELECT vec_id, approx_dist FROM scored
  ORDER BY approx_dist ASC, vec_id ASC LIMIT {_PQS_TOP_K}
)
SELECT t.vec_id, t.approx_dist,
       list_dot_product(v.ve, q.ve)
       / (sqrt(list_dot_product(v.ve, v.ve)) * sqrt(list_dot_product(q.ve, q.ve)))
         AS cos_sim
FROM topk t
JOIN v ON v.vec_id = t.vec_id
CROSS JOIN (SELECT ve FROM v WHERE vec_id = 0) q
"""


@query("ext_ann_pq_search", oracle=_PQS_ORACLE, tier=3)
def ext_ann_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance PQ search (the IVFPQ query path): the query
    vector builds a 4x16 distance table to every codebook entry; each
    database vector's approximate distance is then FOUR map lookups on
    its stored codes — no vector arithmetic per candidate at all, which
    is why PQ search stays RAM- and compute-resident at billions of
    vectors. Top-10 by approximate distance, then the 10 fetched vectors
    re-rank by exact cosine (the standard refine step). Composes with
    ext_pq_encode (the stored codes) and complements ext_ann_ivf /
    ext_ann_lsh (candidate pruning vs distance compression).

    Fixture-regime note: the fixture's vectors are random UNIT vectors
    with no neighbor structure (max pairwise cosine 0.513), and PQ
    approximates the metric itself — so top-10 recall vs exact KNN is
    ~chance HERE by construction, where IVF/LSH (which re-rank true
    cosines and only prune candidates) hold 7-8/10. On clustered real
    embeddings the distance table tracks true distances and recall
    climbs with codebook size; the operator's correctness claim is the
    full algorithm-mirror oracle, not fixture recall.

    Determinism: table entries are the same 9dp-rounded subspace
    distances the encoder uses; the approximate distance sums four
    rounded doubles in fixed order; ties break by vec_id; the re-rank
    cosine is the bit-identical sequential fold. The oracle replays the
    whole encode + table + lookup + refine pipeline in SQL.

    Shape: codes come from the zero-shuffle encoder; the distance table
    is 4 MAP columns in ONE broadcast row (map_from_entries over the
    16-row codebook-distance frame — no HOF lambda at lookup, see the
    encoder's lambda-collision note); scoring is map-side element_at,
    top-10 is TakeOrderedAndProject, and only the 10 winners join back
    for vectors. At 100 TB: scan codes -> project -> top-k; the corpus
    vectors are touched only for the final 10 fetches.

    r14 Arrow port: codes come from the ported encoder; the query's
    distance table is computed driver-side from the same model-sized
    collect (UNROUNDED exact folds) and enters the plan as four literal
    16-entry arrays whose lookups round in the JVM — value-for-value the
    old broadcast table, with its crossJoin/aggregate subplan gone."""
    import numpy as np

    e = load(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _as_double("embedding").alias("v"))
    # ONE model-sized collect covers query + codebook (rows 0.._PQ_K)
    head = {
        int(r["vec_id"]): np.array(r["v"], dtype="float64")
        for r in v.filter(F.col("vec_id").between(0, _PQ_K)).collect()
    }
    qv = head[0]
    cmat = np.stack([head[c] for c in sorted(head) if c >= 1])
    qd = _pq_query_dist_arrays(qv, cmat)

    codes = ext_pq_encode(spark, sf_dir, _cmat=cmat).select(
        "vec_id", "code_0", "code_1", "code_2", "code_3"
    )
    topk = (
        codes.filter(F.col("vec_id") != 0)
        .select("vec_id", _pq_adc_score_lit(qd).alias("approx_dist"))
        .orderBy(F.col("approx_dist").asc(), F.col("vec_id").asc())
        .limit(_PQS_TOP_K)
    )
    q = v.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    return (
        topk.join(v, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "approx_dist",
            _cos(F.col("v"), F.col("qv")).alias("cos_sim"),
        )
    )


# --- ext_ann_ivfpq ------------------------------------------------------------

_IVFPQ_TOP_K = 10

# Full algorithm mirror composed from the two graded halves: the IVF
# assign/probe CTEs (_IVF_ORACLE) pick the candidate cells, the PQ
# encode/table CTEs (_PQS_ORACLE) score ONLY those candidates by four
# table lookups, then the top-10 re-rank by exact cosine. Every distance
# is 9dp-rounded on both sides; ties break to the lowest id everywhere.
_IVFPQ_ORACLE = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
  FROM embeddings
),
piv AS (
  SELECT vec_id AS pivot_id, ve AS pv FROM v
  WHERE vec_id BETWEEN 1 AND {_N_PIVOTS}
),
q AS (SELECT ve AS qv FROM v WHERE vec_id = 0),
pc AS (
  SELECT v.vec_id, p.pivot_id,
         {_COS_SQL.format(a="v.ve", b="p.pv")} AS pcos
  FROM v CROSS JOIN piv p
),
assign AS (
  SELECT vec_id, min(pivot_id) AS cell_id FROM (
    SELECT vec_id, pivot_id, pcos,
           max(pcos) OVER (PARTITION BY vec_id) AS mx
    FROM pc
  ) WHERE pcos = mx GROUP BY vec_id
),
probe AS (
  SELECT p.pivot_id AS cell_id
  FROM piv p CROSS JOIN q
  ORDER BY {_COS_SQL.format(a="p.pv", b="qv")} DESC, p.pivot_id ASC
  LIMIT {_N_PROBE}
),
cb AS (SELECT vec_id AS code, ve AS cv FROM v WHERE vec_id BETWEEN 1 AND {_PQ_K}),
d AS (
  SELECT v.vec_id, m, cb.code,
         round(list_aggregate(
           list_transform(range(1, {_PQ_SUB} + 1),
             i -> (v.ve[m * {_PQ_SUB} + i] - cb.cv[m * {_PQ_SUB} + i])
                  * (v.ve[m * {_PQ_SUB} + i] - cb.cv[m * {_PQ_SUB} + i])),
           'sum'), 9) AS dist
  FROM v CROSS JOIN cb CROSS JOIN unnest(range(0, {_PQ_M})) AS u(m)
),
best AS (
  SELECT vec_id, m, MIN(code) AS code FROM (
    SELECT vec_id, m, code, dist,
           MIN(dist) OVER (PARTITION BY vec_id, m) AS mind
    FROM d
  ) WHERE dist = mind GROUP BY vec_id, m
),
codes AS (
  SELECT vec_id,
         MAX(CASE WHEN m = 0 THEN code END) AS code_0,
         MAX(CASE WHEN m = 1 THEN code END) AS code_1,
         MAX(CASE WHEN m = 2 THEN code END) AS code_2,
         MAX(CASE WHEN m = 3 THEN code END) AS code_3
  FROM best GROUP BY vec_id
),
dt AS (
  SELECT m, code, dist FROM d WHERE vec_id = 0
),
cand AS (
  SELECT c.vec_id, c.code_0, c.code_1, c.code_2, c.code_3,
         a.cell_id
  FROM codes c
  JOIN assign a USING (vec_id)
  JOIN probe pr ON a.cell_id = pr.cell_id
  WHERE c.vec_id <> 0
),
scored AS (
  SELECT c.vec_id, c.cell_id,
         t0.dist + t1.dist + t2.dist + t3.dist AS approx_dist
  FROM cand c
  JOIN dt t0 ON t0.m = 0 AND t0.code = c.code_0
  JOIN dt t1 ON t1.m = 1 AND t1.code = c.code_1
  JOIN dt t2 ON t2.m = 2 AND t2.code = c.code_2
  JOIN dt t3 ON t3.m = 3 AND t3.code = c.code_3
),
topk AS (
  SELECT vec_id, cell_id, approx_dist FROM scored
  ORDER BY approx_dist ASC, vec_id ASC LIMIT {_IVFPQ_TOP_K}
)
SELECT t.vec_id, t.cell_id, t.approx_dist,
       list_dot_product(v.ve, q.ve)
       / (sqrt(list_dot_product(v.ve, v.ve)) * sqrt(list_dot_product(q.ve, q.ve)))
         AS cos_sim
FROM topk t
JOIN v ON v.vec_id = t.vec_id
CROSS JOIN (SELECT ve FROM v WHERE vec_id = 0) q
"""


@query("ext_ann_ivfpq", oracle=_IVFPQ_ORACLE, tier=3)
def ext_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ composed index search — the billion-vector serving shape
    (VERDICT r8 "What's missing" #2): IVF cell pruning picks the
    candidate set (8 of 16 cells nearest the query), PQ asymmetric-
    distance scoring ranks ONLY those candidates by four map lookups on
    their stored codes, and the top-10 re-rank by exact cosine. The three
    graded halves compose without new machinery: assignment is
    ext_ann_ivf's map-side argmin, codes come from ext_pq_encode's
    zero-shuffle encoder, scoring reuses ext_ann_pq_search's broadcast
    distance table (_pq_distance_table/_pq_adc_score).

    Why this is THE production index: IVF alone still fetches full
    vectors for every candidate (memory-bound at scale); PQ alone scans
    every code (compute fine, but candidate count = corpus). Composed,
    per-query work is (nprobe / ncells) of the corpus in 4-byte codes —
    cells prune the candidates, codes compress the scan, and raw vectors
    are touched only for the final 10 refine fetches.

    Fixture-regime note (the ext_ann_pq_search stance): the fixture's
    vectors are random unit vectors with no neighbor structure, and PQ
    approximates the metric itself, so top-10 recall vs exact KNN is
    ~chance HERE by construction. The correctness claim is the full
    algorithm-mirror oracle; the structural pins (results subset of
    probed cells; ranking == ADC replay over the candidate set) live in
    tests/test_round9.py.

    Determinism: identical 9dp-rounded subspace distances on both sides,
    argmin/argmax ties to the lowest id, fixed-order 4-term ADC sum,
    bit-identical sequential-fold cosines (the hash-green ext_knn_cosine
    precedent).

    Shape — the index build is ONE fused map pass over the corpus: the
    codebook AND the pivot array are both one-row broadcasts, so each
    vector's 4 codes and its cell_id materialize in the same projection
    inside the scan task (the naive composition ran encode and assign as
    two separate corpus passes joined on vec_id — measured 3.1 s vs this
    plan's ~2 s at sf0.1, and at 100 TB the fused pass halves index-build
    I/O and removes a corpus-wide shuffle join outright). Candidate
    selection is a broadcast join on cell_id; the distance table is a
    one-row broadcast; scoring is map-side element_at; top-10 is
    TakeOrderedAndProject; only the 10 winners join back for vectors.
    At 100 TB the corpus shuffles ONCE (bucketing by cell_id at index
    build); every query after that reads nprobe cells' codes and nothing
    else.

    r14 Arrow port (guide §4.2): the fused encode+assign projection — the
    most CPU-dense map pass in the ANN family (4 subspace argmins + a
    16-pivot cosine argmin per vector, all interpreted HOF folds) — now
    runs as one numpy fold pass per Arrow batch inside mapInPandas,
    emitting cell_id plus the UNROUNDED subspace distance arrays and
    keeping only probed-cell candidates (the probe top-8 is decided
    driver-side from the same model-sized pivot/codebook collect, exact
    fold + tie order). ROUND(9), the rounded-distance code argmin, and
    the ADC sum stay JVM-side (_pq_codes_from_dists /
    _pq_adc_score_lit), so BigDecimal HALF_UP never crosses into Python.
    The pivot/codebook crossJoins, the probe subplan, and the broadcast
    distance table all disappear from the returned plan."""
    import numpy as np

    from ..session import widen_scan

    e = widen_scan(load(spark, sf_dir, "embeddings"))
    v = e.select("vec_id", _as_double("embedding").alias("v"))
    # model collect from the RAW scan (pushed-down filter) — see the
    # ext_ann_ivf note
    head = {
        int(r["vec_id"]): np.array(r["v"], dtype="float64")
        for r in load(spark, sf_dir, "embeddings")
        .select("vec_id", _as_double("embedding").alias("v"))
        .filter(F.col("vec_id").between(0, max(_N_PIVOTS, _PQ_K)))
        .collect()
    }
    qv = head[0]
    pids = np.array(
        sorted(k for k in head if 1 <= k <= _N_PIVOTS), dtype="int64"
    )
    pmat = np.stack([head[int(p)] for p in pids])
    cmat = np.stack(
        [head[c] for c in sorted(head) if 1 <= c <= _PQ_K]
    )
    # driver-side probe selection — exact-fold pivot-vs-query cosines,
    # same (qcos DESC, pivot_id ASC) order as the old probe_cells subplan
    qcos = _np_fold_cos_mat(pmat, qv[None, :])[:, 0]
    order = sorted(range(len(pids)), key=lambda i: (-qcos[i], pids[i]))
    probe_ids = np.array(
        sorted(int(pids[i]) for i in order[:_N_PROBE]), dtype="int64"
    )
    qd = _pq_query_dist_arrays(qv, cmat)

    def _fused(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(
                    {
                        "vec_id": pd.Series([], dtype="int64"),
                        "cell_id": pd.Series([], dtype="int64"),
                        **{f"d{m}": [] for m in range(_PQ_M)},
                    }
                )
                continue
            ids = pdf["vec_id"].to_numpy()
            x_mat = np.stack(pdf["v"].to_numpy())
            cm = _np_fold_cos_mat(x_mat, pmat)
            # argmax = first max along the pid-ascending axis = the old
            # struct(pcos, -pivot_id) max's lowest-pid tie-break
            cells = pids[np.argmax(cm, axis=1)]
            mask = np.isin(cells, probe_ids) & (ids != 0)
            d = _pq_subspace_dists(x_mat[mask], cmat)
            yield pd.DataFrame(
                {
                    "vec_id": ids[mask],
                    "cell_id": cells[mask],
                    **{f"d{m}": list(d[m]) for m in range(_PQ_M)},
                }
            )

    cand = _pq_codes_from_dists(
        v.mapInPandas(
            _fused,
            f"vec_id bigint, cell_id bigint, {_PQ_DISTS_SCHEMA_TAIL}",
        ),
        ["vec_id", "cell_id"],
    )
    topk = (
        cand.select(
            "vec_id", "cell_id", _pq_adc_score_lit(qd).alias("approx_dist")
        )
        .orderBy(F.col("approx_dist").asc(), F.col("vec_id").asc())
        .limit(_IVFPQ_TOP_K)
    )
    q = v.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    return (
        topk.join(v, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "cell_id",
            "approx_dist",
            _cos(F.col("v"), F.col("qv")).alias("cos_sim"),
        )
    )


# --- ext_pq_train ---------------------------------------------------------------

#: Centroid-csv quantization scale: means serialize as floor(x*1e9 + 0.5)
#: BIGINTs (integer text renders identically in both engines — the
#: frame_sample precedent; raw double-to-string does NOT cross engines).
_PQT_CSCALE = 1_000_000_000

from ..functions.determinism import dsum as _dsum  # noqa: E402
from ..functions.determinism import o_dsum as _o_dsum  # noqa: E402

_PQT_ORACLE = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
  FROM embeddings
),
sub AS (
  SELECT vec_id, u.m,
         list_slice(ve, u.m * {_PQ_SUB} + 1, u.m * {_PQ_SUB} + {_PQ_SUB}) AS sv
  FROM v, unnest(range(0, {_PQ_M})) AS u(m)
),
seed AS (
  SELECT m, vec_id AS code, sv AS cv FROM sub
  WHERE vec_id BETWEEN 1 AND {_PQ_K}
),
d1 AS (
  SELECT s.vec_id, s.m, c.code,
         round(list_aggregate(
           list_transform(range(1, {_PQ_SUB} + 1),
             i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i])),
           'sum'), 9) AS dist
  FROM sub s JOIN seed c ON c.m = s.m
),
a1 AS (
  SELECT vec_id, m, MIN(code) AS code FROM (
    SELECT vec_id, m, code, dist,
           MIN(dist) OVER (PARTITION BY vec_id, m) AS mind
    FROM d1
  ) WHERE dist = mind GROUP BY vec_id, m
),
m1 AS (
  SELECT a1.m, a1.code, idx,
         CAST(SUM(CAST(val AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)
           AS mean_val
  FROM a1 JOIN sub USING (vec_id, m),
       LATERAL (SELECT unnest(sub.sv) AS val,
                       unnest(range(1, {_PQ_SUB} + 1)) AS idx)
  GROUP BY a1.m, a1.code, idx
),
c1 AS (
  SELECT m, code,
         list(mean_val ORDER BY idx) AS cv,
         array_to_string(
           list(CAST(floor(mean_val * {_PQT_CSCALE} + 0.5) AS BIGINT)
                ORDER BY idx), ',') AS centroid_csv
  FROM m1 GROUP BY m, code
),
d2 AS (
  SELECT s.vec_id, s.m, c.code,
         round(list_aggregate(
           list_transform(range(1, {_PQ_SUB} + 1),
             i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i])),
           'sum'), 9) AS dist
  FROM sub s JOIN c1 c ON c.m = s.m
),
a2 AS (
  SELECT vec_id, m, MIN(code) AS code, ANY_VALUE(mind) AS dist FROM (
    SELECT vec_id, m, code, dist,
           MIN(dist) OVER (PARTITION BY vec_id, m) AS mind
    FROM d2
  ) WHERE dist = mind GROUP BY vec_id, m
)
SELECT a2.m, a2.code,
       COUNT(*) AS n_assigned,
       {_o_dsum("a2.dist", "distortion")},
       ANY_VALUE(c1.centroid_csv) AS centroid_csv
FROM a2 JOIN c1 ON c1.m = a2.m AND c1.code = a2.code
GROUP BY a2.m, a2.code
"""


def _pqt_assign(sub: DataFrame, cents: DataFrame, lam) -> DataFrame:
    """Nearest-code assignment per (vector, subspace): the per-m codebook
    folds to a 4-row (m, array) frame broadcast onto the subvector
    stream; argmin is an array_min over (dist, code) structs inside the
    task. ``lam`` supplies the transform lambda with a per-call-site
    argument name (the r8 sibling-collision discipline)."""
    cent_arr = cents.groupBy("m").agg(
        F.collect_list(F.struct("code", "cv")).alias("cs")
    )
    best = F.array_min(F.transform(F.col("cs"), lam))
    return sub.join(F.broadcast(cent_arr), "m").select(
        "vec_id",
        "m",
        "sv",
        best["code"].alias("code"),
        best["dist"].alias("dist"),
    )


@query("ext_pq_train", oracle=_PQT_ORACLE, tier=3)
def ext_pq_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codebook TRAINING — the per-subspace Lloyd step that turns the
    seed codebook (data points vec_id 1..16, what ext_pq_encode ships)
    into a trained one: assign every 16-dim subvector to its nearest
    seed code, recompute each code's centroid as the exact decimal mean,
    re-assign, and emit the trained codebook — (m, code, n_assigned,
    distortion, centroid_csv). Completes the PQ family into the full
    production loop: TRAIN (this) -> encode (ext_pq_encode) -> ADC
    search (ext_ann_pq_search) -> composed serving (ext_ann_ivfpq); the
    encoder's docstring promise that 'a trained codebook swaps in as
    the same 1-row broadcast' is now a graded artifact, and Lloyd
    monotonicity (trained distortion <= seed distortion per subspace)
    is pinned in tests/test_round9.py.

    Determinism (the ext_kmeans_lite treatment, per subspace): squared
    distances 9dp-rounded on both sides before each argmin, ties to the
    lowest code, centroid means as exact decimal(28,12) sums / counts,
    distortion via the floor-quantized dsum. Centroids serialize as
    floor(x*1e9 + 0.5) integer CSV — double-to-string does not render
    identically across engines, integer text does.

    Shape per iteration (the classic distributed-ML loop, x4 subspaces
    in ONE pass): subvectors derive map-side from the scan (the explode
    emits 4 rows per vector, each 1/4 vector width — same bytes); the
    codebook is a 4-row broadcast; assignment is in-task argmin; the
    centroid update is one (m, code, dim) partial-sum aggregate of
    4 x 16 x 16 = 1024 cells. At 100 TB training runs on a sample (as
    production PQ does) and the update aggregate is unchanged."""
    from ..session import widen_scan

    e = widen_scan(load(spark, sf_dir, "embeddings"))
    v = e.select("vec_id", _as_double("embedding").alias("ve"))
    sub = v.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice("ve", m * _PQ_SUB + 1, _PQ_SUB).alias("sv"),
                    )
                    for m in range(_PQ_M)
                ]
            )
        ).alias("s"),
    ).select("vec_id", "s.m", "s.sv")
    seeds = sub.filter(F.col("vec_id").between(1, _PQ_K)).select(
        "m", F.col("vec_id").alias("code"), F.col("sv").alias("cv")
    )

    def _dist_struct(entry):
        return F.struct(
            F.round(_sq_dist(F.col("sv"), entry["cv"]), 9).alias("dist"),
            entry["code"].alias("code"),
        )

    # the collision discipline lives in the DISTINCT lambda argument
    # names (ka1/ka2), nothing else
    a1 = _pqt_assign(sub, seeds, lambda ka1: _dist_struct(ka1))
    means = (
        a1.select("m", "code", F.posexplode("sv").alias("idx", "val"))
        .groupBy("m", "code", "idx")
        .agg(
            (
                F.sum(F.col("val").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_val")
        )
        .groupBy("m", "code")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "mean_val"))),
                lambda s0: s0["mean_val"],
            ).alias("cv"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "mean_val"))),
                    lambda s1: F.floor(
                        s1["mean_val"] * _PQT_CSCALE + F.lit(0.5)
                    ).cast("bigint").cast("string"),
                ),
                ",",
            ).alias("centroid_csv"),
        )
    )
    from ..session import scoped_persist

    means = scoped_persist(means)  # feeds assignment arrays AND the csv join
    a2 = _pqt_assign(
        sub, means.select("m", "code", "cv"), lambda ka2: _dist_struct(ka2)
    )
    return (
        a2.groupBy("m", "code")
        .agg(
            F.count(F.lit(1)).alias("n_assigned"),
            _dsum("dist", "distortion"),
        )
        .join(means.select("m", "code", "centroid_csv"), ["m", "code"])
        .select("m", "code", "n_assigned", "distortion", "centroid_csv")
    )


# --- ext_pq_encode_residual -----------------------------------------------------

from ..functions.determinism import davg as _davg  # noqa: E402
from ..functions.determinism import o_davg as _o_davg  # noqa: E402

#: Centroid quantization scale: per-dimension cell means go through the
#: order-insensitive davg/o_davg pair at scale 9 (per-row floor-quantize,
#: exact DECIMAL(38,0) sum, one double division) so both engines compute
#: the bit-identical centroid before any residual subtraction.
_PQR_CSCALE = 9

# Full algorithm mirror: IVF assignment (the _IVFPQ_ORACLE CTEs), one
# centroid step (per-cell per-dim order-insensitive mean), residuals
# ve - centroid, then the _PQ_ORACLE encode over residual space with the
# codebook seeded from the residuals of vectors 1.._PQ_K.
_PQR_ORACLE = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
  FROM embeddings
),
piv AS (
  SELECT vec_id AS pivot_id, ve AS pv FROM v
  WHERE vec_id BETWEEN 1 AND {_N_PIVOTS}
),
pc AS (
  SELECT v.vec_id, p.pivot_id,
         {_COS_SQL.format(a="v.ve", b="p.pv")} AS pcos
  FROM v CROSS JOIN piv p
),
assign AS (
  SELECT vec_id, min(pivot_id) AS cell_id FROM (
    SELECT vec_id, pivot_id, pcos,
           max(pcos) OVER (PARTITION BY vec_id) AS mx
    FROM pc
  ) WHERE pcos = mx GROUP BY vec_id
),
dims AS (
  SELECT a.cell_id, u.i AS dim, v.ve[u.i] AS x
  FROM v JOIN assign a USING (vec_id),
       unnest(range(1, {_PQ_M * _PQ_SUB} + 1)) AS u(i)
),
cent AS (
  SELECT cell_id, dim, {_o_davg("x", "c", scale=_PQR_CSCALE)}
  FROM dims GROUP BY cell_id, dim
),
centl AS (
  SELECT cell_id, list(c ORDER BY dim) AS cl FROM cent GROUP BY cell_id
),
res AS (
  SELECT v.vec_id, a.cell_id,
         list_transform(range(1, {_PQ_M * _PQ_SUB} + 1),
                        i -> v.ve[i] - cl[i]) AS rv
  FROM v
  JOIN assign a USING (vec_id)
  JOIN centl ON a.cell_id = centl.cell_id
),
cb AS (
  SELECT vec_id AS code, rv AS cv FROM res
  WHERE vec_id BETWEEN 1 AND {_PQ_K}
),
d AS (
  SELECT r.vec_id, m, cb.code,
         round(list_aggregate(
           list_transform(range(1, {_PQ_SUB} + 1),
             i -> (r.rv[m * {_PQ_SUB} + i] - cb.cv[m * {_PQ_SUB} + i])
                  * (r.rv[m * {_PQ_SUB} + i] - cb.cv[m * {_PQ_SUB} + i])),
           'sum'), 9) AS dist
  FROM res r CROSS JOIN cb CROSS JOIN unnest(range(0, {_PQ_M})) AS u(m)
),
best AS (
  SELECT vec_id, m, MIN(code) AS code, MIN(dist) AS dist FROM (
    SELECT vec_id, m, code, dist,
           MIN(dist) OVER (PARTITION BY vec_id, m) AS mind
    FROM d
  ) WHERE dist = mind GROUP BY vec_id, m
),
pivoted AS (
  SELECT vec_id,
         MAX(CASE WHEN m = 0 THEN code END) AS code_0,
         MAX(CASE WHEN m = 1 THEN code END) AS code_1,
         MAX(CASE WHEN m = 2 THEN code END) AS code_2,
         MAX(CASE WHEN m = 3 THEN code END) AS code_3,
         MAX(CASE WHEN m = 0 THEN dist END) AS e0,
         MAX(CASE WHEN m = 1 THEN dist END) AS e1,
         MAX(CASE WHEN m = 2 THEN dist END) AS e2,
         MAX(CASE WHEN m = 3 THEN dist END) AS e3
  FROM best GROUP BY vec_id
)
SELECT p.vec_id, a.cell_id, p.code_0, p.code_1, p.code_2, p.code_3,
       p.e0 + p.e1 + p.e2 + p.e3 AS recon_err
FROM pivoted p JOIN assign a USING (vec_id)
"""


def _pqr_frames(spark: SparkSession, sf_dir: str):
    """Shared residual-space machinery (ext_pq_encode_residual and
    ext_ann_ivfpq_residual): raw vectors, pivot rows, per-cell mean
    centroid lists, and the residual frame. The corpus frame with cell
    assignments is scoped-persisted — it feeds both the centroid
    aggregate and the residual projection."""
    from ..session import scoped_persist, widen_scan

    e = widen_scan(load(spark, sf_dir, "embeddings"))
    v = e.select("vec_id", _as_double("embedding").alias("v"))
    pivots = v.filter(F.col("vec_id").between(1, _N_PIVOTS)).select(
        F.col("vec_id").alias("pivot_id"), F.col("v").alias("pv")
    )
    pivot_arr = pivots.agg(
        F.collect_list(F.struct("pivot_id", "pv")).alias("ps")
    )
    best_cell = F.array_max(
        F.transform(
            F.col("ps"),
            lambda pq_r: F.struct(
                _cos(F.col("v"), pq_r["pv"]).alias("pcos"),
                (-pq_r["pivot_id"]).alias("neg_pid"),
            ),
        )
    )
    assigned = scoped_persist(
        v.crossJoin(F.broadcast(pivot_arr))
        .withColumn("cell_id", (-best_cell["neg_pid"]).cast("long"))
        .select("vec_id", "cell_id", "v")
    )
    cent = (
        assigned.select("cell_id", F.posexplode("v").alias("dim", "x"))
        .groupBy("cell_id", "dim")
        .agg(_davg("x", "c", scale=_PQR_CSCALE))
    )
    centl = cent.groupBy("cell_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))),
            lambda cd: cd["c"],
        ).alias("cl")
    )
    res = assigned.join(F.broadcast(centl), "cell_id").select(
        "vec_id",
        "cell_id",
        F.zip_with(
            F.col("v"), F.col("cl"), lambda rva, rvb: rva - rvb
        ).alias("v"),
    )
    return v, pivots, centl, res


def _pqr_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the residual-PQ INDEX once per embeddings fixture
    (VERDICT r12: ext_ann_ivfpq_residual was rebuilding _pqr_frames +
    codebook inline per query while ext_pq_encode_residual already runs
    the identical build — the slowest key in the catalog for no plan
    reason). The build stages three parquet frames under a
    content-addressed scratch dir keyed on the embeddings table's
    (mtime, size):

      encoded/  (vec_id, cell_id, code_0..3, recon_err) — the full
                ext_pq_encode_residual output,
      centl/    (cell_id, cl) — per-cell mean centroid lists,
      cbr/      (code, cv)    — the shared residual codebook rows.

    This is the FAISS deployment model made explicit: train+add runs
    once, serving reads the index. Both residual keys read back the
    same staged bytes, so their values are bit-identical to the inline
    build by construction (same plan produced them), concurrency-safe
    via content_addressed_stage's atomic rename, and an edited or
    regenerated fixture restages automatically. At 100 TB the staged
    `encoded` frame is exactly the bucketed-by-cell_id index layout the
    serving docstring prescribes."""
    from ..sources.connectors import content_addressed_stage

    def _stage(tmp: str) -> None:
        v, pivots, centl, res = _pqr_frames(spark, sf_dir)
        rcb = (
            res.filter(F.col("vec_id").between(1, _PQ_K))
            .select(F.col("vec_id").alias("code"), F.col("v").alias("cv"))
            .agg(F.collect_list(F.struct("code", "cv")).alias("cbs"))
        )
        encoded = _pq_attach_codes(
            res.crossJoin(F.broadcast(rcb)), ["vec_id", "cell_id"]
        )
        encoded.write.mode("overwrite").parquet(os.path.join(tmp, "encoded"))
        centl.write.mode("overwrite").parquet(os.path.join(tmp, "centl"))
        res.filter(F.col("vec_id").between(1, _PQ_K)).select(
            F.col("vec_id").alias("code"), F.col("v").alias("cv")
        ).write.mode("overwrite").parquet(os.path.join(tmp, "cbr"))

    return content_addressed_stage(
        sf_dir, "pqr_index", _stage, table="embeddings"
    )


@query("ext_pq_encode_residual", oracle=_PQR_ORACLE, tier=3)
def ext_pq_encode_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESIDUAL product quantization (VERDICT r9 gap #4 — the FAISS
    IVFPQ form): each vector is assigned to its IVF cell, the cell's
    CENTROID (per-dimension mean — one Lloyd-style centroid step, as in
    FAISS's coarse quantizer training) is computed, and PQ codes
    quantize the residual v - centroid(cell) rather than the raw
    vector. Because the centroids are means, the residual field carries
    strictly less variance than the raw vectors (Var(r) = Var(v) -
    Var(c)), so the same 4x16 code budget spends its resolution where
    the data actually is — the property that makes composed IVFPQ
    accurate in production. The pin in tests/test_ann.py asserts mean
    residual recon_err < mean raw-PQ recon_err on this fixture; an
    earlier pivot-vector-as-centroid variant measured 1.42x WORSE
    (|v - pivot|^2 = 2 - 2cos > 1 for unit vectors), which is exactly
    why FAISS subtracts trained means, not member vectors.

    Output: (vec_id, cell_id, code_0..3, recon_err); decode adds the
    centroid back, so the residual-space error IS the full
    reconstruction error of centroid + decoded code.

    Determinism: centroids go through the order-insensitive davg/o_davg
    pair at scale 9 (per-row floor-quantize, exact integer sum, one
    double division — bit-identical on both engines), the residual is
    one IEEE subtraction, and the encoder inherits ext_pq_encode's
    9dp-rounded argmin discipline; codebook = residuals of vectors
    1..16 (shared across cells, FAISS's default PQ-by-residual layout).

    Shape: assignment is the fused map-side pivot argmax
    (ext_ann_ivfpq's pass) over the persisted corpus frame; the
    centroid step is ONE (cell, dim)-key aggregate of 16x64 cells —
    map-side combinable, O(cells x dim) result rows; centroids and the
    residual codebook re-enter as broadcasts (16-row join + 1-row
    fold); encode is map-side argmin inside the scan task. The corpus
    is touched twice (centroid pass + encode pass) and shuffled never —
    at 100 TB both passes are scan-local, exactly how a FAISS
    train+add pipeline streams. The build materializes ONCE to the
    content-addressed scratch index (_pqr_index_dir) shared with
    ext_ann_ivfpq_residual — train+add runs once, every consumer reads
    the staged bytes."""
    idx = _pqr_index_dir(spark, sf_dir)
    return spark.read.parquet(os.path.join(idx, "encoded")).select(
        "vec_id",
        "cell_id",
        "code_0",
        "code_1",
        "code_2",
        "code_3",
        "recon_err",
    )


# --- ext_ann_ivfpq_residual -----------------------------------------------------

# Full algorithm mirror: the _PQR_ORACLE residual-encode chain (assign ->
# mean centroids -> residuals -> shared residual codebook -> codes), the
# _IVFPQ_ORACLE probe, PER-CELL query distance tables over the query's
# per-cell residual qv - centroid(cell), candidate scoring by 4 lookups in
# the candidate's OWN cell table, top-10, exact-cosine refine.
_IVFPQR_ORACLE = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
  FROM embeddings
),
piv AS (
  SELECT vec_id AS pivot_id, ve AS pv FROM v
  WHERE vec_id BETWEEN 1 AND {_N_PIVOTS}
),
pc AS (
  SELECT v.vec_id, p.pivot_id,
         {_COS_SQL.format(a="v.ve", b="p.pv")} AS pcos
  FROM v CROSS JOIN piv p
),
assign AS (
  SELECT vec_id, min(pivot_id) AS cell_id FROM (
    SELECT vec_id, pivot_id, pcos,
           max(pcos) OVER (PARTITION BY vec_id) AS mx
    FROM pc
  ) WHERE pcos = mx GROUP BY vec_id
),
dims AS (
  SELECT a.cell_id, u.i AS dim, v.ve[u.i] AS x
  FROM v JOIN assign a USING (vec_id),
       unnest(range(1, {_PQ_M * _PQ_SUB} + 1)) AS u(i)
),
cent AS (
  SELECT cell_id, dim, {_o_davg("x", "c", scale=_PQR_CSCALE)}
  FROM dims GROUP BY cell_id, dim
),
centl AS (
  SELECT cell_id, list(c ORDER BY dim) AS cl FROM cent GROUP BY cell_id
),
res AS (
  SELECT v.vec_id, a.cell_id,
         list_transform(range(1, {_PQ_M * _PQ_SUB} + 1),
                        i -> v.ve[i] - cl[i]) AS rv
  FROM v
  JOIN assign a USING (vec_id)
  JOIN centl ON a.cell_id = centl.cell_id
),
cb AS (
  SELECT vec_id AS code, rv AS cv FROM res
  WHERE vec_id BETWEEN 1 AND {_PQ_K}
),
d AS (
  SELECT r.vec_id, m, cb.code,
         round(list_aggregate(
           list_transform(range(1, {_PQ_SUB} + 1),
             i -> (r.rv[m * {_PQ_SUB} + i] - cb.cv[m * {_PQ_SUB} + i])
                  * (r.rv[m * {_PQ_SUB} + i] - cb.cv[m * {_PQ_SUB} + i])),
           'sum'), 9) AS dist
  FROM res r CROSS JOIN cb CROSS JOIN unnest(range(0, {_PQ_M})) AS u(m)
),
best AS (
  SELECT vec_id, m, MIN(code) AS code FROM (
    SELECT vec_id, m, code, dist,
           MIN(dist) OVER (PARTITION BY vec_id, m) AS mind
    FROM d
  ) WHERE dist = mind GROUP BY vec_id, m
),
codes AS (
  SELECT vec_id,
         MAX(CASE WHEN m = 0 THEN code END) AS code_0,
         MAX(CASE WHEN m = 1 THEN code END) AS code_1,
         MAX(CASE WHEN m = 2 THEN code END) AS code_2,
         MAX(CASE WHEN m = 3 THEN code END) AS code_3
  FROM best GROUP BY vec_id
),
q AS (SELECT ve AS qv FROM v WHERE vec_id = 0),
probe AS (
  SELECT p.pivot_id AS cell_id
  FROM piv p CROSS JOIN q
  ORDER BY {_COS_SQL.format(a="p.pv", b="qv")} DESC, p.pivot_id ASC
  LIMIT {_N_PROBE}
),
qres AS (
  SELECT pr.cell_id,
         list_transform(range(1, {_PQ_M * _PQ_SUB} + 1),
                        i -> q.qv[i] - centl.cl[i]) AS qrv
  FROM probe pr
  JOIN centl ON pr.cell_id = centl.cell_id
  CROSS JOIN q
),
dt AS (
  SELECT qr.cell_id, m, cb.code,
         round(list_aggregate(
           list_transform(range(1, {_PQ_SUB} + 1),
             i -> (qr.qrv[m * {_PQ_SUB} + i] - cb.cv[m * {_PQ_SUB} + i])
                  * (qr.qrv[m * {_PQ_SUB} + i] - cb.cv[m * {_PQ_SUB} + i])),
           'sum'), 9) AS dist
  FROM qres qr CROSS JOIN cb CROSS JOIN unnest(range(0, {_PQ_M})) AS u(m)
),
cand AS (
  SELECT c.vec_id, c.code_0, c.code_1, c.code_2, c.code_3, a.cell_id
  FROM codes c
  JOIN assign a USING (vec_id)
  JOIN probe pr ON a.cell_id = pr.cell_id
  WHERE c.vec_id <> 0
),
scored AS (
  SELECT c.vec_id, c.cell_id,
         t0.dist + t1.dist + t2.dist + t3.dist AS approx_dist
  FROM cand c
  JOIN dt t0 ON t0.cell_id = c.cell_id AND t0.m = 0 AND t0.code = c.code_0
  JOIN dt t1 ON t1.cell_id = c.cell_id AND t1.m = 1 AND t1.code = c.code_1
  JOIN dt t2 ON t2.cell_id = c.cell_id AND t2.m = 2 AND t2.code = c.code_2
  JOIN dt t3 ON t3.cell_id = c.cell_id AND t3.m = 3 AND t3.code = c.code_3
),
topk AS (
  SELECT vec_id, cell_id, approx_dist FROM scored
  ORDER BY approx_dist ASC, vec_id ASC LIMIT {_IVFPQ_TOP_K}
)
SELECT t.vec_id, t.cell_id, t.approx_dist,
       list_dot_product(v.ve, q.qv)
       / (sqrt(list_dot_product(v.ve, v.ve)) * sqrt(list_dot_product(q.qv, q.qv)))
         AS cos_sim
FROM topk t
JOIN v ON v.vec_id = t.vec_id
CROSS JOIN q
"""


@query("ext_ann_ivfpq_residual", oracle=_IVFPQR_ORACLE, tier=3)
def ext_ann_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ serving over RESIDUAL codes — the complete FAISS IVFPQ
    query path (upgrading ext_ann_ivfpq per VERDICT r9 gap #4's 'encode
    residuals' mandate): the index stores each vector's cell and its
    residual-space PQ codes (ext_pq_encode_residual's build), and the
    query computes a SEPARATE asymmetric-distance table per probed cell
    — qres_c = qv - centroid(c) against the shared residual codebook —
    because a candidate's codes quantize ITS cell's residual, so they
    must be scored against the query's residual in THAT cell. This
    per-cell table is the detail that distinguishes real IVFPQ serving
    from flat PQ scan with cell pruning (ext_ann_ivfpq), and it is why
    FAISS precomputes nprobe tables per query.

    Determinism: inherits every discipline of the composed family —
    unrounded bit-identical cosine for assign/probe, scale-9 davg
    centroids, 9dp-rounded subspace distances, fixed-order 4-term ADC
    sum, ties to lowest id everywhere.

    Shape: index build is _pqr_frames' two scan-local passes (zero
    corpus shuffles) + the map-side code argmin; the query side is all
    O(1)-row work — probe = 16-row sort, per-cell tables = nprobe x k x
    M = 512 subspace distances folded into an nprobe-row frame of 4
    maps, broadcast-joined to candidates on cell_id so scoring stays
    map-side element_at; top-10 is TakeOrderedAndProject; only the 10
    winners fetch vectors for the exact-cosine refine. At 100 TB:
    corpus bucketed by cell_id once at build, per-query I/O = nprobe
    cells' codes, per-query compute = 512 subspace distances + 4
    lookups per candidate — the FAISS cost model, distributed. The
    index build (assign -> centroids -> residuals -> codes) is NOT
    rebuilt per query: it reads back from the content-addressed scratch
    index staged once by _pqr_index_dir (shared with
    ext_pq_encode_residual — the write-then-readback discipline of
    join_skew_aqe/join_runtime_bloom), so the serving plan is pure
    query-side work over the staged codes/centroids/codebook."""
    idx = _pqr_index_dir(spark, sf_dir)
    codes = spark.read.parquet(os.path.join(idx, "encoded")).select(
        "vec_id", "cell_id", "code_0", "code_1", "code_2", "code_3"
    )
    centl = spark.read.parquet(os.path.join(idx, "centl"))
    cbr = spark.read.parquet(os.path.join(idx, "cbr"))

    from ..session import widen_scan

    e = widen_scan(load(spark, sf_dir, "embeddings"))
    v = e.select("vec_id", _as_double("embedding").alias("v"))
    pivots = v.filter(F.col("vec_id").between(1, _N_PIVOTS)).select(
        F.col("vec_id").alias("pivot_id"), F.col("v").alias("pv")
    )
    q = v.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    probe_cells = (
        pivots.crossJoin(F.broadcast(q))
        .select("pivot_id", _cos(F.col("pv"), F.col("qv")).alias("qcos"))
        .orderBy(F.col("qcos").desc(), F.col("pivot_id").asc())
        .limit(_N_PROBE)
        .select(F.col("pivot_id").alias("cell_id"))
    )
    qres = (
        probe_cells.join(F.broadcast(centl), "cell_id")
        .crossJoin(F.broadcast(q))
        .select(
            "cell_id",
            F.zip_with(
                F.col("qv"), F.col("cl"), lambda qra, qrb: qra - qrb
            ).alias("qv"),
        )
    )
    qdist = qres.crossJoin(F.broadcast(cbr)).select(
        "cell_id",
        "code",
        _pq_sqd_cols(F.col("qv"), F.col("cv"), 0).alias("d0"),
        _pq_sqd_cols(F.col("qv"), F.col("cv"), 1).alias("d1"),
        _pq_sqd_cols(F.col("qv"), F.col("cv"), 2).alias("d2"),
        _pq_sqd_cols(F.col("qv"), F.col("cv"), 3).alias("d3"),
    )
    dtc = qdist.groupBy("cell_id").agg(
        *[
            F.map_from_entries(
                F.collect_list(F.struct("code", f"d{m}"))
            ).alias(f"dt{m}")
            for m in range(_PQ_M)
        ]
    )
    cand = codes.join(F.broadcast(probe_cells), "cell_id").filter(
        F.col("vec_id") != 0
    )
    topk = (
        cand.join(F.broadcast(dtc), "cell_id")
        .select("vec_id", "cell_id", _pq_adc_score().alias("approx_dist"))
        .orderBy(F.col("approx_dist").asc(), F.col("vec_id").asc())
        .limit(_IVFPQ_TOP_K)
    )
    return (
        topk.join(v, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "cell_id",
            "approx_dist",
            _cos(F.col("v"), F.col("qv")).alias("cos_sim"),
        )
    )


# --- ext_mmr_diversify ------------------------------------------------------

#: MMR trade-off: score = LAMBDA * relevance - (1-LAMBDA) * max-sim-to-
#: selected (Carbonell & Goldstein 1998). Shared literal text.
_MMR_LAMBDA = "CAST(0.7 AS DOUBLE)"
_MMR_PENALTY = "CAST(0.3 AS DOUBLE)"
_MMR_POOL = 10
_MMR_SELECT = 5

#: Quantized MMR score for the declared surface / tie-safe ordering.
_MMR_QS = "floor(({s}) * 1e9 + CAST(0.5 AS DOUBLE)) / 1e9"


def _mmr_oracle() -> str:
    head = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
  FROM embeddings
),
q AS (SELECT ve AS qv FROM v WHERE vec_id = 0),
cand AS MATERIALIZED (
  SELECT vec_id AS id, ve,
         {_COS_SQL.format(a="ve", b="qv")} AS rel
  FROM v, q WHERE vec_id <> 0
  ORDER BY rel DESC, vec_id ASC
  LIMIT {_MMR_POOL}
),
sims AS MATERIALIZED (
  SELECT a.id AS a, b.id AS b,
         {_COS_SQL.format(a="a.ve", b="b.ve")} AS sim
  FROM cand a JOIN cand b ON a.id <> b.id
),
sel1 AS MATERIALIZED (
  SELECT id, rel, 1 AS rank,
         {_MMR_QS.format(s=f"{_MMR_LAMBDA} * rel")} AS mmr_score
  FROM cand ORDER BY mmr_score DESC, id ASC LIMIT 1
)"""
    parts = [head]
    for r in range(2, _MMR_SELECT + 1):
        score = (
            f"{_MMR_LAMBDA} * c.rel - {_MMR_PENALTY} * p.mx"
        )
        parts.append(
            f""",
pen{r} AS MATERIALIZED (
  SELECT s.a AS id, MAX(s.sim) AS mx
  FROM sims s JOIN sel{r - 1} t ON s.b = t.id
  GROUP BY s.a
),
pick{r} AS MATERIALIZED (
  SELECT c.id, c.rel, {r} AS rank,
         {_MMR_QS.format(s=score)} AS mmr_score
  FROM cand c
  JOIN pen{r} p ON c.id = p.id
  WHERE c.id NOT IN (SELECT id FROM sel{r - 1})
  ORDER BY mmr_score DESC, c.id ASC LIMIT 1
),
sel{r} AS MATERIALIZED (
  SELECT * FROM sel{r - 1} UNION ALL SELECT * FROM pick{r}
)"""
        )
    parts.append(
        f"\nSELECT rank, id AS vec_id, rel, mmr_score FROM sel{_MMR_SELECT}\n"
    )
    return "".join(parts)


_MMR_ORACLE = _mmr_oracle()


@query("ext_mmr_diversify", oracle=_MMR_ORACLE, tier=3)
def ext_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell-Goldstein) of the
    exact-cosine top-10 for the vec_id=0 query: greedily select 5 results
    maximizing lambda*relevance - (1-lambda)*max-similarity-to-already-
    selected — the diversification pass a RAG/search stack runs between
    retrieval (ext_knn_cosine / ext_rank_fusion) and the context window,
    so near-duplicate hits don't crowd out coverage.

    Scale split: the DATA-sized work is the candidate retrieval (broadcast
    query vector, map-side cosine, TakeOrderedAndProject top-10 — the
    ext_knn_cosine plan verbatim); the pool and its 90 pairwise sims then
    fold into ONE row of arrays and ALL greedy rounds run inside a single
    aggregate() lambda — the accumulator iterates at RUNTIME, so the
    expression tree is constant-size and the whole selection costs zero
    per-round jobs (the DataFrame-join form paid ~15 tiny-job latencies:
    4.32 s vs 1.40 s min-of-4 at sf0.1; a per-round projection chain is
    WORSE still — Catalyst collapses it and the selection subtree
    duplicates exponentially, observed live). MMR is inherently
    sequential in its selection order — the fold expresses that honestly
    instead of pretending a window can. Determinism: cosines are the
    bit-identical sequential fold both engines share, scores quantize at
    1e9 with ties to the lowest vec_id (argmax over (q, -id) structs);
    the oracle replays all 5 rounds as MATERIALIZED CTEs. Greedy-replay
    + diversity-property pins in tests/test_round10b.py."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("ve"),
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("ve").alias("qv"))
    cand = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != 0)
        .select(
            F.col("vec_id").alias("id"),
            "ve",
            _cos(F.col("ve"), F.col("qv")).alias("rel"),
        )
        .orderBy(F.desc("rel"), F.asc("id"))
        .limit(_MMR_POOL)
    )
    # three consumers (both sim sides + the pool fold) — persist, or the
    # DATA-sized retrieval subtree executes three times (code-review r10:
    # the un-persisted plan showed six parquet scans)
    from ..session import scoped_persist

    cand = scoped_persist(cand)
    a = cand.select(F.col("id").alias("a"), F.col("ve").alias("va"))
    b = cand.select(F.col("id").alias("b"), F.col("ve").alias("vb"))
    sims = a.join(F.broadcast(b), F.col("a") != F.col("b")).select(
        "a", "b", _cos(F.col("va"), F.col("vb")).alias("sim")
    )
    # fold the pool and its similarity table into ONE row of arrays, then
    # run ALL greedy rounds inside a single aggregate() fold — the lambda
    # accumulator iterates at RUNTIME, so the expression tree is constant
    # size (a per-round projection chain duplicates the selection subtree
    # at plan time and Catalyst goes exponential — the PCA lineage lesson
    # at expression level; observed live both ways this round). Zero jobs
    # per round: the whole selection is one projection over one row.
    cands_row = cand.agg(
        F.expr(
            "array_sort(collect_list(struct(id AS id, rel AS rel)))"
        ).alias("cands")
    )
    sims_row = sims.agg(
        F.expr(
            "array_sort(collect_list(struct(a AS a, b AS b, sim AS sim)))"
        ).alias("sims")
    )
    qscore = (
        f"floor(({_MMR_LAMBDA} * c.rel - {_MMR_PENALTY} *"
        " coalesce(array_max(transform(filter(sims,"
        " p -> p.a = c.id AND exists(acc, t -> t.id = p.b)),"
        " p -> p.sim)), CAST(0.0 AS DOUBLE)))"
        " * 1e9 + CAST(0.5 AS DOUBLE))"
    )
    pick = (
        "array_max(transform("
        "filter(cands, c -> NOT exists(acc, t -> t.id = c.id)),"
        f" c -> struct({qscore} AS q, -c.id AS nid, c.rel AS rel)))"
    )
    # pick is inlined three times inside the lambda body — a fixed-size
    # tree evaluated per round at runtime (a scalar subquery could share
    # it, but lambda variables cannot cross subquery boundaries)
    fold = (
        f"aggregate(sequence(1, {_MMR_SELECT}),"
        " CAST(array() AS ARRAY<STRUCT<rank: INT, id: BIGINT,"
        " rel: DOUBLE, mmr_score: DOUBLE>>),"
        f" (acc, r) -> concat(acc, array(struct(r AS rank,"
        f" -({pick}).nid AS id, ({pick}).rel AS rel,"
        f" CAST(({pick}).q AS DOUBLE) / 1e9 AS mmr_score))))"
    )
    state = cands_row.crossJoin(F.broadcast(sims_row)).select(
        F.expr(fold).alias("sel")
    )
    return state.select(F.expr("inline(sel)")).select(
        "rank", F.col("id").alias("vec_id"), "rel", "mmr_score"
    )


# --- ext_ann_rptree -----------------------------------------------------------

#: Random-projection tree depth: 4 median splits -> 16 leaves. Weights
#: are small INTEGER-valued constants from a closed-form hash — exact in
#: both engines, no RNG state to synchronize.
_RPT_LEVELS = 4
_RPT_TOPK = 10


def _rpt_weights_sql(level: int, transform_fn: str, series_fn: str) -> str:
    """The level's projection direction as engine SQL: component j is
    ((j*37 + level*101) % 19) - 9 — integer-valued in [-9, 9], zero-mean
    across the index line, different per level."""
    return (
        f"{transform_fn}({series_fn}, j ->"
        f" CAST((j * 37 + {level} * 101) % 19 AS DOUBLE)"
        " - CAST(9 AS DOUBLE))"
    )


def _rpt_oracle() -> str:
    qcols = ", ".join(
        "CAST(floor(list_dot_product(ve, "
        + _rpt_weights_sql(lv, "list_transform", "generate_series(0, 63)")
        + f") * 1e9 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q{lv}"
        for lv in range(_RPT_LEVELS)
    )
    parts = [
        f"""
WITH base AS MATERIALIZED (
  SELECT vec_id, ve, {qcols} FROM (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
    FROM embeddings
  ) inner_
),
n0 AS (SELECT *, CAST(0 AS BIGINT) AS node FROM base)"""
    ]
    for lv in range(_RPT_LEVELS):
        parts.append(
            f""",
m{lv} AS MATERIALIZED (
  SELECT node, quantile_cont(q{lv}, 0.5) AS med
  FROM n{lv} GROUP BY node
),
n{lv + 1} AS MATERIALIZED (
  SELECT b.vec_id, b.ve, b.q0, b.q1, b.q2, b.q3,
         b.node * 2 + CASE WHEN b.q{lv} > m.med THEN 1 ELSE 0 END AS node
  FROM n{lv} b JOIN m{lv} m ON b.node = m.node
)"""
        )
    L = _RPT_LEVELS
    parts.append(
        f""",
anchor AS (SELECT node AS aleaf, ve AS av FROM n{L} WHERE vec_id = 0),
scored AS (
  SELECT c.vec_id AS cand_id, c.node AS leaf,
         list_dot_product(c.ve, a.av)
         / (sqrt(list_dot_product(c.ve, c.ve))
            * sqrt(list_dot_product(a.av, a.av))) AS cos_sim
  FROM n{L} c, anchor a
  WHERE c.node = a.aleaf AND c.vec_id <> 0
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, cand_id ASC)
            AS BIGINT) AS rnk,
       cand_id, leaf, cos_sim
FROM scored
ORDER BY cos_sim DESC, cand_id ASC
LIMIT {_RPT_TOPK}
"""
    )
    return "".join(parts)


_RPTREE_ORACLE = _rpt_oracle()


@query("ext_ann_rptree", oracle=_RPTREE_ORACLE, tier=3)
def ext_ann_rptree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection-tree ANN (the annoy/FLANN family — the fourth
    index family next to IVF cells, LSH sign buckets, and PQ codes):
    4 levels of median splits on deterministic integer-valued projection
    directions partition the corpus into 16 balanced leaves, and a query
    descends to its leaf and ranks only those candidates. Unlike LSH's
    data-independent hyperplanes through the origin, each split adapts
    to the DATA (the node's own median), so leaves stay balanced even on
    skewed corpora — the property that makes RP-trees the
    bounded-candidate-list index.

    Shape: ALL four projections compute in one map-side pass over one
    corpus scan (persisted — each level's median aggregate and split
    join re-reference it); per level, the median frame is O(2^level)
    rows and broadcasts back, so the only data-sized exchanges are the
    4 median aggregates, each keyed on the (bounded) node id.
    Projections quantize to exact 1e-9 longs, so both engines
    interpolate node medians over identical integers (the
    ts_anomaly_mad midpoint argument) and every split decision is an
    exact integer-vs-double compare. At 100 TB: deeper trees (leaf size
    stays constant by adding levels — the median frames stay
    model-sized) and multi-tree forests for recall, the standard annoy
    deployment; the numpy construction replay + leaf-balance + recall
    floor are pinned in tests/test_round11.py."""
    from ..session import scoped_persist

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("ve")
    )
    qcols = [
        F.expr(
            "CAST(floor(aggregate(zip_with(ve, "
            + _rpt_weights_sql(lv, "transform", "sequence(0, 63)")
            + ", (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
            " (acc, x) -> acc + x) * 1e9 + CAST(0.5 AS DOUBLE))"
            " AS BIGINT)"
        ).alias(f"q{lv}")
        for lv in range(_RPT_LEVELS)
    ]
    base = scoped_persist(
        e.select("vec_id", "ve", *qcols).withColumn(
            "node", F.lit(0).cast("long")
        )
    )
    cur = base
    for lv in range(_RPT_LEVELS):
        meds = cur.groupBy("node").agg(
            F.percentile(f"q{lv}", F.lit(0.5)).alias("med")
        )
        cur = (
            cur.join(F.broadcast(meds), "node")
            .withColumn(
                "node",
                F.expr(
                    f"node * 2 + CASE WHEN q{lv} > med THEN 1 ELSE 0 END"
                ),
            )
            .drop("med")
        )
        # each level is referenced TWICE (its median aggregate + the
        # split join) — unpersisted, level l re-executes O(2^l) times
        # and the 4-level build measured 15 s on a 500-row corpus;
        # per-level persistence makes it 4 aggregates + 4 joins
        cur = scoped_persist(cur)
    anchor = cur.filter(F.col("vec_id") == 0).select(
        F.col("node").alias("aleaf"), F.col("ve").alias("av")
    )
    scored = (
        cur.join(F.broadcast(anchor), F.col("node") == F.col("aleaf"))
        .filter(F.col("vec_id") != 0)
        .select(
            F.col("vec_id").alias("cand_id"),
            F.col("node").alias("leaf"),
            _cos(F.col("ve"), F.col("av")).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    return (
        scored.orderBy(F.col("cos_sim").desc(), F.col("cand_id").asc())
        .limit(_RPT_TOPK)
        .select(
            F.row_number()
            .over(
                Window.orderBy(
                    F.col("cos_sim").desc(), F.col("cand_id").asc()
                )
            )
            .cast("long")
            .alias("rnk"),
            "cand_id",
            "leaf",
            "cos_sim",
        )
    )


# --- ext_knn_graph ------------------------------------------------------------

#: Per-point neighbor count and the per-tile candidate buffer. The tile
#: prefilter ranks by BLAS matmul doubles while the final ranking uses
#: the exact sequential fold; a buffer of 8 candidates per tile means a
#: true global top-3 member could only be lost if 6+ tile-mates sat
#: within the ~1e-15 matmul-vs-fold discrepancy of each other —
#: impossible on a continuous-similarity corpus (the near-dup epsilon-
#: margin argument, applied to ranks).
_KNNG_K = 3
_KNNG_BUF = 8

_KNNG_ORACLE = f"""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
  FROM embeddings
), scored AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id, b.label AS nbr_label,
         a.label AS a_label,
         list_dot_product(a.ve, b.ve)
         / (sqrt(list_dot_product(a.ve, a.ve))
            * sqrt(list_dot_product(b.ve, b.ve))) AS cos_sim
  FROM v a JOIN v b ON a.vec_id <> b.vec_id
), ranked AS (
  SELECT vec_id, nbr_id, cos_sim,
         CASE WHEN nbr_label = a_label THEN 1 ELSE 0 END AS same_label,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY vec_id ORDER BY cos_sim DESC, nbr_id ASC
         ) AS BIGINT) AS rnk
  FROM scored
)
SELECT vec_id, rnk, nbr_id, cos_sim, same_label
FROM ranked WHERE rnk <= {_KNNG_K}
"""


def _fold_cos_rows(x_mat, y_mat):
    """Exact left-fold cosine for row pairs, vectorized ACROSS rows: one
    loop over dimensions applies the same per-element IEEE operation
    sequence (dot += x*y, nx += x*x, ny += y*y in ascending index order,
    then dot / (sqrt(nx) * sqrt(ny))) to every row at once, so each
    row's result is bit-identical to the scalar per-row Python loop it
    replaces — and to the oracle's left-to-right list_dot_product fold —
    while the interpreter cost drops from O(rows * dims) to O(dims)."""
    import numpy as np

    n = x_mat.shape[0]
    dot = np.zeros(n)
    nx = np.zeros(n)
    ny = np.zeros(n)
    for d in range(x_mat.shape[1]):
        a = x_mat[:, d]
        b = y_mat[:, d]
        dot += a * b
        nx += a * a
        ny += b * b
    return dot / (np.sqrt(nx) * np.sqrt(ny))


def _knng_tile(pdf):
    """One block-pair task of the kNN-graph build: a BLAS tile ranks
    both sides' local candidates, the per-tile top-{_KNNG_BUF} survive
    with their cosine recomputed by the exact left fold (bit-identical
    to the oracle's list_dot_product). The recompute is one vectorized
    fold over the gathered survivor rows (:func:`_fold_cos_rows`) —
    the r13 swap off the per-pair Python loop that dominated this tile
    (guide §4.2: batch work belongs in vectorized native code)."""
    import numpy as np
    import pandas as pd

    cols = {"vec_id": "int64", "nbr_id": "int64", "cos_sim": "float64"}
    sa = pdf[pdf["side"] == 0]
    sb = pdf[pdf["side"] == 1]
    if sa.empty:
        return pd.DataFrame({c: [] for c in cols}).astype(cols)
    ida = sa["vec_id"].to_numpy()
    ma = np.stack(sa["v"].to_numpy())
    man = ma / np.linalg.norm(ma, axis=1, keepdims=True)
    if sb.empty:
        idb, mb, mbn = ida, ma, man
    else:
        idb = sb["vec_id"].to_numpy()
        mb = np.stack(sb["v"].to_numpy())
        mbn = mb / np.linalg.norm(mb, axis=1, keepdims=True)
    sims = man @ mbn.T
    parts = []

    def _emit(side_ids, other_ids, s, mx, my):
        # local top-buffer per row, ties to the smaller id
        ii_parts = []
        jj_parts = []
        for i in range(s.shape[0]):
            row = s[i]
            if side_ids is other_ids:
                row = row.copy()
                row[i] = -2.0  # self
            order = np.lexsort((other_ids, -row))[: _KNNG_BUF]
            keep = order[row[order] > -2.0]
            ii_parts.append(np.full(len(keep), i, dtype=np.int64))
            jj_parts.append(keep)
        ii = np.concatenate(ii_parts)
        jj = np.concatenate(jj_parts)
        parts.append(
            (side_ids[ii], other_ids[jj], _fold_cos_rows(mx[ii], my[jj]))
        )

    _emit(ida, idb, sims, ma, mb)
    if not sb.empty:
        _emit(idb, ida, sims.T, mb, ma)
    return pd.DataFrame(
        {
            "vec_id": np.concatenate([p[0] for p in parts]),
            "nbr_id": np.concatenate([p[1] for p in parts]),
            "cos_sim": np.concatenate([p[2] for p in parts]),
        }
    ).astype(cols)


@query("ext_knn_graph", oracle=_KNNG_ORACLE, tier=3)
def ext_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-nearest-neighbor GRAPH over the whole corpus (every
    point's top-3 cosine neighbors, with a same-label agreement flag) —
    the substrate of graph-based curation: SemDeDup-style cluster
    pruning, confident-learning label-noise screens (a point whose
    neighbors all disagree with its label is suspect), and kNN-graph
    ANN indexes all start from exactly this frame. ext_knn_cosine ranks
    one anchor; this ranks EVERYONE, which is what forces the blocked
    build.

    Shape: the ext_neardup_embedding tile pattern, upgraded from
    threshold-filter to rank-merge — the corpus hashes into 16 blocks,
    each of the 136 block-pair tasks ranks ONE BLAS tile and emits only
    its local top-8 per point (the buffer that makes the matmul-vs-fold
    rank discrepancy unexploitable; module constant comment), and a
    per-point window over the O(n·m·8) candidate stream picks the
    global top-3 — no task ever materializes n² pairs. Survivor cosines
    are recomputed with the exact left fold, so the emitted doubles are
    bit-identical to the oracle's naive self-join. Labels join onto the
    final 3n-row frame (broadcast here, co-keyed at 100 TB — where an
    LSH/IVF candidate filter would also front the tiles; the per-tile
    kernel stays this one)."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "embeddings")
    m = _EMB_N_BLOCKS
    v = e.select(
        "vec_id",
        _as_double("embedding").alias("v"),
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(m)).alias("blk"),
    )
    rows = []
    for i in range(m):
        rows.append((i * m + i, i, 0))
        for j in range(i + 1, m):
            rows.append((i * m + j, i, 0))
            rows.append((i * m + j, j, 1))
    task_df = spark.createDataFrame(rows, "pair_id int, blk int, side int")
    cand = (
        v.join(F.broadcast(task_df), "blk")
        .select("pair_id", "side", "vec_id", "v")
        .groupBy("pair_id")
        .applyInPandas(
            _knng_tile, "vec_id long, nbr_id long, cos_sim double"
        )
    )
    w = W.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("nbr_id").asc()
    )
    topk = cand.withColumn("rnk", F.row_number().over(w).cast("long")).filter(
        F.col("rnk") <= _KNNG_K
    )
    labels = e.select("vec_id", "label")
    la = labels.select(
        F.col("vec_id").alias("a_id"), F.col("label").alias("a_label")
    )
    lb = labels.select(
        F.col("vec_id").alias("b_id"), F.col("label").alias("b_label")
    )
    return (
        topk.join(F.broadcast(la), F.col("vec_id") == F.col("a_id"))
        .join(F.broadcast(lb), F.col("nbr_id") == F.col("b_id"))
        .select(
            "vec_id",
            "rnk",
            "nbr_id",
            "cos_sim",
            F.expr(
                "CASE WHEN b_label = a_label THEN 1 ELSE 0 END"
            ).alias("same_label"),
        )
    )


# --- ext_matryoshka_recall ----------------------------------------------------

#: Truncation prefix length (the Matryoshka "nested" dim) and the top-k
#: depth audited. Cosine runs on the truncated vectors with their OWN
#: norms — truncation changes both dot products and norms, which is
#: exactly the retrieval-quality question the audit answers.
_MRL_DIM = 16
_MRL_K = 10

_MRL_ORACLE = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
  FROM embeddings
),
q AS (SELECT ve AS qv FROM v WHERE vec_id = 0),
full_ AS (
  SELECT vec_id,
         round(list_dot_product(v.ve, q.qv)
           / (sqrt(list_dot_product(v.ve, v.ve))
              * sqrt(list_dot_product(q.qv, q.qv))), 9) AS cos_full
  FROM v, q WHERE vec_id <> 0
),
tr AS (
  SELECT vec_id,
         round(list_dot_product(v.ve[1:{_MRL_DIM}], q.qv[1:{_MRL_DIM}])
           / (sqrt(list_dot_product(v.ve[1:{_MRL_DIM}], v.ve[1:{_MRL_DIM}]))
              * sqrt(list_dot_product(q.qv[1:{_MRL_DIM}],
                                      q.qv[1:{_MRL_DIM}]))), 9) AS cos_tr
  FROM v, q WHERE vec_id <> 0
),
topf AS MATERIALIZED (
  SELECT vec_id, cos_full,
         ROW_NUMBER() OVER (ORDER BY cos_full DESC, vec_id) AS rnk
  FROM full_ QUALIFY rnk <= {_MRL_K}
),
topt AS MATERIALIZED (
  SELECT vec_id, cos_tr,
         ROW_NUMBER() OVER (ORDER BY cos_tr DESC, vec_id) AS rnk
  FROM tr QUALIFY rnk <= {_MRL_K}
)
SELECT t.rnk,
       t.vec_id AS trunc_id, t.cos_tr,
       f.vec_id AS full_id, f.cos_full,
       CASE WHEN EXISTS (SELECT 1 FROM topf x WHERE x.vec_id = t.vec_id)
            THEN 1 ELSE 0 END AS trunc_hit_in_full_topk
FROM topt t JOIN topf f ON t.rnk = f.rnk
"""


@query("ext_matryoshka_recall", oracle=_MRL_ORACLE, tier=3)
def ext_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (MRL) truncation audit: the retrieval-quality check a
    pipeline runs before serving the cheap {_MRL_DIM}-dim PREFIX of its
    {64}-dim embeddings (the nested-representation trick behind
    adaptive-retrieval stacks): exact cosine top-{_MRL_K} for the
    benchmark query under the full dim and under the truncated prefix
    (with its own norms — truncation changes dot AND norm, which is the
    question), aligned rank by rank, with a membership flag that makes
    recall@{_MRL_K} readable off the output (sum of the flag / k).

    Shape: both scoring passes are ONE map-side fold each against the
    broadcast 1-row query vector (the ext_knn_cosine pattern — the
    truncated pass folds only the prefix via slice), both top-k's are
    TakeOrdered folds, and the rank alignment joins two k-row frames.
    At 100 TB this is two linear scans — and the truncated one is the
    one you'd actually serve, at {_MRL_DIM}/64 of the FLOP cost.
    Cosines quantize to 9dp (the kmeans fold-noise stance); ties break
    on vec_id."""
    from ..session import scoped_persist
    from pyspark.sql import Window

    v = scoped_persist(
        load(spark, sf_dir, "embeddings").select(
            "vec_id", _as_double("embedding").alias("ve")
        )
    )
    q = v.filter(F.col("vec_id") == 0).select(F.col("ve").alias("qv"))

    def topk(expr_col, alias):
        scored = (
            v.filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(q))
            .select("vec_id", expr_col.alias(alias))
        )
        # orderBy().limit(k) -> TakeOrderedAndProject (per-partition
        # heap + driver merge), then rank the k survivors.  The
        # filter-on-row_number form this replaces depended on
        # LimitPushDownThroughWindow firing to avoid a global sort —
        # this shape is scale-safe regardless of optimizer rules
        # (the ext_ann_rptree pattern).
        w = Window.orderBy(F.desc(alias), F.asc("vec_id"))
        return (
            scored.orderBy(F.desc(alias), F.asc("vec_id"))
            .limit(_MRL_K)
            .withColumn("rnk", F.row_number().over(w))
        )

    cos_full = F.round(
        _dot(F.col("ve"), F.col("qv"))
        / (
            F.sqrt(_dot(F.col("ve"), F.col("ve")))
            * F.sqrt(_dot(F.col("qv"), F.col("qv")))
        ),
        9,
    )
    tslice = lambda c: F.slice(c, 1, _MRL_DIM)  # noqa: E731
    cos_tr = F.round(
        _dot(tslice(F.col("ve")), tslice(F.col("qv")))
        / (
            F.sqrt(_dot(tslice(F.col("ve")), tslice(F.col("ve"))))
            * F.sqrt(_dot(tslice(F.col("qv")), tslice(F.col("qv"))))
        ),
        9,
    )
    topf = scoped_persist(topk(cos_full, "cos_full"))
    topt = topk(cos_tr, "cos_tr")
    hit = topf.select(F.col("vec_id").alias("h_id"), F.lit(1).alias("hit"))
    return (
        topt.select(
            "rnk",
            F.col("vec_id").alias("trunc_id"),
            "cos_tr",
        )
        .join(
            F.broadcast(
                topf.select(
                    F.col("rnk").alias("f_rnk"),
                    F.col("vec_id").alias("full_id"),
                    "cos_full",
                )
            ),
            F.col("rnk") == F.col("f_rnk"),
        )
        .join(F.broadcast(hit), F.col("trunc_id") == F.col("h_id"), "left")
        .select(
            "rnk",
            "trunc_id",
            "cos_tr",
            "full_id",
            "cos_full",
            F.coalesce("hit", F.lit(0)).alias("trunc_hit_in_full_topk"),
        )
    )


# --- ext_rank_biased_overlap ----------------------------------------------------

#: RBO persistence parameter and the truncated-evaluation depth (= the
#: matryoshka audit's top-k). Weights (1-p)*p^(d-1) are Python-computed
#: repr() literals — no engine pow() in any query (the ts_ewma stance).
_RBO_P = 0.9

_RBO_WEIGHTS = [
    repr((1.0 - _RBO_P) * _RBO_P ** (d - 1)) for d in range(1, _MRL_K + 1)
]

_RBO_ORACLE = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
  FROM embeddings
),
q AS (SELECT ve AS qv FROM v WHERE vec_id = 0),
full_ AS (
  SELECT vec_id,
         round(list_dot_product(v.ve, q.qv)
           / (sqrt(list_dot_product(v.ve, v.ve))
              * sqrt(list_dot_product(q.qv, q.qv))), 9) AS cos_full
  FROM v, q WHERE vec_id <> 0
),
tr AS (
  SELECT vec_id,
         round(list_dot_product(v.ve[1:{_MRL_DIM}], q.qv[1:{_MRL_DIM}])
           / (sqrt(list_dot_product(v.ve[1:{_MRL_DIM}],
                                    v.ve[1:{_MRL_DIM}]))
              * sqrt(list_dot_product(q.qv[1:{_MRL_DIM}],
                                      q.qv[1:{_MRL_DIM}]))), 9) AS cos_tr
  FROM v, q WHERE vec_id <> 0
),
topf AS MATERIALIZED (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cos_full DESC, vec_id)
    AS rnk
  FROM full_ QUALIFY rnk <= {_MRL_K}
),
topt AS MATERIALIZED (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cos_tr DESC, vec_id) AS rnk
  FROM tr QUALIFY rnk <= {_MRL_K}
),
m AS (
  SELECT greatest(t.rnk, f.rnk) AS maxr
  FROM topt t JOIN topf f ON t.vec_id = f.vec_id
),
grid AS (
  SELECT unnest(range(1, {_MRL_K} + 1)) AS depth,
         unnest([{", ".join(_RBO_WEIGHTS)}]) AS w
),
per_depth AS (
  SELECT g.depth, g.w,
         CAST((SELECT COUNT(*) FROM m WHERE m.maxr <= g.depth)
              AS BIGINT) AS overlap_d
  FROM grid g
),
tot AS (
  SELECT CAST(SUM(CAST(floor(w * overlap_d / depth * 1e9
                             + CAST(0.5 AS DOUBLE)) AS BIGINT))
              AS DOUBLE) / 1e9 AS rbo_trunc
  FROM per_depth
)
SELECT p.depth, p.overlap_d,
       CAST(p.overlap_d AS DOUBLE) / p.depth AS agreement_d,
       tot.rbo_trunc
FROM per_depth p CROSS JOIN tot
"""


@query("ext_rank_biased_overlap", oracle=_RBO_ORACLE, tier=3)
def ext_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al.) between the full-dim and
    Matryoshka-truncated top-{_MRL_K} rankings — the principled
    top-weighted rank-similarity read that completes
    ext_matryoshka_recall's membership flag (recall@k treats rank 1 and
    rank k alike; RBO weights agreement at depth d by (1-p)p^(d-1), so
    a prefix that reorders the head scores lower than one that shuffles
    the tail). Truncated evaluation (no extrapolation): weights are the
    geometric prefix, the depth-{_MRL_K} sum bounds the full-series RBO
    from below.

    Exactness: both rankings re-derive from the matryoshka audit's own
    frame (rank columns already tie-broken on vec_id); overlap_d counts
    are exact integers via max(rank_a, rank_b) <= d; the weights are
    repr()'d Python doubles (no engine pow); each depth's contribution
    floor-quantizes to the 1e9 grid before the 10-term sum; agreement_d
    is one shared-text division.

    Shape: consumes the helper's two {_MRL_K}-row rankings (its plan:
    two map-side scoring passes + TakeOrdered folds); everything after
    is arithmetic on <= {_MRL_K}-row frames (EXPECTED_FLAGS inherited
    from the matryoshka fold family)."""
    mrl = ext_matryoshka_recall(spark, sf_dir)
    from ..session import scoped_persist as _sp

    mrl = _sp(mrl)
    a = mrl.select(F.col("trunc_id").alias("vid"), F.col("rnk").alias("ra"))
    b = mrl.select(F.col("full_id").alias("vid"), F.col("rnk").alias("rb"))
    m = a.join(b, "vid").select(
        F.greatest("ra", "rb").alias("maxr")
    )
    grid = spark.range(1, _MRL_K + 1).select(
        F.col("id").cast("long").alias("depth"),
        F.element_at(
            F.array(*[F.expr(f"CAST({w} AS DOUBLE)") for w in _RBO_WEIGHTS]),
            F.col("id").cast("int"),
        ).alias("w"),
    )
    per_depth = grid.join(
        F.broadcast(m), F.col("maxr") <= F.col("depth"), "left"
    ).groupBy("depth", "w").agg(
        F.count("maxr").alias("overlap_d")
    )
    tot = per_depth.agg(
        F.expr(
            "CAST(SUM(CAST(floor(w * overlap_d / depth * 1e9"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS DOUBLE) / 1e9"
        ).alias("rbo_trunc")
    )
    return per_depth.crossJoin(F.broadcast(tot)).select(
        "depth",
        "overlap_d",
        F.expr("CAST(overlap_d AS DOUBLE) / depth").alias("agreement_d"),
        "rbo_trunc",
    )


# --- ext_ann_recall_curve -------------------------------------------------------

#: Recall evaluation depths. recall@k = |ANN top-k ∩ exact top-k| / k.
_ARC_KS = [1, 5, 10]


def _arc_oracle() -> str:
    from .llm_pipeline import _KNN_ORACLE

    ks = ", ".join(str(k) for k in _ARC_KS)
    return f"""
WITH exact AS MATERIALIZED ({_KNN_ORACLE}),
lshr AS MATERIALIZED ({_LSH_ORACLE}),
pqres AS MATERIALIZED ({_IVFPQR_ORACLE}),
er AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id)
    AS rnk FROM exact
),
lr AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id)
    AS rnk FROM lshr
),
qr AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY approx_dist ASC, vec_id)
    AS rnk FROM pqres
),
ml AS (
  SELECT greatest(er.rnk, lr.rnk) AS maxr
  FROM er JOIN lr ON er.vec_id = lr.vec_id
),
mq AS (
  SELECT greatest(er.rnk, qr.rnk) AS maxr
  FROM er JOIN qr ON er.vec_id = qr.vec_id
),
grid AS (SELECT unnest([{ks}]) AS k)
SELECT 'lsh' AS method, CAST(g.k AS BIGINT) AS k,
       CAST((SELECT COUNT(*) FROM ml WHERE ml.maxr <= g.k) AS BIGINT)
         AS n_hits,
       CAST((SELECT COUNT(*) FROM ml WHERE ml.maxr <= g.k) AS DOUBLE)
         / g.k AS recall_at_k
FROM grid g
UNION ALL
SELECT 'ivfpq_residual' AS method, CAST(g.k AS BIGINT) AS k,
       CAST((SELECT COUNT(*) FROM mq WHERE mq.maxr <= g.k) AS BIGINT)
         AS n_hits,
       CAST((SELECT COUNT(*) FROM mq WHERE mq.maxr <= g.k) AS DOUBLE)
         / g.k AS recall_at_k
FROM grid g
"""


_ARC_ORACLE = _arc_oracle()


@query("ext_ann_recall_curve", oracle=_ARC_ORACLE, tier=3)
def ext_ann_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall curve: recall@{{1,5,10}} of the LSH-bucketed search
    (ext_ann_lsh) AND the residual-IVFPQ serving path
    (ext_ann_ivfpq_residual — VERDICT r12 item 5: the PQ family's
    recall@k is driver-checked here, not just distance parity) against
    the exact brute-force top-10 (ext_knn_cosine) for the benchmark
    query — the acceptance test every approximate index ships with (the
    per-k curve shows WHERE each approximation loses: head misses are
    regressions, tail misses are the traded recall).
    Intersection-at-depth uses the max-rank identity (hit at k iff
    max(exact_rank, ann_rank) <= k — the ext_rank_biased_overlap
    machinery at unit weights).

    Exactness: rankings re-derive ranks by each method's OWN
    deterministic serving order over the helpers' 10-row outputs —
    (cos_sim desc, vec_id) for exact/LSH, (approx_dist asc, vec_id) for
    IVFPQ-residual, each pinned by the helper's key; hits are exact
    integers; recall is one shared-text division.

    Shape: consumes the three helpers' plans (broadcast query vector +
    map-side scoring + TakeOrdered for all; the LSH side adds its
    bucket candidate join, the residual side reads the staged scratch
    index); everything after is arithmetic on <= 10-row frames
    (EXPECTED_FLAGS inherited from the helpers' 1-row folds)."""
    from ..session import scoped_persist
    from pyspark.sql import Window
    from .llm_pipeline import ext_knn_cosine

    exact = scoped_persist(ext_knn_cosine(spark, sf_dir))
    w_cos = Window.orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    w_adc = Window.orderBy(F.asc("approx_dist"), F.asc("vec_id"))
    er = exact.select("vec_id", F.row_number().over(w_cos).alias("rnk"))
    grid = spark.createDataFrame([(k,) for k in _ARC_KS], "k long")
    methods = [
        (
            "lsh",
            scoped_persist(ext_ann_lsh(spark, sf_dir)).select(
                "vec_id", F.row_number().over(w_cos).alias("rnk")
            ),
        ),
        (
            "ivfpq_residual",
            scoped_persist(ext_ann_ivfpq_residual(spark, sf_dir)).select(
                "vec_id", F.row_number().over(w_adc).alias("rnk")
            ),
        ),
    ]
    out = None
    for name, ar in methods:
        m = (
            er.alias("e")
            .join(ar.alias("a"), F.col("e.vec_id") == F.col("a.vec_id"))
            .select(F.greatest("e.rnk", "a.rnk").alias("maxr"))
        )
        cur = (
            grid.join(F.broadcast(m), F.col("maxr") <= F.col("k"), "left")
            .groupBy("k")
            .agg(F.count("maxr").alias("n_hits"))
            .select(
                F.lit(name).alias("method"),
                "k",
                "n_hits",
                F.expr("CAST(n_hits AS DOUBLE) / k").alias("recall_at_k"),
            )
        )
        out = cur if out is None else out.unionAll(cur)
    return out
