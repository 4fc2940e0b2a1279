"""Distributed PCA via exact-moment covariance + in-plan power iteration
(SURVEY.md §2 extensions, round 10).

``ext_pca_power_iteration`` computes the top principal component of the
embedding corpus — the whitening/drift-monitoring primitive an embedding
pipeline runs per snapshot (is one direction eating the variance? did the
encoder change?). The 100 TB split is the same as ext_kmeans_lite's: the
DATA-sized work is one scan-local moment pass (map-side pair generation,
one (i, j) aggregate whose key space is dims², never rows), and the
iteration runs over MODEL-sized frames (a 64x64 covariance matrix and a
64-vector), each round one broadcast-fold join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..session import scoped_persist
from ..tables import load

_PCA_DIM = 64
_PCA_ROUNDS = 5

#: 5 rounds suffice BECAUSE of the planted gap below: alignment error is
#: (lambda2/lambda1)^rounds ~ 0.003^5 ~ 2e-13 — 8 rounds measured ~1.5x
#: slower for indistinguishable output (per-round broadcast+job latency
#: dominates at model scale).
#: Deterministic rank-1 anisotropy plant (the ext_dataset_diff fixture-
#: perturbation precedent): the raw fixture vectors are ISOTROPIC
#: (measured lambda2/lambda1 = 0.987 — power iteration would need ~550
#: rounds to separate anything), while real contextual-embedding spaces
#: are strongly anisotropic (Ethayarajh 2019) with a dominant common
#: direction. The declared input adds coef(row) * p(dim) with
#: coef = (vec_id % 17) - 8 (zero-mean across the id line) and
#: p_d = 0.002 * (d + 1), planting a known dominant component
#: (lambda1 ~ 8.6 vs lambda2 ~ 0.028) the iteration must RECOVER —
#: which the test pins against both numpy eigh and the planted
#: direction itself.
_PCA_PLANT_COEF = "(CAST({vid} % 17 AS DOUBLE) - CAST(8.0 AS DOUBLE))"
_PCA_PLANT_DIR = "(CAST(0.002 AS DOUBLE) * CAST({d} + 1 AS DOUBLE))"

#: Input quantization: scale 6 on the raw embedding entries (|v| < 1 in
#: the fixture, so q fits comfortably; products <= ~3.6e11 per row keep
#: the (i, j) sums inside int64 at any fixture sf).
_PCA_QSCALE = "1e6"

#: Iteration quantization: matrix-vector products floor-quantize at
#: scale 12, so each y_i is an exact long and the norm uses exact
#: squared sums (DECIMAL(38,0)/HUGEINT — qy² reaches ~4e27).
_PCA_ITSCALE = "1e12"

#: Population covariance from the exact integer moments (s = Σ qi*qj,
#: mi/mj = Σ qi, n = rows) — textually identical double SQL both engines.
#: The template form lets the Spark side bind the same arithmetic to array
#: elements (r13 optimization: the covariance is assembled inside a 1-row
#: array program instead of two broadcast joins) while the oracle keeps
#: the original column-name rendering below.
_PCA_COV_TPL = (
    "(CAST({s} AS DOUBLE) / 1e12) / CAST({n} AS DOUBLE)"
    " - (CAST({mi} AS DOUBLE) / (CAST({n} AS DOUBLE) * 1e6))"
    " * (CAST({mj} AS DOUBLE) / (CAST({n} AS DOUBLE) * 1e6))"
)
_PCA_COV_EXPR = _PCA_COV_TPL.format(s="s", n="n", mi="mi", mj="mj")

#: One quantized matrix-vector product term (c = covariance cell, x =
#: current iterate component) — shared text.
_PCA_TERM_EXPR = (
    "CAST(floor({c} * {x} * 1e12 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)


def _pca_plant(vid: str, d: str) -> str:
    """coef(row) * p(dim) — the planted rank-1 term, shared text."""
    coef = _PCA_PLANT_COEF.format(vid=vid)
    dirt = _PCA_PLANT_DIR.format(d=d)
    return f"({coef} * {dirt})"


def _pca_oracle() -> str:
    parts = [
        f"""
WITH pr AS (
  SELECT t1.i AS i, t2.j AS j,
         CAST(floor((embedding[t1.i + 1]
                     + {_pca_plant("vec_id", "t1.i")}) * {_PCA_QSCALE}
                    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS qi,
         CAST(floor((embedding[t2.j + 1]
                     + {_pca_plant("vec_id", "t2.j")}) * {_PCA_QSCALE}
                    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS qj
  FROM embeddings, range({_PCA_DIM}) t1(i), range({_PCA_DIM}) t2(j)
  WHERE t1.i <= t2.j
),
mom AS MATERIALIZED (
  SELECT i, j, CAST(SUM(qi * qj) AS BIGINT) AS s,
         CAST(SUM(qi) AS BIGINT) AS sl, COUNT(*) AS n
  FROM pr GROUP BY i, j
),
mean AS MATERIALIZED (
  SELECT i, sl AS m, n FROM mom WHERE i = j
),
cov AS MATERIALIZED (
  SELECT mo.i AS i, mo.j AS j, {_PCA_COV_EXPR} AS c
  FROM (SELECT i, j, s FROM mom) mo
  JOIN (SELECT i, m AS mi, n FROM mean) a ON mo.i = a.i
  JOIN (SELECT i, m AS mj FROM mean) b ON mo.j = b.i
),
cf AS MATERIALIZED (
  SELECT i, j, c FROM cov
  UNION ALL
  SELECT j AS i, i AS j, c FROM cov WHERE i < j
),
x0 AS (SELECT i AS j, CAST(0.125 AS DOUBLE) AS x FROM range({_PCA_DIM}) t(i))
"""
    ]
    term = _PCA_TERM_EXPR.format(c="cf.c", x="x.x")
    for r in range(1, _PCA_ROUNDS + 1):
        parts.append(
            f""",
y{r} AS MATERIALIZED (
  SELECT cf.i AS i, CAST(SUM({term}) AS BIGINT) AS qy
  FROM cf JOIN x{r - 1} x ON cf.j = x.j GROUP BY cf.i
),
s{r} AS MATERIALIZED (
  SELECT CAST(SUM(CAST(qy AS HUGEINT) * qy) AS DOUBLE) AS ss FROM y{r}
),
x{r} AS MATERIALIZED (
  SELECT i AS j, CAST(qy AS DOUBLE) / sqrt(ss) AS x FROM y{r}, s{r}
)"""
        )
    R = _PCA_ROUNDS
    parts.append(
        f"""
SELECT y.i AS dim,
       CAST(y.qy AS DOUBLE) / sqrt(s.ss) AS loading,
       sqrt(s.ss) / 1e12 AS eigenvalue
FROM y{R} y, s{R} s
"""
    )
    return "".join(parts)


_PCA_ORACLE = _pca_oracle()


@query("ext_pca_power_iteration", oracle=_PCA_ORACLE, tier=3)
def ext_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by power iteration
    — the embedding-health primitive (anisotropy / collapsed-direction
    monitoring, whitening prep, drift detection across encoder versions).
    Declared input = fixture vectors + a deterministic rank-1 anisotropy
    plant (module constant comment: the raw fixture is isotropic with
    lambda2/lambda1 = 0.987, where NO eigensolver separates a top
    direction in bounded rounds; real embedding spaces are anisotropic,
    and the plant gives the iteration a real gap to recover — the test
    pins recovery of the planted direction itself). Two-level
    decomposition, the only shape that survives 100 TB:

    1. DATA pass: all dims²/2 covariance moments in ONE scan — pairs
       (i <= j) generate map-side from each vector via nested indexed
       lambdas (no position self-join), then a single (i, j) aggregate
       whose key space is 2080 groups regardless of row count. Exact
       integer moments (inputs quantized at 1e6), covariance assembled
       by the shared closed-form text, mirroring prof_corr_matrix.
    2. MODEL iteration: the 2080-row moment triangle collapses into ONE
       model row (single-partition collect, EXPECTED_FLAGS — the frame
       is dims², never rows), and covariance assembly plus all 5
       power-iteration rounds run as higher-order-function projections
       on that row: zero joins, zero per-round exchanges (r13
       optimization — the prior broadcast-fold-per-round form paid ~11
       job rounds ≈ 5 s of the key's 6.2 s at sf0.1). Matrix-vector
       terms floor-quantize at 1e12 so each fold is an exact long and
       the norm uses exact DECIMAL(38,0)/HUGEINT squared sums — both
       engines walk bit-identical doubles through all 5 rounds.

    Output: 64 rows (dim, loading of the unit top eigenvector, Rayleigh
    eigenvalue = ||C x||). Convergence vs numpy.linalg.eigh and the
    variance-dominance property are pinned in tests/test_round10b.py."""
    from ..session import widen_scan

    # widen_scan A/B (the r9 discipline, min-of-4 at sf0.1): the moment
    # explode is CPU-dense map work over a single-row-group scan — widened
    # 0.79 s vs 2.49 s unwidened (3.1x)
    emb = widen_scan(load(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.expr(
            f"transform(embedding, (v, d) -> CAST(v AS DOUBLE)"
            f" + {_pca_plant('vec_id', 'd')})"
        ).alias("pe"),
    )
    # the mean vector rides the DIAGONAL groups of the same aggregate
    # (group (i, i) sees every qi once), so the corpus really is scanned
    # once — the separate posexplode mean branch was a second full
    # scan+shuffle (code-review r10)
    pairs = emb.select(
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(0, {_PCA_DIM - 1}), i ->
            transform(sequence(i, {_PCA_DIM - 1}), j -> struct(
              i AS i, j AS j,
              CAST(floor(pe[i] * {_PCA_QSCALE}
                         + CAST(0.5 AS DOUBLE)) AS BIGINT) AS qi,
              CAST(floor(pe[j] * {_PCA_QSCALE}
                         + CAST(0.5 AS DOUBLE)) AS BIGINT) AS qj))))"""
            )
        ).alias("p")
    ).select("p.*")
    mom = pairs.groupBy("i", "j").agg(
        F.sum(F.expr("qi * qj")).alias("s"),
        F.sum("qi").alias("sl"),
        F.count(F.lit(1)).alias("n"),
    )
    # Everything below the 2080-group moment aggregate is MODEL-sized
    # (a 64x64 matrix and a 64-vector), so the covariance assembly and
    # all 5 power-iteration rounds run as a 1-ROW ARRAY PROGRAM: one
    # single-partition collect of the moment triangle, then pure
    # higher-order-function projections (r13 optimization, guide §2.4 —
    # the previous form paid 2 broadcast joins + a union for the
    # covariance and, per round, a crossJoin-broadcast + 64-group
    # exchange + collect_list singleton: ~11 job rounds, measured ~5 s
    # of the key's 6.2 s isolation time; this form launches ONE job
    # past the moment pass). Bit-exactness is preserved because every
    # reduction here is exact integer arithmetic (BIGINT matvec terms,
    # DECIMAL(38,0) squared sums — order-independent) and every double
    # is produced by the same shared-text expression (_PCA_COV_TPL /
    # _PCA_TERM_EXPR) from identical exact inputs.
    # mm = the i<=j moment triangle, sorted (i, j): element (a, b),
    # a<=b, sits at index a*DIM - a*(a-1)/2 + (b-a); diagonal (i, i)
    # carries the mean (sl) and the row count n.
    one = mom.agg(
        F.expr(
            "array_sort(collect_list("
            "struct(i AS i, j AS j, s AS s, sl AS sl, n AS n)))"
        ).alias("mm")
    )
    d = _PCA_DIM
    tri = (
        f"(least(i, j) * {d} - (least(i, j) * (least(i, j) - 1)) DIV 2"
        " + (greatest(i, j) - least(i, j)))"
    )
    diag_i = f"(i * {d} - (i * (i - 1)) DIV 2)"
    diag_j = f"(j * {d} - (j * (j - 1)) DIV 2)"
    cov_cell = _PCA_COV_TPL.format(
        s=f"mm[{tri}].s",
        n=f"mm[{diag_i}].n",
        mi=f"mm[{diag_i}].sl",
        mj=f"mm[{diag_j}].sl",
    )
    # full 64x64 covariance as one array: m[i*DIM + j] = c(i, j). The
    # mirrored (i > j) cells evaluate the SAME expression on the same
    # exact integers as (j, i) — _PCA_COV_TPL is symmetric in (mi, mj)
    # up to one IEEE multiplication commutation — so they are the
    # identical doubles the old unionAll mirror carried.
    m_expr = (
        f"flatten(transform(sequence(0, {d - 1}), i ->"
        f" transform(sequence(0, {d - 1}), j -> {cov_cell})))"
    )
    # All 5 rounds run inside ONE aggregate() fold expression — never as
    # chained per-round projections, which CollapseProject would inline
    # into each other (each round references the previous qy three
    # times, so the collapsed tree grows 3^rounds and the optimizer
    # spins — observed: the chained form did not plan within 7 minutes).
    # Inside the fold, qy and sqrt(ss) are LET-bound via single-element
    # transform(array(x), v -> ...)[0] so each is evaluated exactly once
    # per round. Fold state: struct(xs = the unit iterate, eig).
    # qy_i = Σ_j floor-quantized term over matrix row i — exact BIGINT
    # fold; ss = exact DECIMAL(38,0) squared sum; both order-safe.
    term = _PCA_TERM_EXPR.format(c=f"m[i * {d} + j]", x="st.xs[j]")
    qy_of_xs = (
        f"transform(sequence(0, {d - 1}), i ->"
        f" aggregate(sequence(0, {d - 1}), CAST(0 AS BIGINT),"
        f" (acc, j) -> acc + {term}))"
    )
    ss_of_qy = (
        "aggregate(qy, CAST(0 AS DECIMAL(38,0)),"
        " (sacc, e) -> sacc + CAST(e AS DECIMAL(38,0)) * e,"
        " sacc -> CAST(sacc AS DOUBLE))"
    )
    round_body = (
        f"transform(array({qy_of_xs}), qy ->"
        f" transform(array(sqrt({ss_of_qy})), sq ->"
        " named_struct("
        "'xs', transform(qy, e -> CAST(e AS DOUBLE) / sq),"
        " 'eig', sq / 1e12))[0])[0]"
    )
    iter_expr = (
        f"aggregate(sequence(1, {_PCA_ROUNDS}),"
        " named_struct("
        f"'xs', transform(sequence(0, {d - 1}), i0 -> CAST(0.125 AS DOUBLE)),"
        " 'eig', CAST(0.0 AS DOUBLE)),"
        f" (st, r) -> {round_body})"
    )
    # m is LET-bound too: as a projected column it is referenced once by
    # iter_expr, and CollapseProject inlines single-reference expressions
    # into their consumer — here into the innermost fold term, where the
    # 4096-cell matrix would be rebuilt on EVERY term evaluation
    # (observed: the inlined form ran >4 min at sf0.01; the bound form
    # evaluates m once per row).
    fin = one.select(
        F.expr(f"transform(array({m_expr}), m -> {iter_expr})[0]").alias(
            "fin"
        )
    )
    return fin.select(
        F.posexplode("fin.xs").alias("dim", "loading"),
        F.col("fin.eig").alias("eigenvalue"),
    ).select("dim", "loading", "eigenvalue")


# --- ext_embedding_anisotropy ---------------------------------------------------

#: Unit-component quantizer. Components int-quantize at 1e6 TWICE: raw
#: floats first (so the norm is an exact integer and sqrt/divide are the
#: identical correctly-rounded IEEE ops in both engines), then the unit
#: components (so all cross-row sums are exact BIGINT). |S|^2 widens to
#: DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — the prof_corr_matrix
#: overflow stance: per-dim sums square past int64 beyond ~9e3 vectors.
_ANISO_Q = "1e6"

_ANISO_ORACLE = f"""
WITH q AS (
  SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {_ANISO_Q}
                           + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS e
  FROM embeddings
),
u AS (
  SELECT vec_id, label,
         list_transform(e, v -> CAST(floor(
           CAST(v AS DOUBLE)
             / sqrt(CAST(list_aggregate(
                 list_transform(e, w -> w * w), 'sum') AS DOUBLE))
           * {_ANISO_Q} + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS uq
  FROM q
),
rows_q AS (
  SELECT vec_id, label,
         CAST(list_aggregate(list_transform(uq, w -> w * w), 'sum')
              AS BIGINT) AS qn2,
         uq
  FROM u
),
ld AS (
  SELECT label, unnest(range(1, 65)) AS dim, unnest(uq) AS qv
  FROM rows_q
),
sums AS (
  SELECT label, dim, CAST(SUM(qv) AS BIGINT) AS s
  FROM ld GROUP BY label, dim
),
lab AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(qn2) AS BIGINT) AS qn2
  FROM rows_q GROUP BY label
),
per_label AS (
  SELECT s.label, lab.n,
         CAST((SUM(CAST(s.s AS HUGEINT) * s.s) - MAX(lab.qn2)) AS DOUBLE)
           / (CAST(lab.n * (lab.n - 1) AS DOUBLE) * {_ANISO_Q} * {_ANISO_Q})
           AS mean_pairwise_cosine
  FROM sums s JOIN lab ON s.label = lab.label
  GROUP BY s.label, lab.n
),
overall AS (
  SELECT CAST(-1 AS INTEGER) AS label,
         (SELECT CAST(SUM(n) AS BIGINT) FROM lab) AS n,
         CAST((SUM(CAST(sd AS HUGEINT) * sd)
               - (SELECT SUM(qn2) FROM lab)) AS DOUBLE)
           / (CAST((SELECT SUM(n) FROM lab)
                   * ((SELECT SUM(n) FROM lab) - 1) AS DOUBLE)
              * {_ANISO_Q} * {_ANISO_Q}) AS mean_pairwise_cosine
  FROM (SELECT dim, CAST(SUM(s) AS BIGINT) AS sd FROM sums GROUP BY dim)
)
SELECT label, n, mean_pairwise_cosine FROM per_label
UNION ALL
SELECT label, n, mean_pairwise_cosine FROM overall
"""


@query("ext_embedding_anisotropy", oracle=_ANISO_ORACLE, tier=3)
def ext_embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding anisotropy audit: mean pairwise cosine similarity over
    all vector pairs, per label and overall (label -1) — the Ethayarajh-
    style cone check run on every encoder snapshot (anisotropic spaces
    break cosine-threshold dedup and ANN recall; a drift here means the
    encoder changed, the complement to ext_pca_power_iteration's
    dominant-direction read).

    The identity that makes this distributed: for unit vectors,
    sum over i != j of u_i . u_j == |sum u|^2 - sum |u_i|^2 — so the
    all-pairs mean needs only the per-dimension component SUMS (64
    numbers per label), never a pairwise join: one linear scan replaces
    the O(n^2) cosine matrix at ANY corpus size.

    Exactness: components int-quantize at 1e6 twice (raw floats first,
    making the norm an exact integer so sqrt/divide are identical
    correctly-rounded IEEE ops in both engines; then the unit
    components), so every cross-row sum is exact BIGINT; |S|^2 widens to
    DECIMAL(38,0)/HUGEINT (the ts_acf stance), and the mean is one
    shared-text division. n*(n-1) stays in int64 to ~3e9 vectors
    (documented).

    Shape: scan -> map-side quantize -> posexplode -> ONE (label, dim)
    aggregate (key space = labels x 64, never rows); the per-label and
    overall folds run on that model-sized frame (EXPECTED_FLAGS)."""
    v = load(spark, sf_dir, "embeddings")
    e = F.transform(
        "embedding",
        lambda x: F.floor(
            x.cast("double") * F.expr(_ANISO_Q) + F.lit(0.5)
        ).cast("long"),
    )
    q = v.select("vec_id", "label", e.alias("e"))
    norm = F.sqrt(
        F.aggregate(
            F.transform("e", lambda w: w * w),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).cast("double")
    )
    u = q.select(
        "vec_id",
        "label",
        F.transform(
            "e",
            lambda x: F.floor(
                x.cast("double") / norm * F.expr(_ANISO_Q) + F.lit(0.5)
            ).cast("long"),
        ).alias("uq"),
    )
    rows_q = u.select(
        "label",
        F.aggregate(
            F.transform("uq", lambda w: w * w),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("qn2"),
        "uq",
    )
    rows_q = scoped_persist(rows_q)
    ld = rows_q.select(
        "label", F.posexplode("uq").alias("pos", "qv")
    ).select("label", (F.col("pos") + 1).alias("dim"), "qv")
    sums = scoped_persist(
        ld.groupBy("label", "dim").agg(F.sum("qv").alias("s"))
    )
    lab = rows_q.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"), F.sum("qn2").alias("qn2")
    )
    qq = f"{_ANISO_Q} * {_ANISO_Q}"
    per_label = (
        sums.join(lab, "label")
        .groupBy("label", "n")
        .agg(
            F.expr(
                "CAST((SUM(CAST(s AS DECIMAL(38,0)) * s) - MAX(qn2))"
                " AS DOUBLE)"
            ).alias("num"),
        )
        .select(
            "label",
            "n",
            (
                F.col("num")
                / F.expr(
                    f"CAST(n * (n - 1) AS DOUBLE) * {qq}"
                )
            ).alias("mean_pairwise_cosine"),
        )
    )
    tot = lab.agg(
        F.sum("n").alias("n"), F.sum("qn2").alias("qn2")
    )
    overall = (
        sums.groupBy("dim")
        .agg(F.sum("s").alias("sd"))
        .agg(
            F.expr(
                "SUM(CAST(sd AS DECIMAL(38,0)) * sd)"
            ).alias("s2")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.lit(-1).cast("int").alias("label"),
            "n",
            F.expr(
                f"CAST(s2 - qn2 AS DOUBLE)"
                f" / (CAST(n * (n - 1) AS DOUBLE) * {qq})"
            ).alias("mean_pairwise_cosine"),
        )
    )
    return per_label.unionAll(overall)
