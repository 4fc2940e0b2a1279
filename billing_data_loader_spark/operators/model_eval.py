"""Model-evaluation operators for training-data pipelines (round 12):
ranking discrimination (AUC), multi-class retrieval quality (macro-F1),
inter-rater agreement (Cohen's kappa), and probabilistic sharpness
(Brier score).

These complete the classifier-audit suite started by
``ext_confusion_matrix`` (discrimination at ONE threshold) and
``ext_calibration_ece`` (calibration): a pipeline owner deciding whether
to wire a quality filter into curation reads threshold-free ranking
quality (AUC), agreement with an independent heuristic (kappa), and a
proper scoring rule (Brier) off these frames before committing a corpus
to it.

Exactness stance (house rules): every decision and count is integer;
cross-row sums of per-row doubles are floor-quantized to a fixed grid
BEFORE summing (the ext_calibration_ece stance); final ratios are one
shared-text IEEE division over exact integers wherever possible.
"""

from __future__ import annotations

import itertools
import math

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import load
from .text_analysis import (
    _QCLS_BUCKETS,
    _QCLS_KNUTH,
    ext_lang_id,
    ext_quality_classifier,
)

# --- ext_auc_rank -------------------------------------------------------------

#: Shared classifier-score CTE: the ext_quality_classifier integer weight
#: sum per doc with the English gold label (the ext_confusion_matrix
#: pairing). The score is the INTEGER w_sum — the same decision variable
#: the classifier thresholds at zero — so rank arithmetic is exact.
_SCORED_SQL = f"""
  SELECT s.doc_id, s.w_sum,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
  FROM (
    SELECT doc_id,
           CAST(SUM((('0x' || substr(md5(token), 1, 8))::BIGINT
                      % {_QCLS_BUCKETS} * {_QCLS_KNUTH}) % 2001 - 1000)
                AS BIGINT) AS w_sum
    FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ) GROUP BY doc_id
  ) s JOIN documents d ON s.doc_id = d.doc_id
"""

_AUC_ORACLE = f"""
WITH scored AS ({_SCORED_SQL}),
g AS (
  SELECT w_sum, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS p
  FROM scored GROUP BY w_sum
),
c AS (
  SELECT w_sum, n, p,
         CAST(SUM(n) OVER (ORDER BY w_sum ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS cum
  FROM g
),
m AS (
  SELECT CAST(SUM(p * (2 * cum - n + 1)) AS BIGINT) AS r2_pos,
         CAST(SUM(p) AS BIGINT) AS n_pos,
         CAST(SUM(n) AS BIGINT) AS n_all
  FROM c
)
SELECT n_pos, n_all - n_pos AS n_neg,
       CAST(r2_pos - n_pos * (n_pos + 1) AS DOUBLE)
         / CAST(2 * n_pos * (n_all - n_pos) AS DOUBLE) AS auc,
       CAST(r2_pos - n_pos * (n_pos + 1) - n_pos * (n_all - n_pos)
            AS DOUBLE)
         / CAST(n_pos * (n_all - n_pos) AS DOUBLE) AS gini_index
FROM m
"""


@query("ext_auc_rank", oracle=_AUC_ORACLE, tier=3)
def ext_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-free ranking audit for ``ext_quality_classifier``: AUC
    via the Mann-Whitney rank-sum identity with MIDRANKS for tied scores
    (AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg), R_pos the
    midrank sum of positives), plus the Gini index 2*AUC - 1. The
    confusion matrix reads discrimination at the classifier's own
    threshold; this reads it across ALL thresholds — the number a filter
    owner compares across classifier candidates.

    Exactness: scores are the classifier's integer weight sums, so score
    groups, midranks, and the rank-sum are exact BIGINT arithmetic
    (doubled midranks keep the half-integers integral:
    2*R_pos = sum over score groups of p_g * (2*cum_g - n_g + 1)); AUC
    and Gini are one shared-text IEEE division each over exact integers.
    Intermediate products stay inside int64 for corpora to ~10^9 docs;
    past that the midrank sum needs DECIMAL(38,0) widening (documented,
    not needed at fixture or production doc counts).

    Shape: the classifier's scan -> explode -> one doc-keyed aggregate,
    then ONE aggregate onto the distinct-score frame; the cumulative
    count is a window over that frame ordered by score — bounded by the
    integer score support, not by docs (ties collapse). At true 100 TB
    the swap is the ts_cusum_changepoint two-pass form: bucket scores by
    range, per-bucket prefix sums, broadcast bucket offsets. The final
    fold is a 1-row aggregate (EXPECTED_FLAGS)."""
    lab = load(spark, sf_dir, "documents").select(
        "doc_id", (F.col("lang") == "en").cast("int").alias("y")
    )
    scored = (
        ext_quality_classifier(spark, sf_dir)
        .select("doc_id", "w_sum")
        .join(lab, "doc_id")
    )
    g = scored.groupBy("w_sum").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("p")
    )
    c = g.withColumn(
        "cum",
        F.sum("n").over(
            W.orderBy(F.col("w_sum").asc()).rowsBetween(
                W.unboundedPreceding, W.currentRow
            )
        ),
    )
    m = c.agg(
        F.sum(
            F.col("p") * (F.lit(2) * F.col("cum") - F.col("n") + F.lit(1))
        ).alias("r2_pos"),
        F.sum("p").alias("n_pos"),
        F.sum("n").alias("n_all"),
    )
    return m.select(
        "n_pos",
        (F.col("n_all") - F.col("n_pos")).alias("n_neg"),
        F.expr(
            "CAST(r2_pos - n_pos * (n_pos + 1) AS DOUBLE)"
            " / CAST(2 * n_pos * (n_all - n_pos) AS DOUBLE)"
        ).alias("auc"),
        F.expr(
            "CAST(r2_pos - n_pos * (n_pos + 1) - n_pos * (n_all - n_pos)"
            " AS DOUBLE) / CAST(n_pos * (n_all - n_pos) AS DOUBLE)"
        ).alias("gini_index"),
    )


# --- ext_macro_f1 ---------------------------------------------------------------

#: ext_lang_id's prediction frame re-derived as a CTE (the
#: ext_calibration_ece composition precedent: the Spark side composes the
#: helper, the oracle re-derives its CTEs so the check stays independent).
_PRED_SQL = """
  SELECT doc_id, true_lang, sig_lang AS pred_lang
  FROM (
    SELECT doc_id, any_value(lang) AS true_lang, sig_lang,
           ROW_NUMBER() OVER (
             PARTITION BY doc_id
             ORDER BY COUNT(*) DESC, sig_lang ASC
           ) AS rn
    FROM (SELECT DISTINCT doc_id, lang, token FROM (
            SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
            FROM documents))
    JOIN (
      SELECT lang AS sig_lang, token FROM (
        SELECT lang, token, ROW_NUMBER() OVER (
          PARTITION BY lang ORDER BY COUNT(*) DESC, token ASC
        ) AS rn
        FROM (SELECT doc_id, lang,
                     unnest(string_split(text, ' ')) AS token
              FROM documents)
        GROUP BY lang, token
      ) WHERE rn <= 20
    ) USING (token)
    GROUP BY doc_id, sig_lang
  ) WHERE rn = 1
"""

_MACRO_F1_ORACLE = f"""
WITH pl AS ({_PRED_SQL}),
tc AS (
  SELECT true_lang AS lang, CAST(COUNT(*) AS BIGINT) AS n_true,
         CAST(COUNT(*) FILTER (pred_lang = true_lang) AS BIGINT) AS tp
  FROM pl GROUP BY true_lang
),
pc AS (
  SELECT pred_lang AS lang, CAST(COUNT(*) AS BIGINT) AS n_pred
  FROM pl GROUP BY pred_lang
),
per_class AS (
  SELECT tc.lang, tc.n_true, COALESCE(pc.n_pred, 0) AS n_pred, tc.tp,
         CAST(tc.tp AS DOUBLE)
           / CAST(NULLIF(COALESCE(pc.n_pred, 0), 0) AS DOUBLE)
           AS precision_c,
         CAST(tc.tp AS DOUBLE) / CAST(tc.n_true AS DOUBLE) AS recall_c,
         CAST(2 * tc.tp AS DOUBLE)
           / CAST(COALESCE(pc.n_pred, 0) + tc.n_true AS DOUBLE) AS f1_c
  FROM tc LEFT JOIN pc ON tc.lang = pc.lang
),
o AS (
  SELECT CAST(SUM(CAST(floor(f1_c * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
           / (COUNT(*) * 1e9) AS macro_f1,
         CAST(SUM(tp) AS DOUBLE) / CAST(SUM(n_true) AS DOUBLE)
           AS micro_accuracy
  FROM per_class
)
SELECT p.lang, p.n_true, p.n_pred, p.tp,
       p.precision_c, p.recall_c, p.f1_c,
       o.macro_f1, o.micro_accuracy
FROM per_class p CROSS JOIN o
"""


@query("ext_macro_f1", oracle=_MACRO_F1_ORACLE, tier=3)
def ext_macro_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-class precision/recall/F1 per language plus macro-F1 and
    micro accuracy for ``ext_lang_id`` — the per-class completion of the
    binary ``ext_confusion_matrix``: macro-F1 weights every language
    equally, which is the number a curator reads when low-resource
    languages must not be drowned out by the head class.

    Class universe = languages appearing as TRUE labels among classified
    docs (every predicted language is a true language by construction —
    signatures come from the corpus's own lang column). Per class:
    tp = diagonal count, n_pred/n_true = marginals; f1 uses the
    2tp/(n_pred + n_true) form (one division, defined whenever the class
    exists); precision is NULL for never-predicted classes
    (NULLIF-guarded identically in both engines).

    Exactness: all counts integer; per-class ratios are shared-text IEEE
    divisions; macro-F1 averages the handful of per-class f1 doubles —
    each f1 is the identical IEEE double on both sides, and the average
    runs over O(langs) rows via an exact integer-quantized sum at 1e-9
    (order-insensitive by construction).

    Shape: ext_lang_id's plan (broadcast signature join, doc-keyed
    aggregates), then two O(langs)-row marginal aggregates, a broadcast
    left join, and 1-row macro folds cross-joined back (EXPECTED_FLAGS:
    O(langs) frames, never docs)."""
    pl = ext_lang_id(spark, sf_dir).select("pred_lang", "true_lang")
    tc = pl.groupBy(F.col("true_lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_true"),
        F.sum(
            (F.col("pred_lang") == F.col("true_lang")).cast("long")
        ).alias("tp"),
    )
    pc = pl.groupBy(F.col("pred_lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    per_class = (
        tc.join(F.broadcast(pc), "lang", "left")
        .select(
            "lang",
            "n_true",
            F.coalesce("n_pred", F.lit(0).cast("long")).alias("n_pred"),
            "tp",
        )
        .select(
            "lang",
            "n_true",
            "n_pred",
            "tp",
            F.expr(
                "CAST(tp AS DOUBLE)"
                " / CAST(NULLIF(n_pred, 0) AS DOUBLE)"
            ).alias("precision_c"),
            F.expr(
                "CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE)"
            ).alias("recall_c"),
            F.expr(
                "CAST(2 * tp AS DOUBLE)"
                " / CAST(n_pred + n_true AS DOUBLE)"
            ).alias("f1_c"),
        )
    )
    o = per_class.agg(
        F.expr(
            "CAST(SUM(CAST(floor(f1_c * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)"
            " / (COUNT(*) * 1e9)"
        ).alias("macro_f1"),
        F.expr(
            "CAST(SUM(tp) AS DOUBLE) / CAST(SUM(n_true) AS DOUBLE)"
        ).alias("micro_accuracy"),
    )
    return per_class.crossJoin(F.broadcast(o)).select(
        "lang",
        "n_true",
        "n_pred",
        "tp",
        "precision_c",
        "recall_c",
        "f1_c",
        "macro_f1",
        "micro_accuracy",
    )


# --- ext_kappa_agreement --------------------------------------------------------

_KAPPA_ORACLE = f"""
WITH feats AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct,
         CAST(SUM((('0x' || substr(md5(token), 1, 8))::BIGINT
                    % {_QCLS_BUCKETS} * {_QCLS_KNUTH}) % 2001 - 1000)
              AS BIGINT) AS w_sum
  FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
  ) GROUP BY doc_id
),
cells AS (
  SELECT (w_sum > 0) AS a_keep, (2 * n_distinct > n_tokens) AS b_keep,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM feats GROUP BY 1, 2
),
m AS (
  SELECT
    CAST(SUM(n) AS BIGINT) AS total,
    CAST(SUM(CASE WHEN a_keep = b_keep THEN n ELSE 0 END) AS BIGINT)
      AS n_agree,
    CAST(SUM(CASE WHEN a_keep THEN n ELSE 0 END) AS BIGINT) AS a1,
    CAST(SUM(CASE WHEN b_keep THEN n ELSE 0 END) AS BIGINT) AS b1
  FROM cells
)
SELECT c.a_keep, c.b_keep, c.n,
       CAST(m.n_agree AS DOUBLE) / CAST(m.total AS DOUBLE) AS p_observed,
       CAST(m.a1 * m.b1 + (m.total - m.a1) * (m.total - m.b1) AS DOUBLE)
         / CAST(m.total * m.total AS DOUBLE) AS p_expected,
       CAST(m.total * m.n_agree
            - (m.a1 * m.b1 + (m.total - m.a1) * (m.total - m.b1))
            AS DOUBLE)
         / CAST(m.total * m.total
                - (m.a1 * m.b1 + (m.total - m.a1) * (m.total - m.b1))
                AS DOUBLE) AS kappa
FROM cells c CROSS JOIN m
"""


@query("ext_kappa_agreement", oracle=_KAPPA_ORACLE, tier=3)
def ext_kappa_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two independent keep/drop raters — the
    agreement audit run before trusting a cheap heuristic as a proxy for
    an expensive classifier (or before ensembling them): rater A is
    ``ext_quality_classifier``'s integer decision (w_sum > 0), rater B
    is a lexical-diversity rule (type-token ratio > 1/2, evaluated as
    the integer cross-multiplication 2*n_distinct > n_tokens — no float
    in either decision path). Emits the 2x2 agreement grid with
    p_observed, p_expected, and kappa as constant columns.

    Exactness: both decisions and all cell counts are exact integers;
    kappa collapses algebraically to ONE division of integer polynomials
    — kappa = (N*n_agree - (a1*b1 + a0*b0)) / (N^2 - (a1*b1 + a0*b0)) —
    so no compounding of already-divided doubles anywhere (products fit
    int64 to ~3e9 docs).

    Shape: one scan -> token explode -> ONE doc-keyed aggregate computes
    both raters' features (n_tokens, n_distinct, w_sum) in the same
    pass; the grid is a <= 4-row aggregate and the metric fold is 1-row,
    cross-joined back (EXPECTED_FLAGS: O(cells), never docs)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long"),
        F.lit(_QCLS_BUCKETS),
    )
    w_int = F.pmod(bucket * _QCLS_KNUTH, F.lit(2001)) - 1000
    feats = tok.select("doc_id", "token", w_int.alias("w")).groupBy(
        "doc_id"
    ).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("token").alias("n_distinct"),
        F.sum("w").alias("w_sum"),
    )
    cells = feats.select(
        (F.col("w_sum") > 0).alias("a_keep"),
        (F.lit(2) * F.col("n_distinct") > F.col("n_tokens")).alias(
            "b_keep"
        ),
    ).groupBy("a_keep", "b_keep").agg(F.count(F.lit(1)).alias("n"))
    m = cells.agg(
        F.sum("n").alias("total"),
        F.sum(
            F.expr("CASE WHEN a_keep = b_keep THEN n ELSE 0 END")
        ).alias("n_agree"),
        F.sum(F.expr("CASE WHEN a_keep THEN n ELSE 0 END")).alias("a1"),
        F.sum(F.expr("CASE WHEN b_keep THEN n ELSE 0 END")).alias("b1"),
    )
    return cells.crossJoin(F.broadcast(m)).select(
        "a_keep",
        "b_keep",
        "n",
        F.expr(
            "CAST(n_agree AS DOUBLE) / CAST(total AS DOUBLE)"
        ).alias("p_observed"),
        F.expr(
            "CAST(a1 * b1 + (total - a1) * (total - b1) AS DOUBLE)"
            " / CAST(total * total AS DOUBLE)"
        ).alias("p_expected"),
        F.expr(
            "CAST(total * n_agree"
            " - (a1 * b1 + (total - a1) * (total - b1)) AS DOUBLE)"
            " / CAST(total * total"
            " - (a1 * b1 + (total - a1) * (total - b1)) AS DOUBLE)"
        ).alias("kappa"),
    )


# --- ext_brier_score ------------------------------------------------------------

#: Per-row squared error quantization grid (the ext_calibration_ece
#: stance: floor-quantize per-row doubles before ANY cross-row sum).
_BRIER_Q = "1e9"

_BRIER_ORACLE = f"""
WITH scored AS ({_SCORED_SQL}),
feats AS (
  SELECT s.doc_id, s.w_sum, s.y, t.n_tok FROM scored s JOIN (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents)
    GROUP BY doc_id
  ) t ON s.doc_id = t.doc_id
),
q AS (
  SELECT y,
         CAST(floor(
           (CAST(w_sum + 1000 * n_tok AS DOUBLE)
              / CAST(2000 * n_tok AS DOUBLE)
            - CAST(y AS DOUBLE))
           * (CAST(w_sum + 1000 * n_tok AS DOUBLE)
              / CAST(2000 * n_tok AS DOUBLE)
            - CAST(y AS DOUBLE))
           * {_BRIER_Q} + 0.5) AS BIGINT) AS sq
  FROM feats
),
cls AS (
  SELECT y, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(sq) AS BIGINT) AS s
  FROM q GROUP BY y
),
o AS (
  SELECT CAST(SUM(s) AS DOUBLE) / (CAST(SUM(n) AS DOUBLE) * {_BRIER_Q})
    AS brier FROM cls
)
SELECT cls.y AS actual_en, cls.n,
       CAST(cls.s AS DOUBLE) / (CAST(cls.n AS DOUBLE) * {_BRIER_Q})
         AS class_brier,
       o.brier AS overall_brier
FROM cls CROSS JOIN o
"""


@query("ext_brier_score", oracle=_BRIER_ORACLE, tier=3)
def ext_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score (mean squared error of the keep probability against
    the English gold label), per class and overall — the proper scoring
    rule that complements ``ext_calibration_ece``: ECE can be gamed by a
    constant base-rate predictor; the Brier score penalizes that lack of
    sharpness. The probability is the calibration key's own monotone
    rational squash p = (w_sum + 1000*n_tok) / (2000*n_tok) — exact in
    [0, 1], no transcendental anywhere.

    Exactness: p is one IEEE division of exact integers (identical text
    both engines), the squared error is two more identical IEEE ops, and
    each per-row value floor-quantizes to the 1e9 grid BEFORE the
    cross-row sum (order-insensitive exact BIGINT totals); the final
    means divide exact integers.

    Shape: one scan -> explode -> ONE doc-keyed aggregate (w_sum and
    n_tok in the same pass), per-row arithmetic map-side, then a 2-row
    class aggregate with the 1-row overall fold cross-joined back
    (EXPECTED_FLAGS: O(classes), never docs)."""
    lab = load(spark, sf_dir, "documents").select(
        "doc_id", (F.col("lang") == "en").cast("int").alias("y")
    )
    feats = (
        ext_quality_classifier(spark, sf_dir)
        .select("doc_id", "w_sum", F.col("n_tok"))
        .join(lab, "doc_id")
    )
    err = F.expr(
        "CAST(w_sum + 1000 * n_tok AS DOUBLE)"
        " / CAST(2000 * n_tok AS DOUBLE) - CAST(y AS DOUBLE)"
    )
    q = feats.select(
        "y",
        F.floor(err * err * F.expr(_BRIER_Q) + F.lit(0.5))
        .cast("long")
        .alias("sq"),
    )
    cls = q.groupBy("y").agg(
        F.count(F.lit(1)).alias("n"), F.sum("sq").alias("s")
    )
    o = cls.agg(
        F.expr(
            f"CAST(SUM(s) AS DOUBLE) / (CAST(SUM(n) AS DOUBLE)"
            f" * {_BRIER_Q})"
        ).alias("brier")
    )
    return cls.crossJoin(F.broadcast(o)).select(
        F.col("y").alias("actual_en"),
        "n",
        F.expr(
            f"CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * {_BRIER_Q})"
        ).alias("class_brier"),
        F.col("brier").alias("overall_brier"),
    )


# --- ext_log_loss ---------------------------------------------------------------

#: ln values quantize at 1e6 (the ext_zipf_fit grid: empirically ulp-
#: consistent across both engines' libm at this resolution) so the
#: cross-row sum is exact BIGINT. The probability is Laplace-smoothed —
#: p = (w_sum + 1000*n_tok + 1) / (2000*n_tok + 2) — strictly inside
#: (0, 1), so ln never sees 0 even for single-token extreme docs.
_LL_Q = "1e6"

_LL_ORACLE = f"""
WITH scored AS ({_SCORED_SQL}),
feats AS (
  SELECT s.doc_id, s.w_sum, s.y, t.n_tok FROM scored s JOIN (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents)
    GROUP BY doc_id
  ) t ON s.doc_id = t.doc_id
),
q AS (
  SELECT y,
         CAST(floor(
           -(CAST(y AS DOUBLE)
               * ln(CAST(w_sum + 1000 * n_tok + 1 AS DOUBLE)
                    / CAST(2000 * n_tok + 2 AS DOUBLE))
             + CAST(1 - y AS DOUBLE)
               * ln(CAST(1000 * n_tok - w_sum + 1 AS DOUBLE)
                    / CAST(2000 * n_tok + 2 AS DOUBLE)))
           * {_LL_Q} + CAST(0.5 AS DOUBLE)) AS BIGINT) AS nll
  FROM feats
),
cls AS (
  SELECT y, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(nll) AS BIGINT) AS s
  FROM q GROUP BY y
),
o AS (
  SELECT CAST(SUM(s) AS DOUBLE) / (CAST(SUM(n) AS DOUBLE) * {_LL_Q})
    AS log_loss FROM cls
)
SELECT cls.y AS actual_en, cls.n,
       CAST(cls.s AS DOUBLE) / (CAST(cls.n AS DOUBLE) * {_LL_Q})
         AS class_log_loss,
       o.log_loss AS overall_log_loss
FROM cls CROSS JOIN o
"""


@query("ext_log_loss", oracle=_LL_ORACLE, tier=3)
def ext_log_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary cross-entropy (log loss) of the classifier's Laplace-
    smoothed keep probability against the English gold label, per class
    and overall — the third proper-scoring read beside ext_brier_score
    (Brier is bounded and gentle on confident errors; log loss punishes
    them unboundedly, which is what you want before trusting a filter's
    extreme scores). 1 - p is computed in CLOSED FORM
    ((1000*n_tok - w_sum + 1) / (2000*n_tok + 2)) rather than as
    1.0 - p, so both ln operands are single exact-integer divisions.

    Exactness: p is rational and strictly inside (0,1) (Laplace +1/+2
    smoothing handles single-token extreme docs where raw p hits 0 or
    1); each per-row negative log-likelihood floor-quantizes to the 1e6
    grid BEFORE the cross-row sum (the ext_zipf_fit ln stance); final
    means divide exact integers.

    Shape: identical to ext_brier_score — one scan -> explode -> ONE
    doc-keyed aggregate, map-side per-row arithmetic, a 2-row class
    aggregate and the 1-row overall fold (EXPECTED_FLAGS)."""
    lab = load(spark, sf_dir, "documents").select(
        "doc_id", (F.col("lang") == "en").cast("int").alias("y")
    )
    feats = (
        ext_quality_classifier(spark, sf_dir)
        .select("doc_id", "w_sum", "n_tok")
        .join(lab, "doc_id")
    )
    nll = F.expr(
        f"CAST(floor(-(CAST(y AS DOUBLE)"
        f" * ln(CAST(w_sum + 1000 * n_tok + 1 AS DOUBLE)"
        f" / CAST(2000 * n_tok + 2 AS DOUBLE))"
        f" + CAST(1 - y AS DOUBLE)"
        f" * ln(CAST(1000 * n_tok - w_sum + 1 AS DOUBLE)"
        f" / CAST(2000 * n_tok + 2 AS DOUBLE)))"
        f" * {_LL_Q} + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )
    q = feats.select("y", nll.alias("nll"))
    cls = q.groupBy("y").agg(
        F.count(F.lit(1)).alias("n"), F.sum("nll").alias("s")
    )
    o = cls.agg(
        F.expr(
            f"CAST(SUM(s) AS DOUBLE) / (CAST(SUM(n) AS DOUBLE)"
            f" * {_LL_Q})"
        ).alias("log_loss")
    )
    return cls.crossJoin(F.broadcast(o)).select(
        F.col("y").alias("actual_en"),
        "n",
        F.expr(
            f"CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * {_LL_Q})"
        ).alias("class_log_loss"),
        F.col("log_loss").alias("overall_log_loss"),
    )


# --- ext_ndcg_eval ------------------------------------------------------------

#: Rank-discount integers: round(1e9 / log2(rank + 1)) for ranks 1..10,
#: computed ONCE in Python and baked as literals into BOTH engine texts —
#: zero cross-engine libm surface (log2 of non-powers-of-two is not
#: guaranteed identically rounded across engines; baked integers are).
_NDCG_DISC = tuple(
    round(1e9 / math.log2(r + 1)) for r in range(1, 11)
)
#: Prefix sums of the discounts: _NDCG_PREFIX[j-1] = ideal DCG (x 1e9)
#: of j relevant docs in the top-j positions.
_NDCG_PREFIX = tuple(itertools.accumulate(_NDCG_DISC))

_NDCG_KS = (1, 5, 10)


def _ndcg_oracle() -> str:
    from .llm_pipeline import _KNN_ORACLE

    disc_rows = ", ".join(
        f"({r + 1}, {d})" for r, d in enumerate(_NDCG_DISC)
    )
    prefix_list = ", ".join(str(p) for p in _NDCG_PREFIX)
    ks = ", ".join(str(k) for k in _NDCG_KS)
    return f"""
WITH topk AS MATERIALIZED ({_KNN_ORACLE}),
q AS (SELECT label AS qlabel FROM embeddings WHERE vec_id = 0),
nrel AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rel
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> 0 AND e.label = q.qlabel
),
ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY t.cos_sim DESC, t.vec_id ASC)
           AS rnk,
         CASE WHEN l.label = q.qlabel THEN 1 ELSE 0 END AS rel
  FROM topk t
  JOIN embeddings l ON t.vec_id = l.vec_id
  CROSS JOIN q
),
disc(rnk, disc) AS (VALUES {disc_rows}),
grid AS (SELECT unnest([{ks}]) AS k)
SELECT CAST(g.k AS BIGINT) AS k,
       n_rel,
       CAST(COALESCE(SUM(r.rel), 0) AS BIGINT) AS n_rel_topk,
       CAST(COALESCE(SUM(r.rel * d.disc), 0) AS BIGINT) AS dcg_q,
       CAST(CASE WHEN least(g.k, n_rel) = 0 THEN 0
            ELSE ([{prefix_list}])[least(g.k, CAST(n_rel AS INTEGER))]
            END AS BIGINT) AS idcg_q,
       CASE WHEN least(g.k, n_rel) = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(COALESCE(SUM(r.rel * d.disc), 0) AS DOUBLE)
                 / CAST(([{prefix_list}])[least(g.k,
                        CAST(n_rel AS INTEGER))] AS DOUBLE)
       END AS ndcg
FROM grid g
CROSS JOIN nrel
LEFT JOIN ranked r ON r.rnk <= g.k
LEFT JOIN disc d ON d.rnk = r.rnk
GROUP BY g.k, n_rel
"""


_NDCG_ORACLE = _ndcg_oracle()


@query("ext_ndcg_eval", oracle=_NDCG_ORACLE, tier=3)
def ext_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{1,5,10} of the exact-cosine retrieval (ext_knn_cosine's
    top-10) with binary label relevance — the graded-ranking quality
    metric every retrieval/reranking pipeline reports next to recall
    (ext_ann_recall_curve): a hit at rank 1 is worth 1/log2(2), at rank
    10 only 1/log2(11), so NDCG rewards putting the right neighbors
    FIRST. Relevance = candidate label equals the query vector's label;
    ideal DCG caps at min(k, corpus positives) per the standard
    definition.

    Exactness: rank discounts are round(1e9/log2(r+1)) INTEGERS baked
    as literals into both engine texts from one Python computation (no
    cross-engine libm log2 surface); DCG/IDCG are exact integer sums of
    those literals; NDCG is one IEEE division of two exact integers.

    Shape: consumes the knn helper's broadcast-query + map-side cosine
    + TakeOrdered plan; ranking is a window over the 10-row result;
    relevance labels arrive via one 10-row join; the k-grid expansion
    and folds are O(1)-row (EXPECTED_FLAGS: model-sized global window +
    1-row folds, the ext_ann_recall_curve pattern)."""
    from ..session import scoped_persist
    from .llm_pipeline import ext_knn_cosine

    e = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("label").alias("qlabel")
    )
    nrel = (
        e.crossJoin(F.broadcast(q))
        .filter((F.col("vec_id") != 0) & (F.col("label") == F.col("qlabel")))
        .agg(F.count(F.lit(1)).alias("n_rel"))
    )
    w = W.orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    ranked = scoped_persist(
        ext_knn_cosine(spark, sf_dir)
        .join(e, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            F.row_number().over(w).alias("rnk"),
            (F.col("label") == F.col("qlabel")).cast("int").alias("rel"),
        )
    )
    disc = spark.createDataFrame(
        [(r + 1, d) for r, d in enumerate(_NDCG_DISC)], "rnk int, disc long"
    )
    prefix_arr = F.array(*[F.lit(p) for p in _NDCG_PREFIX])
    grid = spark.createDataFrame([(k,) for k in _NDCG_KS], "k long")
    m = F.least(F.col("k"), F.col("n_rel")).cast("int")
    idcg = F.when(m == 0, F.lit(0).cast("long")).otherwise(
        F.element_at(prefix_arr, m)
    )
    return (
        grid.crossJoin(F.broadcast(nrel))
        .join(F.broadcast(ranked), F.col("rnk") <= F.col("k"), "left")
        .join(F.broadcast(disc), "rnk", "left")
        .groupBy("k", "n_rel")
        .agg(
            F.coalesce(F.sum("rel"), F.lit(0)).alias("n_rel_topk"),
            F.coalesce(F.sum(F.col("rel") * F.col("disc")), F.lit(0))
            .alias("dcg_q"),
        )
        .select(
            "k",
            "n_rel",
            "n_rel_topk",
            "dcg_q",
            idcg.alias("idcg_q"),
            F.when(m == 0, F.lit(0.0))
            .otherwise(
                F.col("dcg_q").cast("double")
                / F.element_at(prefix_arr, m).cast("double")
            )
            .alias("ndcg"),
        )
    )


# --- ext_avg_precision --------------------------------------------------------

_AP_KS = (1, 5, 10)


def _ap_oracle() -> str:
    from .llm_pipeline import _KNN_ORACLE

    ks = ", ".join(str(k) for k in _AP_KS)
    return f"""
WITH topk AS MATERIALIZED ({_KNN_ORACLE}),
q AS (SELECT label AS qlabel FROM embeddings WHERE vec_id = 0),
nrel AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rel
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> 0 AND e.label = q.qlabel
),
ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY t.cos_sim DESC, t.vec_id ASC)
           AS rnk,
         CASE WHEN l.label = q.qlabel THEN 1 ELSE 0 END AS rel
  FROM topk t
  JOIN embeddings l ON t.vec_id = l.vec_id
  CROSS JOIN q
),
c AS (
  SELECT rnk, rel,
         CAST(SUM(rel) OVER (ORDER BY rnk
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_rel
  FROM ranked
),
grid AS (SELECT unnest([{ks}]) AS k)
SELECT CAST(g.k AS BIGINT) AS k,
       n_rel,
       CAST(COALESCE(MAX(CASE WHEN c.rnk = g.k THEN c.cum_rel END), 0)
            AS BIGINT) AS n_hits,
       CASE WHEN least(g.k, n_rel) = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(COALESCE(SUM(CASE WHEN c.rel = 1
                       THEN c.cum_rel * 1000000000 // c.rnk
                       ELSE 0 END), 0) AS DOUBLE)
                 / (CAST(least(g.k, n_rel) AS DOUBLE) * 1e9)
       END AS avg_precision,
       CAST(COALESCE(MAX(CASE WHEN c.rnk = g.k THEN c.cum_rel END), 0)
            AS DOUBLE) / CAST(g.k AS DOUBLE) AS precision_at_k,
       CASE WHEN n_rel = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(COALESCE(MAX(CASE WHEN c.rnk = g.k
                      THEN c.cum_rel END), 0) AS DOUBLE)
                 / CAST(n_rel AS DOUBLE)
       END AS recall_at_k
FROM grid g
CROSS JOIN nrel
LEFT JOIN c ON c.rnk <= g.k
GROUP BY g.k, n_rel
"""


_AP_ORACLE = _ap_oracle()


@query("ext_avg_precision", oracle=_AP_ORACLE, tier=3)
def ext_avg_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision @ {1,5,10} (plus precision@k / recall@k) for
    the exact-cosine retrieval with binary label relevance — the
    area-under-PR-curve companion to ext_ndcg_eval (NDCG reads graded
    position value, AP reads precision AT each relevant hit), the pair
    every retrieval eval harness reports. AP@k = sum over relevant
    ranks r <= k of precision@r, normalized by min(k, corpus
    positives).

    Exactness: precision@r is quantized as the exact integer
    cum_rel * 1e9 DIV r (positive integer floor division — identical in
    both engines), summed exactly; AP is one IEEE division by the exact
    integer cap x 1e9; precision/recall@k are single divisions of exact
    integers.

    Shape: identical to ext_ndcg_eval — the knn helper's plan, a 10-row
    rank window, O(1)-row grid joins and folds (EXPECTED_FLAGS:
    model-sized global window + 1-row folds)."""
    from ..session import scoped_persist
    from .llm_pipeline import ext_knn_cosine

    e = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("label").alias("qlabel")
    )
    nrel = (
        e.crossJoin(F.broadcast(q))
        .filter((F.col("vec_id") != 0) & (F.col("label") == F.col("qlabel")))
        .agg(F.count(F.lit(1)).alias("n_rel"))
    )
    w = W.orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    cum = scoped_persist(
        ext_knn_cosine(spark, sf_dir)
        .join(e, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            F.row_number().over(w).alias("rnk"),
            (F.col("label") == F.col("qlabel")).cast("int").alias("rel"),
        )
        .select(
            "rnk",
            "rel",
            F.sum("rel")
            .over(
                W.orderBy("rnk").rowsBetween(
                    W.unboundedPreceding, W.currentRow
                )
            )
            .alias("_cum_pre"),
        )
        .select(
            "rnk", "rel", F.col("_cum_pre").cast("long").alias("cum_rel")
        )
    )
    grid = spark.createDataFrame([(k,) for k in _AP_KS], "k long")
    cap = F.least(F.col("k"), F.col("n_rel"))
    hits = F.coalesce(
        F.max(F.when(F.col("rnk") == F.col("k"), F.col("cum_rel"))),
        F.lit(0),
    )
    ap_num = F.coalesce(
        F.sum(
            F.when(
                F.col("rel") == 1,
                F.expr("cum_rel * 1000000000 DIV rnk"),
            ).otherwise(F.lit(0))
        ),
        F.lit(0),
    )
    return (
        grid.crossJoin(F.broadcast(nrel))
        .join(F.broadcast(cum), F.col("rnk") <= F.col("k"), "left")
        .groupBy("k", "n_rel")
        .agg(
            hits.alias("n_hits"),
            ap_num.alias("_ap_num"),
        )
        .select(
            "k",
            "n_rel",
            "n_hits",
            F.when(cap == 0, F.lit(0.0))
            .otherwise(
                F.col("_ap_num").cast("double")
                / (cap.cast("double") * F.lit(1e9))
            )
            .alias("avg_precision"),
            (F.col("n_hits").cast("double") / F.col("k").cast("double"))
            .alias("precision_at_k"),
            F.when(F.col("n_rel") == 0, F.lit(0.0))
            .otherwise(
                F.col("n_hits").cast("double")
                / F.col("n_rel").cast("double")
            )
            .alias("recall_at_k"),
        )
    )


# --- ext_mcnemar_test ---------------------------------------------------------

def _mcnemar_oracle() -> str:
    from .text_analysis import _LANG_ID_ORACLE

    return f"""
WITH lid AS MATERIALIZED ({_LANG_ID_ORACLE}),
cls AS ({_SCORED_SQL}),
j AS (
  SELECT c.doc_id, c.y,
         CASE WHEN c.w_sum > 0 THEN 1 ELSE 0 END AS pred_a,
         CASE WHEN l.pred_lang = 'en' THEN 1 ELSE 0 END AS pred_b
  FROM cls c JOIN lid l ON c.doc_id = l.doc_id
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN pred_a = y AND pred_b = y
                  THEN 1 ELSE 0 END) AS BIGINT) AS both_right,
         CAST(SUM(CASE WHEN pred_a <> y AND pred_b <> y
                  THEN 1 ELSE 0 END) AS BIGINT) AS both_wrong,
         CAST(SUM(CASE WHEN pred_a = y AND pred_b <> y
                  THEN 1 ELSE 0 END) AS BIGINT) AS only_a,
         CAST(SUM(CASE WHEN pred_a <> y AND pred_b = y
                  THEN 1 ELSE 0 END) AS BIGINT) AS only_b
  FROM j
)
SELECT n, both_right, both_wrong, only_a, only_b,
       CASE WHEN only_a + only_b = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(greatest(abs(only_a - only_b) - 1, 0)
                      * greatest(abs(only_a - only_b) - 1, 0) AS DOUBLE)
                 / CAST(only_a + only_b AS DOUBLE)
       END AS mcnemar_chi2
FROM m
"""


_MCNEMAR_ORACLE = _mcnemar_oracle()


@query("ext_mcnemar_test", oracle=_MCNEMAR_ORACLE, tier=3)
def ext_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test between the two English detectors the repo
    ships — the hashed linear quality classifier (pred = w_sum > 0, the
    ext_confusion_matrix pairing) and the n-gram language identifier
    (pred = lang_id picks 'en') — on the shared gold label lang = 'en'.
    This is THE statistic for "is classifier A actually better than B
    on the same data": accuracy deltas mislead when both models err on
    the same rows, while McNemar reads only the DISCORDANT pairs
    (only_a / only_b), with the continuity-corrected chi-square
    (|b - c| - 1)^2 / (b + c), clamped at zero.

    Exactness: both predictions and the gold label are integer
    decisions; the 2x2 discordance cells are exact counts; the
    statistic is one IEEE division of exact integers (0 when no
    discordant pairs exist).

    Shape: the two classifier helpers' plans (each scan -> explode ->
    doc-keyed aggregate), one doc-keyed equi-join between their per-doc
    frames, then a single 1-row counting fold (EXPECTED_FLAGS; the
    cells are O(1), never docs). At 100 TB both helper aggregates and
    the join key on doc_id — co-partitioned, no extra exchange beyond
    the helpers' own."""
    lab = load(spark, sf_dir, "documents").select(
        "doc_id", (F.col("lang") == "en").cast("int").alias("y")
    )
    a = (
        ext_quality_classifier(spark, sf_dir)
        .select("doc_id", (F.col("w_sum") > 0).cast("int").alias("pred_a"))
    )
    b = ext_lang_id(spark, sf_dir).select(
        "doc_id", (F.col("pred_lang") == "en").cast("int").alias("pred_b")
    )
    j = a.join(b, "doc_id").join(lab, "doc_id")
    m = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            ((F.col("pred_a") == F.col("y")) & (F.col("pred_b") == F.col("y")))
            .cast("int")
        ).alias("both_right"),
        F.sum(
            ((F.col("pred_a") != F.col("y")) & (F.col("pred_b") != F.col("y")))
            .cast("int")
        ).alias("both_wrong"),
        F.sum(
            ((F.col("pred_a") == F.col("y")) & (F.col("pred_b") != F.col("y")))
            .cast("int")
        ).alias("only_a"),
        F.sum(
            ((F.col("pred_a") != F.col("y")) & (F.col("pred_b") == F.col("y")))
            .cast("int")
        ).alias("only_b"),
    )
    d = F.greatest(
        F.abs(F.col("only_a") - F.col("only_b")) - 1, F.lit(0)
    )
    return m.select(
        "n",
        "both_right",
        "both_wrong",
        "only_a",
        "only_b",
        F.when(F.col("only_a") + F.col("only_b") == 0, F.lit(0.0))
        .otherwise(
            (d * d).cast("double")
            / (F.col("only_a") + F.col("only_b")).cast("double")
        )
        .alias("mcnemar_chi2"),
    )


# --- ext_mrr_eval ---------------------------------------------------------------

#: Reciprocal-rank integers round(1e9 / r) for ranks 1..3 (the knn-graph
#: k), computed ONCE in Python and baked as literals into BOTH engine
#: texts — the _NDCG_DISC stance: no cross-engine float-division-then-
#: round surface, every per-query contribution is an exact BIGINT.
_MRR_RECIP = tuple(round(1e9 / r) for r in range(1, 4))


def _mrr_oracle() -> str:
    from .ann import _KNNG_ORACLE

    case = " ".join(
        f"WHEN {r + 1} THEN {v}" for r, v in enumerate(_MRR_RECIP)
    )
    return f"""
WITH knng AS MATERIALIZED ({_KNNG_ORACLE}),
fr AS (
  SELECT vec_id, CAST(MIN(rnk) AS BIGINT) AS first_rel
  FROM knng WHERE same_label = 1 GROUP BY vec_id
),
per_q AS (
  SELECT CAST(e.label AS BIGINT) AS label,
         CASE f.first_rel {case} ELSE 0 END AS rr_scaled
  FROM embeddings e LEFT JOIN fr f ON e.vec_id = f.vec_id
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(SUM(CASE WHEN rr_scaled > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hit,
       CAST(SUM(rr_scaled) AS BIGINT) AS sum_rr_scaled,
       CAST(SUM(rr_scaled) AS DOUBLE)
         / (CAST(COUNT(*) AS DOUBLE) * 1e9) AS mrr_at_3,
       CAST(SUM(CASE WHEN rr_scaled > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS hit_rate_at_3
FROM per_q GROUP BY label
"""


_MRR_ORACLE = _mrr_oracle()


@query("ext_mrr_eval", oracle=_MRR_ORACLE, tier=3)
def ext_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank @3 of the corpus-wide exact-cosine retrieval
    (every vector queries its ext_knn_graph top-3; relevance = neighbor
    shares the query's label) — the first-hit metric every retrieval /
    RAG pipeline reports next to NDCG (position-weighted) and recall
    (coverage): MRR reads "how far down does a user scan before the
    first right answer", per label class, with the hit rate (any
    relevant in top-3) alongside. Unlike ext_ndcg_eval's single-anchor
    read this is a TRUE mean over all n queries, so per-class retrieval
    asymmetries (a label whose members sit in another class's
    neighborhood) are visible.

    Exactness: reciprocals are round(1e9/r) INTEGERS baked as literals
    into both engine texts from one Python computation (the _NDCG_DISC
    stance); per-query contributions and class sums are exact BIGINT;
    MRR and hit rate are one shared-text IEEE division each.

    Shape: the knn-graph helper's tiled pairwise scan (its key
    documents the 100 TB blocked form), then ONE vec-keyed filter-
    aggregate of the O(n*k) edge frame, a vec-keyed left join back to
    the label frame, and ONE label-keyed rollup — everything after the
    helper is co-partitioned on vec_id and output-bounded by the label
    arity."""
    from .ann import ext_knn_graph

    fr = (
        ext_knn_graph(spark, sf_dir)
        .filter(F.col("same_label") == 1)
        .groupBy("vec_id")
        .agg(F.min("rnk").cast("long").alias("first_rel"))
    )
    rr = F.coalesce(
        F.when(F.col("first_rel") == 1, F.lit(_MRR_RECIP[0]))
        .when(F.col("first_rel") == 2, F.lit(_MRR_RECIP[1]))
        .when(F.col("first_rel") == 3, F.lit(_MRR_RECIP[2])),
        F.lit(0),
    ).cast("long")
    per_q = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("label").cast("long").alias("label"))
        .join(fr, "vec_id", "left")
        .select("label", rr.alias("rr_scaled"))
    )
    return per_q.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum((F.col("rr_scaled") > 0).cast("int"))
        .cast("long")
        .alias("n_hit"),
        F.sum("rr_scaled").alias("sum_rr_scaled"),
        (
            F.sum("rr_scaled").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(1e9))
        ).alias("mrr_at_3"),
        (
            F.sum((F.col("rr_scaled") > 0).cast("int")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("hit_rate_at_3"),
    )


# --- ext_lift_gain --------------------------------------------------------------

#: Decile count for the gains table (the marketing/filter-ops standard).
_LIFT_N_BINS = 10

_LIFT_ORACLE = f"""
WITH scored AS ({_SCORED_SQL}),
rk AS (
  SELECT y,
         ROW_NUMBER() OVER (ORDER BY w_sum DESC, doc_id ASC) AS rn,
         COUNT(*) OVER () AS n
  FROM scored
),
d AS (
  SELECT CAST(({_LIFT_N_BINS} * (rn - 1)) // n AS BIGINT) AS decile,
         y, n
  FROM rk
),
g AS (
  SELECT decile,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(ANY_VALUE(n) AS BIGINT) AS total_n
  FROM d GROUP BY decile
)
SELECT decile, n_rows, n_pos,
       CAST(SUM(n_rows) OVER w AS BIGINT) AS cum_n,
       CAST(SUM(n_pos) OVER w AS BIGINT) AS cum_pos,
       CAST(SUM(n_pos) OVER () AS BIGINT) AS total_pos,
       CAST(SUM(n_pos) OVER w AS DOUBLE)
         / CAST(SUM(n_pos) OVER () AS DOUBLE) AS cum_gain,
       CAST(SUM(n_pos) OVER w * total_n AS DOUBLE)
         / CAST(SUM(n_rows) OVER w * SUM(n_pos) OVER () AS DOUBLE)
         AS cum_lift
FROM g
WINDOW w AS (ORDER BY decile ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@query("ext_lift_gain", oracle=_LIFT_ORACLE, tier=3)
def ext_lift_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table of the quality classifier's ranking
    (the decile view every campaign-targeting and filter-ops review
    reads next to AUC): rank all docs by the integer classifier score,
    cut into 10 equal-frequency deciles, and report per decile the
    cumulative share of positives captured (gain) and the capture rate
    relative to random targeting (lift — decile-1 lift near 1/base-rate
    means the classifier front-loads essentially all positives).
    Completes the threshold-free audit family: ext_auc_rank integrates
    this curve to one number, this emits the operating table a human
    picks a cutoff from.

    Exactness: scores are the classifier's integer weight sums and the
    rank order is the total (w_sum DESC, doc_id ASC); decile membership
    is exact integer floor division (the ext_quantile_bin_features
    form, bins differ by at most one row); counts, cumulative sums, and
    cross products are exact BIGINT; gain and lift are one shared-text
    IEEE division each over exact integers.

    Shape: the classifier's scan -> explode -> doc-keyed aggregate,
    then a global rank window (the ext_auc_rank stance: at 100 TB the
    swap is the two-pass bucketed rank — range-partition by score,
    per-partition ranks + broadcast offsets — documented, not needed at
    fixture scale; EXPECTED_FLAGS), ONE 10-group aggregate with
    map-side combine, and 10-row window folds."""
    lab = load(spark, sf_dir, "documents").select(
        "doc_id", (F.col("lang") == "en").cast("int").alias("y")
    )
    scored = (
        ext_quality_classifier(spark, sf_dir)
        .select("doc_id", "w_sum")
        .join(lab, "doc_id")
    )
    rk = scored.select(
        "y",
        F.row_number()
        .over(W.orderBy(F.desc("w_sum"), F.asc("doc_id")))
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    g = (
        rk.select(
            "y",
            "n",
            F.expr(
                f"CAST(({_LIFT_N_BINS} * (rn - 1)) DIV n AS BIGINT)"
            ).alias("decile"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("y").cast("long").alias("n_pos"),
            F.any_value(F.col("n")).cast("long").alias("total_n"),
        )
    )
    w = W.orderBy(F.asc("decile")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wall = W.partitionBy()
    cum_n = F.sum("n_rows").over(w)
    cum_pos = F.sum("n_pos").over(w)
    total_pos = F.sum("n_pos").over(wall)
    return g.select(
        "decile",
        "n_rows",
        "n_pos",
        cum_n.alias("cum_n"),
        cum_pos.alias("cum_pos"),
        total_pos.alias("total_pos"),
        (cum_pos.cast("double") / total_pos.cast("double")).alias(
            "cum_gain"
        ),
        (
            (cum_pos * F.col("total_n")).cast("double")
            / (cum_n * total_pos).cast("double")
        ).alias("cum_lift"),
    )
