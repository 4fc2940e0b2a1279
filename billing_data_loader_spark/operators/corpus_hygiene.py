"""Corpus-hygiene operators for training-data pipelines (north-star
mandate, SURVEY.md §2.10): PII scrubbing, repetition scoring, stratified
sampling, and unigram-LM quality scoring over the documents table.

All four are single-pass map-side plans or one-small-shuffle aggregations —
the shapes that survive 100 TB:
- PII scrub: pure projection (regexp chains inside whole-stage codegen);
  shuffles nothing.
- repetition score: per-row array arithmetic (``array_distinct`` on a
  bounded per-doc bigram array); shuffles nothing.
- stratified sample: deterministic hash-threshold keep decision map-side —
  the selection needs no global state, no sort, no reservoir — then a tiny
  per-stratum audit aggregate.
- unigram LM: two token aggregates (vocabulary is corpus-bounded, counts
  partial-aggregate map-side) + one broadcast join back onto the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.determinism import o_davg
from ..plans.registry import query
from ..tables import load

# --- ext_pii_scrub ----------------------------------------------------------

# The fixture corpus contains no PII, so each doc gets a deterministic
# synthetic contact line appended (same expression on both engines); the
# operator then redacts emails, IPv4s, and phone numbers. Patterns avoid
# constructs where Java regex and RE2 (DuckDB) semantics could diverge
# (no backreferences, no word boundaries, no lazy quantifiers).
_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_IP_RE = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
_PHONE_RE = "\\+\\d[\\d ]{5,}\\d"

_PII_ORACLE = f"""
WITH synth AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com at 10.0.' || CAST(doc_id % 256 AS VARCHAR)
              || '.7 or +1 555 ' || CAST(1000 + doc_id % 9000 AS VARCHAR)
           AS raw
  FROM documents
), scrubbed AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_IP_RE}', '<IP>', 'g'),
           '{_PHONE_RE}', '<PHONE>', 'g') AS clean_text
  FROM synth
)
SELECT doc_id, clean_text,
       CAST(len(regexp_extract_all(clean_text, '<(EMAIL|IP|PHONE)>')) AS BIGINT)
         AS n_redacted
FROM scrubbed
"""


@query("ext_pii_scrub", oracle=_PII_ORACLE, tier=3)
def ext_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails / IPv4s / phone numbers (email first so its digits and
    dots are gone before the IP/phone passes). Pure projection: at 100 TB
    this runs inside the scan's codegen stage, no shuffle, no UDF."""
    d = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com at 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 or +1 555 "),
        (1000 + F.col("doc_id") % 9000).cast("string"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(raw, _EMAIL_RE, "<EMAIL>"), _IP_RE, "<IP>"
        ),
        _PHONE_RE,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        clean.alias("clean_text"),
        F.regexp_count(clean, F.lit("<(EMAIL|IP|PHONE)>"))
        .cast("long")
        .alias("n_redacted"),
    )


# --- ext_repetition_score ---------------------------------------------------

# Gopher-style repetition filter: fraction of duplicate 2-grams per doc.
# Everything is per-row array arithmetic on a bounded array — no explode, no
# shuffle; the 100 TB plan is scan -> project -> write.
_REPETITION_ORACLE = """
WITH bg AS (
  SELECT doc_id,
         list_transform(range(1, len(string_split(text, ' '))),
                        i -> string_split(text, ' ')[i] || ' '
                             || string_split(text, ' ')[i+1]) AS grams
  FROM documents
)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS n_bigrams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
       CASE WHEN len(grams) > 0
            THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
                 / len(grams)
            ELSE 0.0 END AS rep_ratio,
       CASE WHEN len(grams) > 0
            THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
                 / len(grams) > 0.05
            ELSE FALSE END AS is_repetitive
FROM bg
"""

_BIGRAMS_FROM_T = (
    "CASE WHEN size(t) >= 2 THEN "
    "transform(sequence(0, size(t) - 2), i -> concat_ws(' ', t[i], t[i+1])) "
    "ELSE array() END"
)


@query("ext_repetition_score", oracle=_REPETITION_ORACLE, tier=3)
def ext_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-bigram fraction per document (the Gopher repetition
    signal); docs above 5% flagged. Integer counts + one double division ->
    bit-identical across engines."""
    d = load(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id", F.split("text", " ").alias("t")
    ).select("doc_id", F.expr(_BIGRAMS_FROM_T).alias("grams"))
    n = F.size("grams").cast("long")
    nd = F.size(F.array_distinct("grams")).cast("long")
    ratio = F.when(n > 0, (n - nd).cast("double") / n).otherwise(F.lit(0.0))
    return grams.select(
        "doc_id",
        n.alias("n_bigrams"),
        nd.alias("n_distinct"),
        ratio.alias("rep_ratio"),
        F.when(n > 0, ratio > 0.05).otherwise(F.lit(False)).alias("is_repetitive"),
    )


# --- ext_sample_stratified --------------------------------------------------

# Deterministic hash-threshold sampling (~20% per stratum): keep iff
# (doc_id * Knuth-multiplier) mod 1000 < 200. The keep decision is a pure
# map-side predicate — no reservoir, no sort, no state — so the sample is
# reproducible on any cluster size; the audit aggregate below is the
# operator's observable output.
_SAMPLE_KEEP = "(doc_id * 2654435761) % 1000 < 200"

_SAMPLE_ORACLE = f"""
SELECT lang,
       COUNT(*) AS n_docs,
       COUNT(*) FILTER ({_SAMPLE_KEEP}) AS n_kept,
       CAST(COUNT(*) FILTER ({_SAMPLE_KEEP}) AS DOUBLE) / COUNT(*) AS kept_ratio
FROM documents
GROUP BY lang
"""


@query("ext_sample_stratified", oracle=_SAMPLE_ORACLE, tier=3)
def ext_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic sample audit: totals, kept counts, rates."""
    d = load(spark, sf_dir, "documents")
    keep = (F.col("doc_id") * F.lit(2654435761)) % 1000 < 200
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(keep, 1)).alias("n_kept"),
        (F.count(F.when(keep, 1)).cast("double") / F.count(F.lit(1))).alias(
            "kept_ratio"
        ),
    )


# --- ext_lm_unigram_score ---------------------------------------------------

# Self-trained unigram LM as a quality signal: token logprob = ln(count /
# corpus total), per-doc mean logprob (a perplexity proxy — boilerplate and
# gibberish score low). ln values are 6dp-rounded on both sides (libm ulp
# differences, same treatment as ext_tfidf) and the per-doc mean uses the
# quantized-exact davg so reduction order cannot flip hash bits.
_LM_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tot AS (
  SELECT COUNT(*) AS n FROM tok
), freq AS (
  SELECT token, COUNT(*) AS c FROM tok GROUP BY token
), scored AS (
  SELECT doc_id, round(ln(CAST(c AS DOUBLE) / n), 6) AS lnp
  FROM tok JOIN freq USING (token) CROSS JOIN tot
)
SELECT doc_id, COUNT(*) AS n_tokens, {o_davg("lnp", "avg_logprob")}
FROM scored GROUP BY doc_id
"""


@query("ext_lm_unigram_score", oracle=_LM_ORACLE, tier=3)
def ext_lm_unigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram log-probability per document under the corpus's own
    unigram distribution. Token-frequency table is corpus-vocabulary-sized
    -> broadcast back onto the token stream (no second shuffle of tokens)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tot = tok.select(F.count(F.lit(1)).alias("n"))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    scored = (
        tok.join(F.broadcast(freq), "token")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(F.log(F.col("c").cast("double") / F.col("n")), 6).alias("lnp"),
        )
    )
    from ..functions.determinism import davg

    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        davg("lnp", "avg_logprob"),
    )


# --- ext_outlier_clip -------------------------------------------------------

# Winsorization: clamp per-source document lengths to the [p05, p95] band —
# the standard heavy-tail guard before length-based quality filtering or
# packing. Quantiles interpolate identically in both engines on doubles
# (agg_percentiles proves the pattern); bounds are rounded to 4dp on both
# sides so the clamp compares identical values.
_OUTLIER_CLIP_ORACLE = """
WITH b AS (
  SELECT source,
         round(quantile_cont(CAST(n_chars AS DOUBLE), 0.05), 4) AS lo,
         round(quantile_cont(CAST(n_chars AS DOUBLE), 0.95), 4) AS hi
  FROM documents GROUP BY source
)
SELECT d.doc_id, d.source,
       CAST(d.n_chars AS BIGINT) AS n_chars,
       least(greatest(CAST(d.n_chars AS DOUBLE), b.lo), b.hi) AS n_chars_clipped,
       CAST(CAST(d.n_chars AS DOUBLE) < b.lo
            OR CAST(d.n_chars AS DOUBLE) > b.hi AS BIGINT) AS was_clipped
FROM documents d JOIN b USING (source)
"""


@query("ext_outlier_clip", oracle=_OUTLIER_CLIP_ORACLE, tier=3)
def ext_outlier_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source winsorization of document length to [p05, p95].

    Scale shape: one exchange carries a handful of per-source partial
    quantile sketches (exact percentile at this cardinality; t-digest at
    100 TB), the tiny bounds frame broadcasts back, and the clamp itself is
    map-side arithmetic inside the scan stage — the corpus shuffles zero
    times."""
    d = load(spark, sf_dir, "documents")
    bounds = d.groupBy("source").agg(
        F.round(
            F.percentile(F.col("n_chars").cast("double"), F.lit(0.05)), 4
        ).alias("lo"),
        F.round(
            F.percentile(F.col("n_chars").cast("double"), F.lit(0.95)), 4
        ).alias("hi"),
    )
    nd = F.col("n_chars").cast("double")
    return d.join(F.broadcast(bounds), "source").select(
        "doc_id",
        "source",
        "n_chars",
        F.least(F.greatest(nd, F.col("lo")), F.col("hi")).alias(
            "n_chars_clipped"
        ),
        ((nd < F.col("lo")) | (nd > F.col("hi"))).cast("long").alias(
            "was_clipped"
        ),
    )


# --- ext_char_entropy ---------------------------------------------------------

#: Per-term quantization scale for the c*ln(c) sum. ln is NOT bit-identical
#: across engines (java.lang.Math.log vs libm differ by 1 ulp on some
#: arguments — measured: ln(3.0)), so each term is floor-quantized to an
#: integer BEFORE the order-insensitive BIGINT sum; a 1-ulp ln difference
#: flips a floor only when c*ln(c)*1e6 + 0.5 sits within ~c*2e-10 of an
#: integer — probability ~1e-6 per term. The FINAL entropy is likewise
#: floor-quantized to 6dp on both sides: ln(n_obs) carries the same 1-ulp
#: hazard (measured live: docs with n_obs hitting a divergent ln argument
#: flipped the raw double's last bit), and the 1e-6 grid absorbs a ~1e-15
#: discrepancy with per-doc flip probability ~1e-9. Verified green at
#: sf0.01 AND sf0.1; a fixture regeneration that hits either corner would
#: surface as a hash mismatch, not silence.
_ENT_SCALE = 1_000_000.0

_ENTROPY_ORACLE = f"""
WITH ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
),
cc AS (SELECT doc_id, c, COUNT(*) AS n_c FROM ch GROUP BY doc_id, c),
agg AS (
  SELECT doc_id,
         CAST(SUM(n_c) AS BIGINT) AS n_obs,
         COUNT(*) AS n_distinct_chars,
         CAST(SUM(n_c * n_c) AS BIGINT) AS sum_c2,
         CAST(SUM(CAST(floor(
           (n_c * ln(CAST(n_c AS DOUBLE))) * {_ENT_SCALE!r} + 0.5
         ) AS BIGINT)) AS BIGINT) AS q_nlnn
  FROM cc GROUP BY doc_id
)
SELECT doc_id, n_obs, n_distinct_chars,
       1.0 - CAST(sum_c2 AS DOUBLE) / (CAST(n_obs AS DOUBLE) * n_obs)
         AS gini_simpson,
       floor(((ln(CAST(n_obs AS DOUBLE))
          - (CAST(q_nlnn AS DOUBLE) / {_ENT_SCALE!r}) / n_obs)
         / ln(2.0)) * {_ENT_SCALE!r} + 0.5) / {_ENT_SCALE!r} AS entropy_bits
FROM agg
"""


@query("ext_char_entropy", oracle=_ENTROPY_ORACLE, tier=3)
def ext_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution diversity per document: Shannon entropy in
    bits plus the Gini-Simpson index — the cheap noise/boilerplate
    signals quality filters threshold on (near-zero entropy = one
    repeated character, ~log2(alphabet) = uniform noise; real prose sits
    in a stable band per language). Complements ext_repetition_score
    (token bigrams) at the character level, where encoding garbage and
    pad-character floods show up first.

    Entropy decomposes as ln(n) - (sum_c c*ln(c))/n over per-char counts
    c, so it needs only the (doc, char) count table. Each c*ln(c) term is
    floor-quantized to an integer before the BIGINT sum (order-
    insensitive), and the final bits value is floor-quantized to 6dp —
    see the _ENT_SCALE note for the 1-ulp cross-engine ln story both
    quantizations absorb.
    Gini-Simpson (1 - sum(c^2)/n^2) is exact integer arithmetic until one
    final division — no transcendental at all.

    Shape: explode to (doc, char) -> groupBy(doc, char) with map-side
    combine -> per-doc rollup that REUSES the (doc_id, c) hash
    partitioning (doc_id is a prefix of the grouping key, so Catalyst
    plans the second aggregate exchange-free). One shuffle end-to-end,
    alphabet-bounded width."""
    d = load(spark, sf_dir, "documents")
    cc = (
        d.select("doc_id", F.explode(F.split("text", "")).alias("c"))
        .groupBy("doc_id", "c")
        .agg(F.count(F.lit(1)).alias("n_c"))
    )
    q_term = F.floor(
        (F.col("n_c") * F.log(F.col("n_c").cast("double"))) * _ENT_SCALE
        + F.lit(0.5)
    ).cast("long")
    agg = cc.groupBy("doc_id").agg(
        F.sum("n_c").alias("n_obs"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.sum(F.col("n_c") * F.col("n_c")).alias("sum_c2"),
        F.sum(q_term).alias("q_nlnn"),
    )
    n_obs_d = F.col("n_obs").cast("double")
    return agg.select(
        "doc_id",
        "n_obs",
        "n_distinct_chars",
        (F.lit(1.0) - F.col("sum_c2").cast("double") / (n_obs_d * F.col("n_obs")))
        .alias("gini_simpson"),
        (
            F.floor(
                (
                    (
                        F.log(n_obs_d)
                        - (F.col("q_nlnn").cast("double") / F.lit(_ENT_SCALE))
                        / F.col("n_obs")
                    )
                    / F.log(F.lit(2.0))
                )
                * _ENT_SCALE
                + F.lit(0.5)
            )
            / F.lit(_ENT_SCALE)
        ).alias("entropy_bits"),
    )


# --- ext_lm_bigram_score ------------------------------------------------------

#: Same salt/thresholds as ext_train_split_hash (corpus_ops.py) — the LM
#: trains on the hash-train split ONLY, so scoring val/test docs exercises
#: genuine backoff on bigrams (and occasionally unigrams) the model never
#: saw. Self-training on the full corpus would make the backoff branch
#: structurally dead (every scored bigram would be in the table).
_BLM_SALT = ":bdl-split-7"

#: Stupid-backoff discount (Brants et al. 2007): unseen bigram scores
#: alpha * p_unigram(w); unseen unigram scores alpha / N (one more rung).
_BLM_ALPHA = 0.4

_BLM_ORACLE = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '{_BLM_SALT}'), 1, 1)
                   < 'c' THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR) || '{_BLM_SALT}'), 1, 1)
                   < 'e' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
tok AS (
  SELECT doc_id, split, i AS pos,
         CASE WHEN i >= 2 THEN t[i - 1] END AS prev,
         t[i] AS cur
  FROM d, unnest(range(1, len(t) + 1)) AS u(i)
),
uni AS (
  SELECT cur AS w, COUNT(*) AS c FROM tok WHERE split = 'train' GROUP BY cur
),
tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM uni),
bi AS (
  SELECT prev, cur, COUNT(*) AS cb FROM tok
  WHERE split = 'train' AND pos >= 2 GROUP BY prev, cur
),
scored AS (
  SELECT tok.doc_id, tok.split,
         CASE
           WHEN tok.pos >= 2 AND bi.cb IS NOT NULL
             THEN round(ln(CAST(bi.cb AS DOUBLE) / cu.c), 6)
           WHEN tok.pos = 1 AND uw.c IS NOT NULL
             THEN round(ln(CAST(uw.c AS DOUBLE) / tot.n), 6)
           WHEN tok.pos >= 2 AND uw.c IS NOT NULL
             THEN round(ln({_BLM_ALPHA} * CAST(uw.c AS DOUBLE) / tot.n), 6)
           WHEN tok.pos = 1
             THEN round(ln({_BLM_ALPHA} / tot.n), 6)
           ELSE round(ln({_BLM_ALPHA} * {_BLM_ALPHA} / tot.n), 6)
         END AS lnp,
         CASE WHEN tok.pos >= 2 AND bi.cb IS NOT NULL THEN 0
              WHEN tok.pos = 1 AND uw.c IS NOT NULL THEN 0
              ELSE 1 END AS backed
  FROM tok
  LEFT JOIN uni uw ON uw.w = tok.cur
  LEFT JOIN uni cu ON cu.w = tok.prev
  LEFT JOIN bi ON bi.prev = tok.prev AND bi.cur = tok.cur
  CROSS JOIN tot
)
SELECT doc_id, split,
       COUNT(*) AS n_tokens,
       {o_davg("lnp", "avg_logprob")},
       CAST(SUM(backed) AS BIGINT) AS n_backoff
FROM scored GROUP BY doc_id, split
"""


@query("ext_lm_bigram_score", oracle=_BLM_ORACLE, tier=3)
def ext_lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity proxy with stupid backoff (Brants et al.
    2007) — the CCNet-style quality filter one rung above
    ext_lm_unigram_score: token score is ln(c(u,w)/c(u)) when the bigram
    was seen in training, alpha-discounted unigram (then alpha/N) when
    not. The model trains on the ext_train_split_hash TRAIN split only
    and scores the whole corpus, so val/test docs exercise genuine
    backoff (self-training on the scored corpus would make the backoff
    branch structurally dead); n_backoff per doc is the honesty meter —
    a high backoff rate means the score leans on the weaker model.

    Determinism: counts are exact integers; each branch's ln is
    6dp-rounded on both sides (the ext_tfidf libm treatment) with
    identical CASE order and arithmetic shape; the per-doc mean is the
    quantized-exact davg.

    Shape: positions/bigram pairs derive map-side from the token array
    (one explode, no self-join for adjacency); the unigram table is
    vocab-bounded and BROADCASTS back onto the token stream (the
    stopword pattern, twice: cur and prev); the bigram table joins
    un-hinted — AQE broadcasts it at this scale, and at 100 TB (where
    bigram TYPES outgrow any broadcast) the same plan degrades to a
    shuffle join keyed on the 2-token pair while everything else is
    unchanged; a production variant would also cap the table at top-K
    bigrams with the OOV floor absorbing the tail. One aggregate
    produces the per-doc rollup."""
    d = load(spark, sf_dir, "documents")
    first = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_BLM_SALT))),
        1,
        1,
    )
    splitc = (
        F.when(first < "c", "train").when(first < "e", "val").otherwise("test")
    )
    base = d.select(
        "doc_id", splitc.alias("split"), F.split("text", " ").alias("t")
    )
    from ..session import scoped_persist

    # persisted: the corpus-sized token/position stream feeds the unigram
    # and bigram model aggregates AND the scored stream (code-review r9:
    # unpersisted, the split+explode pipeline re-ran per consumer)
    tok = scoped_persist(
        base.select(
            "doc_id",
            "split",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t)), i -> struct("
                    "i AS pos, "
                    "CASE WHEN i >= 2 THEN element_at(t, i - 1) END AS prev, "
                    "element_at(t, i) AS cur))"
                )
            ).alias("s"),
        ).select("doc_id", "split", "s.pos", "s.prev", "s.cur")
    )
    train = tok.filter(F.col("split") == "train")
    # persisted: the vocab-bounded unigram table is broadcast twice (cur,
    # prev) and summed once for N
    uni = scoped_persist(
        train.groupBy("cur").agg(F.count(F.lit(1)).alias("c"))
    )
    tot = uni.agg(F.sum("c").cast("double").alias("n"))
    bi = (
        train.filter(F.col("pos") >= 2)
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("cb"))
    )

    uw = F.broadcast(
        uni.select(F.col("cur").alias("uw_w"), F.col("c").alias("uw_c"))
    )
    cu = F.broadcast(
        uni.select(F.col("cur").alias("cu_w"), F.col("c").alias("cu_c"))
    )
    joined = (
        tok.join(uw, tok.cur == F.col("uw_w"), "left")
        .join(cu, tok.prev == F.col("cu_w"), "left")
        .join(
            bi.select(
                F.col("prev").alias("b_prev"),
                F.col("cur").alias("b_cur"),
                "cb",
            ),
            (tok.prev == F.col("b_prev")) & (tok.cur == F.col("b_cur")),
            "left",
        )
        .crossJoin(F.broadcast(tot))
    )
    a = _BLM_ALPHA
    lnp = (
        F.when(
            (F.col("pos") >= 2) & F.col("cb").isNotNull(),
            F.round(F.log(F.col("cb").cast("double") / F.col("cu_c")), 6),
        )
        .when(
            (F.col("pos") == 1) & F.col("uw_c").isNotNull(),
            F.round(F.log(F.col("uw_c").cast("double") / F.col("n")), 6),
        )
        .when(
            (F.col("pos") >= 2) & F.col("uw_c").isNotNull(),
            F.round(
                F.log(
                    F.lit(a) * F.col("uw_c").cast("double") / F.col("n")
                ),
                6,
            ),
        )
        .when(F.col("pos") == 1, F.round(F.log(F.lit(a) / F.col("n")), 6))
        .otherwise(F.round(F.log(F.lit(a) * F.lit(a) / F.col("n")), 6))
    )
    backed = (
        F.when((F.col("pos") >= 2) & F.col("cb").isNotNull(), 0)
        .when((F.col("pos") == 1) & F.col("uw_c").isNotNull(), 0)
        .otherwise(1)
    )
    from ..functions.determinism import davg

    scored = joined.select(
        "doc_id", "split", lnp.alias("lnp"), backed.alias("backed")
    )
    return scored.groupBy("doc_id", "split").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        davg("lnp", "avg_logprob"),
        F.sum("backed").cast("long").alias("n_backoff"),
    )


# --- ext_perplexity_bucket_mix ------------------------------------------------

# CCNet-style quality bucketing: within each language, docs split into
# head/middle/tail terciles of the unigram-LM score (high mean logprob =
# low perplexity = head). The LM score is ext_lm_unigram_score's exact
# davg surface, so the tercile boundaries sit on bit-identical doubles in
# both engines and the (score DESC, doc_id) order is total.
_PPX_BUCKET = "CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END"


def _ppx_oracle() -> str:
    return f"""
WITH lm AS MATERIALIZED ({_LM_ORACLE}),
j AS (
  SELECT d.lang, d.n_chars, lm.doc_id, lm.avg_logprob,
         NTILE(3) OVER (PARTITION BY d.lang
                        ORDER BY lm.avg_logprob DESC, lm.doc_id) AS nt
  FROM lm JOIN documents d ON lm.doc_id = d.doc_id
)
SELECT lang, {_PPX_BUCKET} AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars_sum,
       {o_davg("avg_logprob", "mean_logprob")}
FROM j GROUP BY lang, bucket
"""


_PPX_ORACLE = _ppx_oracle()


@query("ext_perplexity_bucket_mix", oracle=_PPX_ORACLE, tier=3)
def ext_perplexity_bucket_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: within each language, documents
    split into head / middle / tail terciles of their unigram-LM mean
    logprob (head = most fluent under the corpus's own distribution) —
    the quality-mix step CCNet/RedPajama pipelines apply per language
    before sampling, so a curation run can keep the head, downweight the
    middle, and audit what the tail would have contributed. Output: the
    (lang, bucket) composition grid with volume and mean score.

    Shape: the score is ext_lm_unigram_score invoked as a helper (its
    own key pins the LM math; the oracle re-derives it as a CTE so the
    buckets bind end to end); bucketing is ONE per-language NTILE window
    over the doc-count-sized score frame on bit-identical doubles with a
    doc_id tie-break (total order), then a bounded (lang, bucket)
    rollup. At 100 TB the window input is one row per document — the
    same model-sized frame every ranking step in the curation family
    already carries."""
    from ..functions.determinism import davg

    lm = ext_lm_unigram_score(spark, sf_dir)
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    j = lm.join(d, "doc_id")
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.desc("avg_logprob"), F.asc("doc_id")
    )
    bucketed = j.select(
        "lang",
        "n_chars",
        "avg_logprob",
        F.ntile(3).over(w).alias("nt"),
    )
    return bucketed.groupBy(
        "lang", F.expr(_PPX_BUCKET).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars_sum"),
        davg("avg_logprob", "mean_logprob"),
    )


# --- ext_coverage_gain_greedy ---------------------------------------------------

#: Greedy max-coverage rounds (k): the classic (1 - 1/e) submodular
#: selection, the shape behind facility-location / coverage-based data
#: pruning (pick the few docs that together span the most n-grams).
_COV_ROUNDS = 4

_COV_GRAMS = (
    "SELECT DISTINCT doc_id, unnest(list_transform("
    "range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"
    " AS gram FROM (SELECT doc_id, string_split(text, ' ') AS t"
    " FROM documents)"
)


def _cov_oracle() -> str:
    ctes = [
        f"g AS MATERIALIZED ({_COV_GRAMS})",
        "u AS (SELECT CAST(COUNT(DISTINCT gram) AS BIGINT) AS total"
        " FROM g)",
        "r1 AS MATERIALIZED (SELECT doc_id, gram FROM g)",
    ]
    sels = []
    for r in range(1, _COV_ROUNDS + 1):
        ctes.append(
            f"p{r} AS MATERIALIZED (SELECT doc_id,"
            f" CAST(COUNT(*) AS BIGINT) AS new_grams FROM r{r}"
            f" GROUP BY doc_id ORDER BY new_grams DESC, doc_id ASC"
            f" LIMIT 1)"
        )
        sels.append(
            f"SELECT CAST({r} AS BIGINT) AS sel_round, doc_id, new_grams"
            f" FROM p{r}"
        )
        if r < _COV_ROUNDS:
            ctes.append(
                f"c{r} AS MATERIALIZED (SELECT DISTINCT gram FROM r{r}"
                f" JOIN p{r} USING (doc_id))"
            )
            ctes.append(
                f"r{r + 1} AS MATERIALIZED (SELECT a.doc_id, a.gram"
                f" FROM r{r} a WHERE NOT EXISTS"
                f" (SELECT 1 FROM c{r} c WHERE c.gram = a.gram))"
            )
    picks = "\nUNION ALL\n".join(sels)
    return (
        "WITH " + ",\n".join(ctes) + f""",
picks AS ({picks})
SELECT sel_round, doc_id, new_grams,
       CAST(SUM(new_grams) OVER (ORDER BY sel_round
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_covered,
       CAST(SUM(new_grams) OVER (ORDER BY sel_round
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / CAST(u.total AS DOUBLE) AS coverage_frac
FROM picks CROSS JOIN u
"""
    )


_COV_ORACLE = _cov_oracle()


@query("ext_coverage_gain_greedy", oracle=_COV_ORACLE, tier=3)
def ext_coverage_gain_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy maximum-coverage document selection: 4 rounds, each
    picking the doc whose 3-gram set covers the most NOT-yet-covered
    grams (ties: lowest doc_id) — the (1 - 1/e)-approximate submodular
    selection behind coverage/facility-location data pruning ("which
    handful of docs teaches the most of this corpus's surface?"), the
    lexical sibling of ext_kcenter_coreset's geometric diversity pick.
    Output: per round the chosen doc, its marginal gain, the running
    distinct-gram total (cumulative distinct == sum of marginal gains,
    by construction of 'uncovered'), and the covered fraction of the
    gram universe.

    Exactness: all counts exact integers over distinct string grams (no
    hashing — the oracle joins on the same strings); the fraction is one
    shared-text division.

    Shape: ONE distinct (doc, gram) shuffle collapses the corpus to
    per-doc HASHED gram sets (collect_set of xxhash64 — the
    _hashed_shingle_tokens collision stance: 8-byte members instead of
    strings); each round is a MAP-SIDE array_except against the
    broadcast covered-hash array (the union of the picked docs' sets —
    model-sized for small k) plus a TakeOrdered-1 fold. The measured
    A/B at sf0.1: this broadcast-array form runs 1.76 s vs 4.47 s for
    the anti-join-per-round shape it replaced (2.5x, identical output)
    — the anti join re-shuffled the full posting frame every round,
    while the array form touches only the persisted 1-row-per-doc sets.
    At 100 TB with large k, the covered broadcast graduates to a bloom
    bitmap (ext_bloom_decontaminate's form) — same algebra
    (EXPECTED_FLAGS: 1-row pick/covered folds + the 4-row output
    window).

    Degenerate rounds (ADVICE r12): each round keeps only candidates
    with new_grams > 0, so when the gram universe is exhausted in fewer
    than k rounds BOTH engines emit the same short pick list (the
    oracle's round-r frame only contains docs with >=1 uncovered gram
    by construction) instead of Spark padding a zero-gain repeat pick.
    The filter alone also excludes every already-picked doc — its grams
    are all covered, so its marginal gain is exactly 0 — and an
    explicit anti-join against the growing picks frame would re-execute
    the whole pick lineage each round (the round-11 twice-referenced-
    iterative-frame trap: measured 1.94x slower at sf0.1)."""
    from ..session import scoped_persist

    d = load(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.split("text", " ").alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(t) >= 3 THEN transform("
                    "sequence(0, size(t) - 3),"
                    " i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
                    " ELSE array() END"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    sets = scoped_persist(
        tok.groupBy("doc_id").agg(
            F.collect_set(F.xxhash64("gram")).alias("ths")
        )
    )
    u = tok.agg(F.countDistinct("gram").alias("total"))
    picks = None
    cov = None
    for r in range(1, _COV_ROUNDS + 1):
        if cov is None:
            scored = sets.select(
                "doc_id", F.size("ths").alias("new_grams")
            )
        else:
            scored = sets.crossJoin(F.broadcast(cov)).select(
                "doc_id",
                F.size(F.array_except("ths", "cv")).alias("new_grams"),
            )
        # each pick frame is referenced TWICE (the final union AND the next
        # round's covered-set broadcast) and transitively by every later
        # round's lineage — persisting the 1-row pick makes each round's
        # TakeOrdered execute exactly once instead of once per downstream
        # reference (the round-11 twice-referenced-iterative-frame lesson,
        # applied to the pick itself; r13)
        pick = scoped_persist(
            scored.filter(F.col("new_grams") > 0)
            .orderBy(F.desc("new_grams"), F.asc("doc_id"))
            .limit(1)
            .select(
                F.lit(r).cast("long").alias("sel_round"),
                "doc_id",
                "new_grams",
            )
        )
        picks = pick if picks is None else picks.unionAll(pick)
        if r < _COV_ROUNDS:
            cov = sets.join(
                F.broadcast(picks.select("doc_id")), "doc_id"
            ).agg(
                F.array_distinct(
                    F.flatten(F.collect_list("ths"))
                ).alias("cv")
            )
    from pyspark.sql import Window as W

    cum = F.sum("new_grams").over(
        W.orderBy("sel_round").rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
    )
    return picks.crossJoin(F.broadcast(u)).select(
        "sel_round",
        "doc_id",
        "new_grams",
        cum.alias("cum_covered"),
        (cum.cast("double") / F.col("total").cast("double")).alias(
            "coverage_frac"
        ),
    )


# --- ext_prefix_boilerplate -----------------------------------------------------

#: Prefix fingerprint width (tokens). Real crawls carry injected headers/
#: disclaimers; 8 tokens is the CCNet-style boilerplate-line scale.
_BP_PREFIX_TOKENS = 8

_BP_ORACLE = f"""
WITH pfx AS (
  SELECT doc_id, lang, source,
         array_to_string(string_split(text, ' ')[1:{_BP_PREFIX_TOKENS}],
                         ' ') AS prefix
  FROM documents
)
SELECT lang, prefix,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
FROM pfx
GROUP BY lang, prefix
HAVING COUNT(*) >= 2
"""


@query("ext_prefix_boilerplate", oracle=_BP_ORACLE, tier=3)
def ext_prefix_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-prefix boilerplate audit: document groups whose first
    {_BP_PREFIX_TOKENS} tokens are IDENTICAL within a language —
    the cheap detector for injected headers, license banners, and
    template scaffolding that full-document dedup misses (the bodies
    differ) and substring dedup pays much more to find; groups spanning
    several SOURCES are the strongest boilerplate signal (the same
    header arriving through different feeds). doc_id_sum binds exact
    group membership.

    Exactness: the prefix is a lossless positional slice of the
    single-space token stream; all outputs are exact integer
    counts/sums.

    Shape: map-side prefix projection (never the full text past the
    scan), ONE (lang, prefix) aggregate with full map-side combine —
    the exchange carries 8-token prefixes, not documents — and the
    HAVING filter prunes singleton groups before the result
    materializes. At 100 TB this is the classic scan -> partial-agg ->
    one exchange plan keyed on a bounded-width string."""
    d = load(spark, sf_dir, "documents")
    pfx = d.select(
        "doc_id",
        "lang",
        "source",
        F.array_join(
            F.slice(F.split("text", " "), 1, _BP_PREFIX_TOKENS), " "
        ).alias("prefix"),
    )
    return (
        pfx.groupBy("lang", "prefix")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc_id"),
            F.sum("doc_id").alias("doc_id_sum"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# --- ext_gopher_rules -----------------------------------------------------------

#: The audited rule set (the Gopher/MassiveText quality heuristics,
#: Rae et al. 2021, re-expressed as pure integer decisions): word-count
#: bounds, mean-word-length band, duplicate-bigram ceiling, top-token
#: concentration ceiling, distinct-token floor.
_GOPHER_MIN_WORDS = 50
_GOPHER_MAX_WORDS = 100_000

_GOPHER_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
),
map_stats AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_words,
         CAST(length(text) - (len(t) - 1) AS BIGINT) AS n_chars,
         CAST(len(t) - 1 AS BIGINT) AS n_bigrams,
         CAST(length(list_distinct(
           list_transform(range(1, len(t)),
                          i -> t[i] || ' ' || t[i+1]))) AS BIGINT)
           AS n_distinct_bigrams,
         CAST(length(list_distinct(t)) AS BIGINT) AS n_distinct
  FROM base
),
top_tok AS (
  SELECT doc_id, CAST(MAX(cnt) AS BIGINT) AS top_cnt FROM (
    SELECT doc_id, COUNT(*) AS cnt FROM (
      SELECT doc_id, unnest(t) AS token FROM base
    ) GROUP BY doc_id, token
  ) GROUP BY doc_id
),
flags AS (
  SELECT m.doc_id, m.n_words, m.n_chars, m.n_bigrams,
         m.n_bigrams - m.n_distinct_bigrams AS n_dup_bigrams,
         m.n_distinct, tt.top_cnt,
         (m.n_words >= {_GOPHER_MIN_WORDS}
          AND m.n_words <= {_GOPHER_MAX_WORDS}) AS r_word_count,
         (3 * m.n_words <= m.n_chars
          AND m.n_chars <= 10 * m.n_words) AS r_mean_word_len,
         (5 * (m.n_bigrams - m.n_distinct_bigrams)
            < GREATEST(m.n_bigrams, 1)) AS r_dup_bigram,
         (5 * tt.top_cnt < m.n_words) AS r_top_token,
         (10 * m.n_distinct >= 3 * m.n_words) AS r_distinct_ratio
  FROM map_stats m JOIN top_tok tt ON m.doc_id = tt.doc_id
)
SELECT doc_id, n_words, n_chars, n_dup_bigrams, n_distinct, top_cnt,
       CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE)
         AS mean_word_len,
       CAST(n_dup_bigrams AS DOUBLE)
         / CAST(GREATEST(n_bigrams, 1) AS DOUBLE) AS dup_bigram_frac,
       CAST(top_cnt AS DOUBLE) / CAST(n_words AS DOUBLE)
         AS top_token_frac,
       CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE)
         AS distinct_ratio,
       r_word_count, r_mean_word_len, r_dup_bigram, r_top_token,
       r_distinct_ratio,
       (r_word_count AND r_mean_word_len AND r_dup_bigram
        AND r_top_token AND r_distinct_ratio) AS pass_all,
       CAST(5 - (CAST(r_word_count AS INTEGER)
                 + CAST(r_mean_word_len AS INTEGER)
                 + CAST(r_dup_bigram AS INTEGER)
                 + CAST(r_top_token AS INTEGER)
                 + CAST(r_distinct_ratio AS INTEGER)) AS BIGINT)
         AS n_rules_failed
FROM flags
"""


@query("ext_gopher_rules", oracle=_GOPHER_ORACLE, tier=3)
def ext_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher/MassiveText rule-set audit per document (Rae et al.
    2021's published pretraining filters, the bundle behind C4/RefinedWeb
    -style curation): word-count bounds [50, 100k], mean word length in
    [3, 10], duplicate-bigram fraction < 20% (the ext_repetition_score
    signal, here as a gate), top-token concentration < 20%, and
    distinct-token ratio >= 30% — each emitted as its own flag PLUS the
    composite, so a filter owner reads WHICH rule kills a document, not
    just that something did. Complements ext_quality_score (a blended
    score) with hard named gates.

    Exactness: every rule is a pure integer inequality (5*dup <
    n_bigrams, not dup/n < 0.2 — no float thresholds anywhere); the
    reported fractions are one IEEE division each over exact counts.

    Shape: the map-side frame (word/char/bigram/distinct counts from
    the split array, whole-stage codegen) joins the one explode ->
    (doc, token) counting aggregate that yields the top-token count —
    both keyed on doc_id, so the only data-sized exchange is the
    doc-keyed token shuffle every text operator pays. At 100 TB both
    sides partition by doc_id and the join co-locates."""
    d = load(spark, sf_dir, "documents")
    base = d.select("doc_id", "text", F.split("text", " ").alias("t"))
    nw = F.size("t").cast("long")
    m = base.select(
        "doc_id",
        nw.alias("n_words"),
        (F.length("text") - (nw - 1)).cast("long").alias("n_chars"),
        (nw - 1).cast("long").alias("n_bigrams"),
        F.size(F.array_distinct(F.expr(_BIGRAMS_FROM_T)))
        .cast("long")
        .alias("n_distinct_bigrams"),
        F.size(F.array_distinct("t")).cast("long").alias("n_distinct"),
    )
    tt = (
        base.select("doc_id", F.explode("t").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").cast("long").alias("top_cnt"))
    )
    f = m.join(tt, "doc_id").select(
        "doc_id",
        "n_words",
        "n_chars",
        (F.col("n_bigrams") - F.col("n_distinct_bigrams")).alias(
            "n_dup_bigrams"
        ),
        "n_distinct",
        "top_cnt",
        "n_bigrams",
        (
            (F.col("n_words") >= _GOPHER_MIN_WORDS)
            & (F.col("n_words") <= _GOPHER_MAX_WORDS)
        ).alias("r_word_count"),
        (
            (3 * F.col("n_words") <= F.col("n_chars"))
            & (F.col("n_chars") <= 10 * F.col("n_words"))
        ).alias("r_mean_word_len"),
        (
            5 * (F.col("n_bigrams") - F.col("n_distinct_bigrams"))
            < F.greatest(F.col("n_bigrams"), F.lit(1))
        ).alias("r_dup_bigram"),
        (5 * F.col("top_cnt") < F.col("n_words")).alias("r_top_token"),
        (10 * F.col("n_distinct") >= 3 * F.col("n_words")).alias(
            "r_distinct_ratio"
        ),
    )
    return f.select(
        "doc_id",
        "n_words",
        "n_chars",
        "n_dup_bigrams",
        "n_distinct",
        "top_cnt",
        (F.col("n_chars").cast("double") / F.col("n_words").cast("double"))
        .alias("mean_word_len"),
        (
            F.col("n_dup_bigrams").cast("double")
            / F.greatest(F.col("n_bigrams"), F.lit(1)).cast("double")
        ).alias("dup_bigram_frac"),
        (F.col("top_cnt").cast("double") / F.col("n_words").cast("double"))
        .alias("top_token_frac"),
        (
            F.col("n_distinct").cast("double")
            / F.col("n_words").cast("double")
        ).alias("distinct_ratio"),
        "r_word_count",
        "r_mean_word_len",
        "r_dup_bigram",
        "r_top_token",
        "r_distinct_ratio",
        (
            F.col("r_word_count")
            & F.col("r_mean_word_len")
            & F.col("r_dup_bigram")
            & F.col("r_top_token")
            & F.col("r_distinct_ratio")
        ).alias("pass_all"),
        (
            F.lit(5)
            - (
                F.col("r_word_count").cast("int")
                + F.col("r_mean_word_len").cast("int")
                + F.col("r_dup_bigram").cast("int")
                + F.col("r_top_token").cast("int")
                + F.col("r_distinct_ratio").cast("int")
            )
        )
        .cast("long")
        .alias("n_rules_failed"),
    )


# --- ext_lm_kneser_ney ----------------------------------------------------------

#: Absolute discount D = 3/4 — DYADIC by design, so clearing the
#: denominator by 4 turns the whole interpolated-KN probability into
#: ONE exact-integer ratio (contrast ext_lm_bigram_score, whose
#: stupid-backoff ln scores ride the 6dp-rounded libm treatment).
_KN_TOP = 20

_KN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
bg AS (
  SELECT t[i] AS v, t[i+1] AS w
  FROM toks, unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
),
c AS (
  SELECT v, w, CAST(COUNT(*) AS BIGINT) AS c_vw
  FROM bg GROUP BY v, w
),
vroll AS (
  SELECT v, CAST(SUM(c_vw) AS BIGINT) AS c_v,
         CAST(COUNT(*) AS BIGINT) AS n1_fwd
  FROM c GROUP BY v
),
wroll AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS n1_bwd FROM c GROUP BY w
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS b_total FROM c),
top AS (
  SELECT v, w, c_vw FROM c
  ORDER BY c_vw DESC, v ASC, w ASC LIMIT {_KN_TOP}
)
SELECT t.v, t.w, t.c_vw, vr.c_v, vr.n1_fwd, wr.n1_bwd, tt.b_total,
       CAST((4 * t.c_vw - 3) * tt.b_total
            + 3 * vr.n1_fwd * wr.n1_bwd AS BIGINT) AS p_kn_num,
       CAST(4 * vr.c_v * tt.b_total AS BIGINT) AS p_kn_den,
       CAST((4 * t.c_vw - 3) * tt.b_total
            + 3 * vr.n1_fwd * wr.n1_bwd AS DOUBLE)
         / CAST(4 * vr.c_v * tt.b_total AS DOUBLE) AS p_kn,
       CAST(t.c_vw AS DOUBLE) / CAST(vr.c_v AS DOUBLE) AS p_mle
FROM top t
JOIN vroll vr ON t.v = vr.v
JOIN wroll wr ON t.w = wr.w
CROSS JOIN tot tt
"""


@query("ext_lm_kneser_ney", oracle=_KN_ORACLE, tier=3)
def ext_lm_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney 1995,
    the strongest classical n-gram smoother) for the corpus's top-20
    bigrams, next to their raw MLE — the smoother-audit view: KN
    subtracts an absolute discount D from every seen bigram and gives
    the freed mass to the CONTINUATION unigram (how many distinct left
    contexts a word follows — 'Francisco' is frequent but follows
    almost only 'San', so KN correctly refuses to predict it in fresh
    contexts, the failure mode plain backoff (ext_lm_bigram_score's
    stupid backoff) cannot see.

    Exactness: D = 3/4 is DYADIC by design — clearing denominators by
    4 makes the entire interpolated probability ONE exact-integer
    ratio, P_KN = ((4c(vw) - 3)B + 3 N1+(v.) N1+(.w)) / (4 c(v) B),
    emitted as exact numerator/denominator BIGINTs plus their single
    IEEE division; every count is exact; no ln anywhere (the contrast
    with the backoff scorer's 6dp libm treatment is the point).

    Shape: bigram pairs derive MAP-SIDE from the token array (one
    explode, no adjacency self-join); ONE (v, w) counting aggregate is
    the only data-sized exchange; the v-/w-rollups and 1-row total run
    on the MODEL-sized bigram-type frame; top-20 is TakeOrdered; the
    rollups broadcast-join back onto 20 rows (EXPECTED_FLAGS). At
    100 TB bigram types still fit the rollup tier (vocab-bounded), the
    same regime ext_lm_bigram_score documents."""
    from ..session import scoped_persist

    d = load(spark, sf_dir, "documents")
    bg = (
        d.select(F.split("text", " ").alias("t"))
        .filter(F.size("t") >= 2)
        .select(F.explode(F.expr(_BIGRAMS_FROM_T)).alias("bg"))
        .select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("v"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w"),
        )
    )
    c = scoped_persist(
        bg.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c_vw"))
    )
    vroll = c.groupBy("v").agg(
        F.sum("c_vw").cast("long").alias("c_v"),
        F.count(F.lit(1)).alias("n1_fwd"),
    )
    wroll = c.groupBy("w").agg(F.count(F.lit(1)).alias("n1_bwd"))
    tot = c.agg(F.count(F.lit(1)).alias("b_total"))
    top = c.orderBy(
        F.desc("c_vw"), F.asc("v"), F.asc("w")
    ).limit(_KN_TOP)
    num = (4 * F.col("c_vw") - 3) * F.col("b_total") + 3 * F.col(
        "n1_fwd"
    ) * F.col("n1_bwd")
    den = 4 * F.col("c_v") * F.col("b_total")
    return (
        top.join(F.broadcast(vroll), "v")
        .join(F.broadcast(wroll), "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "v",
            "w",
            "c_vw",
            "c_v",
            "n1_fwd",
            "n1_bwd",
            "b_total",
            num.cast("long").alias("p_kn_num"),
            den.cast("long").alias("p_kn_den"),
            (num.cast("double") / den.cast("double")).alias("p_kn"),
            (
                F.col("c_vw").cast("double") / F.col("c_v").cast("double")
            ).alias("p_mle"),
        )
    )
