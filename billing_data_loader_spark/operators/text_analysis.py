"""Text-analysis operators for training-data pipelines (north-star mandate):
language ID, quality scoring, token counting, document fingerprinting.

All pure relational/HOF plans (no UDFs): at 100 TB these run inside
whole-stage codegen over the documents scan, shuffling only small per-lang /
per-token aggregates. Signatures (language vocab, stopword lists) are built
from the corpus itself, deterministically, and broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.registry import query
from ..session import scoped_persist
from ..tables import load

# --- ext_lang_id ------------------------------------------------------------

# N-gram-free heuristic suited to the whitespace-token fixture: per-language
# signature = top-20 tokens by frequency (count desc, token asc); classify a
# doc by which signature overlaps most of its tokens (ties -> lang asc).
_LANG_ID_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents
), sig AS (
  SELECT lang AS sig_lang, token FROM (
    SELECT lang, token, ROW_NUMBER() OVER (
      PARTITION BY lang ORDER BY COUNT(*) DESC, token ASC
    ) AS rn
    FROM tok GROUP BY lang, token
  ) WHERE rn <= 20
), doc_tok AS (
  SELECT DISTINCT doc_id, lang, token FROM tok
), overlap AS (
  SELECT doc_id, any_value(lang) AS true_lang, sig_lang, COUNT(*) AS n_hits
  FROM doc_tok JOIN sig USING (token)
  GROUP BY doc_id, sig_lang
)
SELECT doc_id, true_lang, pred_lang, (pred_lang = true_lang) AS is_correct
FROM (
  SELECT doc_id, true_lang, sig_lang AS pred_lang,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY n_hits DESC, sig_lang ASC
         ) AS rn
  FROM overlap
) WHERE rn = 1
"""


@query("ext_lang_id", oracle=_LANG_ID_ORACLE, tier=3)
def ext_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID via per-language top-20 token signatures.
    (No widen_scan: the tokenize explode is cheap string splitting and the
    first groupBy parallelizes immediately — the A/B measured the extra
    round-robin shuffle as a net loss here.)"""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("token"))
    sig_w = W.partitionBy("lang").orderBy(
        F.col("cnt").desc(), F.col("token").asc()
    )
    sig = (
        tok.groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(sig_w))
        .filter(F.col("rn") <= 20)
        .select(F.col("lang").alias("sig_lang"), "token")
    )
    doc_tok = tok.distinct()
    overlap = (
        doc_tok.join(F.broadcast(sig), "token")
        .groupBy("doc_id", "sig_lang")
        .agg(
            F.any_value(F.col("lang")).alias("true_lang"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )
    pick_w = W.partitionBy("doc_id").orderBy(
        F.col("n_hits").desc(), F.col("sig_lang").asc()
    )
    return (
        overlap.withColumn("rn", F.row_number().over(pick_w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "true_lang",
            F.col("sig_lang").alias("pred_lang"),
            (F.col("sig_lang") == F.col("true_lang")).alias("is_correct"),
        )
    )


# --- ext_quality_score ------------------------------------------------------

# Stopwords = global top-10 tokens (deterministic). All ratios are exact
# integer divisions -> bit-identical doubles on both engines.
_QUALITY_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), stop AS (
  SELECT token FROM (
    SELECT token, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token ASC) AS rn
    FROM tok GROUP BY token
  ) WHERE rn <= 10
), per_doc AS (
  SELECT t.doc_id,
         COUNT(*) AS n_tokens,
         COUNT(DISTINCT t.token) AS n_distinct,
         COUNT(*) FILTER (t.token IN (SELECT token FROM stop)) AS n_stop
  FROM tok t GROUP BY t.doc_id
)
SELECT d.doc_id,
       n_tokens,
       CAST(d.n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_token_len,
       CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
       CAST(n_distinct AS DOUBLE) / n_tokens AS type_token_ratio,
       0.4 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
       + 0.3 * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens)
       + 0.3 * (CAST(n_distinct AS DOUBLE) / n_tokens) AS quality_score
FROM per_doc p JOIN documents d ON p.doc_id = d.doc_id
"""


@query("ext_quality_score", oracle=_QUALITY_ORACLE, tier=3)
def ext_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality: length, lexical diversity, stopword ratio,
    combined score (the filter stage of a pretraining pipeline).
    (No widen_scan: cheap tokenize, measured net loss — see ext_lang_id.)"""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    # global top-10 via orderBy+limit -> TakeOrderedAndProject (distributed
    # top-k), never a single-partition window; (cnt desc, token asc) is a
    # total order so the row set is deterministic
    stop = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(10)
        .select("token", F.lit(True).alias("is_stop"))
    )
    per_doc = (
        tok.join(F.broadcast(stop), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("token").alias("n_distinct"),
            F.count(F.col("is_stop")).alias("n_stop"),
        )
    )
    n_tok = F.col("n_tokens").cast("double")
    n_stop = F.col("n_stop").cast("double")
    n_dist = F.col("n_distinct").cast("double")
    return per_doc.join(d.select("doc_id", "n_chars"), "doc_id").select(
        "doc_id",
        "n_tokens",
        ((F.col("n_chars") - (F.col("n_tokens") - 1)).cast("double") / F.col("n_tokens")).alias(
            "avg_token_len"
        ),
        (n_stop / n_tok).alias("stopword_ratio"),
        (n_dist / n_tok).alias("type_token_ratio"),
        (
            0.4 * F.least(n_tok / 100.0, F.lit(1.0))
            + 0.3 * (1.0 - n_stop / n_tok)
            + 0.3 * (n_dist / n_tok)
        ).alias("quality_score"),
    )


# --- ext_token_count --------------------------------------------------------

# Whitespace tokens + a BPE-ish subword proxy (greedy <=4-char alpha chunks)
# + the chars/4 heuristic — the three standard "how many tokens is this
# corpus" estimators.
_TOKEN_COUNT_ORACLE = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS BIGINT) AS subword_tokens,
       CAST(ceil(CAST(n_chars AS DOUBLE) / 4.0) AS BIGINT) AS chars_div4
FROM documents
"""


@query("ext_token_count", oracle=_TOKEN_COUNT_ORACLE, tier=3)
def ext_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, BPE-ish regex, chars/4."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        F.regexp_count("text", F.lit("[a-z]{1,4}")).cast("long").alias(
            "subword_tokens"
        ),
        F.ceil(F.col("n_chars").cast("double") / 4.0).cast("long").alias(
            "chars_div4"
        ),
    )


# --- ext_doc_fingerprint ----------------------------------------------------

# Rolling-hash fingerprinting: polynomial hash (base 31 mod 2^31-1) of each
# 3-token shingle's characters, then a min-k sketch (8 smallest distinct
# hashes, sorted) as the document fingerprint. Integer arithmetic throughout
# -> SQL-expressible and bit-exact. Exact duplicates share fingerprints;
# heavily overlapping docs share most sketch entries.
_FP_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), shingle AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
           AS sh
  FROM toks
), hashed AS (
  SELECT DISTINCT doc_id,
         list_reduce(list_transform(string_split(sh, ''), c -> CAST(ascii(c) AS BIGINT)),
                     (a, b) -> (a * 31 + b) % 2147483647) AS h
  FROM shingle
), ranked AS (
  SELECT doc_id, h,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h ASC) AS rn
  FROM hashed
)
SELECT doc_id,
       array_to_string(list(h ORDER BY h), ',') AS fingerprint,
       MIN(h) AS fp_min
FROM ranked WHERE rn <= 8
GROUP BY doc_id
"""


@query("ext_doc_fingerprint", oracle=_FP_ORACLE, tier=3)
def ext_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-k sketch of rolling polynomial shingle hashes per document.

    One shuffle total: hash every shingle occurrence map-side (equal
    shingles hash equal, so no pre-dedup pass is needed), then
    ``collect_set`` — which partial-aggregates map-side and dedups — builds
    the per-doc distinct-hash set, and the min-8 sketch is a sort+slice of
    that small set. Replaces the explode→distinct→distinct→window chain
    (three shuffles, one of them of shingle strings). Set size per doc is
    bounded by tokens per doc, not corpus size, so the agg buffer stays
    small at any SF."""
    from ..session import widen_scan
    from .llm_pipeline import _SHINGLES_FROM_T

    # widen_scan: the per-character rolling-hash fold below is the most
    # CPU-dense map work in the catalog; at one-row-group scan width it
    # runs on a single core (see session.widen_scan)
    d = widen_scan(load(spark, sf_dir, "documents"))
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    sh = toks.select("doc_id", F.explode(F.expr(_SHINGLES_FROM_T)).alias("sh"))
    # polynomial rolling hash over characters, reduce-style (first code is
    # the init, like DuckDB's list_reduce); char codes materialized once per
    # shingle, not once per reduce step
    codes = sh.select(
        "doc_id",
        F.expr("transform(split(sh, ''), c -> CAST(ascii(c) AS BIGINT))").alias("cs"),
    )
    h = F.expr(
        "aggregate(slice(cs, 2, size(cs) - 1), cs[0], "
        "(a, b) -> (a * 31 + b) % 2147483647)"
    )
    hashed = codes.select("doc_id", h.alias("h"))
    # min-8 sketch serialized to a CSV string for the driver boundary
    # (bigint->string renders identically on both engines; the driver's
    # canonicalizer cannot hash array cells — CORRECTNESS_r01 canon-crash).
    return (
        hashed.groupBy("doc_id")
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, 8).alias("fp"))
        .select(
            "doc_id",
            F.array_join(
                F.transform("fp", lambda x: x.cast("string")), ","
            ).alias("fingerprint"),
            F.element_at("fp", 1).alias("fp_min"),
        )
    )


# --- ext_neardup_simhash ----------------------------------------------------


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full SimHash near-dup surface: every (doc_a, doc_b, hamming) pair
    with hamming <= 3. SimHash: 64-bit signature from shingle xxhash64 bit
    votes; candidates share one of four 16-bit chunks (pigeonhole:
    hamming <= 3 guarantees a shared chunk), verified by exact hamming
    distance. xxhash64 signatures have no DuckDB mirror, so this full
    surface is pinned by tests (exact duplicates land at hamming 0 and are
    all found — tests/test_ann.py); the DECLARED ext_neardup_simhash
    below projects the provable exact-duplicate subset so the driver gets
    a real hash check instead of rows-only.

    100 TB shape: signature build is one shuffle of shingles; the candidate
    join keys on (chunk_id, chunk_value) — O(docs x 4), never O(n^2)."""
    from .llm_pipeline import _corpus_with_dups, _hashed_shingle_tokens

    corpus = _corpus_with_dups(spark, sf_dir)
    # hash each shingle ONCE, then vote on bits of the materialized long —
    # inlining xxhash64 into the aggregate expressions re-hashes the
    # string per bit (64x string hashing; dominated the sf0.1 bench)
    tok = _hashed_shingle_tokens(corpus).withColumnRenamed("th", "h")
    # bit vote: sum over shingles of +-1 per bit == 2*sum(bit) - count, so a
    # bit is set iff 2*sum(bit) > n_shingles (ties -> unset, matching the
    # original strict "> 0" vote). The 64 per-bit counters are PACKED four
    # per long (16-bit fields, bit b = k + 16*i lives in field i of long k):
    # 16 sum aggregates instead of 64 — a quarter of the aggregation-buffer
    # slots and of the generated code, whose janino compile time is what the
    # one-shot bench actually pays. Field width bounds docs at 65535 shingles
    # (fixture max ~98); a 100 TB corpus with megabyte documents would chunk
    # docs upstream or fall back to the unpacked form.
    votes_raw = tok.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_raw"),
        *[
            F.sum(
                sum(
                    F.shiftleft(
                        F.shiftrightunsigned("h", k + 16 * i).bitwiseAND(F.lit(1)),
                        16 * i,
                    )
                    for i in range(4)
                )
            ).alias(f"p{k}")
            for k in range(16)
        ],
    )
    # loud guard on the field-width bound, applied AFTER the aggregate (one
    # row per doc, so the conditional stays off the per-shingle hot path):
    # a doc with >65535 shingles would silently corrupt neighboring 16-bit
    # vote fields, so fail the job instead
    votes = votes_raw.select(
        "doc_id",
        "lang",
        F.when(
            F.col("n_raw") > 0xFFFF,
            F.raise_error(
                "simhash packed-vote overflow: doc exceeds 65535 shingles; "
                "chunk upstream or use the unpacked form"
            ),
        ).otherwise(F.col("n_raw")).alias("n_sh"),
        *[F.col(f"p{k}") for k in range(16)],
    )
    # 64-bit signature reconstruction as ONE higher-order fold over
    # sequence(0,63) instead of a 64-term bitwiseOR chain: the chain's
    # generated code took janino ~2.5 s to compile per run (the dominant
    # cost of this query — it runs on only one row per doc); the fold
    # compiles in milliseconds and its interpreted per-element eval is
    # trivial at 64 iterations/row. Verified bit-identical to the unrolled
    # form. shiftleft(1L, 63) carries the Java sign-bit semantics the
    # unrolled -(2^63) term encoded explicitly.
    sim_expr = """
    aggregate(
      sequence(0, 63),
      CAST(0 AS BIGINT),
      (acc, b) -> acc | IF(
          2 * (shiftrightunsigned(element_at(ps, (b % 16) + 1),
                                  16 * (b DIV 16)) & CAST(65535 AS BIGINT))
            > n_sh,
          shiftleft(CAST(1 AS BIGINT), b),
          CAST(0 AS BIGINT))
    )
    """
    # one row per doc; persisted because the candidate self-join would
    # otherwise recompute the whole shingle->vote pipeline for each side
    # (no ReusedExchange across self-join branches, verified on the plan);
    # scope-released at the next declared-query entry (session.py)
    signed = scoped_persist(
        votes.withColumn(
            "ps", F.array(*[F.col(f"p{k}") for k in range(16)])
        ).select("doc_id", "lang", F.expr(sim_expr).alias("simhash"))
    )
    chunks = signed.select(
        "doc_id",
        "lang",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", 16 * c)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias(f"c{c}")
                    for c in range(4)
                ]
            )
        ).alias("chunk_id", "chunk_val"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.select(
        "doc_a", "doc_b", hamming.cast("long").alias("hamming")
    ).filter(F.col("hamming") <= 3)


# Declared-surface oracle (round 5, upgraded from rows-only): identical
# texts MUST collapse to identical signatures, survive the pigeonhole
# banding, and verify at hamming 0 — all three are theorems about the
# pipeline, not fixture coincidences, so DuckDB can enumerate the expected
# rows from text equality alone. A signature, banding, or verification
# regression turns a boolean FALSE (or drops a row) and breaks the hash.
_SIMHASH_ORACLE = """
WITH corpus AS ({corpus})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(0 AS BIGINT) AS hamming,
       TRUE AS bands_found
FROM corpus a JOIN corpus b
  ON a.text = b.text AND a.lang = b.lang AND a.doc_id < b.doc_id
WHERE len(string_split(a.text, ' ')) >= 3
"""


def _simhash_oracle() -> str:
    from .llm_pipeline import _CORPUS_SQL

    return _SIMHASH_ORACLE.format(corpus=_CORPUS_SQL)


@query("ext_neardup_simhash", oracle=_simhash_oracle(), tier=3)
def ext_neardup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup, declared as its hash-checkable invariant subset:
    one row per exact-duplicate pair (same text, same lang), carrying the
    pipeline's measured hamming distance (provably 0) and whether the
    pigeonhole banding surfaced the pair (provably TRUE). The full
    hamming<=3 surface — which depends on xxhash64 signatures DuckDB
    cannot mirror — is :func:`simhash_pairs`, pinned by tests/test_ann.py;
    this
    declared view re-derives the exact-dup pair set by content-hash
    groupBy (32-byte digests shuffle, never text) and LEFT-joins the
    pipeline output, so a missing pair or nonzero hamming surfaces as a
    hash break instead of hiding behind a rows-only check."""
    from .llm_pipeline import _corpus_with_dups

    pairs = simhash_pairs(spark, sf_dir)
    # a doc with < 3 tokens produces no shingles, hence no signature — the
    # hamming=0 / bands_found=TRUE theorems only hold for docs that shingle,
    # so both this frame and the oracle restrict to them (same has-grams
    # idiom as ext_bloom_decontaminate); without the guard a regenerated
    # fixture containing a duplicated 2-token doc breaks the hash.
    corpus = _corpus_with_dups(spark, sf_dir).filter(
        F.size(F.split("text", " ")) >= 3
    )
    groups = (
        corpus.groupBy(F.sha2("text", 256).alias("h"), F.col("lang"))
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    pair_structs = F.flatten(
        F.transform(
            "ds",
            lambda x, i: F.transform(
                F.slice("ds", i + F.lit(2), F.size("ds")),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    dup_pairs = groups.select(F.explode(pair_structs).alias("p")).select(
        "p.doc_a", "p.doc_b"
    )
    return dup_pairs.join(pairs, ["doc_a", "doc_b"], "left").select(
        "doc_a",
        "doc_b",
        F.coalesce("hamming", F.lit(-1)).alias("hamming"),
        F.col("hamming").isNotNull().alias("bands_found"),
    )


# --- ext_ngram_freq ---------------------------------------------------------

# Top-5 bigrams per language. One shuffle for the (lang, bigram) count, then
# a per-lang window over the already-aggregated count table. With few
# languages the window partitions are coarse; at 100 TB the merge step
# becomes hierarchical (per-partition top-5, then merge the tiny per-
# partition lists) — the count table, not the corpus, is what flows into it
# either way. element_at keeps indexing 1-based to match DuckDB's lists.
_NGRAM_ORACLE = """
WITH toks AS (
  SELECT lang, string_split(text, ' ') AS t FROM documents
), b AS (
  SELECT lang,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
           AS bigram
  FROM toks
), c AS (
  SELECT lang, bigram, COUNT(*) AS n FROM b GROUP BY lang, bigram
)
SELECT lang, bigram, n, rn FROM (
  SELECT lang, bigram, n,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                 ORDER BY n DESC, bigram ASC) AS BIGINT) AS rn
  FROM c
) WHERE rn <= 5
"""


@query("ext_ngram_freq", oracle=_NGRAM_ORACLE, tier=3)
def ext_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-5 bigram frequencies (n-gram corpus statistics)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("lang", F.split("text", " ").alias("t"))
    bigrams = toks.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
            )
        ).alias("bigram"),
    )
    counts = bigrams.groupBy("lang", "bigram").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram").asc())
    return (
        counts.select(
            "lang", "bigram", "n",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )


# --- ext_bm25 ---------------------------------------------------------------

# BM25 document ranking (k1=1.2, b=0.75) for an automatic query: the 3
# globally most frequent tokens (count desc, token asc — deterministic on
# both engines and robust to fixture regeneration). Per-term scores round
# to 6 dp BEFORE the per-doc sum (ln differs by <=1 ulp across libms —
# same stance as ext_tfidf), and the cross-term sum is decimal-exact, so
# the final score is bit-identical and the top-10 ordering total.
_BM25_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), stats AS (
  SELECT COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_tokens FROM tok
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
), qterms AS (
  SELECT token FROM tok GROUP BY token
  ORDER BY COUNT(*) DESC, token ASC LIMIT 3
), df AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df
  FROM tok JOIN qterms USING (token) GROUP BY token
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM tok JOIN qterms USING (token) GROUP BY doc_id, token
), scored AS (
  SELECT tf.doc_id,
         round(
           ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * (tf * (1.2 + 1.0))
           / (tf + 1.2 * (1.0 - 0.75
                          + 0.75 * dl / (CAST(n_tokens AS DOUBLE) / n_docs))),
           6) AS s
  FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
)
SELECT doc_id, CAST(SUM(CAST(s AS DECIMAL(28,6))) AS DOUBLE) AS bm25
FROM scored GROUP BY doc_id
ORDER BY bm25 DESC, doc_id ASC
LIMIT 10
"""


@query("ext_bm25", oracle=_BM25_ORACLE, tier=3)
def ext_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for the corpus's 3 hottest tokens — the
    retrieval scorer a dedup/curation pipeline uses to pull docs about a
    topic. Pure relational: one tokenize pass persisted and reused by all
    four aggregates (doc lengths, global stats, query-term df/tf), query
    terms and the two scalar stats broadcast back (1-row frames, O(tasks)
    partials — flagged-and-justified BNLJ), scoring inside codegen, and
    the top-10 via TakeOrderedAndProject. Shuffles: tokenize once by
    token, once by doc — both map-side combined; nothing global except
    the two 1-row aggregates. (No widen_scan: cheap tokenize, measured
    net loss — see ext_lang_id.)"""
    d = load(spark, sf_dir, "documents")
    tok = scoped_persist(
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    )
    stats = tok.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_tokens"),
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    qterms = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(3)
        .select("token")
    )
    qtok = tok.join(F.broadcast(qterms), "token")
    df_tbl = qtok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    tf_tbl = qtok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    k1, b = F.lit(1.2), F.lit(0.75)
    avgdl = F.col("n_tokens").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    score = F.round(
        idf
        * (F.col("tf") * (k1 + F.lit(1.0)))
        / (F.col("tf") + k1 * (F.lit(1.0) - b + b * F.col("dl") / avgdl)),
        6,
    )
    scored = (
        tf_tbl.join(F.broadcast(df_tbl), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", score.alias("s"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum(F.col("s").cast("decimal(28,6)")).cast("double").alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(10)
    )


# --- ext_vocab_coverage -----------------------------------------------------

# Tokenizer-vocabulary coverage: build the top-1000-token vocab from the
# corpus itself, then score each document's out-of-vocabulary OCCURRENCE
# rate — the audit that decides whether a tokenizer's vocab fits a new
# data source before training on it.
_VOCAB_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
  FROM documents
), vocab AS (
  SELECT token FROM (
    SELECT token, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token ASC) AS rn
    FROM tok GROUP BY token
  ) WHERE rn <= 1000
)
SELECT doc_id,
       any_value(lang) AS lang,
       COUNT(*) AS n_tokens,
       COUNT(*) FILTER (token NOT IN (SELECT token FROM vocab)) AS n_oov,
       CAST(COUNT(*) FILTER (token NOT IN (SELECT token FROM vocab))
            AS DOUBLE) / COUNT(*) AS oov_rate
FROM tok GROUP BY doc_id
"""


@query("ext_vocab_coverage", oracle=_VOCAB_ORACLE, tier=3)
def ext_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document OOV rate against the corpus top-1000 vocab. The vocab
    is a bounded aggregate (top-k by frequency, token tie-break) that
    BROADCASTS — real tokenizer vocabs are 32-256k entries, still
    broadcast-sized at any corpus scale; the corpus side is one token
    explode + broadcast left-join + doc_id groupBy (map-side combined).
    The OOV ratio is an integer/integer double division — bit-identical
    both engines."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    )
    # orderBy().limit() -> TakeOrderedAndProject (per-partition heap +
    # driver merge): at web scale the distinct-token frame is Heaps-law
    # huge, so the filter-on-row_number global window this replaces would
    # sort it on one partition (caught by the r12 global_window gate).
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(1000)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.count(F.lit(1)).alias("n_tokens"),
            (F.count(F.lit(1)) - F.count("in_vocab")).alias("n_oov"),
            (
                (F.count(F.lit(1)) - F.count("in_vocab")).cast("double")
                / F.count(F.lit(1))
            ).alias("oov_rate"),
        )
    )


# --- ext_quality_classifier ---------------------------------------------------

#: Hashed-feature space and weight derivation. Real pipelines ship a trained
#: linear model (fastText-style) whose weight table joins on the feature
#: bucket; the fixture has no checkpoint, so weights derive deterministically
#: from the bucket id itself (Knuth multiplicative constant, range
#: [-1000, 1000] thousandths) — the same verified-real-stand-in stance as the
#: multimodal decode stub, except here the stand-in exercises the ENTIRE
#: real computation (hash, bucket, sum, normalize), just with made-up
#: coefficients.
_QCLS_BUCKETS = 512
_QCLS_KNUTH = 2654435761

_QCLS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
feat AS (
  SELECT doc_id,
         ('0x' || substr(md5(token), 1, 8))::BIGINT % {_QCLS_BUCKETS}
           AS bucket
  FROM tok
),
scored AS (
  SELECT doc_id,
         COUNT(*) AS n_tok,
         CAST(SUM((bucket * {_QCLS_KNUTH}) % 2001 - 1000) AS BIGINT)
           AS w_sum
  FROM feat GROUP BY doc_id
)
SELECT doc_id, n_tok, w_sum,
       CAST(w_sum AS DOUBLE) / (1000.0 * n_tok) AS logit,
       (w_sum > 0) AS pred_keep
FROM scored
"""


@query("ext_quality_classifier", oracle=_QCLS_ORACLE, tier=3)
def ext_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear quality classifier (fastText-style scoring): tokens
    hash into 512 feature buckets, each bucket carries a
    weight, and a doc's logit is the mean bucket weight — the exact
    computation CCNet/fastText-filter pipelines run to keep/drop
    documents at scale, here with deterministic stand-in weights (see the
    constant's note; a real checkpoint swaps in as a
    <= 512-row broadcast join on `bucket` with zero plan-shape
    change).

    Cross-engine exactness: the bucket is a 32-bit md5 prefix mod
    512 (hex->int bridge as in ext_sample_weighted), the
    weight is pure integer arithmetic in [-1000, 1000], the per-doc sum
    is a BIGINT (order-insensitive), and the logit is one IEEE division
    by the exact double 1000*n_tok. The keep decision compares the
    INTEGER sum against zero — no float in the decision path at all.

    Shape: hash + bucket + weight are map-side codegen over the token
    explode; ONE shuffle (per-doc aggregate). At 100 TB this is the
    classic scan -> explode -> partial-agg -> one exchange plan: the
    explode never materializes wider than the scan batch, and the
    aggregate carries two longs per doc."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    bucket = F.pmod(
        F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long"),
        F.lit(_QCLS_BUCKETS),
    )
    w_int = F.pmod(bucket * _QCLS_KNUTH, F.lit(2001)) - 1000
    scored = tok.select("doc_id", w_int.alias("w")).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.sum("w").alias("w_sum"),
    )
    return scored.select(
        "doc_id",
        "n_tok",
        "w_sum",
        (F.col("w_sum").cast("double") / (F.lit(1000.0) * F.col("n_tok")))
        .alias("logit"),
        (F.col("w_sum") > 0).alias("pred_keep"),
    )


# --- ext_doc_topk_terms -------------------------------------------------------

_TOPK_TERMS_K = 3

_TOPK_TERMS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
n_docs AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tok),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS docfreq FROM tok GROUP BY token),
tf AS (SELECT doc_id, token, COUNT(*) AS termfreq FROM tok GROUP BY doc_id, token),
scored AS (
  SELECT doc_id, tf.token,
         round(termfreq * ln((n + 1.0) / (docfreq + 1.0)), 6) AS score
  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n_docs
)
SELECT * FROM (
  SELECT doc_id, token, score,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY score DESC, token ASC
         ) AS BIGINT) AS rn
  FROM scored
) WHERE rn <= {_TOPK_TERMS_K}
"""


@query("ext_doc_topk_terms", oracle=_TOPK_TERMS_ORACLE, tier=3)
def ext_doc_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DOCUMENT top-k TF-IDF terms: the keyword/topic-signal extraction
    step (dataset cards, per-doc tags, cluster labeling) — ext_tfidf's
    per-language rollup re-keyed to the document, where the window is a
    million-fold wider and the join-back matters. Same smoothed IDF
    (ln((N+1)/(df+1))) and the same round-to-6dp on the score (the ln is
    computed from identical integer-derived operands in both engines and
    the 1e-6 grid absorbs last-ulp drift; precedent: ext_tfidf, green
    since r3).

    Shape: token explode -> (doc, token) term frequencies (one shuffle,
    map-side combined) -> join the vocab-sized docfreq table on token.
    The df side is aggregated BEFORE the join and is vocabulary-bounded,
    so at 100 TB it either broadcasts (AQE decides; a few hundred MB for
    a web-scale vocab) or shuffles only the compact (token, df) pairs —
    never the corpus. The 1-row n_docs frame broadcasts. Top-k is a
    per-doc window over rows already partitioned by the tf aggregate's
    doc-prefixed key."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    n_docs = tok.agg(F.countDistinct("doc_id").alias("n"))
    df = tok.groupBy("token").agg(
        F.countDistinct("doc_id").alias("docfreq")
    )
    tf = tok.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("termfreq")
    )
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("termfreq")
                * F.log((F.col("n") + 1.0) / (F.col("docfreq") + 1.0)),
                6,
            ).alias("score"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _TOPK_TERMS_K)
    )


# --- ext_rank_fusion ----------------------------------------------------------

_RRF_K = 60

_RRF_ORACLE = f"""
WITH lex AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r
  FROM ({_BM25_ORACLE}) t
),
sem AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS r
  FROM ({{knn}}) t
)
SELECT COALESCE(l.doc_id, s.vec_id) AS doc_id,
       CAST(l.r AS BIGINT) AS lex_rank,
       CAST(s.r AS BIGINT) AS sem_rank,
       COALESCE(1.0 / ({_RRF_K} + l.r), 0.0)
         + COALESCE(1.0 / ({_RRF_K} + s.r), 0.0) AS rrf_score
FROM lex l FULL JOIN sem s ON l.doc_id = s.vec_id
"""


def _rrf_oracle() -> str:
    from .llm_pipeline import _KNN_ORACLE

    return _RRF_ORACLE.format(knn=_KNN_ORACLE)


@query("ext_rank_fusion", oracle=_rrf_oracle(), tier=3)
def ext_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the two declared retrieval systems —
    lexical (ext_bm25's top-10 for the corpus's hottest terms) and
    semantic (ext_knn_cosine's top-10 for the query embedding) — the
    standard hybrid-retrieval combiner (RRF, k=60): score(d) =
    sum over systems of 1 / (k + rank_d). Pure composition of graded
    operators, the way a RAG/data-curation pipeline actually fuses
    candidate pools; emitting both source ranks keeps the attribution.

    Exactness: ranks are integers with deterministic tie-breaks (score
    desc, id asc over already-hash-green scores); each reciprocal is one
    IEEE division and the two-term sum is written in fixed order with
    COALESCE(., 0) for a doc present in only one list.

    Shape: two <= 10-row frames, two 10-row rank windows (flagged 1-row-
    class SinglePartition, justified), one full outer join of 10-row
    sides — everything downstream of the graded sub-operators is
    driver-trivial; the heavy lifting (tokenize aggregates, cosine scan)
    keeps the sub-operators' documented plans."""
    from ..operators.llm_pipeline import ext_knn_cosine
    from pyspark.sql import Window as W

    lex = ext_bm25(spark, sf_dir).withColumn(
        "lex_rank",
        F.row_number()
        .over(W.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()))
        .cast("long"),
    ).select("doc_id", "lex_rank")
    sem = ext_knn_cosine(spark, sf_dir).withColumn(
        "sem_rank",
        F.row_number()
        .over(W.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()))
        .cast("long"),
    ).select(F.col("vec_id"), "sem_rank")
    fused = lex.join(
        sem, lex["doc_id"] == sem["vec_id"], "full_outer"
    ).select(
        F.coalesce(lex["doc_id"], sem["vec_id"]).alias("doc_id"),
        "lex_rank",
        "sem_rank",
        (
            F.coalesce(1.0 / (_RRF_K + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("sem_rank")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    return fused


# --- ext_cooccurrence_pmi -----------------------------------------------------

#: Skip-gram window (offsets +1, +2 — symmetric pairs are normalized to
#: (least, greatest)) and the min pair count that bounds the output to
#: statistically meaningful collocations.
_PMI_OFFSETS = (1, 2)
_PMI_MIN_PAIR = 25

#: ln() differs by 1 ulp across engines (the ext_char_entropy story); the
#: PMI itself is quantized to 6dp. Its inputs are exact integer counts
#: divided in IEEE doubles — identical on both sides.
_PMI_ORACLE = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
pairs AS (
  SELECT least(t[i], t[i + o]) AS w1, greatest(t[i], t[i + o]) AS w2
  FROM d,
       unnest(range(1, len(t) + 1)) AS u(i),
       (VALUES (1), (2)) AS off(o)
  WHERE i + o <= len(t)
),
pc AS (
  SELECT w1, w2, COUNT(*) AS n_pair FROM pairs GROUP BY w1, w2
  HAVING COUNT(*) >= {_PMI_MIN_PAIR}
),
uni AS (
  SELECT u.w, COUNT(*) AS n_w
  FROM d, unnest(t) AS u(w)
  GROUP BY u.w
),
tot AS (
  SELECT (SELECT COUNT(*) FROM pairs) AS n_pairs_total,
         (SELECT CAST(SUM(len(t)) AS BIGINT) FROM d) AS n_tokens_total
)
SELECT w1, w2, n_pair,
       floor(
         ln((CAST(n_pair AS DOUBLE) / n_pairs_total)
            / ((CAST(ua.n_w AS DOUBLE) / n_tokens_total)
               * (CAST(ub.n_w AS DOUBLE) / n_tokens_total)))
         * 1000000.0 + 0.5
       ) / 1000000.0 AS pmi
FROM pc
JOIN uni ua ON ua.w = pc.w1
JOIN uni ub ON ub.w = pc.w2
CROSS JOIN tot
"""


@query("ext_cooccurrence_pmi", oracle=_PMI_ORACLE, tier=3)
def ext_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over a ±2 skip-gram window — the
    collocation statistic (word2vec-era PPMI matrices, phrase-mining
    "new_york" detection, tokenizer-merge candidates beyond raw
    frequency): pairs whose corpus count clears a support threshold are
    scored ln(P(a,b) / (P(a)P(b))) against the unigram background, so
    high-PMI pairs co-occur far above chance even when both words are
    rare. Complements ext_bpe_pair_counts (adjacent-only, frequency-
    ranked) and ext_ngram_freq (contiguous n-grams): PMI normalizes by
    the marginals, which frequency alone cannot.

    Shape: pairs generate MAP-SIDE from each doc's token array (an
    indexed lambda over offsets +1/+2 — no self-join on position, the
    ext_lm_bigram_score adjacency discipline); one shuffle counts pairs,
    one counts unigrams (vocab-bounded), and the support threshold cuts
    the pair table BEFORE the two marginal joins, so the joins carry
    only surviving collocations against the bounded vocab. Totals ride
    as a 1-row broadcast fold. At 100 TB the pair-count exchange is the
    only corpus-sized shuffle, with map-side combine doing most of the
    reduction (Zipf: the hot pairs dominate).

    widen_scan A/B (the mandatory check for CPU-dense per-doc work on
    the single-row-group fixture): min-of-4 warm at sf0.1 measured
    2.06 s -> 1.29 s widened, so the widen is applied; a no-op at real
    scale where the scan has thousands of row-groups."""
    from ..session import widen_scan

    d = widen_scan(load(spark, sf_dir, "documents")).select(
        F.split("text", " ").alias("t")
    )
    toks = scoped_persist(d)
    pair_arr = F.expr(
        """flatten(transform(t, (w, i) ->
             filter(array(
               IF(i + 1 < size(t), struct(least(w, t[i + 1]) AS w1,
                                          greatest(w, t[i + 1]) AS w2), NULL),
               IF(i + 2 < size(t), struct(least(w, t[i + 2]) AS w1,
                                          greatest(w, t[i + 2]) AS w2), NULL)
             ), x -> x IS NOT NULL)))"""
    )
    pairs = toks.select(F.explode(pair_arr).alias("p")).select(
        "p.w1", "p.w2"
    )
    pairs = scoped_persist(pairs)
    pc = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= _PMI_MIN_PAIR)
    )
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    tot = pairs.agg(F.count(F.lit(1)).alias("n_pairs_total")).crossJoin(
        toks.select(F.size("t").alias("n")).agg(
            F.sum("n").alias("n_tokens_total")
        )
    )
    ua = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_a"))
    ub = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_b"))
    j = (
        pc.join(ua, "w1")
        .join(ub, "w2")
        .crossJoin(F.broadcast(tot))
    )
    p_pair = F.col("n_pair").cast("double") / F.col("n_pairs_total")
    p_a = F.col("n_a").cast("double") / F.col("n_tokens_total")
    p_b = F.col("n_b").cast("double") / F.col("n_tokens_total")
    return j.select(
        "w1",
        "w2",
        "n_pair",
        (
            F.floor(F.log(p_pair / (p_a * p_b)) * 1000000.0 + F.lit(0.5))
            / 1000000.0
        ).alias("pmi"),
    )


# --- ext_inverted_index -----------------------------------------------------

# Postings are delta-encoded (d-gaps: first absolute position, then
# successive differences) — the universal index-compression layout; the
# csv string keeps the declared surface flat for the driver's canonicalizer.
_INVIDX_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
),
g AS (
  SELECT term, doc_id, pos,
         pos - COALESCE(
           lag(pos) OVER (PARTITION BY term, doc_id ORDER BY pos), 0
         ) AS gap
  FROM tok
),
posting AS (
  SELECT term, doc_id, COUNT(*) AS tf,
         string_agg(CAST(gap AS VARCHAR), ',' ORDER BY pos) AS gaps_csv
  FROM g GROUP BY term, doc_id
)
SELECT term, doc_id, tf,
       COUNT(*) OVER (PARTITION BY term) AS df,
       gaps_csv
FROM posting
"""


@query("ext_inverted_index", oracle=_INVIDX_ORACLE, tier=3)
def ext_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted-index construction — the batch job behind every
    full-text search deployment (and the retrieval half of a RAG corpus):
    per (term, document) one posting row carrying term frequency, document
    frequency, and the position list DELTA-ENCODED as d-gaps (first
    absolute offset, then successive differences — the layout that makes
    varint compression work; ext_bm25/ext_tfidf consume the tf/df
    statistics this index materializes).

    Shape: posexplode inside the scan stage (no position self-join), ONE
    (term, doc) groupBy building tf + the sorted position array (positions
    of one doc are distinct, so sort_array is a total order — no
    collect_list ambiguity), gaps via an indexed array lambda (map-side,
    0-based ps[i-1] lookback), then a term-partitioned window for df.
    Two shuffles end to end; at 100 TB the posting shuffle is the
    irreducible index build cost and the df window rides the same term
    key — exactly how a sharded indexer lays postings out per term."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "term"),
    )
    posting = tok.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("ps"),
    )
    gaps = F.concat_ws(
        ",",
        F.expr(
            "transform(ps, (x, i) -> CAST("
            "CASE WHEN i = 0 THEN x ELSE x - ps[i - 1] END AS STRING))"
        ),
    )
    return posting.select(
        "term",
        "doc_id",
        "tf",
        F.count(F.lit(1)).over(W.partitionBy("term")).alias("df"),
        gaps.alias("gaps_csv"),
    )


# --- ext_calibration_ece ------------------------------------------------------

#: Reliability-diagram bins over the classifier's NORMALIZED linear score
#: s = (w_sum + 1000*n_tok) / (2000*n_tok)  in [0, 1] — monotone in the
#: logit, so binning by s is binning by predicted confidence, but the bin
#: id is pure INTEGER arithmetic (no transcendental sigmoid whose last
#: ulp could flip a boundary doc between engines).
_ECE_BINS = 10

_ECE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
feat AS (
  SELECT doc_id,
         ('0x' || substr(md5(token), 1, 8))::BIGINT % {_QCLS_BUCKETS}
           AS bucket
  FROM tok
),
scored AS (
  SELECT doc_id,
         COUNT(*) AS n_tok,
         CAST(SUM((bucket * {_QCLS_KNUTH}) % 2001 - 1000) AS BIGINT)
           AS w_sum
  FROM feat GROUP BY doc_id
),
lab AS (SELECT doc_id, lang = 'en' AS truth FROM documents),
perdoc AS (
  SELECT LEAST(CAST((10 * (w_sum + 1000 * n_tok)) // (2000 * n_tok)
                    AS BIGINT), 9) AS bin,
         CAST(floor(CAST(w_sum + 1000 * n_tok AS DOUBLE)
                    / CAST(2000 * n_tok AS DOUBLE)
                    * 1000000000.0 + 0.5) AS BIGINT) AS s_q,
         CASE WHEN truth THEN 1 ELSE 0 END AS y
  FROM scored JOIN lab USING (doc_id)
),
bins AS (
  SELECT bin,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(y) AS BIGINT) AS pos_docs,
         CAST(SUM(s_q) AS BIGINT) AS ssum
  FROM perdoc GROUP BY bin
),
derived AS (
  SELECT bin, n_docs, pos_docs,
         CAST(ssum AS DOUBLE)
           / (1000000000.0 * CAST(n_docs AS DOUBLE)) AS mean_score,
         CAST(pos_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS pos_rate
  FROM bins
),
g AS (
  SELECT *,
         CAST(floor(ABS(mean_score - pos_rate) * 1000000000.0 + 0.5)
              AS BIGINT) AS gap_q
  FROM derived
)
SELECT bin, n_docs, pos_docs, mean_score, pos_rate,
       ABS(mean_score - pos_rate) AS gap,
       CAST(n_docs AS DOUBLE)
         / CAST(SUM(n_docs) OVER () AS DOUBLE) AS bin_share,
       CAST(SUM(gap_q * n_docs) OVER () AS DOUBLE)
         / (1000000000.0 * CAST(SUM(n_docs) OVER () AS DOUBLE)) AS ece
FROM g
"""


@query("ext_calibration_ece", oracle=_ECE_ORACLE, tier=3)
def ext_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + expected calibration error (ECE) for
    ``ext_quality_classifier`` against a deterministic gold label (doc is
    English) — the audit a filtering pipeline runs before TRUSTING a
    cheap classifier's scores as probabilities (Guo et al. 2017): bin
    docs by predicted confidence, compare each bin's mean score against
    its empirical positive rate, and weight the gaps into one scalar.
    A well-calibrated scorer tracks the diagonal; this stand-in scorer's
    gaps ARE the finding (it was never trained on language ID) — the
    audit exists to expose exactly that.

    Exactness: the bin id is pure integer arithmetic on (w_sum, n_tok)
    (see the constant's note); each doc's score is ONE IEEE division of
    exact integers, floor-quantized to a 1e-9 grid BEFORE the per-bin
    sum (cross-row double accumulation is order-sensitive; integer sums
    are not — the ts_acf stance), and the ECE fold quantizes each bin's
    gap the same way before the weighted sum, so every cross-row
    reduction in the plan is an integer sum.

    Shape: the classifier's scan -> explode -> one doc-keyed aggregate,
    one doc-keyed join for the label, ONE bounded groupBy (<= 10 bins),
    then the ECE fold as windows over the 10-row frame (model-sized
    SinglePartition — EXPECTED_FLAGS). At 100 TB nothing after the
    per-doc aggregate scales with the corpus."""
    lab = load(spark, sf_dir, "documents").select(
        "doc_id", (F.col("lang") == "en").alias("truth")
    )
    perdoc = (
        ext_quality_classifier(spark, sf_dir)
        .join(lab, "doc_id")
        .select(
            F.expr(
                "LEAST(CAST((10 * (w_sum + 1000 * n_tok))"
                " DIV (2000 * n_tok) AS BIGINT), 9)"
            ).alias("bin"),
            F.expr(
                "CAST(FLOOR(CAST(w_sum + 1000 * n_tok AS DOUBLE)"
                " / CAST(2000 * n_tok AS DOUBLE)"
                " * 1000000000.0 + 0.5) AS BIGINT)"
            ).alias("s_q"),
            F.expr("CASE WHEN truth THEN 1 ELSE 0 END").alias("y"),
        )
    )
    bins = perdoc.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("y").alias("pos_docs"),
        F.sum("s_q").alias("ssum"),
    )
    derived = bins.select(
        "bin",
        "n_docs",
        "pos_docs",
        F.expr(
            "CAST(ssum AS DOUBLE)"
            " / (1000000000.0 * CAST(n_docs AS DOUBLE))"
        ).alias("mean_score"),
        F.expr(
            "CAST(pos_docs AS DOUBLE) / CAST(n_docs AS DOUBLE)"
        ).alias("pos_rate"),
    ).withColumn(
        "gap_q",
        F.expr(
            "CAST(FLOOR(ABS(mean_score - pos_rate)"
            " * 1000000000.0 + 0.5) AS BIGINT)"
        ),
    )
    return derived.select(
        "bin",
        "n_docs",
        "pos_docs",
        "mean_score",
        "pos_rate",
        F.expr("ABS(mean_score - pos_rate)").alias("gap"),
        F.expr(
            "CAST(n_docs AS DOUBLE)"
            " / CAST(SUM(n_docs) OVER () AS DOUBLE)"
        ).alias("bin_share"),
        F.expr(
            "CAST(SUM(gap_q * n_docs) OVER () AS DOUBLE)"
            " / (1000000000.0 * CAST(SUM(n_docs) OVER () AS DOUBLE))"
        ).alias("ece"),
    )


# --- ext_confusion_matrix -------------------------------------------------------

_CONF_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
feat AS (
  SELECT doc_id,
         ('0x' || substr(md5(token), 1, 8))::BIGINT % {_QCLS_BUCKETS}
           AS bucket
  FROM tok
),
scored AS (
  SELECT doc_id,
         CAST(SUM((bucket * {_QCLS_KNUTH}) % 2001 - 1000) AS BIGINT)
           AS w_sum
  FROM feat GROUP BY doc_id
),
cells AS (
  SELECT (w_sum > 0) AS pred_keep, lang = 'en' AS actual_en,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM scored JOIN documents USING (doc_id)
  GROUP BY 1, 2
),
m AS (
  SELECT
    CAST(SUM(CASE WHEN pred_keep AND actual_en THEN n ELSE 0 END)
         AS BIGINT) AS tp,
    CAST(SUM(CASE WHEN pred_keep AND NOT actual_en THEN n ELSE 0 END)
         AS BIGINT) AS fp,
    CAST(SUM(CASE WHEN NOT pred_keep AND actual_en THEN n ELSE 0 END)
         AS BIGINT) AS fn,
    CAST(SUM(CASE WHEN NOT pred_keep AND NOT actual_en THEN n ELSE 0 END)
         AS BIGINT) AS tn,
    CAST(SUM(n) AS BIGINT) AS total
  FROM cells
)
SELECT c.pred_keep, c.actual_en, c.n,
       CAST(c.n AS DOUBLE) / CAST(m.total AS DOUBLE) AS cell_share,
       CAST(m.tp AS DOUBLE)
         / CAST(NULLIF(m.tp + m.fp, 0) AS DOUBLE) AS precision_keep,
       CAST(m.tp AS DOUBLE)
         / CAST(NULLIF(m.tp + m.fn, 0) AS DOUBLE) AS recall_keep,
       CAST(2 * m.tp AS DOUBLE)
         / CAST(NULLIF(2 * m.tp + m.fp + m.fn, 0) AS DOUBLE) AS f1_keep,
       CAST(m.tp + m.tn AS DOUBLE) / CAST(m.total AS DOUBLE) AS accuracy
FROM cells c CROSS JOIN m
"""


@query("ext_confusion_matrix", oracle=_CONF_ORACLE, tier=3)
def ext_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + precision/recall/F1/accuracy for
    ``ext_quality_classifier`` against the deterministic gold label (doc
    is English) — the discrimination half of the classifier audit next
    to ``ext_calibration_ece``'s calibration half (a filter can be sharp
    but miscalibrated, or calibrated but useless; a pipeline owner reads
    both before wiring the keep decision into curation). Emits the 2x2
    grid with the derived metrics as constant columns so every number a
    model card quotes reads off one frame.

    Exactness: the keep decision compares the INTEGER weight sum against
    zero (the classifier's own decision path — no float anywhere in cell
    membership); cell counts are exact; every metric is one shared-text
    IEEE division over exact integers, NULLIF-guarded for degenerate
    corpora. F1 uses the 2tp/(2tp+fp+fn) form — one division, no
    compounding of two already-divided doubles.

    Shape: the classifier's scan -> explode -> one doc-keyed aggregate,
    a doc-keyed label join, a <= 4-row cell aggregate, and the 1-row
    metric fold cross-joined back (EXPECTED_FLAGS: both O(cells), never
    docs)."""
    lab = load(spark, sf_dir, "documents").select(
        "doc_id", (F.col("lang") == "en").alias("actual_en")
    )
    cells = (
        ext_quality_classifier(spark, sf_dir)
        .join(lab, "doc_id")
        .groupBy("pred_keep", "actual_en")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = cells.agg(
        F.sum(
            F.expr("CASE WHEN pred_keep AND actual_en THEN n ELSE 0 END")
        ).alias("tp"),
        F.sum(
            F.expr(
                "CASE WHEN pred_keep AND NOT actual_en THEN n ELSE 0 END"
            )
        ).alias("fp"),
        F.sum(
            F.expr(
                "CASE WHEN NOT pred_keep AND actual_en THEN n ELSE 0 END"
            )
        ).alias("fn"),
        F.sum(
            F.expr(
                "CASE WHEN NOT pred_keep AND NOT actual_en"
                " THEN n ELSE 0 END"
            )
        ).alias("tn"),
        F.sum("n").alias("total"),
    )
    return cells.crossJoin(F.broadcast(m)).select(
        "pred_keep",
        "actual_en",
        "n",
        F.expr("CAST(n AS DOUBLE) / CAST(total AS DOUBLE)").alias(
            "cell_share"
        ),
        F.expr(
            "CAST(tp AS DOUBLE) / CAST(NULLIF(tp + fp, 0) AS DOUBLE)"
        ).alias("precision_keep"),
        F.expr(
            "CAST(tp AS DOUBLE) / CAST(NULLIF(tp + fn, 0) AS DOUBLE)"
        ).alias("recall_keep"),
        F.expr(
            "CAST(2 * tp AS DOUBLE)"
            " / CAST(NULLIF(2 * tp + fp + fn, 0) AS DOUBLE)"
        ).alias("f1_keep"),
        F.expr(
            "CAST(tp + tn AS DOUBLE) / CAST(total AS DOUBLE)"
        ).alias("accuracy"),
    )


# --- ext_zipf_fit ---------------------------------------------------------------

#: Fit window and display cut. ln values quantize to a 1e-6 grid so every
#: moment is an exact BIGINT (max |term| ~5.3e6, squares ~2.8e13, sums
#: ~5.6e15, cross products ~2.2e18 — all inside int64), and the closed
#: forms divide identical integers.
_ZIPF_FIT_K = 200
_ZIPF_SHOW_K = 20

_ZIPF_ORACLE = f"""
WITH freq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS f
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
),
top AS (
  SELECT token, f,
         CAST(ROW_NUMBER() OVER (ORDER BY f DESC, token ASC) AS BIGINT)
           AS rank
  FROM freq
  ORDER BY f DESC, token ASC
  LIMIT {_ZIPF_FIT_K}
),
q AS (
  SELECT token, f, rank,
         CAST(floor(ln(CAST(rank AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS lr,
         CAST(floor(ln(CAST(f AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS lf
  FROM top
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(lr) AS BIGINT) AS sx, CAST(SUM(lf) AS BIGINT) AS sy,
         CAST(SUM(lr * lr) AS BIGINT) AS sxx,
         CAST(SUM(lr * lf) AS BIGINT) AS sxy,
         CAST(SUM(lf * lf) AS BIGINT) AS syy
  FROM q
),
fit AS (
  SELECT n,
         n * sxy - sx * sy AS num,
         n * sxx - sx * sx AS den,
         n * syy - sy * sy AS deny,
         sx, sy
  FROM m
)
SELECT q.rank, q.token, q.f,
       round(CAST(fit.num AS DOUBLE) / CAST(fit.den AS DOUBLE), 6)
         AS zipf_slope,
       round((CAST(fit.sy AS DOUBLE)
              - (CAST(fit.num AS DOUBLE) / CAST(fit.den AS DOUBLE))
                * CAST(fit.sx AS DOUBLE))
             / (CAST(fit.n AS DOUBLE) * 1e6), 6) AS intercept_ln,
       round((CAST(fit.num AS DOUBLE) * CAST(fit.num AS DOUBLE))
             / (CAST(fit.den AS DOUBLE) * CAST(fit.deny AS DOUBLE)), 6)
         AS r2,
       fit.n AS n_fit
FROM q CROSS JOIN fit
WHERE q.rank <= {_ZIPF_SHOW_K}
"""


@query("ext_zipf_fit", oracle=_ZIPF_ORACLE, tier=3)
def ext_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law fit of the corpus vocabulary: OLS of ln(freq) on
    ln(rank) over the top-200 terms — slope (the Zipf exponent; natural
    text sits near -1), intercept and R² — the corpus-statistics
    sanity read next to ext_vocab_coverage (a synthetic or
    template-heavy corpus shows up immediately as a flat slope or a low
    R²; the fixture's small uniform-ish vocabulary is exactly such a
    finding). Declared output: the top-20 rank/term/frequency rows with
    the fit constants readable off any row.

    Exactness: term frequencies and ranks are exact integers; both ln
    values floor-quantize to a 1e-6 grid per TERM (see the constant's
    bound note), so all five OLS moments are exact BIGINT sums and the
    num/den cross terms stay inside int64 — the closed forms then
    divide bit-identical integers (intercept rescales by the 1e6
    quantum in shared text). The only transcendental is ln over
    identical integer-derived operands (the prof_entropy_profile
    discipline), rounded 6dp after all folds.

    Shape: one token-keyed counting aggregate (the vocabulary frame),
    TakeOrdered top-200, then every window/fold runs on the 200-row
    frame (EXPECTED_FLAGS model-sized SinglePartition). At 100 TB the
    vocab aggregate is the only data-sized exchange."""
    d = load(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    top = freq.orderBy(F.desc("f"), F.asc("token")).limit(_ZIPF_FIT_K)
    q = top.select(
        "token",
        "f",
        F.expr(
            "CAST(ROW_NUMBER() OVER (ORDER BY f DESC, token ASC)"
            " AS BIGINT)"
        ).alias("rank"),
    ).select(
        "rank",
        "token",
        "f",
        F.expr(
            "CAST(FLOOR(ln(CAST(rank AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)"
        ).alias("lr"),
        F.expr(
            "CAST(FLOOR(ln(CAST(f AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)"
        ).alias("lf"),
    )
    from ..session import scoped_persist

    q = scoped_persist(q)
    m = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lr").alias("sx"),
        F.sum("lf").alias("sy"),
        F.sum(F.expr("lr * lr")).alias("sxx"),
        F.sum(F.expr("lr * lf")).alias("sxy"),
        F.sum(F.expr("lf * lf")).alias("syy"),
    )
    fit = m.select(
        "n",
        "sx",
        "sy",
        F.expr("n * sxy - sx * sy").alias("num"),
        F.expr("n * sxx - sx * sx").alias("den"),
        F.expr("n * syy - sy * sy").alias("deny"),
    )
    return (
        q.filter(F.col("rank") <= _ZIPF_SHOW_K)
        .crossJoin(F.broadcast(fit))
        .select(
            "rank",
            "token",
            "f",
            F.expr(
                "round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)"
            ).alias("zipf_slope"),
            F.expr(
                "round((CAST(sy AS DOUBLE)"
                " - (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))"
                " * CAST(sx AS DOUBLE))"
                " / (CAST(n AS DOUBLE) * 1e6), 6)"
            ).alias("intercept_ln"),
            F.expr(
                "round((CAST(num AS DOUBLE) * CAST(num AS DOUBLE))"
                " / (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)), 6)"
            ).alias("r2"),
            F.col("n").alias("n_fit"),
        )
    )


# --- prof_heaps_law -------------------------------------------------------------

#: Checkpoint stride (every k-th doc in doc_id order) and the 1e-6 ln
#: quantization shared with ext_zipf_fit (same int64 bounds argument).
_HEAPS_STRIDE = 25

_HEAPS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
counted AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok FROM tok GROUP BY doc_id
),
firsts AS (
  SELECT token, MIN(doc_id) AS first_doc FROM tok GROUP BY token
),
curve AS (
  SELECT c.doc_id,
         CAST(SUM(c.n_tok) OVER (
           ORDER BY c.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_tokens,
         CAST(SUM(COALESCE(f.n_new, 0)) OVER (
           ORDER BY c.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_vocab
  FROM counted c
  LEFT JOIN (
    SELECT first_doc, CAST(COUNT(*) AS BIGINT) AS n_new
    FROM firsts GROUP BY first_doc
  ) f ON f.first_doc = c.doc_id
),
pts AS (
  SELECT doc_id, cum_tokens, cum_vocab,
         CAST(floor(ln(CAST(cum_tokens AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
           AS lx,
         CAST(floor(ln(CAST(cum_vocab AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
           AS ly
  FROM curve WHERE doc_id % {_HEAPS_STRIDE} = 0
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(lx) AS BIGINT) AS sx, CAST(SUM(ly) AS BIGINT) AS sy,
         CAST(SUM(lx * lx) AS BIGINT) AS sxx,
         CAST(SUM(lx * ly) AS BIGINT) AS sxy
  FROM pts
)
SELECT p.doc_id, p.cum_tokens, p.cum_vocab,
       round(CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
             / CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE), 6)
         AS heaps_beta,
       round((CAST(m.sy AS DOUBLE)
              - (CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
                 / CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE))
                * CAST(m.sx AS DOUBLE))
             / (CAST(m.n AS DOUBLE) * 1e6), 6) AS ln_k,
       m.n AS n_checkpoints
FROM pts p CROSS JOIN m
"""


@query("prof_heaps_law", oracle=_HEAPS_ORACLE, tier=3)
def prof_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: distinct-type count V vs
    cumulative token count N sampled at every 25th document in doc_id
    order, with the OLS fit of ln V on ln N (V ≈ k·N^beta; natural text
    sits around beta 0.4-0.6, a template corpus saturates early and a
    boilerplate-free crawl stays near-linear) — the companion read to
    ext_zipf_fit for corpus-health review, and the capacity planner's
    estimate of how the token vocabulary (and any vocab-keyed state)
    grows with another 10x of corpus.

    Exactness: the growth curve uses the first-seen identity
    (ts_reach_curve: cumulative distinct == cumsum of first-occurrence
    counts — one scan, never a per-checkpoint distinct); both ln values
    quantize to the 1e-6 grid (ext_zipf_fit's int64 bounds argument), so
    the OLS moments divide bit-identical integers.

    Shape: one token explode feeding two keyed aggregates (per-doc
    token counts; per-token first doc), then everything runs on the
    O(docs) curve frame — the cumulative windows and the 1-row moment
    fold are EXPECTED_FLAGS model-sized (two-pass prefix-sum swap
    documented at ts_cusum_changepoint)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    counted = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    news = (
        tok.groupBy("token")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy("first_doc")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    curve = counted.join(
        news, counted.doc_id == news.first_doc, "left"
    ).select(
        "doc_id",
        F.expr(
            "CAST(SUM(n_tok) OVER (ORDER BY doc_id"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            " AS BIGINT)"
        ).alias("cum_tokens"),
        F.expr(
            "CAST(SUM(COALESCE(n_new, 0)) OVER (ORDER BY doc_id"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            " AS BIGINT)"
        ).alias("cum_vocab"),
    )
    pts = curve.filter(F.col("doc_id") % _HEAPS_STRIDE == 0).select(
        "doc_id",
        "cum_tokens",
        "cum_vocab",
        F.expr(
            "CAST(FLOOR(ln(CAST(cum_tokens AS DOUBLE)) * 1e6 + 0.5)"
            " AS BIGINT)"
        ).alias("lx"),
        F.expr(
            "CAST(FLOOR(ln(CAST(cum_vocab AS DOUBLE)) * 1e6 + 0.5)"
            " AS BIGINT)"
        ).alias("ly"),
    )
    pts = scoped_persist(pts)
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.expr("lx * lx")).alias("sxx"),
        F.sum(F.expr("lx * ly")).alias("sxy"),
    )
    return pts.crossJoin(F.broadcast(m)).select(
        "doc_id",
        "cum_tokens",
        "cum_vocab",
        F.expr(
            "round(CAST(n * sxy - sx * sy AS DOUBLE)"
            " / CAST(n * sxx - sx * sx AS DOUBLE), 6)"
        ).alias("heaps_beta"),
        F.expr(
            "round((CAST(sy AS DOUBLE)"
            " - (CAST(n * sxy - sx * sy AS DOUBLE)"
            " / CAST(n * sxx - sx * sx AS DOUBLE))"
            " * CAST(sx AS DOUBLE))"
            " / (CAST(n AS DOUBLE) * 1e6), 6)"
        ).alias("ln_k"),
        F.col("n").alias("n_checkpoints"),
    )


# --- ext_keyword_rake -----------------------------------------------------------

_RAKE_TOPK = 20

_RAKE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
stop AS (
  SELECT token FROM (
    SELECT token, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token ASC)
      AS rn
    FROM tok GROUP BY token
  ) WHERE rn <= 10
),
marked AS (
  SELECT doc_id, token, pos,
         CASE WHEN token IN (SELECT token FROM stop) THEN 1 ELSE 0 END
           AS is_stop
  FROM tok
),
segmented AS (
  SELECT doc_id, token, pos, is_stop,
         CAST(SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS phrase_id
  FROM marked
),
members AS (
  SELECT doc_id, phrase_id, token, pos,
         CAST(COUNT(*) OVER (PARTITION BY doc_id, phrase_id) AS BIGINT)
           AS plen
  FROM segmented WHERE is_stop = 0
),
wstats AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(plen) AS BIGINT) AS deg
  FROM members GROUP BY token
),
wscore AS (
  SELECT token,
         CAST(floor(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE) * 1e9
                    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS sq
  FROM wstats
),
phrases AS (
  SELECT m.doc_id, m.phrase_id,
         string_agg(m.token, ' ' ORDER BY m.pos) AS phrase,
         MAX(m.plen) AS n_words,
         CAST(SUM(w.sq) AS BIGINT) AS score_q
  FROM members m JOIN wscore w ON m.token = w.token
  GROUP BY m.doc_id, m.phrase_id
)
SELECT phrase, CAST(MAX(n_words) AS BIGINT) AS n_words,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(MAX(score_q) AS DOUBLE) / 1e9 AS rake_score
FROM phrases
GROUP BY phrase
ORDER BY MAX(score_q) DESC, phrase ASC
LIMIT {_RAKE_TOPK}
"""


@query("ext_keyword_rake", oracle=_RAKE_ORACLE, tier=3)
def ext_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al.): candidate phrases are
    maximal stopword-free token runs (stopwords = the corpus's global
    top-10 tokens, the ext_quality_score set); each word scores
    degree/frequency (degree = summed length of the phrases it appears
    in), each phrase scores the sum of its member words; top-20 phrases
    corpus-wide — the cheap keyphrase pass a curation pipeline runs for
    topic tagging before anything embedding-based.

    Exactness: freq/deg are exact integers; the word score deg/freq is
    ONE identical IEEE division floor-quantized to the 1e9 grid, so
    phrase scores are exact BIGINT sums (identical phrase strings carry
    identical word multisets, hence identical scores — MAX is a no-op
    disambiguator); the top-20 order (score desc, phrase asc) is total.

    Shape: tokenize with positions map-side; the stopword set is a
    10-row TakeOrdered broadcast; phrase segmentation is ONE doc-keyed
    running-count window (the gaps-and-islands trick on the stop flag);
    word stats are one token-keyed aggregate; phrase assembly is one
    (doc, phrase) aggregate with the word scores broadcast back; top-20
    is TakeOrderedAndProject. Every exchange keys on doc or token —
    nothing global but the bounded stopword/top-k folds
    (EXPECTED_FLAGS)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos0", "token"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")
    stop = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(10)
        .select("token", F.lit(1).alias("is_stop_m"))
    )
    marked = tok.join(F.broadcast(stop), "token", "left").select(
        "doc_id",
        "token",
        "pos",
        F.coalesce("is_stop_m", F.lit(0)).alias("is_stop"),
    )
    segmented = marked.withColumn(
        "phrase_id",
        F.sum("is_stop").over(
            W.partitionBy("doc_id")
            .orderBy("pos")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    members = scoped_persist(
        segmented.filter(F.col("is_stop") == 0).select(
            "doc_id",
            "phrase_id",
            "token",
            "pos",
            F.count(F.lit(1))
            .over(W.partitionBy("doc_id", "phrase_id"))
            .alias("plen"),
        )
    )
    wscore = (
        members.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("plen").alias("deg"),
        )
        .select(
            "token",
            F.expr(
                "CAST(floor(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE)"
                " * 1e9 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
            ).alias("sq"),
        )
    )
    phrases = (
        members.join(wscore, "token")
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("pos", "token"))
                    ),
                    lambda s: s.token,
                ),
                " ",
            ).alias("phrase"),
            F.max("plen").alias("n_words"),
            F.sum("sq").alias("score_q"),
        )
    )
    return (
        phrases.groupBy("phrase")
        .agg(
            F.max("n_words").alias("n_words"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max("score_q").alias("mq"),
        )
        .orderBy(F.desc("mq"), F.asc("phrase"))
        .limit(_RAKE_TOPK)
        .select(
            "phrase",
            "n_words",
            "n_occurrences",
            (F.col("mq").cast("double") / F.expr("1e9")).alias(
                "rake_score"
            ),
        )
    )


# --- ext_lang_confusability -----------------------------------------------------

#: Signature width for the confusability read: top-50 per language (wider
#: than ext_lang_id's 20 so the overlap statistic has resolution).
_CONFUS_TOPK = 50

_CONFUS_ORACLE = f"""
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
),
sig AS (
  SELECT lang, token FROM (
    SELECT lang, token, ROW_NUMBER() OVER (
      PARTITION BY lang ORDER BY COUNT(*) DESC, token ASC
    ) AS rn
    FROM tok GROUP BY lang, token
  ) WHERE rn <= {_CONFUS_TOPK}
),
langs AS (SELECT DISTINCT lang FROM sig),
inter AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM sig a JOIN sig b ON a.token = b.token AND a.lang < b.lang
  GROUP BY 1, 2
)
SELECT la.lang AS lang_a, lb.lang AS lang_b,
       COALESCE(i.n_shared, 0) AS n_shared,
       CAST(COALESCE(i.n_shared, 0) AS DOUBLE)
         / CAST(2 * {_CONFUS_TOPK} - COALESCE(i.n_shared, 0) AS DOUBLE)
         AS signature_jaccard
FROM langs la JOIN langs lb ON la.lang < lb.lang
LEFT JOIN inter i ON i.lang_a = la.lang AND i.lang_b = lb.lang
"""


@query("ext_lang_confusability", oracle=_CONFUS_ORACLE, tier=3)
def ext_lang_confusability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language confusability matrix: for every language pair, how many
    of their top-{_CONFUS_TOPK} token signatures coincide, and the
    signature Jaccard — the a-priori explanation for ext_macro_f1's
    confusion structure (two languages sharing vocabulary are exactly
    where a token-overlap classifier like ext_lang_id must err) and the
    signal a curator reads before trusting per-language corpus splits
    built from that classifier. Zero-overlap pairs report explicitly
    via the language-grid left join.

    Exactness: signature membership is the deterministic (count desc,
    token asc) total order; counts are exact integers; the Jaccard is
    one shared-text division (signature sets have fixed size
    {_CONFUS_TOPK}, so the union is 2k - shared).

    Shape: one (lang, token) counting aggregate — the only data-sized
    exchange — then the per-lang top-k window runs on the
    vocabulary-sized count frame partitioned per language; the
    signature self-join and pair grid are O(langs * k) frames."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split("text", " ")).alias("token"))
    sig_w = W.partitionBy("lang").orderBy(
        F.col("cnt").desc(), F.col("token").asc()
    )
    sig = scoped_persist(
        tok.groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(sig_w))
        .filter(F.col("rn") <= _CONFUS_TOPK)
        .select("lang", "token")
    )
    langs = sig.select("lang").distinct()
    inter = (
        sig.alias("a")
        .join(
            sig.alias("b"),
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.lang") < F.col("b.lang")),
        )
        .groupBy(
            F.col("a.lang").alias("lang_a"),
            F.col("b.lang").alias("lang_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    grid = (
        langs.select(F.col("lang").alias("lang_a"))
        .join(
            F.broadcast(langs.select(F.col("lang").alias("lang_b"))),
            F.col("lang_a") < F.col("lang_b"),
        )
    )
    return (
        grid.join(F.broadcast(inter), ["lang_a", "lang_b"], "left")
        .select(
            "lang_a",
            "lang_b",
            F.coalesce("n_shared", F.lit(0).cast("long")).alias(
                "n_shared"
            ),
        )
        .select(
            "lang_a",
            "lang_b",
            "n_shared",
            F.expr(
                f"CAST(n_shared AS DOUBLE)"
                f" / CAST(2 * {_CONFUS_TOPK} - n_shared AS DOUBLE)"
            ).alias("signature_jaccard"),
        )
    )


# --- ext_code_switch_detect -----------------------------------------------------

_CODESW_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
  FROM documents
),
sig AS (
  SELECT lang AS sig_lang, token FROM (
    SELECT lang, token, ROW_NUMBER() OVER (
      PARTITION BY lang ORDER BY COUNT(*) DESC, token ASC
    ) AS rn
    FROM tok GROUP BY lang, token
  ) WHERE rn <= 20
),
doc_tok AS (SELECT DISTINCT doc_id, lang, token FROM tok),
marked AS (
  SELECT d.doc_id, d.lang, d.token,
         MAX(CASE WHEN s.sig_lang = d.lang THEN 1 ELSE 0 END) AS own,
         greatest(MAX(CASE WHEN s.sig_lang IS NOT NULL
                       AND s.sig_lang <> d.lang THEN 1 ELSE 0 END)
                  - MAX(CASE WHEN s.sig_lang = d.lang
                        THEN 1 ELSE 0 END), 0) AS frgn
  FROM doc_tok d LEFT JOIN sig s ON d.token = s.token
  GROUP BY d.doc_id, d.lang, d.token
)
SELECT doc_id, lang,
       CAST(COUNT(*) AS BIGINT) AS n_tok_distinct,
       CAST(SUM(own) AS BIGINT) AS n_own_sig,
       CAST(SUM(frgn) AS BIGINT) AS n_foreign_sig,
       CAST(SUM(frgn) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS foreign_frac,
       (5 * SUM(frgn) >= COUNT(*)) AS mixed_flag
FROM marked
GROUP BY doc_id, lang
"""


@query("ext_code_switch_detect", oracle=_CODESW_ORACLE, tier=3)
def ext_code_switch_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switching / language-mix screening per document: the
    fraction of a doc's DISTINCT tokens that belong to ANOTHER
    language's top-20 token signature while NOT belonging to the doc's
    own language's signature (foreign-EXCLUSIVE vocabulary — head
    tokens shared across languages carry no switching signal and are
    excluded by construction) — the curation read that
    separates genuinely multilingual documents (worth keeping, maybe
    routing to both languages' buckets) from mislabeled ones BEFORE a
    hard per-language filter silently drops them; flags docs whose
    foreign-signature share reaches 20% (an integer 5*n >= total
    decision). Completes the lang-ID family: ext_lang_id predicts the
    winner, ext_lang_confusability reads pairwise signature overlap,
    this reads per-document mixing.

    Exactness: signature membership is the deterministic (count desc,
    token asc) top-20 per language (the ext_lang_id signature); own /
    foreign marks are integer MAX flags per distinct (doc, token);
    counts exact; the fraction is one IEEE division.

    Shape: one (lang, token) counting aggregate builds the signatures
    (model-sized: 20 rows x languages, broadcast); the doc side is the
    distinct (doc, token) frame left-joined against that broadcast,
    collapsed by ONE (doc, token) aggregate then ONE doc-keyed rollup —
    both keyed on the doc, co-partitioned, with the token-grain
    exchange being the same distinct every text operator already pays.
    At 100 TB nothing new shuffles beyond the lang-ID plan itself."""
    tok = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    )
    sig_w = W.partitionBy("lang").orderBy(
        F.col("cnt").desc(), F.col("token").asc()
    )
    sig = (
        tok.groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(sig_w))
        .filter(F.col("rn") <= 20)
        .select(F.col("lang").alias("sig_lang"), "token")
    )
    doc_tok = tok.distinct()
    marked = (
        doc_tok.join(F.broadcast(sig), "token", "left")
        .groupBy("doc_id", "lang", "token")
        .agg(
            F.max(
                (F.col("sig_lang") == F.col("lang")).cast("int")
            ).alias("own"),
            F.greatest(
                F.max(
                    (
                        F.col("sig_lang").isNotNull()
                        & (F.col("sig_lang") != F.col("lang"))
                    ).cast("int")
                )
                - F.max(
                    (F.col("sig_lang") == F.col("lang")).cast("int")
                ),
                F.lit(0),
            ).alias("frgn"),
        )
    )
    return marked.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_tok_distinct"),
        F.sum("own").alias("n_own_sig"),
        F.sum("frgn").alias("n_foreign_sig"),
        (
            F.sum("frgn").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("foreign_frac"),
        (5 * F.sum("frgn") >= F.count(F.lit(1))).alias("mixed_flag"),
    )


# --- ext_winnowing_fingerprint --------------------------------------------------

#: Winnowing window: each run of _WINNOW_W consecutive k-gram hashes
#: contributes its (rightmost) minimum — guarantees any shared run of
#: k + _WINNOW_W - 1 tokens between two documents shares a fingerprint
#: (the MOSS detection guarantee).
_WINNOW_W = 4

#: Position packing: combined = hash * 2^20 + (2^20 - 1 - pos), so ONE
#: integer MIN per window yields (min hash, rightmost position) — the
#: tie rule of robust winnowing — and both decode exactly.
_WINNOW_POS_M = 1 << 20

_WINNOW_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
pos AS (
  SELECT doc_id,
         CAST(len(t) - 2 AS BIGINT) AS m,
         CAST(i AS BIGINT) AS p,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
  FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 3
),
hashed AS (
  SELECT doc_id, m, p,
         list_reduce(list_transform(string_split(sh, ''),
                                    c -> CAST(ascii(c) AS BIGINT)),
                     (a, b) -> (a * 31 + b) % 2147483647) AS h
  FROM pos
),
packed AS (
  SELECT doc_id, m, p,
         h * {_WINNOW_POS_M} + ({_WINNOW_POS_M} - 1 - p) AS comb
  FROM hashed
),
wins AS (
  SELECT doc_id, m, p,
         MIN(comb) OVER (PARTITION BY doc_id ORDER BY p ASC
                         ROWS BETWEEN CURRENT ROW
                         AND {_WINNOW_W - 1} FOLLOWING) AS wmin
  FROM packed
),
sel AS (
  SELECT DISTINCT doc_id, m,
         wmin // {_WINNOW_POS_M} AS fp,
         {_WINNOW_POS_M} - 1 - (wmin % {_WINNOW_POS_M}) AS sel_p
  FROM wins WHERE p <= m - {_WINNOW_W - 1}
)
SELECT doc_id,
       CAST(ANY_VALUE(m) AS BIGINT) AS n_grams,
       CAST(ANY_VALUE(m) - {_WINNOW_W - 1} AS BIGINT) AS n_windows,
       CAST(COUNT(*) AS BIGINT) AS n_selected,
       CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_distinct_fp,
       CAST(MIN(fp) AS BIGINT) AS min_fp,
       CAST(COUNT(*) AS DOUBLE)
         / CAST(ANY_VALUE(m) - {_WINNOW_W - 1} AS DOUBLE) AS density
FROM sel
GROUP BY doc_id
"""


@query("ext_winnowing_fingerprint", oracle=_WINNOW_ORACLE, tier=3)
def ext_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust winnowing (the MOSS fingerprint selection, Schleimer/
    Wilkerson/Aiken): slide a w=4 window over each document's ORDERED
    3-token-shingle hash sequence and keep the (rightmost) minimum of
    every window — the position-aware complement to
    ext_doc_fingerprint's min-k sketch. Winnowing's guarantee is what a
    plagiarism / near-dup LOCALIZER needs: any shared run of
    k + w - 1 = 6 tokens between two documents is certain to share a
    selected fingerprint, while the min-k sketch can miss local overlap
    entirely on long documents. Emits the per-doc selection audit
    (selected count, distinct fingerprints, density vs the 2/(w+1)
    theoretical rate).

    Exactness: the shingle hash is the shared polynomial rolling hash
    (ext_doc_fingerprint's); the window minimum runs on the PACKED
    integer hash*2^20 + (2^20-1-pos) so one MIN yields both the minimal
    hash and its rightmost position exactly; counts exact; density one
    IEEE division.

    Shape: scan -> posexplode of the shingle array -> per-row hash
    (whole-stage codegen, the doc_fingerprint path) -> ONE doc-keyed
    running-min window (co-partitioned with the doc key, frame bounded
    by w) -> distinct + ONE doc-keyed aggregate. The only data-sized
    exchange is the doc-keyed shuffle every text operator pays; at
    100 TB nothing is corpus-global — selection is per-document and
    embarrassingly parallel."""
    from ..session import widen_scan
    from .llm_pipeline import _SHINGLES_FROM_T

    d = widen_scan(load(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.split("text", " ").alias("t")
    ).filter(F.size("t") >= 3)
    sh = toks.select(
        "doc_id",
        (F.size("t") - 2).cast("long").alias("m"),
        F.posexplode(F.expr(_SHINGLES_FROM_T)).alias("pos0", "sh"),
    ).select(
        "doc_id", "m", (F.col("pos0") + 1).cast("long").alias("p"), "sh"
    )
    codes = sh.select(
        "doc_id",
        "m",
        "p",
        F.expr(
            "transform(split(sh, ''), c -> CAST(ascii(c) AS BIGINT))"
        ).alias("cs"),
    )
    h = F.expr(
        "aggregate(slice(cs, 2, size(cs) - 1), cs[0], "
        "(a, b) -> (a * 31 + b) % 2147483647)"
    )
    packed = codes.select(
        "doc_id",
        "m",
        "p",
        (
            h * F.lit(_WINNOW_POS_M)
            + (F.lit(_WINNOW_POS_M - 1) - F.col("p"))
        ).alias("comb"),
    )
    wmin = F.min("comb").over(
        W.partitionBy("doc_id").orderBy(F.asc("p")).rowsBetween(
            0, _WINNOW_W - 1
        )
    )
    sel = (
        packed.select("doc_id", "m", "p", wmin.alias("wmin"))
        .filter(F.col("p") <= F.col("m") - (_WINNOW_W - 1))
        .select(
            "doc_id",
            "m",
            F.expr(f"wmin DIV {_WINNOW_POS_M}").alias("fp"),
            (
                F.lit(_WINNOW_POS_M - 1)
                - (F.col("wmin") % F.lit(_WINNOW_POS_M))
            ).alias("sel_p"),
        )
        .distinct()
    )
    return sel.groupBy("doc_id").agg(
        F.any_value(F.col("m")).alias("n_grams"),
        (F.any_value(F.col("m")) - (_WINNOW_W - 1)).alias("n_windows"),
        F.count(F.lit(1)).alias("n_selected"),
        F.countDistinct("fp").alias("n_distinct_fp"),
        F.min("fp").alias("min_fp"),
        (
            F.count(F.lit(1)).cast("double")
            / (F.any_value(F.col("m")) - (_WINNOW_W - 1)).cast("double")
        ).alias("density"),
    )
