"""Corpus-curation operators for training-data pipelines (north-star
mandate, SURVEY.md §2.10): benchmark decontamination, temperature-flattened
domain mixing, dedup application, and sequence packing.

Scale design:
- decontamination: the benchmark n-gram set is tiny relative to the corpus
  (eval suites are MBs, corpora are TBs), so it broadcasts; the corpus side
  streams through one explode + broadcast-hash-join + one groupBy shuffle
  keyed by doc_id. N-grams cross the join as xxhash64 longs, never strings.
- domain mix: per-source counts are a 20-row aggregate; the keep decision is
  a pure map-side hash-threshold predicate (same discipline as
  ext_sample_stratified) — no reservoir, no global sort, reproducible on
  any cluster size.
- dedup apply: one hash-shuffle to find keepers (window over sha256) + one
  small audit aggregate. The shuffle key is a 64-char digest, never text.
- sequence packing: first-fit-decreasing bin packing is inherently
  sequential WITHIN a bin stream, so it runs per-language via
  ``applyInPandas`` (each language's stream packs independently); at 100 TB
  the group key would be (lang, shard) with one packer per shard — packing
  quality degrades only at shard boundaries (FFD is 11/9·OPT+1 per shard).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import load

# --- ext_decontaminate ------------------------------------------------------

# Benchmark set = every 97th doc plus one fixed 8-token eval snippet (a
# held-out eval suite); docs with doc_id % 23 == 1 get that snippet
# appended — a planted leak, so the operator demonstrably fires on ~4% of
# the corpus (plus the benchmark docs themselves, which self-overlap and
# act as positive controls). Overlap is counted on 8-gram shingles, the standard
# decontamination unit scaled to these ~50-token fixtures (real pipelines
# use 13-grams on full documents).
_SNIPPET = "eval probe alpha beta gamma delta epsilon zeta"

_DECON_ORACLE = f"""
WITH synth AS (
  SELECT doc_id,
         CASE WHEN doc_id % 23 = 1 THEN text || ' {_SNIPPET}' ELSE text END
           AS text
  FROM documents
), toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM synth
), grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 6, 1)),
                               i -> array_to_string(t[i:i+7], ' '))) AS g
  FROM toks
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0
  UNION
  SELECT '{_SNIPPET}' AS g
)
SELECT doc_id,
       COUNT(*) AS n_grams,
       COUNT(b.g) AS n_shared,
       COUNT(b.g) > 0 AS contaminated,
       doc_id % 97 = 0 AS is_benchmark
FROM grams LEFT JOIN bench b USING (g)
GROUP BY doc_id
"""


@query("ext_decontaminate", oracle=_DECON_ORACLE, tier=3)
def ext_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag docs sharing any 8-gram with the
    held-out benchmark subset. The benchmark gram set broadcasts (eval
    suites are tiny next to the corpus); grams travel as xxhash64 longs.
    64-bit collisions could miscount at extreme scale (same caveat as the
    minhash shingle space — birthday bound ~4e9 distinct grams).
    widen_scan: the gram explode+hash otherwise runs at the scan's task
    count (one row-group = one core)."""
    from ..session import widen_scan

    d = widen_scan(load(spark, sf_dir, "documents")).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 23 == 1,
            F.concat(F.col("text"), F.lit(f" {_SNIPPET}")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    t = F.split(F.col("text"), " ")
    grams_arr = F.when(
        F.size(t) >= 8,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 7),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(t, i, 8))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    grams = d.select(
        "doc_id", F.explode(F.array_distinct(grams_arr)).alias("g")
    )
    bench = (
        grams.filter(F.col("doc_id") % 97 == 0)
        .select("g")
        .union(spark.range(1).select(F.xxhash64(F.lit(_SNIPPET)).alias("g")))
        .distinct()
    )
    hit = bench.withColumn("hit", F.lit(1))
    return (
        grams.join(F.broadcast(hit), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_shared"),
            (F.count("hit") > 0).alias("contaminated"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_shared",
            "contaminated",
            (F.col("doc_id") % 97 == 0).alias("is_benchmark"),
        )
    )


# --- ext_domain_mix_sample --------------------------------------------------

# Temperature-flattened source mixing (alpha = 0.5): target per-source keep
# rate r_s = sqrt(min_count / n_s) — the smallest source keeps everything,
# larger sources are downsampled toward a flatter mix (the multilingual /
# multi-domain sampling rule from public LM training recipes). The keep
# decision is the same deterministic Knuth-hash threshold the stratified
# sampler uses, evaluated map-side; sqrt and the division are IEEE-exact in
# both engines, so the bigint threshold matches bit-for-bit.
_MIX_ORACLE = """
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
), mn AS (
  SELECT MIN(n_docs) AS min_n FROM counts
), rates AS (
  SELECT source, n_docs,
         CAST(floor(sqrt(CAST(min_n AS DOUBLE) / n_docs) * 1000000) AS BIGINT)
           AS keep_threshold
  FROM counts CROSS JOIN mn
)
SELECT d.source, r.n_docs, r.keep_threshold,
       COUNT(*) FILTER ((d.doc_id * 2654435761) % 1000000 < r.keep_threshold)
         AS n_kept
FROM documents d JOIN rates r USING (source)
GROUP BY d.source, r.n_docs, r.keep_threshold
"""


@query("ext_domain_mix_sample", oracle=_MIX_ORACLE, tier=3)
def ext_domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source temperature sampling audit: counts, bigint hash threshold,
    kept rows. Rates derive from a 20-row aggregate (broadcast back); the
    per-doc decision is map-side, so the plan is two tiny shuffles
    regardless of corpus size."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    min_n = counts.agg(F.min("n_docs").alias("min_n"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        "source",
        "n_docs",
        F.floor(
            F.sqrt(F.col("min_n").cast("double") / F.col("n_docs")) * 1000000
        )
        .cast("long")
        .alias("keep_threshold"),
    )
    keep = (F.col("doc_id") * F.lit(2654435761)) % 1000000 < F.col(
        "keep_threshold"
    )
    return (
        d.join(F.broadcast(rates), "source")
        .groupBy("source", "n_docs", "keep_threshold")
        .agg(F.count(F.when(keep, 1)).alias("n_kept"))
        .select("source", "n_docs", "keep_threshold", "n_kept")
    )


# --- ext_dedup_apply --------------------------------------------------------

# The "apply" stage of exact dedup: keep the min-doc_id copy of each text,
# audit the reduction per (lang, source). Reuses the synthesized-duplicates
# corpus from llm_pipeline so the reduction is non-trivial.
_APPLY_ORACLE = """
WITH corpus AS (
  SELECT * FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
  FROM documents WHERE doc_id % 5 = 0
), keyed AS (
  SELECT lang, source, doc_id, n_chars,
         MIN(doc_id) OVER (PARTITION BY sha256(text)) AS keeper
  FROM corpus
)
SELECT lang, source,
       COUNT(*) AS n_before,
       COUNT(*) FILTER (doc_id = keeper) AS n_after,
       COALESCE(CAST(SUM(n_chars) FILTER (doc_id <> keeper) AS BIGINT), 0)
         AS chars_dropped
FROM keyed
GROUP BY lang, source
"""


@query("ext_dedup_apply", oracle=_APPLY_ORACLE, tier=3)
def ext_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup application audit: per (lang, source) rows before/after
    keeping only the min-doc_id copy of each distinct text. One window
    shuffle keyed on the 32-byte digest + one small audit aggregate."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    corpus = d.unionAll(
        d.filter(F.col("doc_id") % 5 == 0).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        )
    )
    keeper = F.min("doc_id").over(W.partitionBy(F.sha2("text", 256)))
    keyed = corpus.select(
        "lang", "source", "doc_id", "n_chars", keeper.alias("keeper")
    )
    dropped = F.col("doc_id") != F.col("keeper")
    return keyed.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_before"),
        F.count(F.when(~dropped, 1)).alias("n_after"),
        F.coalesce(
            F.sum(F.when(dropped, F.col("n_chars"))), F.lit(0)
        ).alias("chars_dropped"),
    )


# --- ext_seq_pack -----------------------------------------------------------

_PACK_CAPACITY = 2048

_PACK_SCHEMA = "doc_id bigint, lang string, n_tok bigint, bin_id bigint"


def _pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """First-fit-decreasing packing of one language's docs into
    token-capacity bins. Deterministic: sort by (n_tok desc, doc_id)."""
    pdf = pdf.sort_values(
        ["n_tok", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    bin_free: list[int] = []
    bin_ids = []
    for n_tok in pdf["n_tok"]:
        for b, free in enumerate(bin_free):
            if free >= n_tok:
                bin_free[b] = free - n_tok
                bin_ids.append(b)
                break
        else:
            bin_free.append(_PACK_CAPACITY - n_tok)
            bin_ids.append(len(bin_free) - 1)
    pdf["bin_id"] = pd.Series(bin_ids, dtype="int64")
    return pdf[["doc_id", "lang", "n_tok", "bin_id"]]


def seq_pack_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bin assignment: first-fit-decreasing packing into
    <=2048-token training bins per language inside ``applyInPandas``.

    Packing is the one curation step that is genuinely sequential per
    output stream, so it's the honest Pandas-UDF case (Arrow batches, one
    group per language; shard the group key to scale out). This is the
    user-facing surface; the declared query below aggregates it into an
    oracle-checkable summary."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tok"),
    )
    return d.groupBy("lang").applyInPandas(_pack_group, schema=_PACK_SCHEMA)


_SEQ_PACK_ORACLE = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tok,
       TRUE AS packing_ok
FROM (
  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
) t
GROUP BY lang
"""


@query("ext_seq_pack", oracle=_SEQ_PACK_ORACLE, tier=3)
def ext_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, hash-oracled via conservation laws: runs the full
    FFD packing (:func:`seq_pack_assignments`), then declares the per-lang
    summary whose exact values ARE SQL-expressible — doc count and total
    tokens (conservation: packing must neither drop nor duplicate a doc or
    a token) — plus ``packing_ok``, an in-plan assertion of the invariants
    a SQL oracle cannot recompute: every over-capacity bin holds exactly
    one (oversize) doc, and the bin count stays within the FFD guarantee
    ``n_bins - n_oversize <= (11 * ceil(norm_tok/C)) DIV 9 + 1``. The
    oracle emits ``TRUE``, so a packing bug (lost doc, split doc,
    over-filled bin, pathological bin blowup) now FAILS the value-hash
    check — strictly stronger than the old rows-only declaration. All
    bound arithmetic is integer (DIV), so no float rounding at the edge.
    Per-doc assignments remain available via :func:`seq_pack_assignments`
    and are invariant-tested directly in tests/test_round2.py."""
    cap = _PACK_CAPACITY
    packed = seq_pack_assignments(spark, sf_dir)
    fills = packed.groupBy("lang", "bin_id").agg(
        F.sum("n_tok").alias("fill"), F.count(F.lit(1)).alias("n_in_bin")
    )
    over = F.col("fill") > cap
    summary = fills.groupBy("lang").agg(
        F.sum("n_in_bin").alias("n_docs"),
        F.sum("fill").alias("total_tok"),
        F.count(F.lit(1)).alias("n_bins"),
        F.sum(F.when(over, 1).otherwise(0)).alias("n_over"),
        F.sum(F.when(over, F.col("fill")).otherwise(0)).alias("over_tok"),
        F.max(F.when(over, F.col("n_in_bin")).otherwise(1)).alias(
            "max_over_docs"
        ),
    )
    # FFD bound with norm_lb = ceil((total_tok - over_tok)/cap), all DIV
    ffd_ok = (F.col("n_bins") - F.col("n_over")) <= (
        F.expr(f"(11 * ((total_tok - over_tok + {cap} - 1) DIV {cap})) DIV 9")
        + 1
    )
    return summary.select(
        "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("total_tok").cast("bigint").alias("total_tok"),
        ((F.col("max_over_docs") <= 1) & ffd_ok).alias("packing_ok"),
    )


# --- ext_bloom_decontaminate ------------------------------------------------

# Same planted-leak synthetic corpus as ext_decontaminate (doc_id % 23 == 1
# docs get the eval snippet appended; every 97th doc is the benchmark set),
# so the exact answers coincide — what changes is the MECHANISM. At eval-
# suite scale the benchmark gram set broadcasts raw (ext_decontaminate);
# when the held-out set is itself corpus-sized (decontaminating train
# against a multi-TB val split), broadcasting raw grams stops working. The
# Bloom path broadcasts a FIXED-SIZE bitmap instead (m bits regardless of
# set size), prefilters corpus grams map-side, and only the bloom-passing
# sliver shuffles into the exact verification join — bloom has no false
# negatives, so exact verify on the survivors reproduces the exact answer.
_BLOOM_M = 1 << 20  # bits; ~4e3 benchmark grams at sf0.01 -> fp ~1e-9/gram
_BLOOM_WORDS = _BLOOM_M // 64
_BLOOM_K = 3

_BLOOM_ORACLE = f"""
WITH synth AS (
  SELECT doc_id,
         CASE WHEN doc_id % 23 = 1 THEN text || ' {_SNIPPET}' ELSE text END
           AS text
  FROM documents
), toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM synth
), grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 6, 1)),
                               i -> array_to_string(t[i:i+7], ' '))) AS g
  FROM toks
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0
  UNION
  SELECT '{_SNIPPET}' AS g
)
SELECT doc_id,
       COUNT(b.g) AS n_shared,
       COUNT(b.g) > 0 AS contaminated
FROM grams LEFT JOIN bench b USING (g)
GROUP BY doc_id
"""


def _bloom_positions(gram_hash):
    """k probe positions for a 64-bit gram hash, derived Kirsch-Mitzenmacher
    style (h1 + i*h2) so the plan computes ONE xxhash64 per gram, not k.
    h2 is forced odd => stride is a unit mod 2^20, probes never collapse."""
    h1 = F.pmod(gram_hash, F.lit(_BLOOM_M))
    h2 = F.pmod(F.shiftrightunsigned(gram_hash, 20), F.lit(_BLOOM_M))
    h2 = h2 + (1 - F.pmod(h2, F.lit(2)))  # make odd
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(_BLOOM_M)).cast("int")
        for i in range(_BLOOM_K)
    ]


@query("ext_bloom_decontaminate", oracle=_BLOOM_ORACLE, tier=3)
def ext_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decontamination through a Bloom-filter prefilter.

    Build: benchmark grams -> k bit positions each (Kirsch-Mitzenmacher
    double hashing off one xxhash64) -> groupBy(word index).bit_or(mask)
    -> a <= 16384-row bitmap frame, broadcast. The bitmap is FIXED SIZE:
    at 100 TB you size m to the benchmark cardinality and it still
    broadcasts while the raw gram set no longer would.

    Probe: each corpus gram left-joins the bitmap k times on word index
    (all broadcasts, zero exchanges) and survives only if every probed bit
    is set. Survivors — true matches plus ~fp*n grams — are the ONLY rows
    entering the exact verification join (unhinted: at real benchmark
    scale that side is shuffle-sized, and the candidate side has already
    been cut by orders of magnitude). No false negatives, so the final
    (doc_id, n_shared, contaminated) is exact — same oracle as the
    broadcast-set path. tests/test_round4.py pins the superset invariant
    and the false-positive rate."""
    from ..session import widen_scan

    d = widen_scan(load(spark, sf_dir, "documents")).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 23 == 1,
            F.concat(F.col("text"), F.lit(f" {_SNIPPET}")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    t = F.split(F.col("text"), " ")
    grams_arr = F.when(
        F.size(t) >= 8,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 7),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(t, i, 8))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    from ..session import scoped_persist

    # persisted: the gram frame feeds the benchmark extraction, the bitmap
    # build, and the probe — without the persist the tokenize+hash explode
    # runs three times
    grams = scoped_persist(
        d.select("doc_id", F.explode(F.array_distinct(grams_arr)).alias("g"))
    )
    # persisted: the benchmark gram set is read twice — the bitmap build
    # and the exact verification join
    bench = scoped_persist(
        grams.filter(F.col("doc_id") % 97 == 0)
        .select("g")
        .union(spark.range(1).select(F.xxhash64(F.lit(_SNIPPET)).alias("g")))
        .distinct()
    )

    # bitmap: one row per 64-bit word that has any bit set (shiftleft's
    # Python signature wants a literal shift, so the variable shift goes
    # through the SQL form on a named position column). Persisted: it is
    # broadcast k times below, once per probe.
    pos = F.explode(F.array(*_bloom_positions(F.col("g")))).alias("pos")
    _mask = "shiftleft(CAST(1 AS BIGINT), CAST(pmod({p}, 64) AS INT))"
    bitmap = scoped_persist(
        bench.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            F.expr(_mask.format(p="pos")).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )

    # probe: all k bits must be present. Probes run as SEQUENTIAL inner
    # joins, each followed immediately by its bit test: probe 0 rejects
    # ~(1 - set_bits/m) of the corpus grams before probes 1..k-1 ever
    # compute their positions or join (the earlier form ran all k left
    # joins over the FULL gram stream and filtered only at the end). An
    # inner join + bit filter is equivalent to that left join's
    # (_word IS NOT NULL AND bit set) conjunct: bitmap rows exist
    # exactly for the words with any set bit, and conjunct order cannot
    # change a pure filter's result set.
    probe = grams
    for i, p in enumerate(_bloom_positions(F.col("g"))):
        bm = F.broadcast(
            bitmap.select(
                F.col("word_idx").alias(f"_w{i}"),
                F.col("word").alias(f"_word{i}"),
            )
        )
        probe = (
            probe.withColumn(f"_p{i}", p)
            .withColumn(f"_w{i}", (F.col(f"_p{i}") / 64).cast("int"))
            .withColumn(f"_m{i}", F.expr(_mask.format(p=f"_p{i}")))
            .join(bm, f"_w{i}")
            .filter(F.expr(f"(_word{i} & _m{i}) != 0"))
        )
    passed = probe.select("doc_id", "g")

    # exact verify on the bloom survivors only (unhinted join: at real
    # benchmark scale both sides are shuffle-sized, and AQE will still
    # broadcast the smaller side when it fits)
    verified = passed.join(bench.withColumn("hit", F.lit(1)), "g", "left")
    hits = verified.groupBy("doc_id").agg(F.count("hit").alias("n_shared"))
    # aggregate over the GRAM frame's doc set, not all of d: the oracle's
    # GROUP BY runs over grams, so a doc too short to produce any 8-gram
    # (possible under fixture regeneration) must be absent here too — the
    # sibling ext_decontaminate has the same contract (ADVICE r4).
    # The set is derived map-side from the documents scan (a doc grams iff
    # it has >= 8 tokens), not by a distinct over the gram table — the
    # latter shuffles the whole exploded gram frame just to recover doc
    # ids the scan already knows.
    has_grams = d.select(
        "doc_id", F.size(F.split("text", " ")).alias("_nt")
    ).filter(F.col("_nt") >= 8).select("doc_id")
    return (
        has_grams
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# --- ext_curation_pipeline --------------------------------------------------

# The composed end-to-end curation funnel: length gate -> repetition gate
# -> quality gate -> exact dedup, each stage applied to the previous
# stage's survivors, reported as the per-stage attrition table every
# pretraining data run publishes. Built BY COMPOSITION: the quality and
# repetition signals come from the declared operators' own DataFrames
# (text_analysis.ext_quality_score, corpus_hygiene.ext_repetition_score),
# so this is the "a user wires existing operators into a pipeline" path,
# not a re-implementation.
_PIPE_ORACLE = """
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
), rep AS (
  SELECT doc_id,
         CASE WHEN len(grams) > 0
              THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
                   / len(grams)
              ELSE 0.0 END AS rep_ratio
  FROM (
    SELECT doc_id,
           list_transform(range(1, len(string_split(text, ' '))),
                          i -> string_split(text, ' ')[i] || ' '
                               || string_split(text, ' ')[i+1]) AS grams
    FROM documents
  )
), flags AS (
  SELECT d.doc_id, d.text,
         p.n_tokens >= 20 AS k1,
         p.n_tokens >= 20 AND r.rep_ratio <= 0.05 AS k2,
         p.n_tokens >= 20 AND r.rep_ratio <= 0.05
           AND (0.4 * least(CAST(p.n_tokens AS DOUBLE) / 100.0, 1.0)
                + 0.3 * (1.0 - CAST(p.n_stop AS DOUBLE) / p.n_tokens)
                + 0.3 * (CAST(p.n_distinct AS DOUBLE) / p.n_tokens)) >= 0.5
           AS k3
  FROM documents d
  JOIN per_doc p USING (doc_id) JOIN rep r USING (doc_id)
), keeper AS (
  SELECT doc_id, k1, k2, k3,
         k3 AND doc_id = MIN(CASE WHEN k3 THEN doc_id END)
                           OVER (PARTITION BY text) AS k4
  FROM flags
), funnel AS (
  SELECT COUNT(*) AS n0,
         COUNT(*) FILTER (k1) AS n1,
         COUNT(*) FILTER (k2) AS n2,
         COUNT(*) FILTER (k3) AS n3,
         COUNT(*) FILTER (k4) AS n4
  FROM keeper
)
SELECT stage, n_in, n_kept FROM (
  SELECT '1_length' AS stage, n0 AS n_in, n1 AS n_kept FROM funnel
  UNION ALL SELECT '2_repetition', n1, n2 FROM funnel
  UNION ALL SELECT '3_quality', n2, n3 FROM funnel
  UNION ALL SELECT '4_dedup', n3, n4 FROM funnel
)
"""


@query("ext_curation_pipeline", oracle=_PIPE_ORACLE, tier=3)
def ext_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation funnel over the declared operators' outputs:
    ext_quality_score supplies n_tokens + quality_score,
    ext_repetition_score supplies rep_ratio; this operator only wires the
    gates (length >= 20 tokens, rep_ratio <= 5%, quality >= 0.5, exact
    dedup keep-min-id among survivors) and counts the attrition. Joins
    are doc_id-keyed (co-partitioned with both producers' outputs), the
    dedup keeper is a min-over-text-partition window restricted to
    stage-3 survivors, and the funnel collapses to ONE 1-row aggregate
    unpivoted to the 4 stage rows — at 100 TB the expensive work is the
    producers' (already audited) plans; the composition adds two joins
    and a digest-keyed window. The dedup window partitions on sha2(text)
    (the oracle partitions on raw text — same equivalence classes), so
    the shuffle moves 32-byte digests, not documents."""
    from ..operators.corpus_hygiene import ext_repetition_score
    from ..operators.text_analysis import ext_quality_score

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    q = ext_quality_score(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality_score"
    )
    r = ext_repetition_score(spark, sf_dir).select("doc_id", "rep_ratio")
    flags = (
        d.join(q, "doc_id")
        .join(r, "doc_id")
        .select(
            "doc_id",
            F.sha2("text", 256).alias("digest"),
            (F.col("n_tokens") >= 20).alias("k1"),
            ((F.col("n_tokens") >= 20) & (F.col("rep_ratio") <= 0.05)).alias(
                "k2"
            ),
            (
                (F.col("n_tokens") >= 20)
                & (F.col("rep_ratio") <= 0.05)
                & (F.col("quality_score") >= 0.5)
            ).alias("k3"),
        )
    )
    from pyspark.sql import Window as W

    min_k3 = F.min(F.when(F.col("k3"), F.col("doc_id"))).over(
        W.partitionBy("digest")
    )
    keeper = flags.withColumn(
        "k4", F.col("k3") & (F.col("doc_id") == min_k3)
    )
    funnel = keeper.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.col("k1").cast("long")).alias("n1"),
        F.sum(F.col("k2").cast("long")).alias("n2"),
        F.sum(F.col("k3").cast("long")).alias("n3"),
        F.sum(F.col("k4").cast("long")).alias("n4"),
    )
    return funnel.select(
        F.expr(
            "stack(4, '1_length', n0, n1, '2_repetition', n1, n2,"
            " '3_quality', n2, n3, '4_dedup', n3, n4)"
            " AS (stage, n_in, n_kept)"
        )
    )


# --- ext_length_bucket_batching ---------------------------------------------

# Inference/serving batching audit: bucket documents by token length
# (width 16) and measure the padding waste of batching within buckets vs
# padding the whole corpus to its global max — the standard
# sort-by-length batching win, quantified. Integer arithmetic throughout.
_LENBUCKET_ORACLE = """
WITH lens AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
), mx AS (
  SELECT MAX(n_tok) AS global_max FROM lens
)
SELECT CAST(n_tok // 16 AS BIGINT) AS bucket,
       COUNT(*) AS n_docs,
       MAX(n_tok) AS bucket_max,
       CAST(COUNT(*) * MAX(n_tok) - SUM(n_tok) AS BIGINT) AS pad_bucketed,
       CAST(COUNT(*) * MIN(mx.global_max) - SUM(n_tok) AS BIGINT)
         AS pad_naive
FROM lens CROSS JOIN mx
GROUP BY bucket
"""


@query("ext_length_bucket_batching", oracle=_LENBUCKET_ORACLE, tier=3)
def ext_length_bucket_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit: per 16-token bucket, the padding
    tokens wasted when batching inside the bucket (pad to bucket max)
    vs padding every doc to the corpus max. One map-side length
    projection, one bucket-keyed aggregate (O(range/16) groups), and a
    1-row global-max broadcast — the waste ratio this reports is exactly
    why inference pipelines sort by length before batching. All integer
    arithmetic; no float parity concerns."""
    d = load(spark, sf_dir, "documents")
    lens = d.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    gmax = lens.agg(F.max("n_tok").alias("global_max"))
    return (
        lens.crossJoin(F.broadcast(gmax))
        .groupBy((F.col("n_tok") / 16).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tok").alias("bucket_max"),
            (
                F.count(F.lit(1)) * F.max("n_tok") - F.sum("n_tok")
            ).cast("bigint").alias("pad_bucketed"),
            (
                F.count(F.lit(1)) * F.min("global_max") - F.sum("n_tok")
            ).cast("bigint").alias("pad_naive"),
        )
    )


# --- ext_overlap_kmv ----------------------------------------------------------

#: KMV (bottom-k / k-minimum-values) sketch size. Relative error of the
#: distinct-count estimator is ~1/sqrt(k-2) ~= 6% at k=256; the
#: Jaccard/containment estimators inherit binomial error on k draws.
_KMV_K = 256

#: 2^48 — the hex-bridge value space (first 12 md5 hex chars as an int;
#: bit-equality of the bridge is pinned in tests/test_round8.py).
_KMV_SPACE = 281474976710656.0

_KMV_ORACLE = f"""
WITH synth AS (
  SELECT doc_id,
         CASE WHEN doc_id % 23 = 1 THEN text || ' {_SNIPPET}' ELSE text END
           AS text
  FROM documents
), toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM synth
), grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 6, 1)),
                               i -> array_to_string(t[i:i+7], ' '))) AS g
  FROM toks
), flagged AS (
  SELECT g,
         MAX(CASE WHEN doc_id % 97 <> 0 THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END) AS in_b
  FROM grams GROUP BY g
), bench_extra AS (
  SELECT '{_SNIPPET}' AS g, 0 AS in_a, 1 AS in_b
), unified AS (
  SELECT g, MAX(in_a) AS in_a, MAX(in_b) AS in_b
  FROM (SELECT * FROM flagged UNION ALL SELECT * FROM bench_extra)
  GROUP BY g
), hashed AS (
  SELECT md5(g) AS h,
         ('0x' || substr(md5(g), 1, 12))::BIGINT AS v,
         in_a, in_b
  FROM unified
), usk AS (
  SELECT * FROM hashed ORDER BY h ASC LIMIT {_KMV_K}
), uagg AS (
  SELECT CAST(SUM(in_a * in_b) AS BIGINT) AS sketch_shared,
         CAST(SUM(in_a * in_b) AS DOUBLE) / COUNT(*) AS est_jaccard,
         CASE WHEN COUNT(*) < {_KMV_K} THEN CAST(COUNT(*) AS DOUBLE)
              ELSE ({_KMV_K} - 1) * {_KMV_SPACE} / MAX(v) END
           AS est_union_size
  FROM usk
), bsk AS (
  SELECT * FROM hashed WHERE in_b = 1 ORDER BY h ASC LIMIT {_KMV_K}
), bagg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS b_sketch_n,
         CAST(SUM(in_a) AS BIGINT) AS b_sketch_in_a,
         CAST(SUM(in_a) AS DOUBLE) / COUNT(*) AS est_containment
  FROM bsk
)
SELECT CAST({_KMV_K} AS BIGINT) AS k,
       u.sketch_shared, u.est_jaccard, u.est_union_size,
       u.est_jaccard * u.est_union_size AS est_shared_size,
       b.b_sketch_n, b.b_sketch_in_a, b.est_containment
FROM uagg u CROSS JOIN bagg b
"""


@query("ext_overlap_kmv", oracle=_KMV_ORACLE, tier=3)
def ext_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination ESTIMATION via a bottom-k (KMV) sketch — the cheap
    pre-pass a 100 TB pipeline runs before committing to exact
    ext_decontaminate: estimate |corpus-grams ∩ benchmark-grams|, the
    Jaccard, and the benchmark-containment fraction from ONE fixed-size
    sketch instead of a full gram join. Same fixture framing as the exact
    key (8-gram space, doc_id%97 benchmark slice, planted snippet), so
    the estimates are test-checkable against the exact operator's truth.

    KMV background (Bar-Yossef et al. 2002; Beyer et al. 2007): the k
    smallest hash values of a set form a uniform sample of its distinct
    elements; |A∪B| ~= (k-1)/u_k (u_k = normalized k-th minimum) and
    Jaccard ~= the shared fraction WITHIN the union's bottom-k, because
    the bottom-k of A∪B is an unbiased sample of A∪B. Containment
    (B's leaked share — the decontamination decision number) uses B's
    OWN bottom-k instead: the union sketch can hold zero benchmark
    members when |B| << |A∪B| (found live — divide-by-zero at k=256 on
    this very fixture), while sampling B directly both always works and
    turns EXACT whenever |B| <= k, which is the common case for eval
    suites.

    Determinism (no RNG, no engine hash): elements rank by their md5 HEX
    string (bit-identical text in both engines); the numeric estimator
    uses the r8 hex bridge — first 12 hex chars as a 48-bit int
    (conv(...,16,10) == ('0x'||prefix)::BIGINT, bit-equality pinned in
    tests/test_round8.py). Every output is exact integer counting inside
    the sketch plus single IEEE divisions of exactly-representable
    values — no rounding needed on either side.

    Shape: gram flags fold in the SAME groupBy that dedups grams (one
    shuffle of gram strings — swap to xxhash64 longs + a tiny md5-keyed
    finalist fetch at extreme scale); the sketch is a global bottom-k =
    TakeOrderedAndProject (per-partition heaps, k rows to the driver
    stage, never a full sort); the estimator is one aggregate over 256
    rows. The corpus is touched once; nothing about the plan changes at
    any corpus size — THE defining property of sketch-based estimation.
    widen_scan: the gram explode otherwise runs at the single-row-group
    scan's task count (one core — measured 4.9 s -> ~1 s at sf0.1; the
    ext_decontaminate precedent)."""
    from ..session import widen_scan

    d = widen_scan(load(spark, sf_dir, "documents")).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 23 == 1,
            F.concat(F.col("text"), F.lit(f" {_SNIPPET}")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    t = F.split(F.col("text"), " ")
    grams_arr = F.when(
        F.size(t) >= 8,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 7),
            lambda gi: F.concat_ws(" ", F.slice(t, gi, 8)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = d.select(
        "doc_id", F.explode(F.array_distinct(grams_arr)).alias("g")
    )
    flagged = grams.groupBy("g").agg(
        F.max(
            F.when(F.col("doc_id") % 97 != 0, 1).otherwise(0)
        ).alias("in_a"),
        F.max(F.when(F.col("doc_id") % 97 == 0, 1).otherwise(0)).alias(
            "in_b"
        ),
    )
    extra = spark.createDataFrame(
        [(_SNIPPET, 0, 1)], "g string, in_a int, in_b int"
    )
    unified = (
        flagged.unionAll(extra)
        .groupBy("g")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    # md5 once per distinct gram; v derives from the already-computed hex
    hashed = unified.select(
        F.md5("g").alias("h"), "in_a", "in_b"
    ).select(
        "h",
        F.conv(F.substring("h", 1, 12), 16, 10).cast("bigint").alias("v"),
        "in_a",
        "in_b",
    )
    from ..session import scoped_persist

    hashed = scoped_persist(hashed)  # feeds both sketches
    shared = F.sum(F.col("in_a") * F.col("in_b"))
    # NOT-FULL-SKETCH GUARD (ADVICE r9): when the corpus has fewer than k
    # distinct grams the bottom-k IS the whole set — divide by the actual
    # sketch row count (always <= k via the LIMIT) and report the exact
    # count as the union size, mirroring the containment branch, instead
    # of silently misreporting through the constant-k formulas.
    n_sk = F.count(F.lit(1))
    est_j = shared.cast("double") / n_sk
    est_u = F.when(n_sk < _KMV_K, n_sk.cast("double")).otherwise(
        (_KMV_K - 1) * F.lit(_KMV_SPACE) / F.max("v")
    )
    uagg = (
        hashed.orderBy(F.col("h").asc())
        .limit(_KMV_K)
        .agg(
            shared.cast("long").alias("sketch_shared"),
            est_j.alias("est_jaccard"),
            est_u.alias("est_union_size"),
        )
    )
    bagg = (
        hashed.filter(F.col("in_b") == 1)
        .orderBy(F.col("h").asc())
        .limit(_KMV_K)
        .agg(
            F.count(F.lit(1)).cast("long").alias("b_sketch_n"),
            F.sum("in_a").cast("long").alias("b_sketch_in_a"),
            (F.sum("in_a").cast("double") / F.count(F.lit(1))).alias(
                "est_containment"
            ),
        )
    )
    return uagg.crossJoin(F.broadcast(bagg)).select(
        F.lit(_KMV_K).cast("long").alias("k"),
        "sketch_shared",
        "est_jaccard",
        "est_union_size",
        (F.col("est_jaccard") * F.col("est_union_size")).alias(
            "est_shared_size"
        ),
        "b_sketch_n",
        "b_sketch_in_a",
        "est_containment",
    )


# --- ext_url_canonical_dedup --------------------------------------------------

# Synthesized crawl URLs: five deterministic "mirror" decorations of the
# same logical resource (case-folded host, explicit default port,
# utm-tracking query with one REAL param interleaved, fragment + trailing
# slash, and the clean form) keyed on doc_id % 5, with the logical
# resource id doc_id % 211 so multiple docs genuinely collide onto one
# canonical URL — the shape a web-crawl frontier dedup actually faces.
_URLC_RAW = """CASE doc_id % 5
  WHEN 0 THEN 'https://www.example.com/p/' || CAST(doc_id % 211 AS STRING)
  WHEN 1 THEN 'HTTPS://WWW.Example.COM/p/' || CAST(doc_id % 211 AS STRING)
  WHEN 2 THEN 'https://www.example.com:443/p/' || CAST(doc_id % 211 AS STRING)
  WHEN 3 THEN 'https://www.example.com/p/' || CAST(doc_id % 211 AS STRING)
       || '?utm_source=feed&lang=' || lang || '&utm_campaign=x'
  ELSE 'https://www.example.com/p/' || CAST(doc_id % 211 AS STRING)
       || '/#sec-' || CAST(doc_id AS STRING)
END"""

#: Canonicalization pipeline as shared SQL text over column ``u``:
#: lowercase scheme+host (matched case-insensitively), strip the :443
#: default port, drop the fragment, strip trailing slashes from the
#: path, remove utm_* tracking params (the '&'-prefix trick makes
#: first/middle/last positions uniform), and reassemble with the query
#: only if anything survived. Every regex metachar rides a CHARACTER
#: CLASS ('[?]'), never a backslash escape: Spark unescapes '\\?' in the
#: SQL string literal while DuckDB passes both chars to RE2, so the one
#: shared text would mean different regexes — classes are identical in
#: both dialects (found live; the scalar-suites oracles dodge this by
#: not sharing regex text across engines).
#: ``g``: DuckDB's regexp_replace substitutes only the FIRST match and
#: needs the explicit ``'g'`` flag for replace-all, while Spark always
#: replaces all and has no flags argument — a genuine one-token dialect
#: divergence (like STRING/VARCHAR), parameterized here so the rest of
#: the pipeline text stays shared verbatim.


def _urlc_canon(g: str) -> str:
    q = (
        "regexp_replace(concat('&', regexp_extract(u, '[?]([^#]*)', 1)),"
        f" '&utm_[^&]*', ''{g})"
    )
    return (
        "concat("
        " lower(regexp_extract(u, '^([a-zA-Z]+)://', 1)), '://',"
        " regexp_replace(lower(regexp_extract(u,"
        "                '^[a-zA-Z]+://([^/?#]+)', 1)), ':443$', ''),"
        " regexp_replace(regexp_extract(u,"
        "                '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1), '/+$', ''),"
        f" CASE WHEN length({q}) > 1"
        f"      THEN concat('?', substr({q}, 2))"
        "      ELSE '' END)"
    )

_URLC_ORACLE = f"""
WITH raw AS (
  SELECT doc_id, lang, {_URLC_RAW.replace(" AS STRING", " AS VARCHAR")} AS u
  FROM documents
),
canon AS (
  SELECT doc_id, {_urlc_canon(", 'g'")} AS canonical_url FROM raw
)
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS keep_doc_id,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
FROM canon GROUP BY canonical_url
"""


@query("ext_url_canonical_dedup", oracle=_URLC_ORACLE, tier=3)
def ext_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the crawl-frontier / CommonCrawl
    ingest step that collapses mirror spellings of one resource before
    any content even downloads: lowercase scheme and host, strip the
    :443 default port, drop fragments (client-side only), strip
    trailing slashes, and remove utm_* tracking params while PRESERVING
    real query params interleaved among them (the '&'-prefix rewrite
    makes first/middle/last utm positions one uniform pattern). Dedup
    groups by the canonical form keep the lowest doc_id — the
    dedup_keep_latest discipline with a deterministic winner.

    Shape: canonicalization is pure map-side regexp arithmetic inside
    the scan stage (zero shuffles — at 100 TB this is scan → project);
    the dedup is ONE groupBy keyed on the canonical URL, exactly the
    digest-groupBy cost ext_dedup_hash prices, with full map-side
    combine on the counting aggregates. The five decoration variants
    are synthesized per doc (doc_id % 5) over a shared logical resource
    (doc_id % 211), so collisions are real and every canonicalization
    rule is load-bearing — break one and group counts shift, which the
    hash-compare catches."""
    raw = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_URLC_RAW).alias("u")
    )
    canon = raw.select(
        "doc_id", F.expr(_urlc_canon("")).alias("canonical_url")
    )
    return canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("keep_doc_id"),
        (F.count(F.lit(1)) - 1).alias("n_dropped"),
    )


# --- ext_dedup_soft_weight ------------------------------------------------------

_SOFT_WEIGHT_ORACLE = """
WITH h AS (
  SELECT doc_id, md5(text) AS th FROM documents
),
g AS (
  SELECT th, CAST(COUNT(*) AS BIGINT) AS cluster_size,
         CAST(MIN(doc_id) AS BIGINT) AS rep_id
  FROM h GROUP BY th
)
SELECT h.doc_id, g.cluster_size,
       CAST(1 AS DOUBLE) / CAST(g.cluster_size AS DOUBLE) AS weight,
       (h.doc_id = g.rep_id) AS is_canonical
FROM h JOIN g ON h.th = g.th
"""


@query("ext_dedup_soft_weight", oracle=_SOFT_WEIGHT_ORACLE, tier=3)
def ext_dedup_soft_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication by downweighting instead of dropping: every
    document keeps a sampling weight 1/|exact-dup cluster| so a
    training-mix sampler sees each distinct TEXT with total mass 1
    regardless of how many times the crawl re-fetched it — the
    "repetition-aware reweighting" alternative to ext_dedup_apply's
    hard drop (dropping loses provenance diversity; weighting keeps
    every copy addressable while neutralizing the repetition bias).
    The cluster representative (lowest doc_id) is flagged so a
    downstream hard-dedup can reuse the same frame.

    Exactness: clusters key on the md5 text digest (cross-engine hash,
    the house dedup discipline); sizes are exact counts; the weight is
    one IEEE division 1/n — bit-identical for any integer n.

    Shape: one (digest)-keyed counting aggregate over the scan (the
    exchange carries digests, not documents — full map-side combine),
    then one digest-keyed join back to the per-doc frame; both sides
    of that join are co-keyed on the digest so at 100 TB it
    co-partitions with zero extra exchanges. Output is one row per
    document — the weight column rides along into any downstream
    sampler (ext_sample_weighted consumes exactly this shape)."""
    h = load(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("th")
    )
    g = h.groupBy("th").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.min("doc_id").alias("rep_id"),
    )
    return h.join(g, "th").select(
        "doc_id",
        "cluster_size",
        (F.lit(1.0) / F.col("cluster_size").cast("double")).alias(
            "weight"
        ),
        (F.col("doc_id") == F.col("rep_id")).alias("is_canonical"),
    )
