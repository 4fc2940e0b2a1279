"""Round-9: exact substring-level deduplication (SURVEY.md §2.10).

Completes the dedup family's last missing member (VERDICT r8 "What's
missing" #1): the existing operators decide per DOCUMENT (exact hash,
MinHash/SimHash near-dup, containment), but production corpora also run a
substring-level pass — Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better" — that excises long token runs repeated ACROSS
documents (boilerplate, licenses, templated headers) while keeping the
surrounding unique text.

Lee et al. build a suffix array; a single-machine index over 100 TB of text
is exactly the shape Spark replaces. The distributed re-expression: fixed-W
token windows (shingles) form an inverted index; a shingle present in >= 2
distinct documents marks its token span as duplicated; per document,
overlapping/adjacent marked spans merge into maximal runs (gaps-and-islands
window); runs of at least L tokens become the excision manifest. Any
duplicated substring of length >= W + L - 1 tokens is guaranteed to be
covered by marked windows at every position of its interior, so the
manifest finds every long shared run — the same guarantee the 50-token
suffix-array pass gives, at W-token resolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from .llm_pipeline import _CORPUS_SQL, _corpus_with_dups

#: Shingle window (tokens). Marked-span resolution: a duplicated run is
#: detected iff it spans at least one full W-token window shared verbatim
#: across two documents.
_SSD_W = 8

#: Minimum excision-run length (tokens). Lee et al. use 50 BPE tokens on
#: web-scale corpora; the fixture docs average 54 words, so 16 keeps the
#: manifest non-degenerate while exercising the merge logic.
_SSD_L = 16

# CTE chain shared between the manifest oracle and the apply oracle
# (which consumes the manifest as a subquery).
_SSD_CTES = f"""corpus AS ({_CORPUS_SQL}),
tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM corpus
  WHERE len(string_split(text, ' ')) >= {_SSD_W}
),
sh0 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - {_SSD_W} + 2),
           i -> struct_pack(pos := i,
                g := array_to_string(list_slice(t, i, i + {_SSD_W} - 1), ' '))))
           AS s
  FROM tok
),
sh AS (SELECT doc_id, s.pos AS pos, s.g AS g FROM sh0),
dupg AS (SELECT g FROM sh GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
marked AS (SELECT doc_id, pos FROM sh JOIN dupg USING (g)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {_SSD_W}
              THEN 0 ELSE 1 END AS brk
  FROM marked
),
runs AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM isl
)"""

_SSD_SELECT = f"""
SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + {_SSD_W} - 1 AS span_end,
       MAX(pos) + {_SSD_W} - MIN(pos) AS span_tokens
FROM runs GROUP BY doc_id, run_id
HAVING MAX(pos) + {_SSD_W} - MIN(pos) >= {_SSD_L}
"""

_SSD_ORACLE = f"""
WITH {_SSD_CTES}{_SSD_SELECT}"""


@query("ext_substring_dedup", oracle=_SSD_ORACLE, tier=3)
def ext_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level dedup manifest (Lee et al. 2022 shape): one
    row per maximal cross-document duplicated token run of >= L tokens —
    (doc_id, span_start, span_end, span_tokens), 1-based inclusive word
    positions. The manifest is policy-free (every occurrence is listed,
    like ext_dup_ngram_coverage scores every doc); a keep-one-copy excision
    composes downstream exactly as ext_dedup_apply consumes
    ext_dedup_cluster, and tests/test_round9.py exercises that composition
    on planted cross-doc substrings.

    Shape: W-token shingles explode map-side with their position; the
    duplicate-shingle set is ONE groupBy over (g, g2, doc_id)-distinct
    tuples where g and g2 are xxhash64 LONGs under two different seeds
    (the oracle keeps raw strings). Because this key's downstream apply
    DELETES text, a single 64-bit collision would excise non-duplicated
    content (ADVICE r9) — so a shingle is marked only when BOTH hashes
    agree across documents, pushing the destructive-collision probability
    to the 128-bit regime (~n^2/2^128) for 8 extra bytes per shingle row
    and an unchanged plan shape; marking is a semi join back on (g, g2);
    run assembly is
    a per-document gaps-and-islands window (lag + running sum), bounded by
    document length, never corpus-wide. At 100 TB: shuffles carry only
    (8-byte hash, doc_id, int pos) — the text itself never crosses an
    exchange — and the window partitions by doc_id, so no task sees more
    rows than the longest document's shingle count. A duplicated substring
    of >= W + L - 1 tokens is covered at every interior position by shared
    windows, so merged runs recover it exactly; W trades index size
    against the shortest detectable run, as in the suffix-array variant."""
    from ..session import scoped_persist, widen_scan

    corpus = _corpus_with_dups(spark, sf_dir)
    # widen_scan A/B re-run on the CURRENT pipeline (r13; the r9 "widen
    # regressed this key" note predates the dual-hash shingle form):
    # shingle pass min-of-4 at sf0.1 is 0.39 s widened vs 0.83 s at the
    # fixture scan's 2-task width — the CPU-dense dual-hash explode is
    # exactly the widen_scan case, and the persisted sh frame caches at
    # useful width for the aggregate and semi join behind it.
    toks = widen_scan(corpus).select(
        "doc_id", F.split("text", " ").alias("t")
    ).filter(F.size("t") >= _SSD_W)
    # persisted: the corpus-sized positioned-shingle frame feeds both the
    # duplicate-shingle aggregate and the marking semi join (code-review
    # r9: unpersisted, the split+window+hash pass ran twice)
    # nested transform binds the W-token shingle STRING once per position
    # (inner HOF materializes it) before both seeded hashes read it — the
    # single-level form evaluated slice+concat_ws twice per position, once
    # under each hash (guide §1.2 per-task work; r13). Same values.
    sh = scoped_persist(
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform("
                    f"transform(sequence(1, size(t) - {_SSD_W} + 1), "
                    f"i -> struct(i AS pos, "
                    f"concat_ws(' ', slice(t, i, {_SSD_W})) AS cw)), "
                    f"p -> struct(p.pos AS pos, "
                    f"xxhash64(p.cw) AS g, xxhash64(7, p.cw) AS g2))"
                )
            ).alias("s"),
        ).select("doc_id", "s.pos", "s.g", "s.g2")
    )
    dupg = (
        sh.select("g", "g2", "doc_id")
        .distinct()
        .groupBy("g", "g2")
        .agg(F.count(F.lit(1)).alias("docs"))
        .filter(F.col("docs") >= 2)
        .select("g", "g2")
    )
    marked = sh.join(dupg, ["g", "g2"], "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = marked.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(w) <= _SSD_W, 0).otherwise(1),
    ).withColumn(
        "run_id",
        F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        runs.groupBy("doc_id", "run_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + _SSD_W - 1).alias("span_end"),
        )
        .withColumn(
            "span_tokens", F.col("span_end") - F.col("span_start") + 1
        )
        .filter(F.col("span_tokens") >= _SSD_L)
        .select("doc_id", "span_start", "span_end", "span_tokens")
    )


# --- ext_substring_dedup_apply --------------------------------------------------

# The apply oracle replays the manifest pipeline, then rebuilds each doc
# from its uncovered 1-based token positions (string_agg ORDER BY pos) —
# docs whose every token is excised still emit their row (empty string).
_SSDA_ORACLE = f"""
WITH {_SSD_CTES},
spans AS ({_SSD_SELECT}),
alltok AS (
  SELECT doc_id, i AS pos, t[i] AS token
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
       unnest(range(1, len(t) + 1)) AS u(i)
),
covered AS (
  SELECT DISTINCT s.doc_id, u.pos
  FROM spans s, unnest(range(s.span_start, s.span_end + 1)) AS u(pos)
),
kept AS (
  SELECT a.doc_id, a.pos, a.token
  FROM alltok a
  LEFT JOIN covered c ON a.doc_id = c.doc_id AND a.pos = c.pos
  WHERE c.pos IS NULL
),
rebuilt AS (
  SELECT doc_id,
         string_agg(token, ' ' ORDER BY pos) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(r.clean_text, '') AS clean_text,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(len(string_split(d.text, ' ')) - COALESCE(r.n_kept, 0) AS BIGINT)
         AS n_removed
FROM corpus d LEFT JOIN rebuilt r USING (doc_id)
"""


@query("ext_substring_dedup_apply", oracle=_SSDA_ORACLE, tier=3)
def ext_substring_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excision applied: every document rebuilt with its duplicated runs
    removed — (doc_id, clean_text, n_kept, n_removed). The policy is Lee
    et al. 2022's ExactSubstr: EVERY occurrence of a duplicated substring
    is deleted (the paper's own choice; they note heavily-duplicated docs
    can empty out, which this fixture's whole-doc copies exhibit — both
    the copy and its source clean to ''). Consumes the declared
    ext_substring_dedup manifest the way ext_dedup_apply consumes
    ext_dedup_cluster.

    DESTRUCTIVE-ON-COLLISION (ADVICE r9): unlike the counting keys, a
    hash collision here removes real text. The manifest therefore marks a
    shingle only when TWO independently-seeded xxhash64 values both agree
    across documents (see ext_substring_dedup); the residual failure
    needs a simultaneous 128-bit collision, below any practical corpus's
    birthday bound, and is documented here as the accepted risk rather
    than hidden.

    Shape — the corpus is NEVER exploded to (doc, pos) rows: the spans
    manifest (tiny — a few rows per affected doc) aggregates to ONE
    array-of-spans row per doc and joins back doc-keyed; excision is then
    a map-side indexed-lambda array filter (token kept iff no span covers
    its 1-based position) and reassembly is array_join — order preserved
    structurally, no sort, no second shuffle. The oracle rebuilds via
    exploded positions + string_agg(ORDER BY pos) instead; identical
    strings because both drop exactly the covered positions. At 100 TB
    the only data-sized exchanges are the manifest build itself; the
    apply adds one small-side doc-keyed join and zero corpus shuffles.

    Lambda hygiene (the r8 PITFALL): the indexed filter's outer lambda
    (tokv, ti) nests an exists over spans (sp) — three DISTINCT names,
    and no sibling HOF in this projection reuses them."""
    corpus = _corpus_with_dups(spark, sf_dir)
    spans = ext_substring_dedup(spark, sf_dir)
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    toks = corpus.select("doc_id", F.split("text", " ").alias("t"))
    joined = toks.join(per_doc, "doc_id", "left")
    keep = F.filter(
        F.col("t"),
        lambda tokv, ti: ~F.coalesce(
            F.exists(
                F.col("spans"),
                lambda sp: (ti + 1 >= sp["span_start"])
                & (ti + 1 <= sp["span_end"]),
            ),
            F.lit(False),
        ),
    )
    return joined.select(
        "doc_id",
        F.array_join(keep, " ").alias("clean_text"),
        F.size(keep).cast("long").alias("n_kept"),
        (F.size("t") - F.size(keep)).cast("long").alias("n_removed"),
    )
