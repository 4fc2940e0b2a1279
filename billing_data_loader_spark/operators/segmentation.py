"""Round-8: document segmentation operators for the LLM-data pipeline
surface (SURVEY.md §2.10 extensions).

Two keys covering the tokenizer-side transforms between curation and
training, each with a bit-exact DuckDB oracle:

- ``ext_chunk_sliding`` — split long documents into fixed-size token
  windows with overlap (the standard pre-training chunking transform;
  VERDICT r7 #3). Composes with ``ext_seq_pack`` (pack the chunks) and
  ``ext_train_split_hash`` (assign the chunks).
- ``ext_bpe_pair_counts`` — corpus-wide adjacent-symbol pair counts over
  the word vocabulary: the candidate table the first BPE merge iteration
  ranks. ``ext_token_count``'s BPE-ish regex consumes a trained merge
  list; this is the operator that would train it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import load

# --- ext_chunk_sliding --------------------------------------------------------

#: Window size / stride in word tokens. S < C => consecutive chunks overlap
#: by C - S tokens, the usual context-continuity overlap.
_CHUNK_C = 64
_CHUNK_S = 48

_CHUNK_ORACLE = f"""
WITH p AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents
),
starts AS (
  SELECT doc_id, t, n, i
  FROM p, unnest(range(0,
    CASE WHEN n <= {_CHUNK_C} THEN 0
         ELSE (n - {_CHUNK_C} + {_CHUNK_S} - 1) // {_CHUNK_S} END + 1)) AS u(i)
)
SELECT doc_id,
       i AS chunk_idx,
       1 + i * {_CHUNK_S} AS tok_start,
       CAST(LEAST({_CHUNK_C}, n - i * {_CHUNK_S}) AS BIGINT) AS n_tok_chunk,
       CAST(len(array_to_string(
         t[1 + i * {_CHUNK_S} : i * {_CHUNK_S} + {_CHUNK_C}], ' '))
         AS BIGINT) AS n_chars_chunk,
       array_to_string(t[1 + i * {_CHUNK_S} : i * {_CHUNK_S} + {_CHUNK_C}],
                       ' ') AS chunk_text
FROM starts
"""


@query("ext_chunk_sliding", oracle=_CHUNK_ORACLE, tier=3)
def ext_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: each doc becomes
    ceil(max(n - C, 0) / S) + 1 chunks of up to C = 64 word tokens at
    stride S = 48 (16-token overlap), carrying (doc_id, chunk_idx,
    tok_start, sizes, chunk_text). This is the standard transform between
    a curated corpus and a training dataloader — long docs must be cut to
    the model's context length, and the overlap preserves cross-boundary
    context. The last chunk is the only one allowed to run short, and a
    chunk fully contained in its predecessor is never emitted (the start
    count stops once coverage reaches n), so chunk membership is a pure
    integer function of n — no floats anywhere.

    Shape: map-side only — split, an integer chunk-count expression,
    sequence() + explode, slice() + array_join per chunk. Zero exchanges:
    the 100 TB plan is scan -> project/explode -> sink, and output size
    is input size x (1 + overlap fraction). Spark's slice(t, start, C)
    mirrors the oracle's 1-based inclusive t[a:b] with b = a + C - 1."""
    d = load(spark, sf_dir, "documents")
    t = F.split("text", " ")
    p = d.select("doc_id", t.alias("t"), F.size(t).alias("n"))
    imax = F.when(F.col("n") <= _CHUNK_C, F.lit(0)).otherwise(
        F.expr(f"(n - {_CHUNK_C} + {_CHUNK_S} - 1) div {_CHUNK_S}")
    )
    starts = p.select(
        "doc_id",
        "t",
        "n",
        F.explode(F.sequence(F.lit(0), imax)).alias("i"),
    )
    chunk = F.slice("t", F.lit(1) + F.col("i") * _CHUNK_S, _CHUNK_C)
    chunk_text = F.array_join(chunk, " ")
    return starts.select(
        "doc_id",
        F.col("i").cast("long").alias("chunk_idx"),
        (F.lit(1) + F.col("i") * _CHUNK_S).cast("long").alias("tok_start"),
        F.least(F.lit(_CHUNK_C), F.col("n") - F.col("i") * _CHUNK_S)
        .cast("long")
        .alias("n_tok_chunk"),
        F.length(chunk_text).cast("long").alias("n_chars_chunk"),
        chunk_text.alias("chunk_text"),
    )


# --- ext_bpe_pair_counts ------------------------------------------------------

_BPE_ORACLE = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
wc AS (SELECT word, COUNT(*) AS n_word FROM tok GROUP BY word),
pairs AS (
  SELECT word, n_word, substr(word, CAST(i AS INT), 2) AS pair
  FROM wc, unnest(range(1, len(word))) AS u(i)
  WHERE len(word) >= 2
),
per_word AS (
  SELECT pair, word, n_word, COUNT(*) AS occ_in_word
  FROM pairs GROUP BY pair, word, n_word
)
SELECT pair,
       CAST(SUM(occ_in_word * n_word) AS BIGINT) AS n_occurrences,
       COUNT(*) AS n_distinct_words
FROM per_word
GROUP BY pair
"""


@query("ext_bpe_pair_counts", oracle=_BPE_ORACLE, tier=3)
def ext_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide adjacent-character pair statistics over the word
    vocabulary — the candidate table of the first BPE merge iteration
    (count every adjacent symbol pair, weighted by word frequency; the
    argmax pair becomes the first merge). Emitting the whole table rather
    than the argmax makes it an operator (rankable, joinable, re-runnable
    per merge step with a symbol column swapped in for raw chars).

    Shape: the heavy explode runs over the DISTINCT word vocabulary, not
    the corpus — word frequencies are reduced first (groupBy word,
    map-side combined), so a 100 TB corpus explodes |vocab| * avg_len
    rows, not corpus_tokens * avg_len. Two aggregate exchanges after
    that ((pair, word) then pair), both over short fixed-width keys.
    Pair extraction is substr over an exploded integer sequence — pure
    codegen, no UDF."""
    d = load(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_word"))
    )
    pairs = (
        wc.filter(F.length("word") >= 2)
        .select(
            "word",
            "n_word",
            F.explode(
                F.sequence(F.lit(1), F.length("word") - 1)
            ).alias("i"),
        )
        .select(
            "word", "n_word", F.expr("substr(word, i, 2)").alias("pair")
        )
    )
    per_word = pairs.groupBy("pair", "word", "n_word").agg(
        F.count(F.lit(1)).alias("occ_in_word")
    )
    return per_word.groupBy("pair").agg(
        F.sum(F.col("occ_in_word") * F.col("n_word")).alias("n_occurrences"),
        F.count(F.lit(1)).alias("n_distinct_words"),
    )


# --- ext_bpe_merge_train ------------------------------------------------------

#: Number of BPE merge rounds the trainer runs (Sennrich et al. 2016 run
#: tens of thousands on web corpora; 6 keeps the unrolled oracle finite
#: while exercising multi-round symbol growth — by round 6 the fixture's
#: merges chain 3- and 4-char symbols, so later rounds genuinely consume
#: earlier rounds' output).
_BPE_ROUNDS = 6

#: Symbol framing for the encoded word: every symbol is wrapped
#: chr(1)+sym+chr(2), so a merge of (l, r) is EXACTLY the left-to-right
#: non-overlapping string replace of chr(1)+l+chr(2)+chr(1)+r+chr(2) with
#: chr(1)+l+r+chr(2) — the same greedy scan Sennrich's merge loop does
#: (adjacent occurrences share no characters, and the wrappers anchor
#: whole-symbol boundaries, so "al|r" never matches "l|r").
_BPE_S1 = chr(1)
_BPE_S2 = chr(2)
_BPE_SEP = _BPE_S2 + _BPE_S1


def _bpe_round_ctes(k: int) -> str:
    """One unrolled merge round of the oracle: symbols from the round-k
    encoding, weighted adjacent-pair counts, argmax by (count desc, pair
    asc), and the round-k+1 encoding via the anchored replace."""
    return f""",
sym{k} AS MATERIALIZED (
  SELECT n_word, enc,
         string_split(substr(enc, 2, len(enc) - 2), chr(2) || chr(1)) AS s
  FROM enc{k}
),
pr{k} AS (
  SELECT n_word, s[i] AS l, s[i + 1] AS r
  FROM sym{k}, unnest(range(1, len(s))) AS u(i)
),
best{k} AS MATERIALIZED (
  SELECT l, r, CAST(SUM(n_word) AS BIGINT) AS c
  FROM pr{k} GROUP BY l, r
  ORDER BY c DESC, l ASC, r ASC LIMIT 1
),
enc{k + 1} AS MATERIALIZED (
  SELECT word, n_word,
         replace(enc,
                 chr(1) || (SELECT l FROM best{k}) || chr(2) ||
                 chr(1) || (SELECT r FROM best{k}) || chr(2),
                 chr(1) || (SELECT l FROM best{k}) ||
                 (SELECT r FROM best{k}) || chr(2)) AS enc
  FROM enc{k}
)"""


_BPE_TRAIN_ORACLE = (
    """
WITH wc AS (
  SELECT word, COUNT(*) AS n_word
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word
),
enc0 AS MATERIALIZED (
  SELECT word, n_word,
         chr(1) || array_to_string(string_split(word, ''),
                                   chr(2) || chr(1)) || chr(2) AS enc
  FROM wc
)"""
    + "".join(_bpe_round_ctes(k) for k in range(_BPE_ROUNDS))
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT CAST({k + 1} AS BIGINT) AS merge_rank, l AS lhs, r AS rhs,"
        f" l || r AS merged, c AS pair_count FROM best{k}"
        for k in range(_BPE_ROUNDS)
    )
)


#: Trained merge tables memoized per corpus fingerprint (the
#: _DNB_REGIME_CACHE discipline: a trained tokenizer is CORPUS metadata —
#: merges.txt on disk in production — not query state). The trainer key
#: always recomputes and refreshes the entry; the apply key reads
#: through the memo, the way any tokenizer consumes a trained model.
_BPE_MERGE_CACHE: dict[tuple, list] = {}


def _bpe_train(vocab, n_rounds: int):
    """Core trainer over a (word, n_word) frame: per round, weighted
    adjacent-symbol-pair counts -> argmax by (count desc, pair asc) ->
    map-side merge apply via the anchored replace. Returns the merge
    list [(rank, lhs, rhs, merged, pair_count)]. Factored out so tests
    can replay it on a planted vocabulary against a from-scratch Python
    BPE (tests/test_round10.py)."""
    enc0 = F.concat(
        F.lit(_BPE_S1),
        F.array_join(F.split("word", ""), _BPE_SEP),
        F.lit(_BPE_S2),
    )
    cur = vocab.select("word", "n_word", enc0.alias("enc"))
    merges = []
    for k in range(n_rounds):
        syms = F.split(
            F.expr("substring(enc, 2, length(enc) - 2)"), _BPE_SEP
        )
        pairs = (
            cur.select("n_word", syms.alias("s"))
            .filter(F.size("s") >= 2)
            .select(
                "n_word",
                F.explode(
                    F.sequence(F.lit(1), F.size("s") - 1)
                ).alias("i"),
                "s",
            )
            .select(
                "n_word",
                F.element_at("s", F.col("i")).alias("l"),
                F.element_at("s", F.col("i") + 1).alias("r"),
            )
        )
        best = (
            pairs.groupBy("l", "r")
            .agg(F.sum("n_word").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .first()
        )
        if best is None:  # vocabulary fully merged — nothing adjacent left
            break
        l, r, c = best["l"], best["r"], int(best["c"])
        merges.append((k + 1, l, r, l + r, c))
        cur = cur.withColumn(
            "enc",
            F.replace(
                F.col("enc"),
                F.lit(_BPE_S1 + l + _BPE_S2 + _BPE_S1 + r + _BPE_S2),
                F.lit(_BPE_S1 + l + r + _BPE_S2),
            ),
        )
    return merges


@query("ext_bpe_merge_train", oracle=_BPE_TRAIN_ORACLE, tier=3)
def ext_bpe_merge_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE merge TRAINING (VERDICT r9 gap #1): N full merge
    rounds of Sennrich et al. 2016 — count weighted adjacent-symbol
    pairs over the vocabulary, take the argmax pair (count desc, pair
    asc on ties), apply the merge everywhere, recount — emitting the
    learned merge table (merge_rank, lhs, rhs, merged, pair_count), i.e.
    the tokenizer model itself. ext_bpe_pair_counts is exactly round 1's
    candidate table; this key closes the loop the way ext_pq_train
    closes ext_pq_encode's.

    Deterministic-loop shape (the ext_kmeans_lite / ext_pq_train
    precedent): the driver holds only the argmax row per round (one
    .first() on a |vocab|-row aggregate — the model state, like
    centroids); all counting and merging is distributed. The merge apply
    never explodes anything: each symbol is framed chr(1)+sym+chr(2), so
    applying (l, r) is one non-overlapping left-to-right string replace
    — provably identical to Sennrich's greedy scan because merged
    symbols share no characters with neighbors and the framing anchors
    whole-symbol boundaries; the oracle unrolls the same N rounds as
    chained CTEs around the same replace. Pair counts count OVERLAPPING
    adjacencies (a a a -> two (a,a)), matching get_stats in the
    reference implementation.

    Scale: the loop runs over the REDUCED word-frequency table (the
    ext_bpe_pair_counts stance — a 100 TB corpus explodes |vocab| rows,
    not corpus tokens), persisted once; each round adds one map-side
    replace to the lineage plus one tiny pair aggregate. At web-scale
    vocab (~10M words) every round is one shuffle of short (l, r) keys;
    the fixture's 31-word vocabulary makes the N-round loop essentially
    free, and the fixture genuinely chains merges (round 6 consumes
    round 1-5 symbols). Python BPE replay pin: tests/test_round10.py."""
    from ..session import scoped_persist

    d = load(spark, sf_dir, "documents")
    vocab = scoped_persist(
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_word"))
    )
    from .corpus_ops import _corpus_fingerprint

    merges = _bpe_train(vocab, _BPE_ROUNDS)
    _BPE_MERGE_CACHE[(sf_dir, _corpus_fingerprint(sf_dir), _BPE_ROUNDS)] = (
        merges
    )
    return spark.createDataFrame(
        merges,
        "merge_rank bigint, lhs string, rhs string, merged string,"
        " pair_count bigint",
    )


# --- ext_group_texts ----------------------------------------------------------

#: Fixed block size in tokens (the training context length in the HF
#: `group_texts` transform this mirrors).
_BLOCK_B = 128

_GROUP_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n FROM documents
),
pos AS (
  SELECT doc_id, lang, n,
         CAST(SUM(n) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n AS BIGINT) AS s
  FROM d
),
spans AS (
  SELECT doc_id, lang, n, s, b
  FROM pos, unnest(range(s // {_BLOCK_B}, (s + n - 1) // {_BLOCK_B} + 1))
    AS u(b)
),
contrib AS (
  SELECT lang, b AS block_id, doc_id,
         LEAST(s + n, (b + 1) * {_BLOCK_B}) - GREATEST(s, b * {_BLOCK_B})
           AS n_tok
  FROM spans
)
SELECT lang, block_id,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM contrib
GROUP BY lang, block_id
"""


@query("ext_group_texts", oracle=_GROUP_ORACLE, tier=3)
def ext_group_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document block packing (the HF ``group_texts`` transform):
    per language stream (docs in doc_id order), all tokens concatenate
    into one sequence cut into fixed 128-token blocks; the output is the
    per-(lang, block) manifest — token count (== B except each stream's
    tail), contributing-document count and id range — i.e. which docs a
    dataloader must read to materialize each training block.
    ``ext_chunk_sliding`` windows WITHIN a doc (windows can run short);
    this packs ACROSS docs (every block exactly full). ``ext_seq_pack``
    is the bin-packing variant that never splits a doc.

    The key design point: the token stream is never materialized. Each
    doc's block span derives arithmetically from its running token offset
    s — it overlaps blocks floor(s/B) .. floor((s+n-1)/B) and contributes
    min(s+n, (b+1)B) - max(s, bB) tokens to block b — so the explode
    emits one row per (doc, touched block) (~n/B + 1 rows), not one per
    token. All integer arithmetic; exact in both engines.

    Shape: one per-lang window for the running offset (a genuine
    sequential prefix — at 100 TB swap in win_running_sum's two-pass
    partition-offset decomposition, which computes the same cumsum with
    per-range parallelism), then a map-side sequence/explode and one
    (lang, block) aggregate that AQE handles with map-side combine. The
    text column is dropped before the window: only (doc_id, lang, n)
    ever shuffles."""
    d = load(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("lang").orderBy("doc_id")
    pos = sized.withColumn(
        "s", F.sum("n").over(w) - F.col("n")
    )
    spans = pos.select(
        "doc_id",
        "lang",
        "n",
        "s",
        F.explode(
            F.sequence(
                F.expr(f"s div {_BLOCK_B}"),
                F.expr(f"(s + n - 1) div {_BLOCK_B}"),
            )
        ).alias("b"),
    )
    n_tok = F.least(
        F.col("s") + F.col("n"), (F.col("b") + 1) * _BLOCK_B
    ) - F.greatest(F.col("s"), F.col("b") * _BLOCK_B)
    return (
        spans.select(
            "lang", F.col("b").alias("block_id"), "doc_id", n_tok.alias("n_tok")
        )
        .groupBy("lang", "block_id")
        .agg(
            F.sum("n_tok").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def _bpe_apply(vocab, merges):
    """Apply a trained merge list (rank order) to a (word, n_word) frame:
    the chained anchored replaces, then split back to symbols. Factored
    for the planted-vocab Python replay pin (tests/test_round10.py)."""
    enc = F.concat(
        F.lit(_BPE_S1),
        F.array_join(F.split("word", ""), _BPE_SEP),
        F.lit(_BPE_S2),
    )
    for _rank, l, r, _merged, _c in merges:
        enc = F.replace(
            enc,
            F.lit(_BPE_S1 + l + _BPE_S2 + _BPE_S1 + r + _BPE_S2),
            F.lit(_BPE_S1 + l + r + _BPE_S2),
        )
    out = vocab.withColumn("enc", enc)
    symcol = F.split(
        F.expr("substring(enc, 2, length(enc) - 2)"), _BPE_SEP
    )
    return out.select(
        "word",
        "n_word",
        F.array_join(symcol, " ").alias("segmented"),
        F.size(symcol).cast("long").alias("n_symbols"),
    )


# --- ext_bpe_segment ----------------------------------------------------------

_BPE_SEG_ORACLE = (
    """
WITH wc AS (
  SELECT word, COUNT(*) AS n_word
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word
),
enc0 AS MATERIALIZED (
  SELECT word, n_word,
         chr(1) || array_to_string(string_split(word, ''),
                                   chr(2) || chr(1)) || chr(2) AS enc
  FROM wc
)"""
    + "".join(_bpe_round_ctes(k) for k in range(_BPE_ROUNDS))
    + f"""
SELECT word, n_word,
       array_to_string(string_split(substr(enc, 2, len(enc) - 2),
                                    chr(2) || chr(1)), ' ') AS segmented,
       CAST(len(string_split(substr(enc, 2, len(enc) - 2),
                             chr(2) || chr(1))) AS BIGINT) AS n_symbols
FROM enc{_BPE_ROUNDS}
"""
)


@query("ext_bpe_segment", oracle=_BPE_SEG_ORACLE, tier=3)
def ext_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE side: segment every vocabulary word with the merge
    table ext_bpe_merge_train learns — (word, n_word, space-joined
    symbol sequence, n_symbols), i.e. the tokenizer's output on its own
    training corpus. Train -> apply closes the BPE loop the way
    ext_pq_train -> ext_pq_encode closes PQ's: a downstream
    ext_tokenize_to_ids-style id mapper consumes `segmented` directly.

    Apply semantics are the trainer's own: merges replay IN RANK ORDER,
    each as the anchored non-overlapping left-to-right replace on the
    chr(1)/chr(2)-framed encoding — identical to tokenizing with a
    trained merges.txt in the reference implementation (apply merges
    sequentially by rank). The oracle reuses the trainer oracle's
    unrolled round CTEs verbatim and reads the final encoding, so the
    two declared keys are checked against the SAME replayed state.

    Shape: the merge table reads through a corpus-fingerprint-keyed
    memo (the _DNB_REGIME_CACHE discipline — a trained tokenizer is
    corpus metadata, merges.txt in production; the trainer key always
    recomputes and refreshes the entry, and a regenerated corpus
    re-trains); the apply itself is 6 chained map-side string replaces +
    one split — zero additional exchanges, and the segmentation happens
    on the |vocab| frame, never the corpus (a corpus-sized tokenization
    joins words to this table broadcast, the ext_tokenize_to_ids
    vocabulary pattern)."""
    from ..session import scoped_persist

    d = load(spark, sf_dir, "documents")
    vocab = scoped_persist(
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_word"))
    )
    from .corpus_ops import _corpus_fingerprint

    memo_key = (sf_dir, _corpus_fingerprint(sf_dir), _BPE_ROUNDS)
    merges = _BPE_MERGE_CACHE.get(memo_key)
    if merges is None:
        merges = _bpe_train(vocab, _BPE_ROUNDS)
        _BPE_MERGE_CACHE[memo_key] = merges
    return _bpe_apply(vocab, merges)


# --- ext_span_mask ------------------------------------------------------------

#: Span-corruption geometry: a 3-token span is masked at every 11th
#: position, phase-shifted per document by doc_id % 11 — fixed spacing
#: means spans can never overlap (11 > 3), so no run-merging pass is
#: needed and the whole corruption is closed-form per position. ~27%
#: corruption rate, deterministic on any engine and cluster size (T5
#: samples its spans; a data pipeline wants the replayable variant).
_SM_PERIOD = 11
_SM_SPAN = 3

#: Portable non-negative modulus: both engines' % is C-style
#: (sign-of-dividend), so the shared text wraps it once.
_SM_PMOD = f"((({{i}}) % {_SM_PERIOD}) + {_SM_PERIOD}) % {_SM_PERIOD}"

_SPAN_MASK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         CAST(doc_id % {_SM_PERIOD} AS BIGINT) AS off
  FROM documents
),
anchors AS (
  SELECT doc_id, t, off, len(t) AS n,
         list_filter(range(0, len(t)),
                     i -> {_SM_PMOD.format(i="i - off")} = 0
                          AND i + {_SM_SPAN} <= len(t)) AS a
  FROM toks
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(len(a) AS BIGINT) AS n_spans,
       CAST(len(a) * {_SM_SPAN} AS BIGINT) AS n_masked,
       COALESCE(array_to_string(
         list_filter(
           list_transform(range(0, n), i ->
             CASE WHEN NOT ({_SM_PMOD.format(i="i - off")} < {_SM_SPAN}
                            AND i - {_SM_PMOD.format(i="i - off")} >= 0
                            AND i - {_SM_PMOD.format(i="i - off")} +
                                {_SM_SPAN} <= n)
                  THEN t[i + 1]
                  WHEN {_SM_PMOD.format(i="i - off")} = 0
                  THEN '<extra_id_' ||
                       CAST(list_position(a, i) - 1 AS VARCHAR) || '>'
                  ELSE NULL END),
           x -> x IS NOT NULL), ' '), '') AS input_text,
       COALESCE(array_to_string(
         list_transform(a, x ->
           '<extra_id_' || CAST(list_position(a, x) - 1 AS VARCHAR) ||
           '> ' || array_to_string(t[x + 1:x + {_SM_SPAN}], ' ')),
         ' '), '') AS target_text
FROM anchors
"""


@query("ext_span_mask", oracle=_SPAN_MASK_ORACLE, tier=3)
def ext_span_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption (the denoising-objective prep step):
    every {_SM_PERIOD}th token position (phase-shifted per doc) anchors
    a {_SM_SPAN}-token masked span; the input text replaces each span
    with its ordinal ``<extra_id_k>`` sentinel and the target text
    emits ``<extra_id_k>`` followed by the masked tokens — exactly the
    (inputs, labels) pair a seq2seq denoiser trains on. Fixed spacing
    makes spans non-overlapping by construction, so the corruption is a
    CLOSED FORM per position — no run-merging scan, no sampling state —
    and deterministically replayable on any engine (T5 samples span
    lengths; a 100 TB data pipeline wants the audit-stable variant).

    Shape: entirely map-side array arithmetic inside the scan stage
    (scan → project → sink; zero shuffles at any corpus size). Both
    engines share the algebra with dialect-local array builtins
    (transform/slice vs list_transform/[a:b]) and the portable
    non-negative modulus idiom (both engines' % is C-style). The
    sentinel numbering, masked-token recovery round-trip, and
    input+target token conservation are pinned in
    tests/test_round11b.py — which caught the launch bug the shared
    oracle text could NOT (both engines agreed): positions before the
    first anchor in high-phase docs masked against a NEGATIVE anchor
    until the explicit anchor >= 0 guard landed (the round-11
    LEAST/GREATEST lesson: every shared closed form needs an
    independent replay)."""
    d = load(spark, sf_dir, "documents")
    pmod = _SM_PMOD.format(i="i - off")
    return d.select(
        "doc_id",
        F.split("text", " ").alias("t"),
        F.expr(f"CAST(doc_id % {_SM_PERIOD} AS BIGINT)").alias("off"),
    ).select(
        "doc_id",
        F.expr("CAST(size(t) AS BIGINT)").alias("n_tokens"),
        F.expr(
            f"""CAST(size(filter(sequence(0, size(t) - 1),
                 i -> {pmod} = 0 AND i + {_SM_SPAN} <= size(t)))
               AS BIGINT)"""
        ).alias("n_spans"),
        F.expr(
            f"""CAST(size(filter(sequence(0, size(t) - 1),
                 i -> {pmod} = 0 AND i + {_SM_SPAN} <= size(t)))
               * {_SM_SPAN} AS BIGINT)"""
        ).alias("n_masked"),
        F.expr(
            f"""array_join(
              filter(
                transform(sequence(0, size(t) - 1), i ->
                  CASE WHEN NOT ({pmod} < {_SM_SPAN}
                                 AND i - ({pmod}) >= 0
                                 AND i - ({pmod}) + {_SM_SPAN} <= size(t))
                       THEN t[i]
                       WHEN {pmod} = 0
                       THEN concat('<extra_id_',
                            CAST(array_position(
                              filter(sequence(0, size(t) - 1),
                                j -> {_SM_PMOD.format(i="j - off")} = 0
                                     AND j + {_SM_SPAN} <= size(t)),
                              i) - 1 AS STRING), '>')
                       ELSE NULL END),
                x -> x IS NOT NULL), ' ')"""
        ).alias("input_text"),
        F.expr(
            f"""array_join(
              transform(
                filter(sequence(0, size(t) - 1),
                  j -> {_SM_PMOD.format(i="j - off")} = 0
                       AND j + {_SM_SPAN} <= size(t)),
                (x, k) -> concat('<extra_id_', CAST(k AS STRING), '> ',
                                 array_join(slice(t, x + 1, {_SM_SPAN}),
                                            ' '))),
              ' ')"""
        ).alias("target_text"),
    )


# --- ext_pack_efficiency_sweep --------------------------------------------------

#: Candidate context lengths for the packing-efficiency sweep.
_PACK_SWEEP = [128, 256, 512, 1024]

_PACK_SWEEP_ORACLE = f"""
WITH lt AS (
  SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
           AS total_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang
),
sweep AS (
  SELECT lang, total_tokens, n_docs,
         unnest([{", ".join(str(b) for b in _PACK_SWEEP)}]) AS block_size
  FROM lt
)
SELECT lang, CAST(block_size AS BIGINT) AS block_size, total_tokens,
       CAST((total_tokens + block_size - 1) // block_size AS BIGINT)
         AS n_blocks,
       CAST(((total_tokens + block_size - 1) // block_size) * block_size
            - total_tokens AS BIGINT) AS pad_tokens,
       CAST(total_tokens AS DOUBLE)
         / CAST(((total_tokens + block_size - 1) // block_size)
                * block_size AS DOUBLE) AS fill_efficiency
FROM sweep
"""


@query("ext_pack_efficiency_sweep", oracle=_PACK_SWEEP_ORACLE, tier=2)
def ext_pack_efficiency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length packing-efficiency sweep: for each language and
    each candidate block size (128/256/512/1024 tokens), the block
    count, pad-token waste, and fill efficiency under cross-document
    packing (the ext_group_texts regime, where only the final partial
    block per language pads) — the one-frame answer to "what context
    length wastes the least compute on this corpus", read BEFORE
    committing a training run; ext_length_bucket_batching is the
    per-batch sibling for the non-packing regime.

    Exactness: token totals are exact integers; blocks/padding are
    integer ceiling arithmetic ((t + B - 1) DIV B — floor division on
    non-negatives, identical in both engines); efficiency is one
    shared-text division.

    Shape: ONE lang-keyed token-count aggregate (map-side combined — the
    only data-sized exchange), then the 4-candidate sweep explodes
    map-side from the O(langs) frame. At 100 TB this is scan ->
    partial-agg -> 20-row result."""
    d = load(spark, sf_dir, "documents")
    lt = d.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    sweep = lt.select(
        "lang",
        "total_tokens",
        F.explode(
            F.array(*[F.lit(b) for b in _PACK_SWEEP])
        ).alias("block_size"),
    )
    return sweep.select(
        "lang",
        F.col("block_size").cast("long").alias("block_size"),
        "total_tokens",
        F.expr(
            "CAST((total_tokens + block_size - 1) DIV block_size"
            " AS BIGINT)"
        ).alias("n_blocks"),
        F.expr(
            "CAST(((total_tokens + block_size - 1) DIV block_size)"
            " * block_size - total_tokens AS BIGINT)"
        ).alias("pad_tokens"),
        F.expr(
            "CAST(total_tokens AS DOUBLE)"
            " / CAST(((total_tokens + block_size - 1) DIV block_size)"
            " * block_size AS DOUBLE)"
        ).alias("fill_efficiency"),
    )
