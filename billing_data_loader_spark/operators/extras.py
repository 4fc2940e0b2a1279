"""Round-7 operator additions (SURVEY.md §2 extensions).

Four keys that round out surfaces users of the reference-style loader ask
for next, each with a bit-exact DuckDB oracle:

- ``fn_sql_udf`` — Spark 4 SQL scalar UDFs (CREATE FUNCTION ... RETURN
  <expr>): business logic shared as catalog functions instead of Python,
  fully optimizable (the body inlines into the plan, unlike Python UDFs).
- ``ext_sample_hashrank`` — deterministic, engine-reproducible corpus
  subsampling by content-free hash rank (md5 is bit-identical in Spark
  and DuckDB). The sampling a training-data pipeline can re-run anywhere
  and get the same subset — no RNG state, no seed plumbing.
- ``agg_heavy_hitters_exact`` — exact frequency-threshold heavy hitters
  (count > n/k), the verify phase of the Misra-Gries/space-saving sketch
  pattern expressed as two aggregates.
- ``win_sum_reset`` — gaps-and-islands conditional cumulative sum (per-user
  running spend that resets after a 30-minute gap), the windowed form of
  sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.determinism import MICRO, quantize_long
from ..plans.registry import query
from ..tables import load

# --- fn_sql_udf -------------------------------------------------------------

#: Tiered take-rate: the CASE body is duplicated verbatim in the oracle, so
#: both engines run the identical constants and the double product is the
#: same IEEE multiply — emitted RAW (quantizing a product of an arbitrary
#: double and a constant could land on a half boundary; identical-expression
#: parity needs no quantization).
_TIER_CASE = """CASE WHEN p >= 200000 THEN 0.02
                     WHEN p >= 100000 THEN 0.05
                     ELSE 0.08 END"""

_SQL_UDF_ORACLE = f"""
SELECT o_orderkey,
       o_totalprice,
       ({_TIER_CASE.replace("p ", "o_totalprice ")}) AS take_rate,
       o_totalprice * ({_TIER_CASE.replace("p ", "o_totalprice ")}) AS fee
FROM orders
"""


@query("fn_sql_udf", oracle=_SQL_UDF_ORACLE, tier=2)
def fn_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL scalar UDF: the tiered take-rate lives in the catalog as
    a SQL function and is applied per order. Unlike a Python UDF, the SQL
    body INLINES into the optimized plan (whole-stage codegen, pushdown
    still work) — `.explain` shows a plain CASE, no BatchEvalPython. At
    100 TB this is the only UDF form with zero serialization cost."""
    spark.sql(
        f"""CREATE OR REPLACE TEMPORARY FUNCTION bdl_take_rate(p DOUBLE)
            RETURNS DOUBLE RETURN {_TIER_CASE}"""
    )
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("bdl_sql_udf_orders")
    return spark.sql(
        """SELECT o_orderkey,
                  o_totalprice,
                  bdl_take_rate(o_totalprice) AS take_rate,
                  o_totalprice * bdl_take_rate(o_totalprice) AS fee
           FROM bdl_sql_udf_orders"""
    )


# --- ext_sample_hashrank ----------------------------------------------------

_SAMPLE_K = 50
_SAMPLE_SALT = ":bdl-seed-7"

_HASHRANK_ORACLE = f"""
SELECT doc_id, lang, h, rn FROM (
  SELECT doc_id, lang,
         md5(CAST(doc_id AS VARCHAR) || '{_SAMPLE_SALT}') AS h,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR) || '{_SAMPLE_SALT}'), doc_id
         ) AS BIGINT) AS rn
  FROM documents
) WHERE rn <= {_SAMPLE_K}
"""


@query("ext_sample_hashrank", oracle=_HASHRANK_ORACLE, tier=3)
def ext_sample_hashrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified subsampling by hash rank: top-K docs per
    language ordered by md5(doc_id || salt). md5 of the same string is
    bit-identical in every engine, so the SAME subset reproduces across
    Spark, DuckDB, and any cluster size — the property `sample(fraction,
    seed)` cannot give (its output depends on partitioning). Changing the
    salt redraws the sample; K/stratum bounds the output exactly.

    Scale: one shuffle on the stratum key, per-partition top-K under the
    window (rank stops early per AQE partial-window pushdown); the hash is
    computed map-side from the key alone — no payload movement until the
    K winners. At 100 TB with few strata, salt the stratum into buckets
    (lang, hash(doc_id) % B), take K/B per bucket, and merge — same
    top-K-by-hash semantics, bounded per-task heap."""
    d = load(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_SAMPLE_SALT)))
    w = W.partitionBy("lang").orderBy("h", "doc_id")
    return (
        d.select("doc_id", "lang", h.alias("h"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _SAMPLE_K)
    )


# --- agg_heavy_hitters_exact ------------------------------------------------

_HH_K = 200

_HH_ORACLE = f"""
WITH tot AS (SELECT COUNT(*) AS n FROM events),
     c AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id)
SELECT user_id, n_events,
       CAST(n_events AS DOUBLE) / n AS share
FROM c, tot
WHERE n_events * {_HH_K} > n
"""


@query("agg_heavy_hitters_exact", oracle=_HH_ORACLE, tier=2)
def agg_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: users owning more than 1/{k} of all events.

    This is the verify phase of the streaming Misra-Gries / space-saving
    pattern: a sketch pass can only produce CANDIDATES (no false
    negatives above the threshold); the exact counts here are what
    confirms them. Expressed as two aggregates — per-key counts (map-side
    combined, so the shuffle carries at most one row per key per
    partition) and a 1-row total broadcast back — the whole job is two
    scans with O(distinct keys) network. The share division is the same
    IEEE op in both engines on exact integers — emitted raw."""
    ev = load(spark, sf_dir, "events")
    tot = ev.agg(F.count(F.lit(1)).alias("n"))
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter(F.col("n_events") * _HH_K > F.col("n"))
        .select(
            "user_id",
            "n_events",
            (F.col("n_events").cast("double") / F.col("n")).alias("share"),
        )
    )


# --- agg_heavy_hitters_approx -----------------------------------------------

_MG_K = 150

_HH_APPROX_ORACLE = f"""
WITH tot AS (SELECT COUNT(*) AS n FROM events),
     c AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id)
SELECT user_id, n_events,
       CAST(n_events AS DOUBLE) / n AS share
FROM c, tot
WHERE n_events * {_MG_K} > n
"""


def _mg_candidates(iterator):
    """Per-partition Misra-Gries summary (capacity ``_MG_K`` counters).

    Merge form: each Arrow batch contributes its exact value_counts
    (vectorized), then the counter map is reduced back to capacity by
    subtracting the (cap+1)-th largest residual from everything and
    dropping non-positives — the standard mergeable-summaries reduction
    (Agarwal et al., TODS 2013). Guarantee: any key with in-partition
    count > n_p/(cap+1) survives with a positive residual, so no global
    heavy hitter above n/_MG_K can be missed by every partition.

    Memory bound (ADVICE r7): peak state is O(k + distinct keys per
    Arrow batch), NOT O(k) — the whole batch's exact value_counts is
    absorbed before each reduction. That is the deliberate trade: the
    vectorized batch merge is ~100x faster than a per-row classic MG
    decrement loop in Python, and the batch-distinct term is capped by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` (Spark default
    10k rows → at most 10k transient counters), so the bound is a
    config knob, not data-dependent. Steady-state between batches is
    O(k)."""
    import pandas as pd

    counters: dict[int, int] = {}
    for pdf in iterator:
        for uid, cnt in pdf["user_id"].value_counts().items():
            counters[int(uid)] = counters.get(int(uid), 0) + int(cnt)
        if len(counters) > _MG_K:
            # subtract the (cap+1)-th largest count; >= cap keys survive
            cut = sorted(counters.values(), reverse=True)[_MG_K]
            counters = {
                k: v - cut for k, v in counters.items() if v - cut > 0
            }
    yield pd.DataFrame({"user_id": list(counters) or []}).astype(
        {"user_id": "int64"}
    )


@query("agg_heavy_hitters_approx", oracle=_HH_APPROX_ORACLE, tier=2)
def agg_heavy_hitters_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-phase heavy hitters: per-partition Misra-Gries candidate
    generation (mapInPandas, O(k + batch-distinct) peak state per task —
    see _mg_candidates — NO shuffle of raw events) followed by an exact
    recount of the candidate set only. The
    MG guarantee (no false negatives above n/k) makes the final output
    EXACT — identical to agg_heavy_hitters_exact's two-aggregate form —
    while the shuffle carries only |candidates| <= k x n_partitions ids
    instead of one row per distinct key per partition.

    This is the 100 TB shape for skewed frequency queries: the exact
    form's groupBy moves O(distinct keys) through the exchange (billions
    of rows for user-level keys); the sketch moves O(k x tasks), then
    recounts candidates with a broadcast semi-join that never shuffles
    the fact table at all. Worth it precisely when distinct >> k; the
    exact key documents the opposite regime."""
    ev = load(spark, sf_dir, "events")
    import pyspark.sql.types as T

    cand = (
        ev.select("user_id")
        .mapInPandas(
            _mg_candidates,
            T.StructType([T.StructField("user_id", T.LongType())]),
        )
        .distinct()
    )
    tot = ev.agg(F.count(F.lit(1)).alias("n"))
    counts = (
        ev.join(F.broadcast(cand), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter(F.col("n_events") * _MG_K > F.col("n"))
        .select(
            "user_id",
            "n_events",
            (F.col("n_events").cast("double") / F.col("n")).alias("share"),
        )
    )


# --- win_sum_reset ----------------------------------------------------------

_RESET_ORACLE = """
WITH marked AS (
  SELECT event_id, user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_seg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT event_id, user_id, ts,
         CAST(floor(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
           AS micro,
         SUM(new_seg) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS seg
  FROM marked
)
SELECT event_id, user_id, CAST(seg AS BIGINT) AS seg,
       CAST(SUM(micro) OVER (
         PARTITION BY user_id, seg ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) / 1000000.0 AS running_value
FROM numbered
"""


@query("win_sum_reset", oracle=_RESET_ORACLE, tier=3)
def win_sum_reset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running spend that RESETS after a 30-minute inactivity gap
    — the windowed (per-event) form of sessionization, where
    stream_session_window gives only the per-session rollup.

    Gaps-and-islands: a lag() flags segment starts, a running sum of
    flags numbers the segments, and the value then cumsums within
    (user, segment). All three windows partition on user_id (same single
    shuffle — Spark reuses the sort for all of them, no extra exchange),
    so the plan is one shuffle regardless of scale; values are
    floor-quantized micro-unit longs (determinism.quantize_long), making
    the running sum reduction-order-exact and bit-identical to the
    oracle."""
    ev = load(spark, sf_dir, "events")
    w_ord = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
    # microsecond precision: unix_timestamp() truncates to seconds and
    # disagrees with the oracle's INTERVAL comparison on sub-second gaps
    # (caught by the sf0.1 tier — sf0.01 timestamps never straddled it)
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w_ord))
    marked = ev.select(
        "event_id",
        "user_id",
        "ts",
        quantize_long("value").alias("micro"),
        F.when(gap_us.isNull() | (gap_us >= 1800 * 1_000_000), F.lit(1))
        .otherwise(F.lit(0))
        .alias("new_seg"),
    )
    numbered = marked.withColumn(
        "seg", F.sum("new_seg").over(w_run).cast("long")
    )
    w_seg = (
        W.partitionBy("user_id", "seg")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return numbered.select(
        "event_id",
        "user_id",
        "seg",
        (F.sum("micro").over(w_seg).cast("double") / MICRO).alias(
            "running_value"
        ),
    )


# --- ext_shard_rendezvous ---------------------------------------------------

_N_SHARDS = 8

_RENDEZVOUS_ORACLE = f"""
SELECT doc_id,
       arg_max(s, h) AS shard,
       max(h) AS winning_hash
FROM (
  SELECT doc_id, s,
         md5(CAST(doc_id AS VARCHAR) || '#' || CAST(s AS VARCHAR)) AS h
  FROM documents CROSS JOIN range({_N_SHARDS}) t(s)
)
GROUP BY doc_id
"""


@query("ext_shard_rendezvous", oracle=_RENDEZVOUS_ORACLE, tier=2)
def ext_shard_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent shard assignment by rendezvous (highest-random-weight)
    hashing: each doc goes to the shard whose md5(doc_id # shard) is
    largest. The property mod-N hashing lacks: growing to N+1 shards
    moves only ~1/(N+1) of the keys (those whose NEW hash wins), so a
    training corpus can be re-sharded incrementally instead of rewritten.

    Spark shape: the per-shard hashes are an in-row ARRAY of (hash,
    shard) structs and the winner is array_max — struct comparison is
    lexicographic, so it picks the max hash with the shard as tie-break.
    Zero joins, zero shuffles, fully codegen: the assignment is a
    projection, which is what lets a 100 TB corpus shard in one map-only
    pass. md5 of the same string is bit-identical in every engine, so
    assignments reproduce anywhere (same property as
    ext_sample_hashrank)."""
    d = load(spark, sf_dir, "documents")
    arr = F.array(
        *[
            F.struct(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit(f"#{s}")
                    )
                ).alias("h"),
                F.lit(s).cast("long").alias("shard"),
            )
            for s in range(_N_SHARDS)
        ]
    )
    pick = F.array_max(arr)
    return d.select(
        "doc_id",
        pick["shard"].alias("shard"),
        pick["h"].alias("winning_hash"),
    )


# --- ext_dedup_semantic_rep -------------------------------------------------


def _semantic_rep_oracle() -> str:
    from .ann import _KMEANS_ORACLE

    return f"""
WITH assigned AS ({_KMEANS_ORACLE})
SELECT vec_id, cluster_id,
       first_value(vec_id) OVER (
         PARTITION BY cluster_id ORDER BY sq_dist, vec_id
       ) AS rep_vec_id,
       vec_id = first_value(vec_id) OVER (
         PARTITION BY cluster_id ORDER BY sq_dist, vec_id
       ) AS is_rep
FROM assigned
"""


@query("ext_dedup_semantic_rep", oracle=_semantic_rep_oracle(), tier=3)
def ext_dedup_semantic_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup, apply phase: after k-means clusters the embedding
    corpus (ext_kmeans_lite — full SQL mirror), each cluster keeps its
    REPRESENTATIVE — the member closest to the centroid (min sq_dist,
    vec_id tie-break) — and every member learns its representative, the
    keep/drop decision cluster-level dedup acts on. This is the standard
    SemDeDup-style reduction: near-duplicate semantic neighborhoods
    collapse to one exemplar.

    Scale: the window runs over the ASSIGNMENT frame (one row per vector,
    already reduced), partitioned on cluster_id — one shuffle of ids and
    distances, never of embeddings. The kmeans assignment itself is
    map-side broadcast-argmin (see ann.py); composing the two keeps the
    whole pipeline linear in corpus size."""
    from .ann import ext_kmeans_lite

    assigned = ext_kmeans_lite(spark, sf_dir)
    w = W.partitionBy("cluster_id").orderBy("sq_dist", "vec_id")
    rep = F.first("vec_id").over(w)
    return assigned.select(
        "vec_id",
        "cluster_id",
        rep.alias("rep_vec_id"),
        (F.col("vec_id") == rep).alias("is_rep"),
    )


# --- ext_sample_weighted ------------------------------------------------------

_WSAMPLE_K = 20
_WSAMPLE_SALT = ":bdl-wsample-8"
#: 2^48 — the md5 prefix is 12 hex digits = 48 bits, so u = (v + 0.5) / 2^48
#: is an exact dyadic rational in (0, 1): v + 0.5 needs 49 mantissa bits
#: (< 53) and the divisor is a power of two, so BOTH ops are exact in
#: IEEE-754 and bit-identical across engines.
_WSAMPLE_DENOM = float(1 << 48)

_WSAMPLE_ORACLE = f"""
WITH pri AS (
  SELECT doc_id, lang, n_chars,
         CAST(n_chars AS DOUBLE) /
           ((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{_WSAMPLE_SALT}'),
               1, 12))::BIGINT + 0.5) / {_WSAMPLE_DENOM!r}) AS priority
  FROM documents
)
SELECT doc_id, lang, n_chars, priority, rn FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY lang ORDER BY priority DESC, doc_id ASC
  ) AS BIGINT) AS rn
  FROM pri
) WHERE rn <= {_WSAMPLE_K}
"""


@query("ext_sample_weighted", oracle=_WSAMPLE_ORACLE, tier=3)
def ext_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED sampling via priority sampling
    (Duffield-Lund-Thorup): each doc gets priority w / u where w is its
    weight (n_chars — "sample long docs proportionally more", the usual
    quality-score stand-in) and u is a content-free hash-uniform in
    (0, 1); the top-K priorities per language stratum are the sample.
    Inclusion probability is proportional to w in the k << n regime, and
    the threshold tau = (K+1)-th priority yields the unbiased
    Horvitz-Thompson estimate w_hat = max(w, tau) downstream. This is the
    weighted complement to ``ext_sample_hashrank`` (uniform): same
    engine-reproducibility contract, weights attached.

    Cross-engine exactness (VERDICT r7 #4 asked for A-ES; priority
    sampling is chosen INSTEAD because its key needs no transcendental):
    u = (v + 0.5) / 2^48 from a 48-bit md5 prefix is exact (dyadic, 49
    mantissa bits), so priority = w / u is ONE correctly-rounded IEEE
    division — bit-identical in Spark and DuckDB, verified by the
    value-hash on the emitted priority column. A-ES's u^(1/w) or
    ln(u)/w keys ride on pow/log whose last-ulp rounding is libm-specific;
    w/u preserves the same top-K order for integer weights with none of
    that risk. The hex->int bridge is conv(substr(md5, 1, 12), 16, 10) in
    Spark and ('0x' || prefix)::BIGINT in DuckDB (bit-equality pinned in
    tests/test_round8.py).

    Shape: priorities are computed map-side from (doc_id, n_chars) alone;
    one shuffle on the stratum key for the per-lang top-K window — same
    plan family as ext_sample_hashrank, and the same bucket-salt merge
    ((lang, hash % B) strata, K per bucket, re-rank the B*K finalists)
    bounds the per-task heap on 100 TB strata."""
    d = load(spark, sf_dir, "documents")
    v = F.conv(
        F.substring(
            F.md5(
                F.concat(F.col("doc_id").cast("string"), F.lit(_WSAMPLE_SALT))
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    u = (v + F.lit(0.5)) / F.lit(_WSAMPLE_DENOM)
    pri = d.select(
        "doc_id",
        "lang",
        "n_chars",
        (F.col("n_chars").cast("double") / u).alias("priority"),
    )
    w = W.partitionBy("lang").orderBy(F.col("priority").desc(), "doc_id")
    return (
        pri.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _WSAMPLE_K)
    )


# --- ext_sample_hashrank_salted -----------------------------------------------

#: Salt-bucket count for the two-pass top-K merge. K winners per stratum
#: can hide in at most K distinct buckets, so keeping K per (stratum,
#: bucket) loses nothing — the finalist pool is B*K rows per stratum, and
#: the final re-rank is exact.
_SALTED_B = 8


@query("ext_sample_hashrank_salted", oracle=_HASHRANK_ORACLE, tier=3)
def ext_sample_hashrank_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ext_sample_hashrank`` through the bucket-salted two-pass merge its
    docstring promises for 100 TB strata (VERDICT r7 #5's "exercise the
    promised swaps" — the sampling-side counterpart to
    ext_dup_ngram_bloom), with the IDENTICAL output (same oracle;
    salted==plain equality pinned in tests/test_round8.py).

    A single per-stratum window forces every row of a stratum through one
    task; with few strata (4 languages here, often ~1 domain at corpus
    scale) that task sees the whole corpus. Salting splits each stratum
    into B=8 hash buckets — (lang, xxhash64(doc_id) % B) — takes the
    top-K inside each bucket (parallelism B per stratum, bounded per-task
    heap), then re-ranks only the B*K finalists per stratum. Losslessness
    is structural: the true top-K by md5 rank occupy at most K buckets,
    and each contributes its members in bucket-local rank order, so every
    true winner survives its bucket's cut. The finalist re-rank window
    moves B*K rows per stratum — thousands, at any corpus size.

    Shape: TWO window shuffles, but the first is on the SALTED key (B x
    parallelism, bounded heaps) and the second on a frame bounded by
    B*K per stratum — this is the plan that survives a single-stratum
    100 TB corpus, where the plain form's one-task window cannot."""
    d = load(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_SAMPLE_SALT)))
    bucket = F.pmod(F.xxhash64("doc_id"), F.lit(_SALTED_B))
    w_bucket = W.partitionBy("lang", "bucket").orderBy("h", "doc_id")
    finalists = (
        d.select("doc_id", "lang", h.alias("h"), bucket.alias("bucket"))
        .withColumn("brn", F.row_number().over(w_bucket))
        .filter(F.col("brn") <= _SAMPLE_K)
        .drop("brn")
    )
    w_final = W.partitionBy("lang").orderBy("h", "doc_id")
    return (
        finalists.withColumn("rn", F.row_number().over(w_final).cast("long"))
        .filter(F.col("rn") <= _SAMPLE_K)
        .select("doc_id", "lang", "h", "rn")
    )


# --- agg_count_min_sketch -----------------------------------------------------

#: Sketch geometry: d=4 rows x w=1024 counters (eps ~ 2e/w ~ 0.5% of the
#: stream per estimate at delta ~ e^-4). Hash bridge: 8-hex md5 prefix per
#: (depth, key) — the cross-engine bridge ext_sample_weighted pinned.
_CMS_D = 4
_CMS_W = 1024
_CMS_SALT = ":bdl-cms-8"
#: Probe set: every 31st user — mixes heavy and light keys (~16 probes at
#: sf0.01, ~64 at sf0.1).
_CMS_PROBE_MOD = 31

_CMS_ORACLE = f"""
WITH cells AS (
  SELECT d,
         ('0x' || substr(md5(CAST(d AS VARCHAR) || '{_CMS_SALT}'
                         || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
           % {_CMS_W} AS bucket,
         COUNT(*) AS c
  FROM events CROSS JOIN unnest(range(0, {_CMS_D})) AS u(d)
  GROUP BY d, bucket
),
truth AS (
  SELECT user_id, COUNT(*) AS true_count FROM events
  WHERE user_id % {_CMS_PROBE_MOD} = 0 GROUP BY user_id
),
est AS (
  SELECT t.user_id, t.true_count, MIN(c.c) AS cms_estimate
  FROM truth t
  JOIN cells c
    ON c.bucket = ('0x' || substr(md5(CAST(c.d AS VARCHAR) || '{_CMS_SALT}'
                                  || CAST(t.user_id AS VARCHAR)), 1, 8))::BIGINT
                  % {_CMS_W}
  GROUP BY t.user_id, t.true_count
)
SELECT user_id, true_count, cms_estimate,
       cms_estimate - true_count AS overcount
FROM est
"""


@query("agg_count_min_sketch", oracle=_CMS_ORACLE, tier=2)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation: a 4 x 1024 counter grid
    built in ONE pass over events (each event increments one bucket per
    depth), then point queries answered as min-over-depths — the
    mergeable-sketch complement to agg_approx_distinct (HLL) and
    agg_heavy_hitters_approx (Misra-Gries): CMS answers "how often did
    THIS key occur" with a one-sided error (never undercounts, pinned in
    tests), and two sketches merge by cell-wise addition, so per-hour /
    per-partition sketches roll up without rescans.

    Probes are every-31st user: the output carries true count, estimate,
    and the overcount so the eps*N error bound is visible and testable.
    Hashing is the md5-prefix bridge (bit-identical in both engines);
    every count is exact integer arithmetic, so the whole sketch is
    deterministic and the oracle replays it cell for cell.

    Shape: the build is one groupBy over (depth, bucket) — map-side
    combined, at most d*w = 4096 rows cross the exchange regardless of
    stream size. The probe joins the 4096-row sketch (broadcast) to the
    probe keys' per-depth buckets. At 100 TB the sketch is still 4096
    rows — that invariance is the whole point."""
    e = load(spark, sf_dir, "events")
    depths = F.explode(
        F.sequence(F.lit(0), F.lit(_CMS_D - 1))
    ).alias("d")
    bucket_of = lambda d_col, key_col: F.pmod(  # noqa: E731
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        d_col.cast("string"),
                        F.lit(_CMS_SALT),
                        key_col.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(_CMS_W),
    )
    cells = (
        e.select("user_id", depths)
        .select("d", bucket_of(F.col("d"), F.col("user_id")).alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    truth = (
        e.filter(F.col("user_id") % _CMS_PROBE_MOD == 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    probes = truth.select(
        "user_id",
        "true_count",
        F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("d"),
    ).select(
        "user_id",
        "true_count",
        "d",
        bucket_of(F.col("d"), F.col("user_id")).alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("user_id", "true_count")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return est.select(
        "user_id",
        "true_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("true_count")).alias("overcount"),
    )


# --- ext_skyline_dominance ----------------------------------------------------

_SKYLINE_ORACLE = """
WITH spend AS (
  SELECT o_custkey AS ck,
         CAST(SUM(CAST(floor(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5)
                       AS BIGINT)) AS BIGINT) AS sp
  FROM orders GROUP BY o_custkey
),
base AS (
  SELECT n_name AS nation, c_custkey AS cust,
         COALESCE(sp, 0) AS spend_cents,
         CAST(floor(CAST(c_acctbal AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
           AS bal_cents
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  LEFT JOIN spend ON c_custkey = ck
)
SELECT nation, cust, spend_cents, bal_cents
FROM base b
WHERE NOT EXISTS (
  SELECT 1 FROM base o
  WHERE o.nation = b.nation
    AND o.spend_cents >= b.spend_cents
    AND o.bal_cents >= b.bal_cents
    AND (o.spend_cents > b.spend_cents OR o.bal_cents > b.bal_cents)
)
"""


@query("ext_skyline_dominance", oracle=_SKYLINE_ORACLE, tier=2)
def ext_skyline_dominance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation 2-D skyline (Pareto frontier) of customers over
    (lifetime spend, account balance), both maximized: the classic
    dominance operator (Borzsony/Kossmann SKYLINE OF) — "which accounts
    are not strictly worse than some other account on BOTH axes" — used
    for candidate shortlists (pricing outliers, whale screens) where a
    single weighted score would hide the frontier's shape.

    A point is dominated iff some same-nation point is >= on both axes
    and > on at least one; exact duplicates dominate neither and both
    survive (strict dominance). The ORACLE states the textbook quadratic
    NOT EXISTS definition; the Spark plan proves the O(n log n) sort-scan
    identity against it: sorted by spend DESC, a point is dominated
    exactly when (a) the running MAX of balance over strictly-higher
    spend rows reaches its balance (RANGE .. 1 PRECEDING on integer
    cents makes "strictly higher" exact), or (b) a same-spend row has
    strictly higher balance (MAX over the (nation, spend) peer group).
    Both tests ride ONE nation-keyed exchange — no self-join anywhere.

    Exactness: both axes are floor-quantized integer cents; zero-order
    customers enter at exact spend 0 (they can still make the frontier
    on balance — excluding them would fabricate dominance). All
    comparisons are integer; no doubles in the decision path.

    Shape at 100 TB: one map-side-combined custkey aggregate, a
    broadcast nation dim, then the window exchange keyed on nation. A
    skewed partition key (25 nations) swaps to the distributed-skyline
    form: per-partition LOCAL skylines first (the same window over a
    salted key collapses ~all points — skyline of uniform n is O(log n))
    then the global pass over the model-sized union of local frontiers."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    spend = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(quantize_long("o_totalprice", 2)).cast("long").alias("sp")
    )
    base = (
        c.join(
            F.broadcast(n),
            c.c_nationkey == n.n_nationkey,
        )
        .join(spend, c.c_custkey == F.col("ck"), "left")
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_custkey").alias("cust"),
            F.coalesce("sp", F.lit(0).cast("long")).alias("spend_cents"),
            quantize_long("c_acctbal", 2).cast("long").alias("bal_cents"),
        )
    )
    flagged = base.select(
        "nation",
        "cust",
        "spend_cents",
        "bal_cents",
        F.expr(
            "MAX(bal_cents) OVER (PARTITION BY nation ORDER BY spend_cents"
            " DESC RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        ).alias("m_higher"),
        F.expr(
            "MAX(bal_cents) OVER (PARTITION BY nation, spend_cents)"
        ).alias("m_peer"),
    )
    return flagged.filter(
        ~(
            F.coalesce(
                F.col("m_higher") >= F.col("bal_cents"), F.lit(False)
            )
            | (F.col("m_peer") > F.col("bal_cents"))
        )
    ).select("nation", "cust", "spend_cents", "bal_cents")


# --- ext_consistent_hash_ring ---------------------------------------------------

#: Ring geometry: 8 nodes x 8 virtual nodes. Vnode positions are md5 of
#: CONSTANT strings, so they are computed once in Python and baked as
#: identical literals into both engine texts (the baked-constant
#: stance); only the per-key hash is computed at runtime.
_RING_NODES = 8
_RING_VNODES = 8
_RING_REMOVED = 7


def _ring_positions(exclude: int | None = None) -> list[tuple[int, int]]:
    import hashlib as _hl

    pts = []
    for n in range(_RING_NODES):
        if n == exclude:
            continue
        for k in range(_RING_VNODES):
            pos = int(
                _hl.md5(f"node{n}#v{k}#ring".encode()).hexdigest()[:15],
                16,
            )
            pts.append((pos, n))
    pts.sort()
    return pts


def _ring_oracle() -> str:
    r8 = ", ".join(f"({p}, {n})" for p, n in _ring_positions())
    return f"""
WITH ring8(pos, node) AS (VALUES {r8}),
ring7 AS (SELECT pos, node FROM ring8 WHERE node <> {_RING_REMOVED}),
keys AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#ringkey'),
                         1, 15))::BIGINT AS h
  FROM documents
),
a8 AS (
  SELECT k.doc_id, k.h,
         COALESCE(MIN(CASE WHEN r.pos >= k.h THEN r.pos END),
                  MIN(r.pos)) AS spos
  FROM keys k CROSS JOIN ring8 r GROUP BY k.doc_id, k.h
),
a7 AS (
  SELECT k.doc_id,
         COALESCE(MIN(CASE WHEN r.pos >= k.h THEN r.pos END),
                  MIN(r.pos)) AS spos
  FROM keys k CROSS JOIN ring7 r GROUP BY k.doc_id
),
assign AS (
  SELECT a8.doc_id, r8.node AS node8, r7.node AS node7
  FROM a8
  JOIN ring8 r8 ON a8.spos = r8.pos
  JOIN a7 ON a8.doc_id = a7.doc_id
  JOIN ring7 r7 ON a7.spos = r7.pos
),
nodes AS (SELECT DISTINCT node FROM ring8),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM assign)
SELECT CAST(n.node AS BIGINT) AS node,
       CAST(COALESCE(SUM(CASE WHEN a.node8 = n.node THEN 1 END), 0)
            AS BIGINT) AS n_keys,
       CAST(COALESCE(SUM(CASE WHEN a.node8 = n.node THEN 1 END), 0)
            AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS share,
       CAST(COALESCE(SUM(CASE WHEN a.node7 = n.node THEN 1 END), 0)
            AS BIGINT) AS n_keys_after_removal,
       CAST(COALESCE(SUM(CASE WHEN a.node7 = n.node
                          AND a.node8 <> a.node7 THEN 1 END), 0)
            AS BIGINT) AS n_gained
FROM nodes n
CROSS JOIN tot t
LEFT JOIN assign a ON TRUE
GROUP BY n.node, t.n_total
"""


_RING_ORACLE = _ring_oracle()


@query("ext_consistent_hash_ring", oracle=_RING_ORACLE, tier=3)
def ext_consistent_hash_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash RING with virtual nodes (the Dynamo/Cassandra/
    memcached construction) next to ext_shard_rendezvous's HRW: each
    key goes to the first vnode clockwise from its hash, 8 vnodes per
    node smooth the arc-length variance, and the audit REMOVES node 7
    and re-assigns — the ring's defining property is that exactly the
    departed node's keys move (each to the next arc owner) while every
    other key stays put, which is what lets a 100 TB shard map lose a
    worker without a corpus-wide reshuffle. Emits per node the 8-ring
    load, its share, the 7-ring load, and the keys it GAINED from the
    removal (pinned in tests: gains sum exactly to node 7's load;
    nobody else loses anything).

    Exactness: vnode positions are md5 of constant strings — computed
    once in Python, baked as identical literals into both engine texts
    — and the per-key hash is the shared md5 60-bit bridge; successor
    choice is integer MIN arithmetic; the share is one IEEE division.

    Shape: the ring is an in-row sorted ARRAY literal, so BOTH
    assignments are pure map-side filter/first-element array ops (zero
    joins, zero shuffles — the rendezvous projection stance); ONE
    node-keyed counting aggregate (8-row output) and a 1-row total
    fold (EXPECTED_FLAGS) finish. The oracle keeps the independent
    64-row cross-join/argmin mirror."""
    arr8 = "array(" + ", ".join(
        f"named_struct('pos', {p}L, 'node', {n}L)"
        for p, n in _ring_positions()
    ) + ")"
    arr7 = "array(" + ", ".join(
        f"named_struct('pos', {p}L, 'node', {n}L)"
        for p, n in _ring_positions(exclude=_RING_REMOVED)
    ) + ")"
    d = load(spark, sf_dir, "documents").select(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit("#ringkey")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h")
    )
    assigned = d.select(
        F.expr(
            f"coalesce(try_element_at(filter({arr8}, e -> e.pos >= h),"
            f" 1).node, {arr8}[0].node)"
        ).alias("node8"),
        F.expr(
            f"coalesce(try_element_at(filter({arr7}, e -> e.pos >= h),"
            f" 1).node, {arr7}[0].node)"
        ).alias("node7"),
    )
    from ..session import scoped_persist

    assigned = scoped_persist(assigned)
    tot = assigned.agg(F.count(F.lit(1)).alias("n_total"))
    nodes = spark.createDataFrame(
        [(n,) for n in range(_RING_NODES)], "node long"
    )
    g8 = assigned.groupBy(F.col("node8").alias("node")).agg(
        F.count(F.lit(1)).alias("n_keys")
    )
    g7 = assigned.groupBy(F.col("node7").alias("node")).agg(
        F.count(F.lit(1)).alias("n_keys_after_removal"),
        F.sum(
            (F.col("node8") != F.col("node7")).cast("int")
        )
        .cast("long")
        .alias("n_gained"),
    )
    return (
        nodes.join(F.broadcast(g8), "node", "left")
        .join(F.broadcast(g7), "node", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "node",
            F.coalesce(F.col("n_keys"), F.lit(0)).alias("n_keys"),
            (
                F.coalesce(F.col("n_keys"), F.lit(0)).cast("double")
                / F.col("n_total").cast("double")
            ).alias("share"),
            F.coalesce(F.col("n_keys_after_removal"), F.lit(0)).alias(
                "n_keys_after_removal"
            ),
            F.coalesce(F.col("n_gained"), F.lit(0)).alias("n_gained"),
        )
    )
