"""Data-profiling operators (SURVEY.md §2.11 round-4 additions): the
summary queries a warehouse runs before trusting a new drop — modal values,
fixed-width histograms, and per-column stats. All three are single-pass
scan+aggregate shapes whose outputs are O(buckets)/O(columns) rows at any
corpus scale; the fact table shuffles once (or not at all for the global
profiles) and every float reduction is decimal-quantized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.determinism import MICRO, dsum, o_dsum, quantize_long
from ..plans.registry import query
from ..tables import load

# --- prof_mode_segment ------------------------------------------------------

_MODE_ORACLE = """
SELECT c_mktsegment, c_nationkey AS mode_nation, cnt
FROM (
  SELECT c_mktsegment, c_nationkey, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY COUNT(*) DESC, c_nationkey ASC) AS rn
  FROM customer GROUP BY c_mktsegment, c_nationkey
)
WHERE rn = 1
"""


@query("prof_mode_segment", oracle=_MODE_ORACLE, tier=1)
def prof_mode_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal nation per market segment — the MODE() profile with a
    deterministic tie-break (highest count, then lowest nation key).
    One shuffle to the (segment, nation) counts; the row_number window
    then runs on that aggregated frame, whose size is O(segments x
    nations) — the window never sees fact-table rows, so partition skew
    on a hot segment cannot form."""
    c = load(spark, sf_dir, "customer")
    counts = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("cnt").desc(), F.col("c_nationkey").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("c_nationkey").alias("mode_nation"),
            "cnt",
        )
    )


# --- prof_histogram_price ---------------------------------------------------

# 25k-wide buckets over o_totalprice (fixture range ~[1e3, 5e5] => ~20
# buckets). bucket = floor(price / 25000): price is a 2-decimal double
# and 25000 is a power-of-two-free exact constant, but the division is
# the SAME double op in both engines, so the floor binds identically.
_HIST_ORACLE = f"""
SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
       CAST(floor(o_totalprice / 25000) AS BIGINT) * 25000 AS bucket_lo,
       COUNT(*) AS n_orders,
       {o_dsum("o_totalprice", "bucket_total")}
FROM orders
GROUP BY bucket
"""


@query("prof_histogram_price", oracle=_HIST_ORACLE, tier=1)
def prof_histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value: one map-side-combined
    aggregate keyed on the bucket index — the reduced frame is O(range /
    width) rows regardless of order count, so the profile costs one scan
    and a near-empty shuffle at any scale. Emits bucket bounds so the
    result is self-describing."""
    o = load(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 25000)
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "bucket_total"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 25000).alias("bucket_lo"),
            "n_orders",
            "bucket_total",
        )
    )


# --- prof_column_stats ------------------------------------------------------

_STAT_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")

_STATS_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       MIN({c}) AS min_val,
       MAX({c}) AS max_val,
       {o_dsum(c, "sum_val")}
FROM lineitem"""
    for c in _STAT_COLS
)


@query("prof_column_stats", oracle=_STATS_ORACLE, tier=1)
def prof_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile (nulls, distincts, min/max, exact sum) for the
    lineitem measure columns, one row per column.

    Shape: each column first collapses to its DISTINCT VALUES with counts
    (groupBy(c) — map-side combined, so the shuffle carries distinct
    values per partition, not rows), then a 1-row aggregate derives every
    stat from that value-histogram: n_rows = sum(n), n_null = n of the
    null group, n_distinct = non-null group count, exact sum =
    sum(quantized_value * n) (integer x integer stays exact in decimal,
    matching the oracle's per-row quantized sum). This beats the single-agg
    multi-countDistinct form, which expands the scan 5x and shuffles the
    expansion (measured 1.25s vs 0.80s warm at sf0.1) — and at 100 TB
    the expand form's shuffle is 5x corpus width while this one's is
    bounded by per-column cardinality. The four 1-row frames cross-join
    (broadcast) and stack() unpivots map-side."""
    li = load(spark, sf_dir, "lineitem")
    frames = []
    for c in _STAT_COLS:
        g = li.groupBy(c).agg(F.count(F.lit(1)).alias("n"))
        frames.append(
            g.agg(
                F.sum("n").alias(f"{c}__n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col(c).isNull(), F.col("n"))), F.lit(0)
                ).alias(f"{c}__n_null"),
                F.count(c).alias(f"{c}__n_distinct"),
                F.min(c).alias(f"{c}__min_val"),
                F.max(c).alias(f"{c}__max_val"),
                # floor-quantized value x count stays exact in decimal and
                # equals the oracle's per-row quantized sum; double cast
                # then the 1e6 divide mirror o_dsum's op order
                (
                    F.sum(
                        quantize_long(F.col(c)).cast("decimal(38,0)")
                        * F.col("n")
                    ).cast("double")
                    / MICRO
                ).alias(f"{c}__sum_val"),
            )
        )
    wide = frames[0]
    for f in frames[1:]:
        wide = wide.crossJoin(F.broadcast(f))
    stack_args = ", ".join(
        f"'{c}', {c}__n_rows, {c}__n_null, {c}__n_distinct,"
        f" {c}__min_val, {c}__max_val, {c}__sum_val"
        for c in _STAT_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_STAT_COLS)}, {stack_args}) AS "
            "(col_name, n_rows, n_null, n_distinct, min_val, max_val, sum_val)"
        )
    )


# --- prof_skew_report -------------------------------------------------------

_SKEW_ORACLE = """
WITH c AS (
  SELECT o_custkey AS key, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
),
s AS (SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows FROM c)
SELECT key, cnt, n_keys, n_rows,
       CAST(cnt AS DOUBLE) * n_keys / n_rows AS skew_ratio
FROM c, s
ORDER BY cnt DESC, key ASC
LIMIT 10
"""


@query("prof_skew_report", oracle=_SKEW_ORACLE, tier=2)
def prof_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report for orders.o_custkey: the top-10 hottest keys
    with their skew ratio (key count over the mean count per key). This
    is the diagnosis run BEFORE choosing a join strategy — a ratio near 1
    says hash-partitioning balances, a 1000x ratio says salt this key or
    rely on AQE skew-join splitting (join_skew_salted implements the
    remedy; this operator finds the patients).

    Shape: one map-side-combined groupBy on the key, a 1-row (n_keys,
    n_rows) aggregate broadcast back, and TakeOrderedAndProject for the
    top-10 — never a global window, never a full sort. At 100 TB the
    per-key count frame is the only shuffle and is exactly the join's own
    build-side histogram; the report is O(distinct keys) -> 10 rows. The
    ratio multiplies/divides exact integers in doubles, identical ops in
    both engines."""
    o = load(spark, sf_dir, "orders")
    c = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    s = c.agg(
        F.count(F.lit(1)).alias("n_keys"), F.sum("cnt").alias("n_rows")
    )
    return (
        c.crossJoin(F.broadcast(s))
        .select(
            "key",
            "cnt",
            "n_keys",
            "n_rows",
            (F.col("cnt").cast("double") * F.col("n_keys") / F.col("n_rows"))
            .alias("skew_ratio"),
        )
        .orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(10)
    )


# --- prof_psi_drift -----------------------------------------------------------

#: Bucket count for the PSI histogram and the floor clamp for empty-bucket
#: proportions (the standard PSI epsilon so ln() stays finite).
_PSI_BUCKETS = 10
_PSI_EPS = 1e-6

#: Final per-bucket PSI term is floor-quantized to 6dp: the two engines'
#: ln() can differ by 1 ulp (the ext_char_entropy/_ENT_SCALE story), and
#: the proportions themselves are exact IEEE divisions of exact integer
#: counts, so 6dp absorbs the ulp without hiding real drift.
_PSI_ORACLE = f"""
WITH q AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(floor(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
           AS cents
  FROM orders
  WHERE year(o_orderdate) IN (1997, 1998)
),
ext AS (SELECT MIN(cents) AS mn, MAX(cents) AS mx FROM q),
b AS (
  SELECT yr,
         CAST(((cents - mn) * {_PSI_BUCKETS}) // (mx - mn + 1) AS BIGINT)
           AS bucket
  FROM q, ext
),
c AS (
  SELECT bucket,
         COUNT(CASE WHEN yr = 1997 THEN 1 END) AS n_ref,
         COUNT(CASE WHEN yr = 1998 THEN 1 END) AS n_cur
  FROM b GROUP BY bucket
),
t AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM c)
SELECT bucket, n_ref, n_cur,
       floor(
         ((CAST(n_ref AS DOUBLE) / t_ref) - (CAST(n_cur AS DOUBLE) / t_cur))
         * ln(greatest(CAST(n_ref AS DOUBLE) / t_ref, {_PSI_EPS!r})
              / greatest(CAST(n_cur AS DOUBLE) / t_cur, {_PSI_EPS!r}))
         * 1000000.0 + 0.5
       ) / 1000000.0 AS psi_term
FROM c, t
"""


@query("prof_psi_drift", oracle=_PSI_ORACLE, tier=2)
def prof_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two corpus snapshots — the
    standard data-drift monitor a production pipeline runs on every new
    ingest batch (credit-risk lineage; the same math monitors feature
    and label drift in training-data refreshes): bucket the metric into
    a fixed histogram over the COMBINED range, compare the reference and
    current proportion per bucket, and book the per-bucket PSI term
    (p_ref - p_cur) * ln(p_ref / p_cur). Σterms < 0.1 is the customary
    "stable" band; the per-bucket grain keeps the drifting buckets
    attributable instead of one opaque scalar.

    Determinism: prices quantize to exact integer cents BEFORE binning,
    and the bin is integer multiply/DIV off a 1-row min/max fold — a
    float-binned histogram can flip a boundary row per engine ulp and
    desync the COUNTS, which no output rounding could repair. Counts
    then divide exactly, and only the final transcendental term is
    quantized (6dp, the 1-ulp-ln story in the constant's comment).

    Shape: scan -> 1-row extents fold (broadcast) -> map-side bucket
    arithmetic -> one {_PSI_BUCKETS}-row conditional aggregate -> 1-row
    totals fold joined back. Everything after the first aggregate is
    O(buckets); at 100 TB both snapshot scans are column-pruned and the
    exchange carries bucket partials only."""
    o = load(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1997, 1998)
    )
    q = o.select(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.floor(F.col("o_totalprice").cast("double") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    ext = q.agg(F.min("cents").alias("mn"), F.max("cents").alias("mx"))
    b = q.crossJoin(F.broadcast(ext)).select(
        "yr",
        F.expr(f"CAST(((cents - mn) * {_PSI_BUCKETS}) DIV (mx - mn + 1) AS BIGINT)").alias(
            "bucket"
        ),
    )
    c = b.groupBy("bucket").agg(
        F.count(F.when(F.col("yr") == 1997, 1)).alias("n_ref"),
        F.count(F.when(F.col("yr") == 1998, 1)).alias("n_cur"),
    )
    t = c.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p_ref = F.col("n_ref").cast("double") / F.col("t_ref")
    p_cur = F.col("n_cur").cast("double") / F.col("t_cur")
    term = (p_ref - p_cur) * F.log(
        F.greatest(p_ref, F.lit(_PSI_EPS)) / F.greatest(p_cur, F.lit(_PSI_EPS))
    )
    return c.crossJoin(F.broadcast(t)).select(
        "bucket",
        "n_ref",
        "n_cur",
        (F.floor(term * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("psi_term"),
    )


# --- prof_corr_matrix --------------------------------------------------------

#: The four lineitem measures profiled pairwise (6 unordered pairs).
_CM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

#: Quantization scale for the corr inputs: 2 decimal places (cents /
#: hundredths) captures every fixture value exactly, so all moments are
#: EXACT integer sums and the only float arithmetic is the final closed
#: form — identical IEEE ops on identical integers in both engines.
_CM_SCALE = 100.0


def _cm_moment_exprs(prod_cast: str) -> list[tuple[str, str]]:
    """(expression, alias) pairs for the single-pass moment aggregate.
    ``prod_cast`` widens the per-row product before summing: cross
    products reach ~1e14 per row, so a 64-bit SUM overflows past ~1e5
    rows — DECIMAL(38,0) on the Spark side, HUGEINT in DuckDB."""
    out = [("COUNT(*)", "n")]
    for i in range(len(_CM_COLS)):
        # widened like the products: at the docstring's 100 TB narrative
        # (~6e11 rows x ~1e7 cents) a bare BIGINT s_1 approaches int64
        # range — the overflow headroom must hold for BOTH moment kinds
        out.append((f"SUM(CAST(c{i} AS {prod_cast}))", f"s_{i}"))
    for i in range(len(_CM_COLS)):
        for j in range(i, len(_CM_COLS)):
            out.append(
                (f"SUM(CAST(c{i} AS {prod_cast}) * c{j})", f"s_{i}_{j}")
            )
    return out


def _cm_corr_expr(i: int, j: int) -> str:
    """Pearson corr from exact integer moments, as a portable SQL string
    (textually identical in both engines => bit-identical doubles)."""
    n = "CAST(n AS DOUBLE)"
    sx, sy = f"CAST(s_{i} AS DOUBLE)", f"CAST(s_{j} AS DOUBLE)"
    sxy = f"CAST(s_{i}_{j} AS DOUBLE)"
    sxx, syy = f"CAST(s_{i}_{i} AS DOUBLE)", f"CAST(s_{j}_{j} AS DOUBLE)"
    raw = (
        f"(({n} * {sxy}) - ({sx} * {sy})) / "
        f"sqrt((({n} * {sxx}) - ({sx} * {sx}))"
        f" * (({n} * {syy}) - ({sy} * {sy})))"
    )
    # 1e6 / CAST(.5): scientific-notation literals parse as DOUBLE in both
    # engines, while Spark SQL reads "1000000.0" as DECIMAL and the whole
    # quantizer silently becomes decimal(30,9) arithmetic
    return f"floor(({raw}) * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6"


def _cm_quantized_sql() -> str:
    cols = ", ".join(
        f"CAST(floor({c} * {_CM_SCALE} + 0.5) AS BIGINT) AS c{i}"
        for i, c in enumerate(_CM_COLS)
    )
    return f"SELECT {cols} FROM lineitem"


def _cm_pairs() -> list[tuple[int, int]]:
    k = len(_CM_COLS)
    return [(i, j) for i in range(k) for j in range(i + 1, k)]


_CORRM_ORACLE = (
    f"WITH q AS ({_cm_quantized_sql()}),\n"
    "m AS MATERIALIZED (SELECT "
    + ", ".join(f"{e} AS {a}" for e, a in _cm_moment_exprs("HUGEINT"))
    + " FROM q)\n"
    + "\nUNION ALL\n".join(
        f"SELECT '{_CM_COLS[i]}' AS col_x, '{_CM_COLS[j]}' AS col_y, "
        f"n, {_cm_corr_expr(i, j)} AS corr FROM m"
        for i, j in _cm_pairs()
    )
)


@query("prof_corr_matrix", oracle=_CORRM_ORACLE, tier=2)
def prof_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix over the lineitem measures in ONE scan
    pass — the numeric-profiling step (feature redundancy / leakage
    screening) a warehouse runs before trusting a new drop. All 14
    raw moments (count, 4 sums, 10 sum-of-products) come from a single
    global aggregate, so the fact table is read once and never shuffled:
    the SinglePartition exchange carries one partial-moment row per task
    (O(tasks), EXPECTED_FLAGS), exactly how a 1000-executor profile job
    wants it. The 6 pair rows then explode map-side from the 1-row frame.

    Determinism: inputs quantize to exact hundredths (the prof_psi_drift
    integer-binning story), so every moment is an exact integer —
    products widen to DECIMAL(38,0)/HUGEINT because squared cents reach
    ~1e14 per row and a 64-bit sum overflows past ~1e5 rows — and the
    closed form is the TEXTUALLY IDENTICAL double expression in both
    engines (generated by _cm_corr_expr), quantized at 6dp."""
    li = load(spark, sf_dir, "lineitem").select(
        *[
            quantize_long(c, 2).alias(f"c{i}")
            for i, c in enumerate(_CM_COLS)
        ]
    )
    m = li.agg(
        *[
            F.expr(e).alias(a)
            for e, a in _cm_moment_exprs("DECIMAL(38,0)")
        ]
    )
    pair_structs = [
        F.struct(
            F.lit(_CM_COLS[i]).alias("col_x"),
            F.lit(_CM_COLS[j]).alias("col_y"),
            F.col("n").alias("n"),
            F.expr(_cm_corr_expr(i, j)).alias("corr"),
        )
        for i, j in _cm_pairs()
    ]
    return m.select(
        F.explode(F.array(*pair_structs)).alias("pr")
    ).select("pr.*")


# --- prof_benford -----------------------------------------------------------

#: ln(1 + 1/d) / ln(10) — Benford's expected first-digit share, emitted as
#: the identical double expression in both engines (no precomputed float
#: literal drift).
_BENFORD_EXP = "(ln(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / CAST(d AS DOUBLE)) / ln(CAST(10.0 AS DOUBLE)))"

_BENFORD_ORACLE = f"""
WITH cents AS (
  SELECT CAST(floor(o_totalprice * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT)
    AS c
  FROM orders
),
digit AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM cents WHERE c > 0
),
counts AS (
  SELECT d, COUNT(*) AS n FROM digit GROUP BY d
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts)
SELECT d AS first_digit, n,
       floor((CAST(n AS DOUBLE) / CAST(total AS DOUBLE)) * 1e6
             + CAST(0.5 AS DOUBLE)) / 1e6 AS observed_share,
       floor({_BENFORD_EXP} * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6
         AS benford_share,
       floor(
         ((CAST(n AS DOUBLE) / CAST(total AS DOUBLE)) - {_BENFORD_EXP})
         * ((CAST(n AS DOUBLE) / CAST(total AS DOUBLE)) - {_BENFORD_EXP})
         / {_BENFORD_EXP} * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6
         AS chi2_term
FROM counts, tot
"""


@query("prof_benford", oracle=_BENFORD_ORACLE, tier=2)
def prof_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit over order totals — the
    classic forensic / data-quality screen (fabricated or re-binned
    monetary data drifts from the log-uniform digit law; a synthetic
    uniform fixture deviates MASSIVELY, which the declared chi2 terms
    make visible per digit rather than as one opaque statistic).

    Determinism: amounts quantize to exact cents, the first digit is
    string-sliced from the integer (no float log10 near a power-of-ten
    boundary), and the only transcendental — the expected share
    ln(1+1/d)/ln(10) — is the identical expression text in both engines,
    quantized at 6dp. Shape: map-side digit extraction, one 9-row
    conditional aggregate, 1-row total fold joined back
    (EXPECTED_FLAGS). At 100 TB: one column-pruned scan pass."""
    o = load(spark, sf_dir, "orders")
    digit = o.select(
        quantize_long("o_totalprice", 2).alias("c")
    ).filter(F.col("c") > 0).select(
        F.expr("CAST(substr(CAST(c AS STRING), 1, 1) AS BIGINT)").alias("d")
    )
    counts = digit.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("total"))
    share = "(CAST(n AS DOUBLE) / CAST(total AS DOUBLE))"
    return counts.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("first_digit"),
        "n",
        F.expr(
            f"floor({share} * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6"
        ).alias("observed_share"),
        F.expr(
            f"floor({_BENFORD_EXP} * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6"
        ).alias("benford_share"),
        F.expr(
            f"floor(({share} - {_BENFORD_EXP}) * ({share} - {_BENFORD_EXP})"
            f" / {_BENFORD_EXP} * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6"
        ).alias("chi2_term"),
    )


# --- prof_entropy_profile ----------------------------------------------------

#: Profiled expressions over ``orders``: (name, value SQL). Values cast
#: to STRING so one (col, value) explode schema serves every column;
#: groupings only compare within an engine. Spans a 3-value enum, a
#: 5-value enum, the 80-value calendar, the high-cardinality key line,
#: and a bucketed measure.
_ENT_COLS = [
    ("o_orderstatus", "o_orderstatus"),
    ("o_orderpriority", "o_orderpriority"),
    ("order_month", "date_format(o_orderdate, 'yyyy-MM')"),
    ("o_custkey", "CAST(o_custkey AS STRING)"),
    ("price_k_bucket", "CAST(CAST(floor(o_totalprice / 1000) AS BIGINT) AS STRING)"),
]

#: Shannon entropy from exact value counts; ln is the only
#: transcendental, so the final statistic quantizes at 6dp (the
#: prof_benford 1-ulp discipline) — the cross-row double sum's noise
#: (~1e-12) is far inside the quantum.
_ENTROPY_ORACLE = """
WITH cand AS (
""" + "\n  UNION ALL\n".join(
    "  SELECT '{name}' AS col, {expr} AS val FROM orders".format(
        name=n,
        expr=e.replace("CAST(o_custkey AS STRING)", "CAST(o_custkey AS VARCHAR)")
        .replace(
            "date_format(o_orderdate, 'yyyy-MM')",
            "strftime(o_orderdate, '%Y-%m')",
        )
        .replace(
            "CAST(CAST(floor(o_totalprice / 1000) AS BIGINT) AS STRING)",
            "CAST(CAST(floor(o_totalprice / 1000) AS BIGINT) AS VARCHAR)",
        ),
    )
    for n, e in _ENT_COLS
) + """
), counts AS (
  SELECT col, val, COUNT(*) AS c FROM cand GROUP BY col, val
)
SELECT col,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       floor(SUM(CAST(c AS DOUBLE)
                 * ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE)))
             / CAST(SUM(c) AS DOUBLE)
             / ln(CAST(2 AS DOUBLE)) * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6
         AS entropy_bits,
       CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS distinct_ratio
FROM (SELECT col, val, c, SUM(c) OVER (PARTITION BY col) AS n FROM counts) z
GROUP BY col
"""


@query("prof_entropy_profile", oracle=_ENTROPY_ORACLE, tier=2)
def prof_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon-entropy column profile (the information-content screen a
    profiler runs next to prof_column_stats): per declared expression,
    the exact row/distinct counts, the entropy in bits, and the
    distinct ratio — low entropy flags near-constant columns,
    entropy ~ log2(n) flags key-like ones; the candidate set spans both
    extremes plus the calendar and a bucketed measure.

    Shape: ONE scan explodes every candidate's (col, value) pair
    map-side (the prof_fd_discovery pattern), one (col, val) count
    aggregate, then the per-col rollup is O(distinct values) with the
    entropy as a closed form over exact counts. The only transcendental
    is ln, quantized at 6dp after the sum (the prof_benford 1-ulp
    discipline). At 100 TB the (col, val) aggregate partial-combines
    map-side and the rollup key space is the value domains."""
    structs = ", ".join(
        f"struct('{n}' AS col, {e} AS val)" for n, e in _ENT_COLS
    )
    counts = (
        load(spark, sf_dir, "orders")
        .select(F.expr(f"explode(array({structs}))").alias("c"))
        .select("c.*")
        .groupBy("col", "val")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    z = counts.select(
        "col", "c", F.sum("c").over(W.partitionBy("col")).alias("n")
    )
    return z.groupBy("col").agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.expr(
            "floor(SUM(CAST(c AS DOUBLE)"
            " * ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE)))"
            " / CAST(SUM(c) AS DOUBLE)"
            " / ln(CAST(2 AS DOUBLE)) * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6"
        ).alias("entropy_bits"),
        F.expr(
            "CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)"
        ).alias("distinct_ratio"),
    )


# --- prof_freshness_lag ------------------------------------------------------

# Per-feed freshness report against a deterministic as-of (the global
# max event time — no wall clock in a graded plan): last-seen lag and
# the worst inter-arrival gap, both as exact whole seconds from
# microsecond integers.
_FRESHNESS_ORACLE = """
WITH ev AS (
  SELECT event_type, epoch_us(ts) AS us,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
         ) AS gap_us
  FROM events
), asf AS (SELECT MAX(us) AS max_us FROM ev)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST((a.max_us - MAX(us)) // 1000000 AS BIGINT) AS lag_seconds,
       CAST(COALESCE(MAX(gap_us), 0) // 1000000 AS BIGINT)
         AS max_gap_seconds
FROM ev, asf a
GROUP BY event_type, a.max_us
"""


@query("prof_freshness_lag", oracle=_FRESHNESS_ORACLE, tier=2)
def prof_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-freshness profile: per event type (the feed), how far its
    last arrival lags the as-of point (the global max event time — a
    deterministic stand-in for wall clock, the bill_dunning_aging
    precedent) and the worst inter-arrival gap — the staleness monitor
    a loader checks before trusting a feed's completeness.

    Shape: one event_type-keyed window for the inter-arrival gaps (the
    (ts, event_id) composite keeps lag deterministic), one feed-keyed
    aggregate, and a 1-row as-of fold broadcast back. All arithmetic is
    exact integer microseconds floor-divided to whole seconds — no
    float time math anywhere."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        (
            F.unix_micros("ts")
            - F.lag(F.unix_micros("ts")).over(
                W.partitionBy("event_type").orderBy("ts", "event_id")
            )
        ).alias("gap_us"),
    )
    asof = ev.agg(F.max("us").alias("max_us"))
    return (
        ev.crossJoin(F.broadcast(asof))
        .groupBy("event_type", "max_us")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                "CAST((FIRST(max_us) - MAX(us)) DIV 1000000 AS BIGINT)"
            ).alias("lag_seconds"),
            F.expr(
                "CAST(COALESCE(MAX(gap_us), 0) DIV 1000000 AS BIGINT)"
            ).alias("max_gap_seconds"),
        )
        .drop("max_us")
    )


# --- prof_gini_concentration --------------------------------------------------

_GINI_ORACLE = """
WITH spend AS (
  SELECT o_custkey AS ck,
         CAST(SUM(CAST(floor(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5)
                       AS BIGINT)) AS BIGINT) AS sp
  FROM orders GROUP BY o_custkey
),
base AS (
  SELECT c_mktsegment AS segment, c_custkey AS cust, COALESCE(sp, 0) AS x
  FROM customer LEFT JOIN spend ON c_custkey = ck
),
ranked AS (
  SELECT segment, x,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY segment ORDER BY x ASC, cust ASC) AS BIGINT) AS rn,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY segment ORDER BY x DESC, cust ASC) AS BIGINT) AS rd,
         CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS n
  FROM base
),
agg AS (
  SELECT segment,
         MAX(n) AS n_customers,
         CAST(SUM(x) AS BIGINT) AS total_cents,
         CAST(SUM(CAST(rn AS HUGEINT) * x) AS DOUBLE) AS wsum_d,
         MAX((n + 9) // 10) AS top_decile_n,
         CAST(SUM(CASE WHEN rd <= (n + 9) // 10 THEN x ELSE 0 END)
              AS BIGINT) AS top_decile_cents
  FROM ranked GROUP BY segment
)
SELECT segment, n_customers, total_cents, top_decile_n, top_decile_cents,
       (2.0 * wsum_d
        - (CAST(n_customers AS DOUBLE) + 1.0) * CAST(total_cents AS DOUBLE))
       / (CAST(n_customers AS DOUBLE)
          * CAST(NULLIF(total_cents, 0) AS DOUBLE)) AS gini,
       CAST(top_decile_cents AS DOUBLE)
       / CAST(NULLIF(total_cents, 0) AS DOUBLE) AS top_decile_share
FROM agg
"""


@query("prof_gini_concentration", oracle=_GINI_ORACLE, tier=2)
def prof_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration profile per market segment: the Gini
    coefficient of lifetime customer spend plus the top-decile share —
    the whale-dependence read (is 80% of a segment's revenue on 10 whale
    accounts?) finance puts next to the RFM grid, and the skew diagnosis
    a pipeline owner reads before hash-partitioning on the customer key
    (Gini near 1 on spend usually means the EVENT volume is skewed too —
    prof_skew_report finds the hot keys, this scores the inequality).

    Exactness: spend is floor-quantized integer cents summed per customer
    (zero-order customers enter as exact 0 via the left join — excluding
    them would overstate equality); the Gini numerator uses the rank
    identity G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over x sorted
    ascending, which is invariant to tie order among equal x (equal
    values at consecutive ranks contribute the same sum under any
    permutation), so the custkey tie-break only pins the top-decile
    MEMBERSHIP, where it genuinely decides. rn*x widens to
    DECIMAL(38,0)/HUGEINT BEFORE the multiply (the prof_corr_matrix
    overflow stance); the final Gini/share are shared-text IEEE
    divisions over integers < 2^53, with NULLIF guarding an all-zero
    segment.

    Shape: one map-side-combined custkey aggregate, a broadcast-sized
    customer frame, then both rank windows and the count ride ONE
    segment-keyed exchange (two sort orders, one shuffle) into a 5-row
    rollup. At 100 TB the per-segment rank window is the pressure point
    (5 partitions for the whole customer frame): the documented swap is
    the two-pass distributed rank — per-partition counts broadcast as
    prefix offsets, rank = local rank + offset (the ext_epoch_shuffle /
    ext_stratified_kfold mechanism) — or t-digest partials if an
    approximate decile suffices (the ext_outlier_clip stance)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    spend = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(quantize_long("o_totalprice", 2)).cast("long").alias("sp")
    )
    base = (
        c.select(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_custkey").alias("cust"),
        )
        .join(spend, F.col("cust") == F.col("ck"), "left")
        .select(
            "segment",
            "cust",
            F.coalesce("sp", F.lit(0).cast("long")).alias("x"),
        )
    )
    seg = W.partitionBy("segment")
    ranked = base.select(
        "segment",
        "x",
        F.row_number()
        .over(seg.orderBy(F.asc("x"), F.asc("cust")))
        .cast("long")
        .alias("rn"),
        F.row_number()
        .over(seg.orderBy(F.desc("x"), F.asc("cust")))
        .cast("long")
        .alias("rd"),
        F.count(F.lit(1)).over(seg).alias("n"),
    )
    agg = ranked.groupBy("segment").agg(
        F.max("n").alias("n_customers"),
        F.sum("x").alias("total_cents"),
        F.sum(F.col("rn").cast("decimal(38,0)") * F.col("x"))
        .cast("double")
        .alias("wsum_d"),
        F.max(F.expr("(n + 9) DIV 10")).alias("top_decile_n"),
        F.sum(
            F.expr("CASE WHEN rd <= (n + 9) DIV 10 THEN x ELSE 0 END")
        ).alias("top_decile_cents"),
    )
    return agg.select(
        "segment",
        "n_customers",
        "total_cents",
        "top_decile_n",
        "top_decile_cents",
        F.expr(
            "(2.0 * wsum_d"
            " - (CAST(n_customers AS DOUBLE) + 1.0)"
            " * CAST(total_cents AS DOUBLE))"
            " / (CAST(n_customers AS DOUBLE)"
            " * CAST(NULLIF(total_cents, 0) AS DOUBLE))"
        ).alias("gini"),
        F.expr(
            "CAST(top_decile_cents AS DOUBLE)"
            " / CAST(NULLIF(total_cents, 0) AS DOUBLE)"
        ).alias("top_decile_share"),
    )


# --- prof_mutual_info -----------------------------------------------------------

_MI_ORACLE = """
WITH cells AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_xy
  FROM documents GROUP BY lang, source
),
mx AS (SELECT lang, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY lang),
my AS (
  SELECT source, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY source
),
tot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n FROM cells),
terms AS (
  SELECT c.lang, c.source, c.n_xy, mx.n_x, my.n_y, tot.n,
         (CAST(c.n_xy AS DOUBLE) / CAST(tot.n AS DOUBLE))
           * ln((CAST(tot.n AS DOUBLE) * CAST(c.n_xy AS DOUBLE))
                / (CAST(mx.n_x AS DOUBLE) * CAST(my.n_y AS DOUBLE)))
           AS term
  FROM cells c
  JOIN mx USING (lang) JOIN my USING (source) CROSS JOIN tot
),
ents AS (
  SELECT
    -SUM(DISTINCT_TERM_X) AS h_x, -SUM(DISTINCT_TERM_Y) AS h_y
  FROM (
    SELECT DISTINCT lang, NULL AS source,
           (CAST(n_x AS DOUBLE) / CAST(n AS DOUBLE))
             * ln(CAST(n_x AS DOUBLE) / CAST(n AS DOUBLE))
             AS DISTINCT_TERM_X,
           0.0 AS DISTINCT_TERM_Y
    FROM terms
    UNION ALL
    SELECT DISTINCT NULL AS lang, source, 0.0,
           (CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE))
             * ln(CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE))
    FROM terms
  )
)
SELECT t.lang, t.source, t.n_xy,
       CAST(t.n_xy AS DOUBLE) / CAST(t.n AS DOUBLE) AS p_xy,
       round(t.term, 6) AS mi_term,
       round(s.mi, 6) AS mi,
       round(e.h_x, 6) AS h_lang,
       round(e.h_y, 6) AS h_source,
       round(s.mi / sqrt(e.h_x * e.h_y), 6) AS nmi
FROM terms t
CROSS JOIN (SELECT SUM(term) AS mi FROM terms) s
CROSS JOIN ents e
"""


@query("prof_mutual_info", oracle=_MI_ORACLE, tier=2)
def prof_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between two categorical columns (lang x
    source) plus both marginal entropies and the normalized MI — the
    dependence screen a profiler runs before assuming two dimensions
    are independent (near-zero NMI says source composition is the same
    in every language; high NMI says per-language source skew and any
    stratified sampler must key on BOTH). The skip-gram PMI key
    (ext_cooccurrence_pmi) scores token pairs; this scores METADATA
    columns, cell by cell, with the aggregate MI readable off any row.

    Exactness: all counts are exact integers; each cell's MI term is
    built from shared-text IEEE divisions and ONE ln over bit-identical
    operands, summed over the <= |langs|x|sources| model-sized frame and
    rounded to 6dp AFTER the sum (the prof_entropy_profile discipline:
    the cross-row double sum's ~1e-12 order noise sits far inside the
    1e-6 quantum). Observed cells only — absent cells contribute
    0*ln(0) = 0 by convention and never materialize.

    Shape: ONE (lang, source) counting aggregate is the only data-sized
    exchange; marginals, the MI fold and the entropy folds all run on
    the <= 100-row cell frame (EXPECTED_FLAGS 1-row folds)."""
    d = load(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_xy")
    )
    mx = cells.groupBy("lang").agg(F.sum("n_xy").alias("n_x"))
    my = cells.groupBy("source").agg(F.sum("n_xy").alias("n_y"))
    tot = cells.agg(F.sum("n_xy").alias("n"))
    terms = (
        cells.join(mx, "lang")
        .join(my, "source")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "term",
            F.expr(
                "(CAST(n_xy AS DOUBLE) / CAST(n AS DOUBLE))"
                " * ln((CAST(n AS DOUBLE) * CAST(n_xy AS DOUBLE))"
                " / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))"
            ),
        )
    )
    mi = terms.agg(F.sum("term").alias("mi"))
    h_x = (
        terms.select("lang", "n_x", "n").distinct().agg(
            F.expr(
                "-SUM((CAST(n_x AS DOUBLE) / CAST(n AS DOUBLE))"
                " * ln(CAST(n_x AS DOUBLE) / CAST(n AS DOUBLE)))"
            ).alias("h_x")
        )
    )
    h_y = (
        terms.select("source", "n_y", "n").distinct().agg(
            F.expr(
                "-SUM((CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE))"
                " * ln(CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE)))"
            ).alias("h_y")
        )
    )
    return (
        terms.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(h_x))
        .crossJoin(F.broadcast(h_y))
        .select(
            "lang",
            "source",
            "n_xy",
            F.expr("CAST(n_xy AS DOUBLE) / CAST(n AS DOUBLE)").alias(
                "p_xy"
            ),
            F.round("term", 6).alias("mi_term"),
            F.round("mi", 6).alias("mi"),
            F.round("h_x", 6).alias("h_lang"),
            F.round("h_y", 6).alias("h_source"),
            F.expr("round(mi / sqrt(h_x * h_y), 6)").alias("nmi"),
        )
    )


# --- prof_inclusion_dependency ----------------------------------------------

#: Candidate inclusion dependencies (lhs_table.lhs_col ⊆ rhs_table.rhs_col):
#: the fixture's real FK edges plus deliberate non-INDs (reversed edges and
#: a cross-domain decoy) so both verdicts are exercised.
_IND_CANDIDATES = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_custkey", "orders", "o_custkey"),
    ("nation", "n_nationkey", "customer", "c_nationkey"),
    ("region", "r_regionkey", "part", "p_size"),
]

_IND_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT '{lt}.{lc}' AS lhs, '{rt}.{rc}' AS rhs,
       (SELECT CAST(COUNT(DISTINCT {lc}) AS BIGINT) FROM {lt}
        WHERE {lc} IS NOT NULL) AS n_lhs_distinct,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM
          (SELECT DISTINCT {lc} AS v FROM {lt} WHERE {lc} IS NOT NULL) l
        WHERE NOT EXISTS
          (SELECT 1 FROM {rt} r WHERE r.{rc} = l.v)) AS n_violations,
       ((SELECT CAST(COUNT(*) AS BIGINT) FROM
          (SELECT DISTINCT {lc} AS v FROM {lt} WHERE {lc} IS NOT NULL) l
        WHERE NOT EXISTS
          (SELECT 1 FROM {rt} r WHERE r.{rc} = l.v)) = 0) AS holds
"""
    for lt, lc, rt, rc in _IND_CANDIDATES
)


@query("prof_inclusion_dependency", oracle=_IND_ORACLE, tier=2)
def prof_inclusion_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency discovery (the Binder/profiling-suite IND
    check): for each candidate column pair, does every distinct non-null
    lhs value appear in the rhs column? Reports distinct count, violation
    count, and the verdict — the foreign-key-candidate / referential-
    integrity profile a warehouse runs before declaring join paths. The
    candidate set carries the fixture's real FK edges AND reversed/decoy
    pairs so a broken checker cannot pass by answering 'true' uniformly.

    Exactness: pure distinct/count integer arithmetic; no floats at all.

    Shape: per candidate, ONE distinct on the lhs column (map-side
    combined — the only data-sized exchange, carrying distinct values,
    not rows) and a LEFT ANTI join against the rhs distinct set; dim-
    sized rhs sides broadcast. The 8 candidate mini-plans union into an
    8-row result. At 100 TB each candidate is a column-pruned scan pair —
    the parquet reader never materializes the wide rows — and candidates
    evaluate independently (embarrassingly parallel across a fleet)."""
    out = None
    for lt, lc, rt, rc in _IND_CANDIDATES:
        lhs = (
            load(spark, sf_dir, lt)
            .select(F.col(lc).alias("v"))
            .filter(F.col("v").isNotNull())
            .distinct()
        )
        rhs = (
            load(spark, sf_dir, rt)
            .select(F.col(rc).alias("v"))
            .distinct()
        )
        viol = lhs.join(rhs, "v", "left_anti")
        row = lhs.agg(
            F.count(F.lit(1)).alias("n_lhs_distinct")
        ).crossJoin(
            viol.agg(F.count(F.lit(1)).alias("n_violations"))
        ).select(
            F.lit(f"{lt}.{lc}").alias("lhs"),
            F.lit(f"{rt}.{rc}").alias("rhs"),
            "n_lhs_distinct",
            "n_violations",
            (F.col("n_violations") == 0).alias("holds"),
        )
        out = row if out is None else out.unionAll(row)
    return out


# --- prof_eta_squared -----------------------------------------------------------

#: Per-group mean-square terms quantize at 1e6 before the cross-group
#: sum (each S_g^2/n_g is one exact-integer division; the eta-squared
#: ratio then divides shared-text doubles). S^2 as a double product is
#: exact while S < 2^26.5 — far past the fixture; DECIMAL widening
#: documented for larger corpora.
_ETA_FACTORS = ["lang", "source"]

_ETA_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT '{fac}' AS factor,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       (CAST(SUM(CAST(floor(CAST(s AS DOUBLE) * s / n * 1e6
                            + CAST(0.5 AS DOUBLE)) AS BIGINT))
             AS DOUBLE) / 1e6
        - CAST(SUM(s) AS DOUBLE) * SUM(s) / SUM(n))
       / (CAST(SUM(q) AS DOUBLE)
          - CAST(SUM(s) AS DOUBLE) * SUM(s) / SUM(n)) AS eta_squared
FROM (
  SELECT {fac}, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS s,
         CAST(SUM(len(string_split(text, ' '))
                  * len(string_split(text, ' '))) AS BIGINT) AS q
  FROM documents GROUP BY {fac}
)
"""
    for fac in _ETA_FACTORS
)


@query("prof_eta_squared", oracle=_ETA_ORACLE, tier=3)
def prof_eta_squared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation ratio (eta-squared) of document length against each
    categorical factor (language, source): the share of token-count
    variance EXPLAINED by the factor — the effect-size read that
    completes prof_mutual_info (MI covers categorical-categorical
    dependence; eta-squared covers categorical-numeric, the "do sources
    differ in length enough to stratify on?" question a sampler owner
    asks before keying strata).

    Exactness: all group moments (n, sum, sum-of-squares) are exact
    BIGINT; each group's S_g^2/n_g is ONE exact-integer division
    floor-quantized at 1e6 before the cross-group sum; the final ratio
    is shared-text IEEE over those exact inputs.

    Shape: per factor ONE keyed counting/moment aggregate (full
    map-side combine — the exchange carries three longs per group), and
    the eta fold runs on the O(groups) frame; the two factor mini-plans
    union to 2 rows (EXPECTED_FLAGS: 1-row folds)."""
    d = load(spark, sf_dir, "documents").select(
        "lang", "source", F.size(F.split("text", " ")).alias("nt")
    )
    out = None
    for fac in _ETA_FACTORS:
        g = d.groupBy(fac).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("nt").alias("s"),
            F.sum(F.col("nt") * F.col("nt")).alias("q"),
        )
        row = g.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.expr(
                "(CAST(SUM(CAST(floor(CAST(s AS DOUBLE) * s / n * 1e6"
                " + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS DOUBLE) / 1e6"
                " - CAST(SUM(s) AS DOUBLE) * SUM(s) / SUM(n))"
                " / (CAST(SUM(q) AS DOUBLE)"
                " - CAST(SUM(s) AS DOUBLE) * SUM(s) / SUM(n))"
            ).alias("eta_squared"),
        ).select(
            F.lit(fac).alias("factor"), "n_groups", "eta_squared"
        )
        out = row if out is None else out.unionAll(row)
    return out


# --- prof_length_deciles --------------------------------------------------------

_LDEC_ORACLE = """
WITH lens AS (
  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
  FROM documents
),
g AS (
  SELECT lang, nt, CAST(COUNT(*) AS BIGINT) AS c FROM lens
  GROUP BY lang, nt
),
cu AS (
  SELECT lang, nt, c,
         CAST(SUM(c) OVER (PARTITION BY lang ORDER BY nt
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS n
  FROM g
)
SELECT lang, MAX(n) AS n_docs,
       MIN(CASE WHEN 10 * cum >= n THEN nt END) AS p10_tokens,
       MIN(CASE WHEN 4 * cum >= n THEN nt END) AS p25_tokens,
       MIN(CASE WHEN 2 * cum >= n THEN nt END) AS p50_tokens,
       MIN(CASE WHEN 4 * cum >= 3 * n THEN nt END) AS p75_tokens,
       MIN(CASE WHEN 10 * cum >= 9 * n THEN nt END) AS p90_tokens
FROM cu GROUP BY lang
"""


@query("prof_length_deciles", oracle=_LDEC_ORACLE, tier=2)
def prof_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length percentile profile per language (p10/p25/p50/
    p75/p90 of token counts) — the truncation-budget read a pipeline
    owner consults before fixing a context length or a min-length
    filter (ext_pack_efficiency_sweep answers the packing side; this
    answers what gets CUT at each candidate). Exact order statistics,
    not approx_percentile, so the numbers are reproducible across
    engines and partitionings.

    Exactness: percentile picks are integer cross-multiplications over
    the per-(lang, length) cumulative counts (the agg_weighted_median
    discipline — no interpolation, no float anywhere).

    Shape: ONE (lang, length) counting aggregate collapses the corpus
    to distinct length values per language (full map-side combine);
    the cumulative window rides a lang-keyed exchange over that
    bounded-support frame; output is O(langs) rows."""
    d = load(spark, sf_dir, "documents").select(
        "lang", F.size(F.split("text", " ")).cast("long").alias("nt")
    )
    g = d.groupBy("lang", "nt").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        W.partitionBy("lang")
        .orderBy("nt")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cu = g.select(
        "lang",
        "nt",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(W.partitionBy("lang")).alias("n"),
    )
    return cu.groupBy("lang").agg(
        F.max("n").alias("n_docs"),
        F.min(F.when(10 * F.col("cum") >= F.col("n"), F.col("nt"))).alias(
            "p10_tokens"
        ),
        F.min(F.when(4 * F.col("cum") >= F.col("n"), F.col("nt"))).alias(
            "p25_tokens"
        ),
        F.min(F.when(2 * F.col("cum") >= F.col("n"), F.col("nt"))).alias(
            "p50_tokens"
        ),
        F.min(
            F.when(4 * F.col("cum") >= 3 * F.col("n"), F.col("nt"))
        ).alias("p75_tokens"),
        F.min(
            F.when(10 * F.col("cum") >= 9 * F.col("n"), F.col("nt"))
        ).alias("p90_tokens"),
    )


# --- prof_ks_test -------------------------------------------------------------

#: The two order-priority samples compared: finance asks whether URGENT
#: orders price like LOW ones (a routing/pricing audit). Integer cents
#: keep the pooled value grid exact.
_KS_A = "1-URGENT"
_KS_B = "5-LOW"

_KS_ORACLE = f"""
WITH s AS (
  SELECT CAST(floor(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5)
              AS BIGINT) AS cents,
         CASE WHEN o_orderpriority = '{_KS_A}' THEN 1 ELSE 0 END AS in_a
  FROM orders
  WHERE o_orderpriority IN ('{_KS_A}', '{_KS_B}')
),
tot AS (
  SELECT CAST(SUM(in_a) AS BIGINT) AS n1,
         CAST(SUM(1 - in_a) AS BIGINT) AS n2
  FROM s
),
g AS (
  SELECT cents, CAST(SUM(in_a) AS BIGINT) AS a,
         CAST(SUM(1 - in_a) AS BIGINT) AS b
  FROM s GROUP BY cents
),
c AS (
  SELECT cents,
         CAST(SUM(a) OVER (ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS ca,
         CAST(SUM(b) OVER (ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cb
  FROM g
),
d AS (
  SELECT cents, abs(ca * n2 - cb * n1) AS gap_num
  FROM c CROSS JOIN tot
),
mx AS (SELECT MAX(gap_num) AS d_num FROM d)
SELECT n1, n2,
       CAST(d_num AS BIGINT) AS d_num,
       CAST(d_num AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) AS d_stat,
       CAST((SELECT MIN(cents) FROM d WHERE gap_num = mx.d_num)
            AS BIGINT) AS at_cents
FROM mx CROSS JOIN tot
"""


@query("prof_ks_test", oracle=_KS_ORACLE, tier=2)
def prof_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the URGENT and
    LOW order-priority total-price distributions — the nonparametric
    "are these two segments drawn from the same distribution?" profile
    a warehouse runs before trusting a segment split (complementing
    prof_psi_drift's binned divergence with the exact sup-norm ECDF
    gap, which needs no bin choice). Emits D, its exact integer
    numerator, and the price where the maximum gap occurs (lowest such
    value on ties).

    Exactness: prices floor-quantize to integer cents; the ECDF gap at
    value v is |ca*n2 - cb*n1| / (n1*n2) with an EXACT BIGINT numerator
    (cum counts x sample sizes stay far inside int64), so the argmax
    and the tie-break are integer decisions; D is one IEEE division.

    Shape: one scan -> filter -> (cents)-keyed counting aggregate with
    full map-side combine (the exchange carries distinct price points,
    not orders), a prefix-sum window over the distinct-value frame, and
    1-row folds. The window is global over the value support — bounded
    by distinct prices, not rows; at true 100 TB the swap is the
    ext_auc_rank two-pass form (range-bucketed partial prefix sums +
    broadcast bucket offsets), documented not needed at fixture scale
    (EXPECTED_FLAGS)."""
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(_KS_A, _KS_B)
    )
    s = o.select(
        quantize_long("o_totalprice", 2).alias("cents"),
        (F.col("o_orderpriority") == _KS_A).cast("int").alias("in_a"),
    )
    tot = s.agg(
        F.sum("in_a").alias("n1"),
        F.sum(F.lit(1) - F.col("in_a")).alias("n2"),
    )
    g = s.groupBy("cents").agg(
        F.sum("in_a").alias("a"),
        F.sum(F.lit(1) - F.col("in_a")).alias("b"),
    )
    w = W.orderBy("cents").rowsBetween(W.unboundedPreceding, W.currentRow)
    c = g.select(
        "cents",
        F.sum("a").over(w).alias("ca"),
        F.sum("b").over(w).alias("cb"),
    )
    d = c.crossJoin(F.broadcast(tot)).select(
        "cents",
        "n1",
        "n2",
        F.abs(F.col("ca") * F.col("n2") - F.col("cb") * F.col("n1")).alias(
            "gap_num"
        ),
    )
    mx = d.agg(F.max("gap_num").alias("d_num"))
    return (
        d.join(F.broadcast(mx), F.col("gap_num") == F.col("d_num"))
        .groupBy("n1", "n2", "d_num")
        .agg(F.min("cents").alias("at_cents"))
        .select(
            "n1",
            "n2",
            "d_num",
            (
                F.col("d_num").cast("double")
                / (F.col("n1") * F.col("n2")).cast("double")
            ).alias("d_stat"),
            "at_cents",
        )
    )


# --- prof_cramers_v -----------------------------------------------------------

#: Per-cell chi-square terms quantize to a 1e-9 grid before the exact
#: integer sum (the ext_calibration_ece cross-row stance).
_CV_Q = "1e9"

_CRAMERS_ORACLE = f"""
WITH o AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM documents GROUP BY lang, source
),
r AS (SELECT lang, CAST(SUM(n_obs) AS BIGINT) AS n_row FROM o GROUP BY lang),
c AS (
  SELECT source, CAST(SUM(n_obs) AS BIGINT) AS n_col FROM o GROUP BY source
),
t AS (
  SELECT CAST(SUM(n_obs) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
  FROM o
),
cells AS (
  SELECT r.lang, c.source, r.n_row, c.n_col,
         COALESCE(o.n_obs, 0) AS n_obs
  FROM r CROSS JOIN c
  LEFT JOIN o ON o.lang = r.lang AND o.source = c.source
),
q AS (
  SELECT CAST(SUM(CAST(floor(
           CAST((n_obs * n - n_row * n_col) AS DOUBLE)
           * CAST((n_obs * n - n_row * n_col) AS DOUBLE)
           / CAST(n_row * n_col * n AS DOUBLE)
           * {_CV_Q} + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT)
           AS chi2_q
  FROM cells CROSS JOIN t
)
SELECT n, n_langs, n_sources,
       CAST(chi2_q AS DOUBLE) / {_CV_Q} AS chi2,
       (n_langs - 1) * (n_sources - 1) AS dof,
       sqrt(CAST(chi2_q AS DOUBLE) / {_CV_Q}
            / (CAST(n AS DOUBLE)
               * CAST(least(n_langs - 1, n_sources - 1) AS DOUBLE)))
         AS cramers_v
FROM q CROSS JOIN t
"""


@query("prof_cramers_v", oracle=_CRAMERS_ORACLE, tier=2)
def prof_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V association between the documents corpus's two
    categorical axes (lang x source) — the normalized chi-square
    independence profile ([0, 1]: 0 = provenance and language are
    independent, 1 = one determines the other) that a curation owner
    reads before stratifying a domain mix on either axis (if V is
    high, stratifying on one axis silently stratifies the other;
    ext_split_balance_chi2 reads the same machinery against SPLITS).
    Zero-count grid cells enter the expected-count sum as real cells
    (the full r x c outer grid, not just observed pairs).

    Exactness: cell counts and marginals are exact integers; each
    cell's term ((o*n - row*col)^2 / (row*col*n)) is evaluated as IEEE
    arithmetic on exactly-representable integers, floor-quantized to
    the 1e-9 grid per cell BEFORE the exact integer sum (the
    calibration-ece cross-row stance); V's sqrt is a single correctly-
    rounded IEEE operation on the quantized chi2.

    Shape: ONE (lang, source)-keyed counting aggregate over the scan
    (map-side combine; the exchange carries the contingency grid, not
    documents), marginals derive from that O(langs x sources) frame,
    the outer grid is a broadcast cross of two model-sized marginal
    frames, and the fold is 1-row (EXPECTED_FLAGS)."""
    o = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    from ..session import scoped_persist

    o = scoped_persist(o)
    r = o.groupBy("lang").agg(F.sum("n_obs").alias("n_row"))
    c = o.groupBy("source").agg(F.sum("n_obs").alias("n_col"))
    t = o.agg(
        F.sum("n_obs").alias("n"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
    )
    cells = (
        r.crossJoin(F.broadcast(c))
        .join(o, ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            "n_row",
            "n_col",
            F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
        )
    )
    q = (
        cells.crossJoin(F.broadcast(t))
        .select(
            F.expr(
                f"CAST(floor("
                f"CAST((n_obs * n - n_row * n_col) AS DOUBLE)"
                f" * CAST((n_obs * n - n_row * n_col) AS DOUBLE)"
                f" / CAST(n_row * n_col * n AS DOUBLE)"
                f" * {_CV_Q} + CAST(0.5 AS DOUBLE)) AS BIGINT)"
            ).alias("term_q")
        )
        .agg(F.sum("term_q").alias("chi2_q"))
    )
    return q.crossJoin(F.broadcast(t)).select(
        "n",
        "n_langs",
        "n_sources",
        (F.col("chi2_q").cast("double") / F.lit(1e9)).alias("chi2"),
        ((F.col("n_langs") - 1) * (F.col("n_sources") - 1)).alias("dof"),
        F.sqrt(
            F.col("chi2_q").cast("double")
            / F.lit(1e9)
            / (
                F.col("n").cast("double")
                * F.least(
                    F.col("n_langs") - 1, F.col("n_sources") - 1
                ).cast("double")
            )
        ).alias("cramers_v"),
    )


# --- prof_outlier_iqr ---------------------------------------------------------

_IQR_ORACLE = """
WITH s AS (
  SELECT c_mktsegment AS segment,
         CAST(floor(CAST(c_acctbal AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
           AS cents
  FROM customer
),
rk AS (
  SELECT segment, cents,
         ROW_NUMBER() OVER (PARTITION BY segment
                            ORDER BY cents ASC) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS n
  FROM s
),
qs AS (
  SELECT segment, n,
         CAST(MAX(CASE WHEN rn = (n + 3) // 4 THEN cents END)
              AS BIGINT) AS q1_cents,
         CAST(MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END)
              AS BIGINT) AS q3_cents
  FROM rk GROUP BY segment, n
)
SELECT q.segment, q.n, q.q1_cents, q.q3_cents,
       q.q3_cents - q.q1_cents AS iqr_cents,
       CAST(SUM(CASE WHEN 2 * s.cents < 5 * q.q1_cents - 3 * q.q3_cents
                THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(SUM(CASE WHEN 2 * s.cents > 5 * q.q3_cents - 3 * q.q1_cents
                THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       CAST(SUM(CASE WHEN 2 * s.cents < 5 * q.q1_cents - 3 * q.q3_cents
                  OR 2 * s.cents > 5 * q.q3_cents - 3 * q.q1_cents
                THEN 1 ELSE 0 END) AS DOUBLE) / CAST(q.n AS DOUBLE)
         AS outlier_frac
FROM qs q JOIN s ON s.segment = q.segment
GROUP BY q.segment, q.n, q.q1_cents, q.q3_cents
"""


@query("prof_outlier_iqr", oracle=_IQR_ORACLE, tier=2)
def prof_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR-fence outlier profile of customer account balances per
    market segment — the box-plot screen (values beyond Q1/Q3 by 1.5x
    the interquartile range) every data-quality pass runs next to the
    z-score/MAD detectors (ts_anomaly_mad reads time series; this reads
    cross-sectional segments). Emits the exact discrete quartiles, the
    fence-violation counts on each side, and the outlier fraction.

    Exactness: balances floor-quantize to integer cents; quartiles are
    DISCRETE order statistics picked at ceil(n/4) / ceil(3n/4) by
    integer row position (no interpolation, no float percentile
    surface); the 1.5x-IQR fences clear denominators — cents < q1 -
    1.5*iqr iff 2*cents < 5*q1 - 3*q3 — so every fence test is exact
    BIGINT arithmetic; the fraction is one IEEE division.

    Shape: one scan -> per-segment rank window (the window input is
    the segment's rows — at 100 TB the swap is percentile_approx or
    the two-pass bucketed rank, documented), a per-segment quartile
    pick, then one broadcast join of the O(segments) quartile frame
    back onto the sample for the counting aggregate — the exchange
    carries segment keys, full map-side combine."""
    s = load(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        quantize_long("c_acctbal", 2).alias("cents"),
    )
    from ..session import scoped_persist

    s = scoped_persist(s)
    wseg = W.partitionBy("segment")
    rk = s.select(
        "segment",
        "cents",
        F.row_number().over(wseg.orderBy(F.asc("cents"))).alias("rn"),
        F.count(F.lit(1)).over(wseg).alias("n"),
    )
    qs = rk.groupBy("segment", "n").agg(
        F.max(
            F.when(
                F.col("rn") == F.expr("(n + 3) DIV 4"), F.col("cents")
            )
        ).alias("q1_cents"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(3 * n + 3) DIV 4"), F.col("cents")
            )
        ).alias("q3_cents"),
    )
    lo = 5 * F.col("q1_cents") - 3 * F.col("q3_cents")
    hi = 5 * F.col("q3_cents") - 3 * F.col("q1_cents")
    return (
        s.join(F.broadcast(qs), "segment")
        .groupBy("segment", "n", "q1_cents", "q3_cents")
        .agg(
            F.sum((2 * F.col("cents") < lo).cast("int")).alias("n_low"),
            F.sum((2 * F.col("cents") > hi).cast("int")).alias("n_high"),
            (
                F.sum(
                    (
                        (2 * F.col("cents") < lo)
                        | (2 * F.col("cents") > hi)
                    ).cast("int")
                ).cast("double")
                / F.first("n").cast("double")
            ).alias("outlier_frac"),
        )
        .select(
            "segment",
            "n",
            "q1_cents",
            "q3_cents",
            (F.col("q3_cents") - F.col("q1_cents")).alias("iqr_cents"),
            "n_low",
            "n_high",
            "outlier_frac",
        )
    )


# --- ext_bootstrap_ci_mean ------------------------------------------------------

#: Poisson(1) CDF thresholds x 1e6, baked from one Python computation
#: into BOTH engine texts (round(CDF(k) * 1e6) for k = 0..6; draws past
#: the last threshold cap at k = 7). The Poisson bootstrap replaces
#: multinomial resampling with independent per-row Poisson(1) counts —
#: the estimator large-scale systems use because it needs NO global
#: coordination: each row decides its own replicate multiplicities from
#: a hash, map-side.
_BOOT_T = (367879, 735759, 919699, 981012, 996340, 999406, 999917)
_BOOT_B = 64
_BOOT_SALT = ":bdl-boot-13"

#: Shared CASE text mapping a uniform draw u in [0, 1e6) to the
#: Poisson(1) count (identical token stream in Spark SQL and DuckDB).
_BOOT_K_CASE = "CASE " + " ".join(
    f"WHEN u < {t} THEN {k}" for k, t in enumerate(_BOOT_T)
) + " ELSE 7 END"

_BOOT_ORACLE = f"""
WITH spend AS (
  SELECT o_custkey AS cust,
         CAST(SUM(CAST(floor(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
cust AS (
  SELECT c.c_custkey AS cust, COALESCE(s.cents, 0) AS cents
  FROM customer c LEFT JOIN spend s ON c.c_custkey = s.cust
),
draws AS (
  SELECT cust, cents, rb.b,
         ('0x' || substr(md5(CAST(cust AS VARCHAR) || '{_BOOT_SALT}'
                             || CAST(rb.b AS VARCHAR)), 1, 12))::BIGINT
           % 1000000 AS u
  FROM cust, unnest(range(0, {_BOOT_B})) AS rb(b)
),
rep AS (
  SELECT b,
         CAST(SUM({_BOOT_K_CASE}) AS BIGINT) AS sum_k,
         CAST(SUM(({_BOOT_K_CASE}) * cents) AS BIGINT) AS sum_kc
  FROM draws GROUP BY b
),
rk AS (
  SELECT b, sum_k, sum_kc,
         (sum_kc * 1000000) // sum_k AS mq,
         ROW_NUMBER() OVER (ORDER BY (sum_kc * 1000000) // sum_k ASC,
                            b ASC) AS rn
  FROM rep WHERE sum_k > 0
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS gs
  FROM cust
)
SELECT g.n, CAST({_BOOT_B} AS BIGINT) AS n_replicates,
       CAST(g.gs AS DOUBLE) / CAST(g.n AS DOUBLE) AS point_mean_cents,
       CAST(MAX(CASE WHEN rn = 2 THEN sum_kc END) AS DOUBLE)
         / CAST(MAX(CASE WHEN rn = 2 THEN sum_k END) AS DOUBLE)
         AS ci_lo_cents,
       CAST(MAX(CASE WHEN rn = {_BOOT_B} - 1 THEN sum_kc END) AS DOUBLE)
         / CAST(MAX(CASE WHEN rn = {_BOOT_B} - 1 THEN sum_k END)
                AS DOUBLE) AS ci_hi_cents
FROM rk CROSS JOIN g
GROUP BY g.n, g.gs
"""


@query("ext_bootstrap_ci_mean", oracle=_BOOT_ORACLE, tier=3)
def ext_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% confidence interval for mean customer
    lifetime spend — the resampling scheme built for data too large to
    multinomial-sample: each row contributes an INDEPENDENT Poisson(1)
    multiplicity to each of 64 replicates, drawn deterministically from
    md5(cust || salt || replicate), so the whole bootstrap is one
    map-side expansion + one 64-group aggregate with zero coordination
    (no global n needed per draw — the property that makes this the
    standard streaming/massive-data bootstrap). CI = the 2nd and 63rd
    order statistics of the 64 replicate means (~2.5%/97.5%).

    Exactness: the uniform draw is an exact md5-derived integer mod
    1e6; the Poisson inverse-CDF is a BAKED integer threshold CASE
    (one Python computation f-stringed into both engine texts);
    replicate sums are exact BIGINTs; replicate ranking orders by the
    exact integer (sum_kc*1e6) DIV sum_k with a replicate-id tie-break;
    each emitted mean is one IEEE division of exact integers.
    Zero-count replicates (impossible in practice, P ~ e^-n) are
    excluded from ranking, documented.

    Shape: the custkey spend aggregate (map-side combine), a broadcast
    64-row replicate grid exploding map-side (x64 rows BEFORE the
    combine — partial aggregation collapses per (replicate) inside the
    scan task, so the exchange carries 64 rows), a 64-row rank window,
    and 1-row folds (EXPECTED_FLAGS). At 100 TB this is exactly the
    production Poisson-bootstrap plan: no shuffle grows with data."""
    from ..functions.determinism import quantize_long
    from ..session import scoped_persist

    spend = (
        load(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("cust"),
            quantize_long("o_totalprice", 2).alias("cents"),
        )
        .groupBy("cust")
        .agg(F.sum("cents").alias("cents"))
    )
    cust = scoped_persist(
        load(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("ck"))
        .join(spend, F.col("ck") == F.col("cust"), "left")
        .select(
            F.col("ck").alias("cust"),
            F.coalesce(F.col("cents"), F.lit(0)).alias("cents"),
        )
    )
    reps = spark.createDataFrame([(b,) for b in range(_BOOT_B)], "b int")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("cust").cast("string"),
                        F.lit(_BOOT_SALT),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000000
    )
    draws = cust.crossJoin(F.broadcast(reps)).select(
        "cents", "b", u.alias("u")
    )
    k = F.expr(_BOOT_K_CASE)
    rep = draws.groupBy("b").agg(
        F.sum(k).alias("sum_k"),
        F.sum(k * F.col("cents")).alias("sum_kc"),
    )
    rk = (
        rep.filter(F.col("sum_k") > 0)
        .select(
            "b",
            "sum_k",
            "sum_kc",
            F.row_number()
            .over(
                W.orderBy(
                    F.expr("(sum_kc * 1000000) DIV sum_k").asc(),
                    F.col("b").asc(),
                )
            )
            .alias("rn"),
        )
    )
    g = cust.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("gs")
    )
    pick = rk.groupBy().agg(
        F.max(F.when(F.col("rn") == 2, F.col("sum_kc"))).alias("lo_kc"),
        F.max(F.when(F.col("rn") == 2, F.col("sum_k"))).alias("lo_k"),
        F.max(
            F.when(F.col("rn") == _BOOT_B - 1, F.col("sum_kc"))
        ).alias("hi_kc"),
        F.max(
            F.when(F.col("rn") == _BOOT_B - 1, F.col("sum_k"))
        ).alias("hi_k"),
    )
    return g.crossJoin(F.broadcast(pick)).select(
        "n",
        F.lit(_BOOT_B).cast("long").alias("n_replicates"),
        (F.col("gs").cast("double") / F.col("n").cast("double")).alias(
            "point_mean_cents"
        ),
        (F.col("lo_kc").cast("double") / F.col("lo_k").cast("double"))
        .alias("ci_lo_cents"),
        (F.col("hi_kc").cast("double") / F.col("hi_k").cast("double"))
        .alias("ci_hi_cents"),
    )


# --- prof_spearman_corr ---------------------------------------------------------

#: The two audited metric pairs. In the synthetic fixture both read
#: near zero (columns are independent draws — the "healthy drop"
#: baseline the replay test pins); on a real billing feed (quantity,
#: extendedprice) rank-correlates strongly, and a pair moving off its
#: baseline in either direction is the drift the profiler flags.
_SPEAR_PAIRS = (
    ("qty_vs_price", "q_qty", "q_prc"),
    ("disc_vs_tax", "q_dsc", "q_tax"),
)

_SPEAR_ORACLE = """
WITH base AS MATERIALIZED (
  SELECT l_returnflag AS grp,
         CAST(floor(l_quantity * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS q_qty,
         CAST(floor(l_extendedprice * 1e2 + CAST(0.5 AS DOUBLE))
           AS BIGINT) AS q_prc,
         CAST(floor(l_discount * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS q_dsc,
         CAST(floor(l_tax * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT)
           AS q_tax
  FROM lineitem
),
ranked AS MATERIALIZED (
  SELECT grp,
         CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS n,
         CAST(2 * RANK() OVER (PARTITION BY grp ORDER BY q_qty ASC)
              + COUNT(*) OVER (PARTITION BY grp, q_qty) - 1 AS BIGINT)
           AS r_qty,
         CAST(2 * RANK() OVER (PARTITION BY grp ORDER BY q_prc ASC)
              + COUNT(*) OVER (PARTITION BY grp, q_prc) - 1 AS BIGINT)
           AS r_prc,
         CAST(2 * RANK() OVER (PARTITION BY grp ORDER BY q_dsc ASC)
              + COUNT(*) OVER (PARTITION BY grp, q_dsc) - 1 AS BIGINT)
           AS r_dsc,
         CAST(2 * RANK() OVER (PARTITION BY grp ORDER BY q_tax ASC)
              + COUNT(*) OVER (PARTITION BY grp, q_tax) - 1 AS BIGINT)
           AS r_tax
  FROM base
),
pairs AS (
  SELECT grp, 'qty_vs_price' AS pair, n,
         r_qty - (n + 1) AS dx, r_prc - (n + 1) AS dy
  FROM ranked
  UNION ALL
  SELECT grp, 'disc_vs_tax' AS pair, n,
         r_dsc - (n + 1) AS dx, r_tax - (n + 1) AS dy
  FROM ranked
),
m AS (
  SELECT grp, pair,
         CAST(ANY_VALUE(n) AS BIGINT) AS n,
         CAST(SUM(dx * dy) AS BIGINT) AS sxy,
         CAST(SUM(dx * dx) AS BIGINT) AS sxx,
         CAST(SUM(dy * dy) AS BIGINT) AS syy
  FROM pairs GROUP BY grp, pair
)
SELECT grp AS l_returnflag, pair, n, sxy, sxx, syy,
       CASE WHEN sxx = 0 OR syy = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(sxy AS DOUBLE)
                 / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE))
       END AS spearman_rho
FROM m
"""


@query("prof_spearman_corr", oracle=_SPEAR_ORACLE, tier=3)
def prof_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation per return-flag segment for two metric
    pairs — the monotone-association profile that catches what
    prof_corr_matrix's Pearson misses (nonlinear-but-monotone links,
    outlier-dominated covariances). Each pair carries a baseline (near
    zero on the fixture's independent draws; strongly positive for
    quantity-price on a real billing feed), and a pair moving off its
    baseline is the data-quality signal on a new drop.

    Exactness: values floor-quantize to cents first; tie handling is
    the exact midrank DOUBLED so half-integers stay integral
    (2*avg_rank = 2*RANK() + tie_count - 1, the ext_auc_rank midrank
    identity), centered by the integer n+1; all moment sums are exact
    BIGINT (documented widening to DECIMAL(38,0) past ~10^6 rows per
    group); rho is one shared-text chain CAST -> multiply -> sqrt ->
    divide, each step correctly-rounded IEEE so both engines emit the
    identical double.

    Shape: one scan -> rank windows all partitioned by the SAME group
    key (one exchange, per-key sorts) -> the pair stack explodes
    MAP-SIDE via one generator (no UNION re-read of the windowed frame
    — the r11 twice-referenced-frame lesson; the oracle keeps the
    UNION form as the independent mirror) -> one (group, pair)
    aggregate with map-side combine. At 100 TB ranks swap to the
    two-pass bucketed form (range-partition by value, per-partition
    ranks + broadcast offsets — the ext_auc_rank stance)."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        quantize_long("l_quantity", 2).alias("q_qty"),
        quantize_long("l_extendedprice", 2).alias("q_prc"),
        quantize_long("l_discount", 2).alias("q_dsc"),
        quantize_long("l_tax", 2).alias("q_tax"),
    )
    n = F.count(F.lit(1)).over(W.partitionBy("grp")).cast("long")

    def _drank(col: str):
        # doubled midrank 2*RANK() + ties - 1 rewritten as 2*cum - ties + 1
        # (RANK = cum - ties + 1 with RANGE-frame counts): both counts run
        # in the ONE window spec partitioned by grp and ordered by col, so
        # the former COUNT(*) OVER (PARTITION BY grp, col) — which forced a
        # fresh hash exchange of the full table per metric column, 4 extra
        # exchanges total — disappears (guide §2.4; r13). Integer algebra
        # over exact counts: identical output.
        wspec = W.partitionBy("grp").orderBy(F.asc(col))
        cum = F.count(F.lit(1)).over(
            wspec.rangeBetween(W.unboundedPreceding, W.currentRow)
        )
        ties = F.count(F.lit(1)).over(
            wspec.rangeBetween(W.currentRow, W.currentRow)
        )
        return (2 * cum - ties + 1).cast("long")

    ranked = li.select(
        "grp",
        n.alias("n"),
        _drank("q_qty").alias("r_qty"),
        _drank("q_prc").alias("r_prc"),
        _drank("q_dsc").alias("r_dsc"),
        _drank("q_tax").alias("r_tax"),
    )
    pair_structs = [
        F.struct(
            F.lit(name).alias("pair"),
            (F.col(cx) - (F.col("n") + 1)).alias("dx"),
            (F.col(cy) - (F.col("n") + 1)).alias("dy"),
        )
        for name, cx, cy in (
            ("qty_vs_price", "r_qty", "r_prc"),
            ("disc_vs_tax", "r_dsc", "r_tax"),
        )
    ]
    pairs = ranked.select(
        "grp", "n", F.explode(F.array(*pair_structs)).alias("e")
    ).select("grp", F.col("e.pair").alias("pair"), "n", "e.dx", "e.dy")
    m = pairs.groupBy("grp", "pair").agg(
        F.any_value(F.col("n")).alias("n"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    rho = F.when(
        (F.col("sxx") == 0) | (F.col("syy") == 0), F.lit(0.0)
    ).otherwise(
        F.col("sxy").cast("double")
        / F.sqrt(F.col("sxx").cast("double") * F.col("syy").cast("double"))
    )
    return m.select(
        F.col("grp").alias("l_returnflag"),
        "pair",
        "n",
        "sxy",
        "sxx",
        "syy",
        rho.alias("spearman_rho"),
    )


# --- ext_hll_error_sweep --------------------------------------------------------

#: Register-count sweep: p bits of the 60-bit md5 hash index m = 2^p
#: registers; the remaining W = 60 - p bits feed the leading-zero rank.
_HLL_PS = (4, 6, 8)

#: Standard HyperLogLog bias constants alpha_m (Flajolet et al. 2007).
_HLL_ALPHA = {16: 0.673, 64: 0.709, 256: 0.7213 / (1 + 1.079 / 256)}


def _hll_term_case(p: int, tail: str) -> str:
    """Shared-text CASE mapping the W-bit tail directly to the SCALED
    register term 2^(K - rho) (K = W + 1): rho = leading-zero count + 1,
    and because a larger rho means a smaller term, MIN(term) over a
    register is exactly 2^(K - MAX(rho)) — one chain, no second
    power-of-two decode, all exact integers."""
    w = 60 - p
    branches = " ".join(
        f"WHEN {tail} >= {1 << (w - r)} THEN {1 << (w + 1 - r)}"
        for r in range(1, w + 1)
    )
    return f"CASE {branches} ELSE 1 END"


def _hll_oracle() -> str:
    per_p = []
    for p in _HLL_PS:
        w = 60 - p
        m = 1 << p
        k = w + 1
        c = _HLL_ALPHA[m] * m * m * (1 << k)
        per_p.append(f"""
  SELECT grp, {p} AS p, CAST({m} AS BIGINT) AS m,
         CAST({1 << k} AS BIGINT) AS empty_term,
         CAST({c!r} AS DOUBLE) AS est_num,
         h // {1 << w} AS idx,
         {_hll_term_case(p, f"(h % {1 << w})")} AS term
  FROM hashed""")
    stacked = "\n  UNION ALL".join(per_p)
    return f"""
WITH base AS (
  SELECT DISTINCT o_orderpriority AS grp, o_custkey AS ck FROM orders
),
hashed AS (
  SELECT grp,
         ('0x' || substr(md5(CAST(ck AS VARCHAR) || '#hll'), 1, 15))::BIGINT
           AS h
  FROM base
),
stacked AS ({stacked}
),
reg AS (
  SELECT grp, p, m, empty_term, est_num, idx,
         MIN(term) AS reg_term
  FROM stacked GROUP BY grp, p, m, empty_term, est_num, idx
),
per AS (
  SELECT grp, p, m, est_num,
         CAST(COUNT(*) AS BIGINT) AS n_used,
         CAST(SUM(reg_term) + (m - COUNT(*)) * ANY_VALUE(empty_term)
              AS BIGINT) AS s_scaled
  FROM reg GROUP BY grp, p, m, est_num
),
exact AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_exact FROM base GROUP BY grp
)
SELECT per.grp AS o_orderpriority, CAST(per.p AS BIGINT) AS p, per.m,
       per.n_used, per.m - per.n_used AS n_zero_registers, per.s_scaled,
       e.n_exact,
       per.est_num / CAST(per.s_scaled AS DOUBLE) AS est,
       (per.est_num / CAST(per.s_scaled AS DOUBLE)
          - CAST(e.n_exact AS DOUBLE)) / CAST(e.n_exact AS DOUBLE)
         AS rel_err,
       (per.est_num / CAST(per.s_scaled AS DOUBLE)
          <= 2.5 * CAST(per.m AS DOUBLE)) AS small_range_flag
FROM per JOIN exact e ON per.grp = e.grp
"""


_HLL_ORACLE = _hll_oracle()


@query("ext_hll_error_sweep", oracle=_HLL_ORACLE, tier=3)
def ext_hll_error_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog accuracy sweep: estimate distinct customers per
    order-priority with a MANUAL (shared-hash) HLL at m = 16/64/256
    registers and report each estimate against the exact count — the
    sizing table an engineer reads before wiring approx_count_distinct
    into a 100 TB rollup (expected error 1.04/sqrt(m): ~26% / 13% /
    6.5%), the ext_minhash_est_error stance applied to the cardinality
    sketch family (agg_approx_distinct / agg_hll_partitioned_merge ship
    the production path; this key audits the estimator itself, so both
    engines must compute the identical sketch — md5, not xxhash64).

    Exactness: the 60-bit md5 hash splits into p index bits and a
    W-bit tail; the tail maps to the SCALED register term 2^(K - rho)
    through one Python-generated integer CASE chain shared by both
    engine texts (MIN(term) == 2^(K - MAX(rho)) — no transcendental
    anywhere, the raw-estimator path only); the harmonic denominator is
    an exact BIGINT sum (max m * 2^K = 2^61); the estimate is ONE IEEE
    division by a Python-baked constant literal; the small-range
    regime (where ln-based linear counting would apply) is FLAGGED,
    not applied — keeping the surface libm-free (group cardinalities
    here sit above 2.5m for every swept m, pinned in the replay test).

    Shape: one distinct on (priority, custkey) — the same exchange the
    exact count pays — then a map-side 3-way register stack (explode of
    3 structs per row) into ONE (grp, p, idx) aggregate whose output is
    m-bounded (336 register rows max at any scale), a model-sized
    rollup, and a broadcast join of the 5-row exact frame. At 100 TB
    registers partial-aggregate map-side exactly like production HLL."""
    o = load(spark, sf_dir, "orders")
    base = (
        o.select(
            F.col("o_orderpriority").alias("grp"),
            F.col("o_custkey").alias("ck"),
        )
        .distinct()
    )
    from ..session import scoped_persist

    base = scoped_persist(base)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("ck").cast("string"), F.lit("#hll"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    hashed = base.select("grp", h.alias("h"))
    structs = []
    for p in _HLL_PS:
        w = 60 - p
        m = 1 << p
        k = w + 1
        c = _HLL_ALPHA[m] * m * m * (1 << k)
        structs.append(
            F.struct(
                F.lit(p).cast("long").alias("p"),
                F.lit(m).cast("long").alias("m"),
                F.lit(1 << k).cast("long").alias("empty_term"),
                F.lit(c).cast("double").alias("est_num"),
                F.expr(f"h DIV {1 << w}").alias("idx"),
                F.expr(_hll_term_case(p, f"(h % {1 << w})")).alias(
                    "term"
                ),
            )
        )
    stacked = hashed.select(
        "grp", F.explode(F.array(*structs)).alias("e")
    ).select("grp", "e.p", "e.m", "e.empty_term", "e.est_num", "e.idx", "e.term")
    reg = stacked.groupBy("grp", "p", "m", "empty_term", "est_num", "idx").agg(
        F.min("term").alias("reg_term")
    )
    per = reg.groupBy("grp", "p", "m", "est_num").agg(
        F.count(F.lit(1)).alias("n_used"),
        (
            F.sum("reg_term")
            + (F.col("m") - F.count(F.lit(1)))
            * F.any_value(F.col("empty_term"))
        )
        .cast("long")
        .alias("s_scaled"),
    )
    exact = base.groupBy("grp").agg(F.count(F.lit(1)).alias("n_exact"))
    est = F.col("est_num") / F.col("s_scaled").cast("double")
    return per.join(F.broadcast(exact), "grp").select(
        F.col("grp").alias("o_orderpriority"),
        "p",
        "m",
        "n_used",
        (F.col("m") - F.col("n_used")).alias("n_zero_registers"),
        "s_scaled",
        "n_exact",
        est.alias("est"),
        (
            (est - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double")
        ).alias("rel_err"),
        (est <= 2.5 * F.col("m").cast("double")).alias(
            "small_range_flag"
        ),
    )
