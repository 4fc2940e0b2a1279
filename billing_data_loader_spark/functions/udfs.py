"""UDF / UDAF / UDTF surface (SURVEY.md §2.9).

UDFs are the deliberate slow path: every query here exists to prove the
Python-execution machinery (row UDF, Arrow-vectorized pandas UDF,
grouped-map applyInPandas, grouped-agg pandas UDF, lateral UDTF) against a
pure-SQL oracle. Production operators elsewhere in this package stay
JVM-side; at 100 TB a pandas UDF pays one Arrow serialization round trip
per batch, a row UDF pays one per row — never put the latter on a fact
table.

Parity notes: pandas/numpy reductions are float-order-sensitive like any
engine, so grouped results are either quantized to integers before summing
(half-up, matching decimal-cast rounding) or rounded on both sides.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.registry import query
from ..tables import load

# --- udf_python_scalar ------------------------------------------------------

_NORM_ORACLE = """
SELECT doc_id,
       trim(regexp_replace(lower('  ' || upper(text) || '  '), ' +', ' ', 'g'))
         AS norm_text
FROM documents
"""


@query("udf_python_scalar", oracle=_NORM_ORACLE, tier=2)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF: whitespace/case normalization (the classic
    text-cleaning step; intentionally SQL-replicable for the oracle)."""

    @F.udf(T.StringType())
    def normalize(s: str) -> str:
        return " ".join(s.lower().split())

    d = load(spark, sf_dir, "documents")
    noisy = F.concat(F.lit("  "), F.upper("text"), F.lit("  "))
    return d.select("doc_id", normalize(noisy).alias("norm_text"))


# --- udf_pandas_scalar ------------------------------------------------------

# Cosine vs the corpus centroid-ish fixed query vector (all-ones). Dot/norm
# folds are sequential in DuckDB's list_dot_product and np.dot may reorder,
# so both sides round to 6 decimals.
_COS_ORACLE = """
WITH q AS (SELECT [CAST(1.0 AS DOUBLE) FOR i IN range(64)] AS qv)
SELECT vec_id,
       round(
         list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), qv)
         / (sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                  list_transform(embedding, x -> CAST(x AS DOUBLE))))
            * sqrt(list_dot_product(qv, qv))),
         6) AS cos_to_ones
FROM embeddings, q
"""


@query("udf_pandas_scalar", oracle=_COS_ORACLE, tier=2)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF: batch cosine similarity to a fixed
    query vector (numpy matmul per Arrow batch, no per-row Python)."""
    qv = np.ones(64, dtype=np.float64)
    qnorm = math.sqrt(float(np.dot(qv, qv)))

    @F.pandas_udf(T.DoubleType())
    def cos_to_ones(emb: pd.Series) -> pd.Series:
        mat = np.vstack(emb.to_numpy()).astype(np.float64)
        dots = mat @ qv
        norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
        return pd.Series(np.round(dots / (norms * qnorm), 6))

    e = load(spark, sf_dir, "embeddings")
    return e.select("vec_id", cos_to_ones("embedding").alias("cos_to_ones"))


# --- udf_grouped_map --------------------------------------------------------

_ZSCORE_ORACLE = """
SELECT c_custkey,
       c_mktsegment,
       round((c_acctbal - avg(c_acctbal) OVER w) / stddev_samp(c_acctbal) OVER w,
             4) AS bal_z
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment)
"""


@query("udf_grouped_map", oracle=_ZSCORE_ORACLE, tier=3)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-segment z-score normalization (whole
    group as one pandas DataFrame in, transformed frame out)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        bal = pdf["c_acctbal"].to_numpy(dtype=np.float64)
        z = (bal - bal.mean()) / bal.std(ddof=1)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "bal_z": np.round(z, 4),
            }
        )

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    return c.groupBy("c_mktsegment").applyInPandas(
        zscore, "c_custkey bigint, c_mktsegment string, bal_z double"
    )


# --- udf_pandas_agg ---------------------------------------------------------

# Weighted mean with inputs quantized to 1e-6 integers (half-up, matching
# decimal-cast rounding in both engines) so the sums are order-exact.
_WMEAN_ORACLE = """
SELECT event_type,
       (CAST(SUM(CAST(floor(
            CAST(value * CAST(1 + CAST(json_extract_string(props, '$.k') AS BIGINT)
                 AS DOUBLE) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
        / 1000000.0)
       / (CAST(SUM(CAST(floor(
            CAST(1 + CAST(json_extract_string(props, '$.k') AS BIGINT)
                 AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
        / 1000000.0) AS weighted_value
FROM events
GROUP BY event_type
"""


@query("udf_pandas_agg", oracle=_WMEAN_ORACLE, tier=3)
def udf_pandas_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF: weight-by-(1+k) mean of event value."""

    @F.pandas_udf(T.DoubleType())
    def wmean(v: pd.Series, w: pd.Series) -> float:
        # the shared floor-quantization (determinism.quantize_long's ops in
        # numpy form): float64 product, *1e6, +0.5, floor — each step IEEE-
        # identical to the oracle's floor(CAST(...)*1000000.0 + 0.5), so
        # the former DECIMAL(28,6)-cast mirror (which disagreed near half-
        # boundaries for >2dp inputs) is gone on BOTH sides. int64 partial
        # sums are exact below 2^63 micro-units per group; the int->double
        # cast then the /1e6 divide match the oracle's op order.
        num = np.floor(v.to_numpy() * w.to_numpy() * 1e6 + 0.5).astype(np.int64)
        den = np.floor(w.to_numpy() * 1e6 + 0.5).astype(np.int64)
        return float((float(num.sum()) / 1e6) / (float(den.sum()) / 1e6))

    ev = load(spark, sf_dir, "events")
    w = (1 + F.get_json_object("props", "$.k").cast("long")).cast("double")
    return ev.groupBy("event_type").agg(
        wmean("value", w).alias("weighted_value")
    )


# --- udtf_tokenize_ordinal --------------------------------------------------

_UDTF_ORACLE = """
SELECT doc_id,
       CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS pos,
       unnest(string_split(text, ' ')) AS token
FROM documents
WHERE doc_id < 100
"""


@query("udtf_tokenize_ordinal", oracle=_UDTF_ORACLE, tier=3)
def udtf_tokenize_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one input row -> N (position, token) rows via a real
    lateral table function (not posexplode — exercises the UDTF machinery)."""

    @F.udtf(returnType="pos bigint, token string")
    class TokenizeOrdinal:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" "), start=1):
                yield i, tok

    spark.udtf.register("bdl_tokenize_ordinal", TokenizeOrdinal)
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    d.createOrReplaceTempView("bdl_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM bdl_udtf_docs d, LATERAL bdl_tokenize_ordinal(d.text) t
        """
    )


# --- udf_arrow_scalar -------------------------------------------------------

# IEEE double arithmetic is identical in Python, the JVM, and DuckDB for a
# fixed evaluation order, so the charge formula needs no rounding to match.
_ARROW_UDF_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
FROM lineitem WHERE l_quantity >= 45
"""


@query("udf_arrow_scalar", oracle=_ARROW_UDF_ORACLE, tier=2)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (``useArrow=True`` — SPARK-40307): the
    third Python execution path next to the pickled row UDF
    (udf_python_scalar) and the pandas UDF (udf_pandas_scalar). Scalars
    cross as Arrow columns but the function still sees one row at a time —
    ~2-5x over pickling from serialization alone, while the pandas UDF
    keeps the vectorization win; the plan shows ArrowEvalPython instead of
    BatchEvalPython. The filter is pushed to the scan BEFORE the UDF runs
    (Catalyst keeps deterministic-UDF-free predicates below the Python
    stage), so Python only ever sees the surviving rows."""

    @F.udf(T.DoubleType(), useArrow=True)
    def charge(price: float, discount: float, tax: float) -> float:
        return price * (1 - discount) * (1 + tax)

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


# --- udf_map_in_arrow -------------------------------------------------------

# mapInArrow completes the Python-execution surface: scalar UDF (row),
# pandas UDF (series), grouped map / agg (frame), UDTF, Arrow-optimized
# scalar — and here the lowest-overhead batch path, where the function
# sees raw pyarrow RecordBatches with no pandas conversion at all.
_ARROW_MAP_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem
WHERE l_quantity >= 30
"""


def _arrow_revenue_batches(batches):
    """Per-batch revenue via pyarrow.compute: the arithmetic runs in
    Arrow's vectorized C++ kernels on the exact same doubles Spark holds,
    so the result is bit-identical to the JVM expression (same IEEE ops,
    no pandas dtype round-trip)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        yield pa.RecordBatch.from_arrays(
            [batch.column("l_orderkey"), batch.column("l_linenumber"), rev],
            names=["l_orderkey", "l_linenumber", "revenue"],
        )


@query("udf_map_in_arrow", oracle=_ARROW_MAP_ORACLE, tier=2)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` batch transform: revenue per qualifying lineitem.
    The quantity filter stays OUTSIDE the Python function (pushed to the
    parquet scan); only the three needed columns cross the Arrow
    boundary. This is the path for Python logic too custom for built-ins
    but regular enough to vectorize — one process hop, zero
    per-row/pandas overhead; at 100 TB the cost model is bytes across
    the Arrow boundary, which column pruning here keeps to 3 of 11."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 30)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    )
    return li.mapInArrow(
        _arrow_revenue_batches,
        "l_orderkey bigint, l_linenumber int, revenue double",
    )


# --- udf_pandas_iter --------------------------------------------------------

# module scope: with `from __future__ import annotations` the UDF type
# hints are strings, and pandas_udf resolves them against the MODULE
# globals — a function-local typing import leaves them unresolvable
# (UNSUPPORTED_SIGNATURE).
from typing import Iterator, Tuple  # noqa: E402

#: The per-worker "model" the iterator UDF loads ONCE: a deterministic
#: event-type multiplier table (sorted enumeration, baked in Python and
#: mirrored as a CASE in the oracle).
_ITER_MULT = {
    "click": 1,
    "error": 2,
    "purchase": 3,
    "signup": 4,
    "view": 5,
}

_ITER_ORACLE = f"""
SELECT event_id,
       CAST(floor(value * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT)
         * (CASE event_type {" ".join(
             f"WHEN '{k}' THEN {v}" for k, v in sorted(_ITER_MULT.items())
         )} ELSE 0 END) AS weighted_cents
FROM events
"""


@query("udf_pandas_iter", oracle=_ITER_ORACLE, tier=2)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form pandas UDF (``Iterator[Tuple[pd.Series, ...]] ->
    Iterator[pd.Series]``, SCALAR_ITER): the Python execution path for
    per-executor ONE-TIME initialization — the function body runs once
    per worker, loads its "model" (here the event-type weight table; in
    production a tokenizer, an ONNX session, a compiled regex set)
    BEFORE the batch loop, and then streams Arrow batches through the
    warm state. The scalar pandas UDF re-enters per batch with no init
    hook; at 100 TB with thousand-batch tasks the amortization is the
    difference between loading a model once per executor and once per
    batch. Completes the Python surface next to udf_python_scalar (row),
    udf_pandas_scalar (series), udf_arrow_scalar (Arrow row),
    udf_map_in_arrow (RecordBatch), udf_grouped_map / udf_pandas_agg
    (frame), udtf_tokenize_ordinal (table).

    Exactness: cents quantize via the shared floor grid inside numpy
    (float64 ops identical to the JVM's IEEE doubles), then integer
    multiply by the baked table — output is exact BIGINT.

    Shape: pure map-side ArrowEvalPython over the scan; no shuffle,
    no state. The plan pin (tests) checks the node is ArrowEvalPython
    with SQL_SCALAR_PANDAS_ITER_UDF, not BatchEvalPython."""
    @F.pandas_udf(T.LongType())
    def weighted(
        it: Iterator[Tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        # one-time per-worker init (the point of the iterator form)
        mult = dict(_ITER_MULT)
        for value, event_type in it:
            cents = np.floor(value.to_numpy() * 1e2 + 0.5).astype(
                "int64"
            )
            m = event_type.map(mult).fillna(0).astype("int64").to_numpy()
            yield pd.Series(cents * m)

    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        weighted("value", "event_type").alias("weighted_cents"),
    )
