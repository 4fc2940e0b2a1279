"""Scalar-function suites (SURVEY.md §2.7): string / date / math /
conditional / array / explode / JSON / map-struct.

All per-row JVM-side expressions (whole-stage codegen, no UDFs). Engine
parity notes inline where Spark and DuckDB dialects differ (dayofweek
origin, regex flavor, libm last-ulp drift on ln/exp -> rounded on both
sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..tables import load

# --- fn_string_suite --------------------------------------------------------

_STRING_ORACLE = """
SELECT
  p_partkey,
  upper(p_name) AS name_upper,
  substr(p_name, 1, 5) AS name_head,
  concat_ws('|', p_brand, p_type) AS brand_type,
  CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
  CAST(length(p_name) AS BIGINT) AS name_len,
  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
  (p_name LIKE '%blue%') AS is_blue,
  trim('  ' || p_name || '  ') AS trimmed
FROM part
"""


@query("fn_string_suite", oracle=_STRING_ORACLE, tier=1)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/substr/concat_ws/split/length/regexp_*/like/trim on part names."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.size(F.split("p_name", " ")).cast("long").alias("n_words"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_name").like("%blue%").alias("is_blue"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
    )


# --- fn_date_suite ----------------------------------------------------------

# Spark dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday. Use ISO weekday
# (Mon=1..Sun=7): Spark weekday()+1 == DuckDB isodow().
_DATE_ORACLE = """
SELECT
  o_orderkey,
  CAST(year(o_orderdate) AS BIGINT) AS order_year,
  CAST(month(o_orderdate) AS BIGINT) AS order_month,
  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
    AS days_since_epoch_start,
  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
  CAST(isodow(o_orderdate) AS BIGINT) AS iso_weekday,
  CAST(last_day(o_orderdate) AS DATE) AS month_end
FROM orders
"""


@query("fn_date_suite", oracle=_DATE_ORACLE, tier=1)
def fn_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/date_trunc/datediff/date_add/weekday/last_day."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).cast("long").alias("days_since_epoch_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("iso_weekday"),
        F.last_day("o_orderdate").alias("month_end"),
    )


# --- fn_math_suite ----------------------------------------------------------

# ln/exp differ by <=1 ulp across libm implementations -> round both sides.
# sqrt is IEEE-correctly-rounded everywhere -> exact.
_MATH_ORACLE = """
SELECT
  o_orderkey,
  round(o_totalprice, 1) AS price_r1,
  abs(o_totalprice - 200000) AS dist_from_200k,
  CAST(ceil(o_totalprice / 1000) AS BIGINT) AS price_k_ceil,
  CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k_floor,
  o_totalprice * o_totalprice AS price_sq,
  sqrt(o_totalprice) AS price_sqrt,
  round(ln(o_totalprice), 6) AS price_ln,
  CAST(o_orderkey % 7 AS BIGINT) AS key_mod7
FROM orders
"""


@query("fn_math_suite", oracle=_MATH_ORACLE, tier=2)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/sqrt/ln/modulo on money columns."""
    o = load(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(price, 1).alias("price_r1"),
        F.abs(price - 200000).alias("dist_from_200k"),
        F.ceil(price / 1000).alias("price_k_ceil"),
        F.floor(price / 1000).alias("price_k_floor"),
        (price * price).alias("price_sq"),
        F.sqrt(price).alias("price_sqrt"),
        F.round(F.log(price), 6).alias("price_ln"),
        (F.col("o_orderkey") % 7).cast("long").alias("key_mod7"),
    )


# --- fn_conditional ---------------------------------------------------------

_COND_ORACLE = """
SELECT
  c_custkey,
  CASE WHEN c_acctbal < 0 THEN 'debtor'
       WHEN c_acctbal < 5000 THEN 'standard'
       ELSE 'premium' END AS tier,
  nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
  greatest(c_acctbal, 0.0) AS bal_floor0,
  least(c_acctbal, 5000.0) AS bal_cap5k
FROM customer
"""


@query("fn_conditional", oracle=_COND_ORACLE, tier=1)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN tiers / nullif / greatest / least."""
    c = load(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "debtor")
        .when(bal < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor0"),
        F.least(bal, F.lit(5000.0)).alias("bal_cap5k"),
    )


# --- fn_array_suite ---------------------------------------------------------

# Higher-order functions over the embedding vectors. Elements are float32;
# arithmetic is done after exact widening to double so both engines compute
# identical values. The fold sum is sequential left-to-right in both.
# The transform-over-slice result is emitted as three scalar doubles (not an
# array column): the driver's canonicalizer cannot hash ndarray cells
# (CORRECTNESS_r01 canon-crash), and scalars hash bit-exact.
_ARRAY_ORACLE = """
SELECT
  vec_id,
  CAST(len(embedding) AS BIGINT) AS dim,
  CAST(embedding[1] AS DOUBLE) AS first_val,
  list_transform(embedding[1:3], x -> CAST(x AS DOUBLE) * 2.0)[1] AS h3d_1,
  list_transform(embedding[1:3], x -> CAST(x AS DOUBLE) * 2.0)[2] AS h3d_2,
  list_transform(embedding[1:3], x -> CAST(x AS DOUBLE) * 2.0)[3] AS h3d_3,
  list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum')
    AS vec_sum,
  len(list_filter(embedding, x -> x > 0)) AS n_positive
FROM embeddings
"""


@query("fn_array_suite", oracle=_ARRAY_ORACLE, tier=2)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/slice + higher-order transform/filter/aggregate."""
    e = load(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    head3 = F.transform(
        F.slice("embedding", 1, 3), lambda x: x.cast("double") * 2.0
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.element_at(head3, 1).alias("h3d_1"),
        F.element_at(head3, 2).alias("h3d_2"),
        F.element_at(head3, 3).alias("h3d_3"),
        F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x).alias("vec_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias(
            "n_positive"
        ),
    )


# --- fn_explode_tokens ------------------------------------------------------

_EXPLODE_ORACLE = """
SELECT token, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
"""


@query("fn_explode_tokens", oracle=_EXPLODE_ORACLE, tier=1)
def fn_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + explode + count (UDTF-shaped lateral, all built-in)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- fn_json_extract --------------------------------------------------------

_JSON_ORACLE = """
SELECT
  event_type,
  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
  COUNT(*) AS n
FROM events
GROUP BY event_type, k_bucket
"""


@query("fn_json_extract", oracle=_JSON_ORACLE, tier=1)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed field extraction from the JSON props column (labels analog)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", (k % 10).alias("k_bucket"))
        .groupBy("event_type", "k_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- fn_map_struct ----------------------------------------------------------

# Spark side exercises real map machinery (from_json -> MapType -> map_keys /
# element access -> struct build + getField); DuckDB oracle states the
# expected values directly (its JSON->MAP path differs, but the *values* are
# what parity checks). The declared output is all-scalar — map keys joined to
# a CSV string, struct fields projected out — because the driver's
# canonicalizer cannot hash dict cells (CORRECTNESS_r01 canon-crash).
_MAP_ORACLE = """
SELECT
  event_id,
  'k' AS prop_keys,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
  event_type AS meta_et,
  user_id AS meta_uid
FROM events
"""


@query("fn_map_struct", oracle=_MAP_ORACLE, tier=3)
def fn_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map/struct construction and access (from_json, map_keys, struct.dot)."""
    ev = load(spark, sf_dir, "events")
    props_map = F.from_json("props", "map<string,bigint>")
    meta = F.struct(
        F.col("event_type").alias("et"), F.col("user_id").alias("uid")
    )
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(props_map), ",").alias("prop_keys"),
        F.element_at(props_map, "k").alias("k_value"),
        meta.getField("et").alias("meta_et"),
        meta.getField("uid").alias("meta_uid"),
    )


# --- fn_regex_suite ---------------------------------------------------------

# The regex surface beyond fn_string_suite's basics: count / like / full
# match-list extraction / first-match position. Patterns stay in the
# Java-regex ∩ RE2 common subset (no backreferences, no lookaround); the
# match list crosses the driver boundary as a comma-joined string.
# first_match_pos is emulated in DuckDB as strpos of the first match —
# equivalent for context-free patterns, where the leftmost occurrence of
# the matched text IS the leftmost match.
_REGEX_ORACLE = """
SELECT
  p_partkey,
  CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT) AS n_vowel_runs,
  regexp_matches(p_name, '[a-z]{5,}') AS has_long_word,
  COALESCE(array_to_string(regexp_extract_all(p_name, '[a-z]{4,}'), ','), '')
    AS long_words,
  CASE WHEN regexp_extract(p_name, '[b-df-hj-np-tv-z]{2}') = '' THEN 0
       ELSE CAST(strpos(p_name, regexp_extract(p_name, '[b-df-hj-np-tv-z]{2}'))
            AS BIGINT)
  END AS first_cc_pos,
  CAST(len(string_split_regex(p_name, '[ -]')) AS BIGINT) AS n_fields
FROM part
"""


@query("fn_regex_suite", oracle=_REGEX_ORACLE, tier=1)
def fn_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_count / rlike / regexp_extract_all / regexp_instr /
    regex-delimited split — all JVM-side codegen expressions."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_count("p_name", F.lit("[aeiou]+")).cast("long").alias(
            "n_vowel_runs"
        ),
        F.col("p_name").rlike("[a-z]{5,}").alias("has_long_word"),
        F.array_join(
            F.regexp_extract_all("p_name", F.lit("[a-z]{4,}"), 0), ","
        ).alias("long_words"),
        F.regexp_instr("p_name", F.lit("[b-df-hj-np-tv-z]{2}")).cast(
            "long"
        ).alias("first_cc_pos"),
        F.size(F.split("p_name", "[ -]")).cast("long").alias("n_fields"),
    )


# --- fn_bitwise_suite -------------------------------------------------------

# Bit arithmetic on the order key: masks, shifts, popcount — the hash/
# bucket/bloom-filter primitive layer. DuckDB's xor() is a function, &,|
# are operators; Spark's are all operators plus bit_count. All stay in
# whole-stage codegen.
_BITWISE_ORACLE = """
SELECT o_orderkey,
       o_orderkey & 255 AS low_byte,
       o_orderkey | 4096 AS with_flag,
       xor(o_orderkey, 21845) AS xored,
       CAST(bit_count(o_orderkey) AS BIGINT) AS popcount,
       o_orderkey << 3 AS shifted_l,
       o_orderkey >> 2 AS shifted_r
FROM orders
"""


@query("fn_bitwise_suite", oracle=_BITWISE_ORACLE, tier=1)
def fn_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise and/or/xor, popcount, shifts on bigint keys."""
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.bit_count(k).cast("long").alias("popcount"),
        F.shiftleft(k, 3).alias("shifted_l"),
        F.shiftright(k, 2).alias("shifted_r"),
    )


# --- fn_url_suite -----------------------------------------------------------

# URLs synthesized deterministically from document columns, then parsed
# back apart — the log-enrichment surface (host/path/query extraction,
# per-key query param, percent-decoding). DuckDB has no parse_url, so the
# oracle mirrors each component with anchored regexes over the same
# synthesized string; url_decode is exercised on a controlled %20-encoded
# input so both engines agree byte-for-byte.
_URL_ORACLE = """
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/' ||
           CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&ref=feed' AS url
  FROM documents
)
SELECT doc_id,
       url,
       regexp_extract(url, '^https://([^/]+)', 1) AS host,
       regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query,
       regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
       replace('a%20b%20' || CAST(doc_id AS VARCHAR), '%20', ' ') AS decoded
FROM u
"""


@query("fn_url_suite", oracle=_URL_ORACLE, tier=1)
def fn_url_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url component extraction (HOST / PATH / QUERY / single query
    key) plus url_decode — all JVM-side codegen expressions, zero
    shuffles; the synthesized URL column exists only inside the
    projection. At 100 TB this is scan -> project -> sink."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&ref=feed"),
    )
    encoded = F.concat(F.lit("a%20b%20"), F.col("doc_id").cast("string"))
    return d.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.url_decode(encoded).alias("decoded"),
    )


# --- fn_variant_extract -----------------------------------------------------

# Spark 4 VARIANT: parse_json into the binary semi-structured type, then
# typed path extraction — the schema-on-read path for the events.props
# payload (vs fn_json_extract's string-functions path). The variant cell
# itself is not declarable (driver hashes flat cells), so the query emits
# typed extractions; DuckDB mirrors with JSON operators.
_VARIANT_ORACLE = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_val,
       CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS absent,
       CAST(json_extract(props, '$.k') AS INTEGER) % 10 = 0 AS k_round
FROM events
"""


@query("fn_variant_extract", oracle=_VARIANT_ORACLE, tier=2)
def fn_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_json -> VARIANT -> variant_get typed extraction, plus
    try_variant_get on a missing path (NULL, not an error). VARIANT keeps
    the parsed tree in a compact binary form, so repeated extractions
    don't re-parse the string — at 100 TB parse once in a projection,
    extract many times downstream. All expressions are codegen-resident;
    zero shuffles."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        F.try_variant_get(v, "$.missing", "string").alias("absent"),
        (k % 10 == 0).alias("k_round"),
    )


# --- fn_collation_compare ---------------------------------------------------

# Spark 4 collation support: string comparison/grouping under UTF8_LCASE
# vs the default UTF8_BINARY. A mixed-case segment label is synthesized
# deterministically (upper for even custkeys), then grouped both ways;
# DuckDB mirrors the case-insensitive collation with lower().
_COLLATION_ORACLE = """
WITH mixed AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
              ELSE lower(c_mktsegment) END AS seg
  FROM customer
)
SELECT lower(seg) AS seg_ci,
       COUNT(*) AS n_customers,
       COUNT(DISTINCT seg) AS n_case_variants
FROM mixed
GROUP BY seg_ci
"""


@query("fn_collation_compare", oracle=_COLLATION_ORACLE, tier=2)
def fn_collation_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTF8_LCASE collation grouping: the mixed-case segment labels
    collapse per case-insensitive group while COUNT(DISTINCT) under the
    default binary collation still sees both variants — the dirty-data
    normalization Spark 4 handles declaratively (no lower() scattered
    through the query; ORDER BY / joins under the collation follow the
    same rule). The emitted group key is lowercased only for the
    cross-engine compare (DuckDB has no UTF8_LCASE)."""
    c = load(spark, sf_dir, "customer")
    seg = F.when(
        F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment")
    ).otherwise(F.lower("c_mktsegment"))
    mixed = c.select("c_custkey", seg.alias("seg"))
    return (
        mixed.groupBy(F.collate("seg", "UTF8_LCASE").alias("seg_key"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct(F.collate("seg", "UTF8_BINARY")).alias(
                "n_case_variants"
            ),
        )
        .select(
            F.lower(F.col("seg_key").cast("string")).alias("seg_ci"),
            "n_customers",
            "n_case_variants",
        )
    )


# --- fn_lambda_suite --------------------------------------------------------

# Higher-order array functions (SQL lambdas): transform / filter / exists /
# forall / aggregate — the expression-level loop constructs that replace
# Python UDFs for per-row collection logic. Quantities quantize to integer
# cents BEFORE entering the lambdas, so every fold is exact integer
# arithmetic and bit-identical cross-engine (DuckDB's list_aggregate 'sum'
# returns HUGEINT — cast back to BIGINT). exists/forall are expressed as
# list_filter cardinalities in the oracle: identical semantics on non-null
# elements, and the fixture arrays are null-free by construction.
_LAMBDA_ORACLE = """
WITH q AS (
  SELECT l_orderkey,
         CAST(floor(CAST(l_quantity AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
           AS qc
  FROM lineitem
),
g AS (SELECT l_orderkey, list_sort(list(qc)) AS a FROM q GROUP BY l_orderkey)
SELECT l_orderkey,
       CAST(len(a) AS BIGINT) AS n_items,
       CAST(list_aggregate(a, 'sum') AS BIGINT) AS qty_sum_c,
       CAST(len(list_filter(a, x -> x >= 3000)) AS BIGINT) AS n_heavy,
       len(list_filter(a, x -> x >= 4500)) > 0 AS any_ge_45,
       len(list_filter(a, x -> x > 4900)) = 0 AS all_le_49,
       CAST(list_aggregate(list_transform(a, x -> x * x), 'sum') AS BIGINT)
         AS sq_sum_c
FROM g
"""


@query("fn_lambda_suite", oracle=_LAMBDA_ORACLE, tier=2)
def fn_lambda_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order function suite over per-order quantity arrays:
    transform, filter, exists, forall, and aggregate (fold) lambdas.
    These are the JVM-side, codegen'd replacement for per-row Python
    UDFs on collection columns — at 100 TB the difference between an
    expression evaluated inside the scan stage and an Arrow round-trip
    per batch. The array is sort_array(collect_list(...)) so its order
    (and therefore every fold) is deterministic regardless of shuffle
    layout; elements are integer cents, so sums are exact."""
    from ..functions.determinism import quantize_long

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", quantize_long("l_quantity", scale=2).alias("qc")
    )
    g = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("qc")).alias("a")
    )
    zero = F.lit(0).cast("long")
    return g.select(
        "l_orderkey",
        F.size("a").cast("long").alias("n_items"),
        F.aggregate("a", zero, lambda acc, x: acc + x).alias("qty_sum_c"),
        F.size(F.filter("a", lambda x: x >= 3000))
        .cast("long")
        .alias("n_heavy"),
        F.exists("a", lambda x: x >= 4500).alias("any_ge_45"),
        F.forall("a", lambda x: x <= 4900).alias("all_le_49"),
        F.aggregate(
            F.transform("a", lambda x: x * x), zero, lambda acc, x: acc + x
        ).alias("sq_sum_c"),
    )


# --- fn_try_arith -------------------------------------------------------------

#: 2^62 and a near-Long.MAX base: chosen so the fixture's key space drives
#: each try_* function through BOTH its null branch and its value branch.
_TRY_BIG = 9_223_372_036_854_775_800  # Long.MAX - 7
_TRY_POW62 = 4_611_686_018_427_387_904  # 2^62

#: Overflow boundaries tuned so the null branch is RARE (~0.8% of rows):
#: try_add/try_multiply detect overflow via a thrown-and-caught JVM
#: arithmetic exception PER OVERFLOWING ROW (measured at sf0.1: 20%/50%
#: overflow rates cost 0.8 s / 1.3 s per column vs ~0.2 s when overflow is
#: ~1%), so the operator models the production reality — errors are the
#: exception — and documents the cliff for anyone tempted to lean on
#: try_* as a bulk branch.
_TRY_ADD_MOD = 1009   # overflow iff mod value > 1000 (8/1009 of rows)
_TRY_ADD_BASE = 9_223_372_036_854_774_807  # Long.MAX - 1000 exactly
_TRY_MUL_MOD = 1031   # overflow iff mod value >= 1024 (7/1031 of rows)
_TRY_POW53 = 9_007_199_254_740_992  # 2^53; * x overflows long iff x >= 1024

_TRY_ARITH_ORACLE = f"""
SELECT
  o_orderkey,
  CASE WHEN o_orderkey % 5 = 0 THEN NULL
       ELSE o_totalprice / CAST(o_orderkey % 5 AS DOUBLE) END AS safe_div,
  CASE WHEN o_orderkey % {_TRY_ADD_MOD} > 1000 THEN NULL
       ELSE {_TRY_ADD_BASE} + o_orderkey % {_TRY_ADD_MOD} END AS safe_add,
  CASE WHEN o_orderkey % {_TRY_MUL_MOD} >= 1024 THEN NULL
       ELSE {_TRY_POW53} * (o_orderkey % {_TRY_MUL_MOD}) END AS safe_mul,
  TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
  TRY_CAST(CASE WHEN o_orderkey % 101 = 0 THEN o_orderstatus
                ELSE substr(o_orderpriority, 1, 1) END AS INTEGER)
    AS mixed_num,
  (string_split(o_orderpriority, '-'))[3] AS part3
FROM orders
"""


@query("fn_try_arith", oracle=_TRY_ARITH_ORACLE, tier=1)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic surface: Spark 4 runs with ANSI SQL semantics
    (overflow, bad casts, division by zero, and out-of-range array access
    all RAISE), so production pipelines reach for the try_* family to get
    null-on-error semantics per expression instead of per-job. One row
    per order exercises each function through both branches:

    - try_divide: null at the %5 == 0 zero-denominator rows, the exact
      IEEE quotient elsewhere (identical division in the oracle's CASE).
    - try_add / try_multiply: BIGINT overflow -> null, with the boundary
      placed so only ~0.8% of rows overflow (see _TRY_ADD_MOD note: the
      JVM detects overflow by throwing, so each null-branch row costs an
      exception — measured 4-6x column slowdown at 20-50% overflow
      rates) — the oracle mirrors the boundary with integer CASEs, since
      DuckDB's own overflow behavior is an exception too.
    - try_cast: '1'..'5' priority prefixes always parse (prio_num);
      mixed_num swaps in an unparseable status letter on ~1% of rows —
      the same rare-failure discipline as the overflow columns, because a
      100%-failing try_cast column measured 1.4 s/150k rows of pure
      exception throwing.
    - try_element_at: index 3 of a 2-element split -> null (DuckDB list
      indexing is null-on-out-of-range natively).

    Pure map-side projection — zero exchanges, full codegen; at 100 TB
    the null branches cost nothing extra and nothing aborts the scan."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.try_divide(
            "o_totalprice", (F.col("o_orderkey") % 5).cast("double")
        ).alias("safe_div"),
        F.try_add(
            F.lit(_TRY_ADD_BASE), F.col("o_orderkey") % _TRY_ADD_MOD
        ).alias("safe_add"),
        F.try_multiply(
            F.lit(_TRY_POW53), F.col("o_orderkey") % _TRY_MUL_MOD
        ).alias("safe_mul"),
        F.expr(
            "try_cast(substr(o_orderpriority, 1, 1) AS INT)"
        ).alias("prio_num"),
        F.expr(
            "try_cast(CASE WHEN o_orderkey % 101 = 0 THEN o_orderstatus"
            " ELSE substr(o_orderpriority, 1, 1) END AS INT)"
        ).alias("mixed_num"),
        F.try_element_at(
            F.split("o_orderpriority", "-"), F.lit(3)
        ).alias("part3"),
    )
