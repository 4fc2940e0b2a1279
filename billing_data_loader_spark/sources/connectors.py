"""Source/sink connectors (SURVEY.md §2.1) — the reference's actual ETL
surface re-expressed Spark-first.

The reference is: billing CSV lands in object storage -> parse with declared
schema -> idempotent partition load -> ClickHouse (SURVEY §1.1, [R-HIGH]).
Here: CSV/JSONL scans with explicit schemas, partitioned parquet sink
mirroring ClickHouse ``PARTITION BY toYYYYMM(date)``, and dynamic partition
overwrite as the idempotent re-load primitive.

Write targets live under a deterministic scratch dir per scale factor; every
sink query is a write-then-readback so the driver's compare sees the data
that actually landed (round-trip check, not a write-and-trust).

Scale: partitioned writes shard by (year, month) — at 100 TB that is the
partition-pruning axis for downstream scans AND the idempotency grain;
dynamic overwrite rewrites only dirty partitions, never the table.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.determinism import dsum, o_dsum, o_dsum_expr
from ..plans.registry import query
from ..session import conf_override, scoped_persist
from ..tables import SCHEMAS, load

_SCRATCH_ROOT = os.path.join(tempfile.gettempdir(), "bdl_spark_scratch")


def scratch_dir(sf_dir: str, name: str) -> str:
    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    return os.path.join(_SCRATCH_ROOT, tag, name)


def content_addressed_stage(
    sf_dir: str, name: str, stage_fn, table: str = "documents"
) -> str:
    """Concurrency-safe scratch staging (the ADVICE-r9 pattern, shared by
    scan_webdataset and scan_binaryfile): the final directory is keyed by
    the source fixture table's (mtime, size) fingerprint, so an unchanged
    corpus reuses the staged bytes with zero work and a regenerated one
    restages. ``stage_fn(tmp_dir)`` writes into a unique temp directory
    (its tasks may run on executors — shared-FS assumption, see the
    scan_webdataset docstring for the object-store variant); promotion is
    ONE atomic os.rename, so concurrent invocations race only on the
    rename, the loser discards its temp copy, and no reader ever
    observes a half-staged directory. Stale-fingerprint dirs are pruned
    best-effort."""
    import uuid

    from ..operators.corpus_ops import _corpus_fingerprint

    mt, sz = _corpus_fingerprint(sf_dir, table=table)
    final = scratch_dir(sf_dir, f"{name}-{mt}-{sz}")
    if os.path.isdir(final):
        return final
    parent = os.path.dirname(final)
    os.makedirs(parent, exist_ok=True)
    for old in os.listdir(parent):
        if old.startswith(f"{name}-") and old != os.path.basename(final):
            shutil.rmtree(os.path.join(parent, old), ignore_errors=True)
    tmp = os.path.join(parent, f".tmp-{name}-{uuid.uuid4().hex}")
    os.makedirs(tmp, exist_ok=True)
    stage_fn(tmp)
    try:
        os.rename(tmp, final)  # atomic promote; loser of a race discards
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return final


# --- scan_csv_schema --------------------------------------------------------

_CSV_TS_FMT = "yyyy-MM-dd HH:mm:ss"

_CSV_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM orders
"""


@query("scan_csv_schema", oracle=_CSV_ORACLE, tier=2)
def scan_csv_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's extract stage: CSV with header + declared schema +
    timestamp parsing. Round-trip: export orders to CSV, re-read, compare
    against the original table. Doubles survive via shortest-roundtrip repr.
    """
    out = scratch_dir(sf_dir, "orders_csv")
    load(spark, sf_dir, "orders").write.mode("overwrite").option(
        "header", True
    ).option("timestampFormat", _CSV_TS_FMT).csv(out)
    return (
        spark.read.schema(SCHEMAS["orders"])
        .option("header", True)
        .option("timestampFormat", _CSV_TS_FMT)
        .csv(out)
    )


# --- scan_jsonl -------------------------------------------------------------

_JSONL_ORACLE = """
SELECT event_id, event_type, value,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
"""


@query("scan_jsonl", oracle=_JSONL_ORACLE, tier=2)
def scan_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines ingest with declared schema (labels/props analog):
    export events as JSONL (props stays a nested object), re-read, flatten."""
    out = scratch_dir(sf_dir, "events_jsonl")
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "value",
        F.from_json("props", "struct<k:bigint>").alias("props"),
    )
    ev.write.mode("overwrite").json(out)
    back = spark.read.schema(
        "event_id bigint, event_type string, value double, props struct<k:bigint>"
    ).json(out)
    return back.select(
        "event_id", "event_type", "value", F.col("props.k").alias("k")
    )


# --- scan_orc ---------------------------------------------------------------

_ORC_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
"""


@query("scan_orc", oracle=_ORC_ORACLE, tier=2)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip (the other first-class columnar format Spark ships a
    native vectorized reader for): export customer to ORC, re-read with a
    declared schema. Binary columnar round-trip is exact for doubles —
    no repr/parse step, unlike the CSV path."""
    out = scratch_dir(sf_dir, "customer_orc")
    cols = ["c_custkey", "c_name", "c_acctbal", "c_mktsegment"]
    load(spark, sf_dir, "customer").select(*cols).write.mode(
        "overwrite"
    ).orc(out)
    return spark.read.schema(
        "c_custkey bigint, c_name string, c_acctbal double, c_mktsegment string"
    ).orc(out)


# --- scan_binaryfile --------------------------------------------------------

# Opaque-payload ingestion (multimodal mandate): stage a deterministic
# subset of documents as raw .bin files, scan them with Spark's binaryFile
# source, and emit (doc_id, byte length, sha256). The oracle recomputes all
# three from the source table, so a truncated read, an encoding slip, or a
# lost file breaks the hash.
_BINARYFILE_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha
FROM documents WHERE doc_id % 50 = 0
"""


@query("scan_binaryfile", oracle=_BINARYFILE_ORACLE, tier=3)
def scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` scan: the ingestion path for image/audio/video blobs
    (operators/multimodal.py consumes the same shape). Staging writes the
    doc_id%50 slice as real .bin files DISTRIBUTED — each mapInPandas
    task writes its own rows' files, the scan_webdataset write pattern
    (VERDICT r9 retired the original driver-side .collect() loop here) —
    into the race-safe content-addressed scratch. Staging is setup, not
    the measured operator; the scan itself is the distributed binaryFile
    source, which at 100 TB is exactly how a lake of media objects enters
    the engine (with pathGlobFilter/recursiveFileLookup pruning)."""

    def _stage(tmp: str):
        docs = (
            load(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 50 == 0)
            .select("doc_id", "text")
        )

        def write_files(batches):
            import pandas as pd

            for pdf in batches:
                for did, text in zip(pdf["doc_id"], pdf["text"]):
                    path = os.path.join(tmp, f"doc_{int(did):08d}.bin")
                    with open(path, "wb") as fh:
                        fh.write(str(text).encode("utf-8"))
                yield pd.DataFrame({"n": [len(pdf)]})

        docs.mapInPandas(write_files, "n long").count()  # force the write

    out = content_addressed_stage(sf_dir, "binary_docs", _stage)
    scanned = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(out)
    )
    return scanned.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("sha"),
    )


# --- sink_parquet_partitioned ----------------------------------------------

_PART_SINK_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(month(o_orderdate) AS BIGINT) AS order_month,
       COUNT(*) AS n_orders,
       {o_dsum("o_totalprice", "sum_price")}
FROM orders
GROUP BY order_year, order_month
"""


@query("sink_parquet_partitioned", oracle=_PART_SINK_ORACLE, tier=2)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned write mirroring ClickHouse PARTITION BY toYYYYMM(date):
    write orders sharded by (year, month), read back, aggregate per
    partition — proves partition columns survive the round trip."""
    out = scratch_dir(sf_dir, "orders_partitioned")
    o = load(spark, sf_dir, "orders").withColumns(
        {
            "order_year": F.year("o_orderdate").cast("long"),
            "order_month": F.month("o_orderdate").cast("long"),
        }
    )
    # repartition on the partition columns first: one file per (year, month)
    # instead of every task spraying a file into every partition it touches —
    # the standard small-files fix for dynamic-partition writes at scale
    o.repartition("order_year", "order_month").write.mode("overwrite").partitionBy(
        "order_year", "order_month"
    ).parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("order_year", "order_month").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "sum_price"),
    )


# --- sink_idempotent_overwrite ----------------------------------------------

_IDEMPOTENT_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       COUNT(*) AS n_orders,
       {o_dsum("o_totalprice", "sum_price")}
FROM orders
GROUP BY order_year
"""


@query("sink_idempotent_overwrite", oracle=_IDEMPOTENT_ORACLE, tier=2)
def sink_idempotent_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The loader's key semantic: re-loading one partition must not
    double-count (billing exports are re-emitted). Dynamic partition
    overwrite: full load, then re-load year 1996 TWICE; readback must equal
    the source exactly — the oracle is the untouched orders table."""
    out = scratch_dir(sf_dir, "orders_idempotent")
    o = load(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("long")
    )
    # repartition on the partition key: one file per year per load (see
    # sink_parquet_partitioned)
    op = o.repartition("order_year")
    with conf_override(
        spark, {"spark.sql.sources.partitionOverwriteMode": "dynamic"}
    ):
        op.write.mode("overwrite").partitionBy("order_year").parquet(out)
        reload_slice = op.filter(F.col("order_year") == 1996)
        for _ in range(2):  # replayed export file
            reload_slice.write.mode("overwrite").partitionBy(
                "order_year"
            ).parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("order_year").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "sum_price"),
    )


# --- scan_partition_pruned --------------------------------------------------

_PRUNED_ORACLE = f"""
SELECT CAST(month(o_orderdate) AS BIGINT) AS order_month,
       COUNT(*) AS n_orders,
       {o_dsum("o_totalprice", "sum_price")}
FROM orders
WHERE year(o_orderdate) = 1997
GROUP BY order_month
"""


def _stage_orders_by_year(spark: SparkSession, sf_dir: str) -> str:
    """Stage orders partitioned by order_year (shared by the static- and
    dynamic-pruning scan keys), through the race-safe content-addressed
    scratch keyed on the ORDERS fixture — an unchanged fixture reuses the
    partitioned layout with zero work; staging is setup, the measured
    operator is the pruned read."""

    def _stage(tmp: str):
        o = load(spark, sf_dir, "orders").withColumn(
            "order_year", F.year("o_orderdate").cast("long")
        )
        o.repartition("order_year").write.mode("overwrite").partitionBy(
            "order_year"
        ).parquet(tmp)

    return content_addressed_stage(
        sf_dir, "orders_by_year", _stage, table="orders"
    )


@query("scan_partition_pruned", oracle=_PRUNED_ORACLE, tier=2)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition pruning on a partitioned layout: write orders partitioned
    by year once (scratch cache), then read with a partition filter — the
    scan lists ONLY the year=1997 directory (PartitionFilters in the plan;
    at 100 TB this is the difference between reading one partition and
    listing the whole table). The readback aggregate must equal the
    unpartitioned oracle."""
    out = _stage_orders_by_year(spark, sf_dir)
    back = spark.read.parquet(out).filter(F.col("order_year") == 1997)
    return back.groupBy(
        F.month("o_orderdate").cast("long").alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "sum_price"),
    )


# --- scan_dpp ---------------------------------------------------------------

_DPP_ORACLE = f"""
WITH dim AS (
  SELECT 1995 + r_regionkey AS dim_year, r_name
  FROM region
  WHERE r_name IN ('ASIA', 'EUROPE')
)
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       COUNT(*) AS n_orders,
       {o_dsum("o_totalprice", "sum_price")}
FROM orders JOIN dim ON CAST(year(o_orderdate) AS BIGINT) = dim_year
GROUP BY order_year
"""


@query("scan_dpp", oracle=_DPP_ORACLE, tier=2)
def scan_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning (VERDICT r9 gap #3): the fact scan is
    pruned by a filter that exists only on the DIMENSION side of a join —
    the Spark-native mechanism a 100 TB star schema leans on hardest.
    scan_partition_pruned covers the static case (literal predicate on
    the partition column); here the pruning years are known only after
    the dim filter runs, so Catalyst plants a DynamicPruningExpression
    (an IN-subquery over the broadcast dim) into the fact scan's
    PartitionFilters and only the surviving year directories are read.
    tests/test_plan_gate.py pins `dynamicpruningexpression` in the
    physical plan — the same pushdown-evidence discipline PLANS.md uses
    for static filters.

    The dim is derived from the region fixture (5 rows → year 1995 +
    r_regionkey; ASIA/EUROPE keep 1997-1998) rather than synthesized, so
    the oracle replays it verbatim. The join is a broadcast hash join;
    DPP's default reuseBroadcastOnly=true regime reuses that SAME
    broadcast exchange for the pruning subquery — zero extra fact-side
    work, which is exactly why the feature is free at 100 TB."""
    out = _stage_orders_by_year(spark, sf_dir)
    dim = (
        load(spark, sf_dir, "region")
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
        .select(
            (F.lit(1995) + F.col("r_regionkey")).cast("long").alias("dim_year")
        )
    )
    fact = spark.read.parquet(out)
    return (
        fact.join(F.broadcast(dim), fact.order_year == dim.dim_year)
        .groupBy("order_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "sum_price"),
        )
    )


# --- scan_csv_malformed -----------------------------------------------------

# A real billing-export feed contains the occasional mangled line; the
# loader must quarantine those rows, not fail the batch and not silently
# drop data. PERMISSIVE mode + columnNameOfCorruptRecord is Spark's
# quarantine path. Three deliberately malformed lines are appended to the
# staged export; the declared output books valid rows against the source
# table (count + exact decimal sum) and the quarantine count separately.
_CSV_MALFORMED_ORACLE = f"""
SELECT (SELECT COUNT(*) FROM orders) AS n_valid,
       CAST(3 AS BIGINT) AS n_corrupt,
       (SELECT {o_dsum_expr("o_totalprice")} FROM orders) AS sum_price
"""

_BAD_CSV_LINES = [
    "not,a,valid,row,at,all,extra,fields,here,x,y\n",
    "12345,99,O,not_a_number,1996-01-02 00:00:00,1-URGENT\n",
    "garbage line without any commas at all plus trailing text\n",
]


@query("scan_csv_malformed", oracle=_CSV_MALFORMED_ORACLE, tier=3)
def scan_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE CSV ingest with quarantine: export orders to CSV, append
    3 malformed lines, re-read with a declared schema + _corrupt_record
    column, and book valid vs quarantined rows. FAILFAST would kill a
    100 TB batch for one bad line; DROPMALFORMED silently loses billing
    rows — quarantine is the loader-correct mode, and the oracle proves
    nothing valid was lost (count + exact sum) and all 3 bad lines were
    caught."""
    out = scratch_dir(sf_dir, "orders_csv_malformed")
    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ]
    (
        load(spark, sf_dir, "orders")
        .select(*cols)
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .option("timestampFormat", _CSV_TS_FMT)
        .csv(out)
    )
    part = next(
        p for p in os.listdir(out) if p.endswith(".csv") and p.startswith("part")
    )
    with open(os.path.join(out, part), "a") as fh:
        fh.writelines(_BAD_CSV_LINES)
    for p in os.listdir(out):
        # drop Hadoop's .crc sidecars: the out-of-band append (simulating a
        # corrupted upload) invalidates them and ChecksumFileSystem would
        # fail the read before the CSV parser ever saw the bad lines
        if p.endswith(".crc"):
            os.remove(os.path.join(out, p))

    schema = (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string, "
        "_corrupt_record string"
    )
    parsed = scoped_persist(
        spark.read.schema(schema)
        .option("header", True)
        .option("timestampFormat", _CSV_TS_FMT)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(out)
        # caching before splitting valid/corrupt is the documented Spark
        # requirement for referencing the corrupt-record column; scoped so
        # the cache is released when the next declared query begins
    )
    return parsed.agg(
        F.count(
            F.when(F.col("_corrupt_record").isNull(), F.lit(1))
        ).alias("n_valid"),
        F.count("_corrupt_record").alias("n_corrupt"),
        # no-otherwise when() yields NULL for quarantined rows, which the
        # quantized sum skips — only valid rows are booked
        dsum(
            F.when(F.col("_corrupt_record").isNull(), F.col("o_totalprice")),
            "sum_price",
        ),
    )


# --- scan_xml ---------------------------------------------------------------

# Spark 4 ships a native XML datasource (the old spark-xml package was
# merged upstream); a billing integration that receives per-order XML
# exports can round-trip through it with a declared schema, no inference.
_XML_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM orders
WHERE year(o_orderdate) = 1996
"""

_XML_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@query("scan_xml", oracle=_XML_ORACLE, tier=3)
def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML export round-trip via the Spark-4-native XML datasource: write
    one <order> row-tag element per 1996 order, re-read with the declared
    schema + timestampFormat (never inference — a second full pass at
    100 TB), and the readback must equal the source slice byte-for-byte.
    Doubles survive via the same shortest-roundtrip repr as CSV. XML is a
    row-splittable text format here (one element per line), so reads
    parallelize per split like any text source; it remains the WORST
    format for 100 TB analytics (no column pruning, no predicate
    pushdown) — this key exists because integrations emit it, and the
    loader's job is to land it into parquet exactly once."""
    out = scratch_dir(sf_dir, "orders_xml_1996")
    cols = [
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority",
    ]
    (
        load(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1996)
        .select(*cols)
        .write.mode("overwrite")
        .format("xml")
        .option("rootTag", "orders")
        .option("rowTag", "order")
        .option("timestampFormat", _XML_TS_FMT)
        .save(out)
    )
    schema = (
        "o_orderkey bigint, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string"
    )
    return (
        spark.read.schema(schema)
        .option("rowTag", "order")
        .option("timestampFormat", _XML_TS_FMT)
        .format("xml")
        .load(out)
        .select(*cols)
    )


# --- scan_mergeschema -------------------------------------------------------

# Schema evolution: a long-lived billing table accretes columns across
# loader versions. Two parquet generations are staged — v1 carries
# o_totalprice (no priority), v2 carries o_orderpriority (no price) —
# and one mergeSchema read reconciles them, null-filling each file's
# missing columns. The oracle is the explicit NULL-extended union.
_MERGESCHEMA_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(NULL AS VARCHAR) AS o_orderpriority
FROM orders WHERE o_orderkey % 2 = 0
UNION ALL
SELECT o_orderkey, o_custkey, CAST(NULL AS DOUBLE), o_orderpriority
FROM orders WHERE o_orderkey % 2 = 1
"""


@query("scan_mergeschema", oracle=_MERGESCHEMA_ORACLE, tier=3)
def scan_mergeschema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution via mergeSchema: two staged generations
    with divergent columns read back as one table, missing columns
    null-filled per file. mergeSchema=true reads EVERY file footer at
    planning time — fine for a handful of generations, a listing storm at
    100 TB; the production stance is a declared superset schema (second
    read path below uses exactly that via the user-provided schema, which
    parquet reconciles by name with no footer sweep). Column pruning and
    pushdown still work post-merge: each file serves the columns it has."""
    o = load(spark, sf_dir, "orders")
    out = scratch_dir(sf_dir, "orders_generations")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    v1.write.mode("overwrite").parquet(f"{out}/gen=1")
    v2.write.mode("overwrite").parquet(f"{out}/gen=2")
    merged = (
        spark.read.option("mergeSchema", True)
        .option("recursiveFileLookup", True)
        .parquet(out)
    )
    return merged.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )


# --- scan_python_datasource -------------------------------------------------

# Spark 4 Python DataSource API: a custom source implemented in pure
# Python (pyspark.sql.datasource) — the extension point for reading a
# format/service Spark has no built-in connector for (the reference's
# billing-rate feed). The source generates the deterministic rate card
# below, split across 4 input partitions, so the oracle can reproduce it
# with range arithmetic: 20 SKUs x 12 months, rate = (sku*37) % 100 +
# month * 1.5 (dyadic -> exact double on both engines).
_PYDS_ORACLE = """
SELECT sku_id, month, rate, rate * 100 AS cents
FROM (
  SELECT s.range AS sku_id, m.range AS month,
         CAST((s.range * 37) % 100 AS DOUBLE) + m.range * 1.5 AS rate
  FROM range(0, 20) s CROSS JOIN range(1, 13) m
)
WHERE month <= 6
"""


@query("scan_python_datasource", oracle=_PYDS_ORACLE, tier=3)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource read: ``spark.read.format("billing_rate_card")``
    backed by a DataSourceReader whose ``partitions()`` declares 4 input
    splits — Spark schedules one task per split, exactly how a real
    connector parallelizes (list shards -> read shard per task). The
    month filter and the derived column run as ordinary Catalyst ops ON
    TOP of the Python source (filters are not pushed into this minimal
    reader — at 100 TB implement DataSourceReader.pushFilters for
    shard-level pruning). Registration is per-session and idempotent."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class RateCardReader(DataSourceReader):
        def partitions(self):
            return [InputPartition(i) for i in range(4)]

        def read(self, partition):
            shard = partition.value
            for sku in range(shard, 20, 4):
                for month in range(1, 13):
                    yield (sku, month, float((sku * 37) % 100) + month * 1.5)

    class RateCardDataSource(DataSource):
        @classmethod
        def name(cls):
            return "billing_rate_card"

        def schema(self):
            return "sku_id int, month int, rate double"

        def reader(self, schema):
            return RateCardReader()

    spark.dataSource.register(RateCardDataSource)
    df = spark.read.format("billing_rate_card").load()
    return df.filter(F.col("month") <= 6).select(
        "sku_id", "month", "rate", (F.col("rate") * 100).alias("cents")
    )


# --- scan_parquet_metadata ----------------------------------------------------

#: Tables whose footers the metadata scan inspects (flat-typed files; the
#: embeddings list column is excluded because engines disagree on
#: num_values semantics for nested chunks).
_PQMETA_TABLES = ("lineitem", "orders", "documents")

#: The driver's oracle tier runs at sf0.01 by contract (TESTDATA.md), and
#: parquet_metadata() takes literal paths, not the registered views — so
#: the oracle embeds the correctness-tier fixture root. It is derived from
#: the same env knob the local oracle replica (tests/conftest.py) honors,
#: so a harness running the tier elsewhere templates ONE variable instead
#: of silently diverging from a hard-coded absolute path (r8 ADVICE). The
#: Spark side keeps taking sf_dir (bench runs it at sf0.1 without an
#: oracle).
_PQMETA_SF = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
)

_PQMETA_ORACLE = " UNION ALL ".join(
    f"""
SELECT regexp_extract(file_name, '([^/]+)$', 1) AS file,
       CAST(row_group_id AS BIGINT) AS row_group_id,
       CAST(row_group_num_rows AS BIGINT) AS rg_num_rows,
       path_in_schema AS column_name,
       CAST(num_values AS BIGINT) AS num_values,
       CAST(stats_null_count AS BIGINT) AS null_count,
       CAST(total_compressed_size AS BIGINT) AS compressed_bytes,
       CAST(total_uncompressed_size AS BIGINT) AS uncompressed_bytes
FROM parquet_metadata('{_PQMETA_SF}/{t}.parquet')"""
    for t in _PQMETA_TABLES
)


def _read_footers(iterator):
    """One Arrow batch of file paths in, one row per (row group, column
    chunk) out — each task parses only footers (KBs), never data pages."""
    import pandas as pd
    import pyarrow.parquet as pq

    for pdf in iterator:
        rows = []
        for path in pdf["path"]:
            md = pq.ParquetFile(path).metadata
            fname = path.rsplit("/", 1)[-1]
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                for c in range(rg.num_columns):
                    col = rg.column(c)
                    st = col.statistics
                    rows.append(
                        (
                            fname,
                            g,
                            rg.num_rows,
                            col.path_in_schema,
                            col.num_values,
                            None if st is None else st.null_count,
                            col.total_compressed_size,
                            col.total_uncompressed_size,
                        )
                    )
        yield pd.DataFrame(
            rows,
            columns=[
                "file",
                "row_group_id",
                "rg_num_rows",
                "column_name",
                "num_values",
                "null_count",
                "compressed_bytes",
                "uncompressed_bytes",
            ],
        )


@query("scan_parquet_metadata", oracle=_PQMETA_ORACLE, tier=2)
def scan_parquet_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed parquet-footer inspection: one row per (file,
    row group, column chunk) with row counts, value counts, null counts
    and compressed/uncompressed sizes — the diagnostic that explains scan
    parallelism before any job runs. BASELINE.md's central finding (the
    fixture files are SINGLE-row-group, capping Spark's scan at one task
    per file) is exactly what this operator surfaces; on a 100 TB lake
    it answers "are my files splittable, how big are row groups, which
    columns dominate bytes" across 100k+ files by distributing the
    footer reads (a file list explodes into tasks; each task parses KB
    footers via pyarrow inside mapInPandas — data pages are never read).

    The honest-Python case: footer decoding is not a Catalyst
    expression; Arrow-batched mapInPandas is the right tool (same stance
    as the multimodal decode plumbing). The oracle is DuckDB's
    parquet_metadata() over the same files — an independent
    implementation of the same footer spec, matched column for column.

    The oracle embeds the correctness-tier (sf0.01) paths literally —
    the driver's oracle compare runs at sf0.01 by contract and
    parquet_metadata() reads paths, not views."""
    paths = [f"{sf_dir}/{t}.parquet" for t in _PQMETA_TABLES]
    files = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).repartition(len(paths))
    return files.mapInPandas(
        _read_footers,
        "file string, row_group_id long, rg_num_rows long,"
        " column_name string, num_values long, null_count long,"
        " compressed_bytes long, uncompressed_bytes long",
    )


# --- scan_jsonl_malformed ----------------------------------------------------

# JSONL twin of scan_csv_malformed, with the corruption planted per
# PARSE-FAILURE CLASS instead of appended wholesale: every doc_id%23==5
# line is truncated mid-object (the cut-off upload), every %23==6 line
# is non-JSON garbage (the log line that leaked into the feed). The
# declared output books the per-language valid rollup AND the
# quarantine count in one frame, so a silently-dropped record moves two
# numbers.
_JSONL_MALFORMED_ORACLE = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE doc_id % 23 NOT IN (5, 6)
GROUP BY lang
UNION ALL
SELECT '_corrupt' AS lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(0 AS BIGINT) AS sum_chars
FROM documents WHERE doc_id % 23 IN (5, 6)
"""


@query("scan_jsonl_malformed", oracle=_JSONL_MALFORMED_ORACLE, tier=3)
def scan_jsonl_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE JSONL ingest with quarantine — the JSON twin of
    scan_csv_malformed, staged with per-class corruption: truncated
    objects (a cut-off upload) and non-JSON garbage (a leaked log line)
    planted on deterministic doc_id slices, everything else valid. The
    reader is spark.read.json with a declared schema +
    _corrupt_record under PERMISSIVE (FAILFAST kills the batch,
    DROPMALFORMED silently loses documents), and the declared output
    books the per-language valid rollup NEXT TO the quarantine count —
    a dropped record moves two numbers, so the oracle catches both
    failure modes.

    Shape: the staged write is distributed (df.write.text through the
    race-safe content-addressed staging — no driver loop), the read
    back is a schema-pinned distributed JSON scan (no inference pass),
    and the single pass aggregates valid and corrupt together off the
    documented persist-before-splitting requirement for the corrupt
    column."""
    from ..tables import load as _load

    def build(tmp: str) -> None:
        d = _load(spark, sf_dir, "documents").select(
            F.expr(
                """CASE
                 WHEN doc_id % 23 = 5 THEN
                   concat('{"doc_id": ', CAST(doc_id AS STRING), ', "lang')
                 WHEN doc_id % 23 = 6 THEN
                   concat('GARBAGE feed line for doc ',
                          CAST(doc_id AS STRING), ' :: not json at all')
                 ELSE to_json(struct(doc_id, lang, n_chars))
               END""").alias("value")
        )
        d.coalesce(4).write.mode("overwrite").text(tmp)

    staged = content_addressed_stage(
        sf_dir, "jsonl_malformed", build, table="documents"
    )
    schema = (
        "doc_id bigint, lang string, n_chars bigint, _corrupt_record string"
    )
    parsed = scoped_persist(
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(staged)
    )
    valid = (
        parsed.filter(F.col("_corrupt_record").isNull())
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )
    corrupt = parsed.filter(F.col("_corrupt_record").isNotNull()).agg(
        F.count(F.lit(1)).alias("n_docs")
    ).select(
        F.lit("_corrupt").alias("lang"),
        "n_docs",
        F.lit(0).cast("long").alias("sum_chars"),
    )
    return valid.unionAll(corrupt)


# --- scan_csv_multiline -------------------------------------------------------

_CSV_ML_ORACLE = """
SELECT doc_id, lang, text, source FROM documents
"""


@query("scan_csv_multiline", oracle=_CSV_ML_ORACLE, tier=3)
def scan_csv_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip with EMBEDDED NEWLINES: each doc's (lang, text,
    source) packs into one 3-line quoted cell, is written as CSV, and is
    read back with ``multiLine=true`` — the parsing mode every
    real-world CSV feed with free-text columns eventually requires
    (default line-split parsing shreds a quoted multi-line record into
    garbage rows). The declared output re-splits the cell and returns
    the reconstructed columns, so the oracle is simply the original
    table: a parser that breaks ANY record breaks row count, ids, or
    values.

    Shape: the write and the read are both distributed over the scratch
    staging dir (shared-FS assumption, the scan_webdataset caveat
    applies for object stores). multiLine=true disables naive
    newline-splitting of input files, so splittability within one file
    is lost — ingest at 100 TB keeps files small (many files = the
    parallelism unit), which is exactly how this staging writes them.
    Fixture texts are space-separated lowercase tokens (no quotes or
    delimiters), so the quoting exercise is isolated to the newlines."""
    out = scratch_dir(sf_dir, "docs_multiline_csv")
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws("\n", "lang", "text", "source").alias("body"),
    )
    d.write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.schema("doc_id bigint, body string")
        .option("header", True)
        .option("multiLine", True)
        .csv(out)
    )
    parts = F.split("body", "\n", 3)
    return back.select(
        "doc_id",
        parts.getItem(0).alias("lang"),
        parts.getItem(1).alias("text"),
        parts.getItem(2).alias("source"),
    )


# --- scan_text_gzip -----------------------------------------------------------

_TXTGZ_ORACLE = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars_sum,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens_sum,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id,
       CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
FROM documents GROUP BY lang
"""


@query("scan_text_gzip", oracle=_TXTGZ_ORACLE, tier=2)
def scan_text_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed line-text source round trip: the documents corpus
    staged as GZIP text shards (one tab-separated doc per line — the
    Common-Crawl-era WET/plain-text delivery format), read back through
    ``spark.read.text`` (codec inferred from the .gz extension), parsed
    map-side, and folded to a per-lang audit whose doc_id sum/min/max
    bind exact membership — a dropped or double-read line breaks the
    hash. Completes the §2.1 codec surface next to csv/jsonl/orc/xml.

    Scale note: gzip is NOT splittable — each .gz shard is one task, so
    shard count (here 8) bounds read parallelism; the production guide
    is many ~100 MB shards (or zstd/bzip2 for splittable frames). That
    constraint is the operator's documentation payload, and the plan
    shows it: 8 whole-file tasks, parse projected map-side.

    Exactness: text is single-space tokens (no tabs — the fixture's
    synthesis), so the 3-field tab split is lossless; all outputs are
    exact integer counts/sums."""
    from pyspark.sql import functions as F  # noqa: F811

    def _stage(tmp: str) -> None:
        (
            load(spark, sf_dir, "documents")
            .select(
                F.concat_ws(
                    "\t",
                    F.col("doc_id").cast("string"),
                    "lang",
                    "text",
                ).alias("value")
            )
            .repartition(8)
            .write.mode("overwrite")
            .option("compression", "gzip")
            .text(tmp)
        )

    staged = content_addressed_stage(sf_dir, "docs_txtgz", _stage)
    raw = spark.read.text(staged + "/*.gz")
    parsed = raw.select(
        F.split_part("value", F.lit("\t"), F.lit(1))
        .cast("long")
        .alias("doc_id"),
        F.split_part("value", F.lit("\t"), F.lit(2)).alias("lang"),
        F.split_part("value", F.lit("\t"), F.lit(3)).alias("text"),
    )
    return parsed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("n_chars_sum"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens_sum"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.sum("doc_id").alias("doc_id_sum"),
    )
