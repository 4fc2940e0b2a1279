"""Fixture-table loaders with explicit schemas (no inference in prod paths).

Schemas transcribed from FIXTURES.md (verified against parquet footers).
Mirrors the reference's declared-DDL stance (SURVEY.md §1.1: hand-written
ClickHouse DDL, CSV parsed against a known column list) — schema inference is
a correctness and performance hazard at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .session import prep


def _st(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


SCHEMAS: dict[str, T.StructType] = {
    "region": _st(
        ("r_regionkey", T.IntegerType()),
        ("r_name", T.StringType()),
    ),
    "nation": _st(
        ("n_nationkey", T.IntegerType()),
        ("n_name", T.StringType()),
        ("n_regionkey", T.IntegerType()),
    ),
    "customer": _st(
        ("c_custkey", T.LongType()),
        ("c_name", T.StringType()),
        ("c_nationkey", T.IntegerType()),
        ("c_acctbal", T.DoubleType()),
        ("c_mktsegment", T.StringType()),
    ),
    "supplier": _st(
        ("s_suppkey", T.LongType()),
        ("s_name", T.StringType()),
        ("s_nationkey", T.IntegerType()),
        ("s_acctbal", T.DoubleType()),
    ),
    "part": _st(
        ("p_partkey", T.LongType()),
        ("p_name", T.StringType()),
        ("p_brand", T.StringType()),
        ("p_type", T.StringType()),
        ("p_size", T.IntegerType()),
        ("p_retailprice", T.DoubleType()),
    ),
    "orders": _st(
        ("o_orderkey", T.LongType()),
        ("o_custkey", T.LongType()),
        ("o_orderstatus", T.StringType()),
        ("o_totalprice", T.DoubleType()),
        ("o_orderdate", T.TimestampType()),
        ("o_orderpriority", T.StringType()),
    ),
    "lineitem": _st(
        ("l_orderkey", T.LongType()),
        ("l_partkey", T.LongType()),
        ("l_suppkey", T.LongType()),
        ("l_linenumber", T.IntegerType()),
        ("l_quantity", T.DoubleType()),
        ("l_extendedprice", T.DoubleType()),
        ("l_discount", T.DoubleType()),
        ("l_tax", T.DoubleType()),
        ("l_returnflag", T.StringType()),
        ("l_linestatus", T.StringType()),
        ("l_shipdate", T.TimestampType()),
    ),
    "events": _st(
        ("event_id", T.LongType()),
        ("ts", T.TimestampType()),
        ("user_id", T.LongType()),
        ("event_type", T.StringType()),
        ("value", T.DoubleType()),
        ("props", T.StringType()),
    ),
    "documents": _st(
        ("doc_id", T.LongType()),
        ("text", T.StringType()),
        ("lang", T.StringType()),
        ("source", T.StringType()),
        ("n_chars", T.LongType()),
    ),
    "embeddings": _st(
        ("vec_id", T.LongType()),
        ("embedding", T.ArrayType(T.FloatType())),
        ("label", T.IntegerType()),
    ),
}

TABLE_NAMES: tuple[str, ...] = tuple(SCHEMAS)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


#: sf_dir -> parquet time unit of events.ts ('ns' | 'us' | 'ms').
_EVENTS_TS_UNIT: dict[str, str] = {}


def events_ts_unit(sf_dir: str) -> str:
    """Parquet time unit of ``events.ts`` for this fixture dir.

    The fixture generator has shipped both TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) layouts across rounds; Spark's vectorized reader maps
    µs/ms to TimestampType natively but refuses ns, which needs the legacy
    nanosAsLong long-read + explicit conversion. One driver-side footer read
    (cached per dir) picks the right path instead of hardcoding either.
    """
    unit = _EVENTS_TS_UNIT.get(sf_dir)
    if unit is None:
        import pyarrow.parquet as pq

        unit = pq.read_schema(table_path(sf_dir, "events")).field("ts").type.unit
        _EVENTS_TS_UNIT[sf_dir] = unit
    return unit


def events_read_schema(sf_dir: str) -> T.StructType:
    """Schema to hand ``spark.read``/``readStream`` for events at this dir
    (ts as raw long under the ns layout; TimestampType otherwise)."""
    if events_ts_unit(sf_dir) != "ns":
        return SCHEMAS["events"]
    fields = [
        T.StructField(f.name, T.LongType() if f.name == "ts" else f.dataType, True)
        for f in SCHEMAS["events"].fields
    ]
    return T.StructType(fields)


def events_finalize_ts(df: DataFrame, sf_dir: str) -> DataFrame:
    """Convert a ns-layout raw-long ts to TimestampType; no-op otherwise."""
    if events_ts_unit(sf_dir) != "ns":
        return df
    # `div` is integer division — `/` would round-trip through double and
    # lose precision on epoch-nanos magnitudes (~1.7e18 > 2^53).
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with its declared schema (prepped session)."""
    spark = prep(spark)
    if name == "events":
        if events_ts_unit(sf_dir) == "ns":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.schema(events_read_schema(sf_dir)).parquet(
            table_path(sf_dir, name)
        )
        return events_finalize_ts(df, sf_dir)
    return spark.read.schema(SCHEMAS[name]).parquet(table_path(sf_dir, name))
