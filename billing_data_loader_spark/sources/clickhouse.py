"""ClickHouse sink adapter (SURVEY.md §2.1 ``sink_clickhouse``).

The reference's terminal stage is an INSERT into a ClickHouse MergeTree
table (SURVEY §1.1/§3.1 [R-HIGH]). This environment has no ClickHouse
server and no JDBC driver jar, so the sink is adapter-shaped:

- ``prepare_billing_frame`` holds ALL transform logic (type normalization,
  Decimal money columns, toYYYYMM partition key) and is shared by every
  backend — the parquet stand-in and a real ClickHouse writer produce
  identical rows by construction.
- ``ClickHouseJdbcWriter`` is the real-cluster path: standard
  ``df.write.format("jdbc")`` with the official ``clickhouse-jdbc`` driver
  on the classpath. Gated behind a capability check, never imported at
  module load.
- ``ParquetStandInWriter`` mirrors MergeTree layout (PARTITION BY
  toYYYYMM(date)) on the filesystem and is what runs here.

At cluster scale the JDBC path batches per-partition inserts
(``batchsize``, ``numPartitions``) so 1000 executors don't open 1000*cores
connections; repartition to the intended insert parallelism first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.determinism import dsum, o_dsum, quantize_long
from ..plans.registry import query
from ..session import conf_override
from ..tables import load
from .connectors import scratch_dir


def prepare_billing_frame(orders: DataFrame) -> DataFrame:
    """Shared transform stage: billing-shaped frame with Decimal money and a
    toYYYYMM partition key (ClickHouse DDL analog of SURVEY §1.2)."""
    return orders.select(
        F.col("o_orderkey").alias("record_id"),
        F.col("o_custkey").alias("account_id"),
        F.col("o_orderdate").cast("date").alias("usage_date"),
        # money as Decimal for exactness in the sink (Decimal is the
        # at-rest billing type). The 4dp value comes from the shared
        # floor-quantization (quantize_long), NOT a double->decimal HALF_UP
        # cast: the cast rounds on the exact binary expansion while the
        # oracle quantizes the IEEE product, and the two disagree for
        # inputs with >2 decimal digits near scale-4 half-boundaries. The
        # exact integer-units / 10^4 decimal division below is lossless,
        # so the stored decimal equals the quantized value bit-for-bit.
        (quantize_long("o_totalprice", scale=4).cast("decimal(18,0)") / 10000)
        .cast("decimal(18,4)")
        .alias("cost"),
        F.col("o_orderstatus").alias("status"),
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("int")
        .alias("yyyymm"),
    )


class ParquetStandInWriter:
    """MergeTree-shaped filesystem sink: partitioned by yyyymm, idempotent
    per-partition overwrite (ReplacingMergeTree-style reload semantics)."""

    def __init__(self, path: str):
        self.path = path

    def write(self, df: DataFrame) -> None:
        spark = df.sparkSession
        # one file per yyyymm partition (repartition on the partition key)
        # instead of a file per task per partition — the MergeTree analogue
        # of avoiding too-many-parts on insert; overwrite-mode override is
        # scoped so the shared grading session keeps its own config
        with conf_override(
            spark, {"spark.sql.sources.partitionOverwriteMode": "dynamic"}
        ):
            df.repartition("yyyymm").write.mode("overwrite").partitionBy(
                "yyyymm"
            ).parquet(self.path)

    def read_back(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)


class ClickHouseJdbcWriter:
    """Real-cluster path (requires clickhouse-jdbc on the Spark classpath —
    not available in this environment; constructor raises if absent)."""

    DRIVER = "com.clickhouse.jdbc.ClickHouseDriver"

    def __init__(self, url: str, table: str, batch_size: int = 100_000):
        self.url = url
        self.table = table
        self.batch_size = batch_size

    def write(self, df: DataFrame) -> None:
        try:
            df.sparkSession._jvm.java.lang.Class.forName(self.DRIVER)  # noqa: SLF001
        except Exception as exc:  # pragma: no cover - env has no driver jar
            raise RuntimeError(
                "clickhouse-jdbc driver not on classpath; use "
                "ParquetStandInWriter in this environment"
            ) from exc
        (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table)
            .option("driver", self.DRIVER)
            .option("batchsize", str(self.batch_size))
            .option("isolationLevel", "NONE")  # ClickHouse has no txns
            .mode("append")
            .save()
        )


_CH_ORACLE = f"""
SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER) AS yyyymm,
       COUNT(*) AS n_records,
       {o_dsum("o_totalprice", "total_cost", scale=4)}
FROM orders
GROUP BY yyyymm
"""


@query("sink_clickhouse", oracle=_CH_ORACLE, tier=3)
def sink_clickhouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full loader pipeline into the stand-in sink, then read back and
    aggregate per MergeTree partition — oracle is the source table."""
    frame = prepare_billing_frame(load(spark, sf_dir, "orders"))
    sink = ParquetStandInWriter(scratch_dir(sf_dir, "clickhouse_standin"))
    sink.write(frame)
    back = sink.read_back(spark)
    return back.groupBy("yyyymm").agg(
        F.count(F.lit(1)).alias("n_records"),
        # same quantization function as the oracle's o_dsum: the stored
        # decimal is already exactly the quantized 4dp value (see
        # prepare_billing_frame), so dsum recovers the identical integer
        # units and the sum/divide ops match the oracle op-for-op.
        dsum("cost", "total_cost", scale=4),
    )
