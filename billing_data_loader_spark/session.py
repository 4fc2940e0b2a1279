"""SparkSession builder + runtime prep shared by tests, bench, and the driver.

The driver hands us its own SparkSession (``__spark_entry__.entry`` /
``queries()``), so every config we *require* for oracle parity must be
runtime-settable and applied in :func:`prep`, not only at builder time.

Scale notes (100 TB design intent, tested on local[32]):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  broadcast-join conversion are the main levers that keep the same logical
  plans healthy on a 1000-executor cluster.
- ``spark.sql.shuffle.partitions`` here is sized for the local fixtures; on a
  real cluster AQE's coalescing makes the initial number mostly a ceiling.
- Session timezone pinned to UTC: the DuckDB oracle compares timestamps
  UTC-naive (FIXTURES.md integrity notes).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configs that are runtime-settable and required for oracle parity / sane
#: local performance. Applied to *any* session we receive.
_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
}


def prep(spark: SparkSession) -> SparkSession:
    """Apply runtime configs to an existing session (driver's or ours)."""
    for key, value in _RUNTIME_CONF.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # not runtime-settable on this build; builder default applies
    return spark


def get_spark(app_name: str = "billing-data-loader-spark") -> SparkSession:
    """Build (or join) the shared local session used by tests and bench."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", os.environ.get("BDL_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return prep(spark)
