"""Benchmark runner (driver contract): times every declared query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing = full plan execution + collect to the driver (what the grading
driver does). One shared SparkSession; a warmup query absorbs JVM/codegen
startup so per-query numbers reflect the plans, not session boot.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from billing_data_loader_spark.plans.catalog import catalog  # noqa: E402
from billing_data_loader_spark.session import get_spark  # noqa: E402

#: Streaming-state queries stage files + run micro-batches; they are timed
#: too but excluded from the headline latency sum so the headline tracks
#: query-engine latency (BASELINE.md measures batch queries only).
_NON_HEADLINE = {
    "stream_availablenow_replay",
    "stream_watermark_late",
    "stream_dedup_watermark",
    "stream_stateful_custom",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0

    spark = get_spark("bdl-bench")
    specs = catalog()

    # warmup: JVM + codegen + parquet footer caches
    specs["agg_q1_pricing"].fn(spark, sf_dir).toPandas()

    timings: dict[str, float] = {}
    for key in sorted(specs):
        t0 = time.perf_counter()
        specs[key].fn(spark, sf_dir).toPandas()
        timings[key] = round(time.perf_counter() - t0, 4)
        # drop persisted intermediates (near-dup signature matrices) so one
        # query's cache never inflates a later query's GC pressure
        spark.catalog.clearCache()

    headline = sum(v for k, v in timings.items() if k not in _NON_HEADLINE)
    print(
        json.dumps(
            {
                "metric": "declared_query_latency_sum",
                "value": round(headline, 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
