"""Targeted quiet-host re-measure for contention-suspect bench keys.

VERDICT r7 item #2: nine keys drifted 1.25-1.42x in the round-7 bench while
loadavg was 6.4 at start, under the 1.5x guard. This script re-times ONLY
those keys with min-of-3 warm runs at trough load and prints a comparison
against the r6 (prior_queries) and r7 (queries) records in BENCH_DETAIL.json,
so a plan regression can be told from a polluted run.

Usage: python tools/remeasure.py key1 key2 ...   (defaults to the r7 nine)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from billing_data_loader_spark.plans.catalog import catalog  # noqa: E402
from billing_data_loader_spark.session import get_spark  # noqa: E402

_R7_DRIFTED = [
    "ext_dedup_cluster",
    "ext_ann_ivf",
    "scan_parquet",
    "project_compute",
    "dedup_keep_latest",
    "join_point_in_time",
    "ext_neardup_jaccard",
    "set_union_all",
    "join_q8_market_share",
]


def main() -> None:
    keys = sys.argv[1:] or _R7_DRIFTED
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    detail = json.loads((Path(__file__).resolve().parent.parent / "BENCH_DETAIL.json").read_text())
    r7 = detail.get("queries", {})
    r6 = detail.get("prior_queries", {})

    spark = get_spark("bdl-remeasure")
    specs = catalog()
    specs["agg_q1_pricing"].fn(spark, sf_dir).toPandas()  # warmup

    print(f"loadavg_start={os.getloadavg()}")
    out = {}
    for key in keys:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            specs[key].fn(spark, sf_dir).toPandas()
            runs.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        best = round(min(runs), 4)
        out[key] = best
        prior6, prior7 = r6.get(key), r7.get(key)
        v6 = f"{best / prior6:.2f}x r6" if prior6 else "n/a"
        print(f"{key:28s} min3={best:7.3f}  r6={prior6}  r7={prior7}  ratio={v6}")
    print(f"loadavg_end={os.getloadavg()}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
