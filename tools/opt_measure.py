"""Isolation measurement harness for the optimization rounds (guide §1).

Usage:
    python tools/opt_measure.py [--sf DIR] [--runs N] [--plans SUBDIR|--no-plans]
                                [--suffix before|after] key1 key2 ...

For each key: builds the DataFrame, times `df.write.format("noop")` (guide
§1.4 — computes every column of every row, no sink cost, no driver
collect), reports min/median of N runs, and dumps `.explain("formatted")`
to plans/<SUBDIR>/<key>_<suffix>.txt. Jobs are labelled with
setJobDescription so the timeline is attributable.

This is a *measurement* tool only: it never feeds BENCH_DETAIL.json and
uses the same catalog the bench and driver use.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from billing_data_loader_spark.plans.catalog import catalog  # noqa: E402
from billing_data_loader_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    runs = 3
    plans_dir: Path | None = (
        Path(__file__).resolve().parent.parent / "plans" / "r13"
    )
    suffix = "before"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = (
            Path(__file__).resolve().parent.parent / "plans" / args[i + 1]
        )
        del args[i : i + 2]
    if "--no-plans" in args:
        plans_dir = None
        args.remove("--no-plans")
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]

    spark = get_spark("bdl-opt-measure")
    specs = catalog()
    unknown = [k for k in args if k not in specs]
    if unknown:
        sys.exit(f"unknown keys: {unknown}")

    # warmup (JVM + codegen + parquet footer caches)
    specs["agg_q1_pricing"].fn(spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict] = {}
    for key in args:
        times: list[float] = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"opt_measure:{key}#{r}")
            df = specs[key].fn(spark, sf)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        times.sort()
        out[key] = {
            "min": round(times[0], 4),
            "median": round(times[len(times) // 2], 4),
            "all": [round(t, 4) for t in times],
        }
        if plans_dir is not None:
            plans_dir.mkdir(parents=True, exist_ok=True)
            df = specs[key].fn(spark, sf)
            plan = df._jdf.queryExecution().explainString(  # noqa: SLF001
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001, E501
                    "formatted"
                )
            )
            (plans_dir / f"{key}_{suffix}.txt").write_text(plan)
        print(f"{key}: min={out[key]['min']}s all={out[key]['all']}")
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
