"""Isolation measurement harness for the optimization rounds (guide §1).

Usage:
    python tools/opt_measure.py [--sf DIR] [--runs N] [--plans SUBDIR|--no-plans]
                                [--suffix before|after] [--noop] key1 key2 ...

For each key: builds the DataFrame, times the collect (`.toPandas()` — the
exact action bench.py and the grading driver time; output frames here are
small, so sink cost is negligible), reports min/median of N runs, and dumps
`.explain("formatted")` to plans/<SUBDIR>/<key>_<suffix>.txt. Jobs are
labelled with setJobDescription so the timeline is attributable.

`--noop` switches the timed action to the guide §1.4 noop sink. Measured
2026-08-17 on ext_pca_power_iteration: the noop InsertIntoDataSourceCommand
path executes this cached-and-broadcast-heavy plan 5-20x SLOWER than the
collect path (33-123 s vs a stable 5.9-6.8 s warm toPandas) — the write
command re-plans without the collect path's reuse — so the collect action
is both the representative measurement (it is what the driver times) and
the stable one; noop remains available for scan-heavy keys.

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
    noop = "--noop" in args
    if noop:
        args.remove("--noop")

    spark = get_spark("bdl-opt-measure")
    specs = catalog()
    unknown = [k for k in args if k not in specs]
    if unknown:
        sys.exit(f"unknown keys: {unknown}")

    # warmup (JVM + codegen + parquet footer caches)
    specs["agg_q1_pricing"].fn(spark, sf).toPandas()

    def run_action(df) -> None:
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.toPandas()

    out: dict[str, dict] = {}
    for key in args:
        times: list[float] = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"opt_measure:{key}#{r}")
            df = specs[key].fn(spark, sf)
            t0 = time.perf_counter()
            run_action(df)
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
