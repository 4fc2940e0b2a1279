"""Loadavg-gated isolation measurement (guide §1) for a multi-tenant host.

Same protocol as tools/opt_measure.py (one shared session, warmup key,
timed `.toPandas()` — the action bench.py and the grading driver time,
min-of-N per key) but every repetition is gated on the 1-minute load
average: before each rep we wait for load < GATE (the box has invisible
external tenants that burst to loadavg 8-14 for minutes at a time and
pollute any un-gated run), and a rep whose END loadavg exceeds the burst
threshold is discarded and retried (bounded), so the recorded min is a
genuine trough number, not the min of three polluted runs.

Usage:
    python tools/quiet_measure.py [--sf DIR] [--runs N] [--gate G]
                                  [--plans SUBDIR --suffix before|after]
                                  [--inclusive] key1 key2 ...

--inclusive starts the timer BEFORE fn(spark, sf) — the exact region
bench.py and the grading driver time. Required for keys whose fn performs
model-sized driver actions (closure-captured centroids/pivots for Arrow
UDFs): timing only the collect would hide that work.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from billing_data_loader_spark.plans.catalog import catalog  # noqa: E402
from billing_data_loader_spark.session import get_spark  # noqa: E402

_BURST = 3.0  # a rep ending above this 1-min loadavg is contention-suspect
_MAX_EXTRA = 3  # bounded retries per key


def _wait_quiet(gate: float, timeout: float = 900.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        if os.getloadavg()[0] < gate:
            return
        time.sleep(10)
    # ADVICE r13: a timeout exit means the gate never opened (possibly our
    # own decaying load) and the next rep runs UNGATED — say so instead of
    # returning silently.
    print(
        f"  _wait_quiet: gate {gate} not reached in {timeout:.0f}s "
        f"(loadavg {os.getloadavg()[0]:.1f}) — next rep runs ungated",
        flush=True,
    )


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    runs = 3
    gate = 1.5
    plans_dir: Path | None = None
    suffix = "before"
    for flag, cast in (("--sf", str), ("--runs", int), ("--gate", float)):
        if flag in args:
            i = args.index(flag)
            val = cast(args[i + 1])
            del args[i : i + 2]
            if flag == "--sf":
                sf = val
            elif flag == "--runs":
                runs = val
            else:
                gate = val
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = Path(__file__).resolve().parent.parent / "plans" / args[i + 1]
        del args[i : i + 2]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    inclusive = "--inclusive" in args
    if inclusive:
        args.remove("--inclusive")

    spark = get_spark("bdl-quiet-measure")
    specs = catalog()
    unknown = [k for k in args if k not in specs]
    if unknown:
        sys.exit(f"unknown keys: {unknown}")

    _wait_quiet(gate)
    specs["agg_q1_pricing"].fn(spark, sf).toPandas()  # warmup

    out: dict[str, dict] = {}
    for key in args:
        times: list[float] = []
        contended_kept = 0  # ADVICE r13: burst reps recorded after retries
        extra = _MAX_EXTRA
        r = 0
        while len(times) < runs:
            _wait_quiet(gate)
            spark.sparkContext.setJobDescription(f"quiet_measure:{key}#{r}")
            r += 1
            if inclusive:
                t0 = time.perf_counter()
                specs[key].fn(spark, sf).toPandas()
            else:
                df = specs[key].fn(spark, sf)
                t0 = time.perf_counter()
                df.toPandas()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            end_load = os.getloadavg()[0]
            if end_load > _BURST:
                if extra > 0:
                    extra -= 1
                    print(
                        f"  {key}: rep discarded (end loadavg "
                        f"{end_load:.1f}): {dt:.3f}s",
                        flush=True,
                    )
                    continue
                # retries exhausted: keep the rep but FLAG it so the
                # published min can never silently be a polluted number
                contended_kept += 1
            times.append(dt)
        spark.sparkContext.setJobDescription(None)
        times.sort()
        out[key] = {
            "min": round(times[0], 4),
            "median": round(statistics.median(times), 4),
            "all": [round(t, 4) for t in times],
        }
        if contended_kept:
            out[key]["contended"] = True
            out[key]["n_contended_reps"] = contended_kept
        if plans_dir is not None:
            plans_dir.mkdir(parents=True, exist_ok=True)
            df = specs[key].fn(spark, sf)
            plan = df._jdf.queryExecution().explainString(  # noqa: SLF001
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001, E501
                    "formatted"
                )
            )
            (plans_dir / f"{key}_{suffix}.txt").write_text(plan)
        print(f"{key}: min={out[key]['min']}s all={out[key]['all']}", flush=True)
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
