"""Benchmark runner (driver contract): times every declared query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The printed line is kept COMPACT — headline value plus a small flagship
subset in "queries" — because round 1's full 88-key line was truncated in
the driver's capture (BENCH_r01.json "parsed": null). The full per-query
timing map is written to BENCH_DETAIL.json beside this script.

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
#: Bench protocol identity: prior-round timings are only consulted (noise
#: guard + regression listing) when the prior record carries the same tag.
_PROTOCOL_TAG = "min2-cond3-prior"

_NON_HEADLINE = {
    "stream_availablenow_replay",
    "stream_watermark_late",
    "stream_dedup_watermark",
    "stream_stateful_custom",
    "stream_foreachbatch_sink",
    "stream_transform_with_state",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0

    spark = get_spark("bdl-bench")
    specs = catalog()
    load_start = os.getloadavg()

    # warmup: JVM + codegen + parquet footer caches
    specs["agg_q1_pricing"].fn(spark, sf_dir).toPandas()

    # Streaming warm-stage (VERDICT r12 #7): a /tmp wipe (host reboot)
    # deletes every content-addressed scratch corpus and checkpoint dir,
    # so the first timed run of each streaming-state key after a wipe
    # pays cold staging + checkpoint I/O and records a 2-8x "drift" that
    # re-measures in band warm (r11/r12 lesson). Run each excluded key
    # once UNTIMED before the timed pass so the recorded number is the
    # warm micro-batch latency every round, and the exclusion list can
    # never hide a real regression behind staging noise.
    for _k in sorted(_NON_HEADLINE):
        try:
            specs[_k].fn(spark, sf_dir).toPandas()
        except Exception:  # noqa: BLE001, S110 - the timed pass reports it
            pass
    spark.catalog.clearCache()

    # Two full warm passes per batch key, min kept — UNIFORMLY. The box has
    # external tenants (load-average ~3 while idle) and single-shot timings
    # are bimodal — one stolen-CPU episode inflated fn_unpivot 12x in a
    # round-3 run while the same query measured 0.9s standalone. Round 3
    # re-timed only outliers (min kept), which is one-sided: it can only
    # lower the headline relative to a single-shot protocol, weakening
    # round-over-round comparability (ADVICE r3). Now every batch key gets
    # min-of-2 warm runs, and BOTH sums are recorded (raw first-pass sum +
    # min-of-2 sum) so any protocol can be compared like-for-like.
    # Streaming-state keys stay single-shot (checkpoint staging dominates;
    # excluded from the headline anyway).
    failures: dict[str, str] = {}

    def _timed(key: str) -> float:
        t0 = time.perf_counter()
        specs[key].fn(spark, sf_dir).toPandas()
        dt = time.perf_counter() - t0
        # drop persisted intermediates (near-dup signature matrices) so one
        # query's cache never inflates a later query's GC pressure
        spark.catalog.clearCache()
        return dt

    def _timed_safe(key: str) -> float | None:
        # one transient failure (host OOM under tenant load, scratch-dir
        # race) must cost ONE key, not the whole round's bench record
        try:
            return _timed(key)
        except Exception as exc:  # noqa: BLE001
            failures[key] = f"{type(exc).__name__}: {exc}"[:300]
            return None

    # prior same-protocol per-key timings (previous BENCH_DETAIL): read
    # BEFORE timing so the noise guard below can use them, and carried
    # into the new record for round-over-round comparability (ADVICE r4)
    detail_path = Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    try:
        prev = json.loads(detail_path.read_text())
    except (OSError, ValueError):
        prev = {}
    prior_q_recorded = prev.get("queries", {}) if isinstance(prev, dict) else {}
    prior_tag = prev.get("protocol_tag") if isinstance(prev, dict) else None
    # the prior-based triggers below compare against prior_q timings, which
    # are only comparable when the prior record was produced by THIS
    # protocol — after a protocol change the tag mismatches and the guard
    # (plus the regression listing) stays off for one round rather than
    # firing against incomparable numbers (ADVICE r5). Only the GUARD copy
    # is emptied: the recorded 'prior_queries' field keeps the raw prior
    # timings regardless, since it exists for cross-round audits (ADVICE r6)
    prior_comparable = prior_tag == _PROTOCOL_TAG
    prior_q = prior_q_recorded if prior_comparable else {}

    raw: dict[str, float] = {}
    for key in sorted(specs):
        t = _timed_safe(key)
        if t is not None:
            raw[key] = round(t, 4)
    timings = dict(raw)
    for key in sorted(raw):
        if key not in _NON_HEADLINE:
            t2 = _timed_safe(key)
            if t2 is not None:
                timings[key] = round(min(raw[key], t2), 4)
                # SYMMETRIC noise guard, applied by the same rule to every
                # batch key: if the two runs disagree >1.5x, a stolen-CPU
                # episode polluted one of them — take one more and keep the
                # min (disclosed in the protocol string; unlike round 3's
                # outlier-only re-time, the trigger is per-key uniform).
                # A SUSTAINED burst inflates both runs consistently, which
                # the disagreement test cannot see — so the prior-round
                # same-protocol timing is a second trigger: min-of-2 still
                # >1.5x the prior earns one more attempt (bounded; a real
                # regression keeps its measured min either way).
                disagree = max(raw[key], t2) > 1.5 * min(raw[key], t2)
                vs_prior = (
                    key in prior_q
                    and prior_q[key] > 0
                    and timings[key] > 1.5 * prior_q[key]
                )
                if disagree or vs_prior:
                    t3 = _timed_safe(key)
                    if t3 is not None:
                        timings[key] = round(min(timings[key], t3), 4)

    raw_headline = sum(v for k, v in raw.items() if k not in _NON_HEADLINE)
    headline = sum(v for k, v in timings.items() if k not in _NON_HEADLINE)
    excluded = {k: timings[k] for k in sorted(_NON_HEADLINE) if k in timings}

    # a key regressing >1.5x vs the same-protocol prior (after the extra
    # attempt above) is listed for the next round to re-measure
    regressions = {
        k: {"prior": prior_q[k], "now": v, "ratio": round(v / prior_q[k], 2)}
        for k, v in timings.items()
        if k in prior_q and prior_q[k] > 0 and v > 1.5 * prior_q[k]
    }
    # drift-watch (VERDICT r7 #6): the 1.5x guard was blind to the round-7
    # 1.25-1.42x drift band that appeared while loadavg was 6.4 at start —
    # nine keys moved together with unchanged plans and nothing flagged
    # them. Every >1.25x move vs the same-protocol prior is now recorded,
    # tagged contention_suspect when the host was loaded (1-min loadavg >
    # 3 at either end of the run): a suspect row means "re-measure at
    # trough before reading this as a plan regression", a non-suspect row
    # means "this moved on a quiet host — investigate the plan".
    # 1-min loadavg at the two endpoints misses a mid-run burst (observed
    # r8: start 0.40, end 2.54 — yet the 5-min at end read 4.18 and a
    # dozen unchanged-code keys drifted together 1.3-1.5x). The 5-min
    # average at END integrates the run itself, so it is the better
    # mid-run contention witness on a ~10-min run.
    load_end = os.getloadavg()
    host_loaded = (
        load_start[0] > 3.0 or load_end[0] > 3.0 or load_end[1] > 3.0
    )
    drifts = {
        k: {
            "prior": prior_q[k],
            "now": v,
            "ratio": round(v / prior_q[k], 2),
            "contention_suspect": host_loaded,
        }
        for k, v in timings.items()
        if k in prior_q and prior_q[k] > 0 and v > 1.25 * prior_q[k]
    }
    # Audit-proofing the "best closing run" claim (VERDICT r11 #3): the
    # round-close protocol may discard polluted runs by git-restoring
    # BENCH_DETAIL.json, which erases the evidence that slower runs
    # happened. Every run therefore ALSO appends a one-line summary to
    # BENCH_RUNS.jsonl (append-only, never restored), and the committed
    # record carries min AND median headline across the recent same-
    # protocol runs — so a cherry-picked trough is visible as min << median
    # with the discarded runs' load evidence right beside it.
    runs_path = Path(__file__).resolve().parent / "BENCH_RUNS.jsonl"
    run_row = {
        "ts": round(time.time(), 1),
        "sf": sf,
        "protocol_tag": _PROTOCOL_TAG,
        "headline": round(headline, 4),
        "all_queries_sum": round(sum(timings.values()), 4),
        "n_queries": len(timings),
        "n_drifts_vs_prior": len(drifts),
        "n_failures": len(failures),
        # per-run streaming warmth witness (the excluded keys are warm-
        # staged in setup; cross-run variance here should stay < 1.5x)
        "streaming_sum": round(sum(excluded.values()), 4),
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in load_end],
    }
    with runs_path.open("a") as fh:
        fh.write(json.dumps(run_row, sort_keys=True) + "\n")
    recent: list[dict] = []
    for line in runs_path.read_text().splitlines():
        try:
            row = json.loads(line)
        except ValueError:
            continue
        if (
            row.get("sf") == sf
            and row.get("protocol_tag") == _PROTOCOL_TAG
            and row.get("n_queries") == len(timings)
            and run_row["ts"] - row.get("ts", 0) <= 6 * 3600
        ):
            recent.append(row)
    recent_headlines = sorted(r["headline"] for r in recent)
    mid = len(recent_headlines) // 2
    closing_median = (
        recent_headlines[mid]
        if len(recent_headlines) % 2
        else round(
            (recent_headlines[mid - 1] + recent_headlines[mid]) / 2, 4
        )
    )
    closing_stats = {
        "n_runs_6h_same_protocol": len(recent_headlines),
        "headline_min": recent_headlines[0],
        "headline_median": closing_median,
        "runs": [
            {
                k: r[k]
                for k in (
                    "ts",
                    "headline",
                    "n_drifts_vs_prior",
                    "loadavg_start",
                    "loadavg_end",
                )
            }
            for r in recent
        ],
    }
    detail_path.write_text(
        json.dumps(
            {
                "metric": "declared_query_latency_sum",
                "value": round(headline, 4),
                "unit": "sec",
                "queries": timings,
                "n_queries": len(timings),
                # value == sum(queries) - sum(excluded_from_headline):
                # streaming-state keys stage files + run micro-batches, so
                # they are timed but kept out of the batch-latency headline
                "excluded_from_headline": excluded,
                "all_queries_sum": round(sum(timings.values()), 4),
                "raw_single_shot": {k: raw[k] for k in sorted(raw)},
                "raw_single_shot_sum": round(raw_headline, 4),
                "protocol": (
                    "min of 2 warm runs/key uniformly; a 3rd run (min "
                    "kept) iff the first two disagree >1.5x OR min-of-2 "
                    "exceeds 1.5x the same-protocol prior (sustained-"
                    "burst guard; fires only when the prior record's "
                    "protocol_tag matches this one) — same rule for "
                    "every batch key (contended multi-tenant host); raw "
                    "first-pass timings recorded for comparability; "
                    "streaming-state keys warm-staged untimed in setup, "
                    "then timed single-shot (r13)"
                ),
                "protocol_tag": _PROTOCOL_TAG,
                "prior_queries": prior_q_recorded,
                "prior_protocol_tag": prior_tag,
                "prior_comparable": prior_comparable,
                "regressions_vs_prior": regressions,
                "drifted_vs_prior": drifts,
                "bench_failures": failures,
                # host contention evidence: 1/5/15-min load averages at
                # run start and end (32-core box with external tenants) —
                # lets a reader tell a plan regression from a polluted run
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                # min + median across ALL recent same-protocol runs
                # (including ones later discarded by a git-restore of this
                # file) — sourced from append-only BENCH_RUNS.jsonl
                "closing_stats": closing_stats,
                "sf": sf,
            },
            indent=1,
            sort_keys=True,
        )
        + "\n"
    )

    # Shut Spark down BEFORE the final print (VERDICT r13 #1): the r13
    # driver run lost its one-line JSON because a state-store maintenance
    # thread's shutdown exception ("RpcEnv already stopped") landed after
    # the JSON in the combined output tail (BENCH_r13.json parsed: null).
    # Stopping every active streaming query and then the session here
    # flushes all Spark shutdown noise first; the brief sleep lets any
    # straggler JVM threads finish writing, so the JSON line below is the
    # last thing in the process's output.
    for _q in spark.streams.active:
        try:
            _q.stop()
        except Exception:  # noqa: BLE001 - shutdown noise must not cost the JSON
            pass
    try:
        spark.stop()
    except Exception:  # noqa: BLE001
        pass
    time.sleep(2.0)

    # flagship subset only on stdout (BASELINE.md comparison queries);
    # everything else lives in BENCH_DETAIL.json
    flagship = [
        "agg_q1_pricing",
        "join_q3_shipping",
        "join_star_5way",
        "win_topk_per_group",
        "ext_knn_cosine",
        "ext_neardup_minhash_lsh",
        "fn_explode_tokens",
        "stream_tumbling_1h",
    ]
    print(
        json.dumps(
            {
                "metric": "declared_query_latency_sum",
                "value": round(headline, 4),
                "unit": "sec",
                "queries": {k: timings[k] for k in flagship if k in timings},
                "n_queries": len(timings),
                "all_queries_sum": round(sum(timings.values()), 4),
                # streaming keys are excluded from the headline (micro-
                # batch + checkpoint machinery, not batch latency) but
                # their sum is tracked round-over-round here (VERDICT r6)
                "streaming_sum": round(sum(excluded.values()), 4),
                "raw_single_shot_sum": round(raw_headline, 4),
                "n_failures": len(failures),
                "n_drifts_vs_prior": len(drifts),
                "detail": "BENCH_DETAIL.json",
                "sf": sf,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
