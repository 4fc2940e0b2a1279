"""Round-13 deferred-bank batch 10 replays: the chained two-tier window
rollup and the iterator-form pandas UDF (plan-pinned)."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import timedelta

from billing_data_loader_spark.functions.udfs import _ITER_MULT
from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


def _bucket(ts, minutes):
    base = ts.replace(minute=0, second=0, microsecond=0)
    return base + timedelta(
        minutes=(ts.minute // minutes) * minutes if minutes < 60 else 0
    )


class TestChainedWindows:
    def test_python_replay(self, spark):
        ev = (
            load(spark, SF_DIR, "events")
            .select("event_type", "ts", "value")
            .collect()
        )
        lvl1 = defaultdict(lambda: [0, 0])  # (w15, type) -> n, micro
        for r in ev:
            w15 = _bucket(r["ts"], 15)
            k = (w15, r["event_type"])
            lvl1[k][0] += 1
            lvl1[k][1] += math.floor(r["value"] * 1e6 + 0.5)
        lvl2 = defaultdict(lambda: [0, 0, 0])  # n, panes, micro
        for (w15, et), (n, micro) in lvl1.items():
            hr = w15.replace(minute=0)
            k = (hr, et)
            lvl2[k][0] += n
            lvl2[k][1] += 1
            lvl2[k][2] += micro
        got = {
            (r["hour_start"], r["event_type"]): r
            for r in catalog()["stream_chained_windows"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(lvl2)
        for key, (n, panes, micro) in lvl2.items():
            g = got[key]
            assert g["n_events"] == n
            assert g["n_subwindows"] == panes
            assert g["sum_value"] == micro / 1e6
            assert 1 <= panes <= 4
        # tier conservation: hourly events sum to the corpus
        assert sum(n for n, _, _ in lvl2.values()) == len(ev)

    def test_hourly_matches_tumbling(self, spark):
        """The chained rollup must agree with the single-tier hourly
        aggregation cell for cell (counts; the re-aggregation cannot
        lose or duplicate panes)."""
        chained = {
            (r["hour_start"], r["event_type"]): r["n_events"]
            for r in catalog()["stream_chained_windows"]
            .fn(spark, SF_DIR)
            .collect()
        }
        single = {
            (r["window_start"], r["event_type"]): r["n_events"]
            for r in catalog()["stream_tumbling_1h"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert chained == single


class TestPandasIter:
    def test_python_replay(self, spark):
        ev = (
            load(spark, SF_DIR, "events")
            .select("event_id", "event_type", "value")
            .collect()
        )
        want = {
            r["event_id"]: math.floor(r["value"] * 100 + 0.5)
            * _ITER_MULT.get(r["event_type"], 0)
            for r in ev
        }
        got = {
            r["event_id"]: r["weighted_cents"]
            for r in catalog()["udf_pandas_iter"].fn(spark, SF_DIR).collect()
        }
        assert got == want

    def test_plan_is_arrow_eval(self, spark):
        df = catalog()["udf_pandas_iter"].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan

    def test_multiplier_table_covers_fixture(self, spark):
        types = {
            r["event_type"]
            for r in load(spark, SF_DIR, "events")
            .select("event_type")
            .distinct()
            .collect()
        }
        assert types <= set(_ITER_MULT)
