"""Round-12 window/timeseries batch: independent Python replays for the
Bollinger envelope, the running-distinct curve, YoY growth (incl. the
gap guard), the rolling click/view correlation, and integer Holt
smoothing."""

from __future__ import annotations

import math
from collections import defaultdict

from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


def _daily_cents(spark, by_type=False):
    rows = (
        load(spark, SF_DIR, "events")
        .select("ts", "event_type", "value")
        .collect()
    )
    out: dict = defaultdict(int)
    for r in rows:
        c = math.floor(r["value"] * 100 + 0.5)
        key = (r["event_type"], r["ts"].date()) if by_type else r[
            "ts"
        ].date()
        out[key] += c
    return out


class TestMovingStddev:
    def test_python_replay(self, spark):
        daily = _daily_cents(spark, by_type=True)
        series: dict = defaultdict(list)
        for (et, day), c in sorted(daily.items()):
            series[et].append((day, c))
        got = {
            (r["event_type"], r["day"]): r
            for r in catalog()["win_moving_stddev"].fn(spark, SF_DIR)
            .collect()
        }
        assert len(got) == sum(len(v) for v in series.values())
        for et, pts in series.items():
            for i, (day, c) in enumerate(pts):
                wnd = [x for _, x in pts[max(0, i - 6): i + 1]]
                n, s = len(wnd), sum(wnd)
                ss = sum(x * x for x in wnd)
                g = got[(et, day)]
                assert g["n7"] == n
                assert abs(g["ma7"] - s / (n * 100)) < 1e-9
                sd = math.sqrt(n * ss - s * s) / (n * 100)
                assert abs(g["sd7"] - sd) < 1e-9
                assert abs(g["band_upper"] - (s / (n * 100) + 2 * sd)) \
                    < 1e-9


class TestRunningDistinct:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "events")
            .select("ts", "event_type", "user_id")
            .collect()
        )
        first: dict = {}
        for r in rows:
            k = (r["event_type"], r["user_id"])
            d = r["ts"].date()
            if k not in first or d < first[k]:
                first[k] = d
        new_by: dict = defaultdict(int)
        for (et, _), d in first.items():
            new_by[(et, d)] += 1
        got = sorted(
            catalog()["win_running_distinct"].fn(spark, SF_DIR).collect(),
            key=lambda r: (r["event_type"], r["day"]),
        )
        cum: dict = defaultdict(int)
        for r in got:
            assert r["new_users"] == new_by[(r["event_type"], r["day"])]
            cum[r["event_type"]] += r["new_users"]
            assert r["cum_distinct_users"] == cum[r["event_type"]]
        # curve must end at the true distinct-user count per type
        truth: dict = defaultdict(set)
        for r in rows:
            truth[r["event_type"]].add(r["user_id"])
        for et, users in truth.items():
            assert cum[et] == len(users)


class TestYoyGrowth:
    def test_gap_guard_and_replay(self, spark):
        rows = load(spark, SF_DIR, "orders").select(
            "o_orderpriority", "o_orderdate", "o_totalprice"
        ).collect()
        m: dict = defaultdict(int)
        for r in rows:
            idx = r["o_orderdate"].year * 12 + r["o_orderdate"].month - 1
            m[(r["o_orderpriority"], idx)] += math.floor(
                r["o_totalprice"] * 100 + 0.5
            )
        got = catalog()["win_yoy_growth"].fn(spark, SF_DIR).collect()
        assert len(got) == len(m)
        for r in got:
            ym = r["ym"]
            idx = (ym // 100) * 12 + (ym % 100) - 1
            cents = m[(r["prio"], idx)]
            assert abs(r["revenue"] - cents / 100) < 1e-9
            prev_key = (r["prio"], idx - 12)
            # the 12-LAG guard: comparison only when month idx-12 EXISTS
            # in this priority's series (no gaps in TPC-H, but the guard
            # must agree with presence)
            if prev_key in m:
                assert r["revenue_prior_year"] is not None
                assert abs(
                    r["yoy_growth"]
                    - (cents - m[prev_key]) / m[prev_key]
                ) < 1e-12
            else:
                assert r["revenue_prior_year"] is None
                assert r["yoy_growth"] is None


class TestRollingCorr:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "events")
            .select("ts", "event_type", "value")
            .collect()
        )
        daily: dict = defaultdict(lambda: [0, 0])
        for r in rows:
            c = math.floor(r["value"] * 100 + 0.5)
            if r["event_type"] == "click":
                daily[r["ts"].date()][0] += c
            elif r["event_type"] == "view":
                daily[r["ts"].date()][1] += c
            else:
                daily[r["ts"].date()]  # day exists even without x/y
        pts = sorted(daily.items())
        got = {
            r["day"]: r
            for r in catalog()["ts_rolling_corr"].fn(spark, SF_DIR)
            .collect()
        }
        for i, (day, (x, y)) in enumerate(pts):
            wnd = [v for _, v in pts[max(0, i - 6): i + 1]]
            n = len(wnd)
            if n < 3:
                assert day not in got
                continue
            sx = sum(a for a, _ in wnd)
            sy = sum(b for _, b in wnd)
            sxx = sum(a * a for a, _ in wnd)
            syy = sum(b * b for _, b in wnd)
            sxy = sum(a * b for a, b in wnd)
            corr = (n * sxy - sx * sy) / (
                math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
            )
            g = got[day]
            assert abs(g["corr7"] - corr) < 1e-12
            assert -1.0 <= g["corr7"] <= 1.0


class TestHoltLinear:
    def test_python_replay(self, spark):
        daily = sorted(_daily_cents(spark).items())
        level, trend = daily[0][1], 0
        expect = [(daily[0][0], daily[0][1], level, trend)]
        for day, c in daily[1:]:
            new_level = math.floor((c + level + trend) / 2)
            trend = math.floor((new_level - level + trend) / 2)
            level = new_level
            expect.append((day, c, level, trend))
        got = sorted(
            catalog()["ts_holt_linear"].fn(spark, SF_DIR).collect(),
            key=lambda r: r["day"],
        )
        assert len(got) == len(expect)
        for g, (day, c, lv, tr) in zip(got, expect):
            assert g["day"] == day
            assert abs(g["daily_value"] - c / 100) < 1e-9
            assert abs(g["level"] - lv / 100) < 1e-9
            assert abs(g["trend"] - tr / 100) < 1e-9
            assert abs(g["forecast_next"] - (lv + tr) / 100) < 1e-9

    def test_constant_series_fixpoint(self):
        # property: on a constant series the integer recursion converges
        # to level == x, trend == 0 (floor-div damping cannot oscillate)
        x = 123456
        level, trend = x, 0
        for _ in range(50):
            nl = math.floor((x + level + trend) / 2)
            trend = math.floor((nl - level + trend) / 2)
            level = nl
        assert level == x and trend == 0
