"""Round-13 deferred-bank batch 8 replays: hourly peak detection and
the spend-tier migration matrix."""

from __future__ import annotations

import math
from collections import defaultdict

from billing_data_loader_spark.operators.billing_analytics import (
    _TIER_HIGH,
    _TIER_MID,
)
from billing_data_loader_spark.operators.timeseries import _PEAK_K
from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


class TestPeakDetect:
    def test_python_replay(self, spark):
        from datetime import timedelta

        ev = load(spark, SF_DIR, "events").select("ts").collect()
        hourly = defaultdict(int)
        for r in ev:
            hourly[r["ts"].replace(minute=0, second=0, microsecond=0)] += 1
        mn, mx = min(hourly), max(hourly)
        spine = []
        t = mn
        while t <= mx:
            spine.append(hourly.get(t, 0))
            t += timedelta(hours=1)
        want = {}
        k = _PEAK_K
        for i in range(k, len(spine) - k):
            c = spine[i]
            mp = max(spine[i - k : i])
            mn_next = max(spine[i + 1 : i + 1 + k])
            if c > mp and c > mn_next:
                want[mn + timedelta(hours=i)] = (
                    c,
                    mp,
                    mn_next,
                    c - max(mp, mn_next),
                )
        got = {
            r["hr"]: r
            for r in catalog()["ts_peak_detect"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(want)
        for hr, (c, mp, mnx, margin) in want.items():
            g = got[hr]
            assert g["cnt"] == c
            assert g["max_prev3"] == mp
            assert g["max_next3"] == mnx
            assert g["margin"] == margin
            assert g["strong_flag"] == (5 * margin >= c)
        # peaks are strict local maxima, so no two can be adjacent
        hrs = sorted(want)
        for a, b in zip(hrs, hrs[1:]):
            assert (b - a).total_seconds() > 3600
        # the fixture's diurnal load produces at least one peak
        assert want


class TestTierMigration:
    def test_python_replay(self, spark):
        orders = (
            load(spark, SF_DIR, "orders")
            .select("o_custkey", "o_orderdate", "o_totalprice")
            .collect()
        )
        cm = defaultdict(int)
        for r in orders:
            mi = r["o_orderdate"].year * 12 + r["o_orderdate"].month - 1
            cm[(r["o_custkey"], mi)] += math.floor(
                r["o_totalprice"] * 100 + 0.5
            )

        def tier(cents):
            if cents < _TIER_MID:
                return "S"
            if cents < _TIER_HIGH:
                return "M"
            return "L"

        by_cust = defaultdict(dict)
        for (cust, mi), cents in cm.items():
            by_cust[cust][mi] = tier(cents)
        trans = defaultdict(int)
        for cust, months in by_cust.items():
            for mi, to_t in months.items():
                from_t = months.get(mi - 1, "NEW") if mi - 1 in months else "NEW"
                trans[(from_t, to_t)] += 1
        got = {
            (r["from_tier"], r["to_tier"]): r
            for r in catalog()["bill_tier_migration"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(trans)
        row_tot = defaultdict(int)
        for (f, _), n in trans.items():
            row_tot[f] += n
        for key, n in trans.items():
            g = got[key]
            assert g["n_transitions"] == n
            assert g["row_share"] == n / row_tot[key[0]]
        # conservation: every (cust, month) books exactly one transition
        assert sum(trans.values()) == len(cm)
        # every from-tier's shares sum to 1 (exact rational partition)
        for f, tot in row_tot.items():
            s = sum(
                got[(f, t)]["n_transitions"]
                for (ff, t) in trans
                if ff == f
            )
            assert s == tot
        # all three tiers occur somewhere (edges sit inside the
        # fixture's monthly-spend distribution)
        tiers_seen = {t for _, t in trans}
        assert tiers_seen == {"S", "M", "L"}
