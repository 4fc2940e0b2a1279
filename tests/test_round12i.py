"""Round-12 batch 7: replays for rank-biased overlap (algebra checked
off the matryoshka key's own rankings), Kaplan-Meier survival, and the
audience-overlap matrix."""

from __future__ import annotations

import math
from collections import defaultdict

from billing_data_loader_spark.operators.ann import _RBO_P
from billing_data_loader_spark.operators.billing_revenue import (
    _KM_GUARD_MONTHS,
)
from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


class TestRankBiasedOverlap:
    def test_replay_off_matryoshka_rankings(self, spark):
        mrl = catalog()["ext_matryoshka_recall"].fn(spark, SF_DIR).collect()
        ra = {r["trunc_id"]: r["rnk"] for r in mrl}
        rb = {r["full_id"]: r["rnk"] for r in mrl}
        k = len(mrl)
        expect = {}
        total_q = 0
        for d in range(1, k + 1):
            overlap = sum(
                1
                for vid in set(ra) & set(rb)
                if max(ra[vid], rb[vid]) <= d
            )
            w = (1.0 - _RBO_P) * _RBO_P ** (d - 1)
            total_q += math.floor(w * overlap / d * 1e9 + 0.5)
            expect[d] = overlap
        got = {
            r["depth"]: r
            for r in catalog()["ext_rank_biased_overlap"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(expect)
        for d, ov in expect.items():
            assert got[d]["overlap_d"] == ov
            assert abs(got[d]["agreement_d"] - ov / d) < 1e-12
            assert abs(got[d]["rbo_trunc"] - total_q / 1e9) < 1e-12
        # truncated RBO is bounded by the geometric weight prefix
        bound = sum(
            (1.0 - _RBO_P) * _RBO_P ** (d - 1) for d in range(1, k + 1)
        )
        assert 0.0 <= got[1]["rbo_trunc"] <= bound + 1e-9
        # overlap is non-decreasing in depth
        ovs = [got[d]["overlap_d"] for d in range(1, k + 1)]
        assert ovs == sorted(ovs)


class TestSurvivalKM:
    def test_python_replay(self, spark):
        rows = load(spark, SF_DIR, "orders").select(
            "o_custkey", "o_orderdate"
        ).collect()
        per: dict = {}
        for r in rows:
            mi = r["o_orderdate"].year * 12 + r["o_orderdate"].month - 1
            f, l = per.get(r["o_custkey"], (mi, mi))
            per[r["o_custkey"]] = (min(f, mi), max(l, mi))
        hc = max(l for _, l in per.values()) - _KM_GUARD_MONTHS
        obs = []
        for f, l in per.values():
            if f > hc:
                continue
            churned = l <= hc
            obs.append(((l - f) if churned else (hc - f), churned))
        d: dict = defaultdict(int)
        c: dict = defaultdict(int)
        for t, ev in obs:
            (d if ev else c)[t] += 1
        taus = sorted(set(d) | set(c))
        got = {
            r["tau"]: r
            for r in catalog()["bill_survival_km"].fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(taus)
        cum_q = 0
        dead = False
        for tau in taus:
            n_at_risk = sum(
                dd + cc
                for t2 in taus
                if t2 >= tau
                for dd, cc in [(d[t2], c[t2])]
            )
            g = got[tau]
            assert g["n_at_risk"] == n_at_risk
            assert g["n_churned"] == d[tau]
            assert g["n_censored"] == c[tau]
            assert abs(g["hazard"] - d[tau] / n_at_risk) < 1e-12
            if d[tau] == n_at_risk:
                dead = True
            if not dead:
                cum_q += math.floor(
                    math.log((n_at_risk - d[tau]) / n_at_risk) * 1e6 + 0.5
                )
                assert abs(g["log_survival"] - cum_q / 1e6) < 1e-12
                assert g["log_survival"] <= 1e-12  # ln S <= 0
            else:
                assert g["log_survival"] is None
        # survival must be non-increasing where defined
        ls = [
            got[t]["log_survival"]
            for t in taus
            if got[t]["log_survival"] is not None
        ]
        assert ls == sorted(ls, reverse=True)


class TestAudienceOverlap:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "events")
            .select("event_type", "user_id")
            .collect()
        )
        aud: dict = defaultdict(set)
        for r in rows:
            aud[r["event_type"]].add(r["user_id"])
        types = sorted(aud)
        got = {
            (r["et_a"], r["et_b"]): r
            for r in catalog()["agg_audience_overlap"].fn(spark, SF_DIR)
            .collect()
        }
        pairs = [
            (a, b) for i, a in enumerate(types) for b in types[i + 1:]
        ]
        assert set(got) == set(pairs)
        for a, b in pairs:
            inter = len(aud[a] & aud[b])
            g = got[(a, b)]
            assert g["n_a"] == len(aud[a])
            assert g["n_b"] == len(aud[b])
            assert g["n_both"] == inter
            assert abs(
                g["jaccard"] - inter / len(aud[a] | aud[b])
            ) < 1e-12
            assert abs(
                g["containment"]
                - inter / min(len(aud[a]), len(aud[b]))
            ) < 1e-12
            assert g["jaccard"] <= g["containment"] + 1e-12
