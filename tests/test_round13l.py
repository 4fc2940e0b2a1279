"""Round-13 deferred-bank batch 9 replays: the DP Laplace release and
the k-anonymity audit — hashlib/math replays plus the mechanism pins
(noise symmetry, epsilon ordering, anonymity flag semantics)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from billing_data_loader_spark.operators.privacy import (
    _DP_DENOM,
    _DP_EPS,
    _KANON_BAND_CENTS,
    _KANON_K,
    _KANON_L,
)
from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division — Spark DIV and DuckDB // both
    truncate toward zero on negatives (Python // floors; pinned below)."""
    q = abs(a) // b
    return -q if a < 0 else q


class TestDpLaplaceCounts:
    def test_python_replay(self, spark):
        ev = (
            load(spark, SF_DIR, "events")
            .select("event_type", "ts")
            .collect()
        )
        cells = defaultdict(int)
        for r in ev:
            cells[(r["event_type"], r["ts"].date())] += 1
        want = {}
        for (et, day), cnt in cells.items():
            for b, lbl in _DP_EPS:
                seed = f"{et}#{day.isoformat()}#dp#{lbl}"
                v = int(
                    hashlib.md5(seed.encode()).hexdigest()[:12], 16
                )
                sgn = 1 if 2 * v + 1 >= _DP_DENOM else -1
                arg = (
                    float(_DP_DENOM) - abs(float(2 * v + 1 - _DP_DENOM))
                ) / float(_DP_DENOM)
                ln_q = math.floor(math.log(arg) * 1e6 + 0.5)
                nm = sgn * b * ln_q
                want[(et, day, lbl)] = (cnt, nm, cnt + nm / 1e6)
        got = {
            (r["event_type"], r["day"].date(), r["epsilon"]): r
            for r in catalog()["ext_dp_laplace_counts"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(want)
        for key, (cnt, nm, noised) in want.items():
            g = got[key]
            assert g["true_cnt"] == cnt
            assert g["noise_micro"] == nm
            assert g["noised_cnt"] == noised
            assert g["abs_noise"] == abs(nm / 1e6)

    def test_epsilon_utility_ordering(self, spark):
        # eps=0.1 noise is exactly 10x the eps=1.0 noise per cell (same
        # uniform seed would differ, but the SCALE relation shows in the
        # mean absolute noise: b=10 vs b=1)
        rows = (
            catalog()["ext_dp_laplace_counts"].fn(spark, SF_DIR).collect()
        )
        by_eps = defaultdict(list)
        for r in rows:
            by_eps[r["epsilon"]].append(r["abs_noise"])
        m01 = sum(by_eps["0.1"]) / len(by_eps["0.1"])
        m10 = sum(by_eps["1.0"]) / len(by_eps["1.0"])
        # expected |noise| = b = 1/eps; allow generous sampling slack
        assert m01 > 3 * m10
        assert 0.3 < m10 < 3.0
        # symmetry: both signs occur at each epsilon
        for lbl, vals in by_eps.items():
            signed = [
                r["noise_micro"] for r in rows if r["epsilon"] == lbl
            ]
            assert any(v > 0 for v in signed)
            assert any(v < 0 for v in signed)


class TestKanonymityAudit:
    def test_python_replay(self, spark):
        cust = (
            load(spark, SF_DIR, "customer")
            .select("c_nationkey", "c_acctbal", "c_mktsegment")
            .collect()
        )
        cls = defaultdict(lambda: [0, set()])
        for r in cust:
            cents = math.floor(r["c_acctbal"] * 100 + 0.5)
            band = _tdiv(cents, _KANON_BAND_CENTS)
            key = (r["c_nationkey"], band)
            cls[key][0] += 1
            cls[key][1].add(r["c_mktsegment"])
        got = {
            (r["nation"], r["bal_band"]): r
            for r in catalog()["ext_kanonymity_audit"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(cls)
        n_kviol = 0
        for key, (n, sens) in cls.items():
            g = got[key]
            assert g["n"] == n
            assert g["n_sensitive"] == len(sens)
            assert g["k_violation"] == (n < _KANON_K)
            assert g["l_violation"] == (len(sens) < _KANON_L)
            assert g["reident_risk"] == 1.0 / n
            n_kviol += n < _KANON_K
        # class sizes conserve the population
        assert sum(n for n, _ in cls.values()) == len(cust)
        # the audit discriminates: some classes violate k, some don't
        assert 0 < n_kviol < len(cls)

    def test_truncating_division_on_negatives(self, spark):
        # balances can be negative; Spark DIV and DuckDB // both
        # TRUNCATE toward zero (Python // floors) — the replay must use
        # the engines' convention, pinned here
        assert _tdiv(-100, _KANON_BAND_CENTS) == 0
        assert _tdiv(-300_000, _KANON_BAND_CENTS) == -1
        assert -100 // _KANON_BAND_CENTS == -1  # Python floors
