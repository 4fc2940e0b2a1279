"""Round-13 deferred-bank batch 6 replays: winnowing fingerprints, the
Gopher rule-set audit, and the HyperLogLog error sweep — each result
recomputed independently in plain Python (hashlib / integer winnowing /
a from-scratch HLL) and compared exactly."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from billing_data_loader_spark.operators.profiling import (
    _HLL_ALPHA,
    _HLL_PS,
)
from billing_data_loader_spark.operators.text_analysis import (
    _WINNOW_POS_M,
    _WINNOW_W,
)
from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


def _poly_hash(s: str) -> int:
    h = ord(s[0])
    for c in s[1:]:
        h = (h * 31 + ord(c)) % 2147483647
    return h


class TestWinnowing:
    def test_python_replay(self, spark):
        docs = (
            load(spark, SF_DIR, "documents")
            .select("doc_id", "text")
            .collect()
        )
        want = {}
        for r in docs:
            t = r["text"].split(" ")
            if len(t) < 3:
                continue
            grams = [
                " ".join(t[i : i + 3]) for i in range(len(t) - 2)
            ]
            m = len(grams)
            if m < _WINNOW_W:
                continue
            hs = [_poly_hash(g) for g in grams]
            sel = set()
            for i in range(m - _WINNOW_W + 1):
                # rightmost minimum of the window (1-based positions)
                win = hs[i : i + _WINNOW_W]
                mn = min(win)
                pos = i + max(
                    j for j, v in enumerate(win) if v == mn
                )
                sel.add((pos + 1, hs[pos]))
            fps = {fp for _, fp in sel}
            want[r["doc_id"]] = (
                m,
                m - _WINNOW_W + 1,
                len(sel),
                len(fps),
                min(fps),
                len(sel) / (m - _WINNOW_W + 1),
            )
        got = {
            r["doc_id"]: r
            for r in catalog()["ext_winnowing_fingerprint"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(want)
        for doc, (m, nw, ns, nfp, mfp, dens) in want.items():
            g = got[doc]
            assert g["n_grams"] == m
            assert g["n_windows"] == nw
            assert g["n_selected"] == ns
            assert g["n_distinct_fp"] == nfp
            assert g["min_fp"] == mfp
            assert g["density"] == dens
            # winnowing picks at least one hash per window and never
            # more than one per window start
            assert 1 <= ns <= nw
        # expected density for random hashes is 2/(w+1) = 0.4; the
        # corpus-wide mean should sit near it
        dens = [v[5] for v in want.values()]
        assert 0.25 < sum(dens) / len(dens) < 0.55

    def test_packing_roundtrip(self):
        h, p = 2147483646, 1048575
        comb = h * _WINNOW_POS_M + (_WINNOW_POS_M - 1 - p)
        assert comb // _WINNOW_POS_M == h
        assert _WINNOW_POS_M - 1 - (comb % _WINNOW_POS_M) == p


class TestGopherRules:
    def test_python_replay(self, spark):
        docs = (
            load(spark, SF_DIR, "documents")
            .select("doc_id", "text")
            .collect()
        )
        got = {
            r["doc_id"]: r
            for r in catalog()["ext_gopher_rules"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert len(got) == len(docs)
        n_pass = 0
        for r in docs:
            t = r["text"].split(" ")
            nw = len(t)
            nc = len(r["text"]) - (nw - 1)
            bigrams = [
                " ".join(t[i : i + 2]) for i in range(nw - 1)
            ]
            dup = len(bigrams) - len(set(bigrams))
            nd = len(set(t))
            top = max(Counter(t).values())
            rules = (
                50 <= nw <= 100_000,
                3 * nw <= nc <= 10 * nw,
                5 * dup < max(len(bigrams), 1),
                5 * top < nw,
                10 * nd >= 3 * nw,
            )
            g = got[r["doc_id"]]
            assert g["n_words"] == nw
            assert g["n_chars"] == nc
            assert g["n_dup_bigrams"] == dup
            assert g["n_distinct"] == nd
            assert g["top_cnt"] == top
            assert (
                g["r_word_count"],
                g["r_mean_word_len"],
                g["r_dup_bigram"],
                g["r_top_token"],
                g["r_distinct_ratio"],
            ) == rules
            assert g["pass_all"] == all(rules)
            assert g["n_rules_failed"] == 5 - sum(rules)
            assert g["mean_word_len"] == nc / nw
            n_pass += all(rules)
        # the rule set must actually discriminate on this corpus —
        # both outcomes occur
        assert 0 < n_pass < len(docs)


class TestHllErrorSweep:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "orders")
            .select("o_orderpriority", "o_custkey")
            .collect()
        )
        base = defaultdict(set)
        for r in rows:
            base[r["o_orderpriority"]].add(r["o_custkey"])
        want = {}
        for grp, cks in base.items():
            hs = [
                int(
                    hashlib.md5(f"{ck}#hll".encode()).hexdigest()[:15],
                    16,
                )
                for ck in cks
            ]
            for p in _HLL_PS:
                w = 60 - p
                m = 1 << p
                k = w + 1
                regs = {}
                for h in hs:
                    idx, tail = h >> w, h % (1 << w)
                    rho = (w - tail.bit_length() + 1) if tail else k
                    regs[idx] = max(regs.get(idx, 0), rho)
                s = sum(1 << (k - r) for r in regs.values()) + (
                    m - len(regs)
                ) * (1 << k)
                est = (_HLL_ALPHA[m] * m * m * (1 << k)) / float(s)
                want[(grp, p)] = (
                    m,
                    len(regs),
                    s,
                    len(cks),
                    est,
                    (est - len(cks)) / len(cks),
                )
        got = {
            (r["o_orderpriority"], r["p"]): r
            for r in catalog()["ext_hll_error_sweep"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(want)
        for key, (m, used, s, exact, est, rel) in want.items():
            g = got[key]
            assert g["m"] == m
            assert g["n_used"] == used
            assert g["n_zero_registers"] == m - used
            assert g["s_scaled"] == s
            assert g["n_exact"] == exact
            assert g["est"] == est
            assert g["rel_err"] == rel
            # the raw-estimator regime holds: no group is in the
            # ln-correction band, so the libm-free surface is valid
            assert not g["small_range_flag"]
            # the estimate is within 5 standard errors (1.04/sqrt(m))
            assert abs(rel) < 5 * 1.04 / (m**0.5)

    def test_alpha_constants(self):
        assert _HLL_ALPHA[16] == 0.673
        assert _HLL_ALPHA[64] == 0.709
        assert abs(_HLL_ALPHA[256] - 0.7182725932495458) < 1e-15
