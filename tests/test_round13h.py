"""Round-13 deferred-bank batch 5 replays: retrieval MRR, the
classifier gains/lift table, and the Spearman rank-correlation profile.

Each test recomputes the operator's full result independently in plain
Python (hashlib / sequential-fold floats / integer midranks) and
compares — the oracle-independent second witness the shared-text SQL
cannot provide (the r11 LEAST/GREATEST lesson).
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from billing_data_loader_spark.operators.model_eval import (
    _LIFT_N_BINS,
    _MRR_RECIP,
)
from billing_data_loader_spark.operators.text_analysis import (
    _QCLS_BUCKETS,
    _QCLS_KNUTH,
)
from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


def _seq_cos(x, y):
    """The knn-graph sequential left-fold cosine — the exact IEEE
    operation order the operator pins (ann.py), replayed in Python."""
    dot = nx = ny = 0.0
    for a, b in zip(x, y):
        dot += a * b
        nx += a * a
        ny += b * b
    return dot / ((nx**0.5) * (ny**0.5))


class TestMrrEval:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "embeddings")
            .select("vec_id", "embedding", "label")
            .collect()
        )
        vecs = {
            r["vec_id"]: [float(v) for v in r["embedding"]] for r in rows
        }
        labels = {r["vec_id"]: int(r["label"]) for r in rows}
        ids = sorted(vecs)
        per_label = defaultdict(lambda: [0, 0, 0])  # n, hit, sum_rr
        for q in ids:
            scored = sorted(
                ((-_seq_cos(vecs[q], vecs[c]), c) for c in ids if c != q),
            )[:3]
            rr = 0
            for rnk, (_, c) in enumerate(scored, start=1):
                if labels[c] == labels[q]:
                    rr = _MRR_RECIP[rnk - 1]
                    break
            s = per_label[labels[q]]
            s[0] += 1
            s[1] += 1 if rr > 0 else 0
            s[2] += rr
        got = {
            r["label"]: r
            for r in catalog()["ext_mrr_eval"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(per_label)
        for lab, (n, hit, srr) in per_label.items():
            g = got[lab]
            assert g["n_queries"] == n
            assert g["n_hit"] == hit
            assert g["sum_rr_scaled"] == srr
            assert g["mrr_at_3"] == srr / (n * 1e9)
            assert g["hit_rate_at_3"] == hit / n

    def test_reciprocals_are_baked(self):
        assert _MRR_RECIP == tuple(round(1e9 / r) for r in (1, 2, 3))


def _w_sum(text: str) -> int:
    s = 0
    for tok in text.split(" "):
        h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
        s += (h % _QCLS_BUCKETS * _QCLS_KNUTH) % 2001 - 1000
    return s


class TestLiftGain:
    def test_python_replay(self, spark):
        docs = (
            load(spark, SF_DIR, "documents")
            .select("doc_id", "text", "lang")
            .collect()
        )
        scored = sorted(
            (-_w_sum(r["text"]), r["doc_id"], 1 if r["lang"] == "en" else 0)
            for r in docs
        )
        n = len(scored)
        per = defaultdict(lambda: [0, 0])  # n_rows, n_pos
        for i, (_, _, y) in enumerate(scored):
            d = (_LIFT_N_BINS * i) // n
            per[d][0] += 1
            per[d][1] += y
        total_pos = sum(p for _, p in per.values())
        got = {
            r["decile"]: r
            for r in catalog()["ext_lift_gain"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(per)
        cum_n = cum_pos = 0
        for d in sorted(per):
            cum_n += per[d][0]
            cum_pos += per[d][1]
            g = got[d]
            assert g["n_rows"] == per[d][0]
            assert g["n_pos"] == per[d][1]
            assert g["cum_n"] == cum_n
            assert g["cum_pos"] == cum_pos
            assert g["total_pos"] == total_pos
            assert g["cum_gain"] == cum_pos / total_pos
            assert g["cum_lift"] == (cum_pos * n) / (cum_n * total_pos)
        # equal-frequency: deciles differ by at most one row, and the
        # final cumulative gain is exactly 1
        sizes = [per[d][0] for d in sorted(per)]
        assert max(sizes) - min(sizes) <= 1
        assert got[max(per)]["cum_gain"] == 1.0


def _midranks_doubled(vals):
    """2*average-rank per value (ties to midrank), as exact integers."""
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    out = [0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and vals[order[j]] == vals[order[i]]:
            j += 1
        # positions i..j-1 (0-based) share doubled midrank (i+1) + j
        dm = (i + 1) + j
        for k in range(i, j):
            out[order[k]] = dm
        i = j
    return out


class TestSpearmanCorr:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "lineitem")
            .select(
                "l_returnflag",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
            )
            .collect()
        )
        q = lambda x: math.floor(x * 100 + 0.5)  # noqa: E731
        by_grp = defaultdict(list)
        for r in rows:
            by_grp[r["l_returnflag"]].append(
                (
                    q(r["l_quantity"]),
                    q(r["l_extendedprice"]),
                    q(r["l_discount"]),
                    q(r["l_tax"]),
                )
            )
        want = {}
        for grp, data in by_grp.items():
            n = len(data)
            cols = list(zip(*data))
            dr = [_midranks_doubled(c) for c in cols]
            for pair, (ix, iy) in (
                ("qty_vs_price", (0, 1)),
                ("disc_vs_tax", (2, 3)),
            ):
                dx = [r - (n + 1) for r in dr[ix]]
                dy = [r - (n + 1) for r in dr[iy]]
                sxy = sum(a * b for a, b in zip(dx, dy))
                sxx = sum(a * a for a in dx)
                syy = sum(b * b for b in dy)
                rho = (
                    0.0
                    if sxx == 0 or syy == 0
                    else float(sxy) / math.sqrt(float(sxx) * float(syy))
                )
                want[(grp, pair)] = (n, sxy, sxx, syy, rho)
        got = {
            (r["l_returnflag"], r["pair"]): r
            for r in catalog()["prof_spearman_corr"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(want)
        for key, (n, sxy, sxx, syy, rho) in want.items():
            g = got[key]
            assert g["n"] == n
            assert g["sxy"] == sxy
            assert g["sxx"] == sxx
            assert g["syy"] == syy
            assert g["spearman_rho"] == rho
        # this fixture's columns are mutually independent draws, so both
        # pairs read near-zero — the profile's "healthy drop" baseline
        # (a real TPC-H price would rank with quantity; the operator's
        # job is flagging when a pair moves off its baseline)
        for key in want:
            assert abs(got[key]["spearman_rho"]) < 0.1

    def test_midrank_identity_small(self):
        # ties get the midrank: [10, 20, 20, 30] -> avg ranks 1, 2.5, 2.5, 4
        assert _midranks_doubled([10, 20, 20, 30]) == [2, 5, 5, 8]
