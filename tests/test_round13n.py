"""Round-13 deferred-bank batch 11 replays: interpolated Kneser-Ney
and the consistent-hash ring (with the migration-property pin)."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from billing_data_loader_spark.operators.corpus_hygiene import _KN_TOP
from billing_data_loader_spark.operators.extras import (
    _RING_REMOVED,
    _ring_positions,
)
from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


class TestKneserNey:
    def test_python_replay(self, spark):
        docs = load(spark, SF_DIR, "documents").select("text").collect()
        c = Counter()
        for r in docs:
            t = r["text"].split(" ")
            for v, w in zip(t, t[1:]):
                c[(v, w)] += 1
        c_v = Counter()
        n1_fwd = Counter()
        n1_bwd = Counter()
        for (v, w), n in c.items():
            c_v[v] += n
            n1_fwd[v] += 1
            n1_bwd[w] += 1
        b = len(c)
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:_KN_TOP]
        got = {
            (r["v"], r["w"]): r
            for r in catalog()["ext_lm_kneser_ney"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == {vw for vw, _ in top}
        for (v, w), cvw in top:
            g = got[(v, w)]
            num = (4 * cvw - 3) * b + 3 * n1_fwd[v] * n1_bwd[w]
            den = 4 * c_v[v] * b
            assert g["c_vw"] == cvw
            assert g["c_v"] == c_v[v]
            assert g["n1_fwd"] == n1_fwd[v]
            assert g["n1_bwd"] == n1_bwd[w]
            assert g["b_total"] == b
            assert g["p_kn_num"] == num
            assert g["p_kn_den"] == den
            assert g["p_kn"] == num / den
            assert g["p_mle"] == cvw / c_v[v]
            # the discount always pulls a seen bigram's probability
            # below its MLE unless the continuation mass repays it;
            # both stay proper probabilities
            assert 0.0 < g["p_kn"] < 1.0

    def test_kn_mass_identity(self, spark):
        """Per left-context v, summing P_KN over EVERY word of the
        vocabulary (seen or unseen after v) must give exactly 1 — the
        property that makes KN a distribution. Verified in exact
        integer arithmetic on the replayed counts."""
        docs = load(spark, SF_DIR, "documents").select("text").collect()
        c = Counter()
        for r in docs:
            t = r["text"].split(" ")
            for v, w in zip(t, t[1:]):
                c[(v, w)] += 1
        c_v = Counter()
        n1_fwd = Counter()
        n1_bwd = Counter()
        for (v, w), n in c.items():
            c_v[v] += n
            n1_fwd[v] += 1
            n1_bwd[w] += 1
        b = len(c)
        vocab = set(n1_bwd)  # every word that ever follows something
        # sum over the full continuation vocabulary for a sample of v
        for v in list(c_v)[:5]:
            num_sum = 0
            for w in vocab:
                cvw = c.get((v, w), 0)
                seen = (4 * cvw - 3) * b if cvw > 0 else 0
                num_sum += seen + 3 * n1_fwd[v] * n1_bwd[w]
            # sum of N1+(.w) over vocab == B, so the identity is exact
            assert num_sum == 4 * c_v[v] * b


class TestConsistentHashRing:
    def _assign(self, h, ring):
        for pos, node in ring:
            if pos >= h:
                return node
        return ring[0][1]

    def test_python_replay(self, spark):
        r8 = _ring_positions()
        r7 = _ring_positions(exclude=_RING_REMOVED)
        docs = load(spark, SF_DIR, "documents").select("doc_id").collect()
        n8 = Counter()
        n7 = Counter()
        gained = Counter()
        total = 0
        for r in docs:
            h = int(
                hashlib.md5(
                    f"{r['doc_id']}#ringkey".encode()
                ).hexdigest()[:15],
                16,
            )
            a8 = self._assign(h, r8)
            a7 = self._assign(h, r7)
            n8[a8] += 1
            n7[a7] += 1
            if a8 != a7:
                gained[a7] += 1
            total += 1
        got = {
            r["node"]: r
            for r in catalog()["ext_consistent_hash_ring"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(range(8))
        for node in range(8):
            g = got[node]
            assert g["n_keys"] == n8[node]
            assert g["share"] == n8[node] / total
            assert g["n_keys_after_removal"] == n7[node]
            assert g["n_gained"] == gained[node]

    def test_migration_property(self, spark):
        """The consistent-hashing contract: removing node 7 moves
        EXACTLY its keys (each to a surviving node) and nothing else."""
        rows = (
            catalog()["ext_consistent_hash_ring"]
            .fn(spark, SF_DIR)
            .collect()
        )
        by = {r["node"]: r for r in rows}
        removed = by[_RING_REMOVED]
        assert removed["n_keys_after_removal"] == 0
        assert removed["n_gained"] == 0
        # total moved == the removed node's prior load
        assert (
            sum(r["n_gained"] for r in rows) == removed["n_keys"]
        )
        # survivors never lose: after-load = before-load + gained
        for node, r in by.items():
            if node == _RING_REMOVED:
                continue
            assert (
                r["n_keys_after_removal"] == r["n_keys"] + r["n_gained"]
            )

    def test_ring_is_baked_and_sorted(self):
        r8 = _ring_positions()
        assert len(r8) == 64
        assert r8 == sorted(r8)
        assert len({p for p, _ in r8}) == 64  # no position collisions
