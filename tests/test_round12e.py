"""Round-12 batch 3: independent replays for embedding anisotropy (the
sum-vector identity vs brute-force pairwise cosine), split leakage (pair
set vs brute-force shingle Jaccard + hashlib split assignment),
inclusion dependencies (set-containment replay, both verdicts present),
and the discount-depth profile (conservation pins)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import numpy as np

from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


class TestAnisotropy:
    def test_bruteforce_pairwise_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "embeddings")
            .select("vec_id", "label", "embedding")
            .collect()
        )
        by_label: dict = defaultdict(list)
        for r in rows:
            e = np.floor(
                np.asarray(r["embedding"], dtype=np.float64) * 1e6 + 0.5
            )
            u = np.floor(e / math.sqrt(float((e * e).sum())) * 1e6 + 0.5)
            by_label[r["label"]].append(u)
        got = {
            r["label"]: r
            for r in catalog()["ext_embedding_anisotropy"]
            .fn(spark, SF_DIR)
            .collect()
        }

        def mean_cos(vecs):
            m = np.stack(vecs)
            s = m.sum(axis=0)
            n = len(vecs)
            return (float(s @ s) - float((m * m).sum())) / (
                n * (n - 1) * 1e12
            )

        allv = [v for vs in by_label.values() for v in vs]
        assert set(got) == set(by_label) | {-1}
        for label, vecs in by_label.items():
            assert got[label]["n"] == len(vecs)
            assert abs(
                got[label]["mean_pairwise_cosine"] - mean_cos(vecs)
            ) < 1e-9
        assert got[-1]["n"] == len(allv)
        assert abs(got[-1]["mean_pairwise_cosine"] - mean_cos(allv)) < 1e-9
        # identity sanity: brute-force O(n^2) mean over one label equals
        # the sum-vector form (exact integer arithmetic both ways)
        label, vecs = next(iter(by_label.items()))
        m = np.stack(vecs)
        gram = m @ m.T
        n = len(vecs)
        brute = (gram.sum() - np.trace(gram)) / (n * (n - 1) * 1e12)
        assert abs(brute - mean_cos(vecs)) < 1e-9


def _split_of(doc_id: int) -> str:
    h = hashlib.md5(f"{doc_id}:bdl-split-7".encode()).hexdigest()[0]
    return "train" if h < "c" else ("val" if h < "e" else "test")


class TestSplitLeakage:
    def test_bruteforce_pair_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "documents")
            .select("doc_id", "text", "lang")
            .collect()
        )
        sh = {
            r["doc_id"]: (
                r["lang"],
                {
                    " ".join(r["text"].split(" ")[i: i + 3])
                    for i in range(len(r["text"].split(" ")) - 2)
                },
            )
            for r in rows
        }
        ids = sorted(sh)
        expect = {}
        for i, a in enumerate(ids):
            la, sa = sh[a]
            for b in ids[i + 1:]:
                lb, sb = sh[b]
                if la != lb:
                    continue
                inter = len(sa & sb)
                if inter == 0:
                    continue
                j = inter / (len(sa) + len(sb) - inter)
                if j >= 0.6:
                    expect[(a, b)] = j
        got = {
            (r["doc_a"], r["doc_b"]): r
            for r in catalog()["ext_split_leakage"].fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(expect)
        assert expect, "fixture lost its planted >=0.6 pairs"
        leaks = 0
        for (a, b), r in got.items():
            assert abs(r["jaccard"] - expect[(a, b)]) < 1e-12
            assert r["split_a"] == _split_of(a)
            assert r["split_b"] == _split_of(b)
            assert r["is_leak"] == (_split_of(a) != _split_of(b))
            leaks += r["is_leak"]
        assert leaks > 0, "fixture has no cross-split pair to exercise"


class TestInclusionDependency:
    def test_set_containment_replay(self, spark):
        got = {
            (r["lhs"], r["rhs"]): r
            for r in catalog()["prof_inclusion_dependency"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert len(got) == 8
        # replay two real and one decoy candidate from raw rows
        custkeys = {
            r["c_custkey"]
            for r in load(spark, SF_DIR, "customer")
            .select("c_custkey")
            .collect()
        }
        o_cust = {
            r["o_custkey"]
            for r in load(spark, SF_DIR, "orders")
            .select("o_custkey")
            .collect()
        }
        r1 = got[("orders.o_custkey", "customer.c_custkey")]
        assert r1["n_lhs_distinct"] == len(o_cust)
        assert r1["n_violations"] == len(o_cust - custkeys)
        r2 = got[("customer.c_custkey", "orders.o_custkey")]
        assert r2["n_violations"] == len(custkeys - o_cust)
        assert r2["holds"] == (len(custkeys - o_cust) == 0)
        verdicts = {r["holds"] for r in got.values()}
        assert verdicts == {True, False}, (
            "candidate set must exercise both verdicts"
        )


class TestDiscountImpact:
    def test_conservation_and_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "lineitem")
            .select("l_discount", "l_extendedprice", "l_quantity")
            .collect()
        )
        agg: dict = defaultdict(lambda: [0, 0, 0, 0])
        for r in rows:
            pct = math.floor(r["l_discount"] * 100 + 0.5)
            a = agg[pct]
            a[0] += 1
            a[1] += math.floor(r["l_extendedprice"] * 100 + 0.5)
            a[2] += math.floor(
                r["l_extendedprice"] * (1.0 - r["l_discount"]) * 1e4 + 0.5
            )
            a[3] += math.floor(r["l_quantity"] * 100 + 0.5)
        got = {
            r["disc_pct"]: r
            for r in catalog()["bill_discount_impact"].fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(agg)
        total = sum(a[0] for a in agg.values())
        share_sum = 0.0
        for pct, (n, gross_c, net_q, qty_c) in agg.items():
            g = got[pct]
            assert g["n_items"] == n
            assert abs(g["gross"] - gross_c / 100) < 1e-9
            assert abs(g["net"] - net_q / 1e4) < 1e-9
            assert abs(
                g["discount_given"] - (gross_c / 100 - net_q / 1e4)
            ) < 1e-9
            assert abs(g["qty_sum"] - qty_c / 100) < 1e-9
            assert abs(g["item_share"] - n / total) < 1e-12
            assert 0.0 <= g["effective_rate"] <= 0.11
            share_sum += g["item_share"]
        assert abs(share_sum - 1.0) < 1e-9
        # zero-discount bucket must realize a zero effective rate
        assert abs(got[0]["effective_rate"]) < 1e-6
