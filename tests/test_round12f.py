"""Round-12 batch 4: independent replays for integer HITS, the
quantity-weighted price quartiles, the zone-map skip audit, and RAKE
keyword extraction."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


class TestHitsLite:
    def test_python_replay(self, spark):
        o = {
            r["o_orderkey"]: r["o_custkey"]
            for r in load(spark, SF_DIR, "orders")
            .select("o_orderkey", "o_custkey")
            .collect()
        }
        edges = {
            (o[r["l_orderkey"]], r["l_partkey"])
            for r in load(spark, SF_DIR, "lineitem")
            .select("l_orderkey", "l_partkey")
            .collect()
        }
        a1: Counter = Counter()
        for _, p in edges:
            a1[p] += 1
        h1: Counter = Counter()
        for c, p in edges:
            h1[c] += a1[p]
        a2: Counter = Counter()
        for c, p in edges:
            a2[p] += h1[c]
        got = catalog()["ext_hits_lite"].fn(spark, SF_DIR).collect()
        auth = {r["node_id"]: r for r in got if r["kind"] == "authority"}
        hubs = {r["node_id"]: r for r in got if r["kind"] == "hub"}
        assert len(auth) == 20 and len(hubs) == 20
        top_a = sorted(a2.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        top_h = sorted(h1.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        ta, th = sum(a2.values()), sum(h1.values())
        assert set(auth) == {p for p, _ in top_a}
        assert set(hubs) == {c for c, _ in top_h}
        for p, s in top_a:
            assert auth[p]["s"] == s
            assert abs(auth[p]["norm_score"] - s / ta) < 1e-15
        for c, s in top_h:
            assert hubs[c]["s"] == s
            assert abs(hubs[c]["norm_score"] - s / th) < 1e-15


class TestWeightedMedian:
    def test_python_replay(self, spark):
        rows = load(spark, SF_DIR, "lineitem").select(
            "l_returnflag", "l_linestatus", "l_extendedprice", "l_quantity"
        ).collect()
        groups: dict = defaultdict(list)
        for r in rows:
            cents = math.floor(r["l_extendedprice"] * 100 + 0.5)
            w = math.floor(r["l_quantity"] + 0.5)
            groups[(r["l_returnflag"], r["l_linestatus"])].append(
                (cents, w)
            )
        got = {
            (r["rf"], r["ls"]): r
            for r in catalog()["agg_weighted_median"].fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(groups)
        for key, items in groups.items():
            byc: Counter = Counter()
            for c, w in items:
                byc[c] += w
            total = sum(byc.values())
            cum, q = 0, {}
            for c in sorted(byc):
                cum += byc[c]
                if "p25" not in q and 4 * cum >= total:
                    q["p25"] = c
                if "p50" not in q and 2 * cum >= total:
                    q["p50"] = c
                if "p75" not in q and 4 * cum >= 3 * total:
                    q["p75"] = c
            g = got[key]
            assert g["n_items"] == len(items)
            assert g["total_weight"] == total
            assert abs(g["wp25"] - q["p25"] / 100) < 1e-9
            assert abs(g["weighted_median"] - q["p50"] / 100) < 1e-9
            assert abs(g["wp75"] - q["p75"] / 100) < 1e-9
            assert g["wp25"] <= g["weighted_median"] <= g["wp75"]


class TestZonemapSkipping:
    def test_invariants_and_replay(self, spark):
        got = catalog()["ext_zonemap_skipping"].fn(spark, SF_DIR).collect()
        by_layout: dict = defaultdict(list)
        for r in got:
            by_layout[r["layout"]].append(r)
            # conservativeness: a skipped file CANNOT contain matches
            if r["skipped"]:
                assert r["n_matching"] == 0
            assert r["min_date"] <= r["max_date"]
        assert set(by_layout) == {"insertion", "date_bucketed"}
        # insertion order: every file straddles the probe year -> 0 skips
        ins = by_layout["insertion"]
        assert all(not r["skipped"] for r in ins)
        assert ins[0]["layout_rows_skipped"] == 0
        # date-bucketed: the probe year touches at most 12 of 16 month
        # buckets -> at least 4 files skip, with consistent row totals
        db = by_layout["date_bucketed"]
        n_skipped = sum(1 for r in db if r["skipped"])
        assert n_skipped >= 4
        assert db[0]["layout_rows_skipped"] == sum(
            r["n_rows"] for r in db if r["skipped"]
        )
        # both layouts cover the same row total
        assert sum(r["n_rows"] for r in ins) == sum(
            r["n_rows"] for r in db
        )


class TestKeywordRake:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "documents")
            .select("doc_id", "text")
            .collect()
        )
        freq_all: Counter = Counter()
        for r in rows:
            freq_all.update(r["text"].split(" "))
        stop = {
            t
            for t, _ in sorted(
                freq_all.items(), key=lambda kv: (-kv[1], kv[0])
            )[:10]
        }
        phrases: list = []
        for r in rows:
            run: list = []
            for t in r["text"].split(" "):
                if t in stop:
                    if run:
                        phrases.append(tuple(run))
                    run = []
                else:
                    run.append(t)
            if run:
                phrases.append(tuple(run))
        freq: Counter = Counter()
        deg: Counter = Counter()
        for ph in phrases:
            for t in ph:
                freq[t] += 1
                deg[t] += len(ph)
        score_q = {
            t: math.floor(deg[t] / freq[t] * 1e9 + 0.5) for t in freq
        }
        agg: dict = {}
        for ph in phrases:
            s = sum(score_q[t] for t in ph)
            key = " ".join(ph)
            n, _, _ = agg.get(key, (0, 0, 0))
            agg[key] = (n + 1, len(ph), s)
        top = sorted(
            agg.items(), key=lambda kv: (-kv[1][2], kv[0])
        )[:20]
        got = catalog()["ext_keyword_rake"].fn(spark, SF_DIR).collect()
        assert [r["phrase"] for r in got] == [k for k, _ in top]
        for r, (k, (n, ln, s)) in zip(got, top):
            assert r["n_occurrences"] == n
            assert r["n_words"] == ln
            assert abs(r["rake_score"] - s / 1e9) < 1e-12
