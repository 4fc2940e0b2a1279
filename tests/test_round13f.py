"""Round-13 deferred-bank batch 3 replays: equal-frequency binning,
smoothed target encoding, funnel conversion latency, and the
entity-resolution blocking audit."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


class TestQuantileBins:
    def test_python_replay(self, spark):
        rows = sorted(
            (math.floor(r["c_acctbal"] * 100 + 0.5), r["c_custkey"])
            for r in load(spark, SF_DIR, "customer")
            .select("c_custkey", "c_acctbal")
            .collect()
        )
        n = len(rows)
        bins = defaultdict(list)
        for i, (cents, _) in enumerate(rows):
            bins[10 * i // n].append(cents)
        got = {
            r["bin"]: r
            for r in catalog()["ext_quantile_bin_features"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(bins)
        for b, vals in bins.items():
            g = got[b]
            assert g["n_rows"] == len(vals)
            assert g["lo_cents"] == min(vals)
            assert g["hi_cents"] == max(vals)
            assert abs(g["bin_frac"] - len(vals) / n) < 1e-15
        # equal-frequency: bins differ by at most one row
        sizes = [g["n_rows"] for g in got.values()]
        assert max(sizes) - min(sizes) <= 1
        # edges are non-overlapping and ordered
        ordered = [got[b] for b in sorted(got)]
        for a, b in zip(ordered, ordered[1:]):
            assert a["hi_cents"] <= b["lo_cents"]


class TestTargetEncode:
    def test_python_replay_and_shrinkage(self, spark):
        spend = Counter()
        for r in (
            load(spark, SF_DIR, "orders")
            .select("o_custkey", "o_totalprice")
            .collect()
        ):
            spend[r["o_custkey"]] += math.floor(
                r["o_totalprice"] * 100 + 0.5
            )
        segs = defaultdict(list)
        for r in (
            load(spark, SF_DIR, "customer")
            .select("c_custkey", "c_mktsegment")
            .collect()
        ):
            segs[r["c_mktsegment"]].append(spend.get(r["c_custkey"], 0))
        gs = sum(sum(v) for v in segs.values())
        gn = sum(len(v) for v in segs.values())
        got = {
            r["segment"]: r
            for r in catalog()["ext_target_encode"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(segs)
        for s, vals in segs.items():
            g = got[s]
            n, cat_sum = len(vals), sum(vals)
            assert g["n"] == n
            assert g["cat_sum"] == cat_sum
            assert abs(g["raw_mean_cents"] - cat_sum / n) < 1e-9
            want = (cat_sum * gn + 10 * gs) / ((n + 10) * gn)
            assert abs(g["encoded_cents"] - want) < 1e-9
            # shrinkage: encoded sits strictly between raw and global
            # mean (or equals both when they coincide)
            lo, hi = sorted((cat_sum / n, gs / gn))
            assert lo - 1e-9 <= g["encoded_cents"] <= hi + 1e-9


class TestFunnelLatency:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "events")
            .selectExpr(
                "user_id", "event_type", "unix_micros(ts) AS us"
            )
            .collect()
        )
        signup = {}
        for r in rows:
            if r["event_type"] == "signup":
                u = r["user_id"]
                if u not in signup or r["us"] < signup[u]:
                    signup[u] = r["us"]
        purchase = {}
        for r in rows:
            u = r["user_id"]
            if (
                r["event_type"] == "purchase"
                and u in signup
                and r["us"] >= signup[u]
            ):
                if u not in purchase or r["us"] < purchase[u]:
                    purchase[u] = r["us"]
        days = defaultdict(list)  # day -> [(lat or None, user)]
        for u, su in signup.items():
            lat = purchase[u] - su if u in purchase else None
            days[su // 86_400_000_000].append((lat, u))
        got = {
            r["signup_day"]: r
            for r in catalog()["ext_funnel_latency"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(days)
        for d, entries in days.items():
            conv = sorted(
                (lat, u) for lat, u in entries if lat is not None
            )
            g = got[d]
            assert g["n_signups"] == len(entries)
            assert g["n_converted"] == len(conv)
            assert abs(
                g["conversion_rate"] - len(conv) / len(entries)
            ) < 1e-15
            if conv:
                lats = [l for l, _ in conv]
                assert g["min_lat_us"] == min(lats)
                assert g["max_lat_us"] == max(lats)
                assert g["med_lat_us"] == conv[(len(conv) + 1) // 2 - 1][0]
            else:
                assert g["min_lat_us"] is None


class TestErBlockingAudit:
    def test_python_replay(self, spark):
        from billing_data_loader_spark.operators.llm_pipeline import (
            _corpus_with_dups,
        )

        corpus = (
            _corpus_with_dups(spark, SF_DIR)
            .select("doc_id", "lang", "text")
            .collect()
        )
        gold = {
            (r["doc_a"], r["doc_b"])
            for r in catalog()["ext_neardup_jaccard"]
            .fn(spark, SF_DIR)
            .collect()
        }

        def keyf(strategy, text):
            t = text.split(" ")
            if strategy == "prefix4":
                return " ".join(t[:4])
            if strategy == "lenbucket":
                return str(len(t) // 16)
            return t[0] + "|" + t[-1]

        langs = Counter(r["lang"] for r in corpus)
        total_pairs = sum(n * (n - 1) // 2 for n in langs.values())
        doc_key = {}
        for r in corpus:
            for s in ("prefix4", "lenbucket", "firstlast"):
                doc_key[(s, r["doc_id"])] = (r["lang"], keyf(s, r["text"]))
        got = {
            r["strategy"]: r
            for r in catalog()["ext_er_blocking_audit"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == {"prefix4", "lenbucket", "firstlast"}
        for s in got:
            blocks = Counter(
                doc_key[(s, r["doc_id"])] for r in corpus
            )
            cand = sum(n * (n - 1) // 2 for n in blocks.values())
            cob = sum(
                1
                for a, b in gold
                if doc_key[(s, a)] == doc_key[(s, b)]
            )
            g = got[s]
            assert g["n_blocks"] == len(blocks)
            assert g["cand_pairs"] == cand
            assert abs(
                g["reduction_ratio"] - (1 - cand / total_pairs)
            ) < 1e-12
            assert g["n_gold"] == len(gold)
            assert g["gold_coblocked"] == cob
            assert abs(
                g["pair_completeness"] - (cob / len(gold) if gold else 1.0)
            ) < 1e-12
            assert g["gold_coblocked"] <= g["n_gold"]
