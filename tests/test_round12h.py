"""Round-12 batch 6: replays for the tolerance as-of join, the dataset
card, the packing-efficiency sweep, and greedy max-coverage selection."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from billing_data_loader_spark.operators.joins import _ASOF_TOL_MICROS
from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


class TestAsofTolerance:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "events")
            .filter("event_type IN ('purchase', 'view')")
            .select("event_id", "user_id", "ts", "event_type")
            .collect()
        )
        views: dict = defaultdict(list)
        purchases = []
        for r in rows:
            if r["event_type"] == "view":
                views[r["user_id"]].append((r["ts"], r["event_id"]))
            else:
                purchases.append(r)
        got = {
            r["event_id"]: r
            for r in catalog()["join_asof_tolerance"].fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == {p["event_id"] for p in purchases}
        n_matched = n_out_of_tol = 0
        for p in purchases:
            cand = [
                (ts, vid)
                for ts, vid in views[p["user_id"]]
                if ts <= p["ts"]
            ]
            g = got[p["event_id"]]
            if not cand:
                assert not g["matched"]
                assert g["view_event_id"] is None
                continue
            ts, vid = max(cand)
            gap = int((p["ts"] - ts).total_seconds() * 1e6)
            if gap <= _ASOF_TOL_MICROS:
                n_matched += 1
                assert g["matched"]
                assert g["view_event_id"] == vid
                assert g["micros_since_view"] == gap
            else:
                n_out_of_tol += 1
                assert not g["matched"]
                assert g["view_event_id"] is None
                assert g["micros_since_view"] is None
        # the fixture must exercise BOTH branches or the tolerance is
        # untested
        assert n_matched > 0 and n_out_of_tol > 0


class TestDatasetCard:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "documents")
            .select("doc_id", "text", "lang", "source", "n_chars")
            .collect()
        )
        n = len(rows)
        langs = defaultdict(int)
        sources = set()
        texts = set()
        tokens = chars = 0
        for r in rows:
            langs[r["lang"]] += 1
            sources.add(r["source"])
            texts.add(hashlib.md5(r["text"].encode()).hexdigest())
            tokens += len(r["text"].split(" "))
            chars += r["n_chars"]
        got = {
            r["metric"]: r["value"]
            for r in catalog()["ext_dataset_card"].fn(spark, SF_DIR)
            .collect()
        }
        top = max(langs.values())
        expect = {
            "n_docs": n,
            "n_langs": len(langs),
            "n_sources": len(sources),
            "n_tokens": tokens,
            "n_chars": chars,
            "mean_tokens_per_doc": tokens / n,
            "exact_dup_rate": (n - len(texts)) / n,
            "top_lang_share": top / n,
        }
        assert set(got) == set(expect)
        for k, v in expect.items():
            assert abs(got[k] - v) < 1e-9, k


class TestPackEfficiency:
    def test_python_replay_and_monotone_waste(self, spark):
        rows = (
            load(spark, SF_DIR, "documents")
            .select("lang", "text")
            .collect()
        )
        totals: dict = defaultdict(int)
        for r in rows:
            totals[r["lang"]] += len(r["text"].split(" "))
        got = {
            (r["lang"], r["block_size"]): r
            for r in catalog()["ext_pack_efficiency_sweep"]
            .fn(spark, SF_DIR)
            .collect()
        }
        for lang, t in totals.items():
            for b in (128, 256, 512, 1024):
                g = got[(lang, b)]
                nb = (t + b - 1) // b
                assert g["total_tokens"] == t
                assert g["n_blocks"] == nb
                assert g["pad_tokens"] == nb * b - t
                assert abs(g["fill_efficiency"] - t / (nb * b)) < 1e-12
            # cross-doc packing wastes at most one partial block: pad
            # strictly below the block size
            assert all(
                got[(lang, b)]["pad_tokens"] < b
                for b in (128, 256, 512, 1024)
            )


class TestCoverageGreedy:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "documents")
            .select("doc_id", "text")
            .collect()
        )
        grams = {
            r["doc_id"]: {
                " ".join(r["text"].split(" ")[i: i + 3])
                for i in range(len(r["text"].split(" ")) - 2)
            }
            for r in rows
        }
        universe = set().union(*grams.values())
        covered: set = set()
        expect = []
        cum = 0
        for rnd in range(1, 5):
            best = max(
                grams,
                key=lambda d: (len(grams[d] - covered), -d),
            )
            gain = len(grams[best] - covered)
            covered |= grams[best]
            cum += gain
            expect.append((rnd, best, gain, cum, cum / len(universe)))
        got = sorted(
            catalog()["ext_coverage_gain_greedy"].fn(spark, SF_DIR)
            .collect(),
            key=lambda r: r["sel_round"],
        )
        assert len(got) == 4
        for g, (rnd, doc, gain, cum_c, frac) in zip(got, expect):
            assert g["sel_round"] == rnd
            assert g["doc_id"] == doc
            assert g["new_grams"] == gain
            assert g["cum_covered"] == cum_c
            assert abs(g["coverage_frac"] - frac) < 1e-12
        # marginal gains must be non-increasing (submodularity of the
        # greedy trace)
        gains = [g["new_grams"] for g in got]
        assert gains == sorted(gains, reverse=True)
