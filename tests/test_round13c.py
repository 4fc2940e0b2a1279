"""Round-13 deferred-bank replay tests: retrieval eval (NDCG / AP /
McNemar), distribution profiling (KS / Cramer's V / IQR fences), soft
dedup weighting, cross-source overlap, Theil-Sen trend, and the lateral
top-k SQL surface. Each test recomputes the operator's result in plain
Python off the fixture and compares exactly (the house replay
discipline — independent of both engines' SQL)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    return num / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    )


def _ranked_rel(spark):
    """(rank -> rel) for the exact top-10 of query vec 0, plus corpus
    positive count — the shared scaffold of the NDCG and AP tests."""
    rows = load(spark, SF_DIR, "embeddings").collect()
    q = next(r for r in rows if r["vec_id"] == 0)
    qv = [float(x) for x in q["embedding"]]
    scored = sorted(
        (
            (-_cos([float(x) for x in r["embedding"]], qv), r["vec_id"],
             r["label"])
            for r in rows
            if r["vec_id"] != 0
        ),
    )[:10]
    rel = {
        i + 1: (1 if lab == q["label"] else 0)
        for i, (_, _, lab) in enumerate(scored)
    }
    n_rel = sum(
        1 for r in rows if r["vec_id"] != 0 and r["label"] == q["label"]
    )
    return rel, n_rel


class TestNdcgEval:
    def test_python_replay(self, spark):
        rel, n_rel = _ranked_rel(spark)
        disc = [round(1e9 / math.log2(r + 1)) for r in range(1, 11)]
        got = {
            r["k"]: r
            for r in catalog()["ext_ndcg_eval"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == {1, 5, 10}
        for k in (1, 5, 10):
            dcg = sum(rel[r] * disc[r - 1] for r in range(1, k + 1))
            m = min(k, n_rel)
            idcg = sum(disc[:m])
            g = got[k]
            assert g["n_rel"] == n_rel
            assert g["n_rel_topk"] == sum(rel[r] for r in range(1, k + 1))
            assert g["dcg_q"] == dcg
            assert g["idcg_q"] == idcg
            assert abs(g["ndcg"] - (dcg / idcg if idcg else 0.0)) < 1e-15
            assert 0.0 <= g["ndcg"] <= 1.0


class TestAvgPrecision:
    def test_python_replay(self, spark):
        rel, n_rel = _ranked_rel(spark)
        got = {
            r["k"]: r
            for r in catalog()["ext_avg_precision"]
            .fn(spark, SF_DIR)
            .collect()
        }
        for k in (1, 5, 10):
            cum = 0
            ap_num = 0
            for r in range(1, k + 1):
                cum += rel[r]
                if rel[r]:
                    ap_num += cum * 1_000_000_000 // r
            m = min(k, n_rel)
            g = got[k]
            assert g["n_hits"] == cum
            assert abs(g["avg_precision"] - ap_num / (m * 1e9)) < 1e-15
            assert abs(g["precision_at_k"] - cum / k) < 1e-15
            assert abs(g["recall_at_k"] - cum / n_rel) < 1e-15
            # AP@k can never exceed precision-ideal 1.0
            assert 0.0 <= g["avg_precision"] <= 1.0


class TestMcnemar:
    def test_cells_partition_and_statistic(self, spark):
        got = catalog()["ext_mcnemar_test"].fn(spark, SF_DIR).collect()
        assert len(got) == 1
        g = got[0]
        assert (
            g["both_right"] + g["both_wrong"] + g["only_a"] + g["only_b"]
            == g["n"]
        )
        b, c = g["only_a"], g["only_b"]
        want = (
            (max(abs(b - c) - 1, 0) ** 2) / (b + c) if b + c else 0.0
        )
        assert abs(g["mcnemar_chi2"] - want) < 1e-12
        # the discordant cells must agree with the two helpers replayed
        docs = {
            r["doc_id"]: r["lang"]
            for r in load(spark, SF_DIR, "documents")
            .select("doc_id", "lang")
            .collect()
        }
        preda = {
            r["doc_id"]: r["pred_keep"]
            for r in catalog()["ext_quality_classifier"]
            .fn(spark, SF_DIR)
            .select("doc_id", "pred_keep")
            .collect()
        }
        predb = {
            r["doc_id"]: r["pred_lang"] == "en"
            for r in catalog()["ext_lang_id"].fn(spark, SF_DIR).collect()
        }
        only_a = sum(
            1
            for d, lang in docs.items()
            if (preda[d] == (lang == "en")) and (predb[d] != (lang == "en"))
        )
        assert g["only_a"] == only_a


class TestKsTest:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "orders")
            .select("o_orderpriority", "o_totalprice")
            .collect()
        )
        a = sorted(
            math.floor(r["o_totalprice"] * 100 + 0.5)
            for r in rows
            if r["o_orderpriority"] == "1-URGENT"
        )
        b = sorted(
            math.floor(r["o_totalprice"] * 100 + 0.5)
            for r in rows
            if r["o_orderpriority"] == "5-LOW"
        )
        n1, n2 = len(a), len(b)
        ca = Counter(a)
        cb = Counter(b)
        cum_a = cum_b = 0
        best = (-1, None)
        for v in sorted(set(a) | set(b)):
            cum_a += ca.get(v, 0)
            cum_b += cb.get(v, 0)
            gap = abs(cum_a * n2 - cum_b * n1)
            if gap > best[0]:
                best = (gap, v)
        got = catalog()["prof_ks_test"].fn(spark, SF_DIR).collect()
        assert len(got) == 1
        g = got[0]
        assert (g["n1"], g["n2"]) == (n1, n2)
        assert g["d_num"] == best[0]
        assert g["at_cents"] == best[1]
        assert abs(g["d_stat"] - best[0] / (n1 * n2)) < 1e-15
        assert 0.0 <= g["d_stat"] <= 1.0


class TestCramersV:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "documents")
            .select("lang", "source")
            .collect()
        )
        obs = Counter((r["lang"], r["source"]) for r in rows)
        langs = sorted({k[0] for k in obs})
        srcs = sorted({k[1] for k in obs})
        n = len(rows)
        row_t = Counter(r["lang"] for r in rows)
        col_t = Counter(r["source"] for r in rows)
        chi2_q = 0
        for lg in langs:
            for s in srcs:
                o = obs.get((lg, s), 0)
                num = o * n - row_t[lg] * col_t[s]
                term = (float(num) * float(num)) / float(
                    row_t[lg] * col_t[s] * n
                )
                chi2_q += math.floor(term * 1e9 + 0.5)
        got = catalog()["prof_cramers_v"].fn(spark, SF_DIR).collect()
        assert len(got) == 1
        g = got[0]
        assert g["n"] == n
        assert (g["n_langs"], g["n_sources"]) == (len(langs), len(srcs))
        assert g["dof"] == (len(langs) - 1) * (len(srcs) - 1)
        assert abs(g["chi2"] - chi2_q / 1e9) < 1e-12
        want_v = math.sqrt(
            (chi2_q / 1e9) / (n * min(len(langs) - 1, len(srcs) - 1))
        )
        assert abs(g["cramers_v"] - want_v) < 1e-12
        assert 0.0 <= g["cramers_v"] <= 1.0


class TestOutlierIqr:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "customer")
            .select("c_mktsegment", "c_acctbal")
            .collect()
        )
        seg = defaultdict(list)
        for r in rows:
            seg[r["c_mktsegment"]].append(
                math.floor(r["c_acctbal"] * 100 + 0.5)
            )
        got = {
            r["segment"]: r
            for r in catalog()["prof_outlier_iqr"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(seg)
        for s, vals in seg.items():
            vals.sort()
            n = len(vals)
            q1 = vals[(n + 3) // 4 - 1]
            q3 = vals[(3 * n + 3) // 4 - 1]
            n_low = sum(1 for v in vals if 2 * v < 5 * q1 - 3 * q3)
            n_high = sum(1 for v in vals if 2 * v > 5 * q3 - 3 * q1)
            g = got[s]
            assert g["n"] == n
            assert g["q1_cents"] == q1
            assert g["q3_cents"] == q3
            assert g["iqr_cents"] == q3 - q1
            assert (g["n_low"], g["n_high"]) == (n_low, n_high)
            assert abs(g["outlier_frac"] - (n_low + n_high) / n) < 1e-15


class TestDedupSoftWeight:
    def test_mass_conservation_and_flags(self, spark):
        rows = (
            load(spark, SF_DIR, "documents")
            .select("doc_id", "text")
            .collect()
        )
        by_text = defaultdict(list)
        for r in rows:
            by_text[r["text"]].append(r["doc_id"])
        got = {
            r["doc_id"]: r
            for r in catalog()["ext_dedup_soft_weight"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == {r["doc_id"] for r in rows}
        for text, ids in by_text.items():
            for d in ids:
                g = got[d]
                assert g["cluster_size"] == len(ids)
                assert abs(g["weight"] - 1 / len(ids)) < 1e-15
                assert g["is_canonical"] == (d == min(ids))
        # total sampling mass == number of DISTINCT texts
        total = sum(g["weight"] for g in got.values())
        assert abs(total - len(by_text)) < 1e-9


class TestCrossSourceOverlap:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "documents")
            .select("source", "text")
            .collect()
        )
        grams = defaultdict(set)
        for r in rows:
            t = r["text"].split(" ")
            for i in range(len(t) - 2):
                grams[r["source"]].add(" ".join(t[i : i + 3]))
        got = {
            (r["src_a"], r["src_b"]): r
            for r in catalog()["ext_cross_source_overlap"]
            .fn(spark, SF_DIR)
            .collect()
        }
        want = {}
        for a in grams:
            for b in grams:
                if a < b:
                    inter = len(grams[a] & grams[b])
                    if inter:
                        want[(a, b)] = inter
        assert set(got) == set(want)
        for (a, b), inter in want.items():
            g = got[(a, b)]
            assert g["n_common"] == inter
            assert g["n_a"] == len(grams[a])
            assert g["n_b"] == len(grams[b])
            assert abs(g["containment_a"] - inter / len(grams[a])) < 1e-15
            union = len(grams[a] | grams[b])
            assert abs(g["jaccard"] - inter / union) < 1e-15


class TestTheilSen:
    def test_python_replay(self, spark):
        rows = load(spark, SF_DIR, "events").selectExpr(
            "event_type", "CAST(to_date(ts) AS STRING) AS d"
        ).collect()
        import datetime as dt

        daily = defaultdict(Counter)
        for r in rows:
            day = (
                dt.date.fromisoformat(r["d"]) - dt.date(1970, 1, 1)
            ).days
            daily[r["event_type"]][day] += 1
        got = {
            r["event_type"]: r
            for r in catalog()["ts_theil_sen"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(daily)
        for et, cnts in daily.items():
            days = sorted(cnts)
            qs = sorted(
                math.floor(
                    1e9 * (cnts[d2] - cnts[d1]) / (d2 - d1) + 0.5
                )
                for i, d1 in enumerate(days)
                for d2 in days[i + 1 :]
            )
            n_pairs = len(qs)
            med = qs[(n_pairs + 1) // 2 - 1]
            g = got[et]
            assert g["n_days"] == len(days)
            assert g["n_pairs"] == n_pairs
            assert abs(g["sen_slope"] - med / 1e9) < 1e-15


class TestLateralTopk:
    def test_matches_window_form(self, spark):
        cust = (
            load(spark, SF_DIR, "customer")
            .select("c_custkey", "c_nationkey", "c_acctbal")
            .collect()
        )
        nations = {
            r["n_nationkey"]: r["n_name"]
            for r in load(spark, SF_DIR, "nation").collect()
        }
        per_nation = defaultdict(list)
        for r in cust:
            per_nation[r["c_nationkey"]].append(
                (-r["c_acctbal"], r["c_custkey"])
            )
        want = set()
        for nk, rows_ in per_nation.items():
            for negbal, ck in sorted(rows_)[:2]:
                want.add((nations[nk], ck, -negbal))
        got = {
            (r["n_name"], r["c_custkey"], r["c_acctbal"])
            for r in catalog()["join_lateral_topk"].fn(spark, SF_DIR).collect()
        }
        assert got == want
