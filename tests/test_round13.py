"""Round-13 pre-build tests (branch r13-new-keys): independent replays
for the MinHash estimator audit, prefix-boilerplate groups, the language
confusability matrix, return latency quartiles, the symmetric set diff,
and weekday seasonal adjustment."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from billing_data_loader_spark.operators.llm_pipeline import _MEE_SEEDS
from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


def _shingles(text: str) -> set:
    t = text.split(" ")
    return {" ".join(t[i: i + 3]) for i in range(len(t) - 2)}


class TestMinhashEstError:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "documents")
            .select("doc_id", "text", "lang")
            .collect()
        )
        sh = {r["doc_id"]: (r["lang"], _shingles(r["text"])) for r in rows}

        def mh(grams, s):
            return min(
                int(
                    hashlib.md5(f"{g}#{s}".encode()).hexdigest()[:15], 16
                )
                for g in grams
            )

        got = {
            (r["doc_a"], r["doc_b"]): r
            for r in catalog()["ext_minhash_est_error"]
            .fn(spark, SF_DIR)
            .collect()
        }
        ids = sorted(sh)
        expect = {}
        for i, a in enumerate(ids):
            la, sa = sh[a]
            for b in ids[i + 1:]:
                lb, sb = sh[b]
                if la != lb or not (sa & sb):
                    continue
                j = len(sa & sb) / len(sa | sb)
                if j >= 0.6:
                    expect[(a, b)] = j
        assert set(got) == set(expect) and expect
        for (a, b), j in expect.items():
            g = got[(a, b)]
            assert abs(g["exact_j"] - j) < 1e-12
            matches = sum(
                1
                for s in range(_MEE_SEEDS)
                if mh(sh[a][1], s) == mh(sh[b][1], s)
            )
            assert g["n_seed_matches"] == matches
            assert abs(g["est_j"] - matches / _MEE_SEEDS) < 1e-15
            assert abs(g["abs_err"] - abs(g["est_j"] - g["exact_j"])) \
                < 1e-15
            # k=16 binomial: a >=0.6 pair missing ALL seeds is ~1e-7
            assert g["n_seed_matches"] > 0


class TestPrefixBoilerplate:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "documents")
            .select("doc_id", "text", "lang", "source")
            .collect()
        )
        groups: dict = defaultdict(list)
        for r in rows:
            pfx = " ".join(r["text"].split(" ")[:8])
            groups[(r["lang"], pfx)].append((r["doc_id"], r["source"]))
        expect = {k: v for k, v in groups.items() if len(v) >= 2}
        got = {
            (r["lang"], r["prefix"]): r
            for r in catalog()["ext_prefix_boilerplate"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(expect)
        for k, members in expect.items():
            g = got[k]
            assert g["n_docs"] == len(members)
            assert g["n_sources"] == len({s for _, s in members})
            assert g["min_doc_id"] == min(d for d, _ in members)
            assert g["doc_id_sum"] == sum(d for d, _ in members)


class TestLangConfusability:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "documents")
            .select("lang", "text")
            .collect()
        )
        freq: dict = defaultdict(Counter)
        for r in rows:
            freq[r["lang"]].update(r["text"].split(" "))
        sig = {
            lang: {
                t
                for t, _ in sorted(
                    c.items(), key=lambda kv: (-kv[1], kv[0])
                )[:50]
            }
            for lang, c in freq.items()
        }
        langs = sorted(sig)
        got = {
            (r["lang_a"], r["lang_b"]): r
            for r in catalog()["ext_lang_confusability"]
            .fn(spark, SF_DIR)
            .collect()
        }
        pairs = [
            (a, b) for i, a in enumerate(langs) for b in langs[i + 1:]
        ]
        assert set(got) == set(pairs)
        for a, b in pairs:
            ov = len(sig[a] & sig[b])
            g = got[(a, b)]
            assert g["n_shared"] == ov
            assert abs(g["signature_jaccard"] - ov / (100 - ov)) < 1e-12


class TestReturnLatency:
    def test_python_replay(self, spark):
        o = {
            r["o_orderkey"]: r["o_orderdate"]
            for r in load(spark, SF_DIR, "orders")
            .select("o_orderkey", "o_orderdate")
            .collect()
        }
        li = (
            load(spark, SF_DIR, "lineitem")
            .filter("l_returnflag = 'R'")
            .select("l_orderkey", "l_shipdate")
            .collect()
        )
        per_m: dict = defaultdict(list)
        for r in li:
            od = o[r["l_orderkey"]]
            mi = od.year * 12 + od.month - 1
            per_m[mi].append((r["l_shipdate"] - od).days)
        got = {
            r["ym"]: r
            for r in catalog()["bill_return_latency"].fn(spark, SF_DIR)
            .collect()
        }
        assert len(got) == len(per_m)
        for mi, days in per_m.items():
            ym = (mi // 12) * 100 + (mi % 12) + 1
            g = got[ym]
            days.sort()
            n = len(days)
            p50 = next(
                d
                for i, d in enumerate(days, 1)
                if 2 * i >= n or d == days[-1]
            )
            # replicate via cumulative-weight definition on value groups
            cum = 0
            q = {}
            for d in sorted(set(days)):
                cum += days.count(d)
                if "p50" not in q and 2 * cum >= n:
                    q["p50"] = d
                if "p90" not in q and 10 * cum >= 9 * n:
                    q["p90"] = d
            assert g["n_returns"] == n
            assert g["min_days"] == days[0]
            assert g["max_days"] == days[-1]
            assert g["p50_days"] == q["p50"]
            assert g["p90_days"] == q["p90"]
            assert p50 >= days[0]


class TestSymmetricDiff:
    def test_python_replay(self, spark):
        rows = load(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_orderdate", "o_custkey", "o_totalprice"
        ).collect()
        a = {r["o_orderkey"] for r in rows if r["o_orderdate"].year == 1995}
        b = {r["o_orderkey"] for r in rows if r["o_custkey"] % 2 == 0}
        got = catalog()["set_symmetric_diff"].fn(spark, SF_DIR).collect()
        ga = {r["o_orderkey"] for r in got if r["side"] == "a_only"}
        gb = {r["o_orderkey"] for r in got if r["side"] == "b_only"}
        assert ga == a - b
        assert gb == b - a
        assert len(got) == len(a ^ b)
        # both sides and the overlap must be non-trivial on the fixture
        assert a & b and a - b and b - a


class TestWeekdayAdjust:
    def test_python_replay(self, spark):
        import datetime

        rows = (
            load(spark, SF_DIR, "events")
            .select("ts", "value")
            .collect()
        )
        daily: dict = defaultdict(int)
        for r in rows:
            daily[r["ts"].date()] += math.floor(r["value"] * 100 + 0.5)
        epoch = datetime.date(1970, 1, 1)
        wsum: dict = defaultdict(int)
        wn: dict = defaultdict(int)
        for d, c in daily.items():
            k = (d - epoch).days % 7
            wsum[k] += c
            wn[k] += 1
        got = {
            r["day"]: r
            for r in catalog()["ts_weekday_adjust"].fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(daily)
        for d, c in daily.items():
            k = (d - epoch).days % 7
            g = got[d]
            assert g["weekday_idx"] == k
            exp = wsum[k] / (wn[k] * 100)
            assert abs(g["actual"] - c / 100) < 1e-9
            assert abs(g["weekday_expected"] - exp) < 1e-9
            assert abs(g["residual"] - (c / 100 - exp)) < 1e-9
            assert abs(g["seasonal_ratio"] - c * wn[k] / wsum[k]) < 1e-9


class TestAnnRecallCurve:
    def test_replay_off_helper_outputs(self, spark):
        exact = catalog()["ext_knn_cosine"].fn(spark, SF_DIR).collect()
        lsh = catalog()["ext_ann_lsh"].fn(spark, SF_DIR).collect()
        pqr = (
            catalog()["ext_ann_ivfpq_residual"].fn(spark, SF_DIR).collect()
        )

        def ranks(rows, key=lambda r: (-r["cos_sim"], r["vec_id"])):
            srt = sorted(rows, key=key)
            return {r["vec_id"]: i + 1 for i, r in enumerate(srt)}

        er = ranks(exact)
        by_method = {
            "lsh": ranks(lsh),
            "ivfpq_residual": ranks(
                pqr, key=lambda r: (r["approx_dist"], r["vec_id"])
            ),
        }
        got = {
            (r["method"], r["k"]): r
            for r in catalog()["ext_ann_recall_curve"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == {
            (m, k) for m in by_method for k in (1, 5, 10)
        }
        for method, ar in by_method.items():
            prev = -1
            for k in (1, 5, 10):
                hits = sum(
                    1
                    for v in set(er) & set(ar)
                    if max(er[v], ar[v]) <= k
                )
                g = got[(method, k)]
                assert g["n_hits"] == hits
                assert abs(g["recall_at_k"] - hits / k) < 1e-15
                assert 0.0 <= g["recall_at_k"] <= 1.0
                assert g["n_hits"] >= prev  # hits non-decreasing in k
                prev = g["n_hits"]


class TestEtaSquared:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "documents")
            .select("lang", "source", "text")
            .collect()
        )
        for fac in ("lang", "source"):
            g: dict = defaultdict(lambda: [0, 0, 0])
            for r in rows:
                nt = len(r["text"].split(" "))
                a = g[r[fac]]
                a[0] += 1
                a[1] += nt
                a[2] += nt * nt
            sb_q = sum(
                math.floor(s * s / n * 1e6 + 0.5) for n, s, _ in g.values()
            )
            n = sum(a[0] for a in g.values())
            s = sum(a[1] for a in g.values())
            q = sum(a[2] for a in g.values())
            eta = (sb_q / 1e6 - s * s / n) / (q - s * s / n)
            got = {
                r["factor"]: r
                for r in catalog()["prof_eta_squared"]
                .fn(spark, SF_DIR)
                .collect()
            }
            assert got[fac]["n_groups"] == len(g)
            assert abs(got[fac]["eta_squared"] - eta) < 1e-9
            assert -1e-9 <= got[fac]["eta_squared"] <= 1.0


class TestLengthDeciles:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "documents")
            .select("lang", "text")
            .collect()
        )
        per: dict = defaultdict(list)
        for r in rows:
            per[r["lang"]].append(len(r["text"].split(" ")))
        got = {
            r["lang"]: r
            for r in catalog()["prof_length_deciles"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(per)
        for lang, lens in per.items():
            lens.sort()
            n = len(lens)
            cum = 0
            q = {}
            for v in sorted(set(lens)):
                cum += lens.count(v)
                for name, a, b in (
                    ("p10_tokens", 10, 1),
                    ("p25_tokens", 4, 1),
                    ("p50_tokens", 2, 1),
                    ("p75_tokens", 4, 3),
                    ("p90_tokens", 10, 9),
                ):
                    if name not in q and a * cum >= b * n:
                        q[name] = v
            g = got[lang]
            assert g["n_docs"] == n
            for name, v in q.items():
                assert g[name] == v
            assert (
                g["p10_tokens"] <= g["p25_tokens"] <= g["p50_tokens"]
                <= g["p75_tokens"] <= g["p90_tokens"]
            )


class TestShardSkewSweep:
    def test_python_replay(self, spark):
        ids = [
            r["doc_id"]
            for r in load(spark, SF_DIR, "documents")
            .select("doc_id")
            .collect()
        ]
        got = {
            r["n_shards"]: r
            for r in catalog()["ext_shard_skew_sweep"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == {8, 16, 32}
        for n in (8, 16, 32):
            counts = Counter(
                int(
                    hashlib.md5(
                        f"{d}:bdl-shard-skew".encode()
                    ).hexdigest()[:8],
                    16,
                )
                % n
                for d in ids
            )
            sizes = [counts.get(sh, 0) for sh in range(n)]
            g = got[n]
            assert g["n_total"] == len(ids)
            assert g["max_docs"] == max(sizes)
            assert g["min_docs"] == min(sizes)
            assert abs(
                g["max_skew_ratio"] - max(sizes) * n / len(ids)
            ) < 1e-12
            tot = len(ids)
            rv = (n * sum(c * c for c in sizes) - tot * tot) / (tot * tot)
            assert abs(g["rel_variance"] - rv) < 1e-12
            assert g["max_skew_ratio"] >= 1.0
