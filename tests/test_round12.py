"""Round-12 pre-build tests (branch r12-new-keys): independent replays
for the n-gram novelty audit, the confusion matrix, the mutual-information
profile, the Zipf fit, and monthly churn."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


def _split_of(doc_id: int) -> str:
    h = hashlib.md5(f"{doc_id}:bdl-split-7".encode()).hexdigest()[0]
    if h < "c":
        return "train"
    if h < "e":
        return "val"
    return "test"


def _shingles(text: str) -> list[str]:
    t = text.split(" ")
    return [" ".join(t[i : i + 3]) for i in range(len(t) - 2)]


class TestNgramNovelty:
    def test_python_replay(self, spark):
        docs = (
            load(spark, SF_DIR, "documents")
            .select("doc_id", "text", "lang")
            .collect()
        )
        train_types: dict[str, set] = defaultdict(set)
        val_grams: dict[str, list] = defaultdict(list)
        for r in docs:
            s = _split_of(r["doc_id"])
            if s == "train":
                train_types[r["lang"]].update(_shingles(r["text"]))
            elif s == "val":
                val_grams[r["lang"]].extend(_shingles(r["text"]))

        got = {
            r["lang"]: r
            for r in catalog()["ext_ngram_novelty"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == {k for k, v in val_grams.items() if v}
        for lang, grams in val_grams.items():
            if not grams:
                continue
            novel = [g for g in grams if g not in train_types[lang]]
            types = set(grams)
            novel_types = {g for g in types if g not in train_types[lang]}
            g = got[lang]
            assert g["n_val_instances"] == len(grams)
            assert g["n_novel_instances"] == len(novel)
            assert g["n_val_types"] == len(types)
            assert g["n_novel_types"] == len(novel_types)
            assert abs(g["instance_novelty"] - len(novel) / len(grams)) < 1e-12
            assert abs(g["type_novelty"] - len(novel_types) / len(types)) < 1e-12


class TestConfusionMatrix:
    def test_python_replay(self, spark):
        cls_rows = (
            catalog()["ext_quality_classifier"].fn(spark, SF_DIR).collect()
        )
        lang = {
            r["doc_id"]: r["lang"]
            for r in load(spark, SF_DIR, "documents")
            .select("doc_id", "lang")
            .collect()
        }
        cells = Counter()
        for r in cls_rows:
            cells[(r["w_sum"] > 0, lang[r["doc_id"]] == "en")] += 1
        tp = cells[(True, True)]
        fp = cells[(True, False)]
        fn = cells[(False, True)]
        tn = cells[(False, False)]
        total = tp + fp + fn + tn

        got = {
            (r["pred_keep"], r["actual_en"]): r
            for r in catalog()["ext_confusion_matrix"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == {k for k, v in cells.items() if v}
        for key, n in cells.items():
            if not n:
                continue
            g = got[key]
            assert g["n"] == n
            assert abs(g["cell_share"] - n / total) < 1e-12
            assert abs(g["precision_keep"] - tp / (tp + fp)) < 1e-12
            assert abs(g["recall_keep"] - tp / (tp + fn)) < 1e-12
            assert abs(g["f1_keep"] - 2 * tp / (2 * tp + fp + fn)) < 1e-12
            assert abs(g["accuracy"] - (tp + tn) / total) < 1e-12


class TestMutualInfo:
    def test_python_replay_and_bounds(self, spark):
        docs = (
            load(spark, SF_DIR, "documents")
            .select("lang", "source")
            .collect()
        )
        nxy = Counter((r["lang"], r["source"]) for r in docs)
        nx = Counter(r["lang"] for r in docs)
        ny = Counter(r["source"] for r in docs)
        n = len(docs)
        mi = sum(
            (c / n) * math.log(n * c / (nx[x] * ny[y]))
            for (x, y), c in nxy.items()
        )
        hx = -sum((c / n) * math.log(c / n) for c in nx.values())
        hy = -sum((c / n) * math.log(c / n) for c in ny.values())

        rows = catalog()["prof_mutual_info"].fn(spark, SF_DIR).collect()
        got = {(r["lang"], r["source"]): r for r in rows}
        assert set(got) == set(nxy)
        any_row = rows[0]
        assert abs(any_row["mi"] - mi) < 1e-5
        assert abs(any_row["h_lang"] - hx) < 1e-5
        assert abs(any_row["h_source"] - hy) < 1e-5
        assert abs(any_row["nmi"] - mi / math.sqrt(hx * hy)) < 1e-5
        # information-theory bounds: 0 <= MI <= min(H); NMI in [0, 1]
        assert -1e-6 <= any_row["mi"] <= min(hx, hy) + 1e-6
        assert -1e-6 <= any_row["nmi"] <= 1 + 1e-6
        for (x, y), c in nxy.items():
            g = got[(x, y)]
            assert g["n_xy"] == c
            assert abs(g["p_xy"] - c / n) < 1e-12


class TestZipfFit:
    def test_numpy_replay(self, spark):
        import numpy as np

        docs = load(spark, SF_DIR, "documents").select("text").collect()
        freq = Counter()
        for r in docs:
            freq.update(r["text"].split(" "))
        top = sorted(freq.items(), key=lambda t: (-t[1], t[0]))[:200]
        # the operator's exact quantized moments
        lr = np.array(
            [math.floor(math.log(i + 1) * 1e6 + 0.5) for i in range(len(top))]
        )
        lf = np.array(
            [math.floor(math.log(f) * 1e6 + 0.5) for _, f in top]
        )
        nn = len(top)
        # Python ints: num**2 overflows numpy int64 (the operator computes
        # the ratio in doubles, exactly as mirrored below)
        sx, sy = int(lr.sum()), int(lf.sum())
        sxx = int((lr * lr).sum())
        sxy = int((lr * lf).sum())
        syy = int((lf * lf).sum())
        num, den = nn * sxy - sx * sy, nn * sxx - sx * sx
        slope = float(num) / float(den)
        intercept = (float(sy) - slope * float(sx)) / (nn * 1e6)
        r2 = (float(num) * float(num)) / (
            float(den) * float(nn * syy - sy * sy)
        )

        rows = catalog()["ext_zipf_fit"].fn(spark, SF_DIR).collect()
        assert len(rows) == 20
        by_rank = {r["rank"]: r for r in rows}
        for i in range(1, 21):
            assert by_rank[i]["token"] == top[i - 1][0]
            assert by_rank[i]["f"] == top[i - 1][1]
        g = rows[0]
        assert g["n_fit"] == nn
        assert abs(g["zipf_slope"] - slope) < 1e-5
        assert abs(g["intercept_ln"] - intercept) < 1e-5
        assert abs(g["r2"] - r2) < 1e-5
        # a frequency-ranked list always fits with negative slope; R2 in [0,1]
        assert g["zipf_slope"] < 0
        assert 0.0 <= g["r2"] <= 1.0


class TestChurnRate:
    def test_python_replay_and_identities(self, spark):
        orders = (
            load(spark, SF_DIR, "orders")
            .selectExpr(
                "o_custkey AS cust",
                "CAST(EXTRACT(year FROM o_orderdate) * 12"
                " + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS mi",
            )
            .collect()
        )
        active = {(r["cust"], r["mi"]) for r in orders}
        months = defaultdict(set)
        first = {}
        for cust, mi in active:
            months[mi].add(cust)
            if cust not in first or mi < first[cust]:
                first[cust] = mi
        max_mi = max(months)

        got = {
            r["month_idx"]: r
            for r in catalog()["bill_churn_rate"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(months)
        total_new = 0
        for mi, custs in months.items():
            retained = sum(1 for c in custs if (c, mi + 1) in active)
            new = sum(1 for c in custs if first[c] == mi)
            g = got[mi]
            assert g["n_active"] == len(custs)
            assert g["n_retained"] == retained
            assert g["n_churned"] == len(custs) - retained
            assert g["n_new"] == new
            assert g["n_retained"] + g["n_churned"] == g["n_active"]
            assert g["is_censored"] == (mi == max_mi)
            assert abs(g["retention_rate"] - retained / len(custs)) < 1e-12
            total_new += new
        # every customer is new exactly once
        assert total_new == len(first)


class TestCsvMultiline:
    def test_roundtrip_identity(self, spark):
        """The multiline CSV round trip must reconstruct every column of
        every row bit-for-bit (a shredded quoted record breaks ids,
        counts or values)."""
        orig = {
            r["doc_id"]: (r["lang"], r["text"], r["source"])
            for r in load(spark, SF_DIR, "documents")
            .select("doc_id", "lang", "text", "source")
            .collect()
        }
        got = {
            r["doc_id"]: (r["lang"], r["text"], r["source"])
            for r in catalog()["scan_csv_multiline"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert got == orig


class TestReachCurve:
    def test_python_replay_and_identities(self, spark):
        events = (
            load(spark, SF_DIR, "events")
            .selectExpr(
                "user_id",
                "CAST(unix_micros(ts) DIV 86400000000 AS BIGINT) AS d",
            )
            .collect()
        )
        act = {(r["user_id"], r["d"]) for r in events}
        first = {}
        days = defaultdict(set)
        for u, d in act:
            days[d].add(u)
            if u not in first or d < first[u]:
                first[u] = d
        n_users = len(first)

        rows = sorted(
            catalog()["ts_reach_curve"].fn(spark, SF_DIR).collect(),
            key=lambda r: r["day_idx"],
        )
        assert [r["day_idx"] for r in rows] == sorted(days)
        cum = 0
        for r in rows:
            d = r["day_idx"]
            new = sum(1 for u in days[d] if first[u] == d)
            cum += new
            assert r["n_active_users"] == len(days[d])
            assert r["n_new_users"] == new
            assert r["cum_users"] == cum
            assert abs(r["reach_share"] - cum / n_users) < 1e-12
            # reach is monotone and active <= cumulative reach
            assert r["n_active_users"] <= r["cum_users"]
        # the curve ends at the full audience
        assert rows[-1]["cum_users"] == n_users
        assert abs(rows[-1]["reach_share"] - 1.0) < 1e-12


class TestHeapsLaw:
    def test_python_replay(self, spark):
        docs = sorted(
            load(spark, SF_DIR, "documents")
            .select("doc_id", "text")
            .collect(),
            key=lambda r: r["doc_id"],
        )
        seen: set = set()
        cum_tok = 0
        pts = []
        for r in docs:
            toks = r["text"].split(" ")
            cum_tok += len(toks)
            seen.update(toks)
            if r["doc_id"] % 25 == 0:
                pts.append((r["doc_id"], cum_tok, len(seen)))
        lx = [math.floor(math.log(t) * 1e6 + 0.5) for _, t, _ in pts]
        ly = [math.floor(math.log(v) * 1e6 + 0.5) for _, _, v in pts]
        n = len(pts)
        sx, sy = sum(lx), sum(ly)
        sxx = sum(a * a for a in lx)
        sxy = sum(a * b for a, b in zip(lx, ly))
        beta = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
        ln_k = (float(sy) - beta * float(sx)) / (n * 1e6)

        rows = catalog()["prof_heaps_law"].fn(spark, SF_DIR).collect()
        got = {r["doc_id"]: r for r in rows}
        assert set(got) == {d for d, _, _ in pts}
        for d, t, v in pts:
            g = got[d]
            assert g["cum_tokens"] == t
            assert g["cum_vocab"] == v
            assert g["n_checkpoints"] == n
            assert abs(g["heaps_beta"] - beta) < 1e-5
            assert abs(g["ln_k"] - ln_k) < 1e-5
        # sublinear growth: 0 < beta < 1 on any natural-ish corpus
        assert 0.0 < rows[0]["heaps_beta"] < 1.0


class TestReturnRate:
    def test_python_replay_and_identities(self, spark):
        li = (
            load(spark, SF_DIR, "lineitem")
            .select("l_orderkey", "l_returnflag", "l_extendedprice")
            .collect()
        )
        omonth = {
            r["o_orderkey"]: r["mi"]
            for r in load(spark, SF_DIR, "orders")
            .selectExpr(
                "o_orderkey",
                "CAST(EXTRACT(year FROM o_orderdate) * 12"
                " + EXTRACT(month FROM o_orderdate) AS BIGINT) AS mi",
            )
            .collect()
        }
        agg = defaultdict(lambda: [0, 0, 0, 0])
        for r in li:
            mi = omonth[r["l_orderkey"]]
            cents = math.floor(r["l_extendedprice"] * 100.0 + 0.5)
            ret = r["l_returnflag"] == "R"
            a = agg[mi]
            a[0] += 1
            a[1] += 1 if ret else 0
            a[2] += cents
            a[3] += cents if ret else 0

        got = {
            r["month_idx"]: r
            for r in catalog()["bill_return_rate_monthly"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(agg)
        for mi, (n, nr, gross, retc) in agg.items():
            g = got[mi]
            assert g["n_lineitems"] == n
            assert g["n_returned"] == nr
            assert g["gross_cents"] == gross
            assert g["returned_cents"] == retc
            assert abs(g["return_rate_items"] - nr / n) < 1e-12
            assert abs(g["return_rate_value"] - retc / gross) < 1e-12
            # returned value can never exceed gross
            assert 0 <= g["returned_cents"] <= g["gross_cents"]
