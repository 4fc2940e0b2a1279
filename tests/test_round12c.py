"""Round-12 model-eval suite: independent Python replays + algebraic
invariants for AUC (midrank rank-sum), macro-F1, Cohen's kappa, and the
Brier score. Replays recompute from raw fixture rows with plain Python
(Counter/dict), never through Spark expressions, so a shared-text flaw
in the Spark/oracle SQL cannot hide here (the r11 FIFO lesson)."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pyspark.sql.functions as F

from billing_data_loader_spark.operators.text_analysis import (
    _QCLS_BUCKETS,
    _QCLS_KNUTH,
)
from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


def _w_sum(text: str) -> int:
    s = 0
    for token in text.split(" "):
        bucket = int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % (
            _QCLS_BUCKETS
        )
        s += (bucket * _QCLS_KNUTH) % 2001 - 1000
    return s


def _docs(spark):
    return load(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang"
    ).collect()


class TestAucRank:
    def test_python_replay(self, spark):
        rows = _docs(spark)
        scored = [(_w_sum(r["text"]), 1 if r["lang"] == "en" else 0)
                  for r in rows]
        # midrank AUC via brute-force pair comparison (the definition)
        pos = [s for s, y in scored if y == 1]
        neg = [s for s, y in scored if y == 0]
        wins = sum(
            1.0 if p > q else (0.5 if p == q else 0.0)
            for p in pos for q in neg
        )
        auc_def = wins / (len(pos) * len(neg))
        got = catalog()["ext_auc_rank"].fn(spark, SF_DIR).first()
        assert got["n_pos"] == len(pos)
        assert got["n_neg"] == len(neg)
        assert abs(got["auc"] - auc_def) < 1e-12
        assert abs(got["gini_index"] - (2 * auc_def - 1)) < 1e-12


class TestMacroF1:
    def test_python_replay(self, spark):
        rows = _docs(spark)
        # replicate lang-id: per-lang top-20 signature, best-overlap pick
        freq: dict[str, Counter] = defaultdict(Counter)
        for r in rows:
            freq[r["lang"]].update(r["text"].split(" "))
        sig = {
            lang: {
                t
                for t, _ in sorted(
                    c.items(), key=lambda kv: (-kv[1], kv[0])
                )[:20]
            }
            for lang, c in freq.items()
        }
        conf: Counter = Counter()
        for r in rows:
            toks = set(r["text"].split(" "))
            hits = sorted(
                (
                    (-len(toks & s), lang)
                    for lang, s in sig.items()
                    if toks & s
                ),
            )
            if not hits:
                continue
            conf[(hits[0][1], r["lang"])] += 1
        n_true: Counter = Counter()
        n_pred: Counter = Counter()
        tp: Counter = Counter()
        for (p, t), n in conf.items():
            n_pred[p] += n
            n_true[t] += n
            if p == t:
                tp[t] += n
        got = {
            r["lang"]: r
            for r in catalog()["ext_macro_f1"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(n_true)
        f1s = []
        for lang in n_true:
            g = got[lang]
            assert g["n_true"] == n_true[lang]
            assert g["n_pred"] == n_pred[lang]
            assert g["tp"] == tp[lang]
            f1 = 2 * tp[lang] / (n_pred[lang] + n_true[lang])
            assert abs(g["f1_c"] - f1) < 1e-12
            f1s.append(f1)
        macro = sum(round(f * 1e9) for f in f1s) / (len(f1s) * 1e9)
        assert abs(next(iter(got.values()))["macro_f1"] - macro) < 1e-12
        micro = sum(tp.values()) / sum(n_true.values())
        assert (
            abs(next(iter(got.values()))["micro_accuracy"] - micro) < 1e-12
        )


class TestKappa:
    def test_python_replay(self, spark):
        rows = _docs(spark)
        cells: Counter = Counter()
        for r in rows:
            toks = r["text"].split(" ")
            a = _w_sum(r["text"]) > 0
            b = 2 * len(set(toks)) > len(toks)
            cells[(a, b)] += 1
        total = sum(cells.values())
        n_agree = cells[(True, True)] + cells[(False, False)]
        a1 = cells[(True, True)] + cells[(True, False)]
        b1 = cells[(True, True)] + cells[(False, True)]
        pe_num = a1 * b1 + (total - a1) * (total - b1)
        kappa = (total * n_agree - pe_num) / (total * total - pe_num)
        got = catalog()["ext_kappa_agreement"].fn(spark, SF_DIR).collect()
        assert {
            (r["a_keep"], r["b_keep"]): r["n"] for r in got
        } == dict(cells)
        assert abs(got[0]["kappa"] - kappa) < 1e-12
        assert abs(got[0]["p_observed"] - n_agree / total) < 1e-12

    def test_kappa_bounds_and_identity(self, spark):
        r = catalog()["ext_kappa_agreement"].fn(spark, SF_DIR).first()
        assert -1.0 <= r["kappa"] <= 1.0
        # kappa == (po - pe) / (1 - pe) up to the one-division form
        po, pe = r["p_observed"], r["p_expected"]
        assert abs(r["kappa"] - (po - pe) / (1 - pe)) < 1e-9


class TestBrier:
    def test_python_replay(self, spark):
        rows = _docs(spark)
        per_cls: dict[int, list[int]] = {0: [], 1: []}
        for r in rows:
            n_tok = len(r["text"].split(" "))
            w = _w_sum(r["text"])
            y = 1 if r["lang"] == "en" else 0
            p = (w + 1000 * n_tok) / (2000 * n_tok)
            import math

            per_cls[y].append(math.floor((p - y) ** 2 * 1e9 + 0.5))
        got = {
            r["actual_en"]: r
            for r in catalog()["ext_brier_score"].fn(spark, SF_DIR).collect()
        }
        overall = sum(sum(v) for v in per_cls.values()) / (
            sum(len(v) for v in per_cls.values()) * 1e9
        )
        for y, sqs in per_cls.items():
            g = got[y]
            assert g["n"] == len(sqs)
            assert abs(g["class_brier"] - sum(sqs) / (len(sqs) * 1e9)) \
                < 1e-15
            assert abs(g["overall_brier"] - overall) < 1e-15

    def test_probability_in_unit_interval(self, spark):
        # w_sum is bounded by +-1000*n_tok, so p in [0,1] by construction;
        # the class Brier components must therefore sit in [0, 1]
        for r in catalog()["ext_brier_score"].fn(spark, SF_DIR).collect():
            assert 0.0 <= r["class_brier"] <= 1.0
