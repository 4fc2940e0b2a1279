"""Round-12 batch 5: gzip text round trip, log loss, split-balance
chi-square, and simplified silhouette (replayed in numpy off the
ext_kmeans_lite assignment so the silhouette algebra is checked
independently of the clustering)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import numpy as np

from billing_data_loader_spark.operators.text_analysis import (
    _QCLS_BUCKETS,
    _QCLS_KNUTH,
)
from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


class TestScanTextGzip:
    def test_roundtrip_matches_parquet(self, spark):
        rows = (
            load(spark, SF_DIR, "documents")
            .select("doc_id", "lang", "text")
            .collect()
        )
        expect: dict = defaultdict(lambda: [0, 0, 0, None, None, 0])
        for r in rows:
            a = expect[r["lang"]]
            a[0] += 1
            a[1] += len(r["text"])
            a[2] += len(r["text"].split(" "))
            a[3] = r["doc_id"] if a[3] is None else min(a[3], r["doc_id"])
            a[4] = r["doc_id"] if a[4] is None else max(a[4], r["doc_id"])
            a[5] += r["doc_id"]
        got = {
            r["lang"]: r
            for r in catalog()["scan_text_gzip"].fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(expect)
        for lang, (n, ch, tk, lo, hi, ds) in expect.items():
            g = got[lang]
            assert (
                g["n_docs"],
                g["n_chars_sum"],
                g["n_tokens_sum"],
                g["min_doc_id"],
                g["max_doc_id"],
                g["doc_id_sum"],
            ) == (n, ch, tk, lo, hi, ds)


def _w_and_n(text: str) -> tuple[int, int]:
    s, n = 0, 0
    for token in text.split(" "):
        bucket = int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % (
            _QCLS_BUCKETS
        )
        s += (bucket * _QCLS_KNUTH) % 2001 - 1000
        n += 1
    return s, n


class TestLogLoss:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "documents")
            .select("doc_id", "text", "lang")
            .collect()
        )
        per: dict = {0: [], 1: []}
        for r in rows:
            w, n = _w_and_n(r["text"])
            y = 1 if r["lang"] == "en" else 0
            p = (w + 1000 * n + 1) / (2000 * n + 2)
            nll = -(math.log(p) if y else math.log(1 - p))
            # the 1-p closed form: ln((1000n - w + 1)/(2000n + 2))
            if not y:
                nll = -math.log((1000 * n - w + 1) / (2000 * n + 2))
            per[y].append(math.floor(nll * 1e6 + 0.5))
        got = {
            r["actual_en"]: r
            for r in catalog()["ext_log_loss"].fn(spark, SF_DIR).collect()
        }
        overall = sum(sum(v) for v in per.values()) / (
            sum(len(v) for v in per.values()) * 1e6
        )
        for y, nlls in per.items():
            g = got[y]
            assert g["n"] == len(nlls)
            assert abs(
                g["class_log_loss"] - sum(nlls) / (len(nlls) * 1e6)
            ) < 1e-12
            assert abs(g["overall_log_loss"] - overall) < 1e-12
            assert g["class_log_loss"] >= 0.0


def _split_of(doc_id: int) -> str:
    h = hashlib.md5(f"{doc_id}:bdl-split-7".encode()).hexdigest()[0]
    return "train" if h < "c" else ("val" if h < "e" else "test")


class TestSplitBalanceChi2:
    def test_python_replay(self, spark):
        rows = (
            load(spark, SF_DIR, "documents")
            .select("doc_id", "lang")
            .collect()
        )
        cells: Counter = Counter()
        for r in rows:
            cells[(_split_of(r["doc_id"]), r["lang"])] += 1
        rt: Counter = Counter()
        ct: Counter = Counter()
        for (s, lg), n in cells.items():
            rt[s] += n
            ct[lg] += n
        total = sum(cells.values())
        comp = {}
        for (s, lg), obs in cells.items():
            num = (total * obs - rt[s] * ct[lg]) ** 2
            comp[(s, lg)] = math.floor(
                num / total / (rt[s] * ct[lg]) * 1e9 + 0.5
            )
        chi2 = sum(comp.values()) / 1e9
        dof = (len(rt) - 1) * (len(ct) - 1)
        got = {
            (r["split"], r["lang"]): r
            for r in catalog()["ext_split_balance_chi2"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(cells)
        for key, r in got.items():
            assert r["obs"] == cells[key]
            assert abs(
                r["expected"] - rt[key[0]] * ct[key[1]] / total
            ) < 1e-9
            assert abs(r["chi_component"] - comp[key] / 1e9) < 1e-12
            assert abs(r["chi2"] - chi2) < 1e-9
            assert r["dof"] == dof
            assert r["chi_component"] >= 0.0


class TestSilhouette:
    def test_numpy_replay_off_kmeans_assignment(self, spark):
        assign = {
            r["vec_id"]: r["cluster_id"]
            for r in catalog()["ext_kmeans_lite"].fn(spark, SF_DIR)
            .collect()
        }
        vecs = {
            r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in load(spark, SF_DIR, "embeddings")
            .select("vec_id", "embedding")
            .collect()
        }
        by_c: dict = defaultdict(list)
        for vid, cid in assign.items():
            by_c[cid].append(vecs[vid])
        cents = {}
        for cid, vs in by_c.items():
            m = np.stack(vs)
            # davg scale 9: per-dim floor-quantized sum / count
            qsum = np.floor(m * 1e9 + 0.5).sum(axis=0)
            cents[cid] = (qsum / 1e9) / len(vs)
        sil_by_c: dict = defaultdict(list)
        for vid, cid in assign.items():
            d = {
                c: round(float(((vecs[vid] - cv) ** 2).sum()), 9)
                for c, cv in cents.items()
            }
            a = d[cid]
            b = min(v for c, v in d.items() if c != cid)
            s = 0.0 if max(a, b) == 0 else (b - a) / max(a, b)
            sil_by_c[cid].append(s)
        got = {
            r["cluster_id"]: r
            for r in catalog()["ext_silhouette_simplified"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(sil_by_c)
        assert sum(r["n_points"] for r in got.values()) == len(assign)
        for cid, sils in sil_by_c.items():
            g = got[cid]
            assert g["n_points"] == len(sils)
            mean = sum(math.floor(s * 1e9 + 0.5) for s in sils) / (
                len(sils) * 1e9
            )
            # numpy fold order differs from the engines' — compare at the
            # quantization grid, not bitwise
            assert abs(g["mean_silhouette"] - mean) < 1e-6
            assert -1.0 <= g["min_silhouette"] <= g["max_silhouette"] <= 1.0
