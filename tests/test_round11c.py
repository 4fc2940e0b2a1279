"""Round-11 second-continuation tests: independent replays and
invariants for the Gini concentration profile, the 2-D skyline, the
calibration-ECE audit, and the incremental near-dup screen."""

from __future__ import annotations

import math
from collections import defaultdict

from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


def _cents(x: float) -> int:
    """floor(x*100 + 0.5) — the same single-IEEE-op quantization the
    operators apply (functions/determinism.py)."""
    return int(math.floor(x * 100.0 + 0.5))


def _base_points(spark) -> list[tuple[str, str, int, int]]:
    """(nation, segment, cust, spend_cents, bal_cents) per customer —
    the shared input frame of the gini and skyline replays, rebuilt with
    pure-Python arithmetic."""
    spend: dict[int, int] = defaultdict(int)
    for r in load(spark, SF_DIR, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect():
        spend[r["o_custkey"]] += _cents(r["o_totalprice"])
    nations = {
        r["n_nationkey"]: r["n_name"]
        for r in load(spark, SF_DIR, "nation").collect()
    }
    pts = []
    for r in load(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
    ).collect():
        pts.append(
            (
                nations[r["c_nationkey"]],
                r["c_mktsegment"],
                r["c_custkey"],
                spend.get(r["c_custkey"], 0),
                _cents(r["c_acctbal"]),
            )
        )
    return pts


class TestGiniConcentration:
    def test_python_replay(self, spark):
        """Exact integer replay of the rank-identity Gini and the
        top-decile share per segment."""
        by_seg: dict[str, list[tuple[int, int]]] = defaultdict(list)
        for _nation, seg, cust, sp, _bal in _base_points(spark):
            by_seg[seg].append((sp, cust))

        got = {
            r["segment"]: r
            for r in catalog()["prof_gini_concentration"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(by_seg)
        for seg, xs in by_seg.items():
            asc = sorted(xs)  # (spend, cust) ascending — matches the op
            n = len(asc)
            total = sum(x for x, _ in asc)
            wsum = sum((i + 1) * x for i, (x, _) in enumerate(asc))
            gini = (2.0 * wsum - (n + 1.0) * total) / (n * float(total))
            top_n = (n + 9) // 10
            desc = sorted(xs, key=lambda t: (-t[0], t[1]))
            top_cents = sum(x for x, _ in desc[:top_n])
            g = got[seg]
            assert g["n_customers"] == n
            assert g["total_cents"] == total
            assert g["top_decile_n"] == top_n
            assert g["top_decile_cents"] == top_cents
            assert abs(g["gini"] - gini) < 1e-12
            assert abs(g["top_decile_share"] - top_cents / total) < 1e-12
            # Gini of non-negative spends is in [0, 1); a top decile can
            # never hold less than its population share
            assert 0.0 <= g["gini"] < 1.0
            assert g["top_decile_share"] >= top_n / n - 1e-12


class TestSkylineDominance:
    def test_bruteforce_replay(self, spark):
        """Quadratic strict-dominance replay == the declared frontier,
        and the frontier is an antichain."""
        by_nation: dict[str, list[tuple[int, int, int]]] = defaultdict(list)
        for nation, _seg, cust, sp, bal in _base_points(spark):
            by_nation[nation].append((cust, sp, bal))

        def dominated(p, q):  # q strictly dominates p
            return (
                q[1] >= p[1]
                and q[2] >= p[2]
                and (q[1] > p[1] or q[2] > p[2])
            )

        expected = set()
        for nation, pts in by_nation.items():
            for p in pts:
                if not any(dominated(p, q) for q in pts if q is not p):
                    expected.add((nation, p[0], p[1], p[2]))

        rows = (
            catalog()["ext_skyline_dominance"].fn(spark, SF_DIR).collect()
        )
        got = {
            (r["nation"], r["cust"], r["spend_cents"], r["bal_cents"])
            for r in rows
        }
        assert got == expected
        # antichain: no skyline point strictly dominates another
        by_n: dict[str, list] = defaultdict(list)
        for nation, cust, sp, bal in got:
            by_n[nation].append((cust, sp, bal))
        for pts in by_n.values():
            for p in pts:
                assert not any(
                    dominated(p, q) for q in pts if q is not p
                )


class TestCalibrationEce:
    def test_integer_replay(self, spark):
        """Integer-exact replay of the bin assignment, per-bin stats and
        the ECE fold from the classifier's own (w_sum, n_tok) frame."""
        cls_rows = (
            catalog()["ext_quality_classifier"].fn(spark, SF_DIR).collect()
        )
        lang = {
            r["doc_id"]: r["lang"]
            for r in load(spark, SF_DIR, "documents")
            .select("doc_id", "lang")
            .collect()
        }
        bins: dict[int, list] = defaultdict(lambda: [0, 0, 0])
        for r in cls_rows:
            num = 10 * (r["w_sum"] + 1000 * r["n_tok"])
            den = 2000 * r["n_tok"]
            b = min(num // den, 9)
            s = (r["w_sum"] + 1000 * r["n_tok"]) / (2000.0 * r["n_tok"])
            s_q = int(math.floor(s * 1e9 + 0.5))
            y = 1 if lang[r["doc_id"]] == "en" else 0
            bins[b][0] += 1
            bins[b][1] += y
            bins[b][2] += s_q

        total = sum(v[0] for v in bins.values())
        gapq_weighted = 0
        exp = {}
        for b, (n, pos, ssum) in bins.items():
            mean_score = ssum / (1e9 * n)
            pos_rate = pos / n
            gap = abs(mean_score - pos_rate)
            gap_q = int(math.floor(gap * 1e9 + 0.5))
            gapq_weighted += gap_q * n
            exp[b] = (n, pos, mean_score, pos_rate, gap)
        ece = gapq_weighted / (1e9 * total)

        got = {
            r["bin"]: r
            for r in catalog()["ext_calibration_ece"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(exp)
        for b, (n, pos, mean_score, pos_rate, gap) in exp.items():
            g = got[b]
            assert g["n_docs"] == n
            assert g["pos_docs"] == pos
            assert abs(g["mean_score"] - mean_score) < 1e-12
            assert abs(g["pos_rate"] - pos_rate) < 1e-12
            assert abs(g["gap"] - gap) < 1e-12
            assert abs(g["bin_share"] - n / total) < 1e-12
            assert abs(g["ece"] - ece) < 1e-12
        # shares partition the corpus; ECE is a [0, 1] convex gap mix
        assert abs(sum(r["bin_share"] for r in got.values()) - 1.0) < 1e-9
        assert 0.0 <= ece <= 1.0


def _shingles(text: str) -> set[str]:
    t = text.split(" ")
    return {
        " ".join(t[i : i + 3]) for i in range(len(t) - 2)
    } if len(t) >= 3 else set()


class TestNeardupIncremental:
    def test_python_replay(self, spark):
        """Exact batch x corpus Jaccard replay over raw shingle strings
        (the hash-free side of the operator's xxhash64 sets), plus the
        per-slice verdict pattern the synthesis plants."""
        docs = (
            load(spark, SF_DIR, "documents")
            .select("doc_id", "text", "lang")
            .collect()
        )
        corpus = [(r["doc_id"], _shingles(r["text"]), r["lang"]) for r in docs]
        batch = []
        for r in docs:
            m = r["doc_id"] % 9
            if m == 0:
                text = r["text"].split(" ", 1)[1] if " " in r["text"] else ""
                batch.append((r["doc_id"] + 3_000_000, text, r["lang"]))
            elif m == 1:
                batch.append((r["doc_id"] + 3_000_000, r["text"], r["lang"]))
            elif m == 2:
                rev = " ".join(reversed(r["text"].split(" ")))
                batch.append((r["doc_id"] + 3_000_000, rev, r["lang"]))

        exp = {}
        for bid, text, lang in batch:
            bs = _shingles(text)
            best = None
            for cid, cs, clang in corpus:
                if clang != lang or not bs or not cs:
                    continue
                common = len(bs & cs)
                union = len(bs) + len(cs) - common
                if union == 0:
                    continue
                j = common / union
                if j >= 0.6 and (
                    best is None
                    or j > best[1] + 1e-15
                    or (abs(j - best[1]) <= 1e-15 and cid < best[0])
                ):
                    best = (cid, j)
            exp[bid] = best

        got = {
            r["batch_id"]: r
            for r in catalog()["ext_neardup_incremental"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(exp)
        verdicts = defaultdict(int)
        for bid, best in exp.items():
            g = got[bid]
            if best is None:
                assert g["match_id"] == -1
                assert g["best_jaccard"] == 0.0
                assert g["verdict"] == "novel"
            else:
                assert g["match_id"] == best[0]
                assert abs(g["best_jaccard"] - best[1]) < 1e-12
                assert g["verdict"] == "duplicate"
            verdicts[(bid - 3_000_000) % 9, g["verdict"]] += 1
        # planted pattern: the verbatim slice re-finds its origin at J=1
        for bid, best in exp.items():
            if (bid - 3_000_000) % 9 == 1:
                assert got[bid]["match_id"] == bid - 3_000_000
                assert got[bid]["best_jaccard"] == 1.0
        # all three verdict classes are exercised
        assert verdicts[(1, "duplicate")] > 0
        assert verdicts[(0, "duplicate")] > 0
        assert verdicts[(2, "novel")] > 0


class TestParetoAbc:
    def test_python_replay(self, spark):
        """Exact integer replay of the 80/95 prefix classification and
        the per-class rollup."""
        by_seg: dict[str, list[tuple[int, int]]] = defaultdict(list)
        for _nation, seg, cust, sp, _bal in _base_points(spark):
            by_seg[seg].append((sp, cust))

        exp: dict[tuple[str, str], list] = {}
        for seg, xs in by_seg.items():
            desc = sorted(xs, key=lambda t: (-t[0], t[1]))
            total = sum(x for x, _ in desc)
            cum = 0
            rollup: dict[str, list] = defaultdict(lambda: [0, 0, 0])
            for rn, (x, _cust) in enumerate(desc, start=1):
                cum += x
                if rn == 1 or 5 * cum <= 4 * total:
                    cls = "A"
                elif 20 * cum <= 19 * total:
                    cls = "B"
                else:
                    cls = "C"
                rollup[cls][0] += 1
                rollup[cls][1] += x
                rollup[cls][2] = cum  # monotone: last seen == max
            for cls, (n, cents, cum_end) in rollup.items():
                exp[(seg, cls)] = [n, cents, cents / total, cum_end / total]

        got = {
            (r["segment"], r["abc_class"]): r
            for r in catalog()["win_pareto_abc"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(exp)
        for key, (n, cents, share, cum_end) in exp.items():
            g = got[key]
            assert g["n_customers"] == n
            assert g["class_cents"] == cents
            assert abs(g["class_share"] - share) < 1e-12
            assert abs(g["cum_share_end"] - cum_end) < 1e-12
        # per segment: classes partition the customers, shares sum to 1,
        # and class A is never empty
        for seg, xs in by_seg.items():
            seg_rows = [g for (s, _), g in got.items() if s == seg]
            assert sum(g["n_customers"] for g in seg_rows) == len(xs)
            assert abs(sum(g["class_share"] for g in seg_rows) - 1.0) < 1e-9
            assert (seg, "A") in got


class TestClassBalanceResample:
    def test_md5_replay_and_exact_balance(self, spark):
        """hashlib-md5 replay of the salted per-label rank draw; every
        label keeps exactly the min class size and the kept-membership
        checksum binds WHICH rows were kept."""
        import hashlib

        rows = (
            load(spark, SF_DIR, "embeddings")
            .select("vec_id", "label")
            .collect()
        )
        by_label: dict[int, list[int]] = defaultdict(list)
        for r in rows:
            by_label[r["label"]].append(r["vec_id"])
        m = min(len(v) for v in by_label.values())

        def h(vid: int) -> str:
            return hashlib.md5(
                f"{vid}:bdl-classbal-11c".encode()
            ).hexdigest()

        exp = {}
        for label, vids in by_label.items():
            kept = sorted(vids, key=lambda v: (h(v), v))[:m]
            exp[label] = (len(vids), m, len(vids) - m, sum(kept))

        got = {
            r["label"]: r
            for r in catalog()["ext_class_balance_resample"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(exp)
        for label, (before, kept_n, dropped, ksum) in exp.items():
            g = got[label]
            assert g["n_before"] == before
            assert g["n_kept"] == kept_n == m
            assert g["n_dropped"] == dropped
            assert g["kept_vecid_sum"] == ksum
