"""Round-10 third-batch semantic tests: Python replays and invariants for
the compaction planner, correlation matrix, MRR waterfall, EWMA smoothing,
MAD anomaly flags, and triangle counting."""

from __future__ import annotations

from pyspark.sql import functions as F

from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


class TestCompactionPlan:
    def test_python_packer_replay_and_bounds(self, spark):
        """The declared bin assignment equals a Python replay of the
        offset slicer, bins partition the manifest exactly, and no bin
        exceeds target + its largest member (the overflow bound of
        start-offset packing)."""
        from billing_data_loader_spark.operators.lakeops import _C_BINS

        d = load(spark, SF_DIR, "documents")
        files = (
            d.groupBy("source", "lang")
            .agg(F.sum("n_chars").alias("bytes"), F.count(F.lit(1)).alias("nd"))
            .collect()
        )
        files.sort(key=lambda r: (-r["bytes"], r["source"], r["lang"]))
        total = sum(r["bytes"] for r in files)
        target = (total + _C_BINS - 1) // _C_BINS
        bins: dict[int, dict] = {}
        cum = 0
        for r in files:
            b = cum // target
            slot = bins.setdefault(
                b, {"n_files": 0, "bin_bytes": 0, "max_file": 0, "n_docs": 0}
            )
            slot["n_files"] += 1
            slot["bin_bytes"] += r["bytes"]
            slot["max_file"] = max(slot["max_file"], r["bytes"])
            slot["n_docs"] += r["nd"]
            cum += r["bytes"]

        plan = {
            r["bin_id"]: r
            for r in catalog()["ext_compaction_plan"].fn(spark, SF_DIR).collect()
        }
        assert set(plan) == set(bins)
        for b, exp in bins.items():
            got = plan[b]
            assert got["n_files"] == exp["n_files"]
            assert got["bin_bytes"] == exp["bin_bytes"]
            assert got["max_file_bytes"] == exp["max_file"]
            assert got["n_docs"] == exp["n_docs"]
            # overflow bound: a bin only exceeds the target because one
            # member straddled its end boundary
            assert got["bin_bytes"] < target + got["max_file_bytes"]
        # conservation: bins partition the manifest
        assert sum(r["n_files"] for r in plan.values()) == len(files)
        assert sum(r["bin_bytes"] for r in plan.values()) == total


class TestCorrMatrix:
    def test_numpy_replay(self, spark):
        """The 6 declared correlations equal numpy's corrcoef on the same
        quantized columns (semantic pin — the oracle only proves engine
        parity, this proves the closed form is actually Pearson)."""
        import numpy as np

        from billing_data_loader_spark.operators.profiling import _CM_COLS

        li = load(spark, SF_DIR, "lineitem")
        cols = [
            np.array(
                [r[0] for r in li.select(
                    F.floor(F.col(c).cast("double") * 100.0 + F.lit(0.5))
                    .cast("long")
                ).collect()],
                dtype=np.float64,
            )
            for c in _CM_COLS
        ]
        got = {
            (r["col_x"], r["col_y"]): r["corr"]
            for r in catalog()["prof_corr_matrix"].fn(spark, SF_DIR).collect()
        }
        assert len(got) == 6
        for i in range(4):
            for j in range(i + 1, 4):
                exp = float(np.corrcoef(cols[i], cols[j])[0, 1])
                assert abs(got[(_CM_COLS[i], _CM_COLS[j])] - exp) < 1e-6

    def test_self_corr_sanity(self, spark):
        """Degenerate guard: corr of a column with itself through the same
        closed form is exactly 1 (catches a moment-wiring transposition)."""
        from billing_data_loader_spark.operators.profiling import (
            _cm_corr_expr,
            _cm_moment_exprs,
        )

        li = load(spark, SF_DIR, "lineitem").selectExpr(
            "CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS c0",
            "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS c1",
            "CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS c2",
            "CAST(floor(l_tax * 100.0 + 0.5) AS BIGINT) AS c3",
        )
        m = li.agg(
            *[F.expr(e).alias(a) for e, a in _cm_moment_exprs("DECIMAL(38,0)")]
        )
        row = m.selectExpr(
            *[f"{_cm_corr_expr(i, i)} AS d{i}" for i in range(4)]
        ).collect()[0]
        assert all(row[f"d{i}"] == 1.0 for i in range(4))


class TestMrrWaterfall:
    def test_python_replay_and_conservation(self, spark):
        """Replay the waterfall classification in plain Python from the
        (customer, month) totals and check (a) every component matches and
        (b) conservation: total(m) - total(m-1) == new + exp + con + churn
        for every month after the first."""
        o = load(spark, SF_DIR, "orders")
        rows = (
            o.select(
                F.col("o_custkey").alias("cust"),
                (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
                .cast("long")
                .alias("idx"),
                F.floor(F.col("o_totalprice").cast("double") * 1e2 + F.lit(0.5))
                .cast("long")
                .alias("cents"),
            )
            .groupBy("cust", "idx")
            .agg(F.sum("cents").alias("amt"))
            .collect()
        )
        series: dict[int, list[tuple[int, int]]] = {}
        for r in rows:
            series.setdefault(r["cust"], []).append((r["idx"], r["amt"]))
        max_idx = max(i for s in series.values() for i, _ in s)
        comp: dict[int, dict[str, int]] = {}

        def book(idx, kind, c):
            comp.setdefault(
                idx, {"total": 0, "new": 0, "exp": 0, "con": 0, "churn": 0}
            )[kind] += c

        for s in series.values():
            s.sort()
            for k, (idx, amt) in enumerate(s):
                book(idx, "total", amt)
                prev = s[k - 1] if k else None
                if prev is None or prev[0] < idx - 1:
                    book(idx, "new", amt)
                elif amt > prev[1]:
                    book(idx, "exp", amt - prev[1])
                elif amt < prev[1]:
                    book(idx, "con", amt - prev[1])
                nxt = s[k + 1] if k + 1 < len(s) else None
                if (nxt is None or nxt[0] > idx + 1) and idx + 1 <= max_idx:
                    book(idx + 1, "churn", -amt)

        got = {
            r["ym"]: r
            for r in catalog()["bill_mrr_waterfall"].fn(spark, SF_DIR).collect()
        }
        exp_ym = {(i // 12) * 100 + i % 12 + 1: v for i, v in comp.items()}
        assert set(got) == set(exp_ym)
        for ym, v in exp_ym.items():
            g = got[ym]
            assert abs(g["total_mrr"] - v["total"] / 100.0) < 1e-9
            assert abs(g["new_mrr"] - v["new"] / 100.0) < 1e-9
            assert abs(g["expansion_mrr"] - v["exp"] / 100.0) < 1e-9
            assert abs(g["contraction_mrr"] - v["con"] / 100.0) < 1e-9
            assert abs(g["churned_mrr"] - v["churn"] / 100.0) < 1e-9
        # conservation over the contiguous month line
        idxs = sorted(comp)
        for a, b in zip(idxs, idxs[1:]):
            if b == a + 1:
                delta = comp[b]["total"] - comp[a]["total"]
                booked = (
                    comp[b]["new"]
                    + comp[b]["exp"]
                    + comp[b]["con"]
                    + comp[b]["churn"]
                )
                assert delta == booked, (a, b)


class TestEwmaSmooth:
    def test_python_replay(self, spark):
        """Declared EWMA equals a Python replay of the finite-horizon
        formula, and tracks the infinite recursion within the truncation
        bound w^H once warm."""
        from billing_data_loader_spark.operators.timeseries import (
            _EWMA_H,
            _EWMA_W,
        )

        got = catalog()["ts_ewma_smooth"].fn(spark, SF_DIR).collect()
        series: dict[str, list[tuple[int, float]]] = {}
        for r in got:
            series.setdefault(r["prio"], []).append((r["ym"], r["rev"]))
        for prio, s in series.items():
            s.sort()
            by_ym = {r["ym"]: r for r in got if r["prio"] == prio}
            rec = None
            alpha = 1.0 - _EWMA_W
            for t, (ym, rev) in enumerate(s):
                lo = max(0, t - _EWMA_H + 1)
                window = [s[k][1] for k in range(lo, t + 1)]
                num = sum(
                    _EWMA_W**j * x
                    for j, x in enumerate(reversed(window))
                )
                den = sum(_EWMA_W**j for j in range(len(window)))
                exp = num / den
                assert abs(by_ym[ym]["ewma"] - exp) < 1e-4, (prio, ym)
                rec = rev if rec is None else alpha * rev + _EWMA_W * rec
                if t >= _EWMA_H:
                    # truncation bound: finite horizon tracks the recursion
                    scale = max(abs(x) for x in window)
                    assert abs(exp - rec) <= 3 * _EWMA_W**_EWMA_H * scale


class TestAnomalyMad:
    def test_numpy_replay(self, spark):
        """median / MAD / anomaly count match a numpy replay of the
        Iglewicz-Hoaglin modified z-score per event type."""
        import numpy as np

        e = load(spark, SF_DIR, "events")
        rows = e.select(
            "event_type",
            F.floor(F.col("value").cast("double") * 1e2 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        ).collect()
        groups: dict[str, list[int]] = {}
        for r in rows:
            groups.setdefault(r["event_type"], []).append(r["cents"])
        got = {
            r["event_type"]: r
            for r in catalog()["ts_anomaly_mad"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(groups)
        for t, vals in groups.items():
            a = np.array(vals, dtype=np.float64)
            med = float(np.median(a))
            mad = float(np.median(np.abs(a - med)))
            z = np.abs(0.6745 * (a - med) / mad)
            g = got[t]
            assert g["n"] == len(vals)
            assert abs(g["median_value"] - med / 100.0) < 1e-6
            assert abs(g["mad_value"] - mad / 100.0) < 1e-6
            assert g["n_anomalies"] == int((z > 3.5).sum())


class TestTriangleCount:
    def test_brute_force_replay(self, spark):
        """Census equals a brute-force Python count over the collected
        edge set, and the wedge identity sum-over-nodes C(outdeg, 2)
        holds for the degree orientation."""
        from itertools import combinations

        from billing_data_loader_spark.operators.graph import _TRI_MAX_SIZE

        li = load(spark, SF_DIR, "lineitem")
        p = load(spark, SF_DIR, "part").filter(
            F.col("p_size") <= _TRI_MAX_SIZE
        ).select("p_partkey")
        # rebuild order -> parts in Python
        order_parts: dict[int, set[int]] = {}
        for r in (
            li.join(p, li.l_partkey == p.p_partkey)
            .select("l_orderkey", "l_partkey")
            .distinct()
            .collect()
        ):
            order_parts.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
        edges = set()
        for parts in order_parts.values():
            for a, b in combinations(sorted(parts), 2):
                edges.add((a, b))
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        tri = 0
        for a, b in edges:
            tri += len(adj[a] & adj[b])
        tri //= 3  # each triangle counted once per edge
        deg = {n: len(s) for n, s in adj.items()}
        out = {n: 0 for n in adj}
        for a, b in edges:
            lo = a if (deg[a], a) < (deg[b], b) else b
            out[lo] += 1
        wedges = sum(d * (d - 1) // 2 for d in out.values())

        row = catalog()["ext_triangle_count"].fn(spark, SF_DIR).collect()[0]
        assert row["n_nodes"] == len(adj)
        assert row["n_edges"] == len(edges)
        assert row["n_wedges"] == wedges
        assert row["n_triangles"] == tri
        assert row["n_triangles"] > 0  # fixture graph actually has triangles


class TestTaxRoundingAudit:
    def test_python_replay(self, spark):
        """Penny-gap distribution equals a Python integer replay, and the
        fixture actually exercises nonzero gaps (the audit finds leakage)."""
        li = load(spark, SF_DIR, "lineitem")
        rows = li.select(
            "l_orderkey",
            F.floor(
                F.col("l_extendedprice").cast("double")
                * F.col("l_tax").cast("double")
                * 1e6
                + F.lit(0.5)
            ).cast("long").alias("micro"),
        ).collect()
        inv: dict[int, list[int]] = {}
        for r in rows:
            inv.setdefault(r["l_orderkey"], []).append(r["micro"])
        dist: dict[int, list[int]] = {}
        for micros in inv.values():
            line_cents = sum((m + 5000) // 10000 for m in micros)
            inv_cents = (sum(micros) + 5000) // 10000
            dist.setdefault(line_cents - inv_cents, []).append(1)
        got = {
            r["diff_cents"]: r
            for r in catalog()["bill_tax_rounding_audit"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(dist)
        for d, ones in dist.items():
            assert got[d]["n_invoices"] == len(ones)
            assert got[d]["leaked_cents"] == d * len(ones)
        assert any(d != 0 for d in dist), "fixture shows no rounding gaps"


class TestInvertedIndex:
    def test_gap_decode_and_df(self, spark):
        """Cumulative-summing each posting's d-gaps recovers the exact
        token positions of the source document, and df counts distinct
        docs per term."""
        docs = {
            r["doc_id"]: r["text"].split(" ")
            for r in load(spark, SF_DIR, "documents").collect()
        }
        got = catalog()["ext_inverted_index"].fn(spark, SF_DIR).collect()
        df_seen: dict[str, set[int]] = {}
        tf_per_doc: dict[int, int] = {}
        for r in got:
            toks = docs[r["doc_id"]]
            gaps = [int(x) for x in r["gaps_csv"].split(",")]
            pos, positions = 0, []
            for g in gaps:
                pos += g
                positions.append(pos)
            assert len(positions) == r["tf"]
            assert all(toks[p] == r["term"] for p in positions)
            # completeness: every occurrence indexed
            assert [i for i, t in enumerate(toks) if t == r["term"]] == positions
            df_seen.setdefault(r["term"], set()).add(r["doc_id"])
            tf_per_doc[r["doc_id"]] = tf_per_doc.get(r["doc_id"], 0) + r["tf"]
        for r in got:
            assert r["df"] == len(df_seen[r["term"]])
        # token conservation: per-doc tf sums to doc length
        for did, toks in docs.items():
            assert tf_per_doc[did] == len(toks)


class TestPcaPowerIteration:
    def test_numpy_convergence(self, spark):
        """The declared top component aligns with numpy.linalg.eigh's on
        the same quantized covariance (|cos| > 0.999 after the declared rounds),
        the eigenvalue matches the dominant one, and the loading vector
        is unit-norm."""
        import numpy as np

        emb = load(spark, SF_DIR, "embeddings")
        d_idx = np.arange(64, dtype=np.float64)
        plant_dir = 0.002 * (d_idx + 1.0)
        X = np.array(
            [
                np.floor(
                    (
                        np.array(r["embedding"], dtype=np.float64)
                        + (float(r["vec_id"] % 17) - 8.0) * plant_dir
                    )
                    * 1e6
                    + 0.5
                )
                / 1e6
                for r in emb.select("vec_id", "embedding").collect()
            ]
        )
        C = np.cov(X, rowvar=False, bias=True)
        vals, vecs = np.linalg.eigh(C)
        top_val, top_vec = vals[-1], vecs[:, -1]
        assert vals[-2] / vals[-1] < 0.1, "planted eigengap missing"

        rows = sorted(
            catalog()["ext_pca_power_iteration"].fn(spark, SF_DIR).collect(),
            key=lambda r: r["dim"],
        )
        assert [r["dim"] for r in rows] == list(range(64))
        x = np.array([r["loading"] for r in rows])
        assert abs(np.linalg.norm(x) - 1.0) < 1e-9
        assert abs(abs(float(top_vec @ x)) - 1.0) < 1e-3
        eig = rows[0]["eigenvalue"]
        assert all(abs(r["eigenvalue"] - eig) < 1e-15 for r in rows)
        # Rayleigh quotient of the iterate vs eigh's dominant eigenvalue
        assert abs(eig - top_val) / top_val < 1e-3
        # dominance: the projected variance beats any coordinate axis
        coord_var = C.diagonal().max()
        assert eig >= coord_var - 1e-9
        # planted-direction recovery: the iterate aligns with the plant
        pd = plant_dir / np.linalg.norm(plant_dir)
        assert abs(float(pd @ x)) > 0.98


class TestBenford:
    def test_python_replay(self, spark):
        """Digit counts match a Python replay; shares sum to 1; Benford
        expectations sum to 1; and the synthetic uniform fixture deviates
        from the law (nonzero chi2 — the audit actually fires here)."""
        import math

        o = load(spark, SF_DIR, "orders")
        cents = [
            r[0]
            for r in o.select(
                F.floor(
                    F.col("o_totalprice").cast("double") * 1e2 + F.lit(0.5)
                ).cast("long")
            ).collect()
        ]
        from collections import Counter

        exp = Counter(int(str(c)[0]) for c in cents if c > 0)
        got = {
            r["first_digit"]: r
            for r in catalog()["prof_benford"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(exp)
        total = sum(exp.values())
        for d, n in exp.items():
            assert got[d]["n"] == n
            assert abs(got[d]["observed_share"] - n / total) < 1e-6
            assert (
                abs(got[d]["benford_share"] - math.log10(1 + 1 / d)) < 1e-6
            )
        assert abs(sum(r["observed_share"] for r in got.values()) - 1.0) < 1e-5
        assert sum(r["chi2_term"] for r in got.values()) > 0.01


class TestMmrDiversify:
    def test_greedy_replay_and_diversity(self, spark):
        """The 5 selections equal a Python greedy MMR replay over the
        same candidate pool, and diversification actually bites: the MMR
        set's max internal similarity is <= the plain top-5's (with the
        pool's sim spread nonzero, so the property isn't vacuous)."""
        import numpy as np

        emb = {
            r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in load(spark, SF_DIR, "embeddings").collect()
        }
        qv = emb[0]

        def cos(x, y):
            return float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y)))

        rel = {i: cos(v, qv) for i, v in emb.items() if i != 0}
        pool = sorted(rel, key=lambda i: (-rel[i], i))[:10]
        sims = {
            (a, b): cos(emb[a], emb[b]) for a in pool for b in pool if a != b
        }

        def qs(x):
            import math

            return math.floor(x * 1e9 + 0.5) / 1e9

        # round 1 argmaxes the QUANTIZED score too (ties at 1e-9 must
        # resolve identically in all three implementations)
        sel = [min(pool, key=lambda i: (-qs(0.7 * rel[i]), i))]
        scores = {sel[0]: qs(0.7 * rel[sel[0]])}
        while len(sel) < 5:
            best = None
            for c in pool:
                if c in sel:
                    continue
                s = qs(0.7 * rel[c] - 0.3 * max(sims[(c, t)] for t in sel))
                if best is None or (-s, c) < (-best[1], best[0]):
                    best = (c, s)
            sel.append(best[0])
            scores[best[0]] = best[1]

        got = sorted(
            catalog()["ext_mmr_diversify"].fn(spark, SF_DIR).collect(),
            key=lambda r: r["rank"],
        )
        assert [r["vec_id"] for r in got] == sel
        for r in got:
            assert abs(r["mmr_score"] - scores[r["vec_id"]]) < 1e-9
            assert abs(r["rel"] - rel[r["vec_id"]]) < 1e-9
        # diversity property vs the plain top-5
        top5 = pool[:5]
        mx_plain = max(sims[(a, b)] for a in top5 for b in top5 if a != b)
        mx_mmr = max(sims[(a, b)] for a in sel for b in sel if a != b)
        assert mx_mmr <= mx_plain + 1e-12


class TestScanStateStore:
    def test_state_matches_batch_and_store_shape(self, spark):
        """The state rows reproduce the batch aggregate exactly, one state
        row per live key, and every row lives in one of the 8 sized state
        partitions."""
        from billing_data_loader_spark.streaming.jobs import (
            _ensure_state_coordinator,
            _state_store_checkpoint,
        )

        got = {
            r["event_type"]: r
            for r in catalog()["scan_state_store"].fn(spark, SF_DIR).collect()
        }
        ev = load(spark, SF_DIR, "events")
        exp = {
            r["event_type"]: r
            for r in ev.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                (
                    F.sum(
                        F.floor(
                            F.col("value").cast("double") * 1e2 + F.lit(0.5)
                        ).cast("long")
                    ).cast("double")
                    / 1e2
                ).alias("sum_value"),
            )
            .collect()
        }
        assert set(got) == set(exp)
        for t, e in exp.items():
            assert got[t]["n_events"] == e["n_events"]
            assert abs(got[t]["sum_value"] - e["sum_value"]) < 1e-9
        # raw store shape: one row per live key, partitions within width
        ckpt = _state_store_checkpoint(spark, SF_DIR)
        _ensure_state_coordinator(spark, SF_DIR)
        raw = spark.read.format("statestore").load(ckpt).collect()
        assert len(raw) == len(exp)
        assert all(0 <= r["partition_id"] < 8 for r in raw)
