"""Round-11 continuation tests: independent replays and invariants for
the vacuum planner, the incremental (CDC) read plan, the ACF estimator,
candidate-key discovery, and committed-use billing."""

from __future__ import annotations

import glob
import json
import math
from collections import defaultdict

from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


def _staged_log_rows(spark) -> list[dict]:
    """Read the staged transaction log directly off disk (pure Python,
    no Spark) — the independent side of the replay."""
    from billing_data_loader_spark.operators.lakeops import _txn_log_frame

    # ensure the log is staged, then locate its directory via the same
    # content-addressed key the operator used
    _txn_log_frame(spark, SF_DIR).count()
    from billing_data_loader_spark.operators.corpus_ops import (
        _corpus_fingerprint,
    )
    from billing_data_loader_spark.sources.connectors import scratch_dir

    mt, sz = _corpus_fingerprint(SF_DIR, table="orders")
    staged = scratch_dir(SF_DIR, f"txn_log-{mt}-{sz}")
    rows = []
    for path in glob.glob(f"{staged}/part-*.json") + glob.glob(
        f"{staged}/*.json"
    ):
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
    assert rows, f"no staged log lines under {staged}"
    return rows


def _latest_state(rows: list[dict], at_version: int) -> dict[str, dict]:
    """path -> its latest action at-or-before ``at_version`` plus the
    add payload size (removes carry size 0)."""
    state: dict[str, dict] = {}
    for r in sorted(rows, key=lambda r: r["version"]):
        if r["version"] > at_version:
            continue
        cur = state.setdefault(
            r["path"], {"op": None, "version": -1, "add_rows": 0}
        )
        cur["op"] = r["op"]
        cur["version"] = r["version"]
        cur["add_rows"] = max(cur["add_rows"], r["size_rows"])
    return state


class TestVacuumPlan:
    def test_python_replay_and_conservation(self, spark):
        from billing_data_loader_spark.operators.lakeops import _VAC_HORIZON

        rows = _staged_log_rows(spark)
        head = max(r["version"] for r in rows)
        state = _latest_state(rows, head)
        exp = defaultdict(lambda: [0, 0])  # status -> [n_files, rows]
        for st in state.values():
            if st["op"] == "add":
                status = "live"
            elif head - st["version"] >= _VAC_HORIZON:
                status = "vacuum"
            else:
                status = "retained"
            exp[status][0] += 1
            exp[status][1] += st["add_rows"]

        got = {
            r["status"]: r
            for r in catalog()["ext_vacuum_plan"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(exp) == {"live", "retained", "vacuum"}
        for status, (n, rws) in exp.items():
            assert got[status]["n_files"] == n
            assert got[status]["total_rows"] == rws
        # conservation: every path's add payload books exactly once
        n_orders = load(spark, SF_DIR, "orders").count()
        assert sum(r["total_rows"] for r in got.values()) == n_orders


class TestIncrementalRead:
    def test_python_replay(self, spark):
        from billing_data_loader_spark.operators.lakeops import (
            _INC_FROM,
            _INC_TO,
        )

        rows = _staged_log_rows(spark)
        head = max(r["version"] for r in rows)
        live_a = {
            p: st
            for p, st in _latest_state(rows, head - _INC_FROM).items()
            if st["op"] == "add"
        }
        live_b = {
            p: st
            for p, st in _latest_state(rows, head - _INC_TO).items()
            if st["op"] == "add"
        }
        exp = {}
        for p in set(live_a) | set(live_b):
            if p not in live_a:
                exp[p] = ("added", live_b[p]["add_rows"])
            elif p not in live_b:
                exp[p] = ("removed", live_a[p]["add_rows"])
            else:
                exp[p] = ("unchanged", live_b[p]["add_rows"])

        got = {
            r["path"]: (r["status"], r["size_rows"])
            for r in catalog()["ext_incremental_read"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert got == exp
        # every class genuinely populated at this fixture
        statuses = {s for s, _ in got.values()}
        assert statuses == {"added", "removed", "unchanged"}


class TestAcf:
    def test_numpy_replay(self, spark):
        import numpy as np

        ev = (
            load(spark, SF_DIR, "events")
            .select("ts", "value")
            .collect()
        )
        daily: dict = defaultdict(int)
        for r in ev:
            daily[r["ts"].date()] += int(
                math.floor(r["value"] * 100 + 0.5)
            )
        x = np.array(
            [daily[d] for d in sorted(daily)], dtype=np.float64
        )
        n = len(x)
        m = x.sum() / n
        denom = ((x - m) ** 2).sum()
        got = {
            r["lag"]: r
            for r in catalog()["ts_acf"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(range(1, 8))
        for k in range(1, 8):
            exp = ((x[:-k] - m) * (x[k:] - m)).sum() / denom
            assert got[k]["n_pairs"] == n - k
            assert abs(got[k]["acf"] - exp) < 2e-6, (k, got[k]["acf"], exp)

    def test_acf_bounds(self, spark):
        """Cauchy-Schwarz bound: every sample ACF sits in [-1, 1], and
        the series is non-degenerate (some lag shows real structure).
        (The 30-day sf0.01 slice is too short for lag-7 weekly-cycle
        dominance — that diagnostic only emerges on longer windows.)"""
        got = {
            r["lag"]: r["acf"]
            for r in catalog()["ts_acf"].fn(spark, SF_DIR).collect()
        }
        assert all(abs(v) <= 1.0 + 1e-6 for v in got.values())
        assert any(abs(v) > 0.01 for v in got.values())


class TestCandidateKeys:
    def test_key_flags_and_row_conservation(self, spark):
        li = load(spark, SF_DIR, "lineitem")
        n = li.count()
        got = {
            r["candidate"]: r
            for r in catalog()["prof_candidate_keys"]
            .fn(spark, SF_DIR)
            .collect()
        }
        # the 4-column combination is the fixture's true key; the
        # dbgen-style (orderkey, linenumber) pair is deliberately only a
        # NEAR-key in the synthetic fixture
        assert got["l_orderkey+l_linenumber+l_partkey+l_suppkey"]["is_key"] == 1
        near = got["l_orderkey+l_linenumber"]
        assert near["is_key"] == 0 and 0.5 < near["uniqueness"] < 1.0
        for cand in ("l_orderkey", "l_partkey+l_suppkey", "l_shipdate"):
            assert got[cand]["is_key"] == 0
            assert got[cand]["n_dup_rows"] > 0
        for r in got.values():
            assert r["n_rows"] == n
            assert r["n_groups"] + r["n_dup_rows"] == n
            assert 0 < r["uniqueness"] <= 1.0


class TestUsageCommitment:
    def test_python_replay(self, spark):
        from billing_data_loader_spark.operators.billing_revenue import (
            _UC_COMMIT_RATE,
            _UC_OVERAGE_RATE,
        )

        ev = load(spark, SF_DIR, "events").select("ts", "user_id").collect()
        used: dict = defaultdict(int)
        for r in ev:
            used[(r["ts"].strftime("%Y-%m"), r["user_id"])] += 1
        exp = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
        for (month, uid), u in used.items():
            commit = 50 * (1 + uid % 4)
            e = exp[month]
            e[0] += 1
            e[1] += u
            e[2] += commit * _UC_COMMIT_RATE
            over = max(u - commit, 0) * _UC_OVERAGE_RATE
            e[3] += over
            e[4] += 1 if over > 0 else 0
            e[5] += max(commit - u, 0)
        got = {
            r["month"]: r
            for r in catalog()["bill_usage_commitment"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(exp)
        over_total = 0
        expired_total = 0
        for month, e in exp.items():
            g = got[month]
            assert (
                g["n_users"],
                g["used_units"],
                g["commit_cents"],
                g["overage_cents"],
                g["users_over_commit"],
                g["expired_units"],
            ) == tuple(e)
            over_total += g["overage_cents"]
            expired_total += g["expired_units"]
        # both contract branches genuinely exercised by the fixture
        assert over_total > 0 and expired_total > 0


class TestKcenterCoreset:
    def test_numpy_greedy_replay(self, spark):
        import numpy as np

        rows = (
            load(spark, SF_DIR, "embeddings")
            .select("vec_id", "embedding")
            .collect()
        )
        ids = np.array([r["vec_id"] for r in rows])
        X = np.array(
            [[float(x) for x in r["embedding"]] for r in rows],
            dtype=np.float64,
        )
        order = np.argsort(ids)
        ids, X = ids[order], X[order]

        def dist_to(c):
            return np.round(((X - c) ** 2).sum(axis=1), 9)

        seed_idx = int(np.where(ids == 0)[0][0])
        mind = dist_to(X[seed_idx])
        exp = [(1, 0, 0.0)]
        for r in range(2, 6):
            # argmax with lowest-vec_id tie break
            best = mind.max()
            pick_idx = int(np.where(mind == best)[0][0])
            exp.append((r, int(ids[pick_idx]), float(best)))
            if r < 5:
                mind = np.minimum(mind, dist_to(X[pick_idx]))

        got = sorted(
            (
                (r["sel_round"], r["vec_id"], r["radius_sq"])
                for r in catalog()["ext_kcenter_coreset"]
                .fn(spark, SF_DIR)
                .collect()
            )
        )
        assert [g[0] for g in got] == [e[0] for e in exp]
        assert [g[1] for g in got] == [e[1] for e in exp], (got, exp)
        for g, e in zip(got, exp):
            assert abs(g[2] - e[2]) < 1e-6
        # the covering radius is monotone non-increasing from round 2 on
        radii = [g[2] for g in got][1:]
        assert all(a >= b for a, b in zip(radii, radii[1:]))


class TestClusterPurity:
    def test_consistency_with_assignment(self, spark):
        from collections import Counter

        from billing_data_loader_spark.operators.ann import ext_kmeans_lite

        assigned = {
            r["vec_id"]: r["cluster_id"]
            for r in ext_kmeans_lite(spark, SF_DIR).collect()
        }
        labels = {
            r["vec_id"]: r["label"]
            for r in load(spark, SF_DIR, "embeddings")
            .select("vec_id", "label")
            .collect()
        }
        by_cluster: dict = defaultdict(Counter)
        for vid, cid in assigned.items():
            by_cluster[cid][labels[vid]] += 1

        got = {
            r["cluster_id"]: r
            for r in catalog()["ext_cluster_purity"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(by_cluster)
        total = 0
        for cid, cnt in by_cluster.items():
            g = got[cid]
            assert g["cluster_size"] == sum(cnt.values())
            assert g["n_labels"] == len(cnt)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            assert (g["majority_label"], g["majority_cnt"]) == best
            assert abs(g["purity"] - best[1] / sum(cnt.values())) < 1e-12
            total += g["cluster_size"]
        assert total == len(assigned)


class TestJaccardNeighbors:
    def test_invariants_and_direct_flag(self, spark):
        from billing_data_loader_spark.operators.graph import (
            _JN_DEN,
            _JN_NUM,
        )

        rows = catalog()["ext_jaccard_neighbors"].fn(spark, SF_DIR).collect()
        assert rows
        saw_indirect = False
        for r in rows:
            assert r["a"] < r["b"]
            assert 0 < r["common_cnt"] <= min(r["deg_a"], r["deg_b"])
            union = r["deg_a"] + r["deg_b"] - r["common_cnt"]
            assert _JN_DEN * r["common_cnt"] >= _JN_NUM * union
            assert abs(r["jaccard"] - r["common_cnt"] / union) < 1e-12
            assert r["jaccard"] <= 1.0
            saw_indirect = saw_indirect or r["is_direct"] == 0
        # the payoff class (similar but never co-purchased) is populated
        assert saw_indirect


class TestUrlCanonicalDedup:
    def test_urllib_replay(self, spark):
        """Independent canonicalization via urllib.parse (different
        machinery from the shared regex pipeline) must induce the same
        dedup groups."""
        from urllib.parse import parse_qsl, urlencode, urlsplit

        rows = (
            load(spark, SF_DIR, "documents")
            .selectExpr(
                "doc_id",
                "lang",
            )
            .collect()
        )

        def raw_url(doc_id: int, lang: str) -> str:
            k = doc_id % 211
            v = doc_id % 5
            if v == 0:
                return f"https://www.example.com/p/{k}"
            if v == 1:
                return f"HTTPS://WWW.Example.COM/p/{k}"
            if v == 2:
                return f"https://www.example.com:443/p/{k}"
            if v == 3:
                return (
                    f"https://www.example.com/p/{k}"
                    f"?utm_source=feed&lang={lang}&utm_campaign=x"
                )
            return f"https://www.example.com/p/{k}/#sec-{doc_id}"

        def canon(u: str) -> str:
            sp = urlsplit(u)
            host = sp.netloc.lower()
            if host.endswith(":443"):
                host = host[: -len(":443")]
            path = sp.path.rstrip("/")
            q = [
                (k, v)
                for k, v in parse_qsl(sp.query, keep_blank_values=True)
                if not k.startswith("utm_")
            ]
            qs = "?" + urlencode(q) if q else ""
            return f"{sp.scheme.lower()}://{host}{path}{qs}"

        exp_groups: dict = defaultdict(list)
        for r in rows:
            exp_groups[canon(raw_url(r["doc_id"], r["lang"]))].append(
                r["doc_id"]
            )

        got = {
            r["canonical_url"]: r
            for r in catalog()["ext_url_canonical_dedup"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(exp_groups)
        for cu, members in exp_groups.items():
            g = got[cu]
            assert g["n_docs"] == len(members)
            assert g["keep_doc_id"] == min(members)
            assert g["n_dropped"] == len(members) - 1
        # genuine collapse happened (mirror variants merged)
        assert sum(g["n_dropped"] for g in got.values()) > 0


class TestRangeBucketed:
    def test_bruteforce_replay_and_plan(self, spark):
        from datetime import timedelta

        ev = (
            load(spark, SF_DIR, "events")
            .select("event_id", "ts", "event_type", "value")
            .collect()
        )
        views = [
            (r["ts"], int(math.floor(r["value"] * 100 + 0.5)))
            for r in ev
            if r["event_type"] == "view"
        ]
        exp = {}
        for r in ev:
            if r["event_type"] != "purchase" or r["event_id"] % 97 != 0:
                continue
            lo = r["ts"] - timedelta(hours=1)
            n = c = 0
            for vts, cents in views:
                if lo < vts <= r["ts"]:
                    n += 1
                    c += cents
            exp[r["event_id"]] = (n, c)

        df = catalog()["join_range_bucketed"].fn(spark, SF_DIR)
        rows = df.collect()
        got = {
            r["event_id"]: (r["n_views_1h"], r["view_cents_1h"])
            for r in rows
        }
        assert got == exp
        # the decomposition's point: the executed plan must carry NO
        # nested-loop / cartesian join
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestStratifiedKfold:
    def test_balance_and_replay(self, spark):
        import hashlib

        from billing_data_loader_spark.operators.corpus_ops import (
            _KFOLD_K,
            _KFOLD_SALT,
        )

        rows = (
            load(spark, SF_DIR, "documents")
            .select("doc_id", "lang", "n_chars")
            .collect()
        )
        by_lang: dict = defaultdict(list)
        for r in rows:
            h = hashlib.md5(
                f"{r['doc_id']}{_KFOLD_SALT}".encode()
            ).hexdigest()
            by_lang[r["lang"]].append((h, r["doc_id"], r["n_chars"]))
        exp = defaultdict(lambda: [0, 0])
        for lang, members in by_lang.items():
            members.sort()
            for i, (_, _, nc) in enumerate(members):
                e = exp[(i % _KFOLD_K, lang)]
                e[0] += 1
                e[1] += nc
        got = {
            (r["fold"], r["lang"]): (r["n_docs"], r["n_chars_sum"])
            for r in catalog()["ext_stratified_kfold"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert got == {k: tuple(v) for k, v in exp.items()}
        # exact balance: per lang, fold sizes differ by at most 1
        for lang in by_lang:
            sizes = [
                got[(f, lang)][0] for f in range(_KFOLD_K) if (f, lang) in got
            ]
            assert max(sizes) - min(sizes) <= 1


class TestPerplexityBucketMix:
    def test_tercile_balance_and_ordering(self, spark):
        rows = catalog()["ext_perplexity_bucket_mix"].fn(spark, SF_DIR).collect()
        by_lang: dict = defaultdict(dict)
        for r in rows:
            by_lang[r["lang"]][r["bucket"]] = r
        n_docs_total = 0
        for lang, buckets in by_lang.items():
            assert set(buckets) == {"head", "middle", "tail"}
            sizes = [buckets[b]["n_docs"] for b in ("head", "middle", "tail")]
            assert max(sizes) - min(sizes) <= 1  # NTILE balance
            # head is the most fluent tercile by construction
            assert (
                buckets["head"]["mean_logprob"]
                >= buckets["middle"]["mean_logprob"]
                >= buckets["tail"]["mean_logprob"]
            )
            n_docs_total += sum(sizes)
        assert n_docs_total == load(spark, SF_DIR, "documents").count()


class TestSpanMask:
    def test_roundtrip_and_replay(self, spark):
        from billing_data_loader_spark.operators.segmentation import (
            _SM_PERIOD,
            _SM_SPAN,
        )

        docs = {
            r["doc_id"]: r["text"]
            for r in load(spark, SF_DIR, "documents")
            .select("doc_id", "text")
            .collect()
        }
        got = {
            r["doc_id"]: r
            for r in catalog()["ext_span_mask"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(docs)
        saw_masked = saw_unmasked = False
        for doc_id, text in docs.items():
            toks = text.split(" ")
            off = doc_id % _SM_PERIOD
            anchors = [
                i
                for i in range(len(toks))
                if (i - off) % _SM_PERIOD == 0 and i + _SM_SPAN <= len(toks)
            ]
            g = got[doc_id]
            assert g["n_tokens"] == len(toks)
            assert g["n_spans"] == len(anchors)
            assert g["n_masked"] == len(anchors) * _SM_SPAN
            # independent reconstruction
            masked = {
                p for a in anchors for p in range(a, a + _SM_SPAN)
            }
            inp = []
            for i, t in enumerate(toks):
                if i in anchors:
                    inp.append(f"<extra_id_{anchors.index(i)}>")
                elif i not in masked:
                    inp.append(t)
            tgt = " ".join(
                f"<extra_id_{k}> " + " ".join(toks[a : a + _SM_SPAN])
                for k, a in enumerate(anchors)
            )
            assert g["input_text"] == " ".join(inp)
            assert g["target_text"] == tgt
            # round-trip: splicing targets back into input recovers text
            recovered = g["input_text"]
            for k, a in enumerate(anchors):
                recovered = recovered.replace(
                    f"<extra_id_{k}>",
                    " ".join(toks[a : a + _SM_SPAN]),
                    1,
                )
            assert recovered == text
            saw_masked = saw_masked or bool(anchors)
            saw_unmasked = saw_unmasked or not anchors
        assert saw_masked  # corruption actually fires on the fixture


class TestRfmFeatures:
    def test_numpy_replay(self, spark):
        import numpy as np

        ev = (
            load(spark, SF_DIR, "events")
            .filter("event_type = 'purchase'")
            .select("user_id", "ts", "value")
            .collect()
        )
        per_user: dict = {}
        for r in ev:
            u = per_user.setdefault(r["user_id"], [0, 0, None])
            u[0] += 1
            u[1] += int(math.floor(r["value"] * 100 + 0.5))
            d = r["ts"].date()
            u[2] = d if u[2] is None or d > u[2] else u[2]
        g_day = max(u[2] for u in per_user.values())
        rows = [
            (freq, cents, (g_day - last).days)
            for freq, cents, last in per_user.values()
        ]
        rec = np.array([r[2] for r in rows], dtype=float)
        frq = np.array([r[0] for r in rows], dtype=float)
        mon = np.array([r[1] for r in rows], dtype=float)
        qs = [0.2, 0.4, 0.6, 0.8]
        rb = [round(float(np.quantile(rec, q)), 4) for q in qs]
        fb = [round(float(np.quantile(frq, q)), 4) for q in qs]
        mb = [round(float(np.quantile(mon, q)), 4) for q in qs]

        def seg(r_s, f_s, m_s):
            if r_s >= 4 and f_s >= 4 and m_s >= 4:
                return "champion"
            if r_s <= 2 and f_s >= 4:
                return "at_risk"
            if r_s <= 2:
                return "hibernating"
            if f_s >= 4:
                return "loyal"
            if m_s >= 4:
                return "big_spender"
            return "regular"

        exp = defaultdict(lambda: [0, 0, 0, 0])
        for freq, cents, rdays in rows:
            r_s = 6 - (1 + sum(rdays > b for b in rb))
            f_s = 1 + sum(freq > b for b in fb)
            m_s = 1 + sum(cents > b for b in mb)
            e = exp[seg(r_s, f_s, m_s)]
            e[0] += 1
            e[1] += freq
            e[2] += cents
            e[3] += rdays
        got = {
            r["segment"]: (
                r["n_users"],
                r["n_purchases"],
                r["monetary_cents"],
                r["recency_days_sum"],
            )
            for r in catalog()["ext_rfm_features"].fn(spark, SF_DIR).collect()
        }
        assert got == {k: tuple(v) for k, v in exp.items()}
        assert sum(v[0] for v in got.values()) == len(per_user)
        assert len(got) >= 3  # a real segment spread, not one bucket


class TestKnnLabelSpread:
    def test_consistency_with_graph(self, spark):
        from collections import Counter

        from billing_data_loader_spark.operators.ann import ext_knn_graph

        labels = {
            r["vec_id"]: r["label"]
            for r in load(spark, SF_DIR, "embeddings")
            .select("vec_id", "label")
            .collect()
        }
        nbrs: dict = defaultdict(list)
        for r in ext_knn_graph(spark, SF_DIR).collect():
            nbrs[r["vec_id"]].append(r["nbr_id"])

        got = {
            r["vec_id"]: r
            for r in catalog()["ext_knn_label_spread"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(nbrs)
        n_suspects = 0
        for vid, ns in nbrs.items():
            own = labels[vid]
            votes = Counter(labels[n] for n in ns)
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            g = got[vid]
            assert g["own_label"] == own
            assert g["n_nbrs"] == len(ns) == 3
            assert g["n_agree"] == sum(
                1 for n in ns if labels[n] == own
            )
            assert (g["nbr_majority_label"], g["majority_cnt"]) == best
            assert g["is_suspect"] == (1 if g["n_agree"] == 0 else 0)
            n_suspects += g["is_suspect"]
        # the screen genuinely fires on the isotropic fixture
        assert 0 < n_suspects < len(nbrs)


class TestTrendByType:
    def test_numpy_replay(self, spark):
        import numpy as np

        ev = (
            load(spark, SF_DIR, "events")
            .select("event_type", "ts", "value")
            .collect()
        )
        from datetime import date

        epoch = date(1992, 1, 1)
        daily: dict = defaultdict(int)
        for r in ev:
            x = (r["ts"].date() - epoch).days
            daily[(r["event_type"], x)] += int(
                math.floor(r["value"] * 100 + 0.5)
            )
        series: dict = defaultdict(list)
        for (et, x), y in daily.items():
            series[et].append((x, y))
        got = {
            r["event_type"]: r
            for r in catalog()["ts_trend_by_type"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(series)
        for et, pts in series.items():
            xs = np.array([p[0] for p in pts], dtype=float)
            ys = np.array([p[1] for p in pts], dtype=float)
            slope, icept = np.polyfit(xs, ys, 1)
            r = np.corrcoef(xs, ys)[0, 1]
            g = got[et]
            assert g["n_days"] == len(pts)
            assert abs(g["slope_cents_per_day"] - slope) < max(
                2e-6, abs(slope) * 1e-9
            )
            assert abs(g["intercept_cents"] - icept) < max(
                2e-6, abs(icept) * 1e-9
            )
            assert abs(g["r2"] - r * r) < 2e-6


class TestMatryoshkaRecall:
    def test_numpy_replay(self, spark):
        import numpy as np

        rows = (
            load(spark, SF_DIR, "embeddings")
            .select("vec_id", "embedding")
            .collect()
        )
        vecs = {
            r["vec_id"]: np.array(
                [float(x) for x in r["embedding"]], dtype=np.float64
            )
            for r in rows
        }
        q = vecs[0]

        def topk(dim):
            scored = []
            for vid, v in vecs.items():
                if vid == 0:
                    continue
                a, b = v[:dim], q[:dim]
                c = round(
                    float(
                        a.dot(b)
                        / (math.sqrt(a.dot(a)) * math.sqrt(b.dot(b)))
                    ),
                    9,
                )
                scored.append((-c, vid))
            scored.sort()
            return [(vid, -negc) for negc, vid in scored[:10]]

        full = topk(64)
        trunc = topk(16)
        full_set = {vid for vid, _ in full}

        got = sorted(
            catalog()["ext_matryoshka_recall"].fn(spark, SF_DIR).collect(),
            key=lambda r: r["rnk"],
        )
        assert len(got) == 10
        for i, g in enumerate(got):
            assert g["rnk"] == i + 1
            assert g["full_id"] == full[i][0]
            assert g["trunc_id"] == trunc[i][0]
            assert abs(g["cos_full"] - full[i][1]) < 1e-6
            assert abs(g["cos_tr"] - trunc[i][1]) < 1e-6
            assert g["trunc_hit_in_full_topk"] == (
                1 if trunc[i][0] in full_set else 0
            )
        # recall@10 is readable off the flag column and is a real number
        recall = sum(g["trunc_hit_in_full_topk"] for g in got) / 10
        assert 0.0 <= recall <= 1.0
