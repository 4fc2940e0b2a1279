"""Round-11 semantic tests: Python replays and conservation invariants
for tiered rating, revenue recognition, FIFO payment application, the
LTV triangle, streak islands, CUSUM changepoints, FD discovery, the DQ
rule suite, association rules, attribution, hard negatives, and the
transaction-log snapshot."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


def _cents(x: float) -> int:
    return int(math.floor(x * 100 + 0.5))


class TestTieredRating:
    def test_python_replay(self, spark):
        """Units and revenue per (flag, tier) equal a per-line Python
        replay of the clamp formula, and tier-1 units conserve the
        min(q, 10) line total."""
        from billing_data_loader_spark.operators.billing_revenue import _TIERS

        rows = (
            load(spark, SF_DIR, "lineitem")
            .select("l_returnflag", "l_quantity")
            .collect()
        )
        exp: dict[tuple, list] = defaultdict(lambda: [0, 0])
        for r in rows:
            q = int(math.floor(r["l_quantity"] + 0.5))
            for name, lo, width, rate in _TIERS:
                u = min(max(q - lo, 0), width)
                if u > 0:
                    exp[(r["l_returnflag"], name)][0] += u
                    exp[(r["l_returnflag"], name)][1] += u * rate
        got = {
            (r["l_returnflag"], r["tier"]): r
            for r in catalog()["bill_tiered_rating"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(exp)
        for k, (u, rev) in exp.items():
            assert got[k]["units"] == u
            assert got[k]["revenue_cents"] == rev


class TestRevenueRecognition:
    def test_conservation_and_term_bounds(self, spark):
        """The recognition schedule conserves total invoice cents
        EXACTLY (the ledger must balance), and per-month contract counts
        never exceed the order count."""
        orders = load(spark, SF_DIR, "orders").select("o_totalprice").collect()
        total = sum(_cents(r["o_totalprice"]) for r in orders)
        sched = catalog()["bill_revenue_recognition"].fn(spark, SF_DIR).collect()
        assert sum(r["recognized_cents"] for r in sched) == total
        assert max(r["n_contracts"] for r in sched) <= len(orders)

    def test_largest_remainder_replay(self, spark):
        """One order's schedule equals the largest-remainder rule."""
        r = (
            load(spark, SF_DIR, "orders")
            .orderBy("o_orderkey")
            .limit(1)
            .collect()[0]
        )
        cents = _cents(r["o_totalprice"])
        n = 1 + r["o_orderkey"] % 12
        base, rem = divmod(cents, n)
        sched = [base + (1 if m < rem else 0) for m in range(n)]
        assert sum(sched) == cents
        assert max(sched) - min(sched) <= 1


class TestCreditFifo:
    def test_python_fifo_replay(self, spark):
        """Per-invoice allocation, payment count, and the completing
        payment id equal a sequential Python FIFO replay for every
        customer in the declared slice."""
        inv_rows = (
            load(spark, SF_DIR, "orders")
            .filter(F.expr("o_custkey % 7 = 3"))
            .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate")
            .collect()
        )
        pay_rows = (
            load(spark, SF_DIR, "events")
            .filter(F.expr("event_type = 'purchase' AND user_id % 7 = 3"))
            .select("user_id", "event_id", "value", "ts")
            .collect()
        )
        invs: dict[int, list] = defaultdict(list)
        for r in inv_rows:
            invs[r["o_custkey"]].append(
                (r["o_orderdate"], r["o_orderkey"], _cents(r["o_totalprice"]))
            )
        pays: dict[int, list] = defaultdict(list)
        for r in pay_rows:
            pays[r["user_id"]].append(
                (r["ts"], r["event_id"], _cents(r["value"]))
            )
        exp = {}
        for cust, iv in invs.items():
            iv.sort()
            queue = sorted(pays.get(cust, []))
            # sequential FIFO: walk payments into invoices oldest-first
            alloc = {k: 0 for _, k, _ in iv}
            touched = {k: set() for _, k, _ in iv}
            completing = {k: -1 for _, k, _ in iv}
            i = 0
            remaining = [c for _, _, c in iv]
            for _, pay_id, pc in queue:
                left = pc
                while left > 0 and i < len(iv):
                    k = iv[i][1]
                    take = min(left, remaining[i])
                    if take > 0:
                        alloc[k] += take
                        touched[k].add(pay_id)
                        remaining[i] -= take
                        left -= take
                    if remaining[i] == 0:
                        if completing[k] == -1:
                            completing[k] = pay_id
                        i += 1
                    else:
                        break
            for _, k, cents in iv:
                status = (
                    "paid"
                    if alloc[k] == cents
                    else ("partial" if alloc[k] > 0 else "unpaid")
                )
                exp[k] = (alloc[k], len(touched[k]), completing[k], status)
        got = {
            r["inv_id"]: r
            for r in catalog()["bill_credit_fifo"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(exp)
        for k, (alloc, n_pay, completing, status) in exp.items():
            assert got[k]["alloc_cents"] == alloc, k
            assert got[k]["n_payments"] == n_pay, k
            assert got[k]["completing_payment"] == completing, k
            assert got[k]["status"] == status, k


class TestLtvTriangle:
    def test_cumulative_monotone_and_conservation(self, spark):
        """Per cohort the cumulative revenue is nondecreasing in age,
        and the final cumulative total over cohorts equals the total
        purchase cents of the slice."""
        rows = catalog()["bill_ltv_triangle"].fn(spark, SF_DIR).collect()
        by_cohort: dict = defaultdict(list)
        for r in rows:
            by_cohort[r["cohort_week"]].append((r["age_n"], r["cum_cents"]))
        last_total = 0
        for cohort, cells in by_cohort.items():
            cells.sort()
            assert all(
                a[1] <= b[1] for a, b in zip(cells, cells[1:])
            ), cohort
            last_total += cells[-1][1]
        total = sum(
            _cents(r["value"])
            for r in load(spark, SF_DIR, "events")
            .filter("event_type = 'purchase'")
            .select("value")
            .collect()
        )
        assert last_total == total


class TestStreakIslands:
    def test_brute_force_replay(self, spark):
        """Longest streak / island count equal a Python scan of each
        user's sorted day set."""
        rows = (
            load(spark, SF_DIR, "events")
            .select("user_id", F.to_date("ts").alias("day"))
            .distinct()
            .collect()
        )
        days: dict = defaultdict(set)
        for r in rows:
            days[r["user_id"]].add(r["day"])
        exp = {}
        for u, ds in days.items():
            ordered = sorted(ds)
            runs, cur = [], 1
            for a, b in zip(ordered, ordered[1:]):
                if (b - a).days == 1:
                    cur += 1
                else:
                    runs.append(cur)
                    cur = 1
            runs.append(cur)
            exp[u] = (len(ordered), len(runs), max(runs))
        got = {
            r["user_id"]: r
            for r in catalog()["win_streak_islands"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(exp)
        for u, (nd, ni, mx) in exp.items():
            assert got[u]["n_active_days"] == nd
            assert got[u]["n_islands"] == ni
            assert got[u]["longest_streak"] == mx


class TestCusum:
    def test_numpy_replay(self, spark):
        """CUSUM values and the peak flag equal a numpy replay over the
        exact daily cents."""
        import numpy as np

        rows = catalog()["ts_cusum_changepoint"].fn(spark, SF_DIR).collect()
        rows.sort(key=lambda r: r["day"])
        x = np.array([r["day_cents"] for r in rows], dtype=np.float64)
        mean = float(x.sum()) / len(x)
        cusum = np.cumsum(x - mean)
        peak = int(np.argmax(np.abs(cusum)))
        for i, r in enumerate(rows):
            assert abs(r["cusum"] - cusum[i]) < 1e-6 * max(1.0, abs(cusum[i]))
        flagged = [i for i, r in enumerate(rows) if r["is_changepoint"] == 1]
        assert peak in flagged
        # ties are astronomically unlikely on real cents but allowed:
        # every flagged day must carry the max |CUSUM|
        for i in flagged:
            assert abs(abs(cusum[i]) - abs(cusum[peak])) < 1e-9


class TestFdDiscovery:
    def test_known_fds_hold_and_violations_replay(self, spark):
        """The key FD and the derived-attribute FD hold (g3 = 0); a
        violated candidate's g3 equals the Python majority count."""
        got = {
            r["fd"]: r
            for r in catalog()["prof_fd_discovery"].fn(spark, SF_DIR).collect()
        }
        assert got["o_orderkey->o_orderpriority"]["holds"] == 1
        assert got["o_orderpriority->prio_class"]["holds"] == 1
        assert got["o_custkey->o_orderstatus"]["holds"] == 0
        rows = (
            load(spark, SF_DIR, "orders")
            .select("o_custkey", "o_orderstatus")
            .collect()
        )
        groups: dict = defaultdict(lambda: defaultdict(int))
        for r in rows:
            groups[r["o_custkey"]][r["o_orderstatus"]] += 1
        kept = sum(max(g.values()) for g in groups.values())
        r = got["o_custkey->o_orderstatus"]
        assert r["n_kept"] == kept
        assert r["n_rows"] == len(rows)


class TestDqRules:
    def test_pass_fail_partition(self, spark):
        """The deliberately-strict rules fail, everything else passes,
        and referential integrity is clean on the fixture."""
        got = {
            r["rule"]: r
            for r in catalog()["prof_dq_rules"].fn(spark, SF_DIR).collect()
        }
        assert got["domain_o_orderstatus_FO"]["passed"] == 0
        assert got["range_l_discount_0_5pct"]["passed"] == 0
        for rule in (
            "completeness_o_custkey",
            "uniqueness_o_orderkey",
            "domain_o_orderstatus_FOP",
            "positive_o_totalprice",
            "range_l_discount_0_10pct",
            "ref_lineitem_orderkey",
        ):
            assert got[rule]["passed"] == 1, rule
            assert got[rule]["n_ok"] == got[rule]["n_rows"], rule


class TestAssocRules:
    def test_python_replay(self, spark):
        """Rule counts and the support cut equal an itertools replay
        over the basket sets."""
        from itertools import combinations

        from billing_data_loader_spark.operators.market_basket import (
            _MINSUP_MUL,
        )

        li = (
            load(spark, SF_DIR, "lineitem")
            .join(
                load(spark, SF_DIR, "part"),
                F.col("l_partkey") == F.col("p_partkey"),
            )
            .select("l_orderkey", "p_brand")
            .collect()
        )
        baskets: dict = defaultdict(set)
        for r in li:
            baskets[r["l_orderkey"]].add(r["p_brand"])
        n = len(baskets)
        item_cnt: dict = defaultdict(int)
        pair_cnt: dict = defaultdict(int)
        for items in baskets.values():
            for it in items:
                item_cnt[it] += 1
            for a, b in combinations(sorted(items), 2):
                pair_cnt[(a, b)] += 1
        exp = {}
        for (a, b), c in pair_cnt.items():
            if _MINSUP_MUL * c >= n:
                exp[(a, b)] = c
                exp[(b, a)] = c
        got = {
            (r["antecedent"], r["consequent"]): r
            for r in catalog()["ext_assoc_rules"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(exp)
        for k, c in exp.items():
            assert got[k]["n_ab"] == c
            assert got[k]["n_ante"] == item_cnt[k[0]]
            # lift symmetry: A->B and B->A share the same lift
            assert abs(got[k]["lift"] - got[(k[1], k[0])]["lift"]) < 1e-12


class TestAttribution:
    def test_conservation(self, spark):
        """First-touch, last-touch, and the direct bucket each conserve
        the attributed purchase ledger exactly; linear credit conserves
        it up to the documented truncating-division remainder (< n_t
        micro-units per conversion)."""
        rows = catalog()["ext_attribution_credit"].fn(spark, SF_DIR).collect()
        by = {r["channel"]: r for r in rows}
        ev = (
            load(spark, SF_DIR, "events")
            .select("user_id", "ts", "event_id", "event_type", "value")
            .collect()
        )
        ev.sort(key=lambda r: (r["user_id"], r["ts"], r["event_id"]))
        touch_types = {"view", "click", "signup"}
        attributed = 0
        direct = 0
        n_purch = 0
        per_user: dict = defaultdict(list)
        for r in ev:
            per_user[r["user_id"]].append(r)
        for seq in per_user.values():
            # a purchase is attributed iff a touch occurred inside ITS
            # conversion window (since the previous purchase) — the
            # operator's window semantics
            touch_in_window = False
            for r in seq:
                if r["event_type"] in touch_types:
                    touch_in_window = True
                elif r["event_type"] == "purchase":
                    n_purch += 1
                    if touch_in_window:
                        attributed += _cents(r["value"])
                    else:
                        direct += _cents(r["value"])
                    touch_in_window = False
        chan_first = sum(
            by[c]["first_cents"] for c in by if c != "direct"
        )
        chan_last = sum(by[c]["last_cents"] for c in by if c != "direct")
        assert chan_first == attributed
        assert chan_last == attributed
        assert by["direct"]["first_cents"] == direct
        # linear: dollars * 1e6 micro-units vs attributed cents * 1e4
        linear_u = sum(
            round(by[c]["linear_dollars"] * 1e6)
            for c in by
            if c != "direct"
        )
        assert 0 <= attributed * 10000 - linear_u < n_purch * 10000


class TestHardNegatives:
    def test_numpy_replay(self, spark):
        """Negative/positive picks equal a numpy brute-force replay."""
        import numpy as np

        rows = (
            load(spark, SF_DIR, "embeddings")
            .select("vec_id", "label", "embedding")
            .collect()
        )
        ids = np.array([r["vec_id"] for r in rows])
        labels = np.array([r["label"] for r in rows])
        V = np.array([r["embedding"] for r in rows], dtype=np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        got: dict = defaultdict(list)
        for r in catalog()["ext_hard_negatives"].fn(spark, SF_DIR).collect():
            got[(r["anchor_id"], r["kind"])].append(
                (r["rnk"], r["cand_id"])
            )
        for a_idx in np.where(ids % 97 == 0)[0]:
            sims = Vn @ Vn[a_idx]
            order = sorted(
                (
                    (-sims[i], ids[i], i)
                    for i in range(len(ids))
                    if ids[i] != ids[a_idx]
                )
            )
            negs = [
                t[1] for t in order if labels[t[2]] != labels[a_idx]
            ][:5]
            pos = [t[1] for t in order if labels[t[2]] == labels[a_idx]][:1]
            key_n = (ids[a_idx], "neg")
            key_p = (ids[a_idx], "pos")
            assert [c for _, c in sorted(got[key_n])] == negs
            assert [c for _, c in sorted(got[key_p])] == pos


class TestTxnLogSnapshot:
    def test_retention_algebra_replay(self, spark):
        """The live set equals the Python replay of the add/remove
        retention algebra, sizes come from the ADD rows, and removed
        months are absent."""
        from billing_data_loader_spark.operators.lakeops import (
            _TXN_BACK,
            _TXN_RETAIN,
        )

        rows = (
            load(spark, SF_DIR, "orders")
            .select(
                F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            )
            .collect()
        )
        counts: dict = defaultdict(int)
        for r in rows:
            counts[r["ym"]] += 1
        vs = {
            ym: (int(ym[:4]) - 1995) * 12 + int(ym[5:]) - 1 for ym in counts
        }
        vmax = max(vs.values())
        head = max(
            [v + _TXN_RETAIN for v in vs.values() if v + _TXN_RETAIN <= vmax]
            + [vmax]
        )
        qv = head - _TXN_BACK
        exp = {
            f"orders/m={ym}": (counts[ym], v)
            for ym, v in vs.items()
            if v <= qv and not (v + _TXN_RETAIN <= min(vmax, qv))
        }
        got = {
            r["path"]: (r["size_rows"], r["added_version"])
            for r in catalog()["scan_txn_log_snapshot"].fn(spark, SF_DIR).collect()
        }
        assert got == exp


class TestRpTree:
    def test_numpy_construction_replay_and_balance(self, spark):
        """The tree construction (projections, per-node medians, leaf
        assignment) and the returned top-10 equal a numpy replay, and
        median splits keep every leaf within 1 of perfect balance."""
        import numpy as np

        rows = (
            load(spark, SF_DIR, "embeddings")
            .select("vec_id", "embedding")
            .collect()
        )
        ids = np.array([r["vec_id"] for r in rows])
        V = np.array([r["embedding"] for r in rows], dtype=np.float64)
        q = np.zeros((len(ids), 4), dtype=np.int64)
        for lv in range(4):
            w = np.array(
                [((j * 37 + lv * 101) % 19) - 9.0 for j in range(64)]
            )
            q[:, lv] = np.floor(V @ w * 1e9 + 0.5).astype(np.int64)
        node = np.zeros(len(ids), dtype=np.int64)
        for lv in range(4):
            new = node.copy()
            for nd in np.unique(node):
                mask = node == nd
                med = np.percentile(q[mask, lv], 50)
                new[mask] = nd * 2 + (q[mask, lv] > med)
            node = new
        sizes = np.bincount(node, minlength=16)
        assert sizes.sum() == len(ids)
        assert sizes.max() - sizes.min() <= 1
        anchor = int(np.where(ids == 0)[0][0])
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        sims = Vn @ Vn[anchor]
        leaf = node[anchor]
        cand = sorted(
            (
                (-sims[i], ids[i])
                for i in range(len(ids))
                if node[i] == leaf and ids[i] != 0
            )
        )
        exp = [c[1] for c in cand[:10]]
        got = catalog()["ext_ann_rptree"].fn(spark, SF_DIR).collect()
        got.sort(key=lambda r: r["rnk"])
        assert [r["cand_id"] for r in got] == exp
        assert all(r["leaf"] == leaf for r in got)


class TestSeasonalIndex:
    def test_weighted_mean_is_one(self, spark):
        """The n_days-weighted mean of the seasonal index is exactly 1
        (the multiplicative-decomposition identity), and the replayed
        ratios match."""
        rows = catalog()["ts_seasonal_index"].fn(spark, SF_DIR).collect()
        tot_days = sum(r["n_days"] for r in rows)
        weighted = sum(r["seasonal_index"] * r["n_days"] for r in rows)
        assert abs(weighted - tot_days) < 1e-9 * tot_days
        total = sum(r["dow_cents"] for r in rows)
        for r in rows:
            exp = (r["dow_cents"] / r["n_days"]) / (total / tot_days)
            assert abs(r["seasonal_index"] - exp) < 1e-12


class TestStreamOuterJoin:
    def test_matched_equals_inner_and_censoring(self, spark):
        """Matched rows equal the batch inner join; null-padded rows are
        exactly the unmatched views behind the final watermark (the
        right-censoring algebra)."""
        ev = (
            load(spark, SF_DIR, "events")
            .select("user_id", "ts", "event_type")
            .collect()
        )
        views = [(r["user_id"], r["ts"]) for r in ev if r["event_type"] == "view"]
        purch = [
            (r["user_id"], r["ts"]) for r in ev if r["event_type"] == "purchase"
        ]
        from datetime import timedelta

        hour = timedelta(hours=1)
        matches = {
            (u, vt)
            for u, vt in views
            for pu, pt in purch
            if pu == u and vt <= pt <= vt + hour
        }
        n_matched_pairs = sum(
            1
            for u, vt in views
            for pu, pt in purch
            if pu == u and vt <= pt <= vt + hour
        )
        wm = min(max(t for _, t in views), max(t for _, t in purch)) - hour
        exp_null = {
            (u, vt)
            for u, vt in views
            if (u, vt) not in matches and vt + hour < wm
        }
        rows = (
            catalog()["stream_outer_join_watermark"].fn(spark, SF_DIR).collect()
        )
        got_matched = [r for r in rows if r["matched"] == 1]
        got_null = {(r["user_id"], r["view_ts"]) for r in rows if r["matched"] == 0}
        assert len(got_matched) == n_matched_pairs
        assert got_null == exp_null


class TestEntropyProfile:
    def test_python_replay(self, spark):
        """Entropy bits and distinct ratios equal a Python replay over
        the exact value counts."""
        import math as m

        from billing_data_loader_spark.operators.profiling import _ENT_COLS

        rows = load(spark, SF_DIR, "orders").selectExpr(
            *(f"{e} AS c_{i}" for i, (_, e) in enumerate(_ENT_COLS))
        ).collect()
        got = {
            r["col"]: r
            for r in catalog()["prof_entropy_profile"].fn(spark, SF_DIR).collect()
        }
        for i, (name, _) in enumerate(_ENT_COLS):
            counts: dict = defaultdict(int)
            for r in rows:
                counts[r[f"c_{i}"]] += 1
            n = sum(counts.values())
            h = sum(c * m.log(n / c) for c in counts.values()) / n / m.log(2)
            hq = m.floor(h * 1e6 + 0.5) / 1e6
            assert got[name]["n_rows"] == n
            assert got[name]["n_distinct"] == len(counts)
            assert abs(got[name]["entropy_bits"] - hq) < 2e-6, name
            assert (
                abs(got[name]["distinct_ratio"] - len(counts) / n) < 1e-12
            )


class TestFreshnessLag:
    def test_python_replay(self, spark):
        """Lag and max-gap seconds equal a Python replay over exact
        microsecond integers."""
        rows = (
            load(spark, SF_DIR, "events")
            .selectExpr(
                "event_type", "unix_micros(ts) AS us", "event_id"
            )
            .collect()
        )
        per: dict = defaultdict(list)
        for r in rows:
            per[r["event_type"]].append((r["us"], r["event_id"]))
        max_us = max(r["us"] for r in rows)
        got = {
            r["event_type"]: r
            for r in catalog()["prof_freshness_lag"].fn(spark, SF_DIR).collect()
        }
        for t, seq in per.items():
            seq.sort()
            gaps = [b[0] - a[0] for a, b in zip(seq, seq[1:])]
            assert got[t]["n_events"] == len(seq)
            assert got[t]["lag_seconds"] == (max_us - seq[-1][0]) // 1000000
            assert got[t]["max_gap_seconds"] == (max(gaps) if gaps else 0) // 1000000


class TestSeasonalNaiveBacktest:
    def test_python_replay(self, spark):
        """MAE / MAPE / bias equal a Python replay of the calendar-
        aligned 7-day-lag errors."""
        rows = (
            load(spark, SF_DIR, "events")
            .selectExpr(
                "event_type",
                "CAST(ts AS DATE) AS day",
                "CAST(floor(value * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
                " AS cents",
            )
            .collect()
        )
        daily: dict = defaultdict(int)
        for r in rows:
            daily[(r["event_type"], r["day"])] += r["cents"]
        from datetime import timedelta

        week = timedelta(days=7)
        per: dict = defaultdict(list)
        for (t, d), a in daily.items():
            f = daily.get((t, d - week))
            if f is not None:
                per[t].append((a, f))
        got = {
            r["event_type"]: r
            for r in catalog()["ts_backtest_seasonal_naive"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(per)
        for t, pairs in per.items():
            n = len(pairs)
            mae = sum(abs(a - f) for a, f in pairs) / n / 100
            mape = sum(abs(a - f) * 1000000 // a for a, f in pairs) / n / 1e6
            bias = sum(a - f for a, f in pairs)
            assert got[t]["n_days"] == n
            assert abs(got[t]["mae_dollars"] - mae) < 1e-9
            assert abs(got[t]["mape"] - mape) < 1e-12
            assert got[t]["bias_cents"] == bias


class TestKnnGraph:
    def test_numpy_replay(self, spark):
        """Every point's top-3 neighbors and label-agreement flags equal
        the numpy brute force."""
        import numpy as np

        rows = (
            load(spark, SF_DIR, "embeddings")
            .select("vec_id", "label", "embedding")
            .collect()
        )
        ids = np.array([r["vec_id"] for r in rows])
        labels = {r["vec_id"]: r["label"] for r in rows}
        V = np.array([r["embedding"] for r in rows], dtype=np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = Vn @ Vn.T
        got: dict = defaultdict(dict)
        for r in catalog()["ext_knn_graph"].fn(spark, SF_DIR).collect():
            got[r["vec_id"]][r["rnk"]] = (r["nbr_id"], r["same_label"])
        assert set(got) == set(ids.tolist())
        for i, vid in enumerate(ids):
            order = sorted(
                ((-S[i, j], ids[j]) for j in range(len(ids)) if j != i)
            )[:3]
            for rnk, (_, nbr) in enumerate(order, start=1):
                g_nbr, g_same = got[vid][rnk]
                assert g_nbr == nbr, (vid, rnk)
                assert g_same == int(labels[nbr] == labels[vid])


class TestMovingMedian:
    def test_python_replay(self, spark):
        """The trailing-7 median equals a Python replay over the sorted
        daily series per type."""
        import statistics

        rows = catalog()["win_moving_median"].fn(spark, SF_DIR).collect()
        per: dict = defaultdict(list)
        for r in rows:
            per[r["event_type"]].append((r["day"], r["cents"], r["med7"]))
        for t, seq in per.items():
            seq.sort()
            cents = [c for _, c, _ in seq]
            for i, (_, _, got_med) in enumerate(seq):
                window = cents[max(0, i - 6) : i + 1]
                assert abs(got_med - statistics.median(window)) < 1e-9, (t, i)


class TestDsoFifo:
    def test_settlement_replay(self, spark):
        """Per-month DSO equals a Python replay driven by the SAME
        sequential FIFO walk the credit test uses (settlement = the
        payment that completes the invoice)."""
        inv_rows = (
            load(spark, SF_DIR, "orders")
            .filter(F.expr("o_custkey % 7 = 3"))
            .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate")
            .collect()
        )
        pay_rows = (
            load(spark, SF_DIR, "events")
            .filter(F.expr("event_type = 'purchase' AND user_id % 7 = 3"))
            .select("user_id", "event_id", "value", "ts")
            .collect()
        )
        invs: dict = defaultdict(list)
        for r in inv_rows:
            invs[r["o_custkey"]].append(
                (r["o_orderdate"], r["o_orderkey"], _cents(r["o_totalprice"]))
            )
        pays: dict = defaultdict(list)
        for r in pay_rows:
            pays[r["user_id"]].append((r["ts"], r["event_id"], _cents(r["value"])))
        month: dict = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, paid, sum_days, wsum, wcents
        for cust, iv in invs.items():
            iv.sort()
            queue = sorted(pays.get(cust, []))
            i = 0
            remaining = [c for _, _, c in iv]
            settle = {k: None for _, k, _ in iv}
            for pts, _, pc in queue:
                left = pc
                while left > 0 and i < len(iv):
                    take = min(left, remaining[i])
                    remaining[i] -= take
                    left -= take
                    if remaining[i] == 0:
                        settle[iv[i][1]] = pts
                        i += 1
                    else:
                        break
            for d, k, cents in iv:
                m = d.strftime("%Y-%m")
                slot = month[m]
                slot[0] += 1
                if settle[k] is not None:
                    days = (settle[k].date() - d.date()).days
                    slot[1] += 1
                    slot[2] += days
                    slot[3] += days * cents
                    slot[4] += cents
        got = {
            r["inv_month"]: r
            for r in catalog()["bill_dso_fifo"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(month)
        for m, (n, paid, sd, wsum, wc) in month.items():
            assert got[m]["n_invoices"] == n
            assert got[m]["n_paid"] == paid
            if paid == 0:
                assert got[m]["avg_days_to_pay"] == -1
                assert got[m]["dso_weighted"] == -1
            else:
                assert abs(got[m]["avg_days_to_pay"] - sd / paid) < 1e-9
                assert abs(got[m]["dso_weighted"] - wsum / wc) < 1e-9


class TestJsonlMalformed:
    def test_quarantine_partition(self, spark):
        """Quarantined count equals the planted corruption slice and no
        valid document is lost."""
        docs = (
            load(spark, SF_DIR, "documents")
            .select("doc_id", "lang", "n_chars")
            .collect()
        )
        planted = sum(1 for r in docs if r["doc_id"] % 23 in (5, 6))
        per: dict = defaultdict(lambda: [0, 0])
        for r in docs:
            if r["doc_id"] % 23 not in (5, 6):
                per[r["lang"]][0] += 1
                per[r["lang"]][1] += r["n_chars"]
        got = {
            r["lang"]: r
            for r in catalog()["scan_jsonl_malformed"].fn(spark, SF_DIR).collect()
        }
        assert got["_corrupt"]["n_docs"] == planted
        for lang, (n, chars) in per.items():
            assert got[lang]["n_docs"] == n
            assert got[lang]["sum_chars"] == chars


class TestCompactionApply:
    def test_physical_layout_and_conservation(self, spark):
        """The compacted table holds exactly one parquet data file per
        bin on disk, and the readback conserves the corpus."""
        import os

        # run the operator (stages both dirs), then inspect the layout
        rows = catalog()["ext_compaction_apply"].fn(spark, SF_DIR).collect()
        from billing_data_loader_spark.operators.corpus_ops import (
            _corpus_fingerprint,
        )
        from billing_data_loader_spark.sources.connectors import scratch_dir

        mt, sz = _corpus_fingerprint(SF_DIR, table="documents")
        compacted = scratch_dir(SF_DIR, f"compact_applied-{mt}-{sz}")
        bins = [
            d for d in os.listdir(compacted) if d.startswith("bin_id=")
        ]
        assert len(bins) == len(rows)
        for b in bins:
            files = [
                f
                for f in os.listdir(os.path.join(compacted, b))
                if f.endswith(".parquet")
            ]
            assert len(files) == 1, b
        docs = load(spark, SF_DIR, "documents")
        assert sum(r["n_docs"] for r in rows) == docs.count()
        assert sum(r["bin_bytes"] for r in rows) == (
            docs.agg(F.sum("n_chars")).collect()[0][0]
        )
