"""Round-13 deferred-bank batch 7 replays: WOE/IV encoding, hashed
feature crosses, the Hilbert layout, and higher moments — each result
recomputed independently in plain Python and compared exactly."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from billing_data_loader_spark.operators.feature_prep import _FHASH_B
from billing_data_loader_spark.operators.lakeops import _Z_EPOCH
from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


class TestWoeIv:
    def test_python_replay(self, spark):
        orders = (
            load(spark, SF_DIR, "orders")
            .select("o_custkey", "o_orderdate")
            .collect()
        )
        lastm = {}
        for r in orders:
            mi = r["o_orderdate"].year * 12 + r["o_orderdate"].month - 1
            lastm[r["o_custkey"]] = max(
                lastm.get(r["o_custkey"], 0), mi
            )
        horizon = max(lastm.values())
        cust = (
            load(spark, SF_DIR, "customer")
            .select("c_custkey", "c_mktsegment", "c_nationkey")
            .collect()
        )
        feats = defaultdict(lambda: [0, 0])  # (feature, cat) -> pos, neg
        for r in cust:
            mi = lastm.get(r["c_custkey"])
            y = 1 if mi is not None and mi >= horizon - 11 else 0
            for feat, cat in (
                ("mktsegment", r["c_mktsegment"]),
                ("nation", str(r["c_nationkey"])),
            ):
                if y:
                    feats[(feat, cat)][0] += 1
                else:
                    feats[(feat, cat)][1] += 1
        per_feature = defaultdict(list)
        for (feat, cat), (pos, neg) in feats.items():
            per_feature[feat].append((cat, pos, neg))
        want = {}
        for feat, rows in per_feature.items():
            p_tot = sum(p for _, p, _ in rows)
            n_tot = sum(n for _, _, n in rows)
            c = len(rows)
            iv_num = 0
            woes = {}
            for cat, pos, neg in rows:
                a = (pos + 1) * (n_tot + c)
                b = (neg + 1) * (p_tot + c)
                woe_q = math.floor(
                    math.log(float(a) / float(b)) * 1e6 + 0.5
                )
                woes[cat] = woe_q
                iv_num += (a - b) * woe_q
            iv = float(iv_num) / (
                float((p_tot + c) * (n_tot + c)) * 1e6
            )
            for cat, pos, neg in rows:
                want[(feat, cat)] = (pos, neg, woes[cat] / 1e6, iv)
        got = {
            (r["feature"], r["category"]): r
            for r in catalog()["ext_woe_iv"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(want)
        for key, (pos, neg, woe, iv) in want.items():
            g = got[key]
            assert g["pos"] == pos
            assert g["neg"] == neg
            assert g["woe"] == woe
            assert g["feature_iv"] == iv
        # IV is identical across a feature's rows and non-negative-ish
        # by construction is NOT guaranteed, but finite it is
        for key in want:
            assert math.isfinite(got[key]["feature_iv"])


class TestFeatureHashCross:
    def test_python_replay(self, spark):
        cust = (
            load(spark, SF_DIR, "customer")
            .select("c_mktsegment", "c_nationkey")
            .collect()
        )
        buckets = defaultdict(list)
        for r in cust:
            cc = f"{r['c_mktsegment']}#{r['c_nationkey']}"
            h = int(hashlib.md5(f"{cc}#fh".encode()).hexdigest()[:15], 16)
            buckets[h % _FHASH_B].append(cc)
        total = sum(len(v) for v in buckets.values())
        got = {
            r["bucket"]: r
            for r in catalog()["ext_feature_hash_cross"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(buckets)
        n_coll = 0
        for b, crosses in buckets.items():
            g = got[b]
            assert g["n_customers"] == len(crosses)
            assert g["n_crosses"] == len(set(crosses))
            assert g["example_cross"] == min(set(crosses))
            assert g["has_collision"] == (len(set(crosses)) > 1)
            assert g["load_frac"] == len(crosses) / total
            n_coll += len(set(crosses)) > 1
        # 125 crosses into 64 buckets: collisions must exist (pigeonhole
        # guarantees >= 61 colliding assignments across buckets)
        assert n_coll > 0


def _hilbert_d(x: int, y: int, n: int = 256) -> int:
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if x & s else 0
        ry = 1 if y & s else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


class TestHilbertLayout:
    def test_python_replay(self, spark):
        import datetime

        orders = (
            load(spark, SF_DIR, "orders")
            .select("o_custkey", "o_orderdate", "o_totalprice")
            .collect()
        )
        epoch = datetime.date(1992, 1, 1)
        assert _Z_EPOCH == "1992-01-01"
        rows = [
            (
                r["o_custkey"],
                (r["o_orderdate"].date() - epoch).days,
                r["o_totalprice"],
            )
            for r in orders
        ]
        mn_ck = min(c for c, _, _ in rows)
        mx_ck = max(c for c, _, _ in rows)
        mn_d = min(d for _, d, _ in rows)
        mx_d = max(d for _, d, _ in rows)
        files = defaultdict(list)
        for ck, day, price in rows:
            x = ((ck - mn_ck) * 256) // (mx_ck - mn_ck + 1)
            y = ((day - mn_d) * 256) // (mx_d - mn_d + 1)
            files[_hilbert_d(x, y) >> 8].append((ck, day, price))
        got = {
            r["file_id"]: r
            for r in catalog()["ext_hilbert_layout"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(files)
        for fid, members in files.items():
            g = got[fid]
            assert g["n_rows"] == len(members)
            assert g["min_ck"] == min(c for c, _, _ in members)
            assert g["max_ck"] == max(c for c, _, _ in members)
            assert g["min_day"] == min(d for _, d, _ in members)
            assert g["max_day"] == max(d for _, d, _ in members)
            cents = sum(
                math.floor(p * 1e6 + 0.5) for _, _, p in members
            )
            assert abs(g["sum_price"] - cents / 1e6) < 1e-9

    def test_hilbert_boxes_tighter_than_morton(self, spark):
        """The layout claim, pinned: at the same file count, the total
        bounding-box AREA of Hilbert files is no larger than Morton's
        (adjacency => squarish tiles; Morton's seam files span)."""
        gh = catalog()["ext_hilbert_layout"].fn(spark, SF_DIR).collect()
        gz = catalog()["ext_zorder_layout"].fn(spark, SF_DIR).collect()

        def area(rows):
            return sum(
                (r["max_ck"] - r["min_ck"] + 1)
                * (r["max_day"] - r["min_day"] + 1)
                for r in rows
            )

        assert len(gh) == len(gz) == 256
        assert area(gh) <= area(gz)

    def test_hilbert_curve_properties(self):
        # bijective on the 256x256 grid, and consecutive d are adjacent
        seen = set()
        inv = {}
        for x in range(256):
            for y in range(256):
                d = _hilbert_d(x, y)
                seen.add(d)
                inv[d] = (x, y)
        assert len(seen) == 65536
        assert min(seen) == 0 and max(seen) == 65535
        for d in range(0, 65535, 257):  # sampled adjacency check
            (x1, y1), (x2, y2) = inv[d], inv[d + 1]
            assert abs(x1 - x2) + abs(y1 - y2) == 1


class TestHigherMoments:
    def test_python_replay(self, spark):
        ev = (
            load(spark, SF_DIR, "events")
            .select("event_type", "value")
            .collect()
        )
        groups = defaultdict(list)
        for r in ev:
            groups[r["event_type"]].append(
                math.floor(r["value"] * 10 + 0.5)
            )
        got = {
            r["event_type"]: r
            for r in catalog()["agg_higher_moments"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(groups)
        for et, qs in groups.items():
            n = len(qs)
            s1 = sum(qs)
            s2 = sum(q * q for q in qs)
            s3 = sum(q**3 for q in qs)
            s4 = sum(q**4 for q in qs)
            mean = float(s1) / float(n)
            m2 = float(s2) / float(n) - mean * mean
            m3 = (
                float(s3) / float(n)
                - 3.0 * mean * (float(s2) / float(n))
                + 2.0 * mean * mean * mean
            )
            m4 = (
                float(s4) / float(n)
                - 4.0 * mean * (float(s3) / float(n))
                + 6.0 * mean * mean * (float(s2) / float(n))
                - 3.0 * mean * mean * mean * mean
            )
            g = got[et]
            assert g["n"] == n
            assert g["mean_deci"] == mean
            assert g["var_deci2"] == m2
            assert g["skewness"] == m3 / (m2 * math.sqrt(m2))
            assert g["kurtosis_excess"] == m4 / (m2 * m2) - 3.0
            # the universal moment inequality: excess kurtosis can
            # never fall below skewness^2 - 2 (Pearson)
            assert (
                g["kurtosis_excess"] >= g["skewness"] ** 2 - 2 - 1e-12
            )

    def test_constant_group_guard(self, spark):
        # the zero-variance guard: emits 0.0, never NaN — checked via
        # the expression on a synthetic 1-value frame
        df = spark.createDataFrame(
            [("x", 5.0)] * 4, "event_type string, value double"
        )
        df.createOrReplaceTempView("_mom_const")
        from billing_data_loader_spark.operators.aggregations import (
            _MOM_M2,
        )

        r = spark.sql(
            "SELECT CASE WHEN "
            + _MOM_M2
            + " <= 0e0 THEN CAST(0 AS DOUBLE) ELSE 1e0 END AS g FROM ("
            "SELECT CAST(COUNT(*) AS BIGINT) n, "
            "SUM(CAST(CAST(floor(value * 1e1 + CAST(0.5 AS DOUBLE)) AS"
            " BIGINT) AS DECIMAL(38,0))) s1, "
            "SUM(CAST(CAST(floor(value * 1e1 + CAST(0.5 AS DOUBLE)) AS"
            " BIGINT) * CAST(floor(value * 1e1 + CAST(0.5 AS DOUBLE))"
            " AS BIGINT) AS DECIMAL(38,0))) s2 "
            "FROM _mom_const)"
        ).collect()
        assert r[0]["g"] == 0.0
