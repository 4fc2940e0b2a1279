"""Round-13 deferred-bank batch 2 replays: id-gap audit, cohort ARPU,
kNN label-noise screening, and the weekday x hour load grid."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


class TestIdGaps:
    def test_python_replay(self, spark):
        ids = sorted(
            r["id"]
            for r in load(spark, SF_DIR, "orders")
            .selectExpr("o_orderkey AS id")
            .distinct()
            .collect()
        )
        gaps = [
            (a + 1, b - a - 1)
            for a, b in zip(ids, ids[1:])
            if b - a > 1
        ]
        got = catalog()["prof_id_gaps"].fn(spark, SF_DIR).collect()
        assert len(got) == 1
        g = got[0]
        assert g["n_ids"] == len(ids)
        assert (g["min_id"], g["max_id"]) == (ids[0], ids[-1])
        assert g["n_gaps"] == len(gaps)
        assert g["missing_total"] == sum(l for _, l in gaps)
        max_len = max((l for _, l in gaps), default=0)
        assert g["max_gap_len"] == max_len
        assert g["max_gap_start"] == min(
            (s for s, l in gaps if l == max_len), default=None
        )
        assert abs(
            g["density"] - len(ids) / (ids[-1] - ids[0] + 1)
        ) < 1e-15
        # identity: ids + missing fill the whole [min, max] range
        assert g["n_ids"] + g["missing_total"] == g["max_id"] - g["min_id"] + 1


class TestCohortArpu:
    def test_python_replay_and_identities(self, spark):
        rows = load(spark, SF_DIR, "orders").selectExpr(
            "o_custkey AS cust",
            "CAST(EXTRACT(year FROM o_orderdate) * 12"
            " + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS mi",
            "o_totalprice AS p",
        ).collect()
        cm = defaultdict(int)
        for r in rows:
            cm[(r["cust"], r["mi"])] += math.floor(r["p"] * 100 + 0.5)
        first = {}
        for (c, mi) in cm:
            if c not in first or mi < first[c]:
                first[c] = mi
        cells = defaultdict(lambda: [0, 0])
        for (c, mi), cents in cm.items():
            key = (first[c], mi - first[c])
            cells[key][0] += 1
            cells[key][1] += cents
        got = {
            (r["cohort_mi"], r["age_months"]): r
            for r in catalog()["bill_cohort_arpu"].fn(spark, SF_DIR).collect()
        }
        assert set(got) == set(cells)
        for key, (n, cents) in cells.items():
            g = got[key]
            assert g["n_active"] == n
            assert g["revenue_cents"] == cents
            assert abs(g["arpu_cents"] - cents / n) < 1e-9
        # age-0 actives across cohorts == number of customers
        assert sum(
            g["n_active"] for k, g in got.items() if k[1] == 0
        ) == len(first)


class TestLabelNoiseKnn:
    def test_agrees_with_knn_graph(self, spark):
        edges = catalog()["ext_knn_graph"].fn(spark, SF_DIR).collect()
        per_vec = defaultdict(lambda: [0, 0])
        for e in edges:
            a = per_vec[e["vec_id"]]
            a[0] += 1
            a[1] += e["same_label"]
        labels = {
            r["vec_id"]: r["label"]
            for r in load(spark, SF_DIR, "embeddings")
            .select("vec_id", "label")
            .collect()
        }
        got = {
            r["vec_id"]: r
            for r in catalog()["ext_label_noise_knn"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(per_vec)
        n_suspect = 0
        for v, (k, same) in per_vec.items():
            g = got[v]
            assert g["label"] == labels[v]
            assert g["n_nbrs"] == k
            assert g["n_same"] == same
            assert abs(g["same_frac"] - same / k) < 1e-15
            assert g["noise_suspect"] == (2 * same < k)
            n_suspect += g["noise_suspect"]
        # sanity: the screen flags SOME but not ALL points on the
        # near-isotropic fixture (labels are weakly clustered)
        assert 0 < n_suspect < len(got)


class TestDowHourProfile:
    def test_python_replay(self, spark):
        rows = load(spark, SF_DIR, "events").selectExpr(
            "CAST(CAST(to_date(ts) AS DATE) AS STRING) AS d",
            "CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h",
            "value AS v",
        ).collect()
        import datetime as dt

        cells = defaultdict(lambda: [0, 0])
        for r in rows:
            day = (
                dt.date.fromisoformat(r["d"]) - dt.date(1970, 1, 1)
            ).days
            key = (day % 7, r["h"])
            cells[key][0] += 1
            cells[key][1] += math.floor(r["v"] * 100 + 0.5)
        total = sum(n for n, _ in cells.values())
        got = {
            (r["weekday_idx"], r["hour"]): r
            for r in catalog()["ts_dow_hour_profile"]
            .fn(spark, SF_DIR)
            .collect()
        }
        assert set(got) == set(cells)
        for key, (n, cents) in cells.items():
            g = got[key]
            assert g["n_events"] == n
            assert g["value_cents"] == cents
            assert abs(g["share"] - n / total) < 1e-15
            assert abs(g["uniform_lift"] - n * 168 / total) < 1e-12
        # shares partition unity
        assert abs(sum(g["share"] for g in got.values()) - 1.0) < 1e-9
