"""Round-13 synthetic-fixture property pins: the new deferred
operators on hand-built corner-case tables where the expected answer is
knowable in closed form (identical KS samples, a perfectly linear
Theil-Sen series, a known id-gap pattern, an all-relevant retrieval).
Each synthetic dir also runs the DuckDB oracle side-by-side where the
property is about CROSS-ENGINE agreement, not just the value."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from billing_data_loader_spark.oracle import check_query
from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import TABLE_NAMES

from .conftest import SF_SMOKE


def _stage_dir(tmp_path, **tables):
    """Write the given pyarrow tables; symlink every other fixture from
    sf0.001 so DuckDB view registration stays valid."""
    for name, tbl in tables.items():
        pq.write_table(tbl, tmp_path / f"{name}.parquet")
    for t in TABLE_NAMES:
        if t not in tables:
            os.symlink(
                os.path.join(SF_SMOKE, f"{t}.parquet"),
                tmp_path / f"{t}.parquet",
            )
    return str(tmp_path)


def _orders_table(rows):
    """rows: (orderkey, custkey, totalprice, orderdate, priority)."""
    return pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
            "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
            "o_orderdate": pa.array(
                [r[3] for r in rows], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array([r[4] for r in rows], pa.string()),
        }
    )


def _events_table(rows):
    """rows: (event_id, ts, user_id, event_type, value)."""
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )


D0 = dt.datetime(2024, 1, 1)


class TestKsIdenticalSamples:
    def test_d_is_zero(self, spark, tmp_path):
        """Identical price multisets in both priorities -> D = 0 and the
        argmax tie-break lands on the LOWEST price point."""
        prices = [10.0, 20.0, 20.0, 35.5]
        rows = []
        k = 0
        for prio in ("1-URGENT", "5-LOW"):
            for p in prices:
                rows.append((k, 1 + k % 3, p, D0, prio))
                k += 1
        d = _stage_dir(tmp_path, orders=_orders_table(rows))
        spec = catalog()["prof_ks_test"]
        got = spec.fn(spark, d).collect()
        assert len(got) == 1
        g = got[0]
        assert (g["n1"], g["n2"]) == (4, 4)
        assert g["d_num"] == 0
        assert g["d_stat"] == 0.0
        assert g["at_cents"] == 1000  # lowest pooled price point
        ok, msg = check_query(spec.fn(spark, d), spec.oracle, d)
        assert ok, msg


class TestTheilSenLinearSeries:
    def test_exact_slope_on_linear_counts(self, spark, tmp_path):
        """Daily counts 5 + 3*day -> every pairwise slope is exactly 3,
        so the median IS 3 regardless of the pick convention."""
        rows = []
        eid = 0
        for day in range(6):
            for _ in range(5 + 3 * day):
                rows.append(
                    (eid, D0 + dt.timedelta(days=day, minutes=eid % 60),
                     eid % 7, "click", 1.0)
                )
                eid += 1
        d = _stage_dir(tmp_path, events=_events_table(rows))
        spec = catalog()["ts_theil_sen"]
        got = spec.fn(spark, d).collect()
        assert len(got) == 1
        g = got[0]
        assert g["event_type"] == "click"
        assert g["n_days"] == 6
        assert g["n_pairs"] == 15
        assert g["sen_slope"] == 3.0
        ok, msg = check_query(spec.fn(spark, d), spec.oracle, d)
        assert ok, msg


class TestIdGapsKnownPattern:
    def test_exact_gap_accounting(self, spark, tmp_path):
        ids = [1, 2, 5, 9]
        rows = [(i, 1, 10.0, D0, "3-MEDIUM") for i in ids]
        d = _stage_dir(tmp_path, orders=_orders_table(rows))
        spec = catalog()["prof_id_gaps"]
        g = spec.fn(spark, d).collect()[0]
        assert g["n_ids"] == 4
        assert (g["min_id"], g["max_id"]) == (1, 9)
        assert g["n_gaps"] == 2
        assert g["missing_total"] == 5  # {3,4} + {6,7,8}
        assert g["max_gap_len"] == 3
        assert g["max_gap_start"] == 6
        assert abs(g["density"] - 4 / 9) < 1e-15
        ok, msg = check_query(spec.fn(spark, d), spec.oracle, d)
        assert ok, msg


class TestRetrievalAllRelevant:
    def test_ndcg_and_ap_are_one(self, spark, tmp_path):
        """Every corpus vector carries the query's label -> NDCG = 1 and
        AP = 1 at every k; recall@k = k / n_rel."""
        import math

        n = 12
        vecs = []
        for i in range(n + 1):  # vec 0 is the query
            base = [0.0] * 8
            base[i % 8] = 1.0
            base[(i + 3) % 8] = 0.5 + 0.01 * i
            vecs.append((i, base, 7))
        tbl = pa.table(
            {
                "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
                "embedding": pa.array(
                    [v[1] for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([v[2] for v in vecs], pa.int32()),
            }
        )
        d = _stage_dir(tmp_path, embeddings=tbl)
        ndcg = {
            r["k"]: r
            for r in catalog()["ext_ndcg_eval"].fn(spark, d).collect()
        }
        ap = {
            r["k"]: r
            for r in catalog()["ext_avg_precision"].fn(spark, d).collect()
        }
        for k in (1, 5, 10):
            assert ndcg[k]["n_rel"] == n
            assert ndcg[k]["n_rel_topk"] == k
            assert abs(ndcg[k]["ndcg"] - 1.0) < 1e-15
            assert abs(ap[k]["avg_precision"] - 1.0) < 1e-15
            assert abs(ap[k]["precision_at_k"] - 1.0) < 1e-15
            assert abs(ap[k]["recall_at_k"] - k / n) < 1e-15
        for spec_key in ("ext_ndcg_eval", "ext_avg_precision"):
            spec = catalog()[spec_key]
            ok, msg = check_query(spec.fn(spark, d), spec.oracle, d)
            assert ok, (spec_key, msg)


class TestDowHourUniformGrid:
    def test_uniform_lift_is_one(self, spark, tmp_path):
        """One event in every (weekday, hour) slot of one week -> every
        slot's share is 1/168 and the uniform lift is exactly 1."""
        rows = []
        eid = 0
        for day in range(7):
            for hour in range(24):
                rows.append(
                    (eid, D0 + dt.timedelta(days=day, hours=hour),
                     1, "view", 2.0)
                )
                eid += 1
        d = _stage_dir(tmp_path, events=_events_table(rows))
        spec = catalog()["ts_dow_hour_profile"]
        got = spec.fn(spark, d).collect()
        assert len(got) == 168
        for g in got:
            assert g["n_events"] == 1
            assert abs(g["share"] - 1 / 168) < 1e-15
            assert abs(g["uniform_lift"] - 1.0) < 1e-12
        ok, msg = check_query(spec.fn(spark, d), spec.oracle, d)
        assert ok, msg
