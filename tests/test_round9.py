"""Round-9 semantic tests: sibling zip_with lambda unroll (r8 ADVICE),
plus pins for the operators added this round."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.tables import load

from .conftest import SF_DIR


class TestSiblingZipWithLambdas:
    def test_pq_search_distance_table_binds_per_subspace(self, spark):
        """Regression pin for the sibling-HOF lambda-name collision
        (ext_pq_encode PITFALL, extended to ext_ann_pq_search by r8
        ADVICE): the four zip_with/aggregate instances building the
        asymmetric-distance table must each bind their OWN subspace. A
        mis-bound sibling makes approx_dist diverge from a from-scratch
        Python replay of the ADC sum for essentially every vector, so we
        replay it: codes from ext_pq_encode (independently pinned by
        TestPqEncode), distance table recomputed from the raw vectors in
        the same 9dp-rounded per-subspace form, four lookups summed in
        fixed order — and the operator's top-10 must be the global min-10
        of that replay with matching values."""
        from billing_data_loader_spark.operators.ann import _PQ_K, _PQ_M, _PQ_SUB

        emb = {
            r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in load(spark, SF_DIR, "embeddings").collect()
        }
        q = emb[0]

        def sub_sqd(a, b, m):
            acc = 0.0
            for i in range(m * _PQ_SUB, (m + 1) * _PQ_SUB):
                acc = acc + (a[i] - b[i]) * (a[i] - b[i])
            return round(acc, 9)

        dt = {
            m: {c: sub_sqd(q, emb[c], m) for c in range(1, _PQ_K + 1)}
            for m in range(_PQ_M)
        }
        codes = {
            r["vec_id"]: [r[f"code_{m}"] for m in range(_PQ_M)]
            for r in catalog()["ext_pq_encode"].fn(spark, SF_DIR).collect()
        }
        replay = {
            vid: sum(dt[m][cs[m]] for m in range(_PQ_M))
            for vid, cs in codes.items()
            if vid != 0
        }
        want_top = sorted(replay, key=lambda v: (replay[v], v))[:10]

        out = catalog()["ext_ann_pq_search"].fn(spark, SF_DIR).collect()
        got = {r["vec_id"]: r["approx_dist"] for r in out}
        assert sorted(got) == sorted(want_top)
        for vid, d in got.items():
            assert math.isclose(d, replay[vid], abs_tol=1e-8), (
                f"vec {vid}: operator {d} vs replay {replay[vid]} — "
                "sibling lambda mis-binding symptom"
            )
        # the four subspace tables must actually differ (a collision
        # collapses them onto one subspace's values)
        flat = [tuple(sorted(dt[m].values())) for m in range(_PQ_M)]
        assert len(set(flat)) == _PQ_M
