"""Round-6 regression tests for the ADVICE r5 fixes.

Covers: (1) parity-conf reassertion on a drifted long-lived session,
(2) the label-propagation non-convergence guard, (3) the simhash
exact-dup oracle's too-short-doc restriction.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from billing_data_loader_spark.operators.llm_pipeline import (
    _cc_label_propagation,
)
from billing_data_loader_spark.operators.text_analysis import (
    ext_neardup_simhash,
)
from billing_data_loader_spark.plans.catalog import catalog
from billing_data_loader_spark.session import reassert_parity

from .conftest import SF_SMOKE


def _mirrored_chain_edges(spark, n_nodes: int):
    """Path graph 0-1-...-(n-1), both directions, as the (a, b) frame
    _cc_label_propagation expects."""
    rows = []
    for i in range(n_nodes - 1):
        rows.append((i, i + 1))
        rows.append((i + 1, i))
    return spark.createDataFrame(rows, "a long, b long")


class TestLabelPropagationGuard:
    def test_deep_chain_fails_loud(self, spark):
        # a 14-node path has diameter 13 > the 10-hop budget
        # (_CLUSTER_MAX_ITERS): min-label propagation cannot reach the
        # fixpoint, and the guard must raise instead of returning labels
        # that silently split one component into several clusters.
        edges = _mirrored_chain_edges(spark, 14)
        with pytest.raises(RuntimeError, match="did not converge"):
            _cc_label_propagation(edges, edges.count()).collect()

    def test_shallow_chain_converges(self, spark):
        # diameter 9 fits the 10-hop budget: one component, min label 0
        edges = _mirrored_chain_edges(spark, 10)
        out = _cc_label_propagation(edges, edges.count()).toPandas()
        assert set(out["cluster_id"]) == {0}
        assert set(out["cluster_size"]) == {10}
        assert sorted(out["doc_id"]) == list(range(10))


class TestParityReassert:
    def test_registered_query_repairs_conf_drift(self, spark):
        # the driver reuses ONE session; simulate an external mutation of
        # a parity-critical conf between queries and check the registry
        # wrapper repairs it at the next declared-query entry
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        try:
            catalog()["null_handling"].fn(spark, SF_SMOKE).toPandas()
            assert (
                spark.conf.get("spark.sql.session.timeZone") == "UTC"
            ), "reassert_parity did not repair drifted session timezone"
        finally:
            spark.conf.set("spark.sql.session.timeZone", "UTC")

    def test_reassert_is_noop_when_clean(self, spark):
        reassert_parity(spark)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert (
            spark.conf.get("spark.sql.execution.arrow.pyspark.enabled")
            == "true"
        )

    def test_parity_keys_runtime_settable(self, spark):
        # ADVICE r7: reassert_parity raises on a failed repair, which is
        # only sound if both parity confs are dynamic (never static) SQL
        # confs on the running build. Pin that here so a Spark upgrade
        # that made either key static fails THIS test, not every query.
        from billing_data_loader_spark.session import _PARITY_CONF_KEYS

        for key in _PARITY_CONF_KEYS:
            assert spark.conf.isModifiable(key), (
                f"parity conf {key!r} is not runtime-settable on this "
                "build; scope reassert_parity's hard failure before using"
            )


class TestSimhashShortDocGuard:
    def test_short_duplicate_doc_excluded(self, spark, tmp_path):
        # a duplicated 2-token doc produces no shingles, hence no simhash
        # signature; the declared exact-dup surface must exclude it (in
        # BOTH engines) rather than emit hamming=-1/bands_found=FALSE.
        # doc_id 20 is divisible by 5 so _corpus_with_dups duplicates it,
        # exercising exactly the fixture-regeneration corner ADVICE r5
        # flagged.
        docs = pd.DataFrame(
            {
                "doc_id": [20, 21, 25, 30],
                "text": [
                    "too short",
                    "this document has plenty of tokens to shingle",
                    "this document has plenty of tokens to shingle",
                    "another normal document with enough tokens here",
                ],
                "lang": ["en"] * 4,
                "source": ["t"] * 4,
                "n_chars": [9, 46, 46, 48],
            }
        )
        docs["doc_id"] = docs["doc_id"].astype("int64")
        docs["n_chars"] = docs["n_chars"].astype("int64")
        docs.to_parquet(tmp_path / "documents.parquet", index=False)

        out = ext_neardup_simhash(spark, str(tmp_path)).toPandas()
        # every surviving row is a provable theorem row
        assert (out["hamming"] == 0).all()
        assert out["bands_found"].all()
        # the 2-token doc (20) and its corpus copy never appear
        short_ids = {20}
        from billing_data_loader_spark.operators.llm_pipeline import (
            _COPY_OFFSET,
        )

        short_ids.add(20 + _COPY_OFFSET)
        assert not (
            out["doc_a"].isin(short_ids) | out["doc_b"].isin(short_ids)
        ).any()
        # the shingleable duplicates ARE still found (21==25, plus corpus
        # copies of 25 and 30) — the filter narrows, it does not blind
        pairs = set(zip(out["doc_a"], out["doc_b"]))
        assert (21, 25) in pairs
