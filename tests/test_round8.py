"""Round-8 semantic tests: ADVICE r7 closures and the new r8 operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from billing_data_loader_spark.operators.llm_pipeline import _corpus_with_dups
from billing_data_loader_spark.plans.catalog import catalog

from .conftest import SF_DIR


class TestDupNgramHashCollisionPin:
    def test_distinct_hashes_equal_distinct_strings(self, spark):
        # ADVICE r7: ext_dup_ngram_coverage shuffles xxhash64(trigram)
        # longs while its oracle joins raw trigram strings; the per-doc
        # counts agree only while the hash is injective on the fixture
        # vocabulary. Pin that assumption: one colliding pair anywhere
        # would make these two distinct-counts differ.
        corpus = _corpus_with_dups(spark, SF_DIR)
        toks = corpus.select(
            "doc_id", F.split("text", " ").alias("t")
        ).filter(F.size("t") >= 3)
        tri = toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 2), "
                    "i -> concat_ws(' ', element_at(t, i), "
                    "element_at(t, i + 1), element_at(t, i + 2)))"
                )
            ).alias("gs")
        )
        row = tri.agg(
            F.countDistinct("gs").alias("n_str"),
            F.countDistinct(F.xxhash64("gs")).alias("n_hash"),
        ).collect()[0]
        assert row["n_str"] == row["n_hash"], (
            "xxhash64 collision in the fixture trigram vocabulary — "
            "ext_dup_ngram_coverage's hashed-shingle shuffle no longer "
            "matches its string-keyed oracle"
        )
        assert row["n_str"] > 0
