"""Runnable end-to-end demo: the round-9 dedup/curation depth chain, wired
the way a production corpus release runs it:

  1. contamination estimate  (KMV sketches — is exact decontam even needed?)
  2. substring-level dedup   (Lee et al. manifest: cross-doc repeated runs)
  3. excision applied        (ExactSubstr: every duplicated run removed)
  4. shard packing           (WebDataset tar manifests over the clean docs)
  5. LM quality score        (bigram stupid-backoff over the train split)

    python examples/dedup_depth_demo.py [sf_dir]

Everything is the public operator API — the same callables the driver
grades — so each stage is individually oracle-verified.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from billing_data_loader_spark.operators.corpus_hygiene import (
    ext_lm_bigram_score,
)
from billing_data_loader_spark.operators.curation import ext_overlap_kmv
from billing_data_loader_spark.operators.dedup_span import (
    ext_substring_dedup,
    ext_substring_dedup_apply,
)
from billing_data_loader_spark.operators.multimodal import (
    ext_webdataset_shards,
)
from billing_data_loader_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark("dedup-depth-demo")

    # 1. cheap pre-pass: how contaminated / duplicated is this corpus?
    # KMV sketches answer from fixed-size state before any heavy join.
    est = ext_overlap_kmv(spark, sf_dir).collect()[0]
    print(
        f"[1] KMV estimate: ~{est['est_union_size']:.0f} distinct 8-grams; "
        f"benchmark containment {est['est_containment']:.4f} "
        f"({est['b_sketch_in_a']}/{est['b_sketch_n']} bench grams leaked)"
    )

    # 2. substring-level manifest: which token runs repeat across docs?
    spans = ext_substring_dedup(spark, sf_dir)
    n_spans = spans.count()
    n_docs_hit = spans.select("doc_id").distinct().count()
    print(f"[2] manifest: {n_spans} duplicated runs across {n_docs_hit} docs")

    # 3. excision applied (ExactSubstr policy: every occurrence removed)
    cleaned = ext_substring_dedup_apply(spark, sf_dir)
    stats = cleaned.agg(
        F.sum("n_removed").alias("removed"),
        F.sum("n_kept").alias("kept"),
        F.sum((F.col("n_kept") == 0).cast("int")).alias("emptied"),
    ).collect()[0]
    print(
        f"[3] excised {stats['removed']} tokens "
        f"({stats['kept']} kept; {stats['emptied']} docs emptied out)"
    )

    # 4. pack the (binary-payload) corpus into size-bounded tar shards
    shards = ext_webdataset_shards(spark, sf_dir)
    srow = shards.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("tar_bytes").alias("bytes"),
        F.max("n_samples").alias("maxn"),
    ).collect()[0]
    print(
        f"[4] {srow['n']} tar shards, {srow['bytes']} bytes total, "
        f"largest holds {srow['maxn']} samples"
    )

    # 5. score every doc under the train-split bigram LM; low scorers and
    # high-backoff docs are the downweight candidates
    lm = ext_lm_bigram_score(spark, sf_dir)
    worst = lm.orderBy(F.col("avg_logprob").asc()).limit(3).collect()
    print("[5] lowest bigram-LM scores (doc_id, split, avg_logprob, backoffs):")
    for r in worst:
        print(
            f"      {r['doc_id']:>6}  {r['split']:<5} "
            f"{r['avg_logprob']:.4f}  {r['n_backoff']}"
        )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
