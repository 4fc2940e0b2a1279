"""Runnable end-to-end demo: compose the declared operators into a custom
training-data curation run over the fixture corpus.

    python examples/curation_demo.py [sf_dir]

Everything here is the public operator API — the same callables the
driver grades — wired the way a real pipeline would: score, gate, dedup,
pack, and report. Swap the fixture dir for a real corpus path and the
same code runs on a cluster (spark-submit with --py-files of the
package zip; session.get_spark only adds local[] defaults)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from billing_data_loader_spark.operators.corpus_hygiene import (
    ext_repetition_score,
)
from billing_data_loader_spark.operators.curation import (
    ext_curation_pipeline,
    ext_seq_pack,
)
from billing_data_loader_spark.operators.llm_pipeline import (
    ext_neardup_incremental,
    ext_neardup_minhash_lsh,
)
from billing_data_loader_spark.operators.text_analysis import (
    ext_calibration_ece,
    ext_quality_score,
)
from billing_data_loader_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark("curation-demo")

    # 1. per-doc signals from the declared operators
    quality = ext_quality_score(spark, sf_dir)
    repetition = ext_repetition_score(spark, sf_dir)
    signals = quality.join(repetition.select("doc_id", "rep_ratio"), "doc_id")
    print("== signal summary ==")
    signals.select(
        F.round(F.avg("quality_score"), 3).alias("avg_quality"),
        F.round(F.avg("rep_ratio"), 3).alias("avg_repetition"),
        F.count(F.lit(1)).alias("n_docs"),
    ).show()

    # 2. near-duplicate pairs via the banded-LSH scale path
    pairs = ext_neardup_minhash_lsh(spark, sf_dir)
    print(f"== near-dup pairs (jaccard >= 0.6): {pairs.count()} ==")

    # 3. the composed funnel (length -> repetition -> quality -> dedup)
    print("== curation funnel ==")
    ext_curation_pipeline(spark, sf_dir).orderBy("stage").show()

    # 4. pack the survivors into training bins
    print("== packing summary ==")
    ext_seq_pack(spark, sf_dir).orderBy("lang").show()

    # 5. the daily-ingest loop: screen a new batch against the standing
    # corpus (near-dup index reuse) and read the verdict mix
    print("== incremental batch screen ==")
    ext_neardup_incremental(spark, sf_dir).groupBy("verdict").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("best_jaccard"), 3).alias("avg_jaccard"),
    ).orderBy("verdict").show()

    # 6. is the cheap keep/drop classifier calibrated? (reliability
    # diagram + one ECE scalar — read before trusting its scores)
    print("== classifier calibration audit ==")
    ext_calibration_ece(spark, sf_dir).orderBy("bin").show()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
