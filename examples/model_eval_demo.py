"""Runnable demo: the classifier-audit suite a curation pipeline runs
before wiring a quality filter into production — discrimination at the
operating threshold (confusion matrix), across all thresholds (AUC),
calibration (ECE) and proper scoring rules (Brier, log loss), agreement
with an independent heuristic (Cohen's kappa), and the split QA pair
(distributional chi-square + cross-split near-dup leakage).

    python examples/model_eval_demo.py [sf_dir]

Everything here is the public operator API — the same callables the
driver grades — read in the order a filter owner actually reads them.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from billing_data_loader_spark.operators.corpus_ops import (
    ext_split_balance_chi2,
)
from billing_data_loader_spark.operators.llm_pipeline import (
    ext_split_leakage,
)
from billing_data_loader_spark.operators.model_eval import (
    ext_auc_rank,
    ext_brier_score,
    ext_kappa_agreement,
    ext_log_loss,
    ext_macro_f1,
)
from billing_data_loader_spark.operators.text_analysis import (
    ext_confusion_matrix,
)
from billing_data_loader_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark("model-eval-demo")

    print("== confusion matrix @ the classifier's threshold ==")
    ext_confusion_matrix(spark, sf_dir).orderBy(
        "pred_keep", "actual_en"
    ).show()

    print("== threshold-free: midrank AUC + Gini ==")
    ext_auc_rank(spark, sf_dir).show()

    print("== proper scoring: Brier (per class + overall) ==")
    ext_brier_score(spark, sf_dir).orderBy("actual_en").show()

    print("== proper scoring: log loss (per class + overall) ==")
    ext_log_loss(spark, sf_dir).orderBy("actual_en").show()

    print("== agreement with an independent heuristic (Cohen's kappa) ==")
    ext_kappa_agreement(spark, sf_dir).orderBy("a_keep", "b_keep").show()

    print("== multi-class lang-ID quality (macro-F1) ==")
    ext_macro_f1(spark, sf_dir).orderBy("lang").show()

    print("== split QA: distributional balance (chi-square) ==")
    ext_split_balance_chi2(spark, sf_dir).orderBy("split", "lang").show()

    print("== split QA: cross-split near-dup leakage ==")
    ext_split_leakage(spark, sf_dir).orderBy("doc_a", "doc_b").show(
        truncate=False
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
