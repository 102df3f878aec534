"""Classifier / LLM-judge evaluation end-to-end on the events and
documents tables: is a scorer worth gating the pipeline on, are its
confidences honest, does it agree with the reference rater, and how
big is the effect it detects — the model-facing readout family
(operators/mleval.py + abtest.cliffs_delta).

1. roc_auc: per event type, the event VALUE as a ranking score for
   the even-user class — the threshold-free separation readout
   (rank-sum identity, ties counted half; a one-class group surfaces
   NULL instead of a fake 0).
2. calibration_report: value/100 as a [0,1] confidence for the
   user_id%3 outcome — ECE/MCE over 10 fixed bins + the binning-free
   Brier score; out-of-range scores clamp into the edge bins (the
   mis-scaled-logit case).
3. calibration_bins: the reliability-diagram table behind the ECE —
   what you plot when the report says the judge is over-confident.
4. cohens_kappa: document language vs a deterministically-noised
   judge copy — chance-corrected agreement per source (raw agreement
   is inflated wherever one label dominates).
5. cliffs_delta: the nonparametric effect size vs control over the
   derived experiment — the magnitude readout beside mann_whitney_u's
   significance, from the SAME count-table sufficient statistic.
6. bootstrap_mean_ci: a distribution-free 95% band on each event
   type's mean value via the deterministic Poisson bootstrap — the
   uncertainty readout for metrics where the parametric se is fiction.

Run: python examples/judge_eval.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.abtest import cliffs_delta
from meshinsights_data_pipeline_spark.operators.mleval import (
    calibration_bins,
    calibration_report,
    cohens_kappa,
    roc_auc,
)
from meshinsights_data_pipeline_spark.session import get_spark, read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("judge-eval-example")
    ev = read_table(spark, sf_dir, "events")
    docs = read_table(spark, sf_dir, "documents")

    scored = ev.select(
        F.col("event_type"),
        (F.col("user_id") % 2 == 0).alias("label"),
        F.col("value"),
    )
    print("=== ROC-AUC: value as a scorer for the even-user class ===")
    roc_auc(scored, ["event_type"], "label", "value").orderBy(
        "event_type"
    ).show()

    conf = ev.select(
        F.col("event_type"),
        (F.col("value").cast("double") / F.lit(100.0)).alias("score"),
        (F.col("user_id") % 3 == 0).alias("label"),
    )
    print("=== Calibration: ECE / MCE / Brier per event type ===")
    calibration_report(conf, ["event_type"], "score", "label").orderBy(
        "event_type"
    ).show()
    print("=== Reliability bins (event type 'click') ===")
    calibration_bins(
        conf.filter(F.col("event_type") == "click"),
        ["event_type"], "score", "label",
    ).orderBy("bin").show()

    raters = docs.select(
        F.col("source"),
        F.col("lang").alias("human"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("xx"))
        .otherwise(F.col("lang")).alias("judge"),
    )
    print("=== Cohen's kappa: judge vs human language labels ===")
    cohens_kappa(raters, ["source"], "human", "judge").orderBy(
        "source"
    ).show(5)

    arms = ev.select(
        F.col("event_type").alias("experiment"),
        F.when(F.col("user_id") % 2 == 0, "control")
        .otherwise("t1").alias("arm"),
        F.col("value"),
    )
    print("=== Cliff's delta: effect size vs control ===")
    cliffs_delta(
        arms, "experiment", "arm", "value", control_label="control"
    ).orderBy("experiment", "arm").show()

    print("=== Bootstrap 95% CI on the mean value per event type ===")
    from meshinsights_data_pipeline_spark.operators.bootstrap import (
        bootstrap_mean_ci,
    )

    bootstrap_mean_ci(
        ev, ["event_type"], "value", "event_id", b=60
    ).orderBy("event_type").show()

    spark.stop()


if __name__ == "__main__":
    main()
