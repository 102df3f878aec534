"""The full experimentation readout stack on one derived experiment:
every test an A/B platform runs, from the fixed-sample basics to the
anytime-valid decision layer, composed over the events table
(experiment = event_type, arm = odd/even user id).

1. ab_test_zscores: conversion-rate z vs control (value > 30 as the
   conversion) — the first-pass proportions readout.
2. welch_ttest: the continuous-metric companion (mean value per arm,
   unequal-variance form).
3. mann_whitney_u + kruskal_wallis: the nonparametric leg — whole
   distributions, valid for heavy-tailed metrics; KW as the k-sample
   omnibus gate.
4. cliffs_delta: the effect SIZE beside the significance readouts,
   from the same count-table state.
5. cuped_adjusted_means: variance reduction via a pre-experiment
   covariate — the CI shrink applied before any test above.
6. bootstrap_mean_ci: a distribution-free band on each arm's mean.
7. sprt_bernoulli: Wald's sequential test — the ANYTIME-VALID decision
   the streaming twins' peeking caveat defers to; boundaries hold at
   every sample size.

Run: python examples/experimentation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.abtest import (
    ab_test_zscores,
    cliffs_delta,
    cuped_adjusted_means,
    kruskal_wallis,
    mann_whitney_u,
    sprt_bernoulli,
    welch_ttest,
)
from meshinsights_data_pipeline_spark.operators.bootstrap import (
    bootstrap_mean_ci,
)
from meshinsights_data_pipeline_spark.session import get_spark, read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("experimentation-example")
    ev = read_table(spark, sf_dir, "events")
    arms = ev.select(
        F.col("event_type").alias("experiment"),
        F.when(F.col("user_id") % 2 == 0, "control")
        .otherwise("t1").alias("arm"),
        F.col("value"),
        (F.col("value") > 30).alias("conv"),
        F.floor(F.col("value").cast("double") / F.lit(10.0))
        .cast("double").alias("pre_metric"),
        F.col("event_id"),
    )

    print("=== Proportions: two-sample z vs control ===")
    ab_test_zscores(arms, "experiment", "arm", "conv",
                    control_label="control").orderBy("experiment").show(5)

    print("=== Means: Welch's t vs control ===")
    welch_ttest(arms, "experiment", "arm", "value",
                control_label="control").orderBy("experiment").show(5)

    print("=== Distributions: Mann-Whitney U vs control ===")
    mann_whitney_u(arms, "experiment", "arm", "value",
                   control_label="control").orderBy("experiment").show(5)

    print("=== Omnibus gate: Kruskal-Wallis H across all arms ===")
    kruskal_wallis(arms, "experiment", "arm", "value").orderBy(
        "experiment"
    ).show(5)

    print("=== Effect size: Cliff's delta vs control ===")
    cliffs_delta(arms, "experiment", "arm", "value",
                 control_label="control").orderBy("experiment").show(5)

    print("=== CUPED: covariate-adjusted means + variance reduction ===")
    cuped_adjusted_means(arms, "experiment", "arm", "value",
                         "pre_metric").orderBy("experiment", "arm").show(5)

    print("=== Bootstrap 95% CI on each arm's mean ===")
    bootstrap_mean_ci(
        arms, ["experiment", "arm"], "value", "event_id", b=60
    ).orderBy("experiment", "arm").show(5)

    print("=== Anytime-valid: Wald SPRT decisions (p0=0.3 vs p1=0.35) ===")
    sprt_bernoulli(arms, "experiment", "arm", "conv",
                   p0=0.3, p1=0.35).orderBy("experiment", "arm").show(5)

    spark.stop()


if __name__ == "__main__":
    main()
