"""Two-proportion A/B test — experiment-arm conversion comparison.

The experimentation primitive next to the attribution family (x86/x99/
x100 assign credit; this decides whether an arm's conversion RATE
differs from control): per (experiment, arm) the pooled two-proportion
z-statistic against the control arm, the standard first-pass readout
of every A/B platform.

Cross-engine determinism: counts are exact integers; every float step
(two divisions for the rates, the pooled rate, the standard error's
multiplies and sqrt, the final division) is an IEEE correctly-rounded
operation applied in a FIXED operand order, so Spark and any IEEE-754
engine produce bit-identical doubles; z rounds to 6dp and significance
compares the ROUNDED |z| so borderline arms decide identically.
p-values are deliberately out of scope — erf/normal-CDF
implementations differ across engines' libm in last ulps; the caller
thresholds on z (1.959964 ~ two-sided 5%).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.barrier import (
    materialize as _materialize,
)


def ab_test_zscores(
    df: DataFrame,
    experiment_col: str,
    arm_col: str,
    converted_col: str,
    control_label: str,
    z_crit: float = 1.959964,
) -> DataFrame:
    """Per (experiment, arm != control): pooled two-proportion z vs the
    experiment's control arm.

    ``converted_col`` is a boolean (or 0/1-coercible) per unit row —
    pre-aggregate to one row per randomization unit upstream if units
    can emit multiple rows (double-counting units inflates n and fakes
    significance; the operator scores the rows it is given).

    Returns ``[experiment, arm, n_control, x_control, n_arm, x_arm,
    has_control, p_control, p_arm, lift, z, significant]`` where
    ``lift`` is the absolute rate difference (arm - control), ``z =
    lift / se`` with ``se = sqrt(pool * (1 - pool) * (1/n_c + 1/n_a))``
    over the pooled rate, both rounded to 6dp. Degenerate cells — an
    experiment whose control arm is ABSENT (a misconfigured feed) still
    emits its treatment rows, with ``has_control = false`` and NULL
    control/z columns, so the breakage SURFACES instead of the
    experiment silently vanishing (left join on the control row);
    se = 0 (pooled rate 0 or 1) yields NULL z and ``significant =
    false``, not a division blow-up; rows with a NULL experiment or
    NULL arm never pair (equality join semantics — NULL != NULL, the
    same rule as linkage blocking; a NULL-experiment treatment cell
    also reports ``has_control = false``).

    Scale shape: ONE map-side-combinable aggregate over the event scan
    builds the |experiments x arms| cell frame; the control cells join
    back broadcast (bounded by |experiments|). The cell frame is
    MATERIALIZED (the diamond-barrier lesson, operators/barrier.py):
    it feeds both join sides, and without the barrier Spark replays
    the corpus scan + aggregate once per side — the executed plan
    showed 4 scans/0 reuse. With it, the corpus is touched exactly
    once at any data size and everything after is tiny-frame algebra.
    """
    conv = F.col(converted_col).cast("boolean").cast("int")
    cells = _materialize(
        df.groupBy(experiment_col, arm_col).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(conv).cast("bigint").alias("x"),
        )
    )
    ctrl = (
        cells.filter(F.col(arm_col) == control_label)
        .select(
            F.col(experiment_col),
            F.col("n").alias("n_control"),
            F.col("x").alias("x_control"),
        )
    )
    arms = cells.filter(F.col(arm_col) != control_label).select(
        F.col(experiment_col),
        F.col(arm_col).alias("arm"),
        F.col("n").alias("n_arm"),
        F.col("x").alias("x_arm"),
    )
    j = arms.join(F.broadcast(ctrl), experiment_col, "left")
    n_c, x_c = F.col("n_control").cast("double"), F.col("x_control").cast("double")
    n_a, x_a = F.col("n_arm").cast("double"), F.col("x_arm").cast("double")
    p_c = x_c / n_c
    p_a = x_a / n_a
    pool = (x_c + x_a) / (n_c + n_a)
    se = F.sqrt(pool * (F.lit(1.0) - pool) * (F.lit(1.0) / n_c + F.lit(1.0) / n_a))
    lift = p_a - p_c
    z = F.round(lift / se, 6)
    z = F.when(se > 0, z)  # se = 0 -> NULL z, never a NaN/Inf
    return j.select(
        F.col(experiment_col),
        "arm",
        "n_control",
        "x_control",
        "n_arm",
        "x_arm",
        F.col("n_control").isNotNull().alias("has_control"),
        F.round(p_c, 6).alias("p_control"),
        F.round(p_a, 6).alias("p_arm"),
        F.round(lift, 6).alias("lift"),
        z.alias("z"),
        F.coalesce(F.abs(z) > F.lit(float(z_crit)), F.lit(False)).alias(
            "significant"
        ),
    )
