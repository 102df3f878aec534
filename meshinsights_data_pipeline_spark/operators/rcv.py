"""Robust coefficient of variation (M1): rCV = MAD / median, per group.

Reference semantics: "safety net" variance classifier — rCV > 0.35 -> "High"
(Requirements/ExampleAiCode.md:295-306,332-336; tunables
Requirements/ExamplePipelineCode.md:232-238).

Pure SQL, two-pass exact percentiles: median per group, join back, median of
absolute deviations. No Python anywhere. Both aggregations hash-shuffle on
the group key; the per-group median table is tiny so the join back is
broadcast.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RCV_THRESHOLD = 0.35  # ExamplePipelineCode.md:233


def robust_cv(
    df: DataFrame,
    group_by: Sequence[str],
    value_col: str,
    out_col: str = "rcv",
) -> DataFrame:
    """Per-group MAD/median. Groups with median 0 yield null (division by zero)."""
    keys = list(group_by)
    med = df.groupBy(*keys).agg(F.median(value_col).alias("__med"))
    joined = df.join(F.broadcast(med), keys)
    return (
        joined.groupBy(*keys)
        .agg(
            (F.median(F.abs(F.col(value_col) - F.col("__med"))) / F.any_value("__med")).alias(out_col)
        )
    )
