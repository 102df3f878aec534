"""Deterministic grouped mode (A3).

Reference semantics: per-cycle modal energy computed via (cycle, energy) pair
counts then idxmax per cycle; pandas idxmax returns the first index in
groupby-sorted order, so ties break to the SMALLEST value
(Requirements/ExamplePipelineCode.md:188-202).

Spark's built-in ``mode()`` is nondeterministic on ties, so this is a pure
relational rewrite: pair-count -> row_number over (count desc, value asc).
No Python in the hot path; two hash-aggregate/shuffle stages on the group key,
both map-side-combinable, whole-stage codegen throughout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_mode(
    df: DataFrame,
    group_by: Sequence[str],
    value_col: str,
    out_col: str = "mode_value",
) -> DataFrame:
    """One row per group: the most frequent value, ties -> smallest value."""
    counts = df.groupBy(*group_by, value_col).agg(F.count(F.lit(1)).alias("__n"))
    w = Window.partitionBy(*group_by).orderBy(F.col("__n").desc(), F.col(value_col).asc())
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*group_by, F.col(value_col).alias(out_col))
    )
