"""Recent-N cap per group (W2): keep the most recent N rows per group.

Reference semantics: positional tail ``power_values[-MAX_RAW_SAMPLES_PER_STAGE:]``
under the chronological-order precondition
(Requirements/ExamplePipelineCode.md:232,246-247). In Spark, frame order is
never trusted: an explicit descending-timestamp row_number window with a
documented tiebreak key makes the result deterministic.

Scale: one shuffle on the group key; row_number short-circuits nothing by
itself, but the subsequent filter prunes before any downstream shuffle. For
very hot groups at 100 TB, pre-aggregate or bucket by group key upstream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def recent_n(
    df: DataFrame,
    n: int,
    group_by: Sequence[str | Column],
    ts_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Keep the N most-recent rows per group, ordered by ts desc (+ tiebreak desc)."""
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*group_by).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
