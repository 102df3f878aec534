"""Cycle sessionization (W1): label consecutive constant-state runs.

Reference semantics: "Cycle is an index ... successive measures where the
stage is constant" (Requirements/ExampleAiCode.md:131; ExamplePipelineCode.md:26,421-422).
A new cycle starts whenever the state column changes between consecutive
rows, ordered chronologically within a device/partition key.

Spark-first: lag + change-flag + running sum over a Window. Never relies on
frame order (the reference's implicit chronological precondition,
ExamplePipelineCode.md:229-230) — ordering is explicit in the window spec,
with a tiebreak column for deterministic results on equal timestamps.

Scale: the window partitions by the device key, so a 100 TB telemetry table
shuffles once on (partition_keys) and each device's series is processed
within one task. Skewed devices are handled by AQE skew splitting only if the
window is rewritten per-range; in practice device series are bounded
(~130k rows/device-quarter, Requirements/requirements.md:42).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    state_col: str,
    order_by: Sequence[str | Column],
    partition_by: Sequence[str | Column] = (),
    cycle_col: str = "cycle",
) -> DataFrame:
    """Add a ``cycle_col`` that increments whenever ``state_col`` changes.

    The first row of each partition gets cycle 1 (the change flag is 1 because
    lag is null and we use null-safe inequality).
    """
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
    else:
        w = Window.partitionBy().orderBy(*order_by)
    prev = F.lag(F.col(state_col)).over(w)
    # Null-safe: first row (lag null) counts as a change -> cycles start at 1.
    change = (~prev.eqNullSafe(F.col(state_col))).cast("int")
    running = F.sum(change).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(cycle_col, running)
