"""Issue detectors (M5/M6).

Reference semantics (Requirements/ExamplePipelineCode.md:335-360):
- low_cycle_count: a stage with fewer than MIN_CYCLES_FOR_VALID_BASELINE
  (10) distinct cycles (:347-354).
- short_cycling: "rapid changes in power consumption over a given cycle"
  (:12, EAC:120); evaluated ONLY for stages with "High" variance that are
  not already low_cycle_count (:356-360). The reference implementation
  (src/algorithms/inner_cycle_algs.py) is not in the snapshot; the published
  HVAC meaning of short cycling — many abnormally short run cycles — is
  implemented here as: median cycle length (rows per cycle) below
  ``min_median_cycle_rows``. With minute-cadence telemetry, rows == minutes,
  so the default 10 flags stages whose typical cycle runs under 10 minutes.

Both are plain aggregations — one shuffle on (stage), map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_CYCLES_FOR_VALID_BASELINE = 10  # EPC:347-354


def low_cycle_counts(
    df: DataFrame, stage_col: str, cycle_col: str, min_cycles: int = MIN_CYCLES_FOR_VALID_BASELINE
) -> DataFrame:
    """Per-stage distinct-cycle count + low_cycle_count flag (EPC:347-354)."""
    return df.groupBy(stage_col).agg(
        F.countDistinct(cycle_col).alias("n_cycles"),
        (F.countDistinct(cycle_col) < min_cycles).alias("low_cycle_count"),
    )


def short_cycling_stages(
    df: DataFrame,
    stage_col: str,
    cycle_col: str,
    min_median_cycle_rows: int = 10,
) -> DataFrame:
    """Per-stage short-cycling flag: median cycle length below threshold.

    Two aggregations: rows per (stage, cycle), then exact median per stage.
    """
    per_cycle = df.groupBy(stage_col, cycle_col).agg(F.count(F.lit(1)).alias("cycle_rows"))
    return per_cycle.groupBy(stage_col).agg(
        F.median("cycle_rows").alias("median_cycle_rows"),
        (F.median("cycle_rows") < min_median_cycle_rows).alias("short_cycling"),
    )
