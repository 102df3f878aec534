"""Valid-cycle filter (P5/P6/J3/J4): the reference's _filter_valid_cycles.

Reference semantics (Requirements/ExamplePipelineCode.md:156-218):
per-cycle stats (count, median, deterministic mode) -> drop null-mode rows ->
keep cycles with count >= min_cycle_length AND median > min_median AND
mode > min_mode -> semi-join the valid cycle set back onto the rows.

Spark-first: groupBy + the mode rewrite + left_semi join. The valid-cycle set
is tiny relative to the fact table (one row per cycle), so the semi-join is
broadcast by AQE/planner automatically; an explicit broadcast hint is applied
for determinism at scale.

Scale: two shuffles on the cycle key (one for stats, one for the semi-join
unless broadcast). At 100 TB the broadcast hint keeps the fact table
un-shuffled — the valid set is bounded by distinct cycles, not rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.mode import grouped_mode
from meshinsights_data_pipeline_spark.operators.stats import grouped_stats


def cycle_stats(
    df: DataFrame,
    cycle_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Per-cycle count, median, deterministic mode (EPC:183-202 shape)."""
    stats = grouped_stats(df, cycle_cols, value_col)
    modes = grouped_mode(df, cycle_cols, value_col, out_col=f"mode_{value_col}")
    return stats.join(modes, list(cycle_cols), "left")


def filter_valid_cycles(
    df: DataFrame,
    cycle_cols: Sequence[str],
    value_col: str,
    min_cycle_length: int = 4,
    min_median: float = 0.0,
    min_mode: float = 0.0,
) -> DataFrame:
    """Keep only rows belonging to valid cycles (EPC:211-218)."""
    stats = cycle_stats(df, cycle_cols, value_col)
    valid = (
        stats.na.drop(subset=[f"mode_{value_col}"])
        .filter(
            (F.col("count") >= min_cycle_length)
            & (F.col(f"median_{value_col}") > min_median)
            & (F.col(f"mode_{value_col}") > min_mode)
        )
        .select(*cycle_cols)
    )
    return df.join(F.broadcast(valid), list(cycle_cols), "left_semi")


def invalid_cycle_rows(
    df: DataFrame,
    cycle_cols: Sequence[str],
    value_col: str,
    min_cycle_length: int = 4,
    min_median: float = 0.0,
    min_mode: float = 0.0,
) -> DataFrame:
    """Complement of filter_valid_cycles (J4 anti-join; EPC:27)."""
    stats = cycle_stats(df, cycle_cols, value_col)
    valid = (
        stats.na.drop(subset=[f"mode_{value_col}"])
        .filter(
            (F.col("count") >= min_cycle_length)
            & (F.col(f"median_{value_col}") > min_median)
            & (F.col(f"mode_{value_col}") > min_mode)
        )
        .select(*cycle_cols)
    )
    return df.join(F.broadcast(valid), list(cycle_cols), "left_anti")
