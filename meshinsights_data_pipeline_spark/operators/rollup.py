"""Hypertable-style hierarchical time rollup (continuous-aggregate shape).

Multi-granularity time aggregates (hour -> day -> week) where each coarser
grain is computed FROM THE FINER GRAIN'S PARTIALS, not by rescanning raw
data — the TimescaleDB continuous-aggregate / materialized-rollup layout.
At 100 TB this is the difference between one raw scan + tiny cascading
aggregations and three full scans; it also mirrors how a streaming
materialization would maintain the hierarchy incrementally.

Only decomposable aggregates (count, sum, min, max — and mean as sum/count)
can roll up hierarchically; medians/percentiles need sketches (see
stats.approx_quantiles) or a raw pass per grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# grain name -> (date_trunc unit, parent grain)
GRAINS = {
    "hour": ("hour", None),
    "day": ("day", "hour"),
    "week": ("week", "day"),
}


def time_rollup(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str],
    value_col: str,
    grains: tuple[str, ...] = ("hour", "day", "week"),
) -> DataFrame:
    """Stacked multi-grain rollup: [grain, bucket_start, *group_cols, cnt,
    total]. ``total`` sums an exact DECIMAL cast of the value so the
    hierarchical summation order cannot produce float drift vs a direct
    per-grain aggregate.
    """
    for g in grains:
        if g not in GRAINS:
            raise ValueError(f"unknown grain {g!r}; supported: {sorted(GRAINS)}")

    dec = F.col(value_col).cast("decimal(18,6)")
    finest = grains[0]
    levels: dict[str, DataFrame] = {}
    levels[finest] = (
        df.groupBy(
            F.date_trunc(GRAINS[finest][0], F.col(ts_col)).alias("bucket_start"),
            *group_cols,
        )
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(dec).alias("total"))
    )
    for g in grains[1:]:
        parent = levels[grains[grains.index(g) - 1]]
        levels[g] = (
            parent.groupBy(
                F.date_trunc(GRAINS[g][0], F.col("bucket_start")).alias("bucket_start"),
                *group_cols,
            )
            .agg(F.sum("cnt").alias("cnt"), F.sum("total").alias("total"))
        )
    stacked = None
    for g in grains:
        # Aggregation is exact DECIMAL throughout; the OUTPUT is a plain
        # double (deterministic cast of an exact value) so consumers and
        # cross-engine comparisons see a standard type.
        lvl = levels[g].select(
            F.lit(g).alias("grain"),
            "bucket_start",
            *group_cols,
            "cnt",
            # Widen, don't narrow: hierarchical sums grow to decimal(28,6)/
            # (38,6); squeezing back through (18,6) would NULL an overflowing
            # total silently with ANSI off.
            F.col("total").cast("decimal(38,6)").cast("double").alias("total"),
        )
        stacked = lvl if stacked is None else stacked.unionByName(lvl)
    return stacked
