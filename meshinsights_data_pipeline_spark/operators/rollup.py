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

from pyspark.sql import DataFrame, Window
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


def gap_fill(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    unit: str = "hour",
) -> DataFrame:
    """Regularize an irregular series to a fixed time grid with
    last-observation-carried-forward — the gap-filling / interpolation
    primitive behind telemetry dashboards and hypertable
    ``time_bucket_gapfill``-style queries.

    Per key: observations are bucketed to ``unit`` (downsampled
    deterministically by MAX — order-independent, unlike a float mean),
    the grid spans the key's own [min, max] bucket, and empty buckets
    carry the previous observation forward (null until the first one).

    Output: [*key_cols, bucket, v_filled, was_observed].

    Scale shape: one groupBy to buckets (map-side combinable; the big
    input never touches a window), then grid generation from the tiny
    per-key bounds frame (sequence+explode — rows = buckets, not raw
    events), one join and one per-key ordered window over grid-sized
    data. Skewed keys cost what their time span costs, not what their
    event count costs.
    """
    b = F.date_trunc(unit, F.col(ts_col))
    obs = df.groupBy(*key_cols, b.alias("bucket")).agg(
        F.max(value_col).alias("v_obs")
    )
    bounds = obs.groupBy(*key_cols).agg(
        F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1")
    )
    grid = bounds.select(
        *key_cols,
        F.explode(F.expr(f"sequence(_b0, _b1, interval 1 {unit})")).alias("bucket"),
    )
    joined = grid.join(obs, [*key_cols, "bucket"], "left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *key_cols,
        "bucket",
        F.last("v_obs", ignorenulls=True).over(w).alias("v_filled"),
        F.col("v_obs").isNotNull().alias("was_observed"),
    )
