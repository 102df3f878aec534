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


def gap_fill_interpolate(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    unit: str = "hour",
    round_to: int = 6,
) -> DataFrame:
    """:func:`gap_fill` with LINEAR interpolation instead of
    carry-forward — hypertable ``interpolate()`` semantics: an empty
    bucket between two observations takes the straight-line value
    between them; buckets before the first / after the last observation
    (nothing to interpolate toward) stay NULL on the interpolated
    column. Observed buckets keep their exact downsampled value
    (``frac = 0`` — no float drift at data points).

    Output: [*key_cols, bucket, v_interp, was_observed].

    Cross-engine discipline: bucket epochs are exact BIGINTs, the gap
    fraction is ONE IEEE division, and the interpolation is one fused
    multiply-add mirrored token-for-token in the SQL oracle (x82);
    everything rounds to ``round_to``.

    Scale shape: identical to gap_fill — the raw input is downsampled by
    one map-side-combinable aggregate; grids, windows and joins all run
    over BUCKET-sized data. The two bracketing observations come from
    one ordered window pass per direction (last/first ignorenulls), so
    a key costs its time span, never its event count.
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
    epoch = F.unix_timestamp(F.col("bucket")).cast("bigint")
    w_back = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "next observation" via a DESC-ordered GROWING frame, not an ASC
    # (currentRow, unboundedFollowing) one: growing frames are running
    # aggregates (O(rows) per partition) while Spark evaluates shrinking
    # frames by re-scanning the frame per row — O(rows^2) per partition,
    # measured 21s -> 4s for the 10x grid. Same values by construction
    # (last non-null at-or-before current in DESC order IS the first
    # non-null at-or-after in ASC order).
    w_fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_epoch = F.when(F.col("v_obs").isNotNull(), epoch)
    prev_v = F.last("v_obs", ignorenulls=True).over(w_back)
    prev_t = F.last(obs_epoch, ignorenulls=True).over(w_back)
    next_v = F.last("v_obs", ignorenulls=True).over(w_fwd)
    next_t = F.last(obs_epoch, ignorenulls=True).over(w_fwd)
    frac = (epoch - prev_t).cast("double") / (next_t - prev_t).cast("double")
    interp = F.when(
        F.col("v_obs").isNotNull(), F.col("v_obs").cast("double")
    ).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v.cast("double")
            + (next_v.cast("double") - prev_v.cast("double")) * frac,
        )
    )
    # floor(x * 10^k + 0.5) / 10^k, NOT F.round: interpolated values are
    # low-entropy doubles (even spacing -> midpoints) whose shortest
    # decimal repr can land exactly on a rounding tie, where Spark
    # (BigDecimal of the shortest repr, HALF_UP) and DuckDB (scaled
    # multiply) resolve differently — e.g. 32.5578125 -> ...813 vs
    # ...812. floor-plus-half runs the same two exact IEEE ops in both
    # engines, so it is tie-free by construction (the decimal-cast
    # canary in tests/test_properties.py documents the underlying trap).
    scale = F.lit(float(10 ** round_to))
    return joined.select(
        *key_cols,
        "bucket",
        (F.floor(interp * scale + F.lit(0.5)) / scale).alias("v_interp"),
        F.col("v_obs").isNotNull().alias("was_observed"),
    )


def time_weighted_avg(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Per-key time-weighted average under LOCF weighting (the
    hypertable ``time_weight('LOCF', ...)`` aggregate): each observation
    holds its value until the next one, so
    ``twa = sum(v_i * (t_{i+1} - t_i)) / (t_n - t_0)`` over the key's
    own observation span. The right average for irregularly sampled
    telemetry, where a plain mean over-weights chatty periods.

    Returns ``[*key_cols, t0, t1, span_seconds, twa_micros]`` for keys
    with >= 2 observations (a single point spans no time). INTEGER-ONLY
    output discipline: values quantize losslessly to micros via
    DECIMAL(18,6) (the x69 contract), durations are exact
    timestampdiff micros, products and sums fold through DECIMAL(38,0)
    (no BIGINT wrap, no float summation), and the final division is an
    integer division that TRUNCATES TOWARD ZERO — Spark's ``div`` and
    DuckDB's integer/HUGEINT ``//`` both truncate (DuckDB floors only
    for DOUBLE operands, which the X87 oracle avoids by casting the
    weighted sum to HUGEINT first), so the result is bit-identical
    across engines for positive AND negative values alike; a negative
    weighted sum truncates up in both (-7 div 2 = -3). No step anywhere
    depends on float rounding or decimal->double conversion.
    ``twa = twa_micros / 1e6``.

    Ties: several observations at one timestamp get zero LOCF duration
    except the last in (ts, value) order — deterministic because the
    window order reaches a total order over duplicates' values.

    Scale shape: one entity-keyed window (lead) + one aggregate, both
    shuffling on the key — a key costs its event count, and the window
    frames are plain lag/lead (O(rows) per partition).
    """
    order = [F.col(ts_col).asc(), F.col(value_col).asc()]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    nxt = F.lead(ts_col).over(w)
    # built in steps so timestampdiff sees the lead column by name
    with_dur = (
        df.select(*key_cols, F.col(ts_col), F.col(value_col))
        .withColumn("_next_ts", nxt)
        .withColumn(
            "_dur_us",
            F.coalesce(
                F.expr(f"timestampdiff(MICROSECOND, {ts_col}, _next_ts)"),
                F.lit(0).cast("bigint"),
            ),
        )
        .withColumn(
            "_v_micros",
            F.expr(
                f"CAST(CAST({value_col} AS DECIMAL(18,6)) * 1000000"
                " AS BIGINT)"
            ),
        )
    )
    agg = with_dur.groupBy(*key_cols).agg(
        F.min(ts_col).alias("t0"),
        F.max(ts_col).alias("t1"),
        F.sum(
            F.expr("CAST(CAST(_v_micros AS DECIMAL(38,0)) * _dur_us"
                   " AS DECIMAL(38,0))")
        ).alias("_ws"),
        F.sum("_dur_us").cast("bigint").alias("_span_us"),
    )
    return agg.filter(F.col("_span_us") > 0).select(
        *key_cols,
        "t0",
        "t1",
        F.expr("CAST(_span_us div 1000000 AS BIGINT)").alias("span_seconds"),
        F.expr("CAST(_ws div _span_us AS BIGINT)").alias("twa_micros"),
    )


def rolling_stats(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    id_col: str,
    n: int = 5,
) -> DataFrame:
    """Per-key rolling sum/mean over the last ``n`` observations
    (inclusive of the current row) in event-time order — the
    moving-average smoother every telemetry dashboard and
    feature-engineering pipeline needs next to :func:`time_weighted_avg`
    (which weights by TIME HELD; this weights the last n POINTS
    equally).

    Ordering is the total order ``(ts, id)`` — ``id_col`` breaks
    timestamp ties, because a ROWS frame over a non-total order makes
    the tied rows' frames (hence their sums) depend on partition order.
    Returns ``[*key_cols, id, ts, value, roll_n, roll_sum, roll_avg]``
    for every input row with a non-NULL, non-NaN value (NaN would poison
    every frame it enters; the guard matches the stats siblings).

    Cross-engine determinism: values quantize to DECIMAL(18,6) and the
    frame SUM folds in DECIMAL (exact, order-independent). The exact sum
    casts to DOUBLE (one correctly-rounded conversion of identical
    digits in both engines), and the mean is ONE IEEE division of that
    double, rounded to 6dp — deliberately NOT a decimal division, whose
    result-scale rules differ across engines for non-terminating
    quotients (sum/3).

    Scale shape: ONE entity-keyed shuffle into a sort-ordered window;
    ROWS frames are O(1) amortized per row (running sum, no per-row
    rescans). A key costs its row count — no corpus^2, no driver state.
    """
    v = F.col(value_col).cast("double")
    clean = df.filter(v.isNotNull() & ~F.isnan(v)).select(
        *key_cols,
        F.col(id_col),
        F.col(ts_col),
        v.alias(value_col),
        F.col(value_col).cast("decimal(18,6)").alias("_vd"),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-(int(n) - 1), 0)
    )
    roll_sum = F.sum("_vd").over(w).cast("double")
    roll_n = F.count("_vd").over(w).cast("bigint")
    return clean.select(
        *key_cols,
        F.col(id_col),
        F.col(ts_col),
        F.col(value_col),
        roll_n.alias("roll_n"),
        roll_sum.alias("roll_sum"),
        F.round(roll_sum / roll_n, 6).alias("roll_avg"),
    )


def exp_weighted_avg(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    id_col: str,
    alpha: float = 0.5,
    k: int = 8,
) -> DataFrame:
    """Per-key K-point exponentially-weighted rolling mean in (ts, id)
    order: ``ewa_i = sum_j w_j * x_{i-j} / sum_j w_j`` over the last
    ``min(i, k)`` observations with ``w_j = alpha * (1-alpha)^j`` — the
    recency-weighted smoother between :func:`rolling_stats` (equal
    weights) and a CUSUM alarm (operators/changepoint.py). Deliberately
    a BOUNDED window, not the infinite-history ewm recurrence: the
    k-term truncation makes the semantics self-contained (each row's
    value depends on exactly k rows), the tail weight it drops is
    ``(1-alpha)^k`` (~0.4% at the defaults), and the re-normalizing
    denominator keeps the head of each series unbiased (the same
    ``adjust=True`` convention pandas ewm uses).

    Implementation note (Spark-first): the textbook recurrence is
    sequential, and a collect_list-then-fold depends on list order
    guarantees — instead the k terms are k ``lag()`` expressions over
    ONE window spec, so the whole statistic is a fixed arithmetic
    chain inside whole-stage codegen: one entity-keyed shuffle, no
    arrays, no Python, no order ambiguity.

    Cross-engine determinism: with dyadic ``alpha`` (1/2, 1/4, ...)
    every weight is exactly representable and each term is one
    correctly-rounded IEEE multiply; the numerator/denominator fold in
    fixed j-order and the result is ONE division, rounded to 6dp.
    Rows with NULL/NaN values are dropped FIRST (the stats-family
    guard), so lags step over clean observations only.

    Scale shape: one shuffle, k lag expressions over one window —
    O(k) per row, no frame buffering beyond the window's own k rows.
    """
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    v = F.col(value_col).cast("double")
    clean = df.filter(v.isNotNull() & ~F.isnan(v)).select(
        *key_cols, F.col(id_col), F.col(ts_col), v.alias(value_col)
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(k):
        weight = float(alpha) * (1.0 - float(alpha)) ** j
        term = F.lag(value_col, j).over(w) if j else F.col(value_col)
        num = num + F.coalesce(term * F.lit(weight), F.lit(0.0))
        den = den + F.when(term.isNotNull(), F.lit(weight)).otherwise(
            F.lit(0.0)
        )
    return clean.select(
        *key_cols,
        F.col(id_col),
        F.col(ts_col),
        F.col(value_col),
        F.round(num / den, 6).alias("ewa"),
    )
