"""Grouped descriptive statistics (A1/A2/A4/A5/A6/A7).

Reference semantics:
- per-cycle count/median (Requirements/ExamplePipelineCode.md:183-186)
- order-dependent "first" per cycle (:438-441) -> deterministic
  min(timeStamp) + min_by(value, timeStamp)
- distinct cycle count (:353)
- weekly per-(week, stage) count/mean/median/std(ddof=0), each rounded to int
  (Requirements/ExampleAiCode.md:229-241) — population stddev, NOT sample.

All exact: median is the exact interpolated percentile (matches pandas and
DuckDB quantile_cont). ``approx_percentile`` is reserved for the 100 TB tier
and never used in correctness paths (SURVEY §4 trap 4).

Scale: single hash-aggregate per call, partial+final (map-side combine) from
Catalyst automatically. median/percentile requires full value collection per
group — at 100 TB prefer pre-capping (recent_n) or sketch-based quantiles
where the workload tolerates it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.barrier import (
    materialize as _materialize,
)
from meshinsights_data_pipeline_spark.operators.weekly import sunday_week_start


def grouped_stats(
    df: DataFrame,
    group_by: Sequence[str],
    value_col: str,
    ts_col: str | None = None,
    first_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group count / median(value) / earliest ts / value-at-earliest-ts.

    ``first_cols`` values are taken at the earliest ``ts_col`` row
    (deterministic replacement for the reference's order-dependent 'first').
    """
    aggs: list[Column] = [
        F.count(F.lit(1)).alias("count"),
        F.median(value_col).alias(f"median_{value_col}"),
    ]
    if ts_col is not None:
        aggs.append(F.min(ts_col).alias(f"first_{ts_col}"))
        for c in first_cols:
            aggs.append(F.min_by(c, F.col(ts_col)).alias(f"first_{c}"))
    return df.groupBy(*group_by).agg(*aggs)


def distinct_count(df: DataFrame, group_by: Sequence[str], key_col: str, out_col: str = "n_distinct") -> DataFrame:
    """Exact distinct count per group (A5). approx_count_distinct is the
    100 TB alternative, never the correctness path."""
    return df.groupBy(*group_by).agg(F.countDistinct(key_col).alias(out_col))


def approx_distinct_count(
    df: DataFrame,
    group_by: Sequence[str],
    key_col: str,
    rsd: float = 0.05,
    out_col: str = "n_distinct_approx",
) -> DataFrame:
    """100 TB tier for A5: HyperLogLog++ distinct count.

    One map-side-combinable sketch per group (constant memory per key) vs
    the exact path's full shuffle of distinct values — the only viable shape
    when key cardinality itself is huge. Never used in correctness oracles.
    """
    return df.groupBy(*group_by).agg(
        F.approx_count_distinct(key_col, rsd=rsd).alias(out_col)
    )


def approx_quantiles(
    df: DataFrame,
    group_by: Sequence[str],
    value_col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75),
    accuracy: int = 10000,
) -> DataFrame:
    """100 TB tier for A2/A6: approximate percentiles (Greenwald-Khanna).

    Mergeable sketches -> map-side partials + one small shuffle, instead of
    the exact percentile's full sort per group. Accuracy trades memory for
    error (~1/accuracy relative rank error)."""
    probs = F.array(*[F.lit(float(p)) for p in probabilities])
    return df.groupBy(*group_by).agg(
        F.percentile_approx(value_col, probs, F.lit(accuracy)).alias("quantiles_approx")
    )


def weekly_stats(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    extra_group_by: Sequence[str] = (),
    sunday_weeks: bool = True,
) -> DataFrame:
    """Per-(week, group) count / mean / median / stddev_pop, rounded to whole
    numbers as longs (ExampleAiCode.md:238-241 ``int(round(., 0))``)."""
    wk = sunday_week_start(ts_col) if sunday_weeks else F.date_trunc("week", F.col(ts_col))
    grouped = df.groupBy(wk.alias("week_start"), *extra_group_by)
    return grouped.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg(value_col), 0).cast("long").alias("mean_v"),
        F.round(F.median(value_col), 0).cast("long").alias("median_v"),
        F.round(F.stddev_pop(value_col), 0).cast("long").alias("std_dev"),
    )


def profile_columns(
    df: DataFrame, cols: Sequence[str], approx: bool = False
) -> DataFrame:
    """Data-quality profile: one row per column with
    [col_name, n_rows, n_nulls, n_distinct] — the validation pass a
    pipeline runs on a new source before trusting it.

    One aggregation job / one source scan either way, but the two modes
    differ sharply in plan cost: EXACT multi-column distinct counts plan
    through an Expand that replicates every input row (len(cols)+1)x into
    the aggregate — a real multiplier at 100 TB even though the parquet
    scan itself happens once. ``approx=True`` switches to
    ``approx_count_distinct`` (HyperLogLog++), whose counters are plain
    map-side-combinable accumulators with NO Expand — the right mode for
    profiling at scale, where +-2% on n_distinct is immaterial. Exact is
    the default only because the x36 oracle compares bit-exact counts.
    The per-column rows are unpivoted from the 1-row result via an inline
    array — driver never sees data, output stays a lazy frame.
    """
    nd = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(nd(F.col(c)).alias(f"_nd_{c}"))
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").cast("bigint").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).cast("bigint").alias("n_nulls"),
                F.col(f"_nd_{c}").cast("bigint").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return (
        one.select(F.explode(rows).alias("p"))
        .select("p.col_name", "p.n_rows", "p.n_nulls", "p.n_distinct")
    )


def profile_numeric(
    df: DataFrame, cols: Sequence[str], approx: bool = False,
    ranked: bool = False,
) -> DataFrame:
    """Numeric data-quality profile: one row per column with
    [col_name, n, n_null, vmin, vmax, vmean, p50, p95].

    The mean is an exact DECIMAL sum divided once in every tier (float
    sums are partition-order-dependent; this is engine-stable). Three
    percentile tiers:

    - default: exact interpolated ``F.percentile`` — same definition as
      DuckDB ``quantile_cont``, so the profile is oracle-checkable; the
      aggregate buffers EVERY value of the column, fine to ~10^8 rows.
    - ``ranked=True``: the SAME exact values via
      ``global_rank.ranked_percentiles`` — one range shuffle per column,
      bracketing-rank pick, interpolation; no operator ever holds the
      column, so this is the exact tier that survives 100 TB.
    - ``approx=True``: Greenwald-Khanna ``approx_percentile`` when an
      error bound is acceptable — cheapest, single pass.

    Base stats are always one aggregation pass; rows are unpivoted from
    the 1-row result (profile_columns pattern).
    """
    if approx and ranked:
        raise ValueError("pick one percentile tier: approx or ranked")
    pct = F.percentile_approx if approx else F.percentile
    probs = F.array(F.lit(0.5), F.lit(0.95))
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        dec = F.col(c).cast("decimal(24,6)")
        aggs += [
            F.count(v).alias(f"_n_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nn_{c}"),
            F.min(v).alias(f"_min_{c}"),
            F.max(v).alias(f"_max_{c}"),
            (F.sum(dec).cast("double") / F.count(v)).alias(f"_mean_{c}"),
        ]
        if not ranked:
            # ONE percentile aggregate per column: each exact percentile
            # call collects the full column independently, so two scalar
            # calls pay the value collection twice (measured 2x at sf0.1).
            aggs.append(pct(v, probs).alias(f"_pq_{c}"))
    one = df.agg(*aggs)
    if ranked:
        from meshinsights_data_pipeline_spark.operators.global_rank import (
            ranked_percentiles,
        )

        for c in cols:
            pq = ranked_percentiles(df, c, [0.5, 0.95]).select(
                F.array("p0", "p1").alias(f"_pq_{c}")
            )
            one = one.crossJoin(F.broadcast(pq))
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"_n_{c}").cast("bigint").alias("n"),
                F.col(f"_nn_{c}").cast("bigint").alias("n_null"),
                F.round(F.col(f"_min_{c}"), 6).alias("vmin"),
                F.round(F.col(f"_max_{c}"), 6).alias("vmax"),
                F.round(F.col(f"_mean_{c}"), 6).alias("vmean"),
                F.round(F.element_at(F.col(f"_pq_{c}"), 1), 6).alias("p50"),
                F.round(F.element_at(F.col(f"_pq_{c}"), 2), 6).alias("p95"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select(
        "p.col_name", "p.n", "p.n_null", "p.vmin", "p.vmax", "p.vmean",
        "p.p50", "p.p95",
    )


def histogram_fixed_width(
    df: DataFrame, col: str, buckets: int = 10
) -> DataFrame:
    """Equal-width histogram of a numeric column: ``buckets`` bins
    spanning [min, max], ``[bucket, lo, hi, n]`` (empty bins absent; the
    max value closes into the last bin). The distribution companion to
    :func:`profile_numeric`'s point statistics — what a data card plots.

    Cross-engine determinism: bin edges and assignments are the same
    IEEE ops evaluated on the same doubles in both engines (width = one
    subtraction + one division; bucket = one subtract, one divide, one
    floor), so bucket ids and edges are bit-identical — no rounding is
    applied or needed. A degenerate column (min == max) collapses into
    bucket 0 by a width=0 guard rather than a 0/0 NaN.

    Scale shape: one min/max aggregate (map-side combinable), broadcast
    of the 1-row bounds, one map-side bucket projection, one bucket-
    keyed count — two scans, one tiny shuffle; no value is ever
    collected or buffered.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be positive, got {buckets}")
    v = F.col(col).cast("double")
    # NaN is not NULL: one NaN would poison max() -> width NaN -> every
    # row silently collapses into bucket 0; filter it with the nulls.
    vals = df.select(v.alias("_v")).filter(
        F.col("_v").isNotNull() & ~F.isnan("_v")
    )
    bounds = vals.agg(
        F.min("_v").alias("_lo"), F.max("_v").alias("_hi")
    )
    k = F.lit(int(buckets))
    width = (F.col("_hi") - F.col("_lo")) / k
    bucket = F.when(width > 0, F.least(
        k - 1, F.floor((F.col("_v") - F.col("_lo")) / width).cast("int")
    )).otherwise(F.lit(0))
    return (
        vals.crossJoin(F.broadcast(bounds))
        .select(
            bucket.alias("bucket"),
            (F.col("_lo") + bucket * width).alias("lo"),
            (F.col("_lo") + (bucket + 1) * width).alias("hi"),
        )
        .groupBy("bucket", "lo", "hi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def zscore_outliers(
    df: DataFrame,
    group_by: Sequence[str],
    value_col: str,
    threshold: float = 2.0,
    round_to: int = 6,
) -> DataFrame:
    """Per-group z-score outlier flags — the parametric sibling of the
    MAD-based robust_cv classifier: rows whose value sits more than
    ``threshold`` population standard deviations from their group's
    mean. Returns the input's group/value columns plus ``[mean_v,
    std_v, z, is_outlier]`` for every row of groups with n >= 2 and
    non-zero variance (a constant group has no outliers by definition
    and is excluded rather than emitting 0/0).

    Cross-engine determinism AND numerical stability: ``F.stddev_pop``
    float-sums in partition order, so its last ulps are not
    reproducible — instead the moments are computed over the PIVOTED
    values ``d = v - min(v)`` (the textbook shifted-variance fix:
    var(v) = var(d), and with the group's own min as pivot the d
    magnitudes are the group's RANGE, so ``sq/n - (s/n)^2`` cannot
    catastrophically cancel the way raw epoch-like magnitudes with
    sigma/mu < ~1e-8 do — where the naive form computes var = 0 and
    silently drops the group). The d sums fold through DECIMAL(38,12)
    (exact, order-independent); the pivot subtraction and every
    remaining op are single correctly-rounded IEEE operations, so
    results stay bit-identical across engines. z rounds to
    ``round_to``; the flag compares the ROUNDED z so both engines
    decide borderline rows identically.

    Scale shape: one map-side-combinable aggregate to the per-group
    moment table (|groups| rows), broadcast back, one map-side
    projection. The big input is scanned twice and shuffled never.
    """
    keys = list(group_by)
    dec = "decimal(38,12)"
    v = F.col(value_col).cast("double")
    # NaN is not NULL: it would count into _n via F.count(v) but drop out
    # of the DECIMAL sums (NaN->decimal casts NULL), silently biasing the
    # group's mean/std — and DuckDB's NaN->DECIMAL cast diverges from
    # Spark's. Filter it with the nulls, like the sibling operators
    # (histogram_fixed_width / psi_drift) do.
    df = df.filter(v.isNotNull() & ~F.isnan(v))
    pivots = df.groupBy(*keys).agg(F.min(v).alias("_p"))
    d = v - F.col("_p")
    moments = (
        df.join(F.broadcast(pivots), keys)
        .groupBy(*keys)
        .agg(
            F.count(v).cast("bigint").alias("_n"),
            F.min("_p").alias("_p"),
            F.sum(d.cast(dec)).cast("double").alias("_s"),
            F.sum((d * d).cast(dec)).cast("double").alias("_sq"),
        )
    )
    mean = F.col("_p") + F.col("_s") / F.col("_n")
    var = F.col("_sq") / F.col("_n") - (
        F.col("_s") / F.col("_n")
    ) * (F.col("_s") / F.col("_n"))
    stats = moments.filter(F.col("_n") >= 2).select(
        *keys,
        mean.alias("mean_v"),
        F.sqrt(var).alias("std_v"),
    ).filter(F.col("std_v") > 0)
    z = F.round((v - F.col("mean_v")) / F.col("std_v"), round_to)
    return (
        df.join(F.broadcast(stats), keys)
        .select(
            *keys,
            v.alias(value_col),
            F.round(F.col("mean_v"), round_to).alias("mean_v"),
            F.round(F.col("std_v"), round_to).alias("std_v"),
            z.alias("z"),
            (F.abs(z) > F.lit(float(threshold))).alias("is_outlier"),
        )
    )


def psi_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    buckets: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Population Stability Index of a numeric column per group against
    the whole corpus — the standard model-monitoring drift score
    (PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 shifted), sibling of
    corpus.source_drift's token-level TV distance / chi-square:

        PSI_g = sum over bins (p_i - q_i) * ln(p_i / q_i)

    over ``buckets`` equal-width bins spanning the corpus [min, max],
    with p the group's bin fractions and q the corpus's. Bins where the
    GROUP has no mass are skipped (the epsilon-free one-sided variant —
    no arbitrary smoothing constant to keep in sync across engines);
    missing-bin drift is what source_drift's TV distance measures, so
    the two are used together. Returns ``[group, n, psi]``.

    Cross-engine determinism: bin ids are the histogram_fixed_width
    assignment (same IEEE ops both engines); ln's argument is a ratio
    of exact integer products (the x74 ln-of-exact-input precedent) and
    the per-group sum folds through DECIMAL(38,18).

    Scale shape: one min/max aggregate, one (group, bin) count
    (map-side combinable), broadcast bin marginals — the corpus is
    scanned twice and shuffled never.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be positive, got {buckets}")
    v = F.col(value_col).cast("double")
    # same NaN guard as histogram_fixed_width: one NaN would poison the
    # corpus max and collapse every group into a single bin (PSI ~ 0).
    vals = df.select(F.col(group_col).alias("g"), v.alias("_v")).filter(
        F.col("_v").isNotNull() & ~F.isnan("_v")
    )
    bounds = vals.agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"))
    k = F.lit(int(buckets))
    width = (F.col("_hi") - F.col("_lo")) / k
    bucket = F.when(width > 0, F.least(
        k - 1, F.floor((F.col("_v") - F.col("_lo")) / width).cast("int")
    )).otherwise(F.lit(0))
    binned = vals.crossJoin(F.broadcast(bounds)).select(
        "g", bucket.alias("b")
    )
    gb = binned.groupBy("g", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_gb")
    )
    g_tot = gb.groupBy("g").agg(F.sum("c_gb").cast("bigint").alias("n_g"))
    b_tot = gb.groupBy("b").agg(F.sum("c_gb").cast("bigint").alias("c_b"))
    tot = gb.agg(F.sum("c_gb").cast("bigint").alias("n"))
    # p/q = (c_gb / n_g) / (c_b / n): ln of a ratio of exact integer
    # products; (p - q) is two exact divisions and one subtraction. The
    # products route through DECIMAL(38,0) (the x73/x83 discipline) —
    # c_gb * n in raw BIGINT silently wraps past 2^63 at the target
    # corpus scale in Spark and errors in DuckDB.
    term = (
        F.col("c_gb") / F.col("n_g") - F.col("c_b") / F.col("n")
    ) * F.log(
        F.expr("CAST(CAST(c_gb AS DECIMAL(38,0)) * n AS DOUBLE)")
        / F.expr("CAST(CAST(c_b AS DECIMAL(38,0)) * n_g AS DOUBLE)")
    )
    dec = "decimal(38,18)"
    return (
        gb.join(F.broadcast(g_tot), "g")
        .join(F.broadcast(b_tot), "b")
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("g").alias(group_col))
        .agg(
            F.max("n_g").cast("bigint").alias("n"),
            F.round(
                F.sum(term.cast(dec)).cast("double"), round_to
            ).alias("psi"),
        )
    )


def ks_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
    buckets: int | None = None,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic of each group's
    numeric distribution against the whole corpus — the third leg of the
    drift-monitor family (psi_drift is bin-based and misses within-bin
    shifts; corpus.source_drift is token-level; KS is the exact
    distribution-free sup-norm):

        KS_g = max over v of |ECDF_g(v) - ECDF_corpus(v)|

    evaluated at every distinct corpus value (ECDFs are step functions
    jumping only there, so the sup over the reals IS this max). Returns
    ``[group, n, ks]``. Rows with a NULL group key are EXCLUDED (a
    NULL-keyed group would fall out of the null-unsafe grid join below
    and score a spurious maximal ks = 1.0); route NULLs to a sentinel
    label upstream if they should be monitored as their own group.

    Cross-engine determinism: the maximand is rewritten as the exact
    integer |cum_g * n - cum_all * n_g| (routed through DECIMAL(38,0),
    the psi_drift discipline — raw BIGINT products wrap past 2^63 at
    corpus scale); the arg-max is therefore an exact integer comparison,
    and only the FINAL division (max_num / (n_g * n)) is a double op,
    rounded. No float enters the max.

    Scale shape: one (group, value) count and one (value) count (both
    map-side combinable), then a grid of |groups| x |distinct values|
    rows — the group list is broadcast onto the corpus value spine, and
    the running sums are one window per group partition. This is exact
    KS for a BOUNDED group count (sources, experiment arms); for
    high-cardinality values quantize first (the histogram_fixed_width
    bins), which bounds the spine and keeps the same code path.
    """
    counts = ks_value_counts(
        df, group_col, value_col, buckets=buckets, bounds=bounds
    )
    return ks_from_counts(counts, round_to=round_to).withColumnRenamed(
        "g", group_col
    )


def ks_value_counts(
    df: DataFrame,
    group_col: str,
    value_col: str,
    buckets: int | None = None,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """The ``[g, _v, _c_gv]`` count stage of :func:`ks_drift`, shared
    with the streaming twin so the two can never drift: NULL/NaN values
    AND NULL group keys are excluded here, in exactly one place.

    ``buckets`` is the 100 TB tier made a parameter (the x90
    precedent): values quantize to equal-width bin ids over
    ``bounds`` = (lo, hi), bounding the corpus spine — and the
    streaming twin's state — at ``buckets`` rows per group instead of
    |distinct values|. The result is then the EXACT KS of the binned
    distributions (every quantized row keeps the same code path and
    integer arg-max). With ``bounds=None`` the corpus's own min/max
    are used (one extra tiny aggregate + broadcast, batch only); the
    streaming twin REQUIRES explicit bounds — data-derived bounds
    would shift between micro-batches and silently re-bin history.
    Values outside explicit bounds clamp to the edge bins (same IEEE
    assignment as histogram_fixed_width in both engines). ``bounds``
    without ``buckets`` raises: bounds only parameterize the quantized
    tier, and silently ignoring them would hand a caller unbounded
    per-distinct-value state while they believe the state is bounded.
    """
    if bounds is not None and buckets is None:
        raise ValueError(
            "bounds without buckets is not supported: bounds only "
            "parameterize the quantized tier — pass buckets too"
        )
    v = F.col(value_col).cast("double")
    vals = df.select(F.col(group_col).alias("g"), v.alias("_v")).filter(
        F.col("g").isNotNull() & F.col("_v").isNotNull() & ~F.isnan("_v")
    )
    if buckets is not None:
        if buckets < 1:
            raise ValueError(f"buckets must be positive, got {buckets}")
        k = F.lit(int(buckets))
        if bounds is not None:
            lo, hi = float(bounds[0]), float(bounds[1])
            blo, bhi = F.lit(lo), F.lit(hi)
            src = vals
        else:
            b = vals.agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"))
            blo, bhi = F.col("_lo"), F.col("_hi")
            src = vals.crossJoin(F.broadcast(b))
        width = (bhi - blo) / k
        # The edge-bin clamp must happen BEFORE the int cast: on a value
        # >= ~2^31 bin-widths past explicit bounds, floor((v - lo)/width)
        # exceeds INT range and the ANSI cast throws CAST_OVERFLOW
        # instead of clamping — crashing exactly the bounded-state tier
        # meant to absorb unbounded junk. Clamping _v into [lo, hi]
        # first bounds the floor at [0, k]; for in-range values the
        # clamp is the identity, so the IEEE bin assignment is unchanged.
        cv = F.greatest(blo, F.least(bhi, F.col("_v")))
        bucket = F.when(
            width > 0,
            F.greatest(
                F.lit(0),
                F.least(k - 1, F.floor((cv - blo) / width).cast("int")),
            ),
        ).otherwise(F.lit(0))
        vals = src.select("g", bucket.cast("double").alias("_v"))
    return vals.groupBy("g", "_v").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c_gv")
    )


def ks_from_counts(counts: DataFrame, round_to: int = 6) -> DataFrame:
    """:func:`ks_drift` from a pre-aggregated ``[g, _v, _c_gv]`` count
    table — the mergeable-sufficient-statistic entry point the streaming
    twin folds into (counts sum across micro-batches, so the recomputed
    statistic has FULL cross-batch parity, the PMI/drift-twin shape).
    Returns ``[g, n, ks]``.
    """
    c_gv = counts
    # corpus spine: distinct values with corpus count (derived from the
    # (g, v) counts — the corpus is scanned once). The corpus running
    # total is computed INSIDE the per-group grid window below, not on a
    # single-partition global window (the repo's standing anti-pattern).
    spine = c_gv.groupBy("_v").agg(
        F.sum("_c_gv").cast("bigint").alias("_c_v")
    )
    sizes = c_gv.groupBy("g").agg(F.sum("_c_gv").cast("bigint").alias("_n_g"))
    tot = sizes.agg(F.sum("_n_g").cast("bigint").alias("_n"))
    grid = spine.crossJoin(F.broadcast(sizes)).join(
        c_gv, ["g", "_v"], "left"
    )
    w = (
        Window.partitionBy("g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_g = F.sum(F.coalesce(F.col("_c_gv"), F.lit(0))).over(w)
    cum_all = F.sum("_c_v").over(w)
    dec = "decimal(38,0)"
    num = F.abs(
        cum_g.cast(dec) * F.col("_n") - cum_all.cast(dec) * F.col("_n_g")
    )
    return (
        grid.crossJoin(F.broadcast(tot))
        .select("g", "_n_g", "_n", num.alias("_num"))
        .groupBy("g")
        .agg(
            F.max("_n_g").cast("bigint").alias("n"),
            F.round(
                F.max("_num").cast("double")
                / (F.max("_n_g").cast(dec) * F.max("_n")).cast("double"),
                round_to,
            ).alias("ks"),
        )
    )


def mad_outliers(
    df: DataFrame,
    group_by: Sequence[str],
    value_col: str,
    threshold: float = 3.0,
    round_to: int = 6,
) -> DataFrame:
    """Per-group MAD (median-absolute-deviation) outlier flags — the
    ROBUST sibling of :func:`zscore_outliers`: score = |v - median| /
    MAD, flagged when it exceeds ``threshold``. Unlike the z-score, one
    wild value cannot inflate the spread estimate and mask itself (the
    classic masking failure: a single 10^6 outlier blows up sigma until
    nothing is > 2 sigma), so this is the detector to run on telemetry
    with fat tails. Raw MAD, no 1.4826 consistency constant — thresholds
    are in MAD units, documented, engine-identical.

    Returns the group/value columns plus ``[med_v, mad_v, score,
    is_outlier]`` for every row of groups with MAD > 0 (a group whose
    majority is constant has MAD 0 — every deviation would be infinite;
    excluded like zscore's zero-variance groups, by the ROUNDED mad so
    both engines drop the same borderline groups). NULL/NaN values are
    filtered up front (the sibling guard).

    Cross-engine determinism: both medians are exact interpolated
    percentiles (the q09/q13-proven parity surface — single
    correctly-rounded IEEE ops, no float summation anywhere); score
    compares AFTER rounding to ``round_to`` so borderline rows decide
    identically in both engines.

    Scale shape: two map-side-scanned exact-median aggregates (two-pass,
    the rcv.robust_cv plan) with the tiny per-group tables broadcast
    back; the big input is scanned three times and shuffled never.
    """
    keys = list(group_by)
    v = F.col(value_col).cast("double")
    df = df.filter(v.isNotNull() & ~F.isnan(v))
    med = df.groupBy(*keys).agg(F.median(v).alias("med_v"))
    mad = (
        df.join(F.broadcast(med), keys)
        .groupBy(*keys)
        .agg(
            F.min("med_v").alias("med_v"),
            F.round(F.median(F.abs(v - F.col("med_v"))), round_to).alias(
                "mad_v"
            ),
        )
        .filter(F.col("mad_v") > 0)
    )
    score = F.round(F.abs(v - F.col("med_v")) / F.col("mad_v"), round_to)
    return (
        df.join(F.broadcast(mad), keys)
        .select(
            *keys,
            v.alias(value_col),
            F.round(F.col("med_v"), round_to).alias("med_v"),
            F.col("mad_v"),
            score.alias("score"),
            (score > F.lit(float(threshold))).alias("is_outlier"),
        )
    )


def winsorize(
    df: DataFrame,
    group_by: Sequence[str],
    value_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    round_to: int = 6,
) -> DataFrame:
    """Per-group percentile clipping (winsorization) — the standard
    feature-cleaning step before scale-sensitive training: values below
    the group's ``lower`` quantile or above its ``upper`` quantile snap
    to the bound; everything between passes through exactly. The
    CLIPPING sibling of the FLAGGING detectors (zscore_outliers /
    mad_outliers): those report, this repairs.

    Returns ``[*group_by, value, lo, hi, v_winsor, was_clipped]`` for
    every input row with a non-NULL, non-NaN value (the sibling guard
    — a NaN would poison the percentile buffer). ``lo``/``hi``/
    ``v_winsor`` round to ``round_to`` for the output; ``was_clipped``
    compares the UNROUNDED value against the UNROUNDED bounds, which
    are the same IEEE interpolated percentiles in both engines (the
    x61-proven parity surface), so both decide identically.

    Scale shape: one map-side-scanned exact-percentile aggregate to the
    per-group bounds table (|groups| rows), broadcast back, one
    map-side projection. Exact percentiles buffer each group's values —
    fine to ~10^8 rows per group; at the 100 TB tier swap
    ``F.percentile`` for ``percentile_approx`` or the
    global_rank.ranked_percentiles machinery (same output columns).
    """
    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError(f"need 0 <= lower < upper <= 1, got {lower}, {upper}")
    keys = list(group_by)
    v = F.col(value_col).cast("double")
    df = df.filter(v.isNotNull() & ~F.isnan(v))
    bounds = df.groupBy(*keys).agg(
        F.percentile(v, F.lit(float(lower))).alias("_lo"),
        F.percentile(v, F.lit(float(upper))).alias("_hi"),
    )
    clipped = F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    return (
        df.join(F.broadcast(bounds), keys)
        .select(
            *keys,
            v.alias(value_col),
            F.round(F.col("_lo"), round_to).alias("lo"),
            F.round(F.col("_hi"), round_to).alias("hi"),
            F.round(clipped, round_to).alias("v_winsor"),
            ((v < F.col("_lo")) | (v > F.col("_hi"))).alias("was_clipped"),
        )
    )


def rfm_scores(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    approx: bool = False,
) -> DataFrame:
    """RFM segmentation — the classic customer-analytics scoring: per
    user, Recency (days since last event, against the dataset's own
    max event time), Frequency (event count), Monetary (exact value
    sum), each scored 1-4 by the population's quartile THRESHOLDS
    (recent/frequent/high-value = 4). Returns ``[user, recency_days,
    frequency, monetary_micros, r_score, f_score, m_score, rfm]``
    (rfm = 100*r + 10*f + m, the usual segment code).

    Threshold scoring, deliberately NOT ntile: ntile is a global sort
    (single-partition at |users|), while 1 + (v > q1) + (v > q2) +
    (v > q3) needs only three broadcast scalars and a map-side
    projection — same segments users actually read, no sort anywhere.
    Determinism: recency is exact timestampdiff micros floor-divided to
    whole days, monetary is the x69 DECIMAL(18,6)-exact integer-micros
    fold, quartile cuts are exact interpolated percentiles (the
    x61/x95 parity surface), and every score comparison is strict
    against those shared doubles — both engines bucket identically.

    Scale shape: one user-keyed aggregate (map-side combinable) builds
    the RFM frame; one 1-row aggregate computes max-ts + all nine
    quartile cuts; broadcast + map-side scoring. Two passes over the
    |users| frame, zero over the event log beyond the first aggregate.

    100 TB tier: the exact interpolated ``percentile`` buffers each
    cut's values per partition before merging — fine at |users| scales
    that fit an executor, the wrong tool at billions of users. Pass
    ``approx=True`` to compute the nine cuts with ``percentile_approx``
    (t-digest sketch: bounded memory, one pass, mergeable) — scores
    near a quartile boundary may shift by the sketch's rank error;
    segment semantics are otherwise identical. The default stays exact
    because it is the cross-engine oracle surface.
    """
    pctl = F.percentile_approx if approx else F.percentile
    per_user = df.groupBy(user_col).agg(
        F.max(ts_col).alias("_last"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        (F.sum(F.col(value_col).cast("decimal(18,6)")) * F.lit(1_000_000))
        .cast("bigint")
        .alias("monetary_micros"),
    )
    ref = per_user.agg(F.max("_last").alias("_ref"))
    base = per_user.crossJoin(F.broadcast(ref)).withColumn(
        "recency_days",
        F.expr("CAST(timestampdiff(MICROSECOND, _last, _ref)"
               " div 86400000000 AS BIGINT)"),
    )
    cuts = base.agg(
        *[
            pctl(F.col(c).cast("double"), F.lit(p)).alias(
                f"_{c}_{int(p * 100)}"
            )
            for c in ("recency_days", "frequency", "monetary_micros")
            for p in (0.25, 0.5, 0.75)
        ]
    )

    def up(c):  # bigger is better: frequency, monetary
        v = F.col(c).cast("double")
        return (
            F.lit(1)
            + (v > F.col(f"_{c}_25")).cast("int")
            + (v > F.col(f"_{c}_50")).cast("int")
            + (v > F.col(f"_{c}_75")).cast("int")
        ).cast("bigint")

    def down(c):  # smaller is better: recency gap
        v = F.col(c).cast("double")
        return (
            F.lit(1)
            + (v < F.col(f"_{c}_75")).cast("int")
            + (v < F.col(f"_{c}_50")).cast("int")
            + (v < F.col(f"_{c}_25")).cast("int")
        ).cast("bigint")

    r, f_, m = down("recency_days"), up("frequency"), up("monetary_micros")
    return base.crossJoin(F.broadcast(cuts)).select(
        F.col(user_col),
        "recency_days",
        "frequency",
        "monetary_micros",
        r.alias("r_score"),
        f_.alias("f_score"),
        m.alias("m_score"),
        (r * 100 + f_ * 10 + m).cast("bigint").alias("rfm"),
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Quantile normalization of a per-group score onto the corpus
    distribution: each row's value is replaced by the corpus value at
    the same within-group quantile — the standard pre-mixing transform
    when several scorers (or sources) emit incomparable scales (a 0.9
    from a lenient scorer and a 0.4 from a harsh one can be the same
    quality; after normalization equal ranks ARE equal scores). The
    rank-based sibling of zscore/winsorize: no distributional
    assumption, exact.

        p = (rank_g - 1) / (n_g - 1)          (0.5 for singleton groups)
        qnorm = corpus value at position p * (N - 1), linearly
                interpolated between the bracketing ranks

    Returns ``[group, id, value, qnorm]`` for every non-NULL/NaN value
    with a non-NULL group key.

    Cross-engine determinism: within-group ranks use the total order
    (value, id); corpus rank ties need no tiebreaker (the value AT a
    rank is the sorted multiset's, unique — the ranked_percentiles
    argument); p, pos, frac, and the interpolation are fixed-order
    single IEEE ops; the result rounds (+0.0 collapses negative zero).

    Scale shape: the within-group rank is the hot-group-safe
    grouped_row_number; the corpus rank is with_global_row_number (ONE
    range shuffle, no single-task sort — the global_rank module's whole
    point); the bracket lookup is two integer-keyed hash joins of the
    data against the ranked corpus. Nothing buffers a column; a 10^11
    row corpus normalizes with the same plan shape as 10^5.
    """
    from meshinsights_data_pipeline_spark.operators.global_rank import (
        grouped_row_number,
        with_global_row_number,
    )

    v = F.col(value_col).cast("double")
    clean = df.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("_id"),
        v.alias("_v"),
    ).filter(F.col("g").isNotNull() & F.col("_v").isNotNull() & ~F.isnan("_v"))
    ranked_g = grouped_row_number(
        clean, ["g"], [F.col("_v").asc(), F.col("_id").asc()], out_col="_r"
    )
    sizes = ranked_g.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n_g")
    )
    corpus = with_global_row_number(
        clean.select("_v"), ["_v"], out_col="_rn", total_col="_n"
    ).select(F.col("_v").alias("_cv"), "_rn", "_n")
    n_tot = corpus.groupBy().agg(F.max("_n").alias("_n"))
    p = F.when(
        F.col("_n_g") > 1,
        (F.col("_r") - 1).cast("double") / (F.col("_n_g") - 1).cast("double"),
    ).otherwise(F.lit(0.5))
    pos = p * (F.col("_n") - 1).cast("double")
    scored = (
        ranked_g.join(F.broadcast(sizes), "g")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "g",
            "_id",
            "_v",
            (F.floor(pos) + 1).cast("bigint").alias("_lo_rn"),
            (F.ceil(pos) + 1).cast("bigint").alias("_hi_rn"),
            (pos - F.floor(pos)).alias("_frac"),
        )
    )
    lo = corpus.select(F.col("_rn").alias("_lo_rn"), F.col("_cv").alias("_lo"))
    hi = corpus.select(F.col("_rn").alias("_hi_rn"), F.col("_cv").alias("_hi"))
    qnorm = F.col("_lo") + (F.col("_hi") - F.col("_lo")) * F.col("_frac")
    return (
        scored.join(lo, "_lo_rn")
        .join(hi, "_hi_rn")
        .select(
            F.col("g").alias(group_col),
            F.col("_id").alias(id_col),
            F.col("_v").alias(value_col),
            (F.round(qnorm, round_to) + F.lit(0.0)).alias("qnorm"),
        )
    )


def spearman_correlation(
    df: DataFrame,
    group_by: Sequence[str],
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group Spearman rank correlation between two numeric columns —
    the robust association readout next to the rank-test family
    (mann_whitney/kruskal compare GROUPS of one metric; this scores the
    monotone relationship BETWEEN two metrics, immune to outliers and
    monotone transforms that break Pearson: does quality score track
    length, does latency track payload size, per source/segment):

        rho = Pearson(rank(x), rank(y))     (average ranks on ties)

    computed in closed form from the rank sums. Returns one row per
    group: ``[*group_by, n, rho]`` with ``rho`` NULL when either
    column is constant within the group (no ranking information) or
    n < 2. Rows with a NULL group key, or NULL/NaN in EITHER column,
    are excluded up front (a half-present row has no rank pair).

    Cross-engine determinism: per-column average ranks come from the
    mann_whitney count-table algebra — (group, value) counts, one
    window over the value spine, DOUBLED average ranks (2*cum + t + 1)
    as exact DECIMAL(38,0) integers — so every sum in the closed form
    (n*Sxy - Sx*Sy, n*Sxx - Sx^2, n*Syy - Sy^2, over doubled ranks)
    is an exact integer: the doubling cancels between numerator and
    denominator, and the ONLY float steps are one multiply, one sqrt,
    one division at the very end, in fixed order, rounded once. Exact
    integer range holds to n ~ 1e9 per group against DECIMAL(38,0)'s
    ceiling (the n^4 product bound); pre-aggregate or sample beyond.

    Scale shape: ONE (group, x, y) count aggregate (map-side
    combinable, distinct-PAIR cardinality) is the only corpus-sized
    stage; it is MATERIALIZED (the diamond-barrier lesson — it feeds
    both rank tables AND the weighted probe, and without the barrier
    each consumer replays the corpus scan, the welch/chi2 shape).
    Per-column rank tables are count roll-ups of the cell frame with
    per-group spine windows; the closed-form sums are COUNT-WEIGHTED
    over the cells (sum c*rx, sum c*rx^2, ... — identical exact
    integers to the per-row sums), so nothing after the first
    aggregate exceeds distinct-pair cardinality.
    """
    groups = list(group_by)
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    keep = (
        x.isNotNull() & ~F.isnan(x) & y.isNotNull() & ~F.isnan(y)
    )
    for g in groups:
        keep = keep & F.col(g).isNotNull()
    cells = _materialize(
        df.filter(keep)
        .groupBy(*groups, x.alias("_x"), y.alias("_y"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    )
    dec0 = "decimal(38,0)"

    def _rank_table(col: str, out: str) -> DataFrame:
        counts = cells.groupBy(*groups, col).agg(
            F.sum("_c").cast("bigint").alias("_t")
        )
        w = (
            Window.partitionBy(*groups)
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cum = F.coalesce(F.sum("_t").over(w), F.lit(0))
        return counts.select(
            *groups,
            col,
            (F.lit(2) * cum + F.col("_t") + 1).cast(dec0).alias(out),
        )

    joined = cells.join(_rank_table("_x", "_rx"), [*groups, "_x"]).join(
        _rank_table("_y", "_ry"), [*groups, "_y"]
    )
    c0 = F.col("_c").cast(dec0)
    agg = joined.groupBy(*groups).agg(
        F.sum("_c").cast("bigint").alias("n"),
        F.sum(c0 * F.col("_rx")).cast(dec0).alias("_sx"),
        F.sum(c0 * F.col("_ry")).cast(dec0).alias("_sy"),
        F.sum(c0 * F.col("_rx") * F.col("_rx")).cast(dec0).alias("_sxx"),
        F.sum(c0 * F.col("_ry") * F.col("_ry")).cast(dec0).alias("_syy"),
        F.sum(c0 * F.col("_rx") * F.col("_ry")).cast(dec0).alias("_sxy"),
    )
    n0 = F.col("n").cast(dec0)
    num = (n0 * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("double")
    d1 = (n0 * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("double")
    d2 = (n0 * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast("double")
    rho = F.when(
        (F.col("n") >= 2) & (d1 > 0) & (d2 > 0),
        F.round(num / F.sqrt(d1 * d2), round_to) + F.lit(0.0),
    )
    return agg.select(*groups, "n", rho.alias("rho"))


def correlation_ratio(
    df: DataFrame,
    group_by: Sequence[str],
    category_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group correlation ratio eta^2 between a CATEGORICAL column
    and a NUMERIC one — the third leg of the association triad
    (chi2_independence scores cat-cat, spearman_correlation num-num;
    eta^2 = SS_between / SS_total scores how much of a metric's
    variance the category explains). With category = hour-of-day or
    day-of-week it IS the seasonality-strength score (eta^2 near 1:
    the series is its schedule; near 0: no calendar structure) — the
    triage signal beside the ACF's lag view.

    Returns one row per group: ``[*group_by, n, k_levels, eta2]`` with
    ``eta2`` NULL when the metric is constant within the group
    (SS_total = 0 — no variance to explain) or n < 2. Rows with a NULL
    group key, NULL category, or NULL/NaN value are excluded up front
    (route NULL categories to a sentinel level upstream to score
    missingness itself).

    Cross-engine determinism: one PIVOT per group (the zscore
    discipline — d = v - group-min keeps magnitudes at the group's
    range); per-(group, category) moments fold d and d^2 through
    DECIMAL(38,12) (exact, order-independent); the pivot cancels
    algebraically out of both sums of squares, so
    SS_between = sum_c s_c^2/n_c - S^2/n and SS_total = SQ - S^2/n
    need only the per-category s_c^2/n_c terms (two IEEE ops each,
    folded DECIMAL(38,6) — the kruskal_wallis fold, its 1e-6 quantum
    absorbed by the final round) plus fixed-order IEEE ops on the
    exact decimal totals, mirrored in the oracle; one final round.

    Scale shape: one broadcast of the |groups|-row pivot table, ONE
    (group, category) moment aggregate (map-side combinable) as the
    only corpus-sized stage, one |groups x categories|-row final
    aggregate. The corpus is scanned twice (pivot + moments), shuffled
    never.
    """
    groups = list(group_by)
    v = F.col(value_col).cast("double")
    keep = (
        F.col(category_col).isNotNull() & v.isNotNull() & ~F.isnan(v)
    )
    for g in groups:
        keep = keep & F.col(g).isNotNull()
    clean = df.filter(keep).select(
        *groups, F.col(category_col).alias("_cat"), v.alias("_v")
    )
    dec12, dec6 = "decimal(38,12)", "decimal(38,6)"
    pivots = clean.groupBy(*groups).agg(F.min("_v").alias("_p"))
    d = F.col("_v") - F.col("_p")
    cat_moments = (
        clean.join(F.broadcast(pivots), groups)
        .groupBy(*groups, "_cat")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_n_c"),
            F.sum(d.cast(dec12)).cast(dec12).alias("_s_c"),
            F.sum((d * d).cast(dec12)).cast(dec12).alias("_sq_c"),
        )
    )
    s_cd = F.col("_s_c").cast("double")
    term = (s_cd * s_cd / F.col("_n_c")).cast(dec6)
    agg = cat_moments.groupBy(*groups).agg(
        F.sum("_n_c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k_levels"),
        F.sum("_s_c").cast("double").alias("_s"),
        F.sum("_sq_c").cast("double").alias("_sq"),
        F.sum(term).cast("double").alias("_t1"),
    )
    corr = F.col("_s") * F.col("_s") / F.col("n")
    sst = F.col("_sq") - corr
    ssb = F.col("_t1") - corr
    eta2 = F.when(
        (F.col("n") >= 2) & (sst > 0),
        F.round(ssb / sst, round_to) + F.lit(0.0),
    )
    return agg.select(*groups, "n", "k_levels", eta2.alias("eta2"))
