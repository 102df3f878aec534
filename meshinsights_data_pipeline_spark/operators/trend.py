"""Monotonic-trend detection per entity: Mann-Kendall test + Theil-Sen slope.

The standard nonparametric pair for "is this series drifting, and how
fast": the Mann-Kendall S statistic with the two-way tie-corrected
normal approximation, and the Theil-Sen estimator (median of pairwise
slopes — robust to 29% outliers, unlike OLS). Complements the
distribution-level monitors (stats.psi_drift, stats.ks_drift, streaming
CUSUM): those say "the population moved"; this says "this entity's own
series trends, at this rate". Reference scope: the per-stage weekly
trend summaries in Requirements/ExampleAiCode.md:229-241 motivate
per-entity trend scoring.

Tie treatment (the textbook Kendall 1975 / Gilbert 1987 form):
- pairs sharing a TIMESTAMP get zero weight — they carry no temporal
  order, and any id-based tiebreak would make S's sign depend on an
  arbitrary labeling (same data, relabeled ids, opposite "trend");
- var(S) corrects for ties in BOTH rankings:

    var = [n(n-1)(2n+5) - SUM_t t(t-1)(2t+5) - SUM_u u(u-1)(2u+5)] / 18
        + [SUM_t t(t-1)(t-2) * SUM_u u(u-1)(u-2)] / (9 n(n-1)(n-2))
        + [SUM_t t(t-1) * SUM_u u(u-1)] / (2 n(n-1))

  with t the value-tie group sizes and u the time-tie group sizes
  (the cross terms are 0 when either ranking is tie-free).

Cross-engine determinism (the x33/x69 discipline):
- S and every tie sum are exact integers (sign comparisons and counts,
  DECIMAL(38,0)-routed products — n^3 in raw BIGINT wraps past ~2M
  rows per entity).
- Each variance term is exact-integer operands through SINGLE
  correctly-rounded IEEE conversions and divisions in fixed operand
  order; the three terms add in fixed order.
- z = (S -/+ 1) / sqrt(var): continuity-corrected; sqrt and divide are
  single correctly-rounded ops, so z is bit-identical across engines.
- Theil-Sen: slope = dv / ds with dv exact (double subtraction of the
  raw values — one rounded op), ds = CAST(timestampdiff(MICROSECOND)
  AS DOUBLE) / 1e6 (exact integer micros, one rounded division — the
  NTZ-safe funnel.py discipline); the median is the exact
  interpolated percentile (matches DuckDB quantile_cont — the A2
  precedent). Time-tied pairs have no slope either (ds = 0).

Scale shape: ONE entity-keyed shuffle feeds a within-entity pair join —
cost sum over entities of n_e^2, never corpus^2 (the x97 blocking
argument). The bounded-series precondition is a PARAMETER, not prose:
``cap_n=N`` applies the recent_n cap inside the operator (N most-recent
clean rows per entity, deterministic tiebreak), bounding the join at
sum min(n_e, N)^2 — the trend is then exactly the trend of the capped
series. For million-row series where the full history matters, use the
O(n log n) rank formulation or pre-aggregate to a coarser grain first.
The tie aggregates and the size aggregate reuse the same entity-keyed
partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.barrier import (
    materialize as _materialize,
)


def mann_kendall_trend(
    df: DataFrame,
    ts_col: str,
    group_by: Sequence[str],
    value_col: str,
    round_to: int = 6,
    cap_n: int | None = None,
) -> DataFrame:
    """Per-group Mann-Kendall trend test + Theil-Sen slope.

    Returns ``[*group_by, n, s, var_s, z, sen_slope]`` for every group
    with at least 2 observations: ``s`` the exact pair-sign sum over
    STRICTLY time-ordered pairs (time-tied pairs weigh 0), ``var_s``
    the two-way tie-corrected variance, ``z`` the continuity-corrected
    normal statistic (NULL when var_s <= 0 — e.g. all values or all
    timestamps tied), ``sen_slope`` the median pairwise slope in
    value-units per second (NULL when every pair shares a timestamp).
    Rows with NULL timestamps or NULL/NaN values are excluded entirely
    (a NULL ts can join no pair but would otherwise still inflate n and
    the variance, biasing z toward 0).

    ``cap_n`` is the operator's own 100 TB answer (the x90
    ``max_doc_freq`` precedent — a scale precondition should be a
    parameter, not prose): the within-entity pair join costs sum of
    n_e^2, so an UNBOUNDED per-entity history is a quadratic blowup.
    ``cap_n=N`` keeps each group's N most-recent CLEAN observations
    (``recent_n`` over the filtered frame, so NULL/NaN rows never
    consume cap slots; ties in ts break on value desc — rows identical
    in (ts, value) are exchangeable for every statistic, so the kept
    multiset is deterministic) and the trend is then EXACTLY the trend
    of that capped series (property-tested). The cap reuses the same
    entity-keyed shuffle the pair join needs anyway.
    """
    groups = list(group_by)
    v = F.col(value_col).cast("double")
    clean = df.filter(
        F.col(ts_col).isNotNull() & v.isNotNull() & ~F.isnan(v)
    ).select(
        *groups,
        F.col(ts_col).alias("_ts"),
        v.alias("_v"),
    )
    if cap_n is not None:
        if cap_n < 2:
            raise ValueError(f"cap_n must be >= 2, got {cap_n}")
        from meshinsights_data_pipeline_spark.operators.recent_n import (
            recent_n,
        )

        clean = recent_n(clean, cap_n, groups, "_ts", tiebreak=["_v"])
    a, b = clean.alias("a"), clean.alias("b")
    dv = F.col("b._v") - F.col("a._v")
    # exact microsecond diff, NTZ-safe (the funnel.py discipline:
    # unix_micros rejects TIMESTAMP_NTZ; unix_timestamp floors to seconds)
    ds = (
        F.expr("timestampdiff(MICROSECOND, a._ts, b._ts)").cast("double")
        / F.lit(1000000.0)
    )
    # strictly time-ordered pairs only: a time-tied pair has no temporal
    # order, so it contributes to neither S nor the slope (id tiebreaks
    # would make S's SIGN depend on arbitrary labeling)
    pairs = a.join(
        b,
        [F.col(f"a.{g}") == F.col(f"b.{g}") for g in groups]
        + [F.col("a._ts") < F.col("b._ts")],
    ).select(
        *[F.col(f"a.{g}").alias(g) for g in groups],
        F.signum(dv).cast("bigint").alias("_sgn"),
        (dv / ds).alias("_slope"),
    )
    stats = pairs.groupBy(*groups).agg(
        F.sum("_sgn").cast("bigint").alias("s"),
        F.percentile("_slope", F.lit(0.5)).alias("_sen"),
    )
    dec = "decimal(38,0)"

    def _tie_sums(col: str, prefix: str) -> DataFrame:
        t = F.col("_t").cast(dec)
        return (
            clean.groupBy(*groups, col)
            .agg(F.count(F.lit(1)).alias("_t"))
            .groupBy(*groups)
            .agg(
                F.sum(t * (t - 1) * (2 * t + 5)).alias(f"{prefix}5"),
                F.sum(t * (t - 1) * (t - 2)).alias(f"{prefix}2"),
                F.sum(t * (t - 1)).alias(f"{prefix}1"),
            )
        )

    vties = _tie_sums("_v", "_tv")
    uties = _tie_sums("_ts", "_tu")
    n = F.col("n").cast(dec)
    term1 = (
        n * (n - 1) * (2 * n + 5) - F.col("_tv5") - F.col("_tu5")
    ).cast("double") / F.lit(18.0)
    term2 = F.when(
        F.col("n") >= 3,
        F.col("_tv2").cast("double")
        * F.col("_tu2").cast("double")
        / (F.lit(9.0) * (n * (n - 1) * (n - 2)).cast("double")),
    ).otherwise(F.lit(0.0))
    term3 = (
        F.col("_tv1").cast("double")
        * F.col("_tu1").cast("double")
        / (F.lit(2.0) * (n * (n - 1)).cast("double"))
    )
    var_s = term1 + term2 + term3
    sizes = clean.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    sd = F.sqrt(F.col("var_s"))
    z = (
        F.when(F.col("var_s") <= 0, F.lit(None).cast("double"))
        .when(F.col("s") > 0, (F.col("s") - 1).cast("double") / sd)
        .when(F.col("s") < 0, (F.col("s") + 1).cast("double") / sd)
        .otherwise(F.lit(0.0))
    )
    return (
        sizes.filter(F.col("n") >= 2)
        .join(stats, groups, "left")
        .join(vties, groups)
        .join(uties, groups)
        .withColumn("var_s", F.round(var_s, round_to) + F.lit(0.0))
        .select(
            *groups,
            "n",
            F.coalesce(F.col("s"), F.lit(0)).cast("bigint").alias("s"),
            "var_s",
            # + 0.0 collapses IEEE negative zero (round(-1e-9, 6) -> -0.0,
            # which the two engines RENDER differently) to +0.0; a no-op
            # for every other value, NULL-preserving. Mirrored in X108_SQL.
            (F.round(z, round_to) + F.lit(0.0)).alias("z"),
            (F.round(F.col("_sen"), round_to) + F.lit(0.0)).alias(
                "sen_slope"
            ),
        )
    )


def autocorrelation(
    df: DataFrame,
    ts_col: str,
    group_by: Sequence[str],
    value_col: str,
    id_col: str,
    lags: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Per-group sample autocorrelation at lags 1..``lags`` over the
    (ts, id) total order — the periodicity/momentum detector completing
    the per-entity family (CUSUM finds level SHIFTS, Mann-Kendall finds
    monotone DRIFT; the ACF finds self-similarity: a daily-cycling
    sensor shows a positive lag at its period, white telemetry decays
    to ~0, a stuck value pins near 1):

        acf_k = sum_t (d_t * d_{t-k}) / sum_t d_t^2,   d = v - mean_g

    (the standard n-normalized sample ACF — both sums over the same
    group, so the n vs n-k normalization convention cancels out of
    nothing and this matches numpy/statsmodels' default). Returns one
    row per (group, lag): ``[*group_by, lag, n, acf]`` with ``acf``
    NULL when the group is constant (zero variance — no correlation is
    defined) or too short (n <= lag: no pairs). Rows with NULL
    timestamps or NULL/NaN values are excluded entirely (the
    mann_kendall domain guard). ``id_col`` breaks timestamp ties so the
    lag pairing is a total order — without it, tied rows would make
    acf partition-order-dependent (the CUSUM discipline).

    Cross-engine determinism: the group mean comes from the zscore
    PIVOT discipline (d-sums folded through DECIMAL(38,12), mean =
    pivot + s/n — single IEEE ops); each centered product is two IEEE
    subtractions and one multiplication in fixed order, folded through
    DECIMAL(38,12) so the numerator/denominator sums are
    order-independent; the final ratio is one IEEE division, rounded.

    Scale shape: ONE entity-keyed shuffle (the window sort) carries all
    ``lags`` LAG terms in a single window spec; the mean table is a
    tiny broadcast (|groups| rows); numerators for every lag fold in
    the SAME aggregate pass. Nothing after the first aggregate is
    corpus-sized; cost is O(lags) per row, all in whole-stage codegen.
    The cleaned 4-column projection is MATERIALIZED (the diamond-
    barrier lesson): it feeds the pivot aggregate, the moment
    aggregate, AND the centered frame — without the barrier each
    consumer replays the corpus scan (three scans per call). The
    persisted frame is a narrow projection of the filtered input and
    spills to disk past memory; unpersist it downstream if composing
    many calls in one session.
    """
    if lags < 1:
        raise ValueError(f"lags must be >= 1, got {lags}")
    groups = list(group_by)
    v = F.col(value_col).cast("double")
    clean = _materialize(
        df.filter(
            F.col(ts_col).isNotNull() & v.isNotNull() & ~F.isnan(v)
        ).select(
            *groups,
            F.col(ts_col).alias("_ts"),
            F.col(id_col).alias("_id"),
            v.alias("_v"),
        )
    )
    dec = "decimal(38,12)"
    pivots = clean.groupBy(*groups).agg(F.min("_v").alias("_p"))
    dpv = F.col("_v") - F.col("_p")
    moments = (
        clean.join(F.broadcast(pivots), groups)
        .groupBy(*groups)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.min("_p").alias("_p"),
            F.sum(dpv.cast(dec)).cast("double").alias("_s"),
        )
    )
    means = moments.select(
        *groups,
        "_n",
        (F.col("_p") + F.col("_s") / F.col("_n")).alias("_mean"),
    )
    w = Window.partitionBy(*groups).orderBy("_ts", "_id")
    d = F.col("_v") - F.col("_mean")
    centered = clean.join(F.broadcast(means), groups).select(
        *groups, "_n", "_ts", "_id", d.alias("_d")
    )
    aggs = [
        F.max("_n").cast("bigint").alias("n"),
        F.sum((F.col("_d") * F.col("_d")).cast(dec))
        .cast("double")
        .alias("_den"),
    ]
    lagged = centered.select(
        *groups,
        "_n",
        "_d",
        *[F.lag("_d", k).over(w).alias(f"_d{k}") for k in range(1, lags + 1)],
    )
    for k in range(1, lags + 1):
        aggs.append(
            F.sum((F.col("_d") * F.col(f"_d{k}")).cast(dec))
            .cast("double")
            .alias(f"_num{k}")
        )
    stats = lagged.groupBy(*groups).agg(*aggs)
    out = F.array(
        *[
            F.struct(
                F.lit(k).alias("lag"),
                F.when(
                    (F.col("_den") > 0) & (F.col("n") > k),
                    F.round(F.col(f"_num{k}") / F.col("_den"), round_to)
                    + F.lit(0.0),
                ).alias("acf"),
            )
            for k in range(1, lags + 1)
        ]
    )
    return stats.select(
        *groups, "n", F.explode(out).alias("_r")
    ).select(*groups, F.col("_r.lag").alias("lag"), "n", "_r.acf")


def seasonal_decompose(
    df: DataFrame,
    group_by: list[str],
    ts_col: str,
    value_col: str,
    period: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Classical additive seasonal decomposition per group over a
    REGULAR series (one row per (group, ts) tick):
    ``[*group_by, <ts_col>, <value_col>, trend, seasonal, resid]``.

    The decomposition the x104 CUSUM / x108 Mann-Kendall layer sits on
    top of: trend = centered ``period``-point moving average (defined
    only where the full window exists — edge rows carry NULL trend and
    NULL seasonal/resid, the textbook convention); seasonal = per-phase
    mean of the detrended series, centered so the seasonal components
    sum to ~0 over one period; resid = detrended - seasonal. Phase is
    the row's position in the group's ts order modulo ``period`` — a
    DENSE total order is the caller's contract (gap-fill first:
    x35/x82).

    ``period`` must be ODD here (the even case needs the asymmetric
    2xMA; callers with even seasonality should resample or use
    period+1) — this keeps the trend a single exact window fold.

    Cross-engine determinism: values quantize to DECIMAL(38,12) and the
    trend/seasonal numerators fold in DECIMAL (order-independent exact
    sums); each stage divides ONCE as the final IEEE op and re-
    quantizes before the next fold (the CUSUM/autocorrelation
    discipline), so both engines see identical operands everywhere.

    Scale shape: ONE entity-keyed shuffle carries the ROWS window, the
    phase means are a |groups| x period aggregate broadcast back, and
    nothing after the first window is corpus-sized.
    """
    if period < 3 or period % 2 == 0:
        raise ValueError(f"period must be odd and >= 3, got {period}")
    groups = list(group_by)
    half = (period - 1) // 2
    dec12 = "decimal(38,12)"
    keep = F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    for g in groups:
        keep = keep & F.col(g).isNotNull()
    base = df.filter(keep).select(
        *groups,
        F.col(ts_col),
        F.col(value_col).cast("double").alias("_v"),
        F.col(value_col).cast("double").cast(dec12).alias("_vd"),
    )
    order = Window.partitionBy(*groups).orderBy(ts_col)
    win = order.rowsBetween(-half, half)
    with_trend = base.select(
        *groups,
        ts_col,
        "_v",
        "_vd",
        ((F.row_number().over(order) - F.lit(1)) % F.lit(period)).alias(
            "_phase"
        ),
        F.when(
            F.count(F.lit(1)).over(win) == F.lit(period),
            F.sum("_vd").over(win).cast("double") / F.lit(float(period)),
        ).alias("_trend"),
    )
    from meshinsights_data_pipeline_spark.operators.barrier import (
        materialize as _materialize,
    )

    # the detrended series feeds BOTH the phase-mean aggregate and the
    # final join; it is |groups| x ticks (small relative to whatever
    # corpus aggregate produced the series) — materialize so the
    # upstream scan+window runs once (the diamond-barrier lesson)
    detr = _materialize(
        with_trend.withColumn(
            "_det", F.col("_v") - F.col("_trend")
        ).withColumn("_detd", F.col("_det").cast(dec12))
    )
    phase_means = detr.filter(F.col("_det").isNotNull()).groupBy(
        *groups, "_phase"
    ).agg(
        (F.sum("_detd").cast("double") / F.count(F.lit(1))).alias("_pm")
    )
    centered = phase_means.withColumn(
        "_season",
        F.col("_pm")
        - F.sum(F.col("_pm").cast(dec12))
        .over(Window.partitionBy(*groups))
        .cast("double")
        / F.count(F.lit(1)).over(Window.partitionBy(*groups)),
    ).select(*groups, "_phase", "_season")
    out = detr.join(F.broadcast(centered), [*groups, "_phase"], "left")
    rnd = lambda c: F.round(c, round_to) + F.lit(0.0)  # noqa: E731
    return out.select(
        *groups,
        ts_col,
        F.col("_v").alias(value_col),
        rnd(F.col("_trend")).alias("trend"),
        rnd(
            F.when(F.col("_trend").isNotNull(), F.col("_season"))
        ).alias("seasonal"),
        rnd(
            F.when(
                F.col("_trend").isNotNull(),
                F.col("_det") - F.col("_season"),
            )
        ).alias("resid"),
    )


def seasonal_anomalies(
    df: DataFrame,
    group_by: list[str],
    ts_col: str,
    value_col: str,
    period: int = 7,
    threshold: float = 3.0,
    round_to: int = 6,
) -> DataFrame:
    """Seasonal-adjusted robust anomaly flags — the composition the
    decomposition exists for: :func:`seasonal_decompose` first, then
    MAD-score the RESIDUAL (the x92 robust discipline), so a spike is
    judged against what the schedule predicts, not against the raw
    level (a Monday peak is normal on Mondays; the same value on a
    Sunday flags).

    Returns ``[*group_by, <ts_col>, <value_col>, trend, seasonal,
    resid, med_resid, mad_resid, score, is_anomaly]`` for every row
    with a defined residual in groups whose residual MAD > 0 (constant
    residuals are excluded by the ROUNDED mad, the x92 rule; edge rows
    with NULL trend never reach scoring).

    Cross-engine determinism: the residual is the decomposition's
    already-rounded output, both medians are exact interpolated
    percentiles (the q09/q13 parity surface), and the flag compares
    the ROUNDED score so borderline rows decide identically.

    Scale shape: the decomposition's single entity shuffle dominates;
    the MAD layer is two aggregates over the (already materialized)
    decomposed series with tiny broadcast joins back.
    """
    groups = list(group_by)
    dec = seasonal_decompose(
        df, groups, ts_col, value_col, period=period, round_to=round_to
    ).filter(F.col("resid").isNotNull())
    med = dec.groupBy(*groups).agg(F.median("resid").alias("_med_r"))
    mad = (
        dec.join(F.broadcast(med), groups)
        .groupBy(*groups)
        .agg(
            F.min("_med_r").alias("_med_r"),
            F.round(
                F.median(F.abs(F.col("resid") - F.col("_med_r"))),
                round_to,
            ).alias("mad_resid"),
        )
        .filter(F.col("mad_resid") > 0)
    )
    score = F.round(
        F.abs(F.col("resid") - F.col("_med_r")) / F.col("mad_resid"),
        round_to,
    )
    return dec.join(F.broadcast(mad), groups).select(
        *groups,
        ts_col,
        value_col,
        "trend",
        "seasonal",
        "resid",
        (F.round(F.col("_med_r"), round_to) + F.lit(0.0)).alias(
            "med_resid"
        ),
        "mad_resid",
        (score + F.lit(0.0)).alias("score"),
        (score > F.lit(float(threshold))).alias("is_anomaly"),
    )


def ols_fit(
    df: DataFrame,
    group_by: Sequence[str],
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group simple linear regression y = intercept + slope * x,
    with R^2: ``[*group_by, n, slope, intercept, r2]`` — the PARAMETRIC
    companion of :func:`mann_kendall_trend`'s Theil-Sen slope (that one
    is robust and O(n^2)-pairs; this is the closed-form O(n) fit with
    the variance-explained readout, the one to run when the series is
    well-behaved and n is large).

    Degenerate groups: n < 2 or constant x yield NULL slope /
    intercept / r2; constant y (with varying x) fits slope 0 exactly
    and r2 is NULL (variance explained is undefined, not 1 — there is
    no variance). NULL/NaN coordinates and NULL group keys are
    excluded up front.

    Cross-engine determinism: per-group moments use the Welch PIVOT
    discipline — dx = x - min(x), dy = y - min(y) so magnitudes are
    the group's RANGE; dx/dy fold DECIMAL(38,12), the products
    dx*dy / dx^2 / dy^2 quantize to DECIMAL(38,6) after ONE IEEE
    multiply (the x121 magnitude rule) and sum exactly. slope /
    intercept / r2 are then single correctly-rounded IEEE ops in a
    FIXED operand order, rounded once.

    Scale shape: one tiny per-group min aggregate broadcast back + ONE
    map-side-combinable moment aggregate over the corpus scan; the
    moment table is a mergeable sufficient statistic (decimal/integer
    sums — a streaming twin folds micro-batches into the same state).
    """
    groups = list(group_by)
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    keep = x.isNotNull() & ~F.isnan(x) & y.isNotNull() & ~F.isnan(y)
    for g in groups:
        keep = keep & F.col(g).isNotNull()
    base = df.filter(keep).select(*groups, x.alias("_x"), y.alias("_y"))
    pivots = base.groupBy(*groups).agg(
        F.min("_x").alias("_px"), F.min("_y").alias("_py")
    )
    dx = F.col("_x") - F.col("_px")
    dy = F.col("_y") - F.col("_py")
    d12 = "decimal(38,12)"
    d6 = "decimal(38,6)"
    m = (
        base.join(F.broadcast(pivots), groups)
        .groupBy(*groups)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("_px").alias("_px"),
            F.min("_py").alias("_py"),
            F.sum(dx.cast(d12)).cast("double").alias("_sx"),
            F.sum(dy.cast(d12)).cast("double").alias("_sy"),
            F.sum((dx * dy).cast(d6)).cast("double").alias("_sxy"),
            F.sum((dx * dx).cast(d6)).cast("double").alias("_sxx"),
            F.sum((dy * dy).cast(d6)).cast("double").alias("_syy"),
        )
    )
    nD = F.col("n").cast("double")
    cov_n = F.col("_sxy") - F.col("_sx") * F.col("_sy") / nD
    varx_n = F.col("_sxx") - F.col("_sx") * F.col("_sx") / nD
    vary_n = F.col("_syy") - F.col("_sy") * F.col("_sy") / nD
    slope = F.when((F.col("n") >= 2) & (varx_n > 0), cov_n / varx_n)
    intercept = F.when(
        slope.isNotNull(),
        (F.col("_py") + F.col("_sy") / nD)
        - slope * (F.col("_px") + F.col("_sx") / nD),
    )
    r2 = F.when(
        slope.isNotNull() & (vary_n > 0),
        (cov_n * cov_n) / (varx_n * vary_n),
    )
    rnd = lambda c: F.round(c, round_to) + F.lit(0.0)  # noqa: E731
    return m.select(
        *groups,
        "n",
        rnd(slope).alias("slope"),
        rnd(intercept).alias("intercept"),
        rnd(r2).alias("r2"),
    )
