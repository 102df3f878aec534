"""A/B tests — experiment-arm comparison vs the control arm.

The experimentation primitives next to the attribution family (x86/x99/
x100 assign credit; these decide whether an arm DIFFERS from control):
:func:`ab_test_zscores` for conversion RATES (pooled two-proportion z)
and :func:`welch_ttest` for continuous METRICS (revenue per user, dwell
time, latency — Welch's unequal-variance two-sample t, the form that
stays valid when arms have different spreads/sizes). Together the
standard first-pass readout of every A/B platform.

Cross-engine determinism: counts are exact integers and the continuous
moments fold through DECIMAL with the zscore pivot discipline; every
float step is an IEEE correctly-rounded operation applied in a FIXED
operand order, so Spark and any IEEE-754 engine produce bit-identical
doubles; z/t round to 6dp and significance compares the ROUNDED
statistic so borderline arms decide identically. p-values are
deliberately out of scope — erf/Student-CDF implementations differ
across engines' libm in last ulps; the caller thresholds on z/t
(1.959964 ~ two-sided 5% as df -> inf; pick the Student critical value
for the reported Welch df when arms are small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.barrier import (
    materialize as _materialize,
)


def ab_test_zscores(
    df: DataFrame,
    experiment_col: str,
    arm_col: str,
    converted_col: str,
    control_label: str,
    z_crit: float = 1.959964,
) -> DataFrame:
    """Per (experiment, arm != control): pooled two-proportion z vs the
    experiment's control arm.

    ``converted_col`` is a boolean (or 0/1-coercible) per unit row —
    pre-aggregate to one row per randomization unit upstream if units
    can emit multiple rows (double-counting units inflates n and fakes
    significance; the operator scores the rows it is given).

    Returns ``[experiment, arm, n_control, x_control, n_arm, x_arm,
    has_control, p_control, p_arm, lift, z, significant]`` (the
    experiment/arm columns keep the CALLER's names) where
    ``lift`` is the absolute rate difference (arm - control), ``z =
    lift / se`` with ``se = sqrt(pool * (1 - pool) * (1/n_c + 1/n_a))``
    over the pooled rate, both rounded to 6dp. Degenerate cells — an
    experiment whose control arm is ABSENT (a misconfigured feed) still
    emits its treatment rows, with ``has_control = false`` and NULL
    control/z columns, so the breakage SURFACES instead of the
    experiment silently vanishing (left join on the control row);
    se = 0 (pooled rate 0 or 1) yields NULL z and ``significant =
    false``, not a division blow-up; rows with a NULL experiment or
    NULL arm never pair (equality join semantics — NULL != NULL, the
    same rule as linkage blocking; a NULL-experiment treatment cell
    also reports ``has_control = false``).

    Scale shape: ONE map-side-combinable aggregate over the event scan
    builds the |experiments x arms| cell frame; the control cells join
    back broadcast (bounded by |experiments|). The cell frame is
    MATERIALIZED (the diamond-barrier lesson, operators/barrier.py):
    it feeds both join sides, and without the barrier Spark replays
    the corpus scan + aggregate once per side — the executed plan
    showed 4 scans/0 reuse. With it, the corpus is touched exactly
    once at any data size and everything after is tiny-frame algebra.
    """
    cells = _materialize(
        ab_cell_counts(df, experiment_col, arm_col, converted_col)
    )
    return ab_from_counts(
        cells, experiment_col, arm_col, control_label, z_crit=z_crit
    )


def ab_cell_counts(
    df: DataFrame,
    experiment_col: str,
    arm_col: str,
    converted_col: str,
) -> DataFrame:
    """The ``[experiment, arm, n, x]`` cell stage of
    :func:`ab_test_zscores`, shared with the streaming twin so the
    two can never drift (the ks/benford/km shared-stage discipline):
    the boolean coercion of the conversion flag lives here, in exactly
    one place. Counts are exact integers, so cells SUM across
    micro-batches — the mergeable sufficient statistic."""
    conv = F.col(converted_col).cast("boolean").cast("int")
    return df.groupBy(experiment_col, arm_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(conv).cast("bigint").alias("x"),
    )


def ab_from_counts(
    cells: DataFrame,
    experiment_col: str,
    arm_col: str,
    control_label: str,
    z_crit: float = 1.959964,
) -> DataFrame:
    """:func:`ab_test_zscores` from a pre-aggregated
    ``[experiment, arm, n, x]`` cell table — the mergeable-sufficient-
    statistic entry point the streaming twin folds into (cells sum
    across micro-batches, so the recomputed report has FULL
    cross-batch parity). The cell frame feeds BOTH sides of the
    control join: pass it materialized/checkpointed (as
    :func:`ab_test_zscores` and the twin both do) or Spark replays its
    lineage once per side."""
    ctrl = (
        cells.filter(F.col(arm_col) == control_label)
        .select(
            F.col(experiment_col),
            F.col("n").alias("n_control"),
            F.col("x").alias("x_control"),
        )
    )
    arms = cells.filter(F.col(arm_col) != control_label).select(
        F.col(experiment_col),
        F.col(arm_col).alias("_arm"),
        F.col("n").alias("n_arm"),
        F.col("x").alias("x_arm"),
    )
    j = arms.join(F.broadcast(ctrl), experiment_col, "left")
    n_c, x_c = F.col("n_control").cast("double"), F.col("x_control").cast("double")
    n_a, x_a = F.col("n_arm").cast("double"), F.col("x_arm").cast("double")
    p_c = x_c / n_c
    p_a = x_a / n_a
    pool = (x_c + x_a) / (n_c + n_a)
    se = F.sqrt(pool * (F.lit(1.0) - pool) * (F.lit(1.0) / n_c + F.lit(1.0) / n_a))
    lift = p_a - p_c
    z = F.round(lift / se, 6)
    z = F.when(se > 0, z)  # se = 0 -> NULL z, never a NaN/Inf
    return j.select(
        F.col(experiment_col),
        F.col("_arm").alias(arm_col),
        "n_control",
        "x_control",
        "n_arm",
        "x_arm",
        F.col("n_control").isNotNull().alias("has_control"),
        F.round(p_c, 6).alias("p_control"),
        F.round(p_a, 6).alias("p_arm"),
        F.round(lift, 6).alias("lift"),
        z.alias("z"),
        F.coalesce(F.abs(z) > F.lit(float(z_crit)), F.lit(False)).alias(
            "significant"
        ),
    )


def sprt_constants(
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.2,
) -> dict[str, str]:
    """The four SPRT constants as 12-decimal string literals — computed
    ONCE here in python (ln never runs inside either engine, the
    BENFORD_EXPECTED/LN2_LITERAL discipline) and shared verbatim by the
    Spark plan, the DuckDB oracle, and the streaming twin:

        c1 = ln(p1/p0)              (per-success log-likelihood step)
        c0 = ln((1-p1)/(1-p0))      (per-failure step)
        upper = ln((1-beta)/alpha)  (accept H1 at llr >= upper)
        lower = ln(beta/(1-alpha))  (accept H0 at llr <= lower)
    """
    import math
    from decimal import ROUND_HALF_UP, Decimal

    if not (0.0 < p0 < 1.0 and 0.0 < p1 < 1.0):
        raise ValueError(f"p0/p1 must be in (0, 1), got {p0}, {p1}")
    if p0 == p1:
        raise ValueError("p0 and p1 must differ (nothing to test)")
    if not (0.0 < alpha < 1.0 and 0.0 < beta < 1.0):
        raise ValueError(
            f"alpha/beta must be in (0, 1), got {alpha}, {beta}"
        )
    q = Decimal("0.000000000001")

    def lit(x: float) -> str:
        return str(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))

    return {
        "c1": lit(math.log(p1 / p0)),
        "c0": lit(math.log((1.0 - p1) / (1.0 - p0))),
        "upper": lit(math.log((1.0 - beta) / alpha)),
        "lower": lit(math.log(beta / (1.0 - alpha))),
    }


def sprt_bernoulli(
    df: DataFrame,
    experiment_col: str,
    arm_col: str,
    converted_col: str,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.2,
    round_to: int = 6,
) -> DataFrame:
    """Per (experiment, arm): Wald's sequential probability ratio test
    of the arm's conversion rate — H0: p = p0 vs H1: p = p1 — the
    ANYTIME-VALID decision layer the streaming A/B twins point at
    (their documented peeking caveat: re-reading a fixed-sample z every
    epoch and stopping on the first significant one inflates the
    false-positive rate; the SPRT's thresholds are valid at EVERY
    sample size, so an epoch series of these decisions can gate a
    launch the moment a boundary is crossed, with error rates bounded
    by alpha/beta by construction — Wald 1945):

        llr = x*ln(p1/p0) + (n-x)*ln((1-p1)/(1-p0))
        accept_h1 at llr >= ln((1-beta)/alpha)
        accept_h0 at llr <= ln(beta/(1-alpha))
        else continue

    Returns ``[experiment, arm, n, x, llr, decision]`` (caller's column
    names; decision in {'accept_h1','accept_h0','continue'}). Works
    symmetrically for p1 < p0 (testing for a DROP).

    Cross-engine determinism — the family's strongest: the four ln
    constants are python-computed 12-decimal literals (ln never runs in
    either engine), x and n-x are exact integers, so the llr and BOTH
    boundary comparisons are pure exact-DECIMAL algebra — no IEEE
    operation exists anywhere in the statistic, and borderline
    decisions are bit-identical by construction. The quantized
    constants ARE the test's definition (a 1e-12 quantum on c1 shifts
    llr by <= 1e-12 * n — immaterial against unit-scale thresholds
    until n ~ 1e10; pre-aggregate upstream past that).

    Scale shape: the shared :func:`ab_cell_counts` stage (ONE map-side
    combinable aggregate) is the only corpus-sized stage; the test is
    |experiments x arms|-row literal algebra after. The (n, x) cells
    are the SAME mergeable state the A/B-z twin snapshots — one state
    serves the z readout and the sequential decision.
    """
    cells = ab_cell_counts(df, experiment_col, arm_col, converted_col)
    return sprt_from_counts(
        cells, experiment_col, arm_col, p0, p1,
        alpha=alpha, beta=beta, round_to=round_to,
    )


def sprt_from_counts(
    cells: DataFrame,
    experiment_col: str,
    arm_col: str,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.2,
    round_to: int = 6,
) -> DataFrame:
    """:func:`sprt_bernoulli` from a pre-aggregated ``[experiment, arm,
    n, x]`` cell table — the A/B-z twin's own state, so a streaming
    deployment gets the anytime-valid decision for free from the state
    it already keeps. No diamond: the cell frame is consumed once."""
    k = sprt_constants(p0, p1, alpha=alpha, beta=beta)
    dec = "decimal(14,12)"
    c1 = F.lit(k["c1"]).cast(dec)
    c0 = F.lit(k["c0"]).cast(dec)
    upper = F.lit(k["upper"]).cast(dec)
    lower = F.lit(k["lower"]).cast(dec)
    # NULL-keyed cells never reach a decision (ab_from_counts drops
    # them through its filters; this path has no filter, so be explicit)
    cells = cells.filter(
        F.col(experiment_col).isNotNull() & F.col(arm_col).isNotNull()
    )
    x = F.col("x").cast("bigint")
    miss = (F.col("n") - F.col("x")).cast("bigint")
    llr = x * c1 + miss * c0  # exact decimal: int * (14,12) literals
    decision = (
        F.when(llr >= upper, F.lit("accept_h1"))
        .when(llr <= lower, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
    )
    return cells.select(
        F.col(experiment_col),
        F.col(arm_col),
        "n",
        "x",
        (F.round(llr.cast("double"), round_to) + F.lit(0.0)).alias("llr"),
        decision.alias("decision"),
    )


def welch_ttest(
    df: DataFrame,
    experiment_col: str,
    arm_col: str,
    value_col: str,
    control_label: str,
    t_crit: float = 1.959964,
    round_to: int = 6,
) -> DataFrame:
    """Per (experiment, arm != control): Welch's unequal-variance
    two-sample t vs the experiment's control arm, over a CONTINUOUS
    per-unit metric — the companion of :func:`ab_test_zscores` for
    revenue-per-user / dwell / latency readouts, in the form that stays
    valid when arms have different variances and sizes (the pooled
    Student t silently assumes equal variances; Welch is the default
    every experimentation platform actually wants).

        t  = (mean_a - mean_c) / sqrt(s2_a/n_a + s2_c/n_c)
        df = (s2_a/n_a + s2_c/n_c)^2
             / [ (s2_a/n_a)^2/(n_a-1) + (s2_c/n_c)^2/(n_c-1) ]

    with s2 the SAMPLE variance. Returns ``[experiment, arm, n_control,
    n_arm, has_control, mean_control, mean_arm, diff, t, df,
    significant]`` (the experiment/arm columns keep the CALLER's
    names); ``significant`` compares the ROUNDED |t| against
    ``t_crit`` (1.959964 ~ two-sided 5% as df -> inf; pass the Student
    critical value for your df regime when arms are small — p-values
    stay out of scope, the libm-CDF rule in the module docstring).

    Degenerate cells: a missing control arm surfaces with
    ``has_control = false`` and NULL control/t columns (the
    ab_test_zscores left-join discipline — a misconfigured feed must be
    visible, not vanish); a cell with n < 2 has no sample variance and
    yields NULL t/df, significant = false; se = 0 (both arms constant)
    likewise. NULL experiment/arm keys and NULL/NaN values are excluded
    up front (the zscore domain guard — NaN would poison the decimal
    folds differently per engine).

    Cross-engine determinism: per-cell moments use the zscore PIVOT
    discipline — sums of d = v - min(cell) fold through DECIMAL(38,12)
    (exact, order-independent; with the cell's own min as pivot the
    magnitudes are the cell's RANGE, so sq/n - (s/n)^2 cannot
    catastrophically cancel on epoch-like values); mean/variance/se/t/df
    are then single correctly-rounded IEEE ops in a FIXED operand
    order, bit-identical across engines; t and df round once.

    Scale shape: one tiny (experiment, arm) min aggregate broadcast
    back, ONE map-side-combinable moment aggregate over the corpus
    scan, and the cell frame MATERIALIZED before feeding both sides of
    the control join (the diamond-barrier lesson — without it each side
    replays the scan). Everything after the moment table is
    |experiments x arms|-row algebra.
    """
    # the shared Welch-pivot cell-moment stage (also behind
    # diff_in_diff / mde_estimate — one definition, one discipline)
    cells = _materialize(
        _cell_moments(df, [experiment_col, arm_col], value_col)
    )

    def _stats(frame: DataFrame, suffix: str) -> DataFrame:
        m = F.col("s") / F.col("n")
        mean = F.col("p") + m
        var_s = F.when(
            F.col("n") >= 2,
            (F.col("sq") / F.col("n") - m * m)
            * (F.col("n").cast("double") / (F.col("n") - 1)),
        )
        return frame.select(
            F.col(experiment_col),
            *([] if suffix == "_control" else [F.col(arm_col).alias("_arm")]),
            F.col("n").alias(f"n{suffix}"),
            mean.alias(f"_mean{suffix}"),
            var_s.alias(f"_var{suffix}"),
        )

    ctrl = _stats(
        cells.filter(F.col(arm_col) == control_label), "_control"
    )
    arms = _stats(cells.filter(F.col(arm_col) != control_label), "_arm")
    j = arms.join(F.broadcast(ctrl), experiment_col, "left")
    a1 = F.col("_var_arm") / F.col("n_arm")
    a2 = F.col("_var_control") / F.col("n_control")
    se = F.sqrt(a1 + a2)
    diff = F.col("_mean_arm") - F.col("_mean_control")
    t = F.when(se > 0, F.round(diff / se, round_to))
    wdf = F.when(
        se > 0,
        F.round(
            (a1 + a2) * (a1 + a2)
            / (
                a1 * a1 / (F.col("n_arm") - 1)
                + a2 * a2 / (F.col("n_control") - 1)
            ),
            round_to,
        ),
    )
    return j.select(
        F.col(experiment_col),
        F.col("_arm").alias(arm_col),
        "n_control",
        "n_arm",
        F.col("n_control").isNotNull().alias("has_control"),
        F.round(F.col("_mean_control"), round_to).alias("mean_control"),
        F.round(F.col("_mean_arm"), round_to).alias("mean_arm"),
        F.round(diff, round_to).alias("diff"),
        t.alias("t"),
        wdf.alias("df"),
        F.coalesce(F.abs(t) > F.lit(float(t_crit)), F.lit(False)).alias(
            "significant"
        ),
    )


def cuped_adjusted_means(
    df: DataFrame,
    experiment_col: str,
    arm_col: str,
    value_col: str,
    covariate_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per (experiment, arm): the CUPED-adjusted metric mean — variance
    reduction via a pre-experiment covariate (Deng et al. 2013,
    "Improving the sensitivity of online controlled experiments"), the
    standard way an A/B platform shrinks confidence intervals without
    more traffic:

        theta    = cov(x, y) / var(x)        (pooled over the experiment)
        y_adj_i  = y_i - theta * (x_i - xbar)
        mean_adj = ybar_arm - theta * (xbar_arm - xbar)
        var_adj  = var_y - 2*theta*cov + theta^2*var_x   (per arm)

    The covariate must be PRE-EXPERIMENT (independent of assignment) or
    the adjustment biases the readout — that contract is the caller's.
    Returns ``[experiment, arm, n, mean_raw, mean_adj, theta,
    var_reduction]`` (caller's column names): ``theta`` is the
    experiment's pooled coefficient, ``var_reduction`` the arm's
    1 - var_adj/var_raw (the fraction of metric variance the covariate
    explains — the CI-shrink factor). ``theta``/``mean_adj`` are NULL
    when the covariate is constant (var(x) = 0 — nothing to adjust
    with); ``var_reduction`` is NULL when additionally var_y = 0 or
    n < 2. Rows with NULL keys or NULL/NaN in EITHER metric are
    excluded up front (a half-present row has no (x, y) pair).

    Cross-engine determinism: per-(experiment, arm) moments use the
    zscore PIVOT discipline with the pivots keyed per EXPERIMENT (both
    columns), so arm moments SUM exactly across arms (DECIMAL(38,12)
    folds with one shared pivot) into the pooled theta — no second
    scan, no per-arm/pooled pivot mismatch; every downstream step is a
    fixed-order single IEEE op mirrored in the oracle, rounded once.

    Scale shape: ONE map-side-combinable moment aggregate over the
    corpus scan (five folds per cell) MATERIALIZED (it feeds the pooled
    roll-up AND the per-arm readout — the family diamond); everything
    after is |experiments x arms|-row algebra.
    """
    y = F.col(value_col).cast("double")
    x = F.col(covariate_col).cast("double")
    base = df.filter(
        F.col(experiment_col).isNotNull()
        & F.col(arm_col).isNotNull()
        & y.isNotNull() & ~F.isnan(y)
        & x.isNotNull() & ~F.isnan(x)
    ).select(F.col(experiment_col), F.col(arm_col), y.alias("_y"), x.alias("_x"))
    pivots = base.groupBy(experiment_col).agg(
        F.min("_y").alias("_py"), F.min("_x").alias("_px")
    )
    dy = F.col("_y") - F.col("_py")
    dx = F.col("_x") - F.col("_px")
    dec = "decimal(38,12)"
    cells = _materialize(
        base.join(F.broadcast(pivots), experiment_col)
        .groupBy(experiment_col, arm_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.sum(dy.cast(dec)).alias("_sy"),
            F.sum(dx.cast(dec)).alias("_sx"),
            F.sum((dy * dy).cast(dec)).alias("_syy"),
            F.sum((dx * dx).cast(dec)).alias("_sxx"),
            F.sum((dx * dy).cast(dec)).alias("_sxy"),
        )
    )
    pooled = cells.groupBy(experiment_col).agg(
        F.sum("_n").cast("bigint").alias("_pn"),
        F.sum("_sy").cast("double").alias("_psy"),
        F.sum("_sx").cast("double").alias("_psx"),
        F.sum("_sxx").cast("double").alias("_psxx"),
        F.sum("_sxy").cast("double").alias("_psxy"),
    )
    pn = F.col("_pn").cast("double")
    # pooled var/cov in the pivot frame (shift-invariant)
    pvar_x = F.col("_psxx") / pn - (F.col("_psx") / pn) * (F.col("_psx") / pn)
    pcov = F.col("_psxy") / pn - (F.col("_psx") / pn) * (F.col("_psy") / pn)
    theta = F.when(pvar_x > 0, pcov / pvar_x)
    xbar_pool = F.col("_psx") / pn  # pivot-frame pooled covariate mean
    stats = pooled.select(
        F.col(experiment_col),
        theta.alias("_theta"),
        xbar_pool.alias("_xbar"),
    )
    j = cells.join(F.broadcast(stats), experiment_col)
    n = F.col("_n")
    nd = n.cast("double")
    ybar = F.col("_sy").cast("double") / nd
    xbar = F.col("_sx").cast("double") / nd
    mean_raw = F.col("_py") + ybar  # needs the pivot back
    j = j.join(F.broadcast(pivots), experiment_col)
    var_y = F.when(
        n >= 2,
        (F.col("_syy").cast("double") / nd - ybar * ybar)
        * (nd / (n - 1)),
    )
    var_x = F.when(
        n >= 2,
        (F.col("_sxx").cast("double") / nd - xbar * xbar)
        * (nd / (n - 1)),
    )
    cov = F.when(
        n >= 2,
        (F.col("_sxy").cast("double") / nd - xbar * ybar)
        * (nd / (n - 1)),
    )
    t = F.col("_theta")
    mean_adj = mean_raw - t * (xbar - F.col("_xbar"))
    var_adj = var_y - F.lit(2.0) * t * cov + t * t * var_x
    var_reduction = F.when(
        var_y > 0, F.lit(1.0) - var_adj / var_y
    )
    return j.select(
        F.col(experiment_col),
        F.col(arm_col),
        n.alias("n"),
        (F.round(mean_raw, round_to) + F.lit(0.0)).alias("mean_raw"),
        (F.round(mean_adj, round_to) + F.lit(0.0)).alias("mean_adj"),
        (F.round(t, round_to) + F.lit(0.0)).alias("theta"),
        (F.round(var_reduction, round_to) + F.lit(0.0)).alias(
            "var_reduction"
        ),
    )


def mann_whitney_u(
    df: DataFrame,
    experiment_col: str,
    arm_col: str,
    value_col: str,
    control_label: str,
    z_crit: float = 1.959964,
    round_to: int = 6,
    buckets: int | None = None,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Per (experiment, arm != control): the Mann-Whitney U test
    (Wilcoxon rank-sum) vs the experiment's control arm — the
    NONPARAMETRIC leg completing the two-sample triad
    (:func:`ab_test_zscores` for proportions, :func:`welch_ttest` for
    means, U for whole distributions): valid for ordinal/heavy-tailed
    metrics where a mean comparison is meaningless, and sensitive to
    any stochastic-dominance shift, not just location.

        U = R_a - n_a(n_a+1)/2          (R_a = arm's rank sum over the
                                         pooled two-sample ranking,
                                         AVERAGE ranks on ties)
        z = (U - n_a*n_c/2 -/+ 0.5) / sqrt(var_U)    (continuity-corr.)
        var_U = n_a*n_c/12 * [ (n+1) - sum_t (t^3 - t) / (n(n-1)) ]

    with the standard tie correction (t the pooled tie-group sizes).
    Returns ``[experiment, arm, n_control, n_arm, has_control, u, z,
    significant]`` (the experiment/arm columns keep the CALLER's
    names — the family-wide schema contract); ``u`` is exact (a
    half-integer double), ``z`` rounds and ``significant`` compares
    the ROUNDED |z|; var_U = 0 (all values tied) yields NULL z; a
    missing control arm surfaces with ``has_control = false`` and
    NULL n_control/u/z (the family's left-join discipline — a
    degenerate one-sample ranking would otherwise emit u = 0, which
    reads as "every arm value below control"). NULL experiment/arm
    keys and NULL/NaN values are excluded up front.

    Cross-engine determinism: ranks never materialize per row — the
    pooled ranking reduces to per-(pair, value) COUNTS: with cum the
    total count strictly below a value and t the count at it, the tie
    group's average rank is (2*cum + t + 1)/2, so DOUBLED rank sums
    stay exact integers end-to-end (DECIMAL(38,0) folds — u, the tie
    sums, and U - mean_U are integer-halves with no float until the
    final three IEEE ops: the tie-term division, the variance
    multiply, the z division). Both engines therefore agree on every
    comparison, including borderline significance.

    Scale shape: ONE (experiment, arm, value) count aggregate
    (map-side combinable) is the only corpus-sized stage; control
    counts replicate per treatment arm via a broadcast of the
    |experiments x arms| arm list; the pooled ranking is one window
    over the (pair, value) spine at distinct-value cardinality.
    ``buckets`` is the 100 TB tier made a PARAMETER (the
    ks_drift/x90/cap_n precedent): values quantize to equal-width bin
    ids over ``bounds`` = (lo, hi) — the histogram_fixed_width/
    ks_value_counts assignment, including the clamp-before-cast edge
    discipline — bounding the rank spine at |pairs| x buckets; the
    result is then the EXACT U test of the binned distributions
    (property-tested equal to the exact test over pre-binned values).
    ``bounds=None`` uses the corpus's own min/max (one tiny extra
    aggregate + broadcast); ``bounds`` without ``buckets`` raises.
    """
    cells = _materialize(
        mw_cell_counts(
            df, experiment_col, arm_col, value_col,
            buckets=buckets, bounds=bounds,
        )
    )
    return mw_from_counts(
        cells, experiment_col, arm_col, control_label,
        z_crit=z_crit, round_to=round_to,
    )


def mw_cell_counts(
    df: DataFrame,
    experiment_col: str,
    arm_col: str,
    value_col: str,
    buckets: int | None = None,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """The ``[experiment, arm, _v, _c]`` count stage of
    :func:`mann_whitney_u`, shared with the streaming twin so the two
    can never drift: the domain guards (NULL keys, NULL/NaN values)
    and the ``buckets`` quantization live here, in exactly one place.
    Counts are exact integers, so cells SUM across micro-batches — the
    mergeable sufficient statistic. The streaming twin REQUIRES
    explicit ``bounds`` with ``buckets`` (data-derived bounds would
    shift between micro-batches and re-bin history — the
    ks_value_counts rule)."""
    if bounds is not None and buckets is None:
        raise ValueError(
            "bounds without buckets is not supported: bounds only "
            "parameterize the quantized tier — pass buckets too"
        )
    v = F.col(value_col).cast("double")
    base = df.filter(
        F.col(experiment_col).isNotNull()
        & F.col(arm_col).isNotNull()
        & v.isNotNull()
        & ~F.isnan(v)
    ).select(F.col(experiment_col), F.col(arm_col), v.alias("_v"))
    if buckets is not None:
        if buckets < 1:
            raise ValueError(f"buckets must be positive, got {buckets}")
        k = F.lit(int(buckets))
        if bounds is not None:
            blo, bhi = F.lit(float(bounds[0])), F.lit(float(bounds[1]))
            src = base
        else:
            b = base.agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"))
            blo, bhi = F.col("_lo"), F.col("_hi")
            src = base.crossJoin(F.broadcast(b))
        width = (bhi - blo) / k
        # clamp BEFORE the int cast — the ks_value_counts ANSI
        # CAST_OVERFLOW lesson: far-out values must hit the edge bins
        cv = F.greatest(blo, F.least(bhi, F.col("_v")))
        bucket = F.when(
            width > 0,
            F.greatest(
                F.lit(0),
                F.least(k - 1, F.floor((cv - blo) / width).cast("int")),
            ),
        ).otherwise(F.lit(0))
        base = src.select(
            F.col(experiment_col),
            F.col(arm_col),
            bucket.cast("double").alias("_v"),
        )
    return base.groupBy(experiment_col, arm_col, "_v").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )


def mw_from_counts(
    cells: DataFrame,
    experiment_col: str,
    arm_col: str,
    control_label: str,
    z_crit: float = 1.959964,
    round_to: int = 6,
) -> DataFrame:
    """:func:`mann_whitney_u` from a pre-aggregated
    ``[experiment, arm, _v, _c]`` cell table — the mergeable-
    sufficient-statistic entry point the streaming twin folds into
    (cells sum across micro-batches, FULL cross-batch parity; the
    whole average-rank algebra is a function of the count table). The
    cell frame feeds the arm list, the arm cells, AND the replicated
    control cells: pass it materialized/checkpointed (as
    :func:`mann_whitney_u` and the twin both do)."""
    arm_cells = cells.filter(F.col(arm_col) != control_label).select(
        F.col(experiment_col),
        F.col(arm_col).alias("_arm"),
        "_v",
        F.col("_c").alias("_c_a"),
        F.lit(0).cast("bigint").alias("_c_c"),
    )
    arm_list = arm_cells.select(experiment_col, "_arm").distinct()
    ctrl_cells = (
        cells.filter(F.col(arm_col) == control_label)
        .select(F.col(experiment_col), "_v", F.col("_c").alias("_cc"))
        .join(F.broadcast(arm_list), experiment_col)
        .select(
            F.col(experiment_col),
            "_arm",
            "_v",
            F.lit(0).cast("bigint").alias("_c_a"),
            F.col("_cc").alias("_c_c"),
        )
    )
    pooled = (
        arm_cells.unionByName(ctrl_cells)
        .groupBy(experiment_col, "_arm", "_v")
        .agg(
            F.sum("_c_a").cast("bigint").alias("_c_a"),
            F.sum("_c_c").cast("bigint").alias("_c_c"),
        )
    )
    t_cnt = F.col("_c_a") + F.col("_c_c")
    w = (
        Window.partitionBy(experiment_col, "_arm")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(t_cnt).over(w), F.lit(0))
    dec0 = "decimal(38,0)"
    # doubled average rank of the tie group: 2*cum + t + 1 (integer)
    rank2 = (F.lit(2) * cum + t_cnt + 1).cast(dec0)
    stats = pooled.withColumn("_r2", rank2).groupBy(
        experiment_col, "_arm"
    ).agg(
        F.sum("_c_a").cast("bigint").alias("n_arm"),
        F.sum("_c_c").cast("bigint").alias("n_control"),
        F.sum(F.col("_c_a").cast(dec0) * F.col("_r2"))
        .cast(dec0)
        .alias("_r2a"),
        F.sum(
            (t_cnt.cast(dec0) * t_cnt * t_cnt - t_cnt).cast(dec0)
        ).cast(dec0).alias("_ties"),
    )
    n_a, n_c = F.col("n_arm"), F.col("n_control")
    n = n_a + n_c
    # 2U = 2*R_a - n_a(n_a+1); U - mean_U = (2U - n_a*n_c)/2
    u2 = F.col("_r2a") - (n_a.cast(dec0) * (n_a + 1)).cast(dec0)
    d_half = (u2 - (n_a.cast(dec0) * n_c)).cast("double") / F.lit(2.0)
    prod_d = (n_a.cast(dec0) * n_c).cast("double")
    tie_term = F.col("_ties").cast("double") / (
        n.cast(dec0) * (n - 1)
    ).cast("double")
    var_u = prod_d / F.lit(12.0) * ((n + 1).cast("double") - tie_term)
    sd = F.sqrt(var_u)
    z = (
        F.when(~(var_u > 0), F.lit(None).cast("double"))
        .when(d_half > 0, (d_half - F.lit(0.5)) / sd)
        .when(d_half < 0, (d_half + F.lit(0.5)) / sd)
        .otherwise(F.lit(0.0))
    )
    z = F.when(n_c > 0, F.round(z, round_to) + F.lit(0.0))
    # missing control: the pooled ranking degenerates to the arm alone,
    # making u2 identically 0 — a dashboard would read u = 0 as "every
    # arm value below control", so u masks NULL like n_control/z do
    u = F.when(n_c > 0, u2.cast("double") / F.lit(2.0))
    return stats.select(
        F.col(experiment_col),
        F.col("_arm").alias(arm_col),
        F.when(n_c > 0, n_c).alias("n_control"),
        "n_arm",
        (n_c > 0).alias("has_control"),
        u.alias("u"),
        z.alias("z"),
        F.coalesce(F.abs(z) > F.lit(float(z_crit)), F.lit(False)).alias(
            "significant"
        ),
    )


def cliffs_delta(
    df: DataFrame,
    experiment_col: str,
    arm_col: str,
    value_col: str,
    control_label: str,
    round_to: int = 6,
    buckets: int | None = None,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Per (experiment, arm != control): Cliff's delta vs the
    experiment's control arm — the nonparametric EFFECT SIZE beside
    :func:`mann_whitney_u`'s significance (z says whether the shift is
    real; delta says whether it is big enough to care about, the
    p-value-vs-effect-size discipline every experimentation readout
    needs):

        delta = (#{a > c} - #{a < c}) / (n_a * n_c)   in [-1, 1]

    the probability a random arm value exceeds a random control value
    minus the reverse (0 = stochastically identical; |delta| >= 0.474
    is Romano et al.'s "large"). Returns ``[experiment, arm,
    n_control, n_arm, has_control, delta]`` (caller's column names);
    a missing control arm surfaces with ``has_control = false`` and
    NULL n_control/delta (the family's left-join discipline).

    Cross-engine determinism: delta is a pure function of the
    Mann-Whitney U — delta = (2U - n_a*n_c) / (n_a*n_c) — and 2U is
    the count-table doubled-rank integer (DECIMAL(38,0)-exact, ties
    counted half by the average-rank algebra), so the numerator and
    denominator are exact integers and delta is ONE IEEE division,
    rounded once.

    Scale shape: identical to :func:`mann_whitney_u` — the shared
    :func:`mw_cell_counts` stage (with the same ``buckets``/``bounds``
    quantized tier) is the only corpus-sized aggregate; delta needs no
    tie-variance term, so the rank spine window and one tiny aggregate
    finish the job.
    """
    cells = _materialize(
        mw_cell_counts(
            df, experiment_col, arm_col, value_col,
            buckets=buckets, bounds=bounds,
        )
    )
    return cliffs_delta_from_counts(
        cells, experiment_col, arm_col, control_label, round_to=round_to
    )


def cliffs_delta_from_counts(
    cells: DataFrame,
    experiment_col: str,
    arm_col: str,
    control_label: str,
    round_to: int = 6,
) -> DataFrame:
    """:func:`cliffs_delta` from a pre-aggregated
    ``[experiment, arm, _v, _c]`` cell table — the SAME mergeable
    sufficient statistic as :func:`mw_from_counts` (one streaming
    state serves U, z, AND delta). Pass it materialized."""
    arm_cells = cells.filter(F.col(arm_col) != control_label).select(
        F.col(experiment_col),
        F.col(arm_col).alias("_arm"),
        "_v",
        F.col("_c").alias("_c_a"),
        F.lit(0).cast("bigint").alias("_c_c"),
    )
    arm_list = arm_cells.select(experiment_col, "_arm").distinct()
    ctrl_cells = (
        cells.filter(F.col(arm_col) == control_label)
        .select(F.col(experiment_col), "_v", F.col("_c").alias("_cc"))
        .join(F.broadcast(arm_list), experiment_col)
        .select(
            F.col(experiment_col),
            "_arm",
            "_v",
            F.lit(0).cast("bigint").alias("_c_a"),
            F.col("_cc").alias("_c_c"),
        )
    )
    pooled = (
        arm_cells.unionByName(ctrl_cells)
        .groupBy(experiment_col, "_arm", "_v")
        .agg(
            F.sum("_c_a").cast("bigint").alias("_c_a"),
            F.sum("_c_c").cast("bigint").alias("_c_c"),
        )
    )
    t_cnt = F.col("_c_a") + F.col("_c_c")
    w = (
        Window.partitionBy(experiment_col, "_arm")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(t_cnt).over(w), F.lit(0))
    dec0 = "decimal(38,0)"
    rank2 = (F.lit(2) * cum + t_cnt + 1).cast(dec0)
    stats = pooled.withColumn("_r2", rank2).groupBy(
        experiment_col, "_arm"
    ).agg(
        F.sum("_c_a").cast("bigint").alias("n_arm"),
        F.sum("_c_c").cast("bigint").alias("n_control"),
        F.sum(F.col("_c_a").cast(dec0) * F.col("_r2"))
        .cast(dec0)
        .alias("_r2a"),
    )
    n_a, n_c = F.col("n_arm"), F.col("n_control")
    # 2U = 2*R_a - n_a(n_a+1); delta = (2U - n_a*n_c) / (n_a*n_c)
    u2 = F.col("_r2a") - (n_a.cast(dec0) * (n_a + 1)).cast(dec0)
    prod = (n_a.cast(dec0) * n_c).cast(dec0)
    delta = F.when(
        n_c > 0,
        F.round(
            (u2 - prod).cast("double") / prod.cast("double"), round_to
        )
        + F.lit(0.0),
    )
    return stats.select(
        F.col(experiment_col),
        F.col("_arm").alias(arm_col),
        F.when(n_c > 0, n_c).alias("n_control"),
        "n_arm",
        (n_c > 0).alias("has_control"),
        delta.alias("delta"),
    )


def kruskal_wallis(
    df: DataFrame,
    experiment_col: str,
    arm_col: str,
    value_col: str,
    round_to: int = 6,
    buckets: int | None = None,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Per experiment: the Kruskal-Wallis H test over ALL its arms —
    the k-sample omnibus completing the rank family
    (:func:`mann_whitney_u` answers "does THIS arm differ from
    control"; H answers "do ANY of the k arms differ at all", the
    gate an experimentation platform runs before k pairwise readouts
    inflate the error budget):

        H = [ 12 / (n(n+1)) * sum_arms R_a^2 / n_a - 3(n+1) ] / C
        C = 1 - sum_t (t^3 - t) / (n^3 - n)        (tie correction)

    with R_a each arm's rank sum over the experiment's POOLED ranking
    (average ranks on ties). Returns one row per experiment with >= 2
    arms: ``[experiment, k_arms, n, dof, h]`` — ``dof = k - 1``;
    compare ``h`` against the chi-square critical value for dof
    upstream (p-values stay out of scope, the module's libm-CDF
    rule). ``h`` is NULL when every pooled value is tied (C = 0 — no
    ranking information exists). NULL keys and NULL/NaN values are
    excluded by the shared count stage.

    Cross-engine determinism: the pooled ranking is the
    :func:`mann_whitney_u` count-table algebra — ONE ranking per
    experiment (not per pair), doubled average ranks as exact
    DECIMAL(38,0) integers, so every rank sum is integer-exact. Each
    arm's R_a^2/n_a term is two IEEE ops on the exact doubled sum
    (square, divide) folded through DECIMAL(38,6) — magnitudes reach
    ~n^2 * n_a, far above DECIMAL(38,18)'s 1e20 ceiling but within
    38,6's 1e32, and the 1e-6 quantum is absorbed by the final round;
    H's remaining steps are single fixed-order IEEE ops mirrored in
    the oracle.

    Scale shape: ONE (experiment, arm, value) count aggregate — the
    shared :func:`mw_cell_counts` stage, so the ``buckets``/``bounds``
    quantized tier bounds the rank spine exactly as documented there —
    then a per-experiment window over the pooled value spine and two
    tiny aggregates. The corpus is scanned once.
    """
    cells = _materialize(
        mw_cell_counts(
            df, experiment_col, arm_col, value_col,
            buckets=buckets, bounds=bounds,
        )
    )
    return kw_from_counts(cells, experiment_col, arm_col, round_to=round_to)


def kw_from_counts(
    cells: DataFrame,
    experiment_col: str,
    arm_col: str,
    round_to: int = 6,
) -> DataFrame:
    """:func:`kruskal_wallis` from a pre-aggregated
    ``[experiment, arm, _v, _c]`` cell table (the SAME mergeable
    sufficient statistic as :func:`mw_from_counts` — one state serves
    both readouts in a streaming deployment). Pass it materialized."""
    dec0, dec6 = "decimal(38,0)", "decimal(38,6)"
    pooled = cells.groupBy(experiment_col, "_v").agg(
        F.sum("_c").cast("bigint").alias("_t")
    )
    w = (
        Window.partitionBy(experiment_col)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("_t").over(w), F.lit(0))
    ranked = pooled.select(
        experiment_col,
        "_v",
        "_t",
        (F.lit(2) * cum + F.col("_t") + 1).cast(dec0).alias("_r2"),
    )
    arm_sums = (
        cells.join(ranked, [experiment_col, "_v"])
        .groupBy(experiment_col, arm_col)
        .agg(
            F.sum("_c").cast("bigint").alias("_n_a"),
            F.sum(F.col("_c").cast(dec0) * F.col("_r2"))
            .cast(dec0)
            .alias("_r2a"),
        )
    )
    r2d = F.col("_r2a").cast("double")
    term = (r2d * r2d / F.col("_n_a")).cast(dec6)
    per_exp = arm_sums.groupBy(experiment_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("k_arms"),
        F.sum("_n_a").cast("bigint").alias("n"),
        F.sum(term).cast("double").alias("_s4"),
    )
    ties = pooled.groupBy(experiment_col).agg(
        F.sum(
            (F.col("_t").cast(dec0) * F.col("_t") * F.col("_t")
             - F.col("_t")).cast(dec0)
        ).cast(dec0).alias("_ties")
    )
    n = F.col("n")
    # H_raw = 12/(n(n+1)) * (s4/4) - 3(n+1) = 3*s4/(n(n+1)) - 3(n+1),
    # each step one IEEE op in fixed order, mirrored in the oracle
    h_raw = (
        F.lit(3.0) * F.col("_s4")
        / (n.cast(dec0) * (n + 1)).cast("double")
        - F.lit(3.0) * (n + 1).cast("double")
    )
    corr = F.lit(1.0) - F.col("_ties").cast("double") / (
        n.cast(dec0) * n * n - n
    ).cast("double")
    h = F.when(corr > 0, F.round(h_raw / corr, round_to) + F.lit(0.0))
    return (
        per_exp.join(ties, experiment_col)
        .filter(F.col("k_arms") >= 2)
        .select(
            F.col(experiment_col),
            "k_arms",
            "n",
            (F.col("k_arms") - 1).cast("bigint").alias("dof"),
            h.alias("h"),
        )
    )


def _cell_moments(
    df: DataFrame,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Welch-pivot-disciplined per-cell moments ``[*keys, n, p, s, sq]``
    (n rows, pivot = cell min, DECIMAL(38,12) folds of d and d^2) —
    the shared stage behind welch_ttest / diff_in_diff / mde_estimate.
    NULL keys and NULL/NaN values are excluded."""
    v = F.col(value_col).cast("double")
    keep = v.isNotNull() & ~F.isnan(v)
    for k in keys:
        keep = keep & F.col(k).isNotNull()
    base = df.filter(keep).select(*keys, v.alias("_v"))
    pivots = base.groupBy(*keys).agg(F.min("_v").alias("_p"))
    d = F.col("_v") - F.col("_p")
    dec = "decimal(38,12)"
    return (
        base.join(F.broadcast(pivots), keys)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("_p").alias("p"),
            F.sum(d.cast(dec)).cast("double").alias("s"),
            F.sum((d * d).cast(dec)).cast("double").alias("sq"),
        )
    )


def _cell_mean_var(prefix: str):
    """mean / sample-variance columns off a _cell_moments row whose
    columns carry ``prefix`` (fixed IEEE operand order)."""
    n = F.col(f"{prefix}n")
    m = F.col(f"{prefix}s") / n
    mean = F.col(f"{prefix}p") + m
    var = F.when(
        n >= 2,
        (F.col(f"{prefix}sq") / n - m * m)
        * (n.cast("double") / (n - 1)),
    )
    return mean, var


def diff_in_diff(
    df: DataFrame,
    experiment_col: str,
    arm_col: str,
    period_col: str,
    value_col: str,
    control_label: str = "control",
    pre_label: str = "pre",
    post_label: str = "post",
    z_crit: float = 1.959964,
    round_to: int = 6,
) -> DataFrame:
    """Difference-in-differences per (experiment, treatment arm): the
    causal readout when treatment was NOT randomly assigned but both
    arms were observed before AND after the change —
    did = (mean_t_post - mean_t_pre) - (mean_c_post - mean_c_pre),
    the parallel-trends estimator that cancels both the arm's level
    difference and the shared time shift. Completes the family: x105/
    x116 assume randomized arms; this is the rollout/geo-launch tool.

    Returns ``[experiment, arm, n_c_pre, n_c_post, n_t_pre, n_t_post,
    did, se, z, significant, has_all_cells]`` for every non-control
    arm. se is the independent-samples form sqrt(sum of var/n over the
    FOUR cells) — NULL (and significant = false) when any cell has
    n < 2; a missing cell (arm never observed in a period) surfaces
    with has_all_cells = false and NULL did (the has_control
    discipline: misconfigured feeds must be visible, not vanish).

    Cross-engine determinism: the four cell moments are the Welch
    pivot-fold (shared ``_cell_moments`` stage); did/se/z are fixed-
    order IEEE ops, z rounded once, significance compared on the
    ROUNDED z.

    Scale shape: ONE corpus scan into the materialized (experiment,
    arm, period) moment table (mergeable sufficient statistic);
    everything after is |experiments x arms|-row algebra over
    broadcast joins.
    """
    cells = _materialize(
        _cell_moments(
            df, [experiment_col, arm_col, period_col], value_col
        )
    )

    def _slice(arm_pred, period_label: str, prefix: str) -> DataFrame:
        out = cells.filter(
            arm_pred & (F.col(period_col) == period_label)
        ).select(
            F.col(experiment_col),
            *([F.col(arm_col).alias("_arm")] if prefix.startswith("t") else []),
            F.col("n").alias(f"{prefix}n"),
            F.col("p").alias(f"{prefix}p"),
            F.col("s").alias(f"{prefix}s"),
            F.col("sq").alias(f"{prefix}sq"),
        )
        return out

    is_ctrl = F.col(arm_col) == control_label
    t_pre = _slice(~is_ctrl, pre_label, "tpre_")
    t_post = _slice(~is_ctrl, post_label, "tpost_")
    c_pre = _slice(is_ctrl, pre_label, "cpre_")
    c_post = _slice(is_ctrl, post_label, "cpost_")
    j = (
        t_post.join(t_pre, [experiment_col, "_arm"], "full")
        .join(F.broadcast(c_pre), experiment_col, "left")
        .join(F.broadcast(c_post), experiment_col, "left")
    )
    m_tpre, v_tpre = _cell_mean_var("tpre_")
    m_tpost, v_tpost = _cell_mean_var("tpost_")
    m_cpre, v_cpre = _cell_mean_var("cpre_")
    m_cpost, v_cpost = _cell_mean_var("cpost_")
    has_all = (
        F.col("tpre_n").isNotNull()
        & F.col("tpost_n").isNotNull()
        & F.col("cpre_n").isNotNull()
        & F.col("cpost_n").isNotNull()
    )
    did = F.when(
        has_all, (m_tpost - m_tpre) - (m_cpost - m_cpre)
    )
    se = F.when(
        has_all,
        F.sqrt(
            v_tpost / F.col("tpost_n")
            + v_tpre / F.col("tpre_n")
            + v_cpost / F.col("cpost_n")
            + v_cpre / F.col("cpre_n")
        ),
    )
    z = F.when(se > 0, F.round(did / se, round_to))
    rnd = lambda c: F.round(c, round_to) + F.lit(0.0)  # noqa: E731
    return j.select(
        F.col(experiment_col),
        F.col("_arm").alias(arm_col),
        F.col("cpre_n").alias("n_c_pre"),
        F.col("cpost_n").alias("n_c_post"),
        F.col("tpre_n").alias("n_t_pre"),
        F.col("tpost_n").alias("n_t_post"),
        rnd(did).alias("did"),
        rnd(se).alias("se"),
        (z + F.lit(0.0)).alias("z"),
        F.coalesce(
            F.abs(z) > F.lit(float(z_crit)), F.lit(False)
        ).alias("significant"),
        has_all.alias("has_all_cells"),
    )


#: two-sided alpha / power -> python-computed 12-decimal z literals
#: (statistics.NormalDist at module-authoring time — ppf never runs in
#: either engine, the SPRT ln-constant discipline)
MDE_Z_ALPHA = {0.05: "1.959963984540", 0.01: "2.575829303549"}
MDE_Z_POWER = {0.8: "0.841621233573", 0.9: "1.281551565545"}


def mde_estimate(
    df: DataFrame,
    experiment_col: str,
    arm_col: str,
    value_col: str,
    control_label: str = "control",
    alpha: float = 0.05,
    power: float = 0.8,
    round_to: int = 6,
) -> DataFrame:
    """Minimum detectable effect per (experiment, arm) at the CURRENT
    sample sizes and variances — the power-analysis readout upstream of
    every test in this family (the reference's power-analysis loop's
    "is this experiment even big enough" question):
    mde_abs = (z_{1-alpha/2} + z_{power}) * sqrt(s_c^2/n_c + s_a^2/n_a),
    plus mde_rel = mde_abs / mean_control (NULL exactly when the
    unrounded control mean is 0 — a ratio to a zero baseline is
    undefined, not infinite).

    Returns ``[experiment, arm, n_control, n_arm, has_control,
    mean_control, mde_abs, mde_rel]``. z constants come from a fixed
    literal table (``MDE_Z_ALPHA`` / ``MDE_Z_POWER`` — python-computed
    12-decimal strings; the inverse normal CDF never runs in either
    engine), so unsupported alpha/power raise at wiring time instead
    of silently diverging cross-engine. Cells with n < 2 yield NULL
    mde; missing controls surface with has_control = false.

    Scale shape: the shared ``_cell_moments`` stage (ONE corpus scan,
    mergeable moment state), then |experiments x arms|-row algebra.
    """
    if alpha not in MDE_Z_ALPHA:
        raise ValueError(
            f"alpha must be one of {sorted(MDE_Z_ALPHA)}, got {alpha}"
        )
    if power not in MDE_Z_POWER:
        raise ValueError(
            f"power must be one of {sorted(MDE_Z_POWER)}, got {power}"
        )
    zsum = float(MDE_Z_ALPHA[alpha]) + float(MDE_Z_POWER[power])
    cells = _materialize(
        _cell_moments(df, [experiment_col, arm_col], value_col)
    )

    def _side(pred, prefix: str) -> DataFrame:
        return cells.filter(pred).select(
            F.col(experiment_col),
            *([F.col(arm_col).alias("_arm")] if prefix == "a_" else []),
            F.col("n").alias(f"{prefix}n"),
            F.col("p").alias(f"{prefix}p"),
            F.col("s").alias(f"{prefix}s"),
            F.col("sq").alias(f"{prefix}sq"),
        )

    is_ctrl = F.col(arm_col) == control_label
    arms = _side(~is_ctrl, "a_")
    ctrl = _side(is_ctrl, "c_")
    j = arms.join(F.broadcast(ctrl), experiment_col, "left")
    m_c, v_c = _cell_mean_var("c_")
    m_a, v_a = _cell_mean_var("a_")
    mde = F.lit(zsum) * F.sqrt(
        v_c / F.col("c_n") + v_a / F.col("a_n")
    )
    rnd = lambda c: F.round(c, round_to) + F.lit(0.0)  # noqa: E731
    return j.select(
        F.col(experiment_col),
        F.col("_arm").alias(arm_col),
        F.col("c_n").alias("n_control"),
        F.col("a_n").alias("n_arm"),
        F.col("c_n").isNotNull().alias("has_control"),
        rnd(m_c).alias("mean_control"),
        rnd(mde).alias("mde_abs"),
        rnd(F.when(m_c != 0, mde / m_c)).alias("mde_rel"),
    )
