"""Kaplan-Meier survival estimation per cohort — time-to-churn /
time-to-failure curves with right-censoring, the survival-analysis
complement of the cohort-retention grid (funnel.cohort_retention counts
fixed calendar buckets; KM handles censored subjects and irregular
event times correctly instead of treating still-active users as
churned).

    S(t) = prod over event times t_i <= t of (1 - d_i / n_i)

with ``d_i`` the events at ``t_i`` and ``n_i`` the at-risk count (rows
with duration >= t_i; censored rows leave the risk set silently, which
is the entire point of the estimator).

Cross-engine determinism: the cumulative product is computed as
exp(sum of ln((n_i - d_i)/n_i)) with the ln terms folded through
DECIMAL(38,18) — a windowed float PRODUCT is association-order-
dependent (DuckDB's segment-tree window evaluation groups factors
differently than a sequential fold), while a decimal-folded SUM is
exact, leaving one libm exp absorbed by the final round (the psi/x74
ln discipline). The n_i = d_i drop-to-zero case (ln 0 = -inf would
poison the decimal cast) is handled by an explicit cumulative
zero-flag: survival is exactly 0.0 from that row on.

Scale shape: ONE (group, duration) count aggregate (map-side
combinable), then per-group windows over the |distinct durations|
spine — nothing after the first aggregate is corpus-sized. A group
costs its distinct-duration count; the corpus is scanned once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def km_survival(
    df: DataFrame,
    group_by: Sequence[str],
    duration_col: str,
    event_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Kaplan-Meier estimate per group over ``duration_col`` (numeric;
    exact integer micros/seconds preferred — floats group by bit
    pattern) with ``event_col`` TRUE when the terminal event was
    OBSERVED and FALSE for right-censored rows (subject still active at
    cutoff). Returns one row per (group, observed event time):
    ``[*group_by, t, n_risk, n_events, survival]`` with survival the
    KM estimate just after ``t``, rounded. Censored-only times don't
    emit rows (S doesn't change there) but DO shrink later risk sets.
    """
    groups = list(group_by)
    spine = km_spine(df, groups, duration_col, event_col)
    return km_from_counts(spine, groups, round_to=round_to)


def km_spine(
    df: DataFrame,
    group_by: Sequence[str],
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """The ``[*group_by, _t, _c, _d]`` count stage of
    :func:`km_survival`, shared with the streaming twin so the two can
    never drift: NULL-duration rows drop — and for a floating-point
    duration column NaN rows drop with them (NaN is not NULL: it would
    otherwise yield a NaN spine row that sorts LAST, inflating n_g and
    keeping those subjects "at risk" at every event time — silently
    biasing every survival value in the group; the ks/benford/trend
    domain-guard discipline) — and NULL event flags read as censored
    here, in exactly one place."""
    groups = list(group_by)
    ev = F.col(event_col).cast("boolean")
    dur = F.col(duration_col)
    keep = dur.isNotNull()
    if dict(df.dtypes).get(duration_col) in ("float", "double"):
        keep = keep & ~F.isnan(dur)
    clean = df.filter(keep).select(
        *groups,
        F.col(duration_col).alias("_t"),
        F.coalesce(ev, F.lit(False)).alias("_e"),
    )
    return clean.groupBy(*groups, "_t").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c"),
        F.sum(F.when(F.col("_e"), 1).otherwise(0)).cast("bigint").alias("_d"),
    )


def km_from_counts(
    spine: DataFrame,
    group_by: Sequence[str],
    round_to: int = 6,
) -> DataFrame:
    """:func:`km_survival` from a pre-aggregated
    ``[*group_by, _t, _c, _d]`` spine (``_c`` rows at duration ``_t``,
    ``_d`` of them observed events) — the mergeable-sufficient-statistic
    entry point the streaming twin folds into (counts sum across
    micro-batches, so the recomputed curve has FULL cross-batch parity,
    the KS/PMI/drift-twin shape)."""
    groups = list(group_by)
    sizes = spine.groupBy(*groups).agg(
        F.sum("_c").cast("bigint").alias("_n_g")
    )
    asc = (
        Window.partitionBy(*groups)
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = (
        Window.partitionBy(*groups)
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_risk = F.col("_n_g") - F.coalesce(F.sum("_c").over(before), F.lit(0))
    risky = spine.join(F.broadcast(sizes), groups).withColumn(
        "_n_risk", n_risk
    )
    # ln((n-d)/n) only where a factor exists (d >= 1) and it is nonzero
    # (n > d); the n = d full-death case sets the cumulative zero flag
    # instead of sending -inf through the decimal fold.
    term = F.when(
        (F.col("_d") >= 1) & (F.col("_n_risk") > F.col("_d")),
        F.log(
            (F.col("_n_risk") - F.col("_d")).cast("double")
            / F.col("_n_risk").cast("double")
        ).cast("decimal(38,18)"),
    )
    zeroed = F.max(
        F.when(
            (F.col("_d") >= 1) & (F.col("_n_risk") == F.col("_d")), 1
        ).otherwise(0)
    ).over(asc)
    logsum = F.sum(term).over(asc)
    surv = F.when(zeroed == 1, F.lit(0.0)).otherwise(
        F.round(F.exp(F.coalesce(logsum.cast("double"), F.lit(0.0))), round_to)
    )
    return (
        risky.withColumn("_surv", surv)
        .filter(F.col("_d") >= 1)
        .select(
            *groups,
            F.col("_t").alias("t"),
            F.col("_n_risk").cast("bigint").alias("n_risk"),
            F.col("_d").alias("n_events"),
            F.col("_surv").alias("survival"),
        )
    )
