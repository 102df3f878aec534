"""Monotonic-trend detection per entity: Mann-Kendall test + Theil-Sen slope.

The standard nonparametric pair for "is this series drifting, and how
fast": the Mann-Kendall S statistic with the tie-corrected normal
approximation, and the Theil-Sen estimator (median of pairwise slopes —
robust to 29% outliers, unlike OLS). Complements the distribution-level
monitors (stats.psi_drift, stats.ks_drift, streaming CUSUM): those say
"the population moved"; this says "this entity's own series trends, at
this rate". Reference scope: the per-stage weekly trend summaries in
Requirements/ExampleAiCode.md:229-241 motivate per-entity trend scoring.

Cross-engine determinism (the x33/x69 discipline):
- S and every tie term are exact integers (sign comparisons and counts).
- var(S) = (n(n-1)(2n+5) - sum_t t(t-1)(2t+5)) / 18: the numerator is an
  exact integer routed through DECIMAL(38,0) (n^3 in raw BIGINT is fine
  until ~2M rows per entity; the cast removes the cliff), then ONE
  double division by 18.0.
- z = (S -/+ 1) / sqrt(var): continuity-corrected; subtraction is exact
  (integer), sqrt and divide are single correctly-rounded IEEE ops in
  fixed operand order, so z is bit-identical across engines.
- Theil-Sen: slope = dv / ds with dv exact (double subtraction of the
  raw values — one rounded op), ds = CAST(timestampdiff(MICROSECOND)
  AS DOUBLE) / 1e6 (exact integer micros, one rounded division — the
  NTZ-safe funnel.py discipline); the median is the exact
  interpolated percentile (matches DuckDB quantile_cont — the A2
  precedent). Same-timestamp pairs are excluded from the slope (their
  ds is 0) but still counted in S, the standard Mann-Kendall treatment.

Scale shape: ONE entity-keyed shuffle feeds a within-entity pair join —
cost sum over entities of n_e^2, never corpus^2 (the x97 blocking
argument). This is for BOUNDED per-entity series (sensor channels,
per-user histories after recent_n capping); for million-row series use
the O(n log n) rank formulation or pre-aggregate to a coarser grain
first. The ties aggregate and the size aggregate reuse the same
entity-keyed partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mann_kendall_trend(
    df: DataFrame,
    ts_col: str,
    group_by: Sequence[str],
    value_col: str,
    id_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group Mann-Kendall trend test + Theil-Sen slope.

    Returns ``[*group_by, n, s, var_s, z, sen_slope]`` for every group
    with at least 2 observations: ``s`` the exact pair-sign sum, ``var_s``
    the tie-corrected variance, ``z`` the continuity-corrected normal
    statistic (NULL when var_s = 0, i.e. all values tied), ``sen_slope``
    the median pairwise slope in value-units per second (NULL when every
    pair shares a timestamp). Pairs are ordered by the total order
    ``(ts, id)`` so the pair set is engine-independent even with tied
    timestamps.
    """
    groups = list(group_by)
    v = F.col(value_col).cast("double")
    clean = df.filter(v.isNotNull() & ~F.isnan(v)).select(
        *groups,
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        v.alias("_v"),
    )
    a, b = clean.alias("a"), clean.alias("b")
    # strict lexicographic (ts, id) order => each unordered pair exactly once
    pair_cond = (F.col("a._ts") < F.col("b._ts")) | (
        (F.col("a._ts") == F.col("b._ts")) & (F.col("a._id") < F.col("b._id"))
    )
    dv = F.col("b._v") - F.col("a._v")
    # exact microsecond diff, NTZ-safe (the funnel.py discipline:
    # unix_micros rejects TIMESTAMP_NTZ; unix_timestamp floors to seconds)
    ds = (
        F.expr("timestampdiff(MICROSECOND, a._ts, b._ts)").cast("double")
        / F.lit(1000000.0)
    )
    pairs = a.join(
        b, [F.col(f"a.{g}") == F.col(f"b.{g}") for g in groups] + [pair_cond]
    ).select(
        *[F.col(f"a.{g}").alias(g) for g in groups],
        F.signum(dv).cast("bigint").alias("_sgn"),
        F.when(ds > 0, dv / ds).alias("_slope"),
    )
    stats = pairs.groupBy(*groups).agg(
        F.sum("_sgn").cast("bigint").alias("s"),
        F.percentile("_slope", F.lit(0.5)).alias("_sen"),
    )
    # tie groups: per (group, value) count t -> sum t(t-1)(2t+5), exact
    dec = "decimal(38,0)"
    t = F.col("_t").cast(dec)
    ties = (
        clean.groupBy(*groups, "_v")
        .agg(F.count(F.lit(1)).alias("_t"))
        .groupBy(*groups)
        .agg(F.sum(t * (t - 1) * (2 * t + 5)).alias("_tie_num"))
    )
    n = F.col("n").cast(dec)
    var_num = (n * (n - 1) * (2 * n + 5) - F.col("_tie_num")).cast("double")
    var_s = var_num / F.lit(18.0)
    sizes = clean.groupBy(*groups).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    sd = F.sqrt(F.col("var_s"))
    z = (
        F.when(F.col("var_s") <= 0, F.lit(None).cast("double"))
        .when(F.col("s") > 0, (F.col("s") - 1).cast("double") / sd)
        .when(F.col("s") < 0, (F.col("s") + 1).cast("double") / sd)
        .otherwise(F.lit(0.0))
    )
    return (
        sizes.filter(F.col("n") >= 2)
        .join(stats, groups)
        .join(ties, groups)
        .withColumn("var_s", F.round(var_s, round_to))
        .select(
            *groups,
            "n",
            "s",
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
