"""Distribution-free bootstrap confidence intervals for group means —
the Poisson bootstrap, deterministic and engine-exact.

The experimentation family reports point statistics (means, rates, U,
delta) and normal-approximation z/t intervals; this operator puts a
CONFIDENCE INTERVAL on any group mean with no distributional
assumption at all — the readout for skewed/heavy-tailed metrics
(revenue, latency, tokens-per-doc) where a +/-1.96*se band is fiction.
Reference scope: the reference's curated re-check loop
(src/analytics/power_analysis.py:182-214) gates on detector statistics;
a bootstrap band is the standard way to attach uncertainty to such a
gate without parametric assumptions.

Method (Poisson bootstrap — the distributed form of resampling; Chamandy
et al. 2012, "Estimating uncertainty for massive data streams"): each
row enters resample ``b`` with weight w ~ Poisson(1), approximating the
multinomial resample without any global coordination — every (row, b)
weight is a pure function of (id, b), so the whole procedure is ONE
map-side explode, embarrassingly parallel, and REPRODUCIBLE: no RNG
state, no partition-order dependence, identical resamples in any
engine.

Cross-engine determinism:
- w derives from u = md5_int60(id || '|' || b) / 2^60 (the x40/x55
  deterministic-sampling hash surface; 2^60 is an exactly-representable
  double) compared against the Poisson(1) CDF as SHARED 12-decimal
  literals (the BENFORD_EXPECTED discipline — never each engine's
  exp()); weights cap at 6 (P(w > 6) ~ 8e-5 — part of the operator's
  definition, shared by the oracle).
- each replicate mean folds w*v (ONE IEEE multiply) through
  DECIMAL(38,12) and divides once by the exact integer weight sum.
- the CI bounds are exact interpolated percentiles (quantile_cont
  semantics — the A2/x61 parity surface) over the replicate means;
  value-at-rank is tie-order-independent, interpolation is fixed-order
  single IEEE ops, rounded once.

Scale shape: ONE corpus scan exploded x(B+1) map-side (CPU, not
shuffle — the per-(group, b) combine collapses everything to
|groups| x (B+1) partial rows BEFORE the exchange); replicate ranking
runs per group over B rows. ``b`` is the 100 TB lever: cost is B x CPU
on the scan, state is |groups| x B. The (group, b) -> (sum wv, sum w)
moment table is a mergeable sufficient statistic (exact decimal/integer
sums), so a streaming twin can fold micro-batches into the same state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.barrier import (
    materialize as _materialize,
)
from meshinsights_data_pipeline_spark.operators.dedup import md5_int60

#: Poisson(1) CDF at k = 0..5, pre-rounded to 12 decimals and embedded
#: as LITERALS in both engines (weights cap at 6 above the last one).
POISSON1_CDF = [
    "0.367879441171",
    "0.735758882343",
    "0.919698602929",
    "0.981011843124",
    "0.996340153173",
    "0.999405815182",
]

_TWO_POW_60 = float(1 << 60)


def poisson_weight(u) -> "F.Column":
    """Poisson(1) weight from a uniform u in [0, 1): the smallest k with
    u < CDF[k], else 6. u must be an exact function of the row identity
    (the md5_int60 surface) for reproducibility."""
    w = F.lit(6)
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]).cast("double"), F.lit(k)).otherwise(w)
    return w


def bootstrap_mean_ci(
    df: DataFrame,
    group_by: Sequence[str],
    value_col: str,
    id_col: str,
    b: int = 100,
    alpha: float = 0.05,
    round_to: int = 6,
) -> DataFrame:
    """Per-group mean with a two-sided (1 - alpha) percentile-bootstrap
    confidence interval: ``[*group_by, n, b_reps, mean, ci_lo, ci_hi]``.

    ``n`` is the group's sample size, ``b_reps`` the number of realized
    replicates (a replicate whose Poisson weights all drew 0 — possible
    for tiny groups — is dropped deterministically, so b_reps <= b and
    the percentile runs over the realized set; in the practically
    unreachable ~0.368^b case where NO replicate realizes, the group
    still appears with b_reps = 0 and NULL ci bounds). ``mean`` is the plain
    sample mean — computed INSIDE the same pass as pseudo-replicate
    b = -1 with weight 1, so the corpus is scanned exactly once with no
    diamond. Rows with NULL group keys, NULL ids, or NULL/NaN values
    are excluded up front.

    ``b`` trades CPU for CI resolution (percentile granularity ~1/b);
    ``alpha`` picks the band (0.05 -> 2.5th/97.5th percentiles). Both
    are part of the result's definition — record them with the output.
    """
    if b < 2:
        raise ValueError(f"b must be >= 2, got {b}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    groups = list(group_by)
    v = F.col(value_col).cast("double")
    keep = (
        v.isNotNull() & ~F.isnan(v) & F.col(id_col).isNotNull()
    )
    for g in groups:
        keep = keep & F.col(g).isNotNull()
    base = df.filter(keep).select(
        *groups, F.col(id_col).cast("string").alias("_id"), v.alias("_v")
    )
    reps = base.select(
        *groups,
        "_id",
        "_v",
        F.explode(F.sequence(F.lit(-1), F.lit(int(b) - 1))).alias("_b"),
    )
    u = md5_int60(
        F.concat_ws("|", F.col("_id"), F.col("_b").cast("string"))
    ).cast("double") / F.lit(_TWO_POW_60)
    w = F.when(F.col("_b") == -1, F.lit(1)).otherwise(poisson_weight(u))
    dec12 = "decimal(38,12)"
    moments = (
        reps.select(*groups, "_b", w.alias("_w"), "_v")
        .groupBy(*groups, "_b")
        .agg(
            F.sum((F.col("_w") * F.col("_v")).cast(dec12)).alias("_s"),
            F.sum("_w").cast("bigint").alias("_n_w"),
            F.count(F.lit(1)).cast("bigint").alias("_rows"),
        )
    )
    # |groups| x (B+1) rows, but its lineage is the exploded corpus
    # scan — and it feeds the sample row, the rank window, and the four
    # percentile bracket filters. MATERIALIZE (the diamond-barrier
    # lesson) so the explode runs once.
    means = _materialize(
        moments.filter(F.col("_n_w") > 0).select(
            *groups,
            "_b",
            "_rows",
            (F.col("_s").cast("double") / F.col("_n_w")).alias("_mean"),
        )
    )
    sample = means.filter(F.col("_b") == -1).select(
        *groups,
        F.col("_rows").alias("n"),
        F.col("_mean").alias("_sample_mean"),
    )
    boot = means.filter(F.col("_b") >= 0)
    wspec = Window.partitionBy(*groups).orderBy("_mean")
    ranked = boot.select(
        *groups,
        "_mean",
        F.row_number().over(wspec).alias("_rk"),
        F.count(F.lit(1)).over(Window.partitionBy(*groups)).alias("_nb"),
    )

    def _pct(q: float, out: str) -> DataFrame:
        pos = (F.col("_nb") - 1).cast("double") * F.lit(float(q))
        lo_rk = (F.floor(pos) + 1).cast("int")
        hi_rk = (F.ceil(pos) + 1).cast("int")
        frac = pos - F.floor(pos)
        lo = ranked.filter(F.col("_rk") == lo_rk).select(
            *groups,
            F.col("_mean").alias("_lo"),
            F.col("_nb").alias("_nb_lo"),
            frac.alias("_frac"),
        )
        hi = ranked.filter(F.col("_rk") == hi_rk).select(
            *groups, F.col("_mean").alias("_hi")
        )
        return lo.join(hi, groups).select(
            *groups,
            F.col("_nb_lo").alias("b_reps" if out == "ci_lo" else "_nb_drop"),
            (
                F.round(
                    F.col("_lo")
                    + (F.col("_hi") - F.col("_lo")) * F.col("_frac"),
                    round_to,
                )
                + F.lit(0.0)
            ).alias(out),
        )

    lo_q = alpha / 2.0
    hi_q = 1.0 - alpha / 2.0
    ci_lo = _pct(lo_q, "ci_lo")
    ci_hi = _pct(hi_q, "ci_hi").drop("_nb_drop")
    # LEFT joins (ADVICE r16): a group whose every replicate drew total
    # Poisson weight 0 (~0.368^b — practically unreachable, but possible
    # for tiny groups) must surface as b_reps=0 with NULL bounds, not
    # silently vanish from the output.
    return (
        sample.join(ci_lo, groups, "left")
        .join(ci_hi, groups, "left")
        .select(
            *groups,
            "n",
            F.coalesce(F.col("b_reps"), F.lit(0).cast("bigint")).alias(
                "b_reps"
            ),
            (F.round(F.col("_sample_mean"), round_to) + F.lit(0.0)).alias(
                "mean"
            ),
            "ci_lo",
            "ci_hi",
        )
    )
