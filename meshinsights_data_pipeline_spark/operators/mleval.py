"""Classifier / LLM-judge evaluation metrics: ROC-AUC, calibration
(ECE + Brier), and Cohen's kappa inter-rater agreement.

The training-data pipeline's model-facing readouts, completing the
statistical family (abtest.py decides whether an ARM differs; these
score whether a MODEL's scores are any good): a quality classifier
gating a pretraining mix is judged by its AUC, a judge model emitting
confidences is trusted only as far as its calibration, and two
annotators (or an LLM judge vs a human rater) agree only as far as
kappa says once chance agreement is discounted. Reference scope: the
reference's curated re-check / upgrade-only merge loop
(src/analytics/power_analysis.py:182-214) consumes exactly this kind
of detector-quality signal; the metrics themselves are the public
textbook forms (Fawcett 2006 for AUC; Naeini et al. 2015 for ECE;
Cohen 1960).

Cross-engine determinism (the abtest/mann-whitney discipline):

- AUC is the rank-sum identity AUC = (R_pos - n_pos(n_pos+1)/2) /
  (n_pos * n_neg) over the pooled average-rank ranking — ties resolve
  to the trapezoidal AUC exactly. Ranks never materialize per row:
  the (group, score) COUNT table carries DOUBLED average ranks
  (2*cum + t + 1) as exact DECIMAL(38,0) integers, so the numerator
  2*R_pos - n_pos(n_pos+1) is an exact integer and the ONLY float
  step is one final IEEE division, rounded once.
- Kappa is rewritten over exact integers: with diag the agreeing
  count, n the total, and sum_rc = sum_k row_k * col_k,
  kappa = (n*diag - sum_rc) / (n^2 - sum_rc) — both operands exact
  DECIMAL(38,0), ONE IEEE division, rounded once. po/pe are reported
  as their own single divisions.
- Calibration bins assign by the clamp-before-cast rule on the FIXED
  [0,1] score domain (the ks_value_counts ANSI-overflow lesson);
  per-bin score sums fold raw scores through DECIMAL(38,12) (bounded
  domain — no pivot needed: terms quantize identically in any
  engine), Brier folds the IEEE-squared residuals the same way, and
  the ECE sum folds its per-bin IEEE terms through DECIMAL(38,18) so
  summation order cannot matter.

Scale shape: every operator is ONE map-side-combinable aggregate over
the corpus scan (score-count cells, bin moments, or the rater
contingency) MATERIALIZED where it feeds a diamond, followed by
tiny-frame algebra — count-table cardinality, never corpus-sized. The
count/bin tables are mergeable sufficient statistics, so the
streaming twins (streaming/mleval.py) fold micro-batches into the
same state and recompute bit-identical reports.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.barrier import (
    materialize as _materialize,
)

_DEC0 = "decimal(38,0)"
_DEC12 = "decimal(38,12)"
_DEC18 = "decimal(38,18)"


def auc_cell_counts(
    df: DataFrame,
    group_by: Sequence[str],
    label_col: str,
    score_col: str,
) -> DataFrame:
    """The ``[*group_by, _v, _pos, _neg]`` count stage of
    :func:`roc_auc`, shared with the streaming twin so the two can
    never drift (the mw_cell_counts discipline): the boolean label
    coercion and the NULL/NaN domain guards live here, in exactly one
    place. Counts are exact integers, so cells SUM across
    micro-batches — the mergeable sufficient statistic."""
    groups = list(group_by)
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("boolean")
    keep = s.isNotNull() & ~F.isnan(s) & y.isNotNull()
    for g in groups:
        keep = keep & F.col(g).isNotNull()
    return (
        df.filter(keep)
        .select(*groups, s.alias("_v"), y.cast("int").alias("_y"))
        .groupBy(*groups, "_v")
        .agg(
            F.sum("_y").cast("bigint").alias("_pos"),
            F.sum(F.lit(1) - F.col("_y")).cast("bigint").alias("_neg"),
        )
    )


def auc_from_counts(
    cells: DataFrame,
    group_by: Sequence[str],
    round_to: int = 6,
) -> DataFrame:
    """:func:`roc_auc` from a pre-aggregated
    ``[*group_by, _v, _pos, _neg]`` cell table (pass it materialized —
    it feeds the rank window and the final aggregate in one lineage,
    which Spark would otherwise replay per consumer)."""
    groups = list(group_by)
    t_cnt = F.col("_pos") + F.col("_neg")
    w = (
        Window.partitionBy(*groups)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(t_cnt).over(w), F.lit(0))
    # doubled average rank of the tie group: 2*cum + t + 1 (integer)
    rank2 = (F.lit(2) * cum + t_cnt + 1).cast(_DEC0)
    agg = cells.withColumn("_r2", rank2).groupBy(*groups).agg(
        F.sum("_pos").cast("bigint").alias("n_pos"),
        F.sum("_neg").cast("bigint").alias("n_neg"),
        F.sum(F.col("_pos").cast(_DEC0) * F.col("_r2"))
        .cast(_DEC0)
        .alias("_r2p"),
    )
    n_p, n_n = F.col("n_pos"), F.col("n_neg")
    # 2*R_pos - n_pos(n_pos+1) = 2*U_pos; AUC = U_pos / (n_pos*n_neg)
    u2 = F.col("_r2p") - (n_p.cast(_DEC0) * (n_p + 1)).cast(_DEC0)
    auc = F.when(
        (n_p > 0) & (n_n > 0),
        F.round(
            u2.cast("double")
            / (F.lit(2.0) * (n_p.cast(_DEC0) * n_n).cast("double")),
            round_to,
        )
        + F.lit(0.0),
    )
    return agg.select(*groups, "n_pos", "n_neg", auc.alias("auc"))


def roc_auc(
    df: DataFrame,
    group_by: Sequence[str],
    label_col: str,
    score_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group ROC-AUC of ``score_col`` against the boolean
    ``label_col`` — the threshold-free quality score of a ranking
    classifier (the probability a random positive outscores a random
    negative, ties counted half): the one-number readout for "is this
    quality/toxicity/judge scorer worth gating the mix on".

    Computed by the exact rank-sum identity (equals trapezoidal AUC
    including tie handling — the Mann-Whitney U statistic normalized
    by n_pos*n_neg; see the module docstring for the integer-exact
    algebra). Returns ``[*group_by, n_pos, n_neg, auc]`` with ``auc``
    NULL when either class is absent (no ranking is defined — the
    degenerate class SURFACES instead of reading as auc=0). Rows with
    NULL group keys, NULL labels, or NULL/NaN scores are excluded up
    front. Truthy label coercion is Spark boolean-cast semantics
    (0/1, true/false).

    Scale shape: ONE (group, score) count aggregate (map-side
    combinable, distinct-score cardinality) is the only corpus-sized
    stage, MATERIALIZED; the pooled-rank window runs per group over
    the distinct-score spine, and the final aggregate emits |groups|
    rows. At 100 TB, quantize scores upstream (the mw ``buckets``
    rule) if distinct-score cardinality itself is unbounded.
    """
    cells = _materialize(
        auc_cell_counts(df, group_by, label_col, score_col)
    )
    return auc_from_counts(cells, group_by, round_to=round_to)


def calibration_bins(
    df: DataFrame,
    group_by: Sequence[str],
    score_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Per-(group, bin) reliability table of a [0,1] confidence score
    against the boolean outcome: ``[*group_by, bin, n, n_pos,
    confidence, accuracy]`` where ``confidence`` is the bin's mean
    score and ``accuracy`` its positive rate — the reliability-diagram
    data :func:`calibration_report` reduces to ECE. Empty bins produce
    no row (a dense grid is |groups| x bins of zeros at scale; outer-
    join a bin spine downstream if the zeros matter).

    Bin assignment is the fixed-domain equal-width rule on [0,1] with
    clamp-before-cast (scores outside [0,1] — a mis-scaled logit —
    land in the edge bins instead of raising ANSI overflow, the
    ks_value_counts lesson). ``confidence`` means the RAW scores, not
    the clamped ones: a mis-scaled feed then shows confidence (and
    ECE/MCE downstream) OUTSIDE [0,1] instead of being silently
    laundered into a plausible-looking number — clamp upstream if the
    out-of-range mass is intentional. The bin sums are exact-integer
    counts and DECIMAL(38,12)-folded score sums — the mergeable state
    the streaming twin snapshots.

    Scale shape: ONE map-side-combinable aggregate over the corpus
    scan; nothing downstream exceeds |groups| x bins rows.
    """
    if bins < 1:
        raise ValueError(f"bins must be positive, got {bins}")
    groups = list(group_by)
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("boolean")
    keep = s.isNotNull() & ~F.isnan(s) & y.isNotNull()
    for g in groups:
        keep = keep & F.col(g).isNotNull()
    k = F.lit(int(bins))
    cv = F.greatest(F.lit(0.0), F.least(F.lit(1.0), s))
    bucket = F.least(
        k - 1, F.floor(cv * k).cast("int")
    )
    agg = (
        df.filter(keep)
        .select(*groups, bucket.alias("bin"), s.alias("_s"),
                y.cast("int").alias("_y"))
        .groupBy(*groups, "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("_y").cast("bigint").alias("n_pos"),
            F.sum(F.col("_s").cast(_DEC12)).alias("_ssum"),
        )
    )
    return agg.select(
        *groups,
        "bin",
        "n",
        "n_pos",
        (F.col("_ssum").cast("double") / F.col("n")).alias("confidence"),
        (F.col("n_pos").cast("double") / F.col("n")).alias("accuracy"),
    )


def calibration_report(
    df: DataFrame,
    group_by: Sequence[str],
    score_col: str,
    label_col: str,
    bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Per-group calibration summary of a [0,1] confidence score:
    ``[*group_by, n, ece, mce, brier]`` —

        ece   = sum_b (n_b / n) * |accuracy_b - confidence_b|
        mce   = max_b |accuracy_b - confidence_b|
        brier = mean (score - outcome)^2

    the standard is-the-judge-trustworthy triple (Naeini et al. 2015's
    binned ECE/MCE over the :func:`calibration_bins` table; Brier the
    binning-free proper score beside them). An over-confident judge
    shows accuracy < confidence in the top bins; ECE/MCE quantify it,
    Brier catches miscalibration the bin means average away. Bin
    confidences mean the RAW scores (only the bin ASSIGNMENT clamps),
    so a mis-scaled feed reports ECE/MCE outside [0,1] instead of
    being laundered — see :func:`calibration_bins`.

    Determinism: confidence/accuracy are single IEEE divisions of the
    folded bin moments; each ECE term is three IEEE ops in fixed
    order folded through DECIMAL(38,18) (order-free sum); Brier folds
    the per-row squared residual (one subtract, one multiply — both
    operands exact halves of the domain) through DECIMAL(38,12);
    everything rounds once. NULL/NaN-guarded like the bins table.

    Scale shape: the bins aggregate is the only corpus-sized stage
    (Brier's residual moments fold in the SAME pass — the corpus is
    scanned once); the report reduces |groups| x bins rows.
    """
    groups = list(group_by)
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("boolean")
    keep = s.isNotNull() & ~F.isnan(s) & y.isNotNull()
    for g in groups:
        keep = keep & F.col(g).isNotNull()
    k = F.lit(int(bins))
    if bins < 1:
        raise ValueError(f"bins must be positive, got {bins}")
    cv = F.greatest(F.lit(0.0), F.least(F.lit(1.0), s))
    bucket = F.least(k - 1, F.floor(cv * k).cast("int"))
    yd = y.cast("int").cast("double")
    resid = (s - yd) * (s - yd)
    per_bin = (
        df.filter(keep)
        .select(*groups, bucket.alias("_b"), s.alias("_s"),
                y.cast("int").alias("_y"), resid.alias("_r2"))
        .groupBy(*groups, "_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.sum("_y").cast("bigint").alias("_np"),
            F.sum(F.col("_s").cast(_DEC12)).alias("_ssum"),
            F.sum(F.col("_r2").cast(_DEC12)).alias("_rsum"),
        )
    )
    conf = F.col("_ssum").cast("double") / F.col("_n")
    acc = F.col("_np").cast("double") / F.col("_n")
    gap = F.abs(acc - conf)
    report = per_bin.groupBy(*groups).agg(
        F.sum("_n").cast("bigint").alias("n"),
        F.sum((F.col("_n").cast("double") * gap).cast(_DEC18)).alias("_e"),
        F.max(gap).alias("_mce"),
        F.sum("_rsum").alias("_brier_sum"),
    )
    return report.select(
        *groups,
        "n",
        (F.round(F.col("_e").cast("double") / F.col("n"), round_to)
         + F.lit(0.0)).alias("ece"),
        (F.round(F.col("_mce"), round_to) + F.lit(0.0)).alias("mce"),
        (F.round(
            F.col("_brier_sum").cast("double") / F.col("n"), round_to
        ) + F.lit(0.0)).alias("brier"),
    )


def cohens_kappa(
    df: DataFrame,
    group_by: Sequence[str],
    rater_a_col: str,
    rater_b_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group Cohen's kappa between two categorical raters over the
    same items — chance-corrected agreement (Cohen 1960), the standard
    "does the LLM judge agree with the human rater beyond luck"
    readout (raw agreement po is inflated whenever one label
    dominates; kappa discounts the agreement two independent raters
    with these marginals would reach anyway):

        po    = sum_k diag_k / n
        pe    = sum_k row_k * col_k / n^2
        kappa = (po - pe) / (1 - pe)
              = (n * diag - sum_rc) / (n^2 - sum_rc)   (exact integers)

    Returns ``[*group_by, n, po, pe, kappa]`` with ``kappa`` NULL when
    pe = 1 (both raters constant on the same label — agreement is
    vacuous, not perfect). Rows with a NULL group key or NULL in
    EITHER rater are excluded (a half-labeled item has no agreement
    cell); disagreeing label VOCABULARIES need no alignment — the
    contingency marginals cover the union automatically.

    Determinism: the rewrite keeps every operand an exact
    DECIMAL(38,0) integer (n*diag - sum_rc and n^2 - sum_rc), so
    kappa is ONE IEEE division rounded once; po and pe are each one
    exact-integer division, rounded.

    Scale shape: ONE (group, a, b) contingency aggregate (map-side
    combinable, label-pair cardinality) MATERIALIZED (it feeds the
    diagonal, both marginals, and the total — the chi2_independence
    diamond); everything after is |labels|-sized algebra per group.
    """
    groups = list(group_by)
    keep = F.col(rater_a_col).isNotNull() & F.col(rater_b_col).isNotNull()
    for g in groups:
        keep = keep & F.col(g).isNotNull()
    cells = _materialize(
        df.filter(keep)
        .groupBy(*groups, F.col(rater_a_col).alias("_a"),
                 F.col(rater_b_col).alias("_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    )
    rows_ = cells.groupBy(*groups, "_a").agg(
        F.sum("_c").cast("bigint").alias("_r")
    )
    cols_ = cells.groupBy(*groups, "_b").agg(
        F.sum("_c").cast("bigint").alias("_k")
    )
    tot = cells.groupBy(*groups).agg(
        F.sum("_c").cast("bigint").alias("_n"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_c"))
              .otherwise(F.lit(0)))
        .cast("bigint")
        .alias("_diag"),
    )
    # sum_k row_k * col_k over the union label set: join the marginals
    # on the label (labels missing from a side contribute 0 and drop
    # out of the inner join). LEFT-join the per-group sums back — a
    # group whose raters share NO label has an empty marginal join and
    # sum_rc = 0 (pe = 0, kappa = po), and must SURFACE, not vanish.
    src = rows_.join(
        cols_.withColumnRenamed("_b", "_a"), [*groups, "_a"]
    ).groupBy(*groups).agg(
        F.sum(F.col("_r").cast(_DEC0) * F.col("_k")).cast(_DEC0)
        .alias("_sum_rc")
    )
    j = tot.join(src, groups, "left")
    sum_rc = F.coalesce(F.col("_sum_rc"), F.lit(0).cast(_DEC0))
    n0 = F.col("_n").cast(_DEC0)
    num = (n0 * F.col("_diag") - sum_rc).cast("double")
    den = (n0 * F.col("_n") - sum_rc).cast("double")
    return j.select(
        *groups,
        F.col("_n").alias("n"),
        (F.round(F.col("_diag").cast("double") / F.col("_n"), round_to)
         + F.lit(0.0)).alias("po"),
        (F.round(
            sum_rc.cast("double")
            / (n0 * F.col("_n")).cast("double"),
            round_to,
        ) + F.lit(0.0)).alias("pe"),
        F.when(
            den > 0, F.round(num / den, round_to) + F.lit(0.0)
        ).alias("kappa"),
    )
