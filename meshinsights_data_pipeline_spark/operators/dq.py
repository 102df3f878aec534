"""Declarative data-quality rule checks — the validation report every
ingest pipeline runs before promoting a batch.

Reference anchor: the reference validates eagerly per-processor
(src/core/processor.py:79-110 prerequisite/output hooks, raising on the
first violation). This operator is the data-plane complement the Spark
engine adds: instead of failing on the first bad row, ONE aggregation
pass scores every rule over every row and returns the violation summary —
the shape a 100 TB quality gate needs (you quarantine a feed on
violation RATES, not on the existence of one bad row).

Scale shape: each rule is a boolean column expression, so the whole
report is map-side conditional sums feeding a single global aggregate
(map-side combine, one shuffle of one row per rule); the per-rule rows
are unpivoted from the 1-row aggregate with explode — the
stats.profile_numeric pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Benford's-law expected first-digit proportions, log10(1 + 1/d) for
#: d = 1..9, pre-rounded to 12 decimals and embedded as LITERALS in both
#: engines (never recomputed via each engine's libm — Spark's log10 and
#: DuckDB's disagree in the final ulp on some inputs, the x33 finding).
BENFORD_EXPECTED: dict[int, str] = {
    1: "0.301029995664",
    2: "0.176091259056",
    3: "0.124938736608",
    4: "0.096910013008",
    5: "0.079181246048",
    6: "0.066946789631",
    7: "0.057991946978",
    8: "0.051152522447",
    9: "0.045757490561",
}


def benford_deviation(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Benford's-law first-digit conformance per group — the classic
    fabricated-/corrupted-feed detector for naturally-occurring amounts
    (prices, durations, counts spanning orders of magnitude): a feed
    whose first-digit distribution departs sharply from log10(1 + 1/d)
    was truncated, synthesized, unit-swapped, or filtered upstream.
    Complements dq_checks (row-level rules) with a distribution-level
    signature check.

    Per group: ``chi2 = n * sum_d (p_d - e_d)^2 / e_d`` over digits
    1..9 (digits the group never produced contribute their full e_d
    weight — the grid is the 9-digit spine, not the observed digits)
    and ``max_dev = max_d |p_d - e_d|``. Returns
    ``[group, n, chi2, max_dev]``. Excluded rows (no first-digit
    support): NULL/NaN/infinite values, values that round to 0 at 6
    decimals, values with |v| >= 1e12 (outside the DECIMAL(18,6)
    domain — under ANSI the cast would THROW, and the wider
    DECIMAL(38,6) rendering is not engine-parity-safe above 1e22 where
    Spark renders the shortest repr while DuckDB renders the exact
    binary expansion; real Benford domains — prices, durations, counts
    — live far below), and NULL group keys (a NULL-keyed group would
    fall out of the null-unsafe spine join and score maximal deviation).

    Cross-engine determinism: the first digit is extracted from the
    DECIMAL(18,6) string rendering — probe-verified bit-identical
    between Spark and DuckDB, including the 0.000000 underflow case —
    never from floor(log10(v)) (libm log10 differs in the final ulp at
    power-of-ten boundaries, the x33 finding). Within |v| < 1e12 the
    leading digit cannot flip between the engines' renderings: every
    power of 10 below 1e22 is an exactly-representable double, so no
    value sits within half an ulp of a decade boundary. e_d are shared
    12-decimal literals (BENFORD_EXPECTED); p_d is one exact-integer
    division; the 9 chi-square terms fold through DECIMAL(38,18) so the
    sum order cannot matter; max over doubles is an exact comparison.

    Scale shape: one map-side digit projection, one (group, digit)
    count (map-side combinable, at most 9 rows per group out of the
    shuffle), then a broadcast 9-row digit spine — the corpus is
    scanned once and never re-shuffled.
    """
    obs = benford_digit_counts(df, group_col, value_col)
    return benford_from_counts(obs, round_to=round_to).withColumnRenamed(
        "g", group_col
    )


def benford_digit_counts(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """The ``[g, _d, _c]`` digit-count stage of
    :func:`benford_deviation`, shared with the streaming twin so the
    two can never drift: the domain guards (NULL group, NULL/NaN/Inf
    and |v| >= 1e12 values) live here, in exactly one place. The range
    filter runs BEFORE the decimal projection — under ANSI mode an
    out-of-range cast throws rather than nulling."""
    v = F.col(value_col).cast("double")
    digit = F.regexp_extract(
        F.abs(v).cast("decimal(18,6)").cast("string"), "[1-9]", 0
    )
    return (
        df.filter(
            F.col(group_col).isNotNull()
            & v.isNotNull()
            & ~F.isnan(v)
            & (F.abs(v) < F.lit(1.0e12))
        )
        .select(F.col(group_col).alias("g"), digit.alias("_d"))
        .filter(F.col("_d") != "")
        .groupBy("g", F.col("_d").cast("int").alias("_d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    )


def benford_from_counts(obs: DataFrame, round_to: int = 6) -> DataFrame:
    """:func:`benford_deviation` from a pre-aggregated ``[g, _d, _c]``
    digit-count table — the mergeable-sufficient-statistic entry point
    the streaming twin folds into (digit counts sum across
    micro-batches, so the recomputed report has FULL cross-batch
    parity). Returns ``[g, n, chi2, max_dev]``."""
    sizes = obs.groupBy("g").agg(F.sum("_c").cast("bigint").alias("_n"))
    spine = F.array(
        *[
            F.struct(
                F.lit(d).alias("_d"),
                F.lit(e).cast("decimal(14,12)").cast("double").alias("_e"),
            )
            for d, e in BENFORD_EXPECTED.items()
        ]
    )
    grid = (
        sizes.select("g", "_n", F.explode(spine).alias("_s"))
        .select("g", "_n", "_s._d", "_s._e")
        .join(obs, ["g", "_d"], "left")
    )
    p = F.coalesce(F.col("_c"), F.lit(0)).cast("double") / F.col("_n")
    dev = p - F.col("_e")
    term = (dev * dev / F.col("_e")).cast("decimal(38,18)")
    return grid.groupBy("g").agg(
        F.max("_n").cast("bigint").alias("n"),
        F.round(
            F.max("_n").cast("double") * F.sum(term).cast("double"), round_to
        ).alias("chi2"),
        F.round(F.max(F.abs(dev)), round_to).alias("max_dev"),
    )


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Chi-square test of independence + Cramér's V between two
    categorical columns — the association detector for feed forensics
    (is `source` independent of `label`? did the sharding key leak into
    the split? is missingness correlated with the supplier?), the
    categorical sibling of the numeric drift family (PSI/KS watch one
    distribution move; this scores the JOINT structure of two).

        chi2 = sum over cells (o - e)^2 / e,   e = row_tot * col_tot / N
        V    = sqrt( chi2 / (N * min(R-1, C-1)) )

    Returns ONE row ``[n, r_levels, c_levels, dof, chi2, cramers_v]``
    (dof = (R-1)(C-1); V is NULL when either column has a single level —
    no association is defined). Rows with a NULL in either column are
    excluded (route NULLs to a sentinel level upstream to test
    missingness itself — usually the interesting question).

    Cross-engine determinism: each cell's term is rewritten over exact
    integers — (o - e)^2/e = (o*N - r*c)^2 / (N*r*c) — with the
    difference o*N - r*c computed in DECIMAL(38,0) (exact; fits to
    N ~ 1e19 against DECIMAL 38's 1e38 ceiling), then ONE IEEE square,
    ONE IEEE division per cell in fixed order, terms folded through
    DECIMAL(38,18) so the sum order cannot matter; chi2 and V round
    once, and V divides the UNROUNDED chi2.

    Scale shape: one (a, b) count aggregate (map-side combinable,
    |A x B| rows out of the shuffle) MATERIALIZED once (it feeds the
    row marginals, the column marginals, AND the term fold — the
    diamond-barrier lesson); both marginal tables and the scalar totals
    broadcast back onto the cell frame. The corpus is scanned once;
    everything after is contingency-table-sized.
    """
    from meshinsights_data_pipeline_spark.operators.barrier import (
        materialize as _materialize,
    )

    cells = _materialize(chi2_cell_counts(df, col_a, col_b))
    return chi2_from_counts(cells, round_to=round_to)


def chi2_cell_counts(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """The ``[_a, _b, _o]`` contingency-cell stage of
    :func:`chi2_independence`, shared with the streaming twin so the
    two can never drift: the NULL-level exclusion lives here, in
    exactly one place. Counts are exact integers, so cells SUM across
    micro-batches — the mergeable sufficient statistic."""
    return (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("_a"), F.col(col_b).alias("_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_o"))
    )


def chi2_from_counts(cells: DataFrame, round_to: int = 6) -> DataFrame:
    """:func:`chi2_independence` from a pre-aggregated ``[_a, _b, _o]``
    cell table — the mergeable-sufficient-statistic entry point the
    streaming twin folds into (cells sum across micro-batches, FULL
    cross-batch parity). The cell frame feeds the row marginals, the
    column marginals, AND the term fold: pass it materialized/
    checkpointed (as :func:`chi2_independence` and the twin both do)
    or Spark replays its lineage once per consumer."""
    rows = cells.groupBy("_a").agg(F.sum("_o").cast("bigint").alias("_r"))
    cols = cells.groupBy("_b").agg(F.sum("_o").cast("bigint").alias("_c"))
    tot = cells.agg(
        F.sum("_o").cast("bigint").alias("_n"),
        F.count_distinct("_a").cast("bigint").alias("_ra"),
        F.count_distinct("_b").cast("bigint").alias("_cb"),
    )
    dec0, dec18 = "decimal(38,0)", "decimal(38,18)"
    dnum = (
        F.col("_o").cast(dec0) * F.col("_n")
        - F.col("_r").cast(dec0) * F.col("_c")
    ).cast("double")
    denom = (
        F.col("_n").cast(dec0) * F.col("_r") * F.col("_c")
    ).cast("double")
    term = ((dnum * dnum) / denom).cast(dec18)
    agg = (
        cells.join(F.broadcast(rows), "_a")
        .join(F.broadcast(cols), "_b")
        .crossJoin(F.broadcast(tot))
        .groupBy()
        .agg(
            F.max("_n").cast("bigint").alias("n"),
            F.max("_ra").cast("bigint").alias("r_levels"),
            F.max("_cb").cast("bigint").alias("c_levels"),
            F.sum(term).cast("double").alias("_chi2"),
        )
    )
    mindof = F.least(F.col("r_levels") - 1, F.col("c_levels") - 1)
    return agg.select(
        "n",
        "r_levels",
        "c_levels",
        ((F.col("r_levels") - 1) * (F.col("c_levels") - 1))
        .cast("bigint")
        .alias("dof"),
        F.round(F.col("_chi2"), round_to).alias("chi2"),
        F.when(
            mindof >= 1,
            F.round(
                F.sqrt(
                    F.col("_chi2")
                    / (F.col("n").cast(dec0) * mindof).cast("double")
                ),
                round_to,
            ),
        ).alias("cramers_v"),
    )


def dq_checks(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate named boolean rules over every row in one pass.

    ``rules`` maps rule name -> Column predicate that is True for rows
    SATISFYING the rule. A NULL predicate result (e.g. a comparison over
    a NULL value) counts as a violation — the conservative reading a
    quality gate wants, and made explicit here so engines that differ on
    NULL boolean semantics cannot drift.

    Returns [rule, n_rows, n_violations, violation_frac] with one row
    per rule, violation_frac a single IEEE division of exact counts.

    Empty input: every rule reports n_rows=0, n_violations=0 (the SUMs
    coalesce — never NULL), violation_frac=0.0. An empty feed therefore
    PASSES a pure violation-rate threshold by definition; a gate that
    must also reject empty batches has the explicit n_rows column for
    exactly that check (``n_rows > 0 AND violation_frac < t``), rather
    than relying on NULL-comparison behavior to fail closed.
    """
    if not rules:
        raise ValueError("dq_checks needs at least one rule")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
    for i, (_, pred) in enumerate(rules.items()):
        aggs.append(
            F.sum(
                F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
            ).cast("bigint").alias(f"_v{i}")
        )
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col("_n").alias("n_rows"),
                F.coalesce(F.col(f"_v{i}"), F.lit(0)).cast("bigint").alias(
                    "n_violations"
                ),
                F.when(
                    F.col("_n") > 0,
                    F.col(f"_v{i}").cast("double") / F.col("_n"),
                ).otherwise(F.lit(0.0)).alias("violation_frac"),
            )
            for i, name in enumerate(rules)
        ]
    )
    return one.select(F.explode(rows).alias("r")).select(
        "r.rule", "r.n_rows", "r.n_violations", "r.violation_frac"
    )
