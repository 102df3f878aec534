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
