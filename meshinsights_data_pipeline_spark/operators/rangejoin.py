"""Interval (range) join — match point events to containing [start, end]
intervals without a theta-join pair explosion.

Spark plans a raw ``l.ts BETWEEN r.start AND r.end`` join as
BroadcastNestedLoopJoin (|L| x |R| comparisons). The scale shape is
bucketization: intervals explode into the fixed-width time buckets they
cover, points map to their single bucket, and the match becomes an
EQUI-join on bucket id followed by the exact range filter. Cost is
O(|L| + |R| x avg_buckets_per_interval) shuffled on bucket id — each
(point, interval) candidate pair is generated exactly once, since a point
lives in exactly one bucket.

Pick ``bucket_seconds`` near the typical interval length: too small blows
up the interval explode, too large recreates the pair explosion inside a
bucket (AQE's skew split is the backstop for hot buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 7 * 86400,
) -> DataFrame:
    """Inner-join left point rows to every right interval containing them.

    Left/right column names must be disjoint (alias before calling).
    Inclusive on both interval bounds.
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"left/right column names must be disjoint; shared: {sorted(overlap)}")
    b = F.lit(bucket_seconds)
    lb = left.withColumn("_b", F.floor(F.unix_timestamp(F.col(point_col)) / b))
    rb = right.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b),
                F.floor(F.unix_timestamp(F.col(end_col)) / b),
            )
        ),
    )
    return (
        lb.join(rb, "_b")
        .filter(F.col(point_col).between(F.col(start_col), F.col(end_col)))
        .drop("_b")
    )
