"""Watermarked stream-stream joins (SURVEY §2.10 north-star surface).

The batch interval join (operators/rangejoin.py) buckets intervals into
fixed-width time buckets so the range match becomes an equi-join.
Streaming needs the SAME rewrite for a second reason: Spark rejects
stream-stream joins without an equality predicate outright (state for a
pure theta join would require every row to meet every row), so the
bucket id doubles as the required equi-key. The event-time RANGE
constraint between the two watermarked columns then lets Spark prove
when buffered rows expire — without it, stream-stream join state grows
forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 86400,
    max_interval: str = "7 days",
    watermark: str = "0 seconds",
    on: list[str] | None = None,
) -> DataFrame:
    """Stream-stream inner join of point events to containing
    [start, end] intervals (inclusive bounds — batch interval_join
    parity), with state bounded by ``max_interval`` + ``watermark``.

    Mechanics: points map to their single ``bucket_seconds`` time
    bucket; intervals explode into every bucket they cover (so pick
    bucket_seconds near the typical interval length, exactly as in the
    batch operator); the join is an EQUI-join on bucket id (+ optional
    ``on`` key columns) with the exact range filter and the event-time
    constraint ``point <= start + max_interval`` — which must bound the
    longest possible interval, and is what lets Spark expire buffered
    state once the watermark passes.

    Left/right non-``on`` column names must be disjoint (alias first).
    """
    overlap = (set(left.columns) & set(right.columns)) - set(on or [])
    if overlap:
        raise ValueError(
            f"left/right column names must be disjoint; shared: {sorted(overlap)}"
        )
    b = F.lit(int(bucket_seconds))
    lw = (
        left.withWatermark(point_col, watermark)
        .withColumn("_b", F.floor(F.unix_timestamp(F.col(point_col)) / b))
    )
    rw = (
        right.withWatermark(start_col, watermark)
        .withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(start_col)) / b),
                    F.floor(F.unix_timestamp(F.col(end_col)) / b),
                )
            ),
        )
    )
    cond = (
        (lw["_b"] == rw["_b"])
        & (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(start_col) + F.expr(f"INTERVAL {max_interval}"))
        & (F.col(point_col) <= F.col(end_col))
    )
    for k in on or []:
        cond = cond & (lw[k] == rw[k])
    joined = lw.join(rw, cond).drop(rw["_b"]).drop(lw["_b"])
    if on:  # drop the duplicated right-side key columns
        for k in on:
            joined = joined.drop(rw[k])
    return joined
