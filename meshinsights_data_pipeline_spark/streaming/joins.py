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
    how: str = "inner",
    oversize: str = "truncate",
) -> DataFrame:
    """Stream-stream join of point events to containing [start, end]
    intervals (inclusive bounds — batch interval_join parity), with state
    bounded by ``max_interval`` + ``watermark``.

    Mechanics: points map to their single ``bucket_seconds`` time
    bucket; intervals explode into every bucket they cover (so pick
    bucket_seconds near the typical interval length, exactly as in the
    batch operator); the join is an EQUI-join on bucket id (+ optional
    ``on`` key columns) with the exact range filter and the event-time
    constraint ``point <= start + max_interval`` — which must bound the
    longest possible interval, and is what lets Spark expire buffered
    state once the watermark passes.

    ``how``: ``"inner"`` (default) or ``"left_outer"``. Left-outer emits
    points with NO containing interval (the "unmatched telemetry" report)
    with NULLs in every right-side column. Outer rows are emitted only
    once the watermark proves no future interval can still match, so
    they surface one watermark-delay after the point's bucket expires —
    on a bounded ``availableNow`` run, a final batch must advance the
    watermark past ``point + max_interval`` for trailing unmatched points
    to be flushed (standard Spark outer-join semantics).

    Interval hygiene (fail-soft, since a stream cannot raise on data):
    rows with ``end < start`` are malformed — they are DROPPED from the
    right side before bucketing (``F.sequence`` would otherwise emit a
    descending bucket list: wasted state, silently zero matches).
    Intervals LONGER than ``max_interval`` cannot be fully honored —
    matches past ``start + max_interval`` are outside the state-expiry
    constraint. ``oversize`` picks the policy: ``"truncate"`` (default)
    keeps the interval but only matches points within ``max_interval`` of
    its start; ``"drop"`` excludes the whole interval so the output never
    contains a silently-partial match set.

    Left/right non-``on`` column names must be disjoint (alias first).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    if oversize not in ("truncate", "drop"):
        raise ValueError(f"oversize must be 'truncate' or 'drop', got {oversize!r}")
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
    right_valid = right.filter(F.col(end_col) >= F.col(start_col))
    if oversize == "drop":
        right_valid = right_valid.filter(
            F.col(end_col) <= F.col(start_col) + F.expr(f"INTERVAL {max_interval}")
        )
    rw = (
        right_valid.withWatermark(start_col, watermark)
        .withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(start_col)) / b),
                    # Truncate the bucket fan-out at the state horizon too:
                    # buckets past start + max_interval can never produce a
                    # within-constraint match, only state.
                    F.floor(
                        F.unix_timestamp(
                            F.least(
                                F.col(end_col),
                                F.col(start_col)
                                + F.expr(f"INTERVAL {max_interval}"),
                            )
                        )
                        / b
                    ),
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
    joined = lw.join(rw, cond, how).drop(rw["_b"]).drop(lw["_b"])
    if on:  # drop the duplicated right-side key columns
        for k in on:
            joined = joined.drop(rw[k])
    return joined
