"""Cycle sessionization (W1): label consecutive constant-state runs.

Reference semantics: "Cycle is an index ... successive measures where the
stage is constant" (Requirements/ExampleAiCode.md:131; ExamplePipelineCode.md:26,421-422).
A new cycle starts whenever the state column changes between consecutive
rows, ordered chronologically within a device/partition key.

Spark-first: lag + change-flag + running sum over a Window. Never relies on
frame order (the reference's implicit chronological precondition,
ExamplePipelineCode.md:229-230) — ordering is explicit in the window spec,
with a tiebreak column for deterministic results on equal timestamps.

Scale: the window partitions by the device key, so a 100 TB telemetry table
shuffles once on (partition_keys) and each device's series is processed
within one task. Skewed devices are handled by AQE skew splitting only if the
window is rewritten per-range; in practice device series are bounded
(~130k rows/device-quarter, Requirements/requirements.md:42).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    state_col: str,
    order_by: Sequence[str | Column],
    partition_by: Sequence[str | Column] = (),
    cycle_col: str = "cycle",
) -> DataFrame:
    """Add a ``cycle_col`` that increments whenever ``state_col`` changes.

    The first row of each partition gets cycle 1 (the change flag is 1 because
    lag is null and we use null-safe inequality).
    """
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
    else:
        w = Window.partitionBy().orderBy(*order_by)
    prev = F.lag(F.col(state_col)).over(w)
    # Null-safe: first row (lag null) counts as a change -> cycles start at 1.
    change = (~prev.eqNullSafe(F.col(state_col))).cast("int")
    running = F.sum(change).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(cycle_col, running)


def sessionize_by_gap(
    df: DataFrame,
    ts_col: str,
    gap_seconds: int,
    partition_by: Sequence[str | Column],
    tiebreak: Sequence[str | Column] = (),
    session_col: str = "session",
) -> DataFrame:
    """Idle-gap sessionization (the web-analytics classic, and the batch
    twin of streaming/windows.py's ``session_window`` sessionizer): a new
    session starts when the gap to the entity's PREVIOUS event exceeds
    ``gap_seconds``. Sessions are numbered 1..k per entity in time order.

    Same shape as ``sessionize`` (lag + boundary flag + running sum over
    ONE entity-partitioned window — a single shuffle on the entity key,
    never a global sort); the boundary predicate is a time delta instead
    of a state change. Equal timestamps are ordered by ``tiebreak`` for
    determinism; a gap of EXACTLY ``gap_seconds`` stays in-session
    (boundary is strict ``>``, matching Spark's session_window semantics
    where an event inside [start, start+gap] extends the window).
    """
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    order = [F.col(ts_col), *tiebreak]
    w = Window.partitionBy(*partition_by).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # interval arithmetic, not epoch casts: works for TIMESTAMP and
    # TIMESTAMP_NTZ alike and never touches the session timezone (the
    # debounce.py discipline)
    new_session = (
        prev_ts.isNull()
        | (
            F.col(ts_col) - prev_ts
            > F.expr(f"INTERVAL {int(gap_seconds)} SECONDS")
        )
    ).cast("int")
    running = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(session_col, running)


def session_metrics(
    df: DataFrame,
    ts_col: str,
    gap_seconds: int,
    partition_by: Sequence[str],
    tiebreak: Sequence[str | Column] = (),
    round_to: int = 6,
) -> DataFrame:
    """Per-entity session-quality metrics over idle-gap sessions — the
    engagement report sessionization exists to feed: session count,
    bounce count/rate (a bounce = a single-event session), and average
    session dwell. Returns ``[*partition_by, n_sessions, n_bounces,
    bounce_rate, avg_dwell_micros]``.

    Determinism discipline: dwell is exact timestampdiff micros per
    session (NTZ-safe, no per-side second flooring — the x86 rule);
    ``avg_dwell_micros`` is the BIGINT truncating division of the exact
    dwell total (Spark ``div`` == DuckDB HUGEINT ``//``, both truncate
    toward zero); ``bounce_rate`` is ONE IEEE division of two exact
    integers, rounded to ``round_to``.

    Scale shape: inherits sessionize_by_gap's single entity-keyed
    window shuffle; both aggregates reuse the same entity partitioning
    ((entity, session) nests inside entity, so Catalyst needs no second
    exchange), and the output is |entities| rows.
    """
    keys = list(partition_by)
    sess = sessionize_by_gap(
        df, ts_col, gap_seconds, keys, tiebreak=tiebreak
    )
    per = sess.groupBy(*keys, "session").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(ts_col).alias("_t0"),
        F.max(ts_col).alias("_t1"),
    ).withColumn(
        "_dwell_us", F.expr("timestampdiff(MICROSECOND, _t0, _t1)")
    )
    n_sessions = F.count(F.lit(1)).cast("bigint")
    n_bounces = F.sum(F.when(F.col("_n") == 1, 1).otherwise(0)).cast("bigint")
    return per.groupBy(*keys).agg(
        n_sessions.alias("n_sessions"),
        n_bounces.alias("n_bounces"),
        F.round(n_bounces / n_sessions, round_to).alias("bounce_rate"),
        F.expr("CAST(SUM(_dwell_us) div COUNT(1) AS BIGINT)").alias(
            "avg_dwell_micros"
        ),
    )
