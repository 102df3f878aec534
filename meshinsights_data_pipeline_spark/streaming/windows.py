"""Streaming windowed aggregations: session windows (W1 twin) and
tumbling 7-day windows (W3 twin) with watermarks for late data.

Design notes (100 TB / unbounded):
- ``session_window`` is Spark's native gap-based sessionization — state is
  scoped per (keys, session) and evicted once the watermark passes the
  session gap, so state size tracks ACTIVE sessions, not history.
- The weekly tumbling window uses ``window(ts, "7 days", startTime=...)``;
  ``startTime`` shifts the epoch-aligned grid so the boundaries land on
  Sundays 00:00 (epoch 1970-01-01 was a Thursday, so Sunday alignment needs
  a +3 days shift), reproducing the batch Sunday-week arithmetic
  (operators/weekly.py) without any per-row date math.
- Watermarks bound state AND define correctness for late rows: rows older
  than the watermark are dropped, which a batch backfill over the same data
  would instead include — the parity tests therefore feed in-order data.

Semantic delta vs batch W1 (documented, by design): the batch cycle id
increments on every STATE CHANGE of a state column (EPC sessionization);
``session_window`` sessions close on a TIME GAP. Equivalent labeling of
state-change runs on a stream needs transformWithStateInPandas /
applyInPandasWithState (see ``streaming_state_change_sessions`` note) —
gap-based sessions are the idiomatic Spark streaming surface and the one
promoted here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def streaming_session_window(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """W1 streaming twin: per-key session windows with a inactivity gap.

    Returns [*keys, session_start, session_end, cnt, median_value] — the
    same aggregate shape the batch per-cycle stats produce. State is evicted
    past the watermark; unbounded-input safe.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys, F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.median(value_col).alias("median_value"),
        )
        .select(
            *keys,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "cnt",
            "median_value",
        )
    )


def _weekly_window(ts: Column, start_time: str) -> Column:
    return F.window(ts, "7 days", "7 days", start_time)


def streaming_weekly_stats(
    stream: DataFrame,
    group_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 day",
    start_time: str = "0 minutes",
) -> DataFrame:
    """Tumbling 7-day windowed stats (A7 shape) over a stream.

    Default grid is epoch-aligned (Thursday weeks); see
    :func:`streaming_sunday_weekly_stats` for reference Sunday weeks.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            _weekly_window(F.col(ts_col), start_time).alias("w"),
            F.col(group_col),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg(value_col), 0).alias("mean_v"),
            F.round(F.median(value_col), 0).alias("med_v"),
            F.round(F.stddev_pop(value_col), 0).alias("sd"),
        )
        .select(
            F.col("w.start").alias("wk_start"),
            group_col,
            "cnt",
            "mean_v",
            "med_v",
            "sd",
        )
    )


def streaming_weekly_active_users(
    stream: DataFrame,
    user_col: str,
    ts_col: str = "ts",
    watermark: str = "1 day",
    start_time: str = "3 days",
    exact: bool = True,
) -> DataFrame:
    """Weekly distinct active users over a stream — the DAU/WAU and
    cohort-size building block. Returns [wk_start, active_users] per
    Sunday-aligned tumbling week (``start_time="3 days"`` — see
    :func:`streaming_sunday_weekly_stats`; pass "0 minutes" for
    epoch-aligned).

    ``exact=True`` chains two stateful operators — watermarked
    ``dropDuplicates`` on (window, user), then a windowed count — which
    Structured Streaming supports for event-time append chains; state is
    one row per (user, week) inside the watermark horizon. ``exact=False``
    swaps the dedup for ``approx_count_distinct`` (HLL): one stateful op,
    constant state per window — the unbounded-cardinality path.
    """
    wm = stream.withWatermark(ts_col, watermark)
    w = _weekly_window(F.col(ts_col), start_time).alias("w")
    if exact:
        deduped = wm.select(w, F.col(user_col), F.col(ts_col)).dropDuplicates(
            ["w", user_col]
        )
        counted = deduped.groupBy("w").agg(
            F.count(F.lit(1)).cast("bigint").alias("active_users")
        )
    else:
        counted = wm.groupBy(w).agg(
            F.approx_count_distinct(user_col).alias("active_users")
        )
    return counted.select(F.col("w.start").alias("wk_start"), "active_users")


def streaming_sunday_weekly_stats(
    stream: DataFrame,
    group_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 day",
) -> DataFrame:
    """W3 streaming twin: Sunday-aligned 7-day tumbling windows.

    1970-01-01 is a Thursday; shifting the window grid by +3 days puts
    boundaries on Sundays 00:00, matching the batch
    ``date_sub(next_day(ts,'SUN'),7)`` week key exactly.
    """
    return streaming_weekly_stats(
        stream, group_col, ts_col, value_col, watermark, start_time="3 days"
    )
