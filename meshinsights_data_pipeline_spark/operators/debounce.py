"""Time-proximity event dedup (debounce).

Telemetry feeds repeat the same logical event — retry storms, heartbeat
chatter, double-fired triggers. Debounce keeps an event only when the
PREVIOUS event with the same key is further back than ``min_gap``
(or absent): `LAG` over (key, order) then a gap filter. One window
shuffle on the partition key, nothing else — the standard cleanup pass
upstream of sessionization, which would otherwise see phantom cycles.

Contract note: the gap compares to the previous RAW event, not the
previous KEPT one (a kept-relative debounce is inherently sequential —
each decision depends on the previous decision — and needs a running
state scan; the raw-relative form is the one-window idiom and the usual
telemetry semantic: a burst collapses to its first row because every
non-first row is close to its raw predecessor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def debounce(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    ts_col: str,
    min_gap_seconds: int,
) -> DataFrame:
    """Rows whose predecessor within ``partition_by`` (ordered by
    ``order_by``) is more than ``min_gap_seconds`` older, or absent.
    Columns pass through unchanged; one window shuffle on the key."""
    if min_gap_seconds <= 0:
        raise ValueError(f"min_gap_seconds must be positive, got {min_gap_seconds}")
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    prev = F.lag(F.col(ts_col)).over(w)
    # Gap math as an exact day-time INTERVAL comparison: a double cast
    # carries ~0.5us representation error near the epoch (can flip a
    # boundary pair vs an engine comparing exact intervals), and
    # unix_micros demands TIMESTAMP_LTZ — whose NTZ->LTZ conversion is
    # session-timezone- and DST-dependent. Subtracting the two NTZ
    # timestamps is integer microsecond arithmetic, timezone-free.
    gap = F.col(ts_col) - F.col("_prev_ts")
    return (
        df.withColumn("_prev_ts", prev)
        .filter(
            F.col("_prev_ts").isNull()
            | (gap > F.expr(f"INTERVAL {int(min_gap_seconds)} SECONDS"))
        )
        .drop("_prev_ts")
    )
