"""CUSUM changepoint detection — per-key temporal drift alarms.

The drift family so far compares DISTRIBUTIONS between populations
(x88 PSI, x63 token TV distance, x96 centroid cosine); this watches a
single keyed series IN TIME and raises the classic Page (1954) CUSUM
alarm when the level shifts — the telemetry-monitoring primitive for
"this sensor/stage/source changed behavior at time t", upstream of any
root-cause query.

Spark-first design note: the textbook recurrence ``S+_i = max(0,
S+_{i-1} + d_i)`` looks sequential (per-row loop / UDF territory), but
it has an exact closed form over prefix sums::

    S+_n = cumsum_n - min(cumsum_0 .. cumsum_n)      (cumsum_0 = 0)

i.e. the one-sided CUSUM is the distance from the running minimum of
the cumulative drift. Both terms are O(1)-amortized growing ROWS
frames over ONE entity-keyed shuffle — no recursion, no Python, no
second pass. (Proof: induction — subtracting the running min is
exactly the "reset to 0 at the lowest point so far" the max(0, ·)
clamp performs.)

Cross-engine determinism: drifts quantize to DECIMAL(18,6) and fold in
DECIMAL (exact, order-independent given the (ts, id) total order);
the two statistics cast to DOUBLE once and round to 6dp; alarms
compare the ROUNDED statistic to the threshold so both engines decide
borderline rows identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_changepoints(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    id_col: str,
    target: float,
    slack: float = 0.5,
    threshold: float = 5.0,
) -> DataFrame:
    """Two-sided CUSUM over each key's series in (ts, id) order.

    Per row: ``s_plus`` accumulates upward drift ``max(0, prev +
    (x - target - slack))``, ``s_minus`` downward drift ``max(0, prev +
    (target - slack - x))``; ``alarm_up`` / ``alarm_down`` flag rows
    where the ROUNDED statistic exceeds ``threshold``. ``target`` is
    the in-control level and ``slack`` the half-dead-band (both in
    value units, supplied by the caller — classic CUSUM practice is
    target = historical mean, slack = 0.5 sigma, threshold = 4-5
    sigma; computing them from the same window being tested would let
    a large shift contaminate its own baseline).

    Returns ``[*key_cols, id, ts, value, s_plus, s_minus, alarm_up,
    alarm_down]`` for every row with a non-NULL, non-NaN value (the
    stats-family guard: NaN would poison every prefix sum after it).

    Ordering is the total order ``(ts, id)`` — prefix sums over a
    non-total order make tied rows' statistics partition-order-
    dependent, the same trap as the x91 ROWS frames.

    Scale shape: ONE entity-keyed shuffle into a sort-ordered window;
    the cumulative SUM and cumulative MIN/MAX are running aggregates
    (O(1) amortized per row, no per-row rescans). A key costs its row
    count; alarms project map-side. 100 TB tier: this is already the
    minimal plan — one shuffle, two running frames; for billions of
    keys partition count is the only knob.
    """
    clean = _cusum_clean(df, ts_col, key_cols, value_col, id_col,
                         target, slack)
    scored = _cusum_exact(clean, ts_col, key_cols, id_col)
    return _cusum_round(scored, ts_col, key_cols, value_col, id_col,
                        threshold)


def _cusum_clean(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    id_col: str,
    target: float,
    slack: float,
) -> DataFrame:
    """NULL/NaN-guarded rows with the exact DECIMAL(18,6) drift terms
    ``_dp = x - target - slack`` and ``_dm = target - slack - x``."""
    v = F.col(value_col).cast("double")
    return df.filter(v.isNotNull() & ~F.isnan(v)).select(
        *key_cols,
        F.col(id_col),
        F.col(ts_col),
        v.alias(value_col),
        (v.cast("decimal(18,6)") - F.lit(float(target) + float(slack)).cast(
            "decimal(18,6)")).alias("_dp"),
        (F.lit(float(target) - float(slack)).cast("decimal(18,6)")
         - v.cast("decimal(18,6)")).alias("_dm"),
    )


def _cusum_exact(
    clean: DataFrame,
    ts_col: str,
    key_cols: list[str],
    id_col: str,
    carry_p: str | None = None,
    carry_m: str | None = None,
) -> DataFrame:
    """Append exact DECIMAL ``_sp`` / ``_sm`` statistic columns.

    ``carry_p`` / ``carry_m`` name optional per-row DECIMAL(38,6)
    columns holding the statistic carried in from history BEFORE this
    frame (the streaming twin's state; NULL/absent = 0). The carry
    folds into the closed form exactly: seeding the recurrence with
    s0 >= 0 equals prepending a virtual row of drift s0, so
    ``S_i = cumsum_i - least(0, runmin_i, -s0)`` — still two running
    frames, still exact decimal algebra, so streamed scores are
    bit-identical to the batch operator over the full history.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_p = F.sum("_dp").over(w)
    cum_m = F.sum("_dm").over(w)
    # min over cumsum_0..cumsum_n: the j=0 empty prefix contributes 0,
    # so clamp the running min at 0 with least()
    zero = F.lit(0).cast("decimal(38,6)")
    floor_p = F.least(zero, F.min(cum_p).over(w))
    floor_m = F.least(zero, F.min(cum_m).over(w))
    if carry_p is not None:
        floor_p = F.least(floor_p, -F.coalesce(F.col(carry_p), zero))
    if carry_m is not None:
        floor_m = F.least(floor_m, -F.coalesce(F.col(carry_m), zero))
    return clean.withColumn("_sp", cum_p - floor_p).withColumn(
        "_sm", cum_m - floor_m
    )


def _cusum_round(
    scored: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Project the public rounded/flagged schema from exact ``_sp``/``_sm``."""
    s_plus = F.round(F.col("_sp").cast("double"), 6)
    s_minus = F.round(F.col("_sm").cast("double"), 6)
    thr = F.lit(float(threshold))
    return scored.select(
        *key_cols,
        F.col(id_col),
        F.col(ts_col),
        F.col(value_col),
        s_plus.alias("s_plus"),
        s_minus.alias("s_minus"),
        (s_plus > thr).alias("alarm_up"),
        (s_minus > thr).alias("alarm_down"),
    )
