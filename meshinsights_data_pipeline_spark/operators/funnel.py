"""Funnel analysis: ordered multi-step conversion over an event log.

The classic product-analytics query (Amplitude/Mixpanel "funnels",
ClickHouse ``windowFunnel``): for an ordered list of step event types,
a user reaches step k iff they performed step k STRICTLY AFTER their
earliest qualifying step k-1 event. Expressed as k-1 join+min-aggregate
stages — every stage shuffles on the user key only, so at 100 TB the
funnel costs k user-cardinality hash aggregations off one events scan
(Catalyst reuses the scan; each stage's frame is |users|-sized, far
smaller than the log, and broadcast-eligible when the entry step is
selective). No windows over the full log, no per-user event arrays.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Per-user funnel progression: [user, _t1.._tk, step_reached].

    ``_ti`` is the earliest time the user completed step i given their
    step i-1 time (NULL once the funnel is abandoned); ``step_reached``
    counts completed steps. Strict ordering: an event at exactly the
    previous step's timestamp does NOT advance the funnel (same-instant
    batch events are not a conversion path).
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    cur = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t1"))
    )
    out = cur
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            df.filter(F.col(type_col) == step)
            .select(F.col(user_col), F.col(ts_col).alias("_ts"))
            .join(cur.select(user_col, f"_t{i - 1}"), user_col)
            .filter(F.col("_ts") > F.col(f"_t{i - 1}"))
            .groupBy(user_col)
            .agg(F.min("_ts").alias(f"_t{i}"))
        )
        out = out.join(nxt, user_col, "left")
        cur = nxt
    reached = sum(
        F.when(F.col(f"_t{i}").isNotNull(), 1).otherwise(0)
        for i in range(1, len(steps) + 1)
    )
    return out.withColumn("step_reached", reached.cast("bigint"))


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    sunday_weeks: bool = True,
) -> DataFrame:
    """Weekly cohort retention — funnel's sibling chart: group users by
    first-active week (their cohort), count how many are active again k
    weeks later. Returns [cohort_week, week_offset, users]; offset 0 is
    the cohort size, and users(offset k) <= users(0) by construction.

    Weeks are Sunday-start (the reference's W-SUN convention,
    operators.weekly.sunday_week_start) unless ``sunday_weeks=False``
    (Monday date_trunc). Shuffle shape: one distinct over (user, week)
    — activity-cardinality, the log's heavy hitters collapse map-side —
    then a user-keyed min + join and a (cohort, offset)-keyed count; no
    stage touches more than |users x active-weeks| rows.
    """
    from meshinsights_data_pipeline_spark.operators.weekly import (
        sunday_week_start,
    )

    wk = (
        sunday_week_start(F.col(ts_col))
        if sunday_weeks
        else F.date_trunc("week", F.col(ts_col)).cast("date")
    )
    active = df.select(F.col(user_col), wk.alias("wk")).distinct()
    cohorts = active.groupBy(user_col).agg(F.min("wk").alias("cohort_week"))
    return (
        active.join(cohorts, user_col)
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("users"))
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Cumulative funnel: [step, event_type, users] — users(step k) counts
    everyone whose ``step_reached >= k``, so the sequence is monotonically
    non-increasing (the standard funnel chart input). Always emits one row
    per declared step, with ``users=0`` for steps nobody reached (a funnel
    with no entrants is k zero rows, not an empty frame — matches the X44
    oracle, which likewise emits every step)."""
    times = funnel_times(df, user_col, ts_col, type_col, steps)
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("bigint").alias("step"),
                F.lit(s).alias("event_type"),
                F.when(F.col(f"_t{i + 1}").isNotNull(), 1)
                .otherwise(0)
                .alias("_hit"),
            )
            for i, s in enumerate(steps)
        ]
    )
    counted = (
        times.select(F.explode(rows).alias("r"))
        .groupBy(F.col("r.step").alias("step"), F.col("r.event_type").alias("event_type"))
        .agg(F.sum("r._hit").cast("bigint").alias("users"))
    )
    # Literal k-row frame (broadcast by size) guarantees every step appears
    # even when `times` is empty.
    step_rows = df.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)],
        "step bigint, event_type string",
    )
    return step_rows.join(counted, ["step", "event_type"], "left").select(
        "step", "event_type", F.coalesce("users", F.lit(0)).cast("bigint").alias("users")
    )


def state_transitions(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str | None = None,
    round_p: int = 6,
) -> DataFrame:
    """First-order state-transition matrix over per-entity event
    sequences — the Markov-chain view of a behavior log (product
    analytics "user flows"; reference sibling of the cycle
    sessionization in EPC:421-422, which segments on the SAME
    lag-over-entity-window shape this op counts on).

    Orders each entity's events by (ts, tiebreak) and counts
    (previous state -> state) adjacencies; ``p`` is the row-normalized
    transition probability. Returns
    [from_state, to_state, n, p] with n summing to (events - entities)
    and p summing to 1.0 per from_state (up to rounding).

    Scale shape: ONE window shuffle partitioned by entity (never a
    global sort), one (from, to) count aggregate at state-cardinality^2,
    and the row normalization joins against a states-sized total — all
    tiny after the first aggregate. Skewed entities cost what their
    event count costs; no driver-side work.
    """
    from pyspark.sql import Window

    order = [ts_col, tiebreak_col] if tiebreak_col else [ts_col]
    w = Window.partitionBy(entity_col).orderBy(*order)
    pairs = (
        df.select(
            F.col(entity_col),
            F.lag(F.col(state_col)).over(w).alias("from_state"),
            F.col(state_col).alias("to_state"),
        )
        .where(F.col("from_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wtot = Window.partitionBy("from_state")
    return pairs.select(
        "from_state",
        "to_state",
        "n",
        F.round(F.col("n") / F.sum("n").over(wtot), round_p).alias("p"),
    )


def last_touch_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    conversion: str = "purchase",
    touch: str = "click",
    lookback_hours: int = 24,
) -> DataFrame:
    """Last-touch conversion attribution: each conversion event is
    credited to the user's most recent ``touch`` event at-or-before it,
    within a ``lookback_hours`` window — the marketing-analytics sibling
    of funnel_counts (which measures aggregate stage flow; this assigns
    individual credit). Composed over :func:`operators.asof.asof_join`
    (the x16 machinery), which is exactly the backward-inclusive match
    attribution needs.

    Returns ``[conv_id, user, conv_ts, touch_id, gap_seconds]`` for
    EVERY conversion; conversions with no touch inside the lookback keep
    NULL touch/gap (dropping them would silently understate
    unattributed volume). Determinism: several touches at the same
    timestamp collapse to the min ``id_col`` BEFORE the join, so the
    attributed touch is a pure function of the data, not of partition
    order. ``touch_id`` keeps the id column's NATIVE type (string/UUID
    ids work — a forced integral cast would NULL them silently and
    report every conversion as unattributed).

    Scale shape: inherits asof_join's — one union + one entity-keyed
    ordered window, never a range self-join; the touch dedup is one
    map-side-combinable aggregate.
    """
    from meshinsights_data_pipeline_spark.operators.asof import asof_join

    conv = df.filter(F.col(type_col) == conversion).select(
        F.col(user_col),
        F.col(ts_col),
        F.col(id_col).alias("conv_id"),
    )
    touches = (
        df.filter(F.col(type_col) == touch)
        .groupBy(F.col(user_col), F.col(ts_col))
        .agg(F.min(id_col).alias("touch_id"))
    )
    j = asof_join(
        conv, touches, ts_col, [user_col], ["touch_id"], how="left"
    )
    # Exact microsecond arithmetic (the x69/x19 decode discipline), via
    # timestampdiff — works for TIMESTAMP and TIMESTAMP_NTZ alike and
    # never touches the session timezone (unix_micros rejects NTZ;
    # unix_timestamp floors EACH side to seconds while an epoch-diff
    # cast rounds the fractional difference — off-by-one-second
    # disagreements between engines). Micros diff + floor-div is exact.
    j = j.withColumn(
        "_gap_us",
        F.expr(f"timestampdiff(MICROSECOND, {ts_col}_asof, {ts_col})"),
    )
    gap = F.floor(F.col("_gap_us") / F.lit(1000000)).cast("bigint")
    in_window = F.col("_gap_us") <= F.lit(
        int(lookback_hours) * 3600 * 1000000
    )
    return j.select(
        F.col("conv_id"),
        F.col(user_col),
        F.col(ts_col).alias("conv_ts"),
        F.when(in_window, F.col("touch_id_asof")).alias("touch_id"),
        F.when(in_window, gap).alias("gap_seconds"),
    )


def top_event_paths(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    k_steps: int = 4,
    top_n: int = 20,
) -> DataFrame:
    """Most common event-type PATHS — the product-analytics "what do
    users actually do" query next to funnel_counts (which checks one
    prescribed order; this discovers the orders that exist). A path is
    the first ``k_steps`` event types of a (user, calendar-day) visit
    in (ts, id) order, joined with ``>``; returns the ``top_n`` paths
    as ``[path, n_sessions, rk]`` ordered by count DESC then path ASC
    (a total order, so both engines cut the same rows).

    Determinism: the step order is the total order (ts, id) — same-
    timestamp events order by id, so the rendered path is a pure
    function of the data. A NULL event type renders as '' (array_join
    would otherwise DROP the element, silently shortening the path and
    shifting later steps — the chat_render NULL-turn rule).

    Scale shape (the chat_render pattern): ONE shuffle on (user, day)
    into a window for the first-k filter and the same partitioning
    reused by the path aggregate (sort_array over structs — no second
    exchange); path counting is one map-side-combinable aggregate over
    |visits| rows; the global cut is orderBy+limit (TakeOrdered), never
    a single-partition sort. No corpus^2 anywhere.
    """
    from pyspark.sql import Window

    day = F.col(ts_col).cast("date")
    w = Window.partitionBy(F.col(user_col), day).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    firstk = (
        df.select(
            F.col(user_col),
            day.alias("_d"),
            F.col(ts_col),
            F.col(id_col),
            F.col(type_col),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= int(k_steps))
    )
    paths = firstk.groupBy(user_col, "_d").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col(ts_col), F.col(id_col), F.col(type_col)
                        )
                    )
                ),
                lambda s: F.coalesce(s[type_col], F.lit("")),
            ),
            ">",
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    top = counts.orderBy(
        F.col("n_sessions").desc(), F.col("path").asc()
    ).limit(int(top_n))
    rk = F.row_number().over(
        Window.orderBy(F.col("n_sessions").desc(), F.col("path").asc())
    )
    return top.select("path", "n_sessions", rk.cast("bigint").alias("rk"))


def linear_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    conversion: str = "purchase",
    touch: str = "click",
    lookback_hours: int = 24,
    round_to: int = 6,
) -> DataFrame:
    """Multi-touch LINEAR attribution — the equal-split sibling of
    :func:`last_touch_attribution`: every ``touch`` event at-or-before
    a conversion within the lookback window shares the conversion's
    credit equally (credit = 1/k for k qualifying touches). The model
    marketing uses when the whole path matters, not just the closer.

    Returns ``[conv_id, user, touch_id, t_ts, credit]`` — one row per
    (conversion, qualifying touch); conversions with NO qualifying
    touch are absent (their full credit is unattributed; count them via
    an anti-join on conv_id, or use last_touch_attribution's NULL-row
    contract). ``credit`` is ROUND(1/k) with k an exact count, so both
    engines emit identical shares.

    Scale shape: the touch-conversion pairing is an equality join on
    (user, lookback-sized time bucket) — each conversion probes at most
    2 buckets, so the pair space is bounded by per-user touch density
    within the lookback, never all history; the per-conversion count is
    one conv-keyed window over the (small) qualified-pair frame.
    """
    lb_s = int(lookback_hours) * 3600
    lb_us = lb_s * 1_000_000
    conv = df.filter(F.col(type_col) == conversion).select(
        F.col(user_col),
        F.col(ts_col).alias("_c_ts"),
        F.col(id_col).alias("conv_id"),
    )
    tch = df.filter(F.col(type_col) == touch).select(
        F.col(user_col),
        F.col(ts_col).alias("t_ts"),
        F.col(id_col).alias("touch_id"),
    )
    b = F.lit(lb_s)
    cb = conv.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor((F.unix_timestamp(F.col("_c_ts")) - b) / b),
                F.floor(F.unix_timestamp(F.col("_c_ts")) / b),
            )
        ),
    )
    tb = tch.withColumn("_b", F.floor(F.unix_timestamp(F.col("t_ts")) / b))
    gap_us = F.expr("timestampdiff(MICROSECOND, t_ts, _c_ts)")
    qualified = (
        cb.join(tb, [user_col, "_b"])
        .filter((gap_us >= 0) & (gap_us <= F.lit(lb_us)))
        .drop("_b")
    )
    from pyspark.sql import Window

    k = F.count(F.lit(1)).over(Window.partitionBy("conv_id"))
    return qualified.select(
        "conv_id",
        F.col(user_col),
        "touch_id",
        "t_ts",
        F.round(F.lit(1.0) / k, round_to).alias("credit"),
    )


def step_decay_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    conversion: str = "purchase",
    touch: str = "click",
    lookback_hours: int = 24,
    halflife_hours: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """Time-decay attribution with STEP-halving weights — completing
    the attribution family (x86 last-touch: all credit to the closer;
    x99 linear: equal split; this: recency-weighted split). Each touch
    within the lookback weighs ``2^-floor(gap / halflife)`` — a full
    half-life elapsed halves the weight — and a conversion's credit
    splits proportionally: ``credit_i = w_i / sum(w)``.

    Step-halving instead of continuous ``exp(-gap/tau)`` is a
    DELIBERATE determinism choice, not a simplification: the exponent
    is an exact integer, so every weight is a dyadic rational that
    IEEE doubles represent EXACTLY in both engines, the per-conversion
    weight sum is exact regardless of aggregation order (bounded
    fractional span — lookback/halflife few bits), and the final
    division is one IEEE op — whereas libm ``exp``/``pow`` with
    fractional exponents differ in last ulps across runtimes, which a
    value-hash comparison cannot absorb. The step model is also what
    several ad platforms actually ship.

    Returns ``[conv_id, user, touch_id, t_ts, w, credit]`` per
    qualifying (conversion, touch); conversions with no touch are
    absent (x99's contract). Scale shape: identical to
    linear_attribution — (user, lookback-bucket) equality join, 2
    probes per conversion, one conv-keyed window over qualified pairs.
    """
    lb_s = int(lookback_hours) * 3600
    lb_us = lb_s * 1_000_000
    hl_us = int(halflife_hours) * 3600 * 1_000_000
    conv = df.filter(F.col(type_col) == conversion).select(
        F.col(user_col),
        F.col(ts_col).alias("_c_ts"),
        F.col(id_col).alias("conv_id"),
    )
    tch = df.filter(F.col(type_col) == touch).select(
        F.col(user_col),
        F.col(ts_col).alias("t_ts"),
        F.col(id_col).alias("touch_id"),
    )
    b = F.lit(lb_s)
    cb = conv.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor((F.unix_timestamp(F.col("_c_ts")) - b) / b),
                F.floor(F.unix_timestamp(F.col("_c_ts")) / b),
            )
        ),
    )
    tb = tch.withColumn("_b", F.floor(F.unix_timestamp(F.col("t_ts")) / b))
    gap_us = F.expr("timestampdiff(MICROSECOND, t_ts, _c_ts)")
    qualified = (
        cb.join(tb, [user_col, "_b"])
        .filter((gap_us >= 0) & (gap_us <= F.lit(lb_us)))
        .drop("_b")
        .withColumn(
            "w",
            F.pow(F.lit(2.0), -F.floor(gap_us / F.lit(hl_us)).cast("double")),
        )
    )
    from pyspark.sql import Window

    wsum = F.sum("w").over(Window.partitionBy("conv_id"))
    return qualified.select(
        "conv_id",
        F.col(user_col),
        "touch_id",
        "t_ts",
        "w",
        F.round(F.col("w") / wsum, round_to).alias("credit"),
    )


def funnel_step_latency(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    round_to: int = 6,
) -> DataFrame:
    """How LONG each funnel transition takes — the timing companion of
    :func:`funnel_counts` (which says how many convert; this says how
    fast): for every step k >= 2, the distribution of ``t_k - t_{k-1}``
    over users who reached step k. Returns ``[step, event_type,
    n_users, p50_seconds, p90_seconds]`` — the numbers a growth team
    reads as "median user purchases 2h after clicking; the slowest
    decile takes a day".

    Latencies are exact timestampdiff micros converted to seconds by
    ONE double division; p50/p90 are exact interpolated percentiles
    (Spark F.percentile == DuckDB quantile_cont, the x61/x95 parity
    surface), rounded to ``round_to``.

    Scale shape: inherits funnel_times' k-1 user-keyed join+min stages;
    the latency aggregate adds one map-side projection and one
    (tiny, k-1-group) exact-percentile aggregate over |converted users|
    rows per step.
    """
    times = funnel_times(df, user_col, ts_col, type_col, steps)
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("bigint").alias("step"),
                F.lit(steps[i - 1]).alias("event_type"),
                (
                    F.expr(
                        f"timestampdiff(MICROSECOND, _t{i - 1}, _t{i})"
                    ).cast("double")
                    / F.lit(1_000_000.0)
                ).alias("lat_s"),
            )
            for i in range(2, len(steps) + 1)
        ]
    )
    lat = (
        times.select(F.explode(rows).alias("r"))
        .select("r.step", "r.event_type", "r.lat_s")
        .filter(F.col("lat_s").isNotNull())
    )
    return lat.groupBy("step", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.percentile("lat_s", F.lit(0.5)), round_to).alias(
            "p50_seconds"
        ),
        F.round(F.percentile("lat_s", F.lit(0.9)), round_to).alias(
            "p90_seconds"
        ),
    )
