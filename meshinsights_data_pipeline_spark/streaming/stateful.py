"""Stateful streaming sessionization: the TRUE W1 twin.

The batch cycle id (operators/sessionize.py, EPC semantics) increments on
every STATE CHANGE of a state column — not on a time gap — so the faithful
streaming version needs custom per-key state, which is exactly what
``applyInPandasWithState`` provides (SURVEY §2.11 U4 / §2.10 note).

State per key: (last_state_value, cycle_counter). Each micro-batch's rows
are sorted by event time and walked once in pandas; the counter continues
across batches, so a run spanning two micro-batches keeps ONE cycle id —
the property the gap-based ``session_window`` variant cannot express.

Ordering caveat (inherent to streaming): rows arriving in a later batch
with earlier timestamps than already-processed rows would be labeled out of
order. Feed batches in event-time order (e.g. time-partitioned sources) or
reconcile with the batch operator downstream; the parity test uses a
bounded in-order stream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)


def _drop_late_rows(
    batch: pd.DataFrame, ts_col: str, state: GroupState
) -> pd.DataFrame:
    """Filter rows behind the current watermark. Spark does NOT do this
    for applyInPandasWithState — its watermark only drives event-time
    timeouts (probed by test_streaming_ttl_watermark_drops_late_events)
    — so the TTL'd operators enforce the standard late-data contract
    here. Without it, a late event landing after its key's state expired
    would be processed against FRESH state (a debounce re-emit, a funnel
    restart), breaking the monotone-expiry semantics the TTL documents.
    A watermark of 0 (first batch, nothing observed yet) filters nothing.
    """
    wm_ms = state.getCurrentWatermarkMs()
    if wm_ms <= 0 or batch.empty:
        return batch
    return batch[batch[ts_col].astype("int64") >= wm_ms * 1_000_000]


def streaming_state_change_sessions(
    stream: DataFrame,
    keys: list[str],
    state_col: str,
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Label consecutive constant-``state_col`` runs per key with a cycle id
    that survives micro-batch boundaries.

    Output: input columns + ``cycle`` (long, starts at 1 per key — batch
    sessionize parity).

    No TTL option on purpose: dropping a key's state forgets its cycle
    COUNTER, and a returning key would restart at cycle 1 — duplicating
    ids already emitted for that key. A deployment that must bound state
    should make keys naturally finite instead (e.g. key by
    (entity, day)), which retires old state without id collisions.
    """
    out_schema = StructType(
        list(stream.schema.fields) + [StructField("cycle", LongType())]
    )
    # The saved state field mirrors the caller's state column type — a
    # hardcoded StringType would mis-encode int stage codes (which the batch
    # sessionize supports) or compare restored-string vs raw value.
    state_schema = StructType(
        [
            StructField("last_state", stream.schema[state_col].dataType),
            StructField("cycle", LongType()),
        ]
    )
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    field_names = [f.name for f in stream.schema.fields]

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_state, cycle = state.get
        else:
            last_state, cycle = None, 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        cycles = []
        for s in batch[state_col]:
            if last_state is None or s != last_state:
                cycle += 1
                last_state = s
            cycles.append(cycle)
        out = batch[field_names].copy()
        out["cycle"] = pd.Series(cycles, dtype="int64")
        # numpy scalars (int64 etc. from the pandas walk) don't round-trip
        # through the state encoder for non-string state columns.
        if hasattr(last_state, "item"):
            last_state = last_state.item()
        state.update((last_state, cycle))
        yield out

    return (
        stream.groupBy(*keys)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_funnel(
    stream: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    state_ttl_seconds: int | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Cross-batch funnel progression — the streaming twin of
    ``operators.funnel.funnel_times``: per-user state carries the
    completion time of each reached step, so a funnel whose steps arrive
    in DIFFERENT micro-batches still converts (the property a per-batch
    join pipeline cannot express).

    Emits [user, step_reached] whenever a batch ADVANCES the user's
    funnel; downstream keeps ``max(step_reached)`` per user. Semantics
    mirror the batch operator exactly: a step-k event counts iff it is
    STRICTLY after the recorded step-(k-1) time, and an event can
    complete at most one step (strict ordering makes double-completion
    impossible in batch too — parity-tested). Same ordering caveat as
    ``streaming_state_change_sessions``: feed batches in event-time
    order or reconcile downstream.

    State is one row of k epoch-nano longs per ACTIVE funnel user —
    bounded by funnel entrants, not event volume. For unbounded user
    populations pass ``state_ttl_seconds`` (event-time timeout, requires
    the ``watermark``): once the watermark passes last_event + TTL, a
    quiet user's partial funnel is dropped at the next timeout-processing
    micro-batch, and a return after that restarts from step one — the
    conversion-window semantic (a funnel allowing unbounded
    time-to-convert needs unbounded state by definition). Engine note:
    timeouts fire only for groups WITHOUT data in a batch, so a user
    whose return lands before any timeout-processing batch still
    completes against their pre-expiry state.

    WARNING — enabling TTL changes which EVENTS are processed, not just
    which state expires: events behind the current watermark are
    DISCARDED (dropped entirely, a late funnel step vanishes) — with
    TTL off, every event is processed regardless of lateness. Pick
    ``watermark`` to cover your stream's real out-of-orderness. Engine
    note: Spark does NOT auto-filter late input for
    applyInPandasWithState (its watermark only drives timeouts — probed
    by test_streaming_ttl_watermark_drops_late_events), so THIS OPERATOR
    enforces the drop via ``state.getCurrentWatermarkMs()``. Without
    that, a late event arriving after its user's state timed out would
    silently restart the funnel at step one — the drop keeps expiry
    monotone: once the conversion window closes, it stays closed.
    """
    k = len(steps)
    if k < 2:
        raise ValueError("a funnel needs at least 2 steps")
    out_schema = StructType(
        [
            StructField("user", stream.schema[user_col].dataType),
            StructField("step_reached", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField(f"t{i + 1}", LongType()) for i in range(k)]
    )

    use_ttl = state_ttl_seconds is not None
    if use_ttl and state_ttl_seconds <= 0:
        raise ValueError(f"state_ttl_seconds must be positive, got {state_ttl_seconds}")

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if use_ttl and state.hasTimedOut:
            state.remove()  # conversion window closed; partial funnel dropped
            return
        times: list[Any] = list(state.get) if state.exists else [None] * k
        batch = pd.concat(list(pdfs), ignore_index=True)
        if use_ttl:
            batch = _drop_late_rows(batch, ts_col, state)
        if batch.empty:
            return
        batch = batch.sort_values(ts_col, kind="mergesort")
        advanced = False
        last_ns = None
        for ts, et in zip(batch[ts_col], batch[type_col]):
            t = int(ts.value)  # epoch nanos
            last_ns = t
            for i, s in enumerate(steps):
                if times[i] is not None or et != s:
                    continue
                if i == 0 or (times[i - 1] is not None and t > times[i - 1]):
                    times[i] = t
                    advanced = True
                break  # an event matches at most its first incomplete step
        if advanced:
            state.update(tuple(times))
        if use_ttl and (advanced or state.exists) and last_ns is not None:
            state.setTimeoutTimestamp(
                last_ns // 1_000_000 + int(state_ttl_seconds) * 1000
            )
        if advanced:
            reached = sum(1 for t in times if t is not None)
            yield pd.DataFrame({"user": [key[0]], "step_reached": [reached]})

    src = stream.withWatermark(ts_col, watermark) if use_ttl else stream
    return src.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if use_ttl
            else GroupStateTimeout.NoTimeout
        ),
    )


def streaming_debounce(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    min_gap_seconds: int,
    tiebreak_col: str | None = None,
    state_ttl_seconds: int | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Cross-batch time-proximity dedup — the streaming twin of
    ``operators.debounce.debounce`` (raw-relative: the gap compares to
    the previous RAW event of the key, kept or not, so a burst collapses
    to its first row). Per-key state is ONE epoch-nano long (the last
    raw timestamp), which is what lets a burst SPANNING micro-batches
    stay collapsed — a per-batch window cannot see the previous batch's
    tail. Same ordering caveat as the other stateful twins: feed batches
    in event-time order or reconcile with the batch operator downstream.

    Output: the input columns, filtered. State is one long per distinct
    key — for UNBOUNDED key populations pass ``state_ttl_seconds``: a
    key whose last event is more than the TTL behind the watermark has
    its state dropped (event-time timeout). Any TTL >= min_gap is
    semantically free: once a key is TTL-quiet, its state could only
    have KEPT the next event anyway, which is exactly what fresh state
    does. Requires a watermark on ``ts_col`` (``watermark`` sets the
    lateness bound, same meaning as DataFrame.withWatermark).

    WARNING — enabling TTL changes which EVENTS are processed, not just
    which state expires: an event behind the current watermark is
    dropped ENTIRELY, not merely debounced. With TTL off every event is
    processed. Pick ``watermark`` to cover the stream's real
    out-of-orderness. Engine note: Spark does NOT auto-filter late input
    for applyInPandasWithState (its watermark only drives timeouts) —
    the operator enforces the drop itself via
    ``state.getCurrentWatermarkMs()``; otherwise a late burst arriving
    after its key's state expired would re-emit against fresh state.
    """
    if min_gap_seconds <= 0:
        raise ValueError(f"min_gap_seconds must be positive, got {min_gap_seconds}")
    if state_ttl_seconds is not None and state_ttl_seconds < min_gap_seconds:
        raise ValueError(
            f"state_ttl_seconds {state_ttl_seconds} below min_gap_seconds "
            f"{min_gap_seconds} would forget a burst mid-gap and re-emit it"
        )
    out_schema = StructType(list(stream.schema.fields))
    state_schema = StructType([StructField("last_ns", LongType())])
    gap_ns = int(min_gap_seconds) * 1_000_000_000
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    field_names = [f.name for f in stream.schema.fields]
    use_ttl = state_ttl_seconds is not None

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if use_ttl and state.hasTimedOut:
            state.remove()  # key went TTL-quiet; fresh state keeps the
            return          # next event, identical to a live empty state
        last_ns = state.get[0] if state.exists else None
        batch = pd.concat(list(pdfs), ignore_index=True)
        if use_ttl:
            batch = _drop_late_rows(batch, ts_col, state)
        if batch.empty:
            return
        batch = batch.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        keep = []
        for ts in batch[ts_col]:
            t = int(ts.value)  # epoch nanos
            keep.append(last_ns is None or t - last_ns > gap_ns)
            last_ns = t  # raw-relative: advance on EVERY row, kept or not
        state.update((last_ns,))
        if use_ttl:
            state.setTimeoutTimestamp(
                last_ns // 1_000_000 + int(state_ttl_seconds) * 1000
            )
        kept = batch.loc[keep, field_names]
        if not kept.empty:
            yield kept

    src = stream.withWatermark(ts_col, watermark) if use_ttl else stream
    return src.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if use_ttl
            else GroupStateTimeout.NoTimeout
        ),
    )
