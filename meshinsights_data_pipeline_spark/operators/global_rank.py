"""Distributed global ranking: total-order row numbers and equal-depth
tiles WITHOUT a single-partition window sort.

Why this exists: ``F.ntile(k).over(Window.orderBy(...))`` — and any
window whose partition spec is empty — collapses the entire input onto
ONE task (Exchange SinglePartition + local sort). That is the classic
100 TB cliff: correct at sf0.1, dead at scale. The same total order is
available distributed for exactly the price of a global sort:

1. ``repartitionByRange`` on the sort key — ONE shuffle, identical to
   what any global sort pays — then ``sortWithinPartitions``. Range
   partitions are ordered: every row in partition *i* sorts before
   every row in partition *i+1*.
2. ``monotonically_increasing_id`` right above the sort: its documented
   layout is ``partition_id * 2^33 + local_row_index``, so both the
   partition id and the 0-based offset of each row inside its sorted
   partition fall out of ONE narrow projection — no second shuffle, no
   per-partition window.
3. Per-partition row counts (map-side-combined aggregate, #partitions
   rows) turned into cumulative offsets with a window — the ONLY
   unpartitioned window in the plan, over a frame the size of the
   shuffle-partition count, never the data.
4. Broadcast-join the offsets back: ``global_rank = offset[pid] +
   local_index + 1``.

``equal_depth_tile`` layers NTILE's exact positional split on top: with
N rows and k tiles, q = N div k and m = N mod k, the first m tiles hold
q+1 rows — a row of rank r lands in tile ``ceil(r/(q+1))`` if
``r <= m*(q+1)`` else ``m + ceil((r - m*(q+1))/q)``. Ties are governed
by the caller's ``order_by`` (include a unique tiebreaker for an
engine-stable split, same as NTILE itself needs).

Reference anchor: the reference's ordering discipline (explicit total
order before positional ops, EPC:141-158) — re-expressed as the plan
shape Spark needs for that discipline to survive a 1000-executor scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# monotonically_increasing_id(): upper 31 bits partition id, lower 33 bits
# the per-partition record index (Spark API contract).
_MID_INDEX_BITS = 33
_MID_INDEX_MASK = (1 << _MID_INDEX_BITS) - 1


def with_global_row_number(
    df: DataFrame,
    order_by: list[str | Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """Add a 1-based global row number under the total order ``order_by``.

    ``order_by`` should reach a unique key (append a tiebreaker column)
    or the numbering of tied rows is partition-placement-dependent.
    ``total_col`` optionally also attaches the global row count to every
    row (broadcast-joined alongside the offsets — free, and what tile /
    percentile-style consumers need next).
    """
    parts = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    ).sortWithinPartitions(*order_by)
    mid = parts.select(
        "*",
        F.shiftright(F.monotonically_increasing_id(), _MID_INDEX_BITS).alias(
            "_gr_pid"
        ),
        F.monotonically_increasing_id()
        .bitwiseAND(F.lit(_MID_INDEX_MASK))
        .alias("_gr_loc"),
    )
    counts = mid.groupBy("_gr_pid").agg(F.count(F.lit(1)).alias("_gr_cnt"))
    # Range partition i holds keys strictly below partition i+1, so the
    # cumulative count over ascending pid IS the global offset. Both
    # windows run on the counts frame (#shuffle-partitions rows).
    w_prev = Window.orderBy("_gr_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("_gr_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "_gr_pid",
        F.coalesce(F.sum("_gr_cnt").over(w_prev), F.lit(0)).alias("_gr_off"),
        F.sum("_gr_cnt").over(w_all).alias("_gr_total"),
    )
    out = (
        mid.join(F.broadcast(offsets), "_gr_pid")
        .withColumn(out_col, (F.col("_gr_off") + F.col("_gr_loc") + 1))
    )
    if total_col:
        out = out.withColumn(total_col, F.col("_gr_total"))
    return out.drop("_gr_pid", "_gr_loc", "_gr_off", "_gr_cnt", "_gr_total")


def ranked_percentiles(
    df: DataFrame,
    col: str,
    probs: list[float],
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT interpolated percentiles (quantile_cont / Spark
    ``percentile`` semantics) without any operator ever buffering the
    column: rank every non-null value with ``with_global_row_number``
    (one range shuffle of one double), keep only the <= 2 bracketing
    ranks per probability, interpolate. Memory per task is bounded by
    the partition sort — a 10^11-row column profiles with the same plan
    shape as 10^5 — unlike ``F.percentile``, whose single aggregate
    buffer collects EVERY value of the column.

    Returns one row: [p_0, p_1, ...] aliased ``p{i}`` in ``probs``
    order (NULL for an empty/all-null column, matching quantile_cont).
    Ties need no tiebreaker: ranks among equal values are arbitrary but
    the value AT a rank is the sorted multiset's, which is unique.
    """
    vals = df.select(F.col(col).cast("double").alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    ranked = with_global_row_number(
        vals, ["_v"], out_col="_rn", num_partitions=num_partitions,
        total_col="_n",
    )
    # keep only bracketing ranks: position pos = (n-1)*p, rows at ranks
    # floor(pos)+1 and ceil(pos)+1
    keep = F.lit(False)
    for p in probs:
        pos = (F.col("_n") - 1) * F.lit(float(p))
        keep = (
            keep
            | (F.col("_rn") == F.floor(pos) + 1)
            | (F.col("_rn") == F.ceil(pos) + 1)
        )
    picked = ranked.filter(keep)
    aggs = [F.max("_n").alias("_n")]
    for i, p in enumerate(probs):
        pos = (F.col("_n") - 1) * F.lit(float(p))
        aggs += [
            F.min(F.when(F.col("_rn") == F.floor(pos) + 1, F.col("_v"))).alias(
                f"_lo{i}"
            ),
            F.min(F.when(F.col("_rn") == F.ceil(pos) + 1, F.col("_v"))).alias(
                f"_hi{i}"
            ),
        ]
    one = picked.agg(*aggs)
    outs = []
    for i, p in enumerate(probs):
        pos = (F.col("_n") - 1) * F.lit(float(p))
        frac = pos - F.floor(pos)
        outs.append(
            (
                F.col(f"_lo{i}")
                + (F.col(f"_hi{i}") - F.col(f"_lo{i}")) * frac
            ).alias(f"p{i}")
        )
    return one.select(*outs)


def grouped_row_number(
    df: DataFrame,
    group_by: list[str],
    order_by: list[str | Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """Per-group 1-based row numbers that survive HOT groups.

    ``row_number().over(Window.partitionBy(g).orderBy(...))`` hash-
    partitions by group — parallelism equals group COUNT, so one giant
    group (a hot source, a viral key) lands on one task no matter how
    many executors exist. This form range-partitions on
    (group_by + order_by) instead: a huge group SPANS partitions in
    order, each partition sorts locally, and per-(partition, group)
    counts + first-row offsets — a broadcast-sized frame of
    #partitions x #groups rows — stitch the per-group numbering back
    together, exactly the ``with_global_row_number`` construction with
    the offset bookkeeping keyed by group.

    Use when groups are FEW and LARGE (the skew case); the broadcast
    frame scales with #partitions x #groups, so for high-cardinality
    group keys the plain window is already well-distributed and this
    buys nothing. ``order_by`` must reach a unique key within a group
    for a deterministic numbering. ``total_col`` optionally attaches the
    group's total row count (what rank-derived statistics need).
    """
    sort_cols = [*group_by, *order_by]
    parts = (
        df.repartitionByRange(num_partitions, *sort_cols)
        if num_partitions
        else df.repartitionByRange(*sort_cols)
    ).sortWithinPartitions(*sort_cols)
    mid = parts.select(
        "*",
        F.shiftright(F.monotonically_increasing_id(), _MID_INDEX_BITS).alias(
            "_gr_pid"
        ),
        F.monotonically_increasing_id()
        .bitwiseAND(F.lit(_MID_INDEX_MASK))
        .alias("_gr_loc"),
    )
    stats = mid.groupBy("_gr_pid", *group_by).agg(
        F.count(F.lit(1)).alias("_gr_cnt"),
        F.min("_gr_loc").alias("_gr_first"),
    )
    # cumulative per-group counts over ascending pid: windows over the
    # tiny stats frame, partitioned by group (parallel, never a cliff)
    w_prev = (
        Window.partitionBy(*group_by)
        .orderBy("_gr_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = (
        Window.partitionBy(*group_by)
        .orderBy("_gr_pid")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    offsets = stats.select(
        "_gr_pid",
        *group_by,
        "_gr_first",
        F.coalesce(F.sum("_gr_cnt").over(w_prev), F.lit(0)).alias("_gr_off"),
        F.sum("_gr_cnt").over(w_all).alias("_gr_total"),
    )
    out = mid.join(F.broadcast(offsets), ["_gr_pid", *group_by]).withColumn(
        out_col, F.col("_gr_off") + (F.col("_gr_loc") - F.col("_gr_first")) + 1
    )
    if total_col:
        out = out.withColumn(total_col, F.col("_gr_total"))
    return out.drop("_gr_pid", "_gr_loc", "_gr_first", "_gr_off", "_gr_total")


def grouped_ranked_percentiles(
    df: DataFrame,
    group_by: list[str],
    col: str,
    probs: list[float],
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group EXACT interpolated percentiles (grouped quantile_cont)
    that survive hot groups: ``percentile(...) GROUP BY g`` buffers each
    group's every value in one aggregation buffer — a viral key OOMs its
    task. Here ``grouped_row_number`` ranks within groups distributed
    (a hot group spans partitions), only the <= 2 bracketing ranks per
    (group, probability) survive the filter, and a group-keyed aggregate
    interpolates. Returns [group_by..., p0, p1, ...] in ``probs`` order;
    groups whose column is all-null vanish (same as quantile_cont's
    GROUP BY row with NULL — callers left-join if they need them).

    Same applicability note as grouped_row_number: built for FEW, LARGE
    groups; for high-cardinality small groups the plain grouped
    percentile aggregate is already well-distributed and cheaper.
    """
    vals = df.select(
        *group_by, F.col(col).cast("double").alias("_v")
    ).filter(F.col("_v").isNotNull())
    ranked = grouped_row_number(
        vals, group_by, ["_v"], out_col="_rn",
        num_partitions=num_partitions, total_col="_n",
    )
    keep = F.lit(False)
    for p in probs:
        pos = (F.col("_n") - 1) * F.lit(float(p))
        keep = (
            keep
            | (F.col("_rn") == F.floor(pos) + 1)
            | (F.col("_rn") == F.ceil(pos) + 1)
        )
    aggs = [F.max("_n").alias("_n")]
    for i, p in enumerate(probs):
        pos = (F.col("_n") - 1) * F.lit(float(p))
        aggs += [
            F.min(F.when(F.col("_rn") == F.floor(pos) + 1, F.col("_v"))).alias(
                f"_lo{i}"
            ),
            F.min(F.when(F.col("_rn") == F.ceil(pos) + 1, F.col("_v"))).alias(
                f"_hi{i}"
            ),
        ]
    per_group = ranked.filter(keep).groupBy(*group_by).agg(*aggs)
    outs = [*group_by]
    for i, p in enumerate(probs):
        pos = (F.col("_n") - 1) * F.lit(float(p))
        frac = pos - F.floor(pos)
        outs.append(
            (
                F.col(f"_lo{i}")
                + (F.col(f"_hi{i}") - F.col(f"_lo{i}")) * frac
            ).alias(f"p{i}")
        )
    return per_group.select(*outs)


def global_topk(
    df: DataFrame,
    order_by: list[str | Column],
    k: int,
    salt_col: Column,
    out_col: str = "rk",
    salt_buckets: int = 16,
) -> DataFrame:
    """Keep the global top ``k`` rows under the total order ``order_by``,
    emitting a 1-based rank. Bit-identical to ``row_number() OVER (ORDER
    BY order_by) <= k`` but skew-proof and single-pass: a plain global
    window sends EVERY row into one task, and
    :func:`with_global_row_number` evaluates the input twice (its range
    partitioner samples the frame before the real pass) — wasteful when
    only the top k survive. Phase 1 takes a local top-k per salt bucket
    (salt from a hash of ``salt_col``, which must be part of the total
    order's tiebreak); phase 2 ranks the <= ``k * salt_buckets``
    survivors, a bounded frame at any input scale — the
    similarity._two_phase_rank idiom with a constant partition key.

    ``order_by`` must reach a unique key or tied ranks are
    partition-placement-dependent (same contract as
    with_global_row_number)."""
    if k < 1:
        raise ValueError(f"global_topk needs k >= 1, got {k}")
    if salt_buckets and salt_buckets > 1:
        local_w = Window.partitionBy("_gt_salt").orderBy(*order_by)
        df = (
            df.withColumn(
                "_gt_salt", F.pmod(F.xxhash64(salt_col), F.lit(salt_buckets))
            )
            .withColumn("_gt_lrk", F.row_number().over(local_w))
            .filter(F.col("_gt_lrk") <= k)
            .drop("_gt_salt", "_gt_lrk")
        )
    w = Window.orderBy(*order_by)
    return df.withColumn(out_col, F.row_number().over(w)).filter(
        F.col(out_col) <= k
    )


def equal_depth_tile(
    df: DataFrame,
    order_by: list[str | Column],
    k: int,
    out_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each row its NTILE(k)-exact equal-depth tile (1-based),
    distributed. Bit-identical to ``ntile(k) OVER (ORDER BY order_by)``
    for any N and k, including N < k and non-divisible splits."""
    if k < 1:
        raise ValueError(f"equal_depth_tile needs k >= 1, got {k}")
    ranked = with_global_row_number(
        df, order_by, out_col="_gr_rn", num_partitions=num_partitions,
        total_col="_gr_n",
    )
    q = F.floor(F.col("_gr_n") / k)  # base tile depth
    m = F.col("_gr_n") % k  # first m tiles get one extra row
    r = F.col("_gr_rn")
    fat_span = m * (q + 1)
    tile = F.when(
        r <= fat_span, F.ceil(r / (q + 1))
    ).otherwise(m + F.ceil((r - fat_span) / F.greatest(q, F.lit(1))))
    return (
        ranked.withColumn(out_col, tile.cast("int"))
        .drop("_gr_rn", "_gr_n")
    )
