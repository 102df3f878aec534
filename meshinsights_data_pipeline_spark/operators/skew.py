"""Skew mitigation: salted two-phase aggregation and bucketed co-located joins.

100 TB rationale: AQE's skew-join splitting (on in session.py) handles most
runtime skew, but two patterns still need explicit plan shapes at scale:

1. A groupBy where one key holds a large share of all rows (a viral
   duplicate cluster in dedup, a hot device in telemetry). Salting splits
   each key across ``salt_buckets`` partial groups, aggregates the partials
   map-side-combinable, then re-aggregates without the salt — the hot key's
   work fans out over the cluster instead of pinning one task.

2. Re-joining two large tables on the same key repeatedly. Writing both
   bucketed by the join key lets every subsequent join run with ZERO
   exchanges (bucket-local sort-merge), amortizing one shuffle at write
   time across all future joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Aggregates that decompose into (partial, merge) with the SAME function —
# safe under salting as agg(salted-partial) -> agg(merge).
_DECOMPOSABLE = {"sum", "min", "max", "count", "bit_or", "bit_and"}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (function, input column) with function in
    {sum, min, max, count}. Phase 1 groups by (keys + salt) — the hot key
    spreads over ``salt_buckets`` tasks; phase 2 merges partials per key
    (count merges via sum). Results are identical to a direct groupBy for
    these decomposable aggregates.
    """
    bad = {fn for fn, _ in aggs.values()} - _DECOMPOSABLE
    if bad:
        raise ValueError(f"non-decomposable aggregate(s) under salting: {sorted(bad)}")
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            getattr(F, fn)(col).alias(out)
            for out, (fn, col) in aggs.items()
        ]
    )
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max",
                "bit_or": "bit_or", "bit_and": "bit_and"}
    return phase1.groupBy(*keys).agg(
        *[
            getattr(F, merge_fn[fn])(out).alias(out)
            for out, (fn, _col) in aggs.items()
        ]
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    Joins/aggregations between tables bucketed on the same keys with the
    same bucket count run without any Exchange — the one write-time shuffle
    is amortized over every later join. Requires a catalog-backed table
    (``saveAsTable``); works with the default in-memory catalog locally and
    Hive/Unity at scale.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def explain_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange — the assert
    hook for bucketed-join tests."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
