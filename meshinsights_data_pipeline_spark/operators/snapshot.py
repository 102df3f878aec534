"""Snapshot maintenance operators: SCD2 history merge and snapshot diff
(CDC delta detection) — the table-maintenance layer every warehouse-scale
pipeline needs between ingest and analytics.

Reference anchor: the reference's write-back path is a keyed upsert into
MySQL (src/plugins/mysql_plugin.py:137-192 — INSERT ... ON DUPLICATE KEY
UPDATE), i.e. SCD type-1: new values overwrite, history is lost. At
100 TB the standard requirements are stronger and both are implemented
here engine-side, over plain DataFrames:

- ``scd2_merge``: type-2 history — closing the superseded row version
  and appending the new one, so every past state stays queryable
  ("as of" reads via valid_from/valid_to). This is the MERGE a
  Delta/Iceberg table would run; expressed here as pure joins + unions
  so it works on any snapshot-replaced parquet table.
- ``cdc_delta``: given two snapshots of the same keyed table, emit
  the CDC delta (insert / update / delete rows) — the feed an
  incremental downstream consumer wants instead of re-reading the full
  new snapshot. Sibling of sources.layout.snapshot_diff, which labels
  changed keys between two COMMITTED ``_v=`` versions of a layout
  table via a row hash; this one takes arbitrary DataFrames and
  carries the old/new VALUES so the output is directly applyable.

Scale shape: both operators are ONE equi-shuffle on the business key
(full-outer or left join); change detection is a map-side struct
comparison on the joined row. No windows, no collects. With AQE on, a
small update batch against a large dimension auto-broadcasts. The
history table in ``scd2_merge`` is touched only on its OPEN slice
(valid_to IS NULL); closed history passes through untouched, so cost is
proportional to |open| + |updates|, not |history|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    keys: list[str],
    attrs: list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply a keyed update batch to an SCD type-2 history table.

    ``history`` holds [*keys, *attrs, valid_from, valid_to] with
    valid_to NULL marking the current (open) version of each key.
    ``updates`` holds [*keys, *attrs, ts_col] — at most one row per key
    (pre-aggregate the feed with max_by if it can carry several; this
    function raises at plan-build time only for an obvious misuse where
    ts_col collides with a key/attr name, and resolves duplicate keys
    deterministically by keeping the max-``ts_col`` row).

    Semantics per update row, matched against the OPEN slice on ``keys``:

    - no open row           -> INSERT new open version [ts, NULL)
    - open row, attrs equal -> no-op (idempotent re-delivery)
    - open row, attrs differ-> CLOSE old (valid_to = ts), INSERT new
    - update not newer than the open row's valid_from -> DROPPED (a
      late, out-of-order update must not rewrite newer state, and an
      equal-timestamp one would create a zero-length version)

    NULL attr values compare as equal to NULL (null-safe <=>), so a
    NULL->NULL redelivery is a no-op, not a spurious new version.

    Returns the full new history [*keys, *attrs, valid_from, valid_to].
    Closed history rows pass through by construction (only the open
    slice joins), so the operator's cost is |open| + |updates|.
    """
    if ts_col in set(keys) | set(attrs):
        raise ValueError(f"ts_col {ts_col!r} collides with a key/attr column")
    out_cols = [*keys, *attrs, valid_from, valid_to]

    # Deterministic one-row-per-key: keep the latest update; ties on
    # ts_col resolved by the greatest attr struct (arbitrary but stable).
    upd = (
        updates.groupBy(*keys)
        .agg(
            F.max(ts_col).alias(ts_col),
            F.max_by(
                F.struct(*attrs), F.struct(ts_col, *attrs)
            ).alias("_a"),
        )
        .select(*keys, ts_col, *[F.col(f"_a.{a}").alias(a) for a in attrs])
    )

    closed = history.where(F.col(valid_to).isNotNull()).select(*out_cols)
    open_ = history.where(F.col(valid_to).isNull())

    j = open_.alias("o").join(upd.alias("u"), on=keys, how="full_outer")
    has_open = F.col(f"o.{valid_from}").isNotNull()
    has_upd = F.col(f"u.{ts_col}").isNotNull()
    late = has_open & has_upd & (F.col(f"u.{ts_col}") <= F.col(f"o.{valid_from}"))
    changed = has_open & has_upd & ~late
    same_attrs = F.lit(True)
    for a in attrs:
        same_attrs = same_attrs & F.col(f"o.{a}").eqNullSafe(F.col(f"u.{a}"))

    # Old open row: survives unchanged unless a differing in-order update
    # closes it.
    keep_old = has_open
    old_valid_to = F.when(changed & ~same_attrs, F.col(f"u.{ts_col}"))
    old_rows = j.where(keep_old).select(
        *keys,
        *[F.col(f"o.{a}").alias(a) for a in attrs],
        F.col(f"o.{valid_from}").alias(valid_from),
        old_valid_to.alias(valid_to),
    )

    # New version rows: brand-new keys, or in-order updates with real
    # attribute changes.
    is_new_version = (has_upd & ~has_open) | (changed & ~same_attrs)
    new_rows = j.where(is_new_version).select(
        *keys,
        *[F.col(f"u.{a}").alias(a) for a in attrs],
        F.col(f"u.{ts_col}").alias(valid_from),
        F.lit(None).cast(open_.schema[valid_to].dataType).alias(valid_to),
    )

    return closed.unionByName(old_rows).unionByName(new_rows)


def cdc_delta(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare: list[str] | None = None,
) -> DataFrame:
    """CDC delta between two snapshots of the same keyed table.

    Emits one row per key whose state changed, with ``change_type`` in
    ('insert', 'update', 'delete') and both value structs:

        [*keys, change_type, old_<c>..., new_<c>...]

    ``compare`` defaults to every non-key column shared by both inputs.
    Unchanged keys are NOT emitted — the output is the incremental feed,
    sized to the churn rather than the table. NULLs compare null-safe,
    so NULL -> NULL is unchanged and NULL -> value is an update.

    One full-outer equi-shuffle on ``keys``; the comparison is a
    map-side null-safe struct equality on the joined row. At 100 TB both
    sides shuffle-hash partition on the same key so the join is
    co-located; snapshots already bucketed by key skip the shuffle
    entirely.
    """
    if compare is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare = [c for c in shared if c not in set(keys)]
    if not compare:
        raise ValueError("cdc_delta needs at least one compare column")

    # presence flags must come from a side-marker, not a compare col
    # (a legitimately-NULL compare value would read as 'absent')
    old_m = old.select(*keys, *compare, F.lit(True).alias("_in_old"))
    new_m = new.select(*keys, *compare, F.lit(True).alias("_in_new"))
    j = old_m.alias("o").join(new_m.alias("n"), on=keys, how="full_outer")
    has_old = F.col("o._in_old").isNotNull()
    has_new = F.col("n._in_new").isNotNull()
    same = F.lit(True)
    for c in compare:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change = (
        F.when(has_old & ~has_new, F.lit("delete"))
        .when(~has_old & has_new, F.lit("insert"))
        .when(~same, F.lit("update"))
    )
    return (
        j.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            *[F.col(f"o.{c}").alias(f"old_{c}") for c in compare],
            *[F.col(f"n.{c}").alias(f"new_{c}") for c in compare],
        )
    )


def scd2_lookup(
    facts: DataFrame,
    history: DataFrame,
    keys: list[str],
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Temporal dimension lookup: attach to each fact row the dimension
    version that was current AT THE FACT'S OWN TIMESTAMP — the read path
    that makes SCD2 history useful (a 1997 order must see the customer's
    1997 balance, not today's).

    Joins on ``keys`` with the interval predicate
    ``valid_from <= fact_ts < valid_to`` (open versions unbounded).
    Version intervals per key are non-overlapping by scd2_merge's
    construction, so each fact matches AT MOST one version; facts whose
    timestamp predates the key's first version (or whose key is absent)
    keep NULL dimension columns under ``how='left'``.

    Scale shape: the join is EQUI on the business key — one co-located
    shuffle on both sides, with the interval test applied as a cheap
    post-join filter on the matched (key) pairs, never a range-join
    blowup: a key's fact rows meet only that key's few versions. The
    version interval columns are carried through for auditability.
    """
    fcols = set(facts.columns)
    dim_cols = [c for c in history.columns if c not in set(keys)]
    clash = [c for c in dim_cols if c in fcols]
    if clash:
        raise ValueError(
            f"history columns {clash} collide with fact columns; rename "
            "one side before the lookup"
        )
    f, h = facts.alias("f"), history.alias("h")
    cond = None
    for k in keys:
        c = f[k].eqNullSafe(h[k])
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (h[valid_from] <= f[fact_ts])
        & (h[valid_to].isNull() | (h[valid_to] > f[fact_ts]))
    )
    return f.join(h, cond, how).select(
        *[f[c] for c in facts.columns],
        *[h[c] for c in dim_cols],
    )
