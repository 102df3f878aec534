"""As-of (temporal) join — attach the latest right-side observation at or
before each left row's timestamp, per key.

Spark has no native ASOF JOIN (DuckDB does; Pandas has merge_asof). The
scale-correct composition is union + last-observation window — NOT a range
join: a theta/range join explodes to |L|x|R| candidate pairs per key before
filtering, while the union approach is one shuffle on (key, ts) and a
single ordered pass, O((|L|+|R|) log) per key. This is the shape SURVEY
§2.3 J1 prescribes for mis-aligned telemetry feeds.

Semantics (backward, inclusive): for left row (k, t), attach right columns
from the right row (k, t') with the greatest t' <= t; rows at t' == t
match. Right side should be unique per (key, ts) — pre-aggregate if not —
otherwise which duplicate wins is undefined and engines differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: list[str],
    value_cols: list[str],
    how: str = "inner",
    suffix: str = "_asof",
) -> DataFrame:
    """Backward-inclusive as-of join.

    ``right`` must share ``by_cols`` and ``ts_col`` names with ``left``.
    Returns left's columns plus ``<ts_col><suffix>`` (the matched right
    timestamp) and ``<value_col><suffix>`` for each right value column.
    ``how="inner"`` drops left rows with no at-or-earlier right row;
    ``"left"`` keeps them with nulls.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")

    left_cols = left.columns
    # The right payload travels as ONE struct column: for right rows it is
    # never null (even if an individual value is), so the ignorenulls window
    # can't skip a matched-but-null observation and land on an older one.
    payload = F.struct(
        F.col(ts_col).alias("ts"), *[F.col(c).alias(c) for c in value_cols]
    )
    # Right rows sort BEFORE left rows at equal timestamps so the inclusive
    # (<=) match falls out of the window order.
    l_tagged = left.select(
        *left_cols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            f"struct<ts:{right.schema[ts_col].dataType.simpleString()},"
            f"{','.join(f'{c}:{right.schema[c].dataType.simpleString()}' for c in value_cols)}>"
        ).alias("_payload"),
    )
    r_tagged = right.select(
        *[
            F.col(c)
            if c in by_cols or c == ts_col
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        F.lit(0).alias("_side"),
        payload.alias("_payload"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left_cols,
        "_side",
        F.last("_payload", ignorenulls=True).over(w).alias("_m"),
    )
    out = filled.filter(F.col("_side") == 1).select(
        *left_cols,
        F.col("_m.ts").alias(f"{ts_col}{suffix}"),
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    if how == "inner":
        out = out.filter(F.col(f"{ts_col}{suffix}").isNotNull())
    return out
