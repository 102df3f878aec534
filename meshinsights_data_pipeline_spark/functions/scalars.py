"""Scalar functions (F1-F4) — all built-in expressions, no UDFs.

Reference parity:
- string_tail_lower: get_string_tail_lower_case (src/plugins/adx_plugin.py:278-286)
  last N chars lower-cased; n <= 0 -> "", n >= len -> whole string lower.
- coerce_numeric_sentinels: "NaN"/"Infinity"/"-Infinity" strings then
  to_numeric(errors='coerce') (adx_plugin.py:252-257) -> try_cast (bad -> null).
- round_to_long: int(round(x, 0)) (ExampleAiCode.md:238-241).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def string_tail_lower(col: Column | str, length: int) -> Column:
    """Last ``length`` chars, lower-cased. length<=0 -> ''. Matches
    adx_plugin.py:278-286 edge cases exactly (right() already returns the
    whole string when length >= len)."""
    if length <= 0:
        return F.lit("")
    return F.lower(F.right(_c(col), F.lit(int(length))))


def coerce_numeric_sentinels(col: Column | str) -> Column:
    """String column -> double; 'NaN'/'Infinity'/'-Infinity' mapped to the IEEE
    values, unparseable strings -> null (pandas to_numeric(errors='coerce'))."""
    c = _c(col)
    return (
        F.when(c == "NaN", F.lit(float("nan")))
        .when(c == "Infinity", F.lit(float("inf")))
        .when(c == "-Infinity", F.lit(float("-inf")))
        .otherwise(c.try_cast("double"))
    )


def round_to_long(col: Column | str, scale: int = 0) -> Column:
    """int(round(x, scale)) — reference's integer rounding idiom."""
    return F.round(_c(col), scale).cast("long")
