"""Kusto-type frame normalizer (S2/W5/W6/F2/F4).

Reference parity: dataframe_from_response (src/plugins/adx_plugin.py:198-276)
converts a Kusto result to a typed frame per the converter table
(adx_plugin.py:224-233):

| kusto    | reference behavior                               | here          |
|----------|--------------------------------------------------|---------------|
| bool     | bool / nullable boolean                          | boolean       |
| int      | nullable Int32                                   | int           |
| long     | nullable Int64                                   | bigint        |
| real     | float64; "NaN"/"Infinity"/"-Infinity" coerced    | double        |
| decimal  | LOSSY float64 (adx_plugin.py:230)                | double (parity; DecimalType(38,18) available via lossless_decimals=True) |
| datetime | floored to whole seconds (:259-262)              | timestamp, date_trunc('second') |
| timespan | ticks (100ns) or "[d.]hh:mm:ss[.f]" -> timedelta (:182-195) | double seconds (interval semantics kept as seconds for arithmetic) |
| string   | passthrough (:251)                               | string        |

All conversions are built-in column expressions — no UDFs, fully
codegen-eligible, and they run during the scan stage so downstream operators
see clean types.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _timespan_seconds(c: Column) -> Column:
    """Kusto timespan -> seconds (double).

    Numeric input = ticks of 100 ns (adx_plugin.py:189: ticks * 100ns).
    String input = "[d.]hh:mm:ss[.fraction]" (adx_plugin.py:182-195).
    """
    s = c.cast("string")
    as_num = s.try_cast("double")
    # "[d.]hh:mm:ss[.f]": optional leading days + '.', then hh:mm:ss with
    # optional fractional seconds.
    days = F.coalesce(
        F.regexp_extract(s, r"^(\d+)\.\d{1,2}:\d{2}:\d{2}", 1).try_cast("double"), F.lit(0.0)
    )
    hms = F.regexp_extract(s, r"(\d{1,2}):(\d{2}):(\d{2}(?:\.\d+)?)$", 0)
    hh = F.split(hms, ":").getItem(0).try_cast("double")
    mm = F.split(hms, ":").getItem(1).try_cast("double")
    ss = F.split(hms, ":").getItem(2).try_cast("double")
    from_string = days * 86400.0 + hh * 3600.0 + mm * 60.0 + ss
    return F.when(as_num.isNotNull(), as_num * 1e-7).otherwise(from_string)


def kusto_cast(c: Column, kusto_type: str, lossless_decimals: bool = False) -> Column:
    t = kusto_type.lower()
    if t == "bool" or t == "boolean":
        return c.cast("boolean")
    if t == "int":
        return c.cast("int")
    if t == "long":
        return c.cast("long")
    if t == "real":
        s = c.cast("string")
        return (
            F.when(s == "NaN", F.lit(float("nan")))
            .when(s == "Infinity", F.lit(float("inf")))
            .when(s == "-Infinity", F.lit(float("-inf")))
            .otherwise(s.try_cast("double"))
        )
    if t == "decimal":
        # Reference is lossy float (adx_plugin.py:230); Spark can be lossless.
        return c.cast("decimal(38,18)") if lossless_decimals else c.cast("double")
    if t == "datetime":
        return F.date_trunc("second", c.cast("timestamp"))
    if t == "timespan":
        return _timespan_seconds(c)
    return c.cast("string")


def normalize_kusto_frame(
    df: DataFrame, column_types: dict[str, str], lossless_decimals: bool = False
) -> DataFrame:
    """Apply the Kusto converter table to named columns; others pass through
    as strings only if listed, otherwise untouched (adx_plugin.py:251)."""
    return df.select(
        *[
            kusto_cast(F.col(c), column_types[c], lossless_decimals).alias(c)
            if c in column_types
            else F.col(c)
            for c in df.columns
        ]
    )
