"""Sunday-start week arithmetic (W3/W4).

Reference semantics: weeks are Sunday-Saturday ("W-SUN") with manual boundary
snapping, labeled "{week_start} - {week_end}"
(Requirements/ExampleAiCode.md:203-221). Spark/DuckDB ``date_trunc('week')``
is Monday-start, so the Sunday week is derived with next_day/date_sub
arithmetic instead — pure built-in functions, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sunday_week_start(ts: Column | str) -> Column:
    """Date of the Sunday on or before ``ts`` (start of the W-SUN week)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    # next_day returns the NEXT Sunday strictly after the date, so back up 7.
    return F.date_sub(F.next_day(F.to_date(c), "SUN"), 7)


def sunday_week_end(ts: Column | str) -> Column:
    """Date of the Saturday ending the W-SUN week containing ``ts``."""
    return F.date_add(sunday_week_start(ts), 6)


def week_label(ts: Column | str, fmt: str = "yyyy-MM-dd") -> Column:
    """Reference-style label "{week_start} - {week_end}" (ExampleAiCode.md:213)."""
    start = sunday_week_start(ts)
    end = sunday_week_end(ts)
    return F.concat_ws(" - ", F.date_format(start, fmt), F.date_format(end, fmt))
