"""Local stand-in for the driver's DuckDB-oracle compare.

Runs a Spark query and its oracle SQL over the same parquet tables, then
compares row count, column names, and canonicalized values (columns sorted
by name, rows sorted, doubles rounded to 9 significant decimals).
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

from meshinsights_data_pipeline_spark.session import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        return format(v, ".9g")
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple[str, ...]]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = sorted(tuple(_canon_cell(r[i]) for i in order) for r in rows)
    return cols, out


#: Output types rendered identically by every DuckDB fetch path (fetchall,
#: pandas .df(), Arrow). HUGEINT (DuckDB window-SUM over INTEGER) and
#: DECIMAL survive fetchall() exactly but surface as float64 / Decimal on
#: dtype-sensitive paths — that gap kept x69 driver-red for three rounds
#: while local fetchall() parity stayed bit-perfect.
PORTABLE_TYPES = ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                  "FLOAT", "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN")


def _type_family(t: str) -> str:
    t = t.upper()
    if t.startswith(("BIGINT", "INTEGER", "SMALLINT", "TINYINT",
                     "LONG", "INT", "SHORT", "BYTE")):
        return "int"
    if t.startswith(("DOUBLE", "FLOAT")):
        return "float"
    if t.startswith(("VARCHAR", "STRING")):
        return "str"
    if t.startswith("TIMESTAMP"):
        return "ts"
    return t


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    srows = spark_df.collect()
    scols = spark_df.columns
    con = duckdb_con(sf_dir)
    # Structural gates the value-hash can't see: (a) every oracle output
    # column must be fetch-path-portable; (b) Spark and DuckDB column type
    # FAMILIES must agree (an int-vs-float family split canonicalizes as
    # "1" vs "1.0" on the driver even when the values are numerically equal).
    otypes = dict(
        (r[0], r[1]) for r in con.execute(f"DESCRIBE {oracle_sql}").fetchall()
    )
    stypes = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}
    type_errors = [
        f"oracle {c}: {t} not portable"
        for c, t in otypes.items() if not t.upper().startswith(PORTABLE_TYPES)
    ] + [
        f"{c}: spark {stypes[c]} vs oracle {otypes[c]} (family)"
        for c in stypes
        if c in otypes and _type_family(stypes[c]) != _type_family(otypes[c])
    ]
    # Fetch via Arrow, NOT fetchall(): fetchall() converts DuckDB HUGEINT to
    # a plain Python int (bit-perfect parity locally) while dtype-sensitive
    # fetch paths — the kind a driver harness uses — surface HUGEINT as
    # float64 ("1.0" vs Spark's "1"). Arrow reproduces the driver's view,
    # so non-portable oracle output types fail HERE, not three rounds later.
    tbl = con.execute(oracle_sql).arrow()
    ocols = list(tbl.column_names)
    orows = [tuple(d[c] for c in ocols) for d in tbl.to_pylist()]
    con.close()

    sc, sv = canon_rows(scols, [tuple(r) for r in srows])
    oc, ov = canon_rows(ocols, orows)
    report = {
        "rows_spark": len(sv),
        "rows_oracle": len(ov),
        "cols_match": sc == oc,
        "rowcount_match": len(sv) == len(ov),
        "values_match": sv == ov and not type_errors,
        "type_errors": type_errors,
    }
    if not report["values_match"] and report["rowcount_match"] and report["cols_match"]:
        diffs = [(a, b) for a, b in zip(sv, ov) if a != b][:5]
        report["first_diffs"] = diffs
    if not report["cols_match"]:
        report["cols"] = {"spark": sc, "oracle": oc}
    return report
