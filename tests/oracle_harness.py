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


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    srows = spark_df.collect()
    scols = spark_df.columns
    con = duckdb_con(sf_dir)
    res = con.execute(oracle_sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    con.close()

    sc, sv = canon_rows(scols, [tuple(r) for r in srows])
    oc, ov = canon_rows(ocols, orows)
    report = {
        "rows_spark": len(sv),
        "rows_oracle": len(ov),
        "cols_match": sc == oc,
        "rowcount_match": len(sv) == len(ov),
        "values_match": sv == ov,
    }
    if not report["values_match"] and report["rowcount_match"] and report["cols_match"]:
        diffs = [(a, b) for a, b in zip(sv, ov) if a != b][:5]
        report["first_diffs"] = diffs
    if not report["cols_match"]:
        report["cols"] = {"spark": sc, "oracle": oc}
    return report
