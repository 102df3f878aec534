"""t2-style correctness: every declared query hash-matches its DuckDB oracle.

Runs at sf0.01 by default — the SAME tier the external driver checks, so a
local green run is the driver's signal (set SPARK_GRAFT_T2_DIR to
/root/testdata/sf0.001 for a faster smoke tier).
"""

from __future__ import annotations

import os

import pytest

from meshinsights_data_pipeline_spark.plans.queries import QUERIES
from tests.oracle_harness import compare

ORACLE_QUERIES = [name for name, q in QUERIES.items() if q.oracle is not None]
T2_DIR = os.environ.get("SPARK_GRAFT_T2_DIR", "/root/testdata/sf0.01")


def test_every_oracle_output_type_is_portable():
    """No HUGEINT/DECIMAL may reach an oracle's final SELECT — x69 was
    driver-red for three rounds on exactly this (the type set and its
    rationale live in oracle_harness.PORTABLE_TYPES, the same contract
    compare() enforces per query)."""
    from tests.oracle_harness import PORTABLE_TYPES, duckdb_con

    con = duckdb_con(T2_DIR)
    offenders = []
    for name in ORACLE_QUERIES:
        for col, typ, *_ in con.execute(f"DESCRIBE {QUERIES[name].oracle}").fetchall():
            if not typ.startswith(PORTABLE_TYPES):
                offenders.append(f"{name}.{col}: {typ}")
    con.close()
    assert not offenders, (
        "non-portable oracle output types (CAST them in the final SELECT, "
        "as q15/x69 do): " + "; ".join(offenders)
    )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    q = QUERIES[name]
    report = compare(q.spark(spark, T2_DIR), q.oracle, T2_DIR)
    assert report["cols_match"], report
    assert report["rowcount_match"], report
    assert report["values_match"], report
