"""Oracle parity for the r14 anchor DRAFTS (plans/drafts_r14.py).

Same gate as test_query_matches_oracle — row count, column names,
portable output types, and canonicalized values vs DuckDB at sf0.01 —
run against the staged (builder, SQL) pairs BEFORE registration, so
the r14 window additions land pre-proven.
"""

from __future__ import annotations

import pytest

from meshinsights_data_pipeline_spark.plans.drafts_r14 import DRAFTS
from tests.oracle_harness import compare

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(DRAFTS))
def test_draft_matches_oracle(spark, name):
    fn, sql = DRAFTS[name]
    df = fn(spark, SF_DIR)
    r = compare(df, sql, SF_DIR)
    assert r["values_match"] and r["cols_match"] and r["rowcount_match"], r
    assert r["rows_spark"] > 0  # a 0-row match would be vacuous
