"""asof_join unit tests: inclusivity, left/inner, null right values."""

from __future__ import annotations

from datetime import datetime

import pytest

from meshinsights_data_pipeline_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 10:00:00")),
            (2, "a", _ts("2024-01-01 12:00:00")),
            (3, "a", _ts("2024-01-01 09:00:00")),  # before any right row
            (4, "b", _ts("2024-01-01 10:30:00")),
        ],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 10:00:00"), 1.0),  # equal ts -> matches id=1
            ("a", _ts("2024-01-01 11:00:00"), None),  # null value still matches
            ("b", _ts("2024-01-01 10:00:00"), 3.0),
        ],
        "k string, ts timestamp, v double",
    )
    return left, right


def test_backward_inclusive_and_null_value(frames):
    left, right = frames
    out = {
        r["id"]: (r["ts_asof"], r["v_asof"])
        for r in asof_join(left, right, "ts", ["k"], ["v"]).collect()
    }
    assert out[1] == (_ts("2024-01-01 10:00:00"), 1.0)  # equal-ts inclusive
    # id=2's latest right row is 11:00 with a NULL value — the null must NOT
    # be skipped in favor of the older 10:00 observation
    assert out[2] == (_ts("2024-01-01 11:00:00"), None)
    assert out[4] == (_ts("2024-01-01 10:00:00"), 3.0)
    assert 3 not in out  # inner drops the unmatched row


def test_left_keeps_unmatched(frames):
    left, right = frames
    out = {
        r["id"]: r["ts_asof"]
        for r in asof_join(left, right, "ts", ["k"], ["v"], how="left").collect()
    }
    assert out[3] is None
    assert len(out) == 4


def test_how_validation(frames):
    left, right = frames
    with pytest.raises(ValueError, match="how must be"):
        asof_join(left, right, "ts", ["k"], ["v"], how="outer")
