"""Pipeline-level parity: the Spark workload vs an independent pandas
re-implementation of the reference's EPC semantics (SURVEY §5 t2).

The pandas side mirrors Requirements/ExamplePipelineCode.md directly:
chronological sort, groupby-shift sessionization, per-cycle count/median/
pair-count-idxmax mode (ties -> smallest value), the valid-cycle predicate,
per-cycle curation (first timestamp, median energy), and rounded
median-of-medians thresholds. The GMM classification itself is excluded —
both sides would share the same implementation, so comparing it is
circular; its decision surface is unit-tested separately.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.analytics.curation import curate_stage_data
from meshinsights_data_pipeline_spark.analytics.thresholds import baseline_thresholds
from meshinsights_data_pipeline_spark.operators.sessionize import sessionize
from meshinsights_data_pipeline_spark.operators.valid_cycles import filter_valid_cycles
from meshinsights_data_pipeline_spark.session import read_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def telemetry(spark):
    """Testdata events shaped into the (timeStamp, tstate, energy) frame."""
    ev = read_table(spark, SF_DIR, "events").select(
        F.col("ts"),
        F.col("event_id"),
        F.col("user_id"),
        F.col("event_type").alias("tstate"),
        (F.abs(F.col("value")) * 100).alias("energy"),
    )
    return sessionize(ev, "tstate", ["ts", "event_id"], ["user_id"]).withColumnRenamed(
        "ts", "timeStamp"
    )


@pytest.fixture(scope="module")
def telemetry_pdf(telemetry):
    return telemetry.toPandas()


def _pandas_cycle_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """EPC:183-202 in pandas: per-(user,cycle) count/median + pair-count
    idxmax mode (ties -> first in sorted group order = smallest energy)."""
    keys = ["user_id", "cycle"]
    stats = pdf.groupby(keys).agg(
        count=("energy", "size"), median_energy=("energy", "median")
    )
    pair_counts = pdf.groupby(keys + ["energy"]).size().rename("n").reset_index()
    pair_counts = pair_counts.sort_values(keys + ["energy"])
    modes = (
        pair_counts.loc[pair_counts.groupby(keys)["n"].idxmax()]
        .set_index(keys)["energy"]
        .rename("mode_energy")
    )
    return stats.join(modes)


def test_valid_cycle_filter_parity(telemetry, telemetry_pdf):
    stats = _pandas_cycle_stats(telemetry_pdf)
    valid = stats.dropna(subset=["mode_energy"])
    valid = valid[
        (valid["count"] >= 4) & (valid["median_energy"] > 0) & (valid["mode_energy"] > 0)
    ]
    expected_keys = set(valid.index)

    kept = filter_valid_cycles(telemetry, ["user_id", "cycle"], "energy", 4)
    got_keys = {
        (r["user_id"], r["cycle"])
        for r in kept.select("user_id", "cycle").distinct().collect()
    }
    assert got_keys == expected_keys
    # row-level: every kept row belongs to a valid cycle and none are lost
    expected_rows = telemetry_pdf.set_index(["user_id", "cycle"]).loc[
        sorted(expected_keys)
    ]
    assert kept.count() == len(expected_rows)


def test_curation_parity(telemetry, telemetry_pdf):
    """EPC:418-441: per-cycle first-timestamp + median energy, per stage."""
    stages = sorted(telemetry_pdf["tstate"].unique())[:3]
    curated = curate_stage_data(
        telemetry, stages, "tstate", "cycle", "energy", "timeStamp"
    ).collect()

    pdf = telemetry_pdf[telemetry_pdf["tstate"].isin(stages)]
    expected = (
        pdf.sort_values(["timeStamp"])
        .groupby(["tstate", "cycle"])
        .agg(first_ts=("timeStamp", "first"), med=("energy", "median"))
    )
    got = {(r["tstate"], r["cycle"]): (r["first_ts"], r["median_energy_cycle"]) for r in curated}
    assert set(got) == set(expected.index)
    for key, (fts, med) in got.items():
        erow = expected.loc[key]
        assert fts == erow["first_ts"].to_pydatetime()
        assert med == pytest.approx(erow["med"])


def test_threshold_parity(telemetry, telemetry_pdf):
    """EPC:482: threshold = round(median(per-cycle medians), 0) per stage."""
    stages = sorted(telemetry_pdf["tstate"].unique())
    curated = curate_stage_data(
        telemetry, stages, "tstate", "cycle", "energy", "timeStamp"
    )
    got = {
        r["tstate"]: r["threshold"]
        for r in baseline_thresholds(curated, "tstate", "median_energy_cycle").collect()
    }
    expected = (
        telemetry_pdf.groupby(["tstate", "cycle"])["energy"]
        .median()
        .groupby("tstate")
        .median()
        .round(0)
    )
    assert set(got) == set(expected.index)
    for s in got:
        assert got[s] == pytest.approx(expected[s])
