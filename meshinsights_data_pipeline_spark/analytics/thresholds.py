"""Baseline power thresholds (M8) — the reference's
_calculate_baseline_power_thresholds.

Reference semantics (Requirements/ExamplePipelineCode.md:456-484): for each
stage, if variance is "Low" and the curated frame is non-empty, threshold =
round(median(median_energy_cycle), 0); otherwise None (:479-483). The
median-of-medians (A6) runs as one grouped aggregate over the curated frame;
the None-gating is driver-side control flow over tiny collected state
(SURVEY §2.13 D2 — the one piece of plan logic the engine owns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def baseline_thresholds(curated: DataFrame, stage_col: str, median_col: str) -> DataFrame:
    """Per-stage rounded median-of-medians over the curated frame (EPC:482)."""
    return curated.groupBy(stage_col).agg(
        F.round(F.median(median_col), 0).alias("threshold")
    )


def thresholds_dict(
    curated: DataFrame,
    stage_col: str,
    median_col: str,
    all_stages: list,
    variance: dict[str, dict],
) -> dict:
    """Driver-side gating (EPC:471-483): Low-variance + non-empty curated
    frame -> rounded threshold; else None. One collect of a stage-count-sized
    aggregate — the deliberate job boundary."""
    computed = {
        r[stage_col]: r["threshold"]
        for r in baseline_thresholds(curated, stage_col, median_col).collect()
    }
    return {
        s: (
            computed.get(s)
            if variance.get(s, {}).get("variance") == "Low" and s in computed
            else None
        )
        for s in all_stages
    }
