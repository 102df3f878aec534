"""Power-variance classification (M1-M3): rCV safety net + GMM multimodality.

Reference semantics (Requirements/ExampleAiCode.md:280-372; tunables
ExamplePipelineCode.md:232-238):
1. fewer than MIN_SAMPLES_FOR_TEST samples -> "Low" (unreliable).
2. rCV = MAD/median > RCV_THRESHOLD -> "High" (dispersion safety net).
3. else GMM with k=1..MAX_COMPONENTS chosen by BIC; "High" iff >= 2
   components each with weight >= MIN_SIGNIFICANT_WEIGHT whose means are
   separated by >= SEPARATION_THRESHOLD * overall median.

Spark-first: the per-stage fan-out (the reference used a joblib thread pool,
EPC:265-269) is replaced by ``groupBy(stage).applyInPandas`` — the canonical
grouped-map pattern; Spark schedules one task per stage group, so the
parallelism code is deleted outright (SURVEY §2.9 M10). Each group is capped
upstream by recent_n (W2) so worker memory is bounded at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from meshinsights_data_pipeline_spark.analytics.gmm import fit_best_gmm


@dataclass(frozen=True)
class VarianceParams:
    # ExamplePipelineCode.md:232-238
    rcv_threshold: float = 0.35
    min_samples_for_test: int = 50
    max_components: int = 3
    min_significant_weight: float = 0.10
    separation_threshold: float = 0.20


def classify_variance(values: np.ndarray, params: VarianceParams = VarianceParams()) -> dict:
    """Driver/worker-side classification of one stage's samples."""
    x = np.asarray(values, dtype=np.float64)
    x = x[np.isfinite(x)]
    n = x.size
    base = {
        "n_samples": int(n),
        "rcv": None,
        "n_components": 0,
        "means": [],
        "weights": [],
        "covariances": [],
    }
    if n < params.min_samples_for_test:
        return {**base, "variance": "Low", "reason": f"insufficient samples ({n} < {params.min_samples_for_test})"}

    med = float(np.median(x))
    mad = float(np.median(np.abs(x - med)))
    rcv = float("inf") if med == 0 and mad > 0 else (0.0 if med == 0 else mad / med)
    base["rcv"] = float(rcv)
    if rcv > params.rcv_threshold:
        return {**base, "variance": "High", "reason": f"high dispersion (rCV={rcv:.3f} > {params.rcv_threshold})"}

    fit = fit_best_gmm(x, params.max_components)
    base.update(
        n_components=fit.n_components, means=fit.means, weights=fit.weights, covariances=fit.covariances
    )
    significant = [m for m, w in zip(fit.means, fit.weights) if w >= params.min_significant_weight]
    if len(significant) >= 2:
        sep = max(significant) - min(significant)
        if med != 0 and sep >= params.separation_threshold * abs(med):
            return {
                **base,
                "variance": "High",
                "reason": (
                    f"multi-modal: {len(significant)} significant components, "
                    f"separation {sep:.1f} >= {params.separation_threshold} * median {med:.1f}"
                ),
            }
    return {**base, "variance": "Low", "reason": "unimodal / low dispersion"}


def classify_variance_df(
    df: DataFrame,
    stage_col: str,
    value_col: str,
    params: VarianceParams = VarianceParams(),
) -> DataFrame:
    """Distributed per-stage classification: one result row per stage.

    groupBy(stage).applyInPandas — Arrow-batched, one task per group.
    """
    from meshinsights_data_pipeline_spark.session import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    stage_field = df.schema[stage_col]
    out_schema = (
        f"{stage_col} {stage_field.dataType.simpleString()}, variance string, reason string, "
        "n_samples bigint, rcv double, n_components int, "
        "means array<double>, weights array<double>, covariances array<double>"
    )

    def _one_stage(pdf: pd.DataFrame) -> pd.DataFrame:
        res = classify_variance(pdf[value_col].to_numpy(), params)
        return pd.DataFrame(
            [
                {
                    stage_col: pdf[stage_col].iloc[0],
                    "variance": res["variance"],
                    "reason": res["reason"],
                    "n_samples": res["n_samples"],
                    "rcv": res["rcv"],
                    "n_components": res["n_components"],
                    "means": res["means"],
                    "weights": res["weights"],
                    "covariances": res["covariances"],
                }
            ]
        )

    return df.select(stage_col, value_col).groupBy(stage_col).applyInPandas(_one_stage, out_schema)
