"""The full HVAC power-analysis workload on testdata events, ending with the
(never auto-triggered) GenAI classification — the reference's
PowerAnalysisPipeline + UnitPowerAiClassification usage pattern
(ExamplePipelineCode.md:50-102, :486-493).

Run: python examples/power_analysis.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

# repo-root import shim (the package is not pip-installed)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.analytics.power_pipeline import (
    run_power_analysis,
)
from meshinsights_data_pipeline_spark.genai import classification
from meshinsights_data_pipeline_spark.operators.sessionize import sessionize
from meshinsights_data_pipeline_spark.session import get_spark, read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("power-analysis-example")

    # Shape the events table into (timeStamp, tstate, energy) telemetry and
    # label cycles (W1) — in production this arrives pre-merged from the
    # source query (J1).
    ev = read_table(spark, sf_dir, "events").select(
        F.col("ts"),
        F.col("event_type").alias("tstate"),
        (F.abs(F.col("value")) * 100).alias("energy"),
        "user_id",
    )
    telemetry = sessionize(ev, "tstate", ["ts"], ["user_id"]).withColumnRenamed(
        "ts", "timeStamp"
    )

    ctx = run_power_analysis(telemetry)

    print("variance:", {k: v["variance"] for k, v in ctx.variance_analysis.items()})
    print("issues:", ctx.issues)
    print("thresholds:", ctx.thresholds)

    if ctx.ai_analysis:
        # The API call itself is explicit-trigger-only. Without credentials
        # we inject a stub transport; in production drop the transport
        # argument and set the provider's env vars.
        response = classification.trigger(
            ctx,
            model_provider="anthropic",
            model_name="claude-sonnet-4-5",
            transport=lambda provider, model, request: (
                f"[stub {provider}/{model}] prompt has "
                f"{len(request['messages'][0]['content'])} chars"
            ),
        )
        print("ai response:", response)


if __name__ == "__main__":
    main()
