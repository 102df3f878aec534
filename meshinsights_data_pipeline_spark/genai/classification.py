"""AI issue-classification step (the UnitPowerAiClassification parity layer).

Reference: Requirements/ExampleAiCode.md:25-53 (curate on construction,
assemble prompts) + ExamplePipelineCode.md:486-493 (NEVER auto-triggered —
"slow and expensive"; a user explicitly calls trigger). Canonical gating
condition: the step is relevant only when at least one stage is "High"
variance (Architectural Options/Opus.md:513-526).

Split of responsibilities:
- ``AiClassificationStep`` (a Processor) performs the data work: weekly
  summary curation (one Spark aggregate) + deterministic prompt assembly,
  writing both into ``context.ai_analysis``. This is cheap and safe to run
  in-pipeline under the any-High condition.
- The API call itself happens only via ``trigger(context, ...)`` (or the
  module-level ``trigger_ai_issue_classification``), mirroring the
  reference's explicit-trigger contract.
"""

from __future__ import annotations

from datetime import date, datetime
from typing import Any

from meshinsights_data_pipeline_spark.core.context import PipelineContext
from meshinsights_data_pipeline_spark.core.processor import Processor
from meshinsights_data_pipeline_spark.genai.prompts import (
    full_user_message,
    system_message,
)
from meshinsights_data_pipeline_spark.genai.providers import (
    Transport,
    trigger_ai_issue_classification,
)
from meshinsights_data_pipeline_spark.genai.weekly_summary import (
    DEFAULT_STAGE_PAIRS,
    stages_to_analyse,
    weekly_summary,
)


def any_high_variance(context: PipelineContext) -> bool:
    """OPS:513-526 — the canonical condition for the AI step."""
    return any(
        v.get("variance") == "High" for v in context.variance_analysis.values()
    )


class AiClassificationStep(Processor):
    """Curate the weekly summary and assemble prompts into
    ``context.ai_analysis`` (EAC:25-53 constructor behavior, minus the API
    call)."""

    def __init__(
        self,
        stage_col: str = "tstate",
        value_col: str = "energy",
        ts_col: str = "timeStamp",
        stage_pairs: tuple[frozenset[str], ...] = DEFAULT_STAGE_PAIRS,
        stage_names: dict[Any, str] | None = None,
        start_date: date | datetime | str | None = None,
        end_date: date | datetime | str | None = None,
        source_table: str | None = None,
        **kw: Any,
    ):
        super().__init__(name="ai_classification", **kw)
        self.stage_col, self.value_col, self.ts_col = stage_col, value_col, ts_col
        self.stage_pairs = stage_pairs
        self.stage_names = stage_names
        self.start_date, self.end_date = start_date, end_date
        self.source_table = source_table

    def validate_prerequisites(self, context: PipelineContext) -> None:
        df = (
            context.processed_data.get(self.source_table)
            if self.source_table
            else context.raw_data
        )
        if df is None:
            raise ValueError("No raw data available")
        self.require_columns(df, [self.stage_col, self.value_col, self.ts_col])

    def process(self, context: PipelineContext) -> PipelineContext:
        df = (
            context.processed_data.get(self.source_table)
            if self.source_table
            else context.raw_data
        )
        weekly = weekly_summary(
            df,
            context.variance_analysis,
            stage_col=self.stage_col,
            value_col=self.value_col,
            ts_col=self.ts_col,
            stage_pairs=self.stage_pairs,
            stage_names=self.stage_names,
            start_date=self.start_date,
            end_date=self.end_date,
        )
        out = context.model_copy()
        out.ai_analysis = {
            "stages_analysed": sorted(
                stages_to_analyse(context.variance_analysis, self.stage_pairs)
            ),
            "weekly_summary": weekly,
            "system_message": system_message(self.start_date, self.end_date),
            "user_message": full_user_message(context.variance_analysis, weekly),
        }
        return out


def trigger(
    context: PipelineContext,
    model_provider: str = "azure_openai",
    model_name: str = "gpt-4.1",
    transport: Transport | None = None,
) -> str:
    """Explicitly dispatch the assembled prompts (EPC:486-493 contract).

    Requires ``AiClassificationStep`` to have populated
    ``context.ai_analysis``; stores and returns the response text.
    """
    ai = context.ai_analysis
    if not ai or "user_message" not in ai:
        raise ValueError(
            "ai_analysis not populated — run AiClassificationStep first"
        )
    response = trigger_ai_issue_classification(
        ai["system_message"],
        ai["user_message"],
        model_provider=model_provider,
        model_name=model_name,
        transport=transport,
    )
    ai["response"] = response
    ai["model_provider"] = model_provider
    ai["model_name"] = model_name
    return response
