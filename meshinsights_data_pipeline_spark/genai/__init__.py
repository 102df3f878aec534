"""GenAI layer (G1-G3 + M9): weekly summary curation, prompt assembly, and
multi-provider LLM dispatch.

Reference: Requirements/ExampleAiCode.md (UnitPowerAiClassification). The
curation aggregate is Spark-native (Sunday-week groupBy, collected as a tiny
per-(week, stage) result); prompts and provider dispatch are driver-side by
design — the reference never auto-triggers the API call
(ExamplePipelineCode.md:486-493), and in-sandbox tests exercise prompt
determinism and request shape through an injectable transport, never the
network.
"""

from meshinsights_data_pipeline_spark.genai.weekly_summary import (
    DEFAULT_STAGE_PAIRS,
    stages_to_analyse,
    weekly_summary,
)
from meshinsights_data_pipeline_spark.genai.prompts import (
    full_user_message,
    system_message,
    user_message_power_over_time,
    user_message_power_variance,
)
from meshinsights_data_pipeline_spark.genai.providers import (
    build_provider_request,
    trigger_ai_issue_classification,
)
from meshinsights_data_pipeline_spark.genai.classification import (
    AiClassificationStep,
    any_high_variance,
)

__all__ = [
    "DEFAULT_STAGE_PAIRS",
    "stages_to_analyse",
    "weekly_summary",
    "system_message",
    "user_message_power_variance",
    "user_message_power_over_time",
    "full_user_message",
    "build_provider_request",
    "trigger_ai_issue_classification",
    "AiClassificationStep",
    "any_high_variance",
]
