from meshinsights_data_pipeline_spark.core.context import PipelineContext  # noqa: F401
from meshinsights_data_pipeline_spark.core.processor import Processor  # noqa: F401
from meshinsights_data_pipeline_spark.core.pipeline import Pipeline, PipelineConfig  # noqa: F401
