"""Relational / window / statistical operator library.

Each module is a small, composable function set over DataFrames, built from
pyspark.sql.functions (JVM-side, whole-stage-codegen-eligible). Python UDFs
appear only where sklearn/ML semantics genuinely require them (analytics/).
"""

from meshinsights_data_pipeline_spark.operators.sessionize import sessionize  # noqa: F401
from meshinsights_data_pipeline_spark.operators.recent_n import recent_n  # noqa: F401
from meshinsights_data_pipeline_spark.operators.mode import grouped_mode  # noqa: F401
from meshinsights_data_pipeline_spark.operators.stats import (  # noqa: F401
    grouped_stats,
    weekly_stats,
)
from meshinsights_data_pipeline_spark.operators.weekly import sunday_week_start, week_label  # noqa: F401
from meshinsights_data_pipeline_spark.operators.valid_cycles import filter_valid_cycles  # noqa: F401
from meshinsights_data_pipeline_spark.operators.rcv import robust_cv  # noqa: F401
