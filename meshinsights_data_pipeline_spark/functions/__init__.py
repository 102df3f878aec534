from meshinsights_data_pipeline_spark.functions.scalars import (  # noqa: F401
    string_tail_lower,
    coerce_numeric_sentinels,
    round_to_long,
)
