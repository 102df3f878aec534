from meshinsights_data_pipeline_spark.plans.queries import QUERIES, Query  # noqa: F401
