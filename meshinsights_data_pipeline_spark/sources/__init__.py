from meshinsights_data_pipeline_spark.sources.base import Source  # noqa: F401
from meshinsights_data_pipeline_spark.sources.registry import SourceRegistry  # noqa: F401
from meshinsights_data_pipeline_spark.sources.factories import (  # noqa: F401
    BinaryFileSource,
    CsvSource,
    JdbcSource,
    JsonlSource,
    MemorySource,
    OrcSource,
    ParquetSource,
    SqlSource,
    TextSource,
)
from meshinsights_data_pipeline_spark.sources.kusto_types import normalize_kusto_frame  # noqa: F401
