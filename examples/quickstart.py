"""Day-1 quickstart — the reference's minimal pipeline
(Architectural Options/Opus.md:537-563: load -> basic statistics ->
display) on the Spark engine.

Run: python examples/quickstart.py [csv_or_parquet_path]
"""

from __future__ import annotations

import os
import sys

# repo-root import shim (the package is not pip-installed)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meshinsights_data_pipeline_spark.analytics.sink import BasicStatisticsStep
from meshinsights_data_pipeline_spark.core.context import PipelineContext
from meshinsights_data_pipeline_spark.core.pipeline import Pipeline
from meshinsights_data_pipeline_spark.core.processor import Processor
from meshinsights_data_pipeline_spark.session import get_spark
from meshinsights_data_pipeline_spark.sources.factories import (
    CsvSource,
    ParquetSource,
)
from meshinsights_data_pipeline_spark.sources.registry import SourceRegistry


class LoadData(Processor):
    """S9/S10: registry-resolved source -> context.raw_data."""

    def __init__(self, registry: SourceRegistry, source_name: str, path: str):
        super().__init__(name="load_data")
        self.registry, self.source_name, self.path = registry, source_name, path

    def process(self, context: PipelineContext) -> PipelineContext:
        source = self.registry.get(self.source_name, path=self.path)
        return context.model_copy(
            update={"raw_data": source.read(get_spark("quickstart"))}
        )


class ConsoleDisplay(Processor):
    """S7 dashboard hand-off: a bounded slice leaves the cluster."""

    def process(self, context: PipelineContext) -> PipelineContext:
        context.raw_data.limit(10).show()
        print("basic_statistics:", context.stages.get("basic_statistics"))
        return context


def main() -> None:
    # NOTE: the events table stores TIMESTAMP(NANOS) — read it through
    # session.read_table (which decodes nanos), not a bare ParquetSource.
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/lineitem.parquet"

    registry = SourceRegistry()
    registry.register("csv", CsvSource)
    registry.register("parquet", ParquetSource)
    source_name = "csv" if path.endswith(".csv") else "parquet"

    pipeline = Pipeline(
        [LoadData(registry, source_name, path), BasicStatisticsStep(), ConsoleDisplay()],
        name="quickstart",
    )
    ctx = PipelineContext(pipeline_name="quickstart", correlation_id="example")
    pipeline.run(ctx)


if __name__ == "__main__":
    main()
