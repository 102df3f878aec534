"""meshinsights_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline framework
(kn-mesh/meshinsights-data-pipeline): a Context + Processor + Pipeline core,
a pluggable source layer, a library of relational/window/statistical
operators, the HVAC power-analysis workload, a GenAI summarization layer,
and large-scale LLM-data-pipeline extensions (dedup, similarity search,
text analysis, multimodal plumbing) — all expressed as lazy DataFrame plans
so Catalyst/Tungsten pick the physical strategy.

Reference parity citations use the convention ``<file>:<line>`` against the
read-only snapshot at /root/reference (e.g. ``src/core/pipeline.py:101``).
"""

__version__ = "0.1.0"

from meshinsights_data_pipeline_spark.session import get_spark, load_tables  # noqa: F401
