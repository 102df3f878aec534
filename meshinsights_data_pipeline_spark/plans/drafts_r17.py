"""Round-17 anchor DRAFTS — NOT registered.

The r16 driver window is consumed by the staged-r15 registration
(x124–x130) plus the r12-staleness rotation, so the operators added
THIS round — the constant-memory sketch-profiling family (HLL
cardinality, count-min heavy-hitter frequencies, KMV distinct/overlap)
and the seasonal-decomposition layer over the trend family — ship with
their anchor queries and DuckDB oracles staged HERE, proven green by
``tests/test_oracle_drafts.py`` (which parametrizes over every draft
generation). Round 17 registers each (builder, SQL) pair and gives it
a window slot — registration is a copy, not new work (the r13 → r14 →
r15 → r16 precedent).

Round-17 window math (for whoever rotates next): the FIRST THREE
slots are RESERVED for the trio deferred in both r15 and r16 —
q68, x24_source_quota, x40_shuffle_shards (r12-stale, four rounds by
r17; the r16 verdict's standing instruction). Then one slot per draft
staged here, then the r13-stale cohort, recomputed from the
CORRECTNESS_r1-r16 union AT REGISTRATION TIME (the r15 "41 vs 40"
lesson — do not trust this docstring's arithmetic over the union):
after the r16 rotation the r13-checked cohort is expected to be 50
queries; 3 (deferred trio) + |drafts| + fill-from-r13-stale = 50,
deferring the lightest r13 queries by the r16 gate-run warm time to
r18.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.session import read_table

#: what r17 registers: name -> (builder, oracle_sql)
DRAFTS: dict = {}
