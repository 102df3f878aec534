"""DSIR data selection — importance-weight the raw corpus toward a
target domain, then resample with the weights (Xie et al. 2023):

    raw documents + target slice
      -> per-doc log importance weights   (corpus.dsir_weights:
                                           hashed-bigram bag models,
                                           add-one smoothing)
      -> softmax-free selection           (corpus.weighted_sample over
                                           exp-shifted weights — A-ES
                                           deterministic reservoir)

The weight model is two bounded count tables (the 4096-bucket hashed
feature space), so the heavy corpus passes are one tokenize scan and
one broadcast-join score — nothing pairs, nothing collects. The same
lambda table drives the streaming twin (streaming.streaming_dsir_ingest)
for weight-as-you-ingest.

Run: python examples/data_selection.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meshinsights_data_pipeline_spark.operators.corpus import (  # noqa: E402
    dsir_weights,
    weighted_sample,
)
from meshinsights_data_pipeline_spark.session import (  # noqa: E402
    get_spark,
    read_table,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("data-selection-example")

    docs = read_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")

    weights = dsir_weights(docs, target, "doc_id", "text")

    # A-ES sampling needs positive weights; exp of the log-ratio IS the
    # importance ratio (shift-free, scale-safe for the O(1-10) log range
    # the hashed models produce).
    ratio = weights.select(
        "doc_id", F.exp(F.col("dsir_logw")).alias("importance")
    )
    picked = weighted_sample(ratio, "doc_id", "importance", n=100)

    stats = weights.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("dsir_logw"), 4).alias("mean_logw"),
        F.round(F.min("dsir_logw"), 4).alias("min_logw"),
        F.round(F.max("dsir_logw"), 4).alias("max_logw"),
    ).collect()[0]
    print(f"scored docs      : {stats.n}")
    print(f"log-weight range : [{stats.min_logw}, {stats.max_logw}] "
          f"mean {stats.mean_logw}")

    chosen = picked.join(docs.select("doc_id", "lang"), "doc_id")
    mix = chosen.groupBy("lang").count().orderBy(F.desc("count")).collect()
    print("selected-sample language mix (target slice was lang=en):")
    for r in mix:
        print(f"  {r.lang}: {r['count']}")
    spark.stop()


if __name__ == "__main__":
    main()
