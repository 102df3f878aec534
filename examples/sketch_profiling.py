"""Constant-memory corpus profiling on one page — the pass a 100 TB
corpus runs instead of exact distinct / frequency / overlap:

    HLL per-source cardinality        (sketch.hll_cardinality, p=10:
                                       1024 registers/source, ~3% sigma)
      -> CMS hot-token dashboard      (sketch.cms_counts/cms_estimate:
                                       4 x 1024 counters/source,
                                       estimates never underestimate)
      -> KMV pairwise source overlap  (sketch.kmv_pairwise_overlap:
                                       bottom-128 hashes/source,
                                       Jaccard/union/intersection)
      -> sketch-vs-truth readout      (exact numbers at this SF fit in
                                       memory; at 100 TB only the
                                       sketch side survives)

Every sketch state is constant per source no matter the corpus size,
merges exactly (MAX / SUM / k-smallest-of-union — the streaming twins
streaming_hll_ingest / streaming_cms_ingest fold micro-batches into
the same state), and is a pure function of the data: re-running on the
same corpus gives bit-identical registers, counters, and minima.

Run: python examples/sketch_profiling.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meshinsights_data_pipeline_spark.operators.sketch import (  # noqa: E402
    cms_counts,
    cms_estimate,
    hll_cardinality,
    kmv_pairwise_overlap,
)
from meshinsights_data_pipeline_spark.operators.text import (  # noqa: E402
    normalized_text,
)
from meshinsights_data_pipeline_spark.session import (  # noqa: E402
    get_spark,
    read_table,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("sketch-profiling", shuffle_partitions=8)
    docs = read_table(spark, sf_dir, "documents")

    # 1. how many distinct documents does each source carry?
    print("== HLL distinct-text estimate vs exact ==")
    est = hll_cardinality(docs, ["source"], "text", p=10)
    exact = docs.groupBy("source").agg(
        F.countDistinct("text").alias("exact")
    )
    est.join(exact, "source").orderBy("source").show(8, truncate=False)

    # 2. hot-token dashboard: CMS estimates for the global top tokens
    print("== CMS hot-token estimates (upper bounds) ==")
    toks = docs.filter(
        F.col("source").isNotNull() & F.col("text").isNotNull()
    ).select(
        "source",
        F.explode(F.split(normalized_text(F.col("text")), " ")).alias(
            "token"
        ),
    ).filter(F.col("token") != "")
    items = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .orderBy(F.col("_cnt").desc(), F.col("token").asc())
        .limit(5)
        .select("token")
    )
    state = cms_counts(toks, ["source"], "token", depth=4, width=1024)
    cms_estimate(
        state, ["source"], items, "token", depth=4, width=1024
    ).orderBy("source", "token").show(10, truncate=False)

    # 3. which sources overlap? (recrawl / mirror detection)
    print("== KMV pairwise source overlap ==")
    kmv_pairwise_overlap(docs, "source", "text", k=128).orderBy(
        F.col("jaccard_est").desc(), "source_a", "source_b"
    ).show(8, truncate=False)


if __name__ == "__main__":
    main()
