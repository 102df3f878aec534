"""Co-occurrence analytics on one page — the three views of the same
part-co-purchase data (north-star extensions; the reference has no
graph surface):

    within-order part pairs
      -> association:  support / confidence / lift   (operators.basket)
      -> structure:    per-node triangle counts       (operators.graph)
      -> importance:   PageRank over directed edges   (operators.graph)
      -> clustering:   connected components survivors (operators.components)

Every step is exact-integer or DECIMAL-disciplined, so each has a
DuckDB oracle twin in the declared query set (x83, x81, x67, x23).
Scale notes inline: pair space is bounded by basket sizes, wedges by
the degree orientation's O(|E|^1.5), PageRank/CC by per-round O(|E|).

Run: python examples/graph_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from meshinsights_data_pipeline_spark.operators.basket import (  # noqa: E402
    basket_pair_stats,
)
from meshinsights_data_pipeline_spark.operators.components import (  # noqa: E402
    connected_components,
)
from meshinsights_data_pipeline_spark.operators.graph import (  # noqa: E402
    pagerank,
    triangle_counts,
)
from meshinsights_data_pipeline_spark.session import get_spark, read_table  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark("graph-analytics")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")

    # Association: which parts sell together more than chance predicts?
    stats = basket_pair_stats(li, "l_orderkey", "l_partkey", min_support_count=2)
    print("-- top pairs by lift (support >= 2 baskets) --")
    stats.orderBy(F.desc("lift"), "item_a", "item_b").show(5)

    # The same co-occurrences as an undirected graph (bounded slice for
    # the demo; the operators themselves never need one).
    small = li.filter(F.col("l_partkey") < 800)
    a = small.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = small.select("l_orderkey", F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )

    print("-- densest neighborhoods (triangle counts) --")
    triangle_counts(edges).orderBy(F.desc("triangles"), "node").show(5)

    print("-- most central parts (PageRank, 3 rounds) --")
    pagerank(edges, iterations=3).orderBy(F.desc("rank"), "node").show(5)

    print("-- co-purchase clusters (connected components) --")
    labels = connected_components(edges, "src", "dst")
    labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("members")
    ).orderBy(F.desc("members"), "cluster_id").show(5)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
