"""Entity resolution end-to-end on the customer table: blocked record
linkage -> connected components -> golden-record survivors — the
warehouse-dedup pipeline that is the structured-record sibling of
corpus near-dup collapse.

1. blocked_record_linkage: candidate pairs share a (nation, segment)
   block; weighted field agreement (name Levenshtein + balance
   proximity) past a threshold marks probable same-entity pairs.
2. connected_components: transitively linked records collapse to one
   cluster (A~B, B~C => one entity even if A-C never scored).
3. Survivors: the min-id record per cluster, anti-joining the rest —
   exactly dedup_survivors' contract.

Run: python examples/record_linkage.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.components import (
    connected_components,
)
from meshinsights_data_pipeline_spark.operators.linkage import (
    blocked_record_linkage,
)
from meshinsights_data_pipeline_spark.session import get_spark, read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("record-linkage-example")
    cust = read_table(spark, sf_dir, "customer")

    pairs = blocked_record_linkage(
        cust, "c_custkey", ["c_nationkey", "c_mktsegment"],
        "c_name", "c_acctbal", numeric_scale=2000.0, threshold=0.9,
    )
    n_pairs = pairs.count()
    print(f"linked pairs (score >= 0.9): {n_pairs}")

    if n_pairs:
        comp = connected_components(pairs, "id_a", "id_b")
        losers = comp.filter(F.col("id") != F.col("cluster_id")).select(
            F.col("id").alias("c_custkey")
        )
        survivors = cust.join(losers, "c_custkey", "left_anti")
        clusters = comp.groupBy("cluster_id").count()
        print(f"entity clusters: {clusters.count()}; "
              f"records {cust.count()} -> golden records {survivors.count()}")
        clusters.orderBy(F.col("count").desc()).show(5)
    spark.stop()


if __name__ == "__main__":
    main()
