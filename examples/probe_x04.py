"""Probe the x04/x05 bench bimodality: run them repeatedly in isolation,
then after a memory-pressure-inducing prefix (x01..x03), printing per-run
times. Not part of the bench; a diagnostic."""
import os
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from meshinsights_data_pipeline_spark.session import get_spark, read_table
from meshinsights_data_pipeline_spark.plans.queries import QUERIES

spark = get_spark("probe-x04")
spark.range(1_000_000).selectExpr("sum(id)").collect()
read_table(spark, sf_dir, "region").write.format("noop").mode("overwrite").save()


def run(name):
    q = QUERIES[name]
    t0 = time.perf_counter()
    q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


print("== isolated x04 x5 runs ==")
for i in range(5):
    print(i, run("x04_ngram_jaccard"))
print("== isolated x05 x5 runs ==")
for i in range(5):
    print(i, run("x05_simhash"))
print("== bench-order prefix then x04/x05 ==")
for pre in ["x02_minhash_signatures", "x03_minhash_lsh_pairs"]:
    print(pre, run(pre))
print("x04", run("x04_ngram_jaccard"))
print("x04", run("x04_ngram_jaccard"))
print("x05", run("x05_simhash"))
print("x05", run("x05_simhash"))
