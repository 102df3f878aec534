"""Connected components over near-duplicate pair graphs.

The last step of a real dedup pipeline: pair detection (MinHash/SimHash/
embedding LSH) emits EDGES, but the unit of deduplication is the CLUSTER —
transitively connected docs collapse to one survivor. This module closes
that gap with an iterative min-label propagation expressed as DataFrame
joins (north-star extension; the reference has no graph surface).

Scale design: each iteration is one equi-join + one min-aggregate — both
shuffle on the node id, so the per-iteration cost is O(|E|) with map-side
combine, never materializing anything corpus^2. Iteration count is the
graph DIAMETER, and near-dup graphs are forests of tiny dense clusters
(diameter 2-4 in practice), so the loop converges in a handful of rounds.
The driver-side loop-with-convergence-check is a deliberate job boundary
(an iterative algorithm needs one); the per-round label frame (one row per
node appearing in any pair — far smaller than the corpus) is localCheckpoint-ed
each round. Checkpointing, not persist: each round's plan embeds the
previous round's TWICE (once via the neighbor aggregate, once via the
update join), so without lineage truncation the logical plan doubles per
iteration — a 10-round run measurably collapses (exponential plan tree,
StackOverflow in plan stringification). Checkpoint truncates the plan to
the stored result, keeping every round's plan constant-size.
For graphs with pathological diameters the alternating large-star/
small-star algorithm (Kiveris et al., "Connected Components in MapReduce")
drops rounds to O(log n); near-dup workloads do not need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.barrier import materialize as _materialize


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Component label (min member id) for every node in ``pairs``.

    Input: an undirected edge list [src_col, dst_col] (orientation
    irrelevant; duplicates tolerated). Output: [id, cluster_id] where
    cluster_id is the smallest node id in the component — the canonical
    dedup survivor. Nodes not present in any pair are absent (singletons
    are their own survivor by definition).

    Converges when no label changes; raises if ``max_iter`` rounds were
    insufficient (a diameter-``max_iter`` near-dup graph means the pair
    threshold is far too loose — fail loudly rather than emit a partially
    propagated clustering).

    Durability note for long cluster runs: ``localCheckpoint`` stores the
    per-round frame on executors, so losing an executor mid-run fails the
    job (Spark rejects recomputing a truncated lineage). Rounds are few and
    each is cheap to rerun, so that is the right default; a deployment that
    cannot tolerate job retry should set ``sparkContext.setCheckpointDir``
    and swap in reliable ``DataFrame.checkpoint`` — the algorithm is
    unchanged.
    """
    edges = _materialize(
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            edges.unpersist()
            return labels.select(F.col("id"), F.col("label").alias("cluster_id"))
    edges.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations; "
        "the pair graph has a pathological diameter — tighten the pair "
        "threshold or use an alternating-star implementation"
    )


def dedup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Rows of ``df`` that survive cluster-level deduplication.

    Every doc in a near-dup cluster except the min-id representative is
    dropped; docs in no pair pass through untouched (anti-join on the
    non-survivor set — one broadcast-eligible shuffle, corpus never
    self-joins).
    """
    comp = connected_components(pairs, src_col, dst_col)
    losers = comp.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
