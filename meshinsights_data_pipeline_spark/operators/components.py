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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.barrier import materialize as _materialize


def _ckpt(df: DataFrame, reliable: bool) -> DataFrame:
    """Truncate lineage: executor-local by default; reliable (HDFS/object-
    store via ``sparkContext.setCheckpointDir``) when the caller cannot
    tolerate whole-job retry on executor loss mid-run."""
    return df.checkpoint() if reliable else df.localCheckpoint()


def _ckpt_lazy(df: DataFrame, reliable: bool) -> DataFrame:
    """Lazy lineage truncation (r17): the frame is pinned exactly like
    :func:`_ckpt` but materializes with the FIRST consuming job instead
    of its own — used for the loop seeds, whose next job (the signature
    aggregate / round-1 checkpoint) runs immediately anyway, so the
    eager form paid one whole job round-trip for nothing."""
    return df.checkpoint(eager=False) if reliable else df.localCheckpoint(eager=False)


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
    reliable_checkpoint: bool = False,
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
    and pass ``reliable_checkpoint=True`` — the algorithm is unchanged.
    """
    # Symmetrize with ONE scan of ``pairs`` via explode, not a self-union:
    # a union of two projections embeds the (expensive — verified-Jaccard
    # join for near-dup inputs) pair plan twice, and the distinct's shuffle
    # sits above both copies so nothing is reused. Measured at sf1: the
    # union form materialized in 5.1s hot vs 2.6s for the explode form.
    #
    # repartition("src") before the barrier (r17, guide §2.4): the
    # cached InMemoryRelation preserves its hash partitioning, so the
    # per-round ``edges ⋈ labels`` join shuffles ONLY the label frame —
    # without it every round re-exchanged the full 2|E| cached edge
    # rows by src (the distinct leaves them partitioned by (src, dst)).
    # One extra exchange at build, one 2|E| exchange saved per round;
    # composed x23 at sf1 measured 3.9-4.25s -> 3.15-3.29s warm.
    edges = _materialize(
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
                    ),
                    F.struct(
                        F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .repartition("src")
    )
    # Seed labels with min(id, min(neighbor)) — exactly what round 1
    # would compute from identity labels, for the cost of the one
    # aggregation the identity init already paid. Every node appears as
    # src (edges are symmetrized above), and the loop's convergence check
    # is unchanged, so this just removes one full round (checkpoint +
    # count job) from every run. Lazily checkpointed: round 1's merged
    # checkpoint job materializes it, and a worst-case cache race only
    # recomputes one aggregate over the cached edge blocks.
    labels = _ckpt_lazy(
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.min("dst").alias("_mn"))
        .select("id", F.least(F.col("id"), F.col("_mn")).alias("label")),
        reliable_checkpoint,
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # Fused merge+convergence (the star loop's one-checkpoint-per-round
        # discipline): materialize the merged labels WITH a per-row advanced
        # flag in a single checkpoint job, then read the convergence count
        # off the checkpointed frame — a cache scan, not a recompute. The
        # nbr join+aggregate therefore runs exactly ONCE per round; the
        # previous check-then-materialize shape ran it twice on every
        # advancing round (the dominant CC cost for multi-round graphs,
        # e.g. incremental maintenance chaining several components).
        merged = _ckpt(
            labels.join(nbr, "id", "left").select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("new_label"),
                F.coalesce(
                    F.col("nbr_label") < F.col("label"), F.lit(False)
                ).alias("_adv"),
            ),
            reliable_checkpoint,
        )
        improved = merged.filter(F.col("_adv")).count()
        labels = merged.select("id", F.col("new_label").alias("label"))
        if improved == 0:
            edges.unpersist()
            return labels.select(F.col("id"), F.col("label").alias("cluster_id"))
    edges.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations; "
        "the pair graph has a pathological diameter — tighten the pair "
        "threshold or use an alternating-star implementation"
    )


def incremental_components(
    labels: DataFrame,
    new_pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
    reliable_checkpoint: bool = False,
    algorithm: str = "min_label",
) -> DataFrame:
    """Fold new edges into an existing ``[id, cluster_id]`` labeling
    without re-running CC over the full accumulated pair history.

    The prior labeling IS the prior connectivity, compressed: every
    component is a diameter-2 star around its min-id. So treating each
    label row as an edge ``id -> cluster_id`` and running min-label CC
    over (label stars) ∪ (new pairs) yields exactly the labeling batch CC
    would produce on the full pair set — but the input is O(|nodes| +
    |new pairs|) edges instead of O(all pairs ever), and the stars keep
    the effective diameter tiny (rounds ~ length of the longest chain of
    components the NEW edges link together, not graph history). This is
    the batch half of streaming cluster maintenance
    (streaming/dedup.py:streaming_lsh_ingest with ``labels_dir``).

    Singleton rows (id == cluster_id) survive as self-loops; ids absent
    from both inputs are absent from the output, as in batch CC.

    ``algorithm``: ``min_label`` (default) needs ~1 round per component
    the new edges CHAIN together and raises past ``max_iter`` — the right
    trade for near-dup maintenance, where a batch rarely links more than
    a few clusters. A batch that daisy-chains many components (tested:
    12 exceeds 20 rounds) should pass ``algorithm="star"`` — the
    alternating-star variant converges in O(log n) rounds on any shape.
    """
    if algorithm not in ("min_label", "star"):
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    star_edges = labels.select(
        F.col("id").alias(src_col), F.col("cluster_id").alias(dst_col)
    )
    merged = star_edges.unionByName(
        new_pairs.select(F.col(src_col), F.col(dst_col))
    )
    cc = connected_components if algorithm == "min_label" else connected_components_star
    return cc(
        merged, src_col, dst_col,
        max_iter=max_iter, reliable_checkpoint=reliable_checkpoint,
    )


def dedup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    algorithm: str = "star",
) -> DataFrame:
    """Rows of ``df`` that survive cluster-level deduplication.

    Every doc in a near-dup cluster except the min-id representative is
    dropped; docs in no pair pass through untouched (anti-join on the
    non-survivor set — one broadcast-eligible shuffle, corpus never
    self-joins). ``algorithm``: ``star`` (default; alternating
    large/small star, O(log n) rounds even on pathological diameters —
    re-measured r12 after both twins got the explode fusion: faster
    standalone on the raw pair graphs — x26 2.9s vs x23 4.0s warm,
    4.2s vs 4.7s sf1 steady — and O(log n) rounds on any diameter) or
    ``min_label`` (simpler label propagation; within run noise of star
    when composed into the corpus pipeline's shallow post-gate graphs,
    and that pipeline's default).
    """
    if algorithm not in ("min_label", "star"):
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    cc = connected_components if algorithm == "min_label" else connected_components_star
    comp = cc(pairs, src_col, dst_col)
    losers = comp.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def connected_components_star(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 30,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Alternating large-star / small-star connected components (Kiveris
    et al. 2014, "Connected Components in MapReduce and Beyond", §3) —
    the O(log n)-round scale path for graphs whose diameter makes plain
    min-label propagation (``connected_components``) iterate too long.

    Same contract as ``connected_components``: input an undirected edge
    list, output [id, cluster_id] with cluster_id = min member id, for
    every node appearing in any pair. The two implementations are
    interchangeable (x26's oracle is literally x23's SQL fixpoint), so a
    pipeline can pick by graph shape: near-dup forests of tiny clusters →
    min-label; social-graph-diameter inputs → this.

    Each half-round is ONE node-keyed exchange (r17, guide §2.4): the
    neighborhood minimum is a window aggregate over the symmetrized
    edges' partition key, replacing the groupBy-min + co-partitioned
    join-back pair that exchanged the same rows twice (and sort-merged
    them); the window's partition-key sort is the sort the join paid
    anyway. Still O(|E|), no corpus-squared term; a pathological hub
    node's neighborhood is buffered by the (spilling) window operator
    where the join buffered the same rows in its streamed-side group.
    The two half-rounds fuse into one plan with a single end-of-round
    checkpoint (lineage truncation for the same plan-doubling reason
    documented on ``connected_components``; one materialization job per
    round instead of two). The intermediate large-star distinct is also
    gone: duplicate re-pointed edges collapse in the end-of-round
    distinct, and dropping the extra exchange measured faster than
    deduping early (composed x26 at sf1: 4.31-4.81s -> 3.93-4.21s warm
    for the whole round rewrite).

    large-star: every neighbor v > u re-points to min(N(u) ∪ {u});
    small-star (on larger→smaller directed edges): every neighbor and u
    itself re-point to the minimum. The fixpoint is a star forest rooted
    at each component's minimum.
    """
    # Canonical directed edges big -> small; drop self-loops up front.
    # Lazily checkpointed: the initial signature aggregate materializes
    # it in the same job (the eager form paid a separate checkpoint job
    # before the first signature every run).
    e = _ckpt_lazy(
        pairs.select(
            F.greatest(F.col(src_col), F.col(dst_col)).alias("u"),
            F.least(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct(),
        reliable_checkpoint,
    )
    # The final [id] roster comes from the ORIGINAL edge set; keep the
    # first checkpoint referenced and compute the roster lazily at
    # convergence (explode: one scan) instead of materializing a second
    # frame up front — one fewer checkpoint job on every run, and the
    # roster scan reads executor-local blocks, not the pair plan.
    e0 = e

    def _signature(edges: DataFrame) -> tuple:
        # bit_xor, not sum: order-independent and cannot overflow under ANSI.
        row = edges.agg(
            F.count("*").alias("c"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("s"),
        ).first()
        return (row["c"], row["s"])

    w = Window.partitionBy("u")
    sig = _signature(e)
    for _ in range(max_iter):
        # Both half-rounds build ONE lazy plan materialized by a single
        # checkpoint per round (measured ~1.4x off the whole run at sf0.1:
        # one job round-trip instead of two). The round-end checkpoint
        # still truncates lineage, so plan size stays constant across
        # rounds.
        # -- large-star: every strictly-larger neighbor of u re-points to
        #    m = min(N(u) + {u}), computed as a window-min over the
        #    symmetrized edges' partition key — one exchange, no join.
        #    Symmetrize via explode — ONE scan of the checkpointed edge
        #    blocks (the union form scanned them twice per round; same
        #    fusion the min-label twin got, measured there at sf1).
        sym = e.select(
            F.explode(
                F.array(
                    F.struct(F.col("u"), F.col("v")),
                    F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
                )
            ).alias("p")
        ).select("p.u", "p.v")
        e_ls = (
            sym.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # -- small-star: edges are big->small; u and every non-min neighbor
        #    re-point to m = min of the neighborhood (all < u, so min(v)),
        #    again a window-min — one exchange, no join. (v -> m) ∪ (u -> m)
        #    as one explode so the subtree is embedded once.
        e = _ckpt(
            e_ls.withColumn("m", F.min("v").over(w))
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                        F.struct(F.col("u"), F.col("m").alias("v")),
                    )
                ).alias("p")
            )
            .select("p.u", "p.v")
            .filter(F.col("u") != F.col("v"))
            .distinct(),
            reliable_checkpoint,
        )
        new_sig = _signature(e)
        if new_sig == sig:
            all_nodes = (
                e0.select(F.explode(F.array("u", "v")).alias("id")).distinct()
            )
            assignment = all_nodes.join(
                e.select(F.col("u").alias("id"), F.col("v").alias("cluster_id")),
                "id",
                "left",
            ).select("id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id"))
            return assignment
        sig = new_sig
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} rounds"
    )


def dedup_survivors_by(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    algorithm: str = "star",
) -> DataFrame:
    """Quality-aware cluster dedup: one survivor per near-dup cluster,
    chosen by HIGHEST ``score_col`` (ties -> smallest id) instead of
    :func:`dedup_survivors`' min-id convention — the FineWeb-style
    "keep the best member" policy: when a boilerplate-laden copy and a
    clean original near-dup each other, min-id keeps whichever crawled
    first; this keeps the one the quality scorer prefers. Docs in no
    pair pass through untouched.

    The winner rank is the total order (score DESC, id ASC), so the
    survivor set is engine- and partitioning-independent even with
    tied scores.

    Scale shape: components run at |clustered nodes| cardinality (tiny
    next to the corpus); the score join and winner ranking stay at that
    cardinality (hot-group-safe grouped_row_number — a pathological
    giant cluster spans partitions, never one task); the corpus is
    touched exactly once, by the final anti-join on the loser set.
    """
    if algorithm not in ("min_label", "star"):
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    from meshinsights_data_pipeline_spark.operators.global_rank import (
        grouped_row_number,
    )

    cc = (
        connected_components
        if algorithm == "min_label"
        else connected_components_star
    )
    comp = cc(pairs, src_col, dst_col)
    scored = comp.join(
        df.select(
            F.col(id_col).alias("id"), F.col(score_col).alias("_score")
        ),
        "id",
    )
    ranked = grouped_row_number(
        scored,
        ["cluster_id"],
        [F.col("_score").desc(), F.col("id").asc()],
        out_col="_rk",
    )
    losers = ranked.filter(F.col("_rk") > 1).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
