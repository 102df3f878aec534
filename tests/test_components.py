"""Connected components / cluster-level dedup (operators.components)."""

from __future__ import annotations

import pytest

from meshinsights_data_pipeline_spark.operators.components import (
    connected_components,
    dedup_survivors,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, ["id_a", "id_b"])


def test_chain_clique_and_isolated_pair(spark):
    # chain 1-2-3, clique 10-11-12 (all edges), isolated pair 20-21
    pairs = _pairs(
        spark,
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
    )
    got = {
        (r["id"], r["cluster_id"])
        for r in connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_orientation_and_duplicates_irrelevant(spark):
    # same component however edges are oriented / repeated
    pairs = _pairs(spark, [(5, 4), (4, 5), (3, 4), (5, 3)])
    got = {
        (r["id"], r["cluster_id"])
        for r in connected_components(pairs).collect()
    }
    assert got == {(3, 3), (4, 3), (5, 3)}


def test_long_chain_converges(spark):
    # diameter 9: needs several propagation rounds, still within max_iter
    pairs = _pairs(spark, [(i, i + 1) for i in range(10)])
    got = connected_components(pairs).collect()
    assert all(r["cluster_id"] == 0 for r in got)
    assert len(got) == 11


def test_non_convergence_raises(spark):
    pairs = _pairs(spark, [(i, i + 1) for i in range(8)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2)


def test_dedup_survivors_keeps_min_and_untouched(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], ["doc_id", "text"]
    )
    pairs = _pairs(spark, [(1, 2), (2, 4)])
    kept = sorted(
        r["doc_id"]
        for r in dedup_survivors(df, pairs, "doc_id").collect()
    )
    # cluster {1,2,4} -> survivor 1; docs 0,3,5 untouched
    assert kept == [0, 1, 3, 5]


def test_star_matches_min_label_on_random_graphs(spark):
    import random

    from meshinsights_data_pipeline_spark.operators.components import (
        connected_components_star,
    )

    for seed in (7, 8):
        rnd = random.Random(seed)
        edges = [(rnd.randrange(120), rnd.randrange(120)) for _ in range(130)]
        edges = [(a, b) for a, b in edges if a != b]
        pairs = _pairs(spark, edges)
        base = sorted(map(tuple, connected_components(pairs).collect()))
        star = sorted(map(tuple, connected_components_star(pairs).collect()))
        assert base == star


def test_star_handles_high_diameter_path(spark):
    # A 60-node path has diameter 59 — min-label would need ~59 rounds;
    # the alternating star algorithm collapses it in O(log n).
    from meshinsights_data_pipeline_spark.operators.components import (
        connected_components_star,
    )

    pairs = _pairs(spark, [(i, i + 1) for i in range(59)])
    got = {(r["id"], r["cluster_id"]) for r in connected_components_star(pairs).collect()}
    assert got == {(i, 0) for i in range(60)}


def test_reliable_checkpoint_path(spark, tmp_path):
    # same result via DataFrame.checkpoint when a checkpoint dir is set —
    # the durable mode for long cluster runs (executor loss survivable)
    from meshinsights_data_pipeline_spark.operators.components import (
        connected_components_star,
    )

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11)])
    for fn in (connected_components, connected_components_star):
        got = {
            (r["id"], r["cluster_id"])
            for r in fn(pairs, reliable_checkpoint=True).collect()
        }
        assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_dedup_survivors_star_matches_min_label(spark):
    df = spark.createDataFrame([(i, f"d{i}") for i in range(8)], ["id", "v"])
    pairs = _pairs(spark, [(0, 1), (1, 2), (5, 6)])
    a = sorted(
        map(
            tuple,
            dedup_survivors(df, pairs, "id", algorithm="min_label").collect(),
        )
    )
    b = sorted(
        map(tuple, dedup_survivors(df, pairs, "id", algorithm="star").collect())
    )
    assert a == b
    assert [r[0] for r in a] == [0, 3, 4, 5, 7]
    with pytest.raises(ValueError):
        dedup_survivors(df, pairs, "id", algorithm="bogus")


def test_incremental_components_matches_batch(spark):
    """Folding edges in two installments through the label-star rewrite
    must equal batch CC over the full edge set — including edges that
    MERGE two previously separate components, and untouched components
    surviving as-is."""
    from meshinsights_data_pipeline_spark.operators.components import (
        incremental_components,
    )

    first = [(1, 2), (2, 3), (10, 11), (20, 21), (30, 30)]
    second = [(3, 10), (40, 41), (11, 50)]  # merges {1..3}+{10,11}, new, extends
    labels0 = connected_components(_pairs(spark, first))
    inc = {
        (r.id, r.cluster_id)
        for r in incremental_components(labels0, _pairs(spark, second)).collect()
    }
    full = {
        (r.id, r.cluster_id)
        for r in connected_components(_pairs(spark, first + second)).collect()
    }
    assert inc == full
    assert (30, 30) in inc  # untouched singleton self-loop survives


def test_incremental_components_long_chain_merge(spark):
    """Worst case for the bounded min-label pass: one batch of new edges
    daisy-chains 12 previously independent components (rounds scale with
    the chain of components linked, the documented bound) — the result
    must still equal batch CC over everything, and the chain must
    collapse to the single minimum id."""
    from meshinsights_data_pipeline_spark.operators.components import (
        incremental_components,
    )

    # 12 components {10k, 10k+1} for k in 0..11
    first = [(10 * k, 10 * k + 1) for k in range(12)]
    # chain them end to end: 1-10, 11-20, ..., 101-110
    second = [(10 * k + 1, 10 * (k + 1)) for k in range(11)]
    labels0 = connected_components(_pairs(spark, first))
    # min-label needs ~diameter rounds (~23 here) and must FAIL LOUDLY
    # past max_iter rather than emit a partial labeling.
    with pytest.raises(RuntimeError, match="did not converge"):
        incremental_components(labels0, _pairs(spark, second))
    # the star algorithm converges in O(log n) rounds on the same input
    inc = {
        (r.id, r.cluster_id)
        for r in incremental_components(
            labels0, _pairs(spark, second), algorithm="star"
        ).collect()
    }
    # the full path graph (35 nodes, diameter ~23) also exceeds plain
    # min-label's budget — the reference labeling needs star (or a raised
    # max_iter) too, which is exactly the documented trade.
    full = {
        (r.id, r.cluster_id)
        for r in connected_components(
            _pairs(spark, first + second), max_iter=40
        ).collect()
    }
    assert inc == full
    assert {c for _, c in inc} == {0}  # everything collapses to min id 0


def test_dq_checks_empty_input_defined_not_null(spark):
    """The quality gate on an empty feed must be DEFINED: zero counts
    and violation_frac 0.0, never NULLs that silently pass (or fail)
    threshold comparisons. Callers reject empty batches via n_rows."""
    from pyspark.sql import functions as F

    from meshinsights_data_pipeline_spark.operators.dq import dq_checks

    df = spark.createDataFrame([], "id long, v double").filter("id > 0")
    rows = dq_checks(
        df, {"v_nonneg": F.col("v") >= 0, "id_set": F.col("id").isNotNull()}
    ).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.n_rows == 0
        assert r.n_violations == 0
        assert r.violation_frac == 0.0


def test_pagerank_two_node_cycle_symmetric(spark):
    """A<->B with no dangling mass: ranks stay exactly 0.5 each at any
    iteration count (fixed point), summing to 1."""
    from meshinsights_data_pipeline_spark.operators.graph import pagerank

    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = {r.node: r.rank for r in pagerank(e, iterations=5).collect()}
    assert got == {1: 0.5, 2: 0.5}


def test_pagerank_star_sink_and_duplicates(spark):
    """3 spokes -> 1 hub: the hub is dangling (mass not redistributed,
    total < 1); duplicate edges must not multiply contributions; hand
    value after 1 round: hub = 0.25*0.15 + 0.85*(3*0.25) = 0.675."""
    from meshinsights_data_pipeline_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9), (3, 9)], "src long, dst long"
    )
    got = {r.node: r.rank for r in pagerank(e, iterations=1).collect()}
    assert got[9] == round(0.15 / 4 + 0.85 * 0.75, 6)
    for spoke in (1, 2, 3):
        assert got[spoke] == round(0.15 / 4, 6)
    assert sum(got.values()) < 1.0  # dangling hub leaks mass by design


def test_pagerank_empty_edges(spark):
    from meshinsights_data_pipeline_spark.operators.graph import pagerank

    e = spark.createDataFrame([], "src long, dst long")
    assert pagerank(e, iterations=2).count() == 0


def test_pagerank_checkpoint_rounds_match_unchecked(spark):
    """Lineage truncation must not change values: 6 rounds with
    checkpoint_every=2 equals 6 rounds with no mid-run checkpoint."""
    from meshinsights_data_pipeline_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 2)], "src long, dst long"
    )
    a = {r.node: r.rank for r in pagerank(e, iterations=6, checkpoint_every=2).collect()}
    b = {r.node: r.rank for r in pagerank(e, iterations=6, checkpoint_every=99).collect()}
    assert a == b
