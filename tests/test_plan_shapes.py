"""Physical-plan shape guards: the scale properties the operators claim
(map-side = no Exchange; JVM-only = no Python eval stage) asserted on the
executed plan, so a refactor that silently adds a shuffle or drops to
per-row Python fails CI — the same discipline as operators/skew.py's
no-Exchange bucketed-join assertion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.corpus import (
    chunk_documents,
    gopher_quality,
)
from meshinsights_data_pipeline_spark.operators.text import (
    lang_id,
    pii_counts,
    quality_score,
    redact_pii,
)
from meshinsights_data_pipeline_spark.session import read_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark, sf_smoke):
    return read_table(spark, sf_smoke, "documents")


def test_gopher_quality_is_map_side(docs):
    p = _plan(gopher_quality(docs, "doc_id", "text"))
    assert "Exchange" not in p
    assert "EvalPython" not in p


def test_line_repetition_signals_is_map_side(docs):
    from meshinsights_data_pipeline_spark.operators.corpus import (
        line_repetition_signals,
    )

    p = _plan(line_repetition_signals(docs, "doc_id", "text"))
    assert "Exchange" not in p
    assert "EvalPython" not in p


def test_chunk_documents_is_narrow(docs):
    p = _plan(chunk_documents(docs, "doc_id", "text", 32))
    assert "Exchange" not in p
    assert "EvalPython" not in p


def test_pii_redaction_is_map_side(docs):
    p = _plan(docs.select("doc_id", redact_pii(F.col("text")).alias("r")))
    assert "Exchange" not in p
    p2 = _plan(pii_counts(docs, "doc_id", "text"))
    assert "Exchange" not in p2


def test_quality_score_is_map_side(docs):
    p = _plan(docs.select("doc_id", quality_score("text").alias("q")))
    assert "Exchange" not in p
    assert "EvalPython" not in p


def test_lang_id_is_map_side_jvm_only(docs):
    p = _plan(lang_id(docs, "text"))
    assert "Exchange" not in p
    assert "EvalPython" not in p


def test_scan_prunes_columns(docs):
    """Column pruning must reach the parquet scan: a doc_id-only
    projection reads one column, not the whole documents schema."""
    p = _plan(docs.select("doc_id"))
    assert "ReadSchema: struct<doc_id:bigint>" in p


def test_shuffle_shards_single_exchange(docs):
    """shuffle_shards claims ONE exchange (on the shard key for the
    window); a second one would mean the hash/shard projection stopped
    being map-side."""
    from meshinsights_data_pipeline_spark.operators.corpus import shuffle_shards

    p = _plan(shuffle_shards(docs, "doc_id", n_shards=8))
    assert p.count("Exchange hashpartitioning") == 1
    assert "EvalPython" not in p


def test_boilerplate_ngrams_no_python(docs):
    from meshinsights_data_pipeline_spark.operators.corpus import (
        boilerplate_ngrams,
    )

    p = _plan(boilerplate_ngrams(docs, "doc_id", "text"))
    assert "EvalPython" not in p


def test_kmeans_update_no_python_no_cartesian_blowup(spark, sf_smoke):
    """kmeans_update stays JVM-side and its only cross join is the
    broadcast centroid assignment (dim-table-sized), never corpus x
    corpus."""
    from meshinsights_data_pipeline_spark.operators.similarity import (
        kmeans_update,
    )

    emb = read_table(spark, sf_smoke, "embeddings")
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    p = _plan(kmeans_update(emb, cents))
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p  # centroid cross join is broadcast


def test_cosine_topk_rank_is_two_phase(spark, sf_smoke):
    """The top-k rank must be the salted two-phase shape (local top-k per
    (query, salt), then true top-k over survivors) — a single per-query
    window sends every scored corpus row for one query into one task at
    scale. Two Window stages in the executed plan = two-phase."""
    from meshinsights_data_pipeline_spark.operators.similarity import (
        cosine_topk,
    )

    emb = read_table(spark, sf_smoke, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    p = _plan(cosine_topk(emb, q, k=5))
    assert p.count("Window") >= 2
    assert "EvalPython" not in p


def test_semantic_dedup_cap_shards_pathological_cluster(spark):
    """A single huge cluster must spread across >= s shards when the cap
    is active: with one centroid and max_cluster_size=8 over 64 rows the
    pair keys carry ceil(64/8)=8 distinct shard ids, and no cross-shard
    pair survives (each shard's pair space is independent)."""
    from meshinsights_data_pipeline_spark.operators.similarity import (
        ivf_assign,
        semantic_dedup_pairs,
    )

    rows = [(i, [1.0, 0.0, 0.0, float(i % 3) * 1e-4]) for i in range(64)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])],
        "centroid_id long, centroid_vec array<float>",
    )
    # everything lands in cluster 0 (single centroid)
    assert (
        ivf_assign(emb, cents).select("list_id").distinct().count() == 1
    )
    pairs = semantic_dedup_pairs(
        emb, cents, threshold=0.0, max_cluster_size=8
    ).collect()
    n_shards = 64 // 8

    def shard(i):  # mirror of the operator's md5_int60(id) % n_shards
        import hashlib

        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % n_shards

    assert pairs  # within-shard pairs exist
    for r in pairs:
        assert shard(r.id_a) == shard(r.id_b)  # never cross-shard
    # the pathological cluster spreads over every shard, and the pair
    # count is exactly sum-over-shards of C(|shard|, 2)
    from collections import Counter

    sizes = Counter(shard(i) for i in range(64))
    assert len(sizes) == n_shards
    assert len(pairs) == sum(c * (c - 1) // 2 for c in sizes.values())


def test_kmeans_fit_trains_usable_codebook(spark):
    """kmeans_fit converges on separable blobs: trained centroids assign
    each blob's members to one cluster, and the fit is deterministic
    (pure function of the input)."""
    from meshinsights_data_pipeline_spark.operators.similarity import (
        ivf_assign,
        kmeans_fit,
    )

    # two tight blobs around orthogonal axes + slight per-point jitter
    rows = [(i, [10.0 + (i % 3) * 0.1, 0.0, 0.0, 0.0]) for i in range(6)] + [
        (10 + i, [0.0, 0.0, 10.0 + (i % 3) * 0.1, 0.0]) for i in range(6)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    c1 = kmeans_fit(emb, k=2, max_iter=5)
    got = {
        r.vec_id: r.list_id
        for r in ivf_assign(emb, c1, "vec_id", "embedding").collect()
    }
    blob_a = {got[i] for i in range(6)}
    blob_b = {got[10 + i] for i in range(6)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b
    c2 = kmeans_fit(emb, k=2, max_iter=5)
    v1 = sorted((r.centroid_id, tuple(r.centroid_vec)) for r in c1.collect())
    v2 = sorted((r.centroid_id, tuple(r.centroid_vec)) for r in c2.collect())
    assert v1 == v2  # deterministic


def test_lm_quality_plan_shape(docs):
    """The LM scorer must stay JVM-side (no Python eval) and never grow a
    cartesian/nested-loop join — |V| is the only cross join and must be
    a broadcast one-row scalar."""
    from meshinsights_data_pipeline_spark.operators.corpus import lm_quality_score

    p = _plan(lm_quality_score(docs, "doc_id", "text"))
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p
    # the scalar |V| cross join is the broadcast nested-loop form; any
    # OTHER BNLJ (e.g. the count-table joins degrading) would add more
    assert p.count("BroadcastNestedLoopJoin") <= 1


def test_q45_preaggregates_before_outer_join(spark, sf_smoke):
    """q45's scale contract: orders are aggregated to per-custkey rows
    BELOW the outer join (the shuffle carries customer-cardinality, not
    the fact table)."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    plan = (
        QUERIES["q45"].spark(spark, sf_smoke)._jdf.queryExecution()
        .optimizedPlan().toString()
    )
    join_at = plan.index("Join LeftOuter")
    # an Aggregate must appear BELOW the join (later in the tree dump);
    # the final histogram aggregate sits above it (earlier)
    assert "Aggregate" in plan[join_at:], plan
    assert "Aggregate" in plan[:join_at], plan


def test_q46_semi_join_is_hash_based(spark, sf_smoke):
    """The mixed equi/non-equi EXISTS must plan as a hash- or sort-based
    LeftSemi on the key equality (the non-equi term rides as a join
    condition), never a nested-loop over the fact side."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    p = _plan(QUERIES["q46"].spark(spark, sf_smoke))
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q59_cube_is_single_expand_aggregate(spark, sf_smoke):
    """q59's CUBE must stay ONE Expand + hash aggregate (each row fans
    out to its 4 grouping sets map-side) — never a union of per-slice
    scans."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    p = _plan(QUERIES["q59"].spark(spark, sf_smoke))
    assert p.count("Expand") >= 1
    # one parquet scan of orders, not one per grouping set
    assert p.count("FileScan parquet") == 1, p


def test_q58_bag_setops_no_join_explosion(spark, sf_smoke):
    """intersectAll/exceptAll must lower to count-pairing aggregates +
    generators — no cartesian/nested-loop join of the two year slices."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    p = _plan(QUERIES["q58"].spark(spark, sf_smoke))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Generate" in p  # the replicate-rows generator of the ALL lowering


def test_q60_full_outer_preaggregated(spark, sf_smoke):
    """q60's scale contract (the q45 discipline on both sides): each year
    slice aggregates to customer cardinality BELOW the full outer join."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    plan = (
        QUERIES["q60"].spark(spark, sf_smoke)._jdf.queryExecution()
        .optimizedPlan().toString()
    )
    join_at = plan.index("Join FullOuter")
    below = plan[join_at:]
    assert below.count("Aggregate") >= 2, plan  # one per input side


def test_q62_range_frame_single_window_exchange(spark, sf_smoke):
    """q62 is one window over one hash exchange on the partition key; the
    RANGE frame must appear in the plan (specifiedwindowframe RangeFrame)
    rather than silently degrading to a ROWS frame."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    df = QUERIES["q62"].spark(spark, sf_smoke)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "RangeFrame" in opt, opt
    p = _plan(df)
    assert p.count("Window") == 1, p


def test_x57_source_overlap_joins_pairs_not_corpus(spark, sf_smoke):
    """x57's source lookups must join the TINY pair frame to the docs
    table — no corpus-level cartesian and no per-row Python anywhere."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    p = _plan(QUERIES["x57_source_overlap"].spark(spark, sf_smoke))
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_debounce_single_exchange(spark, sf_smoke):
    """Debounce is one window shuffle on the key - a refactor that adds a
    second Exchange (e.g. a separate sort or join) fails here."""
    from meshinsights_data_pipeline_spark.operators.debounce import debounce

    ev = read_table(spark, sf_smoke, "events")
    p = _plan(
        debounce(ev, ["user_id", "event_type"], ["ts", "event_id"], "ts", 3600)
    )
    assert p.count("Exchange") - p.count("ReusedExchange") <= 1
    assert "EvalPython" not in p


def test_runtime_bloom_filter_reaches_fact_scan(spark, sf_smoke):
    """At 100 TB a selective dim filter on a shuffle join should inject a
    runtime bloom filter that prunes the fact side before the shuffle
    (Spark's runtime.bloomFilter rewrite). The size thresholds that gate
    it are calibrated for real tables (10 GB application-side scans), so
    this test lowers them to prove OUR join shapes stay eligible — a
    refactor that hides the join key behind an expression or breaks the
    shuffle-join shape would stop the injection and fail here."""
    from pyspark.sql import functions as F

    from meshinsights_data_pipeline_spark.session import read_table

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold", "0",
        )
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = read_table(spark, sf_smoke, "lineitem")
        o = read_table(spark, sf_smoke, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        plan = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority").count()
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_q63_decile_no_single_partition_fact_sort(spark, sf_smoke):
    """q63's equal-depth decile must NOT be a global ntile window (one
    task sorts all orders). Required shape: the fact flows through an
    Exchange rangepartitioning + LOCAL sort into a broadcast join of the
    per-partition offsets; the only SinglePartition exchange allowed is
    the one above the tiny counts aggregate — so every SinglePartition
    in the plan must sit over a HashAggregate, never over the scan."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    df = QUERIES["q63"].spark(spark, sf_smoke)
    p = _plan(df)
    assert "ntile" not in p.lower(), p
    assert "rangepartitioning" in p, p
    assert "BroadcastHashJoin" in p, p
    for below in p.split("Exchange SinglePartition")[1:]:
        # the subtree beneath a SinglePartition exchange must begin with
        # the counts aggregate (tiny), not a raw file scan
        assert below.lstrip().splitlines()[0].strip().startswith(
            ("+- HashAggregate", "+- ShuffleQueryStage", "+- AQEShuffleRead")
        ) or "HashAggregate" in below.splitlines()[1], p


def test_q65_decorrelated_no_per_row_subquery(spark, sf_smoke):
    """Q17 shape: the correlated scalar AVG must decorrelate to hash
    aggregate + broadcast joins — never a nested-loop/cartesian re-scan
    of lineitem per part."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    p = _plan(QUERIES["q65"].spark(spark, sf_smoke))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert p.count("BroadcastHashJoin") >= 2, p


def test_q66_nested_semi_shape(spark, sf_smoke):
    """Q20 shape: both membership predicates must lower to semi joins
    (part slice into the fact, hot-supplier set into supplier), with the
    HAVING aggregate BETWEEN them — the fact is filtered before it is
    aggregated and never joined raw to a dimension."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    p = _plan(QUERIES["q66"].spark(spark, sf_smoke))
    assert p.count("LeftSemi") >= 2, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_q67_exists_pair_single_fact_aggregate(spark, sf_smoke):
    """Q21 shape: the EXISTS/NOT-EXISTS pair must decorrelate into ONE
    per-order aggregate joined back on orderkey — no correlated
    self-join blowup; orders and supplier ride broadcast joins."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    p = _plan(QUERIES["q67"].spark(spark, sf_smoke))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert p.count("BroadcastHashJoin") >= 2, p


def test_x60_salted_agg_two_stage_plan(spark, sf_smoke):
    """The salted path must show BOTH aggregation stages — a (key, salt)
    exchange+aggregate, then a key-only exchange+aggregate — so a
    refactor that collapses it back to a plain groupBy (losing the skew
    spread) fails here."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    p = _plan(QUERIES["x60_skew_salted_agg"].spark(spark, sf_smoke))
    assert p.count("Exchange hashpartitioning") >= 2, p
    assert "_salt" in p, p


def test_x47_no_per_source_window_sort(spark, sf_smoke):
    """x47's per-source ranks must come from the range-partitioned
    grouped_row_number — no window FUNCTION over a partitionBy(source)
    of the fact (one hot source = one task), and no ntile/percent_rank
    calls anywhere in the plan."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    p = _plan(QUERIES["x47_length_ranks"].spark(spark, sf_smoke))
    assert "rangepartitioning" in p, p
    assert "percent_rank" not in p and "cume_dist" not in p, p
    assert "ntile" not in p.lower(), p


def test_x46_ranked_profile_no_percentile_buffering(spark, sf_smoke):
    """x46's ranked tier must contain NO percentile aggregate (the
    buffering form) — percentiles arrive via range-partitioned rank
    picks and broadcast scalar joins."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    p = _plan(QUERIES["x46_numeric_profile"].spark(spark, sf_smoke))
    assert "percentile" not in p.lower(), p
    assert "rangepartitioning" in p, p


def test_x61_grouped_percentiles_no_buffering_aggregate(spark, sf_smoke):
    """x61 must never lower to percentile(...) GROUP BY source — the
    hot-group-safe shape is grouped ranks + bracketing picks."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    p = _plan(QUERIES["x61_grouped_percentiles"].spark(spark, sf_smoke))
    assert "percentile" not in p.lower(), p
    assert "rangepartitioning" in p, p


def test_q68_predicates_reach_parquet_scan(spark, sf_smoke):
    """q68 (TPC-H Q6 shape) writes the year filter as date-range
    literals precisely so every predicate lands in PushedFilters —
    row-group pruning is the whole point of the Q6 plan at scale."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    p = _plan(QUERIES["q68"].spark(spark, sf_smoke))
    assert "PushedFilters: [" in p, p
    pushed = p.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed and "l_discount" in pushed, p
    assert "Exchange hashpartitioning" not in p, p  # global agg: partial+final only


def test_q69_broadcasts_both_dims_single_fact_shuffle(spark, sf_smoke):
    """q69 (TPC-H Q9 shape): part slice and supplier->nation broadcast;
    the fact shuffles exactly once, for the (nation, year) aggregate."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    p = _plan(QUERIES["q69"].spark(spark, sf_smoke))
    assert p.count("BroadcastHashJoin") >= 3, p
    assert "SortMergeJoin" not in p, p
    assert p.count("Exchange hashpartitioning") <= 1, p


def test_q70_threshold_is_broadcast_not_second_scan(spark, sf_smoke):
    """q70 (TPC-H Q11 shape): the global-total threshold re-aggregates
    the per-part frame (ReusedExchange / single fact scan) and arrives
    as a broadcast 1-row join — never a second pass over lineitem."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    df = QUERIES["q70"].spark(spark, sf_smoke)
    p = _plan(df)
    assert p.count("BroadcastNestedLoopJoin") == 1, p  # 1-row threshold broadcast
    assert p.count("FileScan parquet") <= 2, p  # never >1 scan per branch
    df.collect()  # AQE exchange reuse is a runtime decision
    final = _plan(df)
    assert final.count("ReusedExchange") >= 1, final  # one EFFECTIVE fact scan


def test_q71_month_filter_pushed_and_part_broadcast(spark, sf_smoke):
    """q71 (TPC-H Q14 shape): month range in PushedFilters; part joins
    broadcast; single global aggregate, no hash-partition shuffle."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    p = _plan(QUERIES["q71"].spark(spark, sf_smoke))
    assert "PushedFilters: [" in p, p
    pushed = p.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed, p
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p, p
    assert "Exchange hashpartitioning" not in p, p


def test_q72_grouping_sets_single_expand_single_scan(spark, sf_smoke):
    """q72: three declared slices = ONE Expand + hash aggregate over one
    fact scan — never a union of per-slice scans."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    p = _plan(QUERIES["q72"].spark(spark, sf_smoke))
    assert p.count("Expand") == 1, p
    assert p.count("FileScan parquet") == 1, p


def test_q73_pivot_explicit_values_is_one_pass(spark, sf_smoke):
    """q73: explicit pivot values -> no values-discovery distinct scan;
    the whole reshape is one scan and one aggregate shuffle."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    p = _plan(QUERIES["q73"].spark(spark, sf_smoke))
    assert p.count("FileScan parquet") == 1, p
    assert p.count("Exchange hashpartitioning") <= 2, p


def test_x65_cdc_delta_single_fullouter_join(spark, sf_smoke):
    """cdc_delta claims ONE full-outer equi-shuffle: the executed plan
    must carry exactly one join node, full-outer, and never a nested-loop
    or cartesian shape."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    p = _plan(QUERIES["x65_cdc_delta"].spark(spark, sf_smoke))
    assert "Cartesian" not in p and "BroadcastNestedLoop" not in p
    assert "FullOuter" in p
    # one logical join total: no operator-internal extra joins sneak in
    n_joins = sum(p.count(k) for k in
                  ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"))
    assert n_joins == 1, p


def test_x64_scd2_merge_no_cartesian_catalyst_specializes_outer(spark, sf_smoke):
    """scd2_merge is written as ONE full-outer join feeding three union
    branches; Catalyst pushes each branch's presence filter into the
    join and SPECIALIZES it (LeftOuter for surviving-open rows, inner/
    right for new versions) — assert that rewrite happened (outer joins
    present, no residual FullOuter needed) and that nothing degraded to
    a cartesian/nested-loop."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    p = _plan(QUERIES["x64_scd2_merge"].spark(spark, sf_smoke))
    assert "Cartesian" not in p and "BroadcastNestedLoop" not in p
    assert "Outer" in p  # the open-vs-updates match stays outer-shaped


def test_x67_pagerank_no_cartesian_edge_keyed_rounds(spark, sf_smoke):
    """Every PageRank round is an equi-join + hash aggregate; a
    refactor that degrades the rank/edge join to nested-loop (e.g. a
    non-equi condition) must fail here."""
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES

    p = _plan(QUERIES["x67_pagerank"].spark(spark, sf_smoke))
    assert "Cartesian" not in p and "BroadcastNestedLoop" not in p
    assert "HashAggregate" in p


def test_dsir_weights_broadcasts_lambda_no_cartesian(docs):
    """x70's scale contract: the lambda table (<= buckets rows) joins by
    BROADCAST hash join — never sort-merge (a bucket-keyed SMJ would
    shuffle the corpus-sized per-doc table on a 4096-key space) — and
    nothing in the plan is a CartesianProduct; the only nested-loop
    joins are the two one-row totals cross joins. JVM-only end to end."""
    from meshinsights_data_pipeline_spark.operators.corpus import dsir_weights

    df = dsir_weights(docs, docs.filter(F.col("lang") == "en"), "doc_id", "text")
    p = _plan(df)
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") >= 2  # lambda join + c_t left join
    assert "EvalPython" not in p


def test_bm25_topk_broadcasts_stats_no_cartesian(docs):
    """x71's scale contract: df/N/avgdl live in broadcast frames (the
    only nested-loop join is the one-row stats cross join), document
    length is computed map-side (no all-token shuffle -> no sort-merge
    join anywhere), the tf diamond reuses ONE materialized frame for
    both the df build and the scoring stream (two InMemoryTableScans —
    a third corpus tokenize pass would surface as a missing cache hit),
    and the global top-k is the salted two-phase rank, so the only
    unpartitioned window input is the <= k x 16 survivor frame.
    JVM-only."""
    from meshinsights_data_pipeline_spark.operators.text import bm25_topk

    df = bm25_topk(docs, "doc_id", "text", ["dup", "vector", "scan"])
    p = _plan(df)
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") >= 1  # dfreq join
    assert p.count("InMemoryTableScan") == 2  # tf diamond via barrier
    assert "EvalPython" not in p


def test_payload_neardup_no_cartesian(docs):
    """x72's scale contract: the LSH bucket join and the verify joins are
    hash joins keyed on (band, sig) / candidate ids — no cartesian, no
    Python; the banded and candidate-shingle diamonds read from the
    materialize barrier (InMemoryTableScan present)."""
    from meshinsights_data_pipeline_spark.operators.multimodal import (
        payload_neardup_pairs,
    )

    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    p = _plan(payload_neardup_pairs(media))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "EvalPython" not in p
    assert "InMemoryTableScan" in p


def test_stratified_sample_broadcasts_quota_no_python(docs):
    """x73's scale contract: the |strata|-row quota table joins the
    ranked corpus by BROADCAST hash join, everything stays JVM-side, and
    no cartesian shape appears (the one-row total is the only
    nested-loop join)."""
    from meshinsights_data_pipeline_spark.operators.corpus import (
        stratified_sample,
    )

    p = _plan(stratified_sample(docs, "lang", "doc_id", 137))
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    assert p.count("BroadcastHashJoin") >= 1  # quota join


def test_url_blocklist_broadcasts_no_python(docs):
    """x75's scale contract: the blocklist joins BROADCAST on the suffix
    string (a sort-merge join would shuffle the corpus-sized suffix
    explode on domain strings); host parse + suffix expansion stay
    JVM-side."""
    from meshinsights_data_pipeline_spark.operators.corpus import (
        url_host_blocklist,
    )

    urls = docs.select(
        "doc_id",
        F.concat(F.lit("https://www."), F.col("source"), F.lit(".example.com/d")).alias("url"),
    )
    p = _plan(url_host_blocklist(urls, "doc_id", "url", ["src3.example.com"]))
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p
    assert "EvalPython" not in p


def test_lexical_diversity_no_cartesian_jvm_only(docs):
    """x74's scale contract: the vol/reg join and the rank-offset join
    are hash joins (broadcast at this size), never cartesian or
    nested-loop; the whole report is JVM expressions."""
    from meshinsights_data_pipeline_spark.operators.corpus import (
        lexical_diversity,
    )

    p = _plan(lexical_diversity(docs, "source", "text"))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "EvalPython" not in p


def test_chat_render_one_shuffle_no_window(spark):
    """x76's scale contract: ONE groupBy(convo) exchange, the
    per-conversation ordering via sort_array (no Window node at all),
    JVM-only."""
    from meshinsights_data_pipeline_spark.operators.corpus import chat_render

    df = spark.createDataFrame(
        [("c1", 1, "user", "x")], "cid string, seq int, role string, content string"
    )
    p = _plan(chat_render(df, "cid", ["seq"]))
    assert p.count("Exchange hashpartitioning") == 1
    assert "Window" not in p
    assert "EvalPython" not in p


def test_sq_topk_broadcast_query_side_jvm_only(spark):
    """x79's scale contract: the bounded query set broadcasts (never a
    shuffle join against the corpus), scoring is JVM expressions."""
    from meshinsights_data_pipeline_spark.operators.similarity import sq_topk

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 2.0, 3.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    p = _plan(sq_topk(emb, emb.filter(F.col("vec_id") < 2), k=3))
    assert "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p


def test_triangle_counts_no_cartesian(spark):
    """x81's scale contract: wedge + closure are hash joins on the apex
    / edge keys — no cartesian shape anywhere."""
    from meshinsights_data_pipeline_spark.operators.graph import triangle_counts

    e = spark.createDataFrame(
        [(a, b) for a in range(6) for b in range(6) if a < b],
        "src long, dst long",
    )
    p = _plan(triangle_counts(e))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "EvalPython" not in p


def test_basket_pair_stats_broadcast_dims(spark):
    """x83's scale contract (r17 in-group rewrite): item counts and the
    1-row total broadcast; pairs come from per-basket Generate nodes —
    the basket self-join (and its second shuffle + sort-merge) is gone,
    so no SortMergeJoin and no semi/cartesian shape may appear."""
    import re

    from meshinsights_data_pipeline_spark.operators.basket import (
        basket_pair_stats,
    )

    df = spark.createDataFrame(
        [(i % 5, i % 7) for i in range(40)], "b long, i long"
    )
    p = _plan(basket_pair_stats(df, "b", "i"))
    assert "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    assert "SortMergeJoin" not in p
    assert "LeftSemi" not in p
    # the two pair Generates: posexplode of the item array + the
    # sliced strict tail (loose regexes — plan pretty-printing moves)
    assert re.search(r"Generate posexplode", p)
    assert re.search(r"Generate explode\(slice\(", p)


def test_gap_fill_interpolate_no_shrinking_frame(spark):
    """x82's scale contract: both bracketing lookups are GROWING window
    frames (running aggregates, O(rows) per partition) — the shrinking
    (currentRow, unboundedFollowing) form Spark evaluates by per-row
    rescans must never reappear."""
    from datetime import datetime

    from meshinsights_data_pipeline_spark.operators.rollup import (
        gap_fill_interpolate,
    )

    df = spark.createDataFrame(
        [("k", datetime(2024, 1, 1, 0, 0), 1.0)],
        "k string, ts timestamp, value double",
    )
    p = _plan(gap_fill_interpolate(df, "ts", ["k"], "value"))
    assert "unboundedfollowing" not in p.lower().replace(" ", "")
    assert "EvalPython" not in p


def test_overlap_pairs_no_cartesian_jvm_only(spark):
    """x90's scale contract: the intersection is a hash join on the
    shingle hash (bucket-bounded, never corpus^2 as a cartesian shape),
    sizes join back hash/broadcast, everything JVM-side."""
    from meshinsights_data_pipeline_spark.operators.dedup import (
        overlap_coefficient_pairs,
    )

    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i}") for i in range(8)],
        "doc_id long, text string",
    )
    p = _plan(overlap_coefficient_pairs(df, "doc_id", "text"))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "EvalPython" not in p
    # max_doc_freq (r16 single-pass rewrite, _capped_pair_counts): the cap
    # is a per-hash group size filter applied BEFORE in-group pair
    # generation — no shingle self-join at all, so the expensive join
    # never exists; pairs come from Generate nodes over arrays bounded by
    # the cap, and still no cartesian shape
    pc = _plan(overlap_coefficient_pairs(df, "doc_id", "text",
                                         max_doc_freq=4))
    assert "Generate explode(slice(" in pc   # in-group (a < b) pair generation
    assert "Generate posexplode(" in pc
    assert "<= 4)" in pc             # the df cap gates group size
    assert "LeftSemi" not in pc      # the old semi-join probe is gone
    assert "CartesianProduct" not in pc
    assert "EvalPython" not in pc


def test_exp_weighted_avg_single_window_shuffle(spark):
    """EWA's k lag terms share ONE window spec — one entity-keyed
    exchange, a fixed arithmetic chain, no arrays/collect_list, no
    join, no Python."""
    from datetime import datetime

    from meshinsights_data_pipeline_spark.operators.rollup import (
        exp_weighted_avg,
    )

    df = spark.createDataFrame(
        [("k", datetime(2024, 1, 1), 1, 1.0)],
        "k string, ts timestamp, event_id long, value double",
    )
    p = _plan(exp_weighted_avg(df, "ts", ["k"], "value", "event_id"))
    assert p.count("Exchange hashpartitioning") == 1
    assert p.count("Window") >= 1 and "Join" not in p
    assert "collect_list" not in p and "EvalPython" not in p


def test_cusum_single_window_shuffle(spark):
    """CUSUM's closed form (cumsum minus running-min of prefix cumsums)
    must execute as ONE entity-keyed exchange feeding running-aggregate
    Window frames — no join, no second shuffle, no Python, despite the
    textbook recurrence looking sequential."""
    from datetime import datetime

    from meshinsights_data_pipeline_spark.operators.changepoint import (
        cusum_changepoints,
    )

    df = spark.createDataFrame(
        [("k", datetime(2024, 1, 1), 1, 1.0)],
        "k string, ts timestamp, event_id long, value double",
    )
    p = _plan(cusum_changepoints(df, "ts", ["k"], "value", "event_id",
                                 target=0.0))
    assert p.count("Exchange hashpartitioning") == 1
    assert p.count("Window") >= 1 and "Join" not in p
    assert "EvalPython" not in p


def test_rolling_stats_single_window_shuffle(spark):
    """x91's scale contract: ONE entity-keyed exchange feeding ONE
    Window node with a running ROWS frame — no join, no second shuffle,
    no Python."""
    from datetime import datetime

    from meshinsights_data_pipeline_spark.operators.rollup import (
        rolling_stats,
    )

    df = spark.createDataFrame(
        [("k", datetime(2024, 1, 1), 1, 1.0)],
        "k string, ts timestamp, event_id long, value double",
    )
    p = _plan(rolling_stats(df, "ts", ["k"], "value", "event_id"))
    assert p.count("Exchange hashpartitioning") == 1
    assert p.count("Window") >= 1 and "Join" not in p
    assert "EvalPython" not in p


def test_mad_outliers_broadcast_medians_no_python(spark):
    """x92's scale contract: both per-group median tables broadcast back
    to the big input (the input itself is never re-shuffled for the
    joins), no cartesian, no Python."""
    from meshinsights_data_pipeline_spark.operators.stats import (
        mad_outliers,
    )

    df = spark.createDataFrame(
        [("k", float(i)) for i in range(10)], "k string, value double"
    )
    p = _plan(mad_outliers(df, ["k"], "value"))
    assert p.count("BroadcastExchange") >= 2
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p


def test_pmi_collocations_takeordered_no_global_sort(spark):
    """x93's scale contract: the global top-k is TakeOrdered (per-
    partition heap + driver merge), NOT a single-partition row_number
    window over every surviving bigram; one entity-keyed window for the
    bigram lead; JVM-only."""
    from meshinsights_data_pipeline_spark.operators.text import (
        pmi_collocations,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma alpha beta")], "doc_id long, text string"
    )
    p = _plan(pmi_collocations(df, "doc_id", "text", min_count=1, top_k=5))
    assert "TakeOrderedAndProject" in p
    assert p.count("Exchange SinglePartition") <= 1  # only the k-row rank
    assert "EvalPython" not in p


def test_centroid_similarity_single_corpus_shuffle(spark):
    """x96's scale contract: the only corpus-sized stage is one
    (group, pos) hash aggregate; the pair comparison broadcasts the
    |groups|-row centroid frame — no cartesian, no Python."""
    from meshinsights_data_pipeline_spark.operators.similarity import (
        label_centroid_similarity,
    )

    df = spark.createDataFrame(
        [(i % 3, [float(i), 1.0]) for i in range(12)],
        "label int, embedding array<float>",
    )
    p = _plan(label_centroid_similarity(df, "label"))
    assert "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p


def test_record_linkage_equality_block_join(spark):
    """x97's scale contract: the self-join is EQUALITY-keyed on the
    block columns (sum-of-|block|^2, never a nested-loop corpus^2);
    scoring is a map-side projection, JVM-only."""
    from meshinsights_data_pipeline_spark.operators.linkage import (
        blocked_record_linkage,
    )

    df = spark.createDataFrame(
        [(i, i % 3, "s", f"name{i}", float(i)) for i in range(12)],
        "id long, nat int, seg string, name string, bal double",
    )
    p = _plan(blocked_record_linkage(df, "id", ["nat", "seg"], "name", "bal"))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "EvalPython" not in p


def test_vocab_overlap_token_keyed_join(spark):
    """x101's scale contract: the source self-comparison is keyed on
    the shared TOKEN (bounded per-token fanout), never a cartesian or
    nested-loop source product; JVM-only."""
    from meshinsights_data_pipeline_spark.operators.corpus import (
        source_vocab_overlap,
    )

    df = spark.createDataFrame(
        [(i, f"s{i % 3}", "alpha beta gamma") for i in range(9)],
        "doc_id long, source string, text string",
    )
    p = _plan(source_vocab_overlap(df))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "EvalPython" not in p


def test_ks_drift_broadcast_sizes_partitioned_windows(spark):
    """x107's scale contract: group sizes and the corpus total reach the
    grid as BROADCAST joins (the spine is the big side), the running
    sums are per-group partitioned windows (no single-partition global
    window), JVM-only."""
    from meshinsights_data_pipeline_spark.operators.stats import ks_drift

    df = spark.createDataFrame(
        [(f"g{i % 3}", float(i % 7)) for i in range(30)],
        "g string, v double",
    )
    p = _plan(ks_drift(df, "g", "v"))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    # every window spec carries the group partition key
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", p):
        assert spec.split(",")[0].strip().startswith("g"), spec


def test_mann_kendall_entity_keyed_pair_join(spark):
    """x108's scale contract: the pair join is EQUALITY-keyed on the
    entity (sum-of-n_e^2, never corpus^2 via nested loop), aggregates
    are map-side combinable, JVM-only."""
    from meshinsights_data_pipeline_spark.operators.trend import (
        mann_kendall_trend,
    )
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i % 3, base + timedelta(seconds=i), i, float(i % 5))
         for i in range(15)],
        "g int, ts timestamp, id long, v double",
    )
    p = _plan(mann_kendall_trend(df, "ts", ["g"], "v"))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "EvalPython" not in p


def test_benford_single_digit_shuffle(spark):
    """x109's scale contract: one map-side digit projection feeding a
    (group, digit) hash aggregate (<= 9 rows per group out of the
    shuffle), the 9-digit spine explodes from a literal array — no
    second corpus scan, no python."""
    from meshinsights_data_pipeline_spark.operators.dq import (
        benford_deviation,
    )

    df = spark.createDataFrame(
        [("a", float(i + 1)) for i in range(20)], "g string, v double"
    )
    p = _plan(benford_deviation(df, "g", "v"))
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p
    assert p.count("FileScan") == 0  # literal input; guard is vs rescans


def test_token_entropy_single_corpus_shuffle(spark):
    """x110's scale contract: one (source, token) count is the only
    corpus-sized stage; ranking and the final aggregate run at
    count-table cardinality; JVM-only."""
    from meshinsights_data_pipeline_spark.operators.corpus import (
        source_token_entropy,
    )

    df = spark.createDataFrame(
        [(f"s{i % 2}", "alpha beta beta gamma") for i in range(8)],
        "source string, text string",
    )
    p = _plan(source_token_entropy(df, "source", "text"))
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p


def test_embedding_covariance_broadcast_means(spark):
    """x111's scale contract: the within-row pair join is keyed on the
    row id (d(d+1)/2 per vector, never corpus^2), the per-dim means
    join back as BROADCASTs, JVM-only."""
    from meshinsights_data_pipeline_spark.operators.similarity import (
        embedding_covariance,
    )

    df = spark.createDataFrame(
        [(i, [float(i), float(i + 1), float(i * 2)]) for i in range(10)],
        "id long, vec array<double>",
    )
    p = _plan(embedding_covariance(df, "id", "vec"))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "EvalPython" not in p


def test_km_survival_partitioned_windows_broadcast_sizes(spark):
    """x112's scale contract: group sizes broadcast onto the duration
    spine, every window is partitioned by the group (no global
    single-partition window), JVM-only."""
    from meshinsights_data_pipeline_spark.operators.survival import (
        km_survival,
    )

    df = spark.createDataFrame(
        [(i % 2, (i * 7) % 5, i % 3 == 0) for i in range(20)],
        "g int, t long, e boolean",
    )
    p = _plan(km_survival(df, ["g"], "t", "e"))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
    assert "EvalPython" not in p
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", p):
        assert spec.split(",")[0].strip().startswith("g"), spec


def test_quantile_normalize_no_single_task_sort(spark):
    """x113's scale contract: the corpus rank comes from the
    range-shuffle global ranker — the ONLY unpartitioned window in the
    plan runs over the #partitions-row offset frame, never the data
    (no Exchange SinglePartition over the corpus); bracket lookups are
    integer-keyed hash joins; JVM-only."""
    from meshinsights_data_pipeline_spark.operators.stats import (
        quantile_normalize,
    )

    df = spark.createDataFrame(
        [(i % 3, i, float((i * 7) % 11)) for i in range(30)],
        "g int, id long, v double",
    )
    p = _plan(quantile_normalize(df, "g", "v", "id"))
    assert "CartesianProduct" not in p
    # (a BroadcastNestedLoopJoin IS present and correct: the 1-row
    # corpus-total broadcast crossJoin, the psi_drift shape)
    assert "EvalPython" not in p


def test_welch_ttest_single_scan_broadcast_control(spark):
    """x116's scale contract (staged r15): the cell moment frame is
    MATERIALIZED before feeding both sides of the control join (one
    corpus scan, the ab_test diamond-barrier shape), the pivot and
    control joins are broadcasts, JVM-only."""
    from meshinsights_data_pipeline_spark.operators.abtest import (
        welch_ttest,
    )

    df = spark.createDataFrame(
        [(f"e{i % 2}", f"a{i % 3}", float(i % 7)) for i in range(30)],
        "exp string, arm string, v double",
    )
    p = _plan(welch_ttest(df, "exp", "arm", "v", control_label="a0"))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    # the materialize() barrier replaces the corpus lineage: both join
    # sides read the checkpointed cell RDD, not a replayed scan
    assert "Scan ExistingRDD" in p


def test_chi2_independence_single_scan_broadcast_marginals(spark):
    """x117's scale contract (staged r15): ONE (a, b) count aggregate is
    materialized and feeds rows/cols/total (no corpus re-scan), the
    marginals and the 1-row total broadcast back, JVM-only."""
    from meshinsights_data_pipeline_spark.operators.dq import (
        chi2_independence,
    )

    df = spark.createDataFrame(
        [(f"a{i % 3}", f"b{i % 4}") for i in range(24)],
        "x string, y string",
    )
    p = _plan(chi2_independence(df, "x", "y"))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    assert "Scan ExistingRDD" in p  # the materialized cell frame


def test_autocorrelation_entity_partitioned_windows(spark):
    """x118's scale contract (staged r15): all lag terms ride ONE
    entity-partitioned window spec (no single-partition window over
    the data), the mean table joins back broadcast, JVM-only."""
    import re

    from datetime import datetime, timedelta

    from meshinsights_data_pipeline_spark.operators.trend import (
        autocorrelation,
    )

    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i % 3, base + timedelta(seconds=i), i, float((i * 5) % 7))
         for i in range(24)],
        "g int, ts timestamp, id long, v double",
    )
    p = _plan(autocorrelation(df, "ts", ["g"], "v", "id", lags=3))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", p):
        assert spec.split(",")[0].strip().startswith("g"), spec


def test_js_divergence_count_table_joins_only(spark):
    """x119's scale contract (staged r15): after the one (source, token)
    count shuffle, the spine joins back on the TOKEN key (hash join,
    never a grid/cartesian over the vocabulary); the per-source sizes
    and the 1-row total broadcast (the 1-row crossJoin's
    BroadcastNestedLoopJoin is the sanctioned psi_drift shape);
    JVM-only."""
    from meshinsights_data_pipeline_spark.operators.corpus import (
        source_js_divergence,
    )

    df = spark.createDataFrame(
        [(f"s{i % 2}", "alpha beta beta gamma delta") for i in range(8)],
        "source string, text string",
    )
    p = _plan(source_js_divergence(df, "source", "text"))
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p


def test_mann_whitney_count_spine_windows(spark):
    """x120's scale contract (staged r15): ranks never materialize per
    row — one (experiment, arm, value) count aggregate is the only
    corpus-sized stage (materialized, one scan), control counts
    replicate via a BROADCAST of the arm list, and the pooled-rank
    window is partitioned on (experiment, arm) — no single-partition
    window; JVM-only."""
    import re

    from meshinsights_data_pipeline_spark.operators.abtest import (
        mann_whitney_u,
    )

    df = spark.createDataFrame(
        [(f"e{i % 2}", f"a{i % 3}", float(i % 5)) for i in range(30)],
        "exp string, arm string, v double",
    )
    p = _plan(mann_whitney_u(df, "exp", "arm", "v", control_label="a0"))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    assert "Scan ExistingRDD" in p  # the materialized count frame
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", p):
        assert spec.split(",")[0].strip().startswith("exp"), spec


def test_kruskal_wallis_single_scan_pooled_windows(spark):
    """x121's scale contract (staged r15): the shared mw_cell_counts
    stage is the only corpus-sized aggregate (materialized, one scan);
    the pooled ranking window is partitioned per experiment; JVM-only,
    no cartesian."""
    import re

    from meshinsights_data_pipeline_spark.operators.abtest import (
        kruskal_wallis,
    )

    df = spark.createDataFrame(
        [(f"e{i % 2}", f"a{i % 3}", float(i % 5)) for i in range(30)],
        "exp string, arm string, v double",
    )
    p = _plan(kruskal_wallis(df, "exp", "arm", "v"))
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    assert "Scan ExistingRDD" in p  # the materialized count frame
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", p):
        assert spec.split(",")[0].strip().startswith("exp"), spec


def test_spearman_rank_tables_join_back(spark):
    """x122's scale contract (staged r15): two (group, value) count
    aggregates with group-partitioned spine windows build the rank
    tables, the corpus joins back on (group, value) hash keys — no
    pair join, no cartesian, JVM-only."""
    import re

    from meshinsights_data_pipeline_spark.operators.stats import (
        spearman_correlation,
    )

    df = spark.createDataFrame(
        [(f"g{i % 2}", float(i % 4), float((i * 3) % 7))
         for i in range(24)],
        "g string, x double, y double",
    )
    p = _plan(spearman_correlation(df, ["g"], "x", "y"))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "EvalPython" not in p
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", p):
        assert spec.split(",")[0].strip().startswith("g"), spec


def test_correlation_ratio_single_moment_shuffle(spark):
    """x123's scale contract (staged r15): one broadcast pivot join,
    ONE (group, category) moment aggregate as the only corpus-sized
    stage, no windows over the data, no cartesian, JVM-only."""
    from meshinsights_data_pipeline_spark.operators.stats import (
        correlation_ratio,
    )

    df = spark.createDataFrame(
        [(f"g{i % 2}", f"c{i % 4}", float(i % 7)) for i in range(28)],
        "g string, cat string, v double",
    )
    p = _plan(correlation_ratio(df, ["g"], "cat", "v"))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    assert "windowspecdefinition" not in p


def test_roc_auc_count_spine_windows(spark):
    """x124's scale contract (staged r16): ranks never materialize per
    row — one (group, score) pos/neg count aggregate is the only
    corpus-sized stage (materialized, one scan), and the pooled-rank
    window is partitioned on the group — no single-partition window;
    JVM-only, no cartesian."""
    import re

    from meshinsights_data_pipeline_spark.operators.mleval import roc_auc

    df = spark.createDataFrame(
        [(f"g{i % 2}", i % 3 == 0, float(i % 5)) for i in range(30)],
        "g string, y boolean, s double",
    )
    p = _plan(roc_auc(df, ["g"], "y", "s"))
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    assert "Scan ExistingRDD" in p  # the materialized count frame
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", p):
        assert spec.split(",")[0].strip().startswith("g"), spec


def test_calibration_report_single_aggregate(spark):
    """x125's scale contract (staged r16): ONE map-side-combinable
    (group, bin) moment aggregate is the only corpus-sized stage
    (Brier's residual moments fold in the same pass); no windows over
    the data, no joins, JVM-only."""
    from meshinsights_data_pipeline_spark.operators.mleval import (
        calibration_report,
    )

    df = spark.createDataFrame(
        [(f"g{i % 2}", (i % 13) / 10.0, i % 3 == 0) for i in range(39)],
        "g string, s double, y boolean",
    )
    p = _plan(calibration_report(df, ["g"], "s", "y", bins=10))
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    assert "windowspecdefinition" not in p
    assert "Join" not in p  # two chained aggregates, nothing else


def test_cohens_kappa_single_scan_contingency(spark):
    """x126's scale contract (staged r16): ONE (group, a, b)
    contingency aggregate is materialized and feeds the diagonal,
    both marginals, and the total (no corpus re-scan — the
    chi2_independence diamond); label-pair-sized algebra after;
    JVM-only, no cartesian."""
    from meshinsights_data_pipeline_spark.operators.mleval import (
        cohens_kappa,
    )

    df = spark.createDataFrame(
        [(f"g{i % 2}", f"l{i % 3}", f"l{(i * 2) % 3}") for i in range(24)],
        "g string, a string, b string",
    )
    p = _plan(cohens_kappa(df, ["g"], "a", "b"))
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    assert "Scan ExistingRDD" in p  # the materialized contingency frame


def test_cliffs_delta_count_spine_windows(spark):
    """x127's scale contract (staged r16): the shared mw_cell_counts
    stage is the only corpus-sized aggregate (materialized, one
    scan); control counts replicate via a BROADCAST of the arm list;
    the rank window is partitioned on (experiment, arm); JVM-only."""
    import re

    from meshinsights_data_pipeline_spark.operators.abtest import (
        cliffs_delta,
    )

    df = spark.createDataFrame(
        [(f"e{i % 2}", f"a{i % 3}", float(i % 5)) for i in range(30)],
        "exp string, arm string, v double",
    )
    p = _plan(cliffs_delta(df, "exp", "arm", "v", control_label="a0"))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    assert "Scan ExistingRDD" in p  # the materialized count frame
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", p):
        assert spec.split(",")[0].strip().startswith("exp"), spec


def test_bootstrap_mean_ci_single_exploded_scan(spark):
    """x128's scale contract (staged r16): ONE corpus scan exploded
    x(B+1) map-side feeds a combinable (group, b) moment aggregate; the
    tiny replicate-mean frame is materialized before the rank window
    and the percentile bracket filters (five consumers — the diamond
    lesson); rank windows are group-partitioned; JVM-only, no
    cartesian beyond the sanctioned 1-row shapes."""
    import re

    from meshinsights_data_pipeline_spark.operators.bootstrap import (
        bootstrap_mean_ci,
    )

    df = spark.createDataFrame(
        [(f"g{i % 2}", i, float(i % 7)) for i in range(30)],
        "g string, id long, v double",
    )
    p = _plan(bootstrap_mean_ci(df, ["g"], "v", "id", b=8))
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    assert "Scan ExistingRDD" in p  # the materialized replicate means
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", p):
        assert spec.split(",")[0].strip().startswith("g"), spec


def test_cuped_single_moment_scan(spark):
    """x130's scale contract (staged r16): one broadcast pivot join,
    ONE materialized (experiment, arm) moment aggregate as the only
    corpus-sized stage (it feeds the pooled roll-up AND the per-arm
    readout), tiny broadcast joins after; JVM-only, no cartesian, no
    windows."""
    from meshinsights_data_pipeline_spark.operators.abtest import (
        cuped_adjusted_means,
    )

    df = spark.createDataFrame(
        [(f"e{i % 2}", f"a{i % 2}", float(i % 7), float(i % 3))
         for i in range(28)],
        "exp string, arm string, y double, x double",
    )
    p = _plan(cuped_adjusted_means(df, "exp", "arm", "y", "x"))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    assert "windowspecdefinition" not in p
    assert "Scan ExistingRDD" in p  # the materialized moment frame


def test_hll_cardinality_single_scan_no_python(spark, sf_smoke):
    from meshinsights_data_pipeline_spark.operators.sketch import (
        hll_cardinality,
    )

    docs = read_table(spark, sf_smoke, "documents")
    p = _plan(hll_cardinality(docs, ["source"], "text", p=8))
    assert p.count("Scan parquet") == 1  # corpus read once
    assert "EvalPython" not in p  # JVM-side end to end
    # two exchanges: the (group, register) combine and the tiny
    # per-group estimate fold — nothing corpus-keyed
    assert p.count("Exchange") <= 2


def test_cms_counts_single_scan_single_shuffle(spark, sf_smoke):
    from meshinsights_data_pipeline_spark.operators.sketch import (
        cms_counts,
    )

    docs = read_table(spark, sf_smoke, "documents")
    p = _plan(cms_counts(docs, ["source"], "text", depth=4, width=256))
    assert p.count("Scan parquet") == 1
    assert p.count("Exchange") == 1  # ONE constant-key-space shuffle
    assert "EvalPython" not in p


def test_kmv_overlap_materializes_sketch_single_scan(spark, sf_smoke):
    from meshinsights_data_pipeline_spark.operators.sketch import (
        kmv_pairwise_overlap,
    )

    docs = read_table(spark, sf_smoke, "documents")
    p = _plan(kmv_pairwise_overlap(docs, "source", "text", k=32))
    # the sketch barrier: every pair-stage consumer reads the cached
    # |S| x k sketch (InMemoryTableScan), so the corpus scan+distinct+
    # rank pipeline runs once no matter how many consumers print its
    # lineage (FileScan strings inside InMemoryRelation subtrees are
    # display artifacts, not executed scans — materialize()'s eager
    # count() built the cache before this plan ran)
    assert "InMemoryTableScan" in p
    assert "EvalPython" not in p


def test_hist_bin_counts_single_scan_single_shuffle(spark, sf_smoke):
    from meshinsights_data_pipeline_spark.operators.sketch import (
        hist_bin_counts,
    )

    ev = read_table(spark, sf_smoke, "events")
    p = _plan(hist_bin_counts(ev, ["event_type"], "value", 0.0, 100.0, 64))
    assert p.count("Scan parquet") == 1
    assert p.count("Exchange") == 1  # ONE |groups| x bins shuffle
    assert "EvalPython" not in p
