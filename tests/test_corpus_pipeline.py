"""Corpus-prep Processor/Pipeline tests — OPS style: tiny frame -> one
step -> assert rows + stages metadata; then the composed pipeline with
its conditions (skip-without-url, skip-without-benchmark)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.analytics.corpus_pipeline import (
    BENCHMARK_KEY,
    BoilerplateFilterStep,
    ChunkDocumentsStep,
    CorpusColumns,
    DatasetSplitStep,
    DecontaminationStep,
    ExactDedupStep,
    GopherQualityGateStep,
    NearDupCollapseStep,
    PiiRedactionStep,
    QuotaSampleStep,
    ShuffleShardsStep,
    UrlDedupStep,
    build_corpus_pipeline,
    run_corpus_prep,
)
from meshinsights_data_pipeline_spark.core.context import PipelineContext

# 24 tokens, all-alpha, plenty of stopwords -> passes every Gopher rule.
GOOD = (
    "the cat and the dog walk to the house in the morning and "
    "they see the bird on the tree near the river bank today"
)
GOOD2 = (
    "a quick brown fox jumps over the lazy dog and runs through "
    "the field to the forest where it finds a quiet stream flowing"
)
# One mid-sentence word changed vs GOOD -> high-Jaccard near-duplicate.
NEAR = GOOD.replace("bird", "plane")
BAD = "x1 9z"  # fails token-count rule


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )


def _ctx(df, **config):
    return PipelineContext(
        pipeline_name="corpus_prep", correlation_id="t", raw_data=df,
        config=config,
    )


COLS = CorpusColumns()


def test_gopher_gate_step(spark):
    df = _docs(spark, [(1, GOOD, "s0", 100), (2, BAD, "s0", 5)])
    ctx = GopherQualityGateStep(COLS)(_ctx(df, **{"corpus.count_rows": True}))
    assert [r.doc_id for r in ctx.raw_data.collect()] == [1]
    assert ctx.stages["corpus.gopher_quality_gate"]["rows"] == 1
    assert "corpus.quality" in ctx.processed_data
    assert ctx.execution_log[-1]["status"] == "success"


def test_exact_dedup_step(spark):
    df = _docs(spark, [(1, GOOD, "s0", 100), (2, GOOD, "s1", 100), (3, GOOD2, "s0", 90)])
    ctx = ExactDedupStep(COLS)(_ctx(df))
    assert sorted(r.doc_id for r in ctx.raw_data.collect()) == [1, 3]


def test_neardup_collapse_step(spark):
    df = _docs(spark, [(1, GOOD, "s0", 100), (2, NEAR, "s1", 100), (3, GOOD2, "s0", 90)])
    ctx = NearDupCollapseStep(COLS, threshold=0.5)(_ctx(df))
    assert sorted(r.doc_id for r in ctx.raw_data.collect()) == [1, 3]


def test_decontamination_step(spark):
    df = _docs(spark, [(1, GOOD, "s0", 100), (2, GOOD2, "s1", 90)])
    bench = _docs(spark, [(100, GOOD, "bench", 100)])
    ctx = _ctx(df)
    ctx.processed_data[BENCHMARK_KEY] = bench
    out = DecontaminationStep(COLS, threshold=0.5)(ctx)
    assert [r.doc_id for r in out.raw_data.collect()] == [2]
    scores = {r.doc_id: r.contamination for r in
              out.processed_data["corpus.contamination"].collect()}
    assert scores[1] == 1.0 and scores[2] < 0.5


def test_decontamination_requires_benchmark(spark):
    df = _docs(spark, [(1, GOOD, "s0", 100)])
    with pytest.raises(ValueError, match="corpus.benchmark"):
        DecontaminationStep(COLS)(_ctx(df))


def test_pii_redaction_step(spark):
    df = _docs(spark, [(1, "contact bob@example.com or 12345678 now", "s0", 40)])
    ctx = PiiRedactionStep(COLS)(_ctx(df))
    text = ctx.raw_data.collect()[0].text
    assert "<EMAIL>" in text and "<NUM>" in text and "bob@" not in text
    audit = ctx.processed_data["corpus.pii"].collect()[0]
    assert audit.n_email == 1 and audit.n_num == 1


def test_quota_sample_step(spark):
    rows = [(i, GOOD, "s0", 100 - i) for i in range(5)] + [(10, GOOD2, "s1", 50)]
    ctx = QuotaSampleStep(COLS, n=2, salt_buckets=2)(_ctx(_docs(spark, rows)))
    kept = sorted(r.doc_id for r in ctx.raw_data.collect())
    assert kept == [0, 1, 10]  # top-2 by n_chars desc per source + the s1 doc


def test_chunk_documents_step(spark):
    df = _docs(spark, [(1, GOOD, "s0", 100)])
    ctx = ChunkDocumentsStep(COLS, chunk_tokens=10)(_ctx(df))
    chunks = ctx.processed_data["corpus.chunks"].collect()
    assert len(chunks) == 3  # 25 tokens / 10
    assert sum(c.n_tokens for c in chunks) == 25


def test_url_dedup_step(spark):
    cols = CorpusColumns(url="url")
    df = spark.createDataFrame(
        [
            (1, GOOD, "s0", 100, "https://example.com/a?utm_source=x"),
            (2, GOOD2, "s1", 90, "https://EXAMPLE.com/a/"),
            (3, GOOD2, "s1", 90, "https://example.com/b"),
        ],
        "doc_id long, text string, source string, n_chars long, url string",
    )
    ctx = UrlDedupStep(cols)(
        PipelineContext(pipeline_name="p", correlation_id="t", raw_data=df)
    )
    assert sorted(r.doc_id for r in ctx.raw_data.collect()) == [1, 3]


def test_missing_column_is_recorded_error(spark):
    df = spark.createDataFrame([(1, "t")], "doc_id long, other string")
    step = GopherQualityGateStep(COLS, stop_on_error=False)
    ctx = step(_ctx(df))
    assert ctx.errors and "text" in ctx.errors[0]["error"]
    assert ctx.execution_log[-1]["status"] == "error_continue"


def test_full_pipeline_conditions_and_flow(spark):
    rows = [
        (1, GOOD, "s0", 100),
        (2, GOOD, "s0", 99),    # exact dup of 1
        (3, NEAR, "s0", 98),    # near dup of 1
        (4, GOOD2, "s1", 90),
        (5, BAD, "s1", 5),      # fails quality
    ]
    docs = _docs(spark, rows)
    bench = _docs(spark, [(100, GOOD2, "bench", 90)])
    ctx = run_corpus_prep(
        docs, benchmark=bench, quota_n=10, chunk_tokens=10,
        contamination_threshold=0.5,
    )
    # 5 gone at quality, 2 at exact, 3 at near-dup, 4 at decontamination.
    assert [r.doc_id for r in ctx.raw_data.collect()] == [1]
    assert ctx.processed_data["corpus.chunks"].count() > 0
    logged = {e["processor"] for e in ctx.execution_log}
    assert "url_dedup" in logged  # skipped (no url column) but logged
    skipped = [e for e in ctx.execution_log if e.get("skipped")]
    assert {e["processor"] for e in skipped} == {
        "url_blocklist", "url_dedup", "boilerplate_filter", "shuffle_shards",
        "span_excise", "perplexity_filter", "quality_top_fraction",
        "lexical_diversity",
    }


def test_full_pipeline_skips_decontamination_without_benchmark(spark):
    docs = _docs(spark, [(1, GOOD, "s0", 100)])
    ctx = run_corpus_prep(docs)
    skipped = {e["processor"] for e in ctx.execution_log if e.get("skipped")}
    assert skipped == {
        "url_blocklist", "url_dedup", "decontamination", "boilerplate_filter",
        "shuffle_shards", "span_excise", "perplexity_filter",
        "quality_top_fraction", "lexical_diversity",
    }
    assert ctx.raw_data.count() == 1


def test_run_partial_slice(spark):
    docs = _docs(spark, [(1, GOOD, "s0", 100), (2, GOOD, "s1", 99)])
    pipe = build_corpus_pipeline()
    ctx = pipe.run_partial(
        _ctx(docs), "exact_dedup", "exact_dedup"
    )
    assert [r.doc_id for r in ctx.raw_data.collect()] == [1]
    # Only the sliced step ran — no quality gate, no chunks.
    assert "corpus.chunks" not in ctx.processed_data


def test_pipeline_sees_one_lazy_plan(spark):
    """No step triggers an action by default: the composed run must leave
    raw_data as a pure plan (no job side effects needed to build it)."""
    docs = _docs(spark, [(1, GOOD, "s0", 100), (2, GOOD2, "s1", 90)])
    ctx = run_corpus_prep(docs)
    # the final frame is still composable/explainable as one plan
    plan = ctx.raw_data._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" in plan


def test_dataset_split_step(spark):
    ctx = DatasetSplitStep(COLS)(
        _ctx(_docs(spark, [(1, GOOD, "s0", 100), (2, GOOD2, "s1", 90)]))
    )
    rows = ctx.raw_data.collect()
    assert all(r.split in ("train", "val", "test") for r in rows)
    assert set(ctx.raw_data.columns) >= {"doc_id", "text", "source", "split"}


def test_boilerplate_filter_step(spark):
    # GOOD and NEAR share nearly every 3-gram -> both mostly "boilerplate"
    # at min_docs=2; GOOD2 shares none.
    df = _docs(spark, [(1, GOOD, "s0", 100), (2, NEAR, "s1", 99),
                       (3, GOOD2, "s0", 90)])
    ctx = BoilerplateFilterStep(COLS, max_frac=0.5, min_docs=2)(_ctx(df))
    assert [r.doc_id for r in ctx.raw_data.collect()] == [3]
    scores = {r.doc_id: r.boiler_frac for r in
              ctx.processed_data["corpus.boilerplate"].collect()}
    assert scores[1] > 0.5 and scores[2] > 0.5 and scores[3] == 0.0


def test_shuffle_shards_step(spark):
    df = _docs(spark, [(i, GOOD, "s0", 100) for i in range(20)])
    ctx = ShuffleShardsStep(COLS, n_shards=4)(_ctx(df))
    rows = ctx.raw_data.collect()
    assert len(rows) == 20 and {"shard", "pos"} <= set(rows[0].asDict())
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))


def test_full_pipeline_with_boilerplate_and_shards(spark):
    docs = _docs(spark, [(1, GOOD, "s0", 100), (2, GOOD2, "s1", 90)])
    ctx = run_corpus_prep(docs, max_boiler_frac=0.9, n_shards=2)
    skipped = {e["processor"] for e in ctx.execution_log if e.get("skipped")}
    assert skipped == {"url_blocklist", "url_dedup", "decontamination",
                       "span_excise", "perplexity_filter",
                       "quality_top_fraction", "lexical_diversity"}
    rows = ctx.raw_data.collect()
    assert sorted(r.doc_id for r in rows) == [1, 2]
    assert all(r.shard in (0, 1) and r.pos == 0 or r.pos >= 0 for r in rows)


def test_span_excise_step(spark):
    from meshinsights_data_pipeline_spark.analytics.corpus_pipeline import (
        SpanExciseStep,
    )

    shared = "alpha beta gamma delta epsilon zeta"
    docs = _docs(
        spark,
        [
            (1, f"{shared} own words here", "web", 40),
            (2, f"intro {shared} outro", "web", 40),
            (3, "Completely UNRELATED content, stands alone!", "web", 40),
        ],
    )
    ctx = SpanExciseStep(COLS, n=5)(_ctx(docs))
    by_id = {r.doc_id: r.text for r in ctx.raw_data.collect()}
    assert by_id[1] == "own words here"
    assert by_id[2] == "intro outro"
    # a doc with nothing to cut keeps its ORIGINAL text — casing and
    # punctuation intact, not the normalized form
    assert by_id[3] == "Completely UNRELATED content, stands alone!"
    removed = {r.doc_id: r.n_removed
               for r in ctx.processed_data["corpus.spans"].collect()}
    assert removed == {1: 6, 2: 6, 3: 0}

    with pytest.raises(ValueError, match="span_excise n"):
        SpanExciseStep(COLS, n=0)


def test_span_excise_condition_in_pipeline(spark):
    """span_excise runs iff span_excise_n is set — the same conditional
    contract as the other optional steps."""
    docs = _docs(spark, [(1, GOOD, "web", 120), (2, GOOD2, "web", 120)])
    ctx_off = build_corpus_pipeline(quota_n=None).run(_ctx(docs))
    assert "corpus.spans" not in ctx_off.processed_data
    ctx_on = build_corpus_pipeline(quota_n=None, span_excise_n=5).run(_ctx(docs))
    assert "corpus.spans" in ctx_on.processed_data


def test_corpus_report_step(spark):
    from meshinsights_data_pipeline_spark.analytics.corpus_pipeline import (
        CorpusReportStep,
    )

    docs = _docs(
        spark,
        [(1, GOOD, "s0", 100), (2, GOOD, "s0", 100), (3, GOOD2, "s1", 90)],
    )
    ctx = CorpusReportStep(COLS)(_ctx(docs))
    rep = {r.source: r for r in ctx.processed_data["corpus.report"].collect()}
    assert rep["s0"].n_docs == 2 and rep["s0"].n_distinct == 1
    assert rep["s0"].dup_frac == 0.5
    assert rep["s1"].n_docs == 1 and rep["s1"].dup_frac == 0.0
    assert rep["s0"].total_tokens == 50  # 25 tokens x 2 docs
    # raw_data flows through untouched
    assert ctx.raw_data.count() == 3


def test_perplexity_and_quality_band_steps(spark):
    """Both new quality gates, driven directly (the composed pipeline's
    Gopher gate owns length policy, so step tests bind tiny docs): the
    perplexity band rejects out-of-band docs but KEEPS unscoreable
    (<2 token) ones; the per-source band keeps the top fraction; both
    stash their score frames; default pipeline skips both."""
    from meshinsights_data_pipeline_spark.analytics.corpus_pipeline import (
        PerplexityFilterStep,
        QualityTopFractionStep,
    )
    from meshinsights_data_pipeline_spark.operators.corpus import (
        lm_quality_score,
        quality_top_fraction,
    )

    base = "the cat and the dog walk to the house in the morning"
    rows = [(i, base + f" route {i}", "s0", 60) for i in range(6)]
    rows += [(100, "zz qq xx vv ww yy kk jj", "s0", 20),  # out-of-model -> high ppl
             (101, "solo", "s0", 4)]                       # unscoreable, kept
    docs = _docs(spark, rows)

    scores = {r.doc_id: r.ppl for r in
              lm_quality_score(docs, "doc_id", "text").collect()}
    cut = sorted(scores.values())[len(scores) // 2]
    assert scores[100] > cut  # the gibberish doc really is out-of-band

    ctx = PerplexityFilterStep(COLS, min_ppl=0.0, max_ppl=cut)(_ctx(docs))
    kept = {r.doc_id for r in ctx.raw_data.select("doc_id").collect()}
    assert 101 in kept and 100 not in kept
    assert kept - {101} == {d for d, p in scores.items() if p <= cut}
    assert "corpus.lm_scores" in ctx.processed_data

    ctx2 = QualityTopFractionStep(COLS, keep_frac=0.5)(_ctx(docs))
    kept2 = {r.doc_id for r in ctx2.raw_data.select("doc_id").collect()}
    assert kept2 == {r.doc_id for r in
                     quality_top_fraction(docs, "doc_id", "text",
                                          keep_frac=0.5).collect()}
    assert "corpus.quality_band" in ctx2.processed_data

    with pytest.raises(ValueError, match="below max_ppl"):
        PerplexityFilterStep(COLS, min_ppl=5.0, max_ppl=2.0)

    # composed pipeline: both steps OFF by default, ON when configured
    ctx3 = run_corpus_prep(
        _docs(spark, [(1, GOOD, "s0", 100), (2, GOOD2, "s1", 90)]),
        lm_ppl_band=(0.0, float("inf")), quality_keep_frac=1.0,
    )
    ran = {e["processor"] for e in ctx3.execution_log if not e.get("skipped")}
    assert {"perplexity_filter", "quality_top_fraction"} <= ran
    assert sorted(r.doc_id for r in ctx3.raw_data.collect()) == [1, 2]


def test_url_blocklist_step_and_conditions(spark):
    from meshinsights_data_pipeline_spark.analytics.corpus_pipeline import (
        UrlBlocklistStep,
        build_corpus_pipeline,
    )

    cols = CorpusColumns(url="url")
    df = spark.createDataFrame(
        [
            (1, GOOD, "s0", 100, "https://www.bad.com/a"),
            (2, GOOD2, "s1", 90, "https://fine.org/b"),
            (3, GOOD2, "s1", 90, "https://a.bad.com/c"),
        ],
        "doc_id long, text string, source string, n_chars long, url string",
    )
    ctx = UrlBlocklistStep(cols, blocked=["bad.com"])(
        PipelineContext(pipeline_name="p", correlation_id="t", raw_data=df)
    )
    assert sorted(r.doc_id for r in ctx.raw_data.collect()) == [2]
    assert sorted(
        r.doc_id for r in ctx.processed_data["corpus.url_blocked"].collect()
    ) == [1, 3]

    # conditions: default build skips both new steps; enabling them runs
    # them (blocklist needs a bound url column)
    p_off = build_corpus_pipeline(cols=CorpusColumns())
    names_off = {
        pr.name for pr in p_off.processors
        if p_off.conditions.get(pr.name, lambda c: True)(
            PipelineContext(pipeline_name="p", correlation_id="t",
                            raw_data=df)
        )
    }
    assert "url_blocklist" not in names_off
    assert "lexical_diversity" not in names_off
    p_on = build_corpus_pipeline(
        cols=cols, url_blocklist=["bad.com"], lexical_report=True
    )
    names_on = {
        pr.name for pr in p_on.processors
        if p_on.conditions.get(pr.name, lambda c: True)(
            PipelineContext(pipeline_name="p", correlation_id="t",
                            raw_data=df)
        )
    }
    assert {"url_blocklist", "lexical_diversity"} <= names_on


def test_lexical_diversity_step_is_report_not_gate(spark):
    from meshinsights_data_pipeline_spark.analytics.corpus_pipeline import (
        LexicalDiversityStep,
    )

    df = _docs(spark, [(1, GOOD, "s0", 100), (2, GOOD2, "s1", 90)])
    ctx = LexicalDiversityStep(COLS)(_ctx(df))
    rep = {r.source: r for r in
           ctx.processed_data["corpus.lexical_diversity"].collect()}
    assert set(rep) == {"s0", "s1"}
    assert all(r.vocab > 0 and r.n_tokens > 0 for r in rep.values())
    assert ctx.raw_data.count() == 2  # pass-through, not a gate


def test_events_pipeline_e2e(spark, sf_smoke):
    """The events analytics pipeline runs end-to-end on real testdata:
    every stash lands, the report scalars are consistent with the
    stashed frames, and raw_data flows through unfiltered (analytics
    annotate, they don't gate)."""
    from meshinsights_data_pipeline_spark.analytics.events_pipeline import (
        build_events_pipeline,
    )
    from meshinsights_data_pipeline_spark.core.context import PipelineContext
    from meshinsights_data_pipeline_spark.session import read_table

    ev = read_table(spark, sf_smoke, "events")
    pipe = build_events_pipeline()
    ctx = pipe.run(PipelineContext(
        pipeline_name="events_analytics", correlation_id="t", raw_data=ev))
    for key in ("events.sessions", "events.attribution", "events.outliers",
                "events.twa"):
        assert key in ctx.processed_data
    rep = ctx.stages["events.report"]
    assert rep["n_conversions"] == ctx.processed_data[
        "events.attribution"].count()
    assert 0 < rep["n_attributed"] <= rep["n_conversions"]
    assert rep["n_sessions"] > 0 and rep["n_twa_users"] > 0
    # raw_data untouched: same row count in and out
    assert ctx.raw_data.count() == ev.count()
    # run_partial composes: first two steps only
    ctx2 = pipe.run_partial(
        PipelineContext(pipeline_name="p", correlation_id="t", raw_data=ev),
        start="sessionize", end="attribution")
    assert "events.sessions" in ctx2.processed_data
    assert "events.outliers" not in ctx2.processed_data


def test_events_pipeline_validation_raises(spark):
    """The events steps follow the Processor contract's RAISE-on-missing
    validation (a bool-returning override is silently ignored by
    ``Processor.__call__``): a report-only run_partial that skipped the
    upstream stashes fails with the controlled ValueError, not a raw
    KeyError inside process(); a missing input column fails before any
    expensive work."""
    import pytest

    from meshinsights_data_pipeline_spark.analytics.events_pipeline import (
        EventColumns,
        SessionizeStep,
        build_events_pipeline,
    )
    from meshinsights_data_pipeline_spark.core.context import PipelineContext

    ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string,"
            " value double")
    pipe = build_events_pipeline()
    ctx = PipelineContext(pipeline_name="p", correlation_id="t", raw_data=ev)
    with pytest.raises(ValueError, match="events.sessions"):
        pipe.run_partial(ctx, start="events_report", end="events_report")
    # the error is recorded on the controlled path, not swallowed
    assert any("events.sessions" in e["error"] for e in ctx.errors)

    # a missing required column raises the contract ValueError up front
    bad = spark.createDataFrame([], "event_id long, ts timestamp")
    with pytest.raises(ValueError, match="user_id"):
        SessionizeStep(EventColumns())(PipelineContext(
            pipeline_name="p", correlation_id="t", raw_data=bad))


def test_events_pipeline_mad_outlier_mode(spark):
    """OutlierStep(method='mad') routes through the robust detector and
    the masking case proves why: one wild value inflates sigma enough
    that zscore flags nothing at the same data, while MAD flags it."""
    import pytest

    from meshinsights_data_pipeline_spark.analytics.events_pipeline import (
        EventColumns,
        OutlierStep,
    )
    from meshinsights_data_pipeline_spark.core.context import PipelineContext

    from datetime import datetime

    rows = [(i, datetime(2024, 1, 1), 1, "click", float(v))
            for i, v in enumerate([10, 10, 11, 9, 10, 11, 9, 10, 1000000])]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double")
    ctx = OutlierStep(EventColumns(), threshold=3.0, method="mad")(
        PipelineContext(pipeline_name="p", correlation_id="t", raw_data=df))
    flagged = ctx.processed_data["events.outliers"].collect()
    assert [r.value for r in flagged] == [1000000.0]
    # the parametric mode is masked by its own outlier at this threshold
    ctx2 = OutlierStep(EventColumns(), threshold=3.0, method="zscore")(
        PipelineContext(pipeline_name="p", correlation_id="t", raw_data=df))
    assert ctx2.processed_data["events.outliers"].count() == 0
    with pytest.raises(ValueError, match="unknown outlier method"):
        OutlierStep(EventColumns(), method="iqr")
    # threshold=None resolves per method (the units differ: sigmas vs
    # raw MAD units) — a shared 2.0 default would over-flag in MAD mode
    assert OutlierStep(EventColumns()).threshold == 2.0
    assert OutlierStep(EventColumns(), method="mad").threshold == 3.5
    assert OutlierStep(EventColumns(), threshold=4.0,
                       method="mad").threshold == 4.0
    # and the builder passes the None default through to the resolver
    from meshinsights_data_pipeline_spark.analytics.events_pipeline import (
        build_events_pipeline,
    )

    steps = {p.name: p for p in
             build_events_pipeline(outlier_method="mad").processors}
    assert steps["outliers"].threshold == 3.5
    assert build_events_pipeline().processors[2].threshold == 2.0
