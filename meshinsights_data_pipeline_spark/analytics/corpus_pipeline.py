"""Corpus-prep workload on the Processor/Pipeline contract.

The training-corpus flow (quality gate -> URL dedup -> exact dedup ->
near-dup collapse -> decontamination -> PII redaction -> quota ->
chunking) existed as bare DataFrame operators; this module wraps each
stage as a Processor so the reference's composability contract
(src/core/processor.py:10-77 validation/timing/error policy, conditions
src/core/pipeline.py:83-99, checkpoints 17-19) reaches the extension
surface exactly the way analytics/power_pipeline.py:236-281 does for the
power workload.

Data-flow convention: every gating step reads ``context.raw_data``
(the surviving documents), replaces it with the filtered frame, and
stashes its diagnostic table under a namespaced ``processed_data`` key
("corpus.quality", "corpus.contamination", ...). The chunker emits a
new table ("corpus.chunks") and leaves ``raw_data`` as documents.
Everything stays a lazy plan — by default no step triggers an action, so
composing N steps still yields ONE Catalyst-visible plan per final
action, which is the 100 TB shape (the quality gate, decontamination
probe, PII pass and chunking fuse map-side; only the dedup shuffles and
the quota window are wide). Setting ``context.config["corpus.count_rows"]
= True`` makes each step record its surviving row count in
``context.stages`` — a per-step action, for tests and small runs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.core.context import PipelineContext
from meshinsights_data_pipeline_spark.core.pipeline import Pipeline, PipelineConfig
from meshinsights_data_pipeline_spark.core.processor import Processor
from meshinsights_data_pipeline_spark.operators.components import dedup_survivors
from meshinsights_data_pipeline_spark.operators.corpus import (
    chunk_documents,
    contamination_check,
    corpus_report,
    duplicate_spans,
    excise_spans,
    gopher_quality,
    lexical_diversity,
    quota_sample,
    url_dedup,
    url_host_blocklist,
)
from meshinsights_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
)
from meshinsights_data_pipeline_spark.operators.text import pii_counts, redact_pii

BENCHMARK_KEY = "corpus.benchmark"


class CorpusColumns:
    """Column-name binding for the corpus workload (testdata documents:
    doc_id/text/source/n_chars; a crawl corpus adds a url column)."""

    def __init__(self, id="doc_id", text="text", source="source",
                 order="n_chars", url=None):
        self.id, self.text, self.source, self.order, self.url = (
            id, text, source, order, url,
        )


class CorpusStep(Processor):
    """Shared base: validates the documents frame in, and (optionally)
    records the surviving row count per step."""

    def __init__(self, cols: CorpusColumns, name: str, **kw):
        super().__init__(name=name, **kw)
        self.cols = cols

    def required_columns(self) -> list[str]:
        return [self.cols.id, self.cols.text]

    def validate_prerequisites(self, context: PipelineContext) -> None:
        docs = self.require_raw_data(context)
        self.require_columns(docs, self.required_columns())

    def validate_output(self, context: PipelineContext) -> None:
        docs = self.require_raw_data(context)
        self.require_columns(docs, [self.cols.id])

    def _record(self, context: PipelineContext) -> None:
        if context.config.get("corpus.count_rows"):
            context.stages[f"corpus.{self.name}"] = {
                "rows": context.raw_data.count()
            }


class GopherQualityGateStep(CorpusStep):
    """Keep docs passing every Gopher rule; stash the per-doc signals as
    "corpus.quality"."""

    def __init__(self, cols: CorpusColumns, **kw):
        super().__init__(cols, name="gopher_quality_gate", **kw)

    def process(self, context: PipelineContext) -> PipelineContext:
        from meshinsights_data_pipeline_spark.operators.corpus import (
            gopher_keep_df,
        )

        docs = context.raw_data
        # Signals stashed lazily for downstream consumers; the gate itself
        # filters docs with the staged keep predicate (bit-identical to
        # quality.keep by construction — same expressions, shared
        # normalize/split staged once per row, r16) so it is ONE map-side
        # corpus scan instead of scan + signal scan + id semi-join shuffle.
        context.processed_data["corpus.quality"] = gopher_quality(
            docs, self.cols.id, self.cols.text
        )
        context.raw_data = gopher_keep_df(docs, self.cols.text)
        self._record(context)
        return context


class BoilerplateFilterStep(CorpusStep):
    """Drop docs whose cross-document boilerplate fraction (share of the
    doc's distinct word-n-grams occurring in >= min_docs documents)
    exceeds ``max_frac``; stash the per-doc scores as
    "corpus.boilerplate". The cross-doc twin of the within-doc Gopher
    repetition gate."""

    def __init__(self, cols: CorpusColumns, max_frac: float = 0.5,
                 n: int = 3, min_docs: int = 3, **kw):
        super().__init__(cols, name="boilerplate_filter", **kw)
        self.max_frac = max_frac
        self.n = n
        self.min_docs = min_docs

    def process(self, context: PipelineContext) -> PipelineContext:
        from meshinsights_data_pipeline_spark.operators.corpus import (
            boilerplate_ngrams,
        )

        docs = context.raw_data
        scores = boilerplate_ngrams(
            docs, self.cols.id, self.cols.text, n=self.n, min_docs=self.min_docs
        )
        context.processed_data["corpus.boilerplate"] = scores
        context.raw_data = docs.join(
            scores.filter(F.col("boiler_frac") <= self.max_frac).select(self.cols.id),
            self.cols.id, "left_semi",
        )
        self._record(context)
        return context


class PerplexityFilterStep(CorpusStep):
    """CCNet-style LM band filter: train the add-one bigram LM on the
    surviving corpus, keep docs whose perplexity falls inside
    ``(min_ppl, max_ppl]`` — too low is boilerplate, too high is
    gibberish (Wenzek et al. 2020's head/middle split). Docs too short
    to score (< 2 tokens) are KEPT (no evidence either way — the Gopher
    token-count gate owns length policy). Per-doc scores stash as
    "corpus.lm_scores"."""

    def __init__(self, cols: CorpusColumns, min_ppl: float = 0.0,
                 max_ppl: float = float("inf"), **kw):
        super().__init__(cols, name="perplexity_filter", **kw)
        if min_ppl >= max_ppl:
            raise ValueError(
                f"min_ppl {min_ppl} must be below max_ppl {max_ppl}"
            )
        self.min_ppl = min_ppl
        self.max_ppl = max_ppl

    def process(self, context: PipelineContext) -> PipelineContext:
        from meshinsights_data_pipeline_spark.operators.corpus import (
            lm_quality_score,
        )

        docs = context.raw_data
        scores = lm_quality_score(docs, self.cols.id, self.cols.text)
        context.processed_data["corpus.lm_scores"] = scores
        rejects = scores.filter(
            (F.col("ppl") <= self.min_ppl) | (F.col("ppl") > self.max_ppl)
        ).select(self.cols.id)
        context.raw_data = docs.join(rejects, self.cols.id, "left_anti")
        self._record(context)
        return context


class QualityTopFractionStep(CorpusStep):
    """Per-source quantile gate: keep each source's top ``keep_frac``
    quality band (exact per-source percentile threshold broadcast back —
    never a corpus-wide window sort). Needs the source column; scores
    stash as "corpus.quality_band"."""

    def __init__(self, cols: CorpusColumns, keep_frac: float = 0.5, **kw):
        super().__init__(cols, name="quality_top_fraction", **kw)
        if not 0.0 < keep_frac <= 1.0:  # fail at build, not mid-pipeline
            raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
        self.keep_frac = keep_frac

    def required_columns(self) -> list[str]:
        return [self.cols.id, self.cols.text, self.cols.source]

    def process(self, context: PipelineContext) -> PipelineContext:
        from meshinsights_data_pipeline_spark.operators.corpus import (
            quality_top_fraction,
        )

        docs = context.raw_data
        kept = quality_top_fraction(
            docs, self.cols.id, self.cols.text, self.cols.source,
            keep_frac=self.keep_frac,
        )
        context.processed_data["corpus.quality_band"] = kept
        context.raw_data = docs.join(
            kept.select(self.cols.id), self.cols.id, "left_semi"
        )
        self._record(context)
        return context


class UrlBlocklistStep(CorpusStep):
    """Drop documents whose URL host matches the domain blocklist with
    suffix semantics (corpus.url_host_blocklist, the UT1-style filter).
    Runs BEFORE URL dedup: a blocked doc must not win a canonical-URL
    survivor slot that shadows a clean duplicate."""

    def __init__(self, cols: CorpusColumns, blocked, **kw):
        super().__init__(cols, name="url_blocklist", **kw)
        self.blocked = blocked

    def required_columns(self) -> list[str]:
        return [self.cols.id, self.cols.url]

    def process(self, context: PipelineContext) -> PipelineContext:
        docs = context.raw_data
        hits = url_host_blocklist(
            docs, self.cols.id, self.cols.url, self.blocked
        )
        context.processed_data["corpus.url_blocked"] = hits
        context.raw_data = docs.join(
            hits.select(self.cols.id), self.cols.id, "left_anti"
        )
        self._record(context)
        return context


class LexicalDiversityStep(CorpusStep):
    """Attach the per-source lexical-diversity report (x74 metrics:
    vocab, TTR, top-term share, Zipf slope) to processed_data — a
    report, not a gate; raw_data passes through unchanged."""

    def __init__(self, cols: CorpusColumns, top_k: int = 200, **kw):
        super().__init__(cols, name="lexical_diversity", **kw)
        self.top_k = top_k

    def required_columns(self) -> list[str]:
        return [self.cols.source, self.cols.text]

    def process(self, context: PipelineContext) -> PipelineContext:
        context.processed_data["corpus.lexical_diversity"] = lexical_diversity(
            context.raw_data, self.cols.source, self.cols.text, self.top_k
        )
        self._record(context)
        return context


class UrlDedupStep(CorpusStep):
    """One survivor per canonical URL (crawl-level dedup). Composed only
    when the corpus has a URL column (see build_corpus_pipeline)."""

    def __init__(self, cols: CorpusColumns, **kw):
        super().__init__(cols, name="url_dedup", **kw)

    def required_columns(self) -> list[str]:
        return [self.cols.id, self.cols.url]

    def process(self, context: PipelineContext) -> PipelineContext:
        docs = context.raw_data
        keep = url_dedup(docs, self.cols.id, self.cols.url)
        context.processed_data["corpus.url_survivors"] = keep
        context.raw_data = docs.join(
            keep.select(self.cols.id), self.cols.id, "left_semi"
        )
        self._record(context)
        return context


class ExactDedupStep(CorpusStep):
    """md5-fingerprint exact dedup, min-id survivor — one shuffle."""

    def __init__(self, cols: CorpusColumns, **kw):
        super().__init__(cols, name="exact_dedup", **kw)

    def process(self, context: PipelineContext) -> PipelineContext:
        docs = context.raw_data
        context.raw_data = docs.join(
            exact_dedup(docs, self.cols.id, self.cols.text).select(self.cols.id),
            self.cols.id, "left_semi",
        )
        self._record(context)
        return context


class NearDupCollapseStep(CorpusStep):
    """MinHash-LSH candidates -> verified Jaccard -> connected components
    -> keep only each cluster's min-id survivor.

    This step is the pipeline's one deliberate STAGE BARRIER (``barrier``,
    default on): the incoming documents frame is localCheckpoint-ed before
    pair detection. Reason: this is where the otherwise-lazy pipeline plan
    fans out — minhash_dedup_pairs scans the docs twice (bands + shingles),
    the survivor anti-join scans them again, and every DOWNSTREAM step's
    scan replays the whole upstream subtree (quality gate + exact dedup,
    two shuffles) once more, because CC's internal actions already force
    the pair side but nothing truncates the docs lineage. Materializing
    once here bounds the upstream to a single execution regardless of how
    many steps follow (measured 12.4s -> 11.1s warm e2e at sf0.1/local[32];
    the residual is ~15 irreducible sequential stages x ~0.4s scheduling
    latency at toy scale — the same code at local[8] runs 9.5s — while the
    saved recomputation grows with corpus size). At 100 TB
    the barrier holds the FILTERED corpus on executor-local storage —
    the same durability trade connected_components documents; pass
    ``barrier=False`` to keep the fully-lazy single-plan shape."""

    def __init__(self, cols: CorpusColumns, threshold: float = 0.5,
                 algorithm: str = "star", barrier: bool = True, **kw):
        super().__init__(cols, name="neardup_collapse", **kw)
        self.threshold = threshold
        self.algorithm = algorithm
        self.barrier = barrier

    def process(self, context: PipelineContext) -> PipelineContext:
        docs = context.raw_data
        if self.barrier:
            docs = docs.localCheckpoint()
        pairs = minhash_dedup_pairs(
            docs, self.cols.id, self.cols.text, threshold=self.threshold
        )
        context.raw_data = dedup_survivors(
            docs, pairs, self.cols.id, algorithm=self.algorithm
        )
        self._record(context)
        return context


class SpanExciseStep(CorpusStep):
    """ExactSubstr removal (duplicate_spans + excise_spans): cut token
    spans whose word-n-grams recur across >= min_docs distinct documents.
    Runs AFTER doc-level dedup on purpose — whole duplicates are already
    collapsed, so what's cut here is the partial overlap (boilerplate
    passages, quoted blocks) document-level dedup cannot touch. Docs that
    lose a span get the NORMALIZED excised text (the detector's offsets
    are over normalized text — normalization is not offset-preserving,
    so the original form cannot be reconstructed around a cut); docs
    with nothing to cut keep their ORIGINAL text untouched. Per-doc
    removal counts stash as "corpus.spans"."""

    def __init__(self, cols: CorpusColumns, n: int = 5, min_docs: int = 2,
                 barrier: bool = True, **kw):
        super().__init__(cols, name="span_excise", **kw)
        if n < 1:
            raise ValueError(f"span_excise n must be >= 1, got {n}")
        self.n = n
        self.min_docs = min_docs
        self.barrier = barrier

    def process(self, context: PipelineContext) -> PipelineContext:
        docs = context.raw_data
        spans = duplicate_spans(
            docs, self.cols.id, self.cols.text, n=self.n, min_docs=self.min_docs
        )
        cleaned = excise_spans(docs, spans, self.cols.id, self.cols.text)
        # Second (and last) stage barrier: the excision subtree (gram
        # window + span merge + HOF token filter over full text) is the
        # priciest replayed unit — decontamination scans the docs twice
        # and pii/quota/chunks once each, so leaving it lazy replays it
        # ~4x in the terminal plan. Checkpointing CLEANED (not the joined
        # output) bounds BOTH consumers — the survivors path below and
        # the "corpus.spans" stash — with one materialization; the join
        # back to docs stays lazy but is cheap (both inputs truncated,
        # touched side tiny and broadcast-eligible). Same trade as
        # NearDupCollapseStep.
        if self.barrier:
            cleaned = cleaned.localCheckpoint()
        context.processed_data["corpus.spans"] = cleaned.select(
            self.cols.id, "n_removed"
        )
        # Only docs that actually lost a span take the (normalized)
        # excised text; untouched docs keep their ORIGINAL text — a
        # corpus-wide rewrite to normalized form for n_removed=0 rows
        # would silently strip casing/punctuation from training text the
        # step had no reason to touch.
        # Join ONLY the affected rows (n_removed > 0): shipping the full
        # normalized clean_text for every doc would ~double the shuffled
        # text bytes for the usually-tiny excised fraction.
        touched = cleaned.filter(F.col("n_removed") > 0).select(
            self.cols.id, "clean_text"
        )
        context.raw_data = docs.join(touched, self.cols.id, "left").withColumn(
            self.cols.text,
            F.coalesce(F.col("clean_text"), F.col(self.cols.text)),
        ).drop("clean_text")
        self._record(context)
        return context


class CorpusReportStep(CorpusStep):
    """Stash the per-source dataset report card (corpus.corpus_report) as
    "corpus.report" over the SURVIVING documents — the summary a dataset
    card publishes after curation. Pure stash: raw_data flows through
    untouched and the report frame stays lazy (no action here), so the
    step is free unless the report is actually consumed."""

    def __init__(self, cols: CorpusColumns, **kw):
        super().__init__(cols, name="corpus_report", **kw)

    def required_columns(self) -> list[str]:
        return [self.cols.id, self.cols.text, self.cols.source]

    def process(self, context: PipelineContext) -> PipelineContext:
        context.processed_data["corpus.report"] = corpus_report(
            context.raw_data, self.cols.source, self.cols.id, self.cols.text
        )
        self._record(context)
        return context


class DecontaminationStep(CorpusStep):
    """Drop docs whose shingle overlap with the benchmark table (stashed
    at processed_data["corpus.benchmark"]) exceeds the threshold; stash
    the per-doc scores as "corpus.contamination"."""

    def __init__(self, cols: CorpusColumns, threshold: float = 0.05,
                 broadcast_benchmark: bool = True, **kw):
        super().__init__(cols, name="decontamination", **kw)
        self.threshold = threshold
        self.broadcast_benchmark = broadcast_benchmark

    def validate_prerequisites(self, context: PipelineContext) -> None:
        super().validate_prerequisites(context)
        if BENCHMARK_KEY not in context.processed_data:
            raise ValueError(
                f"DecontaminationStep needs processed_data[{BENCHMARK_KEY!r}]"
            )

    def process(self, context: PipelineContext) -> PipelineContext:
        docs = context.raw_data
        contam = contamination_check(
            docs,
            context.processed_data[BENCHMARK_KEY],
            self.cols.id,
            self.cols.text,
            threshold=self.threshold,
            broadcast_benchmark=self.broadcast_benchmark,
        )
        context.processed_data["corpus.contamination"] = contam
        context.raw_data = docs.join(
            contam.filter(~F.col("contaminated")).select(self.cols.id),
            self.cols.id, "left_semi",
        )
        self._record(context)
        return context


class PiiRedactionStep(CorpusStep):
    """Replace the text column with its redacted form (emails / IPv4 /
    long digit runs -> typed placeholders); stash the per-doc audit
    counts as "corpus.pii". Map-side chained regexp_replace."""

    def __init__(self, cols: CorpusColumns, **kw):
        super().__init__(cols, name="pii_redaction", **kw)

    def process(self, context: PipelineContext) -> PipelineContext:
        docs = context.raw_data
        context.processed_data["corpus.pii"] = pii_counts(
            docs, self.cols.id, self.cols.text
        )
        others = [c for c in docs.columns if c != self.cols.text]
        context.raw_data = docs.select(
            *others, redact_pii(F.col(self.cols.text)).alias(self.cols.text)
        )
        self._record(context)
        return context


class DatasetSplitStep(CorpusStep):
    """Annotate every surviving doc with its deterministic train/val/test
    split (md5-bucket threshold, corpus.split_columns) — zero shuffle,
    pure withColumn; downstream writers partition the export by it."""

    def __init__(self, cols: CorpusColumns,
                 weights: dict[str, int] | None = None, **kw):
        super().__init__(cols, name="dataset_split", **kw)
        self.weights = weights

    def validate_output(self, context: PipelineContext) -> None:
        super().validate_output(context)
        self.require_columns(context.raw_data, ["split"])

    def process(self, context: PipelineContext) -> PipelineContext:
        from meshinsights_data_pipeline_spark.operators.corpus import split_columns

        _, split = split_columns(self.cols.id, self.weights)
        context.raw_data = context.raw_data.withColumn("split", split)
        self._record(context)
        return context


class ShuffleShardsStep(CorpusStep):
    """Annotate every surviving doc with its deterministic training shard
    and within-shard position (corpus.shuffle_shards) — the shuffle-once
    layout a pretraining loader reads sequentially. One exchange on the
    hash-balanced shard key."""

    def __init__(self, cols: CorpusColumns, n_shards: int = 8,
                 seed: int = 0, **kw):
        super().__init__(cols, name="shuffle_shards", **kw)
        self.n_shards = n_shards
        self.seed = seed

    def validate_output(self, context: PipelineContext) -> None:
        super().validate_output(context)
        self.require_columns(context.raw_data, ["shard", "pos"])

    def process(self, context: PipelineContext) -> PipelineContext:
        from meshinsights_data_pipeline_spark.operators.corpus import (
            shuffle_shards,
        )

        docs = context.raw_data
        layout = shuffle_shards(
            docs, self.cols.id, n_shards=self.n_shards, seed=self.seed
        )
        context.raw_data = docs.join(layout, self.cols.id)
        self._record(context)
        return context


class QuotaSampleStep(CorpusStep):
    """Per-source quota (salted two-phase top-n, hot-key safe)."""

    def __init__(self, cols: CorpusColumns, n: int = 1000,
                 salt_buckets: int | None = 16, **kw):
        super().__init__(cols, name="quota_sample", **kw)
        self.n = n
        self.salt_buckets = salt_buckets

    def required_columns(self) -> list[str]:
        return [self.cols.id, self.cols.source, self.cols.order]

    def process(self, context: PipelineContext) -> PipelineContext:
        context.raw_data = quota_sample(
            context.raw_data, self.cols.source, self.n,
            self.cols.order, self.cols.id, salt_buckets=self.salt_buckets,
        )
        self._record(context)
        return context


class ChunkDocumentsStep(CorpusStep):
    """Fixed-token chunking into processed_data["corpus.chunks"]
    (narrow, shuffle-free); raw_data stays the surviving documents."""

    def __init__(self, cols: CorpusColumns, chunk_tokens: int = 64, **kw):
        super().__init__(cols, name="chunk_documents", **kw)
        self.chunk_tokens = chunk_tokens

    def validate_output(self, context: PipelineContext) -> None:
        super().validate_output(context)
        chunks = context.processed_data.get("corpus.chunks")
        if chunks is None:
            raise ValueError("chunk_documents produced no corpus.chunks table")
        self.require_columns(chunks, ["chunk_id", "chunk_text", "n_tokens"])

    def process(self, context: PipelineContext) -> PipelineContext:
        context.processed_data["corpus.chunks"] = chunk_documents(
            context.raw_data, self.cols.id, self.cols.text,
            chunk_tokens=self.chunk_tokens,
        )
        self._record(context)
        return context


def build_corpus_pipeline(
    cols: CorpusColumns | None = None,
    config: PipelineConfig | None = None,
    neardup_threshold: float = 0.5,
    # min_label vs star, re-measured r12 AFTER star got the same
    # explode-fusion treatment: on the pipeline's shallow post-gate
    # graphs the e2e difference is inside run noise (interleaved 3x
    # each at sf0.1: min_label 9.3-10.7s vs star 9.8-10.6s), so the
    # r11 default stands to avoid churn. On the RAW x23/x26 pair
    # graphs star is now the faster standalone twin (2.9 vs 4.0s warm,
    # 4.2 vs 4.7s sf1 steady) and stays the pick for
    # pathological-diameter graphs (O(log n) rounds).
    neardup_algorithm: str = "min_label",
    neardup_barrier: bool = True,
    contamination_threshold: float = 0.05,
    broadcast_benchmark: bool = True,
    quota_n: int | None = 1000,
    quota_salt_buckets: int | None = 16,
    chunk_tokens: int = 64,
    split_weights: dict[str, int] | None = None,
    max_boiler_frac: float | None = None,
    n_shards: int | None = None,
    shard_seed: int = 0,
    span_excise_n: int | None = None,
    span_min_docs: int = 2,
    span_barrier: bool = True,
    lm_ppl_band: tuple[float, float] | None = None,
    quality_keep_frac: float | None = None,
    url_blocklist=None,
    lexical_report: bool = False,
) -> Pipeline:
    """Assemble the corpus-prep workload with the canonical conditions:
    URL dedup runs iff the corpus binds a URL column, decontamination iff
    a benchmark table was stashed, quota iff a quota was set, boilerplate
    filtering iff ``max_boiler_frac`` is set, shard layout iff
    ``n_shards`` is set, span excision iff ``span_excise_n`` is set —
    the same condition mechanism the power pipeline
    uses (analytics/power_pipeline.py:236-281, src/core/pipeline.py:83-99).
    """
    cols = cols or CorpusColumns()

    def has_benchmark(ctx: PipelineContext) -> bool:
        return BENCHMARK_KEY in ctx.processed_data

    return Pipeline(
        processors=[
            GopherQualityGateStep(cols),
            BoilerplateFilterStep(
                # `or 1.0` would turn an explicit 0.0 (keep only
                # zero-boilerplate docs) into 1.0, silently disabling the
                # filter the caller asked for.
                cols,
                max_frac=1.0 if max_boiler_frac is None else max_boiler_frac,
            ),
            PerplexityFilterStep(
                cols,
                min_ppl=(lm_ppl_band or (0.0, float("inf")))[0],
                max_ppl=(lm_ppl_band or (0.0, float("inf")))[1],
            ),
            QualityTopFractionStep(
                # `or 0.5` would silently turn an explicit invalid 0.0 into
                # 0.5 while the is-not-None condition still enables the
                # step; the explicit form routes 0.0 to
                # quality_top_fraction's own (0, 1] validation at run time.
                cols,
                keep_frac=0.5 if quality_keep_frac is None else quality_keep_frac,
            ),
            UrlBlocklistStep(cols, blocked=url_blocklist or []),
            UrlDedupStep(cols),
            ExactDedupStep(cols),
            NearDupCollapseStep(
                cols, threshold=neardup_threshold,
                algorithm=neardup_algorithm, barrier=neardup_barrier,
            ),
            SpanExciseStep(
                # `or 5` would silently turn an explicit 0 into 5 while
                # the is-not-None condition still enables the step; the
                # explicit form routes 0 to SpanExciseStep's own n >= 1
                # validation, which fails loudly at build time.
                cols,
                n=5 if span_excise_n is None else span_excise_n,
                min_docs=span_min_docs,
                barrier=span_barrier,
            ),
            DecontaminationStep(
                cols,
                threshold=contamination_threshold,
                broadcast_benchmark=broadcast_benchmark,
            ),
            PiiRedactionStep(cols),
            QuotaSampleStep(cols, n=quota_n or 0, salt_buckets=quota_salt_buckets),
            DatasetSplitStep(cols, weights=split_weights),
            ShuffleShardsStep(cols, n_shards=n_shards or 0, seed=shard_seed),
            CorpusReportStep(cols),
            LexicalDiversityStep(cols),
            ChunkDocumentsStep(cols, chunk_tokens=chunk_tokens),
        ],
        conditions={
            "url_blocklist": lambda ctx: (
                url_blocklist is not None and cols.url is not None
            ),
            "url_dedup": lambda ctx: cols.url is not None,
            "lexical_diversity": lambda ctx: (
                lexical_report and cols.source in ctx.raw_data.columns
            ),
            "decontamination": has_benchmark,
            "quota_sample": lambda ctx: bool(quota_n),
            "boilerplate_filter": lambda ctx: max_boiler_frac is not None,
            "perplexity_filter": lambda ctx: lm_ppl_band is not None,
            "quality_top_fraction": lambda ctx: (
                quality_keep_frac is not None
                and cols.source in ctx.raw_data.columns
            ),
            "span_excise": lambda ctx: span_excise_n is not None,
            "shuffle_shards": lambda ctx: bool(n_shards),
            # the report needs a source column; a corpus bound without one
            # (sourceless frames ran fine before the step existed) skips
            # the report instead of failing prerequisite validation
            "corpus_report": lambda ctx: cols.source in ctx.raw_data.columns,
        },
        config=config,
        name="corpus_prep",
    )


def run_corpus_prep(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    cols: CorpusColumns | None = None,
    **kwargs,
) -> PipelineContext:
    """One-call form: documents (+ optional benchmark) in, final context
    out — survivors in ``raw_data``, chunks in
    ``processed_data["corpus.chunks"]``."""
    ctx = PipelineContext(
        pipeline_name="corpus_prep", correlation_id="run", raw_data=docs
    )
    if benchmark is not None:
        ctx.processed_data[BENCHMARK_KEY] = benchmark
    return build_corpus_pipeline(cols, **kwargs).run(ctx)
