"""Training-corpus preparation operators: fixed-token chunking, winnowing
fingerprints, and Gopher-style quality rules.

North-star extension for 100 TB training-data pipelines (no reference
counterpart — these are the ops a pretraining pipeline runs between raw
scrape and tokenizer):

- chunk_documents: split each document into fixed-token-budget chunks for
  context-window packing. Pure map-side (split + sequence + posexplode) —
  no shuffle at all; at 100 TB this runs at parquet-scan speed and the
  output inherits the input partitioning.
- winnow_fingerprints: the winnowing document-fingerprint scheme
  (Schleimer, Wilkerson, Aiken, SIGMOD 2003): take the minimum shingle
  hash in every sliding window of w consecutive shingles, keep the
  distinct selected hashes. Guarantees any shared substring of length
  >= w + k - 1 tokens produces a shared fingerprint, with expected
  density 2/(w+1) — the standard plagiarism/near-dup fingerprint at
  corpus scale. One window shuffle on doc id, then a distinct.
- gopher_quality: the published Gopher quality heuristics (Rae et al.
  2021, "Scaling Language Models", Table A1) adapted to whitespace
  tokens: token-count bounds, mean-word-length bounds, alphabetic-token
  ratio, and a minimum distinct-stopword hit count. All built-in
  expressions — map-side, codegen, oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.dedup import md5_int60
from meshinsights_data_pipeline_spark.operators.text import STOPWORDS, normalized_text


def chunk_documents(
    df: DataFrame, id_col: str, text_col: str, chunk_tokens: int = 32
) -> DataFrame:
    """Split each doc into consecutive whitespace-token chunks of at most
    ``chunk_tokens`` tokens.

    Returns [id, chunk_id, chunk_text, n_tokens]; chunk_id is 0-based.
    Entirely narrow (no shuffle): split -> sequence -> posexplode -> slice.
    """
    c = int(chunk_tokens)
    toks = df.select(
        F.col(id_col),
        F.split(F.col(text_col), " ").alias("_w"),
    ).withColumn("_nchunks", F.ceil(F.size("_w") / F.lit(float(c))).cast("bigint"))
    exploded = toks.select(
        F.col(id_col),
        F.col("_w"),
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("_nchunks") - 1)).alias(
            "chunk_id"
        ),
    )
    piece = F.slice(F.col("_w"), (F.col("chunk_id") * c + 1).cast("int"), c)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("bigint").alias("n_tokens"),
    )


def positional_shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Ordered word-n-gram shingle hashes per doc: [id, pos, h] with pos
    0-based over the shingle sequence (duplicates kept — winnowing needs
    the positional sequence, unlike the distinct set in
    dedup.shingle_hashes). Docs with fewer than n tokens contribute the
    whole normalized text as their single position-0 shingle. ``n=1``
    degenerates to per-token hashes (no lead window needed); ``n < 1``
    raises.
    """
    if n < 1:
        raise ValueError(f"shingle width n must be >= 1, got {n}")
    if n == 1:
        toks = df.select(
            F.col(id_col),
            F.posexplode(F.split(normalized_text(F.col(text_col)), " ")).alias(
                "pos", "tok"
            ),
        )
        return toks.select(
            F.col(id_col),
            F.col("pos").cast("bigint").alias("pos"),
            md5_int60(F.col("tok")).alias("h"),
        )
    # r16 optimization round (guide §2.4): one overlapping-match regex —
    # a lookahead anchored at each token start capturing the next n
    # tokens — yields the gram at every token position, and the match
    # index IS the 0-based token position (matches fire at consecutive
    # token starts 0..T-n), so posexplode over the extracted array gives
    # [pos, shingle] map-side in codegen. The previous posexplode +
    # window-lead plan shuffled the full token stream by doc id ahead of
    # every positional-gram consumer (duplicate_spans, winnowing, the
    # streaming span twin). Same rewrite (and the same in-session
    # bit-equality proof) as dedup.shingle_hashes.
    pat = r"\b(?=(" + " ".join(["[a-z0-9]+"] * n) + r"))"
    norm = df.select(
        F.col(id_col), normalized_text(F.col(text_col)).alias("_norm")
    )
    arr = norm.select(
        F.col(id_col),
        F.col("_norm"),
        F.regexp_extract_all(F.col("_norm"), F.lit(pat), 1).alias("_arr"),
    )
    return arr.select(
        F.col(id_col),
        F.posexplode(
            F.when(F.size("_arr") > 0, F.col("_arr")).otherwise(
                F.array(F.col("_norm"))
            )
        ).alias("pos", "shingle"),
    ).select(
        F.col(id_col),
        F.col("pos").cast("bigint").alias("pos"),
        md5_int60(F.col("shingle")).alias("h"),
    )


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, w: int = 4
) -> DataFrame:
    """Winnowing fingerprints: distinct min-hash per sliding window of ``w``
    consecutive word-``n``-gram hashes (Schleimer et al. 2003, §3).

    Returns [id, fp] distinct. Docs with fewer than ``w`` shingles yield
    their single global-min hash (the degenerate one-window case). One
    window shuffle on the doc id — the same partitioning every per-doc
    window op here uses, so at scale it co-schedules with sessionization-
    style stages.
    """
    sh = positional_shingle_hashes(df, id_col, text_col, n)
    win = Window.partitionBy(id_col).orderBy("pos")
    frame = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    scored = sh.select(
        F.col(id_col),
        F.col("pos"),
        F.min("h").over(frame).alias("fp"),
        F.count("*").over(Window.partitionBy(id_col)).alias("_cnt"),
    )
    # A window is complete iff w shingles start at pos; short docs keep the
    # pos-0 window (global min over everything they have).
    valid = scored.filter(
        (F.col("pos") <= F.col("_cnt") - w) | ((F.col("_cnt") < w) & (F.col("pos") == 0))
    )
    _ = win  # orderBy discipline documented; frame carries it
    return valid.select(F.col(id_col), F.col("fp")).distinct()


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicate span detection — the span-level member of
    the dedup family (ExactSubstr dedup at word-n-gram resolution; Lee et
    al. 2021, "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499: cut substrings repeated verbatim across documents,
    which full-document dedup never touches).

    A position starts a duplicated gram iff its word-``n``-gram occurs in
    >= ``min_docs`` DISTINCT documents; overlapping/adjacent hit windows
    [pos, pos+n) merge into maximal spans via a running-max interval
    merge. Returns [id, span_start, span_end, dup_grams] in token (not
    char) offsets, span_end exclusive — the spans a trainer would excise.
    Within-doc repeats alone do NOT qualify (that is repetition_signals'
    job); a duplicated short doc (< n tokens, whole text hashed) surfaces
    as span [0, n) — whole-doc semantics.

    100 TB shape: gram frequency is one map-side-combinable distinct-doc
    count keyed on the 60-bit gram hash (strings never shuffle); the join
    back is hash-partitioned on the same key; the interval merge windows
    per doc over hit rows only (doc-bounded partitions, hit-cardinality
    not token-cardinality). The positional gram frame feeds BOTH the
    frequency count and the join-back; left lazy each consumer re-runs
    the tokenize + lead-window pass (column pruning differs per branch,
    so exchange reuse does not kick in — measured 2.5s lazy vs 1.6s
    checkpointed, warm, sf0.1/local[32]). At real scale write this frame
    to storage instead (it is token-cardinality) — the shape (one gram
    pass, two readers) is what matters, same trade as
    similarity.semantic_dedup_pairs' assignment frame.
    """
    sh = positional_shingle_hashes(df, id_col, text_col, n).localCheckpoint(
        eager=False  # materializes at the first action, not at build time
    )
    dup = (
        sh.select("h", id_col)
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("_docs"))
        .filter(F.col("_docs") >= min_docs)
        .select("h")
    )
    hits = sh.join(dup, "h").select(F.col(id_col), F.col("pos"))
    return merge_hit_spans(hits, id_col, n)


def merge_hit_spans(hits: DataFrame, id_col: str, n: int) -> DataFrame:
    """Merge per-doc duplicated-gram hit positions into maximal spans:
    each hit covers [pos, pos+n); overlapping/adjacent windows coalesce
    via a running-max interval merge. Input [id, pos] (unique per doc);
    output [id, span_start, span_end, dup_grams], span_end exclusive.
    Shared by the batch operator above and the streaming ingest twin
    (streaming.dedup.streaming_span_ingest)."""
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + n).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    numbered = hits.withColumn(
        "_new",
        F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-1)), 1).otherwise(0),
    ).withColumn(
        "_span", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        numbered.groupBy(id_col, "_span")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + n).cast("bigint").alias("span_end"),
            F.count(F.lit(1)).cast("bigint").alias("dup_grams"),
        )
        .select(id_col, "span_start", "span_end", "dup_grams")
    )


def excise_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Cut duplicate spans out of the normalized text — the removal half
    of ExactSubstr dedup (:func:`duplicate_spans` detects, this excises).
    ``spans`` is the [id, span_start, span_end, ...] frame the detector
    returns (token offsets over the NORMALIZED text, end exclusive).
    Returns [id, clean_text, n_removed]; docs with no spans pass through
    with n_removed = 0.

    Shape: spans collapse to one array-of-intervals row per doc (span
    cardinality is tiny per doc), one equi-join back to the docs, then a
    pure map-side HOF filter — token i survives iff no interval covers
    it. No per-row Python, no second shuffle."""
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = F.split(normalized_text(F.col(text_col)), " ")
    no_spans = F.lit([]).cast("array<struct<span_start:bigint,span_end:bigint>>")
    joined = df.join(per_doc, id_col, "left").select(
        F.col(id_col),
        toks.alias("_toks"),
        F.coalesce(F.col("_spans"), no_spans).alias("_spans"),
    )
    kept = F.filter(
        F.col("_toks"),
        lambda tok, i: ~F.exists(
            F.col("_spans"),
            lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
        ),
    )
    return joined.select(
        F.col(id_col),
        F.concat_ws(" ", kept).alias("clean_text"),
        (F.size("_toks") - F.size(kept)).cast("bigint").alias("n_removed"),
    )


def corpus_report(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    approx: bool = False,
) -> DataFrame:
    """Per-source dataset report card — the summary table a training-data
    card publishes: [source, n_docs, total_tokens, avg_tokens,
    mean_quality, n_distinct, dup_frac]. ONE aggregation pass over the
    corpus: token counts, the composite quality score and the exact-dedup
    fingerprint are all map-side expressions feeding a single
    groupBy(source).

    Cross-engine numeric discipline (same as the declared q-set): counts
    and token totals are integer-exact; mean_quality sums the per-doc
    ROUNDED quality in exact DECIMAL (a float sum is
    partition-order-dependent) and divides once in double; ratios are one
    IEEE division of exact integers.

    ``approx=True`` swaps the distinct-fingerprint count for HLL++
    (approx_count_distinct, default rsd 0.05 = 5% relative error) — the
    100 TB tier, same
    exact-beside-approx pattern as operators.stats: the exact
    count-distinct shuffles every fingerprint to its source's reducers,
    the sketch merges map-side. Only x50's oracle pins the exact tier.
    """
    from meshinsights_data_pipeline_spark.operators.text import (
        fingerprint,
        token_count,
        with_quality_score,
    )

    per_doc = with_quality_score(df, text_col, out_col="_wq").select(
        F.col(source_col).alias("source"),
        token_count(text_col).cast("bigint").alias("_tok"),
        F.col("_wq").cast("decimal(18,6)").alias("_q"),  # already round-6
        fingerprint(F.col(text_col)).alias("_fp"),
    )
    n = F.count(F.lit(1)).cast("bigint")
    distinct_fp = (
        F.approx_count_distinct("_fp") if approx else F.countDistinct("_fp")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            n.alias("n_docs"),
            F.sum("_tok").cast("bigint").alias("total_tokens"),
            F.sum("_q").alias("_sq"),
            distinct_fp.cast("bigint").alias("n_distinct"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            (F.col("total_tokens").cast("double") / F.col("n_docs")).alias(
                "avg_tokens"
            ),
            F.round(F.col("_sq").cast("double") / F.col("n_docs"), 6).alias(
                "mean_quality"
            ),
            # least-n_docs clamp: an HLL overestimate must not publish the
            # impossible n_distinct > n_docs (and dup_frac derives from the
            # clamped value, so the row stays self-consistent)
            F.least(F.col("n_docs"), F.col("n_distinct")).alias("n_distinct"),
            (
                (
                    F.col("n_docs")
                    - F.least(F.col("n_docs"), F.col("n_distinct"))
                ).cast("double")
                / F.col("n_docs")
            ).alias("dup_frac"),
        )
    )


def line_repetition_signals(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Line-level Gopher quality signals per document (Rae et al. 2021
    Table A1's line rules — the within-doc complement of
    :func:`repetition_signals`' n-gram rules and :func:`line_dedup`'s
    cross-doc pass):

    - dup_line_frac: fraction of the doc's (trimmed, non-empty) lines
      that are repeats of an earlier line, ``(n_lines - distinct) /
      n_lines``
    - dup_char_frac: fraction of line characters sitting in repeated
      occurrences, ``(total_chars - distinct_chars) / total_chars``
    - bullet_frac: fraction of lines starting with a bullet marker
      (``- ``, ``* ``, ``• ``)
    - ellipsis_frac: fraction of lines ending with ``...`` or ``…``

    Boilerplate-heavy or template-generated pages score high on the dup
    fractions; listicles/navigation chrome on bullet_frac; truncated
    scrapes on ellipsis_frac. Returns ``[id, n_lines, distinct_lines,
    dup_line_frac, dup_char_frac, bullet_frac, ellipsis_frac]``
    (fractions NULL for docs with no non-empty lines). Every count is an
    integer and each fraction one IEEE division rounded to 6dp, so
    values are bit-identical across engines.

    Scale shape: pure map-side array expressions over each row's own
    text — one corpus scan inside whole-stage codegen, ZERO shuffle (the
    per-line frequency map never leaves the row; at 100 TB this is scan
    bandwidth, nothing else).
    """
    # Split tolerates CRLF (the dominant line ending in scraped web text —
    # exactly this operator's target corpus) and trims tabs/CR as well as
    # spaces; plain F.trim strips only ASCII space, which would leave a
    # phantom "\r" line per CRLF break and defeat endswith("...").
    lines = F.filter(
        F.transform(
            F.split(F.col(text_col), "\r?\n"),
            lambda x: F.btrim(x, F.lit(" \t\r")),
        ),
        lambda x: x != "",
    )
    n_lines = F.size(lines)
    distinct = F.size(F.array_distinct(lines))
    chars = F.aggregate(
        lines, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    )
    distinct_chars = F.aggregate(
        F.array_distinct(lines),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + F.length(x),
    )
    bullets = F.size(
        F.filter(
            lines,
            lambda x: x.startswith("- ")
            | x.startswith("* ")
            | x.startswith("• "),
        )
    )
    ellipses = F.size(
        F.filter(lines, lambda x: x.endswith("...") | x.endswith("…"))
    )
    return df.select(
        F.col(id_col),
        n_lines.cast("bigint").alias("n_lines"),
        distinct.cast("bigint").alias("distinct_lines"),
        F.when(
            n_lines > 0, F.round((n_lines - distinct) / n_lines, 6)
        ).alias("dup_line_frac"),
        F.when(
            chars > 0, F.round((chars - distinct_chars) / chars, 6)
        ).alias("dup_char_frac"),
        F.when(n_lines > 0, F.round(bullets / n_lines, 6)).alias("bullet_frac"),
        F.when(n_lines > 0, F.round(ellipses / n_lines, 6)).alias(
            "ellipsis_frac"
        ),
    )


def repetition_signals(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Within-document repetition quality signals (the Gopher repetition
    rules, Rae et al. 2021 Table A1, adapted to word n-grams):

    - dup_fraction: fraction of the doc's n-gram OCCURRENCES that are
      repeats of an earlier n-gram, ``(total - distinct) / total``
    - top_fraction: share of occurrences claimed by the single most
      frequent n-gram, ``max_count / total``

    Machine-generated/boilerplate text scores high on both; docs with
    fewer than ``n`` tokens degenerate to one whole-text gram (both
    fractions 0). All counts are integers and each fraction is one IEEE
    division, so values are bit-identical across engines. Shuffle shape:
    the same (doc, gram) partitioning every dedup operator uses — one
    map-side-combinable count, then a per-doc reduce.
    """
    sh = positional_shingle_hashes(df, id_col, text_col, n)
    per_gram = sh.groupBy(F.col(id_col), F.col("h")).agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = per_gram.groupBy(F.col(id_col)).agg(
        F.sum("c").cast("bigint").alias("total_ngrams"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_ngrams"),
        F.max("c").cast("bigint").alias("top_count"),
    )
    return agg.select(
        F.col(id_col),
        "total_ngrams",
        "distinct_ngrams",
        "top_count",
        F.round(
            (F.col("total_ngrams") - F.col("distinct_ngrams")) / F.col("total_ngrams"), 6
        ).alias("dup_fraction"),
        F.round(F.col("top_count") / F.col("total_ngrams"), 6).alias("top_fraction"),
    )


def boilerplate_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, min_docs: int = 3
) -> DataFrame:
    """CROSS-document boilerplate detection (the complement of
    :func:`repetition_signals`, which is within-doc): a word n-gram that
    appears in >= ``min_docs`` DISTINCT documents is boilerplate (headers,
    footers, navigation chrome, license blurbs — the text C4/RefinedWeb
    strip by line-frequency); each doc is scored by the fraction of its
    distinct n-grams that are boilerplate.

    Returns [id, n_grams, n_boiler, boiler_frac] (one row per doc;
    boiler_frac = n_boiler / n_grams, one IEEE division — bit-identical
    across engines).

    Shuffle shape at 100 TB (r17, guide §2.4): ONE shuffle of the
    distinct per-doc gram set on the 60-bit gram hash; the document
    frequency is a window-count over that partition key, so the gram
    pipeline runs once and there is no join. (The previous
    aggregate-then-join-back form re-ran the whole corpus tokenize +
    distinct for the join side — zero ReusedExchange across the fork,
    the regexp stage visible twice in the executed plan; interleaved
    warm A/B: sf0.1 1.36-1.49 -> 0.95-1.02 s, sf1 2.32-2.60 ->
    1.63-2.06 s.) A pathologically hot gram's rows are buffered by the
    (spilling) window operator instead of streamed by a join — the
    same rows either shape colocates on one task — and the saved
    corpus scan dwarfs that at any df. No collect, no broadcast of
    anything corpus-sized.
    """
    from meshinsights_data_pipeline_spark.operators.dedup import shingle_hashes

    per_doc = shingle_hashes(df, id_col, text_col, n)  # distinct [id, h]
    scored = per_doc.withColumn(
        "_df_docs", F.count(F.lit(1)).over(Window.partitionBy("h"))
    )
    return (
        scored
        .groupBy(F.col(id_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(
                F.when(F.col("_df_docs") >= min_docs, 1).otherwise(0)
            ).cast("bigint").alias("n_boiler"),
        )
        .select(
            F.col(id_col),
            "n_grams",
            "n_boiler",
            F.round(F.col("n_boiler") / F.col("n_grams"), 6).alias("boiler_frac"),
        )
    )


def gopher_quality(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-rule quality signals per doc (Rae et al. 2021, Table A1,
    adapted to whitespace tokens):

    - ok_tokens:   20 <= token count <= 100000
    - ok_wordlen:  2 <= mean word length <= 10
    - ok_alpha:    >= 80% of tokens contain an alphabetic character
    - ok_stop:     >= 2 distinct common stopwords present
    - keep = all of the above

    Returns [id, n_tok, mean_wlen, alpha_ratio, stop_hits, keep]. Pure
    map-side expressions: at 100 TB this is a single parquet scan with the
    predicate evaluated inside whole-stage codegen.

    Two fusions keep this the cheapest full-text pass in the corpus
    pipeline (it was the most expensive sf1 step before them, 13.2s —
    VERDICT r9 item 3; both are bit-identical on the whole sf1 corpus):

    - ``total_chars`` is pure arithmetic, not a fold: the normalized text
      is trimmed and single-space-joined, so the token lengths sum to
      ``length(norm) - (n_tok - 1)`` exactly (same bigint, same IEEE
      division for mean_wlen) — the higher-order ``F.aggregate`` walk of
      the token array is gone.
    - the alpha test is ``translate`` (a char-table lookup), not a
      per-token java.util.regex match: a token of the [a-z0-9] alphabet
      contains a letter iff deleting a-z shortens it.

    Measured 7.4s -> 5.0s warm for the signal pass on 10x sf0.1
    (500k docs, local[32]).
    """
    # Staged form of _gopher_signal_exprs (r16 optimization round): in the
    # single-projection form the normalized text (a full-text regex) and
    # its split are embedded in every signal that references them — norm
    # ~3x and the split ~5x per row, with no codegen CSE across the
    # references (the lang_id lesson). Staging norm / toks / n_tok as
    # their own multiply-referenced projections computes each once;
    # expressions and operand order are unchanged, so the signals are
    # bit-identical (x22's oracle proves it).
    s2 = df.select(
        F.col(id_col), normalized_text(F.col(text_col)).alias("_gq_norm")
    ).select(
        F.col(id_col),
        "_gq_norm",
        F.split(F.col("_gq_norm"), " ").alias("_gq_toks"),
    )
    s3 = s2.select(
        F.col(id_col),
        "_gq_norm",
        "_gq_toks",
        F.size("_gq_toks").alias("_gq_ntok"),
    )
    ntok = F.col("_gq_ntok")
    total_chars = (F.length("_gq_norm") - (ntok - F.lit(1))).cast("bigint")
    mean_wlen = F.round(total_chars / ntok, 6)
    alpha = F.size(
        F.filter(
            F.col("_gq_toks"),
            lambda t: F.length(
                F.translate(t, "abcdefghijklmnopqrstuvwxyz", "")
            )
            < F.length(t),
        )
    )
    alpha_ratio = F.round(alpha / ntok, 6)
    stop_hits = F.size(
        F.array_intersect(
            F.col("_gq_toks"), F.array(*[F.lit(s) for s in STOPWORDS])
        )
    )
    out = s3.select(
        F.col(id_col),
        ntok.cast("bigint").alias("n_tok"),
        mean_wlen.alias("mean_wlen"),
        alpha_ratio.alias("alpha_ratio"),
        stop_hits.cast("bigint").alias("stop_hits"),
    )
    keep = (
        F.col("n_tok").between(20, 100000)
        & F.col("mean_wlen").between(2.0, 10.0)
        & (F.col("alpha_ratio") >= 0.8)
        & (F.col("stop_hits") >= 2)
    )
    return out.withColumn("keep", keep)


def _gopher_signal_exprs(text_col: str):
    """The four Gopher signal expressions (rounding included), shared by
    :func:`gopher_quality` (signal frame) and :func:`gopher_keep`
    (inline filter) so the two are bit-identical by construction."""
    norm = normalized_text(F.col(text_col))
    toks = F.split(norm, " ")
    n_tok = F.size(toks)
    total_chars = (F.length(norm) - (n_tok - F.lit(1))).cast("bigint")
    mean_wlen = F.round(total_chars / n_tok, 6)
    alpha = F.size(
        F.filter(
            toks,
            lambda t: F.length(F.translate(t, "abcdefghijklmnopqrstuvwxyz", ""))
            < F.length(t),
        )
    )
    alpha_ratio = F.round(alpha / n_tok, 6)
    # array_intersect already returns DISTINCT matches, so no
    # array_distinct pre-pass (one array materialization saved per doc).
    stop_hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(s) for s in STOPWORDS]))
    )
    return (
        n_tok.cast("bigint"),
        mean_wlen,
        alpha_ratio,
        stop_hits.cast("bigint"),
    )


def gopher_keep(text_col: str):
    """The Gopher keep predicate as a single inline boolean Column — the
    filter form of :func:`gopher_quality`'s ``keep``. A gate that only
    needs the verdict should ``df.filter(gopher_keep(text_col))``: the
    predicate is a pure map-side expression of the row's own text, so the
    gate costs one corpus scan inside whole-stage codegen — no signal
    frame, no semi-join, no shuffle (at 100 TB the join form shuffles the
    full doc-id set twice for a verdict each row already knows).

    Prefer :func:`gopher_keep_df` when filtering a DataFrame directly:
    the inline expression re-evaluates the normalize/split per signal
    reference; the frame form stages them once (r16)."""
    n_tok, mean_wlen, alpha_ratio, stop_hits = _gopher_signal_exprs(text_col)
    return (
        n_tok.between(20, 100000)
        & mean_wlen.between(2.0, 10.0)
        & (alpha_ratio >= 0.8)
        & (stop_hits >= 2)
    )


def gopher_keep_df(df: DataFrame, text_col: str) -> DataFrame:
    """``df`` filtered by the Gopher keep rule with the shared
    normalize/split/count sub-expressions staged ONCE per row (r16
    optimization round) — same predicate, same columns out, ~5x less
    per-row string work than the inline ``filter(gopher_keep(...))``
    form (which re-embeds the full-text regex in every signal
    reference; no codegen CSE across them — the lang_id lesson).
    Still one map-side corpus scan: the staged projections and the
    filter fuse into a single whole-stage-codegen stage."""
    base_cols = list(df.columns)
    tmp = {}
    for piece in ("norm", "toks", "ntok"):
        name = f"_gk_{piece}"
        while name in base_cols:
            name += "_"
        tmp[piece] = name
    staged = df.select(
        "*", normalized_text(F.col(text_col)).alias(tmp["norm"])
    ).select(
        "*", F.split(F.col(tmp["norm"]), " ").alias(tmp["toks"])
    ).select("*", F.size(tmp["toks"]).alias(tmp["ntok"]))
    ntok = F.col(tmp["ntok"])
    total_chars = (
        F.length(tmp["norm"]) - (ntok - F.lit(1))
    ).cast("bigint")
    mean_wlen = F.round(total_chars / ntok, 6)
    alpha = F.size(
        F.filter(
            F.col(tmp["toks"]),
            lambda t: F.length(
                F.translate(t, "abcdefghijklmnopqrstuvwxyz", "")
            )
            < F.length(t),
        )
    )
    alpha_ratio = F.round(alpha / ntok, 6)
    stop_hits = F.size(
        F.array_intersect(
            F.col(tmp["toks"]), F.array(*[F.lit(s) for s in STOPWORDS])
        )
    )
    keep = (
        ntok.cast("bigint").between(20, 100000)
        & mean_wlen.between(2.0, 10.0)
        & (alpha_ratio >= 0.8)
        & (stop_hits.cast("bigint") >= 2)
    )
    return staged.filter(keep).select(*base_cols)


def quota_sample(
    df: DataFrame,
    key_col: str,
    n: int,
    order_col: str,
    id_col: str,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Keep at most ``n`` rows per ``key_col``, ranked by ``order_col``
    DESC with ``id_col`` ASC as the deterministic tiebreak (per-domain /
    per-source quota sampling — the standard corpus-balance step between
    quality filtering and training).

    Scale design: a plain ``row_number`` window shuffles every row of a
    key into ONE task — for a corpus where a single domain holds billions
    of rows, that task is the job. Top-n is decomposable, so with
    ``salt_buckets = s`` the operator runs two phases: a local top-n per
    (key, salt) — salt from a hash of ``id_col``, spreading each hot key
    over ``s`` tasks — then the true top-n over the at most ``n * s``
    per-key survivors. The result is bit-identical to the unsalted window
    (both phases use the same total order), which is exactly what the x24
    oracle checks.
    """

    def _topn(frame: DataFrame, parts: list[str]) -> DataFrame:
        w = Window.partitionBy(*parts).orderBy(
            F.col(order_col).desc(), F.col(id_col).asc()
        )
        return (
            frame.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= n)
            .drop("_rk")
        )

    if salt_buckets and salt_buckets > 1:
        salted = df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
        )
        local = _topn(salted, [key_col, "_salt"]).drop("_salt")
        return _topn(local, [key_col])
    return _topn(df, [key_col])


def quality_top_fraction(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str = "source",
    keep_frac: float = 0.5,
) -> DataFrame:
    """Docs in the top ``keep_frac`` quality band of their source:
    [id, source, q] for rows whose composite quality score is >= their
    source's exact (1 - keep_frac) quantile — "keep the best half of
    every source", the per-domain quality gate a pretraining mixture
    applies before token budgeting.

    Scale shape: the threshold is ONE aggregate per source (exact
    interpolated percentile — quantile_cont semantics, the repo-wide
    definition) joined back as a broadcast-sized dim, then a map-side
    filter — never a full percent_rank window sort of the corpus
    (ordering the whole corpus per source is the 100 TB anti-shape; the
    aggregate ships one threshold row per source). Ties at the threshold
    are KEPT (>=), so the fraction retained can exceed keep_frac on
    plateaued scores — a filter must be deterministic, not exact-sized;
    use quota_sample for an exact-count cut.
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    from meshinsights_data_pipeline_spark.operators.text import (
        with_quality_score,
    )

    scored = with_quality_score(df, text_col, out_col="_wq").select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        F.col("_wq").alias("q"),
    )
    thresholds = scored.groupBy("source").agg(
        F.percentile(F.col("q"), F.lit(1.0 - keep_frac)).alias("_thr")
    )
    return (
        scored.join(F.broadcast(thresholds), "source")
        .filter(F.col("q") >= F.col("_thr"))
        .select(F.col(id_col), "source", "q")
    )


def gram_novelty(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Per-doc n-gram novelty: the fraction of a document's DISTINCT
    word-n-grams that appear in NO other document —
    ``[id, n_grams, novel_frac]``. The corpus-uniqueness selection
    signal (the unique-trigram-fraction recipe): high novelty marks
    original content worth keeping; near-zero novelty marks templated
    or boilerplate-dominated docs that exact/near dedup keeps only one
    copy of but whose survivors may still be low-value.

    Exact integer ratio (distinct grams with corpus df == 1 over
    distinct grams), rounded 6dp — bit-identical across engines. Scale
    shape (r17, guide §2.4 — the boilerplate_ngrams rewrite): ONE
    shingle pass, the gram document frequency attached as a
    window-count over the gram-hash partition key (the aggregate-then-
    join-back form re-ran the whole shingle pipeline for the join
    side), one per-doc aggregate. Nothing corpus^2.
    """
    from meshinsights_data_pipeline_spark.operators.dedup import (
        shingle_hashes,
    )

    sh = shingle_hashes(df, id_col, text_col, n).select(id_col, "h")
    return (
        sh.withColumn(
            "_df", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.round(
                F.sum(F.when(F.col("_df") == 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("novel_frac"),
        )
    )


def chat_render(
    df: DataFrame,
    convo_col: str,
    order_by: list[str],
    role_col: str = "role",
    content_col: str = "content",
    turn_open: str = "<|im_start|>",
    turn_close: str = "<|im_end|>",
) -> DataFrame:
    """Flatten per-turn conversation rows into one rendered training
    string per conversation (the SFT-data chat-templating step; default
    markers are the ChatML convention):

        <|im_start|>role\\ncontent<|im_end|>\\n...

    Returns ``[convo, n_turns, n_user_turns, rendered]``. Turn order is
    the total order ``order_by`` (must reach a unique key within a
    conversation — pass a tiebreaker — or the rendered string is
    partition-placement-dependent); the sort happens per-conversation
    via sort_array over the collected turn structs, all JVM built-ins.

    Scale shape: one conversation's turns must assemble on one executor
    — inherent to rendering, and bounded in practice by the training
    context length, not the corpus. One groupBy(convo) shuffle; no
    window, no Python. A conversation that would blow past executor
    memory should be chunked upstream (chunk_documents) first.
    """
    order_struct = F.struct(
        *[F.col(c) for c in order_by], F.col(role_col), F.col(content_col)
    )
    turns = df.select(F.col(convo_col), order_struct.alias("_t"))
    # Coalesce role/content to '': a NULL in either would make the
    # per-turn concat NULL, which array_join silently DROPS from the
    # rendered string while n_turns/n_user_turns still count the turn —
    # the render and the counts must agree on what a turn is.
    rendered = F.array_join(
        F.transform(
            F.sort_array(F.collect_list("_t")),
            lambda t: F.concat(
                F.lit(turn_open),
                F.coalesce(t[role_col], F.lit("")),
                F.lit("\n"),
                F.coalesce(t[content_col], F.lit("")),
                F.lit(turn_close),
            ),
        ),
        "\n",
    )
    return turns.groupBy(convo_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.sum(F.when(F.col(f"_t.{role_col}") == "user", 1).otherwise(0))
        .cast("bigint")
        .alias("n_user_turns"),
        rendered.alias("rendered"),
    )


def url_host_blocklist(
    df: DataFrame,
    id_col: str,
    url_col: str,
    blocked: list[str] | DataFrame,
) -> DataFrame:
    """Flag documents whose URL host matches a domain blocklist with
    SUFFIX semantics (the C4/RefinedWeb UT1-style URL filter): an entry
    ``bad.com`` blocks ``bad.com`` itself and every subdomain
    (``www.bad.com``, ``a.b.bad.com``) — exact host membership alone
    misses the subdomain case, which is why this is not a plain
    membership filter. Returns blocked rows ``[id, host, blocked_by]``
    (blocked_by = the lexically smallest matching entry, so a host
    matched by several list entries yields ONE deterministic row);
    anti-join the ids to keep the survivors.

    ``blocked`` is a plain list or a one-column DataFrame — the frame
    form is the 100 TB path: real blocklists (UT1) run to millions of
    domains, far past literal-predicate territory. Scale shape: host
    parse + suffix expansion are map-side (a host explodes into its
    #labels suffixes, ~4-6 rows); the blocklist joins BROADCAST on the
    suffix string; one hash aggregate dedupes multi-entry matches.
    Nothing corpus^2, no driver-side list handling.
    """
    spark = df.sparkSession
    if isinstance(blocked, DataFrame):
        # Same matching contract as the list form: hosts are lowercased,
        # so frame entries must be too (a mixed-case or padded UT1 row
        # would otherwise silently never match); distinct, because the
        # aggregate below assumes one row per entry.
        bl = blocked.select(
            F.lower(F.trim(F.col(blocked.columns[0]))).alias("_bad")
        ).distinct()
    else:
        bl = spark.createDataFrame(
            [(d,) for d in sorted({b.strip().lower() for b in blocked})],
            "_bad string",
        )
    host = F.lower(F.regexp_extract(F.col(url_col), r"^[A-Za-z]+://([^/:?#]*)", 1))
    parts = F.split(F.col("host"), r"\.")
    suffixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(F.slice(parts, i, F.size(parts) - i + 1), "."),
    )
    exploded = (
        df.select(F.col(id_col), host.alias("host"))
        .select(F.col(id_col), F.col("host"), F.explode(suffixes).alias("_sfx"))
    )
    return (
        exploded.join(F.broadcast(bl), F.col("_sfx") == F.col("_bad"))
        .groupBy(id_col, "host")
        .agg(F.min("_bad").alias("blocked_by"))
    )


def lexical_diversity(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    top_k: int = 200,
) -> DataFrame:
    """Per-source lexical-diversity report — the corpus-health metrics a
    data card publishes next to :func:`corpus_report`'s volume columns:
    ``[source, n_tokens, vocab, ttr, top_share, zipf_slope]``. A healthy
    natural-language source follows Zipf (slope near -1); generated or
    boilerplate-heavy text shows a flat head (slope toward 0) or a
    collapsed vocabulary (low type-token ratio, high top-term share).

    zipf_slope is the least-squares slope of ln(freq) on ln(rank) over
    the ``top_k`` most frequent terms (rank ties broken term-ascending,
    so the ranking — and with it the regression inputs — is
    deterministic). Cross-engine discipline: ln follows the x70
    precedent (deterministic per-term doubles); the four regression
    sums fold through DECIMAL(38,18) (aggregation-order-independent),
    and the closed-form slope is evaluated in one fixed association
    mirrored in the SQL oracle; ttr / top_share are single IEEE
    divisions of exact integers. Everything rounds to 6dp.

    Scale shape: one tokenize pass -> one (source, term) count aggregate
    (map-side combinable); ranking runs on the vocab-sized count frame
    via the hot-group-safe grouped ranking (a giant source's vocabulary
    spans partitions); the regression is a |sources|-row aggregate.
    """
    from meshinsights_data_pipeline_spark.operators.global_rank import (
        grouped_row_number,
    )

    dec = "decimal(38,18)"
    toks = df.select(
        F.col(source_col),
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("term"),
    ).filter(F.col("term") != "")
    counts = toks.groupBy(source_col, "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    vol = counts.groupBy(source_col).agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.max("c").cast("bigint").alias("top_c"),
    )
    ranked = grouped_row_number(
        counts,
        [source_col],
        [F.col("c").desc(), F.col("term").asc()],
        out_col="r",
    ).filter(F.col("r") <= top_k)
    lnr, lnc = F.log(F.col("r").cast("double")), F.log(F.col("c").cast("double"))
    reg = ranked.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(lnr.cast(dec)).cast("double").alias("sx"),
        F.sum(lnc.cast(dec)).cast("double").alias("sy"),
        F.sum((lnr * lnr).cast(dec)).cast("double").alias("sxx"),
        F.sum((lnr * lnc).cast(dec)).cast("double").alias("sxy"),
    )
    return (
        vol.join(reg, source_col)
        .select(
            F.col(source_col),
            "n_tokens",
            "vocab",
            F.round(F.col("vocab") / F.col("n_tokens"), 6).alias("ttr"),
            F.round(F.col("top_c") / F.col("n_tokens"), 6).alias("top_share"),
            # k = 1 (single-term vocabulary) degenerates the denominator
            # to 0.0 (sx = ln(1) = 0): Spark emits NaN while DuckDB's 0/0
            # depends on its ieee_floating_point_ops setting — emit NULL
            # deterministically instead (a one-point regression has no
            # slope). Mirrored by the CASE in X74_SQL.
            F.when(
                F.col("k") >= 2,
                F.round(
                    (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
                    / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")),
                    6,
                ),
            ).alias("zipf_slope"),
        )
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    total: int,
    seed: str = "s7",
) -> DataFrame:
    """EXACT-size stratified sample: ``total`` rows whose per-stratum
    counts follow largest-remainder (Hamilton) apportionment — the
    exact-count complement to :func:`mixture_sample`'s Bernoulli
    thinning (which hits proportions only in expectation). The quota
    arithmetic is all BIGINT (``div``/``%``), so quotas — and therefore
    the selected set — are bit-identical across engines, runs, and
    layouts; within a stratum rows are taken in a deterministic hash
    order (md5-60bit of ``seed:id``), a pure function of the id.

    Returns [stratum, id, pick] (pick = 1-based within-stratum rank of
    the kept row). Requires ``total <= |df|``; quotas sum to exactly
    ``total``, each within +1 of the exact proportional share.

    Scale shape: one |strata|-row count aggregate; the two allocation
    windows run on that |strata|-row frame (strata are FEW by premise —
    sources/languages — so the unpartitioned window is bounded); the
    within-stratum ranking is the hot-group-safe
    ``global_rank.grouped_row_number`` (a hot stratum spans partitions,
    never one task); quotas broadcast back. One corpus shuffle total.
    """
    from meshinsights_data_pipeline_spark.operators.global_rank import (
        grouped_row_number,
    )

    t = int(total)
    counts = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h")
    )
    tot = counts.agg(F.sum("n_h").cast("bigint").alias("n"))
    # The quota product routes through DECIMAL(38,0): at the target scale
    # both ``total`` and a stratum count can be billions, and a BIGINT
    # t * n_h silently wraps past 2^63 in non-ANSI mode, corrupting the
    # apportionment. The quotient (<= t) and remainder (< n) both fit
    # BIGINT, so only the product needs the wide type; values are exact
    # integers either way, preserving cross-engine quota parity.
    alloc = counts.crossJoin(F.broadcast(tot)).select(
        F.col(stratum_col),
        F.expr(
            f"CAST((CAST({t} AS DECIMAL(38,0)) * n_h) div n AS BIGINT)"
        ).alias("base"),
        F.expr(
            f"CAST((CAST({t} AS DECIMAL(38,0)) * n_h) % n AS BIGINT)"
        ).alias("rem"),
    )
    w_rank = Window.orderBy(F.col("rem").desc(), F.col(stratum_col).asc())
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    quota = alloc.select(
        F.col(stratum_col),
        (
            F.col("base")
            + F.when(
                F.row_number().over(w_rank)
                <= F.lit(t) - F.sum("base").over(w_all),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("quota"),
    )
    h = md5_int60(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    ranked = grouped_row_number(
        df.select(F.col(stratum_col), F.col(id_col)).withColumn("_h", h),
        [stratum_col],
        [F.col("_h"), F.col(id_col)],
        out_col="pick",
    )
    return (
        ranked.join(F.broadcast(quota), stratum_col)
        .filter(F.col("pick") <= F.col("quota"))
        .select(
            F.col(stratum_col),
            F.col(id_col),
            F.col("pick").cast("bigint").alias("pick"),
        )
    )


def temperature_mixture_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    total: int,
    alpha: float = 0.5,
    seed: str = "s7",
) -> DataFrame:
    """Temperature-reweighted mixture sampling — the corpus-mixing step
    of multi-source pretraining recipes: per-stratum quotas follow
    ``w_h = n_h^alpha`` instead of raw proportions, upsampling small
    sources relative to :func:`stratified_sample` (``alpha=1`` recovers
    it; ``alpha=0`` is uniform-over-strata). Quotas use the same
    largest-remainder (Hamilton) apportionment as x73, but over
    temperature weights.

    Cross-engine exactness: the weight is quantized FIRST —
    ``W_h = floor(n_h^alpha * 1e6 + 0.5)`` (for the default
    ``alpha=0.5``, ``n_h^alpha`` is ``sqrt``, correctly rounded IEEE in
    both engines; the multiply and floor are one exact op each) — so the
    entire apportionment runs in BIGINT div/mod with the DECIMAL(38,0)
    product guard, bit-identical across engines. Non-sqrt alphas are
    supported operationally but ``pow`` is not IEEE-correctly-rounded,
    so only ``alpha in (0.5, 1.0)`` carries the oracle-exactness
    guarantee.

    Quotas are capped at the stratum size (sampling without
    replacement): when a small stratum saturates, the result undershoots
    ``total`` rather than silently repeating rows — callers that need
    epochs/replacement should chunk upstream. Returns [stratum, id,
    pick], pick = 1-based within-stratum rank in the deterministic
    md5-hash order (same order contract as stratified_sample).

    Scale shape: identical to x73 — one corpus count aggregate, the
    allocation windows on the |strata|-row frame, hot-stratum-safe
    grouped ranking, quotas broadcast. One corpus shuffle total.
    """
    from meshinsights_data_pipeline_spark.operators.global_rank import (
        grouped_row_number,
    )

    t = int(total)
    counts = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h")
    )
    if alpha == 1.0:
        # Hamilton quotas are scale-invariant in the weights, so alpha=1
        # uses n_h itself — pure BIGINT, exactly stratified_sample's
        # apportionment at ANY stratum size. (The float quantization
        # below would lose exactness past n_h ~ 2^53/1e6 ≈ 9e9 rows.)
        w_col = F.col("n_h")
    else:
        w_raw = (
            F.sqrt(F.col("n_h")) if alpha == 0.5
            else F.pow(F.col("n_h").cast("double"), F.lit(float(alpha)))
        )
        w_col = F.floor(w_raw * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")
    weighted = counts.select(F.col(stratum_col), "n_h", w_col.alias("w"))
    tot = weighted.agg(F.sum("w").cast("bigint").alias("tw"))
    alloc = weighted.crossJoin(F.broadcast(tot)).select(
        F.col(stratum_col),
        "n_h",
        F.expr(
            f"CAST((CAST({t} AS DECIMAL(38,0)) * w) div tw AS BIGINT)"
        ).alias("base"),
        F.expr(
            f"CAST((CAST({t} AS DECIMAL(38,0)) * w) % tw AS BIGINT)"
        ).alias("rem"),
    )
    w_rank = Window.orderBy(F.col("rem").desc(), F.col(stratum_col).asc())
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    quota = alloc.select(
        F.col(stratum_col),
        F.least(
            F.col("base")
            + F.when(
                F.row_number().over(w_rank)
                <= F.lit(t) - F.sum("base").over(w_all),
                F.lit(1),
            ).otherwise(F.lit(0)),
            F.col("n_h"),
        ).alias("quota"),
    )
    h = md5_int60(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    ranked = grouped_row_number(
        df.select(F.col(stratum_col), F.col(id_col)).withColumn("_h", h),
        [stratum_col],
        [F.col("_h"), F.col(id_col)],
        out_col="pick",
    )
    return (
        ranked.join(F.broadcast(quota), stratum_col)
        .filter(F.col("pick") <= F.col("quota"))
        .select(
            F.col(stratum_col),
            F.col(id_col),
            F.col("pick").cast("bigint").alias("pick"),
        )
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    salt: str = "aes",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, "Weighted random sampling with a reservoir"): each row
    draws u in (0, 1] from a hash of its id (+ salt for independent
    draws) and ranks by u^(1/w); the top ``n`` keys are the sample, with
    inclusion probability proportional to weight. Computed as
    ln(u)/w — the same ordering (ln is monotone on (0,1]) without pow's
    larger cross-engine libm variance. Rows with weight <= 0 are
    excluded (zero weight = never sampled; A-ES is undefined there).

    Scale shape: the key is one map-side expression; the global top-n
    lowers to Spark's TakeOrderedAndProject (per-partition top-n, then a
    single merge of n*partitions candidates) — no full sort, no window.
    Deterministic: same corpus + salt => same sample, across engines
    (the 60-bit md5 hash contract).

    Returns [id, weight, key] ordered by key desc, id asc.
    """
    if n <= 0:
        raise ValueError(f"sample size n must be positive, got {n}")
    u = (md5_int60(F.concat(F.col(id_col).cast("string"), F.lit(salt))) + 1) / F.lit(
        float(1 << 60)
    )
    key = F.log(u) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .select(
            F.col(id_col),
            F.col(weight_col).alias("weight"),
            F.round(key, 9).alias("key"),
        )
        .orderBy(F.desc("key"), F.col(id_col))
        .limit(n)
    )


def contamination_check(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.05,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark-contamination score per candidate doc: the fraction of its
    distinct word-``n``-gram shingles that appear anywhere in ``benchmark``
    (the standard train/test decontamination check a pretraining pipeline
    runs before export).

    Returns [id, n_shingles, hits, contamination, contaminated]. Scale
    design: the benchmark shingle set is distinct-ed and broadcast (eval
    suites are tiny next to a 100 TB corpus), so the corpus side is one
    map-side semi-probe plus a single groupBy on the doc id — no
    corpus-vs-corpus join anywhere. For a benchmark too big to broadcast
    (a multi-GB blocklist), ``broadcast_benchmark=False`` drops the hint
    and the probe becomes a shuffle join on the shingle hash — the only
    sound shape at that size (AQE may still pick broadcast if the
    distinct-ed set turns out small). The shingle scheme is the same
    md5-60-bit contract every dedup operator here uses.
    """
    from meshinsights_data_pipeline_spark.operators.dedup import shingle_hashes

    doc_sh = shingle_hashes(df, id_col, text_col, n)
    bench_sh = (
        shingle_hashes(benchmark, id_col, text_col, n)
        .select(F.col("h"))
        .distinct()
        .withColumn("_bm", F.lit(1))
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    marked = doc_sh.join(bench_sh, "h", "left")
    agg = marked.groupBy(F.col(id_col)).agg(
        F.count("*").alias("n_shingles"),
        F.count("_bm").alias("hits"),
    )
    contamination = F.round(F.col("hits") / F.col("n_shingles"), 6)
    return agg.select(
        F.col(id_col),
        F.col("n_shingles"),
        F.col("hits"),
        contamination.alias("contamination"),
        (contamination >= threshold).alias("contaminated"),
    )


def pack_sequences(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    token_col: str,
    budget: int,
) -> DataFrame:
    """Context-window packing: assign consecutive chunks to fixed-token-
    budget training sequences (the concat-then-split packing every
    pretraining loader runs between chunking and batching).

    ``seq_id`` is ``floor(exclusive_cumsum(tokens) / budget)`` over the
    deterministic ``order_cols`` total order within each ``part_cols``
    partition; ``tok_offset`` is the chunk's start position inside its
    sequence. A chunk straddling a boundary belongs to the sequence it
    starts in (standard greedy fill; the loader truncates/continues).

    Scale design: one window over the ``part_cols`` partitioning — pack
    per source/shard rather than globally, so no single-partition window
    bottleneck exists and sequence ids are deterministic per shard.
    """
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("bigint")
    return df.select(
        "*",
        F.floor(excl / F.lit(budget)).cast("bigint").alias("seq_id"),
        (excl - F.floor(excl / F.lit(budget)) * budget).cast("bigint").alias("tok_offset"),
    )


def split_columns(
    id_col: str,
    weights: dict[str, int] | None = None,
    buckets: int = 100,
):
    """(bucket, split) Column pair for deterministic dataset splitting:
    md5-bucket the id, threshold on cumulative ``weights`` (split name ->
    integer percent, must sum to ``buckets``; default 98/1/1). A pure
    map-side function of the id — stable across runs, machines, and
    engines (the dedup operators' shared md5-60-bit contract), with no
    sampling state to coordinate across executors."""
    weights = weights or {"train": 98, "val": 1, "test": 1}
    if sum(weights.values()) != buckets:
        raise ValueError(f"weights must sum to {buckets}: {weights}")
    bucket = F.pmod(md5_int60(F.col(id_col).cast("string")), F.lit(buckets))
    expr = None
    cum = 0
    for name, wgt in weights.items():
        cum += wgt
        cond = bucket < cum
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return bucket.cast("bigint"), expr


def mixture_sample(
    df: DataFrame,
    source_col: str,
    token_col: str,
    weights: dict[str, float] | DataFrame,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Deterministic training-mixture construction: downsample each source
    so the SAMPLED token mass follows the relative ``weights`` (the static
    half of DoReMi-style mixture reweighting — fix target proportions,
    build the largest corpus that satisfies them exactly).

    With T_s = token count of source s and w_s its weight, the largest
    achievable mixture size is N = min_s(T_s / w_s); source s keeps a doc
    iff h60(seed:id) < floor(w_s * N / T_s * 2^60) — per-source Bernoulli
    thinning as a pure function of the id, so the sample is stable across
    runs/engines/partitionings and re-seeding redraws it. The binding
    (scarcest-relative-to-weight) source is kept (almost) whole. Sources
    absent from ``weights`` are dropped (inner join) — by design: a
    mixture definition IS the allowlist.

    ``weights`` is a plain dict or a DataFrame [source_col, _w] — the
    frame form lets a weight policy be DERIVED from the corpus (e.g. a
    rule over the distinct source set) with no driver-side collect in the
    plan build.

    Shuffle shape at 100 TB: one map-side-combinable per-source token sum
    (|sources| rows), driver-free threshold derivation as a broadcast
    join, then a map-side filter on the corpus scan. No sampling state,
    no collect.
    """
    spark = df.sparkSession
    if isinstance(weights, DataFrame):
        w = weights.select(F.col(source_col), F.col("_w").cast("double"))
    else:
        w = spark.createDataFrame(
            [(s, float(x)) for s, x in sorted(weights.items())],
            f"{source_col} string, _w double",
        )
    totals = df.groupBy(source_col).agg(
        F.sum(F.col(token_col)).cast("double").alias("_T")
    )
    per_src = totals.join(w, source_col)
    n = per_src.agg(F.min(F.col("_T") / F.col("_w")).alias("_N"))
    thr = per_src.crossJoin(F.broadcast(n)).select(
        F.col(source_col),
        F.floor(
            F.col("_w") * F.col("_N") / F.col("_T") * F.lit(float(1 << 60))
        ).cast("bigint").alias("_thr"),
    )
    key = md5_int60(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    return df.join(F.broadcast(thr), source_col).filter(key < F.col("_thr")).drop(
        "_thr"
    )


def shuffle_shards(
    df: DataFrame, id_col: str, n_shards: int = 8, seed: int = 0
) -> DataFrame:
    """Deterministic global shuffle into fixed training shards — the
    "shuffle once, read sequentially" layout every pretraining loader
    wants: [id, shard, pos] with shard = h60(seed:id) % n_shards and pos
    the 0-based rank of the row INSIDE its shard ordered by the same
    hash. A pure function of (seed, id): stable across runs, machines,
    engines, and partition counts — no sampled RNG state to coordinate at
    1000 executors, and changing ``seed`` is a full reshuffle.

    Shuffle shape at 100 TB: one hash-partition exchange on ``shard``
    (exactly the write layout: ``.repartition("shard").sortWithin
    Partitions("pos")`` appends no further exchange) + a per-shard
    window for ``pos``. Shards are hash-balanced by construction, so the
    window never sees a skewed partition.
    """
    key = md5_int60(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy(F.col("_key").asc(), F.col(id_col).asc())
    return (
        df.select(
            F.col(id_col),
            key.alias("_key"),
            F.pmod(key, F.lit(n_shards)).cast("bigint").alias("shard"),
        )
        .withColumn("pos", (F.row_number().over(w) - 1).cast("bigint"))
        .select(F.col(id_col), "shard", "pos")
    )


def dataset_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, int] | None = None,
    buckets: int = 100,
) -> DataFrame:
    """Per-id split assignment [id, bucket, split] — see split_columns."""
    bucket, split = split_columns(id_col, weights, buckets)
    return df.select(F.col(id_col), bucket.alias("bucket"), split.alias("split"))


def vocabulary(
    df: DataFrame, text_col: str, top_n: int = 100
) -> DataFrame:
    """Corpus vocabulary: the ``top_n`` most frequent normalized tokens
    with counts; ties break token-ascending so the result is total-order
    deterministic.

    Scale design: explode + groupBy(token) is the canonical map-side-
    combinable aggregate — partial counts reduce inside the scan stage,
    so the shuffle carries one row per distinct token per task, not one
    per occurrence; the global top-n then sorts the (tiny) distinct-token
    frame. No windows, no skew sensitivity (hot tokens combine map-side).
    """
    toks = df.select(
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counts.orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(top_n)
    )


def lm_quality_score(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """CCNet-style statistical-LM quality score (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data" — there a KenLM 5-gram; here a corpus-trained add-one-smoothed
    bigram LM, the same filter signal without a model artifact):
    [id, n_bigrams, avg_logp, ppl] per document with >= 2 tokens, where
    ppl = exp(-mean log P(w_i | w_{i-1})) and
    P = (c(w_{i-1} w_i) + 1) / (c(w_{i-1}) + |V|). Low perplexity =
    looks like the corpus; the filter keeps a band (too low = boilerplate,
    too high = gibberish — the paper's head/middle/tail split).

    Scale design: tokens hash to 60-bit ints immediately (md5_int60 — the
    repo-wide join-key contract; STRINGS NEVER SHUFFLE), bigram pairing is
    one per-doc lead window, both count tables are map-side-combinable
    groupBys that shuffle one row per distinct (bi)gram, |V| rides along
    as a broadcast one-row frame, and scoring is two hash joins on int
    keys + one per-doc aggregate. At 100 TB the counts tables would be
    trained once (or on a sample) and loaded as static tables; the
    train-on-self form here is the self-contained equivalent with
    identical join shapes.

    Determinism: avg_logp rounds to 6 decimals (log-prob magnitudes are
    O(1-10), so double reorder error ~1e-14 cannot reach the rounding
    digit); ppl to 2.
    """
    h = lm_token_hashes(df, id_col, text_col)
    # r16: bigrams come map-side from the text (no per-doc lag window);
    # h still feeds the unigram counts.
    bigrams = lm_bigrams_from_text(df, id_col, text_col)
    # r17 (guide §2.4): the bigram count attaches as a window-count over
    # the (h_prev, h) partition key instead of a separate aggregate
    # joined back — the aggregate-then-join form re-ran the whole bigram
    # tokenize pipeline for the join side (zero ReusedExchange across
    # the fork; the train-on-self batch path is exactly the case where
    # count source == scored stream, so the window value IS cb).
    # Interleaved warm A/B: sf0.1 2.39-2.53 -> 1.44-1.61 s, sf1
    # 2.91-3.29 -> 2.28-2.32 s. The streaming twin keeps the join form
    # (its counts come from snapshot state, a genuinely different
    # frame) via lm_score_bigrams below — both paths share
    # _lm_score_counted so the scoring math has one definition.
    bigrams_cb = bigrams.withColumn(
        "cb", F.count(F.lit(1)).over(Window.partitionBy("h_prev", "h"))
    )
    uc = h.groupBy(F.col("h").alias("h_prev")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cu")
    )
    vsz = uc.agg(F.count(F.lit(1)).alias("vsz"))
    return _lm_score_counted(bigrams_cb, uc, vsz, id_col)


def lm_token_hashes(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Positional 60-bit token hashes per doc: [id, pos, h] — the shared
    input of LM training (count tables) and scoring (bigram pairing)."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(normalized_text(F.col(text_col)), " ")).alias(
            "pos", "tok"
        ),
    ).filter(F.col("tok") != "")
    return toks.select(F.col(id_col), "pos", md5_int60(F.col("tok")).alias("h"))


def lm_bigrams(token_hashes: DataFrame, id_col: str) -> DataFrame:
    """[id, h_prev, h] consecutive-token pairs (one per-doc lead window).

    Kept for callers that only have a positional token-hash frame; the
    text-backed paths use :func:`lm_bigrams_from_text` (map-side, no
    token-stream shuffle — r16 optimization round)."""
    w = Window.partitionBy(id_col).orderBy("pos")
    return (
        token_hashes.select(
            F.col(id_col), F.lag("h").over(w).alias("h_prev"), "h"
        )
        .filter(F.col("h_prev").isNotNull())
    )


def lm_bigrams_from_text(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """[id, h_prev, h] consecutive-token 60-bit hash pairs straight from
    the text — the r16 map-side form of :func:`lm_bigrams`∘
    :func:`lm_token_hashes`: ONE overlapping-match regex (lookahead at
    each token start capturing "tok tok+1") explodes the adjacent pairs
    in codegen, so the per-doc lag window (an Exchange + Sort + Window
    over the full token stream) disappears from the LM-perplexity and
    DSIR plans. Multiset equality with the window form proven
    in-session at sf0.1 (same discipline as dedup.shingle_hashes) and
    by the x51/x70 oracles."""
    pat = r"\b(?=([a-z0-9]+ [a-z0-9]+))"
    bg = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                normalized_text(F.col(text_col)), F.lit(pat), 1
            )
        ).alias("_bg"),
    )
    return bg.select(
        F.col(id_col),
        md5_int60(F.substring_index("_bg", " ", 1)).alias("h_prev"),
        md5_int60(F.substring_index("_bg", " ", -1)).alias("h"),
    )


def lm_score_bigrams(
    bigrams: DataFrame,
    bc: DataFrame,
    uc: DataFrame,
    vsz: DataFrame,
    id_col: str,
) -> DataFrame:
    """Score [id, h_prev, h] rows against an add-one bigram LM given as
    count tables — bc [h_prev, h, cb], uc [h_prev, cu], vsz a one-row
    [vsz] frame (broadcast). The streaming twin's path (counts from
    accumulated snapshot state — a different frame than the scored
    stream, so the join is genuinely needed); the batch operator
    attaches cb as a window-count and both share
    :func:`_lm_score_counted` so the scoring math has ONE definition
    (the bit-parity rule)."""
    return _lm_score_counted(
        bigrams.join(bc, ["h_prev", "h"], "left"), uc, vsz, id_col
    )


def _lm_score_counted(
    bigrams_cb: DataFrame,
    uc: DataFrame,
    vsz: DataFrame,
    id_col: str,
) -> DataFrame:
    """The scoring tail shared by the batch (window-count cb) and
    streaming (joined cb, possibly NULL for unseen bigrams) paths:
    input [id, h_prev, h, cb]."""
    logp = F.log(
        (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(1.0))
        / (F.col("cu") + F.col("vsz"))
    )
    # avg as DECIMAL-exact sum / count (q31 discipline): each log term is
    # a deterministic double, but a DOUBLE fold over them is partial-
    # aggregate-order-dependent; the exact-decimal fold makes avg_logp
    # (and the exp input) bit-identical run-to-run. Cross-engine, the
    # per-term scale-18 cast can differ ~1e-18 (tie/shortest-repr cases,
    # see tests/test_properties.py cast-ties test) — absorbed by the
    # ROUND(.,6)/(.,2) the outputs apply.
    avg_logp = F.sum(logp.cast("decimal(38,18)")).cast("double") / F.count(
        F.lit(1)
    )
    return (
        bigrams_cb
        .join(uc, "h_prev")
        .crossJoin(F.broadcast(vsz))
        .groupBy(F.col(id_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(avg_logp, 6).alias("avg_logp"),
            F.round(F.exp(-avg_logp), 2).alias("ppl"),
        )
    )


def dsir_weights(
    df: DataFrame,
    target_df: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = 4096,
    round_to: int = 6,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): per-doc log
    importance ``log(p_target(doc) / p_raw(doc))`` under hashed-bigram
    bag-of-features models with Laplace smoothing. Resampling the raw
    corpus with these weights shifts it toward the target domain —
    the standard pretraining-data selection recipe when a small
    high-quality target corpus (Wikipedia, textbooks) should steer a
    large raw crawl.

    Features are word bigrams hashed into ``buckets`` (the paper's
    hashed n-gram space): token 60-bit hashes pair per doc (the x51 LM
    path — ``lm_token_hashes``/``lm_bigrams``), then
    ``((h_prev % B) * 1000003 + h % B) % B`` buckets them; pure int
    math, identical in DuckDB. Per-bucket log ratios use add-one
    smoothing on BOTH distributions, so buckets unseen in the target
    get a finite negative weight instead of -inf.

    Returns [id, n_bigrams, dsir_logw] — docs with <2 tokens have no
    bigrams and are absent (no evidence, no weight). ``dsir_logw`` is a
    DECIMAL(38,18)-exact fold of the per-bucket ``n_b * lambda_b``
    terms rounded to ``round_to`` (the q31/x51 discipline: order-proof
    within an engine; the ~1e-18/ulp cross-engine log+cast wobble is
    absorbed by the rounding).

    Scale design (100 TB): the raw-corpus pass is ONE map-side
    combinable groupBy per doc-bucket plus one per-bucket count whose
    key space is ``buckets`` (bounded, tiny shuffle); the lambda table
    is at most ``buckets`` rows and broadcasts; scoring is a broadcast
    join + one per-doc aggregate. The target corpus is small by
    definition (that is the DSIR premise). Nothing pairs, nothing
    collects; in a real deployment the lambda table would be trained
    once and loaded static — identical join shapes.
    """
    from meshinsights_data_pipeline_spark.operators.barrier import materialize

    # per_doc feeds BOTH the raw distribution (c_r = sum of nb over docs —
    # the same count as counting the occurrence stream directly, without a
    # second corpus tokenize pass) and the scoring join; it is small
    # relative to its upstream (one row per (doc, distinct bucket) vs one
    # per token), so the diamond barrier is the documented materialize()
    # case.
    per_doc = materialize(
        dsir_doc_buckets(df, id_col, text_col, buckets)
        .groupBy(F.col(id_col), F.col("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("nb"))
    )
    c_r = per_doc.groupBy("b").agg(F.sum("nb").cast("bigint").alias("c_r"))
    c_t = (
        dsir_doc_buckets(target_df, id_col, text_col, buckets)
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_t"))
    )
    lam = dsir_lambda(c_r, c_t, buckets)
    return dsir_score(per_doc, lam, id_col, round_to)


def dsir_doc_buckets(
    df: DataFrame, id_col: str, text_col: str, buckets: int = 4096
) -> DataFrame:
    """[id, b] hashed-bigram bucket occurrences per doc (duplicates
    kept): the x51 token-hash + bigram chain with
    ``((h_prev % B) * 1000003 + h % B) % B`` on top — pure int math,
    identical in DuckDB (X70_SQL). Shared by the batch operator and the
    streaming twin."""
    B = int(buckets)
    bi = lm_bigrams_from_text(df, id_col, text_col)
    return bi.select(
        F.col(id_col),
        (((F.col("h_prev") % B) * F.lit(1000003) + (F.col("h") % B)) % B).alias(
            "b"
        ),
    )


def dsir_lambda(c_r: DataFrame, c_t: DataFrame, buckets: int = 4096) -> DataFrame:
    """Per-bucket log importance ratios [b, lam] from raw counts
    [b, c_r] and target counts [b, c_t] (add-one smoothing on both
    sides; ``lam`` defined on the raw bucket set — a bucket no raw doc
    hits never needs a weight). At most ``buckets`` rows in, at most
    ``buckets`` out: always broadcastable."""
    B = int(buckets)
    t_r = c_r.agg(F.sum("c_r").cast("bigint").alias("t_r"))
    t_t = c_t.agg(F.coalesce(F.sum("c_t"), F.lit(0)).cast("bigint").alias("t_t"))
    return (
        c_r.join(c_t, "b", "left")
        .crossJoin(F.broadcast(t_r))
        .crossJoin(F.broadcast(t_t))
        .select(
            "b",
            F.log(
                ((F.coalesce(F.col("c_t"), F.lit(0)) + F.lit(1.0)) / (F.col("t_t") + B))
                / ((F.col("c_r") + F.lit(1.0)) / (F.col("t_r") + B))
            ).alias("lam"),
        )
    )


def dsir_score(
    per_doc: DataFrame, lam: DataFrame, id_col: str, round_to: int = 6
) -> DataFrame:
    """Score per-doc bucket counts [id, b, nb] against a lambda table
    [b, lam] (broadcast join + one per-doc aggregate): [id, n_bigrams,
    dsir_logw], the DECIMAL(38,18)-fold + round discipline."""
    return (
        per_doc.join(F.broadcast(lam), "b")
        .groupBy(F.col(id_col))
        .agg(
            F.sum("nb").cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum((F.col("nb") * F.col("lam")).cast("decimal(38,18)")).cast(
                    "double"
                ),
                round_to,
            ).alias("dsir_logw"),
        )
    )


def contamination_check_prefiltered(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.05,
    bucket_bits: int = 20,
) -> DataFrame:
    """``contamination_check`` for benchmarks too big to broadcast in full:
    a bucket-bloom prefilter cuts the exact join's corpus-side input to the
    colliding fraction, and the RESULT IS STILL EXACT.

    The prefilter is the distinct set of ``h mod 2**bucket_bits`` bucket
    ids of the benchmark's shingles — a single-hash blocked Bloom filter
    expressed as a broadcast semi-join. Its size is bounded by 2**bits
    longs (~8 MB at the default 20 bits) NO MATTER how large the benchmark
    is, so it broadcasts where the full multi-GB shingle set cannot. Corpus
    shingles whose bucket is absent are dropped map-side inside the scan
    stage; only bucket-colliding shingles (true hits + ~|bench|/2^bits
    false-positive rate per distinct bucket) enter the exact shuffle join
    that resolves them. Same output contract as ``contamination_check``
    ([id, n_shingles, hits, contamination, contaminated]) and bit-identical
    results — the x29 driver oracle is literally x25's SQL.

    Note Spark's own bloom-filter runtime join filters cover the same idea
    for equi-joins it plans itself; expressing the prefilter explicitly
    keeps it on regardless of planner heuristics and makes the FP-rate /
    broadcast-size trade a caller-visible knob.
    """
    from meshinsights_data_pipeline_spark.operators.dedup import shingle_hashes

    doc_sh = shingle_hashes(df, id_col, text_col, n)
    bench_sh = shingle_hashes(benchmark, id_col, text_col, n).select("h").distinct()
    p = F.lit(1 << bucket_bits)
    buckets = F.broadcast(
        bench_sh.select(F.pmod(F.col("h"), p).alias("_bk")).distinct()
    )
    cand = doc_sh.join(
        buckets, F.pmod(doc_sh["h"], p) == buckets["_bk"], "left_semi"
    )
    totals = doc_sh.groupBy(F.col(id_col)).agg(F.count("*").alias("n_shingles"))
    hit_counts = (
        cand.join(bench_sh, "h", "left_semi")
        .groupBy(F.col(id_col))
        .agg(F.count("*").alias("hits"))
    )
    agg = (
        totals.join(hit_counts, id_col, "left")
        .withColumn("hits", F.coalesce(F.col("hits"), F.lit(0)))
    )
    contamination = F.round(F.col("hits") / F.col("n_shingles"), 6)
    return agg.select(
        F.col(id_col),
        F.col("n_shingles"),
        F.col("hits"),
        contamination.alias("contamination"),
        (contamination >= threshold).alias("contaminated"),
    )


# Tracking params dropped by canonical_url (the standard scrape-dedup set).
TRACKING_PARAM_RE = r"^(utm_[a-z0-9]+|gclid|fbclid|ref)="


def canonical_url(url):
    """Canonicalize a URL column for crawl deduplication: lowercase
    scheme/authority, strip a leading ``www.``, strip default ports
    (:80 http / :443 https), drop the fragment, strip trailing path
    slashes, remove tracking query params (utm_*, gclid, fbclid, ref)
    and sort the survivors byte-lexicographically.

    Pure built-in expressions (parse_url + regexp + array HOFs) — at
    100 TB this canonicalization runs map-side inside whole-stage codegen,
    and URL-level dedup becomes ``exact_dedup``-shaped: one shuffle on the
    canonical string.
    """
    proto = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    auth = F.regexp_replace(
        F.lower(F.parse_url(url, F.lit("AUTHORITY"))), r"^www\.", ""
    )
    auth = (
        F.when(proto == "http", F.regexp_replace(auth, ":80$", ""))
        .when(proto == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    path = F.regexp_replace(
        F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")), "/+$", ""
    )
    q = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.concat_ws("&", kept)
    return F.concat(
        proto,
        F.lit("://"),
        auth,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def url_dedup(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """One survivor (min id) per canonical URL: [id, url_canon]. The
    crawl-level twin of exact_dedup — canonicalize map-side, then a single
    min-aggregate shuffle on the canonical string."""
    return (
        df.select(
            F.col(id_col), canonical_url(F.col(url_col)).alias("url_canon")
        )
        .groupBy("url_canon")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "url_canon")
    )


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    delim: str = "\n",
    min_doc_frac: float | None = None,
    min_doc_freq: int | None = None,
    broadcast_lines: bool = False,
) -> DataFrame:
    """Corpus-level line deduplication (the RefinedWeb / CCNet cleaning
    step): drop every line that occurs in at least ``min_doc_freq``
    documents (or ``min_doc_frac`` of the corpus) — headers, footers,
    cookie banners, nav menus — and reassemble each document from its
    surviving lines in original order.

    Returns ``[id, clean_text, n_lines_removed, n_lines_kept]``; every
    input document appears exactly once (a fully-boilerplate document
    comes back with clean_text = '' and n_lines_kept = 0). A line
    repeated WITHIN one document counts that document once toward its
    frequency, and non-frequent within-doc repeats are kept — this
    operator removes cross-document boilerplate, not intra-doc
    repetition (that is repetition_signals / duplicate_spans).

    Shape at 100 TB: posexplode is map-side; line document-frequency is
    one count-distinct shuffle on the line value; the frequent-line set
    is small BY CONSTRUCTION (at most total_lines / min_doc_freq
    members), so the anti-join is broadcastable (``broadcast_lines``)
    with the shuffle anti-join as the safe default; reassembly is one
    groupBy on doc id whose state is bounded by document size. The fact
    is scanned once. With ``min_doc_frac`` the corpus row count arrives
    as a broadcast 1-row cross join — never a collect.
    """
    if (min_doc_frac is None) == (min_doc_freq is None):
        raise ValueError("pass exactly one of min_doc_frac / min_doc_freq")
    import re as _re

    pattern = _re.escape(delim)
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), pattern, -1)).alias(
            "_pos", "_line"
        ),
    )
    freq = lines.groupBy("_line").agg(
        F.countDistinct(id_col).alias("_df")
    )
    if min_doc_freq is not None:
        common = freq.filter(F.col("_df") >= F.lit(int(min_doc_freq)))
    else:
        n_docs = df.agg(F.count(F.lit(1)).alias("_n_docs"))
        common = (
            freq.crossJoin(F.broadcast(n_docs))
            .filter(
                F.col("_df").cast("double")
                >= F.lit(float(min_doc_frac)) * F.col("_n_docs").cast("double")
            )
        )
    common = common.select("_line")
    if broadcast_lines:
        common = F.broadcast(common)
    kept = lines.join(common, "_line", "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.concat_ws(
            delim,
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
        ).alias("_clean"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines_kept"),
    )
    n_total = F.size(F.split(F.col(text_col), pattern, -1)).cast("bigint")
    return df.join(reassembled, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("_clean"), F.lit("")).alias("clean_text"),
        (n_total - F.coalesce(F.col("n_lines_kept"), F.lit(0))).alias(
            "n_lines_removed"
        ),
        F.coalesce(F.col("n_lines_kept"), F.lit(0)).alias("n_lines_kept"),
    )


def source_drift(
    df: DataFrame,
    source_col: str,
    text_col: str,
) -> DataFrame:
    """Per-source token-distribution drift against the whole corpus:
    for each source, total-variation distance
    ``0.5 * sum_tok |p_tok|source - p_tok|corpus|`` and the chi-square
    statistic over the same grid — the mixture monitor a training
    pipeline runs per ingest batch to catch a source whose content
    shifted (scraper broke, new template, language flip) before it
    poisons the mixture.

    Returns ``[source, n_tokens, tv_distance, chi_square]`` with one row
    per source, metrics over the (source x vocabulary) grid; a token a
    source never emits still contributes |0 - q| (drift INCLUDES missing
    mass, the usual bug in naive inner-join implementations).

    Shape at 100 TB: token counting is the classic map-side-combinable
    aggregate (one shuffle at |source| x |vocab| cardinality); the
    source-marginal, corpus-marginal and grid frames all live at
    count-table cardinality, orders of magnitude below the corpus; the
    full grid is sources x vocab via a broadcast of the (tiny) source
    marginals; nothing touches the raw corpus twice.
    """
    toks = df.select(
        F.col(source_col).alias("source"),
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("double").alias("c_st")
    )
    return drift_from_counts(counts)


def drift_from_counts(counts: DataFrame) -> DataFrame:
    """Drift metrics from a pre-built ``[source, tok, c_st]`` count
    table — the shared core of :func:`source_drift` (which counts from
    raw text) and ``streaming.streaming_drift_ingest`` (which folds
    counts incrementally and recomputes drift per epoch; token identity
    may be a hash there — TV/chi-square are invariant under injective
    token renaming). Same output contract as :func:`source_drift`."""
    src_tot = counts.groupBy("source").agg(
        F.sum("c_st").alias("c_s")
    )
    vocab = counts.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
    corpus_total = vocab.agg(F.sum("c_t").alias("c_all"))
    grid = (
        vocab.crossJoin(F.broadcast(src_tot))
        .join(counts, ["source", "tok"], "left")
        .crossJoin(F.broadcast(corpus_total))
        .select(
            "source",
            "c_s",
            F.coalesce(F.col("c_st"), F.lit(0.0)).alias("c_st"),
            (F.col("c_t") / F.col("c_all")).alias("q"),
        )
        .withColumn("p", F.col("c_st") / F.col("c_s"))
    )
    # Each per-token term is a deterministic double (same IEEE ops on
    # both engines); the SUM over them is cast to DECIMAL(38,18) first so
    # the fold is exact and partial-aggregate-order-independent — a raw
    # DOUBLE sum can flip an ulp run-to-run and ROUND(.,6) does not mask
    # a flip at a rounding boundary (the q31/x65 discipline). Scope of
    # the guarantee: order-independence WITHIN each engine is exact; the
    # CROSS-engine per-term cast can differ ~1ulp at scale 18 (Spark
    # casts a double via its shortest decimal representation, DuckDB via
    # the exact binary expansion — pinned by
    # tests/test_properties.py::test_double_to_decimal_cast_ties...),
    # which the final 6dp rounding absorbs.
    tv_term = F.abs(F.col("p") - F.col("q")).cast("decimal(38,18)")
    chi_term = (
        (F.col("p") - F.col("q")) * (F.col("p") - F.col("q")) / F.col("q")
    ).cast("decimal(38,18)")
    return (
        grid.groupBy("source")
        .agg(
            F.first("c_s").cast("bigint").alias("n_tokens"),
            F.round(F.lit(0.5) * F.sum(tv_term).cast("double"), 6)
            .alias("tv_distance"),
            F.round(F.sum(chi_term).cast("double"), 6).alias("chi_square"),
        )
        .select("source", "n_tokens", "tv_distance", "chi_square")
    )


def source_vocab_overlap(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Pairwise VOCABULARY Jaccard between sources — the lexical twin
    of the embedding-centroid drift monitor (x96): two sources whose
    distinct-token sets overlap heavily share a register (or a
    boilerplate template); a near-zero overlap against the rest flags a
    different language or a degenerate generator. The
    source-granularity complement of per-doc near-dup: it sees shared
    LANGUAGE even when no individual documents pair.

    Returns ``[src_a, src_b, vocab_a, vocab_b, n_shared,
    vocab_jaccard]`` for every unordered source pair (src_a < src_b)
    that shares AT LEAST ONE token — fully disjoint vocabularies
    produce no row (inner join on the shared token; a dense zero matrix
    would be |sources|^2 rows of noise at scale — left-join a source
    cross-product if the zeros matter). jaccard = shared /
    (a + b - shared), one IEEE division of exact integers, rounded.

    Scale shape: the corpus collapses to the DISTINCT (source, token)
    frame in one map-side-combinable aggregate (hot tokens combine
    inside the scan); the self-join keys on the token, so its cost is
    sum over tokens of (#sources sharing the token)^2 — bounded by
    |sources|^2 per token, never corpus-sized; the final aggregate is
    |source pairs| rows.
    """
    vocab = (
        df.select(
            F.col(source_col).alias("_src"),
            F.explode(
                F.split(normalized_text(F.col(text_col)), " ")
            ).alias("_tok"),
        )
        .filter(F.col("_tok") != "")
        .distinct()
    )
    sizes = vocab.groupBy("_src").agg(F.count(F.lit(1)).alias("_sz"))
    a = vocab.select(F.col("_src").alias("src_a"), F.col("_tok").alias("_t"))
    b = vocab.select(F.col("_src").alias("src_b"), F.col("_tok").alias("_t"))
    inter = (
        a.join(b, "_t")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    sa = sizes.select(F.col("_src").alias("src_a"), F.col("_sz").alias("vocab_a"))
    sb = sizes.select(F.col("_src").alias("src_b"), F.col("_sz").alias("vocab_b"))
    return (
        inter.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("vocab_a").cast("bigint").alias("vocab_a"),
            F.col("vocab_b").cast("bigint").alias("vocab_b"),
            "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_shared")),
                round_to,
            ).alias("vocab_jaccard"),
        )
    )


def source_token_entropy(
    df: DataFrame,
    source_col: str,
    text_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-source token-distribution concentration report: Shannon
    entropy, normalized entropy, and the Gini coefficient of the token
    frequency distribution — the information-theoretic complement to
    lexical_diversity's TTR/top-share/Zipf-slope (TTR sees only the
    type count; entropy and Gini see the whole shape: a source whose
    entropy collapses or Gini spikes has gone template-heavy or
    boilerplate-dominated, a standard pretraining-mix health signal).

        H      = ln(N) - (sum_t c_t * ln(c_t)) / N        (nats)
        H_norm = H / ln(K)           (NULL when K = 1 — no spread exists)
        gini   = (2 * sum_i i*c_(i) - (K+1) * N) / (K * N)

    with N total tokens, K distinct tokens, c_(i) the counts in
    ascending (count, token) order. Returns
    ``[source, n_tokens, n_types, entropy, norm_entropy, gini]``.

    Cross-engine determinism: every ln has an exact-integer argument
    (the x74 ln-of-exact-input precedent; ulp-level libm disagreement
    is absorbed by the final round), each summand folds through
    DECIMAL(38,18) so the sum order cannot matter, the Gini rank-sum
    ``sum i*c_i`` routes through DECIMAL(38,0) (i and c can both be
    billions at corpus scale — the raw BIGINT product wraps), and ties
    in the rank order are broken by token so the permutation is total
    (Gini is invariant under tie order anyway — equal c terms commute —
    but the determinism should not REQUIRE that argument).

    Scale shape: one (source, token) count (map-side combinable), one
    |types|-per-source ranking via the hot-group-safe
    grouped_row_number, one final per-source aggregate — the corpus is
    scanned once, and nothing after the first count is corpus-sized.
    """
    return token_entropy_from_counts(
        source_token_counts(df, source_col, text_col),
        source_col,
        round_to=round_to,
    )


def source_token_counts(
    df: DataFrame,
    source_col: str,
    text_col: str,
    hashed: bool = False,
) -> DataFrame:
    """The ``[source, _tok, _c]`` count stage of
    :func:`source_token_entropy`, shared with the streaming twin so the
    twin's tokenization (normalize -> split -> drop empties) can never
    drift from batch semantics — the ks_value_counts/benford/km_spine
    shared-stage discipline.

    ``hashed=True`` replaces the token string with its 60-bit md5 hash
    (the drift-twin state discipline: strings stay out of the merge
    shuffle). Entropy/Gini depend only on the count MULTISET, so hashing
    preserves them EXCEPT under a 60-bit collision within a source,
    which merges two token types — see ``streaming.entropy`` for the
    probabilistic-parity caveat.
    """
    from meshinsights_data_pipeline_spark.operators.dedup import md5_int60

    toks = df.select(
        F.col(source_col),
        F.explode(
            F.split(normalized_text(F.col(text_col)), " ")
        ).alias("_tok"),
    ).filter(F.col("_tok") != "")
    key = md5_int60(F.col("_tok")) if hashed else F.col("_tok")
    return toks.groupBy(F.col(source_col), key.alias("_tok")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )


#: ln(2) pre-rounded to 12 decimals and embedded as a LITERAL in both
#: engines (the BENFORD_EXPECTED discipline — never each engine's libm).
LN2_LITERAL = "0.693147180560"


def source_js_divergence(
    df: DataFrame,
    source_col: str,
    text_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Jensen-Shannon divergence of each source's token distribution
    from the whole corpus — the symmetric, bounded drift score
    completing the token-level family (x63's TV distance counts
    mass moved; PSI/KS are numeric-column monitors; JS is the
    information-theoretic mixture distance — bounded in [0, ln 2],
    symmetric, defined even on disjoint vocabularies, the standard
    pretraining-mix distance in data-curation pipelines):

        JS(P_s || Q) = 1/2 KL(P_s || M) + 1/2 KL(Q || M),  M = (P_s+Q)/2

    with P_s the source's token distribution and Q the CORPUS's (the
    ks_drift group-vs-whole convention). Returns ``[source, n_tokens,
    n_types, js, js_norm]`` with ``js`` in nats and ``js_norm = js/ln2``
    in [0, 1].
    """
    return js_from_counts(
        source_token_counts(df, source_col, text_col),
        source_col,
        round_to=round_to,
    )


def js_from_counts(
    counts: DataFrame,
    source_col: str,
    round_to: int = 6,
) -> DataFrame:
    """:func:`source_js_divergence` from a pre-aggregated
    ``[source, _tok, _c]`` count table — the mergeable-sufficient-
    statistic entry point the streaming twin folds into (counts sum
    across micro-batches; JS depends on per-token (p, q) PAIRS, which
    are invariant under injective token renaming, so the twin can store
    60-bit hashes with the same probabilistic-parity caveat as the
    entropy twin).

    Cross-engine determinism: the tokens a source is MISSING never
    materialize — for an absent token p = 0, so its whole contribution
    is q/2 * ln 2, and the absent mass folds into one closed-form
    term: ``JS = 1/2 [ sum_present p*ln(2*c_st*n / D) +
    sum_present q*ln(2*c_t*n_s / D) + ln2 * (1 - Q_present) ]`` with
    ``D = c_st*n + c_t*n_s`` an exact integer. Every ln argument is a
    ratio of exact integers (DECIMAL(38,0) products, one IEEE division
    each — the psi_drift discipline), each summand folds through
    DECIMAL(38,18) so sum order cannot matter, ``Q_present`` is an
    exact integer ratio (DECIMAL(38,0) sum of corpus counts over
    present tokens), and ln2 is the shared 12-decimal literal
    ``LN2_LITERAL`` (never each engine's libm). One final round.

    Scale shape: the corpus collapses to (source, token) counts
    map-side (ONE shuffle); the token spine [_tok, c_t] derives from
    the SAME count table and joins back on the token key (never a
    grid — only PRESENT (source, token) pairs materialize, so cost is
    the count-table size); the per-source fold and the 1-row corpus
    total broadcast are all |sources|-bounded. Nothing after the first
    count is corpus-sized.

    NULL source keys are EXCLUDED here, before the corpus spine is
    derived (they would otherwise silently fall out of the equality
    join below while still inflating Q — the ks_drift NULL-group rule;
    route NULLs to a sentinel label upstream to monitor them).
    """
    counts = counts.filter(F.col(source_col).isNotNull())
    spine = counts.groupBy("_tok").agg(
        F.sum("_c").cast("bigint").alias("_ct")
    )
    sizes = counts.groupBy(source_col).agg(
        F.sum("_c").cast("bigint").alias("_ns"),
        F.count(F.lit(1)).cast("bigint").alias("_types"),
    )
    tot = spine.agg(F.sum("_ct").cast("bigint").alias("_n"))
    dec0, dec18 = "decimal(38,0)", "decimal(38,18)"
    joined = (
        counts.join(spine, "_tok")
        .join(F.broadcast(sizes), source_col)
        .crossJoin(F.broadcast(tot))
    )
    # D = c_st*n + c_t*n_s, exact; p = c_st/n_s, q = c_t/n, one IEEE
    # division each; ln args are exact-integer ratios via one division
    big_d = (
        F.col("_c").cast(dec0) * F.col("_n")
        + F.col("_ct").cast(dec0) * F.col("_ns")
    ).cast("double")
    p = F.col("_c").cast("double") / F.col("_ns").cast("double")
    q = F.col("_ct").cast("double") / F.col("_n").cast("double")
    arg_p = (F.lit(2).cast(dec0) * F.col("_c") * F.col("_n")).cast(
        "double"
    ) / big_d
    arg_q = (F.lit(2).cast(dec0) * F.col("_ct") * F.col("_ns")).cast(
        "double"
    ) / big_d
    term = ((p * F.log(arg_p)) + (q * F.log(arg_q))).cast(dec18)
    ln2 = F.lit(LN2_LITERAL).cast("decimal(14,12)").cast("double")
    agg = joined.groupBy(source_col).agg(
        F.max("_ns").cast("bigint").alias("n_tokens"),
        F.max("_types").cast("bigint").alias("n_types"),
        F.max("_n").cast("bigint").alias("_nn"),
        F.sum(term).cast("double").alias("_present"),
        F.sum(F.col("_ct").cast(dec0)).cast(dec0).alias("_ct_present"),
    )
    q_present = F.col("_ct_present").cast("double") / F.col(
        "_nn"
    ).cast("double")
    js = (
        F.col("_present") + ln2 * (F.lit(1.0) - q_present)
    ) / F.lit(2.0)
    return agg.select(
        F.col(source_col),
        "n_tokens",
        "n_types",
        (F.round(js, round_to) + F.lit(0.0)).alias("js"),
        (F.round(js / ln2, round_to) + F.lit(0.0)).alias("js_norm"),
    )


def token_entropy_from_counts(
    counts: DataFrame,
    source_col: str,
    round_to: int = 6,
) -> DataFrame:
    """:func:`source_token_entropy` from a pre-aggregated
    ``[source, _tok, _c]`` count table — the mergeable-sufficient-
    statistic entry point the streaming twin folds into. Entropy and
    Gini are functions of the count MULTISET only (invariant under
    INJECTIVE token renaming), so the twin can store 60-bit token
    hashes (the drift-twin discipline) and match the batch operator
    whenever the hash is collision-free on the observed vocabulary —
    probabilistic parity, see ``streaming.entropy`` for the caveat.
    Rank ties break on the token column, and tie order cannot change
    either statistic (equal-c terms commute in both folds)."""
    from meshinsights_data_pipeline_spark.operators.global_rank import (
        grouped_row_number,
    )

    ranked = grouped_row_number(
        counts,
        [source_col],
        [F.col("_c").asc(), F.col("_tok").asc()],
        out_col="_i",
    )
    dec0, dec18 = "decimal(38,0)", "decimal(38,18)"
    c = F.col("_c")
    agg = ranked.groupBy(source_col).agg(
        F.sum("_c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum((c.cast("double") * F.log(c.cast("double"))).cast(dec18))
        .cast("double")
        .alias("_clnc"),
        F.sum(F.col("_i").cast(dec0) * c).cast(dec0).alias("_ic"),
    )
    n = F.col("n_tokens").cast("double")
    k = F.col("n_types").cast("double")
    h = F.log(n) - F.col("_clnc") / n
    gini = (
        (F.lit(2).cast(dec0) * F.col("_ic")).cast("double")
        - (k + 1) * n
    ) / (k * n)
    return agg.select(
        F.col(source_col),
        "n_tokens",
        "n_types",
        F.round(h, round_to).alias("entropy"),
        F.when(F.col("n_types") >= 2, F.round(h / F.log(k), round_to)).alias(
            "norm_entropy"
        ),
        F.round(gini, round_to).alias("gini"),
    )


def source_duplicate_matrix(
    df: DataFrame,
    source_col: str,
    text_col: str,
    round_to: int = 6,
    prefix_tokens: int | None = None,
) -> DataFrame:
    """Cross-source exact-duplicate matrix: for every source pair, how
    much of each side's content also appears in the other — the
    document-granularity complement of x101's vocabulary overlap and
    the mixing diagnostic the x50 report card can't see (WHERE the
    duplication between sources lives, not just how much each source
    self-duplicates). A high dup_frac from a "new" source into an
    existing one means the new crawl re-scraped the old corpus.

    Content identity is the exact-dedup fingerprint (md5 of normalized
    text, the x01 surface); ``prefix_tokens`` switches identity to the
    first-k-token fingerprint — the recrawl/boilerplate-HEAD detector
    (two scrapes of the same page differ in trailing chrome but share
    the head, which full-text identity misses entirely).
    Returns one row per unordered source pair
    with any overlap: ``[src_a, src_b, fp_a, fp_b, n_shared,
    dup_frac_a, dup_frac_b]`` where fp_* are distinct-fingerprint
    counts and dup_frac_a = n_shared / fp_a (the share of a's distinct
    content also in b; one exact-integer division each, rounded).

    Scale shape: the corpus collapses to the distinct (source,
    fingerprint) frame map-side (ONE shuffle on the hash); the
    self-join keys on the fingerprint, so cost is bounded by
    sum over fp of (#sources carrying it)^2 — |sources|^2 per
    fingerprint worst case, never corpus^2 (the x101 argument); the
    final aggregate is |source pairs| rows.
    """
    from meshinsights_data_pipeline_spark.operators.text import (
        fingerprint,
        normalized_text,
    )

    if prefix_tokens is None:
        ident = fingerprint(F.col(text_col))
    else:
        toks = F.split(normalized_text(F.col(text_col)), " ")
        ident = F.md5(
            F.concat_ws(" ", F.slice(toks, 1, int(prefix_tokens)))
        )
    fps = (
        df.select(F.col(source_col).alias("_src"), ident.alias("_fp"))
        .filter(F.col("_src").isNotNull())
        .distinct()
    )
    sizes = fps.groupBy("_src").agg(
        F.count(F.lit(1)).cast("bigint").alias("_sz")
    )
    a = fps.select(F.col("_src").alias("src_a"), F.col("_fp").alias("_f"))
    b = fps.select(F.col("_src").alias("src_b"), F.col("_fp").alias("_f"))
    shared = (
        a.join(b, "_f")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    sa = sizes.select(F.col("_src").alias("src_a"), F.col("_sz").alias("fp_a"))
    sb = sizes.select(F.col("_src").alias("src_b"), F.col("_sz").alias("fp_b"))
    return (
        shared.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "fp_a",
            "fp_b",
            "n_shared",
            F.round(F.col("n_shared") / F.col("fp_a"), round_to).alias(
                "dup_frac_a"
            ),
            F.round(F.col("n_shared") / F.col("fp_b"), round_to).alias(
                "dup_frac_b"
            ),
        )
    )
