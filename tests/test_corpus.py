"""Unit tests for training-corpus preparation ops (operators/corpus.py):
fixed-token chunking, winnowing fingerprints, Gopher quality rules."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.corpus import (
    chunk_documents,
    gopher_quality,
    winnow_fingerprints,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunking_exact_split(spark):
    text = " ".join(f"w{i}" for i in range(10))
    df = _docs(spark, [(1, text)])
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=4).orderBy("chunk_id")
    rows = out.collect()
    assert [r.chunk_id for r in rows] == [0, 1, 2]
    assert rows[0].chunk_text == "w0 w1 w2 w3"
    assert rows[2].chunk_text == "w8 w9"
    assert [r.n_tokens for r in rows] == [4, 4, 2]
    # Token-count conservation: no token lost or duplicated.
    assert sum(r.n_tokens for r in rows) == 10


def test_chunking_short_doc_single_chunk(spark):
    df = _docs(spark, [(1, "only three tokens")])
    rows = chunk_documents(df, "doc_id", "text", chunk_tokens=32).collect()
    assert len(rows) == 1
    assert rows[0].chunk_id == 0 and rows[0].n_tokens == 3


def test_chunking_is_narrow_no_shuffle(spark):
    df = _docs(spark, [(1, "a b c")])
    plan = chunk_documents(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_winnowing_shared_substring_shares_fingerprint(spark):
    # Winnowing guarantee (Schleimer et al. 2003): a shared run of
    # >= w + n - 1 = 6 tokens forces at least one shared fingerprint.
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    df = _docs(
        spark,
        [(1, "one two " + shared), (2, shared + " nine ten"), (3, "totally different words here now ok fine yes")],
    )
    fps = winnow_fingerprints(df, "doc_id", "text", n=3, w=4)
    a = {r.fp for r in fps.filter(F.col("doc_id") == 1).collect()}
    b = {r.fp for r in fps.filter(F.col("doc_id") == 2).collect()}
    c = {r.fp for r in fps.filter(F.col("doc_id") == 3).collect()}
    assert a & b, "docs sharing an 8-token run must share a fingerprint"
    assert not (a & c) and not (b & c)


def test_winnowing_short_doc_global_min(spark):
    # 4 tokens -> 2 shingles < w=4 windows -> single global-min fingerprint.
    df = _docs(spark, [(1, "a b c d")])
    rows = winnow_fingerprints(df, "doc_id", "text", n=3, w=4).collect()
    assert len(rows) == 1


def test_winnowing_density(spark):
    # Expected density of selected fingerprints is ~2/(w+1); sanity-check
    # the selected set is a strict, non-empty subset of all shingles.
    text = " ".join(f"tok{i % 17}" for i in range(200))
    df = _docs(spark, [(1, text)])
    n_fp = winnow_fingerprints(df, "doc_id", "text", n=3, w=4).count()
    assert 0 < n_fp < 198  # 198 shingles total


def test_gopher_rules(spark):
    good = "the quick brown fox jumps over a lazy dog " * 3  # 30 tokens, stopwords
    short = "the a tiny doc"  # fails token bound
    no_stop = " ".join(f"word{i}" for i in range(30))  # fails stopword rule
    df = _docs(spark, [(1, good), (2, short), (3, no_stop)])
    rows = {r.doc_id: r for r in gopher_quality(df, "doc_id", "text").collect()}
    assert rows[1].keep is True
    assert rows[2].keep is False and rows[2].n_tok < 20
    assert rows[3].keep is False and rows[3].stop_hits == 0
    assert rows[1].alpha_ratio == 1.0


def test_quota_sample_salted_matches_plain(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import quota_sample

    rows = [(i, f"k{i % 3}", float(i % 7)) for i in range(60)]
    df = spark.createDataFrame(rows, ["id", "key", "score"])
    plain = sorted(map(tuple, quota_sample(df, "key", 5, "score", "id").collect()))
    salted = sorted(
        map(tuple, quota_sample(df, "key", 5, "score", "id", salt_buckets=4).collect())
    )
    assert plain == salted
    assert len(plain) == 15  # 3 keys x quota 5
    # Deterministic: highest score wins, min id breaks ties.
    per_key = {}
    for i, k, s in rows:
        per_key.setdefault(k, []).append((-s, i))
    expect = sorted(
        (i, k, -negs)
        for k, members in per_key.items()
        for negs, i in sorted(members)[:5]
    )
    assert plain == expect


def test_quota_sample_small_groups_pass_through(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import quota_sample

    df = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], ["id", "key", "score"])
    assert quota_sample(df, "key", 10, "score", "id", salt_buckets=8).count() == 2


def test_contamination_exact_and_disjoint(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import contamination_check

    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    cand = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # exact copy
            (2, "completely different words appear in this sentence here"),
            (3, "the quick brown fox sat still today ok"),  # partial overlap
        ],
    )
    out = {
        r.doc_id: (r.n_shingles, r.hits, r.contamination, r.contaminated)
        for r in contamination_check(cand, bench, "doc_id", "text", threshold=0.5).collect()
    }
    assert out[1][2] == 1.0 and out[1][3] is True
    assert out[2][1] == 0 and out[2][2] == 0.0 and out[2][3] is False
    assert 0.0 < out[3][2] < 1.0


def test_canonical_url_rules(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import canonical_url

    cases = {
        # lowercase + www + default port + trailing slash + tracking + sort + fragment
        "HTTPS://WWW.Example.COM:443/A/B/?utm_source=x&b=2&a=1&gclid=y#frag":
            "https://example.com/A/B?a=1&b=2",
        # non-default port kept; http :80 stripped
        "http://example.com:80/p": "http://example.com/p",
        "http://example.com:8080/p": "http://example.com:8080/p",
        # https keeps :80 (not its default)
        "https://example.com:80/p": "https://example.com:80/p",
        # bare host, no path/query
        "http://Example.com": "http://example.com",
        # all params tracked -> no query at all
        "https://a.com/p?utm_medium=m&ref=r": "https://a.com/p",
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = {r.url: r.canon for r in df.select("url", canonical_url(F.col("url")).alias("canon")).collect()}
    assert got == cases


def test_url_dedup_min_id_survivor(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import url_dedup

    df = spark.createDataFrame(
        [
            (3, "https://WWW.a.com/x/?utm_source=s"),
            (1, "https://a.com/x"),
            (2, "https://b.com/y"),
        ],
        ["id", "url"],
    )
    got = sorted(map(tuple, url_dedup(df, "id", "url").collect()))
    assert got == [(1, "https://a.com/x"), (2, "https://b.com/y")]


def test_contamination_shuffle_path_matches_broadcast(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import contamination_check

    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    cand = _docs(
        spark,
        [(1, "alpha beta gamma more words here"), (2, "unrelated text entirely new")],
    )
    a = sorted(map(tuple, contamination_check(cand, bench, "doc_id", "text").collect()))
    b = sorted(
        map(
            tuple,
            contamination_check(
                cand, bench, "doc_id", "text", broadcast_benchmark=False
            ).collect(),
        )
    )
    assert a == b


def test_contamination_prefiltered_matches_broadcast(spark, sf_smoke):
    """The bucket-bloom prefilter path must be bit-identical to the
    broadcast path — the prefilter only admits false positives, which the
    exact join resolves."""
    from meshinsights_data_pipeline_spark.operators.corpus import (
        contamination_check,
        contamination_check_prefiltered,
    )
    from meshinsights_data_pipeline_spark.session import read_table

    docs = read_table(spark, sf_smoke, "documents")
    bench = docs.filter(F.col("source") == "src0")
    cand = docs.filter(F.col("source") != "src0")
    a = {tuple(r) for r in contamination_check(cand, bench, "doc_id", "text").collect()}
    # tiny bucket space (8 bits) forces heavy false-positive collisions —
    # the exact join must still resolve them all
    b = {
        tuple(r)
        for r in contamination_check_prefiltered(
            cand, bench, "doc_id", "text", bucket_bits=8
        ).collect()
    }
    assert len(a) > 0
    assert a == b


def test_pack_sequences_greedy_fill(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import pack_sequences

    rows = [("s0", 1, 0, 60), ("s0", 1, 1, 60), ("s0", 2, 0, 30),
            ("s0", 3, 0, 60), ("s1", 9, 0, 10)]
    df = spark.createDataFrame(
        rows, "source string, doc_id long, chunk_id long, n_tokens long"
    )
    out = {
        (r.doc_id, r.chunk_id): (r.seq_id, r.tok_offset)
        for r in pack_sequences(
            df, ["source"], ["doc_id", "chunk_id"], "n_tokens", budget=128
        ).collect()
    }
    # cumsums in s0: 0, 60, 120, 150 -> seqs 0,0,0,1; s1 restarts at 0
    assert out[(1, 0)] == (0, 0)
    assert out[(1, 1)] == (0, 60)
    assert out[(2, 0)] == (0, 120)  # straddles the boundary, starts in seq 0
    assert out[(3, 0)] == (1, 22)   # 150 -> seq 1, offset 150-128
    assert out[(9, 0)] == (0, 0)    # separate partition


def test_dataset_split_deterministic_and_weighted(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import dataset_split

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = dataset_split(df, "doc_id")
    again = {r.doc_id: r.split for r in dataset_split(df, "doc_id").collect()}
    rows = out.collect()
    assert {r.doc_id: r.split for r in rows} == again  # pure function of id
    frac = sum(1 for r in rows if r.split == "train") / len(rows)
    assert 0.95 < frac < 1.0
    assert {r.split for r in rows} == {"train", "val", "test"}
    assert all(r.split == ("train" if r.bucket < 98 else "val" if r.bucket < 99 else "test") for r in rows)
    with pytest.raises(ValueError, match="sum"):
        dataset_split(df, "doc_id", weights={"train": 50})


def test_vocabulary_counts_and_tiebreak(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import vocabulary

    df = spark.createDataFrame(
        [("b a a c",), ("B? c!",)], "t string"
    )
    rows = vocabulary(df, "t", top_n=3).collect()
    # counts: a=2, b=2 (B? normalizes), c=2 -> all tied, token-asc order
    assert [(r.token, r.cnt) for r in rows] == [("a", 2), ("b", 2), ("c", 2)]


def test_repetition_signals(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "buy now buy now buy now buy now"),   # heavy repetition
            (2, "one two three four five six seven"), # all distinct 2-grams
            (3, "word"),                               # degenerate (<2 tokens)
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_signals(df, "doc_id", "text").collect()}
    # doc 1: 7 bigram occurrences, 2 distinct ("buy now" x4, "now buy" x3)
    assert out[1].total_ngrams == 7 and out[1].distinct_ngrams == 2
    assert out[1].dup_fraction > 0.7 and out[1].top_fraction > 0.5
    assert out[2].dup_fraction == 0.0
    assert out[3].total_ngrams == 1 and out[3].dup_fraction == 0.0


def test_gap_fill_forward_fill(spark):
    from datetime import datetime

    from meshinsights_data_pipeline_spark.operators.rollup import gap_fill

    rows = [
        ("u1", datetime(2024, 1, 1, 0, 10), 1.0),
        ("u1", datetime(2024, 1, 1, 0, 50), 2.0),   # same hour -> MAX = 2.0
        ("u1", datetime(2024, 1, 1, 3, 5), 5.0),    # hours 1,2 are gaps
        ("u2", datetime(2024, 1, 1, 7, 0), 9.0),    # single point
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        (r.k, r.bucket.hour): (r.v_filled, r.was_observed)
        for r in gap_fill(df, "ts", ["k"], "v", unit="hour").collect()
    }
    assert out[("u1", 0)] == (2.0, True)
    assert out[("u1", 1)] == (2.0, False)   # carried forward
    assert out[("u1", 2)] == (2.0, False)
    assert out[("u1", 3)] == (5.0, True)
    assert out[("u2", 7)] == (9.0, True)
    assert len(out) == 5  # u1 spans 4 buckets, u2 spans 1


def test_profile_columns_single_pass(spark):
    from meshinsights_data_pipeline_spark.operators.stats import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "a")], "x long, s string"
    )
    out = {r.col_name: (r.n_rows, r.n_nulls, r.n_distinct)
           for r in profile_columns(df, ["x", "s"]).collect()}
    assert out["x"] == (4, 1, 2)
    assert out["s"] == (4, 1, 2)
    # approx=True is the 100 TB path: HLL counters, no Expand node
    # replicating input rows (exact multi-distinct plans one).
    approx = profile_columns(df, ["x", "s"], approx=True)
    got = {r.col_name: (r.n_rows, r.n_nulls, r.n_distinct)
           for r in approx.collect()}
    assert got["x"] == (4, 1, 2)  # HLL is exact at this cardinality
    assert got["s"] == (4, 1, 2)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    exact_plan = (profile_columns(df, ["x", "s"])
                  ._jdf.queryExecution().executedPlan().toString())
    assert "Expand" in exact_plan


def test_boilerplate_ngrams(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import boilerplate_ngrams

    df = spark.createDataFrame(
        [
            (1, "hello world foo"),
            (2, "hello world bar"),
            (3, "unique text here"),
            (4, "single"),  # < n tokens -> whole text as its one gram
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_grams, r.n_boiler, r.boiler_frac)
           for r in boilerplate_ngrams(df, "doc_id", "text", n=2, min_docs=2).collect()}
    # "hello world" is shared by docs 1 and 2 -> boilerplate at min_docs=2.
    assert out[1] == (2, 1, 0.5)
    assert out[2] == (2, 1, 0.5)
    assert out[3] == (2, 0, 0.0)
    assert out[4] == (1, 0, 0.0)


def test_shuffle_shards(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import shuffle_shards

    df = spark.range(1000).toDF("doc_id")
    out = shuffle_shards(df, "doc_id", n_shards=4, seed=0).collect()
    assert len(out) == 1000
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) == {0, 1, 2, 3}
    # pos is a contiguous 0-based sequence inside each shard
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    # hash-balanced: no shard dominates
    sizes = sorted(len(v) for v in by_shard.values())
    assert sizes[0] > 150
    # deterministic: identical output across runs, full reshuffle on new seed
    again = shuffle_shards(df, "doc_id", n_shards=4, seed=0).collect()
    assert {(r.doc_id, r.shard, r.pos) for r in again} == {
        (r.doc_id, r.shard, r.pos) for r in out
    }
    reseeded = shuffle_shards(df, "doc_id", n_shards=4, seed=1).collect()
    assert {(r.doc_id, r.shard) for r in reseeded} != {
        (r.doc_id, r.shard) for r in out
    }


def test_new_ops_empty_inputs(spark):
    """Empty corpus in -> empty (not crashed) out, for every operator a
    conditional pipeline step can feed an empty survivor frame."""
    from meshinsights_data_pipeline_spark.operators.corpus import (
        boilerplate_ngrams,
        shuffle_shards,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert boilerplate_ngrams(empty, "doc_id", "text").count() == 0
    assert shuffle_shards(empty, "doc_id", n_shards=4).count() == 0


def test_mixture_sample_semantics(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import mixture_sample

    # src_a: 4000 tokens, src_b: 1000 tokens; want a 1:1 token mixture.
    # Binding source is src_b (1000/1 < 4000/1) -> kept (nearly) whole;
    # src_a thinned to ~1000 tokens.
    rows = [(i, "src_a", 10) for i in range(400)] + [
        (1000 + i, "src_b", 10) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    out = mixture_sample(
        df, "source", "n_tok", {"src_a": 1.0, "src_b": 1.0}, "doc_id", seed=0
    )
    toks = {r.source: r.t for r in
            out.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()}
    assert toks["src_b"] >= 990  # binding source ~whole (floor can drop <=1 doc)
    # thinned source lands near the 1000-token target (Bernoulli spread)
    assert 600 <= toks["src_a"] <= 1400
    # determinism + reseed changes the draw
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in mixture_sample(
        df, "source", "n_tok", {"src_a": 1.0, "src_b": 1.0}, "doc_id", seed=0
    ).collect()}
    c = {r.doc_id for r in mixture_sample(
        df, "source", "n_tok", {"src_a": 1.0, "src_b": 1.0}, "doc_id", seed=7
    ).collect()}
    assert a == b and a != c
    # allowlist: unweighted sources are dropped entirely
    only_b = mixture_sample(df, "source", "n_tok", {"src_b": 1.0}, "doc_id")
    assert {r.source for r in only_b.collect()} == {"src_b"}


def test_profile_numeric(spark):
    from meshinsights_data_pipeline_spark.operators.stats import profile_numeric

    df = spark.createDataFrame(
        [(1.0, 10), (2.0, None), (3.0, 30), (None, 40)], "x double, y long"
    )
    out = {r.col_name: r for r in profile_numeric(df, ["x", "y"]).collect()}
    assert (out["x"].n, out["x"].n_null) == (3, 1)
    assert (out["x"].vmin, out["x"].vmax, out["x"].vmean) == (1.0, 3.0, 2.0)
    assert out["x"].p50 == 2.0
    assert out["y"].p50 == 30.0  # interpolated median of [10, 30, 40]
    # approx tier keeps the same shape; GK at this size is exact too
    ap = {r.col_name: r.p50 for r in
          profile_numeric(df, ["x", "y"], approx=True).collect()}
    assert ap["x"] == 2.0


def test_duplicate_spans_semantics(spark):
    """Hand-built corpus: a phrase shared by two docs yields one merged
    span per doc; a phrase repeated only WITHIN one doc does not qualify
    (cross-doc distinct count drives the cut); non-overlapping shared
    phrases in one doc stay separate spans."""
    from meshinsights_data_pipeline_spark.operators.corpus import duplicate_spans

    shared = "alpha beta gamma delta epsilon zeta"        # 6 toks -> 2 grams
    inner = "one two three four five one two three four five"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} filler1 w x y z {shared}"),     # shared twice, apart
            (2, f"start pad {shared} tail"),               # shared once
            (3, inner),                                    # within-doc repeat only
            (4, "nothing in common here at all ok"),
        ],
        "doc_id long, text string",
    )
    out = duplicate_spans(docs, "doc_id", "text", n=5, min_docs=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end, r.dup_grams))
    # doc 3's internal repetition is not cross-document -> no spans
    assert 3 not in by_doc and 4 not in by_doc
    # doc 1: two occurrences of the 6-token phrase, separated by 5 fillers
    # -> two disjoint spans, each 2 grams wide covering 6 tokens
    assert sorted(by_doc[1]) == [(0, 6, 2), (11, 17, 2)]
    # doc 2: one span over tokens 2..8
    assert by_doc[2] == [(2, 8, 2)]


def test_excise_spans_edges(spark):
    """Full-doc excision yields empty clean_text; span-free docs pass
    through untouched; counts reconcile with token totals."""
    from meshinsights_data_pipeline_spark.operators.corpus import (
        duplicate_spans,
        excise_spans,
    )

    shared = "alpha beta gamma delta epsilon"          # exactly 5 tokens
    docs = spark.createDataFrame(
        [(1, shared), (2, shared), (3, f"keep {shared} keep2"),
         (4, "independent text with no twin")],
        "doc_id long, text string",
    )
    spans = duplicate_spans(docs, "doc_id", "text", n=5, min_docs=2)
    out = {r.doc_id: r for r in excise_spans(docs, spans, "doc_id", "text").collect()}
    assert out[1].clean_text == "" and out[1].n_removed == 5
    assert out[2].clean_text == "" and out[2].n_removed == 5
    assert out[3].clean_text == "keep keep2" and out[3].n_removed == 5
    assert out[4].clean_text == "independent text with no twin"
    assert out[4].n_removed == 0


def test_positional_shingles_n1_and_invalid(spark):
    """n=1 degenerates to per-token hashes (was an unresolved-column crash);
    n=0 raises; duplicate_spans works end-to-end at n=1."""
    from meshinsights_data_pipeline_spark.operators.corpus import (
        duplicate_spans,
        positional_shingle_hashes,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    rows = positional_shingle_hashes(df, "doc_id", "text", n=1).collect()
    assert len(rows) == 4 and all(r.h is not None for r in rows)
    spans = duplicate_spans(df, "doc_id", "text", n=1, min_docs=2).collect()
    # "beta" is shared: doc1 tokens[1:2], doc2 tokens[0:1]
    got = {(r.doc_id, r.span_start, r.span_end) for r in spans}
    assert got == {(1, 1, 2), (2, 0, 1)}
    import pytest as pt

    with pt.raises(ValueError, match="shingle width"):
        positional_shingle_hashes(df, "doc_id", "text", n=0)


def test_corpus_report_approx_tier(spark):
    """approx=True (HLL++ distinct) keeps the schema and, at unit size,
    the exact values — the stats.py exact-beside-approx pattern."""
    from meshinsights_data_pipeline_spark.operators.corpus import corpus_report

    docs = spark.createDataFrame(
        [(1, "a b c", "s0"), (2, "a b c", "s0"), (3, "x y z", "s1")],
        "doc_id long, text string, source string",
    )
    exact = {r.source: r for r in corpus_report(docs).collect()}
    ap = {r.source: r for r in corpus_report(docs, approx=True).collect()}
    assert exact.keys() == ap.keys()
    for s in exact:
        assert exact[s].n_docs == ap[s].n_docs
        assert exact[s].n_distinct == ap[s].n_distinct  # HLL exact at tiny n


def test_lm_quality_score_hand_computed(spark):
    """Add-one bigram LM checked against hand arithmetic. Corpus:
    "a b a b" + "a b" + "solo" -> V=3 (the 1-token doc gets no score but
    its token DOES count toward the vocabulary and unigram table),
    unigrams a:3 b:3 solo:1, bigrams (a,b):3 (b,a):1.
    P(b|a)=(3+1)/(3+3)=2/3, P(a|b)=(1+1)/(3+3)=1/3."""
    import math

    from meshinsights_data_pipeline_spark.operators.corpus import lm_quality_score

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "solo")],  # 1-token doc: no score
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in lm_quality_score(docs, "doc_id", "text").collect()}
    assert sorted(rows) == [1, 2]  # the 1-token doc has no bigrams
    avg1 = (math.log(2 / 3) + math.log(1 / 3) + math.log(2 / 3)) / 3
    assert rows[1].n_bigrams == 3
    assert rows[1].avg_logp == round(avg1, 6)
    assert rows[1].ppl == round(math.exp(-avg1), 2)
    assert rows[2].n_bigrams == 1
    assert rows[2].avg_logp == round(math.log(2 / 3), 6)
    assert rows[2].ppl == 1.5
    # the filter signal orders as expected: the doc made of the corpus's
    # dominant bigram scores lower perplexity than the mixed one
    assert rows[2].ppl < rows[1].ppl


def test_weighted_sample_aes_arithmetic(spark):
    """A-ES ordering recomputed row-by-row in Python (same md5-60bit
    uniform, same ln(u)/w key) must match the operator's sample exactly;
    non-positive weights are excluded; n bounds the sample."""
    import hashlib
    import math

    from meshinsights_data_pipeline_spark.operators.corpus import weighted_sample

    rows = [(i, [0.5, 1.0, 2.0, 4.0][i % 4]) for i in range(40)]
    rows += [(100, 0.0), (101, -1.0)]  # excluded
    df = spark.createDataFrame(rows, "doc_id long, w double")

    def key(doc_id, w):
        h = int(hashlib.md5(f"{doc_id}aes".encode()).hexdigest()[:15], 16)
        return round(math.log((h + 1) / float(1 << 60)) / w, 9)

    expected = sorted(
        ((key(i, w), i, w) for i, w in rows if w > 0),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    got = [(r.key, r.doc_id, r.weight)
           for r in weighted_sample(df, "doc_id", "w", n=10).collect()]
    assert got == [(k, i, w) for k, i, w in expected]
    assert all(i not in (100, 101) for _, i, _ in got)

    import pytest

    with pytest.raises(ValueError, match="positive"):
        weighted_sample(df, "doc_id", "w", n=0)


# ---------------------------------------------------------------- line_dedup


def _line_docs(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import line_dedup  # noqa

    rows = [
        (1, "COOKIE BANNER\nreal content one\nFOOTER"),
        (2, "COOKIE BANNER\nreal content two\nFOOTER"),
        (3, "COOKIE BANNER\nunique line\nunique line\nFOOTER"),
        (4, "COOKIE BANNER\nFOOTER"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_line_dedup_removes_cross_doc_boilerplate(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import line_dedup

    out = {
        r.doc_id: r
        for r in line_dedup(
            _line_docs(spark), "doc_id", "text", min_doc_freq=4
        ).collect()
    }
    # COOKIE BANNER and FOOTER occur in all 4 docs -> removed everywhere.
    assert out[1].clean_text == "real content one"
    assert out[2].clean_text == "real content two"
    assert out[1].n_lines_removed == 2 and out[1].n_lines_kept == 1


def test_line_dedup_keeps_within_doc_repeats_and_order(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import line_dedup

    out = {
        r.doc_id: r
        for r in line_dedup(
            _line_docs(spark), "doc_id", "text", min_doc_freq=4
        ).collect()
    }
    # 'unique line' twice in doc 3 only: df=1 < 4, BOTH instances kept,
    # original order preserved.
    assert out[3].clean_text == "unique line\nunique line"
    assert out[3].n_lines_kept == 2


def test_line_dedup_fully_boilerplate_doc_survives_as_empty(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import line_dedup

    out = {
        r.doc_id: r
        for r in line_dedup(
            _line_docs(spark), "doc_id", "text", min_doc_freq=4
        ).collect()
    }
    assert out[4].clean_text == "" and out[4].n_lines_kept == 0
    assert out[4].n_lines_removed == 2
    assert len(out) == 4  # every input doc present exactly once


def test_line_dedup_frac_and_broadcast_match_freq_path(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import line_dedup

    docs = _line_docs(spark)
    base = sorted(
        line_dedup(docs, "doc_id", "text", min_doc_freq=4).collect()
    )
    # df=4 of 4 docs -> frac 1.0 selects the same boilerplate set.
    frac = sorted(
        line_dedup(docs, "doc_id", "text", min_doc_frac=1.0).collect()
    )
    bcast = sorted(
        line_dedup(
            docs, "doc_id", "text", min_doc_freq=4, broadcast_lines=True
        ).collect()
    )
    assert base == frac == bcast


def test_line_dedup_requires_exactly_one_threshold(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import line_dedup

    docs = _line_docs(spark)
    with pytest.raises(ValueError):
        line_dedup(docs, "doc_id", "text")
    with pytest.raises(ValueError):
        line_dedup(docs, "doc_id", "text", min_doc_freq=2, min_doc_frac=0.5)


# -------------------------------------------------------------- source_drift


def test_source_drift_identical_sources_zero_drift(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import source_drift

    rows = [(1, "a", "x y z"), (2, "b", "x y z")]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r.source: r for r in source_drift(df, "source", "text").collect()}
    assert out["a"].tv_distance == 0.0 and out["b"].tv_distance == 0.0
    assert out["a"].chi_square == 0.0
    assert out["a"].n_tokens == 3


def test_source_drift_disjoint_sources_max_drift(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import source_drift

    # disjoint vocabularies, equal mass -> TV = 1 - overlap = 0.5 here:
    # each source holds half the corpus mass, sharing nothing.
    rows = [(1, "a", "x x"), (2, "b", "y y")]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r.source: r for r in source_drift(df, "source", "text").collect()}
    # p_a = {x:1}, q = {x:.5, y:.5}; TV = .5*(|1-.5|+|0-.5|) = 0.5 —
    # the |0 - q| missing-mass term MUST be counted for this to hold.
    assert out["a"].tv_distance == 0.5 and out["b"].tv_distance == 0.5


def test_source_drift_stays_jvm_side(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import source_drift

    rows = [(1, "a", "x y"), (2, "b", "y z")]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    p = source_drift(df, "source", "text")._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p  # the grid cross join is broadcast


def test_dsir_weights_orders_by_target_similarity(spark):
    """Docs drawn from the target distribution must out-score docs from a
    disjoint vocabulary: DSIR's defining property. Also pins the smoothing
    floor: a bucket unseen in the target gets a finite negative weight."""
    from meshinsights_data_pipeline_spark.operators.corpus import dsir_weights

    target = spark.createDataFrame(
        [(100 + i, "the quick brown fox jumps over the lazy dog") for i in range(4)],
        ["doc_id", "text"],
    )
    raw = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # = target
            (2, "zulu xray yankee victor whiskey uniform tango sierra"),  # disjoint
            (3, "the quick brown fox visits zulu xray yankee victor"),  # mixed
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in dsir_weights(raw, target, "doc_id", "text").collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].dsir_logw > rows[3].dsir_logw > rows[2].dsir_logw
    assert rows[1].dsir_logw > 0  # matches target better than the raw mix
    assert rows[2].dsir_logw < 0  # pure off-target: negative log-ratio
    assert rows[1].n_bigrams == 8


def test_dsir_weights_single_token_docs_absent(spark):
    """<2 tokens -> no bigrams -> no evidence -> no row (documented)."""
    from meshinsights_data_pipeline_spark.operators.corpus import dsir_weights

    target = spark.createDataFrame([(10, "a b c")], ["doc_id", "text"])
    raw = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "a b")], ["doc_id", "text"]
    )
    got = {r.doc_id for r in dsir_weights(raw, target, "doc_id", "text").collect()}
    assert got == {3}


def test_stratified_sample_hamilton_allocation(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import (
        stratified_sample,
    )

    # strata a:5, b:3, c:2 (N=10); total=7 -> shares 3.5/2.1/1.4,
    # bases 3/2/1 (sum 6), remainders 5/1/4 -> the one extra goes to a
    rows = [(i, "a") for i in range(5)] + [(10 + i, "b") for i in range(3)] + [
        (20 + i, "c") for i in range(2)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, "lang", "doc_id", 7).collect()
    by = {}
    for r in out:
        by.setdefault(r.lang, []).append((r.pick, r.doc_id))
    assert {k: len(v) for k, v in by.items()} == {"a": 4, "b": 2, "c": 1}
    assert len(out) == 7
    # picks are dense 1..quota per stratum
    for v in by.values():
        assert sorted(p for p, _ in v) == list(range(1, len(v) + 1))
    # determinism: same call -> same ids; different seed -> same SIZES
    again = stratified_sample(df, "lang", "doc_id", 7).collect()
    assert sorted((r.lang, r.doc_id) for r in again) == sorted(
        (r.lang, r.doc_id) for r in out
    )
    other = stratified_sample(df, "lang", "doc_id", 7, seed="zz").collect()
    assert len(other) == 7
    by2 = {}
    for r in other:
        by2.setdefault(r.lang, []).append(r.doc_id)
    assert {k: len(v) for k, v in by2.items()} == {"a": 4, "b": 2, "c": 1}
    # total == N keeps everything
    assert len(stratified_sample(df, "lang", "doc_id", 10).collect()) == 10


def test_temperature_mixture_sample(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import (
        stratified_sample,
        temperature_mixture_sample,
    )

    # strata a:64, b:16, c:4 -> sqrt weights 8/4/2 (ratios 4:2:1) vs raw
    # proportions 16:4:1 — temperature visibly upsamples the small strata
    rows = ([(i, "a") for i in range(64)] + [(100 + i, "b") for i in range(16)]
            + [(200 + i, "c") for i in range(4)])
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_mixture_sample(df, "lang", "doc_id", 14, alpha=0.5).collect()
    sizes = {}
    for r in out:
        sizes[r.lang] = sizes.get(r.lang, 0) + 1
    # shares 14 * (8,4,2)/14 = 8/4/2 exactly
    assert sizes == {"a": 8, "b": 4, "c": 2}
    # alpha=1 reproduces stratified_sample exactly (same rows, same picks)
    t1 = sorted((r.lang, r.doc_id, r.pick)
                for r in temperature_mixture_sample(df, "lang", "doc_id", 14,
                                                    alpha=1.0).collect())
    s1 = sorted((r.lang, r.doc_id, r.pick)
                for r in stratified_sample(df, "lang", "doc_id", 14).collect())
    assert t1 == s1
    # quota caps at stratum size: tiny stratum saturates, result undershoots
    out2 = temperature_mixture_sample(df, "lang", "doc_id", 80, alpha=0.5)
    sizes2 = {}
    for r in out2.collect():
        sizes2[r.lang] = sizes2.get(r.lang, 0) + 1
    assert sizes2["c"] == 4               # capped at |c|
    assert sum(sizes2.values()) <= 80
    # picks dense 1..quota
    for r in out:
        assert r.pick >= 1


def test_line_repetition_signals(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import (
        line_repetition_signals,
    )

    text = "foo bar\nfoo bar\n- item\n- item\nend ...\n\n  \nfoo bar"
    df = spark.createDataFrame(
        [(1, text), (2, ""), (3, "* x\nsnip…")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_repetition_signals(df, "doc_id", "text").collect()}
    # doc 1: 6 non-empty lines, 3 distinct ("foo bar" x3, "- item" x2, "end ...")
    r1 = out[1]
    assert (r1.n_lines, r1.distinct_lines) == (6, 3)
    assert r1.dup_line_frac == pytest.approx(0.5)          # (6-3)/6
    assert r1.dup_char_frac == pytest.approx(0.5)          # (40-20)/40
    assert r1.bullet_frac == pytest.approx(round(2 / 6, 6))
    assert r1.ellipsis_frac == pytest.approx(round(1 / 6, 6))
    # doc 2: no non-empty lines -> NULL fractions, zero counts
    r2 = out[2]
    assert r2.n_lines == 0
    assert r2.dup_line_frac is None and r2.dup_char_frac is None
    assert r2.bullet_frac is None and r2.ellipsis_frac is None
    # doc 3: '*' bullet and unicode ellipsis both recognized
    r3 = out[3]
    assert r3.bullet_frac == pytest.approx(0.5)
    assert r3.ellipsis_frac == pytest.approx(0.5)


def test_line_repetition_signals_crlf(spark):
    """CRLF corpora must not grow phantom '\\r' lines or defeat the
    ellipsis suffix match."""
    from meshinsights_data_pipeline_spark.operators.corpus import (
        line_repetition_signals,
    )

    df = spark.createDataFrame(
        [(1, "a ...\r\na ...\r\n\r\n\tb\t\r\n")],
        "doc_id long, text string",
    )
    r = line_repetition_signals(df, "doc_id", "text").first()
    assert (r.n_lines, r.distinct_lines) == (3, 2)   # "a ...", "a ...", "b"
    assert r.ellipsis_frac == pytest.approx(round(2 / 3, 6))
    assert r.dup_line_frac == pytest.approx(round(1 / 3, 6))


def test_stratified_quota_product_survives_bigint_overflow(spark):
    """The quota arithmetic's t * n_h product routes through
    DECIMAL(38,0): at 100 TB both factors can be billions and the BIGINT
    product silently wraps past 2^63 in non-ANSI mode. This pins the
    exact expression stratified_sample uses, at factors whose product
    exceeds 2^63 (can't be staged as real rows in a test)."""
    from pyspark.sql import functions as F

    t, n_h, n = 9_000_000_000, 4_000_000_000, 12_000_000_000
    assert t * n_h > 2**63  # the wrap territory the fix covers
    df = spark.createDataFrame([(n_h, n)], "n_h long, n long")
    row = df.select(
        F.expr(
            f"CAST((CAST({t} AS DECIMAL(38,0)) * n_h) div n AS BIGINT)"
        ).alias("base"),
        F.expr(
            f"CAST((CAST({t} AS DECIMAL(38,0)) * n_h) % n AS BIGINT)"
        ).alias("rem"),
    ).first()
    assert row.base == (t * n_h) // n
    assert row.rem == (t * n_h) % n


def test_lexical_diversity_zipf_slope(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import (
        lexical_diversity,
    )

    # zipf source: term ti appears floor(60/i) times; uniform: 6 x 20
    rows = []
    for i in range(1, 7):
        rows += [("zipf", f"t{i}")] * (60 // i)
        rows += [("unif", f"t{i}")] * 20
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r.source: r for r in lexical_diversity(df, "source", "text").collect()}

    import math

    def slope(freqs):
        pts = [(math.log(r), math.log(c))
               for r, c in enumerate(sorted(freqs, reverse=True), start=1)]
        k = len(pts)
        sx, sy = sum(x for x, _ in pts), sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        return round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)

    zipf_freqs = [60 // i for i in range(1, 7)]
    assert out["zipf"].n_tokens == sum(zipf_freqs)
    assert out["zipf"].vocab == 6
    assert out["zipf"].zipf_slope == pytest.approx(slope(zipf_freqs), abs=1e-6)
    assert out["zipf"].zipf_slope < -0.8      # Zipfian: steep head
    assert out["unif"].zipf_slope == 0.0      # flat: no rank dependence
    assert out["unif"].ttr == pytest.approx(6 / 120, abs=1e-6)
    assert out["unif"].top_share == pytest.approx(20 / 120, abs=1e-6)


def test_lexical_diversity_single_term_vocab_null_slope(spark):
    """k=1 (one-term vocabulary) has no regression slope: the closed form
    degenerates to 0/0, which Spark renders NaN and DuckDB renders per
    its ieee setting — the operator must emit deterministic NULL."""
    from meshinsights_data_pipeline_spark.operators.corpus import (
        lexical_diversity,
    )

    df = spark.createDataFrame(
        [("mono", "word word word"), ("duo", "aa bb aa")],
        "source string, text string",
    )
    out = {r.source: r for r in lexical_diversity(df, "source", "text").collect()}
    assert out["mono"].vocab == 1
    assert out["mono"].zipf_slope is None
    assert out["duo"].zipf_slope is not None


def test_url_host_blocklist_suffix_semantics(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import (
        url_host_blocklist,
    )

    df = spark.createDataFrame(
        [
            (1, "https://bad.com/x"),                   # exact
            (2, "http://www.bad.com/y"),                # subdomain
            (3, "https://a.b.BAD.com:8080/z?q=1"),      # deep + port + case
            (4, "https://notbad.com/x"),                # suffix must be label-aligned
            (5, "https://bad.com.evil.org/x"),          # bad.com as PREFIX, not suffix
            (6, "https://fine.org/x"),
        ],
        "id long, url string",
    )
    out = {r.id: r.blocked_by for r in
           url_host_blocklist(df, "id", "url", ["bad.com", "www.bad.com"]).collect()}
    assert out == {1: "bad.com", 2: "bad.com", 3: "bad.com"}
    # list-form entries normalize too (padding/case from readlines())
    outp = {r.id for r in
            url_host_blocklist(df, "id", "url", ["  BAD.com \n"]).collect()}
    assert outp == {1, 2, 3}
    # frame-form blocklist behaves identically — including entries a real
    # UT1 dump would ship dirty (mixed case, padding, duplicates), which
    # must normalize to the list form's matching contract
    bl = spark.createDataFrame(
        [("bad.com",), ("  BAD.com ",), ("Bad.COM",)], "domain string"
    )
    out2 = {r.id: r.blocked_by
            for r in url_host_blocklist(df, "id", "url", bl).collect()}
    assert out2 == {1: "bad.com", 2: "bad.com", 3: "bad.com"}


def test_chat_render_order_and_counts(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import chat_render

    rows = [
        # deliberately out of order; c2 ties on seq with c2/seq1 dup key? no:
        # unique (seq) per convo; input order scrambled
        ("c1", 2, "assistant", "hi there"),
        ("c1", 1, "user", "hello"),
        ("c1", 3, "user", "thanks"),
        ("c2", 1, "assistant", "solo"),
    ]
    df = spark.createDataFrame(rows, "cid string, seq int, role string, content string")
    out = {r.cid: r for r in chat_render(df, "cid", ["seq"]).collect()}
    assert out["c1"].n_turns == 3 and out["c1"].n_user_turns == 2
    assert out["c1"].rendered == (
        "<|im_start|>user\nhello<|im_end|>\n"
        "<|im_start|>assistant\nhi there<|im_end|>\n"
        "<|im_start|>user\nthanks<|im_end|>"
    )
    assert out["c2"].n_turns == 1 and out["c2"].n_user_turns == 0
    assert out["c2"].rendered == "<|im_start|>assistant\nsolo<|im_end|>"
    # custom markers
    alt = chat_render(df, "cid", ["seq"], turn_open="[", turn_close="]")
    assert {r.cid: r.rendered for r in alt.collect()}["c2"] == "[assistant\nsolo]"


def test_chat_render_null_turn_kept_in_render(spark):
    """A NULL role or content must not silently vanish from the rendered
    string while n_turns still counts the turn — render and counts agree."""
    from meshinsights_data_pipeline_spark.operators.corpus import chat_render

    df = spark.createDataFrame(
        [("c1", 1, "user", "hi"), ("c1", 2, None, "orphan"),
         ("c1", 3, "assistant", None)],
        "cid string, seq int, role string, content string",
    )
    row = chat_render(df, "cid", ["seq"]).first()
    assert row.n_turns == 3
    assert row.rendered == (
        "<|im_start|>user\nhi<|im_end|>\n"
        "<|im_start|>\norphan<|im_end|>\n"
        "<|im_start|>assistant\n<|im_end|>"
    )
    assert row.rendered.count("<|im_start|>") == row.n_turns


def test_gram_novelty_fractions(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import gram_novelty

    df = spark.createDataFrame(
        [
            (1, "a b c d"),   # grams {a b c, b c d}; first shared with doc 2
            (2, "a b c e"),   # grams {a b c, b c e}
            (3, "x y z w"),   # fully novel
            (4, "hi"),        # < n tokens -> whole text is the one gram
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_grams, r.novel_frac)
           for r in gram_novelty(df, "doc_id", "text").collect()}
    assert out[1] == (2, 0.5)
    assert out[2] == (2, 0.5)
    assert out[3] == (2, 1.0)
    assert out[4] == (1, 1.0)


def test_triangle_counts_known_graphs(spark):
    from meshinsights_data_pipeline_spark.operators.graph import triangle_counts

    # K4 (every node in 3 triangles) + a triangle-free path + noise the
    # canonicalization must absorb: a reversed duplicate and a self-loop
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(
        k4 + [(10, 11), (11, 12)] + [(1, 0), (2, 2)], "src long, dst long"
    )
    out = {r.node: r.triangles for r in triangle_counts(df).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}  # path nodes absent (0 triangles)
    # two triangles sharing an edge: shared nodes count both
    df2 = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4)], "src long, dst long"
    )
    out2 = {r.node: r.triangles for r in triangle_counts(df2).collect()}
    assert out2 == {1: 1, 2: 2, 3: 2, 4: 1}


def test_gap_fill_interpolate_values(spark):
    from datetime import datetime

    from meshinsights_data_pipeline_spark.operators.rollup import (
        gap_fill_interpolate,
    )

    rows = [
        ("k", datetime(2024, 1, 1, 0, 30), 10.0),   # bucket 00 -> 10
        ("k", datetime(2024, 1, 1, 3, 10), 40.0),   # bucket 03 -> 40
        ("k", datetime(2024, 1, 1, 5, 5), 20.0),    # bucket 05 -> 20
        # second key: single observation -> grid of one, no interpolation
        ("solo", datetime(2024, 1, 1, 7, 0), 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {(r.k, r.bucket.hour): (r.v_interp, r.was_observed)
           for r in gap_fill_interpolate(df, "ts", ["k"], "value").collect()}
    assert out[("k", 0)] == (10.0, True)
    assert out[("k", 1)] == (20.0, False)   # 1/3 of the way 10 -> 40
    assert out[("k", 2)] == (30.0, False)
    assert out[("k", 3)] == (40.0, True)
    assert out[("k", 4)] == (30.0, False)   # midpoint 40 -> 20
    assert out[("k", 5)] == (20.0, True)
    assert out[("solo", 7)] == (5.0, True)
    assert len(out) == 7


def test_basket_pair_stats(spark):
    from meshinsights_data_pipeline_spark.operators.basket import (
        basket_pair_stats,
    )

    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z"),
            (4, "z"), (1, "x")]  # duplicate (1, x) must collapse
    df = spark.createDataFrame(rows, "b long, i string")
    out = {(r.item_a, r.item_b): r
           for r in basket_pair_stats(df, "b", "i", 2).collect()}
    r = out[("x", "y")]
    # n_ab=2 of 4 baskets; n_x=3, n_y=2
    assert (r.n_ab, r.support) == (2, 0.5)
    assert r.confidence_a_b == pytest.approx(round(2 / 3, 6))
    assert r.lift == pytest.approx(round(2 * 4 / (3 * 2), 6))
    # support-1 pairs filtered by min_support_count=2
    assert ("x", "z") not in out and ("y", "z") not in out
    assert list(out) == [("x", "y")]


def test_basket_pair_stats_cap_and_nulls(spark):
    """r17 in-group rewrite invariants: max_basket_size drops an
    over-cap basket's PAIRS but keeps it in every denominator, and a
    null basket id contributes marginals but never pairs (the old
    self-join's equi-key semantics)."""
    from meshinsights_data_pipeline_spark.operators.basket import (
        basket_pair_stats,
    )

    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (2, "z"),
            (None, "x"), (None, "y"), (None, "y")]
    df = spark.createDataFrame(rows, "b long, i string")
    # uncapped: (x,y) co-occurs in baskets 1 and 2 (null never pairs)
    out = {(r.item_a, r.item_b): r
           for r in basket_pair_stats(df, "b", "i", 1).collect()}
    assert out[("x", "y")].n_ab == 2
    # n_baskets=2 (null excluded, as countDistinct did)
    assert out[("x", "y")].support == 1.0
    # marginals count the null basket's distinct items: n_x=3, n_y=3
    assert out[("x", "y")].confidence_a_b == pytest.approx(
        round(2 / 3, 6)
    )
    # cap=2 removes basket 2's pairs only; denominators unchanged
    capped = {(r.item_a, r.item_b): r
              for r in basket_pair_stats(
                  df, "b", "i", 1, max_basket_size=2).collect()}
    assert capped[("x", "y")].n_ab == 1
    assert ("x", "z") not in capped and ("y", "z") not in capped
    assert capped[("x", "y")].support == 0.5
    assert capped[("x", "y")].confidence_a_b == pytest.approx(
        round(1 / 3, 6)
    )


def test_histogram_fixed_width(spark):
    from meshinsights_data_pipeline_spark.operators.stats import (
        histogram_fixed_width,
    )

    df = spark.createDataFrame(
        [(float(v),) for v in [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10]] + [(None,)],
        "x double",
    )
    out = {r.bucket: r for r in histogram_fixed_width(df, "x", 5).collect()}
    # range [0,10], width 2: buckets 0..4; the max value (10) closes into
    # bucket 4; NULL excluded
    assert {b: r.n for b, r in out.items()} == {0: 2, 1: 2, 2: 2, 3: 2, 4: 3}
    assert out[0].lo == 0.0 and out[0].hi == 2.0
    assert out[4].lo == 8.0 and out[4].hi == 10.0
    # degenerate column: all values equal -> single bucket 0, no NaN
    same = spark.createDataFrame([(7.0,), (7.0,)], "x double")
    rows = histogram_fixed_width(same, "x", 4).collect()
    assert len(rows) == 1 and rows[0].bucket == 0 and rows[0].n == 2


def test_zscore_outliers(spark):
    from meshinsights_data_pipeline_spark.operators.stats import (
        zscore_outliers,
    )

    rows = ([("a", float(v)) for v in [10, 10, 10, 10, 10, 10, 10, 10, 10, 100]]
            + [("const", 5.0), ("const", 5.0)]      # zero variance -> excluded
            + [("solo", 1.0)])                       # n=1 -> excluded
    df = spark.createDataFrame(rows, "k string, value double")
    out = zscore_outliers(df, ["k"], "value", threshold=2.0).collect()
    assert {r.k for r in out} == {"a"}               # const/solo rows absent
    flagged = [r for r in out if r.is_outlier]
    assert [(r.k, r.value) for r in flagged] == [("a", 100.0)]
    # z of the planted outlier: mean 19, std 27 -> (100-19)/27 = 3.0
    assert flagged[0].z == pytest.approx(3.0)
    assert sum(1 for r in out if not r.is_outlier) == 9


def test_last_touch_attribution(spark):
    from datetime import datetime

    from meshinsights_data_pipeline_spark.operators.funnel import (
        last_touch_attribution,
    )

    t = datetime(2024, 1, 2, 12, 0)
    rows = [
        # user 1: two clicks before purchase -> latest wins; tie at the
        # same ts -> min event_id wins
        (10, datetime(2024, 1, 2, 10, 0), 1, "click", None),
        (11, datetime(2024, 1, 2, 11, 0), 1, "click", None),
        (12, datetime(2024, 1, 2, 11, 0), 1, "click", None),
        (13, t, 1, "purchase", None),
        # user 2: only click is 30h earlier -> outside lookback, NULLs
        (20, datetime(2024, 1, 1, 6, 0), 2, "click", None),
        (21, t, 2, "purchase", None),
        # user 3: no clicks at all -> NULLs
        (30, t, 3, "purchase", None),
        # user 4: click exactly at the purchase ts -> inclusive, gap 0
        (40, t, 4, "click", None),
        (41, t, 4, "purchase", None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double",
    )
    out = {r.conv_id: r for r in last_touch_attribution(
        df, "user_id", "ts", "event_type", "event_id").collect()}
    assert out[13].touch_id == 11 and out[13].gap_seconds == 3600
    assert out[21].touch_id is None and out[21].gap_seconds is None
    assert out[30].touch_id is None
    assert out[41].touch_id == 40 and out[41].gap_seconds == 0
    assert len(out) == 4  # every conversion present, attributed or not


def test_time_weighted_avg(spark):
    from datetime import datetime

    from meshinsights_data_pipeline_spark.operators.rollup import (
        time_weighted_avg,
    )

    rows = [
        # k: 10 held 1h, then 20 held 3h -> twa = (10*1 + 20*3)/4 = 17.5
        ("k", datetime(2024, 1, 1, 0, 0), 10.0),
        ("k", datetime(2024, 1, 1, 1, 0), 20.0),
        ("k", datetime(2024, 1, 1, 4, 0), 99.0),  # last point: 0 duration
        # solo: single observation spans no time -> excluded
        ("solo", datetime(2024, 1, 1, 0, 0), 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {r.k: r for r in time_weighted_avg(df, "ts", ["k"], "value").collect()}
    assert list(out) == ["k"]
    assert out["k"].span_seconds == 4 * 3600
    assert out["k"].twa_micros == 17_500_000  # 17.5 in micros, exact
    assert out["k"].t0 == datetime(2024, 1, 1, 0, 0)
    assert out["k"].t1 == datetime(2024, 1, 1, 4, 0)


def test_psi_drift(spark):
    import math

    from meshinsights_data_pipeline_spark.operators.stats import psi_drift

    # identical distributions -> PSI 0; a shifted group -> PSI > 0
    rows = ([("same", float(v)) for v in range(10)]
            + [("same2", float(v)) for v in range(10)]
            + [("hi", 9.0)] * 10)
    df = spark.createDataFrame(rows, "g string, x double")
    out = {r.g: r for r in psi_drift(df, "g", "x", buckets=10).collect()}
    assert out["same"].n == 10 and out["hi"].n == 10
    # "hi" concentrates all mass in the top bin: p=1 there, q=12/30
    expect_hi = (1 - 12 / 30) * math.log((10 * 30) / (12 * 10))
    assert out["hi"].psi == pytest.approx(round(expect_hi, 6), abs=1e-6)
    assert out["hi"].psi > 0.25          # "shifted" band
    # the two identical uniform groups have equal, small PSI
    assert out["same"].psi == out["same2"].psi
    assert out["same"].psi < out["hi"].psi


def test_windowed_exact_dedup(spark):
    from datetime import datetime

    from meshinsights_data_pipeline_spark.operators.dedup import (
        windowed_exact_dedup,
    )

    d = datetime
    rows = [
        # same key twice inside one 7-day window -> one survivor (earliest)
        (1, "k", d(2024, 1, 1, 10), ),
        (2, "k", d(2024, 1, 2, 10), ),
        # same key in the NEXT window -> re-allowed
        (3, "k", d(2024, 1, 9, 10), ),
        # tie on ts -> min id survives
        (4, "t", d(2024, 1, 1, 0), ),
        (5, "t", d(2024, 1, 1, 0), ),
    ]
    df = spark.createDataFrame(
        [(i, k, ts) for i, k, ts in rows], "event_id long, k string, ts timestamp"
    )
    out = sorted((r.k, r.window_id, r.event_id)
                 for r in windowed_exact_dedup(df, "event_id", ["k"], "ts").collect())
    wins = {r[1] for r in out if r[0] == "k"}
    assert len(wins) == 2                       # two distinct windows
    ids = [r[2] for r in out]
    assert 1 in ids and 3 in ids and 2 not in ids
    assert 4 in ids and 5 not in ids            # ts tie -> min id
    assert len(out) == 3


def test_zscore_outliers_epoch_magnitude_no_cancellation(spark):
    """Large-mean/small-std groups (epoch-like magnitudes) must still
    flag outliers: the naive sq/n - mean^2 form cancels to var=0 and
    silently drops the group; the shifted-pivot form keeps precision."""
    from meshinsights_data_pipeline_spark.operators.stats import (
        zscore_outliers,
    )

    base = 1.7e12
    rows = [("k", base + d) for d in (0.0, 1000.0, 2000.0, 1000.0, 500.0,
                                      1500.0, 800.0, 1200.0, 900.0)]
    rows.append(("k", base + 100000.0))  # the genuine outlier
    df = spark.createDataFrame(rows, "k string, value double")
    out = zscore_outliers(df, ["k"], "value", threshold=2.5).collect()
    assert out, "group must not be dropped by var-cancellation"
    flagged = [r for r in out if r.is_outlier]
    assert [r.value for r in flagged] == [base + 100000.0]
    assert flagged[0].z == pytest.approx(3.0, abs=0.01)


def test_histogram_and_psi_ignore_nan(spark):
    """One NaN must not poison max() and collapse the histogram/PSI bins."""
    from meshinsights_data_pipeline_spark.operators.stats import (
        histogram_fixed_width,
        psi_drift,
    )

    df = spark.createDataFrame(
        [(float(v),) for v in range(11)] + [(float("nan"),)], "x double"
    )
    out = histogram_fixed_width(df, "x", 5).collect()
    assert len(out) == 5 and sum(r.n for r in out) == 11
    g = spark.createDataFrame(
        [("a", float(v)) for v in range(10)]
        + [("b", float(v)) for v in range(10)]
        + [("a", float("nan"))],
        "g string, x double",
    )
    rows = {r.g: r for r in psi_drift(g, "g", "x", buckets=5).collect()}
    assert rows["a"].n == 10 and rows["b"].n == 10  # NaN excluded
    assert rows["a"].psi == rows["b"].psi           # identical distributions


def test_last_touch_attribution_string_ids(spark):
    """touch_id keeps the id column's NATIVE type: string/UUID event ids
    attribute correctly (a forced integral cast would NULL them silently
    and report every conversion as unattributed)."""
    from datetime import datetime

    from meshinsights_data_pipeline_spark.operators.funnel import (
        last_touch_attribution,
    )

    rows = [
        ("ev-a", datetime(2024, 1, 2, 10, 0), 1, "click"),
        ("ev-b", datetime(2024, 1, 2, 11, 0), 1, "click"),
        ("ev-c", datetime(2024, 1, 2, 11, 0), 1, "click"),  # ts tie
        ("ev-d", datetime(2024, 1, 2, 12, 0), 1, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id string, ts timestamp, user_id long, event_type string")
    out = last_touch_attribution(
        df, "user_id", "ts", "event_type", "event_id").collect()
    assert len(out) == 1
    r = out[0]
    assert r.conv_id == "ev-d"
    # latest ts wins; the ts tie collapses to the min STRING id
    assert r.touch_id == "ev-b" and r.gap_seconds == 3600
    # schema kept the native type end-to-end
    assert dict(last_touch_attribution(
        df, "user_id", "ts", "event_type", "event_id").dtypes
    )["touch_id"] == "string"


def test_zscore_outliers_nan_guard(spark):
    """NaN values are filtered with the NULLs (the sibling-operator
    guard): a NaN must not count into n while dropping out of the
    DECIMAL sums — that would silently bias the group's mean/std — and
    must not appear as an output row."""
    import math

    from meshinsights_data_pipeline_spark.operators.stats import (
        zscore_outliers,
    )

    base = [("a", float(v)) for v in [10, 10, 10, 10, 10, 10, 10, 10, 10, 100]]
    noisy = base + [("a", float("nan")), ("a", None)]
    df_clean = spark.createDataFrame(base, "k string, value double")
    df_noisy = spark.createDataFrame(noisy, "k string, value double")
    clean = sorted((r.value, r.mean_v, r.std_v, r.z, r.is_outlier)
                   for r in zscore_outliers(df_clean, ["k"], "value").collect())
    got = sorted((r.value, r.mean_v, r.std_v, r.z, r.is_outlier)
                 for r in zscore_outliers(df_noisy, ["k"], "value").collect())
    assert got == clean          # identical moments AND row set
    assert not any(math.isnan(v) for v, *_ in got)


def test_time_weighted_avg_negative_values_truncation(spark):
    """Mixed-sign values: the final integer division truncates toward
    zero in BOTH engines (Spark `div`; DuckDB HUGEINT `//` — DuckDB
    floors only for DOUBLE operands, which the X87 oracle avoids), so a
    negative weighted sum stays bit-identical: -10 for 1h then -5 for 2h
    -> twa = -20/3 = -6.666..., truncated to -6_666_666 micros (floor
    would give -6_666_667)."""
    from datetime import datetime

    from meshinsights_data_pipeline_spark.operators.rollup import (
        time_weighted_avg,
    )

    rows = [
        ("k", datetime(2024, 1, 1, 0, 0), -10.0),
        ("k", datetime(2024, 1, 1, 1, 0), -5.0),
        ("k", datetime(2024, 1, 1, 3, 0), 0.0),  # last point: 0 duration
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    r = time_weighted_avg(df, "ts", ["k"], "value").first()
    assert r.span_seconds == 3 * 3600
    assert r.twa_micros == -6_666_666  # truncation toward zero, not floor
    # cross-engine pin: DuckDB's HUGEINT // truncates identically
    import duckdb

    ws = (-10_000_000 * 3_600_000_000) + (-5_000_000 * 7_200_000_000)
    span = 10_800_000_000
    (dd,) = duckdb.sql(
        f"SELECT CAST(CAST({ws} AS HUGEINT) // {span} AS BIGINT)").fetchone()
    assert dd == r.twa_micros


def test_overlap_coefficient_pairs(spark):
    """Containment case: a short doc quoted wholesale inside a longer
    one has overlap 1.0 while its Jaccard is diluted by the size gap —
    the pair the symmetric detector misses at any usable threshold."""
    from meshinsights_data_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
        overlap_coefficient_pairs,
    )

    rows = [
        (1, "the quick brown fox jumps"),                       # A (3 shingles)
        (2, "the quick brown fox jumps over the lazy dog"),     # A + tail
        (3, "completely different words here entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.id_a, r.id_b): r.overlap
           for r in overlap_coefficient_pairs(df, "doc_id", "text",
                                              threshold=0.5).collect()}
    assert list(out) == [(1, 2)] and out[(1, 2)] == 1.0
    # the same pair under symmetric Jaccard: 3 shared of 7 union = 0.43
    jac = {(r.id_a, r.id_b): r.jaccard
           for r in ngram_jaccard_pairs(df, "doc_id", "text",
                                        threshold=0.1).collect()}
    assert jac[(1, 2)] < 0.5  # would be missed at the containment threshold
    # candidates= injection (the 100 TB verify path): exact overlap of
    # ONLY the injected pairs — scores identical to the self-join's,
    # un-injected pairs absent even when they would score
    import pytest

    cands = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    via = {(r.id_a, r.id_b): r.overlap
           for r in overlap_coefficient_pairs(
               df, "doc_id", "text", threshold=0.0,
               candidates=cands).collect()}
    assert via == {(1, 2): 1.0}
    with pytest.raises(ValueError, match="mutually exclusive"):
        overlap_coefficient_pairs(df, "doc_id", "text", max_doc_freq=4,
                                  candidates=cands)


def test_rolling_stats(spark):
    from datetime import datetime

    from meshinsights_data_pipeline_spark.operators.rollup import (
        rolling_stats,
    )

    rows = [("k", datetime(2024, 1, 1, h), h + 100, float(h + 1))
            for h in range(6)]
    rows.append(("k", datetime(2024, 1, 1, 7), 999, float("nan")))  # dropped
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, event_id long, value double")
    out = sorted(rolling_stats(df, "ts", ["k"], "value", "event_id", n=3)
                 .collect(), key=lambda r: r.event_id)
    assert [r.roll_sum for r in out] == [1.0, 3.0, 6.0, 9.0, 12.0, 15.0]
    assert [r.roll_avg for r in out] == [1.0, 1.5, 2.0, 3.0, 4.0, 5.0]
    assert [r.roll_n for r in out] == [1, 2, 3, 3, 3, 3]
    assert all(r.event_id != 999 for r in out)  # NaN row absent


def test_mad_outliers(spark):
    from meshinsights_data_pipeline_spark.operators.stats import (
        mad_outliers,
    )

    rows = ([("a", float(v)) for v in range(1, 10)] + [("a", 100.0)]
            + [("const", 5.0)] * 4           # MAD 0 -> excluded
            + [("a", float("nan"))])          # NaN guard
    df = spark.createDataFrame(rows, "k string, value double")
    out = mad_outliers(df, ["k"], "value", threshold=3.0).collect()
    assert {r.k for r in out} == {"a"}
    # median 5.5, MAD = median(|v-5.5|) = 2.5; only 100 exceeds 3 MADs
    flagged = [r for r in out if r.is_outlier]
    assert [(r.k, r.value) for r in flagged] == [("a", 100.0)]
    assert flagged[0].med_v == 5.5 and flagged[0].mad_v == 2.5
    assert flagged[0].score == pytest.approx(94.5 / 2.5)
    assert len(out) == 10  # NaN row absent, const group absent


def test_pmi_collocations(spark):
    from meshinsights_data_pipeline_spark.operators.text import (
        pmi_collocations,
    )

    # "new york" always adjacent (strong collocation); "the" pairs with
    # everything (weak). 6 docs give the pair count floor room.
    rows = [(i, "the new york office and the big office") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_collocations(df, "doc_id", "text", min_count=5, top_k=10)
    got = {(r.a, r.b): (r.n_ab, r.pmi, r.rk) for r in out.collect()}
    assert ("new", "york") in got
    n_ab, pmi, _ = got[("new", "york")]
    assert n_ab == 6
    # bigram table: 7 bigrams/doc * 6 docs = 42 total; left 'new' = 6,
    # right 'york' = 6 -> pmi = ln(6*42/(6*6)) = ln(7)
    import math
    assert pmi == pytest.approx(round(math.log(7.0), 6), abs=1e-6)
    # ranks are 1..k dense and follow the (pmi desc, a, b) order
    rks = sorted(v[2] for v in got.values())
    assert rks == list(range(1, len(got) + 1))


def test_top_event_paths(spark):
    from datetime import datetime

    from meshinsights_data_pipeline_spark.operators.funnel import (
        top_event_paths,
    )

    d1, d2 = datetime(2024, 1, 1, 9), datetime(2024, 1, 2, 9)
    rows = []
    # users 1-3, day 1: view>click>purchase (3 visits); the ts TIE between
    # the first two events orders by event_id
    for u in (1, 2, 3):
        rows += [(u * 10 + 1, d1, u, "view"), (u * 10 + 2, d1, u, "click"),
                 (u * 10 + 3, datetime(2024, 1, 1, 10), u, "purchase")]
    # user 1, day 2: five events -> path truncates to first 4 steps
    rows += [(101 + i, datetime(2024, 1, 2, 9 + i), 1, t)
             for i, t in enumerate(["view", "view", "click", "view", "click"])]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    out = [(r.path, r.n_sessions, r.rk)
           for r in top_event_paths(df, "user_id", "ts", "event_type",
                                    "event_id", k_steps=4, top_n=5).collect()]
    assert out[0] == ("view>click>purchase", 3, 1)
    assert ("view>view>click>view", 1, 2) in out  # truncated at 4 steps
    assert len(out) == 2


def test_winsorize(spark):
    from meshinsights_data_pipeline_spark.operators.stats import winsorize

    vals = list(range(1, 20)) + [1000]  # n=20; p95 interpolates 19..1000
    rows = ([("a", float(v)) for v in vals]
            + [("a", None), ("a", float("nan"))])
    df = spark.createDataFrame(rows, "k string, value double")
    out = {r.value: r for r in winsorize(df, ["k"], "value",
                                         lower=0.05, upper=0.95).collect()}
    assert len(out) == 20  # NULL/NaN absent
    # exact interpolated percentiles: p05 = 1.95, p95 = 19 + 0.05*981
    lo, hi = 1.95, round(19 + 0.05 * 981, 6)
    big = out[1000.0]
    assert (big.lo, big.hi, big.v_winsor, big.was_clipped) == (
        lo, hi, hi, True)
    assert (out[1.0].v_winsor, out[1.0].was_clipped) == (lo, True)
    assert (out[10.0].v_winsor, out[10.0].was_clipped) == (10.0, False)
    import pytest as _pt
    with _pt.raises(ValueError, match="lower < upper"):
        winsorize(df, ["k"], "value", lower=0.9, upper=0.1)


def test_label_centroid_similarity(spark):
    from meshinsights_data_pipeline_spark.operators.similarity import (
        label_centroid_similarity,
    )

    rows = [
        (1, [1.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0]),   # centroid (1,0,0)
        (2, [0.0, 2.0, 0.0]),                          # centroid (0,2,0)
        (3, [3.0, 3.0, 0.0]), (3, [1.0, 1.0, 0.0]),   # centroid (2,2,0)
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    out = {(r.group_a, r.group_b): r
           for r in label_centroid_similarity(df, "label").collect()}
    assert set(out) == {(1, 2), (1, 3), (2, 3)}
    assert out[(1, 2)].cosine == 0.0          # orthogonal centroids
    import math
    assert out[(1, 3)].cosine == round(1 / math.sqrt(2), 6)
    assert out[(2, 3)].cosine == round(1 / math.sqrt(2), 6)
    assert (out[(1, 3)].n_a, out[(1, 3)].n_b) == (2, 2)


def test_top_event_paths_null_type_renders_empty(spark):
    """A NULL event type renders as '' instead of being dropped — a
    dropped element would silently shorten the path and shift later
    steps (the chat_render NULL-turn rule)."""
    from datetime import datetime

    from meshinsights_data_pipeline_spark.operators.funnel import (
        top_event_paths,
    )

    rows = [(1, datetime(2024, 1, 1, 9), 1, "view"),
            (2, datetime(2024, 1, 1, 10), 1, None),
            (3, datetime(2024, 1, 1, 11), 1, "purchase")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    out = top_event_paths(df, "user_id", "ts", "event_type", "event_id",
                          k_steps=4, top_n=5).collect()
    assert [(r.path, r.n_sessions) for r in out] == [("view>>purchase", 1)]


def test_blocked_record_linkage(spark):
    from meshinsights_data_pipeline_spark.operators.linkage import (
        blocked_record_linkage,
    )

    rows = [
        # block (1, 'A'): near-identical pair + one distant row
        (1, 1, "A", "acme corp", 100.0),
        (2, 1, "A", "acme corp.", 150.0),
        (3, 1, "A", "zzz unrelated ltd", 5000.0),
        # different block: identical fields must NOT pair with id 1
        (4, 2, "A", "acme corp", 100.0),
        # NULL block component: never pairs
        (5, None, "A", "acme corp", 100.0),
    ]
    df = spark.createDataFrame(
        rows, "id long, nat int, seg string, name string, bal double")
    out = {(r.id_a, r.id_b): r.score
           for r in blocked_record_linkage(
               df, "id", ["nat", "seg"], "name", "bal",
               numeric_scale=1000.0, threshold=0.8).collect()}
    assert list(out) == [(1, 2)]
    # lev('acme corp','acme corp.')=1, maxlen 10 -> 0.9 sim; |100-150|/1000
    # -> 0.95 proximity; score = 0.5*0.9 + 0.5*0.95 = 0.925
    assert out[(1, 2)] == 0.925


def test_blocked_record_linkage_block_cap(spark):
    """r17: max_block_rows drops over-cap blocks from pairing (a failed
    blocking key must not cost its square); under-cap blocks score
    identically to the uncapped run."""
    from meshinsights_data_pipeline_spark.operators.linkage import (
        blocked_record_linkage,
    )

    rows = [
        (1, 1, "A", "acme corp", 100.0),
        (2, 1, "A", "acme corp.", 150.0),
        # block (2, 'A') has 3 rows of identical fields: pairs unless capped
        (10, 2, "A", "beta llc", 10.0),
        (11, 2, "A", "beta llc", 10.0),
        (12, 2, "A", "beta llc", 10.0),
    ]
    df = spark.createDataFrame(
        rows, "id long, nat int, seg string, name string, bal double")
    kw = dict(numeric_scale=1000.0, threshold=0.8)
    full = {(r.id_a, r.id_b): r.score
            for r in blocked_record_linkage(
                df, "id", ["nat", "seg"], "name", "bal", **kw).collect()}
    assert set(full) == {(1, 2), (10, 11), (10, 12), (11, 12)}
    capped = {(r.id_a, r.id_b): r.score
              for r in blocked_record_linkage(
                  df, "id", ["nat", "seg"], "name", "bal",
                  max_block_rows=2, **kw).collect()}
    assert capped == {(1, 2): full[(1, 2)]}


def test_blocked_record_linkage_prefilter_equivalence(spark):
    """The numeric pre-filter is a pure optimization: with the filter
    disabled algebraically (w_numeric heavy / low threshold) vs enabled,
    the surviving pair set over a randomized frame is identical to the
    unfiltered brute-force score computed in python."""
    import random

    from meshinsights_data_pipeline_spark.operators.linkage import (
        blocked_record_linkage,
    )

    rng = random.Random(7)
    names = ["acme corp", "acme corp.", "acme co", "zenith ltd",
             "zenith ltd.", "nadir inc"]
    rows = [(i, rng.randint(0, 1), "S", rng.choice(names),
             float(rng.randint(0, 3000))) for i in range(60)]
    df = spark.createDataFrame(
        rows, "id long, nat int, seg string, name string, bal double")
    got = sorted((r.id_a, r.id_b, r.score) for r in blocked_record_linkage(
        df, "id", ["nat", "seg"], "name", "bal",
        numeric_scale=1000.0, threshold=0.85).collect())

    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    expect = []
    for i in range(60):
        for j in range(i + 1, 60):
            ri, rj = rows[i], rows[j]
            if (ri[1], ri[2]) != (rj[1], rj[2]):
                continue
            s_sim = 1 - lev(ri[3], rj[3]) / max(len(ri[3]), len(rj[3]))
            n_sim = max(0.0, 1 - abs(ri[4] - rj[4]) / 1000.0)
            score = round(0.5 * s_sim + 0.5 * n_sim, 6)
            if score >= 0.85:
                expect.append((ri[0], rj[0], score))
    assert got == sorted(expect)


def test_blocked_record_linkage_fields_multi(spark):
    """N-field generalization (r12 verdict #4): 2 strings + 2 numerics
    with unequal weights/scales score as the brute-force weighted sum;
    per-field NULLs score 0 on that field only; each numeric field's
    pre-filter bound uses the max attainable score of the REMAINING
    fields, so results equal the unfiltered oracle; the 2-field wrapper
    is the fields-form with the classic spec."""
    import random

    import pytest

    from meshinsights_data_pipeline_spark.operators.linkage import (
        LinkageField,
        blocked_record_linkage,
        blocked_record_linkage_fields,
    )

    rng = random.Random(13)
    names = ["acme corp", "acme corp.", "acme co", "zenith ltd"]
    cities = ["york", "yark", "paris", None]
    rows = [(i, rng.randint(0, 1), rng.choice(names), rng.choice(cities),
             float(rng.randint(0, 2000)),
             None if rng.random() < 0.2 else float(rng.randint(0, 50)))
            for i in range(50)]
    df = spark.createDataFrame(
        rows, "id long, blk int, name string, city string,"
              " bal double, age double")
    fields = [
        LinkageField("name", "string", 0.4),
        LinkageField("city", "string", 0.2),
        LinkageField("bal", "numeric", 0.3, scale=1000.0),
        LinkageField("age", "numeric", 0.1, scale=20.0),
    ]
    got = sorted(
        (r.id_a, r.id_b, r.score)
        for r in blocked_record_linkage_fields(
            df, "id", ["blk"], fields, threshold=0.75).collect())

    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    def s_sim(a, b):
        if a is None or b is None:
            return 0.0
        return 1 - lev(a, b) / max(len(a), len(b))

    def n_sim(a, b, scale):
        if a is None or b is None:
            return 0.0
        return max(0.0, 1 - abs(a - b) / scale)

    expect = []
    for i in range(50):
        for j in range(i + 1, 50):
            ri, rj = rows[i], rows[j]
            if ri[1] != rj[1]:
                continue
            score = round(0.4 * s_sim(ri[2], rj[2])
                          + 0.2 * s_sim(ri[3], rj[3])
                          + 0.3 * n_sim(ri[4], rj[4], 1000.0)
                          + 0.1 * n_sim(ri[5], rj[5], 20.0), 6)
            if score >= 0.75:
                expect.append((ri[0], rj[0], score))
    assert got == sorted(expect) and got  # non-vacuous
    # the 2-field wrapper IS the fields-form with the classic spec
    two = sorted((r.id_a, r.id_b, r.score) for r in blocked_record_linkage(
        df, "id", ["blk"], "name", "bal",
        numeric_scale=1000.0, threshold=0.8).collect())
    via_fields = sorted(
        (r.id_a, r.id_b, r.score)
        for r in blocked_record_linkage_fields(
            df, "id", ["blk"],
            [LinkageField("name", "string", 0.5),
             LinkageField("bal", "numeric", 0.5, scale=1000.0)],
            threshold=0.8).collect())
    assert two == via_fields
    with pytest.raises(ValueError, match="unknown field kind"):
        LinkageField("name", "fuzzy", 0.5)
    with pytest.raises(ValueError, match="non-positive scale"):
        LinkageField("bal", "numeric", 0.5, scale=0.0)
    with pytest.raises(ValueError, match="non-empty"):
        blocked_record_linkage_fields(df, "id", ["blk"], [])


def test_session_metrics(spark):
    from datetime import datetime, timedelta

    from meshinsights_data_pipeline_spark.operators.sessionize import (
        session_metrics,
    )

    base = datetime(2024, 1, 1)
    rows = [
        # user 1: session A = 2 events 1h apart; 13h gap; session B = 1
        # event (a bounce)
        (1, 1, base), (2, 1, base + timedelta(hours=1)),
        (3, 1, base + timedelta(hours=14)),
        # user 2: one 3-event session spanning 30 min
        (4, 2, base), (5, 2, base + timedelta(minutes=10)),
        (6, 2, base + timedelta(minutes=30)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    from pyspark.sql import functions as F
    out = {r.user_id: r for r in session_metrics(
        df, "ts", 43200, ["user_id"], tiebreak=[F.col("event_id")]).collect()}
    u1, u2 = out[1], out[2]
    assert (u1.n_sessions, u1.n_bounces, u1.bounce_rate) == (2, 1, 0.5)
    # dwells: 3600s and 0s -> avg = 1800s in micros (trunc-exact)
    assert u1.avg_dwell_micros == 1_800_000_000
    assert (u2.n_sessions, u2.n_bounces, u2.bounce_rate) == (1, 0, 0.0)
    assert u2.avg_dwell_micros == 1_800_000_000


def test_linear_attribution(spark):
    from datetime import datetime

    from meshinsights_data_pipeline_spark.operators.funnel import (
        linear_attribution,
    )

    t = datetime(2024, 1, 2, 12, 0)
    rows = [
        # user 1: 3 in-window clicks (incl. one straddling the bucket
        # boundary) + 1 click 30h before (outside) -> credit 1/3 each
        (10, datetime(2024, 1, 1, 6, 0), 1, "click"),
        (11, datetime(2024, 1, 1, 13, 0), 1, "click"),   # 23h before
        (12, datetime(2024, 1, 2, 11, 0), 1, "click"),
        (13, t, 1, "click"),                              # at conv ts
        (14, t, 1, "purchase"),
        # user 2: no in-window touch -> absent from output
        (20, t, 2, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    out = sorted((r.conv_id, r.touch_id, r.credit)
                 for r in linear_attribution(
                     df, "user_id", "ts", "event_type", "event_id").collect())
    assert out == [(14, 11, 0.333333), (14, 12, 0.333333),
                   (14, 13, 0.333333)]
    # equal split sums to ~1 per conversion; out-of-window click 10 absent


def test_step_decay_attribution(spark):
    from datetime import datetime

    from meshinsights_data_pipeline_spark.operators.funnel import (
        step_decay_attribution,
    )

    t = datetime(2024, 1, 2, 12, 0)
    rows = [
        (10, datetime(2024, 1, 2, 11, 0), 1, "click"),   # gap 1h  -> w=1
        (11, datetime(2024, 1, 2, 5, 0), 1, "click"),    # gap 7h  -> w=1/2
        (12, datetime(2024, 1, 1, 22, 0), 1, "click"),   # gap 14h -> w=1/4
        (13, t, 1, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    out = {r.touch_id: r for r in step_decay_attribution(
        df, "user_id", "ts", "event_type", "event_id",
        halflife_hours=6).collect()}
    assert [out[i].w for i in (10, 11, 12)] == [1.0, 0.5, 0.25]
    # sum = 1.75 (exact dyadic): credits 4/7, 2/7, 1/7 rounded
    assert out[10].credit == round(1.0 / 1.75, 6)
    assert out[11].credit == round(0.5 / 1.75, 6)
    assert out[12].credit == round(0.25 / 1.75, 6)


def test_source_vocab_overlap(spark):
    from meshinsights_data_pipeline_spark.operators.corpus import (
        source_vocab_overlap,
    )

    rows = [
        (1, "s1", "alpha beta gamma"),
        (2, "s1", "beta delta"),          # s1 vocab: {alpha,beta,gamma,delta}
        (3, "s2", "beta gamma epsilon"),  # s2 vocab: {beta,gamma,epsilon}
        (4, "s3", "zzz yyy"),             # disjoint from s1/s2
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {(r.src_a, r.src_b): r for r in source_vocab_overlap(df).collect()}
    r12 = out[("s1", "s2")]
    # shared {beta, gamma} = 2; union 4 + 3 - 2 = 5
    assert (r12.vocab_a, r12.vocab_b, r12.n_shared) == (4, 3, 2)
    assert r12.vocab_jaccard == 0.4
    # disjoint pairs produce no row at all (inner join on shared tokens)
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_funnel_step_latency(spark):
    from datetime import datetime

    from meshinsights_data_pipeline_spark.operators.funnel import (
        funnel_step_latency,
    )

    d = datetime
    rows = [
        # user 1: view 9:00, click 10:00 (1h), purchase 13:00 (3h)
        (1, d(2024, 1, 1, 9), 1, "view"), (2, d(2024, 1, 1, 10), 1, "click"),
        (3, d(2024, 1, 1, 13), 1, "purchase"),
        # user 2: view 9:00, click 12:00 (3h); never purchases
        (4, d(2024, 1, 1, 9), 2, "view"), (5, d(2024, 1, 1, 12), 2, "click"),
        # user 3: click only (no view) -> never enters the funnel
        (6, d(2024, 1, 1, 9), 3, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    out = {r.step: r for r in funnel_step_latency(
        df, "user_id", "ts", "event_type",
        ["view", "click", "purchase"]).collect()}
    assert set(out) == {2, 3}
    # step 2 latencies: 3600s and 10800s -> p50 = 7200 (interpolated)
    assert (out[2].n_users, out[2].p50_seconds) == (2, 7200.0)
    assert out[2].p90_seconds == 3600.0 + 0.9 * 7200.0  # rank 0.9*(n-1)
    assert (out[3].n_users, out[3].p50_seconds, out[3].p90_seconds) == (
        1, 10800.0, 10800.0)


def test_rfm_scores(spark):
    from datetime import datetime

    from meshinsights_data_pipeline_spark.operators.stats import rfm_scores

    d = datetime
    # 4 users with strictly separated R/F/M profiles
    rows = []
    rows += [(1, d(2024, 1, 30), 10.0)] * 8            # recent, frequent, rich
    rows += [(2, d(2024, 1, 20), 5.0)] * 4
    rows += [(3, d(2024, 1, 10), 2.0)] * 2
    rows += [(4, d(2024, 1, 1), 1.0)] * 1              # stale, rare, poor
    df = spark.createDataFrame(
        [(u, t, v) for u, t, v in rows], "user_id long, ts timestamp, value double")
    out = {r.user_id: r for r in rfm_scores(df, "user_id", "ts", "value").collect()}
    assert out[1].recency_days == 0 and out[4].recency_days == 29
    assert out[1].frequency == 8 and out[1].monetary_micros == 80_000_000
    # strictly ordered profiles -> strictly ordered scores 4..1 on every axis
    assert [out[u].rfm for u in (1, 2, 3, 4)] == [444, 333, 222, 111]
    # 100 TB tier: approx=True swaps the nine cuts to percentile_approx
    # (t-digest, bounded memory). The sketch returns an actual element
    # rather than an interpolated cut, so scores AT a quartile boundary
    # may shift by one (here: 4 users, p75 lands on the max, costing
    # the top user one point per axis) — the documented contract is
    # same schema, per-axis ordering preserved, per-score delta <= 1.
    ap = {r.user_id: r
          for r in rfm_scores(df, "user_id", "ts", "value",
                              approx=True).collect()}
    assert ap[1].asDict().keys() == out[1].asDict().keys()
    for axis in ("r_score", "f_score", "m_score"):
        scores = [ap[u][axis] for u in (1, 2, 3, 4)]
        assert scores == sorted(scores, reverse=True)  # ordering holds
        assert all(abs(ap[u][axis] - out[u][axis]) <= 1 for u in (1, 2, 3, 4))


def test_cusum_changepoints(spark):
    """A flat in-control series never alarms; after a level shift the
    upper CUSUM ramps and crosses the threshold a few samples in (the
    detection-delay property that makes CUSUM better than a naive
    per-point rule); recovery resets via the running-min closed form.
    NULL/NaN rows are excluded like the stats siblings."""
    from datetime import datetime, timedelta

    from meshinsights_data_pipeline_spark.operators.changepoint import (
        cusum_changepoints,
    )

    base = datetime(2024, 1, 1)
    # in-control at 10 for 6 points, then shift to 13 (3 units up)
    vals = [10.0, 10.2, 9.8, 10.1, 9.9, 10.0,
            13.0, 13.1, 12.9, 13.0,
            None, float("nan")]
    rows = [(1, base + timedelta(hours=i), i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "k int, ts timestamp, event_id long, value double")
    out = {r.event_id: r for r in cusum_changepoints(
        df, "ts", ["k"], "value", "event_id",
        target=10.0, slack=0.5, threshold=5.0).collect()}
    assert len(out) == 10  # NULL + NaN rows dropped
    # in-control: s_plus stays under 1, never alarms
    assert all(out[i].s_plus < 1.0 and not out[i].alarm_up
               for i in range(6))
    # post-shift drift is +2.5/sample: 2.5, 5.0, 7.4, 9.9
    assert out[6].s_plus == 2.5 and not out[6].alarm_up
    assert out[7].s_plus == 5.1 and out[7].alarm_up  # 2.5 + (13.1-10.5)
    assert out[8].alarm_up and out[9].alarm_up
    # downward side never fires on an upward shift
    assert not any(out[i].alarm_down for i in out)


def test_ab_test_zscores(spark):
    """Known cells: control 1000 units 100 conv, treatment 1000 units
    130 conv -> z ~ 2.103 (significant at 1.96); an underpowered arm is
    not significant; se = 0 cells yield NULL z / false, and an
    experiment WITHOUT a control arm surfaces with has_control = false
    and NULL control/z columns instead of silently vanishing (a
    misconfigured feed must be visible in the readout)."""
    import math

    from meshinsights_data_pipeline_spark.operators.abtest import (
        ab_test_zscores,
    )

    def cell(exp, arm, n, x):
        return ([(exp, arm, True)] * x) + ([(exp, arm, False)] * (n - x))

    rows = (cell("e1", "control", 1000, 100) + cell("e1", "t1", 1000, 130)
            + cell("e1", "t2", 50, 7)
            + cell("e2", "control", 20, 0) + cell("e2", "t1", 20, 0)
            + cell("e3", "t1", 10, 5))          # no control arm
    df = spark.createDataFrame(rows, "exp string, arm string, conv boolean")
    out = {(r.exp, r.arm): r for r in ab_test_zscores(
        df, "exp", "arm", "conv", control_label="control").collect()}

    def z_ref(nc, xc, na, xa):
        pc, pa = xc / nc, xa / na
        pool = (xc + xa) / (nc + na)
        return round((pa - pc) / math.sqrt(
            pool * (1 - pool) * (1 / nc + 1 / na)), 6)

    r = out[("e1", "t1")]
    assert (r.n_control, r.x_control, r.n_arm, r.x_arm) == (1000, 100, 1000, 130)
    assert r.z == z_ref(1000, 100, 1000, 130) and r.significant
    assert abs(r.z - 2.1027) < 1e-3 and r.lift == 0.03
    r2 = out[("e1", "t2")]
    assert r2.z == z_ref(1000, 100, 50, 7) and not r2.significant
    r3 = out[("e2", "t1")]          # pooled rate 0 -> se 0
    assert r3.z is None and r3.significant is False and r3.has_control
    r4 = out[("e3", "t1")]          # no control arm: surfaced, flagged
    assert r4.has_control is False
    assert r4.n_control is None and r4.x_control is None
    assert r4.p_control is None and r4.lift is None
    assert r4.z is None and r4.significant is False
    assert (r4.n_arm, r4.x_arm) == (10, 5)
    assert r.has_control and r2.has_control
    assert ("e1", "control") not in out


def test_exp_weighted_avg(spark):
    """Known dyadic case (alpha=0.5, k=3): weights 1/2, 1/4, 1/8 with a
    re-normalizing denominator, so the series head is unbiased (first
    row's ewa = its own value) and each row matches the hand fold;
    NULL/NaN rows are dropped before lags step over them."""
    from datetime import datetime, timedelta

    from meshinsights_data_pipeline_spark.operators.rollup import (
        exp_weighted_avg,
    )

    base = datetime(2024, 1, 1)
    vals = [8.0, 4.0, None, 2.0, float("nan"), 1.0]
    rows = [(1, base + timedelta(hours=i), i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "k int, ts timestamp, event_id long, value double")
    out = {r.event_id: r.ewa for r in exp_weighted_avg(
        df, "ts", ["k"], "value", "event_id", alpha=0.5, k=3).collect()}
    # clean series is 8, 4, 2, 1 at events 0, 1, 3, 5
    assert out[0] == 8.0                                   # den = 1/2
    assert out[1] == round((4 / 2 + 8 / 4) / 0.75, 6)      # two terms
    assert out[3] == round((2 / 2 + 4 / 4 + 8 / 8) / 0.875, 6)
    assert out[5] == round((1 / 2 + 2 / 4 + 4 / 8) / 0.875, 6)
    assert 2 not in out and 4 not in out                   # guarded rows
    import pytest
    with pytest.raises(ValueError, match="alpha"):
        exp_weighted_avg(df, "ts", ["k"], "value", "event_id", alpha=1.0)
    with pytest.raises(ValueError, match="k must"):
        exp_weighted_avg(df, "ts", ["k"], "value", "event_id", k=0)
