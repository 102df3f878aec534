"""LLM-data-pipeline operator tests: dedup family semantics on planted
duplicates, LSH recall vs the exact path, similarity search, text analysis,
multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators import dedup as D
from meshinsights_data_pipeline_spark.operators import similarity as S
from meshinsights_data_pipeline_spark.operators import text as T
from meshinsights_data_pipeline_spark.operators.multimodal import (
    extract_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base + " extra words appended here"),  # near dup of 1
        (4, "completely different content about spark query engines and shuffles"),
        (5, "THE QUICK brown fox! jumps over the lazy dog near the river bank today"),  # normalized dup of 1
        (6, "short text"),
        (7, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_normalization(docs):
    out = D.exact_dedup(docs, "doc_id", "text").collect()
    survivors = sorted(r["doc_id"] for r in out)
    # 1,2,5 collapse (case/punct-insensitive) -> min id 1 survives
    assert 1 in survivors and 2 not in survivors and 5 not in survivors
    assert {3, 4, 6, 7}.issubset(set(survivors))


def test_ngram_jaccard_finds_neardups(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             D.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert pairs[(1, 5)] == 1.0  # normalization makes them identical
    assert 0.5 < pairs[(1, 3)] < 1.0  # prefix-shared shingles
    assert (1, 4) not in pairs


def test_minhash_lsh_recall(docs):
    cands = {(r["id_a"], r["id_b"]) for r in
             D.minhash_lsh_candidates(docs, "doc_id", "text").collect()}
    # identical docs always share every band
    assert (1, 2) in cands and (1, 5) in cands and (2, 5) in cands
    # (1,3) has Jaccard 0.75; default r=4 bands catch it only w.p. ~0.78 —
    # with 8 bands of r=2 the catch probability is ~0.999, and the fixed
    # hash family makes the outcome deterministic.
    wide = {(r["id_a"], r["id_b"]) for r in
            D.minhash_lsh_candidates(docs, "doc_id", "text", bands=8).collect()}
    assert (1, 3) in wide


def test_minhash_dedup_pairs_verified(docs):
    verified = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
                D.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5).collect()}
    assert verified[(1, 2)] == 1.0
    assert all(j >= 0.5 for j in verified.values())


def test_simhash_similarity(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in D.simhash(docs, "doc_id", "text").collect()}
    assert sigs[1] == sigs[2] == sigs[5]  # identical token multisets
    ham_13 = bin(sigs[1] ^ sigs[3]).count("1")
    ham_14 = bin(sigs[1] ^ sigs[4]).count("1")
    assert ham_13 < ham_14  # near-dup closer than unrelated doc
    cands = {(r["id_a"], r["id_b"]) for r in
             D.simhash_candidates(docs, "doc_id", "text").collect()}
    assert (1, 2) in cands


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    rows = []
    for i in range(40):
        v = rng.normal(0, 1, 16)
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    # planted near-dup of vec 0
    v0 = np.array(rows[0][1])
    near = v0 + rng.normal(0, 0.01, 16)
    rows.append((100, [float(x) for x in near / np.linalg.norm(near)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(vectors):
    q = vectors.filter(F.col("vec_id") == 0)
    out = S.cosine_topk(vectors, q, k=5).collect()
    assert len(out) == 5
    assert out[0]["neighbor_id"] == 100  # the planted near-dup ranks first
    assert out[0]["score"] > 0.99
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]


def test_embedding_neardup(vectors):
    pairs = S.embedding_neardup_pairs(vectors, threshold=0.95).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 100)}


def test_embedding_neardup_max_rows_guard(vectors):
    """r17: the exact all-pairs verifier's small-N precondition is
    enforceable — over-cap input raises in O(N), results unchanged
    when under the cap."""
    import pytest

    with pytest.raises(ValueError, match="N\\^2"):
        S.embedding_neardup_pairs(vectors, threshold=0.95, max_rows=10)
    pairs = S.embedding_neardup_pairs(
        vectors, threshold=0.95, max_rows=1000
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 100)}


def test_sq_quantize_code_properties(vectors, spark):
    rows = S.sq_quantize(vectors).collect()
    assert len(rows) == 41
    for r in rows:
        codes = r["sq_q"]
        assert all(-127 <= c <= 127 for c in codes)
        # the max-|v| component quantizes to exactly +/-127
        assert max(abs(c) for c in codes) == 127
        assert r["sq_scale"] > 0 and r["sq_norm"] > 0
    # zero vector: all-zero codes, zero scale/norm (not NaN)
    z = spark.createDataFrame([(9, [0.0] * 4)], "vec_id long, embedding array<float>")
    rz = S.sq_quantize(z).first()
    assert list(rz["sq_q"]) == [0, 0, 0, 0]
    assert rz["sq_scale"] == 0.0 and rz["sq_norm"] == 0.0


def test_sq_topk_finds_planted_dup_and_tracks_exact(vectors):
    q = vectors.filter(F.col("vec_id") == 0)
    out = S.sq_topk(vectors, q, k=5).collect()
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]
    assert out[0].neighbor_id == 100  # planted near-dup survives int8
    assert out[0].score > 0.99
    # 7-bit quantization of 16-dim unit vectors: top-5 set should agree
    # with the exact ranking almost everywhere
    exact = {r.neighbor_id for r in S.cosine_topk(vectors, q, k=5).collect()}
    got = {r.neighbor_id for r in out}
    assert len(exact & got) >= 4


def test_rp_lsh_topk_finds_planted_dup(vectors):
    q = vectors.filter(F.col("vec_id") == 0)
    out = S.rp_lsh_topk(vectors, q, k=5, bits=6).collect()
    # the planted near-dup must share the bucket of its source
    assert out and out[0]["neighbor_id"] == 100


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [(1, "a b  c"), (2, ""), (3, "   "), (4, "one")], "id long, t string"
    )
    got = {r["id"]: r["n"] for r in df.select("id", T.token_count("t").alias("n")).collect()}
    assert got == {1: 3, 2: 0, 3: 0, 4: 1}


def test_quality_score_ranges(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and runs to the hills " * 5),
            (2, "!!! ??? ### $$$ %%%"),
        ],
        "id long, t string",
    )
    got = {r["id"]: r["q"] for r in df.select("id", T.quality_score("t").alias("q")).collect()}
    assert got[1] > 0.8
    assert got[2] < 0.5


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog are in the house of the king"),
            (2, "der Hund und die Katze sind in dem Haus, ein schönes Haus"),
            (3, "这是一个中文句子用于测试语言识别功能的正确性"),
            (4, ""),
            (5, None),
            (6, "le chat est dans la maison de la reine et le roi est dehors"),
        ],
        "id long, t string",
    )
    result = T.lang_id(df, "t", "p")
    out = {r["id"]: r["p"] for r in result.select("id", "p").collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "zh"
    assert out[4] == "und"
    assert out[5] == "und"
    assert out[6] == "fr"
    # A pre-existing column with the staging name must survive untouched.
    clash = df.withColumn("_lang_id_s", F.col("id") * 10)
    kept = T.lang_id(clash, "t", "p2")
    assert {r["id"]: r["_lang_id_s"] for r in kept.collect()} == {
        i: i * 10 for i in range(1, 7)
    }
    # The classifier must be pure JVM expressions — no Python eval stage.
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # catches ArrowEvalPython & BatchEvalPython


def test_multimodal_features(spark):
    rows = [
        ("img1", "image", b"\x00\x01\x02\x03" * 100),
        ("img2", "image", b"\xff" * 50),
        ("aud1", "audio", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, modality string, payload binary")
    out = {r["media_id"]: r for r in extract_features(df).collect()}
    assert out["img1"]["n_bytes"] == 400
    assert len(out["img1"]["feature"]) == 8
    assert sum(out["img1"]["feature"]) == pytest.approx(1.0, abs=1e-6)
    assert out["aud1"]["feature"] == [0.0] * 8
    # determinism: hash equality for identical payloads
    assert out["img1"]["payload_hash"] is not None


def test_frame_sampling(spark):
    df = spark.createDataFrame(
        [("v1", "video", 3500), ("v2", "video", 500), ("i1", "image", None)],
        "media_id string, modality string, duration_ms int",
    )
    out = sample_frames(df, every_ms=1000).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert sorted(by_id["v1"]) == [0, 1000, 2000]
    assert by_id["v2"] == [0]
    assert "i1" not in by_id


def test_audio_chunking(spark):
    from meshinsights_data_pipeline_spark.operators.multimodal import chunk_audio

    df = spark.createDataFrame(
        [("a1", "audio", 12000), ("a2", "audio", 4000), ("v1", "video", 9000)],
        "media_id string, modality string, duration_ms int",
    )
    out = chunk_audio(df, chunk_ms=5000).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(
            (r["chunk_idx"], r["chunk_start_ms"], r["chunk_end_ms"])
        )
    assert sorted(by_id["a1"]) == [(0, 0, 5000), (1, 5000, 10000), (2, 10000, 12000)]
    assert by_id["a2"] == [(0, 0, 4000)]
    assert "v1" not in by_id  # video rows go through sample_frames instead


def test_list_tables(spark):
    from meshinsights_data_pipeline_spark.session import list_tables, load_tables

    load_tables(spark, "/root/testdata/sf0.001")
    got = list_tables(spark)
    assert "events" in got and "lineitem" in got


def test_ann_recall_vs_exact(spark):
    """Approximate ANN paths must find a reasonable share of the true
    top-10 (recall floor on the synthetic corpus; exactness is already
    oracle-checked — this guards retrieval QUALITY)."""
    from meshinsights_data_pipeline_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        rp_lsh_topk,
    )
    from meshinsights_data_pipeline_spark.session import read_table

    emb = read_table(spark, "/root/testdata/sf0.01", "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact = topk_sets(cosine_topk(emb, queries, k=10))

    centroids = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    ivf = topk_sets(ivf_topk(emb, queries, centroids, k=10, nprobe=8))
    lsh = topk_sets(rp_lsh_topk(emb, queries, k=10, bits=2, dim=64))

    def recall(approx):
        hits = sum(len(approx.get(q, set()) & exact[q]) for q in exact)
        return hits / sum(len(v) for v in exact.values())

    r_ivf, r_lsh = recall(ivf), recall(lsh)
    # random 10-of-500 would give ~2% recall; the structured paths must do
    # far better even on this unclustered synthetic corpus (true neighbors
    # sit near cosine 0.4-0.5, where 2-bit hyperplane collision ~40%)
    assert r_ivf >= 0.3, f"IVF recall {r_ivf:.2f}"
    assert r_lsh >= 0.2, f"RP-LSH recall {r_lsh:.2f}"


def test_redact_pii_and_counts(spark):
    from meshinsights_data_pipeline_spark.operators.text import pii_counts

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-corp.io and 192.168.1.255 then 12345678 end"),
            (2, "no pii here, short num 123456"),
            (3, "two mails x@y.com z@w.org one ip 8.8.8.8"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in pii_counts(df, "doc_id", "text").collect()}
    assert out[1].redacted == "mail <EMAIL> and <IP> then <NUM> end"
    assert (out[1].n_email, out[1].n_ip, out[1].n_num) == (1, 1, 1)
    # 6-digit run is below the 7+ threshold — untouched
    assert out[2].redacted == "no pii here, short num 123456"
    assert (out[2].n_email, out[2].n_ip, out[2].n_num) == (0, 0, 0)
    assert (out[3].n_email, out[3].n_ip, out[3].n_num) == (2, 1, 0)


def test_tfidf_top_terms(spark):
    from meshinsights_data_pipeline_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "apple apple banana shared"),
            (2, "banana cherry shared shared"),
            (3, "cherry date shared"),
        ],
        "id long, t string",
    )
    rows = tfidf_top_terms(df, "id", "t", top_k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.id, []).append((r.rk, r.term))
    # doc 1: apple tf=.5 idf=3 -> 1.5 beats banana .375, shared .25
    assert by_doc[1] == [(1, "apple"), (2, "banana")]
    # doc 2: shared tf=.5 idf=1 -> .5 beats banana/cherry .375 (tie -> banana)
    assert by_doc[2] == [(1, "shared"), (2, "banana")]
    # doc 3: date 1/3*3=1.0 beats cherry .5, shared 1/3
    assert by_doc[3] == [(1, "date"), (2, "cherry")]


def test_bm25_topk(spark):
    from meshinsights_data_pipeline_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [
            (1, "dup dup alpha"),
            (2, "alpha beta dup"),
            (3, "alpha beta gamma gamma"),
        ],
        "id long, t string",
    )
    rows = bm25_topk(df, "id", "t", ["dup", "gamma"], top_k=3).collect()
    # independent recomputation of the exact formula (N=3, avgdl=10/3)
    def score(pairs, dl, n=3, avgdl=10 / 3):
        s = 0.0
        for tc, dfq in pairs:
            idf = (n - dfq + 0.5) / (dfq + 0.5)
            s += idf * ((tc * 2.2) / (tc + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
        return round(s, 6)

    want = {
        1: score([(2, 2)], 3),          # dup tc=2, df=2
        2: score([(1, 2)], 3),          # dup tc=1
        3: score([(2, 1)], 4),          # gamma tc=2, df=1
    }
    got = {r.id: r.score for r in rows}
    assert got == pytest.approx(want, abs=1e-9)
    # gamma's rare-term idf puts doc 3 on top; ranks are dense 1..3
    assert [(r.rk, r.id) for r in sorted(rows, key=lambda r: r.rk)] == [
        (1, 3), (2, 1), (3, 2),
    ]
    assert all(r.n_terms == 1 for r in rows)
    # top_k truncates after ranking
    assert [r.id for r in bm25_topk(df, "id", "t", ["dup", "gamma"], top_k=1).collect()] == [3]
    # raw user queries normalize like document text: 'Dup!' matches the
    # normalized token 'dup', and 'U.S.' contributes tokens 'u' and 's'
    # (none present here) instead of silently matching nothing
    raw = {r.id: r.score for r in
           bm25_topk(df, "id", "t", ["Dup!", "Gamma", "U.S."], top_k=3).collect()}
    assert raw == pytest.approx(want, abs=1e-9)


def test_pq_encode_and_topk(vectors):
    codes = {r.vec_id: list(r.codes) for r in
             S.pq_encode(vectors, dim=16, m=4).collect()}
    # The staging temp views are dropped before the frame is materialized
    # (spark.sql resolves eagerly) — repeated calls must not leak catalog
    # entries in a long-lived session.
    assert not [t.name for t in vectors.sparkSession.catalog.listTables()
                if t.name.startswith("_pq_")]
    assert len(codes) == 41 and all(len(c) == 4 for c in codes.values())
    assert all(0 <= x < 16 for c in codes.values() for x in c)
    # The planted near-dup (vec 100 = vec 0 + tiny noise) quantizes close:
    # ADC must rank it first among vec 0's neighbors.
    q = vectors.filter(F.col("vec_id") == 0)
    out = S.pq_topk(vectors, q, dim=16, m=4, k=5).collect()
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]
    assert out[0].neighbor_id == 100
    assert out[0].adist == min(r.adist for r in out)


def test_semantic_dedup_pairs(vectors):
    # Centroids = first 4 vectors; the planted near-dup (100 ~ 0) must land
    # in vec 0's cluster and surface as a within-cluster pair.
    centroids = vectors.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    out = S.semantic_dedup_pairs(vectors, centroids, threshold=0.95).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(0, 100)}
    assert out[0].score > 0.99
    assert out[0].list_id == 0  # vec 0 is itself a centroid -> cosine 1 with c0
    # Cluster partitioning: a pair must only ever be scored within one list,
    # so every returned row's members share the same assignment.
    assigned = {r[0]: r[1] for r in S.ivf_assign(vectors, centroids).collect()}
    assert all(assigned[r.id_a] == assigned[r.id_b] == r.list_id for r in out)


def test_kmeans_update(spark, vectors):
    import numpy as np

    centroids = vectors.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    out = {r.centroid_id: list(r.centroid_vec)
           for r in S.kmeans_update(vectors, centroids).collect()}
    assert set(out) == {0, 1} and all(len(v) == 16 for v in out.values())
    # Each new centroid is exactly the element-wise mean of its members.
    assigned = {}
    for r in S.ivf_assign(vectors, centroids).collect():
        assigned.setdefault(r.list_id, []).append(r.vec_id)
    vecs = {r.vec_id: np.array(r.embedding, dtype="float64")
            for r in vectors.collect()}
    for cid, members in assigned.items():
        expect = np.mean([vecs[m] for m in members], axis=0)
        assert np.allclose(out[cid], expect, atol=1e-9)
    # Empty-cluster fallback: a far-away synthetic centroid keeps itself.
    rows = [(0, [1.0] * 16), (1, [-1.0] * 16)]
    iso = spark.createDataFrame(
        [(99, [float(x) for x in [1.0] * 16])],
        "vec_id long, embedding array<float>",
    )
    cents = spark.createDataFrame(
        rows, "centroid_id long, centroid_vec array<float>"
    )
    kept = {r.centroid_id: list(r.centroid_vec)
            for r in S.kmeans_update(iso, cents).collect()}
    assert kept[1] == [-1.0] * 16  # empty cluster -> previous vector
    assert kept[0] == [1.0] * 16   # singleton cluster -> its member


def test_semantic_dedup_subset_of_exact(vectors):
    """Within-cluster pairs are a subset of the exact all-pairs result at
    the same threshold (clustering can only LOSE cross-cluster pairs,
    never invent one)."""
    centroids = vectors.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    sem = {(r.id_a, r.id_b) for r in
           S.semantic_dedup_pairs(vectors, centroids, threshold=0.2).collect()}
    allp = {(r.id_a, r.id_b) for r in
            S.embedding_neardup_pairs(vectors, threshold=0.2).collect()}
    assert sem <= allp and len(sem) > 0


def test_similarity_new_ops_empty_inputs(spark, vectors):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    cents = vectors.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    assert S.semantic_dedup_pairs(empty, cents).count() == 0
    # empty corpus: every centroid falls back to its previous vector
    kept = S.kmeans_update(empty, cents).count()
    assert kept == 2


def test_no_wholestage_scope_reentrant(spark):
    """Nested/raced _no_wholestage scopes must restore the ORIGINAL conf
    value on the last exit — a naive prev-capture would 'restore' the
    inner scope's temporary false and leave whole-stage codegen off for
    the whole session."""
    from meshinsights_data_pipeline_spark.operators.similarity import (
        _no_wholestage,
    )

    key = "spark.sql.codegen.wholeStage"
    orig = spark.conf.get(key)
    with _no_wholestage(spark):
        assert spark.conf.get(key) == "false"
        with _no_wholestage(spark):  # the T1/T2 interleave, serialized
            assert spark.conf.get(key) == "false"
        # inner exit must NOT restore yet (outer scope still open)
        assert spark.conf.get(key) == "false"
    assert spark.conf.get(key) == orig


def test_semantic_decontamination_empty_benchmark(spark, vectors):
    """An EMPTY benchmark must not vanish the corpus: every corpus doc
    surfaces with max_sim NULL and contaminated=false (a cross-join shape
    would return an empty frame — indistinguishable from 'checked and
    clean'). Non-empty benchmark: one row per corpus doc, flags set."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = S.semantic_decontamination(vectors, empty).collect()
    assert len(out) == vectors.count()
    assert all(r.max_sim is None and r.contaminated is False for r in out)

    bench = vectors.filter(F.col("vec_id") < 2)
    out2 = S.semantic_decontamination(vectors, bench, threshold=0.999)
    rows = {r.id: r for r in out2.collect()}
    assert len(rows) == vectors.count()
    # a corpus vector identical to a benchmark vector flags itself
    assert rows[0].contaminated and rows[1].contaminated


def test_html_to_text_and_title(spark):
    cases = [
        (1, "<html><head><title>T1</title><script>if (a<b) alert('x');"
            "</script></head><body><p>Hello</p><p>world</p></body></html>"),
        (2, "<DIV>upper <B>case</B> tags</DIV><STYLE>p{color:red}</STYLE>"),
        (3, "a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;end"),
        (4, "no markup at all"),
        (5, "<p>broken <div unclosed"),
        (6, None),
    ]
    df = spark.createDataFrame(cases, "id long, h string")
    out = {r.id: (r.t, r.c) for r in df.select(
        "id", T.html_title(F.col("h")).alias("t"),
        T.html_to_text(F.col("h")).alias("c")).collect()}
    assert out[1] == ("T1", "T1 Hello world")
    assert out[2] == ("", "upper case tags")
    assert out[3] == ("", "a & b <tag> \"q\" 's' end")
    assert out[4] == ("", "no markup at all")
    # Malformed markup degrades to literal text (never an exception): an
    # unclosed tag has no '>' for <[^>]+> to consume, so it survives.
    assert out[5][1] == "broken <div unclosed"
    assert out[6] == (None, None)


def test_ivf_index_persisted_search(spark, vectors, tmp_path):
    """ivf_topk_indexed must (a) return exactly ivf_topk's results on the
    same centroid set and (b) physically read only the probed list
    directories from the index layout."""
    path = str(tmp_path / "ivf_index")
    centroids = vectors.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    S.write_ivf_index(vectors, centroids, path, files_per_list=1)
    q = vectors.filter(F.col("vec_id") == 0)

    indexed = S.ivf_topk_indexed(spark, path, q, centroids, k=5, nprobe=2)
    expected = {(r.query_id, r.neighbor_id, r.score, r.rank)
                for r in S.ivf_topk(vectors, q, centroids, k=5, nprobe=2).collect()}
    assert {(r.query_id, r.neighbor_id, r.score, r.rank)
            for r in indexed.collect()} == expected

    # Partition pruning: the isin filter must reach the scan as a
    # PartitionFilter (directory-level pruning), not a post-scan Filter.
    # (inputFiles() reports the unpruned relation, so inspect the plan.)
    assert len(spark.read.parquet(path).inputFiles()) == 4
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan_lines, plan
    assert any("list_id" in ln and "IN" in ln for ln in scan_lines), scan_lines


def _synthetic_payloads() -> dict[str, bytes]:
    """Minimal valid container headers built with struct alone — no
    imaging library needed to GENERATE them either, so this test is real
    in every environment."""
    import struct

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 640, 480)      # width, height
        + b"\x08\x06\x00\x00\x00" + b"\x00" * 4  # bit depth/color + fake CRC
    )
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    bmp = (
        b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
        + struct.pack("<IiiHH", 40, 256, -128, 1, 24)  # negative = top-down
        + b"\x00" * 24
    )
    # JPEG: SOI, APP0 stub, a DHT segment (must be SKIPPED, 0xC4 is not a
    # frame marker), then SOF0 with height=77, width=123.
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"
        + b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 77, 123) + b"\x03\x00\x00\x00"
    )
    return {"png": png, "gif": gif, "bmp": bmp, "jpeg": jpeg}


def test_probe_image_dims_headers():
    """The pure-stdlib header probe reads dimensions from PNG/GIF/BMP/JPEG
    containers and returns None (never raises) on garbage/truncation."""
    from meshinsights_data_pipeline_spark.operators import multimodal as M

    p = _synthetic_payloads()
    assert M.probe_image_dims(p["png"]) == (640, 480, "PNG")
    assert M.probe_image_dims(p["gif"]) == (320, 200, "GIF")
    assert M.probe_image_dims(p["bmp"]) == (256, 128, "BMP")  # abs(height)
    assert M.probe_image_dims(p["jpeg"]) == (123, 77, "JPEG")
    assert M.probe_image_dims(None) is None
    assert M.probe_image_dims(b"") is None
    assert M.probe_image_dims(b"not an image at all") is None
    assert M.probe_image_dims(b"\x89PNG\r\n\x1a\n\x00\x00") is None  # truncated
    assert M.probe_image_dims(b"\xff\xd8\xff\xd9") is None  # JPEG with no SOF


def test_image_decode_dims_probe_tier(spark):
    """decode_image_dims is real in THIS container via backend='probe':
    dimensions come off the Arrow-batched stage with no imaging library."""
    from meshinsights_data_pipeline_spark.operators import multimodal as M

    p = _synthetic_payloads()
    df = spark.createDataFrame(
        [("img1", "image", p["png"]), ("img2", "image", p["jpeg"]),
         ("aud1", "audio", p["png"]),   # non-image rows filtered out
         ("img3", "image", None),       # NULL payload null-fills
         ("img4", "image", b"garbage")],  # unrecognized null-fills
        "media_id string, modality string, payload binary",
    )
    rows = {r["media_id"]: r for r in M.decode_image_dims(df, backend="probe").collect()}
    assert sorted(rows) == ["img1", "img2", "img3", "img4"]
    assert (rows["img1"]["dec_width"], rows["img1"]["dec_height"], rows["img1"]["dec_mode"]) == (640, 480, "PNG")
    assert (rows["img2"]["dec_width"], rows["img2"]["dec_height"], rows["img2"]["dec_mode"]) == (123, 77, "JPEG")
    assert rows["img3"]["dec_width"] is None
    assert rows["img4"]["dec_width"] is None


def test_image_decode_pil_tier(spark):
    """The PIL tier: full decode where PIL exists; a loud
    NotImplementedError (never a silent fallback) where it doesn't."""
    import pytest

    from meshinsights_data_pipeline_spark.operators import multimodal as M

    if not M.HAS_PIL:
        with pytest.raises(NotImplementedError, match="imaging library"):
            M._decode_image(b"\x89PNG")
        df = spark.createDataFrame(
            [("img1", "image", b"\x00")],
            "media_id string, modality string, payload binary",
        )
        with pytest.raises(NotImplementedError, match="imaging library"):
            M.decode_image_dims(df, backend="pil")
        return
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (12, 7)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [("img1", "image", buf.getvalue()), ("img2", "image", None)],
        "media_id string, modality string, payload binary",
    )
    rows = {r["media_id"]: r for r in M.decode_image_dims(df, backend="pil").collect()}
    assert (rows["img1"]["dec_width"], rows["img1"]["dec_height"]) == (12, 7)
    assert rows["img1"]["dec_mode"] == "RGB"
    assert rows["img2"]["dec_width"] is None and rows["img2"]["dec_mode"] is None


def test_ann_recall_hand_computed(spark):
    """recall@k arithmetic on synthetic top-k frames, including a query
    the approximate index missed entirely (0 hits -> recall 0.0) and k
    truncation of an over-long input."""
    from meshinsights_data_pipeline_spark.operators.similarity import ann_recall

    exact = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2),
         (2, 99, 3)],  # rank 3 cut away by k=2
        "query_id long, neighbor_id long, rank int",
    )
    approx = spark.createDataFrame(
        [(1, 11, 1), (1, 77, 2), (1, 10, 3),
         (3, 30, 1)],  # query 3 has no exact row -> absent from output
        "query_id long, neighbor_id long, rank int",
    )
    rows = {r.query_id: r for r in ann_recall(exact, approx, k=2).collect()}
    assert sorted(rows) == [1, 2]
    # k=2 truth for q1 = {10, 11}; approx top-2 = {11, 77} -> 1 hit
    assert (rows[1].n_truth, rows[1].n_hits, rows[1].recall) == (2, 1, 0.5)
    assert (rows[2].n_truth, rows[2].n_hits, rows[2].recall) == (2, 0, 0.0)


def test_neardup_lsh_autobits_subset_and_sizing(vectors):
    """target_bucket_rows raises bits to hold occupancy constant; the
    LCG plane-prefix property makes the higher-bits candidate set a
    SUBSET of the fixed-bits one at the same seed, and the planted
    near-dup (nearly identical vectors agree on every hyperplane sign)
    must survive."""
    fixed = {
        (r.id_a, r.id_b)
        for r in S.embedding_neardup_pairs_lsh(
            vectors, threshold=0.95, bits=2, tables=2, seed=7
        ).collect()
    }
    # 41 rows / target 4 -> ceil(log2(10.25)) = 4 bits > the 2-bit floor
    auto = {
        (r.id_a, r.id_b)
        for r in S.embedding_neardup_pairs_lsh(
            vectors, threshold=0.95, bits=2, tables=2, seed=7,
            target_bucket_rows=4,
        ).collect()
    }
    assert auto <= fixed
    assert (0, 100) in auto
    # a target larger than the corpus leaves bits at the floor: identical output
    same = {
        (r.id_a, r.id_b)
        for r in S.embedding_neardup_pairs_lsh(
            vectors, threshold=0.95, bits=2, tables=2, seed=7,
            target_bucket_rows=1000,
        ).collect()
    }
    assert same == fixed


def test_neardup_lsh_autobits_cap_mirrors_oracle(vectors):
    """The auto-bits derivation must cap at max_auto_bits — the DuckDB
    oracle twin's CASE ladder falls through to its max_bits, so an
    uncapped Spark derivation would pick a WIDER bucket key than the
    oracle for corpora beyond target * 2^max_bits and the candidate
    sets could silently diverge. 41 rows / target 1 would derive 6
    bits; capped at 3 it must equal the explicit bits=3 run."""
    capped = {
        (r.id_a, r.id_b)
        for r in S.embedding_neardup_pairs_lsh(
            vectors, threshold=0.95, bits=2, tables=2, seed=7,
            target_bucket_rows=1, max_auto_bits=3,
        ).collect()
    }
    explicit = {
        (r.id_a, r.id_b)
        for r in S.embedding_neardup_pairs_lsh(
            vectors, threshold=0.95, bits=3, tables=2, seed=7,
        ).collect()
    }
    assert capped == explicit


def test_ivf_indexed_probe_collect_bounded_by_codebook(
    spark, vectors, tmp_path, monkeypatch
):
    """ivf_topk_indexed's driver-side collect is DISTINCT probe list ids,
    bounded by the codebook size — never |queries| x nprobe. The guard
    must fire if the probe join ever yields more ids than lists (which
    would mean the O(n_lists) driver contract is broken)."""
    path = str(tmp_path / "ivf_guard_index")
    centroids = vectors.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    S.write_ivf_index(vectors, centroids, path, files_per_list=1)
    q = vectors.filter(F.col("vec_id") < 3)
    # the normal path holds the bound: many queries, still <= 4 list ids
    out = S.ivf_topk_indexed(spark, path, q, centroids, k=3, nprobe=2)
    assert out.count() > 0

    real_probes = S._query_probes

    def bloated(queries, cents, id_col, vec_col, nprobe):
        p = real_probes(queries, cents, id_col, vec_col, nprobe)
        # forge per-query synthetic list ids: distinct count now scales
        # with |queries|, exactly the contract violation the guard exists
        # to catch
        return p.withColumn(
            "list_id", F.col("list_id") + F.col("query_id") * 1000
        )

    monkeypatch.setattr(S, "_query_probes", bloated)
    with pytest.raises(AssertionError, match="n_lists"):
        S.ivf_topk_indexed(spark, path, q, centroids, k=3, nprobe=2)


def test_payload_neardup_pairs(spark):
    """Byte-shingle near-dup over binary payloads: an exact duplicate
    pair verifies at jaccard 1.0, an aligned single-byte edit stays a
    near-dup (most byte windows intact), unrelated payloads never pair."""
    from meshinsights_data_pipeline_spark.operators.multimodal import (
        payload_neardup_pairs,
        payload_shingle_hashes,
    )

    base = bytes(range(200)) * 4  # 800 bytes, high shingle diversity
    edited = bytearray(base)
    edited[400] = 255  # aligned edit: only windows covering byte 400 change
    other = bytes(reversed(base))
    df = spark.createDataFrame(
        [(1, base), (2, bytes(base)), (3, bytes(edited)), (4, other)],
        "media_id long, payload binary",
    )
    rows = {
        (r.id_a, r.id_b): r.jaccard
        for r in payload_neardup_pairs(df, threshold=0.5).collect()
    }
    assert rows[(1, 2)] == 1.0
    assert 0.5 <= rows[(1, 3)] < 1.0 and rows[(2, 3)] == rows[(1, 3)]
    assert not any(4 in pair for pair in rows)
    # short payload: whole hex form is the single shingle
    tiny = spark.createDataFrame(
        [(1, b"abc"), (2, b"abc"), (3, b"xyz")], "media_id long, payload binary"
    )
    sh = payload_shingle_hashes(tiny).collect()
    assert len(sh) == 3  # one shingle per payload
    by_id = {r.media_id: r.h for r in sh}
    assert by_id[1] == by_id[2] != by_id[3]
