"""Similarity search over embedding columns (array<float>).

North-star extension: brute-force cosine top-k as the exact baseline, plus
an LSH-bucketed variant as the 100 TB scale path.

Scale design:
- cosine_topk: queries x corpus via broadcast of the (small) query set —
  the corpus never shuffles; per-row dot products run in codegen
  (F.aggregate over zipped arrays, all JVM-side). Exact; cost O(|Q| x N x d).
- rp_lsh_topk: random-hyperplane signatures bucket the corpus; only
  same-bucket pairs are scored. Approximate; recall tunes with bits/tables.
  At 1000 executors the bucket join replaces the full scan per query with
  bucket-local work — the standard billion-scale ANN layout (IVF-style
  partition pruning falls out of the bucket key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.barrier import materialize as _materialize


def _dot(a: Column, b: Column) -> Column:
    """Double-precision sequential dot product (left fold — deterministic,
    bit-identical to DuckDB's list arithmetic on DOUBLE[])."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _dot_d(a: Column, b: Column) -> Column:
    """Dot product over ALREADY-double arrays (no per-element cast) —
    identical values to _dot, used on pre-cast pair sides."""
    prods = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_score(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _prep(df: DataFrame, id_col: str, vec_col: str, prefix: str, dim: int | None = None) -> DataFrame:
    """Pair-side preparation computed ONCE PER ROW (map-side) instead of
    once per pair: cast the vector to double[] and materialize its norm.
    The per-pair expression then reduces to a single dot + one divide —
    bit-identical results (same operations, same order, just hoisted)."""
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(f"{prefix}_vec"),
        _norm(F.col(vec_col)).alias(f"{prefix}_norm"),
    )


def _pair_dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """The pair-scoring dot. Measured on local[32] @ sf0.1: the HOF fold
    over pre-cast double arrays BEATS a fully unrolled getItem expression
    ~3x (the 64-term tree blows past codegen method limits and getItem
    re-checks bounds per access), so the fold is the hot path on purpose.
    ``dim`` is accepted for API stability; results are identical either way."""
    return _dot_d(a, b)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_scores: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns [query_id, neighbor_id, score, rank]; self-matches excluded.
    Scores are rounded before ranking so the ordering is reproducible across
    engines/summation orders; ties break on neighbor id.
    """
    q = _prep(queries, id_col, vec_col, "q", dim).withColumnRenamed("q_id", "query_id")
    c = _prep(corpus, id_col, vec_col, "c", dim).withColumnRenamed("c_id", "neighbor_id")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score",
            F.round(
                _pair_dot(F.col("q_vec"), F.col("c_vec"), dim)
                / (F.col("q_norm") * F.col("c_norm")),
                round_scores,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    round_scores: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (score >= threshold, id_a<id_b).

    Exact all-pairs — a small-N verifier / recall oracle ONLY. The default
    scale path is :func:`embedding_neardup_pairs_lsh`, which scores only
    bucket-colliding pairs."""
    a = _prep(df, id_col, vec_col, "a", dim).withColumnRenamed("a_id", "id_a")
    b = _prep(df, id_col, vec_col, "b", dim).withColumnRenamed("b_id", "id_b")
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "score",
            F.round(
                _pair_dot(F.col("a_vec"), F.col("b_vec"), dim)
                / (F.col("a_norm") * F.col("b_norm")),
                round_scores,
            ),
        )
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def embedding_neardup_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bits: int = 4,
    tables: int = 2,
    seed: int = 7,
    dim: int | None = None,
    round_scores: int = 6,
) -> DataFrame:
    """Scale-safe near-dup: score only pairs colliding in >=1 LSH table.

    Multi-table random-hyperplane LSH: each of ``tables`` independent
    signatures buckets the corpus; candidate pairs are generated per
    (table, bucket) — never all-pairs — then deduped and exactly scored.
    Recall tunes with tables up / bits down; the shuffle key is (table,
    bucket), so work scales with bucket occupancy, not corpus^2. This is
    the default 100 TB near-dup path; the exact cross join above is the
    small-N verifier."""
    banded = None
    for t in range(tables):
        bt = rp_lsh_buckets(df, id_col, vec_col, bits, seed + t, dim).select(
            F.col(id_col), F.lit(t).alias("tbl"), F.col("bucket")
        )
        banded = bt if banded is None else banded.union(bt)
    # The banded frame feeds both sides of the bucket self-join; without a
    # barrier the tables x bits signature expressions run twice per row
    # (see operators.barrier.materialize).
    banded = _materialize(banded)
    a = banded.select(F.col(id_col).alias("id_a"), "tbl", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "tbl", "bucket")
    cands = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = _prep(df, id_col, vec_col, "a", dim).withColumnRenamed("a_id", "id_a")
    vb = _prep(df, id_col, vec_col, "b", dim).withColumnRenamed("b_id", "id_b")
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "score",
            F.round(
                _pair_dot(F.col("a_vec"), F.col("b_vec"), dim)
                / (F.col("a_norm") * F.col("b_norm")),
                round_scores,
            ),
        )
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its best centroid.

    ``centroids`` is a small frame [centroid_id, centroid_vec] (broadcast).
    Assignment = argmax cosine, ties to the lowest centroid id. Map-side
    except the broadcast — the list id is the partition-pruning key for IVF
    search, the same role the LSH bucket plays in rp_lsh_topk.
    """
    c = centroids.select(
        F.col("centroid_id"),
        F.transform(F.col("centroid_vec"), lambda x: x.cast("double")).alias("cv"),
        _norm(F.col("centroid_vec")).alias("cn"),
    )
    v = _prep(df, id_col, vec_col, "v")
    scored = v.crossJoin(F.broadcast(c)).withColumn(
        "cscore",
        F.round(_dot_d(F.col("v_vec"), F.col("cv")) / (F.col("v_norm") * F.col("cn")), 6),
    )
    w = Window.partitionBy("v_id").orderBy(F.col("cscore").desc(), F.col("centroid_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("v_id").alias(id_col), F.col("centroid_id").alias("list_id"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: score only corpus vectors whose inverted list
    is among the query's ``nprobe`` best centroids.

    The second ANN scale path next to RP-LSH: centroids partition the corpus
    into inverted lists (the write-time layout at scale — one list = one
    partition, pruned at read); each query probes nprobe lists, so cost is
    O(|Q| x N x nprobe / n_lists) instead of O(|Q| x N). Deterministic given
    fixed centroids, hence fully oracle-checkable.
    """
    corpus_lists = ivf_assign(corpus, centroids, id_col, vec_col)
    c = centroids.select(
        F.col("centroid_id"),
        F.transform(F.col("centroid_vec"), lambda x: x.cast("double")).alias("cv"),
        _norm(F.col("centroid_vec")).alias("cn"),
    )
    q = _prep(queries, id_col, vec_col, "q").withColumnRenamed("q_id", "query_id")
    q_scored = q.crossJoin(F.broadcast(c)).withColumn(
        "cscore",
        F.round(_dot_d(F.col("q_vec"), F.col("cv")) / (F.col("q_norm") * F.col("cn")), 6),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cscore").desc(), F.col("centroid_id").asc()
    )
    probes = (
        q_scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_vec", "q_norm", F.col("centroid_id").alias("list_id"))
    )
    cand = corpus_lists.join(F.broadcast(probes), "list_id").filter(
        F.col(id_col) != F.col("query_id")
    )
    cv = _prep(corpus, id_col, vec_col, "c").withColumnRenamed("c_id", id_col)
    scored = (
        cand.join(cv, id_col)
        .withColumn(
            "score",
            F.round(
                _dot_d(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ),
        )
        # a corpus vector can surface via one list only (hard assignment),
        # so no dedup needed before ranking
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "score", "rank")
    )


def _deterministic_hyperplanes(dim: int, bits: int, seed: int = 7) -> list[list[float]]:
    """Fixed pseudo-random unit-free hyperplanes (LCG-based, seedable,
    reproducible across runs without numpy RNG state)."""
    planes = []
    state = seed
    for _ in range(bits):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append(((state >> 20) % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def rp_lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (sign-bit signature).

    Map-side only; the bucket column is the shuffle/partition key for
    bucket-local ANN search. Pass ``dim`` explicitly to keep plan building
    job-free; when omitted it is discovered with a guarded single-row peek
    (an empty frame yields an empty result with the same schema).
    """
    if dim is None:
        head = df.select(vec_col).head(1)
        if not head:
            return df.select(F.col(id_col), F.col(vec_col)).withColumn(
                "bucket", F.lit(0).cast("int")
            )
        dim = len(head[0][0])
    planes = _deterministic_hyperplanes(dim, bits, seed)
    sig = None
    v = F.col(vec_col)
    for b, plane in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in plane])
        d = F.aggregate(
            F.zip_with(v, arr, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        bit = F.when(d > 0, F.lit(2 ** b)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return df.select(F.col(id_col), v.alias(vec_col)).withColumn("bucket", sig.cast("int"))


def rp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bits: int = 8,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only same-bucket corpus vectors.

    The scale path — the bucket equi-join prunes the candidate set by
    ~2^bits before any dot product runs."""
    def bucketed_prep(df: DataFrame, prefix: str) -> DataFrame:
        b = rp_lsh_buckets(df, id_col, vec_col, bits, seed, dim)
        return b.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(f"{prefix}_vec"),
            _norm(F.col(vec_col)).alias(f"{prefix}_norm"),
            "bucket",
        )

    cb = bucketed_prep(corpus, "c")
    qb = bucketed_prep(queries, "q").withColumnRenamed("q_id", "query_id")
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("c_id") != F.col("query_id"))
        .withColumn(
            "score",
            F.round(
                _pair_dot(F.col("q_vec"), F.col("c_vec"), dim)
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("c_id").alias("neighbor_id"), "score", "rank")
    )


# -- Product quantization (PQ) — the memory-compressed ANN path ------------
#
# Jegou et al. 2011 ("Product Quantization for Nearest Neighbor Search"):
# split each vector into m subvectors, quantize each against a ks-codeword
# codebook, store only the m byte-sized codes (64-dim float vector -> 8
# bytes), and answer queries by asymmetric distance computation (ADC): the
# query precomputes an m x ks table of subvector distances and every
# corpus distance is m table lookups + adds. At 100 TB the corpus-side
# state is ~1/64th the raw vectors and the scan is lookup-bound.
#
# Codebooks here are deterministic (same LCG family as the RP-LSH
# hyperplanes) so encoding and search are pure functions — trained
# k-means codebooks drop in by replacing _deterministic_codebooks.
# Distance math is arranged so both engines compute IDENTICAL doubles:
# ||s - c||^2 is evaluated as dot(s,s) - 2*dot(s,c) + ||c||^2 with
# sequential-fold dots (bit-identical to DuckDB list_dot_product) and
# ||c||^2 precomputed in Python and embedded as a literal in both.


def _deterministic_codebooks(
    dim: int, m: int, ks: int, seed: int = 11
) -> list[list[list[float]]]:
    """m codebooks of ks codewords of dim//m floats each, LCG-generated."""
    sub = dim // m
    state = seed
    books = []
    for _ in range(m):
        words = []
        for _ in range(ks):
            w = []
            for _ in range(sub):
                state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
                w.append(((state >> 20) % 2001 - 1000) / 1000.0)
            words.append(w)
        books.append(words)
    return books


def _norm_sq(w: list[float]) -> float:
    """Left-fold sum of squares in Python — embedded as the ||c||^2
    literal in both engines."""
    acc = 0.0
    for x in w:
        acc = acc + x * x
    return acc


def _unrolled_dot(s: Column, w: list[float]) -> Column:
    """dot(s, literal w) as an unrolled left-associated sum — same values
    as the sequential fold (identical op order), but a flat codegen-able
    tree instead of a HOF lambda (see plan-cost note in pq_encode)."""
    t = F.element_at(s, 1) * F.lit(w[0])
    for j in range(1, len(w)):
        t = t + F.element_at(s, j + 1) * F.lit(w[j])
    return t


def pq_encode(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    ks: int = 16,
    seed: int = 11,
) -> DataFrame:
    """PQ codes per vector: [id, codes array<int>] (codes[i] = argmin_j
    ||sub_i - codeword_ij||^2, ties to the lowest codeword id via
    first-position-of-min). Map-side only — no shuffle; the codes frame
    is the compact corpus representation pq_topk scans.

    The constant dot(s,s) term cancels inside a fixed subvector's argmin,
    so encoding scores are ||c||^2 - 2*dot(s,c)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub_d = dim // m
    books = _deterministic_codebooks(dim, m, ks, seed)
    # Two expression-shape rules, both measured at sf0.01:
    # 1. UNROLLED element_at dots, not HOF folds: m*ks = 128 small dots as
    #    aggregate/zip_with lambdas cost MINUTES of plan analysis+codegen
    #    (each lambda pair is expensive to analyze and the cost is
    #    super-linear in count); unrolled 8-term sums take the encode from
    #    161s to 2.4s cold. (The opposite trade from the single 64-dim
    #    pair-scoring dot, where the fold wins — see _pair_dot.)
    #    Left-assoc add order keeps values bit-identical to DuckDB's
    #    list_dot_product.
    # 2. Staged projections keep every non-cheap expression
    #    single-occurrence (the naive form inlines each scores array into
    #    both array_min and array_position).
    staged = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    ).select(
        F.col(id_col),
        *[F.slice("_v", i * sub_d + 1, sub_d).alias(f"_s{i}") for i in range(m)],
    )
    score_cols = []
    for i in range(m):
        s = F.col(f"_s{i}")
        score_cols.append(
            F.array(
                *[
                    F.lit(_norm_sq(w)) - F.lit(2.0) * _unrolled_dot(s, w)
                    for w in books[i]
                ]
            ).alias(f"_sc{i}")
        )
    scored = staged.select(F.col(id_col), *score_cols)
    coded = scored.select(
        F.col(id_col),
        *[
            (F.array_position(F.col(f"_sc{i}"), F.array_min(F.col(f"_sc{i}"))) - 1)
            .cast("int")
            .alias(f"_c{i}")
            for i in range(m)
        ],
    )
    return coded.select(
        F.col(id_col),
        F.array(*[F.col(f"_c{i}") for i in range(m)]).alias("codes"),
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    ks: int = 16,
    k: int = 10,
    seed: int = 11,
) -> DataFrame:
    """PQ/ADC approximate top-k: [query_id, neighbor_id, adist, rank]
    (ascending approximate squared distance, ties to the lowest id).

    Each query precomputes its m x ks distance table (broadcast — query
    sets are small); every corpus row costs m element_at lookups + adds
    over its codes. The corpus side never touches raw vectors after
    encoding — that is PQ's memory story at scale."""
    sub_d = dim // m
    books = _deterministic_codebooks(dim, m, ks, seed)
    codes = pq_encode(corpus, id_col, vec_col, dim, m, ks, seed)
    # Same unrolled-dot + staged-projection shape as pq_encode (the
    # query-side self-dot dq_i stays a fold: only m of them, and it keeps
    # the value-order identical to list_dot_product(sub, sub)).
    q_staged = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    ).select(
        "query_id",
        *[F.slice("_v", i * sub_d + 1, sub_d).alias(f"_s{i}") for i in range(m)],
    ).select(
        "query_id",
        *[F.col(f"_s{i}") for i in range(m)],
        *[_dot_d(F.col(f"_s{i}"), F.col(f"_s{i}")).alias(f"_dq{i}") for i in range(m)],
    )
    tab_cols = []
    for i in range(m):
        s = F.col(f"_s{i}")
        tab_cols.append(
            F.array(
                *[
                    F.col(f"_dq{i}")
                    - F.lit(2.0) * _unrolled_dot(s, w)
                    + F.lit(_norm_sq(w))
                    for w in books[i]
                ]
            ).alias(f"_t{i}")
        )
    qtab = q_staged.select("query_id", *tab_cols)
    joined = codes.crossJoin(F.broadcast(qtab)).filter(
        F.col(id_col) != F.col("query_id")
    )
    adist = None
    for i in range(m):
        term = F.element_at(F.col(f"_t{i}"), F.element_at("codes", i + 1) + 1)
        adist = term if adist is None else adist + term
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(adist, 6).alias("adist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adist", F.col("rank").cast("bigint").alias("rank"))
    )
