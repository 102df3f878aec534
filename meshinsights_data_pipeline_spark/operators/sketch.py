"""Constant-memory profiling sketches — HLL cardinality, count-min
frequencies, KMV distinct/overlap — the 100 TB answer to exact
DISTINCT / frequency / set-overlap profiling.

The profiling family so far is exact: x12 distinct counts, x36/x50
corpus profiles, x57 exact source-overlap matrices. Exact answers
shuffle corpus-sized key sets; at 100 TB the profiling questions
("how many distinct users per segment", "how often does this token
appear", "how much do two crawls overlap") need CONSTANT state per
group. This module provides the three standard mergeable sketches,
each with the engine's cross-engine determinism discipline — a sketch
here is a pure function of the data (no RNG, no partition-order
dependence), so the same corpus yields the SAME registers, buckets,
and minima in Spark, DuckDB, or a python mirror, and every estimate is
oracle-checkable bit-for-bit:

- **HyperLogLog** (Flajolet et al. 2007; the practical form follows
  Heule et al. 2013's HLL++ small-range correction): register index =
  ``md5_int60(v) mod m``, rank = leading-zero position of the
  remaining ``60-p`` bits via a generated comparison CASE (never IEEE
  log2). Registers MAX-merge — the streaming twin folds micro-batches
  into the same (group, register) -> max(rho) state. The harmonic-sum
  term 2^-rho is scaled by 2^(61-p) into EXACT integers folded in
  DECIMAL(38,0); alpha_m is a shared 12-decimal literal; the estimate
  performs ONE IEEE division (plus one ln in the linear-counting
  branch, rounded once).
- **Count-min** (Cormode & Muthukrishnan 2005): ``depth`` bucket rows
  per value from ONE md5 spread by exact-BIGINT affine maps (the
  bootstrap ``replicate_constants`` lesson — never depth md5s per
  row). Counts SUM-merge. Point estimate = min over rows.
- **KMV / bottom-k** (Bar-Yossef et al. 2002; Beyer et al. 2007 for
  the unbiased (k-1)/h_k estimator and sketch-union overlap): the k
  smallest distinct ``md5_int60`` values per group. Sketches
  k-smallest-of-union merge; Jaccard/intersection between groups reads
  off the union sketch (the standard theta-sketch-style estimator).

Scale shapes: HLL state is |groups| x m registers, CMS is |groups| x
depth x width counters, KMV is |groups| x k minima — all independent
of corpus size; every sketch builds in ONE map-side-combined shuffle
of its constant-size key space. The corpus is never shuffled, never
paired.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.dedup import md5_int60

#: same 33-bit prime as the MinHash / bootstrap affine families
SKETCH_PRIME = 4294967311

_TWO_POW_60 = float(1 << 60)


def _hll_alpha(m: int) -> str:
    """Bias-correction constant as a shared 12-decimal literal (the
    BENFORD_EXPECTED discipline: both engines embed the SAME rounded
    constant instead of each computing 0.7213/(1 + 1.079/m))."""
    if m == 16:
        a = 0.673
    elif m == 32:
        a = 0.697
    elif m == 64:
        a = 0.709
    else:
        a = 0.7213 / (1.0 + 1.079 / m)
    return f"{a:.12f}"


def hll_rho_expr(w: Column, nbits: int) -> Column:
    """Leading-zero rank of ``w`` within ``nbits`` bits: the smallest
    r >= 1 with w >= 2^(nbits - r), else nbits + 1 (w == 0). A generated
    descending comparison chain — exact integer compares, no IEEE log2,
    identical literals in the SQL twin (``hll_rho_sql``)."""
    chain = F.when(w >= F.lit(1 << (nbits - 1)), F.lit(1))
    for r in range(2, nbits + 1):
        chain = chain.when(w >= F.lit(1 << (nbits - r)), F.lit(r))
    return chain.otherwise(F.lit(nbits + 1))


def hll_rho_sql(w_expr: str, nbits: int) -> str:
    """The DuckDB twin of ``hll_rho_expr`` — same generated literals."""
    whens = " ".join(
        f"WHEN {w_expr} >= {1 << (nbits - r)} THEN {r}"
        for r in range(1, nbits + 1)
    )
    return f"CASE {whens} ELSE {nbits + 1} END"


def hll_register_counts(
    df: DataFrame,
    group_by: Sequence[str],
    value_col: str,
    p: int = 10,
) -> DataFrame:
    """Mergeable HLL state: ``[*group_by, _reg, _rho]`` with one row per
    non-empty register — ``_rho`` is the MAX rank seen. NULL group keys
    and NULL values are excluded. Merging two states (or micro-batches)
    is ``union -> groupBy(_reg).max(_rho)`` — the streaming twin's fold.

    ``p`` (4..16) sets m = 2^p registers: the accuracy/state dial
    (relative error ~1.04/sqrt(m)); it is part of the sketch's identity.
    ONE shuffle of at most |groups| x m rows after the map-side combine;
    the corpus itself is never shuffled.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    groups = list(group_by)
    m = 1 << p
    nbits = 60 - p
    keep = F.col(value_col).isNotNull()
    for g in groups:
        keep = keep & F.col(g).isNotNull()
    h = md5_int60(F.col(value_col).cast("string"))
    return (
        df.filter(keep)
        .select(
            *groups,
            (h % F.lit(m)).cast("int").alias("_reg"),
            # shiftright, NOT floor(h / m): bigint/int divides as DOUBLE
            # and h reaches 2^60 > 2^53 — the quotient would round
            hll_rho_expr(F.shiftright(h, p), nbits)
            .cast("int")
            .alias("_rho"),
        )
        .groupBy(*groups, "_reg")
        .agg(F.max("_rho").alias("_rho"))
    )


def hll_estimate_from_registers(
    state: DataFrame,
    group_by: Sequence[str],
    p: int,
    round_to: int = 4,
) -> DataFrame:
    """Cardinality estimate from HLL state:
    ``[*group_by, n_registers, estimate]``.

    The 2^-rho harmonic terms are scaled by 2^(61-p) into exact
    integers via a generated rho -> literal CASE (DECIMAL(38,0) fold,
    order-independent); empty registers contribute V x 2^(61-p) in
    closed form. Raw estimate = alpha_m * m^2 * 2^(61-p) / Z — one IEEE
    division; the Flajolet/Heule small-range branch switches to linear
    counting m * ln(m / V) when raw <= 2.5m and V > 0 (one ln, rounded
    once — and its argument domain is FINITE: m/V for V in 1..m-1, so
    cross-engine parity was verified EXHAUSTIVELY for every possible
    output at m = 16/64/256/1024 rather than assumed).
    """
    groups = list(group_by)
    m = 1 << p
    nbits = 60 - p
    scale = 61 - p  # term for rho: 2^(scale - rho), an exact integer
    term = F.when(F.col("_rho") == 1, F.lit(1 << (scale - 1)))
    for r in range(2, nbits + 2):
        term = term.when(F.col("_rho") == r, F.lit(1 << (scale - r)))
    alpha = _hll_alpha(m)
    agg = state.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_registers"),
        F.sum(term.cast("decimal(38,0)")).alias("_z_filled"),
    )
    v_zero = (F.lit(m) - F.col("n_registers")).cast("decimal(38,0)")
    z = (
        F.col("_z_filled")
        + v_zero * F.lit(1 << scale).cast("decimal(38,0)")
    ).cast("double")
    raw = (
        F.lit(float(alpha))
        * F.lit(float(m) * float(m) * float(1 << scale))
        / z
    )
    lc = F.lit(float(m)) * F.log(
        F.lit(float(m)) / (F.lit(m) - F.col("n_registers")).cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("n_registers") < F.lit(m)), lc
    ).otherwise(raw)
    return agg.select(
        *groups,
        "n_registers",
        (F.round(est, round_to) + F.lit(0.0)).alias("estimate"),
    )


def hll_cardinality(
    df: DataFrame,
    group_by: Sequence[str],
    value_col: str,
    p: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """Per-group approximate COUNT(DISTINCT value):
    ``[*group_by, n_registers, estimate]`` — build + estimate in one
    plan (state never larger than |groups| x 2^p)."""
    return hll_estimate_from_registers(
        hll_register_counts(df, group_by, value_col, p=p),
        group_by,
        p,
        round_to=round_to,
    )


def cms_row_constants(depth: int) -> tuple[list[int], list[int]]:
    """Per-row affine constants (a_r, c_r) — fixed odd-step recurrences
    (the bootstrap ``replicate_constants`` pattern), identical literals
    in both engines. a_r in [1, 2^29) keeps a_r * (P-1) < 2^62."""
    a = [((977 + 86243 * r) % 536870909) or 1 for r in range(depth)]
    c = [(389 + 21701 * r) % SKETCH_PRIME for r in range(depth)]
    return a, c


def _cms_bucket(h: Column, a: int, c: int, width: int) -> Column:
    return (
        (F.lit(a) * h + F.lit(c)) % F.lit(SKETCH_PRIME) % F.lit(width)
    ).cast("int")


def cms_counts(
    df: DataFrame,
    group_by: Sequence[str],
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Mergeable count-min state: ``[*group_by, _row, _bucket, _c]`` —
    SUM-merge across states/micro-batches. ONE md5 per input row spread
    over ``depth`` bucket rows by exact affine maps; the shuffle key
    space is |groups| x depth x width regardless of corpus size.

    ``depth``/``width`` are the error dials (overestimate <= 2N/width
    with prob 1 - 2^-depth) and part of the sketch's identity.
    """
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")
    groups = list(group_by)
    keep = F.col(value_col).isNotNull()
    for g in groups:
        keep = keep & F.col(g).isNotNull()
    a_r, c_r = cms_row_constants(depth)
    h = (md5_int60(F.col(value_col).cast("string")) % F.lit(SKETCH_PRIME))
    base = df.filter(keep).select(*groups, h.alias("_h"))
    rows = base.select(
        *groups,
        "_h",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("_row"),
                    _cms_bucket(F.col("_h"), a_r[r], c_r[r], width)
                    .alias("_bucket"),
                )
                for r in range(depth)
            ])
        ).alias("_rb"),
    ).select(
        *groups,
        F.col("_rb._row").alias("_row"),
        F.col("_rb._bucket").alias("_bucket"),
    )
    return rows.groupBy(*groups, "_row", "_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )


def cms_estimate(
    state: DataFrame,
    group_by: Sequence[str],
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for ``items`` (a SMALL frame of
    candidate values, broadcast): ``[*group_by, <item_col>, estimate]``
    = min over the depth rows of the item's bucket counts — the
    classic CMS upper-bound estimate (>= true count, never under).

    Every (group-in-state, item) pair appears in the output: a cell
    with no state row means NO input value in that group hashed there,
    i.e. its count — and the min — is 0 (grid + LEFT join + coalesce,
    the bootstrap left-join lesson: rows must not silently vanish).
    """
    groups = list(group_by)
    a_r, c_r = cms_row_constants(depth)
    h = (md5_int60(F.col(item_col).cast("string")) % F.lit(SKETCH_PRIME))
    probes = items.filter(F.col(item_col).isNotNull()).select(
        F.col(item_col), h.alias("_h")
    ).select(
        item_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("_row"),
                    _cms_bucket(F.col("_h"), a_r[r], c_r[r], width)
                    .alias("_bucket"),
                )
                for r in range(depth)
            ])
        ).alias("_rb"),
    ).select(
        item_col,
        F.col("_rb._row").alias("_row"),
        F.col("_rb._bucket").alias("_bucket"),
    )
    grid = state.select(*groups).distinct().crossJoin(F.broadcast(probes))
    joined = grid.join(state, [*groups, "_row", "_bucket"], "left")
    return joined.groupBy(*groups, item_col).agg(
        F.min(F.coalesce(F.col("_c"), F.lit(0).cast("bigint"))).alias(
            "estimate"
        )
    )


def kmv_sketch(
    df: DataFrame,
    group_by: Sequence[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Bottom-k sketch: the k smallest DISTINCT ``md5_int60`` values per
    group — ``[*group_by, _h]``. Merging = k-smallest-of-union (rerun
    the rank over the unioned sketches). One distinct-collapse shuffle
    on (group, hash) + a window over at most |groups| x k survivors per
    partition-local top-k (Spark plans the rank filter as a
    TakeOrdered-style partial sort, never a full sort of the corpus).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    groups = list(group_by)
    keep = F.col(value_col).isNotNull()
    for g in groups:
        keep = keep & F.col(g).isNotNull()
    hashes = (
        df.filter(keep)
        .select(
            *groups,
            md5_int60(F.col(value_col).cast("string")).alias("_h"),
        )
        .groupBy(*groups, "_h")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    w = Window.partitionBy(*groups).orderBy("_h")
    return (
        hashes.select(*groups, "_h", F.row_number().over(w).alias("_rk"))
        .filter(F.col("_rk") <= F.lit(k))
        .drop("_rk")
    )


def kmv_cardinality(
    sketch: DataFrame,
    group_by: Sequence[str],
    k: int,
    round_to: int = 4,
) -> DataFrame:
    """Distinct-count estimate from a bottom-k sketch:
    ``[*group_by, n_sketch, estimate]``. A group with fewer than k
    hashes is EXACT (the sketch saw everything); otherwise the
    Beyer et al. unbiased estimator (k-1) * 2^60 / h_k — one IEEE
    division on exact-integer operands."""
    groups = list(group_by)
    agg = sketch.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sketch"),
        F.max("_h").alias("_hk"),
    )
    est = F.when(
        F.col("n_sketch") < F.lit(k),
        F.col("n_sketch").cast("double"),
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_TWO_POW_60)
        / F.col("_hk").cast("double")
    )
    return agg.select(
        *groups,
        "n_sketch",
        (F.round(est, round_to) + F.lit(0.0)).alias("estimate"),
    )


def kmv_pairwise_overlap(
    df: DataFrame,
    source_col: str,
    value_col: str,
    k: int = 256,
    round_to: int = 4,
) -> DataFrame:
    """Estimated pairwise overlap between sources WITHOUT an exact
    corpus-sized join (the x57 exact matrix's 100 TB alternative):
    ``[source_a, source_b, n_union_sketch, jaccard_est,
    union_est, intersection_est]`` for each unordered pair.

    Method (Beyer et al. 2007): per pair, the union's bottom-k sketch
    is the k smallest of the two sketches' union; Jaccard = fraction of
    union-sketch hashes present in BOTH sides (exact membership — a
    hash in both sketches means the value is in both sets);
    intersection_est = jaccard_est * union_est, rounded once. Sketches
    are |S| x k rows, so the pair stage is |S|^2 x k — never corpus^2.
    The sketch is MATERIALIZED (the diamond-barrier lesson): it feeds
    the source list and both pair sides, and without the barrier each
    consumer replays the corpus scan (measured: 6 scans -> 1).
    """
    from meshinsights_data_pipeline_spark.operators.barrier import (
        materialize as _materialize,
    )

    sk = _materialize(kmv_sketch(df, [source_col], value_col, k=k))
    sources = sk.select(F.col(source_col).alias("_s")).distinct()
    pairs = (
        sources.alias("l")
        .join(
            sources.select(F.col("_s").alias("_t")).alias("r"),
            F.col("_s") < F.col("_t"),
        )
        .select(
            F.col("_s").alias("source_a"), F.col("_t").alias("source_b")
        )
    )
    left = pairs.join(
        sk.select(
            F.col(source_col).alias("source_a"), "_h",
            F.lit(1).alias("_in_a"),
        ),
        "source_a",
    )
    right = pairs.join(
        sk.select(
            F.col(source_col).alias("source_b"), "_h",
            F.lit(1).alias("_in_b"),
        ),
        "source_b",
    )
    both = (
        left.select("source_a", "source_b", "_h", "_in_a",
                    F.lit(0).alias("_in_b"))
        .unionByName(
            right.select("source_a", "source_b", "_h",
                         F.lit(0).alias("_in_a"), "_in_b")
        )
        .groupBy("source_a", "source_b", "_h")
        .agg(
            F.max("_in_a").alias("_in_a"),
            F.max("_in_b").alias("_in_b"),
        )
    )
    w = Window.partitionBy("source_a", "source_b").orderBy("_h")
    union_sk = both.select(
        "source_a", "source_b", "_h", "_in_a", "_in_b",
        F.row_number().over(w).alias("_rk"),
    ).filter(F.col("_rk") <= F.lit(k))
    agg = union_sk.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_union_sketch"),
        F.sum(
            (F.col("_in_a") * F.col("_in_b")).cast("bigint")
        ).alias("_n_both"),
        F.max("_h").alias("_hk"),
    )
    union_est = F.when(
        F.col("n_union_sketch") < F.lit(k),
        F.col("n_union_sketch").cast("double"),
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_TWO_POW_60)
        / F.col("_hk").cast("double")
    )
    jac = F.col("_n_both").cast("double") / F.col("n_union_sketch")
    return agg.select(
        "source_a",
        "source_b",
        "n_union_sketch",
        (F.round(jac, round_to) + F.lit(0.0)).alias("jaccard_est"),
        (F.round(union_est, round_to) + F.lit(0.0)).alias("union_est"),
        (F.round(jac * union_est, round_to) + F.lit(0.0)).alias(
            "intersection_est"
        ),
    )


def hist_bin_counts(
    df: DataFrame,
    group_by: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Mergeable fixed-bound equal-width histogram state:
    ``[*group_by, _bin, _c]`` — SUM-merge across states/micro-batches
    (the streaming-KS fixed-bounds rule: ``lo``/``hi``/``bins`` are the
    state's identity; data-derived bounds would re-bin history).
    Values clamp into the edge bins (the clamp-before-cast rule), so
    out-of-range feeds surface as edge-bin mass instead of dropping.
    ONE shuffle of at most |groups| x bins rows after the map-side
    combine. NULL/NaN values and NULL group keys are excluded.
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    if not lo < hi:
        raise ValueError(f"need lo < hi, got {lo}, {hi}")
    groups = list(group_by)
    v = F.col(value_col).cast("double")
    keep = v.isNotNull() & ~F.isnan(v)
    for g in groups:
        keep = keep & F.col(g).isNotNull()
    cv = F.greatest(F.lit(float(lo)), F.least(F.lit(float(hi)), v))
    t = (cv - F.lit(float(lo))) / F.lit(float(hi) - float(lo))
    bucket = F.least(
        F.lit(bins - 1), F.floor(t * F.lit(float(bins))).cast("int")
    )
    return (
        df.filter(keep)
        .select(*groups, bucket.alias("_bin"))
        .groupBy(*groups, "_bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    )


def hist_quantile_estimate(
    state: DataFrame,
    group_by: Sequence[str],
    qs: Sequence[float],
    lo: float,
    hi: float,
    bins: int = 128,
    round_to: int = 6,
) -> DataFrame:
    """Per-group quantile estimates from histogram state:
    ``[*group_by, q, n, estimate]`` — the mergeable/streaming
    alternative to the exact-percentile sort (x61/x95's 100 TB tier
    note made concrete): error is bounded by the bin width, state by
    |groups| x bins, and the estimate is a pure function of the counts.

    Method: the target position is q * n (continuous); the containing
    bin is the one whose cumulative count first reaches it, and the
    estimate interpolates linearly within that bin:
    ``lo + (bin + (pos - cum_prev) / c_bin) * bin_width``. All
    comparisons run on exact-integer cumulative counts (cast to double
    well under 2^53); bin_width is a python-computed shared literal;
    the interpolation is fixed-order single IEEE ops, rounded once.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"each q must be in (0, 1], got {q}")
    groups = list(group_by)
    width = (float(hi) - float(lo)) / float(bins)
    w_cum = (
        Window.partitionBy(*groups)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*groups)
    cum = state.select(
        *groups,
        "_bin",
        F.col("_c").cast("double").alias("_cd"),
        F.sum("_c").over(w_cum).cast("double").alias("_cum"),
        F.sum("_c").over(w_all).cast("bigint").alias("n"),
    )
    probes = cum.select(
        *groups,
        "_bin",
        "_cd",
        "_cum",
        "n",
        F.explode(
            F.array(*[F.lit(float(q)) for q in qs])
        ).alias("q"),
    )
    pos = F.col("q") * F.col("n").cast("double")
    prev = F.col("_cum") - F.col("_cd")
    picked = probes.filter((pos > prev) & (pos <= F.col("_cum")))
    est = (
        F.lit(float(lo))
        + (
            F.col("_bin").cast("double")
            + (pos - prev) / F.col("_cd")
        )
        * F.lit(width)
    )
    return picked.select(
        *groups,
        "q",
        "n",
        (F.round(est, round_to) + F.lit(0.0)).alias("estimate"),
    )
