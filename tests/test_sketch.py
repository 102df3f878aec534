"""Sketch-family tests: HLL / CMS / KMV determinism, merge laws,
accuracy envelopes, and bit-identical python mirrors, plus the
seasonal-decomposition algebra."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.sketch import (
    SKETCH_PRIME,
    _hll_alpha,
    cms_counts,
    cms_estimate,
    cms_row_constants,
    hll_cardinality,
    hll_estimate_from_registers,
    hll_register_counts,
    kmv_cardinality,
    kmv_pairwise_overlap,
    kmv_sketch,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _hll_py(values, p):
    """Python mirror of register build + estimate (raw branch exact;
    linear-counting branch shares the single-ln round-once rule)."""
    m = 1 << p
    nbits = 60 - p
    scale = 61 - p
    regs: dict[int, int] = {}
    for v in values:
        h = _h60(str(v))
        reg = h % m
        w = h >> p
        rho = nbits + 1 if w == 0 else nbits - w.bit_length() + 1
        regs[reg] = max(regs.get(reg, 0), rho)
    n_regs = len(regs)
    z = sum(1 << (scale - r) for r in regs.values())
    z += (m - n_regs) * (1 << scale)
    raw = float(_hll_alpha(m)) * (float(m) * float(m) * float(1 << scale)) / float(z)
    if raw <= 2.5 * m and n_regs < m:
        est = float(m) * math.log(float(m) / (m - n_regs))
    else:
        est = raw
    return n_regs, est


def test_hll_matches_python_mirror_raw_branch(spark):
    vals = [f"value-{i}" for i in range(4000)]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v string")
    row = hll_cardinality(df, ["g"], "v", p=8).collect()[0]
    n_regs, est = _hll_py(vals, 8)
    assert row.n_registers == n_regs
    assert row.estimate == pytest.approx(round(est, 4), abs=1e-9)
    # 4000 distinct >> 2.5 * 256: the raw branch, no transcendental op
    assert est > 2.5 * 256


def test_hll_linear_counting_branch(spark):
    vals = [f"tiny-{i}" for i in range(40)]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v string")
    row = hll_cardinality(df, ["g"], "v", p=8).collect()[0]
    n_regs, est = _hll_py(vals, 8)
    assert row.n_registers == n_regs
    assert row.estimate == pytest.approx(round(est, 4), abs=1e-6)


def test_hll_accuracy_envelope(spark):
    true_n = 20_000
    df = spark.range(true_n).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    est = hll_cardinality(df, ["g"], "v", p=10).collect()[0].estimate
    # sigma ~ 1.04/sqrt(1024) = 3.25%; 4 sigma is a deterministic bound
    # here (no randomness: this exact dataset always gives this estimate)
    assert abs(est - true_n) / true_n < 0.13


def test_hll_state_merges_by_max(spark):
    a = spark.createDataFrame(
        [("g", f"a{i}") for i in range(500)], "g string, v string"
    )
    b = spark.createDataFrame(
        [("g", f"b{i}") for i in range(500)]
        + [("g", f"a{i}") for i in range(250)],  # overlap
        "g string, v string",
    )
    whole = hll_register_counts(a.unionByName(b), ["g"], "v", p=6)
    merged = (
        hll_register_counts(a, ["g"], "v", p=6)
        .unionByName(hll_register_counts(b, ["g"], "v", p=6))
        .groupBy("g", "_reg")
        .agg(F.max("_rho").alias("_rho"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )
    # and the estimate off the merged state equals the whole-data build
    e1 = hll_estimate_from_registers(whole, ["g"], 6).collect()[0]
    e2 = hll_estimate_from_registers(merged, ["g"], 6).collect()[0]
    assert e1 == e2


def _cms_bucket_py(v: str, r: int, depth: int, width: int) -> int:
    a, c = cms_row_constants(depth)
    h = _h60(str(v)) % SKETCH_PRIME
    return (a[r] * h + c[r]) % SKETCH_PRIME % width


def test_cms_estimate_upper_bounds_and_matches_mirror(spark):
    rows = [("g", f"t{i % 50}") for i in range(1000)] + [
        ("g", "hot")
    ] * 300
    df = spark.createDataFrame(rows, "g string, v string")
    depth, width = 4, 64  # narrow width to force collisions
    state = cms_counts(df, ["g"], "v", depth=depth, width=width)
    items = spark.createDataFrame(
        [("hot",), ("t0",), ("absent",)], "v string"
    )
    got = {
        r.v: r.estimate
        for r in cms_estimate(
            state, ["g"], items, "v", depth=depth, width=width
        ).collect()
    }
    # python mirror of the whole sketch
    from collections import Counter

    cells: Counter = Counter()
    for _, v in rows:
        for r in range(depth):
            cells[(r, _cms_bucket_py(v, r, depth, width))] += 1
    truth = Counter(v for _, v in rows)
    for item in ("hot", "t0", "absent"):
        mirror = min(
            cells.get((r, _cms_bucket_py(item, r, depth, width)), 0)
            for r in range(depth)
        )
        assert got[item] == mirror
        assert got[item] >= truth.get(item, 0)  # never underestimates


def test_cms_state_merges_by_sum(spark):
    a = spark.createDataFrame(
        [("g", f"x{i % 20}") for i in range(200)], "g string, v string"
    )
    b = spark.createDataFrame(
        [("g", f"x{i % 30}") for i in range(300)], "g string, v string"
    )
    whole = cms_counts(a.unionByName(b), ["g"], "v", depth=2, width=32)
    merged = (
        cms_counts(a, ["g"], "v", depth=2, width=32)
        .unionByName(cms_counts(b, ["g"], "v", depth=2, width=32))
        .groupBy("g", "_row", "_bucket")
        .agg(F.sum("_c").cast("bigint").alias("_c"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_kmv_exact_below_k_and_estimator_above(spark):
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(100)], "g string, v string"
    )
    exact = kmv_cardinality(
        kmv_sketch(df, ["g"], "v", k=256), ["g"], 256
    ).collect()[0]
    assert exact.n_sketch == 100 and exact.estimate == 100.0
    est = kmv_cardinality(
        kmv_sketch(df, ["g"], "v", k=16), ["g"], 16
    ).collect()[0]
    assert est.n_sketch == 16
    # python mirror of (k-1) * 2^60 / h_k
    hs = sorted(_h60(f"v{i}") for i in range(100))
    mirror = 15.0 * float(1 << 60) / float(hs[15])
    assert est.estimate == pytest.approx(round(mirror, 4), abs=1e-9)


def test_kmv_overlap_identical_and_disjoint(spark):
    rows = (
        [("a", f"shared{i}") for i in range(200)]
        + [("b", f"shared{i}") for i in range(200)]
        + [("c", f"only-c-{i}") for i in range(200)]
    )
    df = spark.createDataFrame(rows, "source string, v string")
    got = {
        (r.source_a, r.source_b): r
        for r in kmv_pairwise_overlap(df, "source", "v", k=64).collect()
    }
    ab = got[("a", "b")]
    assert ab.jaccard_est == 1.0  # identical sets
    ac = got[("a", "c")]
    assert ac.jaccard_est == 0.0 and ac.intersection_est == 0.0


def test_seasonal_decompose_reconstructs_and_centers(spark):
    import datetime as dt

    base = dt.date(2024, 1, 1)
    rows = []
    for d in range(35):
        # trend 10 + 0.5/day, weekly season, deterministic "noise"
        season = [5.0, -3.0, 0.0, 2.0, -1.0, -2.0, -1.0][d % 7]
        rows.append(
            ("g", base + dt.timedelta(days=d),
             10.0 + 0.5 * d + season + 0.1 * ((d * 7) % 3))
        )
    df = spark.createDataFrame(rows, "g string, day date, v double")
    from meshinsights_data_pipeline_spark.operators.trend import (
        seasonal_decompose,
    )

    out = seasonal_decompose(df, ["g"], "day", "v", period=7).collect()
    assert len(out) == 35
    full = [r for r in out if r.trend is not None]
    assert len(full) == 35 - 6  # 3 edge days each side
    for r in full:
        assert r.v == pytest.approx(
            r.trend + r.seasonal + r.resid, abs=5e-6
        )
    # seasonal components center to ~0 across one period
    season_by_phase = {}
    for r in full:
        season_by_phase.setdefault(r.seasonal, None)
    assert abs(sum(season_by_phase)) < 1e-3
    # edges carry NULLs, not dropped rows
    edges = [r for r in out if r.trend is None]
    assert all(r.seasonal is None and r.resid is None for r in edges)


def test_seasonal_decompose_rejects_even_period(spark):
    from meshinsights_data_pipeline_spark.operators.trend import (
        seasonal_decompose,
    )

    df = spark.createDataFrame([("g",)], "g string")
    with pytest.raises(ValueError):
        seasonal_decompose(df, ["g"], "day", "v", period=6)


def test_hist_quantiles_match_mirror_and_merge(spark):
    rows = [("g", float(v % 97)) for v in range(0, 500, 3)] + [
        ("g", 150.0),  # clamps into the top bin
        ("g", -5.0),   # clamps into bin 0
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    from meshinsights_data_pipeline_spark.operators.sketch import (
        hist_bin_counts,
        hist_quantile_estimate,
    )

    LO, HI, B = 0.0, 100.0, 32
    state = hist_bin_counts(df, ["g"], "v", LO, HI, bins=B)
    got = {
        r.q: (r.n, r.estimate)
        for r in hist_quantile_estimate(
            state, ["g"], [0.5, 0.9], LO, HI, bins=B
        ).collect()
    }
    # python mirror of bin assignment + cumulative interpolation
    import math as _m

    def bucket(v):
        cv = max(LO, min(HI, v))
        return min(B - 1, int(_m.floor(((cv - LO) / (HI - LO)) * B)))

    from collections import Counter

    counts = Counter(bucket(v) for _, v in rows)
    n = sum(counts.values())
    width = (HI - LO) / B
    for q in (0.5, 0.9):
        pos = q * n
        cum = 0.0
        for b in sorted(counts):
            prev, cum = cum, cum + counts[b]
            if pos > prev and pos <= cum:
                est = LO + (b + (pos - prev) / counts[b]) * width
                break
        assert got[q] == (n, round(est, 6))
    # merge law: state over union == SUM-merge of parts
    half1 = spark.createDataFrame(rows[:80], "g string, v double")
    half2 = spark.createDataFrame(rows[80:], "g string, v double")
    whole = hist_bin_counts(df, ["g"], "v", LO, HI, bins=B)
    merged = (
        hist_bin_counts(half1, ["g"], "v", LO, HI, bins=B)
        .unionByName(hist_bin_counts(half2, ["g"], "v", LO, HI, bins=B))
        .groupBy("g", "_bin")
        .agg(F.sum("_c").cast("bigint").alias("_c"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_hist_quantile_estimate_within_bin_width(spark):
    df = spark.range(10_000).select(
        F.lit("g").alias("g"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    from meshinsights_data_pipeline_spark.operators.sketch import (
        hist_bin_counts,
        hist_quantile_estimate,
    )

    state = hist_bin_counts(df, ["g"], "v", 0.0, 100.0, bins=64)
    got = {
        r.q: r.estimate
        for r in hist_quantile_estimate(
            state, ["g"], [0.5, 0.99], 0.0, 100.0, bins=64
        ).collect()
    }
    # uniform 0..99: p50 ~ 50, p99 ~ 99; bin width 1.5625
    assert abs(got[0.5] - 50.0) <= 1.5625
    assert abs(got[0.99] - 99.0) <= 1.5625


def test_seasonal_anomalies_flags_injected_spike(spark):
    import datetime as dt

    base = dt.date(2024, 1, 1)
    rows = []
    for d in range(42):
        season = [5.0, -3.0, 0.0, 2.0, -1.0, -2.0, -1.0][d % 7]
        v = 20.0 + season + 0.01 * ((d * 3) % 5)
        if d == 20:
            v += 50.0  # the injected anomaly
        rows.append(("g", base + dt.timedelta(days=d), v))
    df = spark.createDataFrame(rows, "g string, day date, v double")
    from meshinsights_data_pipeline_spark.operators.trend import (
        seasonal_anomalies,
    )

    out = seasonal_anomalies(
        df, ["g"], "day", "v", period=7, threshold=3.0
    ).collect()
    flagged = [r.day for r in out if r.is_anomaly]
    spike_day = base + dt.timedelta(days=20)
    assert spike_day in flagged
    # the clean series' residual MAD is tiny, so trend contamination
    # around the spike flags some neighbors too — but the spike itself
    # must carry BY FAR the largest score (it is the anomaly)
    by_score = sorted(out, key=lambda r: -r.score)
    assert by_score[0].day == spike_day
    assert by_score[0].score > 3 * by_score[1].score
