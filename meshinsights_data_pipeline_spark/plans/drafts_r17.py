"""Round-17 anchor DRAFTS — NOT registered.

The r16 driver window is consumed by the staged-r15 registration
(x124–x130) plus the r12-staleness rotation, so the operators added
THIS round — the constant-memory sketch-profiling family (HLL
cardinality x131, count-min heavy-hitters x132, KMV overlap x133,
fixed-bound histogram quantiles x135), the seasonal layer over the
trend family (decomposition x134, MAD-residual anomalies x136), and
the experimentation closers (OLS fit x137, difference-in-differences
x138, minimum detectable effect x139) — ship with their anchor
queries and DuckDB oracles staged HERE, proven green by
``tests/test_oracle_drafts.py`` (which parametrizes over every draft
generation). Round 17 registers each (builder, SQL) pair and gives it
a window slot — registration is a copy, not new work (the r13 → r14 →
r15 → r16 precedent).

Round-17 window math (for whoever rotates next): the FIRST THREE
slots are RESERVED for the trio deferred in both r15 and r16 —
q68, x24_source_quota, x40_shuffle_shards (r12-stale, four rounds by
r17; the r16 verdict's standing instruction). Then one slot per draft
staged here (NINE: x131–x139), then fill from the r13-stale cohort,
recomputed from the CORRECTNESS_r1-r16 union AT REGISTRATION TIME
(the r15 "41 vs 40" lesson — do not trust this docstring's arithmetic
over the union): after the r16 rotation the r13-checked cohort is
expected to be 50 queries; 3 (deferred trio) + 9 (drafts) + 38
heaviest-r13 = 50, deferring the remaining ~12 lightest r13 queries
by the r16 gate-run warm time to r18.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.session import read_table

_H60 = "(('0x' || substring(md5({s}), 1, 15))::BIGINT)"
_NORM = (
    "trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'))"
)


def x131_hll_cardinality(spark: SparkSession, sf_dir: str):
    """Per-source HLL approximate COUNT(DISTINCT text) at p=8 (m=256
    registers — constant state per source vs the corpus-keyed shuffle
    an exact distinct needs at 100 TB). Register index/rank come from
    one md5 per row; the rank is a generated integer-comparison chain
    (never IEEE log2), the harmonic sum folds as exact scaled integers
    in DECIMAL(38,0), alpha_m is a shared 12-decimal literal, and the
    estimate is ONE IEEE division. At sf0.01 the per-source distinct
    counts are small, so the Heule linear-counting branch IS exercised
    — its single ln has a FINITE argument domain (m/V, V in 1..m-1),
    and the staging session verified all 255 possible m=256 outputs
    (and the m=16/64/1024 domains) bit-identical between Spark's
    Math.log and DuckDB's ln after the round-4: the branch is
    exhaustively deterministic cross-engine, not probabilistically."""
    from meshinsights_data_pipeline_spark.operators.sketch import (
        hll_cardinality,
    )

    docs = read_table(spark, sf_dir, "documents")
    return hll_cardinality(docs, ["source"], "text", p=8).orderBy(
        "source"
    )


def _x131_sql() -> str:
    from meshinsights_data_pipeline_spark.operators.sketch import (
        _hll_alpha,
        hll_rho_sql,
    )

    p = 8
    m = 1 << p
    nbits = 60 - p
    scale = 61 - p
    rho = hll_rho_sql(f"(h >> {p})", nbits)
    term = "CASE rho " + " ".join(
        f"WHEN {r} THEN {1 << (scale - r)}" for r in range(1, nbits + 2)
    ) + " END"
    alpha = _hll_alpha(m)
    num = repr(float(m) * float(m) * float(1 << scale))
    return f"""
WITH base AS (
    SELECT source, {_H60.format(s="text")} AS h
    FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
),
regs AS (
    SELECT source, CAST(h % {m} AS INT) AS reg, MAX({rho}) AS rho
    FROM base GROUP BY source, h % {m}
),
agg AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_registers,
           SUM(CAST({term} AS DECIMAL(38,0))) AS zf
    FROM regs GROUP BY source
),
est AS (
    SELECT source, n_registers,
           {alpha} * {num}
           / CAST(zf + CAST({m} - n_registers AS DECIMAL(38,0))
                       * {1 << scale} AS DOUBLE) AS raw
    FROM agg
)
SELECT source, n_registers,
       ROUND(CASE WHEN raw <= {2.5 * m} AND n_registers < {m}
                  THEN {float(m)} * ln({float(m)} / ({m} - n_registers))
                  ELSE raw END, 4) + 0.0 AS estimate
FROM est
ORDER BY source
"""


def x132_cms_heavy_hitters(spark: SparkSession, sf_dir: str):
    """Count-min frequency estimates per source for the corpus's exact
    top-15 tokens (sketch.cms_counts depth=4 x width=1024 — constant
    counter state per source regardless of vocabulary size; the
    upper-bound point estimate is min over 4 affine bucket rows from
    ONE md5 per token occurrence, the bootstrap hash-once lesson).
    Items come from the exact x32-style vocabulary top-15 (count desc,
    token asc) so the anchor checks sketch-vs-truth on the heaviest
    keys, where CMS is tight."""
    from meshinsights_data_pipeline_spark.operators.sketch import (
        cms_counts,
        cms_estimate,
    )
    from meshinsights_data_pipeline_spark.operators.text import (
        normalized_text,
    )

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.filter(
        F.col("source").isNotNull() & F.col("text").isNotNull()
    ).select(
        "source",
        F.explode(F.split(normalized_text(F.col("text")), " ")).alias(
            "token"
        ),
    ).filter(F.col("token") != "")
    items = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .orderBy(F.col("_cnt").desc(), F.col("token").asc())
        .limit(15)
        .select("token")
    )
    state = cms_counts(toks, ["source"], "token", depth=4, width=1024)
    return cms_estimate(
        state, ["source"], items, "token", depth=4, width=1024
    ).orderBy("source", "token")


def _x132_sql() -> str:
    from meshinsights_data_pipeline_spark.operators.sketch import (
        SKETCH_PRIME,
        cms_row_constants,
    )

    depth, width = 4, 1024
    a_r, c_r = cms_row_constants(depth)
    consts = ", ".join(
        f"({r}, {a_r[r]}, {c_r[r]})" for r in range(depth)
    )
    norm = _NORM.format(col="text")
    h = _H60.format(s="token")
    return f"""
WITH toks AS (
    SELECT source, unnest(string_split({norm}, ' ')) AS token
    FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
),
tt AS (SELECT source, token FROM toks WHERE token <> ''),
items AS (
    SELECT token FROM tt GROUP BY token
    ORDER BY COUNT(*) DESC, token ASC LIMIT 15
),
hashed AS (
    SELECT source, {h} % {SKETCH_PRIME} AS hh FROM tt
),
state AS (
    SELECT source, r, (a * hh + c) % {SKETCH_PRIME} % {width} AS bucket,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM hashed CROSS JOIN (VALUES {consts}) AS t(r, a, c)
    GROUP BY source, r, (a * hh + c) % {SKETCH_PRIME} % {width}
),
probes AS (
    SELECT token, r,
           (a * ({h} % {SKETCH_PRIME}) + c) % {SKETCH_PRIME} % {width}
               AS bucket
    FROM items CROSS JOIN (VALUES {consts}) AS t(r, a, c)
),
grid AS (
    SELECT g.source, p.token, p.r, p.bucket
    FROM (SELECT DISTINCT source FROM state) g CROSS JOIN probes p
)
SELECT gsource AS source, gtoken AS token, estimate
FROM (
    SELECT grid.source AS gsource, grid.token AS gtoken,
           MIN(COALESCE(state.c, 0)) AS estimate
    FROM grid LEFT JOIN state
        ON state.source = grid.source AND state.r = grid.r
       AND state.bucket = grid.bucket
    GROUP BY grid.source, grid.token
)
ORDER BY source, token
"""


def x133_kmv_overlap(spark: SparkSession, sf_dir: str):
    """Estimated pairwise source overlap (Jaccard / union /
    intersection cardinalities) from bottom-128 KMV sketches of the
    raw text values (sketch.kmv_pairwise_overlap) — the x57 exact
    overlap matrix's 100 TB shape: sketches are |S| x k rows, the pair
    stage |S|^2 x k, and the corpus is hashed once and never joined
    against itself. Estimators are the Beyer et al. (k-1)/h_k form —
    exact-integer operands, one IEEE division, rounded once."""
    from meshinsights_data_pipeline_spark.operators.sketch import (
        kmv_pairwise_overlap,
    )

    docs = read_table(spark, sf_dir, "documents")
    return kmv_pairwise_overlap(docs, "source", "text", k=128).orderBy(
        "source_a", "source_b"
    )


def _x133_sql() -> str:
    k = 128
    h = _H60.format(s="text")
    two60 = "1152921504606846976.0"
    return f"""
WITH dist AS (
    SELECT DISTINCT source, {h} AS h
    FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
),
sk AS (
    SELECT source, h FROM (
        SELECT source, h,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk
        FROM dist
    ) WHERE rk <= {k}
),
srcs AS (SELECT DISTINCT source FROM sk),
pairs AS (
    SELECT a.source AS sa, b.source AS sb
    FROM srcs a JOIN srcs b ON a.source < b.source
),
u AS (
    SELECT sa, sb, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
        SELECT p.sa, p.sb, s.h, 1 AS in_a, 0 AS in_b
        FROM pairs p JOIN sk s ON s.source = p.sa
        UNION ALL
        SELECT p.sa, p.sb, s.h, 0, 1
        FROM pairs p JOIN sk s ON s.source = p.sb
    ) GROUP BY sa, sb, h
),
usk AS (
    SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY sa, sb ORDER BY h) AS rk
        FROM u
    ) WHERE rk <= {k}
),
agg AS (
    SELECT sa, sb,
           CAST(COUNT(*) AS BIGINT) AS n_union_sketch,
           CAST(SUM(in_a * in_b) AS BIGINT) AS n_both,
           MAX(h) AS hk
    FROM usk GROUP BY sa, sb
),
est AS (
    SELECT sa, sb, n_union_sketch,
           CAST(n_both AS DOUBLE) / n_union_sketch AS jac,
           CASE WHEN n_union_sketch < {k}
                THEN CAST(n_union_sketch AS DOUBLE)
                ELSE {float(k - 1)} * {two60} / CAST(hk AS DOUBLE)
           END AS u_est
    FROM agg
)
SELECT sa AS source_a, sb AS source_b, n_union_sketch,
       ROUND(jac, 4) + 0.0 AS jaccard_est,
       ROUND(u_est, 4) + 0.0 AS union_est,
       ROUND(jac * u_est, 4) + 0.0 AS intersection_est
FROM est
ORDER BY source_a, source_b
"""


def x134_seasonal_decompose(spark: SparkSession, sf_dir: str):
    """Classical additive seasonal decomposition (period 7) of the
    daily event-value total per event type (trend.seasonal_decompose):
    trend = centered 7-day moving average over exact DECIMAL folds,
    seasonal = centered per-weekday-phase means of the detrended
    series, resid = what the x104/x108 alarm layer should actually
    watch. Edge days (no full window) carry NULL trend/seasonal/resid
    — the textbook convention, LEFT-join preserved."""
    from meshinsights_data_pipeline_spark.operators.trend import (
        seasonal_decompose,
    )

    ev = read_table(spark, sf_dir, "events")
    v = F.col("value").cast("double")
    daily = (
        ev.filter(
            F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
            & v.isNotNull()
            & ~F.isnan(v)
        )
        .groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(
            F.sum(v.cast("decimal(38,12)")).cast("double").alias("_dv")
        )
    )
    return seasonal_decompose(
        daily, ["event_type"], "day", "_dv", period=7
    ).select(
        "event_type",
        "day",
        F.col("_dv").alias("value"),
        "trend",
        "seasonal",
        "resid",
    ).orderBy("event_type", "day")


X134_SQL = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(value AS DECIMAL(38,12))) AS DOUBLE) AS v
    FROM events
    WHERE event_type IS NOT NULL AND ts IS NOT NULL
      AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
    GROUP BY event_type, CAST(ts AS DATE)
),
base AS (
    SELECT event_type, day, v, CAST(v AS DECIMAL(38,12)) AS vd
    FROM daily
),
wt AS (
    SELECT event_type, day, v,
           (ROW_NUMBER() OVER (
                PARTITION BY event_type ORDER BY day) - 1) % 7 AS phase,
           CASE WHEN COUNT(*) OVER (
                    PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) = 7
                THEN CAST(SUM(vd) OVER (
                    PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS DOUBLE)
                    / 7.0
           END AS trend
    FROM base
),
det AS (
    SELECT *, v - trend AS detr,
           CAST(v - trend AS DECIMAL(38,12)) AS detd
    FROM wt
),
pm AS (
    SELECT event_type, phase,
           CAST(SUM(detd) AS DOUBLE) / COUNT(*) AS pmean
    FROM det WHERE detr IS NOT NULL GROUP BY event_type, phase
),
cen AS (
    SELECT event_type, phase,
           pmean - CAST(SUM(CAST(pmean AS DECIMAL(38,12))) OVER (
                       PARTITION BY event_type) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY event_type) AS season
    FROM pm
)
SELECT et AS event_type, day, value, trend, seasonal, resid
FROM (
    SELECT d.event_type AS et, d.day AS day, d.v AS value,
           ROUND(d.trend, 6) + 0.0 AS trend,
           ROUND(CASE WHEN d.trend IS NOT NULL THEN c.season END, 6)
               + 0.0 AS seasonal,
           ROUND(CASE WHEN d.trend IS NOT NULL
                      THEN d.detr - c.season END, 6) + 0.0 AS resid
    FROM det d LEFT JOIN cen c
        ON c.event_type = d.event_type AND c.phase = d.phase
)
ORDER BY event_type, day
"""


def x135_hist_quantiles(spark: SparkSession, sf_dir: str):
    """Per-event-type p50/p90/p99 estimated from the mergeable
    fixed-bound histogram sketch (sketch.hist_bin_counts 64 bins over
    [0, 100] + hist_quantile_estimate) — the x61/x95 exact-percentile
    sort's 100 TB tier made a first-class operator: state is
    |groups| x bins, merges by SUM (streaming twin shares it), error
    bounded by the bin width. Cumulative counts are exact integers;
    the within-bin interpolation is fixed-order IEEE with a shared
    python-computed bin-width literal, rounded once."""
    from meshinsights_data_pipeline_spark.operators.sketch import (
        hist_bin_counts,
        hist_quantile_estimate,
    )

    ev = read_table(spark, sf_dir, "events")
    state = hist_bin_counts(
        ev, ["event_type"], "value", 0.0, 100.0, bins=64
    )
    return hist_quantile_estimate(
        state, ["event_type"], [0.5, 0.9, 0.99], 0.0, 100.0, bins=64
    ).orderBy("event_type", "q")


X135_SQL = """
WITH base AS (
    SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
    WHERE event_type IS NOT NULL AND value IS NOT NULL
      AND NOT isnan(CAST(value AS DOUBLE))
),
binned AS (
    SELECT event_type,
           LEAST(63, CAST(FLOOR(
               ((GREATEST(0.0, LEAST(100.0, v)) - 0.0) / 100.0) * 64.0
           ) AS INT)) AS bin
    FROM base
),
state AS (
    SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS c
    FROM binned GROUP BY event_type, bin
),
cum AS (
    SELECT event_type, bin, CAST(c AS DOUBLE) AS cd,
           CAST(SUM(c) OVER (
               PARTITION BY event_type ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS cc,
           CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
    FROM state
),
probes AS (
    SELECT event_type, bin, cd, cc, n, CAST(q AS DOUBLE) AS q
    FROM cum CROSS JOIN (VALUES (0.5), (0.9), (0.99)) qs(q)
)
SELECT event_type, q, n,
       ROUND(0.0 + (CAST(bin AS DOUBLE)
                    + (q * CAST(n AS DOUBLE) - (cc - cd)) / cd)
                   * 1.5625, 6) + 0.0 AS estimate
FROM probes
WHERE q * CAST(n AS DOUBLE) > cc - cd
  AND q * CAST(n AS DOUBLE) <= cc
ORDER BY event_type, q
"""


def x136_seasonal_anomalies(spark: SparkSession, sf_dir: str):
    """Seasonal-adjusted robust anomalies (trend.seasonal_anomalies,
    period 7, 3-MAD): the x134 decomposition composed with the x92
    robust scorer over the RESIDUAL — a value is judged against what
    the weekly schedule predicts, not the raw level. All scored rows
    are returned with the flag (not pre-filtered: at small SFs a
    well-behaved series may flag nothing, and a zero-row anchor is
    vacuous)."""
    from meshinsights_data_pipeline_spark.operators.trend import (
        seasonal_anomalies,
    )

    ev = read_table(spark, sf_dir, "events")
    v = F.col("value").cast("double")
    daily = (
        ev.filter(
            F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
            & v.isNotNull()
            & ~F.isnan(v)
        )
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(v.cast("decimal(38,12)")).cast("double").alias("_dv")
        )
    )
    return seasonal_anomalies(
        daily, ["event_type"], "day", "_dv", period=7, threshold=3.0
    ).select(
        "event_type",
        "day",
        F.col("_dv").alias("value"),
        "trend",
        "seasonal",
        "resid",
        "med_resid",
        "mad_resid",
        "score",
        "is_anomaly",
    ).orderBy("event_type", "day")


X136_SQL = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(value AS DECIMAL(38,12))) AS DOUBLE) AS v
    FROM events
    WHERE event_type IS NOT NULL AND ts IS NOT NULL
      AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
    GROUP BY event_type, CAST(ts AS DATE)
),
base AS (
    SELECT event_type, day, v, CAST(v AS DECIMAL(38,12)) AS vd
    FROM daily
),
wt AS (
    SELECT event_type, day, v,
           (ROW_NUMBER() OVER (
                PARTITION BY event_type ORDER BY day) - 1) % 7 AS phase,
           CASE WHEN COUNT(*) OVER (
                    PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) = 7
                THEN CAST(SUM(vd) OVER (
                    PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS DOUBLE)
                    / 7.0
           END AS trend
    FROM base
),
det AS (
    SELECT *, v - trend AS detr,
           CAST(v - trend AS DECIMAL(38,12)) AS detd
    FROM wt
),
pm AS (
    SELECT event_type, phase,
           CAST(SUM(detd) AS DOUBLE) / COUNT(*) AS pmean
    FROM det WHERE detr IS NOT NULL GROUP BY event_type, phase
),
cen AS (
    SELECT event_type, phase,
           pmean - CAST(SUM(CAST(pmean AS DECIMAL(38,12))) OVER (
                       PARTITION BY event_type) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY event_type) AS season
    FROM pm
),
dec AS (
    SELECT d.event_type AS event_type, d.day AS day, d.v AS value,
           ROUND(d.trend, 6) + 0.0 AS trend,
           ROUND(CASE WHEN d.trend IS NOT NULL THEN c.season END, 6)
               + 0.0 AS seasonal,
           ROUND(CASE WHEN d.trend IS NOT NULL
                      THEN d.detr - c.season END, 6) + 0.0 AS resid
    FROM det d LEFT JOIN cen c
        ON c.event_type = d.event_type AND c.phase = d.phase
),
scored AS (SELECT * FROM dec WHERE resid IS NOT NULL),
med AS (
    SELECT event_type, median(resid) AS med_r
    FROM scored GROUP BY event_type
),
mad AS (
    SELECT s.event_type, MIN(m.med_r) AS med_r,
           ROUND(median(abs(s.resid - m.med_r)), 6) AS mad_resid
    FROM scored s JOIN med m USING (event_type)
    GROUP BY s.event_type
    HAVING ROUND(median(abs(s.resid - m.med_r)), 6) > 0
)
SELECT et AS event_type, day, value, trend, seasonal, resid,
       med_resid, mad_resid, score, is_anomaly
FROM (
    SELECT s.event_type AS et, s.day AS day, s.value AS value,
           s.trend AS trend, s.seasonal AS seasonal, s.resid AS resid,
           ROUND(m.med_r, 6) + 0.0 AS med_resid,
           m.mad_resid AS mad_resid,
           ROUND(abs(s.resid - m.med_r) / m.mad_resid, 6) + 0.0
               AS score,
           ROUND(abs(s.resid - m.med_r) / m.mad_resid, 6) > 3.0
               AS is_anomaly
    FROM scored s JOIN mad m ON m.event_type = s.event_type
)
ORDER BY event_type, day
"""


def x137_ols_trend(spark: SparkSession, sf_dir: str):
    """Per-event-type OLS fit of the daily value total against the day
    index (trend.ols_fit) — slope/intercept/R^2 in closed form from
    ONE mergeable moment aggregate: the parametric companion of x108's
    Theil-Sen (O(n) vs O(n^2) pairs, plus the variance-explained
    readout). Welch-pivot DECIMAL folds; fixed-order IEEE algebra
    mirrored in the oracle."""
    from meshinsights_data_pipeline_spark.operators.trend import ols_fit

    ev = read_table(spark, sf_dir, "events")
    v = F.col("value").cast("double")
    daily = (
        ev.filter(
            F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
            & v.isNotNull()
            & ~F.isnan(v)
        )
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(v.cast("decimal(38,12)")).cast("double").alias("_dv")
        )
        .select(
            "event_type",
            F.datediff(
                F.col("day"), F.lit("2024-01-01").cast("date")
            ).cast("double").alias("_xi"),
            "_dv",
        )
    )
    return ols_fit(daily, ["event_type"], "_xi", "_dv").orderBy(
        "event_type"
    )


X137_SQL = """
WITH daily AS (
    SELECT event_type,
           CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS DOUBLE) AS xi,
           CAST(SUM(CAST(value AS DECIMAL(38,12))) AS DOUBLE) AS yv
    FROM events
    WHERE event_type IS NOT NULL AND ts IS NOT NULL
      AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
    GROUP BY event_type, CAST(ts AS DATE)
),
pivots AS (
    SELECT event_type, MIN(xi) AS px, MIN(yv) AS py
    FROM daily GROUP BY event_type
),
m AS (
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(p.px) AS px, MIN(p.py) AS py,
           CAST(SUM(CAST(d.xi - p.px AS DECIMAL(38,12))) AS DOUBLE)
               AS sx,
           CAST(SUM(CAST(d.yv - p.py AS DECIMAL(38,12))) AS DOUBLE)
               AS sy,
           CAST(SUM(CAST((d.xi - p.px) * (d.yv - p.py)
                         AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
           CAST(SUM(CAST((d.xi - p.px) * (d.xi - p.px)
                         AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
           CAST(SUM(CAST((d.yv - p.py) * (d.yv - p.py)
                         AS DECIMAL(38,6))) AS DOUBLE) AS syy
    FROM daily d JOIN pivots p ON p.event_type = d.event_type
    GROUP BY d.event_type
),
calc AS (
    SELECT event_type, n,
           CASE WHEN n >= 2
                 AND sxx - sx * sx / CAST(n AS DOUBLE) > 0
                THEN (sxy - sx * sy / CAST(n AS DOUBLE))
                     / (sxx - sx * sx / CAST(n AS DOUBLE))
           END AS slope,
           sx, sy, sxy, sxx, syy, px, py
    FROM m
)
SELECT event_type, n,
       ROUND(slope, 6) + 0.0 AS slope,
       ROUND(CASE WHEN slope IS NOT NULL THEN
           (py + sy / CAST(n AS DOUBLE))
           - slope * (px + sx / CAST(n AS DOUBLE)) END, 6) + 0.0
           AS intercept,
       ROUND(CASE WHEN slope IS NOT NULL
                   AND syy - sy * sy / CAST(n AS DOUBLE) > 0
             THEN (sxy - sx * sy / CAST(n AS DOUBLE))
                  * (sxy - sx * sy / CAST(n AS DOUBLE))
                  / ((sxx - sx * sx / CAST(n AS DOUBLE))
                     * (syy - sy * sy / CAST(n AS DOUBLE)))
             END, 6) + 0.0 AS r2
FROM calc
ORDER BY event_type
"""

_CELL_SQL = """
    SELECT {keys}, CAST(COUNT(*) AS BIGINT) AS n, MIN(p) AS p,
           CAST(SUM(CAST(v - p AS DECIMAL(38,12))) AS DOUBLE) AS s,
           CAST(SUM(CAST((v - p) * (v - p) AS DECIMAL(38,12)))
               AS DOUBLE) AS sq
    FROM (
        SELECT b.*, MIN(b.v) OVER (PARTITION BY {keys_b}) AS p
        FROM ({base}) b
    )
    GROUP BY {keys}
"""


def x138_diff_in_diff(spark: SparkSession, sf_dir: str):
    """Difference-in-differences per event type (abtest.diff_in_diff):
    arm = user parity, period = first vs second half of the event
    window — the parallel-trends causal readout for non-randomized
    rollouts, from the same Welch-pivot cell-moment state as
    x116/x139. Fixed-order IEEE did/se/z, z rounded once."""
    from meshinsights_data_pipeline_spark.operators.abtest import (
        diff_in_diff,
    )

    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("experiment"),
        F.when(F.col("user_id") % 2 == 0, "control")
        .otherwise("t1").alias("arm"),
        F.when(
            F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"),
            "pre",
        ).otherwise("post").alias("period"),
        F.col("value"),
    )
    return diff_in_diff(
        ev, "experiment", "arm", "period", "value"
    ).orderBy("experiment", "arm")


def _x138_sql() -> str:
    base = """
        SELECT event_type AS experiment,
               CASE WHEN user_id % 2 = 0 THEN 'control'
                    ELSE 't1' END AS arm,
               CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                    THEN 'pre' ELSE 'post' END AS period,
               CAST(value AS DOUBLE) AS v
        FROM events
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL
          AND ts IS NOT NULL AND value IS NOT NULL
          AND NOT isnan(CAST(value AS DOUBLE))
    """
    cells = _CELL_SQL.format(
        keys="experiment, arm, period",
        keys_b="b.experiment, b.arm, b.period",
        base=base,
    )
    return f"""
WITH cells AS ({cells}),
tpost AS (SELECT experiment, arm, n, p, s, sq FROM cells
          WHERE arm <> 'control' AND period = 'post'),
tpre AS (SELECT experiment, arm, n, p, s, sq FROM cells
         WHERE arm <> 'control' AND period = 'pre'),
cpost AS (SELECT experiment, n, p, s, sq FROM cells
          WHERE arm = 'control' AND period = 'post'),
cpre AS (SELECT experiment, n, p, s, sq FROM cells
         WHERE arm = 'control' AND period = 'pre'),
j AS (
    SELECT COALESCE(tpost.experiment, tpre.experiment) AS experiment,
           COALESCE(tpost.arm, tpre.arm) AS arm,
           tpost.n AS tpostn, tpost.p AS tpostp, tpost.s AS tposts,
           tpost.sq AS tpostsq,
           tpre.n AS tpren, tpre.p AS tprep, tpre.s AS tpres,
           tpre.sq AS tpresq,
           cpost.n AS cpostn, cpost.p AS cpostp, cpost.s AS cposts,
           cpost.sq AS cpostsq,
           cpre.n AS cpren, cpre.p AS cprep, cpre.s AS cpres,
           cpre.sq AS cpresq
    FROM tpost
    FULL JOIN tpre ON tpre.experiment = tpost.experiment
                  AND tpre.arm = tpost.arm
    LEFT JOIN cpost
        ON cpost.experiment = COALESCE(tpost.experiment, tpre.experiment)
    LEFT JOIN cpre
        ON cpre.experiment = COALESCE(tpost.experiment, tpre.experiment)
),
calc AS (
    SELECT *,
           tpostn IS NOT NULL AND tpren IS NOT NULL
           AND cpostn IS NOT NULL AND cpren IS NOT NULL AS has_all,
           (tpostp + tposts / tpostn) - (tprep + tpres / tpren)
           - ((cpostp + cposts / cpostn) - (cprep + cpres / cpren))
               AS did_raw,
           CASE WHEN tpostn >= 2 THEN
               (tpostsq / tpostn - (tposts / tpostn) * (tposts / tpostn))
               * (CAST(tpostn AS DOUBLE) / (tpostn - 1)) END / tpostn
           + CASE WHEN tpren >= 2 THEN
               (tpresq / tpren - (tpres / tpren) * (tpres / tpren))
               * (CAST(tpren AS DOUBLE) / (tpren - 1)) END / tpren
           + CASE WHEN cpostn >= 2 THEN
               (cpostsq / cpostn - (cposts / cpostn) * (cposts / cpostn))
               * (CAST(cpostn AS DOUBLE) / (cpostn - 1)) END / cpostn
           + CASE WHEN cpren >= 2 THEN
               (cpresq / cpren - (cpres / cpren) * (cpres / cpren))
               * (CAST(cpren AS DOUBLE) / (cpren - 1)) END / cpren
               AS var_sum
    FROM j
)
SELECT experiment, arm,
       cpren AS n_c_pre, cpostn AS n_c_post,
       tpren AS n_t_pre, tpostn AS n_t_post,
       ROUND(CASE WHEN has_all THEN did_raw END, 6) + 0.0 AS did,
       ROUND(CASE WHEN has_all THEN sqrt(var_sum) END, 6) + 0.0 AS se,
       ROUND(CASE WHEN has_all AND sqrt(var_sum) > 0
             THEN did_raw / sqrt(var_sum) END, 6) + 0.0 AS z,
       COALESCE(abs(ROUND(CASE WHEN has_all AND sqrt(var_sum) > 0
                          THEN did_raw / sqrt(var_sum) END, 6))
                > 1.959964, FALSE) AS significant,
       has_all AS has_all_cells
FROM calc
ORDER BY experiment, arm
"""


def x139_mde(spark: SparkSession, sf_dir: str):
    """Minimum detectable effect per (event type, arm) at the observed
    sizes/variances (abtest.mde_estimate, alpha=0.05, power=0.8) — the
    power-analysis gate upstream of the whole x105/x116/x120 family,
    answering "could this experiment even see the effect we care
    about". z constants are python-computed 12-decimal literals (the
    SPRT discipline: the inverse normal CDF never runs in either
    engine)."""
    from meshinsights_data_pipeline_spark.operators.abtest import (
        mde_estimate,
    )

    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("experiment"),
        F.when(F.col("user_id") % 2 == 0, "control")
        .otherwise("t1").alias("arm"),
        F.col("value"),
    )
    return mde_estimate(ev, "experiment", "arm", "value").orderBy(
        "experiment", "arm"
    )


def _x139_sql() -> str:
    from meshinsights_data_pipeline_spark.operators.abtest import (
        MDE_Z_ALPHA,
        MDE_Z_POWER,
    )

    zsum = float(MDE_Z_ALPHA[0.05]) + float(MDE_Z_POWER[0.8])
    base = """
        SELECT event_type AS experiment,
               CASE WHEN user_id % 2 = 0 THEN 'control'
                    ELSE 't1' END AS arm,
               CAST(value AS DOUBLE) AS v
        FROM events
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL
          AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
    """
    cells = _CELL_SQL.format(
        keys="experiment, arm", keys_b="b.experiment, b.arm", base=base
    )
    return f"""
WITH cells AS ({cells}),
arms AS (SELECT experiment, arm, n, p, s, sq FROM cells
         WHERE arm <> 'control'),
ctrl AS (SELECT experiment, n AS cn, p AS cp, s AS cs, sq AS csq
         FROM cells WHERE arm = 'control'),
j AS (
    SELECT a.*, c.cn, c.cp, c.cs, c.csq
    FROM arms a LEFT JOIN ctrl c ON c.experiment = a.experiment
),
calc AS (
    SELECT *,
           {zsum!r} * sqrt(
               CASE WHEN cn >= 2 THEN
                   (csq / cn - (cs / cn) * (cs / cn))
                   * (CAST(cn AS DOUBLE) / (cn - 1)) END / cn
               + CASE WHEN n >= 2 THEN
                   (sq / n - (s / n) * (s / n))
                   * (CAST(n AS DOUBLE) / (n - 1)) END / n
           ) AS mde_raw,
           cp + cs / cn AS mc
    FROM j
)
SELECT experiment, arm, cn AS n_control, n AS n_arm,
       cn IS NOT NULL AS has_control,
       ROUND(mc, 6) + 0.0 AS mean_control,
       ROUND(mde_raw, 6) + 0.0 AS mde_abs,
       ROUND(CASE WHEN mc <> 0 THEN mde_raw / mc END, 6) + 0.0
           AS mde_rel
FROM calc
ORDER BY experiment, arm
"""


#: what r17 registers: name -> (builder, oracle_sql)
DRAFTS: dict = {
    "x131_hll_cardinality": (x131_hll_cardinality, _x131_sql()),
    "x132_cms_heavy_hitters": (x132_cms_heavy_hitters, _x132_sql()),
    "x133_kmv_overlap": (x133_kmv_overlap, _x133_sql()),
    "x134_seasonal_decompose": (x134_seasonal_decompose, X134_SQL),
    "x135_hist_quantiles": (x135_hist_quantiles, X135_SQL),
    "x136_seasonal_anomalies": (x136_seasonal_anomalies, X136_SQL),
    "x137_ols_trend": (x137_ols_trend, X137_SQL),
    "x138_diff_in_diff": (x138_diff_in_diff, _x138_sql()),
    "x139_mde": (x139_mde, _x139_sql()),
}
