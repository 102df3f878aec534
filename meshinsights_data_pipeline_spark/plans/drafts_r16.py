"""Round-16 anchor DRAFTS — NOT registered.

The r15 driver window is consumed by the staged-r14 registration plus
the staleness rotation (VERDICT r14 #1), so the operators added THIS
round — the classifier/LLM-judge evaluation family (ROC-AUC via the
exact rank-sum identity + exact-state streaming twin, the calibration
report ECE/MCE/Brier + streaming twin, Cohen's kappa inter-rater
agreement, Cliff's delta effect size sharing the Mann-Whitney
count-table state) plus the uncertainty/decision layer (deterministic
Poisson-bootstrap mean CIs + streaming twin, Wald SPRT anytime-valid
sequential decisions over the A/B cell state + streaming twin, and
CUPED covariate variance reduction) — ship with their anchor queries
and DuckDB oracles staged HERE, proven green by
``tests/test_oracle_drafts.py`` (which parametrizes over every draft
generation). Round 16 registers each (builder, SQL) pair and gives it
a window slot — registration is a copy, not new work (the r13 -> r14
-> r15 precedent).

Round-16 window math (for whoever rotates next): 7 slots for
x124–x130 (new), then the r12-stale cohort (the 48 r12-checked
queries minus the 2 re-checked in r15: x26, q67 — i.e. 46 queries) of
which 43 fit: defer the THREE lightest r12 queries by the r15
gate-run warm times (q68 0.263s, x24_source_quota 0.318s,
x40_shuffle_shards 0.321s — re-verification value concentrates in
heavy plans) to r17. 7 + 43 = 50. After that rotation no query is
staler than r13 except q68/x24/x40.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.session import read_table


def x124_roc_auc(spark: SparkSession, sf_dir: str):
    """Per-event-type ROC-AUC (mleval.roc_auc) of the event VALUE as a
    scorer for the even-user class — the threshold-free
    classifier-quality readout over the same derived labeling the
    x105/x116/x120 experiment family uses, closing the loop from
    "do the arms differ" to "how well does this score separate them".
    Ranks never materialize per row: the rank-sum identity runs on
    (group, score) pos/neg COUNTS with doubled average ranks as exact
    DECIMAL(38,0) integers (the x120 algebra), so the numerator
    2*R_pos - n_pos(n_pos+1) is integer-exact and AUC is one IEEE
    division, rounded once."""
    from meshinsights_data_pipeline_spark.operators.mleval import roc_auc

    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_type"),
        (F.col("user_id") % 2 == 0).alias("label"),
        F.col("value"),
    )
    return roc_auc(ev, ["event_type"], "label", "value").orderBy(
        "event_type"
    )


X124_SQL = """
WITH ev AS (
    SELECT event_type, (user_id % 2 = 0) AS y,
           CAST(value AS DOUBLE) AS v
    FROM events
    WHERE event_type IS NOT NULL AND user_id IS NOT NULL
      AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
),
cells AS (
    SELECT event_type, v,
           CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos,
           CAST(SUM(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS neg
    FROM ev GROUP BY event_type, v
),
ranked AS (
    SELECT *,
           CAST(2 * COALESCE(SUM(pos + neg) OVER (
                    PARTITION BY event_type ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + (pos + neg) + 1 AS DECIMAL(38,0)) AS r2
    FROM cells
),
agg AS (
    SELECT event_type,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(neg) AS BIGINT) AS n_neg,
           SUM(CAST(pos AS DECIMAL(38,0)) * r2) AS r2p
    FROM ranked GROUP BY event_type
)
SELECT event_type, n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
           ROUND(CAST(r2p - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)
                      AS DOUBLE)
                 / (2.0 * CAST(CAST(n_pos AS DECIMAL(38,0)) * n_neg
                               AS DOUBLE)), 6) + 0.0
       END AS auc
FROM agg
ORDER BY event_type
"""


def x125_calibration(spark: SparkSession, sf_dir: str):
    """Per-event-type calibration report (mleval.calibration_report):
    value/100 as a [0,1] confidence for the user_id%3 outcome —
    ECE/MCE over 10 fixed equal-width bins plus the binning-free Brier
    score. ~1/4 of the scores exceed 1.0, exercising the
    clamp-before-cast edge-bin rule (the ks_value_counts ANSI lesson)
    in the anchor itself. Bin moments fold DECIMAL(38,12) (bounded
    domain — exact over a fixed quantum), ECE terms fold
    DECIMAL(38,18), fixed-order IEEE ops mirrored in the oracle."""
    from meshinsights_data_pipeline_spark.operators.mleval import (
        calibration_report,
    )

    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_type"),
        (F.col("value").cast("double") / F.lit(100.0)).alias("score"),
        (F.col("user_id") % 3 == 0).alias("label"),
    )
    return calibration_report(
        ev, ["event_type"], "score", "label", bins=10
    ).orderBy("event_type")


X125_SQL = """
WITH ev AS (
    SELECT event_type,
           CAST(value AS DOUBLE) / 100.0 AS s,
           (user_id % 3 = 0) AS y
    FROM events
    WHERE event_type IS NOT NULL AND user_id IS NOT NULL
      AND value IS NOT NULL
      AND NOT isnan(CAST(value AS DOUBLE) / 100.0)
),
binned AS (
    SELECT event_type, s,
           CASE WHEN y THEN 1 ELSE 0 END AS yi,
           LEAST(9, CAST(FLOOR(GREATEST(0.0, LEAST(1.0, s)) * 10)
                         AS INT)) AS b
    FROM ev
),
per_bin AS (
    SELECT event_type, b,
           CAST(COUNT(*) AS BIGINT) AS n_b,
           CAST(SUM(yi) AS BIGINT) AS np,
           SUM(CAST(s AS DECIMAL(38,12))) AS ssum,
           SUM(CAST((s - CAST(yi AS DOUBLE)) * (s - CAST(yi AS DOUBLE))
                    AS DECIMAL(38,12))) AS rsum
    FROM binned GROUP BY event_type, b
),
gaps AS (
    SELECT event_type, n_b, rsum,
           ABS(CAST(np AS DOUBLE) / n_b
               - CAST(ssum AS DOUBLE) / n_b) AS gap
    FROM per_bin
)
SELECT event_type,
       CAST(SUM(n_b) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(CAST(n_b AS DOUBLE) * gap AS DECIMAL(38,18)))
                  AS DOUBLE) / SUM(n_b), 6) + 0.0 AS ece,
       ROUND(MAX(gap), 6) + 0.0 AS mce,
       ROUND(CAST(SUM(rsum) AS DOUBLE) / SUM(n_b), 6) + 0.0 AS brier
FROM gaps
GROUP BY event_type
ORDER BY event_type
"""


def x126_cohens_kappa(spark: SparkSession, sf_dir: str):
    """Per-source Cohen's kappa (mleval.cohens_kappa) between the
    document language label and a deterministically-noised copy (every
    7th doc relabeled 'xx') — the LLM-judge-vs-rater agreement readout
    over the documents table; sources where the noise never fired
    exercise the pe=1 NULL guard. Every operand of kappa stays an
    exact DECIMAL(38,0) integer via the (n*diag - sum_rc) /
    (n^2 - sum_rc) rewrite; one IEEE division, rounded once."""
    from meshinsights_data_pipeline_spark.operators.mleval import (
        cohens_kappa,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        F.col("source"),
        F.col("lang").alias("rater_a"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("xx"))
        .otherwise(F.col("lang")).alias("rater_b"),
    )
    return cohens_kappa(docs, ["source"], "rater_a", "rater_b").orderBy(
        "source"
    )


X126_SQL = """
WITH base AS (
    SELECT source,
           lang AS a,
           CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END AS b
    FROM documents
    WHERE source IS NOT NULL AND lang IS NOT NULL
),
cells AS (
    SELECT source, a, b, CAST(COUNT(*) AS BIGINT) AS c
    FROM base GROUP BY source, a, b
),
rows_ AS (
    SELECT source, a, CAST(SUM(c) AS BIGINT) AS r
    FROM cells GROUP BY source, a
),
cols_ AS (
    SELECT source, b, CAST(SUM(c) AS BIGINT) AS k
    FROM cells GROUP BY source, b
),
tot AS (
    SELECT source, CAST(SUM(c) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS diag
    FROM cells GROUP BY source
),
rc AS (
    SELECT rows_.source,
           SUM(CAST(r AS DECIMAL(38,0)) * k) AS sum_rc
    FROM rows_ JOIN cols_
      ON cols_.source = rows_.source AND cols_.b = rows_.a
    GROUP BY rows_.source
)
SELECT tot.source, n,
       ROUND(CAST(diag AS DOUBLE) / n, 6) + 0.0 AS po,
       ROUND(CAST(COALESCE(sum_rc, 0) AS DOUBLE)
             / CAST(CAST(n AS DECIMAL(38,0)) * n AS DOUBLE), 6)
           + 0.0 AS pe,
       CASE WHEN CAST(CAST(n AS DECIMAL(38,0)) * n - COALESCE(sum_rc, 0)
                      AS DOUBLE) > 0
            THEN ROUND(CAST(CAST(n AS DECIMAL(38,0)) * diag
                            - COALESCE(sum_rc, 0) AS DOUBLE)
                       / CAST(CAST(n AS DECIMAL(38,0)) * n
                              - COALESCE(sum_rc, 0) AS DOUBLE), 6) + 0.0
       END AS kappa
FROM tot LEFT JOIN rc ON rc.source = tot.source
ORDER BY tot.source
"""


def x127_cliffs_delta(spark: SparkSession, sf_dir: str):
    """Cliff's delta effect size vs control (abtest.cliffs_delta) over
    the x120 derived experiment — the magnitude companion of x120's
    significance readout, computed from the SAME Mann-Whitney
    count-table sufficient statistic: delta = (2U - n_a*n_c) /
    (n_a*n_c) with 2U the doubled-rank exact integer, so delta is one
    IEEE division of exact DECIMAL(38,0) operands, rounded once; a
    missing control surfaces with has_control=false and NULL
    n_control/delta (the family's left-join discipline)."""
    from meshinsights_data_pipeline_spark.operators.abtest import (
        cliffs_delta,
    )

    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("experiment"),
        F.when(F.col("user_id") % 2 == 0, "control")
        .otherwise("t1").alias("arm"),
        F.col("value"),
    )
    return cliffs_delta(
        ev, "experiment", "arm", "value", control_label="control"
    ).orderBy("experiment", "arm")


X127_SQL = """
WITH ev AS (
    SELECT event_type AS experiment,
           CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 't1' END AS arm,
           CAST(value AS DOUBLE) AS v
    FROM events
    WHERE event_type IS NOT NULL AND value IS NOT NULL
      AND NOT isnan(CAST(value AS DOUBLE))
),
cells AS (
    SELECT experiment, arm, v, CAST(COUNT(*) AS BIGINT) AS c
    FROM ev GROUP BY experiment, arm, v
),
armcells AS (
    SELECT experiment, arm, v, c AS c_a, CAST(0 AS BIGINT) AS c_c
    FROM cells WHERE arm <> 'control'
),
armlist AS (SELECT DISTINCT experiment, arm FROM armcells),
ctrlcells AS (
    SELECT al.experiment, al.arm, c.v,
           CAST(0 AS BIGINT) AS c_a, c.c AS c_c
    FROM armlist al
    JOIN (SELECT experiment, v, c FROM cells WHERE arm = 'control') c
      ON c.experiment = al.experiment
),
pooled AS (
    SELECT experiment, arm, v,
           CAST(SUM(c_a) AS BIGINT) AS c_a,
           CAST(SUM(c_c) AS BIGINT) AS c_c
    FROM (SELECT * FROM armcells UNION ALL SELECT * FROM ctrlcells)
    GROUP BY experiment, arm, v
),
ranked AS (
    SELECT *,
           CAST(2 * COALESCE(SUM(c_a + c_c) OVER (
                    PARTITION BY experiment, arm ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + (c_a + c_c) + 1 AS DECIMAL(38,0)) AS r2
    FROM pooled
),
stats AS (
    SELECT experiment, arm,
           CAST(SUM(c_a) AS BIGINT) AS n_arm,
           CAST(SUM(c_c) AS BIGINT) AS n_control,
           SUM(CAST(c_a AS DECIMAL(38,0)) * r2) AS r2a
    FROM ranked GROUP BY experiment, arm
),
calc AS (
    SELECT *,
           r2a - CAST(CAST(n_arm AS DECIMAL(38,0)) * (n_arm + 1)
                      AS DECIMAL(38,0)) AS u2,
           CAST(CAST(n_arm AS DECIMAL(38,0)) * n_control
                AS DECIMAL(38,0)) AS prod
    FROM stats
)
SELECT experiment, arm,
       CASE WHEN n_control > 0 THEN n_control END AS n_control,
       n_arm,
       n_control > 0 AS has_control,
       CASE WHEN n_control > 0 THEN
           ROUND(CAST(u2 - prod AS DOUBLE) / CAST(prod AS DOUBLE), 6) + 0.0
       END AS delta
FROM calc
ORDER BY experiment, arm
"""


def x128_bootstrap_ci(spark: SparkSession, sf_dir: str):
    """Percentile-bootstrap 95% CI of the mean event value per event
    type (bootstrap.bootstrap_mean_ci, B=60) — the distribution-free
    uncertainty band the z/t readouts (x105/x116) approximate
    parametrically. Every (row, replicate) Poisson weight is a pure
    function of (event_id, b): ONE md5 per row spread across replicates
    by exact-BIGINT affine maps (bootstrap.replicate_constants literals)
    against shared 12-decimal Poisson(1)-CDF literals, so the
    resamples — and the CI — are bit-identical across engines: replicate means fold w*v through
    DECIMAL(38,12), the sample mean rides the same single pass as
    pseudo-replicate b=-1, and the bounds are exact interpolated
    percentiles over the replicate means."""
    from meshinsights_data_pipeline_spark.operators.bootstrap import (
        bootstrap_mean_ci,
    )

    ev = read_table(spark, sf_dir, "events")
    return bootstrap_mean_ci(
        ev, ["event_type"], "value", "event_id", b=60
    ).orderBy("event_type")


def _x128_sql() -> str:
    from meshinsights_data_pipeline_spark.operators.bootstrap import (
        BOOT_PRIME,
        POISSON1_CDF,
        replicate_constants,
    )

    w_case = "CASE " + " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(POISSON1_CDF)
    ) + " ELSE 6 END"
    a_k, c_k = replicate_constants(60)
    consts = ", ".join(
        ["(-1, 0, 0)"]
        + [f"({k}, {a_k[k]}, {c_k[k]})" for k in range(60)]
    )
    return f"""
WITH base AS (
    SELECT event_type AS g,
           ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15)
           )::BIGINT % {BOOT_PRIME} AS h,
           CAST(value AS DOUBLE) AS v
    FROM events
    WHERE event_type IS NOT NULL AND event_id IS NOT NULL
      AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
),
reps AS (
    SELECT g, h, v, b, a, c
    FROM base CROSS JOIN (VALUES {consts}) AS t(b, a, c)
),
wts AS (
    SELECT g, b, v,
           CASE WHEN b = -1 THEN 1 ELSE {w_case} END AS w
    FROM (
        SELECT *,
               CAST((a * h + c) % {BOOT_PRIME} AS DOUBLE)
                   / {BOOT_PRIME}.0 AS u
        FROM reps
    )
),
moments AS (
    SELECT g, b,
           SUM(CAST(w * v AS DECIMAL(38,12))) AS s,
           CAST(SUM(w) AS BIGINT) AS n_w,
           CAST(COUNT(*) AS BIGINT) AS rows_
    FROM wts GROUP BY g, b
),
means AS (
    SELECT g, b, rows_, CAST(s AS DOUBLE) / n_w AS m
    FROM moments WHERE n_w > 0
),
sample AS (
    SELECT g, rows_ AS n, m AS sample_mean FROM means WHERE b = -1
),
ranked AS (
    SELECT g, m, ROW_NUMBER() OVER (PARTITION BY g ORDER BY m) AS rk,
           CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS nb
    FROM means WHERE b >= 0
),
lo AS (
    SELECT r.g, r.nb AS b_reps,
           ROUND(r.m + (h.m - r.m)
                 * (CAST(r.nb - 1 AS DOUBLE) * 0.025
                    - FLOOR(CAST(r.nb - 1 AS DOUBLE) * 0.025)), 6)
               + 0.0 AS ci_lo
    FROM ranked r
    JOIN ranked h ON h.g = r.g
       AND h.rk = CAST(CEIL(CAST(r.nb - 1 AS DOUBLE) * 0.025) + 1 AS BIGINT)
    WHERE r.rk = CAST(FLOOR(CAST(r.nb - 1 AS DOUBLE) * 0.025) + 1 AS BIGINT)
),
hi AS (
    SELECT r.g,
           ROUND(r.m + (h.m - r.m)
                 * (CAST(r.nb - 1 AS DOUBLE) * 0.975
                    - FLOOR(CAST(r.nb - 1 AS DOUBLE) * 0.975)), 6)
               + 0.0 AS ci_hi
    FROM ranked r
    JOIN ranked h ON h.g = r.g
       AND h.rk = CAST(CEIL(CAST(r.nb - 1 AS DOUBLE) * 0.975) + 1 AS BIGINT)
    WHERE r.rk = CAST(FLOOR(CAST(r.nb - 1 AS DOUBLE) * 0.975) + 1 AS BIGINT)
)
SELECT sample.g AS event_type, n,
       COALESCE(b_reps, 0) AS b_reps,
       ROUND(sample_mean, 6) + 0.0 AS mean, ci_lo, ci_hi
FROM sample
LEFT JOIN lo ON lo.g = sample.g
LEFT JOIN hi ON hi.g = sample.g
ORDER BY event_type
"""


def x129_sprt(spark: SparkSession, sf_dir: str):
    """Wald SPRT decisions per (event type, derived arm)
    (abtest.sprt_bernoulli): is each arm's rate of high-value events
    (value > 30) at baseline p0=0.3 or lifted p1=0.35 — the
    anytime-valid decision layer the A/B twins' peeking caveat points
    at. The four ln constants are python-computed 12-decimal literals
    shared verbatim with this oracle; llr and both boundary
    comparisons are pure exact-DECIMAL algebra (exact integer counts x
    literal constants), so borderline decisions are bit-identical by
    construction — no IEEE op exists in the statistic."""
    from meshinsights_data_pipeline_spark.operators.abtest import (
        sprt_bernoulli,
    )

    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("experiment"),
        F.when(F.col("user_id") % 2 == 0, "control")
        .otherwise("t1").alias("arm"),
        (F.col("value") > 30).alias("conv"),
    )
    return sprt_bernoulli(
        ev, "experiment", "arm", "conv", p0=0.3, p1=0.35
    ).orderBy("experiment", "arm")


def _x129_sql() -> str:
    from meshinsights_data_pipeline_spark.operators.abtest import (
        sprt_constants,
    )

    k = sprt_constants(0.3, 0.35, alpha=0.05, beta=0.2)
    return f"""
WITH ev AS (
    SELECT event_type AS experiment,
           CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 't1' END AS arm,
           CASE WHEN value > 30 THEN 1 ELSE 0 END AS conv
    FROM events
),
cells AS (
    SELECT experiment, arm,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(conv) AS BIGINT) AS x
    FROM ev GROUP BY experiment, arm
),
calc AS (
    SELECT *,
           CAST(x AS DECIMAL(18,0)) * CAST('{k["c1"]}' AS DECIMAL(14,12))
         + CAST(n - x AS DECIMAL(18,0)) * CAST('{k["c0"]}' AS DECIMAL(14,12))
               AS llr
    FROM cells
    WHERE experiment IS NOT NULL AND arm IS NOT NULL
)
SELECT experiment, arm, n, x,
       ROUND(CAST(llr AS DOUBLE), 6) + 0.0 AS llr,
       CASE WHEN llr >= CAST('{k["upper"]}' AS DECIMAL(14,12))
                THEN 'accept_h1'
            WHEN llr <= CAST('{k["lower"]}' AS DECIMAL(14,12))
                THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM calc
ORDER BY experiment, arm
"""


def x130_cuped(spark: SparkSession, sf_dir: str):
    """CUPED-adjusted arm means (abtest.cuped_adjusted_means): event
    value adjusted by the floor(value/10) covariate — deliberately
    highly correlated so the anchor exercises a LARGE variance
    reduction (the operator's whole point) plus the exact closed-form
    moment algebra: per-(experiment, arm) pivot-disciplined
    DECIMAL(38,12) folds with the pivots keyed per EXPERIMENT so arm
    moments sum exactly into the pooled theta, then fixed-order IEEE
    mean/var/cov/theta/adjustment steps mirrored in this oracle."""
    from meshinsights_data_pipeline_spark.operators.abtest import (
        cuped_adjusted_means,
    )

    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("experiment"),
        F.when(F.col("user_id") % 2 == 0, "control")
        .otherwise("t1").alias("arm"),
        F.col("value"),
        F.floor(F.col("value").cast("double") / F.lit(10.0))
        .cast("double").alias("pre_metric"),
    )
    return cuped_adjusted_means(
        ev, "experiment", "arm", "value", "pre_metric"
    ).orderBy("experiment", "arm")


X130_SQL = """
WITH base AS (
    SELECT event_type AS experiment,
           CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 't1' END AS arm,
           CAST(value AS DOUBLE) AS y,
           CAST(FLOOR(CAST(value AS DOUBLE) / 10.0) AS DOUBLE) AS x
    FROM events
    WHERE event_type IS NOT NULL AND value IS NOT NULL
      AND NOT isnan(CAST(value AS DOUBLE))
),
pv AS (
    SELECT experiment, MIN(y) AS py, MIN(x) AS px
    FROM base GROUP BY experiment
),
cells AS (
    SELECT b.experiment, b.arm,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(pv.py) AS py,
           SUM(CAST(b.y - pv.py AS DECIMAL(38,12))) AS sy,
           SUM(CAST(b.x - pv.px AS DECIMAL(38,12))) AS sx,
           SUM(CAST((b.y - pv.py) * (b.y - pv.py)
                    AS DECIMAL(38,12))) AS syy,
           SUM(CAST((b.x - pv.px) * (b.x - pv.px)
                    AS DECIMAL(38,12))) AS sxx,
           SUM(CAST((b.x - pv.px) * (b.y - pv.py)
                    AS DECIMAL(38,12))) AS sxy
    FROM base b JOIN pv USING (experiment)
    GROUP BY b.experiment, b.arm
),
pooled AS (
    SELECT experiment,
           CAST(SUM(n) AS DOUBLE) AS pn,
           CAST(SUM(sy) AS DOUBLE) AS psy,
           CAST(SUM(sx) AS DOUBLE) AS psx,
           CAST(SUM(sxx) AS DOUBLE) AS psxx,
           CAST(SUM(sxy) AS DOUBLE) AS psxy
    FROM cells GROUP BY experiment
),
th AS (
    SELECT experiment,
           CASE WHEN psxx / pn - (psx / pn) * (psx / pn) > 0
                THEN (psxy / pn - (psx / pn) * (psy / pn))
                     / (psxx / pn - (psx / pn) * (psx / pn))
           END AS theta,
           psx / pn AS xbar
    FROM pooled
),
armcalc AS (
    SELECT c.experiment, c.arm, c.n, c.py,
           CAST(c.sy AS DOUBLE) / CAST(c.n AS DOUBLE) AS ybar,
           CAST(c.sx AS DOUBLE) / CAST(c.n AS DOUBLE) AS xbarm,
           CASE WHEN c.n >= 2 THEN
               (CAST(c.syy AS DOUBLE) / CAST(c.n AS DOUBLE)
                - (CAST(c.sy AS DOUBLE) / CAST(c.n AS DOUBLE))
                  * (CAST(c.sy AS DOUBLE) / CAST(c.n AS DOUBLE)))
               * (CAST(c.n AS DOUBLE) / (c.n - 1))
           END AS var_y,
           CASE WHEN c.n >= 2 THEN
               (CAST(c.sxx AS DOUBLE) / CAST(c.n AS DOUBLE)
                - (CAST(c.sx AS DOUBLE) / CAST(c.n AS DOUBLE))
                  * (CAST(c.sx AS DOUBLE) / CAST(c.n AS DOUBLE)))
               * (CAST(c.n AS DOUBLE) / (c.n - 1))
           END AS var_x,
           CASE WHEN c.n >= 2 THEN
               (CAST(c.sxy AS DOUBLE) / CAST(c.n AS DOUBLE)
                - (CAST(c.sx AS DOUBLE) / CAST(c.n AS DOUBLE))
                  * (CAST(c.sy AS DOUBLE) / CAST(c.n AS DOUBLE)))
               * (CAST(c.n AS DOUBLE) / (c.n - 1))
           END AS cov,
           th.theta, th.xbar
    FROM cells c JOIN th ON th.experiment = c.experiment
)
SELECT experiment, arm, n,
       ROUND(py + ybar, 6) + 0.0 AS mean_raw,
       ROUND(py + ybar - theta * (xbarm - xbar), 6) + 0.0 AS mean_adj,
       ROUND(theta, 6) + 0.0 AS theta,
       CASE WHEN var_y > 0 THEN
           ROUND(1.0 - (var_y - 2.0 * theta * cov
                        + theta * theta * var_x) / var_y, 6) + 0.0
       END AS var_reduction
FROM armcalc
ORDER BY experiment, arm
"""


#: what r16 registers: name -> (builder, oracle_sql)
DRAFTS = {
    "x124_roc_auc": (x124_roc_auc, X124_SQL),
    "x125_calibration": (x125_calibration, X125_SQL),
    "x126_cohens_kappa": (x126_cohens_kappa, X126_SQL),
    "x127_cliffs_delta": (x127_cliffs_delta, X127_SQL),
    "x128_bootstrap_ci": (x128_bootstrap_ci, _x128_sql()),
    "x129_sprt": (x129_sprt, _x129_sql()),
    "x130_cuped": (x130_cuped, X130_SQL),
}
