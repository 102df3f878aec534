"""Round-15 anchor drafts — staged r14, REGISTERED r15.

The r14 driver window was consumed by the staged-r13 registration plus
the staleness rotation (VERDICT r13 #1), so the operators added in
r14 — Welch's unequal-variance t-test, chi-square independence +
Cramér's V, per-entity lag-k autocorrelation, per-source
Jensen-Shannon mix divergence (+ its hashed-state streaming twin),
the Mann-Whitney U rank-sum test (+ exact-state streaming twin, with
the A/B-z and chi-square twins riding the same refactor), the
Kruskal-Wallis k-sample omnibus, Spearman rank correlation, and the
correlation ratio eta^2 (cat-num association / seasonality strength) —
shipped with their anchor queries and DuckDB oracles staged HERE,
proven green by ``tests/test_oracle_drafts.py`` (which parametrizes
over both draft generations). Round 15 registered each (builder, SQL)
pair via ``plans.queries._register_extensions`` and gave all eight the
leading slots of ``_DRIVER_WINDOW_R15`` (the r13 -> r14 precedent;
this file stays the registration-independent proof, like drafts_r14).

The r14 window math predicted a 41-query r11-stale cohort; the
CORRECTNESS_r1-r14 union gives exactly 40 (see the _DRIVER_WINDOW_R15
comment in plans/queries.py), so two r12 fill slots remained
(x26_dedup_clusters_star, q67 — heaviest by the r14 gate-run warm
times). After the r15 rotation no registered query is staler than r12.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.session import read_table


def x116_welch_ttest(spark: SparkSession, sf_dir: str):
    """Welch's t vs control over a derived experiment
    (abtest.welch_ttest): event_type is the experiment, odd/even
    user_id the arm, the event VALUE the continuous metric — the
    mean-readout companion of x105's rate readout. Per-cell moments
    use the zscore pivot discipline (DECIMAL(38,12) folds of
    d = v - cell-min), then mean/variance/se/t/Welch-df are single
    correctly-rounded IEEE ops in fixed operand order, so t and df are
    bit-identical across engines; significance compares the ROUNDED
    |t|. One corpus scan (materialized cell frame), broadcast control
    join."""
    from meshinsights_data_pipeline_spark.operators.abtest import (
        welch_ttest,
    )

    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("experiment"),
        F.when(F.col("user_id") % 2 == 0, "control")
        .otherwise("t1").alias("arm"),
        F.col("value"),
    )
    return welch_ttest(
        ev, "experiment", "arm", "value", control_label="control"
    ).orderBy("experiment", "arm")


X116_SQL = """
WITH ev AS (
    SELECT event_type AS experiment,
           CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 't1' END AS arm,
           CAST(value AS DOUBLE) AS v
    FROM events
    WHERE event_type IS NOT NULL AND value IS NOT NULL
      AND NOT isnan(CAST(value AS DOUBLE))
),
pv AS (
    SELECT experiment, arm, MIN(v) AS p FROM ev GROUP BY experiment, arm
),
cells AS (
    SELECT e.experiment, e.arm,
           CAST(COUNT(*) AS BIGINT) AS n, MIN(pv.p) AS p,
           CAST(SUM(CAST(e.v - pv.p AS DECIMAL(38,12))) AS DOUBLE) AS s,
           CAST(SUM(CAST((e.v - pv.p) * (e.v - pv.p)
                         AS DECIMAL(38,12))) AS DOUBLE) AS sq
    FROM ev e JOIN pv USING (experiment, arm)
    GROUP BY e.experiment, e.arm
),
st AS (
    SELECT experiment, arm, n, p + s / n AS mean_v,
           CASE WHEN n >= 2 THEN
               (sq / n - (s / n) * (s / n)) * (CAST(n AS DOUBLE) / (n - 1))
           END AS var_s
    FROM cells
),
j AS (
    SELECT a.experiment, a.arm,
           c.n AS n_control, a.n AS n_arm,
           c.mean_v AS mc, a.mean_v AS ma,
           c.var_s AS vc, a.var_s AS va
    FROM st a
    LEFT JOIN st c ON c.experiment = a.experiment AND c.arm = 'control'
    WHERE a.arm <> 'control'
),
calc AS (
    SELECT *, va / n_arm AS a1, vc / n_control AS a2 FROM j
),
z AS (SELECT *, SQRT(a1 + a2) AS se FROM calc)
SELECT experiment, arm, n_control, n_arm,
       n_control IS NOT NULL AS has_control,
       ROUND(mc, 6) AS mean_control,
       ROUND(ma, 6) AS mean_arm,
       ROUND(ma - mc, 6) AS diff,
       CASE WHEN se > 0 THEN ROUND((ma - mc) / se, 6) END AS t,
       CASE WHEN se > 0 THEN
           ROUND((a1 + a2) * (a1 + a2)
                 / (a1 * a1 / (n_arm - 1) + a2 * a2 / (n_control - 1)), 6)
       END AS df,
       COALESCE(ABS(CASE WHEN se > 0 THEN ROUND((ma - mc) / se, 6) END)
                > 1.959964, FALSE) AS significant
FROM z
ORDER BY experiment, arm
"""


def x117_chi2_independence(spark: SparkSession, sf_dir: str):
    """Chi-square independence + Cramér's V of order status vs priority
    (dq.chi2_independence) — the categorical-association forensic next
    to x109's Benford signature check. Every cell term is rewritten
    over exact integers ((o*N - r*c)^2 / (N*r*c), difference in
    DECIMAL(38,0)), one IEEE square + one division per cell, terms
    folded DECIMAL(38,18); V divides the UNROUNDED chi2. One corpus
    scan; everything after the materialized cell frame is
    contingency-table-sized."""
    from meshinsights_data_pipeline_spark.operators.dq import (
        chi2_independence,
    )

    o = read_table(spark, sf_dir, "orders")
    return chi2_independence(o, "o_orderstatus", "o_orderpriority")


X117_SQL = """
WITH base AS (
    SELECT o_orderstatus AS a, o_orderpriority AS b FROM orders
    WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
),
cells AS (
    SELECT a, b, CAST(COUNT(*) AS BIGINT) AS o FROM base GROUP BY a, b
),
rows_ AS (SELECT a, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY a),
cols_ AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY b),
tot AS (
    SELECT CAST(SUM(o) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT a) AS BIGINT) AS ra,
           CAST(COUNT(DISTINCT b) AS BIGINT) AS cb
    FROM cells
),
terms AS (
    SELECT CAST(CAST(o AS DECIMAL(38,0)) * n
                - CAST(r AS DECIMAL(38,0)) * c AS DOUBLE) AS dnum,
           CAST(CAST(n AS DECIMAL(38,0)) * r * c AS DOUBLE) AS denom,
           n, ra, cb
    FROM cells JOIN rows_ USING (a) JOIN cols_ USING (b) CROSS JOIN tot
),
agg AS (
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(ra) AS BIGINT) AS r_levels,
           CAST(MAX(cb) AS BIGINT) AS c_levels,
           CAST(SUM(CAST((dnum * dnum) / denom AS DECIMAL(38,18)))
                AS DOUBLE) AS chi2u
    FROM terms
)
SELECT n, r_levels, c_levels,
       CAST((r_levels - 1) * (c_levels - 1) AS BIGINT) AS dof,
       ROUND(chi2u, 6) AS chi2,
       CASE WHEN LEAST(r_levels - 1, c_levels - 1) >= 1 THEN
           ROUND(SQRT(chi2u / CAST(CAST(n AS DECIMAL(38,0))
                                   * LEAST(r_levels - 1, c_levels - 1)
                                   AS DOUBLE)), 6)
       END AS cramers_v
FROM agg
"""


def x118_autocorrelation(spark: SparkSession, sf_dir: str):
    """Per-user lag-1..3 autocorrelation of event values
    (trend.autocorrelation) — the periodicity detector beside x104's
    level-shift CUSUM and x108's monotone-drift Mann-Kendall. Sliced
    to users < 40 like its siblings (per-user series are
    self-contained); the (ts, event_id) total order makes the lag
    pairing deterministic, pivot-disciplined means and DECIMAL(38,12)
    product folds make the ratio bit-identical across engines."""
    from meshinsights_data_pipeline_spark.operators.trend import (
        autocorrelation,
    )

    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    return autocorrelation(
        ev, "ts", ["user_id"], "value", "event_id", lags=3
    ).orderBy("user_id", "lag")


X118_SQL = """
WITH clean AS (
    SELECT user_id, ts, event_id, CAST(value AS DOUBLE) AS v
    FROM events
    WHERE user_id < 40 AND ts IS NOT NULL AND value IS NOT NULL
      AND NOT isnan(CAST(value AS DOUBLE))
),
pv AS (SELECT user_id, MIN(v) AS p FROM clean GROUP BY user_id),
m AS (
    SELECT c.user_id, CAST(COUNT(*) AS BIGINT) AS n, MIN(pv.p) AS p,
           CAST(SUM(CAST(c.v - pv.p AS DECIMAL(38,12))) AS DOUBLE) AS s
    FROM clean c JOIN pv USING (user_id) GROUP BY c.user_id
),
means AS (SELECT user_id, n, p + s / n AS mean_v FROM m),
cd AS (
    SELECT c.user_id, m2.n, c.v - m2.mean_v AS d,
           LAG(c.v - m2.mean_v, 1) OVER w AS d1,
           LAG(c.v - m2.mean_v, 2) OVER w AS d2,
           LAG(c.v - m2.mean_v, 3) OVER w AS d3
    FROM clean c JOIN means m2 USING (user_id)
    WINDOW w AS (PARTITION BY c.user_id ORDER BY c.ts, c.event_id)
),
stats AS (
    SELECT user_id, CAST(MAX(n) AS BIGINT) AS n,
           CAST(SUM(CAST(d * d AS DECIMAL(38,12))) AS DOUBLE) AS den,
           CAST(SUM(CAST(d * d1 AS DECIMAL(38,12))) AS DOUBLE) AS num1,
           CAST(SUM(CAST(d * d2 AS DECIMAL(38,12))) AS DOUBLE) AS num2,
           CAST(SUM(CAST(d * d3 AS DECIMAL(38,12))) AS DOUBLE) AS num3
    FROM cd GROUP BY user_id
)
SELECT user_id, lag, n,
       CASE WHEN den > 0 AND n > lag
            THEN ROUND(num / den, 6) + 0.0 END AS acf
FROM (
    SELECT user_id, n, 1 AS lag, num1 AS num, den FROM stats
    UNION ALL SELECT user_id, n, 2 AS lag, num2 AS num, den FROM stats
    UNION ALL SELECT user_id, n, 3 AS lag, num3 AS num, den FROM stats
)
ORDER BY user_id, lag
"""


def x119_js_divergence(spark: SparkSession, sf_dir: str):
    """Per-source Jensen-Shannon divergence from the corpus token mix
    (corpus.source_js_divergence) — the symmetric bounded mix distance
    beside x63's TV and x110's entropy. Absent-token mass folds into
    one closed-form ln2 term (no grid — only present (source, token)
    pairs materialize); every ln argument is an exact-integer ratio,
    summands fold DECIMAL(38,18), ln2 is a shared 12-decimal
    literal."""
    from meshinsights_data_pipeline_spark.operators.corpus import (
        source_js_divergence,
    )

    docs = read_table(spark, sf_dir, "documents")
    return source_js_divergence(docs, "source", "text").orderBy("source")


def _x119_sql() -> str:
    from meshinsights_data_pipeline_spark.operators.corpus import LN2_LITERAL
    from meshinsights_data_pipeline_spark.plans.extension_queries import (
        _NORM_SQL,
    )

    norm = _NORM_SQL.format(col="text")
    ln2 = f"CAST(CAST('{LN2_LITERAL}' AS DECIMAL(14,12)) AS DOUBLE)"
    return f"""
WITH counts AS (
    SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
    FROM (
        SELECT source, unnest(string_split({norm}, ' ')) AS tok
        FROM documents
    )
    WHERE tok <> '' AND source IS NOT NULL
    GROUP BY source, tok
),
spine AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS ct FROM counts GROUP BY tok),
sizes AS (
    SELECT source, CAST(SUM(c) AS BIGINT) AS ns,
           CAST(COUNT(*) AS BIGINT) AS types
    FROM counts GROUP BY source
),
tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS n FROM spine),
terms AS (
    SELECT counts.source, sizes.ns, sizes.types, tot.n, spine.ct, counts.c,
           CAST(CAST(counts.c AS DECIMAL(38,0)) * tot.n
                + CAST(spine.ct AS DECIMAL(38,0)) * sizes.ns AS DOUBLE) AS dd
    FROM counts
    JOIN spine USING (tok) JOIN sizes USING (source) CROSS JOIN tot
),
agg AS (
    SELECT source,
           CAST(MAX(ns) AS BIGINT) AS n_tokens,
           CAST(MAX(types) AS BIGINT) AS n_types,
           CAST(MAX(n) AS BIGINT) AS nn,
           CAST(SUM(CAST(
               (CAST(c AS DOUBLE) / CAST(ns AS DOUBLE))
                 * ln(CAST(CAST(2 AS DECIMAL(38,0)) * c * n AS DOUBLE) / dd)
             + (CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
                 * ln(CAST(CAST(2 AS DECIMAL(38,0)) * ct * ns AS DOUBLE) / dd)
           AS DECIMAL(38,18))) AS DOUBLE) AS present,
           SUM(CAST(ct AS DECIMAL(38,0))) AS ct_present
    FROM terms GROUP BY source
)
SELECT source, n_tokens, n_types,
       ROUND((present + {ln2}
              * (1.0 - CAST(ct_present AS DOUBLE) / CAST(nn AS DOUBLE)))
             / 2.0, 6) + 0.0 AS js,
       ROUND(((present + {ln2}
               * (1.0 - CAST(ct_present AS DOUBLE) / CAST(nn AS DOUBLE)))
              / 2.0) / {ln2}, 6) + 0.0 AS js_norm
FROM agg
ORDER BY source
"""


def x120_mann_whitney(spark: SparkSession, sf_dir: str):
    """Mann-Whitney U vs control over the x116 derived experiment
    (abtest.mann_whitney_u) — the nonparametric leg of the two-sample
    triad (x105 proportions, x116 means, x120 distributions). Ranks
    never materialize per row: the pooled average-rank algebra runs on
    (pair, value) COUNTS with doubled rank sums as exact
    DECIMAL(38,0) integers, so u and every comparison are
    engine-exact; only the tie-term/variance/z divisions are IEEE ops,
    in fixed order, rounded once."""
    from meshinsights_data_pipeline_spark.operators.abtest import (
        mann_whitney_u,
    )

    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("experiment"),
        F.when(F.col("user_id") % 2 == 0, "control")
        .otherwise("t1").alias("arm"),
        F.col("value"),
    )
    return mann_whitney_u(
        ev, "experiment", "arm", "value", control_label="control"
    ).orderBy("experiment", "arm")


X120_SQL = """
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
           SUM(CAST(c_a AS DECIMAL(38,0)) * r2) AS r2a,
           SUM(CAST(CAST(c_a + c_c AS DECIMAL(38,0))
                    * (c_a + c_c) * (c_a + c_c)
                    - (c_a + c_c) AS DECIMAL(38,0))) AS ties
    FROM ranked GROUP BY experiment, arm
),
calc AS (
    SELECT *,
           r2a - CAST(CAST(n_arm AS DECIMAL(38,0)) * (n_arm + 1)
                      AS DECIMAL(38,0)) AS u2,
           n_arm + n_control AS n
    FROM stats
),
zc AS (
    SELECT *,
           CAST(u2 - CAST(n_arm AS DECIMAL(38,0)) * n_control
                AS DOUBLE) / 2.0 AS d_half,
           CAST(CAST(n_arm AS DECIMAL(38,0)) * n_control
                AS DOUBLE) AS prod_d,
           CAST(ties AS DOUBLE)
             / CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) AS DOUBLE)
             AS tie_term
    FROM calc
),
vv AS (
    SELECT *, prod_d / 12.0 * (CAST(n + 1 AS DOUBLE) - tie_term) AS var_u
    FROM zc
),
fin AS (
    SELECT *,
           CASE WHEN NOT (var_u > 0) THEN NULL
                WHEN d_half > 0 THEN (d_half - 0.5) / SQRT(var_u)
                WHEN d_half < 0 THEN (d_half + 0.5) / SQRT(var_u)
                ELSE 0.0 END AS zraw
    FROM vv
)
SELECT experiment, arm,
       CASE WHEN n_control > 0 THEN n_control END AS n_control,
       n_arm,
       n_control > 0 AS has_control,
       CASE WHEN n_control > 0 THEN CAST(u2 AS DOUBLE) / 2.0 END AS u,
       CASE WHEN n_control > 0 THEN ROUND(zraw, 6) + 0.0 END AS z,
       COALESCE(ABS(CASE WHEN n_control > 0
                         THEN ROUND(zraw, 6) + 0.0 END) > 1.959964,
                FALSE) AS significant
FROM fin
ORDER BY experiment, arm
"""


def x121_kruskal_wallis(spark: SparkSession, sf_dir: str):
    """Kruskal-Wallis H per experiment over THREE arms
    (abtest.kruskal_wallis): event_type is the experiment, user_id % 3
    the arm — the k-sample omnibus gate upstream of x120's pairwise
    readouts. One pooled ranking per experiment (the x120 count-table
    algebra, doubled ranks as exact integers), per-arm R^2/n terms
    folded DECIMAL(38,6), fixed-order IEEE H with the full tie
    correction."""
    from meshinsights_data_pipeline_spark.operators.abtest import (
        kruskal_wallis,
    )

    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("experiment"),
        (F.col("user_id") % 3).cast("string").alias("arm"),
        F.col("value"),
    )
    return kruskal_wallis(ev, "experiment", "arm", "value").orderBy(
        "experiment"
    )


X121_SQL = """
WITH ev AS (
    SELECT event_type AS experiment,
           CAST(user_id % 3 AS VARCHAR) AS arm,
           CAST(value AS DOUBLE) AS v
    FROM events
    WHERE event_type IS NOT NULL AND value IS NOT NULL
      AND NOT isnan(CAST(value AS DOUBLE))
),
cells AS (
    SELECT experiment, arm, v, CAST(COUNT(*) AS BIGINT) AS c
    FROM ev GROUP BY experiment, arm, v
),
pooled AS (
    SELECT experiment, v, CAST(SUM(c) AS BIGINT) AS t
    FROM cells GROUP BY experiment, v
),
ranked AS (
    SELECT *,
           CAST(2 * COALESCE(SUM(t) OVER (
                    PARTITION BY experiment ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + t + 1 AS DECIMAL(38,0)) AS r2
    FROM pooled
),
armsums AS (
    SELECT c.experiment, c.arm,
           CAST(SUM(c.c) AS BIGINT) AS n_a,
           SUM(CAST(c.c AS DECIMAL(38,0)) * r.r2) AS r2a
    FROM cells c
    JOIN ranked r ON r.experiment = c.experiment AND r.v = c.v
    GROUP BY c.experiment, c.arm
),
perexp AS (
    SELECT experiment, CAST(COUNT(*) AS BIGINT) AS k_arms,
           CAST(SUM(n_a) AS BIGINT) AS n,
           CAST(SUM(CAST(CAST(r2a AS DOUBLE) * CAST(r2a AS DOUBLE) / n_a
                         AS DECIMAL(38,6))) AS DOUBLE) AS s4
    FROM armsums GROUP BY experiment
),
tiesums AS (
    SELECT experiment,
           SUM(CAST(CAST(t AS DECIMAL(38,0)) * t * t - t
                    AS DECIMAL(38,0))) AS ties
    FROM pooled GROUP BY experiment
),
fin AS (
    SELECT p.experiment, k_arms, n, s4,
           1.0 - CAST(ties AS DOUBLE)
               / CAST(CAST(n AS DECIMAL(38,0)) * n * n - n AS DOUBLE)
               AS corr,
           3.0 * s4 / CAST(CAST(n AS DECIMAL(38,0)) * (n + 1) AS DOUBLE)
               - 3.0 * CAST(n + 1 AS DOUBLE) AS h_raw
    FROM perexp p JOIN tiesums USING (experiment)
    WHERE k_arms >= 2
)
SELECT experiment, k_arms, n, CAST(k_arms - 1 AS BIGINT) AS dof,
       CASE WHEN corr > 0 THEN ROUND(h_raw / corr, 6) + 0.0 END AS h
FROM fin
ORDER BY experiment
"""


def x122_spearman(spark: SparkSession, sf_dir: str):
    """Spearman rank correlation of quantity vs price per return flag
    (stats.spearman_correlation) — the monotone-association readout
    over two metrics, with l_quantity's integer values forcing heavy
    ties through the average-rank algebra. Doubled ranks keep every
    closed-form sum an exact DECIMAL(38,0) integer; the only float
    steps are one multiply, one sqrt, one division, rounded once."""
    from meshinsights_data_pipeline_spark.operators.stats import (
        spearman_correlation,
    )

    li = read_table(spark, sf_dir, "lineitem")
    return spearman_correlation(
        li, ["l_returnflag"], "l_quantity", "l_extendedprice"
    ).orderBy("l_returnflag")


X122_SQL = """
WITH clean AS (
    SELECT l_returnflag AS g,
           CAST(l_quantity AS DOUBLE) AS x,
           CAST(l_extendedprice AS DOUBLE) AS y
    FROM lineitem
    WHERE l_returnflag IS NOT NULL
      AND l_quantity IS NOT NULL
      AND NOT isnan(CAST(l_quantity AS DOUBLE))
      AND l_extendedprice IS NOT NULL
      AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
),
xc AS (SELECT g, x, CAST(COUNT(*) AS BIGINT) AS t FROM clean GROUP BY g, x),
xr AS (
    SELECT g, x,
           CAST(2 * COALESCE(SUM(t) OVER (
                    PARTITION BY g ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + t + 1 AS DECIMAL(38,0)) AS rx
    FROM xc
),
yc AS (SELECT g, y, CAST(COUNT(*) AS BIGINT) AS t FROM clean GROUP BY g, y),
yr AS (
    SELECT g, y,
           CAST(2 * COALESCE(SUM(t) OVER (
                    PARTITION BY g ORDER BY y
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + t + 1 AS DECIMAL(38,0)) AS ry
    FROM yc
),
j AS (
    SELECT c.g, xr.rx, yr.ry
    FROM clean c
    JOIN xr ON xr.g = c.g AND xr.x = c.x
    JOIN yr ON yr.g = c.g AND yr.y = c.y
),
agg AS (
    SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
           SUM(rx) AS sx, SUM(ry) AS sy,
           SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy,
           SUM(rx * ry) AS sxy
    FROM j GROUP BY g
)
SELECT g AS l_returnflag, n,
       CASE WHEN n >= 2
                 AND CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx
                          AS DOUBLE) > 0
                 AND CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy
                          AS DOUBLE) > 0
            THEN ROUND(CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy
                            AS DOUBLE)
                       / SQRT(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx
                                   AS DOUBLE)
                              * CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy
                                     AS DOUBLE)), 6) + 0.0
       END AS rho
FROM agg
ORDER BY l_returnflag
"""


def x123_correlation_ratio(spark: SparkSession, sf_dir: str):
    """Correlation ratio eta^2 of event value vs hour-of-day per event
    type (stats.correlation_ratio) — the seasonality-strength /
    cat-num association score completing the triad (x117 cat-cat, x122
    num-num). Pivot-disciplined DECIMAL(38,12) per-(type, hour)
    moments; s_c^2/n_c terms folded DECIMAL(38,6) (the x121 fold);
    fixed-order IEEE SS algebra mirrored in the oracle."""
    from meshinsights_data_pipeline_spark.operators.stats import (
        correlation_ratio,
    )

    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_type"),
        F.hour("ts").alias("hod"),
        F.col("value"),
    )
    return correlation_ratio(
        ev, ["event_type"], "hod", "value"
    ).orderBy("event_type")


X123_SQL = """
WITH clean AS (
    SELECT event_type AS g,
           CAST(EXTRACT(hour FROM ts) AS INT) AS cat,
           CAST(value AS DOUBLE) AS v
    FROM events
    WHERE event_type IS NOT NULL AND ts IS NOT NULL
      AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
),
pv AS (SELECT g, MIN(v) AS p FROM clean GROUP BY g),
cm AS (
    SELECT c.g, c.cat,
           CAST(COUNT(*) AS BIGINT) AS n_c,
           SUM(CAST(c.v - pv.p AS DECIMAL(38,12))) AS s_c,
           SUM(CAST((c.v - pv.p) * (c.v - pv.p)
                    AS DECIMAL(38,12))) AS sq_c
    FROM clean c JOIN pv USING (g)
    GROUP BY c.g, c.cat
),
agg AS (
    SELECT g, CAST(SUM(n_c) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS k_levels,
           CAST(SUM(s_c) AS DOUBLE) AS s,
           CAST(SUM(sq_c) AS DOUBLE) AS sq,
           CAST(SUM(CAST(CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE) / n_c
                         AS DECIMAL(38,6))) AS DOUBLE) AS t1
    FROM cm GROUP BY g
)
SELECT g AS event_type, n, k_levels,
       CASE WHEN n >= 2 AND sq - s * s / n > 0
            THEN ROUND((t1 - s * s / n) / (sq - s * s / n), 6) + 0.0
       END AS eta2
FROM agg
ORDER BY event_type
"""


#: what r15 registers: name -> (builder, oracle_sql)
DRAFTS = {
    "x116_welch_ttest": (x116_welch_ttest, X116_SQL),
    "x117_chi2_independence": (x117_chi2_independence, X117_SQL),
    "x118_autocorrelation": (x118_autocorrelation, X118_SQL),
    "x119_js_divergence": (x119_js_divergence, _x119_sql()),
    "x120_mann_whitney": (x120_mann_whitney, X120_SQL),
    "x121_kruskal_wallis": (x121_kruskal_wallis, X121_SQL),
    "x122_spearman": (x122_spearman, X122_SQL),
    "x123_correlation_ratio": (x123_correlation_ratio, X123_SQL),
}
