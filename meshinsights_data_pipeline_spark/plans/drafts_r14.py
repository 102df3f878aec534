"""Round-14 anchor queries x104–x115 — REGISTERED as of r14.

The operators added in round 13 (CUSUM changepoints, A/B z-test,
k-point EW rolling mean, KS drift, Mann-Kendall/Theil-Sen trend,
Benford conformance, token entropy/Gini, embedding covariance/PCA,
Kaplan-Meier survival, quantile normalization, best-member survivor
selection, cross-source duplicate matrix) shipped with their anchor
queries and DuckDB oracles STAGED here in r13 (proven green by
``tests/test_oracle_drafts.py``) so they would not displace that
round's staleness rotation. Round 14 executed the staged plan:
``plans.queries._register_extensions`` now registers every ``DRAFTS``
pair into ``QUERIES`` (names keep their x1NN identity), each holds a
``_DRIVER_WINDOW_R14`` slot, and the x04 capped-anchor replacement
moved into ``extension_queries.x04_ngram_jaccard`` (same name — the
anchor's operator call changed, so x04 takes a window slot under the
code-change rule).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.session import read_table


def x104_cusum_changepoints(spark: SparkSession, sf_dir: str):
    """Per-user two-sided CUSUM over event values
    (changepoint.cusum_changepoints): the max(0, S+d) recurrence by its
    exact closed form — cumsum minus the running min of prefix sums —
    two O(1) growing ROWS frames over ONE entity-keyed shuffle.
    DECIMAL(18,6)-exact drift folds, one double cast + round(6),
    alarms compare the rounded statistic (both engines decide
    borderline rows identically). Sliced to users < 40 like x91: each
    user's series is self-contained, so the slice changes nothing
    about the statistics it keeps. target/slack/threshold are exact
    decimal literals (50, 10, 40) so both engines fold the same
    drifts."""
    from meshinsights_data_pipeline_spark.operators.changepoint import (
        cusum_changepoints,
    )

    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    return cusum_changepoints(
        ev, "ts", ["user_id"], "value", "event_id",
        target=50.0, slack=10.0, threshold=40.0,
    ).orderBy("user_id", "ts", "event_id")


X104_SQL = """
WITH clean AS (
    SELECT user_id, event_id, ts, CAST(value AS DOUBLE) AS value,
           CAST(value AS DECIMAL(18,6)) - CAST(60.0 AS DECIMAL(18,6)) AS dp,
           CAST(40.0 AS DECIMAL(18,6)) - CAST(value AS DECIMAL(18,6)) AS dm
    FROM events
    WHERE user_id < 40 AND value IS NOT NULL
      AND NOT isnan(CAST(value AS DOUBLE))
),
cum AS (
    SELECT *, SUM(dp) OVER w AS cp, SUM(dm) OVER w AS cm
    FROM clean
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING)
),
stats AS (
    SELECT user_id, event_id, ts, value,
           ROUND(CAST(cp - LEAST(CAST(0 AS DECIMAL(38,6)), MIN(cp) OVER w2)
                      AS DOUBLE), 6) AS s_plus,
           ROUND(CAST(cm - LEAST(CAST(0 AS DECIMAL(38,6)), MIN(cm) OVER w2)
                      AS DOUBLE), 6) AS s_minus
    FROM cum
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING)
)
SELECT user_id, event_id, ts, value, s_plus, s_minus,
       s_plus > 40.0 AS alarm_up,
       s_minus > 40.0 AS alarm_down
FROM stats
ORDER BY user_id, ts, event_id
"""


def x105_ab_test(spark: SparkSession, sf_dir: str):
    """Two-proportion A/B z vs control (abtest.ab_test_zscores) over a
    derived experiment: event_type is the experiment, odd/even user_id
    the arm, value > 75 the conversion. Every float step is a
    correctly-rounded IEEE op in fixed operand order — rates, pooled
    rate, se multiply/sqrt, final divide — so z is bit-identical
    across engines; significance compares the ROUNDED |z|. One
    map-side-combinable aggregate + a broadcast control join; the
    corpus is scanned once (the cell frame is a materialize() barrier
    — without it each join side replayed the scan). The control join is
    LEFT so an experiment with a missing control arm surfaces with
    ``has_control = false`` instead of silently vanishing (every
    experiment here HAS one — the column is exercised as all-true and
    the missing-control path is unit-tested)."""
    from meshinsights_data_pipeline_spark.operators.abtest import (
        ab_test_zscores,
    )

    ev = read_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("experiment"),
        F.when(F.col("user_id") % 2 == 0, "control")
        .otherwise("t1").alias("arm"),
        (F.col("value") > 75.0).alias("conv"),
    )
    return ab_test_zscores(
        ev, "experiment", "arm", "conv", control_label="control"
    ).orderBy("experiment", "arm")


X105_SQL = """
WITH ev AS (
    SELECT event_type AS experiment,
           CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 't1' END AS arm,
           CAST(value > 75.0 AS INT) AS conv
    FROM events
),
cells AS (
    SELECT experiment, arm, COUNT(*) AS n,
           CAST(COALESCE(SUM(conv), 0) AS BIGINT) AS x
    FROM ev GROUP BY experiment, arm
),
j AS (
    SELECT a.experiment, a.arm,
           c.n AS n_control, c.x AS x_control,
           a.n AS n_arm, a.x AS x_arm
    FROM cells a
    LEFT JOIN cells c ON c.experiment = a.experiment AND c.arm = 'control'
    WHERE a.arm <> 'control'
),
calc AS (
    SELECT *,
           CAST(x_control AS DOUBLE) / CAST(n_control AS DOUBLE) AS p_c,
           CAST(x_arm AS DOUBLE) / CAST(n_arm AS DOUBLE) AS p_a,
           (CAST(x_control AS DOUBLE) + CAST(x_arm AS DOUBLE))
             / (CAST(n_control AS DOUBLE) + CAST(n_arm AS DOUBLE)) AS pool
    FROM j
),
z AS (
    SELECT *,
           SQRT(pool * (1.0 - pool)
                * (1.0 / CAST(n_control AS DOUBLE)
                   + 1.0 / CAST(n_arm AS DOUBLE))) AS se
    FROM calc
)
SELECT experiment, arm, n_control, x_control, n_arm, x_arm,
       n_control IS NOT NULL AS has_control,
       ROUND(p_c, 6) AS p_control,
       ROUND(p_a, 6) AS p_arm,
       ROUND(p_a - p_c, 6) AS lift,
       CASE WHEN se > 0 THEN ROUND((p_a - p_c) / se, 6) END AS z,
       COALESCE(ABS(CASE WHEN se > 0 THEN ROUND((p_a - p_c) / se, 6) END)
                > 1.959964, FALSE) AS significant
FROM z
ORDER BY experiment, arm
"""

def x106_exp_weighted_avg(spark: SparkSession, sf_dir: str):
    """Per-user 8-point exponentially-weighted rolling mean over event
    values (rollup.exp_weighted_avg, alpha=1/2): k lag terms over ONE
    window spec — a fixed dyadic-weight arithmetic chain in whole-stage
    codegen, re-normalized over present terms so series heads are
    unbiased. Sliced to users < 40 like x91/x104 (per-user windows are
    self-contained)."""
    from meshinsights_data_pipeline_spark.operators.rollup import (
        exp_weighted_avg,
    )

    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    return exp_weighted_avg(
        ev, "ts", ["user_id"], "value", "event_id", alpha=0.5, k=8
    ).orderBy("user_id", "ts", "event_id")


def _x106_sql(k: int = 8, alpha: float = 0.5) -> str:
    # the same fixed j-order fold, one LAG per term (LAG(value, 0) is
    # the current row in DuckDB, mirroring the operator's j=0 term)
    num = " + ".join(
        f"COALESCE(LAG(value, {j}) OVER w * {alpha * (1 - alpha) ** j!r}, 0)"
        for j in range(k)
    )
    den = " + ".join(
        f"(CASE WHEN LAG(value, {j}) OVER w IS NOT NULL "
        f"THEN {alpha * (1 - alpha) ** j!r} ELSE 0 END)"
        for j in range(k)
    )
    return f"""
WITH clean AS (
    SELECT user_id, event_id, ts, CAST(value AS DOUBLE) AS value
    FROM events
    WHERE user_id < 40 AND value IS NOT NULL
      AND NOT isnan(CAST(value AS DOUBLE))
)
SELECT user_id, event_id, ts, value,
       ROUND(({num}) / ({den}), 6) AS ewa
FROM clean
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, ts, event_id
"""


def x107_ks_drift(spark: SparkSession, sf_dir: str):
    """Exact two-sample KS statistic of each event type's value
    distribution vs the whole corpus (stats.ks_drift) — the sup-norm
    drift monitor completing the family (PSI x88 is binned, TV/chi2 x63
    is token-level). The maximand is the exact integer
    |cum_g*n - cum_all*n_g| through DECIMAL(38,0); only the final
    division is a double, so the arg-max is engine-independent by
    construction. Grid cost |event types| x |distinct values| — bounded
    here; quantize first at the 100 TB tier (same code path)."""
    from meshinsights_data_pipeline_spark.operators.stats import ks_drift

    ev = read_table(spark, sf_dir, "events")
    return ks_drift(ev, "event_type", "value").orderBy("event_type")


X107_SQL = """
WITH vals AS (
    SELECT event_type AS g, CAST(value AS DOUBLE) AS v
    FROM events
    WHERE event_type IS NOT NULL
      AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
),
cgv AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c_gv FROM vals GROUP BY g, v),
spine AS (SELECT v, CAST(SUM(c_gv) AS BIGINT) AS c_v FROM cgv GROUP BY v),
sizes AS (SELECT g, CAST(SUM(c_gv) AS BIGINT) AS n_g FROM cgv GROUP BY g),
tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n FROM sizes),
grid AS (
    SELECT s.g, sp.v, sp.c_v, s.n_g, COALESCE(c.c_gv, 0) AS c_gv
    FROM spine sp CROSS JOIN sizes s
    LEFT JOIN cgv c ON c.g = s.g AND c.v = sp.v
),
cums AS (
    SELECT g, n_g,
           SUM(c_gv) OVER w AS cum_g,
           SUM(c_v) OVER w AS cum_all
    FROM grid
    WINDOW w AS (PARTITION BY g ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT g AS event_type, CAST(MAX(n_g) AS BIGINT) AS n,
       ROUND(CAST(MAX(ABS(CAST(cum_g AS DECIMAL(38,0)) * n
                          - CAST(cum_all AS DECIMAL(38,0)) * n_g)) AS DOUBLE)
             / CAST(CAST(MAX(n_g) AS DECIMAL(38,0)) * MAX(n) AS DOUBLE),
             6) AS ks
FROM cums CROSS JOIN tot
GROUP BY g
ORDER BY event_type
"""


def x108_trend(spark: SparkSession, sf_dir: str):
    """Per-user Mann-Kendall trend test + Theil-Sen slope over event
    values (trend.mann_kendall_trend). Time-tied pairs weigh 0 (the
    textbook treatment — an id tiebreak would make S's sign depend on
    arbitrary labeling) and var(S) carries the full two-way tie
    correction. S and every tie sum are exact integers (DECIMAL(38,0));
    z is continuity-corrected with single correctly-rounded IEEE ops;
    the Sen slope is the exact interpolated median of pairwise
    value-per-second slopes. Sliced to users < 40 like x91/x104 — each
    user's pair set is self-contained, and the within-entity pair join
    is sum-of-n_e^2, the x97 blocking shape. The anchor runs the
    ``cap_n=50`` tier (the operator's 100 TB lever, x90 precedent):
    each user keeps their 50 most-recent clean observations before the
    pair join — genuinely truncating here (users carry 52-83 events at
    sf0.01), mirrored in the oracle's ROW_NUMBER CTE."""
    from meshinsights_data_pipeline_spark.operators.trend import (
        mann_kendall_trend,
    )

    ev = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    return mann_kendall_trend(
        ev, "ts", ["user_id"], "value", cap_n=50
    ).orderBy("user_id")


X108_SQL = """
WITH clean0 AS (
    SELECT user_id, epoch_us(ts) AS us, CAST(value AS DOUBLE) AS v
    FROM events
    WHERE user_id < 40 AND ts IS NOT NULL AND value IS NOT NULL
      AND NOT isnan(CAST(value AS DOUBLE))
),
clean AS (
    -- the cap_n=50 recent-N tier: ts desc, value-desc tiebreak
    -- (identical (ts, v) rows are exchangeable for every statistic)
    SELECT user_id, us, v FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY us DESC, v DESC) AS rn
        FROM clean0
    ) WHERE rn <= 50
),
pairs AS (
    SELECT a.user_id,
           CAST(SIGN(b.v - a.v) AS BIGINT) AS sgn,
           (b.v - a.v) / (CAST(b.us - a.us AS DOUBLE) / 1000000.0) AS slope
    FROM clean a JOIN clean b ON a.user_id = b.user_id AND a.us < b.us
),
st AS (
    SELECT user_id, CAST(SUM(sgn) AS BIGINT) AS s,
           quantile_cont(slope, 0.5) AS sen
    FROM pairs GROUP BY user_id
),
vties AS (
    SELECT user_id,
           SUM(CAST(t AS DECIMAL(38,0)) * (t - 1) * (2 * t + 5)) AS tv5,
           SUM(CAST(t AS DECIMAL(38,0)) * (t - 1) * (t - 2)) AS tv2,
           SUM(CAST(t AS DECIMAL(38,0)) * (t - 1)) AS tv1
    FROM (SELECT user_id, v, COUNT(*) AS t FROM clean GROUP BY user_id, v)
    GROUP BY user_id
),
uties AS (
    SELECT user_id,
           SUM(CAST(t AS DECIMAL(38,0)) * (t - 1) * (2 * t + 5)) AS tu5,
           SUM(CAST(t AS DECIMAL(38,0)) * (t - 1) * (t - 2)) AS tu2,
           SUM(CAST(t AS DECIMAL(38,0)) * (t - 1)) AS tu1
    FROM (SELECT user_id, us, COUNT(*) AS t FROM clean GROUP BY user_id, us)
    GROUP BY user_id
),
sizes AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM clean GROUP BY user_id
),
scored AS (
    SELECT z.user_id, z.n, COALESCE(st.s, 0) AS s,
           ROUND(
               CAST(CAST(z.n AS DECIMAL(38,0)) * (z.n - 1) * (2 * z.n + 5)
                    - vt.tv5 - ut.tu5 AS DOUBLE) / 18.0
               + CASE WHEN z.n >= 3 THEN
                   CAST(vt.tv2 AS DOUBLE) * CAST(ut.tu2 AS DOUBLE)
                   / (9.0 * CAST(CAST(z.n AS DECIMAL(38,0)) * (z.n - 1)
                                 * (z.n - 2) AS DOUBLE))
                 ELSE 0.0 END
               + CAST(vt.tv1 AS DOUBLE) * CAST(ut.tu1 AS DOUBLE)
                 / (2.0 * CAST(CAST(z.n AS DECIMAL(38,0)) * (z.n - 1)
                               AS DOUBLE)),
               6) + 0.0 AS var_s,
           st.sen
    FROM sizes z
    LEFT JOIN st ON st.user_id = z.user_id
    JOIN vties vt ON vt.user_id = z.user_id
    JOIN uties ut ON ut.user_id = z.user_id
    WHERE z.n >= 2
)
SELECT user_id, n, s, var_s,
       ROUND(CASE WHEN var_s <= 0 THEN NULL
                  WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / SQRT(var_s)
                  WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / SQRT(var_s)
                  ELSE 0.0 END, 6) + 0.0 AS z,
       ROUND(sen, 6) + 0.0 AS sen_slope
FROM scored
ORDER BY user_id
"""


def x109_benford(spark: SparkSession, sf_dir: str):
    """Benford first-digit conformance of lineitem prices per return
    flag (dq.benford_deviation) — the fabricated-feed detector. The
    digit comes from the DECIMAL(18,6) string rendering
    (probe-verified bit-identical across engines), expected
    proportions are shared 12-decimal literals, the 9 chi-square terms
    fold through DECIMAL(38,18), and absent digits contribute their
    full expected weight via the 9-digit spine."""
    from meshinsights_data_pipeline_spark.operators.dq import (
        benford_deviation,
    )

    li = read_table(spark, sf_dir, "lineitem")
    return benford_deviation(li, "l_returnflag", "l_extendedprice").orderBy(
        "l_returnflag"
    )


def _x109_sql() -> str:
    from meshinsights_data_pipeline_spark.operators.dq import BENFORD_EXPECTED

    spine = ", ".join(
        f"({d}, CAST({e} AS DECIMAL(14,12)))"
        for d, e in BENFORD_EXPECTED.items()
    )
    return f"""
WITH vals AS (
    SELECT l_returnflag AS g,
           regexp_extract(
               CAST(CAST(ABS(CAST(l_extendedprice AS DOUBLE))
                         AS DECIMAL(18,6)) AS VARCHAR),
               '[1-9]') AS d
    FROM lineitem
    WHERE l_returnflag IS NOT NULL
      AND l_extendedprice IS NOT NULL
      AND NOT isnan(CAST(l_extendedprice AS DOUBLE))
      AND ABS(CAST(l_extendedprice AS DOUBLE)) < 1e12
),
obs AS (
    SELECT g, CAST(d AS INT) AS d, CAST(COUNT(*) AS BIGINT) AS c
    FROM vals WHERE d <> '' GROUP BY g, d
),
sizes AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM obs GROUP BY g),
spine(d, e) AS (VALUES {spine}),
grid AS (
    SELECT s.g, s.n, sp.d, CAST(sp.e AS DOUBLE) AS e,
           COALESCE(o.c, 0) AS c
    FROM sizes s CROSS JOIN spine sp
    LEFT JOIN obs o ON o.g = s.g AND o.d = sp.d
)
SELECT g AS l_returnflag, CAST(MAX(n) AS BIGINT) AS n,
       ROUND(CAST(MAX(n) AS DOUBLE)
             * CAST(SUM(CAST((CAST(c AS DOUBLE) / n - e)
                             * (CAST(c AS DOUBLE) / n - e) / e
                             AS DECIMAL(38,18))) AS DOUBLE), 6) AS chi2,
       ROUND(MAX(ABS(CAST(c AS DOUBLE) / n - e)), 6) AS max_dev
FROM grid
GROUP BY g
ORDER BY l_returnflag
"""


def x110_token_entropy(spark: SparkSession, sf_dir: str):
    """Per-source token-distribution entropy + Gini concentration
    (corpus.source_token_entropy) — the information-theoretic mix-health
    signal next to x74's TTR/Zipf. Every ln argument is an exact
    integer, summands fold DECIMAL(38,18), the Gini rank-sum routes
    DECIMAL(38,0), rank ties break on token."""
    from meshinsights_data_pipeline_spark.operators.corpus import (
        source_token_entropy,
    )

    docs = read_table(spark, sf_dir, "documents")
    return source_token_entropy(docs, "source", "text").orderBy("source")


def _x110_sql() -> str:
    from meshinsights_data_pipeline_spark.plans.extension_queries import (
        _NORM_SQL,
    )

    norm = _NORM_SQL.format(col="text")
    return f"""
WITH counts AS (
    SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
    FROM (
        SELECT source, unnest(string_split({norm}, ' ')) AS tok
        FROM documents
    )
    WHERE tok <> ''
    GROUP BY source, tok
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY c ASC, tok ASC) AS i
    FROM counts
),
agg AS (
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                         AS DECIMAL(38,18))) AS DOUBLE) AS clnc,
           SUM(CAST(i AS DECIMAL(38,0)) * c) AS ic
    FROM ranked GROUP BY source
)
SELECT source, n_tokens, n_types,
       ROUND(ln(CAST(n_tokens AS DOUBLE))
             - clnc / CAST(n_tokens AS DOUBLE), 6) AS entropy,
       CASE WHEN n_types >= 2 THEN
           ROUND((ln(CAST(n_tokens AS DOUBLE))
                  - clnc / CAST(n_tokens AS DOUBLE))
                 / ln(CAST(n_types AS DOUBLE)), 6)
       END AS norm_entropy,
       ROUND((CAST(CAST(2 AS DECIMAL(38,0)) * ic AS DOUBLE)
              - (CAST(n_types AS DOUBLE) + 1) * CAST(n_tokens AS DOUBLE))
             / (CAST(n_types AS DOUBLE) * CAST(n_tokens AS DOUBLE)),
             6) AS gini
FROM agg
ORDER BY source
"""


def x111_embedding_covariance(spark: SparkSession, sf_dir: str):
    """Covariance matrix of the leading 16 embedding dimensions
    (similarity.embedding_covariance) — the second-moment health report
    (collapsed dims, redundant pairs, covariance drift) and the input
    to PCA whitening. Product and per-dim sums fold DECIMAL(38,12)
    (the x96 centroid discipline); cov is three fixed IEEE ops on the
    UNROUNDED means; indices 1-based in both engines. The within-row
    pair join costs d(d+1)/2 rows per vector — the dims= cap is the
    scale lever, or pre-reduce with pca_components."""
    from meshinsights_data_pipeline_spark.operators.similarity import (
        embedding_covariance,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    return embedding_covariance(emb, "vec_id", "embedding", dims=16).orderBy(
        "i", "j"
    )


X111_SQL = """
WITH comp AS (
    SELECT vec_id, u.s.p AS p, u.s.x AS x FROM (
        SELECT vec_id,
               [struct_pack(p := i, x := v[i]) FOR i IN range(1, 17)] AS cs
        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    ), UNNEST(cs) AS u(s)
),
sums AS (
    SELECT a.p AS i, b.p AS j, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(a.x * b.x AS DECIMAL(38,12))) AS DOUBLE) AS sxy
    FROM comp a JOIN comp b ON a.vec_id = b.vec_id AND a.p <= b.p
    GROUP BY a.p, b.p
),
means AS (
    SELECT p, CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) / COUNT(x) AS m
    FROM comp GROUP BY p
)
SELECT i, j, n,
       ROUND(mi.m, 6) + 0.0 AS mean_i,
       ROUND(mj.m, 6) + 0.0 AS mean_j,
       ROUND(sxy / n - mi.m * mj.m, 6) + 0.0 AS cov
FROM sums
JOIN means mi ON mi.p = i
JOIN means mj ON mj.p = j
ORDER BY i, j
"""


def x112_km_survival(spark: SparkSession, sf_dir: str):
    """Kaplan-Meier time-to-churn curves per user cohort
    (survival.km_survival): duration = each user's first-to-last event
    span in exact micros, churn observed when the user's last event
    precedes the corpus max by > 12 hours (otherwise right-censored —
    still active at cutoff; the threshold holds churned/censored mass
    at every SF because the user count, not per-user density, scales), cohort = user_id % 4. The cumulative
    product is exp(DECIMAL-folded sum of ln factors) — a windowed float
    PRODUCT is association-order-dependent across engines — with an
    explicit cumulative zero flag for the n=d full-death case."""
    from meshinsights_data_pipeline_spark.operators.survival import (
        km_survival,
    )

    ev = read_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.min("ts").alias("_t0"), F.max("ts").alias("_t1")
    )
    mx = ev.agg(F.max("ts").alias("_tmax"))
    prep = spans.crossJoin(F.broadcast(mx)).select(
        (F.col("user_id") % 4).alias("cohort"),
        F.expr("timestampdiff(MICROSECOND, _t0, _t1)").alias("_dur"),
        (F.col("_t1") < F.col("_tmax") - F.expr("INTERVAL 12 HOURS")).alias(
            "_churned"
        ),
    )
    return km_survival(prep, ["cohort"], "_dur", "_churned").orderBy(
        "cohort", "t"
    )


X112_SQL = """
WITH spans AS (
    SELECT user_id, MIN(ts) AS t0, MAX(ts) AS t1 FROM events GROUP BY user_id
),
mx AS (SELECT MAX(ts) AS tmax FROM events),
prep AS (
    SELECT user_id % 4 AS cohort,
           epoch_us(t1) - epoch_us(t0) AS dur,
           t1 < tmax - INTERVAL 12 HOUR AS churned
    FROM spans CROSS JOIN mx
),
spine AS (
    SELECT cohort, dur AS t, CAST(COUNT(*) AS BIGINT) AS c,
           CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS d
    FROM prep GROUP BY cohort, dur
),
sizes AS (
    SELECT cohort, CAST(SUM(c) AS BIGINT) AS n_g FROM spine GROUP BY cohort
),
risky AS (
    SELECT s.cohort, s.t, s.c, s.d,
           z.n_g - COALESCE(SUM(s.c) OVER (
               PARTITION BY s.cohort ORDER BY s.t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
    FROM spine s JOIN sizes z ON z.cohort = s.cohort
),
scored AS (
    SELECT *,
           MAX(CASE WHEN d >= 1 AND n_risk = d THEN 1 ELSE 0 END)
               OVER w AS zeroed,
           SUM(CASE WHEN d >= 1 AND n_risk > d
                    THEN CAST(ln(CAST(n_risk - d AS DOUBLE)
                                 / CAST(n_risk AS DOUBLE))
                              AS DECIMAL(38,18)) END) OVER w AS logsum
    FROM risky
    WINDOW w AS (PARTITION BY cohort ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT cohort, t, CAST(n_risk AS BIGINT) AS n_risk, d AS n_events,
       CASE WHEN zeroed = 1 THEN 0.0
            ELSE ROUND(exp(COALESCE(CAST(logsum AS DOUBLE), 0.0)), 6)
       END AS survival
FROM scored
WHERE d >= 1
ORDER BY cohort, t
"""


def x113_quantile_normalize(spark: SparkSession, sf_dir: str):
    """Quantile normalization of per-source document lengths onto the
    corpus distribution (stats.quantile_normalize) — the pre-mixing
    transform for incomparable per-scorer/per-source scales: equal
    within-group ranks map to equal corpus values. Within-group ranks
    use the total order (value, id); the corpus rank is the
    distributed global ranker (ONE range shuffle, no single-task
    sort); p/pos/frac/interpolation are fixed-order single IEEE ops."""
    from meshinsights_data_pipeline_spark.operators.stats import (
        quantile_normalize,
    )

    docs = read_table(spark, sf_dir, "documents")
    return quantile_normalize(docs, "source", "n_chars", "doc_id").orderBy(
        "source", "doc_id"
    )


X113_SQL = """
WITH clean AS (
    SELECT source AS g, doc_id AS id, CAST(n_chars AS DOUBLE) AS v
    FROM documents
    WHERE source IS NOT NULL AND n_chars IS NOT NULL
      AND NOT isnan(CAST(n_chars AS DOUBLE))
),
rg AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, id) AS r,
           COUNT(*) OVER (PARTITION BY g) AS n_g
    FROM clean
),
corpus AS (
    SELECT v AS cv, ROW_NUMBER() OVER (ORDER BY v) AS rn,
           COUNT(*) OVER () AS n
    FROM clean
),
scored AS (
    SELECT g, id, v,
           CASE WHEN n_g > 1
                THEN CAST(r - 1 AS DOUBLE) / CAST(n_g - 1 AS DOUBLE)
                ELSE 0.5 END
             * CAST((SELECT MAX(n) FROM corpus) - 1 AS DOUBLE) AS pos
    FROM rg
)
SELECT g AS source, id AS doc_id, v AS n_chars,
       ROUND(lo.cv + (hi.cv - lo.cv) * (pos - FLOOR(pos)), 6) + 0.0 AS qnorm
FROM scored
JOIN corpus lo ON lo.rn = CAST(FLOOR(pos) + 1 AS BIGINT)
JOIN corpus hi ON hi.rn = CAST(CEIL(pos) + 1 AS BIGINT)
ORDER BY source, doc_id
"""


def x114_best_survivors(spark: SparkSession, sf_dir: str):
    """Quality-aware cluster dedup (components.dedup_survivors_by): the
    x23 minhash-LSH verified pair graph collapsed to one survivor per
    cluster, chosen by HIGHEST n_chars (ties -> smallest doc_id) — the
    FineWeb-style keep-the-best-member policy, vs dedup_survivors'
    min-id convention. The winner rank is the total order
    (score DESC, id ASC) via the hot-group-safe grouped_row_number;
    the corpus is touched once, by the final anti-join."""
    from meshinsights_data_pipeline_spark.operators.components import (
        dedup_survivors_by,
    )
    from meshinsights_data_pipeline_spark.operators import dedup as D

    docs = read_table(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.2)
    return (
        dedup_survivors_by(docs, pairs, "doc_id", "n_chars")
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


def _x114_sql() -> str:
    from meshinsights_data_pipeline_spark.plans.extension_queries import (
        _dedup_clusters_sql,
    )

    base = _dedup_clusters_sql()
    # reuse the x23 fixpoint verbatim, swap the projection for the
    # best-member anti-join
    tail = "SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id ORDER BY id"
    assert base.rstrip().endswith(tail.strip()), "x23 SQL shape changed"
    head = base[: base.rindex("SELECT id, MIN(r)")].rstrip()
    # head now ends with reach's closing paren; the comma continues the
    # WITH list
    return head + """,
    comp AS (
        SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
    ),
    ranked AS (
        SELECT c.id,
               ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                  ORDER BY d.n_chars DESC, c.id ASC) AS rk
        FROM comp c JOIN documents d ON d.doc_id = c.id
    )
    SELECT doc_id, source, n_chars FROM documents
    WHERE doc_id NOT IN (SELECT id FROM ranked WHERE rk > 1)
    ORDER BY doc_id
    """


def x115_source_dup_matrix(spark: SparkSession, sf_dir: str):
    """Cross-source duplicate matrix (corpus.source_duplicate_matrix):
    per source pair, the share of each side's distinct content
    fingerprints also present in the other — WHERE inter-source
    duplication lives, the diagnostic the per-source report card can't
    see. The anchor runs the prefix_tokens=8 head-fingerprint tier
    (recrawl detection — trailing chrome differs, heads collide;
    full-text x01 identity is vacuously empty on this corpus and stays
    the operator default). Corpus collapses to distinct (source, fp)
    map-side; the self-join keys on the fingerprint (|sources|^2 per
    fp, never corpus^2); exact-integer fractions rounded once."""
    from meshinsights_data_pipeline_spark.operators.corpus import (
        source_duplicate_matrix,
    )

    docs = read_table(spark, sf_dir, "documents")
    return source_duplicate_matrix(
        docs, "source", "text", prefix_tokens=8
    ).orderBy("src_a", "src_b")


def _x115_sql() -> str:
    from meshinsights_data_pipeline_spark.plans.extension_queries import (
        _NORM_SQL,
    )

    norm = _NORM_SQL.format(col="text")
    return f"""
WITH fps AS (
    SELECT DISTINCT source AS src,
           md5(array_to_string((string_split({norm}, ' '))[1:8], ' ')) AS fp
    FROM documents WHERE source IS NOT NULL
),
sizes AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS sz FROM fps GROUP BY src),
shared AS (
    SELECT a.src AS src_a, b.src AS src_b, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM fps a JOIN fps b ON a.fp = b.fp
    WHERE a.src < b.src
    GROUP BY a.src, b.src
)
SELECT src_a, src_b, sa.sz AS fp_a, sb.sz AS fp_b, n_shared,
       ROUND(n_shared * 1.0 / sa.sz, 6) AS dup_frac_a,
       ROUND(n_shared * 1.0 / sb.sz, 6) AS dup_frac_b
FROM shared
JOIN sizes sa ON sa.src = src_a
JOIN sizes sb ON sb.src = src_b
ORDER BY src_a, src_b
"""


#: registered into QUERIES by plans.queries._register_extensions
DRAFTS = {
    "x104_cusum_changepoints": (x104_cusum_changepoints, X104_SQL),
    "x105_ab_test": (x105_ab_test, X105_SQL),
    "x106_exp_weighted_avg": (x106_exp_weighted_avg, _x106_sql()),
    "x107_ks_drift": (x107_ks_drift, X107_SQL),
    "x108_trend": (x108_trend, X108_SQL),
    "x109_benford": (x109_benford, _x109_sql()),
    "x110_token_entropy": (x110_token_entropy, _x110_sql()),
    "x111_embedding_covariance": (x111_embedding_covariance, X111_SQL),
    "x112_km_survival": (x112_km_survival, X112_SQL),
    "x113_quantile_normalize": (x113_quantile_normalize, X113_SQL),
    "x114_best_survivors": (x114_best_survivors, _x114_sql()),
    "x115_source_dup_matrix": (x115_source_dup_matrix, _x115_sql()),
}
