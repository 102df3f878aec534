"""Round-14 anchor DRAFTS — NOT registered.

The r13 driver window is reserved for the staleness rotation (verdict
r12 #1), so the two operators added this round (CUSUM changepoints,
A/B z-test) ship with their anchor queries and DuckDB oracles staged
HERE, proven green against the oracle harness by
``tests/test_oracle_drafts.py``. Round 14 moves each (builder, SQL)
pair into ``extension_queries.EXTENSION_BUILDERS`` and gives it a
``_DRIVER_WINDOW`` slot — registration is a copy, not new work.

Round-14 window math (for whoever rotates next): 2 slots for x104/x105
(new), 2 for x06/x54 (displaced from the r13 fill band by the x90/x97
code-change slots), the 29-query r10-stale cohort in full, then fill
to 50 with the oldest r11 queries. After that rotation no query is
staler than r11.
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
    — without it each join side replayed the scan)."""
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
    JOIN cells c ON c.experiment = a.experiment AND c.arm = 'control'
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


def x04_ngram_jaccard_capped(spark: SparkSession, sf_dir: str):
    """x04's anchor with the max_doc_freq=4 scale cap — staged as the
    r14 REPLACEMENT for the uncapped anchor (which posts the r13
    bench's worst sf1 ratio, 4.1x, from exactly the hot-shingle
    quadratic the cap removes; x90's identical switch took its ratio
    4.1x -> 3.0x in r13). Denominators stay uncapped so capping only
    removes pairs (property-tested); at sf0.01 cap=4 preserves the
    full 25-pair result, so the driver record is unchanged by the
    switch. r14: replace x04's builder + SQL with this pair and give
    x04 a window slot (operator code change rule)."""
    from meshinsights_data_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = read_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.2, max_doc_freq=4
    ).orderBy("id_a", "id_b")


def _x04_capped_sql() -> str:
    from meshinsights_data_pipeline_spark.plans.extension_queries import (
        _shingles_cte,
    )

    return f"""
WITH {_shingles_cte()},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
low_df AS (SELECT h FROM sh GROUP BY h HAVING COUNT(*) <= 4),
shc AS (SELECT sh.doc_id, sh.h FROM sh JOIN low_df ON low_df.h = sh.h),
inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
    FROM shc a JOIN shc b ON a.h = b.h
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       ROUND(inter * 1.0 / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE ROUND(inter * 1.0 / (sa.sz + sb.sz - inter), 6) >= 0.2
ORDER BY id_a, id_b
"""


#: what r14 registers: name -> (builder, oracle_sql)
DRAFTS = {
    "x104_cusum_changepoints": (x104_cusum_changepoints, X104_SQL),
    "x105_ab_test": (x105_ab_test, X105_SQL),
    "x106_exp_weighted_avg": (x106_exp_weighted_avg, _x106_sql()),
    "x04_ngram_jaccard_capped": (x04_ngram_jaccard_capped, _x04_capped_sql()),
}
