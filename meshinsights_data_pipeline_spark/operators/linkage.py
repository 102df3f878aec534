"""Blocked record linkage — entity resolution over STRUCTURED records.

The text family (dedup.py) answers "are these two documents the same
content"; this answers "are these two ROWS the same real-world entity"
(customers, suppliers, venues) — the Fellegi-Sunter-shaped pipeline
every warehouse dedup/merge project runs: (1) BLOCKING bounds the pair
space to rows sharing a cheap equality key, (2) candidate pairs score
by weighted per-field agreement, (3) pairs past a threshold feed the
same connected-components collapse the text path uses
(operators/components.py).

Scale contract: the self-join is equality-keyed on the block — cost is
sum over blocks of |block|^2, NEVER corpus^2. Blocking keys must be
chosen so blocks stay small; a skewed block costs its own square (cap
or salt pathological blocks upstream, the x60 toolkit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_record_linkage(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    string_col: str,
    numeric_col: str,
    numeric_scale: float = 1000.0,
    w_string: float = 0.5,
    w_numeric: float = 0.5,
    threshold: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Candidate pairs within each block, scored by weighted field
    agreement: ``score = w_string * (1 - lev/maxlen) + w_numeric *
    max(0, 1 - |a-b|/numeric_scale)`` — normalized Levenshtein
    similarity on the string field plus scaled proximity on the numeric
    field. Returns ``[id_a, id_b, score]`` (id_a < id_b) for pairs
    whose ROUNDED score >= threshold (both engines decide borderline
    pairs identically). Rows with a NULL block component never pair
    (inner equality join semantics — NULL != NULL).

    Cross-engine determinism: Levenshtein is an integer edit distance
    (the x14 parity surface); each similarity term is one or two IEEE
    double ops; the weighted sum is two multiplies and one add in fixed
    order; round to ``round_to``.

    Scale shape: one hash-partitioned equality self-join on the block
    key + a map-side score projection — sum-of-|block|^2 work, no
    global pair space. NULL-valued compare fields score 0 agreement on
    that field rather than nulling the whole score.
    """
    cols = [id_col, *block_cols, string_col, numeric_col]
    a = df.select([F.col(c).alias(f"a_{c}") for c in cols])
    b = df.select([F.col(c).alias(f"b_{c}") for c in cols])
    cond = [F.col(f"a_{c}") == F.col(f"b_{c}") for c in block_cols]
    pairs = a.join(b, cond).filter(F.col(f"a_{id_col}") < F.col(f"b_{id_col}"))
    sa, sb = F.col(f"a_{string_col}"), F.col(f"b_{string_col}")
    na, nb = (
        F.col(f"a_{numeric_col}").cast("double"),
        F.col(f"b_{numeric_col}").cast("double"),
    )
    # Sound pre-filter from the weight algebra: even a PERFECT string
    # match (s_sim = 1, and a NULL-field pair scores at most this too)
    # cannot reach the threshold unless n_sim >= (threshold - w_string)
    # / w_numeric, i.e. |a - b| <= (1 - that) * scale. Applying it
    # BEFORE the Levenshtein projection prunes the bulk of each block's
    # pairs at comparison cost ~zero (x97 measured 5.5s -> the edit
    # distance dominated; see test for the slack). The 1e-6 slack
    # covers round_to-level boundary effects so no rounded-in pair is
    # ever pre-filtered out; rows the filter keeps still score exactly.
    min_n_sim = (
        (float(threshold) - float(w_string)) / float(w_numeric) - 1e-6
        if w_numeric > 0
        else 0.0
    )
    if min_n_sim > 0:
        pairs = pairs.filter(
            F.abs(na - nb) <= F.lit((1.0 - min_n_sim) * float(numeric_scale))
        )
    s_sim = F.lit(1.0) - F.levenshtein(sa, sb) / F.greatest(
        F.length(sa), F.length(sb)
    )
    n_sim = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.abs(na - nb) / F.lit(float(numeric_scale))
    )
    score = F.round(
        F.lit(float(w_string)) * F.coalesce(s_sim, F.lit(0.0))
        + F.lit(float(w_numeric)) * F.coalesce(n_sim, F.lit(0.0)),
        round_to,
    )
    return (
        pairs.select(
            F.col(f"a_{id_col}").alias("id_a"),
            F.col(f"b_{id_col}").alias("id_b"),
            score.alias("score"),
        )
        .filter(F.col("score") >= float(threshold))
    )
