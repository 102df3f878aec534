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

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class LinkageField:
    """One compare field in :func:`blocked_record_linkage_fields`.

    ``kind`` picks the similarity: ``"string"`` → normalized
    Levenshtein ``1 - lev/maxlen``; ``"numeric"`` → scaled proximity
    ``max(0, 1 - |a-b|/scale)`` (``scale`` is the distance at which
    agreement reaches zero; ignored for strings). ``weight`` is the
    field's share of the score — weights need not sum to 1, the
    threshold is in the same units as the weighted sum.
    """

    col: str
    kind: str  # "string" | "numeric"
    weight: float
    scale: float = 1000.0

    def __post_init__(self) -> None:
        if self.kind not in ("string", "numeric"):
            raise ValueError(f"unknown field kind: {self.kind!r}")
        if self.weight < 0:
            raise ValueError(f"negative weight for {self.col!r}")
        if self.kind == "numeric" and self.scale <= 0:
            raise ValueError(f"non-positive scale for {self.col!r}")


def blocked_record_linkage_fields(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    fields: list[LinkageField],
    threshold: float = 0.5,
    round_to: int = 6,
    max_block_rows: int | None = None,
) -> DataFrame:
    """Candidate pairs within each block, scored by N-field weighted
    agreement: ``score = sum_i w_i * sim_i`` with ``sim`` per
    :class:`LinkageField`. Returns ``[id_a, id_b, score]`` (id_a <
    id_b) for pairs whose ROUNDED score >= threshold (both engines
    decide borderline pairs identically). Rows with a NULL block
    component never pair (inner equality join semantics — NULL !=
    NULL); a NULL compare field scores 0 agreement on that field
    rather than nulling the whole score.

    ``max_block_rows`` makes the small-block precondition ENFORCED
    rather than advisory (r17, VERDICT r16 item 7): a block of k rows
    costs k(k-1)/2 candidate pairs on one block-keyed task, so when
    set, rows in blocks larger than the cap are excluded from pairing
    BEFORE the self-join (one extra count aggregate on the block key —
    the same map-side-combinable rule as the dedup df cap; a block
    that big is a failed blocking key, not signal). ``None`` (default)
    pairs every block, unchanged.

    Sound pre-filter from the weight algebra, per numeric field: even
    if every OTHER field matches perfectly (contributing its full
    weight — and a NULL-field pair contributes at most that), the pair
    cannot reach the threshold unless field i's similarity is at least
    ``(threshold - sum_{j!=i} w_j) / w_i``, i.e. ``|a_i - b_i| <=
    (1 - that) * scale_i``. Each bound that is positive is applied
    BEFORE the Levenshtein projections, so the expensive edit
    distances only run on pairs that can still pass (the x97 measured
    win); the 1e-6 slack covers round_to-level boundary effects so no
    rounded-in pair is ever pre-filtered out. Rows the filter keeps
    still score exactly. (String fields get no pre-filter — their
    similarity IS the expensive term the numeric bounds protect.)

    Cross-engine determinism: Levenshtein is an integer edit distance
    (the x14 parity surface); each similarity term is one or two IEEE
    double ops; the weighted sum folds in the given field order
    (fixed-order double adds); round to ``round_to``.

    Scale shape: one hash-partitioned equality self-join on the block
    key + a map-side score projection — sum-of-|block|^2 work, no
    global pair space, unchanged from the 2-field form.
    """
    if not fields:
        raise ValueError("fields must be non-empty")
    cols = list(dict.fromkeys(
        [id_col, *block_cols, *[f.col for f in fields]]
    ))
    if max_block_rows is not None:
        ok = (
            df.groupBy(*block_cols)
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .filter(F.col("_bsz") <= int(max_block_rows))
            .select(*block_cols)
        )
        df = df.join(ok, block_cols, "left_semi")
    a = df.select([F.col(c).alias(f"a_{c}") for c in cols])
    b = df.select([F.col(c).alias(f"b_{c}") for c in cols])
    cond = [F.col(f"a_{c}") == F.col(f"b_{c}") for c in block_cols]
    pairs = a.join(b, cond).filter(F.col(f"a_{id_col}") < F.col(f"b_{id_col}"))

    total_w = sum(float(f.weight) for f in fields)
    for f_ in fields:
        if f_.kind != "numeric" or f_.weight <= 0:
            continue
        w_other = total_w - float(f_.weight)
        min_sim = (float(threshold) - w_other) / float(f_.weight) - 1e-6
        if min_sim > 0:
            va = F.col(f"a_{f_.col}").cast("double")
            vb = F.col(f"b_{f_.col}").cast("double")
            pairs = pairs.filter(
                F.abs(va - vb) <= F.lit((1.0 - min_sim) * float(f_.scale))
            )

    score = F.lit(0.0)
    for f_ in fields:
        if f_.kind == "string":
            sa, sb = F.col(f"a_{f_.col}"), F.col(f"b_{f_.col}")
            sim = F.lit(1.0) - F.levenshtein(sa, sb) / F.greatest(
                F.length(sa), F.length(sb)
            )
        else:
            va = F.col(f"a_{f_.col}").cast("double")
            vb = F.col(f"b_{f_.col}").cast("double")
            sim = F.greatest(
                F.lit(0.0),
                F.lit(1.0) - F.abs(va - vb) / F.lit(float(f_.scale)),
            )
        score = score + F.lit(float(f_.weight)) * F.coalesce(sim, F.lit(0.0))
    score = F.round(score, round_to)

    return (
        pairs.select(
            F.col(f"a_{id_col}").alias("id_a"),
            F.col(f"b_{id_col}").alias("id_b"),
            score.alias("score"),
        )
        .filter(F.col("score") >= float(threshold))
    )


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
    max_block_rows: int | None = None,
) -> DataFrame:
    """The classic one-string-one-numeric form (x97's oracle surface):
    ``score = w_string * (1 - lev/maxlen) + w_numeric * max(0, 1 -
    |a-b|/numeric_scale)``. Delegates to
    :func:`blocked_record_linkage_fields` — the 2-field spec reproduces
    the same join, the same pre-filter bound ``(threshold - w_string)
    / w_numeric`` (the general per-field bound with one other field),
    and the same fixed-order weighted sum, so scores are bit-identical
    to the pre-generalization operator.
    """
    return blocked_record_linkage_fields(
        df,
        id_col,
        block_cols,
        [
            LinkageField(string_col, "string", float(w_string)),
            LinkageField(
                numeric_col, "numeric", float(w_numeric),
                float(numeric_scale),
            ),
        ],
        threshold=threshold,
        round_to=round_to,
        max_block_rows=max_block_rows,
    )
