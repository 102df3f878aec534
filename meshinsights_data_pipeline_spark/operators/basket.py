"""Market-basket association mining: pairwise support / confidence /
lift over (basket, item) rows — the classic co-occurrence analytics
primitive (Agrawal et al. 1993's frequent-itemset measures, restricted
to pairs, which is the overwhelmingly common production use: "items
bought together", co-cited documents, co-queried terms). Sibling of the
graph view of the same co-occurrence data (operators.graph
triangle_counts / pagerank): the graph ops score STRUCTURE, this scores
STATISTICAL ASSOCIATION.

Scale design: one distinct pass to (basket, item), one self-join keyed
on the basket id (pairs only materialize per basket — cost is
sum-of-squared-basket-sizes, which real baskets keep tiny; a
pathological mega-basket should be capped upstream), one
map-side-combinable pair count, and a broadcast-sized item-count frame
joined back twice. All measures are exact integer counts plus single
IEEE divisions — bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_pair_stats(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support_count: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Pairwise association measures over (basket, item) rows.

    Returns ``[item_a, item_b, n_ab, support, confidence_a_b, lift]``
    with ``item_a < item_b``, for pairs co-occurring in at least
    ``min_support_count`` baskets:

    - ``support`` = n_ab / n_baskets
    - ``confidence_a_b`` = n_ab / n_a  (P(b | a))
    - ``lift`` = n_ab * n_baskets / (n_a * n_b) — >1 means the pair
      co-occurs more than independence predicts

    Duplicate (basket, item) rows collapse first, so a basket
    contributes each pair at most once. The total basket count joins in
    as a broadcast 1-row frame (no plan-build collect); the product in
    lift's numerator routes through DECIMAL(38,0) so billion-basket
    corpora cannot wrap the BIGINT product (the x73 quota discipline).
    """
    # The distinct (basket, item) frame feeds FOUR subtrees (both pair-join
    # sides, the item marginals, the basket total); left lazy, each one
    # replays the scan + the distinct shuffle (r16: zero ReusedExchange
    # across the diamond in the executed x83 plan for the aggregate
    # consumers). A lazy localCheckpoint (the duplicate_spans idiom)
    # materializes it ONCE at the first action and every consumer reads
    # the same executor-local blocks — no cache-manager persist of a
    # corpus-sized frame, and at real scale the documented alternative is
    # writing the frame to storage (same shape, same single pass).
    bi = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct().localCheckpoint(eager=False)
    a = bi.select(F.col("b"), F.col("i").alias("item_a"))
    c = bi.select(F.col("b"), F.col("i").alias("item_b"))
    pair_counts = (
        a.join(c, "b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= int(min_support_count))
    )
    item_counts = bi.groupBy("i").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i")
    )
    totals = bi.agg(
        F.countDistinct("b").cast("bigint").alias("n_baskets")
    )
    return association_stats(pair_counts, item_counts, totals, round_to)


def association_stats(
    pair_counts: DataFrame,
    item_counts: DataFrame,
    totals: DataFrame,
    round_to: int = 6,
) -> DataFrame:
    """The measure projection shared by the batch operator and the
    streaming twin (single definition — the twin's bit-parity claim
    must never depend on keeping a copy in sync): given
    ``[item_a, item_b, n_ab]``, ``[i, n_i]`` and a 1-row
    ``[n_baskets]``, emit support / confidence / lift. The lift product
    routes through DECIMAL(38,0) so billion-basket corpora cannot wrap
    BIGINT; item counts and the total broadcast."""
    ia = item_counts.select(
        F.col("i").alias("item_a"), F.col("n_i").alias("n_a")
    )
    ib = item_counts.select(
        F.col("i").alias("item_b"), F.col("n_i").alias("n_b")
    )
    return (
        pair_counts.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            F.round(F.col("n_ab") / F.col("n_baskets"), round_to).alias(
                "support"
            ),
            F.round(F.col("n_ab") / F.col("n_a"), round_to).alias(
                "confidence_a_b"
            ),
            F.round(
                F.expr(
                    "CAST(CAST(n_ab AS DECIMAL(38,0)) * n_baskets AS DOUBLE)"
                )
                / F.expr("CAST(CAST(n_a AS DECIMAL(38,0)) * n_b AS DOUBLE)"),
                round_to,
            ).alias("lift"),
        )
    )
