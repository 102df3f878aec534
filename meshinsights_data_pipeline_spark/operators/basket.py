"""Market-basket association mining: pairwise support / confidence /
lift over (basket, item) rows — the classic co-occurrence analytics
primitive (Agrawal et al. 1993's frequent-itemset measures, restricted
to pairs, which is the overwhelmingly common production use: "items
bought together", co-cited documents, co-queried terms). Sibling of the
graph view of the same co-occurrence data (operators.graph
triangle_counts / pagerank): the graph ops score STRUCTURE, this scores
STATISTICAL ASSOCIATION.

Scale design (r17 optimization round, guide §2.4): ONE basket-keyed
shuffle groups each basket into its sorted distinct item array
(collect_set dedupes inside the same aggregation the old
distinct-then-regroup chain paid a second full exchange for) and emits
every in-group (a < b) pair via two Generate nodes — the
dedup._capped_pair_counts shape, replacing the basket self-join that
shuffled the distinct frame twice and sort-merged it against itself.
Then one map-side-combinable pair count, and a broadcast-sized
item-count frame joined back twice. Pair cost is still
sum-of-squared-basket-sizes — identical to the self-join's, and
concentrated on the same basket-keyed task either way — and the
per-basket array is O(basket size) memory, negligible for any basket
small enough that a pairwise method is feasible at all;
``max_basket_size`` is the explicit 100 TB cap for corpora that cannot
guarantee that upstream. All measures are exact integer counts plus
single IEEE divisions — bit-identical across engines. (Interleaved
sf1 A/B, warm: self-join 6.8-8.2s, distinct+regroup 6.2-7.5s, this
shape 4.5-6.3s; sf0.1 2.1-2.6 -> 1.7-1.8s.)
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
    max_basket_size: int | None = None,
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

    ``max_basket_size`` is the skew cap (same rule as the dedup df
    cap): baskets with more than that many distinct items contribute NO
    pairs — a k-item basket costs k(k-1)/2 pair rows on one basket-
    keyed task under ANY pairwise algorithm, so past a few thousand
    items a basket is boilerplate, not signal. Capped baskets still
    count in ``n_baskets`` and the item marginals, so every reported
    measure keeps its exact denominator. ``None`` (default) is exact
    over all baskets.

    Item values are deduplicated by aggregation-key equality — use
    stable integer/string item keys, not floating-point values (the
    same contract the previous ``distinct()`` pass had).
    """
    # ONE basket-keyed exchange builds each basket's sorted distinct
    # item array (collect_set's map-side partials dedupe in the same
    # aggregation the old distinct-then-regroup chain paid a second
    # full exchange for). The grouped frame feeds THREE subtrees (pair
    # generation, item marginals, basket total); left lazy, each one
    # replays the scan + shuffle (r16: zero ReusedExchange across the
    # diamond). A lazy localCheckpoint (the duplicate_spans idiom)
    # materializes it ONCE at the first action — no cache-manager
    # persist of a corpus-sized frame, and at real scale the documented
    # alternative is writing the frame to storage (same shape, same
    # single pass).
    grouped = (
        df.select(F.col(basket_col).alias("b"), F.col(item_col).alias("i"))
        .groupBy("b")
        .agg(F.sort_array(F.collect_set("i")).alias("_items"))
        .localCheckpoint(eager=False)
    )
    # Null basket ids never matched the old self-join's equi-key, so
    # they contribute no pairs here either (their items still count in
    # the marginals, exactly as the old distinct frame's did).
    pair_src = grouped.filter(
        F.col("b").isNotNull() & (F.size("_items") >= 2)
    )
    if max_basket_size is not None:
        pair_src = pair_src.filter(
            F.size("_items") <= int(max_basket_size)
        )
    # In-group pair generation (guide §2.4): every (a < b) pair via the
    # (i, item_a) posexplode and an explode of the array's strict tail —
    # row-for-row what the old self-join produced (items are distinct
    # within a basket, so the sorted tail is strictly greater). The
    # self-join shuffled the distinct frame TWICE and sort-merged it
    # against itself; this is one basket-keyed exchange and no join.
    pairs = pair_src.select(
        F.posexplode("_items").alias("_i", "item_a"), F.col("_items")
    ).select(
        "item_a",
        F.explode(
            F.slice(F.col("_items"), F.col("_i") + 2, F.size("_items"))
        ).alias("item_b"),
    )
    pair_counts = (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= int(min_support_count))
    )
    item_counts = (
        grouped.select(F.explode("_items").alias("i"))
        .groupBy("i")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_i"))
    )
    # count("b"), not count(*): the old countDistinct("b") excluded a
    # null basket id, and grouped has exactly one row per distinct b.
    totals = grouped.agg(
        F.count("b").cast("bigint").alias("n_baskets")
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
