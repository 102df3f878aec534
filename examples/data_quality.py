"""Feed data-quality gate end-to-end: declarative row rules ->
distribution-level signatures -> corpus-mix health — the three-layer
quality report an ingest pipeline runs before promoting a batch.

1. dq_checks: named row-level rules over the lineitem feed in ONE
   aggregation pass (violation RATES, not fail-on-first-row).
2. benford_deviation: first-digit conformance of prices per return
   flag — the fabricated-/truncated-feed signature check.
3. ks_drift: exact two-sample KS of each event type's value
   distribution vs the corpus — did a segment's whole distribution
   move?
4. source_token_entropy: per-source token entropy + Gini — a source
   whose entropy collapses has gone template-heavy.
5. chi2_independence: is order status independent of priority? —
   joint-structure forensics the one-distribution monitors can't see
   (sharding leaks, correlated missingness).
6. source_js_divergence: symmetric bounded mix distance of each
   source from the corpus token distribution — the pretraining-mix
   drift score.

Run: python examples/data_quality.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.dq import (
    benford_deviation,
    dq_checks,
)
from meshinsights_data_pipeline_spark.operators.stats import ks_drift
from meshinsights_data_pipeline_spark.operators.corpus import (
    source_token_entropy,
)
from meshinsights_data_pipeline_spark.session import get_spark, read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("data-quality-example")

    li = read_table(spark, sf_dir, "lineitem")
    print("-- row-level rules (one pass, violation rates) --")
    dq_checks(
        li,
        {
            "qty_positive": F.col("l_quantity") > 0,
            "price_positive": F.col("l_extendedprice") > 0,
            "discount_in_range": F.col("l_discount").between(0.0, 0.1),
            "tax_in_range": F.col("l_tax").between(0.0, 0.08),
            "flag_known": F.col("l_returnflag").isin("A", "N", "R"),
        },
    ).orderBy(F.desc("violation_frac")).show()

    print("-- Benford first-digit conformance of prices per flag --")
    benford_deviation(li, "l_returnflag", "l_extendedprice").orderBy(
        F.desc("chi2")
    ).show()

    ev = read_table(spark, sf_dir, "events")
    print("-- KS of each event type's values vs the corpus --")
    ks_drift(ev, "event_type", "value").orderBy(F.desc("ks")).show()

    docs = read_table(spark, sf_dir, "documents")
    print("-- per-source token entropy / Gini concentration --")
    source_token_entropy(docs, "source", "text").orderBy("source").show()

    # where inter-source duplication lives: head-fingerprint matrix
    # (recrawl detection — trailing chrome differs, heads collide)
    from meshinsights_data_pipeline_spark.operators.corpus import (
        source_duplicate_matrix,
    )

    print("-- cross-source duplicate matrix (8-token head fingerprints) --")
    source_duplicate_matrix(docs, "source", "text", prefix_tokens=8).orderBy(
        F.desc("dup_frac_a")
    ).show(5)

    # make per-source length scores comparable before mixing: map each
    # source's lengths onto the corpus quantiles
    from meshinsights_data_pipeline_spark.operators.stats import (
        quantile_normalize,
    )

    print("-- quantile-normalized doc lengths (first rows) --")
    quantile_normalize(docs, "source", "n_chars", "doc_id").orderBy(
        "source", "doc_id"
    ).show(5)

    # joint-structure forensics: is status independent of priority?
    from meshinsights_data_pipeline_spark.operators.dq import (
        chi2_independence,
    )

    print("-- chi-square independence: order status vs priority --")
    chi2_independence(
        read_table(spark, sf_dir, "orders"),
        "o_orderstatus", "o_orderpriority",
    ).show()

    # symmetric bounded mix distance: which source diverges from the
    # corpus it feeds?
    from meshinsights_data_pipeline_spark.operators.corpus import (
        source_js_divergence,
    )

    print("-- Jensen-Shannon divergence of each source vs the corpus --")
    source_js_divergence(docs, "source", "text").orderBy(
        F.desc("js_norm")
    ).show()

    # monotone association: does a doc's quality score just track its
    # length? (a |rho| near 1 means the scorer adds nothing beyond
    # length — drop it from the mix weighting)
    from meshinsights_data_pipeline_spark.operators.stats import (
        spearman_correlation,
    )
    from meshinsights_data_pipeline_spark.operators.text import (
        quality_score,
    )

    print("-- Spearman rho of quality score vs length, per source --")
    scored = docs.withColumn("q", quality_score(F.col("text")))
    spearman_correlation(scored, ["source"], "q", "n_chars").orderBy(
        F.desc(F.abs(F.col("rho")))
    ).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
