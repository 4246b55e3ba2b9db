"""Pairwise association-rule mining: support / confidence / lift over
basket co-occurrence — the market-basket analytics primitive (the
pairwise core of Apriori/FP-growth, which covers the overwhelming bulk of
actionable rules; higher-order itemsets explode combinatorially for
marginal value and are deliberately out of scope).

All three metrics are INTEGER arithmetic (basis points and microunits
via DIV), so a SQL oracle replays counts, metrics, and rule ranking
exactly:

    support_bp(a→b)    = c_ab · 10000 DIV N
    confidence_bp(a→b) = c_ab · 10000 DIV c_a
    lift_micro(a→b)    = c_ab · N · 1000000 DIV (c_a · c_b)

Scale shape (100 TB of baskets): pair counts come from ONE equality
self-join on the basket key (per-basket fan-out bounded by basket size —
the same contract as operators/graph.copurchase_edges) plus ONE grouped
count with map-side combine; item counts and the basket total are one
grouped count and one 1-row broadcast; the two item-count attaches are
plain equality joins with no amplification. Rule ranking is
TakeOrderedAndProject. No Python, no window, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    top_k: int = 20,
) -> DataFrame:
    """(antecedent, consequent, c_ab, c_a, c_b, support_bp, confidence_bp,
    lift_micro): the top_k directed pair rules by lift (ties broken by
    antecedent, consequent). Both directions of every qualifying pair are
    emitted and ranked — confidence is direction-dependent even though
    support and lift are symmetric."""
    # four consumers (basket total, item counts, both self-join sides) —
    # lazily checkpoint so the distinct basket-item frame materializes once
    li = (
        baskets.select(F.col(basket_col).alias("o"), F.col(item_col).alias("p"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_baskets = li.select("o").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    item_counts = li.groupBy(F.col("p")).agg(F.count(F.lit(1)).alias("c"))
    a, b = li.alias("a"), li.alias("b")
    pair_counts = (
        a.join(b, "o")
        .filter(F.col("a.p") < F.col("b.p"))
        .groupBy(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_pair_count)
    )
    directed = pair_counts.select("u", "v", "c_ab").unionByName(
        pair_counts.select(
            F.col("v").alias("u"), F.col("u").alias("v"), "c_ab"
        )
    )
    joined = (
        directed.join(
            item_counts.select(F.col("p").alias("u"), F.col("c").alias("c_a")),
            "u",
        )
        .join(
            item_counts.select(F.col("p").alias("v"), F.col("c").alias("c_b")),
            "v",
        )
        .crossJoin(F.broadcast(n_baskets))
    )
    return (
        joined.select(
            F.col("u").alias("antecedent"),
            F.col("v").alias("consequent"),
            F.col("c_ab").cast("long").alias("c_ab"),
            F.col("c_a").cast("long").alias("c_a"),
            F.col("c_b").cast("long").alias("c_b"),
            F.expr("CAST(c_ab * 10000 DIV n AS BIGINT)").alias("support_bp"),
            F.expr("CAST(c_ab * 10000 DIV c_a AS BIGINT)").alias(
                "confidence_bp"
            ),
            F.expr(
                "CAST(c_ab * n * 1000000 DIV (c_a * c_b) AS BIGINT)"
            ).alias("lift_micro"),
        )
        .orderBy(F.desc("lift_micro"), "antecedent", "consequent")
        .limit(top_k)
    )
