"""Frequent co-occurrence pair mining — the market-basket /
co-click / co-citation primitive (items co-appearing in the same
basket above a support threshold), with the classic A-PRIORI prune:
a pair can only be frequent if both items are, so the (tiny) frequent
item set broadcast-filters the baskets BEFORE any pair is formed.

Scale shape: item supports are one partial-agg groupBy (shuffle ∝
items); the frequent set broadcasts into a map-side semi-join; the
pair space is a basket-keyed SELF-join (co-partitioned shuffle on the
basket id, pairs bounded by the pruned basket width, never a global
cross product); pair counting is another partial-agg groupBy. Support
counts are DISTINCT-basket counts (an item repeated inside one basket
counts once — input dedup, not pair-level dedup, so the dedup shuffle
is ∝ (basket, item) rows, never pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_items(
    df: DataFrame, basket_col: str, item_col: str, min_support: int
) -> DataFrame:
    """(item, support) with support = distinct baskets ≥ min_support."""
    return (
        df.groupBy(F.col(item_col).alias("item"))
        .agg(F.count_distinct(F.col(basket_col)).alias("support"))
        .filter(F.col("support") >= int(min_support))
    )


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_item_support: int,
    min_pair_support: int,
) -> tuple[DataFrame, DataFrame]:
    """(pairs, frequent) — pairs = (a_item, b_item, support) for every
    a < b co-appearing in ≥ min_pair_support distinct baskets, both
    items individually frequent; frequent = the a-priori item table
    the pairs were pruned with (report it: silent pruning reads as
    'mined everything')."""
    freq = frequent_items(df, basket_col, item_col, min_item_support)
    pruned = (
        df.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .join(F.broadcast(freq.select("item")), "item", "left_semi")
        .distinct()
    )
    a = pruned.select("basket", F.col("item").alias("a_item"))
    b = pruned.select("basket", F.col("item").alias("b_item"))
    pairs = (
        a.join(b, "basket")
        .filter(F.col("a_item") < F.col("b_item"))
        .groupBy("a_item", "b_item")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= int(min_pair_support))
    )
    return pairs, freq
