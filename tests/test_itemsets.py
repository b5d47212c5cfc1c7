"""cooccurrence_pairs (operators/itemsets.py): support semantics,
a-priori pruning, within-basket dedup, broadcast prune plan."""

from __future__ import annotations

from rq_spark.operators.itemsets import cooccurrence_pairs, frequent_items

ROWS = [
    # basket, item
    (1, "a"), (1, "b"), (1, "c"),
    (2, "a"), (2, "b"),
    (3, "a"), (3, "b"),
    (4, "a"), (4, "d"),
    (5, "a"), (5, "a"),   # duplicate item in one basket counts once
    (6, "e"),
]


def _df(spark):
    return spark.createDataFrame(ROWS, ["basket", "item"])


def test_frequent_items_distinct_basket_support(spark):
    got = {r.item: r.support for r in
           frequent_items(_df(spark), "basket", "item", 2).collect()}
    # a: baskets {1,2,3,4,5} = 5 (dup in 5 counts once); b: 3
    assert got == {"a": 5, "b": 3}


def test_cooccurrence_pairs_apriori_and_support(spark):
    pairs, freq = cooccurrence_pairs(
        _df(spark), "basket", "item", min_item_support=2, min_pair_support=2
    )
    got = {(r.a_item, r.b_item): r.support for r in pairs.collect()}
    # (a,b) in baskets 1,2,3; (a,c)/(a,d) pruned: c,d infrequent
    assert got == {("a", "b"): 3}
    # lowering the pair threshold still can't resurrect pruned items
    pairs1, _ = cooccurrence_pairs(
        _df(spark), "basket", "item", min_item_support=2, min_pair_support=1
    )
    assert {(r.a_item, r.b_item) for r in pairs1.collect()} == {("a", "b")}


def test_cooccurrence_prune_is_broadcast(spark):
    pairs, _ = cooccurrence_pairs(
        _df(spark), "basket", "item", min_item_support=2, min_pair_support=1
    )
    plan = (
        pairs._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "BroadcastHashJoin" in plan  # the a-priori semi-join
