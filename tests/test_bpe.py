"""BPE merge training: loop/declarative parity + hand-checked semantics."""

from console_datagen_spark.catalog import register_views
from console_datagen_spark.operators.bpe import (
    bpe_merge_table,
    bpe_merges_plan,
    bpe_train,
)


def test_loop_and_declarative_agree(spark, sf_dir):
    docs = register_views(spark, sf_dir, ("documents",))["documents"]
    loop = [tuple(r) for r in bpe_merge_table(docs, rounds=3).collect()]
    plan = [
        tuple(r) for r in bpe_merges_plan(docs, rounds=3).orderBy("round").collect()
    ]
    assert loop == plan
    assert len(loop) == 3


def test_greedy_leftmost_merge_on_runs(spark):
    """'aaa' under pair (a, a) merges leftmost-first: [aa, a] — the pair
    count for the next round sees ONE boundary (aa|a), not two."""
    docs = spark.createDataFrame(
        [(1, "aaaa aaa xy")], "doc_id long, text string"
    )
    merges = bpe_train(docs, rounds=2)
    # round 1: (a, a) appears 3 + 2 = 5 times (overlapping counted at the
    # COUNT stage, per classic BPE)
    assert merges[0][1:] == ("a", "a", 5)
    # round 2 state: aaaa -> [aa, aa], aaa -> [aa, a]; pair (aa, aa) = 1,
    # (aa, a) = 1, (x, y) = 1 -> lexicographic tie-break picks (aa, a)
    assert merges[1][1:] == ("aa", "a", 1)


def test_merged_symbol_does_not_chain_within_round(spark):
    """After merging (a, b), the new 'ab' symbol must not immediately
    re-merge with a following b in the same round."""
    docs = spark.createDataFrame([(1, "abb abb abb")], "doc_id long, text string")
    merges = bpe_train(docs, rounds=1)
    assert merges[0][1:] == ("a", "b", 3)
    # next round counts confirm state is [ab, b], not [abb]
    merges2 = bpe_train(docs, rounds=2)
    assert merges2[1][1:] == ("ab", "b", 3)
