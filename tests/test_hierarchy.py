import pytest
from valentinus_spark.operators import ancestor_closure, subtree_rollup

def test_closure_binary_tree(spark):
    # nodes 0..6, parent = (i-1)//2 → depth 3
    edges = spark.createDataFrame([(i, (i-1)//2) for i in range(1, 7)], ["child", "parent"])
    c = {(r.node, r.anc) for r in ancestor_closure(edges, max_depth=8).collect()}
    assert (3, 1) in c and (3, 0) in c and (6, 0) in c
    assert (1, 0) in c and len(c) == 6 + 4  # 6 direct + 4 grandparent pairs

def test_subtree_rollup_hand(spark):
    edges = spark.createDataFrame([(i, (i-1)//2) for i in range(1, 7)], ["child", "parent"])
    vals = spark.createDataFrame([(i, float(i)) for i in range(7)], ["node", "value"])
    out = {r.node: r for r in subtree_rollup(edges, vals, max_depth=8).collect()}
    # subtree of 0 = all: sum 0..6 = 21, n=7
    assert out[0].subtree_n == 7 and out[0].subtree_sum == 21.0
    # subtree of 1 = {1,3,4}: 8 ; of 2 = {2,5,6}: 13 ; leaf 5 = itself
    assert out[1].subtree_sum == 8.0 and out[2].subtree_sum == 13.0
    assert out[5].subtree_n == 1 and out[5].subtree_sum == 5.0

def test_deep_chain_log_rounds(spark):
    # 40-node chain, max_depth=64 → 6 doubling rounds must complete it
    edges = spark.createDataFrame([(i, i-1) for i in range(1, 40)], ["child", "parent"])
    vals = spark.createDataFrame([(i, 1.0) for i in range(40)], ["node", "value"])
    out = {r.node: r.subtree_n for r in subtree_rollup(edges, vals, max_depth=64).collect()}
    assert out[0] == 40 and out[39] == 1 and out[20] == 20
