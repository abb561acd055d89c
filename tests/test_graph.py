"""Graph operator tests on hand-built trade graphs (the oracle sweep
covers the real tables; these pin semantics on known topologies)."""

from __future__ import annotations

from hadoop_coded_wordcount_spark.operators import graph as gr


def _trade(spark, pairs):
    """orders/lineitem frames realizing the given (custkey, suppkey)
    co-occurrence pairs, one synthetic order per pair."""
    orders = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(pairs)],
        "o_orderkey bigint, o_custkey bigint",
    )
    lineitem = spark.createDataFrame(
        [(i, s) for i, (_, s) in enumerate(pairs)],
        "l_orderkey bigint, l_suppkey bigint",
    )
    return orders, lineitem


def test_bfs_depths_hand_graph(spark):
    # customers 1,2,3; suppliers 10,20:  1-10, 2-10, 2-20, 3-20
    # from customer 1: s10 at 1, c2 at 2, s20 at 3, c3 at 4
    orders, lineitem = _trade(spark, [(1, 10), (2, 10), (2, 20), (3, 20)])
    got = {
        (r.node_type, r.entity_key): r.dist
        for r in gr.bfs_depths(orders, lineitem, seed_custkey=1).collect()
    }
    assert got == {
        ("customer", 1): 0,
        ("supplier", 10): 1,
        ("customer", 2): 2,
        ("supplier", 20): 3,
        ("customer", 3): 4,
    }


def test_bfs_depths_early_stop_and_unreachable(spark):
    # two disconnected components; BFS from customer 1 must stop after
    # exhausting its component and never emit the other
    orders, lineitem = _trade(spark, [(1, 10), (5, 50)])
    got = {
        (r.node_type, r.entity_key): r.dist
        for r in gr.bfs_depths(
            orders, lineitem, seed_custkey=1, max_hops=10
        ).collect()
    }
    assert got == {("customer", 1): 0, ("supplier", 10): 1}


def test_bfs_depths_hop_cap(spark):
    orders, lineitem = _trade(spark, [(1, 10), (2, 10), (2, 20), (3, 20)])
    got = {
        (r.node_type, r.entity_key): r.dist
        for r in gr.bfs_depths(
            orders, lineitem, seed_custkey=1, max_hops=2
        ).collect()
    }
    assert max(got.values()) == 2 and ("supplier", 20) not in got


def test_degree_distribution_hand_graph(spark):
    # c1-{s10}, c2-{s10,s20}, c3-{s20}: degrees c:{1:2, 2:1}, s:{2:2}
    orders, lineitem = _trade(spark, [(1, 10), (2, 10), (2, 20), (3, 20)])
    got = {
        (r.node_type, r.degree): r.n_nodes
        for r in gr.degree_distribution(orders, lineitem).collect()
    }
    assert got == {
        ("customer", 1): 2,
        ("customer", 2): 1,
        ("supplier", 2): 2,
    }
