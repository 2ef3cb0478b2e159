"""Unit tests for the shared hash-min connected-components core
(tsengine/operators/graph.py) — now the single clustering loop behind
dedup_components AND knn_components, so it gets its own planted-graph
coverage independent of any fixture."""

from __future__ import annotations


def _components(spark, pairs):
    from tsengine.operators.graph import hash_min_components

    sym = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(sym, "node long, nbr long")
    return {
        r.node: r.comp for r in hash_min_components(edges).collect()
    }


def test_hash_min_two_components_and_chain(spark):
    # component {1,2,3} as a triangle, component {10..14} as a CHAIN —
    # the chain needs multiple propagation rounds (diameter 4), which
    # exercises the early-termination loop past its first iteration
    got = _components(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13), (13, 14)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10, 14: 10}


def test_hash_min_min_id_not_in_first_edge(spark):
    # the canonical label must be the global min of the component even
    # when it enters through the "far" end
    got = _components(spark, [(5, 9), (9, 2), (2, 7)])
    assert set(got.values()) == {2}
    assert set(got) == {5, 9, 2, 7}


def test_hash_min_isolated_nodes_never_appear(spark):
    got = _components(spark, [(3, 4)])
    assert got == {3: 3, 4: 3}
