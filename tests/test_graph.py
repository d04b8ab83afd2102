"""Connected-components / cluster-resolution tests."""

from __future__ import annotations

from quick_and_easy_vectordb_spark.operators.graph import (
    connected_components,
    dup_clusters,
)


def test_cc_chain_and_separate_cluster(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple iterations) + pair 10-11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    comp = {r.id: r.component for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cc_long_chain_converges(spark):
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    comp = {r.id: r.component for r in connected_components(edges).collect()}
    assert set(comp.values()) == {0} and len(comp) == n + 1


def test_dup_clusters_shape(spark):
    edges = spark.createDataFrame(
        [(5, 3), (3, 9), (20, 21)], "id_a long, id_b long"
    )
    rows = {r.keep_id: r for r in dup_clusters(edges).collect()}
    assert rows[3].n_members == 3 and rows[3].members == [3, 5, 9]
    assert rows[20].n_members == 2 and rows[20].members == [20, 21]


def test_cc_pointer_jumping_beats_diameter(spark):
    # A 120-vertex chain has diameter 120; pointer jumping must
    # converge well within 12 rounds (~log2). Without it, 12 rounds
    # of pure propagation cannot reach the far end.
    n = 120
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    comp = {
        r.id: r.component
        for r in connected_components(edges, max_iter=12).collect()
    }
    assert set(comp.values()) == {0} and len(comp) == n + 1


def test_cc_plain_propagation_is_diameter_bound(spark):
    # Sanity check of the contrast: plain propagation with the same
    # round budget must NOT finish a 120-chain — proving the pointer
    # jump is what buys the convergence above.
    n = 120
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    comp = {
        r.id: r.component
        for r in connected_components(
            edges, max_iter=12, pointer_jumping=False
        ).collect()
    }
    assert set(comp.values()) != {0}
