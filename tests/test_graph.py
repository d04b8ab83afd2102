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


def test_cc_star_rounds_beat_diameter(spark):
    # A 120-vertex chain has diameter 120; alternating star rounds
    # must converge well within 12 rounds (O(log^2), not O(diameter)).
    n = 120
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    comp = {
        r.id: r.component
        for r in connected_components(edges, max_iter=12).collect()
    }
    assert set(comp.values()) == {0} and len(comp) == n + 1


def test_cc_adversarial_id_layout_chain(spark):
    """The round-9 regression: a chain whose SHUFFLED ids point label
    pointers away from the minimum defeated the old label-propagation
    + path-halving operator (it silently returned split components on
    the geo DBSCAN graph). Star rounds contract the graph itself, so
    the id layout must not matter."""
    import random

    n = 200
    perm = list(range(n))
    random.Random(7).shuffle(perm)
    edges = spark.createDataFrame(
        [(perm[i], perm[i + 1]) for i in range(n - 1)],
        "id_a long, id_b long",
    )
    comp = {r.id: r.component for r in connected_components(edges).collect()}
    assert set(comp.values()) == {0} and len(comp) == n


def test_cc_exhausted_cap_raises_not_wrong(spark):
    """An exhausted iteration budget must RAISE — the old operator
    returned split components instead, which is how the round-9 bug
    stayed invisible for eight rounds."""
    import pytest

    n = 300
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1)


def test_cc_isolated_self_loop_vertex(spark):
    edges = spark.createDataFrame(
        [(1, 2), (7, 7)], "id_a long, id_b long"
    )
    comp = {r.id: r.component for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 7: 7}


def test_cc_conf_toggle_is_reentrant_and_restores(spark):
    """Round-11 (ADVICE r10): the constraint-propagation toggle is
    reference-counted — concurrent connected_components calls on the
    same session must leave the conf exactly as it was, never
    'restore' it to the disabled inner snapshot."""
    import threading

    from quick_and_easy_vectordb_spark.operators import graph as graph_mod

    _CP = "spark.sql.constraintPropagation.enabled"
    spark.conf.set(_CP, "true")
    errs = []

    def run(lo):
        try:
            edges = spark.createDataFrame(
                [(lo + i, lo + i + 1) for i in range(5)],
                "id_a long, id_b long",
            )
            connected_components(edges).collect()
        except Exception as e:  # pragma: no cover — surfaced below
            errs.append(e)

    ts = [threading.Thread(target=run, args=(k * 100,)) for k in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert spark.conf.get(_CP) == "true"
    assert graph_mod._CP_DEPTH == 0
