"""Connected components over an edge list — duplicate-CLUSTER
resolution, the step after pairwise near-dup detection.

A dedup pipeline's output is pairs (a~b, b~c); what you act on is
clusters ({a,b,c} keep one). Pairs → clusters is connected components.
Spark has no built-in CC (GraphFrames is an external package), so this
is iterative min-label propagation in pure DataFrame ops:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated until no label changes. Each iteration is one self-join on
the (symmetrized) edge list + one groupBy-min — two shuffles — and the
iteration count is the graph diameter, which for near-dup clusters is
tiny (clusters are dense cliques-ish; diameter 2-4). The driver loop
only checks a scalar convergence count per round; all data stays
distributed. ``localCheckpoint`` truncates the lineage each round so
the plan doesn't grow exponentially with iterations (at cluster scale
use ``checkpoint`` to reliable storage instead).

This is the standard "hash-to-min" formulation (cf. the large-graph
literature on MapReduce connected components), accelerated with
pointer jumping (path halving): after each neighbor-propagation step,
every vertex re-labels itself with its label's label —
``label(v) <- label(label(v))`` — so label chains collapse
geometrically and convergence takes O(log diameter) rounds instead of
O(diameter). On near-dup graphs (dense, diameter 2-4) the extra join
per round is noise; on adversarial long chains it is the difference
between 10 rounds and 1000.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dup_clusters"]


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    pointer_jumping: bool = True,
) -> DataFrame:
    """Return (id, component) for every vertex in ``edges``, where
    ``component`` is the minimum vertex id reachable from ``id``.

    Deterministic: min-labels are order-insensitive. Vertices only in
    ``edges`` appear; isolated vertices (no edges) are the caller's
    no-op case. ``pointer_jumping`` adds the path-halving step (one
    extra label-table self-join per round) that bounds rounds by
    O(log diameter) — disable only for known-low-diameter graphs
    where the extra small join costs more than it saves.
    """
    edges = edges.persist()  # scanned twice below (forward + reversed)
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    # self-loops make every vertex its own neighbor, so label(v) is
    # always in the min and pure relabeling needs no outer join
    verts = sym.select(F.col("u").alias("u")).distinct()
    sym = sym.unionByName(
        verts.select("u", F.col("u").alias("v"))
    ).persist()

    # labels carries renamed columns (lu, label) so every join below has
    # distinct attribute ids — avoids Spark's ambiguous-self-join trap
    labels = verts.select(
        F.col("u").alias("lu"), F.col("u").alias("label")
    ).localCheckpoint()
    for _ in range(max_iter):
        new_labels = (
            sym.join(labels, F.col("v") == F.col("lu"), "inner")
            .groupBy("u")
            .agg(F.min("label").alias("label"))
            .select(F.col("u").alias("lu"), "label")
        )
        if pointer_jumping:
            # Path halving: label <- label(label). Every label IS a
            # vertex id (it is a min over vertex ids), so the lookup
            # join always hits; min(old, hop) keeps monotonicity.
            hop = new_labels.select(
                F.col("lu").alias("ju"), F.col("label").alias("jlabel")
            )
            new_labels = (
                new_labels.join(hop, F.col("label") == F.col("ju"), "inner")
                .select(
                    "lu",
                    F.least(F.col("label"), F.col("jlabel")).alias("label"),
                )
            )
        new_labels = new_labels.localCheckpoint()
        nl = new_labels.select(
            F.col("lu").alias("nu"), F.col("label").alias("nlabel")
        )
        changed = (
            nl.join(labels, F.col("nu") == F.col("lu"))
            .filter(F.col("nlabel") != F.col("label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    edges.unpersist()  # persisted at entry; don't leak blocks in long sessions
    return labels.select(F.col("lu").alias("id"), F.col("label").alias("component"))


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Collapse verified near-dup pairs into clusters: one row per
    cluster with the canonical keep id (the min — matching
    exact_dedup's survivor rule), the member count, and the sorted
    member list (bounded: near-dup clusters are small; for pathological
    mega-clusters drop the member list and keep only counts)."""
    cc = connected_components(pairs, id_a, id_b)
    return (
        cc.groupBy("component")
        .agg(
            F.min("id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_members"),
            F.array_sort(F.collect_list("id")).alias("members"),
        )
        .select("keep_id", "n_members", "members")
    )
