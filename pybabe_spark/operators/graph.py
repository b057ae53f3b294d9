"""Connected components over a pair list — duplicate-cluster closure.

The near-dup family (MinHash/LSH, SimHash, embedding near-dup) emits
PAIRS; turning pairs into clusters is a connected-components problem
(doc A ~ B, B ~ C ⇒ {A, B, C} is one dup cluster even if A ≁ C
directly). This is the transitive-closure policy next to
``dedup_scale.near_dedup_keep``'s conservative greedy policy.

Algorithm: min-label propagation to fixpoint — every node starts
labeled with its own id; each round a node takes the minimum label
among itself and its neighbors; at convergence every node carries the
minimum id of its component (the canonical small-graph-on-big-cluster
algorithm, cf. Kiveris et al. "Connected Components in MapReduce",
SOCC'14 — the simple variant, since dup clusters are shallow).

Scale shape: state is one (node, label) row per node; each round is
one join + one hash aggregation (two shuffles) over the node set, NOT
the corpus; rounds ≈ cluster diameter (near-dup clusters are a few
hops). Lineage is cut per round with an eager ``localCheckpoint`` so
the plan doesn't grow with iterations; convergence is detected with a
count of changed labels (a cheap job over the label set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """(id, component) for every node in ``edges``; ``component`` is the
    minimum node id in the connected component.

    Raises if the graph hasn't converged after ``max_iters`` rounds
    (pathologically deep chains) rather than returning a wrong answer.
    """
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )

    for rnd in range(max_iters):
        neighbor_labels = sym.join(
            labels.withColumnRenamed("id", "v"), "v"
        ).select(F.col("u").alias("id"), "label")
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        if rnd == 0:
            # round 1 always changes labels when any edge exists — skip
            # the convergence-count job and go straight to round 2
            labels = new_labels
            continue
        changed = (
            new_labels.withColumnRenamed("label", "new")
            .join(labels, "id")
            .filter(F.col("new") != F.col("label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.withColumnRenamed("label", "component")
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iters} rounds; "
        "raise max_iters for graphs with very long chains"
    )


def dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """(id, component, cluster_size) for every document, singletons
    included (their component is their own id, size 1): the cluster
    assignment a transitive near-dedup keeps one representative from."""
    cc = connected_components(pairs, src, dst)
    assigned = docs.select(F.col(id_col).alias("id")).join(
        cc, "id", "left"
    ).select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )
    sizes = assigned.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return assigned.join(sizes, "component").select(
        "id", "component", "cluster_size"
    )
