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
the plan doesn't grow with iterations. Each round runs EXACTLY ONE
job: round 1 is fused into label initialization (initial labels are
identities, so the first propagation is just min(id, min(neighbor))
in the init aggregation), and convergence detection rides the
checkpoint job as an ``observe()`` metric — labels only ever
decrease, so an unchanged label-sum (exact DECIMAL(38,0), no
overflow at any node count) is exactly "no label changed".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
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

    # init ⊗ round 1 in one aggregation: label = min(id, min(neighbors))
    obs0 = Observation()
    labels = (
        sym.groupBy(F.col("u").alias("id"))
        .agg(F.least(F.first("u"), F.min("v")).alias("label"))
        .observe(obs0, F.sum(F.col("label").cast("decimal(38,0)")).alias("s"))
        .localCheckpoint(eager=True)
    )
    prev_sum = obs0.get["s"]

    for _ in range(max_iters - 1):
        neighbor_labels = sym.join(
            labels.withColumnRenamed("id", "v"), "v"
        ).select(F.col("u").alias("id"), "label")
        obs = Observation()
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .observe(obs, F.sum(F.col("label").cast("decimal(38,0)")).alias("s"))
            .localCheckpoint(eager=True)  # the round's ONLY job
        )
        labels = new_labels
        cur_sum = obs.get["s"]
        if cur_sum == prev_sum or cur_sum is None:
            return labels.withColumnRenamed("label", "component")
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iters} rounds; "
        "raise max_iters for graphs with very long chains"
    )


def best_of_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """One survivor per transitive dup cluster: the row maximizing
    ``score_col`` (ties → min id); rows with no similar neighbor pass
    through. The quality-aware representative policy real pipelines
    want (keep the cleanest copy, not the lowest id). Shape: CC over
    the node set + one per-cluster window — both ≪ corpus.
    """
    from pyspark.sql import Window

    cc = connected_components(pairs, src, dst).withColumnRenamed("id", id_col)
    scored = df.join(cc, id_col, "left").withColumn(
        "__comp", F.coalesce(F.col("component"), F.col(id_col))
    )
    w = Window.partitionBy("__comp").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk", "__comp", "component")
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
