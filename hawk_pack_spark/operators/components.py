"""Connected components for dedup clustering — group near-duplicate
pairs into clusters and elect one representative per cluster.

The missing last stage of every near-dup pipeline: MinHash/LSH emits
PAIRS, but retention policy needs CLUSTERS (keep the lowest-id doc of
each transitively-connected group).

Algorithm: min-label propagation accelerated with pointer jumping
(the "label doubling" trick of large-star/small-star, Kiveris et al.
2014 "Connected Components in MapReduce and Beyond"): every node starts
labeled with itself; each round a node adopts the minimum label among
itself and its neighbors, then labels are rewritten through their own
label's label (component ← component's component). Plain propagation
needs O(diameter) rounds — a chain of near-dup pairs would exceed any
fixed cap; the jump step squares the reach per round, so convergence is
O(log diameter) and a 20-round cap covers graphs of diameter ~2^20.
Each round is two joins + one aggregation; lineage cut by
localCheckpoint (iterative-plan rule). Exhausting the cap without a
fixpoint raises instead of silently returning split components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 20,
) -> DataFrame:
    """(id_a, id_b) undirected pair list → (node, component) where
    component = the minimum node id in the connected group. Nodes not in
    any pair are absent (callers left-join and coalesce to self)."""
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .unionByName(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "component", F.col("node")
    ).localCheckpoint()

    converged = False
    for _ in range(max_rounds):
        # each node adopts min(own label, neighbors' labels)
        nbr_labels = (
            edges.join(labels, edges["b"] == labels["node"])
            .select(F.col("a").alias("node"), F.col("component"))
        )
        propagated = (
            labels.unionByName(nbr_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # pointer jump: component ← label(component); doubles the hop
        # distance covered per round (log-diameter convergence)
        parent = propagated.select(
            F.col("node").alias("component"), F.col("component").alias("grand")
        )
        # lazy checkpoint + changed-count: one job materializes the new
        # labels (cutting lineage) AND answers convergence, instead of a
        # checkpoint job followed by a separate isEmpty probe
        new_labels = (
            propagated.join(parent, "component", "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce("grand", "component")).alias(
                    "component"
                ),
            )
            .localCheckpoint(eager=False)
        )
        converged = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
            == 0
        )
        labels = new_labels
        if converged:
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not reach a fixpoint in {max_rounds} "
            "rounds; raise max_rounds (labels would be silently split)"
        )
    return labels


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Full retention decision: every id → its cluster representative
    (itself when unpaired) + keep flag. One row per input id."""
    comp = connected_components(pairs, id_a, id_b)
    out = (
        all_ids.select(F.col(id_col).alias("node"))
        .join(comp, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce(F.col("component"), F.col("node")).alias("rep"),
        )
        .withColumn("keep", (F.col(id_col) == F.col("rep")).cast("boolean"))
    )
    return out


def keep_best_per_cluster(
    pairs: DataFrame,
    docs: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Canonical-document selection: every doc → its near-dup cluster
    plus a ``canonical`` flag marking the HIGHEST-QUALITY member (ties
    break on lowest id; unpaired docs are their own cluster and always
    canonical). The retention policy real training pipelines want on
    top of `dedup_clusters`: instead of keeping the min-id member of a
    duplicate group, keep the best one by an explicit quality signal.

    Cost: connected components over the pair list (pairs-sized, the
    corpus never enters the iteration) + ONE window shuffle on the
    cluster key over the corpus. Scale-safe at 100 TB: cluster sizes
    are near-dup group sizes (small by construction), so the window
    partitions are tiny regardless of corpus size.
    """
    comp = connected_components(pairs, id_a, id_b)
    labeled = (
        docs.join(comp, docs[id_col] == comp["node"], "left")
        .drop("node")
        .withColumn(
            "cluster", F.coalesce(F.col("component"), F.col(id_col))
        )
        .drop("component")
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return labeled.withColumn(
        "canonical", (F.row_number().over(w) == 1).cast("boolean")
    )
