"""Connected components over a pair graph — the correct cluster
semantics for near-duplicate resolution (a pair list is a graph; a
dup GROUP is its connected component).

Iterative label propagation, same discipline as the hierarchy
closure: state referenced once per iteration, eager localCheckpoint
to cut lineage, bounded iterations (diameter of dup clusters is
small in practice; cap documented). No GraphX/graphframes needed —
pure DataFrame joins, which also means AQE handles the skew when one
giant cluster dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERATIONS = 15


def connected_components(
    pairs: DataFrame, i_col: str = "i", j_col: str = "j", max_iter: int = MAX_ITERATIONS
) -> DataFrame:
    """(node, component) with component = min node id reachable.

    Label propagation + pointer jumping to fixpoint: every node adopts
    the smallest label among itself and its neighbors, then each label
    is replaced by ITS label (path halving). The jump makes label
    distances collapse geometrically, so convergence is O(log diameter)
    iterations rather than O(diameter) — a diameter-1000 chain (the
    pathological dup-cluster shape) converges in ~10 rounds. Each
    iteration is two joins + one aggregation on the edge list.

    Raises ``RuntimeError`` if the fixpoint isn't reached within
    ``max_iter`` — a silently-unconverged component labeling would
    split dup clusters and is never acceptable.
    """
    edges = (
        pairs.select(F.col(i_col).alias("a"), F.col(j_col).alias("b"))
        .unionByName(pairs.select(F.col(j_col).alias("a"), F.col(i_col).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("neighbor_component"))
        )
        new_labels = labels.join(
            neighbor_min, labels.node == neighbor_min.a, "left"
        ).select(
            "node",
            F.least(
                F.col("component"),
                F.coalesce(F.col("neighbor_component"), F.col("component")),
            ).alias("component"),
        )
        # Pointer jump (path halving): component ← component's own
        # label. Labels are node ids, so this is a self-join; it is
        # what turns O(diameter) propagation into O(log diameter).
        roots = new_labels.select(
            F.col("node").alias("component"), F.col("component").alias("_root")
        )
        new_labels = (
            new_labels.join(roots, "component", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("_root"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        converged = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .isEmpty()
        )
        labels = new_labels
        if converged:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def dedup_survivors(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Cluster-correct dedup: group docs by connected component of the
    near-dup graph, keep the min id per component; singletons (no
    pairs) survive unchanged. Adds ``survivor`` boolean."""
    comps = connected_components(pairs)
    joined = docs.join(comps, docs[id_col] == comps.node, "left")
    # at the fixpoint a node's component label IS the minimum id of
    # its component, so the survivor test is a direct comparison — no
    # per-component min aggregation or second join needed
    return joined.withColumn(
        "survivor", F.col("node").isNull() | (F.col(id_col) == F.col("component"))
    ).drop("node", "component")
