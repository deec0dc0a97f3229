"""Graph utilities for dedup cluster resolution.

Near-dup pair lists (MinHash/SimHash/Jaccard/embedding LSH) become
dedup GROUPS via connected components: every document in a component
keeps one canonical representative. This is the standard last step of
large-scale fuzzy dedup (SURVEY §2.4).

Algorithm: iterative hash-min label propagation — every node adopts
the minimum label among itself and its neighbors until fixpoint.
Each iteration is one join + one aggregation (shuffle on node id);
iterations needed = graph diameter, which for near-dup graphs is tiny
(clusters are cliques-ish). Lineage is truncated per iteration with
localCheckpoint so plans don't grow exponentially — the classic
iterative-DataFrame pitfall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label each node with the minimum node id reachable from it.

    ``edges`` is undirected input (one row per pair, either order).
    Returns (node, component) where component = min node id in the
    connected component. Deterministic.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # Each node pulls the minimum label among its neighbors.
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy(F.col("u").alias("node2"))
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(
    df: DataFrame, pair_df: DataFrame, id_col: str, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Assign every row of ``df`` a dedup cluster representative:
    min id of its connected component in ``pair_df``; rows without
    near-dup edges represent themselves. Output: (id_col, cluster_rep,
    is_rep)."""
    comp = connected_components(pair_df, id_a, id_b)
    return (
        df.select(F.col(id_col))
        .join(comp, df[id_col] == comp.node, "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_rep"),
        )
        .withColumn("is_rep", (F.col(id_col) == F.col("cluster_rep")).cast("boolean"))
    )
