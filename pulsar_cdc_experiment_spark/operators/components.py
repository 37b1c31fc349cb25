"""Connected components — near-dup pairs → dedup clusters.

The end-use of near-dup detection is survivorship: group transitively-
connected documents into clusters and keep one representative. This is
connected components over the pair graph, implemented as iterative
min-label propagation with DataFrame joins (the standard Spark shape when
a graph library isn't available):

    comp(v) ← min(comp(v), min over neighbors u of comp(u)), iterate to fixpoint.

Each iteration is one join + one aggregate (two shuffles); iteration count
is the graph diameter, and near-dup graphs are shallow (clusters are
cliques or near-cliques from LSH banding), so 3-6 iterations suffice in
practice. The result is deterministic — comp(v) = min doc id in v's
component — which is what lets a DuckDB recursive CTE serve as the oracle.

At 100 TB: checkpoint the label table every few iterations (lineage
truncation), and use the large-star/small-star optimization if diameters
grow; for LSH-derived graphs they don't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) where component = min node id in the component.

    ``nodes``: one row per vertex. ``edges``: undirected pairs; isolated
    vertices keep their own id as component.
    """
    # symmetrize once; propagation then only needs one direction per row.
    # Persist: the loop consumes the edge table every iteration, and the
    # upstream pair-generation (shingling + join) must not re-run per
    # iteration (measured 5x wall on the dedup_clusters query).
    e = edges.select(
        F.col(src_col).alias("__u"), F.col(dst_col).alias("__v")
    ).unionAll(
        edges.select(F.col(dst_col).alias("__u"), F.col(src_col).alias("__v"))
    ).distinct().persist()

    labels = nodes.select(F.col(id_col).alias("__id"), F.col(id_col).alias("component"))

    for i in range(max_iter):
        neighbor_min = (
            e.join(labels, e.__v == labels.__id)
            .groupBy("__u")
            .agg(F.min("component").alias("__nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.__id == neighbor_min.__u, "left")
            .select(
                "__id",
                F.least(
                    F.col("component"), F.coalesce("__nmin", F.col("component"))
                ).alias("component"),
            )
            .persist()  # consumed twice: change-check now, join next iteration
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.__id") == F.col("o.__id"))
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
        if i % 4 == 3:
            # truncate lineage on long chains
            labels = labels.localCheckpoint(eager=True)

    return labels.select(F.col("__id").alias(id_col), "component")


def dedup_survivors(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Keep one representative (min id) per near-dup cluster.

    Returns (id, component, is_survivor). Rows not in any pair survive
    trivially as their own component.
    """
    nodes = df.select(F.col(id_col))
    comp = connected_components(nodes, pairs, id_col, "id_a", "id_b")
    return comp.withColumn("is_survivor", F.col(id_col) == F.col("component"))
