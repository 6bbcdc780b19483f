"""Connected components over near-duplicate pair lists — the final step
of a dedup pipeline: pair lists say "a ~ b"; keeping one representative
per *transitive* cluster needs connected components.

Implementation: iterative minimum-label propagation as a driver-side
loop of DataFrame joins (each iteration is fully distributed; the loop
runs until a fixpoint, bounded by max_iter = graph diameter). This is
the standard large-graph CC pattern on Spark; near-dup graphs are
forests of tiny cliques, so 3-4 iterations converge in practice.

Determinism: labels are min doc ids — no randomness anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc",
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 10,
) -> DataFrame:
    """Assign each node the minimum node id reachable through the edge
    list (undirected). Returns (id_col, component).

    nodes: one row per node id. edges: (src, dst) pairs, any direction.
    Raises RuntimeError if max_iter iterations don't reach a fixpoint
    (diameter larger than max_iter) — callers choose the bound.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .cache()
    )
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("component")
    ).cache()
    for _ in range(max_iter):
        # candidate label per node: min over own label and neighbors'
        neighbor = (
            sym.join(labels, sym["v"] == labels["node"])
            .select(F.col("u").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(F.col("node").alias(id_col), "component")
    raise RuntimeError(f"connected_components did not converge in {max_iter} iters")


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Cluster assignment for every document: docs in a near-dup pair
    share a component (min member id); untouched docs are their own
    component. Output (doc_id, component, is_representative)."""
    nodes = df.select(F.col(id_col).alias("doc")).distinct()
    comp = connected_components(nodes, pairs, "doc", src, dst)
    return comp.select(
        F.col("doc").alias(id_col),
        "component",
        (F.col("doc") == F.col("component")).alias("is_representative"),
    )
