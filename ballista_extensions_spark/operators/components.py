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
    broadcast_labels: bool = True,
) -> DataFrame:
    """Assign each node the minimum node id reachable through the edge
    list (undirected). Returns (id_col, component).

    nodes: one row per node id. edges: (src, dst) pairs, any direction.
    Raises RuntimeError if max_iter iterations don't reach a fixpoint
    (diameter larger than max_iter) — callers choose the bound.

    Scale design: only nodes that appear in an edge iterate — isolated
    nodes (the overwhelming majority in a near-dup graph) are attached as
    their own component with a single narrow anti-join at the end, so the
    per-iteration shuffles are sized by 2x|edges|, not |nodes|. With
    ``broadcast_labels`` (default) the per-iteration join ships the label
    table map-side, so the cached edge list is never re-shuffled; set it
    False for graphs whose touched-node set is itself huge (then each
    iteration is a pair of shuffle joins sized by the edge list).
    """
    # symmetrize with a single explode rather than a self-union: the
    # union form evaluates the (often expensive) edge-producing subplan
    # twice before the cache materializes, the explode form once.
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        .cache()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .cache()
    )
    hint = F.broadcast if broadcast_labels else (lambda d: d)
    converged = False
    for _ in range(max_iter):
        # candidate label per node: min over neighbors' labels; the
        # convergence flag rides the same plan, so each iteration is
        # exactly ONE Spark job (the agg below) — no separate
        # changed-count or broadcast-build actions.
        nmin = (
            sym.join(hint(labels), sym["v"] == labels["node"])
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(nmin, "node", "left")
            .select(
                "node",
                F.least("component", "nmin").alias("component"),
                (F.col("nmin") < F.col("component")).alias("chg"),
            )
            .cache()
        )
        any_changed = new_labels.agg(F.max("chg")).first()[0]
        labels = new_labels.select("node", "component")
        if not any_changed:
            converged = True
            break
    if not converged:
        raise RuntimeError(f"connected_components did not converge in {max_iter} iters")
    untouched = nodes.select(F.col(id_col).alias("node")).join(
        hint(labels.select("node")), "node", "left_anti"
    )
    return labels.select(F.col("node").alias(id_col), "component").unionByName(
        untouched.select(
            F.col("node").alias(id_col), F.col("node").alias("component")
        )
    )


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
