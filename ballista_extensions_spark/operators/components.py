"""Connected components over near-duplicate pair lists — the final step
of a dedup pipeline: pair lists say "a ~ b"; keeping one representative
per *transitive* cluster needs connected components.

Implementation: alternating large-star / small-star contraction
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) — the same algorithm GraphFrames uses. Each round rewires
edges toward smaller node ids; the edge set converges to a star forest
whose centers are the component minima in O(log n) rounds, versus
O(graph diameter) for plain min-label propagation. Near-dup graphs are
forests of tiny cliques (2-3 rounds), but a chain-shaped cluster at
100x scale stays cheap here where label propagation would need dozens
of sequential jobs.

Each round is pure DataFrame algebra: a per-node min (shuffle agg with
map-side combine), a join back to the edge list (AQE broadcasts the min
table while it fits), and a distinct.

Lineage is truncated per round with ``localCheckpoint``: both star
operators reference their input several times, so without truncation
the logical plan grows ~6x per round and driver-side analysis time
explodes exponentially (measured at sf0.1: rounds of 2.4s -> 3.3s ->
16s uncheckpointed vs a flat ~0.7s/round checkpointed). This is the
same reason GraphFrames' CC defaults to checkpointInterval=2.
``localCheckpoint`` stores blocks on executors (freed by the context
cleaner when the round's DataFrame is GC'd); it trades fault-tolerance
of individual rounds for zero-config truncation, the standard choice
for short iterative refinement loops.

Determinism: labels are min doc ids — no randomness anywhere.
Convergence detection compares (count, sum of xxhash64(u, v)) across
rounds; at the star-forest fixpoint both stars reproduce their input,
so two consecutive equal fingerprints terminate the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of each node to the
    minimum of its closed neighborhood. Input/output: directed edges
    (u, v) with u > v."""
    sym = e.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
                F.struct(F.col("v").alias("a"), F.col("u").alias("b")),
            )
        ).alias("p")
    ).select("p.a", "p.b")
    # m(a) = min(N(a) ∪ {a}); no broadcast hint — AQE converts the join
    # to broadcast while the per-node min table fits.
    mins = sym.groupBy("a").agg(F.min("b").alias("mb")).select(
        "a", F.least("mb", "a").alias("m")
    )
    # No distinct here: small-star's min-agg is duplicate-insensitive and
    # its own trailing distinct restores set semantics, so a large-star
    # distinct would only add a shuffle per round (output is bounded at
    # 2|E| regardless).
    return (
        sym.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Point every node of each closed smaller-neighborhood at its
    minimum. Input/output: directed edges (u, v) with u > v."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    rewired = (
        e.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    centers = mins.select(F.col("u"), F.col("m").alias("v"))
    return rewired.unionByName(centers).distinct()


#: Edge-count bound for the driver-side union-find fast path. At the
#: bound the transfer is ~16 MB of Arrow buffers (2 int64 columns), and
#: the Python-side structures — two materialized int lists plus a
#: union-find dict of up to 2M entries — cost a few hundred MB of driver
#: heap, transiently. That is the honest budget (not the raw Arrow
#: bytes) and is comfortably within any driver sized for Spark work,
#: while each distributed star round costs a fixed multi-job overhead.
#: Near-dup graphs at any corpus size are far sparser than their node
#: count; graphs past the bound take the star rounds.
DRIVER_CC_MAX_EDGES = 1_000_000


def _union_find(edge_rows) -> dict[int, int]:
    """Path-compressed union-find keeping the MINIMUM id as each root —
    the same labeling the star-forest fixpoint produces."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in edge_rows:
        ru, rv = find(u), find(v)
        if ru != rv:
            # keep the smaller id as root so labels are component minima
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    return {x: find(x) for x in parent}


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
    Raises RuntimeError if max_iter large-star/small-star rounds don't
    reach the star-forest fixpoint (O(log n) rounds suffice; the default
    bound covers graphs far beyond any dedup workload).

    Scale design: only nodes that appear in an edge participate in the
    rounds — isolated nodes (the overwhelming majority in a near-dup
    graph) are attached as their own component with a single narrow
    anti-join at the end, so per-round shuffles are sized by the edge
    list, not the node count. Every round halves-or-better the distance
    of each node to its component minimum (the paper's contraction
    argument), so round count is logarithmic, not diameter-bound.

    Small-graph fast path: when the canonical edge list is under
    ``DRIVER_CC_MAX_EDGES`` it is collected and solved with
    path-compressed union-find on the driver — identical labels (both
    algorithms label by component minimum), one job instead of
    O(log n) multi-job rounds. The distributed rounds remain the path
    for graphs past the bound; GraphFrames applies the same
    solve-small-locally fallback.
    """
    # canonical direction u > v; drop self-loops defensively.
    # localCheckpoint here truncates the (often expensive) edge-producing
    # subplan — near-dup pair generation — so the rounds never re-analyze
    # or re-execute it.
    prev = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    n_edges = prev.count()
    if n_edges <= DRIVER_CC_MAX_EDGES:
        # Arrow-batched toPandas() on the 2-column frame, not collect():
        # Row objects cost ~100+ bytes each (≈hundreds of MB at the
        # bound) where Arrow moves two int64 buffers (~16 MB) and the
        # transient Python lists stay within the documented budget.
        pdf = prev.toPandas()
        labels_map = _union_find(
            zip(pdf["u"].tolist(), pdf["v"].tolist())
        )
        spark = nodes.sparkSession
        if labels_map:
            labels = spark.createDataFrame(
                list(labels_map.items()), schema="node long, component long"
            )
        else:
            labels = spark.createDataFrame([], schema="node long, component long")
        untouched = nodes.select(F.col(id_col).alias("node")).join(
            labels.select("node"), "node", "left_anti"
        )
        return labels.select(
            F.col("node").alias(id_col), "component"
        ).unionByName(
            untouched.select(
                F.col("node").alias(id_col), F.col("node").alias("component")
            )
        )
    prev_stats = None
    converged = False
    for _ in range(max_iter):
        # Lazy localCheckpoint: the fingerprint agg below is the
        # materializing action, so each round is ONE job (an eager
        # checkpoint would run a materialization job and then a second
        # job for the agg). The fingerprint is count + order-insensitive
        # sum of a 64-bit edge hash, widened to decimal so ANSI mode
        # can't overflow; equal fingerprints on consecutive rounds =>
        # the edge set is the star-forest fixpoint.
        new_e = _small_star(_large_star(prev)).localCheckpoint(eager=False)
        cnt, hsh = new_e.agg(
            F.count(F.lit(1)),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
        ).first()
        prev = new_e
        if prev_stats == (cnt, hsh):
            converged = True
            break
        prev_stats = (cnt, hsh)
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iters"
        )
    # star forest: every non-center node has exactly one out-edge to its
    # component minimum.
    labels = prev.select(F.col("u").alias("node"), F.col("v").alias("component"))
    untouched = nodes.select(F.col(id_col).alias("node")).join(
        labels.select("node"), "node", "left_anti"
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


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """PageRank with EXACT integer arithmetic: ranks held in millionths
    (start 1_000_000/node), per-step contribution = rank DIV out-degree,
    damping applied as 150_000 + (850_000 * inflow) DIV 1_000_000 — all
    BIGINT ops, so every engine that runs the same schedule produces
    bit-identical ranks (floating-point PageRank never cross-checks
    exactly; this formulation makes an iterative graph algorithm
    oracle-verifiable). Truncation loses < 1 millionth per edge per
    step — irrelevant for ranking, decisive for testability.

    Input: directed edge list (undirect it upstream to avoid dangling
    nodes). Returns (node, pr_millionths) after ``iterations`` steps.

    Scale: each step is one join of the rank table to the edge list plus
    a map-side-combined sum — the textbook MapReduce PageRank schedule.
    The rank table is node-keyed (skew = in-degree hotspots; salt the
    sum if a node's in-degree is pathological). Lineage is truncated per
    step with localCheckpoint, same rationale as connected_components.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    nodes = e.select(F.col("u").alias("node")).distinct()
    ranks = nodes.select("node", F.lit(1_000_000).cast("long").alias("pr"))
    contrib_src = e.join(deg, "u")
    for it in range(iterations):
        inflow = (
            contrib_src.join(ranks, F.col("u") == F.col("node"))
            .select("v", F.expr("pr DIV d").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("m"))
        )
        ranks = nodes.join(inflow, F.col("node") == F.col("v"), "left").select(
            "node",
            F.expr(
                "CAST(150000 AS BIGINT) + "
                "(CAST(850000 AS BIGINT) * COALESCE(m, 0L)) DIV 1000000"
            ).alias("pr"),
        )
        # Truncate lineage only every few rounds: the per-round plan
        # growth is linear (unlike the star operators' ~6x), so short
        # runs need no checkpoint at all — fewer materialized blocks to
        # lose under storage pressure, one less failure mode.
        if (it + 1) % 4 == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.col("pr").alias("pr_millionths"))
