"""Distributed connected components via iterative min-label propagation.

The missing step between near-duplicate *pairs* and a deduplicated
*corpus*: pairwise candidates (LSH / Jaccard / SimHash) form a graph whose
connected components are the duplicate clusters — dedup keeps one
representative per component. Removing "any doc that pairs with a
lower-id doc" (an anti-join on pairs) is NOT the same thing: with chain
duplicates A~B~C but A!~C it removes both B and C even though C's only
cheaper twin (B) was itself removed. Component labeling makes the cluster
structure explicit and the keep-set principled (min id per component).

Algorithm: every vertex starts labeled with its own id; each round, every
vertex takes the min of its label and its neighbors' labels; converged
when no label changes. That is O(component diameter) rounds, each round
one shuffle (an aggregate over edges) + one id-keyed join. Duplicate
clusters are near-cliques (diameter ≲ 3), so this converges in a handful
of rounds at any corpus size; for general graphs with long chains the
alternating small-star/large-star variant (Kiveris et al., "Connected
Components in MapReduce") halves the exponent, same building blocks.

Iterative-plan hygiene, which is what makes this survive a real cluster:

- each round ends in an **eager localCheckpoint**, truncating lineage —
  without it the plan doubles every round and Catalyst re-optimizes an
  exponentially growing tree (on a YARN/K8s cluster with an HA
  requirement, swap for ``checkpoint()`` against the checkpoint dir);
- the **convergence probe is an aggregate count**, the only driver-side
  data movement in the loop (no ``collect()`` of vertices ever);
- edges are canonicalized once and **reused every round** — the loop
  shuffles only (vertex, label) pairs, never the text/payload columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 30) -> DataFrame:
    """Label every vertex of the undirected graph given by ``pairs`` with
    the MIN vertex id of its connected component.

    Returns (vertex, component) for every vertex that appears in at least
    one pair; callers left-join and coalesce to give isolated rows their
    own id. Deterministic; raises if ``max_iter`` rounds don't converge
    (max_iter bounds the component diameter, not the component size).
    """
    edges = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges = (
        edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.v == labels.vertex)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels.vertex == nbr_min.u, "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", "component"),
                ).alias("component"),
                F.col("component").alias("_old"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("component") != F.col("_old")).count()
        labels = new_labels.drop("_old")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter exceeds max_iter)"
    )


def pagerank_step(edges: DataFrame, ranks: DataFrame,
                  src: str = "src", dst: str = "dst",
                  node_col: str = "node",
                  rank_col: str = "rank_micros") -> DataFrame:
    """One PageRank iteration in integer micro-units — loopable the same
    way as the k-means and BPE steps (driver loop over a deterministic
    step). Ranks are BIGINT millionths; each edge (u, v) contributes
    ``rank(u) div outdeg(u)`` and the damped update is
    ``150000 + (85 * Σcontrib) div 100`` — all integer arithmetic, so
    iterations are bit-identical on any engine and any partitioning
    (float PageRank sums are association-order-dependent; quantization
    at 1e-6 costs less error per step than double rounding does at web
    scale).

    Shape: two keyed joins + one grouped sum per iteration — the edge
    list shuffles on src (degree + rank attach) then dst (the sum);
    ranks stay one narrow row per node. Dangling nodes (no in-edges)
    receive the base rank via the left join against the node list."""
    deg = edges.groupBy(src).agg(F.count("*").alias("_deg"))
    contrib = (
        edges.join(deg, src)
        .join(ranks, F.col(src) == F.col(node_col))
        .select(F.col(dst).alias("_to"),
                F.expr(f"{rank_col} div _deg").alias("_c"))
    )
    summed = contrib.groupBy("_to").agg(F.sum("_c").alias("_s"))
    return (
        ranks.select(node_col)
        .join(summed, F.col(node_col) == F.col("_to"), "left")
        .select(
            node_col,
            (F.lit(150000)
             + F.expr("85 * coalesce(_s, 0L) div 100"))
            .cast("long").alias(rank_col),
        )
    )


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             max_iter: int = 30, tol_micros: int = 16) -> DataFrame:
    """Full PageRank: drive pagerank_step until the largest per-node
    change is ≤ ``tol_micros``. Floor division makes each step
    bit-identical on any engine, but it also means the iterates can
    settle into a ±few-micro limit cycle instead of an exact fixpoint
    (the damping contraction bounds the cycle amplitude by roughly
    1/(1−d) ≈ 7 micros), so convergence is a small integer tolerance —
    still a deterministic test, because the iterate SEQUENCE is
    deterministic. Same iterative-plan hygiene as connected_components:
    eager localCheckpoint per round truncates lineage (the plan would
    double per iteration otherwise), the convergence probe is one
    aggregate max, and the edge list is checkpointed once and reused —
    each round shuffles only (node, rank) pairs. Returns
    (node, rank_micros); raises if max_iter rounds don't converge."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    ranks = nodes.withColumn(
        "rank_micros", F.lit(1000000).cast("long")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        new_ranks = pagerank_step(e, ranks).localCheckpoint(eager=True)
        max_delta = (
            new_ranks.alias("n")
            .join(ranks.alias("o"), "node")
            .agg(F.max(F.abs(
                F.col("n.rank_micros") - F.col("o.rank_micros")
            )).alias("d"))
            .collect()[0]["d"]
        )
        ranks = new_ranks
        if max_delta is not None and max_delta <= tol_micros:
            return ranks
    raise RuntimeError(
        f"pagerank did not converge to within {tol_micros} micros "
        f"in {max_iter} rounds"
    )
