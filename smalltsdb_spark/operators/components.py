"""Distributed connected components — the dedup-clustering step.

Near-dup pair generation (dedup.py) yields edges; collapsing them into
clusters ("keep one document per connected component") needs connected
components, which no single DataFrame op expresses.  This is the
iterative min-label-propagation algorithm with pointer jumping
(hash-to-min, Rastogi et al., "Finding Connected Components in
Map-Reduce in Logarithmic Rounds", ICDE 2013): every vertex repeatedly
takes the minimum label over {itself} ∪ neighbors, then short-circuits
through its label's own label.  Pointer jumping doubles the propagation
distance per round, so convergence is O(log d) rounds for diameter d —
for dedup graphs (near-cliques from banded candidate generation) it is
2-3 rounds in practice.

Scale shape per round: two shuffles (neighbor join on the edge key, min
groupBy on the vertex key) plus one self-join for the jump — all
equi-joins on ids, no cross products, state is one (id, label) row per
vertex.  ``localCheckpoint`` truncates lineage each round so the plan
does not grow with the iteration count (the standard iterative-algorithm
requirement on Spark).  The fixpoint (label = min id of the component)
is unique, so results are deterministic regardless of execution order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """(id, component) for every vertex appearing in ``edges``.

    ``component`` is the minimum vertex id of the connected component
    (any orderable id type).  Vertices with no edges are absent — union
    the full vertex set afterwards if singletons matter (see
    queries_ext.dedup_clusters).
    """
    und = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    # materialized once: every round re-joins the edge relation, and a
    # lazy plan would recompute pair generation per round
    und = (
        und.union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    labels = (
        und.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_rounds):
        nbr = und.join(labels, und.d == labels.id).select(
            F.col("s").alias("id"), F.col("label")
        )
        mins = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        # pointer jumping: follow label -> label(label).  y.label <=
        # y.id == x.label by construction, so the jump only improves.
        x, y = mins.alias("x"), mins.alias("y")
        jumped = x.join(y, F.col("x.label") == F.col("y.id")).select(
            F.col("x.id").alias("id"), F.col("y.label").alias("label")
        )
        new_labels = jumped.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")

    return labels.select("id", F.col("label").alias("component"))


def dedup_cluster_labels(
    df: DataFrame, id_col: str, pairs: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Every row of ``df`` labeled with its near-dup cluster.

    Returns (id, component, keep): component = min id over the cluster
    (singletons are their own component), keep marks the one canonical
    row per cluster.  The components relation is tiny relative to the
    corpus (only docs with at least one near-dup edge), so the join back
    is broadcast."""
    comp = connected_components(pairs, src, dst)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(F.broadcast(comp), "id", "left")
        .select(
            "id",
            F.coalesce("component", "id").alias("component"),
            (F.coalesce("component", "id") == F.col("id")).alias("keep"),
        )
    )
