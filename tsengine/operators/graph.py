"""Distributed connected components — hash-min label propagation.

The shared clustering core behind duplicate-cluster resolution
(``dedup_components``/``dedup_keep_canonical`` over MinHash-LSH pairs)
and semantic-dedup graph clustering (``knn_components``/
``semdedup_survivors`` over the mutual-kNN graph).

GraphX-style hash-min: every node starts labelled with itself; each
iteration joins labels to neighbors, takes the min, and terminates as
soon as no label changed.  The iteration count is bounded by the
component DIAMETER — tiny for near-dup/semantic clusters (a cluster of
mutual near-duplicates is close to a clique), so the driver loop runs
2-4 shuffles in practice, each one a skinny (node, label) exchange.

Lineage is truncated with an eager ``localCheckpoint`` on the edge
table and on every iteration's labels: without it each iteration's
plan embeds the previous one (labels appears on both sides of the
join) ON TOP of the producer's plan — over a large producer like the
kNN graph the composed plan string alone OOMed the driver at sf0.1
before a single task ran.  After checkpointing, every iteration's plan
is two skinny scans regardless of the producer.  On a real cluster
swap ``localCheckpoint`` (executor-local, lost on executor failure)
for a reliable ``checkpoint`` directory; the loop shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_CC_ITERS = 20


def hash_min_components(edges: DataFrame, max_iters: int = _MAX_CC_ITERS) -> DataFrame:
    """Connected components of an undirected graph.

    ``edges`` must have columns ``(node, nbr)`` with BOTH directions
    present for every undirected edge.  Returns ``(node, comp)`` for
    every node appearing in ``edges``, where ``comp`` is the minimum
    node id reachable from ``node`` (the canonical representative a
    dedup pipeline keeps).  Isolated items never enter the edge table
    and so never appear — callers anti-join survivors themselves.
    """
    # eager localCheckpoint: materializes AND truncates lineage (cache
    # alone keeps the full logical plan, which recomposes into every
    # iteration — see module docstring for the sf0.1 OOM this caused)
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select("node")
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("node").alias("nbr"), F.col("comp").alias("nbr_comp")
                ),
                "nbr",
            )
            .groupBy("node")
            .agg(F.min("nbr_comp").alias("min_nbr"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("min_nbr", "comp")).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels
