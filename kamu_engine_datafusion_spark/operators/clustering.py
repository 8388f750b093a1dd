"""Connected-component clustering of near-duplicate pairs.

Pairwise dedup (MinHash/SimHash/Jaccard) emits edges; to keep exactly
one survivor per duplicate GROUP you need the transitive closure —
connected components. This is the standard large-scale formulation
(alternating min-label propagation), expressed as DataFrame joins:

- state: ``(node, label)``, initialized ``label = node``;
- iterate: every node takes the min label among itself and its
  neighbors; stop when no label changed;
- converges in O(diameter) rounds; near-dup graphs have tiny diameters
  (chains of similar docs), so 3-6 rounds in practice.

Scale notes: each round is one join on ``node`` + one aggregation —
both shuffle on uniform ids. State is ``persist()``-ed and the lineage
is cut every round (``localCheckpoint``) so the plan doesn't grow
exponentially across iterations — THE classic iterative-Spark trap.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 20,
    strict: bool = False,
) -> DataFrame:
    """Resolve ``(id_a, id_b)`` edges into components.

    Returns ``(node, component)`` where ``component`` is the minimum
    node id reachable from ``node``.

    If the label propagation has not converged after ``max_iterations``
    rounds (a component chain with diameter > max_iterations), the
    result would silently split one component across several labels —
    so non-convergence raises when ``strict``, else emits a
    ``RuntimeWarning``.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .select(F.col("src").alias("node"), F.col("component"))
            .groupBy("node")
            .agg(F.min("component").alias("neighbor_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("neighbor_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()  # cut lineage: constant-size plan per round
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
            break
    else:
        msg = (
            f"connected_components did not converge in {max_iterations} "
            "iterations; a component with diameter above the cap is split "
            "across labels (dedup would keep extra survivors). Raise "
            "max_iterations."
        )
        edges.unpersist()
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
        return labels
    edges.unpersist()
    return labels


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one survivor (the min-id member) per duplicate component;
    rows not in any pair survive untouched."""
    comps = connected_components(pairs)
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
