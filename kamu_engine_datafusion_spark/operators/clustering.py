"""Connected-component clustering of near-duplicate pairs.

Pairwise dedup (MinHash/SimHash/Jaccard) emits edges; to keep exactly
one survivor per duplicate GROUP you need the transitive closure —
connected components. Implemented as alternating **large-star /
small-star** (Kiveris et al., "Connected Components in MapReduce and
Beyond"), expressed as DataFrame joins:

- edges are kept oriented larger→smaller endpoint;
- **large-star**: every node connects its strictly-larger neighbors to
  its minimum neighborhood member (including itself);
- **small-star**: every node connects its (all smaller) neighbors and
  itself to the minimum;
- the fixpoint is a star forest rooted at each component's minimum id.

Unlike plain min-label propagation (rounds ∝ graph diameter — a 500-doc
duplicate chain needs 500 rounds), star contraction halves path lengths
every alternation and converges in O(log² n) rounds — single-digit in
practice even for adversarial chains.

Scale notes: each half-round is one groupBy(min) + one equi-join on
node id — uniform hash shuffles, no skew beyond what the graph itself
carries (a mega-component's root key concentrates at the END, when the
component is already a 2-level star and rows are (node, root) pairs —
bounded by component size, same as the output itself). Lineage is cut
every round (``localCheckpoint``) so the plan doesn't grow
exponentially across iterations — THE classic iterative-Spark trap.
Convergence is detected with an order-insensitive edge-set summary
(count + hash sum), one tiny aggregate per round.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _oriented(df: DataFrame) -> DataFrame:
    """Orient each edge larger→smaller and drop self-loops/duplicates."""
    return (
        df.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
    )


def _edge_summary(edges: DataFrame) -> tuple[int, int]:
    """Order-insensitive fingerprint of the edge set: (count, hash sum).
    Equal summaries across a round ⇒ the set is unchanged (fixpoint)."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal accumulator: a long sum of 64-bit hashes overflows
        # (ANSI mode would throw)
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 20,
    strict: bool = False,
) -> DataFrame:
    """Resolve ``(id_a, id_b)`` edges into components.

    Returns ``(node, component)`` where ``component`` is the minimum
    node id reachable from ``node`` (nodes appearing in no pair are not
    emitted — they are their own singleton components by definition).

    ``max_iterations`` bounds large+small-star alternations; with
    O(log² n) convergence the default of 20 covers any realistic graph
    (2^20 ≈ 10⁶ path length just for the *log* factor). On
    non-convergence the result would split components, so it raises
    when ``strict``, else emits a ``RuntimeWarning``.
    """
    edges = _oriented(
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    ).localCheckpoint(eager=True)
    summary = _edge_summary(edges)

    converged = False
    for _ in range(max_iterations):
        # -- large-star ------------------------------------------------
        # both directions: every node sees its full neighborhood
        nbrs = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m_large = nbrs.groupBy("u").agg(F.min("v").alias("mn")).select(
            "u", F.least("mn", F.col("u")).alias("m")
        )
        # connect strictly-larger neighbors to the min; output is again
        # oriented larger→smaller since v > u >= m
        large = (
            nbrs.join(m_large, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # -- small-star ------------------------------------------------
        # input is oriented u > v, so Γ(u) here is all-smaller neighbors
        m_small = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            # every smaller neighbor except the min itself → min
            large.join(m_small, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            # ... and the center, too
            .unionByName(m_small.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)  # cut lineage each round
        )
        edges = small
        new_summary = _edge_summary(edges)
        if new_summary == summary:
            converged = True
            break
        summary = new_summary

    if not converged:
        msg = (
            f"connected_components did not converge in {max_iterations} "
            "large/small-star rounds; a component would be split across "
            "labels (dedup would keep extra survivors). Raise "
            "max_iterations."
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)

    # fixpoint edge set is a star forest (u → component root); roots
    # appear only on the v side and label themselves. The min-aggregate
    # (vs a plain distinct — same single shuffle) also keeps the output
    # one-label-per-node on the non-converged warning path, where a node
    # can still sit in two groups.
    return (
        edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .unionByName(
            edges.select(F.col("v").alias("node"), F.col("v").alias("component"))
        )
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


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


def canonical_by_score(
    df: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware near-dup canonicalization: keep the HIGHEST-scoring
    member of each duplicate component (ties → min id) instead of
    :func:`dedup_by_components`' arbitrary min-id survivor — the
    curation rule for web corpora where a cluster mixes a clean page
    with its boilerplate-laden mirrors and the keeper should be the
    best one, not the first one.

    Rows in no pair survive untouched. Scale: the component table is
    pair-node-cardinality (duplicates only, usually ≪ corpus); scores
    join onto it by id, the per-component argmax is one window over
    component-partitioned data, and the corpus is touched once by a
    single anti-join of the losers.
    """
    comps = connected_components(pairs)
    scored = comps.join(
        df.select(F.col(id_col).alias("node"), F.col(score_col).alias("__s")),
        "node",
    )
    w = Window.partitionBy("component").orderBy(
        F.col("__s").desc(), F.col("node")
    )
    losers = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select(F.col("node").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")
