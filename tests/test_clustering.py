"""Connected-components clustering over near-dup edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from kamu_engine_datafusion_spark.operators import dedup as D
from kamu_engine_datafusion_spark.operators.clustering import (
    connected_components,
    dedup_by_components,
)


def test_components_resolve_chains(spark):
    # components: {1,2,3,4} via chain, {10,11}, {20} isolated not in edges
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    got = {
        r["node"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_components_cross_chain_merge(spark):
    # two chains that merge late: {1-2, 3-4, 2-3} -> all one component
    pairs = spark.createDataFrame([(3, 4), (1, 2), (2, 3)], ["id_a", "id_b"])
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert set(got.values()) == {1}


def test_dedup_by_components_end_to_end(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox leaps over the lazy dog"),
        (9, "entirely unrelated text about query engines"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = D.ngram_jaccard_pairs(
        docs.withColumn("src", F.lit("a")), block_cols="src", threshold=0.6
    ).select("id_a", "id_b")
    out = dedup_by_components(docs, pairs)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 9]  # 2 and 3 fold into 1's component; 9 untouched


def test_non_convergence_warns_and_strict_raises(spark):
    """A chain longer than max_iterations must not silently return split
    components."""
    import pytest

    n = 8  # path graph 0-1-2-...-8: diameter 8 > max_iterations=2
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    with pytest.warns(RuntimeWarning, match="did not converge"):
        connected_components(edges, max_iterations=2)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=2, strict=True)
    # and with enough rounds it converges to a single component, no warning
    comps = connected_components(edges, max_iterations=12)
    assert {r["component"] for r in comps.collect()} == {0}
