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
    """An unconverged run must not silently return split components."""
    import pytest

    n = 500  # a 500-edge path cannot be fully contracted in one round
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    with pytest.warns(RuntimeWarning, match="did not converge"):
        connected_components(edges, max_iterations=1)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=1, strict=True)


def test_long_path_converges_in_log_rounds(spark):
    """Large/small-star contracts a 500-node path (diameter 500) within
    ~log rounds — min-label propagation would need 500. max_iterations=10
    doubles as the round-count assertion: exceeding it warns, and warnings
    are errors here."""
    import warnings

    n = 500
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        comps = connected_components(edges, max_iterations=10)
        got = {r["node"]: r["component"] for r in comps.collect()}
    assert got == {i: 0 for i in range(n + 1)}


def test_star_vs_bruteforce_random_graphs(spark):
    """Property check: on random sparse graphs the star algorithm must
    match a driver-side union-find ground truth."""
    import random

    rng = random.Random(42)
    for trial in range(3):
        n, m = 60, 45
        es = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        es = [(a, b) for a, b in es if a != b]
        # union-find ground truth
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in es:
            parent[find(a)] = find(b)
        want = {}
        for a, b in es:
            for v in (a, b):
                r = find(v)
                want[v] = min(w for w in range(n) if find(w) == r)
        comps = connected_components(
            spark.createDataFrame(es, "id_a long, id_b long")
        )
        got = {r["node"]: r["component"] for r in comps.collect()}
        assert got == want, f"trial {trial}"


def test_canonical_by_score_keeps_best_member(spark):
    from kamu_engine_datafusion_spark.operators.clustering import (
        canonical_by_score,
        dedup_by_components,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (3, 50.0), (4, 7.0), (5, 3.0), (9, 1.0)],
        "doc_id long, quality double",
    )
    # components {1,2,3} and {4,5}; 9 untouched
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"] for r in canonical_by_score(df, pairs, "quality").collect()
    )
    assert kept == [2, 4, 9]  # best of each component + the loner
    # contrast: min-id survivor picks 1 and 4
    kept_min = sorted(
        r["doc_id"] for r in dedup_by_components(df, pairs).collect()
    )
    assert kept_min == [1, 4, 9]
    # tie on score -> min id wins
    df2 = spark.createDataFrame(
        [(1, 5.0), (2, 5.0)], "doc_id long, quality double"
    )
    pairs2 = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    assert [
        r["doc_id"] for r in canonical_by_score(df2, pairs2, "quality").collect()
    ] == [1]
