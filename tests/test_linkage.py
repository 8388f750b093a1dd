"""Fuzzy string matching — ``operators/linkage.py``."""

from __future__ import annotations

from pyspark.sql import functions as F

from kamu_engine_datafusion_spark.operators.linkage import (
    deletion_variants,
    fuzzy_string_pairs,
)


def _brute(rows, d):
    import difflib  # noqa: F401  (documentation only)

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    return {
        (i1, i2)
        for (i1, s1) in rows
        for (i2, s2) in rows
        if i1 < i2 and lev(s1, s2) <= d
    }


ROWS = [
    (1, "jonathan"),
    (2, "jonathon"),  # sub -> d1
    (3, "jonatan"),  # del -> d1 of 1, d2 of 2
    (4, "jjonathan"),  # ins -> d1 of 1
    (5, "smith"),
    (6, "smyth"),  # sub -> d1
    (7, "smythe"),  # d2 of 5, d1 of 6
    (8, "completely-different"),
    (9, ""),  # empty string edge
    (10, "a"),  # d1 of empty
]


def test_full_recall_matches_brute_force_d1(spark):
    df = spark.createDataFrame(ROWS, "id long, s string")
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_string_pairs(df, "s", "id", 1).collect()
    }
    assert got == _brute(ROWS, 1)


def test_full_recall_matches_brute_force_d2(spark):
    df = spark.createDataFrame(ROWS, "id long, s string")
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_string_pairs(df, "s", "id", 2).collect()
    }
    assert got == _brute(ROWS, 2)


def test_distances_are_exact(spark):
    df = spark.createDataFrame(ROWS, "id long, s string")
    out = {(r["id_a"], r["id_b"]): r["distance"]
           for r in fuzzy_string_pairs(df, "s", "id", 2).collect()}
    assert out[(1, 2)] == 1
    assert out[(5, 7)] == 2


def test_deletion_variant_counts(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    v1 = df.select(F.size(deletion_variants("s", 1)).alias("n")).head()["n"]
    # "abc" + {bc, ac, ab} = 4
    assert v1 == 4
