"""Tests for skew salting and bucketed co-located joins — including the
plan-level proof that bucketing removes the join shuffle."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from kamu_engine_datafusion_spark.operators.partitioning import (
    bucketed_join,
    salted_count,
    salted_join,
    write_bucketed,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_count_matches_plain_count(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 3).alias("k")  # 3 hot keys
    )
    got = {r["k"]: r["n"] for r in salted_count(df, ["k"]).collect()}
    want = {r["k"]: r["n"] for r in
            df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want


def test_salted_join_matches_plain_join(spark):
    big = spark.range(0, 5_000).select((F.col("id") % 10).alias("k"), "id")
    small = spark.range(0, 10).select(F.col("id").alias("k"),
                                      (F.col("id") * 100).alias("v"))
    got = sorted(
        (r["id"], r["v"]) for r in salted_join(big, small, "k").collect()
    )
    want = sorted((r["id"], r["v"]) for r in big.join(small, "k").collect())
    assert got == want


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 1_000).select(F.col("id").alias("k"),
                                         (F.col("id") * 2).alias("va"))
        b = spark.range(0, 1_000).select(F.col("id").alias("k"),
                                         (F.col("id") * 3).alias("vb"))
        write_bucketed(a, "bkt_a", "k", num_buckets=8, sort_col="k")
        write_bucketed(b, "bkt_b", "k", num_buckets=8, sort_col="k")
        joined = bucketed_join(spark, "bkt_a", "bkt_b", "k")
        plan = _plan(joined)
        # co-located: sort-merge join with NO exchange on either side
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 1_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_key_skew_profile_ranks_and_shares(spark):
    from kamu_engine_datafusion_spark.operators.partitioning import (
        key_skew_profile,
    )

    rows = [("hot",)] * 70 + [("warm",)] * 20 + [("c1",), ("c2",), ("c3",)] + [
        ("c4",),
    ] * 7
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_profile(df, ["k"], top_n=3).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert out[0]["key"] == "hot" and out[0]["n"] == 70
    assert abs(out[0]["share"] - 0.70) < 1e-12  # share of ALL rows (100)
    assert out[1]["key"] == "warm" and out[2]["key"] == "c4"


def test_key_skew_profile_releases_previous_cache(spark):
    from kamu_engine_datafusion_spark.operators.partitioning import (
        _DEFERRED,
        key_skew_profile,
        release_intermediates,
    )

    df = spark.createDataFrame([("a",), ("b",)], "k string")
    key_skew_profile(df, ["k"]).collect()
    assert len(_DEFERRED) == 1
    key_skew_profile(df, ["k"]).collect()
    assert len(_DEFERRED) == 1  # previous one released, not accumulated
    release_intermediates()
    assert not _DEFERRED
