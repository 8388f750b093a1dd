"""Partitioning utilities for the 100 TB regime: skew-salted
aggregation/joins and bucketed co-located joins.

AQE (enabled in ``session.py``) already splits skewed shuffle/join
partitions at runtime; these helpers cover the cases AQE can't:
a single hot GROUP BY key (AQE can't split one key's hash bucket) and
repeated large-table joins on the same key (where paying one bucketed
write removes every future shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame, key_cols: list[str], salt_buckets: int = 16
) -> DataFrame:
    """Skew-proof COUNT per key: two-stage aggregation with a random salt.

    Stage 1 groups on (key, salt) — a hot key's rows spread over
    ``salt_buckets`` reducers; stage 2 merges the per-salt partials.
    The salt is only a partitioning device, so any distributive
    aggregate (count/sum/min/max) composes the same way.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    partial = (
        df.select(*key_cols, salt)
        .groupBy(*key_cols, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial_n"))
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("__partial_n").cast("long").alias("n")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-proof equi-join: salt the big side's key, replicate the small
    side once per salt value, join on (key, salt).

    For when the small side is too large to broadcast outright but a hot
    key on the big side would otherwise pin one reducer. Replication
    factor = ``salt_buckets`` on the small side only.
    """
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).alias("__salt")
    replicated_small = small.select("*", salts)
    out = salted_big.join(replicated_small, [key, "__salt"])
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by a join key.

    Two tables bucketed on the same key with the same bucket count
    sort-merge-join WITHOUT a shuffle — write-once, join-free-forever
    co-location for the keys a pipeline joins on repeatedly (verified by
    plan assertion in tests/test_partitioning.py).
    """
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two pre-bucketed tables on their bucket key (no Exchange)."""
    return spark.table(left_table).join(spark.table(right_table), key)


# Deferred-release ledger (the dedup/retrieval convention): the profile
# returned by key_skew_profile lazily reads its persisted count table,
# so it is unpersisted at the NEXT call / release_intermediates().
_DEFERRED: list[DataFrame] = []


def release_intermediates(blocking: bool = False) -> None:
    """Unpersist the previous key_skew_profile call's count table."""
    while _DEFERRED:
        df = _DEFERRED.pop()
        try:
            df.unpersist(blocking=blocking)
        except Exception:
            pass


def key_skew_profile(
    df: DataFrame, key_cols: list[str], top_n: int = 20
) -> DataFrame:
    """Shuffle-skew diagnosis: the heaviest ``top_n`` keys with their
    row share — the input to every salting/broadcast decision in this
    module ("is there a hot key, and how hot?").

    Returns ``(rank, key, n, share)`` — ``key`` is the concatenated key
    tuple (unit-separator joined), ``share`` its fraction of all rows.
    A top key holding ≫ 1/shuffle-partitions of the table is the key
    AQE cannot split in a GROUP BY: salt it (:func:`salted_count`) or
    broadcast its join side (:func:`salted_join`).

    One partial-aggregated count per key; the count table is persisted
    (and released at the next call) because the grand total — which
    must include keys outside the top-n — and the TakeOrderedAndProject
    both read it. Never a full sort.
    """
    key = F.concat_ws(chr(31), *[F.col(c).cast("string") for c in key_cols])
    release_intermediates()
    counts = (
        df.select(key.alias("__key"))
        .groupBy("__key")
        .agg(F.count(F.lit(1)).alias("__n"))
    ).persist()
    _DEFERRED.append(counts)
    total = counts.agg(F.sum("__n").alias("__total"))
    top = counts.orderBy(F.col("__n").desc(), "__key").limit(top_n)
    from pyspark.sql import Window

    # BOUNDED-WINDOW CLASS: input is the limit(top_n) frame above —
    # metadata-sized by construction, never the corpus.
    ranked = top.crossJoin(F.broadcast(total)).select(
        F.row_number()
        .over(Window.orderBy(F.col("__n").desc(), "__key"))
        .cast("long")
        .alias("rank"),
        F.col("__key").alias("key"),
        F.col("__n").cast("long").alias("n"),
        (F.col("__n") / F.col("__total")).alias("share"),
    )
    return ranked
