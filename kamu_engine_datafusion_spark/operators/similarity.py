"""Similarity search over embedding columns (``array<float>``).

Two tiers, mirroring how ANN is deployed on real clusters:

- :func:`topk_bruteforce` — exact cosine top-k. The baseline; a single
  broadcast of the query + one pass over the corpus + TopK
  (TakeOrderedAndProject). At 100 TB this is the "scan" tier — it
  parallelizes perfectly and never shuffles the corpus.
- :func:`srp_lsh_topk` — signed-random-projection (SRP) LSH: k-bit
  hyperplane signatures, candidates share a bucket, exact re-rank inside
  the bucket. The "index" tier: the corpus is bucketed once (write-side
  partitioning), and a query touches only its bucket(s).

Hyperplanes are generated deterministically from a seed, driver-side,
and inlined as literal arrays — no SciPy/sklearn dependency.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kamu_engine_datafusion_spark.functions.columns import dot_product, l2_norm


def _vec_dim(df: DataFrame, vec_col: str) -> int | None:
    head = df.select(F.size(vec_col)).head()
    return head[0] if head else None


def topk_bruteforce(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k of ``query`` (a 1-row DataFrame with the same
    vector column) against ``corpus``.

    Plan shape: BroadcastNestedLoopJoin (1-row broadcast) → projected
    cosine (norms precomputed per side) → TakeOrderedAndProject. No
    shuffle of the corpus.
    """
    if dim is None:
        dim = _vec_dim(corpus, vec_col)
    q = F.broadcast(
        query.select(
            F.col(vec_col).alias("__qv"), l2_norm(F.col(vec_col), dim).alias("__qnrm")
        )
    )
    return (
        corpus.withColumn("__nrm", l2_norm(F.col(vec_col), dim))
        .crossJoin(q)
        .select(
            F.col(id_col),
            F.round(
                dot_product(F.col(vec_col), F.col("__qv"), dim)
                / (F.col("__nrm") * F.col("__qnrm")),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def srp_signature(vec_col, planes: list[list[float]]):
    """Packed SRP signature: bit i = sign(<v, plane_i>), as a long.

    Each plane dot runs through the compact higher-order ``aggregate``
    form (an unrolled literal sum was measured slower — codegen fallback).
    """
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        dot = dot_product(vec_col, F.array(*[F.lit(x) for x in plane]))
        sig = sig + F.shiftleft(
            F.when(dot >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), i
        )
    return sig


def srp_lsh_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 12,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: exact re-rank within the query's SRP
    bucket.

    Scale path: ``corpus`` bucketed by signature is a write-time
    partitioning — a query prunes to one bucket (~corpus/2^bits rows).
    Recall can be raised by probing neighboring buckets (Hamming-1
    flips); kept single-probe here for determinism.
    """
    if dim is None:
        dim = _vec_dim(corpus, vec_col)
    planes = _hyperplanes(dim, bits, seed)
    csig = corpus.withColumn("__sig", srp_signature(F.col(vec_col), planes)).withColumn(
        "__nrm", l2_norm(F.col(vec_col), dim)
    )
    qsig = F.broadcast(
        query.select(
            F.col(vec_col).alias("__qv"),
            srp_signature(F.col(vec_col), planes).alias("__qsig"),
            l2_norm(F.col(vec_col), dim).alias("__qnrm"),
        )
    )
    return (
        csig.join(qsig, csig["__sig"] == qsig["__qsig"])
        .select(
            F.col(id_col),
            F.round(
                dot_product(F.col(vec_col), F.col("__qv"), dim)
                / (F.col("__nrm") * F.col("__qnrm")),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
