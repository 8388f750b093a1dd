"""Mergeable distributed sketches: HyperLogLog and Count-Min.

The reference engine surfaces approximate aggregates through DataFusion
(``approx_distinct`` / ``approx_percentile_cont`` — covered by
``b18_approx_agg``/``b18_approx_bounds``); these operators are the
fixed-size-state building blocks UNDERNEATH that surface, implemented
so their full register/counter contents are bit-reproducible across
engines:

- **HyperLogLog** (Flajolet et al. 2007): per-group cardinality from
  ``m = 2^b`` one-byte registers. The only exchange is a
  ``groupBy(group, bucket)`` max — partial ``max()`` reduces every
  partition of a 100 TB scan to ≤ m longs per group before the
  shuffle, the canonical mergeable-sketch shape (vs. the full
  distinct-key shuffle of an exact ``count(DISTINCT)``).
- **Count-Min** (Cormode & Muthukrishnan 2005): frequency
  overestimates from a ``depth × width`` counter grid. Counter
  updates partial-aggregate to ≤ depth·width cells per partition —
  heavy-hitter frequencies without shuffling the key space.

Cross-engine determinism: keys are hashed with the 31-bit polynomial
fold (:func:`~kamu_engine_datafusion_spark.functions.columns.poly_hash31`,
same device as the SQL-verifiable MinHash family), and the HLL rank
``rho`` is the trailing-zero count of the post-bucket hash bits
computed with pure integer ops (``bit_count((w & -w) - 1) + 1``), so a
DuckDB oracle replays registers and counters exactly. The HLL
estimate's float math is also deterministic: every ``2^-rho`` term is a
dyadic rational ≥ 2^-(31-b+1), so register sums are EXACT in binary
doubles regardless of Spark's aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kamu_engine_datafusion_spark.functions.columns import (
    half_up,
    minhash_coeffs,
    poly_hash31,
)

_M31 = 2_147_483_647


def _hash31(key, hash_fn: str):
    """31-bit key hash: ``poly`` = the char-fold (SQL-replayable, the
    oracle profile); ``xxhash64`` = JVM-codegen'd xxhash folded mod M31
    (the production profile at 100 TB — avalanching and ~an order of
    magnitude cheaper than the per-char fold; same policy as DSIR)."""
    if hash_fn == "poly":
        return poly_hash31(key)
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(key), F.lit(_M31))
    raise ValueError(f"unknown hash_fn: {hash_fn!r}")


def hll_alpha(m: int) -> float:
    """Bias-correction constant of the raw HLL estimator (Flajolet et
    al. 2007, Fig. 3): tabulated for small m, asymptotic above."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    key: str,
    b: int = 6,
    hash_fn: str = "poly",
) -> DataFrame:
    """Per-group HyperLogLog registers over the 31-bit hash of ``key``:
    ``(group..., bucket, r)`` with ``bucket = h mod 2^b`` and ``r`` the
    max over members of ``rho(h >> b)``.

    ``rho`` is the 1-based position of the lowest set bit of the
    remaining ``31-b`` hash bits (geometric(1/2) for a uniform hash —
    same law as the paper's leading-zero form), computed integer-only:
    ``bit_count((w & -w) - 1) + 1``, and ``31-b+1`` when ``w = 0``.

    Scale: map-side partial ``max`` bounds per-partition state at
    ``m`` longs per group; the exchange carries sketches, not keys.

    ``2 ≤ b ≤ 16``: below 2 the register rho can reach 31+ and the
    estimate's ``2^-r`` terms need >32-bit shifts (handled — the fold
    shifts a BIGINT — but the α_m table starts at m=4); above 16 the
    sketch stops being smaller than a modest exact distinct.
    """
    if not 2 <= b <= 16:
        raise ValueError(f"hll_registers: b={b} outside [2, 16]")
    m = 1 << b
    cap = 31 - b + 1
    h = _hash31(F.col(key), hash_fn)
    w = F.shiftright(h, b)
    rho = F.when(w == F.lit(0), F.lit(cap)).otherwise(
        F.bit_count(w.bitwiseAND(-w) - F.lit(1)) + F.lit(1)
    )
    return (
        df.select(
            *group_cols,
            (h % F.lit(m)).alias("bucket"),
            rho.cast("long").alias("__rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("__rho").alias("r"))
    )


def hll_estimate(
    regs: DataFrame, group_cols: list[str], b: int = 6
) -> DataFrame:
    """Fold registers to the per-group raw HLL estimate:
    ``(group..., zeros, hll_raw)`` where ``hll_raw = α_m · m² /
    Σ_j 2^(-r_j)`` (absent buckets contribute ``2^0``; ``zeros`` is
    their count — the small-range-regime indicator the caller can gate
    a linear-counting fallback on).

    Exact across engines: each ``2^-r`` is computed as
    ``1.0 / (1 << r)`` (a dyadic double), so the sum is
    order-independent and the estimate is a deterministic function of
    the register multiset.
    """
    if not 2 <= b <= 16:
        raise ValueError(f"hll_estimate: b={b} outside [2, 16]")
    m = 1 << b
    alpha = hll_alpha(m)
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("__nz"),
        # shiftleft with a COLUMN bit count only exists in SQL form
        # (the python wrapper requires a literal int); the shifted 1 is
        # BIGINT — an INT base overflows at r = 31 (reachable at b ≤ 1,
        # and DuckDB's 1 << r is 64-bit, so the engines would diverge)
        F.sum(
            F.lit(1.0)
            / F.expr(
                "shiftleft(cast(1 as bigint), cast(r as int))"
            ).cast("double")
        ).alias("__sp"),
    )
    zeros = (F.lit(m) - F.col("__nz")).cast("long")
    return agg.select(
        *group_cols,
        zeros.alias("zeros"),
        (
            F.lit(alpha * m * m)
            / (F.col("__sp") + zeros.cast("double"))
        ).alias("hll_raw"),
    )


def hll_distinct_report(
    df: DataFrame,
    group_cols: list[str],
    key: str,
    b: int = 6,
    sigma_mult: float = 2.0,
    hash_fn: str = "poly",
) -> DataFrame:
    """Cardinality-sketch audit: per group — exact distinct count of
    ``key``, the HLL estimate from ``2^b`` registers, zero-register
    count, relative error (half-up 6dp), and ``within_sigma`` =
    1 iff ``|est - exact| ≤ sigma_mult · (1.04/√m) · exact`` (the
    paper's standard-error bound) — the trust-the-sketch check run at
    small scale before replacing an exact ``count(DISTINCT)`` (a full
    key shuffle at 100 TB) with the register fold.
    """
    m = 1 << b
    se = sigma_mult * 1.04 / float(m) ** 0.5
    # NULL keys are dropped up front: count(DISTINCT) ignores NULLs but
    # the hash path would sketch them as a constant (inflating the
    # estimate), and an all-NULL group would divide rel_err by
    # exact_distinct = 0. With the filter such a group simply has no
    # report row — defined behavior instead of NULL/garbage.
    df = df.filter(F.col(key).isNotNull())
    est = hll_estimate(
        hll_registers(df, group_cols, key, b, hash_fn), group_cols, b
    )
    exact = df.groupBy(*group_cols).agg(
        F.count_distinct(F.col(key)).cast("long").alias("exact_distinct")
    )
    err = F.abs(F.col("hll_raw") - F.col("exact_distinct"))
    return exact.join(est, group_cols).select(
        *group_cols,
        "exact_distinct",
        "zeros",
        half_up(F.col("hll_raw"), 4).alias("hll_est"),
        half_up(err / F.col("exact_distinct"), 6).alias("rel_err"),
        F.when(err <= F.lit(se) * F.col("exact_distinct"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("within_sigma"),
    )


def _cm_buckets(key, depth: int, width: int, seed: int, hash_fn: str) -> list:
    """The ``depth`` counter columns of ``key``: universal-family
    rehashes ``((a_i·h + b_i) mod M31) mod width`` of the 31-bit hash."""
    h = _hash31(key, hash_fn)
    return [
        ((h * F.lit(a) + F.lit(c)) % F.lit(_M31) % F.lit(width)).alias(
            f"__b{i}"
        )
        for i, (a, c) in enumerate(minhash_coeffs(depth, seed))
    ]


def cm_counters(
    df: DataFrame,
    key: str,
    depth: int = 4,
    width: int = 256,
    seed: int = 7,
    hash_fn: str = "poly",
) -> DataFrame:
    """Count-Min counter grid over the occurrence stream of ``key``:
    ``(i, bucket, c)`` — one row per non-empty cell, ``c`` the number
    of occurrences hashing there under row ``i``'s hash.

    Scale: the in-row bucket array explodes to ``depth`` cells per
    occurrence, but partial counts cap per-partition state at
    ``depth·width`` longs — the exchange carries the grid, never the
    key space.
    """
    cells = df.select(
        F.posexplode(
            F.array(*_cm_buckets(F.col(key), depth, width, seed, hash_fn))
        )
    )
    return (
        cells.groupBy(F.col("pos").alias("i"), F.col("col").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def cm_lookup(
    counters: DataFrame,
    queries: DataFrame,
    key: str,
    depth: int = 4,
    width: int = 256,
    seed: int = 7,
    hash_fn: str = "poly",
) -> DataFrame:
    """Point-query the grid: per ``queries`` row, ``cm_est = min_i
    counters[i][h_i(key)]`` appended as a column. The grid is bounded
    at ``depth·width`` rows by construction → broadcast; absent cells
    count 0.
    """
    probes = queries.select(
        F.col(key),
        F.posexplode(
            F.array(*_cm_buckets(F.col(key), depth, width, seed, hash_fn))
        ),
    ).select(key, F.col("pos").alias("i"), F.col("col").alias("bucket"))
    joined = probes.join(F.broadcast(counters), ["i", "bucket"], "left")
    est = joined.groupBy(key).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("cm_est")
    )
    return queries.join(est, key)


def cm_heavy_hitter_report(
    df: DataFrame,
    key: str,
    top_k: int = 20,
    depth: int = 4,
    width: int = 256,
    seed: int = 7,
    hash_fn: str = "poly",
) -> DataFrame:
    """Heavy-hitter audit: exact top-``top_k`` of ``key`` by frequency
    (ties → key asc) with the Count-Min estimate alongside —
    ``(key, freq, cm_est, is_overestimate, rel_err)``.

    ``is_overestimate`` (``cm_est ≥ freq``) is a THEOREM of the sketch
    (counters only ever add colliding keys' counts), so the column is
    pinned to literal 1 in the oracle — any 0 is an implementation
    bug, not noise. ``rel_err`` (half-up 6dp) is the collision
    overshoot the width must be sized against.
    """
    exact = df.groupBy(key).agg(F.count(F.lit(1)).cast("long").alias("freq"))
    top = exact.orderBy(F.col("freq").desc(), key).limit(top_k)
    grid = cm_counters(df, key, depth, width, seed, hash_fn)
    looked = cm_lookup(grid, top, key, depth, width, seed, hash_fn)
    return looked.select(
        key,
        "freq",
        "cm_est",
        F.when(F.col("cm_est") >= F.col("freq"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_overestimate"),
        half_up(
            (F.col("cm_est") - F.col("freq")) / F.col("freq"), 6
        ).alias("rel_err"),
    )
