"""Reusable Column-expression builders (JVM-side, codegen-friendly).

Everything here composes ``pyspark.sql.functions`` — no Python UDFs — so
the expressions inline into whole-stage codegen and scale with the
cluster. Pandas-UDF fallbacks for genuinely non-expressible operators
live next to their operators, not here.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1 for universal hashing (Broder's minwise-hashing
# construction). 31-bit values keep (h * a + b) within a 64-bit long under
# ANSI overflow checking.
_MERSENNE_31 = (1 << 31) - 1


def tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokens of a text column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), r"\s+")


def word_shingles(tok: Column, n: int) -> Column:
    """Array of n-word shingles (contiguous token n-grams, space-joined).

    Texts shorter than ``n`` tokens yield a single shingle of the whole
    text, so no document hashes to an empty set.
    """
    count = F.greatest(F.lit(1), F.size(tok) - (n - 1))
    return F.transform(
        F.sequence(F.lit(1), count), lambda i: F.concat_ws(" ", F.slice(tok, i, n))
    )


def minhash_signature(shingle_arr: Column, num_hashes: int, seed: int = 42) -> Column:
    """MinHash signature: array of ``num_hashes`` minima of universal
    hashes ``(a_j * h + b_j) mod M61`` over the shingle set, where
    ``h = xxhash64(shingle)`` (JVM-side).

    Scale: O(|shingles| * num_hashes) pure column math per row — no
    shuffle, no Python.
    """
    rng = random.Random(seed)
    coeffs = [
        (rng.randrange(1, _MERSENNE_31), rng.randrange(0, _MERSENNE_31))
        for _ in range(num_hashes)
    ]
    base = F.transform(shingle_arr, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE_31)))
    return F.array(
        *[
            F.array_min(
                F.transform(base, lambda h: (h * a + b) % _MERSENNE_31)
            )
            for (a, b) in coeffs
        ]
    )


def lsh_band_keys(signature: Column, num_bands: int, rows_per_band: int) -> Column:
    """Array of ``num_bands`` band-bucket keys: hash of each contiguous
    ``rows_per_band`` slice of the signature. Docs sharing any band key
    are LSH candidates."""
    return F.array(
        *[
            F.xxhash64(
                F.lit(band),
                *[
                    F.element_at(signature, band * rows_per_band + i + 1)
                    for i in range(rows_per_band)
                ],
            )
            for band in range(num_bands)
        ]
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two ``array<numeric>`` columns, computed in
    double precision with sequential (array-order) summation — identical
    results on any engine that sums left-to-right, which makes it
    oracle-checkable against DuckDB's ``list_dot_product`` formula."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))

    def dot(u: Column, v: Column) -> Column:
        return F.aggregate(
            F.zip_with(u, v, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return dot(ad, bd) / (F.sqrt(dot(ad, ad)) * F.sqrt(dot(bd, bd)))


def simhash64(token_hashes: Column) -> Column:
    """64-bit SimHash from an ``array<long>`` of per-token hashes: bit b
    of the result is 1 iff #{tokens with bit b set} > #tokens/2.

    Pure column math: per-bit popcounts via transform + filter sizes.
    """
    n = F.size(token_hashes)
    bits = [
        F.when(
            F.size(
                F.filter(
                    token_hashes,
                    lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1,
                )
            )
            * 2
            > n,
            F.lit(1).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        for b in range(64)
    ]
    out = F.lit(0).cast("long")
    for b, bit in enumerate(bits):
        out = out + F.shiftleft(bit, b)
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit SimHashes (popcount of XOR)."""
    return F.bit_count(a.bitwiseXOR(b)).cast("int")
