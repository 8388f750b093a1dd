"""Benchmark decontamination: flag training documents that share n-gram
shingles with an evaluation/benchmark set.

Standard practice before training on web-scale corpora: any document
containing a long-enough n-gram from the eval set is contaminated and
must be dropped (or have the span excised). Expressed as a
shingle-overlap join:

- benchmark → distinct shingles (a SMALL set → broadcast);
- corpus → exploded distinct shingles → broadcast semi-join → overlap
  count per document.

Scale: the corpus side is a scan + explode with a broadcast hash join —
no shuffle of the corpus; the only state is the benchmark shingle set
(millions of shingles ≈ tens of MB broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kamu_engine_datafusion_spark.functions.columns import tokens, word_shingles


def flag_contaminated(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_len: int = 3,
    threshold: int = 1,
) -> DataFrame:
    """Per-corpus-document overlap with the benchmark shingle set.

    Returns ``(id_col, n_overlaps, contaminated)`` where ``n_overlaps``
    counts distinct shared shingles and ``contaminated`` is
    ``n_overlaps >= threshold``.
    """
    bench_shingles = F.broadcast(
        benchmark.select(
            F.explode(
                F.array_distinct(word_shingles(tokens(text_col), shingle_len))
            ).alias("__sh")
        ).distinct()
    )
    corpus_shingles = corpus.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.array_distinct(word_shingles(tokens(text_col), shingle_len))
        ).alias("__sh"),
    )
    overlaps = (
        corpus_shingles.join(bench_shingles, "__sh")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_overlaps"))
    )
    return (
        corpus.select(F.col(id_col))
        .join(overlaps, corpus[id_col] == overlaps["__id"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_overlaps"), F.lit(0)).cast("long").alias(
                "n_overlaps"
            ),
            (F.coalesce(F.col("n_overlaps"), F.lit(0)) >= threshold).alias(
                "contaminated"
            ),
        )
    )


def remove_contaminated(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_len: int = 3,
    threshold: int = 1,
) -> DataFrame:
    """Drop contaminated documents from the corpus."""
    flagged = flag_contaminated(
        corpus, benchmark, text_col, id_col, shingle_len, threshold
    )
    keep = flagged.filter(~F.col("contaminated")).select(id_col)
    return corpus.join(keep, id_col, "left_semi")


def fuzzy_flag_contaminated(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_len: int = 3,
    num_hashes: int = 16,
    num_bands: int = 4,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """Fuzzy (near-duplicate) benchmark decontamination: flag corpus
    documents whose MinHash-estimated shingle Jaccard to ANY benchmark
    document clears ``threshold`` — catches paraphrased/reformatted
    eval leakage the exact n-gram overlap of :func:`flag_contaminated`
    misses.

    Pipeline: MinHash signatures on both sides (the corpus side is the
    same signature stage the LSH dedup family uses), banded LSH keys,
    and a BROADCAST equi-join on the band key (the benchmark side is
    small by definition), then the signature-agreement estimate.

    Returns ``(id_col, max_est, contaminated)`` for every corpus doc.

    Scale: the corpus never shuffles for the probe — signatures are one
    explode→groupBy (the shuffle carries num_hashes longs per doc), the
    banded benchmark broadcasts, and the estimate is in-row zip_with.
    ``base_hash="poly"`` swaps in the SQL-expressible polynomial hash,
    enabling the full cross-engine oracle.
    """
    from kamu_engine_datafusion_spark.operators.dedup import (
        _banded_sigs,
        estimated_jaccard,
        minhash_signatures,
    )

    rows_per_band = num_hashes // num_bands
    sig_c = minhash_signatures(
        corpus, text_col, id_col, shingle_len, num_hashes, base_hash=base_hash
    )
    sig_b = minhash_signatures(
        benchmark, text_col, id_col, shingle_len, num_hashes,
        base_hash=base_hash,
    )
    band_c = _banded_sigs(sig_c, num_bands, rows_per_band, base_hash)
    band_b = F.broadcast(
        _banded_sigs(sig_b, num_bands, rows_per_band, base_hash).select(
            F.col("__id").alias("__bid"),
            F.col("__sig").alias("__bsig"),
            "__band",
        )
    )
    hits = (
        band_c.join(band_b, "__band")
        .select(
            "__id",
            estimated_jaccard(
                F.col("__sig"), F.col("__bsig"), num_hashes
            ).alias("__est"),
        )
        .groupBy("__id")
        .agg(F.max("__est").alias("max_est"))
    )
    return (
        corpus.select(F.col(id_col))
        .join(hits, corpus[id_col] == hits["__id"], "left")
        .select(
            F.col(id_col),
            F.round(F.coalesce(F.col("max_est"), F.lit(0.0)), 6).alias(
                "max_est"
            ),
            (F.coalesce(F.col("max_est"), F.lit(0.0)) >= threshold).alias(
                "contaminated"
            ),
        )
    )
