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
