"""Benchmark decontamination: n-gram overlap flagging and removal."""

from __future__ import annotations

from kamu_engine_datafusion_spark.operators.decontaminate import (
    flag_contaminated,
    remove_contaminated,
)


def test_flag_and_remove(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the capital of france is paris obviously"),
            (2, "completely unrelated musings about spark shuffles"),
            (3, "what is the capital of france asked nobody"),
        ],
        ["doc_id", "text"],
    )
    benchmark = spark.createDataFrame(
        [(100, "question: the capital of france is which city")],
        ["doc_id", "text"],
    )
    flagged = {
        r["doc_id"]: (r["n_overlaps"], r["contaminated"])
        for r in flag_contaminated(corpus, benchmark, shingle_len=3).collect()
    }
    assert flagged[1][1] is True  # shares "the capital of" / "capital of france"
    assert flagged[3][1] is True
    assert flagged[2] == (0, False)

    kept = sorted(
        r["doc_id"] for r in remove_contaminated(corpus, benchmark).collect()
    )
    assert kept == [2]
