"""r18-staged families (r17 staging pipeline): KMV sliding-window
retirement, per-tick SPPMI collocation-shift alarm, session-quality ×
maintained quality-rates admission gate, hybrid serving with per-store
freshness — each pinned against an independent replay before
registration."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_kmv_collapse_equals_direct_window_build(spark):
    """The bottom-k merge law, per-bucket: collapsing per-(grp, bucket)
    KMV sketches over the buckets >= 1 window must equal the KMV
    sketch built DIRECTLY over the window's rows row-for-row — and the
    retired bucket's exclusive hashes must be gone."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        kmv_collapse,
        kmv_sketch,
    )

    rows = [
        ("g", i % 3, f"key-{i % 40}") for i in range(200)
    ] + [("h", i % 3, f"k{i}") for i in range(30)]
    df = spark.createDataFrame(
        rows, "grp string, bucket long, key string"
    )
    fine = kmv_sketch(df, ["grp", "bucket"], "key", k=8, hash_fn="poly")
    win = kmv_collapse(
        fine.filter(F.col("bucket") >= 1), ["grp"], ["bucket"], k=8
    )
    direct = kmv_sketch(
        df.filter(F.col("bucket") >= 1), ["grp"], "key", k=8,
        hash_fn="poly",
    )
    got = sorted(tuple(r) for r in win.collect())
    want = sorted(tuple(r) for r in direct.collect())
    assert got == want and got

    # retirement: a bucket-0-exclusive key's hash must not survive the
    # window collapse even though it is in the full-history collapse
    full = kmv_collapse(fine, ["grp"], ["bucket"], k=10_000)
    full_hv = {
        (r["grp"], r["hv"]) for r in full.collect()
    }
    win_all = kmv_collapse(
        fine.filter(F.col("bucket") >= 1), ["grp"], ["bucket"],
        k=10_000,
    )
    win_hv = {(r["grp"], r["hv"]) for r in win_all.collect()}
    assert win_hv < full_hv  # bucket 0 had exclusive keys ("h" grp)


def test_kmv_collapse_overlapping_buckets_idempotent(spark):
    """The same key hashing into MULTIPLE buckets must collapse to one
    state row (hv is idempotent under the re-distinct) — the overlap
    case kmv_merge documents, exercised through the collapse path."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        kmv_collapse,
        kmv_sketch,
    )

    rows = [("g", b, f"key-{i}") for b in (1, 2) for i in range(10)]
    df = spark.createDataFrame(
        rows, "grp string, bucket long, key string"
    )
    fine = kmv_sketch(df, ["grp", "bucket"], "key", k=64, hash_fn="poly")
    win = kmv_collapse(fine, ["grp"], ["bucket"], k=64)
    assert win.count() == 10  # 10 distinct keys, not 20
    direct = kmv_sketch(df, ["grp"], "key", k=64, hash_fn="poly")
    assert sorted(tuple(r) for r in win.collect()) == sorted(
        tuple(r) for r in direct.collect()
    )


def _py_sppmi_drift(ref_pairs, cur_pairs):
    """Python replay of sppmi_drift_summary over {(w1,w2): sppmi}."""
    common = set(ref_pairs) & set(cur_pairs)
    n_ref, n_cur, n_common = len(ref_pairs), len(cur_pairs), len(common)
    jac = math.floor(
        n_common / (n_ref + n_cur - n_common) * 1e4 + 0.5
    ) / 1e4
    mad = (
        max(
            math.floor(abs(cur_pairs[p] - ref_pairs[p]) * 1e6 + 0.5)
            / 1e6
            for p in common
        )
        if common
        else None
    )
    return n_ref, n_cur, n_common, jac, mad


def test_sppmi_drift_summary_matches_python_replay(spark):
    """The drift row's set arithmetic, rounded Jaccard, max |Δsppmi|
    over common pairs, and the alarm gate must match an independent
    python replay — including the no-common-pairs NULL case."""
    from kamu_engine_datafusion_spark.operators.text import (
        sppmi_drift_summary,
    )

    ref = {("a", "b"): 1.25, ("b", "c"): 0.5, ("c", "d"): 2.0}
    cur = {("a", "b"): 1.0, ("c", "d"): 2.125, ("x", "y"): 3.0,
           ("y", "z"): 0.25}
    rdf = spark.createDataFrame(
        [(w1, w2, 1, s) for (w1, w2), s in ref.items()],
        "w1 string, w2 string, n_pair long, sppmi double",
    )
    cdf = spark.createDataFrame(
        [(w1, w2, 1, s) for (w1, w2), s in cur.items()],
        "w1 string, w2 string, n_pair long, sppmi double",
    )
    r = sppmi_drift_summary(rdf, cdf, 7, jaccard_alarm=0.5).collect()[0]
    n_ref, n_cur, n_common, jac, mad = _py_sppmi_drift(ref, cur)
    assert (r["tick"], r["n_ref"], r["n_cur"], r["n_common"]) == (
        7, n_ref, n_cur, n_common,
    )
    assert (r["n_new"], r["n_dropped"]) == (
        n_cur - n_common, n_ref - n_common,
    )
    assert r["overlap_jaccard"] == jac
    assert r["max_abs_delta"] == mad
    assert r["alarmed"] == (jac < 0.5) is True

    # disjoint top-k lists: jaccard 0, NULL delta, alarmed
    r2 = sppmi_drift_summary(
        rdf,
        spark.createDataFrame(
            [("p", "q", 1, 1.0)],
            "w1 string, w2 string, n_pair long, sppmi double",
        ),
        1,
    ).collect()[0]
    assert (r2["n_common"], r2["overlap_jaccard"]) == (0, 0.0)
    assert r2["max_abs_delta"] is None and r2["alarmed"]

    # identical lists: jaccard 1, delta 0, quiet
    r3 = sppmi_drift_summary(rdf, rdf, 2).collect()[0]
    assert (r3["overlap_jaccard"], r3["max_abs_delta"]) == (1.0, 0.0)
    assert not r3["alarmed"]


def test_session_rates_gate_composition(spark):
    """The composed admission rule: every output row's `admitted` must
    equal ok AND rate_pass_all >= 0.2, the user→source mapping must be
    user_id % |sources| deterministic, and the session columns must be
    exactly the xsession_quality rows (the certified chain)."""
    from kamu_engine_datafusion_spark.queries.pipeline import (
        q_xsession_quality,
        q_xsession_rates_gate,
    )

    out = q_xsession_rates_gate(spark, SF).collect()
    assert out
    srcs = sorted({r["source"] for r in out})
    for r in out:
        assert r["admitted"] == (
            r["ok"] and r["rate_pass_all"] >= 0.2
        )
        assert r["source"] == srcs[r["user_id"] % len(srcs)]
    base = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["n_errors"], r["n_types"],
            r["duration_sec"], r["error_rate"], r["ok"],
        )
        for r in q_xsession_quality(spark, SF).collect()
    }
    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["n_errors"], r["n_types"],
            r["duration_sec"], r["error_rate"], r["ok"],
        )
        for r in out
    }
    assert got == base  # one gate row per session, sessions unchanged


def test_hybrid_freshness_staleness_is_real(spark):
    """The freshness key must (a) derive postings_tick=2 / ann_tick=1 /
    store_lag=1 from the stores themselves, (b) serve its dense leg
    ONLY from tick-0/1 vectors (the staler store is really what's
    probed), and (c) share the sparse leg with the fresh
    xhybrid_maintained read (postings identical) while the ANN lists
    differ."""
    from kamu_engine_datafusion_spark.queries.pipeline import (
        q_xhybrid_freshness,
        q_xhybrid_maintained,
    )

    out = q_xhybrid_freshness(spark, SF).collect()
    assert out
    for r in out:
        assert (r["postings_tick"], r["ann_tick"], r["store_lag"]) == (
            2, 1, 1,
        )
        if r["dense_rank"] is not None:
            assert r["doc_id"] % 3 < 2  # dense hits only from ticks 0/1
    fresh = q_xhybrid_maintained(spark, SF).collect()
    dense_fresh = {
        r["doc_id"] for r in fresh if r["dense_rank"] is not None
    }
    dense_stale = {
        r["doc_id"] for r in out if r["dense_rank"] is not None
    }
    assert dense_stale != dense_fresh  # the lagging store changes lists


def test_span_dedup_increment_fold_equals_batch(spark):
    """The maintained gram-index fold: under the append (contiguous
    doc-range) order, unioned per-tick spans must equal the batch
    duplicate_spans row-for-row — including a passage whose canonical
    copy lives in an EARLIER tick (the cross-tick duplicate the index
    exists to catch), and a fresh passage repeated only WITHIN the
    later tick."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        duplicate_spans,
        span_dedup_increment,
    )

    passage = "alpha beta gamma delta epsilon zeta eta theta"
    other = "one two three four five six seven eight"
    rows = [
        (1, f"{passage} filler0 tail0 pad0 end0"),
        (2, f"{other} filler1 tail1 pad1 end1"),
        # tick 2: cross-tick dup of doc 1's passage + an intra-tick pair
        (10, f"{passage} unique2 words2 here2 now2"),
        (11, "intra intra2 intra3 intra4 intra5 intra6 intra7 intra8 x"),
        (12, "intra intra2 intra3 intra4 intra5 intra6 intra7 intra8 y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    state, out = None, None
    for lo, hi in ((0, 10), (10, 20)):
        tick = df.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        spans, state = span_dedup_increment(state, tick, min_len=8)
        out = spans if out is None else out.unionByName(spans)
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(
        tuple(r) for r in duplicate_spans(df, min_len=8).collect()
    )
    assert got == want and got
    # the cross-tick dup (doc 10) and the intra-tick dup (doc 12, not
    # 11 — lower id is canonical) are both flagged; canonicals are not
    flagged = {r[0] for r in got}
    assert 10 in flagged and 12 in flagged
    assert 1 not in flagged and 11 not in flagged

    # the state is the full distinct gram-hash set (idempotent fold:
    # re-folding the last tick changes nothing)
    n = state.count()
    _, state2 = span_dedup_increment(
        state, df.filter(F.col("doc_id") >= 10), min_len=8
    )
    assert state2.count() == n


def test_span_removal_maintained_equals_batch_removal(spark):
    """The cut twin's fold law: per-tick remove_spans over the
    maintained-index spans, unioned across append-ordered ticks, must
    equal the batch remove_duplicate_spans row-for-row — including
    the cross-tick case where a later tick's copy is cut while the
    earlier canonical survives with its text intact."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        remove_duplicate_spans,
        remove_spans,
        span_dedup_increment,
    )

    passage = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"{passage} end1 here1 now1 ok1"),
        (2, "totally different words with no repeats at all today"),
        (10, f"{passage} other2 stuff2 pad2 fin2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    state, out = None, None
    for lo, hi in ((0, 10), (10, 20)):
        tick = df.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        spans, state = span_dedup_increment(state, tick, min_len=8)
        cleaned = remove_spans(tick, spans)
        out = cleaned if out is None else out.unionByName(cleaned)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    want = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(df, min_len=8).collect()
    }
    assert got == want
    assert got[1].startswith("alpha")  # canonical copy untouched
    assert "alpha" not in got[10]  # later copy cut


def test_ks_window_drift_shift_semantics(spark):
    """Window-shift KS: identical per-bucket distributions → KS 0 for
    the shifted window; a bucket-2 distribution far from bucket 0's →
    a large KS (the retirement step visibly moved the reference)."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        ks_from_sketches,
        quantile_sketch,
        quantile_sketch_collapse,
    )

    same = [
        ("g", b, f"r{b}-{i}", v)
        for b in range(3)
        for i, v in enumerate([1, 2, 3, 4, 5] * 4)
    ]
    shifted = [
        ("h", b, f"s{b}-{i}", (1000 if b == 2 else 0) + i % 7)
        for b in range(3)
        for i in range(20)
    ]
    df = spark.createDataFrame(
        same + shifted, "grp string, bucket long, rid string, val long"
    )
    fine = quantile_sketch(df, ["grp", "bucket"], "rid", "val", k=256)
    before = quantile_sketch_collapse(
        fine.filter(F.col("bucket") < 2), ["grp"], ["bucket"], k=256
    )
    after = quantile_sketch_collapse(
        fine.filter(F.col("bucket") >= 1), ["grp"], ["bucket"], k=256
    )
    got = {
        r["grp"]: r["ks"]
        for r in ks_from_sketches(before, after, ["grp"]).collect()
    }
    assert got["g"] == 0.0  # identical buckets: no shift
    assert got["h"] >= 0.4  # half the shifted window moved to ~1000


def test_kmv_window_overlap_scopes_to_window(spark):
    """The windowed matrix must see only buckets >= 1: two sources
    identical in bucket 0 but disjoint in buckets 1/2 read as ZERO
    window overlap, while sources sharing bucket-1 content read >0."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        kmv_collapse,
        kmv_overlap_monitor,
        kmv_sketch,
    )

    rows = (
        [("a", 0, f"shared-{i}") for i in range(20)]
        + [("b", 0, f"shared-{i}") for i in range(20)]
        + [("a", 1, f"a-only-{i}") for i in range(20)]
        + [("b", 1, f"b-only-{i}") for i in range(20)]
        + [("a", 2, f"w-{i}") for i in range(10)]
        + [("c", 1, f"a-only-{i}") for i in range(20)]
    )
    df = spark.createDataFrame(
        rows, "grp string, bucket long, key string"
    )
    fine = kmv_sketch(df, ["grp", "bucket"], "key", k=64, hash_fn="poly")
    win = kmv_collapse(
        fine.filter(F.col("bucket") >= 1), ["grp"], ["bucket"], k=64
    )
    m = {
        (r["grp_a"], r["grp_b"]): r["jaccard_est"]
        for r in kmv_overlap_monitor(win, "grp", k=64).collect()
    }
    assert m[("a", "b")] == 0.0  # bucket-0 overlap retired with bucket 0
    assert m[("a", "c")] > 0.3  # in-window shared content visible
