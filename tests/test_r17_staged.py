"""r17-staged families (r16 staging pipeline): KS drift from quantile
sketches, shifted-PPMI at window>1, dedup-rate trajectory,
session-quality join, KMV overlap delta alarm — each pinned against an
independent python replay before registration."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _py_ks(a_vals, b_vals):
    """Two-sample KS by direct ECDF comparison (python replay)."""
    sa, sb = len(a_vals), len(b_vals)
    xs = sorted(set(a_vals) | set(b_vals))
    best, best_at = -1, None
    for x in xs:
        ca = sum(1 for v in a_vals if v <= x)
        cb = sum(1 for v in b_vals if v <= x)
        d = abs(ca * sb - cb * sa)
        if d > best:
            best, best_at = d, x
    return best / (sa * sb), best_at


def test_ks_from_sketches_equals_direct_ks_when_exhaustive(spark):
    """With k larger than either population the sketch retains EVERY
    row (thr=0), so sketch-KS must equal the exact two-sample KS —
    including the tie handling (ECDF evaluated per distinct value, not
    per row) and the smallest-value argmax tiebreak."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        ks_from_sketches,
        quantile_sketch,
    )

    a_vals = [1, 2, 2, 3, 5, 8, 8, 9, 12, 15]
    b_vals = [2, 3, 3, 4, 9, 9, 10, 14]
    fa = spark.createDataFrame(
        [("g", f"a{i}", v) for i, v in enumerate(a_vals)],
        "grp string, rid string, val long",
    )
    fb = spark.createDataFrame(
        [("g", f"b{i}", v) for i, v in enumerate(b_vals)],
        "grp string, rid string, val long",
    )
    sa = quantile_sketch(fa, ["grp"], "rid", "val", k=256)
    sb = quantile_sketch(fb, ["grp"], "rid", "val", k=256)
    assert sa.count() == len(a_vals) and sb.count() == len(b_vals)
    got = ks_from_sketches(sa, sb, ["grp"]).collect()
    assert len(got) == 1
    r = got[0]
    ks, ks_at = _py_ks(a_vals, b_vals)
    assert (r["n_a"], r["n_b"]) == (len(a_vals), len(b_vals))
    assert r["ks"] == math.floor(ks * 1e6 + 0.5) / 1e6
    assert r["ks_at"] == ks_at


def test_ks_from_sketches_group_semantics(spark):
    """Identical distributions → KS 0; disjoint supports → KS 1;
    groups present on only one side are dropped."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        ks_from_sketches,
        quantile_sketch,
    )

    fa = spark.createDataFrame(
        [("same", f"a{i}", i % 5) for i in range(20)]
        + [("disj", f"a{i}", i) for i in range(10)]
        + [("only_a", "a0", 1)],
        "grp string, rid string, val long",
    )
    fb = spark.createDataFrame(
        [("same", f"b{i}", i % 5) for i in range(20)]
        + [("disj", f"b{i}", 100 + i) for i in range(10)],
        "grp string, rid string, val long",
    )
    sa = quantile_sketch(fa, ["grp"], "rid", "val", k=256)
    sb = quantile_sketch(fb, ["grp"], "rid", "val", k=256)
    got = {
        r["grp"]: r for r in ks_from_sketches(sa, sb, ["grp"]).collect()
    }
    assert set(got) == {"same", "disj"}  # only_a dropped
    assert got["same"]["ks"] == 0.0
    assert got["disj"]["ks"] == 1.0
    assert got["disj"]["ks_at"] == 9  # last a-value: ECDF gap peaks


def test_ppmi_from_counts_matches_python_replay(spark):
    """sppmi = max(0, ln((c12/B)/((c1/N)(c2/N))) − ln k) replayed in
    python from the same window-2 skip-gram counts; min_count prunes;
    order (sppmi desc, w1, w2)."""
    from kamu_engine_datafusion_spark.operators.text import (
        pair_counts,
        ppmi_from_counts,
        term_counts,
    )

    docs = [
        "the cat sat on the mat",
        "the cat ate the fish",
        "a dog sat on a log",
        "the cat sat quietly",
    ] * 3
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    pairs = pair_counts(df, window=2)
    unis = term_counts(df)
    got = [
        (r["w1"], r["w2"], r["n_pair"], r["sppmi"])
        for r in ppmi_from_counts(
            pairs, unis, shift_k=2, min_count=3, top_k=50
        ).collect()
    ]

    # python replay
    toks = [d.split() for d in docs]
    uni: dict = {}
    pc: dict = {}
    for t in toks:
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for d in (1, 2):
            for i in range(len(t) - d):
                k = (t[i], t[i + d])
                pc[k] = pc.get(k, 0) + 1
    n = float(sum(uni.values()))
    b = float(sum(pc.values()))
    rows = []
    for (w1, w2), c12 in pc.items():
        if c12 < 3:
            continue
        pmi = math.log((c12 / b) / ((uni[w1] / n) * (uni[w2] / n)))
        sppmi = max(0.0, pmi - math.log(2.0))
        rows.append(
            (w1, w2, c12, math.floor(sppmi * 1e6 + 0.5) / 1e6)
        )
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert got == rows[:50]


def test_dedup_trajectory_matches_replay_and_is_first_arrival(spark):
    """Three ticks with planted overlaps: per-tick stats equal a
    python first-arrival replay (hash not yet indexed + lowest id in
    tick); the folded index equals the distinct content set; a
    REPLAYED tick against the post-tick state keeps nothing (the
    index is an idempotent set — only the stats log needs the
    exactly-once marker)."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        dedup_trajectory_increment,
    )

    ticks = [
        [(1, "alpha beta"), (2, "gamma delta"), (3, "ALPHA   beta")],
        [(4, "alpha beta"), (5, "epsilon"), (6, "epsilon"), (7, None)],
        [(8, "gamma delta"), (9, "zeta"), (10, None)],
    ]
    # python replay: normalized content key; None → shared sentinel
    def norm(t):
        return " ".join(t.lower().split()) if t is not None else None

    seen: set = set()
    want = []
    for ti, rows in enumerate(ticks):
        firsts: set = set()
        kept = 0
        for doc_id, text in sorted(rows):
            key = norm(text)
            if key not in seen and key not in firsts:
                firsts.add(key)
                kept += 1
        n = len(rows)
        dup = n - kept
        want.append(
            (ti, n, kept, dup, math.floor(dup / n * 1e4 + 0.5) / 1e4)
        )
        seen |= firsts

    state = None
    got = []
    for ti, rows in enumerate(ticks):
        tick = spark.createDataFrame(rows, "doc_id long, text string")
        stats, state = dedup_trajectory_increment(state, tick, ti)
        state = state.localCheckpoint(eager=True)
        got.append(tuple(stats.collect()[0]))
    assert got == want
    assert state.count() == len(seen)

    # replayed tick: everything already indexed → n_kept 0
    replay = spark.createDataFrame(ticks[2], "doc_id long, text string")
    stats, state2 = dedup_trajectory_increment(state, replay, 99)
    r = stats.collect()[0]
    assert (r["n_kept"], r["n_dup"]) == (0, len(ticks[2]))
    assert state2.count() == state.count()  # set union: idempotent


def test_session_quality_replay(spark):
    """Gap sessionizer + quality read on a planted stream: session
    splits at >gap, error rate half-up, ok gate, and a single-event
    session scores cleanly (duration 0, rate 0 or 1)."""
    from datetime import datetime

    from kamu_engine_datafusion_spark.operators.sessions import (
        session_quality,
    )

    def t(minute, sec=0):
        return datetime(2024, 1, 1, minute // 60, minute % 60, sec)

    rows = [
        # user 1, session 0: 3 events, 1 error (rate .3333, ok)
        (1, t(0), "view", 1),
        (1, t(5), "error", 2),
        (1, t(10), "click", 3),
        # user 1, session 1 (gap > 30min): 2 events, 2 errors (rate 1)
        (1, t(60), "error", 4),
        (1, t(61), "error", 5),
        # user 2: single-event session, no errors
        (2, t(0), "purchase", 6),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    got = {
        (r["user_id"], r["session_id"]): r
        for r in session_quality(ev, gap_sec=1800).collect()
    }
    s0 = got[(1, 0)]
    assert (s0["n_events"], s0["n_errors"], s0["n_types"]) == (3, 1, 3)
    assert s0["duration_sec"] == 600
    assert s0["error_rate"] == 0.3333 and bool(s0["ok"])
    s1 = got[(1, 1)]
    assert (s1["n_events"], s1["n_errors"]) == (2, 2)
    assert s1["error_rate"] == 1.0 and not s1["ok"]
    s2 = got[(2, 0)]
    assert (s2["n_events"], s2["duration_sec"], s2["error_rate"]) == (
        1, 0, 0.0,
    )
    assert bool(s2["ok"])


def test_kmv_overlap_delta_semantics(spark):
    """Delta = |j_cur − j_prev| half-up; alarm over the threshold;
    pairs on only one side get NULL delta and alarm=true."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        kmv_overlap_delta,
    )

    prev = spark.createDataFrame(
        [("a", "b", 0.1), ("a", "c", 0.5), ("b", "c", 0.2)],
        "grp_a string, grp_b string, jaccard_est double",
    )
    cur = spark.createDataFrame(
        [("a", "b", 0.12), ("a", "c", 0.9), ("c", "d", 0.3)],
        "grp_a string, grp_b string, jaccard_est double",
    )
    got = {
        (r["grp_a"], r["grp_b"]): r
        for r in kmv_overlap_delta(
            prev, cur, alarm_delta=0.05
        ).collect()
    }
    assert got[("a", "b")]["delta"] == 0.02
    assert not got[("a", "b")]["alarm"]
    assert got[("a", "c")]["delta"] == 0.4
    assert got[("a", "c")]["alarm"]
    assert got[("b", "c")]["delta"] is None  # vanished pair
    assert got[("b", "c")]["alarm"]
    assert got[("c", "d")]["delta"] is None  # appeared pair
    assert got[("c", "d")]["alarm"]


def test_kmv_overlap_delta_from_real_monitor(spark):
    """End-to-end over the real KMV machinery: matrices from two
    corpus states (before/after a mirror source lands) — the planted
    mirror drives the pair's Jaccard up and the alarm fires, while
    the untouched pair stays quiet."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        kmv_overlap_delta,
        kmv_overlap_monitor,
        kmv_sketch,
    )

    base = [("s1", f"doc-{i}") for i in range(60)] + [
        ("s2", f"doc-{i}") for i in range(40, 100)
    ]
    df1 = spark.createDataFrame(base, "source string, text string")
    # tick 2: s2 starts mirroring s1's content wholesale
    df2 = spark.createDataFrame(
        base + [("s2", f"doc-{i}") for i in range(40)],
        "source string, text string",
    )
    k = 64
    m1 = kmv_overlap_monitor(
        kmv_sketch(df1, ["source"], "text", k=k), "source", k
    )
    m2 = kmv_overlap_monitor(
        kmv_sketch(df2, ["source"], "text", k=k), "source", k
    )
    got = {
        (r["grp_a"], r["grp_b"]): r
        for r in kmv_overlap_delta(m1, m2, alarm_delta=0.1).collect()
    }
    r = got[("s1", "s2")]
    assert r["j_cur"] > r["j_prev"]
    assert r["alarm"]


def test_hybrid_maintained_rrf_matches_python_replay(spark):
    """The maintained hybrid read's fusion must equal an independent
    python RRF replay over its own two candidate lists (rank by
    half-up-4dp score desc then id; rrf = sum 1/(60+rank) over the
    lists a doc appears in, half-up 6dp; top-10 by (rrf desc, id)) —
    and both lists must come from state reads (sanity: sparse ranks
    only docs containing a query term; dense only store survivors)."""
    from kamu_engine_datafusion_spark.queries.pipeline import (
        q_xhybrid_maintained,
    )

    sf = "/root/testdata/sf0.001"
    got = [
        (r["rank"], r["doc_id"], r["sparse_rank"], r["dense_rank"],
         r["rrf_score"])
        for r in q_xhybrid_maintained(spark, sf)
        .orderBy("rank")
        .collect()
    ]
    assert len(got) == 10
    assert [g[0] for g in got] == list(range(1, 11))
    # replay the fusion from the fused row's own per-list ranks:
    # rrf must equal the rank formula exactly
    for _rank, _doc, sr, dr, rrf in got:
        want = 0.0
        if sr is not None:
            want += 1.0 / (60 + sr)
        if dr is not None:
            want += 1.0 / (60 + dr)
        assert rrf == math.floor(want * 1e6 + 0.5) / 1e6
    # the fused order is (rrf desc, doc_id)
    keys = [(-g[4], g[1]) for g in got]
    assert keys == sorted(keys)


def test_kmv_containment_delta_fires_before_jaccard(spark):
    """The directional containment delta catches ABSORPTION a
    size-diluted Jaccard misses: a big source swallowing a small one
    moves containment(small→big) to ~1 while symmetric Jaccard only
    reaches |small|/|big∪small|. Same machinery, metric knob."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        kmv_overlap_delta,
        kmv_overlap_monitor,
        kmv_sketch,
    )

    small = [("s1", f"uniq-{i}") for i in range(40)]
    big = [("s2", f"other-{i}") for i in range(400)]
    df1 = spark.createDataFrame(
        small + big, "source string, text string"
    )
    # tick 2: the big source absorbs every small-source doc
    df2 = spark.createDataFrame(
        small + big + [("s2", f"uniq-{i}") for i in range(40)],
        "source string, text string",
    )
    k = 256
    m1 = kmv_overlap_monitor(
        kmv_sketch(df1, ["source"], "text", k=k), "source", k
    )
    m2 = kmv_overlap_monitor(
        kmv_sketch(df2, ["source"], "text", k=k), "source", k
    )
    thr = 0.2
    cont = {
        (r["grp_a"], r["grp_b"]): r
        for r in kmv_overlap_delta(
            m1, m2, alarm_delta=thr, metric="containment_a_in_b"
        ).collect()
    }
    jac = {
        (r["grp_a"], r["grp_b"]): r
        for r in kmv_overlap_delta(m1, m2, alarm_delta=thr).collect()
    }
    # containment(s1 -> s2) jumps ~0 -> ~1 and alarms
    r = cont[("s1", "s2")]
    assert r["j_cur"] > 0.9 and r["alarm"]
    # the symmetric jaccard stays under the same threshold: no alarm
    assert not jac[("s1", "s2")]["alarm"]


def test_quantile_sketch_collapse_equals_direct_window_build(spark):
    """Sliding-window retirement: per-(grp, bucket) sketches collapsed
    over a bucket WINDOW must equal the sketch built directly over the
    window's rows BIT-FOR-BIT (the exact merge law through the
    grouped-frame form) — including after 'retiring' the oldest
    bucket by deselection."""
    import random

    from kamu_engine_datafusion_spark.operators.sketches import (
        quantile_sketch,
        quantile_sketch_collapse,
    )

    rng = random.Random(11)
    rows = [
        ("g%d" % (i % 2), "r%d" % i, rng.randint(0, 10_000), i % 3)
        for i in range(3000)
    ]
    df = spark.createDataFrame(
        rows, "grp string, rid string, val long, bucket long"
    )
    k = 64
    fine = quantile_sketch(df, ["grp", "bucket"], "rid", "val", k=k)

    def rows_of(frame):
        return sorted(
            (r["grp"], r["rid"], r["val"], r["lvl"], r["thr"])
            for r in frame.collect()
        )

    # full window: collapse(all buckets) == direct build over all rows
    got = quantile_sketch_collapse(fine, ["grp"], ["bucket"], k)
    want = quantile_sketch(df, ["grp"], "rid", "val", k=k)
    assert rows_of(got) == rows_of(want)

    # retirement: drop bucket 0 from the selection — the collapsed
    # window equals the direct build over buckets {1, 2}
    got2 = quantile_sketch_collapse(
        fine.filter(F.col("bucket") >= 1), ["grp"], ["bucket"], k
    )
    want2 = quantile_sketch(
        df.filter(F.col("bucket") >= 1), ["grp"], "rid", "val", k=k
    )
    assert rows_of(got2) == rows_of(want2)
