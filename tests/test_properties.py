"""Property-based tests (hypothesis) for engine invariants that must
hold for ANY input: offset density/uniqueness under arbitrary
partitioning, watermark arithmetic, ms-truncation idempotence, and the
error envelope."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kamu_engine_datafusion_spark import (
    DatasetVocabulary,
    Engine,
    InternalError,
    RawQueryRequest,
    SqlQueryStep,
    TransformRequest,
    TransformRequestInput,
    Watermark,
)
from kamu_engine_datafusion_spark.operators.normalize import _truncate_to_millis
from kamu_engine_datafusion_spark.operators.system_columns import (
    assign_offsets_distributed,
    assign_offsets_serial,
)
from kamu_engine_datafusion_spark.plans.transform import compute_new_watermark

UTC = timezone.utc
_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_slow
@given(
    n=st.integers(min_value=0, max_value=2_000),
    parts=st.integers(min_value=1, max_value=37),
    start=st.integers(min_value=0, max_value=10_000),
)
def test_offsets_dense_unique_any_partitioning(spark, n, parts, start):
    """Both assigners must yield exactly [start, start+n) for any row
    count, partition count, and start offset."""
    df = spark.range(0, n).repartition(parts)
    for assigner in (assign_offsets_serial, assign_offsets_distributed):
        out = assigner(df, "offset", start)
        offsets = sorted(r["offset"] for r in out.select("offset").collect())
        assert offsets == list(range(start, start + n)), assigner.__name__


@given(
    wm_lists=st.lists(
        st.lists(
            st.datetimes(
                min_value=datetime(2000, 1, 1),
                max_value=datetime(2030, 1, 1),
            ),
            max_size=4,
        ),
        min_size=0,
        max_size=5,
    )
)
def test_watermark_is_min_of_present_maxima(wm_lists):
    """A19 semantics: min over inputs that HAVE watermarks of each
    input's max; None only when no input has any (src/engine.rs:310-324)."""
    sys_t = datetime(2023, 1, 1, tzinfo=UTC)
    inputs = []
    for i, wms in enumerate(wm_lists):
        inputs.append(
            TransformRequestInput(
                dataset_alias=f"in{i}",
                query_alias=f"in{i}",
                schema_file="/dev/null",
                data_paths=[],
                offset_interval=None,
                explicit_watermarks=[
                    Watermark(sys_t, w.replace(tzinfo=UTC)) for w in wms
                ],
            )
        )
    req = TransformRequest(
        dataset_alias="out",
        system_time=sys_t,
        next_offset=0,
        vocab=DatasetVocabulary(),
        transform=[SqlQueryStep(query="select 1")],
        inputs=inputs,
        new_data_path="/dev/null",
    )
    got = compute_new_watermark(req)
    present = [max(w) for w in wm_lists if w]
    want = min(present).replace(tzinfo=UTC) if present else None
    assert got == want


@_slow
@given(micros=st.integers(min_value=0, max_value=10**15))
def test_ms_truncation_idempotent(spark, micros):
    """A8: truncating to ms twice equals truncating once, and the result
    has no sub-ms component."""
    df = spark.range(1).select(F.timestamp_micros(F.lit(micros)).alias("ts"))
    once = df.select(_truncate_to_millis(F.col("ts")).alias("t"))
    twice = once.select(_truncate_to_millis(F.col("t")).alias("t"))
    v1, v2 = once.head()["t"], twice.head()["t"]
    assert v1 == v2
    assert v1.microsecond % 1000 == 0
    assert v1 <= datetime.utcfromtimestamp(micros / 1_000_000) + timedelta(
        seconds=1
    )


def test_internal_error_envelope(spark, tmp_path):
    """Non-contract failures surface as InternalError with a backtrace
    (reference src/grpc.rs:39-69), never as raw exceptions."""
    eng = Engine(spark)
    req = RawQueryRequest(
        input_data_paths=[str(tmp_path / "missing.parquet")],
        transform=[SqlQueryStep(query="SELECT * FROM input")],
        output_data_path=str(tmp_path / "out.parquet"),
    )
    with pytest.raises(InternalError) as ei:
        eng.execute_raw_query(req)
    assert ei.value.backtrace  # formatted source chain attached


@_slow
@given(
    points=st.lists(
        st.integers(min_value=0, max_value=5_000_000), min_size=0, max_size=60
    ),
    intervals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5_000_000),
            st.integers(min_value=1, max_value=2_000_000),
        ),
        min_size=0,
        max_size=25,
    ),
    bucket=st.sampled_from([3600, 86400, 7 * 86400]),
)
def test_interval_join_equals_theta_join(spark, points, intervals, bucket):
    """Bucketized interval join must produce EXACTLY the theta-join
    result for any points, intervals, and bucket width."""
    from kamu_engine_datafusion_spark.operators.rangejoin import interval_join

    epoch = datetime(2000, 1, 1, tzinfo=UTC)
    pdf = spark.createDataFrame(
        [(i, epoch + timedelta(seconds=s)) for i, s in enumerate(points)],
        "pid long, ts timestamp",
    )
    idf = spark.createDataFrame(
        [
            (j, epoch + timedelta(seconds=s), epoch + timedelta(seconds=s + w))
            for j, (s, w) in enumerate(intervals)
        ],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            pdf, "ts", idf, "start_ts", "end_ts", bucket_seconds=bucket
        ).collect()
    }
    expected = {
        (i, j)
        for i, s in enumerate(points)
        for j, (lo, w) in enumerate(intervals)
        if lo <= s < lo + w
    }
    assert got == expected


@_slow
@given(
    ops=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # key space (5 keys)
            st.integers(min_value=0, max_value=3),  # ODF op code
            st.integers(min_value=0, max_value=99),  # payload
        ),
        min_size=0,
        max_size=40,
    )
)
def test_snapshot_matches_reference_semantics(spark, ops):
    """For ANY op sequence: the snapshot holds exactly the keys whose
    latest record is not a retraction/correct-from, with that record's
    payload."""
    from kamu_engine_datafusion_spark.operators.snapshot import (
        snapshot_of_ledger,
    )

    t0 = datetime(2023, 1, 1, tzinfo=UTC)
    rows = [
        (i, op, t0, t0, f"k{key}", val)
        for i, (key, op, val) in enumerate(ops)
    ]
    ledger = spark.createDataFrame(
        rows,
        "offset long, op int, system_time timestamp, "
        "event_time timestamp, k string, v long",
    )
    got = {
        r["k"]: r["v"]
        for r in snapshot_of_ledger(ledger, "k").collect()
    }
    expected: dict[str, int] = {}
    last: dict[str, tuple[int, int]] = {}
    for key, op, val in ops:
        last[f"k{key}"] = (op, val)
    for k, (op, val) in last.items():
        if op not in (1, 2):  # retract, correct-from
            expected[k] = val
    assert got == expected


@_slow
@given(
    n=st.integers(min_value=1, max_value=120),
    parts=st.integers(min_value=1, max_value=11),
    seeds=st.integers(min_value=1, max_value=6),
    thr=st.floats(min_value=0.1, max_value=0.999),
)
def test_semantic_dedup_invariants_any_partitioning(spark, n, parts, seeds, thr):
    """For ANY corpus/partitioning: survivors are a subset of the input
    with unique ids, id 0's lowest-id survivor status holds (the lowest
    id can never be dropped), and the result is partition-invariant."""
    from kamu_engine_datafusion_spark.operators.dedup import semantic_dedup

    rows = [
        (i, [float((i * 7 + j * 13) % 5 - 2) for j in range(4)], 0)
        for i in range(n)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    a = sorted(
        r["vec_id"]
        for r in semantic_dedup(emb, threshold=thr, num_seeds=seeds).collect()
    )
    assert len(a) == len(set(a))  # no duplicated survivors
    assert set(a) <= set(range(n))
    assert a[0] == 0  # the globally lowest id always survives
    b = sorted(
        r["vec_id"]
        for r in semantic_dedup(
            emb.repartition(parts), threshold=thr, num_seeds=seeds
        ).collect()
    )
    assert a == b  # partition-invariant


@_slow
@given(
    n=st.integers(min_value=0, max_value=300),
    budget=st.integers(min_value=1, max_value=200),
    parts=st.integers(min_value=1, max_value=7),
)
def test_pack_sequences_chunks_cover_budget(spark, n, budget, parts):
    """Chunk totals never exceed budget + one row's cost, and chunk ids
    start at 0 and are non-decreasing in id order (a row costing more
    than the budget legitimately skips ids)."""
    from kamu_engine_datafusion_spark.operators.sampling import pack_sequences

    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 17 + 1).alias("cost"),
    )
    out = pack_sequences(df.repartition(parts), "k", "cost", budget, "g")
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault((r["g"], r["chunk"]), []).append(r)
    for (g, chunk), members in per.items():
        total = sum(r["cost"] for r in members)
        biggest = max(r["cost"] for r in members)
        assert total <= budget + biggest  # overrun bounded by one row
    for g in {r["g"] for r in rows}:
        seq = [r["chunk"] for r in sorted(rows, key=lambda r: r["k"])
               if r["g"] == g]
        if seq:
            assert seq[0] == 0  # first row of each group starts chunk 0
            assert all(x <= y for x, y in zip(seq, seq[1:]))  # monotone


@_slow
@given(
    ops=st.lists(
        st.tuples(
            st.integers(0, 3),  # op code
            st.sampled_from(["a", "b", "c"]),  # key
            st.integers(-1000, 1000),  # value in hundredths
        ),
        min_size=1,
        max_size=24,
    ),
    cut=st.integers(0, 24),
)
def test_changelog_merge_any_split_equals_full(spark, ops, cut):
    """For ANY ledger and ANY split point, merging the two slices'
    aggregates (dead groups kept) equals the full recompute — the
    invariant that makes per-tick view maintenance sound."""
    from kamu_engine_datafusion_spark.operators.changelog import (
        changelog_agg,
        merge_changelog_aggs,
    )

    rows = [
        (i, op, k, v / 100.0) for i, (op, k, v) in enumerate(ops)
    ]
    schema = "offset long, op int, k string, value double"
    cut = min(cut, len(rows))
    full = sorted(
        map(
            tuple,
            changelog_agg(
                spark.createDataFrame(rows, schema), ["k"], {"vs": "value"}
            ).collect(),
        )
    )
    lo, hi = rows[:cut], rows[cut:]
    mk = lambda r: (  # noqa: E731
        changelog_agg(
            spark.createDataFrame(r, schema)
            if r
            else spark.createDataFrame([], schema),
            ["k"],
            {"vs": "value"},
            keep_dead_groups=True,
        )
    )
    merged = sorted(
        map(tuple, merge_changelog_aggs(mk(lo), mk(hi), ["k"]).collect())
    )
    assert merged == full


@_slow
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=6),
        min_size=2,
        max_size=10,
    ),
    d=st.integers(1, 2),
)
def test_fuzzy_pairs_full_recall_any_corpus(spark, words, d):
    """Deletion-neighborhood blocking finds EVERY pair within edit
    distance d on arbitrary corpora (small alphabet maximizes
    collisions and near-misses)."""
    from kamu_engine_datafusion_spark.operators.linkage import (
        fuzzy_string_pairs,
    )

    rows = list(enumerate(words))
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_string_pairs(df, "s", "id", d).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    expect = {
        (i, j)
        for (i, a) in rows
        for (j, b) in rows
        if i < j and lev(a, b) <= d
    }
    assert got == expect


@_slow
@given(
    spans=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 10)),
        min_size=1,
        max_size=12,
    )
)
def test_merge_intervals_equals_sweep_line(spark, spans):
    from kamu_engine_datafusion_spark.operators.rangejoin import (
        merge_intervals,
    )

    rows = [("k", s, s + w) for s, w in spans]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = sorted(
        (r["s"], r["e"], r["n_merged"])
        for r in merge_intervals(df, "s", "e", ["k"]).collect()
    )
    ivs = sorted((s, e) for _, s, e in rows)
    merged = []
    for s, e in ivs:
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
            merged[-1][2] += 1
        else:
            merged.append([s, e, 1])
    assert got == [tuple(m) for m in merged]


@_slow
@given(
    old_state=st.dictionaries(
        st.integers(0, 30), st.one_of(st.none(), st.integers(-5, 5)),
        max_size=20,
    ),
    new_state=st.dictionaries(
        st.integers(0, 30), st.one_of(st.none(), st.integers(-5, 5)),
        max_size=20,
    ),
)
def test_snapshot_diff_roundtrip_property(spark, old_state, new_state):
    """For ANY two keyed states (including null values and empty
    states): appending snapshot_diff(old, new) to a ledger whose
    snapshot is `old` re-snapshots to exactly `new`."""
    from kamu_engine_datafusion_spark.operators.changelog import (
        snapshot_diff,
    )
    from kamu_engine_datafusion_spark.operators.snapshot import (
        snapshot_of_ledger,
    )

    schema = "k long, v long"
    old = spark.createDataFrame(list(old_state.items()) or [], schema)
    new = spark.createDataFrame(list(new_state.items()) or [], schema)
    diff = sorted(
        (tuple(r) for r in snapshot_diff(old, new, "k").collect()),
        key=lambda t: (t[2], t[1]),  # (key, __half): pairs stay adjacent
    )
    base = [(i, 0, k, v) for i, (k, v) in enumerate(old_state.items())]
    appended = [
        (100 + i, op, k, v) for i, (op, half, k, v) in enumerate(diff)
    ]
    ledger = spark.createDataFrame(
        base + appended, "offset long, op int, k long, v long"
    ).withColumn("system_time", F.lit(None).cast("timestamp"))
    got = {
        r["k"]: r["v"] for r in snapshot_of_ledger(ledger, "k").collect()
    }
    assert got == new_state


@_slow
@given(
    ops=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # key
            st.integers(min_value=0, max_value=3),   # op
            st.integers(min_value=0, max_value=99),  # payload
        ),
        min_size=1,
        max_size=60,
    ),
    horizon_frac=st.floats(min_value=0.0, max_value=1.0),
)
def test_compact_ledger_unobservable_property(spark, ops, horizon_frac):
    """For ANY op sequence and ANY horizon: snapshot_as_of(compacted, t)
    == snapshot_as_of(full, t) for every t >= horizon, and the
    compacted pre-horizon slice holds exactly one record per key."""
    from kamu_engine_datafusion_spark.operators.snapshot import (
        compact_ledger,
        snapshot_as_of,
    )

    t0 = datetime(2023, 1, 1, tzinfo=UTC)
    rows = [
        (i, op, t0, t0, f"k{key}", val)
        for i, (key, op, val) in enumerate(ops)
    ]
    ledger = spark.createDataFrame(
        rows,
        "offset long, op int, system_time timestamp, "
        "event_time timestamp, k string, v long",
    )
    horizon = int(horizon_frac * (len(ops) - 1))
    comp = compact_ledger(ledger, "k", horizon)
    pre = comp.filter(F.col("offset") <= horizon)
    per_key = pre.groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in per_key)
    # probe the horizon itself, the end, and a mid point
    probes = sorted({horizon, len(ops) - 1, (horizon + len(ops) - 1) // 2})
    for t in probes:
        want = sorted(
            map(tuple, snapshot_as_of(ledger, "k", t).select("k", "v").collect())
        )
        got = sorted(
            map(tuple, snapshot_as_of(comp, "k", t).select("k", "v").collect())
        )
        assert got == want, (t, got, want)


@_slow
@given(
    n=st.integers(min_value=0, max_value=150),
    n_sources=st.integers(min_value=1, max_value=4),
    weights=st.lists(
        st.floats(min_value=0.0, max_value=5.0), min_size=4, max_size=4
    ),
    salt=st.integers(min_value=0, max_value=3),
    parts=st.integers(min_value=1, max_value=7),
)
def test_interleave_distributed_equals_serial_property(
    spark, n, n_sources, weights, salt, parts
):
    """For ANY corpus size, source split, weight vector (zeros
    included), salt, and input partitioning: the distributed no-window
    interleave must be BIT-IDENTICAL to the serial window form."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        interleave_sources,
    )

    rows = [(i, f"s{i % n_sources}") for i in range(n)]
    df = spark.createDataFrame(rows, "k long, s string").repartition(parts)
    wmap = {f"s{j}": weights[j] for j in range(n_sources)}
    ser = {
        r["k"]: r["interleave_rank"]
        for r in interleave_sources(
            df, "k", "s", wmap, salt=salt, mode="serial"
        ).collect()
    }
    dist = {
        r["k"]: r["interleave_rank"]
        for r in interleave_sources(
            df, "k", "s", wmap, salt=salt, mode="distributed"
        ).collect()
    }
    assert dist == ser


@_slow
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),     # user
            st.integers(min_value=0, max_value=5_000), # seconds offset
        ),
        min_size=0,
        max_size=40,
    ),
    gap=st.integers(min_value=1, max_value=2_000),
)
def test_debounce_matches_brute_force(spark, events, gap):
    """Batch debounce (lag form) for ANY event set and gap equals the
    per-stream brute force: keep iff first of its (user) stream or
    strictly more than gap after the previous raw event."""
    from datetime import datetime, timedelta, timezone

    from kamu_engine_datafusion_spark.operators.funnel import (
        debounce_events,
    )

    t0 = datetime(2023, 1, 1, tzinfo=timezone.utc)
    rows = [
        (i, t0 + timedelta(seconds=sec), u, "e")
        for i, (u, sec) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = sorted(
        r["event_id"]
        for r in debounce_events(df, "ts", gap_seconds=float(gap)).collect()
    )
    expect = []
    by_user: dict[int, list] = {}
    for i, (u, sec) in enumerate(events):
        by_user.setdefault(u, []).append((sec, i))
    for u, evs in by_user.items():
        evs.sort()
        prev = None
        for sec, i in evs:
            if prev is None or sec - prev > gap:
                expect.append(i)
            prev = sec
    assert got == sorted(expect)


_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg"])
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@_slow
@given(
    ref_texts=st.lists(_text, min_size=1, max_size=6),
    corpus_texts=st.lists(_text, min_size=1, max_size=10),
)
def test_ngram_novelty_matches_python_reference(
    spark, ref_texts, corpus_texts
):
    """ngram_novelty ≡ a from-scratch python bigram computation for ANY
    corpus: counts with multiplicity, zero-ngram docs → 1.0, half-up
    4dp."""
    import math

    from kamu_engine_datafusion_spark.operators.decontaminate import (
        ngram_novelty,
    )

    def bigrams(t):
        # engine splits trim(lower(text)) on \s+: empty text -> [""]
        toks = t.strip().lower().split() if t.strip() else [""]
        return [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    ref_set = {g for t in ref_texts for g in bigrams(t)}
    expected = {}
    for i, t in enumerate(corpus_texts):
        gs = bigrams(t)
        novel = sum(1 for g in gs if g not in ref_set)
        nov = (
            1.0
            if not gs
            else math.floor(novel / len(gs) * 10000 + 0.5) / 10000
        )
        expected[i] = (len(gs), novel, nov)

    ref_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ref_texts)], ["doc_id", "text"]
    )
    corpus_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_novel"], r["novelty"])
        for r in ngram_novelty(corpus_df, ref_df, n=2).collect()
    }
    assert got == expected


@_slow
@given(
    n=st.integers(min_value=1, max_value=50),
    stages=st.integers(min_value=1, max_value=6),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_curriculum_equal_counts_any_input(spark, n, stages, seed):
    """ntile staging: stage sizes within a stratum differ by ≤1, stages
    cover 1..min(stages, n), difficulty ordering respected."""
    import random

    from kamu_engine_datafusion_spark.operators.sampling import (
        curriculum_stages,
    )

    rng = random.Random(seed)
    rows = [(i, "g", float(rng.randint(0, 9))) for i in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "difficulty"])
    out = curriculum_stages(
        df, "difficulty", n_stages=stages, part_col="lang"
    ).collect()
    per_stage: dict[int, list[float]] = {}
    for r in out:
        per_stage.setdefault(r["stage"], []).append(r["difficulty"])
    sizes = [len(v) for v in per_stage.values()]
    assert sum(sizes) == n
    assert max(sizes) - min(sizes) <= 1
    assert set(per_stage) == set(range(1, min(stages, n) + 1))
    for s in sorted(per_stage)[:-1]:
        assert max(per_stage[s]) <= min(per_stage[s + 1]) + 1e-9


@_slow
@given(
    target_texts=st.lists(_text, min_size=1, max_size=6),
    corpus_texts=st.lists(_text, min_size=1, max_size=10),
)
def test_dsir_scores_match_python_reference(
    spark, target_texts, corpus_texts
):
    """dsir_scores ≡ a from-scratch python implementation of the
    hashed-bigram importance score for ANY corpus: multiplicity bucket
    counts, add-λ smoothing, 1e-9 fixed-point log-ratios, in-row fold —
    bit-exact (the scores are integers)."""
    import math

    from kamu_engine_datafusion_spark.operators.sampling import dsir_scores

    M31, BUCKETS, LAM = 2147483647, 16, 0.5

    def ph(s: str) -> int:
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % M31
        return acc

    def bigrams(t: str) -> list[str]:
        toks = t.strip().lower().split() if t.strip() else [""]
        return [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket_counts(texts: list[str]) -> dict[int, int]:
        c: dict[int, int] = {}
        for t in texts:
            for g in bigrams(t):
                b = ph(g) % BUCKETS
                c[b] = c.get(b, 0) + 1
        return c

    ct, cr = bucket_counts(target_texts), bucket_counts(corpus_texts)
    tt, tr, lb = sum(ct.values()), sum(cr.values()), LAM * BUCKETS
    lr = [
        int(
            math.floor(
                (
                    math.log((ct.get(b, 0) + LAM) / (tt + lb))
                    - math.log((cr.get(b, 0) + LAM) / (tr + lb))
                )
                * 1e9
                + 0.5
            )
        )
        for b in range(BUCKETS)
    ]
    expected = {
        i: sum(lr[ph(g) % BUCKETS] for g in bigrams(t))
        for i, t in enumerate(corpus_texts)
    }

    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], ["doc_id", "text"]
    )
    tgt = spark.createDataFrame(
        [(i, t) for i, t in enumerate(target_texts)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_scores(
            corpus, tgt, buckets=BUCKETS, lam=LAM, hash_fn="poly"
        ).collect()
    }
    assert got == expected


@_slow
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["en", "de", "fr", "xx"]),
            st.integers(min_value=1, max_value=500),
        ),
        min_size=1,
        max_size=40,
    ),
    budget=st.integers(min_value=1, max_value=5000),
)
def test_mix_to_budget_matches_python_reference(spark, rows, budget):
    """mix_to_budget ≡ a from-scratch python reference for ANY corpus
    and budget: per-stratum cost totals, normalized weights, the
    min(1, budget·w/tok) keep-fraction with the half-up 6dp snap before
    the integer-bucket cut, keyed poly-hash membership, and unlisted
    strata dropped."""
    import math

    from kamu_engine_datafusion_spark.operators.sampling import (
        mix_to_budget,
    )

    WEIGHTS = {"en": 0.5, "de": 0.3, "fr": 0.2}  # 'xx' unlisted
    M31, B = 2147483647, 10000

    def ph(s: str) -> int:
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % M31
        return acc

    data = [(i, lang, cost) for i, (lang, cost) in enumerate(rows)]
    tot_w = sum(WEIGHTS.values())
    toks: dict[str, int] = {}
    for _i, lang, cost in data:
        toks[lang] = toks.get(lang, 0) + cost
    expected = set()
    for i, lang, cost in data:
        if lang not in WEIGHTS:
            continue
        frac = min(1.0, budget * (WEIGHTS[lang] / tot_w) / toks[lang])
        # Spark round(x, 6) is half-up for positives; then floor
        cut = math.floor(math.floor(frac * B * 1e6 + 0.5) / 1e6)
        if ph(f"{i}#0") % B < cut:
            expected.add(i)

    df = spark.createDataFrame(data, ["doc_id", "lang", "cost"])
    out = mix_to_budget(
        df, "doc_id", "lang", "cost", WEIGHTS, budget=float(budget),
        hash_fn="poly",
    )
    got = {r["doc_id"] for r in out.collect()}
    assert got == expected


@_slow
@given(
    costs=st.lists(
        st.tuples(
            st.sampled_from(["p", "q"]),
            st.integers(min_value=0, max_value=300),
        ),
        min_size=1,
        max_size=30,
    ),
    budget=st.integers(min_value=1, max_value=500),
    shards=st.sampled_from([None, 4]),
)
def test_pack_sequences_matches_python_reference(
    spark, costs, budget, shards
):
    """pack_sequences ≡ a from-scratch python running-offset chunker
    for ANY costs/budget, with and without the r8 id-hash sub-shards:
    per (part[, shard]) group ordered by id, chunk = floor(exclusive
    running cost / budget)."""
    import math

    from kamu_engine_datafusion_spark.operators.sampling import (
        pack_sequences,
    )

    M31 = 2147483647

    def ph(s: str) -> int:
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % M31
        return acc

    data = [(i, part, c) for i, (part, c) in enumerate(costs)]
    groups: dict[tuple, list[tuple[int, int]]] = {}
    for i, part, c in data:
        key = (part, ph(str(i)) % shards) if shards else (part,)
        groups.setdefault(key, []).append((i, c))
    expected = {}
    for g in groups.values():
        run = 0
        for i, c in sorted(g):
            expected[i] = math.floor(run / float(budget))
            run += c

    df = spark.createDataFrame(data, ["doc_id", "lang", "cost"])
    out = pack_sequences(
        df, "doc_id", "cost", budget=budget, part_col="lang",
        shards=shards, hash_fn="poly",
    )
    got = {r["doc_id"]: r["chunk"] for r in out.collect()}
    assert got == expected


@_slow
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["s1", "s2", "s3"]), _text),
        min_size=1,
        max_size=25,
    ),
)
def test_cross_source_overlap_matches_python_reference(spark, rows):
    """cross_source_overlap ≡ python set math for ANY corpus: distinct
    normalized content per source, pairwise intersections, Jaccard
    half-up 4dp, pairs without overlap absent."""
    import math
    import re

    from kamu_engine_datafusion_spark.operators.dedup import (
        cross_source_overlap,
    )

    sets_: dict[str, set] = {}
    for src, text in rows:
        norm = re.sub(r"\s+", " ", text.lower()).strip()
        sets_.setdefault(src, set()).add(norm)
    expected = {}
    srcs = sorted(sets_)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            shared = len(sets_[a] & sets_[b])
            if shared:
                na, nb = len(sets_[a]), len(sets_[b])
                jac = math.floor(shared / (na + nb - shared) * 10000 + 0.5) / 10000
                expected[(a, b)] = (shared, na, nb, jac)

    df = spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(rows)],
        ["doc_id", "source", "text"],
    )
    got = {
        (r["src_a"], r["src_b"]): (
            r["n_shared"], r["n_a"], r["n_b"], r["jaccard"]
        )
        for r in cross_source_overlap(df).collect()
    }
    assert got == expected


@_slow
@given(
    langs=st.lists(
        st.sampled_from(["en", "de", "fr"]), min_size=1, max_size=40
    ),
    frac=st.floats(min_value=0.05, max_value=0.95, allow_nan=False),
)
def test_stratified_exact_matches_python_reference(spark, langs, frac):
    """stratified_sample_exact ≡ python: rows ranked per stratum by
    (poly bucket, key), exactly ceil(frac·n) kept — for ANY strata mix
    and fraction."""
    import math

    from kamu_engine_datafusion_spark.operators.sampling import (
        stratified_sample_exact,
    )

    M31, B = 2147483647, 10000

    def ph(s: str) -> int:
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % M31
        return acc

    data = [(i, lang) for i, lang in enumerate(langs)]
    by_stratum: dict[str, list[int]] = {}
    for i, lang in data:
        by_stratum.setdefault(lang, []).append(i)
    expected = set()
    for members in by_stratum.values():
        ranked = sorted(members, key=lambda i: (ph(f"{i}#0") % B, i))
        keep = math.ceil(len(members) * float(frac))
        expected.update(ranked[:keep])

    df = spark.createDataFrame(data, ["doc_id", "lang"])
    got = {
        r["doc_id"]
        for r in stratified_sample_exact(
            df, "doc_id", "lang", float(frac), hash_fn="poly"
        ).collect()
    }
    assert got == expected


@_slow
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # user
            st.integers(min_value=0, max_value=500_000),  # ts ms offset
        ),
        min_size=1,
        max_size=60,
    ),
    cuts=st.lists(
        st.integers(min_value=0, max_value=59), min_size=0, max_size=3
    ),
    gap=st.integers(min_value=1, max_value=120),
)
def test_session_fold_tick_boundary_invariance(spark, events, cuts, gap):
    """r14 sessions family: for ANY event stream and ANY event-time-
    ordered split into ticks, the fold (closed ∪ open) equals the
    batch lag+cumsum sessionizer — tick boundaries must be invisible,
    including boundaries INSIDE a session and ticks that skip users.
    Sub-second resolution is exercised (ms offsets with a seconds-
    truncated break rule — the divergence the 6M-event stress caught)."""
    from pyspark.sql import Window

    from kamu_engine_datafusion_spark.operators.sessions import (
        session_fold_increment,
        sessions_read,
    )

    base = 1_700_000_000_000
    rows = [
        (u, base + ms, i) for i, (u, ms) in enumerate(events)
    ]
    # event-time-ordered ticks: sort globally by (ts, id), cut at
    # arbitrary positions
    ordered = sorted(rows, key=lambda r: (r[1], r[2]))
    bounds = sorted({min(c, len(ordered)) for c in cuts})
    ticks, prev = [], 0
    for b in bounds + [len(ordered)]:
        if b > prev:
            ticks.append(ordered[prev:b])
            prev = b
    schema = "user_id long, ms long, event_id long"

    def frame(part):
        return spark.createDataFrame(part, schema).select(
            "user_id",
            F.timestamp_millis(F.col("ms")).alias("ts"),
            "event_id",
        )

    state, closed_all = None, None
    for tk in ticks:
        closed, state = session_fold_increment(
            state, frame(tk), gap_sec=gap
        )
        state = state.localCheckpoint(eager=True)
        closed = closed.localCheckpoint(eager=True)
        closed_all = (
            closed
            if closed_all is None
            else closed_all.unionByName(closed)
        )
    got = sorted(
        tuple(r) for r in sessions_read(closed_all, state).collect()
    )

    ev = frame(rows)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id", "ts", "event_id",
        F.when(
            F.col("ts").cast("long")
            - F.lag(F.col("ts").cast("long")).over(w) > gap,
            F.lit(1),
        ).otherwise(F.lit(0)).alias("ns"),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("ns").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    )
    want = sorted(
        tuple(r)
        for r in sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            (
                (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts")))
                / F.lit(1000)
            ).cast("long").alias("duration_sec"),
        )
        .collect()
    )
    assert got == want


@_slow
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.integers(min_value=0, max_value=100_000),  # ts ms
            st.integers(min_value=0, max_value=4),  # type index
        ),
        min_size=1,
        max_size=50,
    ),
    cuts=st.lists(
        st.integers(min_value=0, max_value=49), min_size=0, max_size=3
    ),
)
def test_funnel_and_transitions_tick_boundary_invariance(
    spark, events, cuts
):
    """r14 funnel + transitions families: for ANY event stream and ANY
    event-time-ordered split into ticks, the folds equal their batch
    twins — funnel per-step counts and the full Markov pair matrix.
    Duplicate (ts, id) collisions are avoided by construction (ids are
    the global sequence); cross-tick ties at the same ms are allowed
    and must still match because the tie-break id follows arrival."""
    from kamu_engine_datafusion_spark.operators.funnel import (
        event_transitions,
        funnel_counts,
        funnel_fold_increment,
        funnel_from_state,
        transitions_from_counts,
        transitions_increment,
    )

    types = ["view", "click", "purchase", "error", "signup"]
    steps = ["view", "click", "purchase"]
    base = 1_700_000_000_000
    rows = [
        (u, base + ms, types[ti], i)
        for i, (u, ms, ti) in enumerate(events)
    ]
    ordered = sorted(rows, key=lambda r: (r[1], r[3]))
    bounds = sorted({min(c, len(ordered)) for c in cuts})
    ticks, prev = [], 0
    for b in bounds + [len(ordered)]:
        if b > prev:
            ticks.append(ordered[prev:b])
            prev = b
    schema = "user_id long, ms long, event_type string, event_id long"

    def frame(part):
        return spark.createDataFrame(part, schema).select(
            "user_id",
            F.timestamp_millis(F.col("ms")).alias("ts"),
            "event_type",
            "event_id",
        )

    fstate, tlast, tcounts = None, None, None
    for tk in ticks:
        f = frame(tk)
        fstate = funnel_fold_increment(fstate, f, steps)
        fstate = fstate.localCheckpoint(eager=True)
        inc, tlast = transitions_increment(tlast, f)
        tlast = tlast.localCheckpoint(eager=True)
        tcounts = (
            inc
            if tcounts is None
            else inc.unionByName(tcounts)
            .groupBy("from_type", "to_type")
            .agg(F.sum("n").cast("long").alias("n"))
        )
        tcounts = tcounts.localCheckpoint(eager=True)

    full = frame(rows)
    got_f = sorted(
        tuple(r) for r in funnel_from_state(fstate, steps).collect()
    )
    want_f = sorted(
        tuple(r) for r in funnel_counts(full, steps).collect()
    )
    assert got_f == want_f
    got_t = sorted(
        tuple(r) for r in transitions_from_counts(tcounts).collect()
    )
    want_t = sorted(
        tuple(r) for r in event_transitions(full).collect()
    )
    assert got_t == want_t


@_slow
@given(
    spans=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # group
            st.integers(min_value=0, max_value=1_000),  # start
            st.integers(min_value=-5, max_value=200),  # length (neg -> inverted, dropped)
        ),
        min_size=1,
        max_size=60,
    ),
    cuts=st.lists(
        st.integers(min_value=0, max_value=59), min_size=0, max_size=3
    ),
    order=st.randoms(use_true_random=False),
)
def test_intervals_fold_partition_invariance(spark, spans, cuts, order):
    """r15 intervals family: for ANY span multiset and ANY partition
    into ticks in ANY order (geometry is an idempotent set function —
    ticks need not be event-time-ordered), the fold equals the batch
    merge_intervals of everything, island ids and weighted n_merged
    included — including inverted rows dropped identically, touching
    endpoints, and islands bridged across ticks."""
    from kamu_engine_datafusion_spark.operators.rangejoin import (
        intervals_increment,
        merge_intervals,
    )

    rows = [(g, s, s + ln) for (g, s, ln) in spans]
    shuffled = list(rows)
    order.shuffle(shuffled)
    bounds = sorted({min(c, len(shuffled)) for c in cuts})
    ticks, prev = [], 0
    for b in bounds + [len(shuffled)]:
        if b > prev:
            ticks.append(shuffled[prev:b])
            prev = b
    schema = "grp long, start_us long, end_us long"
    state = None
    for tk in ticks:
        state = intervals_increment(
            state, spark.createDataFrame(tk, schema),
            "start_us", "end_us", ["grp"],
        ).localCheckpoint(eager=True)
    got = sorted(tuple(r) for r in state.collect())
    want = sorted(
        tuple(r)
        for r in merge_intervals(
            spark.createDataFrame(rows, schema),
            "start_us", "end_us", ["grp"],
        )
        .select("grp", "island", "start_us", "end_us", "n_merged")
        .collect()
    )
    assert got == want


@_slow
@given(
    updates=st.dictionaries(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # key
            st.integers(min_value=0, max_value=10_000),  # ts ms
        ),
        st.integers(min_value=0, max_value=999),  # value
        min_size=1,
        max_size=40,
    ),
    cuts=st.lists(
        st.integers(min_value=0, max_value=39), min_size=0, max_size=3
    ),
    order=st.randoms(use_true_random=False),
    extras=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # probe key (may miss)
            st.integers(min_value=0, max_value=500),  # ms after key max
        ),
        min_size=1,
        max_size=10,
    ),
)
def test_asof_state_fold_and_probe_invariance(
    spark, updates, cuts, order, extras
):
    """r15 as-of family: for ANY dimension stream (unique (key, ts) —
    the documented tie contract) split into ticks in ANY order, the
    max-merge fold equals the per-key latest of everything, and an
    event-time-current probe (every left ts ≥ its key's max right ts,
    equal-ts included) equals the batch asof_join over the WHOLE
    history — for both how='inner' and how='left', including probe
    keys with no dimension rows at all."""
    from kamu_engine_datafusion_spark.operators.asof import (
        asof_join,
        asof_probe_from_state,
        asof_state_increment,
    )

    base = 1_700_000_000_000
    rows = [
        (k, base + ms, float(v), i)
        for i, ((k, ms), v) in enumerate(sorted(updates.items()))
    ]
    shuffled = list(rows)
    order.shuffle(shuffled)
    bounds = sorted({min(c, len(shuffled)) for c in cuts})
    ticks, prev = [], 0
    for b in bounds + [len(shuffled)]:
        if b > prev:
            ticks.append(shuffled[prev:b])
            prev = b
    rschema = "key long, ms long, price double, rid long"

    def rframe(part):
        return spark.createDataFrame(part, rschema).select(
            "key", F.timestamp_millis(F.col("ms")).alias("ts"),
            "price", "rid",
        )

    state = None
    for tk in ticks:
        state = asof_state_increment(
            state, rframe(tk), ["key"], "ts", ["price"], "rid"
        ).localCheckpoint(eager=True)

    latest = {}
    for (k, ms), v in updates.items():
        if k not in latest or ms > latest[k][0]:
            latest[k] = (ms, float(v))
    got_state = sorted(
        (r["key"], r["ts"], r["price"]) for r in state.collect()
    )
    want_state = sorted(
        (k, datetime.fromtimestamp((base + ms) / 1000, tz=timezone.utc)
            .replace(tzinfo=None),
         v)
        for k, (ms, v) in latest.items()
    )
    assert [(k, p) for (k, _t, p) in got_state] == [
        (k, p) for (k, _t, p) in want_state
    ]

    key_max = {k: ms for k, (ms, _v) in latest.items()}
    lrows = [
        (k, base + key_max.get(k, 0) + extra, i)
        for i, (k, extra) in enumerate(extras)
    ]
    lschema = "key long, ms long, qty long"
    left = spark.createDataFrame(lrows, lschema).select(
        "key", F.timestamp_millis(F.col("ms")).alias("ts"), "qty"
    )
    right_full = rframe(rows).select("key", "ts", "price")
    for how in ("inner", "left"):
        got = sorted(
            tuple(r)
            for r in asof_probe_from_state(
                left, state, ["key"], "ts", ["price"], how=how
            )
            .select("key", "qty", "right_price")
            .collect()
        )
        want = sorted(
            tuple(r)
            for r in asof_join(
                left, right_full, ["key"], "ts", ["price"], how=how
            )
            .select("key", "qty", "right_price")
            .collect()
        )
        assert got == want, how


@_slow
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # group
            st.floats(
                min_value=-100.0,
                max_value=100.0,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=50,
    ),
    cuts=st.lists(
        st.integers(min_value=0, max_value=49), min_size=0, max_size=3
    ),
    order=st.randoms(use_true_random=False),
)
def test_moments_fold_partition_invariance(spark, rows, cuts, order):
    """r15 moments family: for ANY value stream and ANY partition into
    ticks in ANY order, the cell-wise BIGINT fold of the fixed-point
    moments equals the batch moment_counts of everything BIT-EXACTLY —
    the property float sums could never satisfy (summation order would
    leak); quantization happens per row, so tick boundaries are
    invisible by construction and this pins it."""
    from kamu_engine_datafusion_spark.operators.profile import (
        moment_counts,
    )

    shuffled = list(rows)
    order.shuffle(shuffled)
    bounds = sorted({min(c, len(shuffled)) for c in cuts})
    ticks, prev = [], 0
    for b in bounds + [len(shuffled)]:
        if b > prev:
            ticks.append(shuffled[prev:b])
            prev = b
    schema = "grp long, x double"
    state = None
    for tk in ticks:
        inc = moment_counts(
            spark.createDataFrame(tk, schema), "x", ["grp"]
        )
        state = (
            inc
            if state is None
            else inc.unionByName(state)
            .groupBy("grp")
            .agg(
                F.sum("n").cast("long").alias("n"),
                F.sum("s1").cast("long").alias("s1"),
                F.sum("s2").cast("long").alias("s2"),
            )
        )
    got = sorted(tuple(r) for r in state.collect())
    want = sorted(
        tuple(r)
        for r in moment_counts(
            spark.createDataFrame(rows, schema), "x", ["grp"]
        ).collect()
    )
    assert got == want


@_slow
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "ee"]),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=30,
    ),
    cuts=st.lists(
        st.integers(min_value=0, max_value=29), min_size=0, max_size=3
    ),
    order=st.randoms(use_true_random=False),
)
def test_pair_counts_fold_partition_invariance(spark, texts, cuts, order):
    """r15 pair-counts family: for ANY doc multiset and ANY partition
    into ticks in ANY order, the cell-wise fold of the skip-gram pair
    counts equals the batch pair_counts of everything — counts are
    exact integers, so tick boundaries are invisible by construction
    and this pins it (incl. empty and single-token docs, which emit
    no pairs)."""
    from kamu_engine_datafusion_spark.operators.text import pair_counts

    rows = [(" ".join(t),) for t in texts]
    shuffled = list(rows)
    order.shuffle(shuffled)
    bounds = sorted({min(c, len(shuffled)) for c in cuts})
    ticks, prev = [], 0
    for b in bounds + [len(shuffled)]:
        if b > prev:
            ticks.append(shuffled[prev:b])
            prev = b
    schema = "text string"
    state = None
    for tk in ticks:
        inc = pair_counts(spark.createDataFrame(tk, schema))
        state = (
            inc
            if state is None
            else inc.unionByName(state)
            .groupBy("w1", "w2")
            .agg(F.sum("c").cast("long").alias("c"))
        )
    got = sorted(tuple(r) for r in state.collect())
    want = sorted(
        tuple(r)
        for r in pair_counts(
            spark.createDataFrame(rows, schema)
        ).collect()
    )
    assert got == want


@_slow
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=50,
        unique=True,
    ),
    cuts=st.lists(
        st.integers(min_value=0, max_value=49), min_size=0, max_size=3
    ),
    order=st.randoms(use_true_random=False),
    cap=st.integers(min_value=1, max_value=6),
)
def test_cap_fold_partition_invariance(spark, ids, cuts, order, cap):
    """r15 cap family: for ANY unique-id stream and ANY partition into
    disjoint ticks in ANY order, the top-cap fold equals the batch
    cap_per_group of everything — the top-n-of-a-total-order merge
    law, including caps larger than a group (kept whole) and eviction
    of early survivors by later smaller-hash arrivals."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        cap_per_group,
        cap_state_increment,
    )

    rows = [(i, i % 3) for i in ids]
    shuffled = list(rows)
    order.shuffle(shuffled)
    bounds = sorted({min(c, len(shuffled)) for c in cuts})
    ticks, prev = [], 0
    for b in bounds + [len(shuffled)]:
        if b > prev:
            ticks.append(shuffled[prev:b])
            prev = b
    schema = "doc_id long, grp long"
    state = None
    for tk in ticks:
        state = cap_state_increment(
            state, spark.createDataFrame(tk, schema),
            "doc_id", "grp", cap, hash_fn="poly",
        ).localCheckpoint(eager=True)
    got = sorted(tuple(r) for r in state.collect())
    want = sorted(
        tuple(r)
        for r in cap_per_group(
            spark.createDataFrame(rows, schema),
            "doc_id", "grp", cap, hash_fn="poly",
        ).collect()
    )
    assert got == want


@_slow
@given(
    a_vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=40
    ),
    b_vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=40
    ),
)
def test_ks_from_sketches_property(spark, a_vals, b_vals):
    """For ANY two integer populations small enough that the k=256
    sketch retains every row, sketch-KS must equal the exact
    two-sample KS (per-distinct-value ECDF compare, half-up 6dp,
    smallest-argmax tiebreak) — ties, negatives, duplicates, and
    singleton populations included."""
    import math

    from kamu_engine_datafusion_spark.operators.sketches import (
        ks_from_sketches,
        quantile_sketch,
    )

    fa = spark.createDataFrame(
        [("g", f"a{i}", v) for i, v in enumerate(a_vals)],
        "grp string, rid string, val long",
    )
    fb = spark.createDataFrame(
        [("g", f"b{i}", v) for i, v in enumerate(b_vals)],
        "grp string, rid string, val long",
    )
    r = ks_from_sketches(
        quantile_sketch(fa, ["grp"], "rid", "val", k=256),
        quantile_sketch(fb, ["grp"], "rid", "val", k=256),
        ["grp"],
    ).collect()[0]

    sa, sb = len(a_vals), len(b_vals)
    best, best_at = -1, None
    for x in sorted(set(a_vals) | set(b_vals)):
        ca = sum(1 for v in a_vals if v <= x)
        cb = sum(1 for v in b_vals if v <= x)
        d = abs(ca * sb - cb * sa)
        if d > best:
            best, best_at = d, x
    assert (r["n_a"], r["n_b"]) == (sa, sb)
    assert r["ks"] == math.floor(best / (sa * sb) * 1e6 + 0.5) / 1e6
    assert r["ks_at"] == best_at
