"""Incremental dedup against a persisted MinHash signature index: the
continuous-ingestion workflow — corpus text is never re-read."""

from __future__ import annotations

from kamu_engine_datafusion_spark.operators.dedup import (
    dedup_increment_against_index,
    minhash_index,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "completely different content about spark engines and parquet files"),
    (3, "a third document describing distributed query processing at scale"),
]
INCREMENT = [
    # copy of corpus doc 1 -> must die vs index
    (10, "the quick brown fox jumps over the lazy dog near the river bank"),
    # genuinely new -> survives
    (11, "novel text on minhash signatures and locality sensitive hashing"),
    # two copies of each other -> one survives (lower id)
    (12, "shared boilerplate paragraph repeated across increment documents"),
    (13, "shared boilerplate paragraph repeated across increment documents"),
]


def test_increment_dedup_vs_index_and_within(spark, tmp_path):
    corpus = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    idx_path = str(tmp_path / "sig_index")
    minhash_index(corpus).write.parquet(idx_path)

    inc = spark.createDataFrame(INCREMENT, ["doc_id", "text"])
    index = spark.read.parquet(idx_path)
    survivors, new_rows = dedup_increment_against_index(
        inc, index, threshold=0.9
    )
    ids = sorted(r["doc_id"] for r in survivors.collect())
    assert ids == [11, 12]

    # appending the survivors' index rows makes the NEXT identical
    # increment fully dead — the index is self-extending
    new_rows.write.mode("append").parquet(idx_path)
    index2 = spark.read.parquet(idx_path)
    survivors2, _ = dedup_increment_against_index(
        spark.createDataFrame(
            [(20, INCREMENT[1][1]), (21, INCREMENT[2][1])], ["doc_id", "text"]
        ),
        index2,
        threshold=0.9,
    )
    assert survivors2.count() == 0


def test_index_rows_shape(spark):
    corpus = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    idx = minhash_index(corpus, num_hashes=32, num_bands=8)
    rows = idx.collect()
    assert len(rows) == 3 * 8  # one row per (doc, band)
    assert {len(r["sig"]) for r in rows} == {32}


def test_split_index_equals_combined(spark, tmp_path):
    """The SPLIT index layout (16 B band rows + one sig row per doc)
    must decide exactly the same survivors/pairs as the combined
    layout, and its new_index_rows tuple must self-extend the two
    tables the same way the combined rows do."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        minhash_index_split,
    )

    corpus = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    inc = spark.createDataFrame(INCREMENT, ["doc_id", "text"])
    combined = minhash_index(corpus)
    bands, sigs = minhash_index_split(corpus)
    # the split parts are exactly the combined frame's projections
    assert sorted(
        (r["doc_id"], r["__band"]) for r in bands.collect()
    ) == sorted((r["doc_id"], r["__band"]) for r in combined.collect())
    assert sigs.count() == 3

    surv_c, _, pairs_c = dedup_increment_against_index(
        inc, combined, threshold=0.9, emit_pairs=True
    )
    surv_s, new_rows_s, pairs_s = dedup_increment_against_index(
        inc, (bands, sigs), threshold=0.9, emit_pairs=True
    )
    assert sorted(r["doc_id"] for r in surv_s.collect()) == sorted(
        r["doc_id"] for r in surv_c.collect()
    )
    assert sorted(tuple(r) for r in pairs_s.collect()) == sorted(
        tuple(r) for r in pairs_c.collect()
    )
    # new_index_rows mirrors the split layout and self-extends it
    new_bands, new_sigs = new_rows_s
    assert sorted(r["doc_id"] for r in new_sigs.collect()) == [11, 12]
    bands2 = bands.unionByName(new_bands)
    sigs2 = sigs.unionByName(new_sigs)
    surv2, _ = dedup_increment_against_index(
        spark.createDataFrame(
            [(20, INCREMENT[1][1]), (21, INCREMENT[2][1])],
            ["doc_id", "text"],
        ),
        (bands2, sigs2),
        threshold=0.9,
    )
    assert surv2.count() == 0


def test_increment_pairs_feed_component_state(spark):
    """The verdict-described pipeline end to end: each ingest tick
    dedups against the persisted MinHash index with ``emit_pairs=True``,
    the emitted near-dup edges fold into component state via
    cc_increment, and after all ticks the state equals the from-scratch
    closure of every pair ever emitted — duplicate CLUSTERS stay
    queryable across ticks, not just the survivor set."""
    from kamu_engine_datafusion_spark.operators.clustering import (
        cc_increment,
        connected_components,
    )
    from kamu_engine_datafusion_spark.operators.dedup import (
        dedup_increment_against_index,
        minhash_index,
    )

    base = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "one two three four five six seven eight nine ten eleven"),
    ]
    t1 = [
        # near-dup of doc 1 (one word changed at the end)
        (10, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        (11, "completely novel content about shuffle partitions and io"),
    ]
    t2 = [
        # near-dup of tick-1's doc 10 (transitively of doc 1)
        (20, "alpha beta gamma delta epsilon zeta eta theta iota mu"),
        # near-dup of doc 2
        (21, "one two three four five six seven eight nine ten twelve"),
    ]
    schema = "doc_id long, text string"
    index = minhash_index(spark.createDataFrame(base, schema))
    state = None
    all_pairs = []
    for tick in (t1, t2):
        inc = spark.createDataFrame(tick, schema)
        surv, new_rows, pairs = dedup_increment_against_index(
            inc, index, threshold=0.6, emit_pairs=True
        )
        pair_rows = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
        all_pairs += pair_rows
        state = cc_increment(state, pairs).localCheckpoint(eager=True)
        index = index.unionByName(new_rows).localCheckpoint(eager=True)
    got = {r["node"]: r["component"] for r in state.collect()}
    want = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(all_pairs, "id_a long, id_b long")
        ).collect()
    }
    assert got == want and len(got) > 0
    # the transitive cluster really formed: 1, 10, 20 share root 1
    assert got[1] == got[10] == got[20] == 1
    assert got[2] == got[21] == 2


def test_incremental_curation_chain_end_to_end(spark):
    """The whole incremental-curation story composed across 3 ingest
    ticks, every stage maintained as state and never re-reading
    history — then every piece of end state checked against its batch
    twin over the full history:

      tick ──> index dedup (emit_pairs) ──> survivors
                 │                            ├─> quantile-sketch fold
                 └─> component-state fold     ├─> winsorize vs PRIOR
                                              │   tick's sketch state
                                              └─> weighted-sample fold

    Asserts: component state ≡ from-scratch closure of all pairs;
    sketch state ≡ batch sketch of all survivor lengths; sample state
    ≡ batch per-group draw over all survivors; and the increment
    winsorize clamps-never-drops even for groups unseen by the prior
    sketch state."""
    from pyspark.sql import functions as F

    from kamu_engine_datafusion_spark.operators.clustering import (
        cc_increment,
        connected_components,
    )
    from kamu_engine_datafusion_spark.operators.dedup import (
        dedup_increment_against_index,
        minhash_index,
    )
    from kamu_engine_datafusion_spark.operators.profile import (
        winsorize_from_sketch,
    )
    from kamu_engine_datafusion_spark.operators.sampling import (
        weighted_sample_per_group,
    )
    from kamu_engine_datafusion_spark.operators.sketches import (
        quantile_sketch,
        quantile_sketch_merge,
    )

    import random

    rng = random.Random(23)
    words = [f"tok{i}" for i in range(30)]

    def doc(i, dup_of=None):
        if dup_of is not None:
            base = list(dup_of.split())
            base[-1] = rng.choice(words)  # near-dup: one word changed
            return (i, " ".join(base))
        return (i, " ".join(rng.choice(words) for _ in range(12)))

    schema = "doc_id long, text string"
    base_rows = [doc(i) for i in range(10)]
    ticks, prev = [], base_rows
    nid = 100
    for _ in range(3):
        rows = []
        for _ in range(6):
            rows.append(doc(nid)); nid += 1
        # plant near-dups of earlier docs (cross-tick clusters)
        rows.append(doc(nid, dup_of=prev[0][1])); nid += 1
        rows.append(doc(nid, dup_of=base_rows[1][1])); nid += 1
        ticks.append(rows); prev = rows

    index = minhash_index(
        spark.createDataFrame(base_rows, schema), base_hash="poly"
    )
    comp_state, sketch_state, sample_state = None, None, None
    all_pairs, all_survivors = [], []
    for rows in ticks:
        inc = spark.createDataFrame(rows, schema)
        surv, new_rows, pairs = dedup_increment_against_index(
            inc, index, threshold=0.5, base_hash="poly", emit_pairs=True
        )
        surv = surv.select(
            "doc_id", "text",
            (F.col("doc_id") % 2).cast("string").alias("grp"),
            F.length("text").cast("long").alias("len"),
        ).localCheckpoint(eager=True)
        # winsorize THIS tick's survivors against the PRIOR sketch
        # state (the real increment ordering): rows always survive
        if sketch_state is not None:
            wz = winsorize_from_sketch(
                surv, sketch_state, "len", ["grp"], "doc_id"
            )
            assert wz.count() == surv.count()  # clamped, never dropped
        # fold every maintained state forward
        all_pairs += [(r["id_a"], r["id_b"]) for r in pairs.collect()]
        all_survivors += [tuple(r) for r in surv.collect()]
        comp_state = cc_increment(comp_state, pairs).localCheckpoint(
            eager=True
        )
        tick_sketch = quantile_sketch(surv, ["grp"], "doc_id", "len", k=16)
        sketch_state = (
            tick_sketch
            if sketch_state is None
            else quantile_sketch_merge([sketch_state, tick_sketch], ["grp"], 16)
        ).localCheckpoint(eager=True)
        tick_sample = weighted_sample_per_group(
            surv.select("grp", "doc_id", "len"), "len", "grp", n=5,
            key_col="doc_id", hash_fn="poly",
        ).localCheckpoint(eager=True)
        sample_state = (
            tick_sample
            if sample_state is None
            else weighted_sample_per_group(
                sample_state.unionByName(tick_sample), "len", "grp", n=5,
                key_col="doc_id", hash_fn="poly",
            )
        ).localCheckpoint(eager=True)
        index = index.unionByName(new_rows).localCheckpoint(eager=True)

    surv_schema = "doc_id long, text string, grp string, len long"
    full_surv = spark.createDataFrame(all_survivors, surv_schema)
    # 1. component state ≡ from-scratch closure of every pair emitted
    assert len(all_pairs) > 0, "fixture produced no near-dup pairs"
    got_cc = {r["node"]: r["component"] for r in comp_state.collect()}
    want_cc = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(all_pairs, "id_a long, id_b long")
        ).collect()
    }
    assert got_cc == want_cc
    # 2. sketch state ≡ batch sketch of all survivor lengths
    a = sorted(
        tuple(r[c] for c in sorted(sketch_state.columns))
        for r in sketch_state.collect()
    )
    full_sketch = quantile_sketch(full_surv, ["grp"], "doc_id", "len", k=16)
    b = sorted(
        tuple(r[c] for c in sorted(full_sketch.columns))
        for r in full_sketch.collect()
    )
    assert a == b and len(a) > 0
    # 3. sample state ≡ batch draw over all survivors
    got_s = sorted(
        (r["grp"], r["doc_id"], r["len"]) for r in sample_state.collect()
    )
    want_s = sorted(
        (r["grp"], r["doc_id"], r["len"])
        for r in weighted_sample_per_group(
            full_surv.select("grp", "doc_id", "len"), "len", "grp", n=5,
            key_col="doc_id", hash_fn="poly",
        ).collect()
    )
    assert got_s == want_s and len(got_s) > 0


def test_phash_increment_against_index(spark):
    """The image leg of the continuous-ingestion dedup path: an
    increment's pHashes probe the persisted chunk index (any match
    dies), dedup within itself lower-id-wins, survivors' chunk rows
    extend the index so the NEXT identical increment is fully dead —
    and the emitted pairs feed component state like the text path."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        phash_increment_against_index,
        phash_index,
    )

    def hx(v):
        return format(v, "016x")

    base = [(1, hx(0xDEADBEEF12345678)), (2, hx(0x0123456789ABCDEF))]
    index = phash_index(spark.createDataFrame(base, ["media_id", "phash"]))
    inc = [
        # Hamming 2 from indexed image 1 -> dies vs index
        (10, hx(0xDEADBEEF12345678 ^ (1 << 3) ^ (1 << 40))),
        # novel -> survives (random far fingerprint)
        (11, hx(0x5555AAAA33337777)),
        # two copies of each other (Hamming 1) -> lower id survives
        (12, hx(0x1111222233334444)),
        (13, hx(0x1111222233334444 ^ (1 << 63))),  # sign-bit corner
    ]
    survivors, new_rows, pairs = phash_increment_against_index(
        spark.createDataFrame(inc, ["media_id", "phash"]),
        index,
        emit_pairs=True,
    )
    assert sorted(r["media_id"] for r in survivors.collect()) == [11, 12]
    got_pairs = sorted(
        (r["id_a"], r["id_b"]) for r in pairs.collect()
    )
    assert got_pairs == [(1, 10), (12, 13)]
    # self-extending index: re-sending the increment kills everything
    index2 = index.unionByName(new_rows)
    survivors2, _ = phash_increment_against_index(
        spark.createDataFrame(
            [(20, inc[1][1]), (21, inc[2][1])], ["media_id", "phash"]
        ),
        index2,
    )
    assert survivors2.count() == 0
