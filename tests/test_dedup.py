"""MinHash signature layout equivalence (explode+groupBy vs zero-shuffle
in-row) — ``operators/dedup.py::minhash_signatures``."""



def test_minhash_signature_layouts_identical(spark):
    """The zero-shuffle in-row signature layout must produce exactly
    the explode+groupBy signatures for both hash backends — including
    dropping shingle-less docs the same way."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        minhash_signatures,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different text entirely here now"),
            (4, "too short"),  # < shingle_len tokens -> no shingles
            (5, ""),
            (6, None),
        ],
        "doc_id long, text string",
    )
    for bh in ("xxhash64", "poly"):
        a = {
            r["__id"]: list(r["__sig"])
            for r in minhash_signatures(df, base_hash=bh).collect()
        }
        b = {
            r["__id"]: list(r["__sig"])
            for r in minhash_signatures(
                df, base_hash=bh, layout="inrow"
            ).collect()
        }
        assert a == b  # identical ids AND identical signature vectors
        assert 1 in a and 2 in a and a[1] != a[2]


def test_minhash_inrow_layout_has_no_shuffle(spark):
    from kamu_engine_datafusion_spark.operators.dedup import (
        minhash_signatures,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    plan = (
        minhash_signatures(df, layout="inrow")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_dedup_cross_corpus_exact_overlap_and_nulls(spark):
    """Rows whose normalized text appears in the reference are dropped
    (case/whitespace-insensitively); null-text rows survive (no hash,
    no match); md5 and xxhash64 produce the SAME survivor set."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        dedup_cross_corpus,
    )

    ref = spark.createDataFrame(
        [(100, "Hello World"), (101, "released doc")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (0, "hello   world"),   # normalized dup of ref -> dropped
            (1, "fresh document"),
            (2, None),              # null text -> kept
            (3, "RELEASED DOC"),    # dup -> dropped
        ],
        "doc_id long, text string",
    )
    for hf in ("xxhash64", "md5"):
        kept = sorted(
            r["doc_id"]
            for r in dedup_cross_corpus(corpus, ref, hash_fn=hf).collect()
        )
        assert kept == [1, 2], hf
    # null text on BOTH sides must never cross-match in EITHER mode
    # (xxhash64(null) is a non-null constant — guarded to null)
    ref_n = spark.createDataFrame(
        [(100, "Hello World"), (101, None)], "doc_id long, text string"
    )
    for hf in ("xxhash64", "md5"):
        kept = sorted(
            r["doc_id"]
            for r in dedup_cross_corpus(corpus, ref_n, hash_fn=hf).collect()
        )
        assert kept == [1, 2, 3], hf  # doc 2 (null) survives both modes
    # broadcast form: same result, and the plan broadcasts the reference
    out = dedup_cross_corpus(corpus, ref, broadcast_reference=True)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_minhash_report_drop_set_matches_dedup(spark):
    """The audit report must explain EXACTLY the docs the dedup drops:
    dropped_id set == (corpus − survivors), matched_id is always a
    lower id, and jaccard ≥ threshold."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        minhash_lsh_dedup,
        minhash_lsh_report,
    )

    base = "some shared boilerplate text about spark shuffles and joins"
    rows = [(i, f"{base} variant {i % 3}") for i in range(12)]
    rows += [(100 + i, f"totally unique document {i} with fresh words {i*7}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(threshold=0.6, num_hashes=16, num_bands=4, max_bucket_size=None)
    survivors = {r["doc_id"] for r in minhash_lsh_dedup(df, **kw).collect()}
    report = minhash_lsh_report(df, **kw).collect()
    dropped = {r["dropped_id"] for r in report}
    assert dropped == {r[0] for r in rows} - survivors
    for r in report:
        assert r["matched_id"] < r["dropped_id"]
        assert r["jaccard"] >= 0.6


def test_cross_source_overlap_matrix(spark):
    """Known content sets → exact matrix: shared counts, per-side
    distinct totals (dup texts within a source count once), Jaccard,
    null texts excluded, non-overlapping pairs absent, and the md5 /
    xxhash64 profiles produce the identical matrix."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        cross_source_overlap,
    )

    rows = [
        # a: {t1, t2, t3}  b: {t2, t3, t4}  c: {t9}  (t2 dup'd in a;
        # whitespace/case variants must collapse; one null text)
        (1, "a", "alpha beta"),        # t1
        (2, "a", "Gamma  Delta"),      # t2
        (3, "a", "gamma delta"),       # t2 (dup within a)
        (4, "a", "epsilon"),           # t3
        (5, "b", "GAMMA DELTA"),       # t2
        (6, "b", "epsilon"),           # t3
        (7, "b", "zeta"),              # t4
        (8, "c", "omega"),             # t9
        (9, "c", None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    for hash_fn in ("md5", "xxhash64"):
        got = {
            (r["src_a"], r["src_b"]): r
            for r in cross_source_overlap(df, hash_fn=hash_fn).collect()
        }
        assert set(got) == {("a", "b")}
        r = got[("a", "b")]
        assert (r["n_shared"], r["n_a"], r["n_b"]) == (2, 3, 3)
        assert r["jaccard"] == 0.5  # 2 / (3 + 3 - 2)
