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


def test_arrow_xxhash64_matches_spark(spark):
    """r16: the numpy xxhash64 (the arrow signature backend's base
    hash) must be BIT-EXACT with Spark's F.xxhash64 across every code
    path — empty, sub-word, word/4-byte/byte tails, the 32-byte
    stripe loop, and multi-byte UTF-8."""
    import random
    import string

    from pyspark.sql import functions as F

    from kamu_engine_datafusion_spark.functions.arrow_hash import (
        xxhash64_bytes,
    )

    rng = random.Random(1234)
    cases = [
        "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
        "abcdefghi", "abcdefghijk", "0123456789abcde",
        "x" * 31, "y" * 32, "z" * 33, "w" * 40, "v" * 63, "u" * 64,
        "t" * 65, "s" * 100,
        "héllo wörld ünïcode", "漢字テスト", "emoji 🙂 mixed",
    ]
    for _ in range(200):
        k = rng.randint(0, 80)
        cases.append(
            "".join(rng.choice(string.printable) for _ in range(k))
        )
    jvm = [
        r[0]
        for r in spark.createDataFrame([(c,) for c in cases], "t string")
        .select(F.xxhash64("t"))
        .collect()
    ]
    mine = xxhash64_bytes([c.encode("utf-8") for c in cases])
    assert [int(m) for m in mine] == jvm


def test_arrow_tokens_match_jvm(spark):
    """java_tokens must reproduce split(trim(lower(s)), '\\s+') with
    Java semantics: trim strips ALL chars <= U+0020 (a superset of
    regex \\s), \\s is the ASCII six, empty input yields ['']."""
    from pyspark.sql import functions as F

    from kamu_engine_datafusion_spark.functions.arrow_hash import (
        java_tokens,
    )
    from kamu_engine_datafusion_spark.functions.columns import tokens

    cases = [
        "", " ", "a", " a ", "a b", "  A  B\tC\n", "a\x0bb\x0cc\rd",
        "\x01ctrl\x02 padded\x1f", "Mixed CASE Words",
        "tab\t\ttab", "many   spaces   here",
        # non-ASCII casing parity (JVM default-locale toLowerCase vs
        # Python str.lower — must agree under this container's
        # root-equivalent locale; arrow_hash.java_tokens docstring
        # documents the tr_TR-style caveat):
        "Élan ÉLAN Über STRASSE Straße",
        "ΣΊΣΥΦΟΣ ὈΔΥΣΣΕΎΣ",  # Greek incl. final-sigma mapping
        "МОСКВА Москва ЇЖАК",  # Cyrillic
        "İstanbul I ı İ i",  # dotted/dotless I data (en locale)
        "ＦＵＬＬＷＩＤＴＨ　ＴＥＸＴ",  # fullwidth + ideographic space
        "日本語 テキスト 中文",  # CJK (no casing)
        "café CAFÉ ﬁ ﬂ",  # ligatures (lower is identity)
    ]
    jvm = [
        r["t"]
        for r in spark.createDataFrame([(c,) for c in cases], "s string")
        .select(tokens("s").alias("t"))
        .collect()
    ]
    assert [java_tokens(c) for c in cases] == [list(t) for t in jvm]


def test_minhash_arrow_layout_identical_and_dedup_equal(spark):
    """r16: the vectorized Arrow/numpy signature backend must produce
    the explode layout's EXACT signatures (same dropped null docs, same
    vectors — n=3 partial-shingle short docs included), and the full
    LSH dedup must return the identical survivor set under either
    backend on the real corpus slice."""
    from pyspark.sql import functions as F

    from kamu_engine_datafusion_spark.operators.dedup import (
        minhash_lsh_dedup,
        minhash_signatures,
        release_intermediates,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    edge = spark.createDataFrame(
        [
            (9001, None),
            (9002, ""),
            (9003, "word"),
            (9004, "two words"),
            (9005, "  padded   whitespace  "),
            (9006, "a\tb\nc"),
            (9007, "SHOUTED TEXT"),
            # non-space whitespace at the ends survives Spark's trim
            # (spaces only) and exposes empty edge tokens in the split
            (9008, "trailing tab\t"),
            (9009, "\nleading newline"),
            (9010, " \t mixed ends \n "),
        ],
        "doc_id long, text string",
    )
    d = docs.unionByName(edge)
    a = {
        r["__id"]: list(r["__sig"])
        for r in minhash_signatures(d, id_col="doc_id").collect()
    }
    b = {
        r["__id"]: list(r["__sig"])
        for r in minhash_signatures(
            d, id_col="doc_id", layout="arrow"
        ).collect()
    }
    assert a == b
    assert 9001 not in a  # null text dropped by both

    surv_jvm = sorted(
        r["doc_id"]
        for r in minhash_lsh_dedup(d, threshold=0.7).collect()
    )
    release_intermediates()
    surv_arrow = sorted(
        r["doc_id"]
        for r in minhash_lsh_dedup(
            d, threshold=0.7, signature_layout="arrow"
        ).collect()
    )
    release_intermediates()
    assert surv_jvm == surv_arrow

    # r17: the poly base hash has its own vectorized kernel — the
    # arrow layout must be BIT-EXACT with the JVM transform+poly fold
    # (incl. the <n-token whole-text shingle rule and null drop)
    a_poly = {
        r["__id"]: list(r["__sig"])
        for r in minhash_signatures(
            d, id_col="doc_id", base_hash="poly", layout="explode"
        ).collect()
    }
    b_poly = {
        r["__id"]: list(r["__sig"])
        for r in minhash_signatures(
            d, id_col="doc_id", base_hash="poly", layout="arrow"
        ).collect()
    }
    assert a_poly == b_poly
    # the poly/word_shingles profile KEEPS null-text docs (NULL behaves
    # like "": one empty shingle) — unlike the xxhash64 profile above
    assert 9001 in a_poly


def test_arrow_shingle_sets_match_jvm(spark):
    """r16: the vectorized shingle-set build (verified_jaccard's
    shingle_backend='arrow') must produce the exact distinct
    shingle-hash SET of array_distinct(shingle_hash_array(...)) per
    doc — order-insensitive (sets)."""
    from pyspark.sql import functions as F

    from kamu_engine_datafusion_spark.functions.arrow_hash import (
        shingle_hash_set_udf,
    )
    from kamu_engine_datafusion_spark.functions.columns import (
        shingle_hash_array,
        tokens,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    edge = spark.createDataFrame(
        [(9001, None), (9002, ""), (9003, "one"), (9004, "a b"),
         (9005, "x\ty\nz\t")],
        "doc_id long, text string",
    )
    d = docs.unionByName(edge)
    jvm = {
        r["doc_id"]: (
            sorted(r["s"]) if r["s"] is not None else None
        )
        for r in d.select(
            "doc_id",
            F.array_distinct(
                shingle_hash_array(tokens("text"), 3)
            ).alias("s"),
        ).collect()
    }
    arw = {
        r["doc_id"]: (
            sorted(r["s"]) if r["s"] is not None else None
        )
        for r in d.select(
            "doc_id", shingle_hash_set_udf(3)(F.col("text")).alias("s")
        ).collect()
    }
    assert jvm == arw


def test_word_shingle_set_arrow_matches_jvm(spark):
    """r17: the vectorized distinct word-shingle STRING sets (the poly
    profile's verified_jaccard build) equal
    array_distinct(word_shingles(tokens(text), n)) per doc — as sets
    (consumers are intersect/size), incl. null/empty/short docs."""
    from pyspark.sql import functions as F

    from kamu_engine_datafusion_spark.functions.arrow_hash import (
        word_shingle_set_udf,
    )
    from kamu_engine_datafusion_spark.functions.columns import (
        tokens,
        word_shingles,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    edge = spark.createDataFrame(
        [(9001, None), (9002, ""), (9003, "one"), (9004, "a b"),
         (9005, "x\ty\nz\t"), (9006, "  padded  words here  ")],
        "doc_id long, text string",
    )
    d = docs.unionByName(edge)
    for n in (3, 5):
        rows = d.select(
            "doc_id",
            F.array_distinct(
                word_shingles(tokens("text"), n)
            ).alias("jvm"),
            word_shingle_set_udf(n)(F.col("text")).alias("arrow"),
        ).collect()
        for r in rows:
            # NULL text yields [''] on BOTH paths (word_shingles's rule)
            assert r["jvm"] is not None and r["arrow"] is not None
            assert sorted(r["jvm"]) == sorted(r["arrow"]), r["doc_id"]


def test_span_scan_backend_twins(spark):
    """r17: the vectorized window-hash kernel (shingle_hash_array_udf)
    yields the exact duplicate_spans rows of the interpreted
    slice/zip_with form — incl. short docs (filtered), tail pads, and
    null text."""
    from pyspark.sql import functions as F

    from kamu_engine_datafusion_spark.operators import dedup as D2
    from kamu_engine_datafusion_spark.operators.dedup import (
        duplicate_spans,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    edge = spark.createDataFrame(
        [(9001, None), (9002, ""), (9003, "short doc"),
         (9004, " ".join(f"w{i % 5}" for i in range(60)))],
        "doc_id long, text string",
    )
    d = docs.unionByName(edge)

    def run():
        return sorted(
            map(tuple, duplicate_spans(d, min_len=8).collect())
        )

    arrow = run()
    old = D2._SPAN_SCAN_BACKEND
    D2._SPAN_SCAN_BACKEND = "jvm"
    try:
        jvm = run()
    finally:
        D2._SPAN_SCAN_BACKEND = old
    assert arrow == jvm and len(arrow) > 0


def test_embedding_near_dups_arrow_exact_bit_identical(spark):
    """r17: the ordered-fold float kernels (float_dot_ordered_udf /
    srp_band_keys_ordered_udf) must be BIT-identical to the jvm
    left-to-right folds — same band keys, same pairs, same 6dp
    cosines — on the real embeddings corpus."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        embedding_near_dups,
        release_intermediates,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )

    def run(backend):
        out = sorted(
            map(
                tuple,
                embedding_near_dups(
                    emb, threshold=0.3, dim=64, num_bands=8,
                    bits_per_band=4, cosine_backend=backend,
                    signature_backend=backend,
                ).collect(),
            )
        )
        release_intermediates()
        return out

    exact = run("arrow_exact")
    jvm = run("jvm")
    assert exact == jvm and len(exact) > 0


def test_semantic_dedup_arrow_exact_bit_identical(spark):
    """r17: semantic_dedup's arrow_exact backend (ordered-fold seed
    dots + pair dots) must keep the exact jvm survivor set — same
    assignments, same thresholded pairs."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        release_intermediates,
        semantic_dedup,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )

    def run(backend):
        out = sorted(
            r["vec_id"]
            for r in semantic_dedup(
                emb, threshold=0.35, num_seeds=16,
                cosine_backend=backend,
            ).collect()
        )
        release_intermediates()
        return out

    exact = run("arrow_exact")
    jvm = run("jvm")
    assert exact == jvm and 0 < len(exact) <= emb.count()
