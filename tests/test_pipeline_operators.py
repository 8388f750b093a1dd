"""Unit tests for the training-data pipeline operators (dedup,
similarity, text, multimodal, as-of) on small inline datasets with
known answers."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from kamu_engine_datafusion_spark.operators import dedup as D
from kamu_engine_datafusion_spark.operators import multimodal as M
from kamu_engine_datafusion_spark.operators import similarity as S
from kamu_engine_datafusion_spark.operators import text as X
from kamu_engine_datafusion_spark.operators.asof import asof_join


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "The  quick brown fox jumps over the lazy dog "),  # normalized dup
        (4, "the quick brown fox leaps over the lazy dog"),  # near dup (1 word)
        (5, "completely different content about spark engines and parquet"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_keeps_lowest_id(docs):
    out = D.exact_dedup(docs)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 4, 5]  # 2 and 3 are (normalized) duplicates of 1


def test_minhash_lsh_finds_near_dup(docs):
    pairs = D.minhash_lsh_candidates(docs, num_hashes=32, num_bands=16)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got  # identical docs always collide
    verified = D.verified_jaccard(docs, pairs)
    jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert jac[(1, 2)] == 1.0


def test_minhash_lsh_dedup_drops_exact_dup(docs):
    out = D.minhash_lsh_dedup(docs, threshold=0.99, num_hashes=32, num_bands=16)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert 1 in ids and 2 not in ids and 5 in ids


def test_simhash_identical_distance_zero(docs):
    pairs = D.simhash_near_dups(docs, max_hamming=0, block_bits=4)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got.get((1, 2)) == 0


def test_ngram_jaccard_pairs(docs):
    blocked = docs.withColumn("src", F.lit("crawl"))
    out = D.ngram_jaccard_pairs(blocked, block_cols="src", threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert got[(1, 2)] == 1.0
    # distinct tokens: 8 each ("the" dedupes); jumps/leaps differ -> 7/9
    assert got[(1, 4)] == pytest.approx(7 / 9)
    assert (1, 5) not in got


def test_ngram_jaccard_requires_blocking(docs):
    with pytest.raises(ValueError, match="requires block_cols"):
        D.ngram_jaccard_pairs(docs, threshold=0.5)


def test_ngram_jaccard_length_zones_lossless(spark):
    """The automatic length-zone key must not lose pairs at the length
    ratio admitted by the threshold (min/max = t exactly)."""
    a = " ".join(f"w{i}" for i in range(10))
    b = " ".join(f"w{i}" for i in range(20))  # superset, jaccard = 10/20
    rows = [(1, a, "x"), (2, b, "x")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "src"])
    out = D.ngram_jaccard_pairs(df, block_cols="src", threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert got[(1, 2)] == pytest.approx(0.5)


def test_paragraph_dedup(spark):
    rows = [
        (1, "intro text\n\nshared boilerplate\n\nunique one"),
        (2, "shared boilerplate\n\nunique two"),
        (3, "shared boilerplate"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["text"] for r in D.paragraph_dedup(df).collect()}
    # doc 1 owns the first occurrence of the boilerplate
    assert out[1] == "intro text\n\nshared boilerplate\n\nunique one"
    assert out[2] == "unique two"  # boilerplate removed
    assert out[3] == ""  # entirely duplicated -> empty but present


@pytest.fixture()
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),
        (2, [0.0, 1.0, 0.0], 0),
        (3, [1.0, 0.01, 0.0], 1),
        (4, [-1.0, 0.0, 0.0], 1),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_topk_bruteforce_order(vectors):
    q = vectors.filter(F.col("vec_id") == 0)
    out = S.topk_bruteforce(vectors, q, k=3)
    got = [r["vec_id"] for r in out.collect()]
    assert got[0] == 0  # self first (cosine 1.0)
    assert got[1] == 3  # closest other vector
    assert 4 not in got  # opposite direction is last


def test_embedding_near_dups_srp_candidates(vectors):
    out = D.embedding_near_dups(vectors, threshold=0.9, dim=3)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    # near-parallel vectors share an SRP band with overwhelming odds and
    # the planes are deterministic, so these are stable expectations
    assert (0, 3) in got  # cosine ~0.99995
    assert (3, 4) not in got  # cosine -1: verified away even if banded
    assert (2, 3) not in got and (2, 4) not in got  # orthogonal/anti


def test_semantic_dedup_drops_near_parallel(vectors):
    # seeds = 2 lowest ids (0, 1) -> vectors 0/1/3 cluster on seed 0,
    # 2 on seed 1 (closer to [0.9,0.1,0] than to [1,0,0]), 4 alone-ish;
    # within seed-0's cluster cos(0,3)~0.99995 >= 0.95 so 3 drops, and
    # cos(0,1)~0.994 so 1 drops; lower id survives
    out = D.semantic_dedup(vectors, threshold=0.95, num_seeds=2)
    got = sorted(r["vec_id"] for r in out.collect())
    assert 0 in got and 3 not in got
    assert got == sorted(set(got))  # no duplicated rows


def test_semantic_dedup_cluster_cap_drops_whole_cluster(vectors):
    # cap of 1 excludes every cluster with >=2 members from pairing ->
    # nothing is ever verified, nothing drops
    out = D.semantic_dedup(vectors, threshold=0.5, num_seeds=2, max_cluster_size=1)
    assert out.count() == vectors.count()


def test_semantic_dedup_custom_seeds(vectors):
    seeds = vectors.filter(F.col("vec_id").isin(2, 4))
    out = D.semantic_dedup(vectors, threshold=0.95, num_seeds=2, seeds=seeds)
    # clusters around [0,1,0] and [-1,0,0]: 0/3 both nearest seed 4
    # (cos 0 vs -1 ... seed 2 wins for 0: cos 0.0 vs -1.0 -> seed 2),
    # pairwise (0,3) still verified inside their shared cluster
    got = sorted(r["vec_id"] for r in out.collect())
    assert 3 not in got and 0 in got


def test_srp_lsh_self_in_bucket(vectors):
    q = vectors.filter(F.col("vec_id") == 0)
    out = S.srp_lsh_topk(vectors, q, k=3, bits=4)
    got = [r["vec_id"] for r in out.collect()]
    assert 0 in got  # query always lands in its own bucket


def test_language_id(spark):
    rows = [
        (1, "the cat and the dog of the house"),
        (2, "der Hund ist nicht mit der Katze"),
        (3, "el perro y la casa en un pueblo es grande"),
        (4, "xyzzy plugh"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["lang"] for r in
           df.select("doc_id", X.language_id("text").alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "und"}


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "Hello, world! spark rocks")], ["id", "text"])
    r = df.select(
        X.token_count("text").alias("ws"),
        X.bpe_ish_token_count("text").alias("bpe"),
    ).head()
    assert r["ws"] == 4
    # hell+o -> 2, comma 1, worl+d 2, bang 1, spar+k 2, rock+s 2 = 10
    assert r["bpe"] == 10


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha  beta"), (3, "alpha beta delta")],
        ["id", "text"],
    )
    fps = [r["fp"] for r in df.select(X.fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_quality_score_range(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "the cat and the dog was in the house for it is that"),
         (2, "!!! ??? ..)(%%%")],
        ["id", "text"],
    )
    got = {r["id"]: r["q"] for r in
           df.select("id", X.quality_score("text").alias("q")).collect()}
    assert 0.0 <= got[2] < 0.5 < got[1] <= 1.0


def test_multimodal_pipeline(spark):
    df = spark.createDataFrame([(1, "abcdefgh"), (2, "")], ["doc_id", "payload"])
    media = M.synthesize_media(df, "doc_id", "payload")
    decoded = M.decode_media(media)
    rows = {r["media_id"]: r for r in decoded.collect()}
    assert rows[1]["n_bytes"] == 8
    assert 64 <= rows[1]["width"] < 256 and 64 <= rows[1]["height"] < 256
    feats = M.byte_histogram_features(media, bins=8)
    f = {r["media_id"]: r["feat"] for r in feats.collect()}
    assert len(f[1]) == 8 and abs(sum(f[1]) - 1.0) < 1e-9
    assert sum(f[2]) == 0.0  # empty payload -> zero histogram
    frames = M.frame_sample(media, num_frames=4)
    fr = [r for r in frames.collect() if r["media_id"] == 1]
    assert len(fr) == 4 and all(r["frame_len"] == 2 for r in fr)
    resized = {r["media_id"]: r for r in M.resize_media(media, 4).collect()}
    assert bytes(resized[1]["content"]) == b"abcd"  # truncated
    assert bytes(resized[2]["content"]) == b"\x00" * 4  # zero-padded
    assert resized[1]["n_bytes"] == resized[2]["n_bytes"] == 4


def test_decode_media_codec_seam(spark):
    """decode_media dispatches on codec availability: use_real_codecs=True
    without pillow fails fast at plan time (not inside executors); the
    default resolves to the stub when pillow is absent."""
    import pytest

    df = spark.createDataFrame([(1, "abcdefgh")], ["doc_id", "payload"])
    media = M.synthesize_media(df, "doc_id", "payload")
    if not M.HAVE_IMAGE_CODEC:
        with pytest.raises(RuntimeError, match="pillow is not installed"):
            M.decode_media(media, use_real_codecs=True)
    # pinned stub and the auto default agree when pillow is absent
    stub = M.decode_media(media, use_real_codecs=False).collect()
    auto = M.decode_media(media).collect()
    if not M.HAVE_IMAGE_CODEC:
        assert stub == auto


def test_decode_media_real_codec():
    """Real-PIL decode path: valid images yield true dimensions, corrupt
    blobs degrade to null dims instead of failing the batch. Runs only
    where pillow exists (skipped in codec-less containers)."""
    import pytest

    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from kamu_engine_datafusion_spark.operators.multimodal import (
        _real_decode_dims,
    )

    buf = io.BytesIO()
    Image.new("RGB", (20, 10)).save(buf, format="PNG")
    assert _real_decode_dims(buf.getvalue()) == (20, 10)
    assert _real_decode_dims(b"not an image") == (None, None)


def test_asof_join_semantics(spark):
    ts = lambda s: datetime.fromisoformat(s)
    left = spark.createDataFrame(
        [(100, 1, ts("2023-01-01T10:00")), (101, 1, ts("2023-01-01T12:00")),
         (102, 2, ts("2023-01-01T09:00"))],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [(1, ts("2023-01-01T09:30"), 7), (1, ts("2023-01-01T11:00"), 8),
         (2, ts("2023-01-01T09:30"), 9)],
        ["user_id", "ts", "purchase_id"],
    )
    out = asof_join(left, right, ["user_id"], "ts", ["purchase_id"], how="inner")
    got = {r["event_id"]: r["right_purchase_id"] for r in out.collect()}
    # event 100 at 10:00 -> purchase 7 (09:30); event 101 at 12:00 -> 8 (11:00)
    # event 102 at 09:00 has no prior purchase -> dropped (inner)
    assert got == {100: 7, 101: 8}
    out_left = asof_join(left, right, ["user_id"], "ts", ["purchase_id"], how="left")
    got_left = {r["event_id"]: r["right_purchase_id"] for r in out_left.collect()}
    assert got_left == {100: 7, 101: 8, 102: None}


def test_asof_join_equal_ts_matches(spark):
    ts = lambda s: datetime.fromisoformat(s)
    left = spark.createDataFrame([(1, 1, ts("2023-01-01T10:00"))],
                                 ["event_id", "user_id", "ts"])
    right = spark.createDataFrame([(1, ts("2023-01-01T10:00"), 5)],
                                  ["user_id", "ts", "purchase_id"])
    out = asof_join(left, right, ["user_id"], "ts", ["purchase_id"])
    assert out.head()["right_purchase_id"] == 5  # <= semantics: tie matches


def test_simhash_pigeonhole_guaranteed_recall(spark):
    """With num_blocks=k, every pair within Hamming k-1 must be found
    even when the differing bits straddle the prefix a single-block scan
    uses — exhaustively checked against brute-force Hamming."""
    import itertools

    rows = [
        (i, " ".join(f"tok{j}" for j in range(40) if (i >> (j % 3)) % 2 == 0)
            + f" tail{i % 4}")
        for i in range(24)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_near_dups(
            docs, max_hamming=3, num_blocks=4
        ).collect()
    }
    # brute-force oracle: 64 single-bit chunks guarantee recall at any
    # radius <= 63, i.e. every pair is examined
    all_pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_near_dups(
            docs, max_hamming=63, num_blocks=64
        ).collect()
    }
    expected = {k: v for k, v in all_pairs.items() if v <= 3}
    assert got == expected
    with pytest.raises(ValueError, match="pigeonhole"):
        D.simhash_near_dups(docs, max_hamming=4, num_blocks=4)


def test_gopher_rules(spark):
    good = " ".join(f"word{i}" for i in range(60))
    short = "too short"
    symbols = " ".join("##" for _ in range(60))
    rows = [(1, good), (2, short), (3, symbols)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    rules = X.gopher_rules("text")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[v.alias(k) for k, v in rules.items()]
        ).collect()
    }
    assert out[1]["rule_word_count"] and out[1]["rule_alpha_words"]
    assert not out[2]["rule_word_count"]  # 2 words < 50
    assert not out[3]["rule_symbol_ratio"]  # all-symbol doc
    assert not out[3]["rule_alpha_words"]


def test_c4_line_filter(spark):
    text = "\n".join(
        [
            "This line is long enough and ends properly.",
            "short one.",                      # < 3 words? no: 2 words -> dropped
            "no terminal punctuation here",    # dropped (punct rule)
            "This references javascript libraries everywhere.",  # dropped
            "Braces { appear } in this line.",  # dropped
        ]
    )
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = df.select(X.c4_line_filter("text").alias("clean")).head()["clean"]
    assert out == "This line is long enough and ends properly."
    # punct rule off: the unpunctuated line also survives
    out2 = df.select(
        X.c4_line_filter("text", require_terminal_punct=False).alias("c")
    ).head()["c"]
    assert "no terminal punctuation here" in out2


def test_vocabulary_rank_deterministic(spark):
    df = spark.createDataFrame(
        [(0, "a b b c c c"), (1, "c d d a")], ["doc_id", "text"]
    )
    out = {r["token"]: (r["freq"], r["rank"]) for r in
           X.vocabulary(df, top_v=3).collect()}
    # freq: c=4, b=2, d=2, a=2 -> top3 keeps c then a,b by token order
    assert out["c"] == (4, 1)
    assert out["a"] == (2, 2) and out["b"] == (2, 3)
    assert "d" not in out


def test_oov_rate_counts_occurrences(spark):
    df = spark.createDataFrame([(0, "a a b zzz")], ["doc_id", "text"])
    vocab = spark.createDataFrame([("a",), ("b",)], ["token"])
    r = X.oov_rate(df, vocab).collect()[0]
    assert r["n_tokens"] == 4
    assert abs(r["oov_rate"] - 0.25) < 1e-9  # one OOV occurrence of four


def test_semantic_dedup_arrow_backend_matches_jvm(vectors):
    a = sorted(r["vec_id"] for r in D.semantic_dedup(
        vectors, threshold=0.95, num_seeds=2).collect())
    b = sorted(r["vec_id"] for r in D.semantic_dedup(
        vectors, threshold=0.95, num_seeds=2, cosine_backend="arrow").collect())
    assert a == b


def test_unigram_logprob_oov_floor(spark):
    import math

    df = spark.createDataFrame([(0, "a a zzz")], ["doc_id", "text"])
    vocab = spark.createDataFrame([("a", 8), ("b", 2)], ["token", "freq"])
    r = X.unigram_logprob(df, vocab).collect()[0]
    # total=10: two tokens at ln(0.8), one OOV at ln(0.05)
    want = (2 * math.log(0.8) + math.log(0.05)) / 3
    assert r["n_tokens"] == 3
    assert abs(r["mean_logprob"] - round(want, 4)) < 1e-9


def test_embedding_near_dups_arrow_backend(vectors):
    a = {(r["id_a"], r["id_b"]) for r in D.embedding_near_dups(
        vectors, threshold=0.9, dim=3).collect()}
    b = {(r["id_a"], r["id_b"]) for r in D.embedding_near_dups(
        vectors, threshold=0.9, dim=3, cosine_backend="arrow").collect()}
    assert a == b


def test_semantic_dedup_with_kmeans_centroid_seeds(spark):
    """seeds= accepts k-means centroids (the at-scale clustering route):
    build centroids via the IVF quantizer, feed them as a seeds frame."""
    import random

    from kamu_engine_datafusion_spark.operators.similarity import ivf_index

    rng = random.Random(7)
    rows = []
    for i in range(60):
        center = [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0]
        rows.append((i, [c + rng.uniform(-0.05, 0.05) for c in center], 0))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])

    _, model = ivf_index(emb, nlist=2)
    seeds = spark.createDataFrame(
        [(1000 + i, [float(x) for x in c], 0)
         for i, c in enumerate(model.clusterCenters())],
        ["vec_id", "embedding", "label"],
    )
    out = D.semantic_dedup(emb, threshold=0.995, num_seeds=2, seeds=seeds)
    n = out.count()
    # near-identical vectors inside each blob collapse; both blobs keep
    # at least a representative
    assert 2 <= n < 60


def test_chunk_documents_overlap(spark):
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    rows = sorted(
        X.chunk_documents(df, chunk_tokens=4, overlap_tokens=2).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # step 2: starts at tokens 1,3,5,7 -> 4 chunks (the window at 9
    # would be a pure subset of the one at 7 and is not emitted)
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[1]["chunk_text"] == "w2 w3 w4 w5"  # 2-token overlap
    assert rows[3]["chunk_text"] == "w6 w7 w8 w9"  # tail reaches the end


def test_percentile_gate_exact_cut(spark):
    from kamu_engine_datafusion_spark.operators.sampling import percentile_gate

    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(8)], ["k", "grp", "score"]
    )
    kept = sorted(r["k"] for r in
                  percentile_gate(df, "score", "k", "grp", 0.25).collect())
    assert kept == [2, 3, 4, 5, 6, 7]  # bottom floor(8*0.25)=2 dropped


def test_topk_batch_matches_single_query(vectors):
    batch = S.topk_batch(vectors, vectors.filter(F.col("vec_id") == 0), k=3)
    got = [r["vec_id"] for r in batch.orderBy("rank").collect()]
    single = [r["vec_id"] for r in
              S.topk_bruteforce(vectors, vectors.filter(F.col("vec_id") == 0),
                                k=3).collect()]
    assert got == single  # same ranking as the single-query baseline


def test_topk_batch_multiple_queries(vectors):
    out = S.topk_batch(vectors, vectors.filter(F.col("vec_id") < 2), k=2)
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1}
    for q, rows in by_q.items():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == [1, 2]
        # self is always rank 1 (cosine 1.0)
        assert min(rows, key=lambda r: r["rank"])["vec_id"] == q


def test_chunk_documents_no_subset_tail(spark):
    # 50 tokens, chunk 64, overlap 16 (step 48): the window at 49 adds
    # only tokens already inside chunk 0 -> must not be emitted
    text = " ".join(f"w{i}" for i in range(50))
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    rows = X.chunk_documents(df, chunk_tokens=64, overlap_tokens=16).collect()
    assert len(rows) == 1 and rows[0]["chunk_idx"] == 0
    # 70 tokens: window at 49 adds tokens 65-70 -> kept, idx stable at 1
    text2 = " ".join(f"w{i}" for i in range(70))
    df2 = spark.createDataFrame([(0, text2)], ["doc_id", "text"])
    idx = sorted(r["chunk_idx"] for r in
                 X.chunk_documents(df2, chunk_tokens=64, overlap_tokens=16).collect())
    assert idx == [0, 1]


def test_semantic_dedup_zero_seed_vector_is_inert(spark):
    rows = [
        (0, [0.0, 0.0, 0.0], 0),   # zero vector IS the lowest-id seed
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.99, 0.01, 0.0], 0),
        (3, [0.0, 1.0, 0.0], 0),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    for backend in ("jvm", "arrow"):
        got = sorted(r["vec_id"] for r in D.semantic_dedup(
            emb, threshold=0.9, num_seeds=2, cosine_backend=backend).collect())
        # 2 is a near-dup of 1 (same cluster); zero vector must not
        # swallow the corpus into one NaN cluster
        assert got == [0, 1, 3], backend


def test_topk_batch_zero_query_and_empty_queries(vectors):
    import pyspark.sql.functions as _F

    zq = vectors.sparkSession.createDataFrame(
        [(99, [0.0, 0.0, 0.0], 0)], ["vec_id", "embedding", "label"])
    out = S.topk_batch(vectors, zq, k=2).collect()
    assert len(out) == 2 and all(r["cosine"] == 0.0 for r in out)
    empty = S.topk_batch(vectors, vectors.filter(_F.col("vec_id") < 0), k=2)
    assert empty.count() == 0


def test_duplicate_spans_marks_second_occurrence(spark):
    # 12 shared tokens embedded at token 3 of doc 1 and token 1 of doc 2
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    rows = [
        (1, "x y " + shared + " tail1 tail2"),
        (2, shared + " something else entirely here now"),
        (3, "short doc"),  # shorter than min_len -> never appears
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in D.duplicate_spans(df, min_len=8).collect()
    }
    # doc 1 holds the canonical copy (smaller doc id) — only doc 2 marked.
    # windows 1..5 of doc 2 are the 8-gram starts inside the shared run:
    # tokens 1..12 form one maximal span.
    assert spans == {(2, 1, 12, 12)}


def test_duplicate_spans_intra_document(spark):
    eight = "a1 a2 a3 a4 a5 a6 a7 a8"
    df = spark.createDataFrame(
        [(7, eight + " filler1 filler2 filler3 filler4 filler5 filler6 "
          "filler7 filler8 " + eight)],
        ["doc_id", "text"],
    )
    spans = [
        (r.span_start, r.span_end)
        for r in D.duplicate_spans(df, min_len=8).collect()
    ]
    # the second copy lives at tokens 17..24; the first is canonical
    assert spans == [(17, 24)]


def test_remove_duplicate_spans_keeps_canonical(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    rows = [
        (1, "x y " + shared),
        (2, shared + " unique tail tokens"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.text for r in
           D.remove_duplicate_spans(df, min_len=8).collect()}
    assert out[1] == "x y " + shared  # canonical copy untouched
    assert out[2] == "unique tail tokens"  # span cut, remainder kept


def test_remove_common_lines_drops_all_occurrences(spark):
    rows = [
        (1, "unique one\nshared footer"),
        (2, "unique two\nshared footer"),
        (3, "unique three\nshared footer"),
        (4, "shared footer"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.text for r in
           D.remove_common_lines(df, min_docs=3).collect()}
    # the footer appears in 4 >= 3 docs: removed EVERYWHERE, no survivor
    assert out == {1: "unique one", 2: "unique two", 3: "unique three", 4: ""}


def test_remove_common_lines_below_threshold_survives(spark):
    rows = [
        (1, "only here\nrare line"),
        (2, "rare line\nother text"),
        (3, "nothing shared"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.text for r in
           D.remove_common_lines(df, min_docs=3).collect()}
    assert out[1] == "only here\nrare line"  # 2 docs < 3: kept
    assert out[2] == "rare line\nother text"


def test_perceptual_hash_stub_matches_reference_impl(spark):
    """The kernel's bit packing equals a straight python re-derivation
    of the stub pixel chain, including an all-ties payload."""
    import hashlib

    df = spark.createDataFrame(
        [(1, "abcdefgh"), (2, ""), (3, "hello world")], ["doc_id", "payload"]
    )
    media = M.synthesize_media(df, "doc_id", "payload")
    got = {
        r["media_id"]: r["phash"]
        for r in M.perceptual_hash(media, use_real_codecs=False).collect()
    }

    def expect(payload: str) -> str:
        d1 = hashlib.sha256(payload.encode()).digest()
        d2 = hashlib.sha256(d1.hex().encode()).digest()
        px = list(d1 + d2)
        mean = sum(px) / 64
        val = 0
        for i, p in enumerate(px):
            if p > mean:
                val |= 1 << i
        return format(val, "016x")

    for i, payload in [(1, "abcdefgh"), (2, ""), (3, "hello world")]:
        assert got[i] == expect(payload), i
        assert len(got[i]) == 16


def test_perceptual_hash_groups_exact_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "other")], ["doc_id", "payload"]
    )
    media = M.synthesize_media(df, "doc_id", "payload")
    h = {
        r["media_id"]: r["phash"]
        for r in M.perceptual_hash(media, use_real_codecs=False).collect()
    }
    assert h[1] == h[2] != h[3]


def test_phash_near_dups_recall_on_perturbed_corpus(spark):
    """phash_near_dups over a perturbed-fixture corpus: each base image
    gets a twin whose 64-bit hash differs in exactly d known bits; with
    num_blocks=4 every pair at Hamming <= 3 MUST be found (pigeonhole
    recall), pairs at Hamming 4 must not. Also pins the hex fingerprint
    parse (including a bit-63 twin, the signed-long corner)."""
    import random

    rng = random.Random(7)
    rows = []
    expected = set()
    for i in range(30):
        fp = rng.getrandbits(64)
        rows.append((i, format(fp, "016x")))
        d = i % 5  # twins at Hamming 0..4
        bits = rng.sample(range(64), d) if d else []
        if i == 7:  # force the signed-long corner: flip bit 63
            d, bits = 1, [63]
        tfp = fp
        for b in bits:
            tfp ^= 1 << b
        rows.append((1000 + i, format(tfp, "016x")))
        if d <= 3:
            expected.add((i, 1000 + i, d))
    media = spark.createDataFrame(rows, ["media_id", "phash"])
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in D.phash_near_dups(
            media, max_hamming=3, num_blocks=4
        ).collect()
    }
    # brute-force ground truth over ALL pairs (base fps are random
    # 64-bit, so cross pairs land at ~32 bits — but verify anyway)
    fps = {mid: int(h, 16) for mid, h in rows}
    brute = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for a in fps
        for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    assert got == brute
    assert expected <= got
    with pytest.raises(ValueError, match="pigeonhole"):
        D.phash_near_dups(media, max_hamming=4, num_blocks=4)


from hypothesis import HealthCheck, given, settings as _hsettings  # noqa: E402
from hypothesis import strategies as _hst  # noqa: E402


@_hsettings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fps=_hst.lists(
        _hst.integers(min_value=0, max_value=(1 << 64) - 1),
        min_size=2,
        max_size=40,
    ),
    num_blocks=_hst.integers(min_value=2, max_value=8),
)
def test_phash_near_dups_recall_property(spark, fps, num_blocks):
    """Pigeonhole recall law for ANY 64-bit fingerprints and ANY block
    count: the blocked pair set at max_hamming = num_blocks-1 equals
    the brute-force all-pairs scan — no pair within the radius can
    straddle every chunk."""
    max_h = num_blocks - 1
    rows = [(i, format(fp, "016x")) for i, fp in enumerate(fps)]
    media = spark.createDataFrame(rows, ["media_id", "phash"])
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in D.phash_near_dups(
            media, max_hamming=max_h, num_blocks=num_blocks
        ).collect()
    }
    vals = {mid: int(h, 16) for mid, h in rows}
    brute = {
        (a, b, bin(vals[a] ^ vals[b]).count("1"))
        for a in vals
        for b in vals
        if a < b and bin(vals[a] ^ vals[b]).count("1") <= max_h
    }
    assert got == brute
