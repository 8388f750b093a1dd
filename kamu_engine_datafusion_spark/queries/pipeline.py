"""Beyond-parity training-data pipeline query entries (SURVEY.md §2's
north-star extensions): dedup, similarity search, text analysis,
multimodal plumbing, as-of join.

Oracle-checkable wherever DuckDB can express the same deterministic
computation — including the full LSH pipelines via SQL-reproducible
hashes (polynomial char folds for MinHash/SimHash, integer-LCG
hyperplanes for SRP, sha256-derived decode stubs for the multimodal
kernels). Only the engine-specific xxhash64 dedup variants and the
HLL/TDigest sketches are rows-only by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kamu_engine_datafusion_spark.operators import dedup as D
from kamu_engine_datafusion_spark.operators import multimodal as M
from kamu_engine_datafusion_spark.operators import similarity as S
from kamu_engine_datafusion_spark.operators import text as X
from kamu_engine_datafusion_spark.operators.asof import asof_join
from kamu_engine_datafusion_spark.queries._util import load

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


def q_xdedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (hash-groupBy on normalized content), survivors per lang."""
    t = load(spark, sf_dir, "documents")
    return (
        D.exact_dedup(t["documents"])
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_xdedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dedup SURVIVOR SET (xxhash64-based —
    deterministic but engine-specific → rows-only; survivor-set-sized
    so the driver's row count carries regression signal, not a 5-row
    per-lang rollup). r16: signatures ride the vectorized Arrow/numpy
    backend (``functions/arrow_hash.py``) — bit-identical to the
    explode formulation (equivalence pytest; survivor set unchanged),
    but off Spark's interpreted-HOF path, which was the bench's most
    expensive kernel and its one host-drift-sensitive subsystem
    (r13–r15 adjudications)."""
    t = load(spark, sf_dir, "documents")
    # fan_out="auto" (r17): the local test ledgers are SINGLE parquet
    # files, so the kernels would otherwise get one task; "auto"
    # derives the repartition width from the input size (guide §2 —
    # scale-adaptive, not a constant tuned for one box): sf0.1 resolves
    # to None (kernel cheaper than the shuffle — full dedup measured
    # 2.61→2.07 s vs the old fan_out=8), the 10× replica corpus to ~12
    # (where the 1-task kernel was the bottleneck), and a many-split
    # 100 TB scan to None (its splits already fan out).
    return D.minhash_lsh_dedup(
        t["documents"],
        threshold=0.7,
        signature_layout="arrow",
        signature_fan_out="auto",
    ).select("doc_id", "lang")


def q_xdedup_minhash_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable twin of the bench key ``xdedup_minhash`` (r18,
    VERDICT r17 item 2): the SAME full-corpus survivor-set pipeline —
    default 32 hashes / 8 bands / bucket-cap 200 (cap replayed by the
    oracle) / verified true-Jaccard ≥ 0.7 / lower-id-wins — with the
    SQL-replayable polynomial base hash instead of xxhash64, so the
    driver's DuckDB oracle hash-verifies the exact code path the bench
    key optimizes (arrow signature kernel, banding, cap, candidate
    join, string-shingle verification, survivor anti-join) at full
    corpus scale. The xxhash64 bench key itself stays rows-only —
    DuckDB cannot replay xxhash64."""
    t = load(spark, sf_dir, "documents")
    return D.minhash_lsh_dedup(
        t["documents"],
        threshold=0.7,
        base_hash="poly",
        signature_layout="arrow",
        signature_fan_out="auto",
    ).select("doc_id", "lang")


def q_xdedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup SURVIVOR SET, lower-id-wins (rows-only:
    engine-specific hashing; survivor-set-sized so the driver's row
    count carries regression signal instead of a single stats row)."""
    t = load(spark, sf_dir, "documents")
    pairs = D.simhash_near_dups(t["documents"], max_hamming=8)
    dead = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return (
        t["documents"]
        .join(dead, "doc_id", "left_anti")
        .select("doc_id", "lang")
    )


def q_xdedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard near-dup pairs, blocked by lang (oracle-checked
    against DuckDB list functions)."""
    t = load(spark, sf_dir, "documents")
    sub = t["documents"].filter(F.col("doc_id") < 400)
    return (
        D.ngram_jaccard_pairs(sub, block_cols="lang", threshold=0.55)
        .withColumn("jaccard", F.round("jaccard", 6))
    )


def q_xdedup_minhash_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL MinHash+LSH dedup pipeline with a SQL-expressible base
    hash (polynomial char fold) — signatures, banding, bucket join,
    Jaccard verification, and survivor selection all hash-verified
    against a DuckDB oracle built from the same coefficients."""
    t = load(spark, sf_dir, "documents")
    sub = t["documents"].filter(F.col("doc_id") < 300)
    return (
        D.minhash_lsh_dedup(
            sub,
            threshold=0.7,
            num_hashes=16,
            num_bands=4,
            max_bucket_size=None,
            base_hash="poly",
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_xdedup_simhash_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with the SQL-expressible 31-bit polynomial
    token hash — fingerprints, blocking, and Hamming verification all
    oracle-checked."""
    t = load(spark, sf_dir, "documents")
    sub = t["documents"].filter(F.col("doc_id") < 300)
    return D.simhash_near_dups(
        sub, max_hamming=10, block_bits=4, base_hash="poly"
    )


def q_xdedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide paragraph dedup (CCNet/Dolma-style): first global
    occurrence of each paragraph survives, documents reassembled.
    Testdata has no paragraph breaks, so ' the ' serves as the split
    token — arbitrary but identical in both engines."""
    t = load(spark, sf_dir, "documents")
    sub = t["documents"].filter(F.col("doc_id") < 300).select("doc_id", "text")
    return D.paragraph_dedup(sub, sep=" the ")


def q_xdedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level dedup: maximal duplicated token spans of
    ≥8 tokens whose content occurs earlier in the corpus — dedup of the
    repeated PASSAGE, not the document. Oracle re-derives the rolling
    8-gram first-occurrence rank and interval merge in SQL."""
    t = load(spark, sf_dir, "documents")
    sub = t["documents"].filter(F.col("doc_id") < 300)
    return D.duplicate_spans(sub, min_len=8)


def q_xdedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut duplicated ≥8-token spans from every document (canonical
    first occurrence survives) and reassemble the remaining tokens —
    whole cleaned text hash-verified against the oracle."""
    t = load(spark, sf_dir, "documents")
    sub = t["documents"].filter(F.col("doc_id") < 300).select("doc_id", "text")
    return D.remove_duplicate_spans(sub, min_len=8)


def q_xdedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate removal: every line occurring in ≥3
    distinct documents is dropped from ALL documents (no survivor,
    unlike paragraph dedup). ' the ' again stands in for the line
    separator the synthetic corpus lacks."""
    t = load(spark, sf_dir, "documents")
    sub = t["documents"].filter(F.col("doc_id") < 300).select("doc_id", "text")
    return D.remove_common_lines(sub, sep=" the ", min_docs=3)


def q_xdedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: nearest-of-16-seed clustering
    (deterministic lowest-id seeds) + within-cluster cosine pruning;
    survivors counted per label. The synthetic embeddings top out near
    cosine 0.51, so the demo prunes at 0.4 (production: 0.9+)."""
    t = load(spark, sf_dir, "embeddings")
    sub = t["embeddings"].filter(F.col("vec_id") < 2000)
    return (
        # arrow_exact: bit-identical to the jvm left-to-right float
        # arithmetic the oracle replays, at arrow speed (r17)
        D.semantic_dedup(
            sub, threshold=0.4, num_seeds=16,
            cosine_backend="arrow_exact",
        )
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )


def q_xdedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-level dedup: token-Jaccard pairs → connected components →
    one survivor per component; survivors per lang. Oracle: the same
    closure via DuckDB recursive CTE."""
    from kamu_engine_datafusion_spark.operators.clustering import (
        dedup_by_components,
    )

    t = load(spark, sf_dir, "documents")
    sub = t["documents"].filter(F.col("doc_id") < 300)
    pairs = D.ngram_jaccard_pairs(sub, block_cols="lang", threshold=0.6).select(
        "id_a", "id_b"
    )
    return (
        dedup_by_components(sub, pairs)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_xdedup_cc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental connected components
    (``operators/clustering.py::cc_increment``): the ``xdedup_cluster``
    token-Jaccard pair set arrives in THREE deterministic ticks
    (``(id_a + id_b) mod 3``) and each tick folds into the persisted
    ``(node, component)`` star forest by contracting the increment to
    current roots and closing only the increment-sized graph — never
    recomputing history. The oracle replays the FULL closure over all
    pairs as a recursive CTE, so a hash match proves incremental ≡
    from-scratch. Output: every clustered node with its component
    root."""
    from kamu_engine_datafusion_spark.operators.clustering import (
        cc_increment,
    )

    t = load(spark, sf_dir, "documents")
    sub = t["documents"].filter(F.col("doc_id") < 300)
    # The edge set is consumed by THREE tick filters — checkpoint the
    # (duplicate-density-bounded) pair frame so the token-Jaccard
    # pipeline runs once, not once per tick (r17; same device as the
    # per-tick state checkpoints below).
    pairs = (
        D.ngram_jaccard_pairs(sub, block_cols="lang", threshold=0.6)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    state = None
    for tick in range(3):
        inc = pairs.filter(
            F.pmod(F.col("id_a") + F.col("id_b"), F.lit(3)) == tick
        )
        state = cc_increment(state, inc).localCheckpoint(eager=False)
    return state.select("node", "component")


def q_xsnapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-changelog CDC: diff two derived states of ``orders``
    (drops, inserts, +1.0 price corrections) into ODF ops — appends for
    new-only keys, retracts for old-only, adjacent CorrectFrom/
    CorrectTo pairs for value changes
    (``operators/changelog.py::snapshot_diff``)."""
    from kamu_engine_datafusion_spark.operators.changelog import (
        snapshot_diff,
    )

    t = load(spark, sf_dir, "orders")
    od = t["orders"]
    old = od.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey", "o_totalprice"
    )
    new = od.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        (
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 3 == 0, 1.0).otherwise(0.0)
        ).alias("o_totalprice"),
    )
    return snapshot_diff(old, new, "o_orderkey")


def q_xdedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonicalization: same Jaccard components as
    ``xdedup_cluster`` but the survivor is the HIGHEST-n_chars member
    (ties → min id) — per-lang survivor counts with id_sum pinning the
    exact winner choice (``operators/clustering.py::canonical_by_score``).
    """
    from kamu_engine_datafusion_spark.operators.clustering import (
        canonical_by_score,
    )

    t = load(spark, sf_dir, "documents")
    sub = t["documents"].filter(F.col("doc_id") < 300)
    pairs = D.ngram_jaccard_pairs(sub, block_cols="lang", threshold=0.6).select(
        "id_a", "id_b"
    )
    return (
        canonical_by_score(sub, pairs, "n_chars")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
        )
    )


def q_xhybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 candidates fused with dense cosine top-50
    (query vec_id=0) by reciprocal rank fusion, k=60 — final top-10
    with both per-list ranks (``operators/retrieval.py::hybrid_rrf``)."""
    from kamu_engine_datafusion_spark.operators.retrieval import (
        bm25_scores,
        hybrid_rrf,
    )
    from kamu_engine_datafusion_spark.operators.similarity import (
        topk_bruteforce,
    )

    t = load(spark, sf_dir, "documents", "embeddings")
    sparse = bm25_scores(t["documents"], ["hash", "merge", "stream", "vector"])
    emb = t["embeddings"]
    dense = topk_bruteforce(
        emb, emb.filter(F.col("vec_id") == 0), k=50, dim=64
    ).withColumnRenamed("vec_id", "doc_id")
    return hybrid_rrf(sparse, dense, k_rrf=60, top_k=10)


def q_xdedup_embcos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via SRP-LSH banding (deterministic
    integer-LCG hyperplanes → the oracle reproduces the exact pipeline:
    same planes, same bands, same verified cosine)."""
    t = load(spark, sf_dir, "embeddings")
    sub = t["embeddings"].filter(F.col("vec_id") < 2000)
    # The synthetic embeddings top out near cosine 0.51, so the demo runs
    # at threshold 0.4 with a high-recall band layout (8 bands x 4 bits);
    # production near-dup thresholds (0.9+) use the operator defaults.
    # arrow_exact backends: this key is hash-verified against a DuckDB
    # oracle replaying the exact left-to-right double arithmetic — the
    # ordered-fold kernels reproduce that bit-for-bit at arrow speed
    # (r17; the plain "arrow" default is pair-set-identical but not
    # bit-identical in the 6dp-rounded cosine).
    return D.embedding_near_dups(
        sub, threshold=0.4, dim=64, num_bands=8, bits_per_band=4,
        cosine_backend="arrow_exact", signature_backend="arrow_exact",
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


def q_xsim_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for the vec_id=0 query vector (broadcast +
    TakeOrderedAndProject; the corpus never shuffles)."""
    t = load(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    return S.topk_bruteforce(emb, emb.filter(F.col("vec_id") == 0), k=10, dim=64)


def q_xsim_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch exact top-5 for five query vectors in ONE corpus pass
    (mapInPandas local top-k + tiny global rank window); ordering
    bridged across engines by 4dp cosine rounding + id tie-break."""
    t = load(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    return S.topk_batch(emb, emb.filter(F.col("vec_id") < 5), k=5)


def q_xsim_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (int8-range) quantization of the embedding corpus —
    per-dim min/max codebook from the FULL corpus, codes for the first
    100 vectors emitted as a CSV string so the integer code stream is
    hash-verified bit-for-bit (floor(x+0.5), never round: engines
    disagree on .5 ties)."""
    t = load(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    params = S.quantization_params(emb, dim=64)
    codes = S.quantize_embeddings(
        emb.filter(F.col("vec_id") < 100), params
    )
    return codes.select(
        "vec_id",
        F.array_join(
            F.transform(F.col("codes"), lambda c: c.cast("string")), ","
        ).alias("codes_csv"),
    )


def q_xsim_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric scalar-quantized ANN: rank by full-precision query ×
    dequantized corpus, exact-cosine re-rank of the top 40, final
    top-10 — codebook, codes, approximate ranking, and re-rank all
    replicated by the oracle."""
    t = load(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    return S.topk_quantized(
        emb, emb.filter(F.col("vec_id") == 0), k=10, rerank_factor=4, dim=64
    )


def q_xsim_srp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH bucketed ANN top-10 with integer-LCG hyperplanes — the
    DuckDB oracle replicates signatures, the bucket filter, and the
    exact re-rank, so the full ANN pipeline is hash-verified."""
    t = load(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    return S.srp_lsh_topk(
        emb,
        emb.filter(F.col("vec_id") == 0),
        k=10,
        bits=8,
        dim=64,
        plane_source="lcg",
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def q_xsim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (k-means inverted-file) ANN top-10 with nprobe = nlist —
    degenerates to exact search, so it IS oracle-checkable against the
    same brute-force SQL as xsim_topk_brute."""
    t = load(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    assigned, model = S.ivf_index(emb, nlist=8)
    return S.ivf_topk(
        assigned, model, emb.filter(F.col("vec_id") == 0), k=10, nprobe=8, dim=64
    )


def q_xtext_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language ID per document (r17: two-stage —
    the 4 stopword regexps count once, the arg-max runs on columns;
    the fused form carried 36 regexp nodes, see text.py)."""
    t = load(spark, sf_dir, "documents")
    return X.predict_language(
        t["documents"], "text", keep_cols=("doc_id", "lang")
    )


def q_xtext_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/punct/stopword/word-length signals.

    r17: two-stage projection — the expensive count signals (token
    split + five regexp scans) materialize ONCE in a first Project,
    the features/score derive from them as arithmetic in a second.
    The fused single-Project form re-evaluated every regexp per
    reference (10 regexp_extract_all nodes in the plan vs 5 now);
    measured 1.16→0.71s warm at sf0.1, output row-identical (same
    expressions over the same values — pytest-pinned)."""
    t = load(spark, sf_dir, "documents")
    sig = X.quality_signals("text")
    base = t["documents"].select(
        "doc_id",
        sig["n_chars"].alias("__n_chars"),
        sig["n_tokens"].alias("__n_tokens"),
        sig["n_punct"].alias("__n_punct"),
        sig["n_stop"].alias("__n_stop"),
    )
    f = X.quality_features_from_signals(
        {
            "n_chars": F.col("__n_chars"),
            "n_tokens": F.col("__n_tokens"),
            "n_punct": F.col("__n_punct"),
            "n_stop": F.col("__n_stop"),
        }
    )
    return base.select(
        "doc_id",
        f["n_chars"].cast("long").alias("n_chars"),
        f["n_tokens"].cast("long").alias("n_tokens"),
        F.round(f["punct_ratio"], 6).alias("punct_ratio"),
        F.round(f["stopword_ratio"], 6).alias("stopword_ratio"),
        X.quality_score_from_features(f).alias("quality"),
    )


def q_xtext_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace + BPE-ish regex."""
    t = load(spark, sf_dir, "documents")
    return t["documents"].select(
        "doc_id",
        X.token_count("text").alias("n_ws_tokens"),
        X.bpe_ish_token_count("text").alias("n_bpe_tokens"),
    )


def q_xtok_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang tokenizer fertility report (r9): subwords/word and
    bytes/subword from exact integer sums — the standard multilingual
    tokenizer eval (``operators/text.py::tokenizer_fertility``)."""
    t = load(spark, sf_dir, "documents")
    return X.tokenizer_fertility(t["documents"], ["lang"])


def q_xsample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-Res): top-200 by ln(u)/w with w = n_chars,
    keyed poly-hash uniform — the oracle reproduces the exact draw."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        weighted_sample,
    )

    t = load(spark, sf_dir, "documents")
    return weighted_sample(
        t["documents"], "n_chars", 200, hash_fn="poly"
    ).select("doc_id", "n_chars")


def q_xsample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified sampling: precisely ceil(30%) of each lang,
    membership pinned by the keyed poly hash; id_sum proves the exact
    row choice to the oracle."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        stratified_sample_exact,
    )

    t = load(spark, sf_dir, "documents")
    return (
        stratified_sample_exact(t["documents"], "doc_id", "lang", 0.3, hash_fn="poly")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
        )
    )


def q_xpack_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed-batch manifest (r9): per DOC chunk assignment + the
    within-chunk start offset a training loader lays token spans with
    (``operators/sampling.py::pack_layout`` — same window as
    pack_sequences, start = running offset − chunk·budget)."""
    from kamu_engine_datafusion_spark.operators.sampling import pack_layout

    t = load(spark, sf_dir, "documents")
    d = t["documents"].withColumn(
        "__cost", X.token_count("text").cast("long")
    )
    return pack_layout(
        d, "doc_id", "__cost", budget=512, part_col="lang", shards=4,
        hash_fn="poly", eager_guard=True,
    ).select(
        "lang", "shard", "chunk", "doc_id",
        "start", F.col("__cost").alias("length"),
    )


def q_xpack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: whitespace-token costs, 2048-token chunks per
    (lang, shard) by running-offset assignment; per-chunk doc and token
    totals. Sharded (r8): 8 id-keyed sub-shards per lang bound the
    window sort — at corpus scale one lang is otherwise one task — with
    the poly hash so the oracle reproduces the shard assignment.

    Caveat (r8 advice): the operator's ``max_group_rows`` loud-fail
    guard rides the ``chunk`` expression, so a downstream plan that
    never evaluates ``chunk`` skips the check; this query (and any
    caller aggregating chunk) evaluates it on every row."""
    from kamu_engine_datafusion_spark.operators.sampling import pack_sequences

    t = load(spark, sf_dir, "documents")
    d = t["documents"].withColumn("__cost", X.token_count("text"))
    return (
        pack_sequences(
            d, "doc_id", "__cost", budget=2048, part_col="lang",
            shards=8, hash_fn="poly", eager_guard=True,
        )
        .groupBy("lang", "shard", "chunk")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__cost").alias("n_tokens"),
        )
    )


def q_xupsample_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional deterministic upsampling (epoch mixing): per-lang
    repeat factors {en: 2.4, de: 1.5, fr: 0.5}, the extra fractional
    copy chosen by keyed poly-hash — per-(lang, epoch) counts with
    id_sum pinning the exact membership
    (``operators/sampling.py::upsample_repeat``)."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        upsample_repeat,
    )

    t = load(spark, sf_dir, "documents")
    up = upsample_repeat(
        t["documents"],
        "doc_id",
        {"en": 2.4, "de": 1.5, "fr": 0.5},
        stratum_col="lang",
        hash_fn="poly",
    )
    return up.groupBy("lang", "epoch").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
    )


def q_xlength_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching: token costs binned against explicit
    boundaries [32, 64, 128, 256, 512]; per-bucket doc and token
    totals — the padding-waste planner for dynamic batching
    (``operators/sampling.py::length_buckets``)."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        length_buckets,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"].withColumn("__cost", X.token_count("text"))
    return (
        length_buckets(d, "__cost", [32, 64, 128, 256, 512])
        .groupBy("bucket", "bucket_lo", "bucket_hi")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__cost").alias("n_tokens"),
        )
    )


def q_xinterleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture scheduling: stride-interleave the langs at
    weights en=3, de=1, fr=0 (dropped), others 1 into a single global
    training order — every rank value hash-verified
    (``operators/sampling.py::interleave_sources``)."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        interleave_sources,
    )

    t = load(spark, sf_dir, "documents")
    out = interleave_sources(
        t["documents"],
        "doc_id",
        "lang",
        {"en": 3.0, "de": 1.0, "fr": 0.0},
        hash_fn="poly",
    )
    return out.select("doc_id", "lang", "interleave_rank")


def q_xinterleave_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed twin of ``xinterleave``: the same stride schedule
    computed with ZERO window functions — per-source ranks via the
    two-pass group-rank assignment, global order via repartitionByRange
    + A13 offsets — so the 100 TB path (no partitionBy-less Window, no
    single-task sort) is itself driver-hash-verified against the
    serial oracle (``operators/sampling.py::interleave_sources``)."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        interleave_sources,
    )

    t = load(spark, sf_dir, "documents")
    out = interleave_sources(
        t["documents"],
        "doc_id",
        "lang",
        {"en": 3.0, "de": 1.0, "fr": 0.0},
        hash_fn="poly",
        mode="distributed",
    )
    return out.select("doc_id", "lang", "interleave_rank")


def q_xledger_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ledger compaction with a retention horizon (max-offset/2):
    pre-horizon records collapse to latest-per-key incl. tombstones,
    post-horizon preserved verbatim — summarized per op as (rows,
    offset-sum, distinct keys) so the kept record SET is pinned
    (``operators/snapshot.py::compact_ledger``)."""
    from kamu_engine_datafusion_spark.operators.snapshot import (
        compact_ledger,
    )

    t = load(spark, sf_dir, "events")
    ledger = t["events"].select(
        F.col("event_id").alias("offset"),
        (F.col("event_id") % 4).cast("int").alias("op"),
        "user_id",
    )
    mx = ledger.agg(F.max("offset")).collect()[0][0]
    comp = compact_ledger(ledger, "user_id", int(mx) // 2)
    return (
        comp.groupBy("op")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("offset").alias("off_sum"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            "op",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("off_sum").cast("long").alias("off_sum"),
            F.col("n_users").cast("long").alias("n_users"),
        )
    )


def q_xsample_weighted_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group weighted sampling without replacement: top-50 A-Res
    reservoir keys per lang, weight = n_chars — every language
    contributes a quality-weighted sample instead of the global draw
    being swallowed by the heaviest one
    (``operators/sampling.py::weighted_sample_per_group``)."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    t = load(spark, sf_dir, "documents")
    out = weighted_sample_per_group(
        t["documents"], "n_chars", "lang", n=50, hash_fn="poly"
    )
    return out.select("doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"))


def q_xtext_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-boundary truncation to a 25-token context budget; the
    truncated CONTENT is pinned by md5 so the slice boundary itself is
    hash-verified (``operators/text.py::truncate_tokens``)."""
    from kamu_engine_datafusion_spark.operators.text import truncate_tokens

    t = load(spark, sf_dir, "documents")
    out = truncate_tokens(t["documents"], max_tokens=25)
    return out.select(
        "doc_id",
        "n_tokens_kept",
        "was_truncated",
        F.md5(F.col("text_trunc")).alias("trunc_md5"),
    )


def q_xcorpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus data card: docs, tokens, length
    profile, exact duplicate rate via md5 content hashes
    (``operators/text.py::corpus_card``)."""
    t = load(spark, sf_dir, "documents")
    return X.corpus_card(t["documents"])


def q_xsource_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source content-overlap matrix (r9): shared distinct
    normalized texts, per-side totals, and content-set Jaccard for
    every source pair — the provenance-leakage audit
    (``operators/dedup.py::cross_source_overlap``, md5 twin). The
    testdata's sources share no text verbatim, so a deterministic
    'mirror' source re-hosting every 7th doc is unioned in — the
    audit's canonical positive case — keeping the matrix non-vacuous."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        cross_source_overlap,
    )

    t = load(spark, sf_dir, "documents")
    docs = t["documents"].select("doc_id", "text", "source")
    mirror = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .withColumn("source", F.lit("mirror"))
    )
    return cross_source_overlap(
        docs.unionByName(mirror), "source", hash_fn="md5"
    )


def q_xdedup_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus exact dedup: docs ≥200 whose normalized content
    hash appears in the doc_id<200 'released benchmark' slice are
    dropped (md5 twin — plain-SQL reproducible; the xxhash64 default
    produces the identical survivor set)
    (``operators/dedup.py::dedup_cross_corpus``)."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        dedup_cross_corpus,
    )

    t = load(spark, sf_dir, "documents")
    docs = t["documents"]
    ref = docs.filter(F.col("doc_id") < 200)
    out = dedup_cross_corpus(
        docs.filter(F.col("doc_id") >= 200), ref, hash_fn="md5",
        broadcast_reference=True,
    )
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )


def q_xvocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction: top-20 tokens by frequency with a
    deterministic (freq desc, token asc) rank."""
    t = load(spark, sf_dir, "documents")
    return X.vocabulary(t["documents"], top_v=20)


def q_xvocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OOV coverage: per-lang average out-of-vocabulary rate against the
    induced top-20 vocabulary (broadcast join on the exploded corpus)."""
    t = load(spark, sf_dir, "documents")
    docs = t["documents"]
    rates = X.oov_rate(docs, X.vocabulary(docs, top_v=20))
    return (
        rates.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("oov_rate"), 4).alias("avg_oov"),
        )
    )


def q_xscd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals from the synthetic retractable ledger
    (same construction as xsnapshot): one row per live record with
    valid_from/valid_to event times and the is_current flag."""
    from kamu_engine_datafusion_spark.operators.snapshot import history_intervals

    t = load(spark, sf_dir, "events")
    ledger = t["events"].filter(F.col("user_id") < 200).select(
        F.col("event_id").alias("offset"),
        (F.col("event_id") % 4).cast("int").alias("op"),
        F.col("ts").alias("event_time"),
        "user_id",
        "event_type",
        "value",
    )
    h = history_intervals(ledger, "user_id")
    return h.select(
        F.col("offset").alias("off"),
        "user_id",
        "event_type",
        F.round("value", 2).alias("value"),
        F.unix_micros(F.col("valid_from").cast("timestamp")).alias("valid_from_us"),
        F.unix_micros(F.col("valid_to").cast("timestamp")).alias("valid_to_us"),
        "is_current",
    )


def q_xlm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram log-probability quality scoring against the induced
    top-10 vocabulary (OOV floored): the LM-perplexity-filter proxy."""
    t = load(spark, sf_dir, "documents")
    docs = t["documents"]
    return X.unigram_logprob(docs, X.vocabulary(docs, top_v=10))


def q_xdecontaminate_13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval decontamination at the industry-standard n=13: a corpus doc
    is contaminated if it shares ANY 13-gram with the benchmark
    (GPT-3/PaLM-style exact-substring rule)."""
    from kamu_engine_datafusion_spark.operators.decontaminate import (
        flag_contaminated,
    )

    t = load(spark, sf_dir, "documents")
    corpus = t["documents"].filter(F.col("doc_id") < 400)
    bench = t["documents"].filter(F.col("doc_id") >= 450)
    return flag_contaminated(corpus, bench, shingle_len=13, threshold=1)


def q_xdecontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (near-duplicate) decontamination: MinHash-estimated
    shingle Jaccard between corpus (100-399) and benchmark (<100) docs,
    banded LSH probe with the benchmark broadcast — catches the
    paraphrased leakage exact n-gram rules miss. Poly base hash so the
    ENTIRE pipeline (signatures, band folds, probe join, agreement
    estimate) is oracle-replicated."""
    from kamu_engine_datafusion_spark.operators.decontaminate import (
        fuzzy_flag_contaminated,
    )

    t = load(spark, sf_dir, "documents")
    corpus = t["documents"].filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 400)
    )
    bench = t["documents"].filter(F.col("doc_id") < 100)
    return fuzzy_flag_contaminated(
        corpus, bench, threshold=0.5, num_hashes=16, num_bands=4,
        base_hash="poly",
    )


def q_xchunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token chunks, 16 overlap):
    per-chunk token count and md5 of the chunk text."""
    t = load(spark, sf_dir, "documents")
    chunks = X.chunk_documents(
        t["documents"], chunk_tokens=64, overlap_tokens=16
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "n_chunk_tokens",
        F.md5("chunk_text").alias("chunk_md5"),
    )


def q_xquality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile quality gate: drop the bottom 25% of each lang by
    (n_chars, doc_id); membership pinned via id_sum."""
    from kamu_engine_datafusion_spark.operators.sampling import percentile_gate

    t = load(spark, sf_dir, "documents")
    kept = percentile_gate(t["documents"], "n_chars", "doc_id", "lang", 0.25)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("id_sum"),
        F.min("n_chars").alias("min_chars"),
    )


def q_xdecontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs < 400 form the corpus, docs >= 450
    the 'benchmark'; count shared 3-gram shingles per corpus doc."""
    from kamu_engine_datafusion_spark.operators.decontaminate import (
        flag_contaminated,
    )

    t = load(spark, sf_dir, "documents")
    corpus = t["documents"].filter(F.col("doc_id") < 400)
    bench = t["documents"].filter(F.col("doc_id") >= 450)
    return flag_contaminated(corpus, bench, shingle_len=3, threshold=3)


def q_xtext_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition ratio (1 - distinct/total 3-gram
    shingles) — the boilerplate/looping-generation quality signal."""
    t = load(spark, sf_dir, "documents")
    return t["documents"].select(
        "doc_id", X.repetition_ratio("text", n=3).alias("rep_ratio")
    )


def q_xtext_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: emails/IPs/phones replaced with typed tokens. The
    corpus has no PII, so both engines synthesize identical PII-bearing
    strings and redact them."""
    t = load(spark, sf_dir, "documents")
    synth = F.concat(
        F.substring("text", 1, 20),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com at 192.168.0."),
        (F.col("doc_id") % 255).cast("string"),
        F.lit(" or +1 (555) 123-4567"),
    )
    return t["documents"].select(
        "doc_id", X.redact_pii(synth).alias("redacted")
    )


def q_xtext_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint (md5 of sorted token set)."""
    t = load(spark, sf_dir, "documents")
    return t["documents"].select(
        "doc_id", X.fingerprint("text").alias("fp")
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (rows-only: binary kernels)
# ---------------------------------------------------------------------------


def q_xmm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media decode plumbing via mapInPandas. Pinned to the stub
    kernel: the oracle re-derives its sha256 arithmetic in SQL, which
    must stay valid even in environments where pillow is installed."""
    t = load(spark, sf_dir, "documents")
    media = M.synthesize_media(t["documents"], "doc_id", "text")
    return M.decode_media(media, use_real_codecs=False)


def q_xmm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-histogram feature extraction over media binaries. The
    payloads are deterministic UTF-8 bytes, so the oracle re-derives
    bin 6 (bytes 96-111 — where most lowercase text lands) by counting
    hex pairs — the Python kernel's output is value-verified, not just
    row-counted."""
    t = load(spark, sf_dir, "documents")
    media = M.synthesize_media(t["documents"].filter(F.col("doc_id") < 300), "doc_id", "text")
    feats = M.byte_histogram_features(media)
    return feats.select(
        "media_id",
        F.size("feat").cast("long").alias("n_bins"),
        F.round(F.aggregate("feat", F.lit(0.0), lambda a, x: a + x), 4).alias(
            "feat_sum"
        ),
        F.round(F.element_at("feat", 7), 6).alias("feat_bin6"),
    )


def q_xmm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one row per sampled byte-slice per media blob."""
    t = load(spark, sf_dir, "documents")
    media = M.synthesize_media(t["documents"].filter(F.col("doc_id") < 300), "doc_id", "text")
    return M.frame_sample(media, num_frames=4).select(
        "media_id", "frame_no", "frame_len"
    )


# ---------------------------------------------------------------------------
# As-of join (B15 beyond-parity)
# ---------------------------------------------------------------------------


def q_xasof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click event matched to the user's most recent
    purchase at-or-before it (union + carried-forward window — one
    shuffle, no range blow-up)."""
    t = load(spark, sf_dir, "events")
    ev = t["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    # dedupe purchases per (user, ts) so ties are deterministic in both engines
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_event_id"))
    )
    joined = asof_join(
        clicks,
        purchases,
        key_cols=["user_id"],
        ts_col="ts",
        right_value_cols=["purchase_event_id"],
        how="inner",
    )
    return joined.select(
        "event_id", "user_id", F.col("right_purchase_event_id").alias("purchase_event_id")
    )


def q_xsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keyed sampling (~30% of documents via the
    SQL-expressible poly hash), counted per lang."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        deterministic_sample,
    )

    t = load(spark, sf_dir, "documents")
    return (
        deterministic_sample(t["documents"], "doc_id", 0.3, hash_fn="poly")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_xsample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced language sampling (alpha=0.5, target 40%):
    high-resource langs downsampled toward uniform, membership pinned by
    the keyed poly hash; id_sum proves exact row choice."""
    from kamu_engine_datafusion_spark.operators.sampling import temperature_sample

    t = load(spark, sf_dir, "documents")
    return (
        temperature_sample(
            t["documents"], "doc_id", "lang", alpha=0.5,
            target_fraction=0.4, hash_fn="poly",
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
        )
    )


def q_xcap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (RefinedWeb-style anti-dominance): at most
    15 docs per source, chosen by keyed-hash order."""
    from kamu_engine_datafusion_spark.operators.sampling import cap_per_group

    t = load(spark, sf_dir, "documents")
    return (
        cap_per_group(t["documents"], "doc_id", "source", cap=15, hash_fn="poly")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
        )
    )


def q_xshuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: dense rank in keyed
    poly-hash order over docs < 500, via the DISTRIBUTED (TeraSort +
    two-pass offsets) path — the oracle pins every rank value."""
    from kamu_engine_datafusion_spark.operators.sampling import shuffle_rank

    t = load(spark, sf_dir, "documents")
    sub = t["documents"].filter(F.col("doc_id") < 500)
    return shuffle_rank(sub, "doc_id", hash_fn="poly").select(
        "doc_id", "shuffle_rank"
    )


def q_xsplit_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe split: whole SOURCES land train- or holdout-side
    (25% of source hash space); per-side doc counts + id_sum +
    distinct-source counts prove no source straddles the boundary."""
    from kamu_engine_datafusion_spark.operators.sampling import split_by_group

    t = load(spark, sf_dir, "documents")
    train, hold = split_by_group(
        t["documents"], "source", holdout_fraction=0.25, hash_fn="poly"
    )
    tagged = train.withColumn("side", F.lit("train")).unionByName(
        hold.withColumn("side", F.lit("holdout"))
    )
    return tagged.groupBy("side").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
        F.countDistinct("source").alias("n_sources"),
    )


#: Mixture weights for xmix_budget: exactly normalized (4 × 0.25); 'es'
#: is deliberately absent → dropped from the mix.
_MIX_WEIGHTS = {"en": 0.25, "de": 0.25, "fr": 0.25, "zh": 0.25}


def q_xmix_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture sampling: each listed lang targets 25% of a
    20k-token budget; under-resourced langs cap at 100% (never
    duplicated), 'es' is dropped. id_sum pins exact membership."""
    from kamu_engine_datafusion_spark.operators.sampling import mix_to_budget

    t = load(spark, sf_dir, "documents")
    d = t["documents"].withColumn(
        "__cost", X.token_count("text").cast("long")
    )
    return (
        mix_to_budget(
            d, "doc_id", "lang", "__cost", _MIX_WEIGHTS, budget=20_000,
            hash_fn="poly",
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
            F.sum("__cost").alias("n_tokens"),
        )
    )


def q_xpipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship END-TO-END training-data pipeline, fully oracle-checked
    through all four stages: token-length quality filter → exact dedup
    (lowest-id survivor per normalized text) → temperature-balanced
    language sampling (alpha=0.5, target 60%, computed over the
    POST-dedup corpus) → 2048-token sequence packing per lang. Output
    is per (lang, chunk) doc/token totals with id_sum pinning exact
    end-to-end membership.

    Scale shape: stage 1 is a scan predicate; stage 2 one content-hash
    shuffle; stage 3 a tiny count agg + broadcast cuts (no corpus
    shuffle); stage 4 one lang-keyed window exchange."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        pack_sequences,
        temperature_sample,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"].withColumn("__cost", X.token_count("text").cast("long"))
    d = d.filter((F.col("__cost") >= 15) & (F.col("__cost") <= 1000))
    d = D.exact_dedup(d)
    d = temperature_sample(
        d, "doc_id", "lang", alpha=0.5, target_fraction=0.6, hash_fn="poly"
    )
    packed = pack_sequences(
        d, "doc_id", "__cost", budget=2048, part_col="lang",
        shards=4, hash_fn="poly",
    )
    return packed.groupBy("lang", "shard", "chunk").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__cost").alias("n_tokens"),
        F.sum("doc_id").alias("id_sum"),
    )


def q_xpipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7 END-TO-END curation pipeline, fully oracle-checked
    through all four stages: cross-corpus exact dedup against the
    doc_id<200 'released benchmark' slice → token-boundary truncation
    to 64 tokens → minimum-length quality gate (≥10 kept tokens) →
    512-token sequence packing per lang. Output is per (lang, chunk)
    doc/token totals with id_sum pinning exact end-to-end membership.

    Scale shape: stage 1 broadcasts the benchmark hashes (no corpus
    shuffle); stages 2-3 are in-row column math at scan speed; stage 4
    one lang-keyed window exchange."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        dedup_cross_corpus,
    )
    from kamu_engine_datafusion_spark.operators.sampling import (
        pack_sequences,
    )
    from kamu_engine_datafusion_spark.operators.text import truncate_tokens

    t = load(spark, sf_dir, "documents")
    docs = t["documents"]
    ref = docs.filter(F.col("doc_id") < 200)
    d = dedup_cross_corpus(
        docs.filter(F.col("doc_id") >= 200), ref, hash_fn="md5",
        broadcast_reference=True,
    )
    d = truncate_tokens(d, max_tokens=64)
    d = d.filter(F.col("n_tokens_kept") >= 10)
    packed = pack_sequences(
        d, "doc_id", "n_tokens_kept", budget=512, part_col="lang",
        shards=4, hash_fn="poly",
    )
    return packed.groupBy("lang", "shard", "chunk").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens_kept").cast("long").alias("n_tokens"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )



def q_xdebounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst dedup / debounce: collapse events arriving within 600s of
    the previous event in the same (user, type) stream — retry storms
    and duplicate beacons become one logical event
    (``operators/funnel.py::debounce_events``)."""
    from kamu_engine_datafusion_spark.operators.funnel import (
        debounce_events,
    )

    t = load(spark, sf_dir, "events")
    ev = t["events"].filter(F.col("user_id") < 200)
    out = debounce_events(
        ev, "ts", gap_seconds=600.0, group_cols=["user_id", "event_type"]
    )
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("event_id").cast("long").alias("id_sum"),
    )



def q_xlangid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation: confusion matrix of the stopword langid
    against the labeled ``lang`` column — per-(label, predicted)
    counts + half-up row rates; the diagonal is per-class recall
    (``operators/profile.py::confusion_matrix``)."""
    from kamu_engine_datafusion_spark.operators.profile import (
        confusion_matrix,
    )

    t = load(spark, sf_dir, "documents")
    preds = X.predict_language(t["documents"], "text", keep_cols=("lang",))
    return confusion_matrix(preds, "lang", "pred_lang")



def q_xdedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup AUDIT report (poly twin): per dropped doc, the lowest-id
    matching partner + verified Jaccard — the drop-reason table a
    curation pipeline ships for review; the dropped-id set equals the
    xdedup_minhash_sql removal set exactly
    (``operators/dedup.py::minhash_lsh_report``)."""
    t = load(spark, sf_dir, "documents")
    sub = t["documents"].filter(F.col("doc_id") < 300)
    return D.minhash_lsh_report(
        sub,
        threshold=0.7,
        num_hashes=16,
        num_bands=4,
        max_bucket_size=None,
        base_hash="poly",
    )



def q_xvocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-design coverage curve: top-50 vocabulary with each
    rank's cumulative share of all corpus tokens
    (``operators/text.py::vocab_coverage``)."""
    t = load(spark, sf_dir, "documents")
    return X.vocab_coverage(t["documents"], top_v=50)



def q_xpack_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing sequence packing per (lang, shard)
    (512-token bins): per-(lang, shard, chunk) doc/token totals.
    Sharded (r8): 8 id-keyed sub-shards bound each pandas fold — one
    lang at corpus scale would otherwise be ONE group. Rows-only by
    design — the FFD fold is inherently sequential per group
    (Arrow-batched applyInPandas), not SQL-expressible; determinism,
    capacity bounds, and partition-independence are pytest-pinned and
    the oracle-checkable invariant projection is ``xpack_ffd_stats``
    (``operators/sampling.py::pack_sequences_ffd``)."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        pack_sequences_ffd,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"].withColumn("__cost", X.token_count("text"))
    return (
        pack_sequences_ffd(
            d, "doc_id", "__cost", budget=512, part_col="lang",
            shards=8, hash_fn="poly", eager_guard=True,
        )
        .groupBy("lang", "shard", "chunk")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__cost").cast("long").alias("n_tokens"),
        )
    )


def q_xpack_ffd_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable invariant projection of the FFD packing (r8):
    the fold itself is not SQL-expressible (``xpack_ffd`` stays
    rows-only), but per (lang, shard) the oracle CAN verify exactly
    what went in — packable-row count, packable cost total, oversize
    count — and the packing invariants are hash-pinned as 1/0 flags
    computed from the REAL engine output against literal 1 in the
    oracle, so any violation flips the value hash red:

    - ``capacity_ok``: no chunk's load exceeds the 512 budget;
    - ``bins_lb_ok``: n_chunks ≥ ceil(total_cost/512) (each chunk
      holds ≤ budget, so fewer bins cannot carry the total);
    - ``bins_ub_ok``: n_chunks ≤ floor(2·total_cost/512) + 1 (any
      first-fit family leaves at most one bin ≤ half full — two would
      mean the later bin's first item fit in the earlier one).
    """
    from kamu_engine_datafusion_spark.operators.sampling import (
        pack_sequences_ffd,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"].withColumn(
        "__cost", X.token_count("text").cast("long")
    )
    packed = pack_sequences_ffd(
        d, "doc_id", "__cost", budget=512, part_col="lang",
        shards=8, hash_fn="poly", eager_guard=True,
    )
    per = packed.groupBy("lang", "shard").agg(
        F.sum((F.col("chunk") >= 0).cast("long")).alias("n_rows"),
        F.sum(F.when(F.col("chunk") >= 0, F.col("__cost")).otherwise(F.lit(0)))
        .cast("long")
        .alias("total_cost"),
        F.sum((F.col("chunk") < 0).cast("long")).alias("n_oversize"),
    )
    loads = (
        packed.filter(F.col("chunk") >= 0)
        .groupBy("lang", "shard", "chunk")
        .agg(F.sum("__cost").alias("__load"))
    )
    bins = loads.groupBy("lang", "shard").agg(
        F.count(F.lit(1)).alias("__n_chunks"),
        F.max("__load").alias("__max_load"),
    )
    lb = F.floor((F.col("total_cost") + F.lit(511)) / F.lit(512.0))
    ub = F.floor(F.col("total_cost") * 2 / F.lit(512.0)) + F.lit(1)
    return per.join(bins, ["lang", "shard"], "left").select(
        "lang",
        "shard",
        "n_rows",
        "total_cost",
        "n_oversize",
        F.coalesce(F.col("__max_load") <= F.lit(512), F.lit(True))
        .cast("long")
        .alias("capacity_ok"),
        F.coalesce(F.col("__n_chunks") >= lb, F.lit(True))
        .cast("long")
        .alias("bins_lb_ok"),
        F.coalesce(F.col("__n_chunks") <= ub, F.lit(True))
        .cast("long")
        .alias("bins_ub_ok"),
    )


def q_xdsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling (r8): select the 150 raw docs
    (source ≠ src1) most like the src1 target slice by hashed-bigram
    importance weights, Gumbel top-k without replacement. Fully
    deterministic — log-ratios and the Gumbel term are 1e-9 fixed-point
    integers from poly hashes, so the oracle reproduces the exact draw
    (``operators/sampling.py::dsir_sample``)."""
    from kamu_engine_datafusion_spark.operators.sampling import dsir_sample

    t = load(spark, sf_dir, "documents")
    docs = t["documents"]
    tgt = docs.filter(F.col("source") == "src1")
    raw = docs.filter(F.col("source") != "src1")
    return dsir_sample(raw, tgt, n=150, buckets=512, hash_fn="poly").select(
        "doc_id", "lang", "source", "dsir_score"
    )


def q_xdsir_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weight diagnostics for the DSIR run (r9): per lang
    stratum of the raw corpus, the effective sample size
    ``(Σw)²/Σw²`` of the importance weights, its ratio to n, and the
    weight share held by the 10 highest-scored docs — the standard
    sanity check before trusting the resampled mix
    (``operators/sampling.py::dsir_diagnostics``)."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        dsir_diagnostics,
    )

    t = load(spark, sf_dir, "documents")
    docs = t["documents"]
    tgt = docs.filter(F.col("source") == "src1")
    raw = docs.filter(F.col("source") != "src1")
    return dsir_diagnostics(
        raw, tgt, group_col="lang", buckets=512, top_k=10, hash_fn="poly"
    )


def q_xpipeline_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 END-TO-END DSIR curation pipeline, fully oracle-checked
    through all four stages: target-slice split (src1 vs rest) →
    DSIR importance resampling (top-400 Gumbel draw) → token-boundary
    truncation to 96 tokens → 512-token sharded sequence packing per
    (lang, shard). Output is per (lang, shard, chunk) doc/token totals
    with id_sum pinning exact end-to-end membership — proves the r8
    DSIR operator composes with the r8 sharded packer under one hash.

    Scale shape: stage 2 is two bounded bucket aggregates + in-row
    scoring + TakeOrdered (no corpus shuffle); stage 3 in-row column
    math; stage 4 one (lang, shard)-keyed window exchange whose sort
    parallelism scales with shards."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        dsir_sample,
        pack_sequences,
    )
    from kamu_engine_datafusion_spark.operators.text import truncate_tokens

    t = load(spark, sf_dir, "documents")
    docs = t["documents"]
    tgt = docs.filter(F.col("source") == "src1")
    raw = docs.filter(F.col("source") != "src1")
    sel = dsir_sample(raw, tgt, n=400, buckets=512, hash_fn="poly")
    d = truncate_tokens(sel, max_tokens=96)
    packed = pack_sequences(
        d, "doc_id", "n_tokens_kept", budget=512, part_col="lang",
        shards=4, hash_fn="poly",
    )
    return packed.groupBy("lang", "shard", "chunk").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens_kept").cast("long").alias("n_tokens"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )


def q_xngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bigram NOVELTY vs the doc_id<200 reference slice (r9):
    fraction of each corpus doc's bigrams never seen in the reference —
    the memorization/overlap metric reported alongside decontamination
    (``operators/decontaminate.py::ngram_novelty``)."""
    from kamu_engine_datafusion_spark.operators.decontaminate import (
        ngram_novelty,
    )

    t = load(spark, sf_dir, "documents")
    docs = t["documents"]
    return ngram_novelty(
        docs.filter(F.col("doc_id") >= 200),
        docs.filter(F.col("doc_id") < 200),
        n=2,
        keep_cols=["lang"],
    )


def q_xcurriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum scheduling (r9): 4 equal-count difficulty stages per
    lang (difficulty = mean chars/token, half-up 4dp; easy→hard), with
    per-(lang, stage) doc counts, token totals, and the stage's
    difficulty range (``operators/sampling.py::curriculum_stages``)."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        curriculum_stages,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"].select(
        "doc_id",
        "lang",
        X.token_count("text").cast("long").alias("__tc"),
        F.length(F.trim("text")).cast("long").alias("__len"),
    )
    diff = (
        F.floor(F.col("__len") / F.col("__tc") * 10000 + F.lit(0.5)) / 10000
    )
    staged = curriculum_stages(
        d.withColumn("__diff", diff), "__diff", n_stages=4, part_col="lang"
    )
    return staged.groupBy("lang", "stage").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__tc").cast("long").alias("n_tokens"),
        F.min("__diff").alias("min_diff"),
        F.max("__diff").alias("max_diff"),
    )


def q_xpack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packer tuning curve (r9): packing efficiency of the
    running-offset chunker at budgets 256/512/1024/2048 over the
    whitespace-token costs — which training sequence length wastes the
    least padding on this corpus
    (``operators/sampling.py::packing_efficiency``)."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        packing_efficiency,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"].withColumn(
        "__cost", X.token_count("text").cast("long")
    )
    return packing_efficiency(
        d, "doc_id", "__cost", budgets=[256, 512, 1024, 2048],
        part_col="lang", shards=4, hash_fn="poly", eager_guard=True,
    )


def q_xpipeline_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 curate→rebalance→schedule pipeline, fully oracle-checked
    through all three stages: composite quality gate (score ≥ 0.7) →
    token-budget mixture rebalance (25% of a 12k-token budget per
    listed lang, keyed poly-hash row cut over the POST-gate corpus) →
    4-stage per-lang curriculum (difficulty = mean chars/token, half-up
    4dp). Output is per (lang, stage) doc/token totals with id_sum
    pinning exact end-to-end membership — proves the r9 curriculum
    operator composes with the mixture sampler under one hash.

    Scale shape: stage 1 is a scan predicate; stage 2 a tiny per-lang
    cost aggregate + broadcast cuts (no corpus shuffle); stage 3 one
    lang-keyed window exchange (see ``curriculum_stages`` for the
    corpus-scale sharding note)."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        curriculum_stages,
        mix_to_budget,
    )

    t = load(spark, sf_dir, "documents")
    d = (
        t["documents"]
        .filter(X.quality_score("text") >= 0.7)
        .select(
            "doc_id",
            "lang",
            X.token_count("text").cast("long").alias("__tc"),
            F.length(F.trim("text")).cast("long").alias("__len"),
        )
    )
    mixed = mix_to_budget(
        d, "doc_id", "lang", "__tc", _MIX_WEIGHTS, budget=12_000,
        hash_fn="poly",
    )
    diff = (
        F.floor(F.col("__len") / F.col("__tc") * 10000 + F.lit(0.5)) / 10000
    )
    staged = curriculum_stages(
        mixed.withColumn("__diff", diff), "__diff", n_stages=4,
        part_col="lang",
    )
    return staged.groupBy("lang", "stage").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__tc").cast("long").alias("n_tokens"),
        F.sum("doc_id").cast("long").alias("id_sum"),
        F.min("__diff").alias("min_diff"),
        F.max("__diff").alias("max_diff"),
    )


#: BM25 demo query terms (mixed corpus frequency, lowercase).
_BM25_TERMS = ["vector", "merge", "hash", "stream"]


def q_xbm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance of every matching doc against a 4-term
    query; score rounded 4dp for cross-engine float stability."""
    from kamu_engine_datafusion_spark.operators.retrieval import bm25_scores

    t = load(spark, sf_dir, "documents")
    return bm25_scores(t["documents"], _BM25_TERMS).select(
        "doc_id", "n_terms_matched", F.round("score", 4).alias("score")
    )


def q_xtfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per doc (docs < 200), deterministic
    (tfidf desc, term asc) rank."""
    from kamu_engine_datafusion_spark.operators.retrieval import tfidf_topk_terms

    t = load(spark, sf_dir, "documents")
    sub = t["documents"].filter(F.col("doc_id") < 200)
    return tfidf_topk_terms(sub, k=3).select(
        "doc_id", "term", "tf", F.round("tfidf", 4).alias("tfidf"), "term_rank"
    )


def q_xsnapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → snapshot projection: synthesize a retractable ledger
    from events (event_id as offset, op = event_id % 4 over the ODF op
    vocabulary) and project the current state — the latest non-dead
    record per user (``operators/snapshot.py``; op vocabulary from the
    reference ``src/engine.rs:521-533``)."""
    from kamu_engine_datafusion_spark.operators.snapshot import snapshot_of_ledger

    t = load(spark, sf_dir, "events")
    ledger = t["events"].select(
        F.col("event_id").alias("offset"),
        (F.col("event_id") % 4).cast("int").alias("op"),
        F.col("ts").alias("event_time"),
        "user_id",
        "event_type",
        "value",
    )
    snap = snapshot_of_ledger(ledger, "user_id")
    return snap.select(
        "user_id",
        "event_type",
        F.round("value", 2).alias("value"),
        # event_time may be TIMESTAMP_NTZ (driver parquet); UTC session
        # TZ makes the cast value-identical
        F.unix_micros(F.col("event_time").cast("timestamp")).alias(
            "event_time_us"
        ),
    )


def q_xrollup_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-bucket rollup: hourly per-event-type
    aggregates (``operators/snapshot.py::rollup_time_buckets``)."""
    from kamu_engine_datafusion_spark.operators.snapshot import (
        rollup_time_buckets,
    )
    from kamu_engine_datafusion_spark.queries._util import dsum

    t = load(spark, sf_dir, "events")
    out = rollup_time_buckets(
        t["events"],
        time_col="ts",
        bucket="hour",
        group_cols=["event_type"],
        aggs={
            "n_events": F.count(F.lit(1)),
            "sum_value": dsum(F.col("value"), "sum_value"),
            "n_users": F.count_distinct(F.col("user_id")).cast("long"),
        },
    )
    return out.select(
        F.unix_micros("bucket_start").alias("bucket_us"),
        "event_type",
        "n_events",
        "sum_value",
        "n_users",
    )


def q_xrollup_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly rollup (time_bucket_gapfill): every
    (hour, event_type) cell of the full grid is present, missing cells
    zero-filled and flagged. Sparse input (user_id < 50) guarantees
    real gaps to fill."""
    from kamu_engine_datafusion_spark.operators.snapshot import (
        rollup_gapfill,
    )

    t = load(spark, sf_dir, "events")
    out = rollup_gapfill(
        t["events"].filter(F.col("user_id") < 50),
        time_col="ts",
        bucket="hour",
        group_cols=["event_type"],
        aggs={"n_events": F.count(F.lit(1))},
        fill="zero",
    )
    return out.select(
        F.unix_micros("bucket_start").alias("bucket_us"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        "gap_filled",
    )


def q_xfunnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view→click→purchase within 72h of first view:
    one user-keyed shuffle + in-row fold (greedy first-touch walk);
    the oracle computes the equivalent sequential conditional mins."""
    from kamu_engine_datafusion_spark.operators.funnel import funnel_counts

    t = load(spark, sf_dir, "events")
    out = funnel_counts(
        t["events"],
        steps=["view", "click", "purchase"],
        within_seconds=72 * 3600,
    )
    return out.select(
        F.col("step").cast("long").alias("step"),
        "event_type",
        F.col("n_users").cast("long").alias("n_users"),
    )


def q_xretention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-activity week,
    counted per later active week — two keyed shuffles, activity
    deduped to (user, week) before any join."""
    from kamu_engine_datafusion_spark.operators.funnel import (
        retention_cohorts,
    )

    t = load(spark, sf_dir, "events")
    out = retention_cohorts(t["events"], bucket="week")
    return out.select(
        F.unix_micros("cohort_start").alias("cohort_us"),
        "period",
        F.col("n_users").cast("long").alias("n_users"),
    )


def q_xchangelog_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog-aware aggregation (incremental MV maintenance):
    current-state per-event-type live counts + signed value sums over a
    synthesized retractable ledger (op = event_id % 4 over the ODF op
    vocabulary, ``src/engine.rs:521-533``) — one partial-aggregated
    shuffle, no snapshot materialization
    (``operators/changelog.py::changelog_agg``)."""
    from kamu_engine_datafusion_spark.operators.changelog import (
        changelog_agg,
    )

    t = load(spark, sf_dir, "events")
    ledger = t["events"].select(
        F.col("event_id").alias("offset"),
        (F.col("event_id") % 4).cast("int").alias("op"),
        "event_type",
        "value",
    )
    out = changelog_agg(ledger, ["event_type"], {"value_sum": "value"})
    return out.select(
        "event_type",
        F.col("n_live").cast("long").alias("n_live"),
        "value_sum",
    )


def q_xchangelog_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained-view MERGE path, driver-verified: the retractable
    ledger is split into three ticks, each reduced with
    ``changelog_agg(keep_dead_groups=True)`` and folded into the running
    state with ``merge_changelog_aggs`` — exactly the per-tick
    maintenance step of ``streaming/structured.py::maintained_view``.
    The oracle aggregates the WHOLE history directly, so a hash match
    proves merge ≡ recompute through the driver (previously only a
    pytest property)."""
    from kamu_engine_datafusion_spark.operators.changelog import (
        changelog_agg,
        merge_changelog_aggs,
    )

    t = load(spark, sf_dir, "events")
    ledger = t["events"].select(
        F.col("event_id").alias("offset"),
        (F.col("event_id") % 4).cast("int").alias("op"),
        "event_type",
        "value",
    )
    state = None
    for k in range(3):
        tick = ledger.filter(F.col("offset") % 3 == k)
        inc = changelog_agg(
            tick, ["event_type"], {"value_sum": "value"}, keep_dead_groups=True
        )
        state = (
            inc.filter(F.col("n_live") != 0)
            if state is None
            else merge_changelog_aggs(state, inc, ["event_type"])
        )
    return state.select(
        "event_type",
        F.col("n_live").cast("long").alias("n_live"),
        "value_sum",
    )


def q_xsnapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained-snapshot MERGE path, driver-verified: three ticks
    folded by latest-record-per-key with tombstones retained across
    ticks (``streaming/structured.py::maintained_snapshot``'s fold),
    live rows selected at the end. Oracle = latest-per-key over the
    whole ledger directly — hash match proves the fold reproduces the
    batch snapshot."""
    from pyspark.sql import Window

    t = load(spark, sf_dir, "events")
    ledger = t["events"].select(
        F.col("event_id").alias("offset"),
        (F.col("event_id") % 4).cast("int").alias("op"),
        "user_id",
        "value",
    )
    state = None
    w = Window.partitionBy("user_id").orderBy(F.col("offset").desc())
    for k in range(3):
        tick = ledger.filter(F.col("offset") % 3 == k)
        merged = tick if state is None else state.unionByName(tick)
        state = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    return state.filter(~F.col("op").isin(1, 2)).select(
        "user_id", "offset", "op", "value"
    )


def q_xoutliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection (modified z-score, median/MAD
    — Iglewicz–Hoaglin): flag events whose value sits > 3.5 robust
    deviations from its event-type median
    (``operators/profile.py::robust_outliers``)."""
    from kamu_engine_datafusion_spark.operators.profile import (
        robust_outliers,
    )

    t = load(spark, sf_dir, "events")
    out = robust_outliers(
        t["events"], "value", ["event_type"], threshold=3.5,
        stat_precision=6,
    )
    # explicit half-up rounding (floor(x*1e4 + 0.5)/1e4) instead of
    # round(): the two engines produce the IDENTICAL score double, but
    # their round() builtins disagree when the true decimal value lands
    # exactly on a half (observed: 3.85225 → Spark 3.8522, DuckDB
    # 3.8523); the floor form is pure IEEE arithmetic on the shared
    # double, so both engines get the same digits by construction
    return out.select(
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
        (F.floor(F.col("mscore") * 10000 + F.lit(0.5)) / 10000).alias(
            "mscore"
        ),
    )


def q_xhistogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense equi-width histogram of lineitem prices per returnflag on a
    shared 20-bin grid — two scans (bounds, counts), grid-sized densify
    (``operators/profile.py::histogram_equi_width``)."""
    from kamu_engine_datafusion_spark.operators.profile import (
        histogram_equi_width,
    )

    t = load(spark, sf_dir, "lineitem")
    out = histogram_equi_width(
        t["lineitem"], "l_extendedprice", 20, ["l_returnflag"]
    )
    return out.select(
        "l_returnflag",
        "bin",
        F.round("bin_lo", 6).alias("bin_lo"),
        F.round("bin_hi", 6).alias("bin_hi"),
        "n",
    )


def q_xtext_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization for ingest hygiene: zero-width strip, control
    chars to spaces, space-run collapse, lowercase — pure in-row regex
    chain (``operators/text.py::clean_text``)."""
    from kamu_engine_datafusion_spark.operators.text import clean_text

    t = load(spark, sf_dir, "documents")
    return t["documents"].select(
        "doc_id", clean_text("text", lowercase=True).alias("clean")
    )


def q_xtext_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon character entropy (gibberish signal):
    explode → (doc, char) counts → ln(n) − Σc·ln(c)/n, all codegen
    (``operators/text.py::char_entropy``)."""
    from kamu_engine_datafusion_spark.operators.text import char_entropy

    t = load(spark, sf_dir, "documents")
    out = char_entropy(t["documents"])
    return out.select(
        "doc_id", "n_chars", F.round("entropy", 6).alias("entropy")
    )


def q_xcollocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: top-100 adjacent bigrams by PMI
    (min_count 5) — in-row bigram zip, partial-aggregated count tables,
    TakeOrderedAndProject top-k
    (``operators/text.py::collocations``). Ranking keys on the
    6dp-rounded PMI (+ lexicographic tie-break) so the rank 100 cut is
    ulp-drift-proof across engines."""
    from kamu_engine_datafusion_spark.operators.text import collocations

    t = load(spark, sf_dir, "documents")
    out = collocations(t["documents"], min_count=5, top_k=10_000_000)
    ranked = out.select(
        "w1", "w2", "n_pair", F.round("pmi", 6).alias("pmi")
    ).orderBy(F.col("pmi").desc(), "w1", "w2")
    return ranked.limit(100)


def q_xbigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram LM scoring (add-0.5 smoothing): per-doc
    average bigram log-probability — the perplexity-filter proxy
    (``operators/text.py::bigram_lm_score``)."""
    from kamu_engine_datafusion_spark.operators.text import bigram_lm_score

    t = load(spark, sf_dir, "documents")
    out = bigram_lm_score(t["documents"], add_k=0.5)
    return out.select(
        "doc_id", "n_bigrams", F.round("avg_logprob", 6).alias("avg_logprob")
    )


def q_xmmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified top-5 for the vec_id=0 query: distributed exact
    top-20 pool, then the greedy relevance-vs-redundancy walk on 6dp-
    rounded similarities (``operators/similarity.py::mmr_diversify``);
    the oracle unrolls the same greedy steps in SQL."""
    from kamu_engine_datafusion_spark.operators.similarity import (
        mmr_diversify,
    )

    t = load(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    return mmr_diversify(
        emb, emb.filter(F.col("vec_id") == 0), k=5, pool=20, lam=0.7, dim=64
    )


def q_xdq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite: all row-level checks in one
    aggregate pass per table + an anti-join referential-integrity
    check, long-format report (``operators/quality.py::dq_report``).
    The range check is deliberately violated (l_quantity ≤ 49) so the
    report exercises the failing path too."""
    from kamu_engine_datafusion_spark.operators.quality import dq_report

    t = load(spark, sf_dir, "lineitem", "orders")
    li = dq_report(
        t["lineitem"],
        not_null=["l_orderkey", "l_shipdate"],
        ranges={"l_quantity": (1, 49)},
        accepted={"l_returnflag": ["A", "N", "R"]},
        patterns={"l_linestatus": "^[A-Z]$"},
        foreign_keys=[("l_orderkey", t["orders"], "o_orderkey")],
    )
    orders = dq_report(
        t["orders"],
        unique=["o_orderkey"],
        ranges={"o_totalprice": (0.0, 1e9)},
    )
    li = li.withColumn("table", F.lit("lineitem"))
    orders = orders.withColumn("table", F.lit("orders"))
    return li.unionByName(orders).select(
        "table", "check", "column", "n_rows", "n_violations", "ok"
    )


def q_xwinsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized prices: clip to the per-returnflag [p05, p95] band
    computed over the FULL table; emit a keyed subset
    (``operators/profile.py::winsorize``)."""
    from kamu_engine_datafusion_spark.operators.profile import winsorize

    t = load(spark, sf_dir, "lineitem")
    out = winsorize(
        t["lineitem"], "l_extendedprice", ["l_returnflag"], 0.05, 0.95
    )
    return out.filter(F.col("l_orderkey") < 5000).select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.round("l_extendedprice", 4).alias("price"),
        F.round("l_extendedprice_winsorized", 4).alias("price_w"),
    )


def q_xrolling_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour per-user rolling aggregates over the event
    stream — a RANGE (time) frame, not a ROWS frame
    (``operators/snapshot.py::rolling_time_agg``)."""
    from kamu_engine_datafusion_spark.operators.snapshot import (
        rolling_time_agg,
    )

    t = load(spark, sf_dir, "events")
    sub = t["events"].filter(F.col("user_id") < 50)
    out = rolling_time_agg(sub, "ts", "value", 3600, ["user_id"])
    return out.select(
        "event_id",
        "user_id",
        "rolling_n",
        F.round("rolling_sum", 6).alias("rolling_sum"),
        F.round("rolling_avg", 6).alias("rolling_avg"),
    )


def q_xfuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage: supplier-name pairs within edit distance 1 via
    guaranteed-recall SymSpell deletion-neighborhood blocking + exact
    levenshtein verify (``operators/linkage.py``). The oracle is the
    BRUTE-FORCE all-pairs comparison, independently proving the
    blocking loses no pairs."""
    from kamu_engine_datafusion_spark.operators.linkage import (
        fuzzy_string_pairs,
    )

    t = load(spark, sf_dir, "supplier")
    out = fuzzy_string_pairs(t["supplier"], "s_name", "s_suppkey", 1)
    return out.select(
        "id_a",
        "id_b",
        "text_a",
        "text_b",
        F.col("distance").cast("long").alias("distance"),
    )


def q_xkey_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnosis: top-20 heaviest user_ids in the event
    stream with row shares — the salting-decision input
    (``operators/partitioning.py::key_skew_profile``)."""
    from kamu_engine_datafusion_spark.operators.partitioning import (
        key_skew_profile,
    )

    t = load(spark, sf_dir, "events")
    out = key_skew_profile(t["events"], ["user_id"], top_n=20)
    return out.select(
        "rank", "key", "n", F.round("share", 9).alias("share")
    )


def q_xmm_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual (average) hash over media binaries — the image
    near-dup primitive. Pinned to the stub pixel source (sha256 chain)
    so the Arrow/numpy kernel output is value-verified bit-for-bit in
    SQL (``operators/multimodal.py::perceptual_hash``)."""
    t = load(spark, sf_dir, "documents")
    media = M.synthesize_media(t["documents"], "doc_id", "text")
    return M.perceptual_hash(media, use_real_codecs=False)


def q_xmm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs over perceptual hashes
    (``operators/dedup.py::phash_near_dups``): the sha256-stub pHashes
    of docs < 200 plus, for each, a synthetic near-duplicate twin
    (id + 100000) whose hash differs in exactly 2 known bits — flipped
    hex-side on the 32-bit halves, so the corpus has a KNOWN ground
    truth. Pigeonhole blocking (4 chunks) guarantees recall at
    Hamming ≤ 3, so the blocked result must equal the oracle's
    brute-force all-pairs scan — the hash match proves both the hex
    fingerprint parse and the guaranteed-recall block join."""
    from kamu_engine_datafusion_spark.operators.dedup import phash_near_dups

    t = load(spark, sf_dir, "documents")
    corpus = _phash_twin_corpus(
        t["documents"].filter(F.col("doc_id") < 200)
    )
    return phash_near_dups(
        corpus, "media_id", "phash", max_hamming=3, num_blocks=4
    )


def q_xskipgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram co-occurrence PMI (window 3): every ordered pair
    within 3 positions — the word2vec context statistic
    (``operators/text.py::collocations(window=3)``)."""
    from kamu_engine_datafusion_spark.operators.text import collocations

    t = load(spark, sf_dir, "documents")
    out = collocations(t["documents"], min_count=10, top_k=10_000_000, window=3)
    ranked = out.select(
        "w1", "w2", "n_pair", F.round("pmi", 6).alias("pmi")
    ).orderBy(F.col("pmi").desc(), "w1", "w2")
    return ranked.limit(100)


def q_xtransitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event paths — one
    user-keyed lead window, |types|² output
    (``operators/funnel.py::event_transitions``)."""
    from kamu_engine_datafusion_spark.operators.funnel import (
        event_transitions,
    )

    t = load(spark, sf_dir, "events")
    out = event_transitions(t["events"])
    return out.select(
        "from_type", "to_type", "n", F.round("p", 9).alias("p")
    )


def q_xcorr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix of four lineitem measures in
    ONE scan (``operators/profile.py::correlation_matrix``)."""
    from kamu_engine_datafusion_spark.operators.profile import (
        correlation_matrix,
    )

    t = load(spark, sf_dir, "lineitem")
    out = correlation_matrix(
        t["lineitem"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )
    return out.select(
        "col_a", "col_b", F.round("corr", 6).alias("corr")
    )


def q_xquantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth decile binning of prices with a deterministic
    tie-break (``operators/profile.py::quantile_bins``)."""
    from kamu_engine_datafusion_spark.operators.profile import quantile_bins

    t = load(spark, sf_dir, "lineitem")
    sub = t["lineitem"].filter(F.col("l_orderkey") < 2500).withColumn(
        "__tb", F.col("l_orderkey") * 10 + F.col("l_linenumber")
    )
    out = quantile_bins(sub, "l_extendedprice", 10, "__tb")
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 4).alias("price"),
        F.col("l_extendedprice_bin").alias("bin"),
    )


def q_xstandardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score standardization
    (``operators/profile.py::standardize``)."""
    from kamu_engine_datafusion_spark.operators.profile import standardize

    t = load(spark, sf_dir, "events")
    out = standardize(t["events"], "value", ["event_type"])
    return out.select(
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
        F.round("value_z", 6).alias("value_z"),
    )


def q_xskyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto front) of orders: cheapest-and-most-recent —
    two-phase local-skyline + merge over mapInPandas
    (``operators/skyline.py``); oracle is the NOT EXISTS dominance
    definition."""
    from kamu_engine_datafusion_spark.operators.skyline import skyline

    t = load(spark, sf_dir, "orders")
    sub = t["orders"].filter(F.col("o_orderkey") < 5000).select(
        "o_orderkey",
        "o_totalprice",
        # o_orderdate reads as TIMESTAMP_NTZ; session TZ is UTC so the
        # cast is value-identical
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
            "orderdate_us"
        ),
    )
    return skyline(
        sub, ["o_totalprice", "orderdate_us"], maximize=["orderdate_us"]
    )


def q_xprofile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan numeric profiling of lineitem (the ANALYZE-equivalent:
    rows/nulls/exact distinct/min/max per column in long format).

    The operator returns exact extrema; the 9-dp rounding here is this
    query's cross-engine hash canonicalization (matching the oracle's
    ``round(..., 9)``), not a library behavior."""
    from kamu_engine_datafusion_spark.operators.profile import profile_numeric

    t = load(spark, sf_dir, "lineitem")
    prof = profile_numeric(
        t["lineitem"], ["l_orderkey", "l_quantity", "l_discount", "l_tax"]
    )
    return prof.select(
        "column",
        "n_rows",
        "n_nulls",
        "n_distinct",
        F.round("min_val", 9).alias("min_val"),
        F.round("max_val", 9).alias("max_val"),
    )


def q_xlayout_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map clustering audit of `events` under its ingestion layout
    (``operators/profile.py::zone_map_audit``): per-chunk min/max zone
    maps over 50-row chunks of ``event_id`` (the physical-position
    proxy), point-probe skip fractions + interleave for two candidate
    sort keys — ``ts_ms`` (ingestion-correlated → prunes nearly
    everything) vs ``user_id`` (random → prunes nothing). The
    data-layout decision input: which key deserves the table's sort
    order at 100 TB."""
    from kamu_engine_datafusion_spark.operators.profile import zone_map_audit

    t = load(spark, sf_dir, "events")
    return zone_map_audit(
        t["events"],
        order_col="event_id",
        # ts reads as TIMESTAMP_NTZ from the driver's parquet; session TZ
        # is UTC so the cast is a type relabel (matches epoch_ms(ts))
        keys={
            "ts_ms": F.unix_millis(F.col("ts").cast("timestamp")),
            "user_id": F.col("user_id"),
        },
        chunk_rows=50,
    )


def q_xlayout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rewrite the zone-map audit recommends, audited: Morton
    z-order `events` on (ts_ms, user_id) (``sources/compact.py::
    zorder_value`` — 16-bit min-max codes, bit-interleaved) and rerun
    ``zone_map_audit`` with the z-value itself as the physical-position
    proxy (chunk = z >> 24, i.e. a fixed-granularity z-cell = the
    hyper-rectangle a z-ordered writer packs into one file). Where the
    ingestion layout prunes only ts (`xlayout_zonemap`: ts skip ~0.99,
    user_id ~0), the z-layout's per-chunk min/max spans ~1/16 of BOTH
    domains, so point probes skip ~15/16 of chunks on EITHER key — the
    OPTIMIZE...ZORDER before/after evidence at 100 TB, computed without
    writing a byte."""
    from kamu_engine_datafusion_spark.operators.profile import zone_map_audit
    from kamu_engine_datafusion_spark.sources.compact import zorder_value

    t = load(spark, sf_dir, "events")
    ev = t["events"].select(
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.col("user_id").cast("long").alias("user_id"),
    )
    with_bounds, z = zorder_value(ev, ["ts_ms", "user_id"], bits_per_col=16)
    zdf = with_bounds.select("ts_ms", "user_id", z.alias("zv"))
    return zone_map_audit(
        zdf,
        order_col="zv",
        keys={"ts_ms": F.col("ts_ms"), "user_id": F.col("user_id")},
        chunk_rows=1 << 24,
    )


def q_xcluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point Lloyd's k-means (k=8, 3 iterations) over the
    embedding corpus (``operators/clustering.py::kmeans_fixed_point``)
    — the SemDeDup cluster-then-curate step, bit-reproducible: integer
    quantization makes centroid sums associative (partition-order-
    free), so the DuckDB oracle replays the identical trajectory and
    the per-vector assignment + quantized distance hash-match."""
    from kamu_engine_datafusion_spark.operators.clustering import (
        kmeans_fixed_point,
    )

    t = load(spark, sf_dir, "embeddings")
    return kmeans_fixed_point(
        t["embeddings"], "vec_id", "embedding", dim=64, k=8, iters=3
    )


def q_xcluster_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embedding corpus
    (``operators/clustering.py::semdedup``): fixed-point k-means (k=8,
    3 iters) restricts the quadratic near-dup scan to within-cluster
    pairs; quantized-cosine τ=0.45 in pure BIGINT (dot²·10⁴ ≥
    2025·‖a‖²‖b‖²) drops every vector with a lower-id near-dup in its
    cluster. τ is loosened from the paper's ~0.95 because the test
    embeddings are random (near-orthogonal) — at 0.95 the corpus has
    zero near-dup pairs and the key would verify nothing; 0.45 yields
    a non-trivial kept/dropped mix at every SF. Per-vector (cluster,
    n_dups, is_kept), hash-exact."""
    from kamu_engine_datafusion_spark.operators.clustering import semdedup

    t = load(spark, sf_dir, "embeddings")
    return semdedup(
        t["embeddings"],
        "vec_id",
        "embedding",
        dim=64,
        k=8,
        iters=3,
        tau2_num=2_025,
        max_cluster_rows=500_000,
    )


def q_xcluster_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality report for the fixed-point k-means run
    against the embeddings table's ground-truth ``label``
    (``operators/clustering.py::cluster_quality``): per cluster —
    size, quantized inertia, majority label (ties → lowest), its
    count, and purity (half-up 6dp). The trust-but-verify step before
    any cluster-level curation decision."""
    from kamu_engine_datafusion_spark.operators.clustering import (
        cluster_quality,
        kmeans_fixed_point,
    )

    t = load(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    assign = kmeans_fixed_point(emb, "vec_id", "embedding", dim=64, k=8, iters=3)
    return cluster_quality(assign, emb, "vec_id", "label")


def _bigram_stream(docs, with_lang: bool = False, extra_cols: tuple = ()):
    """Exploded adjacent-bigram strings (``"w1 w2"``) of the documents
    table — the element stream both sketch audits run on (in-row
    zip_with over token slices; no join, no window). ``extra_cols``
    pass through alongside the stream (r18: tick keys for one-scan
    sliced grids)."""
    from kamu_engine_datafusion_spark.functions.columns import tokens

    tk = tokens("text")
    n = F.size(tk)
    bg = F.when(
        n >= F.lit(2),
        F.zip_with(
            F.slice(tk, 1, n - 1),
            F.slice(tk, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    cols = (
        list(extra_cols)
        + (["lang"] if with_lang else [])
        + [F.explode(bg).alias("bigram")]
    )
    return docs.select(*cols)


def q_xsketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog cardinality audit
    (``operators/sketches.py::hll_distinct_report``): per lang —
    exact distinct bigram-shingle count vs the 64-register HLL
    estimate, zero-register count, relative error, and the
    ``within_sigma`` 2-standard-error flag (pinned vs literal 1 in the
    oracle). The shingle-cardinality estimate is what sizes a MinHash
    dedup pass; at 100 TB the register fold replaces the exact
    ``count(DISTINCT)``'s full key shuffle with a ≤64-longs-per-group
    exchange."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        hll_distinct_report,
    )

    t = load(spark, sf_dir, "documents")
    bg = _bigram_stream(t["documents"], with_lang=True)
    return hll_distinct_report(bg, ["lang"], "bigram", b=6, sigma_mult=2.0)


def q_xsketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy-hitter audit
    (``operators/sketches.py::cm_heavy_hitter_report``): exact top-20
    corpus bigrams with their 4×256-grid estimates, the
    ``is_overestimate`` theorem flag (pinned vs literal 1), and the
    collision overshoot. The grid partial-aggregates to ≤1024 cells
    per partition — head-of-Zipf frequencies at 100 TB without
    shuffling the key space."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        cm_heavy_hitter_report,
    )

    t = load(spark, sf_dir, "documents")
    bg = _bigram_stream(t["documents"])
    return cm_heavy_hitter_report(
        bg, "bigram", top_k=20, depth=4, width=256, seed=7
    )


def q_xsketch_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile-sketch audit
    (``operators/sketches.py::quantile_sketch_report``): per
    l_returnflag — exact row count, the deterministic hash-level
    sketch's threshold and survivor count (k=256), and p50/p90/p99 of
    ``l_quantity``: sketch estimate vs exact (same integer rank
    selection), the estimate's rank error in the full data (half-up
    6dp), and ``ok`` flags pinned vs literal 1 in the oracle at
    eps=0.125 (worst observed error across sf0.001–0.1 is 0.066 —
    2× margin). Completes the sketch layer: HLL = cardinality,
    Count-Min = frequency, this = quantiles. At 100 TB the sketch's
    per-group state is ~k rows and folds are EXACT merges — the
    incremental backbone for winsorize / robust-outlier / curriculum
    quantile cut points; level assignment is in-row, the threshold
    comes from a ≤32-longs-per-group partial aggregate, and the corpus
    itself is never shuffled."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        quantile_sketch_report,
    )

    t = load(spark, sf_dir, "lineitem")
    li = t["lineitem"].select(
        F.col("l_returnflag").alias("grp"),
        F.concat(
            "l_orderkey", F.lit("-"), "l_linenumber"
        ).alias("rid"),
        F.col("l_quantity").cast("long").alias("val"),
    )
    return quantile_sketch_report(
        li, ["grp"], "rid", "val",
        qs=[(1, 2), (9, 10), (99, 100)], k=256, eps=0.125,
    )


def q_xquality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear quality classifier
    (``operators/classifier.py``): fastText/DataComp-style learned
    quality gate — binarized hashed bag-of-tokens (128 buckets + bias),
    logistic regression by full-batch fixed-point GD (12 iterations,
    lr 16/t, Elliott sigmoid — no exp(), no floats), label = document
    contains the token 'vector' (the fixtures' only linearly separable
    text property; real deployments feed curated-vs-crawl labels).
    Output: the 129 final weights as (j, w) rows plus the train
    accuracy (half-up 4dp) and ``acc_ok`` = accuracy ≥ 0.9 — the
    oracle replays the ENTIRE 12-step trajectory in SQL and pins
    ``acc_ok`` to literal 1 (measured 0.98–0.99 across SFs), so both
    determinism and learning are hash-verified. Scoring is one in-row
    fold at scan speed; training is one ≤129-long aggregate per
    iteration."""
    from kamu_engine_datafusion_spark.operators.classifier import (
        score_quality,
        train_quality_classifier,
    )

    t = load(spark, sf_dir, "documents")
    # Coalesce the label to 0: array_contains over NULL text yields
    # NULL (not 0), which would silently drop those rows from the
    # gradient/accuracy sums while the DuckDB oracle coalesces — agree
    # on NULL-text documents by construction, not by fixture luck.
    d = t["documents"].select(
        "doc_id",
        "text",
        F.coalesce(
            F.array_contains(
                F.split(F.trim(F.lower("text")), r"\s+"), "vector"
            ).cast("int"),
            F.lit(0),
        ).alias("y"),
    )
    w = train_quality_classifier(d, "doc_id", "text", "y")[-1]
    stats = (
        score_quality(d, "text", w)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                (
                    (F.col("quality_margin") > 0).cast("int") == F.col("y")
                ).cast("long")
            ).alias("__correct"),
        )
        .first()
    )
    n, correct = int(stats["n_docs"]), int(stats["__correct"])
    rows = spark.createDataFrame(
        [(j, int(wj)) for j, wj in enumerate(w)], "j long, w long"
    )
    acc4 = float(correct) / n
    import math

    acc4 = math.floor(acc4 * 10_000 + 0.5) / 10_000
    return rows.select(
        "j",
        "w",
        F.lit(n).cast("long").alias("n_docs"),
        F.lit(acc4).cast("double").alias("acc_4dp"),
        F.lit(1 if correct * 10 >= 9 * n else 0).cast("int").alias("acc_ok"),
    )


def q_xsim_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-10
    (``operators/similarity.py::pq_topk``): 4 subspaces × 8 codes over
    the 64-dim embeddings, fixed-point codebooks, query = lowest
    vec_id; returns rank, codes, ADC distance, and the exact quantized
    distance (the recall audit). Completes the ANN family: brute /
    SRP-LSH / IVF / scalar-quantize / PQ."""
    from kamu_engine_datafusion_spark.operators.similarity import pq_topk

    t = load(spark, sf_dir, "embeddings")
    return pq_topk(
        t["embeddings"], "vec_id", "embedding", dim=64, m_sub=4, k=8,
        iters=2, top_n=10,
    )


def q_xtext_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rules as boolean columns + the combined
    verdict, per document (``operators/text.py::gopher_rules``)."""
    t = load(spark, sf_dir, "documents")
    rules = X.gopher_rules("text")
    # r17 two-stage: rule booleans evaluate once; pass_all is an AND
    # over the materialized columns (the fused form re-ran the whole
    # split/regexp pipeline inside pass_all — 18 split nodes vs 4)
    base = t["documents"].select(
        "doc_id", *[v.alias(k) for k, v in rules.items()]
    )
    passes = None
    for k in rules:
        passes = F.col(k) if passes is None else (passes & F.col(k))
    return base.select("doc_id", *rules.keys(), passes.alias("pass_all"))


def q_xtext_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line filtering: cleaned text length + survived flag per
    document. The synthetic corpus is single-line with no terminal
    punctuation, so the demo splits on a pseudo-separator and exercises
    the length + boilerplate rules (the punctuation rule stays the
    default in the operator)."""
    t = load(spark, sf_dir, "documents")
    cleaned = X.c4_line_filter(
        "text", min_words_per_line=6, require_terminal_punct=False,
        sep=" the ",
    )
    return t["documents"].select(
        "doc_id",
        F.length(cleaned).cast("long").alias("clean_len"),
        (F.length(cleaned) > 0).alias("survived"),
    )


def q_xdedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup against a persisted signature index (the
    continuous-ingestion shape: corpus text never re-read; duplicates
    decided by the MinHash agreement estimate). Poly-hash variant so the
    DuckDB oracle replicates signatures, banding, and the estimate.
    r13: probes the SPLIT index layout (``minhash_index_split`` —
    narrow band rows in the LSH join, signatures joined for
    verification candidates only), re-certified by this key's hash
    staying green across the format change."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        dedup_increment_against_index,
        minhash_index_split,
    )

    t = load(spark, sf_dir, "documents")
    base = t["documents"].filter(F.col("doc_id") < 150)
    inc = t["documents"].filter(
        (F.col("doc_id") >= 150) & (F.col("doc_id") < 300)
    )
    index = minhash_index_split(
        base, num_hashes=16, num_bands=4, base_hash="poly"
    )
    survivors, _ = dedup_increment_against_index(
        inc,
        index,
        threshold=0.7,
        num_hashes=16,
        num_bands=4,
        max_bucket_size=None,
        base_hash="poly",
        # single downstream aggregate action: the cache-populating
        # dead-count job is pure fixed cost here (r18, guide §2.6/§5)
        eager_dead=False,
    )
    return survivors.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))


def q_xsalted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-stage salted aggregation over the hottest key
    (event_type — 5 distinct values over all events, the shape AQE
    cannot split because one key hashes to one reducer). Results are
    exactly a plain GROUP BY: the salt only spreads stage-1 partials
    (``operators/partitioning.py::salted_count``)."""
    from kamu_engine_datafusion_spark.operators.partitioning import (
        salted_count,
    )

    t = load(spark, sf_dir, "events")
    return salted_count(t["events"], ["event_type"], salt_buckets=16)


def q_xrange_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized interval join: shipments falling inside 14-day promo
    windows (every 100th order opens one), aggregated per priority —
    an equi-join on time buckets + exact containment filter instead of
    a BroadcastNestedLoopJoin theta join (``operators/rangejoin.py``)."""
    from kamu_engine_datafusion_spark.operators.rangejoin import interval_join
    from kamu_engine_datafusion_spark.queries._util import dsum

    t = load(spark, sf_dir, "orders", "lineitem")
    promos = t["orders"].filter(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_orderkey").alias("promo_id"),
        F.col("o_orderdate").alias("start_ts"),
        (F.col("o_orderdate") + F.expr("INTERVAL 14 DAYS")).alias("end_ts"),
        F.col("o_orderpriority").alias("promo_prio"),
    )
    points = t["lineitem"].filter(F.col("l_orderkey") <= 2000).select(
        "l_orderkey", F.col("l_shipdate").alias("ship_ts"), "l_extendedprice"
    )
    joined = interval_join(points, "ship_ts", promos, "start_ts", "end_ts")
    return joined.groupBy("promo_prio").agg(
        F.count(F.lit(1)).alias("n_shipments"),
        F.count_distinct(F.col("promo_id")).cast("long").alias("n_promos"),
        dsum(F.col("l_extendedprice"), "sum_price"),
    )


def q_xsessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: split each user's event stream at >30-minute gaps
    (lag + cumulative-sum-of-flags — the standard single-shuffle
    sessionizer; `session_window` covers the streaming case)."""
    from pyspark.sql import Window

    t = load(spark, sf_dir, "events")
    # ts reads as TIMESTAMP_NTZ from the driver's parquet; session TZ is
    # UTC so the cast is value-identical (NTZ has no epoch arithmetic)
    ev = (
        t["events"]
        .filter(F.col("user_id") < 100)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
            > 1800,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_sess"),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))) / F.lit(1000)
        )
        .cast("long")
        .alias("duration_sec"),
    )


def q_xpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts spread across event-type columns."""
    t = load(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    pv = (
        t["events"]
        .filter(F.col("user_id") < 100)
        .groupBy("user_id")
        .pivot("event_type", kinds)
        .count()
    )
    return pv.select(
        "user_id",
        *[F.coalesce(F.col(k), F.lit(0)).cast("long").alias(k) for k in kinds],
    )


def q_xmerge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval consolidation: merge each user's overlapping activity
    spans ([ts, ts + value minutes]) into union islands — one keyed
    shuffle, shared windows (``operators/rangejoin.py::merge_intervals``)."""
    from kamu_engine_datafusion_spark.operators.rangejoin import (
        merge_intervals,
    )

    t = load(spark, sf_dir, "events")
    iv = t["events"].filter(F.col("user_id") < 200).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("start_us"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + (F.round(F.col("value") * 60, 0)).cast("long") * 1_000_000
        ).alias("end_us"),
    )
    out = merge_intervals(iv, "start_us", "end_us", ["user_id"])
    return out.select("user_id", "island", "start_us", "end_us", "n_merged")


def q_xpipeline_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-side end-to-end pipeline, every stage oracle-replicated:
    (1) SRP-LSH near-dup removal (lower-id survivor) → (2) int8 scalar
    quantization of the SURVIVOR corpus → (3) asymmetric quantized
    search for the vec_id=0 query (exact re-rank to top 20) → (4) MMR
    diversified final top-5. The oracle chains the four stages' CTEs
    bit-for-bit (LCG planes, floor-based codes, 6dp-rounded greedy
    selection)."""
    from kamu_engine_datafusion_spark.operators import dedup as DD

    from kamu_engine_datafusion_spark.operators.dedup import (
        persist_state,
        release_state_intermediates,
    )

    release_state_intermediates()
    t = load(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    sub = emb.filter(F.col("vec_id") < 2000)
    # arrow_exact: bit-identical to the jvm left-to-right fold the
    # oracle replays, at arrow speed (r17)
    pairs = DD.embedding_near_dups(
        sub, threshold=0.4, dim=64, num_bands=8, bits_per_band=4,
        cosine_backend="arrow_exact", signature_backend="arrow_exact",
    )
    # the tiny dup-id set feeds THREE consumers (quantization params,
    # the quantized search, the MMR pool prune) — persist it so the
    # whole near-dup pipeline computes once, not per consumer (r17)
    dups = persist_state(
        pairs.select(F.col("id_b").alias("vec_id")).distinct()
    )
    surv = sub.join(dups, "vec_id", "left_anti")
    qdf = emb.filter(F.col("vec_id") == 0)
    params = S.quantization_params(surv, dim=64)
    top20 = S.topk_quantized(
        surv, qdf, k=20, rerank_factor=4, params=params, dim=64
    )
    pool_corpus = surv.join(
        F.broadcast(top20.select("vec_id")), "vec_id", "left_semi"
    )
    return S.mmr_diversify(pool_corpus, qdf, k=5, pool=20, lam=0.7, dim=64)


def q_xdrift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between the purchase and error event-value
    populations: per-bin PSI contributions on the reference-fixed grid
    (``operators/profile.py::population_stability``)."""
    from kamu_engine_datafusion_spark.operators.profile import (
        population_stability,
    )

    t = load(spark, sf_dir, "events")
    ref = t["events"].filter(F.col("event_type") == "purchase")
    new = t["events"].filter(F.col("event_type") == "error")
    out = population_stability(ref, new, "value", num_bins=10)
    return out.select(
        "bin",
        F.round("bin_lo", 6).alias("bin_lo"),
        F.round("bin_hi", 6).alias("bin_hi"),
        "n_ref",
        "n_new",
        F.round("p_ref", 9).alias("p_ref"),
        F.round("p_new", 9).alias("p_new"),
        F.round("psi", 9).alias("psi"),
    )


def q_xbpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge training (8 merges) on the document corpus — the
    subword-tokenizer learner; the oracle unrolls the same rounds over
    the word-frequency state (``operators/text.py::bpe_merges``)."""
    from kamu_engine_datafusion_spark.operators.text import bpe_merges

    t = load(spark, sf_dir, "documents")
    return bpe_merges(t["documents"], num_merges=8)


def q_xbpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE inference: train 8 merges, then encode the corpus with them
    and emit the top-30 subword frequencies — the train→apply tokenizer
    round-trip (``operators/text.py::bpe_encode_subword_counts``)."""
    from kamu_engine_datafusion_spark.operators.text import (
        bpe_encode_subword_counts,
        bpe_merges,
    )

    t = load(spark, sf_dir, "documents")
    learned = [
        (r["merge_left"], r["merge_right"])
        for r in bpe_merges(t["documents"], num_merges=8).collect()
    ]
    out = bpe_encode_subword_counts(t["documents"], learned)
    return out.orderBy(F.col("n").desc(), "subword").limit(30)


def q_xcdc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium-style CDC → ODF changelog adaptation: a synthesized
    c/u/d stream (op = event_id % 3) with before/after row images maps
    to Append / Retract / CorrectFrom+CorrectTo pairs
    (``operators/changelog.py::cdc_to_ledger``)."""
    from kamu_engine_datafusion_spark.operators.changelog import (
        cdc_to_ledger,
    )

    t = load(spark, sf_dir, "events")
    cdc = t["events"].filter(F.col("event_id") < 3000).select(
        "event_id",
        F.element_at(
            F.array(F.lit("c"), F.lit("u"), F.lit("d")),
            (F.col("event_id") % 3 + 1).cast("int"),
        ).alias("op"),
        F.struct(
            F.col("user_id"), F.round("value", 6).alias("value")
        ).alias("before"),
        F.struct(
            F.col("user_id"), F.round(F.col("value") * 2, 6).alias("value")
        ).alias("after"),
    )
    out = cdc_to_ledger(cdc)
    return out.select(
        "event_id",
        F.col("__half").cast("long").alias("half"),
        F.col("op").cast("long").alias("op"),
        "user_id",
        "value",
    )


def q_xunpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (the reshape complement of xpivot): lineitem
    measure columns to long ``(key, measure, value)`` rows via the
    native ``unpivot`` (Expand node — in-row, zero shuffle)."""
    t = load(spark, sf_dir, "lineitem")
    sub = t["lineitem"].filter(F.col("l_orderkey") < 1000)
    out = sub.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "measure",
        F.round("value", 4).alias("value"),
    )


def q_xsketch_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained-quantile-sketch MERGE path, driver-verified: the
    lineitem stream is split into three disjoint ticks, each sketched
    independently (``operators/sketches.py::quantile_sketch``) and
    folded into the running state with ``quantile_sketch_merge`` — the
    same exact-merge law ``streaming/structured.py::
    maintained_quantile_sketch``'s per-tick fold applies. The oracle
    builds the batch sketch of the FULL table, so a hash match proves
    merge ≡ from-scratch build bit-for-bit through the driver
    (previously only a pytest/Hypothesis property). Returns the
    retained state rows themselves: (grp, rid, val, lvl, thr)."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        quantile_sketch,
        quantile_sketch_merge,
        release_sketch_intermediates,
    )

    # Free the PRIOR invocation's merge intermediates (deferred
    # ledger, see release_sketch_intermediates) — each bench rep /
    # oracle run rebuilds the fold from the parquet inputs.
    release_sketch_intermediates()
    t = load(spark, sf_dir, "lineitem")
    li = t["lineitem"].select(
        F.col("l_returnflag").alias("grp"),
        F.concat("l_orderkey", F.lit("-"), "l_linenumber").alias("rid"),
        F.col("l_quantity").cast("long").alias("val"),
        ((F.col("l_orderkey") + F.col("l_linenumber")) % 3).alias("__tick"),
    )
    # ONE corpus scan for all three tick parts (r18, guide §2.3): the
    # sampling level is a pure function of the row id, so a
    # (grp, tick)-grouped sketch sliced at __tick == i is BIT-IDENTICAL
    # to the sketch built over that tick's rows alone. The merge fold
    # below is unchanged — it still exercises the exact merge law.
    from kamu_engine_datafusion_spark.operators.sketches import (
        persist_sketch,
    )

    fine = persist_sketch(
        quantile_sketch(li, ["grp", "__tick"], "rid", "val", k=256)
    )
    state = None
    for i in range(3):
        part = fine.filter(F.col("__tick") == i).drop("__tick")
        state = (
            part
            if state is None
            else quantile_sketch_merge([state, part], ["grp"], k=256)
        )
    return state.select("grp", "rid", "val", "lvl", "thr")


def q_xsketch_cm_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained-Count-Min MERGE path, driver-verified: documents
    split into three ticks, each reduced to its own 4×256 counter grid
    (``operators/sketches.py::cm_counters``) and folded by cell-wise
    BIGINT addition — exactly ``streaming/structured.py::
    maintained_countmin``'s per-tick fold. The oracle rebuilds the grid
    over the FULL corpus, so the hash match proves fold ≡ one-shot
    grid. At 100 TB each tick's exchange carries ≤ depth·width longs,
    never the key space."""
    from kamu_engine_datafusion_spark.operators.sketches import cm_counters

    t = load(spark, sf_dir, "documents")
    # ONE corpus scan for all three tick grids (r18, guide §2.3): the
    # cell hash is per-occurrence, so the (tick, i, bucket)-keyed grid
    # sliced at __tick == i is bit-identical to the per-tick build;
    # the cell-wise fold below is unchanged.
    fine = cm_counters(
        _bigram_stream(
            t["documents"].withColumn("__tick", F.col("doc_id") % 3),
            extra_cols=("__tick",),
        ),
        "bigram", depth=4, width=256, seed=7,
        extra_group_cols=("__tick",),
    ).localCheckpoint(eager=False)
    state = None
    for i in range(3):
        grid = fine.filter(F.col("__tick") == i).drop("__tick")
        state = (
            grid
            if state is None
            else state.unionByName(grid)
            .groupBy("i", "bucket")
            .agg(F.sum("c").cast("long").alias("c"))
        )
    return state.select(
        F.col("i").cast("long").alias("i"),
        F.col("bucket").cast("long").alias("bucket"),
        "c",
    )


def q_xwinsorize_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-fed winsorization
    (``operators/profile.py::winsorize_from_sketch``): p10/p90 cut
    points read from the mergeable quantile sketch's retained rows
    (integer rank selection over (val, id) order) instead of a
    re-aggregated percentile — the incremental clip path: at 100 TB the
    cuts come from ≤k rows of folded state per group and the clip is
    one broadcast join + in-row least/greatest over the scan. The
    oracle rebuilds the sketch AND the clip, so the exact cut points —
    not just the clip behavior — are hash-verified. Rows are clamped,
    never dropped (left join + pass-through for sketch-less groups)."""
    from kamu_engine_datafusion_spark.operators.profile import (
        winsorize_from_sketch,
    )
    from kamu_engine_datafusion_spark.operators.sketches import (
        quantile_sketch,
    )

    t = load(spark, sf_dir, "lineitem")
    li = t["lineitem"].select(
        F.col("l_returnflag").alias("grp"),
        F.concat("l_orderkey", F.lit("-"), "l_linenumber").alias("rid"),
        F.col("l_quantity").cast("long").alias("val"),
    )
    sk = quantile_sketch(li, ["grp"], "rid", "val", k=256)
    out = winsorize_from_sketch(
        li, sk, "val", ["grp"], "rid", lower=(1, 10), upper=(9, 10)
    )
    return out.select("grp", "rid", "val", "val_winsorized")


def q_xdedup_index_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The verified near-dup EDGE set of the incremental index dedup
    (``operators/dedup.py::dedup_increment_against_index`` with
    ``emit_pairs=True``): docs < 150 form the persisted MinHash index,
    docs 150–299 the increment; pairs are banded-LSH candidates
    (index-vs-new AND new-vs-new, reusing the same joins the survivor
    set pays for) verified by the 16-hash agreement estimate ≥ 0.7.
    These edges feed the persisted component state
    (``cc_increment`` / ``maintained_components``) — their exact
    content deserves a driver hash, not just the survivor counts
    (``xdedup_incremental``) or the closed components
    (``xdedup_cc_incremental``). Poly-hash profile so the oracle
    replays signatures, banding, and the estimate. r13: the persisted
    index rides the SPLIT layout (``minhash_index_split`` — 16 B band
    rows probed, signatures joined for candidates only), re-certified
    by this key's hash staying green across the format change."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        dedup_increment_against_index,
        minhash_index_split,
    )

    t = load(spark, sf_dir, "documents")
    base = t["documents"].filter(F.col("doc_id") < 150)
    inc = t["documents"].filter(
        (F.col("doc_id") >= 150) & (F.col("doc_id") < 300)
    )
    index = minhash_index_split(
        base, num_hashes=16, num_bands=4, base_hash="poly"
    )
    _, _, pairs = dedup_increment_against_index(
        inc,
        index,
        threshold=0.7,
        num_hashes=16,
        num_bands=4,
        max_bucket_size=None,
        base_hash="poly",
        emit_pairs=True,
        # the returned edges read vs_index/within pairs directly; the
        # dead-id set (survivors/new-index legs) is DISCARDED by this
        # key — its eager count job computed a frame nothing consumes
        eager_dead=False,
    )
    return pairs


def q_xtext_repetition_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals
    (``operators/text.py::repetition_report``) — the other half of the
    Gopher quality table (Rae et al. 2021, Table A1) beyond
    ``gopher_rules``: dup-line fraction, dup-line CHAR fraction, chars
    covered by the single most frequent word {2,3}-gram (deterministic
    argmax: count desc, gram asc), and chars on repeated {5,10}-grams
    (count ≥ 2, capped at 1.0) — the boilerplate/templated-spam signals
    that pass length-based rules. All half-up 6dp; empty docs report
    defined zeros. Scale: one explode per n into a two-level
    partial+final aggregate keyed on the uniform doc id; line stats are
    in-row at scan speed."""
    from kamu_engine_datafusion_spark.operators.text import (
        repetition_report,
    )

    t = load(spark, sf_dir, "documents")
    return repetition_report(
        t["documents"], "doc_id", "text", top_ns=(2, 3), dup_ns=(5, 10)
    )


def q_xsource_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source token-distribution divergence
    (``operators/text.py::source_token_tvd``): total variation distance
    over relative token frequencies restricted to the corpus top-500
    vocabulary, for every src_a < src_b pair — the DoReMi-style
    mixture-design signal (distribution shift, not content overlap).
    TVD deliberately over KL/JSD: ``Σ|c·T_b − d·T_a| / (2·T_a·T_b)``
    is exact BIGINT until ONE final division (no libm), so the oracle
    replays it bit-for-bit. Scale: one corpus explode into a
    (source, token) partial+final count; everything downstream runs on
    the bounded ≤ top_v·#sources count frame."""
    from kamu_engine_datafusion_spark.operators.text import source_token_tvd

    t = load(spark, sf_dir, "documents")
    return source_token_tvd(t["documents"], "source", "text", top_v=500)


def q_xcentroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise group embedding-centroid shift
    (``operators/clustering.py::group_centroid_shift``): per-label
    quantized centroids (half-up ×10⁴, floor-div BIGINT coordinates —
    the Lloyd-loop discipline) and, for every grp_a < grp_b pair, the
    normalized squared centroid distance plus both groups' mean squared
    radius — the drift gate run before mixing a new crawl slice into a
    corpus (shift ≫ radius = different population). Exact BIGINT until
    the final normalizations (half-up 6dp). Scale: ONE partial+final
    aggregate emitting groups × (dim+2) longs; the corpus is scanned
    once and never shuffled."""
    from kamu_engine_datafusion_spark.operators.clustering import (
        group_centroid_shift,
    )

    t = load(spark, sf_dir, "embeddings")
    emb = t["embeddings"].select(
        F.col("label").cast("long").alias("grp"), "vec_id", "embedding"
    )
    return group_centroid_shift(
        emb, "grp", "vec_id", "embedding", dim=64, scale=10_000, dp=6
    )


def q_xdecontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered exact decontamination
    (``operators/decontaminate.py::bloom_flag_contaminated``): the
    benchmark's distinct 5-gram shingles build a 2¹⁶-bit Bloom bitmap
    (universal-family bit positions over xxhash64) that filters each
    corpus document's shingles IN-ROW at scan speed; only the
    Bloom-positive sliver joins the true benchmark set, which kills the
    false positives. A Bloom filter has no false negatives, so the
    result is EXACTLY ``flag_contaminated`` — the oracle replays the
    direct exact rule, so the hash match PROVES the two-phase path
    drops nothing. The deliberately small 2¹⁶ bitmap (~4% fpr at
    sf0.01) exercises the verify stage. At 100 TB the bitmap is 8 KiB
    of broadcast DATA (never literals inside an interpreted lambda —
    the 22× rule) and a clean corpus never leaves the scan stage."""
    from kamu_engine_datafusion_spark.operators.decontaminate import (
        bloom_flag_contaminated,
    )

    t = load(spark, sf_dir, "documents")
    corpus = t["documents"].filter(F.col("doc_id") < 400)
    bench = t["documents"].filter(F.col("doc_id") >= 450)
    return bloom_flag_contaminated(
        corpus, bench, shingle_len=5, threshold=1,
        m_bits=1 << 16, k_hashes=4, hash_fn="xxhash64",
    )


def q_xsample_weighted_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained-weighted-sample MERGE LAW, driver-verified: the
    documents stream is split into three disjoint ticks; each tick's
    rows get their Efraimidis–Spirakis A-Res keys
    (``operators/sampling.py::ares_key`` — id-hash uniforms, never
    ``rand()``) and the per-lang top-50 state is re-taken after each
    union — exactly ``streaming/structured.py::
    maintained_weighted_sample``'s per-tick fold. Because the key is a
    pure function of the row id, ``topn(A ∪ B) == topn(topn(A) ∪ B)``,
    so the oracle draws directly from the FULL ledger
    (the ``xsample_weighted_group`` oracle) and a hash match proves
    fold ≡ batch draw row-for-row through the driver. State per group
    never exceeds n rows — per-tick cost O(increment + state)."""
    from pyspark.sql import Window

    from kamu_engine_datafusion_spark.operators.sampling import ares_key

    t = load(spark, sf_dir, "documents")
    d = t["documents"]
    w = F.col("n_chars").cast("double")
    rank_w = Window.partitionBy("lang").orderBy(
        F.col("__akey").desc(), F.col("doc_id")
    )
    state = None
    for i in range(3):
        inc = (
            d.filter((F.col("doc_id") % 3 == i) & (w > 0))
            .select(
                "doc_id", "lang", "n_chars",
                ares_key("doc_id", "n_chars", 0, "poly").alias("__akey"),
            )
        )
        merged = inc if state is None else inc.unionByName(state)
        state = (
            merged.withColumn("__rn", F.row_number().over(rank_w))
            .filter(F.col("__rn") <= 50)
            .drop("__rn")
        )
    return state.select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )


def q_xbm25_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 from MAINTAINED corpus statistics, driver-verified: the
    corpus is split into three ticks, each reduced to its additive
    term-stats increment (``operators/retrieval.py::
    term_stats_increment``) and folded by per-term summation — exactly
    ``streaming/structured.py::maintained_term_stats``'s fold — then
    the whole corpus is scored with ``bm25_from_stats`` against the
    folded state. The oracle is the direct batch BM25 (the ``xbm25``
    formula), so the hash match proves fold ≡ batch stats AND
    from-stats scoring ≡ corpus-rescan scoring through the driver. At
    100 TB only the tick is ever tokenized; state is vocab-sized."""
    from kamu_engine_datafusion_spark.operators.retrieval import (
        bm25_from_stats,
        term_stats_increment,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"]
    stats = None
    for i in range(3):
        inc = term_stats_increment(d.filter(F.col("doc_id") % 3 == i))
        if stats is None:
            stats = inc
        else:
            stats = (
                stats.unionByName(inc)
                .groupBy("term")
                .agg(
                    F.sum("df").cast("long").alias("df"),
                    F.sum("n_docs").cast("long").alias("n_docs"),
                    F.sum("tot_len").cast("long").alias("tot_len"),
                    F.sum("n_len").cast("long").alias("n_len"),
                )
            )
    out = bm25_from_stats(d, _BM25_TERMS, _ckpt_state(stats))
    return out.select(
        "doc_id", "n_terms_matched", F.round("score", 4).alias("score")
    )


def q_xlm_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid Backoff trigram LM scoring (Brants et al. 2007) of the
    whole corpus against the doc_id < 250 reference slice — the CCNet
    perplexity-filter shape with counts-only backoff. Docs outside the
    reference exercise all three backoff branches (attested trigram /
    backed-off bigram / add-one-floored unigram); the oracle replays
    the exact count CTEs + backoff CASE
    (``operators/text.py::stupid_backoff_score``)."""
    from kamu_engine_datafusion_spark.operators.text import (
        stupid_backoff_score,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"]
    return stupid_backoff_score(d, reference=d.filter(F.col("doc_id") < 250))


def q_xdistinctive_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fightin' Words distinctive vocabulary per lang (Monroe, Colaresi
    & Quinn 2008): Dirichlet-smoothed log-odds z-scores, top-10 tokens
    per group — counts exact BIGINT, ln/sqrt the same-machine-libm
    class (``operators/text.py::distinctive_tokens``)."""
    from kamu_engine_datafusion_spark.operators.text import (
        distinctive_tokens,
    )

    t = load(spark, sf_dir, "documents")
    return distinctive_tokens(t["documents"], "lang", "text", top_k=10)


def q_xnegative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-ring negative sampling for contrastive training
    (``operators/sampling.py::negative_samples``): each doc's 4 ring
    neighbors in keyed-poly-hash order within 8 hash shards — join-free
    as-if-random negatives, a pure function of (id set, salt). The
    oracle replays the ring: h = (poly31(reverse(id)) · k_salt) mod
    M31 — the REVERSE + multiplicative salt mix is load-bearing
    (poly31 of same-length strings is monotone in trailing chars)."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        negative_samples,
    )

    t = load(spark, sf_dir, "documents")
    return negative_samples(
        t["documents"], "doc_id", k=4, salt=0, hash_fn="poly",
        mode="sharded", shards=8,
    )


def q_xtop_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-principal-component anisotropy diagnostic over the
    embeddings corpus (``operators/clustering.py::
    top_principal_component``): 8 fixed-point L∞ power iterations, all
    integer (quantize scale=1000 per the recorded overflow bound), so
    the ENTIRE trajectory — init mix, floor-div normalize with the
    negative-quotient branch, sign pin — replays exactly in the
    oracle's 8 unrolled MATERIALIZED CTE iterations. var_share is the
    one float division, half-up 6dp."""
    from kamu_engine_datafusion_spark.operators.clustering import (
        top_principal_component,
    )

    t = load(spark, sf_dir, "embeddings")
    return top_principal_component(
        t["embeddings"], "vec_id", "embedding", dim=64, scale=1000
    )


def _phash_twin_corpus(docs: DataFrame) -> DataFrame:
    """(media_id, phash) corpus with a KNOWN near-dup ground truth:
    the sha256-stub pHashes of ``docs`` plus, for each, a synthetic
    twin (id + 100000) whose hash differs in exactly 2 known bits —
    flipped hex-side on the 32-bit halves. Shared by
    ``xmm_phash_neardup`` and ``xmm_phash_incremental``."""
    base = M.perceptual_hash(
        M.synthesize_media(docs, "doc_id", "text"), use_real_codecs=False
    )
    hi = F.conv(F.substring("phash", 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring("phash", 9, 8), 16, 10).cast("long")
    b1 = F.pmod(F.col("media_id"), F.lit(64))
    b2 = F.pmod(F.col("media_id") + F.lit(31), F.lit(64))
    # bit masks per 32-bit half (shiftleft needs an INT column via expr)
    mhi = F.when(
        b1 >= 32,
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(media_id, 64) - 32 AS INT))"),
    ).otherwise(F.lit(0)) + F.when(
        b2 >= 32,
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), "
            "CAST(pmod(media_id + 31, 64) - 32 AS INT))"
        ),
    ).otherwise(F.lit(0))
    mlo = F.when(
        b1 < 32,
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(media_id, 64) AS INT))"),
    ).otherwise(F.lit(0)) + F.when(
        b2 < 32,
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(pmod(media_id + 31, 64) AS INT))"
        ),
    ).otherwise(F.lit(0))
    twins = base.select(
        (F.col("media_id") + F.lit(100_000)).alias("media_id"),
        F.format_string(
            "%08x%08x", hi.bitwiseXOR(mhi), lo.bitwiseXOR(mlo)
        ).alias("phash"),
    )
    return base.select("media_id", "phash").unionByName(twins)


def q_xmm_phash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental image dedup against a persisted pHash index
    (``operators/dedup.py::phash_index`` +
    ``phash_increment_against_index``): the twin corpus's ids < 100
    form the index; the increment (docs 100–199 + ALL twins) dedups
    against it and within itself — any-index-match dies,
    lower-id-wins within. Blobs are never re-decoded; the probe is a
    pigeonhole-block equi-join with guaranteed recall at Hamming ≤ 3.
    The oracle replays the fingerprints and brute-forces every pair,
    so the hash match proves the incremental path drops exactly the
    true near-dups. Survivors: the 100 non-twin increment docs."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        phash_increment_against_index,
        phash_index,
    )

    t = load(spark, sf_dir, "documents")
    corpus = _phash_twin_corpus(
        t["documents"].filter(F.col("doc_id") < 200)
    )
    idx = phash_index(
        corpus.filter(F.col("media_id") < 100),
        "media_id", "phash", max_hamming=3, num_blocks=4,
    )
    survivors, _new_rows = phash_increment_against_index(
        corpus.filter(F.col("media_id") >= 100), idx,
        "media_id", "phash", max_hamming=3, num_blocks=4,
    )
    return survivors.select("media_id")


def _with_synthetic_urls(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic ``url`` column over the documents table
    (documents carries no url — the ``xtext_redact_pii`` synthesized-
    column pattern): the CANONICAL form is a pure function of
    ``g = doc_id % 120`` (scheme, host, multi-label TLD, path, the
    load-bearing ``id`` param), while per-row noise that
    canonicalization must remove — scheme/host case, explicit default
    ports, utm_* tracking params, fragments, a bare-host trailing
    slash — is keyed on ``doc_id`` itself, so rows in the same group
    present DIFFERENT raw urls with the SAME canonical form."""
    d = F.col("doc_id")
    g = d % 120
    scheme = F.when(g % 2 == 0, F.lit("https")).otherwise(F.lit("http"))
    host = F.concat(
        F.when(g % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("site"),
        (g % 40).cast("string"),
        F.when(g % 4 == 0, F.lit(".co.uk"))
        .when(g % 4 == 1, F.lit(".com"))
        .when(g % 4 == 2, F.lit(".org"))
        .otherwise(F.lit(".io")),
    )
    scheme_raw = F.when(d % 5 == 0, F.upper(scheme)).otherwise(scheme)
    host_raw = F.when(d % 5 == 0, F.upper(host)).otherwise(host)
    port = F.when(
        d % 3 == 0,
        F.when(g % 2 == 0, F.lit(":443")).otherwise(F.lit(":80")),
    ).otherwise(F.lit(""))
    pathq = F.when(
        g % 5 == 0,
        # bare-host group: no query; half the rows carry the trailing
        # slash canonicalization strips
        F.when(d % 2 == 0, F.lit("/")).otherwise(F.lit("")),
    ).otherwise(
        F.concat(
            F.lit("/p/"),
            (g % 9).cast("string"),
            F.lit("?utm_source=s"),
            (d % 4).cast("string"),
            F.lit("&id="),
            (g % 7).cast("string"),
            F.when(d % 2 == 0, F.lit("&utm_campaign=c")).otherwise(
                F.lit("")
            ),
        )
    )
    frag = F.when(
        d % 4 == 0, F.concat(F.lit("#sec"), (d % 6).cast("string"))
    ).otherwise(F.lit(""))
    return docs.withColumn(
        "url",
        F.concat(scheme_raw, F.lit("://"), host_raw, port, pathq, frag),
    )


def q_xurl_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-exact dedup after conservative canonicalization
    (``operators/url.py`` — the Dolma/RefinedWeb first pass): raw urls
    synthesized with case/port/tracking-param/fragment/trailing-slash
    noise collapse to their canonical form; lowest doc_id per
    canonical survives, and the survivors report canonical url +
    registered (pay-level) domain incl. the multi-label-TLD branch.
    Pure column regexps, zero UDFs; the oracle constructs the
    canonical form directly from the synthesis arithmetic."""
    from kamu_engine_datafusion_spark.operators.url import (
        canonicalize_url,
        dedup_by_url,
        registered_domain,
    )

    t = load(spark, sf_dir, "documents")
    u = _with_synthetic_urls(t["documents"])
    surv = dedup_by_url(u, "url", "doc_id")
    return surv.select(
        "doc_id",
        canonicalize_url("url").alias("canon_url"),
        registered_domain("url").alias("domain"),
    )


def q_xdomain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap + domain-mix data card — the actual
    RefinedWeb first pass, composed from ``registered_domain`` →
    ``cap_per_group`` (keyed-hash order, map-side WindowGroupLimit) →
    ``corpus_card`` grouped by domain: no registered domain
    contributes more than 5 docs, and the card reports each surviving
    domain's doc/token counts, length profile, and exact dup rate."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        cap_per_group,
    )
    from kamu_engine_datafusion_spark.operators.text import corpus_card
    from kamu_engine_datafusion_spark.operators.url import (
        registered_domain,
    )

    t = load(spark, sf_dir, "documents")
    u = _with_synthetic_urls(t["documents"]).withColumn(
        "domain", registered_domain("url")
    )
    capped = cap_per_group(u, "doc_id", "domain", cap=5, hash_fn="poly")
    return corpus_card(capped, group_cols=["domain"]).select(
        "domain",
        "n_docs",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "avg_tokens",
        "pct_short",
        "n_distinct_texts",
        "dup_rate",
    )


def _norm_md5():
    """md5 of the whitespace-normalized text — the exact_dedup
    normalization; effectively seeded-random KMV keys (the fixture
    class the poly31 bottom-k estimators need: sequential strings
    cluster the hash into a low band)."""
    return F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    )


def q_xsketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang KMV distinct-count sketch estimate over md5-normalized
    texts (``operators/sketches.py::kmv_sketch``/``kmv_estimate``,
    Bar-Yossef 2002 / Beyer 2007): k=100 puts en (218 distinct texts
    at sf0.01) in the (k−1)/u_k estimate regime and the other langs in
    the below-k exact regime — both branches of the estimate CASE are
    hash-verified. At 100 TB the state is ≤ k longs per group: the
    distinct count of an arbitrary-cardinality key column maintained
    without a full key shuffle."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"].select(
        F.col("lang").alias("grp"), _norm_md5().alias("__h")
    )
    sk = kmv_sketch(d, ["grp"], "__h", k=100, hash_fn="poly")
    return kmv_estimate(sk, ["grp"], k=100, dp=4)


def q_xsketch_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV MERGE LAW, driver-verified: documents split into three
    disjoint ticks, each sketched independently
    (``operators/sketches.py::kmv_sketch``) and folded with
    ``kmv_merge`` — exactly ``streaming/structured.py::
    maintained_kmv``'s per-tick fold. The KMV state (the k smallest
    distinct key hashes) is a pure function of the input SET, so the
    oracle builds the batch sketch of the FULL table: a hash match
    proves fold ≡ from-scratch build row-for-row through the driver
    (previously a pytest/Hypothesis property). Returns the retained
    state rows themselves: (grp, hv)."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        kmv_merge,
        kmv_sketch,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"].select(
        "doc_id", F.col("lang").alias("grp"), _norm_md5().alias("__h")
    )
    state = None
    for i in range(3):
        part = kmv_sketch(
            d.filter(F.col("doc_id") % 3 == i),
            ["grp"], "__h", k=100, hash_fn="poly",
        )
        state = (
            part if state is None else kmv_merge([state, part], ["grp"], 100)
        )
    return state.select("grp", "hv")


def q_xkmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jaccard AND directional containment between corpora
    computed from their KMV sketches ALONE (Beyer et al. 2007 §5 /
    Cohen & Kaplan 2007 bottom-k set-operation estimates;
    ``operators/sketches.py::kmv_pairwise_jaccard`` /
    ``kmv_pairwise_containment``): both matrices read the same
    union-top-k membership frame over ≤ k state rows per group — the
    cross-source overlap monitor that never re-touches the corpus.
    Three synthetic corpora with KNOWN overlap are built from doc-id
    slices ('all' = every doc, 'even' = doc_id % 2 = 0, 'low' =
    doc_id < 250; keys = md5-normalized text, the seeded-random
    class), so containment exposes the subset sources ('even'⊂'all',
    'low'⊂'all' near 1.0) that the symmetric Jaccard (~0.5) dilutes.
    r13: rides the one-pass ``kmv_overlap_monitor`` (both estimators
    share ONE union-top-k membership frame) — identical output,
    re-certified by this key's hash staying green across the change;
    the monitor is also the read-side of the maintained overlap
    monitor (``streaming.read_maintained_kmv_overlap``)."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        kmv_overlap_monitor,
        kmv_sketch,
    )

    t = load(spark, sf_dir, "documents")
    base = t["documents"].select("doc_id", _norm_md5().alias("__h"))
    d = (
        base.withColumn("grp", F.lit("all"))
        .unionByName(
            base.filter(F.col("doc_id") % 2 == 0).withColumn(
                "grp", F.lit("even")
            )
        )
        .unionByName(
            base.filter(F.col("doc_id") < 250).withColumn(
                "grp", F.lit("low")
            )
        )
    )
    sk = kmv_sketch(d, ["grp"], "__h", k=128, hash_fn="poly")
    return kmv_overlap_monitor(sk, "grp", k=128, dp=4)


def q_xheavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT φ-heavy hitters over the corpus bigram stream via
    Count-Min candidates + exact verify (``operators/sketches.py::
    verified_heavy_hitters``): the CM overestimate theorem makes phase
    1 false-negative-free, so the two-phase result EQUALS the direct
    ``GROUP BY HAVING freq ≥ ⌈φN⌉`` rule — which IS the oracle
    (hash-independent, the ``bloom_flag_contaminated`` proof shape
    applied to frequency). φ=1/800 over ~27k bigrams (916 distinct at
    sf0.01, vs the 4×256 grid → real collision noise for the verify
    pass to prune; non-vacuous at every SF: 206/227/19 hitters). At 100 TB phase 1's exchange is ≤ depth·width
    longs per partition and phase 2 counts only the broadcast-small
    candidate sliver — the full-key-space groupBy never happens."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        verified_heavy_hitters,
    )

    t = load(spark, sf_dir, "documents")
    bg = _bigram_stream(t["documents"])
    return verified_heavy_hitters(
        bg, "bigram", phi_num=1, phi_den=800, depth=4, width=256,
        seed=7, hash_fn="poly",
    )


def q_xcorpus_card_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained CORPUS DATA CARD fold, driver-verified
    (``streaming/structured.py::corpus_card_increment`` /
    ``corpus_card_fold`` / ``corpus_card_from_state`` — the exact
    code ``maintained_corpus_card`` folds per tick): documents split
    into three ticks; scalars fold additively, the distinct-texts side
    folds by the KMV merge law; the read-back card reports per-lang
    docs/tokens/short-rate plus the dup-rate estimate and the
    ``is_exact`` regime flag (k=100: en rides the KMV estimate, the
    other langs are exact). The oracle replays the whole composition —
    the card a 100 TB curation pipeline keeps live without re-scanning
    history."""
    from kamu_engine_datafusion_spark.streaming.structured import (
        corpus_card_fold,
        corpus_card_from_state,
        corpus_card_increment,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"]
    state = None
    for i in range(3):
        inc = corpus_card_increment(
            d.filter(F.col("doc_id") % 3 == i), "lang", "text",
            k=100, short_doc_tokens=20, hash_fn="poly",
        )
        state = corpus_card_fold(state, inc, k=100)
    return corpus_card_from_state(_ckpt_state(state), k=100, dp=4)


def q_xhard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN hard-negative mining for contrastive training
    (``operators/similarity.py::hard_negatives``, Robinson et al.
    2021): for each of 5 anchors, the 4 most-similar corpus vectors
    with a DIFFERENT label — one corpus pass, anchors ride the closure
    under the loud cap, same-label and self candidates masked in the
    Arrow kernel, exact per-batch top-k prune. Ordering bridged across
    engines by 4dp cosine rounding + id tie-break (the
    ``xsim_topk_batch`` class)."""
    from kamu_engine_datafusion_spark.operators.similarity import (
        hard_negatives,
    )

    t = load(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    return hard_negatives(emb, emb.filter(F.col("vec_id") < 5), k=4)


def q_xrater_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's-kappa agreement between the labeled ``lang`` column and
    the stopword langid prediction (``operators/profile.py::
    rater_agreement``, Cohen 1960) — chance-corrected label QA, the
    scalar companion of the ``xlangid_eval`` confusion matrix: exact
    BIGINT cells → po/pe/κ half-up 6dp from exact integer sums, so the
    one-row result is engine-portable. Scale: one |labels|²-sized
    groupBy; everything after runs on that bounded table."""
    from kamu_engine_datafusion_spark.operators.profile import (
        rater_agreement,
    )

    t = load(spark, sf_dir, "documents")
    preds = X.predict_language(t["documents"], "text", keep_cols=("lang",))
    return rater_agreement(preds, "lang", "pred_lang", dp=6)


def q_xminhash_index_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained MinHash dedup index, driver-verified: three
    id-ordered ticks fold through ``dedup_increment_against_index``
    with the accumulating SPLIT index — the exact batch semantics of
    ``streaming/structured.py::maintained_minhash_index``'s per-tick
    fold (tick-by-tick ≡ batch incremental path is pytest-pinned; this
    key hashes the batch path through the driver). Returns the final
    index state in ``read_maintained_minhash_index``'s classic frame —
    every surviving doc's band rows with the signature as a CSV string
    — so the stored state itself (band keys AND signatures), not just
    survivor counts, is hash-verified against an oracle that replays
    signatures, banding, the agreement estimate, and the three-tick
    any-index-match-dies / lower-id-wins-within chain."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        dedup_increment_against_index,
        minhash_index_split,
        minhash_signatures,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"]
    # empty split index of the right shape
    bands, sigs = minhash_index_split(
        d.filter(F.col("doc_id") < 0),
        num_hashes=16, num_bands=4, base_hash="poly",
    )
    ranges = ((0, 100), (100, 200), (200, 300))
    ticks = [
        d.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for lo, hi in ranges
    ]
    # The signature kernel depends only on the tick's rows, never on
    # the fold state — only the probe join is state-dependent. The
    # serial loop paid one driver-synchronized kernel job per tick
    # (each increment's eager dead-count job recomputed sigs inline);
    # materialize all three ticks' signatures CONCURRENTLY up front
    # (r18, guide §2.6) and fold only the metadata-sized probe joins
    # serially. Identical frames — just checkpointed earlier.
    tick_sigs = _ckpt_parallel(
        [
            minhash_signatures(
                tick, "text", "doc_id", 3, 16, base_hash="poly"
            )
            for tick in ticks
        ]
    )
    for tick, psigs in zip(ticks, tick_sigs):
        _, (new_bands, new_sigs) = dedup_increment_against_index(
            tick,
            (bands, sigs),
            threshold=0.7,
            num_hashes=16,
            num_bands=4,
            max_bucket_size=None,
            base_hash="poly",
            precomputed_sigs=psigs,
            # every consumer materializes inside the ONE final action
            # (lazy state levels) — the per-tick cache-populating
            # count jobs are pure fixed cost here (r18 within-JVM A/B:
            # eager loses all 4 alternating arms, ~3.7 vs ~3.3 s)
            eager_dead=False,
        )
        # The accumulated index is metadata-sized (≤ docs × bands rows)
        # and each tick references it TWICE (probe join + union) — the
        # 2^ticks chained-fold recompute. localCheckpoint each level
        # (LAZY since r17 — the next tick's eager banded/dead jobs
        # materialize it; within-JVM A/B 3.6-3.9 -> 3.5-3.8 s warm,
        # 6.7 -> 3.9 s cold): unlike persist it also
        # TRUNCATES the logical plan, so per-tick analysis stays flat —
        # persist-only levels still re-analyzed the whole nested union
        # tree per eager job (r17: 14.2 s → 12.1 s persisted → 6.0 s
        # warm checkpointed at sf0.1).
        bands = bands.unionByName(new_bands).localCheckpoint(eager=False)
        sigs = sigs.unionByName(new_sigs).localCheckpoint(eager=False)
    classic = bands.join(sigs, "doc_id")
    return classic.select(
        "doc_id",
        F.col("__band").alias("band_key"),
        F.array_join(
            F.transform(F.col("sig"), lambda c: c.cast("string")), ","
        ).alias("sig_csv"),
    )


def _semdedup_fold(
    spark: SparkSession, sf_dir: str, n_ticks: int = 3
):
    """Shared 3-tick incremental-SemDeDup fold of ``xsemdedup_
    incremental`` and ``xann_semdedup_topk`` — ONE maintained store,
    TWO reads. Frozen centroids are the first 8 vectors by vec_id,
    scale-quantized (the k-means ``c0`` init rule — bounded k-row
    collect); ticks are ``vec_id % 3``; survivors accumulate exactly
    like ``streaming/structured.py::maintained_semdedup_index``'s
    per-tick fold (pytest-pinned tick-by-tick ≡ this batch path).
    ``n_ticks`` folds only the first n ticks — the per-store
    freshness key builds a deliberately STALER ANN store from 2 of
    the 3 ticks. Returns ``(centroids, state_rows)``."""
    from kamu_engine_datafusion_spark.operators.clustering import (
        quantize_vectors,
        semdedup_increment_against_index,
        semdedup_state_rows,
    )
    t = load(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    # limit BEFORE quantizing (r17): quantization is per-row, so the
    # first-8-by-id centroids are identical, and the old order eagerly
    # checkpointed the WHOLE corpus quantization to collect 8 rows.
    cents = [
        [int(v) for v in r["__qv"]]
        for r in quantize_vectors(
            emb.orderBy("vec_id").limit(8), "vec_id", "embedding",
            10_000,
        )
        .orderBy("vec_id")
        .collect()
    ]
    state = None
    for i in range(n_ticks):
        inc = semdedup_state_rows(
            emb.filter(F.col("vec_id") % 3 == i),
            cents,
            "vec_id",
            "embedding",
        )
        new = semdedup_increment_against_index(inc, state, tau2_num=2_025)
        # The accumulated survivor state is metadata-sized and each
        # tick references it TWICE (kill join + union) — checkpoint
        # each level so the fold is linear (not 2^ticks) AND the plan
        # tree stays flat across ticks (the cc_increment device; r17 —
        # persist-only levels still re-analyzed the nested tree per
        # job). r18 re-examined persist-per-level + eager counts: a
        # clean clearCache'd within-JVM alternating A/B reads both
        # inside host noise (lazyckpt median 4.2 s vs 6.8 s, arms
        # overlapping) — the lazy checkpoint already shares each level
        # as ONE RDD across its dual reference with zero extra jobs,
        # so it stays.
        state = (
            new if state is None else state.unionByName(new)
        ).localCheckpoint(eager=False)
    return cents, state


def q_xsemdedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained SemDeDup index fold, driver-verified — the
    semantic leg of the maintained-dedup triad (MinHash text / pHash
    image / SemDeDup embedding): three ``vec_id % 3`` ticks fold
    through ``operators/clustering.py::semdedup_increment_against_
    index`` against the accumulating survivor index (frozen-centroid
    integer assignment; division-free BIGINT cosine² ≥ τ² at τ=0.45 —
    loosened like ``xcluster_semdedup`` because random embeddings are
    near-orthogonal; an increment row dies on any same-cluster INDEXED
    SURVIVOR match or any lower-id same-tick match, dead or alive) —
    exactly ``streaming/structured.py::maintained_semdedup_index``'s
    per-tick fold, pytest-pinned tick-by-tick. Returns the final state
    rows ``(vec_id, cluster, n2)`` so the stored index itself is
    hash-verified: the oracle replays quantization, the integer
    argmin over the c0 centroids, and the three-tick kill chain."""
    _, state = _semdedup_fold(spark, sf_dir)
    return state.select("vec_id", "cluster", "n2")


def q_xann_semdedup_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k served FROM the maintained SemDeDup store
    (``streaming/structured.py::read_maintained_ann_topk`` — state is
    an IVF index by construction: cluster == list == bucket key, so a
    query reads ``nprobe/nlist`` of the store, already deduped at fold
    time): probe selection replays the fold's integer argmin
    (``ann_probe_clusters`` — ``dist·k + cid`` over the frozen
    centroids, lower-cid ties), scoring is exact cosine over the
    stored sim_scale payload (``ann_topk_from_state_rows`` — integer
    dot, one division, half-up 6dp, order (cosine DESC, vec_id), top
    10). The query vector is the corpus's vec_id-0 embedding
    (SQL-replayable from the table itself); nprobe=3 of 8 lists —
    the oracle replays the probe-list rule too, so the pruning
    decision itself is hash-verified."""
    from kamu_engine_datafusion_spark.streaming.structured import (
        ann_probe_clusters,
        ann_topk_from_state_rows,
    )

    t = load(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    cents, state = _semdedup_fold(spark, sf_dir)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    probed = ann_probe_clusters(cents, qvec, nprobe=3, scale=10_000)
    return ann_topk_from_state_rows(
        state.filter(F.col("cluster").isin(probed)),
        qvec,
        k=10,
        sim_scale=1_000,
        dp=6,
    )


def q_xkmv_overlap_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained cross-source overlap MONITOR, driver-verified:
    three doc-id ticks of three known-overlap corpora ('all' = every
    doc, 'half' = doc_id < 250, 'mod3' = doc_id % 3 = 0) fold through
    ``kmv_merge`` — exactly ``streaming/structured.py::
    maintained_kmv``'s per-tick fold — and the live matrix is
    ``kmv_overlap_monitor`` over the folded state, exactly
    ``read_maintained_kmv_overlap``'s read: pairwise Jaccard AND both
    directional containments from |groups|²·k metadata rows, the
    corpus never re-read. The KMV state is a pure function of the
    input SET, so the oracle builds the batch sketch of the full
    slices — a hash match proves fold ≡ batch AND monitor-read ≡
    batch monitor through the driver."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        kmv_merge,
        kmv_overlap_monitor,
        kmv_sketch,
    )

    t = load(spark, sf_dir, "documents")
    base = t["documents"].select("doc_id", _norm_md5().alias("__h"))
    d = (
        base.withColumn("grp", F.lit("all"))
        .unionByName(
            base.filter(F.col("doc_id") < 250).withColumn(
                "grp", F.lit("half")
            )
        )
        .unionByName(
            base.filter(F.col("doc_id") % 3 == 0).withColumn(
                "grp", F.lit("mod3")
            )
        )
    )
    state = None
    for i in range(3):
        part = kmv_sketch(
            d.filter(F.col("doc_id") % 3 == i),
            ["grp"], "__h", k=96, hash_fn="poly",
        )
        state = (
            part if state is None else kmv_merge([state, part], ["grp"], 96)
        )
    return kmv_overlap_monitor(state, "grp", k=96, dp=4)


def q_xcurriculum_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch-fed curriculum stages
    (``operators/sampling.py::curriculum_from_sketch``) — the
    ORACLE-HASHABLE curriculum: stage boundaries are the 3 interior
    quartiles of the per-lang hash-level quantile sketch (integer rank
    selection over (val, rid) order — a deterministic function of the
    input SET, so the cuts themselves are SQL-replayable, unlike
    ntile's per-stratum sort or percentile_approx), and assignment is
    in-row ``stage = 1 + #{cuts < difficulty}`` with boundary-equal
    rows going to the LOWER stage. Difficulty = n_chars. At 100 TB the
    boundaries read ≤ k rows of maintained sketch state per group
    (``maintained_quantile_sketch`` — the fold is an exact merge,
    pytest-pinned) and the corpus is never sorted per stratum."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        curriculum_from_sketch,
    )
    from kamu_engine_datafusion_spark.operators.sketches import (
        quantile_sketch,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"].select(
        "doc_id",
        "lang",
        F.col("doc_id").cast("string").alias("rid"),
        F.col("n_chars").alias("val"),
    )
    sk = quantile_sketch(d, ["lang"], "rid", "val", k=128)
    out = curriculum_from_sketch(
        d, sk, "val", ["lang"], "rid", n_stages=4
    )
    return out.select("doc_id", "lang", "val", "stage")


def q_xdrift_psi_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained DRIFT monitor, driver-verified: a CALLER-FROZEN
    grid ([0, 300) in 12 bins — the monitoring convention: the
    reference fixes the ruler, drift moves the counts; the corpus max
    exceeds 300 at every SF so the edge-bin clamp is exercised), the
    reference histogram from the purchase events, and the live side
    folded over three event-id ticks of the error events via
    ``operators/profile.py::histogram_fixed_grid`` + cell-wise
    addition — exactly ``streaming/structured.py::
    maintained_histogram``'s per-tick fold. The PSI read
    (``psi_from_histograms`` ≡ ``read_maintained_psi``'s read) then
    touches 2×12 METADATA rows, never the populations — identical
    output to batch ``population_stability`` on the same grid
    (pytest-pinned bit-exact). Oracle: the direct two-population SQL
    on the literal grid."""
    from kamu_engine_datafusion_spark.operators.profile import (
        histogram_fixed_grid,
        psi_from_histograms,
    )

    t = load(spark, sf_dir, "events")
    ev = t["events"]
    lo, hi, nb = 0.0, 300.0, 12
    ref_h = histogram_fixed_grid(
        ev.filter(F.col("event_type") == "purchase"), "value", lo, hi, nb
    )
    state = None
    for i in range(3):
        inc = histogram_fixed_grid(
            ev.filter(
                (F.col("event_type") == "error")
                & (F.col("event_id") % 3 == i)
            ),
            "value", lo, hi, nb,
        )
        state = (
            inc
            if state is None
            else inc.unionByName(state)
            .groupBy("bin")
            .agg(F.sum("n").cast("long").alias("n"))
        )
    out = psi_from_histograms(ref_h, state, lo, hi, nb)
    return out.select(
        "bin",
        F.round("bin_lo", 6).alias("bin_lo"),
        F.round("bin_hi", 6).alias("bin_hi"),
        "n_ref",
        "n_new",
        F.round("p_ref", 9).alias("p_ref"),
        F.round("p_new", 9).alias("p_new"),
        F.round("psi", 9).alias("psi"),
    )


def q_xheavy_hitters_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained heavy-hitter monitor, driver-verified:
    Count-Min grids of three doc-id ticks of the corpus TOKEN stream
    fold cell-wise — exactly ``streaming/structured.py::
    maintained_countmin``'s per-tick fold — and the live query is
    ``operators/sketches.py::heavy_hitters_from_grid``: phase 1 is
    pre-paid by the fold (the stored grid IS the batch grid, so
    candidates are identical and the overestimate theorem still
    guarantees recall), N is read off the grid's row-0 cell sum, and
    the whole query is ONE ledger scan (scan-speed candidate filter +
    broadcast-semi-join exact verify) vs the batch operator's two.
    φ=1/200 over unigram tokens (30 hitters at every SF — the
    ``xheavy_hitters`` bigram key's companion at the maintained
    layer). Oracle: the direct GROUP BY HAVING ⌈φN⌉ rule itself."""
    from kamu_engine_datafusion_spark.functions.columns import tokens
    from kamu_engine_datafusion_spark.operators.sketches import (
        cm_counters,
        heavy_hitters_from_grid,
    )

    t = load(spark, sf_dir, "documents")
    docs = t["documents"]
    stream = docs.select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    )
    # ONE token-stream scan for all three tick grids (r18, guide
    # §2.3): the cell hash is per-occurrence, so the (tick, i,
    # bucket)-keyed grid sliced at __tick == i is bit-identical to the
    # per-tick build; the cell-wise fold below is unchanged.
    fine = cm_counters(
        stream.withColumn("__tick", F.col("doc_id") % 3),
        "tok", depth=4, width=256, seed=7, hash_fn="poly",
        extra_group_cols=("__tick",),
    ).localCheckpoint(eager=False)
    grid = None
    for i in range(3):
        inc = fine.filter(F.col("__tick") == i).drop("__tick")
        grid = (
            inc
            if grid is None
            else inc.unionByName(grid)
            .groupBy("i", "bucket")
            .agg(F.sum("c").cast("long").alias("c"))
        )
    return heavy_hitters_from_grid(
        grid, stream, "tok", phi_num=1, phi_den=200,
        depth=4, width=256, seed=7, hash_fn="poly",
    )


def q_xdsir_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental DSIR importance scoring, driver-verified — the
    ``bm25_from_stats`` device applied to data selection: both the
    target (src1) and raw (rest) hashed-bigram models fold over three
    doc-id ticks via ``operators/sampling.py::dsir_bucket_counts`` +
    cell-wise addition — exactly ``streaming/structured.py::
    maintained_dsir_stats``'s per-tick fold — then the whole raw
    corpus is scored with ``dsir_scores_from_stats`` against the
    folded state (corpus-consistent 1e-9 fixed-point log-ratios; only
    the scored frame is tokenized — batch ``dsir_scores`` re-counts
    ALL history for q every run). The oracle is the direct batch DSIR
    scoring SQL, so the hash match proves fold ≡ batch counts AND
    from-stats scoring ≡ corpus-rescan scoring through the driver."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        dsir_bucket_counts,
        dsir_scores_from_stats,
    )

    t = load(spark, sf_dir, "documents")
    docs = t["documents"]
    tgt = docs.filter(F.col("source") == "src1")
    raw = docs.filter(F.col("source") != "src1")

    def fold(d):
        # ONE scan for all three tick count frames (r18, guide §2.3):
        # buckets are per-occurrence, so the (tick, b)-keyed counts
        # sliced at __tick == i are bit-identical to the per-tick
        # builds; the cell-wise fold below is unchanged.
        fine = dsir_bucket_counts(
            d.withColumn("__tick", F.col("doc_id") % 3), buckets=512,
            hash_fn="poly", extra_group_cols=("__tick",),
        ).localCheckpoint(eager=False)
        state = None
        for i in range(3):
            inc = fine.filter(F.col("__tick") == i).drop("__tick")
            state = (
                inc
                if state is None
                else inc.unionByName(state)
                .groupBy("b")
                .agg(F.sum("c").cast("long").alias("c"))
            )
        return state

    out = dsir_scores_from_stats(
        raw, fold(tgt), fold(raw), buckets=512, hash_fn="poly"
    )
    return out.select("doc_id", "lang", "source", "dsir_score")


def q_xcentroid_from_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained embedding-centroid drift monitor,
    driver-verified: per-label sufficient statistics (n, per-dim
    quantized sums, summed squared norm) fold element-wise over three
    vec-id ticks via ``operators/clustering.py::centroid_stats`` +
    zip_with addition — exactly ``streaming/structured.py::
    maintained_centroid_stats``'s per-tick fold — and the full
    pairwise shift matrix is read from state ALONE
    (``centroid_shift_from_stats``: same integer centroid floor, same
    exact-BIGINT radius identity, groups×(dim+2) longs of metadata).
    The oracle is the batch ``xcentroid_shift`` SQL verbatim: a hash
    match proves fold ≡ batch stats AND from-stats matrix ≡ the
    corpus-rescan ``group_centroid_shift`` through the driver (the
    batch code path stays byte-identical — pinned equal by test, not
    refactor)."""
    from kamu_engine_datafusion_spark.operators.clustering import (
        centroid_shift_from_stats,
        centroid_stats,
    )

    t = load(spark, sf_dir, "embeddings")
    emb = t["embeddings"].select(
        F.col("label").cast("long").alias("grp"), "vec_id", "embedding"
    )
    dim = 64
    state = None
    for i in range(3):
        inc = centroid_stats(
            emb.filter(F.col("vec_id") % 3 == i),
            "grp", "vec_id", "embedding", dim,
        )
        if state is None:
            state = inc
        else:
            state = (
                inc.unionByName(state.select("grp", "n", "sv", "ss"))
                .groupBy("grp")
                .agg(
                    F.sum("n").cast("long").alias("n"),
                    F.aggregate(
                        F.collect_list("sv"),
                        F.array(
                            *[F.lit(0).cast("long") for _ in range(dim)]
                        ),
                        lambda acc, v: F.zip_with(
                            acc, v, lambda a, b: a + b
                        ),
                    ).alias("sv"),
                    F.sum("ss").cast("long").alias("ss"),
                )
            )
    return centroid_shift_from_stats(state, dim=dim)


def q_xlm_backoff_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental Stupid-Backoff LM scoring, driver-verified — the
    CCNet perplexity-filter shape at the maintained layer: the
    doc_id < 250 reference's unified (n, w1, w2, w3, c) count frame
    folds cell-wise over three doc-id ticks via
    ``operators/text.py::lm_ngram_counts`` + addition — exactly
    ``streaming/structured.py::maintained_lm_counts``'s per-tick fold
    — then the whole corpus is scored with
    ``backoff_score_from_counts`` against the folded model (N/V for
    the OOV floor derive from the n=1 rows; only the scored frame is
    tokenized — the batch operator re-tokenizes the reference every
    run). The oracle is the batch ``xlm_backoff`` SQL verbatim: a
    hash match proves fold ≡ batch counts AND from-counts scoring ≡
    the batch ``stupid_backoff_score`` bit-for-bit through the driver
    (the batch path stays byte-identical — pinned equal by test, not
    refactor)."""
    from kamu_engine_datafusion_spark.operators.text import (
        backoff_score_from_counts,
        lm_ngram_counts,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"]
    ref = d.filter(F.col("doc_id") < 250)
    counts = None
    for i in range(3):
        inc = lm_ngram_counts(ref.filter(F.col("doc_id") % 3 == i))
        counts = (
            inc
            if counts is None
            else inc.unionByName(counts)
            .groupBy("n", "w1", "w2", "w3")
            .agg(F.sum("c").cast("long").alias("c"))
        )
    return backoff_score_from_counts(d, _ckpt_state(counts))


def _event_time_ticks(ev: DataFrame) -> list[DataFrame]:
    """Three LITERAL event-time slices of an events frame — the tick
    construction of the maintained-events driver keys (sessions,
    retention, funnel, transitions, debounce): the January 2024 ledger
    splits at Jan 11 / Jan 21, so ticks PARTITION event time and the
    per-user/per-group event-time-ordered append contract of the
    increment functions holds by construction at every SF."""
    ts = F.col("ts").cast("timestamp")
    b1 = F.lit("2024-01-11 00:00:00").cast("timestamp")
    b2 = F.lit("2024-01-21 00:00:00").cast("timestamp")
    return [
        ev.filter(ts < b1),
        ev.filter((ts >= b1) & (ts < b2)),
        ev.filter(ts >= b2),
    ]


def _ckpt_state(df: DataFrame) -> DataFrame:
    """LAZY localCheckpoint of a per-tick fold STATE level (r17):
    truncates the logical plan at construction (Spark wraps the RDD in
    a LogicalRDD either way), so a chained fold's analysis stays flat
    and a state referenced twice per tick (probe/anti-join + union)
    or probed by the increments' eager precondition counts computes
    each level ONCE instead of 2^ticks. Lazy (eager=False), unlike the
    minhash/semdedup fold sites: these loops schedule no work of their
    own between ticks, so the first consumer action (often the
    increment's own violation-count job) materializes the level
    without paying one extra driver-synchronized job per tick
    (xtransitions_state cold 9.1 s → 4.1 s at sf0.1; values identical,
    full-registry oracle sweep green)."""
    return df.localCheckpoint(eager=False)


def _ckpt_parallel(dfs: list[DataFrame]) -> list[DataFrame]:
    """Materialize INDEPENDENT per-tick frames as CONCURRENT eager
    localCheckpoint jobs (r18, guide §2.6): a maintained fold's
    state-independent legs (tick signatures, tick state rows) are
    separate driver-synchronized jobs only because the loop calls them
    sequentially — submitting them from a thread pool lets tick j's
    tasks back-fill the stragglers of tick i's, collapsing the serial
    fixed cost. Job descriptions/groups are thread-local, so each job
    stays correctly labelled (``inheritable_thread_target`` carries
    the parent's JVM-thread-local properties)."""
    if len(dfs) <= 1:
        return [df.localCheckpoint(eager=True) for df in dfs]
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    with ThreadPoolExecutor(max_workers=len(dfs)) as pool:
        futs = [
            pool.submit(
                inheritable_thread_target(
                    lambda df=df: df.localCheckpoint(eager=True)
                )
            )
            for df in dfs
        ]
        return [f.result() for f in futs]


def q_xsessions_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained gap-sessionizer, driver-verified — the stateful
    EVENT-TIME operator of the maintained layer: three literal
    event-time ticks (Jan 11 / Jan 21 splits) of the user_id < 100
    population fold through ``operators/sessions.py::
    session_fold_increment`` (per-user open-session rewrite state +
    append-only closed rows — exactly ``streaming/structured.py::
    maintained_sessions``'s per-tick fold, pytest-pinned tick-by-tick
    incl. the two-root crash protocol) and the live view is
    ``sessions_read(closed ∪ open)``. The output rows ARE the folded
    state + closed log rendered in the batch frame, so the stored
    sessionization itself is hash-verified against the batch
    lag+cumsum ``xsessionize`` SQL over the whole ledger — fold ≡
    batch ROW-FOR-ROW through the driver, including the
    second-truncated break rule vs ms-derived durations (the
    divergence the 6M-event stress caught at staging time)."""
    from kamu_engine_datafusion_spark.operators.sessions import (
        session_fold_increment,
        sessions_read,
    )

    t = load(spark, sf_dir, "events")
    ev = t["events"].filter(F.col("user_id") < 100)
    closed_logs = []
    state = None
    for tick in _event_time_ticks(ev):
        closed, state = session_fold_increment(state, tick, gap_sec=1800)
        state = _ckpt_state(state)
        closed_logs.append(closed)
    log = closed_logs[0]
    for c in closed_logs[1:]:
        log = log.unionByName(c)
    return sessions_read(log, state)


def q_xretention_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained cohort-retention monitor, driver-verified:
    per-user activity state ``(user_id, cohort_ms, wks)`` folds over
    three event-time ticks via ``operators/funnel.py::
    activity_increment`` + ``activity_merge`` — both IDEMPOTENT
    semilattice merges (cohort = min, buckets = set union), exactly
    ``streaming/structured.py::maintained_activity``'s fold — and the
    cohort matrix is ``retention_from_activity``'s metadata-rows read.
    Oracle: the batch ``xretention`` SQL over the full ledger — fold ≡
    batch is exact because min/union over a partition of the ledger
    equals min/union over the whole (pytest-pinned incl. out-of-order
    cohort arrival and double-merge idempotence)."""
    from kamu_engine_datafusion_spark.operators.funnel import (
        activity_increment,
        activity_merge,
        retention_from_activity,
    )

    t = load(spark, sf_dir, "events")
    state = None
    for tick in _event_time_ticks(t["events"]):
        inc = activity_increment(tick, bucket="week")
        state = _ckpt_state(
            inc if state is None else activity_merge(state, inc)
        )
    out = retention_from_activity(state, bucket="week")
    return out.select(
        F.unix_micros("cohort_start").alias("cohort_us"),
        "period",
        F.col("n_users").cast("long").alias("n_users"),
    )


def q_xfunnel_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained funnel-progress monitor, driver-verified:
    per-user greedy-walk accumulators ``(depth, t1_us, tprev_us,
    last_us)`` fold over three event-time ticks via
    ``operators/funnel.py::funnel_fold_increment`` — the batch walk's
    own ``_funnel_advance`` lambda advanced tick-by-tick (a left fold
    over the time-sorted sequence decomposes exactly on ordered
    ticks), exactly ``streaming/structured.py::maintained_funnel``'s
    fold — and the counts read is ``funnel_from_state``'s one-row
    aggregate over the accumulator state. Oracle: the batch
    ``xfunnel`` SQL (sequential conditional mins) over the full
    ledger."""
    from kamu_engine_datafusion_spark.operators.funnel import (
        funnel_fold_increment,
        funnel_from_state,
    )

    steps = ["view", "click", "purchase"]
    t = load(spark, sf_dir, "events")
    state = None
    for tick in _event_time_ticks(t["events"]):
        state = _ckpt_state(
            funnel_fold_increment(
                state, tick, steps, within_seconds=72 * 3600
            )
        )
    out = funnel_from_state(state, steps)
    return out.select(
        F.col("step").cast("long").alias("step"),
        "event_type",
        F.col("n_users").cast("long").alias("n_users"),
    )


def q_xtransitions_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained Markov-transition monitor, driver-verified:
    additive |types|² pair counts + per-user last-event state fold
    over three event-time ticks via ``operators/funnel.py::
    transitions_increment`` (within-tick adjacencies + one boundary
    pair per continuing user — ordered ticks partition the time-sorted
    sequence, so summed counts equal the batch pairing exactly;
    exactly ``streaming/structured.py::maintained_transitions``'s
    fold) and the row-stochastic matrix is
    ``transitions_from_counts``'s metadata-rows read. Oracle: the
    batch ``xtransitions`` lead-window SQL over the full ledger."""
    from kamu_engine_datafusion_spark.operators.funnel import (
        transitions_from_counts,
        transitions_increment,
    )

    t = load(spark, sf_dir, "events")
    counts = None
    last = None
    for tick in _event_time_ticks(t["events"]):
        inc, last = transitions_increment(last, tick)
        last = _ckpt_state(last)
        counts = (
            inc
            if counts is None
            else inc.unionByName(counts)
            .groupBy("from_type", "to_type")
            .agg(F.sum("n").cast("long").alias("n"))
        )
    out = transitions_from_counts(counts)
    return out.select(
        "from_type", "to_type", "n", F.round("p", 9).alias("p")
    )


def q_xdebounce_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained burst-debounce stage, driver-verified: per-group
    last-RAW-event state + an APPEND-ONLY kept-events log fold over
    three event-time ticks of the user_id < 200 population via
    ``operators/funnel.py::debounce_increment`` (survival depends only
    on the immediate raw predecessor — previous tick event or the
    stored ``last_us`` — so ordered ticks partition each group's
    sequence and the kept union equals the batch debounce row-for-row;
    exactly ``streaming/structured.py::maintained_debounce``'s fold).
    Oracle: the batch ``xdebounce`` lag-rule SQL over the full
    ledger, aggregated per event_type with the id-sum fingerprint so
    the kept SET itself is hash-verified."""
    from kamu_engine_datafusion_spark.operators.funnel import (
        debounce_increment,
    )

    t = load(spark, sf_dir, "events")
    ev = t["events"].filter(F.col("user_id") < 200)
    kept_logs = []
    last = None
    for tick in _event_time_ticks(ev):
        kept, last = debounce_increment(
            last, tick, "ts", gap_seconds=600.0,
            group_cols=["user_id", "event_type"],
        )
        last = _ckpt_state(last)
        kept_logs.append(kept)
    log = kept_logs[0]
    for k in kept_logs[1:]:
        log = log.unionByName(k)
    return log.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("event_id").cast("long").alias("id_sum"),
    )


def q_xquality_rates_maintained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The maintained per-source quality-rate monitor, driver-verified
    — the feed-gone-bad alarm a 100 TB crawl ingest runs after every
    tick: Gopher rule-hit counters ``(grp, n_docs, c_<rule>…,
    c_pass_all)`` fold cell-wise over three doc-id ticks via
    ``operators/text.py::quality_rule_counts`` — exactly
    ``streaming/structured.py::maintained_quality_rates``'s per-tick
    fold — and the dashboard is ``quality_rates_from_counts`` over
    |sources| metadata rows, the corpus never re-read. Oracle: the
    ``xtext_gopher`` rule expressions aggregated per source with
    half-up 4dp rates — the folded counter cells surface directly in
    ``n_docs`` and every rate, so the state is hash-verified."""
    from kamu_engine_datafusion_spark.operators.text import (
        quality_rates_from_counts,
        quality_rule_counts,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"]
    state = None
    for i in range(3):
        inc = quality_rule_counts(
            d.filter(F.col("doc_id") % 3 == i), "source"
        )
        if state is None:
            state = inc
        else:
            csum = [
                F.sum(c).cast("long").alias(c)
                for c in inc.columns
                if c != "grp"
            ]
            state = inc.unionByName(state).groupBy("grp").agg(*csum)
    return quality_rates_from_counts(_ckpt_state(state), dp=4)


def q_xvocab_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained corpus term-count state, driver-verified via its
    vocabulary read: the wordcount frame ``(token, freq)`` folds
    cell-wise over three doc-id ticks via ``operators/text.py::
    term_counts`` — exactly ``streaming/structured.py::
    maintained_term_counts``'s per-tick fold — and
    ``vocabulary_from_counts`` reads the induced top-20 vocabulary
    from vocab-sized state with the batch rank rule (freq desc, token
    asc). The output ``freq`` values ARE folded state cells, so the
    state itself is hash-verified against the batch ``xvocab`` SQL
    over the full ledger; the downstream OOV/logprob reads consume
    this vocabulary frame unchanged (pytest-pinned)."""
    from kamu_engine_datafusion_spark.operators.text import (
        term_counts,
        vocabulary_from_counts,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"]
    state = None
    for i in range(3):
        inc = term_counts(d.filter(F.col("doc_id") % 3 == i))
        state = (
            inc
            if state is None
            else inc.unionByName(state)
            .groupBy("token")
            .agg(F.sum("freq").cast("long").alias("freq"))
        )
    return vocabulary_from_counts(_ckpt_state(state), top_v=20)


def q_xbloom_decontaminate_maintained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The maintained-Bloom decontamination READ, driver-verified: the
    benchmark (doc_id ≥ 450) folds into the 2¹⁶-bit bitmap over three
    benchmark ticks via ``operators/decontaminate.py::bloom_build`` +
    bitwise OR — the OR fold is associative/commutative/IDEMPOTENT, so
    the maintained bitmap is bit-identical to the one-shot build
    (exactly ``streaming/structured.py::maintained_bloom``'s fold,
    pytest-pinned) — then the corpus tick (doc_id < 400) flags via
    ``bloom_flag_with_bitmap`` WITHOUT re-shingling the benchmark for
    phase 1. No false negatives + exact phase-2 verify ⇒ result ≡
    ``flag_contaminated``; the oracle replays the direct exact rule,
    so the hash match proves the from-state read drops nothing."""
    from kamu_engine_datafusion_spark.operators.decontaminate import (
        bloom_build,
        bloom_flag_with_bitmap,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"]
    corpus = d.filter(F.col("doc_id") < 400)
    bench = d.filter(F.col("doc_id") >= 450)
    # The three tick builds are independent eager collects (each scans
    # only its benchmark tick) — run them as CONCURRENT jobs (r18,
    # guide §2.6); the OR fold below is associative/commutative, so
    # completion order is irrelevant.
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    def _build(i: int) -> list[int]:
        return bloom_build(
            bench.filter(F.col("doc_id") % 3 == i),
            shingle_len=5, m_bits=1 << 16, k_hashes=4,
            hash_fn="xxhash64",
        )

    with ThreadPoolExecutor(max_workers=3) as pool:
        incs = list(pool.map(inheritable_thread_target(_build), range(3)))
    # python ints carry two's-complement semantics, so signed-view
    # OR is exactly the 64-bit bitwise OR of the raw bitmaps
    bitmap = incs[0]
    for inc in incs[1:]:
        bitmap = [a | b for a, b in zip(bitmap, inc)]
    return bloom_flag_with_bitmap(
        corpus, bench, bitmap, shingle_len=5, threshold=1,
        m_bits=1 << 16, k_hashes=4, hash_fn="xxhash64",
    )


def q_xbm25_postings_maintained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BM25 top-k served from the MAINTAINED inverted index,
    driver-verified: postings ``(term, doc_id, tf, dl)`` accumulate
    append-only over three doc-id ticks via
    ``operators/retrieval.py::postings_increment`` (a doc id never
    re-appears on an append ledger — exactly
    ``streaming/structured.py::maintained_postings``'s fold, where
    term == bucket key makes the read partition-pruned and term-sorted
    files add row-group pruning), the corpus scalars fold via
    ``term_stats_increment`` summation, and the serving cut is
    ``bm25_topk_from_postings``: df from the postings rows themselves,
    idf/avgdl from the scalars row, half-up 6dp score, (score DESC,
    doc_id) rank, top 10 — the corpus is NEVER read at query time.
    Oracle: the ``xbm25`` count/idf CTE chain with the same half-up
    6dp + rank + LIMIT — tf/dl/df state cells all surface in the
    score, so the folded index itself is hash-verified."""
    from kamu_engine_datafusion_spark.operators.retrieval import (
        bm25_topk_from_postings,
        postings_increment,
        term_stats_increment,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"]
    postings = None
    stats = None
    for i in range(3):
        tick = d.filter(F.col("doc_id") % 3 == i)
        pinc = postings_increment(tick)
        postings = (
            pinc if postings is None else postings.unionByName(pinc)
        )
        sinc = term_stats_increment(tick)
        if stats is None:
            stats = sinc
        else:
            stats = (
                stats.unionByName(sinc)
                .groupBy("term")
                .agg(
                    F.sum("df").cast("long").alias("df"),
                    F.sum("n_docs").cast("long").alias("n_docs"),
                    F.sum("tot_len").cast("long").alias("tot_len"),
                    F.sum("n_len").cast("long").alias("n_len"),
                )
            )
    return bm25_topk_from_postings(
        postings, stats, _BM25_TERMS, k=10, dp=6
    )


def q_xintervals_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained interval-consolidation state, driver-verified
    (registered r15 BELOW the driver window; r16 window head): the
    ``xmerge_intervals`` span population (user_id < 200 activity
    spans) folds over three event-id ticks through
    ``operators/rangejoin.py::intervals_increment`` — exactly
    ``streaming/structured.py::maintained_intervals``'s per-tick merge
    (pytest-pinned tick-by-tick AND order-insensitive: island geometry
    is an idempotent set function, n_merged folds weighted) — and the
    returned rows ARE the folded island state, so the state itself is
    hash-verified against the batch ``xmerge_intervals`` SQL over the
    whole span ledger (fold ≡ batch row-for-row, island ids
    included)."""
    from kamu_engine_datafusion_spark.operators.rangejoin import (
        intervals_increment,
    )

    t = load(spark, sf_dir, "events")
    iv = t["events"].filter(F.col("user_id") < 200).select(
        "user_id",
        F.col("event_id").alias("__eid"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("start_us"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + (F.round(F.col("value") * 60, 0)).cast("long") * 1_000_000
        ).alias("end_us"),
    )
    state = None
    for i in range(3):
        tick = iv.filter(F.col("__eid") % 3 == i).drop("__eid")
        state = _ckpt_state(
            intervals_increment(
                state, tick, "start_us", "end_us", ["user_id"]
            )
        )
    return state.select(
        "user_id", "island", "start_us", "end_us", "n_merged"
    )


def q_xasof_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained AS-OF serving read, driver-verified (registered
    r15 below the window; r16 head): the ``xasof_join`` purchase
    dimension (deduped per (user, ts)) folds over three event-id ticks
    through ``operators/asof.py::asof_state_increment`` — the per-key
    max-merge, order-insensitive, exactly ``streaming/structured.py::
    maintained_asof_state``'s merge — and the EVENT-TIME-CURRENT click
    slice (clicks at/after their user's latest purchase: the head-of-
    ledger serving population, derivable in SQL so the oracle replays
    the slice rule too) probes the state via ``asof_probe_from_state``.
    Under that contract the probe ≡ the batch as-of join against the
    WHOLE purchase history (pytest-pinned), which is exactly what the
    oracle's ASOF JOIN computes — so the hash proves fold ≡ latest
    AND probe ≡ batch through the driver."""
    from kamu_engine_datafusion_spark.operators.asof import (
        asof_probe_from_state,
        asof_state_increment,
    )

    t = load(spark, sf_dir, "events")
    ev = t["events"]
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_event_id"))
    )
    state = None
    for i in range(3):
        tick = purchases.filter(
            F.col("purchase_event_id") % 3 == i
        )
        state = _ckpt_state(
            asof_state_increment(
                state, tick, ["user_id"], "ts", ["purchase_event_id"]
            )
        )
    latest = purchases.groupBy("user_id").agg(F.max("ts").alias("__mts"))
    head = (
        ev.filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts")
        .join(latest, "user_id")
        .filter(F.col("ts") >= F.col("__mts"))
        .drop("__mts")
    )
    out = asof_probe_from_state(
        head, state, ["user_id"], "ts", ["purchase_event_id"],
        how="inner",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("right_purchase_event_id").alias("purchase_event_id"),
    )


def q_xmmr_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified top-k FROM the maintained SemDeDup store,
    driver-verified (registered r15 below the window; r16 head): the
    ``_semdedup_fold`` 3-tick store (shared with
    ``xsemdedup_incremental`` / ``xann_semdedup_topk`` — ONE store,
    now THREE hash-verified reads), probed at nprobe=3 of 8 with the
    fold's integer argmin rule, pooled top-20 by the ANN read's exact
    integer cosine, then ``streaming/structured.py::
    mmr_from_state_rows``' greedy walk (λ=0.7, k=5; first pick = pure
    relevance; ties → ascending id; half-up 6dp) over the stored
    quantized payloads. The oracle replays the survivor kill chain,
    the probe rule, the pool cut, the pairwise integer cosines, AND
    five unrolled greedy-argmax iterations (the ``xmmr``/``xtop_pc``
    device) — the pruning, the pool, and the walk are all
    hash-verified through the driver."""
    from kamu_engine_datafusion_spark.streaming.structured import (
        ann_probe_clusters,
        mmr_from_state_rows,
    )

    t = load(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    cents, state = _semdedup_fold(spark, sf_dir)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    probed = ann_probe_clusters(cents, qvec, nprobe=3, scale=10_000)
    return mmr_from_state_rows(
        state.filter(F.col("cluster").isin(probed)),
        qvec,
        k=5,
        pool=20,
        lam=0.7,
        sim_scale=1_000,
        dp=6,
    )


def q_xcollocations_maintained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The maintained PMI collocation read, driver-verified
    (registered r15 below the window; r16 head): pair + unigram count
    frames fold cell-wise over three doc-id ticks (``operators/
    text.py::pair_counts`` / ``term_counts`` — exactly
    ``streaming/structured.py::maintained_pair_counts`` /
    ``maintained_term_counts``'s folds, pytest-pinned) and the top-100
    ranking is ``collocations_from_counts`` over the two maintained
    frames with the batch ``q_xcollocations`` pipeline's exact
    6dp-rounded re-rank. Oracle: the batch ``xcollocations`` SQL over
    the full ledger — fold ≡ batch counts makes the batch oracle the
    incremental key's oracle, and every count cell surfaces in
    n_pair/pmi."""
    from kamu_engine_datafusion_spark.operators.text import (
        collocations_from_counts,
        pair_counts,
        term_counts,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"]
    pairs, unis = None, None
    for i in range(3):
        tick = d.filter(F.col("doc_id") % 3 == i)
        pinc = pair_counts(tick)
        pairs = (
            pinc
            if pairs is None
            else pinc.unionByName(pairs)
            .groupBy("w1", "w2")
            .agg(F.sum("c").cast("long").alias("c"))
        )
        tinc = term_counts(tick)
        unis = (
            tinc
            if unis is None
            else tinc.unionByName(unis)
            .groupBy("token")
            .agg(F.sum("freq").cast("long").alias("freq"))
        )
    out = collocations_from_counts(
        _ckpt_state(pairs), _ckpt_state(unis), min_count=5,
        top_k=10_000_000,
    )
    return (
        out.select("w1", "w2", "n_pair", F.round("pmi", 6).alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(100)
    )


def q_xnovelty_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained reference n-gram set's novelty read,
    driver-verified (registered r15 below the window; r16 head): the
    doc_id < 200 reference's distinct-bigram set folds append-only
    over three doc-id ticks (``operators/decontaminate.py::
    ngram_set_increment`` — exactly ``streaming/structured.py::
    maintained_ngram_set``'s merge, new-to-state rows only, and set
    union is a semilattice so the folded set IS the reference's
    distinct grams) and the doc_id ≥ 200 corpus scores via
    ``novelty_against_ngrams`` — pinned ≡ the batch ``ngram_novelty``
    row-for-row. Oracle: the batch ``xngram_novelty`` SQL."""
    from kamu_engine_datafusion_spark.operators.decontaminate import (
        ngram_set_increment,
        novelty_against_ngrams,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"]
    ref = d.filter(F.col("doc_id") < 200)
    state = None
    for i in range(3):
        inc = ngram_set_increment(
            state, ref.filter(F.col("doc_id") % 3 == i)
        )
        state = inc if state is None else state.unionByName(inc)
    return novelty_against_ngrams(
        d.filter(F.col("doc_id") >= 200), state, n=2, keep_cols=["lang"]
    )


def q_xmoments_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The folded fixed-point MOMENTS state itself, driver-verified
    (registered r15 below the window; r16 head): per-event-type
    ``(n, Σq, Σq²)`` of the events ``value`` column (q half-up at
    scale 1000 — sized so Σq² stays in BIGINT at 10× data) folds
    cell-wise over three event-id ticks via ``operators/profile.py::
    moment_counts`` — exactly ``streaming/structured.py::
    maintained_moments``'s fold. The oracle rebuilds the state from
    TICK-STRUCTURED integer-sum CTEs then folds them additively in
    SQL (the ``xcentroid_stats_state`` device), so the driver hash
    proves the folded scaler state itself."""
    from kamu_engine_datafusion_spark.operators.profile import (
        moment_counts,
    )

    t = load(spark, sf_dir, "events")
    ev = t["events"].select(
        F.col("event_type").alias("grp"), "event_id", "value"
    )
    state = None
    for i in range(3):
        inc = moment_counts(
            ev.filter(F.col("event_id") % 3 == i), "value", ["grp"],
            scale=1_000,
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
    return state


def q_xzscore_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained feature-scaler SERVING read, driver-verified
    (registered r15 below the window; r16 head): the ``event_id % 3
    == 0`` slice (a "new tick") z-scores against the full-ledger
    moments state of ``q_xmoments_state``'s fold via
    ``operators/profile.py::zscore_from_moments`` — the defined
    fixed-point rule (q at scale 1000, mu/var from one double tree,
    half-up 6dp, NULL for singleton/zero-variance groups) with the
    ``|z| > 2`` outlier gate (NULL ⇒ false). The oracle replays the
    tick-structured state CTEs AND the exact z expression, so the
    hash proves fold ≡ batch moments AND the serving read's every
    branch through the driver."""
    from kamu_engine_datafusion_spark.operators.profile import (
        moment_counts,
        zscore_from_moments,
    )

    t = load(spark, sf_dir, "events")
    ev = t["events"].select(
        F.col("event_type").alias("grp"), "event_id", "value"
    )
    state = None
    for i in range(3):
        inc = moment_counts(
            ev.filter(F.col("event_id") % 3 == i), "value", ["grp"],
            scale=1_000,
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
    out = zscore_from_moments(
        ev.filter(F.col("event_id") % 3 == 0),
        state,
        "value",
        ["grp"],
        scale=1_000,
        dp=6,
        outlier_z=2.0,
    )
    # value passes through RAW (both engines read the same parquet
    # doubles bit-for-bit; rounding would only add a half-tie hazard)
    return out.select(
        "grp", "event_id", "value", "value_z", "is_outlier"
    )


def q_xretention_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The folded per-user ACTIVITY state itself, driver-verified (NEW
    r16 — the ``xmoments_state`` device applied to the retention
    family, closing its read-vs-state gap): ``(user_id, cohort_ms,
    wks)`` after three event-time ticks of ``operators/funnel.py::
    activity_increment`` + ``activity_merge`` — exactly
    ``streaming/structured.py::maintained_activity``'s semilattice
    fold (cohort = min, buckets = set union). The week-set renders as
    a CSV string (the ``xcentroid_stats_state`` ``sv`` device) so the
    per-user state ROWS hash through the driver, not just the cohort
    matrix read over them. Oracle: tick-structured per-(user, tick)
    min/set CTEs merged with min/union in SQL — the fold replayed, not
    the batch shortcut."""
    from kamu_engine_datafusion_spark.operators.funnel import (
        activity_increment,
        activity_merge,
    )

    t = load(spark, sf_dir, "events")
    state = None
    for tick in _event_time_ticks(t["events"]):
        inc = activity_increment(tick, bucket="week")
        state = _ckpt_state(
            inc if state is None else activity_merge(state, inc)
        )
    return state.select(
        "user_id",
        "cohort_ms",
        F.array_join(
            F.transform("wks", lambda x: x.cast("string")), ","
        ).alias("wks_csv"),
    )


def q_xtransitions_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The folded Markov PAIR-COUNT state itself, driver-verified (NEW
    r16): the additive ``(from_type, to_type, n)`` frame after three
    event-time ticks of ``operators/funnel.py::transitions_increment``
    (within-tick adjacencies + one boundary pair per continuing user —
    exactly ``streaming/structured.py::maintained_transitions``'s
    fold), returned RAW instead of through the row-stochastic matrix
    read. Oracle: genuinely tick-structured — within-tick pair counts
    per tick and cross-boundary pair counts as separate CTEs, folded
    additively in SQL, mirroring the increment's two-part construction
    rather than the batch lead-window shortcut."""
    from kamu_engine_datafusion_spark.operators.funnel import (
        transitions_increment,
    )

    t = load(spark, sf_dir, "events")
    counts = None
    last = None
    for tick in _event_time_ticks(t["events"]):
        inc, last = transitions_increment(last, tick)
        last = _ckpt_state(last)
        counts = (
            inc
            if counts is None
            else inc.unionByName(counts)
            .groupBy("from_type", "to_type")
            .agg(F.sum("n").cast("long").alias("n"))
        )
    return counts


def q_xvocab_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The folded corpus TERM-COUNT state itself, driver-verified (NEW
    r16): the FULL ``(token, freq)`` wordcount frame after three
    doc-id ticks of ``operators/text.py::term_counts`` — exactly
    ``streaming/structured.py::maintained_term_counts``'s cell-wise
    additive fold — with no top-k read in front of it, so every state
    cell hashes through the driver (and the frame needs no window at
    all, unlike the top-20 vocabulary read). Oracle: per-tick token
    counts folded additively in SQL."""
    from kamu_engine_datafusion_spark.operators.text import term_counts

    t = load(spark, sf_dir, "documents")
    d = t["documents"]
    state = None
    for i in range(3):
        inc = term_counts(d.filter(F.col("doc_id") % 3 == i))
        state = (
            inc
            if state is None
            else inc.unionByName(state)
            .groupBy("token")
            .agg(F.sum("freq").cast("long").alias("freq"))
        )
    return state


def q_xcollocations_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The folded collocation COUNT states themselves, driver-verified
    (NEW r16): the pair frame ``(w1, w2, c)`` and the unigram frame
    ``(token, freq)`` after three doc-id ticks of ``operators/
    text.py::pair_counts`` / ``term_counts`` (exactly ``streaming/
    structured.py::maintained_pair_counts`` /
    ``maintained_term_counts``'s folds), surfaced as one row per
    stored PAIR cell with both endpoint unigram cells joined on —
    every cell of BOTH maintained frames hashes through the driver,
    with no PMI ranking in front. Oracle: per-tick bigram + unigram
    counts folded additively in SQL, joined the same way."""
    from kamu_engine_datafusion_spark.operators.text import (
        pair_counts,
        term_counts,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"]
    pairs, unis = None, None
    for i in range(3):
        tick = d.filter(F.col("doc_id") % 3 == i)
        pinc = pair_counts(tick)
        pairs = (
            pinc
            if pairs is None
            else pinc.unionByName(pairs)
            .groupBy("w1", "w2")
            .agg(F.sum("c").cast("long").alias("c"))
        )
        tinc = term_counts(tick)
        unis = (
            tinc
            if unis is None
            else tinc.unionByName(unis)
            .groupBy("token")
            .agg(F.sum("freq").cast("long").alias("freq"))
        )
    unis = _ckpt_state(unis)
    u1 = unis.select(F.col("token").alias("w1"), F.col("freq").alias("f1"))
    u2 = unis.select(F.col("token").alias("w2"), F.col("freq").alias("f2"))
    return pairs.join(u1, "w1").join(u2, "w2").select(
        "w1", "w2", "c", "f1", "f2"
    )


def q_xquality_rates_state(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The folded Gopher RULE-COUNTER state itself, driver-verified
    (NEW r17 — the xmoments_state device applied to the quality-rate
    family, closing the r16 verdict's folded-state tail): the
    additive counter frame ``(grp, n_docs, c_<rule>…, c_pass_all)``
    after three doc-id ticks of ``operators/text.py::
    quality_rule_counts`` — exactly ``streaming/structured.py::
    maintained_quality_rates``'s cell-wise fold — with NO rates read
    in front of it, so every stored counter cell hashes through the
    driver (the ``xquality_rates_maintained`` key verifies the rates
    READ; this one verifies the state). Oracle: per-(source, tick)
    rule-hit partials folded additively in SQL — tick-structured,
    replaying the fold's own merge law, not the batch shortcut."""
    from kamu_engine_datafusion_spark.operators.text import (
        quality_rule_counts,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"]
    state = None
    for i in range(3):
        inc = quality_rule_counts(
            d.filter(F.col("doc_id") % 3 == i), "source"
        )
        if state is None:
            state = inc
        else:
            csum = [
                F.sum(c).cast("long").alias(c)
                for c in inc.columns
                if c != "grp"
            ]
            state = inc.unionByName(state).groupBy("grp").agg(*csum)
    return state


def q_xtemperature_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The folded training-mix GROUP-COUNT state itself plus its
    derived cut cells, driver-verified (NEW r17 — the xmoments_state
    device applied to the temperature family): the per-lang count
    frame ``(lang, n)`` after three doc-id ticks — exactly
    ``streaming/structured.py::maintained_group_counts``'s additive
    fold — surfaced WITH the integer cut each state cell induces
    (``operators/sampling.py::temperature_cuts_from_counts``, the
    batch cut rule verbatim), so both the stored counts AND the
    entire derived sampling policy hash through the driver (the
    ``xtemperature_maintained`` key verifies the sampling READ; this
    one verifies the state and the cut table). Oracle: per-(lang,
    tick) counts folded additively, then the exact cut float tree
    (``least(1, 0.4·tot·n^0.5/z/n)``, round 6dp, floor ×10000 —
    the green ``xsample_temperature`` expression)."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        temperature_cuts_from_counts,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"]
    state = None
    for i in range(3):
        inc = (
            d.filter(F.col("doc_id") % 3 == i)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        state = (
            inc
            if state is None
            else inc.unionByName(state)
            .groupBy("lang")
            .agg(F.sum("n").cast("long").alias("n"))
        )
    state = _ckpt_state(state)
    cuts = temperature_cuts_from_counts(
        state, "lang", alpha=0.5, target_fraction=0.4
    )
    return state.join(cuts, "lang").select(
        "lang", "n", F.col("__cut").alias("cut")
    )


def q_xfunnel_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The folded per-user funnel WALK-ACCUMULATOR state itself,
    driver-verified (r16, the xmoments_state device applied to the
    funnel family): ``(user_id, depth, t1_us, tprev_us, last_us)``
    after three event-time ticks of ``operators/funnel.py::
    funnel_fold_increment`` — exactly ``streaming/structured.py::
    maintained_funnel``'s fold. The oracle re-derives every
    accumulator column in SQL from the greedy walk's closed form
    (first qualifying event per step = sequential conditional mins;
    tprev = the event that reached the current depth; last = max
    funnel-relevant event), so the hash proves the stored walk rows,
    not just the counts read over them."""
    from kamu_engine_datafusion_spark.operators.funnel import (
        funnel_fold_increment,
    )

    steps = ["view", "click", "purchase"]
    t = load(spark, sf_dir, "events")
    state = None
    for tick in _event_time_ticks(t["events"]):
        state = _ckpt_state(
            funnel_fold_increment(
                state, tick, steps, within_seconds=72 * 3600
            )
        )
    return state


def q_xnovelty_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The folded reference N-GRAM SET state itself, driver-verified
    (r16): the distinct-bigram frame after three doc-id ticks of
    ``operators/decontaminate.py::ngram_set_increment`` over the
    doc_id < 200 reference — exactly ``streaming/structured.py::
    maintained_ngram_set``'s append-only merge. Set union is an
    idempotent semilattice, so the folded state IS the reference's
    distinct gram set — which is what the oracle computes directly;
    the hash proves the stored set row-for-row (the novelty READ over
    it is ``xnovelty_maintained``'s key)."""
    from kamu_engine_datafusion_spark.operators.decontaminate import (
        ngram_set_increment,
    )

    t = load(spark, sf_dir, "documents")
    ref = t["documents"].filter(F.col("doc_id") < 200)
    state = None
    for i in range(3):
        inc = ngram_set_increment(
            state, ref.filter(F.col("doc_id") % 3 == i)
        )
        state = inc if state is None else state.unionByName(inc)
    return state.select(F.col("__ng").alias("ng"))


def q_xhybrid_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval served ENTIRELY from maintained state (r16
    staged, registered below the window): the sparse candidate list is
    BM25 top-50 from the folded inverted index + corpus scalars
    (``bm25_topk_from_postings`` — the xbm25_postings_maintained fold,
    corpus never read), the dense list is exact-cosine top-50 from the
    probed SemDeDup store (``ann_topk_from_state_rows`` over
    ``ann_probe_clusters``'s integer argmin — the xann_semdedup_topk
    machinery, nprobe=3 of 8 IVF lists), and
    ``operators/retrieval.py::hybrid_rrf`` fuses them with reciprocal
    rank fusion (k=60, half-up-4dp rank keys, top 10). The serving
    story in one key: a query answered by TWO maintained stores and a
    zero-tuning fuser without touching documents OR embeddings.
    Oracle: the postings-score chain (6dp, LIMIT 50) + the semdedup
    kill-chain/probe/scoring chain (6dp, LIMIT 50) + the RRF CTE —
    every stage replayed."""
    from kamu_engine_datafusion_spark.operators.retrieval import (
        bm25_topk_from_postings,
        hybrid_rrf,
        postings_increment,
        term_stats_increment,
    )
    from kamu_engine_datafusion_spark.streaming.structured import (
        ann_probe_clusters,
        ann_topk_from_state_rows,
    )

    t = load(spark, sf_dir, "documents", "embeddings")
    d = t["documents"]
    postings = None
    stats = None
    for i in range(3):
        tick = d.filter(F.col("doc_id") % 3 == i)
        pinc = postings_increment(tick)
        postings = (
            pinc if postings is None else postings.unionByName(pinc)
        )
        sinc = term_stats_increment(tick)
        if stats is None:
            stats = sinc
        else:
            stats = (
                stats.unionByName(sinc)
                .groupBy("term")
                .agg(
                    F.sum("df").cast("long").alias("df"),
                    F.sum("n_docs").cast("long").alias("n_docs"),
                    F.sum("tot_len").cast("long").alias("tot_len"),
                    F.sum("n_len").cast("long").alias("n_len"),
                )
            )
    sparse = bm25_topk_from_postings(
        postings, stats, _BM25_TERMS, k=50, dp=6
    ).select("doc_id", "score")

    emb = t["embeddings"]
    cents, state = _semdedup_fold(spark, sf_dir)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0).collect()[0][
            "embedding"
        ]
    ]
    probed = ann_probe_clusters(cents, qvec, nprobe=3, scale=10_000)
    dense = (
        ann_topk_from_state_rows(
            state.filter(F.col("cluster").isin(probed)),
            qvec,
            k=50,
            sim_scale=1_000,
            dp=6,
        )
        .withColumnRenamed("vec_id", "doc_id")
        .select("doc_id", "cosine")
    )
    return hybrid_rrf(sparse, dense, k_rrf=60, top_k=10)


def q_xsketch_window_collapse(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sliding-window sketch RETIREMENT, driver-verified (r16 staged,
    registered below the window): quantile sketches kept per
    (returnflag, tick-bucket) collapse over the ticks ≥ 1 window via
    ``operators/sketches.py::quantile_sketch_collapse`` — the oldest
    bucket RETIRES by deselection, no rebuild, no delete pass — and
    by the exact merge law the collapsed window equals the sketch
    built directly over the window's rows bit-for-bit, which is what
    the oracle builds. The returned rows ARE the collapsed state
    (grp, rid, val, lvl, thr), so the key is state-verifying by
    construction. At 100 TB a drift reference follows the window at
    sketch cost; history is never re-scanned."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        quantile_sketch,
        quantile_sketch_collapse,
        release_sketch_intermediates,
    )

    release_sketch_intermediates()
    t = load(spark, sf_dir, "lineitem")
    li = t["lineitem"].select(
        F.col("l_returnflag").alias("grp"),
        F.concat("l_orderkey", F.lit("-"), "l_linenumber").alias("rid"),
        F.col("l_quantity").cast("long").alias("val"),
        ((F.col("l_orderkey") + F.col("l_linenumber")) % 3).alias(
            "bucket"
        ),
    )
    fine = quantile_sketch(li, ["grp", "bucket"], "rid", "val", k=256)
    win = quantile_sketch_collapse(
        fine.filter(F.col("bucket") >= 1), ["grp"], ["bucket"], k=256
    )
    return win.select("grp", "rid", "val", "lvl", "thr")


def q_xks_drift_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov distribution drift read from maintained
    quantile-sketch states ALONE (r16 staged, registered below the
    window for the r17 head): the lineitem quantity stream splits into
    three (orderkey+linenumber)%3 ticks — ticks 0+1 fold into the
    REFERENCE sketch via ``operators/sketches.py::quantile_sketch`` +
    ``quantile_sketch_merge`` (the exact merge law the driver
    certified in ``xsketch_quantile_merge``), tick 2 is the CURRENT
    sketch — and ``ks_from_sketches`` computes per-returnflag KS from
    the ≤2k retained rows per group (2^thr weights cancel in the
    ECDF; integer cross-products, ONE division half-up 6dp,
    smallest-argmax tiebreak). Oracle: both sketch CTE chains (tick
    filters) + the same integer KS SQL. At 100 TB the drift alarm
    reads two metadata-sized states; neither population is
    re-scanned."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        ks_from_sketches,
        quantile_sketch,
        quantile_sketch_merge,
        release_sketch_intermediates,
    )

    release_sketch_intermediates()
    t = load(spark, sf_dir, "lineitem")
    li = t["lineitem"].select(
        F.col("l_returnflag").alias("grp"),
        F.concat("l_orderkey", F.lit("-"), "l_linenumber").alias("rid"),
        F.col("l_quantity").cast("long").alias("val"),
        ((F.col("l_orderkey") + F.col("l_linenumber")) % 3).alias(
            "__tick"
        ),
    )
    # ONE corpus scan for all three tick sketches (r18, guide §2.3):
    # levels are a pure function of the row id, so slicing the
    # (grp, tick)-grouped sketch at __tick == i is bit-identical to
    # building each tick's sketch separately.
    from kamu_engine_datafusion_spark.operators.sketches import (
        persist_sketch,
    )

    fine = persist_sketch(
        quantile_sketch(li, ["grp", "__tick"], "rid", "val", k=256)
    )
    parts = [
        fine.filter(F.col("__tick") == i).drop("__tick") for i in range(3)
    ]
    ref = quantile_sketch_merge([parts[0], parts[1]], ["grp"], k=256)
    return ks_from_sketches(ref, parts[2], ["grp"])


def q_xks_drift_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tick KS drift ALARM LOG (r16 staged, registered below the
    window — the dedup-trajectory device applied to drift): each
    arriving tick KS-tests against the ACCUMULATED reference sketch
    (tick 1 vs sketch(tick 0); tick 2 vs the exact-law merge of ticks
    0+1), appending ``(tick, grp, n_a, n_b, ks, ks_at, alarmed)``
    with ``alarmed = ks > 0.05`` — the monitoring loop a 100 TB
    ingest runs per tick, reading only metadata-sized sketch states.
    Oracle: two tick-filtered sketch-chain + KS blocks unioned with
    their tick labels."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        ks_from_sketches,
        persist_sketch,
        quantile_sketch,
        quantile_sketch_merge,
        release_sketch_intermediates,
    )

    release_sketch_intermediates()
    t = load(spark, sf_dir, "lineitem")
    li = t["lineitem"].select(
        F.col("l_returnflag").alias("grp"),
        F.concat("l_orderkey", F.lit("-"), "l_linenumber").alias("rid"),
        F.col("l_quantity").cast("long").alias("val"),
        ((F.col("l_orderkey") + F.col("l_linenumber")) % 3).alias(
            "__tick"
        ),
    )
    # ONE corpus scan for all three tick sketches (r18, guide §2.3):
    # the sampling level is a pure function of the row id, so a
    # (grp, tick)-grouped sketch sliced at __tick == i is BIT-IDENTICAL
    # to the sketch built over that tick's rows alone (each tick's
    # retain threshold sees exactly the same group rows). The old
    # per-tick builds paid three scans of lineitem; persist the fine
    # sketch once and every part is a metadata-sized slice.
    fine = persist_sketch(
        quantile_sketch(li, ["grp", "__tick"], "rid", "val", k=256)
    )
    parts = [
        fine.filter(F.col("__tick") == i).drop("__tick") for i in range(3)
    ]
    ref = parts[0]
    logs = []
    for k in (1, 2):
        row = ks_from_sketches(ref, parts[k], ["grp"]).select(
            F.lit(k).cast("long").alias("tick"),
            "grp",
            "n_a",
            "n_b",
            "ks",
            "ks_at",
            (F.col("ks") > 0.05).alias("alarmed"),
        )
        logs.append(row)
        if k < 2:
            ref = quantile_sketch_merge([ref, parts[k]], ["grp"], k=256)
    return logs[0].unionByName(logs[1])


def q_xppmi_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shifted positive PMI at skip-gram window 2 read from maintained
    count frames (r16 staged, registered below the window): gap-≤2
    pair counts and unigram counts fold cell-wise over three doc-id
    ticks (``operators/text.py::pair_counts(window=2)`` /
    ``term_counts`` — the ``maintained_pair_counts`` /
    ``maintained_term_counts`` folds) and ``ppmi_from_counts`` reads
    the top-100 ``max(0, pmi − ln 2)`` matrix (Levy & Goldberg 2014 —
    the statistic SGNS implicitly factorizes), half-up 6dp. Oracle:
    the gap-1 ∪ gap-2 pair stream + the same shifted-clamped float
    tree in SQL. At 100 TB the SPPMI read touches two vocab-bounded
    frames, never the corpus."""
    from kamu_engine_datafusion_spark.operators.text import (
        pair_counts,
        ppmi_from_counts,
        term_counts,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"]
    pairs, unis = None, None
    for i in range(3):
        tick = d.filter(F.col("doc_id") % 3 == i)
        pinc = pair_counts(tick, window=2)
        pairs = (
            pinc
            if pairs is None
            else pinc.unionByName(pairs)
            .groupBy("w1", "w2")
            .agg(F.sum("c").cast("long").alias("c"))
        )
        tinc = term_counts(tick)
        unis = (
            tinc
            if unis is None
            else tinc.unionByName(unis)
            .groupBy("token")
            .agg(F.sum("freq").cast("long").alias("freq"))
        )
    return ppmi_from_counts(
        _ckpt_state(pairs), _ckpt_state(unis), shift_k=2, min_count=5,
        top_k=100,
    )


def q_xdedup_trajectory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tick DEDUP-RATE TRAJECTORY (r16 staged, registered below
    the window): three doc-id ticks fold through
    ``operators/dedup.py::dedup_trajectory_increment`` — each tick
    reports ``(tick, n_docs, n_kept, n_dup, dup_rate)`` under the
    first-ARRIVAL-wins rule (content hash not yet indexed + lowest id
    within the tick), the index folds as an append-only hash set
    (idempotent semilattice; NULL texts share one group, the
    exact_dedup convention). Oracle: global
    ``row_number() OVER (PARTITION BY normalized_text ORDER BY tick,
    doc_id)`` — rank 1 IS first arrival — aggregated per tick with
    half-up-4dp rates. The curation dashboard a 100 TB crawl ingest
    keeps live: per tick one hash aggregate + an index join, history
    never re-hashed."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        dedup_trajectory_increment,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"]
    state = None
    stats_rows = []
    for i in range(3):
        stats, state = dedup_trajectory_increment(
            state, d.filter(F.col("doc_id") % 3 == i), i
        )
        state = _ckpt_state(state)
        stats_rows.append(stats)
    out = stats_rows[0]
    for s in stats_rows[1:]:
        out = out.unionByName(s)
    return out


def q_xsession_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session QUALITY gate over the user_id < 100 event stream
    (r16 staged, registered below the window): gap-sessionize at 30
    minutes (``operators/sessions.py::gap_sessionize`` — the
    xsessionize lag+cumsum pipeline as a module operator) and score
    each session — events, errors, distinct types, second-truncated
    duration, half-up-4dp error rate, ``ok`` = rate ≤ 0.25
    (``session_quality``). The trajectory-health gate an
    interaction-log training pipeline runs before admitting sessions
    as data. Oracle: the xsessionize CTEs + the same counters and
    gate. Scale: ONE user-keyed window, the session aggregate rides
    its partitioning."""
    from kamu_engine_datafusion_spark.operators.sessions import (
        session_quality,
    )

    t = load(spark, sf_dir, "events")
    ev = (
        t["events"]
        .filter(F.col("user_id") < 100)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    return session_quality(
        ev, gap_sec=1800, error_type="error", max_error_rate=0.25
    )


def q_xkmv_overlap_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tick-over-tick cross-source OVERLAP DRIFT alarm from KMV states
    (r16 staged, registered below the window): the per-source KMV
    sketch of the ticks-0+1 corpus vs the full corpus (the state
    before/after tick 2 lands — ``kmv_sketch`` on md5-normalized
    text, poly profile), each read into the one-pass
    ``kmv_overlap_monitor`` matrix, then
    ``operators/sketches.py::kmv_overlap_delta`` emits ``(pair,
    j_prev, j_cur, delta, alarm)`` with alarm = Δ > 0.02 and
    vanished/appeared pairs alarming on NULL delta. Oracle: the
    certified xkmv_overlap CTE chain replayed on BOTH slices + the
    same full-outer delta SQL. The provenance tripwire of the
    maintained overlap monitor — both matrices are |sources|²
    metadata; the corpus is never re-read."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        kmv_overlap_delta,
        kmv_overlap_monitor,
        kmv_sketch,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"].select(
        "doc_id", F.col("source").alias("grp"), _norm_md5().alias("__h")
    )
    prev_rows = d.filter(F.col("doc_id") % 3 < 2)
    k = 128
    prev_m = kmv_overlap_monitor(
        kmv_sketch(prev_rows, ["grp"], "__h", k=k), "grp", k=k, dp=4
    )
    cur_m = kmv_overlap_monitor(
        kmv_sketch(d, ["grp"], "__h", k=k), "grp", k=k, dp=4
    )
    return kmv_overlap_delta(prev_m, cur_m, alarm_delta=0.02, dp=4)


def q_xkmv_containment_delta(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tick-over-tick DIRECTIONAL containment drift from KMV states
    (r16 staged, registered below the window — the asymmetric twin of
    ``xkmv_overlap_delta``): the same two corpus slices and KMV
    monitor matrices, but the delta runs on ``containment_a_in_b`` —
    the alarm that fires when one feed starts ABSORBING another
    (containment(victim→absorber) → 1) before the size-diluted
    symmetric Jaccard moves. NULL containments (empty-side direction)
    alarm like missing pairs. Oracle: the dual-slice KMV chain with
    the containment column + the same full-outer delta."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        kmv_overlap_delta,
        kmv_overlap_monitor,
        kmv_sketch,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"].select(
        "doc_id", F.col("source").alias("grp"), _norm_md5().alias("__h")
    )
    prev_rows = d.filter(F.col("doc_id") % 3 < 2)
    k = 128
    prev_m = kmv_overlap_monitor(
        kmv_sketch(prev_rows, ["grp"], "__h", k=k), "grp", k=k, dp=4
    )
    cur_m = kmv_overlap_monitor(
        kmv_sketch(d, ["grp"], "__h", k=k), "grp", k=k, dp=4
    )
    return kmv_overlap_delta(
        prev_m, cur_m, alarm_delta=0.02, dp=4,
        metric="containment_a_in_b",
    )


def q_xtemperature_maintained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The maintained training-mix temperature monitor,
    driver-verified (registered r15 below the window; r16 head):
    per-lang counts fold cell-wise over three doc-id ticks — exactly
    ``streaming/structured.py::maintained_group_counts``'s fold — the
    cut table reads from the folded state
    (``operators/sampling.py::temperature_cuts_from_counts``, the
    batch cut rule verbatim), and the whole corpus samples in-row via
    ``sample_with_cuts`` (poly hash — SQL-replayable). Identical
    output to the batch ``temperature_sample`` because cuts from the
    full-ledger counts ARE the batch cuts (pytest-pinned). Oracle:
    the batch ``xsample_temperature`` SQL — per-lang survivor counts
    with the id_sum membership fingerprint."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        sample_with_cuts,
        temperature_cuts_from_counts,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"]
    state = None
    for i in range(3):
        inc = (
            d.filter(F.col("doc_id") % 3 == i)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        state = (
            inc
            if state is None
            else inc.unionByName(state)
            .groupBy("lang")
            .agg(F.sum("n").cast("long").alias("n"))
        )
    cuts = temperature_cuts_from_counts(
        _ckpt_state(state), "lang", alpha=0.5, target_fraction=0.4
    )
    return (
        sample_with_cuts(d, cuts, "doc_id", "lang", hash_fn="poly")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
        )
    )


def q_xcap_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintained per-source CAP state, driver-verified
    (registered r15 below the window; r16 head): the documents ledger
    folds over three doc-id ticks through ``operators/sampling.py::
    cap_state_increment`` — the top-n merge law under
    ``cap_per_group``'s exact (poly-hash bucket, id) order, exactly
    ``streaming/structured.py::maintained_cap``'s fold (pytest-pinned
    incl. survivor eviction and reverse-order invariance) — and the
    output is the batch ``q_xcap_per_source`` rollup of the folded
    state (per-source n_docs + the id_sum membership fingerprint), so
    the stored survivor SET itself is hash-verified against the batch
    ``xcap_per_source`` oracle."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        cap_state_increment,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"].select("doc_id", "source")
    state = None
    for i in range(3):
        state = _ckpt_state(
            cap_state_increment(
                state,
                d.filter(F.col("doc_id") % 3 == i),
                "doc_id",
                "source",
                cap=15,
                hash_fn="poly",
            )
        )
    return state.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
    )


def q_xcentroid_stats_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The folded centroid-drift STATE ROWS themselves,
    driver-verified — closing the read-vs-state gap of
    ``xcentroid_from_stats`` (whose oracle is the batch matrix): the
    per-label sufficient statistics ``(grp, n, sv, ss)`` fold
    element-wise over three vec-id ticks via
    ``operators/clustering.py::centroid_stats`` — exactly
    ``streaming/structured.py::maintained_centroid_stats``'s per-tick
    fold — and this key returns the state frame itself (``sv`` as a
    CSV string, the ``xminhash_index_maintained`` device). The oracle
    rebuilds the stats from TICK-STRUCTURED count CTEs (per-tick sums,
    then the cross-tick additive fold in SQL), so the hash match
    proves the folded state — not just a read over it — is right."""
    from kamu_engine_datafusion_spark.operators.clustering import (
        centroid_stats,
    )

    t = load(spark, sf_dir, "embeddings")
    emb = t["embeddings"].select(
        F.col("label").cast("long").alias("grp"), "vec_id", "embedding"
    )
    dim = 64
    state = None
    for i in range(3):
        inc = centroid_stats(
            emb.filter(F.col("vec_id") % 3 == i),
            "grp", "vec_id", "embedding", dim,
        )
        if state is None:
            state = inc
        else:
            state = (
                inc.unionByName(state.select("grp", "n", "sv", "ss"))
                .groupBy("grp")
                .agg(
                    F.sum("n").cast("long").alias("n"),
                    F.aggregate(
                        F.collect_list("sv"),
                        F.array(
                            *[F.lit(0).cast("long") for _ in range(dim)]
                        ),
                        lambda acc, v: F.zip_with(
                            acc, v, lambda a, b: a + b
                        ),
                    ).alias("sv"),
                    F.sum("ss").cast("long").alias("ss"),
                )
            )
    return state.select(
        "grp",
        "n",
        F.array_join(
            F.transform(F.col("sv"), lambda c: c.cast("string")), ","
        ).alias("sv_csv"),
        "ss",
    )


def q_xlm_counts_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The folded Stupid-Backoff COUNT FRAME itself, driver-verified —
    closing the read-vs-state gap of ``xlm_backoff_incremental``
    (whose oracle is the batch scoring): the unified ``(n, w1, w2, w3,
    c)`` n-gram counts of the doc_id < 250 reference fold cell-wise
    over three doc-id ticks via ``operators/text.py::lm_ngram_counts``
    — exactly ``streaming/structured.py::maintained_lm_counts``'s
    per-tick fold — and this key returns the count frame itself. The
    oracle rebuilds it from TICK-STRUCTURED count CTEs (per-tick
    unigram/bigram/trigram counts, then the cross-tick additive fold
    in SQL), so the hash match proves the folded model state — not
    just scores read through it — is right."""
    from kamu_engine_datafusion_spark.operators.text import (
        lm_ngram_counts,
    )

    t = load(spark, sf_dir, "documents")
    ref = t["documents"].filter(F.col("doc_id") < 250)
    counts = None
    for i in range(3):
        inc = lm_ngram_counts(ref.filter(F.col("doc_id") % 3 == i))
        counts = (
            inc
            if counts is None
            else inc.unionByName(counts)
            .groupBy("n", "w1", "w2", "w3")
            .agg(F.sum("c").cast("long").alias("c"))
        )
    return counts



# ---------------------------------------------------------------------------
# r17-staged families (registered BELOW the r17 window — the r18 head)
# ---------------------------------------------------------------------------


def q_xkmv_window_collapse(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sliding-window KMV RETIREMENT, r17 staged (registered below
    the window): per-(lang, tick-bucket) KMV sketches of the
    md5-normalized texts collapse over the buckets ≥ 1 window via
    ``operators/sketches.py::kmv_collapse`` — the oldest bucket
    RETIRES by deselection, no rebuild, no delete pass — and by the
    bottom-k merge law the collapsed window equals the KMV sketch
    built DIRECTLY over the window's rows row-for-row, which is what
    the oracle builds. The returned rows ARE the collapsed state
    (grp, hv), so the key is state-verifying by construction. At
    100 TB a windowed distinct-count reference follows the stream at
    ≤ k longs per (group, bucket); history is never re-hashed."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        kmv_collapse,
        kmv_sketch,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"].select(
        F.col("lang").alias("grp"),
        (F.col("doc_id") % 3).alias("bucket"),
        _norm_md5().alias("__h"),
    )
    fine = kmv_sketch(
        d, ["grp", "bucket"], "__h", k=100, hash_fn="poly"
    )
    win = kmv_collapse(
        fine.filter(F.col("bucket") >= 1), ["grp"], ["bucket"], k=100
    )
    return win.select("grp", "hv")


def q_xppmi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tick COLLOCATION-SHIFT alarm log, r17 staged (registered
    below the window — the ``xks_drift_log`` shape over the SPPMI
    matrix): ticks 1 and 2 each read their own top-100 shifted-PPMI
    matrix (``operators/text.py::ppmi_from_counts`` over the tick's
    pair/unigram counts) and diff it against the ACCUMULATED
    reference's via ``sppmi_drift_summary`` — pair sets compared,
    common pairs scored ``max |Δsppmi|``, ``alarmed`` when the
    overlap Jaccard drops below 0.5 — then the tick's counts fold
    into the reference (``maintained_pair_counts`` /
    ``maintained_term_counts``'s cell-wise law), so history is never
    re-paired. Oracle: two tick-filtered SPPMI CTE chains per tick,
    full-outer joined with the same integer/float tree, unioned with
    their tick labels."""
    from kamu_engine_datafusion_spark.operators.text import (
        pair_counts,
        ppmi_from_counts,
        sppmi_drift_summary,
        term_counts,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"]
    tick0 = d.filter(F.col("doc_id") % 3 == 0)
    pairs_st = pair_counts(tick0, window=2)
    unis_st = term_counts(tick0)
    out = None
    for tk in (1, 2):
        tick = d.filter(F.col("doc_id") % 3 == tk)
        cur_p = pair_counts(tick, window=2)
        cur_u = term_counts(tick)
        ref_top = ppmi_from_counts(
            pairs_st, unis_st, shift_k=2, min_count=3, top_k=100
        )
        cur_top = ppmi_from_counts(
            cur_p, cur_u, shift_k=2, min_count=3, top_k=100
        )
        row = sppmi_drift_summary(
            ref_top, cur_top, tk, jaccard_alarm=0.5
        )
        out = row if out is None else out.unionByName(row)
        pairs_st = (
            cur_p.unionByName(pairs_st)
            .groupBy("w1", "w2")
            .agg(F.sum("c").cast("long").alias("c"))
        )
        unis_st = (
            cur_u.unionByName(unis_st)
            .groupBy("token")
            .agg(F.sum("freq").cast("long").alias("freq"))
        )
    return out


def q_xsession_rates_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Session-quality × maintained quality-rates JOIN read, r17
    staged (registered below the window): each scored session
    (``operators/sessions.py::session_quality`` over the user_id <
    100 event stream) joins its traffic source's LIVE health from the
    folded Gopher counter state (``quality_rates_from_counts`` over
    the 3-tick ``quality_rule_counts`` fold — the
    xquality_rates_maintained chain) via the deterministic
    user→source mapping ``src_rank = user_id % |sources| + 1`` (rank
    = dense source order) — and a session is ADMITTED as training
    data only when its own gate passes AND its source's pass-all rate
    clears 0.2: the composed admission rule an interaction-log
    pipeline runs per tick, reading |sources| metadata rows for the
    health side. Oracle: the certified xsessionize CTEs + the
    certified rate CTEs + the same rank join."""
    from pyspark.sql import Window

    from kamu_engine_datafusion_spark.operators.sessions import (
        session_quality,
    )
    from kamu_engine_datafusion_spark.operators.text import (
        quality_rates_from_counts,
        quality_rule_counts,
    )

    t = load(spark, sf_dir, "documents", "events")
    ev = (
        t["events"]
        .filter(F.col("user_id") < 100)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    sq = session_quality(
        ev, gap_sec=1800, error_type="error", max_error_rate=0.25
    )
    d = t["documents"]
    state = None
    for i in range(3):
        inc = quality_rule_counts(
            d.filter(F.col("doc_id") % 3 == i), "source"
        )
        if state is None:
            state = inc
        else:
            csum = [
                F.sum(c).cast("long").alias(c)
                for c in inc.columns
                if c != "grp"
            ]
            state = inc.unionByName(state).groupBy("grp").agg(*csum)
    rates = quality_rates_from_counts(_ckpt_state(state), dp=4).select(
        "grp", "rate_pass_all"
    )
    # |sources| metadata rows: the rank window and the count scalar
    # are both bounded by the source cardinality (documented
    # bounded-window class)
    ranked = rates.withColumn(
        "src_rank",
        F.row_number().over(Window.orderBy("grp")).cast("long"),
    )
    k_df = ranked.agg(F.count(F.lit(1)).cast("long").alias("__k"))
    return (
        sq.crossJoin(F.broadcast(k_df))
        .withColumn("src_rank", F.col("user_id") % F.col("__k") + 1)
        .join(F.broadcast(ranked), "src_rank")
        .select(
            "user_id",
            "session_id",
            "n_events",
            "n_errors",
            "n_types",
            "duration_sec",
            "error_rate",
            "ok",
            F.col("grp").alias("source"),
            "rate_pass_all",
            (F.col("ok") & (F.col("rate_pass_all") >= F.lit(0.2)))
            .alias("admitted"),
        )
    )


def q_xhybrid_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid serving with PER-STORE FRESHNESS, r17 staged
    (registered below the window — the xhybrid_maintained read
    extended with staleness metadata): the postings store folds all
    THREE document ticks while the SemDeDup ANN store deliberately
    folds only ticks 0–1, and the fused read reports which store lags
    — ``postings_tick`` / ``ann_tick`` DERIVED from the stores
    themselves (max folded tick id per store, a one-row aggregate
    each, never a hand-written literal) with ``store_lag`` their
    difference. The RRF list is genuinely served from the STALER ANN
    store (the oracle replays the 2-tick survivor chain), so the key
    pins both the staleness arithmetic and the fact that a lagging
    store changes the fused ranking. At 100 TB this is the
    serving-side monitoring contract: every hybrid answer carries the
    tick-age of each store it consulted."""
    from kamu_engine_datafusion_spark.operators.retrieval import (
        bm25_topk_from_postings,
        hybrid_rrf,
        postings_increment,
        term_stats_increment,
    )
    from kamu_engine_datafusion_spark.streaming.structured import (
        ann_probe_clusters,
        ann_topk_from_state_rows,
    )

    t = load(spark, sf_dir, "documents", "embeddings")
    d = t["documents"]
    postings = None
    stats = None
    for i in range(3):
        tick = d.filter(F.col("doc_id") % 3 == i)
        pinc = postings_increment(tick)
        postings = (
            pinc if postings is None else postings.unionByName(pinc)
        )
        sinc = term_stats_increment(tick)
        if stats is None:
            stats = sinc
        else:
            stats = (
                stats.unionByName(sinc)
                .groupBy("term")
                .agg(
                    F.sum("df").cast("long").alias("df"),
                    F.sum("n_docs").cast("long").alias("n_docs"),
                    F.sum("tot_len").cast("long").alias("tot_len"),
                    F.sum("n_len").cast("long").alias("n_len"),
                )
            )
    sparse = bm25_topk_from_postings(
        postings, stats, _BM25_TERMS, k=50, dp=6
    ).select("doc_id", "score")

    emb = t["embeddings"]
    cents, state = _semdedup_fold(spark, sf_dir, n_ticks=2)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0).collect()[0][
            "embedding"
        ]
    ]
    probed = ann_probe_clusters(cents, qvec, nprobe=3, scale=10_000)
    dense = (
        ann_topk_from_state_rows(
            state.filter(F.col("cluster").isin(probed)),
            qvec,
            k=50,
            sim_scale=1_000,
            dp=6,
        )
        .withColumnRenamed("vec_id", "doc_id")
        .select("doc_id", "cosine")
    )
    fused = hybrid_rrf(sparse, dense, k_rrf=60, top_k=10)
    pt = postings.agg(
        F.max(F.col("doc_id") % 3).cast("long").alias("postings_tick")
    )
    at = state.agg(
        F.max(F.col("vec_id") % 3).cast("long").alias("ann_tick")
    )
    return (
        fused.crossJoin(F.broadcast(pt))
        .crossJoin(F.broadcast(at))
        .withColumn(
            "store_lag",
            (F.col("postings_tick") - F.col("ann_tick")).cast("long"),
        )
    )



def q_xspan_dedup_maintained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MAINTAINED substring-span dedup, r17 staged (registered below
    the window): the doc_id < 300 corpus folds through three
    CONTIGUOUS-RANGE ticks ([0,100), [100,200), [200,300) — the
    append-ledger order the fold law requires) via
    ``operators/dedup.py::span_dedup_increment``: each tick marks
    windows whose 8-gram is in the maintained first-occurrence index
    OR repeated within the tick, merges them into maximal spans, and
    folds its gram hashes into the index. Under the append order the
    unioned per-tick spans equal the batch ``duplicate_spans`` of the
    whole slice ROW-FOR-ROW — the oracle IS the certified batch span
    oracle (``_span_oracle(k=8)``), so a hash match proves the fold
    law through the driver. At 100 TB each tick re-tokenizes only
    itself and probes the hash-bucketed gram index; history text is
    never re-read."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        span_dedup_increment,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"].filter(F.col("doc_id") < 300)
    state = None
    out = None
    for lo, hi in ((0, 100), (100, 200), (200, 300)):
        tick = d.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        spans, state = span_dedup_increment(state, tick, min_len=8)
        out = spans if out is None else out.unionByName(spans)
    return out



def q_xspan_removal_maintained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MAINTAINED span REMOVAL serving read, r17 staged (the cut twin
    of ``xspan_dedup_maintained``): each contiguous-range tick's spans
    come from the maintained gram index (``span_dedup_increment``)
    and are cut from THAT TICK's docs alone via
    ``operators/dedup.py::remove_spans`` — the canonical first
    occurrence (possibly in an earlier tick) survives untouched, and
    under the append order the unioned cleaned ticks equal the batch
    ``remove_duplicate_spans`` of the whole slice row-for-row. Oracle:
    the certified batch removal oracle verbatim. At 100 TB each tick
    cleans itself against the hash-bucketed index; cleaned history is
    never rewritten."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        remove_spans,
        span_dedup_increment,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"].filter(F.col("doc_id") < 300).select(
        "doc_id", "text"
    )
    state = None
    out = None
    for lo, hi in ((0, 100), (100, 200), (200, 300)):
        tick = d.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        spans, state = span_dedup_increment(state, tick, min_len=8)
        cleaned = remove_spans(tick, spans)
        out = cleaned if out is None else out.unionByName(cleaned)
    return out


def q_xks_window_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-shift SELF-DRIFT over collapsed quantile sketches, r17
    staged (the ``xsketch_window_collapse`` retirement read feeding
    BOTH KS inputs): per-(source, tick-bucket) sketches of the
    token-length distribution collapse into the trailing window
    (buckets {0,1}) and the shifted window (buckets {1,2}) — the
    before/after of one retirement step — and ``ks_from_sketches``
    reads the distribution shift per source from two metadata-sized
    collapsed states. By the exact merge law each collapse equals the
    direct window build, so the oracle builds both windows directly
    and replays the integer-cross-product KS. The monitoring question
    a sliding drift reference answers after every retirement: did
    dropping the oldest bucket and admitting the newest move the
    distribution?"""
    from kamu_engine_datafusion_spark.functions.columns import tokens
    from kamu_engine_datafusion_spark.operators.sketches import (
        ks_from_sketches,
        persist_sketch,
        quantile_sketch,
        quantile_sketch_collapse,
        release_sketch_intermediates,
    )

    release_sketch_intermediates()
    t = load(spark, sf_dir, "documents")
    d = t["documents"].select(
        F.col("source").alias("grp"),
        F.col("doc_id").cast("string").alias("rid"),
        F.size(tokens("text")).cast("long").alias("val"),
        (F.col("doc_id") % 3).alias("bucket"),
    )
    # The fine per-bucket sketch feeds BOTH window collapses; persist
    # the metadata-sized frame so the corpus tokenize+sketch runs once.
    fine = persist_sketch(
        quantile_sketch(d, ["grp", "bucket"], "rid", "val", k=256)
    )
    before = quantile_sketch_collapse(
        fine.filter(F.col("bucket") < 2), ["grp"], ["bucket"], k=256
    )
    after = quantile_sketch_collapse(
        fine.filter(F.col("bucket") >= 1), ["grp"], ["bucket"], k=256
    )
    return ks_from_sketches(before, after, ["grp"])


def q_xkmv_window_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WINDOWED cross-source overlap matrix, r17 staged
    (``kmv_collapse`` feeding the combined overlap monitor): per-
    (source, tick-bucket) KMV sketches of the md5-normalized texts
    collapse into the buckets ≥ 1 window per source, and
    ``kmv_overlap_monitor`` reads pairwise Jaccard AND directional
    containment between the WINDOW slices of every source pair from
    the collapsed states alone — recency-scoped overlap (is source A
    still feeding us source B's recent content?) instead of the
    all-history matrix. Oracle: the direct window KMV chains + the
    certified one-pass union-top-k monitor SQL. At 100 TB both
    matrices read ≤ k state rows per source; neither corpus slice is
    re-hashed."""
    from kamu_engine_datafusion_spark.operators.sketches import (
        kmv_collapse,
        kmv_overlap_monitor,
        kmv_sketch,
    )

    t = load(spark, sf_dir, "documents")
    d = t["documents"].select(
        F.col("source").alias("grp"),
        (F.col("doc_id") % 3).alias("bucket"),
        _norm_md5().alias("__h"),
    )
    fine = kmv_sketch(
        d, ["grp", "bucket"], "__h", k=128, hash_fn="poly"
    )
    win = kmv_collapse(
        fine.filter(F.col("bucket") >= 1), ["grp"], ["bucket"], k=128
    )
    return kmv_overlap_monitor(win, "grp", k=128, dp=4)


QUERIES = {
    "xsketch_kmv": q_xsketch_kmv,
    "xsketch_kmv_merge": q_xsketch_kmv_merge,
    "xkmv_overlap": q_xkmv_overlap,
    "xheavy_hitters": q_xheavy_hitters,
    "xcorpus_card_maintained": q_xcorpus_card_maintained,
    "xhard_negatives": q_xhard_negatives,
    "xrater_kappa": q_xrater_kappa,
    "xminhash_index_maintained": q_xminhash_index_maintained,
    "xsemdedup_incremental": q_xsemdedup_incremental,
    "xann_semdedup_topk": q_xann_semdedup_topk,
    "xkmv_overlap_maintained": q_xkmv_overlap_maintained,
    "xcurriculum_sketch": q_xcurriculum_sketch,
    "xdrift_psi_maintained": q_xdrift_psi_maintained,
    "xheavy_hitters_grid": q_xheavy_hitters_grid,
    "xdsir_incremental": q_xdsir_incremental,
    "xcentroid_from_stats": q_xcentroid_from_stats,
    "xlm_backoff_incremental": q_xlm_backoff_incremental,
    "xsessions_maintained": q_xsessions_maintained,
    "xretention_maintained": q_xretention_maintained,
    "xfunnel_maintained": q_xfunnel_maintained,
    "xtransitions_maintained": q_xtransitions_maintained,
    "xdebounce_maintained": q_xdebounce_maintained,
    "xquality_rates_maintained": q_xquality_rates_maintained,
    "xvocab_maintained": q_xvocab_maintained,
    "xbloom_decontaminate_maintained": q_xbloom_decontaminate_maintained,
    "xbm25_postings_maintained": q_xbm25_postings_maintained,
    "xcentroid_stats_state": q_xcentroid_stats_state,
    "xlm_counts_state": q_xlm_counts_state,
    # registered r15 BELOW the driver window (locally sweep-green at 3
    # SFs); the r16 rotation plan puts them at the window head
    "xintervals_maintained": q_xintervals_maintained,
    "xasof_maintained": q_xasof_maintained,
    "xmmr_semdedup": q_xmmr_semdedup,
    "xcollocations_maintained": q_xcollocations_maintained,
    "xnovelty_maintained": q_xnovelty_maintained,
    "xmoments_state": q_xmoments_state,
    "xzscore_maintained": q_xzscore_maintained,
    "xretention_state": q_xretention_state,
    "xtransitions_state": q_xtransitions_state,
    "xvocab_state": q_xvocab_state,
    "xcollocations_state": q_xcollocations_state,
    "xquality_rates_state": q_xquality_rates_state,
    "xtemperature_state": q_xtemperature_state,
    "xfunnel_state": q_xfunnel_state,
    "xnovelty_state": q_xnovelty_state,
    "xhybrid_maintained": q_xhybrid_maintained,
    "xks_drift_sketch": q_xks_drift_sketch,
    "xks_drift_log": q_xks_drift_log,
    "xsketch_window_collapse": q_xsketch_window_collapse,
    "xkmv_window_collapse": q_xkmv_window_collapse,
    "xppmi_drift": q_xppmi_drift,
    "xsession_rates_gate": q_xsession_rates_gate,
    "xhybrid_freshness": q_xhybrid_freshness,
    "xspan_dedup_maintained": q_xspan_dedup_maintained,
    "xspan_removal_maintained": q_xspan_removal_maintained,
    "xks_window_drift": q_xks_window_drift,
    "xkmv_window_overlap": q_xkmv_window_overlap,
    "xppmi_window": q_xppmi_window,
    "xdedup_trajectory": q_xdedup_trajectory,
    "xsession_quality": q_xsession_quality,
    "xkmv_overlap_delta": q_xkmv_overlap_delta,
    "xkmv_containment_delta": q_xkmv_containment_delta,
    "xtemperature_maintained": q_xtemperature_maintained,
    "xcap_maintained": q_xcap_maintained,
    "xsample_weighted_merge": q_xsample_weighted_merge,
    "xbm25_incremental": q_xbm25_incremental,
    "xlm_backoff": q_xlm_backoff,
    "xdistinctive_tokens": q_xdistinctive_tokens,
    "xnegative_samples": q_xnegative_samples,
    "xtop_pc": q_xtop_pc,
    "xmm_phash_incremental": q_xmm_phash_incremental,
    "xurl_dedup": q_xurl_dedup,
    "xdomain_cap": q_xdomain_cap,
    "xsketch_quantile_merge": q_xsketch_quantile_merge,
    "xsketch_cm_merge": q_xsketch_cm_merge,
    "xwinsorize_sketch": q_xwinsorize_sketch,
    "xdedup_index_pairs": q_xdedup_index_pairs,
    "xtext_repetition_report": q_xtext_repetition_report,
    "xsource_tvd": q_xsource_tvd,
    "xcentroid_shift": q_xcentroid_shift,
    "xdecontaminate_bloom": q_xdecontaminate_bloom,
    "xunpivot": q_xunpivot,
    "xmerge_intervals": q_xmerge_intervals,
    "xpipeline_embed": q_xpipeline_embed,
    "xdrift_psi": q_xdrift_psi,
    "xbpe": q_xbpe,
    "xbpe_encode": q_xbpe_encode,
    "xcdc_ingest": q_xcdc_ingest,
    "xsample": q_xsample,
    "xsample_stratified": q_xsample_stratified,
    "xupsample_repeat": q_xupsample_repeat,
    "xlength_buckets": q_xlength_buckets,
    "xinterleave": q_xinterleave,
    "xinterleave_dist": q_xinterleave_dist,
    "xledger_compact": q_xledger_compact,
    "xsample_weighted_group": q_xsample_weighted_group,
    "xtext_truncate": q_xtext_truncate,
    "xcorpus_card": q_xcorpus_card,
    "xdedup_cross": q_xdedup_cross,
    "xpipeline_curate": q_xpipeline_curate,
    "xdebounce": q_xdebounce,
    "xlangid_eval": q_xlangid_eval,
    "xdedup_report": q_xdedup_report,
    "xvocab_coverage": q_xvocab_coverage,
    "xpack_ffd": q_xpack_ffd,
    "xpack_ffd_stats": q_xpack_ffd_stats,
    "xdsir_sample": q_xdsir_sample,
    "xdsir_diag": q_xdsir_diag,
    "xpipeline_dsir": q_xpipeline_dsir,
    "xngram_novelty": q_xngram_novelty,
    "xcurriculum": q_xcurriculum,
    "xpack_efficiency": q_xpack_efficiency,
    "xpipeline_curriculum": q_xpipeline_curriculum,
    "xtok_fertility": q_xtok_fertility,
    "xsource_overlap": q_xsource_overlap,
    "xsample_weighted": q_xsample_weighted,
    "xsample_temperature": q_xsample_temperature,
    "xcap_per_source": q_xcap_per_source,
    "xshuffle": q_xshuffle,
    "xbm25": q_xbm25,
    "xtfidf": q_xtfidf,
    "xsplit_by_group": q_xsplit_by_group,
    "xmix_budget": q_xmix_budget,
    "xpipeline_e2e": q_xpipeline_e2e,
    "xpack_sequences": q_xpack_sequences,
    "xpack_layout": q_xpack_layout,
    "xvocab": q_xvocab,
    "xvocab_oov": q_xvocab_oov,
    "xlm_score": q_xlm_score,
    "xchunk_docs": q_xchunk_docs,
    "xquality_gate": q_xquality_gate,
    "xsim_topk_batch": q_xsim_topk_batch,
    "xdecontaminate_13": q_xdecontaminate_13,
    "xdecontaminate_fuzzy": q_xdecontaminate_fuzzy,
    "xsnapshot": q_xsnapshot,
    "xscd2": q_xscd2,
    "xrollup_time": q_xrollup_time,
    "xrollup_gapfill": q_xrollup_gapfill,
    "xfunnel": q_xfunnel,
    "xretention": q_xretention,
    "xchangelog_agg": q_xchangelog_agg,
    "xchangelog_merge": q_xchangelog_merge,
    "xsnapshot_merge": q_xsnapshot_merge,
    "xoutliers": q_xoutliers,
    "xtext_clean": q_xtext_clean,
    "xbigram_lm": q_xbigram_lm,
    "xdq_checks": q_xdq_checks,
    "xwinsorize": q_xwinsorize,
    "xfuzzy_join": q_xfuzzy_join,
    "xkey_skew": q_xkey_skew,
    "xmm_phash": q_xmm_phash,
    "xmm_phash_neardup": q_xmm_phash_neardup,
    "xskipgram": q_xskipgram,
    "xtransitions": q_xtransitions,
    "xcorr_matrix": q_xcorr_matrix,
    "xquantile_bins": q_xquantile_bins,
    "xstandardize": q_xstandardize,
    "xrolling_time": q_xrolling_time,
    "xmmr": q_xmmr,
    "xtext_entropy": q_xtext_entropy,
    "xcollocations": q_xcollocations,
    "xhistogram": q_xhistogram,
    "xrange_join": q_xrange_join,
    "xsalted_agg": q_xsalted_agg,
    "xdedup_incremental": q_xdedup_incremental,
    "xprofile": q_xprofile,
    "xlayout_zonemap": q_xlayout_zonemap,
    "xlayout_zorder": q_xlayout_zorder,
    "xcluster_kmeans": q_xcluster_kmeans,
    "xcluster_semdedup": q_xcluster_semdedup,
    "xcluster_quality": q_xcluster_quality,
    "xsketch_hll": q_xsketch_hll,
    "xsketch_countmin": q_xsketch_countmin,
    "xsketch_quantile": q_xsketch_quantile,
    "xquality_classifier": q_xquality_classifier,
    "xsim_pq": q_xsim_pq,
    "xskyline": q_xskyline,
    "xtext_gopher": q_xtext_gopher,
    "xtext_c4_filter": q_xtext_c4_filter,
    "xsessionize": q_xsessionize,
    "xpivot": q_xpivot,
    "xdedup_exact": q_xdedup_exact,
    "xdedup_minhash": q_xdedup_minhash,
    "xdedup_minhash_survivors": q_xdedup_minhash_survivors,
    "xdedup_simhash": q_xdedup_simhash,
    "xdedup_ngram_jaccard": q_xdedup_ngram_jaccard,
    "xdedup_cluster": q_xdedup_cluster,
    "xdedup_cc_incremental": q_xdedup_cc_incremental,
    "xdedup_canonical": q_xdedup_canonical,
    "xhybrid_rrf": q_xhybrid_rrf,
    "xsnapshot_diff": q_xsnapshot_diff,
    "xdedup_semantic": q_xdedup_semantic,
    "xdedup_paragraph": q_xdedup_paragraph,
    "xdedup_spans": q_xdedup_spans,
    "xdedup_span_removal": q_xdedup_span_removal,
    "xdedup_lines": q_xdedup_lines,
    "xdedup_minhash_sql": q_xdedup_minhash_sql,
    "xdedup_simhash_sql": q_xdedup_simhash_sql,
    "xdedup_embcos": q_xdedup_embcos,
    "xsim_topk_brute": q_xsim_topk_brute,
    "xsim_quantize": q_xsim_quantize,
    "xsim_quantized_topk": q_xsim_quantized_topk,
    "xsim_srp_lsh": q_xsim_srp_lsh,
    "xsim_ivf": q_xsim_ivf,
    "xtext_langid": q_xtext_langid,
    "xtext_quality": q_xtext_quality,
    "xtext_tokens": q_xtext_tokens,
    "xtext_fingerprint": q_xtext_fingerprint,
    "xtext_repetition": q_xtext_repetition,
    "xdecontaminate": q_xdecontaminate,
    "xtext_redact_pii": q_xtext_redact_pii,
    "xmm_decode": q_xmm_decode,
    "xmm_features": q_xmm_features,
    "xmm_frames": q_xmm_frames,
    "xasof_join": q_xasof_join,
}

def _poly_shard_sql(col: str, shards: int) -> str:
    """DuckDB twin of ``operators/sampling._shard(..., hash_fn="poly")``:
    the 31-bit polynomial char fold of the id's string form, mod the
    shard count (both non-negative, so ``%`` ≡ pmod)."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
        f"string_split(CAST({col} AS VARCHAR), ''), "
        "ch -> CAST(ascii(ch) AS BIGINT))), "
        f"(a, b) -> (a * 31 + b) % 2147483647) % {shards}"
    )


_NORM_TOKENS = "list_distinct(string_split_regex(trim(lower(text)), '\\s+'))"

_STOP_RE = {
    "de": "\\b(der|die|das|und|ist|nicht|von|mit|ein|zu)\\b",
    "en": "\\b(the|and|of|to|is|in|that|it|was|for)\\b",
    "es": "\\b(el|la|de|que|y|en|un|es|se|no)\\b",
    "fr": "\\b(le|la|de|et|est|un|une|dans|que|pour)\\b",
}


def _hits(lang: str) -> str:
    return f"len(regexp_extract_all(lower(text), '{_STOP_RE[lang]}'))"


_COS = (
    "list_dot_product(a.emb_d, b.emb_d) / "
    "(sqrt(list_dot_product(a.emb_d, a.emb_d)) * "
    "sqrt(list_dot_product(b.emb_d, b.emb_d)))"
)

def _embcos_srp_oracle(
    threshold: float = 0.8,
    dim: int = 64,
    num_bands: int = 4,
    bits_per_band: int = 8,
    id_max: int = 2000,
) -> str:
    """DuckDB oracle replicating the SRP-LSH embedding near-dup pipeline
    bit-for-bit: hyperplane components from the same integer LCG
    (``operators.dedup.srp_plane_components``), same band keys, same
    exact-cosine verification — both engines sum dot products
    left-to-right in double, so even the sign decisions agree."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        _SRP_LCG_A,
        _SRP_LCG_B,
        _SRP_LCG_M,
    )

    def plane(p: int) -> str:
        return (
            f"list_transform(range(0, {dim}), i -> "
            f"CAST((({_SRP_LCG_A}*({p}*{dim}+i)+{_SRP_LCG_B})%{_SRP_LCG_M})"
            f"-{_SRP_LCG_M // 2} AS DOUBLE))"
        )

    band_keys = []
    for j in range(num_bands):
        bits = [
            f"(CASE WHEN list_dot_product(emb_d, {plane(j * bits_per_band + r)})"
            f" >= 0 THEN {1 << r} ELSE 0 END)"
            for r in range(bits_per_band)
        ]
        band_keys.append(f"({j * (1 << bits_per_band)} + {' + '.join(bits)})")
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb_d "
        f"FROM embeddings WHERE vec_id < {id_max}), "
        f"banded AS (SELECT vec_id, unnest([{', '.join(band_keys)}]) AS bk "
        "FROM e), "
        "cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b "
        "FROM banded x JOIN banded y ON x.bk = y.bk AND x.vec_id < y.vec_id) "
        "SELECT id_a, id_b, round(cos_v, 6) AS cosine "
        "FROM (SELECT id_a, id_b, "
        "list_dot_product(a.emb_d, b.emb_d) / "
        "(sqrt(list_dot_product(a.emb_d, a.emb_d)) * "
        "sqrt(list_dot_product(b.emb_d, b.emb_d))) AS cos_v "
        "FROM cand JOIN e a ON cand.id_a = a.vec_id "
        "JOIN e b ON cand.id_b = b.vec_id) "
        f"WHERE cos_v >= {threshold}"
    )


def _srp_lsh_oracle(bits: int = 8, dim: int = 64, k: int = 10) -> str:
    """DuckDB oracle replicating srp_lsh_topk with LCG planes: packed
    sign-bit signature, same-bucket filter, exact cosine re-rank."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        _SRP_LCG_A,
        _SRP_LCG_B,
        _SRP_LCG_M,
    )

    def plane(p: int) -> str:
        return (
            f"list_transform(range(0, {dim}), i -> "
            f"CAST((({_SRP_LCG_A}*({p}*{dim}+i)+{_SRP_LCG_B})%{_SRP_LCG_M})"
            f"-{_SRP_LCG_M // 2} AS DOUBLE))"
        )

    sig = " + ".join(
        f"(CASE WHEN list_dot_product(emb, {plane(p)}) >= 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(bits)
    )
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb "
        "FROM embeddings), "
        f"s AS (SELECT vec_id, emb, {sig} AS sig FROM e), "
        "q AS (SELECT emb AS qemb, sig AS qsig FROM s WHERE vec_id = 0) "
        "SELECT vec_id, cosine FROM ("
        "SELECT s.vec_id, round(list_dot_product(s.emb, q.qemb) / "
        "(sqrt(list_dot_product(s.emb, s.emb)) * "
        "sqrt(list_dot_product(q.qemb, q.qemb))), 6) AS cosine "
        "FROM s, q WHERE s.sig = q.qsig) "
        f"ORDER BY cosine DESC, vec_id LIMIT {k}"
    )


def _incremental_dedup_oracle() -> str:
    """DuckDB oracle for the incremental index dedup: poly-hash
    signatures (same coefficients as the Spark side), band-position-
    qualified fold keys, MinHash agreement estimate >= threshold."""
    from kamu_engine_datafusion_spark.functions.columns import (
        _MERSENNE_31 as M,
        _SHINGLE_PRIME as P,
        minhash_coeffs,
    )

    coeffs = minhash_coeffs(16, seed=42)
    mins = ", ".join(
        f"min((hv * {a} + {b}) % {M}) AS m{j}" for j, (a, b) in enumerate(coeffs)
    )
    bands = []
    for band in range(4):
        acc = "CAST(0 AS BIGINT)"
        for i in range(4):
            acc = f"(({acc}) * {P} + m{band * 4 + i}) % {M}"
        bands.append(
            f"SELECT doc_id, {band} AS bandpos, {acc} AS bandkey FROM sig"
        )
    bands_sql = " UNION ALL ".join(bands)
    est = (
        "("
        + " + ".join(f"CASE WHEN x.m{j} = y.m{j} THEN 1 ELSE 0 END" for j in range(16))
        + ") / 16.0"
    )
    return (
        "WITH d AS (SELECT doc_id, lang, text FROM documents WHERE doc_id < 300), "
        "tq AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t "
        "FROM d), "
        "shl AS (SELECT doc_id, list_distinct(list_transform("
        "generate_series(1, greatest(1, len(t) - 2)), "
        "i -> array_to_string(t[i:i+2], ' '))) AS shs FROM tq), "
        "sh AS (SELECT doc_id, unnest(shs) AS s FROM shl), "
        "h AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(s, ''), ch -> CAST(ascii(ch) AS BIGINT))), "
        f"(a, b) -> (a * 31 + b) % {M}) AS hv FROM sh), "
        f"sig AS (SELECT doc_id, {mins} FROM h GROUP BY doc_id), "
        f"bands AS ({bands_sql}), "
        "cand AS (SELECT DISTINCT n.doc_id AS new_id, i.doc_id AS old_id "
        "FROM bands n JOIN bands i ON n.bandpos = i.bandpos "
        "AND n.bandkey = i.bandkey "
        "WHERE n.doc_id >= 150 AND (i.doc_id < 150 OR i.doc_id < n.doc_id)), "
        f"dead AS (SELECT DISTINCT c.new_id FROM cand c "
        "JOIN sig x ON x.doc_id = c.new_id JOIN sig y ON y.doc_id = c.old_id "
        f"WHERE {est} >= 0.7) "
        "SELECT lang, count(*) AS n_docs FROM d "
        "WHERE doc_id >= 150 AND doc_id NOT IN (SELECT new_id FROM dead) "
        "GROUP BY lang"
    )


def _mmr_oracle(k: int = 5, pool: int = 20, lam: float = 0.7) -> str:
    """Unrolled greedy-MMR oracle: pool + pairwise sims once, then one
    (candidates → argmax) CTE pair per step, selections accumulated by
    UNION ALL — mechanical but exact (same 6dp half-up-rounded inputs
    and id tie-break as the operator; half-up ``floor(x·1e6+0.5)/1e6``
    because the engines' round() builtins disagree on exact halves)."""
    cos = _fhu(
        "list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * "
        "sqrt(list_dot_product({b}, {b})))",
        6,
    )
    parts = [
        "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv "
        "FROM embeddings WHERE vec_id = 0), "
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings), "
        "pool AS (SELECT vec_id, v, "
        + cos.format(a="v", b="qv")
        + f" AS rel FROM e CROSS JOIN q ORDER BY rel DESC, vec_id LIMIT {pool}), "
        "s AS (SELECT a.vec_id AS ia, b.vec_id AS ib, "
        + cos.format(a="a.v", b="b.v")
        + " AS sab FROM pool a CROSS JOIN pool b), "
        "p1 AS (SELECT vec_id, rel, rel AS mmr FROM pool "
        "ORDER BY rel DESC, vec_id LIMIT 1), "
        "sel1 AS (SELECT vec_id FROM p1)"
    ]
    for i in range(2, k + 1):
        parts.append(
            f", c{i} AS (SELECT p.vec_id, p.rel, "
            f"{lam} * p.rel - {round(1.0 - lam, 10)} * max(s.sab) AS mmr "
            f"FROM pool p JOIN s ON s.ia = p.vec_id "
            f"JOIN sel{i-1} ON s.ib = sel{i-1}.vec_id "
            f"WHERE p.vec_id NOT IN (SELECT vec_id FROM sel{i-1}) "
            f"GROUP BY p.vec_id, p.rel), "
            f"p{i} AS (SELECT vec_id, rel, mmr FROM c{i} "
            f"ORDER BY mmr DESC, vec_id LIMIT 1), "
            f"sel{i} AS (SELECT vec_id FROM sel{i-1} "
            f"UNION ALL SELECT vec_id FROM p{i})"
        )
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS rank, vec_id, rel, "
        + _fhu("mmr", 6) + f" AS mmr FROM p{i}"
        for i in range(1, k + 1)
    ]
    return "".join(parts) + " " + " UNION ALL ".join(selects)


def _minhash_sql_prefix() -> str:
    """Shared WITH-prefix of the poly-hash MinHash+LSH oracles: shingle
    sets, signatures, band keys, candidate pairs — identical
    coefficients and folds to the engine pipeline. Final SELECTs are
    composed per oracle (dedup survivors vs drop-reason report)."""
    from kamu_engine_datafusion_spark.functions.columns import (
        _MERSENNE_31 as M,
        _SHINGLE_PRIME as P,
        minhash_coeffs,
    )

    coeffs = minhash_coeffs(16, seed=42)
    mins = ", ".join(
        f"min((hv * {a} + {b}) % {M}) AS m{j}" for j, (a, b) in enumerate(coeffs)
    )
    bands = []
    for band in range(4):
        acc = "CAST(0 AS BIGINT)"
        for i in range(4):
            acc = f"(({acc}) * {P} + m{band * 4 + i}) % {M}"
        bands.append(
            f"SELECT doc_id, {band} AS bandpos, {acc} AS bandkey FROM sig"
        )
    bands_sql = " UNION ALL ".join(bands)
    return (
        "WITH d AS (SELECT doc_id, lang, text FROM documents WHERE doc_id < 300), "
        "tq AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t "
        "FROM d), "
        "shl AS (SELECT doc_id, list_distinct(list_transform("
        "generate_series(1, greatest(1, len(t) - 2)), "
        "i -> array_to_string(t[i:i+2], ' '))) AS shs FROM tq), "
        "sh AS (SELECT doc_id, unnest(shs) AS s FROM shl), "
        "h AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(s, ''), ch -> CAST(ascii(ch) AS BIGINT))), "
        f"(a, b) -> (a * 31 + b) % {M}) AS hv FROM sh), "
        f"sig AS (SELECT doc_id, {mins} FROM h GROUP BY doc_id), "
        f"bands AS ({bands_sql}), "
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM bands a "
        "JOIN bands b ON a.bandpos = b.bandpos AND a.bandkey = b.bandkey "
        "AND a.doc_id < b.doc_id)"
    )


def _minhash_survivors_oracle() -> str:
    """DuckDB oracle for ``xdedup_minhash_survivors`` (r18): the full
    corpus (no id filter) at the bench key's parameters — 32 hashes /
    8 bands of 4 rows / bucket cap 200 — including the cap itself
    (whole buckets with > cap members drop, exactly
    ``dedup._cap_buckets``), candidate pairs, true string-shingle
    Jaccard ≥ 0.7 verification, and the lower-id-wins survivor set."""
    from kamu_engine_datafusion_spark.functions.columns import (
        _MERSENNE_31 as M,
        _SHINGLE_PRIME as P,
        minhash_coeffs,
    )

    nh, nb, rpb, cap = 32, 8, 4, 200
    coeffs = minhash_coeffs(nh, seed=42)
    mins = ", ".join(
        f"min((hv * {a} + {b}) % {M}) AS m{j}" for j, (a, b) in enumerate(coeffs)
    )
    bands = []
    for band in range(nb):
        acc = "CAST(0 AS BIGINT)"
        for i in range(rpb):
            acc = f"(({acc}) * {P} + m{band * rpb + i}) % {M}"
        bands.append(
            f"SELECT doc_id, {band} AS bandpos, {acc} AS bandkey FROM sig"
        )
    bands_sql = " UNION ALL ".join(bands)
    return (
        "WITH d AS (SELECT doc_id, lang, text FROM documents), "
        "tq AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t "
        "FROM d), "
        "shl AS (SELECT doc_id, list_distinct(list_transform("
        "generate_series(1, greatest(1, len(t) - 2)), "
        "i -> array_to_string(t[i:i+2], ' '))) AS shs FROM tq), "
        "sh AS (SELECT doc_id, unnest(shs) AS s FROM shl), "
        "h AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(s, ''), ch -> CAST(ascii(ch) AS BIGINT))), "
        f"(a, b) -> (a * 31 + b) % {M}) AS hv FROM sh), "
        f"sig AS (SELECT doc_id, {mins} FROM h GROUP BY doc_id), "
        f"bands0 AS ({bands_sql}), "
        "big AS (SELECT bandpos, bandkey FROM bands0 "
        f"GROUP BY bandpos, bandkey HAVING count(*) > {cap}), "
        "bands AS (SELECT b.doc_id, b.bandpos, b.bandkey FROM bands0 b "
        "WHERE NOT EXISTS (SELECT 1 FROM big g "
        "WHERE g.bandpos = b.bandpos AND g.bandkey = b.bandkey)), "
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
        "FROM bands a JOIN bands b ON a.bandpos = b.bandpos "
        "AND a.bandkey = b.bandkey AND a.doc_id < b.doc_id), "
        "ver AS (SELECT c.id_b FROM cand c "
        "JOIN shl x ON x.doc_id = c.id_a JOIN shl y ON y.doc_id = c.id_b "
        "WHERE CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE) / "
        "(len(x.shs) + len(y.shs) - len(list_intersect(x.shs, y.shs))) >= 0.7) "
        "SELECT doc_id, lang FROM d "
        "WHERE doc_id NOT IN (SELECT id_b FROM ver)"
    )


def _minhash_sql_oracle() -> str:
    """DuckDB oracle replicating the full poly-hash MinHash+LSH dedup:
    same coefficients, same folds, same banding, same verification."""
    return (
        _minhash_sql_prefix() + ", "
        "ver AS (SELECT c.id_b FROM cand c "
        "JOIN shl x ON x.doc_id = c.id_a JOIN shl y ON y.doc_id = c.id_b "
        "WHERE CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE) / "
        "(len(x.shs) + len(y.shs) - len(list_intersect(x.shs, y.shs))) >= 0.7) "
        "SELECT lang, count(*) AS n_docs FROM d "
        "WHERE doc_id NOT IN (SELECT id_b FROM ver) GROUP BY lang"
    )


def _minhash_report_oracle() -> str:
    """Drop-reason report over the same pipeline: per dropped doc, the
    lowest-id matching partner and its half-up-6dp Jaccard."""
    return (
        _minhash_sql_prefix() + ", "
        "verp AS (SELECT c.id_a, c.id_b, "
        "CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE) / "
        "(len(x.shs) + len(y.shs) - len(list_intersect(x.shs, y.shs))) AS j "
        "FROM cand c "
        "JOIN shl x ON x.doc_id = c.id_a JOIN shl y ON y.doc_id = c.id_b), "
        "hit AS (SELECT id_a, id_b, j, row_number() OVER ("
        "PARTITION BY id_b ORDER BY id_a) AS rn FROM verp WHERE j >= 0.7) "
        "SELECT id_b AS dropped_id, id_a AS matched_id, "
        + _fhu("j", 6) + " AS jaccard "
        "FROM hit WHERE rn = 1"
    )


def _fuzzy_decon_oracle(threshold: float = 0.5) -> str:
    """DuckDB oracle replicating fuzzy_flag_contaminated (poly hash):
    same shingles, coefficients, band folds, broadcast-probe join, and
    component-agreement estimate, max'd per corpus doc."""
    from kamu_engine_datafusion_spark.functions.columns import (
        _MERSENNE_31 as M,
        _SHINGLE_PRIME as P,
        minhash_coeffs,
    )

    coeffs = minhash_coeffs(16, seed=42)
    mins = ", ".join(
        f"min((hv * {a} + {b}) % {M}) AS m{j}" for j, (a, b) in enumerate(coeffs)
    )
    bands = []
    for band in range(4):
        acc = "CAST(0 AS BIGINT)"
        for i in range(4):
            acc = f"(({acc}) * {P} + m{band * 4 + i}) % {M}"
        bands.append(
            f"SELECT doc_id, {band} AS bandpos, {acc} AS bandkey FROM sig"
        )
    bands_sql = " UNION ALL ".join(bands)
    agree = " + ".join(
        f"(CASE WHEN c.m{j} = b.m{j} THEN 1 ELSE 0 END)" for j in range(16)
    )
    return (
        "WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 400), "
        "tq AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') "
        "AS t FROM d), "
        "shl AS (SELECT doc_id, list_distinct(list_transform("
        "generate_series(1, greatest(1, len(t) - 2)), "
        "i -> array_to_string(t[i:i+2], ' '))) AS shs FROM tq), "
        "sh AS (SELECT doc_id, unnest(shs) AS s FROM shl), "
        "h AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(s, ''), ch -> CAST(ascii(ch) AS BIGINT))), "
        f"(a, b) -> (a * 31 + b) % {M}) AS hv FROM sh), "
        f"sig AS (SELECT doc_id, {mins} FROM h GROUP BY doc_id), "
        f"bands AS ({bands_sql}), "
        "hits AS (SELECT bc.doc_id, "
        f"round(({agree}) / 16.0, 6) AS est "
        "FROM bands bc JOIN bands bb ON bc.bandpos = bb.bandpos "
        "AND bc.bandkey = bb.bandkey "
        "JOIN sig c ON c.doc_id = bc.doc_id "
        "JOIN sig b ON b.doc_id = bb.doc_id "
        "WHERE bc.doc_id >= 100 AND bb.doc_id < 100), "
        "mx AS (SELECT doc_id, max(est) AS max_est FROM hits GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(mx.max_est, 0.0) AS max_est, "
        f"coalesce(mx.max_est, 0.0) >= {threshold} AS contaminated "
        "FROM d LEFT JOIN mx USING (doc_id) WHERE d.doc_id >= 100"
    )


def _simhash_sql_oracle() -> str:
    """DuckDB oracle replicating the poly-hash SimHash pipeline."""
    from kamu_engine_datafusion_spark.functions.columns import _MERSENNE_31 as M

    bit_sums = ", ".join(
        f"sum((hv >> {b}) & 1) AS b{b}" for b in range(31)
    )
    fp_terms = " + ".join(
        f"(CASE WHEN b{b} * 2 > n THEN CAST(1 AS BIGINT) ELSE 0 END << {b})"
        for b in range(31)
    )
    return (
        "WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300), "
        "tok AS (SELECT doc_id, "
        "unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t FROM d), "
        "h AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(t, ''), ch -> CAST(ascii(ch) AS BIGINT))), "
        f"(a, b) -> (a * 31 + b) % {M}) AS hv FROM tok), "
        f"bs AS (SELECT doc_id, count(*) AS n, {bit_sums} FROM h GROUP BY doc_id), "
        f"fp AS (SELECT doc_id, {fp_terms} AS f FROM bs), "
        "blocked AS (SELECT doc_id, f, f >> 27 AS blk FROM fp) "
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "CAST(bit_count(xor(a.f, b.f)) AS INTEGER) AS hamming "
        "FROM blocked a JOIN blocked b "
        "ON a.blk = b.blk AND a.doc_id < b.doc_id "
        "WHERE bit_count(xor(a.f, b.f)) <= 10"
    )


def _span_oracle(k: int = 8, removal: bool = False) -> str:
    """DuckDB oracle replicating duplicate_spans / remove_duplicate_spans:
    rolling k-gram first-occurrence rank (grams compared as strings —
    Spark compares xxhash64 of the token-hash fold; identical grouping
    up to negligible collisions), then the same gap>k interval merge."""
    cte = (
        "WITH d AS (SELECT doc_id, "
        "string_split_regex(trim(lower(text)), '\\s+') AS toks "
        "FROM documents WHERE doc_id < 300), "
        "g AS (SELECT doc_id, i AS pos, "
        f"array_to_string(toks[i:i+{k - 1}], ' ') AS gram "
        "FROM d, LATERAL (SELECT unnest(generate_series(1, "
        f"len(toks) - {k - 1})) AS i) WHERE len(toks) >= {k}), "
        "r AS (SELECT doc_id, pos, row_number() OVER "
        "(PARTITION BY gram ORDER BY doc_id, pos) AS rn FROM g), "
        "b AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER "
        f"(PARTITION BY doc_id ORDER BY pos) <= {k} THEN 0 ELSE 1 END AS brk "
        "FROM (SELECT doc_id, pos FROM r WHERE rn > 1)), "
        "isl AS (SELECT doc_id, pos, sum(brk) OVER "
        "(PARTITION BY doc_id ORDER BY pos) AS isl FROM b), "
        "spans AS (SELECT doc_id, min(pos) AS span_start, "
        f"max(pos) + {k - 1} AS span_end FROM isl GROUP BY doc_id, isl) "
    )
    if not removal:
        return cte + (
            "SELECT doc_id, span_start, span_end, "
            "span_end - span_start + 1 AS span_tokens FROM spans"
        )
    return cte + (
        ", tk AS (SELECT doc_id, unnest(toks) AS t, "
        "generate_subscripts(toks, 1) AS i FROM d), "
        "kept AS (SELECT tk.doc_id, tk.t, tk.i FROM tk WHERE NOT EXISTS "
        "(SELECT 1 FROM spans s WHERE s.doc_id = tk.doc_id "
        "AND tk.i BETWEEN s.span_start AND s.span_end)), "
        "re AS (SELECT doc_id, string_agg(t, ' ' ORDER BY i) AS text "
        "FROM kept GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(re.text, '') AS text "
        "FROM d LEFT JOIN re USING (doc_id)"
    )


_SQ_CTE = (
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
    "FROM embeddings), "
    "x AS (SELECT vec_id, unnest(v) AS val, "
    "generate_subscripts(v, 1) AS i FROM e), "
    "mm AS (SELECT i, min(val) AS mn, max(val) AS mx FROM x GROUP BY i) "
)


def _quantize_oracle() -> str:
    """DuckDB oracle for quantize_embeddings: same per-dim min/max
    codebook, same floor((x-mn)*(255/(mx-mn))+0.5) code formula (the
    scale is computed as 255.0/(mx-mn) FIRST, matching the Spark-side
    literal, so the double rounding path is identical)."""
    return _SQ_CTE + (
        ", c AS (SELECT vec_id, i, CAST(CASE WHEN mx = mn THEN 0 "
        "ELSE floor((val - mn) * (255.0 / (mx - mn)) + 0.5) END AS BIGINT) "
        "AS code FROM x JOIN mm USING (i) WHERE vec_id < 100) "
        "SELECT vec_id, string_agg(code, ',' ORDER BY i) AS codes_csv "
        "FROM c GROUP BY vec_id"
    )


def _quantized_topk_oracle(k: int = 10, rerank: int = 4) -> str:
    """DuckDB oracle for topk_quantized: dequantize with the same
    mn + code*((mx-mn)/255) reconstruction, rank by 6dp-rounded
    asymmetric cosine with vec_id tie-break, exact re-rank the top
    k*rerank."""
    return _SQ_CTE + (
        ", d AS (SELECT vec_id, list(CASE WHEN mx = mn THEN mn "
        "ELSE mn + floor((val - mn) * (255.0 / (mx - mn)) + 0.5) "
        "* ((mx - mn) / 255.0) END ORDER BY i) AS xh "
        "FROM x JOIN mm USING (i) GROUP BY vec_id), "
        "q AS (SELECT v AS qv FROM e WHERE vec_id = 0), "
        "approx AS (SELECT d.vec_id, round(list_dot_product(d.xh, q.qv) / "
        "(sqrt(list_dot_product(d.xh, d.xh)) * "
        "sqrt(list_dot_product(q.qv, q.qv))), 6) AS a FROM d, q), "
        f"cand AS (SELECT vec_id FROM approx ORDER BY a DESC, vec_id "
        f"LIMIT {k * rerank}) "
        "SELECT vec_id, cosine FROM ("
        "SELECT e.vec_id, round(list_dot_product(e.v, q.qv) / "
        "(sqrt(list_dot_product(e.v, e.v)) * "
        "sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine "
        "FROM e JOIN cand USING (vec_id), q) "
        f"ORDER BY cosine DESC, vec_id LIMIT {k}"
    )


def _semantic_oracle(
    threshold: float = 0.4, num_seeds: int = 16, id_max: int = 2000
) -> str:
    """DuckDB oracle replicating semantic_dedup exactly: same lowest-id
    seeds, same nearest-seed assignment (cosine desc, seed id asc — both
    engines sum dot products left-to-right in double), same
    within-cluster pairwise cosine prune, same lower-id-wins drop."""
    cos_es = (
        "list_dot_product(e.emb_d, s.semb) / "
        "(sqrt(list_dot_product(e.emb_d, e.emb_d)) * "
        "sqrt(list_dot_product(s.semb, s.semb)))"
    )
    cos_ab = (
        "list_dot_product(ea.emb_d, eb.emb_d) / "
        "(sqrt(list_dot_product(ea.emb_d, ea.emb_d)) * "
        "sqrt(list_dot_product(eb.emb_d, eb.emb_d)))"
    )
    return (
        "WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb_d "
        f"FROM embeddings WHERE vec_id < {id_max}), "
        "s AS (SELECT vec_id AS sid, emb_d AS semb FROM e "
        f"ORDER BY vec_id LIMIT {num_seeds}), "
        "assign AS (SELECT vec_id, sid FROM ("
        "SELECT e.vec_id, s.sid, row_number() OVER (PARTITION BY e.vec_id "
        f"ORDER BY {cos_es} DESC, s.sid) AS rn "
        "FROM e CROSS JOIN s) WHERE rn = 1), "
        "dups AS (SELECT DISTINCT y.vec_id AS dup "
        "FROM assign x JOIN assign y ON x.sid = y.sid AND x.vec_id < y.vec_id "
        "JOIN e ea ON ea.vec_id = x.vec_id JOIN e eb ON eb.vec_id = y.vec_id "
        f"WHERE {cos_ab} >= {threshold}) "
        "SELECT label, count(*) AS n_vecs FROM e "
        "WHERE vec_id NOT IN (SELECT dup FROM dups) GROUP BY label"
    )


def _bpe_oracle(num_merges: int = 8) -> str:
    """Unrolled BPE-round oracle: word-count state with sentinel-
    prefixed symbols, one (pair-count → argmax → replace) CTE triple
    per round — plain string replace, no regex, so both engines apply
    the identical left-to-right merge. All round CTEs MATERIALIZED
    (multi-referenced; DuckDB would re-inline the whole prior chain)."""
    parts = [
        "WITH tok AS (SELECT unnest(string_split_regex(trim(lower(text)), "
        "'\\s+')) AS w FROM documents), "
        "wc AS (SELECT w, count(*) AS n FROM tok WHERE w != '' GROUP BY w), "
        "w1 AS MATERIALIZED (SELECT array_to_string("
        "list_transform(string_split(w, ''), c -> chr(31) || c), ' ') "
        "AS sym, n FROM wc)"
    ]
    for r in range(1, num_merges + 1):
        parts.append(
            f", p{r} AS MATERIALIZED (SELECT z[1] AS l, z[2] AS r2, "
            f"sum(n) AS cnt FROM (SELECT n, "
            f"unnest(list_zip(s[:len(s)-1], s[2:])) AS z FROM "
            f"(SELECT string_split(sym, ' ') AS s, n FROM w{r}) "
            f"WHERE len(s) >= 2) GROUP BY 1, 2), "
            f"m{r} AS MATERIALIZED (SELECT l, r2, cnt FROM p{r} "
            f"ORDER BY cnt DESC, l, r2 LIMIT 1), "
            f"w{r+1} AS MATERIALIZED (SELECT replace(sym, "
            f"m.l || ' ' || m.r2, m.l || substr(m.r2, 2)) AS sym, n "
            f"FROM w{r} CROSS JOIN m{r} m)"
        )
    selects = [
        f"SELECT CAST({r} AS BIGINT) AS rank, substr(l, 2) AS merge_left, "
        f"substr(r2, 2) AS merge_right, CAST(cnt AS BIGINT) AS n FROM m{r}"
        for r in range(1, num_merges + 1)
    ]
    return "".join(parts) + " " + " UNION ALL ".join(selects)


def _bpe_encode_oracle(num_merges: int = 8, top_k: int = 30) -> str:
    """Train-then-encode oracle: reuse the unrolled training rounds,
    then the final state w{k+1} IS the encoded corpus (the training
    rewrite applies each merge corpus-wide in rank order — identical to
    encoding from scratch with the learned list)."""
    train = _bpe_oracle(num_merges)
    with_part = train[: train.rindex(" SELECT CAST(1 AS BIGINT)")]
    return with_part + (
        f" SELECT subword, n FROM ("
        f"SELECT substr(s, 2) AS subword, CAST(sum(cnt) AS BIGINT) AS n "
        f"FROM (SELECT unnest(string_split(sym, ' ')) AS s, n AS cnt "
        f"FROM w{num_merges + 1}) GROUP BY 1) "
        f"ORDER BY n DESC, subword LIMIT {top_k}"
    )


def _pipeline_embed_oracle(
    threshold: float = 0.4,
    dim: int = 64,
    num_bands: int = 8,
    bits_per_band: int = 4,
    id_max: int = 2000,
    pool: int = 20,
    rerank: int = 4,
    k: int = 5,
    lam: float = 0.7,
) -> str:
    """Four-stage embedding-pipeline oracle: SRP near-dup survivors →
    survivor-corpus quantization codebook → asymmetric quantized search
    with exact re-rank → unrolled greedy MMR. Every constant mirrors
    the Spark pipeline (LCG planes, floor codes, 6dp rounding, id
    tie-breaks)."""
    from kamu_engine_datafusion_spark.operators.dedup import (
        _SRP_LCG_A,
        _SRP_LCG_B,
        _SRP_LCG_M,
    )

    def plane(p: int) -> str:
        return (
            f"list_transform(range(0, {dim}), i -> "
            f"CAST((({_SRP_LCG_A}*({p}*{dim}+i)+{_SRP_LCG_B})%{_SRP_LCG_M})"
            f"-{_SRP_LCG_M // 2} AS DOUBLE))"
        )

    band_keys = []
    for j in range(num_bands):
        bits = [
            f"(CASE WHEN list_dot_product(emb_d, {plane(j * bits_per_band + r)})"
            f" >= 0 THEN {1 << r} ELSE 0 END)"
            for r in range(bits_per_band)
        ]
        band_keys.append(f"({j * (1 << bits_per_band)} + {' + '.join(bits)})")
    # Two rounding regimes, mirroring the operators they replicate:
    # - cos_round (engine round) for the topk_quantized approx scores
    #   and the exact-re-rank POOL MEMBERSHIP cut (topk_bruteforce still
    #   rounds with the builtin);
    # - cos (half-up floor(x·1e6+0.5)/1e6) for the rel VALUES, pairwise
    #   sims, and greedy mmr — mmr_diversify switched to half-up because
    #   the engines' round() builtins disagree on exact halves.
    cos = _fhu(
        "list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * "
        "sqrt(list_dot_product({b}, {b})))",
        6,
    )
    cos_round = (
        "round(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * "
        "sqrt(list_dot_product({b}, {b}))), 6)"
    )
    parts = [
        # stage 1: SRP-LSH near-dup pairs over the id-bounded corpus
        # MATERIALIZED: DuckDB inlines CTEs per reference by default, and
        # the banded/surv subtrees (32 list_transform plane dots per row)
        # re-evaluated per downstream reference turn minutes-quadratic
        "WITH e AS MATERIALIZED (SELECT vec_id, "
        "CAST(embedding AS DOUBLE[]) AS emb_d "
        f"FROM embeddings WHERE vec_id < {id_max}), "
        f"banded AS MATERIALIZED (SELECT vec_id, "
        f"unnest([{', '.join(band_keys)}]) AS bk "
        "FROM e), "
        "cand AS MATERIALIZED (SELECT DISTINCT x.vec_id AS id_a, "
        "y.vec_id AS id_b "
        "FROM banded x JOIN banded y ON x.bk = y.bk AND x.vec_id < y.vec_id), "
        "dups AS MATERIALIZED (SELECT DISTINCT id_b FROM cand "
        "JOIN e a ON cand.id_a = a.vec_id JOIN e b ON cand.id_b = b.vec_id "
        "WHERE list_dot_product(a.emb_d, b.emb_d) / "
        "(sqrt(list_dot_product(a.emb_d, a.emb_d)) * "
        f"sqrt(list_dot_product(b.emb_d, b.emb_d))) >= {threshold}), "
        "surv AS MATERIALIZED (SELECT vec_id, emb_d FROM e "
        "WHERE vec_id NOT IN (SELECT id_b FROM dups)), "
        # stage 2: per-dim codebook + dequantized survivor vectors
        "x AS (SELECT vec_id, unnest(emb_d) AS val, "
        "generate_subscripts(emb_d, 1) AS i FROM surv), "
        "mm AS MATERIALIZED (SELECT i, min(val) AS mn, max(val) AS mx "
        "FROM x GROUP BY i), "
        "d AS (SELECT vec_id, list(CASE WHEN mx = mn THEN mn "
        "ELSE mn + floor((val - mn) * (255.0 / (mx - mn)) + 0.5) "
        "* ((mx - mn) / 255.0) END ORDER BY i) AS xh "
        "FROM x JOIN mm USING (i) GROUP BY vec_id), "
        # stage 3: asymmetric search + exact re-rank to the pool
        "q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings "
        "WHERE vec_id = 0), "
        "approx AS (SELECT d.vec_id, "
        + cos_round.format(a="d.xh", b="q.qv")
        + " AS a FROM d CROSS JOIN q), "
        f"cand2 AS (SELECT vec_id FROM approx ORDER BY a DESC, vec_id "
        f"LIMIT {pool * rerank}), "
        "pool AS MATERIALIZED (SELECT s.vec_id, s.emb_d AS v, "
        + cos.format(a="s.emb_d", b="q.qv")
        + " AS rel, "
        + cos_round.format(a="s.emb_d", b="q.qv")
        + " AS relr FROM surv s JOIN cand2 USING (vec_id) CROSS JOIN q "
        f"ORDER BY relr DESC, vec_id LIMIT {pool}), "
        # stage 4: greedy MMR over the pool (pool is MATERIALIZED too —
        # it feeds sm twice and every greedy step)
        "sm AS MATERIALIZED (SELECT a.vec_id AS ia, b.vec_id AS ib, "
        + cos.format(a="a.v", b="b.v")
        + " AS sab FROM pool a CROSS JOIN pool b), "
        "p1 AS (SELECT vec_id, rel, rel AS mmr FROM pool "
        "ORDER BY rel DESC, vec_id LIMIT 1), "
        "sel1 AS (SELECT vec_id FROM p1)",
    ]
    for i in range(2, k + 1):
        parts.append(
            f", c{i} AS (SELECT p.vec_id, p.rel, "
            f"{lam} * p.rel - {round(1.0 - lam, 10)} * max(sm.sab) AS mmr "
            f"FROM pool p JOIN sm ON sm.ia = p.vec_id "
            f"JOIN sel{i-1} ON sm.ib = sel{i-1}.vec_id "
            f"WHERE p.vec_id NOT IN (SELECT vec_id FROM sel{i-1}) "
            f"GROUP BY p.vec_id, p.rel), "
            f"p{i} AS (SELECT vec_id, rel, mmr FROM c{i} "
            f"ORDER BY mmr DESC, vec_id LIMIT 1), "
            f"sel{i} AS (SELECT vec_id FROM sel{i-1} "
            f"UNION ALL SELECT vec_id FROM p{i})"
        )
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS rank, vec_id, rel, "
        f"round(mmr, 6) AS mmr FROM p{i}"
        for i in range(1, k + 1)
    ]
    return "".join(parts) + " " + " UNION ALL ".join(selects)


def _kmeans_ctes(
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    scale: int = 10_000,
    sfx: str = "",
    vec_expr: str = "embedding",
    with_kw: bool = True,
) -> str:
    """Shared CTE prefix replaying the engine's fixed-point Lloyd's
    trajectory exactly — same half-up quantization, BIGINT
    distance/argmin encoding (``dist*k + cid``), ``floor(sum/count)``
    centroid updates (IEEE double division both engines), empty
    clusters keeping the previous centroid via LEFT JOIN + COALESCE.
    ``list_sum``/``sum`` results are cast from HUGEINT back to BIGINT
    (the known DuckDB widening divergence). Ends with CTE
    ``a{iters+1}{sfx}(vec_id, enc)``: cluster = ``enc % k``, quantized
    squared distance = ``(enc - enc % k) / k``.

    ``sfx``/``vec_expr``/``with_kw`` exist for the PQ oracle: one
    suffixed trajectory per subspace slice (``embedding[1:16]`` etc.)
    composed into a single WITH clause."""
    parts = [
        ("WITH " if with_kw else ", ")
        + f"q{sfx} AS (SELECT vec_id, list_transform({vec_expr}, "
        f"x -> CAST(FLOOR(CAST(x AS DOUBLE)*{float(scale)} + 0.5) AS BIGINT)) "
        "AS qv FROM embeddings), "
        f"c0{sfx} AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 "
        f"AS BIGINT) AS cid, qv FROM (SELECT vec_id, qv FROM q{sfx} "
        f"ORDER BY vec_id LIMIT {k}))"
    ]
    dist = (
        f"CAST(list_sum(list_transform(range(0, {dim}), "
        "j -> (q.qv[j+1]-c.qv[j+1])*(q.qv[j+1]-c.qv[j+1]))) AS BIGINT)"
    )
    # engine loop = `iters` (assign -> update-centroids) cycles, then one
    # final assignment with the post-loop centroids: a1..a{iters} feed
    # updates c1..c{iters}; a{iters+1} is the emitted assignment.
    for i in range(1, iters + 1):
        parts.append(
            f", a{i}{sfx} AS (SELECT q.vec_id, q.qv, "
            f"CAST(min({dist}*{k} + c.cid) AS BIGINT) AS enc "
            f"FROM q{sfx} q, c{i - 1}{sfx} c GROUP BY q.vec_id, q.qv)"
            f", n{i}{sfx} AS (SELECT cid, list(s ORDER BY j) AS qv FROM ("
            f"SELECT a.enc % {k} AS cid, t.j, "
            "CAST(FLOOR(CAST(CAST(sum(a.qv[t.j+1]) AS BIGINT) AS DOUBLE) "
            "/ count(*)) AS BIGINT) AS s "
            f"FROM a{i}{sfx} a, range(0, {dim}) t(j) GROUP BY 1, 2) "
            "GROUP BY cid)"
            f", c{i}{sfx} AS (SELECT p.cid, COALESCE(n.qv, p.qv) AS qv "
            f"FROM c{i - 1}{sfx} p LEFT JOIN n{i}{sfx} n ON n.cid = p.cid)"
        )
    fin = iters + 1
    parts.append(
        f", a{fin}{sfx} AS (SELECT q.vec_id, "
        f"CAST(min({dist}*{k} + c.cid) AS BIGINT) AS enc "
        f"FROM q{sfx} q, c{iters}{sfx} c GROUP BY q.vec_id)"
    )
    return "".join(parts)


def _kmeans_oracle(
    k: int = 8, iters: int = 3, dim: int = 64, scale: int = 10_000
) -> str:
    """Oracle for ``xcluster_kmeans``: the shared trajectory CTEs plus
    the per-vector (cluster, quantized-squared-distance) projection."""
    return _kmeans_ctes(k, iters, dim, scale) + (
        f" SELECT vec_id, CAST(enc % {k} AS BIGINT) AS cluster, "
        f"CAST((enc - enc % {k}) / {k} AS BIGINT) AS dist2q "
        f"FROM a{iters + 1}"
    )


def _semdedup_oracle(
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    scale: int = 10_000,
    sim_scale: int = 1_000,
    tau2_num: int = 9_025,
    tau2_den: int = 10_000,
) -> str:
    """Oracle for ``xcluster_semdedup``: the k-means trajectory CTEs,
    then the engine's within-cluster quantized-cosine pair test and the
    greedy keep-first-by-id rule, all in BIGINT."""
    fin = iters + 1
    dot = (
        f"CAST(list_sum(list_transform(range(0, {dim}), "
        "j -> l.qv2[j+1]*r.qv2[j+1])) AS BIGINT)"
    )
    return _kmeans_ctes(k, iters, dim, scale) + (
        ", q2 AS (SELECT vec_id, list_transform(embedding, "
        f"x -> CAST(FLOOR(CAST(x AS DOUBLE)*{float(sim_scale)} + 0.5) "
        "AS BIGINT)) AS qv2 FROM embeddings)"
        f", av AS (SELECT q2.vec_id, CAST(a.enc % {k} AS BIGINT) AS cluster, "
        "q2.qv2, CAST(list_sum(list_transform(q2.qv2, x -> x*x)) AS BIGINT) "
        f"AS n2 FROM q2 JOIN a{fin} a ON a.vec_id = q2.vec_id)"
        ", d AS (SELECT rid, CAST(count(*) AS BIGINT) AS n_dups FROM ("
        f"SELECT r.vec_id AS rid, {dot} AS dot, l.n2 AS ln, r.n2 AS rn "
        "FROM av l JOIN av r ON l.cluster = r.cluster "
        "AND l.vec_id < r.vec_id) "
        f"WHERE dot > 0 AND dot*dot*{tau2_den} >= {tau2_num}*ln*rn "
        "GROUP BY rid) "
        "SELECT av.vec_id, av.cluster, "
        "COALESCE(d.n_dups, CAST(0 AS BIGINT)) AS n_dups, "
        "CAST(CASE WHEN d.rid IS NULL THEN 1 ELSE 0 END AS BIGINT) "
        "AS is_kept FROM av LEFT JOIN d ON d.rid = av.vec_id"
    )


def _cluster_quality_oracle(k: int = 8, iters: int = 3) -> str:
    """Oracle for ``xcluster_quality``: the k-means trajectory CTEs,
    then the per-cluster majority-label/purity report with the same
    (count desc, label asc) tie-break and half-up 6dp purity."""
    fin = iters + 1
    return _kmeans_ctes(k, iters) + (
        f", pv AS (SELECT a.vec_id, CAST(a.enc % {k} AS BIGINT) AS cluster, "
        f"CAST((a.enc - a.enc % {k}) / {k} AS BIGINT) AS dist2q, "
        "CAST(e.label AS BIGINT) AS lab "
        f"FROM a{fin} a JOIN embeddings e ON e.vec_id = a.vec_id)"
        ", per AS (SELECT cluster, lab, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(dist2q) AS BIGINT) AS inertia FROM pv GROUP BY 1, 2)"
        ", maj AS (SELECT cluster, lab AS majority_label, n AS n_majority "
        "FROM (SELECT *, row_number() OVER (PARTITION BY cluster "
        "ORDER BY n DESC, lab ASC) AS rn FROM per) WHERE rn = 1)"
        ", tot AS (SELECT cluster, CAST(sum(n) AS BIGINT) AS n, "
        "CAST(sum(inertia) AS BIGINT) AS inertia_q FROM per GROUP BY 1) "
        "SELECT t.cluster, t.n, t.inertia_q, m.majority_label, "
        "m.n_majority, "
        + _fhu("CAST(m.n_majority AS DOUBLE) / t.n", 6) + " AS purity "
        "FROM tot t JOIN maj m ON m.cluster = t.cluster"
    )


def _poly31_sql(col: str) -> str:
    """DuckDB twin of ``functions/columns.poly_hash31``: the 31-bit
    polynomial char fold of ``col``."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
        f"string_split({col}, ''), ch -> CAST(ascii(ch) AS BIGINT))), "
        "(a, b) -> (a * 31 + b) % 2147483647)"
    )


def _fhu(expr: str, dp: int) -> str:
    """Half-up display rounding to ``dp`` decimals — THE way to write
    it in new oracle SQL: ``floor(CAST(x AS DOUBLE)·10^dp + 0.5) /
    10^dp`` with the operand cast and the scale emitted as a DOUBLE
    literal, so DuckDB DECIMAL-literal arithmetic can never enter the
    rounding (the ``xupsample_repeat`` divergence class — recurred r8,
    r13, and again in two r14 drafts before ``test_oracle_hygiene``
    caught them). The companion ratchet test pins the count of inline
    ``floor(… + 0.5) / 10^d`` constructions in this file's certified
    legacy strings and fails on any NEW one: write ``_fhu`` instead."""
    m = float(10**dp)
    return f"floor(CAST({expr} AS DOUBLE) * {m} + 0.5) / {m}"


#: Bigram-shingle stream shared by both sketch oracles — the DuckDB
#: twin of ``_bigram_stream``.
_BG_CTES = (
    "WITH t AS (SELECT lang, string_split_regex(trim(lower(text)), "
    "'\\s+') AS toks FROM documents), "
    "bgs AS (SELECT lang, z[1] || ' ' || z[2] AS bg FROM (SELECT lang, "
    "unnest(list_zip(toks[:len(toks)-1], toks[2:])) AS z FROM t "
    "WHERE len(toks) >= 2))"
)


def _hll_oracle(b: int = 6) -> str:
    """Oracle for ``xsketch_hll``: replays the HLL registers exactly
    (same poly hash, same integer trailing-zero rho) and the dyadic
    register sum, then the estimate/error/flag report. ``2^-r`` terms
    are exact doubles, so the float math is order-independent and
    bit-identical to Spark's."""
    m = 1 << b
    cap = 31 - b + 1
    return _BG_CTES + (
        f", h AS (SELECT lang, bg, {_poly31_sql('bg')} AS h FROM bgs)"
        f", rb AS (SELECT lang, h % {m} AS bucket, h >> {b} AS w FROM h)"
        f", rho AS (SELECT lang, bucket, CASE WHEN w = 0 THEN {cap} "
        "ELSE CAST(bit_count(CAST((w & -w) - 1 AS BIGINT)) AS BIGINT) + 1 "
        "END AS rho FROM rb)"
        ", regs AS (SELECT lang, bucket, max(rho) AS r FROM rho "
        "GROUP BY 1, 2)"
        ", agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS nz, "
        "sum(1.0 / CAST(1 << r AS DOUBLE)) AS sp FROM regs GROUP BY 1)"
        f", est AS (SELECT lang, CAST({m} - nz AS BIGINT) AS zeros, "
        f"0.709 * {float(m * m)} / (sp + CAST({m} - nz AS DOUBLE)) AS raw "
        "FROM agg)"
        ", exact AS (SELECT lang, CAST(count(DISTINCT bg) AS BIGINT) "
        "AS exact_distinct FROM bgs GROUP BY 1) "
        "SELECT x.lang, x.exact_distinct, e.zeros, "
        + _fhu("CAST(e.raw AS DOUBLE)", 4) + " AS hll_est, "
        + _fhu(
            "CAST(abs(e.raw - x.exact_distinct) AS DOUBLE) "
            "/ x.exact_distinct",
            6,
        )
        + " AS rel_err, "
        "CASE WHEN abs(e.raw - x.exact_distinct) <= "
        f"(2 * 1.04 / {float(m) ** 0.5}) * x.exact_distinct "
        "THEN 1 ELSE 0 END AS within_sigma "
        "FROM exact x JOIN est e USING (lang)"
    )


def _cm_oracle(
    depth: int = 4, width: int = 256, seed: int = 7, top_k: int = 20
) -> str:
    """Oracle for ``xsketch_countmin``: rebuilds the counter grid cell
    by cell (same poly hash, same universal-family coefficients inlined
    as literals) and pins the min-over-rows estimates, the overestimate
    theorem flag, and the collision overshoot."""
    from kamu_engine_datafusion_spark.functions.columns import minhash_coeffs

    vals = ", ".join(
        f"({i}, {a}, {c})"
        for i, (a, c) in enumerate(minhash_coeffs(depth, seed))
    )
    return _BG_CTES + (
        ", ex AS (SELECT bg, CAST(count(*) AS BIGINT) AS freq FROM bgs "
        "GROUP BY 1)"
        ", top AS (SELECT bg, freq FROM (SELECT bg, freq, row_number() "
        "OVER (ORDER BY freq DESC, bg) AS rn FROM ex) "
        f"WHERE rn <= {top_k})"
        f", coeff(i, a, b) AS (VALUES {vals})"
        f", h AS (SELECT {_poly31_sql('bg')} AS h FROM bgs)"
        ", grid AS (SELECT c.i, ((h.h * c.a + c.b) % 2147483647) "
        f"% {width} AS bucket, CAST(count(*) AS BIGINT) AS c "
        "FROM h CROSS JOIN coeff c GROUP BY 1, 2)"
        f", qh AS (SELECT bg, freq, {_poly31_sql('bg')} AS h FROM top)"
        ", probes AS (SELECT q.bg, q.freq, c.i, "
        f"((q.h * c.a + c.b) % 2147483647) % {width} AS bucket "
        "FROM qh q CROSS JOIN coeff c)"
        ", est AS (SELECT p.bg, p.freq, CAST(min(coalesce(g.c, 0)) "
        "AS BIGINT) AS cm_est FROM probes p LEFT JOIN grid g "
        "USING (i, bucket) GROUP BY 1, 2) "
        "SELECT bg AS bigram, freq, cm_est, "
        "CASE WHEN cm_est >= freq THEN 1 ELSE 0 END AS is_overestimate, "
        + _fhu("CAST(cm_est - freq AS DOUBLE) / freq", 6) + " AS rel_err FROM est"
    )


def _qsketch_oracle(
    k: int = 256, qs=((1, 2), (9, 10), (99, 100)), eps: float = 0.125
) -> str:
    """Oracle for ``xsketch_quantile``: full replay of the hash-level
    quantile sketch — same salted poly hash of the row id, same
    trailing-zero level, same canonical threshold from per-level
    suffix counts, same retained set, same INTEGER rank selection
    (``//`` floor division ≡ Spark ``div`` on non-negative ints; no
    float rank math — engines disagree on double→int casts) — plus the
    exact quantiles and rank errors, with the ``ok`` flags pinned to
    LITERAL 1: the sketch must actually be accurate at this k, not
    merely reproducible."""
    hash_sql = _poly31_sql(
        "CAST(l_orderkey AS VARCHAR) || '-' || "
        "CAST(l_linenumber AS VARCHAR) || '#qsk'"
    )
    est_sel, ex_sel, acc_sel, out_sel = [], [], [], []
    for num, den in qs:
        tag = f"p{num}_{den}"
        est_sel.append(
            f"max(CASE WHEN rn = ({num} * (nr - 1)) // {den} + 1 "
            f"THEN val END) AS est_{tag}"
        )
        ex_sel.append(
            f"max(CASE WHEN rn = ({num} * (n - 1)) // {den} + 1 "
            f"THEN val END) AS ex_{tag}"
        )
        acc_sel.append(
            f"CAST(sum(CASE WHEN l.val < e.est_{tag} THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS lt_{tag}, "
            f"CAST(sum(CASE WHEN l.val <= e.est_{tag} THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS le_{tag}"
        )
        q = f"(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE))"
        flt = f"(CAST(a.lt_{tag} AS DOUBLE) / x.n)"
        fle = f"(CAST(a.le_{tag} AS DOUBLE) / x.n)"
        err = f"greatest(CAST(0 AS DOUBLE), {q} - {fle}, {flt} - {q})"
        out_sel.append(
            f"e.est_{tag}, x.ex_{tag} AS exact_{tag}, "
            + _fhu(err, 6) + f" AS err_{tag}, "
            f"1 AS ok_{tag}"
        )
    return (
        "WITH li AS (SELECT l_returnflag AS grp, "
        "CAST(l_quantity AS BIGINT) AS val, "
        "CAST(l_orderkey AS VARCHAR) || '-' || "
        "CAST(l_linenumber AS VARCHAR) AS rid, "
        f"{hash_sql} AS h FROM lineitem)"
        ", lv AS (SELECT grp, val, rid, CASE WHEN h = 0 THEN 31 "
        "ELSE CAST(bit_count(CAST((h & -h) - 1 AS BIGINT)) AS BIGINT) "
        "END AS lvl FROM li)"
        ", cnt AS (SELECT grp, lvl, count(*) AS c FROM lv GROUP BY 1, 2)"
        ", suf AS (SELECT grp, lvl, sum(c) OVER (PARTITION BY grp "
        "ORDER BY lvl DESC ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "CURRENT ROW) AS s FROM cnt)"
        f", thr AS (SELECT grp, CAST(coalesce(max(lvl) "
        f"FILTER (WHERE s > {k}) + 1, 0) AS BIGINT) AS thr "
        "FROM suf GROUP BY 1)"
        ", ret AS (SELECT l.grp, l.val, l.rid, t.thr FROM lv l "
        "JOIN thr t ON l.grp = t.grp WHERE l.lvl >= t.thr)"
        ", rk AS (SELECT grp, thr, val, row_number() OVER (PARTITION BY "
        "grp ORDER BY val, rid) AS rn, count(*) OVER (PARTITION BY grp) "
        "AS nr FROM ret)"
        ", est AS (SELECT grp, max(thr) AS thr, CAST(max(nr) AS BIGINT) "
        f"AS n_retained, {', '.join(est_sel)} FROM rk GROUP BY 1)"
        ", xrk AS (SELECT grp, val, row_number() OVER (PARTITION BY grp "
        "ORDER BY val, rid) AS rn, count(*) OVER (PARTITION BY grp) "
        "AS n FROM li)"
        ", ex AS (SELECT grp, CAST(max(n) AS BIGINT) AS n, "
        f"{', '.join(ex_sel)} FROM xrk GROUP BY 1)"
        ", acc AS (SELECT l.grp, "
        f"{', '.join(acc_sel)} FROM li l JOIN est e ON l.grp = e.grp "
        "GROUP BY 1) "
        "SELECT x.grp, x.n, e.thr, e.n_retained, "
        f"{', '.join(out_sel)} "
        "FROM ex x JOIN est e ON x.grp = e.grp "
        "JOIN acc a ON x.grp = a.grp"
    )


def _quality_clf_oracle(
    buckets: int = 128,
    iters: int = 12,
    lr_num: int = 16,
    scale_bits: int = 20,
    clamp: int = 16,
) -> str:
    """Oracle for ``xquality_classifier``: replays the ENTIRE
    fixed-point GD trajectory in SQL — per iteration the presence-
    feature margins (feature frame join weights), the clamped Elliott
    residuals via the same ``(2a + b) // (2b)`` half-up identity, the
    per-feature gradient sums, and the floor-division weight update
    with the 1/t schedule (DuckDB ``//`` floors like python ``//`` —
    gradients go negative, so floor-vs-truncate matters) — then pins
    ``acc_ok`` to literal 1: the classifier must actually LEARN, not
    merely reproduce."""
    s = 1 << scale_bits
    cl = clamp * s
    d = buckets  # bias feature index
    parts = [
        "WITH tks AS MATERIALIZED (SELECT doc_id, tok FROM (SELECT doc_id, "
        "unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok "
        "FROM documents) WHERE tok != '')",
        ", lbl AS MATERIALIZED (SELECT d.doc_id, coalesce(y.y, 0) AS y FROM documents "
        "d LEFT JOIN (SELECT doc_id, max(CASE WHEN tok = 'vector' THEN 1 "
        "ELSE 0 END) AS y FROM tks GROUP BY 1) y ON d.doc_id = y.doc_id)",
        f", feat AS MATERIALIZED (SELECT DISTINCT doc_id, {_poly31_sql('tok')} % "
        f"{buckets} AS j FROM tks "
        f"UNION ALL SELECT doc_id, {d} FROM documents)",
        ", nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)",
        f", w0 AS MATERIALIZED (SELECT j, CAST(0 AS BIGINT) AS w FROM range({d + 1}) "
        "t(j))",
    ]
    for t in range(1, iters + 1):
        p = t - 1
        parts.append(
            f", z{t} AS MATERIALIZED (SELECT f.doc_id, CAST(sum(w.w) AS BIGINT) AS z "
            f"FROM feat f JOIN w{p} w ON f.j = w.j GROUP BY 1)"
        )
        parts.append(
            f", r{t} AS MATERIALIZED (SELECT l.doc_id, "
            f"(2 * ((CAST({s} AS BIGINT) + abs(q.zc) + q.zc) * {s}) + "
            f"(2 * ({s} + abs(q.zc)))) // (2 * (2 * ({s} + abs(q.zc)))) "
            f"- l.y * {s} AS r FROM lbl l JOIN (SELECT doc_id, "
            f"greatest(least(z, CAST({cl} AS BIGINT)), "
            f"CAST(-{cl} AS BIGINT)) AS zc FROM z{t}) q "
            "ON l.doc_id = q.doc_id)"
        )
        parts.append(
            f", g{t} AS MATERIALIZED (SELECT f.j, CAST(sum(r.r) AS BIGINT) AS g "
            f"FROM feat f JOIN r{t} r ON f.doc_id = r.doc_id GROUP BY 1)"
        )
        parts.append(
            # explicit FLOOR division: python // floors but DuckDB //
            # truncates toward zero (measured off-by-one on negative
            # gradients); non-negative operands agree, so floor the
            # negative branch by hand
            f", w{t} AS MATERIALIZED (SELECT w.j, w.w - (CASE WHEN "
            f"({lr_num} * coalesce(g.g, 0)) >= 0 THEN "
            f"({lr_num} * coalesce(g.g, 0)) // ({t} * nn.n) ELSE "
            f"-((-({lr_num} * coalesce(g.g, 0)) + {t} * nn.n - 1) "
            f"// ({t} * nn.n)) END) AS w FROM w{p} w LEFT JOIN g{t} g "
            "ON w.j = g.j CROSS JOIN nn)"
        )
    parts.append(
        f", zf AS MATERIALIZED (SELECT f.doc_id, CAST(sum(w.w) AS BIGINT) AS z "
        f"FROM feat f JOIN w{iters} w ON f.j = w.j GROUP BY 1)"
    )
    parts.append(
        ", acc AS MATERIALIZED (SELECT CAST(sum(CASE WHEN (zf.z > 0) = (l.y = 1) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS correct FROM lbl l "
        "JOIN zf ON l.doc_id = zf.doc_id)"
    )
    parts.append(
        f" SELECT w.j, w.w, nn.n AS n_docs, "
        + _fhu("CAST(acc.correct AS DOUBLE) / nn.n", 4) + " AS acc_4dp, 1 AS acc_ok "
        f"FROM w{iters} w CROSS JOIN nn CROSS JOIN acc"
    )
    return "".join(parts)


def _pq_oracle(
    m_sub: int = 4,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    scale: int = 10_000,
    top_n: int = 10,
) -> str:
    """Oracle for ``xsim_pq``: one suffixed k-means trajectory per
    subspace slice (replaying each codebook exactly), per-vector code
    extraction from the final assignments, the query-side distance
    LUTs rebuilt in SQL from the final centroids, ADC summation, the
    exact full-dim quantized distance, and the deterministic
    (adc, vec_id) top-``top_n``."""
    sub = dim // m_sub
    fin = iters + 1
    parts = [
        _kmeans_ctes(
            k,
            iters,
            sub,
            scale,
            sfx=f"s{s}",
            vec_expr=f"embedding[{s * sub + 1}:{(s + 1) * sub}]",
            with_kw=(s == 0),
        )
        for s in range(m_sub)
    ]
    qv = (
        ", qv AS (SELECT vec_id, list_transform(embedding, "
        f"x -> CAST(FLOOR(CAST(x AS DOUBLE)*{float(scale)} + 0.5) "
        "AS BIGINT)) AS qv FROM embeddings)"
        ", qq AS (SELECT qv FROM qv ORDER BY vec_id LIMIT 1)"
    )
    code_join = " JOIN ".join(
        f"a{fin}s{s} a{s}" + ("" if s == 0 else " USING (vec_id)")
        for s in range(m_sub)
    )
    codes = (
        ", codes AS (SELECT a0.vec_id, "
        + ", ".join(f"CAST(a{s}.enc % {k} AS BIGINT) AS c{s}" for s in range(m_sub))
        + f" FROM {code_join})"
    )
    luts = "".join(
        f", lut{s} AS (SELECT c.cid, CAST(list_sum(list_transform("
        f"range(0, {sub}), j -> (q.qv[{s * sub}+j+1]-c.qv[j+1])"
        f"*(q.qv[{s * sub}+j+1]-c.qv[j+1]))) AS BIGINT) AS d "
        f"FROM c{iters}s{s} c, qq q)"
        for s in range(m_sub)
    )
    lut_joins = " ".join(
        f"JOIN lut{s} l{s} ON l{s}.cid = codes.c{s}" for s in range(m_sub)
    )
    adc_sum = " + ".join(f"l{s}.d" for s in range(m_sub))
    scored = (
        ", scored AS (SELECT codes.vec_id, "
        + ", ".join(f"codes.c{s}" for s in range(m_sub))
        + f", {adc_sum} AS adc_dist2q FROM codes {lut_joins})"
        ", tru AS (SELECT v.vec_id, CAST(list_sum(list_transform("
        f"range(0, {dim}), j -> (v.qv[j+1]-q.qv[j+1])"
        "*(v.qv[j+1]-q.qv[j+1]))) AS BIGINT) AS true_dist2q "
        "FROM qv v, qq q)"
    )
    final = (
        " SELECT rank, vec_id, "
        + ", ".join(f"c{s}" for s in range(m_sub))
        + ", adc_dist2q, true_dist2q FROM ("
        "SELECT CAST(row_number() OVER (ORDER BY s.adc_dist2q, s.vec_id) "
        "AS BIGINT) AS rank, s.*, t.true_dist2q "
        "FROM scored s JOIN tru t USING (vec_id)) "
        f"WHERE rank <= {top_n}"
    )
    return "".join(parts) + qv + codes + luts + scored + final


def _zorder_layout_oracle() -> str:
    """Oracle for ``xlayout_zorder``: reproduces the Morton z-value
    bit-for-bit (16-bit min-max codes over IEEE-double scaling in the
    engine's exact expression order, then 32 disjoint-bit interleave
    terms summed), chunks on ``z >> 24`` via the same
    FLOOR(double/literal) idiom the engine's zone_map_audit uses, and
    reruns the xlayout_zonemap zone-map CTEs over the z-chunks."""
    interleave = " + ".join(
        f"((({code} >> {bit}) & 1) << {2 * bit + ci})"
        for bit in range(16)
        for ci, code in enumerate(("ct", "cu"))
    )
    code_t = (
        "CASE WHEN hi_t = lo_t THEN 0 ELSE COALESCE(LEAST(65535, "
        "CAST(FLOOR((CAST(ts_ms AS DOUBLE) - lo_t) / (hi_t - lo_t) "
        "* 65536) AS BIGINT)), 0) END"
    )
    code_u = (
        "CASE WHEN hi_u = lo_u THEN 0 ELSE COALESCE(LEAST(65535, "
        "CAST(FLOOR((CAST(user_id AS DOUBLE) - lo_u) / (hi_u - lo_u) "
        "* 65536) AS BIGINT)), 0) END"
    )
    return (
        "WITH src AS (SELECT epoch_ms(ts) AS ts_ms, "
        "CAST(user_id AS BIGINT) AS user_id FROM events), "
        "bd AS (SELECT min(CAST(ts_ms AS DOUBLE)) AS lo_t, "
        "max(CAST(ts_ms AS DOUBLE)) AS hi_t, "
        "min(CAST(user_id AS DOUBLE)) AS lo_u, "
        "max(CAST(user_id AS DOUBLE)) AS hi_u FROM src), "
        f"coded AS (SELECT ts_ms, user_id, {code_t} AS ct, {code_u} AS cu "
        "FROM src, bd), "
        f"zc AS (SELECT ts_ms, user_id, {interleave} AS zv FROM coded), "
        "zw AS (SELECT CAST(FLOOR(CAST(zv AS DOUBLE) / 16777216.0) "
        "AS BIGINT) AS chunk, "
        "min(ts_ms) AS min_ts, max(ts_ms) AS max_ts, "
        "min(user_id) AS min_uid, max(user_id) AS max_uid "
        "FROM zc GROUP BY 1), "
        "zm AS (SELECT chunk, 'ts_ms' AS key_name, min_ts AS zmin, "
        "max_ts AS zmax FROM zw "
        "UNION ALL SELECT chunk, 'user_id', min_uid, max_uid FROM zw), "
        "b AS (SELECT key_name, min(zmin) AS lo, max(zmax) AS hi, "
        "CAST(count(*) AS BIGINT) AS n_chunks FROM zm GROUP BY 1), "
        "p AS (SELECT key_name, n_chunks, CAST(k.probe_idx AS BIGINT) "
        "AS probe_idx, "
        "lo + CAST(FLOOR(CAST((hi - lo) * k.probe_idx AS DOUBLE) / 10.0) "
        "AS BIGINT) AS probe_value "
        "FROM b CROSS JOIN (SELECT unnest(range(1, 10)) AS probe_idx) k), "
        "s AS (SELECT p.key_name, p.probe_idx, p.probe_value, p.n_chunks, "
        "CAST(sum(CASE WHEN m.zmin <= p.probe_value "
        "AND p.probe_value <= m.zmax THEN 0 ELSE 1 END) AS BIGINT) "
        "AS n_skipped "
        "FROM p JOIN zm m ON m.key_name = p.key_name "
        "GROUP BY 1, 2, 3, 4), "
        "i AS (SELECT key_name, "
        + _fhu(
            "CAST(sum(CASE WHEN prev_max IS NOT NULL AND prev_max >= "
            "zmin THEN 1 ELSE 0 END) AS DOUBLE) / count(*)",
            6,
        )
        + " AS interleave_frac FROM ("
        "SELECT key_name, zmin, lag(zmax) OVER (PARTITION BY key_name "
        "ORDER BY zmin, zmax, chunk) AS prev_max FROM zm) GROUP BY 1) "
        "SELECT s.key_name, s.probe_idx, s.probe_value, s.n_chunks, "
        "s.n_skipped, "
        + _fhu("CAST(s.n_skipped AS DOUBLE) / s.n_chunks", 6) + " AS skip_frac, "
        "i.interleave_frac "
        "FROM s JOIN i ON i.key_name = s.key_name"
    )


ORACLES = {
    "xdedup_minhash_sql": _minhash_sql_oracle(),
    "xdedup_minhash_survivors": _minhash_survivors_oracle(),
    "xdedup_simhash_sql": _simhash_sql_oracle(),
    "xdedup_semantic": _semantic_oracle(),
    "xsample": (
        "SELECT lang, count(*) AS n_docs FROM documents WHERE "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
        "string_split(CAST(doc_id AS VARCHAR) || '#0', ''), "
        "ch -> CAST(ascii(ch) AS BIGINT))), "
        "(a, b) -> (a * 31 + b) % 2147483647) % 10000 < 3000 "
        "GROUP BY lang"
    ),
    "xsample_stratified": (
        "WITH h AS (SELECT lang, doc_id, "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
        "string_split(CAST(doc_id AS VARCHAR) || '#0', ''), "
        "ch -> CAST(ascii(ch) AS BIGINT))), "
        "(a, b) -> (a * 31 + b) % 2147483647) % 10000 AS bkt "
        "FROM documents), "
        "r AS (SELECT lang, doc_id, "
        "row_number() OVER (PARTITION BY lang ORDER BY bkt, doc_id) AS rn, "
        "count(*) OVER (PARTITION BY lang) AS n FROM h) "
        "SELECT lang, count(*) AS n_docs, "
        "CAST(sum(doc_id) AS BIGINT) AS id_sum "
        "FROM r WHERE rn <= CEIL(n * 0.3) GROUP BY lang"
    ),
    "xinterleave": (
        "WITH w AS (SELECT doc_id, lang, "
        "CASE lang WHEN 'en' THEN 3.0 WHEN 'de' THEN 1.0 "
        "WHEN 'fr' THEN 0.0 ELSE 1.0 END AS wt, "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
        "string_split(CAST(doc_id AS VARCHAR) || '#0', ''), "
        "ch -> CAST(ascii(ch) AS BIGINT))), "
        "(a, b) -> (a * 31 + b) % 2147483647) % 10000 AS bkt "
        "FROM documents), "
        "f AS (SELECT * FROM w WHERE wt > 0), "
        "r AS (SELECT doc_id, lang, wt, CAST(row_number() OVER ("
        "PARTITION BY lang ORDER BY bkt, doc_id) AS DOUBLE) AS r FROM f), "
        "s AS (SELECT doc_id, lang, (r - 0.5) / wt AS strd FROM r) "
        "SELECT doc_id, lang, CAST(row_number() OVER ("
        "ORDER BY strd, lang, doc_id) - 1 AS BIGINT) AS interleave_rank "
        "FROM s"
    ),
    "xupsample_repeat": (
        # Repeat factors CAST AS DOUBLE: DuckDB types the bare literal
        # 2.4 as DECIMAL, making floor((r - floor(r)) * 10000) = 4000
        # exactly, while Spark's F.lit(2.4) is a float64 giving 3999 —
        # a doc whose hash bucket lands exactly on 3999 would get an
        # extra epoch copy in the oracle but not in Spark.
        "WITH c AS (SELECT lang, doc_id, "
        "CASE lang WHEN 'en' THEN CAST(2.4 AS DOUBLE) "
        "WHEN 'de' THEN CAST(1.5 AS DOUBLE) "
        "WHEN 'fr' THEN CAST(0.5 AS DOUBLE) "
        "ELSE CAST(1.0 AS DOUBLE) END AS r, "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
        "string_split(CAST(doc_id AS VARCHAR) || '#0', ''), "
        "ch -> CAST(ascii(ch) AS BIGINT))), "
        "(a, b) -> (a * 31 + b) % 2147483647) % 10000 AS bkt "
        "FROM documents), "
        "n AS (SELECT lang, doc_id, CAST(floor(r) AS BIGINT) + "
        "CASE WHEN bkt < CAST(floor((r - floor(r)) * 10000) AS BIGINT) "
        "THEN 1 ELSE 0 END AS n FROM c), "
        "e AS (SELECT lang, doc_id, "
        "CAST(unnest(range(0, n)) AS BIGINT) AS epoch FROM n) "
        "SELECT lang, epoch, count(*) AS n_docs, "
        "CAST(sum(doc_id) AS BIGINT) AS id_sum "
        "FROM e GROUP BY lang, epoch"
    ),
    "xlength_buckets": (
        "WITH c AS (SELECT doc_id, "
        "CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) "
        "AS cost FROM documents), "
        "b AS (SELECT cost, CASE WHEN cost < 32 THEN 0 WHEN cost < 64 THEN 1 "
        "WHEN cost < 128 THEN 2 WHEN cost < 256 THEN 3 WHEN cost < 512 "
        "THEN 4 ELSE 5 END AS bucket FROM c), "
        "g AS (SELECT CAST(bucket AS BIGINT) AS bucket, "
        "CAST([0, 32, 64, 128, 256, 512][bucket + 1] AS BIGINT) AS bucket_lo, "
        "CASE WHEN bucket < 5 THEN "
        "CAST([32, 64, 128, 256, 512][bucket + 1] AS BIGINT) END AS bucket_hi, "
        "cost FROM b) "
        "SELECT bucket, bucket_lo, bucket_hi, count(*) AS n_docs, "
        "CAST(sum(cost) AS BIGINT) AS n_tokens "
        "FROM g GROUP BY bucket, bucket_lo, bucket_hi"
    ),
    "xsample_weighted": (
        "WITH h AS (SELECT doc_id, n_chars, "
        "CAST(n_chars AS DOUBLE) AS w, "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
        "string_split(CAST(doc_id AS VARCHAR) || '#0', ''), "
        "ch -> CAST(ascii(ch) AS BIGINT))), "
        "(a, b) -> (a * 31 + b) % 2147483647) AS hv "
        "FROM documents WHERE n_chars > 0) "
        "SELECT doc_id, n_chars FROM ("
        "SELECT doc_id, n_chars, "
        + _fhu("ln((hv + 1) / 2147483648.0) / w", 9) + " AS k FROM h) "
        "ORDER BY k DESC, doc_id LIMIT 200"
    ),
    "xpack_sequences": (
        "WITH c AS (SELECT lang, doc_id, "
        "CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) "
        "AS cost, "
        + _poly_shard_sql("doc_id", 8)
        + " AS shard FROM documents), "
        "p AS (SELECT lang, shard, cost, CAST(FLOOR("
        "(SUM(cost) OVER (PARTITION BY lang, shard ORDER BY doc_id) - cost) "
        "/ 2048.0) AS BIGINT) AS chunk FROM c) "
        "SELECT lang, shard, chunk, count(*) AS n_docs, "
        "CAST(SUM(cost) AS BIGINT) AS n_tokens "
        "FROM p GROUP BY lang, shard, chunk"
    ),
    "xpack_layout": (
        "WITH c AS (SELECT lang, doc_id, "
        "CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) "
        "AS cost, "
        + _poly_shard_sql("doc_id", 4)
        + " AS shard FROM documents), "
        "p AS (SELECT lang, shard, doc_id, cost, "
        "SUM(cost) OVER (PARTITION BY lang, shard ORDER BY doc_id) - cost "
        "AS off FROM c) "
        "SELECT lang, shard, "
        "CAST(FLOOR(CAST(off AS DOUBLE) / 512.0) AS BIGINT) AS chunk, "
        "doc_id, CAST(off - FLOOR(CAST(off AS DOUBLE) / 512.0) * 512 "
        "AS BIGINT) AS start, "
        "cost AS length FROM p"
    ),
    "xvocab": (
        "WITH tok AS (SELECT unnest(string_split_regex(trim(lower(text)), "
        "'\\s+')) AS token FROM documents), "
        "c AS (SELECT token, count(*) AS freq FROM tok GROUP BY token) "
        "SELECT token, freq, rank FROM (SELECT token, freq, "
        "CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rank "
        "FROM c) WHERE rank <= 20"
    ),
    "xvocab_oov": (
        "WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), "
        "'\\s+')) AS token FROM documents), "
        "c AS (SELECT token, count(*) AS freq FROM tok GROUP BY token), "
        "v AS (SELECT token FROM (SELECT token, row_number() OVER "
        "(ORDER BY freq DESC, token) AS rank FROM c) WHERE rank <= 20), "
        "r AS (SELECT doc_id, count(*) AS n_tokens, "
        "round(CAST(count(*) - count(v.token) AS DOUBLE) / count(*), 4) "
        "AS oov_rate FROM tok LEFT JOIN v USING (token) GROUP BY doc_id) "
        "SELECT lang, count(*) AS n_docs, round(avg(oov_rate), 4) AS avg_oov "
        "FROM r JOIN documents USING (doc_id) GROUP BY lang"
    ),
    "xlm_score": (
        "WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), "
        "'\\s+')) AS token FROM documents), "
        "c AS (SELECT token, count(*) AS freq FROM tok GROUP BY token), "
        "v AS (SELECT token, freq FROM (SELECT token, freq, row_number() OVER "
        "(ORDER BY freq DESC, token) AS rank FROM c) WHERE rank <= 10), "
        "tot AS (SELECT CAST(sum(freq) AS DOUBLE) AS total FROM v) "
        "SELECT doc_id, count(*) AS n_tokens, "
        "round(avg(CASE WHEN v.freq IS NOT NULL "
        "THEN ln(v.freq / tot.total) ELSE ln(0.5 / tot.total) END), 4) "
        "AS mean_logprob "
        "FROM tok LEFT JOIN v USING (token) CROSS JOIN tot GROUP BY doc_id"
    ),
    "xsim_topk_batch": (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb "
        "FROM embeddings), "
        "q AS (SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id < 5), "
        "s AS (SELECT q.qid AS query_id, e.vec_id, "
        "round(list_dot_product(e.emb, q.qe) / "
        "(sqrt(list_dot_product(e.emb, e.emb)) * "
        "sqrt(list_dot_product(q.qe, q.qe))), 4) AS cosine "
        "FROM e CROSS JOIN q) "
        "SELECT query_id, vec_id, cosine, rank FROM ("
        "SELECT *, CAST(row_number() OVER (PARTITION BY query_id "
        "ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank FROM s) "
        "WHERE rank <= 5"
    ),
    "xchunk_docs": (
        "WITH t AS (SELECT doc_id, "
        "string_split_regex(trim(lower(text)), '\\s+') AS tok FROM documents), "
        "e AS (SELECT doc_id, tok, "
        "unnest(range(1, greatest(len(tok), 1) + 1, 48)) AS st FROM t), "
        "c AS (SELECT doc_id, CAST((st - 1) // 48 AS BIGINT) AS chunk_idx, "
        "list_slice(tok, st, least(st + 63, len(tok))) AS chunk FROM e "
        "WHERE st = 1 OR st + 16 <= len(tok)) "
        "SELECT doc_id, chunk_idx, CAST(len(chunk) AS BIGINT) AS n_chunk_tokens, "
        "md5(array_to_string(chunk, ' ')) AS chunk_md5 FROM c"
    ),
    "xquality_gate": (
        "WITH r AS (SELECT lang, doc_id, n_chars, "
        "row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn, "
        "count(*) OVER (PARTITION BY lang) AS n FROM documents) "
        "SELECT lang, count(*) AS n_kept, "
        "CAST(sum(doc_id) AS BIGINT) AS id_sum, "
        "min(n_chars) AS min_chars "
        "FROM r WHERE rn > floor(n * 0.25) GROUP BY lang"
    ),
    "xsample_temperature": (
        "WITH c AS (SELECT lang, CAST(count(*) AS DOUBLE) AS c "
        "FROM documents GROUP BY lang), "
        "t AS (SELECT sum(c) AS tot, sum(pow(c, 0.5)) AS z FROM c), "
        "cuts AS (SELECT lang, CAST(floor(round("
        "least(1.0, 0.4 * tot * pow(c, 0.5) / z / c) * 10000, 6)) AS BIGINT) "
        "AS cut FROM c CROSS JOIN t), "
        "h AS (SELECT lang, doc_id, "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
        "string_split(CAST(doc_id AS VARCHAR) || '#0', ''), "
        "ch -> CAST(ascii(ch) AS BIGINT))), "
        "(a, b) -> (a * 31 + b) % 2147483647) % 10000 AS bkt FROM documents) "
        "SELECT lang, count(*) AS n_docs, "
        "CAST(sum(doc_id) AS BIGINT) AS id_sum "
        "FROM h JOIN cuts USING (lang) WHERE bkt < cut GROUP BY lang"
    ),
    "xcap_per_source": (
        "WITH h AS (SELECT source, doc_id, "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
        "string_split(CAST(doc_id AS VARCHAR) || '#0', ''), "
        "ch -> CAST(ascii(ch) AS BIGINT))), "
        "(a, b) -> (a * 31 + b) % 2147483647) % 10000 AS bkt FROM documents), "
        "r AS (SELECT source, doc_id, "
        "row_number() OVER (PARTITION BY source ORDER BY bkt, doc_id) AS rn "
        "FROM h) "
        "SELECT source, count(*) AS n_docs, "
        "CAST(sum(doc_id) AS BIGINT) AS id_sum "
        "FROM r WHERE rn <= 15 GROUP BY source"
    ),
    "xshuffle": (
        "WITH h AS (SELECT doc_id, "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
        "string_split(CAST(doc_id AS VARCHAR) || '#0', ''), "
        "ch -> CAST(ascii(ch) AS BIGINT))), "
        "(a, b) -> (a * 31 + b) % 2147483647) % 10000 AS bkt "
        "FROM documents WHERE doc_id < 500) "
        "SELECT doc_id, CAST(row_number() OVER (ORDER BY bkt, doc_id) - 1 "
        "AS BIGINT) AS shuffle_rank FROM h"
    ),
    "xpipeline_e2e": (
        "WITH c0 AS (SELECT lang, doc_id, text, "
        "CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) "
        "AS cost FROM documents), "
        "f AS (SELECT * FROM c0 WHERE cost BETWEEN 15 AND 1000), "
        "d AS (SELECT lang, doc_id, cost FROM (SELECT *, "
        "row_number() OVER (PARTITION BY "
        "trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) "
        "ORDER BY doc_id) AS rn FROM f) WHERE rn = 1), "
        "cnt AS (SELECT lang, CAST(count(*) AS DOUBLE) AS c FROM d "
        "GROUP BY lang), "
        "t AS (SELECT sum(c) AS tot, sum(pow(c, 0.5)) AS z FROM cnt), "
        "cuts AS (SELECT lang, CAST(floor(round("
        "least(1.0, 0.6 * tot * pow(c, 0.5) / z / c) * 10000, 6)) AS BIGINT) "
        "AS cut FROM cnt CROSS JOIN t), "
        "s AS (SELECT d.lang, d.doc_id, d.cost FROM d JOIN cuts USING (lang) "
        "WHERE list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
        "string_split(CAST(d.doc_id AS VARCHAR) || '#0', ''), "
        "ch -> CAST(ascii(ch) AS BIGINT))), "
        "(a, b) -> (a * 31 + b) % 2147483647) % 10000 < cut), "
        "p AS (SELECT lang, doc_id, cost, "
        + _poly_shard_sql("doc_id", 4)
        + " AS shard, CAST(FLOOR("
        "(SUM(cost) OVER (PARTITION BY lang, "
        + _poly_shard_sql("doc_id", 4)
        + " ORDER BY doc_id) - cost) / 2048.0"
        ") AS BIGINT) AS chunk FROM s) "
        "SELECT lang, shard, chunk, count(*) AS n_docs, "
        "CAST(SUM(cost) AS BIGINT) AS n_tokens, "
        "CAST(SUM(doc_id) AS BIGINT) AS id_sum "
        "FROM p GROUP BY lang, shard, chunk"
    ),
    "xsplit_by_group": (
        "WITH h AS (SELECT doc_id, source, "
        "CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(source || '#0', ''), "
        "ch -> CAST(ascii(ch) AS BIGINT))), "
        "(a, b) -> (a * 31 + b) % 2147483647) % 10000 < 2500 "
        "THEN 'holdout' ELSE 'train' END AS side FROM documents) "
        "SELECT side, count(*) AS n_docs, "
        "CAST(sum(doc_id) AS BIGINT) AS id_sum, "
        "count(DISTINCT source) AS n_sources FROM h GROUP BY side"
    ),
    "xmix_budget": (
        "WITH c AS (SELECT lang, doc_id, "
        "CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) "
        "AS cost, "
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
        "string_split(CAST(doc_id AS VARCHAR) || '#0', ''), "
        "ch -> CAST(ascii(ch) AS BIGINT))), "
        "(a, b) -> (a * 31 + b) % 2147483647) % 10000 AS bkt "
        "FROM documents), "
        "s AS (SELECT lang, sum(cost) AS tok FROM c GROUP BY lang), "
        "w(lang, w) AS (VALUES ('de', 0.25), ('en', 0.25), ('fr', 0.25), "
        "('zh', 0.25)), "
        "cuts AS (SELECT lang, CAST(floor(round("
        "least(1.0, 20000.0 * w / tok) * 10000, 6)) AS BIGINT) AS cut "
        "FROM s JOIN w USING (lang)) "
        "SELECT lang, count(*) AS n_docs, "
        "CAST(sum(doc_id) AS BIGINT) AS id_sum, "
        "CAST(sum(cost) AS BIGINT) AS n_tokens "
        "FROM c JOIN cuts USING (lang) WHERE bkt < cut GROUP BY lang"
    ),
    "xbm25": (
        "WITH tok AS (SELECT doc_id, "
        "len(string_split_regex(trim(lower(text)), '\\s+')) AS dl, "
        "unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t "
        "FROM documents), "
        "m AS (SELECT doc_id, t, count(*) AS tf, any_value(dl) AS dl "
        "FROM tok WHERE t IN ('hash', 'merge', 'stream', 'vector') "
        "GROUP BY doc_id, t), "
        "s AS (SELECT CAST(count(*) AS DOUBLE) AS n, "
        "avg(len(string_split_regex(trim(lower(text)), '\\s+'))) AS avgdl "
        "FROM documents), "
        "d AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM m GROUP BY t) "
        "SELECT doc_id, count(*) AS n_terms_matched, "
        "round(sum(ln(1.0 + (n - df + 0.5) / (df + 0.5)) "
        "* tf * (1.2 + 1.0) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))"
        "), 4) AS score "
        "FROM m JOIN d USING (t) CROSS JOIN s GROUP BY doc_id"
    ),
    "xtfidf": (
        "WITH tf AS (SELECT doc_id, t AS term, count(*) AS tf FROM ("
        "SELECT doc_id, unnest(string_split_regex(trim(lower(text)), "
        "'\\s+')) AS t FROM documents WHERE doc_id < 200) GROUP BY doc_id, t), "
        "d AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf "
        "GROUP BY term), "
        "n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents "
        "WHERE doc_id < 200), "
        "x AS (SELECT doc_id, term, tf, "
        "tf * (ln((n + 1.0) / (df + 1.0)) + 1.0) AS tfidf "
        "FROM tf JOIN d USING (term) CROSS JOIN n), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
        "ORDER BY tfidf DESC, term) AS term_rank FROM x) "
        "SELECT doc_id, term, tf, round(tfidf, 4) AS tfidf, "
        "CAST(term_rank AS BIGINT) AS term_rank FROM r WHERE term_rank <= 3"
    ),
    "xsalted_agg": (
        "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
    ),
    "xdedup_incremental": _incremental_dedup_oracle(),
    "xsim_srp_lsh": _srp_lsh_oracle(),
    "xmm_phash": (
        # stub pixels = bytes of sha256(payload) || sha256(hex-of-that):
        # 64 deterministic bytes; bit i = pixel_i > mean; hex via two
        # 32-bit halves (bit 63 would overflow a signed BIGINT)
        "WITH m AS (SELECT doc_id, sha256(text) AS d1 "
        "FROM documents), "
        "mm AS (SELECT doc_id, d1 || sha256(d1) AS hx FROM m), "
        "px AS (SELECT doc_id, i, "
        "CAST(('0x' || substr(hx, CAST(2 * i + 1 AS INT), 2)) AS INT) AS p "
        "FROM mm CROSS JOIN range(0, 64) r(i)), "
        "st AS (SELECT doc_id, avg(p) AS mean FROM px GROUP BY doc_id), "
        "bits AS (SELECT px.doc_id, i, "
        "CASE WHEN p > mean THEN 1 ELSE 0 END AS b "
        "FROM px JOIN st USING (doc_id)), "
        "v AS (SELECT doc_id, "
        "CAST(sum(CASE WHEN i >= 32 THEN CAST(b AS BIGINT) * "
        "(CAST(1 AS BIGINT) << CAST(i - 32 AS INT)) ELSE 0 END) AS BIGINT) "
        "AS hi, "
        "CAST(sum(CASE WHEN i < 32 THEN CAST(b AS BIGINT) * "
        "(CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END) AS BIGINT) AS lo "
        "FROM bits GROUP BY doc_id) "
        "SELECT doc_id AS media_id, printf('%08x%08x', hi, lo) AS phash "
        "FROM v"
    ),
    "xmm_decode": (
        # the decode stub derives (width, height) from the sha256 digest
        # of the UTF-8 payload — reproducible in SQL, so the mapInPandas
        # kernel's OUTPUT is hash-verified, not just row-counted
        "SELECT doc_id AS media_id, 'image' AS kind, "
        "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
        "CAST(64 + CAST(('0x' || substr(sha256(text), 1, 2)) AS INT) % 192 "
        "AS INT) AS width, "
        "CAST(64 + CAST(('0x' || substr(sha256(text), 3, 2)) AS INT) % 192 "
        "AS INT) AS height "
        "FROM documents"
    ),
    "xmm_features": (
        "WITH m AS (SELECT doc_id, encode(text) AS b, "
        "octet_length(encode(text)) AS n FROM documents WHERE doc_id < 300) "
        "SELECT doc_id AS media_id, CAST(16 AS BIGINT) AS n_bins, "
        "CASE WHEN n > 0 THEN 1.0 ELSE 0.0 END AS feat_sum, "
        "round(CASE WHEN n > 0 THEN "
        "CAST(len(list_filter(list_transform(range(0, n), "
        "i -> substr(hex(b), 2*i+1, 2)), p -> p >= '60' AND p < '70')) "
        "AS DOUBLE) / n ELSE 0.0 END, 6) AS feat_bin6 "
        "FROM m"
    ),
    "xmm_frames": (
        "WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n "
        "FROM documents WHERE doc_id < 300), "
        "f AS (SELECT doc_id, n, greatest(CAST(floor(n / 4) AS INT), 1) "
        "AS step, unnest(range(0, 4)) AS frame_no FROM m) "
        "SELECT doc_id AS media_id, CAST(frame_no AS INT) AS frame_no, "
        "CAST(least(step, greatest(n - frame_no * step, 0)) AS BIGINT) "
        "AS frame_len FROM f"
    ),
    "xskyline": (
        "WITH o AS (SELECT o_orderkey, o_totalprice, "
        "epoch_us(o_orderdate) AS orderdate_us FROM orders "
        "WHERE o_orderkey < 5000) "
        "SELECT o_orderkey, o_totalprice, orderdate_us FROM o a "
        "WHERE NOT EXISTS (SELECT 1 FROM o b "
        "WHERE b.o_totalprice <= a.o_totalprice "
        "AND b.orderdate_us >= a.orderdate_us "
        "AND (b.o_totalprice < a.o_totalprice "
        "OR b.orderdate_us > a.orderdate_us))"
    ),
    "xprofile": (
        # CAST sums/counts to BIGINT: DuckDB's sum() yields HUGEINT which
        # hash-mismatches Spark's long (the r02 failure). min/max rounded
        # to 9 dp on both sides per the suite determinism rules.
        "SELECT col AS \"column\", count(*) AS n_rows, "
        "CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_nulls, "
        "CAST(count(DISTINCT v) AS BIGINT) AS n_distinct, "
        "round(min(v), 9) AS min_val, round(max(v), 9) AS max_val FROM ("
        "SELECT 'l_orderkey' AS col, CAST(l_orderkey AS DOUBLE) AS v FROM lineitem "
        "UNION ALL SELECT 'l_quantity', CAST(l_quantity AS DOUBLE) FROM lineitem "
        "UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem "
        "UNION ALL SELECT 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem"
        ") GROUP BY col"
    ),
    "xlayout_zonemap": (
        # All zone/probe arithmetic integral (BIGINT); the two ratios use
        # the half-up floor idiom mirroring the engine's half_up(…, 6).
        # FLOOR divisors cast via a DOUBLE literal to mirror Spark's
        # float division exactly (the xpack_layout rule).
        "WITH zw AS (SELECT CAST(FLOOR(CAST(event_id AS DOUBLE) / 50.0) "
        "AS BIGINT) AS chunk, "
        "min(epoch_ms(ts)) AS min_ts, max(epoch_ms(ts)) AS max_ts, "
        "min(CAST(user_id AS BIGINT)) AS min_uid, "
        "max(CAST(user_id AS BIGINT)) AS max_uid "
        "FROM events GROUP BY 1), "
        "zm AS (SELECT chunk, 'ts_ms' AS key_name, min_ts AS zmin, "
        "max_ts AS zmax FROM zw "
        "UNION ALL SELECT chunk, 'user_id', min_uid, max_uid FROM zw), "
        "b AS (SELECT key_name, min(zmin) AS lo, max(zmax) AS hi, "
        "CAST(count(*) AS BIGINT) AS n_chunks FROM zm GROUP BY 1), "
        "p AS (SELECT key_name, n_chunks, CAST(k.probe_idx AS BIGINT) "
        "AS probe_idx, "
        "lo + CAST(FLOOR(CAST((hi - lo) * k.probe_idx AS DOUBLE) / 10.0) "
        "AS BIGINT) AS probe_value "
        "FROM b CROSS JOIN (SELECT unnest(range(1, 10)) AS probe_idx) k), "
        "s AS (SELECT p.key_name, p.probe_idx, p.probe_value, p.n_chunks, "
        "CAST(sum(CASE WHEN m.zmin <= p.probe_value "
        "AND p.probe_value <= m.zmax THEN 0 ELSE 1 END) AS BIGINT) "
        "AS n_skipped "
        "FROM p JOIN zm m ON m.key_name = p.key_name "
        "GROUP BY 1, 2, 3, 4), "
        "i AS (SELECT key_name, "
        + _fhu(
            "CAST(sum(CASE WHEN prev_max IS NOT NULL AND prev_max >= "
            "zmin THEN 1 ELSE 0 END) AS DOUBLE) / count(*)",
            6,
        )
        + " AS interleave_frac FROM ("
        "SELECT key_name, zmin, lag(zmax) OVER (PARTITION BY key_name "
        "ORDER BY zmin, zmax, chunk) AS prev_max FROM zm) GROUP BY 1) "
        "SELECT s.key_name, s.probe_idx, s.probe_value, s.n_chunks, "
        "s.n_skipped, "
        + _fhu("CAST(s.n_skipped AS DOUBLE) / s.n_chunks", 6) + " AS skip_frac, "
        "i.interleave_frac "
        "FROM s JOIN i ON i.key_name = s.key_name"
    ),
    "xlayout_zorder": _zorder_layout_oracle(),
    "xcluster_kmeans": _kmeans_oracle(),
    "xcluster_semdedup": _semdedup_oracle(tau2_num=2_025),
    "xcluster_quality": _cluster_quality_oracle(),
    "xsketch_hll": _hll_oracle(),
    "xsketch_countmin": _cm_oracle(),
    "xsketch_quantile": _qsketch_oracle(),
    "xquality_classifier": _quality_clf_oracle(),
    "xsim_pq": _pq_oracle(),
    "xtext_gopher": (
        "WITH d AS (SELECT doc_id, text, "
        "string_split_regex(trim(text), '\\s+') AS w, "
        "string_split(text, chr(10)) AS lns FROM documents) "
        "SELECT doc_id, "
        "len(w) >= 50 AND len(w) <= 100000 AS rule_word_count, "
        "CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / len(w) "
        ">= 3.0 AND "
        "CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / len(w) "
        "<= 10.0 AS rule_mean_word_len, "
        "CAST(length(text) - length(regexp_replace(text, '[#…]', '', 'g')) "
        "AS DOUBLE) / len(w) < 0.1 AS rule_symbol_ratio, "
        "CAST(len(list_filter(lns, l -> regexp_matches(l, '^\\s*[-\\*•]'))) "
        "AS DOUBLE) / len(lns) < 0.9 AS rule_bullet_lines, "
        "CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) "
        "/ len(w) >= 0.8 AS rule_alpha_words, "
        "(len(w) >= 50 AND len(w) <= 100000) AND "
        "(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / len(w) "
        "BETWEEN 3.0 AND 10.0) AND "
        "(CAST(length(text) - length(regexp_replace(text, '[#…]', '', 'g')) "
        "AS DOUBLE) / len(w) < 0.1) AND "
        "(CAST(len(list_filter(lns, l -> regexp_matches(l, '^\\s*[-\\*•]'))) "
        "AS DOUBLE) / len(lns) < 0.9) AND "
        "(CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) "
        "/ len(w) >= 0.8) AS pass_all "
        "FROM d"
    ),
    "xtext_c4_filter": (
        "WITH d AS (SELECT doc_id, string_split(text, ' the ') AS lns "
        "FROM documents), "
        "k AS (SELECT doc_id, coalesce(array_to_string(list_filter(lns, l -> "
        "len(string_split_regex(trim(l), '\\s+')) >= 6 AND "
        "NOT contains(lower(l), 'lorem ipsum') AND "
        "NOT contains(lower(l), 'javascript') AND "
        "NOT contains(l, '{')), ' the '), '') AS clean FROM d) "
        "SELECT doc_id, CAST(length(clean) AS BIGINT) AS clean_len, "
        "length(clean) > 0 AS survived FROM k"
    ),
    "xrange_join": (
        "WITH promos AS (SELECT o_orderkey AS promo_id, "
        "o_orderdate AS start_ts, o_orderdate + INTERVAL 14 DAY AS end_ts, "
        "o_orderpriority AS promo_prio FROM orders WHERE o_orderkey % 100 = 0), "
        "points AS (SELECT l_orderkey, l_shipdate AS ship_ts, l_extendedprice "
        "FROM lineitem WHERE l_orderkey <= 2000) "
        "SELECT promo_prio, count(*) AS n_shipments, "
        "count(DISTINCT promo_id) AS n_promos, "
        "CAST(SUM(CAST(round((l_extendedprice)*1000000) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_price "
        "FROM points p JOIN promos i "
        "ON p.ship_ts >= i.start_ts AND p.ship_ts < i.end_ts "
        "GROUP BY promo_prio"
    ),
    "xsnapshot": (
        "WITH ledger AS (SELECT event_id AS off, "
        "CAST(event_id % 4 AS INT) AS op, ts AS event_time, "
        "user_id, event_type, value FROM events), "
        "latest AS (SELECT *, row_number() OVER "
        "(PARTITION BY user_id ORDER BY off DESC) AS rn FROM ledger) "
        "SELECT user_id, event_type, round(value, 2) AS value, "
        "epoch_us(event_time) AS event_time_us "
        "FROM latest WHERE rn = 1 AND op NOT IN (1, 2)"
    ),
    "xchangelog_agg": (
        "WITH w AS (SELECT event_type, "
        "CASE WHEN CAST(event_id % 4 AS INT) IN (1, 2) THEN -1 ELSE 1 END "
        "AS wt, value FROM events) "
        "SELECT event_type, CAST(sum(wt) AS BIGINT) AS n_live, "
        "CAST(sum(wt * CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) "
        "/ 1000000.0 AS value_sum "
        "FROM w GROUP BY event_type HAVING sum(wt) != 0"
    ),
    "xchangelog_merge": (
        # whole-history recompute — the Spark side folds tick-by-tick,
        # so a hash match proves merge ≡ recompute at the driver
        "WITH w AS (SELECT event_type, "
        "CASE WHEN CAST(event_id % 4 AS INT) IN (1, 2) THEN -1 ELSE 1 END "
        "AS wt, value FROM events) "
        "SELECT event_type, CAST(sum(wt) AS BIGINT) AS n_live, "
        "CAST(sum(wt * CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) "
        "/ 1000000.0 AS value_sum "
        "FROM w GROUP BY event_type HAVING sum(wt) != 0"
    ),
    "xsnapshot_merge": (
        'WITH l AS (SELECT event_id AS "offset", '
        "CAST(event_id % 4 AS INT) AS op, user_id, value FROM events), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY user_id "
        'ORDER BY "offset" DESC) AS rn FROM l) '
        'SELECT user_id, "offset", op, value FROM r '
        "WHERE rn = 1 AND op NOT IN (1, 2)"
    ),
    "xkey_skew": (
        "WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n "
        "FROM events GROUP BY user_id), "
        "t AS (SELECT sum(n) AS total FROM c) "
        "SELECT CAST(row_number() OVER (ORDER BY n DESC, key) AS BIGINT) "
        "AS rank, key, CAST(n AS BIGINT) AS n, "
        "round(n / t.total, 9) AS share "
        "FROM c CROSS JOIN t ORDER BY n DESC, key LIMIT 20"
    ),
    "xfuzzy_join": (
        "SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b, "
        "a.s_name AS text_a, b.s_name AS text_b, "
        "CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS distance "
        "FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey "
        "WHERE levenshtein(a.s_name, b.s_name) <= 1"
    ),
    "xwinsorize": (
        "WITH cuts AS (SELECT l_returnflag, "
        "quantile_cont(l_extendedprice, 0.05) AS lo, "
        "quantile_cont(l_extendedprice, 0.95) AS hi "
        "FROM lineitem GROUP BY l_returnflag) "
        "SELECT l_orderkey, l_linenumber, l.l_returnflag, "
        "round(l_extendedprice, 4) AS price, "
        "round(least(greatest(l_extendedprice, lo), hi), 4) AS price_w "
        "FROM lineitem l JOIN cuts USING (l_returnflag) "
        "WHERE l_orderkey < 5000"
    ),
    "xrolling_time": (
        "SELECT event_id, user_id, "
        "CAST(count(value) OVER w AS BIGINT) AS rolling_n, "
        "round(sum(value) OVER w, 6) AS rolling_sum, "
        "round(avg(value) OVER w, 6) AS rolling_avg "
        "FROM events WHERE user_id < 50 "
        "WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts) "
        "RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)"
    ),
    "xdq_checks": (
        "WITH li AS (SELECT count(*) AS n, "
        "sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS v_ok, "
        "sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS v_sd, "
        "sum(CASE WHEN l_quantity IS NOT NULL AND l_quantity NOT BETWEEN 1 "
        "AND 49 THEN 1 ELSE 0 END) AS v_q, "
        "sum(CASE WHEN l_returnflag IS NOT NULL AND l_returnflag NOT IN "
        "('A', 'N', 'R') THEN 1 ELSE 0 END) AS v_rf, "
        "sum(CASE WHEN l_linestatus IS NOT NULL AND NOT "
        "regexp_matches(l_linestatus, '^[A-Z]$') THEN 1 ELSE 0 END) AS v_ls "
        "FROM lineitem), "
        "fk AS (SELECT count(*) AS orphans FROM lineitem WHERE l_orderkey "
        "IS NOT NULL AND l_orderkey NOT IN (SELECT o_orderkey FROM orders "
        "WHERE o_orderkey IS NOT NULL)), "
        "o AS (SELECT count(*) AS n, "
        "count(o_orderkey) - count(DISTINCT o_orderkey) AS v_u, "
        "sum(CASE WHEN o_totalprice IS NOT NULL AND o_totalprice NOT "
        "BETWEEN 0.0 AND 1000000000.0 THEN 1 ELSE 0 END) AS v_tp FROM orders) "
        "SELECT 'lineitem' AS \"table\", 'not_null' AS \"check\", "
        "'l_orderkey' AS \"column\", n AS n_rows, "
        "CAST(v_ok AS BIGINT) AS n_violations, v_ok = 0 AS ok FROM li "
        "UNION ALL SELECT 'lineitem', 'not_null', 'l_shipdate', n, "
        "CAST(v_sd AS BIGINT), v_sd = 0 FROM li "
        "UNION ALL SELECT 'lineitem', 'range', 'l_quantity', n, "
        "CAST(v_q AS BIGINT), v_q = 0 FROM li "
        "UNION ALL SELECT 'lineitem', 'accepted_values', 'l_returnflag', n, "
        "CAST(v_rf AS BIGINT), v_rf = 0 FROM li "
        "UNION ALL SELECT 'lineitem', 'regex', 'l_linestatus', n, "
        "CAST(v_ls AS BIGINT), v_ls = 0 FROM li "
        "UNION ALL SELECT 'lineitem', 'foreign_key', 'l_orderkey', li.n, "
        "CAST(fk.orphans AS BIGINT), fk.orphans = 0 FROM li CROSS JOIN fk "
        "UNION ALL SELECT 'orders', 'range', 'o_totalprice', n, "
        "CAST(v_tp AS BIGINT), v_tp = 0 FROM o "
        "UNION ALL SELECT 'orders', 'unique', 'o_orderkey', n, "
        "CAST(v_u AS BIGINT), v_u = 0 FROM o"
    ),
    "xbigram_lm": (
        "WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), "
        "'\\s+') AS toks FROM documents), "
        "dbg AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM (SELECT doc_id, "
        "unnest(list_zip(toks[:len(toks)-1], toks[2:])) AS z FROM t "
        "WHERE len(toks) >= 2)), "
        "uni AS (SELECT w, count(*) AS c1 FROM "
        "(SELECT unnest(toks) AS w FROM t) GROUP BY w), "
        "v AS (SELECT CAST(count(*) AS DOUBLE) AS V FROM uni), "
        "bg AS (SELECT w1, w2, count(*) AS c12 FROM dbg GROUP BY 1, 2), "
        "lp AS (SELECT doc_id, ln((c12 + 0.5) / (c1 + 0.5 * v.V)) AS lp "
        "FROM dbg JOIN bg USING (w1, w2) JOIN uni ON dbg.w1 = uni.w "
        "CROSS JOIN v), "
        "pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
        "sum(lp) / count(*) AS alp FROM lp GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(pd.n_bigrams, 0) AS n_bigrams, "
        "round(pd.alp, 6) AS avg_logprob "
        "FROM (SELECT DISTINCT doc_id FROM documents) d "
        "LEFT JOIN pd USING (doc_id)"
    ),
    "xmmr": _mmr_oracle(k=5, pool=20, lam=0.7),
    "xtext_clean": (
        "SELECT doc_id, lower(trim(regexp_replace(regexp_replace("
        "regexp_replace(text, '[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]', '', 'g'), "
        "'[\\x00-\\x1f\\x7f]', ' ', 'g'), ' +', ' ', 'g'))) AS clean "
        "FROM documents"
    ),
    "xtext_entropy": (
        # NOTE: DuckDB string_split('', '') yields [''] where Spark's
        # split yields [] — the phantom '' char must be excluded from
        # the counts or empty docs report n_chars=1 here and 0 in
        # Spark. The trailing LEFT JOIN restores empty/null docs as
        # (0, 0.0), matching char_entropy's explode_outer behavior.
        "WITH ch AS (SELECT doc_id, c FROM (SELECT doc_id, "
        "unnest(string_split(coalesce(text, ''), '')) AS c "
        "FROM documents) WHERE c IS NOT NULL AND c != ''), "
        "pc AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2), "
        "e AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_chars, "
        "ln(CAST(sum(cnt) AS DOUBLE)) - sum(cnt * ln(CAST(cnt AS DOUBLE))) "
        "/ sum(cnt) AS ent FROM pc GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(e.n_chars, 0) AS n_chars, "
        "round(coalesce(e.ent, 0.0), 6) AS entropy "
        "FROM documents d LEFT JOIN e USING (doc_id)"
    ),
    "xpipeline_embed": _pipeline_embed_oracle(),
    "xbpe": _bpe_oracle(num_merges=8),
    "xcdc_ingest": (
        "WITH src AS (SELECT event_id, event_id % 3 AS m, user_id, "
        "round(value, 6) AS bval, round(value * 2, 6) AS aval "
        "FROM events WHERE event_id < 3000) "
        "SELECT event_id, CAST(0 AS BIGINT) AS half, CAST(0 AS BIGINT) "
        "AS op, user_id, aval AS value FROM src WHERE m = 0 "
        "UNION ALL SELECT event_id, 0, 2, user_id, bval FROM src WHERE m = 1 "
        "UNION ALL SELECT event_id, 1, 3, user_id, aval FROM src WHERE m = 1 "
        "UNION ALL SELECT event_id, 0, 1, user_id, bval FROM src WHERE m = 2"
    ),
    "xbpe_encode": _bpe_encode_oracle(num_merges=8, top_k=30),
    "xdrift_psi": (
        "WITH ref AS (SELECT value FROM events WHERE event_type = "
        "'purchase'), "
        "nw AS (SELECT value FROM events WHERE event_type = 'error'), "
        "b AS (SELECT CAST(min(value) AS DOUBLE) AS lo, "
        "CAST(max(value) AS DOUBLE) AS hi FROM ref), "
        "rb AS (SELECT CAST(CASE WHEN hi = lo THEN 0 ELSE "
        "greatest(0, least(9, floor((value - lo) / ((hi - lo) / 10)))) END "
        "AS BIGINT) AS bin, count(*) AS n_ref "
        "FROM ref CROSS JOIN b GROUP BY 1), "
        "nb AS (SELECT CAST(CASE WHEN hi = lo THEN 0 ELSE "
        "greatest(0, least(9, floor((value - lo) / ((hi - lo) / 10)))) END "
        "AS BIGINT) AS bin, count(*) AS n_new "
        "FROM nw CROSS JOIN b GROUP BY 1), "
        "g AS (SELECT i AS bin FROM range(0, 10) r(i)), "
        "j AS (SELECT g.bin, coalesce(rb.n_ref, 0) AS n_ref, "
        "coalesce(nb.n_new, 0) AS n_new FROM g "
        "LEFT JOIN rb ON g.bin = rb.bin LEFT JOIN nb ON g.bin = nb.bin), "
        "t AS (SELECT sum(n_ref) AS tr, sum(n_new) AS tn FROM j), "
        "p AS (SELECT j.bin, j.n_ref, j.n_new, "
        "(j.n_ref + 0.5) / (t.tr + 0.5 * 10) AS p_ref, "
        "(j.n_new + 0.5) / (t.tn + 0.5 * 10) AS p_new "
        "FROM j CROSS JOIN t) "
        "SELECT p.bin, round(b.lo + p.bin * ((b.hi - b.lo) / 10), 6) "
        "AS bin_lo, "
        "round(b.lo + (p.bin + 1) * ((b.hi - b.lo) / 10), 6) AS bin_hi, "
        "CAST(n_ref AS BIGINT) AS n_ref, CAST(n_new AS BIGINT) AS n_new, "
        "round(p_ref, 9) AS p_ref, round(p_new, 9) AS p_new, "
        "round((p_new - p_ref) * ln(p_new / p_ref), 9) AS psi "
        "FROM p CROSS JOIN b"
    ),
    "xmerge_intervals": (
        "WITH iv AS (SELECT user_id, epoch_us(ts) AS s, "
        "epoch_us(ts) + CAST(round(value * 60, 0) AS BIGINT) * 1000000 AS e "
        "FROM events WHERE user_id < 200), "
        "f AS (SELECT user_id, s, e, CASE WHEN max(e) OVER "
        "(PARTITION BY user_id ORDER BY s, e "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL "
        "OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, e "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
        "THEN 1 ELSE 0 END AS brk FROM iv WHERE e >= s), "
        "isl AS (SELECT user_id, s, e, CAST(sum(brk) OVER "
        "(PARTITION BY user_id ORDER BY s, e "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS island FROM f) "
        "SELECT user_id, island, min(s) AS start_us, max(e) AS end_us, "
        "CAST(count(*) AS BIGINT) AS n_merged "
        "FROM isl GROUP BY user_id, island"
    ),
    "xunpivot": (
        "SELECT l_orderkey, l_linenumber, measure, round(value, 4) AS value "
        "FROM (SELECT l_orderkey, l_linenumber, l_quantity, "
        "l_extendedprice, l_discount FROM lineitem WHERE l_orderkey < 1000) "
        "UNPIVOT (value FOR measure IN (l_quantity, l_extendedprice, "
        "l_discount))"
    ),
    "xtransitions": (
        "WITH p AS (SELECT event_type AS from_type, "
        "lead(event_type) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS to_type FROM events), "
        "c AS (SELECT from_type, to_type, count(*) AS n FROM p "
        "WHERE to_type IS NOT NULL GROUP BY 1, 2) "
        "SELECT from_type, to_type, CAST(n AS BIGINT) AS n, "
        "round(n / sum(n) OVER (PARTITION BY from_type), 9) AS p FROM c"
    ),
    "xcorr_matrix": (
        "WITH c AS (SELECT * FROM (VALUES "
        "('l_quantity', 1), ('l_extendedprice', 2), ('l_discount', 3), "
        "('l_tax', 4)) v(name, idx)), "
        "vals AS (SELECT l_quantity AS v1, l_extendedprice AS v2, "
        "l_discount AS v3, l_tax AS v4 FROM lineitem) "
        "SELECT a.name AS col_a, b.name AS col_b, "
        "round(CASE "
        "WHEN a.idx = 1 AND b.idx = 1 THEN (SELECT corr(v1, v1) FROM vals) "
        "WHEN a.idx = 1 AND b.idx = 2 THEN (SELECT corr(v1, v2) FROM vals) "
        "WHEN a.idx = 1 AND b.idx = 3 THEN (SELECT corr(v1, v3) FROM vals) "
        "WHEN a.idx = 1 AND b.idx = 4 THEN (SELECT corr(v1, v4) FROM vals) "
        "WHEN a.idx = 2 AND b.idx = 2 THEN (SELECT corr(v2, v2) FROM vals) "
        "WHEN a.idx = 2 AND b.idx = 3 THEN (SELECT corr(v2, v3) FROM vals) "
        "WHEN a.idx = 2 AND b.idx = 4 THEN (SELECT corr(v2, v4) FROM vals) "
        "WHEN a.idx = 3 AND b.idx = 3 THEN (SELECT corr(v3, v3) FROM vals) "
        "WHEN a.idx = 3 AND b.idx = 4 THEN (SELECT corr(v3, v4) FROM vals) "
        "WHEN a.idx = 4 AND b.idx = 4 THEN (SELECT corr(v4, v4) FROM vals) "
        "END, 6) AS corr "
        "FROM c a JOIN c b ON a.idx <= b.idx"
    ),
    "xquantile_bins": (
        "WITH sub AS (SELECT l_orderkey, l_linenumber, l_extendedprice, "
        "l_orderkey * 10 + l_linenumber AS tb FROM lineitem "
        "WHERE l_orderkey < 2500) "
        "SELECT l_orderkey, l_linenumber, "
        "round(l_extendedprice, 4) AS price, "
        "CAST(ntile(10) OVER (ORDER BY l_extendedprice, tb) AS BIGINT) "
        "AS bin FROM sub"
    ),
    "xstandardize": (
        "WITH st AS (SELECT event_type, avg(value) AS mu, "
        "stddev_samp(value) AS sd FROM events GROUP BY event_type) "
        "SELECT event_id, e.event_type, round(value, 6) AS value, "
        "round(CASE WHEN sd > 0 THEN (value - mu) / sd END, 6) AS value_z "
        "FROM events e JOIN st USING (event_type)"
    ),
    "xskipgram": (
        "WITH t AS (SELECT string_split_regex(trim(lower(text)), '\\s+') "
        "AS toks FROM documents), "
        "bg AS (SELECT z[1] AS w1, z[2] AS w2 FROM (SELECT unnest(list_zip(toks[:len(toks)-1], toks[2:])) AS z FROM t WHERE len(toks) >= 2) UNION ALL SELECT z[1] AS w1, z[2] AS w2 FROM (SELECT unnest(list_zip(toks[:len(toks)-2], toks[3:])) AS z FROM t WHERE len(toks) >= 3) UNION ALL SELECT z[1] AS w1, z[2] AS w2 FROM (SELECT unnest(list_zip(toks[:len(toks)-3], toks[4:])) AS z FROM t WHERE len(toks) >= 4)), "
        "uni AS (SELECT unnest(toks) AS w FROM t), "
        "uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w), "
        "nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM uni), "
        "bt AS (SELECT CAST(count(*) AS DOUBLE) AS b FROM bg), "
        "bc AS (SELECT w1, w2, count(*) AS n_pair FROM bg GROUP BY 1, 2 "
        "HAVING count(*) >= 10) "
        "SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair, "
        "round(ln((n_pair / bt.b) / ((u1.c / nt.n) * (u2.c / nt.n))), 6) "
        "AS pmi "
        "FROM bc JOIN uc u1 ON bc.w1 = u1.w JOIN uc u2 ON bc.w2 = u2.w "
        "CROSS JOIN nt CROSS JOIN bt "
        "ORDER BY pmi DESC, w1, w2 LIMIT 100"
    ),
    "xcollocations": (
        "WITH t AS (SELECT string_split_regex(trim(lower(text)), '\\s+') "
        "AS toks FROM documents), "
        "bg AS (SELECT z[1] AS w1, z[2] AS w2 FROM (SELECT "
        "unnest(list_zip(toks[:len(toks)-1], toks[2:])) AS z FROM t "
        "WHERE len(toks) >= 2)), "
        "uni AS (SELECT unnest(toks) AS w FROM t), "
        "uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w), "
        "nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM uni), "
        "bt AS (SELECT CAST(count(*) AS DOUBLE) AS b FROM bg), "
        "bc AS (SELECT w1, w2, count(*) AS n_pair FROM bg GROUP BY 1, 2 "
        "HAVING count(*) >= 5) "
        "SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair, "
        "round(ln((n_pair / bt.b) / ((u1.c / nt.n) * (u2.c / nt.n))), 6) "
        "AS pmi "
        "FROM bc JOIN uc u1 ON bc.w1 = u1.w JOIN uc u2 ON bc.w2 = u2.w "
        "CROSS JOIN nt CROSS JOIN bt "
        "ORDER BY pmi DESC, w1, w2 LIMIT 100"
    ),
    "xoutliers": (
        "WITH med AS (SELECT event_type, "
        "round(quantile_cont(value, 0.5), 6) AS m "
        "FROM events GROUP BY event_type), "
        "j AS (SELECT e.event_id, e.event_type, e.value, med.m "
        "FROM events e JOIN med USING (event_type)), "
        "mad AS (SELECT event_type, "
        "round(quantile_cont(abs(value - m), 0.5), 6) AS d "
        "FROM j GROUP BY event_type) "
        "SELECT j.event_id, j.event_type, round(j.value, 6) AS value, "
        + _fhu("0.6745 * (j.value - j.m) / mad.d", 4) + " "
        "AS mscore "
        "FROM j JOIN mad USING (event_type) "
        "WHERE mad.d > 0 AND abs(0.6745 * (j.value - j.m) / mad.d) > 3.5"
    ),
    "xhistogram": (
        "WITH b AS (SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo, "
        "CAST(max(l_extendedprice) AS DOUBLE) AS hi FROM lineitem), "
        "binned AS (SELECT l_returnflag, CAST(least(19, "
        "floor((CAST(l_extendedprice AS DOUBLE) - lo) / ((hi - lo) / 20))) "
        "AS BIGINT) AS bin, count(*) AS n "
        "FROM lineitem CROSS JOIN b GROUP BY 1, 2), "
        "grid AS (SELECT l_returnflag, i AS bin FROM "
        "(SELECT DISTINCT l_returnflag FROM lineitem) "
        "CROSS JOIN range(0, 20) t(i)) "
        "SELECT g.l_returnflag, g.bin, "
        "round(b.lo + g.bin * ((b.hi - b.lo) / 20), 6) AS bin_lo, "
        "round(b.lo + (g.bin + 1) * ((b.hi - b.lo) / 20), 6) AS bin_hi, "
        "CAST(coalesce(binned.n, 0) AS BIGINT) AS n "
        "FROM grid g CROSS JOIN b LEFT JOIN binned "
        "ON g.l_returnflag = binned.l_returnflag AND g.bin = binned.bin"
    ),
    "xscd2": (
        "WITH ledger AS (SELECT event_id AS off, "
        "CAST(event_id % 4 AS INT) AS op, ts AS event_time, "
        "user_id, event_type, value FROM events WHERE user_id < 200), "
        "w AS (SELECT *, lead(event_time) OVER "
        "(PARTITION BY user_id ORDER BY off) AS next_et FROM ledger) "
        "SELECT off, user_id, event_type, round(value, 2) AS value, "
        "epoch_us(event_time) AS valid_from_us, "
        "epoch_us(CASE WHEN next_et IS NOT NULL "
        "THEN greatest(next_et, event_time) END) AS valid_to_us, "
        "(next_et IS NULL) AS is_current "
        "FROM w WHERE op NOT IN (1, 2)"
    ),
    "xrollup_time": (
        "SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us, event_type, "
        "count(*) AS n_events, "
        "CAST(SUM(CAST(round((value)*1000000) AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_value, "
        "count(DISTINCT user_id) AS n_users "
        "FROM events GROUP BY 1, 2"
    ),
    "xrollup_gapfill": (
        "WITH r AS (SELECT date_trunc('hour', ts) AS b, event_type, "
        "count(*) AS n FROM events WHERE user_id < 50 GROUP BY 1, 2), "
        "bounds AS (SELECT min(b) AS lo, max(b) AS hi FROM r), "
        "grid AS (SELECT g.b, t.event_type FROM "
        "(SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS b "
        "FROM bounds) g CROSS JOIN "
        "(SELECT DISTINCT event_type FROM r) t) "
        "SELECT epoch_us(grid.b) AS bucket_us, grid.event_type, "
        "CAST(coalesce(r.n, 0) AS BIGINT) AS n_events, "
        "r.b IS NULL AS gap_filled FROM grid LEFT JOIN r "
        "ON grid.b = r.b AND grid.event_type = r.event_type"
    ),
    "xfunnel": (
        "WITH e AS (SELECT user_id, event_type, ts FROM events), "
        "u1 AS (SELECT user_id, min(ts) AS t1 FROM e "
        "WHERE event_type = 'view' GROUP BY user_id), "
        "u2 AS (SELECT e.user_id, min(ts) AS t2, min(t1) AS t1 FROM e "
        "JOIN u1 USING (user_id) WHERE event_type = 'click' "
        "AND ts > t1 AND ts <= t1 + INTERVAL 72 HOUR GROUP BY e.user_id), "
        "u3 AS (SELECT e.user_id, min(ts) AS t3 FROM e "
        "JOIN u2 USING (user_id) WHERE event_type = 'purchase' "
        "AND ts > t2 AND ts <= t1 + INTERVAL 72 HOUR GROUP BY e.user_id) "
        "SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type, "
        "count(*) AS n_users FROM u1 "
        "UNION ALL SELECT 2, 'click', count(*) FROM u2 "
        "UNION ALL SELECT 3, 'purchase', count(*) FROM u3"
    ),
    "xretention": (
        "WITH f AS (SELECT user_id, min(date_trunc('week', ts)) AS cohort "
        "FROM events GROUP BY user_id), "
        "a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS tb "
        "FROM events) "
        "SELECT epoch_us(f.cohort) AS cohort_us, "
        "CAST(date_diff('day', f.cohort, a.tb) / 7 AS BIGINT) AS period, "
        "count(*) AS n_users FROM a JOIN f USING (user_id) "
        "GROUP BY 1, 2"
    ),
    "xsessionize": (
        "WITH flagged AS (SELECT user_id, ts, event_id, "
        "CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800 THEN 1 ELSE 0 END "
        "AS new_sess FROM events WHERE user_id < 100 "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "sess AS (SELECT user_id, ts, "
        "CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS session_id FROM flagged) "
        "SELECT user_id, session_id, count(*) AS n_events, "
        "CAST((epoch_ms(max(ts)) - epoch_ms(min(ts))) // 1000 AS BIGINT) "
        "AS duration_sec FROM sess GROUP BY user_id, session_id"
    ),
    "xpivot": (
        "SELECT user_id, "
        "count(*) FILTER (event_type = 'click') AS click, "
        "count(*) FILTER (event_type = 'view') AS view, "
        "count(*) FILTER (event_type = 'purchase') AS purchase, "
        "count(*) FILTER (event_type = 'signup') AS signup, "
        "count(*) FILTER (event_type = 'error') AS error "
        "FROM events WHERE user_id < 100 GROUP BY user_id"
    ),
    "xdedup_exact": (
        # global dedup (the operator is corpus-wide): survivors are the
        # lowest-id row per normalized text, counted by the SURVIVOR's
        # lang — a per-lang DISTINCT would double-count texts duplicated
        # across languages (first diverges at sf0.1)
        "SELECT lang, count(*) AS n_docs FROM ("
        "SELECT lang, row_number() OVER (PARTITION BY "
        "trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) "
        "ORDER BY doc_id) AS rn FROM documents) WHERE rn = 1 GROUP BY lang"
    ),
    "xdedup_ngram_jaccard": (
        "WITH toks AS (SELECT doc_id, lang, "
        f"{_NORM_TOKENS} AS tok FROM documents WHERE doc_id < 400) "
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, round(j, 6) AS jaccard "
        "FROM (SELECT a.doc_id, a.tok, a.lang FROM toks a) a "
        "JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id, "
        "LATERAL (SELECT CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE) / "
        "(len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok))) AS j) "
        "WHERE j >= 0.55"
    ),
    "xdedup_paragraph": (
        "WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300), "
        "p AS (SELECT doc_id, unnest(string_split(text, ' the ')) AS para, "
        "generate_subscripts(string_split(text, ' the '), 1) AS pos FROM d), "
        "kept AS (SELECT doc_id, para, pos, row_number() OVER "
        "(PARTITION BY para ORDER BY doc_id, pos) AS rn FROM p), "
        "re AS (SELECT doc_id, string_agg(para, ' the ' ORDER BY pos) AS text "
        "FROM kept WHERE rn = 1 GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(re.text, '') AS text "
        "FROM d LEFT JOIN re ON d.doc_id = re.doc_id"
    ),
    "xdedup_spans": _span_oracle(k=8, removal=False),
    "xdedup_span_removal": _span_oracle(k=8, removal=True),
    "xdedup_lines": (
        "WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300), "
        "p AS (SELECT doc_id, unnest(string_split(text, ' the ')) AS line, "
        "generate_subscripts(string_split(text, ' the '), 1) AS pos FROM d), "
        "f AS (SELECT line FROM p GROUP BY line "
        "HAVING count(DISTINCT doc_id) >= 3), "
        "kept AS (SELECT doc_id, line, pos FROM p "
        "WHERE line NOT IN (SELECT line FROM f)), "
        "re AS (SELECT doc_id, string_agg(line, ' the ' ORDER BY pos) AS text "
        "FROM kept GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(re.text, '') AS text "
        "FROM d LEFT JOIN re USING (doc_id)"
    ),
    "xdedup_cc_incremental": (
        # full-closure replay: if the engine's three-tick incremental
        # fold diverges from the from-scratch components of ALL pairs,
        # the (node, component) hash goes red
        "WITH RECURSIVE toks AS (SELECT doc_id, lang, "
        f"{_NORM_TOKENS} AS tok FROM documents WHERE doc_id < 300), "
        "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM toks a "
        "JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id "
        "WHERE CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE) / "
        "(len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok))) >= 0.6), "
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs "
        "UNION SELECT id_b, id_a FROM pairs), "
        "nodes AS (SELECT DISTINCT src AS node FROM edges), "
        "reach AS (SELECT node, node AS r FROM nodes "
        "UNION SELECT e.src, reach.r FROM edges e "
        "JOIN reach ON e.dst = reach.node) "
        "SELECT node, min(r) AS component FROM reach GROUP BY node"
    ),
    "xdedup_cluster": (
        "WITH RECURSIVE toks AS (SELECT doc_id, lang, "
        f"{_NORM_TOKENS} AS tok FROM documents WHERE doc_id < 300), "
        "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM toks a "
        "JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id "
        "WHERE CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE) / "
        "(len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok))) >= 0.6), "
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs "
        "UNION SELECT id_b, id_a FROM pairs), "
        "nodes AS (SELECT DISTINCT src AS node FROM edges), "
        "reach AS (SELECT node, node AS r FROM nodes "
        "UNION SELECT e.src, reach.r FROM edges e "
        "JOIN reach ON e.dst = reach.node), "
        "comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node), "
        "losers AS (SELECT node FROM comp WHERE node != component) "
        "SELECT lang, count(*) AS n_docs FROM documents "
        "WHERE doc_id < 300 AND doc_id NOT IN (SELECT node FROM losers) "
        "GROUP BY lang"
    ),
    "xsnapshot_diff": (
        "WITH o AS (SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderkey % 5 != 0), "
        "n AS (SELECT o_orderkey, o_totalprice + CASE WHEN "
        "o_orderkey % 3 = 0 THEN 1.0 ELSE 0.0 END AS o_totalprice "
        "FROM orders WHERE o_orderkey % 7 != 0), "
        "j AS (SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k, "
        "o.o_orderkey AS ok, n.o_orderkey AS nk, "
        "o.o_totalprice AS op_, n.o_totalprice AS np "
        "FROM o FULL JOIN n ON o.o_orderkey = n.o_orderkey) "
        "SELECT CAST(0 AS INT) AS op, CAST(0 AS INT) AS __half, "
        "k AS o_orderkey, np AS o_totalprice FROM j WHERE ok IS NULL "
        "UNION ALL SELECT CAST(1 AS INT), CAST(0 AS INT), k, op_ "
        "FROM j WHERE nk IS NULL "
        "UNION ALL SELECT CAST(2 AS INT), CAST(0 AS INT), k, op_ "
        "FROM j WHERE ok IS NOT NULL AND nk IS NOT NULL "
        "AND op_ IS DISTINCT FROM np "
        "UNION ALL SELECT CAST(3 AS INT), CAST(1 AS INT), k, np "
        "FROM j WHERE ok IS NOT NULL AND nk IS NOT NULL "
        "AND op_ IS DISTINCT FROM np"
    ),
    "xdedup_canonical": (
        "WITH RECURSIVE toks AS (SELECT doc_id, lang, "
        f"{_NORM_TOKENS} AS tok FROM documents WHERE doc_id < 300), "
        "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM toks a "
        "JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id "
        "WHERE CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE) / "
        "(len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok))) >= 0.6), "
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs "
        "UNION SELECT id_b, id_a FROM pairs), "
        "nodes AS (SELECT DISTINCT src AS node FROM edges), "
        "reach AS (SELECT node, node AS r FROM nodes "
        "UNION SELECT e.src, reach.r FROM edges e "
        "JOIN reach ON e.dst = reach.node), "
        "comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node), "
        "sel AS (SELECT comp.node, comp.component, d.n_chars "
        "FROM comp JOIN documents d ON comp.node = d.doc_id), "
        "losers AS (SELECT node FROM (SELECT node, row_number() OVER ("
        "PARTITION BY component ORDER BY n_chars DESC, node) AS rn FROM sel) "
        "WHERE rn > 1) "
        "SELECT lang, count(*) AS n_docs, "
        "CAST(sum(doc_id) AS BIGINT) AS id_sum FROM documents "
        "WHERE doc_id < 300 AND doc_id NOT IN (SELECT node FROM losers) "
        "GROUP BY lang"
    ),
    "xhybrid_rrf": (
        "WITH tok AS (SELECT doc_id, "
        "len(string_split_regex(trim(lower(text)), '\\s+')) AS dl, "
        "unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t "
        "FROM documents), "
        "m AS (SELECT doc_id, t, count(*) AS tf, any_value(dl) AS dl "
        "FROM tok WHERE t IN ('hash', 'merge', 'stream', 'vector') "
        "GROUP BY doc_id, t), "
        "st AS (SELECT CAST(count(*) AS DOUBLE) AS n, "
        "avg(len(string_split_regex(trim(lower(text)), '\\s+'))) AS avgdl "
        "FROM documents), "
        "dfq AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM m GROUP BY t), "
        "bm AS (SELECT doc_id, "
        "sum(ln(1.0 + (n - df + 0.5) / (df + 0.5)) "
        "* tf * (1.2 + 1.0) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))"
        ") AS score FROM m JOIN dfq USING (t) CROSS JOIN st GROUP BY doc_id), "
        "s AS (SELECT doc_id, CAST(row_number() OVER ("
        "ORDER BY " + _fhu("score", 4) + " DESC, doc_id) "
        "AS BIGINT) AS sparse_rank FROM bm), "
        "q AS (SELECT CAST(embedding AS DOUBLE[]) AS emb_d "
        "FROM embeddings WHERE vec_id = 0), "
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb_d "
        "FROM embeddings), "
        "dn AS (SELECT vec_id AS doc_id, cosine FROM ("
        "SELECT e.vec_id, round(list_dot_product(e.emb_d, q.emb_d) / "
        "(sqrt(list_dot_product(e.emb_d, e.emb_d)) * "
        "sqrt(list_dot_product(q.emb_d, q.emb_d))), 6) AS cosine "
        "FROM e, q) ORDER BY cosine DESC, doc_id LIMIT 50), "
        "d AS (SELECT doc_id, CAST(row_number() OVER ("
        "ORDER BY " + _fhu("cosine", 4) + " DESC, doc_id) "
        "AS BIGINT) AS dense_rank FROM dn), "
        "f AS (SELECT doc_id, sparse_rank, dense_rank, "
        + _fhu(
            "(coalesce(1.0 / (60 + sparse_rank), 0) + "
            "coalesce(1.0 / (60 + dense_rank), 0))",
            6,
        )
        + " AS rrf_score "
        "FROM s FULL JOIN d USING (doc_id)) "
        "SELECT doc_id, sparse_rank, dense_rank, rrf_score, rank FROM ("
        "SELECT *, CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) "
        "AS BIGINT) AS rank FROM f) WHERE rank <= 10"
    ),
    "xdedup_embcos": _embcos_srp_oracle(
        threshold=0.4, num_bands=8, bits_per_band=4
    ),
    "xsim_quantize": _quantize_oracle(),
    "xsim_quantized_topk": _quantized_topk_oracle(k=10, rerank=4),
    "xsim_topk_brute": (
        "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS emb_d "
        "FROM embeddings WHERE vec_id = 0), "
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb_d FROM embeddings) "
        "SELECT vec_id, cosine FROM ("
        "SELECT e.vec_id, round(list_dot_product(e.emb_d, q.emb_d) / "
        "(sqrt(list_dot_product(e.emb_d, e.emb_d)) * "
        "sqrt(list_dot_product(q.emb_d, q.emb_d))), 6) AS cosine "
        "FROM e, q) ORDER BY cosine DESC, vec_id LIMIT 10"
    ),
    "xsim_ivf": (
        "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS emb_d "
        "FROM embeddings WHERE vec_id = 0), "
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb_d FROM embeddings) "
        "SELECT vec_id, cosine FROM ("
        "SELECT e.vec_id, round(list_dot_product(e.emb_d, q.emb_d) / "
        "(sqrt(list_dot_product(e.emb_d, e.emb_d)) * "
        "sqrt(list_dot_product(q.emb_d, q.emb_d))), 6) AS cosine "
        "FROM e, q) ORDER BY cosine DESC, vec_id LIMIT 10"
    ),
    "xtext_langid": (
        "SELECT doc_id, lang, CASE "
        + " ".join(
            f"WHEN {_hits(lang)} = m AND m > 0 THEN '{lang}'"
            for lang in ("de", "en", "es", "fr")
        )
        + " ELSE 'und' END AS pred_lang FROM documents, "
        f"LATERAL (SELECT greatest({_hits('de')}, {_hits('en')}, "
        f"{_hits('es')}, {_hits('fr')}) AS m)"
    ),
    "xtext_quality": (
        "WITH f AS (SELECT doc_id, CAST(length(text) AS DOUBLE) AS nc, "
        f"CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE) AS nt, "
        "CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS np, "
        f"CAST({_hits('de')} + {_hits('en')} + {_hits('es')} + {_hits('fr')} "
        "AS DOUBLE) AS ns FROM documents) "
        "SELECT doc_id, CAST(nc AS BIGINT) AS n_chars, CAST(nt AS BIGINT) AS n_tokens, "
        "round(CASE WHEN nc > 0 THEN np / nc ELSE 0.0 END, 6) AS punct_ratio, "
        "round(CASE WHEN nt > 0 THEN ns / nt ELSE 0.0 END, 6) AS stopword_ratio, "
        "round(0.3 * least(nt / 20.0, 1.0) "
        "+ 0.3 * least((CASE WHEN nt > 0 THEN ns / nt ELSE 0.0 END) * 5.0, 1.0) "
        "+ 0.2 * (CASE WHEN (CASE WHEN nt > 0 THEN (nc - (nt - 1)) / nt ELSE 0.0 END) "
        "BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) "
        "+ 0.2 * greatest(0.0, 1.0 - (CASE WHEN nc > 0 THEN np / nc ELSE 0.0 END) "
        "* 5.0), 6) AS quality FROM f"
    ),
    "xtext_tokens": (
        "SELECT doc_id, "
        "CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) "
        "AS n_ws_tokens, "
        "CAST(len(regexp_extract_all(text, '\\w{1,4}|[^\\w\\s]')) AS BIGINT) "
        "AS n_bpe_tokens FROM documents"
    ),
    "xsource_overlap": (
        "WITH u AS (SELECT text, source FROM documents "
        "UNION ALL SELECT text, 'mirror' AS source FROM documents "
        "WHERE doc_id % 7 = 0), "
        "h AS (SELECT DISTINCT source, "
        "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS hh "
        "FROM u WHERE text IS NOT NULL), "
        "tot AS (SELECT source, count(*) AS n FROM h GROUP BY source), "
        "p AS (SELECT a.source AS src_a, b.source AS src_b, "
        "count(*) AS n_shared FROM h a JOIN h b "
        "ON a.hh = b.hh AND a.source < b.source GROUP BY 1, 2) "
        "SELECT p.src_a, p.src_b, CAST(p.n_shared AS BIGINT) AS n_shared, "
        "CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b, "
        + _fhu(
            "CAST(p.n_shared AS DOUBLE) / (ta.n + tb.n - p.n_shared)",
            4,
        )
        + " AS jaccard "
        "FROM p JOIN tot ta ON p.src_a = ta.source "
        "JOIN tot tb ON p.src_b = tb.source"
    ),
    "xtok_fertility": (
        "WITH c AS (SELECT lang, "
        "CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) "
        "AS w, "
        "CAST(len(regexp_extract_all(text, '\\w{1,4}|[^\\w\\s]')) AS BIGINT) "
        "AS s, CAST(strlen(text) AS BIGINT) AS b FROM documents) "
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(w) AS BIGINT) AS n_words, "
        "CAST(sum(s) AS BIGINT) AS n_subwords, "
        "CAST(sum(b) AS BIGINT) AS n_bytes, "
        + _fhu("CAST(sum(s) AS DOUBLE) / sum(w)", 4) + " "
        "AS fertility, "
        + _fhu("CAST(sum(b) AS DOUBLE) / sum(s)", 4) + " "
        "AS bytes_per_subword FROM c GROUP BY lang"
    ),
    "xdecontaminate": (
        "WITH sh AS (SELECT doc_id, unnest(list_distinct(list_transform("
        "generate_series(1, greatest(1, len(t) - 2)), "
        "i -> array_to_string(t[i:i+2], ' ')))) AS s FROM "
        "(SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t "
        "FROM documents)), "
        "bench AS (SELECT DISTINCT s FROM sh WHERE doc_id >= 450), "
        "ov AS (SELECT sh.doc_id, count(*) AS n FROM sh JOIN bench USING (s) "
        "WHERE sh.doc_id < 400 GROUP BY sh.doc_id) "
        "SELECT d.doc_id, CAST(coalesce(ov.n, 0) AS BIGINT) AS n_overlaps, "
        "coalesce(ov.n, 0) >= 3 AS contaminated FROM documents d "
        "LEFT JOIN ov ON d.doc_id = ov.doc_id WHERE d.doc_id < 400"
    ),
    "xdecontaminate_13": (
        "WITH sh AS (SELECT doc_id, unnest(list_distinct(list_transform("
        "generate_series(1, greatest(1, len(t) - 12)), "
        "i -> array_to_string(t[i:i+12], ' ')))) AS s FROM "
        "(SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t "
        "FROM documents)), "
        "bench AS (SELECT DISTINCT s FROM sh WHERE doc_id >= 450), "
        "ov AS (SELECT sh.doc_id, count(*) AS n FROM sh JOIN bench USING (s) "
        "WHERE sh.doc_id < 400 GROUP BY sh.doc_id) "
        "SELECT d.doc_id, CAST(coalesce(ov.n, 0) AS BIGINT) AS n_overlaps, "
        "coalesce(ov.n, 0) >= 1 AS contaminated FROM documents d "
        "LEFT JOIN ov ON d.doc_id = ov.doc_id WHERE d.doc_id < 400"
    ),
    "xdecontaminate_fuzzy": _fuzzy_decon_oracle(threshold=0.5),
    "xtext_repetition": (
        "WITH tq AS (SELECT doc_id, "
        "string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents) "
        "SELECT doc_id, round(CASE WHEN total > 0 THEN 1 - dn / total "
        "ELSE 0.0 END, 6) AS rep_ratio FROM tq, "
        "LATERAL (SELECT list_transform(generate_series(1, "
        "greatest(1, len(t) - 2)), i -> array_to_string(t[i:i+2], ' ')) AS sh), "
        "LATERAL (SELECT CAST(len(sh) AS DOUBLE) AS total, "
        "CAST(len(list_distinct(sh)) AS DOUBLE) AS dn)"
    ),
    "xtext_redact_pii": (
        "SELECT doc_id, regexp_replace(regexp_replace(regexp_replace("
        "substring(text, 1, 20) || ' contact user' || CAST(doc_id AS VARCHAR) "
        "|| '@example.com at 192.168.0.' || CAST(doc_id % 255 AS VARCHAR) "
        "|| ' or +1 (555) 123-4567', "
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
        "'\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'), "
        "'\\+?\\d[\\d\\s().-]{7,}\\d', '<PHONE>', 'g') AS redacted "
        "FROM documents"
    ),
    "xtext_fingerprint": (
        "SELECT doc_id, md5(array_to_string(list_sort("
        f"{_NORM_TOKENS}), ' ')) AS fp FROM documents"
    ),
    "xasof_join": (
        "WITH clicks AS (SELECT event_id, user_id, ts FROM events "
        "WHERE event_type = 'click'), "
        "purchases AS (SELECT user_id, ts, max(event_id) AS purchase_event_id "
        "FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) "
        "SELECT c.event_id, c.user_id, p.purchase_event_id "
        "FROM clicks c ASOF JOIN purchases p "
        "ON c.user_id = p.user_id AND c.ts >= p.ts"
    ),
}

# The distributed interleave twin is hash-checked against the SAME
# serial-window SQL: the two modes are bit-identical by contract, so a
# shared oracle makes the driver prove it per-round.
ORACLES["xinterleave_dist"] = ORACLES["xinterleave"]

ORACLES["xledger_compact"] = (
    # 'offset' is a reserved word in DuckDB — the ledger offset travels
    # as 'o' inside the oracle (output column names are what must match)
    "WITH l AS (SELECT event_id AS o, CAST(event_id % 4 AS INT) AS op, "
    "user_id FROM events), "
    "h AS (SELECT max(o) // 2 AS h FROM l), "
    "old AS (SELECT o, op, user_id, row_number() OVER ("
    "PARTITION BY user_id ORDER BY o DESC) AS rn "
    "FROM l, h WHERE o <= h.h), "
    "keep AS (SELECT o, op, user_id FROM old WHERE rn = 1 "
    "UNION ALL SELECT o, op, user_id FROM l, h WHERE o > h.h) "
    "SELECT op, count(*) AS n_rows, CAST(sum(o) AS BIGINT) AS off_sum, "
    "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
    "FROM keep GROUP BY op"
)

ORACLES["xsample_weighted_group"] = (
    "WITH h AS (SELECT doc_id, lang, n_chars, "
    "CAST(n_chars AS DOUBLE) AS w, "
    "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
    "string_split(CAST(doc_id AS VARCHAR) || '#0', ''), "
    "ch -> CAST(ascii(ch) AS BIGINT))), "
    "(a, b) -> (a * 31 + b) % 2147483647) AS hv "
    "FROM documents WHERE n_chars > 0), "
    "k AS (SELECT doc_id, lang, n_chars, "
    + _fhu("ln((hv + 1) / 2147483648.0) / w", 9) + " AS akey FROM h) "
    "SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars FROM ("
    "SELECT *, row_number() OVER (PARTITION BY lang "
    "ORDER BY akey DESC, doc_id) AS rn FROM k) WHERE rn <= 50"
)

ORACLES["xtext_truncate"] = (
    "WITH s AS (SELECT doc_id, "
    "string_split_regex(trim(text), '\\s+') AS toks FROM documents), "
    "c AS (SELECT doc_id, toks, list_slice(toks, 1, 25) AS kept FROM s) "
    "SELECT doc_id, CAST(len(kept) AS BIGINT) AS n_tokens_kept, "
    "len(toks) > 25 AS was_truncated, "
    "md5(array_to_string(kept, ' ')) AS trunc_md5 FROM c"
)

ORACLES["xcorpus_card"] = (
    "WITH c AS (SELECT source, lang, "
    "len(string_split_regex(trim(lower(text)), '\\s+')) AS tc, "
    "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h "
    "FROM documents) "
    "SELECT source, lang, count(*) AS n_docs, "
    "CAST(sum(tc) AS BIGINT) AS n_tokens, "
    + _fhu("CAST(sum(tc) AS DOUBLE) / count(*)", 2) + " "
    "AS avg_tokens, "
    + _fhu(
        "CAST(sum(CASE WHEN tc < 20 THEN 1 ELSE 0 END) AS DOUBLE) "
        "/ count(*)",
        4,
    )
    + " AS pct_short, "
    "CAST(count(DISTINCT h) AS BIGINT) AS n_distinct_texts, "
    + _fhu(
        "(1.0 - CAST(count(DISTINCT h) AS DOUBLE) / count(*))", 4
    )
    + " AS dup_rate "
    "FROM c GROUP BY source, lang"
)

ORACLES["xdedup_cross"] = (
    "WITH n AS (SELECT doc_id, lang, "
    "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h "
    "FROM documents), "
    "ref AS (SELECT DISTINCT h FROM n WHERE doc_id < 200), "
    "keep AS (SELECT doc_id, lang FROM n x WHERE doc_id >= 200 "
    "AND NOT EXISTS (SELECT 1 FROM ref WHERE ref.h = x.h)) "
    "SELECT lang, count(*) AS n_docs, "
    "CAST(sum(doc_id) AS BIGINT) AS id_sum FROM keep GROUP BY lang"
)


ORACLES["xpipeline_curate"] = (
    "WITH n AS (SELECT doc_id, lang, text, "
    "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h "
    "FROM documents), "
    "ref AS (SELECT DISTINCT h FROM n WHERE doc_id < 200), "
    "surv AS (SELECT doc_id, lang, text FROM n x WHERE doc_id >= 200 "
    "AND NOT EXISTS (SELECT 1 FROM ref WHERE ref.h = x.h)), "
    "tr AS (SELECT doc_id, lang, "
    "CAST(len(list_slice(string_split_regex(trim(text), '\\s+'), 1, 64)) "
    "AS BIGINT) AS kept FROM surv), "
    "g AS (SELECT *, " + _poly_shard_sql("doc_id", 4) + " AS shard "
    "FROM tr WHERE kept >= 10), "
    "p AS (SELECT lang, shard, doc_id, kept, CAST(FLOOR("
    "(SUM(kept) OVER (PARTITION BY lang, shard ORDER BY doc_id) - kept) "
    "/ 512.0) AS BIGINT) AS chunk FROM g) "
    "SELECT lang, shard, chunk, count(*) AS n_docs, "
    "CAST(SUM(kept) AS BIGINT) AS n_tokens, "
    "CAST(SUM(doc_id) AS BIGINT) AS id_sum "
    "FROM p GROUP BY lang, shard, chunk"
)


def _dsir_ctes(buckets: int = 512, lam: float = 0.5) -> str:
    """Shared DuckDB CTE chain twin of the DSIR scoring + Gumbel-key
    stages (:func:`operators.sampling.dsir_scores` / ``dsir_sample``)
    on the src1-vs-rest split: same poly-hash buckets, same 1e-9
    fixed-point log-ratios and Gumbel terms, so the integer scores and
    the exact draw reproduce. Ends at ``k`` (doc_id, lang, source,
    dsir_score, gk); composed by the ``xdsir_sample`` / ``xdsir_diag``
    / ``xpipeline_dsir`` oracles."""
    poly_ng = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
        "string_split(ng, ''), ch -> CAST(ascii(ch) AS BIGINT))), "
        "(a, b) -> (a * 31 + b) % 2147483647)"
    )
    poly_id = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
        "string_split(CAST(doc_id AS VARCHAR) || '#0', ''), "
        "ch -> CAST(ascii(ch) AS BIGINT))), "
        "(a, b) -> (a * 31 + b) % 2147483647)"
    )
    lb = lam * buckets
    return (
        "tk AS (SELECT doc_id, lang, source, "
        "string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents), "
        "bg AS (SELECT doc_id, lang, source, "
        "list_transform(generate_series(1, greatest(len(t) - 1, 0)), "
        "i -> t[i] || ' ' || t[i + 1]) AS ngs FROM tk), "
        "tng AS (SELECT unnest(ngs) AS ng FROM bg WHERE source = 'src1'), "
        "rng AS (SELECT unnest(ngs) AS ng FROM bg WHERE source <> 'src1'), "
        f"tb AS (SELECT {poly_ng} % {buckets} AS b, count(*) AS c "
        "FROM tng GROUP BY 1), "
        f"rb AS (SELECT {poly_ng} % {buckets} AS b, count(*) AS c "
        "FROM rng GROUP BY 1), "
        "tt AS (SELECT CAST(COALESCE(sum(c), 0) AS DOUBLE) AS tot FROM tb), "
        "rt AS (SELECT CAST(COALESCE(sum(c), 0) AS DOUBLE) AS tot FROM rb), "
        f"grid AS (SELECT unnest(generate_series(0, {buckets - 1})) AS b), "
        "lr AS (SELECT grid.b, CAST(floor(("
        f"ln((COALESCE(tb.c, 0) + {lam}) / (tt.tot + {lb})) - "
        f"ln((COALESCE(rb.c, 0) + {lam}) / (rt.tot + {lb})"
        ")) * 1000000000.0 + 0.5) AS BIGINT) AS lri "
        "FROM grid LEFT JOIN tb ON grid.b = tb.b "
        "LEFT JOIN rb ON grid.b = rb.b CROSS JOIN tt CROSS JOIN rt), "
        "docng AS (SELECT doc_id, unnest(ngs) AS ng FROM bg "
        "WHERE source <> 'src1'), "
        "ds AS (SELECT doc_id, CAST(sum(lr.lri) AS BIGINT) AS score "
        f"FROM docng JOIN lr ON {poly_ng} % {buckets} = lr.b "
        "GROUP BY doc_id), "
        "sc AS (SELECT d.doc_id, d.lang, d.source, "
        "COALESCE(ds.score, 0) AS dsir_score FROM documents d "
        "LEFT JOIN ds ON d.doc_id = ds.doc_id WHERE d.source <> 'src1'), "
        "k AS (SELECT *, dsir_score + CAST(floor("
        f"-ln(-ln((({poly_id}) + 1) / 2147483649.0)) "
        "* 1000000000.0 + 0.5) AS BIGINT) AS gk FROM sc)"
    )


ORACLES["xdsir_sample"] = (
    "WITH " + _dsir_ctes() + " "
    "SELECT doc_id, lang, source, dsir_score FROM ("
    "SELECT *, row_number() OVER (ORDER BY gk DESC, doc_id) AS rn "
    "FROM k) WHERE rn <= 150"
)

ORACLES["xdsir_diag"] = (
    "WITH " + _dsir_ctes() + ", "
    "m AS (SELECT lang, doc_id, dsir_score, "
    "max(dsir_score) OVER (PARTITION BY lang) AS mx, "
    "row_number() OVER (PARTITION BY lang "
    "ORDER BY dsir_score DESC, doc_id) AS rn FROM k), "
    "wgt AS (SELECT lang, doc_id, dsir_score, rn, "
    "exp((dsir_score - mx) / 1000000000.0) AS w FROM m) "
    "SELECT lang, count(*) AS n_docs, "
    + _fhu(
        "CAST(sum(dsir_score) AS DOUBLE) / count(*) / 1000000000.0", 4
    )
    + " AS mean_lw, "
    + _fhu("sum(w) * sum(w) / sum(w * w)", 2) + " AS ess, "
    + _fhu("sum(w) * sum(w) / sum(w * w) / count(*)", 4) + " AS ess_ratio, "
    + _fhu(
        "sum(CASE WHEN rn <= 10 THEN w ELSE 0 END) / sum(w)", 4
    )
    + " AS topk_share "
    "FROM wgt GROUP BY lang"
)

ORACLES["xngram_novelty"] = (
    "WITH tk AS (SELECT doc_id, lang, "
    "string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents), "
    "bg AS (SELECT doc_id, lang, "
    "list_transform(generate_series(1, greatest(len(t) - 1, 0)), "
    "i -> t[i] || ' ' || t[i + 1]) AS ngs FROM tk), "
    "ref AS (SELECT DISTINCT unnest(ngs) AS ng FROM bg WHERE doc_id < 200), "
    "docng AS (SELECT doc_id, unnest(ngs) AS ng FROM bg "
    "WHERE doc_id >= 200), "
    "cnt AS (SELECT d.doc_id, count(*) AS n_ngrams, "
    "sum(CASE WHEN r.ng IS NULL THEN 1 ELSE 0 END) AS n_novel "
    "FROM docng d LEFT JOIN ref r ON d.ng = r.ng GROUP BY d.doc_id) "
    "SELECT b.doc_id, b.lang, "
    "CAST(COALESCE(c.n_ngrams, 0) AS BIGINT) AS n_ngrams, "
    "CAST(COALESCE(c.n_novel, 0) AS BIGINT) AS n_novel, "
    "CASE WHEN COALESCE(c.n_ngrams, 0) = 0 THEN CAST(1 AS DOUBLE) "
    "ELSE " + _fhu("CAST(c.n_novel AS DOUBLE) / c.n_ngrams", 4) + " END AS novelty "
    "FROM bg b LEFT JOIN cnt c ON b.doc_id = c.doc_id WHERE b.doc_id >= 200"
)

ORACLES["xcurriculum"] = (
    "WITH d AS (SELECT doc_id, lang, "
    "CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) "
    "AS tc, CAST(length(trim(text)) AS BIGINT) AS ln FROM documents), "
    "sc AS (SELECT doc_id, lang, tc, "
    + _fhu("CAST(ln AS DOUBLE) / tc", 4) + " AS diff FROM d), "
    "st AS (SELECT lang, tc, diff, ntile(4) OVER (PARTITION BY lang "
    "ORDER BY diff ASC, doc_id ASC) AS stage FROM sc) "
    "SELECT lang, CAST(stage AS INTEGER) AS stage, "
    "CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(tc) AS BIGINT) AS n_tokens, "
    "min(diff) AS min_diff, max(diff) AS max_diff "
    "FROM st GROUP BY lang, stage"
)

# Chained-CTE oracle for the 3-stage curate→rebalance→schedule pipeline:
# quality CTE reused verbatim from the xtext_quality oracle, mixture cut
# reproduced from the xmix_budget oracle (poly bucket of doc_id||'#0'),
# ntile staging from the xcurriculum oracle — one hash over the result.
ORACLES["xpipeline_curriculum"] = (
    "WITH q AS (" + ORACLES["xtext_quality"] + "), "
    "c AS (SELECT d.lang, d.doc_id, "
    "CAST(len(string_split_regex(trim(lower(d.text)), '\\s+')) AS BIGINT) "
    "AS cost, CAST(length(trim(d.text)) AS BIGINT) AS ln, "
    "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
    "string_split(CAST(d.doc_id AS VARCHAR) || '#0', ''), "
    "ch -> CAST(ascii(ch) AS BIGINT))), "
    "(a, b) -> (a * 31 + b) % 2147483647) % 10000 AS bkt "
    "FROM documents d JOIN q ON d.doc_id = q.doc_id "
    "WHERE q.quality >= 0.7), "
    "s AS (SELECT lang, sum(cost) AS tok FROM c GROUP BY lang), "
    "w(lang, w) AS (VALUES ('de', 0.25), ('en', 0.25), ('fr', 0.25), "
    "('zh', 0.25)), "
    "cuts AS (SELECT lang, CAST(floor(round("
    "least(1.0, 12000.0 * w / tok) * 10000, 6)) AS BIGINT) AS cut "
    "FROM s JOIN w USING (lang)), "
    "m AS (SELECT c.* FROM c JOIN cuts USING (lang) WHERE bkt < cut), "
    "st AS (SELECT *, " + _fhu("CAST(ln AS DOUBLE) / cost", 4) + " AS diff FROM m), "
    "st2 AS (SELECT *, ntile(4) OVER (PARTITION BY lang "
    "ORDER BY diff ASC, doc_id ASC) AS stage FROM st) "
    "SELECT lang, CAST(stage AS INTEGER) AS stage, "
    "CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(cost) AS BIGINT) AS n_tokens, "
    "CAST(sum(doc_id) AS BIGINT) AS id_sum, "
    "min(diff) AS min_diff, max(diff) AS max_diff "
    "FROM st2 GROUP BY lang, stage"
)


def _pack_efficiency_oracle(budgets: list[int], shards: int = 4) -> str:
    base = (
        "c AS (SELECT doc_id, lang, "
        "CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) "
        "AS cost, " + _poly_shard_sql("doc_id", shards) + " AS shard "
        "FROM documents)"
    )
    parts = []
    for b in budgets:
        parts.append(
            f"(SELECT CAST({b} AS BIGINT) AS budget, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(count(DISTINCT (lang, shard, chunk)) AS BIGINT) "
            "AS n_chunks, CAST(sum(cost) AS BIGINT) AS total_cost, "
            + _fhu(
                "CAST(sum(cost) AS DOUBLE) / "
                f"(count(DISTINCT (lang, shard, chunk)) * {b})",
                4,
            )
            + " AS efficiency FROM ("
            "SELECT lang, shard, cost, CAST(FLOOR("
            "(SUM(cost) OVER (PARTITION BY lang, shard ORDER BY doc_id) "
            f"- cost) / {b}.0) AS BIGINT) AS chunk FROM c "
            f"WHERE cost <= {b}))"
        )
    return "WITH " + base + " " + " UNION ALL ".join(parts)


ORACLES["xpack_efficiency"] = _pack_efficiency_oracle([256, 512, 1024, 2048])

ORACLES["xpipeline_dsir"] = (
    "WITH " + _dsir_ctes() + ", "
    "sel AS (SELECT doc_id, lang FROM ("
    "SELECT *, row_number() OVER (ORDER BY gk DESC, doc_id) AS rn "
    "FROM k) WHERE rn <= 400), "
    "tr AS (SELECT s.doc_id, s.lang, "
    "CAST(len(list_slice(string_split_regex(trim(d.text), '\\s+'), 1, 96)) "
    "AS BIGINT) AS kept FROM sel s JOIN documents d ON s.doc_id = d.doc_id), "
    "g AS (SELECT *, " + _poly_shard_sql("doc_id", 4) + " AS shard "
    "FROM tr), "
    "p AS (SELECT lang, shard, doc_id, kept, CAST(FLOOR("
    "(SUM(kept) OVER (PARTITION BY lang, shard ORDER BY doc_id) - kept) "
    "/ 512.0) AS BIGINT) AS chunk FROM g) "
    "SELECT lang, shard, chunk, count(*) AS n_docs, "
    "CAST(SUM(kept) AS BIGINT) AS n_tokens, "
    "CAST(SUM(doc_id) AS BIGINT) AS id_sum "
    "FROM p GROUP BY lang, shard, chunk"
)


ORACLES["xpack_ffd_stats"] = (
    "WITH c AS (SELECT lang, doc_id, "
    "CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) "
    "AS cost, " + _poly_shard_sql("doc_id", 8) + " AS shard "
    "FROM documents) "
    "SELECT lang, shard, "
    "CAST(count(CASE WHEN cost <= 512 THEN 1 END) AS BIGINT) AS n_rows, "
    "CAST(COALESCE(sum(CASE WHEN cost <= 512 THEN cost END), 0) AS BIGINT) "
    "AS total_cost, "
    "CAST(count(CASE WHEN cost > 512 THEN 1 END) AS BIGINT) AS n_oversize, "
    "CAST(1 AS BIGINT) AS capacity_ok, "
    "CAST(1 AS BIGINT) AS bins_lb_ok, "
    "CAST(1 AS BIGINT) AS bins_ub_ok "
    "FROM c GROUP BY lang, shard"
)


ORACLES["xdebounce"] = (
    "WITH k AS (SELECT event_type, event_id, "
    "CASE WHEN lag(epoch(ts)) OVER w IS NULL "
    "OR epoch(ts) - lag(epoch(ts)) OVER w > 600 THEN 1 ELSE 0 END AS keep "
    "FROM events WHERE user_id < 200 "
    "WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)) "
    "SELECT event_type, count(*) AS n_events, "
    "CAST(sum(event_id) AS BIGINT) AS id_sum FROM k WHERE keep = 1 "
    "GROUP BY event_type"
)


# reuse the langid CASE expression verbatim: the eval oracle IS the
# langid oracle grouped into a confusion matrix
ORACLES["xlangid_eval"] = (
    "WITH p AS (" + ORACLES["xtext_langid"] + "), "
    "g AS (SELECT lang, pred_lang, count(*) AS n "
    "FROM p GROUP BY lang, pred_lang) "
    "SELECT lang, pred_lang, CAST(n AS BIGINT) AS n, "
    + _fhu(
        "CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY lang)", 4
    )
    + " AS rate FROM g"
)

ORACLES["xdedup_report"] = _minhash_report_oracle()

ORACLES["xvocab_coverage"] = (
    "WITH tok AS (SELECT unnest(string_split_regex(trim(lower(text)), "
    "'\\s+')) AS token FROM documents), "
    "c AS (SELECT token, count(*) AS freq FROM tok GROUP BY token), "
    "tot AS (SELECT CAST(sum(freq) AS DOUBLE) AS total FROM c), "
    "top AS (SELECT token, freq FROM c ORDER BY freq DESC, token LIMIT 50) "
    "SELECT token, CAST(freq AS BIGINT) AS freq, "
    "CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rank, "
    + _fhu(
        "sum(freq) OVER (ORDER BY freq DESC, token "
        "ROWS UNBOUNDED PRECEDING) / total",
        6,
    )
    + " AS cum_share FROM top, tot"
)


def _repetition_report_oracle(
    top_ns: tuple = (2, 3), dup_ns: tuple = (5, 10)
) -> str:
    """Oracle for ``xtext_repetition_report``: replays the line stats
    in list functions and, per n, the (doc, gram) counts with the same
    deterministic argmax (count desc, gram asc via QUALIFY) and the
    same repeated-gram char loads — all integer until the final
    half-up divisions."""
    ctes = [
        "WITH tq AS (SELECT doc_id, coalesce(text, '') AS tx, "
        "string_split_regex(trim(lower(text)), '\\s+') AS t "
        "FROM documents)",
        # line stats: Spark splits on the regex '\n'
        "ls AS (SELECT doc_id, length(tx) AS tlen, "
        "string_split_regex(tx, '\\n') AS lines FROM tq)",
        "lstat AS (SELECT doc_id, tlen, len(lines) AS nl, "
        "len(list_distinct(lines)) AS nd, "
        "CAST(coalesce(list_sum(list_transform(lines, "
        "l -> length(l))), 0) AS BIGINT) AS tot, "
        "CAST(coalesce(list_sum(list_transform(list_distinct(lines), "
        "l -> length(l))), 0) AS BIGINT) AS dst FROM ls)",
    ]
    sel = [
        "lstat.doc_id",
        "CASE WHEN nl > 0 THEN "
        + _fhu("(nl - nd) / CAST(nl AS DOUBLE)", 6)
        + " ELSE 0.0 END AS dup_line_frac",
        "CASE WHEN tot > 0 THEN "
        + _fhu("(tot - dst) / CAST(tot AS DOUBLE)", 6)
        + " ELSE 0.0 END AS dup_line_char_frac",
    ]
    joins = []
    for n in sorted({*top_ns, *dup_ns}):
        # word n-grams: m = greatest(len(t) - n + 1, 0) grams (empty
        # for short docs — matches _word_ngrams, NOT word_shingles)
        ctes.append(
            f"g{n} AS (SELECT doc_id, unnest(list_transform("
            f"range(1, greatest(len(t) - {n - 1}, 0) + 1), "
            f"i -> array_to_string(t[i:i+{n - 1}], ' '))) AS g FROM tq)"
        )
        ctes.append(
            f"c{n} AS (SELECT doc_id, g, count(*) AS c FROM g{n} "
            "GROUP BY doc_id, g)"
        )
        if n in top_ns:
            ctes.append(
                f"t{n} AS (SELECT doc_id, CAST(c * length(g) AS BIGINT) "
                f"AS load FROM c{n} QUALIFY row_number() OVER ("
                "PARTITION BY doc_id ORDER BY c DESC, g ASC) = 1)"
            )
            joins.append(f"LEFT JOIN t{n} ON t{n}.doc_id = lstat.doc_id")
        if n in dup_ns:
            ctes.append(
                f"d{n} AS (SELECT doc_id, CAST(sum(CASE WHEN c >= 2 "
                "THEN c * length(g) ELSE 0 END) AS BIGINT) AS dupload "
                f"FROM c{n} GROUP BY doc_id)"
            )
            joins.append(f"LEFT JOIN d{n} ON d{n}.doc_id = lstat.doc_id")
    for n in sorted(top_ns):
        sel.append(
            _fhu(
                f"least(CAST(coalesce(t{n}.load, 0) AS DOUBLE) "
                "/ greatest(tlen, 1), 1.0)",
                6,
            )
            + f" AS top_{n}gram_char_frac"
        )
    for n in sorted(dup_ns):
        sel.append(
            _fhu(
                f"least(CAST(coalesce(d{n}.dupload, 0) AS DOUBLE) "
                "/ greatest(tlen, 1), 1.0)",
                6,
            )
            + f" AS dup_{n}gram_char_frac"
        )
    return (
        ", ".join(ctes)
        + " SELECT "
        + ", ".join(sel)
        + " FROM lstat "
        + " ".join(joins)
    )


ORACLES["xtext_repetition_report"] = _repetition_report_oracle()

ORACLES["xsource_tvd"] = (
    "WITH tok AS (SELECT source AS src, "
    "unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token "
    "FROM documents), "
    "vocab AS (SELECT token FROM (SELECT token, count(*) AS freq "
    "FROM tok GROUP BY token) ORDER BY freq DESC, token LIMIT 500), "
    "counts AS (SELECT src, token, CAST(count(*) AS BIGINT) AS c "
    "FROM tok JOIN vocab USING (token) GROUP BY src, token), "
    "tot AS (SELECT src, CAST(sum(c) AS BIGINT) AS t FROM counts "
    "GROUP BY src), "
    "pairs AS (SELECT x.src AS src_a, x.t AS ta, y.src AS src_b, "
    "y.t AS tb FROM tot x JOIN tot y ON x.src < y.src), "
    "legs AS ("
    "SELECT p.src_a, p.src_b, p.ta, p.tb, c.token, c.c AS ca, "
    "CAST(0 AS BIGINT) AS cb FROM pairs p JOIN counts c ON c.src = p.src_a "
    "UNION ALL "
    "SELECT p.src_a, p.src_b, p.ta, p.tb, c.token, CAST(0 AS BIGINT), c.c "
    "FROM pairs p JOIN counts c ON c.src = p.src_b), "
    "pertok AS (SELECT src_a, src_b, ta, tb, token, "
    "CAST(sum(ca) AS BIGINT) AS ca, CAST(sum(cb) AS BIGINT) AS cb "
    "FROM legs GROUP BY src_a, src_b, ta, tb, token), "
    "agg AS (SELECT src_a, src_b, ta, tb, "
    "CAST(sum(abs(ca * tb - cb * ta)) AS BIGINT) AS num FROM pertok "
    "GROUP BY src_a, src_b, ta, tb) "
    "SELECT src_a, src_b, ta AS n_tokens_a, tb AS n_tokens_b, "
    + _fhu(
        "CAST(num AS DOUBLE) / (2.0 * CAST(ta AS DOUBLE) "
        "* CAST(tb AS DOUBLE))",
        6,
    )
    + " AS tvd FROM agg"
)

# norm = scale² · dim = 10000² · 64; centroid floor division spells out
# the negative branch (DuckDB // truncates toward zero, Python // floors)
ORACLES["xcentroid_shift"] = (
    "WITH e AS (SELECT CAST(label AS BIGINT) AS grp, vec_id, "
    "list_transform(CAST(embedding AS DOUBLE[]), "
    "x -> CAST(floor(x * CAST(10000.0 AS DOUBLE) + 0.5) AS BIGINT)) AS qv "
    "FROM embeddings), "
    "x AS (SELECT grp, vec_id, unnest(qv) AS v, "
    "generate_subscripts(qv, 1) AS j FROM e), "
    "s AS (SELECT grp, j, CAST(sum(v) AS BIGINT) AS s FROM x "
    "GROUP BY grp, j), "
    "nn AS (SELECT grp, CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(ss) AS BIGINT) AS ss FROM (SELECT grp, vec_id, "
    "list_sum(list_transform(qv, v -> v * v)) AS ss FROM e) "
    "GROUP BY grp), "
    "c AS (SELECT s.grp, j, s, CASE WHEN s >= 0 THEN s // n "
    "ELSE -((-s + n - 1) // n) END AS c FROM s JOIN nn USING (grp)), "
    "r AS (SELECT grp, CAST(sum(c * s) AS BIGINT) AS cs, "
    "CAST(sum(c * c) AS BIGINT) AS cc FROM c GROUP BY grp), "
    "st AS (SELECT nn.grp, nn.n, "
    "CAST(nn.ss - 2 * r.cs + nn.n * r.cc AS BIGINT) AS rnum "
    "FROM nn JOIN r USING (grp)), "
    "d AS (SELECT a.grp AS grp_a, b.grp AS grp_b, "
    "CAST(sum((a.c - b.c) * (a.c - b.c)) AS BIGINT) AS d2 "
    "FROM c a JOIN c b ON a.j = b.j AND a.grp < b.grp "
    "GROUP BY a.grp, b.grp) "
    "SELECT d.grp_a, d.grp_b, sa.n AS n_a, sb.n AS n_b, "
    + _fhu("CAST(d2 AS DOUBLE) / 6400000000.0", 6) + " "
    "AS shift2_norm, "
    + _fhu(
        "CAST(sa.rnum AS DOUBLE) / (CAST(sa.n AS DOUBLE) "
        "* 6400000000.0)",
        6,
    )
    + " AS radius2_a, "
    + _fhu(
        "CAST(sb.rnum AS DOUBLE) / (CAST(sb.n AS DOUBLE) "
        "* 6400000000.0)",
        6,
    )
    + " AS radius2_b "
    "FROM d JOIN st sa ON sa.grp = d.grp_a JOIN st sb ON sb.grp = d.grp_b"
)

# the Bloom path is EXACTLY flag_contaminated (no false negatives +
# exact verify), so the oracle replays the DIRECT exact rule at n=5 —
# the hash match proves the two-phase prefilter drops nothing
ORACLES["xdecontaminate_bloom"] = (
    "WITH sh AS (SELECT doc_id, unnest(list_distinct(list_transform("
    "generate_series(1, greatest(1, len(t) - 4)), "
    "i -> array_to_string(t[i:i+4], ' ')))) AS s FROM "
    "(SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t "
    "FROM documents)), "
    "bench AS (SELECT DISTINCT s FROM sh WHERE doc_id >= 450), "
    "ov AS (SELECT sh.doc_id, count(*) AS n FROM sh JOIN bench USING (s) "
    "WHERE sh.doc_id < 400 GROUP BY sh.doc_id) "
    "SELECT d.doc_id, CAST(coalesce(ov.n, 0) AS BIGINT) AS n_overlaps, "
    "coalesce(ov.n, 0) >= 1 AS contaminated FROM documents d "
    "LEFT JOIN ov ON d.doc_id = ov.doc_id WHERE d.doc_id < 400"
)


def _qsketch_merge_oracle(k: int = 256) -> str:
    """Oracle for ``xsketch_quantile_merge``: the BATCH hash-level
    sketch of the full lineitem stream (same salted poly hash, same
    trailing-zero level, same canonical threshold) — the merge fold on
    the Spark side must reproduce this retained set bit-for-bit."""
    hash_sql = _poly31_sql(
        "CAST(l_orderkey AS VARCHAR) || '-' || "
        "CAST(l_linenumber AS VARCHAR) || '#qsk'"
    )
    return (
        "WITH li AS (SELECT l_returnflag AS grp, "
        "CAST(l_quantity AS BIGINT) AS val, "
        "CAST(l_orderkey AS VARCHAR) || '-' || "
        "CAST(l_linenumber AS VARCHAR) AS rid, "
        f"{hash_sql} AS h FROM lineitem)"
        ", lv AS (SELECT grp, val, rid, CASE WHEN h = 0 THEN 31 "
        "ELSE CAST(bit_count(CAST((h & -h) - 1 AS BIGINT)) AS BIGINT) "
        "END AS lvl FROM li)"
        ", cnt AS (SELECT grp, lvl, count(*) AS c FROM lv GROUP BY 1, 2)"
        ", suf AS (SELECT grp, lvl, sum(c) OVER (PARTITION BY grp "
        "ORDER BY lvl DESC ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "CURRENT ROW) AS s FROM cnt)"
        f", thr AS (SELECT grp, CAST(coalesce(max(lvl) "
        f"FILTER (WHERE s > {k}) + 1, 0) AS BIGINT) AS thr "
        "FROM suf GROUP BY 1) "
        "SELECT l.grp, l.rid, l.val, l.lvl, t.thr FROM lv l "
        "JOIN thr t ON l.grp = t.grp WHERE l.lvl >= t.thr"
    )


ORACLES["xsketch_quantile_merge"] = _qsketch_merge_oracle()


def _cm_merge_oracle(depth: int = 4, width: int = 256, seed: int = 7) -> str:
    """Oracle for ``xsketch_cm_merge``: the one-shot Count-Min grid
    over the full corpus (same poly hash, same universal-family
    coefficients) — cell-wise identical to the Spark side's three-tick
    fold by counter associativity."""
    from kamu_engine_datafusion_spark.functions.columns import minhash_coeffs

    vals = ", ".join(
        f"({i}, {a}, {c})"
        for i, (a, c) in enumerate(minhash_coeffs(depth, seed))
    )
    return _BG_CTES + (
        f", coeff(i, a, b) AS (VALUES {vals})"
        f", h AS (SELECT {_poly31_sql('bg')} AS h FROM bgs)"
        ", grid AS (SELECT c.i, ((h.h * c.a + c.b) % 2147483647) "
        f"% {width} AS bucket, CAST(count(*) AS BIGINT) AS c "
        "FROM h CROSS JOIN coeff c GROUP BY 1, 2) "
        "SELECT CAST(i AS BIGINT) AS i, CAST(bucket AS BIGINT) AS bucket, "
        "c FROM grid"
    )


ORACLES["xsketch_cm_merge"] = _cm_merge_oracle()


# pigeonhole recall is guaranteed at Hamming <= num_blocks-1, so the
# blocked Spark result must equal this brute-force all-pairs scan; the
# Hamming distance sums popcounts of the two 32-bit halves (no signed
# 64-bit reassembly needed)
#: Shared DuckDB CTE prefix for the pHash twin corpus (the SQL twin of
#: ``_phash_twin_corpus``): fingerprints (hi, lo) of docs < 200 plus
#: their 2-bit-flipped twins at doc_id + 100000, as view ``u``.
_PHASH_TWIN_CTES = (
    "WITH m AS (SELECT doc_id, sha256(text) AS d1 FROM documents "
    "WHERE doc_id < 200), "
    "mm AS (SELECT doc_id, d1 || sha256(d1) AS hx FROM m), "
    "px AS (SELECT doc_id, i, "
    "CAST(('0x' || substr(hx, CAST(2 * i + 1 AS INT), 2)) AS INT) AS p "
    "FROM mm CROSS JOIN range(0, 64) r(i)), "
    "st AS (SELECT doc_id, avg(p) AS mean FROM px GROUP BY doc_id), "
    "bits AS (SELECT px.doc_id, i, "
    "CASE WHEN p > mean THEN 1 ELSE 0 END AS b "
    "FROM px JOIN st USING (doc_id)), "
    "v AS (SELECT doc_id, "
    "CAST(sum(CASE WHEN i >= 32 THEN CAST(b AS BIGINT) * "
    "(CAST(1 AS BIGINT) << CAST(i - 32 AS INT)) ELSE 0 END) AS BIGINT) "
    "AS hi, "
    "CAST(sum(CASE WHEN i < 32 THEN CAST(b AS BIGINT) * "
    "(CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END) AS BIGINT) AS lo "
    "FROM bits GROUP BY doc_id), "
    "tw AS (SELECT doc_id + 100000 AS doc_id, "
    "xor(hi, (CASE WHEN doc_id % 64 >= 32 THEN "
    "(CAST(1 AS BIGINT) << CAST(doc_id % 64 - 32 AS INT)) ELSE 0 END) + "
    "(CASE WHEN (doc_id + 31) % 64 >= 32 THEN "
    "(CAST(1 AS BIGINT) << CAST((doc_id + 31) % 64 - 32 AS INT)) "
    "ELSE 0 END)) AS hi, "
    "xor(lo, (CASE WHEN doc_id % 64 < 32 THEN "
    "(CAST(1 AS BIGINT) << CAST(doc_id % 64 AS INT)) ELSE 0 END) + "
    "(CASE WHEN (doc_id + 31) % 64 < 32 THEN "
    "(CAST(1 AS BIGINT) << CAST((doc_id + 31) % 64 AS INT)) "
    "ELSE 0 END)) AS lo FROM v), "
    "u AS (SELECT * FROM v UNION ALL SELECT * FROM tw)"
)

ORACLES["xmm_phash_neardup"] = (
    _PHASH_TWIN_CTES + " "
    "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
    "CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INT) "
    "AS hamming FROM u a JOIN u b ON a.doc_id < b.doc_id "
    "WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3"
)

ORACLES["xmm_phash_incremental"] = (
    _PHASH_TWIN_CTES + ", "
    # brute-force replay of the incremental path: index = ids < 100,
    # increment = the rest; any-index-match dies, lower-id-wins within
    "idx AS (SELECT * FROM u WHERE doc_id < 100), "
    "inc AS (SELECT * FROM u WHERE doc_id >= 100), "
    "dead AS (SELECT DISTINCT doc_id FROM ("
    "SELECT n.doc_id FROM inc n JOIN idx i ON "
    "bit_count(xor(n.hi, i.hi)) + bit_count(xor(n.lo, i.lo)) <= 3 "
    "UNION ALL "
    "SELECT b.doc_id FROM inc a JOIN inc b ON a.doc_id < b.doc_id "
    "AND bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3)) "
    "SELECT inc.doc_id AS media_id FROM inc "
    "WHERE inc.doc_id NOT IN (SELECT doc_id FROM dead)"
)


def _winsorize_sketch_oracle(
    k: int = 256, lower=(1, 10), upper=(9, 10)
) -> str:
    """Oracle for ``xwinsorize_sketch``: rebuilds the hash-level sketch
    (same CTEs as the quantile-sketch oracles), selects the cut points
    with the same integer rank arithmetic over (val, rid) order, and
    applies the same least/greatest clip — cut points AND clip are both
    hash-verified."""
    hash_sql = _poly31_sql(
        "CAST(l_orderkey AS VARCHAR) || '-' || "
        "CAST(l_linenumber AS VARCHAR) || '#qsk'"
    )
    lo_n, lo_d = lower
    hi_n, hi_d = upper
    return (
        "WITH li AS (SELECT l_returnflag AS grp, "
        "CAST(l_quantity AS BIGINT) AS val, "
        "CAST(l_orderkey AS VARCHAR) || '-' || "
        "CAST(l_linenumber AS VARCHAR) AS rid, "
        f"{hash_sql} AS h FROM lineitem)"
        ", lv AS (SELECT grp, val, rid, CASE WHEN h = 0 THEN 31 "
        "ELSE CAST(bit_count(CAST((h & -h) - 1 AS BIGINT)) AS BIGINT) "
        "END AS lvl FROM li)"
        ", cnt AS (SELECT grp, lvl, count(*) AS c FROM lv GROUP BY 1, 2)"
        ", suf AS (SELECT grp, lvl, sum(c) OVER (PARTITION BY grp "
        "ORDER BY lvl DESC ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "CURRENT ROW) AS s FROM cnt)"
        f", thr AS (SELECT grp, CAST(coalesce(max(lvl) "
        f"FILTER (WHERE s > {k}) + 1, 0) AS BIGINT) AS thr "
        "FROM suf GROUP BY 1)"
        ", ret AS (SELECT l.grp, l.rid, l.val FROM lv l "
        "JOIN thr t ON l.grp = t.grp WHERE l.lvl >= t.thr)"
        ", rk AS (SELECT grp, rid, val, row_number() OVER (PARTITION BY "
        "grp ORDER BY val, rid) AS rn, count(*) OVER (PARTITION BY grp) "
        "AS s FROM ret)"
        ", cuts AS (SELECT grp, "
        f"max(CASE WHEN rn = ({lo_n} * (s - 1)) // {lo_d} + 1 "
        "THEN val END) AS lo, "
        f"max(CASE WHEN rn = ({hi_n} * (s - 1)) // {hi_d} + 1 "
        "THEN val END) AS hi FROM rk GROUP BY grp) "
        "SELECT li.grp, li.rid, li.val, "
        "least(greatest(li.val, c.lo), c.hi) AS val_winsorized "
        "FROM li JOIN cuts c ON li.grp = c.grp"
    )


ORACLES["xwinsorize_sketch"] = _winsorize_sketch_oracle()


def _index_pairs_oracle() -> str:
    """Oracle for ``xdedup_index_pairs``: the same poly-hash signature
    / band-fold CTEs as ``_incremental_dedup_oracle``, emitting the
    verified EDGES — index-vs-new (id_a = indexed doc) plus new-vs-new
    (id_a < id_b) — instead of the survivor rollup."""
    from kamu_engine_datafusion_spark.functions.columns import (
        _MERSENNE_31 as M,
        _SHINGLE_PRIME as P,
        minhash_coeffs,
    )

    coeffs = minhash_coeffs(16, seed=42)
    mins = ", ".join(
        f"min((hv * {a} + {b}) % {M}) AS m{j}"
        for j, (a, b) in enumerate(coeffs)
    )
    bands = []
    for band in range(4):
        acc = "CAST(0 AS BIGINT)"
        for i in range(4):
            acc = f"(({acc}) * {P} + m{band * 4 + i}) % {M}"
        bands.append(
            f"SELECT doc_id, {band} AS bandpos, {acc} AS bandkey FROM sig"
        )
    bands_sql = " UNION ALL ".join(bands)
    est = (
        "("
        + " + ".join(
            f"CASE WHEN x.m{j} = y.m{j} THEN 1 ELSE 0 END" for j in range(16)
        )
        + ") / 16.0"
    )
    return (
        "WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300), "
        "tq AS (SELECT doc_id, string_split_regex(trim(lower(text)), "
        "'\\s+') AS t FROM d), "
        "shl AS (SELECT doc_id, list_distinct(list_transform("
        "generate_series(1, greatest(1, len(t) - 2)), "
        "i -> array_to_string(t[i:i+2], ' '))) AS shs FROM tq), "
        "sh AS (SELECT doc_id, unnest(shs) AS s FROM shl), "
        "h AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(string_split(s, ''), "
        "ch -> CAST(ascii(ch) AS BIGINT))), "
        f"(a, b) -> (a * 31 + b) % {M}) AS hv FROM sh), "
        f"sig AS (SELECT doc_id, {mins} FROM h GROUP BY doc_id), "
        f"bands AS ({bands_sql}), "
        "cand AS ("
        "SELECT DISTINCT i.doc_id AS id_a, n.doc_id AS id_b "
        "FROM bands n JOIN bands i ON n.bandpos = i.bandpos "
        "AND n.bandkey = i.bandkey "
        "WHERE n.doc_id >= 150 AND i.doc_id < 150 "
        "UNION "
        "SELECT DISTINCT a.doc_id, b.doc_id "
        "FROM bands a JOIN bands b ON a.bandpos = b.bandpos "
        "AND a.bandkey = b.bandkey "
        "WHERE a.doc_id >= 150 AND b.doc_id >= 150 "
        "AND a.doc_id < b.doc_id) "
        "SELECT c.id_a, c.id_b FROM cand c "
        "JOIN sig x ON x.doc_id = c.id_a JOIN sig y ON y.doc_id = c.id_b "
        f"WHERE {est} >= 0.7"
    )


ORACLES["xdedup_index_pairs"] = _index_pairs_oracle()


# merge-law keys score against the very oracle their batch twins use:
# the fold must equal the one-shot draw / the corpus-rescan statistics
ORACLES["xsample_weighted_merge"] = ORACLES["xsample_weighted_group"]
ORACLES["xbm25_incremental"] = ORACLES["xbm25"]

ORACLES["xlm_backoff"] = (
    # Stupid Backoff replay: exact BIGINT n-gram counts from the
    # doc_id < 250 reference, the same three-branch CASE, the same
    # float ops in the same order (alpha2 as 0.4 * 0.4 so both engines
    # compute the identical IEEE product)
    "WITH tq AS (SELECT doc_id, "
    "string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents), "
    "ref AS (SELECT * FROM tq WHERE doc_id < 250), "
    "uni AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM "
    "(SELECT unnest(t) AS w1 FROM ref) GROUP BY w1), "
    "big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM "
    "(SELECT t[i] AS w1, t[i + 1] AS w2 FROM ref, "
    "unnest(generate_series(1, len(t) - 1)) AS u(i)) GROUP BY w1, w2), "
    "tri AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c3 FROM "
    "(SELECT t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3 FROM ref, "
    "unnest(generate_series(1, len(t) - 2)) AS u(i)) "
    "GROUP BY w1, w2, w3), "
    "nv AS (SELECT CAST(sum(c1) AS BIGINT) AS n, "
    "CAST(count(*) AS BIGINT) AS v FROM uni), "
    "pos AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3 "
    "FROM tq, unnest(generate_series(1, len(t) - 2)) AS u(i)), "
    "sc AS (SELECT p.doc_id, "
    "CASE WHEN coalesce(tr.c3, 0) > 0 "
    "THEN ln(CAST(tr.c3 AS DOUBLE) / b12.c2) "
    "WHEN coalesce(b23.c2, 0) > 0 "
    "THEN ln(0.4 * CAST(b23.c2 AS DOUBLE) / u2.c1) "
    "ELSE ln((0.4 * 0.4) * CAST(coalesce(u3.c1, 0) + 1 AS DOUBLE) "
    "/ (nv.n + nv.v)) END AS ls "
    "FROM pos p "
    "LEFT JOIN tri tr ON tr.w1 = p.w1 AND tr.w2 = p.w2 AND tr.w3 = p.w3 "
    "LEFT JOIN big b12 ON b12.w1 = p.w1 AND b12.w2 = p.w2 "
    "LEFT JOIN big b23 ON b23.w1 = p.w2 AND b23.w2 = p.w3 "
    "LEFT JOIN uni u2 ON u2.w1 = p.w2 "
    "LEFT JOIN uni u3 ON u3.w1 = p.w3 "
    "CROSS JOIN nv), "
    "per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams, "
    + _fhu("sum(ls) / count(*)", 6) + " "
    "AS avg_logscore FROM sc GROUP BY doc_id) "
    "SELECT d.doc_id, coalesce(per.n_trigrams, 0) AS n_trigrams, "
    "per.avg_logscore FROM documents d LEFT JOIN per USING (doc_id)"
)

ORACLES["xdistinctive_tokens"] = (
    # Fightin' Words replay: exact counts, then the identical float
    # expression tree (a0 = (1/100)*N, prior = a0*y_all/N, the same
    # parenthesization as the Column expressions) and half-up 6dp
    "WITH tok AS (SELECT lang AS grp, "
    "unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token "
    "FROM documents), "
    "cnt AS (SELECT grp, token, CAST(count(*) AS BIGINT) AS y "
    "FROM tok GROUP BY grp, token), "
    "corpus AS (SELECT token, CAST(sum(y) AS BIGINT) AS y_all "
    "FROM cnt GROUP BY token), "
    "tot AS (SELECT grp, CAST(sum(y) AS BIGINT) AS n FROM cnt "
    "GROUP BY grp), "
    "al AS (SELECT (CAST(1 AS DOUBLE) / CAST(100 AS DOUBLE)) "
    "* CAST(sum(y) AS DOUBLE) AS a0, CAST(sum(y) AS DOUBLE) AS nd "
    "FROM cnt), "
    "grid AS (SELECT t.grp, c.token, "
    "CAST(coalesce(x.y, 0) AS BIGINT) AS y_in, c.y_all, t.n "
    "FROM tot t CROSS JOIN corpus c "
    "LEFT JOIN cnt x ON x.grp = t.grp AND x.token = c.token), "
    "g2 AS (SELECT grp, token, y_in, y_all, n, a0, nd, "
    "a0 * y_all / nd AS pr FROM grid CROSS JOIN al), "
    "g3 AS (SELECT grp, token, y_in, y_all, "
    "y_in + pr AS yi, (n + a0) - (y_in + pr) AS di, "
    "(y_all - y_in) + pr AS yj, "
    "((nd - n) + a0) - ((y_all - y_in) + pr) AS dj FROM g2), "
    "g4 AS (SELECT grp, token, y_in, "
    "CAST(y_all - y_in AS BIGINT) AS n_rest, "
    + _fhu(
        "(ln(yi / di) - ln(yj / dj)) / sqrt(1.0 / yi + 1.0 / yj)", 6
    )
    + " AS zeta FROM g3), "
    "r AS (SELECT *, row_number() OVER (PARTITION BY grp "
    "ORDER BY zeta DESC, token) AS rn FROM g4) "
    "SELECT grp, token, y_in AS n_in, n_rest, zeta FROM r WHERE rn <= 10"
)

ORACLES["xnegative_samples"] = (
    # hash-ring replay: h = (poly31(reverse(id)) * k_salt) mod M31 with
    # k_salt = (1103515245 * (0 + 1) + 12345) % M31 = 1103527590; ring
    # position within 8 hash shards, next-4 neighbors with wrap-around
    "WITH h AS (SELECT doc_id AS anchor, "
    "(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
    "string_split(reverse(CAST(doc_id AS VARCHAR)), ''), "
    "ch -> CAST(ascii(ch) AS BIGINT))), "
    "(a, b) -> (a * 31 + b) % 2147483647) * 1103527590) % 2147483647 "
    "AS hv FROM documents), "
    "r AS (SELECT anchor, hv, hv % 8 AS shard FROM h), "
    "rn AS (SELECT *, row_number() OVER (PARTITION BY shard "
    "ORDER BY hv, anchor) AS pos, "
    "count(*) OVER (PARTITION BY shard) AS n FROM r), "
    "s AS (SELECT anchor, shard, pos, n, "
    "unnest(generate_series(1, 4)) AS slot FROM rn), "
    "p AS (SELECT anchor, shard, slot, "
    "((pos - 1 + slot) % n) + 1 AS tpos FROM s) "
    "SELECT p.anchor, nb.anchor AS neg_id, CAST(p.slot AS BIGINT) AS slot "
    "FROM p JOIN rn nb ON nb.shard = p.shard AND nb.pos = p.tpos"
)

ORACLES["xurl_dedup"] = (
    # the synthesis arithmetic constructs the CANONICAL form directly
    # (the raw-url noise — case, ports, utm params, fragments, bare
    # slash — is definitionally what canonicalization removes)
    "WITH u AS (SELECT doc_id, doc_id % 120 AS g FROM documents), "
    "c AS (SELECT doc_id, "
    "(CASE WHEN g % 2 = 0 THEN 'https' ELSE 'http' END) || '://' || "
    "(CASE WHEN g % 3 = 0 THEN 'www.' ELSE '' END) || 'site' || "
    "CAST(g % 40 AS VARCHAR) || "
    "(CASE WHEN g % 4 = 0 THEN '.co.uk' WHEN g % 4 = 1 THEN '.com' "
    "WHEN g % 4 = 2 THEN '.org' ELSE '.io' END) || "
    "(CASE WHEN g % 5 = 0 THEN '' ELSE '/p/' || CAST(g % 9 AS VARCHAR) "
    "|| '?id=' || CAST(g % 7 AS VARCHAR) END) AS canon_url, "
    "'site' || CAST(g % 40 AS VARCHAR) || "
    "(CASE WHEN g % 4 = 0 THEN '.co.uk' WHEN g % 4 = 1 THEN '.com' "
    "WHEN g % 4 = 2 THEN '.org' ELSE '.io' END) AS domain FROM u) "
    "SELECT min(doc_id) AS doc_id, canon_url, domain FROM c "
    "GROUP BY canon_url, domain"
)

ORACLES["xdomain_cap"] = (
    # registered_domain from the synthesis arithmetic, cap_per_group's
    # keyed-hash order (poly31(id || '#0') % 10000, id), then the
    # corpus_card aggregate over the survivors
    "WITH u AS (SELECT doc_id, text, doc_id % 120 AS g FROM documents), "
    "dom AS (SELECT doc_id, text, 'site' || CAST(g % 40 AS VARCHAR) || "
    "(CASE WHEN g % 4 = 0 THEN '.co.uk' WHEN g % 4 = 1 THEN '.com' "
    "WHEN g % 4 = 2 THEN '.org' ELSE '.io' END) AS domain FROM u), "
    "b AS (SELECT *, "
    + _poly31_sql("CAST(doc_id AS VARCHAR) || '#0'")
    + " % 10000 AS bk FROM dom), "
    "r AS (SELECT *, row_number() OVER (PARTITION BY domain "
    "ORDER BY bk, doc_id) AS rn FROM b), "
    "k AS (SELECT domain, text FROM r WHERE rn <= 5), "
    "c AS (SELECT domain, "
    "len(string_split_regex(trim(lower(text)), '\\s+')) AS tc, "
    "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h "
    "FROM k) "
    "SELECT domain, count(*) AS n_docs, "
    "CAST(sum(tc) AS BIGINT) AS n_tokens, "
    + _fhu("CAST(sum(tc) AS DOUBLE) / count(*)", 2) + " "
    "AS avg_tokens, "
    + _fhu(
        "CAST(sum(CASE WHEN tc < 20 THEN 1 ELSE 0 END) AS DOUBLE) "
        "/ count(*)",
        4,
    )
    + " AS pct_short, "
    "CAST(count(DISTINCT h) AS BIGINT) AS n_distinct_texts, "
    + _fhu(
        "(1.0 - CAST(count(DISTINCT h) AS DOUBLE) / count(*))", 4
    )
    + " AS dup_rate "
    "FROM c GROUP BY domain"
)


def _top_pc_oracle(
    dim: int = 64,
    scale: int = 1000,
    v_scale: int = 1000,
    iters: int = 8,
    dp: int = 6,
) -> str:
    """DuckDB replay of ``top_principal_component``'s exact integer
    trajectory: quantize half-up, center with python-floor division
    (the negative-quotient branch spelled out — DuckDB ``//``
    truncates), the Knuth-mix init, ``iters`` unrolled MATERIALIZED
    power iterations with the L∞ floor-div normalize (HUGEINT inside
    the normalize so ``w·v_scale`` cannot overflow BIGINT mid-
    expression), the first-nonzero sign pin, and the one float
    division for var_share (half-up ``dp``)."""

    def pyfloor(a: str, b: str) -> str:
        # python // FLOORS; DuckDB // truncates toward zero
        return (
            f"(CASE WHEN ({a}) >= 0 THEN ({a}) // ({b}) "
            f"ELSE -((-({a}) + ({b}) - 1) // ({b})) END)"
        )

    parts = [
        "WITH q AS MATERIALIZED (SELECT vec_id, i AS j, "
        f"CAST(floor(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) "
        f"* {float(scale)} + 0.5) AS BIGINT) AS x "
        f"FROM embeddings CROSS JOIN range(0, {dim}) r(i)), "
        "cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings), "
        "cent AS (SELECT j, "
        + pyfloor("CAST(sum(x) AS BIGINT)", "(SELECT n FROM cnt)")
        + " AS c FROM q GROUP BY j), "
        "ctr AS MATERIALIZED (SELECT q.vec_id, q.j, q.x - c.c AS x "
        "FROM q JOIN cent c USING (j)), "
        f"v0 AS (SELECT j, (j * 2654435761) % {2 * v_scale + 1} "
        f"- {v_scale} AS v FROM range(0, {dim}) r(j))"
    ]
    for i in range(1, iters + 1):
        parts.append(
            f", s{i} AS MATERIALIZED (SELECT c.vec_id, "
            "CAST(sum(c.x * v.v) AS BIGINT) AS s "
            f"FROM ctr c JOIN v{i - 1} v USING (j) GROUP BY c.vec_id)"
            f", w{i} AS MATERIALIZED (SELECT c.j, "
            "CAST(sum(s.s * c.x) AS BIGINT) AS w "
            f"FROM ctr c JOIN s{i} s USING (vec_id) GROUP BY c.j)"
            f", m{i} AS (SELECT max(abs(w)) AS m FROM w{i})"
            f", v{i} AS MATERIALIZED (SELECT w.j, "
            "CAST(CASE WHEN m.m = 0 THEN v.v ELSE "
            + pyfloor(
                f"CAST(w.w AS HUGEINT) * {v_scale}", "CAST(m.m AS HUGEINT)"
            )
            + " END AS BIGINT) AS v "
            f"FROM w{i} w JOIN v{i - 1} v USING (j) CROSS JOIN m{i} m)"
        )
    parts.append(
        ", sgn AS (SELECT CASE WHEN coalesce((SELECT v FROM "
        f"v{iters} WHERE v <> 0 ORDER BY j LIMIT 1), 1) < 0 "
        "THEN -1 ELSE 1 END AS s), "
        f"vf AS MATERIALIZED (SELECT j, v * sg.s AS v FROM v{iters} "
        "CROSS JOIN sgn sg), "
        "sf AS (SELECT c.vec_id, CAST(sum(c.x * v.v) AS BIGINT) AS s "
        "FROM ctr c JOIN vf v USING (j) GROUP BY c.vec_id), "
        "fin AS (SELECT (SELECT CAST(sum(s * s) AS BIGINT) FROM sf) "
        "AS sv2, (SELECT CAST(sum(x * x) AS BIGINT) FROM ctr) AS tot, "
        "(SELECT CAST(sum(v * v) AS BIGINT) FROM vf) AS vv) "
        "SELECT v.j AS j, CAST(v.v AS BIGINT) AS v, "
        "(SELECT n FROM cnt) AS n_rows, "
        "CASE WHEN vv > 0 AND tot > 0 THEN "
        "floor(CAST(sv2 AS DOUBLE) / (CAST(vv AS DOUBLE) "
        f"* CAST(tot AS DOUBLE)) * {float(10 ** dp)} + 0.5) "
        f"/ {float(10 ** dp)} ELSE 0.0 END AS var_share "
        "FROM vf v CROSS JOIN fin"
    )
    return "".join(parts)


ORACLES["xtop_pc"] = _top_pc_oracle()


#: Shared CTE chain of the KMV oracles: md5-normalized text keys and
#: their salted poly31 KMV hashes (the exact Spark-side derivation:
#: ``_norm_md5`` → ``sketches._hash31(h || '#kmv')``).
def _kmv_hv_sql(src: str = "documents") -> str:
    return (
        f"nrm AS (SELECT doc_id, lang, "
        "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h "
        f"FROM {src})"
    )


def _kmv_rank_sql(rows_cte: str, k: int) -> str:
    """distinct (grp, hv) → per-group rank ≤ k: the KMV state rule."""
    poly = _poly31_sql("(h || '#kmv')")
    return (
        f"hvs AS (SELECT DISTINCT grp, {poly} "
        f"AS hv FROM {rows_cte} WHERE h IS NOT NULL), "
        "rk AS (SELECT grp, hv, row_number() OVER ("
        "PARTITION BY grp ORDER BY hv) AS rn FROM hvs)"
    )


def _kmv_est_case(k: int, dp: int = 4) -> str:
    """The kmv_estimate CASE: below-k exact, else half-up (k−1)/u_k."""
    return (
        f"CASE WHEN n_state < {k} THEN CAST(n_state AS DOUBLE) "
        f"ELSE floor({float(k - 1)} / ((hk + 1) / 2147483648.0) "
        f"* {float(10 ** dp)} + 0.5) / {float(10 ** dp)} END"
    )


ORACLES["xsketch_kmv"] = (
    "WITH " + _kmv_hv_sql() + ", "
    "g AS (SELECT lang AS grp, h FROM nrm), "
    + _kmv_rank_sql("g", 100) + ", "
    "st AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_state, "
    "max(hv) AS hk FROM rk WHERE rn <= 100 GROUP BY grp) "
    "SELECT grp, n_state, " + _kmv_est_case(100) + " AS dv_est FROM st"
)

ORACLES["xsketch_kmv_merge"] = (
    "WITH " + _kmv_hv_sql() + ", "
    "g AS (SELECT lang AS grp, h FROM nrm), "
    + _kmv_rank_sql("g", 100) + " "
    "SELECT grp, hv FROM rk WHERE rn <= 100"
)

ORACLES["xkmv_overlap"] = (
    "WITH " + _kmv_hv_sql() + ", "
    "g AS (SELECT 'all' AS grp, h FROM nrm "
    "UNION ALL SELECT 'even', h FROM nrm WHERE doc_id % 2 = 0 "
    "UNION ALL SELECT 'low', h FROM nrm WHERE doc_id < 250), "
    + _kmv_rank_sql("g", 128) + ", "
    "sk AS (SELECT grp, hv FROM rk WHERE rn <= 128), "
    "gs AS (SELECT DISTINCT grp FROM sk), "
    "pairs AS (SELECT a.grp AS grp_a, b.grp AS grp_b FROM gs a "
    "CROSS JOIN gs b WHERE a.grp <> b.grp), "
    "member AS (SELECT p.grp_a, p.grp_b, s.hv, "
    "max(CASE WHEN s.grp = p.grp_a THEN 1 ELSE 0 END) AS in_a, "
    "max(CASE WHEN s.grp = p.grp_b THEN 1 ELSE 0 END) AS in_b "
    "FROM sk s JOIN pairs p ON s.grp = p.grp_a OR s.grp = p.grp_b "
    "GROUP BY 1, 2, 3), "
    "tk AS (SELECT *, row_number() OVER (PARTITION BY grp_a, grp_b "
    "ORDER BY hv) AS rn FROM member), "
    "agg AS (SELECT grp_a, grp_b, "
    "CAST(sum(in_a) AS BIGINT) AS n_a_in_union, "
    "CAST(sum(CASE WHEN in_a + in_b = 2 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_both, CAST(count(*) AS BIGINT) AS n_union_sketch "
    "FROM tk WHERE rn <= 128 GROUP BY 1, 2) "
    "SELECT grp_a, grp_b, n_a_in_union, n_both, "
    "CASE WHEN n_a_in_union > 0 THEN "
    + _fhu("n_both / CAST(n_a_in_union AS DOUBLE)", 4) + " END AS containment_a_in_b, "
    "n_union_sketch, "
    + _fhu("n_both / CAST(n_union_sketch AS DOUBLE)", 4) + " AS jaccard_est FROM agg"
)

# The heavy-hitter oracle IS the direct rule — the CM-candidates +
# exact-verify path must equal it for ANY hash function (overestimate
# theorem: no false negatives; verify kills false positives).
ORACLES["xheavy_hitters"] = (
    _BG_CTES + ", "
    "tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bgs) "
    "SELECT bg AS bigram, CAST(count(*) AS BIGINT) AS freq, "
    "tot.n AS n_total FROM bgs, tot GROUP BY bg, tot.n "
    "HAVING count(*) >= (tot.n + 799) // 800"
)

ORACLES["xcorpus_card_maintained"] = (
    "WITH c AS (SELECT lang AS grp, "
    "len(string_split_regex(trim(lower(text)), '\\s+')) AS tc, "
    "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h "
    "FROM documents), "
    "scal AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(tc) AS BIGINT) AS n_tokens, "
    "CAST(sum(CASE WHEN tc < 20 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_short FROM c GROUP BY grp), "
    + _kmv_rank_sql("c", 100) + ", "
    "st AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_state, "
    "max(hv) AS hk FROM rk WHERE rn <= 100 GROUP BY grp), "
    "est AS (SELECT grp, n_state, " + _kmv_est_case(100)
    + " AS e FROM st) "
    "SELECT s.grp, s.n_docs, s.n_tokens, "
    + _fhu("s.n_tokens / CAST(s.n_docs AS DOUBLE)", 2) + " "
    "AS avg_tokens, "
    + _fhu("s.n_short / CAST(s.n_docs AS DOUBLE)", 4) + " AS pct_short, "
    "coalesce(e.e, 0.0) AS est_distinct_texts, "
    "CASE WHEN e.e IS NOT NULL THEN "
    + _fhu(
        "greatest(0.0, 1.0 - e.e / CAST(s.n_docs AS DOUBLE))", 4
    )
    + " END AS dup_rate_est, "
    "coalesce(e.n_state, 0) < 100 AS is_exact "
    "FROM scal s LEFT JOIN est e USING (grp)"
)

ORACLES["xhard_negatives"] = (
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, "
    "label FROM embeddings), "
    "q AS (SELECT vec_id AS qid, emb AS qe, label AS qlab FROM e "
    "WHERE vec_id < 5), "
    "s AS (SELECT q.qid AS anchor_id, e.vec_id AS neg_id, "
    "CAST(e.label AS BIGINT) AS neg_label, "
    "round(list_dot_product(e.emb, q.qe) / "
    "(sqrt(list_dot_product(e.emb, e.emb)) * "
    "sqrt(list_dot_product(q.qe, q.qe))), 4) AS cosine "
    "FROM e JOIN q ON e.label <> q.qlab AND e.vec_id <> q.qid) "
    "SELECT anchor_id, neg_id, neg_label, cosine, rank FROM ("
    "SELECT *, CAST(row_number() OVER (PARTITION BY anchor_id "
    "ORDER BY cosine DESC, neg_id) AS BIGINT) AS rank FROM s) "
    "WHERE rank <= 4"
)

ORACLES["xrater_kappa"] = (
    "WITH p AS (" + ORACLES["xtext_langid"] + "), "
    "cells AS (SELECT CAST(lang AS VARCHAR) AS a, "
    "CAST(pred_lang AS VARCHAR) AS b, "
    "CAST(count(*) AS BIGINT) AS n FROM p "
    "WHERE lang IS NOT NULL AND pred_lang IS NOT NULL GROUP BY 1, 2), "
    "tot AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_rows, "
    "CAST(coalesce(sum(CASE WHEN a = b THEN n END), 0) AS BIGINT) "
    "AS n_agree FROM cells), "
    "rt AS (SELECT a, CAST(sum(n) AS BIGINT) AS ra FROM cells "
    "GROUP BY a), "
    "ct AS (SELECT b, CAST(sum(n) AS BIGINT) AS cb FROM cells "
    "GROUP BY b), "
    "ch AS (SELECT CAST(coalesce(sum(ra * cb), 0) AS BIGINT) "
    "AS pe_num FROM rt JOIN ct ON rt.a = ct.b), "
    "r AS (SELECT n_rows, n_agree, "
    "CASE WHEN n_rows > 0 THEN n_agree / CAST(n_rows AS DOUBLE) END "
    "AS po, "
    "CASE WHEN n_rows > 0 THEN pe_num / CAST(n_rows * n_rows AS DOUBLE) "
    "END AS pe FROM tot CROSS JOIN ch) "
    "SELECT n_rows, n_agree, "
    + _fhu("po", 6) + " AS po, "
    + _fhu("pe", 6) + " AS pe, "
    + _fhu(
        "(CASE WHEN pe = 1.0 THEN (CASE WHEN po = 1.0 THEN 1.0 "
        "ELSE 0.0 END) ELSE (po - pe) / (1.0 - pe) END)",
        6,
    )
    + " AS kappa FROM r"
)


def _maintained_minhash_oracle() -> str:
    """Oracle for ``xminhash_index_maintained``: replays poly
    signatures, band-position-qualified fold keys, the 16-hash
    agreement estimate, and the three-tick fold chain — tick 0 dedups
    within itself (lower-id-wins, dead or alive), ticks 1–2 die on any
    match to an EARLIER-TICK SURVIVOR or any lower-id tick-mate — then
    emits every survivor's band rows with the signature CSV: the
    stored index state itself."""
    from kamu_engine_datafusion_spark.functions.columns import (
        _MERSENNE_31 as M,
        _SHINGLE_PRIME as P,
        minhash_coeffs,
    )

    coeffs = minhash_coeffs(16, seed=42)
    mins = ", ".join(
        f"min((hv * {a} + {b}) % {M}) AS m{j}"
        for j, (a, b) in enumerate(coeffs)
    )
    bands = []
    for band in range(4):
        acc = "CAST(0 AS BIGINT)"
        for i in range(4):
            acc = f"(({acc}) * {P} + m{band * 4 + i}) % {M}"
        bands.append(
            f"SELECT doc_id, {band} AS bandpos, {acc} AS bandkey FROM sig"
        )
    bands_sql = " UNION ALL ".join(bands)
    est = (
        "("
        + " + ".join(
            f"CASE WHEN x.m{j} = y.m{j} THEN 1 ELSE 0 END"
            for j in range(16)
        )
        + ") / 16.0"
    )
    sig_csv = " || ',' || ".join(
        f"CAST(g.m{j} AS VARCHAR)" for j in range(16)
    )
    return (
        "WITH d AS (SELECT doc_id, text FROM documents "
        "WHERE doc_id < 300), "
        "tq AS (SELECT doc_id, "
        "string_split_regex(trim(lower(text)), '\\s+') AS t FROM d), "
        "shl AS (SELECT doc_id, list_distinct(list_transform("
        "generate_series(1, greatest(1, len(t) - 2)), "
        "i -> array_to_string(t[i:i+2], ' '))) AS shs FROM tq), "
        "sh AS (SELECT doc_id, unnest(shs) AS s FROM shl), "
        "h AS (SELECT doc_id, list_reduce(list_prepend("
        "CAST(0 AS BIGINT), list_transform(string_split(s, ''), "
        f"ch -> CAST(ascii(ch) AS BIGINT))), "
        f"(a, b) -> (a * 31 + b) % {M}) AS hv FROM sh), "
        f"sig AS (SELECT doc_id, {mins} FROM h GROUP BY doc_id), "
        f"bands AS ({bands_sql}), "
        "mv AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb "
        "FROM bands a JOIN bands b ON a.bandpos = b.bandpos "
        "AND a.bandkey = b.bandkey AND a.doc_id < b.doc_id "
        "JOIN sig x ON x.doc_id = a.doc_id "
        "JOIN sig y ON y.doc_id = b.doc_id "
        f"WHERE {est} >= 0.7), "
        "s0 AS (SELECT doc_id FROM d WHERE doc_id < 100 "
        "AND doc_id NOT IN (SELECT idb FROM mv WHERE idb < 100)), "
        "s1 AS (SELECT doc_id FROM d WHERE doc_id >= 100 "
        "AND doc_id < 200 AND doc_id NOT IN ("
        "SELECT idb FROM mv WHERE idb >= 100 AND idb < 200 "
        "AND (ida IN (SELECT doc_id FROM s0) "
        "OR (ida >= 100 AND ida < 200)))), "
        "s2 AS (SELECT doc_id FROM d WHERE doc_id >= 200 "
        "AND doc_id NOT IN (SELECT idb FROM mv WHERE idb >= 200 "
        "AND (ida IN (SELECT doc_id FROM s0) "
        "OR ida IN (SELECT doc_id FROM s1) OR ida >= 200))), "
        "surv AS (SELECT doc_id FROM s0 UNION ALL "
        "SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2) "
        "SELECT b.doc_id, CAST(b.bandpos AS VARCHAR) || ':' || "
        "CAST(b.bandkey AS VARCHAR) AS band_key, "
        f"{sig_csv} AS sig_csv "
        "FROM bands b JOIN sig g ON g.doc_id = b.doc_id "
        "JOIN surv s ON s.doc_id = b.doc_id"
    )


ORACLES["xminhash_index_maintained"] = _maintained_minhash_oracle()


def _semdedup_inc_ctes(
    k: int = 8,
    dim: int = 64,
    scale: int = 10_000,
    sim_scale: int = 1_000,
    tau2_num: int = 2_025,
    tau2_den: int = 10_000,
    max_tick: int = 2,
) -> str:
    """Shared CTE chain of the ``xsemdedup_incremental`` /
    ``xann_semdedup_topk`` oracles — the xdedup_semantic oracle class
    applied to the incremental rule: quantized vectors, integer argmin
    over the frozen c0 centroids (first ``k`` by vec_id — the k-means
    init rule), the division-free BIGINT cosine² ≥ τ² pair test, and
    the three-tick kill chain (an increment row dies on any
    same-cluster match against an ACCUMULATED SURVIVOR from an earlier
    tick, or any lower-id same-tick match dead or alive — exactly
    ``semdedup_increment_against_index``'s rule). Ends at
    ``surv(vec_id, cluster, q2, n2)``."""
    dist = (
        f"CAST(list_sum(list_transform(range(0, {dim}), "
        "j -> (q.qv[j+1]-c.qv[j+1])*(q.qv[j+1]-c.qv[j+1]))) AS BIGINT)"
    )
    dot = (
        f"CAST(list_sum(list_transform(range(0, {dim}), "
        "j -> l.q2[j+1]*r.q2[j+1])) AS BIGINT)"
    )
    return (
        "WITH q AS (SELECT vec_id, "
        "list_transform(CAST(embedding AS DOUBLE[]), "
        f"x -> CAST(floor(CAST(x AS DOUBLE) * {float(scale)} + 0.5) "
        "AS BIGINT)) AS qv, "
        "list_transform(CAST(embedding AS DOUBLE[]), "
        f"x -> CAST(floor(CAST(x AS DOUBLE) * {float(sim_scale)} + 0.5) "
        "AS BIGINT)) AS q2 "
        "FROM embeddings), "
        "c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 "
        "AS BIGINT) AS cid, qv FROM (SELECT vec_id, qv FROM q "
        f"ORDER BY vec_id LIMIT {k})), "
        f"av AS (SELECT q.vec_id, q.q2, CAST(min({dist} * {k} + c.cid) "
        "AS BIGINT) AS enc FROM q, c0 c GROUP BY q.vec_id, q.q2), "
        f"fr AS (SELECT vec_id, vec_id % 3 AS tick, "
        f"CAST(enc % {k} AS BIGINT) AS cluster, q2, "
        "CAST(list_sum(list_transform(q2, x -> x * x)) AS BIGINT) AS n2 "
        "FROM av), "
        "e AS (SELECT ia, ta, ib, tb FROM ("
        "SELECT l.vec_id AS ia, l.tick AS ta, r.vec_id AS ib, "
        f"r.tick AS tb, {dot} AS dot, l.n2 AS ln, r.n2 AS rn "
        "FROM fr l JOIN fr r ON l.cluster = r.cluster "
        "AND l.vec_id <> r.vec_id) "
        f"WHERE dot > 0 AND dot * dot * {tau2_den} >= "
        f"{tau2_num} * ln * rn), "
        "s0 AS (SELECT vec_id, cluster, q2, n2 FROM fr WHERE tick = 0 "
        "AND vec_id NOT IN (SELECT ib FROM e WHERE tb = 0 AND ta = 0 "
        "AND ia < ib)), "
        "s1 AS (SELECT vec_id, cluster, q2, n2 FROM fr WHERE tick = 1 "
        "AND vec_id NOT IN (SELECT ib FROM e WHERE tb = 1 AND ("
        "(ta = 1 AND ia < ib) OR ia IN (SELECT vec_id FROM s0)))), "
        + (
            "s2 AS (SELECT vec_id, cluster, q2, n2 FROM fr WHERE tick = 2 "
            "AND vec_id NOT IN (SELECT ib FROM e WHERE tb = 2 AND ("
            "(ta = 2 AND ia < ib) OR ia IN (SELECT vec_id FROM s0) "
            "OR ia IN (SELECT vec_id FROM s1)))), "
            "surv AS (SELECT * FROM s0 UNION ALL SELECT * FROM s1 "
            "UNION ALL SELECT * FROM s2)"
            if max_tick >= 2
            else "surv AS (SELECT * FROM s0 UNION ALL SELECT * FROM s1)"
        )
    )


ORACLES["xsemdedup_incremental"] = (
    _semdedup_inc_ctes()
    + " SELECT vec_id, cluster, n2 FROM surv"
)

ORACLES["xann_semdedup_topk"] = (
    _semdedup_inc_ctes()
    + ", qv0 AS (SELECT qv, q2, "
    "CAST(list_sum(list_transform(q2, x -> x * x)) AS BIGINT) AS qn2 "
    "FROM q WHERE vec_id = 0), "
    "pe AS (SELECT c.cid, CAST(list_sum(list_transform(range(0, 64), "
    "j -> (qv0.qv[j+1]-c.qv[j+1])*(qv0.qv[j+1]-c.qv[j+1]))) AS BIGINT) "
    "* 8 + c.cid AS enc FROM c0 c, qv0), "
    "probe AS (SELECT cid FROM pe ORDER BY enc LIMIT 3), "
    "sc AS (SELECT s.vec_id, s.cluster, "
    "CASE WHEN s.n2 > 0 AND qv0.qn2 > 0 THEN "
    + _fhu(
        "CAST(list_sum(list_transform(range(0, 64), "
        "j -> s.q2[j+1]*qv0.q2[j+1])) AS BIGINT) "
        "/ sqrt(CAST(s.n2 AS DOUBLE) * CAST(qv0.qn2 AS DOUBLE))",
        6,
    )
    + " ELSE 0.0 END AS cosine "
    "FROM surv s JOIN probe p ON p.cid = s.cluster CROSS JOIN qv0) "
    "SELECT vec_id, cluster, cosine FROM sc "
    "ORDER BY cosine DESC, vec_id LIMIT 10"
)

ORACLES["xkmv_overlap_maintained"] = (
    # fold == batch sketch (KMV state is a pure function of the set),
    # so the oracle builds the batch sketches of the full slices and
    # replays the one-pass union-top-k overlap monitor at k=96
    "WITH " + _kmv_hv_sql() + ", "
    "g AS (SELECT 'all' AS grp, h FROM nrm "
    "UNION ALL SELECT 'half', h FROM nrm WHERE doc_id < 250 "
    "UNION ALL SELECT 'mod3', h FROM nrm WHERE doc_id % 3 = 0), "
    + _kmv_rank_sql("g", 96) + ", "
    "sk AS (SELECT grp, hv FROM rk WHERE rn <= 96), "
    "gs AS (SELECT DISTINCT grp FROM sk), "
    "pairs AS (SELECT a.grp AS grp_a, b.grp AS grp_b FROM gs a "
    "CROSS JOIN gs b WHERE a.grp <> b.grp), "
    "member AS (SELECT p.grp_a, p.grp_b, s.hv, "
    "max(CASE WHEN s.grp = p.grp_a THEN 1 ELSE 0 END) AS in_a, "
    "max(CASE WHEN s.grp = p.grp_b THEN 1 ELSE 0 END) AS in_b "
    "FROM sk s JOIN pairs p ON s.grp = p.grp_a OR s.grp = p.grp_b "
    "GROUP BY 1, 2, 3), "
    "tk AS (SELECT *, row_number() OVER (PARTITION BY grp_a, grp_b "
    "ORDER BY hv) AS rn FROM member), "
    "agg AS (SELECT grp_a, grp_b, "
    "CAST(sum(in_a) AS BIGINT) AS n_a_in_union, "
    "CAST(sum(CASE WHEN in_a + in_b = 2 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_both, CAST(count(*) AS BIGINT) AS n_union_sketch "
    "FROM tk WHERE rn <= 96 GROUP BY 1, 2) "
    "SELECT grp_a, grp_b, n_a_in_union, n_both, "
    "CASE WHEN n_a_in_union > 0 THEN "
    + _fhu("n_both / CAST(n_a_in_union AS DOUBLE)", 4)
    + " END AS containment_a_in_b, "
    "n_union_sketch, "
    + _fhu("n_both / CAST(n_union_sketch AS DOUBLE)", 4)
    + " AS jaccard_est FROM agg"
)

ORACLES["xcurriculum_sketch"] = (
    # the xwinsorize_sketch CTE chain (hash-level sketch rebuild +
    # integer rank selection) with 3 interior quartile cuts and the
    # in-row stage CASE (boundary-equal -> lower stage)
    "WITH li AS (SELECT doc_id, lang AS grp, "
    "CAST(doc_id AS VARCHAR) AS rid, n_chars AS val, "
    + _poly31_sql("(CAST(doc_id AS VARCHAR) || '#qsk')")
    + " AS h FROM documents), "
    "lv AS (SELECT grp, val, rid, doc_id, CASE WHEN h = 0 THEN 31 "
    "ELSE CAST(bit_count(CAST((h & -h) - 1 AS BIGINT)) AS BIGINT) "
    "END AS lvl FROM li), "
    "cnt AS (SELECT grp, lvl, count(*) AS c FROM lv GROUP BY 1, 2), "
    "suf AS (SELECT grp, lvl, sum(c) OVER (PARTITION BY grp "
    "ORDER BY lvl DESC ROWS BETWEEN UNBOUNDED PRECEDING AND "
    "CURRENT ROW) AS s FROM cnt), "
    "thr AS (SELECT grp, CAST(coalesce(max(lvl) "
    "FILTER (WHERE s > 128) + 1, 0) AS BIGINT) AS thr "
    "FROM suf GROUP BY 1), "
    "ret AS (SELECT l.grp, l.rid, l.val FROM lv l "
    "JOIN thr t ON l.grp = t.grp WHERE l.lvl >= t.thr), "
    "rk AS (SELECT grp, rid, val, row_number() OVER (PARTITION BY "
    "grp ORDER BY val, rid) AS rn, count(*) OVER (PARTITION BY grp) "
    "AS s FROM ret), "
    "cuts AS (SELECT grp, "
    "max(CASE WHEN rn = (1 * (s - 1)) // 4 + 1 THEN val END) AS c1, "
    "max(CASE WHEN rn = (2 * (s - 1)) // 4 + 1 THEN val END) AS c2, "
    "max(CASE WHEN rn = (3 * (s - 1)) // 4 + 1 THEN val END) AS c3 "
    "FROM rk GROUP BY grp) "
    "SELECT li.doc_id, li.grp AS lang, li.val, "
    "CAST(CASE WHEN li.val IS NOT NULL AND c.c1 IS NOT NULL THEN "
    "1 + (CASE WHEN li.val > c.c1 THEN 1 ELSE 0 END) "
    "+ (CASE WHEN li.val > c.c2 THEN 1 ELSE 0 END) "
    "+ (CASE WHEN li.val > c.c3 THEN 1 ELSE 0 END) END AS INTEGER) "
    "AS stage "
    "FROM li LEFT JOIN cuts c ON li.grp = c.grp"
)

ORACLES["xdrift_psi_maintained"] = (
    # the xdrift_psi shape on the CALLER-FROZEN grid [0, 300) x 12:
    # additive fold == batch counts, so the oracle is the direct
    # two-population SQL with the literal ruler
    "WITH ref AS (SELECT value FROM events WHERE event_type = "
    "'purchase'), "
    "nw AS (SELECT value FROM events WHERE event_type = 'error'), "
    "rb AS (SELECT CAST(greatest(0, least(11, "
    "floor((CAST(value AS DOUBLE) - 0.0) / 25.0))) AS BIGINT) AS bin, "
    "count(*) AS n_ref FROM ref WHERE value IS NOT NULL GROUP BY 1), "
    "nb AS (SELECT CAST(greatest(0, least(11, "
    "floor((CAST(value AS DOUBLE) - 0.0) / 25.0))) AS BIGINT) AS bin, "
    "count(*) AS n_new FROM nw WHERE value IS NOT NULL GROUP BY 1), "
    "g AS (SELECT i AS bin FROM range(0, 12) r(i)), "
    "j AS (SELECT g.bin, coalesce(rb.n_ref, 0) AS n_ref, "
    "coalesce(nb.n_new, 0) AS n_new FROM g "
    "LEFT JOIN rb ON g.bin = rb.bin LEFT JOIN nb ON g.bin = nb.bin), "
    "t AS (SELECT sum(n_ref) AS tr, sum(n_new) AS tn FROM j), "
    "p AS (SELECT j.bin, j.n_ref, j.n_new, "
    "(j.n_ref + 0.5) / (t.tr + 0.5 * 12) AS p_ref, "
    "(j.n_new + 0.5) / (t.tn + 0.5 * 12) AS p_new "
    "FROM j CROSS JOIN t) "
    "SELECT bin, round(0.0 + bin * 25.0, 6) AS bin_lo, "
    "round(0.0 + (bin + 1) * 25.0, 6) AS bin_hi, "
    "CAST(n_ref AS BIGINT) AS n_ref, CAST(n_new AS BIGINT) AS n_new, "
    "round(p_ref, 9) AS p_ref, round(p_new, 9) AS p_new, "
    "round((p_new - p_ref) * ln(p_new / p_ref), 9) AS psi FROM p"
)

# the from-grid read must equal the direct rule for ANY additive fold
# of the grid (overestimate theorem + exact verify) — same oracle
# device as xheavy_hitters, over the unigram token stream at phi=1/200
ORACLES["xheavy_hitters_grid"] = (
    "WITH t AS (SELECT unnest(string_split_regex(trim(lower(text)), "
    "'\\s+')) AS tok FROM documents), "
    "tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t) "
    "SELECT tok, CAST(count(*) AS BIGINT) AS freq, "
    "tot.n AS n_total FROM t, tot GROUP BY tok, tot.n "
    "HAVING count(*) >= (tot.n + 199) // 200"
)

# fold == batch counts (additive), from-stats scoring == batch scoring
# (same fixed-point snap) — so the incremental keys score against the
# very SQL their batch twins use / the direct batch formula
ORACLES["xdsir_incremental"] = (
    "WITH " + _dsir_ctes() + " "
    "SELECT doc_id, lang, source, dsir_score FROM sc"
)
ORACLES["xcentroid_from_stats"] = ORACLES["xcentroid_shift"]
ORACLES["xlm_backoff_incremental"] = ORACLES["xlm_backoff"]

# The maintained-events quintet + vocab + Bloom read fold exactly to
# the batch answer over the whole ledger (ordered ticks partition the
# per-user/per-group sequences; the count/min/union folds are exact),
# so each key's oracle IS its driver-green batch twin's SQL — and for
# sessions/debounce the hashed rows ARE the folded state + append log,
# so the state itself is verified, not just a read over it.
ORACLES["xsessions_maintained"] = ORACLES["xsessionize"]
ORACLES["xretention_maintained"] = ORACLES["xretention"]
ORACLES["xfunnel_maintained"] = ORACLES["xfunnel"]
ORACLES["xtransitions_maintained"] = ORACLES["xtransitions"]
ORACLES["xdebounce_maintained"] = ORACLES["xdebounce"]
ORACLES["xvocab_maintained"] = ORACLES["xvocab"]
ORACLES["xbloom_decontaminate_maintained"] = ORACLES["xdecontaminate_bloom"]

# the xtext_gopher rule expressions VERBATIM, aggregated per source:
# counters sum CAST(rule AS INT) so NULL text counts in n_docs but in
# no c_ column (sum skips NULL — the Spark side's exact contract)
ORACLES["xquality_rates_maintained"] = (
    "WITH d AS (SELECT source, text, "
    "string_split_regex(trim(text), '\\s+') AS w, "
    "string_split(text, chr(10)) AS lns FROM documents), "
    "r AS (SELECT source, "
    "CAST(len(w) >= 50 AND len(w) <= 100000 AS INT) AS r_wc, "
    "CAST(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) "
    "/ len(w) >= 3.0 AND "
    "CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) "
    "/ len(w) <= 10.0 AS INT) AS r_mwl, "
    "CAST(CAST(length(text) - length(regexp_replace(text, '[#…]', '', "
    "'g')) AS DOUBLE) / len(w) < 0.1 AS INT) AS r_sym, "
    "CAST(CAST(len(list_filter(lns, l -> regexp_matches(l, "
    "'^\\s*[-\\*•]'))) AS DOUBLE) / len(lns) < 0.9 AS INT) AS r_bul, "
    "CAST(CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) "
    "AS DOUBLE) / len(w) >= 0.8 AS INT) AS r_alpha "
    "FROM d), "
    "c AS (SELECT source AS grp, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(r_wc) AS BIGINT) AS c_wc, "
    "CAST(sum(r_mwl) AS BIGINT) AS c_mwl, "
    "CAST(sum(r_sym) AS BIGINT) AS c_sym, "
    "CAST(sum(r_bul) AS BIGINT) AS c_bul, "
    "CAST(sum(r_alpha) AS BIGINT) AS c_alpha, "
    "CAST(sum(r_wc * r_mwl * r_sym * r_bul * r_alpha) AS BIGINT) "
    "AS c_pass FROM r GROUP BY source) "
    "SELECT grp, n_docs, "
    + _fhu("CAST(c_wc AS DOUBLE) / n_docs", 4)
    + " AS rate_rule_word_count, "
    + _fhu("CAST(c_mwl AS DOUBLE) / n_docs", 4)
    + " AS rate_rule_mean_word_len, "
    + _fhu("CAST(c_sym AS DOUBLE) / n_docs", 4)
    + " AS rate_rule_symbol_ratio, "
    + _fhu("CAST(c_bul AS DOUBLE) / n_docs", 4)
    + " AS rate_rule_bullet_lines, "
    + _fhu("CAST(c_alpha AS DOUBLE) / n_docs", 4)
    + " AS rate_rule_alpha_words, "
    + _fhu("CAST(c_pass AS DOUBLE) / n_docs", 4)
    + " AS rate_pass_all FROM c"
)

# the xbm25 count/idf CTE chain with the serving cut's exact float
# expression tree (idf * (tf·2.2 / denom) — the Spark association),
# explicit Σlen/count avgdl (one exact-BIGINT division, never avg()),
# half-up 6dp, (score DESC, doc_id) rank, LIMIT 10
ORACLES["xbm25_postings_maintained"] = (
    "WITH tok AS (SELECT doc_id, "
    "len(string_split_regex(trim(lower(text)), '\\s+')) AS dl, "
    "unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t "
    "FROM documents), "
    "m AS (SELECT doc_id, t, count(*) AS tf, any_value(dl) AS dl "
    "FROM tok WHERE t IN ('hash', 'merge', 'stream', 'vector') "
    "GROUP BY doc_id, t), "
    "s AS (SELECT CAST(count(*) AS DOUBLE) AS n, "
    "CAST(sum(len(string_split_regex(trim(lower(text)), '\\s+'))) "
    "AS DOUBLE) / count(*) AS avgdl FROM documents), "
    "d AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM m GROUP BY t), "
    "sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_matched, "
    + _fhu(
        "sum(ln(1.0 + (n - df + 0.5) / (df + 0.5)) "
        "* (tf * (1.2 + 1.0) / (tf + 1.2 * ((1.0 - 0.75) "
        "+ 0.75 * dl / avgdl))))",
        6,
    )
    + " AS score FROM m JOIN d USING (t) CROSS JOIN s GROUP BY doc_id) "
    "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) "
    "AS BIGINT) AS rank, doc_id, n_terms_matched, score FROM sc "
    "ORDER BY rank LIMIT 10"
)

# the intervals fold ≡ batch row-for-row (island geometry is a set
# function; island ids renumber to the batch running-break index;
# n_merged folds weighted) — and the key's rows ARE the folded state,
# so the batch-twin oracle hash-verifies the state itself
ORACLES["xintervals_maintained"] = ORACLES["xmerge_intervals"]

# the as-of probe contract made SQL-replayable: the head slice (clicks
# at/after their user's latest purchase) is derived in the oracle too,
# and under that contract probe-from-latest-state ≡ ASOF JOIN against
# the whole purchase history
ORACLES["xasof_maintained"] = (
    "WITH purchases AS (SELECT user_id, ts, max(event_id) "
    "AS purchase_event_id FROM events WHERE event_type = 'purchase' "
    "GROUP BY user_id, ts), "
    "latest AS (SELECT user_id, max(ts) AS mts FROM purchases "
    "GROUP BY user_id), "
    "head AS (SELECT c.event_id, c.user_id, c.ts FROM "
    "(SELECT event_id, user_id, ts FROM events "
    "WHERE event_type = 'click') c "
    "JOIN latest l USING (user_id) WHERE c.ts >= l.mts) "
    "SELECT h.event_id, h.user_id, p.purchase_event_id "
    "FROM head h ASOF JOIN purchases p "
    "ON h.user_id = p.user_id AND h.ts >= p.ts"
)


def _mmr_semdedup_oracle(
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    nprobe: int = 3,
    nlist: int = 8,
    dim: int = 64,
    dp: int = 6,
) -> str:
    """Oracle for ``xmmr_semdedup``: the ``_semdedup_inc_ctes`` kill
    chain (the store), the ``xann_semdedup_topk`` probe + integer-
    cosine rel rule (the pool), quantized pairwise cosines, and ``k``
    unrolled greedy-argmax CTE iterations (the ``xmmr`` device) — the
    λ-complement is written ``(1.0 - 0.7)`` so DuckDB computes the
    same IEEE double the python walk's ``1.0 - lam`` produces, and
    every rel/sab input is half-up ``dp`` before the walk, so the
    argmax trees are bit-identical across engines."""
    rel = _fhu(
        f"CAST(list_sum(list_transform(range(0, {dim}), "
        "j -> s.q2[j+1]*qv0.q2[j+1])) AS BIGINT) "
        "/ sqrt(CAST(s.n2 AS DOUBLE) * CAST(qv0.qn2 AS DOUBLE))",
        dp,
    )
    sab = _fhu(
        f"CAST(list_sum(list_transform(range(0, {dim}), "
        "j -> a.q2[j+1]*b.q2[j+1])) AS BIGINT) "
        "/ sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE))",
        6,
    )
    parts = [
        _semdedup_inc_ctes(),
        ", qv0 AS (SELECT qv, q2, "
        "CAST(list_sum(list_transform(q2, x -> x * x)) AS BIGINT) "
        "AS qn2 FROM q WHERE vec_id = 0), "
        f"pe AS (SELECT c.cid, CAST(list_sum(list_transform("
        f"range(0, {dim}), "
        "j -> (qv0.qv[j+1]-c.qv[j+1])*(qv0.qv[j+1]-c.qv[j+1]))) "
        f"AS BIGINT) * {nlist} + c.cid AS enc FROM c0 c, qv0), "
        f"probe AS (SELECT cid FROM pe ORDER BY enc LIMIT {nprobe}), "
        # MATERIALIZED (the _top_pc_oracle device) is load-bearing
        # here: DuckDB inlines plain CTEs, so every re-reference of
        # pool/pw through the unrolled greedy levels would re-expand
        # the whole SemDeDup kill chain — exponentially many
        # evaluations of the fr×fr pair join (observed as a hang at
        # sf0.001 before the hints)
        "sc AS MATERIALIZED (SELECT s.vec_id, s.q2, s.n2, "
        "CASE WHEN s.n2 > 0 AND qv0.qn2 > 0 THEN "
        + rel
        + " ELSE 0.0 END AS rel "
        "FROM surv s JOIN probe p ON p.cid = s.cluster CROSS JOIN qv0), "
        f"pool AS MATERIALIZED (SELECT vec_id, q2, n2, rel FROM sc "
        f"ORDER BY rel DESC, vec_id LIMIT {pool}), "
        "pw AS MATERIALIZED (SELECT a.vec_id AS ia, b.vec_id AS ib, "
        "CASE WHEN a.n2 > 0 AND b.n2 > 0 THEN "
        + sab
        + " ELSE 0.0 END AS sab FROM pool a CROSS JOIN pool b), "
        "p1 AS MATERIALIZED (SELECT vec_id, rel, rel AS mmr FROM pool "
        "ORDER BY rel DESC, vec_id LIMIT 1), "
        "sel1 AS MATERIALIZED (SELECT vec_id FROM p1)",
    ]
    for i in range(2, k + 1):
        parts.append(
            f", c{i} AS MATERIALIZED (SELECT p.vec_id, p.rel, "
            f"{lam} * p.rel - (1.0 - {lam}) * max(pw.sab) AS mmr "
            f"FROM pool p JOIN pw ON pw.ia = p.vec_id "
            f"JOIN sel{i-1} ON pw.ib = sel{i-1}.vec_id "
            f"WHERE p.vec_id NOT IN (SELECT vec_id FROM sel{i-1}) "
            f"GROUP BY p.vec_id, p.rel), "
            f"p{i} AS MATERIALIZED (SELECT vec_id, rel, mmr FROM c{i} "
            f"ORDER BY mmr DESC, vec_id LIMIT 1), "
            f"sel{i} AS MATERIALIZED (SELECT vec_id FROM sel{i-1} "
            f"UNION ALL SELECT vec_id FROM p{i})"
        )
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS rank, vec_id, rel, "
        + _fhu("mmr", 6)
        + f" AS mmr FROM p{i}"
        for i in range(1, k + 1)
    ]
    return "".join(parts) + " " + " UNION ALL ".join(selects)


ORACLES["xmmr_semdedup"] = _mmr_semdedup_oracle()

# fold ≡ batch counts makes the driver-green batch twins the oracles
# for the read-through keys; every folded cell surfaces in the output
ORACLES["xcollocations_maintained"] = ORACLES["xcollocations"]
ORACLES["xnovelty_maintained"] = ORACLES["xngram_novelty"]
ORACLES["xtemperature_maintained"] = ORACLES["xsample_temperature"]
ORACLES["xcap_maintained"] = ORACLES["xcap_per_source"]

#: shared tick-structured CTE chain of the moments-state pair: per
#: (grp, event-id-tick) integer sums first, then the additive fold —
#: the xcentroid_stats_state device applied to the 1-D scaler state
_MOMENTS_CTES = (
    "WITH e AS (SELECT event_type AS grp, event_id % 3 AS tick, "
    "CAST(floor(CAST(value AS DOUBLE) * 1000.0 + 0.5) AS BIGINT) AS q "
    "FROM events WHERE value IS NOT NULL), "
    "pt AS (SELECT grp, tick, CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(q) AS BIGINT) AS s1, CAST(sum(q * q) AS BIGINT) AS s2 "
    "FROM e GROUP BY grp, tick), "
    "st AS (SELECT grp, CAST(sum(n) AS BIGINT) AS n, "
    "CAST(sum(s1) AS BIGINT) AS s1, CAST(sum(s2) AS BIGINT) AS s2 "
    "FROM pt GROUP BY grp)"
)

ORACLES["xmoments_state"] = (
    _MOMENTS_CTES + " SELECT grp, n, s1, s2 FROM st"
)

# the serving read: the tick slice z-scored against the folded state
# with the EXACT double expression tree of zscore_from_moments
# (q − s1/n over sqrt((s2 − s1²/n)/(n−1)), half-up 6dp, NULL for
# singleton/zero-variance groups, outlier gate with NULL ⇒ false)
_Z_VAR = (
    "(CAST(st.s2 AS DOUBLE) - CAST(st.s1 AS DOUBLE) "
    "* CAST(st.s1 AS DOUBLE) / CAST(st.n AS DOUBLE)) "
    "/ (CAST(st.n AS DOUBLE) - 1.0)"
)
ORACLES["xzscore_maintained"] = (
    _MOMENTS_CTES
    + ", tick AS (SELECT event_type AS grp, event_id, value, "
    "CAST(floor(CAST(value AS DOUBLE) * 1000.0 + 0.5) AS BIGINT) AS q "
    "FROM events WHERE event_id % 3 = 0), "
    "z AS (SELECT t.grp, t.event_id, t.value, "
    f"CASE WHEN st.n >= 2 AND {_Z_VAR} > 0 THEN "
    + _fhu(
        "(CAST(t.q AS DOUBLE) - CAST(st.s1 AS DOUBLE) "
        "/ CAST(st.n AS DOUBLE)) / sqrt(" + _Z_VAR + ")",
        6,
    )
    + " END AS value_z FROM tick t JOIN st ON st.grp = t.grp) "
    "SELECT grp, event_id, value, value_z, "
    "coalesce(abs(value_z) > 2.0, false) AS is_outlier FROM z"
)

# tick-structured state verification (the xsketch_kmv_merge device):
# per-tick sums FIRST, then the cross-tick additive fold in SQL — a
# hash match proves the folded stats frame itself, closing the r14
# read-vs-state gap of xcentroid_from_stats
ORACLES["xcentroid_stats_state"] = (
    "WITH e AS (SELECT CAST(label AS BIGINT) AS grp, "
    "vec_id % 3 AS tick, "
    "list_transform(CAST(embedding AS DOUBLE[]), "
    "x -> CAST(floor(x * CAST(10000.0 AS DOUBLE) + 0.5) AS BIGINT)) "
    "AS qv FROM embeddings), "
    "x AS (SELECT grp, tick, unnest(qv) AS v, "
    "generate_subscripts(qv, 1) AS j FROM e), "
    "pt AS (SELECT grp, tick, j, CAST(sum(v) AS BIGINT) AS s FROM x "
    "GROUP BY grp, tick, j), "
    "s AS (SELECT grp, j, CAST(sum(s) AS BIGINT) AS s FROM pt "
    "GROUP BY grp, j), "
    "sv AS (SELECT grp, string_agg(CAST(s AS VARCHAR), ',' ORDER BY j) "
    "AS sv_csv FROM s GROUP BY grp), "
    "pn AS (SELECT grp, tick, CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(list_sum(list_transform(qv, v -> v * v))) AS BIGINT) "
    "AS ss FROM e GROUP BY grp, tick), "
    "nn AS (SELECT grp, CAST(sum(n) AS BIGINT) AS n, "
    "CAST(sum(ss) AS BIGINT) AS ss FROM pn GROUP BY grp) "
    "SELECT nn.grp, nn.n, sv.sv_csv, nn.ss FROM nn JOIN sv USING (grp)"
)

# same device for the Stupid-Backoff count frame: per-tick n-gram
# counts, then the additive fold — verifies the xlm_backoff_
# incremental key's folded MODEL, not just scores read through it
ORACLES["xlm_counts_state"] = (
    "WITH tq AS (SELECT doc_id % 3 AS tick, "
    "string_split_regex(trim(lower(text)), '\\s+') AS t "
    "FROM documents WHERE doc_id < 250), "
    "u_t AS (SELECT tick, w1, count(*) AS c FROM "
    "(SELECT tick, unnest(t) AS w1 FROM tq) GROUP BY tick, w1), "
    "uni AS (SELECT CAST(1 AS INTEGER) AS n, w1, '' AS w2, '' AS w3, "
    "CAST(sum(c) AS BIGINT) AS c FROM u_t GROUP BY w1), "
    "b_t AS (SELECT tick, t[i] AS w1, t[i + 1] AS w2, count(*) AS c "
    "FROM tq, unnest(generate_series(1, len(t) - 1)) AS u(i) "
    "GROUP BY tick, w1, w2), "
    "big AS (SELECT CAST(2 AS INTEGER) AS n, w1, w2, '' AS w3, "
    "CAST(sum(c) AS BIGINT) AS c FROM b_t GROUP BY w1, w2), "
    "t_t AS (SELECT tick, t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3, "
    "count(*) AS c FROM tq, "
    "unnest(generate_series(1, len(t) - 2)) AS u(i) "
    "GROUP BY tick, w1, w2, w3), "
    "tri AS (SELECT CAST(3 AS INTEGER) AS n, w1, w2, w3, "
    "CAST(sum(c) AS BIGINT) AS c FROM t_t GROUP BY w1, w2, w3) "
    "SELECT * FROM uni UNION ALL SELECT * FROM big "
    "UNION ALL SELECT * FROM tri"
)

# r16 state-verification keys (VERDICT r15 item 3): the remaining
# twin-oracle maintained families get their folded STATE driver-hashed
# via the xmoments_state/xcentroid_stats_state device — per-tick CTEs
# replaying the fold's structure, merged with the fold's own law
# (min/union for the semilattice, addition for the counters) in SQL.

# per-(user, event-time-tick) min-cohort/week-set first, then the
# semilattice merge — wks renders as the CSV device so the set hashes
_RET_TICK = (
    "CASE WHEN ts < TIMESTAMP '2024-01-11 00:00:00' THEN 0 "
    "WHEN ts < TIMESTAMP '2024-01-21 00:00:00' THEN 1 ELSE 2 END"
)
ORACLES["xretention_state"] = (
    "WITH e AS (SELECT user_id, " + _RET_TICK + " AS tick, "
    "epoch_ms(date_trunc('week', ts)) AS wk FROM events "
    "WHERE user_id IS NOT NULL AND ts IS NOT NULL), "
    "pt AS (SELECT user_id, tick, CAST(min(wk) AS BIGINT) AS cohort_ms, "
    "list_sort(list(DISTINCT wk)) AS wks FROM e GROUP BY user_id, tick), "
    "st AS (SELECT user_id, CAST(min(cohort_ms) AS BIGINT) AS cohort_ms, "
    "list_sort(list_distinct(flatten(list(wks)))) AS w FROM pt "
    "GROUP BY user_id) "
    "SELECT user_id, cohort_ms, "
    "array_to_string(list_transform(w, x -> CAST(x AS VARCHAR)), ',') "
    "AS wks_csv FROM st"
)

# within-tick adjacency counts per tick + cross-boundary pairs as a
# separate CTE, folded additively — transitions_increment's two-part
# construction replayed in SQL (not the batch lead-window shortcut)
ORACLES["xtransitions_state"] = (
    "WITH e AS (SELECT user_id, event_type, ts, event_id, "
    + _RET_TICK + " AS tick FROM events), "
    "seq AS (SELECT user_id, tick, event_type, "
    "lead(event_type) OVER w AS nxt, lead(tick) OVER w AS nxt_tick "
    "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "wt AS (SELECT tick, event_type AS from_type, nxt AS to_type, "
    "count(*) AS n FROM seq WHERE nxt IS NOT NULL AND nxt_tick = tick "
    "GROUP BY 1, 2, 3), "
    "bt AS (SELECT nxt_tick AS tick, event_type AS from_type, "
    "nxt AS to_type, count(*) AS n FROM seq "
    "WHERE nxt IS NOT NULL AND nxt_tick <> tick GROUP BY 1, 2, 3) "
    "SELECT from_type, to_type, CAST(sum(n) AS BIGINT) AS n "
    "FROM (SELECT * FROM wt UNION ALL SELECT * FROM bt) "
    "GROUP BY from_type, to_type"
)

# per-doc-id-tick token counts folded additively — the full wordcount
# state, no vocabulary read in front
ORACLES["xvocab_state"] = (
    "WITH tok AS (SELECT doc_id % 3 AS tick, "
    "unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token "
    "FROM documents), "
    "pt AS (SELECT tick, token, count(*) AS freq FROM tok "
    "GROUP BY tick, token) "
    "SELECT token, CAST(sum(freq) AS BIGINT) AS freq FROM pt "
    "GROUP BY token"
)

# per-tick bigram + unigram counts folded additively, pair cells
# joined to both endpoint unigram cells — both maintained frames hash
ORACLES["xcollocations_state"] = (
    "WITH t AS (SELECT doc_id % 3 AS tick, "
    "string_split_regex(trim(lower(text)), '\\s+') AS toks "
    "FROM documents), "
    "bg_t AS (SELECT tick, z[1] AS w1, z[2] AS w2, count(*) AS c FROM "
    "(SELECT tick, unnest(list_zip(toks[:len(toks)-1], toks[2:])) AS z "
    "FROM t WHERE len(toks) >= 2) GROUP BY tick, w1, w2), "
    "bg AS (SELECT w1, w2, CAST(sum(c) AS BIGINT) AS c FROM bg_t "
    "GROUP BY w1, w2), "
    "u_t AS (SELECT tick, unnest(toks) AS token FROM t), "
    "uc_t AS (SELECT tick, token, count(*) AS freq FROM u_t "
    "GROUP BY tick, token), "
    "uc AS (SELECT token, CAST(sum(freq) AS BIGINT) AS freq FROM uc_t "
    "GROUP BY token) "
    "SELECT bg.w1, bg.w2, bg.c, u1.freq AS f1, u2.freq AS f2 "
    "FROM bg JOIN uc u1 ON bg.w1 = u1.token "
    "JOIN uc u2 ON bg.w2 = u2.token"
)

# r16-staged families, registered BELOW the driver window (the r17
# head): oracles replay the sketch/fold constructions and the exact
# float trees.

# -- xks_drift_sketch: both quantile-sketch chains (tick filters) +
#    the integer-cross-product KS --
_KS_SKETCH_HASH = _poly31_sql(
    "(CAST(l_orderkey AS VARCHAR) || '-' || "
    "CAST(l_linenumber AS VARCHAR) || '#qsk')"
)


def _ks_sketch_slice(pred: str, p: str, k: int = 256) -> str:
    """One hash-level sketch CTE chain over the ``lv`` rows (aliased
    ``l``) matching ``pred``, CTE names prefixed ``p`` — the certified
    _qsketch_merge_oracle chain parameterized by slice (the exact
    merge law makes the per-tick fold equal this direct build)."""
    return (
        f"{p}c AS (SELECT l.grp, l.lvl, count(*) AS c FROM lv l "
        f"WHERE {pred} GROUP BY 1, 2), "
        f"{p}s AS (SELECT grp, lvl, sum(c) OVER (PARTITION BY grp "
        "ORDER BY lvl DESC ROWS BETWEEN UNBOUNDED PRECEDING AND "
        f"CURRENT ROW) AS s FROM {p}c), "
        f"{p}t AS (SELECT grp, CAST(coalesce(max(lvl) "
        f"FILTER (WHERE s > {k}) + 1, 0) AS BIGINT) AS thr "
        f"FROM {p}s GROUP BY 1), "
        f"{p}r AS (SELECT l.grp, l.val FROM lv l JOIN {p}t t "
        f"ON l.grp = t.grp WHERE {pred} AND l.lvl >= t.thr)"
    )


ORACLES["xks_drift_sketch"] = (
    "WITH li AS (SELECT l_returnflag AS grp, "
    "CAST(l_quantity AS BIGINT) AS val, "
    "(l_orderkey + l_linenumber) % 3 AS tick, "
    f"{_KS_SKETCH_HASH} AS h FROM lineitem), "
    "lv AS (SELECT grp, val, tick, CASE WHEN h = 0 THEN 31 "
    "ELSE CAST(bit_count(CAST((h & -h) - 1 AS BIGINT)) AS BIGINT) "
    "END AS lvl FROM li), "
    + _ks_sketch_slice("l.tick < 2", "ref")
    + ", "
    + _ks_sketch_slice("l.tick = 2", "cur")
    + ", "
    "u AS (SELECT grp, val, 1 AS sd FROM refr "
    "UNION ALL SELECT grp, val, 0 AS sd FROM curr), "
    "pv AS (SELECT grp, val, CAST(sum(sd) AS BIGINT) AS ca, "
    "CAST(sum(1 - sd) AS BIGINT) AS cb FROM u GROUP BY 1, 2), "
    "cum AS (SELECT grp, val, sum(ca) OVER w1 AS cuma, "
    "sum(cb) OVER w1 AS cumb, sum(ca) OVER w2 AS sa, "
    "sum(cb) OVER w2 AS sb FROM pv "
    "WINDOW w1 AS (PARTITION BY grp ORDER BY val), "
    "w2 AS (PARTITION BY grp)), "
    "dd AS (SELECT grp, val, abs(cuma * sb - cumb * sa) AS d, sa, sb "
    "FROM cum), "
    "mm AS (SELECT grp, max(d) AS dm FROM dd GROUP BY grp) "
    "SELECT d.grp, CAST(max(d.sa) AS BIGINT) AS n_a, "
    "CAST(max(d.sb) AS BIGINT) AS n_b, "
    + _fhu("max(d.d) / (CAST(max(d.sa) AS DOUBLE) * max(d.sb))", 6)
    + " AS ks, "
    "min(CASE WHEN d.d = m.dm THEN d.val END) AS ks_at "
    "FROM dd d JOIN mm m USING (grp) "
    "WHERE d.sa > 0 AND d.sb > 0 GROUP BY d.grp"
)

# -- xppmi_window: gap-1 ∪ gap-2 skip-gram stream + shifted-clamped
#    PMI (fold ≡ batch counts makes the batch stream the oracle) --
ORACLES["xppmi_window"] = (
    "WITH t AS (SELECT string_split_regex(trim(lower(text)), '\\s+') "
    "AS toks FROM documents), "
    "bg AS (SELECT z[1] AS w1, z[2] AS w2 FROM (SELECT "
    "unnest(list_zip(toks[:len(toks)-1], toks[2:])) AS z FROM t "
    "WHERE len(toks) >= 2) "
    "UNION ALL SELECT z[1], z[2] FROM (SELECT "
    "unnest(list_zip(toks[:len(toks)-2], toks[3:])) AS z FROM t "
    "WHERE len(toks) >= 3)), "
    "uni AS (SELECT unnest(toks) AS w FROM t), "
    "uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w), "
    "nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM uni), "
    "bt AS (SELECT CAST(count(*) AS DOUBLE) AS b FROM bg), "
    "bc AS (SELECT w1, w2, count(*) AS n_pair FROM bg GROUP BY 1, 2 "
    "HAVING count(*) >= 5) "
    "SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair, "
    + _fhu(
        "greatest(CAST(0 AS DOUBLE), "
        "ln((n_pair / bt.b) / ((u1.c / nt.n) * (u2.c / nt.n))) "
        "- ln(2.0))",
        6,
    )
    + " AS sppmi "
    "FROM bc JOIN uc u1 ON bc.w1 = u1.w JOIN uc u2 ON bc.w2 = u2.w "
    "CROSS JOIN nt CROSS JOIN bt "
    "ORDER BY sppmi DESC, w1, w2 LIMIT 100"
)

# -- xdedup_trajectory: global first-arrival rank per normalized
#    content (rank 1 over (tick, doc_id) IS the increment's keep
#    rule), aggregated per tick --
ORACLES["xdedup_trajectory"] = (
    "WITH d AS (SELECT doc_id, doc_id % 3 AS tick, "
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm "
    "FROM documents), "
    "r AS (SELECT tick, row_number() OVER (PARTITION BY norm "
    "ORDER BY tick, doc_id) AS rn FROM d) "
    "SELECT CAST(tick AS BIGINT) AS tick, "
    "CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_kept, "
    "CAST(count(*) - sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) "
    "AS BIGINT) AS n_dup, "
    + _fhu(
        "(count(*) - sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)) "
        "/ CAST(count(*) AS DOUBLE)",
        4,
    )
    + " AS dup_rate FROM r GROUP BY tick"
)

# -- xsession_quality: the xsessionize CTEs + the quality counters --
_SQ_RATE = _fhu("n_errors / CAST(n_events AS DOUBLE)", 4)
ORACLES["xsession_quality"] = (
    "WITH flagged AS (SELECT user_id, ts, event_id, event_type, "
    "CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800 THEN 1 "
    "ELSE 0 END AS new_sess FROM events WHERE user_id < 100 "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "sess AS (SELECT user_id, ts, event_type, "
    "CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, "
    "event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
    "AS BIGINT) AS session_id FROM flagged), "
    "agg AS (SELECT user_id, session_id, "
    "CAST(count(*) AS BIGINT) AS n_events, "
    "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) "
    "AS BIGINT) AS n_errors, "
    "CAST(count(DISTINCT event_type) AS BIGINT) AS n_types, "
    "CAST((epoch_ms(max(ts)) - epoch_ms(min(ts))) // 1000 AS BIGINT) "
    "AS duration_sec FROM sess GROUP BY 1, 2) "
    "SELECT user_id, session_id, n_events, n_errors, n_types, "
    f"duration_sec, {_SQ_RATE} AS error_rate, "
    f"{_SQ_RATE} <= 0.25 AS ok FROM agg"
)


# -- xkmv_overlap_delta: the certified xkmv_overlap chain on BOTH
#    corpus slices + the full-outer delta --
def _kmv_matrix_cte(
    pred: str, p: str, k: int = 128, metric: str = "jaccard"
) -> str:
    poly = _poly31_sql("(h || '#kmv')")
    if metric == "jaccard":
        j = _fhu("n_both / CAST(n_u AS DOUBLE)", 4)
    else:  # directional containment a-in-b; NULL when side a empty
        j = (
            "CASE WHEN n_a > 0 THEN "
            + _fhu("n_both / CAST(n_a AS DOUBLE)", 4)
            + " END"
        )
    return (
        f"{p}hvs AS (SELECT DISTINCT grp, {poly} AS hv FROM nrm2 "
        f"WHERE h IS NOT NULL AND ({pred})), "
        f"{p}rk AS (SELECT grp, hv, row_number() OVER (PARTITION BY "
        f"grp ORDER BY hv) AS rn FROM {p}hvs), "
        f"{p}sk AS (SELECT grp, hv FROM {p}rk WHERE rn <= {k}), "
        f"{p}gs AS (SELECT DISTINCT grp FROM {p}sk), "
        f"{p}pairs AS (SELECT a.grp AS grp_a, b.grp AS grp_b "
        f"FROM {p}gs a CROSS JOIN {p}gs b WHERE a.grp <> b.grp), "
        f"{p}member AS (SELECT p.grp_a, p.grp_b, s.hv, "
        "max(CASE WHEN s.grp = p.grp_a THEN 1 ELSE 0 END) AS in_a, "
        "max(CASE WHEN s.grp = p.grp_b THEN 1 ELSE 0 END) AS in_b "
        f"FROM {p}sk s JOIN {p}pairs p ON s.grp = p.grp_a "
        "OR s.grp = p.grp_b GROUP BY 1, 2, 3), "
        f"{p}tk AS (SELECT *, row_number() OVER (PARTITION BY grp_a, "
        f"grp_b ORDER BY hv) AS rn FROM {p}member), "
        f"{p}agg AS (SELECT grp_a, grp_b, "
        "CAST(sum(in_a) AS BIGINT) AS n_a, "
        "CAST(sum(CASE WHEN in_a + in_b = 2 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_both, CAST(count(*) AS BIGINT) AS n_u "
        f"FROM {p}tk WHERE rn <= {k} GROUP BY 1, 2), "
        f"{p}mat AS (SELECT grp_a, grp_b, {j} AS j FROM {p}agg)"
    )


_KMVD_DELTA = _fhu("abs(c.j - p.j)", 4)
ORACLES["xkmv_overlap_delta"] = (
    "WITH nrm2 AS (SELECT doc_id, source AS grp, "
    "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h "
    "FROM documents), "
    + _kmv_matrix_cte("doc_id % 3 < 2", "p")
    + ", "
    + _kmv_matrix_cte("1 = 1", "c")
    + " "
    "SELECT coalesce(p.grp_a, c.grp_a) AS grp_a, "
    "coalesce(p.grp_b, c.grp_b) AS grp_b, "
    "p.j AS j_prev, c.j AS j_cur, "
    "CASE WHEN p.j IS NOT NULL AND c.j IS NOT NULL THEN "
    f"{_KMVD_DELTA} END AS delta, "
    "coalesce(CASE WHEN p.j IS NOT NULL AND c.j IS NOT NULL THEN "
    f"{_KMVD_DELTA} > 0.02 END, true) AS alarm "
    "FROM pmat p FULL OUTER JOIN cmat c "
    "ON p.grp_a = c.grp_a AND p.grp_b = c.grp_b"
)


# -- r16 state-verification extensions: the funnel walk accumulators
#    re-derived from the greedy walk's closed form (sequential
#    conditional mins), and the reference n-gram set directly (set
#    union is idempotent — the distinct set IS the fold) --
# r17 folded-state tail: the quality-rate counter frame itself,
# tick-structured (per-(source, tick) partials, then the additive fold)
ORACLES["xquality_rates_state"] = (
    "WITH d AS (SELECT source, doc_id % 3 AS tick, text, "
    "string_split_regex(trim(text), '\\s+') AS w, "
    "string_split(text, chr(10)) AS lns FROM documents), "
    "r AS (SELECT source, tick, "
    "CAST(len(w) >= 50 AND len(w) <= 100000 AS INT) AS r_wc, "
    "CAST(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) "
    "/ len(w) >= 3.0 AND "
    "CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) "
    "/ len(w) <= 10.0 AS INT) AS r_mwl, "
    "CAST(CAST(length(text) - length(regexp_replace(text, '[#…]', '', "
    "'g')) AS DOUBLE) / len(w) < 0.1 AS INT) AS r_sym, "
    "CAST(CAST(len(list_filter(lns, l -> regexp_matches(l, "
    "'^\\s*[-\\*•]'))) AS DOUBLE) / len(lns) < 0.9 AS INT) AS r_bul, "
    "CAST(CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) "
    "AS DOUBLE) / len(w) >= 0.8 AS INT) AS r_alpha "
    "FROM d), "
    "pt AS (SELECT source, tick, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(r_wc) AS BIGINT) AS c_wc, "
    "CAST(sum(r_mwl) AS BIGINT) AS c_mwl, "
    "CAST(sum(r_sym) AS BIGINT) AS c_sym, "
    "CAST(sum(r_bul) AS BIGINT) AS c_bul, "
    "CAST(sum(r_alpha) AS BIGINT) AS c_alpha, "
    "CAST(sum(r_wc * r_mwl * r_sym * r_bul * r_alpha) AS BIGINT) "
    "AS c_pass FROM r GROUP BY source, tick) "
    "SELECT source AS grp, CAST(sum(n_docs) AS BIGINT) AS n_docs, "
    "CAST(sum(c_wc) AS BIGINT) AS c_rule_word_count, "
    "CAST(sum(c_mwl) AS BIGINT) AS c_rule_mean_word_len, "
    "CAST(sum(c_sym) AS BIGINT) AS c_rule_symbol_ratio, "
    "CAST(sum(c_bul) AS BIGINT) AS c_rule_bullet_lines, "
    "CAST(sum(c_alpha) AS BIGINT) AS c_rule_alpha_words, "
    "CAST(sum(c_pass) AS BIGINT) AS c_pass_all "
    "FROM pt GROUP BY source"
)

# r17 folded-state tail: the group-count state + its induced cut cells
# (the exact green xsample_temperature cut float tree over folded n)
ORACLES["xtemperature_state"] = (
    "WITH pt AS (SELECT lang, doc_id % 3 AS tick, "
    "CAST(count(*) AS BIGINT) AS n FROM documents "
    "GROUP BY lang, doc_id % 3), "
    "st AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n FROM pt "
    "GROUP BY lang), "
    "t AS (SELECT sum(CAST(n AS DOUBLE)) AS tot, "
    "sum(pow(CAST(n AS DOUBLE), 0.5)) AS z FROM st) "
    "SELECT lang, n, CAST(floor(round(least(1.0, "
    "0.4 * tot * pow(CAST(n AS DOUBLE), 0.5) / z / CAST(n AS DOUBLE)) "
    "* 10000, 6)) AS BIGINT) AS cut FROM st CROSS JOIN t"
)

ORACLES["xfunnel_state"] = (
    "WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus "
    "FROM events WHERE event_type IN ('view', 'click', 'purchase')), "
    "u1 AS (SELECT user_id, CAST(min(tus) AS BIGINT) AS t1 FROM e "
    "WHERE event_type = 'view' GROUP BY user_id), "
    "u2 AS (SELECT e.user_id, CAST(min(tus) AS BIGINT) AS t2 FROM e "
    "JOIN u1 USING (user_id) WHERE event_type = 'click' "
    "AND tus > t1 AND tus <= t1 + 259200000000 GROUP BY e.user_id), "
    "u3 AS (SELECT e.user_id, CAST(min(e.tus) AS BIGINT) AS t3 FROM e "
    "JOIN u2 USING (user_id) JOIN u1 USING (user_id) "
    "WHERE e.event_type = 'purchase' AND e.tus > u2.t2 "
    "AND e.tus <= u1.t1 + 259200000000 GROUP BY e.user_id), "
    "l AS (SELECT user_id, CAST(max(tus) AS BIGINT) AS last_us "
    "FROM e GROUP BY user_id) "
    "SELECT l.user_id, "
    "CAST(CASE WHEN u3.t3 IS NOT NULL THEN 3 "
    "WHEN u2.t2 IS NOT NULL THEN 2 "
    "WHEN u1.t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS depth, "
    "u1.t1 AS t1_us, "
    "CASE WHEN u3.t3 IS NOT NULL THEN u3.t3 "
    "WHEN u2.t2 IS NOT NULL THEN u2.t2 ELSE u1.t1 END AS tprev_us, "
    "l.last_us "
    "FROM l LEFT JOIN u1 USING (user_id) "
    "LEFT JOIN u2 USING (user_id) LEFT JOIN u3 USING (user_id)"
)

ORACLES["xnovelty_state"] = (
    "WITH t AS (SELECT string_split_regex(trim(lower(text)), '\\s+') "
    "AS toks FROM documents WHERE doc_id < 200) "
    "SELECT DISTINCT z[1] || ' ' || z[2] AS ng FROM "
    "(SELECT unnest(list_zip(toks[:len(toks)-1], toks[2:])) AS z "
    "FROM t WHERE len(toks) >= 2)"
)

# -- xhybrid_maintained: the semdedup kill-chain/probe/scoring chain
#    (dense top-50), the postings-score chain (sparse top-50), and the
#    RRF fusion — three certified oracle chains composed; bm25 CTEs
#    carry an h prefix and the ANN scoring CTE is renamed against the
#    xbm25 chain's names --
#: shared RRF chain of the hybrid-serving oracles: everything from
#: the ANN probe through the fused frame ``f`` (consumes the
#: ``surv`` CTE of a ``_semdedup_inc_ctes`` prefix)
_HYBRID_RRF_CTES = (
    ", qv0 AS (SELECT qv, q2, "
    "CAST(list_sum(list_transform(q2, x -> x * x)) AS BIGINT) AS qn2 "
    "FROM q WHERE vec_id = 0), "
    "pe AS (SELECT c.cid, CAST(list_sum(list_transform(range(0, 64), "
    "j -> (qv0.qv[j+1]-c.qv[j+1])*(qv0.qv[j+1]-c.qv[j+1]))) AS BIGINT) "
    "* 8 + c.cid AS enc FROM c0 c, qv0), "
    "probe AS (SELECT cid FROM pe ORDER BY enc LIMIT 3), "
    "annsc AS (SELECT s.vec_id, "
    "CASE WHEN s.n2 > 0 AND qv0.qn2 > 0 THEN "
    + _fhu(
        "CAST(list_sum(list_transform(range(0, 64), "
        "j -> s.q2[j+1]*qv0.q2[j+1])) AS BIGINT) "
        "/ sqrt(CAST(s.n2 AS DOUBLE) * CAST(qv0.qn2 AS DOUBLE))",
        6,
    )
    + " ELSE 0.0 END AS cosine "
    "FROM surv s JOIN probe p ON p.cid = s.cluster CROSS JOIN qv0), "
    "dn AS (SELECT vec_id AS doc_id, cosine FROM annsc "
    "ORDER BY cosine DESC, vec_id LIMIT 50), "
    "drank AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY "
    + _fhu("cosine", 4)
    + " DESC, doc_id) AS BIGINT) AS dense_rank FROM dn), "
    "htok AS (SELECT doc_id, "
    "len(string_split_regex(trim(lower(text)), '\\s+')) AS dl, "
    "unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t "
    "FROM documents), "
    "hm AS (SELECT doc_id, t, count(*) AS tf, any_value(dl) AS dl "
    "FROM htok WHERE t IN ('hash', 'merge', 'stream', 'vector') "
    "GROUP BY doc_id, t), "
    "hs AS (SELECT CAST(count(*) AS DOUBLE) AS n, "
    "CAST(sum(len(string_split_regex(trim(lower(text)), '\\s+'))) "
    "AS DOUBLE) / count(*) AS avgdl FROM documents), "
    "hd AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM hm "
    "GROUP BY t), "
    "hsc AS (SELECT doc_id, "
    + _fhu(
        "sum(ln(1.0 + (n - df + 0.5) / (df + 0.5)) "
        "* (tf * (1.2 + 1.0) / (tf + 1.2 * ((1.0 - 0.75) "
        "+ 0.75 * dl / avgdl))))",
        6,
    )
    + " AS score FROM hm JOIN hd USING (t) CROSS JOIN hs "
    "GROUP BY doc_id), "
    "sp AS (SELECT doc_id, score FROM hsc "
    "ORDER BY score DESC, doc_id LIMIT 50), "
    "srank AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY "
    + _fhu("score", 4)
    + " DESC, doc_id) AS BIGINT) AS sparse_rank FROM sp), "
    "f AS (SELECT doc_id, sparse_rank, dense_rank, "
    + _fhu(
        "(coalesce(1.0 / (60 + sparse_rank), 0) + "
        "coalesce(1.0 / (60 + dense_rank), 0))",
        6,
    )
    + " AS rrf_score "
    "FROM srank FULL JOIN drank USING (doc_id)) "
)

ORACLES["xhybrid_maintained"] = (
    _semdedup_inc_ctes()
    + _HYBRID_RRF_CTES
    + "SELECT doc_id, sparse_rank, dense_rank, rrf_score, rank FROM ("
    "SELECT *, CAST(row_number() OVER (ORDER BY rrf_score DESC, "
    "doc_id) AS BIGINT) AS rank FROM f) WHERE rank <= 10"
)

# -- r17-staged: the direct KMV build over the buckets >= 1 window
#    (the bottom-k merge law makes collapse == direct) --
ORACLES["xkmv_window_collapse"] = (
    "WITH " + _kmv_hv_sql() + ", "
    "g AS (SELECT lang AS grp, h FROM nrm WHERE doc_id % 3 >= 1), "
    + _kmv_rank_sql("g", 100) + " "
    "SELECT grp, hv FROM rk WHERE rn <= 100"
)


def _sppmi_top_sql(
    sfx: str, where: str, min_count: int = 3, top_k: int = 100
) -> str:
    """One tick-filtered top-k SPPMI CTE chain (the certified
    xppmi_window chain with suffixed CTE names), ending at
    ``top{sfx}(w1, w2, sppmi)``."""
    return (
        f"t{sfx} AS (SELECT string_split_regex(trim(lower(text)), "
        f"'\\s+') AS toks FROM documents WHERE {where}), "
        f"bg{sfx} AS (SELECT z[1] AS w1, z[2] AS w2 FROM (SELECT "
        f"unnest(list_zip(toks[:len(toks)-1], toks[2:])) AS z "
        f"FROM t{sfx} WHERE len(toks) >= 2) "
        "UNION ALL SELECT z[1], z[2] FROM (SELECT "
        f"unnest(list_zip(toks[:len(toks)-2], toks[3:])) AS z "
        f"FROM t{sfx} WHERE len(toks) >= 3)), "
        f"uni{sfx} AS (SELECT unnest(toks) AS w FROM t{sfx}), "
        f"uc{sfx} AS (SELECT w, count(*) AS c FROM uni{sfx} "
        "GROUP BY w), "
        f"nt{sfx} AS (SELECT CAST(count(*) AS DOUBLE) AS n "
        f"FROM uni{sfx}), "
        f"bt{sfx} AS (SELECT CAST(count(*) AS DOUBLE) AS b "
        f"FROM bg{sfx}), "
        f"bc{sfx} AS (SELECT w1, w2, count(*) AS n_pair FROM bg{sfx} "
        f"GROUP BY 1, 2 HAVING count(*) >= {min_count}), "
        f"top{sfx} AS (SELECT w1, w2, "
        + _fhu(
            f"greatest(CAST(0 AS DOUBLE), ln((n_pair / bt{sfx}.b) / "
            f"((u1.c / nt{sfx}.n) * (u2.c / nt{sfx}.n))) - ln(2.0))",
            6,
        )
        + " AS sppmi "
        f"FROM bc{sfx} JOIN uc{sfx} u1 ON bc{sfx}.w1 = u1.w "
        f"JOIN uc{sfx} u2 ON bc{sfx}.w2 = u2.w "
        f"CROSS JOIN nt{sfx} CROSS JOIN bt{sfx} "
        f"ORDER BY sppmi DESC, w1, w2 LIMIT {top_k})"
    )


def _sppmi_drift_row_sql(tick: int) -> str:
    """One drift summary row: top{r<tick>} (reference, ticks < tick)
    full-outer joined to top{c<tick>} (the tick), the
    sppmi_drift_summary arithmetic replayed."""
    r, c = f"topr{tick}", f"topc{tick}"
    jac = _fhu(
        "n_common / CAST(n_ref + n_cur - n_common AS DOUBLE)", 4
    )
    return (
        f"SELECT CAST({tick} AS BIGINT) AS tick, n_ref, n_cur, "
        "n_common, CAST(n_cur - n_common AS BIGINT) AS n_new, "
        "CAST(n_ref - n_common AS BIGINT) AS n_dropped, "
        + jac + " AS overlap_jaccard, max_abs_delta, "
        + jac + " < 0.5 AS alarmed FROM ("
        "SELECT CAST(count(r.sppmi) AS BIGINT) AS n_ref, "
        "CAST(count(c.sppmi) AS BIGINT) AS n_cur, "
        "CAST(sum(CASE WHEN r.sppmi IS NOT NULL AND c.sppmi IS NOT "
        "NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_common, "
        "max(CASE WHEN r.sppmi IS NOT NULL AND c.sppmi IS NOT NULL "
        "THEN " + _fhu("abs(c.sppmi - r.sppmi)", 6) + " END) "
        "AS max_abs_delta "
        f"FROM {r} r FULL OUTER JOIN {c} c "
        "ON r.w1 = c.w1 AND r.w2 = c.w2)"
    )


ORACLES["xppmi_drift"] = (
    "WITH "
    + _sppmi_top_sql("r1", "doc_id % 3 < 1") + ", "
    + _sppmi_top_sql("c1", "doc_id % 3 = 1") + ", "
    + _sppmi_top_sql("r2", "doc_id % 3 < 2") + ", "
    + _sppmi_top_sql("c2", "doc_id % 3 = 2") + " "
    + _sppmi_drift_row_sql(1)
    + " UNION ALL "
    + _sppmi_drift_row_sql(2)
)

# -- r17-staged: the certified session CTEs + the certified rate CTEs
#    + the deterministic user->source rank join --
ORACLES["xsession_rates_gate"] = (
    "WITH flagged AS (SELECT user_id, ts, event_id, event_type, "
    "CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800 THEN 1 "
    "ELSE 0 END AS new_sess FROM events WHERE user_id < 100 "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "sess AS (SELECT user_id, ts, event_type, "
    "CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, "
    "event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
    "AS BIGINT) AS session_id FROM flagged), "
    "agg AS (SELECT user_id, session_id, "
    "CAST(count(*) AS BIGINT) AS n_events, "
    "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) "
    "AS BIGINT) AS n_errors, "
    "CAST(count(DISTINCT event_type) AS BIGINT) AS n_types, "
    "CAST((epoch_ms(max(ts)) - epoch_ms(min(ts))) // 1000 AS BIGINT) "
    "AS duration_sec FROM sess GROUP BY 1, 2), "
    "sq AS (SELECT user_id, session_id, n_events, n_errors, n_types, "
    f"duration_sec, {_SQ_RATE} AS error_rate, "
    f"{_SQ_RATE} <= 0.25 AS ok FROM agg), "
    "d AS (SELECT source, text, "
    "string_split_regex(trim(text), '\\s+') AS w, "
    "string_split(text, chr(10)) AS lns FROM documents), "
    "r AS (SELECT source, "
    "CAST(len(w) >= 50 AND len(w) <= 100000 AS INT) AS r_wc, "
    "CAST(CAST(length(regexp_replace(text, '\\s+', '', 'g')) "
    "AS DOUBLE) / len(w) >= 3.0 AND "
    "CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) "
    "/ len(w) <= 10.0 AS INT) AS r_mwl, "
    "CAST(CAST(length(text) - length(regexp_replace(text, '[#…]', "
    "'', 'g')) AS DOUBLE) / len(w) < 0.1 AS INT) AS r_sym, "
    "CAST(CAST(len(list_filter(lns, l -> regexp_matches(l, "
    "'^\\s*[-\\*•]'))) AS DOUBLE) / len(lns) < 0.9 AS INT) AS r_bul, "
    "CAST(CAST(len(list_filter(w, x -> regexp_matches(x, "
    "'[A-Za-z]'))) AS DOUBLE) / len(w) >= 0.8 AS INT) AS r_alpha "
    "FROM d), "
    "c AS (SELECT source AS grp, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(r_wc * r_mwl * r_sym * r_bul * r_alpha) AS BIGINT) "
    "AS c_pass FROM r GROUP BY source), "
    "rates AS (SELECT grp, "
    + _fhu("CAST(c_pass AS DOUBLE) / n_docs", 4)
    + " AS rate_pass_all, CAST(row_number() OVER (ORDER BY grp) "
    "AS BIGINT) AS src_rank FROM c), "
    "kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM rates) "
    "SELECT sq.user_id, sq.session_id, sq.n_events, sq.n_errors, "
    "sq.n_types, sq.duration_sec, sq.error_rate, sq.ok, "
    "rates.grp AS source, rates.rate_pass_all, "
    "sq.ok AND rates.rate_pass_all >= 0.2 AS admitted "
    "FROM sq CROSS JOIN kk "
    "JOIN rates ON sq.user_id % kk.k + 1 = rates.src_rank"
)

# -- r17-staged: fold == batch under the append order, so the oracle
#    IS the certified batch span oracle --
ORACLES["xspan_dedup_maintained"] = _span_oracle(k=8, removal=False)

# -- r17-staged: the cut twin — fold == batch under the append order,
#    so the oracle IS the certified batch removal oracle --
ORACLES["xspan_removal_maintained"] = _span_oracle(k=8, removal=True)

# -- r17-staged: window-shift self-drift — both KS inputs are window
#    collapses; the merge law makes each equal its direct build --
_KSW_HASH = _poly31_sql("(CAST(doc_id AS VARCHAR) || '#qsk')")
ORACLES["xks_window_drift"] = (
    "WITH li AS (SELECT source AS grp, "
    "CAST(len(string_split_regex(trim(lower(text)), '\\s+')) "
    "AS BIGINT) AS val, "
    "doc_id % 3 AS tick, "
    f"{_KSW_HASH} AS h FROM documents), "
    "lv AS (SELECT grp, val, tick, CASE WHEN h = 0 THEN 31 "
    "ELSE CAST(bit_count(CAST((h & -h) - 1 AS BIGINT)) AS BIGINT) "
    "END AS lvl FROM li), "
    + _ks_sketch_slice("l.tick < 2", "ref")
    + ", "
    + _ks_sketch_slice("l.tick >= 1", "cur")
    + ", "
    "u AS (SELECT grp, val, 1 AS sd FROM refr "
    "UNION ALL SELECT grp, val, 0 AS sd FROM curr), "
    "pv AS (SELECT grp, val, CAST(sum(sd) AS BIGINT) AS ca, "
    "CAST(sum(1 - sd) AS BIGINT) AS cb FROM u GROUP BY 1, 2), "
    "cum AS (SELECT grp, val, sum(ca) OVER w1 AS cuma, "
    "sum(cb) OVER w1 AS cumb, sum(ca) OVER w2 AS sa, "
    "sum(cb) OVER w2 AS sb FROM pv "
    "WINDOW w1 AS (PARTITION BY grp ORDER BY val), "
    "w2 AS (PARTITION BY grp)), "
    "dd AS (SELECT grp, val, abs(cuma * sb - cumb * sa) AS d, sa, sb "
    "FROM cum), "
    "mm AS (SELECT grp, max(d) AS dm FROM dd GROUP BY grp) "
    "SELECT d.grp, CAST(max(d.sa) AS BIGINT) AS n_a, "
    "CAST(max(d.sb) AS BIGINT) AS n_b, "
    + _fhu("max(d.d) / (CAST(max(d.sa) AS DOUBLE) * max(d.sb))", 6)
    + " AS ks, "
    "min(CASE WHEN d.d = m.dm THEN d.val END) AS ks_at "
    "FROM dd d JOIN mm m USING (grp) "
    "WHERE d.sa > 0 AND d.sb > 0 GROUP BY d.grp"
)

# -- r17-staged: the windowed overlap matrix — the certified
#    union-top-k monitor SQL over the direct window KMV chains --
ORACLES["xkmv_window_overlap"] = (
    "WITH nrm AS (SELECT doc_id, source, "
    "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h "
    "FROM documents), "
    "g AS (SELECT source AS grp, h FROM nrm WHERE doc_id % 3 >= 1), "
    + _kmv_rank_sql("g", 128) + ", "
    "sk AS (SELECT grp, hv FROM rk WHERE rn <= 128), "
    "gs AS (SELECT DISTINCT grp FROM sk), "
    "pairs AS (SELECT a.grp AS grp_a, b.grp AS grp_b FROM gs a "
    "CROSS JOIN gs b WHERE a.grp <> b.grp), "
    "member AS (SELECT p.grp_a, p.grp_b, s.hv, "
    "max(CASE WHEN s.grp = p.grp_a THEN 1 ELSE 0 END) AS in_a, "
    "max(CASE WHEN s.grp = p.grp_b THEN 1 ELSE 0 END) AS in_b "
    "FROM sk s JOIN pairs p ON s.grp = p.grp_a OR s.grp = p.grp_b "
    "GROUP BY 1, 2, 3), "
    "tk AS (SELECT *, row_number() OVER (PARTITION BY grp_a, grp_b "
    "ORDER BY hv) AS rn FROM member), "
    "agg AS (SELECT grp_a, grp_b, "
    "CAST(sum(in_a) AS BIGINT) AS n_a_in_union, "
    "CAST(sum(CASE WHEN in_a + in_b = 2 THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_both, CAST(count(*) AS BIGINT) AS n_union_sketch "
    "FROM tk WHERE rn <= 128 GROUP BY 1, 2) "
    "SELECT grp_a, grp_b, n_a_in_union, n_both, "
    "CASE WHEN n_a_in_union > 0 THEN "
    + _fhu("n_both / CAST(n_a_in_union AS DOUBLE)", 4)
    + " END AS containment_a_in_b, "
    "n_union_sketch, "
    + _fhu("n_both / CAST(n_union_sketch AS DOUBLE)", 4)
    + " AS jaccard_est FROM agg"
)

# -- r17-staged: the hybrid chain over the 2-tick (STALER) ANN store
#    + the per-store tick scalars derived from the stores --
ORACLES["xhybrid_freshness"] = (
    _semdedup_inc_ctes(max_tick=1)
    + _HYBRID_RRF_CTES
    + ", pt AS (SELECT CAST(max(doc_id % 3) AS BIGINT) "
    "AS postings_tick FROM documents), "
    "at AS (SELECT CAST(max(vec_id % 3) AS BIGINT) AS ann_tick "
    "FROM surv) "
    "SELECT doc_id, sparse_rank, dense_rank, rrf_score, rank, "
    "pt.postings_tick, at.ann_tick, "
    "CAST(pt.postings_tick - at.ann_tick AS BIGINT) AS store_lag "
    "FROM (SELECT *, CAST(row_number() OVER (ORDER BY rrf_score "
    "DESC, doc_id) AS BIGINT) AS rank FROM f) "
    "CROSS JOIN pt CROSS JOIN at WHERE rank <= 10"
)



# -- xkmv_containment_delta: the same dual-slice chain, containment
#    column — a NULL containment alarms like a missing pair --
ORACLES["xkmv_containment_delta"] = (
    "WITH nrm2 AS (SELECT doc_id, source AS grp, "
    "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h "
    "FROM documents), "
    + _kmv_matrix_cte("doc_id % 3 < 2", "p", metric="containment")
    + ", "
    + _kmv_matrix_cte("1 = 1", "c", metric="containment")
    + " "
    "SELECT coalesce(p.grp_a, c.grp_a) AS grp_a, "
    "coalesce(p.grp_b, c.grp_b) AS grp_b, "
    "p.j AS j_prev, c.j AS j_cur, "
    "CASE WHEN p.j IS NOT NULL AND c.j IS NOT NULL THEN "
    f"{_KMVD_DELTA} END AS delta, "
    "coalesce(CASE WHEN p.j IS NOT NULL AND c.j IS NOT NULL THEN "
    f"{_KMVD_DELTA} > 0.02 END, true) AS alarm "
    "FROM pmat p FULL OUTER JOIN cmat c "
    "ON p.grp_a = c.grp_a AND p.grp_b = c.grp_b"
)


# -- xks_drift_log: two tick-filtered sketch+KS blocks unioned with
#    their tick labels (ref for tick 1 = sketch(tick 0); ref for tick
#    2 = the ticks-0+1 sketch — exact by the merge law) --


def _ks_log_block(ref_pred: str, cur_pred: str, tick: int, p: str) -> str:
    """One (reference, current) KS block over the shared ``lv`` rows:
    the two slice chains + the integer KS, all CTEs prefixed ``p``,
    emitting the log row shape with the literal tick label."""
    return (
        _ks_sketch_slice(ref_pred, f"{p}a")
        + ", "
        + _ks_sketch_slice(cur_pred, f"{p}b")
        + ", "
        f"{p}u AS (SELECT grp, val, 1 AS sd FROM {p}ar "
        f"UNION ALL SELECT grp, val, 0 AS sd FROM {p}br), "
        f"{p}pv AS (SELECT grp, val, CAST(sum(sd) AS BIGINT) AS ca, "
        f"CAST(sum(1 - sd) AS BIGINT) AS cb FROM {p}u GROUP BY 1, 2), "
        f"{p}cum AS (SELECT grp, val, sum(ca) OVER w1 AS cuma, "
        "sum(cb) OVER w1 AS cumb, sum(ca) OVER w2 AS sa, "
        f"sum(cb) OVER w2 AS sb FROM {p}pv "
        "WINDOW w1 AS (PARTITION BY grp ORDER BY val), "
        "w2 AS (PARTITION BY grp)), "
        f"{p}dd AS (SELECT grp, val, abs(cuma * sb - cumb * sa) AS d, "
        f"sa, sb FROM {p}cum), "
        f"{p}mm AS (SELECT grp, max(d) AS dm FROM {p}dd GROUP BY grp), "
        f"{p}out AS (SELECT CAST({tick} AS BIGINT) AS tick, d.grp, "
        "CAST(max(d.sa) AS BIGINT) AS n_a, "
        "CAST(max(d.sb) AS BIGINT) AS n_b, "
        + _fhu("max(d.d) / (CAST(max(d.sa) AS DOUBLE) * max(d.sb))", 6)
        + " AS ks, "
        "min(CASE WHEN d.d = m.dm THEN d.val END) AS ks_at "
        f"FROM {p}dd d JOIN {p}mm m USING (grp) "
        "WHERE d.sa > 0 AND d.sb > 0 GROUP BY d.grp)"
    )


ORACLES["xks_drift_log"] = (
    "WITH li AS (SELECT l_returnflag AS grp, "
    "CAST(l_quantity AS BIGINT) AS val, "
    "(l_orderkey + l_linenumber) % 3 AS tick, "
    f"{_KS_SKETCH_HASH} AS h FROM lineitem), "
    "lv AS (SELECT grp, val, tick, CASE WHEN h = 0 THEN 31 "
    "ELSE CAST(bit_count(CAST((h & -h) - 1 AS BIGINT)) AS BIGINT) "
    "END AS lvl FROM li), "
    + _ks_log_block("l.tick = 0", "l.tick = 1", 1, "k1")
    + ", "
    + _ks_log_block("l.tick < 2", "l.tick = 2", 2, "k2")
    + " "
    "SELECT tick, grp, n_a, n_b, ks, ks_at, ks > 0.05 AS alarmed "
    "FROM (SELECT * FROM k1out UNION ALL SELECT * FROM k2out)"
)


# -- xsketch_window_collapse: the direct hash-level sketch build over
#    the ticks >= 1 window (the merge law makes collapse == direct) --
ORACLES["xsketch_window_collapse"] = (
    "WITH li AS (SELECT l_returnflag AS grp, "
    "CAST(l_quantity AS BIGINT) AS val, "
    "CAST(l_orderkey AS VARCHAR) || '-' || "
    "CAST(l_linenumber AS VARCHAR) AS rid, "
    f"{_KS_SKETCH_HASH} AS h FROM lineitem "
    "WHERE (l_orderkey + l_linenumber) % 3 >= 1), "
    "lv AS (SELECT grp, val, rid, CASE WHEN h = 0 THEN 31 "
    "ELSE CAST(bit_count(CAST((h & -h) - 1 AS BIGINT)) AS BIGINT) "
    "END AS lvl FROM li), "
    "cnt AS (SELECT grp, lvl, count(*) AS c FROM lv GROUP BY 1, 2), "
    "suf AS (SELECT grp, lvl, sum(c) OVER (PARTITION BY grp "
    "ORDER BY lvl DESC ROWS BETWEEN UNBOUNDED PRECEDING AND "
    "CURRENT ROW) AS s FROM cnt), "
    "thr AS (SELECT grp, CAST(coalesce(max(lvl) "
    "FILTER (WHERE s > 256) + 1, 0) AS BIGINT) AS thr "
    "FROM suf GROUP BY 1) "
    "SELECT l.grp, l.rid, l.val, l.lvl, t.thr FROM lv l "
    "JOIN thr t ON l.grp = t.grp WHERE l.lvl >= t.thr"
)
