"""Physical-plan regression tests: the scale properties we rely on must
be visible in `explain("formatted")` output.

These guard the 100 TB design claims: predicate pushdown to the Parquet
scan, column pruning, map-side partial aggregation, broadcast of small
join sides, TopK instead of global sort, and the offset-interval slice
reaching the scan (the incremental-read fast path, reference A4).
"""

from __future__ import annotations

import contextlib
import io

import pytest

from kamu_engine_datafusion_spark import queries as q

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = q.registry()[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_to_scan(spark):
    p = plan_of(spark, "b06_filter")
    assert "EqualTo(l_returnflag,R)" in p  # predicate reached the scan
    assert "GreaterThanOrEqual(l_discount,0.05)" in p


def test_column_pruning(spark):
    p = plan_of(spark, "b06_filter")
    # only the 4 needed columns are read, not all 11
    read = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read and "l_shipdate" not in read
    assert "l_extendedprice" in read


def test_partial_final_aggregate(spark):
    p = plan_of(spark, "b16_groupby_agg")
    assert p.count("HashAggregate") >= 2  # map-side partial + final


def test_broadcast_join_small_dim(spark):
    p = plan_of(spark, "b10_join_inner")
    assert "BroadcastHashJoin" in p  # dim side broadcast, no big-side shuffle


def test_orderby_limit_is_topk(spark):
    p = plan_of(spark, "b26_orderby")
    assert "TakeOrderedAndProject" in p  # no global sort materialization


def test_offset_interval_pushdown(spark):
    """A4: the incremental ledger slice prunes at the Parquet scan."""
    p = plan_of(spark, "a04_offset_slice")
    assert "GreaterThanOrEqual(event_id,100)" in p
    assert "LessThanOrEqual(event_id,499)" in p


def test_topk_similarity_no_corpus_shuffle(spark):
    p = plan_of(spark, "xsim_topk_brute")
    assert "TakeOrderedAndProject" in p
    assert "BroadcastNestedLoopJoin" in p  # 1-row query broadcast
    # the corpus must not hash-shuffle for this query
    assert "Exchange hashpartitioning" not in p


def test_minhash_signatures_partial_aggregation(spark):
    """The explode-layout signature stage is codegen'd MIN aggregates
    with map-side partials (the exchange carries num_hashes longs per
    doc) — the formulation that beat in-row higher-order lambdas 2.2×
    at 50k docs (interpreted evaluation; SCALE.md round-5). Pinned
    explicitly since r17: the OPERATOR default resolves to the arrow
    backend (one ArrowEvalPython, zero shuffle), asserted below."""
    from kamu_engine_datafusion_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        minhash_signatures(docs, layout="explode").explain("formatted")
    p = buf.getvalue()
    assert p.count("HashAggregate") >= 2  # partial + final min aggregates

    # r17 default (layout=None → arrow for xxhash64): one vectorized
    # ArrowEvalPython node, no aggregate and no exchange at all.
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        minhash_signatures(docs).explain("formatted")
    p = buf.getvalue()
    assert "ArrowEvalPython" in p
    assert "HashAggregate" not in p
    assert "Exchange" not in p


def test_semantic_dedup_assignment_no_exchange_before_grouping(spark):
    """Nearest-seed assignment is in-row: the only exchanges are the
    cluster-bucket grouping, the pair distinct, and the verify joins —
    never an n×k assignment shuffle (no window over vec_id)."""
    from kamu_engine_datafusion_spark.operators.dedup import semantic_dedup

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        semantic_dedup(emb, num_seeds=4, threshold=0.4).explain("formatted")
    p = buf.getvalue()
    assert "Window" not in p  # assignment never becomes a window shuffle


def test_stratified_exact_single_exchange(spark):
    """Rank and stratum-size windows share one exchange on the stratum."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        stratified_sample_exact,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        stratified_sample_exact(docs, "doc_id", "lang", 0.3).explain("formatted")
    p = buf.getvalue()
    import re

    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert len(re.findall(r"\(\d+\) Window", p)) == 2


def test_scd2_single_exchange(spark):
    """history_intervals: the lead window is the only exchange."""
    import re

    from kamu_engine_datafusion_spark.operators.snapshot import (
        history_intervals,
    )

    led = spark.createDataFrame(
        [(0, 0, None, None, "k", 1)],
        "offset long, op int, system_time timestamp, "
        "event_time timestamp, city string, population long",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        history_intervals(led, "city").explain("formatted")
    assert len(re.findall(r"\(\d+\) Exchange", buf.getvalue())) == 1


def test_pack_sequences_single_exchange(spark):
    """Running-offset chunking: one exchange on the partition key."""
    import re

    from kamu_engine_datafusion_spark.operators.sampling import pack_sequences

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pack_sequences(
            docs.withColumn("cost", docs.n_chars), "doc_id", "cost", 2048, "lang"
        ).explain("formatted")
    assert len(re.findall(r"\(\d+\) Exchange", buf.getvalue())) == 1


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_temperature_sample_broadcasts_cuts(spark):
    """The per-stratum cut table broadcasts; the corpus never shuffles
    (its only exchanges feed the tiny count aggregate / broadcast)."""
    from kamu_engine_datafusion_spark.operators.sampling import (
        temperature_sample,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _explain(temperature_sample(docs, "doc_id", "lang"))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_cap_per_group_single_exchange(spark):
    """One shuffle on the group key; rank window rides it."""
    import re

    from kamu_engine_datafusion_spark.operators.sampling import cap_per_group

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _explain(cap_per_group(docs, "doc_id", "source", 15))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1


def test_bm25_broadcasts_stats_and_dfreq(spark):
    """Corpus stats and the per-term DF table broadcast; the only
    big-data exchange is the (doc, term) aggregation of the
    query-term-filtered token stream."""
    from kamu_engine_datafusion_spark.operators.retrieval import bm25_scores

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _explain(bm25_scores(docs, ["vector", "merge"]))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    # the isin() query-term filter is applied before the first aggregate
    assert "__t IN" in p.replace("\n", " ") or "isin" in p or "IN (" in p


def test_tfidf_single_tokenize_pass_and_topk_window(spark):
    """The (doc, term) tf table is materialized so BOTH its consumers
    (score join + document-frequency aggregate) read the cache — the
    corpus tokenize+explode runs ONCE, not per consumer. The per-doc
    top-k prunes via WindowGroupLimit (rank-limit pushdown), not a full
    window materialization. (At sf0.001 the vocab-sized DF table
    broadcasts; at scale AQE/statistics flip that join to shuffle —
    both are the right plan for their size.)"""
    from kamu_engine_datafusion_spark.operators.retrieval import (
        tfidf_topk_terms,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _explain(tfidf_topk_terms(docs, k=3))
    assert "InMemoryTableScan" in p
    assert "WindowGroupLimit" in p


def test_duplicate_spans_two_exchanges_only(spark):
    """Substring-span dedup: the gram table shuffles ONCE on the gram
    hash (first-occurrence rank) and the duplicated positions shuffle
    ONCE keyed by doc (interval merge) — no joins back to text, no
    nested-loop pairing."""
    from kamu_engine_datafusion_spark.operators.dedup import duplicate_spans

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        duplicate_spans(docs, min_len=8).explain("formatted")
    p = buf.getvalue()
    assert "NestedLoop" not in p and "Join" not in p
    # detail headers "(n) Exchange": exactly the gram-hash and doc-key ones
    assert p.count(") Exchange") == 2


def test_quantized_topk_scan_tier_no_corpus_shuffle(spark):
    """The quantized scan tier ranks via TakeOrderedAndProject over the
    in-row dequantized codes with a 1-row broadcast query; the corpus
    never hash-shuffles, and the exact tier re-ranks candidates through
    broadcast joins only."""
    p = plan_of(spark, "xsim_quantized_topk")
    assert "TakeOrderedAndProject" in p
    assert "Exchange hashpartitioning" not in p
    assert "BroadcastNestedLoopJoin" in p  # 1-row query broadcast


def test_no_plan_antipatterns_in_verification_window(spark):
    """Global anti-pattern net over the driver's ~50-key verification
    window: no CartesianProduct (an unbroadcast cross join would scan
    quadratically at scale) and no BatchEvalPython (row-at-a-time
    Python UDFs — the sanctioned Python paths are Arrow-batched
    mapInPandas/pandas_udf, which plan as ArrowEvalPython/MapInPandas).
    The full-registry audit runs out-of-band; this pins the hot set.
    """
    from kamu_engine_datafusion_spark import queries as q

    sf = "/root/testdata/sf0.001"
    flagged = {}
    for name, fn in list(q.registry().items())[:50]:
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        hits = [
            p for p in ("CartesianProduct", "BatchEvalPython") if p in plan
        ]
        if hits:
            flagged[name] = hits
    assert not flagged, flagged


def test_interleave_distributed_no_windows(spark):
    """The distributed interleave twin must contain NO window operator
    anywhere in its physical plan — the serial form's partitionBy-less
    Window (a single-task total sort) is exactly what it exists to
    remove; order comes from range exchanges + two-pass arithmetic."""
    from pyspark.sql import functions as F

    from kamu_engine_datafusion_spark.operators.sampling import (
        interleave_sources,
    )

    df = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang")
        .repartition(4)
    )
    out = interleave_sources(
        df, "doc_id", "lang", {"en": 3.0, "de": 1.0}, mode="distributed"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    # and the serial twin DOES carry the window (the documented contrast)
    ser = interleave_sources(
        df, "doc_id", "lang", {"en": 3.0, "de": 1.0}, mode="serial"
    )
    assert "Window" in ser._jdf.queryExecution().executedPlan().toString()


def test_quantile_sketch_broadcast_threshold_partial_counts(spark):
    """r10 quantile sketch: the per-(group, level) count aggregate is
    partial+final (map-side combine caps per-task state at ≤32 longs
    per group) and the tiny per-group threshold table joins back via
    BROADCAST — the corpus is never hash-shuffled by the sketch build."""
    from pyspark.sql import functions as F

    from kamu_engine_datafusion_spark.operators.sketches import (
        quantile_sketch,
    )

    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            F.col("l_returnflag").alias("grp"),
            F.concat("l_orderkey", F.lit("-"), "l_linenumber").alias("rid"),
            F.col("l_quantity").cast("long").alias("val"),
        )
    )
    sk = quantile_sketch(li, ["grp"], "rid", "val", k=64)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sk.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p  # threshold table broadcasts back
    assert "HashAggregate" in p and "partial_count" in p.lower() or (
        "Partial" in p
    )
    # the retained-row side must NOT hashpartition the corpus on grp:
    # the only corpus-wide operator is the scan + in-row level project
    assert p.count("Exchange hashpartitioning(grp") <= 2  # count agg only


def test_b23_ranking_group_limit_matches_direct_window(spark):
    """r17: the restructured b23 (rank-only window + count broadcast +
    arithmetic rank/ntile/percent_rank/cume_dist) is row-identical to
    the direct six-function window and its plan carries the
    WindowGroupLimit pushdown the original shape blocked."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kamu_engine_datafusion_spark.queries.layer_b import q_b23_ranking

    sf_dir = "/root/testdata/sf0.01"
    got = sorted(tuple(r) for r in q_b23_ranking(spark, sf_dir).collect())

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    want = sorted(
        tuple(r)
        for r in orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .filter(F.col("rn") <= 5)
        .collect()
    )
    assert got == want

    p = plan_of(spark, "b23_ranking")
    assert "WindowGroupLimit" in p


def test_b17_branches_match_fused_count_distinct(spark):
    """r17 pinned the three-branch b17 row-identical to the fused
    three-countDistinct aggregate; r18 reverted the query to the fused
    (single-scan) form on the sf1 crossover measurement — the pin now
    runs in the other direction, and the plan must hold ONE lineitem
    scan (the scan count was the reason for the revert)."""
    from pyspark.sql import functions as F

    from kamu_engine_datafusion_spark.queries.layer_b import (
        q_b17_count_distinct,
    )

    sf_dir = "/root/testdata/sf0.01"
    got = sorted(
        tuple(r) for r in q_b17_count_distinct(spark, sf_dir).collect()
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def cd(col, alias):
        return (
            li.select("l_returnflag", col)
            .distinct()
            .groupBy("l_returnflag")
            .agg(F.count(col).alias(alias))
        )

    want = sorted(
        tuple(r)
        for r in cd("l_partkey", "n_parts")
        .join(cd("l_suppkey", "n_supps"), "l_returnflag")
        .join(cd("l_orderkey", "n_orders"), "l_returnflag")
        .collect()
    )
    assert got == want
    # single lineitem scan (the r18 revert's point) — each scan node
    # contributes one InMemoryFileIndex location line
    assert (
        plan_of(spark, "b17_count_distinct").count(
            "Location: InMemoryFileIndex"
        )
        == 1
    )
