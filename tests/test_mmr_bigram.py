"""MMR diversification + bigram LM scoring."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from kamu_engine_datafusion_spark.operators.similarity import mmr_diversify
from kamu_engine_datafusion_spark.operators.text import bigram_lm_score


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_mmr_skips_redundant_runner_up(spark):
    # id0 = query direction; id1 nearly identical to id0; id2 orthogonal-ish
    vecs = [
        [1.0, 0.0, 0.0],
        [0.999, 0.01, 0.0],  # highest-relevance near-duplicate pair
        [0.5, 0.86, 0.0],
        [0.4, 0.0, 0.9],
    ]
    df = _emb_df(spark, vecs)
    out = mmr_diversify(
        df, df.filter(F.col("vec_id") == 0), k=3, pool=4, lam=0.3
    ).collect()
    picked = [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # rank 1 is pure relevance (the query itself); with heavy diversity
    # weight the near-duplicate id1 must NOT be rank 2
    assert picked[0] == 0
    assert picked[1] != 1
    assert len(picked) == 3


def test_mmr_rank1_is_top_relevance_and_scores_monotone_structure(spark):
    vecs = [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]]
    df = _emb_df(spark, vecs)
    out = {r["rank"]: r for r in mmr_diversify(
        df, df.filter(F.col("vec_id") == 0), k=2, pool=3, lam=0.7
    ).collect()}
    assert out[1]["vec_id"] == 0
    assert out[1]["mmr"] == out[1]["rel"]  # no diversity term at rank 1


def test_bigram_lm_brute_force(spark):
    corpus = {1: "a b a b", 2: "a b", 3: "b a", 4: "solo"}
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
           for r in bigram_lm_score(df, add_k=0.5).collect()}
    toks = {i: t.split() for i, t in corpus.items()}
    uni = Counter(w for ts in toks.values() for w in ts)
    bg = Counter(p for ts in toks.values() for p in zip(ts, ts[1:]))
    V = len(uni)
    for i, ts in toks.items():
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            assert got[i] == (0, None)
            continue
        lps = [
            math.log((bg[p] + 0.5) / (uni[p[0]] + 0.5 * V)) for p in pairs
        ]
        assert got[i][0] == len(pairs)
        assert abs(got[i][1] - sum(lps) / len(lps)) < 1e-12


def test_bigram_lm_plan_has_no_window(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        bigram_lm_score(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan


def test_stupid_backoff_exact_reference(spark):
    """Hand-replayable fixture: every branch of the backoff CASE fires
    — attested trigram, backed-off bigram, backed-off (seen and OOV)
    unigram — and the scores match an exact python reference."""
    import math

    from kamu_engine_datafusion_spark.operators.text import (
        stupid_backoff_score,
    )

    ref_rows = [
        (100, "a b c a b c a b d"),
        (101, "c a b x y"),
    ]
    tgt_rows = [
        (1, "a b c"),      # attested trigram
        (2, "b c x"),      # trigram unseen, bigram c x unseen, x seen
        (3, "a b zzz"),    # zzz OOV -> add-one unigram floor
        (4, "b d x"),      # trigram unseen, bigram d x unseen, x seen
        (5, "hi"),         # < 3 tokens: no trigrams, null score
    ]
    ref = spark.createDataFrame(ref_rows, ["doc_id", "text"])
    tgt = spark.createDataFrame(tgt_rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_trigrams"], r["avg_logscore"])
        for r in stupid_backoff_score(tgt, ref).collect()
    }

    # python reference over the same counts
    ref_toks = [t.split() for _, t in ref_rows]
    c1, c2, c3 = {}, {}, {}
    for ts in ref_toks:
        for w in ts:
            c1[w] = c1.get(w, 0) + 1
        for i in range(len(ts) - 1):
            c2[(ts[i], ts[i + 1])] = c2.get((ts[i], ts[i + 1]), 0) + 1
        for i in range(len(ts) - 2):
            k = (ts[i], ts[i + 1], ts[i + 2])
            c3[k] = c3.get(k, 0) + 1
    N, V, a = sum(c1.values()), len(c1), 0.4

    def score(w1, w2, w3):
        if c3.get((w1, w2, w3), 0) > 0:
            return math.log(c3[(w1, w2, w3)] / c2[(w1, w2)])
        if c2.get((w2, w3), 0) > 0:
            return math.log(a * c2[(w2, w3)] / c1[w2])
        return math.log(a * a * (c1.get(w3, 0) + 1) / (N + V))

    def hu(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    for doc_id, text in tgt_rows[:4]:
        ts = text.split()
        want = [score(ts[i], ts[i + 1], ts[i + 2]) for i in range(len(ts) - 2)]
        assert got[doc_id][0] == len(want)
        assert got[doc_id][1] == hu(sum(want) / len(want)), doc_id
    assert got[5] == (0, None)
    # ordering sanity: the attested trigram outscores the OOV path
    assert got[1][1] > got[3][1]


def test_distinctive_tokens_finds_planted_vocabulary(spark):
    """Fightin'-Words log-odds: each source's planted marker words must
    top its list; shared filler must not; a z-score computed by an
    exact python replay of the same formula must match half-up 6dp."""
    import math

    from kamu_engine_datafusion_spark.operators.text import (
        distinctive_tokens,
    )

    rows = []
    for i in range(40):
        rows.append((i, "srcA", "common words here plus alpha alpha"))
    for i in range(40, 80):
        rows.append((i, "srcB", "common words here plus beta beta"))
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = distinctive_tokens(df, "source", "text", top_k=3)
    got = {
        (r["grp"], r["token"]): (r["n_in"], r["n_rest"], r["zeta"])
        for r in out.collect()
    }
    top_a = [t for (g, t) in got if g == "srcA"]
    top_b = [t for (g, t) in got if g == "srcB"]
    assert "alpha" in top_a and "beta" not in top_a
    assert "beta" in top_b and "alpha" not in top_b

    # exact replay of zeta for ('srcA', 'alpha'), counts derived from
    # the fixture rows
    toks = [(s, w) for _, s, t in rows for w in t.split()]
    y_in = float(sum(1 for s, w in toks if s == "srcA" and w == "alpha"))
    y_all = float(sum(1 for _, w in toks if w == "alpha"))
    n_i = float(sum(1 for s, _ in toks if s == "srcA"))
    n_all = float(len(toks))
    a0 = 0.01 * n_all
    pr = a0 * y_all / n_all
    yi, di = y_in + pr, n_i + a0 - (y_in + pr)
    yj, dj = (y_all - y_in) + pr, (n_all - n_i) + a0 - ((y_all - y_in) + pr)
    delta = math.log(yi / di) - math.log(yj / dj)
    zeta = delta / math.sqrt(1.0 / yi + 1.0 / yj)
    want = math.floor(zeta * 1e6 + 0.5) / 1e6
    assert got[("srcA", "alpha")] == (int(y_in), int(y_all - y_in), want)


def test_distinctive_tokens_empty_input(spark):
    """An empty (or all-NULL-text) frame returns an empty result with
    the output schema — sum() yields NULL and must not TypeError."""
    from kamu_engine_datafusion_spark.operators.text import (
        distinctive_tokens,
    )

    df = spark.createDataFrame(
        [], "doc_id long, source string, text string"
    )
    out = distinctive_tokens(df, "source", "text", top_k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "grp", "token", "n_in", "n_rest", "zeta",
    ]
    # all-NULL text behaves the same (explode of NULL emits nothing)
    df2 = spark.createDataFrame(
        [(1, "srcA", None)], "doc_id long, source string, text string"
    )
    assert distinctive_tokens(df2, "source", "text").count() == 0
