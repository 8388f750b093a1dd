"""clean_text / char_entropy / collocations — ``operators/text.py``."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from kamu_engine_datafusion_spark.operators.text import (
    char_entropy,
    clean_text,
    collocations,
)


def test_clean_text_normal_form(spark):
    rows = [
        (1, "a​b‌c‍d﻿e"),  # zero-width stripped
        (2, "x\x00y\x1fz\x7fw"),  # control chars -> spaces
        (3, "  a\t\tb\nc\r\nd  "),  # tabs/newlines fold + trim
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {r["id"]: r["c"] for r in df.select("id", clean_text("t").alias("c")).collect()}
    assert got[1] == "abcde"
    assert got[2] == "x y z w"
    assert got[3] == "a b c d"
    assert got[4] is None


def test_char_entropy_brute_force(spark):
    texts = {1: "aabb", 2: "aaaa", 3: "abcd", 4: "", 5: None}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_chars"], r["entropy"]) for r in char_entropy(df).collect()}
    for i, t in texts.items():
        n = len(t or "")
        if n:
            cnt = Counter(t)
            h = -sum((c / n) * math.log(c / n) for c in cnt.values())
        else:
            h = 0.0
        assert got[i][0] == n
        assert abs(got[i][1] - h) < 1e-12, (i, got[i], h)
    assert got[2][1] == 0.0  # single-symbol doc: exactly zero


def test_collocations_pmi_brute_force(spark):
    corpus = ["new york new york city", "new york is big", "big city lights"]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    out = collocations(df, min_count=2, top_k=10).collect()
    # brute force
    toks = [t.split() for t in corpus]
    uni = Counter(w for ts in toks for w in ts)
    bg = Counter((a, b) for ts in toks for a, b in zip(ts, ts[1:]))
    n = sum(uni.values())
    btot = sum(bg.values())
    expect = {
        p: math.log((c / btot) / ((uni[p[0]] / n) * (uni[p[1]] / n)))
        for p, c in bg.items()
        if c >= 2
    }
    got = {(r["w1"], r["w2"]): (r["n_pair"], r["pmi"]) for r in out}
    assert set(got) == set(expect)
    for p in got:
        assert got[p][0] == bg[p]
        assert abs(got[p][1] - expect[p]) < 1e-12


def test_collocations_short_docs_yield_no_pairs(spark):
    df = spark.createDataFrame([("solo",), ("",)], "text string")
    assert collocations(df, min_count=1, top_k=10).count() == 0


def test_char_entropy_oracle_parity_on_empty_docs(spark, tmp_path):
    """Engines disagree on splitting '': Spark split → [], DuckDB
    string_split → ['']. The xtext_entropy oracle must filter the
    phantom char so empty/null docs agree with char_entropy (0, 0.0) —
    latent in the driver corpus (no empty docs), pinned here."""
    import duckdb

    from kamu_engine_datafusion_spark.queries.pipeline import ORACLES

    rows = [(1, "aabb"), (2, ""), (3, None), (4, "z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pq_path = str(tmp_path / "documents.parquet")
    import pyarrow as pa
    import pyarrow.parquet as papq

    papq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
            }
        ),
        pq_path,
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq_path}')"
    )
    oracle = {
        (r[0]): (r[1], r[2])
        for r in con.execute(ORACLES["xtext_entropy"]).fetchall()
    }
    got = {
        r["doc_id"]: (r["n_chars"], round(r["entropy"], 6))
        for r in char_entropy(df).collect()
    }
    assert got == oracle
    assert got[2] == (0, 0.0) and got[3] == (0, 0.0)


def test_char_entropy_plan_is_two_exchanges_no_window(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    plan = char_entropy(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Join" not in plan


def test_skipgram_pairs_window2_brute_force(spark):
    from kamu_engine_datafusion_spark.operators.text import (
        skipgram_pairs,
        tokens,
    )

    df = spark.createDataFrame([("a b c d",), ("x y",), ("solo",)], "text string")
    toked = df.select(tokens("text").alias("__tok"))
    got = sorted(
        (r["w1"], r["w2"]) for r in skipgram_pairs(toked, window=2).collect()
    )
    expect = []
    for ts in [["a", "b", "c", "d"], ["x", "y"], ["solo"]]:
        for d in (1, 2):
            expect += [(ts[i], ts[i + d]) for i in range(len(ts) - d)]
    assert got == sorted(expect)


def test_bpe_merges_learns_chained_subwords(spark):
    from kamu_engine_datafusion_spark.operators.text import bpe_merges

    # "low lower lowest" x weights: 'l o' dominates, then chains
    corpus = ["low low low lower lowest", "low lower", "newest newest"]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    out = [tuple(r) for r in bpe_merges(df, num_merges=4).collect()]
    # merge 1: (l, o) appears in every low* word = 7 occurrences
    assert out[0][1:3] == ("l", "o") and out[0][3] == 7
    # merge 2 chains onto the merged symbol: (lo, w) — same 7 words
    assert out[1][1:3] == ("lo", "w") and out[1][3] == 7
    # later merges build on 'est'/'new' material, counts monotone non-up
    ns = [r[3] for r in out]
    assert ns == sorted(ns, reverse=True) or len(set(ns)) > 1


def test_bpe_greedy_left_to_right_on_runs(spark):
    from kamu_engine_datafusion_spark.operators.text import bpe_merges

    # "aaa": after merging (a,a) left-to-right it becomes "aa a",
    # so the second round sees (aa, a) — not (a, aa)
    df = spark.createDataFrame([("aaa aaa aaa",)], "text string")
    out = [tuple(r) for r in bpe_merges(df, num_merges=2).collect()]
    assert out[0][1:3] == ("a", "a")
    assert out[1][1:3] == ("aa", "a")


def test_bpe_batched_equals_sequential(spark):
    """The batched trainer's disjoint-prefix + strict-cut rule must
    reproduce sequential BPE EXACTLY — same pairs, same order, same
    selection-time counts — on a realistic corpus (sf0.001 documents)
    and across batch sizes, including the chained-merge corpora where
    every round's top pairs conflict (batch degrades to top-1)."""
    from kamu_engine_datafusion_spark.operators.text import bpe_merges

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("text")
        .limit(150)
    )
    seq = [tuple(r) for r in bpe_merges(docs, num_merges=12, batch_size=1).collect()]
    for bs in (4, 32):
        got = [
            tuple(r)
            for r in bpe_merges(docs, num_merges=12, batch_size=bs).collect()
        ]
        assert got == seq, f"batch_size={bs} diverged"

    # adversarial: top candidates tie AND conflict ("aaa" run) — the
    # strict cut must force the sequential fallback, not merge both
    runs = spark.createDataFrame([("aaa aaa aaa",)], "text string")
    seq2 = [tuple(r) for r in bpe_merges(runs, num_merges=2, batch_size=1).collect()]
    got2 = [tuple(r) for r in bpe_merges(runs, num_merges=2, batch_size=16).collect()]
    assert got2 == seq2


def test_bpe_batched_uses_fewer_rounds(spark):
    """The batch must actually collapse driver round-trips: on a corpus
    with many disjoint frequent pairs, 8 merges at batch_size=8 should
    finish in far fewer pair-count jobs than 8 (observable via the
    persisted-state chain length — one persist per round)."""
    from unittest.mock import patch

    from kamu_engine_datafusion_spark.operators import text as T

    corpus = [" ".join(["ab cd ef gh ij kl mn op"] * 5)] * 10
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    seq = [tuple(r) for r in T.bpe_merges(df, num_merges=8, batch_size=1).collect()]

    # count rounds by intercepting DataFrame.localCheckpoint (one per
    # round, plus one for the initial word table); patch the CONCRETE
    # class (pyspark 4 instances subclass the pyspark.sql.DataFrame ABC)
    _DF = type(df)

    counts = []
    real_ckpt = _DF.localCheckpoint

    def counting_ckpt(self, *a, **k):
        counts.append(1)
        return real_ckpt(self, *a, **k)

    with patch.object(_DF, "localCheckpoint", counting_ckpt):
        got = [
            tuple(r)
            for r in T.bpe_merges(df, num_merges=8, batch_size=8).collect()
        ]
        batched_rounds = len(counts)
    assert got == seq
    assert batched_rounds >= 2  # the interception is actually measuring
    # 8 fully-disjoint two-char pairs: one batched round (+ the initial
    # word-table checkpoint) instead of 8
    assert batched_rounds <= 3


def test_bpe_encode_compression_monotone(spark):
    from kamu_engine_datafusion_spark.operators.text import (
        bpe_encode_subword_counts,
        bpe_merges,
    )

    df = spark.createDataFrame(
        [("low low lower lowest",), ("newest new news",)], "text string"
    )
    merges = [
        (r["merge_left"], r["merge_right"])
        for r in bpe_merges(df, num_merges=3).collect()
    ]
    n_chars = sum(
        r["n"] for r in bpe_encode_subword_counts(df, []).collect()
    )
    totals = []
    for k in range(len(merges) + 1):
        enc = bpe_encode_subword_counts(df, merges[:k]).collect()
        totals.append(sum(r["n"] for r in enc))
    # zero merges = raw character count; each merge only shrinks totals
    assert totals[0] == n_chars
    assert all(a >= b for a, b in zip(totals, totals[1:]))
    assert totals[-1] < totals[0]


def test_truncate_tokens_boundaries(spark):
    from kamu_engine_datafusion_spark.operators.text import truncate_tokens

    df = spark.createDataFrame(
        [
            (0, "a b c d e"),
            (1, "one  two\tthree"),   # whitespace runs normalize
            (2, "exactly three toks"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["text_trunc"], r["n_tokens_kept"], r["was_truncated"])
        for r in truncate_tokens(df, max_tokens=3).collect()
    }
    assert out[0] == ("a b c", 3, True)
    assert out[1] == ("one two three", 3, False)
    assert out[2] == ("exactly three toks", 3, False)
    assert out[3][1] == 1 and out[3][2] is False  # '' -> one empty token


def test_corpus_card_hand_computed(spark):
    from kamu_engine_datafusion_spark.operators.text import corpus_card

    df = spark.createDataFrame(
        [
            (0, "web", "en", "hello world"),
            (1, "web", "en", "HELLO   world"),  # dup after normalization
            (2, "web", "en", "unique text here"),
            (3, "book", "de", "ein text"),
        ],
        "doc_id long, source string, lang string, text string",
    )
    out = {
        (r["source"], r["lang"]): r
        for r in corpus_card(df, short_doc_tokens=3).collect()
    }
    web = out[("web", "en")]
    assert web["n_docs"] == 3 and web["n_tokens"] == 7
    assert web["n_distinct_texts"] == 2
    assert abs(web["dup_rate"] - 0.3333) < 1e-9
    # 2-token docs are short (< 3), the 3-token one is not
    assert abs(web["pct_short"] - 0.6667) < 1e-9
    assert abs(web["avg_tokens"] - 2.33) < 1e-9
    book = out[("book", "de")]
    assert book["n_docs"] == 1 and book["dup_rate"] == 0.0


def test_corpus_card_approx_mode_close_to_exact(spark):
    """distinct_mode='approx' (the billion-doc-group path) must agree
    with the exact card within HLL error at test cardinalities and
    keep the same schema."""
    from kamu_engine_datafusion_spark.operators.text import corpus_card

    df = spark.createDataFrame(
        [(i, "web", "en", f"unique doc {i} body text") for i in range(500)],
        "doc_id long, source string, lang string, text string",
    )
    exact = corpus_card(df).collect()[0]
    approx = corpus_card(df, distinct_mode="approx").collect()[0]
    assert exact["n_distinct_texts"] == 500
    assert abs(approx["n_distinct_texts"] - 500) <= 25  # ~5% HLL band
    assert set(exact.asDict()) == set(approx.asDict())


def test_vocab_coverage_curve_hand_computed(spark):
    from kamu_engine_datafusion_spark.operators.text import vocab_coverage

    df = spark.createDataFrame(
        [("a a a b b c",), ("a b x",)], "text string"
    )
    # freqs: a=4, b=3, c=1, x=1 (total 9); ties break by token asc
    out = {r["rank"]: (r["token"], r["freq"], r["cum_share"])
           for r in vocab_coverage(df, top_v=3).collect()}
    assert out[1] == ("a", 4, round(4 / 9, 6))
    assert out[2] == ("b", 3, round(7 / 9, 6))
    assert out[3] == ("c", 1, round(8 / 9, 6))
    assert len(out) == 3  # x cut by top_v


def test_tokenizer_fertility_exact_math(spark):
    """Hand-computed fertility on a 2-lang toy corpus, incl. a
    multibyte row (bytes = UTF-8 octets, not chars)."""
    from kamu_engine_datafusion_spark.operators.text import (
        tokenizer_fertility,
    )

    rows = [
        # en: "hello world" -> 2 words; bpe \w{1,4}: hell+o+worl+d = 4
        (1, "en", "hello world"),
        # en: "hi" -> 1 word, 1 subword
        (2, "en", "hi"),
        # zh: 3-char CJK string, no spaces -> 1 word. Java regex \w is
        # ASCII-only (like DuckDB's RE2 — the cross-engine agreement
        # the oracle relies on), so each CJK char matches the
        # punctuation class [^\w\s] -> 3 subwords; 9 UTF-8 bytes.
        (3, "zh", "中文字"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    got = {r["lang"]: r for r in tokenizer_fertility(df).collect()}
    en, zh = got["en"], got["zh"]
    assert (en["n_docs"], en["n_words"], en["n_subwords"]) == (2, 3, 5)
    assert en["n_bytes"] == len("hello world") + len("hi")
    assert en["fertility"] == round(5 / 3, 4) or en["fertility"] == 1.6667
    assert (zh["n_words"], zh["n_subwords"], zh["n_bytes"]) == (1, 3, 9)
    assert zh["bytes_per_subword"] == 3.0


# ---------------------------------------------------------------------------
# r10: within-document repetition signals (the Gopher Table-A1 other half)
# ---------------------------------------------------------------------------


def test_repetition_report_hand_computed(spark):
    from kamu_engine_datafusion_spark.operators.text import (
        repetition_report,
    )

    docs = spark.createDataFrame(
        [
            # doc 1: "ab ab ab ab" — bigram "ab ab" occurs 3x (len 5),
            # text len 11; 4 lines, 2 distinct ("x" dup, "y" dup)
            (1, "x\nx\ny\ny"),
            # doc 2: no repetition at all
            (2, "alpha beta gamma delta"),
            # doc 3: empty text — every signal defined 0
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rep = {
        r["doc_id"]: r.asDict()
        for r in repetition_report(
            docs, top_ns=(2,), dup_ns=(2,)
        ).collect()
    }
    # doc 1: lines [x, x, y, y]: dup_line_frac = (4-2)/4 = 0.5;
    # line chars 4 total, 2 on repeats -> 0.5
    assert rep[1]["dup_line_frac"] == 0.5
    assert rep[1]["dup_line_char_frac"] == 0.5
    # doc 2: no REPEATS anywhere — but the top-gram signal counts the
    # most frequent gram even at count 1 (the paper's definition; its
    # thresholds assume long docs dilute singleton grams): top bigram
    # "alpha beta" = 10 chars of 22
    import math

    assert rep[2]["dup_line_frac"] == 0.0
    assert rep[2]["top_2gram_char_frac"] == (
        math.floor(10 / 22 * 1e6 + 0.5) / 1e6
    )
    assert rep[2]["dup_2gram_char_frac"] == 0.0
    # doc 3: defined zeros, not NULLs
    assert rep[3]["dup_line_frac"] == 0.0
    assert rep[3]["dup_2gram_char_frac"] == 0.0


def test_repetition_report_ngram_fractions(spark):
    from kamu_engine_datafusion_spark.operators.text import (
        repetition_report,
    )

    # "ab ab ab cd": bigrams = ["ab ab","ab ab","ab cd"]; top bigram
    # "ab ab" count 2, len 5 -> load 10; text len 11 -> 10/11
    # dup load: only "ab ab" repeats -> 2*5=10 -> 10/11
    docs = spark.createDataFrame(
        [(1, "ab ab ab cd")], "doc_id long, text string"
    )
    r = repetition_report(docs, top_ns=(2,), dup_ns=(2,)).first()
    import math

    want = math.floor(10 / 11 * 1e6 + 0.5) / 1e6
    assert r["top_2gram_char_frac"] == want
    assert r["dup_2gram_char_frac"] == want


def test_repetition_report_tie_breaks_deterministic(spark):
    from kamu_engine_datafusion_spark.operators.text import (
        repetition_report,
    )

    # two bigrams tie at count 2: "b c" and... construct: "b c b c"
    # has bigrams [b c, c b, b c] -> top is "b c" (count 2).
    # "zz a zz a zz" bigrams: [zz a, a zz, zz a, a zz] — "a zz" and
    # "zz a" tie at 2; smallest gram lexicographically is "a zz"
    # (len 4, load 8), text len 13
    docs = spark.createDataFrame(
        [(1, "zz a zz a zz")], "doc_id long, text string"
    )
    r = repetition_report(docs, top_ns=(2,), dup_ns=(2,)).first()
    import math

    assert r["top_2gram_char_frac"] == math.floor(8 / 12 * 1e6 + 0.5) / 1e6


def test_source_token_tvd_hand_computed(spark):
    from kamu_engine_datafusion_spark.operators.text import (
        source_token_tvd,
    )

    # srcA: tokens a a b   -> p = {a: 2/3, b: 1/3}
    # srcB: tokens a c c c -> q = {a: 1/4, c: 3/4}
    # TVD = 0.5*(|2/3-1/4| + 1/3 + 3/4) = 0.5*(5/12 + 4/12 + 9/12) = 0.75
    docs = spark.createDataFrame(
        [("A", "a a b"), ("B", "a c c c")], "source string, text string"
    )
    r = source_token_tvd(docs, top_v=10).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["src_a"], row["src_b"]) == ("A", "B")
    assert (row["n_tokens_a"], row["n_tokens_b"]) == (3, 4)
    assert row["tvd"] == 0.75


def test_source_token_tvd_identical_and_disjoint(spark):
    from kamu_engine_datafusion_spark.operators.text import (
        source_token_tvd,
    )

    docs = spark.createDataFrame(
        [
            ("A", "x y z"), ("B", "x y z"),  # identical -> 0
            ("C", "q q q"),                  # disjoint from A/B -> 1
        ],
        "source string, text string",
    )
    got = {
        (r["src_a"], r["src_b"]): r["tvd"]
        for r in source_token_tvd(docs, top_v=10).collect()
    }
    assert got[("A", "B")] == 0.0
    assert got[("A", "C")] == 1.0 and got[("B", "C")] == 1.0


def test_source_token_tvd_vocab_restriction(spark):
    from kamu_engine_datafusion_spark.operators.text import (
        source_token_tvd,
    )

    # top_v=1 keeps only the corpus-most-frequent token ("a", 5 hits);
    # within that vocab both sources are 100% "a" -> TVD 0
    docs = spark.createDataFrame(
        [("A", "a a rare1"), ("B", "a a a rare2 rare3")],
        "source string, text string",
    )
    r = source_token_tvd(docs, top_v=1).first()
    assert r["tvd"] == 0.0 and r["n_tokens_a"] == 2 and r["n_tokens_b"] == 3


def test_source_token_tvd_matches_python_reference(spark):
    import random
    from collections import Counter
    from fractions import Fraction

    from kamu_engine_datafusion_spark.operators.text import (
        source_token_tvd,
    )

    rng = random.Random(21)
    vocab_words = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(120):
        src = f"s{i % 4}"
        toks = [rng.choice(vocab_words) for _ in range(rng.randint(3, 25))]
        rows.append((src, " ".join(toks)))
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r["src_a"], r["src_b"]): r["tvd"]
        for r in source_token_tvd(df, top_v=30).collect()
    }
    # python reference in exact rationals
    counts: dict[str, Counter] = {}
    for src, t in rows:
        counts.setdefault(src, Counter()).update(t.split())
    import math

    srcs = sorted(counts)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            ta, tb = sum(counts[a].values()), sum(counts[b].values())
            tvd = Fraction(1, 2) * sum(
                abs(
                    Fraction(counts[a].get(w, 0), ta)
                    - Fraction(counts[b].get(w, 0), tb)
                )
                for w in set(counts[a]) | set(counts[b])
            )
            want = math.floor(float(tvd) * 1e6 + 0.5) / 1e6
            assert abs(got[(a, b)] - want) <= 1e-6, (a, b)
            assert 0.0 <= got[(a, b)] <= 1.0


def test_backoff_from_counts_equals_batch_and_maintained(spark, tmp_path):
    """backoff_score_from_counts over the unified counts frame ==
    stupid_backoff_score bit-for-bit (all three backoff branches
    exercised: attested trigram, bigram backoff, OOV floor); and over
    3-tick maintained_lm_counts state == over batch counts — scoring
    a new crawl tick never re-tokenizes the reference."""
    import os

    from pyspark.sql import functions as F  # noqa: F811

    from kamu_engine_datafusion_spark.operators.text import (
        backoff_score_from_counts,
        lm_ngram_counts,
        stupid_backoff_score,
    )
    from kamu_engine_datafusion_spark.streaming.structured import (
        maintained_lm_counts,
        read_maintained_state,
    )

    rng = __import__("random").Random(23)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran", "far"]

    def doc(i, vv):
        return (i, " ".join(rng.choice(vv) for _ in range(rng.randrange(2, 15))))

    ref_rows = [doc(i, vocab) for i in range(200)]
    # scored corpus: reference-like docs + OOV words (floor branch) +
    # a short doc (< 3 tokens -> NULL score)
    score_rows = (
        [doc(1000 + i, vocab) for i in range(60)]
        + [(2000, "the cat zzyzx"), (2001, "qwfp arst zxcv gggg")]
        + [(2002, "hi")]
    )
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    crawl = spark.createDataFrame(score_rows, "doc_id long, text string")

    want = sorted(
        tuple(r) for r in stupid_backoff_score(crawl, ref).collect()
    )
    got = sorted(
        tuple(r)
        for r in backoff_score_from_counts(
            crawl, lm_ngram_counts(ref)
        ).collect()
    )
    assert got == want
    by_id = dict((r[0], r) for r in got)
    assert by_id[2002][1] == 0 and by_id[2002][2] is None

    ledger_dir = os.path.join(str(tmp_path), "lmled")
    state_dir = os.path.join(str(tmp_path), "lmstate")
    ck = os.path.join(str(tmp_path), "lmck")
    os.makedirs(ledger_dir)

    def tick(rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(ledger_dir)
        maintained_lm_counts(
            ledger_dir, state_dir, ck, "text",
            schema=spark.read.parquet(ledger_dir).schema, spark=spark,
        ).awaitTermination()

    tick(ref_rows[:70])
    tick(ref_rows[70:150])
    tick(ref_rows[150:])
    state = read_maintained_state(spark, state_dir).select(
        "n", "w1", "w2", "w3", "c"
    )
    assert sorted(tuple(r) for r in state.collect()) == sorted(
        tuple(r) for r in lm_ngram_counts(ref).collect()
    )
    live = sorted(
        tuple(r)
        for r in backoff_score_from_counts(crawl, state).collect()
    )
    assert live == want


def test_quality_two_stage_matches_fused(spark):
    """r17: the registered xtext_quality two-stage projection (signals
    materialized once, features/score derived as arithmetic) is
    row-identical to the fused quality_features/quality_score form —
    the restructure halves the regexp evaluations but must not move a
    single bit of any output double."""
    from kamu_engine_datafusion_spark.operators import text as X
    from kamu_engine_datafusion_spark.queries.pipeline import q_xtext_quality

    sf_dir = "/root/testdata/sf0.01"
    got = sorted(
        tuple(r) for r in q_xtext_quality(spark, sf_dir).collect()
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    f = X.quality_features("text")
    want = sorted(
        tuple(r)
        for r in docs.select(
            "doc_id",
            f["n_chars"].cast("long").alias("n_chars"),
            f["n_tokens"].cast("long").alias("n_tokens"),
            F.round(f["punct_ratio"], 6).alias("punct_ratio"),
            F.round(f["stopword_ratio"], 6).alias("stopword_ratio"),
            X.quality_score("text").alias("quality"),
        ).collect()
    )
    assert got == want

    # and the plan actually halves the regexp work: the fused form
    # carries 2 evaluations of each of the 5 regexps, the two-stage
    # form exactly 1 of each
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q_xtext_quality(spark, sf_dir).explain("formatted")
    assert buf.getvalue().count("regexp_extract_all") == 5
