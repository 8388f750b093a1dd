"""URL canonicalization / domain extraction — the crawl-curation
prerequisites, pinned case by case."""

from __future__ import annotations

from kamu_engine_datafusion_spark.operators.url import (
    canonicalize_url,
    dedup_by_url,
    host_of,
    registered_domain,
)


def _one(spark, fn, url):
    return (
        spark.createDataFrame([(url,)], "url string")
        .select(fn("url").alias("v"))
        .first()["v"]
    )


def test_canonicalize_url_cases(spark):
    cases = [
        # scheme+host lowercased, path case preserved
        ("HTTP://ExAmple.COM/Path/File", "http://example.com/Path/File"),
        # default ports dropped; non-default kept
        ("http://a.com:80/x", "http://a.com/x"),
        ("https://a.com:443/x", "https://a.com/x"),
        ("http://a.com:8080/x", "http://a.com:8080/x"),
        # fragment dropped
        ("http://a.com/x#sec-2", "http://a.com/x"),
        # tracking params stripped, separators repaired
        (
            "http://a.com/x?utm_source=tw&id=5&fbclid=abc",
            "http://a.com/x?id=5",
        ),
        ("http://a.com/x?utm_source=tw", "http://a.com/x"),
        ("http://a.com/x?gclid=1&utm_medium=m", "http://a.com/x"),
        # load-bearing params survive
        ("http://a.com/x?page=2&sort=asc", "http://a.com/x?page=2&sort=asc"),
        # bare-host trailing slash normalized; deeper slashes preserved
        ("http://a.com/", "http://a.com"),
        ("http://a.com/dir/", "http://a.com/dir/"),
        (None, None),
    ]
    for raw, want in cases:
        assert _one(spark, canonicalize_url, raw) == want, raw


def test_host_and_registered_domain(spark):
    cases = [
        ("http://www.example.com/x", "www.example.com", "example.com"),
        ("https://news.BBC.co.uk/y", "news.bbc.co.uk", "bbc.co.uk"),
        ("http://a.b.c.com.au:8080/", "a.b.c.com.au", "c.com.au"),
        ("http://localhost/x", "localhost", "localhost"),
        ("http://192.168.0.1/x", "192.168.0.1", "192.168.0.1"),
        ("http://user:pw@sub.site.org/p", "sub.site.org", "site.org"),
        (None, None, None),
    ]
    for raw, want_host, want_dom in cases:
        assert _one(spark, host_of, raw) == want_host, raw
        assert _one(spark, registered_domain, raw) == want_dom, raw


def test_dedup_by_url_keeps_lowest_id_per_canonical(spark):
    rows = [
        (1, "http://A.com/x?utm_source=t"),
        (2, "http://a.com/x"),            # same canonical as 1
        (3, "http://a.com/x#frag"),       # same canonical as 1
        (4, "http://a.com/y"),            # distinct
        (5, "http://a.com/x?page=2"),     # distinct (real param)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    kept = sorted(r["doc_id"] for r in dedup_by_url(df).collect())
    assert kept == [1, 4, 5]


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_label = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABC0123456789-", min_size=1,
    max_size=8,
).filter(lambda s: not s.startswith("-") and not s.endswith("-"))
_urls = st.builds(
    lambda scheme, labels, port, path, params, frag: (
        f"{scheme}://{'.'.join(labels)}"
        + (f":{port}" if port else "")
        + ("/" + "/".join(path) if path else "")
        + ("?" + "&".join(f"{k}={v}" for k, v in params) if params else "")
        + (f"#{frag}" if frag else "")
    ),
    scheme=st.sampled_from(["http", "https", "HTTP", "HtTpS"]),
    labels=st.lists(_label, min_size=1, max_size=4),
    port=st.sampled_from([None, 80, 443, 8080]),
    path=st.lists(_label, min_size=0, max_size=3),
    params=st.lists(
        st.tuples(
            st.sampled_from(["id", "page", "utm_source", "fbclid", "q"]),
            _label,
        ),
        min_size=0,
        max_size=4,
    ),
    frag=st.sampled_from([None, "top", "sec-2"]),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(urls=st.lists(_urls, min_size=1, max_size=25))
def test_canonicalize_url_idempotent(spark, urls):
    """canon(canon(u)) == canon(u) for ANY structured URL — the core
    canonicalization contract (a non-idempotent canonicalizer makes
    dedup keys depend on how many passes ran)."""
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonicalize_url("url").alias("c1"))
    twice = once.select(canonicalize_url("c1").alias("c2"))
    a = [r["c1"] for r in once.collect()]
    b = [r["c2"] for r in twice.collect()]
    assert sorted(a) == sorted(b)
