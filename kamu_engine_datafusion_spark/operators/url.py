"""URL canonicalization and domain extraction — the crawl-curation
prerequisites (Dolma/RefinedWeb-style pipelines dedup and cap per
registered domain BEFORE any content pass, because a URL-exact or
domain-capped sweep is orders of magnitude cheaper than shingling).

All pure column expressions (regexp/split/lower) — scan speed, no
UDFs, no shuffles, and every rule is replayable in plain SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tracking query parameters stripped during canonicalization — the
#: standard public list (utm_* from Google Analytics, the social-network
#: click ids). Kept deliberately short and documented: canonicalization
#: must be conservative (dropping a load-bearing param would merge
#: distinct pages).
_TRACKING_PARAMS = [
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "fbclid", "gclid", "msclkid", "mc_eid",
    # NOT "ref": it is load-bearing on major sites (GitHub's
    # ?ref=<branch> selects content) — stripping it would merge
    # distinct pages, the exact failure this list exists to avoid.
]

#: Common multi-label public suffixes for the registered-domain
#: approximation (the full Public Suffix List is an external artifact;
#: this covers the high-traffic cases and the approximation is
#: documented at the call sites).
_MULTI_TLDS = [
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.nz", "com.tw",
]


def canonicalize_url(url: Column | str) -> Column:
    """Conservative URL canonical form, as one column expression:

    - scheme and host lowercased (path/query case is preserved — it is
      significant on most servers);
    - explicit default ports dropped (``:80`` for http, ``:443`` for
      https);
    - fragment dropped (never sent to the server);
    - the documented tracking parameters dropped (``utm_*`` and click
      ids), with separators repaired (``?&`` → ``?``, trailing ``?``/
      ``&`` dropped);
    - a single trailing slash on a bare host normalized away
      (``http://a.com/`` ≡ ``http://a.com`` — the ONLY path rewrite:
      deeper-path trailing slashes are preserved, they can be
      load-bearing).

    NULL stays NULL. Deterministic and SQL-replayable; intentionally
    conservative — see the module docstring.
    """
    c = F.col(url) if isinstance(url, str) else url
    # lowercase scheme://host[:port] — the authority is everything up
    # to the first '/', '?' or '#' after the scheme separator
    head = F.regexp_extract(c, r"^([^:/?#]+://[^/?#]*)", 1)
    tail = F.substring(c, F.length(head) + 1, F.lit(1 << 30))
    out = F.concat(F.lower(head), tail)
    # default ports
    out = F.regexp_replace(out, r"^(http://[^/?#]*):80(?=[/?#]|$)", r"$1")
    out = F.regexp_replace(out, r"^(https://[^/?#]*):443(?=[/?#]|$)", r"$1")
    # fragment
    out = F.regexp_replace(out, r"#.*$", "")
    # tracking params (each may sit first or later in the query)
    for p in _TRACKING_PARAMS:
        out = F.regexp_replace(out, rf"([?&]){p}=[^&#]*", r"$1")
    # repair separators left by the strips: '?&'->'?', '&&'->'&',
    # then trailing '?' or '&'
    out = F.regexp_replace(out, r"\?&+", "?")
    out = F.regexp_replace(out, r"&&+", "&")
    out = F.regexp_replace(out, r"[?&]+$", "")
    # bare-host trailing slash
    out = F.regexp_replace(out, r"^([^:/?#]+://[^/?#]+)/$", r"$1")
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(out)


def host_of(url: Column | str) -> Column:
    """Lowercased host (no port, no credentials) of a URL column."""
    c = F.col(url) if isinstance(url, str) else url
    h = F.regexp_extract(F.lower(c), r"^[^:/?#]+://(?:[^@/?#]*@)?([^:/?#]+)", 1)
    return F.when(h == "", F.lit(None).cast("string")).otherwise(h)


def registered_domain(url: Column | str) -> Column:
    """Registered (pay-level) domain of a URL — the per-domain cap /
    dedup key (``cap_per_group`` over this column is the
    RefinedWeb-style domain cap). Approximation: the last two host
    labels, or the last THREE when the last two form a common
    multi-label public suffix (``co.uk`` and friends — the documented
    short list, not the full Public Suffix List, which is an external
    artifact this container does not carry). IP hosts pass through
    whole.
    """
    h = host_of(url)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    is_ip = h.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    last2 = F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(parts, -3),
        F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    multi = F.lit(False)
    for tld in _MULTI_TLDS:
        multi = multi | (last2 == tld)
    return (
        F.when(h.isNull() | is_ip | (n <= 2), h)
        .when(multi & (n >= 3), last3)
        .otherwise(last2)
    )


def dedup_by_url(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-exact dedup after canonicalization: lowest id per canonical
    URL survives — the first (cheapest) pass of a crawl pipeline, run
    before any content shingling. One groupBy(min) + one semi-join on
    the uniform hash of the canonical string."""
    canon = canonicalize_url(url_col).alias("__cu")
    keep = (
        df.select(F.col(id_col), canon)
        .groupBy("__cu")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")
