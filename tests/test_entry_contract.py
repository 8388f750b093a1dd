"""Driver-contract sanity: __spark_entry__ must expose a well-formed
entry()/queries()/oracle_sql() triple (this is the interface the
verification driver consumes)."""

from __future__ import annotations

import __spark_entry__ as E


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_queries_oracle_key_consistency():
    qs, os_ = E.queries(), E.oracle_sql()
    assert len(qs) >= 60
    assert set(os_) <= set(qs)  # every oracle belongs to a query
    # the deliberate rows-only set stays small and intentional
    rows_only = set(qs) - set(os_)
    assert rows_only == {
        "b18_approx_agg",
        "xdedup_minhash",
        "xdedup_simhash",
    }


def test_all_queries_are_callable():
    for name, fn in E.queries().items():
        assert callable(fn), name
