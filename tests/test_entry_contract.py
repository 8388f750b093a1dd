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
        "xpack_ffd",  # r7: first-fit fold is not SQL-expressible
    }


def test_all_queries_are_callable():
    for name, fn in E.queries().items():
        assert callable(fn), name


def test_priority_window_is_exhaustive_and_duplicate_free():
    """_PRIORITY is the driver's verification order: a typo'd key would
    silently fall to the registry tail and a missing key would never
    rotate into the window — both must fail loudly here."""
    from collections import Counter

    from kamu_engine_datafusion_spark.queries import _PRIORITY, registry

    r = registry()
    dupes = [k for k, c in Counter(_PRIORITY).items() if c > 1]
    assert not dupes, f"duplicate priority keys: {dupes}"
    unknown = [k for k in _PRIORITY if k not in r]
    assert not unknown, f"priority keys not in registry: {unknown}"
    missing = [k for k in r if k not in set(_PRIORITY)]
    assert not missing, f"registry keys missing from priority: {missing}"


def test_coverage_driver_status_table_is_fresh():
    """COVERAGE.md's generated driver-status section must match the
    CORRECTNESS_r*.json files on disk — a hand-edited or stale table
    (the r3/r5 verdict failure mode) fails here instead of at judging."""
    import subprocess
    import sys

    res = subprocess.run(
        [sys.executable, "tools/driver_status.py", "--check"],
        cwd="/root/repo",
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stdout + res.stderr
