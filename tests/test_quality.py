"""Data-quality expectation suite — ``operators/quality.py``."""

from __future__ import annotations

import os

from kamu_engine_datafusion_spark.operators.quality import dq_report


def _df(spark):
    rows = [
        (1, "a@x.com", 5.0, "US"),
        (2, "b@x.com", 7.5, "DE"),
        (2, "bad-email", 120.0, "XX"),  # dup id, bad regex, range, value
        (None, None, None, "US"),  # null id; null email/value don't violate range/regex
    ]
    return spark.createDataFrame(rows, "id long, email string, score double, country string")


def test_dq_report_every_check_kind(spark):
    ref = spark.createDataFrame([(1,), (2,)], "rid long")
    rep = {
        (r["check"], r["column"]): (r["n_violations"], r["ok"])
        for r in dq_report(
            _df(spark),
            not_null=["id"],
            unique=["id"],
            ranges={"score": (0.0, 100.0)},
            accepted={"country": ["US", "DE"]},
            patterns={"email": r"^[^@]+@[^@]+\.[a-z]+$"},
            foreign_keys=[("id", ref, "rid")],
        ).collect()
    }
    assert rep[("not_null", "id")] == (1, False)
    assert rep[("unique", "id")] == (1, False)  # one duplicated row
    assert rep[("range", "score")] == (1, False)
    assert rep[("accepted_values", "country")] == (1, False)
    assert rep[("regex", "email")] == (1, False)
    assert rep[("foreign_key", "id")] == (0, True)  # 1,2 both exist
    assert all(r[0] == 4 or r[0] >= 0 for r in rep.values())


def test_dq_fk_orphans_counted(spark):
    ref = spark.createDataFrame([(1,)], "rid long")
    rep = {
        r["check"]: r["n_violations"]
        for r in dq_report(_df(spark), foreign_keys=[("id", ref, "rid")]).collect()
    }
    assert rep["foreign_key"] == 2  # the two id=2 rows are orphans


def test_dq_all_green_on_clean_table(spark):
    df = spark.createDataFrame([(1, "US"), (2, "DE")], "id long, c string")
    out = dq_report(
        df, not_null=["id"], unique=["id"], accepted={"c": ["US", "DE"]}
    ).collect()
    assert all(r["ok"] for r in out)


def test_dq_row_level_checks_share_one_scan(spark, tmp_path):
    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    p = os.path.join(str(tmp_path), "t.parquet")
    df.write.parquet(p)
    t = spark.read.parquet(p)
    # the row-level pass executes eagerly; assert it really was ONE job
    # over ONE scan by checking the report frame is a local literal
    # table (no lingering scan of the input at all)
    rep = dq_report(t, not_null=["id"], ranges={"v": (0, 10)}, unique=["id"])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "FileScan parquet" not in plan  # report is a literal table
    assert rep.count() == 3
