"""SQL-callable registered helper functions (the engine's UDF surface),
usable inside multi-step SQL transforms."""

from __future__ import annotations

import pytest

from kamu_engine_datafusion_spark.functions.register import register_udfs
from kamu_engine_datafusion_spark.operators.text import fingerprint
from pyspark.sql import functions as F


def test_udfs_callable_from_sql(spark):
    register_udfs(spark)
    spark.createDataFrame(
        [(1, [1.0, 0.0], [1.0, 0.0], "hello  World hello")],
        ["id", "a", "b", "txt"],
    ).createOrReplaceTempView("udf_t")
    row = spark.sql(
        "SELECT odf_cosine(a, b) AS c, odf_token_count(txt) AS n, "
        "odf_fingerprint(txt) AS fp FROM udf_t"
    ).head()
    assert row["c"] == pytest.approx(1.0)
    assert row["n"] == 3
    assert len(row["fp"]) == 32


def test_udf_fingerprint_matches_column_builder(spark):
    """The pandas-UDF fingerprint and the codegen Column fingerprint
    agree (same normalization + sorted token set + md5)."""
    register_udfs(spark)
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma  alpha beta")], ["id", "txt"]
    )
    rows = df.select(
        F.expr("odf_fingerprint(txt)").alias("udf_fp"),
        fingerprint("txt").alias("col_fp"),
    ).collect()
    for r in rows:
        assert r["udf_fp"] == r["col_fp"]
