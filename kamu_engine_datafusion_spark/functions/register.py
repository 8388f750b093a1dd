"""SQL-callable helper functions.

The reference's only extension mechanism is registering a prebuilt
scalar-function package into the session (``src/engine.rs:51``,
datafusion-functions-json). The Spark equivalent is ``spark.udf.register``
— this module registers the engine's helper functions so multi-step SQL
transforms can call them by name (``SELECT odf_cosine(a, b) …``).

Vectorized Pandas UDFs (Arrow batches + NumPy) — the sanctioned slow
path; the Column-builder equivalents in ``functions.columns`` remain the
fast path for DataFrame-API callers.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.DoubleType())
def _odf_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
    import numpy as np

    def cos(u, v):
        if u is None or v is None:
            return None
        u = np.asarray(u, dtype="float64")
        v = np.asarray(v, dtype="float64")
        nu, nv = np.linalg.norm(u), np.linalg.norm(v)
        if nu == 0 or nv == 0:
            return None
        return float(np.dot(u, v) / (nu * nv))

    return pd.Series([cos(u, v) for u, v in zip(a, b)])


@pandas_udf(T.LongType())
def _odf_token_count(s: pd.Series) -> pd.Series:
    return s.fillna("").str.strip().str.lower().str.split(r"\s+").map(len).astype("int64")


@pandas_udf(T.StringType())
def _odf_fingerprint(s: pd.Series) -> pd.Series:
    import hashlib

    def fp(text: str | None) -> str | None:
        if text is None:
            return None
        toks = sorted(set(text.strip().lower().split()))
        return hashlib.md5(" ".join(toks).encode()).hexdigest()

    return s.map(fp)


def register_udfs(spark: SparkSession) -> None:
    """Register the helper functions for SQL use (idempotent)."""
    spark.udf.register("odf_cosine", _odf_cosine)
    spark.udf.register("odf_token_count", _odf_token_count)
    spark.udf.register("odf_fingerprint", _odf_fingerprint)
