"""Data-quality expectation checks — the dbt-test / Great-Expectations
core, engine-side, in as few passes as the checks allow.

A pipeline gates ingest ticks on expectations: null-rate, uniqueness,
value ranges, accepted sets, format regexes, referential integrity.
The operator returns a LONG-format report (one row per check) so the
gate is a single ``pass = bool_and(ok)`` downstream — and the report
itself is a table you can ledger (append per tick, trend over time).

Scale shape: all row-level checks (not-null, range, accepted values,
regex) compile into ONE aggregate over ONE scan — adding a check adds
a sum column, not a pass. Uniqueness rides the same aggregate as
``count − count_distinct`` (exact by contract: uniqueness feeds key
decisions; swap to ``approx_count_distinct`` upstream for quick-look
monitoring). Each foreign-key check is one anti-join counted per ref
table — the only per-check passes, keyed on the FK (broadcast when the
dimension is small, AQE decides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dq_report(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[str] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    accepted: dict[str, list] | None = None,
    patterns: dict[str, str] | None = None,
    foreign_keys: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Run the configured expectations; returns
    ``(check, column, n_rows, n_violations, ok)``.

    - ``not_null``: columns that must never be null
    - ``unique``: columns whose non-null values must be distinct
      (violations = duplicated rows beyond each first occurrence)
    - ``ranges``: ``col → (lo, hi)`` closed interval (nulls don't
      violate range checks — pair with ``not_null`` to forbid them)
    - ``accepted``: ``col → allowed values``
    - ``patterns``: ``col → regex`` the full value must match
    - ``foreign_keys``: ``(col, ref_df, ref_col)`` — every non-null
      value must exist in the reference column
    """
    spark = df.sparkSession
    aggs = [F.count(F.lit(1)).alias("__n")]
    labels: list[tuple[str, str]] = []

    def add(kind: str, col: str, violation) -> None:
        i = len(labels)
        aggs.append(
            F.sum(F.when(violation, 1).otherwise(0)).cast("long").alias(f"__v{i}")
        )
        labels.append((kind, col))

    for c in not_null or []:
        add("not_null", c, F.col(c).isNull())
    for c, (lo, hi) in (ranges or {}).items():
        add("range", c, F.col(c).isNotNull() & ~F.col(c).between(lo, hi))
    for c, vals in (accepted or {}).items():
        add("accepted_values", c, F.col(c).isNotNull() & ~F.col(c).isin(vals))
    for c, pat in (patterns or {}).items():
        add("regex", c, F.col(c).isNotNull() & ~F.col(c).rlike(pat))
    uniq_aliases = []
    for c in unique or []:
        i = len(uniq_aliases)
        aggs.append(
            (
                F.count(F.col(c)) - F.count_distinct(F.col(c))
            ).cast("long").alias(f"__u{i}")
        )
        uniq_aliases.append(c)

    # Execute the single-pass aggregate EAGERLY (it reduces to one row):
    # a lazy union of k SELECTs over the same aggregate frame would
    # inline the aggregate — and its full scan — once per report row
    # (measured: 3 checks = 3 FileScans). Collecting the 1-row result
    # and emitting the report as a literal local table keeps the data
    # pass at exactly one scan; a quality gate is a terminal action
    # anyway.
    stats = df.agg(*aggs).collect()[0]
    n_rows = int(stats["__n"])
    local = [
        (kind, c, n_rows, int(stats[f"__v{i}"]), stats[f"__v{i}"] == 0)
        for i, (kind, c) in enumerate(labels)
    ] + [
        ("unique", c, n_rows, int(stats[f"__u{i}"]), stats[f"__u{i}"] == 0)
        for i, c in enumerate(uniq_aliases)
    ]
    schema = (
        "check string, column string, n_rows long, n_violations long, "
        "ok boolean"
    )
    out = spark.createDataFrame(local, schema) if local else None
    for col, ref_df, ref_col in foreign_keys or []:
        orphans = (
            df.filter(F.col(col).isNotNull())
            .join(
                ref_df.select(F.col(ref_col).alias(col)).distinct(),
                col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("__o"))
        )
        branch = orphans.select(
            F.lit("foreign_key").alias("check"),
            F.lit(col).alias("column"),
            F.lit(n_rows).cast("long").alias("n_rows"),
            F.col("__o").alias("n_violations"),
            (F.col("__o") == 0).alias("ok"),
        )
        out = branch if out is None else out.unionByName(branch)
    if out is None:
        return spark.createDataFrame([], schema)
    return out
