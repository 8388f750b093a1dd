"""Changelog-aware aggregation (incremental MV maintenance) —
``operators/changelog.py``.

Covers the signed-weight semantics against a hand-built retractable
ledger and the mergeability property that makes the operator
incremental: agg(full ledger) == merge(agg(slice A), agg(slice B)).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kamu_engine_datafusion_spark.operators.changelog import (
    changelog_agg,
    merge_changelog_aggs,
)

# (offset, op, key, value) — op: 0 append, 1 retract, 2/3 correction
LEDGER_ROWS = [
    (0, 0, "a", 10.5),
    (1, 0, "a", 2.25),
    (2, 0, "b", 7.0),
    (3, 1, "a", 10.5),  # retract offset 0's record
    (4, 2, "b", 7.0),  # correct 7.0 -> 9.0
    (5, 3, "b", 9.0),
    (6, 0, "c", 1.0),
    (7, 1, "c", 1.0),  # group c fully retracted
]


def _ledger(spark, rows=LEDGER_ROWS):
    return spark.createDataFrame(
        rows, "offset long, op int, k string, value double"
    )


def test_changelog_agg_signed_semantics(spark):
    out = changelog_agg(
        _ledger(spark), ["k"], {"value_sum": "value"}
    ).orderBy("k")
    got = [(r["k"], r["n_live"], r["value_sum"]) for r in out.collect()]
    # a: appends 10.5+2.25, retract 10.5 -> 1 live, 2.25
    # b: append 7.0, correction 7.0->9.0 -> 1 live, 9.0
    # c: cancelled entirely -> dropped
    assert got == [("a", 1, 2.25), ("b", 1, 9.0)]


def test_changelog_agg_keeps_dead_groups_when_asked(spark):
    out = changelog_agg(
        _ledger(spark), ["k"], {"value_sum": "value"}, keep_dead_groups=True
    )
    dead = {r["k"]: r["n_live"] for r in out.collect()}
    assert dead["c"] == 0


def test_merge_equals_full_recompute(spark):
    full = changelog_agg(_ledger(spark), ["k"], {"value_sum": "value"})
    lo = _ledger(spark).filter(F.col("offset") <= 3)
    hi = _ledger(spark).filter(F.col("offset") > 3)
    state = changelog_agg(lo, ["k"], {"value_sum": "value"}, keep_dead_groups=True)
    inc = changelog_agg(hi, ["k"], {"value_sum": "value"}, keep_dead_groups=True)
    merged = merge_changelog_aggs(state, inc, ["k"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_changelog_agg_single_exchange_plan(spark):
    """The whole operator is scan → partial agg → ONE exchange → final
    agg (+ the n_live filter): no window, no join, no second shuffle."""
    plan = changelog_agg(
        _ledger(spark), ["k"], {"value_sum": "value"}
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Window" not in plan and "Join" not in plan


def test_cdc_roundtrip_into_changelog_agg(spark):
    """CDC adapter → changelog aggregation end to end: creates, an
    update, and a delete resolve to the correct live state."""
    from kamu_engine_datafusion_spark.operators.changelog import (
        cdc_to_ledger,
    )

    rows = [
        (1, "c", None, {"k": "a", "v": 10.0}),
        (2, "c", None, {"k": "b", "v": 5.0}),
        (3, "u", {"k": "a", "v": 10.0}, {"k": "a", "v": 12.0}),
        (4, "d", {"k": "b", "v": 5.0}, None),
        (5, "x", None, None),  # unknown op: dropped
    ]
    schema = (
        "seq long, op string, "
        "before struct<k: string, v: double>, "
        "after struct<k: string, v: double>"
    )
    ledger = cdc_to_ledger(spark.createDataFrame(rows, schema))
    got = sorted(
        (r["seq"], r["__half"], r["op"], r["k"], r["v"])
        for r in ledger.collect()
    )
    assert got == [
        (1, 0, 0, "a", 10.0),
        (2, 0, 0, "b", 5.0),
        (3, 0, 2, "a", 10.0),  # correct-from: the before image
        (3, 1, 3, "a", 12.0),  # correct-to: the after image
        (4, 0, 1, "b", 5.0),
    ]
    state = changelog_agg(ledger, ["k"], {"vs": "v"})
    assert sorted(map(tuple, state.collect())) == [("a", 1, 12.0)]


def test_snapshot_diff_classifies_and_pairs(spark):
    from kamu_engine_datafusion_spark.operators.changelog import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, None)],
        "k long, v double",
    )
    new = spark.createDataFrame(
        [(2, 20.0), (3, 31.0), (4, None), (5, 50.0)],
        "k long, v double",
    )
    rows = sorted(
        tuple(r) for r in snapshot_diff(old, new, "k").collect()
    )
    assert rows == sorted(
        [
            (0, 0, 5, 50.0),  # append: key only in new
            (1, 0, 1, 10.0),  # retract: key only in old
            (2, 0, 3, 30.0),  # correction pair for the changed value
            (3, 1, 3, 31.0),
            # keys 2 (equal) and 4 (null == null, null-safe) emit nothing
        ]
    )


def test_snapshot_diff_roundtrips_through_snapshot(spark):
    """The defining property: appending the diff changelog to a ledger
    whose snapshot is `old` must make the snapshot equal `new`."""
    from pyspark.sql import functions as F

    from kamu_engine_datafusion_spark.operators.changelog import (
        snapshot_diff,
    )
    from kamu_engine_datafusion_spark.operators.snapshot import (
        snapshot_of_ledger,
    )

    old_rows = [(1, 10.0), (2, 20.0), (3, 30.0)]
    new_rows = [(2, 21.0), (3, 30.0), (9, 90.0)]
    old = spark.createDataFrame(old_rows, "k long, v double")
    new = spark.createDataFrame(new_rows, "k long, v double")

    base = spark.createDataFrame(
        [(i, 0, k, v) for i, (k, v) in enumerate(old_rows)],
        "offset long, op int, k long, v double",
    ).withColumn("system_time", F.lit(None).cast("timestamp"))

    diff = snapshot_diff(old, new, "k")
    w_rows = sorted(
        tuple(r) for r in diff.collect()
    )  # (op, __half, k, v) — order pairs by (k, __half)
    appended = [
        (100 + i, op, k, v)
        for i, (op, half, k, v) in enumerate(
            sorted(w_rows, key=lambda t: (t[2], t[1]))
        )
    ]
    ledger = base.unionByName(
        spark.createDataFrame(
            appended, "offset long, op int, k long, v double"
        ).withColumn("system_time", F.lit(None).cast("timestamp"))
    )
    got = sorted(
        (r["k"], r["v"]) for r in snapshot_of_ledger(ledger, "k").collect()
    )
    assert got == sorted(new_rows)
