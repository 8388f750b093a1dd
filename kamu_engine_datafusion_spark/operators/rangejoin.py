"""Bucketized interval (range) join: points matched to containing
intervals WITHOUT a theta join.

A naive ``p.ts >= i.start AND p.ts < i.end`` join has no equi-key, so
Spark plans BroadcastNestedLoopJoin (fine for tiny interval sets, fatal
once both sides are large). The standard scale formulation buckets the
time axis:

- every interval registers in each fixed-width bucket it overlaps
  (``explode(sequence(bucket(start), bucket(end-ε)))`` — replication
  factor = interval length / bucket width, bounded and chosen);
- every point lands in exactly ONE bucket;
- the join becomes an equi-join on the bucket id, followed by the exact
  containment predicate as a post-filter.

No duplicate pairs are produced (a point exists in one bucket, an
interval registers at most once per bucket), so the result is exactly
the theta-join result while shuffling on a uniform integer key. Pick
``bucket_seconds`` near the typical interval length: shorter buckets
cut false candidates, longer buckets cut interval replication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    point_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 7 * 86400,
) -> DataFrame:
    """Join each point (timestamp column ``point_col``) to every
    interval with ``start <= point < end``. Returns the point columns
    plus the interval columns.
    """
    # bucket on MICROSECONDS: unix_timestamp truncates to whole seconds,
    # which with sub-second data would drop an interval's fractional tail
    # from its final bucket (points there would silently miss). unix_micros
    # preserves full timestamp precision — but it requires TIMESTAMP, and
    # parquet-loaded columns often resolve as TIMESTAMP_NTZ; with the
    # session TZ pinned to UTC the NTZ→TZ cast is value-identical.
    w = F.lit(bucket_seconds * 1_000_000).cast("long")
    p_epoch = F.unix_micros(F.col(point_col).cast("timestamp"))
    s_epoch = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_epoch = F.unix_micros(F.col(end_col).cast("timestamp"))

    binned_intervals = intervals.filter(
        # empty/inverted intervals contain no point; dropping them up
        # front also stops sequence() from generating a DESCENDING run
        # of useless buckets when end <= start
        F.col(end_col) > F.col(start_col)
    ).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(s_epoch / w),
                # end is exclusive: an interval ending exactly on a bucket
                # boundary (to the microsecond) does not reach into the
                # next bucket
                F.floor((e_epoch - 1) / w),
            )
        ),
    )
    binned_points = points.withColumn("__bucket", F.floor(p_epoch / w))
    return (
        binned_points.join(binned_intervals, "__bucket")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("__bucket")
    )


def merge_intervals(
    df: DataFrame,
    start_col: str,
    end_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Consolidate overlapping/touching intervals per group into their
    union islands — the interval-algebra normalizer (maintenance
    windows, user activity spans, span-dedup post-processing all reduce
    to it). Intervals are closed; ``[1,5]`` and ``[5,9]`` merge.

    Classic single-window formulation: order by start within each
    group, an interval starts a NEW island iff its start exceeds the
    running max of previous ends; the island id is the running count of
    such breaks; islands aggregate to (min start, max end, n).

    One group-keyed shuffle; both windows and the final aggregate share
    it. Inverted rows (end < start) are dropped up front, like
    :func:`interval_join`.
    """
    group_cols = group_cols or []
    s, e = F.col(start_col), F.col(end_col)
    valid = df.filter(e >= s)
    w = Window.partitionBy(*group_cols).orderBy(s, e)
    prev_max_end = F.max(e).over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = valid.withColumn(
        "__new_island",
        F.when(prev_max_end.isNull() | (s > prev_max_end), 1).otherwise(0),
    )
    island = F.sum("__new_island").over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        flagged.withColumn("__island", island)
        .groupBy(*group_cols, "__island")
        .agg(
            F.min(s).alias(start_col),
            F.max(e).alias(end_col),
            F.count(F.lit(1)).cast("long").alias("n_merged"),
        )
        .withColumnRenamed("__island", "island")
        .withColumn("island", F.col("island").cast("long"))
    )


def intervals_increment(
    state: DataFrame | None,
    tick: DataFrame,
    start_col: str,
    end_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """One consolidation tick against per-group disjoint-island state —
    the maintained form of :func:`merge_intervals` (``streaming.
    structured.maintained_intervals``'s merge law): ``state`` rows are
    consolidated islands ``(group…, island, start, end, n_merged)``
    (None for the first tick), ``tick`` is a new batch of raw
    intervals, and the output is the REPLACEMENT island rows for every
    group present in either input.

    The fold law: interval-union geometry is a pure function of the
    input SET — ``consolidate(A ∪ B) == consolidate(consolidate(A) ∪
    B)`` — so ticks may arrive in ANY order and the folded islands
    equal the batch :func:`merge_intervals` of the whole ledger
    row-for-row, island ids included (ids renumber by start order,
    which is exactly the batch running-break index). Geometry is
    therefore semilattice-safe (even a double-applied tick cannot move
    an island boundary); ``n_merged`` is ADDITIVE — state islands
    re-enter the consolidation WEIGHTED by their original-interval
    counts (tick rows weigh 1), so exactly-once for the count column
    rides the fold protocol's replay marker, like every additive
    frame. Inverted tick rows (end < start) are dropped up front,
    exactly like the batch operator.

    Scale: one group-keyed shuffle over ``touched state ∪ tick`` —
    state is islands-sized (bounded by the consolidated geometry, not
    the ledger), and history is never re-merged."""
    group_cols = group_cols or []
    s, e = F.col(start_col), F.col(end_col)
    rows = tick.filter(e >= s).select(
        *group_cols, start_col, end_col,
        F.lit(1).cast("long").alias("__w"),
    )
    if state is not None:
        rows = rows.unionByName(
            state.select(
                *group_cols, start_col, end_col,
                F.col("n_merged").cast("long").alias("__w"),
            )
        )
    w = Window.partitionBy(*group_cols).orderBy(s, e)
    prev_max_end = F.max(e).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = rows.withColumn(
        "__new_island",
        F.when(prev_max_end.isNull() | (s > prev_max_end), 1).otherwise(0),
    )
    island = F.sum("__new_island").over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        flagged.withColumn("__island", island)
        .groupBy(*group_cols, "__island")
        .agg(
            F.min(s).alias(start_col),
            F.max(e).alias(end_col),
            F.sum("__w").cast("long").alias("n_merged"),
        )
        # islands are disjoint per group, so start order IS the batch
        # operator's running-break numbering
        .withColumn(
            "island",
            F.row_number()
            .over(
                Window.partitionBy(*group_cols).orderBy(F.col(start_col))
            )
            .cast("long"),
        )
        .drop("__island")
        .select(*group_cols, "island", start_col, end_col, "n_merged")
    )
