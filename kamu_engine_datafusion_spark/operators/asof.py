"""Distributed as-of (temporal) join.

The reference engine has NO as-of join — its DTO carries a
``temporal_tables`` field that is always ignored, and the README defers
temporal joins to the Flink engine (reference
``tests/tests/test_transform.rs:252``, ``README.md:18``). This is the
beyond-parity Spark-native implementation.

Algorithm (the classic single-shuffle union trick, vs. the naive
range-join which explodes to O(left × right) per key):

1. tag right rows (0) and left rows (1), union by the common columns;
2. one shuffle: window partitioned by key, ordered by (ts, tag, ...);
3. ``last(right_value, ignorenulls=True)`` carried forward gives every
   left row the most recent right row with ``right.ts <= left.ts``;
4. filter back to left rows.

At scale this is one hash shuffle on the join key and a per-key sort —
the same cost as a regular sort-merge join, with no range blow-up. Skewed
keys behave like any skewed window (salt upstream if one key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    right_value_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the columns of the latest right row with
    the same key and ``right.ts_col <= left.ts_col``.

    ``how='inner'`` drops left rows with no prior right row;
    ``how='left'`` keeps them with nulls (DuckDB ``ASOF [LEFT] JOIN``
    semantics).
    """
    lhs = left.select(
        *key_cols,
        ts_col,
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left_row"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_value_cols],
    )
    rhs = right.select(
        *key_cols,
        ts_col,
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lhs.schema["__left_row"].dataType).alias("__left_row"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
    )
    unioned = lhs.unionByName(rhs)

    # Right rows (tag 0) sort before left rows at equal ts, so an exact
    # ts tie matches (<= semantics, like ASOF JOIN ON l.ts >= r.ts).
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__carried_{c}")
            for c in right_value_cols
        ],
    ).filter(F.col("__is_left") == 1)

    out = carried.select(
        F.col("__left_row.*"),
        *[F.col(f"__carried_{c}").alias(f"right_{c}") for c in right_value_cols],
    )
    if how == "inner":
        out = out.filter(F.col(f"right_{right_value_cols[0]}").isNotNull())
    return out


def asof_state_increment(
    state: DataFrame | None,
    right_tick: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One tick of the maintained AS-OF serving state — per-key LATEST
    right row ``(key…, ts, value…)`` (``streaming.structured.
    maintained_asof_state``'s merge law): the fold keeps, per key, the
    maximum-``(ts, tiebreak)`` row of ``state ∪ tick``. Max over a
    total order is an idempotent semilattice merge (the retention
    class): ticks may arrive in ANY order, and even a double-applied
    tick cannot corrupt the state — after any ticks the state equals
    the per-key latest of the whole right ledger.

    ``tiebreak_col`` disambiguates equal-``ts`` rows (pass the ledger
    offset/event id); without it, feeds must carry at most one right
    row per (key, ts) — the funnel-family simultaneous-events caveat,
    loud here in the docstring because a silent arbitrary winner
    would leak into every downstream probe."""
    sel = [*key_cols, ts_col, *value_cols] + (
        [tiebreak_col] if tiebreak_col else []
    )
    rows = right_tick.select(*sel)
    if state is not None:
        rows = rows.unionByName(state.select(*sel))
    order = [F.col(ts_col).desc()] + (
        [F.col(tiebreak_col).desc()] if tiebreak_col else []
    )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        rows.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def asof_probe_from_state(
    left: DataFrame,
    state: DataFrame,
    key_cols: list[str],
    ts_col: str,
    right_value_cols: list[str],
    how: str = "inner",
    validate: str = "lazy",
) -> DataFrame:
    """AS-OF join served from maintained per-key-latest state ALONE —
    the serving read of :func:`asof_join` for the head-of-ledger case
    (enrich a NEW tick with the latest known dimension values): under
    the probe contract — every left row's ``ts`` ≥ its key's stored
    right ``ts``, i.e. the probe frame is event-time-current, the
    append-ledger shape — the latest right row ≤ ``left.ts`` IS the
    stored row, so this equi-join equals
    ``asof_join(left, right_full_history)`` row-for-row
    (pytest-pinned). A left row whose ``ts`` precedes its key's stored
    right ``ts`` RAISES: state only keeps the latest right row per
    key, so the true as-of match may have been discarded — serving it
    silently would be wrong; replay the batch operator over history
    instead.

    Scale: at 100 TB the batch as-of pays a union + per-key sort over
    the WHOLE right history every run; this reads keys-sized state and
    runs one equi-join (broadcast when the dimension is small, plain
    hash join otherwise) — history is never re-sorted. Output frame
    matches :func:`asof_join`: left columns + ``right_<c>``;
    ``how='inner'`` drops unmatched left rows, ``how='left'`` keeps
    them with nulls.

    ``validate`` controls HOW the probe contract is enforced:
    ``"lazy"`` (default) rides a ``raise_error`` guard on EVERY
    ``right_<c>`` column inside the returned plan (the violation
    condition is shared, so Catalyst evaluates it once per row
    regardless of how many right columns survive pruning) — the join
    is evaluated ONCE, when the caller consumes it, and a historical
    probe row aborts the job loudly at that point (caveat: a consumer
    that prunes away EVERY right column also prunes the guard — but
    such a consumer never reads the potentially-wrong values either;
    a consumer that keeps ANY right column keeps the guard).
    ``"eager"`` runs a separate validation count up front and raises
    ``ValueError`` at call time — the join is computed twice; use it
    when a call-time error is worth the extra pass. ``"off"`` skips
    the check (caller has already proven event-time-currency)."""
    if not right_value_cols:
        raise ValueError(
            "asof_probe_from_state: right_value_cols must be "
            "non-empty — the serving read exists to attach right "
            "values (and the inner/validation semantics key off them)"
        )
    st = state.select(
        *key_cols,
        F.col(ts_col).alias("__r_ts"),
        *[F.col(c).alias(f"right_{c}") for c in right_value_cols],
    )
    j = left.join(st, key_cols, "left")
    viol_cond = F.col("__r_ts").isNotNull() & (
        F.col(ts_col) < F.col("__r_ts")
    )
    if validate == "eager":
        viol = j.filter(viol_cond).count()
        if viol:
            raise ValueError(
                f"asof_probe_from_state: {viol} left row(s) precede "
                "their key's stored right ts — the probe frame is not "
                "event-time-current and the per-key-latest state "
                "cannot answer historical as-of probes (the discarded "
                "older right rows may be the true matches); probe "
                "with event-time-current ticks or run the batch "
                "asof_join over history"
            )
    elif validate == "lazy":
        guard_err = F.raise_error(
            F.lit(
                "asof_probe_from_state: left row precedes its "
                "key's stored right ts — the probe frame is "
                "not event-time-current and the per-key-"
                "latest state cannot answer historical as-of "
                "probes; run the batch asof_join over history"
            )
        )
        # Guard EVERY right_<c>: Catalyst prunes projections per
        # column, so a single guarded column would silently lose the
        # check for consumers selecting a different right value.
        j = j.select(
            *[c for c in j.columns if not c.startswith("right_")],
            *[
                F.when(viol_cond, guard_err)
                .otherwise(F.col(f"right_{c}"))
                .alias(f"right_{c}")
                for c in right_value_cols
            ],
        )
    elif validate != "off":
        raise ValueError(
            f"asof_probe_from_state: unknown validate={validate!r} "
            "(expected 'lazy', 'eager', or 'off')"
        )
    out = j.drop("__r_ts")
    if how == "inner":
        out = out.filter(
            F.col(f"right_{right_value_cols[0]}").isNotNull()
        )
    return out
