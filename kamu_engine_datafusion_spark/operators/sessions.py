"""Incremental gap-based sessionization — the stateful event-time leg
of the maintained layer.

Batch sessionization (the ``xsessionize`` key: lag + cumulative break
flags) re-windows the whole ledger every run. On an append ledger whose
ticks arrive in per-user EVENT-TIME order (the ODF ledger contract —
offsets are ingestion order and event_time is monotone per device/user
feed), a session can close exactly once: the per-user OPEN session is
tiny state ``(user, session_id, start_ms, last_ms, n_events)``, a tick
extends or closes it, and closed sessions append to an output log that
never changes — per-tick cost O(increment + touched users), history
never re-read. This module holds the deterministic fold core
(:func:`session_fold_increment`) shared by the batch-replayable driver
key and ``streaming.structured.maintained_sessions``; the union of the
closed log and the open state equals the batch sessionizer row-for-row
(pytest-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def session_fold_increment(
    state: DataFrame | None,
    events: DataFrame,
    gap_sec: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> tuple[DataFrame, DataFrame]:
    """One sessionization tick against the open-session state: returns
    ``(closed_rows, new_state_rows)``.

    ``state`` rows are ``(user, session_id, start_ms, last_ms,
    n_events)`` — the OPEN session per user (None for the first tick);
    ``events`` is the tick. Semantics: per user, order events by
    ``(ts, id)``; an event more than ``gap_sec`` after the previous
    one (or after the open session's ``last_ms``) starts a new
    session; session ids continue the batch ordinal (state's
    ``session_id`` + breaks within the tick), so after any number of
    event-time-ordered ticks ``closed ∪ open`` EQUALS the batch
    lag+cumsum sessionizer of the whole ledger row-for-row.

    PRECONDITION (loud): every tick event's ``ts`` must be ≥ its
    user's ``last_ms`` — the per-user event-time-ordered append
    contract. A violating tick would need to rewrite closed history
    (retract-and-replay territory), so the fold raises instead of
    silently mis-sessionizing.

    Scale: the only shuffle is one (user)-keyed window over
    ``touched-state ∪ tick`` rows — never history; state is one row
    per ACTIVE user and the closed log is append-only.

    Mechanics: the open-session row rides the window as a PSEUDO-EVENT
    at ``last_ms`` carrying its accumulated ``(start_ms, n_events)``
    and ordinal base, so one lag+cumsum pass sessionizes state and
    tick together; per (user, ordinal) aggregate, every ordinal below
    the user's max is CLOSED (start/count folded from the pseudo row
    when the open session continued), the max ordinal is the new open
    state. A state user with no tick events passes through unchanged
    (their pseudo row is its own max ordinal).
    """
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.unix_millis(F.col(ts_col).cast("timestamp")).alias("__ms"),
        F.col(id_col).cast("long").alias("__eid"),
        F.lit(0).alias("__is_state"),
        F.lit(None).cast("long").alias("__c_start"),
        F.lit(None).cast("long").alias("__c_n"),
        F.lit(0).cast("long").alias("__base"),
    )
    if state is not None:
        st = state.select(
            F.col("user_id"),
            F.col("last_ms").alias("__ms"),
            F.lit(-1).cast("long").alias("__eid"),
            F.lit(1).alias("__is_state"),
            F.col("start_ms").alias("__c_start"),
            F.col("n_events").alias("__c_n"),
            F.col("session_id").alias("__base"),
        )
        # loud contract check: a tick event BEFORE its user's open
        # last_ms breaks the event-time-ordered append precondition
        viol = (
            ev.join(
                state.select("user_id", "last_ms"), "user_id"
            )
            .filter(F.col("__ms") < F.col("last_ms"))
            .count()
        )
        if viol:
            raise ValueError(
                f"session_fold_increment: {viol} tick event(s) precede "
                "their user's open-session last_ms — ticks must arrive "
                "in per-user event-time order (the append-ledger "
                "contract); out-of-order feeds need retract-and-replay, "
                "not this fold"
            )
        ev = ev.unionByName(st)
    # state pseudo-row sorts FIRST at its exact timestamp (__is_state
    # desc) so a tick event at ts == last_ms extends, never precedes
    w = Window.partitionBy("user_id").orderBy(
        "__ms", F.col("__is_state").desc(), "__eid"
    )
    # the break rule compares SECOND-truncated epochs (exactly the
    # batch sessionizer's ``ts.cast(long)`` lag rule — at sub-second
    # resolution an ms-based gap disagrees with it, found by the 6M-
    # event stress), while durations stay ms-derived like the batch
    # ``epoch_ms(max) − epoch_ms(min)`` aggregate: state carries ms
    # and truncates here, so both resolutions come from one column
    sec = F.floor(F.col("__ms") / F.lit(1000))
    flagged = ev.select(
        "*",
        F.when(
            sec - F.lag(sec).over(w) > int(gap_sec), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("__brk"),
    )
    sess = flagged.select(
        "*",
        (
            F.max("__base").over(
                Window.partitionBy("user_id").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            + F.sum("__brk").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            )
        )
        .cast("long")
        .alias("session_id"),
    )
    agg = sess.groupBy("user_id", "session_id").agg(
        F.sum(
            F.when(F.col("__is_state") == 1, F.col("__c_n")).otherwise(
                F.lit(1)
            )
        )
        .cast("long")
        .alias("n_events"),
        F.min(
            F.when(
                F.col("__is_state") == 1, F.col("__c_start")
            ).otherwise(F.col("__ms"))
        )
        .cast("long")
        .alias("start_ms"),
        F.max("__ms").cast("long").alias("last_ms"),
    )
    open_w = Window.partitionBy("user_id")
    # Lazily checkpointed (r17): ``closed`` and ``new_state`` both
    # read this per-(user, ordinal) frame — bounded by active users +
    # tick sessions — so one computation serves both branches instead
    # of re-running the lag/cumsum window chain per reference; lazy,
    # so no extra job is scheduled (the first consumer action
    # materializes it).
    marked = agg.withColumn(
        "__max_sid", F.max("session_id").over(open_w)
    ).localCheckpoint(eager=False)
    closed = marked.filter(
        F.col("session_id") < F.col("__max_sid")
    ).select(
        "user_id",
        "session_id",
        "n_events",
        F.floor((F.col("last_ms") - F.col("start_ms")) / F.lit(1000))
        .cast("long")
        .alias("duration_sec"),
    )
    new_state = marked.filter(
        F.col("session_id") == F.col("__max_sid")
    ).select("user_id", "session_id", "start_ms", "last_ms", "n_events")
    return closed, new_state


def sessions_read(
    closed: DataFrame | None, state: DataFrame | None
) -> DataFrame:
    """The LIVE sessions view: closed log ∪ open state rendered in the
    batch sessionizer's frame ``(user_id, session_id, n_events,
    duration_sec)`` — equals the lag+cumsum batch result over the whole
    ledger row-for-row (pytest-pinned). Reads metadata-sized state and
    the append-only log; the ledger is never re-windowed."""
    parts = []
    if closed is not None:
        parts.append(
            closed.select(
                "user_id", "session_id", "n_events", "duration_sec"
            )
        )
    if state is not None:
        parts.append(
            state.select(
                "user_id",
                "session_id",
                "n_events",
                F.floor(
                    (F.col("last_ms") - F.col("start_ms")) / F.lit(1000)
                )
                .cast("long")
                .alias("duration_sec"),
            )
        )
    if not parts:
        raise ValueError("sessions_read: no closed log and no state")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def gap_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_sec: int = 1800,
) -> DataFrame:
    """Batch gap sessionizer as a module-level operator (the
    ``xsessionize`` key's lag + cumulative-break-flag pipeline,
    extracted for composition): per-user event stream split at
    ``> gap_sec`` second gaps, events labeled ``(user, session_id)``
    with 0-based per-user session ids. Returns the EVENT frame with
    the session label attached — aggregate for the session table, or
    feed :func:`session_quality` for the per-session health read.

    Scale: ONE user-keyed window (the single-shuffle sessionizer);
    the break rule compares epoch seconds (second-truncated, the
    pytest-pinned convention shared with the maintained fold)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    flagged = events.withColumn(
        "__new_sess",
        F.when(
            F.col(ts_col).cast("long")
            - F.lag(F.col(ts_col).cast("long")).over(w)
            > gap_sec,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return flagged.withColumn(
        "session_id",
        F.sum("__new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    ).drop("__new_sess")


def session_quality(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    gap_sec: int = 1800,
    error_type: str = "error",
    max_error_rate: float = 0.5,
    dp: int = 4,
) -> DataFrame:
    """Per-session QUALITY report (r17 staging: "session-quality
    join"): gap-sessionize, then score each session — the
    agent-trajectory/telemetry health gate a training pipeline runs
    before admitting interaction logs as data: a session dominated by
    error events (or a single-event stub) is a broken trajectory, not
    a training example.

    Output: ``(user, session_id, n_events, n_errors, n_types,
    duration_sec, error_rate, ok)`` — ``error_rate`` half-up ``dp``,
    ``ok`` = error_rate ≤ ``max_error_rate``. Deterministic and fully
    SQL-replayable (counts, second-truncated duration, one division).

    Scale: the sessionizer's one user-keyed window, then a
    (user, session) aggregate riding the SAME partitioning — no
    second shuffle beyond the label groupBy's map-side partials."""
    from kamu_engine_datafusion_spark.functions.columns import half_up

    labeled = gap_sessionize(
        events, user_col, ts_col, tiebreak_col, gap_sec
    )
    agg = labeled.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            (F.col(type_col) == error_type).cast("long")
        ).alias("n_errors"),
        F.count_distinct(F.col(type_col)).cast("long").alias("n_types"),
        (
            (
                F.unix_millis(F.max(ts_col))
                - F.unix_millis(F.min(ts_col))
            )
            / F.lit(1000)
        )
        .cast("long")
        .alias("duration_sec"),
    )
    rate = half_up(F.col("n_errors") / F.col("n_events"), dp)
    return agg.select(
        user_col,
        "session_id",
        "n_events",
        "n_errors",
        "n_types",
        "duration_sec",
        rate.alias("error_rate"),
        (rate <= F.lit(float(max_error_rate))).alias("ok"),
    )
