"""Robust outliers + dense equi-width histogram — ``operators/profile.py``."""

from __future__ import annotations

import statistics

from pyspark.sql import functions as F

from kamu_engine_datafusion_spark.operators.profile import (
    histogram_equi_width,
    robust_outliers,
)


def test_robust_outliers_brute_force(spark):
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 9.8, 100.0, -40.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v double"
    )
    got = {
        r["id"]: r["mscore"]
        for r in robust_outliers(df, "v", threshold=3.5).collect()
    }
    med = statistics.median(vals)
    mad = statistics.median(abs(v - med) for v in vals)
    expect = {
        i: 0.6745 * (v - med) / mad
        for i, v in enumerate(vals)
        if abs(0.6745 * (v - med) / mad) > 3.5
    }
    assert set(got) == set(expect) == {7, 8}
    for i in got:
        assert abs(got[i] - expect[i]) < 1e-9


def test_robust_outliers_mad_zero_group_emits_nothing(spark):
    # >half identical values -> MAD 0 -> no outliers from that group
    rows = [("z", 5.0)] * 6 + [("z", 1e9), ("y", 1.0), ("y", 2.0), ("y", 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = robust_outliers(df, "v", ["g"]).collect()
    assert [r["g"] for r in out] == []


def test_histogram_dense_grid_and_total(spark):
    df = spark.createDataFrame(
        [(("a" if i % 3 else "b"), float(i)) for i in range(100)],
        "g string, v double",
    )
    h = histogram_equi_width(df, "v", 10, ["g"]).collect()
    assert len(h) == 20  # 2 groups x 10 bins, empty bins included
    assert sum(r["n"] for r in h) == 100
    # shared grid: both groups carry identical bin edges
    edges = {}
    for r in h:
        edges.setdefault(r["bin"], set()).add((r["bin_lo"], r["bin_hi"]))
    assert all(len(v) == 1 for v in edges.values())
    # global max (99.0) lands in the last bin, not bin 10
    assert max(r["bin"] for r in h) == 9


def test_histogram_degenerate_single_value(spark):
    df = spark.createDataFrame([(1.0,), (1.0,), (1.0,)], "v double")
    h = histogram_equi_width(df, "v", 5).collect()
    assert sum(r["n"] for r in h) == 3
    assert [r["n"] for r in sorted(h, key=lambda r: r["bin"])][0] == 3


def test_histogram_degenerate_single_value_excludes_nulls(spark):
    """Regression: in the min==max branch the constant bin-0 expression
    used to fire before any null check, so null values were binned and
    counted — contradicting the documented 'nulls carry no bin' rule
    the normal path implements via null arithmetic."""
    df = spark.createDataFrame(
        [(1.0,), (1.0,), (None,), (None,)], "v double"
    )
    h = histogram_equi_width(df, "v", 5).collect()
    assert sum(r["n"] for r in h) == 2  # nulls excluded, not 4
    # and the normal (non-degenerate) path agrees with itself
    df2 = spark.createDataFrame([(1.0,), (2.0,), (None,)], "v double")
    h2 = histogram_equi_width(df2, "v", 5).collect()
    assert sum(r["n"] for r in h2) == 2


def test_population_stability_degenerate_ref_excludes_nulls(spark):
    """Same null-guard regression in the PSI binning: a single-valued
    reference (min==max) must not count null rows in either snapshot."""
    from kamu_engine_datafusion_spark.operators.profile import (
        population_stability,
    )

    ref = spark.createDataFrame([(5.0,), (5.0,), (None,)], "v double")
    new = spark.createDataFrame([(5.0,), (None,), (None,)], "v double")
    out = population_stability(ref, new, "v", num_bins=4).collect()
    assert sum(r["n_ref"] for r in out) == 2
    assert sum(r["n_new"] for r in out) == 1


def test_histogram_plan_no_window_no_shuffle_explosion(spark):
    df = spark.createDataFrame([(float(i),) for i in range(50)], "v double")
    plan = (
        histogram_equi_width(df, "v", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_population_stability_identical_and_shifted(spark):
    from kamu_engine_datafusion_spark.operators.profile import (
        population_stability,
    )

    ref = spark.createDataFrame([(float(i % 100),) for i in range(1000)], "v double")
    same = population_stability(ref, ref, "v", num_bins=10).collect()
    assert abs(sum(r["psi"] for r in same)) < 1e-12  # identical -> PSI 0
    # shifted population: all mass moves right, incl. out-of-range values
    shifted = spark.createDataFrame(
        [(float(i % 100) + 80.0,) for i in range(1000)], "v double"
    )
    drift = population_stability(ref, shifted, "v", num_bins=10).collect()
    total = sum(r["psi"] for r in drift)
    assert total > 0.25  # classic "shifted" reading
    # out-of-range new values clamp into the TOP bin, not vanish
    assert sum(r["n_new"] for r in drift) == 1000
    top = [r for r in drift if r["bin"] == 9][0]
    assert top["n_new"] > top["n_ref"]


# ---------------------------------------------------------------------------
# zone_map_audit
# ---------------------------------------------------------------------------


def _zm(spark, key_fn):
    from kamu_engine_datafusion_spark.operators.profile import zone_map_audit

    df = spark.createDataFrame(
        [(i, key_fn(i)) for i in range(40)], "pos long, k long"
    )
    return {
        (r["key_name"], r["probe_idx"]): r
        for r in zone_map_audit(
            df, "pos", {"k": F.col("k")}, chunk_rows=10
        ).collect()
    }


def test_zone_map_audit_sorted_key_prunes(spark):
    # key = 2*pos -> 4 disjoint chunk ranges [0,18][20,38][40,58][60,78];
    # probe 5 lands at 39, in the gap between chunks -> skips all 4.
    got = _zm(spark, lambda i: 2 * i)
    assert len(got) == 9
    for k in range(1, 10):
        r = got[("k", k)]
        assert r["n_chunks"] == 4
        assert r["interleave_frac"] == 0.0
        expect_skip = 1.0 if k == 5 else 0.75
        assert r["skip_frac"] == expect_skip, (k, r)
    assert got[("k", 1)]["probe_value"] == 7  # floor(78*1/10)
    assert got[("k", 5)]["probe_value"] == 39


def test_zone_map_audit_constant_key_never_prunes(spark):
    # every chunk's range is [7,7]; probes all hit; ranges fully overlap
    got = _zm(spark, lambda i: 7)
    for k in range(1, 10):
        r = got[("k", k)]
        assert r["probe_value"] == 7
        assert r["skip_frac"] == 0.0
        assert r["interleave_frac"] == 0.75  # 3 of 4 overlap predecessor


def test_zone_map_audit_interleaved_key_never_prunes(spark):
    # key = pos % 10: every chunk spans [0,9] -> nothing prunes, full
    # interleave; descending layouts are NOT penalized (order-agnostic)
    got = _zm(spark, lambda i: i % 10)
    for k in range(1, 10):
        r = got[("k", k)]
        assert r["skip_frac"] == 0.0
        assert r["interleave_frac"] == 0.75
    got_desc = _zm(spark, lambda i: 2 * (39 - i))
    for k in range(1, 10):
        assert got_desc[("k", k)]["interleave_frac"] == 0.0
        assert got_desc[("k", k)]["skip_frac"] in (0.75, 1.0)


def test_zone_map_audit_zorder_layout_prunes_both_dims(spark):
    # 16x16 grid; 16-bit codes top-4-bit-chunked (z >> 24) puts each
    # grid cell in its own chunk: every point probe on either dim hits
    # exactly the 16 chunks of one grid line -> skip 240/256 = 0.9375.
    from kamu_engine_datafusion_spark.operators.profile import zone_map_audit
    from kamu_engine_datafusion_spark.sources.compact import zorder_value

    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    with_bounds, z = zorder_value(df, ["x", "y"], bits_per_col=16)
    got = zone_map_audit(
        with_bounds.select("x", "y", z.alias("zv")),
        "zv",
        {"x": F.col("x"), "y": F.col("y")},
        chunk_rows=1 << 24,
    ).collect()
    assert len(got) == 18
    for r in got:
        assert r["n_chunks"] == 256
        assert r["skip_frac"] == 0.9375, r


def test_rater_agreement_matches_python_kappa(spark):
    """Cohen's kappa replayed exactly in python from the same counts
    (the recorded oracle design: cell counts → row/col totals joined
    on equal label → one float row, half-up 6dp)."""
    import math

    from kamu_engine_datafusion_spark.operators.profile import (
        rater_agreement,
    )

    # deliberately asymmetric label universes: rater b never says 'c',
    # rater a never says 'd' — p_e joins on the COMMON labels only
    rows = (
        [("a", "a")] * 40 + [("a", "b")] * 10 + [("b", "b")] * 25
        + [("b", "a")] * 5 + [("c", "a")] * 7 + [("a", "d")] * 3
    )
    df = spark.createDataFrame(rows, "r1 string, r2 string")
    got = rater_agreement(df, "r1", "r2").first()
    n = len(rows)
    agree = sum(1 for x, y in rows if x == y)
    po = agree / n
    labels = set(x for x, _ in rows) | set(y for _, y in rows)
    pe = sum(
        sum(1 for x, _ in rows if x == lb) * sum(1 for _, y in rows if y == lb)
        for lb in labels
    ) / (n * n)
    kappa = (po - pe) / (1.0 - pe)
    hu = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
    assert (got["n_rows"], got["n_agree"]) == (n, agree)
    assert (got["po"], got["pe"], got["kappa"]) == (hu(po), hu(pe), hu(kappa))


def test_rater_agreement_edges(spark):
    from kamu_engine_datafusion_spark.operators.profile import (
        rater_agreement,
    )

    # constant equal raters: p_e = 1, p_o = 1 -> kappa 1.0 by the
    # documented convention (not 0/0)
    same = spark.createDataFrame([("x", "x")] * 9, "r1 string, r2 string")
    r = rater_agreement(same, "r1", "r2").first()
    assert (r["po"], r["pe"], r["kappa"]) == (1.0, 1.0, 1.0)
    # NULL labels excluded from every count
    withnull = spark.createDataFrame(
        [("x", "x"), ("x", None), (None, "x"), ("y", "x")],
        "r1 string, r2 string",
    )
    r2 = rater_agreement(withnull, "r1", "r2").first()
    assert (r2["n_rows"], r2["n_agree"]) == (2, 1)
    # disjoint label universes: p_e = 0, kappa == po
    disj = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "r1 string, r2 string"
    )
    r3 = rater_agreement(disj, "r1", "r2").first()
    assert (r3["pe"], r3["kappa"]) == (0.0, r3["po"])
    # empty / all-NULL-label input: zero counts, NULL ratios — never a
    # NULL n_rows or a 0/0
    allnull = spark.createDataFrame(
        [("x", None), (None, "y")], "r1 string, r2 string"
    )
    r4 = rater_agreement(allnull, "r1", "r2").first()
    assert (r4["n_rows"], r4["n_agree"]) == (0, 0)
    assert r4["po"] is None and r4["pe"] is None and r4["kappa"] is None
    empty = spark.createDataFrame([], "r1 string, r2 string")
    r5 = rater_agreement(empty, "r1", "r2").first()
    assert (r5["n_rows"], r5["n_agree"]) == (0, 0)
    assert r5["kappa"] is None


def test_psi_from_histograms_equals_population_stability(spark):
    """The metadata-side PSI (two fixed-grid count frames) equals the
    batch population_stability row-for-row — bit-exact doubles, same
    clamp/NULL/degenerate rules — when the grid is the reference
    bounds. This is the equivalence the maintained drift monitor
    rides."""
    from kamu_engine_datafusion_spark.operators.profile import (
        histogram_fixed_grid,
        population_stability,
        psi_from_histograms,
    )

    rng = __import__("random").Random(7)
    ref_rows = [(rng.uniform(0.0, 100.0),) for _ in range(2_000)]
    # new: shifted + out-of-range high values (must clamp into the top
    # bin, they ARE drift) + NULLs (dropped)
    new_rows = (
        [(rng.uniform(20.0, 140.0),) for _ in range(1_500)]
        + [(None,)] * 7
    )
    ref = spark.createDataFrame(ref_rows, "v double")
    new = spark.createDataFrame(new_rows, "v double")
    want = sorted(
        tuple(r) for r in population_stability(ref, new, "v", 10).collect()
    )
    b = ref.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
    lo, hi = float(b["lo"]), float(b["hi"])
    got = sorted(
        tuple(r)
        for r in psi_from_histograms(
            histogram_fixed_grid(ref, "v", lo, hi, 10),
            histogram_fixed_grid(new, "v", lo, hi, 10),
            lo,
            hi,
            10,
        ).collect()
    )
    assert got == want
    # the shift is detected: total PSI well above the 0.25 bar
    assert sum(r[7] for r in got) > 0.25


def test_maintained_histogram_psi_equals_batch(spark, tmp_path):
    """3-tick maintained histogram fold == the batch fixed-grid counts
    of the whole ledger (additive fold, exact), and the live PSI read
    equals batch population_stability(ref, ledger-so-far) — the drift
    alarm never re-scans either population."""
    import os

    from kamu_engine_datafusion_spark.operators.profile import (
        histogram_fixed_grid,
        population_stability,
    )
    from kamu_engine_datafusion_spark.streaming.structured import (
        maintained_histogram,
        read_maintained_psi,
        read_maintained_state,
    )

    ledger_dir = os.path.join(str(tmp_path), "hledger")
    state_dir = os.path.join(str(tmp_path), "hstate")
    ck = os.path.join(str(tmp_path), "hck")
    os.makedirs(ledger_dir)
    rng = __import__("random").Random(13)
    ref = spark.createDataFrame(
        [(rng.uniform(0.0, 50.0),) for _ in range(1_000)], "v double"
    )
    b = ref.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
    lo, hi = float(b["lo"]), float(b["hi"])
    all_rows = (
        [(rng.uniform(10.0, 80.0),) for _ in range(900)] + [(None,)] * 5
    )

    def tick(rows):
        spark.createDataFrame(rows, "v double").coalesce(1).write.mode(
            "append"
        ).parquet(ledger_dir)
        maintained_histogram(
            ledger_dir, state_dir, ck, "v", lo, hi, 10,
            schema=spark.read.parquet(ledger_dir).schema, spark=spark,
        ).awaitTermination()

    tick(all_rows[:300])
    tick(all_rows[300:700])
    tick(all_rows[700:])
    full = spark.createDataFrame(all_rows, "v double")
    state = sorted(
        (r["bin"], r["n"])
        for r in read_maintained_state(spark, state_dir)
        .select("bin", "n")
        .collect()
    )
    batch = sorted(
        (r["bin"], r["n"])
        for r in histogram_fixed_grid(full, "v", lo, hi, 10).collect()
    )
    assert state == batch and sum(n for _, n in state) == 900
    got = sorted(
        tuple(r)
        for r in read_maintained_psi(
            spark, state_dir, histogram_fixed_grid(ref, "v", lo, hi, 10),
            lo, hi, 10,
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in population_stability(ref, full, "v", 10).collect()
    )
    assert got == want


def test_maintained_histogram_replayed_batch_is_skipped(spark, tmp_path):
    """Crash-replay safety for the drift monitor's fold: wiping the
    stream checkpoint re-delivers already-folded batch ids; the
    bucketed batch-id markers must skip them (an additive count fold
    would silently DOUBLE on replay — the worst failure mode for a
    drift alarm, reading as a 2× population jump)."""
    import os
    import shutil

    from kamu_engine_datafusion_spark.streaming.structured import (
        maintained_histogram,
        read_maintained_state,
    )

    ledger_dir = os.path.join(str(tmp_path), "rhled")
    state_dir = os.path.join(str(tmp_path), "rhstate")
    ck = os.path.join(str(tmp_path), "rhck")
    os.makedirs(ledger_dir)
    rows = [(float(v),) for v in range(100)]
    spark.createDataFrame(rows, "v double").coalesce(1).write.mode(
        "append"
    ).parquet(ledger_dir)
    sch = spark.read.parquet(ledger_dir).schema

    def run():
        maintained_histogram(
            ledger_dir, state_dir, ck, "v", 0.0, 100.0, 10,
            schema=sch, spark=spark,
        ).awaitTermination()

    run()
    before = sorted(
        tuple(r)
        for r in read_maintained_state(spark, state_dir)
        .select("bin", "n")
        .collect()
    )
    assert sum(n for _, n in before) == 100
    shutil.rmtree(ck)  # lose the checkpoint -> batch 0 re-delivers
    run()
    after = sorted(
        tuple(r)
        for r in read_maintained_state(spark, state_dir)
        .select("bin", "n")
        .collect()
    )
    assert after == before  # counts did NOT double


def test_moment_counts_overflow_raises_not_wraps(spark):
    """r16 advice fix: sum(q*q) past the BIGINT envelope must raise
    in-plan (USER_RAISED_EXCEPTION), never wrap silently — at
    scale=1e6 and |x|=100, q²=1e16 so ~922 rows/group is the true
    BIGINT bound (the old docstring claimed ~90k). In-envelope
    results are unchanged longs."""
    import pytest

    from kamu_engine_datafusion_spark.operators.profile import (
        moment_counts,
    )

    ok = moment_counts(
        spark.createDataFrame([(1, 2.5), (1, 3.5)], "g long, v double"),
        "v",
        ["g"],
        scale=1000,
    ).collect()
    assert [tuple(r) for r in ok] == [(1, 2, 6000, 18500000)]
    schema = moment_counts(
        spark.createDataFrame([(1, 1.0)], "g long, v double"), "v", ["g"]
    ).schema
    assert [f.dataType.simpleString() for f in schema.fields] == [
        "bigint", "bigint", "bigint", "bigint"
    ]

    big = spark.range(2000).select(
        F.lit(1).alias("g"), F.lit(100.0).alias("v")
    )
    with pytest.raises(Exception, match="moment_counts"):
        moment_counts(big, "v", ["g"], scale=1_000_000).collect()


def test_moment_counts_per_row_square_cannot_wrap(spark):
    """r17 advice fix: a SINGLE row with scale*|x| > ~3.03e9 used to
    square in BIGINT (q*q wraps silently, the wrapped value passes
    the <= LONG_MAX group guard and corrupts s2 undetectably); the
    square now runs in DECIMAL(19,0) so any BIGINT q squares exactly.
    q = 4e9 -> q^2 = 1.6e19 > LONG_MAX: the group guard must now SEE
    the true decimal total and raise, never return a wrapped long."""
    import pytest

    from kamu_engine_datafusion_spark.operators.profile import (
        moment_counts,
    )

    one_big = spark.createDataFrame([(1, 4000.0)], "g long, v double")
    with pytest.raises(Exception, match="moment_counts"):
        moment_counts(one_big, "v", ["g"], scale=1_000_000).collect()

    # just inside the per-row envelope: q = 3e9, q^2 = 9e18 < 2^63-1
    ok = moment_counts(
        spark.createDataFrame([(1, 3000.0)], "g long, v double"),
        "v",
        ["g"],
        scale=1_000_000,
    ).collect()
    assert [tuple(r) for r in ok] == [
        (1, 1, 3_000_000_000, 9_000_000_000_000_000_000)
    ]
