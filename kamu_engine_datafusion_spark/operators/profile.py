"""Dataset profiling: per-column statistics in one pass.

The ANALYZE-TABLE equivalent a pipeline runs before choosing dedup
blocks, sampling rates, or join strategies. Long-format output — one
row per profiled column — computed with a single unpivot + aggregate:
the table is scanned ONCE regardless of column count (vs one job per
column), and the shuffle carries only per-column partial aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile numeric columns: row count, nulls, exact distinct count,
    min, max — one row per column, one scan total.

    Returns ``(column, n_rows, n_nulls, n_distinct, min_val, max_val)``
    with values as doubles. Use ``approx_count_distinct`` upstream of
    this for quick-look profiling at extreme scale; exact distinct is
    the default because profiles feed correctness-sensitive decisions
    (e.g. join-key uniqueness checks).
    """
    unpivoted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("double").alias("val"),
                    )
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.column", "kv.val")
    return unpivoted.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("val").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_nulls"),
        F.count_distinct(F.col("val")).cast("long").alias("n_distinct"),
        # exact extrema: presentation/compare layers own any rounding
        # (cross-engine hash canonicalization lives in the query layer)
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    threshold: float = 3.5,
    exact: bool = True,
    stat_precision: int | None = None,
) -> DataFrame:
    """Robust per-group outlier detection via the modified z-score
    (Iglewicz–Hoaglin): ``M = 0.6745 · (x − median) / MAD`` with
    ``MAD = median(|x − median|)``; rows with ``|M| > threshold``
    (default 3.5, the standard cut) are returned with their score as
    ``mscore``. Median/MAD rather than mean/stddev so the detector's
    own statistics are not dragged by the outliers it is looking for.

    Groups with ``MAD = 0`` (over half the values identical) emit no
    outliers — the modified z-score is undefined there, and the
    constant-majority case is better handled by an exact-frequency
    profile than a distance rule.

    Scale: two aggregate+join rounds (median, then MAD), each ONE
    exchange on the group key with the per-group statistics joined back
    (tiny — group cardinality — so AQE broadcasts them). ``exact=True``
    uses exact interpolated percentiles, which buffer each group's
    values in the aggregation state: right for parity/oracle work and
    bounded groups. At extreme per-group cardinality set
    ``exact=False`` for ``percentile_approx`` (mergeable sketch, no
    buffering) — same plan shape, bounded memory.

    ``stat_precision``: round the per-group median/MAD to this many
    decimals before scoring. Engine-portability knob: different
    engines' percentile interpolation can differ in the last float bit,
    and an unrounded ulp on the statistic occasionally flips the
    rounded SCORE at a half-way boundary (observed once in 4053 rows at
    sf0.1 against DuckDB). Rounding the two statistics pins both
    engines to identical inputs; leave ``None`` for full precision.
    """
    group_cols = group_cols or []
    med_of = (
        (lambda c: F.expr(f"percentile({c}, 0.5)"))
        if exact
        else (lambda c: F.percentile_approx(c, 0.5, 10_000))
    )
    gb = lambda d: d.groupBy(*group_cols) if group_cols else d.groupBy()  # noqa: E731
    rnd = (
        (lambda c: F.round(c, stat_precision))
        if stat_precision is not None
        else (lambda c: c)
    )
    med = gb(df).agg(rnd(med_of(value_col)).alias("__med"))
    with_med = (
        df.join(med, group_cols) if group_cols else df.crossJoin(med)
    )
    mad = gb(with_med.withColumn("__dev", F.abs(F.col(value_col) - F.col("__med")))).agg(
        rnd(med_of("__dev")).alias("__mad")
    )
    scored = (
        with_med.join(mad, group_cols) if group_cols else with_med.crossJoin(mad)
    ).withColumn(
        "mscore",
        F.lit(0.6745) * (F.col(value_col) - F.col("__med")) / F.col("__mad"),
    )
    return (
        scored.filter(
            (F.col("__mad") > 0) & (F.abs(F.col("mscore")) > threshold)
        )
        .drop("__med", "__mad")
    )


def histogram_equi_width(
    df: DataFrame,
    value_col: str,
    num_bins: int = 20,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-width histogram with DENSE bins: every ``(group, bin)``
    cell of the grid is present, zero-counted when empty — the form
    chart layers and drift monitors consume directly.

    Bin ``i`` covers ``[min + i·w, min + (i+1)·w)`` with
    ``w = (max − min)/num_bins``; the global max lands in the last bin
    (closed on the right like NumPy). Bounds are computed over the
    WHOLE table (one tiny min/max agg, broadcast back) so groups share
    a common grid — per-group grids don't overlay.

    Scale: two scans (bounds, then counts), one exchange each; the
    densify join is grid-sized (groups × bins), independent of input.
    Degenerate case min = max: everything in bin 0. Null values carry
    no bin and are excluded — run a not-null expectation
    (``quality.dq_report``) first if null-rate matters.
    """
    group_cols = group_cols or []
    v = F.col(value_col).cast("double")
    bounds = df.agg(
        F.min(v).alias("__lo"), F.max(v).alias("__hi")
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(num_bins)
    binned = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            # Null guard FIRST: in the degenerate min==max branch the
            # constant 0 would otherwise bin (and count) null values,
            # which the normal path excludes (null arithmetic → null
            # bin → dropped by the grid join).
            "__bin",
            F.when(v.isNull(), F.lit(None))
            .when(F.col("__hi") == F.col("__lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(num_bins - 1),
                    F.floor((v - F.col("__lo")) / width),
                )
            ).cast("long"),
        )
        .groupBy(*group_cols, "__bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid_bins = (
        df.sparkSession.range(num_bins)
        .select(F.col("id").cast("long").alias("__bin"))
    )
    grid = (
        df.select(*group_cols).distinct().crossJoin(F.broadcast(grid_bins))
        if group_cols
        else grid_bins
    )
    return (
        grid.join(binned, [*group_cols, "__bin"], "left")
        .crossJoin(F.broadcast(bounds))
        .select(
            *group_cols,
            F.col("__bin").alias("bin"),
            (F.col("__lo") + F.col("__bin") * width).alias("bin_lo"),
            (F.col("__lo") + (F.col("__bin") + 1) * width).alias("bin_hi"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    lower: float = 0.01,
    upper: float = 0.99,
    exact: bool = True,
) -> DataFrame:
    """Winsorization: clip ``value_col`` to its per-group
    ``[p_lower, p_upper]`` percentile band — the standard heavy-tail
    guard before scaling/aggregating features (outliers are *clamped*,
    not dropped, so row counts and joins are unaffected).

    Appends ``<value_col>_winsorized`` (original columns untouched).
    Nulls stay null. One percentile aggregate + one joined-back clip —
    the group stats are group-cardinality rows, so AQE broadcasts them.
    ``exact=False`` swaps in ``percentile_approx`` for unbounded-group
    scale, same plan shape (see :func:`robust_outliers`).
    """
    group_cols = group_cols or []
    if exact:
        lo_of = F.expr(f"percentile({value_col}, {lower})")
        hi_of = F.expr(f"percentile({value_col}, {upper})")
    else:
        lo_of = F.percentile_approx(value_col, lower, 10_000)
        hi_of = F.percentile_approx(value_col, upper, 10_000)
    gb = df.groupBy(*group_cols) if group_cols else df.groupBy()
    cuts = gb.agg(lo_of.alias("__wlo"), hi_of.alias("__whi"))
    joined = (
        df.join(cuts, group_cols) if group_cols else df.crossJoin(F.broadcast(cuts))
    )
    # explicit null guard: least/greatest IGNORE nulls in Spark, which
    # would silently clamp a null value to the lower cut
    clipped = F.when(
        F.col(value_col).isNotNull(),
        F.least(F.greatest(F.col(value_col), F.col("__wlo")), F.col("__whi")),
    )
    return joined.withColumn(
        f"{value_col}_winsorized", clipped
    ).drop("__wlo", "__whi")


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations of ``cols`` in ONE scan — the
    k×k matrix as long-format ``(col_a, col_b, corr)`` for the upper
    triangle (incl. the diagonal). All ``k·(k+1)/2`` ``corr``
    aggregates ride a single aggregate over a single pass; each is a
    streaming one-pass moment computation, so no per-pair scans and no
    driver-side math.
    """
    aggs = []
    names = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(F.corr(F.col(a), F.col(b)).alias(f"__c_{a}_{b}"))
            names.append((a, b))
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"__c_{a}_{b}").alias("corr"),
            )
            for a, b in names
        ]
    )
    return row.select(F.explode(pairs).alias("__p")).select(
        "__p.col_a", "__p.col_b", "__p.corr"
    )


def quantile_bins(
    df: DataFrame,
    value_col: str,
    num_bins: int = 10,
    tiebreak_col: str | None = None,
    exact_depth: bool = True,
) -> DataFrame:
    """Equi-depth (quantile) binning: append ``<value_col>_bin`` ∈
    [1, num_bins].

    ``exact_depth=True``: ``ntile`` over the value ordering (ties
    broken by ``tiebreak_col`` so the assignment is deterministic and
    engine-portable) — EXACTLY equal row counts per bin, at the cost of
    one global range-partitioned sort.

    ``exact_depth=False``: the 100 TB path — compute the
    ``num_bins − 1`` interior percentile cuts (one sketchable
    aggregate), broadcast them, and assign bins with an in-row
    comparison count: two scans, ZERO sorts, zero shuffles of the data
    itself. Depth is near-equal (ties at a cut all land in one bin);
    bin ids are stable under repartitioning because they depend only on
    the cut values.
    """
    if exact_depth:
        order = [F.col(value_col)]
        if tiebreak_col:
            order.append(F.col(tiebreak_col))
        # BOUNDED-WINDOW CLASS (caller contract): exact_depth runs a
        # GLOBAL ntile — opt in only for oracle-sized frames; the
        # default sketch path is the at-scale binning.
        w = Window.orderBy(*order)
        return df.withColumn(
            f"{value_col}_bin", F.ntile(num_bins).over(w).cast("long")
        )
    qs = [i / num_bins for i in range(1, num_bins)]
    cuts_row = df.agg(
        F.percentile_approx(
            value_col, qs, 10_000
        ).alias("__cuts")
    ).collect()[0]
    cuts = [float(c) for c in (cuts_row["__cuts"] or [])]
    cuts_arr = F.array(*[F.lit(c) for c in cuts])
    bin_expr = (
        F.size(F.filter(cuts_arr, lambda c: c <= F.col(value_col))) + 1
    ).cast("long")
    return df.withColumn(
        f"{value_col}_bin",
        F.when(F.col(value_col).isNotNull(), bin_expr),
    )


def standardize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group z-score standardization: append
    ``<value_col>_z = (x − mean) / stddev_samp`` (null when the group
    has < 2 rows or zero variance). One mean/stddev aggregate joined
    back (group-cardinality — broadcast), same shape as
    :func:`winsorize`.
    """
    group_cols = group_cols or []
    gb = df.groupBy(*group_cols) if group_cols else df.groupBy()
    stats = gb.agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_samp(value_col).alias("__sd"),
    )
    joined = (
        df.join(stats, group_cols)
        if group_cols
        else df.crossJoin(F.broadcast(stats))
    )
    z = F.when(
        F.col("__sd") > 0, (F.col(value_col) - F.col("__mu")) / F.col("__sd")
    )
    return joined.withColumn(f"{value_col}_z", z).drop("__mu", "__sd")


def population_stability(
    df_ref: DataFrame,
    df_new: DataFrame,
    value_col: str,
    num_bins: int = 10,
    smoothing: float = 0.5,
) -> DataFrame:
    """Distribution-drift detection between two snapshots of the same
    column: per-bin shares on a SHARED grid (bins fixed by the
    REFERENCE snapshot's min/max — the monitoring convention, so drift
    moves the new shares, never the ruler) plus the Population
    Stability Index contribution
    ``psi_i = (p_new − p_ref) · ln(p_new / p_ref)`` with add-``smoothing``
    counts so empty bins stay finite. Σ psi < 0.1 is the classic
    "stable" reading, > 0.25 "shifted".

    Returns one row per bin: ``(bin, bin_lo, bin_hi, n_ref, n_new,
    p_ref, p_new, psi)`` — sum ``psi`` downstream for the scalar index.
    Out-of-range new values clamp into the edge bins (they ARE drift
    and must count). Two scans + two grid-sized joins; everything else
    is bin-cardinality arithmetic.
    """
    v = lambda d: F.col(value_col).cast("double")  # noqa: E731
    bounds = df_ref.agg(
        F.min(v(df_ref)).alias("__lo"), F.max(v(df_ref)).alias("__hi")
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(num_bins)

    def binned(d: DataFrame, name: str) -> DataFrame:
        return (
            d.crossJoin(F.broadcast(bounds))
            .withColumn(
                # null guard first — see histogram_equi_width: the
                # degenerate min==max constant branch must not bin nulls
                "__bin",
                F.when(v(d).isNull(), F.lit(None))
                .when(F.col("__hi") == F.col("__lo"), F.lit(0))
                .otherwise(
                    F.greatest(
                        F.lit(0),
                        F.least(
                            F.lit(num_bins - 1),
                            F.floor((v(d) - F.col("__lo")) / width),
                        ),
                    )
                )
                .cast("long"),
            )
            .groupBy("__bin")
            .agg(F.count(F.lit(1)).alias(name))
        )
    ref = binned(df_ref, "n_ref")
    new = binned(df_new, "n_new")
    grid = df_ref.sparkSession.range(num_bins).select(
        F.col("id").cast("long").alias("__bin")
    )
    tot_ref = F.sum("n_ref").over(Window.partitionBy())
    tot_new = F.sum("n_new").over(Window.partitionBy())
    j = (
        grid.join(ref, "__bin", "left")
        .join(new, "__bin", "left")
        .withColumn("n_ref", F.coalesce("n_ref", F.lit(0)))
        .withColumn("n_new", F.coalesce("n_new", F.lit(0)))
    )
    p_ref = (F.col("n_ref") + smoothing) / (tot_ref + smoothing * num_bins)
    p_new = (F.col("n_new") + smoothing) / (tot_new + smoothing * num_bins)
    return (
        j.withColumn("p_ref", p_ref)
        .withColumn("p_new", p_new)
        .crossJoin(F.broadcast(bounds))
        .select(
            F.col("__bin").alias("bin"),
            (F.col("__lo") + F.col("__bin") * width).alias("bin_lo"),
            (F.col("__lo") + (F.col("__bin") + 1) * width).alias("bin_hi"),
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_new").cast("long").alias("n_new"),
            "p_ref",
            "p_new",
            (
                (F.col("p_new") - F.col("p_ref"))
                * F.log(F.col("p_new") / F.col("p_ref"))
            ).alias("psi"),
        )
    )


def histogram_fixed_grid(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    num_bins: int = 10,
) -> DataFrame:
    """Fixed-grid equi-width counts ``(bin, n)`` — the INCREMENT
    function of the maintained drift monitor
    (``streaming.maintained_histogram``): the grid is CALLER-FROZEN
    (the monitoring convention — the reference snapshot fixes the
    ruler once; drift moves the counts, never the bins), so per-bin
    counts are ADDITIVE and the cross-tick fold is exact by
    construction. Binning rule is bit-identical to
    :func:`population_stability`'s (NULLs dropped, degenerate
    ``hi == lo`` puts everything in bin 0, out-of-range values clamp
    into the edge bins — they ARE drift and must count), so the PSI
    read off maintained state equals the batch operator row-for-row
    (pytest-pinned).

    Scale: one scan + one ≤ ``num_bins``-row aggregate (map-side
    partials cap each task's contribution at num_bins longs)."""
    v = F.col(value_col).cast("double")
    width = (hi - lo) / num_bins
    b = (
        F.when(v.isNull(), F.lit(None))
        .when(F.lit(hi) == F.lit(lo), F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(num_bins - 1),
                    F.floor((v - F.lit(lo)) / F.lit(width)),
                ),
            )
        )
        .cast("long")
    )
    return (
        df.withColumn("__bin", b)
        .filter(F.col("__bin").isNotNull())
        .groupBy(F.col("__bin").alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def psi_from_histograms(
    ref_hist: DataFrame,
    new_hist: DataFrame,
    lo: float,
    hi: float,
    num_bins: int = 10,
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-bin PSI contributions from two fixed-grid count frames
    (``(bin, n)`` — :func:`histogram_fixed_grid` output or
    ``maintained_histogram`` state) — the READ side of the maintained
    drift monitor: identical output schema AND values to
    :func:`population_stability` when the grid equals the reference
    bounds (pytest-pinned), but computed from ≤ ``num_bins`` METADATA
    rows per side. At 100 TB the batch operator re-scans both
    populations every run; this reads two folded count tables, so the
    after-every-tick drift check costs nothing corpus-shaped."""
    width = (hi - lo) / num_bins
    spark = ref_hist.sparkSession
    grid = spark.range(num_bins).select(
        F.col("id").cast("long").alias("bin")
    )
    r = ref_hist.select("bin", F.col("n").alias("n_ref"))
    n = new_hist.select("bin", F.col("n").alias("n_new"))
    j = (
        grid.join(r, "bin", "left")
        .join(n, "bin", "left")
        .withColumn("n_ref", F.coalesce("n_ref", F.lit(0)))
        .withColumn("n_new", F.coalesce("n_new", F.lit(0)))
    )
    tot_ref = F.sum("n_ref").over(Window.partitionBy())
    tot_new = F.sum("n_new").over(Window.partitionBy())
    p_ref = (F.col("n_ref") + smoothing) / (tot_ref + smoothing * num_bins)
    p_new = (F.col("n_new") + smoothing) / (tot_new + smoothing * num_bins)
    return (
        j.withColumn("p_ref", p_ref)
        .withColumn("p_new", p_new)
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias(
                "bin_hi"
            ),
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_new").cast("long").alias("n_new"),
            "p_ref",
            "p_new",
            (
                (F.col("p_new") - F.col("p_ref"))
                * F.log(F.col("p_new") / F.col("p_ref"))
            ).alias("psi"),
        )
    )


def confusion_matrix(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Per-(label, predicted) evaluation table for any per-row
    classifier output (language ID, quality gates, dedup verdicts):
    count plus the row-normalized rate — the diagonal is per-class
    recall. Rates use explicit half-up 4dp (cross-engine stable).

    Scale: one groupBy shuffle; the output is |labels| × |preds| rows,
    so the rate window runs over a bounded table.
    """
    from kamu_engine_datafusion_spark.functions.columns import half_up

    w = Window.partitionBy(label_col)
    g = df.groupBy(label_col, pred_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    return g.select(
        label_col,
        pred_col,
        F.col("n").cast("long").alias("n"),
        half_up(F.col("n") / F.sum("n").over(w), 4).alias("rate"),
    )


def zone_map_audit(
    df: DataFrame,
    order_col: str,
    keys: dict,
    chunk_rows: int,
    n_probes: int = 9,
) -> DataFrame:
    """Zone-map / clustering-quality audit for candidate layout keys —
    the decision input for "should this 100 TB table be sorted (or
    Z-ordered) by column X?".

    ``order_col`` is the physical-position proxy (a dense monotonic id:
    the ODF ``offset`` ledger column, or any ingestion sequence);
    ``floor(order_col / chunk_rows)`` models the file/row-group a row
    would land in under the current layout. For every candidate key in
    ``keys`` (name → integral-valued Column) the audit builds the
    per-chunk ``[min, max]`` zone map — exactly the footer statistics
    Parquet keeps per row group and Delta/Iceberg keep per file — and
    reports, per key:

    - ``skip_frac`` for each of ``n_probes`` point probes placed at
      equal fractions of the key's global range (probe k at
      ``lo + floor((hi-lo)*k / (n_probes+1))``): the fraction of chunks
      whose zone range excludes the probe, i.e. the fraction of files a
      point predicate on that key would never read. ~1 - 1/n_chunks for
      a perfectly clustered key; ~0 for a key uncorrelated with layout
      (every chunk's range spans the domain, nothing prunes).
    - ``interleave_frac``: with chunks ordered by ``zmin``, the
      fraction whose range overlaps its predecessor's (``prev_max >=
      zmin``) — 0 means chunk ranges tile disjointly (already sorted),
      ~1 means fully interleaved (a rewrite would help).

    Scale: the only corpus-touching work is ONE scan feeding a partial+
    final aggregate keyed by chunk id (no join, no window over data
    rows). Everything downstream — melt, probe cross, lag window — runs
    over zone-map METADATA (``n_chunks × |keys|`` rows; at 100 TB with
    1M-row chunks that is ~1e5 rows per key), the same footprint as the
    table-format metadata layer itself. All probe/zone arithmetic is
    integral, so the oracle reproduces values exactly; the two ratios
    use half-up 6dp.

    Returns ``(key_name, probe_idx, probe_value, n_chunks, n_skipped,
    skip_frac, interleave_frac)``, one row per key × probe.
    """
    from kamu_engine_datafusion_spark.functions.columns import half_up

    key_names = list(keys)
    aggs = []
    for k in key_names:
        kc = F.col(f"__key_{k}")
        aggs.append(F.min(kc).alias(f"__min_{k}"))
        aggs.append(F.max(kc).alias(f"__max_{k}"))
    projected = df.select(
        F.floor(F.col(order_col).cast("long") / F.lit(int(chunk_rows))).alias(
            "__chunk"
        ),
        *[
            (F.col(c) if isinstance(c, str) else c).cast("long").alias(f"__key_{k}")
            for k, c in keys.items()
        ],
    )
    zm_wide = projected.groupBy("__chunk").agg(*aggs)
    stack_args = ", ".join(f"'{k}', __min_{k}, __max_{k}" for k in key_names)
    # Three consumers read the zone map (bounds/probes, the skip join,
    # the interleave window); without a barrier each would re-run the
    # corpus scan. The zone map is metadata-sized, so cut lineage and
    # materialize it once (the clustering.py localCheckpoint pattern —
    # no cache-registry entry to leak).
    zm = zm_wide.selectExpr(
        "__chunk",
        f"stack({len(key_names)}, {stack_args}) AS (key_name, zmin, zmax)",
    ).localCheckpoint(eager=True)

    bounds = zm.groupBy("key_name").agg(
        F.min("zmin").alias("__lo"),
        F.max("zmax").alias("__hi"),
        F.count(F.lit(1)).alias("n_chunks"),
    )
    step = n_probes + 1
    probes = bounds.select(
        "key_name",
        "n_chunks",
        F.explode(F.sequence(F.lit(1), F.lit(n_probes))).alias("__k"),
        "__lo",
        "__hi",
    ).select(
        "key_name",
        "n_chunks",
        F.col("__k").cast("long").alias("probe_idx"),
        (
            F.col("__lo")
            + F.floor(
                (F.col("__hi") - F.col("__lo")) * F.col("__k") / F.lit(float(step))
            ).cast("long")
        ).alias("probe_value"),
    )
    skipped = (
        zm.join(F.broadcast(probes), "key_name")
        .groupBy("key_name", "probe_idx", "probe_value", "n_chunks")
        .agg(
            F.sum(
                F.when(
                    (F.col("zmin") <= F.col("probe_value"))
                    & (F.col("probe_value") <= F.col("zmax")),
                    F.lit(0),
                ).otherwise(F.lit(1))
            )
            .cast("long")
            .alias("n_skipped")
        )
    )

    w = Window.partitionBy("key_name").orderBy("zmin", "zmax", "__chunk")
    interleave = (
        zm.withColumn("__prev_max", F.lag("zmax").over(w))
        .groupBy("key_name")
        .agg(
            half_up(
                F.sum(
                    F.when(
                        F.col("__prev_max").isNotNull()
                        & (F.col("__prev_max") >= F.col("zmin")),
                        F.lit(1),
                    ).otherwise(F.lit(0))
                )
                / F.count(F.lit(1)),
                6,
            ).alias("interleave_frac")
        )
    )

    return skipped.join(F.broadcast(interleave), "key_name").select(
        "key_name",
        "probe_idx",
        "probe_value",
        "n_chunks",
        "n_skipped",
        half_up(F.col("n_skipped") / F.col("n_chunks"), 6).alias("skip_frac"),
        "interleave_frac",
    )


def winsorize_from_sketch(
    df: DataFrame,
    sketch: DataFrame,
    value_col: str,
    group_cols: list[str],
    id_col: str,
    lower: tuple[int, int] = (1, 100),
    upper: tuple[int, int] = (99, 100),
) -> DataFrame:
    """Winsorize against cut points read from a MERGEABLE QUANTILE
    SKETCH (``operators/sketches.py::quantile_sketch`` or the
    continuously-maintained ``streaming.maintained_quantile_sketch``
    state) instead of re-aggregating percentiles over the corpus — the
    incremental form :func:`winsorize` can't offer: at 100 TB the
    per-run percentile aggregate re-reads ALL history every time, while
    the sketch state is ≤ k rows per group, folded forward tick by
    tick, and this clip is ONE broadcast join + in-row ``least/
    greatest`` over the scan.

    ``lower``/``upper`` are (num, den) rationals — the sketch
    estimator's integer rank selection, no float quantile args.
    Accuracy is the sketch's rank-error bound (audited by
    ``quantile_sketch_report``); same null semantics as
    :func:`winsorize` (nulls stay null).
    """
    from kamu_engine_datafusion_spark.operators.sketches import (
        quantile_sketch_estimates,
    )

    lo_tag = f"q_{lower[0]}_{lower[1]}"
    hi_tag = f"q_{upper[0]}_{upper[1]}"
    cuts = quantile_sketch_estimates(
        sketch, group_cols, id_col, value_col, qs=[lower, upper]
    ).select(
        *group_cols,
        F.col(lo_tag).alias("__wlo"),
        F.col(hi_tag).alias("__whi"),
    )
    # LEFT join: a group present in the increment but absent from the
    # sketch state (first appearance before the next sketch fold) must
    # pass through UNCLIPPED, not be dropped — the winsorize family's
    # contract is "clamped, not dropped; row counts are unaffected".
    joined = df.join(F.broadcast(cuts), group_cols, "left")
    clipped = F.when(
        F.col(value_col).isNotNull(),
        F.least(
            F.greatest(
                F.col(value_col),
                F.coalesce(F.col("__wlo"), F.col(value_col)),
            ),
            F.coalesce(F.col("__whi"), F.col(value_col)),
        ),
    )
    return joined.withColumn(
        f"{value_col}_winsorized", clipped
    ).drop("__wlo", "__whi")


def rater_agreement(
    df: DataFrame, col_a: str, col_b: str, dp: int = 6
) -> DataFrame:
    """Cohen's kappa between two per-row label columns (Cohen 1960) —
    the label-QA companion of :func:`confusion_matrix`: how much two
    raters (a human pass vs a classifier, two classifier versions, a
    heuristic vs a model) agree BEYOND chance. ``κ = (p_o − p_e) /
    (1 − p_e)`` with observed agreement ``p_o = Σ_i n_ii / n`` and
    chance agreement ``p_e = Σ_i (row_i · col_i) / n²``.

    Returns ONE row ``(n_rows, n_agree, po, pe, kappa)`` — counts
    exact BIGINT, the three ratios half-up ``dp`` from exact integer
    sums, so the whole row is engine-portable (no float accumulation
    order in play). Rows where either label is NULL are excluded
    (agreement over missing labels is undefined). Degenerate corpus
    (p_e = 1: both raters constant and equal) returns κ = 1.0 if they
    agree everywhere — the standard convention — via a when-guard
    instead of 0/0.

    Scale: one |A|×|B|-sized groupBy count; everything after runs on
    that bounded table.
    """
    from kamu_engine_datafusion_spark.functions.columns import half_up

    cells = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(
            F.col(col_a).cast("string").alias("__a"),
            F.col(col_b).cast("string").alias("__b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    row_tot = cells.groupBy("__a").agg(F.sum("__n").alias("__ra"))
    col_tot = cells.groupBy("__b").agg(F.sum("__n").alias("__cb"))
    # Σ row_i·col_i over the LABEL UNIVERSE = join on equal label value
    chance = (
        row_tot.join(col_tot, F.col("__a") == F.col("__b"))
        .agg(F.sum(F.col("__ra") * F.col("__cb")).alias("__pe_num"))
        .select(F.coalesce("__pe_num", F.lit(0)).alias("__pe_num"))
    )
    totals = cells.agg(
        F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__n"))),
            F.lit(0),
        )
        .cast("long")
        .alias("n_agree"),
    )
    j = totals.crossJoin(F.broadcast(chance))
    # Empty / all-NULL-label input: n_rows 0, counts 0, and the three
    # ratios NULL (agreement over zero jointly-labeled rows is
    # undefined) — never a NULL n_rows or a 0/0.
    po = F.when(
        F.col("n_rows") > 0, F.col("n_agree") / F.col("n_rows")
    )
    pe = F.when(
        F.col("n_rows") > 0,
        F.col("__pe_num") / (F.col("n_rows") * F.col("n_rows")),
    )
    kappa = F.when(pe == 1.0, F.when(po == 1.0, F.lit(1.0)).otherwise(
        F.lit(0.0)
    )).otherwise((po - pe) / (F.lit(1.0) - pe))
    return j.select(
        "n_rows",
        "n_agree",
        half_up(po, dp).alias("po"),
        half_up(pe, dp).alias("pe"),
        half_up(kappa, dp).alias("kappa"),
    )


def moment_counts(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-group FIXED-POINT sufficient moments ``(grp…, n, s1, s2)``
    — the additive increment of the maintained feature-scaler
    (``streaming.maintained_moments``), the ``centroid_stats``
    discipline applied 1-D: values quantize half-up at ``scale``
    (``q = floor(x·scale + 0.5)``, BIGINT), and ``n``/``Σq``/``Σq²``
    are exact integers, so the cross-tick fold is cell-wise BIGINT
    addition and state after any ticks equals the batch moments of
    the whole ledger BIT-EXACTLY — float sums would be
    summation-order-sensitive and could never hash across engines.
    NULL values are dropped (defined behavior, matching
    :func:`standardize`'s avg/stddev NULL-skipping).

    Overflow envelope: ``Σq² ≤ n·(scale·|x|max)²``, so BIGINT holds
    ``n ≤ 9.2e18 / (scale·|x|max)²`` rows per group — at the default
    1e6 scale that is ~922 rows for |x| ≤ 100 and ~92k rows only for
    |x| ≤ 10; size ``scale`` down for wide-range features (the
    :func:`~kamu_engine_datafusion_spark.operators.clustering.semdedup`
    envelope note applies). ``q²`` is squared in DECIMAL(19,0) —
    never BIGINT — so a single row with ``scale·|x| > ~3.03e9``
    cannot wrap silently inside the multiply (any BIGINT ``q``
    squares exactly into DECIMAL(38,0)); the ``Σq²`` aggregate then
    accumulates in DECIMAL(38,0) and raises in-plan if the group
    total leaves the BIGINT range — a loud error instead of Spark's
    silent non-ANSI ``sum(long)`` wrap, which would corrupt every
    downstream z-score/outlier gate (:func:`zscore_from_moments`)
    undetectably. The cross-TICK fold envelope is the caller's to
    size (the fold is cell-wise BIGINT addition over per-tick values
    this guard already certified ≤ 2⁶³−1).

    Scale: ONE partial+final aggregate emitting groups × 3 longs."""
    group_cols = group_cols or []
    q = F.floor(
        F.col(value_col).cast("double") * F.lit(float(scale)) + F.lit(0.5)
    ).cast("long")
    rows = df.filter(F.col(value_col).isNotNull())
    gb = rows.groupBy(*group_cols) if group_cols else rows.groupBy()
    qd = q.cast("decimal(19,0)")
    s2d = F.sum((qd * qd).cast("decimal(38,0)"))
    long_max = F.lit(9223372036854775807).cast("decimal(38,0)")
    return gb.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(q).cast("long").alias("s1"),
        F.when(s2d <= long_max, s2d.cast("long"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "moment_counts: sum(q*q) exceeds BIGINT for a "
                        "group — reduce `scale` (envelope n <= "
                        "9.2e18/(scale*|x|max)^2); got "
                    ),
                    s2d.cast("string"),
                )
            ).cast("long")
        )
        .alias("s2"),
    )


def zscore_from_moments(
    df: DataFrame,
    moments: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    scale: int = 1_000_000,
    dp: int = 6,
    outlier_z: float | None = None,
) -> DataFrame:
    """Z-score a frame against MAINTAINED moments state ALONE — the
    feature-normalization serving read (train-time statistics applied
    to new ticks, the classic scaler contract): mean and sample
    variance derive from the exact integer ``(n, s1, s2)`` in ONE
    defined float expression tree (``mu_q = s1/n``, ``var_q = (s2 −
    s1²/n)/(n−1)`` — s1² computed in double, never BIGINT, so big
    groups cannot overflow), the row's quantized value z-scores as
    ``(q − mu_q)/sqrt(var_q)`` half-up ``dp``, NULL when the group
    has < 2 rows or zero variance (exactly :func:`standardize`'s
    convention — the quantized z equals the float z up to the
    1/scale quantization, which is the DOCUMENTED contract, not a
    bug: it is what makes the state foldable and the read
    hash-verifiable). ``outlier_z`` appends ``is_outlier = |z| >
    outlier_z`` (NULL z ⇒ false) — the serving form of an outlier
    gate that never re-scans history.

    Scale: the moments frame is groups-sized (broadcast); the scored
    frame is touched once, no shuffle beyond the join."""
    from kamu_engine_datafusion_spark.functions.columns import half_up

    group_cols = group_cols or []
    st = moments.select(
        *group_cols,
        F.col("n").cast("double").alias("__n"),
        F.col("s1").cast("double").alias("__s1"),
        F.col("s2").cast("double").alias("__s2"),
    )
    joined = (
        df.join(F.broadcast(st), group_cols)
        if group_cols
        else df.crossJoin(F.broadcast(st))
    )
    q = F.floor(
        F.col(value_col).cast("double") * F.lit(float(scale)) + F.lit(0.5)
    ).cast("long")
    mu = F.col("__s1") / F.col("__n")
    var = (F.col("__s2") - F.col("__s1") * F.col("__s1") / F.col("__n")) / (
        F.col("__n") - F.lit(1.0)
    )
    z = F.when(
        (F.col("__n") >= 2) & (var > 0),
        half_up((q.cast("double") - mu) / F.sqrt(var), dp),
    )
    out = joined.withColumn(f"{value_col}_z", z).drop(
        "__n", "__s1", "__s2"
    )
    if outlier_z is not None:
        out = out.withColumn(
            "is_outlier",
            F.coalesce(
                F.abs(F.col(f"{value_col}_z")) > F.lit(float(outlier_z)),
                F.lit(False),
            ),
        )
    return out
