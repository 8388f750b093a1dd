"""Layer-B (delegated SQL surface) query entries — SURVEY.md §2B.

One deterministic query per B-row, written Spark-first (DataFrame API or
Spark SQL — Catalyst produces the same plan) with a DuckDB oracle.
The reference exposes this surface by passing SQL through to DataFusion
(``src/engine.rs:287``); in this engine it is Spark SQL itself, so these
queries both *verify* coverage and document the mapping.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kamu_engine_datafusion_spark.queries._util import dsum, load

# ---------------------------------------------------------------------------
# Scans / sources / sinks (B1-B4)
# ---------------------------------------------------------------------------


def q_b01_parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: multi-column Parquet scan with stats (`spark.read.parquet`)."""
    t = load(spark, sf_dir, "lineitem")
    return t["lineitem"].agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_orderkey").alias("min_orderkey"),
        F.max("l_orderkey").alias("max_orderkey"),
    )


def q_b02_view_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: temp-view registration + SQL over the view."""
    load(spark, sf_dir, "nation")
    return spark.sql(
        "SELECT n_regionkey AS regionkey, COUNT(*) AS n_nations "
        "FROM nation GROUP BY n_regionkey"
    )


def q_b03_information_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: catalog introspection at the level a migrating user actually
    queries — ``information_schema.columns``-style (table, column,
    ordinal, type) over the registered views (reference
    ``src/engine.rs:36`` enables the whole information_schema catalog).
    Types are normalized to Spark's lowercase names; the DuckDB oracle
    maps its SQL-standard type names onto the same vocabulary, making
    this a full hash-checked entry (plus the SHOW VIEWS-style presence
    check folded into the same result)."""
    tables = ("customer", "nation", "region")
    load(spark, sf_dir, *tables)
    rows = [
        (t, c.name, pos + 1, c.dataType)
        for t in tables
        for pos, c in enumerate(spark.catalog.listColumns(t))
    ]
    return spark.createDataFrame(
        rows,
        "table_name string, column_name string, "
        "ordinal_position bigint, data_type string",
    ).orderBy("table_name", "ordinal_position")


def q_b04_parquet_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4/A17: single-file snappy Parquet sink + read-back round-trip."""
    from kamu_engine_datafusion_spark.sources.sink import write_parquet_single_file

    t = load(spark, sf_dir, "lineitem")
    sub = t["lineitem"].filter(F.col("l_shipdate") >= "1997-06-01").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    path = os.path.join(tempfile.mkdtemp(prefix="odf-b04-"), "out.parquet")
    write_parquet_single_file(sub, path)
    back = spark.read.parquet(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# Projections / filters / predicates (B5-B9)
# ---------------------------------------------------------------------------


def q_b05_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: projection with computed expressions and aliases."""
    t = load(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") <= 1000)
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("linenumber"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "disc_price"
            ),
            (F.col("l_quantity") + 100).alias("qty_plus"),
        )
    )


def q_b06_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: WHERE with comparison + boolean predicates (pushed to scan)."""
    t = load(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_returnflag") == "R")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        )
    )


def q_b07_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: CAST across string/timestamp/date/numeric."""
    t = load(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") <= 300)
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("string").alias("linenumber_str"),
            F.col("l_shipdate").cast("date").alias("ship_date"),
            F.floor("l_quantity").cast("long").alias("qty_int"),
            F.col("l_tax").cast("string").alias("tax_str"),
        )
    )


def q_b08_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: literal/constant projection (mirrors the reference's
    literal-tagged UNION fixture, ``tests/tests/test_regressions.rs:35``)."""
    load(spark, sf_dir, "region")
    return spark.sql(
        "SELECT 'AB' AS province, CAST(42 AS BIGINT) AS answer, "
        "CAST(2.5 AS DOUBLE) AS ratio, true AS flag, "
        "DATE '2023-01-15' AS d, r_regionkey FROM region"
    )


def q_b09_case_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9: CASE/WHEN, IN, BETWEEN, IS NULL, LIKE."""
    t = load(spark, sf_dir, "orders")
    o = t["orders"]
    bucket = (
        F.when(F.col("o_totalprice") > 250000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
    )
    return (
        o.filter(
            F.col("o_orderstatus").isin("O", "F")
            & F.col("o_orderdate").between("1995-01-01", "1997-12-31")
            & F.col("o_orderpriority").like("%URGENT%")
            & F.col("o_custkey").isNotNull()
        )
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


# ---------------------------------------------------------------------------
# Joins (B10-B14)
# ---------------------------------------------------------------------------


def q_b10_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: inner equi-join; small dim side broadcast explicitly — no
    shuffle of the big side at any scale."""
    t = load(spark, sf_dir, "orders", "customer")
    return (
        t["orders"]
        .join(
            F.broadcast(t["customer"]),
            t["orders"].o_custkey == t["customer"].c_custkey,
            "inner",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


def q_b11_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11: left outer join preserving customers without orders."""
    t = load(spark, sf_dir, "orders", "customer")
    per_cust = (
        t["customer"]
        .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


def q_b11_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11: full outer join with unmatched rows on both sides."""
    t = load(spark, sf_dir, "nation", "supplier")
    joined = t["nation"].join(
        t["supplier"], t["nation"].n_nationkey == t["supplier"].s_nationkey, "full"
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("s_suppkey").alias("n_suppliers"),
        F.count("n_nationkey").alias("n_nation_side"),
    )


def q_b12_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: left-semi (EXISTS) and left-anti (NOT EXISTS) joins."""
    t = load(spark, sf_dir, "orders", "customer")
    c, o = t["customer"], t["orders"]
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .withColumn("kind", F.lit("with_orders"))
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .withColumn("kind", F.lit("no_orders"))
    )
    return semi.unionByName(anti).select("kind", "c_nationkey", "n_cust")


def q_b13_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13: cross join (cartesian product of two small dims)."""
    t = load(spark, sf_dir, "region", "nation")
    return (
        t["region"]
        .crossJoin(t["nation"])
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min(F.concat_ws("-", "r_name", "n_name")).alias("first_pair"),
        )
    )


def q_b14_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14: non-equi (theta) join → BroadcastNestedLoopJoin with the small
    side broadcast."""
    t = load(spark, sf_dir, "supplier", "customer")
    s, c = t["supplier"], t["customer"]
    return (
        c.join(F.broadcast(s), c.c_acctbal > s.s_acctbal)
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_richer_customers"))
    )


# ---------------------------------------------------------------------------
# Aggregations (B16-B22)
# ---------------------------------------------------------------------------


def q_b10_tpch_q5alike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table star join (TPC-H Q5 shape): revenue per nation. Small
    dims broadcast, fact side never shuffles until the final group-by;
    Catalyst orders the joins."""
    t = load(
        spark, sf_dir, "region", "nation", "customer", "orders", "lineitem",
        "supplier",
    )
    return (
        t["lineitem"]
        .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .join(t["customer"], t["orders"].o_custkey == t["customer"].c_custkey)
        .join(
            F.broadcast(t["supplier"]),
            t["lineitem"].l_suppkey == t["supplier"].s_suppkey,
        )
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(t["nation"]),
            t["supplier"].s_nationkey == t["nation"].n_nationkey,
        )
        .join(
            F.broadcast(t["region"]),
            t["nation"].n_regionkey == t["region"].r_regionkey,
        )
        .filter(F.col("r_name").isin("AMERICA", "ASIA"))
        .groupBy("n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_b26_tpch_q3alike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + aggregate + top-k (TPC-H Q3 shape): ten highest-revenue
    orders in a segment — TakeOrderedAndProject over the aggregate."""
    t = load(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        t["lineitem"]
        .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .join(
            F.broadcast(
                t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
            ),
            t["orders"].o_custkey == t["customer"].c_custkey,
        )
        .filter(F.col("o_orderdate") < "1997-06-01")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
        )
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q_b16_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16: TPC-H Q1-alike pricing summary — hash aggregate with partial
    (map-side) + final phases; the flagship query."""
    t = load(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "sum_disc_price",
            ),
            dsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                "sum_charge",
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_b17_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17: exact DISTINCT aggregates.

    r18 REVERT of the r17 three-branch restructure, decided by the
    sf1 crossover measurement VERDICT r17 item 7 asked for
    (row-identical both ways — pytest-pinned): the r17 form ran three
    independent distinct→count branches (narrower exchanges, map-side
    dedup) but paid THREE lineitem scans; the fused
    three-countDistinct form pays one scan plus an Expand that
    triples rows through one exchange. At sf0.1 the branches won
    marginally (1.05 → 0.88 s — page-cached scans are nearly free);
    at sf1 (6M rows, /tmp/sfbig) the FUSED form wins every arm of a
    within-JVM alternating A/B (2.8-3.7 s vs 4.1-7.2 s) because the
    scans dominate — and at 100 TB on cold storage the 3× scan cost
    only grows. Scan count beats exchange width here; the crossover
    is recorded in PLANS.md §b17."""
    t = load(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


def q_b18_approx_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18: approximate aggregates (HLL++ / TDigest). Engine-specific
    sketches can't hash-match an oracle → rows-only check."""
    t = load(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("apx_parts"),
            F.percentile_approx("l_extendedprice", 0.5).alias("apx_median_price"),
        )
    )


def q_b18_approx_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18 invariant projection (r9): converts the sketch family's
    rows-only risk into a hash-checkable key, the ``xpack_ffd_stats``
    pattern — exact distinct counts per group (fully hash-verified)
    plus sketch-accuracy flags pinned against literal 1 in the oracle:
    HLL++ distinct within 5% of exact (default rsd 0.05), TDigest-style
    approx median inside the exact p40–p60 band. The raw sketch values
    stay in ``b18_approx_agg`` (rows-only by design); this key proves
    they are RIGHT, under one value hash."""
    t = load(spark, sf_dir, "lineitem")
    # r17 (guide §2.3, the b17 device): the fused form mixed ONE
    # distinct aggregate with four regular ones — Catalyst's distinct
    # rewrite Expands every row ×2 and ships the exact-percentile
    # ObjectHashAggregate buffers through the doubled exchange
    # (measured 10.3 s fused vs 3.4 s split at sf0.1). Split into a
    # pure-distinct branch (two-phase, no Expand) and a regular branch
    # (one pass; the two EXACT percentiles share one buffer via the
    # array form — same interpolation, identical doubles), joined on
    # the 3-row group key (broadcast). Values are bit-identical —
    # oracle hash unchanged.
    li = t["lineitem"].select(
        "l_returnflag", "l_partkey", "l_extendedprice"
    )
    dist = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("long").alias("n_parts_exact"),
    )
    rest = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("__apx"),
        F.percentile_approx(
            "l_extendedprice", F.lit(0.5), F.lit(10000)
        ).alias("__apx_med"),
        F.expr(
            "percentile(l_extendedprice, array(0.4, 0.6))"
        ).alias("__p"),
    )
    g = dist.join(F.broadcast(rest), "l_returnflag").select(
        "l_returnflag",
        "n_parts_exact",
        "__apx",
        "__apx_med",
        F.element_at("__p", 1).alias("__p40"),
        F.element_at("__p", 2).alias("__p60"),
    )
    return g.select(
        "l_returnflag",
        "n_parts_exact",
        (
            F.abs(F.col("__apx") - F.col("n_parts_exact"))
            <= 0.05 * F.col("n_parts_exact")
        )
        .cast("long")
        .alias("hll_within_5pct"),
        (
            (F.col("__apx_med") >= F.col("__p40"))
            & (F.col("__apx_med") <= F.col("__p60"))
        )
        .cast("long")
        .alias("apx_median_in_p40_p60"),
    )


def q_b19_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19: statistical aggregates."""
    t = load(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "covar_qty_price"
            ),
        )
    )


def q_b19_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19 variant: exact interpolated percentiles (percentile_cont)."""
    t = load(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", 0.5), 4).alias("p50_price"),
            F.round(F.percentile("l_extendedprice", 0.9), 4).alias("p90_price"),
            F.round(F.percentile("l_quantity", 0.25), 4).alias("p25_qty"),
        )
    )


def q_b20_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20: ROLLUP with GROUPING() indicators (CUBE/GROUPING SETS share the
    same Expand-based plan)."""
    t = load(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.grouping("l_returnflag").cast("long").alias("g_rf"),
            F.grouping("l_linestatus").cast("long").alias("g_ls"),
        )
    )


def q_b20_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20 variant: explicit GROUPING SETS (shares the Expand plan with
    rollup/cube but with a hand-picked set list)."""
    load(spark, sf_dir, "lineitem")
    return spark.sql(
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
        "CAST(grouping(l_returnflag) AS BIGINT) AS g_rf "
        "FROM lineitem GROUP BY GROUPING SETS "
        "((l_returnflag), (l_returnflag, l_linestatus), ())"
    )


def q_b23_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23 variant: top-2 lineitems per supplier — the canonical
    window + rank ≤ k pattern (no global sort)."""
    t = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        t["lineitem"]
        .select(
            "l_suppkey",
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("linenumber"),
            "l_extendedprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 2)
    )


def q_b10_join_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10 variant: the same equi-join forced to SortMergeJoin via hint —
    the strategy Catalyst picks when neither side fits in memory."""
    t = load(spark, sf_dir, "orders", "customer")
    return (
        t["orders"]
        .join(
            t["customer"].hint("SHUFFLE_MERGE"),
            t["orders"].o_custkey == t["customer"].c_custkey,
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


def q_b39_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B39 variant: explode/unnest a generated sequence into rows."""
    t = load(spark, sf_dir, "part")
    exploded = (
        t["part"]
        .filter(F.col("p_partkey") <= 50)
        .select(
            "p_partkey",
            F.explode(F.sequence(F.lit(1), F.col("p_size"))).alias("i"),
        )
    )
    return exploded.groupBy("p_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("i").cast("long").alias("s"),
    )


def q_b21_collect_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B21: array_agg/string_agg/bool_and/bool_or (collect_list is
    order-nondeterministic in a distributed engine → sort before join)."""
    t = load(spark, sf_dir, "region", "nation")
    joined = t["nation"].join(
        F.broadcast(t["region"]),
        t["nation"].n_regionkey == t["region"].r_regionkey,
    )
    return joined.groupBy("r_name").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
        F.bool_and(F.col("n_nationkey") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("n_nationkey") > 20).alias("any_gt20"),
    )


def q_b22_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22: SELECT DISTINCT."""
    t = load(spark, sf_dir, "lineitem")
    return t["lineitem"].select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# Window functions (B23-B25)
# ---------------------------------------------------------------------------


def q_b23_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23: ranking windows (ties broken by unique key → deterministic).

    r17 restructure (row- and schema-identical — pytest-pinned against
    the direct six-function window, oracle unchanged): the original
    form computed rank/dense_rank/ntile/percent_rank/cume_dist over a
    FIVE-partition window, which serializes the whole table through 5
    tasks and blocks the WindowGroupLimit pushdown (guide §2.5: hot
    partition keys). Because the window order ends on the unique
    ``o_orderkey``, ties are impossible, so for the surviving rows
    (rn ≤ 5) every other function is arithmetic in (rn, n):
    rank = dense_rank = rn, percent_rank = (rn−1)/(n−1), cume_dist =
    rn/n, and ntile(4) follows its documented fill rule (first n mod 4
    tiles get ⌈n/4⌉ rows). The rewritten plan is a rank-ONLY window —
    Spark inserts partial+final WindowGroupLimit, so each map task
    ships only its local top-5 per priority instead of the full table —
    plus a 5-row broadcast of the per-priority counts. Measured
    0.44→0.33 s warm at sf0.1; at scale the full-table 5-task sort
    disappears entirely."""
    t = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    cnt = (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    top = (
        t["orders"]
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )
    n, rn = F.col("__n"), F.col("rn")
    # ntile(4): q = n div 4 rows per tile, the first r = n mod 4 tiles
    # carry one extra. Exact integer arithmetic (div/pmod — no doubles).
    quartile = F.when(
        rn <= F.expr("(__n % 4) * (__n div 4 + 1)"),
        F.expr("(rn - 1) div (__n div 4 + 1) + 1"),
    ).otherwise(
        F.expr("__n % 4 + (rn - (__n % 4) * (__n div 4 + 1) - 1) div (__n div 4) + 1")
    )
    pct_rank = F.when(
        n > 1, (rn.cast("double") - 1.0) / (n.cast("double") - 1.0)
    ).otherwise(F.lit(0.0))
    cume = rn.cast("double") / n.cast("double")
    return top.join(F.broadcast(cnt), "o_orderpriority").select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        "rn",
        rn.alias("rk"),
        rn.alias("drk"),
        quartile.cast("int").alias("quartile"),
        F.round(pct_rank, 6).alias("pct_rank"),
        F.round(cume, 6).alias("cume"),
    )


def q_b24_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24: lag/lead/first/last/nth_value per user session."""
    t = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t["events"]
        .filter(F.col("user_id") < 40)
        .select(
            "user_id",
            "event_id",
            "value",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
            F.first("value").over(w).alias("first_value"),
            F.last("value").over(w).alias("last_value"),
            F.nth_value("value", 2).over(w).alias("second_value"),
        )
    )


def q_b25_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B25: aggregates over ROWS/RANGE frames."""
    t = load(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("event_id")
    return (
        t["events"]
        .filter(F.col("user_id") < 40)
        .select(
            "user_id",
            "event_id",
            F.round(
                F.sum("value").over(wo.rowsBetween(Window.unboundedPreceding, 0)), 4
            ).alias("running_sum"),
            F.round(F.avg("value").over(wo.rowsBetween(-2, 0)), 4).alias("mov_avg3"),
            F.round(F.sum("value").over(wo.rangeBetween(-100, 0)), 4).alias(
                "range_sum"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Sorts / limits (B26-B27)
# ---------------------------------------------------------------------------


def q_b26_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26: multi-key ORDER BY with NULLS FIRST (made visible via LIMIT →
    TakeOrderedAndProject, no global sort materialization)."""
    t = load(spark, sf_dir, "orders")
    return (
        t["orders"]
        .select(
            "o_orderkey",
            "o_totalprice",
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio_or_null"),
        )
        .orderBy(
            F.col("prio_or_null").asc_nulls_first(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
        .limit(10)
    )


def q_b27_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27: LIMIT/OFFSET over a total order."""
    load(spark, sf_dir, "orders")
    return spark.sql(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_orderkey LIMIT 7 OFFSET 11"
    )


# ---------------------------------------------------------------------------
# Set operations / subqueries (B28-B30)
# ---------------------------------------------------------------------------


def q_b28_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B28: UNION ALL with literal tags + int→bigint coercion (mirrors the
    reference's schema-divergent union regression,
    ``tests/tests/test_regressions.rs:30-53``)."""
    t = load(spark, sf_dir, "nation", "customer")
    a = t["nation"].select(
        F.lit("NK").alias("src"), F.col("n_nationkey").cast("long").alias("id")
    )
    b = t["customer"].select(
        F.lit("CK").alias("src"), F.col("c_custkey").cast("long").alias("id")
    )
    return (
        a.unionByName(b)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
    )


def q_b29_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B29: UNION (distinct), INTERSECT, EXCEPT."""
    t = load(spark, sf_dir, "customer", "supplier")
    c = t["customer"].select(F.col("c_nationkey").cast("long").alias("k")).distinct()
    s = t["supplier"].select(F.col("s_nationkey").cast("long").alias("k")).distinct()
    return (
        c.intersect(s).withColumn("tag", F.lit("both"))
        .unionByName(c.exceptAll(s).withColumn("tag", F.lit("cust_only")))
        .unionByName(c.union(s).distinct().withColumn("tag", F.lit("any")))
        .select("tag", "k")
    )


def q_b30_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30: scalar subquery + IN subquery + CTE + derived table (ANSI text
    shared verbatim with the oracle)."""
    load(spark, sf_dir, "orders", "customer")
    return spark.sql(_B30_SQL)


_B30_SQL = (
    "WITH big AS (SELECT o_custkey FROM orders "
    "WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)) "
    "SELECT c_mktsegment, COUNT(*) AS n_big_customers FROM customer "
    "WHERE c_custkey IN (SELECT o_custkey FROM big) "
    "GROUP BY c_mktsegment"
)


# ---------------------------------------------------------------------------
# Scalar functions (B31-B41)
# ---------------------------------------------------------------------------


def q_b31_string_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B31: core string functions."""
    t = load(spark, sf_dir, "part")
    return t["part"].select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.locate("a", F.col("p_name")).cast("long").alias("a_pos"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.translate("p_brand", "#", "_").alias("tbrand"),
        F.hex(F.col("p_partkey")).alias("key_hex"),
        F.col("p_type").startswith("STANDARD").alias("is_standard"),
    )


def q_b32_unicode_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B32: unicode string ops (left/right/lpad/rpad/reverse/initcap)."""
    t = load(spark, sf_dir, "part")
    return t["part"].select(
        "p_partkey",
        F.char_length("p_name").cast("long").alias("clen"),
        F.expr("left(p_name, 3)").alias("l3"),
        F.expr("right(p_name, 3)").alias("r3"),
        F.lpad("p_brand", 12, "*").alias("lpadded"),
        F.rpad("p_brand", 12, "*").alias("rpadded"),
        F.reverse("p_brand").alias("rev"),
        F.initcap("p_brand").alias("icap"),
    )


def q_b33_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B33: regex extract/like/replace/count."""
    t = load(spark, sf_dir, "documents")
    return t["documents"].select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.col("text").rlike("join").alias("has_join"),
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "*").alias(
            "devoweled40"
        ),
        F.regexp_count(F.col("text"), F.lit("the")).cast("long").alias("n_the"),
    )


def q_b34_crypto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B34: crypto digests (md5/sha2)."""
    t = load(spark, sf_dir, "documents")
    return t["documents"].select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
    )


def q_b35_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B35: base64/hex encode-decode round-trips."""
    t = load(spark, sf_dir, "part")
    return t["part"].select(
        "p_partkey",
        F.base64(F.col("p_brand").cast("binary")).alias("b64"),
        F.unbase64(F.base64(F.col("p_brand").cast("binary")))
        .cast("string")
        .alias("b64_roundtrip"),
        F.lower(F.hex(F.col("p_brand"))).alias("hex_str"),
    )


def q_b36_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B36: math scalar functions."""
    t = load(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") <= 200)
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("ln"),
            F.round(F.abs(-F.col("l_extendedprice")), 2).alias("abs_price"),
            F.ceil("l_discount").cast("long").alias("ceil_disc"),
            F.floor("l_tax").cast("long").alias("floor_tax"),
            F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
            F.round(F.exp("l_discount"), 6).alias("exp_disc"),
            F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
            F.round(F.log10("l_extendedprice"), 6).alias("log10_price"),
            F.round(F.log2("l_quantity"), 6).alias("log2_qty"),
            F.round(F.pow("l_quantity", 2.0), 2).alias("qty_sq"),
            F.round(F.sin("l_quantity"), 6).alias("sin_qty"),
        )
    )


def q_b37_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B37: date/time functions (trunc/extract/format/interval/bin)."""
    t = load(spark, sf_dir, "orders")
    week_ms = 7 * 24 * 3600 * 1000
    return (
        t["orders"]
        .filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .alias("month_start"),
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
            F.dayofmonth("o_orderdate").cast("long").alias("dom"),
            F.to_date("o_orderdate").alias("odate"),
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
            .cast("date")
            .alias("due_date"),
            F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date"))
            .cast("long")
            .alias("days_to_end"),
            F.timestamp_millis(
                (
                    F.floor(
                        F.unix_millis(F.col("o_orderdate").cast("timestamp")) / week_ms
                    )
                    * week_ms
                ).cast("long")
            )
            .cast("date")
            .alias("week_bin"),
        )
    )


def q_b38_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B38: conditional/null-handling functions."""
    t = load(spark, sf_dir, "orders")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
                "status2"
            ),
            F.nvl2(
                F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")),
                F.lit("prioritized"),
                F.lit("low"),
            ).alias("prio_class"),
            F.ifnull(F.nullif(F.col("o_orderstatus"), F.lit("F")), F.lit("notF")).alias(
                "not_f"
            ),
            F.nullif(F.col("o_orderstatus"), F.lit("O")).eqNullSafe(F.lit("F")).alias(
                "ns_eq_f"
            ),
        )
    )


def q_b39_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B39: array construction/access/length + unnest/generate_series."""
    t = load(spark, sf_dir, "embeddings")
    return (
        t["embeddings"]
        .filter(F.col("vec_id") < 100)
        .select(
            "vec_id",
            F.size("embedding").cast("long").alias("dim"),
            F.element_at("embedding", 1).cast("double").alias("e1"),
            F.array_max("embedding").cast("double").alias("emax"),
            F.array_contains(F.array(F.lit(1), F.lit(2), F.lit(3)), F.col("label"))
            .alias("label_in_123"),
            F.aggregate(
                F.sequence(F.lit(1), (F.col("label") + 2).cast("int")),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("series_sum"),
        )
    )


def q_b40_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B40: struct/map construction and field access (final schema kept
    primitive so both engines hash identically)."""
    t = load(spark, sf_dir, "orders")
    o = t["orders"].filter(F.col("o_orderkey") <= 300)
    st = F.struct(
        F.col("o_orderstatus").alias("s"), F.col("o_totalprice").alias("p")
    )
    mp = F.create_map(F.lit("price"), F.col("o_totalprice"))
    return o.select(
        "o_orderkey",
        st.getField("s").alias("status_from_struct"),
        F.round(st.getField("p"), 2).alias("price_from_struct"),
        F.round(mp[F.lit("price")], 2).alias("price_from_map"),
    )


def q_b41_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B41: JSON-in-string functions (reference golden test
    ``tests/tests/test_transform.rs:724-756``)."""
    t = load(spark, sf_dir, "events")
    return (
        t["events"]
        .filter(F.col("event_id") < 300)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            F.get_json_object("props", "$.k").cast("long").alias("k_int"),
            F.get_json_object(F.lit('{"foo": 123}'), "$.foo").cast("long").alias(
                "const_foo"
            ),
        )
    )


QUERIES = {
    "b01_parquet_scan": q_b01_parquet_scan,
    "b02_view_scan": q_b02_view_scan,
    "b03_information_schema": q_b03_information_schema,
    "b04_parquet_sink": q_b04_parquet_sink,
    "b05_projection": q_b05_projection,
    "b06_filter": q_b06_filter,
    "b07_cast": q_b07_cast,
    "b08_literals": q_b08_literals,
    "b09_case_predicates": q_b09_case_predicates,
    "b10_join_inner": q_b10_join_inner,
    "b11_join_left": q_b11_join_left,
    "b11_join_full": q_b11_join_full,
    "b12_semi_anti": q_b12_semi_anti,
    "b13_cross_join": q_b13_cross_join,
    "b14_theta_join": q_b14_theta_join,
    "b10_tpch_q5alike": q_b10_tpch_q5alike,
    "b26_tpch_q3alike": q_b26_tpch_q3alike,
    "b16_groupby_agg": q_b16_groupby_agg,
    "b17_count_distinct": q_b17_count_distinct,
    "b18_approx_agg": q_b18_approx_agg,
    "b18_approx_bounds": q_b18_approx_bounds,
    "b19_stats_agg": q_b19_stats_agg,
    "b19_percentile": q_b19_percentile,
    "b20_rollup": q_b20_rollup,
    "b20_grouping_sets": q_b20_grouping_sets,
    "b23_topk_per_group": q_b23_topk_per_group,
    "b10_join_shuffle": q_b10_join_shuffle,
    "b39_explode": q_b39_explode,
    "b21_collect_agg": q_b21_collect_agg,
    "b22_distinct": q_b22_distinct,
    "b23_ranking": q_b23_ranking,
    "b24_analytic": q_b24_analytic,
    "b25_window_frames": q_b25_window_frames,
    "b26_orderby": q_b26_orderby,
    "b27_limit_offset": q_b27_limit_offset,
    "b28_union_all": q_b28_union_all,
    "b29_setops": q_b29_setops,
    "b30_subqueries": q_b30_subqueries,
    "b31_string_core": q_b31_string_core,
    "b32_unicode_string": q_b32_unicode_string,
    "b33_regex": q_b33_regex,
    "b34_crypto": q_b34_crypto,
    "b35_encoding": q_b35_encoding,
    "b36_math": q_b36_math,
    "b37_datetime": q_b37_datetime,
    "b38_conditional": q_b38_conditional,
    "b39_array": q_b39_array,
    "b40_struct_map": q_b40_struct_map,
    "b41_json": q_b41_json,
}

ORACLES = {
    "b01_parquet_scan": (
        "SELECT count(*) AS n_rows, min(l_orderkey) AS min_orderkey, "
        "max(l_orderkey) AS max_orderkey FROM lineitem"
    ),
    "b02_view_scan": (
        "SELECT n_regionkey AS regionkey, COUNT(*) AS n_nations "
        "FROM nation GROUP BY n_regionkey"
    ),
    "b03_information_schema": (
        "SELECT table_name, column_name, "
        "CAST(ordinal_position AS BIGINT) AS ordinal_position, "
        "CASE data_type WHEN 'BIGINT' THEN 'bigint' "
        "WHEN 'INTEGER' THEN 'int' WHEN 'VARCHAR' THEN 'string' "
        "WHEN 'DOUBLE' THEN 'double' WHEN 'DATE' THEN 'date' "
        "ELSE lower(data_type) END AS data_type "
        "FROM information_schema.columns "
        "WHERE table_name IN ('customer', 'nation', 'region')"
    ),
    "b04_parquet_sink": (
        "SELECT count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty "
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-06-01'"
    ),
    "b05_projection": (
        "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS linenumber, "
        "round(l_extendedprice * (1 - l_discount), 4) AS disc_price, "
        "l_quantity + 100 AS qty_plus FROM lineitem WHERE l_orderkey <= 1000"
    ),
    "b06_filter": (
        "SELECT count(*) AS n_rows, "
        "CAST(SUM(CAST(round((l_extendedprice * l_discount)*1000000) AS BIGINT)) AS DOUBLE)/1000000.0 "
        "AS revenue FROM lineitem "
        "WHERE l_returnflag = 'R' AND l_discount >= 0.05 AND l_discount <= 0.07 "
        "AND l_quantity < 24"
    ),
    "b07_cast": (
        "SELECT l_orderkey, CAST(l_linenumber AS VARCHAR) AS linenumber_str, "
        "CAST(l_shipdate AS DATE) AS ship_date, "
        "CAST(floor(l_quantity) AS BIGINT) AS qty_int, "
        "CAST(l_tax AS VARCHAR) AS tax_str FROM lineitem WHERE l_orderkey <= 300"
    ),
    "b08_literals": (
        "SELECT 'AB' AS province, CAST(42 AS BIGINT) AS answer, "
        "CAST(2.5 AS DOUBLE) AS ratio, true AS flag, DATE '2023-01-15' AS d, "
        "r_regionkey FROM region"
    ),
    "b09_case_predicates": (
        "SELECT CASE WHEN o_totalprice > 250000 THEN 'big' "
        "WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket, "
        "count(*) AS n, round(sum(o_totalprice), 2) AS total FROM orders "
        "WHERE o_orderstatus IN ('O', 'F') "
        "AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1997-12-31' "
        "AND o_orderpriority LIKE '%URGENT%' AND o_custkey IS NOT NULL "
        "GROUP BY 1"
    ),
    "b10_join_inner": (
        "SELECT c_mktsegment, count(*) AS n_orders, "
        "round(sum(o_totalprice), 2) AS total FROM orders "
        "JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"
    ),
    "b11_join_left": (
        "SELECT n_orders, count(*) AS n_customers FROM ("
        "SELECT c_custkey, count(o_orderkey) AS n_orders FROM customer "
        "LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey"
        ") GROUP BY n_orders"
    ),
    "b11_join_full": (
        "SELECT count(*) AS n_rows, count(s_suppkey) AS n_suppliers, "
        "count(n_nationkey) AS n_nation_side FROM nation "
        "FULL JOIN supplier ON n_nationkey = s_nationkey"
    ),
    "b12_semi_anti": (
        "SELECT 'with_orders' AS kind, c_nationkey, count(*) AS n_cust "
        "FROM customer c WHERE EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) "
        "GROUP BY c_nationkey "
        "UNION ALL "
        "SELECT 'no_orders' AS kind, c_nationkey, count(*) AS n_cust "
        "FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) "
        "GROUP BY c_nationkey"
    ),
    "b13_cross_join": (
        "SELECT count(*) AS n_pairs, "
        "min(r_name || '-' || n_name) AS first_pair FROM region CROSS JOIN nation"
    ),
    "b14_theta_join": (
        "SELECT s_suppkey, count(*) AS n_richer_customers FROM customer "
        "JOIN supplier ON c_acctbal > s_acctbal GROUP BY s_suppkey"
    ),
    "b10_tpch_q5alike": (
        "SELECT n_name, "
        "CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount))*1000000) AS BIGINT)) AS DOUBLE)/1000000.0 "
        "AS revenue, count(*) AS n_items "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE c_nationkey = s_nationkey AND r_name IN ('AMERICA', 'ASIA') "
        "GROUP BY n_name"
    ),
    "b26_tpch_q3alike": (
        "SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate, "
        "o_orderpriority, "
        "CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount))*1000000) AS BIGINT)) AS DOUBLE)/1000000.0 "
        "AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < TIMESTAMP '1997-06-01' "
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"
    ),
    "b16_groupby_agg": (
        "SELECT l_returnflag, l_linestatus, "
        "round(sum(l_quantity), 2) AS sum_qty, "
        "round(sum(l_extendedprice), 2) AS sum_base_price, "
        "CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount))*1000000) AS BIGINT)) AS DOUBLE)/1000000.0 "
        "AS sum_disc_price, "
        "CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount) * (1 + l_tax))*1000000) AS BIGINT)) AS DOUBLE)/1000000.0 "
        "AS sum_charge, "
        "round(avg(l_quantity), 4) AS avg_qty, "
        "round(avg(l_extendedprice), 4) AS avg_price, "
        "round(avg(l_discount), 4) AS avg_disc, "
        "count(*) AS count_order FROM lineitem "
        "WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus "
        "ORDER BY l_returnflag, l_linestatus"
    ),
    "b17_count_distinct": (
        "SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, "
        "count(DISTINCT l_suppkey) AS n_supps, "
        "count(DISTINCT l_orderkey) AS n_orders FROM lineitem GROUP BY l_returnflag"
    ),
    # b18_approx_agg: raw approx sketches are engine-specific — rows-only.
    # b18_approx_bounds: the invariant projection — exact distincts
    # hash-checked, accuracy flags pinned against literal 1.
    "b18_approx_bounds": (
        "SELECT l_returnflag, "
        "CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts_exact, "
        "CAST(1 AS BIGINT) AS hll_within_5pct, "
        "CAST(1 AS BIGINT) AS apx_median_in_p40_p60 "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "b19_stats_agg": (
        "SELECT l_returnflag, round(stddev_samp(l_quantity), 4) AS sd_qty, "
        "round(var_samp(l_quantity), 4) AS var_qty, "
        "round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price, "
        "round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "b19_percentile": (
        "SELECT l_returnflag, "
        "round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price, "
        "round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price, "
        "round(quantile_cont(l_quantity, 0.25), 4) AS p25_qty "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "b20_rollup": (
        "SELECT l_returnflag, l_linestatus, count(*) AS n, "
        "round(sum(l_quantity), 2) AS sum_qty, "
        "CAST(grouping(l_returnflag) AS BIGINT) AS g_rf, "
        "CAST(grouping(l_linestatus) AS BIGINT) AS g_ls "
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
    ),
    "b20_grouping_sets": (
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
        "CAST(grouping(l_returnflag) AS BIGINT) AS g_rf "
        "FROM lineitem GROUP BY GROUPING SETS "
        "((l_returnflag), (l_returnflag, l_linestatus), ())"
    ),
    "b23_topk_per_group": (
        "SELECT * FROM (SELECT l_suppkey, l_orderkey, "
        "CAST(l_linenumber AS BIGINT) AS linenumber, l_extendedprice, "
        "CAST(row_number() OVER (PARTITION BY l_suppkey "
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS BIGINT) "
        "AS rn FROM lineitem) WHERE rn <= 2"
    ),
    "b10_join_shuffle": (
        "SELECT c_nationkey, count(*) AS n_orders, "
        "round(max(o_totalprice), 2) AS max_price FROM orders "
        "JOIN customer ON o_custkey = c_custkey GROUP BY c_nationkey"
    ),
    "b39_explode": (
        "SELECT p_partkey, count(*) AS n, CAST(sum(i) AS BIGINT) AS s FROM ("
        "SELECT p_partkey, unnest(generate_series(1, p_size)) AS i "
        "FROM part WHERE p_partkey <= 50) GROUP BY p_partkey"
    ),
    "b21_collect_agg": (
        "SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations, "
        "bool_and(n_nationkey >= 0) AS all_nonneg, "
        "bool_or(n_nationkey > 20) AS any_gt20 FROM nation "
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
    ),
    "b22_distinct": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "b23_ranking": (
        "SELECT * FROM (SELECT o_orderpriority, o_orderkey, o_totalprice, "
        "CAST(row_number() OVER w AS BIGINT) AS rn, "
        "CAST(rank() OVER w AS BIGINT) AS rk, "
        "CAST(dense_rank() OVER w AS BIGINT) AS drk, "
        "CAST(ntile(4) OVER w AS BIGINT) AS quartile, "
        "round(percent_rank() OVER w, 6) AS pct_rank, "
        "round(cume_dist() OVER w, 6) AS cume FROM orders "
        "WINDOW w AS (PARTITION BY o_orderpriority "
        "ORDER BY o_totalprice DESC, o_orderkey)) WHERE rn <= 5"
    ),
    "b24_analytic": (
        "SELECT user_id, event_id, value, "
        "lag(value) OVER w AS prev_value, "
        "lead(value) OVER w AS next_value, "
        "first_value(value) OVER w AS first_value, "
        "last_value(value) OVER w AS last_value, "
        "nth_value(value, 2) OVER w AS second_value FROM events "
        "WHERE user_id < 40 "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
    ),
    "b25_window_frames": (
        "SELECT user_id, event_id, "
        "round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum, "
        "round(avg(value) OVER (PARTITION BY user_id ORDER BY event_id "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3, "
        "round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id "
        "RANGE BETWEEN 100 PRECEDING AND CURRENT ROW), 4) AS range_sum "
        "FROM events WHERE user_id < 40"
    ),
    "b26_orderby": (
        "SELECT o_orderkey, o_totalprice, "
        "nullif(o_orderpriority, '1-URGENT') AS prio_or_null FROM orders "
        "ORDER BY prio_or_null ASC NULLS FIRST, o_totalprice DESC, o_orderkey "
        "LIMIT 10"
    ),
    "b27_limit_offset": (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_orderkey LIMIT 7 OFFSET 11"
    ),
    "b28_union_all": (
        "SELECT src, count(*) AS n, min(id) AS min_id, max(id) AS max_id FROM ("
        "SELECT 'NK' AS src, CAST(n_nationkey AS BIGINT) AS id FROM nation "
        "UNION ALL "
        "SELECT 'CK' AS src, CAST(c_custkey AS BIGINT) AS id FROM customer"
        ") GROUP BY src"
    ),
    "b29_setops": (
        "WITH c AS (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS k FROM customer), "
        "s AS (SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS k FROM supplier) "
        "SELECT 'both' AS tag, k FROM (SELECT k FROM c INTERSECT SELECT k FROM s) "
        "UNION ALL "
        "SELECT 'cust_only' AS tag, k FROM (SELECT k FROM c EXCEPT SELECT k FROM s) "
        "UNION ALL "
        "SELECT 'any' AS tag, k FROM (SELECT k FROM c UNION SELECT k FROM s)"
    ),
    "b30_subqueries": _B30_SQL,
    "b31_string_core": (
        "SELECT p_partkey, p_brand || '-' || p_type AS brand_type, "
        "CAST(length(p_name) AS BIGINT) AS name_len, lower(p_name) AS lname, "
        "upper(p_brand) AS ubrand, replace(p_type, ' ', '_') AS type_us, "
        "split_part(p_type, ' ', 1) AS type_head, "
        "CAST(strpos(p_name, 'a') AS BIGINT) AS a_pos, "
        "substring(p_name, 1, 5) AS name5, translate(p_brand, '#', '_') AS tbrand, "
        "to_hex(p_partkey) AS key_hex, "
        "starts_with(p_type, 'STANDARD') AS is_standard FROM part"
    ),
    "b32_unicode_string": (
        "SELECT p_partkey, CAST(length(p_name) AS BIGINT) AS clen, "
        "left(p_name, 3) AS l3, right(p_name, 3) AS r3, "
        "lpad(p_brand, 12, '*') AS lpadded, rpad(p_brand, 12, '*') AS rpadded, "
        "reverse(p_brand) AS rev, "
        "upper(substring(p_brand, 1, 1)) || lower(substring(p_brand, 2)) AS icap "
        "FROM part"
    ),
    "b33_regex": (
        "SELECT doc_id, regexp_extract(text, '([a-z]+)', 1) AS first_word, "
        "regexp_matches(text, 'join') AS has_join, "
        "regexp_replace(substring(text, 1, 40), '[aeiou]', '*', 'g') AS devoweled40, "
        "CAST(len(regexp_extract_all(text, 'the')) AS BIGINT) AS n_the "
        "FROM documents"
    ),
    "b34_crypto": (
        "SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex "
        "FROM documents"
    ),
    "b35_encoding": (
        "SELECT p_partkey, base64(encode(p_brand)) AS b64, "
        "decode(from_base64(base64(encode(p_brand)))) AS b64_roundtrip, "
        "lower(hex(p_brand)) AS hex_str FROM part"
    ),
    "b36_math": (
        "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln, "
        "round(abs(-l_extendedprice), 2) AS abs_price, "
        "CAST(ceil(l_discount) AS BIGINT) AS ceil_disc, "
        "CAST(floor(l_tax) AS BIGINT) AS floor_tax, "
        "round(sqrt(l_quantity), 6) AS sqrt_qty, "
        "round(exp(l_discount), 6) AS exp_disc, "
        "round(ln(l_extendedprice), 6) AS ln_price, "
        "round(log10(l_extendedprice), 6) AS log10_price, "
        "round(log2(l_quantity), 6) AS log2_qty, "
        "round(pow(l_quantity, 2.0), 2) AS qty_sq, "
        "round(sin(l_quantity), 6) AS sin_qty "
        "FROM lineitem WHERE l_orderkey <= 200"
    ),
    "b37_datetime": (
        "SELECT o_orderkey, "
        "CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start, "
        "CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr, "
        "CAST(extract(month FROM o_orderdate) AS BIGINT) AS mo, "
        "CAST(extract(day FROM o_orderdate) AS BIGINT) AS dom, "
        "CAST(o_orderdate AS DATE) AS odate, "
        "strftime(o_orderdate, '%Y-%m') AS ym, "
        "CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date, "
        "CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') "
        "AS BIGINT) AS days_to_end, "
        "CAST(make_timestamp(CAST(floor(epoch_ms(o_orderdate) / 604800000) "
        "AS BIGINT) * 604800000 * 1000) AS DATE) AS week_bin "
        "FROM orders WHERE o_orderkey <= 500"
    ),
    "b38_conditional": (
        "SELECT o_orderkey, "
        "coalesce(nullif(o_orderstatus, 'O'), 'open') AS status2, "
        "CASE WHEN nullif(o_orderpriority, '5-LOW') IS NOT NULL "
        "THEN 'prioritized' ELSE 'low' END AS prio_class, "
        "ifnull(nullif(o_orderstatus, 'F'), 'notF') AS not_f, "
        "nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F' AS ns_eq_f "
        "FROM orders WHERE o_orderkey <= 500"
    ),
    "b39_array": (
        "SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim, "
        "CAST(embedding[1] AS DOUBLE) AS e1, "
        "CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS emax, "
        "list_contains([1, 2, 3], label) AS label_in_123, "
        "CAST((label + 2) * (label + 3) / 2 AS BIGINT) AS series_sum "
        "FROM embeddings WHERE vec_id < 100"
    ),
    "b40_struct_map": (
        "SELECT o_orderkey, "
        "struct_pack(s := o_orderstatus, p := o_totalprice).s AS status_from_struct, "
        "round(struct_pack(s := o_orderstatus, p := o_totalprice).p, 2) "
        "AS price_from_struct, "
        "round(map(['price'], [o_totalprice])['price'][1], 2) AS price_from_map "
        "FROM orders WHERE o_orderkey <= 300"
    ),
    "b41_json": (
        "SELECT event_id, json_extract_string(props, '$.k') AS k_str, "
        "CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int, "
        "CAST(json_extract_string('{\"foo\": 123}', '$.foo') AS BIGINT) AS const_foo "
        "FROM events WHERE event_id < 300"
    ),
}
