"""Query inventory: one deterministic query per SURVEY.md §2 operator row.

Each entry is a callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) a DuckDB-equivalent oracle SQL string. Keys are the
stable SURVEY §2 ids (``a4…``, ``b16…``, plus ``x…`` for the
beyond-parity training-data operators).

Determinism rules applied throughout (driver hash-matches values):
- every computed column is aliased identically on both sides;
- double aggregates are rounded (2dp for money sums, 4dp for ratios) so
  summation-order float noise cannot flip the hash;
- integer-typed outputs are cast to BIGINT on both sides (Spark's
  ``length``/``size``/``year`` return int32 where DuckDB returns int64);
- window functions order by a unique key so ranks never tie.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kamu_engine_datafusion_spark.queries import layer_a, layer_b, pipeline
from kamu_engine_datafusion_spark.queries.layer_b import q_b16_groupby_agg

__all__ = ["registry", "oracles", "q_b16_groupby_agg"]

# Registration order is verification-priority order: the driver's
# CORRECTNESS gate checks registry entries front-to-back, so the keys
# with no driver-verified row yet (round-1 window ended at
# ``b37_datetime``) register first — the full x* LLM-pipeline surface
# plus b38..b41 — followed by the queries whose implementation changed
# this round (they need re-verification), then the stable remainder.
_PRIORITY = [
    # -- no driver CORRECTNESS row yet (round 1 cut off at 50 entries) --
    "b41_json",
    "b38_conditional",
    "b39_array",
    "b40_struct_map",
    "xdedup_exact",
    "xdedup_minhash",
    "xdedup_minhash_sql",
    "xdedup_simhash",
    "xdedup_simhash_sql",
    "xdedup_ngram_jaccard",
    "xdedup_cluster",
    "xdedup_paragraph",
    "xdedup_embcos",
    "xdedup_incremental",
    "xsim_topk_brute",
    "xsim_srp_lsh",
    "xsim_ivf",
    "xtext_langid",
    "xtext_quality",
    "xtext_tokens",
    "xtext_fingerprint",
    "xtext_repetition",
    "xtext_redact_pii",
    "xtext_gopher",
    "xtext_c4_filter",
    "xdecontaminate",
    "xsample",
    "xsnapshot",
    "xrollup_time",
    "xrange_join",
    "xsalted_agg",
    "xprofile",
    "xskyline",
    "xsessionize",
    "xpivot",
    "xasof_join",
    "xmm_decode",
    "xmm_features",
    "xmm_frames",
    # -- re-verify: code paths touched in round 2 --
    "a13_offsets_distributed",  # offset-base broadcast-join rework
    "a14_system_columns",  # integer-ms system_time fix
    "b03_information_schema",  # broadened catalog introspection
    "b04_parquet_sink",  # writer-version pin in the single-file sink
    "b06_filter",  # dsum integer-microunit reformulation
    # -- re-verify: headline bench queries --
    "b16_groupby_agg",
    "b10_tpch_q5alike",
    "b26_tpch_q3alike",
    "b17_count_distinct",
    "b23_ranking",
    "b30_subqueries",
    "b33_regex",
    "b34_crypto",
    # -- re-verify: remaining Layer-A + core I/O --
    "a03_empty_input",
    "a04_offset_slice",
    "a06_multi_step",
    "a08_normalize_ts",
    "b01_parquet_scan",
    "b04_parquet_sink",
    "b24_analytic",
    "b37_datetime",
    "b39_explode",
]


def registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (layer_a, layer_b, pipeline):
        merged.update(mod.QUERIES)
    out = {k: merged[k] for k in _PRIORITY if k in merged}
    out.update({k: v for k, v in merged.items() if k not in out})
    return out


def oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in (layer_a, layer_b, pipeline):
        out.update(mod.ORACLES)
    return out
