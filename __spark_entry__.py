"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Importing the engine package populates its query registry as a side
effect; we expose copies of the registry dicts so the driver owns its
iteration order.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import real_time_event_streaming_analytics_platform_spark as engine
from real_time_event_streaming_analytics_platform_spark.session import ensure_utc


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (R3 /series minute aggregation) on sf0.001.

    The driver passes its own SparkSession, so force the session confs
    the catalog depends on (UTC timezone, parquet nanosAsLong) before
    reading.
    """
    ensure_utc(spark)
    return engine.QUERIES["r3_series_minute"](spark, "/root/testdata/sf0.001")


# The driver records correctness rows for the FIRST 50 queries() entries
# only; more queries have oracles than slots, so some must yield.
#
# Round-13 rotation (the standing alternation) per VERDICT r12 #1/#3/#4:
#
# - The 50 r12 greens (CORRECTNESS_r12.json keys, 50/50 green) yield
#   their slots and enter _DEMOTED below.
# - q14b_cube + q14c_grouping_sets RETIRE their individual oracles into
#   the consolidated q14d_grouping_battery (the q12_set_ops pattern —
#   both variants as op-tagged slices of one oracle row; the variants
#   stay registered rows-only with a slice-equivalence test). Frees 2
#   ceiling slots.
# - x17b_surprisal_quartile_approx is PROMOTED into a freed slot: its
#   GK cut points equal DuckDB quantile_disc exactly at driver SFs
#   (eps*N < 1 — the sketch holds every sample), verified at
#   sf0.001/0.01/0.1 (functions/retrieval.py docstring).
#
# Oracle census: 100 (r12) − 2 (q14b/q14c retired) + 1 (q14d)
# + 1 (x17b) = 100 oracle-backed queries — exactly the 2 × 50
# two-round-freshness ceiling, zero spare. Any new oracle-backed op
# must either wait for a consolidation or replace a retiring oracle;
# new r13 ops register rows-only with a local differential (the
# d3b/t4b pattern).
#
# Window: priority = 100 − 50 demoted = 50 — the 48 r11 greens
# returning from last round's _DEMOTED (50 minus the retired
# q14b/q14c) plus the newly promoted q14d and x17b — exactly filling
# the 50 driver slots.
#
# Net effect: after r13 every oracle-backed query holds a green driver
# row from r12 or r13. Machine-asserted by tests/test_coverage_counts.py::
# test_rotation_freshness. Every demoted query remains fully
# registered and oracle-checked locally each session
# (tests/test_oracle_queries.py).
_DEMOTED = [
    # Reference r-series ops green r12; the returning r-series
    # siblings re-verify the family (entry() smoke-runs r3 every
    # driver pass regardless of the window).
    "r3_series_minute",
    "r4_sliding_window",
    "r8_rolling_median",
    "r11_kpi_latest_per_key",
    # Join/scan family green r12; returning q01/q07/q22/q31 re-verify.
    "q02_join_segment",
    "q03_multiway_join",
    "q03b_filtered_multiway",
    "q04_orders_histogram",
    "q05_semi_join",
    "q06_anti_join",
    "q08_broadcast_join",
    # Windows/ranking green r12; returning q09/q09b re-verify.
    "q10_analytic_window",
    "q11_topk",
    "q33_time_range_window",
    # Grouping / distinct / pivot green r12; returning q12/q28 and the
    # NEW consolidated q14d re-verify the family.
    "q13_count_distinct",
    "q14_rollup",
    "q27_pivot",
    # Scalar/date/profile battery green r12; returning q15-q21/q23/
    # q29/q30/q34-q36/q38 relatives re-verify.
    "q20_date_shift",
    "q32_ewma_trend",
    "q37_profile",
    "q39_group_share",
    "q40_merge_upsert",
    "q41_stat_aggregates",
    # Sampling green r12; returning q26b/q26c re-verify.
    "x23_weighted_priority_sample",
    # Dedup/documents green r12; returning d2/d3b/x24 hold the family.
    "q24_dedup_exact",
    "d1_dedup_docs_exact",
    "d3_substring_dup_spans",
    "d4_canonical_representative",
    "t7_chunk_dedup",
    "t8_fuzzy_dedup",
    # Similarity green r12.
    "x3_cosine_topk",
    # Text/quality green r12; returning t5/t6b re-verify; the NEW
    # x17b joins the window alongside its demoted exact sibling x17.
    "q25_text_stats",
    "q25b_top_tokens",
    "t1_lang_id",
    "t2_quality_score",
    "t3_token_counts",
    "t4b_fingerprint_winnow",
    "t6_repetition",
    "t9_bm25_search",
    "x16_bm25_topk",
    "x17_unigram_surprisal",
    "x19_bigram_surprisal",
    "x19b_bigram_surprisal_capped",
    # Multimodal/pipeline green r12; returning x10/x25/x28-x30
    # re-verify.
    "x4_multimodal_roundtrip",
    "x5_train_split",
    "x6_sequence_pack",
    "x7_embedding_quantize",
    "x8_decontaminate",
    "x9_source_mixing",
    "x18_chunk_overlap",
]



def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame; every
    computed column is aliased identically in the Spark plan and the
    oracle SQL. Builders call ``ensure_utc`` via ``catalog.load``.

    Ordering: oracle-backed queries first (registration order, minus the
    explicitly demoted variants), then the demoted oracle-backed
    variants, then rows-only queries — so the driver's 50-row
    correctness window lands on 50 distinct oracle-checkable operators.
    """
    keys = list(engine.QUERIES)
    priority = [k for k in keys if k in engine.ORACLE and k not in _DEMOTED]
    demoted = [k for k in keys if k in _DEMOTED]
    rows_only = [k for k in keys if k not in engine.ORACLE]
    ordered = priority + demoted + rows_only
    assert sorted(ordered) == sorted(keys)
    return {k: engine.QUERIES[k] for k in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query.

    Keys absent here but present in ``queries()`` are genuinely
    non-SQL-expressible ops (approx sketches, stateful streaming) —
    the driver records a weaker rows-only check for those.
    """
    return dict(engine.ORACLE)
