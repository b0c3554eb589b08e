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
# Round-8 rotation (per VERDICT r07 next-round #5, the standing
# alternation): the 36 queries demoted in r07 are all promoted back —
# each holds a green r06 row that would otherwise go two rounds stale —
# and 36 queries that earned green r07 rows yield their slots. Kept
# in-window from the r07 set (14):
#   - r3 (the entry() flagship) and r4 (the reference's core
#     sliding-window shape): standing flagships, never rotate;
#   - q39_group_share: its zero-total division guard landed this round
#     (ADVICE r07) — the plan change must re-verify against the oracle
#     in the same round it lands;
#   - q03_multiway_join: its sibling q03b_filtered_multiway is NEW
#     this round (VERDICT r07 #7, the runtime-bloom-filter carrier) —
#     new queries hold zero green rows and always enter the window;
#     q03 stays alongside it so the unfiltered twin re-verifies in the
#     same round. q26c_stratified_sample (green r06+r07) yields its
#     keeper slot to q03b;
#   - r13b, r15, q09b, q12_intersect_all, q15, q21, q22, q30, d2:
#     one keeper per family whose siblings all rotate out together
#     (VARIANT parsing, cooldown dedup, analytic funcs, bag-semantics
#     set ops, correlated subqueries, arrays, as-of join, recursive
#     CTE, Jaccard scoring) so no family leaves the window entirely.
# Window = 36 promoted + 13 kept + q03b = 50 of the 87 oracle-backed
# queries.
# Net effect: after r08 every oracle-backed query holds a green driver
# row from r07 or r08 — maximum achievable freshness with 87 oracles
# and 50 slots. The invariant is machine-asserted by
# tests/test_coverage_counts.py::test_rotation_freshness (every oracle
# key is either in the first-50 window or green in the latest
# CORRECTNESS file). Every demoted query remains fully registered and
# oracle-checked locally each session (tests/test_oracle_queries.py).
_DEMOTED = [
    # R-series ops that earned green r07 rows; promoted r8/r11 plus
    # kept r13b/r15 hold the serving/rolling families in-window.
    "r1_project_filter",
    "r2_keyed_agg",
    "r5_percentile_cont",
    "r6_percentile_rank",
    "r7_rolling_zscore",
    "r8b_rolling_mad",
    "r9_alerts_scan",
    "r10_conditional_agg",
    "r12_relative_time",
    "r13_json_extract",
    "r14_severity_case",
    "r16_alertmanager_ingest",
    "q01_pricing_summary",
    # Join flavors green r07; returning q02/q04-q06/q08 + kept q03/q22
    # keep the join family in-window.
    "q07_theta_self_join",
    "q09_ranking_window",    # ranking: returning q10/q11 re-verify; q09b kept
    # Set ops green r07; returning q12_union + kept q12_intersect_all
    # re-verify the family.
    "q12_union_all",
    "q12_intersect",
    "q12_except",
    "q12_except_all",
    "q14b_cube",             # grouping family: returning q14_rollup re-verifies
    "q14c_grouping_sets",
    "q16_string_funcs",      # scalar families green r07; kept q15/q21 hold
    "q17_in_between",        # the subquery/array ends of the battery
    "q18_having",
    "q19_null_handling",
    "q20b_date_diff_buckets",  # returning q20_date_shift re-verifies dates
    "q23_sessionization",    # green r06+r07
    "q26b_hash_sample",      # sampling: both green r07; rows-only q26
    "q26c_stratified_sample",  # stays locally oracle-checked each session
    "q28_unpivot",           # returning q27_pivot re-verifies pivot/unpivot
    "q29_gapfill_series",    # green r06+r07
    "q31_lateral_topk",      # green r06+r07
    "q34_funnel",            # green r06+r07
    "q35_scd2",              # green r06+r07
    "q36_cohort_retention",  # green r06+r07
    "q38_quality_checks",    # broadcast-FK plan re-verified r07
    "x10_curation_funnel",   # green r06+r07; promoted x5-x9 re-verify the family
    # Keeper slot yielded mid-r08 to q40_merge_upsert (NEW — the
    # low-shuffle MERGE/upsert; new queries always enter the window):
    # q22 holds a green r07 row so freshness is preserved.
    "q22_asof_prior_click",
    # Keeper slot yielded mid-r08 to d3_substring_dup_spans (NEW —
    # exact substring-duplication coverage): d2 holds a green r07 row,
    # and d3 now represents the documents-dedup family in-window.
    "d2_jaccard_scoring",
    # Keeper slots yielded mid-r08 to x16_bm25_topk and
    # x17_unigram_surprisal (NEW — retrieval + LM-score family): both
    # yielding queries hold green r07 rows, and their families stay
    # swept by the fuzz corpus (set ops) / remain locally
    # oracle-checked every session (recursive CTE).
    "q12_intersect_all",
    "q30_recursive_hierarchy",
    # Keeper slot yielded mid-r08 to x18_chunk_overlap (NEW — the
    # overlapping token-window chunker; new queries always enter the
    # window): q21 holds a green r07 row, and x18 itself exercises the
    # same sequence/explode/slice array surface in-window.
    "q21_array_explode",
    # Keeper slot yielded mid-r08 to x19_bigram_surprisal (NEW — the
    # context-sensitive LM filter): q15 holds a green r07 row and the
    # correlated-subquery family stays swept by the 24-case subquery
    # fuzz corpus.
    "q15_correlated_subquery",
    # Keeper slot yielded mid-r08 to q41_stat_aggregates (NEW — the
    # corr/covar/regr/skew/kurt statistical family): q09b holds a green
    # r07 row and the analytic-function family is now swept by the
    # 26-case window-frame fuzz corpus.
    "q09b_analytic_funcs",
    # Keeper slot yielded mid-r08 to d4_canonical_representative (NEW —
    # quality-ranked keeper selection over normalized-form dedup
    # groups): r13b holds a green r07 row and the JSON family's r13
    # twin is also green r07.
    "r13b_variant_json",
    # Keeper slot yielded mid-r08 to x23_weighted_priority_sample (NEW
    # — sequential-Poisson weighted sampling): r15 holds a green r07
    # row and the cooldown family's stateful twin stays pinned by
    # S5/S5b parity every session.
    "r15_cooldown_dedup",
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
