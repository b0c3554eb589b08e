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
# Round-10 rotation (the standing alternation, per VERDICT r09 #1/#2):
# the 50 queries that earned green r09 rows yield their slots; the 49
# queries demoted in r09 — each holding a green r08 row that would
# otherwise go two rounds stale — are all promoted back. The 50th slot
# goes to this round's ONE new oracle-backed query,
# x19b_bigram_surprisal_capped (promoted from rows-only per VERDICT
# r09 #2; its V=8 DuckDB differential has run locally every session
# since r09).
#
# CAPACITY CEILING (decided r10, per VERDICT r09 #2): with 50 driver
# slots and the two-round freshness invariant (every oracle key in the
# current window OR green in the union of the TWO latest CORRECTNESS
# files), the registry supports AT MOST 2 × 50 = 100 oracle-backed
# queries. x19b is deliberately the 100th and LAST under this
# encoding; d3b and later candidates stay rows-only with full local
# DuckDB differentials (the tests/test_functions.py pattern). A future
# promotion must first either (a) widen the freshness window to three
# rounds, or (b) retire a redundant oracle — the six q12 set-op
# variants share one SQL template and are the natural consolidation
# candidates. This is a conscious trade recorded here so the
# rotation-freshness test failing on oracle #101 is never a surprise.
#
# Net effect: after r10 every oracle-backed query holds a green driver
# row from r09 or r10 — maximum achievable freshness at the ceiling.
# Machine-asserted by tests/test_coverage_counts.py::
# test_rotation_freshness. Every demoted query remains fully
# registered and oracle-checked locally each session
# (tests/test_oracle_queries.py).
_DEMOTED = [
    # Reference r-series ops green r09; the returning r3/r4/r8/r11
    # siblings hold the family (entry() smoke-runs r3 every driver
    # pass regardless of the window).
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
    "r13b_variant_json",
    "r14_severity_case",
    "r15_cooldown_dedup",
    "r16_alertmanager_ingest",
    # Flagship pricing summary + join flavors green r09; returning
    # q02-q08 re-verify the join family.
    "q01_pricing_summary",
    "q07_theta_self_join",
    "q22_asof_prior_click",
    "q31_lateral_topk",
    # Windows/ranking green r09; returning q10/q33/q41 re-verify.
    "q09_ranking_window",
    "q09b_analytic_funcs",
    # Set ops / grouping green r09; returning q12_union/q13/q14/q27
    # re-verify those families.
    "q12_union_all",
    "q12_intersect",
    "q12_except",
    "q12_intersect_all",
    "q12_except_all",
    "q14b_cube",
    "q14c_grouping_sets",
    # Scalar/subquery/date/array green r09; returning q20/q32/q37/
    # q39/q40 relatives re-verify.
    "q15_correlated_subquery",
    "q16_string_funcs",
    "q17_in_between",
    "q18_having",
    "q19_null_handling",
    "q20b_date_diff_buckets",
    "q21_array_explode",
    # Sessionization/gapfill/recursive/funnel/SCD2/cohort/DQ green r09.
    "q23_sessionization",
    "q28_unpivot",
    "q29_gapfill_series",
    "q30_recursive_hierarchy",
    "q34_funnel",
    "q35_scd2",
    "q36_cohort_retention",
    "q38_quality_checks",
    # Sampling green r09; returning x23 re-verifies the family.
    "q26b_hash_sample",
    "q26c_stratified_sample",
    # Dedup/documents green r09; returning d1/d3/d4/q24/t7/t8 hold
    # the family.
    "d2_jaccard_scoring",
    "x24_cross_source_contamination",
    # Text/quality/pipeline green r09; returning t1-t3/t6/t9/q25 and
    # the x16-x19 retrieval family re-verify — plus NEW x19b enters.
    "t5_pii_scrub",
    "t6b_gopher_rules",
    "x10_curation_funnel",
    "x25_dsir_resample",
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
