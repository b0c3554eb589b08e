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
# Round-6 rotation (per VERDICT r05 next-round #3, taken to its
# fixpoint): after r05, ALL 33 demoted queries held driver rows from
# r04 only — two rounds stale by r06. This round promotes every one of
# them back into the window and demotes 34 queries that earned green
# r05 rows. The window keepers are 14 of the 15 queries NEW in r05
# (r13b, r16, q26b, q29, q31-q36, t8, t9, q37, q38 — each holds
# exactly one green row, so they stay for a second confirmation
# against any round-6 code motion; q30 yields its slot to the new
# d2_jaccard_scoring, see below) plus the two flagships r3 (the
# entry() query) and r4 (the reference's core sliding-window shape).
# Window = 33 promoted + 16 keepers + d2 = 50 of the 84 oracle-backed
# queries (83 + d2). Net effect: after r06 every oracle-backed query
# holds a green driver row from r05 or r06 — maximum achievable
# freshness with 84 oracles and 50 slots. Every demoted query remains fully registered and
# oracle-checked locally each session (tests/test_oracle_queries.py).
_DEMOTED = [
    # Long-stable R-series ops, all green r01-r05 (per-line notes name
    # the in-window coverage that remains for each category).
    "r1_project_filter",     # project+filter exercised by nearly every window query
    "r2_keyed_agg",          # keyed agg covered by q01-twin shapes q24/x10 in-window
    "r5_percentile_cont",    # percentile pair: both green 5 rounds running
    "r6_percentile_rank",    # nearest-rank twin of r5, same oracle family
    "r7_rolling_zscore",     # rolling stats: promoted r8 re-verifies; S4 streaming parity
    "r8b_rolling_mad",       # rolling median/MAD, green r04+r05; promoted r8 re-verifies
    "r9_alerts_scan",        # filtered scan, green r01-r05
    "r10_conditional_agg",   # conditional agg covered by x10 funnel in-window
    "r12_relative_time",     # relative-time views, green r01-r05
    "r13_json_extract",      # JSON path covered by kept r13b (VARIANT twin, same oracle)
    "r14_severity_case",     # CASE classification, green r01-r05
    "r15_cooldown_dedup",    # cooldown dedup, green r05; streaming twin S5/S11 tested
    # Relational categories with multiple green rows; each category
    # keeps in-window coverage via the promoted set or the keepers.
    "q01_pricing_summary",   # agg summary covered by promoted q24/x10 + kept q37
    "q03_multiway_join",     # joins covered by promoted q02/q04-q08 this round
    "q07_theta_self_join",   # theta join, green r04+r05
    "q09_ranking_window",    # ranking covered by kept q31 lateral top-k + promoted q10/q11
    "q09b_analytic_funcs",   # analytic windows covered by kept q32/q33
    "q12_union_all",         # set ops: promoted q12_union re-verifies the category
    "q12_intersect",
    "q12_except",
    "q12_intersect_all",
    "q12_except_all",
    "q14b_cube",             # grouping family: promoted q14_rollup re-verifies
    "q14c_grouping_sets",
    "q15_correlated_subquery",  # green r04+r05
    "q16_string_funcs",      # scalar trio green r04+r05
    "q17_in_between",
    "q18_having",
    "q19_null_handling",
    "q20b_date_diff_buckets",  # date arithmetic: promoted q20_date_shift re-verifies
    "q21_array_explode",     # arrays green r04+r05; promoted q25b top-tokens re-exercises explode
    "q22_asof_prior_click",  # as-of join green r04+r05
    "q28_unpivot",           # promoted q27_pivot re-verifies the pivot family
    # Yields its slot to d2_jaccard_scoring (new this round — the
    # planted all-pairs mini-oracle for x2b's scoring math, VERDICT r05
    # #7): pure-SQL recursion untouched by round-6 changes, green r05.
    "q30_recursive_hierarchy",
    # Yields its slot to q26c_stratified_sample (new this round —
    # exact-k per-stratum deterministic sampling): the sampling
    # category stays driver-covered by q26c's fresh row; q26b holds
    # green r05.
    "q26b_hash_sample",
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
