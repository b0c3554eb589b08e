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
# Round-7 rotation (per VERDICT r06 next-round #3, the standing
# alternation): the 35 queries demoted in r06 are all promoted back —
# each held a green r05 row that would otherwise go two rounds stale —
# and 35 queries that earned green r06 rows yield their slots. Keepers
# (13, besides the two standing flagships r3 — the entry() query — and
# r4 — the reference's core sliding-window shape):
#   - d2_jaccard_scoring and q26c_stratified_sample: NEW in r06, each
#     holds exactly one green row; kept for a second confirmation;
#   - q38_quality_checks: its FK-dimension join gains an explicit
#     broadcast this round (VERDICT r06 #5) — the plan change must
#     re-verify against the oracle in the same round it lands;
#   - r13b, r16, q23, q29, q31, q34, q35, q36, x10: one keeper per
#     family whose siblings all rotate out together (VARIANT parsing,
#     webhook ingest, sessionization, gap-fill, LATERAL, funnel, SCD2,
#     cohort, curation funnel) so no family leaves the window entirely;
#   - q39_group_share: NEW this round (the salted_window operator's
#     oracle-backed registry query) — new queries hold zero green rows
#     and always enter the window. t9_bm25_search yields its keeper
#     slot for it (t9 holds green r05+r06 rows).
# Window = 35 promoted + 2 flagships + 12 keepers + q39 = 50 of the 86
# oracle-backed queries. Net effect: after r07 every oracle-backed
# query holds a green driver row from r06 or r07 — maximum achievable
# freshness with 86 oracles and 50 slots. Every demoted query remains
# fully registered and oracle-checked locally each session
# (tests/test_oracle_queries.py).
_DEMOTED = [
    # R-series ops that earned green r06 rows; the returning r1/r2/
    # r5-r10/r12-r15 refresh the category's coverage this round.
    "r8_rolling_median",     # rolling stats: returning r7/r8b re-verify the family
    "r11_kpi_latest_per_key",  # latest-N serving shape, green r06 + S14 hot-store twin
    # Join flavors, all green r06; returning q03 (multiway) + q07
    # (theta) + q22 (as-of) keep the join family in-window.
    "q02_join_segment",
    "q04_orders_histogram",
    "q05_semi_join",
    "q06_anti_join",
    "q08_broadcast_join",
    "q10_analytic_window",   # ranking/analytic: returning q09/q09b re-verify
    "q11_topk",
    "q12_union",             # set ops: the five returning q12_* variants re-verify
    "q13_count_distinct",
    "q14_rollup",            # grouping family: returning q14b/q14c re-verify
    "q20_date_shift",        # date arithmetic: returning q20b re-verifies
    "q24_dedup_exact",       # exact dedup, green r06; kept d2 pins the dedup family
    "q25_text_stats",        # text battery green r06; t-family keeps breadth via kept t9
    "q25b_top_tokens",
    "q27_pivot",             # pivot family: returning q28_unpivot re-verifies
    "q32_ewma_trend",        # green r05+r06
    "q33_time_range_window", # green r05+r06
    "d1_dedup_docs_exact",   # exact-hash dedup, green r06; kept d2 pins scoring math
    "x3_cosine_topk",        # bitwise-exact fold oracle, green r06; recall tests local
    "t1_lang_id",            # text analysis, all green r06; kept t9 holds the family
    "t2_quality_score",
    "t3_token_counts",
    "t5_pii_scrub",
    "t6_repetition",
    "t7_chunk_dedup",
    "t8_fuzzy_dedup",
    "x4_multimodal_roundtrip",  # green r05+r06; x4b schema/batch tests local
    # Corpus-assembly family, all green r06; kept x10 funnel spans the
    # split/mix/decontaminate shapes end-to-end.
    "x5_train_split",
    "x6_sequence_pack",
    "x7_embedding_quantize",
    "x8_decontaminate",
    "x9_source_mixing",
    "q37_profile",           # profiling: green r05+r06; q37b approx twin error-tested local
    "t9_bm25_search",        # green r05+r06; yields its keeper slot to the new q39
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
