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
# Round-4 rotation (per VERDICT r03 next-round #2/#8): the five round-3
# LLM-pipeline operators (t6 repetition, t7 chunk dedup, x8
# decontamination, x9 source mixing, x10 curation funnel) had never held
# a driver CORRECTNESS row, so they are promoted into the window this
# round; five long-stable trivial R-series operators (r1, r5, r12, r13,
# r14 — green in r01+r02+r03) rotate out in their place. The r02-era
# demotions (set-op bag variants, cube/grouping-sets next to rollup,
# q09b next to q09, q20b next to q20, unpivot next to pivot, the scalar
# trio q16/q17/q19) all hold green r02 rows and stay demoted. Every
# demoted query remains fully registered and oracle-checked locally —
# tests/test_oracle_queries.py covers every oracle pair each session.
_DEMOTED = [
    # Round-5 rotation (per VERDICT r04 next-round #1): the 18 queries
    # demoted since r02/r03 (set-op bag variants, cube/grouping-sets,
    # q09b, q20b, unpivot, the scalar trio, and the five trivial
    # R-series ops) had driver rows 2-3 rounds stale while the codebase
    # changed around them, so ALL of them rotate back into the window
    # this round. In their place, 18 operators that just earned fresh
    # green r04 rows rotate out: the text-analysis series (t1-t7,
    # q25/q25b), the corpus-assembly series (x4-x10), and the exact-
    # dedup/cosine trio (q24, d1, x3). After r05, every oracle-backed
    # query holds a green driver row from r04 or r05.
    "t1_lang_id",
    "t2_quality_score",
    "t3_token_counts",
    "t5_pii_scrub",
    "t6_repetition",
    "t7_chunk_dedup",
    "q25_text_stats",
    "q25b_top_tokens",
    "x4_multimodal_roundtrip",
    "x5_train_split",
    "x6_sequence_pack",
    "x7_embedding_quantize",
    "x8_decontaminate",
    "x9_source_mixing",
    "x10_curation_funnel",
    "q24_dedup_exact",
    "d1_dedup_docs_exact",
    "x3_cosine_topk",
    # Round-5 additions: r16_alertmanager_ingest (closing VERDICT r04
    # "What's missing" #5) and q26b_hash_sample (upgrading the sampling
    # category from rows-only to oracle-backed) each take a window slot;
    # q23 and q27 (both green in r04) yield theirs, keeping priority at
    # exactly 50.
    "q23_sessionization",
    "q27_pivot",
    # Round-5 additions (batch 2): q29_gapfill_series, q30_recursive
    # _hierarchy, q31_lateral_topk, and q32_ewma_trend (gap-fill,
    # WITH RECURSIVE, LATERAL, and sequential-per-key smoothing — four
    # SQL/analytic categories the engine did not previously cover) each
    # take a window slot; four join variants green in r04 (q04/q05/q06/
    # q08 — the join category stays driver-covered by q02/q03/q07) yield
    # theirs, keeping priority at exactly 50.
    "q04_orders_histogram",
    "q05_semi_join",
    "q06_anti_join",
    "q08_broadcast_join",
    # Round-5 additions (batch 3): r13b_variant_json (Spark 4 VARIANT
    # twin of r13, oracle-identical by construction) takes the slot of
    # q11_topk (green r04; top-k stays driver-covered by q09 ranking and
    # q31's lateral per-key top-k).
    "q11_topk",
    # Round-5 additions (batch 4): q33_time_range_window (RANGE BETWEEN
    # INTERVAL frame — time-defined rolling windows, a distinct category
    # from the ROWS frames of r7/r8) takes the slot of q20_date_shift
    # (green r04; date arithmetic stays driver-covered by q20b, which is
    # re-verified in this round's window).
    "q20_date_shift",
    # Round-5 additions (batch 5): t8_fuzzy_dedup (edit-distance dedup
    # with prefix blocking — the entity-resolution comparator the
    # hash/MinHash family can't express) and t9_bm25_search (BM25 keyword
    # retrieval — the engine-native twin of the reference stack's unused
    # Elasticsearch) take the slots of r8_rolling_median and
    # q10_analytic_window (both green r04; the rolling-window category
    # stays driver-covered by r7/r8b, analytic windows by q09/q09b/q33).
    "r8_rolling_median",
    "q10_analytic_window",
    # Round-5 additions (batch 6): q34_funnel (strict-ordered conversion
    # funnel), q35_scd2 (type-2 slowly-changing-dimension build), and
    # q36_cohort_retention (weekly cohort retention matrix) — three
    # classic event-analytics categories the registry did not previously
    # cover — take the slots of q02_join_segment, q12_union, and
    # r11_kpi_latest_per_key (all green r04; joins stay driver-covered by
    # q03/q07, set ops by the four q12 bag/set variants in this window,
    # latest-per-key by the /kpi serving tests + r3).
    "q02_join_segment",
    "q12_union",
    "r11_kpi_latest_per_key",
    # Round-5 additions (batch 7): q37_profile (single-pass column
    # profiling unpivoted with stack) and q38_quality_checks (named
    # assertion battery — FK anti-joins, ranges, uniqueness) — the
    # data-quality layer a curation pipeline gates ingest on — take the
    # slots of q13_count_distinct (exact distinct counting is now
    # driver-exercised by q37's per-column distinct profile) and
    # q14_rollup (the rollup family stays covered by q14b cube and
    # q14c grouping sets, both re-verified in this round's window).
    "q13_count_distinct",
    "q14_rollup",
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
