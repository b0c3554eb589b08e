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
# Round-11 rotation (the standing alternation) + the slot-economics
# decision deferred by the r10 ceiling comment, now taken per VERDICT
# r10 #1/#2:
#
# - The six q12 set-op variants shared one SQL template; their six
#   oracle slots are CONSOLIDATED into one op-tagged union-of-results
#   oracle (q12_set_ops — a hash mismatch in ANY variant's slice fails
#   the single row). The individual variants stay registered rows-only,
#   pinned locally by a slice-equivalence test plus the 12-case
#   randomized set-op fuzz differential.
# - d3b_substring_dedup_clip is PROMOTED into a freed slot: its full
#   DuckDB differential (raw shingle strings, no xxhash64) becomes the
#   registered oracle — the semantically trickiest dedup op now holds
#   the hard driver signal.
# - t1b_lang_id_model was also nominated for promotion, but it has NO
#   honest SQL oracle: its features hash with xxhash64 (which DuckDB
#   cannot reproduce) and its weights come from an iterative IRLS fit.
#   Its local differential is a numpy replay, not DuckDB — embedding
#   precomputed predictions in the oracle SQL would game the gate, so
#   it stays rows-only; its hard signal this round is the NEW held-out
#   evaluation query (t1b_heldout_eval) instead.
#
# Oracle census after the consolidation: 100 − 6 (q12 variants)
# + 1 (q12_set_ops) + 1 (d3b) = 96 oracle-backed queries, 4 under the
# 2 × 50 = 100 two-round-freshness ceiling. Three of those spare
# slots are then SPENT on new oracle-backed curation operators added
# later in the round (x28 per-source token budget, x29 temperature
# language resampling, x30 shard manifest — see COVERAGE.md):
# 96 + 3 = 99 oracle-backed, 1 spare. The named r12 candidate for that
# spare slot is t4b_fingerprint_winnow (rows-only this round because
# the window below is exactly full; its text.T4B_ORACLE_SQL already
# passes a full tuple-level DuckDB differential every session).
#
# Window: the 50 r10 greens yield; 49 of them enter _DEMOTED
# (q12_union was r10-green but is now rows-only, so it simply leaves
# the oracle set). Priority window = 99 − 49 = 50 oracle-backed
# queries — every r09 green still oracle-backed, plus q12_set_ops,
# d3b, and the three new x28/x29/x30 ops — exactly filling the 50
# driver slots; no demoted keys backfill this round.
#
# Net effect: after r11 every oracle-backed query holds a green driver
# row from r10 or r11. Machine-asserted by tests/test_coverage_counts.py::
# test_rotation_freshness. Every demoted query remains fully
# registered and oracle-checked locally each session
# (tests/test_oracle_queries.py).
_DEMOTED = [
    # Reference r-series ops green r10; the returning r1/r2/r5-r7/
    # r8b/r9/r10/r12-r16 siblings re-verify the family (entry()
    # smoke-runs r3 every driver pass regardless of the window).
    "r3_series_minute",
    "r4_sliding_window",
    "r8_rolling_median",
    "r11_kpi_latest_per_key",
    # Join family green r10; returning q01/q07/q22/q31 re-verify.
    "q02_join_segment",
    "q03_multiway_join",
    "q03b_filtered_multiway",
    "q04_orders_histogram",
    "q05_semi_join",
    "q06_anti_join",
    "q08_broadcast_join",
    # Windows/ranking/top-k green r10; returning q09/q09b re-verify.
    "q10_analytic_window",
    "q11_topk",
    "q33_time_range_window",
    # Distinct/grouping/pivot green r10; returning q14b/q14c/q28
    # re-verify; NEW q12_set_ops holds the whole set-op family.
    "q13_count_distinct",
    "q14_rollup",
    "q27_pivot",
    # Scalar/date/share/merge/stat green r10; returning q15-q21
    # relatives re-verify.
    "q20_date_shift",
    "q32_ewma_trend",
    "q39_group_share",
    "q40_merge_upsert",
    "q41_stat_aggregates",
    "q37_profile",
    # Sampling green r10; returning q26b/q26c re-verify.
    "x23_weighted_priority_sample",
    # Dedup/documents green r10; returning d2/x24 plus NEW d3b hold
    # the family.
    "q24_dedup_exact",
    "d1_dedup_docs_exact",
    "d3_substring_dup_spans",
    "d4_canonical_representative",
    "t7_chunk_dedup",
    "t8_fuzzy_dedup",
    # Similarity green r10 (exact-oracle x3).
    "x3_cosine_topk",
    # Text/quality/retrieval green r10; returning t5/t6b re-verify.
    "q25_text_stats",
    "q25b_top_tokens",
    "t1_lang_id",
    "t2_quality_score",
    "t3_token_counts",
    "t6_repetition",
    "t9_bm25_search",
    "x16_bm25_topk",
    "x17_unigram_surprisal",
    "x19_bigram_surprisal",
    "x19b_bigram_surprisal_capped",
    # Multimodal/pipeline green r10; returning x10/x25 re-verify.
    "x4_multimodal_roundtrip",
    "x5_train_split",
    "x6_sequence_pack",
    "x8_decontaminate",
    "x9_source_mixing",
    "x7_embedding_quantize",
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
