"""Planted-violation tests for the data-quality layer and fuzzy dedup.

The driver oracles run q37/q38/t8 against the (clean) testdata, which
proves cross-engine agreement but never exercises the detection paths.
These tests write synthetic tables WITH violations and assert the
operators actually catch them — and that the scale guards (block cap)
bound the work the way the docstrings promise.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from real_time_event_streaming_analytics_platform_spark.functions.quality import (
    _check,
)
from real_time_event_streaming_analytics_platform_spark.plans.registry import (
    QUERIES,
)


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="sgr-quality-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_check_reports_planted_violations(spark):
    pop = spark.range(100).select(F.col("id"), (F.col("id") % 10).alias("v"))
    violations = pop.where(F.col("v") >= 7)  # 30 rows
    row = _check("range_check", pop, violations).collect()[0]
    assert row.check_name == "range_check"
    assert row.n_checked == 100
    assert row.n_violations == 30
    assert row.passed is False


def test_check_passes_on_clean_population(spark):
    pop = spark.range(50)
    row = _check("clean", pop, pop.where(F.lit(False))).collect()[0]
    assert row.n_violations == 0 and row.passed is True


def test_fk_violation_detected_on_planted_orphans(spark):
    # 5 orders reference customer 999 who does not exist
    customers = spark.range(10).select(F.col("id").alias("c_custkey"))
    orders = spark.range(100).select(
        F.col("id").alias("o_orderkey"),
        F.when(F.col("id") < 5, 999).otherwise(F.col("id") % 10).alias("o_custkey"),
    )
    orphans = orders.join(
        customers, orders["o_custkey"] == customers["c_custkey"], "left_anti"
    )
    row = _check("orders_customer_fk", orders, orphans).collect()[0]
    assert row.n_violations == 5 and row.passed is False


def _write_documents(spark, tmpdir, rows):
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/documents.parquet")
    return tmpdir


def test_t8_finds_planted_typo_pair(spark, tmpdir):
    base = "the quick brown fox jumps over the lazy dog " * 8  # ~350 chars
    typo = base[:100] + "X" + base[101:]  # 1 substitution, same 60-char prefix
    other = "completely different prefix " + "z" * 300
    sf = _write_documents(
        spark,
        tmpdir,
        [
            (1, base, "en", "a", len(base)),
            (2, typo, "en", "a", len(typo)),
            (3, other, "en", "a", len(other)),
        ],
    )
    rows = QUERIES["t8_fuzzy_dedup"](spark, sf).collect()
    assert [(r.doc_a, r.doc_b, r.edit_dist) for r in rows] == [(1, 2, 1)]


def test_t8_block_cap_bounds_comparisons(spark, tmpdir):
    # 60 docs share one prefix: the cap keeps the first 50, so pairs come
    # only from those — 50*49/2, never 60*59/2.
    prefix = "shared boilerplate header prefix shared boilerplate headerX "
    assert len(prefix) == 60
    rows = [
        (i, prefix + f"tail {i} " + "pad " * 5, "en", "a", 100) for i in range(60)
    ]
    sf = _write_documents(spark, tmpdir, rows)
    pairs = QUERIES["t8_fuzzy_dedup"](spark, sf).collect()
    ids = {r.doc_a for r in pairs} | {r.doc_b for r in pairs}
    assert max(ids) <= 49  # docs 50..59 dropped by the cap
    assert len(pairs) <= 50 * 49 / 2


def test_t9_bm25_ranks_term_dense_doc_first(spark, tmpdir):
    hit = "spark join window hash " * 10  # saturated with all query terms
    miss = "completely unrelated words nothing here matches at all " * 4
    mid = "spark appears once here " + "filler words " * 20
    sf = _write_documents(
        spark,
        tmpdir,
        [
            (1, miss, "en", "a", len(miss)),
            (2, hit, "en", "a", len(hit)),
            (3, mid, "en", "a", len(mid)),
        ],
    )
    rows = QUERIES["t9_bm25_search"](spark, sf).collect()
    assert rows[0].doc_id == 2  # rank 1 = the term-dense doc
    by_id = {r.doc_id: r.bm25 for r in rows}
    assert by_id[2] > by_id[3] >= by_id.get(1, 0.0)


def test_q37b_approx_profile_within_error_bound(spark, sf_dir):
    """The HLL profile (q37b) tracks the exact profile (q37): identical
    n/n_null (both exact counts) and per-column distinct estimates
    within 3x the configured rsd (0.01) of the exact values."""
    exact = {r["col"]: r for r in QUERIES["q37_profile"](spark, sf_dir).collect()}
    approx = {
        r["col"]: r for r in QUERIES["q37b_profile_approx"](spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for col, e in exact.items():
        a = approx[col]
        assert a["n"] == e["n"] and a["n_null"] == e["n_null"]
        nd = e["n_distinct"]
        assert abs(a["n_distinct_approx"] - nd) <= max(1, 0.03 * nd), (
            col,
            a["n_distinct_approx"],
            nd,
        )


def test_q38_scans_each_fact_table_once(spark, sf_dir):
    """The round-6 rewrite's contract: every table is scanned once PER
    ROLE, never once per check (the advisor's finding was events 3x /
    lineitem 3x). events and lineitem each appear once; orders appears
    exactly twice because it plays two roles — the checked child of the
    customer-FK check and the (column-pruned, key-only) parent side of
    the lineitem-FK join — and customer once as a parent."""
    plan = (
        QUERIES["q38_quality_checks"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    expected = {
        "events.parquet": 1,
        "lineitem.parquet": 1,
        "orders.parquet": 2,
        "customer.parquet": 1,
    }
    for table, n in expected.items():
        assert plan.count(table) == n, f"{table} scanned {plan.count(table)}x"


def test_q38_customer_fk_side_is_broadcast(spark, sf_dir):
    """The customer-parent side of the orders FK check is pinned as a
    BroadcastHashJoin (VERDICT r06 #5): the deduped customer PK set is
    dimension-sized at any SF, so the plan must never shuffle orders to
    join it. Asserted on the optimized logical → physical plan rather
    than trusting AQE's runtime pick."""
    plan = (
        QUERIES["q38_quality_checks"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one broadcast join carries the _pk build side from the
    # customer scan; the lineitem⋈orders FK join is left un-hinted
    assert "BroadcastHashJoin" in plan, plan[:2000]
    import re

    bcast_joins = re.findall(r"BroadcastHashJoin \[([^\]]*)\], \[([^\]]*)\]", plan)
    assert any("o_custkey" in l for l, r in bcast_joins), bcast_joins


def test_x19_flags_scrambled_token_order(spark, tmpdir):
    """x19's whole point vs the unigram filter (x17): a document built
    from individually-common tokens in an IMPROBABLE ORDER must score
    higher than the naturally-ordered docs that dominate the corpus.
    Ten docs repeat the bigram pattern a→b→c→d; the salad doc uses the
    exact same unigram profile but an order whose bigrams are unique to
    it, so every one of its pairs has count 1 + smoothing."""
    natural = "a b c d " * 8
    salad = "a c b d " * 8  # same tokens/counts, bigrams ac/cb/bd rare
    rows = [(i, natural, "en", "s", len(natural)) for i in range(10)]
    rows.append((99, salad, "en", "s", len(salad)))
    rows.append((100, "solo", "en", "s", 4))  # 1 token -> no bigrams
    sf = _write_documents(spark, tmpdir, rows)
    out = {r.doc_id: r for r in QUERIES["x19_bigram_surprisal"](spark, sf).collect()}
    assert 100 not in out  # <2 tokens excluded by both engines
    assert out[99].n_bigrams == 31  # 32 tokens -> n-1 pairs
    worst_natural = max(out[i].avg_surprisal for i in range(10))
    assert out[99].avg_surprisal > worst_natural
