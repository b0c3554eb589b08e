"""HLL sketch pipeline: tolerance vs exact, exact merge associativity,
and the incremental-append property that justifies materializing
sketches at 100 TB (new data never triggers a rescan of history)."""

from pyspark.sql import functions as F

from real_time_event_streaming_analytics_platform_spark.catalog import load
from real_time_event_streaming_analytics_platform_spark.functions.sketches import (
    daily_user_sketches,
    merge_distinct_estimate,
    x11_sketch_distinct,
)

from .conftest import SF_DIR


def test_estimate_within_5pct_of_exact(spark):
    est = {
        r.event_type: r.est_users
        for r in x11_sketch_distinct(spark, SF_DIR).collect()
    }
    exact = {
        r.event_type: r.exact
        for r in load(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        assert abs(est[k] - exact[k]) <= max(1, 0.05 * exact[k]), (
            k, est[k], exact[k],
        )


def test_merged_daily_equals_direct_sketch(spark):
    events = load(spark, SF_DIR, "events")
    merged = {
        r.event_type: r.est_users
        for r in merge_distinct_estimate(daily_user_sketches(events)).collect()
    }
    direct = {
        r.event_type: r.est
        for r in events.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("est")
        )
        .collect()
    }
    assert merged == direct  # lossless union at fixed lgK: bit-identical


def test_incremental_append_without_history_rescan(spark):
    events = load(spark, SF_DIR, "events")
    cut = events.agg(F.max(F.to_date("ts")).alias("mx")).collect()[0].mx
    history = events.where(F.to_date("ts") < F.lit(cut))
    today = events.where(F.to_date("ts") >= F.lit(cut))
    # materialized yesterday: sketches over history only
    stored = daily_user_sketches(history)
    # today's increment touches only today's rows
    increment = daily_user_sketches(today)
    est_incr = {
        r.event_type: r.est_users
        for r in merge_distinct_estimate(stored.unionByName(increment)).collect()
    }
    est_full = {
        r.event_type: r.est_users
        for r in merge_distinct_estimate(daily_user_sketches(events)).collect()
    }
    assert est_incr == est_full


# ---- x12 Count-Min Sketch heavy hitters ----


def _toks(spark):
    from real_time_event_streaming_analytics_platform_spark.functions.sketches import _token_rows

    docs = load(spark, SF_DIR, "documents")
    return _token_rows(docs)


def test_cms_overestimates_within_bound(spark):
    from real_time_event_streaming_analytics_platform_spark.functions.sketches import (
        _CMS_W,
        cms_build,
        cms_estimate,
    )

    toks = _toks(spark)
    sk = cms_build(toks)
    exact = toks.groupBy("grp", "token").agg(F.count("*").alias("n"))
    # probe the exact top-10 per group
    from pyspark.sql import Window as W

    top = (
        exact.withColumn(
            "rk", F.row_number().over(W.partitionBy("grp").orderBy(F.desc("n"), "token"))
        )
        .where("rk <= 10")
        .select("grp", "token", "n")
    )
    est = cms_estimate(sk, top.select("grp", "token"))
    joined = est.join(top, ["grp", "token"]).collect()
    totals = {
        r.grp: r.total
        for r in toks.groupBy("grp").agg(F.count("*").alias("total")).collect()
    }
    assert joined
    for r in joined:
        assert r.est_count >= r.n, (r.grp, r.token)  # CMS never undercounts
        # e/w error bound with huge headroom (d=4 takes the min)
        assert r.est_count - r.n <= max(10, 3 * totals[r.grp] / _CMS_W), (
            r.grp, r.token, r.est_count, r.n,
        )


def test_cms_merged_shards_equal_direct_build(spark):
    from real_time_event_streaming_analytics_platform_spark.functions.sketches import (
        cms_build,
        cms_merge,
    )

    toks = _toks(spark).withColumn(
        "shard", F.pmod(F.xxhash64("token"), F.lit(3))
    )
    direct = {r.grp: r.sketch for r in cms_build(toks.drop("shard")).collect()}
    per_shard = cms_build(
        toks.withColumn("grp", F.concat_ws("|", "grp", "shard")).drop("shard")
    ).select(F.split("grp", "\\|")[0].alias("grp"), "sketch")
    merged = {r.grp: r.sketch for r in cms_merge(per_shard).collect()}
    assert direct == merged  # elementwise-add merge is exact, bit-for-bit


def test_x12_query_runs_and_ranks(spark):
    from real_time_event_streaming_analytics_platform_spark.functions.sketches import (
        x12_cms_heavy_hitters,
    )

    rows = x12_cms_heavy_hitters(spark, SF_DIR).collect()
    assert rows
    # per group: descending estimates, 10 candidates
    from collections import defaultdict

    by_grp = defaultdict(list)
    for r in rows:
        by_grp[r.grp].append(r.est_count)
    for grp, ests in by_grp.items():
        assert len(ests) == 10, grp
        assert ests == sorted(ests, reverse=True), grp


# ---- x13 KLL quantile sketches ----


def _rank_errors(spark, est_rows, quantiles=("p50", "p95", "p99")):
    """For each (event_type, quantile-estimate), the |empirical rank −
    target| in the EXACT data — computed in ONE events scan (broadcast
    join of the tiny estimates frame, grouped conditional aggregates),
    not one filtered job per event type. KLL's contract is rank error,
    not value error — a heavy-tailed value axis makes value-tolerance
    meaningless while rank stays tight."""
    targets = {"p50": 0.5, "p95": 0.95, "p99": 0.99}
    events = load(spark, SF_DIR, "events")
    est = spark.createDataFrame(
        [(r["event_type"], *[float(r[n]) for n in quantiles]) for r in est_rows],
        "event_type string, " + ", ".join(f"e_{n} double" for n in quantiles),
    )
    aggs = [
        (
            F.count_if(F.col("value") <= F.col(f"e_{n}")) / F.count(F.lit(1))
        ).alias(n)
        for n in quantiles
    ]
    ranks = (
        events.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(*aggs)
        .collect()
    )
    assert len(ranks) == len(est_rows)
    return [abs(r[n] - targets[n]) for r in ranks for n in quantiles]


def test_kll_rank_accuracy_direct_and_merged(spark):
    from real_time_event_streaming_analytics_platform_spark.functions.sketches import (
        x13_sketch_quantiles,
    )

    rows = x13_sketch_quantiles(spark, SF_DIR).collect()
    assert len(rows) >= 3
    # k=200 → ~1.65% normalized rank error (99% conf); 2.5% headroom
    errs = _rank_errors(spark, rows)
    assert max(errs) <= 0.025, errs


def test_kll_incremental_append_rank_accuracy(spark):
    """Appending today's sketches to frozen history sketches (no
    history rescan) must answer with the same rank guarantee as the
    full rebuild — the property that justifies materializing. Unlike
    HLL's exact union algebra, KLL compaction is randomized, so the
    assertion is the rank bound, not bit equality."""
    from real_time_event_streaming_analytics_platform_spark.functions.sketches import (
        daily_metric_sketches,
        merge_quantile_estimates,
    )

    events = load(spark, SF_DIR, "events")
    cut = events.agg(F.max(F.to_date("ts")).alias("mx")).collect()[0].mx
    history = events.where(F.to_date("ts") < F.lit(cut))
    today = events.where(F.to_date("ts") >= F.lit(cut))
    stored = daily_metric_sketches(history)
    increment = daily_metric_sketches(today)
    rows = merge_quantile_estimates(stored.unionByName(increment)).collect()
    errs = _rank_errors(spark, rows)
    assert max(errs) <= 0.025, errs


# --- x14: Theta-sketch set expressions -------------------------------------


def test_theta_overlap_matches_exact_on_events(spark):
    """Every pairwise estimate equals the join-computed exact truth at
    this SF (the per-type user sets are far below the sketch's k=4096
    retained hashes, so Theta operates in exact mode — which also pins
    that union/intersection/difference wire through correctly)."""
    from real_time_event_streaming_analytics_platform_spark.functions.sketches import (
        x14_theta_overlap,
    )

    got = {
        (r.src_a, r.src_b): (
            r.users_a, r.users_b, r.users_union, r.users_both, r.users_only_a
        )
        for r in x14_theta_overlap(spark, SF_DIR).collect()
    }
    ev = load(spark, SF_DIR, "events")
    sets = {
        r.event_type: None for r in ev.select("event_type").distinct().collect()
    }
    for t in sets:
        sets[t] = {
            r.user_id
            for r in ev.where(F.col("event_type") == t)
            .select("user_id")
            .distinct()
            .collect()
        }
    expect_keys = {
        (a, b) for a in sets for b in sets if a < b
    }
    assert set(got) == expect_keys
    for (a, b), (na, nb, nu, ni, nd) in got.items():
        sa, sb = sets[a], sets[b]
        assert (na, nb, nu, ni, nd) == (
            len(sa), len(sb), len(sa | sb), len(sa & sb), len(sa - sb)
        ), (a, b)


def test_theta_estimation_mode_tolerance_and_inclusion_exclusion(spark):
    """Estimation mode (sets ≫ k): two 120k-id sets with a 40k overlap.
    Each expression estimate lands within 5% of truth, and the
    inclusion-exclusion identity holds within combined tolerance on the
    ESTIMATES — the sketch algebra is self-consistent, not just
    per-expression accurate."""
    from real_time_event_streaming_analytics_platform_spark.functions.sketches import (
        theta_overlap_matrix,
    )

    a = spark.range(0, 120_000).select(
        F.lit("a").alias("event_type"), F.col("id").cast("string").alias("user_id")
    )
    b = spark.range(80_000, 200_000).select(
        F.lit("b").alias("event_type"), F.col("id").cast("string").alias("user_id")
    )
    sk = (
        a.unionAll(b)
        .groupBy("event_type")
        .agg(F.theta_sketch_agg("user_id").alias("sketch"))
    )
    row = theta_overlap_matrix(sk).collect()[0]
    truth = {
        "users_a": 120_000,
        "users_b": 120_000,
        "users_union": 200_000,
        "users_both": 40_000,
        "users_only_a": 80_000,
    }
    for k, v in truth.items():
        assert abs(row[k] - v) <= 0.05 * v, (k, row[k], v)
    assert abs(
        row["users_union"] - (row["users_a"] + row["users_b"] - row["users_both"])
    ) <= 0.05 * row["users_union"]


def test_theta_merged_daily_equals_direct(spark):
    """theta_union_agg over per-day partial sketches must answer the
    overlap expressions identically to direct single-pass sketches —
    the materialize-then-merge shape (same property x11 pins for HLL)."""
    from real_time_event_streaming_analytics_platform_spark.functions.sketches import (
        source_user_theta,
        theta_overlap_matrix,
    )

    events = load(spark, SF_DIR, "events")
    direct = {
        (r.src_a, r.src_b): tuple(r)[2:]
        for r in theta_overlap_matrix(source_user_theta(events)).collect()
    }
    daily = events.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.theta_sketch_agg("user_id").alias("sketch")
    )
    merged = daily.groupBy("event_type").agg(
        F.theta_union_agg("sketch").alias("sketch")
    )
    via_merge = {
        (r.src_a, r.src_b): tuple(r)[2:]
        for r in theta_overlap_matrix(merged).collect()
    }
    assert direct == via_merge
