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
