"""Mergeable sketch operators (Apache DataSketches HLL, built into Spark
4's ``hll_sketch_agg`` / ``hll_union_agg``).

The 100 TB story: COUNT(DISTINCT) over a year of events rescans the year
on every dashboard refresh. The sketch pipeline instead materializes ONE
small binary per (key, partition-day) — computed map-side, shuffled as a
few-KB payload — and answers any distinct-count question over any day
range by UNIONING the stored sketches, never touching raw data again.
Union is associative and lossless at fixed lgK, so incremental daily
builds compose exactly: the estimate from merged per-day sketches is
BIT-IDENTICAL to sketching the raw union (pinned by test_sketches.py).

Reference parity: the reference has no sketch surface (its distinct
counts are PostgreSQL COUNT(DISTINCT), services/read-api/main.py:283-335);
this is a north-star extension in the same family as x1 (HLL++
approx_count_distinct, operators/relational.py:452) but adds the
*materialize → merge incrementally* shape that x1's single-pass form
cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..plans.registry import query

# lgK = 12 → ~1.6% RSE, 2-4 KB per sketch; 4096 registers.
_LGK = 12


def daily_user_sketches(events: DataFrame) -> DataFrame:
    """Per (event_type, day) HLL sketch of user_id.

    Map-side partial sketching means each shuffle record is one partial
    sketch, not raw ids; the day column is the natural partition key for
    an incremental materialization (append today's sketches, never
    recompute history).
    """
    return events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(_LGK)).alias("sketch"))


def merge_distinct_estimate(sketches: DataFrame) -> DataFrame:
    """Union stored sketches per event_type → estimated distinct users."""
    return (
        sketches.groupBy("event_type")
        .agg(F.hll_union_agg("sketch").alias("merged"))
        .select(
            "event_type",
            F.hll_sketch_estimate("merged").alias("est_users"),
        )
    )


@query("x11_sketch_distinct")
def x11_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type via materialize-then-merge HLL.

    Rows-only at the driver (sketch estimates are not SQL-portable);
    tests/test_sketches.py pins (a) estimate within 5% of exact
    COUNT(DISTINCT), (b) merged-daily == direct single-pass estimate
    exactly, (c) incremental append of one more day's sketch updates the
    estimate without touching prior days.
    """
    events = load(spark, sf_dir, "events")
    return (
        merge_distinct_estimate(daily_user_sketches(events))
        .orderBy("event_type")
    )
