"""Serving layer: the reference read-API surface as DataFrame functions.

Mirrors services/read-api/main.py — `/kpi` (:228-291), `/series`
(:293-338 with the avg/sum/count/p95 agg map :307-314), `/alerts`
(:372-431) — plus the per-source regroup (O31, :342-362), the
window-string parser (O16, :166-175), the SQL views
(01-init-timescaledb.sql:68-84), and hot-store maintenance (O7: the
Kafka→Redis writer re-expressed as a foreachBatch upsert).

The serving layer stays a thin shim: every function builds ONE
DataFrame plan against the hot/cold tables; Catalyst does predicate
pushdown and partition pruning. Time anchors are data-derived
(max(ts)), never wall clock, so results are deterministic and testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# O16: window-string parser (read-api main.py:166-175)
WINDOW_SECONDS = {"1m": 60, "5m": 300, "15m": 900, "1h": 3600, "1d": 86400}


def parse_window(window: str) -> int:
    if window not in WINDOW_SECONDS:
        raise ValueError(f"unsupported window {window!r}; one of {sorted(WINDOW_SECONDS)}")
    return WINDOW_SECONDS[window]


def _anchored(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Attach `_anchor` = max(ts) as a broadcast scalar (one plan)."""
    anchor = df.agg(F.max(ts_col).alias("_anchor"))
    return df.join(F.broadcast(anchor))


# ---------------------------------------------------------------------------
# /kpi — latest aggregates from the hot store (main.py:228-291).
# ---------------------------------------------------------------------------


def hot_anchor(hot: DataFrame, ts_col: str = "window_start"):
    """Compute the hot table's max(ts) ONCE per refresh (one tiny job).

    A serving process refreshes the hot table per micro-batch but reads
    it many times; recomputing the anchor inside every /kpi plan adds an
    aggregate + broadcast join per request. Pass the returned value to
    ``kpi(anchor=...)`` so steady-state reads are a filter + top-N only.
    """
    row = hot.agg(F.max(ts_col).alias("a")).first()
    return row["a"] if row else None


def kpi(
    hot: DataFrame,
    source: str | None = None,
    window: str = "1m",
    limit: int = 100,
    ttl_seconds: int = 3600,
    anchor=None,
) -> DataFrame:
    """Latest hot aggregates, newest first. The Redis TTL becomes a
    read-time predicate against the data's own max window_start.

    ``anchor``: optional pre-computed max(window_start) (see
    ``hot_anchor``); when omitted the anchor is derived in-plan via a
    broadcast scalar join (correct but one extra aggregate per read).
    """
    parse_window(window)
    ttl = F.expr(f"INTERVAL {ttl_seconds} SECONDS")
    if anchor is None:
        # In-plan anchor over the WHOLE hot frame, before any filter —
        # the same quantity hot_anchor() precomputes. Anchoring after
        # the source/window filters would make the TTL self-referential
        # per subset: a stale source's own max never expires its rows,
        # and the two documented-equivalent paths would disagree.
        df = _anchored(hot, "window_start")
    else:
        df = hot.withColumn("_anchor", F.lit(anchor))
    df = df.where(F.col("window") == window)
    if source is not None:
        df = df.where(F.col("source") == source)
    df = df.where(F.col("window_start") >= F.col("_anchor") - ttl).drop("_anchor")
    return df.orderBy(F.col("window_start").desc(), "source").limit(limit)


# ---------------------------------------------------------------------------
# /series — time-series aggregation over the raw events (main.py:293-338).
# ---------------------------------------------------------------------------

_SERIES_AGGS = {
    "avg": lambda: F.avg("metric"),
    "sum": lambda: F.sum("metric"),
    "count": lambda: F.count("*").cast("double"),
    "p95": lambda: F.percentile("metric", 0.95),
}


# Minute-rollup column per agg — the metrics_1min shape produced by
# streaming.entries.sliding_aggregates (and the reference's continuous
# aggregate, 01-init-timescaledb.sql). p95 maps to the approx sketch the
# rollup carries; exact percentiles require the raw path.
_ROLLUP_COLS = {
    "avg": "avg_metric",
    "sum": "sum_metric",
    "count": "count_events",
    "p95": "p95_metric",
}


def series(
    events: DataFrame,
    start=None,
    end=None,
    source: str | None = None,
    agg: str = "avg",
    bucket: str = "minute",
    rollup: DataFrame | None = None,
) -> DataFrame:
    """(source, bucket, value) series — the agg map mirrors main.py:307-314.

    ``rollup``: optional pre-aggregated minute table keyed
    (source, window_start) — the metrics_1min analogue the streaming job
    maintains (the reference serves /series from its continuous
    aggregate the same way, main.py:293-299). Minute-bucket requests
    whose agg the rollup carries read it directly — no re-aggregation of
    raw events per request; anything else falls back to the raw path.
    """
    if agg not in _SERIES_AGGS:
        raise ValueError(f"unsupported agg {agg!r}; one of {sorted(_SERIES_AGGS)}")
    if (
        rollup is not None
        and bucket == "minute"
        and _ROLLUP_COLS.get(agg) in rollup.columns
    ):
        # Grid-align the rollup: sliding_aggregates windows start every
        # 10 s, so each event appears in 6 overlapping 1-minute rows —
        # keeping only :00-aligned window_starts selects exactly the
        # tumbling-minute subset (a no-op for an already-tumbling
        # rollup), matching the raw path's date_trunc buckets.
        df = rollup.where(
            F.col("window_start") == F.date_trunc("minute", "window_start")
        )
        # Continuous-aggregate range semantics: the buckets CONTAINING
        # start/end are returned whole (a pre-aggregated bucket cannot
        # be split). The raw fallback clips to exact timestamps — a
        # mid-bucket start differs between the paths by design, exactly
        # as TimescaleDB's continuous aggregates serve whole buckets.
        if start is not None:
            df = df.where(
                F.col("window_start") >= F.date_trunc("minute", F.lit(start))
            )
        if end is not None:
            df = df.where(F.col("window_start") <= F.lit(end))
        if source is not None:
            df = df.where(F.col("source") == source)
        return df.select(
            "source",
            F.col("window_start").alias("bucket"),
            F.col(_ROLLUP_COLS[agg]).cast("double").alias("value"),
        ).orderBy("source", "bucket")
    df = events
    if start is not None:
        df = df.where(F.col("ts") >= F.lit(start))
    if end is not None:
        df = df.where(F.col("ts") <= F.lit(end))
    if source is not None:
        df = df.where(F.col("source") == source)
    return (
        df.groupBy("source", F.date_trunc(bucket, "ts").alias("bucket"))
        .agg(_SERIES_AGGS[agg]().alias("value"))
        .orderBy("source", "bucket")
    )


def regroup_series(series_df: DataFrame) -> DataFrame:
    """O31 (main.py:342-362): tall series → one row per source with the
    ordered (bucket, value) points nested — sort_array over structs keeps
    it a single aggregate, no driver-side loop."""
    return (
        series_df.groupBy("source")
        .agg(
            F.sort_array(F.collect_list(F.struct("bucket", "value"))).alias("points")
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# /alerts — conjunctive filtered scan (main.py:372-431).
# ---------------------------------------------------------------------------


def alerts(
    anomalies: DataFrame,
    since=None,
    severity: str | None = None,
    resolved: bool | None = None,
    limit: int = 1000,
) -> DataFrame:
    """Dynamic conjunctive predicates + ORDER BY ts DESC LIMIT n (plans
    as TakeOrderedAndProject)."""
    df = anomalies
    if since is not None:
        df = df.where(F.col("ts") >= F.lit(since))
    if severity is not None:
        df = df.where(F.col("severity") == severity)
    if resolved is not None and "resolved" in df.columns:
        df = df.where(F.col("resolved") == resolved)
    order = [F.col("ts").desc()] + (
        [F.col("event_id")] if "event_id" in df.columns else []
    )
    return df.orderBy(*order).limit(limit)


def active_alert_counts(anomalies: DataFrame) -> DataFrame:
    """O33 (alert-service main.py:338-344): unresolved count per severity
    over the trailing hour, anchored to the data's max ts."""
    df = _anchored(anomalies)
    if "resolved" in anomalies.columns:
        df = df.where(~F.col("resolved"))
    return (
        df.where(F.col("ts") > F.col("_anchor") - F.expr("INTERVAL 1 HOUR"))
        .groupBy("severity")
        .agg(F.count("*").alias("n"))
        .orderBy("severity")
    )


# ---------------------------------------------------------------------------
# SQL views (01-init-timescaledb.sql:68-84), anchored to max(ts).
# ---------------------------------------------------------------------------


def register_views(events: DataFrame, anomalies: DataFrame | None = None) -> None:
    spark = events.sparkSession
    _anchored(events).where(
        F.col("ts") >= F.col("_anchor") - F.expr("INTERVAL 1 HOUR")
    ).drop("_anchor").createOrReplaceTempView("events_last_hour")
    if anomalies is not None:
        _anchored(anomalies).where(
            F.col("ts") >= F.col("_anchor") - F.expr("INTERVAL 24 HOURS")
        ).drop("_anchor").createOrReplaceTempView("anomalies_last_24h")
        # the reference's active_anomalies view is the UNRESOLVED subset
        # (sql/01-init-timescaledb.sql: resolved BOOLEAN DEFAULT FALSE);
        # matching active_alert_counts' filter in this module
        cond = "WHERE NOT resolved" if "resolved" in anomalies.columns else ""
        spark.sql(
            "CREATE OR REPLACE TEMP VIEW active_anomalies AS "
            f"SELECT * FROM anomalies_last_24h {cond}"
        )


# ---------------------------------------------------------------------------
# Hot-store maintenance (O7): the reference's Kafka→Redis writer as a
# foreachBatch upsert. Parquet append + read-time last-write-wins (the
# keep-latest is a window over (source, window, window_start) by batch);
# with a Delta/Iceberg table this becomes a real MERGE and the read-side
# dedup disappears.
# ---------------------------------------------------------------------------


def hot_store_writer(path: str):
    """foreachBatch callback: append each micro-batch with its batch id."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch", F.lit(batch_id))
            .write.mode("append")
            .parquet(path)
        )

    return write


def read_hot_store(spark, path: str) -> DataFrame:
    """Last-write-wins view of the hot store (Redis SET semantics,
    EventAggregationJob.java:277-292)."""
    from pyspark.sql import Window

    df = spark.read.parquet(path)
    w = Window.partitionBy("source", "window", "window_start").orderBy(
        F.col("_batch").desc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_batch")
    )


def gapfill_series(series_df: DataFrame, bucket: str = "minute") -> DataFrame:
    """TimescaleDB `time_bucket_gapfill` parity for /series responses:
    densify a (source, bucket, value) series so every source carries
    every bucket between the series' global min and max — count-like
    consumers coalesce the NULL to 0; avg-like consumers keep NULL (the
    reference's gapfill renders missing points as nulls too). Same
    spine construction as q29 (operators/relational.py): a single-row
    bounds aggregate broadcast against the distinct key set, exploded
    with `sequence()` — no driver loop; only already-aggregated rows
    join."""
    steps = {
        "minute": "interval 1 minute",
        "hour": "interval 1 hour",
        "day": "interval 1 day",
        "week": "interval 7 days",
    }
    if bucket not in steps:
        raise ValueError(f"unsupported bucket {bucket!r}; one of {sorted(steps)}")
    step = steps[bucket]
    bounds = series_df.agg(
        F.min("bucket").alias("mn"), F.max("bucket").alias("mx")
    )
    spine = (
        series_df.select("source")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "source",
            F.explode(F.sequence("mn", "mx", F.expr(step))).alias("bucket"),
        )
    )
    return spine.join(series_df, ["source", "bucket"], "left").orderBy(
        "source", "bucket"
    )
