"""Structured Streaming core: source → parse → watermark → windowed
aggregates, mirroring the reference aggregation job
(EventAggregationJob.java:59-110) Spark-first.

Kafka in production is the same pipeline with
``readStream.format("kafka")`` + the value column through ``from_json``;
tests use the file-stream source (identical parse/watermark/window path,
and replayable). Every aggregate is expressed so streaming and batch
share the plan: the S2/S3 parity tests run the SAME logical query in
both modes and compare results.

Scale: the stream shuffles once per aggregate (on the window+source
keys); state is windowed and evicted by the watermark; RocksDB state
store (session.py) keeps per-key state off-heap. p95/p99 use
percentile_approx (bounded state) — the exact nearest-rank form (R6) is
batch-only by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

# The reference flattens the JSON event to a typed record, dropping
# source-specific extra attributes (EventAggregationJob.java:129-152,
# 171-194). This schema mirrors that flatten.
EVENT_SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("source", StringType()),
        StructField("timestamp", StringType()),
        StructField(
            "attributes",
            StructType(
                [
                    StructField("user_id", StringType()),
                    StructField("metric", DoubleType()),
                    StructField("status", StringType()),
                    StructField("session_id", StringType()),
                    StructField("region", StringType()),
                    StructField("version", StringType()),
                ]
            ),
        ),
    ]
)

WATERMARK = "10 seconds"  # bounded out-of-orderness, AGG:68-71


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-stream twin of the Kafka source (O1). Each JSONL line is one
    event; maxFilesPerTrigger=1 replays one file per micro-batch (the
    knob the watermark tests use to control batch boundaries)."""
    reader = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger or 1000)
    )
    return reader.load(path).withColumnRenamed("value", "raw")


def read_kafka_stream(
    spark: SparkSession,
    bootstrap: str,
    topic: str = "events.v1",
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka twin of the file source (O1: EventAggregationJob.java:59-65 —
    subscribe events.v1, value-only, latest offsets). Produces the same
    `raw` column as read_event_stream, so parse_events and everything
    downstream is shared. Requires the spark-sql-kafka connector on the
    classpath (not present in this test container — exercised via the
    file twin)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(F.col("value").cast("string").alias("raw"))
    )


def parse_events(raw: DataFrame, require_positive_metric: bool = False) -> DataFrame:
    """JSON parse + flatten + validity filter + event-time watermark
    (O9/O10/O2/O12). Bad rows → null json → dropped, like the Flink
    parse (EventAggregationJob.java:188-193, :74-76)."""
    parsed = _parse_project(raw)
    if require_positive_metric:  # anomaly job's extra filter (ANO:83)
        parsed = parsed.where(F.col("metric") > 0)
    return parsed.withWatermark("ts", WATERMARK)


def _parse_project(raw: DataFrame) -> DataFrame:
    """The watermark-free parse projection — shared by the streaming
    entry (which adds the watermark) and the batch-context consumers
    (dlq_writer's foreachBatch frames, the batch parity twins)."""
    j = raw.select(F.from_json("raw", EVENT_SCHEMA).alias("j")).where(
        F.col("j").isNotNull() & F.col("j.event_id").isNotNull()
    )
    parsed = j.select(
        F.col("j.event_id").alias("event_id"),
        F.col("j.source").alias("source"),
        # ISO-8601 → timestamp; parse failure falls back to processing
        # time (EventAggregationJob.java:116-126). try_to_timestamp, not
        # to_timestamp: under ANSI (Spark 4 default) the plain form
        # THROWS on a malformed string — the fallback could never fire
        # and one bad line would kill the stream.
        F.coalesce(
            F.try_to_timestamp("j.timestamp"), F.current_timestamp()
        ).alias("ts"),
        F.col("j.attributes.metric").alias("metric"),
        F.col("j.attributes.status").alias("status"),
        F.col("j.attributes.user_id").alias("user_id"),
        F.col("j.attributes.session_id").alias("session_id"),
    ).where(F.col("metric").isNotNull())
    return parsed


def sliding_aggregates(
    parsed: DataFrame, window: str = "1 minute", slide: str = "10 seconds"
) -> DataFrame:
    """1-minute windows sliding by 10 s per source (O17-O19), producing
    the metrics_1min row shape (count/avg/error_rate/sum + approx
    p95/p99). Works identically as a batch plan — the S2 parity test
    relies on that (and the S27 fuzz sweep varies window/slide)."""
    return (
        parsed.groupBy(F.window("ts", window, slide), "source")
        .agg(
            F.count("*").alias("count_events"),
            F.avg("metric").alias("avg_metric"),
            F.percentile_approx("metric", 0.95, 10000).alias("p95_metric"),
            F.percentile_approx("metric", 0.99, 10000).alias("p99_metric"),
            (
                F.sum(F.when(F.col("status") == "error", 1).otherwise(0))
                / F.count("*")
            ).alias("error_rate"),
            F.sum("metric").alias("sum_metric"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "source",
            "count_events",
            "avg_metric",
            "p95_metric",
            "p99_metric",
            "error_rate",
            "sum_metric",
        )
    )


def session_counts(parsed: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows (S7; batch mirror is Q23)."""
    return (
        parsed.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join bounded by event time: each left row matches
    right rows with the same key whose ts lies in [left.ts - within,
    left.ts]. Both sides carry watermarks, so the join state is evicted
    once the bound passes — the Structured Streaming interval-join
    pattern (SURVEY.md §2b joins row).

    ``how='left_outer'`` additionally emits each unmatched left row
    (null right columns) once the watermark has passed the point where
    a matching right row could still arrive — the streaming form of
    "events that triggered no alert". Outer emission is watermark-
    driven: rows whose join window is still open when the stream ends
    stay in state and are NOT emitted as unmatched (correct — a match
    could still come)."""
    l = left.select(
        F.col(key).alias("l_key"),
        F.col("event_id").alias("l_event_id"),
        F.col("ts").alias("l_ts"),
    )
    r = right.select(
        F.col(key).alias("r_key"),
        F.col("event_id").alias("r_event_id"),
        F.col("ts").alias("r_ts"),
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {within}"))
        & (F.col("r_ts") <= F.col("l_ts"))
    )
    return l.join(r, cond, how)


def dedup_within_watermark(parsed: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Streaming exact dedup with bounded state:
    dropDuplicatesWithinWatermark keeps each key only as long as the
    watermark allows a duplicate to still arrive — the streaming twin of
    the batch keep-first (Q24)."""
    return parsed.dropDuplicatesWithinWatermark(keys or ["event_id"])


def run_available_now(
    stream_df: DataFrame,
    checkpoint: str,
    output_mode: str = "append",
    name: str = "stream_result",
) -> DataFrame:
    """Drain the stream with trigger(availableNow) into a memory sink and
    return the materialized result — the batch↔stream parity harness."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def run_to_parquet(
    stream_df: DataFrame, path: str, checkpoint: str, output_mode: str = "append"
) -> None:
    """Drain to a parquet table with exactly-once file-sink semantics —
    the checkpoint/recovery (S6) path."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def classify_events(raw: DataFrame) -> DataFrame:
    """Every raw line tagged with its parse outcome — the dead-letter
    split the reference's Flink jobs silently skip (EventAggregationJob.
    java:188-193 catches the JSON exception and drops the record; an
    operator debugging a producer regression gets nothing). One
    from_json pass computes a deterministic reject reason:
    'invalid_json' | 'missing_event_id' | 'missing_metric' |
    'invalid_timestamp' | NULL (= valid), and `dlq_writer` routes the
    rest to a quarantine table WITH the original line, so bad payloads
    are replayable after a fix.

    The DLQ path is deliberately STRICTER than the lossy stream path on
    timestamps: `parse_events` keeps a row with an unparseable timestamp
    by stamping processing time (the reference's fallback, EventAgg:116-
    126), but a processing-time stamp makes an epoch's content differ on
    replay — so the auditable path quarantines those rows instead, and
    every main-table row is a pure function of its input line."""
    j = F.from_json("raw", EVENT_SCHEMA)
    # from_json is PERMISSIVE (a malformed line yields a null-FIELDED
    # struct, not a null struct), so malformedness is detected with
    # try_parse_json: NULL ⇔ the line is not valid JSON at all. A
    # literal `null` line IS valid JSON and classifies as
    # missing_event_id, matching what the parse path drops it for.
    reason = (
        F.when(F.try_parse_json("raw").isNull(), "invalid_json")
        .when(j["event_id"].isNull(), "missing_event_id")
        .when(j["attributes"]["metric"].isNull(), "missing_metric")
        .when(F.try_to_timestamp(j["timestamp"]).isNull(), "invalid_timestamp")
        .otherwise(F.lit(None).cast("string"))
    )
    return raw.select("raw", reason.alias("_reason"))


def dlq_writer(main_path: str, dlq_path: str):
    """foreachBatch dual-route writer: valid rows (fully parsed) to the
    main table, rejects (raw line + reason) to the dead-letter table.
    Each epoch writes to its own epoch=<id> partition with overwrite, so
    a replayed micro-batch rewrites the same partition with identical
    content — idempotent under restart, the same per-epoch discipline
    as the notifier's done-markers (notify.py)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        tagged = classify_events(batch_df).persist()
        try:
            valid = _parse_project(
                tagged.where(F.col("_reason").isNull()).select("raw")
            )
            valid.write.mode("overwrite").parquet(f"{main_path}/epoch={batch_id}")
            (
                tagged.where(F.col("_reason").isNotNull())
                .select("raw", F.col("_reason").alias("reason"))
                .write.mode("overwrite")
                .parquet(f"{dlq_path}/epoch={batch_id}")
            )
        finally:
            tagged.unpersist()

    return write
