"""S17 — cold-store rollup writer: foreachBatch dynamic-partition-
overwrite upsert of updated sliding aggregates (the reference's missing
aggregates.db consumer). Pins (a) the final table equals the batch
rollup after multi-trigger streaming, (b) full replay from a fresh
checkpoint into the SAME table is idempotent, (c) only touched
partitions are rewritten (untouched (ws, source) partitions survive)."""

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from real_time_event_streaming_analytics_platform_spark.sources.fixtures import (
    generate_events,
    write_jsonl,
)
from real_time_event_streaming_analytics_platform_spark.streaming.entries import (
    parse_events,
    read_event_stream,
    sliding_aggregates,
)
from real_time_event_streaming_analytics_platform_spark.streaming.sinks import (
    rollup_writer,
)


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="sgr-rollup-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _read_batch(spark, path):
    raw = spark.read.text(path).withColumnRenamed("value", "raw")
    return parse_events(raw)


def _drain(spark, in_dir, table, ckpt):
    q = (
        sliding_aggregates(
            parse_events(read_event_stream(spark, in_dir, max_files_per_trigger=1))
        )
        .writeStream.foreachBatch(rollup_writer(table))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _canon(df):
    return {
        (r["ws"], r["source"]): (r["count_events"], round(r["avg_metric"], 9))
        for r in df.collect()
    }


def test_s17_rollup_upsert_matches_batch_and_replays_idempotently(spark, tmpdir):
    events = generate_events(600, seed=31, interval_ms=400, out_of_order_ms=2000)
    write_jsonl(events, f"{tmpdir}/in", n_files=4)
    table = f"{tmpdir}/rollup"

    _drain(spark, f"{tmpdir}/in", table, f"{tmpdir}/ck1")
    got = _canon(spark.read.parquet(table))

    batch = sliding_aggregates(_read_batch(spark, f"{tmpdir}/in")).withColumn(
        "ws", F.date_format("window_start", "yyyy-MM-dd'T'HH:mm:ss'Z'")
    )
    want = _canon(batch)
    assert got == want  # update-mode upserts converge to the batch rollup

    # replay the whole input from a FRESH checkpoint into the same table:
    # every partition is overwritten with identical deterministic content
    _drain(spark, f"{tmpdir}/in", table, f"{tmpdir}/ck2")
    assert _canon(spark.read.parquet(table)) == want


def test_s17_untouched_partitions_survive(spark, tmpdir):
    # two disjoint event batches a minute apart -> disjoint window
    # partitions; writing batch B must not clobber batch A's partitions
    from datetime import timedelta

    from real_time_event_streaming_analytics_platform_spark.sources.fixtures import BASE_TS

    a = generate_events(120, seed=41, interval_ms=400)
    b = generate_events(
        120, seed=43, interval_ms=400, base_ts=BASE_TS + timedelta(hours=1)
    )
    write_jsonl(a, f"{tmpdir}/in_a", n_files=1)
    write_jsonl(b, f"{tmpdir}/in_b", n_files=1)
    table = f"{tmpdir}/rollup"

    _drain(spark, f"{tmpdir}/in_a", table, f"{tmpdir}/ck_a")
    after_a = _canon(spark.read.parquet(table))
    _drain(spark, f"{tmpdir}/in_b", table, f"{tmpdir}/ck_b")
    after_b = _canon(spark.read.parquet(table))

    # all of A's partitions are still there, values unchanged
    assert set(after_a) <= set(after_b)
    for k in after_a:
        assert after_b[k] == after_a[k]
    # and B actually added its own disjoint partitions
    assert len(after_b) > len(after_a)
