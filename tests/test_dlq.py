"""S18 — dead-letter routing: corrupt producer payloads land in a
quarantine table with a deterministic reason and the ORIGINAL raw line
(replayable after a fix), while valid rows flow to the main table; no
line is silently dropped (the reference's Flink parse drops them,
EventAggregationJob.java:188-193). Epoch-keyed overwrites make both
sinks idempotent under micro-batch replay."""

import os
import shutil
import tempfile

import pytest

from real_time_event_streaming_analytics_platform_spark.sources.fixtures import (
    generate_events,
    write_jsonl,
)
from real_time_event_streaming_analytics_platform_spark.streaming.entries import (
    dlq_writer,
    read_event_stream,
)


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="sgr-dlq-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


CORRUPT = (
    '{not json}\nnull\n{"event_id": null}\n{"event_id": "x"}\n'
    '{"event_id": "y", "timestamp": "not-a-date", "attributes": {"metric": 1.5}}\n'
)
# -> invalid_json, missing_event_id (literal null IS valid JSON),
#    missing_event_id, missing_metric, invalid_timestamp (the stream
#    path would stamp processing time; the deterministic DLQ path
#    quarantines instead)


def _drain(spark, in_dir, main, dlq, ckpt):
    q = (
        read_event_stream(spark, in_dir, max_files_per_trigger=1)
        .writeStream.foreachBatch(dlq_writer(main, dlq))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_s18_dlq_routes_rejects_with_reasons(spark, tmpdir):
    events = generate_events(60, seed=51)
    write_jsonl(events, f"{tmpdir}/in", n_files=2, prefix="a")
    with open(f"{tmpdir}/in/zz-corrupt.jsonl", "w") as fh:
        fh.write(CORRUPT)
    os.utime(f"{tmpdir}/in/zz-corrupt.jsonl", (1600090000, 1600090000))

    _drain(spark, f"{tmpdir}/in", f"{tmpdir}/main", f"{tmpdir}/dlq", f"{tmpdir}/ck")

    main = spark.read.parquet(f"{tmpdir}/main")
    dlq = spark.read.parquet(f"{tmpdir}/dlq")
    assert main.count() == 60
    assert main.select("event_id").distinct().count() == 60
    rejects = {(r.raw, r.reason) for r in dlq.collect()}
    assert rejects == {
        ("{not json}", "invalid_json"),
        ("null", "missing_event_id"),
        ('{"event_id": null}', "missing_event_id"),
        ('{"event_id": "x"}', "missing_metric"),
        (
            '{"event_id": "y", "timestamp": "not-a-date", "attributes": {"metric": 1.5}}',
            "invalid_timestamp",
        ),
    }
    # conservation: every input line is in exactly one table
    assert main.count() + dlq.count() == 65


def test_s18_restart_is_idempotent(spark, tmpdir):
    events = generate_events(40, seed=53)
    write_jsonl(events, f"{tmpdir}/in", n_files=2, prefix="a")
    with open(f"{tmpdir}/in/zz-corrupt.jsonl", "w") as fh:
        fh.write(CORRUPT)
    os.utime(f"{tmpdir}/in/zz-corrupt.jsonl", (1600090000, 1600090000))

    for _ in range(2):  # second drain replays nothing, rewrites nothing new
        _drain(
            spark, f"{tmpdir}/in", f"{tmpdir}/main", f"{tmpdir}/dlq", f"{tmpdir}/ck"
        )
    assert spark.read.parquet(f"{tmpdir}/main").count() == 40
    assert spark.read.parquet(f"{tmpdir}/dlq").count() == 5
