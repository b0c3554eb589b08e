"""S14 — the hot-store serving path (O7/O29, read-api main.py:228-291).

The reference answers /kpi from Redis (key scan + JSON parse, no query
engine); `serving/hotstore.HotStore` is that path for this engine,
maintained by a foreachBatch callback downstream of the sliding
aggregate. These tests prove: the stream populates it, reads mirror
the reference handler (newest-first, source filter, limit, TTL), and a
read is a sub-millisecond in-process operation — no Spark job.
"""

import math
import shutil
import tempfile
import time

import pytest

from real_time_event_streaming_analytics_platform_spark.serving.hotstore import HotStore
from real_time_event_streaming_analytics_platform_spark.sources.fixtures import (
    generate_events,
    write_jsonl,
)
from real_time_event_streaming_analytics_platform_spark.streaming.entries import (
    parse_events,
    read_event_stream,
    sliding_aggregates,
)


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="sgr-hot-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _populate_from_stream(spark, tmpdir, store):
    events = generate_events(400, seed=21, interval_ms=500)
    write_jsonl(events, f"{tmpdir}/in", n_files=3)
    agg = sliding_aggregates(
        parse_events(read_event_stream(spark, f"{tmpdir}/in", max_files_per_trigger=1))
    )
    q = (
        agg.writeStream.foreachBatch(store.upsert_writer(window="1m"))
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # batch twin for the expected values
    raw = spark.read.text(f"{tmpdir}/in").withColumnRenamed("value", "raw")
    return sliding_aggregates(parse_events(raw)).collect()


def test_s14_stream_populates_hot_store(spark, tmpdir):
    store = HotStore()
    batch_rows = _populate_from_stream(spark, tmpdir, store)

    got = store.kpi(window="1m", limit=10_000)
    expect = {
        (r["source"], str(r["window_start"])): r for r in batch_rows
    }
    assert len(got) == len(expect)
    for e in got:
        b = expect[(e["source"], e["window_start"])]
        assert e["count_events"] == b["count_events"]
        assert math.isclose(e["avg_metric"], b["avg_metric"], rel_tol=1e-9)
        assert math.isclose(e["error_rate"], b["error_rate"], rel_tol=1e-9)

    # reference handler semantics: newest-first, limit, source filter
    top = store.kpi(window="1m", limit=5)
    assert len(top) == 5
    assert [e["window_start"] for e in top] == sorted(
        (e["window_start"] for e in top), reverse=True
    )
    one_source = got[0]["source"]
    assert {e["source"] for e in store.kpi(source=one_source, window="1m")} == {
        one_source
    }
    # a read is an in-process lookup: well under a millisecond, no Spark
    t0 = time.perf_counter()
    for _ in range(100):
        store.kpi(window="1m", limit=100)
    per_read = (time.perf_counter() - t0) / 100
    assert per_read < 0.005, per_read


def test_last_write_wins():
    store = HotStore()
    store.set("api", "1m", "2024-01-01 00:00:00", {"count_events": 1})
    store.set("api", "1m", "2024-01-01 00:00:00", {"count_events": 7})
    got = store.kpi(window="1m")
    assert len(got) == 1 and got[0]["count_events"] == 7


def test_ttl_expiry_deterministic_clock():
    clock = {"t": 1000.0}
    store = HotStore(now_fn=lambda: clock["t"])
    store.set("api", "1m", "2024-01-01 00:00:00", {"count_events": 1}, ttl_seconds=60)
    store.set("web", "1m", "2024-01-01 00:01:00", {"count_events": 2}, ttl_seconds=600)
    assert len(store.kpi(window="1m")) == 2
    clock["t"] += 120  # first key past TTL
    got = store.kpi(window="1m")
    assert [e["source"] for e in got] == ["web"]
    assert store.purge_expired() == 1
    assert len(store) == 1


def test_unknown_window_returns_empty():
    store = HotStore()
    store.set("api", "1m", "2024-01-01 00:00:00", {"count_events": 1})
    assert store.kpi(window="5m") == []
