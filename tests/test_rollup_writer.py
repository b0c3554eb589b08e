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


def test_s23_streaming_kll_sketches_no_double_count_and_rank_accuracy(spark, tmpdir):
    """The streaming twin of x13: kll_sketch_writer materializes
    per-(key, day, epoch) sketches from micro-batches. Pins (a) the
    stored merge's row count n equals the event count EXACTLY (sketches
    never drop or duplicate rows), (b) a replayed epoch does NOT
    double-count (dynamic partition overwrite rewrites its own (day,
    epoch) partitions instead of re-merging), and (c) quantile
    estimates from the store hit KLL's rank guarantee against the exact
    per-source data."""
    from real_time_event_streaming_analytics_platform_spark.sources.fixtures import (
        generate_events,
        write_jsonl,
    )
    from real_time_event_streaming_analytics_platform_spark.streaming.entries import (
        parse_events,
        read_event_stream,
    )
    from real_time_event_streaming_analytics_platform_spark.streaming.sinks import (
        kll_sketch_writer,
        kll_store_quantiles,
    )

    n = 4000
    write_jsonl(generate_events(n, seed=41, interval_ms=100), f"{tmpdir}/in", n_files=4)
    stream = parse_events(
        read_event_stream(spark, f"{tmpdir}/in", max_files_per_trigger=1)
    )
    write = kll_sketch_writer(f"{tmpdir}/sk")
    q = (
        stream.writeStream.foreachBatch(write)
        .option("checkpointLocation", f"{tmpdir}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = parse_events(
        spark.read.text(f"{tmpdir}/in").withColumnRenamed("value", "raw")
    )
    exact_counts = {
        r["source"]: r["n"]
        for r in batch.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    est = {r["key"]: r for r in kll_store_quantiles(spark, f"{tmpdir}/sk").collect()}
    assert set(est) == set(exact_counts)
    for src, row in est.items():
        assert row["n"] == exact_counts[src], (src, row["n"], exact_counts[src])

    # (b) replay idempotence, deterministically: a second store fed by
    # direct write() calls — tranche 1 as epoch 0, tranche 2 as epoch
    # 1, then tranche 1 REPLAYED as epoch 0. The dynamic partition
    # overwrite must rewrite epoch 0's own partitions, leaving total n
    # unchanged (a merge-on-write design would double-count here).
    t1 = batch.where(F.col("event_id") < F.lit("m"))
    t2 = batch.where(F.col("event_id") >= F.lit("m"))
    write2 = kll_sketch_writer(f"{tmpdir}/sk2")
    write2(t1, 0)
    write2(t2, 1)
    n_before = {
        r["key"]: r["n"]
        for r in kll_store_quantiles(spark, f"{tmpdir}/sk2").collect()
    }
    write2(t1, 0)  # replay
    n_after = {
        r["key"]: r["n"]
        for r in kll_store_quantiles(spark, f"{tmpdir}/sk2").collect()
    }
    assert n_after == n_before, "replayed epoch double-counted"

    # (b2) fresh-checkpoint restart (or a second query sharing the
    # path): epoch ids restart at 0 with DIFFERENT content. The run
    # partition level (content signature) makes this an APPEND — the
    # old (day, epoch)-only layout silently overwrote t1's epoch-0
    # sketches and lost that history.
    write3 = kll_sketch_writer(f"{tmpdir}/sk3")
    write3(t1, 0)
    write3(t2, 0)  # fresh-checkpoint twin: same epoch id, new rows
    n_union = {
        r["key"]: r["n"]
        for r in kll_store_quantiles(spark, f"{tmpdir}/sk3").collect()
    }
    assert n_union == exact_counts, "fresh-checkpoint epoch 0 clobbered history"
    est2 = est

    # (c) rank accuracy per source against exact data, one scan
    est_df = spark.createDataFrame(
        [(k, float(r["p50"]), float(r["p95"])) for k, r in est2.items()],
        "source string, e50 double, e95 double",
    )
    ranks = (
        batch.join(F.broadcast(est_df), "source")
        .groupBy("source")
        .agg(
            (F.count_if(F.col("metric") <= F.col("e50")) / F.count(F.lit(1))).alias("r50"),
            (F.count_if(F.col("metric") <= F.col("e95")) / F.count(F.lit(1))).alias("r95"),
        )
        .collect()
    )
    for r in ranks:
        assert abs(r["r50"] - 0.5) <= 0.025, (r["source"], r["r50"])
        assert abs(r["r95"] - 0.95) <= 0.025, (r["source"], r["r95"])
