#!/usr/bin/env python
"""Benchmark harness: runs the registered headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock across all benchmarked queries
(lower is better); per-query seconds are in ``queries``. Each query is
fully executed (``collect`` via count on the final plan) so the timing
covers scan → shuffle → result, not plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import real_time_event_streaming_analytics_platform_spark as engine
from real_time_event_streaming_analytics_platform_spark.session import SessionFactory


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = SessionFactory.get("bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # parse sf from the directory name (".../sf0.1" -> 0.1)
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = None

    # Warmup: pay JVM/codegen/parquet-footer cold-start outside the timings
    # so the alphabetically-first query isn't charged ~5s of session init.
    names = sorted(engine.QUERIES)
    if names:
        try:
            engine.QUERIES[names[0]](spark, sf_dir).count()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name in names:
        fn = engine.QUERIES[name]
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            df.count()  # force full execution of the final plan
            timings[name] = round(time.monotonic() - t0, 3)
        except Exception as exc:  # keep benching; a broken query reads as absent
            print(f"bench: {name} failed: {exc!r}", file=sys.stderr)

    extras = _bench_slo(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "slo": extras,
            }
        )
    )


def _bench_slo(spark, sf_dir: str) -> dict:
    """SLO-comparable numbers against BASELINE.md: serving-path latencies
    (/kpi <=0.150s hot, /series <0.5s, /alerts <0.2s targets) and ingest
    events/sec (>=5000 target). Serving latencies are measured on warm
    (cached) tables — the baseline's hot path reads Redis/indexed rows,
    ours reads an in-memory table; the cold full-scan cost is what the
    r-series timings above capture."""
    import tempfile

    from pyspark.sql import functions as F

    from real_time_event_streaming_analytics_platform_spark.catalog import load
    from real_time_event_streaming_analytics_platform_spark.serving import kpi, series, alerts
    from real_time_event_streaming_analytics_platform_spark.sources.fixtures import (
        generate_events,
        write_jsonl,
    )
    from real_time_event_streaming_analytics_platform_spark.streaming.entries import (
        parse_events,
        read_event_stream,
    )

    out: dict[str, float] = {}
    try:
        events = (
            load(spark, sf_dir, "events")
            .select(
                "event_id",
                "ts",
                F.col("event_type").alias("source"),
                F.col("value").alias("metric"),
            )
            .cache()
        )
        events.count()  # warm the cache (the "hot store" stand-in)

        hot = (
            events.groupBy(
                "source", F.date_trunc("minute", "ts").alias("window_start")
            )
            .agg(F.count("*").alias("count_events"), F.avg("metric").alias("avg_metric"))
            .withColumn("window", F.lit("1m"))
            .cache()
        )
        hot.count()

        def steady(fn) -> float:
            """Second-run latency: the baseline SLOs are steady-state p95
            of a serving process, so exclude one-time plan compilation."""
            fn()
            t0 = time.monotonic()
            fn()
            return round(time.monotonic() - t0, 3)

        out["kpi_p50_sec"] = steady(lambda: kpi(hot, window="1m", limit=100).collect())
        out["series_sec"] = steady(lambda: series(events, agg="avg").collect())
        scored = events.select(
            "event_id",
            "ts",
            "source",
            F.when(F.col("metric") > 400, "critical").otherwise("info").alias("severity"),
        )
        out["alerts_sec"] = steady(
            lambda: alerts(scored, severity="critical", limit=1000).collect()
        )
        events.unpersist()
        hot.unpersist()

        # ingest throughput: parse+flatten+watermark over generated JSONL
        n = 50_000
        d = tempfile.mkdtemp(prefix="sgr-bench-ingest-")
        write_jsonl(generate_events(n, seed=13, interval_ms=20), f"{d}/in", n_files=4)
        raw = spark.read.text(f"{d}/in").withColumnRenamed("value", "raw")
        t0 = time.monotonic()
        parsed_n = parse_events(raw).count()
        dt = time.monotonic() - t0
        out["ingest_events_per_sec"] = round(parsed_n / dt)
    except Exception as exc:  # SLO extras must never break the bench line
        print(f"bench: slo extras failed: {exc!r}", file=sys.stderr)
    return out


if __name__ == "__main__":
    main()
