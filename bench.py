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

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
