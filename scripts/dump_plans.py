#!/usr/bin/env python
"""Dump .explain("formatted") for every registered query to plans/<tag>/.

Usage: python scripts/dump_plans.py <tag> [suffix] [only,names,...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix default "before").
The judge reads these files to check plan-shape claims; regenerate the
"after" set whenever a query's plan changes.
"""

from __future__ import annotations

import os
import sys
import traceback

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

import real_time_event_streaming_analytics_platform_spark as engine
from real_time_event_streaming_analytics_platform_spark.session import SessionFactory


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(_HERE, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = SessionFactory.get("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    fmt = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    names = sorted(engine.QUERIES)
    if only:
        names = [n for n in names if n in only]
    for name in names:
        try:
            df = engine.QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(fmt)
        except Exception:
            plan = "PLAN FAILED:\n" + traceback.format_exc()
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
