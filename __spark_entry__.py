"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Importing the engine package populates its query registry as a side
effect; we expose copies of the registry dicts so the driver owns its
iteration order.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import real_time_event_streaming_analytics_platform_spark as engine
from real_time_event_streaming_analytics_platform_spark.session import ensure_utc


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (R3 /series minute aggregation) on sf0.001.

    The driver passes its own SparkSession, so force the session confs
    the catalog depends on (UTC timezone, parquet nanosAsLong) before
    reading.
    """
    ensure_utc(spark)
    return engine.QUERIES["r3_series_minute"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame; every
    computed column is aliased identically in the Spark plan and the
    oracle SQL. Builders call ``ensure_utc`` via ``catalog.load``.
    """
    return dict(engine.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query.

    Keys absent here but present in ``queries()`` are genuinely
    non-SQL-expressible ops (approx sketches, stateful streaming) —
    the driver records a weaker rows-only check for those.
    """
    return dict(engine.ORACLE)
