"""Central registry of (query builder, DuckDB oracle SQL) pairs.

Every operator module registers its queries here; ``__spark_entry__.py``
exposes the dicts to the driver. Each builder is
``(spark: SparkSession, sf_dir: str) -> DataFrame``; each oracle is ANSI
SQL that DuckDB runs against the same parquet tables (pre-registered
views ``region nation customer supplier part orders lineitem events
documents embeddings``).

Conventions (SURVEY.md §2c):
- every computed column aliased identically in Spark and SQL;
- double aggregates ROUND(..., 2);
- timestamps output as strings (``yyyy-MM-dd HH:mm:ss``) or epoch-second
  BIGINTs — never raw timestamp objects;
- DuckDB integer SUMs cast to BIGINT (DuckDB sums INTEGER into HUGEINT,
  Spark into LONG);
- no NOW()/uuid()/rand(); relative times anchor to (SELECT max(ts) ...).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None):
    """Decorator: register a query builder and (optionally) its oracle SQL.

    Omitting ``oracle`` means the driver records a weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops — approx sketches,
    custom stateful streaming).
    """

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
