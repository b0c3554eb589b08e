"""Table catalog: loaders for the driver-generated parquet testdata.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``{sf_dir}/{name}.parquet``.

At 100 TB these would be partitioned datasets (events partitioned by
``date(ts)``, lineitem bucketed on join keys); ``spark.read.parquet`` on a
directory is the same code path, so nothing here assumes single-file
inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_utc

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table; forces UTC session TZ (epoch math correctness).

    ``events.ts`` arrives as parquet TIMESTAMP(NANOS): read as long
    (nanosAsLong) and converted to µs TimestampType with exact integer
    division (double division would lose precision at 1.7e18 ns).
    """
    ensure_utc(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    # The nanos→µs conversion is keyed to the ONE table written with
    # TIMESTAMP(NANOS) (events), not sniffed by column name/dtype — a
    # future table with a genuine bigint epoch column named ts must not
    # be silently divided by 1000.
    if name == "events":
        for field in df.schema.fields:
            if field.name == "ts" and field.dataType.simpleString() == "bigint":
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register temp views so query builders can use spark.sql freely."""
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
