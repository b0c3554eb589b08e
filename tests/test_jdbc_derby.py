"""O5 — JDBC sink against a REAL database.

The reference inserts every alert into PostgreSQL/TimescaleDB
(services/alert-service/main.py:204-230). No PostgreSQL exists in this
container, but Spark ships Apache Derby on its classpath (for the Hive
metastore), and Derby's embedded driver is a fully ANSI-transactional
JDBC database — so the engine's JDBC write path (`jdbc_writer`, the
generic DataFrameWriter.jdbc contract) is exercised here end-to-end
against actual SQL storage: batch append + read-back, then the
streaming foreachBatch path across multiple micro-batches.

Production swaps only the URL/driver pair for PostgreSQL; the Spark
code path (JdbcUtils savePartition: executor-side batched INSERTs, one
connection per partition) is identical.
"""

import os

import pytest
from pyspark.sql import functions as F

from real_time_event_streaming_analytics_platform_spark.streaming.sinks import jdbc_writer

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_home(spark, tmp_path_factory):
    """Point derby.system.home at a scratch dir so derby.log and the
    database files never land in the repo."""
    home = str(tmp_path_factory.mktemp("derby"))
    spark._jvm.java.lang.System.setProperty("derby.system.home", home)
    return home


def test_jdbc_batch_roundtrip(spark, sf_dir, derby_home):
    """Batch write of real events into Derby, read back via JDBC scan,
    assert exact row/content equality with the source."""
    url = "jdbc:derby:memory:roundtrip;create=true"
    src = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "value")
        .limit(500)
    )
    expected = sorted(tuple(r) for r in src.collect())

    src.write.jdbc(url, "alerts", mode="overwrite", properties=DERBY_PROPS)
    back = spark.read.jdbc(url, "alerts", properties=DERBY_PROPS)
    got = sorted(tuple(r) for r in back.select("event_id", "user_id", "value").collect())
    assert got == expected
    assert len(got) == 500


def test_jdbc_append_accumulates(spark, derby_home):
    """append mode must add rows, not replace them (the alert service's
    INSERT INTO anomalies contract)."""
    url = "jdbc:derby:memory:appends;create=true"
    df = spark.range(10).select(F.col("id").cast("long").alias("n"))
    df.write.jdbc(url, "t", mode="overwrite", properties=DERBY_PROPS)
    df.write.jdbc(url, "t", mode="append", properties=DERBY_PROPS)
    assert spark.read.jdbc(url, "t", properties=DERBY_PROPS).count() == 20


def test_jdbc_writer_streams_into_derby(spark, derby_home, tmp_path):
    """The engine's actual foreachBatch callback (`jdbc_writer`) drives a
    file stream into Derby across multiple micro-batches; every row must
    be present exactly once after the stream drains."""
    url = "jdbc:derby:memory:streamdb;create=true"
    # Seed the table so append has a schema to land in.
    spark.createDataFrame([], "v bigint, batch string").write.jdbc(
        url, "stream_alerts", mode="overwrite", properties=DERBY_PROPS
    )

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    for part, lo in (("a", 0), ("b", 20)):
        spark.range(lo, lo + 20).selectExpr("id AS v").coalesce(1).write.json(
            str(src_dir / part)
        )

    stream = (
        spark.readStream.schema("v bigint")
        .option("maxFilesPerTrigger", "1")
        .json(str(src_dir / "*"))
        .select(F.col("v"), F.lit("s").alias("batch"))
    )
    q = (
        stream.writeStream.foreachBatch(jdbc_writer(url, "stream_alerts", DERBY_PROPS))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    back = spark.read.jdbc(url, "stream_alerts", properties=DERBY_PROPS)
    vals = [r.v for r in back.collect()]
    assert len(vals) == len(set(vals)), "duplicate rows written by replay"
    assert set(vals) == set(range(40))
