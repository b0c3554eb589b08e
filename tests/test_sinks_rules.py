"""Sink formatters (O3/O14/O15), rule matching (O27), retention listing
(O36)."""

import json
import os

import pytest
import shutil
import tempfile

from pyspark.sql import functions as F

from real_time_event_streaming_analytics_platform_spark.serving.rules import make_rules, match_rules
from real_time_event_streaming_analytics_platform_spark.streaming.sinks import (
    alert_payload,
    db_payload,
    expired_partitions,
    redis_payload,
)


from datetime import datetime

_TS = datetime(2024, 1, 1)


def _aggs(spark):
    return spark.createDataFrame(
        [("web", _TS, 10, 50.0, 90.0, 99.0, 0.1, 500.0)],
        "source string, window_start timestamp, count_events long, avg_metric double,"
        "p95_metric double, p99_metric double, error_rate double, sum_metric double",
    )


def test_redis_payload_shape(spark):
    row = redis_payload(_aggs(spark)).first()
    assert row["key"] == "agg:web:1m:2024-01-01T00:00:00Z"
    v = json.loads(row["value"])
    assert v == {
        "count": 10,
        "avg_metric": 50.0,
        "p95_metric": 90.0,
        "p99_metric": 99.0,
        "error_rate": 0.1,
        "sum_metric": 500.0,
    }


def test_db_payload_shape(spark):
    v = json.loads(db_payload(_aggs(spark)).first()["value"])
    assert v["ts"] == "2024-01-01T00:00:00Z" and v["source"] == "web"
    assert set(v) == {
        "ts", "source", "count_events", "avg_metric", "p95_metric",
        "p99_metric", "error_rate",
    }


def test_alert_payload_has_uuid(spark):
    alerts = spark.createDataFrame(
        [("a1", "web", _TS, "z-score", "critical", 410.0, 5.1, 2.0, True)],
        "event_id string, source string, ts timestamp, anomaly_type string,"
        "severity string, value double, z_score double, mad_score double, is_anomaly boolean",
    )
    v = json.loads(alert_payload(alerts).first()["value"])
    assert v["severity"] == "critical" and v["anomaly_type"] == "z-score"
    assert len(v["alert_id"]) == 36  # uuid format


def test_rule_matching(spark):
    alerts = spark.createDataFrame(
        [("e1", "web", "critical"), ("e2", "api", "critical"), ("e3", "web", "info")],
        "event_id string, source string, severity string",
    )
    rules = make_rules(
        spark,
        [
            ("r-all-crit", True, [], "critical"),      # all sources
            ("r-web-crit", True, ["web"], "critical"),  # web only
            ("r-disabled", False, [], "critical"),      # disabled
            ("r-info", True, ["mobile"], "info"),       # wrong source
        ],
    )
    got = {(r["event_id"], r["rule_id"]) for r in match_rules(alerts, rules).collect()}
    assert got == {("e1", "r-all-crit"), ("e1", "r-web-crit"), ("e2", "r-all-crit")}


def test_expired_partitions(spark):
    d = tempfile.mkdtemp(prefix="sgr-ret-")
    try:
        df = spark.createDataFrame(
            [(i, f"2024-01-{day:02d}") for day in (1, 5, 10, 20) for i in range(3)],
            "id long, event_date string",
        )
        df.write.partitionBy("event_date").parquet(f"{d}/t")
        old = expired_partitions(spark, f"{d}/t", keep_days=12)
        assert old == ["2024-01-01", "2024-01-05"]
        assert expired_partitions(spark, f"{d}/t", keep_days=30) == []
        # directory-listing only: a missing table lists as empty, and
        # the listing runs NO Spark job at all (pure FileSystem RPC)
        assert expired_partitions(spark, f"{d}/missing", keep_days=5) == []
        sc = spark.sparkContext
        sc.setJobGroup("retention-listing", "must stay empty")
        try:
            expired_partitions(spark, f"{d}/t", keep_days=12)
            assert list(sc.statusTracker().getJobIdsForGroup("retention-listing")) == []
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
    finally:
        shutil.rmtree(d, ignore_errors=True)

def test_rule_matching_null_sources_matches_all(spark):
    """A NULL sources list means match-all like an empty one (the
    reference treats missing and [] the same, main.py:182)."""
    alerts = spark.createDataFrame(
        [("e1", "web", "critical")], "event_id string, source string, severity string"
    )
    rules = make_rules(spark, [("r-null-crit", True, None, "critical")])
    got = {(r["event_id"], r["rule_id"]) for r in match_rules(alerts, rules).collect()}
    assert got == {("e1", "r-null-crit")}

def test_jdbc_writer_callback_shape():
    """O5: no database in this container, so verify the foreachBatch
    callback drives DataFrameWriter.jdbc with the append-mode contract
    the alert service uses (INSERT INTO anomalies)."""
    from real_time_event_streaming_analytics_platform_spark.streaming.sinks import jdbc_writer

    calls = []

    class FakeWriter:
        def jdbc(self, url, table, mode=None, properties=None):
            calls.append((url, table, mode, properties))

    class FakeDF:
        write = FakeWriter()

    jdbc_writer("jdbc:postgresql://db/metrics", "anomalies", {"user": "svc"})(FakeDF(), 7)
    assert calls == [("jdbc:postgresql://db/metrics", "anomalies", "append", {"user": "svc"})]


def test_expired_partitions_rejects_unpartitioned_table(spark):
    """Silently returning [] on a non-hive-partitioned table would
    disable retention forever; it must fail loudly instead."""
    d = tempfile.mkdtemp(prefix="sgr-ret-flat-")
    try:
        spark.createDataFrame(
            [(1, "2024-01-01")], "id long, event_date string"
        ).write.parquet(f"{d}/flat")
        with pytest.raises(ValueError, match="partition directories"):
            expired_partitions(spark, f"{d}/flat", keep_days=5)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_expired_partitions_skips_hive_default_partition(spark):
    """NULL partition values land in __HIVE_DEFAULT_PARTITION__, which
    sorts after every date — it must neither anchor the max nor crash
    the iso parse."""
    d = tempfile.mkdtemp(prefix="sgr-ret-null-")
    try:
        spark.createDataFrame(
            [(i, day) for day in ("2024-01-01", "2024-01-20", None) for i in range(2)],
            "id long, event_date string",
        ).write.partitionBy("event_date").parquet(f"{d}/t")
        assert expired_partitions(spark, f"{d}/t", keep_days=12) == ["2024-01-01"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_expired_partitions_noop_before_first_commit(spark):
    """A retention job pointed at a sink whose first micro-batch hasn't
    committed yet (only _spark_metadata / staging entries exist) must
    no-op, not crash the maintenance loop; a layout partitioned on a
    DIFFERENT column still fails loudly."""
    d = tempfile.mkdtemp(prefix="sgr-ret-fresh-")
    try:
        os.makedirs(f"{d}/t/_spark_metadata")
        os.makedirs(f"{d}/t/.staging-xyz")
        assert expired_partitions(spark, f"{d}/t", keep_days=5) == []
        # an EMPTY stray subdirectory is still indistinguishable from
        # staging -> no-op
        os.makedirs(f"{d}/t/scratch")
        assert expired_partitions(spark, f"{d}/t", keep_days=5) == []
        # ...but a non-hive subdirectory HOLDING data files is a real
        # layout (bare-date dirs from a non-Spark writer) -> loud
        with open(f"{d}/t/scratch/part-0.parquet", "w") as fh:
            fh.write("x")
        with pytest.raises(ValueError, match="partition directories"):
            expired_partitions(spark, f"{d}/t", keep_days=5)
        os.remove(f"{d}/t/scratch/part-0.parquet")
        # wrong-column hive layout is a misconfiguration, not a fresh sink
        os.makedirs(f"{d}/t/other_col=2024-01-01")
        with pytest.raises(ValueError, match="partition directories"):
            expired_partitions(spark, f"{d}/t", keep_days=5)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_s22_rule_reload_takes_effect_mid_stream(spark):
    """O27 dynamic half: toggling the rules table between micro-batch
    tranches changes matching WITHOUT restarting the stream or its
    checkpoint — the reference's alert service reads rules per
    evaluation (alert-service main.py:66-71), so a disabled rule stops
    firing on the very next event."""
    from datetime import datetime, timezone

    from real_time_event_streaming_analytics_platform_spark.serving.rules import (
        make_rules,
        rule_matching_writer,
    )

    d = tempfile.mkdtemp(prefix="sgr-s22-")
    try:
        ts = datetime(2024, 1, 1, tzinfo=timezone.utc)

        def alert_rows(tag, n):
            return [(f"{tag}-{i}", "web", "critical", ts) for i in range(n)]

        schema = "event_id string, source string, severity string, ts timestamp"
        # rules v1: crit-web enabled, crit-all disabled
        make_rules(
            spark,
            [
                ("crit-web", True, ["web"], "critical"),
                ("crit-all", False, [], "critical"),
            ],
        ).write.mode("overwrite").parquet(f"{d}/rules")

        write = rule_matching_writer(f"{d}/rules", f"{d}/matched")
        spark.createDataFrame(alert_rows("a", 5), schema).write.mode(
            "overwrite"
        ).parquet(f"{d}/alerts")
        stream = spark.readStream.schema(
            spark.read.parquet(f"{d}/alerts").schema
        ).parquet(f"{d}/alerts")
        q = (
            stream.writeStream.foreachBatch(write)
            .option("checkpointLocation", f"{d}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        # rules v2 (same path, same running pipeline semantics): flip
        # both toggles — crit-web off, crit-all on
        make_rules(
            spark,
            [
                ("crit-web", False, ["web"], "critical"),
                ("crit-all", True, [], "critical"),
            ],
        ).write.mode("overwrite").parquet(f"{d}/rules")
        spark.createDataFrame(alert_rows("b", 5), schema).write.mode(
            "append"
        ).parquet(f"{d}/alerts")
        q2 = (
            stream.writeStream.foreachBatch(write)
            .option("checkpointLocation", f"{d}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination()

        got = spark.read.parquet(f"{d}/matched").collect()
        by_rule = {}
        for r in got:
            by_rule.setdefault(r["rule_id"], set()).add(r["event_id"].split("-")[0])
        # tranche a matched only under v1's crit-web; tranche b only
        # under v2's crit-all — no cross-contamination in either
        # direction, and nothing matched twice
        assert by_rule == {"crit-web": {"a"}, "crit-all": {"b"}}, by_rule
        assert len(got) == 10
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_rule_writer_rejects_empty_rules_midswap(spark):
    """A trigger landing inside the non-atomic rules overwrite window
    reads an empty directory as 0 rows (schema'd read succeeds) — the
    writer must FAIL the batch (checkpoint replays it) rather than
    match nothing and silently drop the batch's alerts forever."""
    from datetime import datetime, timezone

    from real_time_event_streaming_analytics_platform_spark.serving.rules import (
        rule_matching_writer,
    )

    d = tempfile.mkdtemp(prefix="sgr-s22e-")
    try:
        os.makedirs(f"{d}/rules")  # mid-swap: directory exists, no files
        batch = spark.createDataFrame(
            [("a-0", "web", "critical", datetime(2024, 1, 1, tzinfo=timezone.utc))],
            "event_id string, source string, severity string, ts timestamp",
        )
        with pytest.raises(RuntimeError, match="read empty"):
            rule_matching_writer(f"{d}/rules", f"{d}/out")(batch, 0)
        assert not os.path.exists(f"{d}/out")
    finally:
        shutil.rmtree(d, ignore_errors=True)
