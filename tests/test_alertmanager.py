"""Alertmanager webhook ingestion (alert-service main.py:408-435).

The oracle-backed round-trip is r16_alertmanager_ingest (covered by
test_oracle_queries); these tests pin the normalization defaults and
the streaming-compatible behaviors the oracle can't express.
"""

import json

import pytest
from pyspark.sql import functions as F

from real_time_event_streaming_analytics_platform_spark.streaming.alertmanager import (
    parse_webhook,
    to_cooldown_input,
)


def _payload(alerts, status="firing"):
    return json.dumps(
        {
            "version": "4",
            "groupKey": "{}:{}",
            "status": status,
            "receiver": "spark-engine",
            "groupLabels": {},
            "commonLabels": {},
            "commonAnnotations": {},
            "externalURL": "http://alertmanager:9093",
            "alerts": alerts,
        }
    )


FULL = {
    "status": "firing",
    "labels": {"instance": "host-3", "severity": "critical", "job": "node"},
    "annotations": {"summary": "CPU above 90%", "description": "long text"},
    "startsAt": "2024-01-05T10:20:30.000000",
    "endsAt": "0001-01-01T00:00:00Z",
    "fingerprint": "abc123",
}
BARE = {"status": "resolved", "labels": {}, "annotations": {}}


def test_parse_full_and_defaults(spark):
    df = spark.createDataFrame([(_payload([FULL, BARE]),)], ["value"])
    rows = {r.alert_id: r for r in parse_webhook(df).collect()}
    full = rows["abc123"]
    assert full.source == "host-3"
    assert full.severity == "critical"
    assert full.description == "CPU above 90%"
    assert full.anomaly_type == "infrastructure"
    assert full.is_anomaly is True
    assert full.value == 0.0 and full.z_score == 0.0 and full.threshold == 0.0
    assert full.ts.isoformat().startswith("2024-01-05T10:20:30")
    # main.py:417-427 .get(...) defaults
    bare = rows["unknown"]
    assert bare.source == "unknown"
    assert bare.severity == "warning"
    assert bare.description == "Infrastructure alert"


def test_firing_only_drops_resolved(spark):
    df = spark.createDataFrame([(_payload([FULL, BARE]),)], ["value"])
    got = parse_webhook(df, firing_only=True).collect()
    assert [r.alert_id for r in got] == ["abc123"]
    assert all(r.alert_status == "firing" for r in got)


def test_processing_time_mode(spark):
    df = spark.createDataFrame([(_payload([FULL]),)], ["value"])
    row = parse_webhook(df, ts_mode="processing").collect()[0]
    assert row.ts is not None and row.ts.year >= 2024


def test_invalid_ts_mode_rejected(spark):
    df = spark.createDataFrame([(_payload([FULL]),)], ["value"])
    with pytest.raises(ValueError, match="ts_mode"):
        parse_webhook(df, ts_mode="wallclock")


def test_cooldown_projection_unions_with_detector_alerts(spark):
    """Infrastructure alerts must be union-compatible with the detector
    cooldown contract (source, severity, event_id, ts) so both kinds
    flow through the same cooldown → notifier path."""
    df = spark.createDataFrame([(_payload([FULL]),)], ["value"])
    infra = to_cooldown_input(parse_webhook(df))
    detector = spark.createDataFrame(
        [("api", "critical", "ev-1", "2024-01-05 10:00:00")],
        "source string, severity string, event_id string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    both = detector.unionByName(infra)
    assert both.count() == 2
    assert both.columns == ["source", "severity", "event_id", "ts"]


def test_parse_is_streaming_safe(spark, tmp_path):
    """The same plan must run as a streaming query (stateless projection
    ⇒ append mode, no watermark needed)."""
    src = tmp_path / "in"
    src.mkdir()
    (src / "p.json").write_text(json.dumps({"value": _payload([FULL, BARE])}) + "\n")
    stream = spark.readStream.schema("value string").json(str(src))
    out = parse_webhook(stream, firing_only=True)
    q = (
        out.writeStream.format("memory")
        .queryName("am_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT alert_id, source FROM am_stream").collect()
    assert [(r.alert_id, r.source) for r in got] == [("abc123", "host-3")]


def test_s15_infrastructure_alert_full_path(spark, tmp_path):
    """End-to-end: webhook bodies stream in → parse → cooldown →
    notifier. Three firing alerts for the same (host, severity): the
    second lands inside the 300 s cooldown (suppressed), the third
    outside it (delivered) — so the recorded transport must see exactly
    two alerts, on every enabled channel."""
    from real_time_event_streaming_analytics_platform_spark.streaming.anomaly import (
        cooldown_stream,
    )
    from real_time_event_streaming_analytics_platform_spark.streaming.notify import (
        NotifierConfig,
        RecordedTransport,
        notifier_sink,
    )

    def alert(fp, starts):
        return {
            "status": "firing",
            "labels": {"instance": "host-1", "severity": "critical"},
            "annotations": {"summary": "disk full"},
            "startsAt": starts,
            "fingerprint": fp,
        }

    src = tmp_path / "in"
    src.mkdir()
    (src / "w.json").write_text(
        "\n".join(
            json.dumps({"value": _payload([a])})
            for a in (
                alert("f1", "2024-01-01T00:00:00.000000"),
                alert("f2", "2024-01-01T00:00:10.000000"),  # in cooldown
                alert("f3", "2024-01-01T00:06:00.000000"),  # past cooldown
            )
        )
        + "\n"
    )

    stream = spark.readStream.schema("value string").json(str(src))
    passed = cooldown_stream(
        to_cooldown_input(parse_webhook(stream, firing_only=True))
    )
    transport = RecordedTransport()
    config = NotifierConfig(
        email_enabled=True,
        email_recipients=["ops@example.com"],
        webhook_enabled=True,
        custom_webhooks=["http://hooks.internal/alerts"],
    )
    q = (
        notifier_sink(passed, config, transport, str(tmp_path / "dlog"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    by_channel = {}
    for m in transport.sent:
        by_channel.setdefault(m["channel"], []).append(m)
    assert set(by_channel) == {"email", "webhook"}
    for channel, msgs in by_channel.items():
        ids = {m["alert_id"] for m in msgs}
        assert ids == {"f1", "f3"}, (channel, ids)
