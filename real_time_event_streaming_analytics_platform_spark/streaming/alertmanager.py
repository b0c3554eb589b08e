"""Alertmanager webhook ingestion — infrastructure alerts join the
alert path.

Engine twin of the reference alert service's ``POST /webhook/alerts``
(services/alert-service/main.py:408-435): an Alertmanager webhook
payload carries a batch of firing/resolved alerts; each is normalized
into the service's ``AlertPayload`` shape (``alert_id`` ←
``fingerprint``, ``source`` ← ``labels.instance``, ``severity`` ←
``labels.severity`` defaulting to ``warning``, ``description`` ←
``annotations.summary`` defaulting to ``'Infrastructure alert'``,
``anomaly_type='infrastructure'``, zeroed score fields,
``is_anomaly=True``) and fed through the same rule-match → cooldown →
notify pipeline as detector alerts.

Spark-first shape: the payload is just another JSON source —
``from_json`` with an explicit schema, ``explode`` of the ``alerts``
array, pure column expressions for the normalization. No Python on the
data path, so the same code ingests webhooks at any rate from a file
drop, a Kafka topic of webhook bodies, or a socket source.

Timestamp semantics: the reference stamps every ingested alert with
``datetime.utcnow()`` (main.py:419) — processing time. Batch/replay
determinism matters more to this engine than wall-clock fidelity, so
``parse_webhook`` defaults to the alert's own ``startsAt`` (event
time, what Alertmanager itself considers the firing instant) and
offers ``ts_mode='processing'`` for the reference's literal behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# Alertmanager v4 webhook body (prometheus/alertmanager
# template/template.go Data) — the subset the reference reads, plus the
# envelope fields its WebhookAlert model validates (main.py:408-412).
ALERT_STRUCT = StructType(
    [
        StructField("status", StringType()),
        StructField("labels", MapType(StringType(), StringType())),
        StructField("annotations", MapType(StringType(), StringType())),
        StructField("startsAt", StringType()),
        StructField("endsAt", StringType()),
        StructField("generatorURL", StringType()),
        StructField("fingerprint", StringType()),
    ]
)

WEBHOOK_SCHEMA = StructType(
    [
        StructField("version", StringType()),
        StructField("groupKey", StringType()),
        StructField("status", StringType()),
        StructField("receiver", StringType()),
        StructField("groupLabels", MapType(StringType(), StringType())),
        StructField("commonLabels", MapType(StringType(), StringType())),
        StructField("commonAnnotations", MapType(StringType(), StringType())),
        StructField("externalURL", StringType()),
        StructField("alerts", ArrayType(ALERT_STRUCT)),
    ]
)


def parse_webhook(
    payloads: DataFrame,
    payload_col: str = "value",
    ts_mode: str = "event",
    firing_only: bool = False,
) -> DataFrame:
    """Webhook JSON bodies → normalized alert rows (one per alert).

    Malformed bodies (from_json → null) and payloads whose alerts array
    is null drop at the explode — the reference returns an HTTP 422 for
    these at its endpoint (ASVC:410-415), so the loss is pre-ingestion
    there too. A deployment that needs the quarantine audit trail wires
    the payload stream through the same classify/dlq pattern as events
    (streaming/entries.classify_events) before this parse.

    Works identically on a batch DataFrame and a streaming one (the
    plan is pure stateless projection, so it runs under any output
    mode). ``firing_only=True`` drops ``status='resolved'`` alerts —
    the reference forwards both, but resolved alerts carry
    ``is_anomaly=True`` there only as a modeling quirk.
    """
    if ts_mode not in ("event", "processing"):
        raise ValueError(f"ts_mode must be 'event' or 'processing', got {ts_mode!r}")

    parsed = payloads.withColumn("_wh", F.from_json(F.col(payload_col), WEBHOOK_SCHEMA))
    alerts = parsed.select(
        F.col("_wh.receiver").alias("receiver"),
        F.col("_wh.status").alias("group_status"),
        F.explode("_wh.alerts").alias("_a"),
    )
    if firing_only:
        alerts = alerts.filter(F.col("_a.status") == "firing")
    # try_to_timestamp + processing-time fallback (the entries.py parse
    # convention): under ANSI the plain to_timestamp THROWS on one
    # malformed startsAt, and the restart replays the same line — a
    # permanent crash loop. A null/absent startsAt likewise must not
    # emit a null ts (NaT kills the stateful cooldown downstream).
    ts = (
        F.coalesce(
            F.try_to_timestamp(F.col("_a.startsAt")), F.current_timestamp()
        )
        if ts_mode == "event"
        else F.current_timestamp()
    )
    # Field-for-field the reference's AlertPayload construction
    # (main.py:416-428).
    return alerts.select(
        F.coalesce(F.col("_a.fingerprint"), F.lit("unknown")).alias("alert_id"),
        F.coalesce(F.col("_a.labels")["instance"], F.lit("unknown")).alias("source"),
        ts.alias("ts"),
        F.lit("infrastructure").alias("anomaly_type"),
        F.coalesce(F.col("_a.labels")["severity"], F.lit("warning")).alias("severity"),
        F.lit(0.0).alias("value"),
        F.lit(0.0).alias("threshold"),
        F.lit(0.0).alias("z_score"),
        F.coalesce(
            F.col("_a.annotations")["summary"], F.lit("Infrastructure alert")
        ).alias("description"),
        F.lit(True).alias("is_anomaly"),
        F.col("_a.status").alias("alert_status"),
    )


def to_cooldown_input(alerts: DataFrame) -> DataFrame:
    """Project normalized webhook alerts onto the detector-alert columns
    the cooldown/notify stages key on (anomaly.py cooldown contract:
    source, severity, event_id, ts). Infrastructure and detector alerts
    union cleanly after this."""
    return alerts.select(
        F.col("source"),
        F.col("severity"),
        F.col("alert_id").alias("event_id"),
        F.col("ts"),
    )
