"""Notification fan-out — the last mile of the alert path (O28).

Engine twin of the reference alert service's channel dispatch
(services/alert-service/main.py:232-330): a post-cooldown alert fans
out to the configured channels (email / Slack / custom webhooks), each
with the reference's message shape. The reference's own channel senders
are transport stubs (they log "Would send ..." and bump a counter), so
the transport here is an injected callable with the same default
behavior — production swaps in SMTP/HTTP without touching the dataflow.

Architecture: a ``foreachBatch`` sink downstream of ``cooldown_stream``
(anomaly.py). Side-effecting sinks must tolerate micro-batch REPLAY
(Structured Streaming re-runs an epoch after a failure/restart), so
delivery is made idempotent per epoch with a done-marker file — the
standard transactional-sink pattern; a replayed epoch is skipped whole.

Scale note: the per-batch ``collect()`` is bounded BY CONSTRUCTION —
cooldown emits at most one alert per (source, severity) per
COOLDOWN_SECONDS, so batch size is capped by the key-space, not the
event rate. The reference processes the same stream one Kafka message
at a time in a single asyncio service; this sink is at least as
scalable.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, Row

logger = logging.getLogger(__name__)

# services/alert-service/main.py:281-285
SLACK_COLORS = {"critical": "#FF0000", "warning": "#FFA500", "info": "#00FF00"}


@dataclass
class NotifierConfig:
    """Channel switches — twin of the reference NotificationConfig
    (services/alert-service/main.py:56-64, same defaults)."""

    email_enabled: bool = True
    email_recipients: list[str] = field(default_factory=list)
    slack_enabled: bool = False
    slack_webhook_url: str | None = None
    webhook_enabled: bool = True
    custom_webhooks: list[str] = field(default_factory=list)


def _alert_dict(row: Row) -> dict:
    d = row.asDict()
    ts = d.get("ts")
    if ts is not None:
        d["ts"] = ts.isoformat()
    return d


def email_message(alert: dict, recipients: list[str]) -> dict:
    """Subject/body shape of ASVC:250-271."""
    body = "Alert Details:\n" + "\n".join(
        f"- {k}: {v}" for k, v in sorted(alert.items())
    )
    return {
        "channel": "email",
        "to": list(recipients),
        "subject": f"{alert['severity'].upper()} Alert: {alert['source']}",
        "body": body,
        "alert_id": alert["event_id"],
    }


def slack_message(alert: dict, webhook_url: str) -> dict:
    """Attachment shape of ASVC:278-300 (color by severity, field list)."""
    return {
        "channel": "slack",
        "url": webhook_url,
        "payload": {
            "attachments": [
                {
                    "color": SLACK_COLORS.get(alert["severity"], "#808080"),
                    "title": f"{alert['severity'].upper()} Alert: {alert['source']}",
                    "fields": [
                        {"title": k, "value": str(v), "short": True}
                        for k, v in sorted(alert.items())
                    ],
                }
            ]
        },
        "alert_id": alert["event_id"],
    }


def webhook_message(alert: dict, webhook_url: str) -> dict:
    """Raw JSON payload shape of ASVC:307-325."""
    return {
        "channel": "webhook",
        "url": webhook_url,
        "payload": dict(alert),
        "alert_id": alert["event_id"],
    }


def fan_out(alert: dict, config: NotifierConfig) -> list[dict]:
    """All channel messages one alert produces under ``config`` —
    the dispatch table of ASVC:232-247."""
    out: list[dict] = []
    if config.email_enabled and config.email_recipients:
        out.append(email_message(alert, config.email_recipients))
    if config.slack_enabled and config.slack_webhook_url:
        out.append(slack_message(alert, config.slack_webhook_url))
    if config.webhook_enabled:
        for url in config.custom_webhooks:
            out.append(webhook_message(alert, url))
    return out


def log_transport(message: dict) -> None:
    """Default transport: the reference's own channel senders only log
    ("Would send ..." — ASVC:271,302,325); so does the default here."""
    logger.info(
        "Would send %s notification for alert %s",
        message["channel"],
        message["alert_id"],
    )


class RecordedTransport:
    """Capturing transport for tests/dry-runs: every message appended,
    nothing sent."""

    def __init__(self) -> None:
        self.sent: list[dict] = []

    def __call__(self, message: dict) -> None:
        self.sent.append(message)


def notifier_sink(
    alerts: DataFrame,
    config: NotifierConfig,
    transport: Callable[[dict], None] = log_transport,
    delivery_log: str | None = None,
):
    """foreachBatch writer fanning post-cooldown alerts out to the
    configured channels. ``delivery_log`` (a directory) makes delivery
    idempotent across micro-batch replays: an epoch whose done-marker
    exists is skipped whole, so a restart that replays epoch N cannot
    re-notify. Returns a DataStreamWriter; the caller starts it with
    its own checkpoint (pair ``delivery_log`` with that checkpoint).
    """
    if delivery_log is not None:
        os.makedirs(delivery_log, exist_ok=True)

    def _deliver(batch_df: DataFrame, epoch_id: int) -> None:
        deliver_batch(batch_df, epoch_id, config, transport, delivery_log)

    return alerts.writeStream.foreachBatch(_deliver)


def deliver_batch(
    batch_df: DataFrame,
    epoch_id: int,
    config: NotifierConfig,
    transport: Callable[[dict], None],
    delivery_log: str | None,
) -> int:
    """One micro-batch's fan-out; returns messages sent (0 for a
    replayed epoch). Split from ``notifier_sink`` so the replay
    idempotence contract is directly testable.

    Delivery semantics, precisely: exactly-once per COMPLETED epoch —
    the done-marker is written (atomically, tmp+rename) only after every
    transport call returned, so a replay of a completed epoch sends
    nothing. A crash MID-epoch leaves no marker and the replay re-sends
    the whole epoch: messages already delivered before the crash go out
    twice. That residue is inherent to side-effecting sinks without a
    transactional transport; receivers needing strict exactly-once must
    dedup on the (alert_id, rule) key each message carries."""
    # One collect serves every path (bounded: post-cooldown key-space
    # cap). A replayed completed epoch DOES pay this collect — that is
    # the price of the content-signature collision guard below; replays
    # are rare (restart recovery only), and the hash itself is computed
    # lazily: on the replay path for the compare, otherwise not until
    # the marker write after delivery.
    rows = batch_df.collect()

    def _sig() -> str:
        # content signature guards against epoch-id collisions: a stream
        # restarted from a FRESH checkpoint (or a second query sharing
        # this delivery_log) restarts epochs at 0, and a marker keyed by
        # epoch id alone would silently suppress its real alerts. Same
        # epoch id + same alert set ⇒ genuine replay, skip; same id +
        # different content ⇒ a different logical epoch, deliver.
        import hashlib

        return hashlib.sha256(
            "\n".join(sorted(f"{r['event_id']}|{r['ts']}" for r in rows)).encode()
        ).hexdigest()

    marker = None
    sig = None
    if delivery_log is not None:
        os.makedirs(delivery_log, exist_ok=True)
        marker = os.path.join(delivery_log, f"epoch-{epoch_id}.done")
        if os.path.exists(marker):
            sig = _sig()
            try:
                with open(marker) as fh:
                    if json.load(fh).get("sig") == sig:
                        return 0  # replayed epoch: already delivered
            except (OSError, ValueError):
                pass  # unreadable marker: deliver and rewrite
    delivered = 0
    for row in rows:
        for message in fan_out(_alert_dict(row), config):
            transport(message)
            delivered += 1
    if marker is not None:
        if sig is None:
            sig = _sig()
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"epoch": epoch_id, "delivered": delivered, "sig": sig}, fh)
        os.replace(tmp, marker)
        # bounded marker retention: a replay can only reach epochs the
        # checkpoint still retains, so markers far older than the current
        # epoch are dead weight (a 10 s trigger writes ~3M files/year
        # into one directory otherwise). Pruned opportunistically, far
        # past any plausible replay horizon.
        if epoch_id > 0 and epoch_id % 1000 == 0:
            horizon = epoch_id - 10_000
            for name in os.listdir(delivery_log):
                if name.startswith("epoch-") and name.endswith(".done"):
                    try:
                        if int(name[6:-5]) < horizon:
                            os.remove(os.path.join(delivery_log, name))
                    except (ValueError, OSError):
                        pass
    return delivered
