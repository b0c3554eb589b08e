"""Deterministic streaming fixtures (FIXTURES.md §B).

Replayable synthetic events matching the reference producer's shape and
distributions (ingestors/kafka-producer/event_producer.py:47-103): six
sources, metric 95% N(50,15) clipped ≥0 / 5% U(100,500) outliers, status
correlated with metric, per-source extra attributes. Unlike the
reference's wall-clock generator, everything here derives from a fixed
seed and base timestamp so streaming runs are replayable (required for
the S-series parity tests).

Events are written as JSON-lines files — the file stream source is the
test-friendly stand-in for Kafka (same `readStream → from_json` path;
only the `format()` differs in production).
"""

from __future__ import annotations

import json
import os
import random
from datetime import datetime, timedelta, timezone

SOURCES = ("web", "mobile", "api", "device", "service-a", "service-b")
REGIONS = ("us-east", "us-west", "eu-west", "ap-south")
VERSIONS = ("1.0.0", "1.1.0", "2.0.0")

BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _iso(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{dt.microsecond // 1000:03d}Z"


def generate_events(
    n: int,
    seed: int = 42,
    base_ts: datetime = BASE_TS,
    interval_ms: int = 200,
    out_of_order_ms: int = 0,
    outlier_rate: float = 0.05,
) -> list[dict]:
    """n deterministic events, event-time spaced interval_ms apart, with
    optional bounded out-of-orderness (≤ out_of_order_ms jitter)."""
    rng = random.Random(seed)
    events = []
    for i in range(n):
        source = SOURCES[rng.randrange(len(SOURCES))]
        if rng.random() < outlier_rate:
            metric = rng.uniform(100, 500)
        else:
            metric = max(0.0, rng.gauss(50, 15))
        if metric > 100:
            status = rng.choices(["ok", "warning", "error"], weights=[0.3, 0.4, 0.3])[0]
        else:
            status = rng.choices(["ok", "warning", "error"], weights=[0.8, 0.15, 0.05])[0]
        jitter = rng.randint(-out_of_order_ms, 0) if out_of_order_ms else 0
        ts = base_ts + timedelta(milliseconds=i * interval_ms + jitter)
        attrs = {
            "user_id": f"user_{1000 + rng.randrange(9000)}",
            "metric": round(metric, 4),
            "status": status,
            "session_id": f"{rng.randrange(16**8):08x}",
            "region": rng.choice(REGIONS),
            "version": rng.choice(VERSIONS),
        }
        if source == "web":
            attrs |= {"browser": rng.choice(["chrome", "firefox", "safari"]),
                      "page_load_time": round(rng.uniform(0.1, 5.0), 3)}
        elif source == "mobile":
            attrs |= {"platform": rng.choice(["ios", "android"]),
                      "app_version": rng.choice(VERSIONS)}
        elif source == "device":
            attrs |= {"device_type": rng.choice(["sensor", "camera"]),
                      "temperature": round(rng.uniform(15, 35), 1),
                      "battery_level": rng.randrange(101)}
        events.append(
            {
                "event_id": f"{seed:08x}-{i:012d}",
                "source": source,
                "timestamp": _iso(ts),
                "attributes": attrs,
            }
        )
    return events


def write_jsonl(events: list[dict], directory: str, n_files: int = 1, prefix: str = "events") -> list[str]:
    """Split events into n_files JSON-lines files (one file per planned
    micro-batch when replayed with maxFilesPerTrigger=1).

    The file-stream source orders files by modification time; files
    written in the same millisecond batch unpredictably. Each file gets
    an explicit, strictly-increasing mtime (keyed by prefix then index)
    so micro-batch order is deterministic across write calls.
    """
    os.makedirs(directory, exist_ok=True)
    per = (len(events) + n_files - 1) // n_files
    paths = []
    base = 1_600_000_000  # fixed epoch base; only the ordering matters
    for f in range(n_files):
        chunk = events[f * per : (f + 1) * per]
        if not chunk:
            break
        path = os.path.join(directory, f"{prefix}-{f:04d}.jsonl")
        with open(path, "w") as fh:
            for e in chunk:
                fh.write(json.dumps(e) + "\n")
        mtime = base + (ord(prefix[0]) % 64) * 1000 + f
        os.utime(path, (mtime, mtime))
        paths.append(path)
    return paths
