"""Structured Streaming layer: event source + parse + watermark +
windowed aggregates (entries), stateful anomaly detection and cooldown
dedup (anomaly)."""
