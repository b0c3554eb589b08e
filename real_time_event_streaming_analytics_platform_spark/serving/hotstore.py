"""In-process hot KV store — the serving-side Redis twin (O7/O29).

The reference's /kpi never touches a query engine: the aggregation job
SETs ``agg:{source}:{window}:{window_start}`` keys in Redis with a TTL
(streaming-jobs EventAggregationJob.java:277-292), and the read API
scans matching keys, parses the JSON values, sorts newest-first and
returns the top 100 (services/read-api/main.py:228-291). That is why
its SLO target (150 ms) sits below any engine's per-job floor — it is
a key-value GET path, not a query.

This module is that path for the Spark engine: a thread-safe
dict-backed store maintained by a ``foreachBatch`` callback downstream
of the sliding-aggregate stream, read in O(matching keys) with zero
Spark jobs. Per-trigger write volume is bounded BY CONSTRUCTION —
one row per (source, window) per emitted window_start, i.e. the
key-space, not the event rate — so the ``collect()`` inside the writer
is safe at any ingest volume (the same argument, and the same data, as
the reference's Redis writer).

Production notes: swap ``HotStore`` for a real Redis client by
replacing ``set``/``scan`` — the callback and serving code are
transport-agnostic. On a multi-executor cluster the foreachBatch body
runs on the driver, exactly like the reference's job→Redis writer runs
in one process; the store itself would be the shared Redis.

Clock: injectable (``now_fn``) so TTL behavior is deterministic in
tests; defaults to wall clock like Redis EXPIRE.
"""

from __future__ import annotations

import threading
import time
from typing import Callable

from pyspark.sql import DataFrame

# EventAggregationJob.java:285 — the aggregation job's Redis TTL.
DEFAULT_TTL_SECONDS = 3600


class HotStore:
    """agg:{source}:{window}:{window_start} → metrics dict, with TTL."""

    def __init__(self, now_fn: Callable[[], float] | None = None) -> None:
        self._data: dict[tuple[str, str, str], tuple[float, dict]] = {}
        self._lock = threading.Lock()
        self._now = now_fn or time.time

    # -- write side (the aggregation job's Redis SETEX) ------------------

    def set(
        self,
        source: str,
        window: str,
        window_start,
        value: dict,
        ttl_seconds: int = DEFAULT_TTL_SECONDS,
    ) -> None:
        key = (source, window, str(window_start))
        expiry = self._now() + ttl_seconds
        with self._lock:
            self._data[key] = (expiry, value)

    def upsert_writer(
        self, window: str = "1m", ttl_seconds: int = DEFAULT_TTL_SECONDS
    ):
        """foreachBatch callback: upsert each micro-batch's aggregate rows.

        Expects the metrics_1min shape produced by
        ``streaming.entries.sliding_aggregates`` (source, window_start,
        count_events, avg_metric, p95_metric, error_rate, ...). Rows per
        batch are bounded by the (source × window_start) key-space.
        """

        def write(batch_df: DataFrame, batch_id: int) -> None:
            cols = set(batch_df.columns)
            metric_cols = [
                c
                for c in ("count_events", "avg_metric", "p95_metric", "error_rate")
                if c in cols
            ]
            for row in batch_df.collect():
                d = row.asDict()
                self.set(
                    d["source"],
                    window,
                    d["window_start"],
                    {c: d[c] for c in metric_cols},
                    ttl_seconds,
                )

        return write

    # -- read side (read-api main.py:228-291) ----------------------------

    def kpi(
        self,
        source: str | None = None,
        window: str = "1m",
        limit: int = 100,
    ) -> list[dict]:
        """Newest-first matching entries, expired keys dropped — the
        /kpi handler: KEYS agg:{source or *}:{window}:*, parse, sort by
        timestamp desc, top ``limit``."""
        now = self._now()
        with self._lock:
            items = [
                (k, v)
                for k, (exp, v) in self._data.items()
                if exp > now
                and k[1] == window
                and (source is None or k[0] == source)
            ]
        # window_start desc, source asc — the same total order as the
        # engine-path kpi(); without the source tie-break, same-timestamp
        # entries (one per source per window) would surface and cut at
        # the limit in dict-insertion order.
        items.sort(key=lambda kv: kv[0][0])
        items.sort(key=lambda kv: kv[0][2], reverse=True)
        return [
            {"source": k[0], "window": k[1], "window_start": k[2], **v}
            for k, v in items[:limit]
        ]

    def purge_expired(self) -> int:
        """Drop expired keys (Redis does this lazily too); returns count."""
        now = self._now()
        with self._lock:
            dead = [k for k, (exp, _) in self._data.items() if exp <= now]
            for k in dead:
                del self._data[k]
        return len(dead)

    def __len__(self) -> int:
        return len(self._data)
