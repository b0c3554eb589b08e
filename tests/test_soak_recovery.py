"""S20 hard-crash recovery + S21 streaming soak (VERDICT r05 #4/#5).

S20: the reference claims consumer CRASH recovery (reference README.md:
16), which is stronger than S6's graceful stop/restart. Here the ingest
pipeline runs in a subprocess and is SIGKILLed mid-epoch at three
different kill points; a restart from the same checkpoint must recover
to EXACTLY the no-crash row-set — nothing lost, nothing duplicated.
The guarantee under test is the file sink's manifest commit protocol:
an epoch killed after writing part files but before the _spark_metadata
commit leaves orphans that the batch reader (MetadataLogFileIndex)
never surfaces, and the replayed epoch re-emits the rows exactly once.

S21: the reference's soak SLO (BASELINE.md — 30-min sustained load)
distilled to its falsifiable core: under a sustained synthetic stream,
(a) the sliding-aggregate operator's state-store rows PLATEAU (the
watermark actually evicts closed windows — without eviction state
grows linearly and a 30-min soak OOMs), (b) watermark lag stays
bounded, (c) the per-source anomaly state stays at exactly the source
key-space, and (d) the HotStore holds at most the upserted key-space.
Duration defaults to ~SOAK_SECONDS_DEFAULT s so the suite stays
runnable; set SPARK_GRAFT_SOAK_SECONDS=1800 for the full-length soak —
the assertions are duration-independent by construction.
"""

from __future__ import annotations

import os
import random
import shutil
import signal
import subprocess
import sys
import tempfile
import time
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from real_time_event_streaming_analytics_platform_spark.sources.fixtures import (
    generate_events,
    write_jsonl,
)

_HERE = os.path.dirname(os.path.abspath(__file__))
SOAK_SECONDS_DEFAULT = 75


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="sgr-soak-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _worker(mode: str, in_dir: str, out_dir: str, ck_dir: str, **popen_kw):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(_HERE)
    # own process group, so the kill can take out the Spark JVM child
    # with SIGKILL too — killing only the Python driver would let the
    # JVM exit through PythonGatewayServer's orderly stdin-EOF path
    # (System.exit + shutdown hooks), a softer crash than claimed
    return subprocess.Popen(
        [
            sys.executable,
            os.path.join(_HERE, "_crash_stream_worker.py"),
            mode,
            in_dir,
            out_dir,
            ck_dir,
        ],
        env=env,
        start_new_session=True,
        **popen_kw,
    )


def test_s20_sigkill_midrun_recovers_exactly_once(spark, tmpdir):
    n = 400
    events = generate_events(n, seed=31, interval_ms=100)
    write_jsonl(events, f"{tmpdir}/in", n_files=40)

    # three kill points, pinned by seed so failures reproduce; the run
    # worker processes one file per micro-batch, so these delays land
    # in the middle of the 40-epoch run, not after it
    rng = random.Random(20)
    delays = [round(rng.uniform(2.0, 7.0), 1) for _ in range(3)]
    for i, delay in enumerate(delays):
        out, ck = f"{tmpdir}/out{i}", f"{tmpdir}/ck{i}"
        proc = _worker(
            "run", f"{tmpdir}/in", out, ck,
            stdout=subprocess.PIPE, text=True,
        )
        try:
            line = proc.stdout.readline()
            assert "STARTED" in line, f"worker never started: {line!r}"
            time.sleep(delay)
            assert proc.poll() is None, "worker exited before the kill"
            # SIGKILL the whole process group: Python driver AND Spark
            # JVM die instantly — no shutdown hooks, no stop()
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait(timeout=30)
        finally:
            if proc.poll() is None:
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass

        drain = _worker("drain", f"{tmpdir}/in", out, ck)
        assert drain.wait(timeout=300) == 0, f"restart failed (kill point {i})"

        got = spark.read.parquet(out)
        assert got.count() == n, f"kill at {delay}s: lost/duplicated rows"
        assert got.select("event_id").distinct().count() == n


def _progress_series(query):
    """(numRowsTotal, event-time max, watermark) per progress with data."""
    out = []
    for p in query.recentProgress:
        if p["numInputRows"] == 0 or not p.get("stateOperators"):
            continue
        et = p.get("eventTime", {})
        wm, mx = et.get("watermark"), et.get("max")
        out.append(
            (
                sum(s["numRowsTotal"] for s in p["stateOperators"]),
                mx and datetime.fromisoformat(mx.replace("Z", "+00:00")),
                wm and datetime.fromisoformat(wm.replace("Z", "+00:00")),
            )
        )
    return out


def test_s21_soak_state_plateau_and_bounded_lag(spark, tmpdir):
    from real_time_event_streaming_analytics_platform_spark.serving.hotstore import (
        HotStore,
    )
    from real_time_event_streaming_analytics_platform_spark.sources.synthetic import (
        register,
    )
    from real_time_event_streaming_analytics_platform_spark.streaming.anomaly import (
        anomaly_stream,
    )
    from real_time_event_streaming_analytics_platform_spark.streaming.entries import (
        parse_events,
        sliding_aggregates,
    )
    from real_time_event_streaming_analytics_platform_spark.streaming.metrics import (
        EngineMetricsListener,
        MetricsRegistry,
    )

    soak_s = int(os.environ.get("SPARK_GRAFT_SOAK_SECONDS", SOAK_SECONDS_DEFAULT))
    registry = MetricsRegistry()
    listener = EngineMetricsListener(registry)
    spark.streams.addListener(listener)
    register(spark)
    # recentProgress is capped at 100 entries by default; a fast machine
    # runs >100 batches in the soak and the cap would silently drop the
    # RAMP third, degenerating the plateau assertion into tail-vs-tail
    prev_keep = spark.conf.get("spark.sql.streaming.numRecentProgressUpdates")
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "5000")

    # event time advances 100 ms/row × 1200 rows = 2 min per batch, so a
    # ~minute soak sweeps hours of event time — many complete
    # window+watermark eviction cycles, which is what the plateau
    # assertion needs
    raw = (
        spark.readStream.format("synthetic_events")
        .option("seed", 23)
        .option("rowsPerBatch", 1200)
        .option("intervalMs", 100)
        .load()
    )
    parsed = parse_events(raw)

    store = HotStore()
    keys_seen: set = set()
    upsert = store.upsert_writer(window="1m")

    def track_and_upsert(batch_df, batch_id):
        rows = batch_df.select("source", "window_start").collect()
        keys_seen.update((r["source"], str(r["window_start"])) for r in rows)
        upsert(batch_df, batch_id)

    agg_q = (
        sliding_aggregates(parsed)
        .writeStream.queryName("soak_agg")
        .outputMode("update")
        .foreachBatch(track_and_upsert)
        .option("checkpointLocation", f"{tmpdir}/ck_agg")
        .trigger(processingTime="0 seconds")
        .start()
    )
    anom_q = (
        anomaly_stream(parsed)
        .where(F.col("is_anomaly"))
        .writeStream.queryName("soak_anom")
        .format("parquet")
        .option("path", f"{tmpdir}/alerts")
        .option("checkpointLocation", f"{tmpdir}/ck_anom")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        # soak_s is the FLOOR of the observation window. The assertions
        # below are duration-independent by construction, but they need
        # ≥9 data-carrying committed batches to judge the plateau; on a
        # session aged by a long suite run the first microbatch alone
        # (state-store + Python-worker init under driver-GC backlog) can
        # exceed the whole window, so extend adaptively — up to 4× —
        # until enough batches committed. A healthy session runs tens of
        # batches inside soak_s and never enters the extension loop.
        deadline = time.monotonic() + soak_s
        hard_cap = time.monotonic() + 4 * soak_s
        while time.monotonic() < deadline:
            time.sleep(1)
        while (
            len(_progress_series(agg_q)) < 12
            and time.monotonic() < hard_cap
        ):
            time.sleep(2)
    finally:
        agg_q.stop()
        anom_q.stop()
        spark.streams.removeListener(listener)
        spark.conf.set(
            "spark.sql.streaming.numRecentProgressUpdates", prev_keep
        )

    # --- (a) sliding-agg state plateaus ---
    series = _progress_series(agg_q)
    assert len(series) >= 9, f"soak too short to judge: {len(series)} batches"
    rows = [s[0] for s in series]
    third = len(rows) // 3
    ramp, steady = rows[:third], rows[third:]
    # after the ramp (watermark must first cross one full window) state
    # may wobble with batch alignment but must not grow: the tail's
    # peak stays within 1.5x of the ramp's peak, and the last batch is
    # no higher than the global peak seen mid-run
    assert max(steady) <= 1.5 * max(ramp) + 8, (
        f"state grows, eviction broken: ramp max {max(ramp)}, "
        f"steady max {max(steady)}, series {rows}"
    )

    # --- (b) watermark advances and lag stays bounded ---
    with_wm = [(mx, wm) for _, mx, wm in series if wm and mx]
    assert len(with_wm) >= 5, "watermark never advanced"
    assert with_wm[-1][1] > with_wm[0][1], "watermark stalled"
    # lag bound: 10 s configured delay + ~2 batch advances (2 min of
    # event time each) of propagation — watermark updates at batch
    # boundaries from the PREVIOUS batch's max
    for mx, wm in with_wm[2:]:
        lag = (mx - wm).total_seconds()
        assert lag <= 10 + 2 * 120 + 30, f"unbounded watermark lag: {lag}s"

    # --- (c) anomaly state == source key-space ---
    anom_series = _progress_series(anom_q)
    if anom_series:  # rolling-100 state: one row per source, forever
        assert max(s[0] for s in anom_series) <= 10

    # --- (d) HotStore bounded by upserted key-space ---
    assert len(keys_seen) > 0
    assert len(store) <= len(keys_seen)

    # --- (e) the metrics listener tracked the whole soak ---
    for q in ("soak_agg", "soak_anom"):
        batches = registry.get("streaming_batches_total", {"query": q})
        assert batches and batches >= 3, f"listener missed {q}: {batches}"
        assert registry.get("streaming_state_rows", {"query": q}) is not None
    lag_gauge = registry.get("streaming_watermark_lag_seconds", {"query": "soak_agg"})
    assert lag_gauge is not None and lag_gauge >= 0
    assert "streaming_batches_total" in registry.render()
