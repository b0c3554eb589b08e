"""S35 — incremental shard export: the streaming twin of the x30 batch
export (WebDataset-style K-shard corpus write). Pins (a) streaming a
corpus through shard_export_writer yields a store whose per-shard
manifest equals the batch x30_shard_manifest row-for-row, (b) the
manifest is invariant to how the stream was micro-batched, (c) a
replayed epoch does not duplicate documents (dynamic partition
overwrite on (shard, run, epoch)), and (d) a fresh-checkpoint restart
with DIFFERENT rows appends instead of clobbering epoch 0."""

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from real_time_event_streaming_analytics_platform_spark.catalog import load
from real_time_event_streaming_analytics_platform_spark.streaming.sinks import (
    shard_export_writer,
    shard_store_manifest,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture
def tmpdir():
    d = tempfile.mkdtemp(prefix="sgr-shardexp-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs(spark):
    return load(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source"
    )


def _stage_input(spark, path, n_files):
    _docs(spark).repartition(n_files).write.parquet(path)


def _stream_store(spark, in_dir, store, ckpt, max_files):
    stream = (
        spark.readStream.schema(_docs(spark).schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(in_dir)
    )
    q = (
        stream.writeStream.foreachBatch(shard_export_writer(store))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _canon(df):
    return [tuple(r) for r in df.collect()]


def test_s35_streamed_store_matches_batch_manifest(spark, tmpdir):
    import real_time_event_streaming_analytics_platform_spark as engine

    _stage_input(spark, f"{tmpdir}/in", n_files=4)
    _stream_store(spark, f"{tmpdir}/in", f"{tmpdir}/st1", f"{tmpdir}/ck1", 1)

    batch = _canon(engine.QUERIES["x30_shard_manifest"](spark, SF_DIR))
    got = _canon(shard_store_manifest(spark, f"{tmpdir}/st1"))
    assert got == batch

    # exactly one stored row per input document
    store = spark.read.parquet(f"{tmpdir}/st1")
    n_in = _docs(spark).count()
    assert store.count() == n_in
    assert store.select("doc_id").distinct().count() == n_in

    # (b) micro-batch-split invariance: one big trigger, same manifest
    _stream_store(spark, f"{tmpdir}/in", f"{tmpdir}/st2", f"{tmpdir}/ck2", 4)
    assert _canon(shard_store_manifest(spark, f"{tmpdir}/st2")) == batch


def test_s35_replay_idempotent_and_fresh_checkpoint_appends(spark, tmpdir):
    docs = _docs(spark)
    t1 = docs.where(F.col("doc_id") % 2 == 0)
    t2 = docs.where(F.col("doc_id") % 2 == 1)

    # (c) deterministic replay: t1 as epoch 0, t2 as epoch 1, then t1
    # REPLAYED as epoch 0 — dynamic partition overwrite must rewrite
    # epoch 0's own (shard, run, epoch) partitions, total unchanged.
    write = shard_export_writer(f"{tmpdir}/st")
    write(t1, 0)
    write(t2, 1)
    before = _canon(shard_store_manifest(spark, f"{tmpdir}/st"))
    write(t1, 0)  # replay
    after = _canon(shard_store_manifest(spark, f"{tmpdir}/st"))
    assert after == before, "replayed epoch duplicated documents"

    # (d) fresh-checkpoint restart: epoch ids restart at 0 with
    # DIFFERENT rows; the run content-signature level must make this
    # an append (the (shard, epoch)-only layout would clobber t1).
    write2 = shard_export_writer(f"{tmpdir}/st2")
    write2(t1, 0)
    write2(t2, 0)  # fresh-checkpoint twin: same epoch id, new rows
    union = spark.read.parquet(f"{tmpdir}/st2")
    assert union.count() == docs.count()
    assert union.select("doc_id").distinct().count() == docs.count()


def test_s35_within_shard_files_sorted_by_order_key(spark, tmpdir):
    """The export contract is shard files streamed in shuffle order
    (write_shards semantics): within every written parquet file the
    md5 order key h must be non-decreasing."""
    write = shard_export_writer(f"{tmpdir}/st")
    write(_docs(spark), 0)
    rows = (
        spark.read.parquet(f"{tmpdir}/st")
        .select("h", F.input_file_name().alias("f"))
        .collect()
    )
    by_file: dict = {}
    for r in rows:
        by_file.setdefault(r["f"], []).append(r["h"])
    assert by_file
    for f, hs in by_file.items():
        assert hs == sorted(hs), f"unsorted shard file {f}"


def test_s36_curated_stream_exports_batch_identical_store(spark, tmpdir):
    """S36 — the composed daily-ingest path: streaming curation
    (quality → mix → decontaminate → first-arrival dedup, the S32/S34
    stages) feeding the incremental shard exporter. The landed store
    must hold exactly the curated documents exactly once, and its
    per-shard manifest must equal the batch export (write_shards) of
    the same curated set — curation parity itself is pinned by
    S32/S34; this pins the COMPOSITION."""
    import json
    import os

    from real_time_event_streaming_analytics_platform_spark.functions.pipeline import (
        write_shards,
    )
    from real_time_event_streaming_analytics_platform_spark.streaming.curation import (
        bench_gram_set,
        curate_doc_stream,
        read_doc_stream,
    )
    from real_time_event_streaming_analytics_platform_spark.streaming.entries import (
        run_available_now,
    )

    docs = load(spark, SF_DIR, "documents")
    bench = bench_gram_set(docs)
    rows = sorted(
        docs.select("doc_id", "source", "text").collect(),
        key=lambda r: r["doc_id"],
    )
    os.makedirs(f"{tmpdir}/in", exist_ok=True)
    third = (len(rows) + 2) // 3
    for part in range(3):  # 3 files -> 3 micro-batches at mfpt=1
        with open(f"{tmpdir}/in/docs{part}.jsonl", "w") as fh:
            for i, r in enumerate(rows[part * third : (part + 1) * third]):
                fh.write(
                    json.dumps(
                        {
                            "doc_id": r["doc_id"],
                            "ts": "2024-01-01T00:00:%02dZ"
                            % ((part * third + i) % 60),
                            "source": r["source"],
                            "text": r["text"],
                        }
                    )
                    + "\n"
                )

    def curated():
        return curate_doc_stream(
            read_doc_stream(spark, f"{tmpdir}/in", max_files_per_trigger=1), bench
        )

    q = (
        curated()
        .writeStream.foreachBatch(shard_export_writer(f"{tmpdir}/st"))
        .option("checkpointLocation", f"{tmpdir}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    kept = run_available_now(curated(), f"{tmpdir}/ck2", "append", "s36_kept")
    kept_rows = kept.select("doc_id", "text", "source").collect()
    assert kept_rows, "curation kept nothing — fixture broken"

    store = spark.read.parquet(f"{tmpdir}/st")
    got_ids = sorted(r["doc_id"] for r in store.select("doc_id").collect())
    assert got_ids == sorted(r["doc_id"] for r in kept_rows)  # once each

    kept_df = spark.createDataFrame(
        kept_rows, "doc_id long, text string, source string"
    )
    write_shards(kept_df, f"{tmpdir}/batch_st")
    assert _canon(shard_store_manifest(spark, f"{tmpdir}/st")) == _canon(
        shard_store_manifest(spark, f"{tmpdir}/batch_st")
    )


def test_s37_shard_export_survives_sigkill_exactly_once(spark, tmpdir):
    """S37 — hard-crash recovery for the incremental shard store: the
    exporter subprocess is SIGKILLed (whole process group — driver AND
    JVM, no shutdown hooks) mid-epoch at two seeded kill points; a
    restart from the same checkpoint must drain to a store holding
    every document exactly once with the batch-identical manifest. The
    guarantee under test is (shard, run, epoch) dynamic partition
    overwrite: an epoch killed after a partial write is re-run and
    rewrites exactly its own partitions, and an epoch killed after
    commit but before the checkpoint advance replays idempotently."""
    import json
    import os
    import random
    import signal
    import subprocess
    import sys
    import time

    import real_time_event_streaming_analytics_platform_spark as engine

    here = os.path.dirname(os.path.abspath(__file__))

    def worker(mode, in_dir, out_dir, ck_dir, **popen_kw):
        env = dict(os.environ)
        env["PYTHONPATH"] = os.path.dirname(here)
        return subprocess.Popen(
            [
                sys.executable,
                os.path.join(here, "_crash_stream_worker.py"),
                mode,
                in_dir,
                out_dir,
                ck_dir,
            ],
            env=env,
            start_new_session=True,
            **popen_kw,
        )

    docs = _docs(spark).select("doc_id", "source", "text").collect()
    n = len(docs)
    os.makedirs(f"{tmpdir}/in", exist_ok=True)
    per = (n + 39) // 40  # 40 one-doc-file epochs -> wide kill window
    for part in range(40):
        chunk = docs[part * per : (part + 1) * per]
        if not chunk:
            break
        with open(f"{tmpdir}/in/docs{part:02d}.jsonl", "w") as fh:
            for i, r in enumerate(chunk):
                fh.write(
                    json.dumps(
                        {
                            "doc_id": r["doc_id"],
                            "ts": "2024-01-01T00:00:%02dZ" % (i % 60),
                            "source": r["source"],
                            "text": r["text"],
                        }
                    )
                    + "\n"
                )

    rng = random.Random(37)
    delays = [round(rng.uniform(2.0, 6.0), 1) for _ in range(2)]
    for i, delay in enumerate(delays):
        out, ck = f"{tmpdir}/out{i}", f"{tmpdir}/ck{i}"
        proc = worker(
            "shard_run", f"{tmpdir}/in", out, ck,
            stdout=subprocess.PIPE, text=True,
        )
        try:
            line = proc.stdout.readline()
            assert "STARTED" in line, f"worker never started: {line!r}"
            time.sleep(delay)
            assert proc.poll() is None, "worker exited before the kill"
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait(timeout=30)
        finally:
            if proc.poll() is None:
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass

        drain = worker("shard_drain", f"{tmpdir}/in", out, ck)
        assert drain.wait(timeout=300) == 0, f"restart failed (kill point {i})"

        store = spark.read.parquet(out)
        assert store.count() == n, f"kill at {delay}s: lost/duplicated docs"
        assert store.select("doc_id").distinct().count() == n
        got = _canon(shard_store_manifest(spark, out))
        want = _canon(engine.QUERIES["x30_shard_manifest"](spark, SF_DIR))
        assert got == want, f"kill at {delay}s: manifest diverged"
        # ADVICE r12: the data write and the manifest-partials write
        # are two jobs; a kill BETWEEN them leaves the partial missing
        # until the same-checkpoint replay rewrites both sides — after
        # the drain the incremental partials must have healed to the
        # full-scan manifest exactly.
        from real_time_event_streaming_analytics_platform_spark.streaming.sinks import (
            shard_store_manifest_fast,
        )

        fast = _canon(shard_store_manifest_fast(spark, out))
        assert fast == want, f"kill at {delay}s: fast manifest diverged"


def _store_files(path):
    import glob
    import os

    return [
        f
        for f in glob.glob(os.path.join(path, "shard=*", "run=*", "epoch=*", "*"))
        if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
    ]


def test_s38_compaction_preserves_manifest_rows_and_order(spark, tmpdir):
    """S38 — manifest-preserving compaction (VERDICT r11 #6): a store
    accumulated over many epochs is rewritten to one h-sorted file per
    shard. Pins: (a) shard_store_manifest identical before/after,
    (b) every document exactly once with identical
    (doc_id, text, lang, source, h) content, (c) within-file ascending
    h in the compacted files, (d) the small-files count actually drops
    to one data file per shard, intent files cleaned up, and (e) a
    second compaction is a structural no-op."""
    from real_time_event_streaming_analytics_platform_spark.streaming.sinks import (
        compact_shard_store,
    )

    docs = _docs(spark)
    write = shard_export_writer(f"{tmpdir}/st")
    for i in range(8):
        write(docs.where(F.col("doc_id") % 8 == i), i)

    before_manifest = _canon(shard_store_manifest(spark, f"{tmpdir}/st"))
    before_rows = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{tmpdir}/st")
        .select("doc_id", "text", "lang", "source", "h")
        .collect()
    )
    files_before = len(_store_files(f"{tmpdir}/st"))

    report = compact_shard_store(spark, f"{tmpdir}/st")
    assert report and all(v["compacted"] for v in report.values()), report
    assert all(v["files_after"] == 1 for v in report.values()), report

    after_manifest = _canon(shard_store_manifest(spark, f"{tmpdir}/st"))
    assert after_manifest == before_manifest
    after_rows = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{tmpdir}/st")
        .select("doc_id", "text", "lang", "source", "h")
        .collect()
    )
    assert after_rows == before_rows
    files_after = _store_files(f"{tmpdir}/st")
    assert len(files_after) < files_before
    assert len(files_after) <= 16  # one data file per occupied shard

    # (c) within-file ascending h
    rows = (
        spark.read.parquet(f"{tmpdir}/st")
        .select("h", F.input_file_name().alias("f"))
        .collect()
    )
    by_file: dict = {}
    for r in rows:
        by_file.setdefault(r["f"], []).append(r["h"])
    for f, hs in by_file.items():
        assert hs == sorted(hs), f"unsorted compacted file {f}"

    # no intent files left behind
    import glob
    import os

    assert not glob.glob(os.path.join(f"{tmpdir}/st", "shard=*", "_compaction.json"))

    # (e) idempotent re-run: already one file per shard -> no-op
    report2 = compact_shard_store(spark, f"{tmpdir}/st")
    assert all(not v["compacted"] for v in report2.values()), report2
    assert _canon(shard_store_manifest(spark, f"{tmpdir}/st")) == before_manifest


def test_s38_compaction_survives_sigkill_exactly_once(spark, tmpdir):
    """S38 kill harness — the compaction subprocess is SIGKILLed
    (whole process group) mid-protocol; re-running the compaction
    in-process must recover via the intent files to a store holding
    every document exactly once with the pre-compaction manifest.
    Covers both crash phases: an intent whose compacted run never
    reached _SUCCESS is rolled back, one whose inputs were partially
    deleted is rolled forward."""
    import os
    import random
    import signal
    import subprocess
    import sys
    import time

    from real_time_event_streaming_analytics_platform_spark.streaming.sinks import (
        compact_shard_store,
    )

    here = os.path.dirname(os.path.abspath(__file__))
    docs = _docs(spark)
    n = docs.count()

    rng = random.Random(38)
    for i in range(2):
        store = f"{tmpdir}/st{i}"
        write = shard_export_writer(store)
        for e in range(8):
            write(docs.where(F.col("doc_id") % 8 == e), e)
        want = _canon(shard_store_manifest(spark, store))

        env = dict(os.environ)
        env["PYTHONPATH"] = os.path.dirname(here)
        proc = subprocess.Popen(
            [
                sys.executable,
                os.path.join(here, "_crash_stream_worker.py"),
                "shard_compact",
                f"{tmpdir}/unused_in",
                store,
                f"{tmpdir}/unused_ck",
            ],
            env=env,
            start_new_session=True,
            stdout=subprocess.PIPE,
            text=True,
        )
        try:
            line = proc.stdout.readline()
            assert "STARTED" in line, f"worker never started: {line!r}"
            time.sleep(rng.uniform(1.0, 6.0))
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait(timeout=30)
        finally:
            if proc.poll() is None:
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass

        # recovery = just run the compaction again in-process
        compact_shard_store(spark, store)

        table = spark.read.parquet(store)
        assert table.count() == n, f"kill point {i}: lost/duplicated docs"
        assert table.select("doc_id").distinct().count() == n
        assert _canon(shard_store_manifest(spark, store)) == want, (
            f"kill point {i}: manifest diverged"
        )
        # the incremental partials must also recover to exactness
        from real_time_event_streaming_analytics_platform_spark.streaming.sinks import (
            shard_store_manifest_fast,
        )

        assert _canon(shard_store_manifest_fast(spark, store)) == want, (
            f"kill point {i}: fast manifest diverged after recovery"
        )
        import glob

        assert not glob.glob(os.path.join(store, "shard=*", "_compaction.json"))


def test_s39_two_day_ingest_loop_with_compaction_between_days(spark, tmpdir):
    """S39 — the real daily loop: day-1 files stream into the store,
    the store is COMPACTED, day-2 files arrive in the same input dir
    and the SAME checkpoint drains them into the compacted store, and
    a second compaction folds old-compact + new epochs together. After
    each day the store must hold exactly the documents seen so far,
    exactly once, with the batch-identical manifest and ascending h
    within every file — compaction between ingest days must be
    invisible to the exporter and to readers."""
    import real_time_event_streaming_analytics_platform_spark as engine
    from real_time_event_streaming_analytics_platform_spark.streaming.sinks import (
        compact_shard_store,
    )

    docs = _docs(spark)
    day1 = docs.where(F.col("doc_id") % 2 == 0)
    day2 = docs.where(F.col("doc_id") % 2 == 1)
    store, ck = f"{tmpdir}/st", f"{tmpdir}/ck"

    def _assert_h_sorted():
        rows = (
            spark.read.parquet(store)
            .select("h", F.input_file_name().alias("f"))
            .collect()
        )
        by_file: dict = {}
        for r in rows:
            by_file.setdefault(r["f"], []).append(r["h"])
        for f, hs in by_file.items():
            assert hs == sorted(hs), f"unsorted file {f}"

    # day 1: 2 micro-batches, then compact
    day1.repartition(2).write.parquet(f"{tmpdir}/in")
    _stream_store(spark, f"{tmpdir}/in", store, ck, 1)
    report1 = compact_shard_store(spark, store)
    assert any(v["compacted"] for v in report1.values())
    t = spark.read.parquet(store)
    n1 = day1.count()
    assert t.count() == n1 and t.select("doc_id").distinct().count() == n1
    _assert_h_sorted()

    # day 2 arrives in the SAME input dir; the SAME checkpoint drains
    # only the new files into the compacted store
    day2.repartition(2).write.mode("append").parquet(f"{tmpdir}/in")
    _stream_store(spark, f"{tmpdir}/in", store, ck, 1)
    t = spark.read.parquet(store)
    n = docs.count()
    assert t.count() == n and t.select("doc_id").distinct().count() == n

    # second compaction folds day-1's compact run + day-2's epochs
    report2 = compact_shard_store(spark, store)
    assert any(v["compacted"] for v in report2.values())
    t = spark.read.parquet(store)
    assert t.count() == n and t.select("doc_id").distinct().count() == n
    want = _canon(engine.QUERIES["x30_shard_manifest"](spark, SF_DIR))
    assert _canon(shard_store_manifest(spark, store)) == want
    _assert_h_sorted()
    assert len(_store_files(store)) <= 16


def test_s40_fast_manifest_equals_full_scan_everywhere(spark, tmpdir):
    """The incremental manifest partials (the O(epochs) manifest read a
    100 TB store needs — shard_store_manifest_fast) must equal the
    full-scan manifest row-for-row after every store lifecycle event:
    multi-batch export, same-epoch replay, fresh-checkpoint append,
    compaction, and post-compaction ingest."""
    from real_time_event_streaming_analytics_platform_spark.streaming.sinks import (
        compact_shard_store,
        shard_store_manifest_fast,
    )

    docs = _docs(spark)
    t1 = docs.where(F.col("doc_id") % 2 == 0)
    t2 = docs.where(F.col("doc_id") % 2 == 1)
    store = f"{tmpdir}/st"
    write = shard_export_writer(store)

    def _agree(tag):
        full = _canon(shard_store_manifest(spark, store))
        fast = _canon(shard_store_manifest_fast(spark, store))
        assert fast == full, f"fast manifest diverged after {tag}"

    write(t1, 0)
    _agree("first batch")
    write(t2, 1)
    _agree("second batch")
    write(t1, 0)  # same-epoch replay overwrites its own partials too
    _agree("replay")

    # fresh-checkpoint twin (epoch ids restart, new rows -> new run)
    write2 = shard_export_writer(f"{tmpdir}/st2")
    write2(t1, 0)
    write2(t2, 0)
    full2 = _canon(shard_store_manifest(spark, f"{tmpdir}/st2"))
    fast2 = _canon(shard_store_manifest_fast(spark, f"{tmpdir}/st2"))
    assert fast2 == full2

    compact_shard_store(spark, store)
    _agree("compaction")
    # ingest continues after compaction; partials for new epochs append
    write(docs.where(F.col("doc_id") % 10 == 3).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    ), 7)
    _agree("post-compaction ingest")


def test_s41_reconcile_compaction_closes_overlapping_restart(spark, tmpdir):
    """S41 (VERDICT r12 #2) — the one write-time-unclosable hole: a
    fresh-checkpoint restart whose first batch OVERLAPS a committed
    batch without equaling it (old docs plus new) gets a new run id
    and appends, duplicating the overlap. The store-level closure is
    compact_shard_store(reconcile_docs=True): keep exactly one row per
    document (first-committed occurrence) while folding partitions.
    Pins: duplicates exist before, exactly-once after, batch-identical
    manifest, fast == full manifest, docs_dropped reported, ascending
    h preserved, and plain compaction (reconcile_docs=False) would NOT
    have closed it (mode folded into the compacted run id)."""
    import real_time_event_streaming_analytics_platform_spark as engine
    from real_time_event_streaming_analytics_platform_spark.streaming.sinks import (
        compact_shard_store,
        shard_store_manifest_fast,
    )

    docs = _docs(spark)
    n = docs.count()
    committed = docs.where(F.col("doc_id") % 3 == 0)
    overlap_plus_new = docs  # committed ∪ new — the S41 shape
    store = f"{tmpdir}/st"

    # original run commits epochs 0 and 1, then the checkpoint is
    # abandoned; the restarted query's first batch re-reads everything
    write = shard_export_writer(store, checkpoint=f"{tmpdir}/ck_old")
    write(committed.where(F.col("doc_id") % 2 == 0), 0)
    write(committed.where(F.col("doc_id") % 2 == 1), 1)
    write_fresh = shard_export_writer(store, checkpoint=f"{tmpdir}/ck_new")
    write_fresh(overlap_plus_new, 0)

    n_committed = committed.count()
    t = spark.read.parquet(store)
    assert t.count() == n + n_committed, "overlap did not duplicate"
    assert t.select("doc_id").distinct().count() == n

    report = compact_shard_store(spark, store, reconcile_docs=True)
    assert any(v.get("compacted") for v in report.values()), report
    assert (
        sum(v.get("docs_dropped", 0) for v in report.values()) == n_committed
    ), report

    t = spark.read.parquet(store)
    assert t.count() == n and t.select("doc_id").distinct().count() == n
    want = _canon(engine.QUERIES["x30_shard_manifest"](spark, SF_DIR))
    assert _canon(shard_store_manifest(spark, store)) == want
    assert _canon(shard_store_manifest_fast(spark, store)) == want

    # winner is the FIRST-COMMITTED occurrence: every surviving row's
    # content must match the original document exactly (same text)
    got = {
        r["doc_id"]: r["text"]
        for r in t.select("doc_id", "text").collect()
    }
    for r in docs.select("doc_id", "text").collect():
        assert got[r["doc_id"]] == r["text"]

    # within-file h order survives the dedup window
    rows = (
        t.select("h", F.input_file_name().alias("f")).collect()
    )
    by_file: dict = {}
    for r in rows:
        by_file.setdefault(r["f"], []).append(r["h"])
    for f, hs in by_file.items():
        assert hs == sorted(hs), f"unsorted file {f}"


def test_s41_sigkill_then_fresh_checkpoint_then_reconcile(spark, tmpdir):
    """S41 kill form — the full operational story: the exporter is
    SIGKILLed mid-run, the checkpoint is ABANDONED (not drained), a
    fresh-checkpoint query re-reads the whole input (its first batch =
    committed docs ∪ the rest), and the next maintenance compaction
    with reconcile_docs=True restores exactly-once. docs_dropped may
    be zero (kill can land before the first commit) but the final
    store must always be exact."""
    import json
    import os
    import signal
    import subprocess
    import sys
    import time

    import real_time_event_streaming_analytics_platform_spark as engine
    from real_time_event_streaming_analytics_platform_spark.streaming.sinks import (
        compact_shard_store,
        shard_store_manifest_fast,
    )

    here = os.path.dirname(os.path.abspath(__file__))
    docs = _docs(spark).select("doc_id", "source", "text").collect()
    n = len(docs)
    os.makedirs(f"{tmpdir}/in", exist_ok=True)
    per = (n + 39) // 40
    for part in range(40):
        chunk = docs[part * per : (part + 1) * per]
        if not chunk:
            break
        with open(f"{tmpdir}/in/docs{part:02d}.jsonl", "w") as fh:
            for i, r in enumerate(chunk):
                fh.write(
                    json.dumps(
                        {
                            "doc_id": r["doc_id"],
                            "ts": "2024-01-01T00:00:%02dZ" % (i % 60),
                            "source": r["source"],
                            "text": r["text"],
                        }
                    )
                    + "\n"
                )

    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(here)

    def worker(mode, ck, **kw):
        return subprocess.Popen(
            [
                sys.executable,
                os.path.join(here, "_crash_stream_worker.py"),
                mode,
                f"{tmpdir}/in",
                f"{tmpdir}/out",
                ck,
            ],
            env=env,
            start_new_session=True,
            **kw,
        )

    proc = worker("shard_run", f"{tmpdir}/ck_old", stdout=subprocess.PIPE, text=True)
    try:
        line = proc.stdout.readline()
        assert "STARTED" in line, f"worker never started: {line!r}"
        time.sleep(4.0)
        assert proc.poll() is None, "worker exited before the kill"
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass

    # checkpoint abandoned: drain with a FRESH checkpoint instead
    drain = worker("shard_drain", f"{tmpdir}/ck_new")
    assert drain.wait(timeout=300) == 0, "fresh-checkpoint drain failed"

    t = spark.read.parquet(f"{tmpdir}/out")
    assert t.select("doc_id").distinct().count() == n
    dups_before = t.count() - n
    assert dups_before >= 0

    compact_shard_store(spark, f"{tmpdir}/out", reconcile_docs=True)
    t = spark.read.parquet(f"{tmpdir}/out")
    assert t.count() == n, f"{dups_before} dups before, store not exact after"
    assert t.select("doc_id").distinct().count() == n
    want = _canon(engine.QUERIES["x30_shard_manifest"](spark, SF_DIR))
    assert _canon(shard_store_manifest(spark, f"{tmpdir}/out")) == want
    assert _canon(shard_store_manifest_fast(spark, f"{tmpdir}/out")) == want


def test_s41_checkpoint_stable_run_id_skips_signature_and_clobbers(
    spark, tmpdir
):
    """shard_export_writer(checkpoint=...) derives ONE stable run id
    for the whole query: every epoch lands under the same run=k...
    directory (no per-batch signature job), and a same-epoch replay
    clobbers its own partitions exactly as the signature path does."""
    import glob
    import os

    docs = _docs(spark)
    t1 = docs.where(F.col("doc_id") % 2 == 0)
    t2 = docs.where(F.col("doc_id") % 2 == 1)
    store = f"{tmpdir}/st"
    write = shard_export_writer(store, checkpoint=f"{tmpdir}/ck")
    write(t1, 0)
    write(t2, 1)
    write(t1, 0)  # replay

    runs = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(store, "shard=*", "run=*"))
    }
    assert len(runs) == 1 and next(iter(runs)).startswith("run=k"), runs
    t = spark.read.parquet(store)
    assert t.count() == docs.count()
    assert t.select("doc_id").distinct().count() == docs.count()
    # same checkpoint string in a later session -> same run id
    write_again = shard_export_writer(store, checkpoint=f"{tmpdir}/ck")
    write_again(t2, 1)  # replay from a rebuilt writer
    assert spark.read.parquet(store).count() == docs.count()


def test_s38b_compaction_target_files_keeps_global_shard_order(spark, tmpdir):
    """The 100 TB compaction path is target_files > 1: a shard compacts
    to bounded-size files via repartitionByRange on the order key, so
    the h order must hold not only WITHIN each file but ACROSS a
    shard's files (non-overlapping h ranges) — a reader streaming a
    shard's files in name order sees one globally sorted sequence.
    Manifest and exactly-once invariants unchanged."""
    from real_time_event_streaming_analytics_platform_spark.streaming.sinks import (
        compact_shard_store,
        shard_store_manifest_fast,
    )

    docs = _docs(spark)
    store = f"{tmpdir}/st"
    write = shard_export_writer(store)
    for e in range(6):
        write(docs.where(F.col("doc_id") % 6 == e), e)
    want = _canon(shard_store_manifest(spark, store))
    n = docs.count()

    report = compact_shard_store(spark, store, target_files=3)
    assert any(v["compacted"] for v in report.values())
    t = spark.read.parquet(store)
    assert t.count() == n and t.select("doc_id").distinct().count() == n
    assert _canon(shard_store_manifest(spark, store)) == want
    assert _canon(shard_store_manifest_fast(spark, store)) == want

    rows = (
        t.select("shard", "h", F.input_file_name().alias("f")).collect()
    )
    by_file: dict = {}
    for r in rows:
        by_file.setdefault((r["shard"], r["f"]), []).append(r["h"])
    # within-file sorted, and per shard the files' [min,max] h ranges
    # must not overlap (range partitioning guarantee)
    per_shard: dict = {}
    for (shard, f), hs in by_file.items():
        assert hs == sorted(hs), f"unsorted file {f}"
        per_shard.setdefault(shard, []).append((min(hs), max(hs), f))
    multi = 0
    for shard, ranges in per_shard.items():
        ranges.sort()
        if len(ranges) > 1:
            multi += 1
        for (lo1, hi1, f1), (lo2, hi2, f2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2, (
                f"shard {shard}: overlapping h ranges {f1} vs {f2}"
            )
    assert multi > 0, "no shard actually split into multiple files"
