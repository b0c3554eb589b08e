"""Subprocess worker for the S20 hard-crash recovery test.

Runs the reference ingest pipeline (file stream → parse → parquet file
sink with checkpoint) in its OWN JVM so the parent test can SIGKILL it
mid-epoch — a real crash, not a graceful stop. Modes:

- ``run``:   processingTime trigger, one file per micro-batch (slow on
             purpose — gives the parent a wide mid-epoch kill window),
             prints ``STARTED`` once the query is live, then runs until
             killed.
- ``drain``: availableNow trigger, large file batches — the restart
             path; recovers from whatever the checkpoint holds and
             exits 0 when the input is drained.
- ``shard_run`` / ``shard_drain``: the same two modes over the
             DOCUMENT pipeline — doc file stream → foreachBatch
             shard_export_writer (the S35 incremental shard store) —
             so the exporter's (shard, run, epoch) exactly-once claim
             is exercised under a real mid-epoch SIGKILL, not only
             deterministic replay.

- ``shard_compact``: S38 — run compact_shard_store over the existing
             store at OUT_DIR (IN_DIR/CK_DIR unused; the intent files
             inside the store are the recovery state), so the
             compaction protocol's crash recovery is exercised under a
             real mid-protocol SIGKILL.

Usage: python _crash_stream_worker.py {run|drain|shard_run|shard_drain|shard_compact} IN_DIR OUT_DIR CK_DIR
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mode, in_dir, out_dir, ck_dir = sys.argv[1:5]

    from pyspark.sql import SparkSession

    from real_time_event_streaming_analytics_platform_spark.streaming.entries import (
        parse_events,
        read_event_stream,
    )

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"crash-worker-{mode}")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "shard_compact":
        # S38: compact an EXISTING shard store (in_dir ignored; out_dir
        # is the store). Prints STARTED, then compacts shard by shard —
        # 16 sequential Spark jobs give the parent a wide mid-protocol
        # kill window. ck_dir is unused (the intent files inside the
        # store ARE the recovery state).
        from real_time_event_streaming_analytics_platform_spark.streaming.sinks import (
            compact_shard_store,
        )

        print("STARTED", flush=True)
        compact_shard_store(spark, out_dir)
        spark.stop()
        return

    live = mode in ("run", "shard_run")
    if mode.startswith("shard_"):
        from real_time_event_streaming_analytics_platform_spark.streaming.curation import (
            read_doc_stream,
        )
        from real_time_event_streaming_analytics_platform_spark.streaming.sinks import (
            shard_export_writer,
        )

        stream = read_doc_stream(
            spark, in_dir, max_files_per_trigger=1 if live else 1000
        )
        writer = (
            stream.writeStream.foreachBatch(shard_export_writer(out_dir))
            .option("checkpointLocation", ck_dir)
        )
    else:
        stream = parse_events(
            read_event_stream(
                spark, in_dir, max_files_per_trigger=1 if live else 1000
            )
        )
        writer = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck_dir)
            .outputMode("append")
        )
    if live:
        # throttled trigger: 40 one-file epochs can never drain faster
        # than ~12 s, so the parent's 2-7 s kill always lands mid-run
        # regardless of machine speed
        q = writer.trigger(processingTime="300 milliseconds").start()
        print("STARTED", flush=True)
        q.awaitTermination()
    else:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        spark.stop()


if __name__ == "__main__":
    main()
