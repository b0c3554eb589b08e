"""Tuned SparkSession factory.

The reference runs Flink with parallelism 2 on a single machine
(EventAggregationJob.java:56); our engine targets a 1000-executor cluster,
so every knob here is chosen to also make sense at that scale:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  join-strategy re-planning replace hand-tuned parallelism.
- Broadcast threshold: small dimension tables (region/nation/supplier in
  the star schema; alert rules in the streaming path) broadcast instead of
  shuffling the fact side.
- Arrow enabled: every Python-side operator (stateful anomaly detection,
  multimodal decode) moves batches, never rows.
- UTC session timezone: oracle comparisons and window math are
  timezone-proof.
- RocksDB state store: streaming state (sliding windows, rolling anomaly
  stats, cooldown dedup) spills to disk instead of living on the JVM heap —
  required for per-key state at 100 TB ingest.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


class SessionFactory:
    """Build a SparkSession tuned for this engine.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (driver contract) or all cores.
    """

    @staticmethod
    def builder(app_name: str = "streaming-analytics-spark", cpus: int | None = None):
        if cpus is None:
            cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
        b = (
            SparkSession.builder.appName(app_name)
            .master(f"local[{cpus}]")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
            .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            # Spark 4.1 leaves worker reuse off unless set: every
            # Python-evaluating task then forks a fresh daemon child
            # (~30-70 ms each, measured — a 32-task Arrow stage pays
            # ~1-2 s of pure fork). With reuse on, released workers go
            # back to the pool and repeated Python stages (IRLS/Lloyd
            # iterations, decode passes, scorers) run on warm workers.
            # Equally right on a 1000-executor cluster — reuse is the
            # guide's §4.5 assumption for amortizing per-task init.
            .config("spark.python.worker.reuse", "true")
            .config("spark.sql.parquet.filterPushdown", "true")
            .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
            .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
            .config(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
            )
            .config("spark.ui.enabled", "false")
            # saveAsTable target (bucketed tables); static conf, so it must
            # be set at session build — keep it out of the repo tree
            .config(
                "spark.sql.warehouse.dir",
                os.environ.get(
                    "SPARK_GRAFT_WAREHOUSE", f"/tmp/sgr-warehouse-{os.getpid()}"
                ),
            )
        )
        return b

    @staticmethod
    def get(app_name: str = "streaming-analytics-spark", cpus: int | None = None) -> SparkSession:
        return SessionFactory.builder(app_name, cpus).getOrCreate()


def get_spark(cpus: int | None = None) -> SparkSession:
    return SessionFactory.get(cpus=cpus)


def ensure_utc(spark: SparkSession) -> SparkSession:
    """Force session confs this engine relies on, on an externally-provided
    session (the driver constructs its own SparkSession for ``queries()``).

    - UTC session timezone: epoch math (unix_timestamp) on naive parquet
      timestamps is session-TZ dependent.
    - nanosAsLong: the testdata ``events.ts`` is parquet TIMESTAMP(NANOS),
      which Spark 4 refuses to read natively; we read it as a long and the
      catalog converts to TimestampType (µs) — the data is µs-distinct, so
      ordering/bucketing semantics are unchanged.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ensure_package_shipped(spark)
    return spark


_SHIPPED: set[str] = set()


def ensure_package_shipped(spark: SparkSession) -> None:
    """Ship this package to the Python workers (addPyFile).

    cloudpickle serializes module-level functions BY REFERENCE, so any
    UDF/mapInPandas body defined in this package requires the package to
    be importable inside the worker processes. When the driver process
    was launched from the repo root that happens implicitly via cwd; an
    external driver (the correctness harness, a notebook, a real
    cluster) has no such guarantee — addPyFile is the standard way to
    ship the code, and is exactly what a 1000-executor deployment does.
    Zipped once per process, added once per SparkContext.
    """
    import hashlib
    import zipfile

    sc = spark.sparkContext
    if sc.applicationId in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    members = []
    sig = hashlib.md5()
    for root, _dirs, files in os.walk(pkg_dir):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(root, fn)
            rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
            st = os.stat(full)
            members.append((full, rel))
            sig.update(f"{rel}:{st.st_mtime_ns}:{st.st_size};".encode())
    # Content-keyed zip name: a stale zip must never be reused after an
    # in-place edit (directory mtime does not change when nested files
    # are edited, and /tmp outlives pids), so the key is the per-file
    # (path, mtime, size) signature. Each process writes its own tmp
    # file and os.replace()s UNCONDITIONALLY — an exists-check would
    # race another process deleting the zip between the check and
    # addPyFile (cross-process TOCTOU). No deletion on exit either:
    # content-keyed zips are tiny (~100 KB) and another live process
    # may still be about to addPyFile the same path.
    zip_path = os.path.join("/tmp", f"sgr-pkg-{sig.hexdigest()[:16]}.zip")
    tmp = f"{zip_path}.{os.getpid()}.tmp"
    with zipfile.ZipFile(tmp, "w") as zf:
        for full, rel in sorted(members, key=lambda m: m[1]):
            zf.write(full, rel)
    os.replace(tmp, zip_path)
    sc.addPyFile(zip_path)
    _SHIPPED.add(sc.applicationId)
