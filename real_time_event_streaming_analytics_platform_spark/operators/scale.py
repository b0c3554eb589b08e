"""Scale toolkit: the partitioning/skew/bucketing techniques the 100 TB
deployment relies on, as reusable operators with plan-checkable effects.

- Date-partitioned event storage: the Spark analogue of the reference's
  TimescaleDB hypertable chunking (01-init-timescaledb.sql:17,38) — time
  predicates become partition pruning (PartitionFilters in the scan).
- Salted aggregation: two-phase groupBy for skewed keys — phase 1
  aggregates (key, salt) partials across SALT_BUCKETS× more tasks, phase
  2 merges per key. Identical results to a plain groupBy; the skewed
  key's work is spread instead of landing on one task. (AQE's skew-join
  handles JOIN skew; aggregation skew needs this.)
- Bucketed tables: pre-shuffling both sides of a recurring join key at
  write time (saveAsTable with bucketBy) removes the Exchange from every
  subsequent join on that key.

tests/test_scale.py asserts the plan-level effects at small SF — the
same plans, scaled, are the 100 TB behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SALT_BUCKETS = 16


def write_events_partitioned(events: DataFrame, path: str) -> None:
    """Persist events partitioned by event_date (hypertable-chunk twin)."""
    (
        events.withColumn("event_date", F.date_format("ts", "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )


def read_events_range(spark: SparkSession, path: str, start: str, end: str) -> DataFrame:
    """Time-range read that prunes partitions: the date predicate is on
    the partition column, so non-matching date directories are never
    listed, let alone scanned."""
    return spark.read.parquet(path).where(
        (F.col("event_date") >= start) & (F.col("event_date") <= end)
    )


def salted_agg(
    df: DataFrame,
    key: str,
    agg_exprs: dict[str, str],
    n_salts: int = SALT_BUCKETS,
) -> DataFrame:
    """Two-phase aggregation for skewed keys, for the decomposable aggs
    {sum, count, min, max}. agg_exprs maps output column → "fn(col)".

    Phase 1 groups by (key, salt) — the hot key's rows split across
    ``n_salts`` tasks; phase 2 merges the partials per key (sum of
    sums/counts, min of mins, max of maxes). Result equals the plain
    groupBy exactly for these aggregates (integer/decimal accumulation
    recommended for float determinism, as elsewhere).
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_aggs, phase2_aggs = [], []
    for out, expr in agg_exprs.items():
        fn, _, col = expr.partition("(")
        fn = fn.strip().lower()
        col = col.rstrip(")").strip()
        if fn not in mergers:
            raise ValueError(f"{fn!r} is not decomposable; use sum/count/min/max")
        # count(*) counts rows; count(col) must skip NULLs to match the
        # plain groupBy exactly — only rewrite the star/1 forms.
        if fn == "count":
            part = F.count("*") if col in ("*", "1", "") else F.count(col)
        else:
            part = getattr(F, fn)(col)
        phase1_aggs.append(part.alias(f"_p_{out}"))
        phase2_aggs.append(mergers[fn](f"_p_{out}").alias(out))
    # Salt choice only needs to SPREAD rows, not be stable: a task
    # retry may re-salt its rows differently, but every assignment
    # yields the same phase-2 merge for these decomposable aggregates,
    # so the result is deterministic even though the salt is not.
    # (Hashing row content instead would be retry-stable but collapses
    # when the hot key's rows are identical — the exact case salting
    # exists for.)
    salt: Column = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    phase1 = df.withColumn("_salt", salt).groupBy(key, "_salt").agg(*phase1_aggs)
    return phase1.groupBy(key).agg(*phase2_aggs)


def attach_group_totals(
    df: DataFrame, key: str, agg_exprs: dict[str, str], n_salts: int = SALT_BUCKETS
) -> DataFrame:
    """Skew-proof rewrite of the per-key WINDOW aggregate pattern
    (``F.sum(v).over(Window.partitionBy(key))`` — "attach each row its
    group total").

    The window form is the one aggregation shape Spark does NOT
    de-skew automatically: a window over a hot key materializes and
    sorts that key's every row on ONE task (map-side partial
    aggregation de-skews plain groupBy, the two-level (key, value)
    rewrite de-skews count-distinct, AQE de-skews joins — but no
    optimizer rescues partitionBy(hot_key)). This rewrite computes the
    per-key aggregates with ``salted_agg`` (two balanced shuffles) and
    broadcasts the small per-key result back onto the rows — identical
    output, no single-task hot partition, measured ≥2× faster at one
    key = 50% of rows (bench.py skew entries).

    The join is NULL-SAFE on the key: window partitionBy places NULL
    keys in one partition and gives them totals like any other group
    (and groupBy aggregates them likewise), so a plain equi-join here
    would silently drop every NULL-key row — the one divergence from
    the window form this rewrite must not have."""
    totals = salted_agg(df, key, agg_exprs, n_salts).withColumnRenamed(key, "_gk")
    return (
        df.join(F.broadcast(totals), F.col(key).eqNullSafe(F.col("_gk")))
        .drop("_gk")
    )


def salted_window(
    df: DataFrame,
    key: str,
    agg_exprs: dict[str, str],
    n_salts: int = SALT_BUCKETS,
) -> DataFrame:
    """Skew-proof drop-in for the per-key window-aggregate pattern::

        w = Window.partitionBy(key)
        df.withColumn("total", F.sum("v").over(w))
           .withColumn("n", F.count("*").over(w))

    becomes::

        salted_window(df, key, {"total": "sum(v)", "n": "count(*)"})

    Identical output (NULL keys included, via a null-safe join), but no
    single-task hot partition: the per-key aggregates run as a salted
    two-phase groupBy over ``n_salts``× more tasks and the tiny per-key
    result broadcasts back onto the rows. The window form is the one
    aggregation shape Spark does NOT de-skew automatically — map-side
    partial aggregation rescues plain groupBy, the two-level rewrite
    rescues count-distinct, AQE rescues joins, but nothing rescues
    ``partitionBy(hot_key)``.

    Measured A/B (bench.py skew entries, sf0.1 ⇒ 1e7 rows with ONE key
    holding 50% of them, local[32], median of 3 warm reps): plain
    window 4.97 s vs this rewrite 1.90 s — 2.6×; the gap widens with
    the hot key's share and with total data volume, because the plain
    form's ceiling is one task sorting the hot key's every row.

    Supports the decomposable aggregates {sum, count, min, max}
    (``salted_agg``). Non-decomposable window functions (row_number,
    rank, lag) genuinely need the ordered partition and cannot be
    salted — for those, bound the partition instead (e.g. bucket the
    hot key by a secondary column).
    """
    return attach_group_totals(df, key, agg_exprs, n_salts)


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 8, path: str | None = None
) -> None:
    """Materialize a table bucketed (and sorted) on the join key; joins
    between two tables bucketed the same way need no Exchange, and a
    join whose keys are a superset of the bucket key reads the table
    pre-partitioned (HashPartitioning(key) satisfies any clustering
    that contains the key).

    ``path`` makes it an external table at that location — callers that
    may run inside a session they don't own (the driver contract) use
    this so no spark-warehouse directory appears under an arbitrary
    working directory."""
    w = df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key).format("parquet")
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def materialize_json_attr(
    df: DataFrame, json_col: str, field: str, out_col: str, cast: str | None = None
) -> DataFrame:
    """The Spark answer to the reference's GIN index on JSONB attributes
    (sql/01-init-timescaledb.sql:23): extract the hot JSON path ONCE at
    write time into a typed top-level column. Readers then filter on the
    materialized column, which parquet serves with min/max row-group
    pruning and pushed predicates — a JSON-path predicate can never be
    pushed below the parse. Write the result partitioned/sorted on the
    extracted column for partition pruning on top.
    """
    col = F.get_json_object(F.col(json_col), f"$.{field}")
    if cast is not None:
        col = col.cast(cast)
    return df.withColumn(out_col, col)


def _interleave_bits(a: Column, b: Column, bits: int) -> Column:
    """Bit-interleave two ``bits``-wide non-negative ints (Morton/Z
    curve): z = ... b1 a1 b0 a0. Pure column arithmetic — constant-
    folded shifts, no UDF, stays inside whole-stage codegen."""
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 32,
    bits: int = 8,
) -> None:
    """Z-order (Morton-curve) data layout on two columns: the multi-
    dimensional clustering that makes parquet min/max row-group pruning
    effective for predicates on EITHER or BOTH columns — the open-source
    Spark twin of Delta/Databricks OPTIMIZE ZORDER BY.

    Why it matters at 100 TB: sorting by one column makes its min/max
    ranges tight but leaves every other column's ranges full-width in
    every file; a filter on a second dimension then prunes nothing. The
    Z-curve interleaves the bit-patterns of both dimensions, so a
    range-partitioned sort on the curve gives every file a small
    RECTANGLE of (a, b) space — footer stats become selective in both
    dimensions and pushed filters skip whole row groups
    (tests/test_scale.py measures the scan's numOutputRows collapsing
    vs an unclustered layout on identical data + predicate).

    Normalization is equal-width bucketing over the observed [min, max]
    (one tiny aggregate; two driver scalars). Equal-DEPTH bucketing
    (quantile cutpoints via approxQuantile) drops in for heavily skewed
    columns; equal-width keeps the write path one-pass and is the right
    default for the roughly uniform keys here.

    The z-value is a WRITE-TIME layout device only — dropped after the
    sort, invisible to readers, no query rewrite needed (unlike
    bucketing, which changes the read-side plan).
    """
    n_buckets = 1 << bits

    def _col_expr(c: str) -> Column:
        dt = dict(df.dtypes)[c]
        if dt.startswith("timestamp"):  # timestamp and timestamp_ntz
            # NTZ → TIMESTAMP (session tz is UTC) → long epoch seconds;
            # this expression alone defines the normalization — the
            # min/max bounds below are aggregates of the SAME expression
            return F.col(c).cast("timestamp").cast("long").cast("double")
        if dt == "date":
            # toordinal-compatible: days since year-1, scaled to seconds
            return (F.datediff(F.col(c), F.lit("0001-01-01")) + 1).cast(
                "double"
            ) * 86400.0
        return F.col(c).cast("double")

    # Bounds are derived IN-PLAN over the same numeric expression the
    # bucketing uses (min/max of _col_expr, not of the raw column), so
    # the driver only ever sees two doubles per axis — no driver-side
    # datetime conversion, hence no dependence on the driver process's
    # OS timezone (collect() renders TimestampType via local tz).
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(_col_expr(col_a)),
        F.max(_col_expr(col_a)),
        F.min(_col_expr(col_b)),
        F.max(_col_expr(col_b)),
    ).collect()[0]
    for c, v in ((col_a, lo_a), (col_b, lo_b)):
        if v is None:
            raise ValueError(
                f"write_zordered: layout column {c!r} casts to all-NULL "
                "double — z-ordering needs an ordered numeric domain "
                "(hash string keys to longs first)"
            )

    def norm(c: str, flo: float, fhi: float) -> Column:
        if fhi == flo:
            return F.lit(0).cast("long")
        scaled = (_col_expr(c) - F.lit(flo)) / F.lit(fhi - flo)
        return F.least(
            F.lit(n_buckets - 1).cast("long"),
            F.greatest(F.lit(0).cast("long"), F.floor(scaled * n_buckets)),
        )
    z = _interleave_bits(norm(col_a, lo_a, hi_a), norm(col_b, lo_b, hi_b), bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def enable_runtime_bloom_filters(
    spark: SparkSession,
    application_side_min_bytes: int | None = None,
    creation_side_max_bytes: int | None = None,
) -> dict[str, str | None]:
    """Turn on Catalyst's runtime bloom-filter injection for selective
    shuffle joins — the third leg of the 100 TB join toolkit next to
    broadcast (small dims) and bucketing (recurring keys).

    When a fact⋈dim join's dim side carries a selective predicate,
    InjectRuntimeFilter builds a bloom filter over the dim join keys at
    runtime and pushes a ``might_contain`` predicate into the FACT
    side's scan — rows whose keys cannot match are dropped before the
    shuffle, which is exactly where a 100 TB fact table pays its cost.
    This is the runtime analogue of partition pruning for predicates
    that don't align with the partition layout.

    The two thresholds gate when injection is worthwhile: the creation
    side must be small enough to build the filter cheaply
    (``creationSideThreshold``, default 10 MB) and the application side
    big enough to repay it (``applicationSideScanSizeThreshold``,
    default 10 GB — at 100 TB every fact scan qualifies; tests lower it
    to demonstrate the plan shape at small SF). Returns the previous
    conf values so callers can restore them.
    """
    changes = {"spark.sql.optimizer.runtime.bloomFilter.enabled": "true"}
    if application_side_min_bytes is not None:
        changes[
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        ] = str(application_side_min_bytes)
    if creation_side_max_bytes is not None:
        changes[
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
        ] = str(creation_side_max_bytes)
    prev: dict[str, str | None] = {}
    for k, v in changes.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    return prev


def compact_parquet(
    spark: SparkSession, src: str, dst: str, target_mb: int = 128
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(bytes / target_mb) right-sized files. The operational hygiene
    op every long-running ingest needs — thousands of per-trigger
    micro-batch files turn listing and task scheduling into the
    bottleneck long before data volume does. Sizing reads the file
    index (one metadata RPC), not the data; the rewrite is one
    shuffle-free coalesce when shrinking file count (a repartition
    shuffle only when the target count exceeds the scan's split count,
    i.e. when files must be SPLIT to hit the size target). Returns the
    output file count."""
    import os
    import re

    def _canon(path: str) -> str:
        """Canonical identity for the in-place guard. Local paths go
        through realpath so symlink aliases of the same directory are
        caught; URI-scheme paths (file:/x, hdfs://, s3a://) are
        rejected outright — the Hadoop FS calls below would accept
        them, but this guard cannot resolve whether a URI aliases a
        local src (file:/x vs /x, scheme-default authorities), and a
        missed alias truncates the source under the lazy read."""
        if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*:", path):
            raise ValueError(
                f"compact_parquet: URI-scheme paths ({path!r}) are not "
                "supported — pass plain local filesystem paths (the "
                "in-place guard cannot prove a URI does not alias src)"
            )
        return os.path.realpath(path)

    if _canon(dst) == _canon(src):
        # The read plan is lazy: mode("overwrite") would truncate the
        # source directory before the scan tasks read it.
        raise ValueError(
            "compact_parquet: dst must differ from src (the overwrite "
            "would truncate the source under the lazy read) — write to "
            "a sibling directory and swap"
        )
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src)
    fs = p.getFileSystem(conf)
    size = fs.getContentSummary(p).getLength()
    n = int(max(1, -(-size // (target_mb * 1024 * 1024))))
    df = spark.read.parquet(src)
    # coalesce() can only shrink; growing the file count needs a real
    # repartition or the size target is silently unmet.
    cur = df.rdd.getNumPartitions()
    sized = df.coalesce(n) if n <= cur else df.repartition(n)
    sized.write.mode("overwrite").parquet(dst)
    q = jvm.org.apache.hadoop.fs.Path(dst)
    return sum(
        1
        for st in fs.listStatus(q)
        if st.getPath().getName().endswith(".parquet")
    )
