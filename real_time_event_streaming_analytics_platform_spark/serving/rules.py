"""Alert rule matching (O27, services/alert-service/main.py:66-71,
99-119, 179-184): an alert matches a rule iff the rule is enabled, its
source list is empty or contains the alert's source, and the severity
equals the rule's threshold.

Spark-first shape: alerts ⋈ broadcast(rules) with the predicate in the
join condition — rules are tiny even at scale, so the alert stream never
shuffles; each alert row fans out to every rule it matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

RULE_SCHEMA = StructType(
    [
        StructField("rule_id", StringType()),
        StructField("enabled", BooleanType()),
        StructField("sources", ArrayType(StringType())),  # empty = all
        StructField("severity_threshold", StringType()),
    ]
)


def make_rules(spark, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, RULE_SCHEMA)


def match_rules(alerts: DataFrame, rules: DataFrame) -> DataFrame:
    """(alert columns…, rule_id) for every (alert, rule) match."""
    # A NULL sources list means match-all, like an empty one (the
    # reference's `not rule.sources`, alert-service main.py:182) —
    # size(NULL) is NULL, so test isNull explicitly or the predicate
    # silently drops the rule.
    cond = (
        F.col("enabled")
        & (
            F.col("sources").isNull()
            | (F.size("sources") == 0)
            | F.expr("array_contains(sources, source)")
        )
        & (F.col("severity") == F.col("severity_threshold"))
    )
    return alerts.join(F.broadcast(rules), cond).drop(
        "enabled", "sources", "severity_threshold"
    )


def rule_matching_writer(rules_path: str, out_path: str):
    """foreachBatch rule matcher with PER-BATCH rule reload (O27's
    dynamic half: the reference's alert service reads its rule set per
    evaluation — alert-service main.py:66-71, 99-119 — so toggling a
    rule takes effect on the next event, without restarting anything).

    A plan-embedded broadcast(rules) freezes the rule set at query
    start; re-reading the rules table inside foreachBatch re-resolves
    it every micro-batch, so an updated rules parquet takes effect at
    the next trigger while the stream (and its checkpoint lineage)
    keeps running. Scale: the re-read is one tiny-file scan + broadcast
    per trigger — rules are KB-sized at any corpus scale; the alert
    batch itself still never shuffles (S22 pins the mid-stream toggle
    semantics)."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # SNAPSHOT the rules once per batch: collect the tiny table to
        # the driver, validate it, and rebuild a local DataFrame from
        # that snapshot. With two lazy reads (a guard count + the match
        # join), a non-atomic overwrite landing BETWEEN them could pass
        # the guard yet match against a partially written rule set and
        # commit the partial result silently — the single collect
        # closes that window because the guard and the match see the
        # exact same rows.
        rule_rows = (
            spark.read.schema(RULE_SCHEMA).parquet(rules_path).collect()
        )
        # Guard against the non-atomic overwrite window: parquet
        # overwrite deletes files before committing replacements, and
        # the explicit schema makes an empty directory read SUCCEED
        # with zero rows — a trigger landing mid-swap would then match
        # nothing and commit, silently dropping the batch's alerts
        # into an append-only sink forever. Failing the batch instead
        # fails the query; the checkpoint replays this epoch on
        # restart, converting silent loss into at-least-once delivery.
        # (Swap rules atomically — write a temp dir then rename — to
        # avoid hitting this at all; a rules table with genuinely zero
        # rows is indistinguishable from a half-deleted one, so it is
        # rejected too.)
        if not rule_rows:
            raise RuntimeError(
                f"rules table at {rules_path} read empty — mid-swap "
                "window or truly empty; failing the batch so the "
                "checkpoint replays it (swap rules via temp-dir+rename)"
            )
        rules = spark.createDataFrame(rule_rows, RULE_SCHEMA)
        (
            match_rules(batch_df, rules)
            .withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("append")
            .parquet(out_path)
        )

    return write
