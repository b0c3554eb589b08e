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
