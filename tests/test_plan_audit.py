"""Repo-wide physical-plan audit: no registered query may contain a
cartesian product or a row-at-a-time Python UDF (BatchEvalPython).
Arrow-batched Python (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas)
is the sanctioned Python path. Runs at sf0.001 because some builders
(x2e, x3c) execute eagerly while constructing their result plan."""

import pytest

import real_time_event_streaming_analytics_platform_spark as engine

TINY_SF = "/root/testdata/sf0.001"

FORBIDDEN = ["CartesianProduct", "BatchEvalPython"]


def _formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.mark.parametrize("name", sorted(engine.QUERIES))
def test_no_cartesian_or_row_python(spark, name):
    plan = _formatted_plan(engine.QUERIES[name](spark, TINY_SF))
    for op in FORBIDDEN:
        assert op not in plan, f"{name}: {op} in physical plan"
