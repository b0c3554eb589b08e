"""Variant parquet shredding made observable (VERDICT r05 #6).

r13b's docstring claims the VARIANT path benefits from "parquet variant
shredding when persisted". These tests pin that the claim is TRUE on
this Spark build (4.1.2), not aspirational:

- the parquet footer of a persisted variant column contains per-field
  ``typed_value`` groups (the parquet variant-shredding physical
  layout), under the session defaults — no special conf needed
  (``spark.sql.variant.writeShredding.enabled`` and
  ``inferShreddingSchema`` default true here);
- reading an extraction back, ``pushVariantIntoScan`` collapses the
  scan's ReadSchema to a struct of ONLY the requested fields — the
  whole variant binary is never materialized, which is the 100 TB win
  (column pruning inside the semi-structured blob);
- the shredded round-trip returns exactly what the in-memory variant
  plan (r13b itself) returns.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from real_time_event_streaming_analytics_platform_spark.catalog import load


def _variant_events(spark, sf_dir):
    return load(spark, sf_dir, "events").select(
        "event_id", F.parse_json("props").alias("v")
    )


def _data_footer_schema(spark, path: str) -> str:
    """Parquet footer schema string of the first data file, via the
    JVM parquet reader (pyarrow in this env cannot parse the VARIANT
    logical type)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            rd = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(
                conf, st.getPath()
            )
            try:
                return (
                    rd.getFooter().getFileMetaData().getSchema().toString()
                )
            finally:
                rd.close()
    raise AssertionError(f"no parquet data file under {path}")


@pytest.fixture(scope="module")
def shredded_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("variant") / "events_variant")
    _variant_events(spark, sf_dir).write.mode("overwrite").parquet(path)
    return path


def test_persisted_variant_is_shredded(spark, shredded_path):
    footer = _data_footer_schema(spark, shredded_path)
    # the VARIANT group must carry a typed_value group (shredded
    # layout), not just the metadata/value binary pair
    assert "typed_value" in footer, footer
    # props is {"k": int, ...}: the inferred shredding schema must have
    # lifted k into a typed int64 column
    assert "required group k" in footer or "optional group k" in footer, footer
    assert "int64 typed_value" in footer, footer


def test_extraction_scan_prunes_to_requested_field(spark, shredded_path):
    back = spark.read.parquet(shredded_path)
    q = back.select(F.try_variant_get("v", "$.k", "int").alias("k"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    # pushVariantIntoScan replaces the variant with a struct of ONLY
    # the requested fields: the scan must read a 1-field struct, not
    # the variant binary
    assert "ReadSchema: struct<v:struct<0:int>>" in plan, plan


def test_shredded_roundtrip_matches_in_memory_variant_plan(
    spark, sf_dir, shredded_path
):
    back = spark.read.parquet(shredded_path)
    got = sorted(
        (r["k"], r["c"])
        for r in back.groupBy(
            F.try_variant_get("v", "$.k", "int").alias("k")
        )
        .agg(F.count("*").alias("c"))
        .collect()
    )
    want = sorted(
        (r["k"], r["c"])
        for r in _variant_events(spark, sf_dir)
        .groupBy(F.try_variant_get("v", "$.k", "int").alias("k"))
        .agg(F.count("*").alias("c"))
        .collect()
    )
    assert got == want and len(got) > 0
