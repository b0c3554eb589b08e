"""Spark ↔ DuckDB oracle comparison, mirroring the driver's check:
row-count + schema-arity + order-insensitive value comparison with
columns sorted by name."""

from __future__ import annotations

import math

import duckdb

from real_time_event_streaming_analytics_platform_spark.catalog import TABLES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{table_path(sf_dir, name)}'"
        )
    return con


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and fix float noise surviving ROUND(x, 2)
        return round(v, 9) + 0.0
    return v


def compare(spark_df, con, sql: str, sort_cols=True):
    """Return (ok, message). Columns sorted by name, rows as multisets."""
    sdf = spark_df
    scols = list(sdf.columns)
    srows = [tuple(r) for r in sdf.collect()]

    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    if sorted(scols) != sorted(dcols):
        return False, f"column mismatch: spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"row count mismatch: spark={len(srows)} duck={len(drows)}"

    sidx = [scols.index(c) for c in sorted(scols)]
    didx = [dcols.index(c) for c in sorted(dcols)]
    s_set = sorted(
        (tuple(_norm(row[i]) for i in sidx) for row in srows),
        key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t),
    )
    d_set = sorted(
        (tuple(_norm(row[i]) for i in didx) for row in drows),
        key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t),
    )
    if s_set != d_set:
        diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:5]
        return False, f"value mismatch; first diffs (spark, duck): {diffs}"
    return True, "ok"
