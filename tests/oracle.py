"""Spark ↔ DuckDB oracle comparison, mirroring the driver's check:
row-count + schema-arity + order-insensitive value comparison with
columns sorted by name, BOTH sides fetched through Arrow/pandas.

The pandas round-trip matters: the driver hashes pandas frames, where
an int64 column and a float64 column hash differently even when every
value is integral (DuckDB HUGEINT → float64 ``1.0`` vs Spark int64
``1`` — the exact artifact that turned q23 red in CORRECTNESS_r03
while a ``fetchall()``-based local harness stayed green, because
Python's ``1 == 1.0``).  Pandas also promotes nullable int columns to
float64-with-NaN on both sides identically, so fetching both sides the
same way is the only faithful mirror.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from real_time_event_streaming_analytics_platform_spark.catalog import TABLES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{table_path(sf_dir, name)}'"
        )
    return con


def _norm(v):
    """Normalize a pandas-path scalar to a (type-class, value) pair.

    The type class participates in equality so an int64/float64 split
    between the two engines is a local failure, not just a driver one.
    """
    if v is None:
        return ("n", None)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        # collapse -0.0 / 0.0 and fix float noise surviving ROUND(x, 2)
        return ("f", round(v, 9) + 0.0)
    if isinstance(v, int):
        return ("i", v)
    return ("o", v)


def _from_pandas(x):
    """pandas/numpy scalar → plain python, identically for both engines."""
    if x is None:
        return None
    if isinstance(x, float) and math.isnan(x):
        return float("nan")
    if x is pd.NaT:  # NaT != NaT would otherwise report a false mismatch
        return None
    if hasattr(x, "to_pydatetime"):  # pandas.Timestamp
        try:
            v = x.to_pydatetime()
            # NaT.to_pydatetime() returns NaT rather than raising
            return None if v != v else v
        except (ValueError, AttributeError):
            return None
    import datetime

    if isinstance(x, datetime.date) and not isinstance(x, datetime.datetime):
        # DuckDB fetchdf renders DATE as datetime64 (midnight), Spark
        # toPandas as datetime.date — normalize to the datetime form so
        # a raw DATE column compares equal across engines.
        return datetime.datetime.combine(x, datetime.time())
    if hasattr(x, "tolist"):  # numpy scalar or array
        return _freeze(x.tolist())
    if isinstance(x, (list, tuple)):
        return _freeze(x)
    return x


def _freeze(x):
    if isinstance(x, list):
        return tuple(_freeze(v) for v in x)
    return x


def _rows(df):
    cols = list(df.columns)
    rows = [
        tuple(_from_pandas(x) for x in tup)
        for tup in df.itertuples(index=False, name=None)
    ]
    return cols, rows


def compare(spark_df, con, sql: str, sort_cols=True):
    """Return (ok, message). Columns sorted by name, rows as multisets."""
    scols, srows = _rows(spark_df.toPandas())
    dcols, drows = _rows(con.execute(sql).fetchdf())

    if sorted(scols) != sorted(dcols):
        return False, f"column mismatch: spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"row count mismatch: spark={len(srows)} duck={len(drows)}"

    sidx = [scols.index(c) for c in sorted(scols)]
    didx = [dcols.index(c) for c in sorted(dcols)]
    key = lambda t: tuple((x[0], str(x[1])) for x in t)  # noqa: E731
    s_set = sorted((tuple(_norm(row[i]) for i in sidx) for row in srows), key=key)
    d_set = sorted((tuple(_norm(row[i]) for i in didx) for row in drows), key=key)
    if s_set != d_set:
        diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:5]
        return False, f"value mismatch; first diffs (spark, duck): {diffs}"
    return True, "ok"
