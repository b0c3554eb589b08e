"""Shared helpers for oracle-comparable query builders.

Cross-engine determinism scheme
-------------------------------
Spark's ROUND(double, 2) converts through the shortest-string BigDecimal
(HALF_UP on the decimal rendering) while DuckDB rounds the raw double
bits — the two disagree exactly at .xx5 midpoints, which small-group
averages of 2-dp data hit constantly. We therefore never use native
ROUND on doubles in oracle-facing output. Instead:

- ``round2(x) = floor(x * 100 + 0.5) / 100`` evaluated identically in
  both engines — any deterministic function of bitwise-identical inputs
  is bitwise identical.
- Sums/averages of raw columns go through exact DECIMAL(18,6)
  accumulation, cast back to DOUBLE: the decimal sum is exact in both
  engines, so the double it converts to is bitwise identical, and the
  average (exact-sum / count) likewise.

Both helpers have a Spark (Column) and a DuckDB (SQL-snippet) form so
query builders and oracle strings stay in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

DEC = "decimal(18,6)"


def fmt_ts(col) -> Column:
    """Render a timestamp as a TZ-proof wall-clock string (oracle outputs
    never expose raw timestamp objects: Spark µs vs DuckDB ns would hash
    differently; second-precision strings agree everywhere)."""
    return F.date_format(col, TS_FMT_SPARK)


def round2(col) -> Column:
    """Cross-engine-deterministic ROUND(x, 2).

    Precondition: finite input. Spark FLOOR(double)→BIGINT maps NaN→0 and
    ±Inf→Long.MIN/MAX while DuckDB propagates them, so oracle-facing
    doubles must be NaN/Inf-free (guaranteed by the davg/dsum decimal
    accumulation and the sd>0 guards upstream).
    """
    if isinstance(col, str):
        col = F.col(col)
    return F.floor(col * 100 + F.lit(0.5)) / 100


def quant6(col) -> Column:
    """Quantize a double to 1e-6 before THRESHOLD comparisons.

    Cross-engine window aggregates (AVG/STDDEV_POP over a frame) can differ
    in the final ULPs between Spark and DuckDB; comparing the raw double
    against a constant (z > 3) lets that noise flip borderline rows into or
    out of the result on one engine only. Quantizing both sides first makes
    the comparison see identical inputs unless the true value sits within
    ~1e-12 of a 5e-7 boundary.
    """
    if isinstance(col, str):
        col = F.col(col)
    return F.floor(col * 1000000 + F.lit(0.5)) / 1000000


def dsum(col) -> Column:
    """Exact sum of a ~2-dp double column, returned as DOUBLE."""
    if isinstance(col, str):
        col = F.col(col)
    return F.sum(col.cast(DEC)).cast("double")


def davg(col) -> Column:
    """Exact-sum average of a double column, 2-dp rounded."""
    if isinstance(col, str):
        col = F.col(col)
    return round2(dsum(col) / F.count(F.lit(1)))


# --- DuckDB SQL snippet twins ---------------------------------------------


def sql_round2(x: str) -> str:
    return f"floor(({x}) * 100 + 0.5) / 100"


def sql_quant6(x: str) -> str:
    return f"floor(({x}) * 1000000 + 0.5) / 1000000"


def sql_dsum(x: str) -> str:
    return f"CAST(SUM(CAST({x} AS DECIMAL(18,6))) AS DOUBLE)"


def sql_davg(x: str) -> str:
    return sql_round2(f"{sql_dsum(x)} / COUNT(*)")
