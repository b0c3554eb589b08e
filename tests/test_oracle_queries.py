"""t2-style correctness: every registered query with an oracle must match
DuckDB on the testdata (order-insensitive value compare, columns sorted
by name) — the local mirror of the driver's CORRECTNESS gate."""

import pytest

import real_time_event_streaming_analytics_platform_spark as engine

from .conftest import SF_DIR
from .oracle import compare, duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


ORACLE_KEYS = sorted(engine.ORACLE.keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match(spark, sf_dir, duck, name):
    df = engine.QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, duck, engine.ORACLE[name])
    assert ok, f"{name}: {msg}"


def test_all_queries_run(spark, sf_dir):
    # Queries without an oracle still must run and return a DataFrame.
    no_oracle = set(engine.QUERIES) - set(engine.ORACLE)
    for name in sorted(no_oracle):
        df = engine.QUERIES[name](spark, sf_dir)
        assert df.count() >= 0, name
