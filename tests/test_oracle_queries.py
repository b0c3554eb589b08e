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


def test_q12_variants_equal_consolidated_slices(spark, sf_dir):
    """The six q12 set-op variants were demoted to rows-only when
    their oracles were consolidated into q12_set_ops (one slot, six
    op-tagged slices — VERDICT r10 #1). This pins each variant to its
    slice of the oracle-backed frame, so the single driver row still
    certifies all six; the randomized set-op fuzz differential covers
    shapes the handwritten family doesn't."""
    combined = engine.QUERIES["q12_set_ops"](spark, sf_dir).collect()
    by_op = {}
    for r in combined:
        by_op.setdefault(r["op"], []).append(r["nkey"])
    variants = {
        "UNION": "q12_union",
        "UNION ALL": "q12_union_all",
        "INTERSECT": "q12_intersect",
        "EXCEPT": "q12_except",
        "INTERSECT ALL": "q12_intersect_all",
        "EXCEPT ALL": "q12_except_all",
    }
    assert set(by_op) <= set(variants)
    for op, name in variants.items():
        got = [r["nkey"] for r in engine.QUERIES[name](spark, sf_dir).collect()]
        assert got == sorted(by_op.get(op, [])), name


def test_q14d_battery_slices_match_variants(spark, sf_dir):
    """q14b_cube / q14c_grouping_sets were demoted to rows-only when
    their oracles were consolidated into q14d_grouping_battery (one
    slot, two op-tagged slices — VERDICT r12 #3, the q12 pattern).
    This pins each variant's full result to its slice of the
    oracle-backed frame, so the single driver row still certifies
    both grouping shapes."""
    combined = engine.QUERIES["q14d_grouping_battery"](spark, sf_dir).collect()
    cols = ("o_orderstatus", "o_orderpriority", "g_status", "g_prio", "n")
    by_op = {}
    for r in combined:
        by_op.setdefault(r["op"], []).append(tuple(r[c] for c in cols))
    assert set(by_op) == {"CUBE", "GROUPING SETS"}
    for op, name in (("CUBE", "q14b_cube"), ("GROUPING SETS", "q14c_grouping_sets")):
        got = [
            tuple(r[c] for c in cols)
            for r in engine.QUERIES[name](spark, sf_dir).collect()
        ]
        key = lambda t: tuple((v is None, v) for v in t)
        assert sorted(got, key=key) == sorted(by_op[op], key=key), name


def test_q06_anti_join_non_vacuous_on_planted_fixture(spark, tmp_path):
    """The driver fixture is DEGENERATE for q06 at sf0.01: every
    customer has an order, so the green (0 rows == 0 rows) driver row
    never exercises anti-join semantics. This runs the REGISTERED
    query and the REGISTERED oracle SQL on a planted fixture where the
    anti-join must return real rows (order-less customers, duplicate
    orders per customer, and an order pointing at a nonexistent
    customer, which must NOT resurrect anyone) — the non-vacuous twin
    of the driver check. The randomized join-family fuzz differential
    covers the same semantics over derived NULL/duplicate keys."""
    import duckdb

    fixture = str(tmp_path / "sf")
    spark.createDataFrame(
        [(i,) for i in range(1, 11)], "c_custkey bigint"
    ).write.parquet(f"{fixture}/customer.parquet")
    # customers 1-6 have orders (some several); 7-10 have none; 99 is
    # an orphan FK that must not affect the result
    orders = [(100 + j, c) for j, c in enumerate([1, 1, 2, 3, 3, 3, 4, 5, 6, 99])]
    spark.createDataFrame(
        orders, "o_orderkey bigint, o_custkey bigint"
    ).write.parquet(f"{fixture}/orders.parquet")

    got = engine.QUERIES["q06_anti_join"](spark, fixture).collect()
    assert [r["c_custkey"] for r in got] == [7, 8, 9, 10]

    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{fixture}/{t}.parquet/*.parquet'"
        )
    ok, msg = compare(
        engine.QUERIES["q06_anti_join"](spark, fixture),
        con,
        engine.ORACLE["q06_anti_join"],
    )
    con.close()
    assert ok, msg
