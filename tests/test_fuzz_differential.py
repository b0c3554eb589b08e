"""Seeded differential fuzzing: randomly composed aggregation queries
run through BOTH engines from the same SQL text.

The handwritten oracle pairs pin the queries we thought of; this sweep
pins the ones we didn't — random (table, filter, group keys, aggregate)
combinations from a dialect-portable subset, executed by Spark SQL over
temp views and by DuckDB over the same parquet, compared through the
driver-mirroring harness (type-strict, order-insensitive). Seeds are
fixed, so a failure is reproducible by case number.

The generated subset deliberately stays inside the repo's determinism
conventions (operators/helpers.py): double sums go through
DECIMAL(18,6) accumulation (exact in both engines), averages are
exact-sum/count rounded via floor(x*100+0.5)/100, every output is
ordered by the full group key, and no engine-specific functions appear.
"""

import random

import pytest

from real_time_event_streaming_analytics_platform_spark.catalog import load

from .conftest import SF_DIR
from .oracle import compare, duck_connection

# (table, categorical group-key candidates, numeric cols, string cols)
_TABLES = {
    "events": (["event_type", "user_id"], ["value", "user_id"], ["event_type", "props"]),
    "orders": (
        ["o_orderstatus", "o_orderpriority"],
        ["o_totalprice", "o_custkey"],
        ["o_orderpriority"],
    ),
    "lineitem": (
        ["l_returnflag", "l_linestatus"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        ["l_returnflag"],
    ),
}

_N_CASES = 30


def _dsum(col: str) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,6))) AS DOUBLE)"


def _gen_case(rng: random.Random) -> tuple[str, str]:
    table = rng.choice(sorted(_TABLES))
    cats, nums, strs = _TABLES[table]
    keys = rng.sample(cats, rng.randint(1, len(cats)))
    aggs = ["COUNT(*) AS n"]
    for i in range(rng.randint(1, 3)):
        kind = rng.choice(["sum", "min", "max", "cnt", "dist", "avg"])
        col = rng.choice(nums if kind in ("sum", "avg") else nums + strs)
        if kind == "sum":
            aggs.append(f"{_dsum(col)} AS a{i}")
        elif kind == "avg":
            aggs.append(
                f"floor({_dsum(col)} / COUNT(*) * 100 + 0.5) / 100 AS a{i}"
            )
        elif kind == "cnt":
            aggs.append(f"COUNT({col}) AS a{i}")
        elif kind == "dist":
            aggs.append(f"COUNT(DISTINCT {col}) AS a{i}")
        else:
            aggs.append(f"{kind.upper()}({col}) AS a{i}")
    where = ""
    if rng.random() < 0.6:
        col = rng.choice(nums)
        op = rng.choice([">", "<", ">=", "<="])
        # constants inside each table's typical numeric range
        c = round(rng.uniform(1, 100), 2)
        where = f" WHERE {col} {op} {c}"
    key_list = ", ".join(keys)
    sql = (
        f"SELECT {key_list}, {', '.join(aggs)} FROM {table}{where} "
        f"GROUP BY {key_list} ORDER BY {key_list}"
    )
    return table, sql


@pytest.fixture(scope="module")
def views(spark):
    for t in _TABLES:
        load(spark, SF_DIR, t).createOrReplaceTempView(t)
    con = duck_connection(SF_DIR)
    return con


def test_fuzzed_aggregations_match_duckdb(spark, views):
    rng = random.Random(20260814)
    failures = []
    for case in range(_N_CASES):
        _, sql = _gen_case(rng)
        ok, msg = compare(spark.sql(sql), views, sql)
        if not ok:
            failures.append((case, sql, msg))
    assert not failures, failures[:3]


def test_fuzzed_joins_match_duckdb(spark, views):
    """Join-shaped cases: orders x customer on the FK, random group key
    from either side, random safe aggregates, optional HAVING."""
    load(spark, SF_DIR, "customer").createOrReplaceTempView("customer")
    rng = random.Random(77)
    failures = []
    for case in range(15):
        keys = rng.sample(
            ["c_mktsegment", "o_orderstatus", "c_nationkey", "o_orderpriority"],
            rng.randint(1, 2),
        )
        aggs = ["COUNT(*) AS n", f"{_dsum('o_totalprice')} AS s"]
        if rng.random() < 0.5:
            aggs.append("COUNT(DISTINCT o_custkey) AS d")
        having = " HAVING COUNT(*) > 3" if rng.random() < 0.4 else ""
        key_list = ", ".join(keys)
        sql = (
            f"SELECT {key_list}, {', '.join(aggs)} "
            f"FROM orders JOIN customer ON o_custkey = c_custkey "
            f"GROUP BY {key_list}{having} ORDER BY {key_list}"
        )
        ok, msg = compare(spark.sql(sql), views, sql)
        if not ok:
            failures.append((case, sql, msg))
    assert not failures, failures[:3]


def test_fuzzed_window_functions_match_duckdb(spark, views):
    """Window-function cases: ranking and frame aggregates over random
    partition keys, always with a total-order tiebreak (the unique key)
    so both engines produce identical rankings."""
    rng = random.Random(4242)
    failures = []
    specs = {
        "orders": ("o_orderkey", ["o_orderstatus", "o_orderpriority"], "o_totalprice"),
        "lineitem": ("l_orderkey, l_linenumber", ["l_returnflag", "l_linestatus"], "l_quantity"),
        "events": ("event_id", ["event_type"], "value"),
    }
    for case in range(15):
        table = rng.choice(sorted(specs))
        uniq, parts, num = specs[table]
        part = rng.choice(parts)
        fn = rng.choice(
            [
                "ROW_NUMBER()",
                "RANK()",
                "DENSE_RANK()",
                f"COUNT(*) ",
                f"MIN({num})",
                f"MAX({num})",
            ]
        )
        frame = ""
        if fn not in ("ROW_NUMBER()", "RANK()", "DENSE_RANK()") and rng.random() < 0.5:
            frame = " ROWS BETWEEN 3 PRECEDING AND CURRENT ROW"
        sql = (
            f"SELECT {uniq}, {part}, {fn} OVER "
            f"(PARTITION BY {part} ORDER BY {num}, {uniq}{frame}) AS w "
            f"FROM {table} ORDER BY {part}, {num}, {uniq}"
        )
        ok, msg = compare(spark.sql(sql), views, sql)
        if not ok:
            failures.append((case, sql, msg))
    assert not failures, failures[:3]


def test_fuzzed_window_frames_match_duckdb(spark, views):
    """The window-surface sweep the basic window test avoids (VERDICT
    r07 #6): ranking + analytic + offset functions with explicit
    ROWS/RANGE frames over data that HAS NULL partition keys, NULL
    order keys, and heavily duplicated order keys (ties), both engines
    from identical SQL.

    Determinism rules per function class (ties exist in the data, the
    queries stay well-defined):
    - rank family (RANK/DENSE_RANK/PERCENT_RANK/CUME_DIST) and RANGE
      frames: peers are treated as a group, so ordering by the
      duplicated key alone is deterministic;
    - row-position functions (ROW_NUMBER/NTILE/LEAD/LAG/FIRST_VALUE/
      LAST_VALUE) and ROWS frames: the unique id joins the ORDER BY as
      a total-order tiebreak — ties still stress the sort, the result
      is unique;
    - NULL ordering is explicit (NULLS FIRST/LAST) in every case: the
      engines' defaults differ (Spark ASC=NULLS FIRST, DuckDB
      ASC=NULLS LAST), and relying on a default is a bug this sweep
      would otherwise mask;
    - RANGE offset frames require a non-NULL numeric order key (the
      NULL peer-group semantics for offset frames are underspecified
      across engines), so those cases filter ok IS NOT NULL;
    - window SUMs accumulate in DECIMAL and cast to DOUBLE at the end
      (exact in both engines for this data), never float accumulation.
    """
    rng = random.Random(808808)
    base = (
        "SELECT o_orderkey AS id, "
        "CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderstatus END AS pk, "
        "CASE WHEN o_orderkey % 13 = 0 THEN NULL "
        "ELSE CAST(o_custkey % 17 AS INTEGER) END AS ok, "
        "CAST(o_totalprice AS DECIMAL(18,6)) AS v "
        "FROM orders"
    )
    # every entry is a template over {over}; window SUM accumulates in
    # DECIMAL and casts OUTSIDE the OVER (exact in both engines)
    rank_fns = [
        "RANK() OVER ({over})",
        "DENSE_RANK() OVER ({over})",
        "PERCENT_RANK() OVER ({over})",
        "CUME_DIST() OVER ({over})",
    ]
    row_fns = [
        "ROW_NUMBER() OVER ({over})",
        "NTILE(4) OVER ({over})",
        "LEAD(id, 1, -1) OVER ({over})",
        "LAG(id, 2, -1) OVER ({over})",
        "FIRST_VALUE(id) OVER ({over})",
        "LAST_VALUE(id) OVER ({over})",
    ]
    # every DECIMAL-valued window result casts to DOUBLE OUTSIDE the
    # OVER: DuckDB's pandas bridge renders decimals as float, Spark
    # keeps Decimal objects, and the compare is type-strict
    agg_fns = [
        "CAST(SUM(v) OVER ({over}) AS DOUBLE)",
        "COUNT(*) OVER ({over})",
        "CAST(MIN(v) OVER ({over}) AS DOUBLE)",
        "CAST(MAX(v) OVER ({over}) AS DOUBLE)",
        "COUNT(ok) OVER ({over})",
    ]
    rows_frames = [
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN 3 PRECEDING AND 2 FOLLOWING",
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
    ]
    range_frames = [
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
    ]
    range_offset_frames = [
        "RANGE BETWEEN 3 PRECEDING AND CURRENT ROW",
        "RANGE BETWEEN CURRENT ROW AND 5 FOLLOWING",
        "RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING",
    ]
    failures = []
    for case in range(26):
        direction = rng.choice(["ASC", "DESC"])
        nulls = rng.choice(["NULLS FIRST", "NULLS LAST"])
        where = ""
        kind = rng.choice(["rank", "row", "rows_agg", "range_agg", "range_off"])
        if kind == "rank":
            tmpl = rng.choice(rank_fns)
            over = f"PARTITION BY pk ORDER BY ok {direction} {nulls}"
        elif kind == "row":
            tmpl = rng.choice(row_fns)
            frame = ""
            if tmpl.startswith(("FIRST_VALUE", "LAST_VALUE")):
                frame = " " + rng.choice(rows_frames)
            over = (
                f"PARTITION BY pk ORDER BY ok {direction} {nulls}, id ASC{frame}"
            )
        elif kind == "rows_agg":
            tmpl = rng.choice(agg_fns)
            over = (
                f"PARTITION BY pk ORDER BY ok {direction} {nulls}, id ASC "
                + rng.choice(rows_frames)
            )
        elif kind == "range_agg":
            # RANGE + ties: the whole peer group enters the frame at
            # once — deterministic without a tiebreak, and the shape
            # where engines most often disagree
            tmpl = rng.choice(agg_fns[:3])
            over = f"PARTITION BY pk ORDER BY ok {direction} {nulls} " + rng.choice(
                range_frames
            )
        else:
            tmpl = rng.choice(agg_fns[:3])
            where = " WHERE ok IS NOT NULL"
            over = f"PARTITION BY pk ORDER BY ok {direction} " + rng.choice(
                range_offset_frames
            )
        expr = tmpl.format(over=over)
        sql = (
            f"WITH t AS ({base}) "
            f"SELECT id, pk, ok, {expr} AS w FROM t{where} "
            f"ORDER BY id"
        )
        ok_, msg = compare(spark.sql(sql), views, sql)
        if not ok_:
            failures.append((case, sql, msg))
    assert not failures, failures[:3]


def test_fuzzed_grouping_family_match_duckdb(spark, views):
    """ROLLUP / CUBE / GROUPING SETS over random categorical key pairs
    — the multi-level aggregation family the handwritten q14 trio pins
    at one shape each. Aggregates stay in the decimal-exact convention;
    subtotal rows carry NULL keys identically in both engines, and the
    compare is order-insensitive, so no ORDER BY gymnastics needed."""
    rng = random.Random(140682)
    failures = []
    for case in range(12):
        table = rng.choice(sorted(_TABLES))
        cats, nums, _ = _TABLES[table]
        keys = rng.sample(cats, 2) if len(cats) >= 2 else cats
        key_list = ", ".join(keys)
        form = rng.choice(
            [
                f"ROLLUP ({key_list})",
                f"CUBE ({key_list})",
                f"GROUPING SETS (({key_list}), ({keys[0]}), ())",
            ]
        )
        col = rng.choice(nums)
        sql = (
            f"SELECT {key_list}, COUNT(*) AS n, {_dsum(col)} AS s "
            f"FROM {table} GROUP BY {form}"
        )
        ok, msg = compare(spark.sql(sql), views, sql)
        if not ok:
            failures.append((case, sql, msg))
    assert not failures, failures[:3]


def test_fuzzed_set_operations_match_duckdb(spark, views):
    """UNION / INTERSECT / EXCEPT, set and bag forms, over random
    single-column projections with disjoint-ish range predicates —
    the q12 family at shapes the handwritten six don't enumerate."""
    rng = random.Random(90210)
    failures = []
    for case in range(12):
        table = rng.choice(sorted(_TABLES))
        cats, nums, strs = _TABLES[table]
        col = rng.choice(cats + strs)
        num = rng.choice(nums)
        a, b = sorted([round(rng.uniform(1, 80), 2), round(rng.uniform(20, 100), 2)])
        op = rng.choice(
            ["UNION", "UNION ALL", "INTERSECT", "EXCEPT", "INTERSECT ALL", "EXCEPT ALL"]
        )
        sql = (
            f"SELECT {col} FROM {table} WHERE {num} <= {b} "
            f"{op} "
            f"SELECT {col} FROM {table} WHERE {num} >= {a}"
        )
        ok, msg = compare(spark.sql(sql), views, sql)
        if not ok:
            failures.append((case, sql, msg))
    assert not failures, failures[:3]


def test_fuzzed_scalar_projections_match_duckdb(spark, views):
    """Row-level scalar pipelines (string ops, CASE, COALESCE/NULLIF,
    arithmetic) over random columns — the q16/q19 family at
    compositions the handwritten pair doesn't enumerate. Stays in the
    dialect-portable subset: no engine-specific functions, division
    guarded by NULLIF, ordered by the unique key."""
    rng = random.Random(61803)
    uniq = {"events": "event_id", "orders": "o_orderkey", "lineitem": "l_orderkey, l_linenumber"}
    failures = []
    for case in range(12):
        table = rng.choice(sorted(_TABLES))
        cats, nums, strs = _TABLES[table]
        s = rng.choice(strs)
        n = rng.choice(nums)
        exprs = []
        for i in range(rng.randint(2, 4)):
            kind = rng.choice(["upper", "substr", "len", "concat", "case", "coalesce", "arith"])
            if kind == "upper":
                exprs.append(f"UPPER(CAST({s} AS STRING)) AS e{i}")
            elif kind == "substr":
                exprs.append(f"SUBSTR(CAST({s} AS STRING), 1, {rng.randint(1, 5)}) AS e{i}")
            elif kind == "len":
                exprs.append(f"LENGTH(CAST({s} AS STRING)) AS e{i}")
            elif kind == "concat":
                exprs.append(f"CAST({s} AS STRING) || '_' || CAST({n} AS STRING) AS e{i}")
            elif kind == "case":
                c = round(rng.uniform(1, 100), 2)
                exprs.append(f"CASE WHEN {n} > {c} THEN 'hi' ELSE 'lo' END AS e{i}")
            elif kind == "coalesce":
                exprs.append(f"COALESCE(NULLIF(CAST({s} AS STRING), ''), 'empty') AS e{i}")
            else:
                d = round(rng.uniform(1, 10), 2)
                # decimal-exact accumulation-free arithmetic; NULLIF
                # guards the divisor
                exprs.append(
                    f"floor(CAST({n} AS DOUBLE) / NULLIF({d}, 0) * 100 + 0.5) / 100 AS e{i}"
                )
        key = uniq[table]
        sql = f"SELECT {key}, {', '.join(exprs)} FROM {table} ORDER BY {key}"
        ok, msg = compare(spark.sql(sql), views, sql)
        if not ok:
            failures.append((case, sql, msg))
    assert not failures, failures[:3]


def test_fuzzed_join_family_match_duckdb(spark, views):
    """Join-FAMILY sweep (VERDICT r06 #4): inner / left / full equi-
    and theta-joins plus EXISTS/NOT-EXISTS semi/anti forms, over
    derived key columns engineered to exercise the two classic join
    hazards — NULL keys (via NULLIF, which every equi-join must drop,
    never match) and DUPLICATE keys (via modulo compression, which
    multiplies matched rows). Both engines run the identical SQL text;
    the semi/anti forms use portable EXISTS instead of engine-specific
    SEMI JOIN syntax (they compile to the same semi/anti join nodes —
    the plan-audit test shows Spark's LeftSemi/LeftAnti here). Mirrors
    the join surface the reference delegates wholesale to PostgreSQL
    (SURVEY §2b)."""
    load(spark, SF_DIR, "customer").createOrReplaceTempView("customer")
    rng = random.Random(70707)
    failures = []
    for case in range(28):
        mod = rng.choice([7, 19, 37, 101])
        # NULLIF plants nulls on one or both sides; small moduli plant
        # heavy key duplication on both sides simultaneously
        null_a = rng.randint(0, mod - 1)
        null_b = rng.choice([null_a, rng.randint(0, mod - 1)])
        pred_a = rng.choice(["", f" WHERE o_orderkey % 13 < {rng.randint(4, 12)}"])
        pred_b = rng.choice(["", f" WHERE c_custkey % 11 < {rng.randint(4, 10)}"])
        a_def = (
            f"SELECT o_orderkey AS id, NULLIF(o_custkey % {mod}, {null_a}) AS k, "
            f"o_totalprice AS v FROM orders{pred_a}"
        )
        b_def = (
            f"SELECT c_custkey AS id, NULLIF(c_custkey % {mod}, {null_b}) AS k, "
            f"c_acctbal AS w FROM customer{pred_b}"
        )
        kind = rng.choice(
            ["inner", "left", "full", "semi", "anti", "theta_inner", "theta_left"]
        )
        if kind in ("semi", "anti"):
            neg = "NOT " if kind == "anti" else ""
            sql = (
                f"WITH a AS ({a_def}), b AS ({b_def}) "
                f"SELECT a.id, a.k FROM a WHERE {neg}EXISTS "
                f"(SELECT 1 FROM b WHERE b.k = a.k) ORDER BY a.id"
            )
        else:
            theta = ""
            if kind.startswith("theta"):
                theta = f" AND a.v {rng.choice(['<', '>='])} b.w * {rng.randint(2, 9)}"
            jt = {
                "inner": "JOIN",
                "theta_inner": "JOIN",
                "left": "LEFT JOIN",
                "theta_left": "LEFT JOIN",
                "full": "FULL JOIN",
            }[kind]
            # grouped projection keeps multiplied-row outputs compact;
            # COUNT(*) counts null-extended rows, COUNT(b.id) doesn't —
            # both engines must agree on exactly that split
            sql = (
                f"WITH a AS ({a_def}), b AS ({b_def}) "
                f"SELECT a.k AS k, COUNT(*) AS n, COUNT(b.id) AS nb, "
                f"{_dsum('b.w')} AS s "
                f"FROM a {jt} b ON a.k = b.k{theta} GROUP BY a.k"
            )
        ok, msg = compare(spark.sql(sql), views, sql)
        if not ok:
            failures.append((case, kind, sql, msg))
    assert not failures, failures[:3]


def test_fuzzed_temporal_functions_match_duckdb(spark, views):
    """date_trunc / EXTRACT / DATE-cast compositions over the events
    timestamp — the r3/r12/q20 temporal family at random granularities
    (portable subset verified: both engines truncate and extract
    identically on TIMESTAMP in a UTC session)."""
    rng = random.Random(31415)
    failures = []
    units = ["year", "month", "day", "hour", "minute"]
    extracts = ["year", "month", "day", "hour", "minute"]
    for case in range(10):
        mode = rng.choice(["trunc_group", "extract_group", "project"])
        if mode == "trunc_group":
            u = rng.choice(units)
            sql = (
                f"SELECT date_trunc('{u}', ts) AS g, COUNT(*) AS n, "
                f"CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s "
                f"FROM events GROUP BY 1 ORDER BY 1"
            )
        elif mode == "extract_group":
            e1, e2 = rng.sample(extracts, 2)
            sql = (
                f"SELECT EXTRACT({e1} FROM ts) AS a, EXTRACT({e2} FROM ts) AS b, "
                f"COUNT(*) AS n FROM events GROUP BY 1, 2 ORDER BY 1, 2"
            )
        else:
            u = rng.choice(units)
            e = rng.choice(extracts)
            sql = (
                f"SELECT event_id, date_trunc('{u}', ts) AS g, "
                f"EXTRACT({e} FROM ts) AS x, CAST(ts AS DATE) AS d "
                f"FROM events ORDER BY event_id"
            )
        ok, msg = compare(spark.sql(sql), views, sql)
        if not ok:
            failures.append((case, sql, msg))
    assert not failures, failures[:3]


def test_fuzzed_subquery_family_match_duckdb(spark, views):
    """Subquery-FAMILY sweep: correlated scalar aggregates in SELECT
    (the COUNT-over-empty-group trap — both engines must return 0, not
    NULL), IN / NOT IN with NULLIF-planted nulls in the list (the
    three-valued-logic trap: one NULL in a NOT IN list empties the
    result), uncorrelated scalar comparisons, and HAVING against a
    scalar subquery. Complements the join-family sweep, which covers
    EXISTS/NOT EXISTS; together they span the subquery surface the
    reference delegates to PostgreSQL (SURVEY §2b, q15/q31 family).
    All aggregates are exact (COUNT/MIN/MAX/decimal SUM) so the
    comparison is bit-strict."""
    load(spark, SF_DIR, "customer").createOrReplaceTempView("customer")
    rng = random.Random(27182)
    failures = []
    for case in range(24):
        kind = rng.choice(
            ["scalar_corr", "in_list", "not_in_null", "scalar_uncorr", "having_sub", "in_agg"]
        )
        if kind == "scalar_corr":
            # correlated scalar COUNT/MIN over lineitem per order; the
            # quantity predicate guarantees some orders have NO matching
            # rows (COUNT must yield 0 there, MIN must yield NULL)
            agg = rng.choice(["COUNT(*)", "COUNT(l.l_orderkey)", "MIN(l.l_linenumber)"])
            q = round(rng.uniform(10, 45), 2)
            sql = (
                f"SELECT o.o_orderkey, o.o_orderstatus, "
                f"(SELECT {agg} FROM lineitem l "
                f"WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > {q}) AS sub "
                f"FROM orders o WHERE o.o_orderkey % 97 < {rng.randint(2, 5)} "
                f"ORDER BY o.o_orderkey"
            )
        elif kind == "in_list":
            bal = round(rng.uniform(-500, 5000), 2)
            sql = (
                f"SELECT o_orderstatus, COUNT(*) AS n, {_dsum('o_totalprice')} AS s "
                f"FROM orders WHERE o_custkey IN "
                f"(SELECT c_custkey FROM customer WHERE c_acctbal > {bal}) "
                f"GROUP BY o_orderstatus ORDER BY o_orderstatus"
            )
        elif kind == "not_in_null":
            # NULLIF plants a NULL in the NOT IN list for some seeds
            # (when any c_custkey % mod == j exists) — then the whole
            # result must be empty in BOTH engines; other seeds leave
            # the list null-free and the result non-empty
            mod = rng.choice([7, 19, 37])
            j = rng.randint(0, mod + 2)  # j > mod-1 → no null planted
            sql = (
                f"SELECT o_orderstatus, COUNT(*) AS n FROM orders "
                f"WHERE (o_custkey % {mod}) NOT IN "
                f"(SELECT NULLIF(c_custkey % {mod}, {j}) FROM customer "
                f"WHERE c_custkey % 5 = 0) "
                f"GROUP BY o_orderstatus ORDER BY o_orderstatus"
            )
        elif kind == "scalar_uncorr":
            op = rng.choice([">", "<="])
            frac = rng.randint(2, 9)
            sql = (
                f"SELECT l_returnflag, COUNT(*) AS n, MAX(l_quantity) AS mx "
                f"FROM lineitem WHERE l_extendedprice {op} "
                f"(SELECT MAX(o_totalprice) FROM orders) / {frac} "
                f"GROUP BY l_returnflag ORDER BY l_returnflag"
            )
        elif kind == "having_sub":
            mult = rng.randint(20, 400)
            sql = (
                f"SELECT o_orderpriority, COUNT(*) AS n FROM orders "
                f"GROUP BY o_orderpriority "
                f"HAVING COUNT(*) * {mult} > (SELECT COUNT(*) FROM customer) "
                f"ORDER BY o_orderpriority"
            )
        else:  # in_agg: IN over a grouped+HAVING derived key set
            k = rng.randint(2, 6)
            sql = (
                f"SELECT o_orderstatus, COUNT(*) AS n FROM orders "
                f"WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem "
                f"GROUP BY l_orderkey HAVING COUNT(*) >= {k}) "
                f"GROUP BY o_orderstatus ORDER BY o_orderstatus"
            )
        ok, msg = compare(spark.sql(sql), views, sql)
        if not ok:
            failures.append((case, kind, sql, msg))
    assert not failures, failures[:3]


def test_fuzzed_aggregate_modifiers_match_duckdb(spark, views):
    """Aggregate-MODIFIER sweep: the aggregate surface the base sweep
    (plain SUM/MIN/MAX/COUNT/DISTINCT/AVG) doesn't reach — FILTER
    (WHERE ...) clauses, SUM(DISTINCT), BOOL_AND/BOOL_OR over
    predicates, statistical aggregates (STDDEV_POP/VAR_SAMP/CORR/
    COVAR_POP), and the ordered-set MEDIAN / PERCENTILE_CONT ...
    WITHIN GROUP forms. Mirrors the rolling/stat shapes of reference
    O20/O23 (`AnomalyDetectionJob.java` stddev + percentile logic) in
    their plain-GROUP-BY form, both engines from identical SQL text.

    Determinism: additive aggregates go through DECIMAL(18,6); the
    float-producing stats are floor-rounded with a 1e-7 tie-break
    epsilon AND restricted to low-magnitude columns. Both halves are
    load-bearing: 2-decimal source data puts VAR_SAMP*1e4 EXACTLY on
    the .5 rounding boundary for small groups ((d^2/2)*1e4 = k+0.5
    when d has 2 decimals), so ~1e-15 cross-engine noise flips a bare
    floor — the epsilon breaks the tie identically on both sides, and
    the magnitude cap keeps the noise below the epsilon. Raw COVAR_POP
    is replaced by a DECIMAL-exact cross-product sum (its numerator
    core) because covariance magnitudes scale with the column product
    and outgrow any fixed quantum. MODE and LISTAGG are deliberately
    excluded: tie-breaking / dialect syntax diverge."""
    rng = random.Random(31415926)
    # corr pair / low-magnitude stat cols (noise << rounding quantum)
    stat_pairs = {
        "events": ("value", "user_id"),
        "lineitem": ("l_quantity", "l_discount"),
        "orders": ("o_totalprice", "o_custkey"),
    }
    stat_cols = {
        "events": ["value"],
        "lineitem": ["l_quantity", "l_discount"],
        "orders": [],  # o_totalprice ~1e5: var*1e4 noise > quantum
    }
    failures = []
    for case in range(26):
        table = rng.choice(sorted(_TABLES))
        cats, nums, _strs = _TABLES[table]
        keys = rng.sample(cats, rng.randint(1, len(cats)))
        a, b = stat_pairs[table]
        aggs = ["COUNT(*) AS n"]
        for i in range(rng.randint(2, 3)):
            kind = rng.choice(
                ["filter_sum", "filter_cnt", "sum_distinct", "bool",
                 "stddev", "var", "median", "pctl", "corr", "covar"]
            )
            if kind in ("stddev", "var", "median", "pctl") and not stat_cols[table]:
                kind = "corr"  # no low-magnitude stat col on this table
            col = rng.choice(nums)
            scol = rng.choice(stat_cols[table]) if stat_cols[table] else None
            pred_col = rng.choice(nums)
            thresh = round(rng.uniform(1, 100), 2)
            if kind == "filter_sum":
                aggs.append(
                    f"CAST(SUM(CAST({col} AS DECIMAL(18,6))) "
                    f"FILTER (WHERE {pred_col} > {thresh}) AS DOUBLE) AS a{i}"
                )
            elif kind == "filter_cnt":
                aggs.append(
                    f"COUNT(*) FILTER (WHERE {pred_col} <= {thresh}) AS a{i}"
                )
            elif kind == "sum_distinct":
                aggs.append(
                    f"CAST(SUM(DISTINCT CAST({col} AS DECIMAL(18,6))) AS DOUBLE) AS a{i}"
                )
            elif kind == "bool":
                fn = rng.choice(["BOOL_AND", "BOOL_OR"])
                aggs.append(f"{fn}({pred_col} > {thresh}) AS a{i}")
            elif kind == "stddev":
                aggs.append(
                    f"floor(STDDEV_POP({scol}) * 10000 + 0.5 + 1e-7) / 10000 AS a{i}"
                )
            elif kind == "var":
                aggs.append(
                    f"floor(VAR_SAMP({scol}) * 10000 + 0.5 + 1e-7) / 10000 AS a{i}"
                )
            elif kind == "median":
                aggs.append(
                    f"floor(MEDIAN({scol}) * 10000 + 0.5 + 1e-7) / 10000 AS a{i}"
                )
            elif kind == "pctl":
                q = rng.choice(["0.25", "0.5", "0.9"])
                aggs.append(
                    f"floor(PERCENTILE_CONT({q}) WITHIN GROUP (ORDER BY {scol}) "
                    f"* 10000 + 0.5 + 1e-7) / 10000 AS a{i}"
                )
            elif kind == "corr":
                aggs.append(
                    f"floor(CORR({a}, {b}) * 10000 + 0.5 + 1e-7) / 10000 AS a{i}"
                )
            else:  # covar numerator core, DECIMAL-exact in both engines
                aggs.append(
                    f"CAST(SUM(CAST({a} AS DECIMAL(18,6)) "
                    f"* CAST({b} AS DECIMAL(18,6))) AS DOUBLE) AS a{i}"
                )
        where = ""
        if rng.random() < 0.5:
            wcol = rng.choice(nums)
            where = f" WHERE {wcol} {rng.choice(['>', '<='])} {round(rng.uniform(1, 100), 2)}"
        key_list = ", ".join(keys)
        sql = (
            f"SELECT {key_list}, {', '.join(aggs)} FROM {table}{where} "
            f"GROUP BY {key_list} ORDER BY {key_list}"
        )
        ok, msg = compare(spark.sql(sql), views, sql)
        if not ok:
            failures.append((case, sql, msg))
    assert not failures, failures[:3]


def test_fuzzed_order_limit_match_duckdb(spark, views):
    """ORDER BY / LIMIT / OFFSET sweep with EXPLICIT NULLS FIRST/LAST.

    Sort-boundary semantics are the one family where the engines'
    DEFAULTS genuinely diverge (Spark: NULLS FIRST for ASC / LAST for
    DESC; DuckDB: NULLS LAST everywhere) — every handwritten top-k
    query (q11, q31) therefore pins explicit null ordering, and this
    sweep fuzzes that convention: derived null-bearing sort keys (via
    NULLIF over modulo-compressed values, planting both NULLs and
    heavy ties), random direction x null-placement per key, and a
    LIMIT/OFFSET window cut into the tied region. The trailing
    unique-key tiebreak makes the selected subset deterministic, so
    the order-insensitive compare is exact: any divergence in null
    placement or offset arithmetic changes WHICH rows survive the
    LIMIT, not just their order."""
    rng = random.Random(271828)
    uniq = {
        "events": "event_id",
        "orders": "o_orderkey",
        "lineitem": "l_orderkey, l_linenumber",
    }
    failures = []
    for case in range(16):
        table = rng.choice(sorted(_TABLES))
        cats, nums, strs = _TABLES[table]
        key = uniq[table]
        sort_terms, proj = [], []
        for i in range(rng.randint(1, 2)):
            if rng.random() < 0.7:
                n = rng.choice(nums)
                mod = rng.choice([3, 5, 11])
                null_at = rng.randint(0, mod - 1)
                # FLOOR before the integer cast: CAST(DOUBLE AS BIGINT)
                # truncates toward zero in Spark but rounds half-away
                # in DuckDB — FLOOR is the dialect-portable form (found
                # by this sweep's first run, case 3)
                proj.append(
                    f"NULLIF(CAST(FLOOR({n}) AS BIGINT) % {mod}, {null_at}) AS s{i}"
                )
            else:
                s = rng.choice(strs)
                proj.append(
                    f"NULLIF(SUBSTR(CAST({s} AS STRING), 1, 2), 'cl') AS s{i}"
                )
            direction = rng.choice(["ASC", "DESC"])
            nulls = rng.choice(["NULLS FIRST", "NULLS LAST"])
            sort_terms.append(f"s{i} {direction} {nulls}")
        limit = rng.randint(5, 40)
        offset = rng.choice([0, 0, rng.randint(1, 25)])
        tail = f"LIMIT {limit}" + (f" OFFSET {offset}" if offset else "")
        sql = (
            f"SELECT {key}, {', '.join(proj)} FROM {table} "
            f"ORDER BY {', '.join(sort_terms)}, {key} {tail}"
        )
        ok, msg = compare(spark.sql(sql), views, sql)
        if not ok:
            failures.append((case, sql, msg))
    assert not failures, failures[:3]


def test_fuzzed_regexp_functions_match_duckdb(spark, views):
    """Regexp sweep: the text/dedup/retrieval family rides on regex
    splitting and extraction, where the engines use DIFFERENT regex
    machines (Spark: java.util.regex; DuckDB: RE2) — this sweep pins
    the shared-semantics subset those operators must stay inside.
    Portability constraints baked into the generator: no lookaround or
    backreferences (RE2 lacks them), and every regexp_replace pattern
    is ANCHORED (^ or $) so at most one match exists — DuckDB replaces
    only the FIRST match by default while Spark replaces ALL, so
    unanchored replace over identical SQL text is a known divergence,
    not a target. regexp_extract group indices are always explicit
    (idx 0 = whole match, both engines; no-match yields '' in both)."""
    rng = random.Random(16180)
    uniq = {
        "events": "event_id",
        "orders": "o_orderkey",
        "lineitem": "l_orderkey, l_linenumber",
    }
    classes = ["[0-9]+", "[a-z]+", "[a-z0-9]+", "[^a-z]+", "[aeiou]"]
    failures = []
    for case in range(16):
        table = rng.choice(sorted(_TABLES))
        cats, nums, strs = _TABLES[table]
        key = uniq[table]
        exprs = []
        for i in range(rng.randint(2, 3)):
            s = rng.choice(strs)
            src = f"CAST({s} AS STRING)"
            kind = rng.choice(["extract", "extract_grp", "replace", "len_sub"])
            cls = rng.choice(classes)
            if kind == "extract":
                exprs.append(f"regexp_extract({src}, '{cls}', 0) AS e{i}")
            elif kind == "extract_grp":
                # two adjacent capture groups; explicit group index
                g = rng.randint(1, 2)
                exprs.append(
                    f"regexp_extract({src}, '([a-z]+)([^a-z]*)', {g}) AS e{i}"
                )
            elif kind == "replace":
                anchor = rng.choice(["^", "$"])
                pat = f"^{cls}" if anchor == "^" else f"{cls}$"
                exprs.append(
                    f"regexp_replace({src}, '{pat}', '#') AS e{i}"
                )
            else:
                # regex-derived length arithmetic: composes extract
                # with the scalar surface
                exprs.append(
                    f"LENGTH(regexp_extract({src}, '{cls}', 0)) AS e{i}"
                )
        sql = f"SELECT {key}, {', '.join(exprs)} FROM {table} ORDER BY {key}"
        ok, msg = compare(spark.sql(sql), views, sql)
        if not ok:
            failures.append((case, sql, msg))
    assert not failures, failures[:3]


def test_fuzzed_array_functions_match_duckdb(spark, views):
    """Array / higher-order-function sweep: the dedup/retrieval/vocab
    operators (d3 shingles, x16 postings, x18 chunker, x20/x22 BPE
    folds) all ride on split → transform/filter/aggregate pipelines.
    The two engines name these differently (Spark transform/filter/
    aggregate/size vs DuckDB list_transform/list_filter/list_sum/len),
    so this sweep generates PAIRED dialect texts from one template —
    same shape, mapped function names — and compares results. Mapped
    divergences baked into the generator: DuckDB list_sum returns NULL
    on empty lists (Spark's fold returns the init) → COALESCE on the
    duck side; list_distinct does not preserve first-occurrence order
    (Spark array_distinct does) → distinct only under count or sort;
    out-of-range indexing uses try_element_at (Spark ANSI mode throws)
    vs list_extract (NULL in DuckDB)."""
    import random as _random

    load(spark, SF_DIR, "documents").createOrReplaceTempView("documents")
    rng = _random.Random(31415)
    srcs = {
        "events": ("event_id", ["props", "event_type"], "value"),
        "documents": ("doc_id", ["text", "source"], "n_chars"),
    }

    def base(col):
        s = f"lower(CAST({col} AS STRING))"
        return (
            f"filter(split({s}, '[^a-z0-9]+'), x -> x != '')",
            f"list_filter(string_split_regex({s}, '[^a-z0-9]+'), x -> x != '')",
        )

    def gen_op(i, A_s, A_d, num):
        kind = rng.choice(
            ["len_fold", "long_words", "sorted_join", "distinct_n",
             "contains", "head_join", "elem", "seq_sum", "rev_join", "max_len"]
        )
        if kind == "len_fold":
            return (
                f"aggregate(transform({A_s}, x -> length(x)), 0L,"
                f" (acc, x) -> acc + x) AS e{i}",
                f"COALESCE(CAST(list_sum(list_transform({A_d},"
                f" x -> length(x))) AS BIGINT), 0) AS e{i}",
            )
        if kind == "long_words":
            c = rng.randint(2, 6)
            return (
                f"size(filter({A_s}, x -> length(x) >= {c})) AS e{i}",
                f"len(list_filter({A_d}, x -> length(x) >= {c})) AS e{i}",
            )
        if kind == "sorted_join":
            return (
                f"array_join(array_sort({A_s}), '-') AS e{i}",
                f"array_to_string(list_sort({A_d}, 'ASC'), '-') AS e{i}",
            )
        if kind == "distinct_n":
            return (
                f"size(array_distinct({A_s})) AS e{i}",
                f"len(list_distinct({A_d})) AS e{i}",
            )
        if kind == "contains":
            w = rng.choice(["a", "the", "data", "click", "0"])
            return (
                f"array_contains({A_s}, '{w}') AS e{i}",
                f"list_contains({A_d}, '{w}') AS e{i}",
            )
        if kind == "head_join":
            k = rng.randint(1, 4)
            return (
                f"array_join(slice({A_s}, 1, {k}), '.') AS e{i}",
                f"array_to_string(list_slice({A_d}, 1, {k}), '.') AS e{i}",
            )
        if kind == "elem":
            j = rng.randint(1, 5)
            return (
                f"try_element_at({A_s}, {j}) AS e{i}",
                f"list_extract({A_d}, {j}) AS e{i}",
            )
        if kind == "seq_sum":
            n = f"CAST(FLOOR(abs({num})) AS BIGINT) % 7 + 1"
            return (
                f"aggregate(sequence(1, {n}), 0L, (acc, x) -> acc + x) AS e{i}",
                f"COALESCE(CAST(list_sum(generate_series(1, {n})) AS BIGINT), 0)"
                f" AS e{i}",
            )
        if kind == "rev_join":
            return (
                f"array_join(reverse({A_s}), '|') AS e{i}",
                f"array_to_string(list_reverse({A_d}), '|') AS e{i}",
            )
        return (
            f"array_max(transform({A_s}, x -> length(x))) AS e{i}",
            f"list_max(list_transform({A_d}, x -> length(x))) AS e{i}",
        )

    failures = []
    for case in range(18):
        table = rng.choice(sorted(srcs))
        key, cols, num = srcs[table]
        s_exprs, d_exprs = [], []
        for i in range(rng.randint(2, 3)):
            A_s, A_d = base(rng.choice(cols))
            es, ed = gen_op(i, A_s, A_d, num)
            s_exprs.append(es)
            d_exprs.append(ed)
        s_sql = f"SELECT {key}, {', '.join(s_exprs)} FROM {table} ORDER BY {key}"
        d_sql = f"SELECT {key}, {', '.join(d_exprs)} FROM {table} ORDER BY {key}"
        ok, msg = compare(spark.sql(s_sql), views, d_sql)
        if not ok:
            failures.append((case, s_sql, msg))
    assert not failures, failures[:3]


def test_fuzzed_string_functions_match_duckdb(spark, views):
    """String-scalar sweep: concat/substr/trim/pad/case-mapping/
    replace/position/repeat/reverse/left-right compositions over real
    string columns. Portability constraints baked in: SUBSTR always
    gets explicit positive start+length (negative starts differ);
    LPAD/RPAD get explicit pad strings (DuckDB has no default);
    POSITION uses the SQL-standard `IN` form both engines parse;
    TRIM is the plain whitespace form (the BTRIM character-set form
    differs in name)."""
    rng = random.Random(424243)
    uniq = {
        "events": "event_id",
        "orders": "o_orderkey",
        "lineitem": "l_orderkey, l_linenumber",
    }
    failures = []
    for case in range(16):
        table = rng.choice(sorted(_TABLES))
        cats, nums, strs = _TABLES[table]
        key = uniq[table]
        exprs = []
        for i in range(rng.randint(2, 4)):
            s = f"CAST({rng.choice(strs)} AS STRING)"
            kind = rng.choice(
                ["concat", "substr", "pad", "casemap", "replace",
                 "position", "repeat", "reverse", "leftright", "trimlen"]
            )
            if kind == "concat":
                exprs.append(f"CONCAT({s}, '_', UPPER({s})) AS e{i}")
            elif kind == "substr":
                a, b = rng.randint(1, 3), rng.randint(1, 6)
                exprs.append(f"SUBSTR({s}, {a}, {b}) AS e{i}")
            elif kind == "pad":
                n = rng.randint(4, 12)
                fn = rng.choice(["LPAD", "RPAD"])
                exprs.append(f"{fn}({s}, {n}, '*') AS e{i}")
            elif kind == "casemap":
                fn = rng.choice(["UPPER", "LOWER"])
                exprs.append(f"{fn}({s}) AS e{i}")
            elif kind == "replace":
                c = rng.choice(["a", "e", "o", "1"])
                exprs.append(f"REPLACE({s}, '{c}', '@') AS e{i}")
            elif kind == "position":
                c = rng.choice(["a", "ck", "x"])
                exprs.append(f"POSITION('{c}' IN {s}) AS e{i}")
            elif kind == "repeat":
                exprs.append(f"REPEAT(SUBSTR({s}, 1, 2), {rng.randint(1, 3)}) AS e{i}")
            elif kind == "reverse":
                exprs.append(f"REVERSE({s}) AS e{i}")
            elif kind == "leftright":
                fn = rng.choice(["LEFT", "RIGHT"])
                exprs.append(f"{fn}({s}, {rng.randint(1, 4)}) AS e{i}")
            else:
                exprs.append(f"LENGTH(TRIM(CONCAT(' ', {s}, '  '))) AS e{i}")
        sql = f"SELECT {key}, {', '.join(exprs)} FROM {table} ORDER BY {key}"
        ok, msg = compare(spark.sql(sql), views, sql)
        if not ok:
            failures.append((case, sql, msg))
    assert not failures, failures[:3]


def test_fuzzed_conditional_expressions_match_duckdb(spark, views):
    """Conditional-expression sweep: searched/simple CASE, COALESCE
    chains, NULLIF-planted nulls, LEAST/GREATEST over mixed columns —
    the branching surface every severity/rule/bucketing operator rides
    on (R13/R14, q19, the alert rules). Numeric branches stay integer
    (CAST(FLOOR(x) AS BIGINT)) so no float rounding enters; every
    branch list ends with an ELSE so both engines type the expression
    identically."""
    rng = random.Random(8675309)
    uniq = {
        "events": "event_id",
        "orders": "o_orderkey",
        "lineitem": "l_orderkey, l_linenumber",
    }
    failures = []
    for case in range(16):
        table = rng.choice(sorted(_TABLES))
        cats, nums, strs = _TABLES[table]
        key = uniq[table]
        exprs = []
        for i in range(rng.randint(2, 3)):
            n = f"CAST(FLOOR({rng.choice(nums)}) AS BIGINT)"
            s = f"CAST({rng.choice(strs)} AS STRING)"
            kind = rng.choice(
                ["searched_case", "simple_case", "coalesce", "nullif_chain",
                 "least_greatest", "nested"]
            )
            if kind == "searched_case":
                c1, c2 = sorted(rng.sample(range(1, 60), 2))
                exprs.append(
                    f"CASE WHEN {n} < {c1} THEN 'lo' WHEN {n} < {c2} THEN 'mid'"
                    f" ELSE 'hi' END AS e{i}"
                )
            elif kind == "simple_case":
                m = rng.choice([2, 3, 5])
                exprs.append(
                    f"CASE {n} % {m} WHEN 0 THEN 'z' WHEN 1 THEN 'one'"
                    f" ELSE 'rest' END AS e{i}"
                )
            elif kind == "coalesce":
                m = rng.choice([3, 7])
                v = rng.randint(0, m - 1)
                exprs.append(
                    f"COALESCE(NULLIF({n} % {m}, {v}), NULLIF({n} % 2, 0),"
                    f" -1) AS e{i}"
                )
            elif kind == "nullif_chain":
                exprs.append(
                    f"NULLIF(SUBSTR({s}, 1, 1), 'c') IS NULL AS e{i}"
                )
            elif kind == "least_greatest":
                fn = rng.choice(["LEAST", "GREATEST"])
                c = rng.randint(1, 40)
                exprs.append(f"{fn}({n} % 50, {c}, 25) AS e{i}")
            else:
                c = rng.randint(2, 20)
                exprs.append(
                    f"CASE WHEN COALESCE(NULLIF({n} % {c}, 0), {c}) > {c // 2}"
                    f" THEN LENGTH({s}) ELSE -LENGTH({s}) END AS e{i}"
                )
        sql = f"SELECT {key}, {', '.join(exprs)} FROM {table} ORDER BY {key}"
        ok, msg = compare(spark.sql(sql), views, sql)
        if not ok:
            failures.append((case, sql, msg))
    assert not failures, failures[:3]


def test_fuzzed_numeric_casts_match_duckdb(spark, views):
    """Numeric/cast-boundary sweep: integer division, modulo (incl.
    NEGATIVE dividends — both engines keep the dividend's sign),
    FLOOR/CEIL-then-cast, ABS/SIGN, and exact DECIMAL(18,6) arithmetic
    round-trips. Portability constraints baked in: raw doubles never
    cast straight to integers (CAST(DOUBLE AS BIGINT) truncates toward
    zero in Spark but rounds half-away in DuckDB — the divergence the
    ORDER-BY sweep found); division of integers uses explicit DOUBLE
    casts (DuckDB `/` on integers is float division, Spark's is not);
    no overflow is provoked (ANSI Spark throws where DuckDB wraps to
    HUGEINT — an intentional non-goal)."""
    rng = random.Random(99991)
    uniq = {
        "events": "event_id",
        "orders": "o_orderkey",
        "lineitem": "l_orderkey, l_linenumber",
    }
    failures = []
    for case in range(16):
        table = rng.choice(sorted(_TABLES))
        cats, nums, strs = _TABLES[table]
        key = uniq[table]
        exprs = []
        for i in range(rng.randint(2, 4)):
            n = f"CAST(FLOOR({rng.choice(nums)}) AS BIGINT)"
            kind = rng.choice(
                ["int_div", "neg_mod", "floor_ceil", "abs_sign",
                 "decimal_rt", "double_div"]
            )
            if kind == "int_div":
                d = rng.choice([3, 7, 11])
                exprs.append(f"CAST(FLOOR({n} / {d}.0) AS BIGINT) AS e{i}")
            elif kind == "neg_mod":
                d = rng.choice([3, 5, 7])
                exprs.append(f"(42 - {n}) % {d} AS e{i}")
            elif kind == "floor_ceil":
                fn = rng.choice(["FLOOR", "CEIL"])
                x = rng.choice(nums)
                exprs.append(f"CAST({fn}({x} / 3E0) AS BIGINT) AS e{i}")
            elif kind == "abs_sign":
                # SIGN returns DOUBLE in Spark, input-typed in DuckDB —
                # the explicit BIGINT cast is the portable form (found
                # by this sweep's first run, case 4)
                exprs.append(
                    f"ABS(21 - {n}) + CAST(SIGN(21 - {n}) AS BIGINT) AS e{i}"
                )
            elif kind == "decimal_rt":
                x = rng.choice(nums)
                exprs.append(
                    f"CAST(CAST({x} AS DECIMAL(18,6)) * 3 AS DOUBLE) AS e{i}"
                )
            else:
                x, y = rng.sample(nums, 2) if len(nums) >= 2 else (nums[0], nums[0])
                exprs.append(
                    f"CAST({x} AS DOUBLE) / (CAST(ABS({y}) AS DOUBLE) + 1E0)"
                    f" AS e{i}"
                )
        sql = f"SELECT {key}, {', '.join(exprs)} FROM {table} ORDER BY {key}"
        ok, msg = compare(spark.sql(sql), views, sql)
        if not ok:
            failures.append((case, sql, msg))
    assert not failures, failures[:3]


def test_fuzzed_json_functions_match_duckdb(spark, views):
    """JSON-function sweep (VERDICT r08 #7): the r13/r13b flatteners and
    the streaming DLQ ride on JSON path extraction, which had no fuzz
    coverage. Each case builds a nested JSON document per event row —
    identically in both dialects, from integer-only fields so number
    rendering can't diverge — truncates it to MALFORMED on every 7th
    row, then extracts through paired ops: get_json_object ↔
    json_extract_string (scalar paths, missing keys, out-of-range array
    indexes), raw-subtree extraction (both engines minify identically),
    json_array_length, sorted json_object_keys ↔ json_keys, typed
    try_cast coercion (Spark 4 ANSI CAST throws on 'click'→BIGINT;
    TRY forms are the portable pair), and Spark 4 VARIANT
    (try_parse_json + try_variant_get) against the same TRY_CAST twin.
    DuckDB json_* functions ERROR on malformed input where Spark
    returns NULL, so every duck-side op is guarded with json_valid —
    that guard asymmetry is itself a pinned finding of this sweep."""
    import random as _random

    rng = _random.Random(271828)

    j_spark = (
        "CONCAT('{\"id\": ', CAST(event_id AS STRING),"
        " ', \"u\": {\"uid\": ', CAST(user_id AS STRING),"
        " ', \"ty\": \"', event_type,"
        " '\"}, \"vals\": [', CAST(event_id % 5 AS STRING),"
        " ', ', CAST(user_id % 3 AS STRING),"
        " '], \"props\": ', props,"
        " ', \"flag\": ', CAST(user_id % 2 = 0 AS STRING), '}')"
    )
    j_duck = (
        "CONCAT('{\"id\": ', CAST(event_id AS VARCHAR),"
        " ', \"u\": {\"uid\": ', CAST(user_id AS VARCHAR),"
        " ', \"ty\": \"', event_type,"
        " '\"}, \"vals\": [', CAST(event_id % 5 AS VARCHAR),"
        " ', ', CAST(user_id % 3 AS VARCHAR),"
        " '], \"props\": ', props,"
        " ', \"flag\": ', CAST(user_id % 2 = 0 AS VARCHAR), '}')"
    )
    trunc = "CASE WHEN event_id % 7 = 0 THEN substr({j}, 1, length({j}) - 3) ELSE {j} END"

    num_paths = ["$.id", "$.u.uid", "$.vals[0]", "$.vals[1]", "$.props.k"]
    str_paths = ["$.u.ty", "$.flag", "$.nope", "$.u.zz", "$.vals[7]"] + num_paths
    obj_paths = ["$.u", "$.vals", "$.props"]

    def guard(expr):
        return f"CASE WHEN json_valid(j) THEN {expr} END"

    def gen_op(i):
        kind = rng.choice(
            ["scalar", "typed", "raw", "arrlen", "keys", "variant_i", "variant_s"]
        )
        if kind == "scalar":
            p = rng.choice(str_paths)
            return (
                f"get_json_object(j, '{p}') AS e{i}",
                f"{guard(f'''json_extract_string(j, '{p}')''')} AS e{i}",
            )
        if kind == "typed":
            p = rng.choice(num_paths)
            return (
                f"try_cast(get_json_object(j, '{p}') AS BIGINT) AS e{i}",
                f"{guard(f'''TRY_CAST(json_extract_string(j, '{p}') AS BIGINT)''')} AS e{i}",
            )
        if kind == "raw":
            p = rng.choice(obj_paths)
            return (
                f"get_json_object(j, '{p}') AS e{i}",
                f"{guard(f'''CAST(json_extract(j, '{p}') AS VARCHAR)''')} AS e{i}",
            )
        if kind == "arrlen":
            return (
                f"CAST(json_array_length(get_json_object(j, '$.vals')) AS BIGINT) AS e{i}",
                f"{guard('''CAST(json_array_length(j, '$.vals') AS BIGINT)''')} AS e{i}",
            )
        if kind == "keys":
            p = rng.choice(["$.u", "$.props"])
            return (
                f"array_join(array_sort(json_object_keys(get_json_object(j, '{p}'))), ',') AS e{i}",
                f"{guard(f'''array_to_string(list_sort(json_keys(j, '{p}'), 'ASC'), ',')''')} AS e{i}",
            )
        if kind == "variant_i":
            p = rng.choice(num_paths)
            return (
                f"try_variant_get(try_parse_json(j), '{p}', 'bigint') AS e{i}",
                f"{guard(f'''TRY_CAST(json_extract_string(j, '{p}') AS BIGINT)''')} AS e{i}",
            )
        p = rng.choice(["$.u.ty", "$.nope"])
        return (
            f"try_variant_get(try_parse_json(j), '{p}', 'string') AS e{i}",
            f"{guard(f'''json_extract_string(j, '{p}')''')} AS e{i}",
        )

    failures = []
    for case in range(18):
        s_exprs, d_exprs = [], []
        for i in range(rng.randint(2, 3)):
            es, ed = gen_op(i)
            s_exprs.append(es)
            d_exprs.append(ed)
        s_sql = (
            f"SELECT event_id, {', '.join(s_exprs)} FROM "
            f"(SELECT event_id, {trunc.format(j=j_spark)} AS j FROM events) "
            f"ORDER BY event_id"
        )
        d_sql = (
            f"SELECT event_id, {', '.join(d_exprs)} FROM "
            f"(SELECT event_id, {trunc.format(j=j_duck)} AS j FROM events) "
            f"ORDER BY event_id"
        )
        ok, msg = compare(spark.sql(s_sql), views, d_sql)
        if not ok:
            failures.append((case, s_sql, msg))
    assert not failures, failures[:3]


def test_fuzzed_map_struct_functions_match_duckdb(spark, views):
    """Map/struct-construction sweep: the sink formatters and r13/r31
    shapes build nested records, but no fuzz coverage existed for the
    MAP/STRUCT surface. Paired-dialect templates over real columns:
    map build + key lookup (Spark try_element_at returns value-or-NULL;
    DuckDB map_extract returns a LIST — empty when missing — so the
    duck twin is list_extract(map_extract(..), 1)), map_keys /
    map_values / map_entries renderings (sorted before joining — map
    iteration order is not contractual in either engine), map
    cardinality (size ↔ cardinality), struct field access
    (named_struct ↔ struct_pack), and whole-struct equality."""
    import random as _random

    rng = _random.Random(161803)

    m_spark = (
        "map('t', event_type, 'u', CAST(user_id AS STRING),"
        " 'v', CAST(CAST(FLOOR(value) AS BIGINT) AS STRING))"
    )
    m_duck = (
        "MAP(['t', 'u', 'v'], [event_type, CAST(user_id AS VARCHAR),"
        " CAST(CAST(FLOOR(value) AS BIGINT) AS VARCHAR)])"
    )
    s_spark = "named_struct('a', user_id % 5, 'b', event_type)"
    s_duck = "struct_pack(a := user_id % 5, b := event_type)"

    def gen_op(i):
        kind = rng.choice(
            ["lookup", "keys", "vals", "entries", "size", "field", "eq"]
        )
        if kind == "lookup":
            k = rng.choice(["t", "u", "v", "zz"])
            return (
                f"try_element_at({m_spark}, '{k}') AS e{i}",
                f"list_extract(map_extract({m_duck}, '{k}'), 1) AS e{i}",
            )
        if kind == "keys":
            return (
                f"array_join(array_sort(map_keys({m_spark})), ',') AS e{i}",
                f"array_to_string(list_sort(map_keys({m_duck}), 'ASC'), ',') AS e{i}",
            )
        if kind == "vals":
            return (
                f"array_join(array_sort(map_values({m_spark})), ',') AS e{i}",
                f"array_to_string(list_sort(map_values({m_duck}), 'ASC'), ',') AS e{i}",
            )
        if kind == "entries":
            return (
                f"array_join(array_sort(transform(map_entries({m_spark}),"
                f" p -> concat(p.key, '=', p.value))), '|') AS e{i}",
                f"array_to_string(list_sort(list_transform(map_entries({m_duck}),"
                f" p -> p.key || '=' || p.value), 'ASC'), '|') AS e{i}",
            )
        if kind == "size":
            return (
                f"CAST(size({m_spark}) AS BIGINT) AS e{i}",
                f"CAST(cardinality({m_duck}) AS BIGINT) AS e{i}",
            )
        if kind == "field":
            f_ = rng.choice(["a", "b"])
            cast = "CAST({x} AS STRING)" if f_ == "a" else "{x}"
            dcast = "CAST({x} AS VARCHAR)" if f_ == "a" else "{x}"
            return (
                f"{cast.format(x=f'({s_spark}).{f_}')} AS e{i}",
                f"{dcast.format(x=f'({s_duck}).{f_}')} AS e{i}",
            )
        return (
            f"({s_spark}) = named_struct('a', CAST(2 AS BIGINT), 'b', 'click') AS e{i}",
            f"({s_duck}) = struct_pack(a := CAST(2 AS BIGINT), b := 'click') AS e{i}",
        )

    failures = []
    for case in range(14):
        s_exprs, d_exprs = [], []
        for i in range(rng.randint(2, 3)):
            es, ed = gen_op(i)
            s_exprs.append(es)
            d_exprs.append(ed)
        s_sql = f"SELECT event_id, {', '.join(s_exprs)} FROM events ORDER BY event_id"
        d_sql = f"SELECT event_id, {', '.join(d_exprs)} FROM events ORDER BY event_id"
        ok, msg = compare(spark.sql(s_sql), views, d_sql)
        if not ok:
            failures.append((case, s_sql, msg))
    assert not failures, failures[:3]


def test_fuzzed_bitwise_functions_match_duckdb(spark, views):
    """Bitwise/integer-ops sweep: the SimHash near-dup path scores with
    bit_count(xor(sig_a, sig_b)) and the samplers/bucketers lean on
    masks and shifts, but the bitwise surface had no fuzz coverage.
    Paired ops over real integer columns: & | ^↔xor() ~ shifts
    bit_count hex. Divergences found by this sweep's first prototype,
    now baked into the generator as the portable forms: DuckDB ERRORS
    on left-shifting a negative number where Spark wraps (operands go
    through abs()); Spark getbit(x, n) indexes from the LSB while
    DuckDB get_bit(BIT, n) indexes from the MSB — the portable bit
    probe is (x >> n) & 1 on both engines."""
    import random as _random

    rng = _random.Random(655357)

    def operand():
        base = rng.choice(
            ["event_id", "user_id", "CAST(FLOOR(value * 100) AS BIGINT)"]
        )
        return f"abs(CAST({base} AS BIGINT))"

    def gen_op(i):
        kind = rng.choice(
            ["and", "or", "xor", "not", "shl", "shr", "bitcnt", "hexlo", "bitprobe"]
        )
        a, b = operand(), operand()
        n = rng.randint(0, 30)
        if kind == "and":
            return (f"({a} & {b}) AS e{i}", f"({a} & {b}) AS e{i}")
        if kind == "or":
            return (f"({a} | {b}) AS e{i}", f"({a} | {b}) AS e{i}")
        if kind == "xor":
            return (f"({a} ^ {b}) AS e{i}", f"xor({a}, {b}) AS e{i}")
        if kind == "not":
            return (f"~{a} AS e{i}", f"~{a} AS e{i}")
        if kind == "shl":
            # non-negative left operand only: DuckDB raises on negative
            return (
                f"shiftleft({a}, {n % 16}) AS e{i}",
                f"({a} << {n % 16}) AS e{i}",
            )
        if kind == "shr":
            return (f"shiftright({a}, {n}) AS e{i}", f"({a} >> {n}) AS e{i}")
        if kind == "bitcnt":
            return (
                f"bit_count({a} ^ {b}) AS e{i}",
                f"bit_count(xor({a}, {b})) AS e{i}",
            )
        if kind == "hexlo":
            return (f"lower(hex({a})) AS e{i}", f"lower(hex({a})) AS e{i}")
        # bit probe without getbit/get_bit (incompatible bit orders)
        return (
            f"(({a} >> {n}) & 1) AS e{i}",
            f"(({a} >> {n}) & 1) AS e{i}",
        )

    failures = []
    for case in range(14):
        s_exprs, d_exprs = [], []
        for i in range(rng.randint(2, 3)):
            es, ed = gen_op(i)
            s_exprs.append(es)
            d_exprs.append(ed)
        s_sql = f"SELECT event_id, {', '.join(s_exprs)} FROM events ORDER BY event_id"
        d_sql = f"SELECT event_id, {', '.join(d_exprs)} FROM events ORDER BY event_id"
        ok, msg = compare(spark.sql(s_sql), views, d_sql)
        if not ok:
            failures.append((case, s_sql, msg))
    assert not failures, failures[:3]


# ---------------------------------------------------------------------------
# Percentile / statistical-aggregate sweep (VERDICT r09 #7): the one
# numeric family that had no differential coverage — r5/r6/q41/x13 ride
# on it. Portable forms where the engines agree; paired texts where the
# dialects legitimately differ; degenerate groups (n=1, zero variance,
# NULL-heavy pairs) planted via a shared VALUES fixture.
#
# Divergences found on this sweep's first run, pinned below:
# - Spark corr() RAISES (ANSI DIVIDE_BY_ZERO) on a zero-variance group
#   where DuckDB returns NULL — the portable corr is
#   covar_pop / NULLIF(stddev_pop·stddev_pop, 0).
# - Spark kurtosis() is the POPULATION excess (g2, defined from n=1);
#   DuckDB kurtosis() is the bias-corrected SAMPLE excess (G2, NULL
#   until n=4). DuckDB's kurtosis_pop matches Spark's definition.
# - Spark skewness() is population g1 (defined from n=2 w/ variance);
#   DuckDB skewness() is sample G1 = g1·√(n(n−1))/(n−2), NULL until
#   n=3 — the bridge multiplies Spark's g1 by that factor.
# ---------------------------------------------------------------------------

_STAT_FIXTURE = """(VALUES
 (1, CAST(1.5 AS DOUBLE), CAST(2.0 AS DOUBLE)),
 (1, CAST(2.5 AS DOUBLE), CAST(4.0 AS DOUBLE)),
 (1, CAST(4.0 AS DOUBLE), CAST(5.5 AS DOUBLE)),
 (1, CAST(6.0 AS DOUBLE), CAST(5.0 AS DOUBLE)),
 (2, CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE)),
 (3, CAST(7.0 AS DOUBLE), CAST(2.0 AS DOUBLE)),
 (3, CAST(7.0 AS DOUBLE), CAST(3.0 AS DOUBLE)),
 (4, CAST(NULL AS DOUBLE), CAST(1.0 AS DOUBLE)),
 (4, CAST(NULL AS DOUBLE), CAST(2.0 AS DOUBLE)),
 (4, CAST(3.0 AS DOUBLE), CAST(NULL AS DOUBLE)),
 (4, CAST(4.0 AS DOUBLE), CAST(8.0 AS DOUBLE))) AS v(g, x, y)"""

# g=1: well-behaved n=4; g=2: n=1; g=3: zero x-variance; g=4: NULL-heavy
# (one complete (x, y) pair — covar_samp/regr see n=1 after pairwise
# deletion; percentiles see {3, 4} after NULL drop).


def _r4s(expr: str) -> str:
    return f"floor(({expr}) * 10000 + 0.5) / 10000"


def test_fuzzed_stat_aggregates_match_duckdb(spark, views):
    """Shared-text cases: variance/covariance families, the regr_*
    battery, exact percentile_cont/disc WITHIN GROUP, and median over
    the degenerate fixture AND randomized real-table groupings."""
    rng = random.Random(20260815)
    cases = []

    # fixture cases (shared text) — degenerate groups by construction
    cases.append(
        f"SELECT g, COUNT(*) AS n, stddev_samp(x) AS a, stddev_pop(x) AS b,"
        f" var_samp(x) AS c, var_pop(x) AS d"
        f" FROM {_STAT_FIXTURE} GROUP BY g ORDER BY g"
    )
    cases.append(
        f"SELECT g, covar_samp(x, y) AS a, covar_pop(x, y) AS b"
        f" FROM {_STAT_FIXTURE} GROUP BY g ORDER BY g"
    )
    cases.append(
        f"SELECT g, {_r4s('regr_slope(y, x)')} AS a,"
        f" {_r4s('regr_intercept(y, x)')} AS b, {_r4s('regr_r2(y, x)')} AS c,"
        f" regr_count(y, x) AS d, regr_avgx(y, x) AS e, regr_avgy(y, x) AS f"
        f" FROM {_STAT_FIXTURE} GROUP BY g ORDER BY g"
    )
    cases.append(
        f"SELECT g, regr_sxx(y, x) AS a, regr_sxy(y, x) AS b,"
        f" regr_syy(y, x) AS c FROM {_STAT_FIXTURE} GROUP BY g ORDER BY g"
    )
    # portable corr: NULL (not error) on zero variance in BOTH engines
    cases.append(
        f"SELECT g, {_r4s('covar_pop(x, y) / NULLIF(stddev_pop(x) * stddev_pop(y), 0)')}"
        f" AS a FROM {_STAT_FIXTURE} GROUP BY g ORDER BY g"
    )
    for p in (0.25, 0.5, 0.9):
        cases.append(
            f"SELECT g, {_r4s(f'percentile_cont({p}) WITHIN GROUP (ORDER BY x)')} AS a,"
            f" percentile_disc({p}) WITHIN GROUP (ORDER BY x) AS b"
            f" FROM {_STAT_FIXTURE} GROUP BY g ORDER BY g"
        )
    cases.append(
        f"SELECT g, median(x) AS a, median(y) AS b"
        f" FROM {_STAT_FIXTURE} GROUP BY g ORDER BY g"
    )

    # randomized real-table cases (shared text)
    specs = [
        ("lineitem", "l_returnflag", "l_quantity", "l_extendedprice"),
        ("lineitem", "l_linestatus", "l_discount", "l_quantity"),
        ("orders", "o_orderstatus", "o_totalprice", "o_custkey"),
        ("events", "event_type", "value", "user_id"),
    ]
    for table, key, x, y in specs:
        p = rng.choice([0.1, 0.25, 0.5, 0.75, 0.95])
        cases.append(
            f"SELECT {key}, COUNT(*) AS n, {_r4s(f'stddev_samp({x})')} AS a,"
            f" {_r4s(f'var_pop({x})')} AS b,"
            f" {_r4s(f'covar_samp({x}, {y})')} AS c"
            f" FROM {table} GROUP BY {key} ORDER BY {key}"
        )
        cases.append(
            f"SELECT {key},"
            f" {_r4s(f'percentile_cont({p}) WITHIN GROUP (ORDER BY {x})')} AS a,"
            f" percentile_disc({p}) WITHIN GROUP (ORDER BY {x}) AS b,"
            f" {_r4s(f'median({x})')} AS c"
            f" FROM {table} GROUP BY {key} ORDER BY {key}"
        )
        cases.append(
            f"SELECT {key}, {_r4s(f'regr_slope({y}, {x})')} AS a,"
            f" {_r4s(f'regr_r2({y}, {x})')} AS b, regr_count({y}, {x}) AS c"
            f" FROM {table} GROUP BY {key} ORDER BY {key}"
        )

    failures = []
    for case, sql in enumerate(cases):
        ok, msg = compare(spark.sql(sql), views, sql)
        if not ok:
            failures.append((case, sql, msg))
    assert not failures, failures[:3]


def test_fuzzed_skew_kurt_bridges_match_duckdb(spark, views):
    """Paired-text cases: Spark's population skewness/kurtosis bridged
    to DuckDB's sample definitions (and DuckDB's kurtosis_pop used
    directly) — the q41 bridge, now fuzz-covered on two tables."""
    cases = []
    for table, key, x in [
        ("lineitem", "l_returnflag", "l_quantity"),
        ("orders", "o_orderstatus", "o_totalprice"),
        ("events", "event_type", "value"),
    ]:
        # sample skewness: G1 = g1 * sqrt(n(n-1)) / (n-2)
        cases.append(
            (
                f"SELECT {key}, {_r4s(f'skewness({x}) * sqrt(COUNT({x}) * (COUNT({x}) - 1)) / (COUNT({x}) - 2)')} AS a"
                f" FROM {table} GROUP BY {key}"
                f" HAVING COUNT({x}) >= 3 AND var_samp({x}) > 0 ORDER BY {key}",
                f"SELECT {key}, {_r4s(f'skewness({x})')} AS a"
                f" FROM {table} GROUP BY {key}"
                f" HAVING COUNT({x}) >= 3 AND var_samp({x}) > 0 ORDER BY {key}",
            )
        )
        # population excess kurtosis: Spark kurtosis == DuckDB kurtosis_pop
        cases.append(
            (
                f"SELECT {key}, {_r4s(f'kurtosis({x})')} AS a"
                f" FROM {table} GROUP BY {key}"
                f" HAVING COUNT({x}) >= 4 AND var_samp({x}) > 0 ORDER BY {key}",
                f"SELECT {key}, {_r4s(f'kurtosis_pop({x})')} AS a"
                f" FROM {table} GROUP BY {key}"
                f" HAVING COUNT({x}) >= 4 AND var_samp({x}) > 0 ORDER BY {key}",
            )
        )
    failures = []
    for case, (ssql, dsql) in enumerate(cases):
        ok, msg = compare(spark.sql(ssql), views, dsql)
        if not ok:
            failures.append((case, ssql, msg))
    assert not failures, failures[:3]


def test_stat_degenerate_divergences_pinned(spark, views):
    """The two live asymmetries, pinned so an engine upgrade that
    changes either behavior fails loudly:
    (a) Spark corr() raises ANSI DIVIDE_BY_ZERO on a zero-variance
        group; DuckDB returns NULL.
    (b) Spark kurtosis() is defined at n=3 (population g2); DuckDB's
        kurtosis() is NULL until n=4 (sample G2)."""
    import pytest as _pytest

    zero_var = "SELECT corr(x, y) FROM (VALUES (CAST(7.0 AS DOUBLE), CAST(2.0 AS DOUBLE)), (CAST(7.0 AS DOUBLE), CAST(3.0 AS DOUBLE))) AS v(x, y)"
    with _pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        spark.sql(zero_var).collect()
    assert views.execute(zero_var).fetchone()[0] is None

    n3 = "SELECT kurtosis(x) FROM (VALUES (CAST(1.0 AS DOUBLE)), (CAST(2.0 AS DOUBLE)), (CAST(3.0 AS DOUBLE))) AS v(x)"
    assert spark.sql(n3).collect()[0][0] == -1.5
    assert views.execute(n3).fetchone()[0] is None


def test_percentile_approx_tolerance_envelope(spark, views):
    """percentile_approx(col, p, acc) guarantees rank error <= n/acc:
    for each group, the approximate answer's rank among the group's
    sorted non-null values must sit within that envelope of the target
    rank — checked against DuckDB's exact sorted ranks, at two
    accuracies and three percentiles."""
    import bisect

    for table, key, x in [("events", "event_type", "value"),
                          ("lineitem", "l_returnflag", "l_quantity")]:
        groups = {}
        for g, v in views.execute(
            f"SELECT {key}, {x} FROM {table} WHERE {x} IS NOT NULL"
        ).fetchall():
            groups.setdefault(g, []).append(float(v))
        for vs in groups.values():
            vs.sort()
        for acc in (100, 1000):
            for p in (0.1, 0.5, 0.9):
                rows = spark.sql(
                    f"SELECT {key} AS g, percentile_approx({x}, {p}, {acc}) AS a"
                    f" FROM {table} GROUP BY {key}"
                ).collect()
                for r in rows:
                    vs = groups[r["g"]]
                    n = len(vs)
                    # rank interval occupied by the returned value
                    lo = bisect.bisect_left(vs, r["a"])
                    hi = bisect.bisect_right(vs, r["a"]) - 1
                    assert lo <= hi, (r["g"], r["a"], "not an actual value")
                    target = p * (n - 1)
                    # GK guarantees rank within eps*n of the target; +1
                    # absorbs the 0- vs 1-indexed rank convention (the
                    # first run measured exactly eps*n + 0.5 once)
                    err = n / acc + 1.0
                    assert lo - err <= target <= hi + err, (
                        table, r["g"], p, acc, lo, hi, target, err,
                    )
