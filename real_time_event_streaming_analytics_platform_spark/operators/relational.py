"""Q-series: the general relational surface over the TPC-H-ish star schema.

The reference delegates everything relational to PostgreSQL — its read API
assembles GROUP BY/ORDER BY SQL strings (services/read-api/main.py:317-334)
and the alert service runs conditional aggregates (services/alert-service/
main.py:338-344,465-474) against the TimescaleDB cold store. "Same query
capabilities" therefore means a full relational engine; these queries
exercise every category from SURVEY.md §2b on the driver testdata, each
with a DuckDB oracle twin.

Scale stance (100 TB): every query is one declarative plan. Dimension
tables (region/nation) carry explicit broadcast hints; fact-fact joins
shuffle on their join keys and rely on AQE for skew; aggregates are
partial-final (map-side combine) automatically. No driver-side loops, no
collect, no crossJoin except the deliberate broadcast-scalar pattern.

Determinism: double aggregates go through DECIMAL(18,6) accumulation
(helpers.dsum/davg) and cross-engine round2; running window sums
accumulate in decimal; comparisons against computed doubles are exact
(decimal) or quantized. See operators/helpers.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..plans.registry import query, track_persist
from .helpers import (
    DEC,
    davg,
    dsum,
    fmt_ts,
    quant6,
    round2,
    sql_davg,
    sql_dsum,
    sql_quant6,
    sql_round2,
)

# ---------------------------------------------------------------------------
# Q1 — scan + filter + multi-aggregate (TPC-H Q1 shape). The filter and the
# 7-column projection push into the parquet scan; one shuffle on the 2-key
# groupBy; partial aggregation map-side.
# ---------------------------------------------------------------------------

# Column expressions must be built lazily (F.col needs a live SparkContext).
def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _charge():
    return _rev() * (1 + F.col("l_tax"))


@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base"),
            dsum(_rev()).alias("sum_disc"),
            dsum(_charge()).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q2 — inner equi-join orders ⋈ customer. Both sides shuffle on custkey
# (sort-merge or shuffled-hash per AQE); at 100 TB this is the canonical
# co-partitioned fact-dim join — bucketing both tables on custkey would
# eliminate the shuffle entirely.
# ---------------------------------------------------------------------------


@query(
    "q02_join_segment",
    oracle=f"""
    SELECT c_mktsegment, COUNT(*) AS n, {sql_dsum('o_totalprice')} AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1 ORDER BY 1
    """,
)
def q02_join_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), dsum("o_totalprice").alias("revenue"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Q3 — 5-way join with join reordering. nation/region are broadcast
# (explicit hint: they are KBs even at 100 TB); lineitem⋈orders⋈customer
# shuffle on their keys; Catalyst + CBO pick the order.
# ---------------------------------------------------------------------------


@query(
    "q03_multiway_join",
    oracle=f"""
    SELECT r_name, n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q03_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy("r_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Q3b — the runtime-bloom-filter join shape (TPC-H Q5 silhouette): a
# SELECTIVE predicate on the orders leg of the fact⋈orders shuffle join.
# This is the registered carrier for operators/scale.py
# enable_runtime_bloom_filters: Catalyst's InjectRuntimeFilter (ON by
# default in Spark 4, production thresholds 10 MB creation / 10 GB
# application scan) builds a bloom filter over the filtered o_orderkey
# set at runtime and pushes a might_contain(l_orderkey) predicate into
# the lineitem scan — at 100 TB the non-matching ~80% of fact rows drop
# BEFORE the shuffle. At bench SF the scan sits far below the 10 GB
# application-side threshold, so injection is a deliberate no-op
# (plan-pinned for scale in tests/test_scale.py::
# test_q03b_runtime_filter_plan_shape, which lowers the thresholds and
# asserts the fact-side might_contain probe on this exact registered
# query; bench.py's runtime_filter block records the forced-injection
# A/B wall times).
# ---------------------------------------------------------------------------


@query(
    "q03b_filtered_multiway",
    oracle=f"""
    SELECT n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY 1 ORDER BY 1
    """,
)
def q03b_filtered_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(dsum(_rev()).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Q4 — left outer join + distribution histogram (TPC-H Q13 shape).
# ---------------------------------------------------------------------------


@query(
    "q04_orders_histogram",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) GROUP BY 1 ORDER BY 1
    """,
)
def q04_orders_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist")).orderBy("c_count")


# ---------------------------------------------------------------------------
# Q5 — left semi join (EXISTS). Semi joins ship only the join key of the
# probe side; no row multiplication.
# ---------------------------------------------------------------------------


@query(
    "q05_semi_join",
    oracle="""
    SELECT n_name, COUNT(*) AS n FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY 1 ORDER BY 1
    """,
)
def q05_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n"))
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Q6 — left anti join (NOT EXISTS).
# ---------------------------------------------------------------------------


@query(
    "q06_anti_join",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
)
def q06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Q7 — theta self-join: same-order line pairs. Equi on l_orderkey (the
# shuffle key) + non-equi residual l1.ln < l2.ln — stays a hash/SMJ join
# with a post-filter, never a cartesian product.
# ---------------------------------------------------------------------------


@query(
    "q07_theta_self_join",
    oracle="""
    SELECT l1.l_returnflag AS flag, COUNT(*) AS pairs
    FROM lineitem l1 JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey AND l1.l_linenumber < l2.l_linenumber
    GROUP BY 1 ORDER BY 1
    """,
)
def q07_theta_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    l1 = li.select(
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").alias("ln1"),
        F.col("l_returnflag").alias("flag"),
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_linenumber").alias("ln2"))
    return (
        l1.join(l2, (F.col("k1") == F.col("k2")) & (F.col("ln1") < F.col("ln2")))
        .groupBy("flag")
        .agg(F.count("*").alias("pairs"))
        .orderBy("flag")
    )


# ---------------------------------------------------------------------------
# Q8 — broadcast join of two small dims. The hint is explicit; the plan
# must show BroadcastHashJoin (asserted in tests/test_scale.py).
# ---------------------------------------------------------------------------


@query(
    "q08_broadcast_join",
    oracle="""
    SELECT r_name, COUNT(*) AS n
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1 ORDER BY 1
    """,
)
def q08_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n"))
        .orderBy("r_name")
    )


# ---------------------------------------------------------------------------
# Q9 — ranking window functions: top-3 customers by acctbal per nation.
# row_number uses the total order (acctbal DESC, custkey); rank/dense_rank
# use the tie-bearing order (acctbal DESC) — deterministic in both engines.
# ---------------------------------------------------------------------------


@query(
    "q09_ranking_window",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal, rn, rk, drk FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn,
               RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rk,
               DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drk
        FROM customer
    ) WHERE rn <= 3 ORDER BY c_nationkey, rn
    """,
)
def q09_ranking_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    w_total = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_ties = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return (
        customer.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w_total).alias("rn"),
            F.rank().over(w_ties).alias("rk"),
            F.dense_rank().over(w_ties).alias("drk"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("c_nationkey", "rn")
    )


# ---------------------------------------------------------------------------
# Q10 — analytic window: running sum + lag/lead per customer. The running
# sum accumulates in DECIMAL so every prefix is exact (identical across
# engines regardless of accumulation internals).
# ---------------------------------------------------------------------------


@query(
    "q10_analytic_window",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           {sql_round2(f'CAST(SUM(CAST(o_totalprice AS {DEC})) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)')} AS running,
           {sql_round2('LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)')} AS prev,
           {sql_round2('LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)')} AS nxt
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
)
def q10_analytic_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        round2(F.sum(F.col("o_totalprice").cast(DEC)).over(wf).cast("double")).alias(
            "running"
        ),
        round2(F.lag("o_totalprice").over(w)).alias("prev"),
        round2(F.lead("o_totalprice").over(w)).alias("nxt"),
    ).orderBy("o_custkey", "o_orderkey")


# ---------------------------------------------------------------------------
# Q11 — top-k: ORDER BY ... LIMIT plans as TakeOrderedAndProject (per-
# partition heaps + driver merge), never a global sort materialization.
# ---------------------------------------------------------------------------


@query(
    "q11_topk",
    oracle="""
    SELECT p_partkey, p_retailprice FROM part
    ORDER BY p_retailprice DESC, p_partkey LIMIT 10
    """,
)
def q11_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return (
        part.select("p_partkey", "p_retailprice")
        .orderBy(F.col("p_retailprice").desc(), "p_partkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q12 — set operations on customer vs supplier nation keys. The six
# variants (UNION / UNION ALL / INTERSECT / EXCEPT / INTERSECT ALL /
# EXCEPT ALL) share one SQL template; per VERDICT r10 #1 they hold ONE
# driver-oracle slot via the consolidated q12_set_ops (each variant's
# result appears as an op-tagged slice, so a hash mismatch in ANY
# variant fails the combined row). The individual variants stay
# registered rows-only and are pinned locally two ways: the
# slice-equivalence test (tests/test_functions.py) and the 12-case
# randomized set-op fuzz differential
# (tests/test_fuzz_differential.py::test_fuzzed_set_operations_match_duckdb).
# ---------------------------------------------------------------------------

_SET_OPS = [
    "UNION",
    "UNION ALL",
    "INTERSECT",
    "EXCEPT",
    "INTERSECT ALL",
    "EXCEPT ALL",
]

_SET_OPS_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{op}' AS op, nkey FROM (
        SELECT c_nationkey AS nkey FROM customer
        {op}
        SELECT s_nationkey AS nkey FROM supplier
    )"""
    for op in _SET_OPS
)


def _set_sides(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nkey"))
    return c, s


def _set_op_frame(c: DataFrame, s: DataFrame, op: str) -> DataFrame:
    """One set-op variant over prebuilt sides, unordered."""
    return {
        "UNION": lambda: c.union(s).distinct(),
        "UNION ALL": lambda: c.union(s),
        "INTERSECT": lambda: c.intersect(s),
        "EXCEPT": lambda: c.subtract(s),
        "INTERSECT ALL": lambda: c.intersectAll(s),
        "EXCEPT ALL": lambda: c.exceptAll(s),
    }[op]()


def _set_op_result(spark, sf_dir, op: str) -> DataFrame:
    """One set-op variant's bare (nkey) frame, unordered."""
    c, s = _set_sides(spark, sf_dir)
    return _set_op_frame(c, s, op)


# Replicating a row ``mult`` times via explode(sequence(1, mult))
# materializes one array of length mult per key; chunking bounds that
# array regardless of per-key multiplicity (a 100 TB hot key would
# otherwise have to build a billion-element array in one task).
_REPL_CHUNK = 65536


def _replicate(df: DataFrame, mult) -> DataFrame:
    """One output row per input row per unit of ``mult`` (column expr),
    rows with mult <= 0 dropped; constant-bounded memory per task."""
    m = mult.cast("long")
    return (
        df.withColumn("_m", m)
        .where(F.col("_m") > 0)
        .withColumn(
            "_chunk",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.expr(f"(_m - 1) div {_REPL_CHUNK}"),
                )
            ),
        )
        .withColumn(
            "_i",
            F.explode(
                F.sequence(
                    F.lit(1).cast("long"),
                    F.least(
                        F.lit(_REPL_CHUNK).cast("long"),
                        F.col("_m") - F.col("_chunk") * _REPL_CHUNK,
                    ),
                )
            ),
        )
        .drop("_m", "_chunk", "_i")
    )


@query(
    "q12_set_ops",
    oracle=f"SELECT op, nkey FROM ({_SET_OPS_SQL}) ORDER BY op, nkey",
)
def q12_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six set-op variants in one op-tagged frame — the
    consolidated driver-oracle form of the q12 family.

    Every distinct-flavored set op is a predicate over the per-key
    multiplicity pair (cn, sn), and the ALL-flavored ones a replication
    count over it — so ONE side-tagged aggregation derives five of the
    six variants (UNION: any key; INTERSECT: cn>0 AND sn>0; EXCEPT:
    cn>0 AND sn=0; INTERSECT ALL: min(cn, sn) copies; EXCEPT ALL:
    max(cn-sn, 0) copies — the same counts-based rewrite Spark's own
    RewriteIntersectAll/RewriteExceptAll use). UNION ALL needs no
    computation at all and stays a bare tagged concat. Versus the six
    independent branches this collapses the plan from 12 scans + one
    wide/distinct exchange per variant to 4 scans + ONE aggregation
    exchange (guide §2.4/§6); equivalence is pinned by the unchanged
    DuckDB oracle, the slice-equivalence test, and the set-op fuzz
    differential."""
    c, s = _set_sides(spark, sf_dir)
    tagged = c.select("nkey", F.lit(1).alias("c_n"), F.lit(0).alias("s_n")).unionByName(
        s.select("nkey", F.lit(0).alias("c_n"), F.lit(1).alias("s_n"))
    )
    counts = tagged.groupBy("nkey").agg(
        F.sum("c_n").alias("cn"), F.sum("s_n").alias("sn")
    )
    cn, sn = F.col("cn"), F.col("sn")
    one, zero = F.lit(1).cast("long"), F.lit(0).cast("long")
    # all five counts-derived variants in ONE projection over the single
    # aggregation subtree (separate per-variant frames would replicate
    # the scan+agg subtree once per branch in the physical plan — Spark
    # does not CSE across union branches statically, and the measured
    # interleaved A/B showed the replicated form losing to the old
    # six-branch query)
    variants = F.array(
        # every key in counts came from one of the sides: UNION keeps all
        F.struct(F.lit("UNION").alias("op"), one.alias("mult")),
        F.struct(
            F.lit("INTERSECT").alias("op"),
            F.when((cn > 0) & (sn > 0), one).otherwise(zero).alias("mult"),
        ),
        F.struct(
            F.lit("EXCEPT").alias("op"),
            F.when((cn > 0) & (sn == 0), one).otherwise(zero).alias("mult"),
        ),
        F.struct(F.lit("INTERSECT ALL").alias("op"), F.least(cn, sn).alias("mult")),
        F.struct(F.lit("EXCEPT ALL").alias("op"), (cn - sn).alias("mult")),
    )
    derived = _replicate(
        counts.select("nkey", F.explode(variants).alias("v")).select(
            F.col("v.op").alias("op"), "nkey", F.col("v.mult").alias("mult")
        ),
        F.col("mult"),
    ).select("op", "nkey")
    union_all = c.unionByName(s).select(F.lit("UNION ALL").alias("op"), "nkey")
    return union_all.unionByName(derived).orderBy("op", "nkey")


@query("q12_union")
def q12_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _set_op_result(spark, sf_dir, "UNION").orderBy("nkey")


@query("q12_union_all")
def q12_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _set_op_result(spark, sf_dir, "UNION ALL").orderBy("nkey")


@query("q12_intersect")
def q12_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _set_op_result(spark, sf_dir, "INTERSECT").orderBy("nkey")


@query("q12_except")
def q12_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EXCEPT (distinct) semantics
    return _set_op_result(spark, sf_dir, "EXCEPT").orderBy("nkey")


# ---------------------------------------------------------------------------
# Q13 — COUNT(DISTINCT) per group (expands to a two-phase aggregate).
# The approx_count_distinct twin is x1 (tolerance-checked, no oracle).
# ---------------------------------------------------------------------------


@query(
    "q13_count_distinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS buyers, COUNT(*) AS n
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def q13_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(F.count_distinct("o_custkey").alias("buyers"), F.count("*").alias("n"))
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# X1 — approx_count_distinct (HLL++): the 100 TB path for Q13 — one pass,
# constant memory per group, no expansion. No SQL oracle (sketches are
# engine-specific); tolerance vs exact asserted in tests/test_functions.py.
# ---------------------------------------------------------------------------


@query("x1_approx_distinct")
def x1_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", 0.02).alias("approx_buyers"))
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Q14 — ROLLUP with GROUPING() disambiguation (NULL group vs rollup NULL).
# ---------------------------------------------------------------------------


@query(
    "q14_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
           COUNT(*) AS n, {sql_dsum('o_totalprice')} AS revenue
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY 3, 4, 1, 2
    """,
)
def q14_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
            F.count("*").alias("n"),
            dsum("o_totalprice").alias("revenue"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_status", "g_prio", "n", "revenue")
        .orderBy("g_status", "g_prio", "o_orderstatus", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q14b/Q14c — CUBE and explicit GROUPING SETS (complete the grouping-set
# family; Q14 covers ROLLUP). Per VERDICT r12 #3 the two variants hold
# ONE driver-oracle slot via the consolidated q14d_grouping_battery
# (the q12_set_ops pattern): each variant's full result appears as an
# op-tagged slice, so a hash mismatch in EITHER variant fails the
# combined row. The individual variants stay registered rows-only and
# are pinned locally by the slice-equivalence test
# (tests/test_functions.py::test_q14d_battery_slices_match_variants).
# ---------------------------------------------------------------------------


@query("q14b_cube")
def q14b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
            F.count("*").alias("n"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_status", "g_prio", "n")
        .orderBy("g_status", "g_prio", "o_orderstatus", "o_orderpriority")
    )


@query("q14c_grouping_sets")
def q14c_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
               COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY 3, 4, 1, 2
        """
    )


# The battery derives the GROUPING SETS slice from the CUBE result:
# GROUPING SETS ((status), (priority), ()) is exactly the CUBE minus
# its full-detail (status, priority) set, i.e. the rows where at least
# one GROUPING() bit is 1 — so one Expand+aggregate shape serves both
# op-tagged slices instead of two independent grouping passes.
_Q14D_SQL = """
    WITH c AS (
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
               COUNT(*) AS n
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    )
    SELECT op, o_orderstatus, o_orderpriority, g_status, g_prio, n
    FROM (
        SELECT 'CUBE' AS op, * FROM c
        UNION ALL
        SELECT 'GROUPING SETS' AS op, * FROM c WHERE g_status + g_prio > 0
    )
    ORDER BY op, g_status, g_prio, o_orderstatus, o_orderpriority
"""


@query("q14d_grouping_battery", oracle=_Q14D_SQL)
def q14d_grouping_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE and GROUPING SETS variants in one op-tagged frame — the
    consolidated driver-oracle form of the q14b/q14c pair (VERDICT r12
    #3, the q12_set_ops pattern). The identical SQL runs on both
    engines; a value drift in either variant fails the combined hash."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q14D_SQL)


# ---------------------------------------------------------------------------
# Q12e/Q12f — bag-semantics set ops (INTERSECT ALL / EXCEPT ALL),
# completing the set-operation family.
# ---------------------------------------------------------------------------


@query("q12_intersect_all")
def q12_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _set_op_result(spark, sf_dir, "INTERSECT ALL").orderBy("nkey")


@query("q12_except_all")
def q12_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _set_op_result(spark, sf_dir, "EXCEPT ALL").orderBy("nkey")


# ---------------------------------------------------------------------------
# Q26 — sampling (TABLESAMPLE). Row membership is partition-layout
# dependent, so no value oracle — the tolerance test bounds the fraction.
# ---------------------------------------------------------------------------


@query("q26_sample")
def q26_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.sample(fraction=0.1, seed=42).select("o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# Q26b — deterministic HASH sample: the production sampling shape for
# pipelines that must be reproducible across engines, re-runs and
# backfills (Bernoulli `sample()` depends on Spark's per-partition RNG —
# rows-only above). Keying the predicate on a cryptographic-hash prefix
# of a stable id gives every engine the same ~5.1% subset (13/256 two-hex
# prefixes), the scan stays a single pushed-filter pass, and the rate
# tunes by prefix range. Oracle-backed because md5 is identical
# everywhere — this upgrades the sampling category from rows-only to
# hash-checked.
# ---------------------------------------------------------------------------


@query(
    "q26b_hash_sample",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '0d'
    ORDER BY o_orderkey
    """,
)
def q26b_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.where(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < "0d"
        )
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "q26c_stratified_sample",
    oracle="""
    SELECT event_type, event_id, value FROM (
        SELECT event_type, event_id, value,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
               ) AS rk
        FROM events
    ) WHERE rk <= 50
    ORDER BY event_type, event_id
    """,
)
def q26c_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified EXACT-k deterministic sample: 50 rows per event_type,
    selected by md5-hash order — the balanced-per-class sample a
    training-data pipeline draws (per-label eval sets, per-source
    audits). ``sampleBy`` gives only approximate fractions and no
    per-stratum count guarantee; the hash-rank form gives exactly k per
    stratum, is reproducible across engines and runs (md5 is defined
    identically everywhere, with event_id as the total-order tiebreak),
    and composes with any stratum key. Scale: one hash-partitioned
    window per stratum — k rows retained per task group, no global
    sort; at 100 TB the same plan shape runs with the stratum key as
    the shuffle key. Oracle-portable because md5 (unlike xxhash64) is
    bit-identical in DuckDB."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        events.select(
            "event_type", "event_id", "value", F.row_number().over(w).alias("rk")
        )
        .where(F.col("rk") <= 50)
        .select("event_type", "event_id", "value")
        .orderBy("event_type", "event_id")
    )


# ---------------------------------------------------------------------------
# Q27 — PIVOT: order counts per status spread across priority columns.
# The oracle uses the portable conditional-aggregation form (what PIVOT
# desugars to), so both engines compute identical CASE/COUNT aggregates.
# ---------------------------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query(
    "q27_pivot",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p1,
           CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p2,
           CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p3,
           CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p4,
           CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p5
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def q27_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))  # count(*) is rejected inside Pivot
    )
    renames = {p: f"p{i + 1}" for i, p in enumerate(_PRIORITIES)}
    for old, new in renames.items():
        pivoted = pivoted.withColumnRenamed(old, new)
    # pivot leaves NULL for absent combos; the CASE form yields 0
    return pivoted.select(
        "o_orderstatus",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in renames.values()],
    ).orderBy("o_orderstatus")


# ---------------------------------------------------------------------------
# Q28 — UNPIVOT/melt: wide per-part price+size back to tall (attr, val).
# Oracle is the portable UNION ALL desugaring.
# ---------------------------------------------------------------------------


@query(
    "q28_unpivot",
    oracle="""
    SELECT p_partkey, attr, val FROM (
        SELECT p_partkey, 'retail' AS attr, p_retailprice AS val FROM part
        UNION ALL
        SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    ) ORDER BY p_partkey, attr
    """,
)
def q28_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.col("p_retailprice").alias("retail"),
            F.col("p_size").cast("double").alias("size"),
        )
        .unpivot("p_partkey", ["retail", "size"], "attr", "val")
        .orderBy("p_partkey", "attr")
    )


# ---------------------------------------------------------------------------
# Q9b — the remaining analytic window functions: ntile, percent_rank,
# cume_dist, first/nth value over a frame. percent_rank/cume_dist are
# exact rationals of row positions — identical doubles cross-engine.
# ---------------------------------------------------------------------------


@query(
    "q09b_analytic_funcs",
    oracle=f"""
    SELECT c_nationkey, c_custkey,
           NTILE(4) OVER w_total AS quartile,
           {sql_round2('PERCENT_RANK() OVER w_total')} AS prank,
           {sql_round2('CUME_DIST() OVER w_total')} AS cdist,
           FIRST_VALUE(c_custkey) OVER w_total AS richest,
           NTH_VALUE(c_custkey, 2) OVER (PARTITION BY c_nationkey
                                         ORDER BY c_acctbal DESC, c_custkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS second_richest
    FROM customer
    WINDOW w_total AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_nationkey, c_custkey
    """,
)
def q09b_analytic_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return customer.select(
        "c_nationkey",
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        round2(F.percent_rank().over(w)).alias("prank"),
        round2(F.cume_dist().over(w)).alias("cdist"),
        F.first("c_custkey").over(wf).alias("richest"),
        F.nth_value("c_custkey", 2).over(wf).alias("second_richest"),
    ).orderBy("c_nationkey", "c_custkey")


# ---------------------------------------------------------------------------
# Q15 — correlated scalar subquery (Catalyst decorrelates to an aggregate
# + join). The comparison is decimal-exact (price·count > exact sum) so
# both engines see identical tie behavior regardless of plan shape.
# ---------------------------------------------------------------------------


@query(
    "q15_correlated_subquery",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n FROM orders o
    WHERE CAST(o_totalprice AS {DEC})
          * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
          > (SELECT SUM(CAST(o2.o_totalprice AS {DEC})) FROM orders o2
             WHERE o2.o_custkey = o.o_custkey)
    GROUP BY 1 ORDER BY 1
    """,
)
def q15_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, COUNT(*) AS n FROM orders o
        WHERE CAST(o_totalprice AS {DEC})
              * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
              > (SELECT SUM(CAST(o2.o_totalprice AS {DEC})) FROM orders o2
                 WHERE o2.o_custkey = o.o_custkey)
        GROUP BY 1 ORDER BY 1
        """
    )


# ---------------------------------------------------------------------------
# Q16 — string scalar functions (projection; whole-stage codegen, no
# shuffle at all).
# ---------------------------------------------------------------------------


@query(
    "q16_string_funcs",
    oracle="""
    SELECT p_partkey, UPPER(p_name) AS uname, SUBSTR(p_name, 1, 5) AS pfx,
           p_name LIKE '%green%' AS has_green,
           CONCAT_WS('|', p_brand, p_type) AS brand_type
    FROM part ORDER BY p_partkey
    """,
)
def q16_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.substring("p_name", 1, 5).alias("pfx"),
        F.col("p_name").like("%green%").alias("has_green"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# Q17 — IN-list + BETWEEN predicates (both push into the parquet scan).
# ---------------------------------------------------------------------------


@query(
    "q17_in_between",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A', 'R')
    GROUP BY 1 ORDER BY 1
    """,
)
def q17_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_quantity").between(10, 20) & F.col("l_returnflag").isin("A", "R"))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q18 — HAVING (post-aggregation filter).
# ---------------------------------------------------------------------------


@query(
    "q18_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n FROM orders
    GROUP BY 1 HAVING COUNT(*) > 5 ORDER BY o_custkey
    """,
)
def q18_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 5)
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# Q19 — NULL handling across an outer join: COALESCE'd totals + the
# no-orders flag (IS NULL on the right side of the left join).
# ---------------------------------------------------------------------------


@query(
    "q19_null_handling",
    oracle=f"""
    SELECT c_custkey,
           {sql_round2(f'COALESCE(CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE), 0)')} AS total,
           CAST(COUNT(o_orderkey) = 0 AS BOOLEAN) AS no_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY 1 ORDER BY 1
    """,
)
def q19_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            round2(F.coalesce(dsum("o_totalprice"), F.lit(0.0))).alias("total"),
            (F.count("o_orderkey") == 0).alias("no_orders"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Q20 — date arithmetic: interval shift (a) and day-diff bucketing (b).
# Bucket uses floor(x/90.0) so negative diffs floor identically in both
# engines (integer `/` truncates in Spark but floors in DuckDB).
# ---------------------------------------------------------------------------


@query(
    "q20_date_shift",
    oracle="""
    SELECT strftime(date_trunc('month', l_shipdate + INTERVAL '90 days'),
                    '%Y-%m-%d %H:%M:%S') AS ship_month_p90,
           COUNT(*) AS n
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
)
def q20_date_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            fmt_ts(
                F.date_trunc("month", F.col("l_shipdate") + F.expr("INTERVAL 90 DAYS"))
            ).alias("ship_month_p90")
        )
        .agg(F.count("*").alias("n"))
        .orderBy("ship_month_p90")
    )


@query(
    "q20b_date_diff_buckets",
    oracle="""
    SELECT CAST(floor(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) / 90.0) AS INT)
               AS bucket,
           COUNT(*) AS n
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def q20b_date_diff_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    diff = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
    return (
        orders.groupBy(F.floor(diff / 90.0).cast("int").alias("bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Q21 — array ops: split + explode word counts (generator → aggregate).
# ---------------------------------------------------------------------------


@query(
    "q21_array_explode",
    oracle="""
    SELECT word, COUNT(*) AS n FROM (
        SELECT unnest(string_split(p_type, ' ')) AS word FROM part
    ) GROUP BY 1 ORDER BY 1
    """,
)
def q21_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split("p_type", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy("word")
    )


# ---------------------------------------------------------------------------
# Q22 — as-of join over an event sequence: for each purchase, the most
# recent STRICTLY PRIOR click by the same user. Expressed as a window max
# over the type-tagged stream (frame ends at 1 PRECEDING) — one shuffle on
# user_id, no self-join. This is the scalable as-of pattern: at 100 TB the
# alternative (range self-join) would be quadratic in events-per-user.
# ---------------------------------------------------------------------------


@query(
    "q22_asof_prior_click",
    oracle="""
    SELECT event_id, user_id,
           strftime(prior_click, '%Y-%m-%d %H:%M:%S') AS prior_click_ts
    FROM (
        SELECT event_id, user_id, event_type,
               MAX(CASE WHEN event_type = 'click' THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prior_click
        FROM events WHERE event_type IN ('click', 'purchase')
    ) WHERE event_type = 'purchase' ORDER BY event_id
    """,
)
def q22_asof_prior_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        events.where(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w).alias(
                "prior_click"
            ),
        )
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", fmt_ts("prior_click").alias("prior_click_ts"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Q23 — sessionization (batch): 30-min-gap sessions via lag → gap flag →
# prefix-sum session id. Batch mirror of streaming session_window (S7).
# ---------------------------------------------------------------------------


@query(
    "q23_sessionization",
    oracle="""
    SELECT user_id, session_id, COUNT(*) AS n,
           CAST(floor(epoch(MAX(ts))) AS BIGINT)
               - CAST(floor(epoch(MIN(ts))) AS BIGINT) AS dur_sec
    FROM (
        SELECT user_id, ts,
               -- DuckDB SUM(int) is HUGEINT, which the driver's pandas
               -- hash path renders as float64; cast to match Spark's int64
               -- (same convention as the d1/x5/x6/t7 oracles).
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS session_id
        FROM (
            SELECT user_id, ts, event_id,
                   CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             IS NULL THEN 1
                        WHEN CAST(floor(epoch(ts)) AS BIGINT)
                             - CAST(floor(epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
                             > 1800 THEN 1
                        ELSE 0 END AS is_new
            FROM events
        )
    ) GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q23_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    gap = F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)
    is_new = F.when(prev_ts.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        events.select("user_id", "ts", "event_id", is_new.alias("is_new"))
        .select(
            "user_id", "ts", F.sum("is_new").over(wf).alias("session_id")
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
                "dur_sec"
            ),
        )
        .orderBy("user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# Q29 — gap-filled time series: the cold store's signature capability
# (TimescaleDB `time_bucket_gapfill`, which the reference's /series SQL
# surface delegates to — infra/docker-compose/init-scripts/
# 01-init-timescaledb.sql provisions hypertables exactly for this class
# of query). Spark-first shape: the dense spine is generated with
# `sequence()` + `explode` from a single-row bounds aggregate broadcast
# against the distinct key set — NO driver loop, NO recursive iteration —
# then left-joined to the sparse aggregate. At 100 TB the spine is
# |keys| x |buckets| rows (tiny relative to the fact table: the events
# scan is one pushed-projection pass and the join shuffles only the
# already-aggregated hourly rows, never raw events).
# ---------------------------------------------------------------------------


@query(
    "q29_gapfill_series",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             COUNT(*) AS event_count, {sql_davg('value')} AS avg_v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS mn,
             date_trunc('hour', MAX(ts)) AS mx
      FROM events
    ),
    spine AS (
      SELECT t.event_type, g.h
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
                  FROM bounds) g
    )
    SELECT s.event_type, strftime(s.h, '%Y-%m-%d %H:%M:%S') AS bucket,
           CAST(COALESCE(hourly.event_count, 0) AS BIGINT) AS event_count,
           hourly.avg_v
    FROM spine s
    LEFT JOIN hourly ON s.event_type = hourly.event_type AND s.h = hourly.h
    ORDER BY 1, 2
    """,
)
def q29_gapfill_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count("*").alias("event_count"), davg("value").alias("avg_v"))
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"),
        F.date_trunc("hour", F.max("ts")).alias("mx"),
    )
    spine = (
        events.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias("h"),
        )
    )
    return (
        spine.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            fmt_ts("h").alias("bucket"),
            F.coalesce("event_count", F.lit(0)).alias("event_count"),
            "avg_v",
        )
        .orderBy("event_type", "bucket")
    )


# ---------------------------------------------------------------------------
# Q30 — recursive CTE hierarchy traversal (WITH RECURSIVE, new in Spark
# 4.0, SPARK-24497): each customer's implicit manager chain is
# node -> node DIV 2 (a deterministic binary org tree over c_custkey),
# walked to the root and rolled up into a depth histogram. This is the
# org-chart / BOM-traversal query class the reference delegates to
# PostgreSQL (which has had WITH RECURSIVE all along). Execution shape:
# Spark runs each recursive step as a distributed self-union — iteration
# count is the hierarchy DEPTH (log2 n for this tree: ~18 at sf1, ~40 at
# a trillion keys), never the row count, so the plan scales as
# depth x (one narrow shuffle per step).
# ---------------------------------------------------------------------------


@query(
    "q30_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE walk AS (
        SELECT c_custkey, CAST(c_custkey AS BIGINT) AS node, 0 AS depth
        FROM customer
        UNION ALL
        SELECT c_custkey, node // 2, depth + 1 FROM walk WHERE node > 1
    ),
    per_cust AS (SELECT c_custkey, MAX(depth) AS depth FROM walk GROUP BY 1)
    SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_customers,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM per_cust GROUP BY depth ORDER BY depth
    """,
)
def q30_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH RECURSIVE walk AS (
            SELECT c_custkey, CAST(c_custkey AS BIGINT) AS node, 0 AS depth
            FROM customer
            UNION ALL
            SELECT c_custkey, node DIV 2, depth + 1 FROM walk WHERE node > 1
        ),
        per_cust AS (SELECT c_custkey, MAX(depth) AS depth FROM walk GROUP BY 1)
        SELECT depth, COUNT(*) AS n_customers,
               MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
        FROM per_cust GROUP BY depth ORDER BY depth
        """
    )


# ---------------------------------------------------------------------------
# Q31 — correlated LATERAL subquery with ORDER BY ... LIMIT (top-3 orders
# per market segment). The lateral-join SQL surface (PostgreSQL LATERAL,
# present in the cold store the reference delegates to) is distinct from
# the window-function top-k in q09/q11: the per-row subquery is written
# as a dependent subquery and Catalyst de-correlates it into a plain
# join + per-key limit — the executed plan has NO CartesianProduct and
# NO BroadcastNestedLoopJoin (pinned by the plan-audit test), so the
# shape survives arbitrary key cardinality.
# ---------------------------------------------------------------------------

_Q31_SQL = """
SELECT s.c_mktsegment, t.o_orderkey, t.o_totalprice
FROM (SELECT DISTINCT c_mktsegment FROM customer) s,
LATERAL (
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = s.c_mktsegment
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 3
) t
ORDER BY 1, 3 DESC, 2
"""


@query("q31_lateral_topk", oracle=_Q31_SQL)
def q31_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q31_SQL)


# ---------------------------------------------------------------------------
# Q32 — EWMA trend smoothing over the hourly /series aggregate
# (s_t = 0.5*x_t + 0.5*s_{t-1}), the dashboard trend-line the reference's
# Grafana layer computes client-side. EWMA is inherently sequential per
# key — NOT expressible with SQL window frames — so this is the canonical
# applyInPandas shape: parallel across keys, a vectorized-in, scalar-loop
# pass within each key's (bounded: 120 buckets) series. The oracle is a
# DuckDB recursive CTE computing the identical float64 recursion; both
# engines perform the same IEEE ops in the same order, so the doubles
# agree bitwise (then floor-rounded via the shared round2 scheme).
# Window bounded to the 5 days before the corpus max ts (the registry's
# relative-time anchor convention) so oracle recursion depth is ~120.
# ---------------------------------------------------------------------------


@query(
    "q32_ewma_trend",
    oracle=f"""
    WITH RECURSIVE base AS (
      SELECT event_type, date_trunc('hour', ts) AS h, {sql_davg('value')} AS avg_v,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY date_trunc('hour', ts)) AS rn
      FROM events
      WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 5 DAY
      GROUP BY 1, 2
    ),
    rec AS (
      SELECT event_type, h, rn, avg_v, avg_v AS ewma_raw FROM base WHERE rn = 1
      UNION ALL
      SELECT b.event_type, b.h, b.rn, b.avg_v, 0.5 * b.avg_v + 0.5 * r.ewma_raw
      FROM base b JOIN rec r ON b.event_type = r.event_type AND b.rn = r.rn + 1
    )
    SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket, avg_v,
           floor(ewma_raw * 100 + 0.5) / 100 AS ewma
    FROM rec ORDER BY 1, 2
    """,
)
def q32_ewma_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    events = load(spark, sf_dir, "events")
    anchor = events.agg(F.max("ts").alias("mx"))
    base = (
        events.crossJoin(F.broadcast(anchor))
        .where(F.col("ts") >= F.col("mx") - F.expr("interval 5 days"))
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(davg("value").alias("avg_v"))
    )

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("h").reset_index(drop=True)
        x = pdf["avg_v"].to_numpy(dtype=np.float64)
        if len(x) == 0:
            pdf["ewma"] = x
            return pdf
        s = np.empty_like(x)
        acc = x[0]
        s[0] = acc
        for i in range(1, len(x)):
            acc = 0.5 * x[i] + 0.5 * acc
            s[i] = acc
        pdf["ewma"] = np.floor(s * 100 + 0.5) / 100
        return pdf

    out = base.groupBy("event_type").applyInPandas(
        ewma, schema="event_type string, h timestamp, avg_v double, ewma double"
    )
    return out.select(
        "event_type", fmt_ts("h").alias("bucket"), "avg_v", "ewma"
    ).orderBy("event_type", "bucket")


# ---------------------------------------------------------------------------
# Q33 — time-RANGE window frame: every event scored against the TRAILING
# 10 MINUTES of its key's history (RANGE BETWEEN 600 PRECEDING AND
# CURRENT ROW over epoch seconds) — the SQL form of the reference's
# rolling per-key statistics when the window is defined by TIME, not by
# row count (R7/r8 use ROWS frames; a time frame is a distinct windowing
# category: frame size varies per row with event density, and same-second
# peers share a frame). Decimal-accumulated average per the registry's
# cross-engine determinism scheme. Scale shape: one shuffle on the
# partition key; the range frame is evaluated with a sliding two-pointer
# pass over each sorted partition — no per-row rescans.
# ---------------------------------------------------------------------------


@query(
    "q33_time_range_window",
    oracle="""
    SELECT event_type, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS t,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_10m,
           floor(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                 / (COUNT(*) OVER w) * 100 + 0.5) / 100 AS avg_10m
    FROM events
    WINDOW w AS (PARTITION BY event_type
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
    ORDER BY 1, 3, 2
    """,
)
def q33_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events").withColumn(
        "_sec", F.unix_timestamp("ts")
    )
    w = Window.partitionBy("event_type").orderBy("_sec").rangeBetween(-600, 0)
    return (
        events.select(
            "event_type",
            "event_id",
            fmt_ts("ts").alias("t"),
            F.count("*").over(w).alias("n_10m"),
            # davg discipline (helpers.py): cast the EXACT decimal sum to
            # double FIRST, divide in double, then round2. Spark's
            # decimal-quotient-then-cast and DuckDB's double division
            # disagree in the final ULP for ~70% of 6-dp sums — the one
            # place this file deviated from the scheme.
            round2(
                F.sum(F.col("value").cast(DEC)).over(w).cast("double")
                / F.count("*").over(w)
            ).alias("avg_10m"),
        )
        .orderBy("event_type", "t", "event_id")
    )


# ---------------------------------------------------------------------------
# Q34 — strict-ordered funnel (view → click → purchase). The canonical
# product-analytics query over an event stream: step N counts users whose
# FIRST qualifying step-N event happened strictly after their step-(N-1)
# anchor. Each stage is one groupBy(user_id) + one co-partitioned join on
# user_id — at 100 TB the three stages reuse the same hash partitioning
# (AQE coalesces the exchanges); no window over the full event history is
# needed. The reference exposes no funnel endpoint, but its per-source
# KPI consumers (services/read-api/main.py:317-334) run exactly this
# class of stepwise conditional aggregate in PostgreSQL.
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = (("view", 1), ("click", 2), ("purchase", 3))


@query(
    "q34_funnel",
    oracle="""
    WITH t1 AS (
        SELECT user_id, min(ts) AS anchor FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    t2 AS (
        SELECT e.user_id, min(e.ts) AS anchor FROM events e
        JOIN t1 ON e.user_id = t1.user_id
        WHERE e.event_type = 'click' AND e.ts > t1.anchor GROUP BY 1
    ),
    t3 AS (
        SELECT e.user_id, min(e.ts) AS anchor FROM events e
        JOIN t2 ON e.user_id = t2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > t2.anchor GROUP BY 1
    ),
    counts AS (
        SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
               (SELECT COUNT(*) FROM t1) AS users
        UNION ALL
        SELECT CAST(2 AS BIGINT), 'click', (SELECT COUNT(*) FROM t2)
        UNION ALL
        SELECT CAST(3 AS BIGINT), 'purchase', (SELECT COUNT(*) FROM t3)
    )
    SELECT step, step_name, users,
           floor(CAST(users AS DOUBLE)
                 / (SELECT users FROM counts WHERE step = 1) * 100
                 * 100 + 0.5) / 100
               AS conv_from_first
    FROM counts ORDER BY step
    """,
)
def q34_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    stages = []
    anchor = None
    for step_name, _ in _FUNNEL_STEPS:
        stage = events.where(F.col("event_type") == step_name)
        if anchor is not None:
            stage = stage.join(anchor, "user_id").where(
                F.col("ts") > F.col("anchor")
            )
        # persist each stage anchor: stage N's plan embeds every earlier
        # stage, and the final union evaluates all of them — uncached,
        # the events scan repeats O(steps²) times instead of O(steps)
        anchor = track_persist(
            stage.groupBy("user_id").agg(F.min("ts").alias("anchor"))
        )
        stages.append(anchor)
    # One union-of-tagged-stages → one aggregate: a single job counts
    # every stage (the per-stage frames are persisted above, so the
    # union scans cached anchors), instead of scheduling one tiny
    # count job per funnel step.
    tagged = None
    for (step_name, step), stage in zip(_FUNNEL_STEPS, stages):
        t = stage.select(
            F.lit(step).cast("bigint").alias("step"),
            F.lit(step_name).alias("step_name"),
        )
        tagged = t if tagged is None else tagged.unionAll(t)
    grouped = tagged.groupBy("step", "step_name").agg(
        F.count("*").alias("_users")
    )
    # an empty stage vanishes from the groupBy; the funnel contract
    # (and the oracle) emits users=0 for it — restore via a literal
    # step spine
    spine = spark.createDataFrame(
        [(step, name) for name, step in _FUNNEL_STEPS],
        "step bigint, step_name string",
    )
    counts = spine.join(grouped, ["step", "step_name"], "left").select(
        "step",
        "step_name",
        F.coalesce(F.col("_users"), F.lit(0)).alias("users"),
    )
    first = counts.where(F.col("step") == 1).select(
        F.col("users").alias("_first")
    )
    return (
        counts.crossJoin(F.broadcast(first))
        .select(
            "step",
            "step_name",
            "users",
            round2(F.col("users").cast("double") / F.col("_first") * 100).alias(
                "conv_from_first"
            ),
        )
        .orderBy("step")
    )


# ---------------------------------------------------------------------------
# Q35 — SCD2 dimension build (slowly-changing dimension, type 2): collapse
# each user's event history into versioned attribute rows with
# [effective_from, effective_to) validity ranges — the warehouse pattern
# for tracking attribute changes over time. Attribute = the value band
# (high ≥ 100 / low); consecutive same-band events collapse into one
# version via the lag ≠ current run-start trick + running sum of starts.
# Scale: the lag, the running sum, and the final lead all share ONE
# partitioning (user_id) — a single exchange feeds the whole window
# chain; the run collapse is a partial-aggregable groupBy on the same key.
# ---------------------------------------------------------------------------


@query(
    "q35_scd2",
    oracle="""
    WITH b AS (
        SELECT user_id, ts, event_id,
               CASE WHEN value >= 100 THEN 'high' ELSE 'low' END AS band
        FROM events
    ),
    m AS (
        SELECT *, lag(band) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      AS prev
        FROM b
    ),
    r AS (
        SELECT user_id, band, ts,
               SUM(CASE WHEN prev IS NULL OR prev <> band THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS version
        FROM m
    ),
    dim AS (
        SELECT user_id, CAST(version AS BIGINT) AS version,
               min(band) AS band, min(ts) AS eff_from,
               COUNT(*) AS n_events
        FROM r GROUP BY 1, 2
    )
    SELECT user_id, version, band,
           strftime(eff_from, '%Y-%m-%d %H:%M:%S') AS effective_from,
           strftime(lead(eff_from) OVER (PARTITION BY user_id ORDER BY version),
                    '%Y-%m-%d %H:%M:%S') AS effective_to,
           n_events
    FROM dim ORDER BY user_id, version
    """,
)
def q35_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    band = F.when(F.col("value") >= 100, "high").otherwise("low")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    b = events.select("user_id", "ts", "event_id", band.alias("band"))
    m = b.withColumn("prev", F.lag("band").over(w))
    r = m.withColumn(
        "version",
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("prev") != F.col("band")), 1
            ).otherwise(0)
        )
        .over(w)
        .cast("bigint"),
    )
    dim = r.groupBy("user_id", "version").agg(
        F.min("band").alias("band"),
        F.min("ts").alias("eff_from"),
        F.count("*").alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return (
        dim.select(
            "user_id",
            "version",
            "band",
            fmt_ts("eff_from").alias("effective_from"),
            fmt_ts(F.lead("eff_from").over(wv)).alias("effective_to"),
            "n_events",
        )
        .orderBy("user_id", "version")
    )


# ---------------------------------------------------------------------------
# Q36 — weekly cohort retention: users grouped by the unix-week of their
# first event; each later week's distinct-active count is reported as a
# fraction of the cohort's week-0 size. Week = floor(epoch_seconds /
# 604800) — integer arithmetic, identical across engines (no engine-
# specific week-start conventions). Scale: first-seen is one
# groupBy(user_id); the activity join is co-partitioned on user_id; the
# final (cohort, offset) distinct-count shuffles once; the week-0 base
# joins back broadcast (one row per cohort).
# ---------------------------------------------------------------------------


@query(
    "q36_cohort_retention",
    oracle="""
    WITH w AS (
        SELECT user_id,
               CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS wk
        FROM events
    ),
    f AS (SELECT user_id, min(wk) AS cohort FROM w GROUP BY 1),
    g AS (
        SELECT cohort, wk - cohort AS week_offset,
               COUNT(DISTINCT w.user_id) AS active_users
        FROM w JOIN f ON w.user_id = f.user_id GROUP BY 1, 2
    ),
    b AS (SELECT cohort, active_users AS base FROM g WHERE week_offset = 0)
    SELECT g.cohort, g.week_offset, g.active_users,
           floor(CAST(g.active_users AS DOUBLE) / b.base * 100 * 100 + 0.5) / 100
               AS retention_pct
    FROM g JOIN b ON g.cohort = b.cohort
    ORDER BY 1, 2
    """,
)
def q36_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = events.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 604800).cast("bigint").alias("wk"),
    )
    f = w.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    # persisted: the week-0 base `b` is a second full evaluation of g
    # otherwise (first-seen groupBy + activity join + distinct count ×2)
    g = track_persist(
        w.join(f, "user_id")
        .groupBy("cohort", (F.col("wk") - F.col("cohort")).alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("active_users"))
    )
    b = g.where(F.col("week_offset") == 0).select(
        "cohort", F.col("active_users").alias("base")
    )
    return (
        g.join(F.broadcast(b), "cohort")
        .select(
            "cohort",
            "week_offset",
            "active_users",
            round2(F.col("active_users").cast("double") / F.col("base") * 100).alias(
                "retention_pct"
            ),
        )
        .orderBy("cohort", "week_offset")
    )


# ---------------------------------------------------------------------------
# Q39 — per-row group share via the salted window rewrite. The "what
# fraction of its type's total does this event carry" projection is the
# canonical skew-bound window shape (partitionBy a categorical key with
# hot values); this query runs it through operators/scale.py
# salted_window — two balanced shuffles + a broadcast join back, no
# single-task hot partition — and the DuckDB oracle pins that the
# rewrite is value-identical to the plain SUM() OVER (PARTITION BY)
# form. Decimal accumulation makes the group totals bit-identical in
# both engines; floor-rounding pins one rounding rule into both plans.
# ---------------------------------------------------------------------------


@query(
    "q39_group_share",
    oracle="""
    SELECT event_id, event_type,
           CASE WHEN _total = 0 THEN NULL
                ELSE floor(CAST(value AS DOUBLE) / CAST(_total AS DOUBLE)
                           * 10000 + 0.5) / 10000
           END AS share
    FROM (
        SELECT event_id, event_type, value,
               SUM(CAST(value AS DECIMAL(18,6)))
                   OVER (PARTITION BY event_type) AS _total
        FROM events
    ) ORDER BY event_id
    """,
)
def q39_group_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .scale import salted_window

    events = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", F.col("value").cast(DEC).alias("_vd")
    )
    shared = salted_window(events, "event_type", {"_total": "sum(_vd)"})
    # A zero group total would make value/0.0 yield Inf/NaN, where
    # Spark's floor (LONG result) and DuckDB's floor (DOUBLE Inf/NaN)
    # disagree — nullify the share identically in both plans instead.
    share = F.when(F.col("_total") == 0, F.lit(None).cast("double")).otherwise(
        F.floor(
            F.col("value").cast("double")
            / F.col("_total").cast("double")
            * 10000
            + 0.5
        )
        / 10000
    )
    return (
        shared.select("event_id", "event_type", share.alias("share"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Q40 — MERGE / upsert (SCD type-1 "last write wins") as a LOW-SHUFFLE
# plan. The warehouse MERGE INTO (matched -> update, not-matched ->
# insert) is usually planned as a full-outer join, which cannot
# broadcast and forces both sides through a shuffle. But in the CDC
# shape that actually occurs at 100 TB — a small changes batch against
# a huge base — the scale-correct plan is:
#   1. ONE scan of the base with a broadcast LEFT join against the
#      changes (matched rows update in place, the rest pass through),
#   2. inserts = changes LEFT ANTI the base KEYS (a column-pruned scan;
#      with the base bucketed by the merge key this leg is co-located),
#   3. UNION ALL.
# No base shuffle, no full-outer. The changes batch here is derived
# deterministically from orders (pending 'F'-status balance deltas;
# custkey % 7 == 0 rows are shifted out of the key space to exercise
# the insert path). Falls back conceptually to sort-merge on a bucketed
# base when the changes batch is NOT small — documented, not needed at
# any bench SF. DECIMAL delta accumulation + floor-rounding keep the
# merged balance bit-identical to the DuckDB oracle.
# ---------------------------------------------------------------------------


@query(
    "q40_merge_upsert",
    oracle="""
    WITH ch AS (
        SELECT CASE WHEN o_custkey % 7 = 0 THEN o_custkey + 10000000
                    ELSE o_custkey END AS k,
               SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS delta
        FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
    )
    SELECT c.c_custkey,
           floor(CAST(CAST(c.c_acctbal AS DECIMAL(18,6)) + COALESCE(ch.delta, 0)
                      AS DOUBLE) * 100 + 0.5) / 100 AS new_bal,
           CASE WHEN ch.k IS NULL THEN 'keep' ELSE 'update' END AS action
    FROM customer c LEFT JOIN ch ON c.c_custkey = ch.k
    UNION ALL
    SELECT ch.k AS c_custkey,
           floor(CAST(ch.delta AS DOUBLE) * 100 + 0.5) / 100 AS new_bal,
           'insert' AS action
    FROM ch WHERE ch.k NOT IN (SELECT c_custkey FROM customer)
    ORDER BY c_custkey
    """,
)
def q40_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    ch = (
        orders.where(F.col("o_orderstatus") == "F")
        .groupBy(
            F.when(F.col("o_custkey") % 7 == 0, F.col("o_custkey") + 10000000)
            .otherwise(F.col("o_custkey"))
            .alias("k")
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("delta"))
    )
    base = customer.select("c_custkey", "c_acctbal")
    merged = base.join(F.broadcast(ch), base["c_custkey"] == ch["k"], "left").select(
        "c_custkey",
        round2(
            (
                F.col("c_acctbal").cast("decimal(18,6)")
                + F.coalesce(F.col("delta"), F.lit(0).cast("decimal(18,6)"))
            ).cast("double")
        ).alias("new_bal"),
        F.when(F.col("k").isNull(), F.lit("keep")).otherwise(F.lit("update")).alias(
            "action"
        ),
    )
    inserts = (
        ch.join(base.select("c_custkey"), ch["k"] == F.col("c_custkey"), "left_anti")
        .select(
            F.col("k").alias("c_custkey"),
            round2(F.col("delta").cast("double")).alias("new_bal"),
            F.lit("insert").alias("action"),
        )
    )
    return merged.unionByName(inserts).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# Q41 — statistical aggregate surface: correlation, covariance, linear
# regression (slope/intercept/r2/count), spread, and distribution shape
# (skewness/kurtosis) per group. The reference's anomaly-detection job
# computes mean/stddev z-score bands over rolling per-key state
# (streaming-jobs/anomaly-detection/.../AnomalyDetectionJob.java:209-215,
# 313-315); this is the rest of the SQL-standard statistical family a
# cold-store analyst would reach for on the same table.
#
# All of these are single-pass mergeable moment aggregates: each is a
# partial-final plan over (n, Σx, Σxy, Σx², Σx³, Σx⁴) map-side combines,
# so the one shuffle carries 3 groups × a dozen doubles — the plan is
# scale-free in the fact-table size.
#
# Cross-engine definition bridge: Spark's skewness/kurtosis are the
# POPULATION moments (g1 = m3/m2^1.5, excess g2 = m4/m2² − 3) while
# DuckDB's are the bias-corrected SAMPLE statistics (G1, G2). The query
# converts Spark's g to sample G explicitly:
#     G1 = g1 · sqrt(n(n−1)) / (n−2)
#     G2 = (n−1)/((n−2)(n−3)) · ((n+1)·g2 + 6)
# so both engines emit the same estimator. O(1)-magnitude outputs
# (corr, r2, skewness, kurtosis) quantize at 1e-6; large-magnitude ones
# (covariance, variance, stddev, slope, intercept) at 1e-2 —
# quantization absorbs the merge-order ULP noise of parallel moment
# accumulation (helpers.py scheme).
# ---------------------------------------------------------------------------


@query(
    "q41_stat_aggregates",
    oracle=f"""
    SELECT l_returnflag,
           {sql_quant6('corr(l_quantity, l_extendedprice)')} AS corr_qty_price,
           {sql_round2('covar_samp(l_quantity, l_extendedprice)')} AS covar_s,
           {sql_round2('covar_pop(l_quantity, l_extendedprice)')} AS covar_p,
           {sql_round2('stddev_samp(l_extendedprice)')} AS sd_price,
           {sql_round2('var_samp(l_extendedprice)')} AS var_price,
           {sql_quant6('skewness(l_extendedprice)')} AS skew_price,
           {sql_quant6('kurtosis(l_extendedprice)')} AS kurt_price,
           {sql_round2('regr_slope(l_extendedprice, l_quantity)')} AS slope,
           {sql_round2('regr_intercept(l_extendedprice, l_quantity)')} AS intercept,
           {sql_quant6('regr_r2(l_extendedprice, l_quantity)')} AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q41_stat_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    n = F.count("l_extendedprice")
    g1 = F.skewness("l_extendedprice")
    g2 = F.kurtosis("l_extendedprice")
    return (
        li.groupBy("l_returnflag")
        .agg(
            quant6(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
            round2(F.covar_samp("l_quantity", "l_extendedprice")).alias("covar_s"),
            round2(F.covar_pop("l_quantity", "l_extendedprice")).alias("covar_p"),
            round2(F.stddev_samp("l_extendedprice")).alias("sd_price"),
            round2(F.var_samp("l_extendedprice")).alias("var_price"),
            # population -> sample bias correction (see block comment)
            quant6(g1 * F.sqrt(n * (n - 1)) / (n - 2)).alias("skew_price"),
            quant6(
                (n - 1) / ((n - 2) * (n - 3)) * ((n + 1) * g2 + 6)
            ).alias("kurt_price"),
            round2(F.regr_slope("l_extendedprice", "l_quantity")).alias("slope"),
            round2(F.regr_intercept("l_extendedprice", "l_quantity")).alias(
                "intercept"
            ),
            quant6(F.regr_r2("l_extendedprice", "l_quantity")).alias("r2"),
            F.regr_count("l_extendedprice", "l_quantity").alias("n_pairs"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q42 (registered as x23) — quality-weighted corpus subsampling via
# SEQUENTIAL POISSON / PRIORITY sampling (Ohlsson 1998; Duffield et al.
# 2007): each row gets priority u/w where u is a deterministic uniform
# and w its weight; the k SMALLEST priorities form a weighted-without-
# replacement sample with inclusion probability ∝ w. The LLM-pipeline
# use: subsample a corpus proportional to document quality/length
# without an RNG — reruns, backfills, and engines all agree.
#
# Determinism is ARITHMETIC, not seeded: u is built from six md5
# nibbles as a sum of dyadic rationals (every term and the sum are
# exact doubles) and the priority is ONE IEEE division — no ln()/exp()
# whose last-ulp libm differences could flip ranks between engines
# (the reason this is priority sampling, not Efraimidis-Spirakis
# u^(1/w) reservoir keys). Plan shape: the priority is a scan-local
# projection and the global k-smallest executes as per-partition top-k
# + a k-row driver merge (TakeOrderedAndProject) — no global sort at
# 100 TB.
# ---------------------------------------------------------------------------

# E-notation literals: Spark SQL parses `16.0` as DECIMAL but `16E0`
# as DOUBLE; DuckDB treats both as DOUBLE — E-notation keeps the whole
# expression in exact-dyadic double arithmetic on both engines.
_NIBBLES = " + ".join(
    f"(POSITION(substr(md5(CAST(doc_id AS {{S}})), {i}, 1) IN "
    f"'0123456789abcdef') - 1) / {16 ** i}E0"
    for i in range(1, 7)
)
_PRIORITY = f"(({_NIBBLES} + 1E0 / 16777216) / GREATEST(n_chars, 1))"


@query(
    "x23_weighted_priority_sample",
    oracle=f"""
    SELECT doc_id, n_chars, {_PRIORITY.replace('{S}', 'VARCHAR')} AS priority
    FROM documents
    ORDER BY priority, doc_id LIMIT 100
    """,
)
def x23_weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "n_chars",
            F.expr(_PRIORITY.replace("{S}", "STRING")).alias("priority"),
        )
        .orderBy("priority", "doc_id")
        .limit(100)
    )
