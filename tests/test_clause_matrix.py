"""Parser-conformance clause matrix: clause COMBINATIONS either execute
with the right semantics or raise a NAMED error (ParseError/BuildError)
— never a silent misparse and never a raw KeyError/AnalysisException
leaking from the lowering.

Two tiers:
  * PINNED — micro-table queries with exact expected results, covering
    the combination hot-spots (FINAL+SAMPLE+PREWHERE, LIMIT BY+WITH
    TIES, WITH FILL+INTERPOLATE, totals+HAVING, ARRAY JOIN+GROUP BY…).
  * SWEEP — combinations over the sf0.001 tables that must either run
    to completion or raise a named error.

Reference: clause registry in ``src/Parsers/ParserSelectQuery.cpp``
(FINAL/SAMPLE/PREWHERE/GROUP BY/HAVING/WINDOW/ORDER WITH FILL/LIMIT
BY/WITH TIES/SETTINGS are all orthogonal slots there — combinations are
legal unless explicitly rejected).
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_from_scratch_spark.catalog import load_all
from clickhouse_from_scratch_spark.plans import (
    ParseError, execute_sql)
from clickhouse_from_scratch_spark.plans.builder import BuildError

NAMED_ERRORS = (ParseError, BuildError)

MICRO_ENGINES = {"t": {"order_by": ["k"], "version": "ver",
                       "sample_by": "k"}}


@pytest.fixture(scope="module")
def micro(spark):
    rows = [
        (1, 1, "x", 10, [1, 2]),
        (1, 2, "x", 11, [2, 3]),   # FINAL keeps ver=2 for k=1
        (2, 1, "y", 20, [3]),
        (3, 1, "x", 30, []),
        (4, 1, "y", 40, [4, 5]),
        (5, 1, "z", 50, [6]),
    ]
    t = spark.createDataFrame(
        rows, "k int, ver int, g string, v int, arr array<int>")
    quotes = spark.createDataFrame(
        [(1, 100, 9.0), (1, 200, 9.5), (2, 150, 20.0)],
        "k int, qts bigint, px double")
    trades = spark.createDataFrame(
        [(1, 250, 1), (2, 100, 2)], "k int, tts bigint, qty int")
    return {"t": t, "quotes": quotes, "trades": trades}


def run(spark, micro, sql):
    return execute_sql(spark, sql, micro, engines=MICRO_ENGINES)


# --- PINNED: exact semantics on micro tables ------------------------------

def test_final_where_order(spark, micro):
    got = run(spark, micro, "SELECT k, v FROM t FINAL WHERE k <= 2 "
                            "ORDER BY k").collect()
    assert [(r.k, r.v) for r in got] == [(1, 11), (2, 20)]


def test_final_prewhere(spark, micro):
    got = run(spark, micro, "SELECT k, v FROM t FINAL PREWHERE g = 'x' "
                            "ORDER BY k").collect()
    assert [(r.k, r.v) for r in got] == [(1, 11), (3, 30)]


def test_prewhere_where_compose(spark, micro):
    got = run(spark, micro, "SELECT k FROM t PREWHERE g = 'x' "
                            "WHERE v > 10 ORDER BY k").collect()
    assert [r.k for r in got] == [1, 3]


def test_final_sample_subset(spark, micro):
    full = {(r.k, r.v) for r in
            run(spark, micro, "SELECT k, v FROM t FINAL").collect()}
    samp = {(r.k, r.v) for r in
            run(spark, micro,
                "SELECT k, v FROM t FINAL SAMPLE 1/2").collect()}
    assert samp <= full and len(samp) <= len(full)


def test_final_sample_prewhere_kitchen_sink(spark, micro):
    # every row surviving the stack must satisfy both filters and the
    # FINAL collapse (no ver=1 for k=1)
    got = run(spark, micro,
              "SELECT k, v FROM t FINAL SAMPLE 1 PREWHERE v >= 11 "
              "WHERE g != 'z' ORDER BY k").collect()
    assert [(r.k, r.v) for r in got] == [(1, 11), (2, 20), (3, 30),
                                         (4, 40)]


def test_group_totals_having_after(spark, micro):
    got = run(spark, micro, "SELECT g, sum(v) AS s FROM t GROUP BY g "
                            "WITH TOTALS HAVING s > 55").collect()
    # totals key cell = String type default '' (sorts first)
    assert sorted((r.g, r.s) for r in got) == [("", 60), ("y", 60)]


def test_group_totals_having_before_mode(spark, micro):
    got = run(spark, micro,
              "SELECT g, sum(v) AS s FROM t GROUP BY g WITH TOTALS "
              "HAVING s > 55 SETTINGS totals_mode = 'before_having'"
              ).collect()
    # before_having: totals over ALL rows (161), not just survivors
    assert ("", 161) in {(r.g, r.s) for r in got}


def test_rollup_order_limit(spark, micro):
    got = run(spark, micro, "SELECT g, sum(v) AS s FROM t "
                            "GROUP BY ROLLUP(g) ORDER BY s DESC, g "
                            "LIMIT 2").collect()
    assert [(r.g, r.s) for r in got] == [("", 161), ("y", 60)]


def test_grouping_sets_having(spark, micro):
    got = run(spark, micro,
              "SELECT g, sum(v) AS s FROM t "
              "GROUP BY GROUPING SETS ((g), ()) HAVING s >= 60 "
              "ORDER BY s").collect()
    assert [(r.g, r.s) for r in got] == [("y", 60), ("", 161)]


def test_distinct_on_order(spark, micro):
    got = run(spark, micro, "SELECT DISTINCT ON (g) g, v FROM t "
                            "ORDER BY g, v DESC").collect()
    assert [(r.g, r.v) for r in got] == [("x", 30), ("y", 40),
                                         ("z", 50)]


def test_limit_by_order(spark, micro):
    got = run(spark, micro, "SELECT g, v FROM t ORDER BY g, v DESC "
                            "LIMIT 1 BY g").collect()
    assert [(r.g, r.v) for r in got] == [("x", 30), ("y", 40),
                                         ("z", 50)]


def test_limit_by_with_offset_form(spark, micro):
    got = run(spark, micro, "SELECT g, v FROM t ORDER BY g, v DESC "
                            "LIMIT 1, 1 BY g").collect()
    # skip 1 per group then take 1: x→11, y→20; z has no 2nd row
    assert [(r.g, r.v) for r in got] == [("x", 11), ("y", 20)]


def test_limit_with_ties(spark, micro):
    got = run(spark, micro,
              "SELECT intDiv(v, 20) AS b FROM t ORDER BY b "
              "LIMIT 3 WITH TIES").collect()
    assert [r.b for r in got] == [0, 0, 1, 1]


def test_with_fill_from_to(spark, micro):
    got = run(spark, micro,
              "SELECT k, sum(v) AS s FROM t GROUP BY k "
              "ORDER BY k WITH FILL FROM 1 TO 7").collect()
    assert [r.k for r in got] == [1, 2, 3, 4, 5, 6]
    # fill-generated rows carry the type default (0), not NULL
    assert got[-1].s == 0


def test_with_fill_interpolate(spark, micro):
    got = run(spark, micro,
              "SELECT k, sum(v) AS s FROM t WHERE k != 3 GROUP BY k "
              "ORDER BY k WITH FILL FROM 1 TO 6 "
              "INTERPOLATE (s AS s)").collect()
    by_k = {r.k: r.s for r in got}
    assert by_k[3] == by_k[2] == 20     # carried forward
    assert set(by_k) == {1, 2, 3, 4, 5}


def test_union_distinct_order_limit(spark, micro):
    # CH binds a trailing ORDER BY/LIMIT to the LAST select of a union
    # (SELECT-union docs); whole-result ordering needs a subquery wrap
    got = run(spark, micro,
              "SELECT g FROM (SELECT g FROM t UNION DISTINCT "
              "SELECT 'w' AS g) ORDER BY g LIMIT 3").collect()
    assert [r.g for r in got] == ["w", "x", "y"]
    unordered = run(spark, micro,
                    "SELECT g FROM t UNION DISTINCT SELECT 'w' AS g "
                    "ORDER BY g LIMIT 3").collect()
    assert {r.g for r in unordered} == {"w", "x", "y", "z"}


def test_intersect_except_chain(spark, micro):
    # CH bare INTERSECT/EXCEPT are hash-set filters that keep left
    # multiplicity: k=1 appears twice in t, so it survives twice
    got = run(spark, micro,
              "SELECT k FROM t INTERSECT SELECT k FROM t WHERE k < 4 "
              "EXCEPT SELECT 2 AS k ORDER BY k").collect()
    assert sorted(r.k for r in got) == [1, 1, 3]


def test_cte_window_outer_filter(spark, micro):
    got = run(spark, micro, """
        WITH ranked AS (
            SELECT g, v, row_number() OVER (PARTITION BY g
                ORDER BY v DESC) AS rn FROM t)
        SELECT g, v FROM ranked WHERE rn = 1 ORDER BY g""").collect()
    assert [(r.g, r.v) for r in got] == [("x", 30), ("y", 40),
                                         ("z", 50)]


def test_array_join_group_by(spark, micro):
    got = run(spark, micro, "SELECT a, count() AS n FROM t "
                            "ARRAY JOIN arr AS a GROUP BY a "
                            "ORDER BY a").collect()
    assert [(r.a, r.n) for r in got] == [(1, 1), (2, 2), (3, 2),
                                         (4, 1), (5, 1), (6, 1)]


def test_left_array_join_keeps_empty(spark, micro):
    inner = run(spark, micro,
                "SELECT k FROM t ARRAY JOIN arr AS a").count()
    left = run(spark, micro,
               "SELECT k FROM t LEFT ARRAY JOIN arr AS a").count()
    assert (inner, left) == (8, 9)      # k=3 has an empty array


def test_asof_join_where(spark, micro):
    got = run(spark, micro, """
        SELECT t1.k AS k, t1.qty AS qty, q.px AS px
        FROM trades t1 ASOF JOIN quotes q
        ON t1.k = q.k AND t1.tts >= q.qts
        WHERE t1.qty > 0 ORDER BY k""").collect()
    assert [(r.k, r.qty, r.px) for r in got] == [(1, 1, 9.5)]


def test_semi_join_prewhere(spark, micro):
    got = run(spark, micro,
              "SELECT k FROM t SEMI LEFT JOIN trades USING (k) "
              "PREWHERE g != 'z' ORDER BY k").collect()
    assert [r.k for r in got] == [1, 1, 2]


def test_anti_join_limit_ties(spark, micro):
    got = run(spark, micro,
              "SELECT k FROM t ANTI LEFT JOIN trades USING (k) "
              "ORDER BY k LIMIT 2 WITH TIES").collect()
    assert [r.k for r in got] == [3, 4]


def test_group_by_all_having(spark, micro):
    got = run(spark, micro, "SELECT g, sum(v) AS s FROM t "
                            "GROUP BY ALL HAVING s < 60 ORDER BY g"
              ).collect()
    assert [(r.g, r.s) for r in got] == [("x", 51), ("z", 50)]


def test_in_subquery_having_exists(spark, micro):
    got = run(spark, micro, """
        SELECT g, count() AS n FROM t
        WHERE k IN (SELECT k FROM t WHERE v > 10)
        GROUP BY g
        HAVING g IN (SELECT g FROM t WHERE v >= 40)
        ORDER BY g""").collect()
    assert [(r.g, r.n) for r in got] == [("y", 2), ("z", 1)]


def test_scalar_subquery_select_plus_where(spark, micro):
    got = run(spark, micro,
              "SELECT k, v - (SELECT min(v) FROM t) AS dv FROM t "
              "WHERE v = (SELECT max(v) FROM t)").collect()
    assert [(r.k, r.dv) for r in got] == [(5, 40)]


def test_window_named_clause_with_fill(spark, micro):
    got = run(spark, micro, """
        SELECT k, sum(v) OVER w AS rs FROM t
        WINDOW w AS (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
        ORDER BY k WITH FILL FROM 1 TO 6""").collect()
    assert len(got) == 6 and got[0].k == 1


def test_top_with_order(spark, micro):
    got = run(spark, micro, "SELECT TOP 2 k FROM t ORDER BY v DESC"
              ).collect()
    assert [r.k for r in got] == [5, 4]


def test_settings_tail_with_limit(spark, micro):
    got = run(spark, micro, "SELECT k FROM t ORDER BY k LIMIT 2 "
                            "SETTINGS max_threads = 4").collect()
    assert [r.k for r in got] == [1, 1]


def test_distinct_then_limit_by(spark, micro):
    got = run(spark, micro, "SELECT DISTINCT g, v FROM t "
                            "ORDER BY g, v LIMIT 1 BY g").collect()
    assert [(r.g, r.v) for r in got] == [("x", 10), ("y", 20),
                                         ("z", 50)]


def test_subquery_limit_by_outer_where(spark, micro):
    got = run(spark, micro, """
        SELECT g, v FROM
          (SELECT g, v FROM t ORDER BY g, v DESC LIMIT 1 BY g)
        WHERE v >= 40 ORDER BY g""").collect()
    assert [(r.g, r.v) for r in got] == [("y", 40), ("z", 50)]


# --- named-error contract on unsupported/invalid combinations ------------

def test_qualify_supported_r12(spark, micro):
    # QUALIFY graduated from the named-error list in r12: post-window
    # filter, one row per ORDER BY v ranking
    got = run(spark, micro, "SELECT g, v FROM t QUALIFY "
              "row_number() OVER (ORDER BY v) = 1").collect()
    assert len(got) == 1


@pytest.mark.parametrize("sql", [
    "SELECT sum(v) WITHIN GROUP (ORDER BY v) FROM t",
    "SELECT k FROM t SAMPLE 'not_a_number'",
    "SELECT k FROM t LIMIT 2 BY",                 # dangling BY
    "SELECT k FROM t ORDER BY k WITH FILL STEP",  # dangling STEP
    "SELECT arrayReduce('nosuchagg', arr) FROM t",
], ids=["within-group", "sample-nonnum", "dangling-by",
        "dangling-step", "bad-arrayreduce"])
def test_unsupported_combo_raises_named(spark, micro, sql):
    with pytest.raises(NAMED_ERRORS):
        run(spark, micro, sql).collect()


# --- SWEEP: combinations over sf tables run or raise named ---------------

SWEEP = [
    "SELECT l_returnflag, sum(l_quantity) AS s FROM lineitem "
    "PREWHERE l_linenumber = 1 WHERE l_quantity > 10 "
    "GROUP BY l_returnflag WITH TOTALS HAVING s > 0 "
    "ORDER BY l_returnflag LIMIT 5",

    "SELECT o_orderpriority, count() AS n FROM orders "
    "GROUP BY ROLLUP(o_orderpriority) ORDER BY n DESC LIMIT 3 WITH TIES",

    "SELECT DISTINCT ON (o_custkey) o_custkey, o_totalprice FROM orders "
    "ORDER BY o_custkey, o_totalprice DESC LIMIT 10",

    "SELECT c_mktsegment, c_name FROM customer "
    "ORDER BY c_mktsegment, c_name LIMIT 2 BY c_mktsegment LIMIT 6",

    "SELECT toDate(o_orderdate) AS d, count() AS n FROM orders "
    "WHERE o_orderkey < 100 GROUP BY d "
    "ORDER BY d WITH FILL INTERPOLATE (n AS n)",

    "WITH big AS (SELECT o_custkey FROM orders GROUP BY o_custkey "
    "HAVING count() > 2) "
    "SELECT count() AS n FROM customer SEMI LEFT JOIN big "
    "ON c_custkey = o_custkey",

    "SELECT s_name FROM supplier ANTI LEFT JOIN nation "
    "ON s_nationkey = n_nationkey ORDER BY s_name LIMIT 3",

    "SELECT n_name, count() AS n FROM customer "
    "INNER JOIN nation ON c_nationkey = n_nationkey "
    "GROUP BY n_name ORDER BY n DESC, n_name LIMIT 3 WITH TIES",

    "SELECT user_id, count() AS n FROM events FINAL "
    "GROUP BY user_id ORDER BY n DESC LIMIT 5",

    "SELECT user_id FROM events FINAL SAMPLE 1/2 "
    "ORDER BY user_id LIMIT 5",

    "SELECT event_type FROM events WHERE event_type LIKE 'v%' "
    "UNION DISTINCT SELECT event_type FROM events "
    "WHERE event_type ILIKE 'P%' ORDER BY event_type",

    "SELECT o_orderkey FROM orders WHERE o_orderkey < 50 "
    "INTERSECT SELECT l_orderkey FROM lineitem "
    "EXCEPT SELECT 1 AS o_orderkey ORDER BY o_orderkey LIMIT 5",

    "SELECT word, count() AS n FROM documents "
    "ARRAY JOIN splitByChar(' ', text) AS word "
    "PREWHERE lang = 'en' GROUP BY word "
    "ORDER BY n DESC, word LIMIT 5",

    "SELECT c_mktsegment, avg(c_acctbal) AS a FROM customer "
    "GROUP BY ALL HAVING a > 0 ORDER BY a DESC LIMIT 3",

    "SELECT o_custkey, o_totalprice, "
    "rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS rk "
    "FROM orders WHERE o_custkey < 20 ORDER BY o_custkey, rk "
    "LIMIT 10 WITH TIES",

    "SELECT l_returnflag, quantilesIf(0.5, 0.9)(l_quantity, "
    "l_discount > 0.02) AS q FROM lineitem GROUP BY l_returnflag "
    "ORDER BY l_returnflag",

    "SELECT count() AS n FROM lineitem "
    "WHERE l_orderkey IN (SELECT o_orderkey FROM orders "
    "WHERE o_orderpriority = '1-URGENT') "
    "  AND EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)",

    "SELECT g, s FROM (SELECT l_returnflag AS g, "
    "sumIf(DISTINCT l_linenumber, l_linenumber < 5) AS s "
    "FROM lineitem GROUP BY g) ORDER BY g SETTINGS max_threads = 8",
]

SWEEP_ENGINES = {"events": {"order_by": ["user_id"], "version": "ts",
                            "sample_by": "user_id"}}


@pytest.fixture(scope="module")
def sf_tables(spark, sf_dir):
    return load_all(spark, sf_dir)


@pytest.mark.parametrize("sql", SWEEP,
                         ids=[f"sweep{i:02d}" for i in range(len(SWEEP))])
def test_clause_sweep_runs_or_named(spark, sf_tables, sql):
    try:
        execute_sql(spark, sql, sf_tables,
                    engines=SWEEP_ENGINES).collect()
    except NAMED_ERRORS:
        pass        # named raise is the honest-failure contract
