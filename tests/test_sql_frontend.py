"""ClickHouse-dialect SQL frontend: parse + execute vs DuckDB oracle.

Each case is (CH SQL for our engine, ANSI SQL for DuckDB) — identical
result contract, compared order-insensitively like the driver gate.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from clickhouse_from_scratch_spark.catalog import load_all
from clickhouse_from_scratch_spark.plans import ParseError, execute_sql, parse
from tools.check_oracle import compare


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    return load_all(spark, sf_dir)


CASES = [
    # (name, clickhouse_sql, duckdb_sql_or_None_for_same)
    ("scan_filter_project",
     "SELECT o_orderkey, o_totalprice FROM orders "
     "WHERE o_totalprice > 100000 AND o_orderstatus = 'F'",
     None),
    ("q1_shape",
     "SELECT l_returnflag, l_linestatus, "
     "  round(sum(l_quantity), 4) AS sum_qty, count() AS cnt "
     "FROM lineitem WHERE l_shipdate <= toDate('1998-09-02') "
     "GROUP BY l_returnflag, l_linestatus",
     "SELECT l_returnflag, l_linestatus, "
     "  round(sum(l_quantity), 4) AS sum_qty, count(*) AS cnt "
     "FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02' "
     "GROUP BY l_returnflag, l_linestatus"),
    ("expr_arith",
     "SELECT o_orderkey, round(o_totalprice * 2 + 1 - 0.5, 4) AS v "
     "FROM orders WHERE o_orderkey < 100",
     None),
    ("between_rewrite",
     "SELECT count() AS n FROM orders "
     "WHERE o_totalprice BETWEEN 50000 AND 100000",
     "SELECT count(*) AS n FROM orders "
     "WHERE o_totalprice BETWEEN 50000 AND 100000"),
    ("in_literal",
     "SELECT count() AS n FROM orders "
     "WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')",
     "SELECT count(*) AS n FROM orders "
     "WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')"),
    ("not_in",
     "SELECT count() AS n FROM orders WHERE o_orderstatus NOT IN ('F')",
     "SELECT count(*) AS n FROM orders WHERE o_orderstatus NOT IN ('F')"),
    ("like_ilike",
     "SELECT count() AS n FROM customer "
     "WHERE c_name LIKE '%1%' AND c_mktsegment ILIKE 'build%'",
     "SELECT count(*) AS n FROM customer "
     "WHERE c_name LIKE '%1%' AND c_mktsegment ILIKE 'build%'"),
    ("case_when",
     "SELECT CASE WHEN o_totalprice < 50000 THEN 'low' "
     "WHEN o_totalprice < 200000 THEN 'mid' ELSE 'high' END AS band, "
     "count() AS n FROM orders GROUP BY band",
     "SELECT CASE WHEN o_totalprice < 50000 THEN 'low' "
     "WHEN o_totalprice < 200000 THEN 'mid' ELSE 'high' END AS band, "
     "count(*) AS n FROM orders GROUP BY band"),
    ("ternary",
     "SELECT o_totalprice > 100000 ? 'big' : 'small' AS sz, count() AS n "
     "FROM orders GROUP BY sz",
     "SELECT CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END "
     "AS sz, count(*) AS n FROM orders GROUP BY sz"),
    ("join_on",
     "SELECT n_name, r_name FROM nation "
     "JOIN region ON n_regionkey = r_regionkey",
     None),
    ("join_using",
     "SELECT count() AS n FROM orders "
     "JOIN customer USING (c_custkey)" if False else
     "SELECT n_name, count() AS n FROM customer "
     "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name",
     "SELECT n_name, count(*) AS n FROM customer "
     "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"),
    ("left_join",
     # join_use_nulls=0 default: non-matched s_suppkey is 0, not NULL, so
     # count(s_suppkey) counts it -> model with count(*) in DuckDB
     "SELECT n_nationkey, count(s_suppkey) AS ns FROM nation "
     "LEFT JOIN supplier ON s_nationkey = n_nationkey GROUP BY n_nationkey",
     "SELECT n_nationkey, count(*) AS ns FROM nation "
     "LEFT JOIN supplier ON s_nationkey = n_nationkey GROUP BY n_nationkey"),
    ("left_join_use_nulls",
     "SELECT n_nationkey, count(s_suppkey) AS ns FROM nation "
     "LEFT JOIN supplier ON s_nationkey = n_nationkey GROUP BY n_nationkey "
     "SETTINGS join_use_nulls = 1",
     "SELECT n_nationkey, count(s_suppkey) AS ns FROM nation "
     "LEFT JOIN supplier ON s_nationkey = n_nationkey GROUP BY n_nationkey"),
    ("cross_join",
     "SELECT r_name, n_name FROM region CROSS JOIN nation",
     None),
    ("comma_join",
     "SELECT count() AS n FROM region, nation "
     "WHERE n_regionkey = r_regionkey",
     "SELECT count(*) AS n FROM region, nation "
     "WHERE n_regionkey = r_regionkey"),
    ("semi_join",
     "SELECT c_custkey FROM customer SEMI LEFT JOIN orders "
     "ON c_custkey = o_custkey" if False else
     "SELECT c_custkey FROM customer "
     "WHERE c_custkey IN (SELECT o_custkey FROM orders)",
     "SELECT c_custkey FROM customer "
     "WHERE c_custkey IN (SELECT o_custkey FROM orders)"),
    ("anti_join_via_not_in",
     "SELECT count() AS n FROM customer "
     "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)",
     "SELECT count(*) AS n FROM customer "
     "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"),
    ("subquery_from",
     "SELECT round(sum(t), 4) AS a FROM "
     "(SELECT o_custkey, max(o_totalprice) AS t FROM orders "
     "GROUP BY o_custkey)",
     "SELECT round(sum(t), 4) AS a FROM "
     "(SELECT o_custkey, max(o_totalprice) AS t FROM orders "
     "GROUP BY o_custkey) sub"),
    ("cte",
     "WITH big AS (SELECT * FROM orders WHERE o_totalprice > 150000) "
     "SELECT o_orderstatus, count() AS n FROM big GROUP BY o_orderstatus",
     "WITH big AS (SELECT * FROM orders WHERE o_totalprice > 150000) "
     "SELECT o_orderstatus, count(*) AS n FROM big GROUP BY o_orderstatus"),
    ("scalar_with_alias",
     "WITH 100000 AS threshold "
     "SELECT count() AS n FROM orders WHERE o_totalprice > threshold",
     "SELECT count(*) AS n FROM orders WHERE o_totalprice > 100000"),
    ("rollup",
     "SELECT o_orderstatus, o_orderpriority, count() AS n FROM orders "
     "GROUP BY ROLLUP(o_orderstatus, o_orderpriority)",
     "SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN '' ELSE "
     "o_orderstatus END AS o_orderstatus, CASE WHEN "
     "GROUPING(o_orderpriority) = 1 THEN '' ELSE o_orderpriority END AS "
     "o_orderpriority, count(*) AS n FROM orders "
     "GROUP BY ROLLUP(o_orderstatus, o_orderpriority)"),
    ("cube_with_syntax",
     "SELECT l_returnflag, l_linestatus, count() AS n FROM lineitem "
     "GROUP BY l_returnflag, l_linestatus WITH CUBE",
     "SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN '' ELSE "
     "l_returnflag END AS l_returnflag, CASE WHEN GROUPING(l_linestatus) "
     "= 1 THEN '' ELSE l_linestatus END AS l_linestatus, count(*) AS n "
     "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"),
    ("with_totals",
     "SELECT event_type, count() AS n FROM events "
     "GROUP BY event_type WITH TOTALS",
     "SELECT CASE WHEN GROUPING(event_type) = 1 THEN '' ELSE event_type "
     "END AS event_type, count(*) AS n FROM events "
     "GROUP BY GROUPING SETS ((event_type), ())"),
    ("grouping_sets",
     "SELECT o_orderstatus, o_orderpriority, count() AS n FROM orders "
     "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))",
     "SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN '' ELSE "
     "o_orderstatus END AS o_orderstatus, CASE WHEN "
     "GROUPING(o_orderpriority) = 1 THEN '' ELSE o_orderpriority END AS "
     "o_orderpriority, count(*) AS n FROM orders "
     "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))"),
    ("having",
     "SELECT c_nationkey, count() AS n FROM customer "
     "GROUP BY c_nationkey HAVING count() > 5",
     "SELECT c_nationkey, count(*) AS n FROM customer "
     "GROUP BY c_nationkey HAVING count(*) > 5"),
    ("order_limit_offset",
     "SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC, o_orderkey "
     "LIMIT 5 OFFSET 3",
     "SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC, o_orderkey "
     "LIMIT 5 OFFSET 3"),
    ("order_by_unselected",
     "SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC LIMIT 3",
     "SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC LIMIT 3"),
    ("limit_by",
     "SELECT o_orderpriority, o_orderkey FROM orders "
     "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2 BY o_orderpriority",
     "SELECT o_orderpriority, o_orderkey FROM "
     "(SELECT *, row_number() OVER (PARTITION BY o_orderpriority "
     " ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) "
     "WHERE rn <= 2"),
    ("distinct",
     "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
     None),
    ("distinct_on",
     "SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey FROM orders "
     "ORDER BY o_orderdate DESC, o_orderkey DESC",
     "SELECT o_custkey, o_orderkey FROM "
     "(SELECT *, row_number() OVER (PARTITION BY o_custkey "
     " ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) "
     "WHERE rn = 1"),
    ("with_ties",
     "SELECT l_quantity FROM lineitem ORDER BY l_quantity LIMIT 20 WITH TIES",
     "SELECT l_quantity FROM lineitem "
     "QUALIFY rank() OVER (ORDER BY l_quantity) <= 20"),
    ("union_all",
     "SELECT c_nationkey AS nk FROM customer UNION ALL "
     "SELECT s_nationkey AS nk FROM supplier",
     None),
    ("union_distinct",
     "SELECT c_nationkey AS nk FROM customer UNION DISTINCT "
     "SELECT s_nationkey AS nk FROM supplier",
     "SELECT c_nationkey AS nk FROM customer UNION "
     "SELECT s_nationkey AS nk FROM supplier"),
    # CH bare INTERSECT/EXCEPT default to ALL with hash-set filter
    # semantics (left duplicates kept); DuckDB speaks it as IN / NOT IN
    ("intersect",
     "SELECT c_nationkey AS nk FROM customer INTERSECT "
     "SELECT s_nationkey AS nk FROM supplier",
     "SELECT c_nationkey AS nk FROM customer WHERE c_nationkey IN "
     "(SELECT s_nationkey FROM supplier)"),
    ("intersect_distinct",
     "SELECT c_nationkey AS nk FROM customer INTERSECT DISTINCT "
     "SELECT s_nationkey AS nk FROM supplier",
     "SELECT c_nationkey AS nk FROM customer INTERSECT "
     "SELECT s_nationkey AS nk FROM supplier"),
    ("except",
     "SELECT c_nationkey AS nk FROM customer EXCEPT "
     "SELECT s_nationkey AS nk FROM supplier",
     "SELECT c_nationkey AS nk FROM customer WHERE c_nationkey NOT IN "
     "(SELECT s_nationkey FROM supplier)"),
    ("except_distinct",
     "SELECT c_nationkey AS nk FROM customer EXCEPT DISTINCT "
     "SELECT s_nationkey AS nk FROM supplier",
     "SELECT c_nationkey AS nk FROM customer EXCEPT "
     "SELECT s_nationkey AS nk FROM supplier"),
    ("window_rank",
     "SELECT event_id, rank() OVER (PARTITION BY user_id "
     "ORDER BY ts, event_id) AS rk FROM events",
     "SELECT event_id, CAST(rank() OVER (PARTITION BY user_id "
     "ORDER BY ts, event_id) AS INT) AS rk FROM events"),
    ("window_running",
     "SELECT o_orderkey, round(sum(o_totalprice) OVER (PARTITION BY "
     "o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED "
     "PRECEDING AND CURRENT ROW), 2) AS rt FROM orders",
     "SELECT o_orderkey, round(sum(o_totalprice) OVER (PARTITION BY "
     "o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED "
     "PRECEDING AND CURRENT ROW), 2) AS rt FROM orders"),
    ("window_lag",
     "SELECT event_id, lag(value) OVER (PARTITION BY user_id "
     "ORDER BY ts, event_id) AS pv FROM events",
     "SELECT event_id, lag(value) OVER (PARTITION BY user_id "
     "ORDER BY ts, event_id) AS pv FROM events"),
    ("agg_filter",
     "SELECT user_id, count() FILTER (WHERE event_type = 'purchase') AS np "
     "FROM events GROUP BY user_id",
     "SELECT user_id, count(*) FILTER (WHERE event_type = 'purchase') AS np "
     "FROM events GROUP BY user_id"),
    ("agg_distinct_kw",
     "SELECT count(DISTINCT l_suppkey) AS u FROM lineitem",
     "SELECT count(DISTINCT l_suppkey) AS u FROM lineitem"),
    ("parametric_quantile",
     "SELECT round(quantile(0.5)(o_totalprice), 4) AS med FROM orders",
     "SELECT round(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 4) "
     "AS med FROM orders"),
    ("argmax",
     "SELECT argMax(o_orderkey, o_totalprice) AS k FROM orders",
     "SELECT max_by(o_orderkey, o_totalprice) AS k FROM orders"),
    ("alias_in_where",
     "SELECT o_orderkey, o_totalprice * 0.9 AS discounted FROM orders "
     "WHERE discounted > 150000",
     "SELECT o_orderkey, o_totalprice * 0.9 AS discounted FROM orders "
     "WHERE o_totalprice * 0.9 > 150000"),
    ("alias_in_group_by",
     "SELECT toYear(o_orderdate) AS y, count() AS n FROM orders GROUP BY y",
     "SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y, count(*) "
     "AS n FROM orders GROUP BY 1"),
    ("string_fns",
     "SELECT c_custkey, upper(substring(c_name, 1, 8)) AS pfx, "
     "concat(c_mktsegment, '-', c_name) AS tag FROM customer",
     "SELECT c_custkey, upper(substr(c_name, 1, 8)) AS pfx, "
     "c_mktsegment || '-' || c_name AS tag FROM customer"),
    ("date_fns",
     "SELECT toYear(o_orderdate) AS y, toMonth(o_orderdate) AS m, count() "
     "AS n FROM orders GROUP BY y, m",
     "SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y, "
     "CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m, count(*) AS n "
     "FROM orders GROUP BY 1, 2"),
    ("extract_syntax",
     "SELECT EXTRACT(YEAR FROM o_orderdate) AS y, count() AS n "
     "FROM orders GROUP BY y",
     "SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y, count(*) "
     "AS n FROM orders GROUP BY 1"),
    ("cast_forms",
     "SELECT CAST(o_orderkey AS String) AS s, o_orderkey::Float64 AS f "
     "FROM orders WHERE o_orderkey < 10",
     "SELECT CAST(o_orderkey AS VARCHAR) AS s, "
     "CAST(o_orderkey AS DOUBLE) AS f FROM orders WHERE o_orderkey < 10"),
    ("json_fn",
     "SELECT JSONExtractInt(props, 'k') % 10 AS km, count() AS n "
     "FROM events GROUP BY km",
     "SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS km, "
     "count(*) AS n FROM events GROUP BY 1"),
    ("array_literal_hof",
     "SELECT arrayMap(x -> x * 2, [1, 2, 3]) AS doubled",
     "SELECT [2, 4, 6] AS doubled"),
    ("array_join_clause",
     "SELECT word, count() AS n FROM documents "
     "ARRAY JOIN splitByChar(' ', text) AS word "
     "GROUP BY word ORDER BY n DESC, word LIMIT 10",
     "SELECT word, count(*) AS n FROM (SELECT unnest(string_split(text, "
     "' ')) AS word FROM documents) GROUP BY word "
     "ORDER BY n DESC, word LIMIT 10"),
    ("prewhere",
     "SELECT count() AS n FROM lineitem PREWHERE l_quantity < 10 "
     "WHERE l_discount > 0.05",
     "SELECT count(*) AS n FROM lineitem "
     "WHERE l_quantity < 10 AND l_discount > 0.05"),
    ("scalar_subquery",
     "SELECT count() AS n FROM orders "
     "WHERE o_totalprice > (SELECT round(avg(o_totalprice), 6) FROM orders)",
     "SELECT count(*) AS n FROM orders "
     "WHERE o_totalprice > (SELECT round(avg(o_totalprice), 6) FROM orders)"),
    ("numbers_tf",
     "SELECT number, number * 2 AS d FROM numbers(10)",
     "SELECT CAST(range AS BIGINT) AS number, CAST(range * 2 AS BIGINT) "
     "AS d FROM range(10)"),
    ("intdiv_mod",
     "SELECT intDiv(o_orderkey, 7) AS d, o_orderkey % 7 AS m FROM orders "
     "WHERE o_orderkey < 50",
     "SELECT CAST(o_orderkey // 7 AS BIGINT) AS d, o_orderkey % 7 AS m "
     "FROM orders WHERE o_orderkey < 50"),
    ("is_null",
     "SELECT count() AS n FROM events WHERE props IS NOT NULL",
     "SELECT count(*) AS n FROM events WHERE props IS NOT NULL"),
    ("tuple_access",
     "SELECT (1, 'a').1 AS first",
     "SELECT 1 AS first"),
    ("array_index",
     "SELECT [10, 20, 30][2] AS second",
     "SELECT 20 AS second"),
    ("star_except",
     "SELECT * EXCEPT (r_regionkey) FROM region",
     "SELECT r_name FROM region"),
    ("star_except_regex",
     "SELECT * EXCEPT ('_name$') FROM region",
     "SELECT r_regionkey FROM region"),
    ("star_replace",
     "SELECT * REPLACE (upper(r_name) AS r_name) FROM region",
     "SELECT r_regionkey, upper(r_name) AS r_name FROM region"),
    ("columns_regex",
     "SELECT COLUMNS('^l_q') FROM lineitem",
     "SELECT l_quantity FROM lineitem"),
    ("columns_apply_agg",
     "SELECT round(COLUMNS('acctbal') APPLY (sum), 4) FROM customer"
     if False else
     "SELECT COLUMNS(c_acctbal) APPLY (max) FROM customer",
     'SELECT max(c_acctbal) AS "max(c_acctbal)" FROM customer'),
    ("cast_or_null",
     "SELECT toInt32OrNull('42') AS a, toInt32OrNull('xx') AS b, "
     "toInt64OrZero('nope') AS c",
     "SELECT 42 AS a, CAST(NULL AS INT) AS b, CAST(0 AS BIGINT) AS c"),
]


@pytest.mark.parametrize("name,ch_sql,duck_sql",
                         CASES, ids=[c[0] for c in CASES])
def test_sql_case(spark, tables, duck, name, ch_sql, duck_sql):
    got = execute_sql(spark, ch_sql, tables).toPandas()
    want = duck.execute(duck_sql or ch_sql).fetchdf()
    problems = compare(name, got, want)
    assert not problems, f"{name}: {problems}\nspark:\n{got.head()}\nduck:\n{want.head()}"


def test_join_strictness_sql(spark, tables, duck):
    semi = execute_sql(spark, "SELECT c_custkey FROM customer SEMI LEFT "
                       "JOIN orders ON c_custkey = o_custkey", tables)
    want = duck.execute("SELECT count(*) FROM customer WHERE c_custkey IN "
                        "(SELECT o_custkey FROM orders)").fetchone()[0]
    assert semi.count() == want
    anti = execute_sql(spark, "SELECT c_custkey FROM customer ANTI LEFT "
                       "JOIN orders ON c_custkey = o_custkey", tables)
    n_cust = tables["customer"].count()
    assert anti.count() == n_cust - want


def test_any_join_using_sql(spark, tables):
    li = tables["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey")
    t2 = dict(tables)
    t2["li2"] = li
    out = execute_sql(spark, "SELECT o_orderkey, l_linenumber FROM orders "
                      "ANY LEFT JOIN li2 USING (o_orderkey)", t2)
    # ANY strictness: left multiplicity preserved exactly
    assert out.count() == tables["orders"].count()


def test_in_subquery_expression_position(spark, tables, duck):
    # under OR — cannot become a semi join; marker-join lowering applies
    got = execute_sql(spark, "SELECT count() AS n FROM customer "
                      "WHERE c_custkey IN (SELECT o_custkey FROM orders "
                      "WHERE o_totalprice > 400000) OR c_acctbal > 9900",
                      tables).collect()[0].n
    want = duck.execute(
        "SELECT count(*) FROM customer WHERE c_custkey IN "
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 400000) "
        "OR c_acctbal > 9900").fetchone()[0]
    assert got == want


def test_in_subquery_select_list(spark, tables, duck):
    got = {(r.c_custkey, bool(r.has_order)) for r in execute_sql(
        spark, "SELECT c_custkey, c_custkey IN (SELECT o_custkey FROM "
        "orders) AS has_order FROM customer", tables).collect()}
    want = {(k, bool(v)) for k, v in duck.execute(
        "SELECT c_custkey, c_custkey IN (SELECT o_custkey FROM orders) "
        "FROM customer").fetchall()}
    assert got == want


def test_in_subquery_expression_no_driver_collect(spark, tables,
                                                  monkeypatch):
    # plan construction must not materialize the subquery on the driver
    from pyspark.sql import DataFrame as _DF

    def boom(self, *a, **k):
        raise AssertionError("driver-side collect during plan build")

    monkeypatch.setattr(_DF, "collect", boom)
    df = execute_sql(spark, "SELECT c_custkey FROM customer "
                     "WHERE c_custkey IN (SELECT o_custkey FROM orders) "
                     "OR c_acctbal > 9900", tables)
    assert df is not None


def test_any_join_on_sql(spark, tables):
    # CH accepts ANY LEFT JOIN ... ON a = b (differently-named keys);
    # keys are extracted from the ON conjunction and the right side deduped
    out = execute_sql(spark, "SELECT o_orderkey, l_linenumber FROM orders "
                      "ANY LEFT JOIN lineitem ON o_orderkey = l_orderkey",
                      tables)
    assert out.count() == tables["orders"].count()


def test_sql_outer_join_default_fill_matrix(spark):
    from clickhouse_from_scratch_spark.plans import execute_sql as run
    left = spark.createDataFrame([(1, "a"), (2, "b")], "lk int, lv string")
    right = spark.createDataFrame([(2, 20.0), (3, 30.0)], "rk int, rv double")
    t = {"l": left, "r": right}
    # default join_use_nulls=0: defaults
    got = sorted(tuple(r) for r in run(
        spark, "SELECT lk, lv, rk, rv FROM l LEFT JOIN r ON lk = rk",
        t).collect())
    assert got == [(1, "a", 0, 0.0), (2, "b", 2, 20.0)]
    got = sorted(tuple(r) for r in run(
        spark, "SELECT lk, lv, rk, rv FROM l FULL JOIN r ON lk = rk",
        t).collect())
    assert got == [(0, "", 3, 30.0), (1, "a", 0, 0.0), (2, "b", 2, 20.0)]
    # SETTINGS join_use_nulls=1: Spark/SQL-standard NULLs
    got = sorted(tuple(r) for r in run(
        spark, "SELECT lk, lv, rk, rv FROM l LEFT JOIN r ON lk = rk "
        "SETTINGS join_use_nulls = 1", t).collect())
    assert got == [(1, "a", None, None), (2, "b", 2, 20.0)]


def test_group_by_all(spark, tables, duck):
    sql = ("SELECT o_orderpriority AS p, o_orderstatus AS s, "
           "count() AS n FROM orders GROUP BY ALL")
    got = sorted(tuple(r) for r in execute_sql(spark, sql, tables).collect())
    want = sorted(tuple(r) for r in duck.execute(
        "SELECT o_orderpriority, o_orderstatus, count(*) FROM orders "
        "GROUP BY ALL").fetchall())
    assert got == want


def test_in_table_membership(spark, tables, duck):
    t2 = dict(tables)
    t2["big_cust"] = execute_sql(
        spark, "SELECT c_custkey FROM customer WHERE c_acctbal > 9000",
        tables)
    got = execute_sql(
        spark, "SELECT count() AS n FROM orders WHERE o_custkey IN big_cust",
        t2).collect()[0].n
    want = duck.execute(
        "SELECT count(*) FROM orders WHERE o_custkey IN "
        "(SELECT c_custkey FROM customer WHERE c_acctbal > 9000)"
    ).fetchone()[0]
    assert got == want > 0
    got_not = execute_sql(
        spark,
        "SELECT count() AS n FROM orders WHERE o_custkey NOT IN big_cust",
        t2).collect()[0].n
    assert got + got_not == tables["orders"].count()


def test_system_table_functions(spark):
    assert execute_sql(spark, "SELECT dummy FROM one()", {}).collect()[0] \
        .dummy == 0
    assert execute_sql(spark, "SELECT count() AS n FROM zeros(7)",
                       {}).collect()[0].n == 7


def test_union_is_positional(spark, tables, duck):
    # CH set ops are positional; names come from the first SELECT
    out = execute_sql(spark, "SELECT 1 AS a UNION ALL SELECT 2 AS b", {})
    assert out.columns == ["a"]
    assert sorted(r.a for r in out.collect()) == [1, 2]
    sql = ("SELECT c_custkey AS k FROM customer UNION DISTINCT "
           "SELECT o_custkey FROM orders")
    got = execute_sql(spark, sql, tables).count()
    want = duck.execute("SELECT count(*) FROM (SELECT c_custkey FROM customer"
                        " UNION SELECT o_custkey FROM orders)").fetchone()[0]
    assert got == want


def test_text_pipeline_scalar_functions_sql(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog in the yard"),
         (2, "der hund und die katze und der vogel nicht da")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in execute_sql(spark, """
        SELECT doc_id, languageId(text) AS lang, tokenCount(text) AS n,
               qualityScore(text) AS q, docFingerprint(text) AS fp
        FROM t""", {"t": df}).collect()}
    assert out[1].lang == "en" and out[2].lang == "de"
    assert out[1].n == 11 and len(out[1].fp) == 32
    assert 0.0 <= out[1].q <= 1.0


def test_pipeline_table_functions_sql(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "alpha beta gamma delta"),
         (2, "totally different words here")],
        "doc_id long, text string")
    n = execute_sql(spark, "SELECT count() AS n FROM dedupExact(t)",
                    {"t": docs}).collect()[0].n
    assert n == 2                        # docs 0,1 collapse
    pairs = execute_sql(
        spark, "SELECT id_a, id_b FROM dedupSimHash(t, 3)",
        {"t": docs}).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 1)}


def test_ann_table_function_sql(spark):
    import numpy as np
    rng = np.random.RandomState(3)
    vecs = rng.randn(10, 8).astype("float64")
    vecs[1] = vecs[0] * 3.0
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(10)],
        "vec_id long, embedding array<float>")
    out = execute_sql(spark, """
        SELECT query_id, vec_id, cos_sim
        FROM annCosineTopK(t, view(
            SELECT vec_id AS query_id, embedding FROM t WHERE vec_id = 0), 3)
    """, {"t": emb}).collect()
    assert len(out) == 3 and out[0].vec_id == 1


def test_embedding_near_dup_table_functions_sql(spark):
    import numpy as np
    rng = np.random.RandomState(3)
    vecs = rng.randn(10, 8).astype("float64")
    vecs[1] = vecs[0] * 3.0
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(10)],
        "vec_id long, embedding array<float>")
    exact = execute_sql(
        spark, "SELECT id_a, id_b FROM dedupEmbeddingCosine(t, 0.99)",
        {"t": emb}).collect()
    assert {(r.id_a, r.id_b) for r in exact} == {(0, 1)}
    approx = execute_sql(
        spark, "SELECT id_a, id_b FROM dedupEmbeddingLSH(t, 0.99, 8)",
        {"t": emb}).collect()
    assert (0, 1) in {(r.id_a, r.id_b) for r in approx}


def test_query_parameters(spark, tables):
    out = execute_sql(
        spark,
        "SELECT count() AS n FROM orders "
        "WHERE o_orderpriority = {prio:String} "
        "AND o_totalprice > {minp:Float64}",
        tables, params={"prio": "1-URGENT", "minp": 100000.0})
    manual = execute_sql(
        spark,
        "SELECT count() AS n FROM orders "
        "WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 100000.0",
        tables)
    assert out.collect()[0].n == manual.collect()[0].n > 0
    import pytest as _pytest
    with _pytest.raises(Exception, match="unbound query parameter"):
        execute_sql(spark, "SELECT {x:UInt32} AS v", tables).collect()


def test_order_by_collate(spark, tables):
    df = spark.createDataFrame(
        [("banana",), ("Apple",), ("apple",), ("cherry",)], "w string")
    out = [r.w for r in execute_sql(
        spark, "SELECT w FROM t ORDER BY w COLLATE 'en'", {"t": df}).collect()]
    # ICU 'en': case-insensitive primary strength groups apple/Apple together
    assert out[0].lower() == "apple" and out[1].lower() == "apple"
    assert out[2:] == ["banana", "cherry"]


def test_with_fill_infers_bounds(spark, tables):
    df = spark.createDataFrame([(1, 10), (4, 40), (6, 60)], "x int, v int")
    out = execute_sql(spark, "SELECT x, v FROM t ORDER BY x WITH FILL",
                      {"t": df}).collect()
    assert [r.x for r in out] == [1, 2, 3, 4, 5, 6]   # min..max step 1
    assert [r.v for r in out if r.x == 4] == [40]


def test_correlated_exists(spark, tables, duck):
    sql = ("SELECT c_custkey FROM customer WHERE EXISTS "
           "(SELECT 1 FROM orders WHERE o_custkey = c_custkey "
           "AND o_totalprice > 300000)")
    got = sorted(r[0] for r in execute_sql(spark, sql, tables).collect())
    want = sorted(r[0] for r in duck.execute(sql).fetchall())
    assert got == want and len(got) > 0


def test_correlated_not_exists(spark, tables, duck):
    sql = ("SELECT c_custkey FROM customer WHERE NOT EXISTS "
           "(SELECT 1 FROM orders WHERE o_custkey = c_custkey "
           "AND o_totalprice > 300000)")
    got = sorted(r[0] for r in execute_sql(spark, sql, tables).collect())
    want = sorted(r[0] for r in duck.execute(sql).fetchall())
    assert got == want and len(got) > 0


def test_correlated_in(spark, tables, duck):
    sql = ("SELECT o_orderkey FROM orders WHERE o_orderkey IN "
           "(SELECT l_orderkey FROM lineitem WHERE l_shipdate > o_orderdate)")
    got = sorted(r[0] for r in execute_sql(spark, sql, tables).collect())
    want = sorted(r[0] for r in duck.execute(sql).fetchall())
    assert got == want and len(got) > 0


def test_heredoc_literal(spark):
    """$tag$…$tag$ heredoc strings (reference Lexer.cpp:359-379): raw
    body — embedded quotes, backslashes, newlines, even other $-tags —
    no escape processing."""
    from clickhouse_from_scratch_spark.plans.lexer import tokenize, T
    toks = tokenize("SELECT $doc$it's \\n \"raw\"\nline2$doc$")
    assert toks[1].kind == T.STRING
    assert toks[1].text == "it's \\n \"raw\"\nline2"
    # empty tag form $$…$$
    toks = tokenize("SELECT $$a'b$c$$")
    assert toks[1].text == "a'b$c"

    out = execute_sql(
        spark, "SELECT $tag$O'Reilly\n\\t$tag$ AS s, length($$x$$) AS n",
        {}).collect()
    assert out[0].s == "O'Reilly\n\\t" and out[0].n == 1


def test_heredoc_unterminated(spark):
    from clickhouse_from_scratch_spark.plans.lexer import tokenize, LexError
    import pytest as _pt
    with _pt.raises(LexError):
        tokenize("SELECT $doc$never closed")


def test_in_subquery_in_having(spark, tables, duck):
    """HAVING-position IN lowers to a marker join on the aggregated
    frame (builder._slotify), not a driver collect."""
    ch = ("SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem "
          "GROUP BY l_orderkey HAVING l_orderkey IN "
          "(SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')"
          " AND sum(l_quantity) > 50")
    ansi = ch.replace("sum(l_quantity) >", "sum(l_quantity) >")
    df = execute_sql(spark, ch, tables)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan            # marker join, not isin-literal filter
    got = sorted((r[0], float(r[1])) for r in df.collect())
    want = sorted((r[0], float(r[1])) for r in duck.execute(ansi).fetchall())
    assert got == want and len(got) > 0


def test_not_in_subquery_in_having(spark, tables, duck):
    sql = ("SELECT o_custkey, count(*) AS cnt FROM orders "
           "GROUP BY o_custkey HAVING o_custkey NOT IN "
           "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')")
    ch = sql.replace("count(*)", "count()")
    got = sorted((r[0], r[1])
                 for r in execute_sql(spark, ch, tables).collect())
    want = sorted((r[0], r[1]) for r in duck.execute(sql).fetchall())
    assert got == want and len(got) > 0


def test_agg_keyed_in_having(spark, tables, duck):
    """The IN key itself is an aggregate (sum(...) IN (SELECT ...)):
    exercises the __agg* slot substitution path."""
    sql = ("SELECT l_orderkey, count(*) AS cnt FROM lineitem "
           "GROUP BY l_orderkey HAVING count(*) IN "
           "(SELECT count(*) FROM region)")
    ch = sql.replace("count(*)", "count()")
    got = sorted((r[0], r[1])
                 for r in execute_sql(spark, ch, tables).collect())
    want = sorted((r[0], r[1]) for r in duck.execute(sql).fetchall())
    assert got == want and len(got) > 0


def test_named_window_clause(spark, tables, duck):
    got = execute_sql(spark, """
        SELECT o_orderkey, rank() OVER w AS rnk,
               count() OVER w AS cnt
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_orderkey
    """, tables).toPandas()
    want = duck.execute("""
        SELECT o_orderkey, RANK() OVER w AS rnk, COUNT(*) OVER w AS cnt
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_orderkey
    """).df()
    assert got["rnk"].tolist() == want["rnk"].tolist()
    assert got["cnt"].tolist() == want["cnt"].tolist()


def test_final_with_engine_metadata(spark, tables, duck):
    got = execute_sql(
        spark,
        "SELECT user_id, event_id FROM events FINAL",
        tables,
        engines={"events": {"order_by": ["user_id"], "version": "ts"}},
    ).toPandas()
    want = duck.execute(
        "SELECT user_id, event_id FROM (SELECT *, row_number() OVER "
        "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
        "FROM events) WHERE rn = 1").fetchdf()
    assert not compare("final", got, want)


def test_sample_deterministic(spark, tables):
    sql = "SELECT count() AS n FROM lineitem SAMPLE 0.1"
    a = execute_sql(spark, sql, tables,
                    engines={"lineitem": {"sample_by": "l_orderkey"}}).collect()
    b = execute_sql(spark, sql, tables,
                    engines={"lineitem": {"sample_by": "l_orderkey"}}).collect()
    assert a == b and 0 < a[0].n


def test_parse_errors():
    with pytest.raises(ParseError):
        parse("SELECT FROM WHERE")
    with pytest.raises(ParseError):
        parse("SELECT 1 FROM t JOIN u")     # JOIN without ON/USING
    with pytest.raises(ParseError):
        parse("SELECT 1 extra_garbage ,")


def test_parse_shapes():
    q = parse("SELECT a FROM t FINAL SAMPLE 0.1 WHERE b > 1 "
              "GROUP BY a WITH TOTALS ORDER BY a DESC NULLS FIRST "
              "LIMIT 5 SETTINGS max_threads = 4")
    assert q.settings == {"max_threads": 4}
    assert q.group_by.with_totals
    assert q.order_by[0].desc and q.order_by[0].nulls_first
    assert q.from_.final and q.from_.sample == (0.1, 0.0)
    q2 = parse("SELECT f(1)(x) OVER (PARTITION BY a ORDER BY b "
               "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t")
    fc = q2.select[0]
    assert fc.params and fc.window.frame == ("ROWS", "1 PRECEDING",
                                             "CURRENT ROW")


def test_groups_window_frame(spark):
    """GROUPS frame via the dense_rank RANGE rewrite — hand-computed
    golden (Spark has no GROUPS mode; no DuckDB oracle needed)."""
    df = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30), (3, 40), (3, 50), (3, 60), (5, 70)],
        "v int, x int")
    out = execute_sql(spark, """
        SELECT v, x,
               sum(x) OVER (ORDER BY v
                            GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s,
               sum(x) OVER (ORDER BY v GROUPS CURRENT ROW) AS cur
        FROM t ORDER BY v, x
    """, {"t": df})
    rows = [(r.v, r.x, r.s, r.cur) for r in out.collect()]
    assert rows == [
        (1, 10, 30, 30), (1, 20, 30, 30),          # own group only
        (2, 30, 60, 30),                            # groups {1},{2}
        (3, 40, 180, 150), (3, 50, 180, 150), (3, 60, 180, 150),
        (5, 70, 220, 70),                           # groups {3},{5}
    ]
    # helper rank column must not leak into the output
    assert out.columns == ["v", "x", "s", "cur"]


def test_groups_frame_partitioned(spark):
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 1, 2), ("a", 2, 4), ("b", 1, 8), ("b", 3, 16)],
        "k string, v int, x int")
    out = execute_sql(spark, """
        SELECT k, v, x,
               sum(x) OVER (PARTITION BY k ORDER BY v
                            GROUPS BETWEEN UNBOUNDED PRECEDING
                            AND 0 FOLLOWING) AS s
        FROM t ORDER BY k, v, x
    """, {"t": df})
    rows = [(r.k, r.v, r.x, r.s) for r in out.collect()]
    assert rows == [("a", 1, 1, 3), ("a", 1, 2, 3), ("a", 2, 4, 7),
                    ("b", 1, 8, 8), ("b", 3, 16, 24)]


# --- correlated subqueries in expression position ---------------------------

def _corr_fixture(spark):
    cust = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", -5.0), (3, "c", 0.0)],
        "ck int, name string, bal double")
    orders = spark.createDataFrame(
        [(1, 100.0), (1, 200.0), (3, 50.0)], "ock int, price double")
    return {"customer": cust, "orders": orders}


def test_correlated_scalar_in_select(spark):
    out = execute_sql(spark, """
        SELECT ck,
               (SELECT count() FROM orders WHERE ock = ck) AS n,
               (SELECT sum(price) FROM orders WHERE ock = ck) AS total
        FROM customer ORDER BY ck
    """, _corr_fixture(spark))
    rows = [(r.ck, r.n, r.total) for r in out.collect()]
    # count over empty group is 0 (CH/SQL), sum stays NULL
    assert rows == [(1, 2, 300.0), (2, 0, None), (3, 1, 50.0)]
    assert out.columns == ["ck", "n", "total"]


def test_correlated_scalar_in_where(spark):
    out = execute_sql(spark, """
        SELECT ck FROM customer
        WHERE bal < (SELECT sum(price) FROM orders WHERE ock = ck)
        ORDER BY ck
    """, _corr_fixture(spark))
    assert [r.ck for r in out.collect()] == [1, 3]


def test_correlated_exists_under_or(spark):
    out = execute_sql(spark, """
        SELECT ck FROM customer
        WHERE bal < 0 OR EXISTS(
          SELECT 1 FROM orders WHERE ock = ck AND price > 150)
        ORDER BY ck
    """, _corr_fixture(spark))
    assert [r.ck for r in out.collect()] == [1, 2]


def test_correlated_not_exists_under_or(spark):
    out = execute_sql(spark, """
        SELECT ck FROM customer
        WHERE bal > 5 OR NOT EXISTS(
          SELECT 1 FROM orders WHERE ock = ck)
        ORDER BY ck
    """, _corr_fixture(spark))
    assert [r.ck for r in out.collect()] == [1, 2]


def test_correlated_in_under_or(spark):
    out = execute_sql(spark, """
        SELECT ck FROM customer
        WHERE ck IN (SELECT ock FROM orders
                     WHERE ock = ck AND price > 150)
           OR bal < 0
        ORDER BY ck
    """, _corr_fixture(spark))
    assert [r.ck for r in out.collect()] == [1, 2]


def test_generate_random_table_function(spark):
    """generateRandom('schema', seed, ...): deterministic, schema-typed,
    LIMIT-bounded like system.numbers; unsigned domains respected."""
    sql = ("SELECT * FROM generateRandom("
           "'a Int64, b String, c Array(UInt8), d Nullable(Int32)', 7, 8, 5) "
           "LIMIT 20")
    df = execute_sql(spark, sql, {})
    rows = df.collect()
    assert len(rows) == 20
    assert df.schema.simpleString() == (
        "struct<a:bigint,b:string,c:array<smallint>,d:int>")
    assert rows == execute_sql(spark, sql, {}).collect()   # same seed
    other = execute_sql(spark, sql.replace(", 7,", ", 8,"), {}).collect()
    assert rows != other                                   # seed matters
    for r in rows:
        assert all(0 <= e <= 255 for e in r.c)             # UInt8 domain
        assert 1 <= len(r.b) <= 8
    from clickhouse_from_scratch_spark.plans import ParseError
    from clickhouse_from_scratch_spark.plans.builder import BuildError
    with pytest.raises(BuildError, match="LIMIT"):
        execute_sql(spark, "SELECT * FROM generateRandom('a Int8')", {})


def test_sql_standard_aliases_and_unit_keywords(spark):
    """Case-insensitive SQL-standard aliases (LTRIM/DATEDIFF/SUBSTR/…)
    and bare interval-unit keywords in date arithmetic
    (ExpressionListParsers.cpp:566-651)."""
    r = execute_sql(spark, """
        SELECT LTRIM('  hi') AS a, RTRIM('hi  ') AS b,
               POSITION('c' IN 'abcdef') AS p,
               DATEDIFF(day, toDate('2024-01-01'), toDate('2024-02-01')) AS d1,
               dateAdd(DAY, 5, toDate('2024-01-01')) AS d2,
               DATESUB(MONTH, 1, toDate('2024-03-15')) AS d3,
               SUBSTR('hello', 2, 3) AS s, LCASE('ABC') AS lc,
               REPLACE('aXbXc', 'X', '-') AS rp
    """, {}).collect()[0]
    assert (r.a, r.b, r.p) == ("hi", "hi", 3)
    assert r.d1 == 31
    assert str(r.d2) == "2024-01-06" and str(r.d3) == "2024-02-15"
    assert (r.s, r.lc, r.rp) == ("ell", "abc", "a-b-c")


def test_untuple_and_hof_over_aggregate(spark):
    out = execute_sql(spark, "SELECT untuple((10, 'z')) AS u, 5 AS k", {})
    assert out.columns == ["u__1", "u__2", "k"]
    assert tuple(out.collect()[0]) == (10, "z", 5)
    out = execute_sql(spark, "SELECT untuple((1, 'a'))", {})
    # CH spells unaliased positional outputs tupleElement(<arg>, n)
    assert out.columns == ["tupleElement((1, 'a'), 1)",
                           "tupleElement((1, 'a'), 2)"]
    # HOF whose array argument is an aggregate result
    r = execute_sql(spark, """
        SELECT arraySort(x -> x, groupUniqArray(v)) AS a
        FROM (SELECT arrayJoin([3, 1, 3, 2]) AS v)
    """, {}).collect()[0]
    assert r.a == [1, 2, 3]
    r = execute_sql(spark, "SELECT arrayReduce('sum', [1,2,3]) AS s",
                    {}).collect()[0]
    assert r.s == 6


def test_summap_minmap_maxmap(spark):
    """sumMap/minMap/maxMap: per-key reduction across the group,
    returned as tuple(sorted keys, values) like CH."""
    df = spark.createDataFrame(
        [("a", [1, 2], [10.0, 20.0]), ("a", [2, 3], [5.0, 7.0]),
         ("b", [1], [1.0])],
        "g string, k array<int>, v array<double>")
    out = {r.g: r for r in execute_sql(spark, """
        SELECT g, sumMap(k, v) AS sm, minMap(k, v) AS nm,
               maxMap(k, v) AS xm
        FROM t GROUP BY g
    """, {"t": df}).collect()}
    assert out["a"].sm == ([1, 2, 3], [10.0, 25.0, 7.0])
    assert out["a"].nm == ([1, 2, 3], [10.0, 5.0, 7.0])
    assert out["a"].xm == ([1, 2, 3], [10.0, 20.0, 7.0])
    assert out["b"].sm == ([1], [1.0])


def test_transform_array_hofs_json_extract(spark):
    r = execute_sql(spark, """
        SELECT arrayFirst(x -> x > 1, [1,2,3]) AS af,
               arrayFirstIndex(x -> x > 1, [1,2,3]) AS ai,
               arrayLast(x -> x < 3, [1,2,3]) AS al,
               transform(2, [1,2,3], ['a','b','c'], '?') AS tr,
               transform(9, [1], ['x'], '?') AS trmiss,
               transform(7, [1], [100]) AS trkeep,
               JSONExtract('{"a": 7}', 'a', 'Int64') AS je,
               length(toFixedString('ab', 4)) AS fx,
               parseDateTimeBestEffort('15/01/2024') AS pd
    """, {}).collect()[0]
    assert (r.af, r.ai, r.al) == (2, 2, 2)
    assert (r.tr, r.trmiss, r.trkeep) == ("b", "?", 7)
    assert r.je == 7 and r.fx == 4
    assert str(r.pd).startswith("2024-01-15")


def test_statistical_aggregates_and_nth_value(spark):
    r = execute_sql(spark, """
        SELECT round(entropy(a), 4) AS e_uni,
               round(entropy(b), 4) AS e_skew,
               avgWeighted(x, w) AS aw,
               anyHeavy(a) AS ah,
               round(kurtPop(x), 2) AS kp
        FROM (SELECT arrayJoin([1, 1, 2, 2]) AS a,
                     arrayJoin([1, 1, 1, 2]) AS b,
                     arrayJoin([1.0, 2.0, 3.0, 4.0]) AS x, 1.0 AS w)
    """, {}).collect()[0]
    assert r.e_uni == 1.0            # two equally likely values -> 1 bit
    assert r.e_skew == 0.8113        # -(.75 log2 .75 + .25 log2 .25)
    assert r.aw == 2.5
    assert r.kp > 0                  # CH kurtPop = m4/m2^2 (not excess)
    out = execute_sql(spark, """
        SELECT x, nth_value(x, 2) OVER w AS n2
        FROM (SELECT arrayJoin([10, 20, 30]) AS x) WINDOW w AS (ORDER BY x)
    """, {}).collect()
    assert [r.n2 for r in out] == [None, 20, 20]


def test_totypename_and_accurate_cast(spark, tables):
    r = execute_sql(spark, """
        SELECT toTypeName(1) AS a, toTypeName(-5) AS b,
               toTypeName(1.5) AS c, toTypeName('x') AS d,
               toTypeName([1,2]) AS e,
               accurateCast(1, 'Int64') AS f,
               accurateCastOrNull('zz', 'Int64') AS g,
               accurateCastOrNull('7', 'Int64') AS h
    """, {}).collect()[0]
    assert (r.a, r.b, r.c, r.d) == ("UInt8", "Int8", "Float64", "String")
    assert r.e == "Array(UInt8)"   # element literal typing (r7 fidelity)
    assert (r.f, r.g, r.h) == (1, None, 7)
    col = execute_sql(spark, "SELECT toTypeName(o_orderkey) AS t "
                             "FROM orders LIMIT 1", tables).collect()[0]
    assert col.t == "Int64"


def test_asof_join_using_and_inner_kind(spark, duck):
    """ASOF USING (k.., t): last column is the inequality key; bare
    ASOF JOIN is inner (unmatched left rows dropped), ASOF LEFT keeps
    them (public CH semantics; strictness token
    ASTTablesInSelectQuery.h:82)."""
    left = spark.createDataFrame([(1, 10), (1, 25), (2, 10)],
                                 "k int, t int")
    right = spark.createDataFrame(
        [(1, 5, "a"), (1, 20, "b"), (2, 50, "c")], "k int, t int, v string")
    tabs = {"l": left, "r": right}
    inner = execute_sql(spark, "SELECT k, t, v FROM l ASOF JOIN r "
                               "USING (k, t) ORDER BY k, t", tabs).collect()
    assert [tuple(r) for r in inner] == [(1, 10, "a"), (1, 25, "b")]
    lft = execute_sql(spark, "SELECT k, t, v FROM l ASOF LEFT JOIN r "
                             "USING (k, t) ORDER BY k, t", tabs).collect()
    assert [tuple(r) for r in lft] == [(1, 10, "a"), (1, 25, "b"),
                                       (2, 10, None)]
    on_inner = execute_sql(spark, "SELECT k, t, v FROM l ASOF JOIN r "
                                  "ON l.k = r.k AND l.t >= r.t "
                                  "ORDER BY k, t", tabs).collect()
    assert [tuple(r) for r in on_inner] == [(1, 10, "a"), (1, 25, "b")]


def test_system_numbers_where_bound(spark):
    """WHERE number < N proves a finite scan: exact results without a
    LIMIT; unbounded predicates still refuse."""
    got = execute_sql(spark, "SELECT count() AS n FROM system.numbers "
                             "WHERE number < 100", {}).collect()[0]
    assert got.n == 100
    got = execute_sql(spark, "SELECT count() AS n FROM system.numbers "
                             "WHERE number <= 100 AND number % 2 = 0",
                      {}).collect()[0]
    assert got.n == 51
    got = execute_sql(spark, "SELECT sum(number) AS s FROM system.numbers "
                             "WHERE 10 > number", {}).collect()[0]
    assert got.s == 45
    from clickhouse_from_scratch_spark.plans.builder import BuildError
    with pytest.raises(BuildError, match="unbounded"):
        execute_sql(spark, "SELECT count() FROM system.numbers "
                           "WHERE number > 5", {})


def test_merge_table_function(spark):
    a = spark.createDataFrame([(1,)], "x int")
    b = spark.createDataFrame([(2,)], "x int")
    tabs = {"log_2023": a, "log_2024": b,
            "other": spark.createDataFrame([(9,)], "y int")}
    r = execute_sql(spark, "SELECT sum(x) AS s, count() AS n "
                           "FROM merge('log_.*')", tabs).collect()[0]
    assert (r.s, r.n) == (3, 2)
    from clickhouse_from_scratch_spark.plans.builder import BuildError
    with pytest.raises(BuildError, match="no tables match"):
        execute_sql(spark, "SELECT * FROM merge('nope.*')", tabs)


def test_values_and_format_table_functions(spark):
    rows = execute_sql(
        spark,
        "SELECT * FROM values('a Int32, b String', (1,'x'), (2,'y')) "
        "ORDER BY a", {}).collect()
    assert [(r.a, r.b) for r in rows] == [(1, "x"), (2, "y")]
    rows = execute_sql(
        spark,
        "SELECT a + 1 AS n FROM format(JSONEachRow, "
        "'{\"a\": 1}\n{\"a\": 2}') ORDER BY n", {}).collect()
    assert [r.n for r in rows] == [2, 3]


def test_set_op_all_modifiers(spark):
    # CH EXCEPT (ALL) is a hash-set filter: EVERY copy of a matched row
    # is dropped, so {1, 1} EXCEPT {1} = {} (not the multiset-minus one)
    out = execute_sql(
        spark, "SELECT 1 AS x UNION ALL SELECT 1 EXCEPT ALL SELECT 1",
        {}).collect()
    assert [r.x for r in out] == []
    out = execute_sql(
        spark, "SELECT 2 AS x INTERSECT ALL SELECT 2 AS x", {}).collect()
    assert [r.x for r in out] == [2]
    # and INTERSECT preserves full left multiplicity (not multiset-min)
    out = execute_sql(
        spark, "SELECT x FROM (SELECT 0 AS x UNION ALL SELECT 0 "
        "INTERSECT SELECT 0 AS x)", {}).collect()
    assert [r.x for r in out] == [0, 0]


def test_array_fold_hof(spark):
    r = execute_sql(
        spark,
        "SELECT arrayFold((acc, x) -> acc + x, [1,2,3], toInt64(10)) AS r",
        {}).collect()[0].r
    assert r == 16


def test_tuple_in_literal_list(spark):
    t = {"t": spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double")}
    assert execute_sql(
        spark, "SELECT count() AS n FROM t "
        "WHERE (k, v) IN ((1, 10.0), (3, 30.0))", t).collect()[0].n == 2
    assert execute_sql(
        spark, "SELECT count() AS n FROM t "
        "WHERE (k, v) NOT IN ((1, 10.0))", t).collect()[0].n == 2
    assert execute_sql(
        spark, "SELECT count() AS n FROM t "
        "WHERE (k, v) IN ((1, 99.0))", t).collect()[0].n == 0


def test_parametric_if_combo(spark):
    t = {"t": spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (5, 50.0)], "k long, v double")}
    assert list(execute_sql(
        spark, "SELECT topKIf(2)(k, v > 10) AS r FROM t",
        t).collect()[0].r) == [2, 3]
    assert execute_sql(
        spark, "SELECT quantileIf(0.5)(v, k > 1) AS r FROM t",
        t).collect()[0].r == 30.0


def test_self_join_theta_condition(spark):
    t = {"t": spark.createDataFrame([(1, 1), (1, 2), (2, 1)],
                                    "k long, seq long")}
    r = execute_sql(
        spark, "SELECT t1.k AS k, t1.seq AS s1, t2.seq AS s2 "
        "FROM t AS t1 JOIN t AS t2 "
        "ON t1.k = t2.k AND t1.seq < t2.seq", t).collect()
    assert sorted((x.k, x.s1, x.s2) for x in r) == [(1, 1, 2)]


def test_with_fill_interpolate(spark):
    t = {"t": spark.createDataFrame([(1, 10.0), (4, 40.0)],
                                    "seq long, v double")}
    carry = execute_sql(
        spark, "SELECT seq, v FROM t ORDER BY seq "
        "WITH FILL FROM 1 TO 5 INTERPOLATE (v)", t).collect()
    assert sorted((r.seq, r.v) for r in carry) == \
        [(1, 10.0), (2, 10.0), (3, 10.0), (4, 40.0)]
    linear = execute_sql(
        spark, "SELECT seq, v FROM t ORDER BY seq "
        "WITH FILL FROM 1 TO 5 INTERPOLATE (v AS v + 1)", t).collect()
    # compounds per filled step from the previous real value
    assert sorted((r.seq, r.v) for r in linear) == \
        [(1, 10.0), (2, 11.0), (3, 12.0), (4, 40.0)]


def test_group_by_empty_tuple(spark):
    t = {"t": spark.createDataFrame([(1,), (2,)], "k long")}
    r = execute_sql(spark, "SELECT count() AS n, sum(k) AS s FROM t "
                    "GROUP BY ()", t).collect()
    assert [(x.n, x.s) for x in r] == [(2, 3)]


def test_with_fill_descending_exclusive_to(spark):
    """Descending fill (negative STEP): the exclusive TO bound must drop
    values <= TO, and inferred bounds must run max → min."""
    t = {"t": spark.createDataFrame([(5, "a"), (2, "b")], "n long, s string")}
    r = execute_sql(
        spark, "SELECT n, s FROM t ORDER BY n DESC "
        "WITH FILL FROM 5 TO 1 STEP -1", t).collect()
    # fill rows carry the String type default '' (CH FillingTransform)
    assert [(x.n, x.s) for x in r] == \
        [(5, "a"), (4, ""), (3, ""), (2, "b")]
    r2 = execute_sql(
        spark, "SELECT n FROM t ORDER BY n DESC WITH FILL STEP -1",
        t).collect()
    assert [x.n for x in r2] == [5, 4, 3, 2]


def test_format_table_function_no_temp_leak(spark):
    """format() inline data materializes eagerly and removes its temp
    file at once (no per-query leak, no stale lazy re-read)."""
    import glob
    import tempfile
    before = set(glob.glob(os.path.join(tempfile.gettempdir(), "*.data")))
    r = execute_sql(
        spark,
        'SELECT a + 1 AS n FROM format(JSONEachRow, \'{"a": 1}\n{"a": 4}\') '
        "ORDER BY n", {}).collect()
    assert [x.n for x in r] == [2, 5]
    after = set(glob.glob(os.path.join(tempfile.gettempdir(), "*.data")))
    assert after <= before


def test_ignore_respect_nulls_window(spark):
    t = {"t": spark.createDataFrame(
        [(10, None), (20, 5), (30, None)], "o int, v int")}

    def run(expr):
        return [r.x for r in execute_sql(
            spark, f"SELECT o, {expr} OVER (ORDER BY o) AS x FROM t "
            "ORDER BY o", t).collect()]
    assert run("last_value(v) IGNORE NULLS") == [None, 5, 5]
    assert run("last_value(v) RESPECT NULLS") == [None, 5, None]
    assert run("first_value(v) IGNORE NULLS") == [None, 5, 5]
    # any as a window aggregate: default skips NULLs, RESPECT keeps them
    assert run("any(v) RESPECT NULLS") == [None, None, None]
    assert run("any(v)") == [None, 5, 5]


@pytest.mark.parametrize("sql", [
    # a dialect modifier the engine can't honor must raise, never be
    # silently dropped (the r3 -Distinct bug class)
    "SELECT corr(DISTINCT o, v) AS x FROM t",
    "SELECT topK(2)(DISTINCT v) AS x FROM t",
    "SELECT sum(v) RESPECT NULLS AS x FROM t",
    "SELECT lag(v, 1) IGNORE NULLS OVER (ORDER BY o) AS x FROM t",
    "SELECT quantileTDigest(DISTINCT v) AS x FROM t",
])
def test_no_silent_modifier_drop(spark, sql):
    t = {"t": spark.createDataFrame([(10, 1), (20, 2)], "o int, v int")}
    with pytest.raises(Exception) as ei:
        execute_sql(spark, sql, t).collect()
    assert ei.type.__name__ in ("BuildError", "ParseError", "KeyError")


def test_totals_mode_having(spark):
    """totals_mode: default after_having_exclusive recomputes totals over
    rows of the groups that PASSED HAVING; before_having keeps the
    all-rows totals; the totals row itself is never HAVING-filtered."""
    t = {"t": spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 10), ("c", 100)],
        "k string, v int")}
    q = ("SELECT k, count() AS n, sum(v) AS s FROM t GROUP BY k "
         "WITH TOTALS HAVING count() > 1")
    after = sorted([(r.k, r.n, r.s) for r in
                    execute_sql(spark, q, t).collect()], key=str)
    assert after == [("", 3, 6), ("a", 3, 6)]   # totals key = type default
    before = sorted([(r.k, r.n, r.s) for r in
                     execute_sql(spark, q, t,
                                 settings={"totals_mode": "before_having"})
                     .collect()], key=str)
    assert before == [("", 5, 116), ("a", 3, 6)]


def test_new_pipeline_table_functions_sql(spark):
    docs = spark.createDataFrame(
        [(0, "the alpha beta email x@y.io end of it all right"),
         (1, "the alpha beta and some other words to keep here"),
         (2, "the gamma delta and more unique words in this doc")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in execute_sql(
        spark, "SELECT doc_id, kept_text, n_removed "
               "FROM passageDedup(t, 3, 1) ORDER BY doc_id",
        {"t": docs}).collect()}
    assert len(out) == 3
    scr = execute_sql(
        spark, "SELECT doc_id, n_emails FROM piiScrub(t) WHERE n_emails > 0",
        {"t": docs}).collect()
    assert [(r.doc_id, r.n_emails) for r in scr] == [(0, 1)]
    rec = execute_sql(
        spark, "SELECT doc_id, n_tokens FROM trainingRecipe(t, 0.0)",
        {"t": docs}).collect()
    assert all(r.n_tokens > 0 for r in rec)
