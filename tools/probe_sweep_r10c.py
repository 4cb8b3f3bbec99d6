"""Round-10 probe sweep C: alias visibility, window frame edges,
arrayJoin interactions, HAVING-without-GROUP-BY, scalar subquery
contexts, tuple/array ordering."""
import os

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
from clickhouse_from_scratch_spark.session import get_spark  # noqa: E402
from clickhouse_from_scratch_spark.ddl import ChSession  # noqa: E402

spark = get_spark()
eng = ChSession(spark)


def run(tag, sql):
    try:
        df = eng.execute(sql)
        out = [tuple(r) for r in df.collect()] if df is not None else "ok"
        print(f"{tag}: {out}")
    except Exception as e:
        print(f"{tag}: ERR {type(e).__name__}: {e}")


# CH alias visibility: SELECT alias usable in WHERE / GROUP BY / HAVING
run("v1", "SELECT number * 2 AS d FROM numbers(5) WHERE d > 4")
run("v2", "SELECT number % 2 AS g, count() AS c FROM numbers(6) "
    "GROUP BY g HAVING c > 2")
run("v3", "SELECT number AS n, n + 1 AS m FROM numbers(2)")  # alias chains
run("v4", "SELECT number * 2 AS d FROM numbers(5) ORDER BY d DESC LIMIT 2")
# alias shadows a real column (CH prefer_column_name_to_alias=0: alias wins)
run("v5", "SELECT number + 10 AS number FROM numbers(3) WHERE number > 10")
# HAVING without GROUP BY (global aggregate filter)
run("h1", "SELECT sum(number) AS s FROM numbers(10) HAVING s > 40")
run("h2", "SELECT sum(number) AS s FROM numbers(10) HAVING s > 100")
# window frame edges
run("w1", "SELECT number, sum(number) OVER (ORDER BY number DESC "
    "RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS s "
    "FROM numbers(4) ORDER BY number")
run("w2", "SELECT number, count() OVER (ORDER BY number ROWS BETWEEN "
    "UNBOUNDED PRECEDING AND 1 PRECEDING) AS c FROM numbers(3) "
    "ORDER BY number")
run("w3", "SELECT number, first_value(number) OVER (ORDER BY number "
    "ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS f FROM numbers(4) "
    "ORDER BY number")
run("w4", "SELECT number, nth_value(number, 2) OVER (ORDER BY number) "
    "AS n2 FROM numbers(3) ORDER BY number")
run("w5", "SELECT number, ntile(2) OVER (ORDER BY number) AS t "
    "FROM numbers(5) ORDER BY number")
# arrayJoin in WHERE / multiple arrayJoins
run("a1", "SELECT arrayJoin([1, 2, 3]) AS x WHERE x > 1")
run("a2", "SELECT arrayJoin([1, 2]) AS a, arrayJoin([10, 20]) AS b "
    "ORDER BY a, b")
run("a3", "SELECT count() AS c FROM (SELECT arrayJoin([1, 2, 3]) AS x)")
run("a4", "SELECT sum(arrayJoin([1, 2, 3])) AS s")
# scalar subqueries in odd positions
run("q1", "SELECT (SELECT 42) AS v, (SELECT max(number) FROM "
    "numbers(5)) + 1 AS m")
run("q2", "SELECT number FROM numbers(5) "
    "WHERE number = (SELECT min(number) + 1 FROM numbers(5))")
run("q3", "SELECT (SELECT 1, 2) AS t, (SELECT 1, 2).2 AS snd")
# empty scalar subquery -> CH: default value (0), not NULL/error
run("q4", "SELECT (SELECT number FROM numbers(5) WHERE 0) AS v")
# tuple/array ordering
run("o1", "SELECT a FROM (SELECT [2, 1] AS a UNION ALL SELECT [1, 9]) "
    "ORDER BY a")
run("o2", "SELECT t FROM (SELECT (2, 'a') AS t UNION ALL "
    "SELECT (1, 'z')) ORDER BY t")
# IS DISTINCT FROM-ish: CH has no such op; NULL-safe compare spelled as
run("o3", "SELECT 1 = NULL AS a, NULL IS NULL AS b")
# if/multiIf type promotion
run("p1", "SELECT if(1, 1, 2.5) AS a, if(0, 'x', NULL) AS b")
run("p2", "SELECT multiIf(number = 0, 'zero', number = 1, 'one', "
    "'many') AS s FROM numbers(3)")
# CASE forms
run("p3", "SELECT CASE number WHEN 0 THEN 'z' WHEN 1 THEN 'o' "
    "ELSE 'm' END AS s FROM numbers(3)")
run("p4", "SELECT CASE WHEN number > 1 THEN number * 10 END AS v "
    "FROM numbers(3)")  # no ELSE -> NULL
# numeric literal types
run("t1", "SELECT toTypeName(1) AS a, toTypeName(-1) AS b, "
    "toTypeName(1.5) AS c, toTypeName(256) AS d, "
    "toTypeName(4294967296) AS e")
run("t2", "SELECT toTypeName('x') AS a, toTypeName(NULL) AS b, "
    "toTypeName([1, 2]) AS c, toTypeName((1, 'a')) AS d")
run("t3", "SELECT toTypeName(toDate('2024-01-01')) AS a, "
    "toTypeName(now()) AS b, toTypeName(1 + 1.0) AS c")
