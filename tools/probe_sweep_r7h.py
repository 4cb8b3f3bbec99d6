"""Round-7 sweep batch 9: clause-edge semantics — duplicate expressions
in GROUP BY/ORDER BY/set-ops, chained alias visibility, nested tuple
access, out-of-range array/map access defaults, arrayJoin placement
rules. (sql, expected|None|'error')"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from clickhouse_from_scratch_spark.plans.engine import execute_sql

PROBES = [
    # duplicate expressions in more clauses
    ("SELECT number % 2 AS k FROM numbers(4) GROUP BY number % 2, "
     "number % 2 ORDER BY k", [(0,), (1,)]),
    ("SELECT number FROM numbers(2) ORDER BY number, number",
     [(0,), (1,)]),
    # trailing ORDER BY binds to the LAST select in a UNION chain (CH
    # docs: wrap in a subquery to sort the final result) — 'a' is
    # unknown there, so this errors in the reference too
    ("SELECT round(1.5), round(1.5) FROM numbers(1)", [(2.0, 2.0)]),
    # chained aliases (CH alias visibility)
    ("SELECT number AS x, x + 1 AS y, y * 2 AS z FROM numbers(2) "
     "ORDER BY x", [(0, 1, 2), (1, 2, 4)]),
    ("SELECT number AS x FROM numbers(4) WHERE x % 2 = 1 ORDER BY x",
     [(1,), (3,)]),
    # nested tuple access
    ("SELECT ((1, 2), 3).1 AS t", None),
    ("SELECT tupleElement(tupleElement(((1, 2), 3), 1), 2) AS r",
     [(2,)]),
    # out-of-range access: CH returns the type default, not an error
    ("SELECT arrayElement([1, 2], 5) AS a, arrayElement([1, 2], -5) "
     "AS b", [(0, 0)]),
    ("SELECT [1, 2][5] AS r", [(0,)]),
    ("SELECT arrayElement(['a'], 5) AS r", [('',)]),
    ("SELECT map('a', 1)['missing'] AS r", [(0,)]),
    ("SELECT [1, 2][-1] AS r", [(2,)]),
    # empty() / notEmpty on arrays and strings
    ("SELECT empty([]) AS a, empty([1]) AS b, empty('') AS c, "
     "notEmpty('x') AS d", [(True, False, True, True)]),
    # IN with tuple lists
    ("SELECT (1, 'a') IN ((1, 'a'), (2, 'b')) AS r", [(True,)]),
    ("SELECT number FROM numbers(5) WHERE (number, number % 2) IN "
     "((3, 1), (4, 0)) ORDER BY number", [(3,), (4,)]),
    # scalar subquery in select and where
    ("SELECT (SELECT 42) AS r", [(42,)]),
    ("SELECT number FROM numbers(5) WHERE number = (SELECT 3)",
     [(3,)]),
    # CTE breadth
    ("WITH 5 AS five SELECT five * 2 AS r", [(10,)]),
    ("WITH t AS (SELECT number FROM numbers(3)) "
     "SELECT sum(number) AS s FROM t", [(3,)]),
    # GROUP BY position / alias
    ("SELECT number % 2 AS k, count() AS c FROM numbers(4) GROUP BY 1 "
     "ORDER BY 1", [(0, 2), (1, 2)]),
    ("SELECT number % 2 AS k, count() AS c FROM numbers(4) GROUP BY k "
     "ORDER BY k", [(0, 2), (1, 2)]),
    # HAVING without GROUP BY (whole-table aggregate)
    ("SELECT sum(number) AS s FROM numbers(5) HAVING s > 5", [(10,)]),
    ("SELECT sum(number) AS s FROM numbers(5) HAVING s > 50", []),
    # tuple compare
    ("SELECT (1, 2) < (1, 3) AS a, (2, 1) > (1, 9) AS b",
     [(True, True)]),
    # implicit tuple in ORDER BY
    ("SELECT number FROM numbers(3) ORDER BY (number % 2, number)",
     None),
]

npass = nfail = nprint = 0
for sql, expected in PROBES:
    try:
        rows = [tuple(r) for r in
                execute_sql(spark, sql, {}).limit(6).collect()]
        if expected is None:
            print(f"PRNT | {sql[:95]!r} -> {rows}")
            nprint += 1
        elif rows == expected:
            npass += 1
        else:
            print(f"DIFF | {sql[:95]!r} -> {rows} (expected {expected})")
            nfail += 1
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"FAIL | {sql[:95]!r} -> {type(e).__name__}: {msg}")
        nfail += 1
print(f"\n{npass} pass, {nfail} diff/fail, {nprint} printed")
