"""Round-7 sweep batch 21: SQL-surface edges — unary minus typing,
GROUP BY constant/tuple, HAVING without GROUP BY, LIMIT 0, negative
array indexing, chained INTERVAL arithmetic, alias shadowing in ORDER
BY, aggregates over constants, escapes. (sql, expected|None)"""
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
    ("SELECT -number AS n, toTypeName(-number) AS t FROM numbers(1)",
     [(0, 'Int64')]),
    ("SELECT count() AS c FROM numbers(5) GROUP BY 'a'", [(5,)]),
    ("SELECT count() AS c FROM numbers(6) GROUP BY (number % 2, "
     "number % 3) ORDER BY c DESC LIMIT 1", [(1,)]),
    # HAVING without GROUP BY filters the single global-agg row
    ("SELECT sum(number) AS s FROM numbers(5) HAVING sum(number) > "
     "100", []),
    ("SELECT sum(number) AS s FROM numbers(5) HAVING s > 5", [(10,)]),
    ("SELECT number FROM numbers(5) LIMIT 0", []),
    ("SELECT sum(1) AS a, avg(2) AS b, count(1) AS c FROM numbers(5)",
     [(5, 2.0, 5)]),
    # negative array index counts from the end
    ("SELECT [1, 2, 3][-1] AS a, arrayElement([1, 2, 3], -2) AS b",
     [(3, 2)]),
    # chained INTERVAL arithmetic
    ("SELECT toString(toDateTime('2024-01-01 00:00:00') + INTERVAL 1 "
     "DAY + INTERVAL 2 HOUR) AS r", [('2024-01-02 02:00:00',)]),
    ("SELECT toString(toDate('2024-03-14') - INTERVAL 2 WEEK) AS r",
     [('2024-02-29',)]),
    # alias shadowing + ORDER BY expression over alias
    ("SELECT number AS x, x + 1 AS y FROM numbers(2) ORDER BY y DESC",
     [(1, 2), (0, 1)]),
    ("SELECT number FROM numbers(3) ORDER BY -number",
     [(2,), (1,), (0,)]),
    # escapes in string literals
    ("SELECT length('a\\nb') AS a, length('a\\tb') AS b, "
     "length('\\x41') AS c", [(3, 3, 1)]),
    # BETWEEN and NOT precedence
    ("SELECT 1 BETWEEN 0 AND 2 AS a, 5 NOT BETWEEN 0 AND 2 AS b",
     [(True, True)]),
    # unary plus is a no-op; double negation parses
    ("SELECT -(-5) AS a", [(5,)]),
    # tuple GROUP BY key projected back
    ("SELECT (number % 2) AS g, groupArray(number) AS xs FROM "
     "numbers(4) GROUP BY g ORDER BY g", [(0, [0, 2]), (1, [1, 3])]),
    # scalar subquery in arithmetic
    ("SELECT number + (SELECT max(number) FROM numbers(3)) AS r FROM "
     "numbers(2) ORDER BY r", [(2,), (3,)]),
    # count() with LIMIT BY upstream
    ("SELECT count() AS c FROM (SELECT number % 2 AS g, number FROM "
     "numbers(10) ORDER BY g, number LIMIT 2 BY g)", [(4,)]),
]

npass = nfail = nprint = 0
for sql, expected in PROBES:
    try:
        rows = [tuple(r) for r in
                execute_sql(spark, sql, {}).limit(8).collect()]
        if expected is None:
            print(f"PRNT | {sql[:95]!r} -> {rows}")
            nprint += 1
        elif rows == expected:
            npass += 1
        else:
            print(f"DIFF | {sql[:95]!r} -> {rows} (expected {expected})")
            nfail += 1
    except Exception as e:
        msg = str(e).split("\n")[0][:130]
        print(f"FAIL | {sql[:95]!r} -> {type(e).__name__}: {msg}")
        nfail += 1
print(f"\n{npass} pass, {nfail} diff/fail, {nprint} printed")
