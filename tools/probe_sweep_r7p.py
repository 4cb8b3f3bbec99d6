"""Round-7 sweep batch 18: COMPOSITIONS of this round's semantic fixes
— -If empty-subset defaults under GROUP BY/TOTALS/ROLLUP, IN-with-NULL
in filter position, setop filter semantics with NULL rows and nested
contexts, arrayJoin(map) under GROUP BY. (sql, expected|None)"""
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
    # -If defaults under WITH TOTALS: totals row aggregates the empty
    # subset too
    ("SELECT number % 2 AS g, sumIf(number, number > 100) AS s FROM "
     "numbers(4) GROUP BY g WITH TOTALS ORDER BY g",
     [(0, 0), (1, 0), (None, 0)]),
    # -If defaults under ROLLUP
    ("SELECT number % 2 AS g, maxIf(number, number > 100) AS m FROM "
     "numbers(4) GROUP BY ROLLUP(g) ORDER BY g NULLS LAST",
     [(0, 0), (1, 0), (None, 0)]),
    # IN-with-NULL as a WHERE filter
    ("SELECT number FROM numbers(3) WHERE number IN (NULL, 1) "
     "ORDER BY number", [(1,)]),
    ("SELECT number FROM numbers(3) WHERE number NOT IN (NULL, 1) "
     "ORDER BY number", [(0,), (2,)]),
    # setops treat NULL rows as equal (null-safe filter)
    ("SELECT NULL AS n INTERSECT SELECT NULL AS n", [(None,)]),
    ("SELECT 1 AS n EXCEPT SELECT NULL AS n", [(1,)]),
    ("SELECT NULL AS n EXCEPT SELECT NULL AS n", []),
    # setop nested in a subquery feeding a join
    ("SELECT t.n, m.v FROM (SELECT 1 AS n UNION ALL SELECT 1 AS n "
     "INTERSECT SELECT 1 AS n) AS t JOIN (SELECT 1 AS n, 'x' AS v) "
     "AS m ON t.n = m.n", [(1, 'x'), (1, 'x')]),
    # arrayJoin(map) under GROUP BY
    ("SELECT kv.1 AS k, sum(kv.2) AS s FROM (SELECT arrayJoin("
     "map('a', number, 'b', 1)) AS kv FROM numbers(3)) GROUP BY k "
     "ORDER BY k", [('a', 3), ('b', 3)]),
    # hex of a grouped expression
    ("SELECT hex(number % 2) AS h, count() AS c FROM numbers(4) "
     "GROUP BY h ORDER BY h", [('00', 2), ('01', 2)]),
    # empty-set defaults survive a UNION ALL branch
    ("SELECT sum(number) AS s FROM numbers(3) WHERE 0 UNION ALL "
     "SELECT sum(number) AS s FROM numbers(3)", [(0,), (3,)]),
    # avgIf nan inside round() derived projection still nan-safe
    ("SELECT isNaN(avgIf(number, number > 9)) AS r FROM numbers(3)",
     [(True,)]),
    # sumIf + HAVING on the defaulted value
    ("SELECT number % 3 AS g, sumIf(number, number > 100) AS s FROM "
     "numbers(6) GROUP BY g HAVING s = 0 ORDER BY g",
     [(0, 0), (1, 0), (2, 0)]),
    # grouped minIf over strings: '' default per group
    ("SELECT g, minIf(s, s > 'z') AS m FROM (SELECT 'a' AS s, 1 AS g) "
     "GROUP BY g", [(1, '')]),
    # IN (NULL, ...) inside a CASE
    ("SELECT if(2 IN (NULL, 1), 'y', 'n') AS r", [('n',)]),
    # deltaSum with FILTER never-true -> 0
    ("SELECT deltaSumIf(number, number > 100) AS d FROM numbers(4)",
     [(0,)]),
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
