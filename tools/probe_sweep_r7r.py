"""Round-7 sweep batch 20: empty WINDOW FRAMES get aggregate defaults
(same default-initialized-state rule as empty sets), tuple-IN with
NULLs, arrayFold with typed accumulator, frame-edge nth_value.
(sql, expected|None)"""
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
    # empty frame -> sum 0 / max 0, not NULL (default-initialized state)
    ("SELECT number, sum(number) OVER (ORDER BY number ROWS BETWEEN "
     "2 FOLLOWING AND 3 FOLLOWING) AS s FROM numbers(3) "
     "ORDER BY number", [(0, 2), (1, 0), (2, 0)]),
    ("SELECT number, max(number) OVER (ORDER BY number ROWS BETWEEN "
     "2 FOLLOWING AND 3 FOLLOWING) AS m FROM numbers(3) "
     "ORDER BY number", [(0, 2), (1, 0), (2, 0)]),
    ("SELECT number, count(number) OVER (ORDER BY number ROWS BETWEEN "
     "2 FOLLOWING AND 3 FOLLOWING) AS c FROM numbers(3) "
     "ORDER BY number", [(0, 1), (1, 0), (2, 0)]),
    # avg over an empty frame -> nan
    ("SELECT number, isNaN(avg(number) OVER (ORDER BY number ROWS "
     "BETWEEN 2 FOLLOWING AND 3 FOLLOWING)) AS a FROM numbers(3) "
     "ORDER BY number", [(0, False), (1, True), (2, True)]),
    # groupArray over an empty frame -> []
    ("SELECT number, groupArray(number) OVER (ORDER BY number ROWS "
     "BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS g FROM numbers(2) "
     "ORDER BY number", [(0, [1]), (1, [])]),
    # tuple IN with NULL members: never matches
    ("SELECT (1, NULL) IN ((1, NULL)) AS a, (1, 2) IN ((1, NULL), "
     "(1, 2)) AS b", [(False, True)]),
    # arrayFold with a non-trivial accumulator type
    ("SELECT arrayFold((acc, x) -> acc + x, [1, 2, 3], "
     "toInt64(10)) AS r", [(16,)]),
    ("SELECT arrayFold((acc, x) -> arrayPushBack(acc, x * 2), "
     "[1, 2], emptyArrayInt64()) AS r", [([2, 4],)]),
    # arrayFold body using a type-dispatched fn on the acc
    ("SELECT arrayFold((acc, x) -> concat(acc, toString(x)), "
     "['1', '2'], 'v') AS r", None),
    # sumIf windowed with never-true condition -> 0
    ("SELECT number, sumIf(number, number > 100) OVER (ORDER BY "
     "number ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s "
     "FROM numbers(2) ORDER BY number", [(0, 0), (1, 0)]),
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
