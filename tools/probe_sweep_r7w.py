"""Round-7 sweep batch 26: map HOFs (mapApply/mapFilter), single-map
aggregate forms (sumMap(m)/minMap(m)), argMinIf/argMaxIf,
countDistinctIf/uniqExactIf, byteSize, tupleConcat, vector distance
values, quantilesExactWeighted, formatReadableDecimalSize.
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
    ("SELECT mapApply((k, v) -> (k, v * 2), map('a', 1, 'b', 2)) AS r",
     None),
    ("SELECT mapFilter((k, v) -> v > 1, map('a', 1, 'b', 2)) AS r",
     None),
    # single-map aggregate forms
    # Map-argument form returns a MAP (not the tuple form)
    ("SELECT mapValues(sumMap(m)) AS v FROM (SELECT map('a', number) "
     "AS m FROM numbers(3))", [([3],)]),
    # argMinIf / argMaxIf
    ("SELECT argMinIf(s, v, v > 10) AS a, argMaxIf(s, v, v > 0) AS b "
     "FROM (SELECT arrayJoin([('x', 5), ('y', 20), ('z', 30)]) AS p, "
     "p.1 AS s, p.2 AS v)", [('y', 'z')]),
    # countDistinctIf / uniqExactIf
    ("SELECT countDistinctIf(number % 3, number < 4) AS a, "
     "uniqExactIf(number % 3, number < 4) AS b FROM numbers(10)",
     [(3, 3)]),
    # byteSize of fixed-width types
    ("SELECT byteSize(toUInt8(1)) AS a, byteSize(toUInt32(1)) AS b, "
     "byteSize(1.5) AS c", None),
    ("SELECT tupleConcat((1, 'a'), tuple(2.5)) AS r", None),
    # vector math values
    ("SELECT arrayDotProduct([1, 2], [3, 4]) AS a, "
     "round(cosineDistance([1, 0], [0, 1]), 6) AS b, "
     "L2Distance([0, 0], [3, 4]) AS c", [(11, 1.0, 5.0)]),
    ("SELECT quantilesExactWeighted(0.5)(number, 1) AS r FROM "
     "numbers(5)", [([2],)]),
    ("SELECT formatReadableDecimalSize(1500) AS r", None),
    # mapUpdate / mapConcat spot (r7g covered breadth)
    ("SELECT mapUpdate(map('a', 1), map('a', 9, 'b', 2)) AS r", None),
    # arrayJaccardIndex
    ("SELECT round(arrayJaccardIndex([1, 2], [2, 3]), 6) AS r", None),
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
        msg = str(e).split("\n")[0][:130]
        print(f"FAIL | {sql[:95]!r} -> {type(e).__name__}: {msg}")
        nfail += 1
print(f"\n{npass} pass, {nfail} diff/fail, {nprint} printed")
