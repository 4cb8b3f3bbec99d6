"""Round-7 sweep batch 27: groupArrayInsertAt, arrayFill/arraySplit
values, admin constants, exponentialMovingAverage, matrix aggregates,
meanZTest, multiSearch positions, UTF8 search, groupConcat.
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
    ("SELECT groupArrayInsertAt(s, p) AS r FROM (SELECT arrayJoin("
     "[('a', 0), ('c', 2)]) AS t, t.1 AS s, t.2 AS p)", None),
    # arrayFill: carry last value forward where the lambda is false
    ("SELECT arrayFill(x -> x != 0, [1, 0, 0, 5, 0]) AS r",
     [([1, 1, 1, 5, 5],)]),
    ("SELECT arrayReverseFill(x -> x != 0, [0, 2, 0, 0, 7]) AS r",
     [([2, 2, 7, 7, 7],)]),
    ("SELECT arraySplit(x -> x > 0, [-1, 2, 3, -4, 5]) AS r", None),
    ("SELECT currentDatabase() AS a, version() AS b", None),
    ("SELECT exponentialMovingAverage(1)(v, t) AS r FROM (SELECT "
     "arrayJoin([(1.0, 1), (2.0, 2)]) AS p, p.1 AS v, p.2 AS t)",
     None),
    ("SELECT corrMatrix(a, b) AS r FROM (SELECT number AS a, "
     "number * 2 AS b FROM numbers(4))", None),
    ("SELECT meanZTest(0.5, 0.5, 0.95)(v, g) AS r FROM (SELECT "
     "number AS v, number % 2 AS g FROM numbers(10))", None),
    ("SELECT multiSearchFirstPosition('hello world', ['or', 'wo']) "
     "AS r", [(7,)]),
    ("SELECT multiSearchFirstIndex('hello', ['xx', 'll']) AS a, "
     "multiSearchAllPositions('hello', ['l', 'o']) AS b",
     [(2, [3, 5])]),
    ("SELECT positionUTF8('привет', 'вет') AS r", [(4,)]),
    ("SELECT countSubstringsCaseInsensitive('AbaB', 'ab') AS r",
     [(2,)]),
    ("SELECT groupConcat(toString(number)) AS r FROM numbers(3)",
     None),
    ("SELECT positionCaseInsensitiveUTF8('ПРИВЕТ', 'вет') AS r",
     [(4,)]),
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
