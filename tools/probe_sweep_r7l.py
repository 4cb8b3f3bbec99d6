"""Round-7 sweep batch 14: IN-with-NULL semantics (operators/in#null-
processing: IN involving NULL is always 0 with transform_null_in=0 —
never NULL), tuple lexicographic comparison, arrayEnumerate* family,
bitmask helpers, SQL/JSON forms, ORDER BY array. (sql, expected|None)"""
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
    # --- IN with NULL: result is 0/1 UInt8, never NULL ---
    ("SELECT 1 IN (NULL, 1) AS a, 2 IN (NULL, 1) AS b", [(True, False)]),
    ("SELECT 2 NOT IN (NULL, 1) AS r", [(True,)]),
    ("SELECT NULL IN (1, 2) AS a, NULL NOT IN (1, 2) AS b",
     [(False, True)]),
    ("SELECT NULL IN (NULL) AS r", [(False,)]),
    ("SELECT number IN (SELECT nullIf(number, 1) FROM numbers(3)) AS r "
     "FROM numbers(3) ORDER BY number",
     [(True,), (False,), (True,)]),
    ("SELECT number NOT IN (SELECT nullIf(number, 1) FROM numbers(3)) "
     "AS r FROM numbers(3) ORDER BY number",
     [(False,), (True,), (False,)]),
    # --- tuple comparison: lexicographic ---
    ("SELECT (1, 2) < (1, 3) AS a, (1, 2) < (1, 2) AS b, "
     "(2, 0) > (1, 9) AS c", [(True, False, True)]),
    ("SELECT (1, 'a') = (1, 'a') AS a, (1, 'a') != (1, 'b') AS b",
     [(True, True)]),
    # --- arrayEnumerate family ---
    ("SELECT arrayEnumerate([10, 20, 30]) AS r", [([1, 2, 3],)]),
    ("SELECT arrayEnumerateUniq([10, 20, 10, 30, 10]) AS r",
     [([1, 1, 2, 1, 3],)]),
    ("SELECT arrayEnumerateDense([10, 20, 10, 30]) AS r",
     [([1, 2, 1, 3],)]),
    # --- bitmask helpers ---
    ("SELECT bitmaskToList(50) AS r", [('2,16,32',)]),
    ("SELECT bitmaskToArray(50) AS r", [([2, 16, 32],)]),
    # --- SQL/JSON standard forms ---
    ("SELECT JSON_EXISTS('{\"a\": 1}', '$.a') AS a, "
     "JSON_EXISTS('{\"a\": 1}', '$.b') AS b", [(True, False)]),
    ("SELECT JSON_VALUE('{\"a\": \"x\"}', '$.a') AS r", [('x',)]),
    ("SELECT JSON_QUERY('{\"a\": [1, 2]}', '$.a') AS r", [('[[1,2]]',)]),
    # --- ORDER BY an array column: lexicographic ---
    ("SELECT a FROM (SELECT arrayJoin([[2], [1, 3], [1, 2]]) AS a) "
     "ORDER BY a", [([1, 2],), ([1, 3],), ([2],)]),
    # --- comparisons return UInt8, usable as numbers ---
    ("SELECT (3 > 2) + (2 > 1) AS r", [(2,)]),
    # --- has/indexOf with NULL elements ---
    ("SELECT has([1, NULL, 2], NULL) AS a, indexOf([1, NULL, 2], NULL) "
     "AS b", [(True, 2)]),
    ("SELECT countEqual([1, NULL, 1], NULL) AS r", [(1,)]),
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
