"""Round-7 sweep batch 22: toString over complex types (CH literal
renderings), CAST String -> Array, INSERT VALUES with expressions,
EXPLAIN SYNTAX, SHOW CREATE TABLE, typed query params.
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
    # CH toString renders complex values as CH literals
    ("SELECT toString([1, 2, 3]) AS r", [('[1,2,3]',)]),
    ("SELECT toString(['a', 'b']) AS r", [("['a','b']",)]),
    ("SELECT toString((1, 'a')) AS r", [("(1,'a')",)]),
    ("SELECT toString(map('a', 1)) AS r", [("{'a':1}",)]),
    ("SELECT toString([[1], [2, 3]]) AS r", [('[[1],[2,3]]',)]),
    # CAST String -> Array parses the CH literal form
    ("SELECT CAST('[1,2,3]' AS Array(Int32)) AS r", [([1, 2, 3],)]),
    ("SELECT CAST('[''a'',''b'']' AS Array(String)) AS r",
     [((['a', 'b']),)]),
    # implicit arrayStringConcat-ish: toString of NULL
    ("SELECT toString(NULL) AS r", [(None,)]),
    ("SELECT toString([1, NULL, 2]) AS r", [('[1,NULL,2]',)]),
    # VALUES table function with expressions
    ("SELECT * FROM values('a Int32, b String', (1 + 1, lower('A')), "
     "(3, 'b')) ORDER BY a", [(2, 'a'), (3, 'b')]),
    # typed query param round-trip is covered in pytest; array literal
    # of dates renders
    ("SELECT toString([toDate('2024-01-01')]) AS r",
     [("['2024-01-01']",)]),
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
