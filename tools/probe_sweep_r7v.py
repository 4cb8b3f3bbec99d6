"""Round-7 sweep batch 25: JSON extraction family breadth —
JSONExtractArrayRaw, JSONExtractKeysAndValues, JSONExtractKeys,
JSONType, JSONLength, typed extracts, simpleJSON/visitParam forms.
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
    ("SELECT JSONExtractArrayRaw('{\"a\": [1, \"x\", [2]]}', 'a') "
     "AS r", [((['1', '"x"', '[2]']),)]),
    ("SELECT JSONExtractKeys('{\"a\": 1, \"b\": 2}') AS r",
     [((['a', 'b']),)]),
    ("SELECT JSONExtractKeysAndValues('{\"a\": 1, \"b\": 2}', "
     "'Int32') AS r", None),
    ("SELECT JSONType('{\"a\": 1}') AS a, JSONType('[1]') AS b, "
     "JSONType('\"s\"') AS c", None),
    ("SELECT JSONType('{\"a\": 1}', 'a') AS a, "
     "JSONType('{\"a\": [1]}', 'a') AS b", None),
    ("SELECT JSONLength('[1, 2, 3]') AS a, "
     "JSONLength('{\"a\": 1, \"b\": 2}') AS b", [(3, 2)]),
    ("SELECT JSONHas('{\"a\": 1}', 'a') AS a, "
     "JSONHas('{\"a\": 1}', 'b') AS b", [(True, False)]),
    ("SELECT JSONExtractInt('{\"a\": 42}', 'a') AS a, "
     "JSONExtractFloat('{\"a\": 1.5}', 'a') AS b, "
     "JSONExtractBool('{\"a\": true}', 'a') AS c,"
     "JSONExtractString('{\"a\": \"x\"}', 'a') AS d",
     [(42, 1.5, True, 'x')]),
    ("SELECT simpleJSONExtractInt('{\"a\": 42}', 'a') AS a, "
     "simpleJSONHas('{\"a\": 1}', 'a') AS b", None),
    ("SELECT visitParamExtractString('{\"a\": \"x\"}', 'a') AS r",
     [('x',)]),
    ("SELECT JSONExtractRaw('{\"a\": {\"b\": 1}}', 'a') AS r",
     [('{"b":1}',)]),
    # nested path extraction
    ("SELECT JSONExtractString('{\"a\": {\"b\": \"deep\"}}', 'a', "
     "'b') AS r", [('deep',)]),
    # array index in path (1-based in CH)
    ("SELECT JSONExtractInt('{\"a\": [10, 20]}', 'a', 2) AS r",
     [(20,)]),
    ("SELECT JSONExtractInt('{\"a\": [10, 20]}', 'a', -1) AS r",
     [(20,)]),
    ("SELECT isValidJSON('{\"a\": 1}') AS a, isValidJSON('{bad') AS b",
     [(True, False)]),
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
