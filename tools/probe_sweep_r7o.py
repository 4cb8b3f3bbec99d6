"""Round-7 sweep batch 17: substring negative offsets, splitBy empty
edges, untuple, arrayJoin over Map, Decimal toString scale, intExp2/10,
sign/degrees, toLowCardinality, pad truncation. (sql, expected|None)"""
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
    # substring: negative offset counts from the end; 1-based
    ("SELECT substring('hello', -3, 2) AS a, substring('hello', 2) "
     "AS b, substring('hello', 2, 100) AS c", [('ll', 'ello', 'ello')]),
    ("SELECT substringUTF8('привет', 2, 3) AS r", [('рив',)]),
    # splitByChar edges: empty string -> [''], trailing sep -> ['a','']
    ("SELECT splitByChar(',', '') AS a, splitByChar(',', 'a,') AS b, "
     "splitByChar(',', ',a') AS c", [([''], ['a', ''], ['', 'a'])]),
    ("SELECT splitByString('ab', 'cabd') AS r", [(['c', 'd'],)]),
    # startsWith/endsWith with empty needle = 1
    ("SELECT startsWith('abc', '') AS a, endsWith('abc', '') AS b",
     [(True, True)]),
    # untuple expands a tuple into columns
    ("SELECT untuple((1, 'a')) AS u", None),
    # arrayJoin over a Map iterates (k, v) tuples
    ("SELECT arrayJoin(map('a', 1, 'b', 2)) AS kv ORDER BY kv.1", None),
    ("SELECT kv.1 AS k, kv.2 AS v FROM (SELECT arrayJoin(map('a', 1, "
     "'b', 2)) AS kv) ORDER BY k", [('a', 1), ('b', 2)]),
    # Decimal toString keeps the declared scale
    ("SELECT toString(toDecimal32(1.5, 2)) AS a, "
     "toString(toDecimal64(-3, 3)) AS b, "
     "toString(toDecimal32(1.25, 4)) AS c", [('1.5', '-3', '1.25')]),
    # intExp2 / intExp10 are integer-typed
    ("SELECT intExp2(10) AS a, intExp10(3) AS b", [(1024, 1000)]),
    ("SELECT sign(-5) AS a, sign(0) AS b, sign(7.2) AS c",
     [(-1, 0, 1)]),
    ("SELECT round(degrees(pi()), 6) AS a, round(radians(180), 6) AS b",
     None),
    ("SELECT toLowCardinality('x') AS r", [('x',)]),
    # pads TRUNCATE when the string is longer than the target
    ("SELECT leftPad('abc', 2) AS a, rightPad('abc', 2, '*') AS b, "
     "leftPad('a', 3, 'xy') AS c", [('ab', 'ab', 'xya')]),
    # formatReadableSize spot value
    ("SELECT formatReadableSize(1024) AS r", [('1.00 KiB',)]),
    # position is 1-based, 0 when absent
    ("SELECT position('hello', 'l') AS a, position('hello', 'z') AS b",
     [(3, 0)]),
    # concatWithSeparator
    ("SELECT concatWithSeparator('-', 'a', 'b', 'c') AS r",
     [('a-b-c',)]),
    # arrayStringConcat default separator is ''
    ("SELECT arrayStringConcat(['a', 'b']) AS a, "
     "arrayStringConcat(['a', 'b'], '/') AS b", [('ab', 'a/b')]),
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
