"""Round-7 sweep batch 19: ISO week/year, Decimal arithmetic scale,
extract/countMatches/translate, map helpers, floor with precision,
array rotate/shingles, moduloOrZero. (sql, expected|None)"""
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
    # ISO week/year
    ("SELECT toISOWeek(toDate('2024-01-01')) AS a, "
     "toISOYear(toDate('2023-01-01')) AS b, "
     "toISOWeek(toDate('2023-01-01')) AS c", [(1, 2022, 52)]),
    # Decimal arithmetic: multiply adds scales, divide keeps dividend's
    ("SELECT toString(toDecimal32(2.5, 1) * toDecimal32(2.5, 1)) AS a",
     [('6.25',)]),
    ("SELECT toString(toDecimal32(1.1, 1) + toDecimal32(2.25, 2)) AS a",
     [('3.35',)]),
    # extract family
    ("SELECT extract('hello123world456', '\\\\d+') AS a, "
     "extractAll('hello123world456', '\\\\d+') AS b",
     [('123', ['123', '456'])]),
    ("SELECT countMatches('aaaa', 'aa') AS a, "
     "countSubstrings('aaaa', 'aa') AS b", [(2, 2)]),
    ("SELECT translate('abc', 'ab', 'xy') AS r", [('xyc',)]),
    ("SELECT positionCaseInsensitive('Hello', 'hello') AS r", [(1,)]),
    # map helpers
    ("SELECT mapContains(map('a', 1), 'a') AS a, "
     "mapKeys(map('a', 1, 'b', 2)) AS k, "
     "mapValues(map('a', 1, 'b', 2)) AS v",
     [(True, ['a', 'b'], [1, 2])]),
    # floor/trunc with precision (negative = tens)
    ("SELECT floor(123.45, 1) AS a, floor(123.45, -1) AS b, "
     "trunc(-1.9) AS c, ceil(123.45, -1) AS d",
     [(123.4, 120.0, -1.0, 130.0)]),
    ("SELECT roundBankers(2.5) AS a, roundBankers(3.5) AS b",
     [(2.0, 4.0)]),
    # moduloOrZero / intDivOrZero: 0 on zero divisor
    ("SELECT moduloOrZero(5, 0) AS a, intDivOrZero(5, 0) AS b",
     [(0, 0)]),
    # array rotate / shingles
    ("SELECT arrayRotateLeft([1, 2, 3], 1) AS a, "
     "arrayRotateRight([1, 2, 3], 1) AS b", [([2, 3, 1], [3, 1, 2])]),
    ("SELECT arrayShingles([1, 2, 3], 2) AS r", [([[1, 2], [2, 3]],)]),
    # arrayIntersect (order-insensitive via sort)
    ("SELECT arraySort(arrayIntersect([1, 2, 3], [3, 2, 4])) AS r",
     [([2, 3],)]),
    # soundex
    ("SELECT soundex('Robert') AS r", None),
    # toDecimalString
    ("SELECT toDecimalString(64.32, 5) AS r", None),
    # monthName / dateName
    ("SELECT monthName(toDate('2024-03-14')) AS a, "
     "dateName('weekday', toDate('2024-03-14')) AS b", None),
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
