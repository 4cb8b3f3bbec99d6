"""Round-8 probe D: scalar breadth — JSON defaults, date arithmetic
typing, arrayResize negative, -ArgMin/-Map combinators, UTF-8 vs byte
semantics, bit/IP/base-encoding functions.

Found and fixed this round: JSONExtract<T> absent-key type defaults,
JSONHas on json-null keys, JSONLength scalar = 0, arrayResize(-N),
Date−Date = days, addDays(DateTime) time-of-day, addSeconds/addMinutes
missing, dynamic INTERVAL counts, non-parametric aggregates silently
absorbing parameters, sumArgMin O(n²) fold, typed arraySum,
IPv4NumToStringClassC, makeDate32(y, doy), tupleNames."""
import sys

sys.path.insert(0, "/root/repo")
import datetime as dt

from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from clickhouse_from_scratch_spark.plans.engine import execute_sql

PROBES = [
    ("""SELECT JSONExtractInt('{"a": 3}', 'b') AS a,
        JSONExtractString('{}', 'a') AS b, JSONExtractInt('bad', 'a') AS c""",
     [(0, "", 0)]),
    ("""SELECT JSONHas('{"a": null}', 'a') AS a, JSONHas('{}', 'a') AS b""",
     [(True, False)]),
    ("SELECT JSONLength('3') AS a, JSONLength('[1,2]') AS b", [(0, 2)]),
    ("SELECT arrayResize([1,2,3], -2) AS a, arrayResize([1,2,3], -5) AS b",
     [([2, 3], [0, 0, 1, 2, 3])]),
    ("SELECT toDate('2024-03-05') - toDate('2024-03-01') AS r", [(4,)]),
    ("SELECT addDays(toDateTime('2024-01-01 05:00:00'), 1) AS r",
     [(dt.datetime(2024, 1, 2, 5, 0),)]),
    ("SELECT addSeconds(toDateTime('2024-01-01 00:00:00'), 90) AS r",
     [(dt.datetime(2024, 1, 1, 0, 1, 30),)]),
    ("SELECT toDate('2024-01-01') + number AS r FROM numbers(2) ORDER BY number",
     [(dt.date(2024, 1, 1),), (dt.date(2024, 1, 2),)]),
    ("SELECT toDate('2024-01-31') + INTERVAL number MONTH AS r FROM numbers(2) ORDER BY number",
     [(dt.date(2024, 1, 31),), (dt.date(2024, 2, 29),)]),
    ("SELECT sumArgMin(number, number % 3) AS a, countArgMin(number % 3) AS b FROM numbers(10)",
     [(18, 4)]),
    ("SELECT countMap(m) AS r FROM (SELECT arrayJoin([map('a', 1), map('a', 2), map('b', 9)]) AS m)",
     [({"a": 2, "b": 1},)]),
    ("SELECT arraySum([1,2,3]) AS a, arraySum([1.5, 2.5]) AS b", [(6, 4.0)]),
    ("SELECT length('héllo🙂') AS a, lengthUTF8('héllo🙂') AS b", [(10, 6)]),
    ("SELECT intDiv(-7, 2) AS a, modulo(-7, 2) AS b", [(-3, -1)]),
    ("SELECT IPv4NumToStringClassC(3232235777) AS r", [("192.168.1.xxx",)]),
    ("SELECT makeDate32(2024, 60) AS r", [(dt.date(2024, 2, 29),)]),
    ("SELECT tupleNames(tuple(1, 2)) AS r", [(["1", "2"],)]),
    ("SELECT {'x': 10, 'y': 20}['y'] AS r", [(20,)]),
    ("SELECT finalizeAggregation(initializeAggregation('sumState', 3)) AS r",
     [(3,)]),
]

fails = 0
for sql, exp in PROBES:
    try:
        rows = [tuple(r) for r in execute_sql(spark, sql, {}).collect()]
        ok = exp is None or rows == exp
        if not ok:
            fails += 1
        print("OK  " if ok else f"MISMATCH want {exp}", "|",
              " ".join(sql.split())[:95], "->", rows[:4])
    except Exception as e:
        fails += 1
        print("FAIL", "|", " ".join(sql.split())[:95], "->",
              type(e).__name__, str(e).split("\n")[0][:110])
print("FAILS:", fails)
