"""Round-7 sweep batch 24: array aggregates skip NULLs, toTimeZone
display conversion, range() variants, finite/nan helpers, transform
3-arg keep-original, toRelative*Num, timeSlot rounding, nan in sums.
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
    ("SELECT arrayMin([3, NULL, 1]) AS a, arraySum([1, NULL]) AS b, "
     "arrayAvg([2, NULL, 4]) AS c, arrayMax([1, NULL, 5]) AS d",
     [(1, 1.0, 3.0, 5)]),
    ("SELECT toString(toTimeZone(toDateTime('2024-01-01 00:00:00'), "
     "'Asia/Tokyo')) AS r", [('2024-01-01 09:00:00',)]),
    ("SELECT range(4) AS a, range(2, 5) AS b, range(0, 10, 3) AS c",
     [(([0, 1, 2, 3]), [2, 3, 4], [0, 3, 6, 9])]),
    ("SELECT isFinite(1 / 0) AS a, isInfinite(1 / 0) AS b, "
     "isNaN(0 / 0) AS c, isFinite(1.5) AS d",
     [(False, True, True, True)]),
    ("SELECT ifNotFinite(1 / 0, 9.0) AS a, ifNotFinite(2.5, 9.0) AS b",
     [(9.0, 2.5)]),
    # 3-arg transform keeps the original when unmatched
    ("SELECT transform(5, [1, 2], [10, 20]) AS a, "
     "transform(1, [1, 2], [10, 20]) AS b", [(5, 10)]),
    ("SELECT toRelativeHourNum(toDateTime('1970-01-02 00:00:00')) AS a,"
     " toRelativeDayNum(toDate('1970-01-03')) AS b", [(24, 2)]),
    ("SELECT toString(timeSlot(toDateTime('2024-01-01 12:17:00'))) "
     "AS r", [('2024-01-01 12:00:00',)]),
    # nan propagates through sums
    ("SELECT isNaN(sum(v)) AS r FROM (SELECT arrayJoin([1.0, 0.0/0.0])"
     " AS v)", [(True,)]),
    # greatest/least across float and int
    ("SELECT greatest(1, 2.5) AS a, least(-1, 0.5) AS b",
     [(2.5, -1.0)]),
    # arrayStringConcat skips NULL? CH throws on Nullable; we print
    ("SELECT arrayFirst(x -> x > 1, [1, 3, 5]) AS a, "
     "arrayFirstIndex(x -> x > 1, [1, 3, 5]) AS b", [(3, 2)]),
    # scalar IN tuple of one
    ("SELECT 1 IN 1 AS a, 1 IN (1) AS b", [(True, True)]),
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
