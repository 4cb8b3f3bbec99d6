"""Round-7 sweep batch 10: bitmap scalar family, -Resample combinator,
type-name breadth (Nullable arrays, intervals, defaultValueOfTypeName),
pointInPolygon, arrayPartialSort, banker's rounding on negatives.
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
    # --- bitmap scalars ---
    ("SELECT bitmapToArray(bitmapBuild([1,2,3])) AS r", [([1, 2, 3],)]),
    ("SELECT bitmapCardinality(bitmapBuild([1,2,3])) AS r", [(3,)]),
    ("SELECT bitmapToArray(bitmapAnd(bitmapBuild([1,2,3]), "
     "bitmapBuild([3,4,5]))) AS r", [([3],)]),
    ("SELECT bitmapToArray(bitmapOr(bitmapBuild([1,2]), "
     "bitmapBuild([3]))) AS r", [([1, 2, 3],)]),
    ("SELECT bitmapToArray(bitmapXor(bitmapBuild([1,2,3]), "
     "bitmapBuild([3,4]))) AS r", [([1, 2, 4],)]),
    ("SELECT bitmapToArray(bitmapAndnot(bitmapBuild([1,2,3]), "
     "bitmapBuild([3]))) AS r", [([1, 2],)]),
    ("SELECT bitmapContains(bitmapBuild([1,2]), 1) AS y, "
     "bitmapContains(bitmapBuild([1,2]), 9) AS n", None),
    ("SELECT bitmapHasAny(bitmapBuild([1,2]), bitmapBuild([2,3])) AS y,"
     " bitmapHasAll(bitmapBuild([1,2]), bitmapBuild([2,3])) AS n",
     None),
    ("SELECT bitmapMin(bitmapBuild([3,1,5])) AS a, "
     "bitmapMax(bitmapBuild([3,1,5])) AS b", [(1, 5)]),
    ("SELECT bitmapToArray(bitmapSubsetInRange(bitmapBuild([1,5,10]), "
     "2, 11)) AS r", None),
    # --- Resample combinator ---
    ("SELECT countResample(0, 4, 2)(number) AS r FROM numbers(4)",
     None),
    ("SELECT sumResample(0, 4, 2)(number, number) AS r FROM numbers(4)",
     None),
    # --- type-name breadth ---
    ("SELECT toTypeName([1, NULL]) AS r", None),
    ("SELECT toTypeName(toIntervalDay(1)) AS r", [('IntervalDay',)]),
    ("SELECT defaultValueOfTypeName('UInt8') AS a, "
     "defaultValueOfTypeName('String') AS b", None),
    ("SELECT defaultValueOfTypeName('Nullable(Int8)') AS r", [(None,)]),
    ("SELECT isNullable(toNullable(1)) AS y, isNullable(1) AS n", [(1, 0)]),
    # --- geometry ---
    ("SELECT pointInPolygon((3, 3), [(6, 0), (8, 4), (5, 8), (0, 2)]) "
     "AS r", None),
    # --- misc edges ---
    ("SELECT round(-2.5) AS a, round(-3.5) AS b, round(-0.5) AS c",
     [(-2.0, -4.0, -0.0)]),
    ("SELECT arrayPartialSort(2, [5,3,4,1,2]) AS r", None),
    ("SELECT arraySlice([1,2,3,4,5], -3) AS r", [([3, 4, 5],)]),
    ("SELECT trimLeft('  x  ') AS a, trimRight('  x  ') AS b", None),
    ("SELECT toString(addMonths(toDate('2020-01-31'), 1)) AS r",
     [('2020-02-29',)]),
    ("SELECT toString(addYears(toDate('2020-02-29'), 1)) AS r",
     [('2021-02-28',)]),
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
        msg = str(e).split("\n")[0][:140]
        print(f"FAIL | {sql[:95]!r} -> {type(e).__name__}: {msg}")
        nfail += 1
print(f"\n{npass} pass, {nfail} diff/fail, {nprint} printed")
