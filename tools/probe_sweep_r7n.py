"""Round-7 sweep batch 16: age() vs dateDiff full-unit counting,
deltaSum, minMap/maxMap, hex/bin type-width padding, char/ascii,
toMonday/toStartOfWeek modes, intervalLengthSum, boundingRatio.
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
    # age() counts COMPLETE units; dateDiff counts boundary crossings
    ("SELECT age('year', toDate('2021-12-29'), toDate('2022-01-01')) "
     "AS a, dateDiff('year', toDate('2021-12-29'), "
     "toDate('2022-01-01')) AS d", [(0, 1)]),
    ("SELECT age('month', toDate('2021-12-29'), toDate('2022-01-01')) "
     "AS a, age('day', toDate('2021-12-29'), toDate('2022-01-01')) "
     "AS d", [(0, 3)]),
    ("SELECT age('month', toDate('2021-01-31'), toDate('2021-02-28')) "
     "AS a", [(0,)]),
    ("SELECT age('month', toDate('2021-01-01'), toDate('2021-02-01')) "
     "AS a", [(1,)]),
    # deltaSum: sum of positive consecutive differences
    ("SELECT deltaSum(v) AS d FROM (SELECT arrayJoin([1, 3, 2, 4]) "
     "AS v)", [(4,)]),
    ("SELECT deltaSum(number) AS d FROM numbers(4)", [(3,)]),
    # minMap / maxMap
    ("SELECT minMap([1, 2], [v, 10 - v]).2 AS m FROM (SELECT "
     "arrayJoin([2, 5]) AS v)", [([2, 5],)]),
    ("SELECT maxMap([1, 2], [v, 10 - v]).2 AS m FROM (SELECT "
     "arrayJoin([2, 5]) AS v)", [([5, 8],)]),
    # hex/bin pad to the declared type's byte width
    ("SELECT hex(1) AS a, hex(255) AS b, hex(256) AS c",
     [('01', 'FF', '0100')]),
    ("SELECT bin(5) AS a", [('00000101',)]),
    ("SELECT hex('ab') AS a, unhex('6162') AS b", [('6162', 'ab')]),
    ("SELECT hex(toUInt32(1)) AS a", [('00000001',)]),
    ("SELECT hex(toInt8(-1)) AS a, bin(toInt8(-1)) AS b",
     [('FF', '11111111')]),
    ("SELECT hex(number) AS h FROM numbers(2) ORDER BY number",
     [('0000000000000000',), ('0000000000000001',)]),
    # char / ascii
    ("SELECT char(72, 101) AS a, ascii('A') AS b", [('He', 65)]),
    # toMonday / toStartOfWeek
    ("SELECT toString(toMonday(toDate('2024-03-14'))) AS a",
     [('2024-03-11',)]),
    ("SELECT toString(toStartOfWeek(toDate('2024-03-14'))) AS a",
     [('2024-03-10',)]),
    ("SELECT toString(toStartOfWeek(toDate('2024-03-14'), 1)) AS a",
     [('2024-03-11',)]),
    ("SELECT toString(toLastDayOfMonth(toDate('2024-02-05'))) AS a",
     [('2024-02-29',)]),
    # intervalLengthSum: union length of [start, end) segments
    ("SELECT intervalLengthSum(s, e) AS r FROM (SELECT "
     "arrayJoin([(1, 3), (2, 5), (7, 8)]) AS p, p.1 AS s, p.2 AS e)",
     [(5,)]),
    # boundingRatio: slope between leftmost and rightmost point
    ("SELECT boundingRatio(x, y) AS r FROM (SELECT arrayJoin("
     "[(1, 10.0), (3, 30.0)]) AS p, p.1 AS x, p.2 AS y)", [(10.0,)]),
    # repeat
    ("SELECT repeat('ab', 3) AS r", [('ababab',)]),
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
