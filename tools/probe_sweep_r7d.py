"""Round-7 sweep batch 5: NULL propagation, OrNull/OrZero conversion
breadth, parseDateTime*, range/arrayWithConstant, array HOF firsts,
moving-window aggregates, uniqUpTo, arrayROCAUC, interval arithmetic,
toStartOf* subhour. (sql, expected or None)."""
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
    # --- NULL propagation ---
    ("SELECT 1 + NULL AS r", [(None,)]),
    ("SELECT concat('a', NULL) AS r", [(None,)]),
    ("SELECT isNull(NULL + 1) AS r", [(True,)]),
    ("SELECT NULL = NULL AS r", [(None,)]),
    ("SELECT NULL IS NULL AS r", [(True,)]),
    # --- OrNull / OrZero conversions ---
    ("SELECT toInt32OrNull('abc') AS a, toInt32OrNull('42') AS b",
     [(None, 42)]),
    ("SELECT toInt32OrZero('abc') AS a, toInt32OrZero('-7') AS b",
     [(0, -7)]),
    ("SELECT toFloat64OrNull('1e3') AS r", [(1000.0,)]),
    ("SELECT toDateOrNull('junk') AS r", [(None,)]),
    ("SELECT toString(toDateOrZero('junk')) AS r", [('1970-01-01',)]),
    ("SELECT toUInt8OrNull('256') AS a, toUInt8OrNull('-1') AS b, toUInt8OrNull('7') AS c", [(None, None, 7)]),
    # --- parseDateTime ---
    ("SELECT toString(parseDateTimeBestEffort("
     "'2018-12-12 10:12:12')) AS r", [('2018-12-12 10:12:12',)]),
    ("SELECT parseDateTimeBestEffortOrNull('junk') AS r", [(None,)]),
    ("SELECT toString(parseDateTime('2021-01-04+23:00:00', "
     "'%Y-%m-%d+%H:%i:%s')) AS r", [('2021-01-04 23:00:00',)]),
    ("SELECT toString(parseDateTimeBestEffort('12/12/2020')) AS r",
     None),
    # --- range / constants ---
    ("SELECT range(5) AS r", [([0, 1, 2, 3, 4],)]),
    ("SELECT range(2, 5) AS r", [([2, 3, 4],)]),
    ("SELECT range(0, 10, 3) AS r", [([0, 3, 6, 9],)]),
    ("SELECT arrayWithConstant(3, 'x') AS r", [((['x', 'x', 'x']),)]),
    ("SELECT emptyArrayUInt8() AS r", [([],)]),
    ("SELECT emptyArrayToSingle(emptyArrayUInt8()) AS r", [([0],)]),
    ("SELECT number FROM numbers(2, 3) ORDER BY number",
     [(2,), (3,), (4,)]),
    # --- array HOF firsts ---
    ("SELECT arrayFirst(x -> x > 1, [1,2,3]) AS a, "
     "arrayFirstIndex(x -> x > 1, [1,2,3]) AS b, "
     "arrayLast(x -> x > 1, [1,2,3]) AS c, "
     "arrayLastIndex(x -> x > 1, [1,2,3]) AS d", [(2, 2, 3, 3)]),
    ("SELECT arrayCount(x -> x % 2, [1,2,3]) AS r", [(2,)]),
    ("SELECT round(arrayAvg([1,2,4]), 6) AS a, arrayMin([3,1,2]) AS b, "
     "arrayMax([3,1,2]) AS c", [(2.333333, 1, 3)]),
    ("SELECT arraySplit((x, y) -> y, [1,2,3,4,5], [1,0,0,1,0]) AS r",
     [([[1, 2, 3], [4, 5]],)]),
    # --- moving / capped aggregates ---
    ("SELECT groupArrayMovingSum(2)(x) AS r FROM "
     "(SELECT arrayJoin([1,2,3,4]) AS x)", [([1, 3, 5, 7],)]),
    ("SELECT groupArrayMovingAvg(2)(x) AS r FROM "
     "(SELECT arrayJoin([2.0,4.0,6.0,8.0]) AS x)", None),
    ("SELECT uniqUpTo(2)(x) AS r FROM (SELECT arrayJoin([1,2,3]) AS x)",
     [(3,)]),
    ("SELECT uniqUpTo(2)(x) AS r FROM (SELECT arrayJoin([1,2]) AS x)",
     [(2,)]),
    ("SELECT arrayROCAUC([0.1, 0.4, 0.35, 0.8], [0, 0, 1, 1]) AS r",
     [(0.75,)]),
    # --- interval arithmetic ---
    ("SELECT toString(toDate('2020-01-01') + INTERVAL 1 MONTH) AS r",
     [('2020-02-01',)]),
    ("SELECT toString(toDate('2020-03-31') - INTERVAL 1 MONTH) AS r",
     [('2020-02-29',)]),
    ("SELECT toString(toDate('2020-01-01') + toIntervalDay(5)) AS r",
     [('2020-01-06',)]),
    ("SELECT toString(toDateTime('2020-01-01 00:00:00') "
     "+ INTERVAL 90 SECOND) AS r", [('2020-01-01 00:01:30',)]),
    # --- toStartOf* subhour ---
    ("SELECT toString(toStartOfFifteenMinutes(toDateTime("
     "'2023-04-21 10:20:00'))) AS r", [('2023-04-21 10:15:00',)]),
    ("SELECT toString(toStartOfTenMinutes(toDateTime("
     "'2023-04-21 10:23:00'))) AS r", [('2023-04-21 10:20:00',)]),
    ("SELECT toString(toStartOfFiveMinutes(toDateTime("
     "'2023-04-21 10:23:00'))) AS r", [('2023-04-21 10:20:00',)]),
    ("SELECT toString(toStartOfHour(toDateTime("
     "'2023-04-21 10:20:30'))) AS r", [('2023-04-21 10:00:00',)]),
    # --- regex / ngram ---
    ("SELECT regexpExtract('100-200', '(\\\\d+)-(\\\\d+)', 1) AS r",
     [('100',)]),
    ("SELECT round(ngramDistance('ClickHouse', 'House'), 2) AS r", None),
    ("SELECT encodeURLComponent('a b&c') AS r", [('a%20b%26c',)]),
    ("SELECT decodeURLComponent(encodeURLComponent('a b&c=d/e')) AS r",
     [('a b&c=d/e',)]),
]

npass = nfail = nprint = 0
for sql, expected in PROBES:
    try:
        rows = [tuple(r) for r in
                execute_sql(spark, sql, {}).limit(6).collect()]
        if expected is None:
            print(f"PRNT | {sql!r} -> {rows}")
            nprint += 1
        elif rows == expected:
            npass += 1
        else:
            print(f"DIFF | {sql!r} -> {rows} (expected {expected})")
            nfail += 1
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"FAIL | {sql!r} -> {type(e).__name__}: {msg}")
        nfail += 1
print(f"\n{npass} pass, {nfail} diff/fail, {nprint} printed")
