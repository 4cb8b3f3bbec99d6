"""Round-7 sweep batch 8: toRelative*Num family, timeSlots, makeDate
forms, YYYYMMDD codecs, map mutation (mapUpdate/mapConcat/mapExists),
vector norms & normalize, tuple math, snowflake ids, bitSlice,
regexpQuoteMeta. (sql, expected|None)"""
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
    # --- toRelative*Num (epoch-anchored counters) ---
    ("SELECT toRelativeDayNum(toDate('1970-01-03')) AS r", [(2,)]),
    ("SELECT toRelativeHourNum(toDateTime('1970-01-02 00:00:00')) AS r",
     [(24,)]),
    ("SELECT toRelativeMinuteNum(toDateTime('1970-01-01 01:30:00')) "
     "AS r", [(90,)]),
    ("SELECT toRelativeSecondNum(toDateTime('1970-01-01 00:02:00')) "
     "AS r", [(120,)]),
    ("SELECT toRelativeMonthNum(toDate('1970-03-01')) AS r", None),
    ("SELECT toRelativeWeekNum(toDate('1970-01-15')) AS r", None),
    # --- timeSlots ---
    ("SELECT arrayMap(x -> toString(x), timeSlots(toDateTime("
     "'2012-01-01 12:20:00'), toUInt32(600))) AS r",
     [((['2012-01-01 12:00:00', '2012-01-01 12:30:00']),)]),
    # --- makeDate / YYYYMMDD ---
    ("SELECT toString(makeDate(2023, 2, 28)) AS r", [('2023-02-28',)]),
    ("SELECT toString(makeDate(2023, 42)) AS r", [('2023-02-11',)]),
    ("SELECT toString(makeDateTime(2023, 2, 28, 17, 12, 33)) AS r",
     [('2023-02-28 17:12:33',)]),
    ("SELECT toString(YYYYMMDDToDate(20230911)) AS r",
     [('2023-09-11',)]),
    ("SELECT toYYYYMMDDhhmmss(toDateTime('2023-09-11 12:13:14')) AS r",
     [(20230911121314,)]),
    ("SELECT toDaysSinceYearZero(toDate('2023-09-08')) AS r",
     [(739136,)]),
    # --- map mutation ---
    ("SELECT mapUpdate(map('k1',1,'k2',2), map('k1',0)) AS r",
     [({'k1': 0, 'k2': 2},)]),
    ("SELECT mapConcat(map('a',1), map('b',2)) AS r",
     [({'a': 1, 'b': 2},)]),
    ("SELECT mapExists((k, v) -> v > 1, map('a',1,'b',2)) AS y, "
     "mapExists((k, v) -> v > 9, map('a',1)) AS n", [(True, False)]),
    ("SELECT mapAll((k, v) -> v > 0, map('a',1,'b',2)) AS r",
     [(True,)]),
    ("SELECT mapSort((k, v) -> k, map('b',2,'a',1)) AS r", None),
    ("SELECT mapSort(map('b',2,'a',1)) AS r", None),
    ("SELECT mapSort((k, v) -> v, map('a',3,'b',1)) AS r", None),
    # --- norms / normalize ---
    ("SELECT L1Norm([1,-2]) AS a, L2Norm([3.0,4.0]) AS b, "
     "LinfNorm([1,-5]) AS c", [(3, 5.0, 5.0)]),
    ("SELECT round(LpNorm([1.0,2.0], 2), 6) AS r", [(2.236068,)]),
    ("SELECT L2Normalize([3.0, 4.0]) AS r", [(([0.6, 0.8]),)]),
    ("SELECT L1Distance([1,2],[2,3]) AS r", [(2,)]),
    # --- tuple math ---
    ("SELECT tupleNegate((1, 2)) AS r", None),
    ("SELECT tupleMultiplyByNumber((1, 2), 2) AS r", None),
    ("SELECT dotProduct((1, 2), (3, 4)) AS r", [(11,)]),
    ("SELECT dotProduct([1, 2], [3, 4]) AS r", [(11,)]),
    # --- snowflake ids ---
    ("SELECT dateTimeToSnowflake(toDateTime('2021-08-15 18:57:56')) "
     "AS r", None),
    ("SELECT toString(snowflakeToDateTime(dateTimeToSnowflake("
     "toDateTime('2021-08-15 18:57:56')))) AS r",
     [('2021-08-15 18:57:56',)]),
    # --- bitSlice / regexpQuoteMeta ---
    ("SELECT bitSlice('Hello', 1, 8) AS r", [('H',)]),
    ("SELECT regexpQuoteMeta('a.b?c') AS r", None),
    ("SELECT countSubstringsCaseInsensitive('AAaa', 'aa') AS r",
     [(2,)]),
    # --- misc ---
    ("SELECT toString(toLastDayOfWeek(toDate('2024-01-03'))) AS r",
     None),
    ("SELECT toString(toFirstDayOfMonth(toDate('2024-01-15'))) AS r",
     None),
    ("SELECT lengthUTF8('привет') AS a, upperUTF8('привет') AS b",
     None),
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
