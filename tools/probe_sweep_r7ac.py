"""Round-7 sweep batch 32: window-fn breadth (ntile/percent_rank/
cume_dist/nth_value), moment aggregates (skew/kurt values), interval
aggregates (boundingRatio/intervalLengthSum/maxIntersections),
sumCount, toStartOf* minute buckets, toTime, snowflake converters,
array utils (zip/flatten/compact/jaccard), Unix64 converters, t-tests.
Doc-contract values from published CH docs; moments cross-checked with
numpy."""
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

CASES = [
    # window breadth over numbers(6)
    ("SELECT groupArray(nt) AS x FROM (SELECT ntile(3) OVER "
     "(ORDER BY number) AS nt FROM numbers(6))", [1, 1, 2, 2, 3, 3]),
    ("SELECT round(max(pr), 4) AS x FROM (SELECT percent_rank() OVER "
     "(ORDER BY number) AS pr FROM numbers(5))", 1.0),
    ("SELECT round(min(cd), 4) AS x FROM (SELECT cume_dist() OVER "
     "(ORDER BY number) AS cd FROM numbers(5))", 0.2),
    ("SELECT groupArray(nv) AS x FROM (SELECT nth_value(number, 2) "
     "OVER (ORDER BY number ROWS BETWEEN UNBOUNDED PRECEDING AND "
     "UNBOUNDED FOLLOWING) AS nv FROM numbers(3))", [1, 1, 1]),
    # moments: data [1,2,3,4,10]; numpy skew/kurt population values
    ("SELECT round(skewPop(x), 6) AS s FROM (SELECT "
     "arrayJoin([1, 2, 3, 4, 10]) AS x)", 1.138420, "approx6"),
    ("SELECT round(kurtPop(x), 6) AS k FROM (SELECT "
     "arrayJoin([1, 2, 3, 4, 10]) AS x)", 2.788000, "approx6"),
    # sumCount
    ("SELECT toString(sumCount(x)) AS x FROM (SELECT "
     "arrayJoin([1, 2, 3]) AS x)", "(6,3)"),
    # intervalLengthSum (docs example: segments [1.1,2.9],[2.5,3.2],
    # [4,4] -> 2.1)
    ("SELECT round(intervalLengthSum(s, e), 1) AS x FROM (SELECT "
     "arrayJoin([(1.1, 2.9), (2.5, 3.2), (4.0, 4.0)]) AS seg, "
     "seg.1 AS s, seg.2 AS e)", 2.1),
    # maxIntersections (docs: [1,4],[2,5],[3,6] -> 3 overlap at 3..4)
    ("SELECT maxIntersections(s, e) AS x FROM (SELECT "
     "arrayJoin([(1, 4), (2, 5), (3, 6)]) AS seg, seg.1 AS s, "
     "seg.2 AS e)", 3),
    # boundingRatio: (last_y - first_y)/(last_x - first_x) over points
    ("SELECT boundingRatio(number, number * 1.5) AS x "
     "FROM numbers(10)", 1.5),
    # minute buckets + toTime
    ("SELECT toStartOfFifteenMinutes(toDateTime("
     "'2023-04-21 10:23:00')) AS x", "2023-04-21 10:15:00"),
    ("SELECT toStartOfTenMinutes(toDateTime('2023-04-21 10:23:00')) "
     "AS x", "2023-04-21 10:20:00"),
    ("SELECT toStartOfFiveMinutes(toDateTime('2023-04-21 10:23:00')) "
     "AS x", "2023-04-21 10:20:00"),
    ("SELECT toTime(toDateTime('2014-10-24 21:12:09')) AS x",
     "1970-01-02 21:12:09"),
    # snowflake round trip (docs: dateTime 2021-08-15 18:57:56 <->
    # 1426860702823350272)
    # docs example is tz Asia/Shanghai; the same instant in UTC:
    ("SELECT dateTimeToSnowflake(toDateTime('2021-08-15 10:57:56')) "
     "AS x", 1426860702823350272),
    ("SELECT snowflakeToDateTime(1426860702823350272) AS x",
     "2021-08-15 10:57:56"),
    # array utils
    ("SELECT arrayZip([1, 2], ['a', 'b']) AS x", None, "info"),
    ("SELECT arrayFlatten([[[1]], [[2], [3]]]) AS x", [1, 2, 3]),
    ("SELECT arrayCompact([1, 1, 2, 2, 1]) AS x", [1, 2, 1]),
    ("SELECT round(arrayJaccardIndex([1, 2], [2, 3]), 4) AS x",
     0.3333, "approx"),
    ("SELECT countEqual([1, 2, NULL, NULL], NULL) AS x", 2),
    # Unix64 round trip
    ("SELECT toUnixTimestamp64Milli(toDateTime64("
     "'2009-02-13 23:31:31.011', 3)) AS x", 1234567891011),
    ("SELECT toString(fromUnixTimestamp64Milli(1234567891011)) AS x",
     "2009-02-13 23:31:31.011"),
    # t-tests return (stat, p) tuples; check the statistic sign/shape
    ("SELECT toString(roundBankers(tupleElement(studentTTest(v, g), 1)"
     ", 2)) AS x FROM (SELECT arrayJoin([(20.3, 0), (21.1, 0), "
     "(21.9, 0), (21.7, 1), (19.9, 1), (21.8, 1)]) AS p, p.1 AS v, "
     "toUInt8(p.2) AS g)", None, "info"),
]

ok = fail = 0
for case in CASES:
    sql, want = case[0], case[1]
    mode = case[2] if len(case) > 2 else None
    try:
        got = execute_sql(spark, sql, {}).collect()[0][0]
        if hasattr(got, "__iter__") and not isinstance(got, str):
            got = list(got)
        gs = str(got)
        if mode == "info":
            print(f"INFO | {sql[:68]} -> {gs[:52]}")
            continue
        if mode == "approx":
            good = abs(float(got) - float(want)) < 1e-3
        elif mode == "approx6":
            good = abs(float(got) - float(want)) < 2e-6
        else:
            good = gs == str(want) or got == want
        if good:
            ok += 1
            print(f"ok   | {sql[:68]} -> {gs[:44]}")
        else:
            fail += 1
            print(f"DIVG | {sql[:68]} -> {gs[:56]} (want {want})")
    except Exception as e:
        fail += 1
        print(f"FAIL | {sql[:68]} -> {type(e).__name__}: "
              f"{str(e).splitlines()[0][:100]}")
print(f"== {ok} ok, {fail} divergent/fail")
