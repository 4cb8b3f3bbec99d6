"""Round-7 sweep batch 28: interval-arithmetic edges (month-end clamp,
leap day), UTF8 family values, arrayEnumerate* values, encoding
round-trips (base58/base64/hex/bin), dateName/monthName, string
distances (editDistance/jaro*/ngram*), hasToken, bit tests, Julian day.
Expected values from published ClickHouse docs."""
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
    # interval arithmetic: CH clamps to month end (docs date-time-functions)
    ("SELECT addMonths(toDate('2024-01-31'), 1) AS x", "2024-02-29"),
    ("SELECT addMonths(toDate('2023-01-31'), 1) AS x", "2023-02-28"),
    ("SELECT addYears(toDate('2024-02-29'), 1) AS x", "2025-02-28"),
    ("SELECT toDate('2024-01-31') + INTERVAL 1 MONTH AS x", "2024-02-29"),
    ("SELECT toDate('2024-03-31') - INTERVAL 1 MONTH AS x", "2024-02-29"),
    ("SELECT addWeeks(toDate('2024-01-01'), 2) AS x", "2024-01-15"),
    ("SELECT addQuarters(toDate('2023-11-30'), 1) AS x", "2024-02-29"),
    ("SELECT subtractDays(toDate('2024-03-01'), 1) AS x", "2024-02-29"),
    ("SELECT toIntervalMonth(2) + toDate('2024-01-31') AS x", "2024-03-31"),
    ("SELECT addHours(toDateTime('2024-03-01 23:30:00'), 2) AS x",
     "2024-03-02 01:30:00"),
    # UTF8 family
    ("SELECT lengthUTF8('héllo') AS x", 5),
    ("SELECT length('héllo') AS x", 6),
    ("SELECT upperUTF8('münchen') AS x", "MÜNCHEN"),
    ("SELECT lowerUTF8('MÜNCHEN') AS x", "münchen"),
    ("SELECT substringUTF8('привет', 2, 3) AS x", "рив"),
    ("SELECT reverseUTF8('abc д') AS x", "д cba"),
    ("SELECT isValidUTF8('abc') AS x", 1),
    ("SELECT toValidUTF8('ok') AS x", "ok"),
    ("SELECT leftUTF8('привет', 3) AS x", "при"),
    ("SELECT rightUTF8('привет', 3) AS x", "вет"),
    # arrayEnumerate*
    ("SELECT arrayEnumerate([10,20,30]) AS x", [1, 2, 3]),
    ("SELECT arrayEnumerateUniq([10,20,10,30,10]) AS x", [1, 1, 2, 1, 3]),
    ("SELECT arrayEnumerateDense([10,20,10,30]) AS x", [1, 2, 1, 3]),
    # encodings round-trips
    ("SELECT base64Encode('clickhouse') AS x", "Y2xpY2tob3VzZQ=="),
    ("SELECT base64Decode('Y2xpY2tob3VzZQ==') AS x", "clickhouse"),
    ("SELECT tryBase64Decode('invalid!!') AS x", ""),
    ("SELECT base58Encode('Encoded') AS x", "3dc8KtHrwM"),
    ("SELECT base58Decode('3dc8KtHrwM') AS x", "Encoded"),
    ("SELECT unhex(hex('abc')) AS x", "abc"),
    ("SELECT unbin(bin('a')) AS x", "a"),
    ("SELECT hex('abc') AS x", "616263"),
    # dateName / monthName
    ("SELECT dateName('weekday', toDate('2024-02-29')) AS x", "Thursday"),
    ("SELECT dateName('month', toDate('2024-02-29')) AS x", "February"),
    ("SELECT dateName('year', toDate('2024-02-29')) AS x", "2024"),
    ("SELECT monthName(toDate('2024-02-29')) AS x", "February"),
    # string distances (CH docs examples)
    ("SELECT editDistance('clickhouse', 'mouse') AS x", 6),
    ("SELECT jaroSimilarity('stringdistance', 'srtingdistence') AS x",
     0.9010989010989011),
    ("SELECT jaroWinklerSimilarity('stringdistance', 'srtingdistence') AS x",
     0.910989010989011),
    ("SELECT stringJaccardIndex('clickhouse', 'mouse') AS x", 0.4),
    ("SELECT ngramDistance('ClickHouse', 'clickhouse') AS x",
     0.7142857142857143, "approx"),
    # hasToken
    ("SELECT hasToken('Hello World, Hello', 'Hello') AS x", 1),
    ("SELECT hasToken('Hello World', 'ello') AS x", 0),
    ("SELECT hasTokenCaseInsensitive('Hello World', 'hello') AS x", 1),
    # bit tests (CH docs: bitTest(43,1)=1 since 43=0b101011)
    ("SELECT bitTest(43, 1) AS x", 1),
    ("SELECT bitTest(43, 2) AS x", 0),
    ("SELECT bitTestAll(43, 0, 1, 3, 5) AS x", 1),
    ("SELECT bitTestAny(43, 4, 2) AS x", 0),
    # Julian day (docs: 2020-01-01 -> 58849)
    ("SELECT toModifiedJulianDay('2020-01-01') AS x", 58849),
    ("SELECT fromModifiedJulianDay(58849) AS x", "2020-01-01"),
    # countSubstrings / position case-insensitive
    ("SELECT countSubstrings('aaaa', 'aa') AS x", 2),
    ("SELECT positionCaseInsensitive('Hello World', 'world') AS x", 7),
    # soundex (docs: soundex('aksel') = 'A240')
    ("SELECT soundex('aksel') AS x", "A240"),
    # arrayPartialSort
    ("SELECT arrayPartialSort(2, [5,1,4,3,2]) AS x", [1, 2], "prefix2"),
]

ok = fail = 0
for case in CASES:
    sql, want = case[0], case[1]
    mode = case[2] if len(case) > 2 else None
    try:
        got = execute_sql(spark, sql, {}).collect()[0][0]
        if hasattr(got, "__iter__") and not isinstance(got, str):
            got = list(got)
        if isinstance(got, str) and hasattr(want, "strftime"):
            pass
        gs = str(got)
        if mode == "approx":
            good = abs(float(got) - float(want)) < 0.02
        elif mode == "prefix2":
            good = list(got)[:2] == want
        else:
            good = gs == str(want) or got == want
        if good:
            ok += 1
            print(f"ok   | {sql[:72]} -> {gs[:40]}")
        else:
            fail += 1
            print(f"DIVG | {sql[:72]} -> {gs[:60]} (want {want})")
    except Exception as e:
        fail += 1
        print(f"FAIL | {sql[:72]} -> {type(e).__name__}: "
              f"{str(e).splitlines()[0][:100]}")
print(f"== {ok} ok, {fail} divergent/fail")
