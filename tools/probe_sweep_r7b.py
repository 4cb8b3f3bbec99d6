"""Round-7 sweep batch 3: published CH doc-contract values for families
not covered by batches 1-2 — JSON extraction, string search
(position/multiSearch/countSubstrings), conditionals (transform/nullIf),
array breadth, bit tests, math edges, geo. (sql, expected or None)."""
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
    # --- JSON (docs: functions/json-functions) ---
    ("""SELECT JSONExtractInt('{"a": 300}', 'a') AS r""", [(300,)]),
    ("""SELECT JSONExtractString('{"a": "hello"}', 'a') AS r""",
     [('hello',)]),
    ("""SELECT JSONExtractFloat('{"a": 3.5}', 'a') AS r""", [(3.5,)]),
    ("""SELECT JSONExtractBool('{"a": true}', 'a') AS r""", None),
    ("""SELECT JSONHas('{"a": 1}', 'a') AS y, JSONHas('{"a":1}', 'b') AS n""",
     None),
    ("""SELECT JSONLength('[1,2,3]') AS a, JSONLength('{"a":1,"b":2}') AS b""",
     [(3, 2)]),
    ("""SELECT JSONType('{"a":1}') AS a, JSONType('[1]') AS b,
        JSONType('"s"') AS c""", [('Object', 'Array', 'String')]),
    ("""SELECT JSONExtractKeys('{"a":1,"b":2}') AS r""", [(['a', 'b'],)]),
    ("""SELECT JSONExtractRaw('{"a":{"b":1}}', 'a') AS r""",
     [('{"b":1}',)]),
    ("""SELECT JSONExtractArrayRaw('[1,"a",{"b":1}]') AS r""",
     [(['1', '"a"', '{"b":1}'],)]),
    ("""SELECT simpleJSONExtractInt('{"a": 300}', 'a') AS r""", [(300,)]),
    ("""SELECT simpleJSONExtractString('{"a": "hi"}', 'a') AS r""",
     [('hi',)]),
    ("""SELECT simpleJSONHas('{"a": 1}', 'a') AS r""", None),
    ("""SELECT JSONExtract('{"a": 42}', 'a', 'Int64') AS r""", [(42,)]),
    ("""SELECT JSONExtractInt('{"a": {"b": 7}}', 'a', 'b') AS r""", [(7,)]),
    ("""SELECT JSONExtractInt('[10, 20]', 2) AS r""", [(20,)]),
    ("""SELECT JSONExtractInt('[10, 20]', -1) AS r""", [(20,)]),
    # --- string search ---
    ("SELECT position('Hello, world!', 'l') AS r", [(3,)]),
    ("SELECT position('Hello', 'x') AS r", [(0,)]),
    ("SELECT positionCaseInsensitive('Hello', 'L') AS r", [(3,)]),
    ("SELECT positionUTF8('привет', 'в') AS r", [(4,)]),
    ("SELECT multiSearchAny('Hello', ['e', 'x']) AS r", [(True,)]),
    ("SELECT multiSearchAny('Hello', ['q', 'x']) AS r", [(False,)]),
    ("SELECT multiSearchFirstIndex('Hello World', ['xx', 'Wo']) AS r",
     [(2,)]),
    ("SELECT multiSearchFirstIndex('Hello', ['xx', 'yy']) AS r", [(0,)]),
    ("SELECT multiSearchAllPositions('Hello, World', "
     "['Hello', ',', 'World']) AS r", [([1, 6, 8],)]),
    ("SELECT multiSearchFirstPosition('Hello World', ['or', 'ld', 'Wo']) "
     "AS r", None),
    ("SELECT countSubstrings('aaaa', 'aa') AS r", [(2,)]),
    ("SELECT countSubstrings('foobar.com', '.') AS r", [(1,)]),
    ("SELECT countMatches('aaaa', 'aa') AS r", [(2,)]),
    ("SELECT locate('l', 'Hello') AS r", None),
    ("SELECT extract('Hello123World', '[0-9]+') AS r", [('123',)]),
    ("SELECT extractAll('a1b2c3', '[0-9]') AS r", [(['1', '2', '3'],)]),
    ("SELECT extractGroups('hello abc=111', '([a-z]+)=([0-9]+)') AS r",
     [(['abc', '111'],)]),
    # --- conditionals ---
    ("SELECT transform(2, [1,2,3], ['a','b','c'], 'd') AS r", [('b',)]),
    ("SELECT transform(4, [1,2,3], ['a','b','c'], 'd') AS r", [('d',)]),
    ("SELECT transform(4, [1,2], [10,20]) AS r", [(4,)]),
    ("SELECT nullIf(1, 1) AS a, nullIf(1, 2) AS b", [(None, 1)]),
    ("SELECT ifNull(NULL, 2) AS a, coalesce(NULL, NULL, 3) AS b",
     [(2, 3)]),
    ("SELECT assumeNotNull(toNullable(5)) AS r", [(5,)]),
    # --- arrays ---
    ("SELECT arrayZip(['a','b'], [1,2]) AS r", [([('a', 1), ('b', 2)],)]),
    ("SELECT arrayCompact([1,1,2,2,1]) AS r", [([1, 2, 1],)]),
    ("SELECT arrayUniq([1,1,2]) AS r", [(2,)]),
    ("SELECT arrayFlatten([[1,2],[3]]) AS r", [([1, 2, 3],)]),
    ("SELECT arrayResize([1,2,3], 2) AS a, arrayResize([1,2,3], 4) AS b",
     [(([1, 2]), [1, 2, 3, 0])]),
    ("SELECT arrayStringConcat(['a','b'], '-') AS r", [('a-b',)]),
    ("SELECT indexOf([1,3,NULL,NULL], NULL) AS r", [(3,)]),
    ("SELECT countEqual([1,2,NULL,NULL], NULL) AS r", [(2,)]),
    ("SELECT arrayCumSumNonNegative([1,1,-4,1]) AS r", [([1, 2, 0, 1],)]),
    ("SELECT arrayPushBack([1], 2) AS a, arrayPopFront([1,2]) AS b",
     [(([1, 2]), [2])]),
    ("SELECT arrayFill(x -> not(isNull(x)), [1, NULL, 2, NULL]) AS r",
     [([1, 1, 2, 2],)]),
    ("SELECT arrayIntersect([1,2,3], [2,3,4]) AS r", None),
    ("SELECT hasAll([1,2,3], [1,2]) AS a, hasAny([1,2], [3,4]) AS b",
     [(True, False)]),
    # --- bit ---
    ("SELECT bitTest(43, 1) AS a, bitTest(43, 2) AS b", [(1, 0)]),
    ("SELECT bitTestAll(43, 0, 1, 3, 5) AS r", [(1,)]),
    ("SELECT bitTestAny(43, 2, 4) AS r", [(0,)]),
    ("SELECT bitHammingDistance(111, 121) AS r", [(3,)]),
    ("SELECT bitmaskToList(50) AS r", [('2,16,32',)]),
    ("SELECT bitmaskToArray(50) AS r", [([2, 16, 32],)]),
    # --- math edges ---
    ("SELECT intExp2(3) AS a, intExp10(2) AS b", [(8, 100)]),
    ("SELECT exp2(3.0) AS a, log2(8.0) AS b", [(8.0, 3.0)]),
    ("SELECT pow(2, 10) AS r", [(1024.0,)]),
    ("SELECT sign(-5) AS a, sign(0) AS b, sign(7) AS c", [(-1, 0, 1)]),
    ("SELECT factorial(5) AS r", [(120,)]),
    ("SELECT cbrt(27.0) AS r", [(3.0,)]),
    ("SELECT hypot(3.0, 4.0) AS r", [(5.0,)]),
    ("SELECT degrees(pi()) AS r", [(180.0,)]),
    ("SELECT char(104, 101, 108, 108, 111) AS r", [('hello',)]),
    ("SELECT ascii('A') AS r", [(65,)]),
    # --- date extras ---
    ("SELECT toQuarter(toDate('2023-05-05')) AS r", [(2,)]),
    ("SELECT toISOWeek(toDate('2017-01-01')) AS a, "
     "toISOYear(toDate('2017-01-01')) AS b", [(52, 2016)]),
    ("SELECT monthName(toDate('2021-04-14')) AS r", [('April',)]),
    ("SELECT toString(toLastDayOfMonth(toDate('2023-02-10'))) AS r",
     [('2023-02-28',)]),
    ("SELECT toString(timeSlot(toDateTime('2000-01-02 03:23:00'))) AS r",
     [('2000-01-02 03:00:00',)]),
    # --- geo ---
    ("SELECT round(greatCircleDistance(55.755831, 37.617673, "
     "-55.755831, -137.617673), -4) AS r", None),
    ("SELECT geohashEncode(-5.60302734375, 42.593994140625) AS r", None),
    ("SELECT geohashDecode('ezs42') AS r", None),
    # --- tuple ---
    ("SELECT tupleHammingDistance((1,2,3), (3,2,1)) AS r", [(2,)]),
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
