"""Round-7 sweep batch 4: Map functions, window-function edges,
aggregate edges (argMin/argMax/avgWeighted/entropy/sumCount/groupBit*),
string breadth (pad/translate/format/substringIndex), type conversions
(toUnixTimestamp/toStartOfInterval/date_add). (sql, expected or None)."""
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
    # --- maps ---
    ("SELECT mapKeys(map('a',1,'b',2)) AS k, "
     "mapValues(map('a',1,'b',2)) AS v", [((['a', 'b']), [1, 2])]),
    ("SELECT mapContains(map('a',1), 'a') AS y, "
     "mapContains(map('a',1), 'z') AS n", [(True, False)]),
    ("SELECT mapAdd(map(1,1), map(1,1)) AS r", None),
    ("SELECT mapSubtract(map(1,2), map(1,1)) AS r", None),
    ("SELECT mapPopulateSeries([1,2,4], [11,22,44], 5) AS r", None),
    ("SELECT mapFilter((k, v) -> v > 1, map('a',1,'b',2)) AS r", None),
    ("SELECT mapApply((k, v) -> (k, v * 2), map('a',1)) AS r", None),
    # --- window edges ---
    ("SELECT number, ntile(2) OVER (ORDER BY number) AS t "
     "FROM numbers(4) ORDER BY number",
     [(0, 1), (1, 1), (2, 2), (3, 2)]),
    ("SELECT number, nth_value(number, 2) OVER (ORDER BY number "
     "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS n "
     "FROM numbers(3) ORDER BY number", [(0, 1), (1, 1), (2, 1)]),
    ("SELECT number, dense_rank() OVER (ORDER BY number % 2) AS d "
     "FROM numbers(4) ORDER BY number",
     [(0, 1), (1, 2), (2, 1), (3, 2)]),
    ("SELECT number, round(percent_rank() OVER (ORDER BY number), 6) "
     "AS p FROM numbers(3) ORDER BY number",
     [(0, 0.0), (1, 0.5), (2, 1.0)]),
    ("SELECT number, round(cume_dist() OVER (ORDER BY number), 6) AS c "
     "FROM numbers(4) ORDER BY number", None),
    ("SELECT number, first_value(number) OVER (ORDER BY number DESC) "
     "AS f FROM numbers(3) ORDER BY number",
     [(0, 2), (1, 2), (2, 2)]),
    ("SELECT number, row_number() OVER (ORDER BY number DESC) AS r "
     "FROM numbers(3) ORDER BY number", [(0, 3), (1, 2), (2, 1)]),
    # --- aggregate edges ---
    ("SELECT argMax(number, number % 3) AS r FROM numbers(5)", [(2,)]),
    ("SELECT argMin(number, number % 3) AS r FROM numbers(5)", None),
    ("SELECT avgWeighted(x, w) AS r FROM "
     "(SELECT arrayJoin([(4,1),(1,0),(10,2)]) AS t, t.1 AS x, t.2 AS w)",
     [(8.0,)]),
    ("SELECT sumCount(number) AS r FROM numbers(4)", [((6, 4),)]),
    ("SELECT entropy(number % 2) AS r FROM numbers(4)", [(1.0,)]),
    ("SELECT entropy(number) AS r FROM numbers(4)", [(2.0,)]),
    ("SELECT groupBitAnd(x) AS a FROM (SELECT arrayJoin([7,3]) AS x)",
     [(3,)]),
    ("SELECT groupBitOr(x) AS a FROM (SELECT arrayJoin([1,2,4]) AS x)",
     [(7,)]),
    ("SELECT groupBitXor(x) AS a FROM (SELECT arrayJoin([1,2,4]) AS x)",
     [(7,)]),
    ("SELECT round(covarPop(x, x), 6) AS c FROM "
     "(SELECT arrayJoin([1,2,3]) AS x)", [(0.666667,)]),
    ("SELECT corr(x, x) AS c FROM (SELECT arrayJoin([1.0,2.0,3.0]) AS x)",
     [(1.0,)]),
    ("SELECT minMap(map(1, number)) AS r FROM numbers(3)", None),
    ("SELECT anyLast(number) AS r FROM numbers(5)", None),
    # --- arrays: enumerate family ---
    ("SELECT arrayEnumerate([10,20,30]) AS r", [([1, 2, 3],)]),
    ("SELECT arrayEnumerateDense([10,20,10,30]) AS r", [([1, 2, 1, 3],)]),
    ("SELECT arrayEnumerateUniq([10,20,10,30]) AS r", [([1, 1, 2, 1],)]),
    ("SELECT arrayDotProduct([1,2,3], [4,5,6]) AS r", [(32,)]),
    ("SELECT round(arrayJaccardIndex([1,2], [2,3]), 6) AS r",
     [(0.333333,)]),
    # --- string breadth ---
    ("SELECT leftPad('abc', 7, '*') AS a, rightPad('abc', 7, '*') AS b",
     [('****abc', 'abc****')]),
    ("SELECT leftPad('abc', 2) AS r", [('ab',)]),
    ("SELECT substringIndex('www.clickhouse.com', '.', 2) AS r",
     [('www.clickhouse',)]),
    ("SELECT substringIndex('www.clickhouse.com', '.', -2) AS r",
     [('clickhouse.com',)]),
    ("SELECT translate('Hello, World!', 'delor', 'DELOR') AS r",
     [('HELLO, WORLD!',)]),
    ("SELECT initcap('hello world') AS r", [('Hello World',)]),
    ("SELECT repeat('ab', 3) AS a, space(3) AS b", [('ababab', '   ')]),
    ("SELECT format('{1} {0}', 'World', 'Hello') AS r",
     [('Hello World',)]),
    ("SELECT format('{} {}', 'Hello', 'World') AS r", [('Hello World',)]),
    ("SELECT reverseUTF8('привет') AS r", [('тевирп',)]),
    ("SELECT trim(BOTH 'x' FROM 'xxfooxx') AS r", [('foo',)]),
    ("SELECT concatWithSeparator(',', 'a', 'b') AS r", [('a,b',)]),
    ("SELECT tryBase64Decode('invalid!') AS r", [('',)]),
    ("SELECT stringJaccardIndex('clickhouse', 'mouse') AS r", [(0.4,)]),
    # --- type conversions / datetime ---
    ("SELECT toUnixTimestamp(toDateTime('2017-11-05 08:07:47')) AS r",
     [(1509869267,)]),
    ("SELECT toString(fromUnixTimestamp(423543535)) AS r",
     [('1983-06-04 02:58:55',)]),
    ("SELECT toString(toStartOfInterval(toDateTime("
     "'2023-01-05 14:17:30'), INTERVAL 15 MINUTE)) AS r",
     [('2023-01-05 14:15:00',)]),
    ("SELECT toString(toStartOfInterval(toDate('2023-01-05'), "
     "INTERVAL 1 MONTH)) AS r", [('2023-01-01',)]),
    ("SELECT toString(date_add(YEAR, 3, toDate('2018-01-01'))) AS r",
     [('2021-01-01',)]),
    ("SELECT toString(date_sub(YEAR, 3, toDate('2018-01-01'))) AS r",
     [('2015-01-01',)]),
    ("SELECT toModifiedJulianDay('2020-01-01') AS r", [(58849,)]),
    ("SELECT toFixedString('foo', 8) AS r", None),
    ("SELECT toTypeName(toDecimal32('1.55', 2)) AS r", None),
    ("SELECT toDecimal32('1.55', 2) = 1.55 AS r", None),
    ("SELECT accurateCastOrNull(257, 'UInt8') AS r", None),
    ("SELECT accurateCastOrNull(5, 'UInt8') AS r", [(5,)]),
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
