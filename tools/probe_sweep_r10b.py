"""Round-10 probe sweep B: mutation matrix edges, FINAL×mutations,
INSERT SELECT column ordering, CAST edge cases, more date/string
contracts — diffed against published CH behavior by inspection."""
import os

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
from clickhouse_from_scratch_spark.session import get_spark  # noqa: E402
from clickhouse_from_scratch_spark.ddl import ChSession  # noqa: E402

spark = get_spark()
eng = ChSession(spark)


def run(tag, sql):
    try:
        df = eng.execute(sql)
        out = [tuple(r) for r in df.collect()] if df is not None else "ok"
        print(f"{tag}: {out}")
    except Exception as e:
        print(f"{tag}: ERR {type(e).__name__}: {e}")


# ALTER UPDATE of the partition/order key must be rejected (CH contract:
# "Cannot UPDATE key column")
run("m1a", "CREATE TABLE mk (p UInt8, k UInt32, v UInt32) "
    "ENGINE = MergeTree PARTITION BY p ORDER BY k")
run("m1b", "INSERT INTO mk VALUES (1, 1, 10)")
run("m1c", "ALTER TABLE mk UPDATE k = 5 WHERE 1")
run("m1d", "ALTER TABLE mk UPDATE p = 5 WHERE 1")
# UPDATE with expression referencing other columns (pre-mutation values)
run("m2a", "CREATE TABLE sw (a UInt32, b UInt32) ENGINE = MergeTree ORDER BY a")
run("m2b", "INSERT INTO sw VALUES (1, 100)")
run("m2c", "ALTER TABLE sw UPDATE a = b, b = a WHERE 1")
run("m2d", "SELECT a, b FROM sw")     # CH: swap -> (100, 1)
# DELETE everything then insert again
run("m3a", "ALTER TABLE sw DELETE WHERE 1")
run("m3b", "SELECT count() AS c FROM sw")
# INSERT SELECT with column list reorders
run("i1a", "CREATE TABLE co (a UInt32, b String) ENGINE = Memory")
run("i1b", "INSERT INTO co (b, a) SELECT 'x', 7")
run("i1c", "SELECT a, b FROM co")
# INSERT with missing columns -> defaults
run("i2a", "CREATE TABLE dm (a UInt32, b String DEFAULT 'dd', "
    "c UInt32 DEFAULT a * 2) ENGINE = Memory")
run("i2b", "INSERT INTO dm (a) VALUES (21)")
run("i2c", "SELECT a, b, c FROM dm")
# CAST edges
run("c1", "SELECT toUInt8(256) AS a, toUInt8(-1) AS b, toInt8(128) AS c")
run("c2", "SELECT toUInt8OrNull('256') AS a, toUInt8OrZero('999') AS b")
run("c3", "SELECT CAST(1.99 AS UInt8) AS a, CAST(-0.5 AS Int8) AS b")
run("c4", "SELECT toDate('2149-07-00') AS d")
run("c5", "SELECT toDateOrNull('xx') AS a, toDateTimeOrZero('bad') AS b")
run("c6", "SELECT toFixedString('ab', 4) AS f, length(toFixedString('ab', 4)) AS l")
# accurateCast
run("c7", "SELECT accurateCastOrNull(300, 'UInt8') AS a, "
    "accurateCastOrNull(12, 'UInt8') AS b")
# string functions
run("s1", "SELECT trimBoth('  x  ') AS a, trimLeft(' x ') AS b")
run("s2", "SELECT concatWithSeparator('-', 'a', 'b') AS a, "
    "concat_ws(',', 'x', 'y') AS b")
run("s3", "SELECT base64Encode('abc') AS a, base64Decode('YWJj') AS b, "
    "tryBase64Decode('###') AS c")
run("s4", "SELECT reverse('abc') AS a, reverse([1,2,3]) AS b")
run("s5", "SELECT format('{} and {}', 'a', 'b') AS f, "
    "format('{1}-{0}', 'a', 'b') AS g")
run("s6", "SELECT hex(255) AS a, unhex('616263') AS b, bin(5) AS c")
# date diff / add edge
run("d1", "SELECT dateDiff('month', toDate('2024-01-31'), "
    "toDate('2024-03-01')) AS m, dateDiff('year', "
    "toDate('2023-12-31'), toDate('2024-01-01')) AS y")
run("d2", "SELECT age('month', toDate('2024-01-31'), "
    "toDate('2024-03-01')) AS m, age('year', toDate('2023-06-01'), "
    "toDate('2024-05-31')) AS y")
run("d3", "SELECT addMonths(toDate('2024-01-31'), 1) AS a, "
    "subtractDays(toDate('2024-01-01'), 1) AS b")
run("d4", "SELECT toUnixTimestamp(toDateTime('1970-01-02 00:00:00')) AS u, "
    "fromUnixTimestamp(86400) AS d")
run("d5", "SELECT toYYYYMMDD(toDate('2024-05-07')) AS a, "
    "toYYYYMMDDhhmmss(toDateTime('2024-05-07 01:02:03')) AS b")
# map functions
run("p1", "SELECT map('a', 1, 'b', 2) AS m, mapKeys(map('a', 1)) AS k, "
    "mapValues(map('a', 1)) AS v")
run("p2", "SELECT mapContains(map('a', 1), 'a') AS c, "
    "map('a', 1)['a'] AS g, map('a', 1)['zz'] AS miss")
run("p3", "SELECT mapFilter((k, v) -> v > 1, map('a', 1, 'b', 2)) AS f")
# JSON functions
run("j1", "SELECT JSONExtractString('{\"a\":\"x\"}', 'a') AS a, "
    "JSONExtractInt('{\"n\": 42}', 'n') AS n")
run("j2", "SELECT JSONHas('{\"a\":1}', 'a') AS h, "
    "JSONLength('[1,2,3]') AS l, JSONType('{\"a\":1}', 'a') AS t")
run("j3", "SELECT JSONExtractKeysAndValues('{\"a\":5,\"b\":7}', 'Int64') AS kv")
run("j4", "SELECT simpleJSONExtractInt('{\"a\":3}', 'a') AS i, "
    "visitParamExtractString('{\"s\":\"t\"}', 's') AS s")
# nullable arithmetic
run("n1", "SELECT NULL + 1 AS a, NULL = NULL AS b, NULL != 1 AS c")
run("n2", "SELECT coalesce(NULL, NULL, 3) AS a, ifNull(NULL, 9) AS b, "
    "nullIf(5, 5) AS c, assumeNotNull(toNullable(4)) AS d")
run("n3", "SELECT isNull(NULL) AS a, isNotNull(1) AS b, "
    "isNaN(0/0) AS c, isFinite(1/0) AS d, isInfinite(1/0) AS e")
