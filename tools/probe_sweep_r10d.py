"""Round-10 probe sweep D: DateTime64 scale, Enum round-trips,
parametric precision args, dict function edges, numbers() forms,
interval chains, format-ish string edges."""
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
        print(f"{tag}: ERR {type(e).__name__}: {str(e)[:110]}")


# DateTime64 scales
run("dt1", "SELECT toDateTime64('2024-05-07 01:02:03.123456', 3) AS a, "
    "toDateTime64('2024-05-07 01:02:03.123456', 6) AS b")
run("dt2", "SELECT toUnixTimestamp64Milli(toDateTime64("
    "'1970-01-01 00:00:01.5', 3)) AS ms")
run("dt3", "SELECT fromUnixTimestamp64Milli(1500) AS t")
run("dt4", "SELECT toStartOfSecond(toDateTime64("
    "'2024-05-07 01:02:03.987', 3)) AS s")
# Enum
run("e1", "CREATE TABLE en (e Enum8('a' = 1, 'b' = 2)) ENGINE = Memory")
run("e2", "INSERT INTO en VALUES ('a'), ('b')")
run("e3", "SELECT e, toString(e) AS s, CAST(e, 'Int8') AS i FROM en "
    "ORDER BY e")
run("e4", "INSERT INTO en VALUES ('zzz')")     # must raise: not in enum
# numbers() forms
run("n1", "SELECT count() AS c FROM numbers(5, 10)")
run("n2", "SELECT min(number) AS lo, max(number) AS hi FROM numbers(5, 10)")
run("n3", "SELECT count() AS c FROM numbers_mt(100)")
# parametric precision args
run("u1", "SELECT uniqCombined(12)(number) AS u FROM numbers(100)")
run("u2", "SELECT uniqUpTo(5)(number % 3) AS a, "
    "uniqUpTo(2)(number) AS b FROM numbers(100)")
run("u3", "SELECT topKWeighted(2)(number % 5, number) AS t "
    "FROM numbers(100)")
run("u4", "SELECT sumMap([1, 2, 1], [10, 20, 30]) AS m")
run("u5", "SELECT minMap([1, 2], [4, 5]) AS a, maxMap([1, 1], [4, 9]) AS b")
# dictionary edges
run("d1", "CREATE TABLE dsrc (id UInt64, nm String, parent UInt64) "
    "ENGINE = Memory")
run("d2", "INSERT INTO dsrc VALUES (1, 'one', 0), (2, 'two', 1), "
    "(3, 'three', 2)")
run("d3", "CREATE DICTIONARY hd (id UInt64, nm String, "
    "parent UInt64 HIERARCHICAL) PRIMARY KEY id "
    "SOURCE(CLICKHOUSE(TABLE 'dsrc')) LAYOUT(FLAT()) LIFETIME(0)")
run("d4", "SELECT dictGet('hd', 'nm', toUInt64(2)) AS a, "
    "dictGetOrDefault('hd', 'nm', toUInt64(99), 'miss') AS b, "
    "dictHas('hd', toUInt64(3)) AS c, dictHas('hd', toUInt64(9)) AS d")
run("d5", "SELECT dictGetHierarchy('hd', toUInt64(3)) AS h")
run("d6", "SELECT dictIsIn('hd', toUInt64(3), toUInt64(1)) AS yes, "
    "dictIsIn('hd', toUInt64(1), toUInt64(3)) AS no")
run("d7", "SELECT dictGetDescendants('hd', toUInt64(1)) AS d")
run("d8", "SELECT dictGetChildren('hd', toUInt64(1)) AS c")
# interval chains + toIntervalX
run("i1", "SELECT toDate('2024-01-01') + INTERVAL 1 MONTH + INTERVAL "
    "2 DAY AS d")
run("i2", "SELECT toDate('2024-01-01') + toIntervalDay(3) AS d")
run("i3", "SELECT INTERVAL 2 DAY + INTERVAL 3 DAY AS i")  # interval addition
# string case / unicode
run("s1", "SELECT lengthUTF8('привет') AS a, upperUTF8('привет') AS b, "
    "reverseUTF8('аб') AS c")
run("s2", "SELECT normalizeQuery('SELECT 1 + 2, ''x''') AS q")
run("s3", "SELECT toValidUTF8('ok') AS a, ascii('A') AS b, char(66, 67) AS c")
run("s4", "SELECT repeat('ab', 3) AS r, space(3) AS sp")
# rounding family
run("r1", "SELECT round(2.5) AS a, round(3.5) AS b, round(-2.5) AS c, "
    "roundBankers(2.5) AS d, roundBankers(3.5) AS e")
run("r2", "SELECT floor(2.7, 0) AS a, ceil(2.1) AS b, trunc(-2.7) AS c, "
    "round(1234, -2) AS d, roundToExp2(100) AS e")
run("r3", "SELECT roundDown(5, [1, 3, 7]) AS a, roundDuration(45) AS b, "
    "roundAge(23) AS c")
# geo basics
run("g1", "SELECT greatCircleDistance(0.0, 0.0, 0.0, 1.0) AS d")
run("g2", "SELECT pointInPolygon((0.5, 0.5), [(0, 0), (1, 0), (1, 1), "
    "(0, 1)]) AS inside")
run("g3", "SELECT geohashEncode(-5.60302734375, 42.593994140625, 0) AS h")
# encodings
run("h1", "SELECT toUUID('61f0c404-5cb3-11e7-907b-a6006ad3dba0') AS u, "
    "UUIDStringToNum('61f0c404-5cb3-11e7-907b-a6006ad3dba0') AS n")
run("h2", "SELECT IPv4NumToString(3232235777) AS a, "
    "IPv4StringToNum('192.168.1.1') AS b")
run("h3", "SELECT cutIPv6(IPv6StringToNum('2001:db8::1'), 0, 8) AS c")
