"""Round-7 fidelity sweep: published ClickHouse doc-contract values for
the lightly-pinned r6 families — URL hierarchy, IP textual forms,
formatReadable*/parseReadable*, encodings (base58/morton/geohash),
EXTRACT/dateName breadth, negative/overflow date args, misc distance/
similarity functions. Each tuple is (sql, expected_rows or None to just
print)."""
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
    # --- URL hierarchy (CH docs examples) ---
    ("SELECT URLHierarchy('https://example.com/browse/CONV-6788') AS r",
     [(['https://example.com/', 'https://example.com/browse/',
        'https://example.com/browse/CONV-6788'],)]),
    ("SELECT URLPathHierarchy('https://example.com/browse/CONV-6788') AS r",
     [(['/browse/', '/browse/CONV-6788'],)]),
    ("SELECT cutWWW('http://www.example.com/path') AS r",
     [('http://example.com/path',)]),
    ("SELECT extractURLParameters('http://e.com/?page=1&lr=213') AS r",
     [(['page=1', 'lr=213'],)]),
    ("SELECT extractURLParameterNames('http://e.com/?page=1&lr=213') AS r",
     [(['page', 'lr'],)]),
    ("SELECT extractURLParameter('http://e.com/?page=1&lr=213', 'lr') AS r",
     [('213',)]),
    ("SELECT domain('https://www.example.com/path') AS r",
     [('www.example.com',)]),
    ("SELECT domainWithoutWWW('https://www.example.com/path') AS r",
     [('example.com',)]),
    ("SELECT topLevelDomain('https://www.example.com/path') AS r",
     [('com',)]),
    ("SELECT path('https://example.com/a/b?x=1') AS r", [('/a/b',)]),
    ("SELECT pathFull('https://example.com/a/b?x=1') AS r", [('/a/b?x=1',)]),
    ("SELECT queryString('https://example.com/a/b?x=1&y=2') AS r",
     [('x=1&y=2',)]),
    ("SELECT fragment('https://example.com/a#frag') AS r", [('frag',)]),
    ("SELECT protocol('https://example.com/a') AS r", [('https',)]),
    ("SELECT netloc('https://user:pw@example.com:8080/a') AS r",
     [('user:pw@example.com:8080',)]),
    ("SELECT cutQueryString('http://e.com/a?x=1#f') AS r",
     [('http://e.com/a#f',)]),
    ("SELECT cutFragment('http://e.com/a?x=1#f') AS r",
     [('http://e.com/a?x=1',)]),
    ("SELECT cutQueryStringAndFragment('http://e.com/a?x=1#f') AS r",
     [('http://e.com/a',)]),
    ("SELECT firstSignificantSubdomain('http://news.yandex.com.tr/') AS r",
     [('yandex',)]),
    ("SELECT cutToFirstSignificantSubdomain('http://news.yandex.com.tr/') AS r",
     [('yandex.com.tr',)]),
    # --- IP textual (CH docs) ---
    ("SELECT IPv4NumToString(3232235521) AS r", [('192.168.0.1',)]),
    ("SELECT IPv4StringToNum('192.168.0.1') AS r", [(3232235521,)]),
    ("SELECT IPv6NumToString(IPv4ToIPv6(IPv4StringToNum('192.168.0.1'))) AS r",
     [('::ffff:192.168.0.1',)]),
    ("SELECT IPv6NumToString(IPv6StringToNum('2a02:6b8::11')) AS r",
     [('2a02:6b8::11',)]),
    ("SELECT toIPv4('171.225.130.45') AS r", [('171.225.130.45',)]),
    ("SELECT isIPv4String('127.0.0.1') AS a, isIPv4String('127.0.0') AS b",
     [(True, False)]),
    ("SELECT isIPv6String('2a02:6b8::11') AS a, isIPv6String('127.0.0.1') AS b",
     [(True, False)]),
    # --- formatReadable* (CH docs) ---
    ("SELECT formatReadableSize(1) AS a, formatReadableSize(1024) AS b,"
     " formatReadableSize(1048576) AS c",
     [('1.00 B', '1.00 KiB', '1.00 MiB')]),
    ("SELECT formatReadableSize(1025) AS r", [('1.00 KiB',)]),
    ("SELECT formatReadableDecimalSize(1000) AS a,"
     " formatReadableDecimalSize(1000000) AS b",
     [('1.00 KB', '1.00 MB')]),
    ("SELECT formatReadableQuantity(1024) AS a,"
     " formatReadableQuantity(1234567) AS b",
     [('1.02 thousand', '1.23 million')]),
    ("SELECT formatReadableTimeDelta(7601) AS r",
     [('2 hours, 6 minutes and 41 seconds',)]),
    ("SELECT parseReadableSize('1 KiB') AS a, parseReadableSize('3 MB') AS b",
     [(1024, 3000000)]),
    ("SELECT parseReadableSizeOrNull('invalid') AS r", [(None,)]),
    ("SELECT parseReadableSizeOrZero('invalid') AS r", [(0,)]),
    # --- encodings ---
    ("SELECT base58Encode('Encoded') AS r", [('3dc8KtHrwM',)]),
    ("SELECT base58Decode('3dc8KtHrwM') AS r", [('Encoded',)]),
    ("SELECT base58Decode(base58Encode('round trip!')) AS r",
     [('round trip!',)]),
    ("SELECT base64Encode('clickhouse') AS r", [('Y2xpY2tob3VzZQ==',)]),
    ("SELECT base64Decode('Y2xpY2tob3VzZQ==') AS r", [('clickhouse',)]),
    ("SELECT hex(103) AS r", [('67',)]),
    ("SELECT unhex('4D7953514C') AS r", [('MySQL',)]),
    ("SELECT bin(14) AS r", [('00001110',)]),
    ("SELECT mortonEncode(1, 2) AS r", [(6,)]),
    ("SELECT mortonDecode(2, 6) AS r", [((1, 2),)]),
    # --- EXTRACT / dateName breadth ---
    ("SELECT EXTRACT(YEAR FROM toDate('2022-04-17')) AS a,"
     " EXTRACT(MONTH FROM toDate('2022-04-17')) AS b,"
     " EXTRACT(DAY FROM toDate('2022-04-17')) AS c", [(2022, 4, 17)]),
    ("SELECT EXTRACT(HOUR FROM toDateTime('2022-04-17 10:20:30')) AS a,"
     " EXTRACT(MINUTE FROM toDateTime('2022-04-17 10:20:30')) AS b,"
     " EXTRACT(SECOND FROM toDateTime('2022-04-17 10:20:30')) AS c",
     [(10, 20, 30)]),
    ("SELECT dateName('year', toDate('2021-04-14')) AS a,"
     " dateName('month', toDate('2021-04-14')) AS b,"
     " dateName('weekday', toDate('2021-04-14')) AS c",
     [('2021', 'April', 'Wednesday')]),
    ("SELECT dateName('quarter', toDate('2021-04-14')) AS a,"
     " dateName('dayofyear', toDate('2021-04-14')) AS b,"
     " dateName('day', toDate('2021-04-14')) AS c",
     [('2', '104', '14')]),
    ("SELECT dateName('hour', toDateTime('2021-04-14 11:22:33')) AS a,"
     " dateName('minute', toDateTime('2021-04-14 11:22:33')) AS b,"
     " dateName('second', toDateTime('2021-04-14 11:22:33')) AS c",
     [('11', '22', '33')]),
    # --- negative / overflow date args ---
    ("SELECT addDays(toDate('2022-01-01'), -1) AS r", None),
    ("SELECT addMonths(toDate('2022-01-31'), 1) AS r", None),
    ("SELECT subtractYears(toDate('2022-01-01'), 1) AS r", None),
    ("SELECT toDayOfWeek(toDate('2022-04-17')) AS r", [(7,)]),
    ("SELECT toDayOfWeek(toDate('2022-04-17'), 1) AS r", [(6,)]),
    ("SELECT dateDiff('day', toDate('2022-01-01'), toDate('2022-01-10')) AS r",
     [(9,)]),
    ("SELECT dateDiff('month', toDate('2022-01-31'), toDate('2022-02-01')) AS r",
     [(1,)]),
    ("SELECT age('month', toDate('2022-01-31'), toDate('2022-02-28')) AS r",
     [(0,)]),
    ("SELECT age('day', toDate('2021-12-29'), toDate('2022-01-01')) AS r",
     [(3,)]),
    # --- distance / similarity ---
    ("SELECT damerauLevenshteinDistance('clickhouse', 'mouse') AS r",
     [(6,)]),
    ("SELECT jaroSimilarity('clickhouse', 'click') AS r", None),
    ("SELECT levenshteinDistance('clickhouse', 'mouse') AS r", [(6,)]),
    ("SELECT distanceL1([1,2], [4,6]) AS r", [(7.0,)]),
    ("SELECT distanceL2([1,2], [4,6]) AS r", [(5.0,)]),
    ("SELECT cosineDistance([1,0], [0,1]) AS r", [(1.0,)]),
    # --- misc r6 tail ---
    ("SELECT firstLine('a\\nb\\nc') AS r", [('a',)]),
    ("SELECT countDigits(123) AS a, countDigits(0) AS b", [(3, 1)]),
    ("SELECT bitPositionsToArray(10) AS r", [([1, 3],)]),
    ("SELECT arrayShingles([1,2,3,4], 3) AS r", [([[1, 2, 3], [2, 3, 4]],)]),
    ("SELECT decodeHTMLComponent('&lt;p&gt;Hi&amp;bye&lt;/p&gt;') AS r",
     [('<p>Hi&bye</p>',)]),
    ("SELECT extractTextFromHTML('<p>Hello <b>world</b></p>') AS r", None),
    ("SELECT hasToken('Hello World', 'World') AS a,"
     " hasToken('Hello World', 'orld') AS b", [(True, False)]),
    ("SELECT hasTokenCaseInsensitive('Hello World', 'world') AS r",
     [(True,)]),
]

npass = nfail = nprint = 0
for sql, expected in PROBES:
    try:
        rows = [tuple(r) for r in execute_sql(spark, sql, {}).limit(5).collect()]
        if expected is None:
            print(f"PRNT | {sql!r} -> {rows}")
            nprint += 1
        elif rows == expected:
            npass += 1
        else:
            print(f"DIFF | {sql!r} -> {rows} (expected {expected})")
            nfail += 1
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"FAIL | {sql!r} -> {type(e).__name__}: {msg}")
        nfail += 1
print(f"\n{npass} pass, {nfail} diff/fail, {nprint} printed")
