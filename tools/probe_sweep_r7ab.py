"""Round-7 sweep batch 31: UUID functions, FixedString padding, geo
distances (doc values), IPv4 CIDR ranges, isIPAddressInRange, custom
trim, XML encode/decode, regexpQuoteMeta, UTF8 starts/ends, bitmask
helpers. Expected values from published ClickHouse docs examples."""
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
    # UUID
    ("SELECT toUUID('61f0c404-5cb3-11e7-907b-a6006ad3dba0') AS x",
     "61f0c404-5cb3-11e7-907b-a6006ad3dba0"),
    ("SELECT UUIDNumToString(UUIDStringToNum("
     "'612f3c40-5d3b-217e-707b-6a546a3d7b29')) AS x",
     "612f3c40-5d3b-217e-707b-6a546a3d7b29"),
    ("SELECT length(toString(generateUUIDv4())) AS x", 36),
    # FixedString: toFixedString pads? CH: toFixedString(s, n) errors if
    # len>n; shorter strings are \0-padded; toString trims? Probe shape.
    ("SELECT length(toFixedString('foo', 8)) AS x", 8),
    ("SELECT toFixedString('foo', 8) = 'foo' AS eq", None, "info"),
    # geo (docs example, args are LON, LAT pairs)
    ("SELECT round(greatCircleDistance(55.755831, 37.617673, "
     "-55.755831, -37.617673)) AS x", 14128352, "within100"),
    # DC -> Philadelphia: WGS84 geodesic = 199830 m (Vincenty);
    # geoDistance's FCC ellipsoid formula should land within 0.2%
    ("SELECT round(geoDistance(-77.0366, 38.8976, -75.1503, 39.9496)) "
     "AS x", 199830, "within0p2"),
    ("SELECT round(greatCircleDistance(-77.0366, 38.8976, -75.1503, "
     "39.9496)) AS x", 199830, "within0p5"),
    ("SELECT greatCircleAngle(0, 0, 45, 0) AS x", 45.0, "approx"),
    # IPv4 CIDR (docs example)
    ("SELECT toString(tupleElement(IPv4CIDRToRange(toIPv4("
     "'192.168.5.2'), 16), 1)) AS x", "192.168.0.0"),
    ("SELECT toString(tupleElement(IPv4CIDRToRange(toIPv4("
     "'192.168.5.2'), 16), 2)) AS x", "192.168.255.255"),
    ("SELECT isIPAddressInRange('127.0.0.1', '127.0.0.0/8') AS x", 1),
    ("SELECT isIPAddressInRange('128.0.0.1', '127.0.0.0/8') AS x", 0),
    # custom-char trim (docs: trim(BOTH '()' FROM '((( Hello )))'))
    ("SELECT trim(BOTH '()' FROM '(( Hello ))') AS x", " Hello "),
    ("SELECT trimLeft('xxbarxx', 'x') AS x", "barxx"),
    ("SELECT trimRight('xxbarxx', 'x') AS x", "xxbar"),
    # XML
    ("SELECT encodeXMLComponent('< & >') AS x", "&lt; &amp; &gt;"),
    ("SELECT decodeXMLComponent('&lt;a&gt;&amp;quot;') AS x",
     None, "info"),
    ("SELECT decodeXMLComponent('&lt;&gt;&amp;') AS x", "<>&"),
    # regexpQuoteMeta
    ("SELECT regexpQuoteMeta('Hello, World!') AS x",
     "Hello\\, World\\!", "info"),
    # UTF8 starts/ends
    ("SELECT startsWithUTF8('приставка', 'при') AS x", 1),
    ("SELECT endsWithUTF8('приставка', 'ка') AS x", 1),
    # bitmask helpers (docs: bitmaskToList(50) = '2,16,32')
    ("SELECT bitmaskToList(50) AS x", "2,16,32"),
    ("SELECT bitmaskToArray(50) AS x", [2, 16, 32]),
    # reinterpret round trip if present
    ("SELECT reinterpretAsUInt8(reinterpretAsString(97)) AS x", 97),
    ("SELECT reinterpretAsString(97) AS x", "a"),
    ("SELECT MACNumToString(1108152157446) AS x", "01:02:03:04:05:06"),
    ("SELECT MACStringToNum('01:02:03:04:05:06') AS x", 1108152157446),
    ("SELECT toString(tupleElement(IPv6CIDRToRange(toIPv6("
     "'2001:0db8:0000:85a3:0000:0000:ac1f:8001'), 32), 1)) AS x",
     "2001:db8::"),
    ("SELECT pointInEllipses(10., 10., 10., 9.1, 1., 0.9999) AS x", 1),
    ("SELECT pointInEllipses(10., 10., 10., 8., 1., 0.9999) AS x", 0),
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
            print(f"INFO | {sql[:70]} -> {gs[:50]}")
            continue
        if mode == "approx":
            good = abs(float(got) - float(want)) < 0.5
        elif mode == "within100":
            good = abs(float(got) - float(want)) < 100
        elif mode == "within0p2":
            good = abs(float(got) - float(want)) < float(want) * 0.002
        elif mode == "within0p5":
            good = abs(float(got) - float(want)) < float(want) * 0.005
        else:
            good = gs == str(want) or got == want
        if good:
            ok += 1
            print(f"ok   | {sql[:70]} -> {gs[:44]}")
        else:
            fail += 1
            print(f"DIVG | {sql[:70]} -> {gs[:60]} (want {want})")
    except Exception as e:
        fail += 1
        print(f"FAIL | {sql[:70]} -> {type(e).__name__}: "
              f"{str(e).splitlines()[0][:100]}")
print(f"== {ok} ok, {fail} divergent/fail")
