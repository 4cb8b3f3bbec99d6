"""Published ClickHouse doc-example contracts, sweep 3: window
functions (incl. lagInFrame/leadInFrame with frames + type defaults),
multi-search string family, reinterpret/rounding buckets, the
parseDateTime family, timestamp helpers and misc tail functions.
"""
from __future__ import annotations

import datetime

from clickhouse_from_scratch_spark.plans import execute_sql


def test_ch_doc_contracts_sweep3(spark):
    FAIL = []

    def probe(sql, expected, label, tables=None):
        try:
            rows = execute_sql(spark, sql, tables or {}).collect()
            got = tuple(rows[0]) if len(rows) == 1 else [tuple(r) for r in rows]
            if len(rows) == 1 and len(rows[0]) == 1:
                got = rows[0][0]
            if got != expected:
                FAIL.append(f"{label}: expected {expected!r} got {got!r}")
        except Exception as e:
            FAIL.append(f"{label}: {type(e).__name__}: {str(e)[:90]}")

    # window functions over a small table
    wt = spark.createDataFrame([(1,'a',10),(1,'b',20),(1,'c',30),(2,'d',40),(2,'e',50)],
                               "g int, id string, v int")
    W = {"t": wt}
    probe("SELECT id, row_number() OVER (PARTITION BY g ORDER BY v) AS rn FROM t ORDER BY id",
          [("a",1),("b",2),("c",3),("d",1),("e",2)], "row_number", W)
    probe("SELECT id, lagInFrame(v) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS l FROM t ORDER BY id",
          [("a",0),("b",10),("c",20),("d",0),("e",40)], "lagInFrame default 0", W)
    probe("SELECT id, leadInFrame(v) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS l FROM t ORDER BY id",
          [("a",20),("b",30),("c",0),("d",50),("e",0)], "leadInFrame default 0", W)
    probe("SELECT id, first_value(v) OVER (PARTITION BY g ORDER BY v DESC) AS f FROM t ORDER BY id",
          [("a",30),("b",30),("c",30),("d",50),("e",50)], "first_value", W)
    probe("SELECT id, ntile(2) OVER (ORDER BY v) AS n FROM t ORDER BY id",
          [("a",1),("b",1),("c",1),("d",2),("e",2)], "ntile", W)
    probe("SELECT sum(v) OVER () AS s FROM t LIMIT 1", 150, "window over ()", W)
    probe("SELECT id, nth_value(v, 2) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS n FROM t ORDER BY id",
          [("a",20),("b",20),("c",20),("d",50),("e",50)], "nth_value", W)
    # neighbor / runningDifference (block functions -> window analogues)
    probe("SELECT runningDifference(v) AS d FROM (SELECT v FROM t ORDER BY v)",
          [(0,),(10,),(10,),(10,),(10,)], "runningDifference", W)
    # string UTF8 + search family
    probe("SELECT ngramDistance('ClickHouse', 'ClickHouse')", 0.0, "ngramDistance identical")
    probe("SELECT multiSearchAny('hello world', ['foo', 'wor'])", True, "multiSearchAny")
    probe("SELECT multiSearchFirstIndex('hello', ['xx', 'ell'])", 2, "multiSearchFirstIndex")
    probe("SELECT multiSearchAllPositions('hello', ['l', 'o'])", [3, 5], "multiSearchAllPositions")
    probe("SELECT countMatches('aaa', 'a')", 3, "countMatches")
    probe("SELECT substringIndex('www.ex.com', '.', 2)", "www.ex", "substringIndex")
    probe("SELECT splitByNonAlpha('a1b_c')", ["a1b","c"], "splitByNonAlpha digits kept")
    probe("SELECT splitByWhitespace('a  b c')", ["a","b","c"], "splitByWhitespace")
    probe("SELECT toValidUTF8('ok')", "ok", "toValidUTF8")
    probe("SELECT punycodeEncode('münchen')", "mnchen-3ya", "punycodeEncode")
    probe("SELECT str_to_map('a:1,b:2', ',', ':')['b']", "2", "str_to_map")
    probe("SELECT regexpQuoteMeta('a.b')", "a\\.b", "regexpQuoteMeta")
    probe("SELECT ngrams('abcd', 3)", ["abc","bcd"], "ngrams")
    probe("SELECT tokens('a b  c')", ["a","b","c"], "tokens")
    # reinterpret / rounding families
    probe("SELECT reinterpretAsUInt16('ab')", 25185, "reinterpretAsUInt16 LE")
    probe("SELECT roundAge(50)", 45, "roundAge 45..54 bucket") 
    probe("SELECT roundDuration(95)", 60, "roundDuration")
    probe("SELECT toDaysSinceYearZero(toDate('1970-01-01'))", 719528, "toDaysSinceYearZero")
    probe("SELECT toModifiedJulianDay('2023-04-21')", 60055, "toModifiedJulianDay")
    probe("SELECT snowflakeToDateTime(1426860702823350272) > toDateTime('2020-01-01 00:00:00')", True, "snowflake sanity")
    # parseDateTime family
    probe("SELECT parseDateTimeBestEffort('2023-04-21 10:20:30')", datetime.datetime(2023,4,21,10,20,30), "parseDateTimeBestEffort")
    probe("SELECT parseDateTimeBestEffortOrNull('garbage')", None, "parseDateTimeBestEffortOrNull")
    probe("SELECT parseDateTime('2023-04-21', '%Y-%m-%d')", datetime.datetime(2023,4,21), "parseDateTime")
    probe("SELECT parseTimeDelta('1h30m')", 5400.0, "parseTimeDelta")
    probe("SELECT toDateOrZero('bad')", datetime.date(1970,1,1), "toDateOrZero")
    probe("SELECT toUInt8OrDefault('bad', toUInt8(7))", 7, "toUInt8OrDefault")
    # timestamp helpers
    probe("SELECT timestampAdd(toDate('2023-01-01'), INTERVAL 1 MONTH)", datetime.date(2023,2,1), "timestampAdd")
    probe("SELECT TIMESTAMPDIFF(day, toDate('2023-01-01'), toDate('2023-01-11'))", 10, "TIMESTAMPDIFF")
    probe("SELECT toStartOfFiveMinutes(toDateTime('2023-01-01 10:23:00'))", datetime.datetime(2023,1,1,10,20), "toStartOfFiveMinutes")
    probe("SELECT timeSlots(toDateTime('2023-01-01 10:00:00'), toUInt32(3600))[1]", datetime.datetime(2023,1,1,10,0), "timeSlots first")
    # math tail
    probe("SELECT sigmoid(0)", 0.5, "sigmoid")
    probe("SELECT radians(180) > 3.14", True, "radians")
    probe("SELECT round(tgamma(5), 6)", 24.0, "tgamma")
    probe("SELECT sumKahan(x) FROM (SELECT arrayJoin([0.1,0.2,0.3]) AS x) HAVING sumKahan(x) > 0.59", 0.6, "sumKahan compensated (r12: decimal-path exact, CH Kahan also yields 0.6)")
    # misc
    probe("SELECT rowNumberInAllBlocks() FROM (SELECT arrayJoin([10,20]) AS x)", [(0,),(1,)], "rowNumberInAllBlocks")
    probe("SELECT sleep(0)", 0, "sleep(0)")
    probe("SELECT nothing() IS NULL", True, "nothing")
    probe("SELECT pointInPolygon((1.0, 1.0), [(0.0,0.0),(4.0,0.0),(4.0,4.0),(0.0,4.0)])", True, "pointInPolygon")
    probe("SELECT proportionsZTest(10, 10, 20, 20, 0.95, 'unpooled') IS NOT NULL", True, "proportionsZTest")
    probe("SELECT singleValueOrNull(x) FROM (SELECT arrayJoin([5,5]) AS x)", 5, "singleValueOrNull same value")
    probe("SELECT singleValueOrNull(x) FROM (SELECT arrayJoin([5,6]) AS x)", None, "singleValueOrNull two values")

    assert not FAIL, "\n".join(FAIL)
