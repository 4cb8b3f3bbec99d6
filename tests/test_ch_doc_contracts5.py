"""Published ClickHouse doc-example contracts, sweep 5: the round-6
surface-tail additions (translateUTF8, array/string Jaccard, bit-test
folds, change*/toUTCTimestamp date helpers, JSON length/values,
defaultValueOf*, IPv4 CIDR math, arrayZipUnaligned, arraySplit/
arrayReverseSplit, toJSONString, hasColumnInTable) and the CH
truthy-int lambda contract for condition HOFs.
"""
from __future__ import annotations

import datetime

from clickhouse_from_scratch_spark.plans import execute_sql


def test_ch_doc_contracts_sweep5(spark):
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

    probe("SELECT translateUTF8('abc', 'ac', 'xz')", "xbz", "translateUTF8")
    probe("SELECT arrayJaccardIndex([1,2],[2,3])", 1/3, "arrayJaccardIndex")
    probe("SELECT stringJaccardIndex('abc', 'bcd')", 0.5, "stringJaccardIndex")
    probe("SELECT bitHammingDistance(111, 183)", 4, "bitHammingDistance")
    probe("SELECT bitTestAll(43, 0, 1, 3, 5)", True, "bitTestAll")
    probe("SELECT bitTestAll(43, 0, 1, 2)", False, "bitTestAll false")
    probe("SELECT bitTestAny(43, 2, 4)", False, "bitTestAny false")
    probe("SELECT bitTestAny(43, 2, 5)", True, "bitTestAny true")
    probe("SELECT toMillisecond(toDateTime64('2023-01-01 10:20:30.555', 3))", 555, "toMillisecond")
    probe("SELECT toUTCTimestamp(toDateTime('2023-03-16 11:22:33'), 'Asia/Shanghai')", datetime.datetime(2023,3,16,3,22,33), "toUTCTimestamp")
    probe("SELECT fromUTCTimestamp(toDateTime('2023-03-16 11:22:33'), 'Asia/Shanghai')", datetime.datetime(2023,3,16,19,22,33), "fromUTCTimestamp")
    probe("SELECT changeYear(toDate('2023-04-21'), 2020)", datetime.date(2020,4,21), "changeYear")
    probe("SELECT changeMonth(toDate('2023-04-21'), 12)", datetime.date(2023,12,21), "changeMonth")
    probe("SELECT changeDay(toDate('2023-04-21'), 1)", datetime.date(2023,4,1), "changeDay")
    probe("SELECT timezone()", "UTC", "timezone")
    probe("SELECT indexHint(1 > 2)", True, "indexHint always 1")
    probe("SELECT JSONArrayLength('[1,2,3]')", 3, "JSONArrayLength")
    probe("SELECT JSONLength('{\"a\":1,\"b\":2}')", 2, "JSONLength object")
    probe("SELECT JSONLength('[1,2,3]')", 3, "JSONLength array")
    probe("SELECT JSONExtractValues('{\"a\":\"x\",\"b\":\"y\"}')", ["x","y"], "JSONExtractValues")
    probe("SELECT defaultValueOfTypeName('Int32')", 0, "defaultValueOfTypeName Int32")
    probe("SELECT defaultValueOfTypeName('String')", "", "defaultValueOfTypeName String")
    probe("SELECT defaultValueOfTypeName('Nullable(Int8)')", None, "defaultValueOfTypeName Nullable")
    probe("SELECT IPv4CIDRToRange(IPv4StringToNum('192.168.5.2'), 16)", ("192.168.0.0","192.168.255.255"), "IPv4CIDRToRange")
    probe("SELECT isIPAddressInRange('192.168.5.2', '192.168.0.0/16')", True, "isIPAddressInRange in")
    probe("SELECT isIPAddressInRange('10.0.0.1', '192.168.0.0/16')", False, "isIPAddressInRange out")
    probe("SELECT arrayZipUnaligned([1,2,3],['a'])", [(1,'a'),(2,None),(3,None)], "arrayZipUnaligned")
    probe("SELECT arraySplit((x, y) -> y, [1,2,3,4,5], [1,0,0,1,0])", [[1,2,3],[4,5]], "arraySplit")
    probe("SELECT arrayReverseSplit((x, y) -> y, [1,2,3,4,5], [1,0,0,1,0])", [[1],[2,3,4],[5]], "arrayReverseSplit")
    probe("SELECT toJSONString([1,2,3])", "[1,2,3]", "toJSONString array")
    probe("SELECT toJSONString('a\"b')", '"a\\"b"', "toJSONString string escape")
    probe("SELECT toJSONString(5)", "5", "toJSONString number")
    probe("SELECT toJSONString(map('k', 'v'))", '{"k":"v"}', "toJSONString map")
    probe("SELECT hasColumnInTable('t', 'x') FROM t LIMIT 1", True, "hasColumnInTable yes",
          {"t": spark.createDataFrame([(1,)], "x int")})
    probe("SELECT hasColumnInTable('t', 'zz') FROM t LIMIT 1", False, "hasColumnInTable no",
          {"t": spark.createDataFrame([(1,)], "x int")})
    probe("SELECT defaultValueOfArgumentType(x) FROM t", 0, "defaultValueOfArgumentType",
          {"t": spark.createDataFrame([(7,)], "x int")})
    probe("SELECT arrayFilter(x -> x % 2, [1,2,3,4,5])", [1,3,5], "arrayFilter truthy int lambda")
    probe("SELECT arrayExists(x -> x - 1, [1,1,2])", True, "arrayExists truthy")
    probe("SELECT arrayCount(x -> modulo(x, 2), [1,2,3])", 2, "arrayCount truthy")
    probe("SELECT arrayFirst(x -> x % 2, [2,3,4,5])", 3, "arrayFirst truthy")

    assert not FAIL, "\n".join(FAIL)
