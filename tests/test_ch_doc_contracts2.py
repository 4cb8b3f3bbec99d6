"""Published ClickHouse doc-example contracts, sweep 2: aggregates
(incl. null-skip semantics, -If/-OrNull, parametric forms), maps and
tuples, conditionals, date arithmetic (age vs dateDiff distinction),
type conversions, hashing/encoding, misc scalars, and lambda HOFs.
"""
from __future__ import annotations

import datetime

from clickhouse_from_scratch_spark.plans import execute_sql


def test_ch_doc_contracts_sweep2(spark):
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

    df = spark.createDataFrame([(1,10,'a'),(1,20,'b'),(2,30,'c'),(2,None,'d')], "k int, v int, s string")
    T = {"t": df}
    # aggregates over t
    probe("SELECT count(v) FROM t", 3, "count col skips null", T)
    probe("SELECT count() FROM t", 4, "count()", T)
    probe("SELECT avg(v) FROM t", 20.0, "avg skips null", T)
    probe("SELECT any(s) FROM t", "a", "any first", T)
    probe("SELECT anyLast(s) FROM t", "d", "anyLast", T)
    probe("SELECT argMax(s, v) FROM t", "c", "argMax", T)
    probe("SELECT argMin(s, v) FROM t", "a", "argMin", T)
    probe("SELECT groupArray(v) FROM t", [10,20,30], "groupArray skips null", T)
    probe("SELECT groupUniqArray(k) FROM t ORDER BY 1", [1,2], "groupUniqArray(sorted?)", T)
    probe("SELECT sumIf(v, k = 1) FROM t", 30, "sumIf", T)
    probe("SELECT countIf(k = 2) FROM t", 2, "countIf", T)
    probe("SELECT avgIf(v, k = 2) FROM t", 30.0, "avgIf null skip", T)
    probe("SELECT minIf(v, k = 3) FROM t", None, "minIf empty -> null", T)
    probe("SELECT sumOrNull(v) FROM t WHERE k = 3", None, "sumOrNull empty", T)
    probe("SELECT countDistinct(k) FROM t", 2, "countDistinct", T)
    probe("SELECT uniqExact(k) FROM t", 2, "uniqExact", T)
    probe("SELECT topK(2)(k) FROM t", [1,2], "topK", T)
    probe("SELECT quantileExact(0.5)(v) FROM t", 20, "quantileExact", T)
    probe("SELECT corr(k, v) IS NOT NULL FROM t", True, "corr", T)
    probe("SELECT skewPop(v) IS NOT NULL FROM t", True, "skewPop", T)
    probe("SELECT groupBitAnd(k) FROM t", 0, "groupBitAnd", T)
    probe("SELECT groupBitOr(k) FROM t", 3, "groupBitOr", T)
    probe("SELECT groupBitXor(v) FROM t", 10^20^30, "groupBitXor", T)
    probe("SELECT sumCount(v) FROM t", (60, 3), "sumCount tuple", T)
    probe("SELECT avgWeighted(v, k) FROM t", 22.5, "avgWeighted null-pair skip", T)
    probe("SELECT deltaSum(x) AS d FROM (SELECT arrayJoin([1,2,3,0,3,4,2,3]) AS x)", 7.0, "deltaSum positive deltas", {})
    # maps & tuples
    probe("SELECT map('a', 1, 'b', 2)['b']", 2, "map access")
    probe("SELECT mapKeys(map('a',1,'b',2))", ["a","b"], "mapKeys")
    probe("SELECT mapContains(map('a',1), 'a')", True, "mapContains")
    probe("SELECT tuple(1,'x').1", 1, "tuple .1")
    probe("SELECT tupleElement(tuple(1,'x'), 2)", "x", "tupleElement")
    probe("SELECT untuple(tuple(1,2))", (1,2), "untuple")
    # conditionals / null
    probe("SELECT if(NULL, 1, 2)", 2, "if(NULL)->else")
    probe("SELECT isNull(NULL)", True, "isNull")
    probe("SELECT isNotNull(3)", True, "isNotNull")
    probe("SELECT isZeroOrNull(0)", True, "isZeroOrNull 0")
    probe("SELECT isZeroOrNull(5)", False, "isZeroOrNull 5")
    probe("SELECT toNullable(1)", 1, "toNullable")
    probe("SELECT isNaN(0/0)", True, "isNaN")
    # dates 2
    probe("SELECT toStartOfWeek(toDate('2023-04-21'))", datetime.date(2023,4,16), "toStartOfWeek mode0 sunday")
    probe("SELECT toStartOfWeek(toDate('2023-04-21'), 1)", datetime.date(2023,4,17), "toStartOfWeek mode1 monday")
    probe("SELECT toWeek(toDate('2023-04-21'))", 16, "toWeek mode0")
    probe("SELECT addDays(toDate('2023-01-01'), 5)", datetime.date(2023,1,6), "addDays")
    probe("SELECT subtractMonths(toDate('2023-03-31'), 1)", datetime.date(2023,2,28), "subtractMonths clamp")
    probe("SELECT toDate('2024-02-29')", datetime.date(2024,2,29), "leap toDate")
    probe("SELECT age('day', toDate('2022-01-01'), toDate('2022-01-02'))", 1, "age day")
    probe("SELECT age('month', toDate('2022-01-31'), toDate('2022-02-01'))", 0, "age month (elapsed, not boundary)")
    probe("SELECT toUnixTimestamp(toDateTime('1970-01-01 00:01:00'))", 60, "toUnixTimestamp")
    probe("SELECT fromUnixTimestamp(60)", datetime.datetime(1970,1,1,0,1), "fromUnixTimestamp")
    probe("SELECT toStartOfFifteenMinutes(toDateTime('2023-01-01 10:23:00'))", datetime.datetime(2023,1,1,10,15), "toStartOfFifteenMinutes")
    probe("SELECT toStartOfInterval(toDateTime('2023-01-01 10:23:00'), INTERVAL 10 MINUTE)", datetime.datetime(2023,1,1,10,20), "toStartOfInterval")
    probe("SELECT toTime(toDateTime('2023-04-21 10:20:30'))", datetime.datetime(1970,1,2,10,20,30), "toTime")
    probe("SELECT timeSlot(toDateTime('2023-01-01 10:44:00'))", datetime.datetime(2023,1,1,10,30), "timeSlot 30min")
    probe("SELECT monthName(toDate('2023-04-21'))", "April", "monthName")
    probe("SELECT toDayOfMonth(toDate('2023-04-21'))", 21, "toDayOfMonth")
    probe("SELECT now() > toDateTime('2020-01-01 00:00:00')", True, "now sanity")
    probe("SELECT today() >= toDate('2020-01-01')", True, "today sanity")
    # type conv 2
    probe("SELECT toUInt8(300)", 44, "toUInt8 wrap 300%256")
    probe("SELECT toInt8(200)", -56, "toInt8 wrap")
    probe("SELECT reinterpretAsUInt8('a')", 97, "reinterpretAsUInt8")
    probe("SELECT toDecimal32('1.5', 2)", __import__('decimal').Decimal('1.50'), "toDecimal32")
    probe("SELECT accurateCastOrNull(300, 'UInt8')", None, "accurateCastOrNull overflow")
    probe("SELECT toIntervalDay(2) IS NOT NULL", True, "toIntervalDay")
    # hashing / encoding
    probe("SELECT length(hex(MD5('x')))", 32, "MD5 hex len")
    probe("SELECT length(hex(SHA256('x')))", 64, "SHA256 len")
    probe("SELECT sipHash64('x') != 0", True, "sipHash64 nonzero")
    probe("SELECT cityHash64('x') != 0", True, "cityHash64")
    probe("SELECT xxHash64('x') != 0", True, "xxHash64")
    probe("SELECT crc32('x') != 0", True, "crc32")
    probe("SELECT toUUID('61f0c404-5cb3-11e7-907b-a6006ad3dba0') IS NOT NULL", True, "toUUID")
    probe("SELECT UUIDStringToNum('61f0c404-5cb3-11e7-907b-a6006ad3dba0') IS NOT NULL", True, "UUIDStringToNum")
    # misc scalar
    probe("SELECT bar(5, 0, 10, 10)", "█████", "bar")
    probe("SELECT transform(2, [1,2,3], ['a','b','c'], 'z')", "b", "transform")
    probe("SELECT transform(9, [1,2,3], ['a','b','c'], 'z')", "z", "transform default")
    probe("SELECT formatReadableSize(1024)", "1.00 KiB", "formatReadableSize")
    probe("SELECT formatReadableQuantity(1500)", "1.50 thousand", "formatReadableQuantity")
    probe("SELECT plus(1, 2)", 3, "plus fn form")
    probe("SELECT negate(5)", -5, "negate")
    probe("SELECT intExp2(10)", 1024, "intExp2")
    probe("SELECT intExp10(3)", 1000, "intExp10")
    probe("SELECT e() > 2.7", True, "e()")
    probe("SELECT least(toDate('2023-01-01'), toDate('2022-01-01'))", datetime.date(2022,1,1), "least dates")
    probe("SELECT empty('')", True, "empty str")
    probe("SELECT empty([1])", False, "empty arr")
    probe("SELECT notEmpty('x')", True, "notEmpty")
    probe("SELECT lengthUTF8('héllo')", 5, "lengthUTF8")
    probe("SELECT normalizeQuery('SELECT 1 + 2')", "SELECT ? + ?", "normalizeQuery")
    # lambda HOFs
    probe("SELECT arrayMap(x -> x * 2, [1,2,3])", [2,4,6], "arrayMap")
    probe("SELECT arrayFilter(x -> x > 1, [1,2,3])", [2,3], "arrayFilter")
    probe("SELECT arrayExists(x -> x > 2, [1,2,3])", True, "arrayExists")
    probe("SELECT arrayAll(x -> x > 0, [1,2,3])", True, "arrayAll")
    probe("SELECT arrayFirst(x -> x > 1, [1,2,3])", 2, "arrayFirst")
    probe("SELECT arrayFirstIndex(x -> x > 1, [1,2,3])", 2, "arrayFirstIndex")
    probe("SELECT arrayCount(x -> x % 2 = 0, [1,2,3,4])", 2, "arrayCount lambda")
    probe("SELECT arraySort((x, y) -> y, ['a','b'], [2,1])", ["b","a"], "arraySort by key")
    probe("SELECT arrayFold((acc, x) -> acc + x, [1,2,3], toInt64(0))", 6, "arrayFold")
    probe("SELECT arrayMap((x, i) -> x * i, [3,4], [1,2])", [3,8], "arrayMap 2 arrays")

    assert not FAIL, "\n".join(FAIL)
