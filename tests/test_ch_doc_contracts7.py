"""Round-7 fidelity pins, batch 3: JSON extraction, string search
(position/multiSearch/countSubstrings/locate), conditionals
(transform/nullIf), array breadth, bit tests and bitmasks, math edges,
date extras, geohash — all values from published ClickHouse
documentation examples."""
from __future__ import annotations

import pytest

from clickhouse_from_scratch_spark.plans import execute_sql


def rows(spark, sql):
    return [tuple(r) for r in execute_sql(spark, sql, {}).collect()]


def one(spark, sql):
    return rows(spark, sql)[0]


# --- JSON --------------------------------------------------------------------

def test_json_extract_scalars(spark):
    assert one(spark, """SELECT JSONExtractInt('{"a": 300}', 'a') AS i,
        JSONExtractString('{"a": "hello"}', 'a') AS s,
        JSONExtractFloat('{"a": 3.5}', 'a') AS f,
        JSONExtractBool('{"a": true}', 'a') AS b""") == (300, 'hello',
                                                         3.5, True)


def test_json_has_length_type(spark):
    assert one(spark, """SELECT JSONHas('{"a": 1}', 'a') AS y,
        JSONHas('{"a": 1}', 'b') AS n, JSONLength('[1,2,3]') AS la,
        JSONLength('{"a":1,"b":2}') AS lo""") == (True, False, 3, 2)
    assert one(spark, """SELECT JSONType('{"a":1}') AS o,
        JSONType('[1]') AS a, JSONType('"s"') AS s""") == \
        ('Object', 'Array', 'String')


def test_json_extract_keys_and_raw(spark):
    assert one(spark, """SELECT JSONExtractKeys('{"a":1,"b":2}') AS r""") \
        == (['a', 'b'],)
    assert one(spark,
               """SELECT JSONExtractRaw('{"a":{"b":1}}', 'a') AS r""") \
        == ('{"b":1}',)


def test_json_extract_array_raw_keeps_encoding(spark):
    # the Raw contract: string elements keep their JSON quoting
    assert one(spark,
               """SELECT JSONExtractArrayRaw('[1,"a",{"b":1}]') AS r""") \
        == (['1', '"a"', '{"b":1}'],)


def test_json_nested_and_indexing(spark):
    assert one(spark, """SELECT
        JSONExtractInt('{"a": {"b": 7}}', 'a', 'b') AS nested,
        JSONExtractInt('[10, 20]', 2) AS pos,
        JSONExtractInt('[10, 20]', -1) AS neg""") == (7, 20, 20)


def test_simple_json_family(spark):
    assert one(spark, """SELECT simpleJSONExtractInt('{"a": 300}', 'a')
        AS i, simpleJSONExtractString('{"a": "hi"}', 'a') AS s,
        simpleJSONHas('{"a": 1}', 'a') AS h""") == (300, 'hi', True)


# --- string search -----------------------------------------------------------

def test_position_family(spark):
    assert one(spark, "SELECT position('Hello, world!', 'l') AS a, "
               "position('Hello', 'x') AS b, "
               "positionCaseInsensitive('Hello', 'L') AS c, "
               "positionUTF8('привет', 'в') AS d") == (3, 0, 3, 4)


def test_locate_mysql_arg_order(spark):
    # locate is needle-first (MySQL-compatible), unlike position
    assert one(spark, "SELECT locate('l', 'Hello') AS r") == (3,)
    assert one(spark, "SELECT locate('l', 'Hello', 4) AS r") == (4,)


def test_multi_search(spark):
    assert one(spark, "SELECT multiSearchAny('Hello', ['e','x']) AS y, "
               "multiSearchAny('Hello', ['q','x']) AS n") == (True, False)
    assert one(spark, "SELECT multiSearchFirstIndex('Hello World', "
               "['xx','Wo']) AS a, multiSearchFirstIndex('Hello', "
               "['xx','yy']) AS b") == (2, 0)
    assert one(spark, "SELECT multiSearchAllPositions('Hello, World', "
               "['Hello', ',', 'World']) AS r") == ([1, 6, 8],)
    assert one(spark, "SELECT multiSearchFirstPosition('Hello World', "
               "['or','ld','Wo']) AS r") == (7,)


def test_count_substrings(spark):
    assert one(spark, "SELECT countSubstrings('aaaa', 'aa') AS a, "
               "countSubstrings('foobar.com', '.') AS b, "
               "countMatches('aaaa', 'aa') AS c") == (2, 1, 2)


def test_extract_regex_family(spark):
    assert one(spark, "SELECT extract('Hello123World', '[0-9]+') AS r") \
        == ('123',)
    assert one(spark, "SELECT extractAll('a1b2c3', '[0-9]') AS r") \
        == (['1', '2', '3'],)
    assert one(spark, "SELECT extractGroups('hello abc=111', "
               "'([a-z]+)=([0-9]+)') AS r") == (['abc', '111'],)


# --- conditionals ------------------------------------------------------------

def test_transform(spark):
    assert one(spark, "SELECT transform(2, [1,2,3], ['a','b','c'], 'd') "
               "AS a, transform(4, [1,2,3], ['a','b','c'], 'd') AS b") \
        == ('b', 'd')
    # 3-arg form: unmatched values pass through
    assert one(spark, "SELECT transform(4, [1,2], [10,20]) AS r") == (4,)


def test_null_conditionals(spark):
    assert one(spark, "SELECT nullIf(1, 1) AS a, nullIf(1, 2) AS b, "
               "ifNull(NULL, 2) AS c, coalesce(NULL, NULL, 3) AS d, "
               "assumeNotNull(toNullable(5)) AS e") == (None, 1, 2, 3, 5)


# --- arrays ------------------------------------------------------------------

def test_array_zip_compact_uniq(spark):
    assert one(spark, "SELECT arrayZip(['a','b'], [1,2]) AS r") == \
        ([('a', 1), ('b', 2)],)
    assert one(spark, "SELECT arrayCompact([1,1,2,2,1]) AS a, "
               "arrayUniq([1,1,2]) AS b") == ([1, 2, 1], 2)


def test_array_flatten_resize_concat(spark):
    assert one(spark, "SELECT arrayFlatten([[1,2],[3]]) AS r") \
        == ([1, 2, 3],)
    assert one(spark, "SELECT arrayResize([1,2,3], 2) AS a, "
               "arrayResize([1,2,3], 4) AS b") == ([1, 2], [1, 2, 3, 0])
    assert one(spark, "SELECT arrayStringConcat(['a','b'], '-') AS r") \
        == ('a-b',)


def test_array_null_aware_search(spark):
    # indexOf/countEqual treat NULL as a findable value (CH docs)
    assert one(spark, "SELECT indexOf([1,3,NULL,NULL], NULL) AS a, "
               "countEqual([1,2,NULL,NULL], NULL) AS b") == (3, 2)


def test_array_cumsum_nonnegative_fill(spark):
    assert one(spark, "SELECT arrayCumSumNonNegative([1,1,-4,1]) AS r") \
        == ([1, 2, 0, 1],)
    assert one(spark, "SELECT arrayFill(x -> not(isNull(x)), "
               "[1, NULL, 2, NULL]) AS r") == ([1, 1, 2, 2],)


def test_array_push_pop(spark):
    assert one(spark, "SELECT arrayPushBack([1], 2) AS a, "
               "arrayPopFront([1,2]) AS b") == ([1, 2], [2])


# --- bit ---------------------------------------------------------------------

def test_bit_test_family(spark):
    # 43 = 0b101011: bits 0,1,3,5 set (docs examples)
    assert one(spark, "SELECT bitTest(43, 1) AS a, bitTest(43, 2) AS b, "
               "bitTestAll(43, 0, 1, 3, 5) AS c, "
               "bitTestAny(43, 2, 4) AS d") == (1, 0, 1, 0)


def test_bit_hamming_distance(spark):
    assert one(spark, "SELECT bitHammingDistance(111, 121) AS r") == (3,)


def test_bitmask_to_list_array(spark):
    assert one(spark, "SELECT bitmaskToList(50) AS r") == ('2,16,32',)
    assert one(spark, "SELECT bitmaskToArray(50) AS r") == ([2, 16, 32],)


# --- math edges --------------------------------------------------------------

def test_int_exp(spark):
    assert one(spark, "SELECT intExp2(3) AS a, intExp10(2) AS b") \
        == (8, 100)


def test_float_math(spark):
    assert one(spark, "SELECT exp2(3.0) AS a, log2(8.0) AS b, "
               "pow(2, 10) AS c, cbrt(27.0) AS d, hypot(3.0, 4.0) AS e, "
               "degrees(pi()) AS f") == (8.0, 3.0, 1024.0, 3.0, 5.0, 180.0)


def test_sign_factorial(spark):
    assert one(spark, "SELECT sign(-5) AS a, sign(0) AS b, sign(7) AS c, "
               "factorial(5) AS d") == (-1, 0, 1, 120)


def test_char_ascii(spark):
    assert one(spark, "SELECT char(104, 101, 108, 108, 111) AS a, "
               "ascii('A') AS b") == ('hello', 65)


# --- date extras -------------------------------------------------------------

def test_quarter_iso_week(spark):
    assert one(spark, "SELECT toQuarter(toDate('2023-05-05')) AS q, "
               "toISOWeek(toDate('2017-01-01')) AS w, "
               "toISOYear(toDate('2017-01-01')) AS y") == (2, 52, 2016)


def test_month_name_last_day_time_slot(spark):
    assert one(spark, "SELECT monthName(toDate('2021-04-14')) AS m, "
               "toString(toLastDayOfMonth(toDate('2023-02-10'))) AS l, "
               "toString(timeSlot(toDateTime('2000-01-02 03:23:00'))) "
               "AS t") == ('April', '2023-02-28', '2000-01-02 03:00:00')


# --- geo / tuple -------------------------------------------------------------

def test_geohash_roundtrip(spark):
    # docs example: geohashEncode(-5.60302734375, 42.593994140625)
    assert one(spark, "SELECT geohashEncode(-5.60302734375, "
               "42.593994140625) AS r") == ('ezs42d000000',)
    lon, lat = one(spark, "SELECT geohashDecode('ezs42') AS r")[0]
    assert abs(lon - (-5.60302734375)) < 1e-9
    assert abs(lat - 42.60498046875) < 1e-9


def test_tuple_hamming_distance(spark):
    assert one(spark, "SELECT tupleHammingDistance((1,2,3), (3,2,1)) "
               "AS r") == (2,)


# --- batch 4: maps, window edges, aggregate edges, string breadth,
# conversions ------------------------------------------------------------------

def test_map_functions(spark):
    assert one(spark, "SELECT mapKeys(map('a',1,'b',2)) AS k, "
               "mapValues(map('a',1,'b',2)) AS v, "
               "mapContains(map('a',1), 'a') AS y, "
               "mapContains(map('a',1), 'z') AS n") \
        == (['a', 'b'], [1, 2], True, False)
    assert one(spark, "SELECT mapAdd(map(1,1), map(1,1)) AS r") \
        == ({1: 2},)
    assert one(spark, "SELECT mapSubtract(map(1,2), map(1,1)) AS r") \
        == ({1: 1},)


def test_map_populate_series(spark):
    r = one(spark, "SELECT mapPopulateSeries([1,2,4], [11,22,44], 5) "
            "AS r")[0]
    assert tuple(r) == ([1, 2, 3, 4, 5], [11, 22, 0, 44, 0])


def test_map_hof(spark):
    assert one(spark, "SELECT mapFilter((k, v) -> v > 1, "
               "map('a',1,'b',2)) AS r") == ({'b': 2},)
    assert one(spark, "SELECT mapApply((k, v) -> (k, v * 2), "
               "map('a',1)) AS r") == ({'a': 2},)


def test_window_rank_family(spark):
    assert rows(spark, "SELECT number, ntile(2) OVER (ORDER BY number) "
                "AS t FROM numbers(4) ORDER BY number") \
        == [(0, 1), (1, 1), (2, 2), (3, 2)]
    assert rows(spark, "SELECT number, nth_value(number, 2) OVER ("
                "ORDER BY number ROWS BETWEEN UNBOUNDED PRECEDING AND "
                "UNBOUNDED FOLLOWING) AS n FROM numbers(3) "
                "ORDER BY number") == [(0, 1), (1, 1), (2, 1)]
    assert rows(spark, "SELECT number, round(percent_rank() OVER ("
                "ORDER BY number), 6) AS p, round(cume_dist() OVER ("
                "ORDER BY number), 6) AS c FROM numbers(3) "
                "ORDER BY number") \
        == [(0, 0.0, 0.333333), (1, 0.5, 0.666667), (2, 1.0, 1.0)]


def test_agg_arg_min_max_weighted(spark):
    assert one(spark, "SELECT argMax(number, number % 3) AS r "
               "FROM numbers(5)") == (2,)
    assert one(spark, "SELECT avgWeighted(x, w) AS r FROM (SELECT "
               "arrayJoin([(4,1),(1,0),(10,2)]) AS t, t.1 AS x, "
               "t.2 AS w)") == (8.0,)


def test_agg_sum_count_entropy(spark):
    assert tuple(one(spark, "SELECT sumCount(number) AS r "
                     "FROM numbers(4)")[0]) == (6, 4)
    assert one(spark, "SELECT entropy(number % 2) AS a, "
               "entropy(number) AS b FROM numbers(4)") == (1.0, 2.0)


def test_agg_group_bit(spark):
    assert one(spark, "SELECT groupBitAnd(x) AS a, groupBitOr(x) AS o, "
               "groupBitXor(x) AS r FROM (SELECT arrayJoin([7,3,1]) "
               "AS x)") == (1, 7, 5)


def test_array_enumerate_family(spark):
    assert one(spark, "SELECT arrayEnumerate([10,20,30]) AS a, "
               "arrayEnumerateDense([10,20,10,30]) AS d, "
               "arrayEnumerateUniq([10,20,10,30]) AS u") \
        == ([1, 2, 3], [1, 2, 1, 3], [1, 1, 2, 1])


def test_array_dot_jaccard(spark):
    assert one(spark, "SELECT arrayDotProduct([1,2,3], [4,5,6]) AS d, "
               "round(arrayJaccardIndex([1,2], [2,3]), 6) AS j") \
        == (32, 0.333333)


def test_string_pad_translate(spark):
    assert one(spark, "SELECT leftPad('abc', 7, '*') AS a, "
               "rightPad('abc', 7, '*') AS b, leftPad('abc', 2) AS c") \
        == ('****abc', 'abc****', 'ab')
    assert one(spark, "SELECT translate('Hello, World!', 'delor', "
               "'DELOR') AS r") == ('HELLO, WORLD!',)


def test_substring_index(spark):
    assert one(spark, "SELECT substringIndex('www.clickhouse.com', '.', "
               "2) AS a, substringIndex('www.clickhouse.com', '.', -2) "
               "AS b") == ('www.clickhouse', 'clickhouse.com')


def test_string_format_repeat(spark):
    assert one(spark, "SELECT format('{1} {0}', 'World', 'Hello') AS a, "
               "format('{} {}', 'Hello', 'World') AS b, "
               "repeat('ab', 3) AS c, space(3) AS d") \
        == ('Hello World', 'Hello World', 'ababab', '   ')


def test_string_utf8_trim_concat(spark):
    assert one(spark, "SELECT reverseUTF8('привет') AS a, "
               "trim(BOTH 'x' FROM 'xxfooxx') AS b, "
               "concatWithSeparator(',', 'a', 'b') AS c, "
               "initcap('hello world') AS d") \
        == ('тевирп', 'foo', 'a,b', 'Hello World')


def test_string_jaccard_try_base64(spark):
    assert one(spark, "SELECT stringJaccardIndex('clickhouse', 'mouse') "
               "AS a, tryBase64Decode('invalid!') AS b") == (0.4, '')


def test_unix_timestamp_roundtrip_utc(spark):
    # values are UTC: the engine pins spark.sql.session.timeZone
    assert one(spark, "SELECT toUnixTimestamp(toDateTime("
               "'2017-11-05 08:07:47')) AS a, "
               "toString(fromUnixTimestamp(423543535)) AS b") \
        == (1509869267, '1983-06-04 02:58:55')


def test_to_start_of_interval_units(spark):
    assert one(spark, "SELECT toString(toStartOfInterval(toDateTime("
               "'2023-01-05 14:17:30'), INTERVAL 15 MINUTE)) AS a, "
               "toString(toStartOfInterval(toDate('2023-01-05'), "
               "INTERVAL 1 MONTH)) AS b, "
               "toString(toStartOfInterval(toDate('2023-05-05'), "
               "INTERVAL 1 QUARTER)) AS c, "
               "toString(toStartOfInterval(toDate('2023-08-15'), "
               "INTERVAL 2 YEAR)) AS d, "
               "toString(toStartOfInterval(toDate('2023-01-05'), "
               "INTERVAL 1 WEEK)) AS e") \
        == ('2023-01-05 14:15:00', '2023-01-01', '2023-04-01',
            '2022-01-01', '2023-01-02')


def test_date_add_sub_unit_form(spark):
    assert one(spark, "SELECT toString(date_add(YEAR, 3, "
               "toDate('2018-01-01'))) AS a, toString(date_sub(YEAR, 3, "
               "toDate('2018-01-01'))) AS b") \
        == ('2021-01-01', '2015-01-01')


def test_decimal_fixed_string_accurate_cast(spark):
    assert one(spark, "SELECT toTypeName(toDecimal32('1.55', 2)) AS t, "
               "toFixedString('foo', 8) AS f, "
               "accurateCastOrNull(257, 'UInt8') AS o, "
               "accurateCastOrNull(5, 'UInt8') AS i") \
        == ('Decimal(9, 2)', 'foo' + '\x00' * 5, None, 5)


def test_alias_of_array_join_tuple_access(spark):
    # t.1 through the alias of an inline array-of-tuples arrayJoin
    assert rows(spark, "SELECT arrayJoin([(4,1),(10,2)]) AS t, "
                "t.1 AS x, t.2 AS w ORDER BY x")[0][1:] == (4, 1)


# --- batch 5: NULL propagation, ranged OrNull casts, parseDateTime,
# range/HOF firsts, moving aggregates, intervals, URL component ----------------

def test_null_propagation(spark):
    assert one(spark, "SELECT 1 + NULL AS a, concat('a', NULL) AS b, "
               "isNull(NULL + 1) AS c, NULL = NULL AS d, "
               "NULL IS NULL AS e") == (None, None, True, None, True)


def test_or_null_range_checked(spark):
    # CH readIntText range-checks the declared width, not the storage
    assert one(spark, "SELECT toUInt8OrNull('256') AS a, "
               "toUInt8OrNull('-1') AS b, toUInt8OrNull('7') AS c, "
               "toInt8OrNull('128') AS d, toInt8OrNull('-128') AS e, "
               "toUInt16OrNull('65536') AS f, "
               "toInt32OrNull('2147483648') AS g") \
        == (None, None, 7, None, -128, None, None)


def test_or_zero_or_default_ranged(spark):
    assert one(spark, "SELECT toUInt8OrZero('256') AS a, "
               "toUInt8OrZero('9') AS b, "
               "toUInt8OrDefault('256', 5) AS c") == (0, 9, 5)


def test_parse_date_time_family(spark):
    assert one(spark, "SELECT toString(parseDateTimeBestEffort("
               "'2018-12-12 10:12:12')) AS a, "
               "parseDateTimeBestEffortOrNull('junk') AS b, "
               "toString(parseDateTime('2021-01-04+23:00:00', "
               "'%Y-%m-%d+%H:%i:%s')) AS c") \
        == ('2018-12-12 10:12:12', None, '2021-01-04 23:00:00')


def test_range_forms(spark):
    assert one(spark, "SELECT range(5) AS a, range(2, 5) AS b, "
               "range(0, 10, 3) AS c, arrayWithConstant(3, 'x') AS d") \
        == ([0, 1, 2, 3, 4], [2, 3, 4], [0, 3, 6, 9], ['x', 'x', 'x'])
    assert one(spark, "SELECT emptyArrayUInt8() AS a, "
               "emptyArrayToSingle(emptyArrayUInt8()) AS b") == ([], [0])


def test_numbers_offset_form(spark):
    assert rows(spark, "SELECT number FROM numbers(2, 3) "
                "ORDER BY number") == [(2,), (3,), (4,)]


def test_array_first_last_index(spark):
    assert one(spark, "SELECT arrayFirst(x -> x > 1, [1,2,3]) AS a, "
               "arrayFirstIndex(x -> x > 1, [1,2,3]) AS b, "
               "arrayLast(x -> x > 1, [1,2,3]) AS c, "
               "arrayLastIndex(x -> x > 1, [1,2,3]) AS d") == (2, 2, 3, 3)


def test_array_split(spark):
    assert one(spark, "SELECT arraySplit((x, y) -> y, [1,2,3,4,5], "
               "[1,0,0,1,0]) AS r") == ([[1, 2, 3], [4, 5]],)


def test_group_array_moving(spark):
    # moving windows always divide by the window SIZE (docs example)
    assert one(spark, "SELECT groupArrayMovingSum(2)(x) AS r FROM "
               "(SELECT arrayJoin([1,2,3,4]) AS x)") == ([1, 3, 5, 7],)
    assert one(spark, "SELECT groupArrayMovingAvg(2)(x) AS r FROM "
               "(SELECT arrayJoin([2.0,4.0,6.0,8.0]) AS x)") \
        == ([1.0, 3.0, 5.0, 7.0],)


def test_uniq_up_to(spark):
    # returns the exact count up to N, N+1 past it (docs contract)
    assert one(spark, "SELECT uniqUpTo(2)(x) AS r FROM "
               "(SELECT arrayJoin([1,2,3]) AS x)") == (3,)
    assert one(spark, "SELECT uniqUpTo(2)(x) AS r FROM "
               "(SELECT arrayJoin([1,2]) AS x)") == (2,)


def test_array_roc_auc(spark):
    assert one(spark, "SELECT arrayROCAUC([0.1, 0.4, 0.35, 0.8], "
               "[0, 0, 1, 1]) AS r") == (0.75,)


def test_interval_arithmetic_types(spark):
    # Date ± day-or-wider interval stays Date
    assert one(spark, "SELECT toString(toDate('2020-01-01') + "
               "INTERVAL 1 MONTH) AS a, toString(toDate('2020-03-31') "
               "- INTERVAL 1 MONTH) AS b, "
               "toString(toDate('2020-01-01') + toIntervalDay(5)) AS c, "
               "toString(toDateTime('2020-01-01 00:00:00') + "
               "INTERVAL 90 SECOND) AS d") \
        == ('2020-02-01', '2020-02-29', '2020-01-06',
            '2020-01-01 00:01:30')


def test_to_start_of_subhour(spark):
    assert one(spark, "SELECT toString(toStartOfFifteenMinutes("
               "toDateTime('2023-04-21 10:20:00'))) AS a, "
               "toString(toStartOfTenMinutes(toDateTime("
               "'2023-04-21 10:23:00'))) AS b, "
               "toString(toStartOfFiveMinutes(toDateTime("
               "'2023-04-21 10:23:00'))) AS c, "
               "toString(toStartOfHour(toDateTime("
               "'2023-04-21 10:20:30'))) AS d") \
        == ('2023-04-21 10:15:00', '2023-04-21 10:20:00',
            '2023-04-21 10:20:00', '2023-04-21 10:00:00')


def test_regexp_extract(spark):
    assert one(spark, "SELECT regexpExtract('100-200', "
               "'(\\\\d+)-(\\\\d+)', 1) AS a, regexpExtract('100-200', "
               "'(\\\\d+)-(\\\\d+)', 2) AS b") == ('100', '200')


def test_encode_url_component_rfc3986(spark):
    # %20 for space (component encoding), not '+' (form encoding)
    assert one(spark, "SELECT encodeURLComponent('a b&c') AS r") \
        == ('a%20b%26c',)
    assert one(spark, "SELECT decodeURLComponent(encodeURLComponent("
               "'a b&c=d/e')) AS r") == ('a b&c=d/e',)


# --- batch 6: rounding buckets, helpers, subsequences, tokenizers,
# exact javaHash/hiveHash, neighbor type-default --------------------------------

def test_rounding_buckets(spark):
    assert one(spark, "SELECT roundToExp2(31) AS a, roundToExp2(32) AS b,"
               " roundToExp2(0) AS c, roundDown(5, [2,4,8]) AS d, "
               "roundDown(1, [2,4,8]) AS e") == (16, 32, 0, 4, 2)
    assert one(spark, "SELECT roundAge(32) AS a, roundAge(16) AS b, "
               "roundAge(0) AS c, roundDuration(230) AS d, "
               "roundDuration(0) AS e") == (25, 17, 0, 180, 0)


def test_noop_helpers(spark):
    assert one(spark, "SELECT identity(3) AS a, materialize(1) AS b, "
               "ignore(42, 'x') AS c") == (3, 1, 0)
    assert one(spark, "SELECT defaultValueOfArgumentType(3) AS a, "
               "defaultValueOfArgumentType('s') AS b") == (0, '')


def test_has_subsequence(spark):
    assert one(spark, "SELECT hasSubsequence('garbage', 'arg') AS y, "
               "hasSubsequence('garbage', 'zzz') AS n, "
               "hasSubsequenceCaseInsensitive('garbage', 'ARG') AS ci") \
        == (True, False, True)


def test_tokenizers(spark):
    assert one(spark, "SELECT alphaTokens('abca1abc') AS a, "
               "splitByWhitespace('1!  a,  b.  ') AS w, "
               "tokens('Hello, world!') AS t") \
        == (['abca', 'abc'], ['1!', 'a,', 'b.'], ['Hello', 'world'])
    assert one(spark, "SELECT ngrams('ClickHouse', 3) AS r") \
        == (['Cli', 'lic', 'ick', 'ckH', 'kHo', 'Hou', 'ous', 'use'],)


def test_java_hive_hash_exact(spark):
    # Java String.hashCode published contract
    assert one(spark, "SELECT javaHash('Hello, world!') AS a, "
               "hiveHash('Hello, world!') AS b, javaHash('') AS c") \
        == (-1880044555, 267439093, 0)


def test_byte_swap_32(spark):
    assert one(spark, "SELECT byteSwap(3351772109) AS r") \
        == (3455829959,)


def test_readable_time_delta_max_unit(spark):
    assert one(spark, "SELECT formatReadableTimeDelta(7601, 'minutes') "
               "AS r") == ('126 minutes and 41 seconds',)


def test_to_decimal_string(spark):
    assert one(spark, "SELECT toDecimalString(64.32, 5) AS r") \
        == ('64.32000',)


def test_float_special_values(spark):
    assert one(spark, "SELECT isFinite(1/0) AS a, isInfinite(1/0) AS b, "
               "isNaN(0/0) AS c, ifNotFinite(1/0, 42) AS d") \
        == (False, True, True, 42.0)


def test_running_difference_neighbor(spark):
    assert rows(spark, "SELECT runningDifference(number) AS r "
                "FROM numbers(3)") == [(0,), (1,), (1,)]
    # neighbor's out-of-range default is the TYPE default, not NULL
    assert rows(spark, "SELECT neighbor(number, 1) AS r "
                "FROM numbers(3)") == [(1,), (2,), (0,)]


# --- batch 7: parametric aggregates, DateTime64, sumMap duplicate keys,
# bar eighths, arrayReduceInRanges -----------------------------------------------

_EVENTS7 = ("(SELECT arrayJoin(["
            "(1, 1000, 'view'), (1, 1010, 'cart'), (1, 1020, 'buy'),"
            "(2, 2000, 'view'), (2, 2100, 'buy'),"
            "(3, 3000, 'cart'), (3, 3010, 'view')]) AS t,"
            "t.1 AS uid, t.2 AS ts, t.3 AS ev)")


def test_window_funnel_inline(spark):
    assert rows(spark, f"SELECT uid, windowFunnel(50)(ts, ev = 'view', "
                f"ev = 'cart', ev = 'buy') AS lvl FROM {_EVENTS7} "
                f"GROUP BY uid ORDER BY uid") == [(1, 3), (2, 1), (3, 1)]


def test_sequence_match_count_inline(spark):
    assert rows(spark, f"SELECT uid, sequenceMatch('(?1).*(?2)')(ts, "
                f"ev = 'view', ev = 'buy') AS m FROM {_EVENTS7} "
                f"GROUP BY uid ORDER BY uid") \
        == [(1, True), (2, True), (3, False)]
    assert one(spark, "SELECT sequenceCount('(?1)(?2)')(t, n = 1, "
               "n = 2) AS c FROM (SELECT arrayJoin("
               "[(1,1),(2,2),(3,1),(4,2),(5,3)]) AS p, p.1 AS t, "
               "p.2 AS n)") == (2,)


def test_retention_inline(spark):
    assert rows(spark, f"SELECT uid, retention(ev = 'view', "
                f"ev = 'cart', ev = 'buy') AS r FROM {_EVENTS7} "
                f"GROUP BY uid ORDER BY uid") \
        == [(1, [1, 1, 1]), (2, [1, 0, 1]), (3, [1, 1, 0])]


def test_topk_weighted(spark):
    assert one(spark, "SELECT topKWeighted(2)(k, w) AS r FROM (SELECT "
               "arrayJoin([('a',10),('b',1),('c',5)]) AS p, p.1 AS k, "
               "p.2 AS w)") == (['a', 'c'],)


def test_datetime64_precision(spark):
    assert one(spark, "SELECT toTypeName(toDateTime64("
               "'2023-01-01 12:00:00.123', 3)) AS t, "
               "toString(toDateTime64('2023-01-01 12:00:00.123', 3)) "
               "AS s, toUnixTimestamp64Milli(toDateTime64("
               "'2023-01-01 00:00:00.500', 3)) AS ms, "
               "toMillisecond(toDateTime64('2023-01-01 00:00:00.456', "
               "3)) AS f") \
        == ('DateTime64(3)', '2023-01-01 12:00:00.123', 1672531200500,
            456)


def test_decimal_values(spark):
    assert one(spark, "SELECT toString(toDecimal32('1.10', 2) + "
               "toDecimal32('2.25', 2)) AS a, "
               "toString(toDecimal32('1.5', 1) * toDecimal32('2.5', 1))"
               " AS b") == ('3.35', '3.75')
    assert str(one(spark, "SELECT divideDecimal(toDecimal64(-12, 1), "
                   "toDecimal32(2.1, 1), 5) AS r")[0]) == '-5.71429'


def test_uuid_roundtrip(spark):
    assert one(spark, "SELECT toString(toUUID("
               "'61f0c404-5cb3-11e7-907b-a6006ad3dba0')) AS r") \
        == ('61f0c404-5cb3-11e7-907b-a6006ad3dba0',)


def test_sum_map_duplicate_row_keys(spark):
    # CH combines repeated keys WITHIN one row too
    assert tuple(one(spark, "SELECT sumMap([1,2,1], [10,20,30]) "
                     "AS r")[0]) == ([1, 2], [40, 20])
    assert tuple(one(spark, "SELECT sumMap(k, v) AS r FROM (SELECT "
                     "[1,2,1] AS k, [10,20,30] AS v)")[0]) \
        == ([1, 2], [40, 20])


def test_bar_eighth_blocks(spark):
    assert one(spark, "SELECT bar(3.5, 0, 10, 10) AS a, "
               "bar(10, 0, 10, 5) AS b, bar(3, 0, 10, 10) AS c") \
        == ('███▌', '█████', '███')


def test_array_reduce_in_ranges(spark):
    assert one(spark, "SELECT arrayReduceInRanges('sum', "
               "[(1, 5), (2, 3)], [1,2,3,4,5]) AS r") == ([15, 9],)


def test_bounding_ratio(spark):
    assert one(spark, "SELECT boundingRatio(x, y) AS r FROM (SELECT "
               "arrayJoin([(0,0.0),(10,20.0)]) AS p, p.1 AS x, "
               "p.2 AS y)") == (2.0,)


# --- batch 8: relative nums, timeSlots, makeDate forms, map mutation,
# norms, bitSlice, week/month boundaries ----------------------------------------

def test_relative_nums(spark):
    assert one(spark, "SELECT toRelativeDayNum(toDate('1970-01-03')) "
               "AS a, toRelativeHourNum(toDateTime("
               "'1970-01-02 00:00:00')) AS b, toRelativeMinuteNum("
               "toDateTime('1970-01-01 01:30:00')) AS c, "
               "toRelativeSecondNum(toDateTime('1970-01-01 00:02:00')) "
               "AS d") == (2, 24, 90, 120)


def test_time_slots_span(spark):
    # the interval [t, t+duration] touches BOTH half-hour slots
    assert one(spark, "SELECT arrayMap(x -> toString(x), timeSlots("
               "toDateTime('2012-01-01 12:20:00'), toUInt32(600))) "
               "AS r") \
        == (['2012-01-01 12:00:00', '2012-01-01 12:30:00'],)


def test_make_date_forms(spark):
    assert one(spark, "SELECT toString(makeDate(2023, 2, 28)) AS a, "
               "toString(makeDate(2023, 42)) AS b, "
               "toString(makeDateTime(2023, 2, 28, 17, 12, 33)) AS c") \
        == ('2023-02-28', '2023-02-11', '2023-02-28 17:12:33')


def test_yyyymmdd_codecs(spark):
    assert one(spark, "SELECT toString(YYYYMMDDToDate(20230911)) AS a, "
               "toYYYYMMDDhhmmss(toDateTime('2023-09-11 12:13:14')) "
               "AS b") == ('2023-09-11', 20230911121314)


def test_map_mutation(spark):
    assert one(spark, "SELECT mapUpdate(map('k1',1,'k2',2), "
               "map('k1',0)) AS a, mapConcat(map('a',1), map('b',2)) "
               "AS b") == ({'k1': 0, 'k2': 2}, {'a': 1, 'b': 2})
    assert one(spark, "SELECT mapExists((k, v) -> v > 1, "
               "map('a',1,'b',2)) AS y, mapAll((k, v) -> v > 0, "
               "map('a',1,'b',2)) AS a") == (True, True)


def test_map_sort_forms(spark):
    assert one(spark, "SELECT mapSort(map('b',2,'a',1)) AS r") \
        == ({'a': 1, 'b': 2},)
    # entry order through mapKeys — Python dicts don't preserve it
    assert one(spark, "SELECT mapKeys(mapSort((k, v) -> v, "
               "map('a',3,'b',1))) AS r") == (['b', 'a'],)
    assert one(spark, "SELECT mapKeys(mapReverseSort("
               "map('a',1,'b',2))) AS r") == (['b', 'a'],)


def test_vector_norms(spark):
    assert one(spark, "SELECT L1Norm([1,-2]) AS a, "
               "L2Norm([3.0,4.0]) AS b, LinfNorm([1,-5]) AS c, "
               "round(LpNorm([1.0,2.0], 2), 6) AS d, "
               "L1Distance([1,2],[2,3]) AS e") == (3, 5.0, 5.0,
                                                   2.236068, 2)
    assert one(spark, "SELECT L2Normalize([3.0, 4.0]) AS r") \
        == ([0.6, 0.8],)


def test_dot_product_tuple_and_array(spark):
    assert one(spark, "SELECT dotProduct((1, 2), (3, 4)) AS a, "
               "dotProduct([1, 2], [3, 4]) AS b") == (11, 11)


def test_snowflake_roundtrip(spark):
    assert one(spark, "SELECT toString(snowflakeToDateTime("
               "dateTimeToSnowflake(toDateTime("
               "'2021-08-15 18:57:56')))) AS r") \
        == ('2021-08-15 18:57:56',)


def test_bit_slice(spark):
    assert one(spark, "SELECT bitSlice('Hello', 1, 8) AS a, "
               "bitSlice('Hello', 9, 8) AS b") == ('H', 'e')


def test_count_substrings_case_insensitive(spark):
    assert one(spark, "SELECT countSubstringsCaseInsensitive('AAaa', "
               "'aa') AS r") == (2,)


def test_week_month_boundaries(spark):
    # 2024-01-03 is a Wednesday: last day of its Sunday-first week is
    # Saturday the 6th
    assert one(spark, "SELECT toString(toLastDayOfWeek(toDate("
               "'2024-01-03'))) AS a, toString(toFirstDayOfMonth("
               "toDate('2024-01-15'))) AS b") \
        == ('2024-01-06', '2024-01-01')


# --- batch 10: bitmap scalars, Resample, type introspection, geometry ---------

def test_bitmap_scalar_family(spark):
    assert one(spark, "SELECT bitmapToArray(bitmapBuild([1,2,3])) AS a,"
               " bitmapCardinality(bitmapBuild([1,2,3])) AS b") \
        == ([1, 2, 3], 3)
    assert one(spark, "SELECT bitmapToArray(bitmapAnd(bitmapBuild("
               "[1,2,3]), bitmapBuild([3,4,5]))) AS a, "
               "bitmapToArray(bitmapOr(bitmapBuild([1,2]), "
               "bitmapBuild([3]))) AS o, "
               "bitmapToArray(bitmapXor(bitmapBuild([1,2,3]), "
               "bitmapBuild([3,4]))) AS x, "
               "bitmapToArray(bitmapAndnot(bitmapBuild([1,2,3]), "
               "bitmapBuild([3]))) AS n") \
        == ([3], [1, 2, 3], [1, 2, 4], [1, 2])
    assert one(spark, "SELECT bitmapContains(bitmapBuild([1,2]), 1) "
               "AS y, bitmapHasAny(bitmapBuild([1,2]), "
               "bitmapBuild([2,3])) AS ha, bitmapHasAll(bitmapBuild("
               "[1,2]), bitmapBuild([2,3])) AS hl, "
               "bitmapMin(bitmapBuild([3,1,5])) AS mn, "
               "bitmapMax(bitmapBuild([3,1,5])) AS mx") \
        == (1, 1, 0, 1, 5)
    assert one(spark, "SELECT bitmapToArray(bitmapSubsetInRange("
               "bitmapBuild([1,5,10]), 2, 11)) AS r") == ([5, 10],)


def test_resample_combinator(spark):
    assert one(spark, "SELECT countResample(0, 4, 2)(number) AS r "
               "FROM numbers(4)") == ([2, 2],)
    assert one(spark, "SELECT sumResample(0, 4, 2)(number, number) "
               "AS r FROM numbers(4)") == ([1, 5],)


def test_type_introspection_breadth(spark):
    assert one(spark, "SELECT toTypeName([1, NULL]) AS a, "
               "toTypeName(toIntervalDay(1)) AS b, "
               "isNullable(toNullable(1)) AS y, isNullable(1) AS n") \
        == ('Array(Nullable(UInt8))', 'IntervalDay', 1, 0)
    assert one(spark, "SELECT defaultValueOfTypeName('UInt8') AS a, "
               "defaultValueOfTypeName('String') AS b, "
               "defaultValueOfTypeName('Nullable(Int8)') AS c") \
        == (0, '', None)


def test_point_in_polygon(spark):
    assert one(spark, "SELECT pointInPolygon((3, 3), [(6, 0), (8, 4), "
               "(5, 8), (0, 2)]) AS r") == (1,)


def test_bankers_rounding_negative(spark):
    assert one(spark, "SELECT round(-2.5) AS a, round(-3.5) AS b") \
        == (-2.0, -4.0)


def test_add_months_clamps(spark):
    assert one(spark, "SELECT toString(addMonths(toDate('2020-01-31'), "
               "1)) AS a, toString(addYears(toDate('2020-02-29'), 1)) "
               "AS b") == ('2020-02-29', '2021-02-28')


# --- batch 11: window RANGE offsets, Kleene logic, running accumulators -------

def test_window_range_value_offsets(spark):
    assert rows(spark, "SELECT number, sum(number) OVER (ORDER BY "
                "number RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS s"
                " FROM numbers(4) ORDER BY number") \
        == [(0, 0), (1, 1), (2, 3), (3, 5)]
    assert rows(spark, "SELECT number, sum(number) OVER (ORDER BY "
                "number RANGE BETWEEN CURRENT ROW AND 2 FOLLOWING) AS s"
                " FROM numbers(4) ORDER BY number") \
        == [(0, 3), (1, 6), (2, 5), (3, 3)]


def test_kleene_null_logic(spark):
    assert one(spark, "SELECT NULL AND 0 AS a, NULL AND 1 AS b, "
               "NULL OR 1 AS c, NULL OR 0 AS d, NOT NULL AS e") \
        == (False, None, True, None, None)


def test_if_null_condition_takes_else(spark):
    assert one(spark, "SELECT if(NULL, 'a', 'b') AS a, "
               "multiIf(NULL, 'a', 1, 'b', 'c') AS b") == ('b', 'b')


def test_non_negative_derivative(spark):
    assert rows(spark, "SELECT nonNegativeDerivative(v, t) AS d FROM "
                "(SELECT arrayJoin([(1, 10.0), (2, 20.0), (3, 15.0)]) "
                "AS p, p.1 AS t, p.2 AS v)") == [(0.0,), (10.0,), (0.0,)]


def test_running_accumulate(spark):
    assert rows(spark, "SELECT grp, runningAccumulate(s) AS r FROM "
                "(SELECT number % 3 AS grp, sumState(number) AS s "
                "FROM numbers(9) GROUP BY grp ORDER BY grp)") \
        == [(0, 9), (1, 21), (2, 36)]


def test_aggregate_result_type_names(spark):
    assert one(spark, "SELECT toTypeName(avg(number)) AS a, "
               "toTypeName(sum(number)) AS s, toTypeName(count()) AS c "
               "FROM numbers(3)") == ('Float64', 'Int64', 'Int64')


def test_array_sort_by_second_array(spark):
    assert one(spark, "SELECT arraySort((x, y) -> y, ['a','b','c'], "
               "[3, 1, 2]) AS r") == (['b', 'c', 'a'],)
    assert one(spark, "SELECT arrayDifference([1, 4, 2]) AS a, "
               "arrayCumSum([1, 2, 3]) AS b, "
               "arrayReverseSort([2, 1, 3]) AS c") \
        == ([0, 3, -2], [1, 3, 6], [3, 2, 1])


def test_concat_mixed_types(spark):
    assert one(spark, "SELECT concat('a', 1, 2.5) AS a, "
               "toString(42) || 'x' AS b") == ('a12.5', '42x')


# --- batch 12: type-dispatched functions inside HOF lambda bodies ----------
# The HOF binds each lambda parameter's dtype from the array argument's
# resolved element type (builder._hof_call → Context.lambda_param_types),
# so length/tupleElement/round/date_trunc/… dispatch correctly where a
# df.select schema probe cannot reach.

def test_lambda_tuple_element(spark):
    assert one(spark, "SELECT arrayMap(t -> t.1, [(1,'a'),(2,'b')]) AS a, "
               "arrayMap(t -> tupleElement(t, 2), [(1,'x'),(2,'y')]) AS b") \
        == ([1, 2], ['x', 'y'])


def test_lambda_polymorphic_length(spark):
    assert one(spark, "SELECT arrayMap(s -> length(s), ['ab','c']) AS a, "
               "arrayMap(a -> length(a), [[1,2],[3]]) AS b, "
               "arrayMap(a -> empty(a), [[], [1]]) AS c") \
        == ([2, 1], [2, 1], [True, False])


def test_lambda_date_trunc_keeps_date(spark):
    assert one(spark, "SELECT arrayMap(d -> toString(date_trunc('month', "
               "d)), [toDate('2024-03-15')]) AS r") == (['2024-03-01'],)


def test_lambda_round_bankers_on_floats(spark):
    assert one(spark, "SELECT arrayMap(v -> round(v, 1), [1.25, 2.35]) "
               "AS r") == ([1.2, 2.4],)


def test_lambda_to_json_string(spark):
    assert one(spark, "SELECT arrayMap(x -> toJSONString(x), [1, 2]) AS a,"
               " arrayMap(s -> toJSONString(s), ['q']) AS b") \
        == (['1', '2'], ['"q"'])


def test_lambda_type_defaults(spark):
    assert one(spark, "SELECT arrayMap(a -> emptyArrayToSingle(a), "
               "[[1], []]) AS a, arrayMap(x -> "
               "defaultValueOfArgumentType(x), [5]) AS b") \
        == ([[1], [0]], [0])


def test_lambda_nested_hof_binding(spark):
    # nested HOF: inner param's type chains through the outer binding
    assert one(spark, "SELECT arrayMap(a -> arrayMap(s -> length(s), a), "
               "[['ab'], ['c','de']]) AS r") == ([[2], [1, 2]],)


def test_lambda_array_sum_widens(spark):
    assert one(spark, "SELECT arrayMap(a -> arraySum(a), [[1,2],[3]]) "
               "AS r") == ([3, 3],)


# --- batch 13: empty-set / empty-subset aggregate defaults ------------------
# CH: "When aggregating over an empty set, aggregate functions return
# their default values"; an -If aggregate whose condition never fires
# is the same empty-set state (sum->0, min/max->type default, avg->nan).

def test_empty_set_aggregate_defaults(spark):
    assert one(spark, "SELECT count() AS c, sum(number) AS s, "
               "min(number) AS mn, max(number) AS mx, "
               "anyLast(number) AS al FROM numbers(10) WHERE 0") \
        == (0, 0, 0, 0, 0)


def test_empty_set_nan_family(spark):
    import math
    r = one(spark, "SELECT avg(number) AS a, stddevPop(number) AS sd, "
            "quantile(0.5)(number) AS q, corr(number, number) AS c "
            "FROM numbers(10) WHERE 0")
    assert all(isinstance(v, float) and math.isnan(v) for v in r)


def test_empty_set_string_and_array_defaults(spark):
    assert one(spark, "SELECT any(s) AS a, min(s) AS m FROM "
               "(SELECT 'a' AS s WHERE 0)") == ('', '')
    assert one(spark, "SELECT groupArray(number) AS g, topK(3)(number) "
               "AS t FROM numbers(10) WHERE 0") == ([], [])


def test_empty_set_or_null_keeps_null(spark):
    assert one(spark, "SELECT sumOrNull(number) AS s, minOrNull(number)"
               " AS m FROM numbers(10) WHERE 0") == (None, None)


def test_if_never_true_condition_defaults(spark):
    import math
    assert one(spark, "SELECT sumIf(number, number > 100) AS s, "
               "maxIf(number, number > 100) AS m, "
               "countIf(number > 100) AS c FROM numbers(10)") == (0, 0, 0)
    a = one(spark, "SELECT avgIf(number, number > 100) AS a "
            "FROM numbers(10)")[0]
    assert isinstance(a, float) and math.isnan(a)


def test_if_never_true_grouped_defaults(spark):
    # the empty-subset rule applies PER GROUP, not just keyless
    assert rows(spark, "SELECT number % 2 AS g, sumIf(number, number > "
                "100) AS s FROM numbers(4) GROUP BY g ORDER BY g") \
        == [(0, 0), (1, 0)]


def test_filter_where_never_true_defaults(spark):
    assert one(spark, "SELECT sum(number) FILTER (WHERE number > 100) "
               "AS s FROM numbers(10)") == (0,)


def test_empty_set_summap_empty_tuple(spark):
    assert one(spark, "SELECT sumMap([number], [number]).1 AS k "
               "FROM numbers(3) WHERE 0") == ([],)


def test_empty_set_group_by_yields_no_rows(spark):
    assert rows(spark, "SELECT number % 2 AS g, sum(number) AS s "
                "FROM numbers(10) WHERE 0 GROUP BY g") == []


# --- batch 14: IN null processing, tuple compare, enumerate, SQL/JSON -------

def test_in_with_null_never_null(spark):
    # operators/in#null-processing (transform_null_in=0): IN involving
    # NULL is always 0/1, never NULL; NOT IN is the exact complement
    assert one(spark, "SELECT 1 IN (NULL, 1) AS a, 2 IN (NULL, 1) AS b,"
               " 2 NOT IN (NULL, 1) AS c") == (True, False, True)
    # a NULL lhs yields 0 for BOTH IN and NOT IN (the result of an IN
    # operation involving NULL is always 0 — never the complement)
    assert one(spark, "SELECT NULL IN (1, 2) AS a, NULL NOT IN (1, 2) "
               "AS b, NULL IN (NULL) AS c") == (False, False, False)


def test_in_subquery_with_nulls(spark):
    assert rows(spark, "SELECT number NOT IN (SELECT nullIf(number, 1) "
                "FROM numbers(3)) AS r FROM numbers(3) ORDER BY number") \
        == [(False,), (True,), (False,)]


def test_tuple_lexicographic_compare(spark):
    assert one(spark, "SELECT (1, 2) < (1, 3) AS a, (1, 2) < (1, 2) AS "
               "b, (2, 0) > (1, 9) AS c, (1, 'a') = (1, 'a') AS d") \
        == (True, False, True, True)


def test_array_enumerate_family(spark):
    assert one(spark, "SELECT arrayEnumerate([10,20,30]) AS a, "
               "arrayEnumerateUniq([10,20,10,30,10]) AS b, "
               "arrayEnumerateDense([10,20,10,30]) AS c") \
        == ([1, 2, 3], [1, 1, 2, 1, 3], [1, 2, 1, 3])


def test_bitmask_helpers(spark):
    assert one(spark, "SELECT bitmaskToList(50) AS a, "
               "bitmaskToArray(50) AS b") == ('2,16,32', [2, 16, 32])


def test_sql_json_standard_forms(spark):
    # JSON_QUERY wraps raw JSON in an array, strings stay quoted
    assert one(spark, "SELECT JSON_QUERY('{\"hello\":\"world\"}', "
               "'$.hello') AS a, JSON_QUERY('{\"a\":[1,2]}', '$.a') AS "
               "b, JSON_VALUE('{\"a\":\"x\"}', '$.a') AS c, "
               "JSON_EXISTS('{\"a\":1}', '$.a') AS d") \
        == ('["world"]', '[[1,2]]', 'x', True)


def test_has_null_needle_and_absent(spark):
    assert one(spark, "SELECT has([1, NULL, 2], NULL) AS a, "
               "indexOf([1, NULL, 2], NULL) AS b, "
               "countEqual([1, NULL, 1], NULL) AS c, "
               "has([1, NULL], 3) AS d") == (True, 2, 1, False)


def test_order_by_array_lexicographic(spark):
    assert rows(spark, "SELECT a FROM (SELECT arrayJoin([[2], [1, 3], "
                "[1, 2]]) AS a) ORDER BY a") \
        == [([1, 2],), ([1, 3],), ([2],)]


# --- batch 16: age(), deltaSum, minMap/maxMap, hex/bin widths ---------------

def test_age_counts_complete_units(spark):
    assert one(spark, "SELECT age('year', toDate('2021-12-29'), "
               "toDate('2022-01-01')) AS a, dateDiff('year', "
               "toDate('2021-12-29'), toDate('2022-01-01')) AS d") \
        == (0, 1)
    assert one(spark, "SELECT age('month', toDate('2021-01-31'), "
               "toDate('2021-02-28')) AS a, age('month', "
               "toDate('2021-01-01'), toDate('2021-02-01')) AS b") \
        == (0, 1)


def test_delta_sum_positive_differences(spark):
    assert one(spark, "SELECT deltaSum(v) AS d FROM (SELECT "
               "arrayJoin([1, 3, 2, 4]) AS v)") == (4,)


def test_min_max_map(spark):
    assert one(spark, "SELECT minMap([1, 2], [v, 10 - v]).2 AS a, "
               "maxMap([1, 2], [v, 10 - v]).2 AS b FROM (SELECT "
               "arrayJoin([2, 5]) AS v)") == ([2, 5], [5, 8])


def test_hex_bin_pad_to_type_width(spark):
    # hex/bin render the DECLARED type's full byte pattern:
    # hex(1)='01' (UInt8 literal), hex(256)='0100' (UInt16),
    # hex(toUInt32(1))='00000001', sign-extension at the type width
    assert one(spark, "SELECT hex(1) AS a, hex(255) AS b, hex(256) AS "
               "c, hex(toUInt32(1)) AS d, hex(toInt8(-1)) AS e, "
               "bin(toInt8(-1)) AS f, bin(5) AS g") \
        == ('01', 'FF', '0100', '00000001', 'FF', '11111111',
            '00000101')
    assert one(spark, "SELECT hex('ab') AS a, unhex('6162') AS b") \
        == ('6162', 'ab')


def test_interval_length_sum(spark):
    assert one(spark, "SELECT intervalLengthSum(s, e) AS r FROM "
               "(SELECT arrayJoin([(1, 3), (2, 5), (7, 8)]) AS p, "
               "p.1 AS s, p.2 AS e)") == (5,)


def test_week_start_functions(spark):
    assert one(spark, "SELECT toString(toMonday(toDate('2024-03-14')))"
               " AS a, toString(toStartOfWeek(toDate('2024-03-14'))) "
               "AS b, toString(toStartOfWeek(toDate('2024-03-14'), 1))"
               " AS c, toString(toLastDayOfMonth(toDate('2024-02-05')))"
               " AS d") \
        == ('2024-03-11', '2024-03-10', '2024-03-11', '2024-02-29')


# --- batch 17: substring negatives, split edges, decimal toString, misc -----

def test_substring_negative_offset(spark):
    assert one(spark, "SELECT substring('hello', -3, 2) AS a, "
               "substring('hello', 2) AS b, substringUTF8('привет', 2, "
               "3) AS c") == ('ll', 'ello', 'рив')


def test_split_by_char_edges(spark):
    assert one(spark, "SELECT splitByChar(',', '') AS a, "
               "splitByChar(',', 'a,') AS b, splitByChar(',', ',a') AS "
               "c, splitByString('ab', 'cabd') AS d") \
        == ([''], ['a', ''], ['', 'a'], ['c', 'd'])


def test_decimal_tostring_trims_trailing_zeros(spark):
    # output_format_decimal_trailing_zeros defaults to false
    # (reference Core/Settings.h:609): 1.50 prints as '1.5'
    assert one(spark, "SELECT toString(toDecimal32(1.5, 2)) AS a, "
               "toString(toDecimal64(-3, 3)) AS b, "
               "toString(toDecimal32(1.25, 4)) AS c") \
        == ('1.5', '-3', '1.25')


def test_array_join_over_map(spark):
    # arrayJoin over a Map iterates (key, value) tuples — one column
    assert rows(spark, "SELECT kv.1 AS k, kv.2 AS v FROM (SELECT "
                "arrayJoin(map('a', 1, 'b', 2)) AS kv) ORDER BY k") \
        == [('a', 1), ('b', 2)]
    assert len(rows(spark, "SELECT arrayJoin(map('a', 1, 'b', 2)) AS "
                   "kv ORDER BY kv.1")) == 2


def test_int_exp_and_low_cardinality(spark):
    assert one(spark, "SELECT intExp2(10) AS a, intExp10(3) AS b, "
               "toLowCardinality('x') AS c") == (1024, 1000, 'x')


def test_pad_truncates_longer_input(spark):
    assert one(spark, "SELECT leftPad('abc', 2) AS a, rightPad('abc', "
               "2, '*') AS b, leftPad('a', 3, 'xy') AS c") \
        == ('ab', 'ab', 'xya')


# --- batch 18: compositions of the round-7 semantic fixes -------------------

def test_if_defaults_under_totals_and_rollup(spark):
    # totals / rolled-up key cells carry the key TYPE'S default (0 for
    # UInt64), not NULL — pre-group_by_use_nulls ClickHouse semantics;
    # the totals/grand-total row is the duplicated g=0 key
    assert sorted(rows(spark, "SELECT number % 2 AS g, sumIf(number, "
                  "number > 100) AS s FROM numbers(4) GROUP BY g WITH "
                  "TOTALS ORDER BY g")) == [(0, 0), (0, 0), (1, 0)]
    assert sorted(rows(spark, "SELECT number % 2 AS g, maxIf(number, "
                  "number > 100) AS m FROM numbers(4) GROUP BY "
                  "ROLLUP(g) ORDER BY g NULLS LAST")) \
        == [(0, 0), (0, 0), (1, 0)]


def test_in_null_in_where_position(spark):
    assert rows(spark, "SELECT number FROM numbers(3) WHERE number IN "
                "(NULL, 1)") == [(1,)]
    assert rows(spark, "SELECT number FROM numbers(3) WHERE number NOT"
                " IN (NULL, 1) ORDER BY number") == [(0,), (2,)]


def test_setop_null_rows_compare_equal(spark):
    assert rows(spark, "SELECT NULL AS n INTERSECT SELECT NULL AS n") \
        == [(None,)]
    assert rows(spark, "SELECT 1 AS n EXCEPT SELECT NULL AS n") \
        == [(1,)]
    assert rows(spark, "SELECT NULL AS n EXCEPT SELECT NULL AS n") == []


def test_array_join_map_group_by(spark):
    assert rows(spark, "SELECT kv.1 AS k, sum(kv.2) AS s FROM (SELECT "
                "arrayJoin(map('a', number, 'b', 1)) AS kv FROM "
                "numbers(3)) GROUP BY k ORDER BY k") \
        == [('a', 3), ('b', 3)]


def test_numbers_declares_uint64(spark):
    # SystemNumbers: number is UInt64, so number % 2 is UInt8
    # (ResultOfModulo = divisor width, unsigned dividend)
    assert one(spark, "SELECT toTypeName(number) AS t, "
               "toTypeName(number % 2) AS m, hex(number % 2) AS h "
               "FROM numbers(1)") == ('UInt64', 'UInt8', '00')


# --- batch 19: ISO week, decimal scale arithmetic, extract, trunc -----------

def test_iso_week_year(spark):
    assert one(spark, "SELECT toISOWeek(toDate('2024-01-01')) AS a, "
               "toISOYear(toDate('2023-01-01')) AS b, "
               "toISOWeek(toDate('2023-01-01')) AS c") == (1, 2022, 52)


def test_decimal_arith_scale(spark):
    # multiply adds scales, plus takes max scale; rendering trims zeros
    assert one(spark, "SELECT toString(toDecimal32(2.5, 1) * "
               "toDecimal32(2.5, 1)) AS a, toString(toDecimal32(1.1, "
               "1) + toDecimal32(2.25, 2)) AS b") == ('6.25', '3.35')


def test_extract_and_count_matches(spark):
    assert one(spark, "SELECT extract('hello123world456', '\\\\d+') AS"
               " a, extractAll('hello123world456', '\\\\d+') AS b, "
               "countMatches('aaaa', 'aa') AS c, translate('abc', "
               "'ab', 'xy') AS d") == ('123', ['123', '456'], 2, 'xyc')


def test_trunc_rounds_toward_zero(spark):
    assert one(spark, "SELECT trunc(-1.9) AS a, trunc(1.9) AS b, "
               "truncate(-12.345, 2) AS c, floor(-1.9) AS d") \
        == (-1.0, 1.0, -12.34, -2.0)


def test_array_rotate_shingles(spark):
    assert one(spark, "SELECT arrayRotateLeft([1,2,3], 1) AS a, "
               "arrayRotateRight([1,2,3], 1) AS b, "
               "arrayShingles([1,2,3], 2) AS c") \
        == ([2, 3, 1], [3, 1, 2], [[1, 2], [2, 3]])


def test_map_helper_trio(spark):
    assert one(spark, "SELECT mapContains(map('a',1), 'a') AS a, "
               "mapKeys(map('a',1,'b',2)) AS k, "
               "mapValues(map('a',1,'b',2)) AS v") \
        == (True, ['a', 'b'], [1, 2])


def test_modulo_or_zero(spark):
    assert one(spark, "SELECT moduloOrZero(5, 0) AS a, "
               "intDivOrZero(5, 0) AS b") == (0, 0)


# --- batch 20: empty window frames get aggregate defaults -------------------

def test_empty_frame_defaults(spark):
    # an empty ROWS frame is a default-initialized aggregate state:
    # sum/max -> 0, count -> 0, avg -> nan — never NULL
    assert rows(spark, "SELECT number, sum(number) OVER (ORDER BY "
                "number ROWS BETWEEN 2 FOLLOWING AND 3 FOLLOWING) AS s"
                " FROM numbers(3) ORDER BY number") \
        == [(0, 2), (1, 0), (2, 0)]
    assert rows(spark, "SELECT number, count(number) OVER (ORDER BY "
                "number ROWS BETWEEN 2 FOLLOWING AND 3 FOLLOWING) AS c"
                " FROM numbers(3) ORDER BY number") \
        == [(0, 1), (1, 0), (2, 0)]
    import math
    r = rows(spark, "SELECT avg(number) OVER (ORDER BY number ROWS "
             "BETWEEN 2 FOLLOWING AND 3 FOLLOWING) AS a FROM "
             "numbers(2) ORDER BY number")
    assert math.isnan(r[1][0])


def test_empty_frame_group_array(spark):
    assert rows(spark, "SELECT number, groupArray(number) OVER (ORDER "
                "BY number ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) "
                "AS g FROM numbers(2) ORDER BY number") \
        == [(0, [1]), (1, [])]


def test_windowed_sum_if(spark):
    assert rows(spark, "SELECT number, sumIf(number, number > 100) "
                "OVER (ORDER BY number ROWS BETWEEN UNBOUNDED "
                "PRECEDING AND CURRENT ROW) AS s FROM numbers(2) "
                "ORDER BY number") == [(0, 0), (1, 0)]


def test_tuple_in_with_null_member(spark):
    assert one(spark, "SELECT (1, NULL) IN ((1, NULL)) AS a, "
               "(1, 2) IN ((1, NULL), (1, 2)) AS b") == (False, True)


def test_array_fold_typed_acc(spark):
    assert one(spark, "SELECT arrayFold((acc, x) -> acc + x, [1,2,3], "
               "toInt64(10)) AS a, arrayFold((acc, x) -> "
               "arrayPushBack(acc, x * 2), [1, 2], emptyArrayInt64()) "
               "AS b") == (16, [2, 4])


# --- batch 21: SQL-surface edges --------------------------------------------

def test_group_by_constant_and_tuple(spark):
    assert rows(spark, "SELECT count() AS c FROM numbers(5) "
                "GROUP BY 'a'") == [(5,)]
    assert rows(spark, "SELECT (number % 2) AS g, groupArray(number) "
                "AS xs FROM numbers(4) GROUP BY g ORDER BY g") \
        == [(0, [0, 2]), (1, [1, 3])]


def test_having_without_group_by(spark):
    assert rows(spark, "SELECT sum(number) AS s FROM numbers(5) "
                "HAVING sum(number) > 100") == []
    assert rows(spark, "SELECT sum(number) AS s FROM numbers(5) "
                "HAVING s > 5") == [(10,)]


def test_negative_array_index_bracket(spark):
    assert one(spark, "SELECT [1,2,3][-1] AS a, "
               "arrayElement([1,2,3], -2) AS b") == (3, 2)


def test_chained_interval_arithmetic(spark):
    assert one(spark, "SELECT toString(toDateTime('2024-01-01 "
               "00:00:00') + INTERVAL 1 DAY + INTERVAL 2 HOUR) AS a, "
               "toString(toDate('2024-03-14') - INTERVAL 2 WEEK) AS b")\
        == ('2024-01-02 02:00:00', '2024-02-29')


def test_hex_escape_in_string_literal(spark):
    assert one(spark, "SELECT '\\x41' AS a, length('a\\nb') AS b") \
        == ('A', 3)


def test_unary_minus_typing(spark):
    assert one(spark, "SELECT -number AS n, toTypeName(-number) AS t "
               "FROM numbers(1)") == (0, 'Int64')


# --- batch 22: CH literal rendering of composites, CAST parse, VALUES -------

def test_tostring_composites_render_ch_literals(spark):
    assert one(spark, "SELECT toString([1, 2, 3]) AS a, "
               "toString(['a', 'b']) AS b, toString((1, 'a')) AS c, "
               "toString(map('a', 1)) AS d, toString([[1], [2, 3]]) "
               "AS e, toString([1, NULL, 2]) AS f") \
        == ('[1,2,3]', "['a','b']", "(1,'a')", "{'a':1}", '[[1],[2,3]]',
            '[1,NULL,2]')
    assert one(spark, "SELECT toString([toDate('2024-01-01')]) AS r") \
        == ("['2024-01-01']",)


def test_cast_string_to_array_parses_literal(spark):
    assert one(spark, "SELECT CAST('[1,2,3]' AS Array(Int32)) AS a, "
               "CAST('[''a'',''b'']' AS Array(String)) AS b") \
        == ([1, 2, 3], ['a', 'b'])


def test_values_tf_interprets_expressions(spark):
    # input_format_values_interpret_expressions defaults to 1
    assert rows(spark, "SELECT * FROM values('a Int32, b String', "
                "(1 + 1, lower('A')), (3, 'b')) ORDER BY a") \
        == [(2, 'a'), (3, 'b')]


def test_totypename_map_renders_fully(spark):
    # no more 'Map(...)' placeholder — full recursive type names;
    # literal element typing now reaches map() constructor values
    # (FieldToDataType: 1 -> UInt8), matching the bare-literal paths
    assert one(spark, "SELECT toTypeName(map('a', 1)) AS a, "
               "toTypeName(map('k', (1, 'x'))) AS b") \
        == ('Map(String, UInt8)', 'Map(String, Tuple(UInt8, String))')


# --- batch 24: array aggregate NULL-skipping, tz display, finite helpers ----

def test_array_aggregates_skip_nulls(spark):
    assert one(spark, "SELECT arrayMin([3, NULL, 1]) AS a, "
               "arraySum([1, NULL]) AS b, arrayAvg([2, NULL, 4]) AS c,"
               " arrayMax([1, NULL, 5]) AS d, "
               "arrayProduct([2, NULL, 3]) AS e") \
        == (1, 1, 3.0, 5, 6.0)


def test_totimezone_display_conversion(spark):
    assert one(spark, "SELECT toString(toTimeZone(toDateTime("
               "'2024-01-01 00:00:00'), 'Asia/Tokyo')) AS r") \
        == ('2024-01-01 09:00:00',)


def test_range_variants(spark):
    assert one(spark, "SELECT range(4) AS a, range(2, 5) AS b, "
               "range(0, 10, 3) AS c") \
        == ([0, 1, 2, 3], [2, 3, 4], [0, 3, 6, 9])


def test_finite_helpers(spark):
    assert one(spark, "SELECT isFinite(1 / 0) AS a, isInfinite(1 / 0) "
               "AS b, isNaN(0 / 0) AS c, ifNotFinite(1 / 0, 9.0) AS d,"
               " ifNotFinite(2.5, 9.0) AS e") \
        == (False, True, True, 9.0, 2.5)


def test_transform_3arg_keeps_original(spark):
    assert one(spark, "SELECT transform(5, [1, 2], [10, 20]) AS a, "
               "transform(1, [1, 2], [10, 20]) AS b") == (5, 10)


def test_to_relative_nums_and_timeslot(spark):
    assert one(spark, "SELECT toRelativeHourNum(toDateTime("
               "'1970-01-02 00:00:00')) AS a, toRelativeDayNum("
               "toDate('1970-01-03')) AS b, toString(timeSlot("
               "toDateTime('2024-01-01 12:17:00'))) AS c") \
        == (24, 2, '2024-01-01 12:00:00')


# --- batch 25: JSON extraction family ---------------------------------------

def test_json_extract_array_raw_and_keys(spark):
    assert one(spark, "SELECT JSONExtractArrayRaw('{\"a\": [1, \"x\","
               " [2]]}', 'a') AS a, JSONExtractKeys('{\"a\": 1, "
               "\"b\": 2}') AS b") \
        == (['1', '"x"', '[2]'], ['a', 'b'])


def test_json_type_with_path(spark):
    assert one(spark, "SELECT JSONType('{\"a\": 1}') AS a, "
               "JSONType('[1]') AS b, JSONType('{\"a\": 1}', 'a') AS "
               "c, JSONType('{\"a\": [1]}', 'a') AS d") \
        == ('Object', 'Array', 'Int64', 'Array')


def test_json_length_and_has(spark):
    assert one(spark, "SELECT JSONLength('[1, 2, 3]') AS a, "
               "JSONLength('{\"a\": 1, \"b\": 2}') AS b, "
               "JSONHas('{\"a\": 1}', 'a') AS c, "
               "JSONHas('{\"a\": 1}', 'b') AS d") == (3, 2, True, False)


def test_json_nested_and_negative_index(spark):
    assert one(spark, "SELECT JSONExtractString('{\"a\": {\"b\": "
               "\"deep\"}}', 'a', 'b') AS a, JSONExtractInt('{\"a\": "
               "[10, 20]}', 'a', 2) AS b, JSONExtractInt('{\"a\": "
               "[10, 20]}', 'a', -1) AS c") == ('deep', 20, 20)


def test_json_extract_raw_nested_object(spark):
    assert one(spark, "SELECT JSONExtractRaw('{\"a\": {\"b\": 1}}', "
               "'a') AS r") == ('{"b":1}',)


# --- batch 26: uniq-If NULL flag, map forms, byteSize, tupleConcat ----------

def test_uniq_if_null_flag_restricted_to_matches(spark):
    # masked-out rows must not add a phantom NULL distinct value
    assert one(spark, "SELECT countDistinctIf(number % 3, number < 4) "
               "AS a, uniqExactIf(number % 3, number < 4) AS b, "
               "uniqIf(number % 3, number < 4) AS c, "
               "uniqExactIf(nullIf(number, 0), number < 4) AS d "
               "FROM numbers(10)") == (3, 3, 3, 4)


def test_summap_map_argument_returns_map(spark):
    assert one(spark, "SELECT mapValues(sumMap(m)) AS v FROM (SELECT "
               "map('a', number) AS m FROM numbers(3))") == ([3],)


def test_map_hofs(spark):
    assert one(spark, "SELECT mapApply((k, v) -> (k, v * 2), "
               "map('a', 1, 'b', 2)) AS a, mapFilter((k, v) -> v > 1, "
               "map('a', 1, 'b', 2)) AS b") \
        == ({'a': 2, 'b': 4}, {'b': 2})


def test_byte_size_widths(spark):
    assert one(spark, "SELECT byteSize(toUInt8(1)) AS a, "
               "byteSize(toUInt32(1)) AS b, byteSize(1.5) AS c, "
               "byteSize('abc') AS d, byteSize(toDate('2024-01-01')) "
               "AS e") == (1, 4, 8, 12, 2)


def test_tuple_concat(spark):
    assert one(spark, "SELECT tupleConcat((1, 'a'), (2.5, 3)).3 AS r") \
        == (2.5,)


def test_arg_min_max_if(spark):
    assert one(spark, "SELECT argMinIf(s, v, v > 10) AS a, "
               "argMaxIf(s, v, v > 0) AS b FROM (SELECT arrayJoin("
               "[('x', 5), ('y', 20), ('z', 30)]) AS p, p.1 AS s, "
               "p.2 AS v)") == ('y', 'z')


def test_vector_distance_values(spark):
    assert one(spark, "SELECT arrayDotProduct([1, 2], [3, 4]) AS a, "
               "round(cosineDistance([1, 0], [0, 1]), 6) AS b, "
               "L2Distance([0, 0], [3, 4]) AS c, "
               "round(arrayJaccardIndex([1, 2], [2, 3]), 6) AS d") \
        == (11, 1.0, 5.0, 0.333333)


def test_quantiles_exact_weighted(spark):
    assert one(spark, "SELECT quantilesExactWeighted(0.5)(number, 1) "
               "AS r FROM numbers(5)") == ([2],)


def test_group_array_insert_at(spark):
    # plain form fills gaps with the type default; parametric
    # (default[, size]) leads per CH convention
    assert one(spark, "SELECT groupArrayInsertAt(s, p) AS a, "
               "groupArrayInsertAt('-', 5)(s, p) AS b FROM (SELECT "
               "arrayJoin([('a', 0), ('c', 2)]) AS t, t.1 AS s, "
               "t.2 AS p)") == (['a', '', 'c'], ['a', '-', 'c', '-', '-'])


def test_mean_z_test_shape(spark):
    import math
    r = one(spark, "SELECT meanZTest(1.0, 1.0, 0.95)(v, g) AS r FROM "
            "(SELECT toFloat64(number) AS v, number % 2 AS g "
            "FROM numbers(10))")[0]
    # groups {0,2,4,6,8} vs {1,3,5,7,9}: mean diff -1, se sqrt(2/5)
    assert math.isclose(r["z_statistic"], -1.0 / math.sqrt(0.4),
                        rel_tol=1e-9)
    assert 0.0 <= r["p_value"] <= 1.0
    assert r["confidence_interval_low"] < -1.0 < \
        r["confidence_interval_high"]


def test_array_fill_and_split(spark):
    assert one(spark, "SELECT arrayFill(x -> x != 0, [1, 0, 0, 5, 0]) "
               "AS a, arrayReverseFill(x -> x != 0, [0, 2, 0, 0, 7]) "
               "AS b, arraySplit(x -> x > 0, [-1, 2, 3, -4, 5]) AS c") \
        == ([1, 1, 1, 5, 5], [2, 2, 7, 7, 7],
            [[-1], [2], [3, -4], [5]])


def test_multi_search_positions(spark):
    assert one(spark, "SELECT multiSearchFirstPosition('hello world', "
               "['or', 'wo']) AS a, multiSearchFirstIndex('hello', "
               "['xx', 'll']) AS b, multiSearchAllPositions('hello', "
               "['l', 'o']) AS c, positionUTF8('привет', 'вет') AS d, "
               "countSubstringsCaseInsensitive('AbaB', 'ab') AS e") \
        == (7, 2, [3, 5], 4, 2)


def test_group_concat(spark):
    assert one(spark, "SELECT groupConcat(toString(number)) AS r "
               "FROM numbers(3)") == ('012',)


# --- round 10: set-op precedence (INTERSECT binds tighter) -------------------

def test_setop_intersect_precedence(spark):
    # published CH: INTERSECT has higher precedence than UNION/EXCEPT
    # (the reference parses a flat mode list — ExpressionListParsers.cpp
    # :120-183 — the grouping is interpreter-side)
    assert sorted(rows(spark, "SELECT 1 AS n UNION ALL SELECT 2 AS n "
                       "INTERSECT SELECT 2 AS n")) == [(1,), (2,)]
    assert rows(spark, "SELECT 1 AS n UNION ALL SELECT 2 AS n "
                "INTERSECT SELECT 3 AS n") == [(1,)]
    assert rows(spark, "SELECT 1 AS n EXCEPT SELECT 2 AS n "
                "INTERSECT SELECT 2 AS n") == [(1,)]
    # UNION/EXCEPT fold left-to-right among themselves
    assert rows(spark, "SELECT 1 AS n UNION ALL SELECT 2 AS n "
                "EXCEPT SELECT 2 AS n") == [(1,)]
    # an INTERSECT run groups as one sub-chain
    assert sorted(rows(spark, "SELECT 2 AS n INTERSECT SELECT 2 AS n "
                       "INTERSECT SELECT 2 AS n UNION ALL "
                       "SELECT 9 AS n")) == [(2,), (9,)]
    # parenthesized form overrides: ((1 UNION ALL 2) INTERSECT 2) = {2}
    assert rows(spark, "SELECT n FROM (SELECT 1 AS n UNION ALL "
                "SELECT 2 AS n) INTERSECT SELECT 2 AS n") == [(2,)]


# --- round 10: two-arg countIf / count(x) FILTER -----------------------------

def test_countif_value_form(spark):
    # countIf(x, cond): count's 0-or-1-arg signature + the -If trailing
    # condition — counts rows where cond holds AND x is non-NULL
    assert one(spark, "SELECT countIf(number, number > 1) AS a, "
               "countIf(NULL, 1) AS b, "
               "countIf(nullIf(number, 2), number < 4) AS c, "
               "countIf(number, number > 100) AS d FROM numbers(5)") \
        == (3, 0, 3, 0)
    # FILTER (WHERE p) over count(x) is the same lowering
    assert one(spark, "SELECT count(number) FILTER (WHERE number > 2) "
               "AS a, count(nullIf(number, 2)) FILTER (WHERE number < "
               "4) AS b FROM numbers(6)") == (3, 3)
    # windowed position
    assert rows(spark, "SELECT number, countIf(number, number % 2 = 0)"
                " OVER (ORDER BY number) AS c FROM numbers(4) "
                "ORDER BY number") == [(0, 1), (1, 1), (2, 2), (3, 2)]


# --- round 10: settings honesty + windowed-agg re-entrancy pin ----------------

def test_pinned_settings_raise_at_non_default(spark):
    # transform_null_in / enable_positional_arguments /
    # output_format_decimal_trailing_zeros: only the CH default is
    # implemented — a non-default value raises a NAMED error instead of
    # being advertised as changed and silently ignored
    from clickhouse_from_scratch_spark.plans.builder import BuildError
    for stmt in (
            "SELECT 1 AS x SETTINGS transform_null_in = 1",
            "SELECT 1 AS x SETTINGS enable_positional_arguments = 0",
            "SELECT 1 AS x SETTINGS output_format_decimal_trailing_zeros = 1"):
        with pytest.raises(BuildError, match="not supported"):
            rows(spark, stmt)
    # default values are accepted
    assert one(spark, "SELECT 1 AS x SETTINGS transform_null_in = 0") == (1,)


def test_splitby_remaining_string_honesty(spark):
    # literal count: setting honored
    assert one(spark, "SELECT splitByChar(',', 'a,b,c,d', 2) AS s "
               "SETTINGS splitby_max_substrings_includes_remaining_"
               "string = 1") == (['a', 'b,c,d'],)
    assert one(spark, "SELECT splitByChar(',', 'a,b,c,d', 2) AS s") \
        == (['a', 'b'],)
    # column-valued count with the setting ON raises (never a silent
    # remainder discard); with the setting OFF it works
    from clickhouse_from_scratch_spark.plans.builder import BuildError
    with pytest.raises(BuildError, match="splitby_max_substrings"):
        rows(spark, "SELECT splitByChar(',', 'a,b,c', number) AS s "
             "FROM numbers(1) SETTINGS splitby_max_substrings_includes"
             "_remaining_string = 1")
    got = rows(spark, "SELECT splitByChar(',', 'a,b,c', number + 1) "
               "AS s FROM numbers(2) ORDER BY number")
    assert [tuple(r) for r in got] == [(['a'],), (['a', 'b'],)]


def test_windowed_agg_with_scalar_subquery_arg(spark):
    # round-8 ADVICE re-entrancy concern: scalar subqueries inside
    # windowed aggregate arguments pre-lower before the window applies
    assert rows(spark, "SELECT number, sum(number + (SELECT max(number)"
                " FROM numbers(3))) OVER (ORDER BY number) AS s "
                "FROM numbers(3) ORDER BY number") \
        == [(0, 2), (1, 5), (2, 9)]
