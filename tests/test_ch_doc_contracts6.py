"""Round-7 fidelity pins: URL hierarchy, IP textual forms,
formatReadable*/parseReadable*, encodings, EXTRACT/dateName breadth,
age() complete-unit counting, toDayOfWeek modes — all values from
published ClickHouse documentation examples."""
from __future__ import annotations

import pytest

from clickhouse_from_scratch_spark.plans import execute_sql


def rows(spark, sql):
    return [tuple(r) for r in execute_sql(spark, sql, {}).collect()]


def one(spark, sql):
    return rows(spark, sql)[0]


# --- URL hierarchy ---------------------------------------------------------

def test_url_hierarchy(spark):
    assert one(spark, "SELECT URLHierarchy("
               "'https://example.com/browse/CONV-6788') AS r") == (
        ['https://example.com/', 'https://example.com/browse/',
         'https://example.com/browse/CONV-6788'],)


def test_url_path_hierarchy(spark):
    assert one(spark, "SELECT URLPathHierarchy("
               "'https://example.com/browse/CONV-6788') AS r") == (
        ['/browse/', '/browse/CONV-6788'],)


def test_url_parts(spark):
    assert one(
        spark,
        "SELECT cutWWW('http://www.example.com/path') AS a,"
        " domain('https://www.example.com/path') AS b,"
        " domainWithoutWWW('https://www.example.com/path') AS c,"
        " topLevelDomain('https://www.example.com/path') AS d") == (
        'http://example.com/path', 'www.example.com', 'example.com', 'com')


def test_url_params(spark):
    assert one(
        spark,
        "SELECT extractURLParameters('http://e.com/?page=1&lr=213') AS a,"
        " extractURLParameterNames('http://e.com/?page=1&lr=213') AS b,"
        " extractURLParameter('http://e.com/?page=1&lr=213', 'lr') AS c") \
        == (['page=1', 'lr=213'], ['page', 'lr'], '213')


def test_url_path_query_fragment(spark):
    assert one(
        spark,
        "SELECT path('https://example.com/a/b?x=1') AS a,"
        " pathFull('https://example.com/a/b?x=1') AS b,"
        " queryString('https://example.com/a/b?x=1&y=2') AS c,"
        " fragment('https://example.com/a#frag') AS d,"
        " protocol('https://example.com/a') AS e,"
        " netloc('https://user:pw@example.com:8080/a') AS f") == (
        '/a/b', '/a/b?x=1', 'x=1&y=2', 'frag', 'https',
        'user:pw@example.com:8080')


def test_url_cut_forms(spark):
    assert one(
        spark,
        "SELECT cutQueryString('http://e.com/a?x=1#f') AS a,"
        " cutFragment('http://e.com/a?x=1#f') AS b,"
        " cutQueryStringAndFragment('http://e.com/a?x=1#f') AS c") == (
        'http://e.com/a#f', 'http://e.com/a?x=1', 'http://e.com/a')


def test_first_significant_subdomain(spark):
    assert one(
        spark,
        "SELECT firstSignificantSubdomain('http://news.yandex.com.tr/') "
        "AS a, cutToFirstSignificantSubdomain("
        "'http://news.yandex.com.tr/') AS b") == ('yandex', 'yandex.com.tr')


# --- IP textual forms ------------------------------------------------------

def test_ipv4_roundtrip(spark):
    assert one(spark, "SELECT IPv4NumToString(3232235521) AS a,"
               " IPv4StringToNum('192.168.0.1') AS b") == (
        '192.168.0.1', 3232235521)


def test_ipv6_forms(spark):
    assert one(spark, "SELECT IPv6NumToString(IPv4ToIPv6("
               "IPv4StringToNum('192.168.0.1'))) AS r") == (
        '::ffff:192.168.0.1',)
    assert one(spark, "SELECT IPv6NumToString(IPv6StringToNum("
               "'2a02:6b8::11')) AS r") == ('2a02:6b8::11',)


def test_ip_validators(spark):
    assert one(spark, "SELECT isIPv4String('127.0.0.1') AS a,"
               " isIPv4String('127.0.0') AS b,"
               " isIPv6String('2a02:6b8::11') AS c,"
               " isIPv6String('127.0.0.1') AS d") == (
        True, False, True, False)


# --- formatReadable* / parseReadable* --------------------------------------

def test_format_readable_size(spark):
    assert one(spark, "SELECT formatReadableSize(1) AS a,"
               " formatReadableSize(1024) AS b,"
               " formatReadableSize(1048576) AS c") == (
        '1.00 B', '1.00 KiB', '1.00 MiB')


def test_format_readable_decimal_size(spark):
    assert one(spark, "SELECT formatReadableDecimalSize(1000) AS a,"
               " formatReadableDecimalSize(1000000) AS b") == (
        '1.00 KB', '1.00 MB')


def test_format_readable_quantity(spark):
    assert one(spark, "SELECT formatReadableQuantity(1024) AS a,"
               " formatReadableQuantity(1234567) AS b") == (
        '1.02 thousand', '1.23 million')


def test_format_readable_time_delta_and_separator(spark):
    # doc example: 'and' before the final component
    assert one(spark, "SELECT formatReadableTimeDelta(7601) AS r") == (
        '2 hours, 6 minutes and 41 seconds',)


def test_format_readable_time_delta_years_months(spark):
    # doc example: 365-day years, 30.5-day months up from days
    assert one(spark,
               "SELECT formatReadableTimeDelta(432546534) AS r") == (
        '13 years, 8 months, 17 days, 7 hours, 48 minutes and '
        '54 seconds',)


def test_format_readable_time_delta_max_unit(spark):
    assert one(spark, "SELECT formatReadableTimeDelta(432546534, "
               "'minutes') AS r") == ('7209108 minutes and 54 seconds',)


def test_format_readable_time_delta_degenerate(spark):
    assert one(spark, "SELECT formatReadableTimeDelta(0) AS a,"
               " formatReadableTimeDelta(60) AS b") == (
        '0 seconds', '1 minute')


def test_parse_readable_size(spark):
    assert one(spark, "SELECT parseReadableSize('1 KiB') AS a,"
               " parseReadableSize('3 MB') AS b") == (1024, 3000000)


def test_parse_readable_size_or_variants(spark):
    assert one(spark, "SELECT parseReadableSizeOrNull('invalid') AS a,"
               " parseReadableSizeOrZero('invalid') AS b") == (None, 0)


# --- encodings -------------------------------------------------------------

def test_base58(spark):
    assert one(spark, "SELECT base58Encode('Encoded') AS a,"
               " base58Decode('3dc8KtHrwM') AS b,"
               " base58Decode(base58Encode('round trip!')) AS c") == (
        '3dc8KtHrwM', 'Encoded', 'round trip!')


def test_base64_hex_bin(spark):
    assert one(spark, "SELECT base64Encode('clickhouse') AS a,"
               " base64Decode('Y2xpY2tob3VzZQ==') AS b, hex(103) AS c,"
               " unhex('4D7953514C') AS d, bin(14) AS e") == (
        'Y2xpY2tob3VzZQ==', 'clickhouse', '67', 'MySQL', '00001110')


def test_morton_doc_values(spark):
    # docs: mortonEncode(1, 2, 3) = 53; first argument occupies the
    # least-significant position of each bit group
    assert one(spark, "SELECT mortonEncode(1, 2, 3) AS r") == (53,)
    assert one(spark, "SELECT mortonDecode(3, 53) AS r") == ((1, 2, 3),)


# --- EXTRACT / dateName ----------------------------------------------------

def test_extract_parts(spark):
    assert one(spark,
               "SELECT EXTRACT(YEAR FROM toDate('2022-04-17')) AS a,"
               " EXTRACT(MONTH FROM toDate('2022-04-17')) AS b,"
               " EXTRACT(DAY FROM toDate('2022-04-17')) AS c") == (
        2022, 4, 17)


def test_date_name_named_parts(spark):
    assert one(spark, "SELECT dateName('year', toDate('2021-04-14')) AS a,"
               " dateName('month', toDate('2021-04-14')) AS b,"
               " dateName('weekday', toDate('2021-04-14')) AS c") == (
        '2021', 'April', 'Wednesday')


def test_date_name_numeric_parts(spark):
    assert one(spark,
               "SELECT dateName('quarter', toDate('2021-04-14')) AS a,"
               " dateName('dayofyear', toDate('2021-04-14')) AS b,"
               " dateName('day', toDate('2021-04-14')) AS c") == (
        '2', '104', '14')


def test_date_name_time_parts(spark):
    assert one(
        spark,
        "SELECT dateName('hour', toDateTime('2021-04-14 11:22:33')) AS a,"
        " dateName('minute', toDateTime('2021-04-14 11:22:33')) AS b,"
        " dateName('second', toDateTime('2021-04-14 11:22:33')) AS c") \
        == ('11', '22', '33')


def test_date_name_unknown_part_raises(spark):
    with pytest.raises(Exception):
        rows(spark, "SELECT dateName('fortnight', toDate('2021-04-14'))")


# --- toDayOfWeek modes -----------------------------------------------------

def test_to_day_of_week_modes(spark):
    # 2022-04-17 is a Sunday
    assert one(spark,
               "SELECT toDayOfWeek(toDate('2022-04-17')) AS a,"
               " toDayOfWeek(toDate('2022-04-17'), 1) AS b,"
               " toDayOfWeek(toDate('2022-04-17'), 2) AS c,"
               " toDayOfWeek(toDate('2022-04-17'), 3) AS d") == (7, 6, 0, 1)


def test_to_day_of_week_monday_modes(spark):
    # 2024-01-01 is a Monday
    assert one(spark,
               "SELECT toDayOfWeek(toDate('2024-01-01')) AS a,"
               " toDayOfWeek(toDate('2024-01-01'), 1) AS b,"
               " toDayOfWeek(toDate('2024-01-01'), 2) AS c,"
               " toDayOfWeek(toDate('2024-01-01'), 3) AS d") == (1, 0, 1, 2)


# --- age() complete units --------------------------------------------------

def test_age_month_incomplete(spark):
    # Jan 31 -> Feb 28: not a complete month (day 28 < day 31)
    assert one(spark, "SELECT age('month', toDate('2022-01-31'), "
               "toDate('2022-02-28')) AS r") == (0,)


def test_age_month_complete(spark):
    assert one(spark, "SELECT age('month', toDate('2022-01-31'), "
               "toDate('2022-03-01')) AS r") == (1,)


def test_age_year_incomplete(spark):
    assert one(spark, "SELECT age('year', toDate('2020-06-15'), "
               "toDate('2022-06-14')) AS r") == (1,)


def test_age_negative_direction(spark):
    assert one(spark, "SELECT age('day', toDate('2022-01-10'), "
               "toDate('2022-01-01')) AS r") == (-9,)


def test_age_hour_truncates(spark):
    assert one(spark, "SELECT age('hour', "
               "toDateTime('2022-01-01 10:00:00'), "
               "toDateTime('2022-01-01 12:30:00')) AS r") == (2,)


# --- misc r6 tail ----------------------------------------------------------

def test_distance_functions(spark):
    assert one(spark, "SELECT distanceL1([1,2], [4,6]) AS a,"
               " distanceL2([1,2], [4,6]) AS b,"
               " cosineDistance([1,0], [0,1]) AS c") == (7.0, 5.0, 1.0)


def test_edit_distances(spark):
    assert one(spark,
               "SELECT damerauLevenshteinDistance('clickhouse', 'mouse') "
               "AS a, levenshteinDistance('clickhouse', 'mouse') AS b") \
        == (6, 6)


def test_misc_string_tail(spark):
    assert one(spark, "SELECT firstLine('a\\nb\\nc') AS a,"
               " countDigits(123) AS b, bitPositionsToArray(10) AS c,"
               " decodeHTMLComponent('&lt;p&gt;Hi&amp;bye&lt;/p&gt;') "
               "AS d") == ('a', 3, [1, 3], '<p>Hi&bye</p>')


def test_array_shingles(spark):
    assert one(spark, "SELECT arrayShingles([1,2,3,4], 3) AS r") == (
        [[1, 2, 3], [2, 3, 4]],)


def test_has_token_family(spark):
    assert one(spark, "SELECT hasToken('Hello World', 'World') AS a,"
               " hasToken('Hello World', 'orld') AS b,"
               " hasTokenCaseInsensitive('Hello World', 'world') AS c") \
        == (True, False, True)


# --- batch 2: idna2008 / try-variants / date edges / array breadth ---------

def test_idna2008_eszett(spark):
    # the reference embeds ada-idna (IDNA2008): ß is NOT mapped to ss
    assert one(spark, "SELECT idnaEncode('straße.münchen.de') AS r") == (
        'xn--strae-oqa.xn--mnchen-3ya.de',)
    assert one(spark, "SELECT idnaDecode("
               "'xn--strae-oqa.xn--mnchen-3ya.de') AS r") == (
        'straße.münchen.de',)


def test_punycode_doc_values(spark):
    assert one(spark, "SELECT punycodeEncode('München') AS a,"
               " punycodeDecode('Mnchen-3ya') AS b") == (
        'Mnchen-3ya', 'München')


def test_try_decode_variants(spark):
    assert one(spark, "SELECT tryBase58Decode('invalid!!') AS a,"
               " tryBase58Decode(base58Encode('ok')) AS b,"
               " tryPunycodeDecode('Mnchen-3ya') AS c,"
               " tryIdnaEncode('xn--$$$') AS d") == (
        '', 'ok', 'München', '')


def test_modified_julian_day(spark):
    # fromModifiedJulianDay returns the date IN TEXT FORM (String)
    assert one(spark, "SELECT toModifiedJulianDay('2020-01-01') AS a,"
               " fromModifiedJulianDay(58849) AS b") == (58849, '2020-01-01')


def test_days_since_year_zero_roundtrip(spark):
    assert one(spark, "SELECT toDaysSinceYearZero("
               "toDate('2023-09-08')) AS a") == (739136,)
    import datetime
    assert one(spark, "SELECT fromDaysSinceYearZero(739136) AS r") == (
        datetime.date(2023, 9, 8),)


def test_start_of_week_modes(spark):
    import datetime
    # 2023-04-21 is a Friday: mode 0 -> Sunday, mode 1 -> Monday
    assert one(spark, "SELECT toStartOfWeek(toDate('2023-04-21')) AS a,"
               " toStartOfWeek(toDate('2023-04-21'), 1) AS b") == (
        datetime.date(2023, 4, 16), datetime.date(2023, 4, 17))


def test_iso_week_year_edge(spark):
    assert one(spark, "SELECT toISOWeek(toDate('2023-01-01')) AS a,"
               " toISOYear(toDate('2023-01-01')) AS b") == (52, 2022)


def test_array_rotate_shift(spark):
    assert one(spark, "SELECT arrayRotateLeft([1,2,3,4,5], 2) AS a,"
               " arrayRotateRight([1,2,3,4,5], 2) AS b,"
               " arrayShiftLeft([1,2,3,4,5], 2) AS c,"
               " arrayShiftRight([1,2,3,4,5], 2) AS d") == (
        [3, 4, 5, 1, 2], [4, 5, 1, 2, 3], [3, 4, 5, 0, 0], [0, 0, 1, 2, 3])


def test_array_enumerate_uniq(spark):
    assert one(spark, "SELECT arrayEnumerateUniq([10,20,10,30,10]) AS r") \
        == ([1, 1, 2, 1, 3],)


def test_array_fold_difference_cumsum(spark):
    assert one(spark,
               "SELECT arrayFold((acc, x) -> acc + x, [1,2,3,4], "
               "toInt64(0)) AS a, arrayDifference([1,2,3,5]) AS b,"
               " arrayCumSum([1,1,1,1]) AS c, arrayCompact([1,1,2,3,3,3]) "
               "AS d") == (10, [0, 1, 1, 2], [1, 2, 3, 4], [1, 2, 3])


def test_soundex_normalize_query(spark):
    assert one(spark, "SELECT soundex('aksel') AS a,"
               " normalizeQuery('SELECT 1 + 2') AS b") == (
        'A240', 'SELECT ? + ?')
