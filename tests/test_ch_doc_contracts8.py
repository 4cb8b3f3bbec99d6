"""Round-7 fidelity pins, batch 4 (sweep 28): byte-length semantics,
bin over strings, ngram multiset distance/search, interval month-end
clamping, UTF8 family, arrayEnumerate*, encodings, dateName, Julian
day — values from published ClickHouse documentation examples;
jaro values cross-checked against DuckDB's implementations."""
from __future__ import annotations

import pytest

from clickhouse_from_scratch_spark.plans import execute_sql


def rows(spark, sql):
    return [tuple(r) for r in execute_sql(spark, sql, {}).collect()]


def one(spark, sql):
    return rows(spark, sql)[0]


def test_length_counts_bytes_lengthutf8_codepoints(spark):
    # docs string-functions#length: bytes, not code points
    assert one(spark, "SELECT length('héllo') AS b, "
               "lengthUTF8('héllo') AS c, length('abc') AS a") \
        == (6, 5, 3)


def test_bin_string_byte_dump(spark):
    assert one(spark, "SELECT bin('a') AS a, bin('ab') AS b, "
               "unbin(bin('a')) AS r") \
        == ('01100001', '0110000101100010', 'a')


def test_ngram_distance_multiset(spark):
    # docs: ngramDistance('ClickHouse','clickhouse') = 0.71428573
    a, b, c = one(spark, "SELECT ngramDistance('ClickHouse', "
                  "'clickhouse') AS a, ngramDistance('ClickHouse', "
                  "'ClickHouse') AS b, "
                  "ngramDistanceCaseInsensitive('ClickHouse', "
                  "'clickhouse') AS c")
    assert a == pytest.approx(0.714285714)
    assert b == 0.0 and c == 0.0


def test_ngram_search_needle_fraction(spark):
    a, b = one(spark, "SELECT ngramSearch('hello world', 'hello') AS a, "
               "ngramSearchCaseInsensitive('Hello World', 'hello') AS b")
    assert a == 1.0 and b == 1.0


def test_jaro_values_match_duckdb(spark):
    a, b = one(spark, "SELECT jaroSimilarity('stringdistance', "
               "'srtingdistence') AS a, jaroWinklerSimilarity("
               "'stringdistance', 'srtingdistence') AS b")
    assert a == pytest.approx(0.9010989010989011)
    assert b == pytest.approx(0.910989010989011)


def test_interval_month_end_clamp(spark):
    assert one(spark, "SELECT toString(addMonths(toDate('2024-01-31'), 1)) "
               "AS a, toString(addMonths(toDate('2023-01-31'), 1)) AS b, "
               "toString(addYears(toDate('2024-02-29'), 1)) AS c, "
               "toString(addQuarters(toDate('2023-11-30'), 1)) AS d") \
        == ('2024-02-29', '2023-02-28', '2025-02-28', '2024-02-29')


def test_utf8_family_values(spark):
    assert one(spark, "SELECT substringUTF8('привет', 2, 3) AS a, "
               "leftUTF8('привет', 3) AS b, rightUTF8('привет', 3) AS c, "
               "reverseUTF8('abc д') AS d, upperUTF8('münchen') AS e") \
        == ('рив', 'при', 'вет', 'д cba', 'MÜNCHEN')


def test_array_enumerate_family(spark):
    a, b, c = one(spark, "SELECT arrayEnumerate([10,20,30]) AS a, "
                  "arrayEnumerateUniq([10,20,10,30,10]) AS b, "
                  "arrayEnumerateDense([10,20,10,30]) AS c")
    assert list(a) == [1, 2, 3]
    assert list(b) == [1, 1, 2, 1, 3]
    assert list(c) == [1, 2, 1, 3]


def test_encoding_round_trips(spark):
    assert one(spark, "SELECT base64Encode('clickhouse') AS a, "
               "base58Encode('Encoded') AS b, "
               "base58Decode('3dc8KtHrwM') AS c, "
               "tryBase64Decode('invalid!!') AS d, "
               "unhex(hex('abc')) AS e") \
        == ('Y2xpY2tob3VzZQ==', '3dc8KtHrwM', 'Encoded', '', 'abc')


def test_date_name_and_julian(spark):
    assert one(spark, "SELECT dateName('weekday', toDate('2024-02-29')) "
               "AS a, monthName(toDate('2024-02-29')) AS b, "
               "toModifiedJulianDay('2020-01-01') AS c, "
               "toString(fromModifiedJulianDay(58849)) AS d") \
        == ('Thursday', 'February', 58849, '2020-01-01')
