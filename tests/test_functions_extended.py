"""Tests for the extended function tranche: URL, array, date, math, geo."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_from_scratch_spark.functions import ch

URL = "https://www.example.com/path/page?x=1&y=2#frag"


def _one(spark, col):
    return spark.range(1).select(col.alias("r")).collect()[0].r


@pytest.mark.parametrize("name,args,expected", [
    ("protocol", lambda: (F.lit(URL),), "https"),
    ("domain", lambda: (F.lit(URL),), "www.example.com"),
    ("domainWithoutWWW", lambda: (F.lit(URL),), "example.com"),
    ("topLevelDomain", lambda: (F.lit(URL),), "com"),
    ("path", lambda: (F.lit(URL),), "/path/page"),
    ("queryString", lambda: (F.lit(URL),), "x=1&y=2"),
    ("fragment", lambda: (F.lit(URL),), "frag"),
    ("extractURLParameter", lambda: (F.lit(URL), "y"), "2"),
    # CH keeps the fragment (cutQueryStringAndFragment drops both)
    ("cutQueryString", lambda: (F.lit(URL),),
     "https://www.example.com/path/page#frag"),
    ("arrayCumSum", lambda: (F.array(F.lit(1), F.lit(2), F.lit(3)),),
     [1.0, 3.0, 6.0]),
    ("arrayWithConstant", lambda: (3, F.lit("x")), ["x", "x", "x"]),
    ("arrayResize", lambda: (F.array(F.lit(1), F.lit(2)), 4), [1, 2, 0, 0]),
    ("countEqual", lambda: (F.array(F.lit(1), F.lit(2), F.lit(1)), F.lit(1)), 2),
    ("mapFromArrays", lambda: (F.array(F.lit("a")), F.array(F.lit(1))),
     {"a": 1}),
    ("toStartOfFiveMinutes",
     lambda: (F.lit("2024-01-01 10:07:33").cast("timestamp"),),
     "2024-01-01 10:05:00"),
    ("timeSlot", lambda: (F.lit("2024-01-01 10:47:00").cast("timestamp"),),
     "2024-01-01 10:30:00"),
    ("toMonday", lambda: (F.lit("2024-03-15").cast("date"),), "2024-03-11"),
    ("toYYYYMMDDhhmmss",
     lambda: (F.lit("2024-03-15 12:30:45").cast("timestamp"),),
     20240315123045),
    ("monthName", lambda: (F.lit("2024-03-15").cast("date"),), "March"),
    ("gcd", lambda: (F.lit(12), F.lit(18)), 6),
    ("lcm", lambda: (F.lit(4), F.lit(6)), 12),
    ("bitCount", lambda: (F.lit(255),), 8),
    ("factorial", lambda: (F.lit(5),), 120),
    ("intExp2", lambda: (F.lit(10),), 1024),
    ("ascii", lambda: (F.lit("A"),), 65),
    ("initcap", lambda: (F.lit("hello world"),), "Hello World"),
    ("countSubstrings", lambda: (F.lit("abcabcab"), F.lit("ab")), 3),
    ("countMatches", lambda: (F.lit("a1b22c333"), "[0-9]+"), 3),
    ("isAlphaNumeric", lambda: (F.lit("abc123"),), True),
    ("appendTrailingCharIfAbsent", lambda: (F.lit("dir"), "/"), "dir/"),
    ("formatReadableSize", lambda: (F.lit(3 * 1024 * 1024),), "3.00 MiB"),
    ("normalizeQuery", lambda: (F.lit("a   b\t c"),), "a b c"),
    ("normalizeQuery", lambda: (F.lit("SELECT 1 + 'x'"),), "SELECT ? + ?"),
])
def test_extended_functions(spark, name, args, expected):
    got = _one(spark, ch(name, *args()))
    if isinstance(expected, str):
        assert str(got) == expected
    else:
        assert got == expected


def test_array_difference(spark):
    got = _one(spark, ch("arrayDifference",
                         F.array(F.lit(1), F.lit(4), F.lit(9))))
    assert got == [0, 3, 5]


def test_array_first_last(spark):
    arr = F.array(F.lit(1), F.lit(5), F.lit(3))
    assert _one(spark, ch("arrayFirst", lambda x: x > 2, arr)) == 5
    assert _one(spark, ch("arrayLast", lambda x: x > 2, arr)) == 3
    assert _one(spark, ch("arrayFirstIndex", lambda x: x > 2, arr)) == 2


def test_great_circle_distance(spark):
    # Moscow → Saint Petersburg ≈ 634 km
    got = _one(spark, ch("greatCircleDistance",
                         F.lit(37.6173), F.lit(55.7558),
                         F.lit(30.3351), F.lit(59.9343)))
    assert 600_000 < got < 680_000


def test_unix_timestamp64_roundtrip(spark):
    ts = F.lit("2024-01-01 00:00:00.123456").cast("timestamp")
    micros = ch("toUnixTimestamp64Micro", ts)
    back = ch("fromUnixTimestamp64Micro", micros)
    assert str(_one(spark, back)) == "2024-01-01 00:00:00.123456"
