"""Published ClickHouse doc-example contracts, sweep 7: the round-6
surface-tail batch 3/4 — UTF8 string forms, relative date numbers,
toStartOfISOYear, arrayShingles, token search, readable-size parse and
format, extractTextFromHTML, multiMatch, emptyArray constructors,
isConstant, string-similarity kernels (Damerau-Levenshtein, Jaro,
Jaro-Winkler), jump consistent hash, matrix/bitmap/GK aggregates,
sumMapFiltered, maxIntersectionsPosition, nonNegativeDerivative.
"""
from __future__ import annotations

import datetime

from clickhouse_from_scratch_spark.plans import execute_sql


def test_ch_doc_contracts_sweep7(spark):
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

    # --- strings ------------------------------------------------------
    probe("SELECT leftUTF8('Motörhead', 4)", "Motö", "leftUTF8")
    probe("SELECT rightUTF8('Motörhead', 4)", "head", "rightUTF8")
    probe("SELECT firstLine('foo\\nbar\\nbaz')", "foo", "firstLine")
    probe("SELECT hasTokenCaseInsensitive('Hello World', 'hello')", 1,
          "hasTokenCaseInsensitive")
    probe("SELECT hasTokenOrNull('a+b', '+')", None,
          "hasTokenOrNull invalid token -> NULL")
    probe("SELECT multiMatchAny('abcd', ['xx', 'bc'])", 1, "multiMatchAny")
    probe("SELECT multiMatchAny('abcd', ['xx', 'yy'])", 0,
          "multiMatchAny none")
    probe("SELECT multiMatchAnyIndex('abcd', ['xx', 'bc'])", 2,
          "multiMatchAnyIndex")
    probe("SELECT extractTextFromHTML('<p>Hi <b>there</b><!-- c --></p>')",
          "Hi there", "extractTextFromHTML")
    probe("SELECT extractTextFromHTML('<script>var x = 1;</script>text')",
          "text", "extractTextFromHTML drops script")

    # --- similarity (published vectors: MARTHA/MARHTA Jaro 0.944444,
    # Jaro-Winkler 0.961111; CH docs damerauLevenshteinDistance example) -
    probe("SELECT damerauLevenshteinDistance('clickhouse', 'mouse')", 6,
          "damerauLevenshteinDistance")
    probe("SELECT damerauLevenshteinDistance('ca', 'abc')", 2,
          "damerau unrestricted (ca->abc)")
    probe("SELECT round(jaroSimilarity('MARTHA', 'MARHTA'), 6)", 0.944444,
          "jaroSimilarity")
    probe("SELECT round(jaroWinklerSimilarity('MARTHA', 'MARHTA'), 6)",
          0.961111, "jaroWinklerSimilarity")
    probe("SELECT jaroSimilarity('abc', 'abc')", 1.0, "jaro equal")

    # --- dates ----------------------------------------------------------
    probe("SELECT timeDiff(toDateTime('2023-01-01 00:00:00'), "
          "toDateTime('2023-01-01 00:01:30'))", 90, "timeDiff")
    probe("SELECT toRelativeMonthNum(toDate('2023-04-01'))", 24280,
          "toRelativeMonthNum = y*12+m")
    probe("SELECT toRelativeYearNum(toDate('2023-04-01'))", 2023,
          "toRelativeYearNum")
    # reference DateLUTImpl.h:599 — Monday-based epoch week count
    probe("SELECT toRelativeWeekNum(toDate('1970-01-05'))", 1,
          "toRelativeWeekNum first Monday")
    probe("SELECT toRelativeWeekNum(toDate('1970-01-04'))", 0,
          "toRelativeWeekNum epoch week")
    probe("SELECT toStartOfISOYear(toDate('2017-01-01'))",
          datetime.date(2016, 1, 4), "toStartOfISOYear year boundary")
    probe("SELECT toStartOfISOYear(toDate('2023-06-15'))",
          datetime.date(2023, 1, 2), "toStartOfISOYear mid-year")
    probe("SELECT toUnixTimestamp64Milli(fromUnixTimestamp64Nano("
          "1234567891011000000))", 1234567891011,
          "fromUnixTimestamp64Nano round-trip")

    # --- readable sizes -------------------------------------------------
    probe("SELECT formatReadableDecimalSize(1500)", "1.50 KB",
          "formatReadableDecimalSize")
    probe("SELECT parseReadableSize('1.5 KiB')", 1536, "parseReadableSize")
    probe("SELECT parseReadableSize('3 MB')", 3000000,
          "parseReadableSize decimal unit")
    probe("SELECT parseReadableSizeOrNull('bogus')", None,
          "parseReadableSizeOrNull")
    probe("SELECT parseReadableSizeOrZero('bogus')", 0,
          "parseReadableSizeOrZero")

    # --- arrays / misc ---------------------------------------------------
    probe("SELECT arrayShingles([1, 2, 3, 4, 5], 3)",
          [[1, 2, 3], [2, 3, 4], [3, 4, 5]], "arrayShingles")
    probe("SELECT emptyArrayUInt8()", [], "emptyArrayUInt8")
    probe("SELECT emptyArrayToSingle(emptyArrayUInt8())", [0],
          "emptyArrayToSingle")
    probe("SELECT emptyArrayToSingle([7])", [7],
          "emptyArrayToSingle non-empty unchanged")
    probe("SELECT isConstant(1 + 2)", 1, "isConstant literal expr")
    # Lamping-Veach published vector: jumpConsistentHash(42, 57) varies
    # by implementation detail of the float; pin determinism + range
    probe("SELECT jumpConsistentHash(42, 57) >= 0 AND "
          "jumpConsistentHash(42, 57) < 57", True, "jumpConsistentHash")

    # --- aggregates -------------------------------------------------------
    t = {"t": spark.createDataFrame(
        [(1, 1.0, 2.1), (2, 2.0, 3.9), (3, 3.0, 6.1), (1, 4.0, 8.0)],
        "k int, x double, y double")}
    probe("SELECT groupBitmapXor(k) FROM t", 2,
          "groupBitmapXor odd multiplicity", t)
    probe("SELECT uniqCombined64(k) FROM t", 3, "uniqCombined64", t)
    probe("SELECT round(corrMatrix(x, y)[1][1], 6)  FROM t", 1.0,
          "corrMatrix diagonal", t)
    probe("SELECT round(covarPopMatrix(x, x)[1][2], 6) FROM t",
          1.25, "covarPopMatrix", t)
    probe("SELECT groupArrayIntersect(a) FROM (SELECT [1, 2, 3] AS a "
          "UNION ALL SELECT [2, 3, 4] AS a)", [2, 3],
          "groupArrayIntersect")
    probe("SELECT quantileGK(100, 0.5)(x) FROM t", 2.0, "quantileGK", t)
    probe("SELECT quantilesGK(100, 0.25, 0.75)(x) FROM t", [1.0, 3.0],
          "quantilesGK", t)
    probe("SELECT sumMapFiltered([1, 3])([1, 2, 3], [10, 20, 30]) "
          "FROM (SELECT 1 AS one)", ([1, 3], [10, 30]), "sumMapFiltered")
    probe("SELECT maxIntersectionsPosition(s, e) FROM (SELECT 1 AS s, "
          "4 AS e UNION ALL SELECT 2 AS s, 5 AS e)", 2,
          "maxIntersectionsPosition")
    probe("SELECT nonNegativeDerivative(v, ts) FROM (SELECT 1 AS v, "
          "toDateTime('2020-01-01 00:00:00') AS ts)", 0.0,
          "nonNegativeDerivative first row 0")

    assert not FAIL, "\n".join(FAIL)


def test_format_datetime_specifier_table(spark):
    """The full public formatDateTime specifier table over the canonical
    docs timestamp 2018-01-02 22:33:44 (a Tuesday). %M is the MINUTE:
    the reference era predates the m_is_month_name setting (MySQL
    semantics); %i is the modern alias."""
    want = {
        "%Y": "2018", "%y": "18", "%m": "01", "%c": "01", "%d": "02",
        "%e": " 2", "%H": "22", "%k": "22", "%h": "10", "%I": "10",
        "%l": "10", "%i": "33", "%M": "33", "%S": "44", "%s": "44",
        "%F": "2018-01-02", "%D": "01/02/18", "%T": "22:33:44",
        "%R": "22:33", "%r": "10:33 PM", "%j": "002", "%a": "Tue",
        "%b": "Jan", "%C": "20", "%g": "18", "%G": "2018", "%n": "\n",
        "%p": "PM", "%Q": "1", "%t": "\t", "%u": "2", "%V": "01",
        "%w": "2", "%W": "Tuesday", "%%": "%",
    }
    FAIL = []
    for spec, exp in want.items():
        got = execute_sql(
            spark, "SELECT formatDateTime(toDateTime("
                   f"'2018-01-02 22:33:44'), '{spec}') AS v",
            {}).collect()[0].v
        if got != exp:
            FAIL.append(f"{spec}: {got!r} != {exp!r}")
    # parse direction keeps the positional subset
    got = execute_sql(
        spark, "SELECT parseDateTime('2018-01-02 22:33:44', "
               "'%Y-%m-%d %H:%i:%S') AS v", {}).collect()[0].v
    assert str(got) == "2018-01-02 22:33:44", got
    # unknown specifier raises, never silently misformats
    import pytest as _pt
    with _pt.raises(Exception):
        execute_sql(spark, "SELECT formatDateTime(now(), '%P')",
                    {}).collect()
    assert not FAIL, "\n".join(FAIL)


def test_to_week_mysql_modes(spark):
    """toWeek/toYearWeek follow MySQL's calc_week + week_mode (the CH
    docs reference the same mode table). Pins the published WEEK()
    examples (2008-02-20: mode 0 → 7, mode 1 → 8; YEARWEEK('1987-01-01')
    = 198652) plus year-boundary cases across all 8 modes."""
    cases = {
        "toWeek(toDate('2008-02-20'))": 7,
        "toWeek(toDate('2008-02-20'), 1)": 8,
        "toWeek(toDate('2008-12-31'), 1)": 53,
        "toWeek(toDate('2000-01-01'))": 0,
        "toWeek(toDate('2000-01-01'), 2)": 52,
        "toWeek(toDate('2018-01-02'))": 0,
        "toWeek(toDate('2018-01-07'))": 1,
        "toWeek(toDate('2018-01-02'), 3)": 1,
        "toWeek(toDate('2008-02-20'), 4)": 8,
        "toWeek(toDate('2008-02-20'), 5)": 7,
        "toWeek(toDate('2008-02-20'), 6)": 8,
        "toWeek(toDate('2008-02-20'), 7)": 7,
        "toYearWeek(toDate('1987-01-01'))": 198652,
        "toYearWeek(toDate('2018-01-02'))": 201753,
        "toYearWeek(toDate('2000-01-01'))": 199952,
        "toYearWeek(toDate('2008-02-20'), 1)": 200808,
    }
    FAIL = []
    for expr, want in cases.items():
        got = execute_sql(spark, f"SELECT {expr} AS v", {}).collect()[0].v
        if got != want:
            FAIL.append(f"{expr}: {got} != {want}")
    assert not FAIL, "\n".join(FAIL)
