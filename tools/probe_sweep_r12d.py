"""Round-12 probe sweep D: datetime tail (makeDate/YYYYMMDD/relative
nums/timeSlot), string-distance tail (editDistance/jaro/soundex),
position/token tail, encoding tail (base64URL/tryBase64), snowflake and
UUID tails, misc scalar tail. Expected values from CH docs."""
import os

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
from clickhouse_from_scratch_spark.session import get_spark  # noqa: E402
from clickhouse_from_scratch_spark.ddl import ChSession  # noqa: E402

spark = get_spark()
eng = ChSession(spark)


def run(tag, sql, expect=None):
    try:
        out = [tuple(r) for r in eng.execute(sql).collect()]
        flag = ""
        if expect is not None:
            flag = " OK" if out == expect else f" MISMATCH want {expect}"
        print(f"{tag}: {out}{flag}")
    except Exception as e:
        print(f"{tag}: ERR {type(e).__name__}: {str(e)[:140]}")


import datetime as _dt  # noqa: E402

D = _dt.date
DT = _dt.datetime

# datetime constructors
run("make_date", "SELECT makeDate(2024, 2, 29) AS d", [(D(2024, 2, 29),)])
run("make_date_doy", "SELECT makeDate(2024, 60) AS d", [(D(2024, 2, 29),)])
run("make_date32", "SELECT makeDate32(2024, 1, 2) AS d", [(D(2024, 1, 2),)])
run("make_datetime", "SELECT makeDateTime(2024, 1, 2, 3, 4, 5) AS t",
    [(DT(2024, 1, 2, 3, 4, 5),)])
run("yyyymmdd_to_date", "SELECT YYYYMMDDToDate(20240102) AS d",
    [(D(2024, 1, 2),)])
run("yyyymmddhhmmss", "SELECT YYYYMMDDhhmmssToDateTime(20240102030405) AS t",
    [(DT(2024, 1, 2, 3, 4, 5),)])
run("to_yyyymmdd", "SELECT toYYYYMMDD(toDate('2024-01-02')) AS n",
    [(20240102,)])
run("to_yyyymmddhhmmss",
    "SELECT toYYYYMMDDhhmmss(toDateTime('2024-01-02 03:04:05')) AS n",
    [(20240102030405,)])
run("to_yyyymm", "SELECT toYYYYMM(toDate('2024-01-02')) AS n", [(202401,)])
# relative nums (epoch-based counters)
run("rel_year", "SELECT toRelativeYearNum(toDate('2024-01-02')) AS n",
    [(2024,)])
run("rel_month", "SELECT toRelativeMonthNum(toDate('2024-01-02')) AS n",
    [(2024 * 12 + 1,)])
run("rel_day", "SELECT toRelativeDayNum(toDate('1970-01-11')) AS n",
    [(10,)])
run("rel_hour", "SELECT toRelativeHourNum(toDateTime("
    "'1970-01-02 03:00:00')) AS n", [(27,)])
run("time_slot", "SELECT timeSlot(toDateTime('2024-01-02 03:47:12')) AS t",
    [(DT(2024, 1, 2, 3, 30, 0),)])
run("time_slots", "SELECT timeSlots(toDateTime('2024-01-02 03:47:12'), "
    "toUInt32(1800)) AS t")
run("month_name", "SELECT monthName(toDate('2024-02-03')) AS m",
    [("February",)])
run("date_name", "SELECT dateName('weekday', toDate('2024-01-02')) AS d",
    [("Tuesday",)])
run("days_since_year_zero",
    "SELECT toDaysSinceYearZero(toDate('2023-09-08')) AS n", [(739136,)])
run("from_days_year_zero",
    "SELECT fromDaysSinceYearZero(739136) AS d", [(D(2023, 9, 8),)])
run("last_day", "SELECT toLastDayOfMonth(toDate('2024-02-03')) AS d",
    [(D(2024, 2, 29),)])
run("first_day_week",
    "SELECT toLastDayOfWeek(toDate('2024-01-03')) AS d", [(D(2024, 1, 7),)])
run("utc_ts", "SELECT UTCTimestamp() IS NOT NULL AS x", [(True,)])
run("add_quarters", "SELECT addQuarters(toDate('2024-01-15'), 2) AS d",
    [(D(2024, 7, 15),)])
run("to_quarter", "SELECT toQuarter(toDate('2024-07-15')) AS q", [(3,)])

# string distances
run("edit_distance", "SELECT editDistance('clickhouse', 'mouse') AS d",
    [(6,)])
run("levenshtein_alias", "SELECT levenshteinDistance('abc', 'axc') AS d",
    [(1,)])
run("damerau", "SELECT damerauLevenshteinDistance('ca', 'ac') AS d",
    [(1,)])
run("jaro", "SELECT round(jaroSimilarity('stringJaccardIndexmouse', "
    "'mouse'), 4) AS j")
run("jaro_winkler",
    "SELECT round(jaroWinklerSimilarity('DWAYNE', 'DUANE'), 4) AS j",
    [(0.84,)])
run("string_jaccard", "SELECT stringJaccardIndex('clickhouse', 'mouse') AS j")
run("byte_hamming", "SELECT byteHammingDistance('abc', 'abd') AS d", [(1,)])
run("soundex", "SELECT soundex('Robert') AS s", [("R163",)])

# position/token tail
run("pos_ci_utf8",
    "SELECT positionCaseInsensitiveUTF8('Привет', 'ПРИ') AS p", [(1,)])
run("multi_first_pos",
    "SELECT multiSearchFirstPosition('hello world', ['world', 'ell']) AS p",
    [(2,)])
run("multi_first_index",
    "SELECT multiSearchFirstIndex('hello', ['xx', 'ell']) AS i", [(2,)])
run("count_substr_ci",
    "SELECT countSubstringsCaseInsensitive('AbaBa', 'ba') AS c", [(2,)])
run("has_token", "SELECT hasToken('Hello World', 'World') AS h, "
    "hasToken('HelloWorld', 'World') AS h2", [(1, 0)])
run("has_token_ci",
    "SELECT hasTokenCaseInsensitive('Hello World', 'world') AS h", [(1,)])
run("count_matches", "SELECT countMatches('aaaa', 'aa') AS c", [(2,)])
run("regexp_quote", "SELECT regexpQuoteMeta('a.b') AS q", [("a\\.b",)])
run("substring_index", "SELECT substringIndex('a.b.c', '.', 2) AS s, "
    "substringIndex('a.b.c', '.', -1) AS t", [("a.b", "c")])

# encodings
run("base64url", "SELECT base64URLEncode('https://a.b/?x=1') AS e")
run("try_base64", "SELECT tryBase64Decode('not base64!') AS d", [("",)])
run("base32", "SELECT base32Encode('hi') AS e", [("NBUQ====",)])
run("base58_rt", "SELECT base58Decode(base58Encode('abc')) AS s",
    [("abc",)])
run("bin_unbin", "SELECT unbin(bin('a')) AS s", [("a",)])

# snowflake / UUID tails
run("snowflake_to_dt",
    "SELECT snowflakeIDToDateTime(7204436857747984384) IS NOT NULL AS x")
run("dt_to_snowflake",
    "SELECT dateTimeToSnowflakeID(toDateTime('2024-01-02 03:04:05')) "
    "IS NOT NULL AS x")
run("uuid_v7", "SELECT length(toString(generateUUIDv7())) AS n", [(36,)])
run("uuid_num_rt",
    "SELECT UUIDNumToString(UUIDStringToNum("
    "'612f3c40-5d3b-217e-707b-6a546a3d7b29')) AS u",
    [("612f3c40-5d3b-217e-707b-6a546a3d7b29",)])
run("uuid_to_num", "SELECT length(UUIDStringToNum("
    "'612f3c40-5d3b-217e-707b-6a546a3d7b29')) AS n", [(16,)])
run("server_uuid", "SELECT serverUUID() IS NOT NULL AS x", [(True,)])

# misc scalar tail
run("is_finite", "SELECT isFinite(1.0) AS a, isFinite(1/0) AS b", [(1, 0)])
run("is_nan", "SELECT isNaN(0/0) AS a, isNaN(1.0) AS b", [(1, 0)])
run("if_not_finite", "SELECT ifNotFinite(1/0, 42) AS x", [(42.0,)])
run("bar", "SELECT bar(5, 0, 10, 10) AS b", [("█████",)])
run("transform_4arg",
    "SELECT transform(2, [1, 2], ['one', 'two'], 'other') AS t",
    [("two",)])
run("format_fn", "SELECT format('{} and {}', 'a', 'b') AS f",
    [("a and b",)])
run("format_positional", "SELECT format('{1} then {0}', 'a', 'b') AS f",
    [("b then a",)])
run("readable_timedelta",
    "SELECT formatReadableTimeDelta(7320) AS t",
    [("2 hours, 2 minutes",)])
run("parse_timedelta", "SELECT parseTimeDelta('1min35s') AS s", [(95.0,)])
run("trim_custom", "SELECT trim(BOTH 'x' FROM 'xxabcxx') AS t",
    [("abc",)])
run("ascii_char", "SELECT ascii('A') AS a, char(66, 67) AS c",
    [(65, "BC")])
run("repeat_space", "SELECT repeat('ab', 3) AS r, space(2) AS s",
    [("ababab", "  ")])
run("extract_kv",
    "SELECT extractKeyValuePairs('k1:v1, k2:v2') AS m")
run("normalize_query", "SELECT normalizeQuery('SELECT 1 + 2') AS q",
    [("SELECT ? + ?",)])
run("normalize_utf8", "SELECT length(normalizeUTF8NFC('abc')) AS n",
    [(3,)])
run("tuple_concat", "SELECT tupleConcat((1, 'a'), (2,)) AS t",
    [((1, "a", 2),)])
run("tuple_names", "SELECT tupleNames(CAST((1, 2) AS "
    "Tuple(a UInt8, b UInt8))) AS n")
run("array_dot", "SELECT arrayDotProduct([1, 2], [3, 4]) AS d", [(11,)])
run("l1_dist", "SELECT L1Distance([1, 2], [3, 5]) AS d", [(5.0,)])
run("cos_dist", "SELECT round(cosineDistance([1, 0], [0, 1]), 4) AS d",
    [(1.0,)])
