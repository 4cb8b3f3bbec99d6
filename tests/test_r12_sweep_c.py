"""Round-12 sweep-C fixes pinned: URLHierarchy separator walk, exact
sumKahan (decimal path), CRC32 zlib parity, javaHashUTF16LE +
convertCharset, IP conversion OrNull/OrDefault tails, hash stand-in
tails (xxh3, murmurHash3_128).

Reference behavior: ClickHouse URL-functions and hash-functions docs;
sumKahan doc contract (sum(0.1)×10 = 0.999…, sumKahan = 1)."""

import pytest

from clickhouse_from_scratch_spark.plans import execute_sql


def one(spark, sql):
    return tuple(execute_sql(spark, sql, {}).collect()[0])


# --- URLHierarchy: cut after EVERY /?# past the host -------------------------

def test_url_hierarchy_with_query(spark):
    assert one(spark, "SELECT URLHierarchy('https://e.com/a/b?x=1') AS h") \
        == (["https://e.com/", "https://e.com/a/", "https://e.com/a/b?",
             "https://e.com/a/b?x=1"],)


def test_url_hierarchy_with_fragment(spark):
    assert one(spark, "SELECT URLHierarchy('https://e.com/a?x=1#f') AS h") \
        == (["https://e.com/", "https://e.com/a?", "https://e.com/a?x=1#",
             "https://e.com/a?x=1#f"],)


def test_url_hierarchy_doc_example_unchanged(spark):
    assert one(spark, "SELECT URLHierarchy("
               "'https://example.com/browse/CONV-6788') AS h") == (
        ["https://example.com/", "https://example.com/browse/",
         "https://example.com/browse/CONV-6788"],)


def test_url_hierarchy_host_only_empty(spark):
    assert one(spark, "SELECT URLHierarchy('https://e.com') AS h") == ([],)


def test_url_path_hierarchy_unchanged(spark):
    assert one(spark, "SELECT URLPathHierarchy("
               "'https://example.com/browse/CONV-6788') AS h") == (
        ["/browse/", "/browse/CONV-6788"],)


# --- sumKahan: compensated (decimal-exact) sum --------------------------------

def test_sum_kahan_doc_contract(spark):
    assert one(spark, "SELECT sumKahan(x) AS s FROM "
               "(SELECT 0.1 AS x FROM numbers(10))") == (1.0,)


def test_sum_kahan_point_six(spark):
    assert one(spark, "SELECT sumKahan(x) AS s FROM "
               "(SELECT arrayJoin([0.1, 0.2, 0.3]) AS x)") == (0.6,)


def test_sum_kahan_mixes_with_other_aggs(spark):
    assert one(spark, "SELECT sumKahan(x) AS s, count() AS c FROM "
               "(SELECT 0.1 AS x FROM numbers(10))") == (1.0, 10)


# --- hash tails ---------------------------------------------------------------

def test_crc32_zlib_exact(spark):
    assert one(spark, "SELECT CRC32('hello') AS c") == (907060870,)


def test_crc_variants_exist_and_differ(spark):
    r = one(spark, "SELECT CRC32('a') != CRC32IEEE('a') AS d1, "
            "CRC64('a') IS NOT NULL AS d2")
    assert r == (True, True)


def test_java_hash_utf16le(spark):
    assert one(spark, "SELECT javaHashUTF16LE(convertCharset("
               "'test', 'utf-8', 'utf-16le')) AS h") == (3556498,)


def test_convert_charset_roundtrip(spark):
    assert one(spark, "SELECT convertCharset(convertCharset("
               "'abc', 'utf-8', 'utf-16le'), 'utf-16le', 'utf-8') AS s") \
        == ("abc",)


def test_xxh3_and_murmur128(spark):
    assert one(spark, "SELECT xxh3('a') != xxHash64('a') AS d") == (True,)
    assert one(spark, "SELECT length(hex(murmurHash3_128('a'))) AS l") \
        == (32,)


# --- IP conversion tails -------------------------------------------------------

def test_ipv4_string_to_num_or_null(spark):
    assert one(spark, "SELECT IPv4StringToNumOrNull('bad') AS a, "
               "IPv4StringToNumOrNull('1.2.3.4') AS b") == (None, 16909060)


def test_ipv4_string_to_num_or_default(spark):
    assert one(spark, "SELECT IPv4StringToNumOrDefault('bad') AS a") == (0,)


def test_to_ip_or_null_or_default(spark):
    assert one(spark, "SELECT toIPv4OrNull('x') AS a, "
               "toIPv6OrNull('::1') AS b") == (None, "::1")
    assert one(spark, "SELECT toIPv4OrDefault('x') AS a, "
               "toIPv6OrDefault('x') AS b") == ("0.0.0.0", "::")


# --- sweep-verified values that were already correct (regression pins) -------

def test_round_age_seventeen(spark):
    assert one(spark, "SELECT roundAge(16) AS a, roundAge(25) AS b") \
        == (17, 25)


def test_single_value_or_null_equal_values(spark):
    # equal duplicates still count as a single value (first-vs-differs)
    assert one(spark, "SELECT singleValueOrNull(x) AS a FROM "
               "(SELECT arrayJoin([1, 1]) AS x)") == (1,)


def test_interval_length_sum_overlap(spark):
    assert one(spark, "SELECT intervalLengthSum(s, e) AS l FROM "
               "(SELECT 1 AS s, 5 AS e UNION ALL SELECT 3, 7)") == (6,)


# --- sweep-D fixes ------------------------------------------------------------

def test_extract_kv_trims_whitespace(spark):
    assert one(spark, "SELECT extractKeyValuePairs("
               "'name:neymar, age:31') AS m") == (
        {"name": "neymar", "age": "31"},)


def test_base64_url_roundtrip_no_padding(spark):
    assert one(spark, "SELECT base64URLEncode('ab') AS e") == ("YWI",)
    assert one(spark, "SELECT base64URLDecode(base64URLEncode("
               "'hello?>~')) AS s") == ("hello?>~",)
    # pre-24.x spelling
    assert one(spark, "SELECT base64UrlDecode(base64UrlEncode("
               "'x')) AS s") == ("x",)


def test_snowflake_id_new_names_epoch_zero(spark):
    # new-name pair defaults the epoch to 0 (1970), unlike the legacy
    # Twitter-epoch snowflakeToDateTime
    assert one(spark, "SELECT dateTimeToSnowflakeID(toDateTime("
               "'1970-01-01 00:00:01')) AS n") == (1000 << 22,)
    assert one(spark, "SELECT snowflakeIDToDateTime("
               "dateTimeToSnowflakeID(toDateTime("
               "'2024-01-02 03:04:05'))) AS t")[0].isoformat() \
        == "2024-01-02T03:04:05"


def test_make_date_and_yyyymmdd(spark):
    import datetime
    assert one(spark, "SELECT makeDate(2024, 60) AS d") == (
        datetime.date(2024, 2, 29),)
    assert one(spark, "SELECT YYYYMMDDToDate(20240102) AS d") == (
        datetime.date(2024, 1, 2),)
    assert one(spark, "SELECT toYYYYMMDDhhmmss(toDateTime("
               "'2024-01-02 03:04:05')) AS n") == (20240102030405,)


def test_readable_time_delta_and_separator(spark):
    assert one(spark, "SELECT formatReadableTimeDelta(7601) AS t") == (
        "2 hours, 6 minutes and 41 seconds",)


# --- time-series tail ---------------------------------------------------------

def test_series_outliers_tukey(spark):
    r = one(spark, "SELECT seriesOutliersDetectTukey("
            "[2, 2, 2, 2, 2, 2, 100, 2, 2]) AS s")[0]
    assert r[6] == 98.0 and all(v == 0.0 for i, v in enumerate(r)
                                if i != 6)


def test_series_period_detect_fft(spark):
    assert one(spark, "SELECT seriesPeriodDetectFFT(arrayMap("
               "x -> sin(x / 2.0 * pi()), range(40))) AS p") == (4.0,)


def test_series_stl_and_encrypt_named_not_implemented(spark):
    import pytest
    with pytest.raises(Exception, match="NOT_IMPLEMENTED"):
        one(spark, "SELECT seriesDecomposeSTL([1,2,3], 2)")
    with pytest.raises(Exception, match="NOT_IMPLEMENTED"):
        one(spark, "SELECT encrypt('aes-128-ecb', 'x', 'k')")


def test_named_tuple_member_access(spark):
    assert one(spark, "SELECT CAST((1, 'a') AS Tuple(id UInt8, "
               "s String)).s AS x") == ("a",)
    assert one(spark, "SELECT CAST((1, 'a') AS Tuple(id UInt8, "
               "s String)).id AS x") == (1,)


def test_lowcardinality_type_name(spark):
    assert one(spark, "SELECT toTypeName(toLowCardinality('x')) AS t") \
        == ("LowCardinality(String)",)


# --- sweep-G: QUALIFY, subsecond dateDiff, tz toString, parse tails ---------

def test_qualify_clause(spark):
    assert one(spark, "SELECT * FROM (SELECT number AS n FROM "
               "numbers(4)) QUALIFY row_number() OVER (ORDER BY n) <= 1") \
        == (0,)
    rows = [tuple(r) for r in __import__(
        "clickhouse_from_scratch_spark.plans", fromlist=["execute_sql"])
        .execute_sql(spark, "SELECT number % 2 AS g, number AS n FROM "
                     "numbers(6) QUALIFY row_number() OVER (PARTITION "
                     "BY g ORDER BY n DESC) = 1 ORDER BY g", {})
        .collect()]
    assert rows == [(0, 4), (1, 5)]


def test_date_diff_subsecond_units(spark):
    assert one(spark, "SELECT dateDiff('millisecond', "
               "toDateTime64('2024-01-02 03:04:05.000', 3), "
               "toDateTime64('2024-01-02 03:04:05.123', 3)) AS d") \
        == (123,)
    assert one(spark, "SELECT dateDiff('microsecond', "
               "toDateTime64('2024-01-02 03:04:05.000', 3), "
               "toDateTime64('2024-01-02 03:04:05.001', 3)) AS d") \
        == (1000,)


def test_to_string_with_timezone(spark):
    assert one(spark, "SELECT toString(toDateTime("
               "'2024-01-01 12:00:00'), 'Asia/Tokyo') AS s") \
        == ("2024-01-01 21:00:00",)


def test_parse_datetime_tail_names(spark):
    import datetime
    assert one(spark, "SELECT parseDateTimeOrZero('bad', '%Y') AS t") \
        == (datetime.datetime(1970, 1, 1),)
    assert one(spark, "SELECT parseDateTimeBestEffortUS("
               "'1/31/2024') AS t") == (datetime.datetime(2024, 1, 31),)
    assert one(spark, "SELECT parseDateTimeInJodaSyntaxOrNull("
               "'x', 'yyyy') AS t") == (None,)
    assert one(spark, "SELECT serverTimeZone() AS tz") == ("UTC",)


def test_except_strict_raises_on_missing(spark):
    import pytest
    with pytest.raises(Exception, match="EXCEPT STRICT"):
        one(spark, "SELECT * EXCEPT STRICT (nope) FROM (SELECT 1 AS a)")
    assert one(spark, "SELECT * EXCEPT STRICT (b) FROM "
               "(SELECT 1 AS a, 2 AS b)") == (1,)


def test_parse_datetime_day_of_year(spark):
    import datetime
    assert one(spark, "SELECT parseDateTime('2024 60', '%Y %j') AS t") \
        == (datetime.datetime(2024, 2, 29),)
    assert one(spark, "SELECT parseDateTime('2024 060', '%Y %j') AS t") \
        == (datetime.datetime(2024, 2, 29),)


def test_array_array_combinator_stacking(spark):
    assert one(spark, "SELECT sumArrayArray(a) AS s FROM "
               "(SELECT [[1,2],[3]] AS a UNION ALL SELECT [[4]])") \
        == (10.0,)


def test_ranked_enumerate_named_not_implemented(spark):
    import pytest
    with pytest.raises(Exception, match="NOT_IMPLEMENTED"):
        one(spark, "SELECT arrayEnumerateUniqRanked([[1]])")


# --- remote-source table functions -------------------------------------------

def test_null_table_function_empty_with_schema(spark):
    rows = __import__("clickhouse_from_scratch_spark.plans",
                      fromlist=["execute_sql"]).execute_sql(
        spark, "SELECT * FROM null('a UInt8, s String')", {})
    assert rows.collect() == [] and rows.columns == ["a", "s"]


def test_remote_cluster_resolve_locally(spark, tmp_path):
    from clickhouse_from_scratch_spark.ddl import ChSession
    s = ChSession(spark, warehouse=str(tmp_path / "wh"))
    s.execute("CREATE TABLE rt (a UInt32) ENGINE = Memory")
    s.execute("INSERT INTO rt VALUES (7)")
    assert s.execute("SELECT a FROM remote('h:9000', default, rt)") \
        .collect()[0][0] == 7
    assert s.execute("SELECT a FROM cluster('c', default.rt)") \
        .collect()[0][0] == 7
    assert s.execute("SELECT * FROM remote('h', system.one)") \
        .collect()[0][0] == 0
    import pytest
    with pytest.raises(Exception, match="unknown table"):
        s.execute("SELECT * FROM remote('h', nodb.notab)")


def test_s3_table_function_local_file(spark, tmp_path):
    p = str(tmp_path / "x.parquet")
    spark.range(3).toDF("n").write.parquet(p)
    rows = __import__("clickhouse_from_scratch_spark.plans",
                      fromlist=["execute_sql"]).execute_sql(
        spark, f"SELECT count() AS c FROM s3('file://{p}', 'Parquet')",
        {})
    assert rows.collect()[0][0] == 3


# --- JSON tail ----------------------------------------------------------------

def test_json_extract_keys_and_values_raw(spark):
    assert one(spark, "SELECT JSONExtractKeysAndValuesRaw("
               "'{\"a\":[1,2],\"b\":\"x\"}') AS kv") == (
        [("a", "[1,2]"), ("b", '"x"')],)


def test_json_merge_patch_rfc7386(spark):
    assert one(spark, "SELECT jsonMergePatch('{\"a\":1,\"c\":3}', "
               "'{\"b\":2,\"c\":null}') AS m") == ('{"a":1,"b":2}',)


def test_json_all_paths_and_json_type_cast(spark):
    assert one(spark, "SELECT JSONAllPaths("
               "'{\"a\":{\"b\":1},\"c\":[{\"d\":2}]}'::JSON) AS p") \
        == (["a.b", "c.d"],)


def test_h3_named_not_implemented(spark):
    import pytest
    with pytest.raises(Exception, match="NOT_IMPLEMENTED"):
        one(spark, "SELECT geoToH3(1.0, 2.0, 3)")
