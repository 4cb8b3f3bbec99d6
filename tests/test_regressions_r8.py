"""Round-8 regression pins (ADVICE + verdict items):

1. NOT IN with a NULL lhs returns 0 at EVERY lowering site
   (transform_null_in=0: the result of an IN operation involving NULL
   is always 0 for both IN and NOT IN).
2. Parametric groupArray(N)/groupUniqArray(N)/groupArrayIf(N).
3. splitBy* max_substrings discards the remainder by default
   (splitby_max_substrings_includes_remaining_string=0).
4. javaHash hashes supplementary-plane codepoints as surrogate pairs.
5. SHOW CREATE escapes column comments.
"""

from __future__ import annotations

import pytest

from clickhouse_from_scratch_spark.plans.engine import execute_sql


def rows(spark, sql, tables=None):
    return [tuple(r) for r in execute_sql(spark, sql, tables or {}).collect()]


def one(spark, sql):
    return rows(spark, sql)[0]


# --- 1: NOT IN null processing ---------------------------------------------

def test_not_in_null_lhs_literal_list(spark):
    assert one(spark, "SELECT NULL IN (1, 2) AS a, NULL NOT IN (1, 2) AS b") \
        == (False, False)


def test_not_in_null_lhs_expression_position_subquery(spark):
    assert rows(spark,
                "SELECT number, nullIf(number, 1) NOT IN (SELECT number "
                "FROM numbers(3)) AS r FROM numbers(3) ORDER BY number") \
        == [(0, False), (1, False), (2, False)]


def test_not_in_null_lhs_where_subquery(spark):
    # anti-join lowering: the NULL-key row must be dropped, not kept
    assert one(spark,
               "SELECT count() AS c FROM numbers(3) WHERE "
               "nullIf(number, 1) NOT IN (SELECT number + 10 "
               "FROM numbers(3))") == (2,)


def test_in_null_lhs_where_subquery(spark):
    assert one(spark,
               "SELECT count() AS c FROM numbers(3) WHERE "
               "nullIf(number, 1) IN (SELECT number FROM numbers(3))") \
        == (2,)


def test_not_in_non_null_lhs_unchanged(spark):
    assert one(spark, "SELECT 1 IN (1, 2) AS a, 1 NOT IN (1, 2) AS b, "
               "3 NOT IN (1, 2) AS c") == (True, False, True)


# --- 2: parametric groupArray family ---------------------------------------

def test_group_array_max_size(spark):
    assert one(spark, "SELECT groupArray(2)(number) AS r FROM "
               "(SELECT number FROM numbers(5) ORDER BY number)") \
        == ([0, 1],)


def test_group_array_max_size_larger_than_group(spark):
    assert one(spark, "SELECT groupArray(10)(number) AS r "
               "FROM numbers(3)") == ([0, 1, 2],)


def test_group_uniq_array_max_size(spark):
    (r,) = one(spark, "SELECT groupUniqArray(2)(number % 3) AS r "
               "FROM numbers(9)")
    assert len(r) == 2 and set(r) <= {0, 1, 2}


def test_group_array_if_parametric_stack(spark):
    assert one(spark, "SELECT groupArrayIf(2)(number, number > 1) AS r "
               "FROM (SELECT number FROM numbers(6) ORDER BY number)") \
        == ([2, 3],)


def test_non_parametric_aggregate_rejects_params(spark):
    from clickhouse_from_scratch_spark.plans.builder import BuildError
    with pytest.raises(BuildError):
        execute_sql(spark, "SELECT uniqExact(1)(number) FROM numbers(3)",
                    {}).schema


# --- 4: javaHash UTF-16 units ----------------------------------------------

def _java_hash_py(s: str) -> int:
    import struct
    enc = s.encode("utf-16-be")
    units = struct.unpack(f">{len(enc) // 2}H", enc)
    h = 0
    for u in units:
        h = (h * 31 + u) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h


def test_java_hash_bmp(spark):
    assert one(spark, "SELECT javaHash('Hello, world!') AS r") \
        == (-1880044555,)


def test_java_hash_supplementary_plane(spark):
    for s in ("a\U0001F600b", "\U0001D11E", "\U0001F600\U0001F601"):
        assert one(spark, f"SELECT javaHash('{s}') AS r") \
            == (_java_hash_py(s),), s


# --- 6: JSON extract defaults / JSONHas null / JSONLength scalar ------------

def test_json_extract_missing_key_type_default(spark):
    assert one(spark, """SELECT JSONExtractInt('{"a": 3}', 'b') AS a,
        JSONExtractString('{}', 'a') AS b,
        JSONExtractFloat('{}', 'a') AS c,
        JSONExtractBool('{}', 'a') AS d,
        JSONExtractInt('not json', 'a') AS e""") \
        == (0, "", 0.0, False, 0)


def test_json_has_sees_null_valued_key(spark):
    assert one(spark, """SELECT JSONHas('{"a": null}', 'a') AS a,
        JSONHas('{}', 'a') AS b""") == (True, False)


def test_json_has_array_index_bounds(spark):
    assert one(spark, """SELECT JSONHas('{"a":[1,2]}', 'a', 1) AS a,
        JSONHas('{"a":[1,2]}', 'a', 3) AS b,
        JSONHas('{"a":[1,2]}', 'a', -2) AS c,
        JSONHas('{"a":[1,2]}', 'a', -3) AS d""") \
        == (True, False, True, False)


def test_json_length_scalar_is_zero(spark):
    assert one(spark, "SELECT JSONLength('3') AS a, "
               "JSONLength('bad') AS b, JSONLength('[1,2]') AS c") \
        == (0, 0, 2)


# --- 7: arrayResize negative size (resize from the left) --------------------

def test_array_resize_negative(spark):
    assert one(spark, "SELECT arrayResize([1,2,3], -2) AS a, "
               "arrayResize([1,2,3], -5) AS b, "
               "arrayResize([1,2,3], 2) AS c, "
               "arrayResize([1,2,3], 5) AS d") \
        == ([2, 3], [0, 0, 1, 2, 3], [1, 2], [1, 2, 3, 0, 0])


def test_array_resize_dynamic_size(spark):
    assert rows(spark, "SELECT arrayResize([1,2,3], number - 2) AS r "
                "FROM numbers(5) ORDER BY number") \
        == [([2, 3],), ([3],), ([],), ([1],), ([1, 2],)]


# --- 8: tupleNames / tupleToNameValuePairs -----------------------------------

def test_tuple_names(spark):
    assert one(spark, "SELECT tupleNames(tuple(1, 2)) AS r") \
        == (["1", "2"],)


def test_tuple_to_name_value_pairs(spark):
    (r,) = one(spark, "SELECT tupleToNameValuePairs(tuple(10, 20)) AS r")
    assert [tuple(p) for p in r] == [("1", 10), ("2", 20)]


# --- 9: date arithmetic typing (round-8 probe batch) -------------------------

def test_date_minus_date_is_days(spark):
    assert one(spark, "SELECT toDate('2024-03-05') - "
               "toDate('2024-03-01') AS r") == (4,)


def test_datetime_minus_datetime_is_seconds(spark):
    assert one(spark, "SELECT toDateTime('2024-01-01 00:01:00') - "
               "toDateTime('2024-01-01 00:00:30') AS r") == (30,)


def test_add_days_keeps_datetime_time_of_day(spark):
    import datetime as dt
    assert one(spark, "SELECT addDays(toDateTime("
               "'2024-01-01 05:00:00'), 1) AS r") \
        == (dt.datetime(2024, 1, 2, 5, 0),)
    assert one(spark, "SELECT addMonths(toDateTime("
               "'2024-01-31 05:00:00'), 1) AS r") \
        == (dt.datetime(2024, 2, 29, 5, 0),)


def test_add_units_date_stays_date(spark):
    import datetime as dt
    assert one(spark, "SELECT addDays(toDate('2024-01-01'), 1) AS a, "
               "addWeeks(toDate('2024-01-01'), 2) AS b, "
               "subtractYears(toDate('2024-02-29'), 1) AS c") \
        == (dt.date(2024, 1, 2), dt.date(2024, 1, 15),
            dt.date(2023, 2, 28))


def test_add_units_column_count(spark):
    import datetime as dt
    assert rows(spark, "SELECT addWeeks(toDate('2024-01-01'), number) "
                "AS r FROM numbers(3) ORDER BY number") \
        == [(dt.date(2024, 1, 1),), (dt.date(2024, 1, 8),),
            (dt.date(2024, 1, 15),)]


def test_add_seconds_minutes_exist(spark):
    import datetime as dt
    assert one(spark, "SELECT addSeconds(toDateTime("
               "'2024-01-01 00:00:00'), 90) AS a, "
               "addMinutes(toDateTime('2024-01-01 00:00:00'), 2) AS b") \
        == (dt.datetime(2024, 1, 1, 0, 1, 30),
            dt.datetime(2024, 1, 1, 0, 2))


def test_date_plus_bigint_column(spark):
    import datetime as dt
    assert rows(spark, "SELECT toDate('2024-01-01') + number AS r "
                "FROM numbers(2) ORDER BY number") \
        == [(dt.date(2024, 1, 1),), (dt.date(2024, 1, 2),)]
    assert rows(spark, "SELECT number + toDate('2024-01-01') AS r "
                "FROM numbers(2) ORDER BY number") \
        == [(dt.date(2024, 1, 1),), (dt.date(2024, 1, 2),)]


def test_datetime_plus_int_is_seconds(spark):
    import datetime as dt
    assert one(spark, "SELECT toDateTime('2024-01-01 00:00:00') + 61 "
               "AS r") == (dt.datetime(2024, 1, 1, 0, 1, 1),)


def test_dynamic_interval_count(spark):
    import datetime as dt
    assert rows(spark, "SELECT toDate('2024-01-31') + INTERVAL number "
                "MONTH AS r FROM numbers(2) ORDER BY number") \
        == [(dt.date(2024, 1, 31),), (dt.date(2024, 2, 29),)]


def test_range_frame_over_timestamp_seconds(spark):
    assert rows(spark, "SELECT v, sum(v) OVER (ORDER BY t RANGE BETWEEN "
                "86400 PRECEDING AND CURRENT ROW) AS r FROM (SELECT "
                "toDateTime('2024-01-01 00:00:00') + INTERVAL number DAY "
                "AS t, number AS v FROM numbers(4)) ORDER BY v") \
        == [(0, 0), (1, 1), (2, 3), (3, 5)]


def test_range_frame_over_date_days(spark):
    assert rows(spark, "SELECT v, sum(v) OVER (ORDER BY d RANGE BETWEEN "
                "1 PRECEDING AND CURRENT ROW) AS r FROM (SELECT "
                "toDate('2024-01-01') + number AS d, number AS v "
                "FROM numbers(4)) ORDER BY v") \
        == [(0, 0), (1, 1), (2, 3), (3, 5)]


def test_make_date_day_of_year_form(spark):
    import datetime as dt
    assert one(spark, "SELECT makeDate32(2024, 60) AS a, "
               "makeDate(2024, 60) AS b") \
        == (dt.date(2024, 2, 29), dt.date(2024, 2, 29))


# --- 10: Enum numeric casts + map literals (round-8 DDL-type probe) ---------

def test_enum_cast_to_numeric(spark, tmp_path):
    from clickhouse_from_scratch_spark.ddl import ChSession
    s = ChSession(spark, warehouse=str(tmp_path / "wh"))
    s.execute("CREATE TABLE en8 (x Enum8('small' = 1, 'big' = 2)) "
              "ENGINE = Memory")
    s.execute("INSERT INTO en8 VALUES ('small'), ('big')")
    assert sorted(r.v for r in s.execute(
        "SELECT CAST(x, 'Int8') AS v FROM en8").collect()) == [1, 2]
    assert sorted(r.v for r in s.execute(
        "SELECT toInt16(x) AS v FROM en8").collect()) == [1, 2]
    # the name is the string face
    assert sorted(r.x for r in s.execute(
        "SELECT x FROM en8").collect()) == ["big", "small"]


def test_map_literal_braces(spark):
    assert one(spark, "SELECT {'x': 10, 'y': 20}['y'] AS r") == (20,)


def test_map_literal_in_insert_values(spark, tmp_path):
    from clickhouse_from_scratch_spark.ddl import ChSession
    s = ChSession(spark, warehouse=str(tmp_path / "wh"))
    s.execute("CREATE TABLE ml (a Array(Nullable(Int64)), "
              "m Map(String, Int64)) ENGINE = Memory")
    s.execute("INSERT INTO ml VALUES ([1, NULL, 3], {'k': 5})")
    r = s.execute("SELECT a, m['k'] AS mv FROM ml").collect()[0]
    assert list(r.a) == [1, None, 3] and r.mv == 5


def test_query_parameter_braces_still_work(spark):
    from clickhouse_from_scratch_spark.plans.engine import execute_sql
    df = execute_sql(spark, "SELECT {p:Int64} + 1 AS r", {},
                     params={"p": 41})
    assert df.collect()[0].r == 42


# --- 5: SHOW CREATE comment escaping ----------------------------------------

def test_show_create_escapes_comment(spark, tmp_path):
    from clickhouse_from_scratch_spark.ddl import ChSession
    sess = ChSession(spark, warehouse=str(tmp_path / "wh"))
    sess.execute(
        "CREATE TABLE c_esc (x UInt8 COMMENT 'it''s a \\\\ test') "
        "ENGINE = Memory")
    stmt = sess.execute("SHOW CREATE TABLE c_esc").collect()[0][0]
    assert "COMMENT 'it\\'s a \\\\ test'" in stmt
