"""Type-zoo stress fixtures created through the engine's own DDL
(FIXTURES.md §B): numeric edges, nullables, nested types, time types,
string-ish types, versioned dups, as-of pairs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from clickhouse_from_scratch_spark.ddl import ChSession
from clickhouse_from_scratch_spark.operators import asof_join


@pytest.fixture()
def sess(spark, tmp_path):
    return ChSession(spark, warehouse=str(tmp_path / "wh"))


def test_t_numeric(sess):
    sess.execute(
        "CREATE TABLE t_numeric (i8 Int8, i16 Int16, i32 Int32, i64 Int64, "
        "u8 UInt8, u16 UInt16, u32 UInt32, u64 UInt64, f32 Float32, "
        "f64 Float64, d Decimal(38,10), d64 Decimal64(4)) ENGINE = Memory")
    sess.execute(
        "INSERT INTO t_numeric VALUES "
        "(-128, -32768, -2147483648, -9223372036854775808, 255, 65535, "
        "4294967295, 9223372036854775807, 1.5, 2.5, 1.0000000001, 3.1415), "
        "(127, 32767, 2147483647, 9223372036854775807, 0, 0, 0, 0, "
        "0.1, 0.2, 2.0000000002, 2.7182)")
    r = sess.execute("SELECT min(i8) AS a, max(i8) AS b, max(u32) AS c, "
                     "max(u64) AS d, round(sum(d64), 4) AS s "
                     "FROM t_numeric").collect()[0]
    assert (r.a, r.b) == (-128, 127)
    assert r.c == 4294967295          # UInt32 widened to long
    assert r.d == 9223372036854775807  # UInt64→Int64 policy: ≤2^63-1 exact
    assert float(r.s) == pytest.approx(5.8597)
    desc = {row.name: row.type for row in
            sess.execute("DESCRIBE t_numeric").collect()}
    assert desc["u64"] == "UInt64" and desc["d"] == "Decimal(38,10)"


def test_float_special_ordering(sess):
    sess.execute("CREATE TABLE t_float (x Float64) ENGINE = Memory")
    sess.execute("INSERT INTO t_float VALUES (1.0), (0.5), (2.5)")
    got = [r.x for r in sess.execute(
        "SELECT x FROM t_float ORDER BY x DESC").collect()]
    assert got == [2.5, 1.0, 0.5]


def test_t_nullable(sess):
    sess.execute("CREATE TABLE t_nullable (id Int32, ni Nullable(Int32), "
                 "ns Nullable(String)) ENGINE = Memory")
    sess.execute("INSERT INTO t_nullable VALUES (1, 10, 'x'), "
                 "(2, NULL, NULL), (3, 30, 'z')")
    rows = sess.execute(
        "SELECT id FROM t_nullable ORDER BY ni ASC NULLS FIRST").collect()
    assert [r.id for r in rows] == [2, 1, 3]
    rows = sess.execute(
        "SELECT id FROM t_nullable ORDER BY ni DESC NULLS LAST").collect()
    assert [r.id for r in rows] == [3, 1, 2]
    n = sess.execute("SELECT count() AS n FROM t_nullable "
                     "WHERE ns IS NULL").collect()[0].n
    assert n == 1
    r = sess.execute("SELECT ifNull(ni, -1) AS v FROM t_nullable "
                     "WHERE id = 2").collect()[0]
    assert r.v == -1


def test_join_use_nulls_defaults(spark):
    """join_use_nulls=0: outer-join misses get type defaults, not NULL."""
    from clickhouse_from_scratch_spark.operators import join_with_defaults
    left = spark.createDataFrame([(1,), (2,)], "k int")
    right = spark.createDataFrame([(1, 7, "hit")], "k int, n int, s string")
    out = {r.k: (r.n, r.s) for r in
           join_with_defaults(left, right, on=["k"]).collect()}
    assert out[2] == (0, "")


def test_t_nested(sess):
    sess.execute("CREATE TABLE t_nested (id Int32, arr Array(Int64), "
                 "aas Array(Array(String)), tup Tuple(String, Int64), "
                 "m Map(String, Int64)) ENGINE = Memory")
    sess.execute(
        "INSERT INTO t_nested VALUES "
        "(1, [1, 2, 3], [['a'], ['b', 'c']], ('x', 7), map('k', 9)), "
        "(2, [], [], ('y', 8), map())")
    r = sess.execute("SELECT arraySum(arr) AS s, length(aas) AS n, "
                     "tup.1 AS t1, m['k'] AS mv FROM t_nested "
                     "WHERE id = 1").collect()[0]
    assert (r.s, r.n, r.t1, r.mv) == (3.0 * 2, 2, "x", 9)
    # INNER vs LEFT ARRAY JOIN on the empty-array row
    inner = sess.execute("SELECT id, a FROM t_nested ARRAY JOIN arr AS a")
    assert inner.count() == 3
    left = sess.execute("SELECT id, a FROM t_nested LEFT ARRAY JOIN arr AS a")
    got = left.collect()
    assert len(got) == 4 and any(r.id == 2 and r.a is None for r in got)


def test_t_time(sess):
    sess.execute("CREATE TABLE t_time (d Date, dt DateTime, "
                 "dt3 DateTime64(3), dt9 DateTime64(9)) ENGINE = Memory")
    sess.execute("INSERT INTO t_time VALUES "
                 "('2024-03-15', '2024-03-15 12:30:45', "
                 "'2024-03-15 12:30:45.123', '2024-03-15 12:30:45.123456789')")
    r = sess.execute(
        "SELECT toYear(d) AS y, toMonth(d) AS m, toDayOfMonth(d) AS dd, "
        "toHour(dt) AS h, EXTRACT(MINUTE FROM dt) AS mi, "
        "toStartOfMonth(d) AS som, dateDiff('day', toDate('2024-01-01'), d) "
        "AS diff FROM t_time").collect()[0]
    assert (r.y, r.m, r.dd, r.h, r.mi) == (2024, 3, 15, 12, 30)
    assert str(r.som) == "2024-03-01"
    assert r.diff == 74
    # interval arithmetic through the dialect
    r2 = sess.execute("SELECT dt + INTERVAL 90 MINUTE AS t FROM t_time"
                      ).collect()[0]
    assert str(r2.t) == "2024-03-15 14:00:45"
    # DateTime64(9) truncates to µs (documented policy)
    r3 = sess.execute("SELECT dt9 FROM t_time").collect()[0]
    assert r3.dt9.microsecond == 123456


def test_t_strings(sess):
    sess.execute("CREATE TABLE t_strings (fs FixedString(8), u UUID, "
                 "e Enum8('a' = 1, 'b' = 2), ip4 IPv4) ENGINE = Memory")
    sess.execute("INSERT INTO t_strings VALUES "
                 "('fixed', '550e8400-e29b-41d4-a716-446655440000', 'a', "
                 "'10.0.0.1'), "
                 "('x_y', '650e8400-e29b-41d4-a716-446655440000', 'b', "
                 "'192.168.1.1')")
    # LIKE metacharacters: _ and % behave per SQL, literal _ matches itself
    n = sess.execute("SELECT count() AS n FROM t_strings "
                     "WHERE fs LIKE 'x_y'").collect()[0].n
    assert n == 1
    n2 = sess.execute("SELECT count() AS n FROM t_strings "
                      "WHERE u ILIKE '550E%'").collect()[0].n
    assert n2 == 1
    r = sess.execute("SELECT IPv4StringToNum(ip4) AS v FROM t_strings "
                     "WHERE fs = 'fixed'").collect()[0]
    assert r.v == 10 * 16777216 + 1


def test_t_dups_final_distinct_on(sess):
    sess.execute("CREATE TABLE t_dups (id Int64, ver Int64, payload String) "
                 "ENGINE = ReplacingMergeTree ORDER BY id")
    sess.execute("INSERT INTO t_dups VALUES (1, 1, 'old'), (1, 2, 'new'), "
                 "(2, 1, 'only'), (3, 1, 'x'), (3, 3, 'y'), (3, 2, 'mid')")
    # FINAL keeps the max-version row per ORDER BY key (version defaults
    # to the last ORDER BY column unless declared; here ver via metadata)
    sess._db()["t_dups"].settings["version"] = "ver"
    got = {r.id: r.payload for r in sess.execute(
        "SELECT id, payload FROM t_dups FINAL").collect()}
    assert got == {1: "new", 2: "only", 3: "y"}
    # DISTINCT ON → LIMIT 1 BY rewrite
    got2 = {r.id: r.ver for r in sess.execute(
        "SELECT DISTINCT ON (id) id, ver FROM t_dups "
        "ORDER BY ver DESC, id").collect()}
    assert got2 == {1: 2, 2: 1, 3: 3}
    # OPTIMIZE ... DEDUPLICATE BY collapses to one row per id
    sess.execute("OPTIMIZE TABLE t_dups DEDUPLICATE BY id")
    assert sess.execute("SELECT count() AS n FROM t_dups").collect()[0].n == 3


def test_t_asof(sess, spark):
    sess.execute("CREATE TABLE trades (sym String, t Int64, qty Int64) "
                 "ENGINE = Memory")
    sess.execute("CREATE TABLE quotes (sym String, t Int64, px Float64) "
                 "ENGINE = Memory")
    sess.execute("INSERT INTO trades VALUES ('A', 10, 100), ('A', 20, 200), "
                 "('B', 15, 300)")
    sess.execute("INSERT INTO quotes VALUES ('A', 8, 1.0), ('A', 15, 2.0), "
                 "('A', 20, 3.0), ('B', 99, 9.0)")
    out = sess.execute(
        "SELECT sym, t, qty, px FROM trades ASOF LEFT JOIN quotes "
        "ON trades.sym = quotes.sym AND trades.t >= quotes.t")
    got = {(r.sym, r.t): r.px for r in out.collect()}
    assert got == {("A", 10): 1.0, ("A", 20): 3.0, ("B", 15): None}


# --- CH numeric promotion (getLeastSupertype + NumberTraits) ---------------

def _one(sess, expr):
    row = sess.execute(f"SELECT {expr} AS v FROM t_promo LIMIT 1")
    return row.schema["v"].dataType.simpleString(), row.collect()[0].v


@pytest.fixture()
def promo_sess(sess):
    sess.execute("CREATE TABLE t_promo (i8 Int8, i16 Int16, i32 Int32, "
                 "i64 Int64, u8 UInt8, u16 UInt16, u32 UInt32, "
                 "f32 Float32) ENGINE = Memory")
    sess.execute("INSERT INTO t_promo VALUES "
                 "(127, 32767, 2147483647, 9223372036854775807, "
                 "255, 65535, 4294967295, 1.5)")
    return sess


def test_arithmetic_widens_one_size_class(promo_sess):
    # NumberTraits::ResultOfAdditionMultiplication — no overflow at the
    # operands' width (Spark's native tinyint+tinyint would wrap/raise)
    assert _one(promo_sess, "i8 + i8") == ("smallint", 254)
    assert _one(promo_sess, "u8 + i8") == ("smallint", 382)      # → Int16
    assert _one(promo_sess, "i16 * i16") == ("int", 32767 * 32767)
    assert _one(promo_sess, "i32 + i32") == ("bigint", 2 * 2147483647)
    assert _one(promo_sess, "u8 + u8") == ("int", 510)           # → UInt16
    # 64-bit does not auto-widen (nextSize caps at 8 bytes)
    t, _ = _one(promo_sess, "i64 + 0")
    assert t == "bigint"


def test_minus_is_always_signed(promo_sess):
    # ResultOfSubtraction: signed even for unsigned operands
    assert _one(promo_sess, "u8 - 300") == ("int", -45)          # → Int32


def test_literal_typing(promo_sess):
    # FieldToDataType: 1 is UInt8, 300 is UInt16, -1 is Int8
    assert _one(promo_sess, "i8 + 1") == ("smallint", 128)       # Int8+UInt8
    assert _one(promo_sess, "i8 + 300") == ("int", 427)          # +UInt16
    assert _one(promo_sess, "u8 * 2") == ("int", 510)            # UInt8*UInt8
    assert _one(promo_sess, "i8 - 1") == ("smallint", 126)


def test_intdiv_modulo_result_types(promo_sess):
    # ResultOfIntegerDivision: dividend's width; ResultOfModulo: divisor's
    # width, one wider for a signed dividend
    assert _one(promo_sess, "intDiv(i32, u8)") == ("int", 8421504)
    assert _one(promo_sess, "intDiv(u8, u8)") == ("smallint", 1)  # UInt8
    t, v = _one(promo_sess, "(0 - 199) % u8")
    assert v == -199 and t == "smallint"    # Int16 holds the negative rem


def test_float_contagion(promo_sess):
    # any float → Float64 result (nextSize(max size) = 8 bytes)
    t, v = _one(promo_sess, "f32 + u8")
    assert t == "double" and v == 256.5
    t, _ = _one(promo_sess, "f32 * f32")
    assert t == "double"


def test_if_least_supertype(promo_sess):
    # getLeastSupertype: Int8 ∪ UInt8 = Int16, Int32 ∪ UInt32 = Int64
    assert _one(promo_sess, "if(1 = 1, i8, u8)") == ("smallint", 127)
    assert _one(promo_sess, "if(1 = 0, i32, u32)") == ("bigint", 4294967295)
    assert _one(promo_sess, "multiIf(1 = 0, i8, 1 = 1, u16, i8)") \
        == ("int", 65535)


def test_least_supertype_unit():
    from clickhouse_from_scratch_spark.functions.typemap import (
        NoCommonTypeError, least_supertype)
    assert least_supertype(["Int8", "UInt8"]) == "Int16"
    assert least_supertype(["Int32", "UInt32"]) == "Int64"
    assert least_supertype(["UInt8", "UInt16"]) == "UInt16"
    assert least_supertype(["Int8", "Int8"]) == "Int8"
    assert least_supertype(["Int16", "Float32"]) == "Float32"
    assert least_supertype(["Int32", "Float32"]) == "Float64"
    assert least_supertype(["String", "String"]) == "String"
    with pytest.raises(NoCommonTypeError):
        least_supertype(["Int64", "UInt64"])   # no signed 65-bit type
    with pytest.raises(NoCommonTypeError):
        # 64 integer bits don't fit any float mantissa (24/53)
        least_supertype(["UInt64", "Float32"])
    with pytest.raises(NoCommonTypeError):
        least_supertype(["String", "Int8"])


def test_uint64_and_int128_literals(spark):
    """UInt64 literals beyond Int64 keep the 64-bit pattern in LongType
    (documented modulo-2^64 policy); wider literals land in
    Decimal(38,0)."""
    from clickhouse_from_scratch_spark.plans import execute_sql
    r = execute_sql(spark, "SELECT 18446744073709551615 AS u64max, "
                           "99999999999999999999999999 AS big",
                    {}).collect()[0]
    assert r.u64max == -1                 # 0xFFFF..FF as signed long
    assert int(r.big) == 99999999999999999999999999


def test_uint_conversion_wraps_modulo(spark):
    from clickhouse_from_scratch_spark.plans import execute_sql
    t = {"t": spark.createDataFrame([(1,)], "k int")}
    r = execute_sql(
        spark, "SELECT toUInt8(300) AS a, toUInt8(-1) AS b, "
        "toUInt16(70000) AS c, toUInt8('200') AS d FROM t", t).collect()[0]
    # CH wraps modulo 2^N on out-of-range input
    assert (r.a, r.b, r.c, r.d) == (44, 255, 4464, 200)
