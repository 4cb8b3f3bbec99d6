"""Multi-statement DDL interactions (round-8 probe sweep → pins):
MV cascade depth, EPHEMERAL + ALTER, dictionary reload, TRUNCATE vs MV,
RENAME attribute survival, DETACH/ATTACH round-trip, EXCHANGE, MV
ENGINE clause, ALTER MODIFY COLUMN conversion.

Reference grammar: ParserCreateQuery.cpp (ATTACH-without-definition,
materialized-view ENGINE clause), ParserRenameQuery.cpp (EXCHANGE)."""

from __future__ import annotations

import pytest

from clickhouse_from_scratch_spark.ddl import ChSession


@pytest.fixture()
def sess(spark, tmp_path):
    return ChSession(spark, warehouse=str(tmp_path / "wh"))


def test_mv_chain_depth3_cascades(sess):
    sess.execute("CREATE TABLE src (x Int64) ENGINE = Memory")
    sess.execute("CREATE MATERIALIZED VIEW m1 ENGINE = Memory AS "
                 "SELECT x * 10 AS y FROM src")
    sess.execute("CREATE MATERIALIZED VIEW m2 ENGINE = Memory AS "
                 "SELECT y + 1 AS z FROM m1")
    sess.execute("CREATE MATERIALIZED VIEW m3 ENGINE = Memory AS "
                 "SELECT z * 2 AS w FROM m2")
    sess.execute("INSERT INTO src VALUES (1), (2)")
    sess.execute("INSERT INTO src VALUES (3)")
    got = sorted(r.w for r in sess.execute("SELECT w FROM m3").collect())
    assert got == [22, 42, 62]


def test_mv_engine_with_order_by_clause_parses(sess):
    sess.execute("CREATE TABLE s2 (x Int64) ENGINE = Memory")
    sess.execute("CREATE MATERIALIZED VIEW me ENGINE = MergeTree "
                 "ORDER BY y AS SELECT x AS y FROM s2")
    sess.execute("INSERT INTO s2 VALUES (4)")
    assert [r.y for r in sess.execute("SELECT y FROM me").collect()] == [4]


def test_ephemeral_plus_alter_add_default(sess):
    sess.execute("CREATE TABLE e1 (x Int64, eph Int64 EPHEMERAL, "
                 "d Int64 DEFAULT eph + 1) ENGINE = Memory")
    sess.execute("INSERT INTO e1 (x, eph) VALUES (1, 10)")
    sess.execute("ALTER TABLE e1 ADD COLUMN y Int64 DEFAULT 7")
    sess.execute("INSERT INTO e1 (x, eph) VALUES (2, 20)")
    got = sorted(tuple(r) for r in
                 sess.execute("SELECT x, d, y FROM e1").collect())
    assert got == [(1, 11, 7), (2, 21, 7)]


def test_dictionary_reload_after_source_insert(sess):
    sess.execute("CREATE TABLE dsrc (id UInt64, name String) "
                 "ENGINE = Memory")
    sess.execute("INSERT INTO dsrc VALUES (1, 'a')")
    sess.execute("CREATE DICTIONARY d1 (id UInt64, name String "
                 "DEFAULT '?') PRIMARY KEY id "
                 "SOURCE(CLICKHOUSE(TABLE 'dsrc')) LAYOUT(FLAT()) "
                 "LIFETIME(0)")
    sess.execute("INSERT INTO dsrc VALUES (2, 'b')")
    sess.execute("SYSTEM RELOAD DICTIONARY d1")
    v = sess.execute(
        "SELECT dictGet('d1', 'name', toUInt64(2)) AS v").collect()[0].v
    assert v == "b"


def test_truncate_source_keeps_mv_target(sess):
    sess.execute("CREATE TABLE ts (x Int64) ENGINE = Memory")
    sess.execute("CREATE MATERIALIZED VIEW tm ENGINE = Memory AS "
                 "SELECT x FROM ts")
    sess.execute("INSERT INTO ts VALUES (1)")
    sess.execute("TRUNCATE TABLE ts")
    assert sess.execute("SELECT count() AS n FROM ts").collect()[0].n == 0
    assert sess.execute("SELECT count() AS n FROM tm").collect()[0].n == 1


def test_rename_keeps_data_and_attributes(sess):
    sess.execute("CREATE TABLE r1 (x Int64 DEFAULT 5 COMMENT 'c1') "
                 "ENGINE = Memory")
    sess.execute("INSERT INTO r1 (x) VALUES (1)")
    sess.execute("RENAME TABLE r1 TO r2")
    assert [r.x for r in sess.execute("SELECT x FROM r2").collect()] == [1]
    d = sess.execute("DESCRIBE r2").collect()[0]
    assert d.default_type == "DEFAULT" and d.comment == "c1"


def test_detach_attach_roundtrip(sess):
    sess.execute("CREATE TABLE da (x Int64) ENGINE = MergeTree ORDER BY x")
    sess.execute("INSERT INTO da VALUES (1), (2)")
    sess.execute("DETACH TABLE da")
    with pytest.raises(Exception):
        sess.execute("SELECT count() FROM da").collect()
    sess.execute("ATTACH TABLE da")
    assert sess.execute("SELECT count() AS n FROM da").collect()[0].n == 2


def test_attach_unknown_raises_named(sess):
    with pytest.raises(ValueError, match="not detached"):
        sess.execute("ATTACH TABLE nosuch")


def test_attach_with_definition_still_creates(sess):
    # ATTACH TABLE with a full definition is the CREATE-style form
    sess.execute("ATTACH TABLE awd (x Int64) ENGINE = Memory")
    sess.execute("INSERT INTO awd VALUES (9)")
    assert sess.execute("SELECT x FROM awd").collect()[0].x == 9


def test_exchange_tables_swaps(sess):
    sess.execute("CREATE TABLE ea (x Int64) ENGINE = Memory")
    sess.execute("CREATE TABLE eb (x Int64) ENGINE = Memory")
    sess.execute("INSERT INTO ea VALUES (1)")
    sess.execute("INSERT INTO eb VALUES (2)")
    sess.execute("EXCHANGE TABLES ea AND eb")
    assert sess.execute("SELECT x FROM ea").collect()[0].x == 2
    assert sess.execute("SELECT x FROM eb").collect()[0].x == 1


def test_mv_to_target_survives_drop_view(sess):
    sess.execute("CREATE TABLE tgt (y Int64) ENGINE = Memory")
    sess.execute("CREATE TABLE msrc (x Int64) ENGINE = Memory")
    sess.execute("CREATE MATERIALIZED VIEW mv TO tgt AS "
                 "SELECT x * 2 AS y FROM msrc")
    sess.execute("INSERT INTO msrc VALUES (5)")
    sess.execute("DROP VIEW mv")
    assert [r.y for r in sess.execute("SELECT y FROM tgt").collect()] \
        == [10]
    sess.execute("INSERT INTO msrc VALUES (6)")
    assert [r.y for r in sess.execute("SELECT y FROM tgt").collect()] \
        == [10]


def test_alter_clear_column_resets_to_type_default(sess):
    sess.execute("CREATE TABLE cc (a Int64, b String, f Float64) "
                 "ENGINE = MergeTree ORDER BY a")
    sess.execute("INSERT INTO cc VALUES (1, 'x', 1.5), (2, 'y', 2.5)")
    sess.execute("ALTER TABLE cc CLEAR COLUMN b")
    assert sorted(tuple(r) for r in
                  sess.execute("SELECT a, b, f FROM cc").collect()) \
        == [(1, "", 1.5), (2, "", 2.5)]
    sess.execute("ALTER TABLE cc CLEAR COLUMN IF EXISTS nosuch")
    with pytest.raises(ValueError):
        sess.execute("ALTER TABLE cc CLEAR COLUMN nosuch")


def test_alter_modify_table_comment(sess):
    sess.execute("CREATE TABLE mc (a Int64) ENGINE = Memory")
    sess.execute("ALTER TABLE mc MODIFY COMMENT 'the table'")


def test_show_settings_defaults_and_changed(sess):
    assert sess.execute("SELECT count() > 0 AS c FROM system.settings") \
        .collect()[0].c
    sess.execute("SET join_use_nulls = 1")
    rows = {r.name: (r.value, r.changed) for r in
            sess.execute("SHOW SETTINGS LIKE 'join%'").collect()}
    assert rows["join_use_nulls"] == ("1", 1)
    assert rows["join_algorithm"][1] == 0
    changed = [r.name for r in
               sess.execute("SHOW CHANGED SETTINGS").collect()]
    assert changed == ["join_use_nulls"]


def test_alter_modify_column_type_converts(sess):
    sess.execute("CREATE TABLE am (x Int64) ENGINE = Memory")
    sess.execute("INSERT INTO am VALUES (1), (2)")
    sess.execute("ALTER TABLE am MODIFY COLUMN x String")
    assert sorted(r.x for r in
                  sess.execute("SELECT x FROM am").collect()) == ["1", "2"]
    assert sess.execute("DESCRIBE am").collect()[0].type == "String"
