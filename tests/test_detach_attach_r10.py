"""Round-10: tests for the whole DETACH/ATTACH surface (the round-9
DETACH DATABASE/DICTIONARY fix shipped without tests) plus the ATTACH
ALREADY_EXISTS / double-DETACH guards.

Contracts (public CH): DETACH hides an object keeping meta+data for a
later bare ATTACH; ATTACH over a live same-name object raises
*_ALREADY_EXISTS; a second DETACH of a re-created name must not
silently orphan the first parked entry; the default database cannot be
detached.
"""
from __future__ import annotations

import pytest

from clickhouse_from_scratch_spark.ddl import ChSession


@pytest.fixture()
def sess(spark, tmp_path):
    return ChSession(spark, warehouse=str(tmp_path / "wh"))


def _vals(sess, sql):
    return sorted(tuple(r) for r in sess.execute(sql).collect())


# --- DATABASE round-trip -----------------------------------------------------

def test_detach_attach_database_roundtrip(sess):
    sess.execute("CREATE DATABASE jdb")
    sess.execute("CREATE TABLE jdb.t (v UInt32) ENGINE = Memory")
    sess.execute("INSERT INTO jdb.t VALUES (7)")
    sess.execute("DETACH DATABASE jdb")
    with pytest.raises(Exception):
        sess.execute("SELECT * FROM jdb.t")
    sess.execute("ATTACH DATABASE jdb")
    assert _vals(sess, "SELECT v FROM jdb.t") == [(7,)]


def test_attach_database_over_existing_raises(sess):
    sess.execute("CREATE DATABASE jdb")
    sess.execute("DETACH DATABASE jdb")
    sess.execute("CREATE DATABASE jdb")     # re-create while detached
    with pytest.raises(Exception, match="already exists"):
        sess.execute("ATTACH DATABASE jdb")
    # IF NOT EXISTS form degrades to a no-op
    sess.execute("ATTACH DATABASE IF NOT EXISTS jdb")


def test_double_detach_database_raises(sess):
    sess.execute("CREATE DATABASE jdb")
    sess.execute("DETACH DATABASE jdb")
    sess.execute("CREATE DATABASE jdb")
    with pytest.raises(Exception, match="already detached"):
        sess.execute("DETACH DATABASE jdb")


def test_detach_default_database_forbidden(sess):
    with pytest.raises(Exception, match="default"):
        sess.execute("DETACH DATABASE default")
    # session still usable
    sess.execute("CREATE TABLE t0 (v UInt32) ENGINE = Memory")
    sess.execute("INSERT INTO t0 VALUES (1)")
    assert _vals(sess, "SELECT v FROM t0") == [(1,)]


def test_attach_database_engine_clause_parses(sess):
    # full-definition ATTACH DATABASE x ENGINE = Atomic (valid upstream)
    sess.execute("ATTACH DATABASE adb ENGINE = Atomic")
    sess.execute("CREATE TABLE adb.t (v UInt32) ENGINE = Memory")
    sess.execute("INSERT INTO adb.t VALUES (3)")
    assert _vals(sess, "SELECT v FROM adb.t") == [(3,)]
    sess.execute("CREATE DATABASE cdb ENGINE = Atomic")


# --- DICTIONARY round-trip ---------------------------------------------------

def _mk_dict(sess, name="jd"):
    sess.execute("CREATE TABLE dsrc (id UInt64, nm String) "
                 "ENGINE = Memory")
    sess.execute("INSERT INTO dsrc VALUES (1, 'one'), (2, 'two')")
    sess.execute(
        f"CREATE DICTIONARY {name} (id UInt64, nm String) "
        f"PRIMARY KEY id "
        f"SOURCE(CLICKHOUSE(TABLE 'dsrc')) LAYOUT(FLAT()) LIFETIME(0)")


def test_detach_attach_dictionary_roundtrip(sess):
    _mk_dict(sess)
    assert sess.execute("SELECT dictGet('jd', 'nm', toUInt64(1)) AS x"
                        ).collect()[0][0] == "one"
    sess.execute("DETACH DICTIONARY jd")
    with pytest.raises(Exception):
        sess.execute("SELECT dictGet('jd', 'nm', toUInt64(1)) AS x")
    sess.execute("ATTACH DICTIONARY jd")
    assert sess.execute("SELECT dictGet('jd', 'nm', toUInt64(2)) AS x"
                        ).collect()[0][0] == "two"


def test_attach_dictionary_over_existing_raises(sess):
    _mk_dict(sess)
    sess.execute("DETACH DICTIONARY jd")
    _mk_dict_again = (
        "CREATE DICTIONARY jd (id UInt64, nm String) PRIMARY KEY id "
        "SOURCE(CLICKHOUSE(TABLE 'dsrc')) LAYOUT(FLAT()) LIFETIME(0)")
    sess.execute(_mk_dict_again)
    with pytest.raises(Exception, match="already exists"):
        sess.execute("ATTACH DICTIONARY jd")


def test_double_detach_dictionary_raises(sess):
    _mk_dict(sess)
    sess.execute("DETACH DICTIONARY jd")
    sess.execute(
        "CREATE DICTIONARY jd (id UInt64, nm String) PRIMARY KEY id "
        "SOURCE(CLICKHOUSE(TABLE 'dsrc')) LAYOUT(FLAT()) LIFETIME(0)")
    with pytest.raises(Exception, match="already detached"):
        sess.execute("DETACH DICTIONARY jd")


# --- TABLE --------------------------------------------------------------------

def test_detach_attach_table_roundtrip(sess):
    sess.execute("CREATE TABLE t (v UInt32) ENGINE = Memory")
    sess.execute("INSERT INTO t VALUES (5)")
    sess.execute("DETACH TABLE t")
    with pytest.raises(Exception):
        sess.execute("SELECT * FROM t")
    sess.execute("ATTACH TABLE t")
    assert _vals(sess, "SELECT v FROM t") == [(5,)]


def test_attach_table_over_existing_raises(sess):
    sess.execute("CREATE TABLE t (v UInt32) ENGINE = Memory")
    sess.execute("INSERT INTO t VALUES (5)")
    sess.execute("DETACH TABLE t")
    sess.execute("CREATE TABLE t (v UInt32) ENGINE = Memory")
    sess.execute("INSERT INTO t VALUES (9)")
    with pytest.raises(Exception, match="already exists"):
        sess.execute("ATTACH TABLE t")
    # the live table's data is intact
    assert _vals(sess, "SELECT v FROM t") == [(9,)]


def test_double_detach_table_raises(sess):
    sess.execute("CREATE TABLE t (v UInt32) ENGINE = Memory")
    sess.execute("DETACH TABLE t")
    sess.execute("CREATE TABLE t (v UInt32) ENGINE = Memory")
    with pytest.raises(Exception, match="already detached"):
        sess.execute("DETACH TABLE t")


# --- views of views (round-10 recursion fix) --------------------------------

def test_views_of_views_chain_and_diamond(sess):
    sess.execute("CREATE VIEW v1 AS SELECT number AS n FROM numbers(3)")
    sess.execute("CREATE VIEW v2 AS SELECT n * 2 AS m FROM v1")
    sess.execute("CREATE VIEW v3 AS SELECT m + 1 AS k FROM v2")
    assert _vals(sess, "SELECT sum(m) AS s FROM v2") == [(6,)]
    assert _vals(sess, "SELECT max(k) AS mx FROM v3") == [(5,)]
    # diamond: one view referencing two others that share an ancestor
    sess.execute("CREATE VIEW v4 AS SELECT (SELECT max(n) FROM v1) + m "
                 "AS z FROM v2")
    assert _vals(sess, "SELECT max(z) AS mz FROM v4") == [(6,)]
    # INSERT SELECT through a view chain
    sess.execute("CREATE TABLE tt (m UInt64) ENGINE = Memory")
    sess.execute("INSERT INTO tt SELECT m FROM v2")
    assert _vals(sess, "SELECT count() AS c FROM tt") == [(3,)]
