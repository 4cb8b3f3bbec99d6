"""INSERT WATCH / SYSTEM / KILL / BACKUP-RESTORE / quantified ANY-ALL."""

from __future__ import annotations

import pytest

from clickhouse_from_scratch_spark.catalog import load_all
from clickhouse_from_scratch_spark.ddl import ChSession
from clickhouse_from_scratch_spark.plans import execute_sql


@pytest.fixture()
def sess(spark, tmp_path):
    s = ChSession(spark, warehouse=str(tmp_path / "wh"))
    s.execute("CREATE TABLE t (x Int64) ENGINE = Memory")
    s.execute("INSERT INTO t VALUES (1), (2), (3)")
    return s


def test_insert_watch_pipes_live_view(sess):
    sess.execute("CREATE LIVE VIEW lv AS SELECT x * 10 AS x FROM t")
    sess.execute("CREATE TABLE sink (x Int64) ENGINE = Memory")
    sess.execute("INSERT INTO sink WATCH lv")
    got = sorted(r.x for r in sess.execute("SELECT x FROM sink").collect())
    assert got == [10, 20, 30]


def test_backup_restore_roundtrip(sess, tmp_path):
    dest = str(tmp_path / "bk")
    sess.execute(f"BACKUP TABLE t TO Disk('{dest}')")
    sess.execute("DROP TABLE t")
    sess.execute(f"RESTORE TABLE t FROM Disk('{dest}')")
    got = sorted(r.x for r in sess.execute("SELECT x FROM t").collect())
    assert got == [1, 2, 3]


def test_system_verbs(sess):
    assert sess.execute("SYSTEM DROP MARK CACHE").collect()[0].ok == 0
    row = sess.execute("SYSTEM STOP MERGES").collect()[0]
    assert row.status == "ok"
    # RELOAD DICTIONARIES is a real verb now (drops dictGet caches)
    assert sess.execute("SYSTEM RELOAD DICTIONARIES").collect()[0].ok == 0
    row2 = sess.execute("SYSTEM SHUTDOWN DISTRIBUTED SENDS").collect()[0]
    assert "noop" in row2.status      # honest no-op reporting


def test_kill_query(sess):
    assert sess.execute(
        "KILL QUERY WHERE query_id = 'whatever' SYNC").collect()[0].ok == 0


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    return load_all(spark, sf_dir)


def test_quantified_any_in_rewrite(spark, tables, duck):
    got = execute_sql(
        spark, "SELECT count() AS n FROM orders WHERE o_custkey = ANY "
        "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')",
        tables).collect()[0].n
    want = duck.execute(
        "SELECT count(*) FROM orders WHERE o_custkey IN "
        "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')"
    ).fetchone()[0]
    assert got == want


def test_quantified_gt_all_min_max(spark, tables, duck):
    got = execute_sql(
        spark, "SELECT count() AS n FROM supplier "
        "WHERE s_acctbal > ALL (SELECT c_acctbal FROM customer "
        "WHERE c_custkey < 20)", tables).collect()[0].n
    want = duck.execute(
        "SELECT count(*) FROM supplier WHERE s_acctbal > "
        "(SELECT max(c_acctbal) FROM customer WHERE c_custkey < 20)"
    ).fetchone()[0]
    assert got == want


def test_quantified_ne_all_not_in(spark, tables, duck):
    got = execute_sql(
        spark, "SELECT count() AS n FROM customer WHERE c_nationkey != ALL "
        "(SELECT s_nationkey FROM supplier)", tables).collect()[0].n
    want = duck.execute(
        "SELECT count(*) FROM customer WHERE c_nationkey NOT IN "
        "(SELECT s_nationkey FROM supplier)").fetchone()[0]
    assert got == want


def test_backup_restore_database(sess, tmp_path):
    sess.execute("CREATE DATABASE bk")
    sess.execute("CREATE TABLE bk.t1 (x Int32) ENGINE = MergeTree ORDER BY x")
    sess.execute("CREATE TABLE bk.t2 (s String) ENGINE = MergeTree ORDER BY s")
    sess.execute("INSERT INTO bk.t1 VALUES (1), (2)")
    sess.execute("INSERT INTO bk.t2 VALUES ('a')")
    dest = str(tmp_path / "snap")
    sess.execute(f"BACKUP DATABASE bk TO Disk('{dest}')")
    sess.execute("DROP DATABASE bk")
    sess.execute(f"RESTORE DATABASE bk FROM Disk('{dest}')")
    assert sess.execute("SELECT count() AS c FROM bk.t1").collect()[0].c == 2
    assert sess.execute("SELECT s FROM bk.t2").collect()[0].s == "a"


def test_show_processlist(sess):
    # synchronous engine: the running-queries view is honestly empty
    df = sess.execute("SHOW PROCESSLIST")
    assert df.columns == ["query_id", "query", "elapsed"]
    assert df.count() == 0
