"""Round-10: ALTER mutation IN PARTITION scoping (probe d-batch as tests).

CH scopes CLEAR COLUMN / UPDATE / DELETE mutations to the named
partition's parts when `IN PARTITION p` is given; other partitions keep
their data (public ALTER grammar — the reference comments its ALTER
dispatch out, ParserQuery.cpp:38-47, so semantics follow published CH).
"""
from __future__ import annotations

import pytest

from clickhouse_from_scratch_spark.ddl import ChSession


@pytest.fixture()
def sess(spark, tmp_path):
    return ChSession(spark, warehouse=str(tmp_path / "wh"))


def _rows(sess, sql):
    return sorted(tuple(r) for r in sess.execute(sql).collect())


@pytest.fixture()
def pt(sess):
    sess.execute("CREATE TABLE pt (p UInt8, k UInt32, v UInt32) "
                 "ENGINE = MergeTree PARTITION BY p ORDER BY k")
    sess.execute("INSERT INTO pt VALUES (1, 1, 10), (2, 2, 20)")
    return sess


def test_clear_column_in_partition_scoped(pt):
    pt.execute("ALTER TABLE pt CLEAR COLUMN v IN PARTITION 1")
    # partition 2 untouched — the round-8/9 bug reset every partition
    assert _rows(pt, "SELECT p, v FROM pt ORDER BY p") == [(1, 0), (2, 20)]


def test_clear_column_without_partition_clears_all(pt):
    pt.execute("ALTER TABLE pt CLEAR COLUMN v")
    assert _rows(pt, "SELECT p, v FROM pt ORDER BY p") == [(1, 0), (2, 0)]


def test_update_in_partition_scoped(pt):
    pt.execute("ALTER TABLE pt UPDATE v = 99 IN PARTITION 2 WHERE 1")
    assert _rows(pt, "SELECT p, v FROM pt ORDER BY p") == [(1, 10), (2, 99)]


def test_delete_in_partition_scoped(pt):
    # predicate matches both partitions; only partition 2 is touched
    pt.execute("ALTER TABLE pt DELETE IN PARTITION 2 WHERE v > 0")
    assert _rows(pt, "SELECT p, v FROM pt ORDER BY p") == [(1, 10)]


def test_partition_id_string_coerces(pt):
    # CH accepts both PARTITION 1 and PARTITION '1'
    pt.execute("ALTER TABLE pt CLEAR COLUMN v IN PARTITION '1'")
    assert _rows(pt, "SELECT p, v FROM pt ORDER BY p") == [(1, 0), (2, 20)]


def test_partition_expression_key(sess):
    # PARTITION BY toYYYYMM(d): the statement names the expression VALUE
    sess.execute("CREATE TABLE pe (d Date, v UInt32) ENGINE = MergeTree"
                 " PARTITION BY toYYYYMM(d) ORDER BY d")
    sess.execute("INSERT INTO pe VALUES ('2024-01-05', 1), "
                 "('2024-02-05', 2)")
    sess.execute("ALTER TABLE pe UPDATE v = 0 IN PARTITION 202401 WHERE 1")
    assert _rows(sess, "SELECT v FROM pe ORDER BY d") == [(0,), (2,)]


def test_in_partition_on_unpartitioned_raises(sess):
    sess.execute("CREATE TABLE up (k UInt32, v UInt32) "
                 "ENGINE = MergeTree ORDER BY k")
    sess.execute("INSERT INTO up VALUES (1, 5)")
    with pytest.raises(Exception, match="not partitioned"):
        sess.execute("ALTER TABLE up CLEAR COLUMN v IN PARTITION 1")


def test_in_operator_untouched_by_partition_keyword(sess):
    # the IN-operator back-off only triggers before the PARTITION keyword
    got = sess.execute("SELECT number FROM numbers(5) "
                       "WHERE number IN (1, 3) ORDER BY number").collect()
    assert [r[0] for r in got] == [1, 3]
    got = sess.execute("SELECT number FROM numbers(5) WHERE number "
                       "NOT IN (1, 3) ORDER BY number").collect()
    assert [r[0] for r in got] == [0, 2, 4]


def test_update_matrix_materialized_column(sess):
    # ALTER UPDATE × IN PARTITION × MATERIALIZED columns: the
    # materialized column recomputes from PRE-mutation values only for
    # rows the mutation rewrites? No — CH rewrites whole parts; our
    # rewrite recomputes nothing (materialized values are stored at
    # INSERT), so m keeps its insert-time value
    sess.execute("CREATE TABLE pm (p UInt8, k UInt32, v UInt32, "
                 "m UInt32 MATERIALIZED v * 2) ENGINE = MergeTree "
                 "PARTITION BY p ORDER BY k")
    sess.execute("INSERT INTO pm (p, k, v) VALUES (1, 1, 10), (2, 2, 20)")
    sess.execute("ALTER TABLE pm UPDATE v = 5 IN PARTITION 1 WHERE 1")
    assert _rows(sess, "SELECT p, v, m FROM pm ORDER BY p") \
        == [(1, 5, 20), (2, 20, 40)]


def test_update_key_column_rejected(sess):
    # CH: "Cannot UPDATE key column" for ORDER BY / PARTITION BY members
    sess.execute("CREATE TABLE mk (p UInt8, k UInt32, v UInt32) "
                 "ENGINE = MergeTree PARTITION BY p ORDER BY k")
    sess.execute("INSERT INTO mk VALUES (1, 1, 10)")
    with pytest.raises(Exception, match="key column"):
        sess.execute("ALTER TABLE mk UPDATE k = 5 WHERE 1")
    with pytest.raises(Exception, match="key column"):
        sess.execute("ALTER TABLE mk UPDATE p = 5 WHERE 1")
    sess.execute("ALTER TABLE mk UPDATE v = 5 WHERE 1")
    assert _rows(sess, "SELECT v FROM mk") == [(5,)]
    # a member of a PARTITION BY expression is a key column too
    sess.execute("CREATE TABLE pe2 (d Date, v UInt32) ENGINE = "
                 "MergeTree PARTITION BY toYYYYMM(d) ORDER BY d")
    with pytest.raises(Exception, match="key column"):
        sess.execute("ALTER TABLE pe2 UPDATE d = toDate('2020-01-01') "
                     "WHERE 1")
