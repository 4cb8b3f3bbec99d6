"""Round-8 probe B: multi-statement DDL interactions — MV cascade,
EPHEMERAL + ALTER, dictionary reload after source INSERT, RENAME under
MV, TRUNCATE + MV, DETACH/ATTACH attribute survival."""
import sys
import tempfile
import traceback

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from clickhouse_from_scratch_spark.ddl import ChSession

fails = 0


def scenario(name):
    def deco(fn):
        global fails
        sess = ChSession(spark, warehouse=tempfile.mkdtemp())
        try:
            fn(sess)
            print(f"OK   {name}")
        except AssertionError as e:
            print(f"MISMATCH {name}: {e}")
            fails += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}")
            traceback.print_exc(limit=2)
            fails += 1
        return fn
    return deco


@scenario("MV chain depth 3 cascades per insert")
def _(s):
    s.execute("CREATE TABLE src (x Int64) ENGINE = Memory")
    s.execute("CREATE MATERIALIZED VIEW m1 ENGINE = Memory AS "
              "SELECT x * 10 AS y FROM src")
    s.execute("CREATE MATERIALIZED VIEW m2 ENGINE = Memory AS "
              "SELECT y + 1 AS z FROM m1")
    s.execute("CREATE MATERIALIZED VIEW m3 ENGINE = Memory AS "
              "SELECT z * 2 AS w FROM m2")
    s.execute("INSERT INTO src VALUES (1), (2)")
    s.execute("INSERT INTO src VALUES (3)")
    got = sorted(r.w for r in s.execute("SELECT w FROM m3").collect())
    assert got == [22, 42, 62], got


@scenario("EPHEMERAL column + ALTER ADD COLUMN DEFAULT using it fails cleanly or fills")
def _(s):
    s.execute("CREATE TABLE e1 (x Int64, eph Int64 EPHEMERAL, "
              "d Int64 DEFAULT eph + 1) ENGINE = Memory")
    s.execute("INSERT INTO e1 (x, eph) VALUES (1, 10)")
    rows = s.execute("SELECT * FROM e1").collect()
    assert [tuple(r) for r in rows] == [(1, 11)], rows
    # ALTER ADD COLUMN with plain DEFAULT then insert again
    s.execute("ALTER TABLE e1 ADD COLUMN y Int64 DEFAULT 7")
    s.execute("INSERT INTO e1 (x, eph) VALUES (2, 20)")
    got = sorted(tuple(r) for r in s.execute("SELECT x, d, y FROM e1").collect())
    assert got == [(1, 11, 7), (2, 21, 7)], got


@scenario("dictionary reflects source INSERT after SYSTEM RELOAD")
def _(s):
    s.execute("CREATE TABLE dsrc (id UInt64, name String) ENGINE = Memory")
    s.execute("INSERT INTO dsrc VALUES (1, 'a')")
    s.execute("CREATE DICTIONARY d1 (id UInt64, name String DEFAULT '?') "
              "PRIMARY KEY id SOURCE(CLICKHOUSE(TABLE 'dsrc')) "
              "LAYOUT(FLAT()) LIFETIME(0)")
    v1 = s.execute("SELECT dictGet('d1', 'name', toUInt64(1)) AS v").collect()[0].v
    s.execute("INSERT INTO dsrc VALUES (2, 'b')")
    s.execute("SYSTEM RELOAD DICTIONARY d1")
    v2 = s.execute("SELECT dictGet('d1', 'name', toUInt64(2)) AS v").collect()[0].v
    assert (v1, v2) == ("a", "b"), (v1, v2)


@scenario("TRUNCATE source does not clear MV target")
def _(s):
    s.execute("CREATE TABLE ts (x Int64) ENGINE = Memory")
    s.execute("CREATE MATERIALIZED VIEW tm ENGINE = Memory AS "
              "SELECT x FROM ts")
    s.execute("INSERT INTO ts VALUES (1)")
    s.execute("TRUNCATE TABLE ts")
    n_src = s.execute("SELECT count() AS n FROM ts").collect()[0].n
    n_mv = s.execute("SELECT count() AS n FROM tm").collect()[0].n
    assert (n_src, n_mv) == (0, 1), (n_src, n_mv)


@scenario("RENAME table keeps data and DESCRIBE attributes")
def _(s):
    s.execute("CREATE TABLE r1 (x Int64 DEFAULT 5 COMMENT 'c1') "
              "ENGINE = Memory")
    s.execute("INSERT INTO r1 (x) VALUES (1)")
    s.execute("RENAME TABLE r1 TO r2")
    rows = s.execute("SELECT x FROM r2").collect()
    assert [r.x for r in rows] == [1]
    d = s.execute("DESCRIBE r2").collect()[0]
    assert d.default_type == "DEFAULT" and d.comment == "c1", d


@scenario("DETACH/ATTACH keeps data")
def _(s):
    s.execute("CREATE TABLE da (x Int64) ENGINE = MergeTree ORDER BY x")
    s.execute("INSERT INTO da VALUES (1), (2)")
    s.execute("DETACH TABLE da")
    try:
        s.execute("SELECT count() FROM da").collect()
        raise AssertionError("detached table still queryable")
    except AssertionError:
        raise
    except Exception:
        pass
    s.execute("ATTACH TABLE da")
    n = s.execute("SELECT count() AS n FROM da").collect()[0].n
    assert n == 2, n


@scenario("EXCHANGE TABLES swaps contents")
def _(s):
    s.execute("CREATE TABLE ea (x Int64) ENGINE = Memory")
    s.execute("CREATE TABLE eb (x Int64) ENGINE = Memory")
    s.execute("INSERT INTO ea VALUES (1)")
    s.execute("INSERT INTO eb VALUES (2)")
    s.execute("EXCHANGE TABLES ea AND eb")
    a = s.execute("SELECT x FROM ea").collect()[0].x
    b = s.execute("SELECT x FROM eb").collect()[0].x
    assert (a, b) == (2, 1), (a, b)


@scenario("MV TO-target: DROP VIEW keeps target data")
def _(s):
    s.execute("CREATE TABLE tgt (y Int64) ENGINE = Memory")
    s.execute("CREATE TABLE msrc (x Int64) ENGINE = Memory")
    s.execute("CREATE MATERIALIZED VIEW mv TO tgt AS "
              "SELECT x * 2 AS y FROM msrc")
    s.execute("INSERT INTO msrc VALUES (5)")
    s.execute("DROP VIEW mv")
    got = [r.y for r in s.execute("SELECT y FROM tgt").collect()]
    assert got == [10], got
    # inserts after DROP no longer cascade
    s.execute("INSERT INTO msrc VALUES (6)")
    got2 = [r.y for r in s.execute("SELECT y FROM tgt").collect()]
    assert got2 == [10], got2


@scenario("ALTER MODIFY COLUMN type persists and converts data")
def _(s):
    s.execute("CREATE TABLE am (x Int64) ENGINE = Memory")
    s.execute("INSERT INTO am VALUES (1), (2)")
    s.execute("ALTER TABLE am MODIFY COLUMN x String")
    rows = sorted(r.x for r in s.execute("SELECT x FROM am").collect())
    assert rows == ["1", "2"], rows
    d = s.execute("DESCRIBE am").collect()[0]
    assert d.type == "String", d.type


print("FAILS:", fails)
