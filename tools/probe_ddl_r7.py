"""Round-7 DDL semantics probe: Enum columns, DEFAULT/MATERIALIZED on
partial INSERT, CREATE TABLE AS SELECT, ALTER UPDATE/DELETE mutations,
DESCRIBE shape, CREATE OR REPLACE."""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from clickhouse_from_scratch_spark.ddl import ChSession

sess = ChSession(spark)
STEPS = [
    ("CREATE TABLE et (id Int32, st Enum8('new' = 1, 'done' = 2)) "
     "ENGINE = Memory", None),
    ("INSERT INTO et VALUES (1, 'new'), (2, 'done')", None),
    ("SELECT id, st FROM et WHERE st = 'done' ORDER BY id", "show"),
    ("SELECT toString(st) AS s FROM et ORDER BY id", "show"),
    # DEFAULT on partial insert
    ("CREATE TABLE dt (a Int32, b String DEFAULT 'none', "
     "c Int32 DEFAULT a * 2) ENGINE = Memory", None),
    ("INSERT INTO dt (a) VALUES (5)", None),
    ("SELECT a, b, c FROM dt", "show"),
    # MATERIALIZED column is computed, not insertable, hidden from *
    ("CREATE TABLE mt (a Int32, m Int32 MATERIALIZED a + 1) "
     "ENGINE = Memory", None),
    ("INSERT INTO mt VALUES (10)", None),
    ("SELECT * FROM mt", "show"),
    ("SELECT a, m FROM mt", "show"),
    # CREATE TABLE AS SELECT
    ("CREATE TABLE cts ENGINE = Memory AS SELECT number AS n "
     "FROM numbers(3)", None),
    ("SELECT count() AS c FROM cts", "show"),
    # mutations
    ("ALTER TABLE dt UPDATE b = 'yes' WHERE a = 5", None),
    ("SELECT b FROM dt", "show"),
    ("ALTER TABLE dt DELETE WHERE a = 5", None),
    ("SELECT count() AS c FROM dt", "show"),
    # CREATE OR REPLACE
    ("CREATE OR REPLACE TABLE cts (x String) ENGINE = Memory", None),
    ("DESCRIBE TABLE cts", "show"),
]

for sql, mode in STEPS:
    try:
        out = sess.execute(sql)
        if mode == "show" and out is not None:
            print(f"OK   | {sql[:70]!r} -> "
                  f"{[tuple(r) for r in out.limit(5).collect()]}")
        else:
            print(f"ok   | {sql[:70]!r}")
    except Exception as e:
        print(f"FAIL | {sql[:70]!r} -> {type(e).__name__}: "
              f"{str(e).splitlines()[0][:110]}")
