"""Round-7 sweep batch 34: star-modifier compositions (* APPLY with
parametric/suffixed aggregates, chained APPLY, COLUMNS regex + APPLY,
EXCEPT lists), ALTER column semantics (ADD COLUMN DEFAULT backfill on
existing rows, MODIFY COLUMN type conversion of stored data, RENAME
then SELECT), negative modulo family."""
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
from clickhouse_from_scratch_spark.plans.engine import execute_sql

sess = ChSession(spark)
E = []

def probe(sql, want=None, via_sess=True):
    try:
        out = sess.execute(sql) if via_sess else execute_sql(spark, sql, {})
        if out is None:
            print(f"ok   | {sql[:66]!r}")
            return
        got = [tuple(r) for r in out.collect()]
        if want is None:
            print(f"INFO | {sql[:66]} -> {got[:4]}")
            return
        good = got == want
        print(("ok   " if good else "DIVG ")
              + f"| {sql[:66]} -> {got[:4]}"
              + ("" if good else f" (want {want})"))
        if not good:
            E.append(sql)
    except Exception as e:
        print(f"FAIL | {sql[:66]} -> {type(e).__name__}: "
              f"{str(e).splitlines()[0][:90]}")
        E.append(sql)

probe("CREATE TABLE st (a Int64, b Int64, note String) ENGINE = "
      "MergeTree ORDER BY a")
probe("INSERT INTO st VALUES (1, 10, 'x'), (2, 20, 'y'), (3, 30, 'z')")
# star modifiers composed
probe("SELECT * APPLY(sum) FROM (SELECT a, b FROM st)", [(6, 60)])
probe("SELECT * APPLY(sum) APPLY(toString) FROM (SELECT a, b FROM st)",
      [("6", "60")])
probe("SELECT COLUMNS('^[ab]$') APPLY(max) FROM st", [(3, 30)])
probe("SELECT * EXCEPT (note) APPLY(min) FROM st", [(1, 10)])
probe("SELECT * APPLY(quantileExactInclusive(0.5)) FROM "
      "(SELECT a, b FROM st)", [(2.0, 20.0)])
probe("SELECT * APPLY(x -> round(x / 10, 2)) FROM "
      "(SELECT a, b FROM st) ORDER BY 1 LIMIT 1", [(0.1, 1.0)])
# ALTER semantics
probe("ALTER TABLE st ADD COLUMN c Int64 DEFAULT a * 100")
probe("SELECT a, c FROM st ORDER BY a",
      [(1, 100), (2, 200), (3, 300)])      # backfill from CURRENT expr
probe("INSERT INTO st (a, b, note) VALUES (4, 40, 'w')")
probe("SELECT c FROM st WHERE a = 4", [(400,)])
probe("ALTER TABLE st MODIFY COLUMN b String")
probe("SELECT b FROM st WHERE a = 2", [("20",)])
probe("ALTER TABLE st RENAME COLUMN note TO label")
probe("SELECT label FROM st WHERE a = 1", [("x",)])
probe("ALTER TABLE st COMMENT COLUMN a 'the key'")
probe("DESCRIBE st", None)
# negative modulo / intDiv truncation family
probe("SELECT -13 % 5 AS a, 13 % -5 AS b, intDiv(-13, 5) AS c, "
      "intDiv(13, -5) AS d", [(-3, 3, -2, -2)], via_sess=False)
probe("SELECT moduloOrZero(5, 0) AS a, intDivOrZero(5, 0) AS b",
      [(0, 0)], via_sess=False)
print(f"== {len(E)} problems")
