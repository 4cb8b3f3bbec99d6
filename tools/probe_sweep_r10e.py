"""Round-10 probe sweep E: FORMAT renderings, INTO OUTFILE round-trips,
system tables, query params, EXPLAIN/SHOW, CREATE FUNCTION macros,
VIEW/MV interactions."""
import os
import tempfile

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
from clickhouse_from_scratch_spark.session import get_spark  # noqa: E402
from clickhouse_from_scratch_spark.ddl import ChSession  # noqa: E402

spark = get_spark()
eng = ChSession(spark)


def run(tag, sql, params=None):
    try:
        df = eng.execute(sql, params) if params else eng.execute(sql)
        out = [tuple(r) for r in df.collect()] if df is not None else "ok"
        print(f"{tag}: {out}")
    except Exception as e:
        print(f"{tag}: ERR {type(e).__name__}: {str(e)[:110]}")


# query params
run("p1", "SELECT {n:UInt32} + 1 AS v", {"n": 41})
run("p2", "SELECT {s:String} AS v, {a:Array(UInt8)} AS arr",
    {"s": "x", "a": [1, 2]})
run("p3", "SELECT number FROM numbers({lim:UInt8}) ORDER BY number",
    {"lim": 3})
# CREATE FUNCTION macro
run("f1", "CREATE FUNCTION add2 AS (a, b) -> a + b + 0")
run("f2", "SELECT add2(3, 4) AS v")
run("f3", "CREATE FUNCTION IF NOT EXISTS add2 AS (x) -> x")
run("f4", "SELECT add2(3, 4) AS v")    # still the 2-arg version
run("f5", "DROP FUNCTION add2")
run("f6", "SELECT add2(1, 2) AS v")    # must fail now
# system tables
run("s1", "SELECT count() > 0 AS has FROM system.functions")
run("s2", "SELECT count() > 0 AS has FROM system.tables")
run("s3", "SELECT name FROM system.databases ORDER BY name")
run("s4", "SELECT count() > 100 AS many FROM system.settings")
run("s5", "SELECT count() AS c FROM system.one")
run("s6", "SELECT count() > 0 AS has FROM system.numbers LIMIT 1")
# EXPLAIN forms
run("x1", "EXPLAIN SELECT 1")
run("x2", "EXPLAIN AST SELECT 1 + 2")
run("x3", "EXPLAIN SYNTAX SELECT number FROM numbers(3) WHERE number > 1")
run("x4", "EXPLAIN PIPELINE SELECT count() FROM numbers(10)")
run("x5", "EXPLAIN ESTIMATE SELECT count() FROM numbers(10)")
# SHOW family
run("h1", "SHOW DATABASES")
run("h2", "SHOW FUNCTIONS LIKE 'arrayMa%'")
run("h3", "SHOW CREATE DATABASE default")
run("h4", "SHOW PROCESSLIST")
# VIEW + MV
run("v1", "CREATE TABLE base (k UInt32, v UInt32) ENGINE = Memory")
run("v2", "INSERT INTO base VALUES (1, 10), (2, 20)")
run("v3", "CREATE VIEW vv AS SELECT k, v * 2 AS v2 FROM base")
run("v4", "SELECT * FROM vv ORDER BY k")
run("v5", "INSERT INTO base VALUES (3, 30)")
run("v6", "SELECT count() AS c FROM vv")    # views see new rows
run("v7", "CREATE MATERIALIZED VIEW mv ENGINE = Memory AS "
    "SELECT k, v + 1 AS v1 FROM base")
run("v8", "INSERT INTO base VALUES (4, 40)")
run("v9", "SELECT k, v1 FROM mv ORDER BY k")   # only post-create inserts
# TRUNCATE / OPTIMIZE / CHECK
run("t1", "TRUNCATE TABLE base")
run("t2", "SELECT count() AS c FROM base")
run("t3", "CHECK TABLE base")
run("t4", "OPTIMIZE TABLE base FINAL")
# INTO OUTFILE round trip
out = os.path.join(tempfile.mkdtemp(), "o.csv")
run("o1", f"SELECT number AS n, number * 2 AS d FROM numbers(3) "
    f"ORDER BY n INTO OUTFILE '{out}' FORMAT CSV")
print("o2:", open(out).read().strip().replace("\n", " | ")
      if os.path.exists(out) else "MISSING")
# FORMAT render (driver-side)
run("r1", "SELECT 1.5 AS a, 'x' AS b FORMAT JSONEachRow")
run("r2", "SELECT NULL AS n, [1, 2] AS a FORMAT TSV")
run("r3", "SELECT 'quote\"me' AS q, 1 AS i FORMAT CSV")
