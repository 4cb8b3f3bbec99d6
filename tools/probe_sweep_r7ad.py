"""Round-7 sweep batch 33: COMPOSITIONS of this session's additions —
combinator stacking on the R-6/R-7 quantiles (If/OrNull/Array),
tuple arithmetic inside HOFs and GROUP BY, DEFAULT columns meeting
engine FINAL paths, dictGet* breadth, UInt64 boundary values, window
frame + new aggregate combos."""
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

def probe(sql, want=None, mode=None, via_sess=False):
    try:
        out = sess.execute(sql) if via_sess else execute_sql(spark, sql, {})
        if out is None:
            print(f"ok   | {sql[:66]!r}")
            return
        got = out.collect()
        if want is None:
            print(f"INFO | {sql[:66]} -> {[tuple(r) for r in got][:3]}")
            return
        val = got[0][0]
        if hasattr(val, "__iter__") and not isinstance(val, str):
            val = list(val)
        good = (abs(float(val) - float(want)) < 1e-6
                if mode == "approx" else
                (val == want or str(val) == str(want)))
        print(("ok   " if good else "DIVG ")
              + f"| {sql[:66]} -> {val}"
              + ("" if good else f" (want {want})"))
        if not good:
            E.append(sql)
    except Exception as e:
        print(f"FAIL | {sql[:66]} -> {type(e).__name__}: "
              f"{str(e).splitlines()[0][:90]}")
        E.append(sql)

# combinator stacking on new quantiles
probe("SELECT quantileExactExclusiveIf(0.6)(number, number > 0) AS x "
      "FROM numbers(11)", 6.6, "approx")
probe("SELECT quantileExactInclusiveIf(0.6)(number, number % 2 = 0) "
      "AS x FROM numbers(11)", 6.0, "approx")
probe("SELECT quantileExactExclusiveOrNull(0.5)(number) AS x "
      "FROM numbers(0)", None, "info")
probe("SELECT quantileOrNull(0.5)(number) AS x FROM numbers(5)", 2.0,
      "approx")
probe("SELECT quantileExactInclusiveArray(0.5)([1, 2, 3, 4]) AS x",
      2.5, "approx")
# tuple arithmetic composed
probe("SELECT arrayMap(t -> tupleElement(tuplePlus(t, (1, 1)), 1), "
      "[(1, 2), (3, 4)]) AS x", [2, 4])
probe("SELECT toString(tuplePlus(t1, t2)) AS s FROM (SELECT 1 AS k, "
      "(1, 2) AS t1, (10, 20) AS t2) GROUP BY k, t1, t2", "(11,22)")
probe("SELECT tupleHammingDistance(tupleConcat(tuple(1), tuple(2)), "
      "(1, 3)) AS x", 1)
# bitRotate under columns from numbers()
probe("SELECT groupArray(bitRotateLeft(number, 1)) AS x "
      "FROM numbers(3)", [0, 2, 4])
# length-bytes composing with -If and GROUP BY
probe("SELECT countIf(length(s) > lengthUTF8(s)) AS x FROM (SELECT "
      "arrayJoin(['abc', 'héllo', 'мир']) AS s)", 2)
# UInt64 boundary
probe("SELECT toUInt64(9223372036854775807) AS x", 9223372036854775807)
probe("SELECT toUInt64OrNull('18446744073709551615') AS x", None, "info")
probe("SELECT toTypeName(toUInt64(1)) AS x", "UInt64")
# dict breadth
probe("CREATE TABLE dsrc (id UInt64, name String, parent UInt64) "
      "ENGINE = Memory", via_sess=True)
probe("INSERT INTO dsrc VALUES (1, 'one', 0), (2, 'two', 1), "
      "(3, 'three', 2)", via_sess=True)
probe("CREATE DICTIONARY d1 (id UInt64, name String, parent UInt64 HIERARCHICAL) "
      "PRIMARY KEY id SOURCE(CLICKHOUSE(TABLE 'dsrc')) "
      "LAYOUT(HASHED()) LIFETIME(300)", via_sess=True)
probe("SELECT dictGet('d1', 'name', toUInt64(2)) AS x", "two",
      via_sess=True)
probe("SELECT dictGetOrDefault('d1', 'name', toUInt64(99), 'none') "
      "AS x", "none", via_sess=True)
probe("SELECT dictHas('d1', toUInt64(3)) AS x, dictHas('d1', "
      "toUInt64(9)) AS y", 1, via_sess=True)
probe("SELECT dictGetHierarchy('d1', toUInt64(3)) AS x", [3, 2, 1],
      via_sess=True)
probe("SELECT dictIsIn('d1', toUInt64(3), toUInt64(1)) AS x", 1,
      via_sess=True)
# window frame + quantile state aggregate
probe("SELECT groupArray(q) AS x FROM (SELECT "
      "quantileExactInclusive(0.5)(number) OVER (ORDER BY number "
      "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS q "
      "FROM numbers(3))", [0.0, 0.5, 1.5])
# DEFAULT column + SummingMergeTree FINAL
probe("CREATE TABLE sd (k Int32, q Int64, tag String DEFAULT 'x') "
      "ENGINE = SummingMergeTree((q)) ORDER BY k", via_sess=True)
probe("INSERT INTO sd (k, q) VALUES (1, 5), (1, 7)", via_sess=True)
probe("SELECT k, q, tag FROM sd FINAL", None, via_sess=True)

print(f"== {len(E)} problems")
