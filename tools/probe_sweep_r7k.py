"""Round-7 sweep batch 13: aggregate results over an EMPTY SET.

CH contract (public docs, aggregate-functions/index: "When aggregating
over an empty set, aggregate functions return their default values"):
count/sum/min/max over non-Nullable numerics -> 0, avg/quantile/stddev
-> nan, any/min over String -> '', groupArray/topK/sumMap -> empty,
-OrNull -> NULL, -If with never-true predicate behaves as empty set.
(sql, expected|None)"""
import sys
import math
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from clickhouse_from_scratch_spark.plans.engine import execute_sql

NAN = object()   # sentinel: expect a float nan

PROBES = [
    ("SELECT count() AS c, sum(number) AS s, min(number) AS mn, "
     "max(number) AS mx FROM numbers(10) WHERE 0", [(0, 0, 0, 0)]),
    ("SELECT avg(number) AS a FROM numbers(10) WHERE 0", NAN),
    ("SELECT quantile(0.5)(number) AS q FROM numbers(10) WHERE 0", NAN),
    ("SELECT stddevPop(number) AS s FROM numbers(10) WHERE 0", NAN),
    ("SELECT corr(number, number) AS c FROM numbers(10) WHERE 0", NAN),
    ("SELECT any(s) AS a, min(s) AS m FROM (SELECT 'a' AS s WHERE 0)",
     [('', '')]),
    ("SELECT uniq(number) AS u, uniqExact(number) AS ue "
     "FROM numbers(10) WHERE 0", [(0, 0)]),
    ("SELECT groupArray(number) AS g FROM numbers(10) WHERE 0",
     [([],)]),
    ("SELECT topK(3)(number) AS t FROM numbers(10) WHERE 0", [([],)]),
    ("SELECT sumOrNull(number) AS s, minOrNull(number) AS m "
     "FROM numbers(10) WHERE 0", [(None, None)]),
    ("SELECT argMax(number, number) AS a FROM numbers(10) WHERE 0",
     [(0,)]),
    ("SELECT sumIf(number, number > 100) AS s, maxIf(number, number > "
     "100) AS m, countIf(number > 100) AS c FROM numbers(10)",
     [(0, 0, 0)]),
    ("SELECT avgIf(number, number > 100) AS a FROM numbers(10)", NAN),
    ("SELECT sumMap([number], [number]).1 AS k FROM numbers(3) WHERE 0",
     [([],)]),
    # GROUP BY over empty input -> zero rows (no defaults row)
    ("SELECT number % 2 AS g, sum(number) AS s FROM numbers(10) "
     "WHERE 0 GROUP BY g", []),
    # empty set via an always-false HAVING-side filter subquery
    ("SELECT max(number) AS m FROM numbers(10) WHERE number > 100",
     [(0,)]),
    ("SELECT groupBitAnd(number) AS a, groupBitOr(number) AS o "
     "FROM numbers(10) WHERE 0", [(0, 0)]),
    ("SELECT anyLast(number) AS a FROM numbers(10) WHERE 0", [(0,)]),
    ("SELECT varPop(number) AS v FROM numbers(10) WHERE 0", NAN),
    ("SELECT sum(number) AS s FROM numbers(10) WHERE 0 GROUP BY ()",
     [(0,)]),
]

npass = nfail = nprint = 0
for sql, expected in PROBES:
    try:
        rows = [tuple(r) for r in
                execute_sql(spark, sql, {}).limit(6).collect()]
        if expected is None:
            print(f"PRNT | {sql[:95]!r} -> {rows}")
            nprint += 1
        elif expected is NAN:
            ok = (len(rows) == 1 and len(rows[0]) == 1
                  and isinstance(rows[0][0], float)
                  and math.isnan(rows[0][0]))
            if ok:
                npass += 1
            else:
                print(f"DIFF | {sql[:95]!r} -> {rows} (expected nan)")
                nfail += 1
        elif rows == expected:
            npass += 1
        else:
            print(f"DIFF | {sql[:95]!r} -> {rows} (expected {expected})")
            nfail += 1
    except Exception as e:
        msg = str(e).split("\n")[0][:130]
        print(f"FAIL | {sql[:95]!r} -> {type(e).__name__}: {msg}")
        nfail += 1
print(f"\n{npass} pass, {nfail} diff/fail, {nprint} printed")
