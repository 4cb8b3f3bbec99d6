"""Round-8 probe C: window-frame × combinator matrix + temporal RANGE.

Found and fixed this round: composite aggregates (uniq flag, -OrNull
gate, parametric groupArray, quantileExact) failed as window functions
(MISSING_GROUP_BY — .over must wrap each aggregate LEAF); RANGE frames
with numeric bounds over temporal ORDER BY (CH counts seconds/days)."""
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from clickhouse_from_scratch_spark.plans.engine import execute_sql

PROBES = [
    ("SELECT number, sumIf(number, number % 2 = 0) OVER (ORDER BY number ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS r FROM numbers(4) ORDER BY number",
     [(0, 0), (1, 0), (2, 2), (3, 2)]),
    ("SELECT number, sum(number) OVER (ORDER BY number ROWS BETWEEN 2 FOLLOWING AND 3 FOLLOWING) AS r FROM numbers(4) ORDER BY number",
     [(0, 5), (1, 3), (2, 0), (3, 0)]),
    ("SELECT number, sumOrNull(number) OVER (ORDER BY number ROWS BETWEEN 2 FOLLOWING AND 3 FOLLOWING) AS r FROM numbers(3) ORDER BY number",
     [(0, 2), (1, None), (2, None)]),
    ("SELECT number, uniqExact(number % 2) OVER (ORDER BY number ROWS UNBOUNDED PRECEDING) AS r FROM numbers(4) ORDER BY number",
     [(0, 1), (1, 2), (2, 2), (3, 2)]),
    ("SELECT number, uniqExactIf(number % 2, number > 0) OVER (ORDER BY number ROWS UNBOUNDED PRECEDING) AS r FROM numbers(4) ORDER BY number",
     [(0, 0), (1, 1), (2, 2), (3, 2)]),
    ("SELECT number, groupArray(2)(number) OVER (ORDER BY number ROWS UNBOUNDED PRECEDING) AS r FROM numbers(4) ORDER BY number",
     [(0, [0]), (1, [0, 1]), (2, [0, 1]), (3, [0, 1])]),
    ("SELECT number, quantileExact(0.5)(number) OVER (ORDER BY number ROWS UNBOUNDED PRECEDING) AS r FROM numbers(4) ORDER BY number",
     [(0, 0), (1, 1), (2, 1), (3, 2)]),
    ("SELECT number, avgOrNullIf(number, number < 0) OVER (ORDER BY number) AS r FROM numbers(2) ORDER BY number",
     [(0, None), (1, None)]),
    ("SELECT v, sum(v) OVER (ORDER BY t RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW) AS r FROM (SELECT toDateTime('2024-01-01 00:00:00') + INTERVAL number DAY AS t, number AS v FROM numbers(4)) ORDER BY v",
     [(0, 0), (1, 1), (2, 3), (3, 5)]),
    ("SELECT v, sum(v) OVER (ORDER BY d RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS r FROM (SELECT toDate('2024-01-01') + number AS d, number AS v FROM numbers(4)) ORDER BY v",
     [(0, 0), (1, 1), (2, 3), (3, 5)]),
    # the scoped constructor patch must not leak
    ("SELECT sum(number) AS s FROM numbers(3)", [(3,)]),
]

fails = 0
for sql, exp in PROBES:
    try:
        rows = [tuple(r) for r in execute_sql(spark, sql, {}).collect()]
        ok = exp is None or rows == exp
        if not ok:
            fails += 1
        print("OK  " if ok else f"MISMATCH want {exp}", "|", sql[:100],
              "->", rows[:5])
    except Exception as e:
        fails += 1
        print("FAIL", "|", sql[:100], "->", type(e).__name__,
              str(e).split("\n")[0][:120])
print("FAILS:", fails)
