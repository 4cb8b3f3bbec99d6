"""Round-7 sweep batch 15: set-operation duplicate semantics (CH
INTERSECT/EXCEPT default to ALL — statements/select/intersect: "can
contain duplicate rows"; UNION bare requires union_default_mode),
window breadth (ntile/percent_rank/cume_dist/nth_value), COLLATE,
DISTINCT ON + ORDER BY interplay. (sql, expected|None|'error')"""
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
    # INTERSECT keeps duplicates (ALL is the default); trailing ORDER
    # BY binds to the LAST select in CH, so sort through an outer query
    ("SELECT n FROM (SELECT number % 2 AS n FROM numbers(4) INTERSECT "
     "SELECT number % 2 AS n FROM numbers(4)) ORDER BY n",
     [(0,), (0,), (1,), (1,)]),
    ("SELECT number % 2 AS n FROM numbers(4) INTERSECT DISTINCT "
     "SELECT number % 2 AS n FROM numbers(4) ORDER BY n",
     [(0,), (1,)]),
    # EXCEPT filter semantics: every left row whose tuple appears in
    # the right is dropped; {0,0,1,1} except {1} = {0,0}
    ("SELECT number % 2 AS n FROM numbers(4) EXCEPT SELECT 1 AS n "
     "ORDER BY n", [(0,), (0,)]),
    ("SELECT number % 2 AS n FROM numbers(4) EXCEPT DISTINCT "
     "SELECT 1 AS n ORDER BY n", [(0,)]),
    # UNION ALL / DISTINCT explicit
    ("SELECT 1 AS n UNION ALL SELECT 1 AS n", [(1,), (1,)]),
    ("SELECT 1 AS n UNION DISTINCT SELECT 1 AS n", [(1,)]),
    # window breadth
    ("SELECT number, ntile(2) OVER (ORDER BY number) AS t "
     "FROM numbers(4) ORDER BY number",
     [(0, 1), (1, 1), (2, 2), (3, 2)]),
    ("SELECT number, round(percent_rank() OVER (ORDER BY number), 2) "
     "AS p FROM numbers(5) ORDER BY number",
     [(0, 0.0), (1, 0.25), (2, 0.5), (3, 0.75), (4, 1.0)]),
    ("SELECT number, cume_dist() OVER (ORDER BY number) AS c "
     "FROM numbers(4) ORDER BY number",
     [(0, 0.25), (1, 0.5), (2, 0.75), (3, 1.0)]),
    ("SELECT number, nth_value(number, 2) OVER (ORDER BY number "
     "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS n2 "
     "FROM numbers(3) ORDER BY number",
     [(0, 1), (1, 1), (2, 1)]),
    ("SELECT number, first_value(number) OVER (ORDER BY number DESC) "
     "AS f FROM numbers(3) ORDER BY number",
     [(0, 2), (1, 2), (2, 2)]),
    # row_number without ORDER BY in the window
    ("SELECT count(*) OVER () AS c FROM numbers(3)",
     [(3,), (3,), (3,)]),
    # COLLATE (linguistic order; 'en' puts 'a' < 'B')
    ("SELECT s FROM (SELECT arrayJoin(['B', 'a']) AS s) "
     "ORDER BY s COLLATE 'en'", [('a',), ('B',)]),
    # DISTINCT ON
    ("SELECT DISTINCT ON (g) g, v FROM (SELECT number % 2 AS g, "
     "number AS v FROM numbers(4) ORDER BY g, v DESC) ORDER BY g",
     [(0, 2), (1, 3)]),
    # INTERSECT with multiple columns
    ("SELECT 1 AS a, 2 AS b INTERSECT SELECT 1 AS a, 2 AS b",
     [(1, 2)]),
    # filter semantics drop ALL copies of matched rows
    ("SELECT number % 2 AS n FROM numbers(4) EXCEPT SELECT 0 AS n "
     "ORDER BY n", [(1,), (1,)]),
    # INTERSECT preserves FULL left multiplicity (not multiset-min):
    # {0,0} intersect {0} = {0,0}
    ("SELECT 0 AS n UNION ALL SELECT 0 AS n INTERSECT SELECT 0 AS n",
     [(0,), (0,)]),
]

npass = nfail = nprint = 0
for sql, expected in PROBES:
    try:
        rows = [tuple(r) for r in
                execute_sql(spark, sql, {}).limit(8).collect()]
        if expected is None:
            print(f"PRNT | {sql[:95]!r} -> {rows}")
            nprint += 1
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
