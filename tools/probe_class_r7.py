"""Round-7 bug-CLASS probes: the two judge-found defects were instances
of broader classes — (a) duplicate/unaliased expressions anywhere a
projection is built (ORDER BY, GROUP BY, DISTINCT, set-ops, subquery
output, window args), (b) truthy-int where a boolean is expected
(if/multiIf conditions, JOIN ON, AND/OR operands, HAVING under
aggregation, CASE WHEN). Expected values from public CH docs semantics."""
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
    # --- class (a): duplicate expressions in other clauses ---
    ("SELECT 1, 1", [(1, 1)]),
    ("SELECT x + 1, x + 1 FROM (SELECT 1 AS x)", [(2, 2)]),
    ("SELECT round(2.5) AS a, round(2.5) FROM numbers(1)", [(2.0, 2.0)]),
    ("SELECT number, -number FROM numbers(2) ORDER BY -number", None),
    ("SELECT DISTINCT 1, 1", [(1, 1)]),
    ("SELECT 1, 1 UNION ALL SELECT 2, 2 ORDER BY 1", [(1, 1), (2, 2)]),
    ("SELECT t.a, t.a FROM (SELECT 1 AS a) t", [(1, 1)]),
    ("SELECT sum(number), sum(number) FROM numbers(3)", [(3, 3)]),
    ("SELECT count(), count() FROM numbers(3)", [(3, 3)]),
    ("SELECT number % 2, count() FROM numbers(4) GROUP BY number % 2 "
     "ORDER BY number % 2", [(0, 2), (1, 2)]),
    ("SELECT arrayJoin([1,2]), arrayJoin([1,2])", None),  # CH: each call explodes once -> 2 rows here (same expr = same column)
    # --- class (b): truthy ints in boolean positions ---
    ("SELECT if(1, 'a', 'b')", [('a',)]),
    ("SELECT if(2, 'a', 'b')", [('a',)]),
    ("SELECT if(number % 2, 'odd', 'even') FROM numbers(2) ORDER BY 1",
     [('even',), ('odd',)]),
    ("SELECT multiIf(0, 'x', 2, 'y', 'z')", [('y',)]),
    ("SELECT number FROM numbers(4) WHERE number % 2 ORDER BY number",
     [(1,), (3,)]),
    ("SELECT number FROM numbers(3) WHERE 1 ORDER BY number",
     [(0,), (1,), (2,)]),
    ("SELECT count() FROM numbers(3) WHERE 0", [(0,)]),
    ("SELECT number % 3 AS k, count() AS c FROM numbers(9) GROUP BY k "
     "HAVING count() % 2 ORDER BY k", [(0, 3), (1, 3), (2, 3)]),
    ("SELECT 1 AND 2", [(True,)]),
    ("SELECT 1 AND 0", [(False,)]),
    ("SELECT 0 OR 3", [(True,)]),
    ("SELECT NOT 2", [(False,)]),
    ("SELECT xor(1, 0)", [(True,)]),
    ("SELECT a FROM (SELECT 1 AS a) x JOIN (SELECT 1 AS b) y ON 1",
     [(1,)]),
    ("SELECT CASE WHEN 2 THEN 'yes' ELSE 'no' END", [('yes',)]),
    ("SELECT sumIf(number, number % 2) FROM numbers(4)", [(4,)]),
    ("SELECT countIf(number % 2) FROM numbers(4)", [(2,)]),
    ("SELECT number FROM numbers(3) PREWHERE number % 2", [(1,)]),
    ("SELECT arrayFilter(x -> x % 2, [1,2,3,4])", [([1, 3],)]),
    ("SELECT arrayExists(x -> x - 1, [1,1,1])", [(False,)]),
    ("SELECT has([1,2], 2) + has([1], 5)", [(1,)]),  # bools usable as ints
    ("SELECT if(count() - 3, 'ne3', 'eq3') FROM numbers(3)", [('eq3',)]),
    ("SELECT number, any(number) OVER (PARTITION BY number % 2) "
     "FROM numbers(2) ORDER BY number", None),
    ("SELECT toUInt8(1) = true", [(True,)]),
]

npass = nfail = nprint = 0
for sql, expected in PROBES:
    try:
        rows = [tuple(r) for r in execute_sql(spark, sql, {}).limit(6).collect()]
        if expected is None:
            print(f"PRNT | {sql!r} -> {rows}")
            nprint += 1
        elif rows == expected:
            npass += 1
        else:
            print(f"DIFF | {sql!r} -> {rows} (expected {expected})")
            nfail += 1
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"FAIL | {sql!r} -> {type(e).__name__}: {msg}")
        nfail += 1
print(f"\n{npass} pass, {nfail} diff/fail, {nprint} printed")
