"""Round-7 sweep batch 11: window RANGE value offsets, Kleene logic on
NULLs, nonNegativeDerivative/runningAccumulate, aggregate result types,
string/array stragglers. (sql, expected|None)"""
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
    # --- window RANGE with value offsets ---
    ("SELECT number, sum(number) OVER (ORDER BY number RANGE BETWEEN "
     "1 PRECEDING AND CURRENT ROW) AS s FROM numbers(4) "
     "ORDER BY number", [(0, 0), (1, 1), (2, 3), (3, 5)]),
    ("SELECT number, sum(number) OVER (ORDER BY number RANGE BETWEEN "
     "CURRENT ROW AND 2 FOLLOWING) AS s FROM numbers(4) "
     "ORDER BY number", [(0, 3), (1, 6), (2, 5), (3, 3)]),
    # --- Kleene three-valued logic ---
    ("SELECT NULL AND 0 AS a, NULL AND 1 AS b, NULL OR 1 AS c, "
     "NULL OR 0 AS d", [(False, None, True, None)]),
    ("SELECT NOT NULL AS r", [(None,)]),
    # --- running accumulators ---
    ("SELECT nonNegativeDerivative(v, t) AS d FROM (SELECT "
     "arrayJoin([(1, 10.0), (2, 20.0), (3, 15.0)]) AS p, "
     "p.1 AS t, p.2 AS v)", None),
    ("SELECT runningAccumulate(s) AS r FROM (SELECT "
     "sumState(number) AS s FROM numbers(3))", None),
    # --- aggregate result types ---
    ("SELECT toTypeName(avg(number)) AS a, toTypeName(sum(number)) "
     "AS s, toTypeName(count()) AS c FROM numbers(3)", None),
    ("SELECT avg(number) AS r FROM numbers(4)", [(1.5,)]),
    ("SELECT toTypeName(max(number)) AS r FROM numbers(3)", None),
    # --- string stragglers ---
    ("SELECT wordShingleMinHash('a b c d e')", None),
    ("SELECT normalizeUTF8NFC('é') = normalizeUTF8NFC('é') AS r",
     None),
    ("SELECT stringToH3('8f283473fffffff') AS r", None),
    ("SELECT concat('a', 1, 2.5) AS r", [('a12.5',)]),
    ("SELECT toString(42) || 'x' AS r", [('42x',)]),
    ("SELECT caseWithExpression(2, 1, 'a', 2, 'b', 'z') AS r", None),
    # --- array stragglers ---
    ("SELECT arrayDifference([1, 4, 2]) AS r", [([0, 3, -2],)]),
    ("SELECT arrayCumSum([1, 2, 3]) AS r", [([1, 3, 6],)]),
    ("SELECT arraySort((x, y) -> y, ['a','b','c'], [3, 1, 2]) AS r",
     [((['b', 'c', 'a']),)]),
    ("SELECT arrayReverseSort([2, 1, 3]) AS r", [([3, 2, 1],)]),
    ("SELECT arrayConcat([1], [2], [3]) AS r", [([1, 2, 3],)]),
    ("SELECT has(['a', 'b'], 'a') AS r", [(True,)]),
    ("SELECT arrayPopBack([1, 2, 3]) AS a, arrayPushFront([2], 1) AS b",
     [(([1, 2]), [1, 2])]),
    # --- if() with NULL condition drops to else ---
    ("SELECT if(NULL, 'a', 'b') AS r", [('b',)]),
    ("SELECT multiIf(NULL, 'a', 1, 'b', 'c') AS r", [('b',)]),
]

npass = nfail = nprint = 0
for sql, expected in PROBES:
    try:
        rows = [tuple(r) for r in
                execute_sql(spark, sql, {}).limit(6).collect()]
        if expected is None:
            print(f"PRNT | {sql[:95]!r} -> {rows}")
            nprint += 1
        elif rows == expected:
            npass += 1
        else:
            print(f"DIFF | {sql[:95]!r} -> {rows} (expected {expected})")
            nfail += 1
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"FAIL | {sql[:95]!r} -> {type(e).__name__}: {msg}")
        nfail += 1
print(f"\n{npass} pass, {nfail} diff/fail, {nprint} printed")
