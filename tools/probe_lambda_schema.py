"""Bug-class probe: functions whose build path does a df.select(col)
schema probe, called with a LAMBDA-PARAM argument (the probe column
only resolves inside the HOF). Unguarded sites crash or spam the JVM
analyzer log."""
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
    # tupleElement positional on a lambda param
    ("SELECT arrayMap(t -> t.1, [(1,'a'),(2,'b')]) AS r", [([1, 2],)]),
    ("SELECT arrayMap(t -> tupleElement(t, 2), [(1,'a'),(2,'b')]) AS r",
     [((['a', 'b']),)]),
    # date_trunc on a lambda param
    ("SELECT arrayMap(d -> toString(date_trunc('month', d)), "
     "[toDate('2024-03-15')]) AS r", None),
    # toJSONString on a lambda param
    ("SELECT arrayMap(x -> toJSONString(x), [1, 2]) AS r",
     [((['1', '2']),)]),
    # emptyArrayToSingle on a lambda param
    ("SELECT arrayMap(a -> emptyArrayToSingle(a), [[1], []]) AS r",
     None),
    # defaultValueOfArgumentType on a lambda param
    ("SELECT arrayMap(x -> defaultValueOfArgumentType(x), [5]) AS r",
     [([0],)]),
    # isNullable on a lambda param (try-wrapped: should not crash)
    ("SELECT arrayMap(x -> isNullable(x), [1]) AS r", None),
    # neighbor-free: arrayElement via lambda
    ("SELECT arrayMap(a -> arrayElement(a, 1), [[7], [8]]) AS r",
     [([7, 8],)]),
    # round inside lambda (fixed this session: no ERROR log)
    ("SELECT arrayMap(v -> round(v, 1), [1.25, 2.35]) AS r", None),
    # toString float strip inside lambda
    ("SELECT arrayMap(v -> toString(v), [1.0, 2.5]) AS r",
     [((['1', '2.5']),)]),
    # length polymorphic inside lambda
    ("SELECT arrayMap(s -> length(s), ['ab', 'c']) AS r", [([2, 1],)]),
    ("SELECT arrayMap(a -> length(a), [[1,2],[3]]) AS r", [([2, 1],)]),
]

npass = nfail = nprint = 0
for sql, expected in PROBES:
    try:
        rows = [tuple(r) for r in
                execute_sql(spark, sql, {}).limit(6).collect()]
        if expected is None:
            print(f"PRNT | {sql[:90]!r} -> {rows}")
            nprint += 1
        elif rows == expected:
            npass += 1
        else:
            print(f"DIFF | {sql[:90]!r} -> {rows} (expected {expected})")
            nfail += 1
    except Exception as e:
        msg = str(e).split("\n")[0][:130]
        print(f"FAIL | {sql[:90]!r} -> {type(e).__name__}: {msg}")
        nfail += 1
print(f"\n{npass} pass, {nfail} diff/fail, {nprint} printed")
