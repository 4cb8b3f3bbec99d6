"""Round-7 sweep batch 7: parametric aggregates breadth (windowFunnel
modes, sequenceMatch/Count patterns, retention, topKWeighted),
DateTime64 sub-second precision, Decimal arithmetic scale rules, UUID
functions, bar fractional blocks, FixedString ops. (sql, expected|None)"""
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

EVENTS = """(SELECT arrayJoin([
  (1, 1000, 'view'), (1, 1010, 'cart'), (1, 1020, 'buy'),
  (2, 2000, 'view'), (2, 2100, 'buy'),
  (3, 3000, 'cart'), (3, 3010, 'view')]) AS t,
  t.1 AS uid, t.2 AS ts, t.3 AS ev)"""

PROBES = [
    # --- windowFunnel (docs: parametric-functions) ---
    (f"SELECT uid, windowFunnel(50)(ts, ev = 'view', ev = 'cart', "
     f"ev = 'buy') AS lvl FROM {EVENTS} GROUP BY uid ORDER BY uid",
     [(1, 3), (2, 1), (3, 1)]),
    (f"SELECT uid, windowFunnel(200)(ts, ev = 'view', ev = 'buy') "
     f"AS lvl FROM {EVENTS} GROUP BY uid ORDER BY uid",
     [(1, 2), (2, 2), (3, 1)]),
    # --- sequenceMatch / sequenceCount ---
    (f"SELECT uid, sequenceMatch('(?1).*(?2)')(ts, ev = 'view', "
     f"ev = 'buy') AS m FROM {EVENTS} GROUP BY uid ORDER BY uid",
     [(1, True), (2, True), (3, False)]),
    ("SELECT sequenceCount('(?1)(?2)')(t, n = 1, n = 2) AS c FROM "
     "(SELECT arrayJoin([(1,1),(2,2),(3,1),(4,2),(5,3)]) AS p, "
     "p.1 AS t, p.2 AS n)", [(2,)]),
    # --- retention ---
    (f"SELECT uid, retention(ev = 'view', ev = 'cart', ev = 'buy') "
     f"AS r FROM {EVENTS} GROUP BY uid ORDER BY uid",
     [(1, [1, 1, 1]), (2, [1, 0, 1]), (3, [1, 1, 0])]),
    # --- topKWeighted ---
    ("SELECT topKWeighted(2)(k, w) AS r FROM (SELECT "
     "arrayJoin([('a',10),('b',1),('c',5)]) AS p, p.1 AS k, p.2 AS w)",
     [((['a', 'c']),)]),
    # --- DateTime64 precision ---
    ("SELECT toTypeName(toDateTime64('2023-01-01 12:00:00.123', 3)) "
     "AS r", [('DateTime64(3)',)]),
    ("SELECT toString(toDateTime64('2023-01-01 12:00:00.123', 3)) AS r",
     [('2023-01-01 12:00:00.123',)]),
    ("SELECT toUnixTimestamp64Milli(toDateTime64("
     "'2023-01-01 00:00:00.500', 3)) AS r", [(1672531200500,)]),
    ("SELECT toString(fromUnixTimestamp64Milli(1672531200500)) AS r",
     None),
    ("SELECT toMillisecond(toDateTime64('2023-01-01 00:00:00.456', 3)) "
     "AS r", [(456,)]),
    # --- Decimal arithmetic scale rules (CH: plus keeps max scale,
    # multiply adds scales, divide keeps dividend scale) ---
    ("SELECT toTypeName(toDecimal32(2, 2) + toDecimal32(3, 3)) AS r",
     None),
    ("SELECT toString(toDecimal32('1.10', 2) + toDecimal32('2.25', 2)) "
     "AS r", [('3.35',)]),
    ("SELECT toString(toDecimal32('1.5', 1) * toDecimal32('2.5', 1)) "
     "AS r", [('3.75',)]),
    ("SELECT divideDecimal(toDecimal64(-12, 1), toDecimal32(2.1, 1), 5)"
     " AS r", None),
    # --- UUID ---
    ("SELECT toUUID('61f0c404-5cb3-11e7-907b-a6006ad3dba0') = "
     "toUUID('61f0c404-5cb3-11e7-907b-a6006ad3dba0') AS r", [(True,)]),
    ("SELECT toString(toUUID('61f0c404-5cb3-11e7-907b-a6006ad3dba0')) "
     "AS r", [('61f0c404-5cb3-11e7-907b-a6006ad3dba0',)]),
    ("SELECT UUIDStringToNum('612f3c40-5d3b-217e-707b-6a546a3d7b29') "
     "AS r", None),
    ("SELECT empty(generateUUIDv4()) AS r", [(False,)]),
    # --- bar fractional ---
    ("SELECT bar(3.5, 0, 10, 10) AS r", [('███▌',)]),
    ("SELECT bar(10, 0, 10, 5) AS r", [('█████',)]),
    # --- FixedString ---
    ("SELECT length(toFixedString('foo', 8)) AS r", [(8,)]),
    ("SELECT toValidUTF8('ok') AS r", [('ok',)]),
    # --- misc previously-unprobed ---
    ("SELECT arrayReduceInRanges('sum', [(1, 5), (2, 3)], [1,2,3,4,5]) AS r",
     [(([15, 9]),)]),
    ("SELECT sumMap([1,2,1],[10,20,30]) AS r", None),
    ("SELECT sumMap(k, v) AS r FROM (SELECT [1,2,1] AS k, [10,20,30] AS v)", None),
    ("SELECT anyHeavy(x) AS r FROM (SELECT arrayJoin([1,1,1,2]) AS x)",
     None),
    ("SELECT boundingRatio(x, y) AS r FROM (SELECT arrayJoin("
     "[(0,0.0),(10,20.0)]) AS p, p.1 AS x, p.2 AS y)", [(2.0,)]),
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
        msg = str(e).split("\n")[0][:140]
        print(f"FAIL | {sql[:90]!r} -> {type(e).__name__}: {msg}")
        nfail += 1
print(f"\n{npass} pass, {nfail} diff/fail, {nprint} printed")
