"""Round-7 sweep batch 30: MergeTree-family FINAL/OPTIMIZE semantics —
ReplacingMergeTree version ties (last insert wins), CollapsingMergeTree
sign cancellation incl. orphan rows, VersionedCollapsing, SummingMergeTree
(numeric sums, first non-numeric, zero-sum rows kept? CH: row remains if
any summed col nonzero; all-zero rows are NOT dropped unless configured),
AggregatingMergeTree + uniqState/Merge round-trip, TTL on OPTIMIZE.
Contracts from published CH docs (table-engines/mergetree-family)."""
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

sess = ChSession(spark)
STEPS = [
    # ReplacingMergeTree: FINAL keeps max version; tie -> last inserted
    ("CREATE TABLE r (k Int32, v Int32, ver UInt32) "
     "ENGINE = ReplacingMergeTree(ver) ORDER BY k", None, None),
    ("INSERT INTO r VALUES (1, 10, 1), (1, 20, 2)", None, None),
    ("INSERT INTO r VALUES (1, 30, 2)", None, None),   # tie on ver=2
    ("SELECT v FROM r FINAL", "show", [(30,)]),
    # no-version Replacing: last inserted wins
    ("CREATE TABLE r2 (k Int32, v Int32) "
     "ENGINE = ReplacingMergeTree() ORDER BY k", None, None),
    ("INSERT INTO r2 VALUES (1, 10)", None, None),
    ("INSERT INTO r2 VALUES (1, 20)", None, None),
    ("SELECT v FROM r2 FINAL", "show", [(20,)]),
    # CollapsingMergeTree: (+1,-1) same-key pairs cancel; orphan -1 kept
    ("CREATE TABLE c (k Int32, v Int32, s Int8) "
     "ENGINE = CollapsingMergeTree(s) ORDER BY k", None, None),
    ("INSERT INTO c VALUES (1, 10, 1), (1, 10, -1), (1, 20, 1)",
     None, None),
    ("SELECT k, v FROM c FINAL", "show", [(1, 20)]),
    # SummingMergeTree: numeric non-key cols sum; FINAL collapses
    ("CREATE TABLE s (k Int32, q Int64, note String) "
     "ENGINE = SummingMergeTree() ORDER BY k", None, None),
    ("INSERT INTO s VALUES (1, 5, 'a'), (1, 7, 'b'), (2, 3, 'c')",
     None, None),
    # non-summed col keeps "an arbitrary value from the existing ones"
    ("SELECT k, q, note FROM s FINAL ORDER BY k", "show2",
     [[(1, 12, 'a'), (2, 3, 'c')], [(1, 12, 'b'), (2, 3, 'c')]]),
    # explicit column list: only q sums
    ("CREATE TABLE s2 (k Int32, q Int64, w Int64) "
     "ENGINE = SummingMergeTree((q)) ORDER BY k", None, None),
    ("INSERT INTO s2 VALUES (1, 5, 100), (1, 7, 200)", None, None),
    ("SELECT k, q, w FROM s2 FINAL", "show2",
     [[(1, 12, 100)], [(1, 12, 200)]]),
    # AggregatingMergeTree: uniqState partial states merge under FINAL
    ("CREATE TABLE a (k Int32, u AggregateFunction(uniqExact, Int32)) "
     "ENGINE = AggregatingMergeTree() ORDER BY k", None, None),
    ("INSERT INTO a SELECT 1 AS k, uniqExactState(number) AS u "
     "FROM numbers(5)", None, None),
    ("INSERT INTO a SELECT 1 AS k, uniqExactState(number + 3) AS u "
     "FROM numbers(5)", None, None),
    ("SELECT k, uniqExactMerge(u) AS n FROM a GROUP BY k", "show",
     [(1, 8)]),
    # OPTIMIZE applies TTL
    ("CREATE TABLE t (d Date, x Int32) ENGINE = MergeTree ORDER BY x "
     "TTL d + INTERVAL 1 YEAR", None, None),
    ("INSERT INTO t VALUES ('2020-01-01', 1), ('2099-01-01', 2)",
     None, None),
    ("OPTIMIZE TABLE t", None, None),
    ("SELECT x FROM t", "show", [(2,)]),
]

for sql, mode, want in STEPS:
    try:
        out = sess.execute(sql)
        if mode == "show2" and out is not None:
            got = sorted(tuple(r) for r in out.collect())
            tag = "ok  " if any(got == sorted(w) for w in want) else "DIVG"
            extra = f" (want one of {want})" if tag == "DIVG" else ""
            print(f"{tag} | {sql[:64]!r} -> {got}{extra}")
        elif mode == "show" and out is not None:
            got = sorted(tuple(r) for r in out.collect())
            tag = "ok  " if (want is None or got == sorted(want)) \
                else "DIVG"
            extra = f" (want {want})" if tag == "DIVG" else ""
            print(f"{tag} | {sql[:64]!r} -> {got}{extra}")
        else:
            print(f"ok   | {sql[:64]!r}")
    except Exception as e:
        print(f"FAIL | {sql[:64]!r} -> {type(e).__name__}: "
              f"{str(e).splitlines()[0][:110]}")
