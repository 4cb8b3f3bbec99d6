"""Round-7 sweep batch 6: rounding buckets (roundToExp2/roundDown/
roundAge/roundDuration), no-op/introspection helpers (identity/
materialize/ignore/indexHint), subsequences, tokenizers (alphaTokens/
splitByWhitespace/ngrams/tokens), javaHash/hiveHash, byteSwap,
formatReadableTimeDelta max-unit, toDecimalString. (sql, expected|None)"""
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
    # --- rounding buckets (docs) ---
    ("SELECT roundToExp2(31) AS a, roundToExp2(32) AS b, "
     "roundToExp2(0) AS c", [(16, 32, 0)]),
    ("SELECT roundDown(5, [2,4,8]) AS a, roundDown(1, [2,4,8]) AS b",
     [(4, 2)]),
    ("SELECT roundAge(32) AS a, roundAge(16) AS b, roundAge(0) AS c",
     [(25, 17, 0)]),
    ("SELECT roundDuration(230) AS a, roundDuration(0) AS b",
     [(180, 0)]),
    # --- no-op helpers ---
    ("SELECT identity(3) AS a, materialize(1) AS b, ignore(42, 'x') AS c",
     [(3, 1, 0)]),
    ("SELECT indexHint(number > 1) AS h FROM numbers(1)", None),
    ("SELECT defaultValueOfArgumentType(3) AS a, "
     "defaultValueOfArgumentType('s') AS b", None),
    # --- subsequences ---
    ("SELECT hasSubsequence('garbage', 'arg') AS y, "
     "hasSubsequence('garbage', 'zzz') AS n", [(True, False)]),
    ("SELECT hasSubsequenceCaseInsensitive('garbage', 'ARG') AS r",
     [(True,)]),
    # --- tokenizers ---
    ("SELECT alphaTokens('abca1abc') AS r", [((['abca', 'abc']),)]),
    ("SELECT splitByWhitespace('1!  a,  b.  ') AS r",
     [((['1!', 'a,', 'b.']),)]),
    ("SELECT splitByNonAlpha('1!  a,  b.  ') AS r", None),
    ("SELECT ngrams('ClickHouse', 3) AS r", None),
    ("SELECT tokens('Hello, world!') AS r", [((['Hello', 'world']),)]),
    # --- hashes with published contracts ---
    ("SELECT javaHash('Hello, world!') AS r", [(-1880044555,)]),
    ("SELECT hiveHash('Hello, world!') AS r", [(267439093,)]),
    ("SELECT byteSwap(3351772109) AS r", [(3455829959,)]),
    # --- readable / decimal strings ---
    ("SELECT formatReadableTimeDelta(7601, 'minutes') AS r",
     [('126 minutes and 41 seconds',)]),
    ("SELECT toDecimalString(64.32, 5) AS r", [('64.32000',)]),
    # --- bar ---
    ("SELECT bar(3, 0, 10, 10) AS r", None),
    # --- misc ---
    ("SELECT least(1, 2) AS a, greatest(1, 2) AS b", [(1, 2)]),
    ("SELECT toTypeName(now()) AS r", [('DateTime',)]),
    ("SELECT toTypeName(today()) AS r", [('Date',)]),
    ("SELECT isFinite(1/0) AS a, isInfinite(1/0) AS b, "
     "isNaN(0/0) AS c", [(False, True, True)]),
    ("SELECT ifNotFinite(1/0, 42) AS r", [(42.0,)]),
    ("SELECT runningDifference(number) AS r FROM numbers(3)", None),
    ("SELECT neighbor(number, 1) AS r FROM numbers(3)", [(1,), (2,), (0,)]),
]

npass = nfail = nprint = 0
for sql, expected in PROBES:
    try:
        rows = [tuple(r) for r in
                execute_sql(spark, sql, {}).limit(6).collect()]
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
