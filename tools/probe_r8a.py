"""Round-8 probe A: verdict/advice fixes — parametric groupArray(N),
splitBy* remainder setting, NOT IN NULL lhs, javaHash surrogates,
SHOW CREATE comment escaping."""
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


def java_hash(s: str) -> int:
    h = 0
    for unit in s.encode("utf-16-be"):
        pass
    h = 0
    import struct
    units = struct.unpack(f">{len(s.encode('utf-16-be'))//2}H",
                          s.encode("utf-16-be"))
    for u in units:
        h = (h * 31 + u) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h


PROBES = [
    # parametric groupArray family
    ("SELECT groupArray(2)(number) AS r FROM (SELECT number FROM numbers(5) ORDER BY number)", [([0, 1],)]),
    ("SELECT groupUniqArray(2)(number % 3) AS r FROM numbers(9)", None),
    ("SELECT groupArrayIf(2)(number, number > 1) AS r FROM (SELECT number FROM numbers(6) ORDER BY number)", [([2, 3],)]),
    ("SELECT groupArray(10)(number) AS r FROM numbers(3)", [([0, 1, 2],)]),
    # splitBy* max_substrings: default DISCARDS remainder
    ("SELECT splitByChar('=', 'a=b=c', 2) AS r", [(["a", "b"],)]),
    ("SELECT splitByString(', ', 'a, b, c', 2) AS r", [(["a", "b"],)]),
    ("SELECT splitByRegexp('[,;]', 'a,b;c', 2) AS r", [(["a", "b"],)]),
    ("SELECT splitByChar('=', 'a=b=c') AS r", [(["a", "b", "c"],)]),
    ("SELECT splitByChar('=', 'a=b=c', 0) AS r", [(["a", "b", "c"],)]),
    ("SELECT splitByChar('=', 'a=b=c', 2) AS r SETTINGS splitby_max_substrings_includes_remaining_string = 1", [(["a", "b=c"],)]),
    # IN / NOT IN with NULL lhs: always 0
    ("SELECT NULL IN (1, 2) AS a, NULL NOT IN (1, 2) AS b", [(False, False)]),
    ("SELECT 1 IN (1, 2) AS a, 1 NOT IN (1, 2) AS b, 3 NOT IN (1, 2) AS c", [(True, False, True)]),
    ("SELECT x, x NOT IN (1, 2) AS r FROM (SELECT CAST(NULL AS Nullable(UInt8)) AS x)", None),
    ("SELECT count() AS c FROM (SELECT CAST(NULL AS Nullable(UInt8)) AS x) WHERE x NOT IN (1, 2)", [(0,)]),
    # javaHash: BMP + supplementary plane
    ("SELECT javaHash('Hello, world!') AS r", [(java_hash("Hello, world!"),)]),
    ("SELECT javaHash('a\U0001F600b') AS r", [(java_hash("a\U0001F600b"),)]),
    ("SELECT javaHash('\U0001D11E') AS r", [(java_hash("\U0001D11E"),)]),
    ("SELECT hiveHash('Hello, world!') AS r", [(java_hash("Hello, world!") & 0x7FFFFFFF,)]),
]

fails = 0
for sql, exp in PROBES:
    try:
        df = execute_sql(spark, sql, {})
        rows = [tuple(r) for r in df.limit(5).collect()]
        if exp is not None and rows != exp:
            print(f"MISMATCH | {sql!r} -> {rows} (want {exp})")
            fails += 1
        else:
            print(f"OK   | {sql!r} -> {rows}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL | {sql!r} -> {type(e).__name__}: {msg}")
        fails += 1

# SHOW CREATE comment escaping
try:
    import tempfile
    from clickhouse_from_scratch_spark.ddl import ChSession
    sess = ChSession(spark, warehouse=tempfile.mkdtemp())
    sess.execute("CREATE TABLE t_cmt (x UInt8 COMMENT 'it''s a \\\\ test') ENGINE = Memory")
    out = sess.execute("SHOW CREATE TABLE t_cmt").collect()[0][0]
    print("SHOW CREATE ->", out)
    if "\\'" in out or "it\\'s" in out:
        print("OK   | comment escaped")
    else:
        print("MISMATCH | comment not escaped")
        fails += 1
except Exception as e:
    print(f"FAIL | show create comment -> {type(e).__name__}: {e}")
    fails += 1

print("FAILS:", fails)
