"""Round-10 probe sweep A: totals_mode variants, LIMIT..BY offset forms,
WITH FILL edges, grouping() multi-arg, set-op column rules."""
import os
import traceback

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
from clickhouse_from_scratch_spark.session import get_spark  # noqa: E402
from clickhouse_from_scratch_spark.ddl import ChSession  # noqa: E402

spark = get_spark()
eng = ChSession(spark)


def run(tag, sql):
    try:
        df = eng.execute(sql)
        out = [tuple(r) for r in df.collect()] if df is not None else "ok"
        print(f"{tag}: {out}")
    except Exception as e:
        print(f"{tag}: ERR {type(e).__name__}: {e}")


# totals_mode variants
run("t1", "SELECT number % 2 AS g, sum(number) AS s FROM numbers(10) "
    "GROUP BY g WITH TOTALS HAVING s > 20 "
    "SETTINGS totals_mode = 'after_having_inclusive'")
run("t2", "SELECT number % 2 AS g, sum(number) AS s FROM numbers(10) "
    "GROUP BY g WITH TOTALS HAVING s > 20 "
    "SETTINGS totals_mode = 'after_having_auto'")
run("t3", "SELECT number % 2 AS g, sum(number) AS s FROM numbers(10) "
    "GROUP BY g WITH TOTALS HAVING s > 20 "
    "SETTINGS totals_mode = 'before_having'")
# LIMIT n,m BY / LIMIT n OFFSET m BY forms
run("l1", "SELECT number % 3 AS g, number FROM numbers(9) "
    "ORDER BY g, number LIMIT 1 OFFSET 1 BY g")
run("l2", "SELECT number % 3 AS g, number FROM numbers(9) "
    "ORDER BY g, number LIMIT 1, 1 BY g")
# WITH FILL negative STEP / FROM>TO
run("f1", "SELECT number AS n FROM numbers(3) ORDER BY n DESC "
    "WITH FILL FROM 5 TO 0 STEP -1")
run("f2", "SELECT number * 2 AS n, 'x' AS t FROM numbers(3) "
    "ORDER BY n WITH FILL STEP 1")
# grouping() with two args (grouping_id bit order)
run("g1", "SELECT a, b, grouping(a, b) AS g, count() AS c FROM "
    "(SELECT 1 AS a, 2 AS b) GROUP BY ROLLUP(a, b) ORDER BY g, a, b")
# set-op column count mismatch must raise
run("s1", "SELECT 1 UNION ALL SELECT 1, 2")
run("s2", "SELECT 1 AS a INTERSECT SELECT 2 AS b")  # names differ, positional
# INTERVAL arithmetic edges
run("i1", "SELECT toDate('2024-01-31') + INTERVAL 1 MONTH AS d")
run("i2", "SELECT toDateTime('2024-03-31 12:00:00') - INTERVAL 1 MONTH AS d")
run("i3", "SELECT toDate('2024-02-29') + INTERVAL 1 YEAR AS d")
# toStartOf on DateTime
run("d1", "SELECT toStartOfInterval(toDateTime('2024-05-07 13:47:12'), "
    "INTERVAL 15 MINUTE) AS t")
run("d2", "SELECT toStartOfWeek(toDate('2024-05-08')) AS w, "
    "toStartOfWeek(toDate('2024-05-08'), 1) AS w1")
run("d3", "SELECT toWeek(toDate('2024-01-01')) AS w0, "
    "toISOWeek(toDate('2024-01-01')) AS wi")
# formatDateTime specifiers
run("d4", "SELECT formatDateTime(toDateTime('2024-05-07 09:04:05'), "
    "'%Y-%m-%d %H:%M:%S %j %a') AS s")
# arrayEnumerate family
run("a1", "SELECT arrayEnumerateUniq([10, 20, 10, 30, 10]) AS u")
run("a2", "SELECT arrayEnumerateDense([10, 20, 10, 30]) AS d")
run("a3", "SELECT arrayZip([1, 2], ['a', 'b']) AS z")
run("a4", "SELECT arrayDifference([1, 5, 2]) AS d, "
    "arrayCumSum([1, 2, 3]) AS c")
# neighbor/runningDifference-ish
run("n1", "SELECT number, neighbor(number, 1) AS nx, "
    "neighbor(number, -1, 99) AS pv FROM numbers(3)")
# bitTest / bitCount
run("b1", "SELECT bitTest(5, 0) AS a, bitTest(5, 1) AS b, "
    "bitCount(255) AS c, bitRotateLeft(1, 3) AS r")
# string edge: substring negative offset
run("x1", "SELECT substring('hello', -3) AS a, "
    "substring('hello', -3, 2) AS b, substring('hello', 0) AS c")
run("x2", "SELECT left('hello', -2) AS a, right('hello', -2) AS b")
# tuple compare
run("x3", "SELECT (1, 'a') < (1, 'b') AS t, (2, 'a') < (1, 'z') AS f")
# if() with NULL condition
run("x4", "SELECT if(NULL, 1, 2) AS a, multiIf(NULL, 1, 0, 2, 3) AS b")
# modulo of negatives / intDiv rounding
run("x5", "SELECT -7 % 3 AS a, intDiv(-7, 3) AS b, intDivOrZero(5, 0) "
    "AS c, modulo(-7, -3) AS d")
# least/greatest with NULL
run("x6", "SELECT least(1, NULL) AS a, greatest(NULL, NULL) AS b, "
    "least(3, 1, 2) AS c")
