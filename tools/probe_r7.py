"""Round-7 probe harness: reproduce the verdict's seven defects."""
import sys, traceback
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
    # 1: duplicate unaliased expressions
    ("SELECT round(2.5), round(3.5)", None),
    ("SELECT 1, 1", None),
    ("SELECT abs(-1), abs(-2)", None),
    ("SELECT number + 1, number + 2 FROM numbers(3)", None),
    ("SELECT number, number FROM numbers(3) ORDER BY number", None),
    # 2: truthy-int predicates
    ("SELECT number FROM numbers(10) WHERE number % 2", None),
    ("SELECT number FROM numbers(10) WHERE 0", None),
    ("SELECT number % 3 AS g, count() AS c FROM numbers(10) GROUP BY g HAVING count() % 2", None),
    ("SELECT number FROM numbers(10) PREWHERE number % 2", None),
    # 3: arraySlice negative length
    ("SELECT arraySlice([1,2,3,4,5], 2, -1) AS r", None),
    # 4: tupleElement on inline array-of-tuples
    ("SELECT arrayJoin([('x',1),('y',9)]).2 AS v", None),
    ("SELECT tupleElement(arrayJoin([('x',1),('y',9)]), 1) AS v", None),
    # 5: splitBy* max_substrings
    ("SELECT splitByChar(',', 'a,b,c', 2) AS r", None),
    ("SELECT splitByString(', ', 'a, b, c', 2) AS r", None),
    ("SELECT splitByRegexp('[,;]', 'a,b;c', 2) AS r", None),
    # 6: date_trunc type
    ("SELECT date_trunc('month', toDate('2022-04-17')) AS r, toTypeName(date_trunc('month', toDate('2022-04-17'))) AS t", None),
    # 7: toTypeName literals
    ("SELECT toTypeName(NULL) AS a, toTypeName([1,2]) AS b, toTypeName([1,-1]) AS c, toTypeName([256]) AS d", None),
]

for sql, _ in PROBES:
    try:
        df = execute_sql(spark, sql, {})
        rows = df.limit(5).collect()
        schema = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
        print(f"OK   | {sql!r} -> {[tuple(r) for r in rows]} | {schema}")
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"FAIL | {sql!r} -> {type(e).__name__}: {msg}")
