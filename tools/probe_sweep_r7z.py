"""Round-7 sweep batch 29: new surface — tuple arithmetic family,
bitRotateLeft/Right (width-aware), quantileExactExclusive/Inclusive,
normalizeUTF8*, damerauLevenshteinDistance, mapContainsKeyLike /
mapExtractKeyLike, extractAllGroups orientations. Expected values from
published ClickHouse docs; DL distance cross-checked against DuckDB."""
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

CASES = [
    # tuple arithmetic (docs tuple-functions examples)
    ("SELECT tuplePlus((1, 2), (2, 3)) AS x", "(3, 5)", "tuple"),
    ("SELECT tupleMinus((1, 2), (2, 3)) AS x", "(-1, -1)", "tuple"),
    ("SELECT tupleMultiply((1, 2), (2, 3)) AS x", "(2, 6)", "tuple"),
    ("SELECT tupleDivide((1, 2), (2, 3)) AS x", "(0.5, 0.6666666666666666)",
     "tuple"),
    ("SELECT tupleNegate((1, 2)) AS x", "(-1, -2)", "tuple"),
    ("SELECT tupleMultiplyByNumber((1, 2), -2.1) AS x", "(-2.1, -4.2)",
     "tuple"),
    ("SELECT tupleDivideByNumber((1, 2), 0.5) AS x", "(2.0, 4.0)", "tuple"),
    ("SELECT tupleConcat((1, 2), tuple('a')) AS x", "(1, 2, 'a')", "tuple"),
    ("SELECT tupleIntDiv((15, 10, 5), (5, 5, 5)) AS x", "(3, 2, 1)",
     "tuple"),
    ("SELECT tupleModulo((15, 10, 5), (5, 3, 2)) AS x", "(0, 1, 1)",
     "tuple"),
    ("SELECT tupleHammingDistance((1, 2, 3), (3, 2, 1)) AS x", 2),
    ("SELECT vectorSum((1, 2), (2, 3)) AS x", "(3, 5)", "tuple"),
    # bit rotation (UInt8 literal width: 8 bits)
    ("SELECT bitRotateLeft(3, 4) AS x", 48),
    ("SELECT bitRotateLeft(129, 1) AS x", 3),
    ("SELECT bitRotateRight(3, 1) AS x", 129),
    ("SELECT bitRotateLeft(toUInt32(1), 31) AS x", 2147483648),
    ("SELECT bitRotateLeft(toUInt16(32769), 1) AS x", 3),
    # quantile exclusive/inclusive (Excel R-6/R-7 contracts)
    ("SELECT quantileExactExclusive(0.6)(number) AS x "
     "FROM numbers(1, 10)", 6.6),
    ("SELECT quantileExactInclusive(0.6)(number) AS x "
     "FROM numbers(1, 10)", 6.4, "approx"),
    ("SELECT quantilesExactExclusive(0.25, 0.5, 0.75)(number) AS x "
     "FROM numbers(1, 11)", [3.0, 6.0, 9.0]),
    ("SELECT quantilesExactInclusive(0.25, 0.5, 0.75)(number) AS x "
     "FROM numbers(1, 11)", [3.5, 6.0, 8.5]),
    # normalization
    ("SELECT lengthUTF8(normalizeUTF8NFD('é')) AS x", 2),
    ("SELECT lengthUTF8(normalizeUTF8NFC(normalizeUTF8NFD('é'))) AS x", 1),
    ("SELECT normalizeUTF8NFKC('ﬁ') AS x", "fi"),
    ("SELECT normalizeUTF8NFKD('²') AS x", "2"),
    # Damerau-Levenshtein (docs: clickhouse/mouse = 6; transposition=1)
    ("SELECT damerauLevenshteinDistance('clickhouse', 'mouse') AS x", 6),
    ("SELECT damerauLevenshteinDistance('ab', 'ba') AS x", 1),
    ("SELECT damerauLevenshteinDistance('ca', 'abc') AS x", 2),
    # map LIKE helpers (docs examples)
    ("SELECT mapContainsKeyLike(map('abc', 1, 'def', 2), 'a%') AS x", 1),
    ("SELECT mapContainsKeyLike(map('abc', 1, 'def', 2), 'x%') AS x", 0),
    ("SELECT mapExtractKeyLike(map('abc', 1, 'abe', 2, 'def', 3), "
     "'ab%') AS x", {"abc": 1, "abe": 2}, "map"),
    # extractAllGroups orientations (docs examples)
    ("SELECT extractAllGroupsHorizontal('abc=111, def=222, ghi=333', "
     "'(\"[^\"]+\"|\\\\w+)=(\"[^\"]+\"|\\\\w+)') AS x",
     [["abc", "def", "ghi"], ["111", "222", "333"]], "nested"),
    ("SELECT extractAllGroupsVertical('abc=111, def=222, ghi=333', "
     "'(\"[^\"]+\"|\\\\w+)=(\"[^\"]+\"|\\\\w+)') AS x",
     [["abc", "111"], ["def", "222"], ["ghi", "333"]], "nested"),
]

ok = fail = 0
for case in CASES:
    sql, want = case[0], case[1]
    mode = case[2] if len(case) > 2 else None
    try:
        got = execute_sql(spark, sql, {}).collect()[0][0]
        if mode == "tuple":
            good = str(tuple(got)) == want.replace("'", "'") \
                or str(tuple(got)) == want
            gs = str(tuple(got))
        elif mode == "map":
            good = dict(got) == want
            gs = str(dict(got))
        elif mode == "nested":
            good = [list(g) for g in got] == want
            gs = str([list(g) for g in got])
        elif isinstance(want, list):
            good = list(got) == want
            gs = str(list(got))
        elif mode == "approx":
            gs = str(got)
            good = abs(float(got) - float(want)) < 1e-9
        else:
            gs = str(got)
            good = gs == str(want) or got == want
        if good:
            ok += 1
            print(f"ok   | {sql[:70]} -> {gs[:46]}")
        else:
            fail += 1
            print(f"DIVG | {sql[:70]} -> {gs[:60]} (want {want})")
    except Exception as e:
        fail += 1
        print(f"FAIL | {sql[:70]} -> {type(e).__name__}: "
              f"{str(e).splitlines()[0][:100]}")
print(f"== {ok} ok, {fail} divergent/fail")
