"""Published ClickHouse doc-example contracts, sweep 4: operator
semantics — division by zero (inf/nan, never an error), precedence,
tuple comparison and tuple-IN, CASE forms, truthy int logic, LIKE
escapes, array comparison, numeric literal forms (hex/binary/sci,
UInt64 beyond Int64), ternary, and abs() unsigned widening.
"""
from __future__ import annotations

import math

from clickhouse_from_scratch_spark.plans import execute_sql


def test_ch_doc_contracts_sweep4(spark):
    FAIL = []

    def probe(sql, expected, label, tables=None):
        try:
            rows = execute_sql(spark, sql, tables or {}).collect()
            got = tuple(rows[0]) if len(rows) == 1 else [tuple(r) for r in rows]
            if len(rows) == 1 and len(rows[0]) == 1:
                got = rows[0][0]
            ok = got == expected or (
                isinstance(expected, float) and isinstance(got, float)
                and math.isnan(expected) and math.isnan(got))
            if not ok:
                FAIL.append(f"{label}: expected {expected!r} got {got!r}")
        except Exception as e:
            FAIL.append(f"{label}: {type(e).__name__}: {str(e)[:90]}")

    # division / arithmetic contracts
    probe("SELECT 1 / 0", float("inf"), "1/0 = inf")
    probe("SELECT -1 / 0", float("-inf"), "-1/0 = -inf")
    probe("SELECT 0 / 0", float("nan"), "0/0 = nan")
    probe("SELECT intDivOrZero(5, 0)", 0, "intDivOrZero")
    probe("SELECT moduloOrZero(5, 0)", 0, "moduloOrZero")
    probe("SELECT 7 / 2", 3.5, "div always float")
    probe("SELECT 2 + 2 * 2", 6, "precedence")
    probe("SELECT -(1) + 2 * 3", 5, "unary minus precedence")
    probe("SELECT 10 % 3", 1, "% op")
    probe("SELECT negate(-(-5))", -5, "nested negate")
    probe("SELECT abs(toInt8(-128))", 128, "abs Int8 min widens")
    # string ops
    probe("SELECT 'a' || 'b' || 'c'", "abc", "|| concat")
    probe("SELECT concat('x', 1, 2.5)", "x12.5", "concat mixed types")
    probe("SELECT 'abc' LIKE 'a%'", True, "LIKE pct")
    probe("SELECT 'abc' LIKE 'a_c'", True, "LIKE underscore")
    probe("SELECT 'a_c' LIKE 'a\\\\_c'", True, "LIKE escaped underscore")
    probe("SELECT 'abc' NOT LIKE 'x%'", True, "NOT LIKE")
    probe("SELECT 'ABC' ILIKE 'a%'", True, "ILIKE")
    # tuples & tuple IN
    probe("SELECT (1, 2) = (1, 2)", True, "tuple eq")
    probe("SELECT (1, 2) < (1, 3)", True, "tuple lt lexicographic")
    probe("SELECT (2, 1) > (1, 9)", True, "tuple gt first field")
    probe("SELECT (1, 'a') IN ((1, 'a'), (2, 'b'))", True, "tuple IN list")
    probe("SELECT (1, 'z') NOT IN ((1, 'a'), (2, 'b'))", True, "tuple NOT IN")
    # CASE forms
    probe("SELECT CASE WHEN 1 THEN 'a' ELSE 'b' END", "a", "searched CASE int cond")
    probe("SELECT CASE 2 WHEN 1 THEN 'a' WHEN 2 THEN 'b' ELSE 'c' END", "b", "simple CASE")
    probe("SELECT CASE 9 WHEN 1 THEN 'a' END", None, "simple CASE no else -> NULL")
    # comparisons & logic
    probe("SELECT 1 AND 2", True, "AND nonzero ints")
    probe("SELECT 0 OR 0.5", True, "OR float")
    probe("SELECT NOT 3", False, "NOT nonzero")
    probe("SELECT xor(1, 0)", True, "xor")
    probe("SELECT NULL AND 1", None, "NULL AND 1")
    probe("SELECT NULL OR 1", True, "NULL OR 1")
    probe("SELECT 1 = '1'", True, "int = numeric string")
    probe("SELECT toDate('2023-01-02') BETWEEN toDate('2023-01-01') AND toDate('2023-01-03')", True, "BETWEEN dates")
    probe("SELECT 5 BETWEEN 1 AND 10", True, "BETWEEN int")
    probe("SELECT 5 NOT BETWEEN 6 AND 10", True, "NOT BETWEEN")
    # array comparisons
    probe("SELECT [1,2] = [1,2]", True, "array eq")
    probe("SELECT [1,2] < [1,3]", True, "array lt")
    probe("SELECT [1,2] < [1,2,0]", True, "prefix lt")
    probe("SELECT 2 IN [1,2,3]", True, "IN array literal")
    probe("SELECT 9 NOT IN [1,2,3]", True, "NOT IN array literal")
    # nullable comparisons
    probe("SELECT NULL = NULL", None, "NULL = NULL is NULL")
    probe("SELECT NULL IS NULL", True, "IS NULL")
    probe("SELECT 1 != NULL", None, "!= NULL is NULL")
    # numeric literals / edge
    probe("SELECT 0x10", 16, "hex literal")
    probe("SELECT 0b101", 5, "binary literal")
    probe("SELECT 1e3", 1000.0, "sci literal")
    probe("SELECT .5 + 1", 1.5, "leading-dot float")
    probe("SELECT 9223372036854775807", 9223372036854775807, "int64 max")
    probe("SELECT 18446744073709551615", -1, "uint64 max as long pattern")
    probe("SELECT toUInt64(18446744073709551615) = 18446744073709551615", True, "uint64 roundtrip eq")
    # if/multiIf type promotion
    probe("SELECT if(1, 1, 2.5)", 1.0, "if promotes to float")
    probe("SELECT if(0, 'a', NULL)", None, "if null branch")
    probe("SELECT greatest(1, 2.5)", 2.5, "greatest mixed")
    # ternary operator
    probe("SELECT 1 ? 'y' : 'n'", "y", "ternary")
    probe("SELECT 0 ? 'y' : 'n'", "n", "ternary false")

    assert not FAIL, "\n".join(FAIL)
