"""Round-7 regression pins: the seven defects from the round-6 verdict.

1. Unaliased duplicate expressions (AMBIGUOUS_REFERENCE) — output columns
   are named by formatted expression text (ref IAST::getColumnName
   contract, src/Parsers/IAST.h); exact duplicates emit duplicate-named
   columns like the reference does.
2. Truthy-int predicates in WHERE/PREWHERE/HAVING (filter columns are
   UInt8 in the reference, not Bool).
3. arraySlice negative length.
4. tupleElement / `.N` on an inline array-of-tuples (nested arrayJoin
   hoisting).
5. splitBy* max_substrings third argument.
6. date_trunc preserves Date for Date input with unit >= day.
7. toTypeName literal rendering: NULL / array element literal types.
"""
import pytest

from clickhouse_from_scratch_spark.plans.engine import execute_sql


def run(spark, sql, tables=None):
    return execute_sql(spark, sql, tables or {})


def rows(spark, sql, tables=None):
    return [tuple(r) for r in run(spark, sql, tables).collect()]


# --- 1: duplicate unaliased expressions -----------------------------------

def test_dup_same_function_calls(spark):
    df = run(spark, "SELECT round(2.5), round(3.5)")
    assert df.columns == ["round(2.5)", "round(3.5)"]
    assert [tuple(r) for r in df.collect()] == [(2.0, 4.0)]


def test_dup_exact_literals(spark):
    df = run(spark, "SELECT 1, 1")
    assert df.columns == ["1", "1"]
    assert [tuple(r) for r in df.collect()] == [(1, 1)]


def test_dup_abs_calls(spark):
    assert rows(spark, "SELECT abs(-1), abs(-2)") == [(1, 2)]


def test_dup_arith_formatted_names(spark):
    df = run(spark,
             "SELECT number + 1, number + 2 FROM numbers(3) ORDER BY number")
    assert df.columns == ["plus(number, 1)", "plus(number, 2)"]
    assert [tuple(r) for r in df.collect()] == [(1, 2), (2, 3), (3, 4)]


def test_dup_column_selected_twice_with_order(spark):
    df = run(spark,
             "SELECT number, number FROM numbers(3) ORDER BY number DESC")
    assert df.columns == ["number", "number"]
    assert [tuple(r) for r in df.collect()] == [(2, 2), (1, 1), (0, 0)]


def test_dup_in_aggregate_query(spark):
    df = run(spark,
             "SELECT sum(number), sum(number) FROM numbers(4)")
    assert [tuple(r) for r in df.collect()] == [(6, 6)]


def test_formatted_name_string_literal(spark):
    df = run(spark, "SELECT 'a', 'b'")
    assert df.columns == ["'a'", "'b'"]


# --- 2: truthy-int predicates ---------------------------------------------

def test_where_truthy_modulo(spark):
    assert rows(spark,
                "SELECT number FROM numbers(10) WHERE number % 2") == \
        [(1,), (3,), (5,), (7,), (9,)]


def test_where_zero_literal(spark):
    assert rows(spark, "SELECT number FROM numbers(10) WHERE 0") == []


def test_where_nonzero_literal(spark):
    assert rows(spark,
                "SELECT number FROM numbers(3) WHERE 7") == [(0,), (1,), (2,)]


def test_prewhere_truthy(spark):
    assert rows(spark,
                "SELECT number FROM numbers(6) PREWHERE number % 3") == \
        [(1,), (2,), (4,), (5,)]


def test_having_truthy(spark):
    assert sorted(rows(
        spark,
        "SELECT number % 3 AS g, count() AS c FROM numbers(10) "
        "GROUP BY g HAVING count() % 2")) == [(1, 3), (2, 3)]


def test_where_string_still_raises(spark):
    from clickhouse_from_scratch_spark.plans.builder import BuildError
    with pytest.raises(BuildError):
        run(spark,
            "SELECT number FROM numbers(3) WHERE 'x'").collect()


def test_where_null_filters_all(spark):
    assert rows(spark,
                "SELECT number FROM numbers(3) WHERE NULL") == []


# --- 3: arraySlice negative length ----------------------------------------

def test_array_slice_negative_length(spark):
    assert rows(spark,
                "SELECT arraySlice([1,2,3,4,5], 2, -1) AS r") == \
        [(([2, 3, 4]),)]


def test_array_slice_negative_offset_and_length(spark):
    assert rows(spark,
                "SELECT arraySlice([1,2,3,4,5], -4, -1) AS r") == \
        [(([2, 3, 4]),)]


def test_array_slice_negative_length_underflow(spark):
    # drop more than remains -> empty
    assert rows(spark,
                "SELECT arraySlice([1,2,3], 2, -3) AS r") == [(([]),)]


def test_array_slice_positive_still_works(spark):
    assert rows(spark,
                "SELECT arraySlice([1,2,3,4,5], 2, 3) AS r") == \
        [(([2, 3, 4]),)]


# --- 4: nested arrayJoin hoisting -----------------------------------------

def test_tuple_access_on_inline_array_join(spark):
    assert rows(spark,
                "SELECT arrayJoin([('x',1),('y',9)]).2 AS v "
                "ORDER BY v") == [(1,), (9,)]


def test_tuple_element_on_inline_array_join(spark):
    assert rows(spark,
                "SELECT tupleElement(arrayJoin([('x',1),('y',9)]), 1) "
                "AS v ORDER BY v") == [("x",), ("y",)]


def test_sum_over_array_join(spark):
    assert rows(spark,
                "SELECT sum(arrayJoin([1,2,3])) AS s") == [(6,)]


def test_nested_array_join_in_expression(spark):
    assert rows(spark,
                "SELECT arrayJoin([1,2,3]) * 10 AS v ORDER BY v") == \
        [(10,), (20,), (30,)]


def test_bare_array_join_still_works(spark):
    assert rows(spark,
                "SELECT arrayJoin([3,1,2]) AS v ORDER BY v") == \
        [(1,), (2,), (3,)]


# --- 5: splitBy* max_substrings -------------------------------------------

# splitby_max_substrings_includes_remaining_string defaults to 0 at the
# emulated era (24.0): the remainder is DISCARDED; the setting restores
# the keep-remainder behavior
def test_split_by_char_max_substrings(spark):
    assert rows(spark,
                "SELECT splitByChar(',', 'a,b,c', 2) AS r") == \
        [((["a", "b"]),)]


def test_split_by_char_max_substrings_keep_remaining(spark):
    assert rows(spark,
                "SELECT splitByChar(',', 'a,b,c', 2) AS r SETTINGS "
                "splitby_max_substrings_includes_remaining_string = 1") \
        == [((["a", "b,c"]),)]


def test_split_by_string_max_substrings(spark):
    assert rows(spark,
                "SELECT splitByString(', ', 'a, b, c', 2) AS r") == \
        [((["a", "b"]),)]


def test_split_by_regexp_max_substrings(spark):
    assert rows(spark,
                "SELECT splitByRegexp('[,;]', 'a,b;c', 2) AS r") == \
        [((["a", "b"]),)]


def test_split_by_char_two_arg_unchanged(spark):
    assert rows(spark,
                "SELECT splitByChar(',', 'a,b,c') AS r") == \
        [((["a", "b", "c"]),)]


def test_split_by_char_zero_means_unlimited(spark):
    assert rows(spark,
                "SELECT splitByChar(',', 'a,b,c', 0) AS r") == \
        [((["a", "b", "c"]),)]


# --- 6: date_trunc type fidelity ------------------------------------------

def test_date_trunc_date_input_returns_date(spark):
    import datetime
    df = run(spark,
             "SELECT date_trunc('month', toDate('2022-04-17')) AS r")
    assert df.schema["r"].dataType.simpleString() == "date"
    assert df.collect()[0][0] == datetime.date(2022, 4, 1)


def test_date_trunc_datetime_input_keeps_datetime(spark):
    df = run(spark, "SELECT date_trunc('month', "
             "toDateTime('2022-04-17 10:20:30')) AS r")
    assert df.schema["r"].dataType.simpleString() == "timestamp"


def test_date_trunc_hour_on_datetime(spark):
    import datetime
    df = run(spark, "SELECT date_trunc('hour', "
             "toDateTime('2022-04-17 10:20:30')) AS r")
    assert df.collect()[0][0] == datetime.datetime(2022, 4, 17, 10, 0, 0)


# --- 7: toTypeName literal rendering --------------------------------------

def test_totypename_null(spark):
    assert rows(spark, "SELECT toTypeName(NULL) AS t") == \
        [("Nullable(Nothing)",)]


def test_totypename_array_literals(spark):
    assert rows(
        spark,
        "SELECT toTypeName([1,2]) AS a, toTypeName([1,-1]) AS b, "
        "toTypeName([256]) AS c, toTypeName([]) AS d, "
        "toTypeName([1,NULL]) AS e") == \
        [("Array(UInt8)", "Array(Int16)", "Array(UInt16)",
          "Array(Nothing)", "Array(Nullable(UInt8))")]


def test_totypename_tuple_literal(spark):
    assert rows(spark, "SELECT toTypeName(('x', 1)) AS t") == \
        [("Tuple(String, UInt8)",)]


# --- bug-class sweep: duplicates in agg path / formatted-name refs ---------

def test_dup_group_key_selected_twice(spark):
    df = run(spark, "SELECT x, x FROM (SELECT number AS x FROM "
             "numbers(3)) GROUP BY x ORDER BY x")
    assert df.columns == ["x", "x"]
    assert [tuple(r) for r in df.collect()] == [(0, 0), (1, 1), (2, 2)]


def test_dup_count_twice(spark):
    df = run(spark, "SELECT count(), count() FROM numbers(5)")
    assert df.columns == ["count()", "count()"]
    assert [tuple(r) for r in df.collect()] == [(5, 5)]


def test_limit_by_on_formatted_name(spark):
    # LIMIT BY falls back to ordering by all columns — formatted names
    # contain dots and must be backtick-quoted
    assert rows(spark, "SELECT round(2.5) FROM numbers(2) "
                "LIMIT 1 BY round(2.5)") == [(2.0,)]


def test_order_by_aggregate_after_projection(spark):
    assert rows(spark, "SELECT number % 3 AS g, count() AS c "
                "FROM numbers(10) GROUP BY g ORDER BY count() DESC, g") \
        == [(0, 4), (1, 3), (2, 3)]


def test_truthy_in_conditionals(spark):
    assert rows(spark, "SELECT if(2, 'a', 'b') AS a, "
                "multiIf(2, 'a', 0, 'b', 'c') AS b, "
                "CASE WHEN 2 THEN 'a' ELSE 'b' END AS c") == \
        [("a", "a", "a")]


def test_truthy_having_on_aggregate(spark):
    assert rows(spark, "SELECT sum(number) AS s FROM numbers(5) "
                "HAVING sum(number)") == [(10,)]


# --- class sweeps after the verdict: boolean-as-UInt8 arithmetic, truthy
# -If conditions / JOIN ON, identical-arrayJoin CSE --------------------------

def test_bool_arithmetic_uint8(spark):
    # CH predicates are UInt8 numbers (FunctionsComparison.h result type)
    assert rows(spark, "SELECT has([1,2], 2) + has([1], 5) AS s") == [(1,)]
    assert rows(spark, "SELECT (1 = 1) + (2 = 2) AS s") == [(2,)]
    assert rows(spark, "SELECT true + true AS s") == [(2,)]
    assert rows(spark, "SELECT (3 > 1) * 10 AS s") == [(10,)]
    assert rows(spark, "SELECT -(1 < 2) AS s") == [(-1,)]


def test_sum_of_predicate(spark):
    assert rows(spark, "SELECT sum(number > 2) AS s FROM numbers(5)") \
        == [(2,)]
    assert rows(spark, "SELECT avg(number % 2 = 0) AS a "
                "FROM numbers(4)") == [(0.5,)]


def test_if_combinator_truthy_condition(spark):
    assert rows(spark, "SELECT countIf(number % 2) AS c, "
                "sumIf(number, number % 2) AS s FROM numbers(4)") \
        == [(2, 4)]
    assert rows(spark, "SELECT avgIf(number, number % 2) AS a "
                "FROM numbers(4)") == [(2.0,)]


def test_filter_where_truthy(spark):
    assert rows(spark, "SELECT count() FILTER (WHERE number % 2) AS c "
                "FROM numbers(4)") == [(2,)]


def test_join_on_truthy(spark):
    assert rows(spark, "SELECT a FROM (SELECT 1 AS a) x "
                "JOIN (SELECT 1 AS b) y ON 1") == [(1,)]
    assert rows(spark, "SELECT a, b FROM (SELECT 2 AS a) x "
                "JOIN (SELECT 3 AS b) y ON a * b ORDER BY b") == [(2, 3)]


def test_array_join_identical_cse(spark):
    # identical arrayJoin expressions evaluate ONCE (reference CSE; the
    # CH docs' arrayConcat(arr, []) trick exists to defeat it)
    assert rows(spark, "SELECT arrayJoin([1,2]), arrayJoin([1,2])") \
        == [(1, 1), (2, 2)]
    # syntactically different arguments still multiply rows
    assert sorted(rows(spark,
                       "SELECT arrayJoin([1,2]) AS a, "
                       "arrayJoin([10,20]) AS b")) \
        == [(1, 10), (1, 20), (2, 10), (2, 20)]


# --- batch 9: clause-edge semantics -----------------------------------------

def test_positional_group_by(spark):
    # enable_positional_arguments is on by default in the reference
    assert rows(spark, "SELECT number % 2 AS k, count() AS c "
                "FROM numbers(4) GROUP BY 1 ORDER BY 1") \
        == [(0, 2), (1, 2)]
    assert rows(spark, "SELECT number % 2, number % 3, count() AS c "
                "FROM numbers(12) GROUP BY 1, 2 ORDER BY 1, 2")[:3] \
        == [(0, 0, 2), (0, 1, 2), (0, 2, 2)]


def test_duplicate_group_order_keys(spark):
    assert rows(spark, "SELECT number % 2 AS k FROM numbers(4) "
                "GROUP BY number % 2, number % 2 ORDER BY k") \
        == [(0,), (1,)]
    assert rows(spark, "SELECT number FROM numbers(2) "
                "ORDER BY number, number") == [(0,), (1,)]


def test_chained_alias_visibility(spark):
    assert rows(spark, "SELECT number AS x, x + 1 AS y, y * 2 AS z "
                "FROM numbers(2) ORDER BY x") == [(0, 1, 2), (1, 2, 4)]


def test_out_of_range_access_defaults(spark):
    # CH: out-of-range array / missing map key = TYPE default, no error
    assert rows(spark, "SELECT arrayElement([1,2], 5) AS a, "
                "[1,2][5] AS b, arrayElement(['a'], 5) AS c, "
                "map('a', 1)['missing'] AS d, [1,2][-1] AS e") \
        == [(0, 0, '', 0, 2)]


def test_tuple_in_list_and_compare(spark):
    assert rows(spark, "SELECT (1, 'a') IN ((1, 'a'), (2, 'b')) AS r") \
        == [(True,)]
    assert rows(spark, "SELECT number FROM numbers(5) WHERE "
                "(number, number % 2) IN ((3, 1), (4, 0)) "
                "ORDER BY number") == [(3,), (4,)]
    assert rows(spark, "SELECT (1, 2) < (1, 3) AS a, "
                "(2, 1) > (1, 9) AS b") == [(True, True)]


def test_having_whole_table(spark):
    assert rows(spark, "SELECT sum(number) AS s FROM numbers(5) "
                "HAVING s > 5") == [(10,)]
    assert rows(spark, "SELECT sum(number) AS s FROM numbers(5) "
                "HAVING s > 50") == []


def test_strict_parse_conversions_throw(spark):
    # plain to<Type> conversions THROW on unparseable strings; only the
    # OrNull/OrZero spellings degrade (FunctionsConversion contract)
    import pytest as _pytest
    for bad in ["SELECT toInt8('abc')", "SELECT toDate('junk')",
                "SELECT toFloat64('x')"]:
        with _pytest.raises(Exception, match="Cannot parse"):
            run(spark, bad).collect()
    assert rows(spark, "SELECT toInt32(s) AS r FROM (SELECT '42' AS s)") \
        == [(42,)]
    assert rows(spark, "SELECT toInt32OrNull('abc') AS r") == [(None,)]


def test_array_index_zero_returns_default(spark):
    assert rows(spark, "SELECT [1,2,3][0] AS a, "
                "arrayElement(['x'], 0) AS b") == [(0, '')]
