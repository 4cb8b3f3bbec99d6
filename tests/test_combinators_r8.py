"""Round-8 combinator additions: -ArgMin/-ArgMax, generic -Map
(countMap/avgMap/uniqMap/anyMap), initializeAggregation.

Published CH combinator surface (aggregate-functions/combinators);
sumMap/minMap/maxMap keep their dedicated two-array lowering in the
builder — these cover the generic rest."""

from __future__ import annotations

import pytest

from clickhouse_from_scratch_spark.plans.engine import execute_sql


def one(spark, sql):
    return tuple(execute_sql(spark, sql, {}).collect()[0])


def test_sum_arg_min_max(spark):
    assert one(spark, "SELECT sumArgMin(number, number % 3) AS r "
               "FROM numbers(10)") == (18,)
    assert one(spark, "SELECT sumArgMax(number, number % 3) AS r "
               "FROM numbers(10)") == (15,)


def test_count_avg_arg_min(spark):
    assert one(spark, "SELECT countArgMin(number % 3) AS a, "
               "avgArgMin(number, number % 3) AS b FROM numbers(10)") \
        == (4, 4.5)


def test_group_array_arg_min(spark):
    assert one(spark, "SELECT groupArrayArgMin(number, number % 3) AS r "
               "FROM (SELECT number FROM numbers(10) ORDER BY number)") \
        == ([0, 3, 6, 9],)


def test_arg_min_unsupported_base_named_error(spark):
    from clickhouse_from_scratch_spark.plans.builder import BuildError
    with pytest.raises(BuildError, match="ArgMin"):
        execute_sql(spark, "SELECT corrArgMin(number, number, number) "
                    "FROM numbers(5)", {}).collect()


def test_count_map(spark):
    assert one(spark, "SELECT countMap(m) AS r FROM (SELECT arrayJoin("
               "[map('a', 1), map('a', 2), map('b', 9)]) AS m)") \
        == ({"a": 2, "b": 1},)


def test_avg_uniq_any_map(spark):
    assert one(spark, "SELECT avgMap(m) AS r FROM (SELECT arrayJoin("
               "[map('a', 1), map('a', 3)]) AS m)") == ({"a": 2.0},)
    assert one(spark, "SELECT uniqMap(m) AS r FROM (SELECT arrayJoin("
               "[map('a', 1), map('a', 1), map('a', 2)]) AS m)") \
        == ({"a": 2},)
    assert one(spark, "SELECT anyMap(m) AS r FROM (SELECT arrayJoin("
               "[map('a', 7)]) AS m)") == ({"a": 7},)


def test_count_map_two_array_form(spark):
    assert one(spark, "SELECT countMap(['x','y'], [1, 2]) AS r "
               "FROM numbers(3)") == ({"x": 3, "y": 3},)


def test_initialize_aggregation(spark):
    assert one(spark, "SELECT finalizeAggregation("
               "initializeAggregation('sumState', 3)) AS r") == (3,)
    assert one(spark, "SELECT initializeAggregation('countState', 5) "
               "AS r") == (1,)
    assert one(spark, "SELECT initializeAggregation('groupArrayState', "
               "8) AS r") == ([8],)
