"""Window-frame × combinator matrix (round-8 probe sweep → pins).

CH lets ANY aggregate act as a window function; composite lowerings
(uniq null-flag, -OrNull count gate, sorted-collect quantiles,
parametric groupArray slices) need .over applied per aggregate LEAF —
pinned here end to end. Empty frames take the empty-set defaults
(sum→0, avg→nan, -OrNull→NULL), same rule as the -If empty-subset."""

from __future__ import annotations

import math

from clickhouse_from_scratch_spark.plans.engine import execute_sql


def rows(spark, sql):
    return [tuple(r) for r in execute_sql(spark, sql, {}).collect()]


def test_sum_if_rows_frame(spark):
    assert rows(spark, "SELECT number, sumIf(number, number % 2 = 0) "
                "OVER (ORDER BY number ROWS BETWEEN 1 PRECEDING AND "
                "CURRENT ROW) AS r FROM numbers(4) ORDER BY number") \
        == [(0, 0), (1, 0), (2, 2), (3, 2)]


def test_empty_frame_sum_default_zero(spark):
    assert rows(spark, "SELECT number, sum(number) OVER (ORDER BY number "
                "ROWS BETWEEN 2 FOLLOWING AND 3 FOLLOWING) AS r "
                "FROM numbers(4) ORDER BY number") \
        == [(0, 5), (1, 3), (2, 0), (3, 0)]


def test_empty_frame_avg_if_nan(spark):
    got = rows(spark, "SELECT number, avgIf(number, number < 0) OVER "
               "(ORDER BY number ROWS BETWEEN 1 PRECEDING AND CURRENT "
               "ROW) AS r FROM numbers(2) ORDER BY number")
    assert all(math.isnan(r[1]) for r in got)


def test_sum_or_null_empty_frame_null(spark):
    assert rows(spark, "SELECT number, sumOrNull(number) OVER (ORDER BY "
                "number ROWS BETWEEN 2 FOLLOWING AND 3 FOLLOWING) AS r "
                "FROM numbers(3) ORDER BY number") \
        == [(0, 2), (1, None), (2, None)]


def test_avg_or_null_if_window(spark):
    assert rows(spark, "SELECT number, avgOrNullIf(number, number < 0) "
                "OVER (ORDER BY number) AS r FROM numbers(2) "
                "ORDER BY number") == [(0, None), (1, None)]


def test_uniq_exact_window_counts_null(spark):
    assert rows(spark, "SELECT number, uniqExact(nullIf(number, 0)) OVER "
                "(ORDER BY number ROWS UNBOUNDED PRECEDING) AS r "
                "FROM numbers(3) ORDER BY number") \
        == [(0, 1), (1, 2), (2, 3)]


def test_uniq_exact_if_window(spark):
    assert rows(spark, "SELECT number, uniqExactIf(number % 2, "
                "number > 0) OVER (ORDER BY number ROWS UNBOUNDED "
                "PRECEDING) AS r FROM numbers(4) ORDER BY number") \
        == [(0, 0), (1, 1), (2, 2), (3, 2)]


def test_parametric_group_array_window(spark):
    assert rows(spark, "SELECT number, groupArray(2)(number) OVER "
                "(ORDER BY number ROWS UNBOUNDED PRECEDING) AS r "
                "FROM numbers(4) ORDER BY number") \
        == [(0, [0]), (1, [0, 1]), (2, [0, 1]), (3, [0, 1])]


def test_parametric_group_array_if_window(spark):
    assert rows(spark, "SELECT number, groupArrayIf(2)(number, "
                "number > 0) OVER (ORDER BY number ROWS UNBOUNDED "
                "PRECEDING) AS r FROM numbers(4) ORDER BY number") \
        == [(0, []), (1, [1]), (2, [1, 2]), (3, [1, 2])]


def test_quantile_exact_parametric_window(spark):
    # nearest-rank-high exact median over a growing frame
    assert rows(spark, "SELECT number, quantileExact(0.5)(number) OVER "
                "(ORDER BY number ROWS UNBOUNDED PRECEDING) AS r "
                "FROM numbers(4) ORDER BY number") \
        == [(0, 0), (1, 1), (2, 1), (3, 2)]


def test_range_frame_sum_if(spark):
    assert rows(spark, "SELECT number, sumIf(number, number != 1) OVER "
                "(ORDER BY number RANGE BETWEEN 1 PRECEDING AND CURRENT "
                "ROW) AS r FROM numbers(4) ORDER BY number") \
        == [(0, 0), (1, 0), (2, 2), (3, 5)]


def test_group_array_plain_window(spark):
    assert rows(spark, "SELECT number, groupArray(number) OVER (ORDER BY "
                "number ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS r "
                "FROM numbers(3) ORDER BY number") \
        == [(0, [0]), (1, [0, 1]), (2, [1, 2])]


def test_plain_aggregates_window_unchanged(spark):
    assert rows(spark, "SELECT number, sum(number) OVER (ORDER BY number "
                "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS r "
                "FROM numbers(3) ORDER BY number") \
        == [(0, 0), (1, 1), (2, 3)]
    assert rows(spark, "SELECT number, count() OVER (ORDER BY number) "
                "AS r FROM numbers(3) ORDER BY number") \
        == [(0, 1), (1, 2), (2, 3)]


def test_empty_over_ranking_and_aggregates(spark):
    # OVER () works for every function: ranking gets a surrogate order,
    # aggregates keep the whole-partition window
    assert rows(spark, "SELECT count(DISTINCT r) AS c FROM (SELECT "
                "row_number() OVER () AS r FROM numbers(5))") == [(5,)]
    assert rows(spark, "SELECT sum(number) OVER () AS r FROM numbers(3) "
                "LIMIT 1") == [(3,)]
    assert rows(spark, "SELECT uniqExact(number % 2) OVER () AS r "
                "FROM numbers(4) LIMIT 1") == [(2,)]


def test_non_negative_derivative(spark):
    assert rows(spark, "SELECT round(nonNegativeDerivative(v, t, "
                "INTERVAL 1 MINUTE) OVER (ORDER BY t), 1) AS r FROM "
                "(SELECT toDateTime('2024-01-01 00:00:00') + INTERVAL "
                "number SECOND AS t, toFloat64(number) AS v FROM "
                "numbers(3)) ORDER BY r") == [(0.0,), (60.0,), (60.0,)]


def test_windowed_moving_sum_and_argmax(spark):
    # single-leaf composites (one windowed collect fed to a HOF) work
    assert rows(spark, "SELECT number, groupArrayMovingSum(number) OVER "
                "(ORDER BY number ROWS BETWEEN 1 PRECEDING AND CURRENT "
                "ROW) AS r FROM numbers(3) ORDER BY number") \
        == [(0, [0]), (1, [0, 1]), (2, [1, 3])]
    assert rows(spark, "SELECT number, argMax(number, number % 3) OVER "
                "(ORDER BY number ROWS UNBOUNDED PRECEDING) AS r "
                "FROM numbers(5) ORDER BY number") \
        == [(0, 0), (1, 1), (2, 2), (3, 2), (4, 2)]


def test_windowed_composites_next_to_bare_columns(spark):
    """Window expressions materialize in their own projection stage, so
    a composite window aggregate next to a bare column of a referenced
    name no longer trips Spark's LATERAL_COLUMN_ALIAS_IN_WINDOW rule —
    topK/sumMap/-ArgMin all work in window position."""
    assert rows(spark, "SELECT number, topK(2)(number % 3) OVER (ORDER "
                "BY number ROWS UNBOUNDED PRECEDING) AS r FROM "
                "numbers(4) ORDER BY number") \
        == [(0, [0]), (1, [0, 1]), (2, [0, 1]), (3, [0, 1])]
    assert rows(spark, "SELECT number, sumArgMin(number, number % 2) "
                "OVER (ORDER BY number ROWS UNBOUNDED PRECEDING) AS r "
                "FROM numbers(4) ORDER BY number") \
        == [(0, 0), (1, 0), (2, 2), (3, 2)]


def test_constructors_restored_after_window_build(spark):
    # the scoped patch must not leak: a plain aggregate built right
    # after a window query is NOT windowed
    rows(spark, "SELECT sumOrNull(number) OVER (ORDER BY number) AS r "
         "FROM numbers(3)")
    assert rows(spark, "SELECT sum(number) AS s FROM numbers(3)") == [(3,)]
