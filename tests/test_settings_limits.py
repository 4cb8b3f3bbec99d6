"""Resource-limit knobs: max_rows_* + *_overflow_mode.

The reference declares these in its 472-setting namespace
(/root/reference/src/Core/Settings.h:280 max_rows_to_read, :288-289
max_rows_to_group_by/group_by_overflow_mode, :299 max_result_rows,
:345 max_rows_in_distinct); public CH semantics: 'throw' fails the
query (TOO_MANY_ROWS), 'break' returns a truncated partial result,
0 = unlimited.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from clickhouse_from_scratch_spark.plans import execute_sql
from clickhouse_from_scratch_spark.plans.builder import (
    BuildError,
    QueryLimitExceeded,
)


@pytest.fixture(scope="module")
def t(spark):
    return {"t": spark.createDataFrame(
        [(i, i % 5, f"g{i % 10}") for i in range(100)],
        "id int, mod5 int, grp string")}


def run(spark, t, sql, **settings):
    return execute_sql(spark, sql, t, settings=settings)


# --- max_result_rows --------------------------------------------------------

def test_result_rows_throw(spark, t):
    with pytest.raises(QueryLimitExceeded, match="max_result_rows"):
        run(spark, t, "SELECT id FROM t", max_result_rows=10).collect()


def test_result_rows_break_truncates(spark, t):
    df = run(spark, t, "SELECT id FROM t ORDER BY id",
             max_result_rows=10, result_overflow_mode="break")
    assert [r.id for r in df.collect()] == list(range(10))


def test_result_rows_under_cap_passes(spark, t):
    df = run(spark, t, "SELECT id FROM t LIMIT 7", max_result_rows=10)
    assert df.count() == 7


def test_result_rows_zero_is_unlimited(spark, t):
    assert run(spark, t, "SELECT id FROM t", max_result_rows=0).count() == 100


def test_result_rows_settings_suffix(spark, t):
    # the SETTINGS clause form reaches the same knob
    with pytest.raises(QueryLimitExceeded):
        run(spark, t,
            "SELECT id FROM t SETTINGS max_result_rows = 10").collect()


# --- max_rows_to_group_by ---------------------------------------------------

def test_group_by_throw(spark, t):
    with pytest.raises(QueryLimitExceeded, match="max_rows_to_group_by"):
        run(spark, t, "SELECT grp, count() FROM t GROUP BY grp",
            max_rows_to_group_by=5).collect()


def test_group_by_break_partial(spark, t):
    df = run(spark, t, "SELECT grp, count() AS c FROM t GROUP BY grp",
             max_rows_to_group_by=5, group_by_overflow_mode="break")
    rows = df.collect()
    assert len(rows) == 5
    assert all(r.c == 10 for r in rows)   # kept groups are fully aggregated


def test_group_by_under_cap(spark, t):
    df = run(spark, t, "SELECT mod5, count() FROM t GROUP BY mod5",
             max_rows_to_group_by=5)
    assert df.count() == 5


def test_group_by_any_mode_raises_not_silently_degrades(spark, t):
    with pytest.raises(BuildError, match="group_by_overflow_mode"):
        run(spark, t, "SELECT grp, count() FROM t GROUP BY grp",
            max_rows_to_group_by=5, group_by_overflow_mode="any").collect()


# --- max_rows_in_distinct ---------------------------------------------------

def test_distinct_throw(spark, t):
    with pytest.raises(QueryLimitExceeded, match="max_rows_in_distinct"):
        run(spark, t, "SELECT DISTINCT grp FROM t",
            max_rows_in_distinct=5).collect()


def test_distinct_break(spark, t):
    df = run(spark, t, "SELECT DISTINCT grp FROM t",
             max_rows_in_distinct=5, distinct_overflow_mode="break")
    assert df.count() == 5


# --- max_rows_to_read -------------------------------------------------------

def test_read_throw(spark, t):
    with pytest.raises(QueryLimitExceeded, match="max_rows_to_read"):
        run(spark, t, "SELECT count() FROM t", max_rows_to_read=50).collect()


def test_read_under_cap(spark, t):
    df = run(spark, t, "SELECT count() AS c FROM t", max_rows_to_read=100)
    assert df.collect()[0].c == 100


def test_read_break_truncates_scan(spark, t):
    df = run(spark, t, "SELECT count() AS c FROM t",
             max_rows_to_read=30, read_overflow_mode="break")
    assert df.collect()[0].c == 30


def test_read_budget_is_query_wide(spark, t):
    # self-join scans the table twice: 100 + 100 > 150 even though each
    # single scan fits
    with pytest.raises(QueryLimitExceeded, match="max_rows_to_read"):
        run(spark, t,
            "SELECT count() FROM t AS a INNER JOIN t AS b USING (id)",
            max_rows_to_read=150).collect()


# --- max_rows_to_sort -------------------------------------------------------

def test_sort_throw(spark, t):
    with pytest.raises(QueryLimitExceeded, match="max_rows_to_sort"):
        run(spark, t, "SELECT id FROM t ORDER BY id",
            max_rows_to_sort=50).collect()


def test_sort_break_sorts_partial(spark, t):
    df = run(spark, t, "SELECT id FROM t ORDER BY id",
             max_rows_to_sort=50, sort_overflow_mode="break")
    assert df.count() == 50


def test_sort_under_cap(spark, t):
    assert run(spark, t, "SELECT id FROM t ORDER BY id",
               max_rows_to_sort=100).count() == 100


# --- max_rows_to_read over GENERATOR sources (r11) ---------------------------

def test_numbers_metered_throw(spark, t):
    # CH counts generated rows as reads too (numbers/zeros/generateRandom)
    with pytest.raises(QueryLimitExceeded, match="max_rows_to_read"):
        run(spark, t, "SELECT count() AS c FROM numbers(10)",
            max_rows_to_read=5).collect()


def test_numbers_metered_break(spark, t):
    df = run(spark, t, "SELECT count() AS c FROM numbers(10)",
             max_rows_to_read=5, read_overflow_mode="break")
    assert df.collect()[0].c == 5


def test_numbers_under_cap(spark, t):
    df = run(spark, t, "SELECT count() AS c FROM numbers(5)",
             max_rows_to_read=5)
    assert df.collect()[0].c == 5


def test_zeros_metered(spark, t):
    with pytest.raises(QueryLimitExceeded, match="max_rows_to_read"):
        run(spark, t, "SELECT count() AS c FROM zeros(9)",
            max_rows_to_read=5).collect()


def test_numbers_two_arg_metered(spark, t):
    with pytest.raises(QueryLimitExceeded, match="max_rows_to_read"):
        run(spark, t, "SELECT count() AS c FROM numbers(100, 50)",
            max_rows_to_read=20).collect()
