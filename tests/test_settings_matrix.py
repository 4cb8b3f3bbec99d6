"""Settings-behavior matrix (r11 verdict item): EVERY name the engine
advertises as honored (_SETTING_DEFAULTS) has an observable effect
asserted here, and every pinned name (_PINNED_AT_DEFAULT) raises at a
non-default value. A coverage check fails this file when a new setting
is added without a matrix entry — no setting can silently become a
no-op again.
"""

import pytest

from clickhouse_from_scratch_spark.ddl import ChSession, _SETTING_DEFAULTS
from clickhouse_from_scratch_spark.plans import execute_sql
from clickhouse_from_scratch_spark.plans.builder import (
    _PINNED_AT_DEFAULT,
    QueryLimitExceeded,
)


def run(spark, sql, tables=None, **settings):
    return execute_sql(spark, sql, tables or {}, settings=settings)


@pytest.fixture(scope="module")
def t(spark):
    return {"t": spark.createDataFrame(
        [(i, i % 3, f"g{i % 2}") for i in range(30)],
        "id int, mod3 int, grp string"),
        "l": spark.createDataFrame([(1, 10)], "k int, v int"),
        "r": spark.createDataFrame([(1, 100), (1, 200)], "k int, w int")}


# one observable-effect assertion per honored setting ----------------------

def test_effect_join_use_nulls(spark, t):
    dflt = run(spark, "SELECT w FROM l LEFT JOIN r ON l.k = r.k + 5",
               t).collect()
    nulls = run(spark, "SELECT w FROM l LEFT JOIN r ON l.k = r.k + 5",
                t, join_use_nulls=1).collect()
    assert dflt[0].w == 0 and nulls[0].w is None


def test_effect_join_algorithm(spark, t):
    plan = run(spark, "SELECT v, w FROM l JOIN r ON l.k = r.k", t,
               join_algorithm="'partial_merge'") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan


def test_effect_totals_mode(spark, t):
    q = ("SELECT grp, sum(id) AS s FROM t GROUP BY grp WITH TOTALS "
         "HAVING s > 1000")
    before = run(spark, q, t, totals_mode="before_having").collect()
    after = run(spark, q, t).collect()
    # zero groups pass: before_having totals = all rows, after = default
    assert before[-1].s == sum(range(30)) and after[-1].s == 0


def test_effect_splitby_remaining(spark):
    a = run(spark, "SELECT splitByChar(',', 'a,b,c', 2) AS r").collect()
    b = run(spark, "SELECT splitByChar(',', 'a,b,c', 2) AS r",
            splitby_max_substrings_includes_remaining_string=1).collect()
    assert list(a[0].r) == ["a", "b"] and list(b[0].r) == ["a", "b,c"]


def test_effect_max_result_rows(spark, t):
    with pytest.raises(QueryLimitExceeded, match="max_result_rows"):
        run(spark, "SELECT id FROM t", t, max_result_rows=5).collect()
    assert run(spark, "SELECT id FROM t", t, max_result_rows=5,
               result_overflow_mode="'break'").count() == 5


def test_effect_max_rows_to_read(spark, t):
    with pytest.raises(QueryLimitExceeded, match="max_rows_to_read"):
        run(spark, "SELECT count() FROM t", t,
            max_rows_to_read=5).collect()
    assert run(spark, "SELECT count() AS c FROM t", t, max_rows_to_read=5,
               read_overflow_mode="'break'").collect()[0].c == 5


def test_effect_max_rows_to_group_by(spark, t):
    with pytest.raises(QueryLimitExceeded, match="max_rows_to_group_by"):
        run(spark, "SELECT mod3, count() FROM t GROUP BY mod3", t,
            max_rows_to_group_by=2).collect()
    assert run(spark, "SELECT mod3, count() AS c FROM t GROUP BY mod3",
               t, max_rows_to_group_by=2,
               group_by_overflow_mode="'break'").count() == 2


def test_effect_max_rows_in_distinct(spark, t):
    with pytest.raises(QueryLimitExceeded, match="max_rows_in_distinct"):
        run(spark, "SELECT DISTINCT id FROM t", t,
            max_rows_in_distinct=5).collect()
    assert run(spark, "SELECT DISTINCT id FROM t", t,
               max_rows_in_distinct=5,
               distinct_overflow_mode="'break'").count() == 5


def test_effect_max_dictionary_rows(spark, tmp_path):
    s = ChSession(spark, warehouse=str(tmp_path / "wh"))
    s.execute("CREATE TABLE src (k Int64, v String) ENGINE = Memory")
    s.execute("INSERT INTO src VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    s.execute("SET max_dictionary_rows = 2")
    s.execute("CREATE DICTIONARY d (k Int64, v String) PRIMARY KEY k "
              "SOURCE(CLICKHOUSE(TABLE 'src')) LAYOUT(HASHED()) "
              "LIFETIME(300)")
    with pytest.raises(Exception, match="max_dictionary_rows|rows"):
        s.execute("SELECT dictGetString('d', 'v', toUInt64(1))").collect()


def test_effect_join_default_strictness(spark, t):
    assert run(spark, "SELECT w FROM l JOIN r USING (k)", t).count() == 2
    assert run(spark, "SELECT w FROM l JOIN r USING (k)", t,
               join_default_strictness="'ANY'").count() == 1


def test_effect_union_default_mode(spark):
    with pytest.raises(Exception, match="EXPECTED_ALL_OR_DISTINCT"):
        run(spark, "SELECT 1 AS x UNION SELECT 1 AS x").collect()
    assert run(spark, "SELECT 1 AS x UNION SELECT 1 AS x",
               union_default_mode="'ALL'").count() == 2


def test_effect_limit_offset(spark, t):
    rows = run(spark, "SELECT id FROM t ORDER BY id", t,
               limit=3, offset=2).collect()
    assert [r.id for r in rows] == [2, 3, 4]


def test_effect_count_distinct_implementation(spark, t):
    assert run(spark, "SELECT count(DISTINCT mod3) AS c FROM t", t,
               count_distinct_implementation="'uniq'") \
        .collect()[0].c == 3


def test_effect_join_any_take_last_row(spark, t):
    first = run(spark, "SELECT w FROM l ANY JOIN r USING (k)",
                t).collect()[0].w
    last = run(spark, "SELECT w FROM l ANY JOIN r USING (k)", t,
               join_any_take_last_row=1).collect()[0].w
    assert (first, last) == (100, 200)


def test_effect_extremes(spark, t):
    df = run(spark, "SELECT id FROM t", t, extremes=1)
    ext = getattr(df, "_ch_extremes_df", None)
    assert ext is not None
    vals = [r.id for r in ext.collect()]
    assert vals == [0, 29]


# pinned settings raise ------------------------------------------------------

def test_every_pinned_name_raises(spark):
    flipped = {"0": "1", "1": "0", "raw": "Escaped"}
    for name, dflt in _PINNED_AT_DEFAULT.items():
        with pytest.raises(Exception, match="non-default"):
            execute_sql(spark, "SELECT 1", {},
                        settings={name: flipped.get(dflt, "1")}).collect()


# coverage: every advertised name has a matrix entry ------------------------

# names asserted above, or asserted as one *_overflow_mode pair with
# their max_* partner
_COVERED = {
    "join_use_nulls", "join_algorithm", "totals_mode",
    "splitby_max_substrings_includes_remaining_string",
    "max_result_rows", "result_overflow_mode",
    "max_rows_to_read", "read_overflow_mode",
    "max_rows_to_group_by", "group_by_overflow_mode",
    "max_rows_in_distinct", "distinct_overflow_mode",
    "max_dictionary_rows",
    "join_default_strictness", "union_default_mode",
    "limit", "offset", "count_distinct_implementation",
    "join_any_take_last_row", "extremes",
}


def test_every_advertised_setting_is_asserted():
    advertised = set(_SETTING_DEFAULTS)
    pinned = set(_PINNED_AT_DEFAULT)
    unasserted = advertised - _COVERED - pinned
    assert unasserted == set(), (
        f"settings advertised as honored but without a matrix "
        f"assertion: {sorted(unasserted)}")
