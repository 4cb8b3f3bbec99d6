"""Settings-namespace honesty (r11): SET validates names against the
reference's 472-setting namespace (``src/Core/Settings.h``), raises on
pinned behavior-bearing settings at non-default values, and the newly
honored settings observably change results — join_default_strictness
(Settings.h:226), union_default_mode (:491), limit/offset (:501-502),
count_distinct_implementation (:210), join_any_take_last_row (:332).
"""

import pytest

from clickhouse_from_scratch_spark.ddl import ChSession, _SETTING_DEFAULTS
from clickhouse_from_scratch_spark.plans.builder import _PINNED_AT_DEFAULT
from clickhouse_from_scratch_spark.settings_namespace import (
    KNOWN_SETTINGS,
    OBSOLETE_SETTINGS,
    REFERENCE_DEFAULTS,
)


@pytest.fixture()
def sess(spark, tmp_path):
    s = ChSession(spark, warehouse=str(tmp_path / "wh"))
    s.execute("CREATE TABLE jt1 (k Int32, v Int32) ENGINE = Memory")
    s.execute("CREATE TABLE jt2 (k Int32, w Int32) ENGINE = Memory")
    s.execute("INSERT INTO jt1 VALUES (1, 10), (2, 20)")
    s.execute("INSERT INTO jt2 VALUES (1, 100), (1, 200), (2, 300)")
    return s


# --- namespace validation ---------------------------------------------------

def test_namespace_size_matches_reference():
    # 471 live common/format names plus the 13 MAKE_OBSOLETE names the
    # reference still accepts as no-ops (src/Core/Settings.h:539-556)
    assert len(OBSOLETE_SETTINGS) == 13
    assert len(KNOWN_SETTINGS) == 473 + 13  # +2 r12: format_template_{row,resultset}_format
    assert OBSOLETE_SETTINGS <= KNOWN_SETTINGS
    # the MAKE_OBSOLETE macro definition's placeholder must not leak in
    assert "NAME" not in KNOWN_SETTINGS


def test_obsolete_settings_accepted_as_noops(sess):
    # the reference keeps obsolete names settable (BaseSettings applies
    # them; nothing reads them)
    sess.execute("SET max_memory_usage_for_all_queries = 100")
    sess.execute("SET allow_experimental_window_functions = 0")
    sess.execute("SELECT 1 SETTINGS allow_experimental_map_type = 1").collect()


def test_normalized_reference_defaults():
    # C++ macro constants are normalized to their published values
    # (Defines.h:79) and escape sequences stored as the real characters
    assert REFERENCE_DEFAULTS["query_profiler_cpu_time_period_ns"] == "1000000000"
    assert REFERENCE_DEFAULTS["query_profiler_real_time_period_ns"] == "1000000000"
    assert REFERENCE_DEFAULTS["format_csv_null_representation"] == "\\N"
    assert REFERENCE_DEFAULTS["format_tsv_null_representation"] == "\\N"
    assert len(REFERENCE_DEFAULTS["format_csv_null_representation"]) == 2


def test_unknown_setting_raises(sess):
    with pytest.raises(Exception, match="UNKNOWN_SETTING"):
        sess.execute("SET totally_made_up_setting = 1")


def test_unknown_setting_in_settings_suffix_raises(sess):
    with pytest.raises(Exception, match="UNKNOWN_SETTING"):
        sess.execute("SELECT 1 SETTINGS not_a_real_knob = 1").collect()


def test_known_setting_accepted(sess):
    # a known, non-behavior-bearing infrastructure knob is accepted
    sess.execute("SET max_threads = 8")


def test_engine_extras_accepted(sess):
    # engine-honored settings from newer public CH than the reference
    sess.execute("SET splitby_max_substrings_includes_remaining_string = 0")
    sess.execute("SET max_dictionary_rows = 1000000")


def test_every_pinned_setting_raises_at_non_default(sess):
    flipped = {"0": "1", "1": "0"}
    for name, dflt in _PINNED_AT_DEFAULT.items():
        bad = flipped.get(dflt, "1")
        with pytest.raises(Exception, match="non-default"):
            sess.execute(f"SET {name} = {bad}")
        # at the default value the SET is accepted
        sess.execute(f"SET {name} = {dflt}")


def test_extremes_block(sess):
    # SET extremes = 1 emits a separate two-row min/max block (honored
    # since r11; it was a silent no-op before)
    sess.execute("SET extremes = 1")
    df = sess.execute("SELECT k, w FROM jt2 ORDER BY w")
    ext = getattr(df, "_ch_extremes_df", None)
    assert ext is not None
    rows = [(r.k, r.w) for r in ext.collect()]
    assert rows == [(1, 100), (2, 300)]    # per-column min row, max row
    # main result rows do NOT contain the extremes
    assert len(df.collect()) == 3
    sess.execute("SET extremes = 0")
    df2 = sess.execute("SELECT k FROM jt2")
    assert getattr(df2, "_ch_extremes_df", None) is None


def test_extremes_pretty_render(sess):
    from clickhouse_from_scratch_spark.sources.formats import to_pretty
    sess.execute("SET extremes = 1")
    text = to_pretty(sess.execute("SELECT k, w FROM jt2 ORDER BY w"))
    assert "Extremes:" in text
    sess.execute("SET extremes = 0")


def test_honored_settings_are_known():
    # every honored/pinned name must be a real settings-namespace name
    # (the two engine extras come from newer public ClickHouse)
    extras = {"splitby_max_substrings_includes_remaining_string",
              "max_dictionary_rows"}
    for name in list(_SETTING_DEFAULTS) + list(_PINNED_AT_DEFAULT):
        assert name in KNOWN_SETTINGS or name in extras, name


# --- join_default_strictness -------------------------------------------------

def test_bare_join_default_all(sess):
    rows = sess.execute(
        "SELECT v, w FROM jt1 JOIN jt2 ON jt1.k = jt2.k").collect()
    assert len(rows) == 3          # ALL multiplicity


def test_bare_join_any_via_set(sess):
    sess.execute("SET join_default_strictness = 'ANY'")
    rows = sess.execute(
        "SELECT v, w FROM jt1 JOIN jt2 ON jt1.k = jt2.k").collect()
    assert len(rows) == 2          # one right match per left row
    assert sorted((r.v, r.w) for r in rows) == [(10, 100), (20, 300)]


def test_explicit_all_overrides_any_default(sess):
    sess.execute("SET join_default_strictness = 'ANY'")
    rows = sess.execute(
        "SELECT v, w FROM jt1 ALL JOIN jt2 ON jt1.k = jt2.k").collect()
    assert len(rows) == 3


def test_empty_strictness_makes_bare_join_error(sess):
    sess.execute("SET join_default_strictness = ''")
    with pytest.raises(Exception, match="strictness"):
        sess.execute(
            "SELECT v, w FROM jt1 JOIN jt2 ON jt1.k = jt2.k").collect()
    # explicit forms still work
    rows = sess.execute(
        "SELECT v, w FROM jt1 ANY JOIN jt2 ON jt1.k = jt2.k").collect()
    assert len(rows) == 2


def test_bare_join_any_via_settings_suffix(sess):
    rows = sess.execute(
        "SELECT v, w FROM jt1 JOIN jt2 ON jt1.k = jt2.k "
        "SETTINGS join_default_strictness = 'ANY'").collect()
    assert len(rows) == 2


def test_join_any_take_last_row(sess):
    first = sess.execute(
        "SELECT w FROM jt1 ANY JOIN jt2 USING (k) WHERE k = 1").collect()
    last = sess.execute(
        "SELECT w FROM jt1 ANY JOIN jt2 USING (k) WHERE k = 1 "
        "SETTINGS join_any_take_last_row = 1").collect()
    assert [r.w for r in first] == [100]
    assert [r.w for r in last] == [200]


# --- union_default_mode -------------------------------------------------------

def test_bare_union_raises_by_default(sess):
    with pytest.raises(Exception, match="EXPECTED_ALL_OR_DISTINCT"):
        sess.execute("SELECT 1 AS x UNION SELECT 2 AS x").collect()


def test_union_default_mode_distinct(sess):
    sess.execute("SET union_default_mode = 'DISTINCT'")
    rows = sess.execute(
        "SELECT 1 AS x UNION SELECT 1 AS x UNION SELECT 2 AS x").collect()
    assert sorted(r.x for r in rows) == [1, 2]


def test_union_default_mode_all_via_suffix(sess):
    rows = sess.execute(
        "SELECT 1 AS x UNION SELECT 1 AS x "
        "SETTINGS union_default_mode = 'ALL'").collect()
    assert sorted(r.x for r in rows) == [1, 1]


def test_explicit_union_all_unaffected(sess):
    rows = sess.execute("SELECT 1 AS x UNION ALL SELECT 1 AS x").collect()
    assert len(rows) == 2


# --- limit / offset settings ---------------------------------------------------

def test_limit_offset_settings(sess):
    rows = sess.execute(
        "SELECT number FROM numbers(10) "
        "SETTINGS limit = 3, offset = 2").collect()
    assert [r.number for r in rows] == [2, 3, 4]


def test_limit_setting_on_top_of_query_limit(sess):
    rows = sess.execute(
        "SELECT number FROM numbers(10) ORDER BY number LIMIT 5 "
        "SETTINGS limit = 2").collect()
    assert [r.number for r in rows] == [0, 1]


# --- count_distinct_implementation --------------------------------------------

def test_count_distinct_implementation_uniq(sess):
    # at small cardinality the sketch is exact → values comparable
    exact = sess.execute(
        "SELECT count(DISTINCT k) AS c FROM jt2").collect()[0].c
    approx = sess.execute(
        "SELECT count(DISTINCT k) AS c FROM jt2 "
        "SETTINGS count_distinct_implementation = 'uniq'").collect()[0].c
    assert exact == 2 and approx == 2


def test_count_distinct_implementation_bad_name(sess):
    with pytest.raises(Exception, match="uniq-family"):
        sess.execute(
            "SELECT count(DISTINCT k) AS c FROM jt2 "
            "SETTINGS count_distinct_implementation = 'sum'").collect()
