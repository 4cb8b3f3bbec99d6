"""r11 behavior pins — divergence-shaped behaviors verified against the
reference this round; pinned so a future "fix" does not overshoot what
the reference actually does.
"""

import pytest

from clickhouse_from_scratch_spark.plans.parser import ParseError, parse


def test_offset_fetch_requires_order_by_pin():
    """The reference's OFFSET-FETCH grammar lives inside the ORDER BY
    branch (ParserSelectQuery.cpp:325-328), and FETCH is absent from the
    restricted-keywords alias list (ExpressionElementParsers.cpp:1701-
    1741) — so in a bare FROM, `FETCH` is eaten as a table alias and the
    rest fails to parse. With ORDER BY, OFFSET-FETCH parses fine."""
    q = parse("SELECT a FROM t ORDER BY a "
              "OFFSET 2 ROWS FETCH FIRST 3 ROWS ONLY")
    assert q.limit == 3 and q.offset == 2
    q2 = parse("SELECT a FROM t ORDER BY a FETCH FIRST 3 ROWS ONLY")
    assert q2.limit == 3
    with pytest.raises(ParseError):
        parse("SELECT a FROM t FETCH FIRST 3 ROWS ONLY")


def test_bare_from_fetch_is_alias_pin():
    # `FROM t FETCH` alone: FETCH becomes the table alias, exactly like
    # any non-restricted identifier
    q = parse("SELECT a FROM t FETCH")
    assert q.from_.alias == "FETCH"


def test_numbers_generator_metered_pin(spark):
    """max_rows_to_read meters generator rows (r11): CH counts
    numbers() reads toward the budget, not only named-table scans."""
    from clickhouse_from_scratch_spark.plans import execute_sql
    from clickhouse_from_scratch_spark.plans.builder import \
        QueryLimitExceeded
    with pytest.raises(QueryLimitExceeded):
        execute_sql(spark, "SELECT count() FROM numbers(10)", {},
                    settings={"max_rows_to_read": 5}).collect()


def test_intersect_tighter_than_union_still_holds(spark):
    # the r10 precedence fix must survive the r11 bare-UNION change
    from clickhouse_from_scratch_spark.plans import execute_sql
    rows = execute_sql(
        spark,
        "SELECT 1 AS x UNION ALL SELECT 2 AS x INTERSECT SELECT 2 AS x",
        {}).collect()
    assert sorted(r.x for r in rows) == [1, 2]


def test_insert_settings_clause(spark, tmp_path):
    from clickhouse_from_scratch_spark.ddl import ChSession
    s = ChSession(spark, warehouse=str(tmp_path / "wh"))
    s.execute("CREATE TABLE ist (a Int32) ENGINE = Memory")
    s.execute("INSERT INTO ist SETTINGS max_threads = 4 VALUES (1), (2)")
    assert sorted(r.a for r in
                  s.execute("SELECT a FROM ist").collect()) == [1, 2]
    with pytest.raises(Exception, match="UNKNOWN_SETTING"):
        s.execute("INSERT INTO ist SETTINGS made_up = 1 VALUES (3)")
    # statement-scoped: the session dict is not mutated
    assert "max_threads" not in s.settings


def test_get_setting_falls_back_to_defaults(spark):
    from clickhouse_from_scratch_spark.plans import execute_sql
    # known names return their reference default without a SET
    assert execute_sql(spark, "SELECT getSetting('max_threads') AS r",
                       {}).collect()[0].r == 0
    assert execute_sql(
        spark, "SELECT getSetting('count_distinct_implementation') AS r",
        {}).collect()[0].r == "uniqExact"
    with pytest.raises(Exception, match="UNKNOWN_SETTING"):
        execute_sql(spark, "SELECT getSetting('not_a_setting')",
                    {}).collect()


def test_describe_show_with_format_suffix(spark, tmp_path):
    from clickhouse_from_scratch_spark.ddl import ChSession
    s = ChSession(spark, warehouse=str(tmp_path / "wh"))
    s.execute("CREATE TABLE fmt_t (a Int32, b String) ENGINE = Memory")
    tsv = [r[0] for r in s.execute("DESCRIBE fmt_t FORMAT TSV").collect()]
    assert tsv[0].startswith("a\tInt32")
    vert = [r[0] for r in
            s.execute("SHOW CREATE TABLE fmt_t FORMAT Vertical").collect()]
    assert vert[0] == "Row 1:"


def test_explain_estimate_shape(spark, tmp_path):
    # CH contract: one row per scanned table with
    # database/table/parts/rows/marks (8192-granularity marks)
    from clickhouse_from_scratch_spark.ddl import ChSession
    s = ChSession(spark, warehouse=str(tmp_path / "wh"))
    s.execute("CREATE TABLE est (a Int32) ENGINE = Memory")
    s.execute("INSERT INTO est VALUES (1), (2), (3)")
    rows = s.execute("EXPLAIN ESTIMATE SELECT a FROM est").collect()
    assert rows[0].asDict() == {"database": "default", "table": "est",
                                "parts": 1, "rows": 3, "marks": 1}


def test_truncate_if_exists(spark, tmp_path):
    from clickhouse_from_scratch_spark.ddl import ChSession
    s = ChSession(spark, warehouse=str(tmp_path / "wh"))
    s.execute("TRUNCATE TABLE IF EXISTS nope_not_there")   # no raise
    s.execute("CREATE TABLE tr (a Int32) ENGINE = Memory")
    s.execute("INSERT INTO tr VALUES (1)")
    s.execute("TRUNCATE TABLE IF EXISTS tr")
    assert s.execute("SELECT count() AS c FROM tr").collect()[0].c == 0
    with pytest.raises(Exception):
        s.execute("TRUNCATE TABLE definitely_missing")
