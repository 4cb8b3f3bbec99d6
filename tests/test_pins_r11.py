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
