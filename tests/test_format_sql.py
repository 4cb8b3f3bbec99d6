"""AST → SQL formatter (r11): the reference ``IAST::formatImpl``
contract (ASTSelectQuery.cpp:55-170, ASTFunction.cpp:222-560) behind
EXPLAIN SYNTAX, and the ``IAST::dumpTree`` shape behind EXPLAIN AST.
The round-trip law is format → parse → format fixpoint (the parser may
canonicalize the ORIGINAL text once — TOP → LIMIT, BETWEEN → >= AND <=
— but formatted output must re-parse to itself)."""

import pytest

from clickhouse_from_scratch_spark.plans.parser import parse
from clickhouse_from_scratch_spark.plans.format_sql import (dump_ast,
                                                            format_sql)

FIXPOINT_CASES = [
    "SELECT 1",
    "SELECT a, b FROM t WHERE a = 1 ORDER BY b DESC LIMIT 10",
    "SELECT TOP 3 a FROM t WHERE a BETWEEN 1 AND 5",
    "SELECT a > 2 ? 'big' : 'small' AS sz FROM t",
    "SELECT DISTINCT a, sum(b) OVER (PARTITION BY c ORDER BY a) AS s FROM t",
    "WITH x AS (SELECT 1 AS v) SELECT v FROM x",
    "WITH 1 + 1 AS two SELECT two",
    "SELECT a FROM t1 ANY LEFT JOIN t2 USING (k)",
    "SELECT a FROM t1 GLOBAL INNER JOIN t2 ON t1.k = t2.k",
    "SELECT a FROM t1 ASOF JOIN t2 ON t1.k = t2.k AND t1.ts >= t2.ts",
    "SELECT arr[1].2 AS e, -a AS n, a IN 5 AS m FROM t ARRAY JOIN arr",
    "SELECT a, count() FROM t GROUP BY a WITH ROLLUP HAVING count() > 1",
    "SELECT a, count() FROM t GROUP BY GROUPING SETS ((a), ()) WITH TOTALS",
    "SELECT a FROM t ORDER BY a WITH FILL FROM 1 TO 10 STEP 2 LIMIT 3 BY a",
    "SELECT a FROM t UNION ALL SELECT b FROM u INTERSECT SELECT c FROM v",
    "SELECT a FROM t PREWHERE a > 0 WHERE b < 2 LIMIT 1, 5",
    "SELECT quantile(0.9)(x) AS q FROM t",
    "SELECT count(DISTINCT y) FILTER (WHERE z > 0) AS c FROM t",
    "SELECT x -> x + 1 AS l, (a, b) -> a * b AS m FROM t",
    "SELECT a IS NULL AS p, a IS NOT NULL AS q, NOT (a = 1) AS r FROM t",
    "SELECT a LIKE 'x%' AS p, b NOT ILIKE '%y' AS q FROM t",
    "SELECT a FROM t WHERE a IN (1, 2, 3) AND b NOT IN (SELECT c FROM u)",
    "SELECT a FROM t WHERE (a, b) IN ((1, 2), (3, 4))",
    "SELECT * EXCEPT (a) REPLACE (b + 1 AS b) FROM t",
    "SELECT t.* FROM t",
    "SELECT CAST(a, 'Int64') AS x, a :: Float64 AS y FROM t",
    "SELECT a FROM t SETTINGS max_threads = 4",
    "SELECT number FROM numbers(10) AS n",
    "SELECT a FROM db1.t FINAL",
    "SELECT a, any(b) RESPECT NULLS AS r FROM t GROUP BY a",
]


@pytest.mark.parametrize("sql", FIXPOINT_CASES)
def test_format_parse_fixpoint(sql):
    ast1 = parse(sql)
    f1 = format_sql(ast1, one_line=True)
    ast2 = parse(f1)
    f2 = format_sql(ast2, one_line=True)
    assert f1 == f2, f"{sql!r}: {f1!r} != {f2!r}"


def test_syntax_shows_canonical_rewrites():
    # TOP → LIMIT, BETWEEN → >= AND <=, ternary → if: the reference's
    # parse-time canonicalizations made visible as SQL
    f = format_sql(parse(
        "SELECT TOP 3 a > 2 ? 'b' : 's' AS sz FROM t "
        "WHERE a BETWEEN 1 AND 5"), one_line=True)
    assert "TOP" not in f and "BETWEEN" not in f and "?" not in f
    assert "LIMIT 3" in f
    assert "if(a > 2, 'b', 's')" in f
    assert "(a >= 1) AND (a <= 5)" in f


def test_multiline_clause_shape():
    # ASTSelectQuery::formatImpl: one clause per line; the WITH
    # ROLLUP/TOTALS modifiers indent under GROUP BY
    text = format_sql(parse(
        "SELECT a, count() FROM t WHERE a > 0 GROUP BY a WITH TOTALS "
        "ORDER BY a LIMIT 5"), one_line=False)
    lines = text.split("\n")
    assert lines[0].startswith("SELECT ")
    assert lines[1] == "FROM t"
    assert lines[2] == "WHERE a > 0"
    assert lines[3] == "GROUP BY a"
    assert lines[4] == "    WITH TOTALS"
    assert lines[5] == "ORDER BY a"
    assert lines[6] == "LIMIT 5"


def test_in_scalar_rhs_gets_parens():
    # x IN 1 prints as x IN (1) (ASTFunction.cpp:375-389)
    f = format_sql(parse("SELECT a IN 5 AS m FROM t"), one_line=True)
    assert "a IN (5)" in f


def test_dump_ast_shape():
    text = dump_ast(parse("SELECT a + 1 AS x FROM t WHERE b = 'q'"))
    lines = text.split("\n")
    assert lines[0] == "SelectQuery"
    assert "-Alias_x" in lines
    assert "--Function_plus" in lines
    assert "---Identifier_a" in lines
    assert "---Literal_UInt64_1" in lines
    assert "-TableIdentifier_t" in lines
    assert "-Function_equals" in lines


def test_dump_ast_union():
    text = dump_ast(parse("SELECT 1 UNION ALL SELECT 2"))
    assert text.split("\n")[0] == "SelectWithUnionQuery"
    assert text.split("\n").count("-SelectQuery") == 2   # the two arms


def test_explain_syntax_statement(spark, tmp_path):
    from clickhouse_from_scratch_spark.ddl import ChSession
    s = ChSession(spark, warehouse=str(tmp_path / "wh"))
    s.execute("CREATE TABLE fx (a Int32, b String) ENGINE = Memory")
    lines = [r.explain for r in s.execute(
        "EXPLAIN SYNTAX SELECT TOP 2 a FROM fx WHERE a BETWEEN 1 AND 3"
    ).collect()]
    text = "\n".join(lines)
    assert text.splitlines()[0] == "SELECT a"
    assert "WHERE (a >= 1) AND (a <= 3)" in text
    assert "LIMIT 2" in text
    # the rewritten SQL must itself parse
    parse(text.replace("\n", " "))


def test_catalog_corpus_fixpoint():
    """Every SQL text in the query catalog round-trips through the
    formatter (format → parse → format fixpoint) — the corpus-level
    robustness check behind EXPLAIN SYNTAX."""
    import os
    import re
    src = open(os.path.join(os.path.dirname(__file__), "..",
                            "clickhouse_from_scratch_spark",
                            "queries.py")).read()
    texts = [t.strip() for t in
             re.findall(r'_sql\(spark, sf_dir, """(.*?)"""', src, re.S)]
    assert len(texts) >= 50
    for t in texts:
        f1 = format_sql(parse(t), one_line=True)
        f2 = format_sql(parse(f1), one_line=True)
        assert f1 == f2, t[:100]
