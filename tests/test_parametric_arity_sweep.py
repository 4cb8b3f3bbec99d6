"""Parametric-arity sweep: every registered aggregate called with a
leading parameter list must either implement documented parametric
semantics or raise a NAMED engine error — never a raw Python TypeError
(the round-7 groupArray(N) crash class, closed mechanically).

Reference parses the parametric grammar f(params)(args) for every
aggregate name (src/Parsers/ExpressionElementParsers.cpp:766-876); the
engine decides per-name whether the parameters mean anything."""

from __future__ import annotations

import pytest

from clickhouse_from_scratch_spark.functions.aggregates import AGGREGATES
from clickhouse_from_scratch_spark.plans.builder import BuildError
from clickhouse_from_scratch_spark.plans.engine import execute_sql


def _attempt(spark, sql: str) -> str:
    try:
        execute_sql(spark, sql, {}).schema  # force plan build + analysis
        return "ok"
    except TypeError as e:
        return f"RAW TypeError: {e}"
    except Exception:
        return "named-error"


@pytest.mark.parametrize("name", sorted(AGGREGATES))
def test_parametric_call_never_raw_typeerror(spark, name):
    outcomes = []
    for args in ("number", "number, number", "number, number, number"):
        out = _attempt(spark,
                       f"SELECT {name}(1)({args}) AS r FROM numbers(5)")
        outcomes.append(out)
        if out == "ok":
            break
    assert not any(o.startswith("RAW TypeError") for o in outcomes), \
        f"{name}: {outcomes}"


@pytest.mark.parametrize("name", ["sum", "avg", "min", "uniqExact", "corr"])
def test_non_parametric_aggregate_named_error(spark, name):
    with pytest.raises(BuildError):
        execute_sql(spark, f"SELECT {name}(1)(number) AS r "
                    "FROM numbers(5)", {}).schema


def test_parametric_group_array_semantics(spark):
    rows = execute_sql(
        spark, "SELECT groupArray(2)(number) AS a, groupArray(9)(number) "
        "AS b, groupUniqArray(2)(number % 3) AS c FROM "
        "(SELECT number FROM numbers(5) ORDER BY number)", {}).collect()
    assert rows[0].a == [0, 1]
    assert rows[0].b == [0, 1, 2, 3, 4]
    assert len(rows[0].c) == 2


def test_parametric_group_array_if_stack(spark):
    rows = execute_sql(
        spark, "SELECT groupArrayIf(2)(number, number > 1) AS r FROM "
        "(SELECT number FROM numbers(6) ORDER BY number)", {}).collect()
    assert rows[0].r == [2, 3]
