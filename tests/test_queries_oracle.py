"""Every queries() entry with an oracle must match DuckDB at sf0.001.

This is the same comparison the round driver performs at sf0.01
(rowcount + columns + order-insensitive values) — see tools/check_oracle.py.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from clickhouse_from_scratch_spark.queries import INVARIANTS, ORACLES, QUERIES
from tools.check_oracle import compare

ORACLE_NAMES = sorted(ORACLES)
WEAK_NAMES = sorted(set(QUERIES) - set(ORACLES))
INVARIANT_NAMES = sorted(set(INVARIANTS) & set(WEAK_NAMES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, sf_dir, duck, name):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    duck_pdf = duck.execute(ORACLES[name]).fetchdf()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", WEAK_NAMES)
def test_weak_runs(spark, sf_dir, name):
    """No-oracle queries must still execute and return a stable schema."""
    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.columns  # non-empty schema


@pytest.mark.parametrize("name", INVARIANT_NAMES)
def test_no_oracle_invariants(spark, sf_dir, duck, name):
    """Approx/nondeterministic queries without a value-exact oracle still
    carry a CHECKED invariant against DuckDB (HLL error bound, exact
    re-scoring of emitted pairs, structural limits)."""
    pdf = QUERIES[name](spark, sf_dir).toPandas()
    desc, fn = INVARIANTS[name]
    problem = fn(pdf, duck)
    assert problem is None, f"{name} ({desc}): {problem}"
