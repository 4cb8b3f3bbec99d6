"""Scalar arity/NULL sweep: every registered scalar function called
with 1–3 NULL arguments either builds or raises a NAMED engine error —
never a raw Python TypeError (CH reports wrong argument counts as a
typed exception; the registry-dispatch wrappers convert).

One test iterating the whole registry (one Spark session, build-only —
schema analysis, no jobs), because per-name parametrization would
re-enter fixtures ~2500 times."""

from __future__ import annotations

from clickhouse_from_scratch_spark.functions.aggregates import AGGREGATES
from clickhouse_from_scratch_spark.functions.registry import REGISTRY
from clickhouse_from_scratch_spark.plans.builder import BuildError
from clickhouse_from_scratch_spark.plans.engine import execute_sql


def test_scalar_null_arity_never_raw_typeerror(spark):
    names = sorted(set(REGISTRY) - set(AGGREGATES))
    offenders: list[tuple[str, list[str]]] = []
    for name in names:
        outcomes: list[str] = []
        for args in ("NULL", "NULL, NULL", "NULL, NULL, NULL"):
            try:
                execute_sql(spark, f"SELECT {name}({args}) AS r",
                            {}).schema
                outcomes.append("ok")
                break
            except (BuildError, ValueError, KeyError):
                outcomes.append("named")
            except TypeError as e:
                outcomes.append(f"RAW TypeError: {e}")
            except Exception:
                outcomes.append("engine-error")
        if any(o.startswith("RAW") for o in outcomes) \
                and "ok" not in outcomes:
            offenders.append((name, outcomes))
    assert not offenders, offenders[:10]
