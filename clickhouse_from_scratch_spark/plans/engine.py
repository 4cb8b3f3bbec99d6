"""Engine facade: execute ClickHouse-dialect SQL against registered tables.

The lifecycle (SURVEY.md §3 "our lifecycle"): SQL string → Lexer → Parser
(CH grammar) → AST → plan builder → DataFrame → Catalyst → execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .builder import build
from .parser import parse as _parse


def parse(sql: str):
    """SQL text → dialect AST (the reference's full live surface)."""
    return _parse(sql)


def execute_sql(spark: SparkSession, sql: str,
                tables: dict[str, DataFrame],
                engines: dict[str, dict] | None = None,
                params: dict[str, object] | None = None,
                settings: dict[str, object] | None = None,
                dictionaries: dict[str, object] | None = None) -> DataFrame:
    """Run a ClickHouse-dialect query over the given tables.

    ``engines`` carries per-table MergeTree-style metadata the DDL layer
    would normally record: ``{"events": {"order_by": ["user_id"],
    "version": "ts", "sample_by": "user_id"}}`` — needed by FINAL and
    SAMPLE. ``params`` binds ``{name:Type}`` query parameters
    (clickhouse-client --param_name analogue).
    """
    # CH integer semantics wrap on overflow and index misses degrade to
    # defaults — Spark 4's ANSI default would throw instead, so the
    # dialect engine always evaluates ANSI-off (catalog.load_table pins
    # the same for the parquet path; this covers table-less scalar SQL
    # on a vanilla session)
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        # DateTime renders deterministically in UTC regardless of the
        # host machine's zone (catalog.load_table pins the same; this
        # covers table-less scalar SQL on a vanilla session)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    ast = _parse(sql)
    return build(spark, ast, tables, engines=engines, params=params,
                 settings=settings, dictionaries=dictionaries)
