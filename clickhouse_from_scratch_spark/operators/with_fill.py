"""ORDER BY ... WITH FILL [FROM a] [TO b] [STEP s] — gap-fill generated rows.

Reference: ``src/Parsers/ExpressionElementParsers.cpp:2280-2296``,
``ASTOrderByElement.h``. Missing values of the fill column in [from, to)
are generated at step intervals; non-fill columns get NULL on generated rows
(CH fills type defaults; we expose both via ``fill_defaults``).

Lowering: ``sequence()`` → explode → left join against the data. The
sequence frame is tiny (domain of the fill column, not the data), so the
join broadcasts the data-side aggregate... in practice the generated spine
is the small side and Catalyst broadcasts it; at 100 TB the data side never
re-shuffles beyond its own aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def with_fill(df: DataFrame, fill_col: str,
              start: Column, stop: Column, step: Column,
              fill_defaults: dict[str, object] | None = None) -> DataFrame:
    """Fill gaps in ``fill_col`` from ``start`` to ``stop`` (inclusive) by
    ``step``. Works for numeric (lit ints) and date/timestamp
    (``F.expr("interval 1 day")`` step) domains — mirrors `sequence()` rules.
    """
    return with_fill_multi(df, [(fill_col, start, stop, step)],
                           fill_defaults)


def with_fill_multi(df: DataFrame,
                    items: list[tuple[str, Column, Column, Column]],
                    fill_defaults: dict[str, object] | None = None
                    ) -> DataFrame:
    """Multi-column WITH FILL: one spine per fill column, cross-joined
    into a grid (CH's FillingTransform emits every combination of the
    fill domains), then one left join against the data on all fill
    columns. Each spine is tiny (the column's domain, not the data), so
    the grid broadcasts; the data side joins in a single pass."""
    spark = df.sparkSession
    spine = spark.range(1).select()
    for name, start, stop, step in items:
        spine = spine.crossJoin(
            spark.range(1).select(
                F.explode(F.sequence(start, stop, step)).alias(name)))
    out = spine.join(df, on=[name for name, *_ in items], how="left")
    if fill_defaults:
        out = out.fillna(fill_defaults)
    return out.orderBy(*[name for name, *_ in items])
