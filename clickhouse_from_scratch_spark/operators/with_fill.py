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
                    items: list[tuple],
                    fill_defaults: dict[str, object] | None = None,
                    mark_generated: str | None = None) -> DataFrame:
    """Multi-column WITH FILL: one spine per fill column, cross-joined
    into a grid (CH's FillingTransform emits every combination of the
    fill domains), then one FULL join against the data on all fill
    columns — original rows outside the fill range stay in the result
    (CH keeps them; fill only inserts). Each spine is tiny (the column's
    domain, not the data), so the grid broadcasts.

    Items are (name, start, stop, step[, to_exclusive]); the SQL
    ``WITH FILL TO`` bound is exclusive per CH, the Python API default
    stays inclusive."""
    spark = df.sparkSession
    spine = spark.range(1).select()
    for item in items:
        name, start, stop, step = item[:4]
        to_excl = bool(item[4]) if len(item) > 4 else False
        seq = F.sequence(start, stop, step)
        col = F.explode(seq).alias(name)
        one = spark.range(1).select(col)
        if to_excl:
            # exclusive bound follows the fill direction: ascending drops
            # values >= TO, descending (FROM > TO, negative STEP) drops
            # values <= TO
            one = one.filter(F.when(start > stop, F.col(name) > stop)
                              .otherwise(F.col(name) < stop))
        spine = spine.crossJoin(one)
    names = [item[0] for item in items]
    if mark_generated:
        # marker survives the full join as NULL exactly on generated
        # rows (spine-only), letting the caller fill type defaults or
        # interpolate without mistaking a genuine NULL for a fill row
        df = df.withColumn(mark_generated, F.lit(1))
    out = spine.join(df, on=names, how="full")
    if fill_defaults:
        out = out.fillna(fill_defaults)
    return out.orderBy(*names)
