"""ARRAY JOIN / LEFT ARRAY JOIN — unnest array columns.

Reference: ``src/Parsers/ASTTablesInSelectQuery.h:126-145``,
``ParserTablesInSelectQuery.cpp:68-105``. ARRAY JOIN replicates each row
once per array element (dropping empty-array rows); LEFT ARRAY JOIN keeps
empty-array rows with a NULL/default element. Multiple arrays are zipped
positionally (ClickHouse semantics), not cross-producted.

Lowering: ``explode`` / ``explode_outer``; the multi-array form uses
``arrays_zip`` to preserve the positional-zip semantics.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def array_join(df: DataFrame, arrays: Mapping[str, str | Column],
               left: bool = False) -> DataFrame:
    """Unnest one or more array expressions.

    ``arrays`` maps output alias -> array column (name or Column). With
    several arrays they are zipped by position (CH ARRAY JOIN rule:
    equal-length arrays iterate together).
    """
    items = [(alias, F.col(c) if isinstance(c, str) else c)
             for alias, c in arrays.items()]
    exploder = F.explode_outer if left else F.explode
    if len(items) == 1:
        alias, col = items[0]
        return df.select("*", exploder(col).alias(alias))
    zipped = F.arrays_zip(*[col.alias(alias) for alias, col in items])
    out = df.select("*", exploder(zipped).alias("__z"))
    for alias, _ in items:
        # getItem, not a parsed path — aliases may contain dots
        # (flattened Nested columns like n.a)
        out = out.withColumn(alias, F.col("__z")[alias])
    return out.drop("__z")
