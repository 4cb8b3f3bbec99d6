"""FROM table FINAL — collapse to the latest row version per sorting key.

Reference: ``src/Parsers/ParserTablesInSelectQuery.cpp:30-32`` parses the
FINAL modifier; semantics are MergeTree ReplacingMergeTree collapse: keep
one row per ORDER-BY key, the one with the greatest version column.

Spark-first lowering: a single window + filter — one shuffle on the
sorting key, no collect. At 100 TB this is the same shuffle a
ReplacingMergeTree merge would pay; AQE handles key skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def final(df: DataFrame, key: Sequence[str], version: str | Column,
          keep: str = "max") -> DataFrame:
    """Keep one row per ``key``: greatest (or least) ``version``.

    Ties broken arbitrarily-but-deterministically by all remaining columns
    so repeated runs agree (CH FINAL picks the last-merged part; any
    deterministic winner is a valid lowering).
    """
    vcol = F.col(version) if isinstance(version, str) else version
    order = vcol.desc() if keep == "max" else vcol.asc()
    w = Window.partitionBy(*[F.col(k) for k in key]).orderBy(
        order, *[F.col(c).desc() for c in df.columns])
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1)
              .drop("__rn"))
