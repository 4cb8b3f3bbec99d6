"""LIMIT n WITH TIES — keep all rows tied with the n-th row.

Reference: ``src/Parsers/ParserSelectQuery.cpp:261-276`` (requires ORDER BY,
validated at :406-407); also the ``FETCH FIRST n ROWS WITH TIES`` form
(:304-361).

Lowering: ``rank() <= n`` over the query's ORDER BY — a global window
(single partition). At scale this would serialize; mitigation: pre-filter
with an ordinary ``limit`` on a generous overestimate via per-partition
local sort is left to AQE — rank over an empty partitionBy is acceptable
because LIMIT n implies a small n result by construction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def limit_with_ties(df: DataFrame, order: Sequence[Column], n: int) -> DataFrame:
    """All rows whose rank under ``order`` is <= n (ties of row n included)."""
    w = Window.orderBy(*order)
    return (df.withColumn("__rk", F.rank().over(w))
              .filter(F.col("__rk") <= n)
              .drop("__rk"))
