"""LIMIT [offset,] n BY expr — group-wise limit.

Reference: ``src/Parsers/ParserSelectQuery.cpp:281-299`` and
``ASTSelectQuery.h:30-32``: per-group top-k after the query's ORDER BY.
Also backs the parse-time rewrite DISTINCT ON → LIMIT 1 BY
(``ParserSelectQuery.cpp:363-372``).

Lowering: row_number over (partition by keys order by <query order>),
filter to (offset, offset+n]. One shuffle, map-side nothing to combine —
at scale the window shuffle is the unavoidable cost of per-group ranking;
prefer ``n`` small so AQE's local-limit kicks in post-filter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def limit_by(df: DataFrame, keys: Sequence[str | Column],
             order: Sequence[Column], n: int, offset: int = 0) -> DataFrame:
    """Keep rows offset+1..offset+n per distinct ``keys``, ranked by ``order``."""
    kcols = [F.col(k) if isinstance(k, str) else k for k in keys]
    w = Window.partitionBy(*kcols).orderBy(*order)
    rn = F.row_number().over(w)
    return (df.withColumn("__rn", rn)
              .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + n))
              .drop("__rn"))
