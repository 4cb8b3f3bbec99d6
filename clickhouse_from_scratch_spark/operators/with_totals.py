"""GROUP BY ... WITH TOTALS — append one row of whole-set aggregates.

Reference: ``src/Parsers/ParserSelectQuery.cpp:205,211-218``,
``ASTSelectQuery.h:82`` (totals row appended to the grouped result).
``totals_mode`` (``src/Core/Settings.h:109-110``) is handled in the SQL
lowering (``plans/builder.py``): ``before_having`` keeps the all-rows
totals, the ``after_having_*`` family recomputes totals over the groups
that passed HAVING; the exclusive/inclusive/auto distinction only
matters under group-by overflow, which this engine does not replicate.

Lowering: the grouped part is a plain GROUP BY (one key-shuffle); the
totals row is a keyless global aggregate over the same source, unioned
by name with NULL keys. A keyless aggregate always emits exactly one
row, so the totals block survives an empty input — matching ClickHouse,
whose TotalsHavingTransform emits the totals block unconditionally. At
scale the keyless pass map-side partial-aggregates to ~one row per
partition before its shuffle, cheaper than the 2× row duplication an
Expand-based GROUPING SETS ((keys), ()) lowering pays. Note: this
string-expression API keeps Spark's ANSI NULL-on-empty aggregate values
in the totals row; the SQL engine path (``plans/builder.py``) further
applies CH's empty-set defaults (sum→0, count→0) to it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_totals(df: DataFrame, keys: Sequence[str],
                agg_exprs: Sequence[str]) -> DataFrame:
    """Grouped aggregation plus a totals row (keys = type defaults).

    ClickHouse (pre-``group_by_use_nulls``) fills totals key cells with
    the key TYPE'S default (0 / '' / epoch), not NULL.

    ``agg_exprs`` are SQL aggregate expressions with aliases,
    e.g. ``["sum(l_quantity) AS sum_qty", "count(*) AS cnt"]``.
    """
    from .joins import _type_default
    # DataFrame-native build (no temp-view registration — a catalog
    # write + two full SQL parses per plan build, r13 optimization;
    # same GROUP BY / keyless-aggregate plans, results identical)
    aggs = [F.expr(e) for e in agg_exprs]
    grouped = df.groupBy(*keys).agg(*aggs)
    totals = df.agg(*aggs).select(
        *[_type_default(grouped.schema[k].dataType).alias(k)
          for k in keys], "*")
    return grouped.unionByName(totals)
