"""GROUP BY ... WITH TOTALS — append one row of whole-set aggregates.

Reference: ``src/Parsers/ParserSelectQuery.cpp:205,211-218``,
``ASTSelectQuery.h:82`` (totals row appended to the grouped result).
``totals_mode`` (``src/Core/Settings.h:109-110``) is handled in the SQL
lowering (``plans/builder.py``): ``before_having`` keeps the all-rows
totals, the ``after_having_*`` family recomputes totals over the groups
that passed HAVING; the exclusive/inclusive/auto distinction only
matters under group-by overflow, which this engine does not replicate.

Lowering: grouping sets — ``GROUP BY GROUPING SETS ((keys...), ())`` in one
aggregation pass (single shuffle; Spark computes both granularities with
partial aggregation), the () row carrying NULL keys — exactly CH's totals
row shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def with_totals(df: DataFrame, keys: Sequence[str],
                agg_exprs: Sequence[str]) -> DataFrame:
    """Grouped aggregation plus a totals row (keys all NULL).

    ``agg_exprs`` are SQL aggregate expressions with aliases,
    e.g. ``["sum(l_quantity) AS sum_qty", "count(*) AS cnt"]``.
    """
    view = "__wt_src"
    df.createOrReplaceTempView(view)
    key_list = ", ".join(keys)
    agg_list = ", ".join(agg_exprs)
    sql = (f"SELECT {key_list}, {agg_list} FROM {view} "
           f"GROUP BY GROUPING SETS (({key_list}), ())")
    return df.sparkSession.sql(sql)
