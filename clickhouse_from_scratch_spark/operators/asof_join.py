"""ASOF JOIN — for each left row, the latest right row with
right.time <= left.time on matching equi-keys.

Reference: ASOF strictness token, ``src/Parsers/ASTTablesInSelectQuery.h:82``
(semantics per ClickHouse docs: last inequality-matched value on the final
join column).

Spark lacks a native as-of join. Lowering: **union + window** —
tag both sides, union by (keys, time), and carry the most recent right
payload forward with ``last(ignorenulls=True)`` over a row-frame, then keep
left rows. ONE shuffle on the equi-key (same as the equi-join would pay),
no pandas, no range-explosion — this is the 100 TB-safe plan: a naive
``left.time >= right.time`` range join would be O(n·m) per key, while this
is O((n+m) log) within each key partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_time: str, right_time: str,
              direction: str = "backward", strict: bool = False,
              suffix: str = "_asof", how: str = "left") -> DataFrame:
    """As-of join (``how='left'`` keeps unmatched left rows with NULL
    payload; ``how='inner'`` drops them — CH's bare ``ASOF JOIN``).

    direction='backward': latest right with right_time <= left_time
    (ClickHouse ``ASOF JOIN ... ON l.t >= r.t``).
    direction='forward': earliest right with right_time >= left_time.
    strict=True makes the inequality strict (``>`` / ``<``): a right row
    at exactly left_time no longer matches (CH accepts all four
    comparison tokens on the asof column,
    src/Parsers/ASTTablesInSelectQuery.h:82).

    Right payload columns (everything except ``on`` + ``right_time``) are
    appended with ``suffix`` when the name collides with a left column;
    ``right_time`` itself comes back as ``right_time + suffix`` when needed.
    """
    keys = list(on)
    payload = [c for c in right.columns if c not in keys]

    def out_name(c: str) -> str:
        return c + suffix if c in left.columns else c

    # Tagged union: left rows carry NULL payload, right rows carry NULL
    # left-columns. __side orders right rows before left rows at equal
    # timestamps so a right row at exactly left_time matches (<= semantics).
    lcols = [c for c in left.columns if c not in keys and c != left_time]
    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_name(c))
          for c in payload],
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(out_name(c)) for c in payload],
    )
    unioned = l_tagged.unionByName(r_tagged)

    asc = direction == "backward"
    # __side tie-break at equal timestamps: inclusive (<=/>=) sees right
    # rows (side 0) before left rows → a right row at exactly left_time
    # matches; strict (</>) orders left rows first so it doesn't.
    side_order = F.col("__side").desc() if strict else F.col("__side").asc()
    w = (Window.partitionBy(*[F.col(k) for k in keys])
               .orderBy(F.col("__t").asc() if asc else F.col("__t").desc(),
                        side_order)
               .rowsBetween(Window.unboundedPreceding, 0))
    filled = unioned.select(
        "*",
        *[F.last(out_name(c), ignorenulls=True).over(w).alias(f"__f_{c}")
          for c in payload],
    )
    matched = filled.filter(F.col("__side") == 1)
    if how == "inner":
        # a real match always fills the right_time payload (non-null by
        # construction); unmatched left rows keep it NULL
        matched = matched.filter(F.col(f"__f_{right_time}").isNotNull())
    result = (matched
                    .select(*[F.col(k) for k in keys],
                            F.col("__t").alias(left_time),
                            *[F.col(c) for c in lcols],
                            *[F.col(f"__f_{c}").alias(out_name(c))
                              for c in payload]))
    return result
