"""LIMIT n WITH TIES — keep all rows tied with the n-th row.

Reference: ``src/Parsers/ParserSelectQuery.cpp:261-276`` (requires ORDER BY,
validated at :406-407); also the ``FETCH FIRST n ROWS WITH TIES`` form
(:304-361).

Lowering — two-phase, no full-table single-partition pass:

1. **Threshold**: the n-th row's sort-key tuple via ``orderBy().limit(n)``
   over the key columns only — Catalyst compiles this to
   TakeOrderedAndProject (per-partition partial top-n, driver merges just
   n keys; column-pruned scan).
2. **Prune + exact rank**: filter the table with a conservative
   lexicographic ``<= threshold`` predicate (NULL keys kept — superset,
   never drops a qualifying row), then run the exact ``rank() <= n``
   window on the pruned frame. The global window still has one
   partition, but it now sees only ~n rows plus boundary ties instead of
   the whole table — the 100 TB shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# beyond this the n-key driver merge in phase 1 stops being "small"; fall
# back to the single-pass global window rather than collecting thresholds
_MAX_THRESHOLD_N = 100_000


def _direct(c: Column, desc: bool, nulls_first: bool | None) -> Column:
    # CH default NULL placement: NULLS LAST for both directions
    if desc:
        return (c.desc_nulls_first() if nulls_first
                else c.desc_nulls_last())
    return (c.asc_nulls_first() if nulls_first
            else c.asc_nulls_last())


def limit_with_ties(df: DataFrame, order: Sequence[Column], n: int,
                    descending: Sequence[bool] | None = None,
                    nulls_first: Sequence[bool | None] | None = None,
                    ) -> DataFrame:
    """All rows whose rank under ``order`` is <= n (ties of row n included).

    ``order`` are *bare* (undirected) expression columns; ``descending``
    / ``nulls_first`` carry the per-column direction so the same
    expressions can drive both the threshold top-n and the tie filter.
    """
    if not order:
        raise ValueError("LIMIT WITH TIES requires ORDER BY")
    k = len(order)
    desc = list(descending) if descending is not None else [False] * k
    nf = list(nulls_first) if nulls_first is not None else [None] * k
    names = [f"__ot{i}" for i in range(k)]
    directed = [_direct(F.col(nm), d, f)
                for nm, d, f in zip(names, desc, nf)]
    tagged = df.select("*", *[c.alias(nm) for c, nm in zip(order, names)])

    if n <= _MAX_THRESHOLD_N:
        head = tagged.select(*names).orderBy(*directed).limit(n).collect()
        if len(head) == n:          # fewer rows than n → nothing to prune
            thr = head[-1]
            # lexicographic "sorts at or before the n-th key tuple",
            # built innermost-last-key-first; NULL keys always pass
            # (conservative superset — the rank pass below is exact)
            pred = None
            for nm, d, t in reversed(list(zip(names, desc, tuple(thr)))):
                key = F.col(nm)
                if t is None:
                    lt = F.lit(False)
                else:
                    lt = (key > F.lit(t)) if d else (key < F.lit(t))
                eq = key.eqNullSafe(F.lit(t))
                keep = lt | key.isNull()
                pred = (keep | eq) if pred is None else (keep | (eq & pred))
            tagged = tagged.filter(pred)

    w = Window.orderBy(*directed)
    return (tagged.withColumn("__rk", F.rank().over(w))
                  .filter(F.col("__rk") <= n)
                  .drop("__rk", *names))
