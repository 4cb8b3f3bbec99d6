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


_NUMERIC_PREFIXES = ("tinyint", "smallint", "int", "bigint", "float",
                     "double", "decimal")


def final_summing(df: DataFrame, key: Sequence[str],
                  sum_cols: Sequence[str] | None = None) -> DataFrame:
    """SummingMergeTree FINAL: one row per sorting key with the summable
    columns summed (the declared engine columns, else every numeric
    non-key column) and any value kept for the rest — one hash
    aggregation, map-side combine applies."""
    aggs = []
    for f in df.schema.fields:
        if f.name in key:
            continue
        t = f.dataType.simpleString()
        summed = (f.name in sum_cols if sum_cols
                  else t.startswith(_NUMERIC_PREFIXES))
        aggs.append((F.sum(f.name) if summed
                     else F.first(f.name, ignorenulls=True)).alias(f.name))
    return df.groupBy(*[F.col(k) for k in key]).agg(*aggs) \
             .select(*df.columns)


def final_collapsing(df: DataFrame, key: Sequence[str],
                     sign: str) -> DataFrame:
    """CollapsingMergeTree FINAL: +1/-1 rows cancel pairwise per key;
    a non-zero balance keeps one row of the surviving sign.

    CH keeps the LAST-inserted survivor, but columnar storage clustered
    on the sorting key does not preserve insertion order (CH has the
    same ambiguity across unmerged parts) — the winner here is the
    deterministic max over the remaining columns, the same tie-break
    ``final()`` uses."""
    keycols = [F.col(k) for k in key]
    bal = Window.partitionBy(*keycols)
    rest = [F.col(c).desc() for c in df.columns
            if c not in key and c != sign]
    w = Window.partitionBy(*keycols).orderBy(*(rest or [F.lit(1)]))
    want = F.when(F.col("__bal") > 0, 1).otherwise(-1)
    return (df.withColumn("__bal", F.sum(sign).over(bal))
            .filter((F.col("__bal") != 0) & (F.col(sign) == want))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__bal", "__rn"))


def final_versioned_collapsing(df: DataFrame, key: Sequence[str],
                               sign: str, version: str) -> DataFrame:
    """VersionedCollapsingMergeTree FINAL: rows cancel by sign within
    each (key, version); the surviving state row with the greatest
    version remains."""
    keycols = [F.col(k) for k in key]
    balw = Window.partitionBy(*keycols, F.col(version))
    w = Window.partitionBy(*keycols).orderBy(F.col(version).desc())
    return (df.withColumn("__bal", F.sum(sign).over(balw))
            .filter((F.col("__bal") > 0) & (F.col(sign) == 1))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__bal", "__rn"))


def final_aggregating(df: DataFrame, key: Sequence[str],
                      ch_columns: dict[str, str] | None = None) -> DataFrame:
    """AggregatingMergeTree FINAL: one row per sorting key with every
    aggregate-state column MERGED (not replaced) —
    ``AggregateFunction(uniq, T)`` states (HLL binary sketches) via
    hll_union_agg, ``AggregateFunction(uniqExact, T)`` (distinct-value
    arrays) via flatten+distinct, ``SimpleAggregateFunction(fn, T)`` via
    fn itself. One hash aggregation, map-side combine applies — the same
    shuffle a background merge would pay."""
    import re as _re
    simple_ops = {"sum": F.sum, "min": F.min, "max": F.max,
                  "anylast": lambda c: F.last(c, ignorenulls=True)}
    aggs = []
    for f in df.schema.fields:
        if f.name in key:
            continue
        cht = (ch_columns or {}).get(f.name, "") or ""
        m = _re.match(r"(?i)^aggregatefunction\((\w+)", cht)
        sm = _re.match(r"(?i)^simpleaggregatefunction\((\w+)", cht)
        if m and m.group(1).lower() in ("uniq", "uniqhll12",
                                        "uniqcombined"):
            col = F.hll_union_agg(f.name)
        elif m and m.group(1).lower() == "uniqexact":
            col = F.array_distinct(F.flatten(F.collect_list(f.name)))
        elif sm:
            op = simple_ops.get(sm.group(1).lower(),
                                lambda c: F.first(c, ignorenulls=True))
            col = op(f.name).cast(f.dataType)
        else:
            col = F.first(f.name, ignorenulls=True)
        aggs.append(col.alias(f.name))
    return df.groupBy(*[F.col(k) for k in key]).agg(*aggs) \
             .select(*df.columns)


def _materialize_expr_keys(df: DataFrame, keys: Sequence[str]):
    """ORDER BY keys may be EXPRESSIONS (``ORDER BY cityHash64(id)``):
    entries that are not plain df columns are evaluated into hidden
    ``__obk{i}`` columns so the per-key window/groupBy below partitions
    on the expression value, exactly like CH's sorting-key semantics.
    Returns (df, resolved key names, hidden columns to drop)."""
    names: list[str] = []
    added: list[str] = []
    for i, k in enumerate(keys):
        if k in df.columns:
            names.append(k)
            continue
        from ..plans.builder import Context, _eval
        from ..plans.parser import Parser
        col = _eval(Parser(k)._expr(), Context(df.sparkSession, {}), df)
        n = f"__obk{i}"
        df = df.withColumn(n, col)
        names.append(n)
        added.append(n)
    return df, names, added


def final_for_engine(df: DataFrame, key: Sequence[str], version: str,
                     engine: str = "", sign: str | None = None,
                     sum_cols: Sequence[str] | None = None,
                     ch_columns: dict[str, str] | None = None) -> DataFrame:
    """Engine-aware FINAL dispatch: Summing sums, Collapsing cancels,
    Aggregating merges states, everything else (Replacing & friends)
    keeps the latest version."""
    df, key, added = _materialize_expr_keys(df, list(key))
    if isinstance(version, str) and version not in df.columns:
        # version defaulted to the last ORDER BY entry, which may be an
        # expression — it was just materialized as the last key column
        version = key[-1]
    if engine == "SummingMergeTree":
        out = final_summing(df, key, sum_cols)
    elif engine == "CollapsingMergeTree" and sign:
        out = final_collapsing(df, key, sign)
    elif engine == "VersionedCollapsingMergeTree" and sign:
        out = final_versioned_collapsing(df, key, sign, version)
    elif engine == "AggregatingMergeTree":
        out = final_aggregating(df, key, ch_columns)
    else:
        out = final(df, key, version)
    return out.drop(*added) if added else out


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
