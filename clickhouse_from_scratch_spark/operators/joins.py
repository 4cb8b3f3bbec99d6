"""ClickHouse join strictness/semantics Spark lacks natively.

Reference grammar (``src/Parsers/ASTTablesInSelectQuery.h:10-96``):
``[GLOBAL] [ANY|ALL|ASOF|SEMI|ANTI] [INNER|LEFT|RIGHT|FULL|CROSS] JOIN``.
Spark covers ALL/SEMI/ANTI/outer natively; this module adds:

- ANY strictness (``ASTTablesInSelectQuery.h:79-80``): at most one
  right-side match per left row.
- ``join_use_nulls=0`` default (``src/Core/Settings.h:224``): non-matched
  outer-join cells are filled with the column type's *default value*
  (0, '', empty array), not NULL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def any_join(left: DataFrame, right: DataFrame, on: Sequence[str],
             how: str = "left",
             right_order: Sequence[Column] | None = None) -> DataFrame:
    """ANY-strictness join: dedupe the right side to one row per join key,
    then run a standard join.

    Deduping *before* the join keeps multiplicity correct and shrinks the
    shuffled build side — at 100 TB the dedup is a map-side-combine-friendly
    aggregation, and the joined side often becomes broadcastable after it.
    ``right_order`` pins which right row wins (CH ANY is "any one match";
    we make it deterministic).
    """
    order = list(right_order) if right_order else [F.col(c) for c in right.columns]
    w = Window.partitionBy(*[F.col(c) for c in on]).orderBy(*order)
    deduped = (right.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn"))
    return left.join(deduped, on=list(on), how=how)


_DEFAULTS: dict[type, object] = {
    T.StringType: "",
    T.BooleanType: False,
    T.DateType: "1970-01-01",
}


def _type_default(dt: T.DataType) -> Column:
    """ClickHouse type default: 0 for numerics, '' for String, epoch for
    Date/DateTime, [] for Array (reference behavior of non-Nullable types)."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                       T.FloatType, T.DoubleType)):
        return F.lit(0).cast(dt)
    if isinstance(dt, T.DecimalType):
        return F.lit(0).cast(dt)
    if isinstance(dt, T.StringType):
        return F.lit("")
    if isinstance(dt, T.BooleanType):
        return F.lit(False)
    if isinstance(dt, T.DateType):
        return F.to_date(F.lit("1970-01-01"))
    if isinstance(dt, T.TimestampType):
        return F.to_timestamp(F.lit("1970-01-01 00:00:00"))
    if isinstance(dt, T.ArrayType):
        return F.array().cast(dt)
    return F.lit(None).cast(dt)


def right_collision_name(name: str, taken) -> str:
    """Output name for a right-side join column that collides with a
    left-side column: ``name + '__r'``, extended with ``_`` until unique
    among ``taken`` — a GENUINE ``name__r`` column on either side must
    not be clobbered by the generated one. The builder's flat_renames
    bookkeeping uses this same function so qualified refs stay aligned."""
    out = name + "__r"
    taken = set(taken)
    while out in taken:
        out += "_"
    return out


def join_with_defaults(left: DataFrame, right: DataFrame,
                       on: Sequence[str] | None = None,
                       how: str = "left",
                       condition: Column | None = None) -> DataFrame:
    """Outer join with ``join_use_nulls = 0`` semantics: cells produced by
    *non-matching* rows are filled with the column type's default value.

    A boolean marker column per filled side distinguishes "no match" from a
    genuine NULL carried by a matched row (which ClickHouse preserves) —
    plain ``coalesce`` would clobber the latter. Pure post-join projection;
    adds no shuffle beyond the join itself.

    ``on`` (USING-style name list) merges key columns as Spark does;
    ``condition`` (ON-style Column) keeps both sides' columns and fills the
    non-matched side's keys too, matching ClickHouse ON semantics.
    """
    fill_right = how in ("left", "full", "outer", "full_outer")
    fill_left = how in ("right", "full", "outer", "full_outer")
    lm, rm = "__l_present", "__r_present"
    left2 = left.withColumn(lm, F.lit(True)) if fill_left else left
    right2 = right.withColumn(rm, F.lit(True)) if fill_right else right

    lnames = {f.name for f in left.schema.fields}
    if condition is not None:
        joined = left2.join(right2, condition, how)
        proj: list[Column] = []
        taken = lnames | {f.name for f in right.schema.fields}
        for f in left.schema.fields:
            col = left2[f.name]
            if fill_left:
                col = F.when(left2[lm].isNull(), _type_default(f.dataType)) \
                       .otherwise(col)
            proj.append(col.alias(f.name))
        for f in right.schema.fields:
            col = right2[f.name]
            if fill_right:
                col = F.when(right2[rm].isNull(), _type_default(f.dataType)) \
                       .otherwise(col)
            # colliding right columns get a __r suffix (the flattening
            # projection cannot keep Spark's side qualifiers; qualified
            # refs resolve through ctx.flat_renames like ASOF's _asof)
            if f.name in lnames:
                out_name = right_collision_name(f.name, taken)
                taken.add(out_name)
            else:
                out_name = f.name
            proj.append(col.alias(out_name))
        return joined.select(*proj)

    keys = list(on or [])
    joined = left2.join(right2, on=keys, how=how)
    ltypes = {f.name: f.dataType for f in left.schema.fields
              if f.name not in keys}
    rtypes = {f.name: f.dataType for f in right.schema.fields
              if f.name not in keys}
    collide = set(ltypes) & set(rtypes)
    if collide:
        # both sides carry a non-key column of the same name: project
        # from the side frames so the pair stays addressable — the
        # right copy gets a __r suffix (qualified refs resolve through
        # ctx.flat_renames, ASOF-style)
        proj = [F.col(k) for k in keys]
        taken = set(keys) | set(ltypes) | set(rtypes)
        for name, t in ltypes.items():
            col = left2[name]
            if fill_left:
                col = (F.when(F.col(lm).isNull(), _type_default(t))
                       .otherwise(col))
            proj.append(col.alias(name))
        for name, t in rtypes.items():
            col = right2[name]
            if fill_right:
                col = (F.when(F.col(rm).isNull(), _type_default(t))
                       .otherwise(col))
            if name in collide:
                out_name = right_collision_name(name, taken)
                taken.add(out_name)
            else:
                out_name = name
            proj.append(col.alias(out_name))
        return joined.select(*proj)
    proj = []
    for name in joined.columns:
        if name in (lm, rm):
            continue
        if fill_right and name in rtypes:
            proj.append(F.when(F.col(rm).isNull(),
                               _type_default(rtypes[name]))
                        .otherwise(F.col(name)).alias(name))
        elif fill_left and name in ltypes:
            proj.append(F.when(F.col(lm).isNull(),
                               _type_default(ltypes[name]))
                        .otherwise(F.col(name)).alias(name))
        else:
            proj.append(F.col(name))
    return joined.select(*proj)
