"""Deterministic dataset splitting for training-data pipelines.

``stratified_split`` assigns every row a split label (train/val/test by
default) from a hash of its key — reproducible across runs, machines,
and engines. The assignment is a MAP-ONLY projection: no shuffle, no
state, so at 100 TB it costs one pass over the data it is fused into.

The hash is md5 over ``key || ':' || salt`` and the assignment compares
the first four hex digits against cumulative-fraction boundaries as hex
STRINGS — identical lexicographic semantics in every engine with md5
(the DuckDB oracle recomputes the exact same labels), precision 1/65536
per fraction. Changing ``salt`` re-deals the assignment; keeping it
pins membership forever, which is what train/test hygiene needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_FRACTIONS = {"train": 0.9, "val": 0.05, "test": 0.05}


def split_bounds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """(hex-boundary, label) pairs for all but the last label; the last
    label is the otherwise-branch. Boundaries are cumulative fractions
    scaled to the 4-hex-digit space (65536 buckets)."""
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    out, cum = [], 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        out.append((format(int(round(cum * 65536)), "04x"), name))
    return out


def split_column(key: Column, fractions: dict[str, float] | None = None,
                 salt: str = "v1") -> Column:
    """The split-label expression alone (pure JVM: md5 + substring +
    string comparisons) — usable inside any projection."""
    fractions = fractions or DEFAULT_FRACTIONS
    h = F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(":" + salt))), 1, 4)
    chain = None
    for bound, name in split_bounds(fractions):
        cond = h < F.lit(bound)
        chain = (F.when(cond, name) if chain is None
                 else chain.when(cond, name))
    last = list(fractions)[-1]
    return chain.otherwise(F.lit(last)) if chain is not None \
        else F.lit(last)


def stratified_split(df: DataFrame, key: str = "doc_id",
                     fractions: dict[str, float] | None = None,
                     salt: str = "v1",
                     column: str = "split") -> DataFrame:
    """Append a deterministic split-label column keyed on ``key``."""
    return df.withColumn(
        column, split_column(F.col(key), fractions, salt))


def take_split(df: DataFrame, name: str, key: str = "doc_id",
               fractions: dict[str, float] | None = None,
               salt: str = "v1") -> DataFrame:
    """Filter one split — a pushdown-friendly predicate, not a join."""
    return df.where(split_column(F.col(key), fractions, salt) == name)
