"""Domain-mixture sampling for LLM training-data pipelines.

Pretraining mixes sources at target rates (e.g. keep 100% of books,
30% of common-crawl). ``domain_mix`` keeps each row independently with
its domain's probability, decided by the SAME md5-hex-threshold device
as ``split.py`` — deterministic across runs and engines (the DuckDB
oracle recomputes identical membership), map-only (no shuffle, no
sampling state), and pushdown-friendly: the filter reaches the parquet
scan, so at 100 TB a 1% domain reads ~1% of its row groups' rows.

Precision is 1/65536 per rate (4 hex digits), same as split.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mix_threshold(rate: float) -> str:
    """4-hex-digit keep-threshold for one domain rate. Rate 1.0 maps to
    'g' — lexicographically above every hex string, so every row keeps
    (a 5-digit '10000' would sort BELOW most 4-digit hashes)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"domain rate must be in [0, 1], got {rate}")
    n = int(round(rate * 65536))
    return "g" if n >= 65536 else format(n, "04x")


def keep_column(key: Column, domain: Column,
                rates: dict[str, float], default_rate: float = 1.0,
                salt: str = "v1") -> Column:
    """Boolean keep-decision: md5(key:salt) first 4 hex digits compared
    against the row's domain threshold. Pure JVM expression."""
    h = F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(":" + salt))), 1, 4)
    chain = None
    for name, rate in rates.items():
        cond = domain == name
        branch = h < F.lit(mix_threshold(rate))
        chain = (F.when(cond, branch) if chain is None
                 else chain.when(cond, branch))
    dflt = h < F.lit(mix_threshold(default_rate))
    return chain.otherwise(dflt) if chain is not None else dflt


def domain_mix(df: DataFrame, rates: dict[str, float],
               key: str = "doc_id", domain: str = "source",
               default_rate: float = 1.0, salt: str = "v1") -> DataFrame:
    """Keep each row with its domain's rate, deterministically."""
    return df.where(keep_column(F.col(key), F.col(domain),
                                rates, default_rate, salt))
