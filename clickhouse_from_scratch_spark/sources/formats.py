"""Format registry — the FORMAT surface of the reference.

Reference: ``src/Formats/registerFormats.cpp:10-77`` declares the format
set (all registrations commented out there; only Native has live code —
``NativeWriter.cpp``/``NativeReader.cpp``). We implement the formats Spark
covers natively and the ClickHouse text formats as options on Spark's
CSV/JSON readers; Pretty* are console renderers.

Each entry: name → (reader kwargs for ``spark.read``, writer kwargs).
``INTO OUTFILE ... COMPRESSION`` (``ParserQueryWithOutput.cpp:83-99``) maps
to the ``compression`` option.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

# name → (spark format, read options, write options)
FORMATS: dict[str, tuple[str, dict[str, Any], dict[str, Any]]] = {
    "Parquet": ("parquet", {}, {}),
    "ORC": ("orc", {}, {}),
    "Avro": ("avro", {}, {}),
    "Arrow": ("parquet", {}, {}),  # Arrow IPC ≈ columnar interchange; parquet stands in locally
    "CSV": ("csv", {"header": "false"}, {"header": "false"}),
    "CSVWithNames": ("csv", {"header": "true"}, {"header": "true"}),
    "TabSeparated": ("csv", {"sep": "\t", "header": "false"},
                     {"sep": "\t", "header": "false"}),
    "TSV": ("csv", {"sep": "\t", "header": "false"},
            {"sep": "\t", "header": "false"}),
    "TabSeparatedWithNames": ("csv", {"sep": "\t", "header": "true"},
                              {"sep": "\t", "header": "true"}),
    "JSONEachRow": ("json", {}, {}),
    "JSONCompactEachRow": ("json", {}, {}),
    "LineAsString": ("text", {}, {}),
    "RawBLOB": ("binaryFile", {}, {}),
    "Null": ("noop", {}, {}),
}

_COMPRESSION = {"gzip": "gzip", "gz": "gzip", "zstd": "zstd", "lz4": "lz4",
                "snappy": "snappy", "none": "none"}


def read_format(spark: SparkSession, fmt: str, path: str,
                schema: str | None = None, **extra) -> DataFrame:
    """``INSERT ... FROM INFILE 'path' FORMAT fmt`` read path."""
    name, ropts, _ = FORMATS[fmt]
    reader = spark.read.format(name).options(**{**ropts, **extra})
    if schema:
        reader = reader.schema(schema)
    return reader.load(path)


def write_format(df: DataFrame, fmt: str, path: str,
                 compression: str | None = None, mode: str = "overwrite",
                 **extra) -> None:
    """``SELECT ... INTO OUTFILE 'path' [COMPRESSION 'm'] FORMAT fmt``."""
    name, _, wopts = FORMATS[fmt]
    if name == "noop":  # FORMAT Null — execute, discard rows
        df.write.format("noop").mode("overwrite").save()
        return
    opts = dict(wopts)
    if compression:
        opts["compression"] = _COMPRESSION[compression.lower()]
    df.write.format(name).options(**{**opts, **extra}).mode(mode).save(path)


def to_pretty(df: DataFrame, n: int = 20) -> str:
    """PrettyCompact console renderer (output-only format family)."""
    return df._show_string(n, 0, False)  # same renderer .show() uses


def to_tab_separated(df: DataFrame, n: int = 10000) -> str:
    """TabSeparated text output (CH's default client format)."""
    rows = df.limit(n).collect()
    return "\n".join("\t".join("" if v is None else str(v) for v in row)
                     for row in rows)
