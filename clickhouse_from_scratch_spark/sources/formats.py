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


def to_native(df: DataFrame) -> bytes:
    """CH ``Native`` format analogue: columnar blocks over the wire.

    The reference's only live format code is Native
    (``src/Formats/NativeWriter.cpp`` / ``NativeReader.cpp``) — columns
    serialized block-wise. Arrow IPC *is* that design in the open
    ecosystem, and Spark speaks it natively (``df.toArrow()``), so the
    Native surface here is an Arrow IPC stream."""
    import io

    import pyarrow as pa

    table = df.toArrow()
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue()


def from_native(spark: SparkSession, data: bytes) -> DataFrame:
    """Read an Arrow IPC stream (Native analogue) back to a DataFrame."""
    import io

    import pyarrow as pa

    table = pa.ipc.open_stream(io.BytesIO(data)).read_all()
    return spark.createDataFrame(table)


def _uleb128(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _read_uleb128(data: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


# Spark simpleString → struct pack letter (little-endian, CH wire widths)
_RB_PACK = {"bigint": "q", "int": "i", "smallint": "h", "tinyint": "b",
            "double": "d", "float": "f", "boolean": "B"}


def to_row_binary(df: DataFrame, n: int = 100000) -> bytes:
    """CH ``RowBinary``: rows of fixed-width little-endian scalars;
    String as ULEB128 length + UTF-8 bytes; Date as uint16 days since
    epoch; DateTime as uint32 unix seconds (RowBinary wire layout per
    the CH format docs; the reference registers the name in
    ``registerFormats.cpp``)."""
    import struct
    from datetime import date, datetime, timezone

    buf = bytearray()
    for row in df.limit(n).collect():
        for field, v in zip(df.schema.fields, row):
            t = field.dataType.simpleString()
            if t in _RB_PACK:
                buf += struct.pack("<" + _RB_PACK[t],
                                   int(v) if t == "boolean" else v)
            elif t == "string":
                raw = v.encode("utf-8")
                buf += _uleb128(len(raw)) + raw
            elif t == "date":
                buf += struct.pack("<H", (v - date(1970, 1, 1)).days)
            elif t.startswith("timestamp"):
                ts = v.replace(tzinfo=timezone.utc) if v.tzinfo is None else v
                buf += struct.pack("<I", int(ts.timestamp()))
            else:
                raise ValueError(f"RowBinary: unsupported type {t}")
    return bytes(buf)


def from_row_binary(spark: SparkSession, data: bytes,
                    schema: str) -> DataFrame:
    """Decode RowBinary bytes back into a DataFrame given a DDL schema."""
    import struct
    from datetime import date, datetime, timedelta, timezone

    from pyspark.sql.types import StructType

    st = StructType.fromDDL(schema)
    rows, pos = [], 0
    while pos < len(data):
        row = []
        for field in st.fields:
            t = field.dataType.simpleString()
            if t in _RB_PACK:
                fmtc = _RB_PACK[t]
                size = struct.calcsize("<" + fmtc)
                (v,) = struct.unpack_from("<" + fmtc, data, pos)
                pos += size
                row.append(bool(v) if t == "boolean" else v)
            elif t == "string":
                ln, pos = _read_uleb128(data, pos)
                row.append(data[pos:pos + ln].decode("utf-8"))
                pos += ln
            elif t == "date":
                (days,) = struct.unpack_from("<H", data, pos)
                pos += 2
                row.append(date(1970, 1, 1) + timedelta(days=days))
            elif t.startswith("timestamp"):
                (secs,) = struct.unpack_from("<I", data, pos)
                pos += 4
                row.append(datetime.fromtimestamp(secs, tz=timezone.utc)
                           .replace(tzinfo=None))
            else:
                raise ValueError(f"RowBinary: unsupported type {t}")
        rows.append(tuple(row))
    return spark.createDataFrame(rows, st)


_NUMERIC_TYPES = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def to_pretty(df: DataFrame, n: int = 20) -> str:
    """PrettyCompact console renderer: ClickHouse's box-drawing grid.

    ┌─a─┬─b──────┐
    │ 1 │ hello  │
    └───┴────────┘

    Numbers right-aligned, everything else left-aligned, NULL rendered
    as ᴺᵁᴸᴸ — matching clickhouse-client's default output format.
    """
    rows = df.limit(n).collect()
    names = df.columns
    is_num = [f.dataType.simpleString() in _NUMERIC_TYPES
              or f.dataType.simpleString().startswith("decimal")
              for f in df.schema.fields]
    cells = [["ᴺᵁᴸᴸ" if v is None else str(v) for v in r] for r in rows]
    widths = [max(len(names[i]), *( [len(r[i]) for r in cells] or [0] ))
              for i in range(len(names))]
    head = "┌─" + "─┬─".join(
        names[i] + "─" * (widths[i] - len(names[i]))
        for i in range(len(names))) + "─┐"
    body = ["│ " + " │ ".join(
        (r[i].rjust(widths[i]) if is_num[i] else r[i].ljust(widths[i]))
        for i in range(len(names))) + " │" for r in cells]
    foot = "└─" + "─┴─".join("─" * widths[i]
                             for i in range(len(names))) + "─┘"
    return "\n".join([head, *body, foot])


def to_tab_separated(df: DataFrame, n: int = 10000) -> str:
    """TabSeparated text output (CH's default client format)."""
    rows = df.limit(n).collect()
    return "\n".join("\t".join("" if v is None else str(v) for v in row)
                     for row in rows)
