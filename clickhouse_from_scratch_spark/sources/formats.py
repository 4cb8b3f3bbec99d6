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

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _parse_ddl_schema(spark: SparkSession, schema: str):
    """DDL schema string → StructType (via a zero-row reader probe,
    public API only)."""
    from pyspark.sql.types import StructType
    return StructType.fromDDL(schema)


# name → (spark format, read options, write options)
FORMATS: dict[str, tuple[str, dict[str, Any], dict[str, Any]]] = {
    "Parquet": ("parquet", {}, {}),
    "ORC": ("orc", {}, {}),
    "Avro": ("avro", {}, {}),
    # Arrow = IPC random-access file, ArrowStream = IPC stream
    # (registerFormats.cpp:31-34 declares both; real IPC here, shared
    # with the Native analogue below)
    "Arrow": ("arrow-ipc-file", {}, {}),
    "ArrowStream": ("arrow-ipc-stream", {}, {}),
    # CH CSV/TSV both render NULL as \N (formats docs) — make the
    # distributed Spark readers/writers speak the same convention
    # reads infer column types when no explicit structure is given,
    # like CH's schema inference for file() (schema arg overrides)
    "CSV": ("csv", {"header": "false", "nullValue": "\\N",
                    "inferSchema": "true", "escape": '"'},
            {"header": "false", "nullValue": "\\N"}),
    "CSVWithNames": ("csv", {"header": "true", "nullValue": "\\N",
                             "inferSchema": "true", "escape": '"'},
                     {"header": "true", "nullValue": "\\N"}),
    "TabSeparated": ("csv", {"sep": "\t", "header": "false",
                             "nullValue": "\\N", "inferSchema": "true"},
                     {"sep": "\t", "header": "false",
                      "nullValue": "\\N"}),
    "TSV": ("csv", {"sep": "\t", "header": "false", "nullValue": "\\N",
                    "inferSchema": "true"},
            {"sep": "\t", "header": "false", "nullValue": "\\N"}),
    "TabSeparatedWithNames": ("csv", {"sep": "\t", "header": "true",
                                      "nullValue": "\\N",
                                      "inferSchema": "true"},
                              {"sep": "\t", "header": "true",
                               "nullValue": "\\N"}),
    # common CH short aliases
    "TSVWithNames": ("csv", {"sep": "\t", "header": "true",
                             "nullValue": "\\N", "inferSchema": "true"},
                     {"sep": "\t", "header": "true",
                      "nullValue": "\\N"}),
    # Native ≙ Arrow IPC stream (the reference's only live format code;
    # see to_native/from_native below)
    "Native": ("arrow-ipc-stream", {}, {}),
    "JSONEachRow": ("json", {}, {}),
    # rows are top-level ARRAYS, not objects — Spark's json reader
    # cannot map them to named columns, so a dedicated lowering parses
    # each line as array<string> and casts positionally (distributed)
    "JSONCompactEachRow": ("json-compact-rows", {}, {}),
    # regex-per-line input (reference registerInputFormatRegexp;
    # settings format_regexp / format_regexp_skip_unmatched drive it)
    "Regexp": ("regexp-rows", {}, {}),
    "LineAsString": ("text", {}, {}),
    "JSONAsString": ("json-as-string", {}, {}),
    # names row + TYPES row (row 2 is the CH type list, stripped by the
    # reader lowering)
    "TabSeparatedWithNamesAndTypes": ("tsv-names-types",
                                      {"sep": "\t"}, {}),
    "TSVWithNamesAndTypes": ("tsv-names-types", {"sep": "\t"}, {}),
    "CSVWithNamesAndTypes": ("tsv-names-types", {"sep": ","}, {}),
    # every value carried as a JSON string, cast to the declared type
    "JSONStringsEachRow": ("json-strings-rows", {}, {}),
    "JSONCompactStringsEachRow": ("json-compact-rows", {}, {}),
    # key=value pairs separated by tabs
    "TSKV": ("tskv-rows", {}, {}),
    "RawBLOB": ("binaryFile", {}, {}),
    "Null": ("noop", {}, {}),
}

_COMPRESSION = {"gzip": "gzip", "gz": "gzip", "zstd": "zstd", "lz4": "lz4",
                "snappy": "snappy", "none": "none"}


def read_format(spark: SparkSession, fmt: str, path: str,
                schema: str | None = None, **extra) -> DataFrame:
    """``INSERT ... FROM INFILE 'path' FORMAT fmt`` read path."""
    name, ropts, _ = FORMATS[fmt]
    if name == "json-as-string":
        return read_json_as_string(spark, path)
    if name == "regexp-rows":
        # Regexp format: each line matched against format_regexp; group
        # i binds column i. Distributed text scan + JVM regexp_extract;
        # unmatched lines raise unless format_regexp_skip_unmatched=1
        # (CH raises "Line ... doesn't match the regexp").
        regex = extra.get("regex") or ""
        if not regex:
            raise ValueError(
                "FORMAT Regexp requires SET format_regexp = '...'")
        if not schema:
            raise ValueError("FORMAT Regexp requires a schema")
        skip = bool(extra.get("skip_unmatched", False))
        st = _parse_ddl_schema(spark, schema)
        txt = spark.read.text(path).where(F.length("value") > 0)
        matched = F.col("value").rlike(regex)
        if skip:
            txt = txt.where(matched)
        else:
            txt = txt.select(F.when(matched, F.col("value")).otherwise(
                F.raise_error(F.concat(
                    F.lit("Line \""), F.col("value"),
                    F.lit("\" doesn't match the regexp "
                          "(format_regexp_skip_unmatched=0)")))
            ).alias("value"))
        return txt.select(*[
            F.regexp_extract("value", regex, i + 1).cast(f.dataType)
             .alias(f.name)
            for i, f in enumerate(st.fields)])
    if name == "tsv-names-types":
        # WithNamesAndTypes: line 1 = names, line 2 = CH types. The
        # names row maps csv columns; the types row is identified by
        # its literal content (read driver-side from the file head —
        # both header lines are by definition at the top) and filtered
        # out. A data row equal to the type row in EVERY column cannot
        # be distinguished — documented edge, absurd in practice.
        sep = ropts.get("sep", "\t")
        with open(path, "r", encoding="utf-8") as fh:
            names_line = fh.readline().rstrip("\n").rstrip("\r")
            types_line = fh.readline().rstrip("\n").rstrip("\r")
        names = names_line.split(sep)
        types_vals = types_line.split(sep)
        df = (spark.read.format("csv")
              .options(sep=sep, header="true", nullValue="\\N",
                       inferSchema="false")
              .load(path))
        cond = None
        for n, tv in zip(names, types_vals):
            c = (F.col(f"`{n}`") == tv)
            cond = c if cond is None else (cond & c)
        if cond is not None:
            df = df.where(~F.coalesce(cond, F.lit(False)))
        if schema:
            st = _parse_ddl_schema(spark, schema)
            by_name = {f.name: f.dataType for f in st.fields}
            df = df.select(*[
                F.col(f"`{n}`").cast(by_name[n]).alias(n)
                if n in by_name else F.col(f"`{n}`") for n in names])
        return df
    if name == "json-strings-rows":
        # JSONStringsEachRow: {"a": "1"} — values arrive as strings;
        # parse each line as map<string,string> and cast to declared
        if not schema:
            raise ValueError("JSONStringsEachRow requires a schema")
        st = _parse_ddl_schema(spark, schema)
        txt = spark.read.text(path).where(F.length(F.trim("value")) > 0)
        m = F.from_json(F.col("value"), "map<string,string>")
        return txt.select(*[
            F.element_at(m, f.name).cast(f.dataType).alias(f.name)
            for f in st.fields])
    if name == "tskv-rows":
        # TSKV input: tab-separated key=value pairs per line
        if not schema:
            raise ValueError("TSKV requires a schema")
        st = _parse_ddl_schema(spark, schema)
        txt = spark.read.text(path).where(F.length(F.trim("value")) > 0)
        m = F.str_to_map(F.col("value"), F.lit("\t"), F.lit("="))
        return txt.select(*[
            F.when(F.element_at(m, f.name) == "\\N", None)
             .otherwise(F.element_at(m, f.name))
             .cast(f.dataType).alias(f.name)
            for f in st.fields])
    if name == "json-compact-rows":
        # JSONCompactEachRow: one top-level JSON array per line. Parse
        # as array<string> (scalars and nested composites coerce to
        # their JSON text) and cast each position to the declared type —
        # stays a distributed text scan + JVM from_json, no driver loop.
        if not schema:
            raise ValueError("JSONCompactEachRow requires a schema")
        st = _parse_ddl_schema(spark, schema)
        txt = spark.read.text(path).where(F.length(F.trim("value")) > 0)
        arr = F.from_json(F.col("value"), "array<string>")
        return txt.select(*[
            F.element_at(arr, i + 1).cast(f.dataType).alias(f.name)
            for i, f in enumerate(st.fields)])
    if name.startswith("arrow-ipc"):
        import pyarrow as pa

        with open(path, "rb") as fh:
            if name == "arrow-ipc-file":
                table = pa.ipc.open_file(fh).read_all()
            else:
                table = pa.ipc.open_stream(fh).read_all()
        return spark.createDataFrame(table)
    reader = spark.read.format(name).options(**{**ropts, **extra})
    if schema:
        reader = reader.schema(schema)
    return reader.load(path)


def _ch_text_cell_col(field, tsv: bool, bool_as_int: bool = False):
    """One output cell rendered CH-style, pure JVM (distributed):
    CSV always double-quotes String/Date/DateTime (published CSV format
    contract); TSV backslash-escapes instead of quoting; floats drop a
    trailing .0; decimals trim trailing zeros; NULL is \\N; composites
    (arrays/tuples/maps) use the CH literal form via the builder's
    ``_ch_literal_render`` kernel; UInt8-typed booleans render 1/0."""
    dt = field.dataType.simpleString()
    c = F.col(f"`{field.name}`")

    def quote(s):
        if tsv:
            return s
        return F.concat(F.lit('"'),
                        F.replace(s, F.lit('"'), F.lit('""')), F.lit('"'))

    if dt in ("string", "binary"):
        s = c.cast("string")
        if tsv:
            for frm, to in (("\\", "\\\\"), ("\t", "\\t"),
                            ("\n", "\\n"), ("\r", "\\r")):
                s = F.replace(s, F.lit(frm), F.lit(to))
            out = s
        else:
            out = quote(s)
    elif dt == "date":
        out = quote(F.date_format(c, "yyyy-MM-dd"))
    elif dt.startswith("timestamp"):
        out = quote(F.date_format(c, "yyyy-MM-dd HH:mm:ss"))
    elif dt in ("float", "double"):
        out = F.regexp_replace(c.cast("string"), r"\.0$", "")
    elif dt.startswith("decimal"):
        s = c.cast("string")
        out = F.when(
            s.contains("."),
            F.regexp_replace(F.regexp_replace(s, "0+$", ""), r"\.$", "")
        ).otherwise(s)
    elif dt == "boolean":
        out = (F.when(c, F.lit("1")).otherwise(F.lit("0")) if bool_as_int
               else F.when(c, F.lit("true")).otherwise(F.lit("false")))
    elif dt.startswith(("array<", "struct<", "map<")):
        from ..plans.builder import _ch_literal_render
        out = quote(_ch_literal_render(c, field.dataType))
    else:
        out = c.cast("string")
    return F.when(c.isNull(), F.lit("\\N")).otherwise(out)


def write_format(df: DataFrame, fmt: str, path: str,
                 compression: str | None = None, mode: str = "overwrite",
                 **extra) -> None:
    """``SELECT ... INTO OUTFILE 'path' [COMPRESSION 'm'] FORMAT fmt``."""
    name, _, wopts = FORMATS[fmt]
    if name == "noop":  # FORMAT Null — execute, discard rows
        df.write.format("noop").mode("overwrite").save()
        return
    if name.startswith("arrow-ipc"):
        # INTO OUTFILE is a single client-side file in CH too
        # (ClientBase writes the whole result locally), so a driver-side
        # df.toArrow() matches semantics; for distributed Arrow output
        # at scale use FORMAT Parquet instead. IPC body compression is
        # buffer-level (lz4/zstd only, per the Arrow spec).
        import pyarrow as pa

        opts = None
        if compression:
            codec = {"lz4": "lz4", "zstd": "zstd"}.get(compression.lower())
            if codec is None:
                raise ValueError(
                    f"Arrow IPC supports lz4/zstd compression, "
                    f"not {compression!r}")
            opts = pa.ipc.IpcWriteOptions(compression=codec)
        table = df.toArrow()
        new = (pa.ipc.new_file if name == "arrow-ipc-file"
               else pa.ipc.new_stream)
        with open(path, "wb") as fh, \
                new(fh, table.schema, options=opts) as w:
            w.write_table(table)
        return
    opts = dict(wopts)
    if compression:
        opts["compression"] = _COMPRESSION[compression.lower()]
    header_names: list[str] | None = None
    sep = opts.get("sep", ",")
    if name == "csv" and not compression:
        # CH text conventions, which Spark's csv writer cannot produce:
        # CSV always double-quotes String/Date/DateTime cells; TSV
        # backslash-ESCAPES instead of quoting. Pre-render every cell
        # JVM-side, join with the separator, and write through the raw
        # TEXT writer so no second-level quoting ever applies.
        # (Compressed output keeps the plain csv writer — splicing a
        # header into a compressed stream is not worth the delta.)
        tsv = sep == "\t"
        u8 = _u8_cols(df)
        rendered = [_ch_text_cell_col(f, tsv=tsv, bool_as_int=f.name in u8)
                    for f in df.schema.fields]
        if opts.get("header") == "true":
            # CH quotes CSV header names too; prepended onto the single
            # output file below
            q = '"' if not tsv else ""
            header_names = [q + f.replace('"', '""') + q
                            for f in df.columns]
        df = df.select(F.concat_ws(sep, *rendered).alias("value"))
        name, opts = "text", {}
    # CH INTO OUTFILE produces ONE file at the named path (ClientBase
    # writes the result client-side); Spark's writer emits a directory
    # of part files, so write to a sibling dir and move the single part
    # into place. INTO OUTFILE is inherently a single-file artifact —
    # for distributed multi-file output use the table write path.
    import glob
    import shutil
    tmp = path + ".spark-out"
    (df.coalesce(1).write.format(name)
     .options(**{**opts, **extra}).mode(mode).save(tmp))
    parts = [p for p in glob.glob(os.path.join(tmp, "part-*"))
             if not p.endswith(".crc")]
    if len(parts) == 1:
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)
        shutil.move(parts[0], path)
        shutil.rmtree(tmp, ignore_errors=True)
        if header_names is not None and not compression:
            # CH writes the (quoted) header itself; splice it onto the
            # single client-side artifact
            with open(path, "r+", encoding="utf-8") as fh:
                body = fh.read()
                fh.seek(0)
                fh.write(sep.join(header_names) + "\n" + body)
    else:   # zero parts (empty writer quirk): keep the directory form
        if os.path.exists(path):
            shutil.rmtree(path) if os.path.isdir(path) else os.remove(path)
        shutil.move(tmp, path)


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


# --- MsgPackEachRow ---------------------------------------------------------
# MessagePack wire encoding per the public spec (msgpack.org); the
# reference declares the format (registerFormats.cpp:41-42, registration
# commented out at :114-115). Like CH MsgPackEachRow, each row is its
# fields' values serialized back-to-back (no per-row array header) —
# the schema drives decoding. Date ≙ uint days since epoch, DateTime ≙
# uint unix seconds, matching the RowBinary choices above.

def _mp_int(v: int) -> bytes:
    import struct

    if 0 <= v <= 0x7F:
        return bytes([v])                       # positive fixint
    if -32 <= v < 0:
        return struct.pack("b", v)              # negative fixint
    if v >= 0:
        for fmt, code, hi in (("B", 0xCC, 1 << 8), ("H", 0xCD, 1 << 16),
                              ("I", 0xCE, 1 << 32), ("Q", 0xCF, 1 << 64)):
            if v < hi:
                return bytes([code]) + struct.pack(">" + fmt, v)
    for fmt, code, lo in (("b", 0xD0, -(1 << 7)), ("h", 0xD1, -(1 << 15)),
                          ("i", 0xD2, -(1 << 31)), ("q", 0xD3, -(1 << 63))):
        if v >= lo:
            return bytes([code]) + struct.pack(">" + fmt, v)
    raise ValueError(f"int out of MessagePack range: {v}")


def _mp_value(v, t: str) -> bytes:
    import struct
    from datetime import date, timezone

    if v is None:
        return b"\xc0"
    if t == "boolean":
        return b"\xc3" if v else b"\xc2"
    if t in ("tinyint", "smallint", "int", "bigint"):
        return _mp_int(int(v))
    if t == "float":
        return b"\xca" + struct.pack(">f", v)
    if t == "double":
        return b"\xcb" + struct.pack(">d", v)
    if t == "string":
        raw = v.encode("utf-8")
        n = len(raw)
        if n <= 31:
            return bytes([0xA0 | n]) + raw
        if n < 1 << 8:
            return b"\xd9" + bytes([n]) + raw
        if n < 1 << 16:
            return b"\xda" + struct.pack(">H", n) + raw
        return b"\xdb" + struct.pack(">I", n) + raw
    if t == "binary":
        n = len(v)
        if n < 1 << 8:
            return b"\xc4" + bytes([n]) + bytes(v)
        if n < 1 << 16:
            return b"\xc5" + struct.pack(">H", n) + bytes(v)
        return b"\xc6" + struct.pack(">I", n) + bytes(v)
    if t == "date":
        return _mp_int((v - date(1970, 1, 1)).days)
    if t.startswith("timestamp"):
        ts = v.replace(tzinfo=timezone.utc) if v.tzinfo is None else v
        return _mp_int(int(ts.timestamp()))
    if t.startswith("array<"):
        elem = t[6:-1]
        n = len(v)
        if n <= 15:
            head = bytes([0x90 | n])
        elif n < 1 << 16:
            head = b"\xdc" + struct.pack(">H", n)
        else:
            head = b"\xdd" + struct.pack(">I", n)
        return head + b"".join(_mp_value(e, elem) for e in v)
    raise ValueError(f"MsgPack: unsupported type {t}")


def to_msgpack(df: DataFrame, n: int = 100000) -> bytes:
    """CH ``MsgPackEachRow`` output: rows of MessagePack values."""
    buf = bytearray()
    for row in df.limit(n).collect():
        for field, v in zip(df.schema.fields, row):
            buf += _mp_value(v, field.dataType.simpleString())
    return bytes(buf)


def _mp_decode(data: bytes, pos: int):
    """Decode one MessagePack value → (python value, new pos)."""
    import struct

    b = data[pos]
    pos += 1
    if b <= 0x7F:
        return b, pos
    if b >= 0xE0:
        return b - 256, pos
    if 0xA0 <= b <= 0xBF:
        n = b & 0x1F
        return data[pos:pos + n].decode("utf-8"), pos + n
    if 0x90 <= b <= 0x9F:
        out = []
        for _ in range(b & 0x0F):
            v, pos = _mp_decode(data, pos)
            out.append(v)
        return out, pos
    simple = {0xC0: None, 0xC2: False, 0xC3: True}
    if b in simple:
        return simple[b], pos
    fixed = {0xCA: (">f", 4), 0xCB: (">d", 8), 0xCC: (">B", 1),
             0xCD: (">H", 2), 0xCE: (">I", 4), 0xCF: (">Q", 8),
             0xD0: (">b", 1), 0xD1: (">h", 2), 0xD2: (">i", 4),
             0xD3: (">q", 8)}
    if b in fixed:
        fmt, size = fixed[b]
        (v,) = struct.unpack_from(fmt, data, pos)
        return v, pos + size
    if b in (0xD9, 0xDA, 0xDB, 0xC4, 0xC5, 0xC6):
        size = {0xD9: 1, 0xC4: 1, 0xDA: 2, 0xC5: 2, 0xDB: 4, 0xC6: 4}[b]
        n = int.from_bytes(data[pos:pos + size], "big")
        pos += size
        raw = data[pos:pos + n]
        pos += n
        return (raw.decode("utf-8") if b in (0xD9, 0xDA, 0xDB)
                else bytes(raw)), pos
    if b in (0xDC, 0xDD):
        size = 2 if b == 0xDC else 4
        n = int.from_bytes(data[pos:pos + size], "big")
        pos += size
        out = []
        for _ in range(n):
            v, pos = _mp_decode(data, pos)
            out.append(v)
        return out, pos
    raise ValueError(f"MsgPack: unsupported marker 0x{b:02x}")


def from_msgpack(spark: SparkSession, data: bytes, schema: str) -> DataFrame:
    """Decode MsgPackEachRow bytes back into a DataFrame given a DDL
    schema (the value stream is self-describing; the schema maps uint
    days/seconds back to Date/DateTime and fixes column names)."""
    from datetime import date, datetime, timedelta, timezone

    from pyspark.sql.types import StructType

    st = StructType.fromDDL(schema)
    rows, pos = [], 0
    while pos < len(data):
        row = []
        for field in st.fields:
            t = field.dataType.simpleString()
            v, pos = _mp_decode(data, pos)
            if v is not None:
                if t == "date":
                    v = date(1970, 1, 1) + timedelta(days=v)
                elif t.startswith("timestamp"):
                    v = (datetime.fromtimestamp(v, tz=timezone.utc)
                         .replace(tzinfo=None))
                elif t == "boolean":
                    v = bool(v)
                elif t in ("float", "double"):
                    v = float(v)
            row.append(v)
        rows.append(tuple(row))
    return spark.createDataFrame(rows, st)


_NUMERIC_TYPES = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def to_pretty(df: DataFrame, n: int = 20,
              style: str = "compact") -> str:
    """Pretty-family console renderer: ClickHouse's box-drawing grid.

    ┌─a─┬─b──────┐
    │ 1 │ hello  │
    └───┴────────┘

    Numbers right-aligned, everything else left-aligned, NULL rendered
    as ᴺᵁᴸᴸ — matching clickhouse-client's default output format.
    ``style``: 'compact' (above), 'full' (FORMAT Pretty's heavy-ruled
    header box), 'space' (PrettySpace, no grid).
    """
    tot = getattr(df, "_ch_totals_df", None)
    ext = getattr(df, "_ch_extremes_df", None)
    u8 = _u8_cols(df)
    if tot is not None or ext is not None:
        # WITH TOTALS / SET extremes=1: clickhouse-client prints each as
        # a separate box under a "Totals:" / "Extremes:" header, after
        # the main result block (_pretty_box is the plain renderer —
        # main may be df itself when only extremes are attached)
        main = getattr(df, "_ch_main_df", df)
        main._ch_uint64_cols = getattr(df, "_ch_uint64_cols",
                                       frozenset())
        out = _pretty_box(main, n, u8, style)
        if tot is not None:
            out += "\n\nTotals:\n" + _pretty_box(tot, 1, u8, style)
        if ext is not None:
            out += "\n\nExtremes:\n" + _pretty_box(ext, 2, u8, style)
        return out
    return _pretty_box(df, n, u8, style)


def _pretty_box(df: DataFrame, n: int = 20,
                u8: frozenset = frozenset(),
                style: str = "compact") -> str:
    """One result block in a Pretty-family style.

    ``compact`` (the client default): column names embedded in the top
    border — ``┌─a─┬─b──┐``. ``full`` (FORMAT Pretty): heavy-ruled
    header box ``┏━┳━┓ / ┃ name ┃ / ┡━╇━┩`` above the light body grid.
    ``space`` (FORMAT PrettySpace): no grid, space-padded columns with
    a leading space per the published examples."""
    import unicodedata

    def disp_w(s: str) -> int:
        return sum(2 if unicodedata.east_asian_width(c) in "WF" else 1
                   for c in s)

    rows = _collect_rows(df, n)
    names = df.columns
    is_num = [f.dataType.simpleString() in _NUMERIC_TYPES
              or f.dataType.simpleString().startswith("decimal")
              or (f.dataType.simpleString() == "boolean"
                  and f.name in u8)          # UInt8 → numeric alignment
              for f in df.schema.fields]
    cells = [["ᴺᵁᴸᴸ" if v is None
              else _ch_literal(v, bool_as_int=names[i] in u8)
              for i, v in enumerate(r)] for r in rows]
    widths = [max(disp_w(names[i]),
                  *([disp_w(r[i]) for r in cells] or [0]))
              for i in range(len(names))]

    def pad(s: str, w: int, right: bool, fill: str = " ") -> str:
        gap = fill * (w - disp_w(s))
        return gap + s if right else s + gap

    k = len(names)
    body = ["│ " + " │ ".join(
        pad(r[i], widths[i], is_num[i])
        for i in range(k)) + " │" for r in cells]
    foot = "└─" + "─┴─".join("─" * widths[i]
                             for i in range(k)) + "─┘"
    if style == "space":
        # header names right-aligned over numeric columns, single-space
        # column gap, leading space — no borders at all
        head = " " + "   ".join(pad(names[i], widths[i], is_num[i])
                                for i in range(k))
        data = [" " + "   ".join(pad(r[i], widths[i], is_num[i])
                                 for i in range(k)) for r in cells]
        return "\n".join([head.rstrip(), *(d.rstrip() for d in data)])
    if style == "full":
        top = "┏━" + "━┳━".join("━" * widths[i] for i in range(k)) + "━┓"
        hdr = "┃ " + " ┃ ".join(pad(names[i], widths[i], is_num[i])
                                for i in range(k)) + " ┃"
        sep = "┡━" + "━╇━".join("━" * widths[i] for i in range(k)) + "━┩"
        return "\n".join([top, hdr, sep, *body, foot])
    # clickhouse-client right-aligns header names of numeric columns
    head = "┌─" + "─┬─".join(
        pad(names[i], widths[i], is_num[i], "─")
        for i in range(k)) + "─┐"
    return "\n".join([head, *body, foot])


def _dec_str(v) -> str:
    """Decimal text: CH trims trailing fractional zeros by default
    (output_format_decimal_trailing_zeros = false)."""
    s = str(v)
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return s or "0"


def _split_simple_args(body: str) -> list[str]:
    """Split a simpleString type-arg body at top-level commas
    ('a:int,b:array<int>' → ['a:int', 'b:array<int>'])."""
    out: list[str] = []
    depth, cur = 0, []
    for ch in body:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _struct_field_types(simple: str) -> list[str]:
    """Field types of a 'struct<a:int,b:string>' simpleString."""
    return [p.split(":", 1)[1] for p in _split_simple_args(simple[7:-1])
            if ":" in p]


def _ch_literal(v, quoted: bool = False, bool_as_int: bool = False) -> str:
    """CH literal text of a collected value — the driver-side twin of
    the builder's ``_ch_literal_render`` (the oracled ``toString``
    kernel): tuples ``(1,'a')``, arrays ``['a','b']``, maps
    ``{'k':[1,2]}`` — no spaces, strings/dates single-quoted inside
    composites with backslash escaping, floats trimmed of the integral
    ``.0``, NULL elements spelled ``NULL``. ``bool_as_int`` renders a
    boolean as the UInt8 ``1``/``0`` (predicate results in CH)."""
    import datetime
    import decimal

    from pyspark.sql import Row
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        if bool_as_int:
            return "1" if v else "0"
        return "true" if v else "false"
    if isinstance(v, Row):
        return "(" + ",".join(
            _ch_literal(x, True, bool_as_int) for x in v) + ")"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(
            _ch_literal(x, True, bool_as_int) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            _ch_literal(k, True, bool_as_int) + ":"
            + _ch_literal(x, True, bool_as_int)
            for k, x in v.items()) + "}"
    if isinstance(v, decimal.Decimal):
        return _dec_str(v)
    if isinstance(v, float):
        s = str(v)
        return s[:-2] if s.endswith(".0") else s
    if isinstance(v, datetime.datetime):
        s = v.strftime("%Y-%m-%d %H:%M:%S")
        return "'" + s + "'" if quoted else s
    if isinstance(v, datetime.date):
        s = v.isoformat()
        return "'" + s + "'" if quoted else s
    if isinstance(v, (bytes, bytearray)):
        v = bytes(v).decode("utf-8", "replace")
    if isinstance(v, str):
        if quoted:
            return ("'" + v.replace("\\", "\\\\").replace("'", "\\'")
                    + "'")
        return v
    return str(v)


def _u8_cols(df: DataFrame) -> frozenset:
    """Output columns the builder marked as UInt8-typed booleans
    (predicate results — rendered 1/0, not true/false)."""
    return getattr(df, "_ch_uint8_cols", frozenset())


def _collect_rows(df: DataFrame, n: int, u64: frozenset | None = None):
    """``limit(n).collect()`` plus the UInt64-as-Long display fix:
    columns the builder marked dialect-UInt64 (``_ch_uint64_cols``)
    re-base negative longs by +2^64, so 0xFFFF… renders as
    18446744073709551615 — the way CH prints UInt64 — instead of -1.
    Rows come back as plain tuples (positional/zip access only)."""
    rows = df.limit(n).collect()
    if u64 is None:
        u64 = getattr(df, "_ch_uint64_cols", frozenset())
    if not u64:
        return rows
    ids = {i for i, nm in enumerate(df.columns) if nm in u64}
    return [tuple((v + (1 << 64))
                  if i in ids and isinstance(v, int)
                  and not isinstance(v, bool) and v < 0 else v
                  for i, v in enumerate(r))
            for r in rows]


def _text_cell(v, simple: str, quote_strings: bool,
               bool_as_int: bool = False, nested: bool = False) -> str:
    """One CH text-format cell (TabSeparated/CSV array conventions):
    escaped strings, [..] arrays / (..) tuples / {..} maps with no
    spaces and quoted string elements, trimmed decimals,
    seconds-precision DateTime. A NULL element INSIDE a composite
    spells ``NULL`` (the literal form); a top-level NULL is ``\\N``."""
    import datetime
    if v is None:
        return "NULL" if nested else "\\N"
    if simple == "boolean":
        if bool_as_int:
            return "1" if v else "0"
        return "true" if v else "false"
    if simple.startswith("decimal"):
        return _dec_str(v)
    if simple in ("float", "double"):
        out = str(v)
        return out[:-2] if out.endswith(".0") else out
    if simple.startswith("array<"):
        inner = simple[6:-1]
        return "[" + ",".join(
            _text_cell(x, inner, quote_strings=True,
                       bool_as_int=bool_as_int, nested=True)
            for x in v) + "]"
    if simple.startswith("struct<"):
        inners = _struct_field_types(simple)
        return "(" + ",".join(
            _text_cell(x, t, quote_strings=True,
                       bool_as_int=bool_as_int, nested=True)
            for x, t in zip(v, inners)) + ")"
    if simple.startswith("map<"):
        kv = _split_simple_args(simple[4:-1])
        kt, vt = (kv + ["string", "string"])[:2]
        return "{" + ",".join(
            _text_cell(k, kt, quote_strings=True,
                       bool_as_int=bool_as_int, nested=True)
            + ":" + _text_cell(x, vt, quote_strings=True,
                               bool_as_int=bool_as_int, nested=True)
            for k, x in v.items()) + "}"
    if simple.startswith("timestamp") and isinstance(v, datetime.datetime):
        s = v.strftime("%Y-%m-%d %H:%M:%S")
        return "'" + s + "'" if quote_strings else s
    if simple == "date" and isinstance(v, datetime.date):
        s = v.isoformat()
        return "'" + s + "'" if quote_strings else s
    if simple in ("string", "binary"):
        sv = _tsv_escape(str(v))
        return "'" + sv.replace("'", "\\'") + "'" if quote_strings else sv
    return str(v)


def to_tab_separated(df: DataFrame, n: int = 10000) -> str:
    """TabSeparated text output (CH's default client format): NULL is
    ``\\N``, strings backslash-escape tab/newline, arrays render as
    ``[1,2]`` with quoted string elements, decimals trim trailing
    zeros."""
    simples = [f.dataType.simpleString() for f in df.schema.fields]
    u8 = _u8_cols(df)
    names = df.columns
    rows = _collect_rows(df, n)
    return "\n".join(
        "\t".join(_text_cell(v, t, quote_strings=False,
                             bool_as_int=names[i] in u8)
                  for i, (v, t) in enumerate(zip(row, simples)))
        for row in rows)


# --- ClickHouse text formats (registerFormats.cpp:10-77 tail) --------------
# These are console/interchange renderers: inherently driver-side (they
# produce ONE ordered text document). Large exports should use the
# distributed writers above (CSV/TSV/Parquet/ORC); these cap at `n` rows.

_CH_TYPE = {"bigint": "Int64", "int": "Int32", "smallint": "Int16",
            "tinyint": "Int8", "double": "Float64", "float": "Float32",
            "string": "String", "date": "Date", "timestamp": "DateTime",
            "timestamp_ntz": "DateTime", "boolean": "Bool",
            "binary": "String"}


def _ch_type(simple: str) -> str:
    if simple in _CH_TYPE:
        return _CH_TYPE[simple]
    if simple.startswith("array<") and simple.endswith(">"):
        return f"Array({_ch_type(simple[6:-1])})"
    if simple.startswith("decimal"):
        return "Decimal" + simple[7:]
    return "String"


def _tsv_escape(s: str) -> str:
    return (s.replace("\\", "\\\\").replace("\t", "\\t")
            .replace("\n", "\\n").replace("\r", "\\r"))


def _quote(v) -> str:
    """CH single-quoted string literal with backslash escaping."""
    return "'" + str(v).replace("\\", "\\\\").replace("'", "\\'") + "'"


def _values_cell(v, simple: str, bool_as_int: bool = False) -> str:
    if v is None:
        return "NULL"
    if simple == "boolean":
        if bool_as_int:
            return "1" if v else "0"
        return "true" if v else "false"
    if simple.startswith("decimal"):
        return _dec_str(v)
    if simple in _NUMERIC_TYPES:
        return str(v)
    if simple.startswith("array<"):
        inner = simple[6:-1]
        return "[" + ",".join(
            _values_cell(x, inner, bool_as_int) for x in v) + "]"
    if simple.startswith("struct<"):
        inners = _struct_field_types(simple)
        return "(" + ",".join(
            _values_cell(x, t, bool_as_int)
            for x, t in zip(v, inners)) + ")"
    if simple.startswith("map<"):
        kv = _split_simple_args(simple[4:-1])
        kt, vt = (kv + ["string", "string"])[:2]
        return "{" + ",".join(
            _values_cell(k, kt, bool_as_int) + ":"
            + _values_cell(x, vt, bool_as_int)
            for k, x in v.items()) + "}"
    import datetime
    if simple.startswith("timestamp") and isinstance(v, datetime.datetime):
        return "'" + v.strftime("%Y-%m-%d %H:%M:%S") + "'"
    return _quote(v)


def to_values(df: DataFrame, n: int = 10000) -> str:
    """``Values`` output: ``(1,'a'),(2,'b')`` — the same syntax INSERT
    accepts, strings single-quoted with backslash escapes, NULL bare."""
    simples = [f.dataType.simpleString() for f in df.schema.fields]
    u8 = _u8_cols(df)
    names = df.columns
    return ",".join(
        "(" + ",".join(_values_cell(v, t, names[i] in u8)
                       for i, (v, t) in enumerate(zip(row, simples))) + ")"
        for row in _collect_rows(df, n))


def to_vertical(df: DataFrame, n: int = 10000) -> str:
    """``Vertical`` output: one ``Row N:`` block per row, a ─ rule under
    the header, column names padded so values align — clickhouse-client's
    ``\\G`` format."""
    tot = getattr(df, "_ch_totals_df", None)
    ext = getattr(df, "_ch_extremes_df", None)
    u8 = _u8_cols(df)
    if tot is not None or ext is not None:
        # separate Totals/Extremes blocks, same as clickhouse-client's
        # \G output

        def block(head: str, frame: DataFrame, m: int) -> str:
            names = frame.columns
            pad = max((len(c) for c in names), default=0) + 1
            lines = [head, "─" * len(head)]
            for row in frame.limit(m).collect():
                lines += [f"{name + ':':<{pad + 1}}"
                          f"{'ᴺᵁᴸᴸ' if v is None else _ch_literal(v, bool_as_int=name in u8)}"
                          for name, v in zip(names, row)]
            return "\n".join(lines)

        main = getattr(df, "_ch_main_df", df)
        main._ch_uint64_cols = getattr(df, "_ch_uint64_cols",
                                       frozenset())
        out = _vertical_rows(main, n, u8)
        if tot is not None:
            out += "\n\n" + block("Totals:", tot, 1)
        if ext is not None:
            out += "\n\n" + block("Extremes:", ext, 2)
        return out
    return _vertical_rows(df, n, u8)


def _vertical_rows(df: DataFrame, n: int = 10000,
                   u8: frozenset = frozenset()) -> str:
    names = df.columns
    pad = max((len(c) for c in names), default=0) + 1   # name + ':'
    blocks = []
    for i, row in enumerate(_collect_rows(df, n), 1):
        head = f"Row {i}:"
        lines = [head, "─" * len(head)]
        lines += [f"{name + ':':<{pad + 1}}"
                  f"{'ᴺᵁᴸᴸ' if v is None else _ch_literal(v, bool_as_int=name in u8)}"
                  for name, v in zip(names, row)]
        blocks.append("\n".join(lines))
    return "\n\n".join(blocks)


def to_tskv(df: DataFrame, n: int = 10000) -> str:
    """``TSKV``: ``name=value`` pairs tab-separated, TSV escaping, NULL
    as ``\\N``."""
    names = [_tsv_escape(c).replace("=", "\\=") for c in df.columns]
    u8 = _u8_cols(df)
    raw = df.columns
    null = "\\N"
    return "\n".join(
        "\t".join(k + "=" + (null if v is None else _tsv_escape(
            _ch_literal(v, bool_as_int=raw[i] in u8)))
                  for i, (k, v) in enumerate(zip(names, row)))
        for row in _collect_rows(df, n))


def to_markdown(df: DataFrame, n: int = 10000) -> str:
    """``Markdown`` output: header row, alignment rule (numbers right),
    pipe-escaped cells."""
    is_num = [f.dataType.simpleString() in _NUMERIC_TYPES
              or f.dataType.simpleString().startswith("decimal")
              for f in df.schema.fields]
    u8 = _u8_cols(df)
    names = df.columns
    esc = lambda s: s.replace("|", "\\|")  # noqa: E731
    out = ["| " + " | ".join(esc(c) for c in df.columns) + " |",
           "|" + "|".join("---:" if num else ":---" for num in is_num) + "|"]
    out += ["| " + " | ".join(
        "ᴺᵁᴸᴸ" if v is None
        else esc(_ch_literal(v, bool_as_int=names[i] in u8))
        for i, v in enumerate(row)) + " |"
        for row in _collect_rows(df, n)]
    return "\n".join(out)


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace("'", "&apos;")
            .replace('"', "&quot;"))


def to_xml(df: DataFrame, n: int = 10000) -> str:
    """``XML`` document output: meta (name+CH type), data rows, rows
    count — the reference's declared XML layout."""
    rows = _collect_rows(df, n)
    out = ["<?xml version='1.0' encoding='UTF-8' ?>", "<result>",
           "\t<meta>", "\t\t<columns>"]
    for f in df.schema.fields:
        out += ["\t\t\t<column>",
                f"\t\t\t\t<name>{_xml_escape(f.name)}</name>",
                f"\t\t\t\t<type>{_meta_type(f, df)}</type>",
                "\t\t\t</column>"]
    out += ["\t\t</columns>", "\t</meta>", "\t<data>"]
    u8 = _u8_cols(df)
    for row in rows:
        out.append("\t\t<row>")
        for name, v in zip(df.columns, row):
            tag = _xml_escape(name)
            out.append(
                f"\t\t\t<{tag}>"
                f"{'' if v is None else _xml_escape(_ch_literal(v, bool_as_int=name in u8))}"
                f"</{tag}>")
        out.append("\t\t</row>")
    out += ["\t</data>", f"\t<rows>{len(rows)}</rows>", "</result>"]
    return "\n".join(out)


_BIG_INT = {"bigint"}


def _json_cell(v, simple: str, bool_as_int: bool = False):
    import math
    if v is None:
        return None
    if simple in _BIG_INT:
        # CH quotes (U)Int64 in JSON by default
        # (output_format_json_quote_64bit_integers = 1)
        return str(v)
    if simple in _NUMERIC_TYPES:
        if isinstance(v, float) and not math.isfinite(v):
            # CH default output_format_json_quote_denormals = 0:
            # nan/inf/-inf serialize as null in all JSON formats
            return None
        return v
    if simple == "boolean":
        # predicate results are UInt8 in the dialect → JSON number 1/0
        return int(v) if bool_as_int else v
    if simple.startswith("array<"):
        inner = simple[6:-1]
        return [_json_cell(x, inner, bool_as_int) for x in v]
    if simple.startswith("struct<"):
        # unnamed Tuple → JSON array of elements (the reference-era
        # default; output_format_json_named_tuples_as_objects = 0)
        inners = _struct_field_types(simple)
        return [_json_cell(x, t, bool_as_int) for x, t in zip(v, inners)]
    if simple.startswith("map<"):
        kv = _split_simple_args(simple[4:-1])
        kt, vt = (kv + ["string", "string"])[:2]
        return {str(k): _json_cell(x, vt, bool_as_int)
                for k, x in v.items()}
    if simple.startswith("decimal"):
        # CH JSON renders Decimal as an unquoted number by default
        # (output_format_json_quote_decimals = 0), trailing zeros
        # trimmed; exact below 2^53 (the documented float policy)
        iv = int(v)
        return iv if v == iv else float(_dec_str(v))
    import datetime
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    return str(v)


def _meta_type(field, df: DataFrame) -> str:
    """CH type name for format metadata — honors the builder's
    dialect-UInt64 marker (Spark stores UInt64 as signed Long)."""
    if field.name in getattr(df, "_ch_uint64_cols", frozenset()):
        return "UInt64"
    return _ch_type(field.dataType.simpleString())


def _json_doc(df: DataFrame, n: int, compact: bool) -> str:
    import json
    tot = getattr(df, "_ch_totals_df", None)
    ext = getattr(df, "_ch_extremes_df", None)
    u8 = _u8_cols(df)
    main = getattr(df, "_ch_main_df", df) if tot is not None else df
    rows = _collect_rows(main, n, getattr(df, "_ch_uint64_cols", frozenset()))
    simples = [f.dataType.simpleString() for f in main.schema.fields]
    meta = [{"name": f.name, "type": _meta_type(f, df)}
            for f in main.schema.fields]

    def row_obj(row):
        return ([_json_cell(v, s, c in u8)
                 for c, v, s in zip(main.columns, row, simples)]
                if compact else
                {c: _json_cell(v, s, c in u8)
                 for c, v, s in zip(main.columns, row, simples)})

    doc: dict = {"meta": meta, "data": [row_obj(r) for r in rows]}
    # CH JSON formats carry WITH TOTALS / extremes as dedicated fields
    # between data and rows (published JSON format contract)
    if tot is not None:
        trows = tot.limit(1).collect()
        if trows:
            doc["totals"] = row_obj(trows[0])
    if ext is not None:
        erows = ext.limit(2).collect()
        if len(erows) == 2:
            doc["extremes"] = {"min": row_obj(erows[0]),
                               "max": row_obj(erows[1])}
    doc["rows"] = len(rows)
    return json.dumps(doc, ensure_ascii=False, indent="\t")


def to_json(df: DataFrame, n: int = 10000) -> str:
    """``JSON`` document output: {meta, data: [objects], rows}."""
    return _json_doc(df, n, compact=False)


def to_json_compact(df: DataFrame, n: int = 10000) -> str:
    """``JSONCompact``: like JSON but data rows are arrays."""
    return _json_doc(df, n, compact=True)


def to_json_each_row(df: DataFrame, n: int = 10000) -> str:
    """``JSONEachRow`` as a string: one JSON object per line, compact
    separators (CH emits ``{"x":1}``, no spaces)."""
    import json
    simples = [f.dataType.simpleString() for f in df.schema.fields]
    u8 = _u8_cols(df)
    return "\n".join(
        json.dumps({c: _json_cell(v, s, c in u8)
                    for c, v, s in zip(df.columns, row, simples)},
                   ensure_ascii=False, separators=(",", ":"))
        for row in _collect_rows(df, n))


def _json_str_cell(v, simple: str, bool_as_int: bool = False):
    """*Strings JSON variants: every value serialized as its CH text
    form in a JSON string; NULL stays null."""
    if v is None:
        return None
    c = _json_cell(v, simple, bool_as_int)
    if isinstance(c, (dict, list)):
        # composites keep their CH literal text inside the string
        return _ch_literal(v, bool_as_int=bool_as_int)
    if isinstance(c, bool):
        return "true" if c else "false"
    return str(c)


def _each_row_lines(df: DataFrame, n: int, compact: bool,
                    strings: bool) -> list[str]:
    import json
    simples = [f.dataType.simpleString() for f in df.schema.fields]
    u8 = _u8_cols(df)
    cell = _json_str_cell if strings else _json_cell
    out = []
    for row in _collect_rows(df, n):
        vals = [cell(v, s, c in u8)
                for c, v, s in zip(df.columns, row, simples)]
        obj = vals if compact else dict(zip(df.columns, vals))
        out.append(json.dumps(obj, ensure_ascii=False,
                              separators=(",", ":")))
    return out


def to_json_compact_each_row(df: DataFrame, n: int = 10000,
                             with_names: bool = False,
                             with_types: bool = False) -> str:
    """``JSONCompactEachRow[WithNames[AndTypes]]``: one JSON array per
    line; optional header lines with names / CH types."""
    import json
    head = []
    if with_names:
        head.append(json.dumps(df.columns, ensure_ascii=False,
                               separators=(",", ":")))
    if with_types:
        head.append(json.dumps(
            [_meta_type(f, df) for f in df.schema.fields],
            ensure_ascii=False, separators=(",", ":")))
    return "\n".join(head + _each_row_lines(df, n, True, False))


def to_json_strings_each_row(df: DataFrame, n: int = 10000) -> str:
    """``JSONStringsEachRow``: objects with every value as a string."""
    return "\n".join(_each_row_lines(df, n, False, True))


def to_json_compact_strings_each_row(df: DataFrame,
                                     n: int = 10000) -> str:
    """``JSONCompactStringsEachRow``: arrays of string-formatted
    values."""
    return "\n".join(_each_row_lines(df, n, True, True))


def to_json_object_each_row(df: DataFrame, n: int = 10000) -> str:
    """``JSONObjectEachRow``: a single object keyed row_1, row_2, …"""
    import json
    lines = _each_row_lines(df, n, False, False)
    body = ",\n".join(f'\t"row_{i}": {obj}'
                      for i, obj in enumerate(lines, 1))
    return "{\n" + body + "\n}"


def to_json_columns(df: DataFrame, n: int = 10000,
                    compact: bool = False) -> str:
    """``JSONColumns`` / ``JSONCompactColumns``: columnar JSON — one
    array per column (object-keyed or positional)."""
    import json
    simples = [f.dataType.simpleString() for f in df.schema.fields]
    u8 = _u8_cols(df)
    rows = _collect_rows(df, n)
    cols = [[_json_cell(r[i], simples[i], c in u8) for r in rows]
            for i, c in enumerate(df.columns)]
    if compact:
        return json.dumps(cols, ensure_ascii=False,
                          separators=(",", ":"))
    body = ",\n".join(
        f'\t{json.dumps(c, ensure_ascii=False)}: '
        + json.dumps(col, ensure_ascii=False, separators=(",", ":"))
        for c, col in zip(df.columns, cols))
    return "{\n" + body + "\n}"


def to_pretty_json_each_row(df: DataFrame, n: int = 10000) -> str:
    """``PrettyJSONEachRow``: one indented JSON object per row."""
    import json
    simples = [f.dataType.simpleString() for f in df.schema.fields]
    u8 = _u8_cols(df)
    return "\n".join(
        json.dumps({c: _json_cell(v, s, c in u8)
                    for c, v, s in zip(df.columns, row, simples)},
                   ensure_ascii=False, indent=2)
        for row in _collect_rows(df, n))


def to_json_strings(df: DataFrame, n: int = 10000) -> str:
    """``JSONStrings``: the JSON document with string-formatted data
    values (meta/rows unchanged)."""
    import json
    simples = [f.dataType.simpleString() for f in df.schema.fields]
    u8 = _u8_cols(df)
    meta = [{"name": f.name, "type": _meta_type(f, df)}
            for f in df.schema.fields]
    rows = _collect_rows(df, n)
    data = [{c: _json_str_cell(v, s, c in u8)
             for c, v, s in zip(df.columns, row, simples)}
            for row in rows]
    return json.dumps({"meta": meta, "data": data, "rows": len(rows)},
                      ensure_ascii=False, indent="\t")


def to_sql_insert(df: DataFrame, n: int = 10000,
                  table: str = "table",
                  max_batch_size: int = 65505) -> str:
    """``SQLInsert``: INSERT statements with a VALUES list (batched at
    output_format_sql_insert_max_batch_size rows per statement)."""
    simples = [f.dataType.simpleString() for f in df.schema.fields]
    u8 = _u8_cols(df)
    names = df.columns
    rows = _collect_rows(df, n)
    cols = ", ".join(names)
    stmts, batch = [], []
    for row in rows:
        batch.append("(" + ", ".join(
            _values_cell(v, s, names[i] in u8)
            for i, (v, s) in enumerate(zip(row, simples))) + ")")
        if len(batch) >= max_batch_size:
            stmts.append(f"INSERT INTO {table} ({cols}) VALUES "
                         + ", ".join(batch) + ";")
            batch = []
    if batch:
        stmts.append(f"INSERT INTO {table} ({cols}) VALUES "
                     + ", ".join(batch) + ";")
    return "\n".join(stmts)


def tsv_unescape_columns(df: DataFrame) -> DataFrame:
    """Decode CH TabSeparated INPUT escapes on string columns
    (\\t, \\n, \\r, \\', \\\\) — Spark's CSV reader leaves them raw.
    Backslash-backslash goes through a sentinel so '\\\\t' decodes to
    backslash+t, not tab. Pure JVM replace chain."""
    from pyspark.sql.types import StringType
    sent = "\x00"
    cols = []
    for f in df.schema.fields:
        c = F.col(f"`{f.name}`")
        if isinstance(f.dataType, StringType):
            c = F.replace(c, F.lit("\\\\"), F.lit(sent))
            for esc, real in (("\\t", "\t"), ("\\n", "\n"),
                              ("\\r", "\r"), ("\\'", "'")):
                c = F.replace(c, F.lit(esc), F.lit(real))
            c = F.replace(c, F.lit(sent), F.lit("\\"))
        cols.append(c.alias(f.name))
    return df.select(*cols)


def to_custom_separated(df: DataFrame, n: int = 10000,
                        escaping: str = "Escaped",
                        field_delim: str = "\t",
                        row_before: str = "", row_after: str = "\n",
                        row_between: str = "",
                        result_before: str = "",
                        result_after: str = "",
                        with_names: bool = False) -> str:
    """``CustomSeparated``: the format_custom_* settings drive the
    delimiters; each cell escapes per format_custom_escaping_rule
    (Escaped = TSV, Quoted = CH literal, CSV, JSON, Raw/None).
    ``with_names`` renders the CustomSeparatedWithNames header as the
    FIRST ROW — after result_before_delimiter and joined to the data
    rows by row_between_delimiter, matching the reference's row
    ordering (the header is just row 0 of the result set)."""
    import json
    simples = [f.dataType.simpleString() for f in df.schema.fields]
    u8 = _u8_cols(df)
    names = df.columns

    def cell(v, s, i):
        if escaping == "Quoted":
            return _values_cell(v, s, names[i] in u8)
        if escaping == "CSV":
            return _csv_cell(v, s, names[i] in u8)
        if escaping == "JSON":
            return json.dumps(_json_cell(v, s, names[i] in u8),
                              ensure_ascii=False, separators=(",", ":"))
        if escaping in ("Raw", "None"):
            # no escaping: raw string text; non-strings use the plain
            # text form (which never contains escapes for them)
            if v is None:
                return ""
            if isinstance(v, str):
                return v
        # Escaped (default): TSV conventions
        return _text_cell(v, s, quote_strings=False,
                          bool_as_int=names[i] in u8)

    rows_txt = [row_before
                + field_delim.join(cell(v, s, i)
                                   for i, (v, s)
                                   in enumerate(zip(row, simples)))
                + row_after
                for row in _collect_rows(df, n)]
    if with_names:
        hdr = (row_before
               + field_delim.join(cell(c, "string", i)
                                  for i, c in enumerate(names))
               + row_after)
        rows_txt.insert(0, hdr)
    return result_before + row_between.join(rows_txt) + result_after


_TPL_RE = None


def to_template(df: DataFrame, row_format: str,
                row_between_delimiter: str = "\n",
                resultset_format: str | None = None,
                n: int = 10000) -> str:
    """``Template`` output: ``${col:Escaping}`` placeholders per row.

    Escapings: Raw (as-is), Escaped (TSV), Quoted (CH literal), CSV
    (RFC double-quote), JSON, XML. ``resultset_format`` may reference
    ``${data}`` plus ``${rows:...}``."""
    import json
    import re as _re

    global _TPL_RE
    if _TPL_RE is None:
        _TPL_RE = _re.compile(r"\$\{(\w+)(?::(\w+))?\}")
    simples = dict(zip(df.columns, (f.dataType.simpleString()
                                    for f in df.schema.fields)))

    def render(v, simple, esc):
        if esc == "Quoted":
            return _values_cell(v, simple)
        s = "" if v is None else str(v)
        if esc == "Escaped":
            return _tsv_escape(s)
        if esc == "CSV":
            return '"' + s.replace('"', '""') + '"'
        if esc == "JSON":
            return json.dumps(_json_cell(v, simple), ensure_ascii=False)
        if esc == "XML":
            return _xml_escape(s)
        return s                                           # Raw

    rows = df.limit(n).collect()

    def row_text(row):
        d = dict(zip(df.columns, row))

        def sub(m):
            name, esc = m.group(1), m.group(2) or "Raw"
            if name not in d:
                raise ValueError(f"Template: unknown column {name}")
            return render(d[name], simples[name], esc)
        return _TPL_RE.sub(sub, row_format)

    data = row_between_delimiter.join(row_text(r) for r in rows)
    if resultset_format is None:
        return data
    return (resultset_format.replace("${data}", data)
            .replace("${rows}", str(len(rows))))


def read_regexp(spark: SparkSession, path: str, regexp: str,
                schema: str, skip_unmatched: bool = False) -> DataFrame:
    """``Regexp`` input format: each line parsed by a regexp whose
    capture groups map positionally onto the schema columns. Stays
    JVM-side (spark.read.text + regexp_extract) — scales to any input
    size, unlike a driver-side line loop."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    st = StructType.fromDDL(schema)
    lines = spark.read.text(path)
    matched = lines.where(F.col("value").rlike(regexp))
    if not skip_unmatched:
        # CH throws on unmatched rows unless
        # format_regexp_skip_unmatched=1; mirror with a cheap count check
        total = lines.count()
        ok = matched.count()
        if ok != total:
            raise ValueError(
                f"Regexp: {total - ok} rows did not match (set "
                f"skip_unmatched=True to drop them)")
    cols = [F.regexp_extract("value", regexp, i + 1)
            .cast(f.dataType).alias(f.name)
            for i, f in enumerate(st.fields)]
    return matched.select(*cols)


# FORMAT-name → driver-side string renderer (used by the FORMAT suffix
# and INTO OUTFILE for these text formats)
def to_json_each_row_with_progress(df: DataFrame, n: int = 10000) -> str:
    """``JSONEachRowWithProgress``: each row wrapped as {"row": {...}},
    followed by one final {"progress": {...}} event (CH streams interim
    progress; a completed local result has exactly the final one)."""
    import json
    rows = _collect_rows(df, n)
    simples = [f.dataType.simpleString() for f in df.schema.fields]
    u8 = _u8_cols(df)
    out = [json.dumps(
        {"row": {c: _json_cell(v, s, c in u8)
                 for c, v, s in zip(df.columns, row, simples)}},
        ensure_ascii=False, separators=(",", ":")) for row in rows]
    out.append(json.dumps({"progress": {
        "read_rows": str(len(rows)), "read_bytes": "0",
        "total_rows_to_read": str(len(rows))}},
        separators=(",", ":")))
    return "\n".join(out) + "\n"


def read_json_as_string(spark: SparkSession, path: str) -> DataFrame:
    """``JSONAsString`` input: each top-level JSON object becomes ONE row
    with a single ``json`` String column (raw text, not parsed) —
    multi-line objects are re-assembled by brace balance outside string
    literals."""
    lines = spark.read.format("text").load(path)

    def reassemble(part):
        buf, depth, in_str, esc = [], 0, False, False
        for r in part:
            line = r.value
            buf.append(line)
            for ch in line:
                if esc:
                    esc = False
                elif ch == "\\":
                    esc = True
                elif ch == '"':
                    in_str = not in_str
                elif not in_str and ch == "{":
                    depth += 1
                elif not in_str and ch == "}":
                    depth -= 1
                    if depth == 0:
                        doc = "\n".join(buf).strip()
                        if doc:
                            yield (doc,)
                        buf = []
    # per-partition reassembly: objects must not span files/partitions
    # (same constraint CH's parallel parsing has for this format)
    return lines.rdd.mapPartitions(reassemble).toDF(["json"])


TEXT_RENDERERS = {
    "Values": to_values,
    "Vertical": to_vertical,
    "TSKV": to_tskv,
    "Markdown": to_markdown,
    "XML": to_xml,
    "JSON": to_json,
    "JSONCompact": to_json_compact,
    "JSONEachRowWithProgress": to_json_each_row_with_progress,
    "JSONStrings": to_json_strings,
    "JSONCompactEachRow": to_json_compact_each_row,
    "JSONCompactEachRowWithNames": lambda df, n=10000:
        to_json_compact_each_row(df, n, with_names=True),
    "JSONCompactEachRowWithNamesAndTypes": lambda df, n=10000:
        to_json_compact_each_row(df, n, with_names=True,
                                 with_types=True),
    "JSONStringsEachRow": to_json_strings_each_row,
    "JSONCompactStringsEachRow": to_json_compact_strings_each_row,
    "JSONObjectEachRow": to_json_object_each_row,
    "JSONColumns": to_json_columns,
    "JSONCompactColumns": lambda df, n=10000:
        to_json_columns(df, n, compact=True),
    "PrettyJSONEachRow": to_pretty_json_each_row,
    "JSONLines": to_json_each_row,
    "NDJSON": to_json_each_row,
    "SQLInsert": to_sql_insert,
}


def _csv_cell(v, simple: str, bool_as_int: bool = False) -> str:
    """CH CSV output cell: numbers bare, NULL = \\N, strings always
    double-quoted with '""' doubling, composites quoted whole in their
    text form."""
    if v is None:
        return "\\N"
    if simple == "boolean":
        if bool_as_int:
            return "1" if v else "0"
        return "true" if v else "false"
    if simple.startswith("decimal"):
        return _dec_str(v)
    if simple in _NUMERIC_TYPES:
        return _text_cell(v, simple, quote_strings=False)
    composite = simple.startswith(("array<", "struct<", "map<"))
    body = _text_cell(v, simple, quote_strings=composite,
                      bool_as_int=bool_as_int)
    return '"' + str(body).replace('"', '""') + '"'


def to_csv_text(df: DataFrame, n: int = 10000,
                header: bool = False) -> str:
    """Console ``FORMAT CSV[WithNames]`` rendering (same cell contract
    as the distributed INTO OUTFILE writer)."""
    simples = [f.dataType.simpleString() for f in df.schema.fields]
    u8 = _u8_cols(df)
    names = df.columns
    lines = []
    if header:
        lines.append(",".join('"' + c.replace('"', '""') + '"'
                              for c in df.columns))
    for row in _collect_rows(df, n):
        lines.append(",".join(
            _csv_cell(v, s, names[i] in u8)
            for i, (v, s) in enumerate(zip(row, simples))))
    return "\n".join(lines)


def render_row(fmt: str, values, simples, names,
               newline: bool = True) -> str:
    """One row in a CH row-oriented text format — the formatRow()
    scalar-function kernel (CSV / TSV / JSONEachRow / Values)."""
    import json
    f = fmt.lower()
    if f == "csv":
        out = ",".join(_csv_cell(v, s) for v, s in zip(values, simples))
    elif f in ("tsv", "tabseparated"):
        out = "\t".join(_text_cell(v, s, quote_strings=False)
                        for v, s in zip(values, simples))
    elif f == "jsoneachrow":
        out = json.dumps({n: _json_cell(v, s) for n, v, s in
                          zip(names, values, simples)},
                         ensure_ascii=False, separators=(",", ":"))
    elif f == "values":
        out = "(" + ",".join(_values_cell(v, s)
                             for v, s in zip(values, simples)) + ")"
    else:
        raise ValueError(f"formatRow: unsupported format {fmt!r}")
    return out + "\n" if newline else out
