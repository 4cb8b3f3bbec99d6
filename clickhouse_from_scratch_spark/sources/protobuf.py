"""Protobuf / ProtobufSingle formats — hand-rolled wire codec.

The reference declares both formats (``registerFormats.cpp:37-40``,
registrations commented out like MsgPack). Encoding follows the public
protobuf wire spec (developers.google.com/protocol-buffers/docs/encoding):

- varint (wire type 0) for int32/64, uint32/64, bool; sint32/64 zigzag
- fixed64 (type 1) for double, fixed32 (type 5) for float
- length-delimited (type 2) for string/bytes and nested rows
- ``repeated`` scalar fields are packed (one length-delimited blob of
  varints/fixeds), matching proto3's default

``Protobuf`` frames each row as varint(length) + message (CH's
length-delimited stream); ``ProtobufSingle`` is one bare message.

The schema is a minimal proto3 subset parsed from the message text —
scalar fields, ``repeated``, explicit tags — enough for flat
row-shaped messages, which is what the FORMAT surface exchanges.
"""

from __future__ import annotations

import re
import struct

from pyspark.sql import DataFrame, SparkSession

_VARINT = {"int32", "int64", "uint32", "uint64", "bool"}
_ZIGZAG = {"sint32", "sint64"}
_FIXED = {"double": ("<d", 8, 1), "float": ("<f", 4, 5),
          "fixed64": ("<Q", 8, 1), "fixed32": ("<I", 4, 5)}
_LEN = {"string", "bytes"}


def parse_proto_schema(text: str) -> list[tuple[str, str, int, bool]]:
    """Parse a flat proto3 message into [(name, type, tag, repeated)].

    Accepts ``message Name { [repeated] type name = tag; ... }`` or the
    bare field list without the message wrapper."""
    m = re.search(r"message\s+\w+\s*\{(.*)\}", text, re.S)
    body = m.group(1) if m else text
    fields = []
    for rep, typ, name, tag in re.findall(
            r"(repeated\s+)?(\w+)\s+(\w+)\s*=\s*(\d+)\s*;", body):
        if not (typ in _VARINT or typ in _ZIGZAG or typ in _FIXED
                or typ in _LEN):
            raise ValueError(f"protobuf: unsupported field type {typ!r}")
        fields.append((name, typ, int(tag), bool(rep)))
    if not fields:
        raise ValueError("protobuf: no fields parsed from schema")
    return fields


def _varint(n: int) -> bytes:
    if n < 0:                      # two's complement, 10 bytes
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _zz_enc(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zz_dec(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _key(tag: int, wire: int) -> bytes:
    return _varint(tag << 3 | wire)


def _enc_scalar(typ: str, v) -> bytes:
    if typ in _VARINT:
        return _varint(int(v))
    if typ in _ZIGZAG:
        return _varint(_zz_enc(int(v)))
    fmt, _, _ = _FIXED[typ]
    return struct.pack(fmt, v)


def _enc_field(typ: str, tag: int, rep: bool, v) -> bytes:
    if v is None or (rep and v == []):
        return b""                 # proto3: absent field
    if typ in _LEN:
        def one(x):
            raw = x.encode("utf-8") if isinstance(x, str) else bytes(x)
            return _key(tag, 2) + _varint(len(raw)) + raw
        return (b"".join(one(x) for x in v) if rep else one(v))
    if rep:                        # packed repeated scalars
        payload = b"".join(_enc_scalar(typ, x) for x in v)
        return _key(tag, 2) + _varint(len(payload)) + payload
    wire = 0 if (typ in _VARINT or typ in _ZIGZAG) else _FIXED[typ][2]
    return _key(tag, wire) + _enc_scalar(typ, v)


def _row_bytes(fields, row) -> bytes:
    return b"".join(_enc_field(t, tag, rep, v)
                    for (name, t, tag, rep), v in zip(fields, row))


def to_protobuf(df: DataFrame, schema: str, single: bool = False,
                n: int = 100000) -> bytes:
    """FORMAT Protobuf (length-delimited rows) / ProtobufSingle."""
    fields = parse_proto_schema(schema)
    names = [f[0] for f in fields]
    rows = df.select(*names).limit(2 if single else n).collect()
    if single:
        if len(rows) != 1:
            raise ValueError("ProtobufSingle needs exactly one row")
        return _row_bytes(fields, rows[0])
    out = bytearray()
    for row in rows:
        msg = _row_bytes(fields, row)
        out += _varint(len(msg)) + msg
    return bytes(out)


def _dec_value(typ: str, wire: int, data: bytes, pos: int):
    if wire == 0:
        v, pos = _read_varint(data, pos)
        if typ in _ZIGZAG:
            return _zz_dec(v), pos
        if typ == "bool":
            return bool(v), pos
        if typ in ("int32", "int64") and v >= 1 << 63:
            return v - (1 << 64), pos        # negative two's complement
        return v, pos
    if wire in (1, 5):
        fmt, size, _ = _FIXED[typ]
        (v,) = struct.unpack_from(fmt, data, pos)
        return v, pos + size
    raise ValueError(f"protobuf: unexpected wire type {wire} for {typ}")


def _dec_message(fields, data: bytes) -> dict:
    by_tag = {tag: (name, typ, rep) for name, typ, tag, rep in fields}
    out: dict = {name: ([] if rep else None)
                 for name, _, _, rep in fields}
    pos = 0
    while pos < len(data):
        k, pos = _read_varint(data, pos)
        tag, wire = k >> 3, k & 7
        if tag not in by_tag:      # unknown field: skip per spec
            if wire == 0:
                _, pos = _read_varint(data, pos)
            elif wire == 2:
                ln, pos = _read_varint(data, pos)
                pos += ln
            else:
                pos += 8 if wire == 1 else 4
            continue
        name, typ, rep = by_tag[tag]
        if wire == 2 and typ in _LEN:
            ln, pos = _read_varint(data, pos)
            raw = data[pos:pos + ln]
            pos += ln
            v = raw.decode("utf-8") if typ == "string" else bytes(raw)
            out[name].append(v) if rep else out.__setitem__(name, v)
        elif wire == 2:            # packed repeated scalars
            ln, pos = _read_varint(data, pos)
            end = pos + ln
            while pos < end:
                wire_of = 0 if (typ in _VARINT or typ in _ZIGZAG) \
                    else _FIXED[typ][2]
                v, pos = _dec_value(typ, wire_of, data, pos)
                out[name].append(v)
        else:
            v, pos = _dec_value(typ, wire, data, pos)
            out[name].append(v) if rep else out.__setitem__(name, v)
    return out


_SPARK_T = {"int32": "int", "sint32": "int", "int64": "long",
            "sint64": "long", "uint32": "long", "uint64": "long",
            "bool": "boolean", "double": "double", "float": "float",
            "fixed32": "long", "fixed64": "long",
            "string": "string", "bytes": "binary"}


def from_protobuf(spark: SparkSession, data: bytes, schema: str,
                  single: bool = False) -> DataFrame:
    fields = parse_proto_schema(schema)
    msgs = []
    if single:
        msgs.append(data)
    else:
        pos = 0
        while pos < len(data):
            ln, pos = _read_varint(data, pos)
            msgs.append(data[pos:pos + ln])
            pos += ln
    rows = [tuple(_dec_message(fields, m)[f[0]] for f in fields)
            for m in msgs]
    ddl = ", ".join(
        f"{name} {'array<' + _SPARK_T[t] + '>' if rep else _SPARK_T[t]}"
        for name, t, _, rep in fields)
    return spark.createDataFrame(rows, ddl)
