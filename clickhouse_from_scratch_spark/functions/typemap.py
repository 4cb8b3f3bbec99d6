"""ClickHouse type name → Spark SQL type mapping (SURVEY.md §1.2).

Source of truth: the reference's type factory registrations
(``src/DataTypes/DataTypeFactory.cpp:197-217``) and the SQL-alias table
(``src/DataTypes/DataTypesNumber.cpp:59-90``). Fidelity policies:

- UInt64  → LongType (modulo-2^64; documented best-effort).
- Int128/256, UInt128/256 → Decimal(38,0) (lossy beyond 38 digits).
- DateTime64(p>6) → TimestampType truncates to microseconds.
- FixedString(N) → string (length check is a constraint, not a type).
- Enum8/16 → string.
- LowCardinality(T) → T (Parquet dictionary-encodes transparently).
"""

from __future__ import annotations

import re

_SIMPLE = {
    "int8": "tinyint", "int16": "smallint", "int32": "int", "int64": "long",
    "uint8": "smallint", "uint16": "int", "uint32": "long", "uint64": "long",
    "int128": "decimal(38,0)", "int256": "decimal(38,0)",
    "uint128": "decimal(38,0)", "uint256": "decimal(38,0)",
    "float32": "float", "float64": "double",
    "string": "string", "uuid": "string", "ipv4": "string", "ipv6": "string",
    "date": "date", "date32": "date", "datetime": "timestamp",
    "bool": "boolean", "boolean": "boolean", "nothing": "void",
    # SQL-standard aliases (DataTypesNumber.cpp:59-90)
    "tinyint": "tinyint", "smallint": "smallint", "int": "int",
    "integer": "int", "bigint": "long", "float": "float", "double": "double",
    "char": "string", "varchar": "string", "text": "string", "blob": "binary",
    "real": "float",
}


def ch_type_to_spark(ch: str) -> str:
    """Translate a ClickHouse type string to a Spark SQL type string."""
    t = ch.strip()
    low = t.lower()
    if low in _SIMPLE:
        return _SIMPLE[low]
    m = re.match(r"(?i)^nullable\((.*)\)$", t)
    if m:
        return ch_type_to_spark(m.group(1))
    m = re.match(r"(?i)^lowcardinality\((.*)\)$", t)
    if m:
        return ch_type_to_spark(m.group(1))
    m = re.match(r"(?i)^array\((.*)\)$", t)
    if m:
        return f"array<{ch_type_to_spark(m.group(1))}>"
    m = re.match(r"(?i)^map\((.*),\s*(.*)\)$", t)
    if m:
        return f"map<{ch_type_to_spark(m.group(1))},{ch_type_to_spark(m.group(2))}>"
    m = re.match(r"(?i)^tuple\((.*)\)$", t)
    if m:
        parts = _split_args(m.group(1))
        fields = []
        for i, p in enumerate(parts):
            nm = re.match(r"^(\w+)\s+(.+)$", p.strip())
            if nm:
                fields.append(f"{nm.group(1)}:{ch_type_to_spark(nm.group(2))}")
            else:
                fields.append(f"_{i+1}:{ch_type_to_spark(p)}")
        return f"struct<{','.join(fields)}>"
    m = re.match(r"(?i)^decimal\((\d+)\s*,\s*(\d+)\)$", t)
    if m:
        p, s = int(m.group(1)), int(m.group(2))
        return f"decimal({min(p,38)},{min(s,38)})"
    m = re.match(r"(?i)^decimal(32|64|128|256)\((\d+)\)$", t)
    if m:
        prec = {"32": 9, "64": 18, "128": 38, "256": 38}[m.group(1)]
        return f"decimal({prec},{m.group(2)})"
    m = re.match(r"(?i)^datetime64\((\d+)(?:\s*,\s*'(.*)')?\)$", t)
    if m:
        return "timestamp"
    m = re.match(r"(?i)^datetime\('(.*)'\)$", t)
    if m:
        return "timestamp"
    m = re.match(r"(?i)^fixedstring\((\d+)\)$", t)
    if m:
        return "string"
    m = re.match(r"(?i)^enum(8|16)?\(", t)
    if m:
        return "string"
    raise ValueError(f"unmapped ClickHouse type: {ch}")


def _split_args(s: str) -> list[str]:
    """Split on top-level commas (respects nested parens)."""
    out, depth, cur = [], 0, []
    for ch_ in s:
        if ch_ == "(":
            depth += 1
        elif ch_ == ")":
            depth -= 1
        if ch_ == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch_)
    if cur:
        out.append("".join(cur))
    return out
