"""Tokenizer for the ClickHouse SQL dialect.

Token inventory follows the reference lexer (``src/Parsers/Lexer.h:10-78``):
bare/quoted identifiers, number literals (hex/binary/exponent), string
literals with ClickHouse escapes, the operator set (including ``::``,
``->``, ``||``, ``==``/``!=``/``<>``), and punctuation. Comments
(``--``, ``/* */``) are skipped.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum, auto


class T(Enum):
    IDENT = auto()
    NUMBER = auto()
    STRING = auto()
    OP = auto()
    EOF = auto()


@dataclass(frozen=True)
class Token:
    kind: T
    text: str
    pos: int

    def is_kw(self, *words: str) -> bool:
        return self.kind == T.IDENT and self.text.upper() in words

    def is_op(self, *ops: str) -> bool:
        return self.kind == T.OP and self.text in ops


# multi-char operators first (longest match wins)
_OPS = ["::", "->", "||", "==", "!=", "<>", "<=", ">=", "=", "<", ">",
        "+", "-", "*", "/", "%", "(", ")", "[", "]", "{", "}", ",", ".",
        "?", ":", ";", "@"]

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "0": "\0", "b": "\b",
            "f": "\f", "a": "\a", "v": "\v", "\\": "\\", "'": "'",
            '"': '"', "`": "`"}


class LexError(ValueError):
    pass


def tokenize(sql: str) -> list[Token]:
    toks: list[Token] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c.isspace():
            i += 1
            continue
        if sql.startswith("--", i):
            j = sql.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if sql.startswith("/*", i):
            j = sql.find("*/", i + 2)
            if j < 0:
                raise LexError(f"unterminated comment at {i}")
            i = j + 2
            continue
        if c == "'" or c == '"' or c == "`":
            s, i = _string(sql, i, c)
            kind = T.STRING if c == "'" else T.IDENT
            toks.append(Token(kind, s, i))
            continue
        if c == "$":
            # heredoc $tag$raw text$tag$ (reference Lexer.cpp:359-379,
            # Lexer.h:37): the opening tag runs to the next '$'; the body
            # is raw — no escape processing — and ends at the first
            # occurrence of the identical closing tag.
            k = sql.find("$", i + 1)
            if k >= 0:
                tag = sql[i:k + 1]
                end = sql.find(tag, k + 1)
                if end >= 0:
                    toks.append(Token(T.STRING, sql[k + 1:end], i))
                    i = end + len(tag)
                    continue
            raise LexError(f"unterminated heredoc starting at {i}")
        if c.isdigit() or (c == "." and i + 1 < n and sql[i + 1].isdigit()):
            s, i = _number(sql, i)
            toks.append(Token(T.NUMBER, s, i))
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (sql[j].isalnum() or sql[j] == "_"):
                j += 1
            toks.append(Token(T.IDENT, sql[i:j], i))
            i = j
            continue
        for op in _OPS:
            if sql.startswith(op, i):
                toks.append(Token(T.OP, op, i))
                i += len(op)
                break
        else:
            raise LexError(f"unexpected character {c!r} at {i}")
    toks.append(Token(T.EOF, "", n))
    return toks


def _string(sql: str, i: int, quote: str) -> tuple[str, int]:
    out: list[str] = []
    j = i + 1
    n = len(sql)
    while j < n:
        c = sql[j]
        if c == "\\" and j + 1 < n:
            # \xHH hex byte escape ('\x41' = 'A')
            if (sql[j + 1] in "xX" and j + 3 < n
                    and sql[j + 2] in "0123456789abcdefABCDEF"
                    and sql[j + 3] in "0123456789abcdefABCDEF"):
                out.append(chr(int(sql[j + 2:j + 4], 16)))
                j += 4
                continue
            out.append(_ESCAPES.get(sql[j + 1], sql[j + 1]))
            j += 2
            continue
        if c == quote:
            if j + 1 < n and sql[j + 1] == quote:   # doubled quote escape
                out.append(quote)
                j += 2
                continue
            return "".join(out), j + 1
        out.append(c)
        j += 1
    raise LexError(f"unterminated string starting at {i}")


def _number(sql: str, i: int) -> tuple[str, int]:
    n = len(sql)
    j = i
    if sql.startswith(("0x", "0X", "0b", "0B"), i):
        j = i + 2
        while j < n and (sql[j].isalnum()):
            j += 1
        return sql[i:j], j
    seen_dot = seen_exp = False
    while j < n:
        c = sql[j]
        if c.isdigit():
            j += 1
        elif c == "." and not seen_dot and not seen_exp:
            seen_dot = True
            j += 1
        elif c in "eE" and not seen_exp and j + 1 < n and (
                sql[j + 1].isdigit() or sql[j + 1] in "+-"):
            seen_exp = True
            j += 2
        else:
            break
    return sql[i:j], j
