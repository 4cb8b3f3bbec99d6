"""ClickHouse-dialect SQL frontend: lexer → AST → DataFrame plan.

Mirrors the reference's pipeline (SURVEY.md §3): SQL text → token stream
(``src/Parsers/Lexer.cpp``) → recursive-descent parse into a typed AST
(``ParserQuery``/``ParserSelectQuery``) — then, where the reference stops
at an AST dump (``executeQuery.cpp:453-455``), we continue: the builder
lowers the AST onto DataFrame operations and the operator/function
registries, and Catalyst takes it from there.
"""

from .engine import execute_sql, parse
from .parser import ParseError

__all__ = ["execute_sql", "parse", "ParseError"]
