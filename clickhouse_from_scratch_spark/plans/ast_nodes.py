"""AST node definitions — dataclass mirror of the reference's AST layer.

The SELECT clause set mirrors ``ASTSelectQuery.h:19-36``; expressions are
canonicalized the way the reference's parser does it: every operator and
special form becomes a named function call (``ExpressionListParsers.cpp``
operator tables), so the plan builder only handles a handful of node
kinds.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Node:
    pass


# --- expressions ----------------------------------------------------------

@dataclass
class Literal(Node):
    value: object            # int | float | str | bool | None


@dataclass
class Identifier(Node):
    parts: list[str]         # a.b.c → ["a","b","c"]

    @property
    def name(self) -> str:
        return ".".join(self.parts)


@dataclass
class Star(Node):
    """``*`` / ``t.*`` with ClickHouse column-set modifiers
    (ExpressionElementParsers.cpp:1774-2015): COLUMNS('re'),
    * EXCEPT (...), * REPLACE (expr AS col), * APPLY (fn)."""
    table: str | None = None            # t.* → "t"
    columns_regex: str | None = None    # COLUMNS('re')
    columns_list: list[str] | None = None   # COLUMNS(a, b)
    except_: list[str] | None = None    # * EXCEPT (a, b)
    except_strict: bool = False         # EXCEPT STRICT raises on missing
    except_regex: str | None = None     # * EXCEPT ('re')
    replace: list[tuple["Node", str]] | None = None  # * REPLACE (e AS c)
    apply: list["Node"] | None = None   # * APPLY (f) — FuncCall/Lambda/name


@dataclass
class FuncCall(Node):
    """Canonical function call. Operators arrive here renamed to the CH
    canonical names (plus/and/equals/like/...)."""
    name: str
    args: list[Node]
    params: list[Node] = field(default_factory=list)   # f(p)(args)
    distinct: bool = False                             # f(DISTINCT x)
    filter_where: Node | None = None                   # f(x) FILTER(WHERE p)
    window: "WindowSpec | str | None" = None           # OVER (...) | OVER name
    nulls_modifier: str | None = None                  # RESPECT/IGNORE NULLS


@dataclass
class Lambda(Node):
    params: list[str]
    body: Node


@dataclass
class Cast(Node):
    expr: Node
    type_name: str


@dataclass
class ArrayLiteral(Node):
    items: list[Node]


@dataclass
class TupleLiteral(Node):
    items: list[Node]


@dataclass
class IntervalExpr(Node):
    value: Node
    unit: str                # SECOND/MINUTE/.../YEAR


@dataclass
class QueryParameter(Node):
    """``{name:Type}`` substitution — bound at build time from params."""
    name: str
    type_name: str


@dataclass
class Alias(Node):
    expr: Node
    alias: str


@dataclass
class Subquery(Node):
    query: "SelectQuery | UnionQuery"


@dataclass
class WindowSpec(Node):
    partition_by: list[Node] = field(default_factory=list)
    order_by: list["OrderItem"] = field(default_factory=list)
    frame: tuple[str, str, str] | None = None   # (ROWS|RANGE, start, end)


# --- clauses --------------------------------------------------------------

@dataclass
class OrderItem(Node):
    expr: Node
    desc: bool = False
    nulls_first: bool | None = None
    collate: str | None = None
    with_fill: bool = False
    fill_from: Node | None = None
    fill_to: Node | None = None
    fill_step: Node | None = None
    fill_staleness: Node | None = None


@dataclass
class TableRef(Node):
    database: str | None
    table: str
    alias: str | None = None
    final: bool = False
    sample: tuple[float, float] | None = None   # (fraction, offset)


@dataclass
class SubqueryRef(Node):
    query: "SelectQuery | UnionQuery"
    alias: str | None = None


@dataclass
class TableFunction(Node):
    name: str
    args: list[Node]
    alias: str | None = None


@dataclass
class Join(Node):
    left: Node
    right: Node
    kind: str = "inner"          # inner/left/right/full/cross
    strictness: str = "all"      # all/any/asof/semi/anti
    using: list[str] | None = None
    on: Node | None = None
    is_global: bool = False


@dataclass
class ArrayJoinClause(Node):
    exprs: list[Node]            # Alias-wrapped array expressions
    left: bool = False


@dataclass
class GroupBy(Node):
    exprs: list[Node]
    mode: str = "plain"          # plain/rollup/cube/grouping_sets
    grouping_sets: list[list[Node]] | None = None
    with_totals: bool = False


@dataclass
class LimitBy(Node):
    n: int
    offset: int
    exprs: list[Node]


@dataclass
class SelectQuery(Node):
    ctes: list[tuple[str, "SelectQuery | UnionQuery | Node"]] = field(default_factory=list)
    distinct: bool = False
    distinct_on: list[Node] | None = None
    select: list[Node] = field(default_factory=list)
    from_: Node | None = None
    array_join: ArrayJoinClause | None = None
    prewhere: Node | None = None
    where: Node | None = None
    group_by: GroupBy | None = None
    having: Node | None = None
    qualify: Node | None = None
    windows: dict[str, WindowSpec] = field(default_factory=dict)
    order_by: list[OrderItem] = field(default_factory=list)
    interpolate: list = field(default_factory=list)  # [(col, expr|None)]
    limit_by: LimitBy | None = None
    limit: int | None = None
    offset: int | None = None
    with_ties: bool = False
    settings: dict[str, object] = field(default_factory=dict)


@dataclass
class UnionQuery(Node):
    selects: list[SelectQuery | "UnionQuery"]
    modes: list[str] = field(default_factory=list)   # between selects: all/distinct/intersect/except


# --- canonical formatting --------------------------------------------------

def _fmt_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return str(v)


def format_node(node) -> str:
    """Canonical expression text, mirroring the reference's
    ``IAST::getColumnName`` contract (``src/Parsers/IAST.h``): unaliased
    output columns are named by the formatted expression — ``round(2.5)``
    and ``round(3.5)`` are distinct names. Operators arrive here already
    canonicalized to named calls (``plus(a, 1)``), same as the reference's
    operator tables."""
    if isinstance(node, Literal):
        return _fmt_literal(node.value)
    if isinstance(node, Identifier):
        return node.name
    if isinstance(node, Alias):
        return node.alias
    if isinstance(node, FuncCall):
        out = node.name
        if node.params:
            out += "(" + ", ".join(format_node(p) for p in node.params) + ")"
        inner = ", ".join(format_node(a) for a in node.args)
        if node.distinct:
            inner = "DISTINCT " + inner
        out += "(" + inner + ")"
        if node.filter_where is not None:
            out += f" FILTER (WHERE {format_node(node.filter_where)})"
        if node.nulls_modifier is not None:
            out += f" {node.nulls_modifier.upper()} NULLS"
        if node.window is not None:
            w = node.window
            if isinstance(w, str):
                out += f" OVER {w}"
            else:
                parts = []
                if w.partition_by:
                    parts.append("PARTITION BY " + ", ".join(
                        format_node(e) for e in w.partition_by))
                if w.order_by:
                    parts.append("ORDER BY " + ", ".join(
                        format_node(o.expr) + (" DESC" if o.desc else "")
                        for o in w.order_by))
                if w.frame:
                    parts.append(f"{w.frame[0]} BETWEEN {w.frame[1]} "
                                 f"AND {w.frame[2]}")
                out += " OVER (" + " ".join(parts) + ")"
        return out
    if isinstance(node, Cast):
        return f"CAST({format_node(node.expr)}, '{node.type_name}')"
    if isinstance(node, ArrayLiteral):
        return "[" + ", ".join(format_node(i) for i in node.items) + "]"
    if isinstance(node, TupleLiteral):
        return "(" + ", ".join(format_node(i) for i in node.items) + ")"
    if isinstance(node, Lambda):
        ps = (node.params[0] if len(node.params) == 1
              else "(" + ", ".join(node.params) + ")")
        return f"{ps} -> {format_node(node.body)}"
    if isinstance(node, IntervalExpr):
        unit = node.unit.capitalize()
        return f"toInterval{unit}({format_node(node.value)})"
    if isinstance(node, QueryParameter):
        return "{" + f"{node.name}:{node.type_name}" + "}"
    if isinstance(node, Subquery):
        return "_subquery"
    if isinstance(node, Star):
        return "*"
    return "expr"
