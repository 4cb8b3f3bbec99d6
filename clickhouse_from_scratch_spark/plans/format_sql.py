"""AST → SQL formatter — the reference's ``IAST::formatImpl`` contract.

Every reference AST node can print itself back as parseable SQL
(``src/Parsers/IAST.h`` format interface; the per-clause shape is
``ASTSelectQuery::formatImpl``, ``ASTSelectQuery.cpp:55-170``, and the
operator re-sugaring tables are ``ASTFunction::formatImplWithoutAlias``,
``ASTFunction.cpp:222-560``). This is what EXPLAIN SYNTAX prints: the
parser has already applied its canonical rewrites (ternary → if,
BETWEEN → >= AND <=, quantified comparisons → IN / scalar reductions,
TOP → LIMIT), so formatting the parsed tree shows the post-rewrite
query as SQL.

``dump_ast`` is the EXPLAIN AST shape: the reference's
``IAST::dumpTree`` (``IAST.cpp:159-168``) prints ``getID()`` per node
with a ``-``-per-level indent; the process-specific pointer hex the
reference appends is intentionally omitted (it is never stable output).
"""

from __future__ import annotations

from .ast_nodes import (Alias, ArrayJoinClause, ArrayLiteral, Cast, FuncCall,
                        GroupBy, Identifier, IntervalExpr, Join, Lambda,
                        LimitBy, Literal, Node, OrderItem, QueryParameter,
                        SelectQuery, Star, Subquery, SubqueryRef, TableFunction,
                        TableRef, TupleLiteral, UnionQuery, WindowSpec,
                        _fmt_literal)

# binary operators re-sugared from canonical call names
# (ASTFunction.cpp:304-337 operator table)
_BINARY_OPS = {
    "multiply": " * ", "divide": " / ", "modulo": " % ",
    "plus": " + ", "minus": " - ",
    "notEquals": " != ", "lessOrEquals": " <= ", "greaterOrEquals": " >= ",
    "less": " < ", "greater": " > ", "equals": " = ",
    "like": " LIKE ", "ilike": " ILIKE ",
    "notLike": " NOT LIKE ", "notILike": " NOT ILIKE ",
    "in": " IN ", "notIn": " NOT IN ",
    "globalIn": " GLOBAL IN ", "globalNotIn": " GLOBAL NOT IN ",
}
_IN_OPS = {"in", "notIn", "globalIn", "globalNotIn"}


def format_expr(node, need_parens: bool = False) -> str:
    """One expression as SQL, operators re-sugared. ``need_parens``
    mirrors the reference's frame.need_parens: set when this expression
    is an operand of another operator."""
    if isinstance(node, Literal):
        return _fmt_literal(node.value)
    if isinstance(node, Identifier):
        return node.name
    if isinstance(node, Alias):
        inner = format_expr(node.expr, need_parens=True)
        out = f"{inner} AS {node.alias}"
        return f"({out})" if need_parens else out
    if isinstance(node, Cast):
        return f"CAST({format_expr(node.expr)}, '{node.type_name}')"
    if isinstance(node, ArrayLiteral):
        return "[" + ", ".join(format_expr(i) for i in node.items) + "]"
    if isinstance(node, TupleLiteral):
        return "(" + ", ".join(format_expr(i) for i in node.items) + ")"
    if isinstance(node, Lambda):
        ps = (node.params[0] if len(node.params) == 1
              else "(" + ", ".join(node.params) + ")")
        out = f"{ps} -> {format_expr(node.body, need_parens=True)}"
        return f"({out})" if need_parens else out
    if isinstance(node, IntervalExpr):
        return (f"toInterval{node.unit.capitalize()}"
                f"({format_expr(node.value)})")
    if isinstance(node, QueryParameter):
        return "{" + f"{node.name}:{node.type_name}" + "}"
    if isinstance(node, Subquery):
        return "(" + format_sql(node.query, one_line=True) + ")"
    if isinstance(node, Star):
        return _format_star(node)
    if isinstance(node, FuncCall):
        return _format_call(node, need_parens)
    if isinstance(node, (SelectQuery, UnionQuery)):
        return "(" + format_sql(node, one_line=True) + ")"
    return str(node)


def _format_star(node: Star) -> str:
    if node.columns_regex is not None:
        base = f"COLUMNS('{node.columns_regex}')"
    elif node.columns_list is not None:
        base = "COLUMNS(" + ", ".join(node.columns_list) + ")"
    else:
        base = (node.table + ".*") if node.table else "*"
    if node.except_regex is not None:
        base += f" EXCEPT ('{node.except_regex}')"
    elif node.except_:
        base += " EXCEPT (" + ", ".join(node.except_) + ")"
    if node.replace:
        base += " REPLACE (" + ", ".join(
            f"{format_expr(e)} AS {c}" for e, c in node.replace) + ")"
    if node.apply:
        base += "".join(" APPLY (" + format_expr(f) + ")"
                        for f in node.apply)
    return base


def _format_call(node: FuncCall, need_parens: bool) -> str:
    name, args = node.name, node.args
    plain = (not node.params and not node.distinct
             and node.filter_where is None and node.window is None
             and node.nulls_modifier is None)
    if plain:
        # unary prefix (ASTFunction.cpp:251-257)
        if name == "negate" and len(args) == 1:
            inner = format_expr(args[0], need_parens=True)
            return f"-({inner})" if inner.startswith("-") else f"-{inner}"
        if name == "not" and len(args) == 1:
            out = "NOT " + format_expr(args[0], need_parens=True)
            return f"({out})" if need_parens else out
        # unary postfix (ASTFunction.cpp:304-309)
        if name in ("isNull", "isNotNull") and len(args) == 1:
            sfx = " IS NULL" if name == "isNull" else " IS NOT NULL"
            out = format_expr(args[0], need_parens=True) + sfx
            return f"({out})" if need_parens else out
        # binary infix
        if name in _BINARY_OPS and len(args) == 2:
            lhs = format_expr(args[0], need_parens=True)
            if name in _IN_OPS and not isinstance(
                    args[1], (TupleLiteral, Subquery, FuncCall,
                              ArrayLiteral, Identifier)):
                # x IN 1 prints as x IN (1) (ASTFunction.cpp:375-389)
                rhs = "(" + format_expr(args[1]) + ")"
            else:
                rhs = format_expr(args[1], need_parens=True)
            out = lhs + _BINARY_OPS[name] + rhs
            return f"({out})" if need_parens else out
        if name == "arrayElement" and len(args) == 2:
            out = (format_expr(args[0], need_parens=True)
                   + "[" + format_expr(args[1]) + "]")
            return f"({out})" if need_parens else out
        if (name == "tupleElement" and len(args) == 2
                and isinstance(args[1], Literal)
                and isinstance(args[1].value, int) and args[1].value >= 0):
            out = (format_expr(args[0], need_parens=True)
                   + "." + str(args[1].value))
            return f"({out})" if need_parens else out
        # n-ary AND / OR chains (ASTFunction.cpp:498-520)
        if name in ("and", "or") and len(args) >= 2:
            sep = " AND " if name == "and" else " OR "
            out = sep.join(format_expr(a, need_parens=True) for a in args)
            return f"({out})" if need_parens else out
    # generic function form
    out = name
    if node.params:
        out += "(" + ", ".join(format_expr(p) for p in node.params) + ")"
    inner = ", ".join(format_expr(a) for a in args)
    if node.distinct:
        inner = "DISTINCT " + inner
    out += "(" + inner + ")"
    if node.filter_where is not None:
        out += f" FILTER (WHERE {format_expr(node.filter_where)})"
    if node.nulls_modifier is not None:
        out += f" {node.nulls_modifier.upper()} NULLS"
    if node.window is not None:
        w = node.window
        out += (f" OVER {w}" if isinstance(w, str)
                else " OVER (" + _format_window(w) + ")")
    return out


def _format_window(w: WindowSpec) -> str:
    parts = []
    if w.partition_by:
        parts.append("PARTITION BY "
                     + ", ".join(format_expr(e) for e in w.partition_by))
    if w.order_by:
        parts.append("ORDER BY "
                     + ", ".join(_format_order_item(o) for o in w.order_by))
    if w.frame:
        parts.append(f"{w.frame[0]} BETWEEN {w.frame[1]} AND {w.frame[2]}")
    return " ".join(parts)


def _format_order_item(it: OrderItem) -> str:
    out = format_expr(it.expr)
    if it.desc:
        out += " DESC"
    if it.collate is not None:
        out += f" COLLATE '{it.collate}'"
    if it.nulls_first is not None:
        out += " NULLS FIRST" if it.nulls_first else " NULLS LAST"
    if it.with_fill:
        out += " WITH FILL"
        if it.fill_from is not None:
            out += " FROM " + format_expr(it.fill_from)
        if it.fill_to is not None:
            out += " TO " + format_expr(it.fill_to)
        if it.fill_step is not None:
            out += " STEP " + format_expr(it.fill_step)
    return out


def _format_factor(node) -> str:
    if isinstance(node, TableRef):
        out = f"{node.database}.{node.table}" if node.database else node.table
        if node.alias:
            out += f" AS {node.alias}"
        if node.final:
            out += " FINAL"
        if node.sample is not None:
            frac, off = node.sample
            out += f" SAMPLE {_num(frac)}"
            if off:
                out += f" OFFSET {_num(off)}"
        return out
    if isinstance(node, SubqueryRef):
        out = "(" + format_sql(node.query, one_line=True) + ")"
        if node.alias:
            out += f" AS {node.alias}"
        return out
    if isinstance(node, TableFunction):
        out = (node.name + "("
               + ", ".join(format_expr(a) for a in node.args) + ")")
        if node.alias:
            out += f" AS {node.alias}"
        return out
    if isinstance(node, Join):
        return _format_join(node)
    return format_expr(node)


def _num(x) -> str:
    return str(int(x)) if float(x).is_integer() else str(x)


def _format_join(node: Join) -> str:
    left = _format_factor(node.left)
    right = _format_factor(node.right)
    words = []
    if node.is_global:
        words.append("GLOBAL")
    words.append({"all": "ALL", "any": "ANY", "asof": "ASOF",
                  "semi": "SEMI", "anti": "ANTI", "": ""}
                 .get(node.strictness, ""))
    words.append({"inner": "INNER", "left": "LEFT", "right": "RIGHT",
                  "full": "FULL", "cross": "CROSS"}[node.kind])
    words.append("JOIN")
    out = f"{left} " + " ".join(w for w in words if w) + f" {right}"
    if node.using is not None:
        out += " USING (" + ", ".join(node.using) + ")"
    elif node.on is not None:
        out += " ON " + format_expr(node.on)
    return out


def format_sql(q, one_line: bool = False, indent: int = 0) -> str:
    """Format a SELECT / UNION statement back as SQL. ``one_line=False``
    is the EXPLAIN SYNTAX shape: one clause per line (the reference's
    FormatSettings default), clause order per
    ``ASTSelectQuery::formatImpl``."""
    if isinstance(q, UnionQuery):
        seps = {"all": "UNION ALL", "distinct": "UNION DISTINCT",
                "": "UNION",
                "intersect": "INTERSECT DISTINCT",
                "intersect_all": "INTERSECT",
                "except": "EXCEPT DISTINCT", "except_all": "EXCEPT"}
        nl = " " if one_line else "\n"
        parts = [format_sql(q.selects[0], one_line, indent)]
        for mode, sel in zip(q.modes, q.selects[1:]):
            parts.append(seps[mode])
            parts.append(format_sql(sel, one_line, indent))
        return nl.join(parts)

    pad = "" if one_line else " " * (4 * indent)
    nl = " " if one_line else "\n"
    lines: list[str] = []
    if q.ctes:
        ws = []
        for name, sub in q.ctes:
            if isinstance(sub, (SelectQuery, UnionQuery)):
                ws.append(f"{name} AS ({format_sql(sub, one_line=True)})")
            else:
                ws.append(f"{format_expr(sub, need_parens=True)} AS {name}")
        lines.append(pad + "WITH " + ", ".join(ws))
    sel = "SELECT DISTINCT" if q.distinct else "SELECT"
    if q.distinct_on:
        sel = ("SELECT DISTINCT ON ("
               + ", ".join(format_expr(e) for e in q.distinct_on) + ")")
    lines.append(pad + sel + " "
                 + ", ".join(format_expr(e) for e in q.select))
    if q.from_ is not None:
        lines.append(pad + "FROM " + _format_factor(q.from_))
    if q.array_join is not None:
        kw = "LEFT ARRAY JOIN" if q.array_join.left else "ARRAY JOIN"
        lines.append(pad + kw + " "
                     + ", ".join(format_expr(e)
                                 for e in q.array_join.exprs))
    if q.prewhere is not None:
        lines.append(pad + "PREWHERE " + format_expr(q.prewhere))
    if q.where is not None:
        lines.append(pad + "WHERE " + format_expr(q.where))
    if q.group_by is not None:
        gb = q.group_by
        if gb.mode == "grouping_sets" and gb.grouping_sets is not None:
            sets = ", ".join(
                "(" + ", ".join(format_expr(e) for e in s) + ")"
                for s in gb.grouping_sets)
            lines.append(pad + "GROUP BY GROUPING SETS (" + sets + ")")
        elif gb.exprs:
            lines.append(pad + "GROUP BY "
                         + ", ".join(format_expr(e) for e in gb.exprs))
        else:
            lines.append(pad + "GROUP BY ()")
        if gb.mode == "rollup":
            lines.append(pad + ("" if one_line else "    ") + "WITH ROLLUP")
        elif gb.mode == "cube":
            lines.append(pad + ("" if one_line else "    ") + "WITH CUBE")
        if gb.with_totals:
            lines.append(pad + ("" if one_line else "    ") + "WITH TOTALS")
    if q.having is not None:
        lines.append(pad + "HAVING " + format_expr(q.having))
    if q.windows:
        lines.append(pad + "WINDOW " + ", ".join(
            f"{n} AS ({_format_window(w)})" for n, w in q.windows.items()))
    if q.qualify is not None:
        lines.append(pad + "QUALIFY " + format_expr(q.qualify))
    if q.order_by:
        lines.append(pad + "ORDER BY "
                     + ", ".join(_format_order_item(it)
                                 for it in q.order_by))
        if q.interpolate:
            lines.append(pad + "INTERPOLATE (" + ", ".join(
                c + (" AS " + format_expr(e) if e is not None else "")
                for c, e in q.interpolate) + ")")
    if q.limit_by is not None:
        lb = q.limit_by
        head = (f"{lb.offset}, {lb.n}" if lb.offset else str(lb.n))
        lines.append(pad + f"LIMIT {head} BY "
                     + ", ".join(format_expr(e) for e in lb.exprs))
    if q.limit is not None:
        head = (f"{q.offset}, {q.limit}" if q.offset else str(q.limit))
        tail = " WITH TIES" if q.with_ties else ""
        lines.append(pad + f"LIMIT {head}{tail}")
    elif q.offset:
        lines.append(pad + f"OFFSET {q.offset}")
    if q.settings:
        lines.append(pad + "SETTINGS " + ", ".join(
            f"{k} = {v}" for k, v in q.settings.items()))
    return nl.join(lines)


# --- EXPLAIN AST tree dump ---------------------------------------------------

def _node_id(node) -> str:
    """Reference ``getID()`` spelling: NodeKind[_detail]."""
    if isinstance(node, Literal):
        v = node.value
        kind = ("NULL" if v is None else
                "Bool" if isinstance(v, bool) else
                "UInt64" if isinstance(v, int) and v >= 0 else
                "Int64" if isinstance(v, int) else
                "Float64" if isinstance(v, float) else "String")
        return f"Literal_{kind}_{_fmt_literal(v)}"
    if isinstance(node, Identifier):
        return f"Identifier_{node.name}"
    if isinstance(node, Alias):
        return f"Alias_{node.alias}"
    if isinstance(node, FuncCall):
        return f"Function_{node.name}"
    if isinstance(node, Cast):
        return f"Function_CAST_{node.type_name}"
    if isinstance(node, Star):
        return "Asterisk" if node.table is None \
            else f"QualifiedAsterisk_{node.table}"
    if isinstance(node, TableRef):
        return "TableIdentifier_" + (
            f"{node.database}.{node.table}" if node.database else node.table)
    if isinstance(node, TableFunction):
        return f"Function_{node.name}"
    if isinstance(node, Subquery) or isinstance(node, SubqueryRef):
        return "Subquery"
    if isinstance(node, SelectQuery):
        return "SelectQuery"
    if isinstance(node, UnionQuery):
        return "SelectWithUnionQuery"
    if isinstance(node, Join):
        return f"TablesInSelectQueryElement_{node.kind}_join"
    if isinstance(node, Lambda):
        return "Function_lambda"
    if isinstance(node, GroupBy):
        return f"GroupByClause_{node.mode}"
    if isinstance(node, OrderItem):
        return "OrderByElement"
    if isinstance(node, WindowSpec):
        return "WindowDefinition"
    if isinstance(node, ArrayLiteral):
        return "Function_array"
    if isinstance(node, TupleLiteral):
        return "Function_tuple"
    if isinstance(node, IntervalExpr):
        return f"Function_toInterval{node.unit.capitalize()}"
    if isinstance(node, QueryParameter):
        return f"QueryParameter_{node.name}:{node.type_name}"
    return type(node).__name__


def _children(node) -> list:
    if isinstance(node, FuncCall):
        out = list(node.params) + list(node.args)
        if node.filter_where is not None:
            out.append(node.filter_where)
        if isinstance(node.window, WindowSpec):
            out.append(node.window)
        return out
    if isinstance(node, Alias):
        return [node.expr]
    if isinstance(node, Cast):
        return [node.expr]
    if isinstance(node, (ArrayLiteral, TupleLiteral)):
        return list(node.items)
    if isinstance(node, Lambda):
        return [node.body]
    if isinstance(node, IntervalExpr):
        return [node.value]
    if isinstance(node, Subquery):
        return [node.query]
    if isinstance(node, SubqueryRef):
        return [node.query]
    if isinstance(node, UnionQuery):
        return list(node.selects)
    if isinstance(node, Join):
        out = [node.left, node.right]
        if node.on is not None:
            out.append(node.on)
        return out
    if isinstance(node, GroupBy):
        return ([e for s in node.grouping_sets for e in s]
                if node.grouping_sets is not None else list(node.exprs))
    if isinstance(node, OrderItem):
        return [node.expr] + [e for e in (node.fill_from, node.fill_to,
                                          node.fill_step) if e is not None]
    if isinstance(node, WindowSpec):
        return list(node.partition_by) + list(node.order_by)
    if isinstance(node, ArrayJoinClause):
        return list(node.exprs)
    if isinstance(node, SelectQuery):
        out: list = []
        for _, sub in node.ctes:
            out.append(sub)
        out.extend(node.select)
        for part in (node.from_, node.array_join, node.prewhere,
                     node.where, node.group_by, node.having):
            if part is not None:
                out.append(part)
        out.extend(node.windows.values())
        out.extend(node.order_by)
        if node.limit_by is not None:
            out.extend(node.limit_by.exprs)
        return out
    return []


def dump_ast(node, indent: int = 0) -> str:
    """Reference-style AST dump (IAST::dumpTree, ``IAST.cpp:159-168``):
    ``getID()`` per node, '-'-per-level indentation; pointer hex omitted
    (process-specific, never stable)."""
    lines = [("-" * indent) + _node_id(node)]
    for child in _children(node):
        if isinstance(child, Node) or isinstance(child, (SelectQuery,
                                                         UnionQuery)):
            lines.append(dump_ast(child, indent + 1))
    return "\n".join(lines)
