"""Statement-level grammar: DDL / INSERT / SHOW / admin verbs.

Mirrors the reference's top-level dispatch (``ParserQuery.cpp:51-67`` and
``ParserQueryWithOutput.cpp:56-75``): SELECT(+UNION), INSERT, CREATE,
DROP, RENAME, SHOW, DESCRIBE, EXISTS, USE, SET, EXPLAIN, OPTIMIZE,
TRUNCATE, CHECK. DDL details follow ``ParserCreateQuery.cpp``
(column list :100-283, storage clause ENGINE/ORDER BY/PARTITION BY/
SAMPLE BY/TTL/SETTINGS :332-449).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .ast_nodes import Node, SelectQuery, UnionQuery
from .lexer import T
from .parser import ParseError, Parser


@dataclass
class ColumnDef(Node):
    name: str
    type_name: str
    default: Node | None = None
    default_kind: str | None = None    # DEFAULT | MATERIALIZED | ALIAS
    comment: str | None = None
    codec: str | None = None
    hierarchical: bool = False         # dictionary attribute flag


@dataclass
class CreateTable(Node):
    database: str | None
    table: str
    columns: list[ColumnDef]
    engine: str = "MergeTree"
    engine_args: list[str] = field(default_factory=list)
    order_by: list[str] = field(default_factory=list)
    partition_by: Node | None = None
    primary_key: list[str] = field(default_factory=list)
    sample_by: str | None = None
    ttl: str | None = None
    settings: dict = field(default_factory=dict)
    if_not_exists: bool = False
    or_replace: bool = False
    temporary: bool = False
    as_select: SelectQuery | UnionQuery | None = None
    as_table: str | None = None


@dataclass
class CreateDatabase(Node):
    name: str
    if_not_exists: bool = False


@dataclass
class CreateView(Node):
    database: str | None
    name: str
    query: SelectQuery | UnionQuery
    materialized: bool = False
    populate: bool = False
    to_table: str | None = None
    if_not_exists: bool = False
    or_replace: bool = False
    engine: str | None = None      # MV inner-table ENGINE (parsed, the
    order_by: list = None          # Spark store is parquet/memory-backed)


@dataclass
class CreateLiveView(Node):
    """CREATE LIVE VIEW lv [WITH PERIODIC REFRESH n] AS SELECT
    (reference ParserCreateQuery.cpp:666-817)."""
    name: str
    query: SelectQuery | UnionQuery
    refresh_sec: int | None = None
    timeout_sec: int | None = None
    if_not_exists: bool = False


@dataclass
class CreateWindowView(Node):
    """CREATE WINDOW VIEW wv [TO tbl] [WATERMARK=...] [ALLOWED_LATENESS=...]
    AS SELECT ... GROUP BY tumble/hop(...) (ParserCreateQuery.cpp:819-965)."""
    name: str
    query: SelectQuery | UnionQuery
    to_table: str | None = None
    watermark: str | None = None          # None=STRICTLY_ASCENDING, else interval text
    allowed_lateness: str | None = None
    if_not_exists: bool = False


@dataclass
class WatchStmt(Node):
    """WATCH lv [EVENTS] [LIMIT n] (ParserWatchQuery.cpp)."""
    name: str
    events: bool = False
    limit: int | None = None


@dataclass
class OutputClause(Node):
    """INTO OUTFILE 'f' [COMPRESSION 'm'] / FORMAT name wrapper around a
    query (ParserQueryWithOutput.cpp:83-130)."""
    query: Node
    outfile: str | None = None
    compression: str | None = None
    format: str | None = None
    settings: dict = field(default_factory=dict)   # SETTINGS after FORMAT


@dataclass
class CreateFunction(Node):
    """CREATE FUNCTION name AS (x, y) -> expr — SQL lambda UDF
    (reference declares the AST, ASTCreateFunctionQuery.h:11-28; the
    parser hookup is commented out at ParserQuery.cpp:43 like the
    format registrations; semantics per public CH docs)."""
    name: str
    fn: object                     # Lambda (or 0-arg expression) AST
    or_replace: bool = False
    if_not_exists: bool = False


@dataclass
class DropStmt(Node):
    kind: str                      # TABLE | DATABASE | VIEW
    database: str | None
    name: str
    if_exists: bool = False
    detach: bool = False           # DETACH keeps data for a later ATTACH


@dataclass
class AttachStmt(Node):
    """Bare ATTACH TABLE|DATABASE|DICTIONARY name — re-attach a
    previously DETACHed object (ParserCreateQuery
    ATTACH-without-definition path)."""
    database: str | None
    name: str
    if_not_exists: bool = False
    kind: str = "TABLE"            # TABLE | DATABASE | DICTIONARY


@dataclass
class CreateDictionary(Node):
    """CREATE DICTIONARY (public ClickHouse grammar; the reference
    comments dictionary DDL out — ``ParserCreateQuery.cpp:2282-2296``).
    A dictionary is a RAM-bounded lookup table over a source table,
    queried point-wise via dictGet*/dictHas."""
    database: str | None
    name: str
    columns: list[ColumnDef] = field(default_factory=list)
    primary_key: list[str] = field(default_factory=list)
    source_table: str | None = None
    source_db: str | None = None
    layout: str = "HASHED"
    lifetime: str | None = None
    if_not_exists: bool = False
    or_replace: bool = False


@dataclass
class AlterAction(Node):
    """One ALTER TABLE command (public ClickHouse ALTER grammar; the
    reference comments the whole ALTER branch out of its dispatch —
    ``ParserQuery.cpp:38-47`` — so this is beyond-reference surface)."""
    kind: str                  # ADD_COLUMN | DROP_COLUMN | RENAME_COLUMN |
    #                            MODIFY_COLUMN | COMMENT_COLUMN | UPDATE |
    #                            DELETE | ADD_INDEX | DROP_INDEX | MODIFY_TTL
    column: ColumnDef | None = None
    name: str | None = None
    new_name: str | None = None
    after: str | None = None
    first: bool = False
    if_exists: bool = False
    if_not_exists: bool = False
    assignments: list | None = None      # [(col, expr)] for UPDATE
    where: Node | None = None            # UPDATE / DELETE predicate
    partition: Node | None = None        # IN PARTITION scope (expr)
    text: str | None = None              # COMMENT text / INDEX / TTL spec


@dataclass
class AlterStmt(Node):
    database: str | None
    table: str
    actions: list[AlterAction] = field(default_factory=list)


@dataclass
class RenameTable(Node):
    renames: list[tuple[str, str]]
    exchange: bool = False     # EXCHANGE TABLES a AND b — atomic swap
    database: bool = False     # RENAME DATABASE a TO b


@dataclass
class ExternalDDL(Node):
    """EXTERNAL DDL FROM MySQL('host:port','db','t','user','pw') <ddl>
    (ParserExternalDDLQuery.cpp:26-55) — replay a MySQL-side DDL
    statement against our catalog. The reference wires CH DROP/RENAME
    parsers after the prefix (its MySQL CREATE/ALTER sub-parsers are
    compiled out via USE_MYSQL); we additionally translate MySQL-dialect
    CREATE TABLE through the public MaterializeMySQL type mapping."""
    source: str                    # e.g. "MySQL"
    source_args: list[object]
    inner: Node


@dataclass
class InsertStmt(Node):
    database: str | None
    table: str
    columns: list[str] | None
    values: list[list[Node]] | None = None      # VALUES form
    select: SelectQuery | UnionQuery | None = None
    watch_view: str | None = None               # INSERT INTO t WATCH lv
    infile: str | None = None                   # FROM INFILE 'path'
    format: str | None = None                   # FORMAT name
    format_data: str | None = None              # inline rows after FORMAT
    settings: dict = field(default_factory=dict)  # INSERT ... SETTINGS
    function: Node | None = None                # INSERT INTO FUNCTION f(...)


@dataclass
class SystemStmt(Node):
    """SYSTEM <verb ...> (ASTSystemQuery.h:16-68) — admin no-ops with
    honest reporting."""
    verb: str


@dataclass
class KillStmt(Node):
    where: str


@dataclass
class BackupStmt(Node):
    kind: str            # BACKUP | RESTORE
    database: str | None
    table: str           # "" for whole-database form
    path: str
    target: str = "TABLE"     # TABLE | DATABASE (ASTBackupQuery.h)
    new_database: str | None = None   # [AS|INTO new] element rename
    new_table: str | None = None      # (ParserBackupQuery.cpp:107-119)


@dataclass
class ShowStmt(Node):
    what: str                      # TABLES | DATABASES | CREATE_TABLE
    database: str | None = None
    like: str | None = None
    not_like: bool = False
    target: str | None = None      # SHOW CREATE TABLE target


@dataclass
class DescribeStmt(Node):
    database: str | None
    table: str
    query: Node | None = None      # DESCRIBE (SELECT ...) form


@dataclass
class ExistsStmt(Node):
    database: str | None
    table: str


@dataclass
class UseStmt(Node):
    database: str


@dataclass
class SetStmt(Node):
    settings: dict


@dataclass
class ExplainStmt(Node):
    kind: str                      # AST | SYNTAX | PLAN | PIPELINE
    query: SelectQuery | UnionQuery


@dataclass
class OptimizeStmt(Node):
    database: str | None
    table: str
    final: bool = False
    deduplicate: bool = False
    dedup_by: list[str] | None = None


@dataclass
class TruncateStmt(Node):
    database: str | None
    table: str
    if_exists: bool = False


@dataclass
class CheckStmt(Node):
    database: str | None
    table: str


_MYSQL_INT = {"TINYINT": ("Int8", "UInt8"), "SMALLINT": ("Int16", "UInt16"),
              "MEDIUMINT": ("Int32", "UInt32"), "INT": ("Int32", "UInt32"),
              "INTEGER": ("Int32", "UInt32"), "BIGINT": ("Int64", "UInt64")}


def _mysql_type_to_ch(base: str, args: list[str], unsigned: bool) -> str:
    """MySQL column type → ClickHouse type (public MaterializeMySQL
    conversion table). String-ish, blob-ish, enum/set/json/time all land
    on String; DECIMAL keeps precision/scale; DATETIME/TIMESTAMP keep
    sub-second precision via DateTime64(p)."""
    b = base.upper()
    if b in _MYSQL_INT:
        return _MYSQL_INT[b][1 if unsigned else 0]
    if b in ("BOOL", "BOOLEAN"):
        return "Int8"
    if b == "BIT":
        return "UInt64"
    if b == "FLOAT":
        return "Float32"
    if b in ("DOUBLE", "REAL"):
        return "Float64"
    if b in ("DECIMAL", "NUMERIC", "DEC", "FIXED"):
        p = args[0] if args else "10"
        s = args[1] if len(args) > 1 else "0"
        return f"Decimal({p}, {s})"
    if b == "DATE":
        return "Date"
    if b in ("DATETIME", "TIMESTAMP"):
        if args and args[0] not in ("0", ""):
            return f"DateTime64({args[0]})"
        return "DateTime"
    if b == "YEAR":
        return "UInt16"
    return "String"


_INSERT_FMT_RE = None


def parse_statement(sql: str) -> Node:
    # INSERT ... FORMAT fmt <raw rows>: split the data off BEFORE
    # lexing — raw rows (TSV backslash escapes, arbitrary bytes) need
    # not tokenize as SQL. clickhouse-client splits the same way.
    global _INSERT_FMT_RE
    if _INSERT_FMT_RE is None:
        import re as _re
        _INSERT_FMT_RE = _re.compile(
            r"^(\s*INSERT\s+INTO\s+[^'\"]*?\bFORMAT\s+(\w+))[ \t\r\n]",
            _re.IGNORECASE | _re.DOTALL)
    m = _INSERT_FMT_RE.match(sql)
    if m and m.group(2).upper() != "VALUES":
        head, data = m.group(1), sql[m.end():]
        # The regex can match a FORMAT-like token inside a comment
        # (INSERT INTO t /* FORMAT CSV */ VALUES (1)) — only take the
        # split path when the head parses cleanly; otherwise fall back
        # to the full parser, which handles comments correctly.
        from .lexer import LexError
        try:
            node = StatementParser(head).parse_statement()
        except (ParseError, LexError):
            node = None
        if node is not None:
            if getattr(node, "format_data", None) in (None, ""):
                node.format_data = data
            return node
    return StatementParser(sql).parse_statement()


class StatementParser(Parser):
    def parse_statement(self) -> Node:
        node = self._dispatch()
        # INTO OUTFILE / FORMAT suffix (query-with-output wrapper)
        outfile = compression = fmt = None
        if self.accept_kws("INTO", "OUTFILE"):
            outfile = self.advance().text
            if self.accept_kw("COMPRESSION"):
                compression = self.advance().text
        if self.accept_kw("FORMAT"):
            fmt = self.advance().text
        # SETTINGS may follow FORMAT — the reference's output-clause
        # order is [INTO OUTFILE] [FORMAT f] [SETTINGS k=v,…] and the
        # pairs are pushed down into the SELECT
        # (ParserQueryWithOutput.cpp:103-130,
        # QueryWithOutputSettingsPushDownVisitor)
        out_settings: dict = {}
        if (outfile or fmt) and self.accept_kw("SETTINGS"):
            while True:
                name = self.advance().text
                self.expect_op("=")
                out_settings[name] = self._literal_value()
                if not self.accept_op(","):
                    break
            tgt = node
            while isinstance(tgt, UnionQuery):
                tgt = tgt.selects[-1]
            if isinstance(tgt, SelectQuery):
                tgt.settings.update(out_settings)
        self.accept_op(";")
        if self.tok.kind != T.EOF:
            raise ParseError(f"trailing input at {self.tok.pos}: "
                             f"{self.tok.text!r}")
        if outfile or fmt:
            return OutputClause(node, outfile, compression, fmt,
                                out_settings)
        return node

    def _dispatch(self) -> Node:
        t = self.tok
        if t.is_kw("SELECT", "WITH"):
            return self._union()
        if t.is_kw("WATCH"):
            self.advance()
            name = self.advance().text
            events = bool(self.accept_kw("EVENTS"))
            limit = None
            if self.accept_kw("LIMIT"):
                limit = int(self.advance().text)
            return WatchStmt(name, events, limit)
        if t.is_kw("CREATE", "ATTACH"):
            return self._create()
        if t.is_kw("DROP", "DETACH"):
            return self._drop()
        if t.is_kw("RENAME"):
            return self._rename()
        if t.is_kw("EXCHANGE"):
            return self._exchange()
        if t.is_kw("ALTER"):
            return self._alter()
        if t.is_kw("INSERT"):
            return self._insert()
        if t.is_kw("SHOW"):
            return self._show()
        if t.is_kw("DESCRIBE", "DESC"):
            return self._describe()
        if t.is_kw("EXISTS"):
            return self._exists()
        if t.is_kw("USE"):
            self.advance()
            return UseStmt(self.advance().text)
        if t.is_kw("SET"):
            return self._set()
        if t.is_kw("EXPLAIN"):
            return self._explain()
        if t.is_kw("OPTIMIZE"):
            return self._optimize()
        if t.is_kw("TRUNCATE"):
            self.advance()
            self.accept_kw("TABLE")
            ie = bool(self.accept_kws("IF", "EXISTS"))
            db, name = self._qualified_name()
            return TruncateStmt(db, name, if_exists=ie)
        if t.is_kw("CHECK"):
            self.advance()
            self.expect_kw("TABLE")
            db, name = self._qualified_name()
            return CheckStmt(db, name)
        if t.is_kw("SYSTEM"):
            self.advance()
            parts = []
            while self.tok.kind != T.EOF and not self.tok.is_op(";"):
                parts.append(self.advance().text)
            return SystemStmt(" ".join(parts).upper())
        if t.is_kw("KILL"):
            self.advance()
            if not self.accept_kw("QUERY"):
                # KILL MUTATION WHERE ... — same grammar, targets the
                # mutations table (mutations here complete inline, so
                # there is never one to kill; statement still parses)
                self.expect_kw("MUTATION")
            self.expect_kw("WHERE")
            parts = []
            while self.tok.kind != T.EOF and not self.tok.is_op(";") \
                    and not self.tok.is_kw("SYNC", "ASYNC", "TEST"):
                parts.append(self.advance().text)
            self.accept_kw("SYNC") or self.accept_kw("ASYNC") \
                or self.accept_kw("TEST")
            return KillStmt(" ".join(parts))
        if t.is_kw("EXTERNAL"):
            return self._external_ddl()
        if t.is_kw("BACKUP", "RESTORE"):
            kind = self.advance().text.upper()
            new_db = new_name = None
            if self.accept_kw("DATABASE"):
                target, db, name = "DATABASE", self.advance().text, ""
                # per-element rename (ParserBackupQuery.cpp:107-119):
                # BACKUP accepts AS; RESTORE accepts AS|INTO
                if self.accept_kw("AS") or self.accept_kw("INTO"):
                    new_db = self.advance().text
            else:
                self.expect_kw("TABLE")
                target = "TABLE"
                db, name = self._qualified_name()
                if self.accept_kw("AS") or self.accept_kw("INTO"):
                    new_db, new_name = self._qualified_name()
            if not (self.accept_kw("TO") or self.accept_kw("FROM")):
                raise ParseError(f"{kind} requires TO/FROM at {self.tok.pos}")
            path = self._backup_name(kind)
            if self.accept_kw("SETTINGS"):
                # ParserBackupQuery.cpp:165-190: a SETTINGS list where
                # base_backup = Disk(...) names an incremental base.
                # Parse the full grammar; none of the backup settings
                # are implemented — raise the named error instead of a
                # silent no-op.
                while True:
                    sname = self.advance().text
                    self.expect_op("=")
                    if self.tok.kind != T.EOF and not self.tok.is_op(";"):
                        self._backup_name(kind)     # value: name(...)|lit
                    raise ParseError(
                        f"{kind} SETTINGS {sname} is not implemented "
                        f"(NOT_IMPLEMENTED)")
            return BackupStmt(kind, db, name, path, target=target,
                              new_database=new_db, new_table=new_name)
        if t.is_kw("UNDROP"):
            # UNDROP TABLE [db.]t (public grammar since 23.3): restore
            # a dropped table from the drop-trash window
            self.advance()
            self.expect_kw("TABLE")
            db, name = self._qualified_name()
            return DropStmt("UNDROP", db, name, False)
        if t.is_kw("DELETE"):
            # lightweight DELETE (public grammar since 22.8):
            # DELETE FROM [db.]t [IN PARTITION p] WHERE expr — same
            # mutation semantics as ALTER TABLE ... DELETE
            self.advance()
            self.expect_kw("FROM")
            db, name = self._qualified_name()
            part = None
            if self.accept_kws("IN", "PARTITION"):
                part = self._expr()
            self.expect_kw("WHERE")
            return AlterStmt(db, name, [
                AlterAction("DELETE", where=self._expr(),
                            partition=part)])
        if t.is_op("("):
            return self.parse_query()
        raise ParseError(f"unknown statement start: {t.text!r}")

    def _interval_text(self) -> str:
        """Parse ``INTERVAL n UNIT`` into Spark's '<n> <unit>' delay text."""
        self.expect_kw("INTERVAL")
        n = self.advance().text
        unit = self.advance().text.lower().rstrip("s")
        return f"{n} {unit}s"

    def _qualified_name(self) -> tuple[str | None, str]:
        a = self.advance().text
        if self.accept_op("."):
            return a, self.advance().text
        return None, a

    def _backup_name(self, kind: str) -> str:
        """Backup-name grammar: an identifier with an optional parameter
        list — ``Disk('backups', 'name')``, ``File('path')``,
        ``Disk('path')`` — or a bare string literal
        (``ParserBackupQuery.cpp:150-153`` routes through
        ``ParserIdentifierWithOptionalParameters``). Multiple parameters
        join as path segments (disk directory + backup name)."""
        import os as _os
        if self.tok.is_kw("DISK", "FILE") and self.peek().is_op("("):
            self.advance()
            self.advance()
            args: list[str] = []
            while not self.tok.is_op(")"):
                args.append(self.advance().text)
                self.accept_op(",")
            self.expect_op(")")
            if not args:
                raise ParseError(f"{kind}: empty backup-name parameters")
            return _os.path.join(*args)
        return self.advance().text

    # --- CREATE ----------------------------------------------------------

    def _external_ddl(self) -> ExternalDDL:
        """EXTERNAL DDL FROM MySQL(...) <create|drop|rename|truncate>."""
        self.advance()                       # EXTERNAL
        self.expect_kw("DDL")
        self.expect_kw("FROM")
        source = self.advance().text
        args: list[object] = []
        self.expect_op("(")
        while not self.tok.is_op(")"):
            args.append(self.advance().text)
            self.accept_op(",")
        self.expect_op(")")
        if source.lower() != "mysql":
            raise ParseError(f"EXTERNAL DDL source {source!r} is not "
                             f"supported (only MySQL)")
        t = self.tok
        if t.is_kw("CREATE"):
            inner: Node = self._mysql_create()
        elif t.is_kw("DROP", "DETACH"):
            inner = self._drop()
        elif t.is_kw("RENAME"):
            inner = self._rename()
        elif t.is_kw("TRUNCATE"):
            self.advance()
            self.accept_kw("TABLE")
            db, name = self._qualified_name()
            inner = TruncateStmt(db, name)
        else:
            raise ParseError(
                f"EXTERNAL DDL: cannot parse MySQL query starting at "
                f"{t.text!r} (expected CREATE/DROP/RENAME/TRUNCATE)")
        return ExternalDDL(source, args, inner)

    def _mysql_create(self) -> CreateTable:
        """MySQL-dialect CREATE TABLE → CreateTable with CH column types
        (public MaterializeMySQL mapping: nullable-by-default columns
        become Nullable(T), PRIMARY KEY becomes the ORDER BY key, engine
        is ReplacingMergeTree)."""
        self.advance()                       # CREATE
        temporary = bool(self.accept_kw("TEMPORARY"))
        self.expect_kw("TABLE")
        if_not_exists = False
        if self.accept_kw("IF"):
            self.expect_kw("NOT")
            self.expect_kw("EXISTS")
            if_not_exists = True
        db, name = self._qualified_name()
        self.expect_op("(")
        cols: list[ColumnDef] = []
        not_null: set[str] = set()
        pk: list[str] = []
        while True:
            t = self.tok
            if t.is_kw("PRIMARY"):
                self.advance()
                self.expect_kw("KEY")
                self.expect_op("(")
                while not self.tok.is_op(")"):
                    pk.append(self.advance().text)
                    # index prefix length `col(10)` / ASC|DESC — skip
                    if self.accept_op("("):
                        self.advance()
                        self.expect_op(")")
                    self.accept_kw("ASC") or self.accept_kw("DESC")
                    self.accept_op(",")
                self.expect_op(")")
            elif t.is_kw("KEY", "INDEX", "UNIQUE", "FULLTEXT", "SPATIAL",
                         "CONSTRAINT", "CHECK", "FOREIGN"):
                self._skip_to_comma_or_close()
            else:
                cd, nn = self._mysql_column()
                cols.append(cd)
                if nn:
                    not_null.add(cd.name)
            if not self.accept_op(","):
                break
        self.expect_op(")")
        # inline PRIMARY KEY marker recorded via not_null + _inline_pk
        pk = pk or getattr(self, "_mysql_inline_pk", [])
        self._mysql_inline_pk = []
        # table options (ENGINE=InnoDB, AUTO_INCREMENT=…, CHARSET…) end
        # the statement — recorded nowhere, the MySQL engine name has no
        # meaning on our side
        while self.tok.kind != T.EOF and not self.tok.is_op(";"):
            self.advance()
        for cd in cols:
            if cd.name not in not_null and cd.name not in pk \
                    and not cd.type_name.startswith("Nullable("):
                cd.type_name = f"Nullable({cd.type_name})"
        return CreateTable(db, name, cols, engine="ReplacingMergeTree",
                           order_by=list(pk) or [cols[0].name],
                           primary_key=list(pk), temporary=temporary,
                           if_not_exists=if_not_exists)

    def _mysql_column(self) -> tuple[ColumnDef, bool]:
        """One MySQL column definition; returns (def, is_not_null)."""
        name = self.advance().text
        base = self.advance().text
        targs: list[str] = []
        if self.accept_op("("):
            while not self.tok.is_op(")"):
                targs.append(self.advance().text)
                self.accept_op(",")
            self.expect_op(")")
        unsigned = bool(self.accept_kw("UNSIGNED"))
        self.accept_kw("ZEROFILL")
        if self.accept_kw("CHARACTER"):
            self.expect_kw("SET")
            self.advance()
        if self.accept_kw("COLLATE"):
            self.advance()
        cd = ColumnDef(name, _mysql_type_to_ch(base, targs, unsigned))
        nn = False
        while True:
            if self.accept_kws("NOT", "NULL"):
                nn = True
            elif self.accept_kw("NULL"):
                pass
            elif self.accept_kw("DEFAULT"):
                if self.tok.is_kw("CURRENT_TIMESTAMP", "NOW"):
                    self.advance()
                    if self.accept_op("("):
                        while not self.accept_op(")"):
                            self.advance()
                else:
                    self._expr()
            elif self.accept_kw("ON"):
                self.expect_kw("UPDATE")
                self.advance()                      # CURRENT_TIMESTAMP
                if self.accept_op("("):
                    while not self.accept_op(")"):
                        self.advance()
            elif self.accept_kw("AUTO_INCREMENT"):
                nn = True
            elif self.accept_kw("PRIMARY"):
                self.expect_kw("KEY")
                nn = True
                self._mysql_inline_pk = getattr(
                    self, "_mysql_inline_pk", []) + [name]
            elif self.accept_kw("UNIQUE"):
                self.accept_kw("KEY")
            elif self.accept_kw("COMMENT"):
                cd.comment = self.advance().text
            else:
                break
        return cd, nn

    def _create(self):
        is_attach = self.tok.is_kw("ATTACH")
        self.advance()                       # CREATE/ATTACH
        if is_attach and self.tok.is_kw("TABLE", "DATABASE", "DICTIONARY"):
            # bare ATTACH <kind> name: re-attach a DETACHed object; a
            # definition after the name falls through to CREATE-style
            # ATTACH (re-parsed from the saved position)
            save = self.i
            kind = self.advance().text.upper()
            ine = bool(self.accept_kws("IF", "NOT", "EXISTS"))
            db, name = self._qualified_name()
            if self.tok.kind == T.EOF or self.tok.is_op(";"):
                return AttachStmt(db, name, ine, kind)
            self.i = save                    # full definition: re-parse
        or_replace = bool(self.accept_kws("OR", "REPLACE"))
        temporary = bool(self.accept_kw("TEMPORARY"))
        if self.accept_kw("DATABASE"):
            ine = bool(self.accept_kws("IF", "NOT", "EXISTS"))
            dbname = self.advance().text
            # optional ENGINE = Atomic[(...)] / COMMENT — accepted and
            # ignored (single engine here), so the full-definition
            # ATTACH DATABASE x ENGINE = Atomic form parses
            if self.accept_kw("ENGINE"):
                self.accept_op("=")
                self.advance()
                if self.accept_op("("):
                    while not self.accept_op(")"):
                        self.advance()
            if self.accept_kw("COMMENT"):
                self.advance()
            return CreateDatabase(dbname, ine)
        if self.accept_kw("FUNCTION"):
            ine = bool(self.accept_kws("IF", "NOT", "EXISTS"))
            name = self.advance().text
            self.expect_kw("AS")
            return CreateFunction(name, self._expr(), or_replace, ine)
        if self.accept_kw("DICTIONARY"):
            return self._create_dictionary(or_replace)
        if self.accept_kws("LIVE", "VIEW"):
            ine = bool(self.accept_kws("IF", "NOT", "EXISTS"))
            _, name = self._qualified_name()
            lv = CreateLiveView(name, None, if_not_exists=ine)
            while self.accept_kw("WITH"):
                if self.accept_kw("TIMEOUT"):
                    lv.timeout_sec = int(self.advance().text)
                elif self.accept_kws("PERIODIC", "REFRESH"):
                    lv.refresh_sec = int(self.advance().text)
            self.expect_kw("AS")
            lv.query = self._union()
            return lv
        if self.accept_kws("WINDOW", "VIEW"):
            ine = bool(self.accept_kws("IF", "NOT", "EXISTS"))
            _, name = self._qualified_name()
            wv = CreateWindowView(name, None, if_not_exists=ine)
            if self.accept_kw("TO"):
                _, wv.to_table = self._qualified_name()
            if self.accept_kw("WATERMARK"):
                self.expect_op("=")
                if self.accept_kw("STRICTLY_ASCENDING") \
                        or self.accept_kw("ASCENDING"):
                    wv.watermark = "0 seconds"
                else:
                    wv.watermark = self._interval_text()
            if self.accept_kw("ALLOWED_LATENESS"):
                self.expect_op("=")
                wv.allowed_lateness = self._interval_text()
            self.expect_kw("AS")
            wv.query = self._union()
            return wv
        materialized = bool(self.accept_kw("MATERIALIZED"))
        if self.accept_kw("VIEW"):
            ine = bool(self.accept_kws("IF", "NOT", "EXISTS"))
            db, name = self._qualified_name()
            to_table = None
            if self.accept_kw("TO"):
                _, to_table = self._qualified_name()
            # [ENGINE = X [ORDER BY ...]] — the MV's INNER-table storage
            # clause (ParserCreateQuery.cpp materialized-view grammar);
            # parsed via the shared storage-clause path, recorded on the
            # node (the Spark store keeps MV results as managed frames)
            engine = order_by = None
            if self.tok.is_kw("ENGINE", "ORDER", "PARTITION", "SETTINGS",
                              "PRIMARY"):
                dummy = CreateTable(db, name, [])
                self._storage_clause(dummy)
                engine, order_by = dummy.engine, dummy.order_by
            populate = bool(self.accept_kw("POPULATE"))
            self.expect_kw("AS")
            q = self._union()
            return CreateView(db, name, q, materialized, populate,
                              to_table, ine, or_replace, engine, order_by)
        self.expect_kw("TABLE")
        ine = bool(self.accept_kws("IF", "NOT", "EXISTS"))
        db, name = self._qualified_name()
        ct = CreateTable(db, name, [], if_not_exists=ine,
                         or_replace=or_replace, temporary=temporary)
        if self.accept_op("("):
            self._projection_names = []
            ct.columns = self._column_defs()
            self.expect_op(")")
            if self._projection_names:
                ct.settings["projections"] = list(self._projection_names)
        self._storage_clause(ct)
        if self.accept_kw("AS"):
            if self.tok.is_kw("SELECT", "WITH") or self.tok.is_op("("):
                ct.as_select = self._union()
            elif self.peek().is_op("("):
                # AS table_function(...) → SELECT * FROM tf(...)
                from .ast_nodes import SelectQuery as _SQ
                from .ast_nodes import Star as _Star
                ct.as_select = _SQ(select=[_Star()],
                                   from_=self._table_factor())
            else:
                _, ct.as_table = self._qualified_name()
        return ct

    def _create_dictionary(self, or_replace: bool) -> CreateDictionary:
        ine = bool(self.accept_kws("IF", "NOT", "EXISTS"))
        db, name = self._qualified_name()
        cd = CreateDictionary(db, name, if_not_exists=ine,
                              or_replace=or_replace)
        if self.accept_op("("):
            cd.columns = self._column_defs()
            self.expect_op(")")
        while self.tok.kind != T.EOF and not self.tok.is_op(";"):
            if self.accept_kws("PRIMARY", "KEY"):
                cd.primary_key.append(self.advance().text)
                while self.accept_op(","):
                    cd.primary_key.append(self.advance().text)
            elif self.accept_kw("SOURCE"):
                self.expect_op("(")
                self.advance()                    # source kind (CLICKHOUSE…)
                self.expect_op("(")
                while not self.tok.is_op(")"):
                    kw = self.advance().text.upper()
                    if kw == "TABLE":
                        cd.source_table = self.advance().text
                    elif kw == "DB":
                        cd.source_db = self.advance().text
                    # other params (HOST/PORT/USER/…): accepted, ignored
                self.expect_op(")")
                self.expect_op(")")
            elif self.accept_kw("LAYOUT"):
                self.expect_op("(")
                cd.layout = self.advance().text.upper()
                if self.accept_op("("):
                    while not self.accept_op(")"):
                        self.advance()
                self.expect_op(")")
            elif self.accept_kw("LIFETIME"):
                self.expect_op("(")
                parts = []
                while not self.tok.is_op(")"):
                    parts.append(self.advance().text)
                self.expect_op(")")
                cd.lifetime = " ".join(parts)
            else:
                raise ParseError(f"unexpected token in CREATE DICTIONARY "
                                 f"at {self.tok.pos}: {self.tok.text!r}")
        return cd

    def _column_defs(self) -> list[ColumnDef]:
        cols: list[ColumnDef] = []
        while True:
            if self.tok.is_kw("INDEX", "CONSTRAINT", "PROJECTION"):
                # secondary indexes/constraints/projections: parse & skip
                # (reference grammar ParserCreateQuery.h:103-212; engine
                # relies on parquet stats instead) — projection NAMES
                # are kept so ALTER ... MATERIALIZE PROJECTION resolves
                if self.tok.is_kw("PROJECTION"):
                    self.advance()
                    self._projection_names = getattr(
                        self, "_projection_names", [])
                    self._projection_names.append(self.tok.text)
                self._skip_to_comma_or_close()
            else:
                name = self.advance().text
                type_name = None
                if not self.tok.is_kw("DEFAULT", "MATERIALIZED",
                                       "ALIAS", "EPHEMERAL"):
                    type_name = self._type_name()
                cd = ColumnDef(name, type_name or "String")
                if self.tok.is_kw("DEFAULT", "MATERIALIZED", "ALIAS"):
                    cd.default_kind = self.advance().text.upper()
                    cd.default = self._expr()
                elif self.tok.is_kw("EPHEMERAL"):
                    # EPHEMERAL [expr]: INSERT-time-only input column
                    # (ParserCreateQuery.h:205-215); bare form defaults
                    # to the type default
                    self.advance()
                    cd.default_kind = "EPHEMERAL"
                    if not (self.tok.is_op(",") or self.tok.is_op(")")
                            or self.tok.is_kw("COMMENT", "CODEC", "TTL",
                                              "NOT", "NULL")):
                        cd.default = self._expr()
                self.accept_kws("NOT", "NULL") or self.accept_kw("NULL")
                if self.accept_kw("HIERARCHICAL"):
                    # dictionary attribute flag (public CH dictionary
                    # DDL; enables dictGetHierarchy/dictIsIn)
                    cd.hierarchical = True
                if self.accept_kw("COMMENT"):
                    cd.comment = self.advance().text
                if self.accept_kw("CODEC"):
                    depth = 0
                    parts = []
                    self.expect_op("(")
                    depth = 1
                    while depth:
                        tk = self.advance()
                        if tk.is_op("("):
                            depth += 1
                        elif tk.is_op(")"):
                            depth -= 1
                            if not depth:
                                break
                        parts.append(tk.text)
                    cd.codec = "".join(parts)
                if self.accept_kw("TTL"):
                    self._expr()
                cols.append(cd)
            if not self.accept_op(","):
                return cols

    def _skip_to_comma_or_close(self) -> None:
        depth = 0
        while True:
            t = self.tok
            if t.is_op("(") :
                depth += 1
            elif t.is_op(")"):
                if depth == 0:
                    return
                depth -= 1
            elif t.is_op(",") and depth == 0:
                return
            elif t.kind == T.EOF:
                raise ParseError("unterminated column list")
            self.advance()

    def _storage_clause(self, ct: CreateTable) -> None:
        if self.accept_kw("ENGINE"):
            self.accept_op("=")
            ct.engine = self.advance().text
            if self.accept_op("("):
                # engine parameters: ReplacingMergeTree(ver),
                # CollapsingMergeTree(sign), SummingMergeTree([cols…])
                # SummingMergeTree's column list may come as a TUPLE —
                # SummingMergeTree((a, b)) — so identifiers at depth 2
                # inside a leading '(' are arguments too
                depth = 1
                while depth:
                    tk = self.advance()
                    if tk.is_op("("):
                        depth += 1
                    elif tk.is_op(")"):
                        depth -= 1
                    elif depth in (1, 2) and tk.kind == T.IDENT:
                        ct.engine_args.append(tk.text)
        while True:
            if self.accept_kws("ORDER", "BY"):
                ct.order_by = self._key_list()
            elif self.accept_kws("PARTITION", "BY"):
                ct.partition_by = self._expr()
            elif self.accept_kws("PRIMARY", "KEY"):
                ct.primary_key = self._key_list()
            elif self.accept_kws("SAMPLE", "BY"):
                ct.sample_by = self.advance().text
            elif self.accept_kw("TTL"):
                parts = []
                while not (self.tok.kind == T.EOF
                           or self.tok.is_kw("SETTINGS", "AS", "ORDER",
                                             "PARTITION", "PRIMARY", "SAMPLE")):
                    parts.append(self.advance().text)
                ct.ttl = " ".join(parts)
            elif self.accept_kw("SETTINGS"):
                while True:
                    k = self.advance().text
                    self.expect_op("=")
                    ct.settings[k] = self._literal_value()
                    if not self.accept_op(","):
                        break
            else:
                return

    def _key_list(self) -> list[str]:
        """ORDER BY / PRIMARY KEY entries: plain columns OR expressions
        (``ORDER BY cityHash64(id)``). Expressions are stored as their
        canonical text; consumers re-parse and evaluate them
        (operators/final._materialize_expr_keys, ddl._key_columns)."""
        from .ast_nodes import FuncCall, Identifier, TupleLiteral
        from .format_sql import format_expr

        def fmt(e) -> str:
            return e.name if isinstance(e, Identifier) else format_expr(e)

        def one() -> list[str]:
            e = self._expr()
            if isinstance(e, FuncCall) and e.name == "tuple":
                # ORDER BY tuple() = unordered; tuple(a, b) = (a, b)
                return [fmt(a) for a in e.args]
            if isinstance(e, TupleLiteral):
                return [fmt(a) for a in e.items]
            return [fmt(e)]

        if self.accept_op("("):
            if self.accept_op(")"):    # ORDER BY () = unordered
                return []
            out = one()
            while self.accept_op(","):
                out.extend(one())
            self.expect_op(")")
            return out
        return one()

    # --- DROP / RENAME ----------------------------------------------------

    def _drop(self):
        detach = self.tok.is_kw("DETACH")
        self.advance()
        kind = "TABLE"
        if self.accept_kw("DATABASE"):
            kind = "DATABASE"
        elif self.accept_kw("FUNCTION"):
            if detach:
                raise ParseError("DETACH is not supported for FUNCTION")
            ie = bool(self.accept_kws("IF", "EXISTS"))
            return DropStmt("FUNCTION", None, self.advance().text, ie)
        elif self.accept_kw("VIEW"):
            kind = "VIEW"
        elif self.accept_kw("DICTIONARY"):
            kind = "DICTIONARY"
        else:
            self.accept_kw("TEMPORARY")
            self.expect_kw("TABLE")
        ie = bool(self.accept_kws("IF", "EXISTS"))
        db, name = self._qualified_name()
        self.accept_kw("PERMANENTLY")
        self.accept_kw("SYNC")
        return DropStmt(kind, db, name, ie, detach)

    def _rename(self):
        self.advance()
        if self.accept_kw("DATABASE"):
            # RENAME DATABASE a TO b [, c TO d] (public grammar)
            renames = []
            while True:
                a = self.advance().text
                self.expect_kw("TO")
                b = self.advance().text
                renames.append((a, b))
                if not self.accept_op(","):
                    break
            return RenameTable(renames, database=True)
        self.expect_kw("TABLE")
        renames = []
        while True:
            _, a = self._qualified_name()
            self.expect_kw("TO")
            _, b = self._qualified_name()
            renames.append((a, b))
            if not self.accept_op(","):
                break
        return RenameTable(renames)

    def _exchange(self):
        """EXCHANGE TABLES|DICTIONARIES a AND b [, c AND d]
        (reference: ParserRenameQuery.cpp:43-45) — atomic pairwise swap."""
        self.advance()
        if not (self.accept_kw("TABLES") or self.accept_kw("DICTIONARIES")):
            raise ParseError("expected TABLES or DICTIONARIES")
        pairs = []
        while True:
            _, a = self._qualified_name()
            self.expect_kw("AND")
            _, b = self._qualified_name()
            pairs.append((a, b))
            if not self.accept_op(","):
                break
        return RenameTable(pairs, exchange=True)

    def _alter(self):
        """ALTER TABLE [db.]t <command> [, <command>]* (public ClickHouse
        ALTER grammar: column DDL + UPDATE/DELETE mutations)."""
        self.advance()
        self.expect_kw("TABLE")
        db, table = self._qualified_name()
        actions: list[AlterAction] = []
        while True:
            actions.append(self._alter_action())
            if not self.accept_op(","):
                break
        return AlterStmt(db, table, actions)

    def _alter_action(self) -> AlterAction:
        if self.accept_kw("ADD"):
            if self.accept_kw("PROJECTION"):
                # ADD PROJECTION [IF NOT EXISTS] name (SELECT ...)
                ine = bool(self.accept_kws("IF", "NOT", "EXISTS"))
                name = self.advance().text
                parts = []
                while (self.tok.kind != T.EOF and not self.tok.is_op(",")
                       and not self.tok.is_op(";")):
                    parts.append(self.advance().text)
                return AlterAction("ADD_PROJECTION", name=name,
                                   text=" ".join(parts),
                                   if_not_exists=ine)
            if self.accept_kw("INDEX"):
                parts = []
                while (self.tok.kind != T.EOF and not self.tok.is_op(",")
                       and not self.tok.is_op(";")):
                    parts.append(self.advance().text)
                return AlterAction("ADD_INDEX", text=" ".join(parts))
            self.expect_kw("COLUMN")
            ine = bool(self.accept_kws("IF", "NOT", "EXISTS"))
            name = self.advance().text
            type_name = None
            if not self.tok.is_kw("DEFAULT", "MATERIALIZED", "ALIAS",
                                  "AFTER", "FIRST"):
                type_name = self._type_name()
            cd = ColumnDef(name, type_name or "String")
            if self.tok.is_kw("DEFAULT", "MATERIALIZED", "ALIAS"):
                cd.default_kind = self.advance().text.upper()
                cd.default = self._expr()
            first = bool(self.accept_kw("FIRST"))
            after = self.advance().text if self.accept_kw("AFTER") else None
            return AlterAction("ADD_COLUMN", column=cd, after=after,
                               first=first, if_not_exists=ine)
        if self.accept_kw("DROP"):
            if self.accept_kw("PROJECTION"):
                ie = bool(self.accept_kws("IF", "EXISTS"))
                return AlterAction("DROP_PROJECTION",
                                   name=self.advance().text, if_exists=ie)
            if self.accept_kw("INDEX"):
                return AlterAction("DROP_INDEX", name=self.advance().text)
            if self.accept_kw("PARTITION"):
                return AlterAction("DROP_PARTITION",
                                   partition=self._expr())
            if self.accept_kws("DETACHED", "PARTITION"):
                return AlterAction("DROP_DETACHED_PARTITION",
                                   partition=self._expr())
            self.expect_kw("COLUMN")
            ie = bool(self.accept_kws("IF", "EXISTS"))
            return AlterAction("DROP_COLUMN", name=self.advance().text,
                               if_exists=ie)
        if self.accept_kw("MATERIALIZE"):
            # MATERIALIZE COLUMN/TTL/INDEX/PROJECTION (public ALTER
            # grammar): recompute from the current default expression /
            # re-apply TTL to existing parts
            if self.accept_kw("COLUMN"):
                name = self.advance().text
                part = (self._expr()
                        if self.accept_kws("IN", "PARTITION") else None)
                return AlterAction("MATERIALIZE_COLUMN", name=name,
                                   partition=part)
            if self.accept_kw("TTL"):
                part = (self._expr()
                        if self.accept_kws("IN", "PARTITION") else None)
                return AlterAction("MATERIALIZE_TTL", partition=part)
            if self.accept_kw("INDEX") or self.accept_kw("PROJECTION"):
                name = self.advance().text
                part = (self._expr()
                        if self.accept_kws("IN", "PARTITION") else None)
                return AlterAction("MATERIALIZE_INDEX", name=name,
                                   partition=part)
            raise ParseError(f"MATERIALIZE expects COLUMN/TTL/INDEX/"
                             f"PROJECTION at {self.tok.pos}")
        if self.accept_kws("DETACH", "PARTITION"):
            return AlterAction("DETACH_PARTITION", partition=self._expr())
        if self.accept_kws("ATTACH", "PARTITION"):
            return AlterAction("ATTACH_PARTITION", partition=self._expr())
        if self.accept_kw("FREEZE"):
            part = None
            if self.accept_kw("PARTITION"):
                part = self._expr()
            return AlterAction("FREEZE", partition=part)
        if self.accept_kw("RENAME"):
            self.expect_kw("COLUMN")
            ie = bool(self.accept_kws("IF", "EXISTS"))
            old = self.advance().text
            self.expect_kw("TO")
            return AlterAction("RENAME_COLUMN", name=old,
                               new_name=self.advance().text, if_exists=ie)
        if self.accept_kw("CLEAR"):
            # CLEAR COLUMN c [IN PARTITION p]: reset to the type default
            # ONLY in the named partition (CH scopes the reset to the
            # partition's parts; other partitions keep their data)
            self.expect_kw("COLUMN")
            ie = bool(self.accept_kws("IF", "EXISTS"))
            name = self.advance().text
            part = None
            if self.accept_kws("IN", "PARTITION"):
                part = self._expr()
            return AlterAction("CLEAR_COLUMN", name=name, if_exists=ie,
                               partition=part)
        if self.accept_kw("MODIFY"):
            if self.accept_kw("COMMENT"):
                # table-level comment
                return AlterAction("MODIFY_COMMENT",
                                   text=self.advance().text)
            if self.accept_kw("ORDER"):
                # MODIFY ORDER BY expr — the new key must be a prefix
                # extension of the old one (checked at execution)
                self.expect_kw("BY")
                return AlterAction("MODIFY_ORDER_BY", where=self._expr())
            if self.accept_kw("SAMPLE"):
                self.expect_kw("BY")
                return AlterAction("MODIFY_SAMPLE_BY",
                                   name=self.advance().text)
            if self.accept_kw("SETTING"):
                # MODIFY SETTING name = value [, ...]: stored on the
                # table meta (MergeTree settings don't drive Spark)
                pairs = []
                while True:
                    sname = self.advance().text
                    self.expect_op("=")
                    pairs.append(f"{sname} = {self.advance().text}")
                    if not self.accept_op(","):
                        break
                return AlterAction("MODIFY_SETTING",
                                   text=", ".join(pairs))
            if self.accept_kw("TTL"):
                parts = []
                while (self.tok.kind != T.EOF and not self.tok.is_op(",")
                       and not self.tok.is_op(";")):
                    parts.append(self.advance().text)
                return AlterAction("MODIFY_TTL", text=" ".join(parts))
            self.expect_kw("COLUMN")
            ie = bool(self.accept_kws("IF", "EXISTS"))
            name = self.advance().text
            type_name = None
            if not self.tok.is_kw("DEFAULT", "MATERIALIZED", "ALIAS"):
                type_name = self._type_name()
            cd = ColumnDef(name, type_name or "")
            if self.tok.is_kw("DEFAULT", "MATERIALIZED", "ALIAS"):
                cd.default_kind = self.advance().text.upper()
                cd.default = self._expr()
            return AlterAction("MODIFY_COLUMN", column=cd, if_exists=ie)
        if self.accept_kw("COMMENT"):
            self.expect_kw("COLUMN")
            name = self.advance().text
            return AlterAction("COMMENT_COLUMN", name=name,
                               text=self.advance().text)
        if self.accept_kw("UPDATE"):
            assignments = []
            while True:
                col = self.advance().text
                self.expect_op("=")
                assignments.append((col, self._expr()))
                if self.accept_kws("IN", "PARTITION"):
                    part = self._expr()
                    self.expect_kw("WHERE")
                    return AlterAction("UPDATE", assignments=assignments,
                                       where=self._expr(), partition=part)
                if self.accept_kw("WHERE"):
                    break
                self.expect_op(",")
            return AlterAction("UPDATE", assignments=assignments,
                               where=self._expr())
        if self.accept_kw("DELETE"):
            part = None
            if self.accept_kws("IN", "PARTITION"):
                part = self._expr()
            self.expect_kw("WHERE")
            return AlterAction("DELETE", where=self._expr(),
                               partition=part)
        raise ParseError(f"unsupported ALTER command at {self.tok.pos}: "
                         f"{self.tok.text!r}")

    # --- INSERT -----------------------------------------------------------

    def _insert(self):
        self.advance()
        self.expect_kw("INTO")
        if self.accept_kw("FUNCTION"):
            # INSERT INTO FUNCTION null(...)/file(...): the sink is a
            # table function, not a catalog table (parsed without the
            # FROM-clause alias eater — VALUES/SELECT follows)
            from .ast_nodes import TableFunction as _TF
            fn_name = self.advance().text
            self.expect_op("(")
            fn_args = [] if self.tok.is_op(")") else self._expr_list()
            self.expect_op(")")
            tf = _TF(fn_name, fn_args, None)
            cols = None
            if self.tok.is_op("(") \
                    and not self.peek().is_kw("SELECT", "WITH"):
                self.advance()
                cols = [self.advance().text]
                while self.accept_op(","):
                    cols.append(self.advance().text)
                self.expect_op(")")
            if self.accept_kw("VALUES"):
                rows = []
                while self.accept_op("("):
                    rows.append(self._expr_list())
                    self.expect_op(")")
                    if not self.accept_op(","):
                        break
                return InsertStmt(None, "", cols, values=rows,
                                  function=tf)
            return InsertStmt(None, "", cols, select=self._union(),
                              function=tf)
        self.accept_kw("TABLE")
        db, name = self._qualified_name()
        cols = None
        if self.tok.is_op("(") and not self.peek().is_kw("SELECT", "WITH"):
            self.advance()
            cols = [self.advance().text]
            while self.accept_op(","):
                cols.append(self.advance().text)
            self.expect_op(")")
        if self.accept_kw("WATCH"):
            return InsertStmt(db, name, cols, watch_view=self.advance().text)
        # INSERT ... SETTINGS k = v, ... before the data clause
        # (ParserInsertQuery settings branch)
        ins_settings: dict = {}
        if self.accept_kw("SETTINGS"):
            while True:
                k = self.advance().text
                self.expect_op("=")
                ins_settings[k] = self._literal_value()
                if not self.accept_op(","):
                    break
        if self.accept_kws("FROM", "INFILE"):
            # INSERT ... FROM INFILE 'path' [COMPRESSION 'm'] FORMAT fmt
            # (ParserInsertQuery infile branch)
            path = self.advance().text
            if self.accept_kw("COMPRESSION"):
                self.advance()
            fmt = None
            if self.accept_kw("FORMAT"):
                fmt = self.advance().text
            return InsertStmt(db, name, cols, infile=path, format=fmt,
                              settings=ins_settings)
        if self.accept_kw("VALUES"):
            rows = []
            while self.accept_op("("):
                rows.append(self._expr_list())
                self.expect_op(")")
                if not self.accept_op(","):
                    break
            return InsertStmt(db, name, cols, values=rows,
                              settings=ins_settings)
        if self.tok.is_kw("SELECT", "WITH") or self.tok.is_op("("):
            return InsertStmt(db, name, cols, select=self._union(),
                              settings=ins_settings)
        if self.tok.is_kw("FORMAT"):
            # INSERT ... FORMAT fmt <raw rows>: everything after the
            # format name is data, not SQL (clickhouse-client splits it
            # the same way). Data must still lex (balanced quotes) —
            # fine for the row formats this path serves.
            self.advance()
            fmt_tok = self.tok
            self.advance()
            data = self.sql[fmt_tok.pos + len(fmt_tok.text):]
            if data[:1] in ("\n", " "):
                data = data[1:]
            self.i = len(self.toks) - 1        # consume through EOF
            return InsertStmt(db, name, cols, format=fmt_tok.text,
                              format_data=data, settings=ins_settings)
        raise ParseError("INSERT requires VALUES, SELECT, FROM INFILE, "
                         "or FORMAT data")

    # --- SHOW / DESCRIBE / EXISTS ----------------------------------------

    def _show(self):
        self.advance()
        self.accept_kw("TEMPORARY")
        if self.accept_kw("DATABASES"):
            return ShowStmt("DATABASES")
        if self.accept_kw("DICTIONARIES"):
            return ShowStmt("DICTIONARIES")
        if self.accept_kw("PROCESSLIST"):
            return ShowStmt("PROCESSLIST")
        if self.accept_kw("SETTINGS"):
            # SHOW [CHANGED] SETTINGS [LIKE p] (ParserShowTablesQuery)
            st = ShowStmt("SETTINGS")
            if self.accept_kw("LIKE") or self.accept_kw("ILIKE"):
                st.like = self.advance().text
            return st
        if self.accept_kws("CHANGED", "SETTINGS"):
            st = ShowStmt("CHANGED_SETTINGS")
            if self.accept_kw("LIKE") or self.accept_kw("ILIKE"):
                st.like = self.advance().text
            return st
        if self.accept_kw("FUNCTIONS"):
            st = ShowStmt("FUNCTIONS")
            if self.accept_kw("LIKE") or self.accept_kw("ILIKE"):
                st.like = self.advance().text
            return st
        if self.accept_kw("ENGINES"):
            return ShowStmt("ENGINES")
        if self.accept_kw("GRANTS"):
            return ShowStmt("GRANTS")
        if self.accept_kw("CREATE"):
            if self.accept_kw("DICTIONARY"):
                db, name = self._qualified_name()
                return ShowStmt("CREATE_DICTIONARY", database=db,
                                target=name)
            if self.accept_kw("DATABASE"):
                return ShowStmt("CREATE_DATABASE",
                                target=self.advance().text)
            self.accept_kw("TABLE") or self.accept_kw("VIEW")
            db, name = self._qualified_name()
            return ShowStmt("CREATE_TABLE", database=db, target=name)
        self.expect_kw("TABLES")
        st = ShowStmt("TABLES")
        if self.accept_kw("FROM") or self.accept_kw("IN"):
            st.database = self.advance().text
        if self.accept_kws("NOT", "LIKE"):
            st.not_like = True
            st.like = self.advance().text
        elif self.accept_kw("LIKE") or self.accept_kw("ILIKE"):
            st.like = self.advance().text
        return st

    def _describe(self):
        self.advance()
        self.accept_kw("TABLE")
        if self.tok.is_op("(") and self.peek().is_kw("SELECT", "WITH"):
            # DESCRIBE (SELECT ...) — result schema of a query
            self.advance()
            q = self._union()
            self.expect_op(")")
            return DescribeStmt(None, "", query=q)
        if self.tok.kind == T.IDENT and self.peek().is_op("("):
            # DESCRIBE numbers(5) / file(...) — table-function schema,
            # via the result-of-query path
            from .ast_nodes import SelectQuery as _Sel
            from .ast_nodes import Star as _Star
            tf = self._table_factor()
            q = _Sel()
            q.select = [_Star()]
            q.from_ = tf
            return DescribeStmt(None, "", query=q)
        db, name = self._qualified_name()
        return DescribeStmt(db, name)

    def _exists(self):
        self.advance()
        if self.accept_kw("DATABASE"):
            # EXISTS DATABASE db → result 0/1 (marker table "")
            return ExistsStmt(self.advance().text, "")
        self.accept_kw("TABLE") or self.accept_kw("DICTIONARY") \
            or self.accept_kw("VIEW")
        db, name = self._qualified_name()
        return ExistsStmt(db, name)

    def _set(self):
        self.advance()
        settings = {}
        while True:
            k = self.advance().text
            self.expect_op("=")
            settings[k] = self._literal_value()
            if not self.accept_op(","):
                break
        return SetStmt(settings)

    def _explain(self):
        self.advance()
        kind = "PLAN"
        if self.accept_kw("QUERY"):
            self.expect_kw("TREE")
            kind = "QUERY TREE"
        else:
            for k in ("AST", "SYNTAX", "PLAN", "PIPELINE", "ESTIMATE"):
                if self.accept_kw(k):
                    kind = k
                    break
        return ExplainStmt(kind, self._union())

    def _optimize(self):
        self.advance()
        self.expect_kw("TABLE")
        db, name = self._qualified_name()
        st = OptimizeStmt(db, name)
        if self.accept_kw("PARTITION"):
            self._expr()
        st.final = bool(self.accept_kw("FINAL"))
        if self.accept_kw("DEDUPLICATE"):
            st.deduplicate = True
            if self.accept_kw("BY"):
                st.dedup_by = [self.advance().text]
                while self.accept_op(","):
                    st.dedup_by.append(self.advance().text)
        return st
