"""Seeded differential fuzz: random expressions in the shared
CH/ANSI-SQL dialect intersection, executed by our engine AND DuckDB on
the same parquet, compared order-insensitively.

The grammar sticks to constructs with identical semantics in both
engines (+, -, *, comparisons, AND/OR, round, abs, least/greatest,
CASE) so any mismatch is an engine bug, not a dialect difference.
Integer division, modulo on negatives, and float formatting are
deliberately excluded — their cross-engine semantics differ.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from clickhouse_from_scratch_spark.catalog import load_all
from clickhouse_from_scratch_spark.plans import execute_sql
from tools.check_oracle import compare

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_linenumber"]


def _expr(rnd: random.Random, depth: int = 0) -> str:
    if depth >= 2 or rnd.random() < 0.4:
        return rnd.choice(NUM_COLS + [str(rnd.randint(1, 50)),
                                      f"{rnd.uniform(0.5, 9.5):.2f}"])
    kind = rnd.randrange(4)
    a, b = _expr(rnd, depth + 1), _expr(rnd, depth + 1)
    if kind == 0:
        return f"({a} {rnd.choice(['+', '-', '*'])} {b})"
    if kind == 1:
        return f"{rnd.choice(['least', 'greatest'])}({a}, {b})"
    if kind == 2:
        return f"abs({a})"
    return (f"(CASE WHEN {a} > {b} THEN {a} ELSE {b} END)")


def _pred(rnd: random.Random) -> str:
    cmp1 = (f"{_expr(rnd, 1)} {rnd.choice(['<', '<=', '>', '>=', '='])} "
            f"{_expr(rnd, 1)}")
    cmp2 = (f"{rnd.choice(NUM_COLS)} "
            f"{rnd.choice(['<', '>'])} {rnd.randint(1, 40)}")
    return f"({cmp1} {rnd.choice(['AND', 'OR'])} {cmp2})"


def _cases(n: int) -> list[tuple[str, str]]:
    rnd = random.Random(20260814)
    out = []
    for i in range(n):
        e = _expr(rnd)
        p = _pred(rnd)
        sql = (f"SELECT l_orderkey, l_linenumber, "
               f"round(CAST({e} AS DOUBLE), 4) AS v "
               f"FROM lineitem WHERE {p}")
        out.append((f"fuzz{i:02d}", sql))
    return out


CASES = _cases(30)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for tbl in ("lineitem", "orders", "customer", "nation", "region",
                "events", "documents"):
        con.sql(f"CREATE VIEW {tbl} AS "
                f"SELECT * FROM '{sf_dir}/{tbl}.parquet'")
    return con


def _agg_cases(n: int) -> list[tuple[str, str]]:
    rnd = random.Random(99)
    out = []
    for i in range(n):
        e = _expr(rnd)
        agg = rnd.choice(["sum", "avg", "min", "max", "count"])
        key = rnd.choice(["l_returnflag", "l_linestatus", "l_linenumber",
                          "(l_linenumber % 3)"])
        body = f"{agg}(CAST({e} AS DOUBLE))" if agg != "count" else "count(*)"
        sql = (f"SELECT {key} AS k, round(CAST({body} AS DOUBLE), 3) AS v "
               f"FROM lineitem WHERE {_pred(rnd)} GROUP BY k")
        out.append((f"aggfuzz{i:02d}", sql))
    return out


AGG_CASES = _agg_cases(20)


def _countif_value_cases(n: int) -> list[tuple[str, str, str]]:
    """Two-arg countIf(x, cond) / count(x) FILTER (WHERE p): counts rows
    where cond holds AND x is non-NULL — DuckDB states the same as
    COUNT(CASE WHEN cond THEN x END)."""
    rnd = random.Random(1010)
    out = []
    for i in range(n):
        key = rnd.choice(["l_returnflag", "l_linestatus"])
        val = rnd.choice(["l_shipdate", "NULLIF(l_linenumber, 1)",
                          "NULLIF(l_suppkey, 3)"])
        cond = _pred(rnd)
        form = rnd.choice(["countIf", "filter"])
        if form == "countIf":
            ch = (f"SELECT {key} AS k, countIf({val}, {cond}) AS c "
                  f"FROM lineitem GROUP BY k")
        else:
            ch = (f"SELECT {key} AS k, count({val}) "
                  f"FILTER (WHERE {cond}) AS c FROM lineitem GROUP BY k")
        dd = (f"SELECT {key} AS k, COUNT(CASE WHEN {cond} THEN {val} "
              f"END) AS c FROM lineitem GROUP BY k")
        out.append((f"cntiffuzz{i:02d}", ch, dd))
    return out


CNTIF_CASES = _countif_value_cases(8)


@pytest.mark.parametrize("name,ch_sql,dd_sql", CNTIF_CASES,
                         ids=[c[0] for c in CNTIF_CASES])
def test_differential_countif_value(spark, sf_dir, duck, name, ch_sql,
                                    dd_sql):
    tables = load_all(spark, sf_dir)
    ours = execute_sql(spark, ch_sql, tables).toPandas()
    theirs = duck.sql(dd_sql).df()
    problems = _tolerant_compare(ours, theirs)
    assert not problems, problems

STR_COLS = ["l_returnflag", "l_linestatus"]


def _str_cases(n: int) -> list[tuple[str, str]]:
    rnd = random.Random(7)
    out = []
    for i in range(n):
        c = rnd.choice(STR_COLS)
        e = rnd.choice([
            f"upper({c})", f"lower({c})", f"length({c})",
            f"substring({c}, 1, {rnd.randint(1, 4)})",
            f"concat({c}, '-', {rnd.choice(STR_COLS)})",
            f"trim({c})", f"reverse({c})",
            f"replace({c}, 'A', 'z')",
        ])
        sql = (f"SELECT l_orderkey, l_linenumber, {e} AS v FROM lineitem "
               f"WHERE {_pred(rnd)}")
        out.append((f"strfuzz{i:02d}", sql))
    return out


def _window_cases(n: int) -> list[tuple[str, str]]:
    rnd = random.Random(31)
    out = []
    for i in range(n):
        fn = rnd.choice([
            "sum(CAST(l_quantity AS DOUBLE))",
            "avg(CAST(l_extendedprice AS DOUBLE))",
            "count(*)", "min(l_discount)", "row_number()", "rank()",
        ])
        part = rnd.choice(["l_returnflag", "l_linestatus",
                           "l_returnflag, l_linestatus"])
        frame = ("" if fn in ("row_number()", "rank()") else
                 rnd.choice(["", " ROWS BETWEEN 2 PRECEDING AND "
                             "CURRENT ROW",
                             " ROWS BETWEEN UNBOUNDED PRECEDING AND "
                             "CURRENT ROW"]))
        # (l_orderkey, l_linenumber) is NOT unique in the synthetic data
        # — order by enough columns that any remaining ties are
        # full-row-identical, else running frames are legitimately
        # nondeterministic across engines
        order = ("l_orderkey, l_linenumber, l_partkey, l_suppkey, "
                 "l_quantity, l_extendedprice")
        sql = (f"SELECT l_orderkey, l_linenumber, "
               f"round(CAST({fn} OVER (PARTITION BY {part} "
               f"ORDER BY {order}{frame}) "
               f"AS DOUBLE), 3) AS v "
               f"FROM lineitem WHERE l_orderkey < 1000")
        out.append((f"winfuzz{i:02d}", sql))
    return out


STR_CASES = _str_cases(12)
WIN_CASES = _window_cases(12)


def _join_cases(n: int) -> list[tuple[str, str]]:
    rnd = random.Random(55)
    out = []
    for i in range(n):
        kind = rnd.choice(["JOIN", "LEFT JOIN", "INNER JOIN"])
        key = rnd.choice(["o_orderpriority", "o_orderstatus"])
        agg = rnd.choice([
            "count(*)",
            "round(CAST(sum(CAST(l_quantity AS DOUBLE)) AS DOUBLE), 3)",
            "round(CAST(min(o_totalprice) AS DOUBLE), 3)",
            "round(CAST(max(l_extendedprice) AS DOUBLE), 3)",
        ])
        cut = rnd.randint(50_000, 250_000)
        sql = (f"SELECT {key} AS k, {agg} AS v "
               f"FROM orders {kind} lineitem "
               f"ON l_orderkey = o_orderkey "
               f"WHERE o_totalprice < {cut} GROUP BY k")
        out.append((f"joinfuzz{i:02d}", sql))
    return out


JOIN_CASES = _join_cases(10)

# date functions differ in NAME between dialects — generate (CH, DuckDB)
# expression PAIRS with identical semantics
_DATE_PAIRS = [
    ("toYear(l_shipdate)",
     "EXTRACT(YEAR FROM CAST(l_shipdate AS DATE))"),
    ("toMonth(l_shipdate)",
     "EXTRACT(MONTH FROM CAST(l_shipdate AS DATE))"),
    ("toDayOfMonth(l_shipdate)",
     "EXTRACT(DAY FROM CAST(l_shipdate AS DATE))"),
    ("toQuarter(l_shipdate)",
     "EXTRACT(QUARTER FROM CAST(l_shipdate AS DATE))"),
    ("toDayOfYear(l_shipdate)",
     "EXTRACT(DOY FROM CAST(l_shipdate AS DATE))"),
    ("toYYYYMM(l_shipdate)",
     "EXTRACT(YEAR FROM CAST(l_shipdate AS DATE)) * 100 + "
     "EXTRACT(MONTH FROM CAST(l_shipdate AS DATE))"),
    ("dateDiff('day', toDate('1995-01-01'), l_shipdate)",
     "datediff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE))"),
    ("toString(toStartOfMonth(l_shipdate))",
     "strftime(date_trunc('month', CAST(l_shipdate AS DATE)), "
     "'%Y-%m-%d')"),
]


def _date_cases() -> list[tuple[str, str, str]]:
    out = []
    for i, (ch_e, dd_e) in enumerate(_DATE_PAIRS):
        ch = (f"SELECT l_orderkey, l_linenumber, {ch_e} AS v "
              f"FROM lineitem WHERE l_orderkey < 2000")
        dd = (f"SELECT l_orderkey, l_linenumber, {dd_e} AS v "
              f"FROM lineitem WHERE l_orderkey < 2000")
        out.append((f"datefuzz{i:02d}", ch, dd))
    return out


def _having_cases(n: int) -> list[tuple[str, str]]:
    rnd = random.Random(77)
    out = []
    for i in range(n):
        key = rnd.choice(["l_returnflag", "l_linenumber",
                          "(l_linenumber % 4)"])
        thresh = rnd.randint(2, 500)
        sql = (f"SELECT {key} AS k, count(*) AS n, "
               f"count(DISTINCT l_quantity) AS d FROM lineitem "
               f"WHERE {_pred(rnd)} GROUP BY k "
               f"HAVING count(*) > {thresh}")
        out.append((f"havfuzz{i:02d}", sql))
    return out


HAV_CASES = _having_cases(8)
DATE_CASES = _date_cases()

# --- agg(DISTINCT) across bases (the net for the -Distinct combinator) ----
# Integer-valued expressions only: a float computed differently by the
# two engines could change the distinct SET itself, which would be
# dialect noise, not an engine bug.
INT_COLS = ["l_linenumber", "l_suppkey"]


def _int_expr(rnd: random.Random, depth: int = 0) -> str:
    if depth >= 2 or rnd.random() < 0.5:
        return rnd.choice(INT_COLS + [str(rnd.randint(1, 9))])
    a, b = _int_expr(rnd, depth + 1), _int_expr(rnd, depth + 1)
    if rnd.random() < 0.3:
        return f"({a} % {rnd.randint(2, 13)})"
    return f"({a} {rnd.choice(['+', '*'])} {b})"


# (CH aggregate template, DuckDB aggregate template, needs_round)
_DISTINCT_AGGS = [
    ("avg(DISTINCT {e})", "avg(DISTINCT {e})", True),
    ("sum(DISTINCT {e})", "sum(DISTINCT {e})", True),
    ("count(DISTINCT {e})", "count(DISTINCT {e})", True),
    ("min(DISTINCT {e})", "min(DISTINCT {e})", True),
    ("max(DISTINCT {e})", "max(DISTINCT {e})", True),
    ("stddevSamp(DISTINCT {e})", "stddev_samp(DISTINCT {e})", True),
    ("varSamp(DISTINCT {e})", "var_samp(DISTINCT {e})", True),
    ("stddevPop(DISTINCT {e})", "stddev_pop(DISTINCT {e})", True),
    ("median(DISTINCT {e})", "median(DISTINCT {e})", True),
    ("arrayStringConcat(arrayMap(v -> toString(v), "
     "arraySort(groupArray(DISTINCT {e}))), ',')",
     "array_to_string(list_sort(list(DISTINCT {e})), ',')", False),
    # stacked combinators on suffixed bases (canonical order:
    # base → Distinct → suffix); groups here are non-empty so
    # -OrNull degenerates to the plain aggregate in the oracle
    ("minOrNull(DISTINCT {e})", "min(DISTINCT {e})", True),
    ("maxOrNull(DISTINCT {e})", "max(DISTINCT {e})", True),
    ("avgIf(DISTINCT {e}, l_linenumber > 2)",
     "avg(DISTINCT CASE WHEN l_linenumber > 2 THEN {e} END)", True),
    ("sumIf(DISTINCT {e}, l_linenumber < 5)",
     "sum(DISTINCT CASE WHEN l_linenumber < 5 THEN {e} END)", True),
]


def _distinct_cases(n: int) -> list[tuple[str, str, str]]:
    rnd = random.Random(414)
    out = []
    for i in range(n):
        e = _int_expr(rnd)
        ch_t, dd_t, rounded = rnd.choice(_DISTINCT_AGGS)
        key = rnd.choice(["l_returnflag", "l_linestatus",
                          "(l_linenumber % 3)"])
        ch_b, dd_b = ch_t.format(e=e), dd_t.format(e=e)
        # -If + DISTINCT composed (FILTER binds to the aggregate, so only
        # on templates where the aggregate is the outermost call)
        if rounded and rnd.random() < 0.4:
            flt = (f" FILTER(WHERE l_linenumber "
                   f"{rnd.choice(['<', '>'])} {rnd.randint(2, 6)})")
            ch_b, dd_b = ch_b + flt, dd_b + flt
        if rounded:
            ch_b = f"round(CAST({ch_b} AS DOUBLE), 3)"
            dd_b = f"round(CAST({dd_b} AS DOUBLE), 3)"
        ch = (f"SELECT {key} AS k, {ch_b} AS v FROM lineitem "
              f"GROUP BY k")
        dd = (f"SELECT {key} AS k, {dd_b} AS v FROM lineitem "
              f"GROUP BY k")
        out.append((f"distfuzz{i:02d}", ch, dd))
    return out


DIST_CASES = _distinct_cases(28)


def _nulljoin_cases(n: int) -> list[tuple[str, str]]:
    """Outer joins where join keys are genuinely NULL (NULLIF-injected):
    NULL keys must never match, under join_use_nulls=1 both engines
    agree on NULL semantics end-to-end."""
    rnd = random.Random(2026)
    out = []
    for i in range(n):
        m1, m2 = rnd.randint(0, 9), rnd.randint(0, 9)
        kind = rnd.choice(["LEFT JOIN", "FULL JOIN", "JOIN"])
        agg = rnd.choice([
            "count(*)",
            "round(CAST(sum(CAST(l_quantity AS DOUBLE)) AS DOUBLE), 3)",
            "count(kb)",
        ])
        sql = (f"SELECT ka, {agg} AS v FROM "
               f"(SELECT o_orderkey, NULLIF(o_orderkey % 10, {m1}) AS ka "
               f"FROM orders WHERE o_orderkey < 3000) o "
               f"{kind} "
               f"(SELECT NULLIF(l_orderkey % 10, {m2}) AS kb, l_quantity "
               f"FROM lineitem WHERE l_orderkey < 3000) l "
               f"ON ka = kb GROUP BY ka")
        out.append((f"nulljoinfuzz{i:02d}", sql))
    return out


NULLJOIN_CASES = _nulljoin_cases(10)


def _setop_cases(n: int) -> list[tuple[str, str, str]]:
    """UNION/INTERSECT/EXCEPT (+ modifiers) between two filtered
    projections. UNION and the DISTINCT forms mean the same thing in
    both engines; CH INTERSECT/EXCEPT default to ALL with hash-set
    FILTER semantics (left multiplicity preserved, every copy of a
    matched row dropped), which DuckDB expresses as IN / NOT IN."""
    rnd = random.Random(808)
    out = []
    for i in range(n):
        op = rnd.choice(["UNION ALL", "UNION DISTINCT", "INTERSECT",
                         "EXCEPT", "INTERSECT ALL", "EXCEPT ALL",
                         "INTERSECT DISTINCT", "EXCEPT DISTINCT"])
        col = rnd.choice(["l_linenumber", "l_suppkey", "(l_orderkey % 50)"])
        c1, c2 = rnd.randint(5, 30), rnd.randint(5, 30)
        left = (f"SELECT {col} AS v FROM lineitem "
                f"WHERE l_linenumber < {c1 % 7 + 1}")
        right = f"SELECT {col} AS v FROM lineitem WHERE l_suppkey < {c2}"
        sql = f"{left} {op} {right}"
        if op in ("INTERSECT", "INTERSECT ALL"):
            duck = f"SELECT v FROM ({left}) WHERE v IN (SELECT v FROM ({right}))"
        elif op in ("EXCEPT", "EXCEPT ALL"):
            duck = (f"SELECT v FROM ({left}) WHERE v NOT IN "
                    f"(SELECT v FROM ({right}))")
        elif op in ("INTERSECT DISTINCT", "EXCEPT DISTINCT"):
            duck = f"{left} {op.split()[0]} {right}"
        else:
            duck = sql
        out.append((f"setopfuzz{i:02d}", sql, duck))
    return out


def _setop_chain_cases(n: int) -> list[tuple[str, str, str]]:
    """Mixed-mode set-op CHAINS of 3-4 arms: CH binds INTERSECT tighter
    than UNION/EXCEPT (interpreter normalization over the flat mode
    list), UNION/EXCEPT fold left-to-right, and the bare/ALL forms keep
    left multiplicity. The DuckDB side restates the same grouping with
    explicit parentheses and IN / NOT IN for the multiplicity-keeping
    forms."""
    rnd = random.Random(909)
    MODES = ["UNION ALL", "UNION DISTINCT", "INTERSECT", "EXCEPT",
             "INTERSECT ALL", "EXCEPT ALL", "INTERSECT DISTINCT",
             "EXCEPT DISTINCT"]
    out = []
    for i in range(n):
        col = rnd.choice(["l_linenumber", "l_suppkey", "(l_orderkey % 20)"])
        k = rnd.randint(3, 4)
        arms = [(f"SELECT {col} AS v FROM lineitem "
                 f"WHERE l_linenumber < {rnd.randint(1, 7)}")
                if rnd.random() < 0.5 else
                (f"SELECT {col} AS v FROM lineitem "
                 f"WHERE l_suppkey < {rnd.randint(3, 25)}")
                for _ in range(k)]
        modes = [rnd.choice(MODES) for _ in range(k - 1)]
        ch = arms[0] + "".join(f" {m} {a}"
                               for m, a in zip(modes, arms[1:]))
        groups = [[(None, arms[0])]]
        for m, a in zip(modes, arms[1:]):
            if m.startswith("INTERSECT"):
                groups[-1].append((m, a))
            else:
                groups.append([(m, a)])

        def chain(g):
            acc = g[0][1]
            for m, a in g[1:]:
                if m == "INTERSECT DISTINCT":
                    acc = f"({acc}) INTERSECT ({a})"
                else:
                    acc = (f"SELECT v FROM ({acc}) "
                           f"WHERE v IN (SELECT v FROM ({a}))")
            return acc

        duck = chain(groups[0])
        for g in groups[1:]:
            m, a = g[0]
            sub = chain([(None, a)] + g[1:])
            if m == "UNION ALL":
                duck = f"({duck}) UNION ALL ({sub})"
            elif m == "UNION DISTINCT":
                duck = f"({duck}) UNION ({sub})"
            elif m == "EXCEPT DISTINCT":
                duck = f"({duck}) EXCEPT ({sub})"
            else:
                duck = (f"SELECT v FROM ({duck}) "
                        f"WHERE v NOT IN (SELECT v FROM ({sub}))")
        out.append((f"setopchain{i:02d}", ch, duck))
    return out


def _quantile_cases(n: int) -> list[tuple[str, str, str]]:
    """quantile family: CH parametric form vs DuckDB quantile_cont —
    exact interpolated percentiles over the same values."""
    rnd = random.Random(909)
    out = []
    for i in range(n):
        q = round(rnd.uniform(0.05, 0.95), 2)
        col = rnd.choice(["l_quantity", "l_extendedprice", "l_discount"])
        key = rnd.choice(["l_returnflag", "l_linestatus"])
        ch = (f"SELECT {key} AS k, round(CAST(quantile({q})({col}) "
              f"AS DOUBLE), 4) AS v FROM lineitem GROUP BY k")
        dd = (f"SELECT {key} AS k, round(CAST(quantile_cont({col}, {q}) "
              f"AS DOUBLE), 4) AS v FROM lineitem GROUP BY k")
        out.append((f"qntfuzz{i:02d}", ch, dd))
    return out


def _array_cases() -> list[tuple[str, str, str]]:
    """Array construction / HOF pairs (CH names vs DuckDB list names),
    projected to strings for order-stable comparison."""
    pairs = [
        ("arrayStringConcat(arrayMap(x -> toString(x * 2), "
         "range(1, l_linenumber + 1)), ',')",
         "array_to_string(list_transform(range(1, l_linenumber + 1), "
         "x -> CAST(x * 2 AS VARCHAR)), ',')"),
        ("arraySum(arrayMap(x -> x * x, range(1, l_linenumber + 1)))",
         "CAST(list_sum(list_transform(range(1, l_linenumber + 1), "
         "x -> x * x)) AS BIGINT)"),
        ("length(arrayFilter(x -> x % 2 = 0, range(0, l_suppkey % 20)))",
         "CAST(length(list_filter(range(0, l_suppkey % 20), "
         "x -> x % 2 = 0)) AS BIGINT)"),
        ("arrayStringConcat(arraySort(arrayDistinct("
         "[l_linenumber, l_linenumber % 3, 7, 7])), ',')",
         "array_to_string(list_sort(list_distinct("
         "[l_linenumber, l_linenumber % 3, 7, 7])), ',')"),
        ("arrayReverse(range(1, l_linenumber + 1))[1]",
         "list_reverse(range(1, l_linenumber + 1))[1]"),
    ]
    out = []
    for i, (ch_e, dd_e) in enumerate(pairs):
        ch = (f"SELECT l_orderkey, l_linenumber, {ch_e} AS v "
              f"FROM lineitem WHERE l_orderkey < 1500")
        dd = (f"SELECT l_orderkey, l_linenumber, {dd_e} AS v "
              f"FROM lineitem WHERE l_orderkey < 1500")
        out.append((f"arrfuzz{i:02d}", ch, dd))
    return out


def _rollup_cases(n: int) -> list[tuple[str, str, str]]:
    # pair-cases: the engine fills rolled-up key cells with the key
    # TYPE'S default (''/0, pre-group_by_use_nulls CH), DuckDB NULL-
    # fills — the DuckDB side states the fill with GROUPING() CASEs
    rnd = random.Random(606)
    out = []
    for i in range(n):
        mode = rnd.choice(["ROLLUP", "CUBE"])
        keys = rnd.choice([["l_returnflag", "l_linestatus"],
                           ["l_linestatus", "(l_linenumber % 2)"]])
        agg = rnd.choice([
            "count(*)",
            "round(CAST(sum(CAST(l_quantity AS DECIMAL(27,4))) "
            "AS DOUBLE), 3)",
            "round(CAST(min(l_extendedprice) AS DOUBLE), 3)",
        ])
        ks = ", ".join(f"{k} AS k{j}" for j, k in enumerate(keys))
        dks = ", ".join(
            f"CASE WHEN GROUPING({k}) = 1 THEN "
            f"{'0' if k.startswith('(') else chr(39) * 2} "
            f"ELSE {k} END AS k{j}"
            for j, k in enumerate(keys))
        kn = ", ".join(k for k in keys)
        # guaranteed-nonempty predicate: empty-input ROLLUP/CUBE is an
        # engine-defined edge (DuckDB emits the () row, Spark doesn't)
        cut = rnd.randint(2000, 9000)
        ch = (f"SELECT {ks}, {agg} AS v FROM lineitem "
              f"WHERE l_orderkey < {cut} GROUP BY {mode}({kn})")
        dd = (f"SELECT {dks}, {agg} AS v FROM lineitem "
              f"WHERE l_orderkey < {cut} GROUP BY {mode}({kn})")
        out.append((f"rollupfuzz{i:02d}", ch, dd))
    return out


def _subquery_cases(n: int) -> list[tuple[str, str]]:
    rnd = random.Random(515)
    out = []
    for i in range(n):
        cut = rnd.randint(50_000, 300_000)
        form = rnd.randrange(3)
        if form == 0:       # uncorrelated IN
            sql = (f"SELECT o_orderpriority AS k, count(*) AS v FROM orders "
                   f"WHERE o_custkey IN (SELECT c_custkey FROM customer "
                   f"WHERE c_acctbal > {rnd.randint(0, 5000)}) GROUP BY k")
        elif form == 1:     # correlated EXISTS
            sql = (f"SELECT c_nationkey AS k, count(*) AS v FROM customer "
                   f"WHERE EXISTS (SELECT 1 FROM orders "
                   f"WHERE o_custkey = c_custkey "
                   f"AND o_totalprice > {cut}) GROUP BY k")
        else:               # NOT IN subquery
            sql = (f"SELECT o_orderstatus AS k, count(*) AS v FROM orders "
                   f"WHERE o_custkey NOT IN (SELECT c_custkey FROM customer "
                   f"WHERE c_acctbal < {rnd.randint(-900, 0)}) GROUP BY k")
        out.append((f"subqfuzz{i:02d}", sql))
    return out


SETOP_CASES = _setop_cases(10)
QNT_CASES = _quantile_cases(8)
ARR_CASES = _array_cases()
ROLLUP_CASES = _rollup_cases(8)
SUBQ_CASES = _subquery_cases(9)

ALL_CASES = (CASES + AGG_CASES + STR_CASES + WIN_CASES + JOIN_CASES
             + HAV_CASES + SUBQ_CASES)


def _tolerant_compare(ours, theirs) -> list[str]:
    """Order-insensitive compare with float tolerance: exact rounding at
    a .0005 boundary can flip the last displayed digit between engines
    (double representation noise), which is not a semantic difference."""
    import numpy as np
    from tools.check_oracle import normalize
    problems = []
    if len(ours) != len(theirs):
        return [f"rowcount {len(ours)} vs {len(theirs)}"]
    if sorted(ours.columns) != sorted(theirs.columns):
        return [f"columns {sorted(ours.columns)} vs "
                f"{sorted(theirs.columns)}"]
    o, t = normalize(ours), normalize(theirs)
    for c in o.columns:
        if o[c].dtype.kind == "f" or t[c].dtype.kind == "f":
            a = o[c].astype(float).fillna(-1e18).to_numpy()
            b = t[c].astype(float).fillna(-1e18).to_numpy()
            if not np.allclose(a, b, atol=2e-3, rtol=1e-9):
                problems.append(f"col {c}: max diff "
                                f"{np.abs(a - b).max()}")
        else:
            av = o[c].fillna("").astype(str)
            bv = t[c].fillna("").astype(str)
            if not (av == bv).all():
                problems.append(f"col {c}: value mismatch")
    return problems


@pytest.mark.parametrize("name,sql", ALL_CASES,
                         ids=[c[0] for c in ALL_CASES])
def test_differential(spark, sf_dir, duck, name, sql):
    tables = load_all(spark, sf_dir)
    ch_sql = sql.replace("count(*)", "count()")
    ours = execute_sql(spark, ch_sql, tables).toPandas()
    theirs = duck.sql(sql).df()
    problems = _tolerant_compare(ours, theirs)
    assert not problems, problems




# tuple arithmetic / array rotation / URL parsing — CH expression vs an
# equivalent-by-construction DuckDB formulation over the same columns
_TUPMAP_PAIRS = [
    ("tuplePlus(tuple(l_linenumber, l_suppkey), tuple(1, 2)).1",
     "l_linenumber + 1"),
    ("tupleMultiply(tuple(l_linenumber, l_suppkey),"
     " tuple(l_suppkey, 2)).2",
     "l_suppkey * 2"),
    ("tupleNegate(tuple(l_linenumber, l_suppkey)).2", "-l_suppkey"),
    ("arrayStringConcat(arrayRotateLeft("
     "splitByChar('-', o_orderpriority), 1), ',')",
     "array_to_string(string_split(o_orderpriority, '-')[2:999] || "
     "string_split(o_orderpriority, '-')[1:1], ',')"),
    ("arrayStringConcat(arrayShiftRight("
     "splitByChar('-', o_orderpriority), 1, 'z'), ',')",
     "array_to_string(['z'] || string_split(o_orderpriority, '-')"
     "[1:len(string_split(o_orderpriority, '-')) - 1], ',')"),
    ("netloc(concat('http://u:p@h', toString(l_linenumber),"
     " '.com:88/p?q=1'))",
     "regexp_extract('http://u:p@h' || l_linenumber || '.com:88/p?q=1',"
     " '^(?:[A-Za-z][A-Za-z0-9+.-]*://)?([^/?#]*)', 1)"),
    ("queryStringAndFragment(concat('http://h.com/p?page=',"
     " toString(l_linenumber), '#f'))",
     "'page=' || l_linenumber || '#f'"),
]


def _tupmap_cases() -> list[tuple[str, str, str]]:
    out = []
    for i, (ch_e, dd_e) in enumerate(_TUPMAP_PAIRS):
        src_t = "orders" if "o_orderpriority" in ch_e else "lineitem"
        key = ("o_orderkey" if src_t == "orders"
               else "l_orderkey, l_linenumber")
        ch = (f"SELECT {key}, {ch_e} AS v FROM {src_t} "
              f"WHERE {key.split(',')[0]} < 800")
        dd = (f"SELECT {key}, {dd_e} AS v FROM {src_t} "
              f"WHERE {key.split(',')[0]} < 800")
        out.append((f"tupmapfuzz{i:02d}", ch, dd))
    return out


TUPMAP_CASES = _tupmap_cases()

PAIR_CASES = (DATE_CASES + DIST_CASES + QNT_CASES + ARR_CASES
              + TUPMAP_CASES + SETOP_CASES)


@pytest.mark.parametrize("name,ch_sql,dd_sql", PAIR_CASES,
                         ids=[c[0] for c in PAIR_CASES])
def test_differential_dates(spark, sf_dir, duck, name, ch_sql, dd_sql):
    tables = load_all(spark, sf_dir)
    ours = execute_sql(spark, ch_sql, tables).toPandas()
    theirs = duck.sql(dd_sql).df()
    problems = _tolerant_compare(ours, theirs)
    assert not problems, problems


@pytest.mark.parametrize("name,sql", NULLJOIN_CASES,
                         ids=[c[0] for c in NULLJOIN_CASES])
def test_differential_null_keys(spark, sf_dir, duck, name, sql):
    tables = load_all(spark, sf_dir)
    ch_sql = sql.replace("count(*)", "count()")
    ours = execute_sql(spark, ch_sql, tables,
                       settings={"join_use_nulls": 1}).toPandas()
    theirs = duck.sql(sql).df()
    problems = _tolerant_compare(ours, theirs)
    assert not problems, problems


def _combo_cases(n: int) -> list[tuple[str, str, str]]:
    """Randomized CLAUSE-COMBINATION differential fuzz (round 6): stack
    PREWHERE/WHERE/GROUP BY/HAVING/WITH TOTALS/DISTINCT/LIMIT BY/ORDER
    BY/LIMIT in random mixes; the DuckDB side states the combination in
    ANSI SQL (PREWHERE folded into WHERE, LIMIT BY via row_number,
    TOTALS via GROUPING SETS). Catches clause-interaction misparses the
    static matrix (test_clause_matrix.py) can't enumerate."""
    rnd = random.Random(606)
    keys = ["l_returnflag", "l_linestatus", "(l_linenumber % 3)"]
    out = []
    for i in range(n):
        p1, p2 = _pred(rnd), _pred(rnd)
        key = rnd.choice(keys)
        shape = rnd.choice(["agg", "row", "limitby", "totals",
                            "distinct"])
        if shape == "agg":
            e = _expr(rnd)
            hv = rnd.randint(1, 50)
            body = f"round(CAST(sum(CAST({e} AS DOUBLE)) AS DOUBLE), 3)"
            ch = (f"SELECT {key} AS k, {body} AS s, count() AS n "
                  f"FROM lineitem PREWHERE {p1} WHERE {p2} "
                  f"GROUP BY k HAVING n >= {hv} ORDER BY k")
            dd = (f"SELECT {key} AS k, {body} AS s, count(*) AS n "
                  f"FROM lineitem WHERE ({p1}) AND ({p2}) "
                  f"GROUP BY k HAVING count(*) >= {hv} ORDER BY k")
        elif shape == "totals":
            e = f"CAST(l_linenumber AS DOUBLE) + {rnd.randint(0, 9)}"
            body = f"round(CAST(sum({e}) AS DOUBLE), 3)"
            ch = (f"SELECT {key} AS k, {body} AS s FROM lineitem "
                  f"WHERE {p2} GROUP BY k WITH TOTALS")
            # CH emits the totals block even on empty input, with
            # empty-set defaults (sum→0) and the key TYPE'S default
            # (''/0) in the key cell; ANSI sum over zero rows is NULL
            # and GROUPING SETS NULL-fills, so COALESCE + GROUPING()
            # state both contracts on the oracle side.
            kd = "0" if key.startswith("(") else "''"
            dd = (f"SELECT k, COALESCE(s, 0.0) AS s FROM ("
                  f"SELECT CASE WHEN GROUPING({key}) = 1 THEN {kd} "
                  f"ELSE {key} END AS k, {body} AS s FROM lineitem "
                  f"WHERE {p2} GROUP BY GROUPING SETS (({key}), ()))")
        elif shape == "limitby":
            m = rnd.randint(1, 3)
            ch = (f"SELECT l_orderkey, l_linenumber FROM lineitem "
                  f"PREWHERE {p1} WHERE {p2} "
                  f"ORDER BY {key}, l_orderkey, l_linenumber "
                  f"LIMIT {m} BY {key}")
            dd = (f"SELECT l_orderkey, l_linenumber FROM ("
                  f"SELECT l_orderkey, l_linenumber, {key} AS k, "
                  f"row_number() OVER (PARTITION BY {key} "
                  f"ORDER BY l_orderkey, l_linenumber) AS rn "
                  f"FROM lineitem WHERE ({p1}) AND ({p2})) "
                  f"WHERE rn <= {m}")
        elif shape == "distinct":
            lim = rnd.randint(2, 8)
            ch = (f"SELECT DISTINCT {key} AS k, l_linenumber FROM "
                  f"lineitem PREWHERE {p1} "
                  f"ORDER BY k, l_linenumber LIMIT {lim}")
            dd = (f"SELECT DISTINCT {key} AS k, l_linenumber FROM "
                  f"lineitem WHERE {p1} "
                  f"ORDER BY k, l_linenumber LIMIT {lim}")
        else:
            e = _expr(rnd)
            lim = rnd.randint(3, 12)
            ch = (f"SELECT l_orderkey, l_linenumber, "
                  f"round(CAST({e} AS DOUBLE), 4) AS v FROM lineitem "
                  f"PREWHERE {p1} WHERE {p2} "
                  f"ORDER BY l_orderkey, l_linenumber LIMIT {lim}")
            dd = (f"SELECT l_orderkey, l_linenumber, "
                  f"round(CAST({e} AS DOUBLE), 4) AS v FROM lineitem "
                  f"WHERE ({p1}) AND ({p2}) "
                  f"ORDER BY l_orderkey, l_linenumber LIMIT {lim}")
        out.append((f"combofuzz{i:02d}", ch, dd))
    return out


COMBO_CASES = _combo_cases(30)


@pytest.mark.parametrize("name,ch_sql,dd_sql", COMBO_CASES,
                         ids=[c[0] for c in COMBO_CASES])
def test_differential_combos(spark, sf_dir, duck, name, ch_sql, dd_sql):
    tables = load_all(spark, sf_dir)
    ours = execute_sql(spark, ch_sql, tables).toPandas()
    theirs = duck.sql(dd_sql).df()
    problems = _tolerant_compare(ours, theirs)
    assert not problems, problems


SETOP_CHAIN_CASES = _setop_chain_cases(14)


@pytest.mark.parametrize("name,ch_sql,dd_sql", SETOP_CHAIN_CASES,
                         ids=[c[0] for c in SETOP_CHAIN_CASES])
def test_differential_setop_chains(spark, sf_dir, duck, name, ch_sql,
                                   dd_sql):
    tables = load_all(spark, sf_dir)
    ours = execute_sql(spark, ch_sql, tables).toPandas()
    theirs = duck.sql(dd_sql).df()
    problems = _tolerant_compare(ours, theirs)
    assert not problems, problems


@pytest.mark.parametrize("name,ch_sql,dd_sql", ROLLUP_CASES,
                         ids=[c[0] for c in ROLLUP_CASES])
def test_differential_rollup(spark, sf_dir, duck, name, ch_sql, dd_sql):
    tables = load_all(spark, sf_dir)
    ours = execute_sql(spark, ch_sql.replace("count(*)", "count()"),
                       tables).toPandas()
    theirs = duck.sql(dd_sql).df()
    problems = _tolerant_compare(ours, theirs)
    assert not problems, problems


def _quantile_exact_cases(n: int) -> list[tuple[str, str, str]]:
    """quantileExact: CH's element pick at floor(level*n) vs the same
    pick stated with DuckDB list indexing (1-based) — catches any
    regression back to interpolation on even-sized groups."""
    rnd = random.Random(606060)
    out = []
    for i in range(n):
        q = round(rnd.uniform(0.05, 0.95), 2)
        col = rnd.choice(["l_quantity", "l_linenumber", "l_suppkey"])
        key = rnd.choice(["l_returnflag", "l_linestatus"])
        ch = (f"SELECT {key} AS k, "
              f"quantileExact({q})(CAST({col} AS Int32)) AS v "
              f"FROM lineitem GROUP BY k")
        dd = (f"SELECT {key} AS k, "
              f"(list_sort(list(CAST({col} AS INT))))"
              f"[CAST(floor({q} * count(*)) AS INT) + 1] AS v "
              f"FROM lineitem GROUP BY k")
        out.append((f"qexfuzz{i:02d}", ch, dd))
    return out


QEX_CASES = _quantile_exact_cases(10)


@pytest.mark.parametrize("name,ch_sql,dd_sql", QEX_CASES,
                         ids=[c[0] for c in QEX_CASES])
def test_differential_quantile_exact(spark, sf_dir, duck, name, ch_sql,
                                     dd_sql):
    tables = load_all(spark, sf_dir)
    ours = execute_sql(spark, ch_sql, tables).toPandas()
    theirs = duck.sql(dd_sql).df()
    problems = _tolerant_compare(ours, theirs)
    assert not problems, problems


def _asof_cases(n: int) -> list[tuple[str, str, str]]:
    """ASOF JOIN fuzz: direction (>= / > / <= / <), inner vs LEFT, and
    varying side filters — DuckDB's native ASOF JOIN states the same
    semantics verbatim. Ties in ts are broken identically (at most one
    match per left row by construction of the closest-match contract)."""
    rnd = random.Random(4242)
    types = ["click", "signup", "view", "purchase", "error"]
    out = []
    for i in range(n):
        lt, rt = rnd.sample(types, 2)
        op = rnd.choice([">=", ">", "<=", "<"])
        kind = rnd.choice(["ASOF JOIN", "ASOF LEFT JOIN"])
        m = rnd.randint(2, 5)
        sql = (f"SELECT p.event_id AS eid, s.event_id AS sid "
               f"FROM (SELECT * FROM events WHERE event_type = '{lt}' "
               f"AND user_id % {m} = 0) p "
               f"{kind} (SELECT * FROM events WHERE event_type = '{rt}') s "
               f"ON p.user_id = s.user_id AND p.ts {op} s.ts "
               f"ORDER BY eid")
        out.append((f"asoffuzz{i:02d}", sql, sql))
    return out


ASOF_CASES = _asof_cases(10)


@pytest.mark.parametrize("name,ch_sql,dd_sql", ASOF_CASES,
                         ids=[c[0] for c in ASOF_CASES])
def test_differential_asof(spark, sf_dir, duck, name, ch_sql, dd_sql):
    tables = load_all(spark, sf_dir)
    ours = execute_sql(spark, ch_sql, tables).toPandas()
    theirs = duck.sql(dd_sql).df()
    problems = _tolerant_compare(ours, theirs)
    assert not problems, problems


def _range_frame_cases(n: int) -> list[tuple[str, str]]:
    """RANGE window frames with value offsets — identical ANSI SQL on
    both engines; catches frame-boundary lowering bugs."""
    rnd = random.Random(717)
    out = []
    for i in range(n):
        lo = rnd.randint(1, 5)
        hi = rnd.randint(0, 3)
        key = rnd.choice(["l_returnflag", "l_linestatus"])
        frame = rnd.choice([
            f"RANGE BETWEEN {lo} PRECEDING AND CURRENT ROW",
            f"RANGE BETWEEN {lo} PRECEDING AND {hi} FOLLOWING",
            "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        ])
        sql = (f"SELECT l_orderkey, l_linenumber, "
               f"count(*) OVER (PARTITION BY {key} "
               f"ORDER BY l_linenumber {frame}) AS c "
               f"FROM lineitem WHERE l_orderkey < 800 "
               f"ORDER BY l_orderkey, l_linenumber")
        out.append((f"rangefuzz{i:02d}", sql))
    return out


RANGE_CASES = _range_frame_cases(8)


@pytest.mark.parametrize("name,sql", RANGE_CASES,
                         ids=[c[0] for c in RANGE_CASES])
def test_differential_range_frames(spark, sf_dir, duck, name, sql):
    tables = load_all(spark, sf_dir)
    ours = execute_sql(spark, sql, tables).toPandas()
    theirs = duck.sql(sql).df()
    problems = _tolerant_compare(ours, theirs)
    assert not problems, problems


def _window_combinator_cases(n: int) -> list[tuple[str, str, str]]:
    """-If / -OrNull aggregates as WINDOW functions (round-8 rework:
    per-leaf .over). DuckDB speaks them as FILTER (WHERE) / plain
    windows; the CH empty-subset default (0, never NULL for sum/count
    over non-Nullable args) maps to COALESCE on the oracle side."""
    rnd = random.Random(808)
    out = []
    order = ("l_orderkey, l_linenumber, l_partkey, l_suppkey, "
             "l_quantity, l_extendedprice")
    for i in range(n):
        part = rnd.choice(["l_returnflag", "l_linestatus"])
        cond = (f"l_quantity {rnd.choice(['<', '>'])} "
                f"{rnd.randint(5, 45)}")
        frame = rnd.choice([
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
        ])
        kind = rnd.randrange(3)
        over = f"OVER (PARTITION BY {part} ORDER BY {order} {frame})"
        if kind == 0:
            # parquet columns are Nullable under our documented proxy,
            # so a no-match frame keeps NULL (AggregateFunctionNull) —
            # exactly DuckDB's plain conditional sum
            ch = f"sumIf(CAST(l_linenumber AS Float64), {cond}) {over}"
            dd = (f"sum(CASE WHEN {cond} THEN "
                  f"CAST(l_linenumber AS DOUBLE) END) {over}")
        elif kind == 1:
            ch = f"countIf({cond}) {over}"
            dd = f"count(CASE WHEN {cond} THEN 1 END) {over}"
        else:
            ch = f"sumOrNull(CAST(l_linenumber AS Float64)) {over}"
            dd = f"sum(CAST(l_linenumber AS DOUBLE)) {over}"
        base = ("SELECT l_orderkey, l_linenumber, "
                "round(CAST({expr} AS DOUBLE), 3) AS v "
                "FROM lineitem WHERE l_orderkey < 800")
        out.append((f"wincombfuzz{i:02d}",
                    base.format(expr=ch), base.format(expr=dd)))
    return out


WINCOMB_CASES = _window_combinator_cases(9)


@pytest.mark.parametrize("name,ch_sql,dd_sql", WINCOMB_CASES,
                         ids=[c[0] for c in WINCOMB_CASES])
def test_differential_window_combinators(spark, sf_dir, duck, name,
                                         ch_sql, dd_sql):
    tables = load_all(spark, sf_dir)
    ours = execute_sql(spark, ch_sql, tables).toPandas()
    theirs = duck.sql(dd_sql).df()
    problems = _tolerant_compare(ours, theirs)
    assert not problems, problems


def _in_null_cases(n: int) -> list[tuple[str, str, str]]:
    """IN / NOT IN with NULL on either side (round-8: a NULL lhs yields
    0 for BOTH IN and NOT IN at every lowering site; NULL list elements
    match nothing — transform_null_in=0). DuckDB's three-valued IN is
    rewritten with CASE to the CH contract."""
    rnd = random.Random(909)
    out = []
    for i in range(n):
        k = rnd.randint(1, 7)
        vals = sorted(rnd.sample(range(1, 8), rnd.randint(1, 3)))
        vlist = ", ".join(map(str, vals))
        neg = rnd.random() < 0.5
        op = "NOT IN" if neg else "IN"
        lhs = f"nullIf(l_linenumber, {k})"
        ch = (f"SELECT l_orderkey, l_linenumber, "
              f"{lhs} {op} ({vlist}) AS v "
              f"FROM lineitem WHERE l_orderkey < 500")
        dd = (f"SELECT l_orderkey, l_linenumber, "
              f"CASE WHEN {lhs} IS NULL THEN FALSE "
              f"ELSE {lhs} {op} ({vlist}) END AS v "
              f"FROM lineitem WHERE l_orderkey < 500")
        out.append((f"innullfuzz{i:02d}", ch, dd))
        # WHERE-position variant (semi/anti-join lowering path)
        ch_w = (f"SELECT count(*) AS c FROM lineitem "
                f"WHERE l_orderkey < 500 AND {lhs} {op} "
                f"(SELECT l_linenumber FROM lineitem "
                f"WHERE l_orderkey < 100)")
        dd_w = (f"SELECT count(*) AS c FROM lineitem "
                f"WHERE l_orderkey < 500 AND (CASE WHEN {lhs} IS NULL "
                f"THEN FALSE ELSE {lhs} {op} (SELECT l_linenumber "
                f"FROM lineitem WHERE l_orderkey < 100) END)")
        out.append((f"innullfuzz{i:02d}w", ch_w, dd_w))
    return out


IN_NULL_CASES = _in_null_cases(6)


@pytest.mark.parametrize("name,ch_sql,dd_sql", IN_NULL_CASES,
                         ids=[c[0] for c in IN_NULL_CASES])
def test_differential_in_null(spark, sf_dir, duck, name, ch_sql, dd_sql):
    tables = load_all(spark, sf_dir)
    ours = execute_sql(spark, ch_sql, tables).toPandas()
    theirs = duck.sql(dd_sql).df()
    problems = _tolerant_compare(ours, theirs)
    assert not problems, problems


def _date_arith_cases(n: int) -> list[tuple[str, str, str]]:
    """Round-8 date-arithmetic typing: Date ± N shifts days, Date − Date
    is an Int32 day count, add/subtract-unit functions keep the input
    class. DuckDB speaks the same semantics with explicit casts."""
    rnd = random.Random(1010)
    out = []
    for i in range(n):
        k = rnd.randint(1, 40)
        kind = rnd.randrange(4)
        # l_shipdate is a TIMESTAMP in the parquet — CH DateTime + N
        # adds SECONDS there, so Date semantics are pinned on
        # toDate(l_shipdate)
        d = "toDate(l_shipdate)"
        dd_d = "CAST(l_shipdate AS DATE)"
        if kind == 0:
            ch_e = f"toString({d} + {k})"
            dd_e = f"strftime({dd_d} + {k}, '%Y-%m-%d')"
        elif kind == 1:
            ch_e = f"{d} - toDate('1995-01-01')"
            dd_e = f"datediff('day', DATE '1995-01-01', {dd_d})"
        elif kind == 2:
            ch_e = f"toString(addMonths({d}, {k % 13}))"
            dd_e = (f"strftime({dd_d} + INTERVAL {k % 13} MONTH, "
                    f"'%Y-%m-%d')")
        else:
            ch_e = f"toString(subtractWeeks({d}, {k % 9}))"
            dd_e = (f"strftime({dd_d} - INTERVAL {(k % 9) * 7} DAY, "
                    f"'%Y-%m-%d')")
        ch = (f"SELECT l_orderkey, l_linenumber, {ch_e} AS v "
              f"FROM lineitem WHERE l_orderkey < 1500")
        dd = (f"SELECT l_orderkey, l_linenumber, {dd_e} AS v "
              f"FROM lineitem WHERE l_orderkey < 1500")
        out.append((f"datearithfuzz{i:02d}", ch, dd))
    return out


DATE_ARITH_CASES = _date_arith_cases(10)


@pytest.mark.parametrize("name,ch_sql,dd_sql", DATE_ARITH_CASES,
                         ids=[c[0] for c in DATE_ARITH_CASES])
def test_differential_date_arith(spark, sf_dir, duck, name, ch_sql,
                                 dd_sql):
    tables = load_all(spark, sf_dir)
    ours = execute_sql(spark, ch_sql, tables).toPandas()
    theirs = duck.sql(dd_sql).df()
    problems = _tolerant_compare(ours, theirs)
    assert not problems, problems


def _hof_cases(n: int) -> list[tuple[str, str, str]]:
    """HOF lambdas over arrays vs DuckDB list functions — pins the
    lambda-binding machinery (typed params, nested HOFs) against an
    independent engine. Arrays come from splitting real string columns."""
    rnd = random.Random(1111)
    out = []
    ch_arr = "splitByChar('-', o_orderpriority)"
    dd_arr = "string_split(o_orderpriority, '-')"
    for i in range(n):
        kind = rnd.randrange(5)
        if kind == 0:
            ch_e = (f"arrayStringConcat(arrayMap(x -> upper(x), "
                    f"{ch_arr}), '.')")
            dd_e = (f"array_to_string(list_transform({dd_arr}, "
                    f"x -> upper(x)), '.')")
        elif kind == 1:
            k = rnd.randint(1, 8)
            ch_e = (f"length(arrayFilter(x -> length(x) > {k}, "
                    f"{ch_arr}))")
            dd_e = (f"len(list_filter({dd_arr}, "
                    f"x -> length(x) > {k}))")
        elif kind == 2:
            ch_e = f"arrayStringConcat(arraySort({ch_arr}), ',')"
            dd_e = f"array_to_string(list_sort({dd_arr}), ',')"
        elif kind == 3:
            ch_e = f"arrayStringConcat(arrayReverse({ch_arr}), ',')"
            dd_e = f"array_to_string(list_reverse({dd_arr}), ',')"
        else:
            # nested HOF: map inside filter
            ch_e = (f"arrayStringConcat(arrayMap(x -> concat(x, '!'), "
                    f"arrayFilter(y -> y != '', {ch_arr})), '|')")
            dd_e = (f"array_to_string(list_transform(list_filter("
                    f"{dd_arr}, y -> y != ''), x -> concat(x, '!')), "
                    f"'|')")
        ch = (f"SELECT o_orderkey, {ch_e} AS v FROM orders "
              f"WHERE o_orderkey < 2000")
        dd = (f"SELECT o_orderkey, {dd_e} AS v FROM orders "
              f"WHERE o_orderkey < 2000")
        out.append((f"hoffuzz{i:02d}", ch, dd))
    return out


HOF_CASES = _hof_cases(10)


@pytest.mark.parametrize("name,ch_sql,dd_sql", HOF_CASES,
                         ids=[c[0] for c in HOF_CASES])
def test_differential_hofs(spark, sf_dir, duck, name, ch_sql, dd_sql):
    tables = load_all(spark, sf_dir)
    ours = execute_sql(spark, ch_sql, tables).toPandas()
    theirs = duck.sql(dd_sql).df()
    problems = _tolerant_compare(ours, theirs)
    assert not problems, problems


def _limitby_setop_cases(n: int) -> list[tuple[str, str, str]]:
    """LIMIT k BY and bare INTERSECT/EXCEPT (hash-set filters keeping
    left multiplicity) vs DuckDB rewrites (row_number / IN / NOT IN)."""
    rnd = random.Random(1212)
    out = []
    for i in range(n):
        kind = rnd.randrange(3)
        if kind == 0:
            k = rnd.randint(1, 3)
            key = rnd.choice(["o_orderpriority", "o_orderstatus"])
            ch = (f"SELECT {key} AS g, o_orderkey FROM (SELECT {key}, "
                  f"o_orderkey FROM orders ORDER BY o_orderkey) "
                  f"LIMIT {k} BY {key}")
            dd = (f"SELECT g, o_orderkey FROM (SELECT {key} AS g, "
                  f"o_orderkey, ROW_NUMBER() OVER (PARTITION BY {key} "
                  f"ORDER BY o_orderkey) AS rn FROM orders) "
                  f"WHERE rn <= {k}")
        elif kind == 1:
            cut = rnd.randint(200, 900)
            ch = (f"SELECT l_linenumber FROM lineitem WHERE "
                  f"l_orderkey < {cut} INTERSECT SELECT l_linenumber "
                  f"FROM lineitem WHERE l_orderkey >= {cut}")
            dd = (f"SELECT l_linenumber FROM lineitem WHERE "
                  f"l_orderkey < {cut} AND l_linenumber IN (SELECT "
                  f"l_linenumber FROM lineitem WHERE l_orderkey >= {cut})")
        else:
            cut = rnd.randint(200, 900)
            ch = (f"SELECT l_linenumber FROM lineitem WHERE "
                  f"l_orderkey < {cut} EXCEPT SELECT l_linenumber "
                  f"FROM lineitem WHERE l_orderkey >= {cut}")
            dd = (f"SELECT l_linenumber FROM lineitem WHERE "
                  f"l_orderkey < {cut} AND l_linenumber NOT IN (SELECT "
                  f"l_linenumber FROM lineitem WHERE l_orderkey >= {cut})")
        out.append((f"lbsofuzz{i:02d}", ch, dd))
    return out


LBSO_CASES = _limitby_setop_cases(9)


@pytest.mark.parametrize("name,ch_sql,dd_sql", LBSO_CASES,
                         ids=[c[0] for c in LBSO_CASES])
def test_differential_limitby_setops(spark, sf_dir, duck, name, ch_sql,
                                     dd_sql):
    tables = load_all(spark, sf_dir)
    ours = execute_sql(spark, ch_sql, tables).toPandas()
    theirs = duck.sql(dd_sql).df()
    problems = _tolerant_compare(ours, theirs)
    assert not problems, problems


def _r13_grammar_cases(n: int) -> list[tuple[str, str, str]]:
    """Round-13 grammar surface differentials: QUALIFY over ranking
    windows (DuckDB shares the clause verbatim), IS [NOT] DISTINCT
    FROM null-safe comparison, and string-form INTERVAL arithmetic."""
    rnd = random.Random(1313)
    out = []
    for i in range(n):
        kind = i % 3
        if kind == 0:
            key = rnd.choice(["l_returnflag", "l_linestatus"])
            k = rnd.randint(1, 3)
            sql = (f"SELECT l_orderkey, l_linenumber FROM lineitem "
                   f"WHERE {_pred(rnd)} "
                   f"QUALIFY row_number() OVER (PARTITION BY {key} "
                   f"ORDER BY l_orderkey, l_linenumber, l_suppkey) "
                   f"<= {k}")
            out.append((f"r13fuzz{i:02d}", sql, sql))
        elif kind == 1:
            a = rnd.randint(1, 4)
            b = rnd.randint(1, 7)
            sql = (f"SELECT l_returnflag AS k, count(*) AS c "
                   f"FROM lineitem WHERE NULLIF(l_linenumber, {a}) "
                   f"IS DISTINCT FROM NULLIF(l_suppkey % 7, {b}) "
                   f"GROUP BY k")
            out.append((f"r13fuzz{i:02d}", sql, sql))
        else:
            d = rnd.randint(1, 30)
            p = _pred(rnd)
            ch = (f"SELECT l_orderkey, l_linenumber, "
                  f"CAST(l_shipdate AS DATE) + INTERVAL '{d} day' AS v "
                  f"FROM lineitem WHERE {p}")
            dd = (f"SELECT l_orderkey, l_linenumber, "
                  f"CAST(CAST(l_shipdate AS DATE) + INTERVAL '{d}' DAY "
                  f"AS DATE) AS v FROM lineitem WHERE {p}")
            out.append((f"r13fuzz{i:02d}", ch, dd))
    return out


R13_CASES = _r13_grammar_cases(12)


@pytest.mark.parametrize("name,ch_sql,dd_sql", R13_CASES,
                         ids=[c[0] for c in R13_CASES])
def test_differential_r13_grammar(spark, sf_dir, duck, name, ch_sql,
                                  dd_sql):
    tables = load_all(spark, sf_dir)
    ours = execute_sql(spark, ch_sql, tables).toPandas()
    theirs = duck.sql(dd_sql).df()
    problems = _tolerant_compare(ours, theirs)
    assert not problems, problems
