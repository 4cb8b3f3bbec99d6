"""Round-6 regression pins: the five ADVICE/VERDICT round-5 confirmed
bugs plus the two round-5 probe gaps (position 3-arg, arrayReduce
general names). Each test is the verdict's exact reproducer.

Reference semantics: public ClickHouse docs — Merge engine reads
columns by name; hasSubstr returns 0 when the needle is longer;
JSONExtract* treats only integer-TYPED keys as indices
(src/Functions/FunctionsJSON.h); byteSwap swaps the argument TYPE's
width; CapnProto has no null so CH exports type defaults; POSITION
special-case is only the IN form
(src/Parsers/ExpressionElementParsers.cpp:537-564); arrayReduce accepts
any registered aggregate name (src/Functions/array/arrayReduce.cpp).
"""
from __future__ import annotations

import pytest

from clickhouse_from_scratch_spark.plans import execute_sql
from clickhouse_from_scratch_spark.plans.builder import BuildError


def _one(spark, sql, tables=None):
    rows = execute_sql(spark, sql, tables or {}).collect()
    assert len(rows) == 1
    return rows[0]


# --- 1. merge() unions by column NAME, never position --------------------
def test_merge_reordered_columns_union_by_name(spark):
    t1 = spark.createDataFrame([(1, "a")], "x int, y string")
    t2 = spark.createDataFrame([("b", 2)], "y string, x int")
    rows = execute_sql(spark, "SELECT * FROM merge('t[12]') ORDER BY x",
                       {"t1": t1, "t2": t2}).collect()
    assert [(r.x, r.y) for r in rows] == [(1, "a"), (2, "b")]
    # schema keeps the first table's types — no silent string coercion
    df = execute_sql(spark, "SELECT * FROM merge('t[12]')",
                     {"t1": t1, "t2": t2})
    assert dict(df.dtypes) == {"x": "int", "y": "string"}


def test_merge_column_set_mismatch_raises(spark):
    t1 = spark.createDataFrame([(1, "a")], "x int, y string")
    t3 = spark.createDataFrame([(1, "a")], "z int, y string")
    with pytest.raises(BuildError, match="merge.*column set"):
        execute_sql(spark, "SELECT * FROM merge('t[13]')",
                    {"t1": t1, "t3": t3})


# --- 2. hasSubstr: needle longer than haystack → false, no crash ---------
def test_has_substr_long_needle_is_false(spark):
    r = _one(spark, "SELECT hasSubstr([1,2], [1,2,3]) AS h")
    assert r.h is False


def test_has_substr_normal_cases_unchanged(spark):
    r = _one(spark, "SELECT hasSubstr([1,2,3,4], [2,3]) AS a, "
                    "hasSubstr([1,2,3,4], [2,4]) AS b, "
                    "hasSubstr([1,2], []) AS c")
    assert (r.a, r.b, r.c) == (True, False, True)


# --- 3. JSONExtract*: digit-looking STRING keys are member names ---------
def test_json_digit_string_key_is_member_name(spark):
    r = _one(spark, """SELECT JSONExtractString('{"2":"x"}', '2') AS v""")
    assert r.v == "x"


def test_json_integer_typed_key_is_index(spark):
    r = _one(spark, "SELECT JSONExtractInt('[10,20]', 2) AS v, "
                    "JSONExtractInt('[10,20]', 1) AS w")
    assert (r.v, r.w) == (20, 10)


# --- 4. to_capnproto: NULL cells encode as type defaults -----------------
def test_capnproto_null_cells_roundtrip_as_defaults(spark):
    from clickhouse_from_scratch_spark.sources.capnproto import (
        from_capnproto, to_capnproto)
    df = spark.createDataFrame([(None, None, None)],
                               "s string, n int, b boolean")
    back = from_capnproto(spark, to_capnproto(df),
                          "s string, n int, b boolean").collect()
    assert [(r.s, r.n, r.b) for r in back] == [("", 0, False)]


# --- 5. byteSwap: width from the DECLARED type, not the value ------------
def test_byteswap_declared_width(spark):
    r = _one(spark, "SELECT byteSwap(toUInt32(5)) AS a, "
                    "byteSwap(toUInt16(5)) AS b, "
                    "byteSwap(toUInt64(5)) AS c")
    assert (r.a, r.b, r.c) == (83886080, 1280, 360287970189639680)


def test_byteswap_ddl_declared_column_width(spark):
    df = spark.createDataFrame([(5,)], "u int")
    # via CAST the CH type is explicit even though Spark stores signed
    r = execute_sql(spark, "SELECT byteSwap(CAST(u AS UInt32)) AS v "
                           "FROM t", {"t": df}).collect()
    assert r[0].v == 83886080


def test_byteswap_untyped_literal_value_width(spark):
    r = _one(spark, "SELECT byteSwap(3351772109) AS v")
    assert r.v == 3455829959


# --- 6. position 3-arg call form ----------------------------------------
def test_position_three_arg_start_pos(spark):
    r = _one(spark, "SELECT position('abcabc', 'bc', 3) AS p, "
                    "position('abcabc', 'bc') AS q, "
                    "position('bc' IN 'abcabc') AS r")
    assert (r.p, r.q, r.r) == (5, 2, 2)


def test_position_column_needle(spark):
    df = spark.createDataFrame([("abcabc", "ca")], "h string, n string")
    r = execute_sql(spark, "SELECT position(h, n) AS p FROM t",
                    {"t": df}).collect()
    assert r[0].p == 3


# --- 7. arrayReduce: general aggregate names -----------------------------
def test_array_reduce_general_names(spark):
    r = _one(spark, "SELECT arrayReduce('avg', [1,2,3]) AS a, "
                    "arrayReduce('count', [1,2,3]) AS c, "
                    "arrayReduce('uniqExact', [1,2,2,3]) AS u, "
                    "arrayReduce('any', [7,8]) AS f, "
                    "arrayReduce('anyLast', [7,8]) AS l, "
                    "arrayReduce('stddevPop', [2,4]) AS s")
    assert (r.a, r.c, r.u, r.f, r.l, r.s) == (2.0, 3, 3, 7, 8, 1.0)


def test_array_reduce_unknown_name_is_build_error(spark):
    with pytest.raises(BuildError, match="arrayReduce.*unsupported"):
        execute_sql(spark, "SELECT arrayReduce('nosuchagg', [1]) AS v",
                    {}).collect()


# --- 8. stacked combinators on suffixed bases ----------------------------
def test_stacked_combinator_distinct_on_suffixed_base(spark):
    df = spark.createDataFrame([(1, 10), (1, 10), (1, 20), (2, 5)],
                               "k int, v int")
    rows = execute_sql(spark, """
        SELECT k, minOrNull(DISTINCT v) AS mn,
               avgIf(DISTINCT v, v > 5) AS av,
               sumIf(DISTINCT v, v > 0) AS sm,
               countIf(DISTINCT v, v > 5) AS ct,
               maxOrDefault(DISTINCT v) AS md
        FROM t GROUP BY k ORDER BY k""", {"t": df}).collect()
    assert [(r.mn, r.av, r.sm, r.ct, r.md) for r in rows] == \
        [(10, 15.0, 30.0, 2, 20), (5, None, 5.0, 0, 5)]


def test_stacked_combinator_ornull_empty_set(spark):
    df = spark.createDataFrame([(1, 10)], "k int, v int")
    r = execute_sql(spark, "SELECT minOrNull(DISTINCT v) AS mn FROM t "
                           "WHERE v > 100", {"t": df}).collect()
    assert r[0].mn is None


# --- 9. sum-family result-type fidelity (CH NumberTraits) ----------------
def test_sum_family_integer_inputs_widen_to_int64(spark):
    df = spark.createDataFrame([(1, 2, [1, 2]), (1, 3, [3, 4])],
                               "k int, v int, a array<int>")
    out = execute_sql(spark, """
        SELECT groupArrayMovingSum(v) AS ms, sumArray(a) AS sa,
               sumForEach(a) AS sf, sumDistinct(v) AS sd,
               sumMap(a, a) AS sm
        FROM t GROUP BY k""", {"t": df})
    dt = dict(out.dtypes)
    assert dt["ms"] == "array<bigint>"
    assert dt["sa"] == "bigint"
    assert dt["sf"] == "array<bigint>"
    assert dt["sd"] == "bigint"
    assert "array<bigint>" in dt["sm"]
    r = out.collect()[0]
    assert (r.ms, r.sa, r.sf, r.sd) == ([2, 5], 10, [4, 6], 5)


def test_sum_family_float_inputs_stay_double(spark):
    df = spark.createDataFrame([(1, 1.5, [0.5])], "k int, f double, a array<double>")
    out = execute_sql(spark, "SELECT groupArrayMovingSum(f) AS ms, "
                             "sumArray(a) AS sa FROM t GROUP BY k",
                      {"t": df})
    dt = dict(out.dtypes)
    assert dt["ms"] == "array<double>" and dt["sa"] == "double"


# --- 10. fidelity tail: signed byteSwap, parametric arrayReduce, -------
# --- negative JSON indices ----------------------------------------------
def test_byteswap_signed_width_wraps(spark):
    r = _one(spark, "SELECT byteSwap(toInt16(-2)) AS a, "
                    "byteSwap(toInt32(-2)) AS b")
    # 0xFFFE -> 0xFEFF (Int16 -257); 0xFFFFFFFE -> 0xFEFFFFFF
    assert (r.a, r.b) == (-257, -16777217)


def test_array_reduce_parametric_and_median(spark):
    r = _one(spark, "SELECT arrayReduce('quantile(0.5)', [1,2,3,4]) AS q, "
                    "arrayReduce('median', [1,2,3]) AS m")
    assert (r.q, r.m) == (2.5, 2.0)


def test_array_reduce_bad_parametric_raises(spark):
    with pytest.raises(BuildError, match="arrayReduce"):
        execute_sql(spark, "SELECT arrayReduce('nosuch(3)', [1]) AS v",
                    {}).collect()


def test_json_negative_index_from_end(spark):
    r = _one(spark, "SELECT JSONExtractInt('[10,20,30]', -1) AS a, "
                    """JSONExtractString('{"a":["x","y"]}', 'a', -1) AS b""")
    assert (r.a, r.b) == (30, "y")


# --- 11. empty-set keyless aggregates return type defaults ---------------
def test_empty_set_global_agg_type_defaults(spark):
    import math
    df = spark.createDataFrame([(1, 10, "x")], "k int, v int, s string")
    r = _one(spark, "SELECT sum(v) AS s, min(v) AS mn, max(v) AS mx, "
                    "any(s) AS a, avg(v) AS av, count(v) AS c, "
                    "uniqExact(v) AS u, groupArray(v) AS g, "
                    "sumOrNull(v) AS so, minOrNull(v) AS mo "
                    "FROM t WHERE v > 100", {"t": df})
    assert (r.s, r.mn, r.mx, r.a, r.c, r.u, r.g) == \
        (0, 0, 0, "", 0, 0, [])
    assert math.isnan(r.av)
    assert r.so is None and r.mo is None   # -OrNull keeps NULL


def test_non_empty_global_agg_unchanged(spark):
    df = spark.createDataFrame([(1, 10), (2, None)], "k int, v int")
    r = _one(spark, "SELECT sum(v) AS s, avg(v) AS av FROM t",
             {"t": df})
    assert (r.s, r.av) == (10, 10.0)


# --- 12. WITH TOTALS emits the totals block even on EMPTY input ----------
# CH's TotalsHavingTransform emits totals unconditionally; a GROUPING
# SETS ((k), ()) lowering yields zero rows on empty input in Spark.
def test_with_totals_empty_input(spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    rows = execute_sql(spark, "SELECT k, sum(v) AS s, count() AS c "
                              "FROM t WHERE v > 999 GROUP BY k WITH TOTALS",
                       {"t": df}).collect()
    assert len(rows) == 1            # just the totals row
    r = rows[0]
    assert r.k == 0 and r.s == 0 and r.c == 0   # totals key = type default


def test_with_totals_empty_after_having(spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    rows = execute_sql(spark, "SELECT k, sum(v) AS s FROM t GROUP BY k "
                              "WITH TOTALS HAVING s > 999",
                       {"t": df}).collect()
    # after_having_exclusive (default): totals over zero surviving
    # groups -> default-initialized totals row, still emitted
    assert len(rows) == 1
    r = rows[0]
    assert r.k == 0 and r.s == 0   # totals key = type default


def test_with_totals_non_empty_unchanged(spark):
    df = spark.createDataFrame([(1, 10), (1, 5), (2, 20)], "k int, v int")
    rows = execute_sql(spark, "SELECT k, sum(v) AS s FROM t "
                              "GROUP BY k WITH TOTALS",
                       {"t": df}).collect()
    # totals key cell = type default (0), so the totals row collides
    # with no real group here but duplicates would be legal
    got = sorted((r.k, r.s) for r in rows)
    assert got == [(0, 35), (1, 15), (2, 20)]


# --- 13. quantile-family result-type + element-pick fidelity -------------
# CH quantileExact picks sorted[floor(level*n)] with NO interpolation and
# keeps the input type; the TDigest/Timing sketches return Float32.
def test_quantile_exact_element_pick(spark):
    df = spark.createDataFrame([(10,), (20,), (30,), (40,)], "v int")
    r = execute_sql(spark, "SELECT quantileExact(0.5)(v) AS m, "
                           "quantileExact(1)(v) AS hi, "
                           "quantilesExact(0.25, 0.5)(v) AS qs FROM t",
                    {"t": df})
    row = r.collect()[0]
    # even count: element at floor(0.5*4)=idx 2 (0-based) -> 30, not 25
    assert (row.m, row.hi, row.qs) == (30, 40, [20, 30])
    assert r.schema["m"].dataType.simpleString() == "int"
    assert r.schema["qs"].dataType.simpleString() == "array<int>"


def test_quantile_sketch_result_types(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "v int")
    r = execute_sql(spark, "SELECT quantileTDigest(0.5)(v) AS td, "
                           "quantileTiming(0.5)(v) AS tm, "
                           "quantilesTDigest(0.25, 0.75)(v) AS tds, "
                           "quantileBFloat16(0.5)(v) AS bf, "
                           "deltaSum(v) AS ds FROM t", {"t": df})
    got = {f.name: f.dataType.simpleString() for f in r.schema.fields}
    assert got == {"td": "float", "tm": "float",
                   "tds": "array<float>", "bf": "double",
                   "ds": "bigint"}
    assert r.collect()[0].ds == 2


# --- 14. ROLLUP/CUBE WITH TOTALS emits the totals BLOCK too ---------------
# CH's TotalsHavingTransform runs downstream of the grouping-set
# expansion: the all-NULL totals row appears IN ADDITION to ROLLUP's own
# grand-total row. Previously the modifier was silently dropped.
def test_rollup_with_totals_block(spark):
    df = spark.createDataFrame([(1, 1, 10), (1, 2, 20), (2, 1, 30)],
                               "a int, b int, v int")
    rows = execute_sql(spark, "SELECT a, b, sum(v) AS s FROM t "
                              "GROUP BY ROLLUP(a, b) WITH TOTALS",
                       {"t": df}).collect()
    rs = [tuple(r) for r in rows]
    assert rs.count((0, 0, 60)) == 2   # grand total + totals block (key=default)
    assert len(rs) == 7


def test_cube_with_totals_having_raises(spark):
    df = spark.createDataFrame([(1, 10)], "a int, v int")
    with pytest.raises(BuildError):
        execute_sql(spark, "SELECT a, sum(v) AS s FROM t GROUP BY "
                           "CUBE(a) WITH TOTALS HAVING s > 0",
                    {"t": df}).collect()


# --- 15. ASOF JOIN qualified refs to COLLIDING right columns -------------
# Both sides carry event_id-style same-named columns; the union+window
# flattening suffix-renames the right one, and s.<col> must resolve to
# the RENAMED column — previously it silently hit the left's column.
def test_asof_qualified_colliding_column(spark):
    left = spark.createDataFrame(
        [(100, 1, 10)], "event_id long, user_id long, ts long")
    right = spark.createDataFrame(
        [(200, 1, 5), (201, 1, 8), (202, 1, 11)],
        "event_id long, user_id long, ts long")
    r = execute_sql(
        spark,
        "SELECT p.event_id AS eid, s.event_id AS sid "
        "FROM l AS p ASOF JOIN r AS s "
        "ON p.user_id = s.user_id AND p.ts >= s.ts",
        {"l": left, "r": right}).collect()
    assert [(x.eid, x.sid) for x in r] == [(100, 201)]


# --- 16. round() rounding-mode fidelity ------------------------------------
# CH round() = banker's for float types, away-from-zero for int/Decimal
# (docs: round(2.5) = 2, round(3.5) = 4, round(toInt32(25), -1) = 30).
# Spark's round is away-from-zero everywhere, so the lowering picks
# bround/round by inferred CH type.
def test_round_bankers_floats(spark):
    r = _one(spark, "SELECT round(2.5) AS a, round(3.5) AS b, "
                    "round(-2.5) AS c, round(2.4) AS d")
    assert (r.a, r.b, r.c, r.d) == (2.0, 4.0, -2.0, 2.0)


def test_round_away_for_int_decimal(spark):
    r = _one(spark, "SELECT round(toInt32(25), -1) AS a, "
                    "CAST(round(CAST(2.5 AS Decimal(10, 1))) AS INT) AS b")
    assert (r.a, r.b) == (30, 3)


def test_round_column_double(spark):
    df = spark.createDataFrame([(2.5,), (3.5,)], "v double")
    rows = execute_sql(spark, "SELECT round(v) AS r FROM t ORDER BY r",
                       {"t": df}).collect()
    assert [x.r for x in rows] == [2.0, 4.0]


# --- 17. intDiv/modulo THROW on zero divisor (OrZero forms degrade) -------
def test_int_div_zero_raises(spark):
    for sql in ("SELECT intDiv(1, 0) AS v", "SELECT 5 % 0 AS v",
                "SELECT modulo(5, 0) AS v"):
        with pytest.raises(Exception) as ei:
            execute_sql(spark, sql, {}).collect()
        assert "Division by zero" in str(ei.value)
    r = _one(spark, "SELECT intDivOrZero(5, 0) AS a, "
                    "moduloOrZero(5, 0) AS b, "
                    "if(1 = 0, intDiv(1, 0), -1) AS c")
    assert (r.a, r.b, r.c) == (0, 0, -1)   # when() branches stay lazy


# --- 18. toString drops the trailing .0 on integral floats (CH format) ----
def test_tostring_integral_float(spark):
    r = _one(spark, "SELECT toString(1.0) AS a, toString(1.5) AS b, "
                    "toString(-3.0) AS c, toString('a.0') AS d")
    assert (r.a, r.b, r.c, r.d) == ("1", "1.5", "-3", "a.0")


# --- 19. map['missing'] returns the value-type default; greatest/least
# propagate NULL (CH contracts) --------------------------------------------
def test_map_missing_key_default(spark):
    r = _one(spark, "SELECT map('a', 1)['b'] AS i, "
                    "map('a', 'x')['b'] AS s, map('a', 1)['a'] AS hit")
    assert (r.i, r.s, r.hit) == (0, "", 1)


def test_greatest_least_null_propagation(spark):
    r = _one(spark, "SELECT greatest(1, NULL) AS g, least(2, NULL) AS l, "
                    "greatest(1, 5, 2) AS g2, least(3, 1) AS l2")
    assert (r.g, r.l, r.g2, r.l2) == (None, None, 5, 1)


# --- 20. ORDER BY default NULL placement is NULLS LAST (both dirs) --------
# reference ExpressionElementParsers.cpp:2258: nulls_direction defaults
# to the sort direction ("same as direction for NULLS LAST"); Spark's
# bare asc() is nulls-first.
def test_order_by_default_nulls_last(spark):
    df = spark.createDataFrame([(1,), (None,), (2,)], "v int")
    runs = {
        "SELECT v FROM t ORDER BY v": [1, 2, None],
        "SELECT v FROM t ORDER BY v DESC": [2, 1, None],
        "SELECT v FROM t ORDER BY v NULLS FIRST": [None, 1, 2],
        "SELECT v FROM t ORDER BY v DESC NULLS FIRST": [None, 2, 1],
    }
    for sql, want in runs.items():
        got = [r.v for r in execute_sql(spark, sql, {"t": df}).collect()]
        assert got == want, (sql, got)


# --- 21. uniq family counts NULL as a distinct value (CH uniqExact) -------
def test_uniq_counts_null(spark):
    df = spark.createDataFrame([(1,), (None,), (2,), (None,)], "v int")
    r = _one(spark, "SELECT uniqExact(v) AS ue, count(DISTINCT v) AS cd, "
                    "uniq(v) AS u, count(DISTINCT v) "
                    "FILTER(WHERE v IS NOT NULL) AS cdf FROM t", {"t": df})
    assert (r.ue, r.cd, r.u, r.cdf) == (3, 3, 3, 2)
    # empty set stays 0, not NULL (the flag coalesces)
    r = _one(spark, "SELECT uniqExact(v) AS ue FROM t WHERE v > 99",
             {"t": df})
    assert r.ue == 0


def test_array_reverse_sort_nulls_last(spark):
    r = _one(spark, "SELECT arrayReverseSort([3, NULL, 1]) AS a")
    assert r.a == [3, 1, None]


# --- 22. gamma functions exact on small integral arguments ----------------
def test_gamma_exact_integers(spark):
    r = _one(spark, "SELECT tgamma(5) AS t5, lgamma(1) AS l1, "
                    "tgamma(1) AS t1, round(tgamma(0.5), 6) AS th")
    assert (r.t5, r.l1, r.t1, r.th) == (24.0, 0.0, 1.0, 1.772454)


# --- 23. integer array sums widen to Int64 (CH NumberTraits) --------------
def test_array_sum_widens_integers(spark):
    r = execute_sql(spark, "SELECT arraySum([1, 2, 3]) AS s, "
                           "arrayCumSum([1, 1, 1]) AS cs, "
                           "arraySum([1.5, 2.5]) AS fs", {})
    got = {f.name: f.dataType.simpleString() for f in r.schema.fields}
    assert got == {"s": "bigint", "cs": "array<bigint>", "fs": "double"}
    row = r.collect()[0]
    assert (row.s, row.cs, row.fs) == (6, [1, 2, 3], 4.0)
