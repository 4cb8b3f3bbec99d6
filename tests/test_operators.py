"""Unit tests for the custom ClickHouse-construct operators."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from clickhouse_from_scratch_spark.operators import (
    any_join, array_join, asof_join, distinct_on, final,
    join_with_defaults, limit_by, limit_with_ties, sample_by_key,
    with_fill, with_totals,
)


def test_final_keeps_latest(spark):
    df = spark.createDataFrame([
        (1, 10, "a"), (1, 20, "b"), (2, 5, "c"),
    ], "k int, v int, payload string")
    out = final(df, key=["k"], version="v").orderBy("k").collect()
    assert [(r.k, r.v, r.payload) for r in out] == [(1, 20, "b"), (2, 5, "c")]


def test_final_min_version(spark):
    df = spark.createDataFrame([(1, 10), (1, 20)], "k int, v int")
    out = final(df, key=["k"], version="v", keep="min").collect()
    assert out[0].v == 10


def test_limit_by_offset(spark):
    df = spark.createDataFrame(
        [(1, i) for i in range(5)] + [(2, i) for i in range(3)],
        "k int, v int")
    out = limit_by(df, ["k"], [F.col("v")], n=2, offset=1)
    got = sorted((r.k, r.v) for r in out.collect())
    assert got == [(1, 1), (1, 2), (2, 1), (2, 2)]


def test_distinct_on_first_row(spark):
    df = spark.createDataFrame([(1, 3, "x"), (1, 1, "y"), (2, 2, "z")],
                               "k int, v int, s string")
    out = distinct_on(df, ["k"], [F.col("v")])
    got = sorted((r.k, r.s) for r in out.collect())
    assert got == [(1, "y"), (2, "z")]


def test_any_join_multiplicity(spark):
    left = spark.createDataFrame([(1, "l1"), (2, "l2")], "k int, l string")
    right = spark.createDataFrame([(1, "r1"), (1, "r2")], "k int, r string")
    out = any_join(left, right, on=["k"], right_order=[F.col("r")])
    got = sorted((r.k, r.l, r.r) for r in out.collect())
    assert got == [(1, "l1", "r1"), (2, "l2", None)]


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, 10, "q1"), (1, 20, "q2"), (1, 5, "q0"), (2, 7, "q3")],
        "k int, t int, lq string")
    right = spark.createDataFrame(
        [(1, 8, "r8"), (1, 15, "r15"), (1, 20, "r20"), (2, 9, "r9")],
        "k int, t int, rv string")
    out = asof_join(left, right, on=["k"], left_time="t", right_time="t")
    got = {(r.k, r.t): r.rv for r in out.collect()}
    # t=5: nothing at or before; t=10: r8; t=20: r20 (exact tie matches)
    assert got == {(1, 5): None, (1, 10): "r8", (1, 20): "r20", (2, 7): None}


def test_asof_join_strict_backward(spark):
    left = spark.createDataFrame(
        [(1, 10, "q1"), (1, 20, "q2"), (1, 5, "q0")],
        "k int, t int, lq string")
    right = spark.createDataFrame(
        [(1, 5, "r5"), (1, 10, "r10"), (1, 20, "r20")],
        "k int, t int, rv string")
    out = asof_join(left, right, on=["k"], left_time="t", right_time="t",
                    strict=True)
    got = {(r.k, r.t): r.rv for r in out.collect()}
    # strict '>': an exact-tie right row must NOT match — t=5 has no
    # strictly-earlier row, t=10 takes r5 (not r10), t=20 takes r10
    assert got == {(1, 5): None, (1, 10): "r5", (1, 20): "r10"}


def test_asof_join_strict_forward(spark):
    left = spark.createDataFrame([(1, 12, "a")], "k int, t int, lq string")
    right = spark.createDataFrame([(1, 12, "r12"), (1, 15, "r15")],
                                  "k int, t int, rv string")
    out = asof_join(left, right, on=["k"], left_time="t", right_time="t",
                    direction="forward", strict=True)
    # strict '<': the right row at exactly t=12 is skipped
    assert out.collect()[0].rv == "r15"


def test_asof_join_forward(spark):
    left = spark.createDataFrame([(1, 10, "a")], "k int, t int, lq string")
    right = spark.createDataFrame([(1, 8, "r8"), (1, 12, "r12")],
                                  "k int, t int, rv string")
    out = asof_join(left, right, on=["k"], left_time="t", right_time="t",
                    direction="forward")
    assert out.collect()[0].rv == "r12"


def test_join_with_defaults_fills_type_defaults(spark):
    left = spark.createDataFrame([(1,), (2,)], "k int")
    right = spark.createDataFrame([(1, 5, "x")], "k int, n int, s string")
    out = join_with_defaults(left, right, on=["k"], how="left")
    row = {r.k: r for r in out.collect()}
    # join_use_nulls=0: non-matched cells get type defaults, not NULL
    assert row[2].n == 0 and row[2].s == ""
    assert row[1].n == 5 and row[1].s == "x"


def test_join_with_defaults_preserves_matched_nulls(spark):
    # a genuine NULL carried by a MATCHED right row must stay NULL
    # (plain coalesce would clobber it); only non-matched cells are filled
    left = spark.createDataFrame([(1,), (2,)], "k int")
    right = spark.createDataFrame([(1, None, None)], "k int, n int, s string")
    out = join_with_defaults(left, right, on=["k"], how="left")
    row = {r.k: r for r in out.collect()}
    assert row[1].n is None and row[1].s is None       # matched, real NULL
    assert row[2].n == 0 and row[2].s == ""            # non-matched, default


def test_join_with_defaults_condition_right_and_full(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "lk int, lv string")
    right = spark.createDataFrame([(2, 20.0), (3, 30.0)], "rk int, rv double")
    cond = F.col("lk") == F.col("rk")
    out = join_with_defaults(left, right, how="right", condition=cond)
    got = sorted((r.lk, r.lv, r.rk, r.rv) for r in out.collect())
    # non-matched right row 3: left cells get defaults (0, '')
    assert got == [(0, "", 3, 30.0), (2, "b", 2, 20.0)]
    out = join_with_defaults(left, right, how="full", condition=cond)
    got = sorted((r.lk, r.lv, r.rk, r.rv) for r in out.collect())
    assert got == [(0, "", 3, 30.0), (1, "a", 0, 0.0), (2, "b", 2, 20.0)]


def test_with_fill_generates_gap_rows(spark):
    df = spark.createDataFrame([(1, 10), (4, 40)], "x int, v int")
    out = with_fill(df, "x", F.lit(1), F.lit(5), F.lit(1),
                    fill_defaults={"v": 0})
    got = [(r.x, r.v) for r in out.collect()]
    assert got == [(1, 10), (2, 0), (3, 0), (4, 40), (5, 0)]


def test_with_fill_multi_grid(spark):
    from clickhouse_from_scratch_spark.operators import with_fill_multi
    df = spark.createDataFrame([(1, 1, 11), (2, 3, 23)], "a int, b int, v int")
    out = with_fill_multi(df, [("a", F.lit(1), F.lit(2), F.lit(1)),
                               ("b", F.lit(1), F.lit(3), F.lit(1))],
                          fill_defaults={"v": 0})
    got = [(r.a, r.b, r.v) for r in out.collect()]
    assert got == [(1, 1, 11), (1, 2, 0), (1, 3, 0),
                   (2, 1, 0), (2, 2, 0), (2, 3, 23)]


def test_with_fill_multi_sql(spark):
    from clickhouse_from_scratch_spark.plans import execute_sql
    df = spark.createDataFrame([(1, 1, 11), (2, 3, 23)], "a int, b int, v int")
    out = execute_sql(spark, """
        SELECT a, b, coalesce(v, 0) AS v FROM (
          SELECT a, b, v FROM t
          ORDER BY a WITH FILL FROM 1 TO 3, b WITH FILL FROM 1 TO 3)
    """, {"t": df})
    got = sorted((r.a, r.b, r.v) for r in out.collect())
    # TO is exclusive (CH contract): grid = {1,2}×{1,2}; the real row
    # (2, 3) sits outside the fill range and is still preserved
    assert got == [(1, 1, 11), (1, 2, 0), (2, 1, 0), (2, 2, 0),
                   (2, 3, 23)]


def test_with_totals_appends_global_row(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "k string, v int")
    out = with_totals(df, ["k"], ["SUM(v) AS sv"])
    rows = {r.k: r.sv for r in out.collect()}
    # totals key cell = String type default '' (CH pre-group_by_use_nulls)
    assert rows == {"a": 3, "b": 3, "": 6}


def test_limit_with_ties_keeps_ties(spark):
    df = spark.createDataFrame([(1,), (1,), (2,), (2,), (3,)], "v int")
    out = limit_with_ties(df, [F.col("v")], n=3)
    # rank()<=3: both 1s (rank 1) and both 2s (rank 3) stay; 3 (rank 5) drops
    assert sorted(r.v for r in out.collect()) == [1, 1, 2, 2]


def test_sample_by_key_deterministic(spark):
    df = spark.range(0, 10000).withColumnRenamed("id", "k")
    a = sorted(r.k for r in sample_by_key(df, "k", 0.1).collect())
    b = sorted(r.k for r in sample_by_key(df, "k", 0.1).collect())
    assert a == b                      # repeatable (CH SAMPLE guarantee)
    assert 500 < len(a) < 1500         # ≈10%
    # OFFSET window is disjoint
    c = set(r.k for r in sample_by_key(df, "k", 0.1, offset=0.1).collect())
    assert not (set(a) & c)


def test_array_join_zips_multiple_arrays(spark):
    df = spark.createDataFrame(
        [Row(a=[1, 2], b=["x", "y"]), Row(a=[], b=[])])
    out = array_join(df, {"ai": "a", "bi": "b"})
    got = sorted((r.ai, r.bi) for r in out.collect())
    assert got == [(1, "x"), (2, "y")]   # zipped, not cross-producted
    left = array_join(df, {"ai": "a"}, left=True)
    assert left.count() == 3             # empty-array row kept with NULL
