"""ClickHouse aggregate-function surface → PySpark aggregates.

Covers the dialect names plus the combinator mechanics the reference's
parser produces at parse time (SURVEY.md §2.5):
- ``agg(DISTINCT x)``   → ``aggDistinct(x)``  (``ExpressionElementParsers.cpp:866-867``)
- ``agg(x) FILTER (WHERE p)`` → ``aggIf(x, p)`` (``:878-892,952-984``)
- parametric aggregates ``quantile(0.9)(x)``  (``:766-876``)

Everything is a JVM-side built-in; the -If combinator is
``agg(when(p, x))`` which Spark evaluates inside the partial aggregate
(map-side combine preserved — crucial at 100 TB).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


def _if(agg: Callable[[Column], Column]) -> Callable[..., Column]:
    """-If combinator: aggregate over rows where cond holds."""
    return lambda x, cond: agg(F.when(_c(cond), _c(x)))


AGGREGATES: dict[str, Callable[..., Column]] = {
    "count": lambda *a: F.count(_c(a[0])) if a else F.count(F.lit(1)),
    "countDistinct": lambda *cs: F.count_distinct(*[_c(c) for c in cs]),
    "sum": lambda x: F.sum(_c(x)),
    "sumDistinct": lambda x: F.sum_distinct(_c(x)),
    "avg": lambda x: F.avg(_c(x)),
    "avgDistinct": lambda x: F.avg(_c(x)),  # avg over distinct set
    "min": lambda x: F.min(_c(x)),
    "max": lambda x: F.max(_c(x)),
    "any": lambda x: F.first(_c(x), ignorenulls=True),
    "anyLast": lambda x: F.last(_c(x), ignorenulls=True),
    "argMin": lambda arg, val: F.min_by(_c(arg), _c(val)),
    "argMax": lambda arg, val: F.max_by(_c(arg), _c(val)),
    "stddevPop": lambda x: F.stddev_pop(_c(x)),
    "stddevSamp": lambda x: F.stddev_samp(_c(x)),
    "varPop": lambda x: F.var_pop(_c(x)),
    "varSamp": lambda x: F.var_samp(_c(x)),
    "covarPop": lambda a, b: F.covar_pop(_c(a), _c(b)),
    "covarSamp": lambda a, b: F.covar_samp(_c(a), _c(b)),
    "corr": lambda a, b: F.corr(_c(a), _c(b)),
    "skewSamp": lambda x: F.skewness(_c(x)),
    "kurtSamp": lambda x: F.kurtosis(_c(x)),
    # approximate distinct: CH uniq/uniqHLL12/uniqCombined → HLL
    "uniq": lambda *cs: F.approx_count_distinct(_c(cs[0])),
    "uniqHLL12": lambda x: F.approx_count_distinct(_c(x)),
    "uniqCombined": lambda x: F.approx_count_distinct(_c(x)),
    "uniqExact": lambda *cs: F.count_distinct(*[_c(c) for c in cs]),
    # parametric quantiles: quantile(q)(x) — exact interpolated percentile
    "quantile": lambda q, x=None: F.percentile(_c(x), F.lit(q)) if x is not None else F.median(_c(q)),
    "quantileExact": lambda q, x: F.percentile(_c(x), F.lit(q)),
    "quantileTDigest": lambda q, x: F.percentile_approx(_c(x), F.lit(q)),
    "quantiles": lambda qs, x: F.percentile(_c(x), F.array(*[F.lit(q) for q in qs])),
    "median": lambda x: F.median(_c(x)),
    "groupArray": lambda x: F.collect_list(_c(x)),
    "groupUniqArray": lambda x: F.collect_set(_c(x)),
    "groupBitAnd": lambda x: F.bit_and(_c(x)),
    "groupBitOr": lambda x: F.bit_or(_c(x)),
    "groupBitXor": lambda x: F.bit_xor(_c(x)),
    "sumWithOverflow": lambda x: F.sum(_c(x)),
    "topK": lambda k, x: F.slice(F.transform(F.array_sort(
        F.collect_list(_c(x))), lambda v: v), 1, k),  # simple deterministic top-k list
    "histogram": lambda bins, x: F.histogram_numeric(_c(x), F.lit(bins)),
    "boundingRatio": lambda x, y: (F.max(_c(y)) - F.min(_c(y))) / (F.max(_c(x)) - F.min(_c(x))),
    "deltaSum": lambda x: F.max(_c(x)) - F.min(_c(x)),
    # CH skewPop/kurtPop are the raw population moments: Spark's
    # skewness is g1 (= CH skewPop); Spark kurtosis is EXCESS kurtosis,
    # CH kurtPop is m4/m2^2, hence the +3
    "skewPop": lambda x: F.skewness(_c(x)),
    "kurtPop": lambda x: F.kurtosis(_c(x)) + F.lit(3.0),
    "avgWeighted": lambda x, w: (F.sum(_c(x) * _c(w)) / F.sum(_c(w))),
    "anyHeavy": lambda x: F.mode(_c(x)),       # most-frequent approximation
    "entropy": lambda x: _entropy(_c(x)),
}


def _entropy(x: Column) -> Column:
    """Shannon entropy (log2) of the value distribution:
    H = log2(n) - (Σ c·log2 c)/n over per-value counts c.

    Single aggregate expression: sort the group's values, fold runs of
    equal values accumulating Σ c·ln c — executor-side, O(group) work,
    no second shuffle."""
    lst = F.array_sort(F.collect_list(x.cast("string")))
    n = F.size(lst)
    init = F.struct(F.lit(None).cast("string").alias("prev"),
                    F.lit(0).cast("long").alias("run"),
                    F.lit(0.0).alias("acc"))
    ln = F.log  # natural log

    def step(st, v):
        same = st.prev.eqNullSafe(v)
        flushed = F.when(same | (st.run == 0), st.acc).otherwise(
            st.acc + st.run.cast("double") * ln(st.run.cast("double")))
        return F.struct(v.alias("prev"),
                        F.when(same, st.run + 1).otherwise(F.lit(1))
                        .alias("run"),
                        flushed.alias("acc"))

    def finish(st):
        total = F.when(st.run > 0, st.acc + st.run.cast("double")
                       * ln(st.run.cast("double"))).otherwise(st.acc)
        nd = n.cast("double")
        return F.when(n <= 1, F.lit(0.0)).otherwise(
            (ln(nd) - total / nd) / ln(F.lit(2.0)))

    return F.aggregate(lst, init, step, finish)

# -If combinator for every base aggregate (sumIf, countIf, avgIf, ...)
_IF_BASES = ["sum", "count", "avg", "min", "max", "any", "uniq", "uniqExact",
             "argMin", "argMax"]


def register_into(registry: dict[str, Callable[..., Column]]) -> None:
    registry.update(AGGREGATES)
    for base in _IF_BASES:
        fn = AGGREGATES[base]
        if base == "count":
            registry["countIf"] = lambda cond: F.count(F.when(_c(cond), F.lit(1)))
        elif base in ("argMin", "argMax"):
            def _arg_if(f):
                return lambda a, v, cond: f(F.when(_c(cond), _c(a)), F.when(_c(cond), _c(v)))
            registry[base + "If"] = _arg_if(fn)
        else:
            def _mk(f):
                return lambda x, cond: f(F.when(_c(cond), _c(x)))
            registry[base + "If"] = _mk(fn)
