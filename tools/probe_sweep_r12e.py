"""Round-12 probe sweep E: aggregate-combinator matrix tail (-Resample,
-OrDefault/-OrNull stacking, -Distinct, -SimpleState/-State/-Merge),
dictionary functions (dictGet family), window tail (lagInFrame,
nonNegativeDerivative), quantile variants."""
import os

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
from clickhouse_from_scratch_spark.session import get_spark  # noqa: E402
from clickhouse_from_scratch_spark.ddl import ChSession  # noqa: E402

spark = get_spark()
eng = ChSession(spark)


def run(tag, sql, expect=None):
    try:
        out = [tuple(r) for r in eng.execute(sql).collect()]
        flag = ""
        if expect is not None:
            flag = " OK" if out == expect else f" MISMATCH want {expect}"
        print(f"{tag}: {out}{flag}")
    except Exception as e:
        print(f"{tag}: ERR {type(e).__name__}: {str(e)[:140]}")


# combinators
run("resample", "SELECT countResample(0, 10, 5)(number) AS r "
    "FROM numbers(10)", [(([5, 5]),)])
run("sum_resample", "SELECT sumResample(0, 6, 3)(number, number) AS r "
    "FROM numbers(6)", [([3, 12],)])
run("or_default", "SELECT sumOrDefault(number) AS s FROM numbers(10) "
    "WHERE number > 100", [(0,)])
run("or_null", "SELECT sumOrNull(number) AS s FROM numbers(10) "
    "WHERE number > 100", [(None,)])
run("max_or_default_if", "SELECT maxOrDefaultIf(number, number > 100) AS m "
    "FROM numbers(10)", [(0,)])
run("avg_distinct", "SELECT avgDistinct(x) AS a FROM "
    "(SELECT arrayJoin([1, 1, 2]) AS x)", [(1.5,)])
run("sum_distinct_if", "SELECT sumDistinctIf(x, x > 0) AS s FROM "
    "(SELECT arrayJoin([1, 1, 2, -5]) AS x)", [(3,)])
run("count_distinct_comb", "SELECT countDistinct(x) AS c FROM "
    "(SELECT arrayJoin([1, 1, 2]) AS x)", [(2,)])
run("array_comb", "SELECT sumArray(a) AS s FROM "
    "(SELECT [1, 2] AS a UNION ALL SELECT [3])", [(6,)])
run("array_if_comb", "SELECT sumArrayIf(a, length(a) > 1) AS s FROM "
    "(SELECT [1, 2] AS a UNION ALL SELECT [3])", [(3,)])
run("foreach", "SELECT sumForEach(a) AS s FROM "
    "(SELECT [1, 2] AS a UNION ALL SELECT [10, 20])", [([11, 22],)])
run("state_merge", "SELECT sumMerge(s) AS t FROM "
    "(SELECT sumState(number) AS s FROM numbers(5) "
    "UNION ALL SELECT sumState(number) FROM numbers(3))", [(13,)])
run("simple_state", "SELECT sumSimpleState(number) AS s FROM numbers(4)",
    [(6,)])
run("merge_state",
    "SELECT sumMerge(ms) AS t FROM (SELECT sumMergeState(s) AS ms FROM "
    "(SELECT sumState(number) AS s FROM numbers(5)))", [(10,)])
run("agg_thing", "SELECT initializeAggregation('sumState', 5) IS NOT NULL "
    "AS x", [(True,)])
run("finalize", "SELECT finalizeAggregation(initializeAggregation("
    "'sumState', 5)) AS v", [(5,)])

# quantile variants
run("q_tdigest", "SELECT quantileTDigest(0.5)(number) AS q "
    "FROM numbers(101)", [(50.0,)])
run("q_bfloat", "SELECT quantileBFloat16(0.5)(number) < 101 AS q "
    "FROM numbers(101)", [(True,)])
run("q_det", "SELECT quantileDeterministic(0.5)(number, number) AS q "
    "FROM numbers(101)", [(50.0,)])
run("q_interpolated", "SELECT quantileInterpolatedWeighted(0.5)"
    "(number, 1) AS q FROM numbers(101)", [(50.0,)])
run("quantiles_multi", "SELECT quantiles(0.25, 0.5)(number) AS q "
    "FROM numbers(101)", [([25.0, 50.0],)])
run("median_alias", "SELECT median(number) AS m FROM numbers(101)",
    [(50.0,)])
run("quantile_gk", "SELECT quantileGK(100, 0.5)(number) AS q "
    "FROM numbers(101)")

# dictGet family (needs CREATE DICTIONARY)
run("dict_mk", "CREATE DICTIONARY d12 (k UInt64, v String DEFAULT 'na') "
    "PRIMARY KEY k SOURCE(CLICKHOUSE(TABLE 'd12_src')) LAYOUT(FLAT()) "
    "LIFETIME(0)")
run("dict_src", "CREATE TABLE d12_src (k UInt64, v String) "
    "ENGINE = MergeTree ORDER BY k")
run("dict_fill", "INSERT INTO d12_src VALUES (1, 'one'), (2, 'two')")
run("dict_get", "SELECT dictGet('d12', 'v', toUInt64(1)) AS v")
run("dict_get_default", "SELECT dictGetOrDefault('d12', 'v', "
    "toUInt64(99), 'missing') AS v")
run("dict_has", "SELECT dictHas('d12', toUInt64(1)) AS h, "
    "dictHas('d12', toUInt64(99)) AS h2")
run("dict_get_or_null", "SELECT dictGetOrNull('d12', 'v', "
    "toUInt64(99)) AS v")
run("dict_drop", "DROP DICTIONARY IF EXISTS d12")
run("dict_src_drop", "DROP TABLE IF EXISTS d12_src")

# window tail
run("lag_in_frame", "SELECT number, lagInFrame(number, 1, -1) "
    "OVER (ORDER BY number ROWS BETWEEN UNBOUNDED PRECEDING AND "
    "CURRENT ROW) AS l FROM numbers(3) ORDER BY number",
    [(0, -1), (1, 0), (2, 1)])
run("lead_in_frame", "SELECT number, leadInFrame(number, 1, -1) "
    "OVER (ORDER BY number ROWS BETWEEN CURRENT ROW AND "
    "UNBOUNDED FOLLOWING) AS l FROM numbers(3) ORDER BY number",
    [(0, 1), (1, 2), (2, -1)])
run("nonneg_deriv", "SELECT nonNegativeDerivative(v, t) OVER "
    "(ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS d "
    "FROM (SELECT toDateTime('2024-01-01 00:00:00') + number AS t, "
    "number * 2.0 AS v FROM numbers(3)) ORDER BY d")
run("running_acc", "SELECT number, runningAccumulate(s) AS r FROM "
    "(SELECT number, sumState(number) AS s FROM numbers(3) "
    "GROUP BY number ORDER BY number)")
# aliases/edge
run("first_last_value", "SELECT first_value(number) OVER "
    "(ORDER BY number) AS f, last_value(number) OVER (ORDER BY number "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS l "
    "FROM numbers(3) LIMIT 1", [(0, 2)])
run("dense_rank_pct", "SELECT percent_rank() OVER (ORDER BY number) AS p "
    "FROM numbers(3) ORDER BY p LIMIT 1", [(0.0,)])
