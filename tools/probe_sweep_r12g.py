"""Round-12 probe sweep G: timezone argument plumbing, DateTime64
arithmetic and subsecond handling, parseDateTime syntax matrix, SELECT
modifier chains, ORDER BY ALL, misc clause edges."""
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
        print(f"{tag}: ERR {type(e).__name__}: {str(e)[:120]}")


import datetime as _dt  # noqa: E402

DT = _dt.datetime

# timezone plumbing
run("todt_tz", "SELECT toDateTime('2024-01-01 00:00:00', 'Asia/Tokyo') "
    "IS NOT NULL AS x", [(True,)])
run("tostring_tz", "SELECT toString(toDateTime('2024-01-01 12:00:00'), "
    "'UTC') AS s")
run("totimezone", "SELECT toTimeZone(toDateTime("
    "'2024-01-01 12:00:00'), 'UTC') IS NOT NULL AS x", [(True,)])
run("timezoneof", "SELECT timeZoneOf(now()) AS tz")
run("servertz", "SELECT timezone() AS tz, serverTimeZone() AS stz")
run("tz_offset", "SELECT timeZoneOffset(toDateTime("
    "'2024-01-01 12:00:00')) AS o")

# DateTime64 subsecond
run("dt64_parse", "SELECT toDateTime64('2024-01-02 03:04:05.123', 3) AS t",
    [(DT(2024, 1, 2, 3, 4, 5, 123000),)])
run("dt64_ms", "SELECT toUnixTimestamp64Milli(toDateTime64("
    "'2024-01-02 03:04:05.123', 3)) % 1000 AS ms", [(123,)])
run("dt64_add", "SELECT toDateTime64('2024-01-02 03:04:05.123', 3) "
    "+ INTERVAL 1 SECOND AS t", [(DT(2024, 1, 2, 3, 4, 6, 123000),)])
run("dt64_diff", "SELECT dateDiff('millisecond', "
    "toDateTime64('2024-01-02 03:04:05.000', 3), "
    "toDateTime64('2024-01-02 03:04:05.123', 3)) AS d", [(123,)])
run("dt64_tostring", "SELECT toString(toDateTime64("
    "'2024-01-02 03:04:05.123', 3)) AS s", [("2024-01-02 03:04:05.123",)])
run("from_unix_milli", "SELECT fromUnixTimestamp64Milli(1704164645123) "
    "AS t", [(DT(2024, 1, 2, 3, 4, 5, 123000),)])
run("now64_scale", "SELECT now64(3) IS NOT NULL AS x", [(True,)])
run("ms_component", "SELECT toMillisecond(toDateTime64("
    "'2024-01-02 03:04:05.123', 3)) AS ms", [(123,)])

# parseDateTime matrix
run("pdt_joda", "SELECT parseDateTimeInJodaSyntax("
    "'2024-01-02 03:04:05', 'yyyy-MM-dd HH:mm:ss') AS t",
    [(DT(2024, 1, 2, 3, 4, 5),)])
run("pdt_pct_j", "SELECT parseDateTime('2024 60', '%Y %j') AS t",
    [(DT(2024, 2, 29),)])
run("pdt_ampm", "SELECT parseDateTime('2024-01-02 03:04 PM', "
    "'%Y-%m-%d %h:%i %p') AS t", [(DT(2024, 1, 2, 15, 4),)])
run("pdt_or_zero", "SELECT parseDateTimeOrZero('bad', '%Y') AS t",
    [(DT(1970, 1, 1),)])
run("pdt_or_null", "SELECT parseDateTimeOrNull('bad', '%Y') AS t",
    [(None,)])
run("pdt_best_us", "SELECT parseDateTimeBestEffortUS('1/31/2024') AS t",
    [(DT(2024, 1, 31),)])
run("pdt_iso8601", "SELECT parseDateTimeBestEffort("
    "'2024-01-02T03:04:05Z') AS t", [(DT(2024, 1, 2, 3, 4, 5),)])
run("fmt_pct_f", "SELECT formatDateTime(toDateTime64("
    "'2024-01-02 03:04:05.123', 3), '%F %T.%f') AS s")

# SELECT modifier chains
run("apply_chain", "SELECT * APPLY (sum) FROM "
    "(SELECT 1 AS a, 2 AS b)", [(1, 2)])
run("apply_two", "SELECT * APPLY (x -> x + 1) APPLY (sum) FROM "
    "(SELECT 1 AS a, 2 AS b)", [(2, 3)])
run("except_replace", "SELECT * EXCEPT (b) REPLACE (a * 10 AS a) FROM "
    "(SELECT 1 AS a, 2 AS b, 3 AS c)", [(10, 3)])
run("columns_re", "SELECT COLUMNS('^l') FROM "
    "(SELECT 1 AS left1, 2 AS left2, 3 AS right1)", [(1, 2)])
run("order_by_all", "SELECT number % 2 AS a, number AS b FROM numbers(4) "
    "ORDER BY ALL", [(0, 0), (0, 2), (1, 1), (1, 3)])
run("group_by_all", "SELECT number % 2 AS g, count() AS c FROM "
    "numbers(4) GROUP BY ALL ORDER BY g", [(0, 2), (1, 2)])
run("select_except_strict", "SELECT * EXCEPT STRICT (nope) FROM "
    "(SELECT 1 AS a)")

# clause edges
run("having_no_group", "SELECT sum(number) AS s FROM numbers(10) "
    "HAVING s > 40", [(45,)])
run("having_no_group_empty", "SELECT sum(number) AS s FROM numbers(10) "
    "HAVING s > 100", [])
run("where_true_const", "SELECT count() FROM numbers(5) WHERE 1", [(5,)])
run("where_false_const", "SELECT count() FROM numbers(5) WHERE 0", [(0,)])
run("qualify", "SELECT * FROM (SELECT number AS n FROM numbers(4)) "
    "QUALIFY row_number() OVER (ORDER BY n) <= 2", [(0,), (1,)])
run("limit_frac", "SELECT count() FROM (SELECT number FROM numbers(10) "
    "LIMIT 3)", [(3,)])
run("offset_only", "SELECT number FROM numbers(5) ORDER BY number "
    "OFFSET 3", [(3,), (4,)])
run("fetch_first", "SELECT number FROM numbers(5) ORDER BY number "
    "FETCH FIRST 2 ROWS ONLY", [(0,), (1,)])
run("distinct_on_expr", "SELECT DISTINCT ON (number % 2) number FROM "
    "numbers(4) ORDER BY number % 2, number", [(0,), (1,)])
run("array_join_func", "SELECT arrayJoin([1, 2]) + 10 AS x",
    [(11,), (12,)])
run("two_array_joins", "SELECT arrayJoin([1, 2]) AS a, "
    "arrayJoin([10, 20]) AS b ORDER BY a, b")
