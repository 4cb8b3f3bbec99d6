"""Round-12 probe sweep A: byte-level text-format fidelity vs published
ClickHouse examples — Pretty/PrettyCompact borders+alignment, Vertical
NULL, Values, CSV composites, JSONEachRow specials."""
import os

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
from clickhouse_from_scratch_spark.session import get_spark  # noqa: E402
from clickhouse_from_scratch_spark.ddl import ChSession  # noqa: E402
from clickhouse_from_scratch_spark.sources.formats import (  # noqa: E402
    to_pretty, to_vertical, to_values, to_csv_text, to_tab_separated,
    to_json_each_row)

spark = get_spark()
eng = ChSession(spark)


def show(tag, fn, sql):
    try:
        df = eng.execute(sql)
        out = fn(df)
        print(f"=== {tag} ===\n{out}")
    except Exception as e:
        print(f"=== {tag} === ERR {type(e).__name__}: {e}")


# --- Pretty family: borders, alignment, NULL rendering
show("pretty_basic", to_pretty,
     "SELECT number AS n, concat('row', toString(number)) AS s "
     "FROM numbers(3)")
show("pretty_null", to_pretty,
     "SELECT 1 AS x, NULL AS y, toNullable('a') AS z")
show("pretty_composite", to_pretty,
     "SELECT tuple(1, 'a') AS t, [1, 2] AS arr, map('k', [1, 2]) AS m")
show("pretty_negative_align", to_pretty,
     "SELECT -1.5 AS f, 1000000 AS big, 'left' AS s")
# --- Vertical: NULL and Row separators
show("vertical_null", to_vertical,
     "SELECT 1 AS x, NULL AS y UNION ALL SELECT 2, 3")
# --- Values
show("values", to_values,
     "SELECT number AS n, concat('v', toString(number)) AS s, "
     "[number, number + 1] AS a FROM numbers(2)")
show("values_null_special", to_values,
     "SELECT NULL AS n, 'it''s' AS q, toDate('2024-01-02') AS d")
# --- CSV: arrays/tuples quoted as CH literals
show("csv_composites", lambda df: to_csv_text(df),
     "SELECT [1, 2] AS a, tuple(1, 'x,y') AS t, map('k', 1) AS m, "
     "'plain' AS s, 'has\"quote' AS q")
show("csv_null_date", lambda df: to_csv_text(df),
     "SELECT NULL AS n, toDate('2024-01-02') AS d, "
     "toDateTime('2024-01-02 03:04:05') AS dt")
# --- TSV escaping
show("tsv_escapes", to_tab_separated,
     "SELECT 'tab\\there' AS a, 'nl\\nhere' AS b, [1, 2] AS arr, "
     "tuple('a', 1) AS t")
# --- JSONEachRow: specials (nan/inf), dates, composites
show("json_specials", to_json_each_row,
     "SELECT 0/0 AS nan_v, 1/0 AS inf_v, -1/0 AS ninf_v, "
     "toDate('2024-01-02') AS d")
show("json_composites", to_json_each_row,
     "SELECT tuple(1, 'a') AS t, map('k', [1, 2]) AS m, "
     "toNullable(NULL) AS nn")
show("json_uint64_large", to_json_each_row,
     "SELECT toUInt64(18446744073709551615) AS u")
# booleans
show("pretty_bool", to_pretty, "SELECT 1 = 1 AS eq, true AS b")
show("csv_bool", lambda df: to_csv_text(df),
     "SELECT 1 = 1 AS eq, true AS b")
show("json_bool", to_json_each_row, "SELECT 1 = 1 AS eq, true AS b")
