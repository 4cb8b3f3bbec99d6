"""Round-12 probe sweep F: ALTER mutation matrix, system tables,
EXPLAIN forms, CREATE variants, misc DDL interplay."""
import os

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
from clickhouse_from_scratch_spark.session import get_spark  # noqa: E402
from clickhouse_from_scratch_spark.ddl import ChSession  # noqa: E402

spark = get_spark()
eng = ChSession(spark)


def run(tag, sql, expect=None):
    try:
        df = eng.execute(sql)
        out = [tuple(r) for r in df.collect()] if df is not None else "Ok."
        flag = ""
        if expect is not None:
            flag = " OK" if out == expect else f" MISMATCH want {expect}"
        print(f"{tag}: {out}{flag}")
    except Exception as e:
        print(f"{tag}: ERR {type(e).__name__}: {str(e)[:140]}")


# ALTER matrix
run("mk", "CREATE TABLE alt12 (a UInt32, b String) ENGINE = MergeTree "
    "ORDER BY a")
run("fill", "INSERT INTO alt12 VALUES (1, 'x'), (2, 'y'), (3, 'z')")
run("add_col", "ALTER TABLE alt12 ADD COLUMN c UInt8 DEFAULT 7")
run("add_col_after", "ALTER TABLE alt12 ADD COLUMN d String AFTER a")
run("describe1", "SELECT name FROM (DESCRIBE alt12)")
run("sel_after_add", "SELECT a, c FROM alt12 ORDER BY a LIMIT 1",
    [(1, 7)])
run("rename_col", "ALTER TABLE alt12 RENAME COLUMN b TO bb")
run("sel_renamed", "SELECT bb FROM alt12 ORDER BY a LIMIT 1", [("x",)])
run("modify_col", "ALTER TABLE alt12 MODIFY COLUMN c UInt64")
run("comment_col", "ALTER TABLE alt12 COMMENT COLUMN c 'my comment'")
run("clear_col", "ALTER TABLE alt12 CLEAR COLUMN d")
run("alter_update", "ALTER TABLE alt12 UPDATE bb = 'upd' WHERE a = 2")
run("sel_upd", "SELECT bb FROM alt12 WHERE a = 2", [("upd",)])
run("alter_delete", "ALTER TABLE alt12 DELETE WHERE a = 3")
run("count_after_del", "SELECT count() FROM alt12", [(2,)])
run("drop_col", "ALTER TABLE alt12 DROP COLUMN d")
run("mat_col", "ALTER TABLE alt12 ADD COLUMN m UInt32 MATERIALIZED a * 10")
run("sel_mat", "SELECT m FROM alt12 WHERE a = 1", [(10,)])
run("alter_order", "ALTER TABLE alt12 MODIFY ORDER BY (a, bb)")
run("alter_ttl", "ALTER TABLE alt12 MODIFY TTL a")
run("drop12", "DROP TABLE alt12")

# lightweight DELETE
run("mk2", "CREATE TABLE del12 (a UInt32) ENGINE = MergeTree ORDER BY a")
run("fill2", "INSERT INTO del12 SELECT number FROM numbers(10)")
run("lw_delete", "DELETE FROM del12 WHERE a >= 5")
run("count_lw", "SELECT count() FROM del12", [(5,)])
run("drop2", "DROP TABLE del12")

# system tables
run("sys_tables", "SELECT count() >= 0 AS x FROM system.tables", [(True,)])
run("sys_columns", "SELECT count() >= 0 AS x FROM system.columns",
    [(True,)])
run("sys_databases", "SELECT count() >= 1 AS x FROM system.databases",
    [(True,)])
run("sys_functions", "SELECT count() > 900 AS x FROM system.functions",
    [(True,)])
run("sys_numbers", "SELECT number FROM system.numbers LIMIT 3",
    [(0,), (1,), (2,)])
run("sys_one", "SELECT dummy FROM system.one", [(0,)])
run("sys_settings", "SELECT count() > 400 AS x FROM system.settings",
    [(True,)])
run("sys_parts", "SELECT count() >= 0 AS x FROM system.parts", [(True,)])
run("sys_processes", "SELECT count() >= 0 AS x FROM system.processes")
run("sys_formats", "SELECT count() > 10 AS x FROM system.formats")
run("sys_table_functions", "SELECT count() > 5 AS x FROM "
    "system.table_functions")
run("sys_aggregate_function_combinators",
    "SELECT count() > 5 AS x FROM system.aggregate_function_combinators")

# EXPLAIN forms
run("explain_plain", "EXPLAIN SELECT 1")
run("explain_plan", "EXPLAIN PLAN SELECT 1")
run("explain_pipeline", "EXPLAIN PIPELINE SELECT 1")
run("explain_estimate", "EXPLAIN ESTIMATE SELECT * FROM numbers(10)")
run("explain_querytree", "EXPLAIN QUERY TREE SELECT 1")
run("explain_ast_short", "EXPLAIN AST SELECT 1 + 1")

# CREATE variants
run("ctas", "CREATE TABLE ct12 ENGINE = MergeTree ORDER BY tuple() AS "
    "SELECT number AS n FROM numbers(3)")
run("ctas_count", "SELECT count() FROM ct12", [(3,)])
run("cor_table", "CREATE OR REPLACE TABLE ct12 (z UInt8) "
    "ENGINE = MergeTree ORDER BY z")
run("cor_check", "SELECT count() FROM ct12", [(0,)])
run("create_like", "CREATE TABLE ct13 AS ct12")
run("like_schema", "SELECT name FROM (DESCRIBE ct13)", [("z",)])
run("drop_ct", "DROP TABLE IF EXISTS ct12")
run("drop_ct13", "DROP TABLE IF EXISTS ct13")

# comment + IF NOT EXISTS interplay
run("mk_ine", "CREATE TABLE IF NOT EXISTS ine12 (a UInt8) "
    "ENGINE = Memory")
run("mk_ine2", "CREATE TABLE IF NOT EXISTS ine12 (b UInt8) "
    "ENGINE = Memory")
run("ine_schema", "SELECT name FROM (DESCRIBE ine12)", [("a",)])
run("drop_ine", "DROP TABLE ine12")
