"""Round-12 probe sweep H: ALTER PARTITION verbs, engine FINAL
interplay, INSERT inline-format edge cases, TTL, KILL MUTATION."""
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
        print(f"{tag}: ERR {type(e).__name__}: {str(e)[:130]}")


# partition verbs
run("mk", "CREATE TABLE pt (d Date, v UInt32) ENGINE = MergeTree "
    "PARTITION BY toYYYYMM(d) ORDER BY d")
run("fill", "INSERT INTO pt VALUES ('2024-01-05', 1), ('2024-01-06', 2), "
    "('2024-02-05', 3)")
run("drop_part", "ALTER TABLE pt DROP PARTITION 202401")
run("count_after", "SELECT count() FROM pt", [(1,)])
run("refill", "INSERT INTO pt VALUES ('2024-03-01', 9)")
run("detach_part", "ALTER TABLE pt DETACH PARTITION 202403")
run("count_detached", "SELECT count() FROM pt", [(1,)])
run("attach_part", "ALTER TABLE pt ATTACH PARTITION 202403")
run("count_attached", "SELECT count() FROM pt", [(2,)])
run("freeze", "ALTER TABLE pt FREEZE")
run("drop_detached", "ALTER TABLE pt DROP DETACHED PARTITION 202403")
run("clear_in_partition",
    "ALTER TABLE pt UPDATE v = 0 IN PARTITION 202402 WHERE 1")
run("drop_pt", "DROP TABLE pt")

# engine FINAL semantics matrix
run("mk_sum", "CREATE TABLE st (k UInt32, v UInt64) "
    "ENGINE = SummingMergeTree ORDER BY k")
run("fill_sum", "INSERT INTO st VALUES (1, 10), (1, 20), (2, 5)")
run("sum_final", "SELECT k, v FROM st FINAL ORDER BY k",
    [(1, 30), (2, 5)])
run("opt_sum", "OPTIMIZE TABLE st FINAL")
run("sum_after_opt", "SELECT k, v FROM st ORDER BY k", [(1, 30), (2, 5)])
run("drop_sum", "DROP TABLE st")
run("mk_coll", "CREATE TABLE ct (k UInt32, s Int8, v UInt32) "
    "ENGINE = CollapsingMergeTree(s) ORDER BY k")
run("fill_coll", "INSERT INTO ct VALUES (1, 1, 10), (1, -1, 10), "
    "(2, 1, 5)")
run("coll_final", "SELECT k, v FROM ct FINAL ORDER BY k", [(2, 5)])
run("drop_coll", "DROP TABLE ct")
run("mk_agg", "CREATE TABLE at (k UInt32, c AggregateFunction(count)) "
    "ENGINE = AggregatingMergeTree ORDER BY k")
run("drop_agg", "DROP TABLE at")

# INSERT inline format edges
run("mk_ins", "CREATE TABLE it (a UInt32, s String) ENGINE = Memory")
run("ins_csv_quoted", "INSERT INTO it FORMAT CSV "
    '1,"with,comma"\n2,"with""quote"')
run("check_csv", "SELECT s FROM it ORDER BY a",
    [("with,comma",), ('with"quote',)])
run("trunc_it", "TRUNCATE TABLE it")
run("ins_tsv_escape", "INSERT INTO it FORMAT TabSeparated "
    "1\ttab\\there")
run("check_tsv", "SELECT s FROM it", [("tab\there",)])
run("trunc2", "TRUNCATE TABLE it")
run("ins_values_fn", "INSERT INTO it VALUES (1 + 1, upper('abc'))")
run("check_fn", "SELECT a, s FROM it", [(2, "ABC")])
run("drop_it", "DROP TABLE it")

# TTL
run("mk_ttl", "CREATE TABLE tt (d Date, v UInt32) ENGINE = MergeTree "
    "ORDER BY d TTL d + INTERVAL 1 DAY")
run("fill_ttl", "INSERT INTO tt VALUES ('2000-01-01', 1), "
    "('2099-01-01', 2)")
run("opt_ttl", "OPTIMIZE TABLE tt FINAL")
run("ttl_check", "SELECT count() FROM tt", [(1,)])
run("drop_ttl", "DROP TABLE tt")

# KILL MUTATION
run("kill_mut", "KILL MUTATION WHERE mutation_id = 'x'")
run("show_processlist", "SHOW PROCESSLIST")
