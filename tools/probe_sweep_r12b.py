"""Round-12 probe sweep B: EXPLAIN SYNTAX fixpoint on rarely-formatted
nodes (ARRAY JOIN, ASOF USING, WINDOW clause, INTERPOLATE, LIMIT BY,
SAMPLE, set ops) and the BACKUP/RESTORE matrix (two-arg Disk, DATABASE
form, IF EXISTS interplay, overwrite)."""
import os

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
from clickhouse_from_scratch_spark.session import get_spark  # noqa: E402
from clickhouse_from_scratch_spark.ddl import ChSession  # noqa: E402

spark = get_spark()
eng = ChSession(spark)


def syntax(tag, sql):
    """EXPLAIN SYNTAX must be a fixpoint: explain(explain(q)) ==
    explain(q), and the printed SQL must itself parse + run."""
    try:
        r1 = eng.execute(f"EXPLAIN SYNTAX {sql}")
        t1 = "\n".join(r.explain for r in r1.collect())
        r2 = eng.execute(f"EXPLAIN SYNTAX {t1}")
        t2 = "\n".join(r.explain for r in r2.collect())
        fp = "FIXPOINT" if t1 == t2 else f"DIVERGES\n--1--\n{t1}\n--2--\n{t2}"
        # the rewritten text must execute
        eng.execute(t1)
        print(f"{tag}: {fp}")
        if t1 == t2:
            print(f"  text: {t1}")
    except Exception as e:
        print(f"{tag}: ERR {type(e).__name__}: {e}")


def run(tag, sql):
    try:
        df = eng.execute(sql)
        out = [tuple(r) for r in df.collect()] if df is not None else "Ok."
        print(f"{tag}: {out}")
    except Exception as e:
        print(f"{tag}: ERR {type(e).__name__}: {e}")


syntax("arrayjoin", "SELECT x FROM (SELECT [1,2] AS a) ARRAY JOIN a AS x")
syntax("left_arrayjoin",
       "SELECT x FROM (SELECT [] AS a) LEFT ARRAY JOIN a AS x")
syntax("asof_using",
       "SELECT * FROM (SELECT 1 AS k, 2 AS t) AS l "
       "ASOF JOIN (SELECT 1 AS k, 1 AS t) AS r USING (k, t)")
syntax("asof_on",
       "SELECT * FROM (SELECT 1 AS k, 2 AS t) AS l "
       "ASOF LEFT JOIN (SELECT 1 AS k, 1 AS t) AS r "
       "ON l.k = r.k AND l.t >= r.t")
syntax("window_clause",
       "SELECT number, sum(number) OVER w AS s FROM numbers(5) "
       "WINDOW w AS (ORDER BY number ROWS BETWEEN 1 PRECEDING "
       "AND CURRENT ROW)")
syntax("interpolate",
       "SELECT number AS n, number * 2 AS v FROM numbers(3) "
       "ORDER BY n WITH FILL FROM 0 TO 6 INTERPOLATE (v AS v + 1)")
syntax("limit_by",
       "SELECT number % 2 AS g, number FROM numbers(6) "
       "ORDER BY g, number LIMIT 1 OFFSET 1 BY g")
syntax("sample", "SELECT count() FROM numbers(100) SAMPLE 0.5")
syntax("setops",
       "SELECT 1 UNION DISTINCT SELECT 2 INTERSECT SELECT 2")
syntax("totals_having",
       "SELECT number % 2 AS g, sum(number) AS s FROM numbers(10) "
       "GROUP BY g WITH TOTALS HAVING s > 3")
syntax("prewhere_final",
       "SELECT number FROM numbers(5) WHERE number > 1")
syntax("with_cte",
       "WITH c AS (SELECT 1 AS x) SELECT x FROM c")
syntax("lambda_hof",
       "SELECT arrayMap(x -> x + 1, [1, 2]) AS a")
syntax("case_when",
       "SELECT CASE WHEN number > 1 THEN 'big' ELSE 'small' END AS c "
       "FROM numbers(3)")
syntax("in_tuple", "SELECT number IN (1, 3) AS f FROM numbers(4)")
syntax("distinct_on",
       "SELECT DISTINCT ON (g) g, number FROM "
       "(SELECT number % 2 AS g, number FROM numbers(4)) ORDER BY g, number")

# --- BACKUP/RESTORE matrix
run("bk_setup", "CREATE TABLE bk_t (a UInt32, s String) "
    "ENGINE = MergeTree ORDER BY a")
run("bk_fill", "INSERT INTO bk_t VALUES (1, 'x'), (2, 'y')")
run("bk_two_arg", "BACKUP TABLE bk_t TO Disk('backups', 'r12probe')")
run("bk_drop", "DROP TABLE bk_t")
run("bk_restore_two", "RESTORE TABLE bk_t FROM Disk('backups', 'r12probe')")
run("bk_check", "SELECT count() FROM bk_t")
run("bk_overwrite", "BACKUP TABLE bk_t TO Disk('backups', 'r12probe')")
run("bk_db", "CREATE DATABASE IF NOT EXISTS bkdb")
run("bk_db_t", "CREATE TABLE bkdb.t2 (a UInt32) ENGINE = MergeTree "
    "ORDER BY a")
run("bk_db_backup", "BACKUP DATABASE bkdb TO Disk('backups', 'r12db')")
run("bk_db_drop", "DROP DATABASE bkdb")
run("bk_db_restore", "RESTORE DATABASE bkdb FROM Disk('backups', 'r12db')")
run("bk_db_check", "SELECT count() FROM bkdb.t2")
run("bk_base", "BACKUP TABLE bk_t TO Disk('backups', 'r12inc') "
    "SETTINGS base_backup = Disk('backups', 'r12probe')")
run("bk_missing_restore",
    "RESTORE TABLE no_such FROM Disk('backups', 'nope')")
run("bk_file_fn", "BACKUP TABLE bk_t TO File('/tmp/r12_backup_file')")
run("bk_cleanup1", "DROP TABLE IF EXISTS bk_t")
run("bk_cleanup2", "DROP DATABASE IF EXISTS bkdb")
