"""Round-13 fixes.

Verdict items: SETTINGS parsed AFTER FORMAT with pushdown
(ParserQueryWithOutput.cpp:103-130), histogram(N)(x) emitting the
public (lower, upper, height) Float64 triple contract, and
BACKUP/RESTORE per-element ``AS``/``INTO`` rename
(ParserBackupQuery.cpp:107-119).

Advice items: sumKahan double fallback outside the DECIMAL(38,18)
range, INSERT pre-lex FORMAT split falling back when the head doesn't
parse (comments), CustomSeparatedWithNames header placed after
result_before and joined by row_between, %j padded on format and
lenient on parse, QUALIFY over non-selected source columns, empty
VALUES in INSERT INTO FUNCTION.

Nits: toTypeName(::JSON) = 'JSON', DROP PARTITION tuple() on an
unpartitioned table scoping to everything (partition id ``all``)."""

import math

import pytest

from clickhouse_from_scratch_spark.ddl import ChSession
from clickhouse_from_scratch_spark.plans.engine import execute_sql
from clickhouse_from_scratch_spark.plans.statements import parse_statement


@pytest.fixture()
def sess(spark, tmp_path):
    return ChSession(spark, warehouse=str(tmp_path / "wh"))


# --- SETTINGS after FORMAT --------------------------------------------------

def test_settings_after_format_parses(sess):
    rows = sess.execute("SELECT 1 FORMAT CSV SETTINGS max_threads=1") \
               .collect()
    assert [r.output for r in rows] == ["1"]


def test_settings_after_format_pushdown(sess):
    # settings land in the SELECT like QueryWithOutputSettingsPushDown
    rows = sess.execute(
        "SELECT number FROM numbers(5) FORMAT CSV SETTINGS limit=2") \
        .collect()
    assert [r.output for r in rows] == ["0", "1"]


def test_settings_after_format_custom_separated(sess):
    sess.execute("CREATE TABLE sfc (a UInt32, b String) ENGINE = Memory")
    sess.execute("INSERT INTO sfc VALUES (1,'x'),(2,'y')")
    rows = sess.execute(
        "SELECT * FROM sfc ORDER BY a FORMAT CustomSeparated "
        "SETTINGS format_custom_field_delimiter='|'").collect()
    assert [r.output for r in rows] == ["1|x", "2|y"]
    # per-query settings don't leak into the session
    assert "format_custom_field_delimiter" not in sess.settings


def test_settings_before_format_still_works(sess):
    rows = sess.execute(
        "SELECT 1 AS x SETTINGS max_threads=1 FORMAT JSONEachRow") \
        .collect()
    assert [r.output for r in rows] == ['{"x":1}']


def test_settings_after_format_ast(sess):
    node = parse_statement("SELECT 1 FORMAT CSV SETTINGS max_threads=1")
    assert node.format == "CSV"
    assert node.settings == {"max_threads": 1}
    assert node.query.settings == {"max_threads": 1}


# --- histogram triple contract ----------------------------------------------

def test_histogram_triples(spark):
    rows = execute_sql(
        spark, "SELECT histogram(3)(number) AS h FROM numbers(20)",
        {}).collect()
    h = rows[0].h
    assert len(h) == 3
    for lo, up, height in h:
        assert isinstance(lo, float)
        assert isinstance(up, float)
        assert isinstance(height, float)
        assert lo <= up
    # bins tile left-to-right: each upper is the next bin's lower
    for i in range(len(h) - 1):
        assert h[i][1] == pytest.approx(h[i + 1][0])
    assert sum(t[2] for t in h) == pytest.approx(20.0)


def test_histogram_schema_is_float64_triple(spark):
    df = execute_sql(
        spark, "SELECT histogram(5)(number) AS h FROM numbers(100)", {})
    assert df.schema["h"].dataType.simpleString() == \
        "array<struct<lower:double,upper:double,height:double>>"


# --- BACKUP/RESTORE element rename ------------------------------------------

def test_restore_table_as_new_name(sess, tmp_path):
    sess.execute("CREATE TABLE bt0 (a UInt32) ENGINE = MergeTree ORDER BY a")
    sess.execute("INSERT INTO bt0 VALUES (7),(8)")
    sess.execute(f"BACKUP TABLE bt0 TO '{tmp_path}/bk1'")
    sess.execute(f"RESTORE TABLE bt0 AS bt0r FROM '{tmp_path}/bk1'")
    assert sorted(r.a for r in
                  sess.execute("SELECT a FROM bt0r").collect()) == [7, 8]
    sess.execute(f"RESTORE TABLE bt0 INTO bt0i FROM '{tmp_path}/bk1'")
    assert sorted(r.a for r in
                  sess.execute("SELECT a FROM bt0i").collect()) == [7, 8]


def test_backup_table_as_parses(sess, tmp_path):
    sess.execute("CREATE TABLE bt1 (a UInt32) ENGINE = MergeTree ORDER BY a")
    sess.execute("INSERT INTO bt1 VALUES (1)")
    sess.execute(f"BACKUP TABLE bt1 AS bt1x TO '{tmp_path}/bk2'")


def test_restore_database_as_new_name(sess, tmp_path):
    sess.execute("CREATE DATABASE dbo")
    sess.execute(
        "CREATE TABLE dbo.t (a UInt32) ENGINE = MergeTree ORDER BY a")
    sess.execute("INSERT INTO dbo.t VALUES (3)")
    sess.execute(f"BACKUP DATABASE dbo TO '{tmp_path}/bk3'")
    sess.execute(f"RESTORE DATABASE dbo AS dbn FROM '{tmp_path}/bk3'")
    assert [r.a for r in
            sess.execute("SELECT a FROM dbn.t").collect()] == [3]


# --- sumKahan decimal-range guard -------------------------------------------

def test_sum_kahan_exact_small(spark):
    rows = execute_sql(
        spark,
        "SELECT sumKahan(x) AS s FROM (SELECT 0.1 AS x FROM numbers(10))",
        {}).collect()
    assert rows[0].s == 1.0


def test_sum_kahan_large_values_fall_back_to_double(spark):
    # |x| >= 1e18 overflows DECIMAL(38,18); the group sums as double
    rows = execute_sql(
        spark,
        "SELECT sumKahan(x) AS s "
        "FROM (SELECT toFloat64(1e20) AS x FROM numbers(3))",
        {}).collect()
    assert rows[0].s == pytest.approx(3e20)


def test_sum_kahan_nan_propagates(spark):
    rows = execute_sql(
        spark,
        "SELECT sumKahan(x) AS s "
        "FROM (SELECT number/0.0 AS x FROM numbers(1))", {}).collect()
    assert math.isnan(rows[0].s)


def test_sum_kahan_all_null_is_null(spark):
    rows = execute_sql(
        spark,
        "SELECT sumKahan(x) AS s "
        "FROM (SELECT toFloat64OrNull('a') AS x FROM numbers(2))",
        {}).collect()
    assert rows[0].s is None


def test_sum_kahan_mixed_large_and_small(spark):
    rows = execute_sql(
        spark,
        "SELECT sumKahan(x) AS s FROM "
        "(SELECT if(number = 0, 1e20, 1.0) AS x FROM numbers(3))",
        {}).collect()
    assert rows[0].s == pytest.approx(1e20 + 2.0)


# --- INSERT pre-lex split vs comments ---------------------------------------

def test_insert_with_format_in_block_comment(sess):
    sess.execute("CREATE TABLE ic1 (a UInt32) ENGINE = Memory")
    sess.execute("INSERT INTO ic1 /* FORMAT CSV */ VALUES (1)")
    assert [r.a for r in
            sess.execute("SELECT a FROM ic1").collect()] == [1]


def test_insert_with_format_in_line_comment(sess):
    sess.execute("CREATE TABLE ic2 (a UInt32) ENGINE = Memory")
    sess.execute("INSERT INTO ic2 -- FORMAT CSV\n VALUES (2)")
    assert [r.a for r in
            sess.execute("SELECT a FROM ic2").collect()] == [2]


def test_insert_format_raw_data_still_splits(sess):
    sess.execute("CREATE TABLE ic3 (a UInt32, b String) ENGINE = Memory")
    sess.execute("INSERT INTO ic3 FORMAT CSV\n1,x\n2,y")
    assert sorted((r.a, r.b) for r in
                  sess.execute("SELECT * FROM ic3").collect()) == \
        [(1, "x"), (2, "y")]


# --- CustomSeparatedWithNames header placement ------------------------------

def test_custom_separated_with_names_header_after_result_before(sess):
    sess.execute("CREATE TABLE cs1 (a UInt32, b String) ENGINE = Memory")
    sess.execute("INSERT INTO cs1 VALUES (1,'x'),(2,'y')")
    for k, v in [("format_custom_result_before_delimiter", "<R>"),
                 ("format_custom_result_after_delimiter", "</R>"),
                 ("format_custom_row_between_delimiter", ","),
                 ("format_custom_row_before_delimiter", "["),
                 ("format_custom_row_after_delimiter", "]"),
                 ("format_custom_field_delimiter", ";")]:
        sess.execute(f"SET {k} = '{v}'")
    rows = sess.execute(
        "SELECT * FROM cs1 ORDER BY a FORMAT CustomSeparatedWithNames") \
        .collect()
    text = "\n".join(r.output for r in rows)
    # result_before FIRST, then the header as row 0 joined by
    # row_between — not header-then-result_before
    assert text == "<R>[a;b],[1;x],[2;y]</R>"


# --- %j both directions ------------------------------------------------------

def test_format_date_time_j_is_padded(spark):
    rows = execute_sql(
        spark,
        "SELECT formatDateTime(toDate('2020-01-05'), '%j') AS j",
        {}).collect()
    assert rows[0].j == "005"


def test_parse_date_time_j_lenient(spark):
    rows = execute_sql(
        spark,
        "SELECT parseDateTime('2020 365', '%Y %j') AS a, "
        "parseDateTime('2020 005', '%Y %j') AS b", {}).collect()
    assert rows[0].a.month == 12 and rows[0].a.day == 30   # leap year
    assert rows[0].b.month == 1 and rows[0].b.day == 5


# --- QUALIFY over non-selected source columns --------------------------------

def test_qualify_non_selected_column(sess):
    sess.execute(
        "CREATE TABLE qv (user_id UInt32, ts UInt32) "
        "ENGINE = MergeTree ORDER BY ts")
    sess.execute("INSERT INTO qv VALUES (1,10),(1,5),(2,7)")
    rows = sess.execute(
        "SELECT user_id FROM qv "
        "QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts) = 1"
    ).collect()
    assert sorted(r.user_id for r in rows) == [1, 2]


def test_qualify_non_selected_column_subquery(spark):
    rows = execute_sql(
        spark,
        "SELECT user_id FROM (SELECT number AS user_id, number*2 AS ts "
        "FROM numbers(5)) QUALIFY row_number() OVER (ORDER BY ts) = 1",
        {}).collect()
    assert [r.user_id for r in rows] == [0]


# --- empty VALUES into table function ---------------------------------------

def test_insert_into_function_empty_values(sess):
    sess.execute("INSERT INTO FUNCTION null('x UInt8') VALUES")


# --- toTypeName of a JSON cast ----------------------------------------------

def test_totypename_json_cast(spark):
    rows = execute_sql(
        spark,
        "SELECT toTypeName(CAST('{}', 'JSON')) AS t, "
        "toTypeName('{}'::JSON) AS t2", {}).collect()
    assert rows[0].t == "JSON"
    assert rows[0].t2 == "JSON"


# --- DROP PARTITION tuple() on an unpartitioned table ------------------------

def test_drop_partition_tuple_unpartitioned(sess):
    sess.execute(
        "CREATE TABLE up1 (a UInt32) ENGINE = MergeTree ORDER BY a")
    sess.execute("INSERT INTO up1 VALUES (1),(2)")
    sess.execute("ALTER TABLE up1 DROP PARTITION tuple()")
    assert sess.execute("SELECT count() AS c FROM up1").collect()[0].c == 0


def test_drop_partition_id_all_unpartitioned(sess):
    sess.execute(
        "CREATE TABLE up2 (a UInt32) ENGINE = MergeTree ORDER BY a")
    sess.execute("INSERT INTO up2 VALUES (1)")
    sess.execute("ALTER TABLE up2 DROP PARTITION 'all'")
    assert sess.execute("SELECT count() AS c FROM up2").collect()[0].c == 0


def test_drop_partition_value_on_partitioned_still_scoped(sess):
    sess.execute(
        "CREATE TABLE up3 (a UInt32, p UInt32) ENGINE = MergeTree "
        "PARTITION BY p ORDER BY a")
    sess.execute("INSERT INTO up3 VALUES (1,1),(2,2)")
    sess.execute("ALTER TABLE up3 DROP PARTITION 1")
    assert [r.a for r in
            sess.execute("SELECT a FROM up3").collect()] == [2]


# --- grammar sweep: TRIM(BOTH FROM), IS DISTINCT FROM, INTERVAL string ------

def test_trim_mode_from_no_char(spark):
    rows = execute_sql(
        spark,
        "SELECT TRIM(BOTH FROM ' q ') AS b, TRIM(LEADING FROM ' q ') AS l, "
        "TRIM(TRAILING FROM ' q ') AS t", {}).collect()
    assert (rows[0].b, rows[0].l, rows[0].t) == ("q", "q ", " q")


def test_is_distinct_from(spark):
    rows = execute_sql(
        spark,
        "SELECT 1 IS DISTINCT FROM NULL AS a, 1 IS DISTINCT FROM 1 AS b, "
        "NULL IS NOT DISTINCT FROM NULL AS c, "
        "1 IS NOT DISTINCT FROM 2 AS d", {}).collect()
    assert tuple(rows[0]) == (True, False, True, False)


def test_interval_string_form(spark):
    rows = execute_sql(
        spark,
        "SELECT toDate('2024-01-01') + INTERVAL '1 day' AS d1, "
        "toDateTime('2024-01-01 00:00:00') + INTERVAL '1 day 2 hours' AS d2",
        {}).collect()
    assert str(rows[0].d1).startswith("2024-01-02")
    assert str(rows[0].d2) == "2024-01-02 02:00:00"


def test_interval_plain_form_still_works(spark):
    rows = execute_sql(
        spark,
        "SELECT toDate('2024-01-01') + INTERVAL 2 DAY AS d", {}).collect()
    assert str(rows[0].d) == "2024-01-03"


# --- UNDROP TABLE (drop-trash window) ---------------------------------------

def test_undrop_table_roundtrip(sess):
    sess.execute("CREATE TABLE ud1 (a UInt32) ENGINE = MergeTree ORDER BY a")
    sess.execute("INSERT INTO ud1 VALUES (5),(6)")
    sess.execute("DROP TABLE ud1")
    with pytest.raises(Exception):
        sess.execute("SELECT * FROM ud1")
    sess.execute("UNDROP TABLE ud1")
    assert sorted(r.a for r in
                  sess.execute("SELECT a FROM ud1").collect()) == [5, 6]


def test_undrop_refused_when_name_reused(sess):
    sess.execute("CREATE TABLE ud2 (a UInt32) ENGINE = MergeTree ORDER BY a")
    sess.execute("INSERT INTO ud2 VALUES (1)")
    sess.execute("DROP TABLE ud2")
    sess.execute("CREATE TABLE ud2 (a UInt32) ENGINE = MergeTree ORDER BY a")
    sess.execute("INSERT INTO ud2 VALUES (9)")
    with pytest.raises(ValueError):
        sess.execute("UNDROP TABLE ud2")
    assert [r.a for r in sess.execute("SELECT a FROM ud2").collect()] == [9]


def test_undrop_unknown_raises(sess):
    with pytest.raises(ValueError):
        sess.execute("UNDROP TABLE never_existed")


def test_undrop_memory_table(sess):
    sess.execute("CREATE TABLE ud3 (a UInt32) ENGINE = Memory")
    sess.execute("INSERT INTO ud3 VALUES (2)")
    sess.execute("DROP TABLE ud3")
    sess.execute("UNDROP TABLE ud3")
    assert [r.a for r in sess.execute("SELECT a FROM ud3").collect()] == [2]


# --- RENAME DATABASE --------------------------------------------------------

def test_rename_database(sess):
    sess.execute("CREATE DATABASE rdb1")
    sess.execute(
        "CREATE TABLE rdb1.t (a UInt32) ENGINE = MergeTree ORDER BY a")
    sess.execute("INSERT INTO rdb1.t VALUES (3)")
    sess.execute("RENAME DATABASE rdb1 TO rdb1x")
    assert [r.a for r in
            sess.execute("SELECT a FROM rdb1x.t").collect()] == [3]
    with pytest.raises(Exception):
        sess.execute("SELECT * FROM rdb1.t")


def test_rename_database_guards(sess):
    with pytest.raises(ValueError):
        sess.execute("RENAME DATABASE default TO other")
    with pytest.raises(ValueError):
        sess.execute("RENAME DATABASE no_such_db TO x")


# --- ALTER ... MATERIALIZE --------------------------------------------------

def test_materialize_column_recomputes_current_default(sess):
    sess.execute("CREATE TABLE mz1 (a UInt32, b UInt32 DEFAULT a * 2) "
                 "ENGINE = MergeTree ORDER BY a")
    sess.execute("INSERT INTO mz1 (a) VALUES (1),(2)")
    assert sorted((r.a, r.b) for r in
                  sess.execute("SELECT a, b FROM mz1").collect()) == \
        [(1, 2), (2, 4)]
    sess.execute("ALTER TABLE mz1 MODIFY COLUMN b UInt32 DEFAULT a * 10")
    sess.execute("ALTER TABLE mz1 MATERIALIZE COLUMN b")
    assert sorted((r.a, r.b) for r in
                  sess.execute("SELECT a, b FROM mz1").collect()) == \
        [(1, 10), (2, 20)]


def test_materialize_column_unknown_raises(sess):
    sess.execute("CREATE TABLE mz2 (a UInt32) ENGINE = MergeTree ORDER BY a")
    with pytest.raises(ValueError):
        sess.execute("ALTER TABLE mz2 MATERIALIZE COLUMN nope")


def test_materialize_ttl_and_index(sess):
    sess.execute("CREATE TABLE mz3 (a UInt32) ENGINE = MergeTree ORDER BY a")
    sess.execute("INSERT INTO mz3 VALUES (1)")
    sess.execute("ALTER TABLE mz3 MATERIALIZE TTL")   # no TTL: no-op
    assert sess.execute("SELECT count() AS c FROM mz3").collect()[0].c == 1
    with pytest.raises(ValueError):
        sess.execute("ALTER TABLE mz3 MATERIALIZE INDEX nope")


# --- arrayLevenshteinDistance (pure-JVM nested-aggregate DP) ----------------

def test_array_levenshtein_distance(spark):
    rows = execute_sql(
        spark,
        "SELECT arrayLevenshteinDistance([1,2,4],[1,2,3]) AS a, "
        "arrayLevenshteinDistance([1,2,3],[1,3]) AS b, "
        "arrayLevenshteinDistance([],[1,2]) AS c, "
        "arrayLevenshteinDistance([1,2,3],[1,2,3]) AS d, "
        "arrayLevenshteinDistance(['a','b'],['b','a']) AS e", {}).collect()
    assert tuple(rows[0]) == (1.0, 1.0, 2.0, 0.0, 2.0)


# --- analysisOfVariance (one-way ANOVA) -------------------------------------

def test_anova_f_statistic_exact(spark):
    rows = execute_sql(
        spark,
        "SELECT analysisOfVariance(v, g) AS a FROM ("
        "SELECT number % 3 AS g, number % 3 * 100 + number AS v "
        "FROM numbers(30))", {}).collect()
    f, p = rows[0].a
    assert f == pytest.approx(1236.4848484848485)
    assert p < 1e-6


def test_anova_no_effect(spark):
    rows = execute_sql(
        spark,
        "SELECT anova(v, g) AS a FROM ("
        "SELECT toUInt8(number % 2) AS g, number % 5 AS v "
        "FROM numbers(20))", {}).collect()
    f, p = rows[0].a
    assert f == pytest.approx(0.0)
    assert p == pytest.approx(1.0)


# --- toWeek/toYearWeek modes 8/9 (week contains January 1) ------------------

def test_toweek_mode_9(spark):
    rows = execute_sql(
        spark,
        "SELECT toWeek(toDate('2016-12-27'), 9) AS w9, "
        "toYearWeek(toDate('2016-12-27'), 9) AS yw9, "
        "toWeek(toDate('2016-01-01'), 9) AS jan, "
        "toWeek(toDate('2016-12-25'), 9) AS mid, "
        "toWeek(toDate('2016-12-27'), 0) AS w0", {}).collect()
    r = rows[0]
    # the week of Mon 2016-12-26 contains 2017-01-01 -> week 1 of 2017
    assert (r.w9, r.yw9, r.jan, r.mid, r.w0) == (1, 201701, 1, 52, 52)


# --- wordShingle/ngram SimHash/MinHash scalar family ------------------------

def test_word_shingle_simhash_family(spark):
    rows = execute_sql(
        spark,
        "SELECT wordShingleSimHash('a b c d e f') = "
        "wordShingleSimHash('a b c d e f') AS det, "
        "wordShingleSimHashCaseInsensitive('A B c d e f') = "
        "wordShingleSimHash('a b c d e f') AS ci, "
        "bitCount(bitXor(wordShingleSimHash("
        "'the quick brown fox jumps over dog'), "
        "wordShingleSimHash('the quick brown fox jumped over dog'))) "
        "AS near, "
        "bitCount(bitXor(wordShingleSimHash('the quick brown fox'), "
        "wordShingleSimHash('entirely different text here now'))) AS far",
        {}).collect()
    r = rows[0]
    assert r.det and r.ci
    # similar texts land closer in hamming space than unrelated ones
    assert r.near < r.far


def test_ngram_minhash_tuple_shape(spark):
    rows = execute_sql(
        spark,
        "SELECT ngramMinHash('abcdef') AS t, "
        "wordShingleMinHash('a b c d e f') AS w", {}).collect()
    assert len(rows[0].t) == 2 and len(rows[0].w) == 2


# --- system tables tail ------------------------------------------------------

def test_system_mutations_records_rewrites(sess):
    sess.execute("CREATE TABLE smt (a UInt32) ENGINE = MergeTree ORDER BY a")
    sess.execute("INSERT INTO smt VALUES (1),(2),(3)")
    sess.execute("ALTER TABLE smt DELETE WHERE a = 2")
    rows = sess.execute(
        "SELECT table, command, is_done FROM system.mutations").collect()
    assert ("smt", "DELETE", 1) in {tuple(r) for r in rows}


def test_system_infra_tables_exist(sess):
    # clusters/disks/users/grants have one sensible local row; the
    # infra-only ones (merges/replicas/roles/macros) are present empty
    assert sess.execute(
        "SELECT cluster FROM system.clusters").collect()[0].cluster == \
        "default"
    d = sess.execute(
        "SELECT name, total_space FROM system.disks").collect()[0]
    assert d.name == "default" and d.total_space > 0
    assert sess.execute("SELECT name FROM system.users") \
        .collect()[0].name == "default"
    assert sess.execute(
        "SELECT access_type FROM system.grants").collect()[0] \
        .access_type == "ALL"
    for t in ("merges", "replicas", "roles", "macros", "detached_parts"):
        sess.execute(f"SELECT * FROM system.{t}").collect()


def test_system_events_counts_queries(sess):
    sess.execute("SELECT 1").collect()
    v = sess.execute("SELECT value FROM system.events "
                     "WHERE event = 'Query'").collect()[0].value
    assert v >= 1


# --- PROJECTION DDL ---------------------------------------------------------

def test_projection_lifecycle(sess):
    sess.execute(
        "CREATE TABLE pj (a UInt32, b String, "
        "PROJECTION p1 (SELECT b, sum(a) GROUP BY b)) "
        "ENGINE = MergeTree ORDER BY a")
    sess.execute("INSERT INTO pj VALUES (1,'x'),(2,'x'),(3,'y')")
    sess.execute("ALTER TABLE pj ADD PROJECTION p2 (SELECT a ORDER BY a)")
    sess.execute("ALTER TABLE pj MATERIALIZE PROJECTION p1")
    sess.execute("ALTER TABLE pj MATERIALIZE PROJECTION p2")
    sess.execute("ALTER TABLE pj DROP PROJECTION p2")
    with pytest.raises(ValueError):
        sess.execute("ALTER TABLE pj MATERIALIZE PROJECTION p2")
    with pytest.raises(ValueError):
        sess.execute("ALTER TABLE pj ADD PROJECTION p1 (SELECT a)")
    sess.execute("ALTER TABLE pj ADD PROJECTION IF NOT EXISTS p1 (SELECT a)")
    # data unaffected throughout
    assert sess.execute("SELECT count() AS c FROM pj").collect()[0].c == 3


# --- type-map tail: AggregateFunction carriers, Variant/Dynamic, geo --------

def test_type_map_tail(sess):
    for i, t in enumerate([
            "AggregateFunction(sum, UInt64)",
            "AggregateFunction(quantile(0.5), Float64)",
            "AggregateFunction(groupArray, String)",
            "Variant(UInt64, String)", "Dynamic",
            "Point", "Ring", "Polygon", "MultiPolygon"]):
        sess.execute(f"CREATE TABLE tmt{i} (c {t}) ENGINE = Memory")


def test_point_tuple_roundtrip(sess):
    sess.execute("CREATE TABLE geo1 (p Point) ENGINE = Memory")
    sess.execute("INSERT INTO geo1 VALUES ((10.5, 20.5))")
    r = sess.execute("SELECT p.1 AS x, p.2 AS y FROM geo1").collect()[0]
    assert (r.x, r.y) == (10.5, 20.5)


# --- WITH FILL STALENESS -----------------------------------------------------

def test_with_fill_staleness_doc_example(sess):
    sess.execute("CREATE TABLE wfs (k UInt32) ENGINE = Memory")
    sess.execute("INSERT INTO wfs VALUES (1),(5),(10)")
    rows = sess.execute(
        "SELECT k FROM wfs ORDER BY k WITH FILL STALENESS 3").collect()
    assert [r.k for r in rows] == [1, 2, 3, 5, 6, 7, 10, 11, 12]


def test_with_fill_staleness_interval(sess):
    sess.execute("CREATE TABLE wfd (d Date) ENGINE = Memory")
    sess.execute("INSERT INTO wfd VALUES ('2024-01-01'),('2024-01-10')")
    rows = sess.execute(
        "SELECT d FROM wfd ORDER BY d WITH FILL "
        "STALENESS INTERVAL 3 DAY").collect()
    assert [str(r.d) for r in rows] == [
        "2024-01-01", "2024-01-02", "2024-01-03",
        "2024-01-10", "2024-01-11", "2024-01-12"]


def test_with_fill_staleness_respects_to(sess):
    sess.execute("CREATE TABLE wft (k UInt32) ENGINE = Memory")
    sess.execute("INSERT INTO wft VALUES (1),(5),(10)")
    rows = sess.execute(
        "SELECT k FROM wft ORDER BY k WITH FILL FROM 1 TO 8 "
        "STALENESS 3").collect()
    assert [r.k for r in rows] == [1, 2, 3, 5, 6, 7, 10]


# --- RANGE BETWEEN INTERVAL frames ------------------------------------------

def test_range_interval_frame_timestamp(sess):
    sess.execute(
        "CREATE TABLE rif (t DateTime, v UInt32, g String) ENGINE = Memory")
    sess.execute(
        "INSERT INTO rif VALUES ('2024-01-01 00:00:00', 1, 'a'),"
        "('2024-01-01 00:05:00', 2, 'a'),('2024-01-01 01:00:00', 3, 'a')")
    rows = sess.execute(
        "SELECT v, sum(v) OVER (PARTITION BY g ORDER BY t "
        "RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW) "
        "AS s FROM rif ORDER BY t").collect()
    assert [(r.v, r.s) for r in rows] == [(1, 1), (2, 3), (3, 3)]


def test_range_interval_frame_date(sess):
    sess.execute("CREATE TABLE rid (d Date, v UInt32) ENGINE = Memory")
    sess.execute("INSERT INTO rid VALUES ('2024-01-01', 1),"
                 "('2024-01-02', 2),('2024-01-09', 3)")
    rows = sess.execute(
        "SELECT v, sum(v) OVER (ORDER BY d RANGE BETWEEN "
        "INTERVAL 3 DAY PRECEDING AND CURRENT ROW) AS s "
        "FROM rid ORDER BY d").collect()
    assert [(r.v, r.s) for r in rows] == [(1, 1), (2, 3), (3, 3)]


# --- sumForEach narrow element types + toStartOf sub-second -----------------

def test_sum_foreach_narrow_literal(spark):
    # -ForEach aggregates ACROSS ROWS position-wise; narrow (UInt8)
    # array literals must not trip the sum fold's zero literal
    rows = execute_sql(
        spark,
        "SELECT sumForEach(x) AS s FROM "
        "(SELECT arrayJoin([[1,2],[3,4]]) AS x)", {}).collect()
    assert list(rows[0].s) == [4, 6]


def test_to_start_of_subsecond(spark):
    rows = execute_sql(
        spark,
        "SELECT toStartOfMillisecond(toDateTime64("
        "'2024-01-01 12:00:00.123456', 6)) AS ms, "
        "toStartOfMicrosecond(toDateTime64("
        "'2024-01-01 12:00:00.123456', 6)) AS us", {}).collect()
    assert str(rows[0].ms) == "2024-01-01 12:00:00.123000"
    assert str(rows[0].us) == "2024-01-01 12:00:00.123456"


# --- CRC64, Hilbert curve, access introspection ------------------------------

def test_crc64_check_value(spark):
    # CRC-64/XZ check vector: crc64('123456789') = 0x995DC9BBDF1939FA
    rows = execute_sql(
        spark, "SELECT hex(crc64('123456789')) AS c", {}).collect()
    assert rows[0].c == "995DC9BBDF1939FA"


def test_hilbert_encode_decode(spark):
    rows = execute_sql(
        spark,
        "SELECT hilbertEncode(3, 4) AS h, "
        "hilbertDecode(2, 31) AS d, "
        "hilbertDecode(2, hilbertEncode(123456, 789012)) AS rt",
        {}).collect()
    assert rows[0].h == 31                      # doc example value
    assert tuple(rows[0].d) == (3, 4)
    assert tuple(rows[0].rt) == (123456, 789012)


def test_access_introspection_functions(spark):
    rows = execute_sql(
        spark,
        "SELECT currentProfiles() AS cp, currentRoles() AS cr, "
        "getOSKernelVersion() AS os, revision() AS rev, "
        "zookeeperSessionUptime() >= 0 AS zk", {}).collect()
    r = rows[0]
    assert list(r.cp) == ["default"] and list(r.cr) == []
    assert r.os.startswith("Linux") and r.rev > 0 and r.zk


# --- input format tail: NamesAndTypes, Values, TSKV, JSONStrings, arrays ----

def test_insert_tsv_with_names_and_types(sess):
    sess.execute("CREATE TABLE fnt (a UInt32, b String) ENGINE = Memory")
    sess.execute(
        "INSERT INTO fnt FORMAT TSVWithNamesAndTypes\n"
        "a\tb\nUInt32\tString\n1\tx\n2\ty")
    assert sorted((r.a, r.b) for r in
                  sess.execute("SELECT * FROM fnt").collect()) == \
        [(1, "x"), (2, "y")]


def test_insert_csv_with_names_and_types(sess):
    sess.execute("CREATE TABLE fct (a UInt32, b String) ENGINE = Memory")
    sess.execute(
        "INSERT INTO fct FORMAT CSVWithNamesAndTypes\n"
        "a,b\nUInt32,String\n2,y")
    assert [(r.a, r.b) for r in
            sess.execute("SELECT * FROM fct").collect()] == [(2, "y")]


def test_insert_format_values(sess):
    sess.execute("CREATE TABLE fv (a UInt32, b String) ENGINE = Memory")
    sess.execute("INSERT INTO fv FORMAT Values\n(1, 'x'), (2, 'y')")
    assert sorted((r.a, r.b) for r in
                  sess.execute("SELECT * FROM fv").collect()) == \
        [(1, "x"), (2, "y")]


def test_insert_format_tskv(sess):
    sess.execute("CREATE TABLE ftk (a UInt32, b String) ENGINE = Memory")
    sess.execute("INSERT INTO ftk FORMAT TSKV\na=1\tb=x\na=2\tb=y")
    assert sorted((r.a, r.b) for r in
                  sess.execute("SELECT * FROM ftk").collect()) == \
        [(1, "x"), (2, "y")]


def test_insert_json_strings_each_row(sess):
    sess.execute("CREATE TABLE fjs (a UInt32) ENGINE = Memory")
    sess.execute(
        'INSERT INTO fjs FORMAT JSONStringsEachRow\n'
        '{"a": "1"}\n{"a": "2"}')
    assert sorted(r.a for r in
                  sess.execute("SELECT a FROM fjs").collect()) == [1, 2]


def test_insert_json_compact_strings(sess):
    sess.execute("CREATE TABLE fjc (a UInt32, b String) ENGINE = Memory")
    sess.execute(
        'INSERT INTO fjc FORMAT JSONCompactStringsEachRow\n["1", "x"]')
    assert [(r.a, r.b) for r in
            sess.execute("SELECT * FROM fjc").collect()] == [(1, "x")]


def test_insert_csv_array_column(sess):
    sess.execute("CREATE TABLE fca (a Array(UInt32)) ENGINE = Memory")
    sess.execute('INSERT INTO fca FORMAT CSV\n"[1,2,3]"')
    assert list(sess.execute(
        "SELECT a FROM fca").collect()[0].a) == [1, 2, 3]


def test_insert_csv_string_array_column(sess):
    sess.execute("CREATE TABLE fcs (s Array(String)) ENGINE = Memory")
    sess.execute("INSERT INTO fcs FORMAT CSV\n\"['a','b']\"")
    assert list(sess.execute(
        "SELECT s FROM fcs").collect()[0].s) == ["a", "b"]


# --- r13 optimization: per-session catalog memos ---------------------------
# table_view/load_table/_app_id memoize per SESSION object, not per
# applicationId: temp views and SQLConf are session-scoped, so a second
# SparkSession over the same SparkContext (spark.newSession(), a pattern a
# driver harness may use) must get its own view registration and conf
# pinning. Keyed by appId this raised TABLE_OR_VIEW_NOT_FOUND on the
# second session.
def test_table_view_and_pinning_per_session(spark):
    import os

    from clickhouse_from_scratch_spark.catalog import load_table, table_view

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(sf_dir):
        import pytest
        pytest.skip("no sf0.001 testdata")
    s2 = spark.newSession()
    try:
        for s in (spark, s2):
            v = table_view(s, sf_dir, "nation")
            assert s.sql(f"SELECT count(*) AS n FROM {v}").collect()[0].n > 0
            assert s.conf.get("spark.sql.ansi.enabled") == "false"
            # the memoized DataFrame must belong to the session that asked
            assert load_table(s, sf_dir, "nation").sparkSession is s
    finally:
        pass  # s2 shares spark's context; stopping it would kill spark
