"""WITH TOTALS block placement (r11): the totals row is NOT sorted
inline with main rows — CH's TotalsHavingTransform emits the totals as
a separate block AFTER the sorted/limited result, and the Pretty*/
Vertical renderers print it under a ``Totals:`` header.
"""

import pytest

from clickhouse_from_scratch_spark.ddl import ChSession
from clickhouse_from_scratch_spark.sources.formats import (to_pretty,
                                                           to_vertical)


@pytest.fixture()
def sess(spark, tmp_path):
    s = ChSession(spark, warehouse=str(tmp_path / "wh"))
    s.execute("CREATE TABLE tp (k Int32, v Int32) ENGINE = Memory")
    s.execute("INSERT INTO tp VALUES (0, 2), (1, 4), (0, 4)")
    return s


def test_totals_row_after_sorted_result(sess):
    rows = [(r.k, r.s) for r in sess.execute(
        "SELECT k, sum(v) AS s FROM tp GROUP BY k WITH TOTALS "
        "ORDER BY k").collect()]
    # main rows sorted by k, totals (0, 10) strictly LAST — before r11
    # it sorted inline as (0,6),(0,10),(1,4)
    assert rows == [(0, 6), (1, 4), (0, 10)]


def test_totals_row_after_desc_sort(sess):
    rows = [(r.k, r.s) for r in sess.execute(
        "SELECT k, sum(v) AS s FROM tp GROUP BY k WITH TOTALS "
        "ORDER BY k DESC").collect()]
    assert rows == [(1, 4), (0, 6), (0, 10)]


def test_totals_survives_limit(sess):
    # LIMIT applies to the main block only; the totals block is always
    # emitted (CH: LIMIT is upstream of the totals port)
    rows = [(r.k, r.s) for r in sess.execute(
        "SELECT k, sum(v) AS s FROM tp GROUP BY k WITH TOTALS "
        "ORDER BY k LIMIT 1").collect()]
    assert rows == [(0, 6), (0, 10)]


def test_totals_with_having_after_sort(sess):
    rows = [(r.k, r.s) for r in sess.execute(
        "SELECT k, sum(v) AS s FROM tp GROUP BY k WITH TOTALS "
        "HAVING s > 5 ORDER BY k").collect()]
    # after_having_exclusive recomputes totals over passing groups
    assert rows == [(0, 6), (0, 6)]


def test_rollup_totals_block_last(sess):
    rows = [(r.k, r.s) for r in sess.execute(
        "SELECT k, sum(v) AS s FROM tp GROUP BY k WITH ROLLUP "
        "WITH TOTALS ORDER BY k, s").collect()]
    # rollup rows (incl. its own grand total) sort; the TOTALS block
    # row is appended last
    assert rows == [(0, 6), (0, 10), (1, 4), (0, 10)]


def test_pretty_renders_separate_totals_box(sess):
    df = sess.execute(
        "SELECT k, sum(v) AS s FROM tp GROUP BY k WITH TOTALS ORDER BY k")
    text = to_pretty(df)
    assert "Totals:" in text
    main, totals = text.split("\n\nTotals:\n")
    assert main.count("│") == 2 * 3      # 2 main rows × 3 separators
    assert "10" in totals and "10" not in main


def test_vertical_renders_totals_block(sess):
    df = sess.execute(
        "SELECT k, sum(v) AS s FROM tp GROUP BY k WITH TOTALS ORDER BY k")
    text = to_vertical(df)
    assert "Totals:" in text
    assert text.rstrip().endswith("s: 10")


def test_totals_unsorted_still_last(sess):
    rows = [(r.k, r.s) for r in sess.execute(
        "SELECT k, sum(v) AS s FROM tp GROUP BY k WITH TOTALS").collect()]
    assert rows[-1] == (0, 10)


def test_json_format_totals_extremes_fields(sess):
    import json as _json

    from clickhouse_from_scratch_spark.sources.formats import to_json
    sess.execute("SET extremes = 1")
    df = sess.execute(
        "SELECT k, sum(v) AS s FROM tp GROUP BY k WITH TOTALS ORDER BY k")
    doc = _json.loads(to_json(df))
    # published CH JSON format: meta, data, totals, extremes, rows
    assert list(doc.keys()) == ["meta", "data", "totals", "extremes",
                                "rows"]
    assert doc["rows"] == 2 and len(doc["data"]) == 2
    assert doc["totals"]["k"] == 0
    assert doc["extremes"]["min"]["k"] == 0
    assert doc["extremes"]["max"]["k"] == 1
    sess.execute("SET extremes = 0")


def test_json_format_no_blocks_without_totals(sess):
    import json as _json

    from clickhouse_from_scratch_spark.sources.formats import to_json
    doc = _json.loads(to_json(sess.execute(
        "SELECT k, sum(v) AS s FROM tp GROUP BY k")))
    assert "totals" not in doc and "extremes" not in doc
