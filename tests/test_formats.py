"""Format registry round-trips (SURVEY §2.2 FORMAT surface)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clickhouse_from_scratch_spark.sources import FORMATS, read_format, write_format
from clickhouse_from_scratch_spark.sources.formats import to_pretty, to_tab_separated


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", None)],
        "id long, s string, v double")


ROUNDTRIP = ["Parquet", "ORC", "CSVWithNames", "TabSeparatedWithNames",
             "JSONEachRow"]


@pytest.mark.parametrize("fmt", ROUNDTRIP)
def test_roundtrip(spark, sample, tmp_path, fmt):
    dest = str(tmp_path / fmt)
    write_format(sample, fmt, dest)
    schema = "id long, s string, v double"
    back = read_format(spark, fmt, dest, schema=schema)
    got = sorted((r.id, r.s, r.v) for r in back.collect())
    assert got == [(1, "a", 1.5), (2, "b", 2.5), (3, "c", None)]


def test_avro_roundtrip_or_skip(spark, sample, tmp_path):
    # spark-avro is a separate artifact; gate on availability
    dest = str(tmp_path / "avro")
    try:
        write_format(sample, "Avro", dest)
    except Exception as e:
        pytest.skip(f"avro jar not on classpath: {str(e)[:60]}")
    back = read_format(spark, "Avro", dest)
    assert back.count() == 3


def test_compression_codecs(spark, sample, tmp_path):
    for codec, ext in [("gzip", ".csv.gz"), ("none", ".csv")]:
        dest = str(tmp_path / f"c_{codec}")
        write_format(sample, "CSVWithNames", dest, compression=codec)
        assert any(f.endswith(ext) for f in os.listdir(dest))


def test_format_null_discards(sample):
    write_format(sample, "Null", "ignored_path")   # executes, writes nothing
    assert not os.path.exists("ignored_path")


def test_pretty_and_tsv_renderers(sample):
    pretty = to_pretty(sample.orderBy("id"))
    lines = pretty.split("\n")
    # CH PrettyCompact box grid: ┌─id─┬─…─┐ / │ … │ / └───┴───┘
    assert lines[0].startswith("┌─id─") and lines[0].endswith("─┐")
    assert lines[-1].startswith("└─") and lines[-1].endswith("─┘")
    assert "│ 1.5" in pretty or "1.5 │" in pretty
    assert "ᴺᵁᴸᴸ" in pretty              # sample has a NULL score cell
    tsv = to_tab_separated(sample.orderBy("id"))
    lines = tsv.split("\n")
    assert lines[0] == "1\ta\t1.5"
    assert lines[2] == "3\tc\t"          # NULL → empty cell


def test_line_as_string(spark, tmp_path):
    p = str(tmp_path / "lines.txt")
    with open(p, "w") as f:
        f.write("first line\nsecond line\n")
    df = read_format(spark, "LineAsString", p)
    assert sorted(r[0] for r in df.collect()) == ["first line", "second line"]


def test_declared_format_inventory():
    # the §2.2 format set the engine claims (subset with live readers)
    for fmt in ["Parquet", "ORC", "Avro", "Arrow", "CSV", "CSVWithNames",
                "TabSeparated", "TSV", "TabSeparatedWithNames",
                "JSONEachRow", "LineAsString", "RawBLOB", "Null"]:
        assert fmt in FORMATS


def test_native_arrow_ipc_roundtrip(spark):
    from clickhouse_from_scratch_spark.sources import from_native, to_native
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double")
    blob = to_native(df)
    assert blob[:6] != b""            # non-empty IPC stream
    back = from_native(spark, blob)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_row_binary_roundtrip(spark):
    from datetime import date, datetime
    from clickhouse_from_scratch_spark.sources import (
        from_row_binary, to_row_binary)
    schema = ("i64 bigint, i32 int, i16 smallint, i8 tinyint, f64 double, "
              "f32 float, b boolean, s string, d date, ts timestamp")
    rows = [(2**40, -7, 300, -5, 1.25, 0.5, True, "héllo",
             date(2024, 2, 29), datetime(2024, 1, 1, 12, 30, 0)),
            (-1, 0, -1, 127, -2.5, 2.0, False, "",
             date(1970, 1, 2), datetime(1970, 1, 1, 0, 0, 1))]
    df = spark.createDataFrame(rows, schema)
    blob = to_row_binary(df)
    back = from_row_binary(spark, blob, schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, rows))


def test_row_binary_uleb128_long_string(spark):
    from clickhouse_from_scratch_spark.sources import (
        from_row_binary, to_row_binary)
    long_s = "x" * 300                 # length needs 2 ULEB128 bytes
    df = spark.createDataFrame([(long_s,)], "s string")
    back = from_row_binary(spark, to_row_binary(df), "s string")
    assert back.collect()[0].s == long_s
