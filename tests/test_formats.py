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
    assert "id" in pretty and "+" in pretty and "1.5" in pretty
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
