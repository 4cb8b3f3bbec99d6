"""DSIR-style importance scoring (pipeline/dsir.py) — hashed n-gram
data selection per Xie et al. 2023 (Data Selection for Language Models
via Importance Resampling). The linear mode is oracle-gated in
queries.py (dsir_select_linear); these tests cover the log mode, the
bigram featurizer, score semantics, and plan shape."""

import pytest
from pyspark.sql import functions as F

from clickhouse_from_scratch_spark.pipeline.dsir import (
    dsir_score,
    dsir_select,
    featurize,
)


@pytest.fixture(scope="module")
def corpora(spark):
    raw = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "quantum flux capacitor resonance"),
         (3, "the dog sat on the rug"),
         (4, "flux resonance cavity experiment"),
         (5, "the cat and the dog")],
        "doc_id long, text string")
    target = spark.createDataFrame(
        [(101, "the cat sat"), (102, "a cat and a dog"),
         (103, "the dog ran")],
        "doc_id long, text string")
    return raw, target


def test_featurize_counts(spark):
    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    rows = featurize(df).collect()
    # two distinct tokens -> at most two buckets; counts sum to 3
    assert sum(r.cnt for r in rows) == 3
    assert 1 <= len(rows) <= 2


def test_featurize_bigrams_adds_pairs(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    uni = featurize(df, bigrams=False).agg(F.sum("cnt")).collect()[0][0]
    both = featurize(df, bigrams=True).agg(F.sum("cnt")).collect()[0][0]
    assert uni == 3
    assert both == 5        # 3 unigrams + 2 bigrams ("a b", "b c")


def test_log_score_ranks_target_like_docs_first(corpora):
    # bucket_hex=2 (256 buckets): the default 4096 is sized for real
    # corpora — on a 26-token toy corpus the +1 smoothing floor drowns
    # the signal. normalize=True (the dsir_select default) removes the
    # length bias of raw likelihood-ratio sums.
    raw, target = corpora
    got = dsir_select(raw, target, k=5, mode="log",
                      bucket_hex=2, normalize=True).collect()
    ids = [r.doc_id for r in got]
    # cat/dog/the documents must outrank the quantum-flux ones
    assert set(ids[:3]) == {1, 3, 5}
    assert set(ids[3:]) == {2, 4}
    by_id = {r.doc_id: r.score for r in got}
    assert by_id[5] > by_id[2]


def test_raw_log_sums_scale_with_length(corpora):
    # unnormalized scores are per-doc log-likelihood ratios — document
    # length scales the magnitude (why dsir_select normalizes)
    raw, target = corpora
    raw_scores = {r.doc_id: r.score for r in
                  dsir_score(raw, target, mode="log", bucket_hex=2,
                             normalize=False).collect()}
    norm_scores = {r.doc_id: r.score for r in
                   dsir_score(raw, target, mode="log", bucket_hex=2,
                              normalize=True).collect()}
    lens = {1: 6, 2: 4, 3: 6, 4: 4, 5: 5}
    for d, n in lens.items():
        assert raw_scores[d] == pytest.approx(norm_scores[d] * n)


def test_linear_score_is_integer_type(corpora):
    raw, target = corpora
    df = dsir_score(raw, target, mode="linear")
    assert df.schema["score"].dataType.simpleString() == "bigint"


def test_log_score_is_double_type(corpora):
    raw, target = corpora
    df = dsir_score(raw, target, mode="log")
    assert df.schema["score"].dataType.simpleString() == "double"


def test_bad_mode_raises(corpora):
    raw, target = corpora
    with pytest.raises(ValueError):
        dsir_score(raw, target, mode="geometric")


def test_plan_no_python_no_cartesian(spark, sf_dir):
    import os
    docs_path = os.path.join(sf_dir, "documents.parquet")
    docs = spark.read.parquet(docs_path)
    target = docs.where(F.col("source") == "src0")
    df = dsir_select(docs, target, k=20, mode="log")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    plan = df._jdf.queryExecution().explainString(jmode)
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert "CartesianProduct" not in plan
    # the bucket-weight side broadcasts into the scoring join
    assert "BroadcastExchange" in plan
    # top-k is a TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in plan


# --- SQL table-function surface ---------------------------------------------

def test_dsir_select_table_function(spark, tmp_path):
    from clickhouse_from_scratch_spark.ddl import ChSession
    s = ChSession(spark, warehouse=str(tmp_path / "wh"))
    s.execute("CREATE TABLE dtf (doc_id UInt64, text String, "
              "source String) ENGINE = Memory")
    s.execute("INSERT INTO dtf VALUES (1,'the cat sat','a'),"
              "(2,'flux capacitor','b'),(3,'the dog ran','a'),"
              "(4,'cat and dog','b')")
    rows = s.execute(
        "SELECT * FROM dsirSelect(dtf, "
        "view(SELECT * FROM dtf WHERE source = 'a'), 2)").collect()
    assert len(rows) == 2
    assert {r.doc_id for r in rows} <= {1, 2, 3, 4}


def test_pack_sequences_table_function(spark, tmp_path):
    from clickhouse_from_scratch_spark.ddl import ChSession
    s = ChSession(spark, warehouse=str(tmp_path / "wh2"))
    s.execute("CREATE TABLE ptf (doc_id UInt64, text String) "
              "ENGINE = Memory")
    s.execute("INSERT INTO ptf VALUES (1,'a b c'),(2,'d e'),(3,'f')")
    rows = s.execute(
        "SELECT doc_id, pack FROM packSequences(ptf, 4, 1) "
        "ORDER BY doc_id").collect()
    assert [r.doc_id for r in rows] == [1, 2, 3]
    # 3+2+1 tokens, budget 4: doc1 pack0, doc2 starts at 3 -> pack0,
    # doc3 starts at 5 -> pack1
    assert [r.pack for r in rows] == [0, 0, 1]


def test_domain_mix_table_function(spark, tmp_path):
    from clickhouse_from_scratch_spark.ddl import ChSession
    s = ChSession(spark, warehouse=str(tmp_path / "wh3"))
    s.execute("CREATE TABLE mtf (doc_id UInt64, text String, "
              "source String) ENGINE = Memory")
    s.execute("INSERT INTO mtf VALUES (1,'x','a'),(2,'y','b'),"
              "(3,'z','a'),(4,'w','b')")
    rows = s.execute(
        "SELECT doc_id FROM domainMix(mtf, 'a:1.0,b:0.0') "
        "ORDER BY doc_id").collect()
    assert [r.doc_id for r in rows] == [1, 3]
