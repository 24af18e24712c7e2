"""Text-analysis functions: tokenization, fingerprints, lang-ID, quality."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.functions import text as T


def test_tokens_drop_empties(spark):
    df = spark.createDataFrame([("  Hello   World  ",)], ["t"])
    assert df.select(T.tokens("t").alias("x")).collect()[0].x == ["hello", "world"]


def test_shingles_distinct_and_ordered(spark):
    df = spark.createDataFrame([("a b c d",)], ["t"])
    out = df.select(T.shingles("t", 3).alias("s")).collect()[0].s
    assert out == ["a b c", "b c d"]


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([("a b",)], ["t"])
    assert df.select(T.shingles("t", 3).alias("s")).collect()[0].s == []


def test_fingerprint_invariant_to_case_whitespace(spark):
    df = spark.createDataFrame([("Hello  World", "hello world")], ["a", "b"])
    r = df.select(T.fingerprint("a").alias("fa"),
                  T.fingerprint("b").alias("fb")).collect()[0]
    assert r.fa == r.fb


def test_lang_id_deterministic_and_covers_markers(spark):
    df = spark.createDataFrame(
        [("the data and value of a",), ("hash join scan key",)], ["t"])
    got = [r.x for r in df.select(T.lang_id("t").alias("x")).collect()]
    assert got == ["en", "zh"]


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [("the data value " * 30,), ("!!! ??? ***",), ("",)], ["t"])
    rows = df.select(T.quality_score("t").alias("q")).collect()
    assert rows[0].q is not None and rows[0].q > 0.7
    assert rows[1].q is not None and rows[1].q < 0.4


def test_token_count_bpe(spark):
    df = spark.createDataFrame([("ab, cd9!",)], ["t"])
    # [ab][,][cd][9][!] = 5
    assert df.select(T.token_count_bpe("t").alias("n")).collect()[0].n == 5


def test_hash28_range(spark):
    df = spark.createDataFrame([(f"w{i}",) for i in range(100)], ["t"])
    mx = df.select(F.max(T.hash28("t")).alias("m")).collect()[0].m
    assert 0 <= mx < (1 << 28)
