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


def test_pii_counts_and_scrub_cross_engine(spark):
    """PII regexes must behave identically in Spark (Java regex) and the
    DuckDB oracle (RE2): counts AND the scrubbed text fingerprint agree on
    text that actually CONTAINS PII (the fixture corpus has none, so the
    driver gate alone would never catch a dialect drift)."""
    import duckdb
    import pandas as pd

    from airflow_pipelines_from_mongo_to_postgres_spark.plans.llmdata import _pii_sql

    rows = [
        (0, "contact Bob.Smith+spam@example.co.uk or 555-867-5309 today"),
        (1, "server at 10.0.255.7 and backup at 192.168.1.1 port 8080"),
        (2, "call +1 415 555 2671 x99; mail root@localhost.localdomain"),
        (3, "no sensitive content whatsoever in this row"),
        (4, "a@b.io a@b.io twice, and 123.456.789.012 looks like an ip"),
    ]
    sdf = spark.createDataFrame(rows, ["doc_id", "text"])
    counts = T.pii_counts("text")
    got = {
        r.doc_id: (r.n_emails, r.n_phones, r.n_ipv4, r.fp)
        for r in sdf.select(
            "doc_id",
            counts["email"].alias("n_emails"),
            counts["phone"].alias("n_phones"),
            counts["ipv4"].alias("n_ipv4"),
            F.md5(T.scrub_pii("text")).alias("fp"),
        ).collect()
    }

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = {r[0]: tuple(r[1:]) for r in con.execute(
        _pii_sql().replace("scrubbed_fp", "fp")).fetchall()}
    assert got == want
    assert got[0][0] == 1 and got[0][1] >= 1     # email + phone found
    assert got[1][2] == 2                        # two IPv4s
    assert got[3] == (0, 0, 0, got[3][3])        # clean row stays clean
