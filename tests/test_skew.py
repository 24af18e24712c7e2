"""salted_join: output parity with a plain join, salt-bucket scattering,
and drop_near_duplicates keeper policy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.operators import dedup
from airflow_pipelines_from_mongo_to_postgres_spark.operators.skew import salted_join


@pytest.fixture()
def skewed(spark):
    # one hot key (k=1: 60 rows) + a uniform tail
    big = spark.createDataFrame(
        [(1, i) for i in range(60)] + [(k, 0) for k in range(2, 22)],
        ["k", "payload"])
    small = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(1, 22)], ["kk", "attr"])
    return big, small


def test_salted_inner_matches_plain_join(spark, skewed):
    big, small = skewed
    plain = big.join(small, big.k == small.kk).select("k", "payload", "attr")
    salted = salted_join(big, small, "k", "kk").select("k", "payload", "attr")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_keeps_unmatched(spark, skewed):
    big, small = skewed
    big2 = big.union(spark.createDataFrame([(999, 7)], ["k", "payload"]))
    out = salted_join(big2, small, "k", "kk", how="left")
    orphan = out.filter(F.col("k") == 999).collect()
    assert len(orphan) == 1 and orphan[0].attr is None


def test_salted_join_scatters_hot_key(spark, skewed):
    big, small = skewed
    # the hot key's rows must occupy more than one salt bucket
    salts = big.withColumn(
        "s", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8))) \
        .filter(F.col("k") == 1).select("s").distinct().count()
    assert salts > 1


def test_salted_join_rejects_unsupported_how(spark, skewed):
    big, small = skewed
    with pytest.raises(ValueError):
        salted_join(big, small, "k", "kk", how="full")


def test_drop_near_duplicates_min_id_keeper(spark):
    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "watches from the warm windowsill in the late afternoon sun")
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, base + " tail"),
         (3, "entirely different text about query planning and shuffles")],
        ["doc_id", "text"])
    kept = {r.doc_id for r in
            dedup.drop_near_duplicates(docs, "doc_id", "text", 0.5).collect()}
    assert kept == {0, 3}  # 1 and 2 drop against keeper 0


@pytest.fixture()
def hot_shingle_corpus(spark):
    # Every doc shares one hot trigram ("alpha beta gamma", df = 12); the
    # tails are pairwise-distinct. The hot posting list alone would fan the
    # inverted-index self-join out to 12·11/2 = 66 candidate pairs.
    rows = [(i, f"alpha beta gamma word{i} item{i} thing{i} tail{i}")
            for i in range(12)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_max_df_bounds_posting_lists(spark, hot_shingle_corpus):
    # After pruning, no shingle's posting list may exceed max_df — the
    # join fan-out is bounded by Σ|posting ≤ max_df|² regardless of how
    # hot the hottest shingle is.
    pruned = dedup._shingle_table(hot_shingle_corpus, "doc_id", "text",
                                  n=3, max_df=5)
    top = (pruned.groupBy("shingle").count()
           .agg(F.max("count").alias("m")).collect()[0].m)
    assert top is not None and top <= 5
    unpruned = dedup._shingle_table(hot_shingle_corpus, "doc_id", "text", n=3)
    hot_df = (unpruned.groupBy("shingle").count()
              .agg(F.max("count").alias("m")).collect()[0].m)
    assert hot_df == 12  # the fixture really does carry a hot shingle


def test_max_df_kills_hot_shingle_pair_blowup(spark, hot_shingle_corpus):
    # Unpruned: the hot shingle manufactures all 66 pairs (jaccard 1/9
    # each, above a 0.05 threshold). Pruned: the only shared shingle is
    # gone, so no candidate pairs survive at all.
    unpruned = dedup.jaccard_pairs(hot_shingle_corpus, "doc_id", "text",
                                   threshold=0.05, n=3)
    assert unpruned.count() == 66
    pruned = dedup.jaccard_pairs(hot_shingle_corpus, "doc_id", "text",
                                 threshold=0.05, n=3, max_df=5)
    assert pruned.count() == 0


def test_precomputed_stop_shingle_inventory_reused(spark, hot_shingle_corpus):
    # The production pattern: the q59-style inventory is materialized once
    # per corpus snapshot and passed in — same result as inline max_df
    # counting, without the second shingle pass inside every dedup job.
    inline = dedup.jaccard_pairs(hot_shingle_corpus, "doc_id", "text",
                                 threshold=0.05, n=3, max_df=5)
    inventory = (dedup._shingle_table(hot_shingle_corpus, "doc_id", "text", n=3)
                 .groupBy("shingle").count().filter(F.col("count") > 5)
                 .select("shingle"))
    reused = dedup.jaccard_pairs(hot_shingle_corpus, "doc_id", "text",
                                 threshold=0.05, n=3, stop_shingles=inventory)
    assert sorted(map(tuple, reused.collect())) == \
        sorted(map(tuple, inline.collect()))
