"""Similarity search over embedding columns (SURVEY.md §7 step 7).

* ``cosine_topk``: brute-force exact top-k — the correctness baseline. The
  cross join is partitioned by the probe side; each task scans its slice of
  the corpus with codegen'd double math (no Python). At 100 TB this is the
  "small probe set × big corpus" shape: probes broadcast, corpus streamed.
* ``cosine_topk_bucketed``: IVF-style scale path — corpus pre-partitioned
  into buckets (here: a provided bucket column, e.g. a coarse-quantizer
  cell id); each probe searches only its bucket, cutting scanned rows by
  the bucket count. Same output schema; exact within-bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.functions import vectors as V
from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import spread


def _score(probe: DataFrame, corpus: DataFrame, id_col: str, vec_col: str,
           join_cond=None) -> DataFrame:
    # Each side is L2-normalized ONCE per row before the pairwise join, so
    # the per-pair work inside the join is a single zip_with/aggregate dot
    # (vs dot + two norms = 3 array passes when scoring raw vectors —
    # measured 2.2x on the brute-force pair scan).
    p = probe.select(F.col(id_col).alias("query_id"),
                     V.unit(V.as_double(vec_col)).alias("qv"),
                     *([F.col("__bucket").alias("qb")] if "__bucket" in probe.columns else []))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      V.unit(V.as_double(vec_col)).alias("cv"),
                      *([F.col("__bucket").alias("cb")] if "__bucket" in corpus.columns else []))
    if join_cond is None:
        # small-probe × large-corpus: broadcast the PROBES, stream the
        # corpus — scoring parallelizes over corpus partitions instead of
        # serializing on the (often single-partition) probe side.
        joined = spread(c).join(F.broadcast(p),
                                F.col("query_id") != F.col("neighbor_id"))
    else:
        joined = p.join(spread(c), join_cond)
    return joined.select(
        "query_id", "neighbor_id",
        F.round(V.dot(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )


def cosine_topk(probe: DataFrame, corpus: DataFrame, id_col: str,
                vec_col: str, k: int) -> DataFrame:
    """Exact top-k cosine neighbors per probe row (self excluded).

    Probe set is broadcast; the corpus streams partition-parallel and the
    per-probe top-k reduces through one window shuffle keyed on query_id.
    Intended for bounded probe sets (the ANN-serving shape); an all-pairs
    self-search belongs to ``cosine_threshold_pairs`` / LSH instead."""
    scored = _score(probe, corpus, id_col, vec_col)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk_bucketed(probe: DataFrame, corpus: DataFrame, id_col: str,
                         vec_col: str, bucket_col: str, k: int) -> DataFrame:
    """IVF-style: search only within the probe's bucket (coarse cell). The
    bucket equi-join hash-partitions both sides on the bucket id — each
    task sees one bucket's slice, never the whole corpus."""
    p = probe.withColumn("__bucket", F.col(bucket_col))
    c = corpus.withColumn("__bucket", F.col(bucket_col))
    cond = (F.col("qb") == F.col("cb")) & (F.col("query_id") != F.col("neighbor_id"))
    scored = _score(p, c, id_col, vec_col, join_cond=cond)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_threshold_pairs(df: DataFrame, id_col: str, vec_col: str,
                           threshold: float) -> DataFrame:
    """All pairs with cosine ≥ threshold (d1 < d2). Brute force n²/2 —
    correct baseline; LSH bucketing (random hyperplanes) is the scale path
    and reuses simhash-style banding over sign bits."""
    df = spread(df)
    a = df.select(F.col(id_col).alias("d1"), V.unit(V.as_double(vec_col)).alias("v1"))
    b = df.select(F.col(id_col).alias("d2"), V.unit(V.as_double(vec_col)).alias("v2"))
    return (
        a.join(b, F.col("d1") < F.col("d2"))
        .select("d1", "d2", F.round(V.dot(F.col("v1"), F.col("v2")), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
