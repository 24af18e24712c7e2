"""Targeted property tests for the round-4 corpus-mechanics operators
(q92 quantization, q93 bloom decontamination, q94 stratified sample,
q95 cross-source matrix, q96 KL divergence). The cross-engine value
gates live in the oracle sweep; these tests pin the operator-level
invariants the hash gate can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.plans import llmdata


@pytest.fixture(autouse=True)
def _fresh_caches():
    llmdata.clear_caches()
    yield
    llmdata.clear_caches()


def test_quantization_error_bounded_by_half_step(spark, sf_dir):
    """Symmetric int8 quantization's per-element error is at most half a
    step (scale/2), so MSE <= scale^2/4 for every vector."""
    out = llmdata.q92_embedding_quantization(spark, sf_dir).collect()
    assert out, "fixture has embeddings"
    for r in out:
        assert r.n_dims == 64
        assert r.mse <= (r.scale ** 2) / 4 + 1e-12, r
        assert r.mse >= 0


def test_quantization_zero_vector_is_lossless(spark):
    e = spark.createDataFrame(
        [Row(vec_id=1, embedding=[0.0] * 8),
         Row(vec_id=2, embedding=[1.0, -1.0, 0.5, 0.25, 0.0, 0.0, 0.0, 0.0])])

    v = e.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    s = v.select("vec_id", "emb",
                 (F.array_max(F.transform("emb", F.abs)) / F.lit(127.0)).alias("scale"))
    per = s.select("vec_id", "scale", F.explode("emb").alias("x"))
    qv = F.when(F.col("scale") == 0, F.lit(0)) \
        .otherwise(F.round(F.col("x") / F.col("scale"), 0).cast("int"))
    err = F.col("x") - qv.cast("double") * F.col("scale")
    rows = per.select("vec_id", (err * err).alias("sq")).groupBy("vec_id") \
        .agg(F.sum("sq").alias("sse")).collect()
    by_id = {r.vec_id: r.sse for r in rows}
    assert by_id[1] == 0.0  # all-zero vector survives the scale=0 guard
    assert by_id[2] >= 0.0


def test_bloom_has_no_false_negatives(spark, sf_dir):
    """Every exact contamination hit must also be a bloom hit — Bloom
    filters can only err toward false positives."""
    out = llmdata.q93_bloom_decontamination(spark, sf_dir).collect()
    assert out
    for r in out:
        if r.exact_hit:
            assert r.bloom_hit, f"false negative on doc {r.doc_id}"


def test_stratified_sample_is_deterministic_and_balanced(spark):
    # 3 sources with counts 300 / 60 / 30: quota = 3/5 * 30 = 18 docs per
    # source in expectation; the heavy source must be cut ~16x harder.
    rows = [Row(doc_id=i, source="big", text="t") for i in range(300)]
    rows += [Row(doc_id=1000 + i, source="mid", text="t") for i in range(60)]
    rows += [Row(doc_id=2000 + i, source="small", text="t") for i in range(30)]
    d = spark.createDataFrame(rows)

    import airflow_pipelines_from_mongo_to_postgres_spark.plans.llmdata as m
    orig = m.load_table
    m.load_table = lambda s, t, sf: d
    try:
        a = m.q94_stratified_sample(spark, "ignored")
        got = {r.source: c for r, c in
               [(x, x.n) for x in a.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
                .collect()]}
        again = m.q94_stratified_sample(spark, "ignored").collect()
    finally:
        m.load_table = orig
    # deterministic re-run
    assert sorted((r.doc_id for r in again)) == sorted(r.doc_id for r in a.collect())
    # every stratum lands near the common quota of 18 (binomial spread)
    for src, n in got.items():
        assert 6 <= n <= 30, (src, n, got)


def test_cross_source_matrix_is_upper_triangular(spark, sf_dir):
    out = llmdata.q95_cross_source_dups(spark, sf_dir).collect()
    assert out, "fixture has near-dup pairs"
    for r in out:
        assert r.src_a <= r.src_b
        assert r.n_pairs >= 1
        assert 0.0 <= r.mean_jaccard <= 1.0


def test_kl_divergence_nonnegative_and_zero_for_identical(spark, sf_dir):
    out = llmdata.q96_source_kl_divergence(spark, sf_dir).collect()
    assert out
    for r in out:
        # Gibbs: KL >= 0, up to the 9dp term rounding
        assert r.kl_divergence >= -1e-6, r

    # single-source corpus: source dist == corpus dist -> KL == 0
    d = spark.createDataFrame(
        [Row(doc_id=i, source="only", text="a b c a") for i in range(4)])
    import airflow_pipelines_from_mongo_to_postgres_spark.plans.llmdata as m
    orig = m.load_table
    m.load_table = lambda s, t, sf: d
    try:
        rows = m.q96_source_kl_divergence(spark, "ignored").collect()
    finally:
        m.load_table = orig
    assert len(rows) == 1 and abs(rows[0].kl_divergence) < 1e-9


def test_bm25_ranked_and_bounded(spark, sf_dir):
    """BM25 output is sorted by score desc with doc_id tiebreak, scores
    are positive, and matched_terms never exceeds the query size."""
    rows = llmdata.q97_bm25_search(spark, sf_dir).collect()
    assert 0 < len(rows) <= llmdata._BM25_TOPK
    keys = [(-r.bm25, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert r.bm25 > 0
        assert 1 <= r.matched_terms <= len(llmdata._BM25_TERMS)


def test_weighted_sample_deterministic_and_weight_monotonic(spark, sf_dir):
    """Two runs agree row-for-row, keys are non-positive, and raising a
    document's weight can only raise its exponential key (ln(u) < 0 is
    divided by a LARGER w)."""
    a = llmdata.q100_weighted_sample(spark, sf_dir).collect()
    b = llmdata.q100_weighted_sample(spark, sf_dir).collect()
    assert a == b and len(a) == llmdata._WS_K
    assert all(r.es_key <= 0 for r in a)

    d = spark.range(50).select(
        F.col("id").alias("doc_id"), F.lit(100).alias("n_chars"))
    u = (F.conv(F.substring(F.md5(F.concat(F.lit("ws:"),
                                           F.col("doc_id").cast("string"))), 1, 7),
                16, 10).cast("long") + F.lit(1)).cast("double") \
        / F.lit(1 << 28).cast("double")
    k_small = F.log(u) / F.lit(100.0)
    k_big = F.log(u) / F.lit(1000.0)
    for r in d.select((k_big >= k_small).alias("mono")).collect():
        assert r.mono


def test_graph_clustering_invariants(spark, sf_dir):
    """Local clustering coefficients live in [0, 1]; per-apex triangle
    counts sum to 3x the global triangle count (each triangle has three
    apexes); every listed node has degree >= 1."""
    rows = llmdata.q101_graph_clustering(spark, sf_dir).collect()
    assert rows
    total_apex = 0
    for r in rows:
        assert r.degree >= 1
        total_apex += r.triangles
        if r.clustering_coeff is not None:
            assert 0.0 <= r.clustering_coeff <= 1.0
        max_tri = r.degree * (r.degree - 1) // 2
        assert r.triangles <= max_tri
    assert total_apex % 3 == 0


def test_count_min_never_undercounts(spark, sf_dir):
    """The CMS guarantee: estimate >= true count for every probed token,
    and the overcount is bounded by eps * stream length (e/w) with high
    probability — checked loosely at 3x the epsilon bound."""
    rows = llmdata.q107_count_min(spark, sf_dir).collect()
    assert len(rows) == llmdata._CMS_PROBE_K
    for r in rows:
        assert r.cms_estimate >= r.true_count, r
        # loose sanity on the overcount: heavy hitters collide with at
        # most the tail, which is << their own mass in a Zipf stream
        assert r.cms_estimate <= 2 * r.true_count + 10_000, r


def test_bigram_backoff_hand_computed(spark):
    """r16: bigram Stupid-Backoff scores against a hand-computed tiny
    corpus — seen bigrams take c(w1,w2)/c(w1) with CONTEXT counts
    (conditionals sum to 1 per context), unseen take
    0.4 * c(w2)/N with the 0.5 half-count OOV floor; the backoff rate
    counts unseen bigrams. LM trained only on the flagged docs."""
    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b b"), (3, "a b x")],
        "doc_id long, text string")
    out = llmdata.bigram_backoff_scores(docs, F.col("doc_id") != 3)
    got = {r["doc_id"]: (r["n_bigrams"], r["mean_lp"], r["bo_rate"])
           for r in out.collect()}
    # train bigrams: (a,b)x2 (b,a) (a,c) (b,b); ctx a:3 b:2;
    # train unigrams a:3 b:3 c:1, N=7
    # d1: ln(2/3) + ln(1/2) + ln(1/3) over 3
    assert got[1] == (3, -0.732408, 0.0)
    # d2: ln(2/3) + ln(1/2) over 2
    assert got[2] == (2, -0.549306, 0.0)
    # d3: (a,b) seen ln(2/3); (b,x) unseen, x OOV: ln(0.4 * 0.5/7)
    assert got[3] == (2, -1.980407, 0.5)
    # single-token / empty docs yield no bigrams and no output row
    short = spark.createDataFrame([(1, "a b"), (2, "solo"), (3, "")],
                                  "doc_id long, text string")
    out2 = llmdata.bigram_backoff_scores(short, F.lit(True))
    assert {r["doc_id"] for r in out2.collect()} == {1}
