"""Similarity search: engine top-k vs numpy brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.functions import vectors as V
from airflow_pipelines_from_mongo_to_postgres_spark.operators import similarity

DIM, N = 16, 60


@pytest.fixture()
def embs(spark):
    rng = np.random.default_rng(42)
    mat = rng.normal(size=(N, DIM)).astype("float32")
    rows = [(i, mat[i].tolist(), int(i % 4)) for i in range(N)]
    return (spark.createDataFrame(rows, ["vec_id", "embedding", "label"]),
            mat.astype("float64"))


def _np_topk(mat, qid, k, mask=None):
    sims = mat @ mat[qid] / (np.linalg.norm(mat, axis=1) * np.linalg.norm(mat[qid]))
    order = [(round(-s, 6), i) for i, s in enumerate(sims)
             if i != qid and (mask is None or mask[i])]
    return [i for _, i in sorted(order)[:k]]


def test_cosine_matches_numpy(spark, embs):
    df, mat = embs
    a = df.select(V.cosine(V.as_double("embedding"),
                           V.as_double("embedding")).alias("c")).collect()
    assert all(abs(r.c - 1.0) < 1e-12 for r in a)


def test_topk_matches_bruteforce(spark, embs):
    df, mat = embs
    probe = df.filter(F.col("vec_id") < 3)
    out = similarity.cosine_topk(probe, df, "vec_id", "embedding", k=5).collect()
    got = {}
    for r in sorted(out, key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    for q in range(3):
        assert got[q] == _np_topk(mat, q, 5)


def test_bucketed_topk_stays_in_bucket(spark, embs):
    df, mat = embs
    probe = df.filter(F.col("vec_id") < 4)
    out = similarity.cosine_topk_bucketed(probe, df, "vec_id", "embedding",
                                          "label", k=3).collect()
    labels = {i: i % 4 for i in range(N)}
    for r in out:
        assert labels[r.neighbor_id] == labels[r.query_id]
    got = {}
    for r in sorted(out, key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    for q in range(4):
        mask = [labels[i] == labels[q] for i in range(N)]
        assert got[q] == _np_topk(mat, q, 3, mask)


def test_threshold_pairs_symmetric_halfspace(spark, embs):
    df, _ = embs
    pairs = similarity.cosine_threshold_pairs(df, "vec_id", "embedding", 0.5)
    rows = pairs.collect()
    assert all(r.d1 < r.d2 for r in rows)
    assert all(r.cosine >= 0.5 for r in rows)


def test_lsh_topk_recall_and_exact_rerank(spark, sf_dir):
    """Approximate path: recall vs brute force above the tuned bound, and
    every returned cosine equals the true (exact) cosine — the rerank is
    exact even when candidate generation is approximate."""
    from pyspark.sql import functions as F

    from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import (
        load_table,
    )

    e = load_table(spark, "embeddings", sf_dir)
    probe = e.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(probe, e, "vec_id", "embedding", k=5)
    approx = similarity.cosine_topk_lsh(probe, e, "vec_id", "embedding", k=5)
    erows = {(r.query_id, r.neighbor_id): r.cosine for r in exact.collect()}
    arows = {(r.query_id, r.neighbor_id): r.cosine for r in approx.collect()}
    recall = len(erows.keys() & arows.keys()) / len(erows)
    assert recall >= 0.5  # deterministic given fixed hash planes + fixtures
    all_exact = {(r.query_id, r.neighbor_id): r.cosine
                 for r in similarity.cosine_topk(probe, e, "vec_id",
                                                 "embedding", k=500).collect()}
    for pair, cos in arows.items():
        assert abs(all_exact[pair] - cos) < 1e-6


def test_ivf_topk_recall_and_exact_rerank(spark, sf_dir):
    """Trained-IVF path: recall vs brute force above the nprobe-tuned
    bound; returned cosines equal the true cosine (exact rerank)."""
    from pyspark.sql import functions as F

    from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import (
        load_table,
    )

    e = load_table(spark, "embeddings", sf_dir)
    probe = e.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(probe, e, "vec_id", "embedding", k=5)
    approx = similarity.cosine_topk_ivf(probe, e, "vec_id", "embedding",
                                        k=5, nlist=8, nprobe=3)
    erows = {(r.query_id, r.neighbor_id): r.cosine for r in exact.collect()}
    arows = {(r.query_id, r.neighbor_id): r.cosine for r in approx.collect()}
    assert len(erows.keys() & arows.keys()) / len(erows) >= 0.6
    all_exact = {(r.query_id, r.neighbor_id): r.cosine
                 for r in similarity.cosine_topk(probe, e, "vec_id",
                                                 "embedding", k=500).collect()}
    for pair, cos in arows.items():
        assert abs(all_exact[pair] - cos) < 1e-6


def test_threshold_pairs_lsh_recall_at_high_threshold(spark, embs):
    """Near-dup regime (cos >= 0.9): LSH pairs must recover nearly all
    brute-force pairs, with exact cosines (rerank is exact). Near-dups
    are planted (small perturbations of base vectors) so the exact pair
    set is non-empty and recall is actually exercised."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, DIM))
    rows = []
    for i in range(20):
        rows.append((i, base[i].tolist()))
        rows.append((100 + i, (base[i] + 0.05 * rng.normal(size=DIM)).tolist()))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = {(r.d1, r.d2): r.cosine for r in similarity
             .cosine_threshold_pairs(df, "vec_id", "embedding", 0.9).collect()}
    approx = {(r.d1, r.d2): r.cosine for r in similarity
              .cosine_threshold_pairs_lsh(df, "vec_id", "embedding", 0.9).collect()}
    assert set(approx) <= set(exact)          # precision 1 (exact rerank)
    if exact:
        assert len(set(approx) & set(exact)) / len(exact) >= 0.8
    for pair, cos in approx.items():
        assert abs(exact[pair] - cos) < 1e-6


def test_numpy_topk_equals_jvm_topk(spark, sf_dir):
    """The Arrow/BLAS path must return exactly the JVM expression path's
    result (both exact; same rounding)."""
    from pyspark.sql import functions as F

    from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import (
        load_table,
    )

    e = load_table(spark, "embeddings", sf_dir)
    probe = e.filter(F.col("vec_id") < 10)
    jvm = {(r.query_id, r.neighbor_id, r.cosine, r.rank) for r in
           similarity.cosine_topk(probe, e, "vec_id", "embedding", 5).collect()}
    nps = {(r.query_id, r.neighbor_id, r.cosine, r.rank) for r in
           similarity.cosine_topk_np(probe, e, "vec_id", "embedding", 5).collect()}
    assert jvm == nps


def test_numpy_topk_chunked_probes(spark, sf_dir):
    """batch_probes smaller than the probe set must chunk transparently
    and still equal the unchunked result."""
    from pyspark.sql import functions as F

    from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import (
        load_table,
    )

    e = load_table(spark, "embeddings", sf_dir)
    probe = e.filter(F.col("vec_id") < 10)
    whole = {(r.query_id, r.neighbor_id, r.cosine, r.rank) for r in
             similarity.cosine_topk_np(probe, e, "vec_id", "embedding", 5).collect()}
    chunked = {(r.query_id, r.neighbor_id, r.cosine, r.rank) for r in
               similarity.cosine_topk_np(probe, e, "vec_id", "embedding", 5,
                                         batch_probes=3).collect()}
    assert whole == chunked


def test_pq_topk_recall_and_exact_rerank(spark, sf_dir):
    """PQ/ADC path: recall vs brute force above the rerank-tuned bound;
    returned cosines equal the true cosine (the shortlist is ADC-ranked
    but the final scores are exact)."""
    from pyspark.sql import functions as F

    from airflow_pipelines_from_mongo_to_postgres_spark.plans._pq_codebooks import PQ_CODEBOOKS
    from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import (
        load_table,
    )

    e = load_table(spark, "embeddings", sf_dir)
    probe = e.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(probe, e, "vec_id", "embedding", k=5)
    approx = similarity.cosine_topk_pq(probe, e, "vec_id", "embedding",
                                       k=5, codebooks=PQ_CODEBOOKS,
                                       rerank=50)
    erows = {(r.query_id, r.neighbor_id): r.cosine for r in exact.collect()}
    arows = {(r.query_id, r.neighbor_id): r.cosine for r in approx.collect()}
    assert len(erows.keys() & arows.keys()) / len(erows) >= 0.6
    all_exact = {(r.query_id, r.neighbor_id): r.cosine
                 for r in similarity.cosine_topk(probe, e, "vec_id",
                                                 "embedding", k=500).collect()}
    for pair, cos in arows.items():
        assert abs(all_exact[pair] - cos) < 1e-6


def test_semantic_dedup_recall_and_keeper_policy(spark, sf_dir):
    """semantic_dedup_ivf: (a) every vector appears exactly once with a
    valid cell; (b) min-id keeper — for every within-cell pair over the
    threshold the larger id is dropped; (c) recall vs the brute-force
    pair scan: every brute pair whose members share a cell is acted on,
    and overall recall clears the tuned bound for the frozen quantizer."""
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.similarity import (
        cosine_threshold_pairs,
        semantic_dedup_ivf,
    )
    from airflow_pipelines_from_mongo_to_postgres_spark.plans._ivf_centroids import (
        IVF_CENTROIDS,
    )
    from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import load_table

    t = 0.42
    e = load_table(spark, "embeddings", "/root/testdata/sf0.01")
    out = semantic_dedup_ivf(e, "vec_id", "embedding", threshold=t,
                             centroids=IVF_CENTROIDS)
    rows = {r.vec_id: r for r in out.collect()}
    assert len(rows) == e.count()
    assert all(0 <= r.cell < len(IVF_CENTROIDS) for r in rows.values())

    brute = cosine_threshold_pairs(e, "vec_id", "embedding", t).collect()
    assert len(brute) > 0  # threshold actually fires on this fixture
    cell = {vid: r.cell for vid, r in rows.items()}
    same_cell = [(p.d1, p.d2) for p in brute if cell[p.d1] == cell[p.d2]]
    # (b)+(c): every same-cell brute pair dropped its larger id
    for d1, d2 in same_cell:
        assert not rows[d2].is_kept, (d1, d2)
    dropped = {vid for vid, r in rows.items() if not r.is_kept}
    # every drop is justified by at least one same-cell pair
    assert dropped <= {d2 for _, d2 in same_cell}
    # recall of the cell approximation on this fixture/quantizer
    recall = len(same_cell) / len(brute)
    assert recall >= 0.3, recall


def test_incremental_semantic_dedup_matches_full_recompute(spark, sf_dir):
    """standing ∪ delta == full semantic_dedup_state over the union —
    the append-batch maintenance property (embedding-space twin of the
    incremental-jaccard parity test) — and the monotone-append guard
    raises on out-of-order ids instead of silently flipping standing
    keeper verdicts."""
    import pytest

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.similarity import (
        incremental_semantic_dedup,
        semantic_dedup_state,
    )
    from airflow_pipelines_from_mongo_to_postgres_spark.plans._ivf_centroids import (
        IVF_CENTROIDS,
    )
    from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import load_table

    t = 0.42
    e = load_table(spark, "embeddings", "/root/testdata/sf0.01")
    cut = e.approxQuantile("vec_id", [0.8], 0.0)[0]
    old, batch = e.filter(F.col("vec_id") < cut), e.filter(F.col("vec_id") >= cut)
    assert old.count() > 0 and batch.count() > 0

    standing = semantic_dedup_state(old, "vec_id", "embedding", t,
                                    IVF_CENTROIDS)
    delta, updated = incremental_semantic_dedup(
        standing, batch, "vec_id", "embedding", t, IVF_CENTROIDS)

    full = semantic_dedup_state(e, "vec_id", "embedding", t, IVF_CENTROIDS)
    want = {r.vid: (r.cell, r.is_kept) for r in full.collect()}
    got = {r.vid: (r.cell, r.is_kept) for r in updated.collect()}
    assert got == want
    # delta covers exactly the batch — one verdict row per new vector
    assert {r.vid for r in delta.collect()} == \
        {r.vec_id for r in batch.select("vec_id").collect()}

    with pytest.raises(ValueError, match="monotone-append"):
        incremental_semantic_dedup(updated, batch.limit(1), "vec_id",
                                   "embedding", t, IVF_CENTROIDS)


def test_standardize_embeddings_zscores_each_dim(spark, sf_dir):
    """standardize_embeddings: every dimension of the output has mean ~0
    and sample std ~1; constant dimensions map to exactly 0 (no div by
    zero); the transform side is one broadcast join over the scan (no
    second shuffle of the corpus)."""
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.similarity import (
        standardize_embeddings,
    )

    df = spark.createDataFrame(
        [(i, [float(i), 7.0, float(i % 3) * 2.5]) for i in range(40)],
        "vec_id long, embedding array<double>")
    out = standardize_embeddings(df, "vec_id", "embedding")
    rows = [r.zvec for r in out.collect()]
    assert all(len(z) == 3 for z in rows)
    import statistics
    for d in (0, 2):
        vals = [z[d] for z in rows]
        assert abs(statistics.mean(vals)) < 1e-5, d
        assert abs(statistics.stdev(vals) - 1.0) < 1e-4, d
    assert all(z[1] == 0.0 for z in rows)   # constant dim -> 0, not NaN

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_pca_matches_numpy_reference(spark):
    """Distributed one-pass PCA == numpy's full covariance eig on the
    same data (components up to the pinned sign convention, variances,
    projections), and the TRANSFORM path stays JVM-side."""
    import numpy as np

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.similarity import (
        pca_fit,
        pca_transform,
    )

    rng = np.random.RandomState(7)
    base = rng.normal(size=(300, 3)) @ rng.normal(size=(3, 8)) \
        + rng.normal(scale=0.05, size=(300, 8)) + [5.0] * 8
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(base)],
        "vec_id long, embedding array<double>").repartition(4)

    model = pca_fit(df, "embedding", k=3)

    mean = base.mean(axis=0)
    cov = np.cov(base, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    want_comps = evecs[:, order].T
    for i in range(3):
        j = int(np.argmax(np.abs(want_comps[i])))
        if want_comps[i, j] < 0:
            want_comps[i] = -want_comps[i]

    assert np.allclose(model["mean"], mean, atol=1e-9)
    assert np.allclose(model["components"], want_comps, atol=1e-7)
    assert np.allclose(model["explained_variance"],
                       np.maximum(evals[order], 0), atol=1e-7)
    r = model["explained_variance_ratio"]
    assert r[0] > r[1] > r[2] and sum(r) <= 1.0 + 1e-9
    # 3 latent dims -> the top-3 basis explains nearly everything
    assert sum(r) > 0.99

    out = pca_transform(df, "embedding", model)
    got = {r2.vec_id: np.array(r2.proj) for r2 in out.collect()}
    want = (base - mean) @ np.array(model["components"]).T
    for i in range(300):
        assert np.allclose(got[i], want[i], atol=1e-7)

    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan
