"""Dedup operators: exact, Jaccard, MinHash-LSH recall/precision, SimHash
pigeonhole guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.operators import dedup

BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the late afternoon sun")


@pytest.fixture()
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),                                   # exact dup of 0
        (2, BASE.replace("lazy", "sleepy")),         # near dup of 0
        (3, "completely different content about spark query planning and shuffles"),
        (4, "another unrelated document mentioning benchmarks and partitions only"),
        (5, BASE + " extra tail words appended here"),  # near dup of 0
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_duplicates(spark, docs):
    out = dedup.exact_duplicates(docs, "doc_id", "text")
    copies = {r.keeper_id: r.copies for r in out.collect()}
    assert copies[0] == 2          # docs 0 and 1 collapse
    assert out.count() == 5        # 6 docs → 5 distinct contents


def test_exact_duplicates_normalizes_whitespace_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "HELLO\tWORLD")],
        ["doc_id", "text"])
    assert dedup.exact_duplicates(df, "doc_id", "text").count() == 1


def test_jaccard_pairs_finds_near_dups(spark, docs):
    pairs = {(r.d1, r.d2): r.jaccard
             for r in dedup.jaccard_pairs(docs, "doc_id", "text", 0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] < 1.0
    assert all(d1 < d2 for d1, d2 in pairs)
    assert not any({3, 4} & {d1, d2} for d1, d2 in pairs)


def test_minhash_lsh_equals_exact_at_threshold(spark, docs):
    exact = {(r.d1, r.d2) for r in
             dedup.jaccard_pairs(docs, "doc_id", "text", 0.5).collect()}
    lsh = {(r.d1, r.d2) for r in
           dedup.minhash_lsh_pairs(docs, "doc_id", "text", 0.5,
                                   num_perm=128, bands=64).collect()}
    assert lsh == exact  # recall 1 on high-sim pairs, precision exact


def test_minhash_signature_identical_docs_collide(spark):
    df = spark.createDataFrame([(1, BASE), (2, BASE)], ["doc_id", "text"])
    sigs = dedup.minhash_signatures(df, "doc_id", "text", num_perm=8).collect()
    a, b = ({k: v for k, v in r.asDict().items() if k != "doc"} for r in sigs)
    assert a == b


def test_simhash_banding_equals_bruteforce(spark, docs):
    """Pigeonhole: chunk-join candidates + verify == full O(n²) scan."""
    sig = dedup.simhash_signatures(docs, "doc_id", "text").collect()
    by_id = {r.doc: r.simhash for r in sig}
    brute = set()
    ids = sorted(by_id)
    for i in ids:
        for j in ids:
            if i < j and bin(by_id[i] ^ by_id[j]).count("1") <= 8:
                brute.add((i, j))
    banded = {(r.d1, r.d2) for r in
              dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=8).collect()}
    assert banded == brute


def test_stop_shingle_pruning(spark):
    # a shingle present in every doc gets pruned with max_df, pairs survive
    rows = [(i, f"common shingle text unique{i} word{i} tail{i}") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pruned = dedup.jaccard_pairs(df, "doc_id", "text", 0.9, max_df=5)
    assert pruned.count() == 0  # only the hot shingle was shared; it's gone


def test_max_shingles_caps_giant_doc_payload(spark):
    """One book-length outlier must not blow the verification payload: with
    a cap, each doc carries at most max_shingles hashes and the bottom-k
    Jaccard estimate stays close to the exact value (err ~ 1/sqrt(k))."""
    import random

    rng = random.Random(7)
    words = [f"w{rng.randrange(10_000)}" for _ in range(6_000)]
    giant = " ".join(words)
    # near dup: same text with a 5% tail swap
    cut = int(len(words) * 0.95)
    near = " ".join(words[:cut] + [f"x{i}" for i in range(len(words) - cut)])
    df = spark.createDataFrame(
        [(0, giant), (1, near), (2, "tiny unrelated doc here")],
        ["doc_id", "text"])

    exact = {(r.d1, r.d2): r.jaccard for r in
             dedup.jaccard_pairs(df, "doc_id", "text", 0.2).collect()}
    capped = {(r.d1, r.d2): r.jaccard for r in
              dedup.minhash_lsh_pairs(df, "doc_id", "text", 0.2,
                                      num_perm=32, bands=16,
                                      max_shingles=512).collect()}
    assert (0, 1) in exact and (0, 1) in capped
    assert abs(capped[(0, 1)] - exact[(0, 1)]) < 0.1   # ~1/sqrt(512) noise
    assert (0, 2) not in capped

    # under-cap docs are exact: rerun with a cap far above every doc size
    uncapped_equiv = {(r.d1, r.d2): r.jaccard for r in
                      dedup.minhash_lsh_pairs(df, "doc_id", "text", 0.2,
                                              num_perm=32, bands=16,
                                              max_shingles=100_000).collect()}
    assert uncapped_equiv[(0, 1)] == exact[(0, 1)]


def test_incremental_jaccard_equals_full_recompute(spark):
    """Append-maintenance property: standing pairs ∪ incremental delta
    must equal a full recompute over the union (unpruned), and the delta
    must contain ONLY pairs with a new member."""
    base_rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),
        (3, "one two three four five six seven"),
        (4, "totally different words here okay then"),
    ]
    new_rows = [
        (10, "alpha beta gamma delta epsilon theta"),   # near-dup of 1/2
        (11, "one two three four five six eight"),      # near-dup of 3
        (12, "alpha beta gamma delta epsilon iota"),    # near-dup of 1/2/10
    ]
    old_df = spark.createDataFrame(base_rows, ["doc_id", "text"])
    new_df = spark.createDataFrame(new_rows, ["doc_id", "text"])
    full_df = spark.createDataFrame(base_rows + new_rows, ["doc_id", "text"])

    thr = 0.2
    standing = {(r.d1, r.d2): r.jaccard for r in
                dedup.jaccard_pairs(old_df, "doc_id", "text", thr).collect()}
    old_sh = dedup.build_shingle_table(old_df, "doc_id", "text")
    delta_df, updated_sh = dedup.incremental_jaccard_pairs(
        old_sh, new_df, "doc_id", "text", thr)
    delta = {(r.d1, r.d2): r.jaccard for r in delta_df.collect()}
    recompute = {(r.d1, r.d2): r.jaccard for r in
                 dedup.jaccard_pairs(full_df, "doc_id", "text", thr).collect()}

    new_ids = {10, 11, 12}
    assert all(d1 in new_ids or d2 in new_ids for d1, d2 in delta)
    merged = dict(standing)
    merged.update(delta)
    assert merged == recompute and len(delta) > 0

    # the returned shingle table is the union snapshot for the next batch
    assert updated_sh.select("doc").distinct().count() == 7


def test_incremental_jaccard_rejects_reingested_ids(spark):
    """Append-only contract is ENFORCED (ADVICE r4): a re-ingested id
    would double its (doc, shingle) rows in the union and silently
    corrupt jaccard values, so overlap raises."""
    import pytest

    from airflow_pipelines_from_mongo_to_postgres_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "a completely different text about spark engines")],
        ["doc_id", "text"])
    sh = dedup.build_shingle_table(docs, "doc_id", "text", n=3)
    reingest = spark.createDataFrame(
        [(2, "a completely different text about spark engines"),
         (3, "a brand new third document body")],
        ["doc_id", "text"])
    with pytest.raises(ValueError, match="append-only"):
        dedup.incremental_jaccard_pairs(sh, reingest, "doc_id", "text",
                                        threshold=0.2)
    # disjoint batch still works
    fresh = spark.createDataFrame(
        [(3, "a brand new third document body")], ["doc_id", "text"])
    delta, updated = dedup.incremental_jaccard_pairs(
        sh, fresh, "doc_id", "text", threshold=0.2)
    assert updated.select("doc").distinct().count() == 3


def test_scrub_repeated_spans_matches_python_reference(spark):
    """Span-scrub == an independent Python replay of the Lee-style
    removal: positions covered by any cross-doc duplicated span_n-token
    window are removed, unique prose survives, fully-boilerplate docs
    scrub to empty (not dropped)."""
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.dedup import (
        scrub_repeated_spans,
    )

    boiler = "all rights reserved contact us today"
    docs = [
        ("d1", f"alpha beta gamma {boiler} delta epsilon"),
        ("d2", f"{boiler} zeta eta theta iota kappa"),
        ("d3", "totally unique text with no shared windows here"),
        ("d4", boiler),                       # nothing but boilerplate
        ("d5", "short doc"),                  # shorter than span_n
    ]
    n = 5

    def ref_scrub(all_docs):
        spans = {}
        tok = {i: t.split() for i, t in all_docs}
        for i, ts in tok.items():
            for p in range(len(ts) - n + 1):
                spans.setdefault(" ".join(ts[p:p + n]), set()).add(i)
        dup = {s for s, ids in spans.items() if len(ids) >= 2}
        out = {}
        for i, ts in tok.items():
            cov = set()
            for p in range(len(ts) - n + 1):
                if " ".join(ts[p:p + n]) in dup:
                    cov.update(range(p, p + n))
            out[i] = " ".join(t for q, t in enumerate(ts) if q not in cov)
        return out

    want = ref_scrub(docs)
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r.doc_id: r for r in
           scrub_repeated_spans(df, "doc_id", "text", span_n=n).collect()}
    assert len(got) == 5
    for i, _ in docs:
        assert got[i].scrubbed == want[i], i
    assert got["d4"].scrubbed == "" and got["d4"].covered_tokens == 6
    assert got["d3"].covered_tokens == 0
    assert got["d5"].scrubbed == "short doc"

    plan = scrub_repeated_spans(df, "doc_id", "text")._jdf \
        .queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                "CartesianProduct"):
        assert bad not in plan


def test_scrub_hash_spans_mode_agrees_with_exact(spark):
    """hash_spans=True (8-byte xxhash64 shuffle keys, the jaccard_pairs
    discipline) returns row-identical output to the exact-string default
    on the fixture, and the hashed plan carries no span strings through
    the frequency agg (the groupBy key is the long column)."""
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.dedup import (
        scrub_repeated_spans,
    )

    boiler = "all rights reserved contact us today"
    docs = [
        ("d1", f"alpha beta gamma {boiler} delta epsilon"),
        ("d2", f"{boiler} zeta eta theta iota kappa"),
        ("d3", "totally unique text with no shared windows here"),
        ("d4", boiler),
        ("d5", "short doc"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    exact = {r.doc_id: r.asDict() for r in
             scrub_repeated_spans(df, "doc_id", "text", span_n=5).collect()}
    hashed_df = scrub_repeated_spans(df, "doc_id", "text", span_n=5,
                                     hash_spans=True)
    hashed = {r.doc_id: r.asDict() for r in hashed_df.collect()}
    assert hashed == exact

    plan = hashed_df._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                "CartesianProduct"):
        assert bad not in plan


def test_incremental_scrub_matches_full_recompute(spark):
    """Appending a batch rescrubs EXACTLY the affected docs (batch +
    standing carriers of newly-duplicated spans), and their outputs
    equal a full scrub over the union; untouched docs are absent from
    the rescrub set."""
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.dedup import (
        incremental_scrub_repeated_spans,
        positioned_spans,
        scrub_repeated_spans,
    )

    base_docs = [
        ("d1", "alpha beta gamma delta epsilon zeta unique one"),
        ("d2", "all rights reserved contact us today plus own words"),
        ("d3", "completely different content nothing shared here at all"),
    ]
    batch = [
        # duplicates d2's boilerplate -> d2 becomes affected
        ("d4", "all rights reserved contact us today brand new tail"),
        ("d5", "fresh text with no overlap whatsoever in any window"),
    ]
    sdf = spark.createDataFrame(base_docs, "doc_id string, text string")
    bdf = spark.createDataFrame(batch, "doc_id string, text string")
    sspans = positioned_spans(sdf, "doc_id", "text")

    rescrub, udocs, uspans = incremental_scrub_repeated_spans(
        sdf, sspans, bdf, "doc_id", "text")
    got = {r.doc_id: r for r in rescrub.collect()}
    # affected = batch (d4, d5) + the standing carrier d2; never d1/d3
    assert set(got) == {"d2", "d4", "d5"}

    full = {r.doc_id: r for r in scrub_repeated_spans(
        spark.createDataFrame(base_docs + batch,
                              "doc_id string, text string"),
        "doc_id", "text").collect()}
    for d in got:
        assert got[d].scrubbed == full[d].scrubbed, d
        assert got[d].covered_tokens == full[d].covered_tokens, d
    assert full["d2"].covered_tokens > 0        # the boilerplate went

    # second append over the returned state keeps the invariant
    b2 = spark.createDataFrame(
        [("d6", "alpha beta gamma delta epsilon zeta stolen opening")],
        "doc_id string, text string")
    rescrub2, _, _ = incremental_scrub_repeated_spans(
        udocs, uspans, b2, "doc_id", "text")
    got2 = {r.doc_id: r for r in rescrub2.collect()}
    assert "d1" in got2 and "d6" in got2        # d1's opening now dup
    full2 = {r.doc_id: r for r in scrub_repeated_spans(
        spark.createDataFrame(
            base_docs + batch + [("d6",
                                  "alpha beta gamma delta epsilon zeta "
                                  "stolen opening")],
            "doc_id string, text string"),
        "doc_id", "text").collect()}
    for d in got2:
        assert got2[d].scrubbed == full2[d].scrubbed, d
