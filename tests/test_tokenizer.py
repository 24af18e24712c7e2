"""BPE training + application: the iterative distributed loop and the
JVM-side merge fold."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.operators.tokenizer import (
    bpe_encode_words,
    merge_pair,
    train_bpe_merges,
    word_vocabulary,
)


def _reference_bpe_train(word_freqs: dict, num_merges: int,
                         min_pair_freq: int = 2) -> list:
    """Plain-Python BPE trainer (the classic Sennrich loop) — the
    independent reference the distributed trainer must match."""
    segs = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(num_merges):
        counts: dict = {}
        for w, f in word_freqs.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        (a, b) = best[0]
        merges.append((a, b))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges


def test_train_matches_python_reference(spark):
    """Distributed trainer == the sequential Sennrich loop on the classic
    low/lower/newest/widest corpus (deterministic tiebreaks on both)."""
    corpus = ("low low low low low lower lower "
              "newest newest newest newest newest newest "
              "widest widest widest")
    df = spark.createDataFrame([(corpus,)], ["text"])
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    want = _reference_bpe_train(freqs, 6)
    got = train_bpe_merges(df, "text", 6)
    assert got == want and len(got) == 6
    # 'est' assembled within the first merges — the canonical outcome
    joined = {a + b for a, b in got}
    assert "es" in joined and "est" in joined


def test_encode_roundtrip_and_greedy_merge(spark):
    """Applying the trained rules: concatenating the pieces restores the
    word (lossless segmentation), and the greedy left-to-right fold
    handles overlapping runs ('aaa' + (a,a) -> ['aa','a'])."""
    df = spark.createDataFrame(
        [("lowest",), ("newest",), ("aaa",), ("x",), ("",)], ["w"])
    merges = [("e", "s"), ("es", "t"), ("a", "a")]
    out = {r.w: r.pieces for r in
           bpe_encode_words(df, "w", merges).collect()}
    assert out["newest"] == ["n", "e", "w", "est"]
    assert out["lowest"] == ["l", "o", "w", "est"]
    assert out["aaa"] == ["aa", "a"]
    assert out["x"] == ["x"] and out[""] == []
    for w, pieces in out.items():
        assert "".join(pieces) == w


def test_merge_fold_stays_jvm_side(spark, sf_dir):
    """The merge application is Column-only — no Python worker stage in
    the plan — and the vocabulary agg is one hash aggregation."""
    from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import load_table

    d = load_table(spark, "documents", sf_dir)
    vocab = word_vocabulary(d, "text")
    enc = bpe_encode_words(vocab, "w", [("t", "h"), ("th", "e")])
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan, plan
    got = {r.w: r.pieces for r in enc.collect()}
    assert got["the"] == ["the"]


def test_single_merge_pair_column(spark):
    df = spark.createDataFrame([(["a", "b", "a", "b", "b"],)], ["seq"])
    out = df.select(merge_pair("seq", "a", "b").alias("m")).first().m
    assert out == ["ab", "ab", "b"]


def test_encode_chunks_deep_rule_lists_automatically(spark):
    """>100-rule encode: the fold auto-breaks into checkpoint_every-rule
    projections, so a deep rule list plans and runs without the caller
    chunking by hand. Parity vs the sequential Python application of
    the same rules in priority order, plus lossless roundtrip."""
    import itertools
    import zlib

    words = ["".join(p) for p in itertools.product("abcd", repeat=5)][:500]
    freqs = {w: (zlib.crc32(w.encode()) % 7) + 1 for w in words}
    merges = _reference_bpe_train(freqs, 150, min_pair_freq=1)
    assert len(merges) > 100  # the shape the old docstring punted on

    def py_apply(w: str) -> list:
        s = list(w)
        for a, b in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return s

    df = spark.createDataFrame([(w,) for w in words[:80]], ["w"])
    got = {r.w: r.pieces for r in
           bpe_encode_words(df, "w", merges, checkpoint_every=32).collect()}
    for w, pieces in got.items():
        assert "".join(pieces) == w
        assert pieces == py_apply(w), w


def test_batched_training_parity_on_disjoint_corpus(spark):
    """merges_per_round > 1: on a corpus whose top pairs are pairwise
    token-disjoint the batched trainer must learn the EXACT sequential
    rule list (selections cannot interact), in a fraction of the jobs."""
    # words with disjoint alphabets; frequencies order the merges
    corpus = " ".join(["xy"] * 10 + ["pq"] * 9 + ["rs"] * 8 + ["mn"] * 7)
    df = spark.createDataFrame([(corpus,)], ["text"])
    seq = train_bpe_merges(df, "text", 4, merges_per_round=1)
    batched = train_bpe_merges(df, "text", 4, merges_per_round=4)
    assert batched == seq == [("x", "y"), ("p", "q"),
                              ("r", "s"), ("m", "n")]


def test_batched_selection_defers_interacting_pairs():
    """The greedy selector never co-selects merges that share a token
    (or whose output collides): the conflicting candidate is deferred,
    not dropped."""
    from collections import namedtuple

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.tokenizer import (
        _select_disjoint,
    )

    C = namedtuple("C", "a b cnt")
    cands = [C("a", "b", 10), C("b", "c", 9),   # shares 'b' -> deferred
             C("d", "e", 8), C("a", "x", 7),    # shares 'a' -> deferred
             C("f", "g", 6)]
    assert _select_disjoint(cands, 3, 2) == [("a", "b"), ("d", "e"),
                                             ("f", "g")]
    # output-token collision: ("a","b") produces "ab"; a candidate
    # consuming token "ab" must not co-select
    cands2 = [C("a", "b", 10), C("ab", "z", 9), C("u", "v", 8)]
    assert _select_disjoint(cands2, 2, 2) == [("a", "b"), ("u", "v")]
    # min_pair_freq cuts the tail even when slots remain
    assert _select_disjoint([C("a", "b", 10), C("c", "d", 1)], 2, 2) == \
        [("a", "b")]


def test_batched_training_converges_on_real_corpus(spark):
    """On the canonical corpus (interacting pairs: es->est chains) the
    batched trainer still assembles the same VOCABULARY of merged
    tokens; order may differ across round boundaries per the documented
    divergence contract."""
    corpus = ("low low low low low lower lower "
              "newest newest newest newest newest newest "
              "widest widest widest")
    df = spark.createDataFrame([(corpus,)], ["text"])
    batched = train_bpe_merges(df, "text", 6, merges_per_round=3)
    assert len(batched) == 6
    assert {a + b for a, b in batched} >= {"es", "est"}
    # every batched rule is a plausible merge: its parts were tokens
    for a, b in batched:
        for t in (a, b):
            assert len(t) == 1 or t in {x + y for x, y in batched}
