"""Byte-pair-encoding tokenizer ops: distributed merge-rule TRAINING and
JVM-side merge APPLICATION.

q104 computes one round of pair statistics; this module runs the actual
BPE loop — the iterative distributed algorithm (like PageRank /
connected components): each round one weighted pair-count aggregation
over the current word segmentations, one 1-row argmax collect (the only
driver-side state: the merge rule list itself, which IS the trained
artifact), then the merge applied to every word via a higher-order
``aggregate`` Column — no Python workers anywhere.

Scale shape: the pair count is a hash aggregation over (pair) keys,
partial map-side; the per-round argmax is a TakeOrdered(1). Word
segmentations live in the distributed ``words`` frame keyed by the word
string — the classic BPE-training trick of counting over the word
VOCABULARY weighted by frequency rather than the raw corpus, so each
round's cost is O(|vocab| · avg word length), independent of corpus
row count after the first frequency aggregation. The lazy plan grows by
one merge per round; ``checkpoint_every`` truncates lineage so hundreds
of merges don't compound into a giant tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.functions import text as T


def _chars(col) -> F.Column:
    """Split a word into single-character tokens (JVM-side).
    ``sequence(1, 0)`` counts DOWN (the build_shingle_table foot-gun),
    so the empty word is guarded to an empty array."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) > 0,
                  F.transform(F.sequence(F.lit(1), F.length(c)),
                              lambda i: F.substring(c, i, 1))) \
        .otherwise(F.array().cast("array<string>"))


def merge_pair(seq_col, a: str, b: str) -> F.Column:
    """Apply ONE merge rule (a, b) -> ab to a token-array column,
    greedy left-to-right (standard BPE): fold the array, gluing the
    current token onto the accumulator's tail when the pair matches.
    ``F.get`` (not element_at) so the empty-accumulator probe is a null,
    never an ANSI index error."""
    sc = F.col(seq_col) if isinstance(seq_col, str) else seq_col
    return F.aggregate(
        sc,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == a) & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(a + b)))
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_vocabulary(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the whitespace-token stream — the weighted
    vocabulary BPE training counts over."""
    return (df.select(F.explode(T.tokens(text_col)).alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))


def _select_disjoint(cands: list, m: int, min_freq: int) -> list:
    """Greedy top-``m`` PAIRWISE-DISJOINT merge selection from one
    round's (a, b, cnt) argmax table (already count-desc, tie-broken).
    Two candidate merges are independent — their counts and
    applicability cannot interact within the round — iff neither shares
    a token with the other's pair NOR with any already-selected merged
    output, and its own output token collides with none of them. A
    conflicting candidate is DEFERRED to a later round (where it is
    re-counted against the post-merge segmentations), never dropped."""
    chosen: list = []
    used: set = set()
    for r in cands:
        if len(chosen) >= m:
            break
        if r.cnt < min_freq:
            break
        toks = {r.a, r.b, r.a + r.b}
        if used & toks:
            continue
        chosen.append((r.a, r.b))
        used |= toks
    return chosen


def train_bpe_merges(df: DataFrame, text_col: str, num_merges: int,
                     min_pair_freq: int = 2,
                     checkpoint_every: int = 16,
                     merges_per_round: int = 1) -> list:
    """Learn up to ``num_merges`` BPE merge rules from the corpus.
    Deterministic: the per-round argmax breaks count ties on (first,
    second) token order, so the same corpus always yields the same
    rules — a requirement for the frozen-artifact serving pattern
    (_pq_codebooks / _ivf_centroids use the same discipline).

    ``merges_per_round=m`` batches the inherently sequential loop: each
    Spark job selects the top-m pairwise-DISJOINT pairs from one
    aggregation (greedy on the argmax table, ``_select_disjoint``), so
    a 50k-merge production run costs ~50k/m jobs instead of 50k.
    Divergence contract: within a round every selected pair's count
    comes from the PRE-round segmentations; merges that share no tokens
    cannot interact, so on such fixtures the batched rule list equals
    the sequential one exactly. Interacting candidates are deferred to
    the next round, which can reorder (never corrupt) the rule list
    relative to m=1 — rule-priority application stays consistent with
    whatever list was learned. Counts that straddle a same-round merge
    boundary may be stale by that round's merges (standard batched-BPE
    approximation, cf. SentencePiece's chunked trainer)."""
    if merges_per_round < 1:
        raise ValueError("merges_per_round must be >= 1")
    words = word_vocabulary(df, text_col) \
        .withColumn("seq", _chars("w"))
    merges: list = []
    applied = 0
    while len(merges) < num_merges:
        m = min(merges_per_round, num_merges - len(merges))
        pairs = words.select(
            "freq",
            F.explode(F.arrays_zip(
                F.slice("seq", 1, F.size("seq") - 1).alias("a"),
                F.slice("seq", 2, F.size("seq") - 1).alias("b"),
            )).alias("p"))
        # 4m + 8 candidates: enough slack for the disjointness filter to
        # fill m slots in the common case without a second job
        cands = (pairs.groupBy(F.col("p.a").alias("a"),
                               F.col("p.b").alias("b"))
                 .agg(F.sum("freq").alias("cnt"))
                 .orderBy(F.col("cnt").desc(), F.col("a").asc(),
                          F.col("b").asc())
                 .limit(4 * m + 8).collect())
        chosen = _select_disjoint(cands, m, min_pair_freq)
        if not chosen:
            break
        for a, b in chosen:
            merges.append((a, b))
            words = words.withColumn("seq", merge_pair("seq", a, b))
            applied += 1
            if applied % checkpoint_every == 0:
                words = words.localCheckpoint(eager=True)
    return merges


def bpe_encode_words(words: DataFrame, word_col: str,
                     merges: list, out_col: str = "pieces",
                     checkpoint_every: int = 64) -> DataFrame:
    """Segment each word with a trained merge list — merges applied in
    rule-priority order, entirely as chained Column folds (no Python
    workers). Expression depth grows with the rule count, so the fold
    is automatically broken into ``checkpoint_every``-rule PROJECTIONS
    (each ``select`` materializes one named column, resetting the
    expression tree the analyzer/codegen must swallow — the encode-side
    mirror of training's ``localCheckpoint`` lineage truncation). A
    50k-rule production tokenizer therefore plans as ~800 stacked
    projections instead of one 50k-deep expression; all still one
    narrow map stage at runtime, no shuffle."""
    seq = _chars(word_col)
    out = words
    for i, (a, b) in enumerate(merges):
        seq = merge_pair(seq, a, b)
        if (i + 1) % checkpoint_every == 0:
            out = out.withColumn(out_col, seq)
            seq = F.col(out_col)
    return out.withColumn(out_col, seq)
