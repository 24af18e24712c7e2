"""Text-analysis column expressions for training-data pipelines: tokenize,
shingle, language-ID, quality scoring, token counting, fingerprinting.

All built from JVM-side ``pyspark.sql.functions`` (no Python UDFs): at 100 TB
these run inside whole-stage codegen on the executors.

Cross-engine hashing: everything that must agree with an independent oracle
uses md5 (bit-identical in Spark / DuckDB / Postgres), with hex→int via
``conv(substr(md5(x),1,k),16,10)``; k=7 keeps products inside int64 for the
MinHash affine permutations, k=15 gives 60-bit values for SimHash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col) -> Column:
    """Whitespace tokenization, lowercased, empties dropped."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def ngrams_from_tokens(toks, n: int) -> Column:
    """Word n-grams (duplicates KEPT) from a token-array column. Docs
    shorter than n tokens yield an empty array (guarded: Spark's
    ``sequence(1, 0)`` would otherwise count DOWN).

    Pass a MATERIALIZED column (``df.select(tokens(c).alias("toks"))``
    first), not the ``tokens(...)`` expression itself: there is no CSE
    across higher-order-function boundaries, so an embedded tokenizer
    re-runs inside every ``element_at`` — O(tokens²) regex splits per row
    (measured 18×, see operators/dedup.py::build_shingle_table)."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])
    )
    return F.when(F.size(toks) >= n, gram) \
        .otherwise(F.array().cast("array<string>"))


def shingles(col, n: int = 3) -> Column:
    """Word n-gram shingles (distinct), the unit set for Jaccard dedup.
    Convenience form over raw text — for hot paths stage the token array
    first and use ``array_distinct(ngrams_from_tokens(...))`` (see the
    CSE note on ngrams_from_tokens)."""
    return F.array_distinct(ngrams_from_tokens(tokens(col), n))


def hash28(col) -> Column:
    """md5-derived 28-bit integer hash (first 7 hex chars). Small enough
    that ``a*h + b`` stays in int64 for 31-bit ``a`` (MinHash perms)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("long")


def hash60(col) -> Column:
    """md5-derived 60-bit integer hash (first 15 hex chars) for SimHash."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def normalize_text(col) -> Column:
    """Canonical form for exact-dup fingerprinting: lowercase, collapse
    whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col) -> Column:
    """Document fingerprint = md5 of the normalized text. Identical docs
    (modulo case/whitespace) collide exactly; used for exact dedup."""
    return F.md5(normalize_text(col))


#: BPE-ish token pattern: runs of letters, runs of digits, or single
#: non-alphanumeric symbols — a cheap proxy for subword tokenizers.
BPE_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def token_count_bpe(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_TOKEN_RE), F.lit(0)))


#: Tiny per-language marker lexicons for the n-gram/stopword language-ID
#: heuristic. Deterministic demo sets over the fixtures' vocabulary.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "data", "value"],
    "es": ["query", "row", "table", "fast"],
    "de": ["group", "sort", "merge", "batch"],
    "fr": ["filter", "window", "stream", "line"],
    "zh": ["hash", "join", "scan", "key"],
}


def lang_scores(col) -> dict[str, Column]:
    """Marker-token overlap count per language (array_intersect, JVM-side)."""
    toks = F.array_distinct(tokens(col))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(col) -> Column:
    """argmax over lang_scores; ties resolve to the alphabetically-first
    language (equivalent to SQL ``ORDER BY score DESC, lang ASC LIMIT 1``)."""
    scores = lang_scores(col)
    langs = sorted(LANG_MARKERS)
    # max over (score, -alphabetical_index, lang): ties → smallest index.
    best = F.array_max(F.array(*[
        F.struct(scores[lang].alias("score"),
                 F.lit(-i).alias("nidx"),
                 F.lit(lang).alias("lang"))
        for i, lang in enumerate(langs)
    ]))
    return best.getField("lang")


def repetition_features(toks) -> dict[str, Column]:
    """Within-document repetition signals (Gopher-style quality rules)
    over a MATERIALIZED token-array column: the fraction of duplicated
    word n-grams and token diversity. High dup-n-gram fractions flag
    boilerplate / degenerate generations. All integer counts + one
    division — bit-identical across engines. Stage the tokens first
    (``select(tokens(c).alias("toks"))``) so the gram lambdas index a
    plain column, not a re-evaluated tokenizer (the O(tokens²) CSE
    hazard on ngrams_from_tokens)."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    n_tok = F.size(toks)
    out: dict[str, Column] = {
        "n_tokens": n_tok,
        "token_diversity": F.round(
            F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1)), 6),
    }
    for n in (2, 3):
        grams = ngrams_from_tokens(toks, n)
        total = F.size(grams)
        out[f"dup_{n}gram_ratio"] = F.round(
            (total - F.size(F.array_distinct(grams)))
            / F.greatest(total, F.lit(1)), 6)
    return out


#: PII patterns — engine-portable subset (no lookarounds; legal in both
#: Java regex and RE2/DuckDB): emails, NANP-ish phone numbers, IPv4.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "phone": r"\+?[0-9]{3}[-. ]?[0-9]{3}[-. ]?[0-9]{4}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_counts(col) -> dict[str, Column]:
    """Occurrence count per PII class over the lowercased text."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        for name, pat in PII_PATTERNS.items()
    }


def scrub_pii(col) -> Column:
    """Masked copy: each PII class replaced by its [CLASS] tag, applied in
    the fixed PII_PATTERNS order (email first so phone digits inside
    addresses are already gone)."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    for name, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"[{name.upper()}]")
    return c


def quality_features(col) -> dict[str, Column]:
    """Length/punctuation/stopword features for quality filtering."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), F.lit(0)))
    stop = F.size(F.array_intersect(
        F.array_distinct(toks),
        F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])))
    return {
        "n_tokens": n_tok,
        "n_chars": n_chars,
        "avg_token_len": F.round((n_chars - (n_tok - 1)) / n_tok, 6),
        "punct_ratio": F.round(punct / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_hits": stop,
    }


def quality_score(col) -> Column:
    """Composite [0,1]-ish quality score: longer docs with some stopwords and
    little punctuation score higher. Deterministic, oracle-reproducible."""
    f = quality_features(col)
    return F.round(
        F.least(f["n_tokens"] / F.lit(64.0), F.lit(1.0)) * 0.5
        + F.least(f["stopword_hits"] / F.lit(3.0), F.lit(1.0)) * 0.3
        + (1 - F.least(f["punct_ratio"] * 10, F.lit(1.0))) * 0.2,
        6,
    )
