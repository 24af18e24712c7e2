"""Document fingerprinting by rolling-hash winnowing (Schleimer et al.,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003).

Pipeline per document: tokens → k-gram hashes (the "rolling" hash stream)
→ sliding windows of w consecutive hashes → min hash per window →
distinct selected values = the fingerprint set. Guarantee: any shared
substring of at least w+k-1 tokens between two documents yields at least
one shared fingerprint, while only ~2/(w+1) of all k-gram hashes are kept.

Everything is array expressions inside one projection — zero shuffles
until the final explode+distinct, which shuffles (doc, fp) pairs only
(~2/(w+1) × token count). Hashes are md5-derived (functions/text.py) so a
DuckDB oracle reproduces the exact fingerprint sets.

Replaces nothing in the reference (it has no text analytics); part of the
training-data operator family (SURVEY.md §7 step 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.functions import text as T
from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import spread


def winnow_fingerprints(df: DataFrame, id_col: str, text_col: str,
                        k: int = 3, w: int = 4) -> DataFrame:
    """Distinct (doc, fp) winnowing fingerprints; k = gram size in tokens,
    w = window size in grams. Docs shorter than k tokens yield no rows.

    Each array stage is materialized as its own projection so the previous
    stage's expression is evaluated once, not once per element_at of the
    next lambda (no CSE across higher-order-function boundaries — same
    pitfall as operators/dedup.py::_shingle_table, measured 18× there).
    """
    toks = spread(df).select(F.col(id_col).alias("doc"),
                             T.tokens(text_col).alias("ts"))
    gram = F.transform(
        F.sequence(F.lit(1), F.size("ts") - (k - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at("ts", i + j) for j in range(k)]),
    )
    grams = toks.select(
        "doc",
        F.when(F.size("ts") >= k, gram)
        .otherwise(F.array().cast("array<string>")).alias("grams"),
    )
    hashes = grams.select(
        "doc", F.transform("grams", lambda g: T.hash28(g)).alias("hs"))
    wins = F.transform(
        F.sequence(F.lit(1), F.size("hs") - (w - 1)),
        lambda i: F.array_min(F.slice("hs", i, w)),
    )
    fps = hashes.select(
        "doc",
        # Fewer than w grams: keep the global min (degenerate window), so
        # short-but-tokenizable docs still carry one fingerprint.
        F.when(F.size("hs") >= w, F.array_distinct(wins))
        .when(F.size("hs") > 0, F.array(F.array_min("hs")))
        .otherwise(F.array().cast("array<long>")).alias("fps"),
    )
    # array_distinct above already makes fingerprints unique per doc — no
    # dropDuplicates (that would be a whole-row shuffle for nothing).
    return fps.select("doc", F.explode("fps").alias("fp"))
