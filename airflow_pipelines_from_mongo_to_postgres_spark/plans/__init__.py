"""Named query plans exposed through ``__spark_entry__``.

Each module exports ``QUERIES: dict[name -> (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name -> ANSI SQL str]`` (DuckDB-runnable on the same
parquet views). Names must agree; computed columns are aliased identically
on both sides (the driver hash-compares by sorted column name).
"""

from airflow_pipelines_from_mongo_to_postgres_spark.plans import (
    analytics,
    llmdata,
    mergeops,
    relational,
    streamsql,
    temporal,
)

ALL_PLAN_MODULES = [relational, mergeops, streamsql, temporal, analytics, llmdata]

# The driver's per-round correctness sweep runs queries in registry order
# under a wall-clock budget, so truncation eats the TAIL. Order by how much
# driver evidence each query already has: queries with none run first.
#   r1 truncated mid-llmdata (missed streamsql/temporal/analytics),
#   r2 truncated after the cheap modules (missed all of q30-q36, q41,
#   q50-q64); q61-q64 have never had a driver row at all.
# Within each evidence class, cheaper queries run first so a truncated
# sweep still yields the most rows. llmdata shares one persisted shingle
# table across q26/q27/q28 (+ the pair-cache consumers q51/q53/q58/q63)
# to shrink the sweep's dominant cost.
_SWEEP_PRIORITY = [
    # never driver-checked (no row in any CORRECTNESS_r*.json)
    "q73_repetition_stats", "q74_pii_scan", "q75_sequence_packing",
    "q76_snapshot_diff", "q77_scd2_intervals", "q78_lm_unigram_score",
    "q79_incremental_agg", "q80_source_mix", "q81_pagerank_neardup",
    "q82_mad_outliers", "q83_user_timeline", "q84_ngram_contamination",
    "q85_retention_cohorts", "q86_containment_pairs", "q87_window_breadth",
    "q88_array_functions", "q89_date_dimension",
    "q61_split_decontamination", "q62_ann_topk_numpy",
    "q63_jaccard_pruned", "q64_embed_near_dup_drop",
    # r1 evidence only (missed by the r2 sweep) — cheap text/metadata ops,
    "q30_lang_id", "q31_quality_filter", "q32_token_stats",
    "q36_binary_metadata", "q41_winnow_fingerprints", "q57_dataset_split",
    "q59_stop_shingles", "q60_quality_deciles",
    # ... then ANN,
    "q33_cosine_topk", "q34_cosine_pairs", "q35_ann_ivf_label",
    "q52_ann_lsh", "q55_ann_ivf_kmeans", "q56_embed_near_dup_lsh",
    # ... then corpus dedup/build (share the q63 pair plan).
    "q50_corpus_curation", "q51_near_dup_drop", "q53_dedup_clusters",
    "q58_corpus_build",
]


def _ordered(full: dict) -> dict:
    out = {k: full[k] for k in _SWEEP_PRIORITY if k in full}
    out.update((k, v) for k, v in full.items() if k not in out)
    return out


def all_queries():
    out = {}
    for m in ALL_PLAN_MODULES:
        out.update(m.QUERIES)
    return _ordered(out)


def all_oracles():
    out = {}
    for m in ALL_PLAN_MODULES:
        out.update(m.ORACLES)
    return _ordered(out)
