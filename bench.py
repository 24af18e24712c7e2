"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set spans the engine's cost classes: scan+agg, multi-join,
window, merge dataflow, inverted-index Jaccard (unpruned q26 AND the
stop-shingle-pruned scale path q63, so the pruning's cost/benefit carries
a perf gate), MinHash-LSH, ANN top-k, event-time windows, as-of join,
the end-to-end corpus build (q58), BM25 ranked retrieval (q97),
blocked fuzzy record linkage (q99), the keyless banded interval join
(q119), the agg-first HAVING join-back (q121), the composed
semantic corpus build (q134), the positioned-span duplication audit
(q154), the Q5-shape five-table chain (q155), the windowed Q2
decorrelation (q164), and the Mongo $setWindowFields pipeline (q168).

Isolation: every timed run starts from a cold cache — session-level shared
plans (plans/llmdata.py) are cleared and spark.catalog.clearCache() drops
the operators' internal .cache()/.persist() data between runs. Without
this, executor-memory pressure from earlier queries' never-unpersisted
caches distorts later timings (the round-2 q28 "+153%" regression was
exactly this). Each query reports the median of SPARK_GRAFT_ITERS (3) runs.

Two timing columns per query (r8, after r7's +16-48% drift on untouched
sub-second queries showed in-session numbers carry shared-JVM session
tax that moves when the suite composition or cache policy changes):
- "queries":  in-session medians — the whole suite in one JVM, cheap,
  but comparable round-over-round only while the suite itself is stable.
- "isolated": per-query FRESH-JVM medians (one subprocess per query, own
  warm-up) — the judge's adjudication method, immune to suite
  composition; the column to trust for round-over-round deltas.
Since r11 the headline "value" IS isolated_total (labeled by
"value_is"); in-session lives under "queries"/"in_session_total" as a
diagnostic, and the historically jittery queries (_JITTERY) run
_JITTERY_ITERS (7) fresh-JVM iterations instead of 3. Skip the isolated pass with
SPARK_GRAFT_NO_ISOLATED=1 (it adds one JVM startup per headline query
— "value" then falls back to in-session).

Evidence completeness (r15, after the r14 adjudication stalled on
truncated data): per-iteration arrays for every query in BOTH columns
("iterations": {"in_session", "isolated"}) and machine-load markers
("load": os.getloadavg() at bench start/end + per-isolated-query
start 1-min load) are recorded, so an inflated round is
self-diagnosing: uniform inflation with high loadavg = machine band;
a single query whose every iteration moved on a quiet box = real
regression.

Artifact split (r16, after the r15 driver capture truncated the
arrays AGAIN — the driver keeps only the LAST 2,000 chars of stdout,
so a final line carrying 2x25 iteration arrays never parses): the
final stdout line is now a COMPACT record (per-query isolated
medians, totals, load markers — provably < 2,000 chars for the
25-query set; guarded by an assert here and in run_all_checks.sh),
and the FULL record (both median columns + all per-iteration arrays
+ per-query load) is written to $SPARK_GRAFT_BENCH_FULL_OUT
(default <repo>/BENCH_FULL.json), committed per round as
BENCH_FULL_r{N}.json. The compact line's "full" key names the file.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

#: r17 measurement fix (optimization guide §1.4, documented in
#: OPTIMIZATION_r17.md): the timed action is now the NOOP SINK, which
#: computes every column of every row, instead of .count(), which lets
#: the optimizer prune whole subtrees — measured under-counting up to
#: 23x (q154: count 0.10 s vs noop 2.28 s — the span-scrub compute never
#: ran; q108: a left join to a distinct key set is ELIMINATED under
#: count, so none of the dedup pair work was being timed; q01: the
#: pricing sums were pruned, 5.7x). Set SPARK_GRAFT_BENCH_ACTION=count
#: to reproduce the pre-r17 methodology. Committed records bridging the
#: change: BENCH_FULL_r17_quiet.json is the last count-action record
#: (old code); BENCH_FULL_r18_countaction.json is count-action on
#: current code, next to the honest noop record BENCH_FULL_r18.json.
_BENCH_ACTION = os.environ.get("SPARK_GRAFT_BENCH_ACTION", "noop")


def _run_action(df) -> None:
    if _BENCH_ACTION == "count":
        df.count()
    else:
        df.write.format("noop").mode("overwrite").save()

HEADLINE = [
    "q01_pricing_summary",
    "q03_revenue_by_region",
    "q07_top_orders_per_customer",
    "q20_merge_upsert",
    "q26_ngram_jaccard_pairs",
    "q28_minhash_lsh_pairs",
    "q33_cosine_topk",
    "q37_tumbling_window",
    "q42_asof_join",
    "q63_jaccard_pruned",
    "q58_corpus_build",
    "q67_sessionize",
    "q97_bm25_search",
    "q99_fuzzy_linkage",
    "q108_semantic_dedup",
    "q113_latest_shipper",
    "q119_error_burst_windows",
    "q121_large_volume_customers",
    "q134_corpus_build_semantic",
    "q142_sketch_ndv_rollup",        # sketch partial+union cost class
    "q144_expectations_audit",       # one-scan quality battery cost class
    "q154_span_scrub_stats",         # positioned-span explode cost class
    "q155_local_supplier_volume",    # five-table chain cost class
    "q164_min_cost_supplier",        # windowed Q2 decorrelation cost class
    "q168_mongo_window_fields",      # mongo $setWindowFields cost class
]


def _clear_all_caches(spark) -> None:
    import time as _time

    from airflow_pipelines_from_mongo_to_postgres_spark.plans import llmdata
    llmdata.clear_caches()
    spark.catalog.clearCache()
    # Drive the ContextCleaner NOW: broadcast/shuffle/RDD state from the
    # 21-query warm-up + earlier timed queries is cleaned only when the
    # DRIVER's JVM GCs, and in an 8g heap that happens rarely — so the
    # cleanup (and the memory pressure of the uncollected blocks) lands
    # in the middle of whichever timed run the GC interrupts. Measured
    # (r7): without this, q26 in the full session runs [2.6, 4.2, 9.0]s
    # vs [1.5, 1.9, 2.1]s isolated; with gc+settle it runs [1.5-2.4]s
    # in-session — the r6 "q28 2x driver row the judge couldn't
    # reproduce" was exactly this run-context effect.
    spark._jvm.System.gc()
    _time.sleep(0.4)


def _run_one(name: str) -> None:
    """Subprocess entry for the isolated column: fresh JVM, same
    warm-up discipline (compile amortization), SPARK_GRAFT_ITERS timed
    runs of ONE query, one JSON line on stdout."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from airflow_pipelines_from_mongo_to_postgres_spark.plans import all_queries
    from airflow_pipelines_from_mongo_to_postgres_spark.session import get_spark

    spark = get_spark("bench-iso")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()[name]
    siblings = sorted(Path(sf_dir).resolve().parent.glob("sf*"))
    warm_dir = str(siblings[0]) if siblings else sf_dir
    try:
        _run_action(q(spark, warm_dir))
    except Exception as e:
        print(f"# WARNING: warm-up {name} failed in {warm_dir}: {e}",
              file=sys.stderr)
    _clear_all_caches(spark)
    load_pre = _loadavg()[0]
    runs = []
    for _ in range(int(os.environ.get("SPARK_GRAFT_ITERS", "3"))):
        t0 = time.perf_counter()
        _run_action(q(spark, sf_dir))
        runs.append(time.perf_counter() - t0)
        _clear_all_caches(spark)
    # load1 pre = 1-min loadavg entering the timed loop (warm-up tax
    # included); post = leaving it — together they bracket the window
    # the runs actually executed in
    print(json.dumps({"query": name,
                      "median": round(sorted(runs)[len(runs) // 2], 3),
                      "runs": [round(r, 3) for r in runs],
                      "load1_pre": load_pre,
                      "load1_post": _loadavg()[0]}))


def _loadavg() -> list:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except (AttributeError, OSError):  # non-POSIX fallback
        return [-1.0, -1.0, -1.0]


#: queries whose isolated medians moved ±20-50% across r9/r10 with NO
#: code change (sandbox session noise) — 5 fresh-JVM runs instead of 3
#: so the median is robust enough for round-over-round adjudication
_JITTERY = {"q113_latest_shipper", "q58_corpus_build",
            "q134_corpus_build_semantic", "q63_jaccard_pruned",
            "q144_expectations_audit",
            # r12: swung +39%/+36% on untouched code paths (two r12
            # runs vs the r11 driver session) — same noise class
            "q164_min_cost_supplier", "q142_sketch_ndv_rollup",
            # r12 driver run: +14%/+17% on untouched plans (git-verified
            # no diff) — the self-join/groupBy scheduling-jitter band
            # BASELINE.md root-caused in r7; widen the robust-median set
            "q26_ngram_jaccard_pairs", "q33_cosine_topk",
            "q20_merge_upsert"}

#: fresh-JVM iterations for the jittery set (others run
#: SPARK_GRAFT_ITERS, default 3). r12→r13: 5 → 7 — with ±15% one-run
#: noise, a 7-run median's expected deviation is under ±8%, the
#: round-over-round adjudication bar.
_JITTERY_ITERS = 7


#: settle bar/cap between isolated fresh-JVM runs (r17, VERDICT r16 #2):
#: each isolated subprocess otherwise inherits its PREDECESSOR's
#: decaying 32-thread JVM — BENCH_r16's per-query load1 markers read
#: 2.2-9.6 during "isolated" runs and inflated q108 to 4.556 s vs the
#: 2.175 s quiet-box truth. The poll mirrors run_all_checks.sh's
#: pre-bench settle, per query, with a hard cap so a busy box degrades
#: to the old behavior (the load marker still records the truth).
_SETTLE_LOAD1 = 1.5
_SETTLE_CAP_S = 75.0


def _settle() -> float:
    """Poll 1-min loadavg below _SETTLE_LOAD1 (cap _SETTLE_CAP_S);
    returns seconds waited — recorded per query in the full artifact so
    a capped-out (still-loaded) run is self-diagnosing."""
    import time

    t0 = time.monotonic()
    while (time.monotonic() - t0 < _SETTLE_CAP_S
           and _loadavg()[0] > _SETTLE_LOAD1):
        time.sleep(3.0)
    return round(time.monotonic() - t0, 1)


def _isolated_medians() -> tuple[dict, dict, dict, dict]:
    """(medians, per-iteration runs, per-query start load1, per-query
    settle wait) — the runs/load/wait maps ride into the final JSON so
    a drifted median is adjudicable from the driver's record alone
    (r15; waits r17)."""
    import subprocess

    out: dict = {}
    runs_map: dict = {}
    load_map: dict = {}
    wait_map: dict = {}
    for name in HEADLINE:
        env = dict(os.environ)
        if name in _JITTERY:
            env["SPARK_GRAFT_ITERS"] = str(max(
                _JITTERY_ITERS, int(env.get("SPARK_GRAFT_ITERS", "3"))))
        wait_map[name] = _settle()
        try:
            proc = subprocess.run(
                [sys.executable, str(Path(__file__).resolve()),
                 "--one", name],
                capture_output=True, text=True, timeout=600, env=env)
            line = [ln for ln in proc.stdout.splitlines()
                    if ln.startswith("{")][-1]
            rec = json.loads(line)
            out[name] = rec["median"]
            runs_map[name] = rec["runs"]
            load_map[name] = rec.get("load1_pre", -1.0)
            print(f"# isolated {name}: median {rec['median']}s of "
                  f"{rec['runs']} (load1 {load_map[name]}, settled "
                  f"{wait_map[name]}s)", file=sys.stderr)
        except Exception as e:
            print(f"# WARNING: isolated {name} failed: {e}", file=sys.stderr)
    return out, runs_map, load_map, wait_map


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        _run_one(sys.argv[2])
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from airflow_pipelines_from_mongo_to_postgres_spark.plans import all_queries
    from airflow_pipelines_from_mongo_to_postgres_spark.session import get_spark

    # the default 100-entry codegen class cache evicts early queries'
    # compiled classes across a 21-query warm-up, so a late query's first
    # timed run pays full Janino recompilation — size the cache to the
    # suite (cluster-relevant too: long-lived sessions serve many plans)
    spark = get_spark("bench", extra_conf={
        "spark.sql.codegen.cache.maxEntries": "2000"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # Warm-up: run the SAME queries once at the smallest SF (not timed).
    # The text-pipeline expression trees cost 2-4s of one-time Janino/JIT
    # compilation; steady-state throughput is what the benchmark is for —
    # on a long-lived cluster session that compile is amortized to zero.
    # Derived from the sf_dir layout (smallest sibling, else sf_dir itself)
    # so a custom SPARK_GRAFT_SF_DIR still warms up; a failed warm-up query
    # logs loudly — silently skipping it would hand its compile cost to the
    # first timed run and skew round-over-round comparisons.
    siblings = sorted(Path(sf_dir).resolve().parent.glob("sf*"))
    warm_dir = str(siblings[0]) if siblings else sf_dir
    for name in HEADLINE:
        try:
            _run_action(qs[name](spark, warm_dir))
        except Exception as e:  # warm-up must never sink the bench
            print(f"# WARNING: warm-up {name} failed in {warm_dir}: {e}",
                  file=sys.stderr)
    _clear_all_caches(spark)

    load_start = _loadavg()
    iters = int(os.environ.get("SPARK_GRAFT_ITERS", "3"))
    timings: dict[str, float] = {}
    session_runs: dict[str, list] = {}
    for name in HEADLINE:
        runs = []
        for _ in range(iters):
            t0 = time.perf_counter()
            _run_action(qs[name](spark, sf_dir))
            runs.append(time.perf_counter() - t0)
            _clear_all_caches(spark)
        timings[name] = round(sorted(runs)[len(runs) // 2], 3)
        session_runs[name] = [round(r, 3) for r in runs]
        print(f"# {name}: median {timings[name]}s of "
              f"{session_runs[name]}", file=sys.stderr)

    if os.environ.get("SPARK_GRAFT_NO_ISOLATED"):
        isolated, iso_runs, iso_load, iso_wait = {}, {}, {}, {}
    else:
        isolated, iso_runs, iso_load, iso_wait = _isolated_medians()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # PRIMARY metric = isolated_total (fresh-JVM per-query medians):
    # r7-r10 showed in-session totals carry shared-JVM session tax that
    # moves ±20-50% on untouched queries whenever suite composition or
    # cache policy changes — isolated medians are the round-over-round
    # comparable column. In-session stays as a diagnostic.
    full_out = os.environ.get("SPARK_GRAFT_BENCH_FULL_OUT",
                              str(REPO / "BENCH_FULL.json"))
    compact = {
        "metric": "headline_queries_total",
        "value": (round(sum(isolated.values()), 3) if isolated
                  else round(sum(timings.values()), 3)),
        "value_is": ("isolated_total (fresh-JVM medians)" if isolated
                     else "in_session_total (isolated pass skipped)"),
        "unit": "sec",
        # the driver contract's per-query map carries the COMPARABLE
        # column (isolated medians); in-session medians live in the
        # full artifact. "queries_is" names the column (r17, ADVICE
        # r16: pre-r16 records carried in-session medians under this
        # key — the marker keeps old and new records from being
        # compared column-mixed)
        "queries": dict(isolated) if isolated else timings,
        "queries_is": ("isolated_medians" if isolated
                       else "in_session_medians"),
        "in_session_total": round(sum(timings.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "load": {"start": load_start, "end": _loadavg(),
                 "cpus": os.cpu_count()},
        "full": os.path.basename(full_out),
    }
    if isolated:
        compact["isolated_total"] = round(sum(isolated.values()), 3)
    full = dict(compact)
    full.update({
        "in_session_queries": timings,
        # r15 evidence-completeness: full per-iteration arrays + load
        # markers — see module docstring
        "iterations": {"in_session": session_runs, "isolated": iso_runs},
        "load": {**compact["load"],
                 "isolated_per_query_load1": iso_load,
                 "isolated_per_query_settle_wait_s": iso_wait},
    })
    try:
        with open(full_out, "w") as fh:
            json.dump(full, fh, indent=1)
            fh.write("\n")
    except OSError as e:  # a read-only checkout must not sink the bench
        print(f"# WARNING: could not write {full_out}: {e}",
              file=sys.stderr)
    line = json.dumps(compact)
    # the driver stores only the LAST 2,000 stdout chars — a final line
    # over that cap silently becomes "parsed": null (r14/r15 incident)
    assert len(line) < 2000, (
        f"compact bench line is {len(line)} chars (cap 2000) — trim it")
    print(line)


if __name__ == "__main__":
    main()
