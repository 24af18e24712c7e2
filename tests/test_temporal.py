"""As-of join (union+window impl), range join, and winnowing fingerprints.

The reference has no temporal analytics; these are engine extension
operators (SURVEY.md §7). asof_join is additionally oracle-checked against
DuckDB's native ASOF JOIN in plans/temporal.py (q42).
"""

from __future__ import annotations

import hashlib
from datetime import datetime

from pyspark.sql import functions as F

from airflow_pipelines_from_mongo_to_postgres_spark.operators.fingerprint import (
    winnow_fingerprints,
)
from airflow_pipelines_from_mongo_to_postgres_spark.operators.temporal import (
    asof_join,
    range_join,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _trades(spark):
    return spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 10:00:00")),
         (2, "u1", _ts("2024-01-01 12:00:00")),
         (3, "u2", _ts("2024-01-01 11:00:00")),
         (4, "u3", _ts("2024-01-01 09:00:00"))],
        ["trade_id", "user", "ts"])


def _quotes(spark):
    return spark.createDataFrame(
        [("u1", _ts("2024-01-01 09:30:00"), 10.0),
         ("u1", _ts("2024-01-01 10:00:00"), 11.0),   # ties trade 1 exactly
         ("u1", _ts("2024-01-01 11:59:00"), 12.0),
         ("u2", _ts("2024-01-01 11:30:00"), 99.0)],  # after trade 3
        ["user", "ts", "px"])


def test_asof_backward_picks_latest_at_or_before(spark):
    out = {r.trade_id: (r.px, r.asof_ts)
           for r in asof_join(_trades(spark), _quotes(spark), ["user"],
                              "ts", "ts", ["px"]).collect()}
    assert out[1] == (11.0, _ts("2024-01-01 10:00:00"))  # equal ts visible
    assert out[2] == (12.0, _ts("2024-01-01 11:59:00"))
    assert out[3] == (None, None)   # only later quotes for u2
    assert out[4] == (None, None)   # no quotes at all for u3


def test_asof_strict_excludes_equal_ts(spark):
    out = {r.trade_id: r.px
           for r in asof_join(_trades(spark), _quotes(spark), ["user"],
                              "ts", "ts", ["px"], strict=True).collect()}
    assert out[1] == 10.0  # 10:00 quote no longer visible at 10:00 trade


def test_asof_preserves_left_rowcount(spark):
    assert asof_join(_trades(spark), _quotes(spark), ["user"],
                     "ts", "ts", ["px"]).count() == 4


def test_range_join_half_open_bounds(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        ["lid", "user", "start_ts", "end_ts"])
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01 10:00:00"), "at-start"),    # excluded (>)
         ("u1", _ts("2024-01-01 10:30:00"), "inside"),
         ("u1", _ts("2024-01-01 11:00:00"), "at-end"),      # included (<=)
         ("u1", _ts("2024-01-01 11:00:01"), "after"),
         ("u2", _ts("2024-01-01 10:30:00"), "other-key")],
        ["user", "ts", "tag"])
    got = {r.r_tag for r in
           range_join(left, right, ["user"], "start_ts", "end_ts", "ts").collect()}
    assert got == {"inside", "at-end"}


def _py_winnow(text: str, k: int, w: int) -> set[tuple[str, int]]:
    toks = [t for t in text.lower().split() if t]
    grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:7], 16) for g in grams]
    if not hs:
        return set()
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[i:i + w]) for i in range(len(hs) - w + 1)}


def test_winnow_matches_python_reference(spark):
    docs = [(1, "the quick brown fox jumps over the lazy dog today"),
            (2, "one two three four"),
            (3, "short doc"),           # < k tokens → no fingerprints
            (4, "a b c d e")]           # k ≤ grams < w → global min only
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df, "doc_id", "text", k=3, w=4).collect():
        got.setdefault(r.doc, set()).add(r.fp)
    for doc_id, text in docs:
        assert got.get(doc_id, set()) == _py_winnow(text, 3, 4), doc_id


def test_winnow_shared_substring_shares_fingerprint(spark):
    # Winnowing guarantee: a shared run of ≥ w+k-1 tokens ⇒ ≥1 shared fp.
    common = "alpha beta gamma delta epsilon zeta"  # 6 = w+k-1 tokens
    df = spark.createDataFrame(
        [(1, "intro words here " + common), (2, common + " trailing stuff")],
        ["doc_id", "text"])
    fps = winnow_fingerprints(df, "doc_id", "text", k=3, w=4)
    shared = (fps.groupBy("fp").agg(F.countDistinct("doc").alias("n"))
              .filter(F.col("n") == 2).count())
    assert shared >= 1


def test_asof_forward_picks_earliest_at_or_after(spark):
    out = {r.trade_id: r for r in
           asof_join(_trades(spark), _quotes(spark), ["user"], "ts", "ts",
                     ["px"], direction="forward").collect()}
    assert out[1].px == 11.0                      # equal ts visible forward too
    assert out[2].px is None                      # no quote after 12:00 for u1
    assert out[3].px == 99.0                      # 11:30 is first at-or-after 11:00
    assert out[4].px is None                      # u3 has no quotes at all


def test_asof_tolerance_nulls_far_matches(spark):
    # backward with 15-minute tolerance: trade 2 (12:00) matches the 11:59
    # quote (inside), trade 1 (10:00) matches its exact-tie quote (0 min),
    # but a wide-gap match must null out.
    out = {r.trade_id: r for r in
           asof_join(_trades(spark), _quotes(spark), ["user"], "ts", "ts",
                     ["px"], tolerance="15 minutes").collect()}
    assert out[1].px == 11.0 and out[2].px == 12.0
    # forward with a 10-minute tolerance: trade 3 (11:00) -> 11:30 quote is
    # 30 min away, outside tolerance -> nulled
    fwd = {r.trade_id: r for r in
           asof_join(_trades(spark), _quotes(spark), ["user"], "ts", "ts",
                     ["px"], direction="forward",
                     tolerance="10 minutes").collect()}
    assert fwd[3].px is None and fwd[3].asof_ts is None
    assert fwd[1].px == 11.0


def test_funnel_ordering_invariants(spark, sf_dir):
    """q114: step timestamps are strictly increasing where present,
    depth counts the non-null steps, and a later step never exists
    without its predecessor."""
    from airflow_pipelines_from_mongo_to_postgres_spark.plans.temporal import q114_funnel

    rows = q114_funnel(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.t_click is not None:
            assert r.t_click > r.t_view
        if r.t_purchase is not None:
            assert r.t_click is not None and r.t_purchase > r.t_click
        assert r.funnel_depth == 1 + (r.t_click is not None) \
            + (r.t_purchase is not None)


def test_twap_bounded_by_value_range(spark, sf_dir):
    """q116: a weighted average must sit within [min, max] of the user's
    observed values (excluding the weightless last observation), and the
    observed span must equal last-first in microseconds."""
    from pyspark.sql import functions as F

    from airflow_pipelines_from_mongo_to_postgres_spark.plans.temporal import q116_twap
    from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import load_table

    got = {r.user_id: r for r in q116_twap(spark, sf_dir).collect()}
    e = load_table(spark, "events", sf_dir)
    bounds = {r.user_id: r for r in
              e.groupBy("user_id").agg(
                  F.min("value").alias("lo"), F.max("value").alias("hi"),
                  (F.unix_micros(F.max("ts").cast("timestamp"))
                   - F.unix_micros(F.min("ts").cast("timestamp")))
                  .alias("span")).collect()}
    assert got
    for uid, r in got.items():
        b = bounds[uid]
        assert b.lo - 1e-9 <= r.twap <= b.hi + 1e-9
        assert r.observed_us == b.span


def test_ohlc_invariants(spark, sf_dir):
    """q117: low <= open, close <= high for every candle, and candle
    event counts sum to the table count."""
    from airflow_pipelines_from_mongo_to_postgres_spark.plans.temporal import q117_ohlc
    from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import load_table

    rows = q117_ohlc(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
    total = load_table(spark, "events", sf_dir).count()
    assert sum(r.n_events for r in rows) == total


def test_range_join_bucketed_matches_plain_range_join(spark):
    """Keyless banding parity: the cell-explode equi join must produce
    exactly the plain band-predicate result (each qualifying pair once —
    the one-cell-per-right-row argument), including the half-open
    bounds, and regardless of where intervals straddle cell edges."""
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.temporal import (
        range_join_bucketed,
    )

    left = spark.createDataFrame(
        [(i, _ts(f"2024-01-01 10:{i:02d}:30"),
          _ts(f"2024-01-01 10:{i + 7:02d}:30")) for i in range(0, 40, 3)],
        ["lid", "start_ts", "end_ts"])
    right = spark.createDataFrame(
        [(j, _ts(f"2024-01-01 10:{j:02d}:{15 * (j % 4):02d}"), float(j))
         for j in range(50)],
        ["rid", "ts", "v"])

    plain = {(r.lid, r.r_rid) for r in
             range_join(left, right, [], "start_ts", "end_ts", "ts").collect()}
    banded = {(r.lid, r.r_rid) for r in
              range_join_bucketed(left, right, "start_ts", "end_ts", "ts",
                                  bucket="5 minutes").collect()}
    assert plain and banded == plain


def test_range_join_bucketed_width_is_timezone_independent(spark):
    """The bucket width derives from the interval literal at an
    explicit-UTC anchor: an off-UTC session timezone must not inflate
    cell size (tz_offset + bucket was the old bug — results stayed
    right but the explode fan-out silently ballooned)."""
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.temporal import (
        range_join_bucketed,
    )

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:30"), _ts("2024-01-01 10:04:30"))],
        ["lid", "start_ts", "end_ts"])
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:02:00"), 1.0),
         (2, _ts("2024-01-01 10:09:00"), 2.0)],
        ["rid", "ts", "v"])
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.temporal import (
        _interval_micros,
    )

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        # the width itself: with the old epoch-string anchor this came
        # back as tz_offset + bucket (hours, not minutes) off-UTC
        width = spark.range(1).select(
            _interval_micros("2 minutes").alias("w")).first().w
        assert width == 120_000_000
        out = range_join_bucketed(left, right, "start_ts", "end_ts", "ts",
                                  bucket="2 minutes")
        assert {r.r_rid for r in out.collect()} == {1}
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_range_join_bucketed_salted_parity(spark):
    """salt > 1 spreads hot cells across tasks without changing the
    result: salted output == unsalted output == plain band join."""
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.temporal import (
        range_join_bucketed,
    )

    left = spark.createDataFrame(
        [(i, _ts(f"2024-01-01 10:{i:02d}:30"),
          _ts(f"2024-01-01 10:{i + 6:02d}:30")) for i in range(0, 30, 2)],
        ["lid", "start_ts", "end_ts"])
    right = spark.createDataFrame(
        [(j, _ts(f"2024-01-01 10:{j % 40:02d}:{(j * 13) % 60:02d}"),
          float(j)) for j in range(120)],
        ["rid", "ts", "v"])

    plain = {(r.lid, r.r_rid) for r in
             range_join(left, right, [], "start_ts", "end_ts", "ts").collect()}
    for s in (1, 4):
        got = {(r.lid, r.r_rid) for r in
               range_join_bucketed(left, right, "start_ts", "end_ts", "ts",
                                   bucket="4 minutes", salt=s).collect()}
        assert got == plain and plain
