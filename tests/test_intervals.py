"""Interval operator tests mirroring the reference's edge cases:
4-case overlap merge (Additional_Operator.py:90-108), label gap-fill
head/mid/tail holes + same-label merge (Extract_Transform_Labeler.py:49-70),
zero-run detection (Additional_Operator.py:61-73), label policies
(Window_Labeler.py:84-150)."""

import datetime as dt

from pyspark.sql import functions as F

from biomed_timeseries_preprocessing_spark.operators.derive import with_derived
from biomed_timeseries_preprocessing_spark.operators.intervals import (
    anti_join_excludes,
    fill_label_gaps,
    label_windows_any,
    label_windows_majority,
    label_windows_soft,
    merge_intervals,
    overlap_join_windows,
    range_join_points,
    zero_runs,
)
from biomed_timeseries_preprocessing_spark.sources.synth import synth_flatline_transcripts

T0 = dt.datetime(2026, 1, 1)


def ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def iv_df(spark, rows):
    return spark.createDataFrame(
        [(c, ts(a), ts(b), lab) for c, a, b, lab in rows],
        "conv_id string, start_ts timestamp, end_ts timestamp, label string",
    )


def test_merge_intervals_four_cases(spark):
    # disjoint | overlap | contained | adjacent-touching
    iv = iv_df(
        spark,
        [
            ("c", 0, 10, "x"),
            ("c", 20, 30, "x"),   # disjoint -> separate island
            ("c", 25, 40, "x"),   # overlaps previous
            ("c", 26, 28, "x"),   # contained
            ("c", 40, 50, "x"),   # touching (end==start) -> merged (half-open)
            ("c", 60, 70, "x"),
        ],
    )
    got = sorted(
        (r["start_ts"], r["end_ts"]) for r in merge_intervals(iv).collect()
    )
    assert got == [(ts(0), ts(10)), (ts(20), ts(50)), (ts(60), ts(70))]


def test_fill_label_gaps_head_mid_tail(spark):
    iv = iv_df(spark, [("c", 10, 20, "A"), ("c", 30, 40, "A"), ("c", 40, 50, "B")])
    spans = spark.createDataFrame(
        [("c", ts(0), ts(60))], "conv_id string, span_start timestamp, span_end timestamp"
    )
    got = sorted(
        (r["start_ts"], r["end_ts"], r["label"])
        for r in fill_label_gaps(iv, spans).collect()
    )
    assert got == [
        (ts(0), ts(10), "Background"),   # head hole
        (ts(10), ts(20), "A"),
        (ts(20), ts(30), "Background"),  # mid hole
        (ts(30), ts(40), "A"),
        (ts(40), ts(50), "B"),
        (ts(50), ts(60), "Background"),  # tail back-fill
    ]


def test_fill_keeps_spanless_conversations(spark):
    """ADVICE r5: a conv_id absent from spans must keep its original
    intervals (left join; gap/tail fill are null-safe no-ops there) —
    the r5 inner join silently dropped them."""
    iv = iv_df(
        spark,
        [("c", 10, 20, "A"), ("c", 30, 40, "B"), ("d", 0, 5, "A")],
    )
    spans = spark.createDataFrame(
        [("c", ts(0), ts(50))],
        "conv_id string, span_start timestamp, span_end timestamp",
    )
    got = sorted(
        (r["conv_id"], r["start_ts"], r["end_ts"], r["label"])
        for r in fill_label_gaps(iv, spans).collect()
    )
    assert got == [
        ("c", ts(0), ts(10), "Background"),
        ("c", ts(10), ts(20), "A"),
        ("c", ts(20), ts(30), "Background"),
        ("c", ts(30), ts(40), "B"),
        ("c", ts(40), ts(50), "Background"),
        ("d", ts(0), ts(5), "A"),  # span-less conv: intervals kept, no fill
    ]


def test_fill_merges_adjacent_same_label(spark):
    iv = iv_df(spark, [("c", 0, 10, "A"), ("c", 10, 20, "A")])
    spans = spark.createDataFrame(
        [("c", ts(0), ts(20))], "conv_id string, span_start timestamp, span_end timestamp"
    )
    got = fill_label_gaps(iv, spans).collect()
    assert len(got) == 1 and got[0]["start_ts"] == ts(0) and got[0]["end_ts"] == ts(20)


def _points(spark):
    return spark.createDataFrame(
        [("c", i, ts(s)) for i, s in enumerate([5, 15, 25, 35])],
        "conv_id string, turn_idx int, ts timestamp",
    )


def test_range_join_and_exclude(spark):
    pts = _points(spark)
    iv = iv_df(spark, [("c", 10, 30, "L")])
    hit = range_join_points(pts, iv, coarse_seconds=20).collect()
    assert sorted(r["turn_idx"] for r in hit) == [1, 2]
    kept = anti_join_excludes(pts, iv.select("conv_id", "start_ts", "end_ts"), 20)
    assert sorted(r["turn_idx"] for r in kept.collect()) == [0, 3]


def test_label_policies(spark):
    win = spark.createDataFrame(
        [("c", ts(0), ts(100))],
        "conv_id string, win_start timestamp, win_end timestamp",
    )
    iv = iv_df(spark, [("c", 0, 60, "A"), ("c", 60, 90, "B"), ("c", 85, 95, "S")])
    ov = overlap_join_windows(win, iv, coarse_seconds=50)
    maj = label_windows_majority(ov, ["conv_id", "win_start"]).collect()[0]
    assert maj["label"] == "A"  # 60s beats 30s and 10s
    soft = {
        r["label"]: r["weight"]
        for r in label_windows_soft(ov, ["conv_id", "win_start"]).collect()
    }
    assert abs(sum(soft.values()) - 1.0) < 1e-12
    assert soft["A"] == 60_000_000 / 100_000_000
    anyl = label_windows_any(ov, ["conv_id", "win_start"], "S").collect()[0]
    assert anyl["is_positive"] == 1 and anyl["positive_us"] == 10_000_000


def test_zero_runs_on_flatline_fixture(spark):
    t = synth_flatline_transcripts(spark, 8)
    d = with_derived(t)
    runs = zero_runs(d, "token_count", min_len=16).collect()
    assert len(runs) > 0
    for r in runs:
        assert r["run_len"] >= 16
        # the fixture plants its zero-runs inside turn range [20, 39]
        assert r["start_idx"] >= 20 and r["end_idx"] <= 39
    # conversations without a planted run produce none
    convs_with = {r["conv_id"] for r in runs}
    all_convs = {r["conv_id"] for r in t.select("conv_id").distinct().collect()}
    assert convs_with < all_convs


def test_zero_run_boundary_not_detected_below_min(spark):
    rows = [("c", i, "" if 5 <= i < 20 else "w", ts(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string, ts timestamp")
    d = df.withColumn("token_count", F.when(F.col("text") == "", 0).otherwise(1))
    assert zero_runs(d, "token_count", min_len=16).count() == 0  # run is 15 long
    assert zero_runs(d, "token_count", min_len=15).count() == 1
