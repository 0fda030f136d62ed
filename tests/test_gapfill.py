"""Gap-fill unit tests mirroring the reference's edge cases
(Extract_Transform_Labeler.py:49-75: head/mid/tail holes, Background
fill) plus the per-turn text-equality invariant (input_hint)."""

import datetime as dt

import pandas as pd

from biomed_timeseries_preprocessing_spark.operators.gapfill import gapfill
from biomed_timeseries_preprocessing_spark.oracle import ref as oracle
from biomed_timeseries_preprocessing_spark.sources.ingest import text_equality_violations


def test_gapfill_matches_oracle(spark, small_transcripts):
    got = (
        gapfill(small_transcripts)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        oracle.gapfill_pdf(small_transcripts.toPandas())
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False, check_exact=True
    )


def test_gapfill_counts(spark, small_transcripts):
    filled = gapfill(small_transcripts)
    n_in = small_transcripts.count()
    out = filled.count()
    n_gaps = filled.filter("is_gap_filled").count()
    assert out == n_in + n_gaps
    assert n_gaps > 0  # generator drops ~5% of turns


def test_text_equality_invariant(spark, small_transcripts):
    """Original turns come through gap-fill byte-identical."""
    filled = gapfill(small_transcripts).filter("NOT is_gap_filled")
    assert text_equality_violations(small_transcripts, filled).count() == 0
    assert filled.count() == small_transcripts.count()


def test_no_head_tail_extrapolation(spark):
    """Grid is bounded by each conversation's min/max present turn —
    the engine never invents turns before the first or after the last."""
    rows = [
        ("c1", 2, "user", "a", None, dt.datetime(2026, 1, 1, 0, 0, 0)),
        ("c1", 5, "assistant", "b", None, dt.datetime(2026, 1, 1, 0, 0, 30)),
        ("c2", 0, "user", "only", None, dt.datetime(2026, 1, 1)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = gapfill(df).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(got["turn_idx"]) == [2, 3, 4, 5, 0]
    assert list(got["is_gap_filled"]) == [False, True, True, False, False]
    # exact integer interpolation: 30s over 3 steps = 10s each
    sec = got["ts"].dt.second.tolist()
    assert sec[:4] == [0, 10, 20, 30]
    # role forward-fills, text gets the default
    assert got.loc[1, "role"] == "user" and got.loc[1, "text"] == ""
