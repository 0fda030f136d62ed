"""Streaming gap-fill: replay of a static table through the stateful
operator must equal the batch gapfill output bit-for-bit, including
gaps whose bounding turn arrives in a LATER micro-batch."""

import os
import time

import pandas as pd

from pyspark.sql import functions as F

from biomed_timeseries_preprocessing_spark.operators.gapfill import gapfill
from biomed_timeseries_preprocessing_spark.streaming.gapfill_stream import (
    run_gapfill_to_memory,
)


def test_stream_replay_equals_batch_gapfill(spark, tmp_path, small_transcripts):
    path = str(tmp_path / "turns")
    os.makedirs(path)
    # split every conversation across two micro-batches so gaps spanning
    # the split are bounded only by a later batch's first turn
    lo = small_transcripts.filter(F.col("turn_idx") < 10)
    hi = small_transcripts.filter(F.col("turn_idx") >= 10)
    lo.coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.2)  # distinct mtimes → deterministic file pickup order
    hi.coalesce(1).write.mode("append").parquet(path)

    got = (
        run_gapfill_to_memory(spark, path, "t_gapfill")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = (
        gapfill(small_transcripts)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False, check_exact=True
    )
    assert got["is_gap_filled"].sum() > 0  # the stream really filled gaps
