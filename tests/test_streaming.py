"""Streaming 1m tier == batch 1m tier when the same turns are replayed
(completed-bucket equivalence), plus watermark late-drop behavior."""

import pandas as pd

from biomed_timeseries_preprocessing_spark.operators.derive import with_derived
from biomed_timeseries_preprocessing_spark.operators.rollup import rollup_from_turns
from biomed_timeseries_preprocessing_spark.streaming.rollup_stream import run_stream_to_memory


def canon(pdf):
    return (
        pdf[sorted(pdf.columns)]
        .sort_values(["conv_id", "bucket_start"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_stream_replay_matches_batch(spark, small_transcripts, tmp_path):
    derived = with_derived(small_transcripts).select(
        "conv_id", "turn_idx", "ts", "latency_ms", "token_count"
    )
    path = str(tmp_path / "derived")
    derived.repartition(6).write.parquet(path)  # several files → several micro-batches
    got = canon(run_stream_to_memory(spark, path, "t_stream").toPandas())
    want = canon(rollup_from_turns(with_derived(small_transcripts), "1m").toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
