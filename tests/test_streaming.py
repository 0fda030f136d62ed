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


def test_streaming_rollup_watermark_drops_late_rows(spark, tmp_path):
    """COVERAGE §2.9 late-data row (VERDICT r5 #6): rows arriving past
    the watermark are DROPPED from the streaming 1m tier and counted in
    numRowsDroppedByWatermark; the finalized window keeps its on-time
    counts. Reference analog: the restart/exclude semantics of
    Window_Labeler.py:51-62 (late contributions never mutate an
    already-emitted window)."""
    import os
    import time

    from biomed_timeseries_preprocessing_spark.streaming.rollup_stream import (
        streaming_rollup_1m,
    )

    path = str(tmp_path / "late_derived")
    schema = "conv_id string, turn_idx int, ts timestamp, latency_ms long, token_count int"
    mk_schema = "conv_id string, turn_idx int, ts string, latency_ms long, token_count int"
    # batch 0 (on time): 3 rows in minute M0, plus one row 40 min later
    # so the 10-min watermark advances past M0's window end
    on_time = spark.createDataFrame(
        [
            ("c", 0, "2026-01-01 00:00:10", None, 3),
            ("c", 1, "2026-01-01 00:00:20", 10000, 4),
            ("c", 2, "2026-01-01 00:00:40", 20000, 5),
            ("c", 3, "2026-01-01 00:40:00", 2360000, 6),
        ],
        mk_schema,
    ).selectExpr("conv_id", "turn_idx", "cast(ts as timestamp) ts", "latency_ms", "token_count")
    on_time.coalesce(1).write.parquet(path)
    time.sleep(1.1)  # FileStreamSource orders batches by mod time
    # an intermediate fresh batch: Spark's late-event filter uses the
    # PREVIOUS batch's watermark (eviction uses the current one,
    # SPARK-40025 semantics), so the watermark must be in effect for one
    # batch before late rows are dropped
    fresh = spark.createDataFrame(
        [("c", 4, "2026-01-01 00:45:00", 300000, 2)], mk_schema
    ).selectExpr("conv_id", "turn_idx", "cast(ts as timestamp) ts", "latency_ms", "token_count")
    fresh.coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)
    late = spark.createDataFrame(
        [
            ("c", 10, "2026-01-01 00:00:50", 1, 7),  # inside M0, < watermark
            ("c", 11, "2026-01-01 00:00:55", 2, 8),
        ],
        mk_schema,
    ).selectExpr("conv_id", "turn_idx", "cast(ts as timestamp) ts", "latency_ms", "token_count")
    late.coalesce(1).write.mode("append").parquet(path)

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        streaming_rollup_1m(src)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # one extra empty trigger lets the watermark finalize M0
        q.processAllAvailable()
        dropped = sum(
            so.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for so in p.get("stateOperators", [])
        )
        out = spark.table("t_late").toPandas()
    finally:
        q.stop()
    # both late rows fall in one (conv, window) group, so the map-side
    # partial aggregate reaches the state store as ONE row — the metric
    # counts post-partial rows
    assert dropped == 1, f"expected the late partial row dropped, got {dropped}"
    m0 = out[out["bucket_start"] == pd.Timestamp("2026-01-01 00:00:00")]
    assert len(m0) == 1 and int(m0["cnt"].iloc[0]) == 3  # on-time rows only
    assert int(m0["sum_tokens"].iloc[0]) == 12  # 3+4+5: late 7/8 excluded
