"""Stateful streaming sessionization: state must survive micro-batch
boundaries and closed sessions must equal the batch gaps-and-islands
result (minus each conversation's still-open tail session)."""

import datetime as dt
import os
import time

from biomed_timeseries_preprocessing_spark.streaming.sessions_stream import (
    run_sessions_to_memory,
)

T0 = dt.datetime(2026, 1, 1)


def ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_stateful_sessions_across_microbatches(spark, tmp_path):
    # conv a: sessions [0..10], [60..70], open tail [140..]
    # conv b: one session [0..5], open tail [200..]
    slice_a = [
        ("a", ts(0)), ("a", ts(5)), ("a", ts(10)),
        ("b", ts(0)), ("b", ts(5)),
    ]
    # the second slice closes a's first gap in a LATER micro-batch
    slice_b = [
        ("a", ts(60)), ("a", ts(70)), ("a", ts(140)),
        ("b", ts(200)),
    ]
    path = str(tmp_path / "turns")
    os.makedirs(path)
    spark.createDataFrame(slice_a, "conv_id string, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(path)
    time.sleep(1.2)  # distinct mtimes → deterministic file pickup order
    spark.createDataFrame(slice_b, "conv_id string, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(path)

    out = run_sessions_to_memory(spark, path, "t_sessions", expected_rows=3).collect()
    got = sorted((r["conv_id"], r["session_start"], r["session_end"], r["n_turns"]) for r in out)
    want = sorted(
        [
            ("a", ts(0), ts(10), 3),     # closed by the 60' turn (later batch!)
            ("a", ts(60), ts(70), 2),    # closed by the 140' turn
            ("b", ts(0), ts(5), 2),      # closed by the 200' turn
        ]
    )
    assert got == want  # open tails ([140..], [200..]) correctly withheld
