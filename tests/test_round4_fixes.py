"""Round-4 guards from ADVICE.md / VERDICT.md (r3).

1. embedding_neardup_pairs hash-oracle rides on floor(cosine*1e6) and a
   >= 0.42 cutoff evaluated independently by Spark and DuckDB; a 1-ulp
   cross-engine difference at either boundary would flip a row.  This
   test certifies (on the exact driver fixture, sf0.01) that no pair's
   cosine sits within epsilon of the threshold or of an e6 floor
   boundary, so the dual-engine comparison cannot flake.
"""

import os
import time

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF001 = os.environ.get("SPARK_GRAFT_SF001_DIR", "/root/testdata/sf0.01")


def _load_embeddings():
    t = pq.read_table(f"{SF001}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    return ids, mat


def test_embedding_neardup_oracle_boundaries_are_safe():
    _, mat = _load_embeddings()
    norms = np.linalg.norm(mat, axis=1)
    cos = (mat @ mat.T) / np.outer(norms, norms)
    iu = np.triu_indices(len(mat), k=1)
    c = cos[iu]
    # cross-engine double arithmetic differs by ~1e-12 at worst (same
    # math, different summation grouping); demand 1000x headroom.
    threshold_margin = np.abs(c - 0.42).min()
    assert threshold_margin > 1e-9, (
        f"a pair's cosine is {threshold_margin} from the 0.42 cutoff — "
        "the embedding_neardup_pairs hash oracle could flip"
    )
    above = c[c >= 0.42]
    assert len(above) > 0  # the query is non-degenerate on the fixture
    e6 = above * 1_000_000.0
    floor_margin = np.minimum(e6 - np.floor(e6), np.ceil(e6) - e6).min()
    assert floor_margin > 1e-6, (
        f"an emitted cosine_e6 is {floor_margin} ulp-e6 from a floor "
        "boundary — the hash oracle could flip"
    )


def test_gapfill_stream_late_passthrough_does_not_crash_timeout(spark, tmp_path):
    """ADVICE r3 (medium): on the pass-through path (late duplicate turn
    with turn_idx <= last_idx but a fresh event time) state's last_us
    stays old; if last_us + TTL is already behind the watermark,
    setTimeoutTimestamp raised INVALID_TIMEOUT_TIMESTAMP and killed the
    query.  The fix clamps the timeout to watermark + 1 ms."""
    from biomed_timeseries_preprocessing_spark.streaming.gapfill_stream import (
        run_gapfill_to_memory,
    )

    path = str(tmp_path / "lateturns")
    os.makedirs(path)
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    h = pd.Timedelta(hours=1)

    def write_batch(rows):
        rows = [(*r[:-1], r[-1].to_pydatetime()) for r in rows]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.2)

    # batch 1: conv A head — state.last_us = t0 + 1 minute
    write_batch([("A", 0, "user", "a0", None, t0), ("A", 1, "agent", "a1", None, t0 + h / 60)])
    # batch 2: conv B far ahead — after this batch the watermark jumps
    # way past A's last_us + TTL (1h)
    write_batch([("B", 0, "user", "b0", None, t0 + 10 * h)])
    # batch 3: a LATE DUPLICATE of A turn 1 with a fresh event time: it
    # passes the watermark filter, takes the pass-through branch
    # (turn_idx <= last_idx, last_us unchanged), and pre-fix the TTL
    # re-registration crashed the query
    write_batch([("A", 1, "agent", "a1-dup", None, t0 + 10 * h + h / 60)])

    got = run_gapfill_to_memory(
        spark, path, "t_gapfill_late", state_ttl_sec=3600, watermark_delay="1 minute"
    ).toPandas()
    # the query survived and the late row passed through un-filled
    a_rows = got[(got["conv_id"] == "A") & (got["turn_idx"] == 1)]
    assert len(a_rows) == 2 and not a_rows["is_gap_filled"].any()
