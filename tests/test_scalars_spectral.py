"""Scalar functions (as-of join, smoothing, znorm, one-hot) and the
STFT kernel vs straight numpy."""

import datetime as dt

import numpy as np

from pyspark.sql import functions as F

from biomed_timeseries_preprocessing_spark.functions.scalars import (
    asof_join,
    with_moving_avg,
    with_one_hot,
    with_znorm,
)
from biomed_timeseries_preprocessing_spark.functions.spectral import stft_frames_np, stft_series

T0 = dt.datetime(2026, 1, 1)


def ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def test_asof_join_semantics(spark):
    facts = spark.createDataFrame(
        [(1, "k", ts(5)), (2, "k", ts(10)), (3, "k", ts(20)), (4, "q", ts(7))],
        "event_id long, key string, ts timestamp",
    )
    dims = spark.createDataFrame(
        [("k", ts(0), "a"), ("k", ts(10), "b"), ("k", ts(15), "c")],
        "key string, dim_ts timestamp, v string",
    )
    out = {r["event_id"]: r["v"] for r in asof_join(facts, dims, key="key").collect()}
    assert out == {1: "a", 2: "b", 3: "c", 4: None}  # inclusive at equality; no dim → NULL


def test_asof_tolerance(spark):
    facts = spark.createDataFrame([(1, "k", ts(100))], "event_id long, key string, ts timestamp")
    dims = spark.createDataFrame([("k", ts(0), "old")], "key string, dim_ts timestamp, v string")
    out = asof_join(facts, dims, key="key", tolerance_us=50_000_000).collect()[0]
    assert out["v"] is None  # 100s-old dim row exceeds 50s tolerance


def test_moving_avg_partial_edges(spark):
    df = spark.createDataFrame(
        [("c", i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5])],
        "conv_id string, turn_idx int, x double",
    )
    got = {
        r["turn_idx"]: r["x_smooth"]
        for r in with_moving_avg(df, "x", k=1).collect()
    }
    assert got[0] == 1.5 and got[2] == 3.0 and got[4] == 4.5


def test_znorm_matches_numpy(spark):
    vals = [1.25, 2.50, 3.75, 10.00, -4.25]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, x double")
    got = {r["i"]: r["x_z"] for r in with_znorm(df, "x", scale=100).collect()}
    arr = np.array(vals)
    want = (arr - arr.mean()) / arr.std(ddof=1)
    for i in range(len(vals)):
        assert abs(got[i] - want[i]) < 1e-12


def test_one_hot_unknown_is_zero(spark):
    df = spark.createDataFrame([("a",), ("b",), ("zz",)], "lab string")
    rows = with_one_hot(df, "lab", ["a", "b"]).collect()
    m = {r["lab"]: (r["lab_a"], r["lab_b"]) for r in rows}
    assert m == {"a": (1, 0), "b": (0, 1), "zz": (0, 0)}


def test_stft_kernel_matches_reference_math():
    rng = np.random.default_rng(3)
    x = rng.normal(size=300)
    p = stft_frames_np(x, frame=64, hop=32)
    assert p.shape == ((300 - 64) // 32 + 1, 33)
    # manual recompute of frame 2
    seg = x[64:128] * np.hamming(64)
    z = np.maximum(np.abs(np.fft.rfft(seg)), 1e-5)
    assert np.allclose(p[2], 20 * np.log10(z), rtol=0, atol=0)  # bit-exact


def test_stft_series_spark_matches_numpy(spark):
    rng = np.random.default_rng(4)
    rows = []
    series = {}
    for conv in ("a", "b"):
        x = rng.normal(size=100)
        series[conv] = x
        rows += [(conv, i, float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "conv_id string, idx int, value double")
    out = stft_series(df, frame=32, hop=16).toPandas()
    for conv, x in series.items():
        want = stft_frames_np(x, 32, 16)
        got = out[out.conv_id == conv].sort_values(["frame_idx", "freq_bin"])
        assert np.array_equal(got["power_db"].to_numpy(), want.ravel())  # bit-exact

    # short series → zero frames, not an error (min-length guard P9)
    short = spark.createDataFrame([("s", 0, 1.0)], "conv_id string, idx int, value double")
    assert stft_series(short, frame=32, hop=16).count() == 0


def test_stft_per_bin_stats_matches_unfused(spark):
    """Fused per-conv partial-stats kernel == per_bin_stats(stft_series)
    to float-reduction tolerance (both are partition-order-dependent in
    the last ulps; the statistics are the same)."""
    import numpy as np
    import pandas as pd

    from biomed_timeseries_preprocessing_spark.functions.spectral import (
        per_bin_stats,
        stft_per_bin_stats,
    )

    rng = np.random.RandomState(7)
    rows = [
        (f"c{c}", i, float(v))
        for c in range(5)
        for i, v in enumerate(rng.rand(300) * 10)
    ]
    df = spark.createDataFrame(rows, "conv_id string, idx int, value double")
    unfused = (
        per_bin_stats(stft_series(df, frame=32, hop=16))
        .toPandas()
        .sort_values("freq_bin")
        .reset_index(drop=True)
    )
    fused = (
        stft_per_bin_stats(df, frame=32, hop=16)
        .toPandas()
        .sort_values("freq_bin")
        .reset_index(drop=True)
    )
    assert (unfused["n"] == fused["n"]).all()
    pd.testing.assert_series_equal(unfused["mean_db"], fused["mean_db"], rtol=1e-9)
    pd.testing.assert_series_equal(unfused["std_db"], fused["std_db"], rtol=1e-9)


def test_stft_per_bin_stats_sparse_identical(spark):
    """Sparse feed (points + length, kernel zero-fill) == dense feed,
    bit-exact: the densified array is the same array."""
    import pandas as pd

    from biomed_timeseries_preprocessing_spark.functions.spectral import (
        stft_per_bin_stats,
    )

    dense_rows = []
    sparse_rows = []
    for c in range(3):
        length = 200 + 40 * c
        for i in range(length):
            v = float((i * 7 + c) % 13) if (i % 5 == 0) else 0.0
            dense_rows.append((f"c{c}", i, v))
            if v != 0.0:
                sparse_rows.append((f"c{c}", i, v, length))
        # ensure the last index is present so length is recoverable
        if dense_rows[-1][2] == 0.0:
            dense_rows[-1] = (f"c{c}", length - 1, 1.0)
            sparse_rows.append((f"c{c}", length - 1, 1.0, length))
    dense = spark.createDataFrame(dense_rows, "conv_id string, idx int, value double")
    sparse = spark.createDataFrame(
        sparse_rows, "conv_id string, idx int, value double, length int"
    )
    a = (
        stft_per_bin_stats(dense, frame=32, hop=16)
        .toPandas().sort_values("freq_bin").reset_index(drop=True)
    )
    b = (
        stft_per_bin_stats(sparse, frame=32, hop=16, length_col="length")
        .toPandas().sort_values("freq_bin").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_exact=True)
