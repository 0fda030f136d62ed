"""F2 frequency-domain filter: numpy-kernel known answers, Spark ==
numpy bit-exact, idempotence, Nyquist clamp (reference semantics:
filter_signals, edf_reader.py:448-473)."""

import struct

import numpy as np
import pytest

from biomed_timeseries_preprocessing_spark.functions.filters import (
    band_reconstruction,
    bandpass_np,
    bandpass_series,
    clamp_cutoffs,
)


def _sine(f, n=256, fs=64.0):
    t = np.arange(n) / fs
    return np.sin(2 * np.pi * f * t)


def test_bandpass_passes_inband_rejects_outband():
    fs, n = 64.0, 256
    x = _sine(4.0, n, fs) + _sine(20.0, n, fs) + 3.0  # DC + 4 Hz + 20 Hz
    y = bandpass_np(x, fs, 2.0, 8.0)
    # 4 Hz survives untouched (bin-exact frequency), DC and 20 Hz vanish
    np.testing.assert_allclose(y, _sine(4.0, n, fs), atol=1e-10)
    hp = bandpass_np(x, fs, 10.0, 32.0)
    np.testing.assert_allclose(hp, _sine(20.0, n, fs), atol=1e-10)
    lp = bandpass_np(x, fs, 0.0, 2.0)
    np.testing.assert_allclose(lp, np.full(n, 3.0), atol=1e-10)


def test_bandpass_zero_phase_and_idempotent():
    rng = np.random.default_rng(5)
    x = rng.normal(size=300)
    fs = 1.0
    y = bandpass_np(x, fs, 0.05, 0.2)
    # idempotence: a brick-wall mask is a projection (mask^2 == mask);
    # float-exactness is limited by the second rfft's rounding
    np.testing.assert_allclose(bandpass_np(y, fs, 0.05, 0.2), y, atol=1e-12)
    # zero phase: filtering a time-reversed signal == reversing the
    # filtered signal (no group delay, the filtfilt property)
    np.testing.assert_allclose(bandpass_np(x[::-1], fs, 0.05, 0.2), y[::-1], atol=1e-12)


def test_nyquist_clamp_and_validation():
    # reference clamp (edf_reader.py:466-469): upper cutoff >= fs/2 is
    # pulled to Nyquist instead of erroring
    assert clamp_cutoffs(1.0, 50.0, 64.0) == (1.0, 32.0)
    x = _sine(20.0, 256, 64.0)
    np.testing.assert_array_equal(
        bandpass_np(x, 64.0, 10.0, 1e9), bandpass_np(x, 64.0, 10.0, 32.0)
    )
    with pytest.raises(ValueError):
        clamp_cutoffs(-1.0, 10.0, 64.0)
    with pytest.raises(ValueError):
        clamp_cutoffs(40.0, 45.0, 64.0)  # both above Nyquist -> empty band


def test_partition_reconstructs_input():
    rng = np.random.default_rng(9)
    x = rng.normal(size=257)  # odd length: no exact-Nyquist bin branch
    fs = 1.0
    y = sum(bandpass_np(x, fs, lo, hi) for lo, hi in [(0.0, 0.1), (0.1, 0.3), (0.3, 0.5)])
    np.testing.assert_allclose(y, x, atol=1e-12)


def test_spark_bandpass_matches_numpy_bitexact(spark):
    rng = np.random.default_rng(3)
    rows = []
    series = {}
    for conv in ("a", "b"):
        n = 100 if conv == "a" else 37
        x = rng.normal(size=n)
        series[conv] = x
        rows += [(conv, i, float(x[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "conv_id string, idx int, value double").repartition(7)
    got = bandpass_series(df, fs=1.0, low_hz=0.1, high_hz=0.3).collect()
    by_conv = {}
    for r in got:
        by_conv.setdefault(r["conv_id"], {})[r["idx"]] = r["value_f"]
    for conv, x in series.items():
        want = bandpass_np(x, 1.0, 0.1, 0.3)
        have = np.array([by_conv[conv][i] for i in range(len(x))])
        np.testing.assert_array_equal(have, want)  # bit-exact


def test_band_reconstruction_err_is_exact_zero(spark):
    rng = np.random.default_rng(4)
    rows = [("c", i, float(v)) for i, v in enumerate(rng.normal(size=200) * 100)]
    df = spark.createDataFrame(rows, "conv_id string, idx int, value double")
    out = band_reconstruction(df, fs=1.0, edges=[0.0, 0.05, 0.2, 0.5], max_idx=128)
    errs = [r["recon_err"] for r in out.collect()]
    # bit-pattern zero, not just == 0.0: -0.0 passes `==` but fails a
    # value-hash comparator (round-4 driver postmortem)
    assert len(errs) == 128 and all(
        struct.pack("<d", e) == struct.pack("<d", 0.0) for e in errs
    )
    with pytest.raises(ValueError):
        band_reconstruction(df, fs=1.0, edges=[0.0, 0.2])  # doesn't span nyquist
