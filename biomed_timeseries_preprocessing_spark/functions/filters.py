"""Frequency-domain filtering (SURVEY §2 F2): true band-pass /
low-pass / high-pass over regular per-conversation series.

Reference parity: ``filter_signals``
(/root/reference/utils/sleep_data_prep/edf_reader.py:448-473) runs a
zero-phase Butterworth/FIR band-pass per channel (``sosfiltfilt`` /
``filtfilt``), with the Nyquist clamp at ``edf_reader.py:466-469``
(upper cutoff pulled below fs/2), and ``pop_eeg_filtnew``
(``sleep_data_utils.py:84-91``) is the same idea via mne's
``phase='zero'`` FIR. This engine keeps the two semantics that matter —
**zero phase** (no group delay: y[i] is aligned with x[i]) and the
**Nyquist clamp** — and realizes them as an exact spectral mask: rfft →
zero the bins outside [low_hz, high_hz) → irfft. A brick-wall mask is
the idempotent member of the family (mask² = mask), which buys two
oracle-checkable identities no IIR approximation has:

- **partition-reconstruction**: masks over a disjoint partition of the
  spectrum sum to the identity, so the band outputs sum back to the
  input exactly (``band_reconstruction`` — the driver-query oracle);
- **idempotence**: filtering twice equals filtering once (pytest).

The kernel is vectorized numpy inside ``applyInPandas`` (Arrow batches,
one conversation per group, no per-row Python) — the same shape as the
STFT path in ``spectral.py``.

Input contract: a *regular* series (conv_id, idx, value) on an integer
grid, e.g. ``activity_series`` (per-minute, 0-filled). ``fs`` is the
grid's sample rate in the caller's units; frequencies are in the same
units.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FILTERED_SCHEMA = "conv_id string, idx int, value_f double"
RECON_SCHEMA = "conv_id string, idx int, recon_err double"


def clamp_cutoffs(low_hz: float, high_hz: float, fs: float) -> tuple[float, float]:
    """Validate and Nyquist-clamp a cutoff pair (edf_reader.py:466-469:
    an upper cutoff at/above fs/2 is pulled down to the Nyquist rate
    rather than rejected — real configs carry device-default cutoffs
    past a downsampled signal's Nyquist all the time)."""
    nyq = 0.5 * fs
    if low_hz < 0:
        raise ValueError(f"low_hz must be >= 0, got {low_hz}")
    high_hz = min(high_hz, nyq)
    if not low_hz < high_hz:
        raise ValueError(
            f"need low_hz < high_hz after Nyquist clamp, got [{low_hz}, {high_hz}) at fs={fs}"
        )
    return low_hz, high_hz


def bandpass_np(
    x: np.ndarray, fs: float, low_hz: float, high_hz: float
) -> np.ndarray:
    """Zero-phase brick-wall band-pass: keep rfft bins with frequency in
    [low_hz, high_hz), half-open so a partition of [0, fs/2] into
    adjacent bands assigns every bin to exactly one band.  The Nyquist
    bin itself rides in the top band: clamp_cutoffs maps high_hz >= nyq
    to nyq, and the mask treats high_hz == nyq as inclusive."""
    low_hz, high_hz = clamp_cutoffs(low_hz, high_hz, fs)
    n = len(x)
    if n == 0:
        return x.astype(np.float64)
    freqs = np.fft.rfftfreq(n, d=1.0 / fs)
    nyq = 0.5 * fs
    mask = (freqs >= low_hz) & ((freqs < high_hz) | (high_hz == nyq))
    return np.fft.irfft(np.fft.rfft(x.astype(np.float64)) * mask, n=n)


def bandpass_series(
    series: DataFrame,
    fs: float,
    low_hz: float,
    high_hz: float,
    value_col: str = "value",
    max_idx: int | None = None,
) -> DataFrame:
    """Grouped-map band-pass over a regular (conv_id, idx, value)
    series → (conv_id, idx, value_f).  ``max_idx`` bounds each
    conversation to its first ``max_idx`` samples (filter pushed below
    the shuffle, same contract as ``stft_parseval``)."""
    clamp_cutoffs(low_hz, high_hz, fs)  # fail fast on the driver
    if max_idx is not None:
        series = series.filter(F.col("idx") < max_idx)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("idx", kind="mergesort")
        y = bandpass_np(pdf[value_col].to_numpy(dtype=np.float64), fs, low_hz, high_hz)
        return pd.DataFrame(
            {
                "conv_id": pdf["conv_id"].iloc[0],
                "idx": pdf["idx"].to_numpy(dtype=np.int32),
                "value_f": y,
            }
        )

    return series.select("conv_id", "idx", value_col).groupBy("conv_id").applyInPandas(
        kernel, FILTERED_SCHEMA
    )


def band_reconstruction(
    series: DataFrame,
    fs: float,
    edges: list[float],
    value_col: str = "value",
    max_idx: int | None = None,
    decimals: int = 9,
) -> DataFrame:
    """Metamorphic check of the filter path: the bands
    [edges[0], edges[1]), [edges[1], edges[2]), ..., [edges[-2], edges[-1]]
    partition the spectrum, so the per-band outputs must sum back to the
    input sample-for-sample.  Emits round(sum_of_bands − x, ``decimals``)
    — exactly 0.0 when the filter is correct — on the same (conv, idx)
    grid, which a SQL oracle reproduces without an FFT (the
    ``stft_parseval`` trick)."""
    if sorted(edges) != list(edges) or len(edges) < 2:
        raise ValueError(f"edges must be ascending with >= 2 entries, got {edges}")
    if edges[0] != 0.0 or edges[-1] < 0.5 * fs:
        raise ValueError(
            f"a reconstruction partition must span [0, fs/2]; got {edges} at fs={fs}"
        )
    if max_idx is not None:
        series = series.filter(F.col("idx") < max_idx)
    bands = list(zip(edges[:-1], edges[1:]))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("idx", kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.float64)
        y = np.zeros_like(x)
        for lo, hi in bands:
            y += bandpass_np(x, fs, lo, hi)
        return pd.DataFrame(
            {
                "conv_id": pdf["conv_id"].iloc[0],
                "idx": pdf["idx"].to_numpy(dtype=np.int32),
                # + 0.0 folds IEEE -0.0 (np.round of a tiny negative
                # residual) to +0.0: value-hash comparators distinguish
                # the sign bit even though -0.0 == 0.0.
                "recon_err": np.round(y - x, decimals) + 0.0,
            }
        )

    return series.select("conv_id", "idx", value_col).groupBy("conv_id").applyInPandas(
        kernel, RECON_SCHEMA
    )
