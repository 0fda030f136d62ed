"""Data augmentation as a first-class operator (SURVEY §2.7 O7 /
§2.8 F13).

Reference parity: ``Augmentator.enhance_signals``
(``/root/reference/utils/helpers/Augmentator.py:1-67``) appends `times`
transformed copies of the signal — Gaussian-noised or band-filtered —
and duplicates the label/exclude intervals shifted by the copy offset.
Lake-native shape: UNION of deterministic transformed scans, each copy
tagged with an ``aug_id`` column instead of a time offset (a partition
key downstream label joins carry along — no interval arithmetic needed,
and each copy remains independently addressable).

Noise is **deterministic and cluster-size independent**: per-cell
uniforms come from xxhash64(key columns, copy, seed), folded through an
Irwin–Hall(12) sum for an approximately Gaussian sample (the same
seeded-synth machinery as ``sources/synth.py``) — no RNG state, no
Python.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import with_moving_avg


def _unit_uniform(*cols):
    """xxhash64 → [0, 1) uniform, exact integer fold."""
    return (F.pmod(F.xxhash64(*cols), F.lit(1 << 30))).cast("double") / float(1 << 30)


def _gaussian_ih12(key_cols, copy: int, seed: int):
    """Irwin–Hall(12) − 6 ≈ N(0,1), from 12 independent hashed uniforms."""
    total = None
    for j in range(12):
        u = _unit_uniform(*key_cols, F.lit(copy), F.lit(seed), F.lit(j))
        total = u if total is None else total + u
    return total - 6.0


def augment_gaussian(
    df: DataFrame,
    value_col: str,
    key_cols: list[str],
    times: int = 1,
    mean: float = 0.0,
    std: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Original rows (aug_id=0) ∪ `times` noisy copies (aug_id=1..t):
    copy value = value + N(mean, std) per cell, deterministic in the
    key columns (Augmentator.augmentation_gaussian analog).

    Single-scan emit (r5): one explode of ``sequence(0, times)`` instead
    of a ``times+1``-branch union — each union branch re-evaluated the
    upstream ``df`` (the union double-eval pattern; fourth find after CC
    symmetrize, simhash banding, and fill_label_gaps). Values are bit-identical: the noise
    hash keys on the copy INDEX, and exploding an int sequence feeds
    xxhash64 the same int the per-branch ``F.lit(copy)`` did (locked by
    ``test_augment_gaussian_single_scan_identity``)."""
    keys = [F.col(c) for c in key_cols]

    def noise(copy_col):
        total = None
        for j in range(12):
            u = _unit_uniform(*keys, copy_col, F.lit(seed), F.lit(j))
            total = u if total is None else total + u
        return total - 6.0

    aug_id = F.col("aug_id")
    # a pre-existing aug_id column is replaced (the pre-r5 withColumn
    # semantics); without the drop the explode alias would collide and
    # make F.col("aug_id") ambiguous (ADVICE r5)
    base = df.drop("aug_id")
    return (
        base.select("*", F.explode(F.sequence(F.lit(0), F.lit(times))).alias("aug_id"))
        .withColumn(
            value_col,
            F.when(aug_id == 0, F.col(value_col)).otherwise(
                F.col(value_col) + (noise(aug_id) * std + F.lit(mean))
            ),
        )
        .select(*base.columns, "aug_id")
    )


def augment_smoothed(
    df: DataFrame, value_col: str, times: int = 1, k: int = 2
) -> DataFrame:
    """Band-extract analog (augmentation_extract_freq): filtered copies —
    the engine's FIR-style moving-average smoother applied per copy with
    widening taps (k, 2k, ...), unioned under aug_id."""
    base = df.withColumn("aug_id", F.lit(0))
    copies = [
        with_moving_avg(df, value_col, k=k * t, out_col="_sm")
        .withColumn(value_col, F.col("_sm"))
        .drop("_sm")
        .withColumn("aug_id", F.lit(t))
        for t in range(1, times + 1)
    ]
    return reduce(DataFrame.unionByName, copies, base)
