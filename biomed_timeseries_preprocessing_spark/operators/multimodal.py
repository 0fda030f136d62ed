"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / frame-sample plumbing.

The decode step itself is STUBBED (this container ships no image/audio
codecs): ``decode_asset`` parses a deterministic fake header and raises
``NotImplementedError`` for real formats. Everything Spark-side is real
and tested — schema, partitioning, Arrow batch shape, UDF signatures —
so dropping in PIL/ffmpeg on a real cluster changes one function body.

Reference analog: the reference treats signals as opaque per-file blobs
routed by modality config (``Save_Agent.py:80-136``); binary payload +
metadata columns are the lake-native version of that.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, kind string, payload binary, "
    "width int, height int, duration_ms int"
)

MAGIC = b"FAKE"  # deterministic synthetic container format


def synth_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake assets: payload = MAGIC + packed header
    (kind, width, height, duration) + pseudo-random body bytes derived
    from xxhash64 — generated JVM-side then packed in one mapInPandas."""
    base = spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        (F.pmod(F.xxhash64("id", F.lit(seed), F.lit("w")), F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(seed), F.lit("h")), F.lit(1080)) + 16).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(seed), F.lit("d")), F.lit(600_000)) + 1000).cast("int").alias("duration_ms"),
        F.pmod(F.xxhash64("id", F.lit(seed), F.lit("b")), F.lit(1 << 31)).alias("body_seed"),
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kind_code = {"image": 1, "audio": 2, "video": 3}
        for pdf in batches:
            # headers assembled vectorized; per-row RNG body kept only
            # because this is the synthetic test fixture (seeded stream
            # per asset), not a production read path
            payloads = [
                MAGIC
                + struct.pack(">BHHI", kind_code[k], w, h, d)
                + np.random.default_rng(int(s)).integers(0, 256, size=256, dtype=np.uint8).tobytes()
                for k, w, h, d, s in zip(
                    pdf["kind"].to_numpy(),
                    pdf["width"].to_numpy(),
                    pdf["height"].to_numpy(),
                    pdf["duration_ms"].to_numpy(),
                    pdf["body_seed"].to_numpy(),
                )
            ]
            out = pdf[["asset_id", "kind", "width", "height", "duration_ms"]].copy()
            out["payload"] = payloads
            yield out[["asset_id", "kind", "payload", "width", "height", "duration_ms"]]

    return base.mapInPandas(pack, ASSET_SCHEMA)


DECODED_SCHEMA = (
    "asset_id long, kind string, dec_width int, dec_height int, "
    "dec_duration_ms int, body_bytes int"
)


def decode_assets(assets: DataFrame) -> DataFrame:
    """Decode stage over mapInPandas (Arrow batches). Real formats raise
    NotImplementedError — the plumbing (batch iteration, schema, column
    pruning of the binary payload) is the tested part."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kind_name = np.array(["?", "image", "audio", "video"])
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = [bytes(p) for p in pdf["payload"]]
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64)
            # fixed 13-byte headers parse as one stacked matrix —
            # vectorized np.frombuffer field extraction, no per-row unpack
            if (lens < 13).any() or not all(
                p.startswith(MAGIC) for p in payloads
            ):
                raise NotImplementedError(
                    "real image/audio/video decoding needs PIL/ffmpeg — "
                    "not available in this container (stub per task brief)"
                )
            hdr = np.frombuffer(
                b"".join(p[:13] for p in payloads), dtype=np.uint8
            ).reshape(-1, 13)
            kind_b = hdr[:, 4].astype(np.int64)
            w = (hdr[:, 5].astype(np.int64) << 8) | hdr[:, 6]
            h = (hdr[:, 7].astype(np.int64) << 8) | hdr[:, 8]
            dur = hdr[:, 9:13].copy().view(">u4").ravel().astype(np.int64)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "kind": kind_name[kind_b],
                    "dec_width": w.astype(np.int32),
                    "dec_height": h.astype(np.int32),
                    "dec_duration_ms": dur.astype(np.int32),
                    "body_bytes": (lens - 13).astype(np.int32),
                }
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(decode, DECODED_SCHEMA)


FEATURE_SCHEMA = "asset_id long, features array<double>"


def extract_features(assets: DataFrame, bins: int = 16) -> DataFrame:
    """Feature extraction: byte-histogram of the payload body, normalized
    — a deterministic stand-in with the exact shape (fixed-size
    array<double>) a CNN/audio embedding would have. Vectorized numpy per
    Arrow batch."""

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = [bytes(p)[13:] for p in pdf["payload"]]
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64)
            body = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            # one flat 2-D bincount for the whole batch: row id × bin
            rid = np.repeat(np.arange(len(payloads)), lens)
            idx = rid * bins + body // (256 // bins)
            hist = np.bincount(idx, minlength=len(payloads) * bins).reshape(
                len(payloads), bins
            ).astype(np.float64)
            hist /= hist.sum(axis=1, keepdims=True)
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"].to_numpy(), "features": list(hist)}
            )

    return assets.select("asset_id", "payload").mapInPandas(feat, FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 10_000) -> DataFrame:
    """Frame sampling for video assets: one row per sampled frame offset
    (pure JVM sequence explode — the decode of each frame is the stubbed
    step above)."""
    vids = assets.filter(F.col("kind") == "video")
    return vids.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_offset_ms"),
    )
