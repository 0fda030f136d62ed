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
        for pdf in batches:
            payloads = []
            for _, r in pdf.iterrows():
                rng = np.random.default_rng(int(r["body_seed"]))
                body = rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()
                hdr = MAGIC + struct.pack(
                    ">BHHI",
                    {"image": 1, "audio": 2, "video": 3}[r["kind"]],
                    int(r["width"]),
                    int(r["height"]),
                    int(r["duration_ms"]),
                )
                payloads.append(hdr + body)
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
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                buf = bytes(r["payload"])
                if not buf.startswith(MAGIC):
                    raise NotImplementedError(
                        "real image/audio/video decoding needs PIL/ffmpeg — "
                        "not available in this container (stub per task brief)"
                    )
                kind_b, w, h, dur = struct.unpack(">BHHI", buf[4:13])
                rows.append(
                    {
                        "asset_id": r["asset_id"],
                        "kind": {1: "image", 2: "audio", 3: "video"}[kind_b],
                        "dec_width": w,
                        "dec_height": h,
                        "dec_duration_ms": dur,
                        "body_bytes": len(buf) - 13,
                    }
                )
            yield pd.DataFrame(rows)

    return assets.select("asset_id", "kind", "payload").mapInPandas(decode, DECODED_SCHEMA)


FEATURE_SCHEMA = "asset_id long, features array<double>"


def extract_features(assets: DataFrame, bins: int = 16) -> DataFrame:
    """Feature extraction: byte-histogram of the payload body, normalized
    — a deterministic stand-in with the exact shape (fixed-size
    array<double>) a CNN/audio embedding would have. Vectorized numpy per
    Arrow batch."""

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                body = np.frombuffer(bytes(r["payload"])[13:], dtype=np.uint8)
                hist = np.bincount(body // (256 // bins), minlength=bins).astype(np.float64)
                total = hist.sum()
                out.append(
                    {"asset_id": r["asset_id"], "features": (hist / total).tolist()}
                )
            yield pd.DataFrame(out)

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
