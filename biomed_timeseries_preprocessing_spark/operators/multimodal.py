"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / frame-sample plumbing.

Decode coverage (round 4 — the "drop-in, tested seam" upgrade):
- the deterministic FAKE container decodes vectorized (test fixture);
- **WAV audio decodes for real** via stdlib ``wave`` — no optional
  dependency, end-to-end tested in this container;
- **PNG/JPEG images decode via Pillow when importable** (optional
  import, skip-if-absent test); without Pillow they raise
  ``NotImplementedError`` naming the missing package;
- video still needs ffmpeg — explicit ``NotImplementedError``.

Everything Spark-side is real and tested — schema, partitioning, Arrow
batch shape, UDF signatures — so a cluster image with Pillow/ffmpeg
widens coverage without touching the plumbing.

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

# Optional image codec: Pillow widens the real-decode seam when the
# cluster image ships it; absence degrades to a named error, never a
# wrong answer.
try:  # pragma: no cover - exercised only where Pillow is installed
    from PIL import Image as _PILImage

    _HAVE_PIL = True
except ImportError:
    _PILImage = None
    _HAVE_PIL = False


def decode_real_payload(p: bytes) -> tuple[str, int, int, int]:
    """Decode one real (non-FAKE) payload → (kind, dec_width,
    dec_height, dec_duration_ms). Audio reuses the metadata slots as
    (sample_rate_hz, channels, duration_ms) — same slot-per-modality
    convention as the reference's modality config (Save_Agent.py:80-136).

    - WAV (RIFF/WAVE): stdlib ``wave`` — always available;
    - PNG/JPEG: Pillow when importable, else NotImplementedError
      naming the missing package;
    - anything else (video needs ffmpeg): NotImplementedError.
    """
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        import io
        import wave

        with wave.open(io.BytesIO(p)) as w:
            rate, chans, nframes = w.getframerate(), w.getnchannels(), w.getnframes()
        return ("audio", rate, chans, int(nframes * 1000 / rate))
    if p[:8] == b"\x89PNG\r\n\x1a\n" or p[:3] == b"\xff\xd8\xff":
        if not _HAVE_PIL:
            raise NotImplementedError(
                "PNG/JPEG decode needs Pillow (pip install pillow) — "
                "not available in this container"
            )
        import io

        with _PILImage.open(io.BytesIO(p)) as img:
            return ("image", img.width, img.height, 0)
    raise NotImplementedError(
        "unrecognized payload container — video and non-WAV audio need "
        "ffmpeg, not available in this container"
    )


def decode_assets(assets: DataFrame) -> DataFrame:
    """Decode stage over mapInPandas (Arrow batches): FAKE containers
    parse vectorized (stacked np.frombuffer header matrix); real WAV
    decodes via stdlib, PNG/JPEG via optional Pillow
    (``decode_real_payload``). Missing codecs raise a named
    NotImplementedError — the batch plumbing and payload column pruning
    are identical for every modality."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kind_name = np.array(["?", "image", "audio", "video"])
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = [bytes(p) for p in pdf["payload"]]
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64)
            fake = np.fromiter(
                (len(p) >= 13 and p.startswith(MAGIC) for p in payloads),
                dtype=bool,
            )
            out = {
                "kind": np.empty(len(payloads), dtype=object),
                "dec_width": np.zeros(len(payloads), dtype=np.int64),
                "dec_height": np.zeros(len(payloads), dtype=np.int64),
                "dec_duration_ms": np.zeros(len(payloads), dtype=np.int64),
                "body_bytes": lens - 13,
            }
            if fake.any():
                # fixed 13-byte headers parse as one stacked matrix —
                # vectorized np.frombuffer extraction, no per-row unpack
                hdr = np.frombuffer(
                    b"".join(p[:13] for p, f in zip(payloads, fake) if f),
                    dtype=np.uint8,
                ).reshape(-1, 13)
                out["kind"][fake] = kind_name[hdr[:, 4].astype(np.int64)]
                out["dec_width"][fake] = (hdr[:, 5].astype(np.int64) << 8) | hdr[:, 6]
                out["dec_height"][fake] = (hdr[:, 7].astype(np.int64) << 8) | hdr[:, 8]
                out["dec_duration_ms"][fake] = (
                    hdr[:, 9:13].copy().view(">u4").ravel().astype(np.int64)
                )
            for i in np.flatnonzero(~fake):
                k, w, h, d = decode_real_payload(payloads[i])
                out["kind"][i] = k
                out["dec_width"][i], out["dec_height"][i] = w, h
                out["dec_duration_ms"][i] = d
                out["body_bytes"][i] = lens[i]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "kind": out["kind"],
                    "dec_width": out["dec_width"].astype(np.int32),
                    "dec_height": out["dec_height"].astype(np.int32),
                    "dec_duration_ms": out["dec_duration_ms"].astype(np.int32),
                    "body_bytes": out["body_bytes"].astype(np.int32),
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
