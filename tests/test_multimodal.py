"""Multimodal plumbing tests: the decode step is a stub, but the Spark
plumbing (binary columns, Arrow batches, schemas, frame sampling) is real
and verified against the generator's metadata."""

import pytest

from pyspark.sql import functions as F

from biomed_timeseries_preprocessing_spark.operators.multimodal import (
    decode_assets,
    extract_features,
    sample_frames,
    synth_assets,
)


def test_decode_roundtrips_header(spark):
    assets = synth_assets(spark, 50)
    dec = decode_assets(assets)
    j = assets.join(dec.withColumnRenamed("kind", "kind_dec"), "asset_id")
    bad = j.filter(
        (F.col("kind") != F.col("kind_dec"))
        | (F.col("width") != F.col("dec_width"))
        | (F.col("height") != F.col("dec_height"))
        | (F.col("duration_ms") != F.col("dec_duration_ms"))
    )
    assert bad.count() == 0
    assert dec.count() == 50


def test_real_format_raises_not_implemented(spark):
    fake = spark.createDataFrame(
        [(1, "image", bytearray(b"\x89PNG\r\n..."))],
        "asset_id long, kind string, payload binary",
    )
    with pytest.raises(Exception, match="NotImplementedError|real image"):
        decode_assets(fake).collect()


def test_features_shape_and_norm(spark):
    assets = synth_assets(spark, 20)
    feats = extract_features(assets).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-9


def test_frame_sampling(spark):
    assets = synth_assets(spark, 100)
    frames = sample_frames(assets, every_ms=10_000)
    per = frames.groupBy("asset_id").count().collect()
    meta = {r["asset_id"]: r["duration_ms"] for r in assets.filter("kind='video'").collect()}
    assert set(r["asset_id"] for r in per) == set(meta)
    for r in per:
        assert r["count"] == meta[r["asset_id"]] // 10_000 + 1


# ---------------- round 4: real-decode seam (optional-import codecs)

def _wav_bytes(rate=8000, chans=1, n=1600):
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(chans)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.zeros(n * chans, dtype=np.int16).tobytes())
    return buf.getvalue()


def test_wav_decodes_for_real(spark):
    """WAV audio goes through the REAL decode path (stdlib wave) —
    end-to-end in this container, no optional dependency."""
    wav = _wav_bytes(rate=8000, chans=2, n=1600)  # 200 ms stereo
    df = spark.createDataFrame(
        [(7, "audio", bytearray(wav))],
        "asset_id long, kind string, payload binary",
    )
    row = decode_assets(df).collect()[0]
    assert row["kind"] == "audio"
    assert row["dec_width"] == 8000       # sample rate slot
    assert row["dec_height"] == 2         # channels slot
    assert row["dec_duration_ms"] == 200
    assert row["body_bytes"] == len(wav)


def test_mixed_fake_and_wav_batch(spark):
    """One Arrow batch mixing the vectorized FAKE path and the real WAV
    path decodes both, preserving row alignment."""
    from biomed_timeseries_preprocessing_spark.operators.multimodal import synth_assets

    fake = synth_assets(spark, 5).select("asset_id", "kind", "payload")
    wav = spark.createDataFrame(
        [(100, "audio", bytearray(_wav_bytes(rate=16000, chans=1, n=160)))],
        "asset_id long, kind string, payload binary",
    )
    out = {r["asset_id"]: r for r in decode_assets(fake.unionByName(wav).coalesce(1)).collect()}
    assert len(out) == 6
    assert out[100]["dec_width"] == 16000 and out[100]["dec_duration_ms"] == 10
    assert all(out[i]["dec_width"] >= 16 for i in range(5))  # fake headers parsed


def test_png_decodes_with_pillow_or_raises(spark):
    """PNG: real decode via Pillow when importable (skip-if-absent),
    named NotImplementedError otherwise."""
    try:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (12, 34)).save(buf, format="PNG")
        df = spark.createDataFrame(
            [(9, "image", bytearray(buf.getvalue()))],
            "asset_id long, kind string, payload binary",
        )
        row = decode_assets(df).collect()[0]
        assert (row["dec_width"], row["dec_height"]) == (12, 34)
    except ImportError:
        png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
        df = spark.createDataFrame(
            [(9, "image", bytearray(png))],
            "asset_id long, kind string, payload binary",
        )
        with pytest.raises(Exception, match="Pillow"):
            decode_assets(df).collect()
