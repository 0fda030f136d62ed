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
