"""Codec round-trip property tests (FIXTURES F7): decode(encode(x)) == x
exactly — int64 for delta-of-delta, IEEE-754 bit patterns for Gorilla
XOR — plus the Spark applyInPandas chunk-encode path."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from biomed_timeseries_preprocessing_spark.functions.codec import (
    decode_chunk_row,
    decode_dod,
    decode_xor,
    encode_chunks,
    encode_dod,
    encode_xor,
)


@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=300)
)
@settings(max_examples=60, deadline=None)
def test_dod_roundtrip(values):
    arr = np.array(values, dtype=np.int64)
    assert np.array_equal(decode_dod(encode_dod(arr)), arr)


@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64), min_size=0, max_size=300
    )
)
@settings(max_examples=60, deadline=None)
def test_xor_roundtrip_bit_exact(values):
    arr = np.array(values, dtype=np.float64)
    out = decode_xor(encode_xor(arr))
    assert np.array_equal(out.view(np.uint64), arr.view(np.uint64))


def test_compression_beats_raw_on_quantized_series():
    rng = np.random.default_rng(42)
    deltas = np.round(np.exp(1.2 + rng.normal(size=4999)) * 1000).astype(np.int64)
    ts = np.concatenate(([1_760_000_000_000], 1_760_000_000_000 + np.cumsum(deltas)))
    assert len(encode_dod(ts)) < 0.6 * 8 * len(ts)
    lat = deltas.astype(np.float64)
    assert len(encode_xor(lat)) < 0.6 * 8 * len(lat)


def test_spark_chunk_encode_roundtrip(spark, small_transcripts):
    from biomed_timeseries_preprocessing_spark.operators.derive import with_derived

    derived = with_derived(small_transcripts)
    chunks = encode_chunks(derived, chunk_seconds=3600)
    rows = chunks.collect()
    assert sum(r["n"] for r in rows) == derived.count()
    # round-trip one non-trivial chunk exactly
    row = max(rows, key=lambda r: r["n"])
    dec = decode_chunk_row(row)
    pdf = (
        derived.filter(
            (derived.conv_id == row["conv_id"])
        )
        .toPandas()
        .sort_values(["ts", "turn_idx"], kind="mergesort")
    )
    start = row["chunk_start"]
    sel = pdf[
        (pdf["ts"].astype("datetime64[us]").astype("int64") // 3_600_000_000 * 3_600_000_000)
        == int(np.datetime64(start, "us").astype("int64"))
    ]
    assert np.array_equal(
        dec["ts_us"], sel["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    )
    want_lat = sel["latency_ms"].astype("float64").to_numpy()
    assert np.array_equal(
        dec["latency_ms"].view(np.uint64), want_lat.view(np.uint64)
    )
    assert np.array_equal(dec["token_count"], sel["token_count"].astype("int64").to_numpy())
    # compression accounting is populated
    assert all(r["raw_bytes"] > 0 for r in rows)


def test_batch_encoders_byte_identical_to_single():
    """codec_batch blobs must equal codec.py per-block blobs exactly."""
    import numpy as np

    from biomed_timeseries_preprocessing_spark.functions.codec_batch import (
        encode_dod_batch,
        encode_xor_batch,
    )

    rng = np.random.default_rng(11)
    # blocks of tricky lengths incl. 1, 2, 3 and bigger
    lens = [1, 2, 3, 4, 25, 7, 1, 300, 2]
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    total = sum(lens)
    ints = rng.choice(
        np.array([0, 1, -1, 5, 123456, 10**12, -(10**9)], dtype=np.int64), size=total
    ).astype(np.int64)
    got = encode_dod_batch(ints, starts)
    for b, (s, L) in enumerate(zip(starts, lens)):
        want = encode_dod(ints[s : s + L])
        assert got[b] == want, f"dod block {b} differs"
        assert np.array_equal(decode_dod(got[b]), ints[s : s + L])

    floats = rng.normal(size=total)
    floats[::5] = np.nan
    floats[1::7] = 0.0
    floats[2::7] = floats[1::7][: len(floats[2::7])]
    got = encode_xor_batch(floats, starts)
    for b, (s, L) in enumerate(zip(starts, lens)):
        want = encode_xor(floats[s : s + L])
        assert got[b] == want, f"xor block {b} differs"
        out = decode_xor(got[b])
        assert np.array_equal(
            out.view(np.uint64), floats[s : s + L].view(np.uint64)
        )


def test_table_level_roundtrip(spark, small_transcripts):
    """encode_chunks → decode_chunks_df reproduces every turn exactly."""
    import pandas as pd

    from biomed_timeseries_preprocessing_spark.functions.codec import decode_chunks_df
    from biomed_timeseries_preprocessing_spark.operators.derive import with_derived

    derived = with_derived(small_transcripts)
    back = (
        decode_chunks_df(encode_chunks(derived, 3600))
        .toPandas()
        .sort_values(["conv_id", "ts"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = (
        derived.select("conv_id", "ts", "latency_ms", "token_count")
        .toPandas()
        .sort_values(["conv_id", "ts"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(back) == len(want)
    assert (back["conv_id"] == want["conv_id"]).all()
    assert (back["ts"].astype("datetime64[us]") == want["ts"].astype("datetime64[us]")).all()
    lat_b = back["latency_ms"].to_numpy()
    lat_w = want["latency_ms"].astype("float64").to_numpy()
    assert np.array_equal(lat_b.view("uint64"), lat_w.view("uint64"))
    assert (back["token_count"].to_numpy() == want["token_count"].to_numpy()).all()


@given(
    st.lists(
        st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=40),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=40, deadline=None)
def test_batch_decoder_dod_matches_per_block(blocks):
    """Vectorized-across-blocks decoder == per-block decoder == input."""
    from biomed_timeseries_preprocessing_spark.functions.codec_batch import decode_dod_batch

    arrs = [np.array(b, dtype=np.int64) for b in blocks]
    blobs = [encode_dod(a) for a in arrs]
    vals, starts = decode_dod_batch(blobs)
    assert len(vals) == sum(len(a) for a in arrs)
    for i, a in enumerate(arrs):
        s = starts[i]
        assert np.array_equal(vals[s : s + len(a)], a)


@given(
    st.lists(
        st.lists(
            st.floats(allow_nan=True, allow_infinity=True, width=64), min_size=0, max_size=40
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=40, deadline=None)
def test_batch_decoder_xor_matches_per_block(blocks):
    from biomed_timeseries_preprocessing_spark.functions.codec_batch import decode_xor_batch

    arrs = [np.array(b, dtype=np.float64) for b in blocks]
    blobs = [encode_xor(a) for a in arrs]
    vals, starts = decode_xor_batch(blobs)
    for i, a in enumerate(arrs):
        s = starts[i]
        assert np.array_equal(
            vals[s : s + len(a)].view(np.uint64), a.view(np.uint64)
        )
