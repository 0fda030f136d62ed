"""EDF container-source scale rehearsal (r5, companion to the new
`sources/edf.py`): decode throughput at 1x and 10x file counts, so the
source carries a committed number like codec/dedup/streaming do.

Files are synthetic but byte-exact per the public EDF spec (same
builder logic as tests/test_edf_source.py). Parallelism unit = one
file, so the 10x cell is the scaling story: wall should stay near-flat
until files >> cores. Timed work = full decode + a per-channel
aggregate (forces every sample through calibration), via noop-style
count on an agg — no driver copy of the sample set.

Usage: python BENCH/edf_scale.py [out_json]
Writes BENCH/edf_scale.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from biomed_timeseries_preprocessing_spark.session import get_spark  # noqa: E402
from biomed_timeseries_preprocessing_spark.sources.edf import read_edf_signals  # noqa: E402

N_RECORDS = 600  # 10 minutes at 1 s/record
SPR = [100, 50]  # two channels: 100 Hz, 50 Hz
LABELS = ["EEG Fpz-Cz", "EMG chin"]
REPS = 3
CELLS = {"1x": 16, "10x": 160}


def _field(s: str, width: int) -> bytes:
    return s.encode("ascii").ljust(width)


def build_edf(seed: int) -> bytes:
    ns = len(SPR)
    hdr = b"".join(
        [
            _field("0", 8),
            _field("synthetic", 80),
            _field("scale rehearsal", 80),
            _field("02.01.85", 8),
            _field("10.00.00", 8),
            _field(str(256 + ns * 256), 8),
            _field("", 44),
            _field(str(N_RECORDS), 8),
            _field("1", 8),
            _field(str(ns), 4),
        ]
    )
    for width, vals in [
        (16, LABELS),
        (80, [""] * ns),
        (8, ["uV"] * ns),
        (8, ["-100"] * ns),
        (8, ["100"] * ns),
        (8, ["-2048"] * ns),
        (8, ["2047"] * ns),
        (80, [""] * ns),
        (8, [str(s) for s in SPR]),
        (32, [""] * ns),
    ]:
        hdr += b"".join(_field(v, width) for v in vals)
    rng = np.random.default_rng(seed)  # file content only; not a timing input
    recs = []
    for _ in range(N_RECORDS):
        for s in SPR:
            recs.append(rng.integers(-2048, 2048, size=s, dtype=np.int16).astype("<i2"))
    return hdr + b"".join(r.tobytes() for r in recs)


def stage(root: str, n_files: int) -> str:
    d = os.path.join(root, f"edf_{n_files}")
    os.makedirs(d, exist_ok=True)
    for i in range(n_files):
        p = os.path.join(d, f"rec{i:04d}.edf")
        if not os.path.exists(p):
            with open(p, "wb") as f:
                f.write(build_edf(seed=i))
    return d


def main(out_json: str) -> None:
    spark = get_spark(app_name="edf-scale")
    root = os.environ.get("EDF_TMP", "/tmp/edf_scale")
    out = {"reps": REPS, "cells": {}}
    samples_per_file = N_RECORDS * sum(SPR)

    for label, n_files in CELLS.items():
        d = stage(root, n_files)
        n_samples = n_files * samples_per_file

        def run():
            # decode everything + per-channel stats (forces calibration)
            return (
                read_edf_signals(spark, d)
                .groupBy("channel")
                .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("m"))
                .collect()
            )

        rows = run()  # warmup; also sanity the decode
        assert sum(r["n"] for r in rows) == n_samples, (rows, n_samples)
        walls = []
        for _ in range(REPS):
            t0 = time.time()
            run()
            walls.append(round(time.time() - t0, 3))
        out["cells"][label] = {
            "n_files": n_files,
            "n_samples": n_samples,
            "walls_s": walls,
            "samples_per_sec": round(n_samples / min(walls)),
        }
        print(label, json.dumps(out["cells"][label]))

    c1, c10 = out["cells"]["1x"], out["cells"]["10x"]
    out["throughput_ratio_10x_over_1x"] = round(
        c10["samples_per_sec"] / c1["samples_per_sec"], 2
    )
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", out_json)
    spark.stop()


if __name__ == "__main__":
    main(
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "BENCH", "edf_scale.json")
    )
