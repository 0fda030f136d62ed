"""Python-state streaming floor measurement (VERDICT r4 #5, BASELINE.md
limit #6): how slow IS `applyInPandasWithState` gap-fill, at 1x and 10x,
next to the JVM-side streaming 1m rollup tier on the SAME staged input —
so the "Python-state streaming is the throughput floor" claim carries a
committed number like every other claim in BENCH/BASELINE.md.

Method: deterministic synth transcripts staged as N_FILES parquet files
(maxFilesPerTrigger=1 → N_FILES micro-batches, so state crosses batch
boundaries); NOOP sink (the memory sink collects every output row into
driver heap as a LocalTableScan — it OOMed the 10x cell and would time
the driver copy, not the operator); one untimed warmup rep of each
path, then best-of-REPS timed runs per cell. The JVM comparator streams
the batch-derived table through the windowed 1m aggregate (update mode,
watermarked) — pure Tungsten state; the Python path streams raw turns
through the stateful gap-fill (append mode) — Arrow transfer + pandas
state machine per group.

Usage: python BENCH/streaming_state_floor.py [out_json]
Writes BENCH/streaming_state_floor.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from biomed_timeseries_preprocessing_spark.operators.derive import with_derived  # noqa: E402
from biomed_timeseries_preprocessing_spark.session import get_spark  # noqa: E402
from biomed_timeseries_preprocessing_spark.sources.synth import synth_transcripts  # noqa: E402
from biomed_timeseries_preprocessing_spark.streaming.gapfill_stream import (  # noqa: E402
    streaming_gapfill,
)
from biomed_timeseries_preprocessing_spark.streaming.rollup_stream import (  # noqa: E402
    streaming_rollup_1m,
)

N_FILES = 8
REPS = 3
SCALES = {"1x": 1_000, "10x": 10_000}  # n_convs (zipf lengths -> ~60k/~600k turns)


def stage(spark, n_convs: int, root: str) -> tuple[str, str, int]:
    turns = synth_transcripts(spark, n_convs)
    raw = os.path.join(root, f"raw_{n_convs}")
    drv = os.path.join(root, f"drv_{n_convs}")
    turns.repartition(N_FILES).write.mode("overwrite").parquet(raw)
    with_derived(spark.read.parquet(raw)).select(
        "conv_id", "turn_idx", "ts", "latency_ms", "token_count"
    ).repartition(N_FILES).write.mode("overwrite").parquet(drv)
    n = spark.read.parquet(raw).count()
    return raw, drv, n


def time_reps(fn, reps: int = REPS) -> list[float]:
    walls = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        walls.append(round(time.time() - t0, 3))
    return walls


def main(out_json: str) -> None:
    spark = get_spark(app_name="streaming-state-floor")
    root = os.environ.get("FLOOR_TMP", "/tmp/streaming_floor")
    result = {
        "method": (
            "same staged input (8 files, maxFilesPerTrigger=1 -> 8 micro-batches), "
            "noop sink, untimed warmup then best-of-%d; python = "
            "applyInPandasWithState gap-fill (append), jvm = windowed 1m rollup "
            "aggregate (update, watermarked); throughput = input turns / wall" % REPS
        ),
        "master": spark.sparkContext.master,
        "cells": {},
    }
    qn = [0]

    for label, n_convs in SCALES.items():
        raw, drv, n_turns = stage(spark, n_convs, root)

        def drain(df, mode):
            q = df.writeStream.outputMode(mode).format("noop").start()
            q.processAllAvailable()
            q.stop()

        def py_run():
            qn[0] += 1
            src = (
                spark.readStream.schema(
                    "conv_id string, turn_idx int, role string, text string, "
                    "tool string, ts timestamp"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(raw)
            )
            drain(streaming_gapfill(src), "append")

        def jvm_run():
            qn[0] += 1
            src = (
                spark.readStream.schema(
                    "conv_id string, turn_idx int, ts timestamp, "
                    "latency_ms long, token_count int"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(drv)
            )
            drain(streaming_rollup_1m(src), "update")

        py_run()  # warmup (first streaming query pays planner/sink setup)
        jvm_run()
        py_walls = time_reps(py_run)
        jvm_walls = time_reps(jvm_run)
        py_best, jvm_best = min(py_walls), min(jvm_walls)
        result["cells"][label] = {
            "n_convs": n_convs,
            "n_turns": n_turns,
            "python_state_walls_s": py_walls,
            "jvm_agg_walls_s": jvm_walls,
            "python_state_turns_per_s": round(n_turns / py_best),
            "jvm_agg_turns_per_s": round(n_turns / jvm_best),
            "python_vs_jvm_slowdown": round(py_best / jvm_best, 2),
        }
        print(label, json.dumps(result["cells"][label]))

    c1, c10 = result["cells"]["1x"], result["cells"]["10x"]
    result["python_floor_scaling"] = round(
        (c10["n_turns"] / c1["n_turns"])
        / (min(c10["python_state_walls_s"]) / min(c1["python_state_walls_s"])),
        3,
    )
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", out_json)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH", "streaming_state_floor.json"))
