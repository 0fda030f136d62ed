"""Full shipped-job scale run: 1× vs 10× the sf0.1 transcript lake.

The dedup/ANN family already has its beyond-sf0.1 datapoint
(``dedup_scale.json``); this is the same evidence for the HEADLINE
surface — ``jobs/rollup_job.run`` with staging, gap-fill + text-equality
guard, 4 committed tiers, snapshot catalog + lineage. If the partition
strategy holds, wall should grow ~linearly in turns (the fixed cost —
JVM, planning, snapshot commits — amortizes away), and per-stage lineage
walls should show compute growing while the commit section stays O(1).

Method per the measured host pathologies (NOTES_r4 / memory): best-of-N
with interleaved 1×/10× reps so co-tenant flares hit both arms equally;
inputs written with enough files for clean task packing at 32 cores.

Usage: python BENCH/job_scale.py [reps]   (default 3)
Writes BENCH/job_scale.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from biomed_timeseries_preprocessing_spark.session import get_spark  # noqa: E402
from biomed_timeseries_preprocessing_spark.sources.catalog import LocalSnapshotCatalog  # noqa: E402
from biomed_timeseries_preprocessing_spark.sources.synth import synth_transcripts  # noqa: E402
from jobs.rollup_job import parse_args, run  # noqa: E402


def one_run(spark, raw_path, work, tag):
    wh = os.path.join(work, f"wh_{tag}")
    t0 = time.time()
    run(
        parse_args(
            [
                "--source", raw_path,
                "--warehouse", wh,
                "--run-id", tag,
                "--gapfill",
            ]
        ),
        spark=spark,
    )
    wall = time.time() - t0
    cat = LocalSnapshotCatalog(wh)
    lin = (
        cat.read(spark, "lineage")
        .toPandas()
        .groupby("stage")["wall_ms"]
        .max()
        .to_dict()
    )
    shutil.rmtree(wh, ignore_errors=True)
    return wall, {k: int(v) for k, v in lin.items()}


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="job_scale", master="local[32]")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="job_scale_", dir=base)
    out = {"levels": {}, "reps": reps}
    try:
        inputs = {}
        for mult, n_convs in (("x1", 1000), ("x10", 10000)):
            p = os.path.join(work, f"raw_{mult}")
            # repartition so the 10x input is many task-sized files (wave
            # packing at 32 cores — see the measured scan-quantization note)
            synth_transcripts(spark, n_convs).repartition(256).write.mode(
                "overwrite"
            ).parquet(p)
            n = spark.read.parquet(p).count()
            inputs[mult] = (p, n)
            out["levels"][mult] = {"n_convs": n_convs, "turns": n, "walls": [], "lineage_max_ms": []}
        # warmup (JIT) on the small input, untimed
        one_run(spark, inputs["x1"][0], work, "warmup")
        for rep in range(reps):
            for mult in ("x1", "x10"):  # interleaved: noise hits both arms
                wall, lin = one_run(spark, inputs[mult][0], work, f"{mult}_r{rep}")
                out["levels"][mult]["walls"].append(round(wall, 2))
                out["levels"][mult]["lineage_max_ms"].append(lin)
                print(f"rep{rep} {mult}: {wall:.1f}s  {lin}", flush=True)
        for mult in ("x1", "x10"):
            lv = out["levels"][mult]
            lv["best_s"] = min(lv["walls"])
            lv["turns_per_sec"] = round(lv["turns"] / lv["best_s"], 1)
        r = out["levels"]["x10"]["best_s"] / out["levels"]["x1"]["best_s"]
        out["wall_ratio_10x"] = round(r, 2)
        out["turns_ratio"] = round(
            out["levels"]["x10"]["turns"] / out["levels"]["x1"]["turns"], 2
        )
        print(json.dumps(out))
        with open(os.path.join(REPO, "BENCH", "job_scale.json"), "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
