"""Phase/worker-count profile of the shipped rollup job at sf0.1-scale.

Answers two questions the headline number alone can't:
  1. where the wall goes (staging vs per-bucket compute vs commit) —
     from the job's own lineage wall_ms plus bracketing timers;
  2. whether the bucket worker pool is sized right (4 vs 8 workers on
     8 buckets at 32 cores; the shipped auto rule scales both the pool
     and the bucket count now — this profiler pins buckets=8).

Usage: python BENCH/job_phase_profile.py [n_convs] [reps]
Writes BENCH/job_phase_profile.json.
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


def one_run(spark, raw_path, work, tag, workers) -> dict:
    wh = os.path.join(work, f"wh_{tag}")
    t0 = time.time()
    run(
        parse_args(
            [
                "--source", raw_path,
                "--warehouse", wh,
                "--run-id", tag,
                "--buckets", "8",
                "--gapfill",
                "--bucket-parallelism", str(workers),
            ]
        ),
        spark=spark,
    )
    wall = time.time() - t0
    cat = LocalSnapshotCatalog(wh)
    lin = cat.read(spark, "lineage").toPandas()
    # wall_ms is cumulative from each bucket's start; the per-bucket
    # total is its max stage wall. stage_source is the staging write.
    stage_ms = int(lin[lin.stage == "stage_source"]["wall_ms"].iloc[0])
    per_bucket = (
        lin[lin.stage != "stage_source"].groupby("partition_key")["wall_ms"].max()
    )
    out = {
        "workers": workers,
        "wall_sec": round(wall, 2),
        "staging_write_sec": round(stage_ms / 1000, 2),
        "bucket_wall_sec": {k: round(v / 1000, 2) for k, v in per_bucket.items()},
        "bucket_wall_sum_sec": round(per_bucket.sum() / 1000, 2),
        "bucket_wall_max_sec": round(per_bucket.max() / 1000, 2),
    }
    shutil.rmtree(wh, ignore_errors=True)
    return out


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="phase_profile", master="local[32]")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="phaseprof_", dir=base)
    try:
        raw_path = os.path.join(work, "transcripts")
        synth_transcripts(spark, n_convs).write.mode("overwrite").parquet(raw_path)
        spark.range(1_000_000).count()  # JVM warmup

        runs = []
        # warmup rep per arm is rep 0 (codegen); alternate arms so host
        # weather hits both equally
        for rep in range(reps + 1):
            for workers in (4, 8):
                runs.append(one_run(spark, raw_path, work, f"{workers}w_r{rep}", workers))
                print(json.dumps(runs[-1]), flush=True)
        summary = {
            "n_convs": n_convs,
            "runs": runs,
            "best_wall_by_workers": {
                w: min(r["wall_sec"] for r in runs[2:] if r["workers"] == w)
                for w in (4, 8)
            },
        }
        with open(os.path.join(REPO, "BENCH", "job_phase_profile.json"), "w") as f:
            json.dump(summary, f, indent=2)
        print(json.dumps(summary["best_wall_by_workers"]))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
