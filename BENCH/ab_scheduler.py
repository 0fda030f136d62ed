"""Interleaved A/B: global vs per-bucket scheduler on the shipped job.

Same process, same staged input, alternating arms so host weather hits
both equally; rep 0 per arm is JVM/codegen warmup and is discarded.

Usage: python BENCH/ab_scheduler.py [n_convs] [reps] [buckets]
Writes BENCH/ab_scheduler.json.
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
from biomed_timeseries_preprocessing_spark.sources.synth import synth_transcripts  # noqa: E402
from jobs.rollup_job import parse_args, run  # noqa: E402


def one_run(spark, raw_path, work, tag, scheduler, buckets="8") -> float:
    wh = os.path.join(work, f"wh_{tag}")
    t0 = time.time()
    run(
        parse_args(
            [
                "--source", raw_path,
                "--warehouse", wh,
                "--run-id", tag,
                "--buckets", buckets,
                "--gapfill",
                "--scheduler", scheduler,
            ]
        ),
        spark=spark,
    )
    el = time.time() - t0
    shutil.rmtree(wh, ignore_errors=True)
    return el


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    buckets = sys.argv[3] if len(sys.argv) > 3 else "8"
    spark = get_spark(app_name="ab_scheduler", master="local[32]")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="ab_sched_", dir=base)
    times = {"global": [], "per-bucket": []}
    try:
        raw_path = os.path.join(work, "transcripts")
        synth_transcripts(spark, n_convs).write.mode("overwrite").parquet(raw_path)
        spark.range(1_000_000).count()
        for rep in range(reps + 1):
            for arm in ("global", "per-bucket"):
                el = one_run(spark, raw_path, work, f"{arm}_{rep}", arm, buckets)
                if rep > 0:
                    times[arm].append(round(el, 2))
                print(f"rep{rep} {arm}: {el:.2f}s", flush=True)
        out = {
            "n_convs": n_convs,
            "buckets": buckets,
            "reps_sec": times,
            "best_sec": {a: min(t) for a, t in times.items()},
            "median_sec": {a: sorted(t)[len(t) // 2] for a, t in times.items()},
        }
        with open(os.path.join(REPO, "BENCH", "ab_scheduler.json"), "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
