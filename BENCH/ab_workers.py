"""Interleaved A/B of the per-bucket scheduler's worker-pool size on
the bench headline path (rollup_job.run, --buckets 8 --gapfill, sf0.1
synthetic lake, local[32]).

Motivation: BENCH/job_phase_profile.json showed best walls 8.48 s at 4
workers vs 7.35 s at 8 while the job's auto heuristic then picked
min(4, buckets). This A/B isolated ONLY the pool size on the exact
bench path (fresh warehouse + fresh run-id per rep, staging included);
the result (8 wins every rep at 32 cores, wash at 8 cores) set the
shipped auto rule min(buckets, max(4, cores//4)).

Usage: python BENCH/ab_workers.py [reps] [cpus]
       defaults: 3 32
Writes BENCH/ab_workers.json. Arms interleave per rep so host weather
hits both equally; rep 0 per arm is an untimed warmup.
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


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    from jobs.rollup_job import parse_args, run

    spark = get_spark(app_name="ab_workers", master=f"local[{cpus}]")
    work = tempfile.mkdtemp(prefix="ab_workers_", dir="/dev/shm")
    results = {"4": [], "8": []}
    try:
        raw_path = os.path.join(work, "transcripts")
        synth_transcripts(spark, 1000).write.mode("overwrite").parquet(raw_path)
        spark.read.parquet(raw_path).count()

        for rep in range(reps + 1):
            for arm in ("4", "8"):
                wh = os.path.join(work, f"wh_{arm}_{rep}")
                t0 = time.time()
                run(
                    parse_args(
                        [
                            "--source", raw_path,
                            "--warehouse", wh,
                            "--run-id", f"ab-{arm}-{rep}",
                            "--buckets", "8",
                            "--gapfill",
                            "--bucket-parallelism", arm,
                        ]
                    ),
                    spark=spark,
                )
                el = round(time.time() - t0, 2)
                shutil.rmtree(wh, ignore_errors=True)
                if rep > 0:
                    results[arm].append(el)
                print(f"rep{rep} workers={arm}: {el}s", flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()

    out = {
        "method": "interleaved same-session A/B on the bench headline path "
        "(rollup_job.run, buckets=8, gapfill, sf0.1 synth, local[%d]); "
        "rep 0 untimed warmup; best-of-%d" % (cpus, reps),
        "walls": results,
        "best": {k: min(v) for k, v in results.items() if v},
    }
    with open(os.path.join(REPO, "BENCH", "ab_workers.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["best"]))


if __name__ == "__main__":
    main()
