"""A/B the two-phase (lock-free data write) tier commit against the
round-4-HEAD behavior that held the commit lock across the whole
``overwrite_partitions`` Spark write job.

Alternates the two implementations (``jobs/rollup_job`` = new,
``jobs/_rollup_job_r4head`` = snapshot of the old module) inside one
pinned JVM over the same bench-shaped input (sf0.1 scale: 1000 convs,
gapfill on, 8 buckets, 4-wide bucket pool), fresh run-id per rep so
resume never short-circuits.

Usage: taskset -c 16-31 python BENCH/ab_commit_path.py [n_convs] [reps]
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
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = os.environ.get("AB_CPUS", "16")
    spark = get_spark(app_name="ab-commit", master=f"local[{cpus}]")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="ab_commit_", dir=base)
    raw = os.path.join(work, "transcripts")
    synth_transcripts(spark, n_convs).write.mode("overwrite").parquet(raw)
    n_turns = spark.read.parquet(raw).count()

    # the "old" arm is materialized from git (the last commit that held
    # the lock across the tier-write Spark job) so no stale copy lives
    # in the tree
    old_path = os.path.join(REPO, "jobs", "_rollup_job_r4head.py")
    if not os.path.exists(old_path):
        import subprocess

        src = subprocess.run(
            ["git", "-C", REPO, "show", "1778ee8:jobs/rollup_job.py"],
            check=True, capture_output=True, text=True,
        ).stdout
        with open(old_path, "w") as f:
            f.write(src)
    from jobs import _rollup_job_r4head as old_mod
    from jobs import rollup_job as new_mod

    results: dict[str, list[float]] = {"old_locked_write": [], "new_two_phase": []}
    rep_id = 0
    for _ in range(reps + 1):  # rep 0 of each arm is JIT warmup, dropped
        for name, mod in (("new_two_phase", new_mod), ("old_locked_write", old_mod)):
            rep_id += 1
            wh = os.path.join(work, f"wh_{rep_id}")
            t0 = time.time()
            mod.run(
                mod.parse_args(
                    [
                        "--source", raw,
                        "--warehouse", wh,
                        "--run-id", f"ab-{rep_id}",
                        "--buckets", "8",
                        "--gapfill",
                    ]
                ),
                spark=spark,
            )
            el = time.time() - t0
            shutil.rmtree(wh, ignore_errors=True)
            results[name].append(round(el, 3))
            print(f"{name}: {el:.2f}s", flush=True)
    summary = {
        "cpus": int(cpus),
        "n_convs": n_convs,
        "turns": n_turns,
        "reps_sec": {k: v[1:] for k, v in results.items()},  # drop warmup rep
        "best": {k: min(v[1:]) for k, v in results.items()},
    }
    with open(os.path.join(REPO, "BENCH", "ab_commit_path.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary["best"]))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
