"""VERDICT r5 #1: interleaved same-session A/B of the r5 per-table flock
commit mutex (sources/catalog.py) vs lock-free commits, on the shipped
rollup_job pipeline at the driver's r5 bench scale (synth 10000 convs =
8.6M turns, --gapfill, auto buckets/scheduler — exactly bench.py's
run_job_headline). Alternating reps in one session so both arms share
the same weather window; also records the per-stage lineage breakdown
of each rep (staging / gapfill / per-tier cumulative walls).

Usage: python BENCH/ab_commit_lock.py [n_convs] [reps_per_arm]
Writes BENCH/ab_commit_lock.json.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from biomed_timeseries_preprocessing_spark.session import get_spark  # noqa: E402
from biomed_timeseries_preprocessing_spark.sources import catalog as cat_mod  # noqa: E402
from biomed_timeseries_preprocessing_spark.sources.catalog import LocalSnapshotCatalog  # noqa: E402
from biomed_timeseries_preprocessing_spark.sources.synth import synth_transcripts  # noqa: E402
from jobs.rollup_job import parse_args, run  # noqa: E402


@contextlib.contextmanager
def _no_mutex(self, table):
    yield


def one_run(spark, raw_path, work, tag) -> dict:
    wh = os.path.join(work, f"wh_{tag}")
    t0 = time.time()
    run(
        parse_args(
            ["--source", raw_path, "--warehouse", wh, "--run-id", tag, "--gapfill"]
        ),
        spark=spark,
    )
    wall = time.time() - t0
    cat = LocalSnapshotCatalog(wh)
    lin = cat.read(spark, "lineage").toPandas()
    stage_ms = int(lin[lin.stage == "stage_source"]["wall_ms"].iloc[0])
    per_stage = (
        lin[lin.stage != "stage_source"].groupby("stage")["wall_ms"].max().to_dict()
    )
    shutil.rmtree(wh, ignore_errors=True)
    return {
        "wall_sec": round(wall, 2),
        "staging_sec": round(stage_ms / 1000, 2),
        "stage_cum_max_sec": {k: round(v / 1000, 2) for k, v in per_stage.items()},
    }


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="ab_commit_lock", master="local[32]")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="ab_lock_", dir=base)
    real_mutex = LocalSnapshotCatalog._commit_mutex
    out = {"n_convs": n_convs, "arms": {"flock": [], "noflock": []}}
    try:
        raw_path = os.path.join(work, "transcripts")
        synth_transcripts(spark, n_convs).write.mode("overwrite").parquet(raw_path)
        out["turns"] = spark.read.parquet(raw_path).count()
        one_run(spark, raw_path, work, "warmup")  # JVM/code warmup, discarded
        for rep in range(reps):
            for arm in ("flock", "noflock"):
                LocalSnapshotCatalog._commit_mutex = (
                    real_mutex if arm == "flock" else _no_mutex
                )
                r = one_run(spark, raw_path, work, f"{arm}-{rep}")
                out["arms"][arm].append(r)
                print(rep, arm, r["wall_sec"], flush=True)
    finally:
        LocalSnapshotCatalog._commit_mutex = real_mutex
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    for arm, rs in out["arms"].items():
        out[f"best_{arm}"] = min(r["wall_sec"] for r in rs)
    with open(os.path.join(REPO, "BENCH", "ab_commit_lock.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k.startswith("best")}))


if __name__ == "__main__":
    main()
