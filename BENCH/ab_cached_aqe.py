"""A/B the r4 AQE-first config against the r3 static config on the
pinned 16-core scaling-probe flow.

Round-4 watcher reps read ~52.8 s best at local[16] where the r3
campaigns read 40.6 s — a 30% regression that tracks the round-4
session change (coalescePartitions.initialPartitionNum=16x cores +
canChangeCachedPlanOutputPartitioning=true). This script alternates
pinned fresh-JVM runs of the identical persist-chained 4-tier cascade
with (A) the current session config and (B) the r3 equivalent forced
via extra_conf, interleaved to cancel host weather.

Usage: python BENCH/ab_cached_aqe.py [n_convs] [jvms_per_arm] [cpus] [reuse_raw]
``reuse_raw``: path to an existing staged parquet input (skips setup).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "BENCH"))

from scaling_probe import pinned_cmd  # noqa: E402

AB_BODY = r"""
import sys, time, os, json
sys.path.insert(0, {repo!r})
from biomed_timeseries_preprocessing_spark.session import get_spark
from biomed_timeseries_preprocessing_spark.operators.derive import with_derived
from biomed_timeseries_preprocessing_spark.operators.rollup import TIER_ORDER, rollup_from_turns, rollup_merge

cpus, raw, work, arm = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
extra = {{"spark.local.dir": os.path.join(work, "sparktmp")}}
if arm == "B":  # r3-equivalent: static 4x-cores shuffle width, cached plans pin partitioning
    extra["spark.sql.adaptive.coalescePartitions.initialPartitionNum"] = str(4 * int(cpus))
    extra["spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"] = "false"
spark = get_spark(app_name=f"ab{{arm}}{{cpus}}", master=f"local[{{cpus}}]", extra_conf=extra)
spark.range(1_000_000).count()
times = []
for rep in range(3):
    t0 = time.time()
    turns = spark.read.parquet(raw)
    prev = None
    for i, tier in enumerate(TIER_ORDER):
        df = rollup_from_turns(with_derived(turns), tier) if i == 0 else rollup_merge(prev, tier)
        df = df.persist()
        df.write.mode("overwrite").parquet(os.path.join(work, f"t{{tier}}_{{arm}}{{cpus}}"))
        if prev is not None:
            prev.unpersist()
        prev = df
    prev.unpersist()
    if rep > 0:
        times.append(time.time() - t0)
print("AB " + arm + " " + " ".join(f"{{t:.3f}}" for t in times))
"""


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    jvms = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = sys.argv[3] if len(sys.argv) > 3 else "16"
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="ab_cached_aqe_", dir=base)
    if len(sys.argv) > 4:
        raw = sys.argv[4]
    else:
        raw = os.path.join(work, "raw")
        setup = (
            f"import sys; sys.path.insert(0, {REPO!r});"
            "from biomed_timeseries_preprocessing_spark.session import get_spark;"
            "from biomed_timeseries_preprocessing_spark.sources.synth import synth_transcripts;"
            "s = get_spark(master='local[16]');"
            f"synth_transcripts(s, {n_convs}).repartition(256).write.mode('overwrite').parquet({raw!r}); s.stop()"
        )
        subprocess.run([sys.executable, "-c", setup], check=True, capture_output=True)
    body = AB_BODY.format(repo=REPO)
    results: dict[str, list[float]] = {"A": [], "B": []}
    for j in range(jvms):
        for arm in ("A", "B"):
            load1 = os.getloadavg()[0]
            out = subprocess.run(
                pinned_cmd(cpus) + [sys.executable, "-c", body, cpus, raw, work, arm],
                check=True, capture_output=True, text=True,
            )
            line = [ln for ln in out.stdout.splitlines() if ln.startswith("AB ")][0]
            els = [float(x) for x in line.split()[2:]]
            results[arm].extend(els)
            print(f"jvm {j} arm {arm} (load1={load1:.1f}): {els}", flush=True)
    summary = {
        "cpus": int(cpus),
        "n_convs": n_convs,
        "A_r4_config": results["A"],
        "B_r3_config": results["B"],
        "best": {k: min(v) for k, v in results.items()},
    }
    with open(os.path.join(REPO, "BENCH", "ab_cached_aqe.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary["best"]))
    import shutil
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
