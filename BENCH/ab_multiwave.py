"""Same-session A/B of the round-4 multi-wave coalesce config.

Arms (identical read-back cascade, identical 54M-turn input, pinned):

  onewave    the pre-fix behavior, reproduced by overriding
             spark.default.parallelism back to the session thread count
             (AQE's size-based coalesce target becomes
             shuffleBytes/cores capped at the 64m advisory — ONE task
             wave for the 1.08 GB window+sort+agg reduce stage);
  multiwave  the shipped config (spark.default.parallelism = 4×cores,
             set by session.py — target aims at ~4 packed waves).

Per arm and level the JSON records walls (rep 0 untimed warmup) and the
tier-1m output file count, which equals the reduce-stage partition
count — the plan-level witness of the wave-quantization mechanism
(18 files ≈ 1.1 waves at 16 cores vs ~70+ ≈ 4+ waves).

Usage: python BENCH/ab_multiwave.py [levels_csv] [reps] [reuse_work_dir]
       defaults: "16,4" 3 /dev/shm/scaling_r4
Writes BENCH/ab_multiwave.json (arms interleaved per level so host
weather hits both equally).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BODY = r"""
import sys, time, os, json, shutil
sys.path.insert(0, {repo!r})
from biomed_timeseries_preprocessing_spark.session import get_spark
from biomed_timeseries_preprocessing_spark.operators.derive import with_derived
from biomed_timeseries_preprocessing_spark.operators.rollup import TIER_ORDER, rollup_from_turns, rollup_merge

cpus = int(sys.argv[1]); arm = sys.argv[2]; reps = int(sys.argv[3]); raw = sys.argv[4]
work = f"/dev/shm/ab_mw_{{cpus}}_{{arm}}"
conf = {{"spark.local.dir": os.path.join(work, "sparktmp")}}
if arm == "onewave":
    conf["spark.default.parallelism"] = str(cpus)
spark = get_spark(app_name=f"abmw{{cpus}}{{arm}}", master=f"local[{{cpus}}]", extra_conf=conf)
spark.range(1_000_000).count()
spark.read.parquet(raw).count()
walls = []
for rep in range(reps + 1):
    t0 = time.time()
    turns = spark.read.parquet(raw)
    for i, tier in enumerate(TIER_ORDER):
        if i == 0:
            df = rollup_from_turns(with_derived(turns), tier)
        else:
            df = rollup_merge(spark.read.parquet(os.path.join(work, f"t{{TIER_ORDER[i-1]}}")), tier)
        df.write.mode("overwrite").parquet(os.path.join(work, f"t{{tier}}"))
    if rep > 0:
        walls.append(round(time.time() - t0, 2))
nf = len([f for f in os.listdir(os.path.join(work, "t1m")) if f.endswith(".parquet")])
print("ABJSON " + json.dumps({{"cpus": cpus, "arm": arm, "walls": walls, "t1m_files": nf}}))
spark.stop()
shutil.rmtree(work, ignore_errors=True)
"""


def run_arm(cpus: int, arm: str, reps: int, raw: str) -> dict:
    cores = f"0-{cpus - 1}"
    out = subprocess.run(
        ["taskset", "-c", cores, sys.executable, "-c", BODY.format(repo=REPO),
         str(cpus), arm, str(reps), raw],
        capture_output=True, text=True, check=True,
    ).stdout
    line = [ln for ln in out.splitlines() if ln.startswith("ABJSON")][0]
    return json.loads(line[len("ABJSON "):])


def main() -> None:
    levels = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "16,4").split(",")]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    reuse = sys.argv[3] if len(sys.argv) > 3 else "/dev/shm/scaling_r4"
    raw = os.path.join(reuse, "raw")
    results = []
    for cpus in levels:
        for arm in ("onewave", "multiwave"):  # interleaved per level
            r = run_arm(cpus, arm, reps, raw)
            r["load1_after"] = round(os.getloadavg()[0], 2)
            results.append(r)
            print(r, flush=True)
    by = {f"{r['cpus']}/{r['arm']}": min(r["walls"]) for r in results}
    summary = {}
    if "16/onewave" in by and "4/onewave" in by:
        summary["eff_4_16_onewave"] = round(by["4/onewave"] / (4 * by["16/onewave"]), 3)
    if "16/multiwave" in by and "4/multiwave" in by:
        summary["eff_4_16_multiwave"] = round(by["4/multiwave"] / (4 * by["16/multiwave"]), 3)
    with open(os.path.join(REPO, "BENCH", "ab_multiwave.json"), "w") as f:
        json.dump({
            "method": "interleaved same-session A/B; onewave = shipped engine "
                      "with spark.default.parallelism overridden back to the "
                      "thread count (pre-fix AQE coalesce behavior), multiwave "
                      "= shipped session.py defaults; read-back cascade on the "
                      "54M-turn staged input, pinned, best-of with untimed "
                      "warmup rep; t1m_files == reduce-stage partition count",
            "results": results,
            "best": by,
            "summary": summary,
        }, f, indent=2)
    print("summary:", summary)


if __name__ == "__main__":
    main()
