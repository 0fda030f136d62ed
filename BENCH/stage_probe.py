"""Per-stage scaling diagnostic: where does the 4-tier pipeline spend
its time at N vs 4N cores? Prints per-stage wall times so the
non-scaling stage can be identified instead of guessed.

Usage: taskset -c 0-<n-1> python BENCH/stage_probe.py <cores> <raw_dir> <work> [heap]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from biomed_timeseries_preprocessing_spark.operators.derive import with_derived  # noqa: E402
from biomed_timeseries_preprocessing_spark.operators.rollup import (  # noqa: E402
    TIER_ORDER,
    rollup_from_turns,
    rollup_merge,
)
from biomed_timeseries_preprocessing_spark.session import get_spark  # noqa: E402


def main() -> None:
    cpus, raw, work = sys.argv[1], sys.argv[2], sys.argv[3]
    if len(sys.argv) > 4:
        os.environ["SPARK_GRAFT_DRIVER_MEM"] = sys.argv[4]
    spark = get_spark(
        app_name=f"stage{cpus}",
        master=f"local[{cpus}]",
        extra_conf={"spark.local.dir": os.path.join(work, "sparktmp")},
    )
    spark.range(1_000_000).count()  # JIT warmup
    for rep in range(3):
        stages = {}
        t_all = time.time()
        turns = spark.read.parquet(raw)
        for i, tier in enumerate(TIER_ORDER):
            t0 = time.time()
            src = (
                with_derived(turns)
                if i == 0
                else spark.read.parquet(os.path.join(work, f"st_{TIER_ORDER[i-1]}_{cpus}"))
            )
            df = rollup_from_turns(src, tier) if i == 0 else rollup_merge(src, tier)
            df.write.mode("overwrite").parquet(os.path.join(work, f"st_{tier}_{cpus}"))
            stages[tier] = round(time.time() - t0, 2)
        total = round(time.time() - t_all, 2)
        print(f"STAGE {cpus} rep{rep} total={total} " + " ".join(f"{k}={v}" for k, v in stages.items()), flush=True)


if __name__ == "__main__":
    main()
