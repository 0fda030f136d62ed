"""Benchmark runner (driver contract).

Headline: the north-rule pipeline — transcripts parquet → derive →
1m→5m→1h→1d tiered rollup, every tier materialized — measured as
turns/sec at the SF implied by $SPARK_GRAFT_SF_DIR (default sf0.1),
on local[$SPARK_GRAFT_CPUS] (default 32).

Prints ONE JSON line:
  {"metric": "...", "value": <headline seconds>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "turns": N,
   "turns_per_sec": T, ...}

Scaling runs (local[8] vs local[32]) are orchestrated by
BENCH/run_scaling.sh which invokes this file twice.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from biomed_timeseries_preprocessing_spark import driver_queries  # noqa: E402
from biomed_timeseries_preprocessing_spark.operators.derive import with_derived  # noqa: E402
from biomed_timeseries_preprocessing_spark.operators.rollup import (  # noqa: E402
    TIER_ORDER,
    rollup_from_turns,
    rollup_merge,
)
from biomed_timeseries_preprocessing_spark.session import get_spark  # noqa: E402
from biomed_timeseries_preprocessing_spark.sources.synth import synth_transcripts  # noqa: E402

DRIVER_QUERY_SAMPLE = [
    "rollup_1m",
    "rollup_1d_cascade",
    "gapfill_turns",
    "sessionize",
    "tpch_q1_cents",
    "revenue_by_nation",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench", master=f"local[{cpus}]")

    work = tempfile.mkdtemp(prefix="bench_rollup_")
    try:
        # ---------- setup (not timed): materialize the transcript lake
        n_convs = max(10, int(sf * 10_000))
        raw_path = os.path.join(work, "transcripts")
        synth_transcripts(spark, n_convs).write.mode("overwrite").parquet(raw_path)

        # ---------- headline: ingest -> derive -> tier cascade, all tiers
        # materialized (each tier written, then read back as the next
        # tier's input — the continuous-aggregate materialization flow).
        t0 = time.time()
        turns = spark.read.parquet(raw_path)
        n_turns = turns.count()
        derived = with_derived(turns)
        tier_path = {}
        df = rollup_from_turns(derived, "1m")
        points = 0
        for i, tier in enumerate(TIER_ORDER):
            if i > 0:
                df = rollup_merge(spark.read.parquet(tier_path[TIER_ORDER[i - 1]]), tier)
            tier_path[tier] = os.path.join(work, f"tier_{tier}")
            df.write.mode("overwrite").parquet(tier_path[tier])
            points += spark.read.parquet(tier_path[tier]).count()
        headline = time.time() - t0

        # ---------- per-query timings on the driver's SF dir
        queries: dict[str, float] = {}
        for name in DRIVER_QUERY_SAMPLE:
            fn = driver_queries.QUERIES[name]
            tq = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            queries[name] = round(time.time() - tq, 3)

        out = {
            "metric": "ingest_to_tiered_rollup_seconds",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "n_convs": n_convs,
            "turns": n_turns,
            "rollup_points": points,
            "turns_per_sec": round(n_turns / headline, 1),
            "cpus": int(cpus),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
