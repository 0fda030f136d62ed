"""Benchmark runner (driver contract).

Headline: the SHIPPED north-rule pipeline — ``jobs/rollup_job.run``
(bucket-partitioned staging scan, gap-fill + text-equality guard,
derive, 1m→5m→1h→1d tiered rollup, snapshot-catalog commits, batched
lineage) over a synthetic transcript lake — measured as turns/sec at
the SF implied by $SPARK_GRAFT_SF_DIR (default sf0.1), on
local[$SPARK_GRAFT_CPUS] (default 32). ``inline_cascade_sec`` keeps the
round-1/2 derive→tiers inline loop for cross-round comparability.

The sandbox host's CPU is heavily time-shared (identical in-process runs
vary 3s..110s), so the headline is **best of N repetitions** (default 4)
— the repeatable hardware capability, not the co-tenant lottery. Per-query
timings are best of 4 (round-2 lesson: 2 reps could not separate a 12×
co-tenant artifact from a real regression).

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

from biomed_timeseries_preprocessing_spark import driver_queries, driver_queries_ext  # noqa: E402,F401
from biomed_timeseries_preprocessing_spark import driver_queries_ext4  # noqa: E402,F401
from biomed_timeseries_preprocessing_spark.functions.codec import (  # noqa: E402
    decode_chunks_df,
    encode_chunks,
)
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
    "dedup_exact_docs",
    "minhash_neardup_docs",
    "ann_topk_bruteforce",
    "codec_chunks",
    "codec_roundtrip",
]

HEADLINE_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "4"))
QUERY_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_QUERY_REPS", "4"))


def run_inline_cascade(spark, raw_path: str, work: str) -> float:
    """Round-1/2 comparable number: derive → 4 materialized tiers,
    no audit counts in the timed region (they were pure driver serial),
    persist-chained so the cascade keeps its single Exchange across the
    materialization boundaries (the rollup_job shape)."""
    t0 = time.time()
    turns = spark.read.parquet(raw_path)
    prev = None
    for i, tier in enumerate(TIER_ORDER):
        df = rollup_from_turns(with_derived(turns), tier) if i == 0 else rollup_merge(prev, tier)
        df = df.persist()
        df.write.mode("overwrite").parquet(os.path.join(work, f"tier_{tier}"))
        if prev is not None:
            prev.unpersist()
        prev = df
    prev.unpersist()
    return time.time() - t0


def run_job_headline(spark, raw_path: str, work: str, rep: int) -> float:
    """The shipped path: jobs/rollup_job.run with gap-fill, staging,
    catalog commits and lineage — a fresh run-id per rep so resume never
    short-circuits the work."""
    from jobs.rollup_job import parse_args, run

    wh = os.path.join(work, f"wh_rep{rep}")
    t0 = time.time()
    run(
        parse_args(
            [
                "--source", raw_path,
                "--warehouse", wh,
                "--run-id", f"bench-rep{rep}",
                "--gapfill",
            ]
        ),
        spark=spark,
    )
    el = time.time() - t0
    shutil.rmtree(wh, ignore_errors=True)
    return el


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench", master=f"local[{cpus}]")

    # tmpfs when available: the sandbox disk swings 5x in throughput and
    # the bench measures engine compute (see BENCH/BASELINE.md)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="bench_rollup_", dir=base)
    try:
        # setup (not timed): materialize the transcript lake
        n_convs = max(10, int(sf * 10_000))
        raw_path = os.path.join(work, "transcripts")
        synth_transcripts(spark, n_convs).write.mode("overwrite").parquet(raw_path)

        n_turns = spark.read.parquet(raw_path).count()

        times = []
        for rep in range(HEADLINE_REPS):
            times.append(run_job_headline(spark, raw_path, work, rep))
        best = min(times)

        inline_times = [
            run_inline_cascade(spark, raw_path, work) for _ in range(HEADLINE_REPS)
        ]
        inline_best = min(inline_times)
        points = sum(
            spark.read.parquet(os.path.join(work, f"tier_{t}")).count()
            for t in TIER_ORDER
        )

        queries: dict[str, float] = {}
        for name in DRIVER_QUERY_SAMPLE:
            fn = driver_queries.QUERIES[name]
            reps = []
            for _ in range(QUERY_REPS):
                tq = time.time()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                reps.append(time.time() - tq)
            queries[name] = round(min(reps), 3)

        # codec read path: encode the synthetic lake once, then measure
        # the vectorized batch decode scan (blobs → per-turn rows)
        chunks_path = os.path.join(work, "codec_chunks_bench")
        encode_chunks(with_derived(spark.read.parquet(raw_path))).write.mode(
            "overwrite"
        ).parquet(chunks_path)
        dec_times = []
        for _ in range(2):
            td = time.time()
            decode_chunks_df(spark.read.parquet(chunks_path)).write.mode(
                "overwrite"
            ).format("noop").save()
            dec_times.append(time.time() - td)
        decode_sec = min(dec_times)

        out = {
            "metric": "rollup_job_full_pipeline_seconds",
            "value": round(best, 3),
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "n_convs": n_convs,
            "turns": n_turns,
            "rollup_points": points,
            "turns_per_sec": round(n_turns / best, 1),
            "inline_cascade_sec": round(inline_best, 3),
            "inline_turns_per_sec": round(n_turns / inline_best, 1),
            "inline_reps_sec": [round(t, 2) for t in inline_times],
            "decode_sec": round(decode_sec, 3),
            "decode_turns_per_sec": round(n_turns / decode_sec, 1),
            "headline_reps_sec": [round(t, 2) for t in times],
            "cpus": int(cpus),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
