"""Benchmark runner (driver contract).

Headline: the north-rule pipeline — transcripts parquet → derive →
1m→5m→1h→1d tiered rollup, every tier materialized — measured as
turns/sec at the SF implied by $SPARK_GRAFT_SF_DIR (default sf0.1),
on local[$SPARK_GRAFT_CPUS] (default 32).

The sandbox host's CPU is heavily time-shared (identical in-process runs
vary 3s..110s), so the headline is **best of 3 repetitions** — the
repeatable hardware capability, not the co-tenant lottery. Per-query
timings are best of 2.

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


def run_headline(spark, raw_path: str, work: str) -> tuple[float, int, int]:
    t0 = time.time()
    turns = spark.read.parquet(raw_path)
    n_turns = turns.count()
    derived = with_derived(turns)
    df = None
    points = 0
    for i, tier in enumerate(TIER_ORDER):
        src = (
            derived if i == 0 else spark.read.parquet(os.path.join(work, f"tier_{TIER_ORDER[i-1]}"))
        )
        df = rollup_from_turns(src, tier) if i == 0 else rollup_merge(src, tier)
        out_path = os.path.join(work, f"tier_{tier}")
        df.write.mode("overwrite").parquet(out_path)
        points += spark.read.parquet(out_path).count()
    return time.time() - t0, n_turns, points


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

        times = []
        for _ in range(HEADLINE_REPS):
            headline, n_turns, points = run_headline(spark, raw_path, work)
            times.append(headline)
        best = min(times)

        queries: dict[str, float] = {}
        for name in DRIVER_QUERY_SAMPLE:
            fn = driver_queries.QUERIES[name]
            reps = []
            for _ in range(2):
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
            "metric": "ingest_to_tiered_rollup_seconds",
            "value": round(best, 3),
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "n_convs": n_convs,
            "turns": n_turns,
            "rollup_points": points,
            "turns_per_sec": round(n_turns / best, 1),
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
