"""Round-6 optimization measurement harness (bench.py stays FROZEN).

Per-query isolation per guide §1.4: each query is timed with the noop
sink (computes every column, discards output), labeled via
setJobDescription, best-of-N reps. Optionally writes
``.explain("formatted")`` output per query to a directory (the
plans/r06/<query>_{before,after}.txt deliverables).

Usage:
  python bench_extra.py --queries minhash_neardup_docs --reps 4 \
      --explain-dir plans/r06 --tag before
  SPARK_GRAFT_SF_DIR=/dev/shm/sfX python bench_extra.py ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from biomed_timeseries_preprocessing_spark import (  # noqa: E402,F401
    driver_queries,
    driver_queries_ext,
    driver_queries_ext2,
    driver_queries_ext3,
    driver_queries_ext4,
    driver_queries_ext5,
    driver_queries_ext6,
    driver_queries_ext7,
    driver_queries_ext8,
)
from biomed_timeseries_preprocessing_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
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


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--explain-dir", default=None)
    p.add_argument("--tag", default="before")
    p.add_argument("--out", default=None, help="also write the JSON line here")
    args = p.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]")
    names = [n for n in args.queries.split(",") if n]
    results: dict[str, dict] = {}
    for name in names:
        fn = driver_queries.QUERIES[name]
        reps = []
        for r in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
            reps.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = {"best": min(reps), "reps": reps}
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            txt = fn(spark, args.sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.explain_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(txt)
    line = json.dumps({"sf_dir": args.sf_dir, "cpus": int(cpus), "tag": args.tag, "queries": results})
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
