"""Stage profile of the exact near-dup clusters path at the sf1 shape
(50k token-soup docs, 10% planted near-dups — same corpus as
``dedup_scale.py``): where do the ~28 s go?

Stages timed independently (each ends in a count/write barrier):
  1. pairs      — shared_shingle_pairs over the shingle inverted index
  2. cc_all     — connected_components over ALL nodes (shipped shape)
  3. cc_edges   — connected_components over edge-touching nodes only,
                  isolated docs unioned back as their own component
                  (the |edges|-scaling candidate optimization)
  4. canon      — cluster-size join + canonicalize projection

Usage: python BENCH/clusters_profile.py [n_docs] [reps]
Writes BENCH/clusters_profile.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "BENCH"))

from pyspark.sql import functions as F  # noqa: E402

from biomed_timeseries_preprocessing_spark.operators.components import (  # noqa: E402
    connected_components,
    neardup_clusters,
    shared_shingle_pairs,
)
from biomed_timeseries_preprocessing_spark.operators.dedup import word_shingles  # noqa: E402
from biomed_timeseries_preprocessing_spark.session import get_spark  # noqa: E402
from dedup_scale import synth_docs  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name="clusters_profile", master="local[32]")
    docs = synth_docs(spark, n_docs).persist()
    docs.count()
    spark.range(1_000_000).count()  # JIT warmup

    out = {"n_docs": n_docs, "reps": []}
    for rep in range(reps + 1):  # rep 0 = untimed codegen warmup
        r = {}

        t0 = time.time()
        pairs = shared_shingle_pairs(
            word_shingles(docs, "doc_id", "text", 3), 0.5
        ).persist()
        r["n_pairs"] = pairs.count()
        r["pairs_sec"] = round(time.time() - t0, 2)

        nodes = docs.select(F.col("doc_id").alias("id"))

        t0 = time.time()
        comp_all = connected_components(nodes, pairs)
        r["cc_all_rows"] = comp_all.count()
        r["cc_all_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        touched = (
            pairs.select(F.col("doc_a").alias("id"))
            .unionByName(pairs.select(F.col("doc_b").alias("id")))
            .distinct()
        )
        comp_edge = connected_components(touched, pairs)
        isolated = nodes.join(touched, "id", "left_anti").select(
            "id", F.col("id").alias("component")
        )
        comp2 = comp_edge.unionByName(isolated)
        r["cc_edges_rows"] = comp2.count()
        r["cc_edges_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        comp = comp_all
        clusters = comp.groupBy("component").agg(
            F.count(F.lit(1)).alias("cluster_size")
        )
        canon = comp.join(clusters, "component").select(
            F.col("id").alias("doc_id"),
            F.col("component").alias("canonical_id"),
            (F.col("id") != F.col("component")).alias("is_duplicate"),
        )
        r["canon_rows"] = canon.count()
        r["canon_sec"] = round(time.time() - t0, 2)

        # unpersist BEFORE timing the full path: Spark's CacheManager
        # substitutes cached data for any canonically-matching subplan,
        # so a live persisted `pairs` would silently serve the full
        # path's internal pairs plan (measured: 2.5 s vs 14.5 s real)
        pairs.unpersist()

        t0 = time.time()
        full = neardup_clusters(docs, threshold=0.5)
        r["full_rows"] = full.count()
        r["full_sec"] = round(time.time() - t0, 2)
        if rep > 0:
            out["reps"].append(r)
        print(f"rep{rep}: {r}", flush=True)

    with open(os.path.join(REPO, "BENCH", "clusters_profile.json"), "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
