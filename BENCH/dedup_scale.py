"""sf1 scale rehearsal for the dedup/ANN family (r3 verdict #4 + #8).

Synthesizes a deterministic 10x-sf0.1 corpus (50,000 documents with the
same token-soup shape and a planted 10% near-dup rate; 20,000 64-dim
embeddings), then times on local[32]:

- minhash_dedup (shingle -> k-min signature -> banded LSH with the
  256-cap -> Jaccard on candidates), with per-stage walls, the
  lsh_bucket_stats distribution, and candidate/pair counts;
- neardup_clusters (exact shared-shingle pairs + connected components);
- ivf_topk (n_cells=64, nprobe=8, 100 queries);
- simhash 64-buffer vs packed-lane (#8 measure-first micro-opt).

Alongside the same measurements at sf0.1-scale inputs (5,000 docs /
2,000 vecs, same generator), so candidate growth vs corpus growth is
read from one file: linear candidate growth + a holding cap policy is
the "survives 100x" datapoint. Writes BENCH/dedup_scale.json.

Usage: python BENCH/dedup_scale.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from biomed_timeseries_preprocessing_spark.operators.components import (  # noqa: E402
    neardup_clusters,
)
from biomed_timeseries_preprocessing_spark.operators.dedup import (  # noqa: E402
    jaccard_verify,
    lsh_bucket_stats,
    lsh_candidates,
    minhash_signatures,
    simhash,
    simhash_packed,
    word_shingles,
)
from biomed_timeseries_preprocessing_spark.operators.similarity import (  # noqa: E402
    ivf_topk,
)
from biomed_timeseries_preprocessing_spark.session import get_spark  # noqa: E402

VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "join", "shuffle", "plan", "stage", "task",
]


def synth_docs(spark, n_docs: int, n_tokens: int = 50, seed: int = 4):
    """Deterministic token-soup docs (same shape as the driver corpus:
    ~30-word vocab, ~50 tokens). Every doc with id % 10 == 1 is a
    near-dup of id-1: same tokens except the last two -> Jaccard on
    3-shingles ~ (n-5)/(n-1) ~ 0.9, well above the 0.5 threshold."""
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    src = F.when(F.col("doc_id") % 10 == 1, F.col("doc_id") - 1).otherwise(
        F.col("doc_id")
    )
    words = F.array(*[F.lit(w) for w in VOCAB])
    toks = [
        F.element_at(
            words,
            (F.pmod(F.xxhash64(src, F.lit(seed), F.lit(i)), F.lit(len(VOCAB))) + 1).cast("int"),
        )
        for i in range(n_tokens)
    ]
    # near-dup mutation: replace the last 2 tokens with id-derived ones
    mut = [
        F.when(
            F.col("doc_id") % 10 == 1,
            F.element_at(
                words,
                (F.pmod(F.xxhash64("doc_id", F.lit(seed), F.lit(1000 + i)), F.lit(len(VOCAB))) + 1).cast("int"),
            ),
        ).otherwise(toks[n_tokens - 2 + i])
        for i in range(2)
    ]
    return base.select(
        "doc_id", F.concat_ws(" ", *toks[:-2], *mut).alias("text")
    ).repartition(64)


def synth_embeddings(spark, n_vecs: int, dim: int = 64, seed: int = 9):
    cols = [
        (
            (F.pmod(F.xxhash64("vec_id", F.lit(seed), F.lit(d)), F.lit(2_000_001)) - 1_000_000)
            / 1_000_000.0
        ).cast("float")
        for d in range(dim)
    ]
    return (
        spark.range(n_vecs)
        .select(F.col("id").alias("vec_id"))
        .select("vec_id", F.array(*cols).alias("embedding"))
        .repartition(64)
    )


def run_scale(spark, n_docs: int, n_vecs: int) -> dict:
    r: dict[str, object] = {"n_docs": n_docs, "n_vecs": n_vecs}
    docs = synth_docs(spark, n_docs).persist()
    docs.count()

    t0 = time.time()
    sh = word_shingles(docs).persist()
    n_shingles = sh.count()
    r["shingle_sec"] = round(time.time() - t0, 2)
    r["n_shingles"] = n_shingles

    t0 = time.time()
    sig = minhash_signatures(sh).persist()
    sig.count()
    r["signature_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    stats = lsh_bucket_stats(sig).agg(
        F.count(F.lit(1)).alias("buckets"),
        F.max("n_docs").alias("max_bucket"),
        F.sum(F.col("n_docs") * (F.col("n_docs") - 1) / 2).alias("pair_mass"),
        F.count_if(F.col("n_docs") > 256).alias("buckets_over_cap"),
    ).collect()[0]
    r["bucket_stats_sec"] = round(time.time() - t0, 2)
    r["lsh_buckets"] = int(stats["buckets"])
    r["lsh_max_bucket"] = int(stats["max_bucket"])
    r["lsh_pair_mass"] = int(stats["pair_mass"])
    r["lsh_buckets_over_cap"] = int(stats["buckets_over_cap"])

    t0 = time.time()
    cand = lsh_candidates(sig, 8, 4, max_bucket_size=256).persist()
    r["n_candidates"] = cand.count()
    r["candidates_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    pairs = jaccard_verify(cand, sh, threshold=0.5)
    r["n_neardup_pairs"] = pairs.count()
    r["verify_sec"] = round(time.time() - t0, 2)
    r["minhash_total_sec"] = round(
        r["shingle_sec"] + r["signature_sec"] + r["candidates_sec"] + r["verify_sec"], 2
    )
    cand.unpersist()
    sig.unpersist()
    sh.unpersist()

    t0 = time.time()
    cl = neardup_clusters(docs, threshold=0.5)
    agg = cl.agg(
        F.count(F.lit(1)).alias("docs"),
        F.count_if(F.col("is_duplicate")).alias("dups"),
        F.countDistinct("canonical_id").alias("clusters"),
    ).collect()[0]
    r["clusters_sec"] = round(time.time() - t0, 2)
    r["n_clusters"] = int(agg["clusters"])
    r["n_duplicates"] = int(agg["dups"])

    emb = synth_embeddings(spark, n_vecs).persist()
    emb.count()
    queries = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    t0 = time.time()
    ivf = ivf_topk(emb, queries, dim=64, k=10, n_cells=64, nprobe=8)
    r["ivf_rows"] = ivf.count()
    r["ivf_sec"] = round(time.time() - t0, 2)

    # --- #8: simhash 64-buffer vs packed-lane, same input, best-of-2
    for name, fn in (("simhash64_sec", simhash), ("simhash_packed_sec", simhash_packed)):
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            fn(docs).agg(F.sum(F.bit_count("simhash"))).collect()
            best = min(best, time.time() - t0)
        r[name] = round(best, 2)
    emb.unpersist()
    docs.unpersist()
    return r


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "dedup_scale.json"
    )
    spark = get_spark(app_name="dedup-scale", master="local[32]")
    res = {
        "sf0.1-shape": run_scale(spark, 5_000, 2_000),
        "sf1-shape": run_scale(spark, 50_000, 20_000),
    }
    a, b = res["sf0.1-shape"], res["sf1-shape"]
    res["growth"] = {
        "docs_x": b["n_docs"] / a["n_docs"],
        "candidates_x": round(b["n_candidates"] / max(a["n_candidates"], 1), 2),
        "pairs_x": round(b["n_neardup_pairs"] / max(a["n_neardup_pairs"], 1), 2),
        "minhash_wall_x": round(b["minhash_total_sec"] / a["minhash_total_sec"], 2),
        "clusters_wall_x": round(b["clusters_sec"] / a["clusters_sec"], 2),
        "ivf_wall_x": round(b["ivf_sec"] / a["ivf_sec"], 2),
    }
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res["growth"]))
    spark.stop()


if __name__ == "__main__":
    main()
