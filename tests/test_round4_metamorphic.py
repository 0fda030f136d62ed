"""Preflight certifications for the round-4 session-4 metamorphic
oracles (driver_queries_ext7): minhash at threshold 1.0 and simhash at
Hamming distance 0.

The minhash identity is structural (no corpus property involved):
identical shingle sets ⇒ identical signatures ⇒ co-bucket in every
band, and the integer-exact Jaccard verifier passes 1.0 iff the sets
are equal — so the unit test pins the exact expected pair set on a
corpus crafted to separate set-equality from text-equality.

The simhash identity is also structural once candidates are verified:
equal multisets ⇒ bit-identical fingerprints ⇒ co-bucket in every
pigeonhole chunk band (recall 1), and the exact multiset-equality
verify join removes the distinct-multiset Hamming-0 collisions that
these template-generated corpora measurably contain (SimHash is lossy
by design). The tests pin the verified pipeline on a crafted corpus
and cross-check it against a banding-independent multiset join on the
real sf0.01 fixture.
"""

import os
import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from biomed_timeseries_preprocessing_spark.driver_queries_ext7 import planted_corpus  # noqa: E402
from biomed_timeseries_preprocessing_spark.operators.dedup import (  # noqa: E402
    minhash_dedup,
    normalized_text,
    simhash,
    simhash_candidates,
)


def test_minhash_threshold1_is_exact_shingleset_equality(spark):
    rows = [
        (0, "a b c d e"),
        (1, "a b c d e"),          # exact dup of 0
        (2, "a b c d e f"),        # Jaccard 0.75 vs 0 — must NOT pair at 1.0
        (3, "x y"),                # <3 tokens: whole-text shingle
        (4, "x y"),
        (5, "x   Y"),              # normalization: same as 3/4
        (6, "a b a b a"),          # shingle SET {aba, bab} ...
        (7, "b a b a b"),          # ... equal set, different text/multiset
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(3)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_dedup(df, threshold=1.0).collect()
    }
    assert got == {(0, 1), (3, 4), (3, 5), (4, 5), (6, 7)}
    # and every surviving pair's jaccard is exactly 1.0 (integer-exact)
    vals = [r["jaccard"] for r in minhash_dedup(df, threshold=1.0).collect()]
    assert all(v == 1.0 for v in vals)


def _multiset_canon(corpus):
    return corpus.select(
        "doc_id",
        F.array_join(F.array_sort(F.split(normalized_text(), " ")), " ").alias("canon"),
    )


def test_simhash_verified_hamming0_is_multiset_equality_crafted(spark):
    rows = [
        (0, "a b c"),
        (1, "c b a"),              # same multiset, different order
        (2, "A   b c"),            # normalization: same as 0/1
        (3, "a b c c"),            # different multiset (extra token)
        (4, "x y z"),
        (5, "z y x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(3)
    fps = simhash(df)
    canon = _multiset_canon(df)
    cand = simhash_candidates(fps).filter(F.col("hamming") == 0)
    verified = (
        cand.join(canon.select(F.col("doc_id").alias("doc_a"), F.col("canon").alias("canon_a")), "doc_a")
        .join(canon.select(F.col("doc_id").alias("doc_b"), F.col("canon").alias("canon_b")), "doc_b")
        .filter(F.col("canon_a") == F.col("canon_b"))
    )
    got = {(r["doc_a"], r["doc_b"]) for r in verified.collect()}
    assert got == {(0, 1), (0, 2), (1, 2), (4, 5)}


def test_simhash_verified_hamming0_matches_banding_independent_join(spark):
    """On the real planted sf0.01 corpus, the verified Hamming-0
    pipeline (fingerprint → pigeonhole bands → verify) must return the
    SAME pair set as a direct multiset-equality self-join that never
    touches simhash — certifying the banded join's recall on the
    fixture the driver oracle runs against. Also asserts the verify
    step is load-bearing: the corpus has raw Hamming-0 collisions
    between distinct multisets."""
    sf_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        return
    corpus = planted_corpus(spark, sf_dir)
    fps = simhash(corpus)
    canon = _multiset_canon(corpus)
    cand = simhash_candidates(fps).filter(F.col("hamming") == 0)
    joined = (
        cand.join(canon.select(F.col("doc_id").alias("doc_a"), F.col("canon").alias("canon_a")), "doc_a")
        .join(canon.select(F.col("doc_id").alias("doc_b"), F.col("canon").alias("canon_b")), "doc_b")
    )
    verified = {
        (r["doc_a"], r["doc_b"])
        for r in joined.filter(F.col("canon_a") == F.col("canon_b")).collect()
    }
    a = canon.select(F.col("doc_id").alias("doc_a"), F.col("canon").alias("c"))
    b = canon.select(F.col("doc_id").alias("doc_b"), F.col("canon").alias("c"))
    direct = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(b, "c").filter(F.col("doc_a") < F.col("doc_b")).collect()
    }
    assert verified == direct and len(direct) > 0
    rejected = joined.filter(F.col("canon_a") != F.col("canon_b")).count()
    assert rejected > 0  # lossy-fingerprint collisions exist; verify removes them
