"""Cross-check Spark's xxhash64 against an independent pure-Python XXH64
(oracle/xxh.py) — this converts the hash-dependent rows-only queries
(minhash signatures, simhash, fingerprint) into verified components: the
hash they build on is provably the public XXH64 algorithm, not an opaque
JVM artifact."""

from pyspark.sql import functions as F

from biomed_timeseries_preprocessing_spark.oracle.xxh import spark_xxhash64
from biomed_timeseries_preprocessing_spark.operators.dedup import (
    MERSENNE,
    minhash_signatures,
    normalized_text,
    simhash,
    word_shingles,
)
from biomed_timeseries_preprocessing_spark.operators.text import with_fingerprint


def test_xxhash64_reference_matches_spark(spark):
    df = spark.createDataFrame(
        [("hello world",), ("",), ("a",), ("x" * 100,), ("päö utf8 ✓",)], "s string"
    )
    rows = df.select(
        "s",
        F.xxhash64("s").alias("h"),
        F.xxhash64("s", F.lit(7)).alias("h_int"),
        F.xxhash64("s", F.lit(7).cast("long")).alias("h_long"),
    ).collect()
    for r in rows:
        assert r["h"] == spark_xxhash64(r["s"])
        assert r["h_int"] == spark_xxhash64(r["s"], 7)
        assert r["h_long"] == spark_xxhash64(r["s"], ("long", 7))
    lv = spark.createDataFrame([(0,), (1,), (-5,), (2**62,)], "v long")
    for r in lv.select("v", F.xxhash64("v").alias("h")).collect():
        assert r["h"] == spark_xxhash64(("long", r["v"]))


def test_minhash_signature_matches_python_reference(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")], "doc_id long, text string"
    )
    sh = word_shingles(docs, n=3)
    shingles = [r["shingle"] for r in sh.collect()]
    sig = minhash_signatures(sh, k=4).collect()[0]
    for i in range(4):
        want = min(spark_xxhash64(s, i) % MERSENNE for s in shingles)
        assert sig[f"mh_{i}"] == want


def test_simhash_matches_python_reference(spark):
    text = "alpha beta alpha gamma"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = simhash(docs).collect()[0]["simhash"]
    toks = text.split()
    sums = [0] * 64
    for t in toks:
        h = spark_xxhash64(t) & 0xFFFFFFFFFFFFFFFF
        for b in range(64):
            sums[b] += 1 if (h >> b) & 1 else -1
    fp = 0
    for b in range(64):
        if sums[b] > 0:
            fp |= 1 << b
    fp = fp - (1 << 64) if fp >= (1 << 63) else fp
    assert got == fp


def test_fingerprint_matches_python_reference(spark):
    text = "Spark Rolling Hash Fingerprint test"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = with_fingerprint(docs).collect()[0]["fingerprint"]
    acc = 0
    M = 2147483647
    for t in text.lower().split():
        acc = (acc * 1000003 + spark_xxhash64(t) % M) % M
    assert got == acc


def test_normalized_text_is_shared_basis(spark):
    """The dedup operators normalize identically (sanity anchor for the
    oracle SQL's regexp_replace mirror)."""
    df = spark.createDataFrame([("  A   b\tC  ",)], "text string")
    assert df.select(normalized_text().alias("n")).collect()[0]["n"] == "a b c"
