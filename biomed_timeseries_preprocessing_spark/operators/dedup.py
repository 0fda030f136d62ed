"""Deduplication operators over the documents table: exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Public-knowledge basis: Broder's MinHash/shingling (1997), Charikar's
SimHash (2002), the standard LSH banding scheme. Everything is JVM-side
DataFrame algebra (explode → agg → self-join) — no Python in the hot
path; hash functions are Spark's xxhash64 seeded per-permutation, so
results are deterministic across cluster sizes.

Scale notes:
- minhash signatures are k aggregations over exploded shingles — one
  shuffle by doc_id, map-side partial min;
- candidate generation self-joins on (band_idx, band_hash) — the join
  key is the LSH bucket, so the shuffle is bounded by bucket sizes, and
  AQE's skew-join splits a pathological bucket;
- verification (exact Jaccard) touches only candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.truncate import plan_checkpoint

MERSENNE = (1 << 61) - 1


def normalized_text(text=None):
    t = text if text is not None else F.col("text")
    return F.regexp_replace(F.trim(F.lower(t)), r"\s+", " ")


# ------------------------------------------------------------- exact

def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup on normalized text: one row per distinct
    content, canonical id = min id, plus duplicate count."""
    return (
        docs.withColumn("_norm", normalized_text(F.col(text)))
        .groupBy("_norm")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .drop("_norm")
    )


# ------------------------------------------------------------ shingles

def word_shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """Distinct word n-grams per document (the Broder shingling step),
    built with JVM array functions: split → sliding windows via
    transform over index sequence → explode.

    The tokenization is materialized in its own projection BEFORE the
    higher-order ``transform``: referencing the raw
    ``split(normalize(text))`` expression inside the lambda re-evaluates
    the split + regex per ARRAY ELEMENT (no common-subexpression
    elimination across the lambda boundary) — measured 9× slower on the
    sf0.1 documents table. CollapseProject keeps the two selects as one
    stage but leaves the non-cheap alias un-inlined.

    Tokens come from ``split(trim(lower(text)), '\\s+')`` directly —
    splitting on whitespace RUNS yields exactly the token array the old
    normalize-then-split-on-single-space produced, minus one full regex
    rewrite of the corpus (guide §1.2: per-task work).

    ``distinct=False`` skips the set-dedup shuffle for consumers that
    are multiset-invariant — MinHash signatures (min over a multiset ==
    min over its set) — so the whole shingle pass stays map-side."""
    toks = F.col("__toks")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.lower(F.col(text))), r"\s+").alias("__toks"),
    ).select("doc_id", F.explode(grams).alias("shingle"))
    return out.distinct() if distinct else out


# ------------------------------------------------------------- minhash

def minhash_signatures(shingled: DataFrame, k: int = 32) -> DataFrame:
    """k-permutation MinHash: sig_i(doc) = min over shingles of
    xxhash64(shingle, seed=i) folded into a Mersenne-prime field.
    One groupBy(doc_id) with k min-aggregates (map-side combine)."""
    aggs = [
        F.min(F.pmod(F.xxhash64(F.col("shingle"), F.lit(i)), F.lit(MERSENNE))).alias(f"mh_{i}")
        for i in range(k)
    ]
    return shingled.groupBy("doc_id").agg(*aggs)


def _banded(signatures: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(doc_id, band, bucket) rows: each band of the MinHash signature
    hashed to its LSH bucket."""
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("bucket")))
    return signatures.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def lsh_bucket_stats(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Bucket-size distribution (band, bucket, n_docs) — run this to pick
    / audit ``max_bucket_size`` (no silent caps: callers can count and
    report exactly which degenerate buckets a cap would drop)."""
    return _banded(signatures, bands, rows_per_band).groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def lsh_candidates(
    signatures: DataFrame,
    bands: int = 8,
    rows_per_band: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH banding: hash each band of the signature to a bucket; docs
    sharing any (band, bucket) become a candidate pair (doc_a < doc_b).

    ``max_bucket_size`` drops buckets larger than the cap BEFORE pair
    generation — one degenerate bucket (boilerplate shingles, exact-dup
    clusters that skipped exact_dedup) otherwise explodes candidates
    quadratically. Pairs only reachable through dropped buckets are
    lost; use ``lsh_bucket_stats`` to report what a cap drops, and run
    ``exact_dedup`` first so identical docs never reach this operator.

    Physical shape (r6): pairs come from ONE ``collect_list`` per
    (band, bucket) followed by an in-bucket double explode, instead of
    the banded SELF-JOIN the r5 plan used. The join form evaluated the
    signature aggregation once per join side and once more for the
    bucket-size cap (the upstream minhash agg appeared 4× in the
    physical plan); the grouped form evaluates it ONCE, shuffles the
    (doc_id, band, bucket) rows a single time, and the cap becomes a
    ``size(_ids)`` filter — no second aggregation, no join. Per-task
    memory is bounded by ``max_bucket_size`` ids per group (set it at
    scale; lsh_bucket_stats audits what the cap drops)."""
    exploded = _banded(signatures, bands, rows_per_band)
    buckets = exploded.groupBy("band", "bucket").agg(
        F.collect_list("doc_id").alias("_ids")
    )
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("_ids") <= max_bucket_size)
    pairs = (
        buckets.filter(F.size("_ids") >= 2)
        .select(F.explode("_ids").alias("doc_a"), "_ids")
        .select("doc_a", F.explode("_ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )
    return pairs


def jaccard_verify(pairs: DataFrame, shingled: DataFrame, threshold: float = 0.7) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only:
    |A∩B| via join on (doc, shingle), |A∪B| = |A|+|B|−|A∩B|. Exact
    integer counts; similarity as one double division at the end.

    Physical shape (r6): every join moves only CANDIDATE-bounded data.
    The full shingle table is first semi-filtered to docs that appear in
    some pair (broadcast of the distinct candidate ids), so sizes,
    intersection streams, and the broadcast build sides are all
    O(candidates × shingles-per-doc) — the r5 plan broadcast the ENTIRE
    shingle relation twice (guide §3.1: broadcast the side you know is
    small; the candidate side is the bounded one here, by construction
    of the capped LSH buckets). Callers verifying a non-trivial pair set
    should pass a plan-truncated ``pairs`` (minhash_dedup does) — the
    pair subtree feeds four broadcast builds."""
    docs_needed = pairs.select(
        F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
    ).distinct()
    cand_sh = shingled.join(F.broadcast(docs_needed), "doc_id")
    sizes = cand_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        F.broadcast(pairs)
        .join(cand_sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(
            F.broadcast(
                cand_sh.select(F.col("doc_id").alias("doc_b"), "shingle")
            ),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(
            F.broadcast(
                sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a")
            ),
            "doc_a",
        )
        .join(
            F.broadcast(
                sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b")
            ),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold)


def minhash_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
    max_bucket_size: int | None = None,
    reuse_shingles: bool = True,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH bands → exact
    Jaccard verification. Returns (doc_a, doc_b, jaccard) pairs.

    Physical shape (r6 rewrite — the 10M-row shingle table is never
    materialized, shuffled, or checkpointed):

    - signatures run over NON-distinct shingles (min over a multiset ==
      min over its set, so the 32-way min aggregation is bit-identical)
      with map-side partial aggregation — the only thing crossing the
      signature exchange is ~one 33-long row per (doc, map partition),
      not the shingle strings. The r5 plan localCheckpoint-ed the full
      distinct shingle table (its materialization alone was 11.7 of the
      14 s pipeline at 50k docs) and still re-evaluated the signature
      aggregation once per self-join side.
    - the candidate pair set (tiny by construction: capped LSH buckets)
      is plan-truncated, then ONLY candidate docs are re-shingled
      (distinct, as Jaccard needs sets) for verification — a broadcast
      semi-join of the distinct candidate ids against the corpus. At
      100 TB this re-reads the text of candidate docs once instead of
      storing every doc's shingles on executors.

    ``reuse_shingles=False`` keeps candidate lineage pure (no
    checkpoint) for checkpoint-free recovery; the truncation routes
    through :func:`plan_checkpoint` (reliable checkpoint when the
    session has a checkpoint dir, executor-local otherwise — ADVICE
    r4)."""
    sig = minhash_signatures(word_shingles(docs, id_col, text, n, distinct=False), k)
    cand = lsh_candidates(sig, bands, k // bands, max_bucket_size)
    if reuse_shingles:
        # the candidate set feeds the verification joins and the
        # candidate-doc semi-filter below; truncating here keeps the
        # shingle→signature→LSH subtree from re-running once per
        # consumer. O(pairs) materialization.
        cand = plan_checkpoint(cand, eager=False)
    docs_needed = cand.select(
        F.explode(F.array("doc_a", "doc_b")).alias("_cand_id")
    ).distinct()
    cand_docs = docs.join(
        F.broadcast(docs_needed),
        F.col(id_col) == F.col("_cand_id"),
        "left_semi",
    )
    sh_cand = word_shingles(cand_docs, id_col, text, n)
    if reuse_shingles:
        # candidate shingles feed three verification consumers (sizes,
        # a-side stream, b-side broadcast build); truncate so the
        # tokenize+distinct of candidate docs runs once. Bounded by
        # candidates × shingles-per-doc — NOT the corpus.
        sh_cand = plan_checkpoint(sh_cand, eager=False)
    return jaccard_verify(cand, sh_cand, threshold).select("doc_a", "doc_b", "jaccard")


# ------------------------------------------------------------- simhash

def _bit_lit(b: int):
    """int64 literal with only bit b set (bit 63 = sign bit → min long)."""
    return F.lit(1 << b) if b < 63 else F.lit(-(1 << 63))


def simhash(docs: DataFrame, id_col: str = "doc_id", text: str = "text", bits: int = 64) -> DataFrame:
    """Charikar SimHash: per token, xxhash64(token) contributes ±1 to each
    bit position weighted by term frequency; fingerprint bit b = 1 iff the
    sum is positive. Pure explode + 64 conditional sums (JVM)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.lower(F.col(text))), r"\s+")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    aggs = [
        F.sum(
            F.when(F.col("h").bitwiseAND(_bit_lit(b)) != 0, 1).otherwise(-1)
        ).alias(f"s_{b}")
        for b in range(bits)
    ]
    sums = toks.groupBy("doc_id").agg(*aggs)
    fp = None
    for b in range(bits):
        bit = F.when(F.col(f"s_{b}") > 0, _bit_lit(b)).otherwise(F.lit(0))
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return sums.select("doc_id", fp.alias("simhash"))


def simhash_packed(
    docs: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """SimHash with packed aggregation lanes (r3 verdict #8): the ±1 sum
    per bit b equals ``2·S_b − n`` where ``S_b`` counts tokens with bit
    b set and ``n`` is the token count — so instead of 64 sum buffers,
    spread each hash's bits into 16 longs of 4×16-bit lanes and sum
    those (17 agg buffers total).  Fingerprints are IDENTICAL to
    ``simhash`` (asserted in pytest).

    Lane capacity is 65,535 tokens per document; exceeding it would
    silently corrupt a lane, so the extract side *raises* past the cap
    (split such documents upstream, or use ``simhash``)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.lower(F.col(text))), r"\s+")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    # group g packs bits (g, g+16, g+32, g+48) into 4 disjoint 16-bit lanes
    packs = [
        sum(
            F.shiftleft(
                F.shiftrightunsigned(F.col("h"), g + 16 * lane).bitwiseAND(F.lit(1)),
                16 * lane,
            )
            for lane in range(4)
        ).alias(f"p_{g}")
        for g in range(16)
    ]
    sums = toks.select("doc_id", *packs).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(f"p_{g}").alias(f"sp_{g}") for g in range(16)],
    )
    guarded_n = F.when(
        F.col("n") > 0xFFFF,
        F.raise_error(
            F.format_string(
                "simhash_packed lane overflow: doc %s has %s tokens (cap 65535)",
                F.col("doc_id").cast("string"),
                F.col("n").cast("string"),
            )
        ).cast("long"),
    ).otherwise(F.col("n"))
    fp = None
    for g in range(16):
        for lane in range(4):
            b = g + 16 * lane
            s_b = F.shiftrightunsigned(F.col(f"sp_{g}"), 16 * lane).bitwiseAND(
                F.lit(0xFFFF)
            )
            bit = F.when(s_b * 2 > guarded_n, _bit_lit(b)).otherwise(F.lit(0))
            fp = bit if fp is None else fp.bitwiseOR(bit)
    return sums.select("doc_id", fp.alias("simhash"))


def simhash_candidates(fps: DataFrame, chunk_bits: int = 16) -> DataFrame:
    """Hamming-near pairs by banding the 64-bit fingerprint into 16-bit
    chunks (pigeonhole: ≤3 differing bits ⇒ some chunk equal)."""
    # ONE equi-join on (chunk_id, chunk_val) instead of a union of 4
    # per-chunk self-joins: the union form embedded the upstream simhash
    # aggregation 8× in the plan (2 sides × 4 joins, each shuffling on a
    # DIFFERENT key so nothing was reusable) — measured 52-58 s → 12 s
    # at 50k dense docs for a bit-identical pair set. The exploded form
    # shuffles both sides on the same key, so the exchanges are
    # canonically equal and the fingerprint agg runs once per side.
    n_chunks = 64 // chunk_bits
    ex = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("cid"),
                        F.shiftrightunsigned(F.col("simhash"), i * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("val"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", "c.cid", "c.val")
    a, b = ex.alias("a"), ex.alias("b")
    out = a.join(
        b,
        (F.col("a.cid") == F.col("b.cid"))
        & (F.col("a.val") == F.col("b.val"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.simhash").alias("sh_a"),
        F.col("b.simhash").alias("sh_b"),
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return out.distinct().withColumn("hamming", ham)
