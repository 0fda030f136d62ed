"""Driver queries, part 8 (round 4, session 4).

Metamorphic hash-exact oracles for the last two xxhash64-seeded
families (minhash, simhash) — the same trick as
``fingerprint_injectivity_audit`` / ``ann_topk_ivf_full``: the hash
VALUES are not SQL-reproducible, but at a degenerate setting the
pipeline's OUTPUT is hash-independent and therefore oracle-checkable:

- ``minhash_exactdup_audit``: at ``threshold=1.0`` the full
  shingle → signature → LSH-band → Jaccard-verify pipeline must return
  exactly the pairs with IDENTICAL shingle sets, whatever the seeds —
  identical sets give identical signatures, hence co-bucket in every
  band (recall 1 by construction), and the exact-integer Jaccard
  verifier passes only n_inter == n_a == n_b (1.0 exactly in IEEE).
- ``simhash_hamming0_audit``: SimHash is token-multiset-determined, so
  equal multisets always land at Hamming distance 0 and survive the
  pigeonhole banding (all chunks equal) — the recall direction is
  structural. Distinct multisets CAN collide at distance 0 (SimHash is
  lossy; these template corpora measurably do), so the audit verifies
  candidates by exact multiset equality — the candidates→verify shape
  every production near-dup pipeline uses — making the output
  seed-independent and hash-exact.

Both run over a PLANTED corpus (documents ∪ exact copies of every 5th
doc at doc_id+1_000_000) because the sf0.01 fixture has no natural
exact-dup groups — an empty-vs-empty oracle would verify nothing. The
oracle does NOT assume the plant: it independently recomputes
shingle-set / token-multiset equality over the same planted corpus in
DuckDB (at sf0.1 the corpus also has 8 natural duplicate groups, which
the pytest certification exercises).

Reference semantics being certified: the near-duplicate candidate
policy of the task brief's LLM-pipeline family; kernel provenance in
``operators/dedup.py`` (Broder minhash, Charikar simhash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .driver_queries import ORACLE, QUERIES, q  # noqa: F401
from .operators.dedup import (
    minhash_dedup,
    normalized_text,
    simhash,
    simhash_candidates,
)

__all__ = ["QUERIES", "ORACLE"]

PLANT_OFFSET = 1_000_000
PLANT_MOD = 5

_PLANTED_CORPUS_SQL = f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {PLANT_OFFSET} AS doc_id, text
  FROM documents WHERE doc_id % {PLANT_MOD} = 0
"""


def planted_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    clones = docs.filter(F.col("doc_id") % PLANT_MOD == 0).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"), "text"
    )
    return docs.unionByName(clones)


# Canonical shingle-set key, mirroring word_shingles (n=3, distinct,
# whole-doc fallback below 3 tokens); chr(31) joins so a shingle's
# internal spaces can't alias a set boundary.
_MINHASH_AUDIT_SQL = rf"""
WITH corpus AS ({_PLANTED_CORPUS_SQL}),
norm AS (
  SELECT doc_id,
         regexp_split_to_array(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM corpus
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN array_to_string(
                     list_sort(list_distinct(list_transform(
                       generate_series(1, len(toks) - 2),
                       i -> array_to_string(toks[i:i+2], ' ')))),
                     chr(31))
              ELSE array_to_string(toks, ' ') END AS canon
  FROM norm
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(1.0 AS DOUBLE) AS jaccard
FROM sh a JOIN sh b ON a.canon = b.canon AND a.doc_id < b.doc_id
"""


@q("minhash_exactdup_audit", _MINHASH_AUDIT_SQL)
def minhash_exactdup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-pipeline metamorphic check of ``minhash_dedup``: at
    threshold 1.0 (and no bucket cap) the output is seed-independent —
    exactly the identical-shingle-set pairs — so shingling, the k
    min-aggregates, band hashing, the candidate self-join and the
    integer-exact Jaccard verifier are all hash-checked end to end."""
    pairs = minhash_dedup(
        planted_corpus(spark, sf_dir), n=3, k=32, bands=8, threshold=1.0
    )
    return pairs.select("doc_a", "doc_b", F.col("jaccard").cast("double"))


_SIMHASH_AUDIT_SQL = rf"""
WITH corpus AS ({_PLANTED_CORPUS_SQL}),
ms AS (
  SELECT doc_id,
         array_to_string(
           list_sort(regexp_split_to_array(
             regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')),
           ' ') AS canon
  FROM corpus
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM ms a JOIN ms b ON a.canon = b.canon AND a.doc_id < b.doc_id
"""


@q("simhash_hamming0_audit", _SIMHASH_AUDIT_SQL)
def simhash_hamming0_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash candidates at Hamming 0, verified by exact token-multiset
    equality, must equal exactly the multiset-equal pairs — whatever the
    hash seeds. Recall is structural (equal multiset ⇒ bit-identical
    fingerprint ⇒ all chunk bands equal ⇒ candidate emitted): if the
    fingerprint construction or the banded join dropped such a pair the
    row would be missing and the hash compare would fail. Precision
    comes from the verify join, exactly as a production near-dup
    pipeline verifies its candidates — necessary here because SimHash
    is lossy by design and these template-generated corpora DO contain
    distinct-multiset Hamming-0 collisions (4 fingerprint groups at
    sf0.01, measured), which the verifier removes deterministically."""
    corpus = planted_corpus(spark, sf_dir)
    fps = simhash(corpus)
    canon = corpus.select(
        "doc_id",
        F.array_join(F.array_sort(F.split(normalized_text(), " ")), " ").alias("canon"),
    )
    cand = simhash_candidates(fps).filter(F.col("hamming") == 0)
    return (
        cand.join(canon.select(F.col("doc_id").alias("doc_a"), F.col("canon").alias("canon_a")), "doc_a")
        .join(canon.select(F.col("doc_id").alias("doc_b"), F.col("canon").alias("canon_b")), "doc_b")
        .filter(F.col("canon_a") == F.col("canon_b"))
        .select("doc_a", "doc_b")
    )
