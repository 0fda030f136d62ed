"""Driver queries, part 7 (round 4).

Metamorphic ANN oracles (VERDICT r3 next-round #1): the approximate
index kernels run at *exhaustive* settings must equal brute force
exactly —

- ``ann_topk_ivf_full``: ``ivf_topk`` with ``nprobe = n_cells`` probes
  every cell, so the candidate set is the full table and the shared
  re-rank kernel makes the result identical to ``brute_force_topk``;
- ``ann_topk_lsh_exact``: ``lsh_topk`` with ``bands = n_planes`` (one
  bit per band) + multi-probe (which flips that bit) probes BOTH values
  of every band, so every vector is a candidate.

Both hash-check against the existing brute-force DuckDB oracle
(``ANN_BF_ORACLE_SQL``), converting the IVF/LSH family from
rows-only+recall to metamorphic-exact — the same trick as
``stft_parseval`` and the rollup cascade.

Plus the named W7 operator (``with_neighbor_context``, reference
``add_neighbors`` at
/root/reference/utils/sleep_data_prep/sleep_data_utils.py:190-202) with
a DuckDB ``list()``-window oracle; the array is emitted as a CSV string
on both sides so the driver's scalar value-compare applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .driver_queries import ORACLE, QUERIES, q  # noqa: F401
from .driver_queries_ext import ANN_BF_ORACLE_SQL
from .operators.derive import with_derived, with_neighbor_context
from .operators.similarity import ivf_topk, lsh_topk
from .sources.events_adapter import (
    EVENTS_AS_TRANSCRIPTS_NOGAP_SQL,
    events_as_transcripts,
    load_events,
)

__all__ = ["QUERIES", "ORACLE"]


def _queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb, emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


@q("ann_topk_ivf_full", ANN_BF_ORACLE_SQL)
def ann_topk_ivf_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF at nprobe = n_cells degenerates to exact search: every cell
    is probed, the union of probed cells is the whole table, and the
    re-rank kernel is shared with the (oracled) brute force — so this
    hash-checks the ENTIRE IVF code path (quantizer, cell tagging,
    probe join, re-rank) against the brute-force oracle."""
    emb, queries = _queries(spark, sf_dir)
    return ivf_topk(emb, queries, dim=64, k=5, n_cells=8, nprobe=8).select(
        "q_id", "rnk", "nbr_id"
    )


@q("ann_topk_lsh_exact", ANN_BF_ORACLE_SQL)
def ann_topk_lsh_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH at bands = n_planes (1 bit/band) + multi-probe covers both
    values of every band, so every vector shares a probed bucket and
    recall is exactly 1 — the full banded-join + re-rank path becomes
    hash-checkable against the brute-force oracle."""
    emb, queries = _queries(spark, sf_dir)
    return lsh_topk(
        emb, queries, dim=64, k=5, n_planes=16, bands=16, multiprobe=True
    ).select("q_id", "rnk", "nbr_id")


@q(
    "neighbor_context_tokens",
    f"""
WITH t AS ({EVENTS_AS_TRANSCRIPTS_NOGAP_SQL}),
d AS (
  SELECT conv_id, turn_idx,
         CASE WHEN text IS NULL OR trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS token_count
  FROM t
),
c AS (
  SELECT conv_id, CAST(turn_idx AS INT) AS turn_idx,
         list(token_count) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
         ) AS ctx
  FROM d
)
SELECT conv_id, turn_idx,
       array_to_string(ctx, ',') AS ctx_csv,
       CAST(len(ctx) AS BIGINT) AS ctx_n
FROM c
""",
)
def neighbor_context_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: ±2 neighbor token counts per turn as an array column
    (emitted CSV-joined for the scalar hash compare; clipped frames at
    conversation edges are part of the contract — ctx_n < 5 there)."""
    turns = events_as_transcripts(load_events(spark, sf_dir), with_gaps=False)
    ctx = with_neighbor_context(
        with_derived(turns), k=2, value_col="token_count", out_col="ctx"
    )
    return ctx.select(
        "conv_id",
        "turn_idx",
        F.array_join(F.col("ctx"), ",").alias("ctx_csv"),
        F.size(F.col("ctx")).cast("long").alias("ctx_n"),
    )


# ----------------------- F2 true frequency-domain filter (round 4 #3)

from .driver_queries_ext2 import activity_series  # noqa: E402
from .functions.filters import band_reconstruction  # noqa: E402
from .sources.events_adapter import EVENTS_AS_TRANSCRIPTS_SQL  # noqa: E402

_BANDPASS_RECON_SQL = f"""
WITH t AS ({EVENTS_AS_TRANSCRIPTS_SQL}),
d AS (SELECT conv_id, (epoch_us(ts) // 60000000) * 60000000 AS bucket_us FROM t),
r AS (SELECT conv_id, bucket_us FROM d GROUP BY conv_id, bucket_us),
b AS (SELECT conv_id, min(bucket_us) AS lo, max(bucket_us) AS hi FROM r GROUP BY conv_id),
n AS (SELECT conv_id, (hi - lo) // 60000000 + 1 AS n_idx FROM b),
g AS (
  SELECT conv_id, unnest(generate_series(0, least(CAST(n_idx - 1 AS BIGINT), 255))) AS idx
  FROM n
)
SELECT conv_id, CAST(idx AS INT) AS idx, CAST(0.0 AS DOUBLE) AS recon_err FROM g
"""


@q("bandpass_reconstruction", _BANDPASS_RECON_SQL)
def bandpass_reconstruction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 oracle: three adjacent brick-wall bands partitioning [0, fs/2]
    must reconstruct the input sample-for-sample (linearity of the
    spectral mask + exact irfft∘rfft inverse).  recon_err is rounded to
    9 decimals → exactly 0.0 on the oracle's (conv, idx) grid when the
    filter path is correct, so grid alignment AND the FFT mask math are
    hash-verified without an oracle FFT — the stft_parseval trick.
    Bounded to 256 samples/conv (mirrored in the oracle's least(.., 255));
    reference semantics: filter_signals at edf_reader.py:448-473."""
    return band_reconstruction(
        activity_series(spark, sf_dir),
        fs=1.0,
        edges=[0.0, 0.05, 0.2, 0.5],
        max_idx=256,
    )


# ------------------- fingerprint metamorphic oracle (round 4, session 4)

from .operators.text import with_fingerprint  # noqa: E402

# The xxhash64-seeded fingerprint VALUE is not SQL-reproducible, but its
# defining properties are: determinism (same token sequence -> same
# fingerprint) and injectivity on the corpus (different sequences ->
# different fingerprints). Both hold iff grouping docs by fingerprint
# equals grouping them by canonical token sequence — so emit the
# hash-independent group shape (min doc_id, size) from the fingerprint
# side and compute the same shape from the text side in DuckDB. A split
# of a text group (non-determinism) or a merge of two (collision) flips
# rep_doc/n_docs and fails the hash compare. Collisions are a corpus
# property, not flakiness: the 31-bit fold is collision-free on every
# driver corpus (asserted up to sf0.1 in test_round4_fixes) and the
# check is deterministic either way.
_FP_AUDIT_SQL = """
SELECT min(doc_id) AS rep_doc, CAST(count(*) AS BIGINT) AS n_docs
FROM (
  SELECT doc_id,
         array_to_string(regexp_split_to_array(trim(lower(text)), '\\s+'), ' ') AS canon
  FROM documents
)
GROUP BY canon
"""


@q("fingerprint_injectivity_audit", _FP_AUDIT_SQL)
def fingerprint_injectivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metamorphic-exact check of the ``with_fingerprint`` kernel
    (rolling 31-bit polynomial over tokens, text.py): fingerprint-groups
    must coincide with canonical-token-sequence groups. Converts the
    fingerprint family from rows-only to hash-checked without needing
    xxhash64 in SQL — the stft_parseval/ivf_full trick applied to
    hashing."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        with_fingerprint(docs)
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("rep_doc"), F.count(F.lit(1)).alias("n_docs"))
        .select("rep_doc", F.col("n_docs").cast("long").alias("n_docs"))
    )
