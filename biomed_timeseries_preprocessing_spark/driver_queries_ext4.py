"""Driver-contract queries, part 5 (round 2): near-dup cluster
canonicalization, codec round-trip verification, Parseval STFT check,
class-coverage filter, min-rows guard.

Same conventions as driver_queries.py (registered into the same
QUERIES / ORACLE dicts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .driver_queries import ORACLE, QUERIES, q  # noqa: F401
from .driver_queries_ext2 import activity_series
from .functions.codec import decode_chunks_df, encode_chunks
from .functions.spectral import stft_parseval
from .operators.components import neardup_clusters
from .operators.derive import with_derived
from .operators.guards import class_coverage, min_rows_guard
from .sources.events_adapter import (
    EVENTS_AS_TRANSCRIPTS_SQL,
    events_as_transcripts,
    load_events,
)

__all__ = ["QUERIES", "ORACLE"]


# ------------------------------------- near-dup clusters (canonical ids)

# Oracle: the SAME exact pipeline in plain SQL — word 3-grams on
# normalized text, shared-shingle candidate pairs, exact integer Jaccard,
# then connected components via a recursive transitive closure (feasible
# at oracle scale; Spark uses distributed label propagation instead).
_NEARDUP_CLUSTERS_SQL = """
WITH RECURSIVE
t AS (
  SELECT doc_id,
         regexp_split_to_array(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(toks) >= 3 THEN array_to_string(toks[i:i+2], ' ')
              ELSE array_to_string(toks, ' ') END AS shingle
  FROM t, LATERAL (SELECT unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS i) g
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = inter.doc_a
  JOIN sizes sb ON sb.doc_id = inter.doc_b
  WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.5
),
sym AS (SELECT doc_a AS s, doc_b AS d FROM edges UNION SELECT doc_b, doc_a FROM edges),
reach(a, b) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.a, e.d FROM reach r JOIN sym e ON r.b = e.s
),
comp AS (SELECT a AS doc_id, min(b) AS canonical_id FROM reach GROUP BY a),
cs AS (SELECT canonical_id, count(*) AS cluster_size FROM comp GROUP BY canonical_id)
SELECT comp.doc_id, comp.canonical_id,
       CAST(cs.cluster_size AS BIGINT) AS cluster_size,
       comp.doc_id <> comp.canonical_id AS is_duplicate
FROM comp JOIN cs USING (canonical_id)
"""


@q("neardup_clusters", _NEARDUP_CLUSTERS_SQL)
def neardup_clusters_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return neardup_clusters(docs, n=3, threshold=0.5)


# --------------------------------- codec round-trip (EXACT oracle check)

@q(
    "codec_roundtrip",
    f"""
WITH t AS ({EVENTS_AS_TRANSCRIPTS_SQL})
SELECT conv_id, ts,
       CAST((epoch_us(ts) - lag(epoch_us(ts))
             OVER (PARTITION BY conv_id ORDER BY turn_idx)) // 1000 AS DOUBLE) AS latency_ms,
       CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS token_count
FROM t
""",
)
def codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode → decode → per-turn rows compared EXACTLY against the raw
    derived turns: exercises both the vectorized batch encoder and the
    vectorized batch decoder (read path) under the driver's value-hash
    gate. The conversation-head NULL latency round-trips as a NaN bit
    pattern and is mapped back to NULL here."""
    t = events_as_transcripts(load_events(spark, sf_dir))
    d = with_derived(t)
    chunks = encode_chunks(d, chunk_seconds=86400)
    dec = decode_chunks_df(chunks)
    return dec.select(
        "conv_id",
        "ts",
        F.when(F.isnan("latency_ms"), F.lit(None)).otherwise(F.col("latency_ms")).alias("latency_ms"),
        F.col("token_count").cast("long").alias("token_count"),
    )


# ----------------------------- STFT Parseval identity (oracle-checkable)

_STFT_PARSEVAL_SQL = f"""
WITH t AS ({EVENTS_AS_TRANSCRIPTS_SQL}),
d AS (SELECT conv_id, (epoch_us(ts) // 60000000) * 60000000 AS bucket_us FROM t),
r AS (SELECT conv_id, bucket_us FROM d GROUP BY conv_id, bucket_us),
b AS (SELECT conv_id, min(bucket_us) AS lo, max(bucket_us) AS hi FROM r GROUP BY conv_id),
n AS (SELECT conv_id, (hi - lo) // 60000000 + 1 AS n_idx FROM b),
f AS (
  SELECT conv_id,
         unnest(generate_series(0, least(CAST((n_idx - 32) // 16 AS BIGINT), 63))) AS frame_idx
  FROM n WHERE n_idx >= 32
)
SELECT conv_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(1.0 AS DOUBLE) AS parseval_ratio
FROM f
"""


# -------------------------------- P11 class-coverage filter (Discarder)

_COVERAGE_TYPES = ["click", "error", "purchase", "signup", "view"]


@q(
    "class_coverage_users",
    f"""
SELECT user_id,
       {', '.join(f"CAST(count(CASE WHEN event_type = '{c}' THEN 1 END) AS BIGINT) AS n_{c}" for c in _COVERAGE_TYPES)},
       {' AND '.join(f"count(CASE WHEN event_type = '{c}' THEN 1 END) > 0" for c in _COVERAGE_TYPES)} AS covered
FROM events GROUP BY user_id
""",
)
def class_coverage_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-recording class-coverage report + discard flag — the
    Minute_Discarder._contain_all_labels analog on the events table."""
    ev = load_events(spark, sf_dir)
    rep = class_coverage(ev, ["user_id"], "event_type", _COVERAGE_TYPES)
    return rep.select(
        "user_id",
        *[F.col(f"n_{c}").cast("long").alias(f"n_{c}") for c in _COVERAGE_TYPES],
        "covered",
    )


# ------------------------------------ K5 min-rows sink guard (Save_Agent)

@q(
    "min_rows_guard_kept",
    """
SELECT e.user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM events e
JOIN (SELECT user_id FROM events GROUP BY user_id HAVING count(*) >= 60) k
  ON e.user_id = k.user_id
GROUP BY e.user_id
""",
)
def min_rows_guard_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sink admission guard: only groups with ≥ min_rows reach the write
    (Save_Agent's skip-small-windows), aggregated per kept group."""
    ev = load_events(spark, sf_dir)
    kept, _dropped = min_rows_guard(ev, ["user_id"], min_rows=60)
    return kept.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_c"),
    )


@q("stft_parseval", _STFT_PARSEVAL_SQL)
def stft_parseval_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parseval check of the FFT path: per STFT frame, spectral energy
    must equal N × windowed time-domain energy — the oracle reproduces
    the exact (conv, frame) grid and the identity value 1.0, so frame
    alignment AND spectral math are hash-verified without an oracle FFT.
    Bounded to 64 frames/conv (mirrored in the oracle's least(.., 63)):
    the identity doesn't get truer after frame 64, and unbounded output
    made this the slowest correctness query (393k rows at sf0.01)."""
    return stft_parseval(activity_series(spark, sf_dir), frame=32, hop=16, max_frames=64)
