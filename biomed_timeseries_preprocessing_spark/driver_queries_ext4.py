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
from .operators.components import neardup_clusters

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
