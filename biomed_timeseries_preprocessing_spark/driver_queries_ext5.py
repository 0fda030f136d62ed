"""Driver queries, part 6 (round 3): file-catalog pairing operators
(SURVEY §2 P3/P4/P5, J1, K12) with exact DuckDB oracles.

The operators take a file catalog; the driver contract only ships the
TPC-H-ish parquet tables, so both sides first derive the SAME
deterministic catalog from ``documents.doc_id``:

- every doc is a patient ``p%04d`` with session-1 data ``.s1.edf``
  unless ``doc_id % 13 == 5`` (missing-data integrity case);
- a session-1 ``a1`` label unless ``doc_id % 17 == 3`` (missing-label
  case); an extra ``a2`` labeler file when ``doc_id % 5 == 0`` (the
  labeler-dedup case, dropped by P4);
- a second session (data + label) when ``doc_id % 7 == 0`` so the
  positional J1 pairing is exercised beyond file_idx 0.

This is pure integer arithmetic + printf on both engines, so the oracle
is value-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .driver_queries import ORACLE, QUERIES, q  # noqa: F401
from .sources.pairing import classify_files, labeler_filter, pair_files, patient_map

__all__ = ["QUERIES", "ORACLE"]


_CATALOG_SQL = """
cat AS (
  SELECT printf('/lake/p%04d.s1.edf', doc_id) AS path FROM documents WHERE doc_id % 13 <> 5
  UNION ALL
  SELECT printf('/lake/p%04d.s1.a1.tsv', doc_id) FROM documents WHERE doc_id % 17 <> 3
  UNION ALL
  SELECT printf('/lake/p%04d.s1.a2.tsv', doc_id) FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT printf('/lake/p%04d.s2.edf', doc_id) FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT printf('/lake/p%04d.s2.a1.tsv', doc_id) FROM documents WHERE doc_id % 7 = 0
),
cls AS (
  SELECT path,
         split_part(split_part(path, '/', 3), '.', 1) AS patient,
         path LIKE '%.edf%' AS is_data,
         path LIKE '%.tsv%' AS is_label
  FROM cat
  WHERE path LIKE '%.edf%' OR path LIKE '%.tsv%'
),
ded AS (SELECT * FROM cls WHERE NOT is_label OR path LIKE '%a1%'),
d AS (
  SELECT patient, path AS data_file,
         CAST(row_number() OVER (PARTITION BY patient ORDER BY path) - 1 AS INT) AS file_idx
  FROM ded WHERE is_data
),
l AS (
  SELECT patient, path AS label_file,
         CAST(row_number() OVER (PARTITION BY patient ORDER BY path) - 1 AS INT) AS file_idx
  FROM ded WHERE is_label
),
cnt AS (
  SELECT coalesce(dc.patient, lc.patient) AS patient,
         coalesce(n_data, 0) AS n_data, coalesce(n_label, 0) AS n_label
  FROM (SELECT patient, count(*) AS n_data FROM d GROUP BY patient) dc
  FULL JOIN (SELECT patient, count(*) AS n_label FROM l GROUP BY patient) lc
    ON dc.patient = lc.patient
)
"""


def _catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    p = F.format_string
    pieces = [
        docs.filter(F.col("doc_id") % 13 != 5).select(
            p("/lake/p%04d.s1.edf", "doc_id").alias("path")
        ),
        docs.filter(F.col("doc_id") % 17 != 3).select(
            p("/lake/p%04d.s1.a1.tsv", "doc_id").alias("path")
        ),
        docs.filter(F.col("doc_id") % 5 == 0).select(
            p("/lake/p%04d.s1.a2.tsv", "doc_id").alias("path")
        ),
        docs.filter(F.col("doc_id") % 7 == 0).select(
            p("/lake/p%04d.s2.edf", "doc_id").alias("path")
        ),
        docs.filter(F.col("doc_id") % 7 == 0).select(
            p("/lake/p%04d.s2.a1.tsv", "doc_id").alias("path")
        ),
    ]
    out = pieces[0]
    for x in pieces[1:]:
        out = out.unionByName(x)
    return out


def _classified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return labeler_filter(
        classify_files(_catalog(spark, sf_dir), [".edf"], [".tsv"]), "a1"
    )


@q(
    "pair_files_catalog",
    f"WITH {_CATALOG_SQL} "
    "SELECT d.patient, d.file_idx, d.data_file, l.label_file "
    "FROM d JOIN l ON d.patient = l.patient AND d.file_idx = l.file_idx "
    "JOIN cnt ON cnt.patient = d.patient "
    "WHERE cnt.n_data = cnt.n_label AND cnt.n_label > 0",
)
def pair_files_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: positional data↔label pairing per patient (File_Struct.py:144-148)."""
    paired, _ = pair_files(_classified(spark, sf_dir))
    return paired


@q(
    "pairing_dropped_report",
    f"WITH {_CATALOG_SQL} "
    "SELECT patient, n_data, n_label FROM cnt "
    "WHERE n_data <> n_label OR n_label = 0",
)
def pairing_dropped_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: the integrity report — patients whose data/label counts
    mismatch are dropped whole and REPORTED (File_Struct.py:134-141's
    warning, as a frame instead of a stderr line)."""
    _, dropped = pair_files(_classified(spark, sf_dir))
    return dropped


@q(
    "patient_map_dim",
    f"WITH {_CATALOG_SQL} "
    "SELECT patient, printf('patient_%04d', "
    "       CAST(row_number() OVER (ORDER BY patient) - 1 AS BIGINT)) AS patient_id "
    "FROM (SELECT DISTINCT patient FROM ded) t",
)
def patient_map_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K12: the anonymized patient dim (File_Struct.py:109-112's
    names_dict), deterministic under any partitioning."""
    return patient_map(_classified(spark, sf_dir))


# ---------------------------- embedding-cosine near-dup (exact oracle)

from .operators.similarity import embedding_neardup  # noqa: E402


@q(
    "embedding_neardup_pairs",
    """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) * 1000000) AS BIGINT)
         AS cosine_e6
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.42
""",
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup (exact mode for the oracle; the LSH
    scale path is recall-asserted in pytest). cosine is emitted as
    floor(c*1e6) so the hash check never rides on engine-specific float
    formatting of the raw double."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = embedding_neardup(emb, dim=64, threshold=0.42, mode="exact")
    return pairs.select(
        "id_a", "id_b",
        F.floor(F.col("cosine") * 1_000_000).cast("long").alias("cosine_e6"),
    )


# --------------------------------------------- IVF ANN (quantizer path)

from .operators.similarity import ivf_topk  # noqa: E402


@q("ann_topk_ivf")  # rows-only: approximate by design (recall vs brute
# force asserted in pytest; brute force itself is the oracled query)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return ivf_topk(emb, queries, dim=64, k=5, n_cells=8, nprobe=4).select(
        "q_id", "rnk", "nbr_id"
    )
