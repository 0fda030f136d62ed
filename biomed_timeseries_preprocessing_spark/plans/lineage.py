"""Per-(stage, partition) lineage + metrics rows, and resume.

The capability gap called out in SURVEY §2.9/§4: the reference's only
recovery aid is saving raw partials twice (``File_Struct.py:587-593``);
a killed run recomputes every patient. Here every pipeline stage commits
one lineage row per work partition (a conv_id hash-bucket), and resume is
an anti-join: pending = all buckets − committed buckets (FIXTURES F5).

Lineage rows are parquet in the catalog warehouse (append-only, one file
per commit — atomic enough via the snapshot catalog's rename commit).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import LocalSnapshotCatalog

LINEAGE_TABLE = "lineage"
LINEAGE_SCHEMA = (
    "run_id string, stage string, partition_key string, rows_in long, "
    "rows_out long, min_ts timestamp, max_ts timestamp, checksum long, "
    "wall_ms long, committed_at timestamp"
)


def bucket_of(conv_id_col, n_buckets: int):
    """Stable conv_id → work-bucket assignment (hash, not range, so
    buckets stay balanced as new conversations arrive)."""
    return F.pmod(F.xxhash64(conv_id_col), F.lit(n_buckets)).cast("int")


def frame_checksum(df: DataFrame, cols: list[str]) -> int:
    """Deterministic order-independent checksum: wrap-around sum of
    xxhash64 over the given columns (same value on any partitioning)."""
    row = df.select(
        F.sum(F.xxhash64(*[F.col(c) for c in cols]).cast("decimal(38,0)")).alias("c")
    ).collect()[0]
    # fold the exact decimal sum back into int64 range (ANSI-safe)
    return int(row["c"] or 0) % (1 << 63)


def frame_audit(
    df: DataFrame, checksum_cols: list[str], extent_col: str
) -> tuple[int, object, object, int]:
    """(row count, min(extent_col), max(extent_col), frame_checksum) in
    ONE Spark action. The per-tier lineage audit used to be three
    separate actions (count, extent collect, checksum collect); each
    action is a full pass plus a driver round-trip — pure Amdahl serial
    in the per-bucket commit loop, 3× worse than it needs to be at any
    cluster size."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.min(extent_col).alias("lo"),
        F.max(extent_col).alias("hi"),
        F.sum(
            F.xxhash64(*[F.col(c) for c in checksum_cols]).cast("decimal(38,0)")
        ).alias("c"),
    ).collect()[0]
    return int(row["n"]), row["lo"], row["hi"], int(row["c"] or 0) % (1 << 63)


@dataclass
class LineageLog:
    catalog: LocalSnapshotCatalog
    spark: SparkSession

    def committed(self, run_id: str, stage: str) -> set[str]:
        """Partition keys already committed for (run lineage, stage).
        run_id scoping is by *pipeline identity* (caller passes the same
        run_id on resume), mirroring Iceberg's snapshot lineage."""
        try:
            df = self.catalog.read(self.spark, LINEAGE_TABLE)
        except FileNotFoundError:
            return set()
        rows = (
            df.filter((F.col("run_id") == run_id) & (F.col("stage") == stage))
            .select("partition_key")
            .distinct()
            .collect()
        )
        return {r["partition_key"] for r in rows}

    def commit(
        self,
        run_id: str,
        stage: str,
        partition_key: str,
        rows_in: int,
        rows_out: int,
        min_ts,
        max_ts,
        checksum: int,
        wall_ms: int,
    ) -> None:
        self.commit_many(
            run_id,
            [
                (
                    run_id,
                    stage,
                    partition_key,
                    rows_in,
                    rows_out,
                    min_ts,
                    max_ts,
                    checksum,
                    wall_ms,
                )
            ],
        )

    def commit_many(self, run_id: str, rows: list[tuple]) -> None:
        """One snapshot commit for a batch of lineage rows (e.g. every
        stage of one work bucket) — lineage stays atomic per bucket and
        the snapshot count drops from stages×buckets to buckets."""
        pdf = self.spark.createDataFrame(
            rows,
            "run_id string, stage string, partition_key string, rows_in long, "
            "rows_out long, min_ts timestamp, max_ts timestamp, checksum long, wall_ms long",
        ).withColumn("committed_at", F.current_timestamp())
        self.catalog.append(LINEAGE_TABLE, pdf, {"run_id": run_id})

    def metrics(self, run_id: str | None = None) -> DataFrame:
        df = self.catalog.read(self.spark, LINEAGE_TABLE)
        return df.filter(F.col("run_id") == run_id) if run_id else df


def pending_buckets(
    log: LineageLog, run_id: str, stage: str, all_buckets: list[int]
) -> list[int]:
    """Resume = anti-join of the full bucket list against committed
    lineage (the reference's missing checkpoint/resume, SURVEY §4)."""
    done = log.committed(run_id, stage)
    return [b for b in all_buckets if str(b) not in done]
