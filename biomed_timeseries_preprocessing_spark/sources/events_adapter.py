"""Adapter: the driver's `events` table viewed as a transcript table.

`events(event_id long, ts timestamp, user_id long, event_type string,
value double, props string)` is shape-compatible with the input_hint
transcript schema (FIXTURES.md F8): user_id→conv_id, props→text,
event_type→role, per-user order→turn_idx. This lets the DuckDB-oracle
driver checks exercise the *actual engine operators* (derive → gapfill →
rollup cascade) on data both sides can see.

``turn_idx`` is assigned ``rn-1 + (rn-1) DIV 3`` (rn = per-user
row_number by (ts, event_id)) — a deterministic index with a hole after
every third turn, so the gap-fill operator has real gaps to fill on
driver data too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pandas-written parquet surfaces as TIMESTAMP_NTZ in Spark 4; the
    # session TZ is pinned UTC so casting to TIMESTAMP preserves values
    # while enabling unix_micros() and friends.
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))


def events_as_transcripts(events: DataFrame, with_gaps: bool = True) -> DataFrame:
    # The row_number window partitions by the conv_id EXPRESSION rather
    # than user_id (bijective for int-range ids — %08d pads, never
    # truncates): Spark's alias-aware partitioning propagation then lets
    # every downstream per-conversation operator (derive's lag window,
    # the rollup groupBy, gap-fill, sessionize) reuse this one Exchange
    # instead of re-shuffling on conv_id — measured one full Exchange
    # (plus its Sort) removed from each of the six events-adapter bench
    # queries (guide §2.4: two operations keyed the same way share one
    # exchange). Groups and order are identical to partitioning by
    # user_id, so turn_idx is unchanged.
    base = events.select(
        F.format_string("conv_%08d", F.col("user_id").cast("int")).alias("conv_id"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    rn0 = F.row_number().over(w) - 1
    turn_idx = (rn0 + F.floor(rn0 / 3)) if with_gaps else rn0
    return base.select(
        "conv_id",
        turn_idx.cast("int").alias("turn_idx"),
        "role",
        "text",
        F.lit(None).cast("string").alias("tool"),
        "ts",
    )


# the same mapping, for DuckDB oracle SQL (kept adjacent so they evolve together)
EVENTS_AS_TRANSCRIPTS_SQL = """
SELECT printf('conv_%08d', CAST(user_id AS INT)) AS conv_id,
       CAST((rn0 + rn0 // 3) AS INT) AS turn_idx,
       event_type AS role,
       props AS text,
       CAST(NULL AS VARCHAR) AS tool,
       ts
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn0
  FROM events
)
"""

EVENTS_AS_TRANSCRIPTS_NOGAP_SQL = EVENTS_AS_TRANSCRIPTS_SQL.replace(
    "CAST((rn0 + rn0 // 3) AS INT)", "CAST(rn0 AS INT)"
)
