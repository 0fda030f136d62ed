"""Cascaded continuous aggregates: 1m → 5m → 1h → 1d rollup tiers.

This is the engine's core. Reference parity: the two-phase partial/final
statistics algebra of ``edf_reader.py:222-237`` (per-file partials:
count, sum, sum-of-squares) merged by ``File_Struct.py:361-399``
(count-weighted combine, finalize mean/std at the end). Our tiers use the
identical algebra — every tier row carries the *mergeable* state
(cnt, n, sum, min, max, last) and derived means are computed only at
finalize from exact integer sums, so:

1. tier k+1 computed from tier k equals tier k+1 computed from raw
   (metamorphic property, tested);
2. results are bit-for-bit identical across partitionings/cluster sizes
   (no float accumulation anywhere in the merge path — SURVEY §7.4.1);
3. "last per bucket" is defined under the stable order
   ``max_by(·, struct(ts, turn_idx))`` so ties cannot break
   nondeterministically (SURVEY §7.4.4).

Bucket assignment is pure integer math on microseconds — the analog of
the reference's sample-index window cursor ``start + win <= len``
(``edf_reader.py:174-213``) without its float-rescale truncation bugs
(``edf_reader.py:139-150``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TIER_SECONDS: dict[str, int] = {"1m": 60, "5m": 300, "1h": 3600, "1d": 86400}
TIER_ORDER = ["1m", "5m", "1h", "1d"]

#: mergeable state carried by every tier row (FIXTURES.md F4)
STATE_COLS = [
    "cnt",
    "n_latency",
    "sum_latency",
    "min_latency",
    "max_latency",
    "sum_tokens",
    "min_tokens",
    "max_tokens",
    "last_ts",
    "last_turn_idx",
    "last_latency",
    "last_token_count",
]


def bucket_start(ts_col, seconds: int):
    """floor(ts, seconds) as timestamp via exact integer µs arithmetic."""
    us = seconds * 1_000_000
    return F.timestamp_micros(F.floor(F.unix_micros(ts_col) / us).cast("long") * us)


def _finalize(df: DataFrame) -> DataFrame:
    """Derive means from exact integer sums — the only float math in the
    rollup path, applied identically at every tier (File_Struct.py:388-396
    analog: finalize from partials, never accumulate floats)."""
    return df.withColumn(
        "mean_latency",
        F.when(
            F.col("n_latency") > 0,
            F.col("sum_latency").cast("double") / F.col("n_latency").cast("double"),
        ),
    ).withColumn(
        "mean_tokens", F.col("sum_tokens").cast("double") / F.col("cnt").cast("double")
    )


def rollup_from_turns(derived: DataFrame, tier: str = "1m") -> DataFrame:
    """Tier-1m (or any tier) directly from derived turns.

    Input: output of ``derive.with_derived`` —
    (conv_id, turn_idx, role, text, tool, ts, latency_ms, token_count).
    """
    secs = TIER_SECONDS[tier]
    # ONE max over a struct whose leading fields are the (ts, turn_idx)
    # ordering — (ts, turn_idx) is unique per conversation, so
    # lexicographic struct max selects exactly the row the four previous
    # max_by(col, struct(ts, turn_idx)) aggregates selected, with one
    # aggregation buffer and one comparison per row instead of four
    # (the payload fields after the unique prefix are never compared)
    last = F.struct(
        F.col("ts"), F.col("turn_idx"), F.col("latency_ms"), F.col("token_count")
    )
    agg = (
        derived.groupBy("conv_id", bucket_start(F.col("ts"), secs).alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.count("latency_ms").alias("n_latency"),
            F.sum("latency_ms").alias("sum_latency"),
            F.min("latency_ms").alias("min_latency"),
            F.max("latency_ms").alias("max_latency"),
            F.sum("token_count").cast("long").alias("sum_tokens"),
            F.min("token_count").alias("min_tokens"),
            F.max("token_count").alias("max_tokens"),
            F.max(last).alias("_last"),
        )
        .select(
            "conv_id", "bucket_start", "cnt", "n_latency", "sum_latency",
            "min_latency", "max_latency", "sum_tokens", "min_tokens", "max_tokens",
            F.col("_last.ts").alias("last_ts"),
            F.col("_last.turn_idx").alias("last_turn_idx"),
            F.col("_last.latency_ms").alias("last_latency"),
            F.col("_last.token_count").alias("last_token_count"),
        )
        .withColumn("tier", F.lit(tier))
    )
    return _finalize(agg)


def rollup_merge(tier_df: DataFrame, to_tier: str) -> DataFrame:
    """Tier k+1 from tier k by pure algebraic merge of mergeable state —
    never re-reads raw turns. The File_Struct.py:361-399 count-weighted
    combine, expressed as a Spark partial/final hash aggregate."""
    secs = TIER_SECONDS[to_tier]
    # same single-struct-max trick as rollup_from_turns: the
    # (last_ts, last_turn_idx) prefix is unique per conversation, so one
    # lexicographic max replaces four max_by buffers
    last = F.struct(
        F.col("last_ts"), F.col("last_turn_idx"),
        F.col("last_latency"), F.col("last_token_count"),
    )
    agg = (
        tier_df.groupBy(
            "conv_id", bucket_start(F.col("bucket_start"), secs).alias("bucket_start")
        )
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("n_latency").alias("n_latency"),
            F.sum("sum_latency").alias("sum_latency"),
            F.min("min_latency").alias("min_latency"),
            F.max("max_latency").alias("max_latency"),
            F.sum("sum_tokens").alias("sum_tokens"),
            F.min("min_tokens").alias("min_tokens"),
            F.max("max_tokens").alias("max_tokens"),
            F.max(last).alias("_last"),
        )
        .select(
            "conv_id", "bucket_start", "cnt", "n_latency", "sum_latency",
            "min_latency", "max_latency", "sum_tokens", "min_tokens", "max_tokens",
            F.col("_last.last_ts").alias("last_ts"),
            F.col("_last.last_turn_idx").alias("last_turn_idx"),
            F.col("_last.last_latency").alias("last_latency"),
            F.col("_last.last_token_count").alias("last_token_count"),
        )
        .withColumn("tier", F.lit(to_tier))
    )
    return _finalize(agg)


def rollup_cascade(derived: DataFrame) -> dict[str, DataFrame]:
    """All four tiers; each computed from the tier below (1m from raw)."""
    tiers: dict[str, DataFrame] = {"1m": rollup_from_turns(derived, "1m")}
    for prev, nxt in zip(TIER_ORDER, TIER_ORDER[1:]):
        tiers[nxt] = rollup_merge(tiers[prev], nxt)
    return tiers
