"""Derive per-turn numeric series from raw transcripts.

Reference parity: the reference derives per-channel numeric series by
whole-array ops — channel deltas / re-referencing
(``Additional_Operator.py:80-88,126-139``) and per-signal stats
(``edf_reader.py:222-237``). Our per-turn series are:

- ``latency_ms``  = ts − lag(ts) over (conv_id ORDER BY turn_idx) — the
  delta-encoding basis (NULL for the first turn of a conversation);
- ``token_count`` = whitespace token count of ``text`` (vectorized,
  JVM-side — no Python in the hot path per input_hint).

All arithmetic is exact integer math (microseconds → milliseconds on an
ms-quantized source) so downstream sums are bit-for-bit reproducible
under any partitioning (SURVEY §7.4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def token_count_col(text=None):
    """Whitespace token count; empty/NULL text → 0. JVM-side regex split —
    deliberately not a Python UDF."""
    trimmed = F.trim(text if text is not None else F.col("text"))
    return (
        F.when(trimmed.isNull() | (trimmed == ""), F.lit(0))
        .otherwise(F.size(F.split(trimmed, r"\s+")))
        .cast("int")
    )


def with_derived(df: DataFrame) -> DataFrame:
    """Add latency_ms (long, NULL on conv head) and token_count (int)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lat_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return df.withColumn(
        "latency_ms", F.floor(lat_us / 1000).cast("long")
    ).withColumn("token_count", token_count_col())
