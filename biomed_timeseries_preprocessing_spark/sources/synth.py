"""Deterministic synthetic transcript generator (FIXTURES.md F1).

The reference pipeline's input is a directory tree of EDF recordings
scanned per patient (``File_Struct.py:49-65,67-152``); our input is a
table of multi-turn conversation transcripts with the exact
``BASELINE.json.input_hint`` schema::

    conv_id string, turn_idx int, role string, text string,
    tool string, ts timestamp

Everything is generated JVM-side from ``xxhash64`` so the table is
bit-identical regardless of partitioning, cluster size, or run count —
no RNG state, no driver-side loops, scales to any SF by changing only
row counts (never plan shape).

Design choices mirrored from the reference data model:
- conversation lengths are zipf/Pareto-skewed (hot conversations) to
  exercise skew handling, like the reference's wildly-unequal per-patient
  file counts that stall its joblib pool (``File_Struct.py:576-579``);
- each turn is independently dropped with p≈5% (never turn 0) to create
  the gaps our gap-fill stage targets — the ``exclude_map`` analog
  (``edf_reader.py:50-63``);
- inter-turn deltas are lognormal-ish (Irwin-Hall normal approximation,
  exact integer ms) so delta-of-delta timestamp encoding has realistic,
  non-uniform input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

EPOCH_START = "2026-01-01 00:00:00"
VOCAB = [
    "the", "agent", "tool", "call", "plan", "step", "run", "test", "fix",
    "code", "data", "query", "spark", "table", "join", "scan", "write",
    "read", "check", "result", "error", "retry", "model", "token", "turn",
    "user", "reply", "think", "search", "browse", "parse", "merge", "sort",
]


def _u01(*cols, bits: int = 30):
    """Deterministic uniform [0,1) from xxhash64 of the given columns."""
    m = 1 << bits
    return (F.pmod(F.xxhash64(*cols), F.lit(m)) + F.lit(0.5)) / F.lit(float(m))


def synth_transcripts(
    spark: SparkSession,
    n_convs: int,
    seed: int = 42,
    gap_pct: int = 5,
    alpha: float = 1.3,
    min_len: int = 5,
    cap_len: int = 5000,
) -> DataFrame:
    """Build the deterministic transcript table.

    Returns a DataFrame with the input_hint schema. Scaling knobs change
    row counts only; the plan is identical at every SF.
    """
    s = F.lit(seed)
    convs = (
        spark.range(n_convs)
        .select(F.format_string("conv_%08d", F.col("id").cast("int")).alias("conv_id"))
        .withColumn("u_len", _u01(F.col("conv_id"), s, F.lit("len")))
        .withColumn(
            "conv_len",
            F.least(
                F.lit(cap_len),
                F.greatest(
                    F.lit(2),
                    F.floor(F.lit(float(min_len)) * F.pow(F.col("u_len"), F.lit(-1.0 / (alpha - 1.0)))),
                ),
            ).cast("int"),
        )
        .withColumn(
            "conv_start_ms",
            F.unix_timestamp(F.lit(EPOCH_START).cast("timestamp")) * 1000
            + F.pmod(F.xxhash64(F.col("conv_id"), s, F.lit("start")), F.lit(30 * 86400 * 1000)),
        )
    )

    turns = convs.select(
        "conv_id",
        "conv_start_ms",
        F.explode(F.sequence(F.lit(0), F.col("conv_len") - 1)).alias("turn_idx"),
    )

    # Irwin-Hall(12) ≈ N(0,1): z = sum of 12 uniforms - 6; delta = exp(mu + sigma z)
    z = sum(
        _u01(F.col("conv_id"), F.col("turn_idx"), s, F.lit(f"z{k}"), bits=20) for k in range(12)
    ) - F.lit(6.0)
    delta_ms = F.when(F.col("turn_idx") == 0, F.lit(0)).otherwise(
        F.greatest(F.lit(1), F.round(F.exp(F.lit(1.2) + z) * 1000).cast("long"))
    )
    turns = turns.withColumn("delta_ms", delta_ms)

    # cumulative inter-turn deltas accumulate over ALL turns (including the
    # ones dropped below) so a missing turn leaves a real temporal hole.
    w = Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    turns = turns.withColumn("cum_ms", F.sum("delta_ms").over(w)).withColumn(
        "ts", F.timestamp_millis(F.col("conv_start_ms") + F.col("cum_ms"))
    )

    keep = (F.col("turn_idx") == 0) | (
        F.pmod(F.xxhash64("conv_id", "turn_idx", s, F.lit("gap")), F.lit(100)) >= gap_pct
    )
    turns = turns.filter(keep)

    r = F.pmod(F.xxhash64("conv_id", "turn_idx", s, F.lit("role")), F.lit(100))
    role = (
        F.when(r < 10, F.lit("tool"))
        .when(F.pmod(F.col("turn_idx"), F.lit(2)) == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(F.lit("search"), F.lit("code"), F.lit("browse")),
            (F.pmod(F.xxhash64("conv_id", "turn_idx", s, F.lit("tool")), F.lit(3)) + 1).cast("int"),
        ),
    ).otherwise(F.lit(None).cast("string"))

    vocab = F.array(*[F.lit(wd) for wd in VOCAB])
    n_words = (F.pmod(F.xxhash64("conv_id", "turn_idx", s, F.lit("nw")), F.lit(60)) + 1).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda k: F.element_at(
            vocab,
            (F.pmod(F.xxhash64(F.col("conv_id"), F.col("turn_idx"), k, s), F.lit(len(VOCAB))) + 1).cast(
                "int"
            ),
        ),
    )
    text = F.concat(
        F.col("conv_id"), F.lit(":"), F.col("turn_idx").cast("string"), F.lit(":"), F.array_join(words, " ")
    )

    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        "ts",
    )


def synth_flatline_transcripts(spark: SparkSession, n_convs: int = 8, seed: int = 7) -> DataFrame:
    """FIXTURES F6: conversations where some runs of ≥16 consecutive turns
    carry empty text (token_count=0) — exercises the zero-run exclusion
    operator (reference: ``Additional_Operator.py:61-73``)."""
    df = synth_transcripts(spark, n_convs, seed=seed, gap_pct=0, min_len=64, cap_len=256)
    in_run = (
        F.pmod(F.xxhash64("conv_id", F.lit(seed), F.lit("run")), F.lit(4)) == 0
    ) & F.col("turn_idx").between(20, 39)
    return df.withColumn("text", F.when(in_run, F.lit("")).otherwise(F.col("text")))
