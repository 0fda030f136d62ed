"""Scalar/series functions: smoothing, z-normalization, one-hot, as-of
join — the reference's per-channel array math re-expressed as window/
join algebra (SURVEY §2.8).

Reference parity:
- F2 band-pass filter (``edf_reader.py:448-473``) → ``with_moving_avg``:
  a centered FIR smoothing window (the sandbox has no scipy; a k-tap
  moving average is the filtfilt-analog that stays JVM-side and
  SQL-oracle-checkable; true IIR filtering would be an applyInPandas
  kernel like the STFT operator);
- F4 z-normalization with broadcast global stats
  (``edf_reader.py:180-183,333-336``) → ``with_znorm``: mean/std from
  exact integer sums (sum, sum of squares) joined broadcast-style;
- F11 one-hot (``Window_Labeler.py:19,34``) → ``with_one_hot``;
- J9 as-of lookup (``edf_reader.py:411-424,475-476``) → ``asof_join``:
  the classic union-and-ffill decomposition (no native as-of in Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_moving_avg(
    df: DataFrame, value_col: str, k: int = 2, out_col: str | None = None
) -> DataFrame:
    """Centered (2k+1)-tap moving average per conv over the stable turn
    order; edges use the available taps (partial window), mirroring
    filtfilt's no-phase-shift property in spirit."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-k, k)
    )
    return df.withColumn(out_col or f"{value_col}_smooth", F.avg(value_col).over(w))


def znorm_stats(df: DataFrame, value_col: str, scale: int = 100):
    """Global mean/std from exact integer sums: x is quantized by
    ``scale`` (e.g. cents), so sum and sum-of-squares are exact longs and
    the derived doubles are bit-identical on any partitioning — the same
    finalize-from-partials rule as the rollup tiers
    (File_Struct.py:380-396's E[x²]−E[x]² with Bessel correction)."""
    q = F.round(F.col(value_col) * scale).cast("long")
    return df.select(
        F.count(value_col).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
    )


def with_znorm(
    df: DataFrame, value_col: str, scale: int = 100, out_col: str | None = None
) -> DataFrame:
    """z = (x − mean) / std with the sample (Bessel) std, stats broadcast
    back via crossJoin of the 1-row stats frame."""
    stats = znorm_stats(df, value_col, scale)
    s = F.broadcast(stats)
    joined = df.crossJoin(s)
    mean = F.col("s1").cast("double") / F.col("n").cast("double") / scale
    ex2 = F.col("s2").cast("double") / F.col("n").cast("double") / (scale * scale)
    var = (ex2 - mean * mean) * (
        F.col("n").cast("double") / (F.col("n").cast("double") - 1.0)
    )
    std = F.sqrt(var)
    return joined.withColumn(
        out_col or f"{value_col}_z", (F.col(value_col) - mean) / std
    ).drop("n", "s1", "s2")


def with_one_hot(df: DataFrame, col: str, categories: list[str]) -> DataFrame:
    """One-hot columns for a known category list (np.identity[label]
    analog); unknown values map to all-zeros, surfacing like the
    reference's ``no_label`` path instead of crashing."""
    out = df
    for c in categories:
        out = out.withColumn(f"{col}_{c}", (F.col(col) == c).cast("int"))
    return out


def asof_join(
    facts: DataFrame,
    dims: DataFrame,
    key: str,
    fact_ts: str = "ts",
    dim_ts: str = "dim_ts",
    dim_cols: list[str] | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """As-of join: for each fact row, the latest dim row with
    dim_ts <= fact ts (per key). Union-and-ffill decomposition:
    tag both sides, sort by (key, event time, side), forward-fill the dim
    payload, keep fact rows — one shuffle, no range explosion.
    ``tolerance_us`` drops matches older than the tolerance."""
    dim_cols = dim_cols or [c for c in dims.columns if c not in (key, dim_ts)]
    # Deterministic tie-break: several dim rows may share (key, dim_ts);
    # last(ignoreNulls) over a window ordered only by (_t, _side) would
    # then pick whichever physically sorts last (partition-order
    # dependent). Pre-reduce dims to exactly one row per (key, dim_ts) —
    # the max struct of the payload — so the fill is order-independent.
    dims = (
        dims.groupBy(key, dim_ts)
        .agg(F.max(F.struct(*[F.col(c) for c in dim_cols])).alias("_payload"))
        .select(key, dim_ts, *[F.col(f"_payload.{c}").alias(c) for c in dim_cols])
    )
    f = facts.withColumn("_t", F.unix_micros(F.col(fact_ts))).withColumn(
        "_side", F.lit(1)
    )
    for c in dim_cols:
        f = f.withColumn(f"_d_{c}", F.lit(None).cast(dims.schema[c].dataType))
    f = f.withColumn("_dim_t", F.lit(None).cast("long"))
    d = dims.withColumn("_t", F.unix_micros(F.col(dim_ts))).withColumn("_side", F.lit(0))
    d = d.select(
        F.col(key),
        "_t",
        "_side",
        F.col("_t").alias("_dim_t"),
        *[F.col(c).alias(f"_d_{c}") for c in dim_cols],
    )
    fact_payload = [c for c in facts.columns]
    f = f.select(key, "_t", "_side", "_dim_t", *[f"_d_{c}" for c in dim_cols], *[
        c for c in fact_payload if c != key
    ])
    d_full = d
    for c in fact_payload:
        if c != key:
            d_full = d_full.withColumn(c, F.lit(None).cast(facts.schema[c].dataType))
    u = f.unionByName(d_full)
    # dims sort before facts at equal timestamps (side 0 < 1) → "<=" semantics
    w = Window.partitionBy(key).orderBy("_t", "_side").rowsBetween(
        Window.unboundedPreceding, 0
    )
    filled = u
    for c in dim_cols:
        filled = filled.withColumn(f"_d_{c}", F.last(f"_d_{c}", ignorenulls=True).over(w))
    filled = filled.withColumn("_dim_t_f", F.last("_dim_t", ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1)
    if tolerance_us is not None:
        in_tol = F.col("_dim_t_f").isNotNull() & (
            (F.col("_t") - F.col("_dim_t_f")) <= tolerance_us
        )
        for c in dim_cols:
            out = out.withColumn(f"_d_{c}", F.when(in_tol, F.col(f"_d_{c}")))
    renames = out.select(
        *fact_payload, *[F.col(f"_d_{c}").alias(c) for c in dim_cols]
    )
    return renames
