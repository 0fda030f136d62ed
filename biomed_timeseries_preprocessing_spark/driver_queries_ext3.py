"""Driver-contract queries, part 4: the salted rollup against the same
oracle as the plain one (proves the skew path bit-for-bit on driver
data), and per-user Pearson correlation from exact integer sums (A10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .driver_queries import ORACLE, QUERIES, _rollup_oracle_sql, _rollup_output, q
from .operators.derive import with_derived
from .plans.skew import rollup_from_turns_salted
from .sources.events_adapter import events_as_transcripts, load_events

__all__ = ["QUERIES", "ORACLE"]


@q("rollup_1m_salted", _rollup_oracle_sql(60, "1m"))
def rollup_1m_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical oracle to rollup_1m — the salted two-phase path must be
    bit-for-bit equal (north_rule skew handling, checked by the driver)."""
    t = events_as_transcripts(load_events(spark, sf_dir))
    return _rollup_output(rollup_from_turns_salted(with_derived(t), "1m", n_salts=8))


@q(
    "corr_value_latency",
    """
WITH d AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS xc,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000 AS yl
  FROM events
),
s AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(xc) AS BIGINT) AS sx,
         CAST(sum(yl) AS BIGINT) AS sy,
         CAST(sum(xc * xc) AS BIGINT) AS sxx,
         CAST(sum(yl * yl) AS BIGINT) AS syy,
         CAST(sum(xc * yl) AS BIGINT) AS sxy
  FROM d WHERE yl IS NOT NULL GROUP BY user_id
)
SELECT user_id, n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         AS corr_xy
FROM s
""",
)
def corr_value_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson r per user between event value and inter-event latency —
    the keep_code.py:179 corrcoef analog, as exact integer partial sums
    finalized in one double expression (same algebra as the rollup
    tiers, so it's bit-stable under any partitioning)."""
    from pyspark.sql.window import Window

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("xc"),
        F.floor(
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) / 1000
        ).cast("long").alias("yl"),
    ).filter(F.col("yl").isNotNull())
    s = d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xc").alias("sx"),
        F.sum("yl").alias("sy"),
        F.sum(F.col("xc") * F.col("xc")).alias("sxx"),
        F.sum(F.col("yl") * F.col("yl")).alias("syy"),
        F.sum(F.col("xc") * F.col("yl")).alias("sxy"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    corr = (dbl("n") * dbl("sxy") - dbl("sx") * dbl("sy")) / F.sqrt(
        (dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx"))
        * (dbl("n") * dbl("syy") - dbl("sy") * dbl("sy"))
    )
    return s.select("user_id", "n", corr.alias("corr_xy"))


@q(
    "latency_percentiles",
    """
WITH d AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000 AS yl
  FROM events
)
SELECT user_id,
       quantile_cont(yl, 0.5) AS p50,
       quantile_cont(yl, 0.95) AS p95,
       CAST(quantile_disc(yl, 0.5) AS BIGINT) AS p50_disc
FROM d WHERE yl IS NOT NULL GROUP BY user_id
""",
)
def latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per user (A9/A10 family): Spark's exact
    `percentile` (linear interpolation, same definition as DuckDB
    quantile_cont) — NOT approx_percentile, so the oracle check is
    bit-for-bit."""
    from pyspark.sql.window import Window

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "user_id",
        F.floor(
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) / 1000
        ).cast("long").alias("yl"),
    ).filter(F.col("yl").isNotNull())
    return d.groupBy("user_id").agg(
        F.percentile("yl", 0.5).alias("p50"),
        F.percentile("yl", 0.95).alias("p95"),
        F.expr("percentile_approx(yl, 0.5, 2147483647)").cast("long").alias("p50_disc"),
    )
