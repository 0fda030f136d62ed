"""Driver-contract queries, part 3: as-of join, smoothing,
z-normalization, softlabel policy, histograms, one-hot, STFT view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .driver_queries import ORACLE, QUERIES, q
from .functions.scalars import asof_join, with_moving_avg, with_one_hot, with_znorm
from .functions.spectral import per_bin_stats, stft_series
from .operators.derive import with_derived
from .operators.intervals import label_windows_soft, overlap_join_windows
from .operators.rollup import rollup_from_turns
from .sources.events_adapter import (
    EVENTS_AS_TRANSCRIPTS_NOGAP_SQL,
    events_as_transcripts,
    load_events,
)

__all__ = ["QUERIES", "ORACLE"]


# ------------------------------------------------------ J9: as-of join

@q(
    "asof_join_dim",
    """
WITH dims AS (
  SELECT user_id, ts AS dim_ts, value AS dim_value
  FROM events WHERE event_id % 17 = 0
)
SELECT e.event_id, e.user_id, e.ts, d.dim_value
FROM events e
ASOF LEFT JOIN dims d ON e.user_id = d.user_id AND e.ts >= d.dim_ts
""",
)
def asof_join_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest dimension row at-or-before each fact (the lights-off
    lookup, edf_reader.py:475-476) — union-and-ffill, one shuffle."""
    ev = load_events(spark, sf_dir)
    dims = ev.filter(F.col("event_id") % 17 == 0).select(
        "user_id", F.col("ts").alias("dim_ts"), F.col("value").alias("dim_value")
    )
    facts = ev.select("event_id", "user_id", "ts")
    return asof_join(facts, dims, key="user_id")


# ----------------------------------------------------- F2: smoothing

@q(
    "moving_avg_value",
    """
SELECT event_id, user_id,
       avg(CAST(round(value * 100) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) / 100.0 AS value_smooth
FROM events
""",
)
def moving_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    # exact long sums inside the frame → deterministic double at finalize
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 2)
    smoothed = ev.withColumn(
        "value_smooth",
        F.avg(F.round(F.col("value") * 100).cast("long")).over(w) / 100.0,
    )
    return smoothed.select("event_id", "user_id", "value_smooth")


# -------------------------------------------------- F4: z-normalization

@q(
    "znorm_value",
    """
WITH s AS (
  SELECT CAST(count(value) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s1,
         CAST(sum(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s2
  FROM events
)
SELECT e.event_id,
       (e.value - (CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE) / 100))
         / sqrt(((CAST(s.s2 AS DOUBLE) / CAST(s.n AS DOUBLE) / 10000)
                 - (CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE) / 100)
                   * (CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE) / 100))
                * (CAST(s.n AS DOUBLE) / (CAST(s.n AS DOUBLE) - 1.0))) AS value_z
FROM events e CROSS JOIN s
""",
)
def znorm_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return with_znorm(ev, "value", scale=100).select("event_id", "value_z")


# ------------------------------------------- A6 softlabels (SQL oracle)

@q(
    "label_windows_soft",
    f"""
WITH t AS ({EVENTS_AS_TRANSCRIPTS_NOGAP_SQL}),
iv AS (
  SELECT DISTINCT printf('conv_%08d', CAST(user_id AS INT)) AS conv_id,
         ts AS start_ts,
         make_timestamp(epoch_us(ts) + {5 * 60 * 1_000_000}) AS end_ts,
         event_type AS label
  FROM events
),
win AS (
  SELECT DISTINCT conv_id,
         make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS win_start,
         make_timestamp((epoch_us(ts) // 3600000000) * 3600000000 + 3600000000) AS win_end
  FROM t
),
ov AS (
  SELECT w.conv_id, w.win_start, i.label,
         least(epoch_us(i.end_ts), epoch_us(w.win_end))
           - greatest(epoch_us(i.start_ts), epoch_us(w.win_start)) AS overlap_us
  FROM win w JOIN iv i
    ON w.conv_id = i.conv_id AND w.win_start < i.end_ts AND i.start_ts < w.win_end
),
per AS (
  SELECT conv_id, win_start, label, CAST(sum(overlap_us) AS BIGINT) AS dur_us
  FROM ov GROUP BY conv_id, win_start, label
)
SELECT conv_id, win_start, label, dur_us,
       CAST(dur_us AS DOUBLE)
         / CAST(sum(dur_us) OVER (PARTITION BY conv_id, win_start) AS DOUBLE) AS weight
FROM per
""",
)
def label_windows_soft_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = events_as_transcripts(load_events(spark, sf_dir), with_gaps=False)
    hour_us = 3_600_000_000
    win = (
        t.select(
            "conv_id",
            F.timestamp_micros(
                F.floor(F.unix_micros("ts") / hour_us).cast("long") * hour_us
            ).alias("win_start"),
        )
        .distinct()
        .withColumn("win_end", F.timestamp_micros(F.unix_micros("win_start") + hour_us))
    )
    ev = load_events(spark, sf_dir)
    iv = ev.select(
        F.format_string("conv_%08d", F.col("user_id").cast("int")).alias("conv_id"),
        F.col("ts").alias("start_ts"),
        F.timestamp_micros(F.unix_micros("ts") + 5 * 60 * 1_000_000).alias("end_ts"),
        F.col("event_type").alias("label"),
    ).distinct()
    ov = overlap_join_windows(win, iv, coarse_seconds=3600)
    return label_windows_soft(ov, ["conv_id", "win_start"]).select(
        "conv_id", "win_start", "label", F.col("dur_us").cast("long").alias("dur_us"), "weight"
    )


# ---------------------------------------------- A3/A7: histograms

@q(
    "role_histogram",
    f"""
WITH t AS ({EVENTS_AS_TRANSCRIPTS_NOGAP_SQL})
SELECT role,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM t GROUP BY role
""",
)
def role_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = events_as_transcripts(load_events(spark, sf_dir), with_gaps=False)
    return t.groupBy("role").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("conv_id").alias("n_convs"),
    )


# --------------------------------------------------- F11: one-hot

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@q(
    "one_hot_event_types",
    """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
FROM events GROUP BY user_id
""",
)
def one_hot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    oh = with_one_hot(ev, "event_type", EVENT_TYPES)
    return oh.groupBy("user_id").agg(
        *[F.sum(f"event_type_{c}").cast("long").alias(f"n_{c}") for c in EVENT_TYPES]
    )


# ------------------------------------------------ W4: STFT (rows-only)

def _activity_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse form of the per-minute activity series: only the PRESENT
    minutes (conv_id, _idx, cnt) — idx 0 at the first present minute —
    one tier pass + one window. The dense series is this plus zeros."""
    t = events_as_transcripts(load_events(spark, sf_dir))
    tier = rollup_from_turns(with_derived(t), "1m").select(
        "conv_id", "bucket_start", "cnt"
    )
    w_all = Window.partitionBy("conv_id")
    us = F.unix_micros("bucket_start")
    return tier.select(
        "conv_id",
        "cnt",
        ((us - F.min(us).over(w_all)) / 60_000_000).cast("long").alias("_idx"),
    )


def activity_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular per-minute activity series per conv (0-filled gaps) — the
    shared input of the STFT queries below and the Parseval check in
    driver_queries_ext4.

    One-scan dense generation (r6): each present minute emits itself
    plus zero rows up to the next present minute (the gapfill
    lead-generate pattern). The r5 version exploded a full per-conv
    minute GRID and left-joined the tier against it — 63M grid rows
    sorted through a SortMergeJoin at sf0.1 (the events table spans
    ~300 days), with the tier subtree evaluated once per join side.
    Now the tier runs once, the only shuffle is the tier's own window
    (~96k rows at sf0.1), and the dense rows are generated map-side
    already partitioned by conv_id — which the downstream
    applyInPandas kernels reuse (guide §2.4). Output rows identical:
    same (conv_id, idx, value) set, zero-filled gaps, idx 0 at the
    first present minute, last idx = last present minute."""
    sp = _activity_sparse(spark, sf_dir).withColumn(
        "_next", F.lead("_idx").over(Window.partitionBy("conv_id").orderBy("_idx"))
    )
    idxs = F.when(
        F.col("_next") > F.col("_idx") + F.lit(1),
        F.sequence(F.col("_idx"), F.col("_next") - F.lit(1)),
    ).otherwise(F.array(F.col("_idx")))
    ex = sp.select("conv_id", "_idx", "cnt", F.explode(idxs).alias("idx"))
    return ex.select(
        "conv_id",
        F.col("idx").cast("int").alias("idx"),
        F.when(F.col("idx") == F.col("_idx"), F.col("cnt"))
        .otherwise(F.lit(0))
        .cast("double")
        .alias("value"),
    )


# rows-only by nature: per-bin dB stats require an FFT the SQL oracle
# lacks; the spectral math itself is oracle-checked by stft_parseval
# (driver_queries_ext4) and pytest vs numpy (test_scalars_spectral).
@q("stft_1m_activity")
def stft_1m_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral view of per-minute activity: regular minute grid per conv
    (0-filled gaps) → hamming/rfft frames → per-bin power; the
    create_sfft_windows analog over transcript activity."""
    from .functions.spectral import stft_per_bin_stats

    # sparse feed: present minutes + per-conv dense length; the kernel
    # zero-fills, so frames and stats are identical to the dense series
    # while only ~0.2% of the grid crosses the Arrow boundary
    sp = _activity_sparse(spark, sf_dir).withColumn(
        "length", F.max("_idx").over(Window.partitionBy("conv_id")) + F.lit(1)
    )
    series = sp.select(
        "conv_id",
        F.col("_idx").cast("int").alias("idx"),
        F.col("cnt").cast("double").alias("value"),
        "length",
    )
    return stft_per_bin_stats(series, frame=32, hop=16, length_col="length")
