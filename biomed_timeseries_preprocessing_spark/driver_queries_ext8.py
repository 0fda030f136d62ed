"""Driver queries, part 9 (round 4, session 7).

``label_gapfill_intervals`` converts the last pytest-only interval
operator — ``fill_label_gaps`` (reference semantics:
``Extract_Transform_Labeler.py:49-70``: back-fill the head and tail of
each labelled span, fill inter-interval holes with the default label,
then merge adjacent same-label runs) — into a hash-exact dual-engine
oracle.

Fixture construction (deterministic, both engines mirror it): labelled
intervals tile a 10-minute grid over the events table
(one interval per occupied (conv, cell), label = lexicographic min
event_type — cells the conversation never touches become mid gaps);
the span back-fills 7 minutes of head and 13 minutes of tail so the
head/tail branches always fire; interval length == grid pitch so
adjacent same-label cells exercise the merge step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .driver_queries import ORACLE, QUERIES, q  # noqa: F401
from .operators.intervals import anti_join_excludes, fill_label_gaps
from .sources.events_adapter import (
    EVENTS_AS_TRANSCRIPTS_NOGAP_SQL,
    events_as_transcripts,
    load_events,
)

__all__ = ["QUERIES", "ORACLE"]

_GRID_US = 10 * 60 * 1_000_000  # 10-minute cells, interval length == pitch
_HEAD_US = 7 * 60 * 1_000_000
_TAIL_US = 13 * 60 * 1_000_000


@q(
    "label_gapfill_intervals",
    f"""
WITH iv AS (
  SELECT printf('conv_%08d', CAST(user_id AS INT)) AS conv_id,
         make_timestamp((epoch_us(ts) // {_GRID_US}) * {_GRID_US}) AS start_ts,
         make_timestamp((epoch_us(ts) // {_GRID_US}) * {_GRID_US} + {_GRID_US}) AS end_ts,
         min(event_type) AS label
  FROM events
  GROUP BY 1, 2, 3
),
sp AS (
  SELECT conv_id,
         make_timestamp(min(epoch_us(start_ts)) - {_HEAD_US}) AS span_start,
         make_timestamp(max(epoch_us(end_ts)) + {_TAIL_US}) AS span_end
  FROM iv GROUP BY conv_id
),
ivs AS (
  SELECT i.conv_id, i.start_ts, i.end_ts, s.span_start, s.span_end,
         ROW_NUMBER() OVER (PARTITION BY i.conv_id ORDER BY i.start_ts) AS rn,
         LAG(i.end_ts) OVER (PARTITION BY i.conv_id ORDER BY i.start_ts) AS prev_end
  FROM iv i JOIN sp s USING (conv_id)
),
filled AS (
  SELECT conv_id, start_ts, end_ts, label FROM iv
  UNION ALL
  SELECT conv_id, span_start AS start_ts, start_ts AS end_ts, 'Background' AS label
  FROM ivs WHERE rn = 1 AND start_ts > span_start
  UNION ALL
  SELECT conv_id, prev_end AS start_ts, start_ts AS end_ts, 'Background' AS label
  FROM ivs WHERE prev_end IS NOT NULL AND prev_end < start_ts
  UNION ALL
  SELECT conv_id, max_end AS start_ts, span_end AS end_ts, 'Background' AS label
  FROM (SELECT conv_id, max(end_ts) AS max_end, max(span_end) AS span_end
        FROM ivs GROUP BY conv_id)
  WHERE max_end < span_end
),
runs AS (
  SELECT conv_id, start_ts, end_ts, label,
         CASE WHEN LAG(label) OVER w = label AND LAG(end_ts) OVER w = start_ts
              THEN 0 ELSE 1 END AS is_new
  FROM filled
  WINDOW w AS (PARTITION BY conv_id ORDER BY start_ts)
),
g AS (
  SELECT conv_id, start_ts, end_ts, label,
         SUM(is_new) OVER (PARTITION BY conv_id ORDER BY start_ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM runs
)
SELECT conv_id, label, min(start_ts) AS start_ts, max(end_ts) AS end_ts
FROM g GROUP BY conv_id, label, island
""",
)
def label_gapfill_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    cell = (F.floor(F.unix_micros("ts") / _GRID_US).cast("long") * _GRID_US).alias(
        "grid_us"
    )
    iv = (
        ev.select(
            F.format_string("conv_%08d", F.col("user_id").cast("int")).alias(
                "conv_id"
            ),
            cell,
            "event_type",
        )
        .groupBy("conv_id", "grid_us")
        .agg(F.min("event_type").alias("label"))
        .select(
            "conv_id",
            F.timestamp_micros(F.col("grid_us")).alias("start_ts"),
            F.timestamp_micros(F.col("grid_us") + _GRID_US).alias("end_ts"),
            "label",
        )
    )
    spans = iv.groupBy("conv_id").agg(
        F.timestamp_micros(F.min(F.unix_micros("start_ts")) - _HEAD_US).alias(
            "span_start"
        ),
        F.timestamp_micros(F.max(F.unix_micros("end_ts")) + _TAIL_US).alias(
            "span_end"
        ),
    )
    return fill_label_gaps(iv, spans, default_label="Background")


# ------------------------------------------- P6: exclude anti range join

_ERR_US = 10 * 60 * 1_000_000


@q(
    "exclude_anti_join_turns",
    f"""
WITH t AS ({EVENTS_AS_TRANSCRIPTS_NOGAP_SQL}),
iv AS (
  SELECT DISTINCT printf('conv_%08d', CAST(user_id AS INT)) AS conv_id,
         ts AS start_ts,
         make_timestamp(epoch_us(ts) + {_ERR_US}) AS end_ts
  FROM events WHERE event_type = 'error'
)
SELECT t.conv_id, t.turn_idx, t.ts
FROM t
WHERE NOT EXISTS (
  SELECT 1 FROM iv
  WHERE iv.conv_id = t.conv_id AND iv.start_ts <= t.ts AND t.ts < iv.end_ts
)
""",
)
def exclude_anti_join_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    points = events_as_transcripts(ev, with_gaps=False).select(
        "conv_id", "turn_idx", "ts"
    )
    excludes = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.format_string("conv_%08d", F.col("user_id").cast("int")).alias(
                "conv_id"
            ),
            F.col("ts").alias("start_ts"),
            F.timestamp_micros(F.unix_micros("ts") + _ERR_US).alias("end_ts"),
        )
        .distinct()
    )
    return anti_join_excludes(points, excludes)
