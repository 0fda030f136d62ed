"""Driver-contract queries: each entry pairs a Spark DataFrame program
(exercising real engine operators) with ANSI-SQL DuckDB oracle text.

Conventions that make the driver's value-hash comparison exact:
- every computed column is aliased identically on both sides;
- integer aggregates are BIGINT on both sides (DuckDB sum() yields
  HUGEINT — always CAST);
- double columns are produced by the *same* arithmetic on the same exact
  integers (sum/count division at finalize), never by float accumulation
  in a partition-dependent order;
- money sums go through exact integer cents: CAST(ROUND(x*100) AS BIGINT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators.derive import with_derived
from .operators.gapfill import gapfill
from .operators.rollup import TIER_ORDER, rollup_from_turns, rollup_merge
from .sources.events_adapter import (
    EVENTS_AS_TRANSCRIPTS_NOGAP_SQL,
    EVENTS_AS_TRANSCRIPTS_SQL,
    events_as_transcripts,
    load_events,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# --------------------------------------------------------------- rollups

_ROLLUP_SELECT = """
  conv_id,
  tier,
  bucket_start,
  cnt, n_latency, sum_latency, min_latency, max_latency,
  sum_tokens, min_tokens, max_tokens,
  last_ts, last_turn_idx, last_latency, last_token_count,
  mean_latency, mean_tokens
"""


def _rollup_output(df: DataFrame) -> DataFrame:
    """Normalize integer widths to BIGINT for oracle comparison."""
    casts = {
        "cnt": "long",
        "n_latency": "long",
        "sum_latency": "long",
        "min_latency": "long",
        "max_latency": "long",
        "sum_tokens": "long",
        "min_tokens": "long",
        "max_tokens": "long",
        "last_turn_idx": "long",
        "last_latency": "long",
        "last_token_count": "long",
    }
    cols = [
        F.col(c).cast(casts[c]).alias(c) if c in casts else F.col(c)
        for c in [s.strip() for s in _ROLLUP_SELECT.replace("\n", " ").split(",")]
    ]
    return df.select(*cols)


def _rollup_oracle_sql(tier_secs: int, tier_name: str) -> str:
    us = tier_secs * 1_000_000
    return f"""
WITH t AS ({EVENTS_AS_TRANSCRIPTS_SQL}),
d AS (
  SELECT conv_id, turn_idx, ts,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx)) // 1000
           AS latency_ms,
         CASE WHEN text IS NULL OR trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS token_count,
         (epoch_us(ts) // {us}) * {us} AS bucket_us
  FROM t
),
d2 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, bucket_us ORDER BY ts DESC, turn_idx DESC) AS rdesc
  FROM d
),
r AS (
  SELECT conv_id, bucket_us,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(count(latency_ms) AS BIGINT) AS n_latency,
         CAST(sum(latency_ms) AS BIGINT) AS sum_latency,
         CAST(min(latency_ms) AS BIGINT) AS min_latency,
         CAST(max(latency_ms) AS BIGINT) AS max_latency,
         CAST(sum(token_count) AS BIGINT) AS sum_tokens,
         CAST(min(token_count) AS BIGINT) AS min_tokens,
         CAST(max(token_count) AS BIGINT) AS max_tokens,
         max(CASE WHEN rdesc = 1 THEN ts END) AS last_ts,
         CAST(max(CASE WHEN rdesc = 1 THEN turn_idx END) AS BIGINT) AS last_turn_idx,
         CAST(max(CASE WHEN rdesc = 1 THEN latency_ms END) AS BIGINT) AS last_latency,
         CAST(max(CASE WHEN rdesc = 1 THEN token_count END) AS BIGINT) AS last_token_count
  FROM d2
  GROUP BY conv_id, bucket_us
)
SELECT conv_id, '{tier_name}' AS tier, make_timestamp(bucket_us) AS bucket_start,
       cnt, n_latency, sum_latency, min_latency, max_latency,
       sum_tokens, min_tokens, max_tokens,
       last_ts, last_turn_idx, last_latency, last_token_count,
       CASE WHEN n_latency > 0
            THEN CAST(sum_latency AS DOUBLE) / CAST(n_latency AS DOUBLE) END AS mean_latency,
       CAST(sum_tokens AS DOUBLE) / CAST(cnt AS DOUBLE) AS mean_tokens
FROM r
"""


def _cascade_to(spark: SparkSession, sf_dir: str, tier: str) -> DataFrame:
    t = events_as_transcripts(load_events(spark, sf_dir))
    d = with_derived(t)
    df = rollup_from_turns(d, "1m")
    for prev, nxt in zip(TIER_ORDER, TIER_ORDER[1:]):
        if TIER_ORDER.index(nxt) > TIER_ORDER.index(tier):
            break
        df = rollup_merge(df, nxt)
    return _rollup_output(df)


@q("rollup_1m", _rollup_oracle_sql(60, "1m"))
def rollup_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = events_as_transcripts(load_events(spark, sf_dir))
    return _rollup_output(rollup_from_turns(with_derived(t), "1m"))


# cascaded tiers: Spark computes tier k+1 FROM TIER k (algebraic merge);
# the oracle recomputes from raw — the driver check doubles as the
# metamorphic rollup(merge(tier)) == rollup(raw) test at every tier.
@q("rollup_5m_cascade", _rollup_oracle_sql(300, "5m"))
def rollup_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cascade_to(spark, sf_dir, "5m")


@q("rollup_1h_cascade", _rollup_oracle_sql(3600, "1h"))
def rollup_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cascade_to(spark, sf_dir, "1h")


@q("rollup_1d_cascade", _rollup_oracle_sql(86400, "1d"))
def rollup_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cascade_to(spark, sf_dir, "1d")


# --------------------------------------------------------------- derive

@q(
    "derive_latency",
    f"""
WITH t AS ({EVENTS_AS_TRANSCRIPTS_SQL})
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, ts,
       (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx)) // 1000
         AS latency_ms,
       CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS token_count
FROM t
""",
)
def derive_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = events_as_transcripts(load_events(spark, sf_dir))
    return with_derived(t).select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        "ts",
        "latency_ms",
        F.col("token_count").cast("long").alias("token_count"),
    )


# --------------------------------------------------------------- gapfill

@q(
    "gapfill_turns",
    f"""
WITH t AS ({EVENTS_AS_TRANSCRIPTS_SQL}),
bounds AS (SELECT conv_id, min(turn_idx) AS lo, max(turn_idx) AS hi FROM t GROUP BY conv_id),
grid AS (SELECT conv_id, CAST(unnest(generate_series(lo, hi)) AS INT) AS turn_idx FROM bounds),
j AS (
  SELECT g.conv_id, g.turn_idx, t.role, t.text, t.tool, t.ts, t.ts IS NULL AS is_gap_filled
  FROM grid g LEFT JOIN t ON g.conv_id = t.conv_id AND g.turn_idx = t.turn_idx
),
w AS (
  SELECT *,
    last_value(epoch_us(ts) IGNORE NULLS) OVER back AS prev_us,
    last_value(CASE WHEN ts IS NOT NULL THEN turn_idx END IGNORE NULLS) OVER back AS prev_idx,
    first_value(epoch_us(ts) IGNORE NULLS) OVER fwd AS next_us,
    first_value(CASE WHEN ts IS NOT NULL THEN turn_idx END IGNORE NULLS) OVER fwd AS next_idx,
    last_value(role IGNORE NULLS) OVER back AS role_f,
    last_value(tool IGNORE NULLS) OVER back AS tool_f
  FROM j
  WINDOW
    back AS (PARTITION BY conv_id ORDER BY turn_idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    fwd AS (PARTITION BY conv_id ORDER BY turn_idx ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
       CASE WHEN is_gap_filled THEN role_f ELSE role END AS role,
       CASE WHEN is_gap_filled THEN '' ELSE text END AS text,
       CASE WHEN is_gap_filled THEN tool_f ELSE tool END AS tool,
       -- floor division (DuckDB // truncates): subtract the non-negative
       -- remainder first so decreasing timestamps floor like Spark/pandas
       CASE WHEN is_gap_filled
            THEN make_timestamp(prev_us + (
              (next_us - prev_us) * (turn_idx - prev_idx)
              - (((next_us - prev_us) * (turn_idx - prev_idx)) % (next_idx - prev_idx)
                 + (next_idx - prev_idx)) % (next_idx - prev_idx)
            ) // (next_idx - prev_idx))
            ELSE ts END AS ts,
       is_gap_filled
FROM w
""",
)
def gapfill_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = events_as_transcripts(load_events(spark, sf_dir))
    return gapfill(t).select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        "role",
        "text",
        "tool",
        "ts",
        "is_gap_filled",
    )


# ----------------------------------------------------------- sessionize

@q(
    "sessionize",
    f"""
WITH t AS ({EVENTS_AS_TRANSCRIPTS_NOGAP_SQL}),
s AS (
  SELECT conv_id, turn_idx, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
g AS (
  SELECT conv_id, ts,
         sum(is_new) OVER (PARTITION BY conv_id ORDER BY turn_idx
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM s
)
SELECT conv_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       min(ts) AS session_start, max(ts) AS session_end
FROM g GROUP BY conv_id, session_id
""",
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (reference seed: sleep-period trim /
    zero-run segmentation, Minute_Discarder.py:71-82) — lag + cumsum."""
    t = events_as_transcripts(load_events(spark, sf_dir), with_gaps=False)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    is_new = F.when(
        F.lag("ts").over(w).isNull()
        | ((F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) > 1_800_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    g = t.withColumn("is_new", is_new).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return g.groupBy("conv_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# -------------------------------------------------------- top-k per key

@q(
    "topk_per_user",
    """
SELECT user_id, CAST(rnk AS BIGINT) AS rnk, event_id, value
FROM (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk
  FROM events
) WHERE rnk <= 3
""",
)
def topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("user_id", F.col("rnk").cast("long").alias("rnk"), "event_id", "value")
    )


# ------------------------------------------------------------ TPC-H-ish

@q(
    "tpch_q1_cents",
    """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS count_order,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_c4
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cents = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("count_order"),
            F.sum(cents("l_quantity")).alias("sum_qty_c"),
            F.sum(cents("l_extendedprice")).alias("sum_base_c"),
            F.sum(
                cents("l_extendedprice") * F.round((1 - F.col("l_discount")) * 100).cast("long")
            ).alias("sum_disc_c4"),
        )
    )


@q(
    "revenue_by_nation",
    """
SELECT n.n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact → broadcast dims (the reference's dict equi-joins,
    keep_code.py:81-98, done the Spark way: broadcast hash join)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("revenue_c"),
        )
    )
