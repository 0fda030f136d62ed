"""Gap-fill: materialize missing turns per conversation and fill them.

Reference parity (SURVEY §2.8 F7): ``Extract_Transform_Labeler.py:49-70``
fills holes between label intervals with Background, merges adjacent
same-label intervals, and back-fills the tail to ``end_labelling``; the
MNE reader maps missing channels to ``-1`` sentinels
(``mne_reader.py:53-55,133-135``). Our version:

- the missing-turn grid is materialized with ``sequence()`` per
  conversation (bounded by that conversation's min/max present turn_idx —
  no head/tail extrapolation, mirroring the reference's refusal to invent
  data before the first interval);
- ``ts`` is **linearly interpolated** between the previous and next
  present turns using exact integer µs arithmetic with explicit FLOOR
  semantics (pmod-based floordiv — matches DuckDB/pandas ``//`` even when
  timestamps decrease within a conversation) so results are bit-identical
  across partitionings and match the oracles;
- ``role``/``tool`` of **gap rows only** are forward-filled
  (``last(..., ignoreNulls)`` over the stable order); present rows keep
  their own values, including NULLs the schema allows;
- ``text`` of filled turns is a configurable default (NULL-free so the
  per-turn text-equality invariant can distinguish filled rows via
  ``is_gap_filled`` instead of sentinel values).

Everything is window functions over the stable (conv_id, turn_idx) order
— one shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


OUT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "is_gap_filled"]


def gapfill(turns: DataFrame, default_text: str = "") -> DataFrame:
    """Return turns with missing turn_idx rows materialized and filled,
    plus an ``is_gap_filled`` boolean column.

    Physical shape: original rows NEVER enter the grid join or the
    window passes — they stream from the source straight into a union.
    Only a narrow projection (keys + ts/role/tool, no ``text``) flows
    through the shuffle to compute the gap rows, whose text is a
    constant anyway. Carrying full rows through the join + two window
    sorts made materializing the filled frame ~10× slower than counting
    it (the ``text`` payload dominated the shuffle); at 100 TB the gap
    rows are a sliver of the data and this plan moves only that sliver
    plus narrow carriers."""
    narrow = turns.select("conv_id", "turn_idx", "ts", "role", "tool")
    grid = (
        narrow.groupBy("conv_id")
        .agg(F.min("turn_idx").alias("lo"), F.max("turn_idx").alias("hi"))
        .select(
            "conv_id",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("turn_idx"),
        )
    )
    j = grid.join(narrow, ["conv_id", "turn_idx"], "left").withColumn(
        "is_gap_filled", F.col("ts").isNull()
    )

    # Both fill directions use an incremental unboundedPreceding→current
    # frame: the "next present value" is last(..., ignorenulls) over the
    # DESCENDING turn order. A current→unboundedFollowing frame computes
    # the same thing but Spark re-evaluates that frame shape from scratch
    # per row — O(n²) per conversation; measured ~10× the whole
    # operator's cost at 800-turn conversations. The reversed sort stays
    # inside the same hash partitioning (no extra shuffle), and grouping
    # the same-spec expressions adjacently collapses them into exactly
    # two Window nodes.
    w_back = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd_rev = (
        Window.partitionBy("conv_id")
        .orderBy(F.desc("turn_idx"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    ts_us = F.unix_micros(F.col("ts"))
    present_idx = F.when(F.col("ts").isNotNull(), F.col("turn_idx"))
    prev_us = F.last(ts_us, ignorenulls=True).over(w_back)
    prev_idx = F.last(present_idx, ignorenulls=True).over(w_back)
    next_us = F.last(ts_us, ignorenulls=True).over(w_fwd_rev)
    next_idx = F.last(present_idx, ignorenulls=True).over(w_fwd_rev)

    # exact integer interpolation: prev + (next-prev)*(i-prev_i) DIV (next_i-prev_i)
    filled = (
        j.withColumn("_prev_us", prev_us)
        .withColumn("_prev_idx", prev_idx)
        .withColumn("role", F.last("role", ignorenulls=True).over(w_back))
        .withColumn("tool", F.last("tool", ignorenulls=True).over(w_back))
        .withColumn("_next_us", next_us)
        .withColumn("_next_idx", next_idx)
        .withColumn(
            "ts",
            # floor division via pmod (Spark DIV truncates toward zero;
            # DuckDB/pandas // floor) so non-monotone ts per conversation
            # still interpolates identically to the oracles. The step
            # denominator (next_idx - prev_idx) is always positive.
            F.when(F.col("is_gap_filled"), F.timestamp_micros(F.col("_prev_us") + F.expr(
                "((_next_us - _prev_us) * (turn_idx - _prev_idx)"
                " - pmod((_next_us - _prev_us) * (turn_idx - _prev_idx), _next_idx - _prev_idx))"
                " DIV (_next_idx - _prev_idx)"
            ))).otherwise(F.col("ts")),
        )
        .withColumn("text", F.lit(default_text))
    )
    # the window pass carried present rows only as fill sources; emit the
    # gap rows it computed and union the untouched originals back in
    gaps = filled.filter(F.col("is_gap_filled")).select(*OUT_COLS)
    originals = turns.withColumn("is_gap_filled", F.lit(False)).select(*OUT_COLS)
    return originals.unionByName(gaps)
