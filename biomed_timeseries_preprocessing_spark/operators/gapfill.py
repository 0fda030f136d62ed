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


def gapfill(
    turns: DataFrame,
    default_text: str = "",
    carry: dict[str, object] | None = None,
) -> DataFrame:
    """Return turns with missing turn_idx rows materialized and filled,
    plus an ``is_gap_filled`` boolean column.

    ``carry``: extra ``{column: gap_value}`` columns to pass through —
    present rows keep their value, generated gap rows get ``gap_value``
    (cast to the column's type). This is the narrow-shuffle hook for
    pipelines that don't need the text payload downstream: precompute
    what the consumer needs (e.g. token_count, an audit hash) map-side,
    DROP ``text`` before this operator, and only the narrow columns
    cross the conv_id exchange (guide §2.3 — the rollup job's tier path
    does exactly this; a missing ``text`` column is simply omitted from
    the output).

    Physical shape (r6 one-scan rewrite, guide §2.4): ONE scan, ONE
    exchange, ONE window pass, ONE generate. Every present row emits
    itself plus the missing positions up to the next present turn
    (``sequence(turn_idx, next_idx - 1)``), so the grid aggregation, the
    grid⟷turns join, and the originals-union re-scan of the old plan
    (3 source scans, 5 exchanges in the events-adapter query) all
    disappear. Gap values come straight from the generating row: its own
    ``ts``/``turn_idx`` are the interpolation "prev" (present rows always
    carry ts), ``lead(ts)``/``lead(turn_idx)`` the "next", and running
    ``last(role/tool, ignorenulls)`` over present rows matches the old
    forward-fill exactly (gap rows contributed only NULLs to it). The
    head/tail behavior is unchanged — the grid was bounded by min/max
    present turn_idx, and so is per-row generation. A further win for
    callers: the output keeps the conv_id hash partitioning of the
    window, so the derive lag that follows in the rollup job re-uses
    this exchange instead of re-shuffling the text payload."""
    carry = carry or {}
    has_text = "text" in turns.columns
    payload = (["text"] if has_text else []) + list(carry)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    w_back = w.rowsBetween(Window.unboundedPreceding, 0)
    stepped = turns.select(
        "conv_id",
        "turn_idx",
        "role",
        *payload,
        "tool",
        "ts",
        F.lead("turn_idx").over(w).alias("_next_idx"),
        F.unix_micros(F.lead("ts").over(w)).alias("_next_us"),
        F.last("role", ignorenulls=True).over(w_back).alias("_role_f"),
        F.last("tool", ignorenulls=True).over(w_back).alias("_tool_f"),
    )
    idxs = F.when(
        F.col("_next_idx") > F.col("turn_idx") + F.lit(1),
        F.sequence(F.col("turn_idx"), F.col("_next_idx") - F.lit(1)),
    ).otherwise(F.array(F.col("turn_idx")))
    ex = stepped.select(
        "conv_id",
        F.col("turn_idx").alias("_prev_idx"),
        "role",
        *payload,
        "tool",
        "ts",
        "_next_idx",
        "_next_us",
        "_role_f",
        "_tool_f",
        F.explode(idxs).alias("turn_idx"),
    )
    is_gap = F.col("turn_idx") != F.col("_prev_idx")
    # exact integer interpolation with explicit FLOOR semantics
    # (pmod-based floordiv — matches DuckDB/pandas ``//`` even when
    # timestamps decrease within a conversation); the step denominator
    # (next_idx - prev_idx) is always positive for generated gap rows.
    interp = F.timestamp_micros(
        F.unix_micros(F.col("ts"))
        + F.expr(
            "((_next_us - unix_micros(ts)) * (turn_idx - _prev_idx)"
            " - pmod((_next_us - unix_micros(ts)) * (turn_idx - _prev_idx), _next_idx - _prev_idx))"
            " DIV (_next_idx - _prev_idx)"
        )
    )
    out = [
        F.col("conv_id"),
        F.col("turn_idx"),
        F.when(is_gap, F.col("_role_f")).otherwise(F.col("role")).alias("role"),
    ]
    if has_text:
        out.append(
            F.when(is_gap, F.lit(default_text)).otherwise(F.col("text")).alias("text")
        )
    out += [
        F.when(is_gap, F.col("_tool_f")).otherwise(F.col("tool")).alias("tool"),
        F.when(is_gap, interp).otherwise(F.col("ts")).alias("ts"),
        is_gap.alias("is_gap_filled"),
    ]
    for c, gap_value in carry.items():
        out.append(
            F.when(is_gap, F.lit(gap_value).cast(turns.schema[c].dataType))
            .otherwise(F.col(c))
            .alias(c)
        )
    return ex.select(*out)
