"""Group-level admission guards (SURVEY §2.3 P11, §2.2 K5).

Reference parity:
- P11 class-coverage filter: ``Discarder._contain_all_labels``
  (``/root/reference/utils/helpers/Minute_Discarder.py:24-44,88-125``)
  drops a whole recording when any required class has zero labeled
  intervals (returns None → discard) and otherwise reports the per-class
  duration distribution. Spark shape: conditional counts per group +
  coverage filter + semi-join back — two shuffles on the group key,
  map-side partial counts.
- K5 min-rows sink guard: ``Save_Agent`` skips saving windows with too
  few rows (``/root/reference/utils/helpers/Save_Agent.py:385-424``).
  Spark shape: group counts + semi/anti join. The dropped groups are
  returned too — no silent drops (callers log or persist them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def class_coverage(
    df: DataFrame, group_cols: list[str], label_col: str, required: list[str]
) -> DataFrame:
    """Per-group coverage report: count per required class + covered flag
    (true iff every required class occurs ≥ once in the group)."""
    counts = df.groupBy(*group_cols).agg(
        *[
            F.count(F.when(F.col(label_col) == c, 1)).alias(f"n_{c}")
            for c in required
        ]
    )
    covered = None
    for c in required:
        this = F.col(f"n_{c}") > 0
        covered = this if covered is None else (covered & this)
    return counts.withColumn("covered", covered)


def class_coverage_filter(
    df: DataFrame, group_cols: list[str], label_col: str, required: list[str]
) -> DataFrame:
    """Keep only rows of groups that contain every required class — the
    recording-level discard of Minute_Discarder, as a semi-join."""
    keep = class_coverage(df, group_cols, label_col, required).filter("covered").select(
        *group_cols
    )
    return df.join(keep, group_cols, "left_semi")


def min_rows_guard(
    df: DataFrame, group_cols: list[str], min_rows: int
) -> tuple[DataFrame, DataFrame]:
    """(kept, dropped): rows of groups with ≥ min_rows, and the dropped
    groups with their counts (reportable — no silent drops)."""
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    kept = df.join(
        counts.filter(F.col("n_rows") >= min_rows).select(*group_cols),
        group_cols,
        "left_semi",
    )
    dropped = counts.filter(F.col("n_rows") < min_rows)
    return kept, dropped
