"""fill_label_gaps triple-eval profile (VERDICT r4 #6 / NOTES_r4 backlog).

The shipped operator unions four branches (original + head/mid/tail
gaps) over one windowed join — the physical plan evaluates that join
once per branch unless Spark reuses the exchange. The candidate rewrite
is a SINGLE-SCAN emit: per interval row, an array of [gap-before?,
interval, tail-gap?] structs exploded in one pass (same trick that paid
in CC symmetrize and simhash banding). The operator's input is small by
nature (intervals, not turns), so per the measured-win bar this script
decides: interleaved A/B at 1x and 10x synthetic intervals, identity
checked first; restructure only if the one-scan wins.

DECIDED (r5): it won — 1.45x at 53k intervals, 1.27x at 533k, identity
exact — so the shipped ``fill_label_gaps`` IS the one-scan now and this
script keeps the retired 4-branch union inline as the baseline arm (the
committed JSON's "union4").

Usage: python BENCH/gapfill_intervals_profile.py [out_json]
Writes BENCH/gapfill_intervals_profile.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from biomed_timeseries_preprocessing_spark.operators.intervals import fill_label_gaps  # noqa: E402
from biomed_timeseries_preprocessing_spark.session import get_spark  # noqa: E402

GRID_US = 10 * 60 * 1_000_000
HEAD_US = 7 * 60 * 1_000_000
TAIL_US = 13 * 60 * 1_000_000
REPS = 3


def fill_label_gaps_union4(
    intervals: DataFrame, spans: DataFrame, default_label: str = "Background"
) -> DataFrame:
    """The RETIRED pre-r5 implementation, kept inline as the profile
    baseline: four branches (original + head/mid/tail gap) unioned over
    one windowed join — the join evaluates once per branch."""
    w = Window.partitionBy("conv_id").orderBy("start_ts")
    iv = (
        intervals.join(spans, "conv_id")
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_prev_end", F.lag("end_ts").over(w))
    )
    head_gap = iv.filter(
        (F.col("_rn") == 1) & (F.col("start_ts") > F.col("span_start"))
    ).select(
        "conv_id",
        F.col("span_start").alias("start_ts"),
        F.col("start_ts").alias("end_ts"),
        F.lit(default_label).alias("label"),
    )
    mid_gap = iv.filter(
        F.col("_prev_end").isNotNull() & (F.col("_prev_end") < F.col("start_ts"))
    ).select(
        "conv_id",
        F.col("_prev_end").alias("start_ts"),
        F.col("start_ts").alias("end_ts"),
        F.lit(default_label).alias("label"),
    )
    tail_gap = (
        iv.groupBy("conv_id")
        .agg(F.max("end_ts").alias("_max_end"), F.max("span_end").alias("span_end"))
        .filter(F.col("_max_end") < F.col("span_end"))
        .select(
            "conv_id",
            F.col("_max_end").alias("start_ts"),
            F.col("span_end").alias("end_ts"),
            F.lit(default_label).alias("label"),
        )
    )
    filled = (
        intervals.select("conv_id", "start_ts", "end_ts", "label")
        .unionByName(head_gap)
        .unionByName(mid_gap)
        .unionByName(tail_gap)
    )
    w2 = Window.partitionBy("conv_id").orderBy("start_ts")
    runs = filled.withColumn(
        "_new",
        F.when(
            (F.lag("label").over(w2) == F.col("label"))
            & (F.lag("end_ts").over(w2) == F.col("start_ts")),
            0,
        ).otherwise(1),
    ).withColumn(
        "_island", F.sum("_new").over(w2.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        runs.groupBy("conv_id", "label", "_island")
        .agg(F.min("start_ts").alias("start_ts"), F.max("end_ts").alias("end_ts"))
        .drop("_island")
    )


def synth(spark, n_convs: int, cells: int, root: str) -> tuple[str, str]:
    """Deterministic interval fixture shaped like the driver query's:
    grid-cell intervals with ~1/3 holes, head/tail span back-fill."""
    base = (
        spark.range(n_convs * cells)
        .select(
            F.format_string(
                "conv_%08d", (F.col("id") / cells).cast("int")
            ).alias("conv_id"),
            (F.col("id") % cells).cast("long").alias("cell"),
        )
        .filter(F.pmod(F.xxhash64("conv_id", "cell"), F.lit(3)) != 0)
    )
    iv = base.select(
        "conv_id",
        F.timestamp_micros(F.col("cell") * GRID_US).alias("start_ts"),
        F.timestamp_micros((F.col("cell") + 1) * GRID_US).alias("end_ts"),
        F.concat(
            F.lit("label_"), F.pmod(F.xxhash64("cell", "conv_id"), F.lit(4))
        ).alias("label"),
    )
    ivp = os.path.join(root, f"iv_{n_convs}")
    spp = os.path.join(root, f"sp_{n_convs}")
    iv.write.mode("overwrite").parquet(ivp)
    spark.read.parquet(ivp).groupBy("conv_id").agg(
        F.timestamp_micros(F.min(F.unix_micros("start_ts")) - HEAD_US).alias(
            "span_start"
        ),
        F.timestamp_micros(F.max(F.unix_micros("end_ts")) + TAIL_US).alias("span_end"),
    ).write.mode("overwrite").parquet(spp)
    return ivp, spp


def drain(df: DataFrame) -> None:
    df.agg(F.count(F.lit(1)), F.max("end_ts")).collect()


def main(out_json: str) -> None:
    spark = get_spark(app_name="gapfill-intervals-profile")
    root = os.environ.get("PROFILE_TMP", "/tmp/gapfill_profile")
    out = {"reps": REPS, "identity": None, "cells": {}}

    # identity first: the rewrite is only admissible if bit-identical
    ivp, spp = synth(spark, 200, 40, root)
    iv, sp = spark.read.parquet(ivp), spark.read.parquet(spp)
    a = fill_label_gaps_union4(iv, sp).orderBy("conv_id", "start_ts").collect()
    b = fill_label_gaps(iv, sp).orderBy("conv_id", "start_ts").collect()
    out["identity"] = a == b
    assert out["identity"], "one-scan variant diverges — not admissible"

    for label, (n_convs, cells) in {
        "1x": (2_000, 40),
        "10x": (20_000, 40),
    }.items():
        ivp, spp = synth(spark, n_convs, cells, root)
        iv, sp = spark.read.parquet(ivp), spark.read.parquet(spp)
        walls = {"union4": [], "onescan": []}
        drain(fill_label_gaps_union4(iv, sp))  # warmup both plans once
        drain(fill_label_gaps(iv, sp))
        for _ in range(REPS):  # interleaved A/B
            t0 = time.time()
            drain(fill_label_gaps_union4(iv, sp))
            walls["union4"].append(round(time.time() - t0, 3))
            t0 = time.time()
            drain(fill_label_gaps(iv, sp))
            walls["onescan"].append(round(time.time() - t0, 3))
        out["cells"][label] = {
            "n_intervals": iv.count(),
            "union4_walls_s": walls["union4"],
            "onescan_walls_s": walls["onescan"],
            "speedup_onescan": round(min(walls["union4"]) / min(walls["onescan"]), 2),
        }
        print(label, json.dumps(out["cells"][label]))

    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", out_json)
    spark.stop()


if __name__ == "__main__":
    main(
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "BENCH", "gapfill_intervals_profile.json")
    )
