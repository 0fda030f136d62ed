"""S11/S12 dim sources (broadcast join plumbing) and O7/F13 augmentation
union operators."""

import pytest

from pyspark.sql import functions as F

from biomed_timeseries_preprocessing_spark.operators.augment import (
    augment_gaussian,
    augment_smoothed,
)
from biomed_timeseries_preprocessing_spark.sources.dims import (
    membership_filter,
    read_dim_table,
    with_dim,
)


def test_read_dim_csv_and_broadcast_join(spark, tmp_path):
    p = str(tmp_path / "dim.csv")
    with open(p, "w") as f:
        f.write("patient,lights_off\np1,22\np2,23\n")
    dim = read_dim_table(spark, p, "patient string, lights_off int")
    facts = spark.createDataFrame([("p1", 1), ("p2", 2), ("p3", 3)], "patient string, v int")
    joined = with_dim(facts, dim, "patient")
    got = {r["patient"]: r["lights_off"] for r in joined.collect()}
    assert got == {"p1": 22, "p2": 23, "p3": None}
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # dim is broadcast, never shuffled


def test_read_dim_excel_gated(spark, tmp_path):
    p = str(tmp_path / "dim.xlsx")
    open(p, "wb").close()
    # no excel engine in this container: the adapter must fail loudly at
    # read time (ImportError from the gate, or pandas' format error),
    # never silently return an empty frame
    with pytest.raises((ImportError, ValueError)):
        read_dim_table(spark, p, "a string")


def test_membership_filter(spark):
    facts = spark.createDataFrame([("p1",), ("p2",), ("p3",)], "patient string")
    members = spark.createDataFrame([("p1",), ("p3",)], "patient string")
    kept = {r["patient"] for r in membership_filter(facts, members, "patient").collect()}
    dropped = {r["patient"] for r in membership_filter(facts, members, "patient", keep=False).collect()}
    assert kept == {"p1", "p3"} and dropped == {"p2"}


def test_augment_gaussian_deterministic_union(spark):
    df = spark.createDataFrame(
        [("c", i, float(i)) for i in range(20)], "conv_id string, turn_idx int, v double"
    )
    out = augment_gaussian(df, "v", ["conv_id", "turn_idx"], times=2, std=0.5, seed=7)
    assert out.count() == 60  # original + 2 copies
    orig = out.filter("aug_id = 0").orderBy("turn_idx").toPandas()
    assert list(orig["v"]) == [float(i) for i in range(20)]  # base untouched
    # deterministic across partitionings (the scaling guarantee)
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, augment_gaussian(df.repartition(7), "v", ["conv_id", "turn_idx"], times=2, std=0.5, seed=7).collect()))
    assert a == b
    # copies actually perturbed, different per copy
    c1 = out.filter("aug_id = 1").orderBy("turn_idx").toPandas()["v"]
    c2 = out.filter("aug_id = 2").orderBy("turn_idx").toPandas()["v"]
    assert (c1 != orig["v"]).any() and (c1 != c2).any()
    # noise is centered-ish (Irwin-Hall sanity, not a strict stat test)
    assert abs((c1 - orig["v"]).mean()) < 1.0


def test_augment_smoothed_copies(spark):
    df = spark.createDataFrame(
        [("c", i, float(i % 5)) for i in range(30)], "conv_id string, turn_idx int, v double"
    )
    out = augment_smoothed(df, "v", times=2, k=1)
    assert out.count() == 90
    # smoothing reduces variance per copy
    stats = {
        r["aug_id"]: r["sd"]
        for r in out.groupBy("aug_id").agg(F.stddev_samp("v").alias("sd")).collect()
    }
    assert stats[1] < stats[0] and stats[2] < stats[1]


def test_augment_gaussian_single_scan_identity(spark):
    """r5 rewrite guard: the one-scan explode emits BIT-IDENTICAL rows
    to the retired per-copy union (noise hashes the copy index, and an
    exploded int sequence feeds xxhash64 the same int the old
    F.lit(copy) did) — and the plan scans the input once (no Union)."""
    from functools import reduce

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from biomed_timeseries_preprocessing_spark.operators.augment import (
        _gaussian_ih12,
        augment_gaussian,
    )

    df = spark.range(200).select(
        (F.col("id") % 10).cast("string").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        (F.col("id") * 1.5).alias("v"),
    )

    def union_reference(d, times, std, mean, seed):
        base = d.withColumn("aug_id", F.lit(0))
        keys = [F.col("conv_id"), F.col("turn_idx")]
        copies = [
            d.withColumn(
                "v", F.col("v") + (_gaussian_ih12(keys, t, seed) * std + F.lit(mean))
            ).withColumn("aug_id", F.lit(t))
            for t in range(1, times + 1)
        ]
        return reduce(DataFrame.unionByName, copies, base)

    new = augment_gaussian(df, "v", ["conv_id", "turn_idx"], times=3, std=0.5, seed=7)
    old = union_reference(df, times=3, std=0.5, mean=0.0, seed=7)
    a = sorted(map(tuple, new.collect()))
    b = sorted(map(tuple, old.collect()))
    assert a == b  # float equality IS bit equality here: same expressions

    plan = new._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan  # single scan, not times+1 branches
