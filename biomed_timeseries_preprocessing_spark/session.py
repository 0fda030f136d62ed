"""SparkSession builder for the transcript rollup engine.

Replaces the reference's process-pool bootstrap (joblib ``Parallel`` at
``File_Struct.py:576-579``, HTCondor 8-CPU jobs at
``condor_logs/sleep_jobfile.job:28-31``) with a single declarative Spark
session: AQE for runtime re-planning/skew, Arrow for every Python-side
batch, UTC timezone pinned so DuckDB-oracle comparisons are exact.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def parse_local_cores(master: str) -> int | None:
    """Core count of a ``local[n]``/``local[*]`` master, else None.

    None means "cluster master (yarn, spark://, k8s://, local-cluster)":
    the session must NOT pin per-core configs (spark.default.parallelism,
    spark.graft.cores) from a guessed count there — Spark's
    executor-derived defaultParallelism is the right value (ADVICE r4)."""
    if not master.startswith("local[") or not master.endswith("]"):
        return None
    inner = master[len("local[") : -1]
    if inner == "*":
        return os.cpu_count() or 32
    return int(inner) if inner.isdigit() else None


def get_spark(
    app_name: str = "transcript-rollup-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    so the same entrypoint runs at two parallelism levels for the scaling
    benchmark (local[8] vs local[32] ~ N vs 4N executors).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    local_n = parse_local_cores(master)
    n_cores = local_n if local_n is not None else 32
    if shuffle_partitions is None:
        # 4 shuffle partitions per core (not 1): with zipf-skewed
        # conversations, wall time follows the LARGEST partition, and at
        # partitions == cores the tail task dominates — measured 32.9 s →
        # 18.6 s (1.8×) on the 4-tier pipeline at 13.7M turns just by
        # moving 32 → 128 partitions at 32 cores. Finer partitions let
        # the scheduler level the skew and AQE re-coalesce the small
        # ones. Same rule a real cluster uses (2-4× total cores).
        shuffle_partitions = 4 * n_cores

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE-first sizing (r3 verdict #5): start shuffles fine-grained
        # (16 per core) and let AQE coalesce to the advisory size —
        # initialPartitionNum scales with the session's core count, so
        # ONE config serves the sandbox and a 1000-executor cluster;
        # shuffle.partitions above remains only the non-AQE fallback.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(16 * n_cores),
        )
        # Multi-wave reduce stages (r4): AQE's coalesce target is
        # min(advisory, max(totalShuffleBytes/defaultParallelism,
        # minPartitionSize)). With defaultParallelism = cores (local
        # default) that sizes every mid-size reduce stage to ONE task
        # wave — on the 54M-turn cascade the entire window+sort+agg
        # reduce stage ran as 18 tasks at 16 cores (1.1 waves: a 2-task
        # tail while 14 cores idled), the dominant anti-wide bias in the
        # N→4N gate. Raising defaultParallelism to 4×cores makes the
        # size-based target aim at ~4 packed waves instead: measured
        # 39.6 → 30.7 s at local[16] and 118.1 → 102.1 s at local[4]
        # (solo 4→16 efficiency 0.73 → 0.83) with the 8m-advisory
        # equivalent. Small inputs keep the 1MB floor (tiny stages stay
        # ~cores-wide, not 2 giant partitions — a flat 8m advisory
        # regressed the sf0.1 inline cascade 3.1 → 5.1 s); 100 TB
        # shuffles cap at the 64m advisory, i.e. many waves regardless.
        # (set below only when the core count is actually known — on
        # cluster masters Spark derives defaultParallelism from the
        # executors, which is the right value to leave alone)
        # REQUIRED with the multi-wave tuning: cached plans pin their
        # output partitioning by default, so the persist-chained tier
        # cascade would run full initialPartitionNum-wide stages with
        # AQE coalesce silently disabled — measured 3.7 → 6.0 s (inline
        # cascade, sf0.1) when 512 initial partitions landed on cached
        # frames. With this flag AQE coalesces under caching too:
        # 3.60 s best, at parity with the static-128 r3 config.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # NOTE: measured on this sandbox — a 48g heap makes G1/Parallel GC
        # pathological (3-60s swings on a 1s job); 8g is stable for ≤16
        # threads. At 32 threads the allocation rate quadruples and GC
        # frequency with it, so the heap scales with the thread count
        # (16g at 32 cores measured 17.4s vs 24.2s at 8g on the 4-tier
        # pipeline). Override via env when a workload needs more.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g" if n_cores >= 24 else "8g"),
        )
        # Off-heap execution memory, sized per-core (512m × cores): at 32
        # threads the on-heap execution pool halves per-task memory vs 8
        # threads, and the tier-1m sort SPILLED (2.6 GB memory-spill,
        # 149 MB disk) while the 8-thread level never did — an
        # asymmetric, GC-coupled penalty. Off-heap removes the spill and
        # cut measured map-stage GC 130 → 39 core-s at 32 threads. Same
        # per-core sizing a real executor template uses.
        .config("spark.memory.offHeap.enabled", "true")
        .config(
            "spark.memory.offHeap.size",
            os.environ.get("SPARK_GRAFT_OFFHEAP", f"{512 * n_cores}m"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # serial-section reducers: v2 commit moves task files at task
        # commit (job commit O(1) instead of a serial rename loop) and
        # skips _SUCCESS markers — measured ~1-2 s/job of driver-side
        # time on the 4-tier materialization flow, which is pure Amdahl
        # loss at high core counts
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    )
    if local_n is not None:
        # multi-wave reduce sizing (see the long note above) and the
        # advertised core count for downstream pool sizing — pinned only
        # when the core count is actually known (local[n] / local[*]);
        # cluster masters keep Spark's executor-derived defaultParallelism
        # and engine_cores() falls back to it
        builder = builder.config(
            "spark.default.parallelism", str(4 * local_n)
        ).config("spark.graft.cores", str(local_n))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def engine_cores(spark: SparkSession) -> int:
    """Core count the session was built for (executor slots on a cluster).

    Reads the ``spark.graft.cores`` conf stamped by :func:`get_spark`;
    falls back to ``defaultParallelism`` for sessions built elsewhere.
    """
    try:
        return int(spark.conf.get("spark.graft.cores"))
    except Exception:
        return int(spark.sparkContext.defaultParallelism)
