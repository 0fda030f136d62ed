"""Plan truncation that respects the deployment's fault-tolerance story.

``localCheckpoint`` materializes to EXECUTOR-LOCAL storage with the
lineage cut off: on a single JVM (this sandbox's ``local[n]``) that is
free fault-tolerance-wise — losing "the executor" is losing the job
anyway — but on a multi-executor cluster a lost executor makes every
downstream stage fail UNRECOVERABLY, because the blocks are neither
replicated nor recomputable (ADVICE r4). Reliable ``checkpoint`` writes
to the configured checkpoint directory (HDFS/S3 on a real cluster)
and survives executor loss at the cost of one distributed write.

:func:`plan_checkpoint` picks per session: reliable when the session
has a checkpoint dir configured (``spark.sparkContext.setCheckpointDir``
— a cluster deployment should always set one), executor-local
otherwise. Operators that truncate plans (minhash/shared-shingle reuse,
connected-components rounds) route through here so the single-box
default never silently ships a fault-tolerance regression to a cluster
run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s logical plan.

    Reliable ``checkpoint`` when the session has a checkpoint dir
    (replicated storage — survives executor loss; set
    ``sparkContext.setCheckpointDir`` on cluster deployments), else
    ``localCheckpoint`` (executor-local blocks, zero configuration —
    the right call on single-JVM local masters, NOT fault-tolerant to
    executor loss on a cluster)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        if eager:
            # Reliable checkpoint computes the plan for the checkpoint
            # WRITE after the triggering action computed it once already
            # — persist first so the second pass is a cache read, and
            # free the blocks as soon as the checkpoint files exist
            # (ADVICE r5: the CC loop paid ~2× per round without this).
            # Iteration checkpoints superseded by later ones are cleaned
            # by Spark when the RDD is GC'd IF the cluster sets
            # spark.cleaner.referenceTracking.cleanCheckpoints=true —
            # recommended alongside the checkpoint dir; without it,
            # long iterative jobs accumulate checkpoint storage.
            cached = df.persist()
            out = cached.checkpoint(eager=True)
            cached.unpersist()
            return out
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=eager)
