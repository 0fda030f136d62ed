"""Concurrent-committer semantics of the snapshot catalog (VERDICT r4 #3
— the last untested leg of the Iceberg-model claim the resume story rests
on). Two separate PROCESSES committing disjoint partitions of one table
must both land with no lost update (cross-process flock mutex), and a
conflicting overwrite of the SAME partition from a stale base snapshot
must fail cleanly (Iceberg's serializable snapshot validation).

Metadata-only: manifests reference synthetic file paths, so no Spark
session is needed — which also lets the children be plain processes.
"""

import multiprocessing as mp

import pytest

from biomed_timeseries_preprocessing_spark.sources.catalog import (
    CommitConflictError,
    LocalSnapshotCatalog,
)


def _entry(bucket: int, i: int) -> dict:
    return {"path": f"/x/{bucket}/{i}.parquet", "partition": {"bucket": bucket}}


def _committer(warehouse: str, bucket: int, n_rounds: int) -> None:
    cat = LocalSnapshotCatalog(warehouse)
    for i in range(n_rounds):
        cat.commit_overwrite_partitions("t", [_entry(bucket, i)], {"bucket": bucket})


def test_concurrent_disjoint_committers_both_land(tmp_path):
    wh = str(tmp_path / "wh")
    cat = LocalSnapshotCatalog(wh)
    cat.commit_overwrite_partitions("t", [_entry(9, 0)], {"bucket": 9})

    ctx = mp.get_context("spawn")
    rounds = 25
    procs = [
        ctx.Process(target=_committer, args=(wh, b, rounds)) for b in (0, 1)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0

    cur = cat._current("t")
    # no lost update: every commit produced a snapshot (ids are
    # parent+1, so a clobbered read-modify-write would skip numbers)
    assert cur["snapshot_id"] == 1 + 2 * rounds
    paths = {f["path"] for f in cur["files"]}
    # each committer's LAST overwrite is visible, plus the untouched seed
    assert _entry(0, rounds - 1)["path"] in paths
    assert _entry(1, rounds - 1)["path"] in paths
    assert _entry(9, 0)["path"] in paths
    # and each partition holds exactly one file (overwrite, not append)
    assert len(paths) == 3


def test_conflicting_overwrite_fails_cleanly(tmp_path):
    cat = LocalSnapshotCatalog(str(tmp_path / "wh"))
    base = cat.commit_overwrite_partitions("t", [_entry(0, 0)], {"bucket": 0})

    # committer A lands on top of base
    cat.commit_overwrite_partitions("t", [_entry(0, 1)], {"bucket": 0})

    # committer B, ALSO based on `base`, targets the same partition:
    # rejected — silently clobbering A would lose its committed rows
    with pytest.raises(CommitConflictError, match="bucket"):
        cat.commit_overwrite_partitions(
            "t", [_entry(0, 2)], {"bucket": 0}, base_snapshot_id=base
        )
    # A's files survive the rejected commit
    assert {f["path"] for f in cat._current("t")["files"]} == {_entry(0, 1)["path"]}

    # same stale base, DISJOINT partition: no conflict, lands
    sid = cat.commit_overwrite_partitions(
        "t", [_entry(1, 0)], {"bucket": 1}, base_snapshot_id=base
    )
    assert sid == 3

    # base == current: validation trivially passes
    cat.commit_overwrite_partitions(
        "t", [_entry(1, 1)], {"bucket": 1}, base_snapshot_id=sid
    )

    # expired base snapshot: cannot validate -> clean conflict, not KeyError
    cat.expire_snapshots("t", keep_last=1)
    with pytest.raises(CommitConflictError, match="expired"):
        cat.commit_overwrite_partitions(
            "t", [_entry(0, 3)], {"bucket": 0}, base_snapshot_id=base
        )
