"""Driver-contract registry guards: entry() smoke, oracle keys ⊆ query
keys, and every query callable has the (spark, sf_dir) signature."""

import inspect
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402


def test_registry_consistency():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert len(qs) >= 35
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle_sql keys without queries: {missing}"
    for name, fn in qs.items():
        assert len(inspect.signature(fn).parameters) == 2, name
    # exact-oracle coverage stays the majority of the surface
    assert len(oracles) / len(qs) >= 0.75


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "bucket_start" in df.columns and "cnt" in df.columns
