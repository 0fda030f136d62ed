"""Plan-regression tests: the physical plans the engine is designed
around must not silently regress (SURVEY §4's Catalyst table).

- parquet scans prune to referenced columns (projection pushdown);
- the derive→1m→5m→1h→1d cascade introduces exactly ONE exchange: the
  derive window's hash partitioning by conv_id satisfies every
  downstream groupBy (clustering on a grouping-key subset);
- filters on scan columns reach the parquet reader (PushedFilters).
"""

from pyspark.sql import functions as F

from biomed_timeseries_preprocessing_spark.operators.derive import with_derived
from biomed_timeseries_preprocessing_spark.operators.rollup import rollup_cascade


def plan_str(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_column_pruning(spark, small_transcripts, tmp_path):
    path = str(tmp_path / "t")
    small_transcripts.write.parquet(path)
    df = spark.read.parquet(path).select("conv_id", "ts")
    p = plan_str(df)
    scan_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "conv_id" in scan_schema and "ts" in scan_schema
    assert "text" not in scan_schema and "role" not in scan_schema


def test_filter_pushdown(spark, small_transcripts, tmp_path):
    path = str(tmp_path / "t2")
    small_transcripts.write.parquet(path)
    df = spark.read.parquet(path).filter(F.col("conv_id") == "conv_00000001")
    p = plan_str(df)
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln][0]
    assert "conv_id" in pushed and "IsNotNull" in pushed or "EqualTo" in pushed


def test_cascade_single_exchange(spark, small_transcripts, tmp_path):
    path = str(tmp_path / "t3")
    small_transcripts.write.parquet(path)
    turns = spark.read.parquet(path)
    tiers = rollup_cascade(with_derived(turns))
    import re

    p = plan_str(tiers["1d"])
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", p, flags=re.MULTILINE))
    # one exchange for the derive window; every tier merge rides the same
    # conv_id hash partitioning. (AQE may add a final coalesce read, which
    # is not an Exchange node.)
    assert n_exchanges == 1, f"cascade grew extra shuffles:\n{p}"
