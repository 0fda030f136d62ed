"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (1-minute rollup cascade over the
events-as-transcripts adapter) at sf0.001.
``queries()`` / ``oracle_sql()`` — the full operator surface, registered
in ``biomed_timeseries_preprocessing_spark.driver_queries`` (Spark program + DuckDB oracle SQL
side by side).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from biomed_timeseries_preprocessing_spark import driver_queries  # noqa: E402
from biomed_timeseries_preprocessing_spark import driver_queries_ext  # noqa: E402,F401  (registers part-2 queries)
from biomed_timeseries_preprocessing_spark import driver_queries_ext2  # noqa: E402,F401  (part-3 queries)
from biomed_timeseries_preprocessing_spark import driver_queries_ext3  # noqa: E402,F401  (part-4 queries)
from biomed_timeseries_preprocessing_spark import driver_queries_ext4  # noqa: E402,F401  (round-2 queries)
from biomed_timeseries_preprocessing_spark import driver_queries_ext5  # noqa: E402,F401  (round-3 queries)
from biomed_timeseries_preprocessing_spark import driver_queries_ext6  # noqa: E402,F401  (round-4 queries)
from biomed_timeseries_preprocessing_spark import driver_queries_ext7  # noqa: E402,F401  (round-4 metamorphic audits)
from biomed_timeseries_preprocessing_spark import driver_queries_ext8  # noqa: E402,F401  (round-4 fill_label_gaps oracle)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derive → 1m rollup → algebraic cascade to 1h, on the
    events table mapped to the transcript schema (sf0.001)."""
    return driver_queries.QUERIES["rollup_1h_cascade"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(driver_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(driver_queries.ORACLE)
