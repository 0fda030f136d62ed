"""Small dimension-table sources (SURVEY §2.1 S11/S12).

Reference parity: ``pd.read_excel`` per patient for the lights-off dim
(``/root/reference/utils/sleep_edf/edf_reader.py:475-476``) and
train/test membership lists from config/tsv
(``configs/test_set.tsv``). Lake-native shape: read the small dim ONCE
into a DataFrame and ``F.broadcast`` it into joins — never a per-row
driver lookup.

The Excel branch is import-gated: this container ships no openpyxl, so
`read_dim_table` raises a clear error for .xlsx and fully supports the
csv/tsv path (which is what the broadcast-join plumbing actually
exercises; swapping the parser changes one branch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_dim_table(
    spark: SparkSession, path: str, schema: str, sep: str = ",", header: bool = True
) -> DataFrame:
    """Small dim file → DataFrame. csv/tsv native; .xlsx via pandas when
    an engine is installed (import-gated, honest failure otherwise)."""
    if path.endswith((".xlsx", ".xls")):
        try:
            import pandas as pd

            pdf = pd.read_excel(path)  # needs openpyxl/xlrd
        except ImportError as e:  # pragma: no cover - no excel engine here
            raise ImportError(
                "Excel dim sources need openpyxl/xlrd (not in this container); "
                "convert to csv/tsv or install an engine"
            ) from e
        return spark.createDataFrame(pdf, schema=schema)
    return spark.read.csv(path, schema=schema, sep=sep, header=header)


def with_dim(facts: DataFrame, dim: DataFrame, key: str, how: str = "left") -> DataFrame:
    """Broadcast equi-join of a small dim onto a fact table — the
    reference's per-patient dict lookup, Spark-shaped."""
    return facts.join(F.broadcast(dim), key, how)


def membership_filter(
    facts: DataFrame, members: DataFrame, key: str, keep: bool = True
) -> DataFrame:
    """S12 split lists: keep (or drop) rows whose key appears in a small
    membership list — broadcast semi/anti join, the scalable `isin`."""
    return facts.join(F.broadcast(members.select(key)), key, "left_semi" if keep else "left_anti")
