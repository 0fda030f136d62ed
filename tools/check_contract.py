"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables; compare row count, column-name set, and exact values
(rows sorted by all columns, columns sorted by name).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            pass
    return df.sort_values(list(df.columns), kind="mergesort", na_position="last").reset_index(
        drop=True
    )


def float_bits(s: pd.Series) -> np.ndarray:
    """float64 values as uint64 bit patterns, all NaNs canonicalized.

    Strictly stricter than `==` on the sign of zero (distinguishes -0.0
    from +0.0, as a value hash does) while keeping NaN == NaN."""
    v = s.astype("float64").to_numpy(copy=True)
    bits = v.view(np.uint64).copy()
    bits[np.isnan(v)] = np.array(np.nan, dtype=np.float64).view(np.uint64)
    return bits


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                # Bit-pattern equality, NaN-normalized: the driver hashes
                # values, so -0.0 != 0.0 there even though they compare ==.
                # A `==` here would pass locally what the driver fails
                # (round-4 bandpass_reconstruction postmortem).
                eq = float_bits(av) == float_bits(bv)
            elif pd.api.types.is_datetime64_any_dtype(av) or pd.api.types.is_datetime64_any_dtype(bv):
                eq = pd.Series(
                    av.astype("datetime64[us]").to_numpy()
                    == bv.astype("datetime64[us]").to_numpy()
                ) | (av.isna().to_numpy() & bv.isna().to_numpy())
            else:
                eq = (av.isna() & bv.isna()) | (
                    av.fillna("\0NULL").to_numpy() == bv.fillna("\0NULL").to_numpy()
                )
            neq = int((~np.asarray(eq)).sum())
            if neq:
                i = int(np.argmax(~np.asarray(eq)))
                problems.append(
                    f"col {c}: {neq} mismatched values; first at row {i}: "
                    f"spark={a[c].iloc[i]!r} duck={b[c].iloc[i]!r}"
                )
    return problems


def run_gate(spark, sf_dir: str, only: set[str] | None = None, quiet: bool = False) -> list[str]:
    """Run every queries() entry vs its oracle on ``sf_dir`` with the
    bit-exact comparator; return the list of failing query names.
    Reusable from pytest with an existing session (the float-hygiene
    sweep runs this at a second SF without paying a JVM startup)."""
    import __spark_entry__ as entrymod

    con = duck_con(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    say = (lambda *_: None) if quiet else print
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            say(f"[FAIL] {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            say(f"[rows-only] {name}: {len(spark_pdf)} rows")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            say(f"[FAIL] {name}: duckdb error: {e}")
            failed.append(name)
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            say(f"[FAIL] {name}:")
            for p in problems:
                say(f"       {p}")
            failed.append(name)
        else:
            say(f"[OK] {name}: {len(spark_pdf)} rows match")
    say(f"\n{len(qs) - len(failed)}/{len(qs)} queries pass")
    return failed


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from biomed_timeseries_preprocessing_spark.session import get_spark

    spark = get_spark(master="local[8]")
    return 1 if run_gate(spark, sf_dir, only) else 0


if __name__ == "__main__":
    raise SystemExit(main())
