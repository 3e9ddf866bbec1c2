"""Local mirror of the driver's Spark-vs-DuckDB correctness comparison.

Runs a registered query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column set, and values
(order-insensitive, exact after the queries' own rounding).
"""

from __future__ import annotations

import datetime as dt

import duckdb
import numpy as np
import pandas as pd

from barberini_analytics_spark.core.io import TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for name in TABLES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            sample = next((v for v in s if v is not None), None)
            if isinstance(sample, dt.date) and not isinstance(sample, dt.datetime):
                # Spark DateType → object of datetime.date; DuckDB DATE →
                # datetime64 — align both to datetime64[us]
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
            else:
                # lists/arrays need tuple-izing to be sortable/comparable
                df[c] = s.map(
                    lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
                )
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for c in a.columns:
        va, vb = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]):
            ok = (
                (pd.isna(va) & pd.isna(vb))
                | np.isclose(va.astype(float), vb.astype(float), rtol=0, atol=0, equal_nan=True)
            )
        else:
            ok = (pd.isna(va) & pd.isna(vb)) | (va == vb)
        if not bool(np.all(ok)):
            bad = np.nonzero(~ok)[0][:5]
            raise AssertionError(
                f"{name}: column {c!r} mismatch at rows {bad.tolist()}: "
                f"spark={va[bad].tolist()} oracle={vb[bad].tolist()}"
            )
